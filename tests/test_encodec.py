"""EnCodec tests: layouts, RVQ roundtrip, chunked/normalized mode, OLA."""

import numpy as np
import pytest

from tpu_audio.codecs import load_codec
from tpu_audio.codecs.encodec import (
    Encodec,
    EncodecConfig,
    decoder_layout,
    encoder_layout,
    linear_overlap_add,
)

from fixtures import make_encodec_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_codec(str(make_encodec_fixture(
        tmp_path_factory.mktemp("encodec"))))


@pytest.fixture(scope="module")
def chunked_model(tmp_path_factory):
    return load_codec(str(make_encodec_fixture(
        tmp_path_factory.mktemp("encodec48"), chunked=True)))


def test_layouts_match_flat_index_assignment():
    cfg = EncodecConfig(upsampling_ratios=(4, 2), num_residual_layers=1)
    enc = encoder_layout(cfg)
    assert [s[0] for s in enc] == [
        "conv", "resnet", "elu", "conv", "resnet", "elu", "conv",
        "lstm", "elu", "conv"]
    dec = decoder_layout(cfg)
    assert [s[0] for s in dec] == [
        "conv", "lstm", "elu", "convt", "resnet", "elu", "convt",
        "resnet", "elu", "conv"]


def test_factory(model):
    assert isinstance(model, Encodec)
    assert model.config.hop_length == 8
    assert model.config.num_quantizers == 2
    # lstm keys renamed from MLX Wx/Wh
    lstm = model.params["encoder"]["layers"]["7"]["lstm"]["0"]
    assert "weight_ih" in lstm and "weight_hh" in lstm


def test_encode_decode_roundtrip_shapes(model):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(800) * 0.1).astype(np.float32)
    codes, scales = model.encode(audio)
    assert codes.shape[0] == 1  # one chunk (no chunking config)
    assert codes.shape[2] == 2  # n_q at default (first) bandwidth
    assert codes.shape[3] == 100  # 800 / hop 8
    assert scales == [None]
    out = model.decode(codes, scales)
    assert out.shape[0] == 1 and out.shape[2] == 1
    # causal SEANet reconstructs at least the input length
    assert out.shape[1] >= 800
    assert np.isfinite(out).all()


def test_codes_in_range(model):
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(160) * 0.5).astype(np.float32)
    codes, _ = model.encode(audio)
    c = np.asarray(codes)
    assert c.min() >= 0 and c.max() < model.config.codebook_size


def test_bandwidth_selects_quantizers(model):
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(160) * 0.1).astype(np.float32)
    codes30, _ = model.encode(audio, bandwidth=30.0)
    codes60, _ = model.encode(audio, bandwidth=60.0)
    assert codes30.shape[2] <= codes60.shape[2]
    with pytest.raises(ValueError):
        model.encode(audio, bandwidth=12.34)


def test_rvq_first_level_shared(model):
    """Level-0 codes must be identical regardless of RVQ depth."""
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(160) * 0.1).astype(np.float32)
    c30, _ = model.encode(audio, bandwidth=30.0)
    c60, _ = model.encode(audio, bandwidth=60.0)
    np.testing.assert_array_equal(np.asarray(c30)[0, :, 0],
                                  np.asarray(c60)[0, :, 0])


def test_chunked_normalized_mode(chunked_model):
    rng = np.random.default_rng(4)
    audio = (rng.standard_normal(720) * 0.3).astype(np.float32)
    codes, scales = chunked_model.encode(audio)
    assert codes.shape[0] > 1  # multiple chunks
    assert all(s is not None for s in scales)  # normalize=True -> scales
    out = chunked_model.decode(codes, scales)
    assert np.isfinite(out).all()
    assert out.shape[1] >= 600


def test_linear_overlap_add_constant_signal():
    """OLA of identical constant frames must reproduce the constant."""
    f = np.ones((1, 100, 1), np.float32)
    out = linear_overlap_add([f, f, f], stride=50)
    assert out.shape == (1, 200, 1)
    np.testing.assert_allclose(out[0, 30:170, 0], 1.0, atol=1e-6)


def test_reconstruct_deterministic(model):
    rng = np.random.default_rng(5)
    audio = (rng.standard_normal(240) * 0.1).astype(np.float32)
    a = model.reconstruct(audio)
    b = model.reconstruct(audio)
    np.testing.assert_array_equal(a, b)


def test_encodec_features_for_vocos(model):
    """EncodecFeatures: offset-summed codebook embeddings per frame."""
    from tpu_audio.codecs.vocos import EncodecFeatures

    feats = EncodecFeatures.from_encodec(model, bandwidths=(30.0, 60.0))
    assert feats.codebook_weights.shape == (32, 8)  # 2 codebooks x 16, dim 8
    rng = np.random.default_rng(6)
    audio = (rng.standard_normal(160) * 0.1).astype(np.float32)
    codes = feats.get_encodec_codes(audio, bandwidth_id=1)
    assert codes.shape == (2, 1, 20)
    f = np.asarray(feats(audio, bandwidth_id=1))
    assert f.shape == (1, 20, 8)
    # features equal the sum of per-level codebook rows
    emb0 = np.asarray(model.params["quantizer"]["layers"]["0"]["codebook"]["embed"])
    emb1 = np.asarray(model.params["quantizer"]["layers"]["1"]["codebook"]["embed"])
    c = np.asarray(codes)
    expected = emb0[c[0, 0]] + emb1[c[1, 0]]
    np.testing.assert_allclose(f[0], expected, atol=1e-5)


def test_ada_layer_norm_conditioning():
    """AdaLayerNorm applies per-condition scale/shift after plain LN."""
    import jax.numpy as jnp
    from tpu_audio.codecs.vocos import ada_layer_norm

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 5, 4)).astype(np.float32))
    p = {"scale": {"weight": jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32)),
                   "bias": jnp.ones(4, jnp.float32)},
         "shift": {"weight": jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32)),
                   "bias": jnp.zeros(4, jnp.float32)}}
    c0 = jnp.asarray(np.eye(3, dtype=np.float32)[[0, 0]])
    c1 = jnp.asarray(np.eye(3, dtype=np.float32)[[1, 1]])
    y0 = np.asarray(ada_layer_norm(p, x, c0))
    y1 = np.asarray(ada_layer_norm(p, x, c1))
    assert y0.shape == x.shape
    assert not np.allclose(y0, y1)
