"""SNAC codec tests through the real from_pretrained path."""

import numpy as np
import pytest

from tpu_audio.codecs import load_codec
from tpu_audio.codecs.snac import SNAC, sanitize

from fixtures import make_snac_fixture, modulo_values


@pytest.fixture(scope="module")
def snac(tmp_path_factory):
    path = make_snac_fixture(tmp_path_factory.mktemp("snac"))
    return SNAC.from_pretrained(str(path))


def test_codec_factory(tmp_path):
    path = make_snac_fixture(tmp_path / "c", attn_window_size=None)
    codec = load_codec(str(path), codec_type="snac")
    assert isinstance(codec, SNAC)


def test_encode_shapes(snac):
    cfg = snac.config
    # hop = 2*2 = 4; strides (2,1); pad_to = hop*lcm(2,1) = 8
    audio = np.zeros(100, np.float32)
    codes = snac.encode(audio)
    assert len(codes) == len(cfg.vq_strides)
    t = 104 // cfg.hop_length  # padded to 104
    assert codes[0].shape == (1, t // 2)
    assert codes[1].shape == (1, t)
    for c, _ in zip(codes, cfg.vq_strides):
        arr = np.asarray(c)
        assert arr.min() >= 0 and arr.max() < cfg.codebook_size


def test_decode_shapes_and_determinism(snac):
    cfg = snac.config
    rng = np.random.default_rng(0)
    codes = [
        rng.integers(0, cfg.codebook_size, (1, 8)).astype(np.int32),
        rng.integers(0, cfg.codebook_size, (1, 16)).astype(np.int32),
    ]
    wav1 = np.asarray(snac.decode(codes, seed=1))
    wav2 = np.asarray(snac.decode(codes, seed=1))
    assert wav1.shape == (1, 16 * cfg.hop_length)
    np.testing.assert_array_equal(wav1, wav2)
    assert np.abs(wav1).max() <= 1.0  # tanh output
    # different noise seed -> different waveform (noise blocks active)
    wav3 = np.asarray(snac.decode(codes, seed=2))
    assert not np.array_equal(wav1, wav3)


def test_reconstruct_roundtrip(snac):
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(240) * 0.1).astype(np.float32)
    out = snac.reconstruct(audio)
    assert out.shape == (1, 240)
    assert np.isfinite(out).all()


def test_with_attention_window(tmp_path):
    path = make_snac_fixture(
        tmp_path / "attn", encoder_dim=16, encoder_rates=(2, 2),
        decoder_dim=64, decoder_rates=(2, 2), attn_window_size=4,
    )
    codec = SNAC.from_pretrained(str(path))
    audio = np.zeros(4 * 4 * 16, np.float32)
    out = codec.reconstruct(audio)
    assert np.isfinite(np.asarray(out)).all()


def test_sanitize_folds_weight_norm():
    v = modulo_values((8, 4, 7), scale=1.0)
    g = np.abs(modulo_values((8, 1, 1), scale=0.5)) + 0.1
    out = sanitize({
        "encoder.block.0.weight_v": modulo_values((16, 1, 7), scale=1.0),
        "encoder.block.0.weight_g": np.ones((16, 1, 1), np.float32),
        "x.weight_v": v, "x.weight_g": g,
        "s.alpha": np.ones((1, 5, 1), np.float32),
    })
    w = out["x.weight"]
    assert w.shape == (8, 4, 7)
    norms = np.linalg.norm(w.reshape(8, -1), axis=1)
    np.testing.assert_allclose(norms, g.reshape(-1), rtol=1e-5)
    assert out["s.alpha"].shape == (5,)


def test_sanitize_mlx_layout():
    # MLX layout: conv [O, K, I]; first encoder conv has in=1 in last dim
    out = sanitize({
        "encoder.block.layers.0.weight_v": np.ones((16, 7, 1), np.float32),
        "encoder.block.layers.0.weight_g": np.ones((16, 1, 1), np.float32),
        "decoder.model.layers.2.block.layers.1.weight_v": np.ones((8, 4, 12), np.float32),
        "decoder.model.layers.2.block.layers.1.weight_g": np.ones((8, 1, 1), np.float32),
    })
    assert out["encoder.block.0.weight"].shape == (16, 1, 7)
    # convT mlx [I,K,O] -> [I,O,K]
    assert out["decoder.model.2.block.1.weight"].shape == (8, 12, 4)


def test_torch_parametrization_names():
    out = sanitize({
        "encoder.block.0.parametrizations.weight.original0": np.ones((4, 1, 1), np.float32),
        "encoder.block.0.parametrizations.weight.original1": np.ones((4, 2, 3), np.float32),
    })
    assert "encoder.block.0.weight" in out


def test_preprocess_lcm_padding(snac):
    # hop 4, lcm(vq_strides)=2 -> pad_to 8
    out = snac.preprocess(np.zeros(9, np.float32))
    assert out.shape == (1, 16)
    out = snac.preprocess(np.zeros(16, np.float32))
    assert out.shape == (1, 16)
