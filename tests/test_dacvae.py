"""DACVAE tests: VAE bottleneck, main decoder path, watermark dropped."""

import numpy as np
import pytest

from tpu_audio.codecs import load_codec
from tpu_audio.codecs.dacvae import DACVAE

from fixtures import make_dacvae_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_codec(str(make_dacvae_fixture(
        tmp_path_factory.mktemp("dacvae"))))


def test_factory(model):
    assert isinstance(model, DACVAE)
    assert model.config.hop_length == 8
    p = model.params
    # watermarker rides the decoder (bare wm_model.* routed under it)
    assert "wm_model" in p["decoder"]
    assert "block_3" in p["decoder"]["blocks"]["0"]
    assert "weight_ih_l0" in p["decoder"]["wm_model"]["encoder_block"][
        "post_0"]["lstm"]["layers"]["0"]
    assert "weight" in p["quantizer_in_proj"]


def test_encode_shapes(model):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(804) * 0.1).astype(np.float32)
    z = np.asarray(model.encode(audio))
    # padded to 808 -> 101 frames, mean half of in_proj output (cb=4)
    assert z.shape == (1, 101, 4)
    assert np.isfinite(z).all()


def test_decode_roundtrip(model):
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(400) * 0.1).astype(np.float32)
    out = model.reconstruct(audio)
    assert out.shape == (1, 400)
    assert np.isfinite(out).all()
    assert np.abs(out).max() <= 1.0  # tanh


def test_mean_std_normalization(tmp_path_factory):
    """config mean/std shift the latent space symmetrically."""
    import json
    from pathlib import Path

    d = make_dacvae_fixture(tmp_path_factory.mktemp("dacvae_norm"))
    cfg = json.loads((Path(d) / "config.json").read_text())
    cfg.update(mean=1.5, std=2.0)
    (Path(d) / "config.json").write_text(json.dumps(cfg))
    m = load_codec(str(d))
    base = load_codec(str(make_dacvae_fixture(
        tmp_path_factory.mktemp("dacvae_base"))))
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(160) * 0.1).astype(np.float32)
    z_norm = np.asarray(m.encode(audio))
    z_raw = np.asarray(base.encode(audio))
    np.testing.assert_allclose(z_norm * 2.0 + 1.5, z_raw, atol=1e-5)
    # roundtrip identical: decode un-normalizes
    np.testing.assert_allclose(m.reconstruct(audio),
                               base.reconstruct(audio), atol=1e-5)


def test_watermark_decode(model):
    rng = np.random.default_rng(4)
    audio = (rng.standard_normal(400) * 0.1).astype(np.float32)
    z = model.encode(audio)
    base = np.asarray(model.decode(z))
    msg = model.random_message(1, seed=1)
    assert msg.shape == (1, 4) and set(np.unique(msg)) <= {0, 1}
    wm = np.asarray(model.decode(z, message=msg))
    assert wm.shape[1] <= base.shape[1]
    t = wm.shape[1]
    assert np.isfinite(wm).all()
    # watermark perturbs the waveform but stays a small delta
    diff = np.abs(wm[:, :t] - base[:, :t])
    assert diff.max() > 0
    # different messages give different watermarks
    wm2 = np.asarray(model.decode(z, message=1 - msg))
    assert not np.allclose(wm, wm2)


def test_deterministic(model):
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(240) * 0.1).astype(np.float32)
    a = model.reconstruct(audio)
    b = model.reconstruct(audio)
    np.testing.assert_array_equal(a, b)
