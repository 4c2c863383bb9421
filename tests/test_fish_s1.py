"""FishS1DAC tests: causal convs, dual RVQ, window transformers."""

import numpy as np
import pytest

from tpu_audio.codecs import load_codec
from tpu_audio.codecs.fish_s1_dac import FishS1DAC

from fixtures import make_fish_s1_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_codec(str(make_fish_s1_fixture(
        tmp_path_factory.mktemp("fish"))))


def test_factory(model):
    assert isinstance(model, FishS1DAC)
    assert model.config.hop_length == 4
    assert model.config.frame_length == 8
    p = model.params
    # weight norm folded, wrappers unwrapped
    assert "weight" in p["encoder"]["block"]["0"]
    assert "weight_v" not in p["encoder"]["block"]["0"]
    assert "pre_module" in p["quantizer"]
    assert "codebook" in p["quantizer"]["semantic_quantizer"][
        "quantizers"]["0"]


def test_encode_shapes(model):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(100) * 0.1).astype(np.float32)
    codes = np.asarray(model.encode(audio))
    # padded to 104 -> 26 latent frames -> 13 after 2x downsample
    assert codes.shape == (1, 3, 13)  # 1 semantic + 2 residual
    assert codes[0, 0].max() < model.config.semantic_codebook_size
    assert codes[0, 1:].max() < model.config.codebook_size


def test_decode_roundtrip(model):
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(96) * 0.1).astype(np.float32)
    out = model.reconstruct(audio)
    assert out.shape == (1, 96)
    assert np.isfinite(out).all()
    assert np.abs(out).max() <= 1.0


def test_semantic_only_decode(model):
    """decode handles a semantic-only code plane."""
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(64) * 0.1).astype(np.float32)
    codes = np.asarray(model.encode(audio))
    full = np.asarray(model.decode(codes))
    sem_only = np.asarray(model.decode(codes[:, :1]))
    assert full.shape == sem_only.shape
    assert not np.allclose(full, sem_only)


def test_deterministic(model):
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(80) * 0.1).astype(np.float32)
    a = model.reconstruct(audio)
    b = model.reconstruct(audio)
    np.testing.assert_array_equal(a, b)


def test_causal_prefix_property(model):
    """Causal codec: codes for a prefix match the full signal's prefix
    codes (up to the frame containing the boundary)."""
    rng = np.random.default_rng(4)
    audio = (rng.standard_normal(160) * 0.1).astype(np.float32)
    full = np.asarray(model.encode(audio))
    half = np.asarray(model.encode(audio[:80]))
    n = half.shape[2] - 1  # last frame sees the pad boundary
    np.testing.assert_array_equal(full[:, :, :n], half[:, :, :n])
