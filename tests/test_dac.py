"""Descript DAC tests: RVQ residual-space projection, roundtrip shapes."""

import numpy as np
import pytest

from tpu_audio.codecs import load_codec
from tpu_audio.codecs.dac import DescriptDAC

from fixtures import make_dac_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_codec(str(make_dac_fixture(tmp_path_factory.mktemp("dac"))))


def test_factory(model):
    assert isinstance(model, DescriptDAC)
    assert model.config.hop_length == 8
    assert model.config.resolved_latent_dim == 32
    # weight norm folded + .layers. stripped
    assert "weight" in model.params["encoder"]["block"]["0"]
    assert "weight_v" not in model.params["encoder"]["block"]["0"]


def test_encode_shapes(model):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(804) * 0.1).astype(np.float32)
    codes = np.asarray(model.encode(audio))
    # padded to 808 -> 101 frames, 3 codebooks
    assert codes.shape == (1, 3, 101)
    assert codes.min() >= 0 and codes.max() < model.config.codebook_size


def test_n_quantizers_subset(model):
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(160) * 0.1).astype(np.float32)
    c1 = np.asarray(model.encode(audio, n_quantizers=1))
    c3 = np.asarray(model.encode(audio, n_quantizers=3))
    assert c1.shape[1] == 1 and c3.shape[1] == 3
    # level 0 identical regardless of RVQ depth
    np.testing.assert_array_equal(c1[:, 0], c3[:, 0])


def test_decode_roundtrip(model):
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(400) * 0.1).astype(np.float32)
    out = model.reconstruct(audio)
    assert out.shape == (1, 400)
    assert np.isfinite(out).all()
    assert np.abs(out).max() <= 1.0  # tanh output


def test_decode_fewer_codebooks(model):
    """fromCodes handles any number of leading codebooks."""
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(160) * 0.1).astype(np.float32)
    codes = np.asarray(model.encode(audio))
    full = np.asarray(model.decode(codes))
    partial = np.asarray(model.decode(codes[:, :1]))
    assert full.shape == partial.shape
    assert not np.allclose(full, partial)


def test_deterministic(model):
    rng = np.random.default_rng(4)
    audio = (rng.standard_normal(240) * 0.1).astype(np.float32)
    a = model.reconstruct(audio)
    b = model.reconstruct(audio)
    np.testing.assert_array_equal(a, b)
