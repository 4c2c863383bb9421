"""BigVGAN tests: kaiser-sinc filters, anti-aliased resampling, vocoding."""

import numpy as np
import pytest

from tpu_audio.codecs import load_codec
from tpu_audio.codecs.bigvgan import (
    BigVGAN,
    _downsample2x,
    _upsample2x,
    kaiser_sinc_filter1d,
)

from fixtures import make_bigvgan_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_codec(str(make_bigvgan_fixture(
        tmp_path_factory.mktemp("bigvgan"))))


def test_kaiser_sinc_filter_properties():
    f = kaiser_sinc_filter1d(0.25, 0.3, 12)
    assert f.shape == (12,)
    np.testing.assert_allclose(f.sum(), 1.0, atol=1e-6)  # DC gain 1
    # symmetric for even kernels with half-sample offset
    np.testing.assert_allclose(f, f[::-1], atol=1e-6)
    assert kaiser_sinc_filter1d(0.0, 0.3, 12).sum() == 0.0


def test_up_down_sample_roundtrip_dc():
    """A constant signal must survive upsample->downsample unchanged in
    the interior (anti-aliasing filters have unit DC gain)."""
    import jax.numpy as jnp

    x = jnp.ones((1, 64, 3), jnp.float32) * 0.7
    up = _upsample2x(x, 2)
    assert up.shape == (1, 128, 3)
    np.testing.assert_allclose(np.asarray(up)[0, 20:100], 0.7, atol=1e-4)
    down = _downsample2x(up, 2)
    assert down.shape == (1, 64, 3)
    np.testing.assert_allclose(np.asarray(down)[0, 10:50], 0.7, atol=1e-4)


def test_factory_weight_norm_folded(model):
    assert isinstance(model, BigVGAN)
    p = model.params
    assert "weight" in p["conv_pre"] and "weight_v" not in p["conv_pre"]
    assert np.asarray(p["conv_pre"]["weight"]).shape == (16, 8, 7)
    # torch convT layout preserved for ups
    assert np.asarray(p["ups"]["0"]["0"]["weight"]).shape == (16, 8, 8)


def test_decode_shape_and_range(model):
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 20, 8)).astype(np.float32)
    wav = np.asarray(model.decode(mel))
    assert wav.shape == (1, 20 * 8)  # total upsample 4*2 = 8
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() <= 1.0  # tanh final


def test_decode_accepts_mel_first_layout(model):
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 20, 8)).astype(np.float32)
    a = np.asarray(model.decode(mel))
    b = np.asarray(model.decode(mel.transpose(0, 2, 1)))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_decode_deterministic_and_batch(model):
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((2, 16, 8)).astype(np.float32)
    wav = np.asarray(model.decode(mel))
    assert wav.shape == (2, 128)
    single = np.asarray(model.decode(mel[:1]))
    np.testing.assert_allclose(wav[0], single[0], atol=1e-5)


def test_encode_raises(model):
    with pytest.raises(NotImplementedError):
        model.encode(np.zeros(100, np.float32))
