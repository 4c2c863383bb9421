"""FireRedASR2 tests: conformer AED encoder, greedy KV-cached decode."""

import numpy as np
import pytest

from tpu_audio.models.stt import load_model
from tpu_audio.models.stt.fireredasr import FireRedASR2, encoder_forward

from fixtures import make_firered_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_firered_fixture(
        tmp_path_factory.mktemp("firered"))))


def test_factory(model):
    assert isinstance(model, FireRedASR2)
    assert model.config.sos_id == 3 and model.config.eos_id == 4
    assert model.cmvn is not None
    # MLX conv2d layout mapped to torch [O, I, H, W]
    conv1 = model.params["encoder"]["input_preprocessor"]["conv1"]["weight"]
    assert np.asarray(conv1).shape == (8, 1, 3, 3)


def test_encoder_shapes(model):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((1, 20, 16)).astype(np.float32))
    enc = encoder_forward(model.params, feats, model.config)
    # +6 right context, two VALID k3 s2 convs: ((26-1)//2 -1)//2 = 5
    assert enc.shape == (1, 5, 16)
    assert np.isfinite(np.asarray(enc)).all()


def test_generate(model):
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    out = model.generate(audio)
    assert isinstance(out.text, str)
    out2 = model.generate(audio)
    assert out.text == out2.text


def test_eos_excluded_from_tokens(model):
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    out = model.generate(audio)
    assert model.config.eos_id not in out.segments[0].tokens


def test_empty_audio(model):
    out = model.generate(np.zeros(100, np.float32))
    assert out.text == ""


def test_resample_path(model):
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    out = model.generate(audio, sample_rate=8000)
    assert isinstance(out.text, str)
