"""GraniteSpeech tests: frontend, block-attention encoder, QFormer, LLM."""

import numpy as np
import pytest

from tpu_audio.models.stt import load_model
from tpu_audio.models.stt.granite import GraniteSpeech, _granite_mel

from fixtures import make_granite_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_granite_fixture(
        tmp_path_factory.mktemp("granite"))))


def test_factory(model):
    assert isinstance(model, GraniteSpeech)
    assert model.config.text.embedding_multiplier == 12.0
    assert model.config.text.logits_scaling == 8.0
    assert model.eos_token_id == 87


def test_frontend_stacked_frames():
    import jax.numpy as jnp

    audio = np.sin(np.arange(16000) / 30).astype(np.float32)
    feats = np.asarray(_granite_mel(jnp.asarray(audio)))
    assert feats.shape[1] == 160  # two stacked 80-mel frames
    # max-floored normalization: values in (max-8)/4+1 .. max/4+1 window
    assert feats.max() - feats.min() <= 2.0 + 1e-5


def test_audio_token_count(model):
    audio = np.zeros(16000, np.float32)
    feats, n_tokens = model.extract_features(audio)
    ws, dr = model.config.window_size, model.config.downsample_rate
    import math

    assert n_tokens == math.ceil(feats.shape[0] / ws) * (ws // dr)


def test_encoder_bucket_invariance(model):
    """Extra context-size blocks of padding must not change valid frames."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    t = 13
    feats = rng.standard_normal((t, 160)).astype(np.float32) * 0.2
    cs = model.config.encoder.context_size
    a = np.zeros((1, cs * 2, 160), np.float32)
    a[0, :t] = feats
    b = np.zeros((1, cs * 4, 160), np.float32)
    b[0, :t] = feats
    lengths = jnp.asarray([t], jnp.int32)
    ea = np.asarray(model._encoder(model.params, jnp.asarray(a), lengths))
    eb = np.asarray(model._encoder(model.params, jnp.asarray(b), lengths))
    np.testing.assert_allclose(ea[0, :t], eb[0, :t], atol=2e-2)


def test_projector_shape(model):
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    enc = rng.standard_normal((1, 20, 12)).astype(np.float32) * 0.2
    out = np.asarray(model._projector(model.params, jnp.asarray(enc)))
    # ceil(20/15)=2 windows x 3 queries
    assert out.shape == (1, 6, 16)


def test_prompt_has_audio_run(model):
    ids = model.build_prompt(4, None, None)
    audio_id = model.config.audio_token_index
    assert ids.count(audio_id) == 4


def test_generate(model):
    from tpu_audio.core.generation import STTGenerateParameters

    rng = np.random.default_rng(2)
    audio = rng.standard_normal(8000).astype(np.float32) * 0.1
    out = model.generate(audio, STTGenerateParameters(max_tokens=6))
    assert out.generation_token_count <= 6
    assert isinstance(out.text, str)
    assert out.prompt_token_count > 4


def test_generate_deterministic(model):
    from tpu_audio.core.generation import STTGenerateParameters

    rng = np.random.default_rng(3)
    audio = rng.standard_normal(8000).astype(np.float32) * 0.1
    a = model.generate(audio, STTGenerateParameters(max_tokens=5))
    b = model.generate(audio, STTGenerateParameters(max_tokens=5))
    assert a.text == b.text
