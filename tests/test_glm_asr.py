"""GLM-ASR tests: audio encoder merge, prompt splice, decode loop."""

import numpy as np
import pytest

from tpu_audio.models.stt import load_model
from tpu_audio.models.stt.glm_asr import (
    GLMASR,
    USER_PREFIX,
    USER_SUFFIX,
    _glm_log_mel,
)

from fixtures import make_glm_asr_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_glm_asr_fixture(tmp_path_factory.mktemp("glm"))))


def test_factory_sanitize(model):
    assert isinstance(model, GLMASR)
    p = model.params
    assert "fc1" in p["audio_encoder"]["adapting"]  # adapting.0 renamed
    assert "language_model" in p
    assert "lm_head" in p["language_model"]
    assert model.config.lm.rope_interleaved  # rope_traditional mapped


def test_log_mel_keeps_last_frame():
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(1600) * 0.1).astype(np.float32)
    mel = np.asarray(_glm_log_mel(audio, 8))
    # center-padded stft: 1600/160 + 1 frames, NOT dropped to 10
    assert mel.shape == (11, 8)
    assert mel.max() <= (mel.max() - 8.0 + 4.0) / 4.0 + 8  # finite / scaled


def test_audio_embeds_shape(model):
    import jax.numpy as jnp
    from tpu_audio.models.stt.glm_asr import audio_encoder_forward

    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((1, 20, 8)).astype(np.float32))
    emb = audio_encoder_forward(model.params, mel, model.config)
    # conv2 stride 2 -> 10 frames, merge 2 -> (10-2)//2+1 = 5
    assert emb.shape == (1, 5, 32)


def test_generate(model):
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    out = model.generate(audio)
    assert isinstance(out.text, str)
    assert out.prompt_token_count > 5
    out2 = model.generate(audio)
    assert out.text == out2.text


def test_prompt_template_tokens(model):
    pre = model.tokenizer.encode(USER_PREFIX).ids
    suf = model.tokenizer.encode(USER_SUFFIX).ids
    assert len(pre) == 2  # <|user|> <|begin_of_audio|>
    assert len(suf) == 8  # <|end_of_audio|> + 6 words + <|assistant|>


def test_empty_audio(model):
    out = model.generate(np.zeros(10, np.float32))
    assert out.text == ""


def test_max_tokens(model):
    from tpu_audio.core.generation import STTGenerateParameters

    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    out = model.generate(audio, STTGenerateParameters(max_tokens=4))
    assert out.generation_token_count <= 4
