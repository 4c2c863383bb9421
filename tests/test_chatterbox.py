"""Chatterbox tests: conditioning encoder, VE embedding, T3 CFG decode,
full two-stage generate (T3 -> S3Gen -> HiFT)."""

import numpy as np
import pytest

from tpu_audio.core.generation import AudioGenerateParameters
from tpu_audio.models.tts import load_model
from tpu_audio.models.tts.chatterbox import (
    Chatterbox,
    normalize_loudness,
    trim_silence,
    voice_encoder_mel,
)

from fixtures import make_chatterbox_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_chatterbox_fixture(
        tmp_path_factory.mktemp("chatterbox"))))


def test_factory(model):
    assert isinstance(model, Chatterbox)
    assert not model.config.is_turbo
    assert model.cfg_weight == 0.5
    assert model.default_conditioning is not None
    assert model.default_conditioning.prompt_speech_tokens.shape == (1, 4)


def test_sanitize_routing(model):
    p = model.params
    # t3.tfmr.model.* stripped to t3.tfmr.*; lm_head dropped
    assert "layers" in p["t3"]["tfmr"] and "model" not in p["t3"]["tfmr"]
    assert "lm_head" not in p["t3"]["tfmr"]
    # VE lstm keys converted to nn.lstm names
    assert "weight_ih" in p["ve"]["lstm1"]
    assert "bias_hh" in p["ve"]["lstm1"]
    # s3gen.flow.* flattened, speaker encoder remapped
    assert "input_embedding" in p["s3gen"]
    assert "block0" in p["s3gen"]["speaker_encoder"]["head"] or \
        "conv1" in p["s3gen"]["speaker_encoder"]["head"]


def test_normalize_loudness():
    quiet = np.full(16000, 0.001, np.float32)
    loud = normalize_loudness(quiet, -27.0)
    rms = np.sqrt((loud ** 2).mean())
    lufs = -0.691 + 20 * np.log10(rms)
    assert abs(lufs - (-27.0)) < 0.5


def test_trim_silence():
    audio = np.zeros(32000, np.float32)
    audio[12000:20000] = np.sin(np.arange(8000) / 10) * 0.5
    trimmed = trim_silence(audio, 20.0)
    assert len(trimmed) < len(audio)
    assert np.abs(trimmed).max() > 0.4


def test_voice_encoder_mel():
    audio = np.sin(np.arange(16000) / 15).astype(np.float32)
    mel = voice_encoder_mel(audio, is_turbo=False)
    assert mel.shape[1] == 40
    assert np.isfinite(mel).all()


def test_t3_generate_cfg(model):
    cond = model.default_conditioning
    ids = np.asarray([[38, 5, 6, 0]], np.int32)
    toks = model.t3_generate(ids, cond,
                             AudioGenerateParameters(max_tokens=6,
                                                     temperature=0.0))
    assert len(toks) <= 6
    assert all(0 <= t < 20 and t != 17 for t in toks)


def test_generate_default_voice(model):
    audio = model.generate(
        "hello world",
        generation_parameters=AudioGenerateParameters(max_tokens=6,
                                                      temperature=0.0))
    assert audio.ndim == 1 and len(audio) > 0
    assert np.isfinite(audio).all()
    assert np.abs(audio).max() <= 0.95 + 1e-5  # peak normalized


def test_generate_with_ref_audio(model):
    ref = (np.sin(np.arange(24000) / 12) * 0.4).astype(np.float32)
    audio = model.generate(
        "hello", ref_audio=ref,
        generation_parameters=AudioGenerateParameters(max_tokens=4,
                                                      temperature=0.0))
    assert len(audio) > 0 and np.isfinite(audio).all()
