"""Qwen3-TTS tests: codec decoder offline/streaming parity, talker macro
step, end-to-end generate + streaming events."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.codecs.qwen3_codec import (
    Qwen3CodecDecoder,
    init_streaming_state,
)
from tpu_audio.core.generation import AudioGenerateParameters, AudioGenerationKind
from tpu_audio.models.tts import load_model
from tpu_audio.models.tts.qwen3_tts import Qwen3TTS

from fixtures import make_qwen3_tts_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = make_qwen3_tts_fixture(tmp_path_factory.mktemp("qwen3tts"))
    return load_model(str(path), dtype=jnp.float32)


def test_factory(model):
    assert isinstance(model, Qwen3TTS)
    assert model.codec is not None
    assert model.config.talker.num_code_groups == 4
    assert model.config.tts_model_type == "custom_voice"


def test_codec_offline_decode_shape(model):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 32, (1, 4, 10)).astype(np.int32)
    wav = np.asarray(model.codec.decode(codes))
    # total upsample = 2 (ratio) * 2 * 2 (rates) = 8
    assert wav.shape == (1, 80)
    assert np.abs(wav).max() <= 1.0
    assert np.isfinite(wav).all()


def test_codec_streaming_matches_offline(model):
    """Chunked streaming decode must be frame-identical to one-shot decode
    (the causal-conv state-carry invariant; reference streamingStep)."""
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 32, (1, 4, 12)).astype(np.int32)
    offline = np.asarray(model.codec.decode(codes))

    model.codec.reset_streaming_state()
    chunks = []
    for s, e in [(0, 3), (3, 4), (4, 9), (9, 12)]:
        chunks.append(np.asarray(model.codec.streaming_step(codes[:, :, s:e])))
    streamed = np.concatenate(chunks, axis=-1)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, atol=1e-5)


def test_prepare_generation_inputs(model):
    embeds, trailing, pad = model.prepare_generation_inputs("hello world")
    assert embeds.ndim == 3 and embeds.shape[0] == 1
    assert trailing.shape[0] == 1
    assert pad.shape[:2] == (1, 1)
    # custom voice speaker path
    e2, _, _ = model.prepare_generation_inputs("hello", speaker="vivian")
    assert e2.shape[1] == embeds.shape[1] + 1  # speaker embed inserted


def test_generate_end_to_end(model):
    params = AudioGenerateParameters(max_tokens=6, temperature=0.0, seed=0)
    audio = model.generate("hello world", generation_parameters=params)
    assert audio.ndim == 1
    assert len(audio) % 8 == 0 and len(audio) > 0
    assert np.isfinite(audio).all()


def test_generate_deterministic(model):
    params = AudioGenerateParameters(max_tokens=5, temperature=0.0, seed=1)
    a = model.generate("hello", generation_parameters=params)
    b = model.generate("hello", generation_parameters=params)
    np.testing.assert_array_equal(a, b)


def test_generate_stream_chunks_match_offline(model):
    params = AudioGenerateParameters(max_tokens=6, temperature=0.0, seed=0,
                                     streaming_interval=0.16)  # 2 codec frames
    offline = model.generate("hello world", generation_parameters=params)
    events = list(model.generate_stream("hello world",
                                        generation_parameters=params))
    audio_chunks = [e.audio for e in events if e.kind == AudioGenerationKind.AUDIO]
    assert len(audio_chunks) >= 2
    streamed = np.concatenate(audio_chunks)
    np.testing.assert_allclose(streamed, offline, atol=1e-5)
    info = events[-1].info
    assert info.generation_token_count == len(offline) // 8


def test_voice_parsing(model):
    assert model._parse_voice("vivian, speak slowly") == ("vivian", "speak slowly")
    assert model._parse_voice("vivian") == ("vivian", None)
    assert model._parse_voice(None) == (None, None)
