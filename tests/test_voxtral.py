"""VoxtralRealtime tests: frontend, lockstep decode, streaming parity."""

import numpy as np
import pytest

from tpu_audio.core.generation import STTGenerateParameters
from tpu_audio.models.stt import load_model
from tpu_audio.models.stt.voxtral import (
    VoxtralRealtime,
    num_audio_tokens,
)

from fixtures import make_voxtral_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_voxtral_fixture(
        tmp_path_factory.mktemp("voxtral"))))


def test_factory(model):
    assert isinstance(model, VoxtralRealtime)
    assert model.config.eos_token_id == 2
    # raw keys were remapped
    assert "transformer_layers" in model.params["encoder"]
    assert "ada_rms_norm_t_cond" in model.params["decoder"]["layers"]["0"]


def test_num_audio_tokens():
    # 12.5 Hz: 1280 samples/token; hop-aligned vs unaligned rounding
    assert num_audio_tokens(1280) == 1
    assert num_audio_tokens(16000) == 13  # 100 frames -> ceil(100/8)
    assert num_audio_tokens(1281) == 1    # ceil(1281/160 - 1) = 8 frames
    assert num_audio_tokens(0) == 0


def test_prepare_mel_even_frames(model):
    audio = np.zeros(1600, np.float32)
    mel, n_delay = model.prepare_mel(audio, None)
    assert n_delay == 1  # 80 ms at 12.5 Hz
    assert mel.shape[1] == model.config.num_mel_bins
    assert mel.shape[0] % 2 == 0


def test_generate(model):
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(1600).astype(np.float32) * 0.1
    out = model.generate(audio, STTGenerateParameters(max_tokens=32))
    assert out.prompt_token_count == 3  # 1 bos + 1 left pad + 1 delay
    assert isinstance(out.text, str)
    assert out.generation_token_count >= 0


def test_generate_deterministic(model):
    rng = np.random.default_rng(1)
    audio = rng.standard_normal(1600).astype(np.float32) * 0.1
    a = model.generate(audio, STTGenerateParameters(max_tokens=16))
    b = model.generate(audio, STTGenerateParameters(max_tokens=16))
    assert a.text == b.text


def test_streaming_matches_offline(model):
    """Single-block audio: the chunk-fed session must produce the same
    token sequence as the offline lockstep decode."""
    rng = np.random.default_rng(2)
    audio = rng.standard_normal(1600).astype(np.float32) * 0.1
    offline = model.generate(audio, STTGenerateParameters(max_tokens=64))

    session = model.make_stream_session(max_tokens=64)
    chunk = 480
    for s in range(0, len(audio), chunk):
        session.step(audio[s : s + chunk])
    session.finish()
    stream_text = session.text.strip()
    assert stream_text == offline.text


def test_streaming_feed_size_invariance(model):
    """Different chunk cadences must give identical transcripts."""
    rng = np.random.default_rng(3)
    audio = rng.standard_normal(2400).astype(np.float32) * 0.1
    texts = []
    for chunk in (320, 800):
        session = model.make_stream_session(max_tokens=64)
        for s in range(0, len(audio), chunk):
            session.step(audio[s : s + chunk])
        session.finish()
        texts.append(session.text)
    assert texts[0] == texts[1]


def test_chunked_encoder_long_audio(model):
    """Audio exceeding the encoder sliding window takes the chunked path."""
    rng = np.random.default_rng(4)
    audio = rng.standard_normal(8000).astype(np.float32) * 0.1
    mel, _ = model.prepare_mel(audio, None)
    adapter, n_total = model.encode_audio(mel)
    assert adapter.shape[0] == n_total
    assert n_total > model.config.encoder.sliding_window // 4


def test_generate_stream_events(model):
    rng = np.random.default_rng(5)
    audio = rng.standard_normal(1600).astype(np.float32) * 0.1
    events = list(model.generate_stream(
        audio, STTGenerateParameters(max_tokens=32)))
    assert events[-1]["type"] == "result"
    joined = "".join(e["text"] for e in events if e["type"] == "token")
    assert joined.strip() == events[-1]["output"].text
