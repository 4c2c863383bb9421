"""Voice-agent example test: VAD -> STT -> reply -> TTS pipeline wired
through the streaming PCM converter and AudioPlayer (SimpleChat
equivalent)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))

from fixtures import (  # noqa: E402
    FakeWhisperTokenizer,
    make_kokoro_fixture,
    make_silero_fixture,
    make_whisper_fixture,
)


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    from tpu_audio.models.stt import load_model as load_stt
    from tpu_audio.models.tts import load_model as load_tts
    from tpu_audio.models.vad.silero import SileroVAD

    base = tmp_path_factory.mktemp("agent")
    vad = SileroVAD.from_pretrained(str(make_silero_fixture(base / "vad")))
    stt = load_stt(str(make_whisper_fixture(base / "stt")))
    stt.tokenizer = FakeWhisperTokenizer(vocab=stt.config.vocab_size)
    tts = load_tts(str(make_kokoro_fixture(base / "tts")))
    return vad, stt, tts


def test_agent_pipeline(models):
    import voice_agent

    vad, stt, tts = models
    rng = np.random.default_rng(0)
    # loud noise bursts separated by silence -> VAD segments
    audio = np.zeros(32000, np.float32)
    audio[4000:12000] = rng.standard_normal(8000).astype(np.float32) * 0.5
    audio[20000:28000] = rng.standard_normal(8000).astype(np.float32) * 0.5

    sink = []
    # tiny kokoro fixture has a short position table; keep replies short
    turns = voice_agent.run_agent(
        audio, 16000, vad, stt, tts, player_sink=sink.append, verbose=False,
        respond=lambda t: "ok" if t else "hm")
    assert len(turns) >= 1
    for transcript, reply, wav in turns:
        assert isinstance(transcript, str)
        assert len(wav) > 0 and np.isfinite(wav).all()
    total = sum(len(c) for c in sink)
    assert total == sum(len(w) for _, _, w in turns)
    # first scheduled chunk was faded in from zero
    assert sink[0][0] == 0.0


def test_agent_resample_input(models):
    """48 kHz input goes through the streaming converter to 16 kHz."""
    import voice_agent

    vad, stt, tts = models
    rng = np.random.default_rng(1)
    audio = np.zeros(96000, np.float32)
    audio[12000:36000] = rng.standard_normal(24000).astype(np.float32) * 0.5
    turns = voice_agent.run_agent(audio, 48000, vad, stt, tts,
                                  verbose=False, respond=lambda t: "ok")
    assert len(turns) >= 1


def test_default_respond():
    import voice_agent

    assert voice_agent.default_respond("hello") == "You said: hello"
    assert "catch" in voice_agent.default_respond("  ")


def test_custom_responder(models):
    import voice_agent

    vad, stt, tts = models
    rng = np.random.default_rng(2)
    audio = np.zeros(24000, np.float32)
    audio[4000:16000] = rng.standard_normal(12000).astype(np.float32) * 0.5
    turns = voice_agent.run_agent(
        audio, 16000, vad, stt, tts, verbose=False,
        respond=lambda t: "w1 w2")
    assert all(reply == "w1 w2" for _, reply, _ in turns)
