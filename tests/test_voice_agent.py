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


def test_incomplete_utterance_buffering(models, tmp_path_factory,
                                        monkeypatch):
    """SmartTurn-gated turns: incomplete segments merge into the next one
    (SimpleChat incomplete-utterance handling)."""
    import voice_agent
    from fixtures import make_smart_turn_fixture

    from tpu_audio.models.vad import segmenter
    from tpu_audio.models.vad.smart_turn import SmartTurn

    vad, stt, tts = models
    st = SmartTurn.from_pretrained(str(make_smart_turn_fixture(
        tmp_path_factory.mktemp("st"))))
    # the fixture VAD has random weights; pin two deterministic segments
    monkeypatch.setattr(
        segmenter, "segment_speech",
        lambda audio, sr, vad_model, **kw: [(audio[4000:12000], 4000),
                                            (audio[36000:44000], 36000)])

    calls = []
    real = st.predict_endpoint

    def spy(audio, **kw):
        out = real(audio, **kw)
        # force "incomplete" on the first call, complete afterwards
        out = type(out)(prediction=len(calls) >= 1,
                        probability=out.probability)
        calls.append(len(audio))
        return out

    st.predict_endpoint = spy
    rng = np.random.default_rng(3)
    # bursts > merge_gap_s (1 s) apart so the VAD yields two segments
    audio = np.zeros(64000, np.float32)
    audio[4000:12000] = rng.standard_normal(8000).astype(np.float32) * 0.5
    audio[36000:44000] = rng.standard_normal(8000).astype(np.float32) * 0.5
    turns = voice_agent.run_agent(audio, 16000, vad, stt, tts,
                                  smart_turn=st, verbose=False,
                                  respond=lambda t: "ok")
    assert len(calls) >= 2
    # the second endpoint call saw the merged (buffered + new) audio
    assert calls[1] > calls[0]
    assert len(turns) == 1


def test_barge_in_truncates_previous_reply(models, monkeypatch):
    """A user segment starting while the previous reply is still playing
    cuts that reply at the interruption point (SimpleChat interruption,
    ConversationController.swift:345-351 + stopSpeaking)."""
    import voice_agent

    vad, stt, tts = models
    sr = 16000
    # craft a long reply so playback spans past the next user segment
    long_reply = np.zeros(tts.sample_rate * 100, np.float32)
    monkeypatch.setattr(tts, "generate", lambda text, **kw: long_reply)
    rng = np.random.default_rng(0)
    audio = np.zeros(sr * 6, np.float32)
    # two clearly separated speech bursts
    audio[sr : sr * 2] = rng.standard_normal(sr) * 0.5
    audio[sr * 4 : sr * 5] = rng.standard_normal(sr) * 0.5
    turns = voice_agent.run_agent(audio, sr, vad, stt, tts, verbose=False)
    if len(turns) >= 2:
        # first reply truncated to the gap before the second user segment
        assert len(turns[0][2]) < len(long_reply)
        # second reply untouched
        assert len(turns[-1][2]) == len(long_reply)


def test_llm_responder(tmp_path):
    """make_llm_responder loads a llama checkpoint and greedily decodes a
    non-empty reply in one jitted loop (the SimpleChat local-LLM slot)."""
    from fixtures import make_llama_tts_fixture

    sys.path.insert(0, "examples")
    from voice_agent import make_llm_responder

    d = make_llama_tts_fixture(tmp_path / "llm")
    respond = make_llm_responder(str(d), max_tokens=8)
    out = respond("hello there")
    assert isinstance(out, str) and len(out) > 0
    # deterministic greedy decode
    assert respond("hello there") == out
