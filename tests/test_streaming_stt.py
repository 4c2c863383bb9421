"""Qwen3-ASR + streaming subsystem tests: window encoding, audio-feature
splicing, end-to-end generate, incremental-mel parity (the reference's
streaming-vs-offline front-end equivalence invariant), session promotion."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.core.generation import STTGenerateParameters
from tpu_audio.models.stt import load_model
from tpu_audio.models.stt.qwen3_asr import Qwen3ASR, feat_extract_output_lengths
from tpu_audio.models.stt.streaming import (
    DelayPreset,
    EventKind,
    IncrementalMelSpectrogram,
    StreamingEncoder,
    StreamingInferenceSession,
)

from fixtures import make_qwen3_asr_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(
        str(make_qwen3_asr_fixture(tmp_path_factory.mktemp("qwen3asr"))),
        dtype=jnp.float32)


def _audio(seed, n=8000):
    return (np.random.default_rng(seed).standard_normal(n) * 0.1).astype(np.float32)


def test_factory_and_config(model):
    assert isinstance(model, Qwen3ASR)
    assert model.config.audio_token_id == 70
    assert model.config.text.qk_norm


def test_feat_lengths():
    assert int(feat_extract_output_lengths(np.asarray(8))) == 1
    assert int(feat_extract_output_lengths(np.asarray(100))) == 13


def test_encode_window_shapes(model):
    mel = np.random.default_rng(0).standard_normal((16, 16)).astype(np.float32)
    out = model.encode_single_window(mel)
    # 16 frames -> 2 conv chunks of 8 -> 1 token each
    assert out.shape == (2, model.config.audio.output_dim)
    # partial window
    out2 = model.encode_single_window(mel[:8])
    assert out2.shape == (1, model.config.audio.output_dim)


def test_prompt_and_merge(model):
    ids = model.build_prompt(3, language="English")
    assert ids.count(70) == 3  # audio pads
    feats = np.ones((3, 24), np.float32)
    embeds = model._merge_audio_features(np.asarray([ids], np.int32), feats)
    pos = [i for i, t in enumerate(ids) if t == 70]
    np.testing.assert_allclose(embeds[0, pos[0]], feats[0])


def test_generate_end_to_end(model):
    out = model.generate(_audio(1), STTGenerateParameters(max_tokens=6))
    assert out.total_time > 0
    assert isinstance(out.text, str)
    assert out.generation_token_count <= 6


def test_parse_output():
    assert Qwen3ASR._parse_output("language English<asr_text>hi there", None) \
        == ("English", "hi there")
    assert Qwen3ASR._parse_output("plain text", None) == ("English", "plain text")
    assert Qwen3ASR._parse_output("", None) == (None, "")
    assert Qwen3ASR._parse_output("language X<asr_text>abc", "French") \
        == ("French", "abc")


# ---------------------------------------------------------------------------
# Incremental mel parity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("chunks", [[1600, 173, 27200, 1, 999, 7680]])
def test_incremental_mel_matches_one_shot(chunks):
    """Adversarial chunk sizes must give identical mel to feeding the whole
    signal at once (the streaming-vs-offline front-end equivalence pattern,
    VoxtralRealtimeStreamingFrontEndTests.swift:1-47)."""
    rng = np.random.default_rng(3)
    total = sum(chunks)
    audio = (rng.standard_normal(total) * 0.2).astype(np.float32)

    inc = IncrementalMelSpectrogram(n_mels=32)
    frames = []
    pos = 0
    for c in chunks:
        out = inc.process(audio[pos : pos + c])
        if out is not None:
            frames.append(out)
        pos += c
    streamed = np.concatenate(frames, axis=0)

    one_shot = IncrementalMelSpectrogram(n_mels=32).process(audio)
    assert streamed.shape == one_shot.shape
    np.testing.assert_allclose(streamed, one_shot, atol=1e-5)


def test_one_sample_chunks():
    inc = IncrementalMelSpectrogram(n_mels=16)
    audio = (np.random.default_rng(4).standard_normal(2000) * 0.1).astype(np.float32)
    frames = []
    out = inc.process(audio[:500])
    if out is not None:
        frames.append(out)
    for i in range(500, 520):  # 1-sample chunks (IncrementalMelSpectrogramTests)
        out = inc.process(audio[i : i + 1])
        if out is not None:
            frames.append(out)
    out = inc.process(audio[520:])
    if out is not None:
        frames.append(out)
    total = sum(f.shape[0] for f in frames)
    # 200-sample reflect prefix on the first chunk
    assert total == (2000 + 200 - 400) // 160 + 1


# ---------------------------------------------------------------------------
# Streaming encoder + session
# ---------------------------------------------------------------------------


def test_streaming_encoder_window_accounting():
    calls = []

    def fake_encode(mel):
        calls.append(mel.shape[0])
        return np.ones((mel.shape[0] // 4, 8), np.float32)

    enc = StreamingEncoder(fake_encode, window_size=16)
    assert enc.feed(np.ones((10, 4), np.float32)) == 0
    assert enc.pending_frames == 10
    assert enc.feed(np.ones((10, 4), np.float32)) == 1  # 20 -> 1 window + 4
    assert enc.pending_frames == 4
    feats = enc.encoded_features()
    assert feats.shape[0] == 4 + 1  # window tokens + pending tokens
    assert calls == [16, 4]


def test_session_provisional_to_confirmed(model):
    session = StreamingInferenceSession(
        model, delay_preset=DelayPreset.REALTIME, min_agreement_passes=2,
        max_tokens_per_pass=4)
    session.delay = 0.0  # no wall-clock wait in tests
    session.feed_audio(_audio(5, 4000))
    ev1 = session.decode_pass()
    assert any(e.kind == EventKind.PROVISIONAL for e in ev1)
    ev2 = session.decode_pass()
    kinds = [e.kind for e in ev1 + ev2]
    # same audio, greedy decode -> identical passes -> confirmation
    prov_texts = [e.text for e in ev1 + ev2 if e.kind == EventKind.PROVISIONAL]
    if prov_texts[0]:
        assert EventKind.CONFIRMED in kinds
    final = session.stop()
    assert final[-1].kind == EventKind.ENDED
    stats = [e for e in final if e.kind == EventKind.STATS][0].stats
    assert stats["decode_passes"] == 2
    assert stats["real_time_factor"] > 0


def test_split_audio_into_chunks_energy_cuts():
    from tpu_audio.models.stt.qwen3_asr import split_audio_into_chunks

    sr = 1000
    rng = np.random.default_rng(0)
    # 10 s of loud noise with a silent valley at 3.5-3.7 s; max chunk 4 s
    wav = (rng.standard_normal(10 * sr) * 0.5).astype(np.float32)
    wav[3500:3700] = 0.0
    chunks = split_audio_into_chunks(wav, sr, chunk_duration=4.0,
                                     search_expand_sec=1.0)
    # cut lands inside the silent valley, not at the nominal 4.0 s mark
    first, off0 = chunks[0]
    assert off0 == 0.0
    assert 3400 <= len(first) <= 3800
    # offsets tile the waveform exactly
    total = sum(len(c) for c, _ in chunks)
    assert total == len(wav)
    for (c, off), (_, off_next) in zip(chunks, chunks[1:]):
        assert off_next == pytest.approx(off + len(c) / sr)


def test_split_audio_into_chunks_short_and_pad():
    from tpu_audio.models.stt.qwen3_asr import split_audio_into_chunks

    sr = 1000
    # shorter than min_chunk_duration -> zero-padded up to it
    chunks = split_audio_into_chunks(np.ones(300, np.float32), sr,
                                     chunk_duration=4.0,
                                     min_chunk_duration=1.0)
    assert len(chunks) == 1
    assert len(chunks[0][0]) == sr
    assert chunks[0][0][300:].max() == 0.0
    # stereo is mixed down
    st = np.ones((500, 2), np.float32)
    (c, off), = split_audio_into_chunks(st, sr, chunk_duration=4.0)
    assert c.ndim == 1
