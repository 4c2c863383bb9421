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


class FakeClock:
    """Deterministic wall clock for pacing the session's decode cadence."""

    def __init__(self):
        self.t = 0.0

    def advance(self, dt):
        self.t += dt

    def __call__(self):
        return self.t


def test_session_token_promotion_and_cadence(model):
    from tpu_audio.models.stt.streaming import StreamingConfig

    clock = FakeClock()
    config = StreamingConfig(delay_seconds=0.0, min_agreement_passes=2,
                             max_tokens_per_pass=4,
                             decode_interval_seconds=1.0,
                             finalize_completed_windows=False)
    session = StreamingInferenceSession(model, config=config, clock=clock)
    events = []
    # repeated identical passes over the same pending audio promote tokens
    for _ in range(3):
        events += session.feed_audio(_audio(5, 4000))
        clock.advance(1.5)  # past the decode interval -> next feed decodes
    kinds = [e.kind for e in events]
    assert EventKind.DISPLAY_UPDATE in kinds
    # promotion bookkeeping stays consistent (token-level promotion itself
    # is pinned by test_promote_tokens_delay_and_agreement)
    state = session.core.state
    assert len(state.provisional_ids) == len(state.first_seen) \
        == len(state.agreement)
    final = session.stop()
    assert final[-1].kind == EventKind.ENDED
    stats = [e for e in final if e.kind == EventKind.STATS][0].stats
    assert stats["decode_passes"] >= 2
    assert stats["real_time_factor"] >= 0


def test_session_decode_interval_gates_passes(model):
    from tpu_audio.models.stt.streaming import StreamingConfig

    clock = FakeClock()
    config = StreamingConfig(decode_interval_seconds=10.0,
                             finalize_completed_windows=False,
                             max_tokens_per_pass=4)
    session = StreamingInferenceSession(model, config=config, clock=clock)
    session.feed_audio(_audio(3, 4000))  # first pass runs immediately
    passes0 = session.core._passes
    # within the interval: no new pass
    session.feed_audio(_audio(3, 4000))
    assert session.core._passes == passes0
    clock.advance(11.0)
    session.feed_audio(_audio(3, 4000))
    assert session.core._passes == passes0 + 1


def test_session_boundary_boost_and_finalize(model):
    """Completing an encoder window triggers (a) an immediate finalize pass
    appended to completed text and (b) the boundary-boost fast cadence."""
    from tpu_audio.models.stt.streaming import StreamingConfig

    clock = FakeClock()
    config = StreamingConfig(decode_interval_seconds=5.0,
                             boundary_decode_interval_seconds=0.1,
                             boundary_boost_seconds=2.0,
                             max_tokens_per_pass=4,
                             finalize_completed_windows=True)
    session = StreamingInferenceSession(model, config=config, clock=clock)
    window = session.core.encoder.window_size  # mel frames per window
    # enough samples to complete one window: frames*hop + fft
    n = window * 160 + 400
    events = session.feed_audio(_audio(9, n))
    assert session.core.encoder.encoded_window_count >= 1
    # finalize pass emitted a display update with confirmed text only
    finals = [e for e in events if e.kind == EventKind.DISPLAY_UPDATE]
    assert finals and finals[-1].text == ""
    # boost cadence active: a pass within boundary interval but below the
    # normal interval still runs
    passes0 = session.core._passes
    clock.advance(0.2)
    session.feed_audio(_audio(3, 2000))
    assert session.core._passes >= passes0 + 1


def test_cohere_streaming_core(tmp_path):
    from fixtures import make_cohere_fixture

    from tpu_audio.models.stt.cohere import CohereTranscribe
    from tpu_audio.models.stt.streaming import StreamingConfig

    d = make_cohere_fixture(tmp_path / "c")
    model = CohereTranscribe.from_pretrained(str(d), dtype=jnp.float32)
    clock = FakeClock()
    config = StreamingConfig(delay_seconds=0.0, min_agreement_passes=1,
                             decode_interval_seconds=0.5,
                             max_tokens_per_pass=8)
    session = StreamingInferenceSession(model, config=config, clock=clock)
    sr = model.config.sample_rate
    events = []
    for _ in range(3):
        events += session.feed_audio(_audio(11, sr))  # 1 s chunks
        clock.advance(1.0)
    events += session.stop()
    kinds = [e.kind for e in events]
    assert kinds[-1] == EventKind.ENDED
    assert EventKind.STATS in kinds
    # confirmed-token forcing: passes after the first reuse confirmed ids
    assert isinstance(session.core.state.confirmed_ids, list)


def test_cohere_confirmed_prefix_is_preserved(tmp_path):
    """streaming_decode_token_ids teacher-forces the confirmed prefix: the
    returned ids must start with it."""
    from fixtures import make_cohere_fixture

    from tpu_audio.models.stt.cohere import CohereTranscribe
    from tpu_audio.models.stt.streaming import StreamingConfig

    d = make_cohere_fixture(tmp_path / "c")
    model = CohereTranscribe.from_pretrained(str(d), dtype=jnp.float32)
    sr = model.config.sample_rate
    audio = _audio(13, sr)
    cfg = StreamingConfig(max_tokens_per_pass=8)
    ids, _ = model.streaming_decode_token_ids(audio, cfg, [])
    if len(ids) >= 2:
        prefix = ids[:2]
        ids2, _ = model.streaming_decode_token_ids(audio, cfg, prefix)
        assert ids2[:2] == prefix


def test_moss_streaming_core(tmp_path):
    from fixtures import make_moss_diarize_fixture

    from tpu_audio.models.stt.moss_diarize import MossTranscribeDiarize
    from tpu_audio.models.stt.streaming import StreamingConfig

    d = make_moss_diarize_fixture(tmp_path / "m")
    model = MossTranscribeDiarize.from_pretrained(str(d), dtype=jnp.float32)
    clock = FakeClock()
    config = StreamingConfig(decode_interval_seconds=1.0, max_decode_windows=1)
    session = StreamingInferenceSession(model, config=config, clock=clock)
    sr = model.sample_rate
    events = []
    for _ in range(3):
        events += session.feed_audio(_audio(17, int(sr * 1.5)))
        clock.advance(1.5)
    events += session.stop()
    assert events[-1].kind == EventKind.ENDED
    # at least one partial or final window pass ran
    assert session.core._passes >= 1


def test_session_rejects_unsupported_model():
    with pytest.raises(TypeError, match="requires"):
        StreamingInferenceSession(object())


def test_async_stream_api(model):
    import asyncio

    from tpu_audio.models.stt.streaming import StreamingConfig

    clock = FakeClock()
    config = StreamingConfig(delay_seconds=0.0, min_agreement_passes=1,
                             max_tokens_per_pass=4,
                             finalize_completed_windows=False)
    session = StreamingInferenceSession(model, config=config, clock=clock)

    async def run():
        chunks = [_audio(5, 4000) for _ in range(2)]
        out = []
        async for ev in session.stream(iter(chunks)):
            out.append(ev)
            clock.advance(1.5)
        return out

    events = asyncio.run(run())
    assert events and events[-1].kind == EventKind.ENDED


def test_append_text_dedupes_overlap():
    from tpu_audio.models.stt.streaming import append_text

    assert append_text("hello world", "world again") == "hello world again"
    assert append_text("", "  hi ") == "hi"
    assert append_text("the cat sat", "the cat sat") == "the cat sat"
    # punctuation-insensitive word matching
    assert append_text("It's done,", "it's done, next") == "It's done, next"


def test_promote_tokens_delay_and_agreement():
    from tpu_audio.models.stt.streaming import _promote_tokens, _SharedState

    decode = lambda ids: " ".join(f"t{i}" for i in ids)  # noqa: E731
    state = _SharedState()
    events = []
    # pass 1 at t=0: all tokens fresh, nothing promotes (agreement 1 < 2)
    _promote_tokens(state, [1, 2, 3], 0.0, 0.5, 2, decode, events)
    assert state.confirmed_ids == [] and state.provisional_ids == [1, 2, 3]
    # pass 2 at t=0.6: same prefix -> agreement 2 and age 0.6 >= 0.5
    _promote_tokens(state, [1, 2, 4], 0.6, 0.5, 2, decode, events)
    assert state.confirmed_ids == [1, 2]
    assert state.provisional_ids == [4]
    # disagreement resets the tail's age
    _promote_tokens(state, [1, 2, 5], 0.7, 0.5, 2, decode, events)
    assert state.confirmed_ids == [1, 2] and state.provisional_ids == [5]
    kinds = [e.kind for e in events]
    assert EventKind.CONFIRMED in kinds and EventKind.DISPLAY_UPDATE in kinds


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
