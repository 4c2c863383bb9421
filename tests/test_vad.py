"""Silero VAD + SpeechSegmenter tests."""

import numpy as np
import pytest

from tpu_audio.models.vad import load_model
from tpu_audio.models.vad.segmenter import (
    SpeechSegmentConfig,
    segment_speech,
)
from tpu_audio.models.vad.silero import SileroVAD, probs_to_timestamps

from fixtures import make_silero_fixture


@pytest.fixture(scope="module")
def vad(tmp_path_factory):
    return SileroVAD.from_pretrained(
        str(make_silero_fixture(tmp_path_factory.mktemp("silero"))))


def test_factory(tmp_path):
    path = make_silero_fixture(tmp_path / "v")
    assert isinstance(load_model(str(path)), SileroVAD)


def test_predict_proba_shapes(vad):
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(16000).astype(np.float32) * 0.1
    probs = vad.predict_proba(audio)
    assert probs.shape == (int(np.ceil(16000 / 512)),)
    assert np.all((probs >= 0) & (probs <= 1))
    # batched
    probs2 = vad.predict_proba(np.stack([audio, audio]))
    assert probs2.shape == (2, 32)
    np.testing.assert_allclose(probs2[0], probs2[1], atol=1e-6)
    # 8k branch
    probs8 = vad.predict_proba(audio[:8000], sample_rate=8000)
    assert probs8.shape == (int(np.ceil(8000 / 256)),)
    # empty
    assert vad.predict_proba(np.zeros(0, np.float32)).shape == (0,)


def test_unsupported_rate(vad):
    with pytest.raises(ValueError):
        vad.predict_proba(np.zeros(1000, np.float32), sample_rate=44100)


def test_streaming_feed_matches_offline(vad):
    """Chunk-by-chunk feed must equal the one-shot scan (the reference's
    streaming-vs-offline front-end equivalence invariant)."""
    rng = np.random.default_rng(1)
    audio = rng.standard_normal(512 * 6).astype(np.float32) * 0.1
    offline = vad.predict_proba(audio)

    state = None
    streamed = []
    for i in range(6):
        prob, state = vad.feed(audio[i * 512 : (i + 1) * 512], state)
        streamed.append(prob[0])
    np.testing.assert_allclose(np.asarray(streamed), offline, atol=1e-5)


def test_feed_wrong_chunk_size(vad):
    with pytest.raises(ValueError):
        vad.feed(np.zeros(100, np.float32))


def test_probs_to_timestamps_hysteresis():
    # 20 chunks: speech in 5..12, with a 1-chunk dip that must not split
    probs = np.zeros(20, np.float32)
    probs[5:13] = 0.9
    probs[8] = 0.4  # dip above neg_threshold -> no split
    ts = probs_to_timestamps(probs, audio_len=20 * 512, sample_rate=16000,
                             threshold=0.5, min_speech_duration_ms=100,
                             min_silence_duration_ms=100, speech_pad_ms=0)
    assert len(ts) == 1
    assert ts[0].start == 5 * 512
    # long silence splits
    probs2 = np.zeros(40, np.float32)
    probs2[5:10] = 0.9
    probs2[25:30] = 0.9
    ts2 = probs_to_timestamps(probs2, 40 * 512, 16000, 0.5, 100, 100, 0)
    assert len(ts2) == 2


def test_get_speech_timestamps_runs(vad):
    rng = np.random.default_rng(2)
    audio = rng.standard_normal(16000).astype(np.float32) * 0.1
    ts = vad.get_speech_timestamps(audio)
    for t in ts:
        assert 0 <= t.start < t.end <= 16000


def test_segment_speech_fallback_whole_buffer(vad):
    """No speech detected -> whole buffer returned as one segment."""

    class NoSpeechVAD:
        def predict_proba(self, audio, sample_rate=16000):
            return np.zeros(len(audio) // 512, np.float32)

    audio = np.zeros(16000, np.float32)
    segs = segment_speech(audio, 16000, NoSpeechVAD())
    assert len(segs) == 1
    assert segs[0][1] == 0.0
    assert len(segs[0][0]) == 16000


def test_segment_speech_detects_and_merges():
    class ScriptedVAD:
        def predict_proba(self, audio, sample_rate=16000):
            n = len(audio) // 512
            p = np.zeros(n, np.float32)
            p[8:24] = 0.9    # blocks 1..2 speech
            p[40:56] = 0.9   # blocks 5..6 speech (gap 2 blocks = 0.51 s)
            return p

    audio = np.zeros(512 * 64, np.float32)
    segs = segment_speech(audio, 16000, ScriptedVAD(),
                          SpeechSegmentConfig(merge_gap_s=0.3))
    assert len(segs) == 2
    # a merge gap above the 0.51 s silence merges them into one
    segs2 = segment_speech(audio, 16000, ScriptedVAD(),
                           SpeechSegmentConfig(merge_gap_s=1.0))
    assert len(segs2) == 1


def test_segment_speech_splits_long_runs():
    class AllSpeechVAD:
        def predict_proba(self, audio, sample_rate=16000):
            return np.ones(len(audio) // 512, np.float32)

    audio = np.zeros(512 * 128, np.float32)  # ~4.1 s
    segs = segment_speech(audio, 16000, AllSpeechVAD(),
                          SpeechSegmentConfig(max_chunk_s=1.0))
    assert len(segs) >= 4
    for seg, _ in segs:
        assert len(seg) <= 16000
