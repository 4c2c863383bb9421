"""Sortformer diarization tests: offline forward, streaming state machine,
AOSC compression bounds, segment extraction."""

import numpy as np
import pytest

from tpu_audio.models.vad import load_model
from tpu_audio.models.vad.sortformer import (
    DiarizationSegment,
    Sortformer,
    preds_to_segments,
    segments_to_rttm,
)

from fixtures import make_sortformer_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return Sortformer.from_pretrained(
        str(make_sortformer_fixture(tmp_path_factory.mktemp("sortformer"))))


def _audio(seed, n):
    return (np.random.default_rng(seed).standard_normal(n) * 0.2).astype(np.float32)


def test_factory(tmp_path):
    m = load_model(str(make_sortformer_fixture(tmp_path / "s")))
    assert isinstance(m, Sortformer)


def test_offline_generate(model):
    out = model.generate(_audio(0, 16000 * 2))
    probs = out["speaker_probs"]
    assert probs.ndim == 2 and probs.shape[1] == 4
    assert np.all((probs >= 0) & (probs <= 1))
    assert 0 <= out["num_speakers"] <= 4
    for seg in out["segments"]:
        assert isinstance(seg, DiarizationSegment)
        assert seg.end > seg.start


def test_frame_duration(model):
    # hop 160 * subsampling 8 / 16000 = 0.08 s per diar frame
    assert model.frame_duration == pytest.approx(0.08)


def test_streaming_step_and_state_growth(model):
    state = model.init_streaming_state()
    out1, state = model.feed(_audio(1, 16000), state)
    assert state["frames_processed"] > 0
    fifo1 = state["fifo"].shape[1]
    out2, state = model.feed(_audio(2, 16000), state)
    assert state["fifo"].shape[1] > fifo1 or state["spkcache"].shape[1] > 0
    assert out2["speaker_probs"].shape[1] == 4


def test_streaming_compression_bounds(model):
    """spkcache/FIFO must stay bounded under AOSC compression
    (Sortformer.swift:1018-1086)."""
    state = model.init_streaming_state()
    for i in range(8):
        _, state = model.feed(_audio(10 + i, 16000), state,
                              spkcache_max=16, fifo_max=16)
    assert state["fifo"].shape[1] <= 16 + 13  # fifo_max + one chunk
    assert state["spkcache"].shape[1] <= 16
    assert np.isfinite(state["spkcache"]).all()


def test_generate_stream(model):
    outs = list(model.generate_stream(_audio(3, 16000 * 3),
                                      chunk_duration=1.0))
    assert len(outs) >= 2
    for o in outs:
        assert o["speaker_probs"].shape[1] == 4


def test_preds_to_segments_logic():
    preds = np.zeros((10, 4), np.float32)
    preds[2:5, 0] = 0.9
    preds[7:10, 0] = 0.9
    preds[0:4, 2] = 0.8
    segs = preds_to_segments(preds, frame_duration=0.1)
    spk0 = [s for s in segs if s.speaker == 0]
    assert len(spk0) == 2
    assert spk0[0].start == pytest.approx(0.2)
    assert spk0[0].end == pytest.approx(0.5)
    # merge gap joins them
    segs_m = preds_to_segments(preds, 0.1, merge_gap=0.3)
    assert len([s for s in segs_m if s.speaker == 0]) == 1
    # min duration filters
    segs_f = preds_to_segments(preds, 0.1, min_duration=0.35)
    assert all(s.end - s.start >= 0.35 for s in segs_f)


def test_segments_to_rttm():
    segs = [DiarizationSegment(0.2, 0.5, 0),
            DiarizationSegment(0.4, 1.0, 2)]
    rttm = segments_to_rttm(segs, uri="meeting")
    lines = rttm.splitlines()
    assert lines[0] == ("SPEAKER meeting 1 0.200 0.300 <NA> <NA> "
                        "speaker_0 <NA> <NA>")
    assert lines[1].split()[7] == "speaker_2"
    assert len(lines) == 2
