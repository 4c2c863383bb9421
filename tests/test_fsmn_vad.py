"""FSMN VAD tests: Kaldi frontend parity invariants + endpoint machine."""

import numpy as np
import pytest

from tpu_audio.models.vad import load_model
from tpu_audio.models.vad.fsmn_vad import (
    FSMNVAD,
    FSMNVADConfig,
    FSMNVADPostprocess,
    apply_lfr,
    kaldi_mel_filterbank,
    parse_kaldi_cmvn,
)

from fixtures import make_fsmn_vad_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_fsmn_vad_fixture(
        tmp_path_factory.mktemp("fsmn"))))


def test_factory(model):
    assert isinstance(model, FSMNVAD)
    assert model.cmvn is not None
    assert model.cmvn[0].shape == (40,)
    assert np.all(model.cmvn[1] == 1.0)


def test_kaldi_mel_filterbank_matches_torchaudio_convention():
    bank = kaldi_mel_filterbank(8, 512, 16000)
    assert bank.shape == (257, 8)
    # Nyquist row is zero, filters are triangular and non-negative
    assert np.all(bank[-1] == 0)
    assert np.all(bank >= 0)
    assert np.all(bank.max(axis=0) > 0)


def test_apply_lfr_shapes_and_padding():
    feats = np.arange(12, dtype=np.float32).reshape(4, 3)
    out = apply_lfr(feats, m=5, n=1)
    # T_out = T + (m-1)//2 = 6; first output stacks [0,0,0,1,2] source rows
    assert out.shape == (6, 15)
    np.testing.assert_array_equal(out[0, :3], feats[0])
    np.testing.assert_array_equal(out[0, 3:6], feats[0])
    np.testing.assert_array_equal(out[0, 6:9], feats[0])
    np.testing.assert_array_equal(out[0, 9:12], feats[1])
    # tail clamps to the last frame
    np.testing.assert_array_equal(out[-1, -3:], feats[-1])


def test_parse_kaldi_cmvn():
    shift, scale = parse_kaldi_cmvn(
        "<AddShift> 3 3\n<LearnRateCoef> 0 [ 1.5 -2 0.25 ]\n"
        "<Rescale> 3 3\n<LearnRateCoef> 0 [ 2 2 2 ]\n")
    np.testing.assert_allclose(shift, [1.5, -2.0, 0.25])
    np.testing.assert_allclose(scale, [2.0, 2.0, 2.0])


def test_extract_features_shape(model):
    rng = np.random.default_rng(0)
    wf = rng.standard_normal(16000).astype(np.float32) * 0.1
    feats = model.extract_features(wf)
    # fbank frames: 1+(16000-400)//160 = 98; LFR adds (5-1)//2 = 2
    assert feats.shape == (100, 40)
    assert np.isfinite(feats).all()
    # sub-frame audio -> empty
    assert model.extract_features(np.zeros(100, np.float32)).shape == (0, 40)


def test_scores_are_distributions(model):
    rng = np.random.default_rng(1)
    wf = rng.standard_normal(8000).astype(np.float32) * 0.1
    s = model.scores(wf)
    assert s.shape[1] == 4
    np.testing.assert_allclose(s.sum(axis=1), 1.0, atol=1e-5)


def test_postprocess_detects_speech_burst():
    """Synthetic scores: silence, then a loud speech burst, then silence.
    The state machine must emit one segment covering the burst."""
    cfg = FSMNVADConfig()
    t = 300  # 3 s of 10 ms frames
    scores = np.zeros((t, 2), np.float32)
    scores[:, 0] = 0.99  # silence posterior
    scores[100:200, 0] = 0.01  # speech region
    scores[:, 1] = 1.0 - scores[:, 0]
    rng = np.random.default_rng(2)
    wf = np.zeros(t * 160 + 240, np.float32)
    wf[100 * 160:200 * 160] = rng.standard_normal(100 * 160) * 0.5
    segs = FSMNVADPostprocess(cfg).process(scores, wf, is_final=True)
    assert len(segs) == 1
    start, end = segs[0]
    # start is rewound by the detection latency (~400 ms before the burst)
    assert 600 <= start <= 1100
    assert 1900 <= end <= 2800  # end-silence lookback applies


def test_postprocess_all_silence_emits_empty_fake_segment():
    cfg = FSMNVADConfig()
    t = 100
    scores = np.zeros((t, 2), np.float32)
    scores[:, 0] = 0.99
    scores[:, 1] = 0.01
    wf = np.zeros(t * 160 + 240, np.float32)
    segs = FSMNVADPostprocess(cfg).process(scores, wf, is_final=True)
    # the fake start/end produce no real segment frames
    assert segs == [] or all(s == e for s, e in segs)


def test_detect_end_to_end(model):
    rng = np.random.default_rng(3)
    sr = 16000
    wf = np.zeros(3 * sr, np.float32)
    wf[sr:2 * sr] = rng.standard_normal(sr).astype(np.float32) * 0.5
    segs = model.detect(wf)
    assert isinstance(segs, list)
    for s, e in segs:
        assert 0 <= s <= e <= 3000


def test_streaming_blocks_match_offline():
    """Feeding scores in blocks (is_final only on the last) must yield the
    same segments as one shot."""
    cfg = FSMNVADConfig()
    t = 300
    scores = np.zeros((t, 2), np.float32)
    scores[:, 0] = 0.99
    scores[100:200, 0] = 0.01
    scores[:, 1] = 1.0 - scores[:, 0]
    rng = np.random.default_rng(4)
    wf = np.zeros(t * 160 + 240, np.float32)
    wf[100 * 160:200 * 160] = rng.standard_normal(100 * 160) * 0.5

    offline = FSMNVADPostprocess(cfg).process(scores, wf, is_final=True)

    pp = FSMNVADPostprocess(cfg)
    out = []
    step = 50
    for i in range(0, t, step):
        out += pp.process(scores[i:i + step],
                          wf[i * 160:(i + step) * 160 + (240 if i + step >= t else 0)],
                          is_final=i + step >= t)
    assert out == offline
