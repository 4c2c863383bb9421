"""Parakeet tests: frontend normalization, encoder shapes, the
serial-vs-batched TDT decode parity invariant
(the reference's ParakeetBatchParityTests pattern), batch-vs-single parity.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.core.generation import STTGenerateParameters
from tpu_audio.models.stt import load_model
from tpu_audio.models.stt import parakeet as P

from fixtures import make_parakeet_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = make_parakeet_fixture(tmp_path_factory.mktemp("parakeet"))
    return P.Parakeet.from_pretrained(str(path), dtype=jnp.float32)


def _audio(seed, n=16000):
    return (np.random.default_rng(seed).standard_normal(n) * 0.1).astype(np.float32)


def test_factory_dispatch(tmp_path):
    path = make_parakeet_fixture(tmp_path / "m")
    m = load_model(str(path), dtype=jnp.float32)
    assert isinstance(m, P.Parakeet)
    assert m.config.variant == "tdt"
    assert m.config.durations == [0, 1, 2, 3, 4]
    assert m.config.blank_token == 16


def test_frontend_per_feature_normalization(model):
    mel = np.asarray(P.log_mel_spectrogram(_audio(0), model.config.preprocess))
    assert mel.shape[2] == 16
    # per-feature mean ~0, std ~1
    np.testing.assert_allclose(mel[0].mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(mel[0].std(axis=0), 1.0, atol=0.05)


def test_encoder_shapes_and_lengths(model):
    mel = P.log_mel_spectrogram(_audio(1), model.config.preprocess)
    lengths = jnp.asarray([mel.shape[1]], jnp.int32)
    feats, out_len = model._encode(model.params, mel.astype(jnp.float32), lengths)
    assert feats.shape[0] == 1
    assert feats.shape[2] == model.config.encoder.d_model
    # subsampling factor 4 via two stride-2 convs
    t = mel.shape[1]
    for _ in range(2):
        t = (t + 2 - 3) // 2 + 1
    assert int(out_len[0]) == t


def test_generate_batch_runs(model):
    outs = model.generate_batch([_audio(2), _audio(3, 8000)],
                                STTGenerateParameters(max_tokens=256))
    assert len(outs) == 2
    for o in outs:
        assert o.generation_token_count >= 0
        assert isinstance(o.text, str)


def test_batch_vs_single_parity(model):
    """Tokens from a batched decode must equal per-utterance decodes and
    preserve ordering (ParakeetBatchParityTests.swift:21-60)."""
    a, b = _audio(4), _audio(5, 12000)
    both = model.generate_batch([a, b])
    solo_a = model.generate_batch([a])[0]
    solo_b = model.generate_batch([b])[0]
    assert [s.tokens for s in both[0].segments] == [s.tokens for s in solo_a.segments]
    assert [s.tokens for s in both[1].segments] == [s.tokens for s in solo_b.segments]
    assert both[0].text == solo_a.text
    assert both[1].text == solo_b.text


def _serial_tdt_reference(model, feats, length):
    """Host-side serial TDT decode — an independent implementation of
    NemoDecodingLogic.tdtStep used as ground truth for the on-device loop
    (mirrors the reference's serial/hybrid trace-parity tests)."""
    cfg = model.config
    blank = cfg.blank_token
    h = jnp.zeros((cfg.pred_rnn_layers, 1, cfg.pred_hidden), jnp.float32)
    c = jnp.zeros_like(h)
    t, new_sym, last_tok = 0, 0, blank
    emitted = []
    while t < length:
        frame = feats[:1, t]
        pred, h_new, c_new = P._predict_step(
            model.params, jnp.asarray([last_tok]), h, c, cfg)
        logits = np.asarray(P._joint(model.params, frame, pred, cfg))[0]
        tok = int(np.argmax(logits[: blank + 1]))
        dur_idx = int(np.argmax(logits[blank + 1 :]))
        jump = cfg.durations[dur_idx]
        next_t = t + jump
        next_new = 0 if jump != 0 else new_sym + 1
        if jump == 0 and next_new >= cfg.max_symbols:
            next_t += 1
            next_new = 0
        if tok != blank:
            emitted.append((tok, t, jump))
            last_tok = tok
            h, c = h_new, c_new
        t, new_sym = next_t, next_new
    return emitted


def test_device_loop_matches_serial_reference(model):
    mel = P.log_mel_spectrogram(_audio(6), model.config.preprocess)
    lengths = jnp.asarray([mel.shape[1]], jnp.int32)
    feats, out_len = model._encode(model.params, mel.astype(jnp.float32), lengths)
    length = int(out_len[0])

    want = _serial_tdt_reference(model, feats, length)

    decode = model._get_decoder(256)
    toks, times, jumps, counts = decode(model.params, feats, out_len)
    n = int(counts[0])
    got = [(int(toks[0, j]), int(times[0, j]), int(jumps[0, j])) for j in range(n)]
    assert got == want


def test_rnnt_variant(tmp_path):
    path = make_parakeet_fixture(tmp_path / "rnnt", variant="rnnt")
    m = P.Parakeet.from_pretrained(str(path), dtype=jnp.float32)
    assert m.config.variant == "rnnt"
    assert m.config.durations == []
    out = m.generate_batch([_audio(7)])[0]
    assert isinstance(out.text, str)


def test_long_audio_chunking(model):
    params = STTGenerateParameters(chunk_duration=1.0)
    out = model.generate(_audio(8, 16000 * 3), params)
    assert isinstance(out.text, str)
    # segments from later chunks carry offsets
    if out.segments:
        assert out.segments[-1].start >= 0.0
