"""Real-audio regression fixtures: committed speech-like WAVs driven through
the segmentation / mel / enhancement / VAD paths with pinned goldens.

The reference validates against real recordings under ``Tests/media/``
(7 WAVs; the noisy/target pair feeds the DeepFilterNet golden test at
MLXAudioSTSTests.swift:311). This repo's analog is *synthesized*
deterministic speech (tests/media/regen_media.py — glottal source +
formant cascade + silence gaps), which has the structure those paths
depend on (harmonics, onsets, pauses) and is byte-pinned via SHA-256.
"""

import hashlib
import json
from pathlib import Path

import numpy as np
import pytest

from tpu_audio.core.audio_io import load_audio, resample_audio

MEDIA = Path(__file__).parent / "media"
GOLD = json.loads((Path(__file__).parent / "golden" /
                   "media_goldens.json").read_text())


def _check_vec(entry, got, atol, rtol=0.0):
    got = np.asarray(got, np.float64).reshape(-1)
    assert got.size == entry["shape"]
    np.testing.assert_allclose(got[: len(entry["first"])], entry["first"],
                               atol=atol, rtol=rtol)
    np.testing.assert_allclose(got.mean(), entry["mean"], atol=atol)


# ---------------------------------------------------------------- integrity


def test_fixture_bytes_pinned():
    """The committed WAVs are the exact bytes the goldens were computed
    from — catches loader drift and accidental regeneration alike."""
    for name, sha in GOLD["files"].items():
        got = hashlib.sha256((MEDIA / name).read_bytes()).hexdigest()
        assert got == sha, f"{name} changed on disk"


def test_loader_shapes_and_rates():
    speech, sr = load_audio(MEDIA / "speech_16k.wav")
    assert sr == 16000 and speech.shape == (64000,)
    assert speech.dtype == np.float32 and np.abs(speech).max() <= 1.0
    noisy, sr48 = load_audio(MEDIA / "noisy_48k.wav")
    clean, _ = load_audio(MEDIA / "clean_48k.wav")
    assert sr48 == 48000 and noisy.shape == clean.shape == (96000,)
    # the pair is constructed at 5 dB SNR
    snr = 10 * np.log10(np.mean(clean ** 2) / np.mean((noisy - clean) ** 2))
    assert 4.5 < snr < 5.5


# ------------------------------------------------------------- segmentation

# ground-truth utterance windows baked into regen_media.make_speech_16k
SPEECH_UTTERANCES = [(0.30, 1.25), (1.75, 2.70), (3.30, 3.90)]


class _EnergyVAD:
    """Minimal vad_model implementing the segment_speech protocol
    (predict_proba per 512-sample chunk) from frame RMS — lets the real
    audio exercise the full segmenter state machine deterministically."""

    def predict_proba(self, audio, sample_rate):
        chunk = 512 if sample_rate == 16000 else 256
        n = len(audio) // chunk
        frames = np.asarray(audio[: n * chunk], np.float32).reshape(n, chunk)
        rms = np.sqrt((frames ** 2).mean(axis=1))
        return (rms > 0.01).astype(np.float32) * 0.99


def test_segment_speech_recovers_utterances():
    from tpu_audio.models.vad.segmenter import (SpeechSegmentConfig,
                                                segment_speech)

    speech, sr = load_audio(MEDIA / "speech_16k.wav")
    cfg = SpeechSegmentConfig(merge_gap_s=0.1)
    segs = segment_speech(speech, sr, _EnergyVAD(), cfg)
    assert len(segs) == len(SPEECH_UTTERANCES)
    for (seg, offset), (t0, t1) in zip(segs, SPEECH_UTTERANCES):
        assert abs(offset - t0) < 0.3, (offset, t0)
        end = offset + len(seg) / sr
        assert abs(end - t1) < 0.3, (end, t1)


def test_energy_chunker_splits_in_silence():
    """The Qwen3ASR long-audio chunker must cut inside the real silence
    gaps, never inside an utterance (Qwen3ASR.swift:156-268 semantics)."""
    from tpu_audio.models.stt.qwen3_asr import split_audio_into_chunks

    speech, sr = load_audio(MEDIA / "speech_16k.wav")
    chunks = split_audio_into_chunks(speech, sr, chunk_duration=1.6,
                                     min_chunk_duration=0.5,
                                     search_expand_sec=1.0)
    assert len(chunks) >= 2
    total = sum(len(c) for c, _ in chunks)
    assert total == len(speech)
    gaps = [(1.25, 1.75), (2.70, 3.30)]
    for piece, offset in chunks[:-1]:
        cut = offset + len(piece) / sr
        assert any(g0 - 0.05 <= cut <= g1 + 0.05 for g0, g1 in gaps), (
            f"chunk boundary at {cut:.2f}s falls inside an utterance")


def test_two_speaker_has_overlap_region():
    """The two-speaker fixture keeps continuous energy across the 2.8-3.0 s
    overlap so diarization-style front ends see simultaneous speech."""
    audio, sr = load_audio(MEDIA / "two_speaker_16k.wav")
    win = int(0.05 * sr)
    seg = audio[int(2.85 * sr): int(3.35 * sr)]
    rms = np.sqrt(np.mean(seg.reshape(-1, win) ** 2, axis=1))
    assert (rms > 0.01).all()


# ---------------------------------------------------------------------- mel


def test_speech_log_mel_golden():
    from tpu_audio.core import dsp

    speech, _ = load_audio(MEDIA / "speech_16k.wav")
    mel = np.asarray(dsp.log_mel_spectrogram(speech, n_mels=80))
    _check_vec(GOLD["speech_log_mel"], mel, atol=2e-5)


def test_incremental_mel_matches_one_shot_on_speech():
    """Overlap-save incremental mel over adversarial real-audio chunk sizes
    equals the one-shot pass (front-end-equivalence pattern,
    VoxtralRealtimeStreamingFrontEndTests.swift:1-47)."""
    from tpu_audio.models.stt.streaming import IncrementalMelSpectrogram

    speech, _ = load_audio(MEDIA / "speech_16k.wav")
    speech = speech[:24000]
    want = IncrementalMelSpectrogram(n_mels=80).process(speech)

    inc = IncrementalMelSpectrogram(n_mels=80)
    frames, pos = [], 0
    for size in [1600, 173, 9999, 1, 512, 7680, 160]:
        if pos >= len(speech):
            break
        out = inc.process(speech[pos: pos + size])
        if out is not None:
            frames.append(out)
        pos += size
    if pos < len(speech):
        out = inc.process(speech[pos:])
        if out is not None:
            frames.append(out)
    got = np.concatenate(frames)
    n = min(len(got), len(want))
    assert n >= len(want) - 2
    # The running-log-max floor differs between passes only UNTIL the
    # global-max frame has been seen (real speech starts with silence, so
    # early chunked frames clamp to a lower provisional max — matching the
    # reference streaming semantics); from that frame on both passes use
    # the same max and must agree exactly.
    k = int(np.unravel_index(np.argmax(want), want.shape)[0]) + 1
    assert k < n - 8, "fixture should peak before the tail"
    np.testing.assert_allclose(got[k:n], want[k:n], atol=1e-4)


# ---------------------------------------------------------------------- vad


def test_silero_probs_golden(tmp_path):
    from fixtures import make_silero_fixture
    from tpu_audio.models.vad.silero import SileroVAD

    m = SileroVAD.from_pretrained(str(make_silero_fixture(tmp_path / "s")))
    speech, _ = load_audio(MEDIA / "speech_16k.wav")
    _check_vec(GOLD["silero_probs"], m.predict_proba(speech, 16000),
               atol=1e-4)


# -------------------------------------------------------------- enhancement


def test_dfn_enhance_golden_on_noisy_pair(tmp_path):
    """Fixture-weight DeepFilterNet over the real noisy fixture pins the
    end-to-end ERB/spectral/deep-filter pipeline (the reference's
    deepFilterNetDenoiseMatchesGoldenSpectrogram analog)."""
    from fixtures import make_deepfilternet_fixture
    from tpu_audio.models.sts.deepfilternet import DeepFilterNet

    m = DeepFilterNet.from_pretrained(
        str(make_deepfilternet_fixture(tmp_path / "dfn")))
    noisy, _ = load_audio(MEDIA / "noisy_48k.wav")
    out = m.enhance(noisy[:24000])
    _check_vec(GOLD["dfn_enhanced"], out, atol=5e-4)


def test_dfn_streamer_matches_offline_on_real_audio(tmp_path):
    from fixtures import make_deepfilternet_fixture
    from tpu_audio.models.sts.deepfilternet import (DeepFilterNet,
                                                    DeepFilterNetStreamer)

    m = DeepFilterNet.from_pretrained(
        str(make_deepfilternet_fixture(tmp_path / "dfn")))
    noisy, _ = load_audio(MEDIA / "noisy_48k.wav")
    noisy = noisy[: m.config.hop_size * 31]
    want = m.enhance(noisy)
    streamer = DeepFilterNetStreamer(m)
    outs, pos = [], 0
    for size in [m.config.hop_size, 173, 999, m.config.hop_size * 13]:
        outs.append(streamer.process_chunk(noisy[pos: pos + size]))
        pos += size
    outs.append(streamer.process_chunk(noisy[pos:]))
    outs.append(streamer.flush())
    got = np.concatenate([o for o in outs if len(o)])
    np.testing.assert_allclose(got, want, atol=5e-4)


# --------------------------------------------------------------- resampling


def test_resample_roundtrip_preserves_speech():
    speech, sr = load_audio(MEDIA / "speech_16k.wav")
    up = resample_audio(speech, sr, 24000)
    back = resample_audio(up, 24000, sr)
    n = min(len(back), len(speech))
    corr = np.corrcoef(back[:n], speech[:n])[0, 1]
    assert corr > 0.99, corr


def test_native_resampler_matches_scipy_on_speech():
    from tpu_audio import native

    if not native.available():
        pytest.skip("no C++ toolchain")
    speech, sr = load_audio(MEDIA / "speech_16k.wav")
    from tpu_audio.core.audio_stream import PCMStreamConverter

    conv = PCMStreamConverter(out_rate=24000)
    got = np.concatenate([conv.push(speech, sr), conv.finish()])
    want = resample_audio(speech, sr, 24000)
    n = min(len(got), len(want))
    assert n > 0.95 * len(want)
    corr = np.corrcoef(got[:n], want[:n])[0, 1]
    assert corr > 0.99, corr
