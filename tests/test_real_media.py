"""Real-recording regression tests over the reference's bundled WAVs.

The reference ships 7 real recordings (``Tests/media/*.wav``; the pairing
``noisy_audio.wav``/``noisy_audio_target.wav`` feeds its enhancement golden,
MLXAudioSTSTests.swift:311). Our own ``tests/media`` fixtures are
deterministic formant synthesis — good for golden pinning, but synthesized
signals can miss resampler/mel artifacts that only real speech excites
(round-2 review, "What's missing" #4). These tests read the reference media
*in place* (read-only, nothing copied) and skip cleanly when the directory
is absent, so the suite stays self-contained elsewhere.

The enhancement golden itself still needs real DeepFilterNet weights (the
target WAV was produced by the trained model), so model-level comparison is
out of scope offline; everything signal-path-level is covered here.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pytest

MEDIA = Path(os.environ.get("REFERENCE_MEDIA_DIR",
                            "/root/reference/Tests/media"))

pytestmark = pytest.mark.skipif(
    not MEDIA.is_dir(), reason="reference test media not available")


def _load(name: str, sr: int | None = None):
    from tpu_audio.core.audio_io import load_audio

    return load_audio(str(MEDIA / name), sample_rate=sr)


def test_load_and_resample_preserve_real_speech():
    """24 kHz speech resampled to 16 kHz keeps duration, energy, and range
    (AudioUtils.swift:62-128 semantics on a real recording)."""
    x24, sr24 = _load("conversational_a.wav")
    assert sr24 == 24000
    x16, sr16 = _load("conversational_a.wav", sr=16000)
    assert sr16 == 16000
    assert abs(len(x16) / 16000 - len(x24) / 24000) < 1e-3
    assert np.isfinite(x16).all() and np.abs(x16).max() <= 1.0
    rms24 = float(np.sqrt((x24**2).mean()))
    rms16 = float(np.sqrt((x16**2).mean()))
    # band-limiting removes a little HF energy, never adds any
    assert 0.9 * rms24 < rms16 < 1.02 * rms24


def test_whisper_mel_matches_transformers_on_real_speech():
    """Whisper-exact log-mel vs transformers' WhisperFeatureExtractor on a
    real 13 s recording — true external parity on a non-synthetic signal
    (WhisperAudio.swift:38-79)."""
    transformers = pytest.importorskip("transformers")
    from tpu_audio.core.dsp import log_mel_spectrogram

    x, _ = _load("conversational_a.wav", sr=16000)
    n = 30 * 16000
    x = np.pad(x[:n], (0, max(0, n - len(x))))

    fe = transformers.WhisperFeatureExtractor(feature_size=80)
    ref = fe(x, sampling_rate=16000, return_tensors="np",
             padding="max_length")["input_features"][0]  # [80, 3000]

    ours = np.asarray(log_mel_spectrogram(x, n_mels=80))
    assert ours.shape == ref.shape == (80, 3000)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_incremental_mel_matches_offline_on_real_speech():
    """Adversarial-chunk streaming front end == one-shot, on real speech
    (VoxtralRealtimeStreamingFrontEndTests.swift:1-47 pattern).

    The running-log-max floor (IncrementalMelSpectrogram.swift:139-143) is
    causal: frames emitted before the loudest moment use a smaller max than
    the one-shot pass sees. The clamp is monotone — max(max(x, m1-8), m2-8)
    == max(x, m2-8) for m2 >= m1 — so re-flooring the streamed output with
    the final global max must reproduce the offline output exactly. That is
    the parity invariant real (non-stationary) speech actually guarantees.
    """
    from tpu_audio.models.stt.streaming import IncrementalMelSpectrogram

    x, _ = _load("conversational_a.wav", sr=16000)
    chunks = [1600, 173, 27200, 1, 999, 7680]

    inc = IncrementalMelSpectrogram(n_mels=80)
    frames, pos, i = [], 0, 0
    while pos < len(x):
        c = chunks[i % len(chunks)]
        out = inc.process(x[pos : pos + c])
        if out is not None:
            frames.append(out)
        pos += c
        i += 1
    streamed = np.concatenate(frames, axis=0)

    one_shot = IncrementalMelSpectrogram(n_mels=80).process(x)
    n = min(len(streamed), len(one_shot))
    assert abs(len(streamed) - len(one_shot)) <= 1
    # output = (log + 4) / 4, so the log-domain floor of 8 is 2 output units
    floor = float(one_shot.max()) - 2.0
    np.testing.assert_allclose(np.maximum(streamed[:n], floor),
                               np.maximum(one_shot[:n], floor),
                               atol=1e-5)


def test_stft_istft_roundtrip_real_speech():
    """STFT -> ISTFT reconstruction error < 1e-5 on real speech (the
    ISTFT-head vocoder contract, SopranoDecoder.swift:87-168)."""
    from tpu_audio.core import dsp

    x, _ = _load("conversational_fr.wav", sr=24000)
    # hop-multiple length: the torch-parity STFT drops the trailing partial
    # frame, so only a hop-aligned signal reconstructs end to end
    x = x[: (24000 * 3 // 256) * 256]
    win = dsp.hanning_window(1024, periodic=True)
    spec = dsp.stft(x, win, n_fft=1024, hop_length=256)
    y = np.asarray(dsp.istft(spec, win, n_fft=1024, hop_length=256,
                             length=len(x)))
    assert np.abs(y - x).max() < 1e-5


def test_energy_chunker_cuts_real_speech_at_pauses():
    """The long-audio chunker (Qwen3ASR.swift:156-268) must cut real
    conversational speech at low-energy points, and the chunks must tile
    the signal."""
    from tpu_audio.models.stt.qwen3_asr import split_audio_into_chunks

    x, sr = _load("conversational_a.wav", sr=16000)
    chunks = split_audio_into_chunks(x, sr, chunk_duration=5.0,
                                     min_chunk_duration=0.5)
    assert len(chunks) >= 2
    offsets = [off for _, off in chunks]
    assert offsets == sorted(offsets) and offsets[0] == 0.0
    total = sum(len(c) for c, _ in chunks)
    assert total >= len(x)  # padding only ever adds
    # every interior cut lands in a quieter-than-average window
    frame = int(0.05 * sr)
    global_rms = float(np.sqrt((x**2).mean()))
    for _, off in chunks[1:]:
        k = int(off * sr)
        local = x[max(0, k - frame) : k + frame]
        assert float(np.sqrt((local**2).mean())) < global_rms


def test_pcm_stream_converter_matches_offline_on_real_noise():
    """Streaming 48 kHz -> 16 kHz conversion of the real noisy recording is
    identical to the offline sinc resampler (PCMStreamConverter.swift:24-52)."""
    from tpu_audio.codecs.higgs_audio import sinc_resample
    from tpu_audio.core.audio_stream import PCMStreamConverter

    x, sr = _load("noisy_audio.wav")
    assert sr == 48000
    ref = sinc_resample(x, 48000, 16000)
    conv = PCMStreamConverter(16000)
    outs = []
    for i in range(0, len(x), 4801):  # ragged chunks
        outs.append(conv.push(x[i : i + 4801], in_rate=48000))
    outs.append(conv.finish())
    y = np.concatenate(outs)
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_streaming_wav_writer_roundtrip_real_speech(tmp_path):
    """StreamingWAVWriter chunked output reloads bit-identical to save_wav
    (AudioUtils.swift:231-348)."""
    from tpu_audio.core.audio_io import StreamingWAVWriter, load_audio, save_wav

    x, sr = _load("intention.wav")
    p1, p2 = tmp_path / "stream.wav", tmp_path / "oneshot.wav"
    w = StreamingWAVWriter(str(p1), sample_rate=sr)
    for i in range(0, len(x), 1000):
        w.append(x[i : i + 1000])
    w.close()
    save_wav(str(p2), x, sr)
    a, _ = load_audio(str(p1))
    b, _ = load_audio(str(p2))
    np.testing.assert_array_equal(a, b)


def test_vad_energy_runs_on_multi_speaker(tmp_path):
    """Silero-shaped VAD on a real two-speaker recording: speech present,
    not wall-to-wall (SpeechSegmenter.swift:162-183 smoke on real audio).
    Uses fixture weights, so only liveness/shape semantics are asserted."""
    from fixtures import make_silero_fixture
    from tpu_audio.models.vad.segmenter import SpeechSegmentConfig, segment_speech
    from tpu_audio.models.vad.silero import SileroVAD

    x, sr = _load("multi_speaker.wav")
    assert sr == 16000
    model = SileroVAD.from_pretrained(
        str(make_silero_fixture(tmp_path / "silero")))
    segs = segment_speech(x, sr, model, SpeechSegmentConfig())
    for seg, off in segs:
        assert 0 <= off <= len(x) / sr
        assert len(seg) > 0
