"""Regenerate the committed audio fixtures under tests/media/.

The reference ships real recordings (``/root/reference/Tests/media/`` — 7
WAVs incl. the noisy/target pair used by the DeepFilterNet golden test at
MLXAudioSTSTests.swift:311).  We cannot redistribute those, so this script
*synthesizes* deterministic speech-like audio instead: a glottal pulse
train with a moving F0 contour, shaped by a cascade of time-varying formant
resonators and a word-level amplitude envelope with real silence gaps.
The result has the spectro-temporal structure the segmentation / streaming
/ enhancement paths care about (harmonics, formants, onsets, pauses)
while being 100% reproducible from this file.

Run ``python tests/media/regen_media.py`` to rewrite the WAVs; tests pin
their SHA-256 so accidental regeneration or loader drift is caught.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir, os.pardir))

from tpu_audio.core.audio_io import save_wav  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))

# (F1, F2, F3) Hz — coarse vowel targets for the formant cascade
_VOWELS = [
    (730.0, 1090.0, 2440.0),   # /a/
    (270.0, 2290.0, 3010.0),   # /i/
    (300.0, 870.0, 2240.0),    # /u/
    (530.0, 1840.0, 2480.0),   # /e/
    (570.0, 840.0, 2410.0),    # /o/
]


def _resonator(x: np.ndarray, freq: np.ndarray, bw: float, sr: int) -> np.ndarray:
    """Two-pole resonator with a per-sample center frequency (slow IIR on
    purpose — regen-time only, never in the library hot path)."""
    r = np.exp(-np.pi * bw / sr)
    theta = 2.0 * np.pi * np.clip(freq, 50.0, sr / 2 - 200.0) / sr
    a1 = -2.0 * r * np.cos(theta)
    a2 = r * r
    y = np.zeros_like(x)
    y1 = y2 = 0.0
    for n in range(len(x)):
        y[n] = x[n] - a1[n] * y1 - a2 * y2
        y2 = y1
        y1 = y[n]
    return y


def synth_utterance(dur_s: float, sr: int, f0_start: float, f0_end: float,
                    vowel_seq: list[int], rng: np.random.Generator) -> np.ndarray:
    """One multi-'syllable' voiced utterance."""
    n = int(dur_s * sr)
    t = np.arange(n) / sr
    f0 = np.linspace(f0_start, f0_end, n) * (1.0 + 0.02 * np.sin(2 * np.pi * 5.0 * t))
    phase = np.cumsum(2.0 * np.pi * f0 / sr)
    # Rosenberg-ish glottal source: rectified, sharpened sinusoid + jitter
    src = np.maximum(0.0, np.sin(phase)) ** 3.0
    src = np.diff(src, prepend=0.0)  # spectral tilt: differentiate the flow
    src += 0.01 * rng.standard_normal(n)  # aspiration noise

    # piecewise-constant vowel targets, smoothed into gliding formants
    seg = max(1, n // len(vowel_seq))
    f_tracks = []
    for fi in range(3):
        tgt = np.concatenate([
            np.full(seg, _VOWELS[v][fi]) for v in vowel_seq
        ])[:n]
        tgt = np.pad(tgt, (0, n - len(tgt)), mode="edge")
        k = int(0.030 * sr)
        kern = np.hanning(k)
        kern /= kern.sum()
        f_tracks.append(np.convolve(tgt, kern, mode="same"))

    y = np.zeros(n)
    for fi, bw in zip(range(3), (60.0, 90.0, 120.0)):
        y += _resonator(src, f_tracks[fi], bw, sr) * (1.0, 0.63, 0.3)[fi]

    # syllable-level amplitude envelope + fade in/out
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 3.3 * t - np.pi / 2) ** 2
    fade = min(int(0.02 * sr), n // 4)
    env[:fade] *= np.linspace(0, 1, fade)
    env[-fade:] *= np.linspace(1, 0, fade)
    y *= env
    return (0.6 * y / (np.max(np.abs(y)) + 1e-9)).astype(np.float32)


def _place(total: np.ndarray, sr: int, start_s: float, utt: np.ndarray) -> None:
    i = int(start_s * sr)
    total[i:i + len(utt)] += utt[:max(0, len(total) - i)]


def make_speech_16k() -> np.ndarray:
    """4 s, 16 kHz: three utterances separated by real silence gaps at
    [0.30-1.25], [1.75-2.70], [3.30-3.90] s (tests assert the segmenter
    recovers these boundaries; gaps are > 2 of the segmenter's 256 ms
    decision blocks so block rounding cannot merge them)."""
    sr = 16000
    rng = np.random.default_rng(2024)
    audio = np.zeros(4 * sr, np.float32)
    _place(audio, sr, 0.30, synth_utterance(0.95, sr, 120, 105, [0, 3, 1], rng))
    _place(audio, sr, 1.75, synth_utterance(0.95, sr, 135, 112, [4, 0, 2], rng))
    _place(audio, sr, 3.30, synth_utterance(0.60, sr, 118, 100, [1, 4], rng))
    return audio


def make_two_speaker_16k() -> np.ndarray:
    """4.5 s, 16 kHz: alternating low-F0 / high-F0 speakers with a short
    overlap around 2.9 s — exercises diarization-style front ends."""
    sr = 16000
    rng = np.random.default_rng(7)
    audio = np.zeros(int(4.5 * sr), np.float32)
    _place(audio, sr, 0.20, synth_utterance(1.00, sr, 105, 95, [0, 4, 3], rng))
    _place(audio, sr, 1.50, synth_utterance(1.00, sr, 210, 185, [1, 3, 0], rng))
    _place(audio, sr, 2.80, synth_utterance(0.80, sr, 100, 92, [2, 0], rng))
    _place(audio, sr, 2.90, 0.7 * synth_utterance(0.60, sr, 225, 200, [3, 1], rng))
    return audio


def make_noisy_pair_48k() -> tuple[np.ndarray, np.ndarray]:
    """(noisy, clean) 2 s @ 48 kHz at ~5 dB SNR — the synthetic analog of
    the reference's noisy_audio.wav / noisy_audio_target.wav pair."""
    sr = 48000
    rng = np.random.default_rng(99)
    clean = np.zeros(2 * sr, np.float32)
    _place(clean, sr, 0.15, synth_utterance(0.80, sr, 125, 108, [0, 1, 4], rng))
    _place(clean, sr, 1.15, synth_utterance(0.70, sr, 132, 115, [3, 2], rng))
    # pink-ish noise: white shaped by a one-pole lowpass, plus a hum tone
    w = rng.standard_normal(len(clean)).astype(np.float32)
    pink = np.zeros_like(w)
    acc = 0.0
    a = 0.985
    for i in range(len(w)):
        acc = a * acc + (1 - a) * w[i]
        pink[i] = acc
    pink /= np.max(np.abs(pink)) + 1e-9
    t = np.arange(len(clean)) / sr
    noise = 0.8 * pink + 0.2 * np.sin(2 * np.pi * 100.0 * t).astype(np.float32)
    sp = float(np.mean(clean ** 2))
    npow = float(np.mean(noise ** 2))
    snr = 5.0
    noise = noise * np.sqrt(sp / (npow * 10 ** (snr / 10)))
    noisy = np.clip(clean + noise.astype(np.float32), -1.0, 1.0)
    return noisy.astype(np.float32), clean


def main() -> None:
    save_wav(os.path.join(HERE, "speech_16k.wav"), make_speech_16k(), 16000)
    save_wav(os.path.join(HERE, "two_speaker_16k.wav"), make_two_speaker_16k(), 16000)
    noisy, clean = make_noisy_pair_48k()
    save_wav(os.path.join(HERE, "noisy_48k.wav"), noisy, 48000)
    save_wav(os.path.join(HERE, "clean_48k.wav"), clean, 48000)
    for f in ("speech_16k.wav", "two_speaker_16k.wav", "noisy_48k.wav",
              "clean_48k.wav"):
        p = os.path.join(HERE, f)
        print(f"{f}: {os.path.getsize(p)} bytes")


if __name__ == "__main__":
    main()
