"""DSP primitives: windows, mel filterbanks, STFT/ISTFT, log-mel spectrograms.

TPU-first rebuild of the reference's DSP surface
(reference: Sources/MLXAudioCore/DSP.swift:15-273 and
Sources/MLXAudioSTT/Models/Whisper/WhisperAudio.swift:38-87).

Filterbank/window *construction* is host-side NumPy (tiny, done once, cached);
all per-call compute (framing, FFT, mel projection, log scaling) is JAX and is
jit-compiled with static shapes so the mel matmul rides the MXU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "hanning_window",
    "hamming_window",
    "irfft",
    "mel_filters",
    "power_to_db",
    "stft",
    "istft",
    "mel_spectrogram",
    "log_mel_spectrogram",
]


# ---------------------------------------------------------------------------
# Inverse real FFT
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _irdft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag inverse-rDFT bases [F, n]: x = Re(X) @ C + Im(X) @ S.

    With hermitian weights (DC and Nyquist x1, interior bins x2)."""
    n_freq = n_fft // 2 + 1
    k = np.arange(n_freq)
    t = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(k, t) / n_fft
    w = np.full(n_freq, 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    c = (np.cos(ang) * w[:, None] / n_fft).astype(np.float32)
    s = (-np.sin(ang) * w[:, None] / n_fft).astype(np.float32)
    return c, s


def irfft(spec: jnp.ndarray, n: int, axis: int = -1) -> jnp.ndarray:
    """``jnp.fft.irfft``, with a matmul inverse-rDFT on the tunneled
    axon TPU backend (whose runtime lacks the irfft primitive; rfft
    works). Everywhere the primitive exists it is used — exact and
    faster. The fallback GEMM runs at Precision.HIGHEST so it stays
    float32-exact (~1e-6) instead of bf16-operand default (~5e-4 — an
    audible -52 dB noise floor on synthesized waveforms).
    """
    if jax.default_backend() != "axon":
        return jnp.fft.irfft(spec, n=n, axis=axis)
    if axis != -1:
        spec = jnp.moveaxis(spec, axis, -1)
    c, s = _irdft_basis(n)
    hi = jax.lax.Precision.HIGHEST
    out = (jnp.matmul(spec.real.astype(jnp.float32), jnp.asarray(c),
                      precision=hi)
           + jnp.matmul(spec.imag.astype(jnp.float32), jnp.asarray(s),
                        precision=hi))
    if axis != -1:
        out = jnp.moveaxis(out, -1, axis)
    return out


# ---------------------------------------------------------------------------
# Windows (host-side construction; returned as float32 numpy)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def hanning_window(size: int, periodic: bool = False) -> np.ndarray:
    """Hann window.

    ``periodic=False`` matches the reference's symmetric ``hanningWindow``
    (denominator ``size-1``); ``periodic=True`` matches torch's default
    ``hann_window`` (denominator ``size``), which Whisper's frontend uses.
    """
    if size <= 0:
        return np.zeros((0,), np.float32)
    if size == 1:
        return np.ones((1,), np.float32)
    n = np.arange(size, dtype=np.float64)
    denom = float(size if periodic else size - 1)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / denom))
    return w.astype(np.float32)


@functools.lru_cache(maxsize=32)
def hamming_window(size: int, periodic: bool = True) -> np.ndarray:
    """Hamming window; periodic by default (reference DSP.swift:25-42)."""
    if size <= 0:
        return np.zeros((0,), np.float32)
    if size == 1:
        return np.ones((1,), np.float32)
    eff = size + 1 if periodic else size
    n = np.arange(eff, dtype=np.float64)
    w = 0.54 - 0.46 * np.cos(2.0 * np.pi * n / (eff - 1))
    return w[:size].astype(np.float32)


# ---------------------------------------------------------------------------
# Mel filterbank (host-side construction, cached)
# ---------------------------------------------------------------------------


def _hz_to_mel(freq: np.ndarray | float, mel_scale: str, f_min: float = 0.0):
    freq = np.asarray(freq, dtype=np.float64)
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # Slaney (Auditory Toolbox): linear below 1 kHz, log above.
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    log_step = math.log(6.4) / 27.0
    lin = (freq - f_min) / f_sp
    log = min_log_mel + np.log(np.maximum(freq, 1e-12) / min_log_hz) / log_step
    return np.where(freq < min_log_hz, lin, log)


def _mel_to_hz(mel: np.ndarray, mel_scale: str, f_min: float = 0.0):
    mel = np.asarray(mel, dtype=np.float64)
    if mel_scale == "htk":
        return 700.0 * (np.power(10.0, mel / 2595.0) - 1.0)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    log_step = math.log(6.4) / 27.0
    lin = f_min + f_sp * mel
    log = min_log_hz * np.exp(log_step * (mel - min_log_mel))
    return np.where(mel < min_log_mel, lin, log)


@functools.lru_cache(maxsize=64)
def mel_filters(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    f_min: float = 0.0,
    f_max: float | None = None,
    norm: str | None = "slaney",
    mel_scale: str = "htk",
) -> np.ndarray:
    """Triangular mel filterbank, shape ``[n_freqs, n_mels]``.

    Semantics match the reference exactly (DSP.swift:76-168): half-open
    rising edge ``low <= f < center``, closed falling edge
    ``center <= f <= high``, optional slaney area normalization.
    """
    if mel_scale not in ("htk", "slaney"):
        raise ValueError(f"unknown mel_scale {mel_scale!r}")
    f_max_val = f_max if f_max is not None else sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.arange(n_freqs, dtype=np.float64) * sample_rate / n_fft

    m_min = float(_hz_to_mel(f_min, mel_scale, f_min))
    m_max = float(_hz_to_mel(f_max_val, mel_scale, f_min))
    m_pts = m_min + np.arange(n_mels + 2, dtype=np.float64) * (m_max - m_min) / (
        n_mels + 1
    )
    f_pts = _mel_to_hz(m_pts, mel_scale, f_min)

    low = f_pts[:-2][None, :]  # [1, n_mels]
    center = f_pts[1:-1][None, :]
    high = f_pts[2:][None, :]
    f = all_freqs[:, None]  # [n_freqs, 1]

    rising = (f - low) / np.maximum(center - low, 1e-12)
    falling = (high - f) / np.maximum(high - center, 1e-12)
    fb = np.where((f >= low) & (f < center), rising, 0.0)
    fb = np.where((f >= center) & (f <= high), falling, fb)

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2:] - f_pts[:-2])
        fb = fb * enorm[None, :]

    return fb.astype(np.float32)


# ---------------------------------------------------------------------------
# STFT / ISTFT (JAX)
# ---------------------------------------------------------------------------


def _reflect_pad_1d(audio: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect-pad (no edge duplication), zero-filling if the signal is too
    short to reflect — matching WhisperAudio.reflectPad semantics."""
    if pad <= 0:
        return audio
    n = audio.shape[0]
    if n <= 1:
        return jnp.pad(audio, (pad, pad))
    left_count = min(pad, n - 1)
    right_count = min(pad, n - 1)
    left = audio[1 : left_count + 1][::-1]
    right = audio[n - 1 - right_count : n - 1][::-1]
    pieces = []
    if left_count < pad:
        pieces.append(jnp.zeros((pad - left_count,), audio.dtype))
    pieces += [left, audio, right]
    if right_count < pad:
        pieces.append(jnp.zeros((pad - right_count,), audio.dtype))
    return jnp.concatenate(pieces)


def frame_signal(padded: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """[T] -> [n_frames, n_fft] overlapping frames via gather (the TPU
    equivalent of the reference's zero-copy ``asStrided`` framing,
    DSP.swift:218)."""
    n = padded.shape[0]
    n_frames = 1 + (n - n_fft) // hop_length if n >= n_fft else 0
    if n_frames <= 0:
        return jnp.zeros((0, n_fft), padded.dtype)
    idx = (
        np.arange(n_frames, dtype=np.int32)[:, None] * hop_length
        + np.arange(n_fft, dtype=np.int32)[None, :]
    )
    return padded[idx]


def stft(
    audio: jnp.ndarray,
    window: np.ndarray | jnp.ndarray,
    n_fft: int,
    hop_length: int,
    pad_mode: str = "reflect",
    center: bool = True,
) -> jnp.ndarray:
    """STFT of a 1D signal -> complex ``[n_frames, n_fft//2+1]``.

    Matches reference ``stft`` (DSP.swift:181-227): center-pads by
    ``n_fft//2`` with reflect or constant mode, frames with ``hop_length``,
    windows, and takes an rfft along the frame axis.
    """
    audio = jnp.asarray(audio)
    if audio.ndim != 1:
        audio = audio.reshape(-1)
    if center:
        pad = n_fft // 2
        if pad_mode == "reflect":
            padded = _reflect_pad_1d(audio.astype(jnp.float32), pad)
        elif pad_mode == "constant":
            padded = jnp.pad(audio.astype(jnp.float32), (pad, pad))
        else:
            raise ValueError(f"unknown pad_mode {pad_mode!r}")
    else:
        padded = audio.astype(jnp.float32)
    frames = frame_signal(padded, n_fft, hop_length)
    windowed = frames * jnp.asarray(window, jnp.float32)[None, :]
    return jnp.fft.rfft(windowed, axis=-1)


def istft(
    spec: jnp.ndarray,
    window: np.ndarray | jnp.ndarray,
    n_fft: int,
    hop_length: int,
    length: int | None = None,
    center: bool = True,
) -> jnp.ndarray:
    """Inverse STFT with window-sum-square normalization (torch.istft
    semantics; needed by the ISTFT-head vocoders — reference
    Soprano/SopranoDecoder.swift:87-168, Vocos ISTFTHead)."""
    window = jnp.asarray(window, jnp.float32)
    frames = irfft(spec, n=n_fft, axis=-1)  # [n_frames, n_fft]
    frames = frames * window[None, :]
    n_frames = frames.shape[0]
    out_len = n_fft + hop_length * (n_frames - 1)

    # Overlap-add via scatter-add on frame offsets.
    idx = (
        np.arange(n_frames, dtype=np.int32)[:, None] * hop_length
        + np.arange(n_fft, dtype=np.int32)[None, :]
    ).reshape(-1)
    sig = jnp.zeros((out_len,), jnp.float32).at[idx].add(frames.reshape(-1))
    wsq = jnp.zeros((out_len,), jnp.float32).at[idx].add(
        jnp.tile(window * window, (n_frames,))
    )
    sig = sig / jnp.maximum(wsq, 1e-11)
    if center:
        pad = n_fft // 2
        sig = sig[pad : out_len - pad]
    if length is not None:
        sig = sig[:length]
        if sig.shape[0] < length:
            sig = jnp.pad(sig, (0, length - sig.shape[0]))
    return sig


# ---------------------------------------------------------------------------
# Spectrograms
# ---------------------------------------------------------------------------


def power_to_db(
    spectrogram: jnp.ndarray, amin: float = 1e-10, top_db: float | None = None
) -> jnp.ndarray:
    """Power -> dB with optional dynamic-range clipping (DSP.swift:61-73)."""
    db = 10.0 * jnp.log10(jnp.maximum(spectrogram, amin))
    if top_db is not None:
        db = jnp.maximum(db, db.max() - top_db)
    return db


@functools.partial(
    jax.jit, static_argnames=("sample_rate", "n_fft", "hop_length", "n_mels")
)
def _mel_spectrogram_impl(audio, sample_rate, n_fft, hop_length, n_mels):
    window = hanning_window(n_fft, periodic=False)
    freqs = stft(audio, window, n_fft, hop_length, pad_mode="reflect")
    magnitudes = jnp.abs(freqs) ** 2  # [n_frames, n_freqs]
    filters = jnp.asarray(
        mel_filters(sample_rate, n_fft, n_mels, norm="slaney", mel_scale="htk")
    )
    mel = magnitudes @ filters  # MXU matmul [n_frames, n_mels]
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max() - 8.0)
    return (log_spec + 4.0) / 4.0


def mel_spectrogram(
    audio: jnp.ndarray,
    sample_rate: int,
    n_fft: int,
    hop_length: int,
    n_mels: int,
) -> jnp.ndarray:
    """Whisper-style normalized log-mel ``[n_frames, n_mels]`` — the
    reference's generic ``computeMelSpectrogram`` (DSP.swift:230-273):
    symmetric hann window, HTK mel scale, slaney norm."""
    if audio.ndim != 1:
        return jnp.asarray(audio)  # already a spectrogram, mirroring the reference
    # Too short to produce a single frame: return an empty spectrogram
    # host-side (reference returns zeros([nMels, 0]) — WhisperAudio.swift:50-52).
    if audio.shape[0] + 2 * (n_fft // 2) < n_fft:
        return jnp.zeros((0, n_mels), jnp.float32)
    return _mel_spectrogram_impl(jnp.asarray(audio), sample_rate, n_fft, hop_length, n_mels)


def _use_pallas() -> bool:
    import os

    return os.environ.get("TPU_AUDIO_PALLAS") == "1"


@functools.partial(
    jax.jit, static_argnames=("sample_rate", "n_fft", "hop_length", "n_mels")
)
def _log_mel_impl(audio, sample_rate, n_fft, hop_length, n_mels):
    window = hanning_window(n_fft, periodic=True)  # torch.hann_window default
    freqs = stft(audio, window, n_fft, hop_length, pad_mode="reflect")
    # Drop the last frame to match torch.stft(center=True)
    # (reference WhisperAudio.swift:64-67).
    freqs = freqs[:-1]
    filters = jnp.asarray(
        mel_filters(
            sample_rate,
            n_fft,
            n_mels,
            f_min=0.0,
            f_max=sample_rate / 2.0,
            norm="slaney",
            mel_scale="slaney",
        )
    )
    if _use_pallas():
        from tpu_audio.ops.pallas_mel import fused_log_mel

        log_spec = fused_log_mel(freqs.real.astype(jnp.float32),
                                 freqs.imag.astype(jnp.float32), filters)
    else:
        mel = (jnp.abs(freqs) ** 2) @ filters  # [n_frames-1, n_mels]
        log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max() - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.T  # [n_mels, n_frames]


def log_mel_spectrogram(
    audio: jnp.ndarray,
    n_mels: int = 80,
    sample_rate: int = 16000,
    n_fft: int = 400,
    hop_length: int = 160,
) -> jnp.ndarray:
    """Whisper-exact log-mel ``[n_mels, n_frames]``
    (reference WhisperAudio.swift:38-79): periodic hann, slaney mel scale +
    slaney norm, torch.stft drop-last-frame parity, log10 clamp to
    ``max - 8`` and ``(x+4)/4`` normalization."""
    audio = np.asarray(audio) if not isinstance(audio, jnp.ndarray) else audio
    if audio.ndim > 1:
        audio = audio.reshape(-1)
    # After center padding and the torch drop-last-frame, fewer than two
    # strided frames means an empty output (reference WhisperAudio.swift:50-52).
    padded_len = audio.shape[0] + 2 * (n_fft // 2)
    n_frames = 1 + (padded_len - n_fft) // hop_length if padded_len >= n_fft else 0
    if n_frames - 1 <= 0:
        return jnp.zeros((n_mels, 0), jnp.float32)
    return _log_mel_impl(jnp.asarray(audio), sample_rate, n_fft, hop_length, n_mels)
