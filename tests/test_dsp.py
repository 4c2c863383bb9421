"""DSP golden tests: windows/STFT vs torch, mel filterbank vs an independent
loop implementation of the reference formulas (DSP.swift:76-168), Whisper
log-mel end-to-end invariants."""

import math

import numpy as np
import pytest

from tpu_audio.core import dsp


def _loop_mel_filters(sample_rate, n_fft, n_mels, f_min, f_max, norm, mel_scale):
    """Direct transliteration of the reference's scalar loops, as an
    independent check of the vectorized implementation."""
    n_freqs = n_fft // 2 + 1
    all_freqs = [i * sample_rate / n_fft for i in range(n_freqs)]

    if mel_scale == "htk":
        hz_to_mel = lambda f: 2595.0 * math.log10(1.0 + f / 700.0)
        mel_to_hz = lambda m: 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    else:
        f_sp = 200.0 / 3.0
        min_log_hz = 1000.0
        min_log_mel = (min_log_hz - f_min) / f_sp
        log_step = math.log(6.4) / 27.0

        def hz_to_mel(f):
            if f < min_log_hz:
                return (f - f_min) / f_sp
            return min_log_mel + math.log(f / min_log_hz) / log_step

        def mel_to_hz(m):
            if m < min_log_mel:
                return f_min + f_sp * m
            return min_log_hz * math.exp(log_step * (m - min_log_mel))

    m_min, m_max = hz_to_mel(f_min), hz_to_mel(f_max)
    m_pts = [m_min + i * (m_max - m_min) / (n_mels + 1) for i in range(n_mels + 2)]
    f_pts = [mel_to_hz(m) for m in m_pts]

    fb = np.zeros((n_freqs, n_mels))
    for i in range(n_freqs):
        for j in range(n_mels):
            low, center, high = f_pts[j], f_pts[j + 1], f_pts[j + 2]
            if low <= all_freqs[i] < center:
                fb[i][j] = (all_freqs[i] - low) / (center - low)
            elif center <= all_freqs[i] <= high:
                fb[i][j] = (high - all_freqs[i]) / (high - center)
    if norm == "slaney":
        for j in range(n_mels):
            fb[:, j] *= 2.0 / (f_pts[j + 2] - f_pts[j])
    return fb.astype(np.float32)


@pytest.mark.parametrize("mel_scale", ["htk", "slaney"])
@pytest.mark.parametrize("norm", ["slaney", None])
def test_mel_filters_match_reference_loops(mel_scale, norm):
    kw = dict(
        sample_rate=16000, n_fft=400, n_mels=80, f_min=0.0, f_max=8000.0
    )
    got = dsp.mel_filters(norm=norm, mel_scale=mel_scale, **kw)
    want = _loop_mel_filters(norm=norm, mel_scale=mel_scale, **kw)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
    assert got.shape == (201, 80)


def test_windows_match_torch():
    import torch

    np.testing.assert_allclose(
        dsp.hanning_window(400, periodic=True),
        torch.hann_window(400).numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        dsp.hanning_window(400, periodic=False),
        torch.hann_window(400, periodic=False).numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        dsp.hamming_window(512, periodic=True),
        torch.hamming_window(512).numpy(),
        atol=1e-6,
    )


def test_stft_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    x = rng.standard_normal(16000).astype(np.float32)
    n_fft, hop = 400, 160
    win = dsp.hanning_window(n_fft, periodic=True)

    got = np.asarray(dsp.stft(x, win, n_fft, hop, pad_mode="reflect"))
    want = (
        torch.stft(
            torch.from_numpy(x),
            n_fft,
            hop_length=hop,
            window=torch.from_numpy(win),
            center=True,
            pad_mode="reflect",
            return_complex=True,
        )
        .numpy()
        .T
    )  # torch gives [freq, frames]; ours is [frames, freq]

    # torch.stft(center=True) emits one fewer frame than the strided count —
    # compare the overlapping prefix (the reference drops the extra frame in
    # the whisper path, WhisperAudio.swift:64-67).
    n = min(got.shape[0], want.shape[0])
    np.testing.assert_allclose(got[:n].real, want[:n].real, atol=2e-3)
    np.testing.assert_allclose(got[:n].imag, want[:n].imag, atol=2e-3)


def test_whisper_log_mel_matches_torch_pipeline():
    """End-to-end parity with the openai/whisper mel pipeline computed via
    torch ops (the reference's own golden standard)."""
    import torch

    rng = np.random.default_rng(1)
    x = rng.standard_normal(16000 * 2).astype(np.float32) * 0.1
    n_mels = 80

    got = np.asarray(dsp.log_mel_spectrogram(x, n_mels=n_mels))

    # torch reference: whisper's audio.py recipe
    audio = torch.from_numpy(x)
    window = torch.hann_window(400)
    stft = torch.stft(audio, 400, 160, window=window, return_complex=True)
    mag = stft[..., :-1].abs() ** 2  # [freq, frames-1]
    fb = torch.from_numpy(
        dsp.mel_filters(
            16000, 400, n_mels, f_min=0.0, f_max=8000.0,
            norm="slaney", mel_scale="slaney",
        )
    )  # [freq, mel]
    mel = fb.T @ mag
    log_spec = torch.clamp(mel, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    want = ((log_spec + 4.0) / 4.0).numpy()

    assert got.shape == want.shape == (n_mels, 200)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_istft_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(6400).astype(np.float32)
    n_fft, hop = 1024, 256
    win = dsp.hanning_window(n_fft, periodic=True)
    spec = dsp.stft(x, win, n_fft, hop, pad_mode="reflect")
    y = np.asarray(dsp.istft(spec, win, n_fft, hop, length=len(x)))
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_power_to_db():
    s = np.array([1.0, 10.0, 100.0], np.float32)
    db = np.asarray(dsp.power_to_db(s))
    np.testing.assert_allclose(db, [0.0, 10.0, 20.0], atol=1e-5)
    db = np.asarray(dsp.power_to_db(s, top_db=15.0))
    np.testing.assert_allclose(db, [5.0, 10.0, 20.0], atol=1e-5)


def test_mel_spectrogram_generic():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(16000).astype(np.float32)
    m = np.asarray(dsp.mel_spectrogram(x, 16000, 400, 160, 80))
    assert m.shape == (101, 80)
    assert np.all(m <= 10.0) and np.isfinite(m).all()
    # normalization invariant: max value is (max_log + 4)/4, floor >= max-8
    log = m * 4.0 - 4.0
    assert log.max() - log.min() <= 8.0 + 1e-5


def test_irfft_matmul_basis_matches_fft():
    """The matmul inverse-rDFT (TPU fallback — the axon backend lacks the
    irfft primitive) matches jnp.fft.irfft."""
    import jax.numpy as jnp

    from tpu_audio.core import dsp

    rng = np.random.default_rng(0)
    for n in (960, 400, 96, 31):
        f = n // 2 + 1
        spec = (rng.standard_normal((5, f)) + 1j * rng.standard_normal((5, f))
                ).astype(np.complex64)
        want = np.fft.irfft(spec, n=n, axis=-1).astype(np.float32)
        c, s = dsp._irdft_basis(n)
        got = spec.real.astype(np.float32) @ c + spec.imag.astype(np.float32) @ s
        np.testing.assert_allclose(got, want, atol=2e-5)
