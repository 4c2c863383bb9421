"""Model-agnostic streaming STT: incremental mel -> window encoder ->
session with provisional/confirmed token promotion.

Rebuild of the reference streaming subsystem
(Sources/MLXAudioSTT/Streaming/):

- :class:`IncrementalMelSpectrogram` — overlap-save rolling-buffer mel with
  reflect-padded first chunk and running-log-max normalization
  (IncrementalMelSpectrogram.swift:18-160); chunked output is
  frame-identical to one-shot mel.
- :class:`StreamingEncoder` — accumulates mel frames into
  ``window_size``-frame windows (800 = ~8 s for Qwen3-ASR), encodes full
  windows once via the model's block-attention ``encode_single_window`` and
  re-encodes the pending partial window for early feedback
  (StreamingEncoder.swift:20-177).
- :class:`StreamingInferenceSession` — repeated decode passes over
  [cached windows + pending partial]; provisional text promotes to
  confirmed after ``min_agreement_passes`` identical decodes AND the
  delay-preset time has elapsed (StreamingTypes.swift:13-93); emits
  provisional/confirmed/stats events with a real-time factor.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field
from enum import Enum

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import dsp
from tpu_audio.core.generation import STTGenerateParameters

__all__ = [
    "IncrementalMelSpectrogram",
    "StreamingEncoder",
    "StreamingInferenceSession",
    "DelayPreset",
    "TranscriptionEvent",
]


# ---------------------------------------------------------------------------
# Incremental mel
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "n_mels", "sr"))
def _mel_frames(signal, sr, n_fft, hop, n_mels):
    frames = dsp.frame_signal(signal, n_fft, hop)
    window = jnp.asarray(dsp.hanning_window(n_fft, periodic=False))
    spec = jnp.fft.rfft(frames * window[None, :], axis=-1)
    mag = jnp.abs(spec) ** 2
    fb = jnp.asarray(dsp.mel_filters(sr, n_fft, n_mels, norm="slaney"))
    mel = mag @ fb
    return jnp.log10(jnp.maximum(mel, 1e-10))


class IncrementalMelSpectrogram:
    """Overlap-save incremental whisper-style mel; ``process`` returns new
    frames [n, n_mels] (or None), ``flush`` drains the tail."""

    def __init__(self, sample_rate: int = 16000, n_fft: int = 400,
                 hop_length: int = 160, n_mels: int = 128):
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.n_mels = n_mels
        self.overlap_size = n_fft - hop_length
        self._overlap = np.zeros((0,), np.float32)
        self._first = True
        self._running_log_max = -np.inf
        self.total_frames = 0

    def _normalize(self, log_mel: np.ndarray) -> np.ndarray:
        self._running_log_max = max(self._running_log_max, float(log_mel.max()))
        log_mel = np.maximum(log_mel, self._running_log_max - 8.0)
        return (log_mel + 4.0) / 4.0

    def process(self, samples: np.ndarray) -> np.ndarray | None:
        samples = np.asarray(samples, np.float32)
        if samples.size == 0:
            return None
        if self._first:
            pad = self.n_fft // 2
            if samples.shape[0] > 1:
                prefix = samples[1 : min(pad + 1, samples.shape[0])][::-1]
                while prefix.shape[0] < pad:
                    prefix = np.concatenate(
                        [prefix, prefix[: pad - prefix.shape[0]]])
            else:
                prefix = np.full((pad,), samples[0] if len(samples) else 0.0,
                                 np.float32)
            signal = np.concatenate([prefix, samples])
            self._first = False
        else:
            signal = np.concatenate([self._overlap, samples])

        n_frames = max(0, (signal.shape[0] - self.n_fft) // self.hop_length + 1)
        if n_frames == 0:
            self._overlap = signal
            return None
        consumed = (n_frames - 1) * self.hop_length + self.n_fft
        if consumed < signal.shape[0]:
            self._overlap = signal[consumed - self.overlap_size:]
        else:
            self._overlap = signal[-self.overlap_size:]

        log_mel = np.asarray(_mel_frames(
            jnp.asarray(signal), self.sample_rate, self.n_fft,
            self.hop_length, self.n_mels))[:n_frames]
        self.total_frames += n_frames
        return self._normalize(log_mel)

    def flush(self) -> np.ndarray | None:
        if self._overlap.size == 0 or self._first:
            return None
        signal = self._overlap
        if signal.shape[0] < self.n_fft:
            signal = np.pad(signal, (0, self.n_fft - signal.shape[0]))
        self._overlap = np.zeros((0,), np.float32)
        log_mel = np.asarray(_mel_frames(
            jnp.asarray(signal), self.sample_rate, self.n_fft,
            self.hop_length, self.n_mels))
        self.total_frames += log_mel.shape[0]
        return self._normalize(log_mel)


# ---------------------------------------------------------------------------
# Streaming encoder
# ---------------------------------------------------------------------------


class StreamingEncoder:
    """Window accumulator over a model's ``encode_single_window``
    (StreamingEncoder.swift:20-205): full windows encode once and cache;
    the pending partial re-encodes for early feedback; ``overlap_frames``
    keeps a window tail in the pending buffer so consecutive windows
    overlap (encoderWindowOverlapSeconds)."""

    def __init__(self, encode_single_window, window_size: int = 800,
                 max_cached_windows: int = 60, overlap_frames: int = 0):
        self._encode = encode_single_window
        self.window_size = window_size
        overlap = max(0, min(overlap_frames, window_size - 1))
        self.window_stride = max(1, window_size - overlap)
        self.max_cached_windows = max_cached_windows
        self.cached: list[np.ndarray] = []
        self._new_windows: list[np.ndarray] = []
        self.total_encoded_windows = 0
        self._pending = np.zeros((0, 0), np.float32)

    def feed(self, mel_frames: np.ndarray) -> int:
        """Append frames; encode any completed windows. Returns the number of
        newly completed windows."""
        if self._pending.size == 0:
            self._pending = mel_frames
        else:
            self._pending = np.concatenate([self._pending, mel_frames], axis=0)
        new = 0
        while self._pending.shape[0] >= self.window_size:
            window = self._pending[: self.window_size]
            self._pending = self._pending[self.window_stride:]
            feats = np.asarray(self._encode(window))
            self.cached.append(feats)
            self._new_windows.append(feats)
            if len(self.cached) > self.max_cached_windows:
                self.cached.pop(0)
            self.total_encoded_windows += 1
            new += 1
        return new

    @property
    def pending_frames(self) -> int:
        return self._pending.shape[0]

    @property
    def encoded_window_count(self) -> int:
        return self.total_encoded_windows

    def drain_new_windows(self) -> list[np.ndarray]:
        """Newly completed window features since the last drain
        (drainNewlyEncodedWindows, StreamingEncoder.swift:190-194)."""
        out, self._new_windows = self._new_windows, []
        return out

    def encode_pending(self) -> np.ndarray | None:
        """Re-encode the pending partial window WITHOUT consuming it
        (encodePending, StreamingEncoder.swift:147-155)."""
        if self._pending.shape[0] == 0:
            return None
        return np.asarray(self._encode(self._pending))

    def encoded_features(self, include_pending: bool = True) -> np.ndarray:
        """Cached windows + re-encoded pending partial
        (getFullEncoderOutput, StreamingEncoder.swift:157-177)."""
        parts = list(self.cached)
        if include_pending and self._pending.shape[0] > 0:
            parts.append(np.asarray(self._encode(self._pending)))
        if not parts:
            return np.zeros((0, 1), np.float32)
        return np.concatenate(parts, axis=0)

    def flush_partial(self) -> None:
        if self._pending.shape[0] > 0:
            feats = np.asarray(self._encode(self._pending))
            self.cached.append(feats)
            self._new_windows.append(feats)
            self.total_encoded_windows += 1
            self._pending = np.zeros((0, 0), np.float32)


# ---------------------------------------------------------------------------
# Session
# ---------------------------------------------------------------------------


class DelayPreset(Enum):
    """Confirmation delay presets (StreamingTypes.swift:13-31)."""

    REALTIME = 0.2
    AGENT = 0.48
    SUBTITLE = 2.4


class EventKind(str, Enum):
    PROVISIONAL = "provisional"
    CONFIRMED = "confirmed"
    DISPLAY_UPDATE = "display_update"
    STATS = "stats"
    ENDED = "ended"


@dataclass
class TranscriptionEvent:
    kind: EventKind
    text: str = ""
    confirmed_text: str = ""
    stats: dict = field(default_factory=dict)


class StreamingInferenceSession:
    """Facade: feed audio, poll decode passes, promote provisional text
    to confirmed by agreement count + delay
    (StreamingInferenceSession.swift:148-1400, simplified to a synchronous
    poll-driven API — the reference paces passes with a timer)."""

    def __init__(self, model, delay_preset: DelayPreset = DelayPreset.AGENT,
                 min_agreement_passes: int = 2, language: str | None = None,
                 sample_rate: int = 16000, n_mels: int | None = None,
                 max_tokens_per_pass: int = 96):
        self.model = model
        self.delay = delay_preset.value
        self.min_agreement = min_agreement_passes
        self.language = language
        self.max_tokens_per_pass = max_tokens_per_pass
        n_mels = n_mels or model.config.audio.num_mel_bins
        self.mel = IncrementalMelSpectrogram(sample_rate, n_mels=n_mels)
        self.encoder = StreamingEncoder(
            model.encode_single_window,
            window_size=model.config.audio.n_window_infer)
        self._audio_seconds = 0.0
        self._wall_start = time.perf_counter()
        self._confirmed = ""
        self._provisional = ""
        self._agreement_count = 0
        self._last_candidate = ""
        self._candidate_since = None
        self._decode_time = 0.0
        self._passes = 0

    def feed_audio(self, samples: np.ndarray) -> list[TranscriptionEvent]:
        samples = np.asarray(samples, np.float32)
        self._audio_seconds += len(samples) / self.mel.sample_rate
        frames = self.mel.process(samples)
        if frames is not None:
            self.encoder.feed(frames)
        return []

    def decode_pass(self) -> list[TranscriptionEvent]:
        """Run one decode pass over all encoded audio; update provisional/
        confirmed via agreement counting."""
        feats = self.encoder.encoded_features(include_pending=True)
        if feats.shape[0] == 0:
            return []
        t0 = time.perf_counter()
        text, _lang, _, _ = self.model.decode_features(
            feats, STTGenerateParameters(
                language=self.language, max_tokens=self.max_tokens_per_pass,
                temperature=0.0))
        self._decode_time += time.perf_counter() - t0
        self._passes += 1
        events = []
        now = time.perf_counter()
        if text == self._last_candidate and text:
            self._agreement_count += 1
            if self._candidate_since is None:
                self._candidate_since = now
        else:
            self._last_candidate = text
            self._agreement_count = 1
            self._candidate_since = now
        self._provisional = text
        events.append(TranscriptionEvent(EventKind.PROVISIONAL, text=text,
                                         confirmed_text=self._confirmed))
        if (self._agreement_count >= self.min_agreement
                and self._candidate_since is not None
                and now - self._candidate_since >= self.delay
                and text and text != self._confirmed):
            self._confirmed = text
            events.append(TranscriptionEvent(EventKind.CONFIRMED, text=text,
                                             confirmed_text=text))
        return events

    def stop(self) -> list[TranscriptionEvent]:
        """Flush mel + partial window, final decode, emit stats + ended."""
        tail = self.mel.flush()
        if tail is not None:
            self.encoder.feed(tail)
        self.encoder.flush_partial()
        feats = self.encoder.encoded_features(include_pending=False)
        events = []
        if feats.shape[0] > 0:
            text, _lang, _, _ = self.model.decode_features(
                feats, STTGenerateParameters(
                    language=self.language, max_tokens=448, temperature=0.0))
            self._confirmed = text
            events.append(TranscriptionEvent(EventKind.CONFIRMED, text=text,
                                             confirmed_text=text))
        wall = time.perf_counter() - self._wall_start
        rtf = wall / self._audio_seconds if self._audio_seconds else 0.0
        events.append(TranscriptionEvent(EventKind.STATS, stats={
            "audio_seconds": self._audio_seconds,
            "wall_seconds": wall,
            "real_time_factor": rtf,
            "decode_passes": self._passes,
            "decode_time": self._decode_time,
        }))
        events.append(TranscriptionEvent(EventKind.ENDED,
                                         confirmed_text=self._confirmed))
        return events
