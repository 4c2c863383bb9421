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
from tpu_audio.core.jitting import ajit

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


@functools.partial(ajit, static_argnames=("n_fft", "hop", "n_mels", "sr"))
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
# Session: config, events, shared promotion state
# ---------------------------------------------------------------------------


class DelayPreset(Enum):
    """Confirmation delay presets (StreamingTypes.swift:13-31)."""

    REALTIME = 0.2
    AGENT = 0.48
    SUBTITLE = 2.4


@dataclass
class StreamingConfig:
    """Session configuration (StreamingTypes.swift:36-93). ``delay_seconds``
    is the provisional->confirmed promotion delay (DelayPreset or a custom
    value in seconds)."""

    decode_interval_seconds: float = 1.0
    boundary_decode_interval_seconds: float = 0.2
    boundary_boost_seconds: float = 1.0
    encoder_window_overlap_seconds: float = 1.0
    max_cached_windows: int = 60
    delay_seconds: float = DelayPreset.AGENT.value
    language: str | None = None
    temperature: float = 0.0
    max_tokens_per_pass: int = 512
    min_agreement_passes: int = 2
    boundary_min_agreement_passes: int = 3
    max_decode_windows: int = 1
    finalize_completed_windows: bool = True


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


@dataclass
class _SharedState:
    """SessionSharedState: token-level promotion bookkeeping shared by the
    Qwen and Cohere cores (StreamingInferenceSession.swift)."""

    completed_text: str = ""     # frozen text from finalized windows
    confirmed_text: str = ""     # promoted text inside the current window
    confirmed_ids: list = field(default_factory=list)
    provisional_ids: list = field(default_factory=list)
    first_seen: list = field(default_factory=list)
    agreement: list = field(default_factory=list)

    def reset_window(self):
        self.confirmed_ids = []
        self.provisional_ids = []
        self.first_seen = []
        self.agreement = []
        self.confirmed_text = ""


# -- text joining (appendText + dedupe helpers, :1191-1345) ------------------


def _normalized_word(word: str) -> str:
    return "".join(c for c in word.lower() if c.isalnum() or c in "'’")


def _normalized_words(text: str) -> list[str]:
    return [w for w in (_normalized_word(t) for t in text.split()) if w]


def _dedupe_leading_word_overlap(base: str, segment: str,
                                 max_words: int = 64) -> str:
    """Drop the longest segment prefix that repeats base's tail word-for-word
    (dedupeLeadingWordOverlap)."""
    base_words = base.split()
    seg_words = segment.split()
    if not base_words or not seg_words:
        return segment
    bn = [_normalized_word(w) for w in base_words]
    sn = [_normalized_word(w) for w in seg_words]

    def eq(i, j):
        if bn[i] and sn[j]:
            return bn[i] == sn[j]
        return base_words[i].lower() == seg_words[j].lower()

    for size in range(min(max_words, len(base_words), len(seg_words)), 0, -1):
        if all(eq(len(base_words) - size + k, k) for k in range(size)):
            return " ".join(seg_words[size:])
    return segment


def _should_skip_duplicate(base: str, segment: str) -> bool:
    """True when the whole segment already ends base (shouldSkipDuplicateAppend)."""
    seg = _normalized_words(segment)
    if not seg:
        return True
    bw = _normalized_words(base)
    if not bw or len(bw) < len(seg):
        return False
    lookback = min(len(bw), max(len(seg) * 2, 48))
    tail = bw[-lookback:]
    return len(tail) >= len(seg) and tail[-len(seg):] == seg


def _trim_contained_overlap(base: str, segment: str) -> str:
    """For long segments (>=8 words), drop a leading run already present
    verbatim in base's tail (trimContainedLeadingOverlap)."""
    seg_raw = segment.split()
    if len(seg_raw) < 8:
        return segment
    bw = _normalized_words(base)
    if not bw:
        return segment
    sn = [_normalized_word(w) for w in seg_raw]
    lookback = min(len(bw), max(len(sn) * 4, 160))
    tail = bw[-lookback:]
    min_overlap = min(12, len(sn))
    if min_overlap < 8:
        return segment
    for overlap in range(len(sn), min_overlap - 1, -1):
        prefix = sn[:overlap]
        if any(tail[s : s + overlap] == prefix
               for s in range(len(tail) - overlap + 1)):
            return " ".join(seg_raw[overlap:])
    return segment


def append_text(base: str, segment: str) -> str:
    """Join streamed text segments with word-overlap dedupe
    (appendText, StreamingInferenceSession.swift:1191-1215)."""
    segment = segment.strip()
    if not segment:
        return base
    if not base:
        return segment
    segment = _dedupe_leading_word_overlap(base, segment)
    segment = _trim_contained_overlap(base, segment)
    if not segment:
        return base
    if _should_skip_duplicate(base, segment):
        return base
    if base.endswith(tuple(" \n\t")) or segment[:1].isspace():
        return base + segment
    return base + " " + segment


def concat_text(a: str, b: str) -> str:
    return append_text(a, b)


def _promote_tokens(state: _SharedState, all_ids: list[int], now: float,
                    delay_seconds: float, min_agreement: int,
                    decode_text, events: list) -> None:
    """Prefix-agreement token promotion (promoteTokens,
    StreamingInferenceSession.swift:757-830): the stable prefix of the new
    provisional tokens accrues agreement counts; tokens promote to confirmed
    once they have BOTH ``min_agreement`` consecutive identical passes and
    ``delay_seconds`` of age."""
    confirmed_count = len(state.confirmed_ids)
    new_prov = list(all_ids[min(confirmed_count, len(all_ids)):])

    match_len = 0
    for i in range(min(len(state.provisional_ids), len(new_prov))):
        if state.provisional_ids[i] == new_prov[i]:
            match_len = i + 1
        else:
            break

    first_seen, agreement = [], []
    for i in range(len(new_prov)):
        if i < match_len:
            first_seen.append(state.first_seen[i]
                              if i < len(state.first_seen) else now)
            prev = state.agreement[i] if i < len(state.agreement) else 1
            agreement.append(max(1, prev + 1))
        else:
            first_seen.append(now)
            agreement.append(1)

    promote = 0
    for i in range(len(new_prov)):
        if (now - first_seen[i] >= delay_seconds
                and agreement[i] >= min_agreement):
            promote = i + 1
        else:
            break

    if promote > 0:
        state.confirmed_ids.extend(new_prov[:promote])
        state.confirmed_text = decode_text(state.confirmed_ids)
        events.append(TranscriptionEvent(
            EventKind.CONFIRMED,
            text=concat_text(state.completed_text, state.confirmed_text),
            confirmed_text=concat_text(state.completed_text,
                                       state.confirmed_text)))
    state.provisional_ids = new_prov[promote:]
    state.first_seen = first_seen[promote:]
    state.agreement = agreement[promote:]

    prefix = concat_text(state.completed_text, state.confirmed_text)
    prov_text = decode_text(state.provisional_ids)
    events.append(TranscriptionEvent(
        EventKind.DISPLAY_UPDATE, text=prov_text, confirmed_text=prefix))


# ---------------------------------------------------------------------------
# Cores
# ---------------------------------------------------------------------------


class _QwenStreamingCore:
    """Qwen3-ASR core (QwenStreamingInferenceSessionCore, :966-1550):
    incremental mel -> window encoder; partial decodes over the PENDING
    window with token promotion; timer-paced with a boundary boost after
    each completed window; completed windows optionally finalized by a
    one-shot decode appended to completed text.

    TPU note: the reference runs decode passes in detached Tasks; on one
    chip concurrent passes would just contend for the device, so passes run
    synchronously inside ``feed_audio`` — cadence is wall-clock gated by the
    injectable ``clock`` (tests pace it deterministically)."""

    def __init__(self, model, config: StreamingConfig, clock=time.monotonic):
        self.model = model
        self.config = config
        self.clock = clock
        sr = 16000
        n_mels = model.config.audio.num_mel_bins
        self.mel = IncrementalMelSpectrogram(sr, n_mels=n_mels)
        overlap_frames = max(0, round(
            config.encoder_window_overlap_seconds * sr / 160.0))
        self.encoder = StreamingEncoder(
            model.encode_single_window,
            window_size=model.config.audio.n_window_infer,
            max_cached_windows=config.max_cached_windows,
            overlap_frames=overlap_frames)
        self.state = _SharedState()
        self.sample_rate = sr
        self._total_samples = 0
        self._wall_start = clock()
        self._last_decode: float | None = None
        self._boost_until: float | None = None
        self._has_new_content = False
        self._decode_time = 0.0
        self._passes = 0
        self._tokens = 0

    # -- model hooks --------------------------------------------------------

    def _decode_ids(self, feats: np.ndarray, confirmed: list[int]) -> list[int]:
        ids, _n_prompt = self.model.decode_features_tokens(
            feats, STTGenerateParameters(
                language=self.config.language,
                max_tokens=self.config.max_tokens_per_pass,
                temperature=self.config.temperature),
            forced_tokens=confirmed)
        return ids

    def _decode_text(self, ids: list[int]) -> str:
        if not ids:
            return ""
        decoded = self.model.tokenizer.decode(
            [int(t) for t in ids], skip_special_tokens=True)
        _lang, text = self.model._parse_output(decoded, self.config.language)
        return text

    # -- session API --------------------------------------------------------

    def feed_audio(self, samples: np.ndarray) -> list[TranscriptionEvent]:
        events: list[TranscriptionEvent] = []
        samples = np.asarray(samples, np.float32)
        self._total_samples += len(samples)
        frames = self.mel.process(samples)
        if frames is None:
            return events
        new_windows = self.encoder.feed(frames)
        if new_windows > 0 or self.encoder.pending_frames > 0:
            self._has_new_content = True

        now = self.clock()
        if new_windows > 0 and self.config.boundary_boost_seconds > 0:
            self._boost_until = now + self.config.boundary_boost_seconds

        # boundary boost: briefly faster decode cadence after a window
        # boundary (boundaryDecodeIntervalSeconds, :1035-1046)
        if self._boost_until is not None and now < self._boost_until:
            interval = min(max(0.05, self.config.boundary_decode_interval_seconds),
                           max(0.05, self.config.decode_interval_seconds))
        else:
            self._boost_until = None
            interval = max(0.05, self.config.decode_interval_seconds)

        if self.config.finalize_completed_windows and new_windows > 0:
            should = True
        elif self._last_decode is not None:
            should = now - self._last_decode >= interval
        else:
            should = self._has_new_content

        if should and self._has_new_content:
            self._has_new_content = False
            boundary_pass = (self.config.finalize_completed_windows
                             and new_windows > 0)
            if not boundary_pass:
                self._last_decode = now
            events.extend(self._decode_pass_locked())
        return events

    def _decode_pass_locked(self) -> list[TranscriptionEvent]:
        events: list[TranscriptionEvent] = []
        if self.config.finalize_completed_windows:
            new_windows = self.encoder.drain_new_windows()
            if new_windows:
                self._finalize_windows(new_windows, events)
                return events
        else:
            self._freeze_completed_windows()

        feats = self.encoder.encode_pending()
        if feats is None or feats.shape[0] == 0:
            return events
        now = self.clock()
        min_agreement = max(1, self.config.min_agreement_passes)
        if self._boost_until is not None and now < self._boost_until:
            min_agreement = max(min_agreement,
                                self.config.boundary_min_agreement_passes)
        t0 = time.perf_counter()
        ids = self._decode_ids(feats, self.state.confirmed_ids)
        self._decode_time += time.perf_counter() - t0
        self._passes += 1
        self._tokens += max(0, len(ids) - len(self.state.confirmed_ids))
        _promote_tokens(self.state, ids, now, self.config.delay_seconds,
                        min_agreement, self._decode_text, events)
        events.append(self._stats_event())
        return events

    def _finalize_windows(self, windows: list[np.ndarray], events: list):
        """One-shot decode per completed window, appended to completed text
        (runFinalizeCompletedWindows, :1553-1620). The first window reuses
        the streamed tokens when available."""
        streamed = self.state.confirmed_ids + self.state.provisional_ids
        for idx, feats in enumerate(windows):
            if idx == 0 and streamed:
                text = self._decode_text(streamed)
            else:
                if feats.shape[0] == 0:
                    continue
                t0 = time.perf_counter()
                ids = self._decode_ids(feats, [])
                self._decode_time += time.perf_counter() - t0
                self._passes += 1
                self._tokens += len(ids)
                text = self._decode_text(ids)
            if text.strip():
                self.state.completed_text = append_text(
                    self.state.completed_text, text)
            self.state.reset_window()
        events.append(TranscriptionEvent(
            EventKind.DISPLAY_UPDATE, text="",
            confirmed_text=self.state.completed_text))
        events.append(self._stats_event())

    def _freeze_completed_windows(self):
        """finalize_completed_windows=False path: freeze streamed text at
        window boundaries without re-decoding (freezeCompletedWindowsLocked)."""
        drained = self.encoder.drain_new_windows()
        if not drained:
            return
        all_ids = self.state.confirmed_ids + self.state.provisional_ids
        if all_ids:
            self.state.completed_text = append_text(
                self.state.completed_text, self._decode_text(all_ids))
        self.state.reset_window()

    def _stats_event(self) -> TranscriptionEvent:
        audio_s = self._total_samples / self.sample_rate
        wall = self.clock() - self._wall_start
        return TranscriptionEvent(EventKind.STATS, stats={
            "encoded_window_count": self.encoder.encoded_window_count,
            "audio_seconds": audio_s,
            "wall_seconds": wall,
            "real_time_factor": (wall / audio_s) if audio_s else 0.0,
            "tokens_per_second": (self._tokens / self._decode_time
                                  if self._decode_time else 0.0),
            "decode_passes": self._passes,
            "decode_time": self._decode_time,
        })

    def stop(self) -> list[TranscriptionEvent]:
        events: list[TranscriptionEvent] = []
        tail = self.mel.flush()
        if tail is not None:
            self.encoder.feed(tail)
        self.encoder.flush_partial()
        new_windows = self.encoder.drain_new_windows()
        if new_windows:
            self._finalize_windows(new_windows, events)
        final = concat_text(self.state.completed_text,
                            self.state.confirmed_text)
        final = concat_text(final,
                            self._decode_text(self.state.provisional_ids))
        events.append(self._stats_event())
        events.append(TranscriptionEvent(EventKind.ENDED, text=final,
                                         confirmed_text=final))
        return events


class _CohereStreamingCore:
    """Cohere core (CohereStreamingInferenceSessionCore, :552-962): raw-audio
    8 s windows with overlap; partial passes re-decode the pending audio
    with confirmed tokens teacher-forced; completed windows finalize with a
    full decode appended to completed text; token promotion identical to the
    Qwen core."""

    WINDOW_SECONDS = 8.0

    def __init__(self, model, config: StreamingConfig, clock=time.monotonic):
        self.model = model
        self.config = config
        self.clock = clock
        self.sample_rate = model.config.sample_rate
        self.window_samples = int(self.sample_rate * self.WINDOW_SECONDS)
        self.overlap_samples = max(0, min(
            round(config.encoder_window_overlap_seconds * self.sample_rate),
            self.window_samples - 1))
        self.state = _SharedState()
        self._pending = np.zeros((0,), np.float32)
        self._total_samples = 0
        self._finalized_windows = 0
        self._wall_start = clock()
        self._last_decode: float | None = None
        self._decode_time = 0.0
        self._passes = 0
        self._tokens = 0

    def _decode_text(self, ids: list[int]) -> str:
        return self.model.streaming_decode_text(ids)

    def feed_audio(self, samples: np.ndarray) -> list[TranscriptionEvent]:
        events: list[TranscriptionEvent] = []
        samples = np.asarray(samples, np.float32)
        self._pending = np.concatenate([self._pending, samples])
        self._total_samples += len(samples)
        now = self.clock()

        if len(self._pending) >= self.window_samples:
            window = self._pending[: self.window_samples]
            keep_start = max(0, self.window_samples - self.overlap_samples)
            self._pending = self._pending[keep_start:]
            self._finalized_windows += 1
            self._last_decode = now
            self._finalize_window(window, events)
            return events

        if len(self._pending) < self.sample_rate // 2:
            return events
        if (self._last_decode is not None
                and now - self._last_decode
                < max(0.2, self.config.decode_interval_seconds)):
            return events
        self._last_decode = now
        t0 = time.perf_counter()
        ids, _ = self.model.streaming_decode_token_ids(
            self._pending, self.config, self.state.confirmed_ids)
        self._decode_time += time.perf_counter() - t0
        self._passes += 1
        self._tokens += max(0, len(ids) - len(self.state.confirmed_ids))
        _promote_tokens(self.state, ids, now, self.config.delay_seconds,
                        max(1, self.config.min_agreement_passes),
                        self._decode_text, events)
        events.append(self._stats_event())
        return events

    def _finalize_window(self, window: np.ndarray, events: list):
        t0 = time.perf_counter()
        ids, _ = self.model.streaming_decode_token_ids(
            window, self.config, [])
        self._decode_time += time.perf_counter() - t0
        self._passes += 1
        self._tokens += len(ids)
        text = self._decode_text(ids)
        self.state.completed_text = concat_text(self.state.completed_text,
                                                text)
        self.state.reset_window()
        events.append(TranscriptionEvent(
            EventKind.DISPLAY_UPDATE, text="",
            confirmed_text=self.state.completed_text))
        events.append(self._stats_event())

    def _stats_event(self) -> TranscriptionEvent:
        audio_s = self._total_samples / self.sample_rate
        wall = self.clock() - self._wall_start
        return TranscriptionEvent(EventKind.STATS, stats={
            "encoded_window_count": max(
                self._finalized_windows,
                int(np.ceil(audio_s / self.WINDOW_SECONDS))),
            "audio_seconds": audio_s,
            "wall_seconds": wall,
            "real_time_factor": (wall / audio_s) if audio_s else 0.0,
            "tokens_per_second": (self._tokens / self._decode_time
                                  if self._decode_time else 0.0),
            "decode_passes": self._passes,
            "decode_time": self._decode_time,
        })

    def stop(self) -> list[TranscriptionEvent]:
        events: list[TranscriptionEvent] = []
        if len(self._pending) > 0:
            self._finalized_windows += 1
            self._finalize_window(self._pending, events)
            self._pending = np.zeros((0,), np.float32)
        if self.state.provisional_ids:
            self.state.confirmed_ids.extend(self.state.provisional_ids)
            self.state.provisional_ids = []
        self.state.confirmed_text = self._decode_text(self.state.confirmed_ids)
        final = concat_text(self.state.completed_text,
                            self.state.confirmed_text)
        events.append(self._stats_event())
        events.append(TranscriptionEvent(EventKind.ENDED, text=final,
                                         confirmed_text=final))
        return events


class _MossStreamingCore:
    """MossTranscribeDiarize core (MossStreamingInferenceSessionCore,
    :176-550): consumed ~4 s windows (sized by max_decode_windows), partial
    tail decodes (1.25-2.5 s) for live feedback; finalized windows append
    with newline separators; text-level (no token promotion)."""

    def __init__(self, model, config: StreamingConfig, clock=time.monotonic):
        self.model = model
        self.config = config
        self.clock = clock
        self.sample_rate = model.sample_rate
        window_seconds = max(3.0, min(6.0, max(1, config.max_decode_windows)
                                      * 4.0))
        self.window_samples = max(self.sample_rate,
                                  round(window_seconds * self.sample_rate))
        self.min_partial_samples = max(self.sample_rate,
                                       round(1.25 * self.sample_rate))
        self.partial_samples = max(
            self.min_partial_samples,
            round(min(window_seconds, 2.5) * self.sample_rate))
        self.completed_text = ""
        self.provisional_text = ""
        self._pending = np.zeros((0,), np.float32)
        self._pending_start = 0
        self._total_samples = 0
        self._finalized_windows = 0
        self._wall_start = clock()
        self._last_decode: float | None = None
        self._decode_time = 0.0
        self._passes = 0

    def _display(self, events: list):
        confirmed = self.completed_text
        if confirmed and self.provisional_text \
                and not self.provisional_text.startswith("\n"):
            confirmed = confirmed + "\n"
        events.append(TranscriptionEvent(
            EventKind.DISPLAY_UPDATE, text=self.provisional_text,
            confirmed_text=confirmed))

    def _window_pass(self, samples: np.ndarray, offset: float, final: bool,
                     events: list):
        seconds = len(samples) / self.sample_rate
        max_tokens = None if final else min(
            self.config.max_tokens_per_pass,
            max(48, int(np.ceil(seconds * 16.0))))
        t0 = time.perf_counter()
        text = self.model.streaming_transcribe_window(
            samples, offset_seconds=offset,
            language=self.config.language, max_tokens=max_tokens)
        self._decode_time += time.perf_counter() - t0
        self._passes += 1
        text = text.strip()
        if final:
            if text:
                self.completed_text = (text if not self.completed_text
                                       else self.completed_text + "\n" + text)
            self.provisional_text = ""
        else:
            self.provisional_text = text
        self._display(events)
        events.append(self._stats_event(seconds))

    def feed_audio(self, samples: np.ndarray) -> list[TranscriptionEvent]:
        events: list[TranscriptionEvent] = []
        samples = np.asarray(samples, np.float32)
        self._pending = np.concatenate([self._pending, samples])
        self._total_samples += len(samples)
        now = self.clock()

        if len(self._pending) >= self.window_samples:
            window = self._pending[: self.window_samples]
            offset = self._pending_start / self.sample_rate
            self._pending = self._pending[self.window_samples:]
            self._pending_start += self.window_samples
            self._finalized_windows += 1
            self._last_decode = now
            self._window_pass(window, offset, final=True, events=events)
            return events

        if len(self._pending) < self.min_partial_samples:
            return events
        if (self._last_decode is not None
                and now - self._last_decode
                < max(1.0, self.config.decode_interval_seconds)):
            return events
        self._last_decode = now
        count = min(len(self._pending), self.partial_samples)
        start = len(self._pending) - count
        offset = (self._pending_start + start) / self.sample_rate
        self._window_pass(self._pending[start:], offset, final=False,
                          events=events)
        return events

    def _stats_event(self, window_seconds: float) -> TranscriptionEvent:
        audio_s = self._total_samples / self.sample_rate
        wall = self.clock() - self._wall_start
        return TranscriptionEvent(EventKind.STATS, stats={
            "encoded_window_count": max(
                self._finalized_windows,
                int(np.ceil(audio_s / max(window_seconds, 1e-3)))),
            "audio_seconds": audio_s,
            "wall_seconds": wall,
            "real_time_factor": (wall / audio_s) if audio_s else 0.0,
            "decode_passes": self._passes,
            "decode_time": self._decode_time,
        })

    def stop(self) -> list[TranscriptionEvent]:
        events: list[TranscriptionEvent] = []
        if len(self._pending) > 0:
            offset = self._pending_start / self.sample_rate
            self._finalized_windows += 1
            self._window_pass(self._pending, offset, final=True,
                              events=events)
            self._pending = np.zeros((0,), np.float32)
        final = self.completed_text or self.provisional_text
        events.append(TranscriptionEvent(EventKind.ENDED, text=final,
                                         confirmed_text=final))
        return events


# ---------------------------------------------------------------------------
# Facade
# ---------------------------------------------------------------------------


class StreamingInferenceSession:
    """Model-agnostic streaming session facade selecting the Qwen3ASR,
    CohereTranscribe, or MossTranscribeDiarize core
    (StreamingInferenceSession.swift:148-187).

    Synchronous API: ``feed_audio(samples)``/``stop()`` return the events
    each call produced (decode passes run inline — on a single TPU chip
    detached decode tasks would only contend for the device, so cadence is
    wall-clock gated instead of timer-threaded). ``stream()`` wraps the
    same session as an asyncio generator mirroring the reference's
    AsyncStream<TranscriptionEvent> surface.
    """

    def __init__(self, model, config: StreamingConfig | None = None,
                 delay_preset: DelayPreset | float | None = None,
                 min_agreement_passes: int | None = None,
                 language: str | None = None, clock=time.monotonic,
                 **legacy):
        config = config or StreamingConfig()
        if delay_preset is not None:
            config.delay_seconds = (delay_preset.value
                                    if isinstance(delay_preset, DelayPreset)
                                    else float(delay_preset))
        if min_agreement_passes is not None:
            config.min_agreement_passes = min_agreement_passes
        if language is not None:
            config.language = language
        if "max_tokens_per_pass" in legacy:
            config.max_tokens_per_pass = legacy["max_tokens_per_pass"]
        self.config = config
        self.core = self._select_core(model, config, clock)

    @staticmethod
    def _select_core(model, config, clock):
        if hasattr(model, "encode_single_window"):
            return _QwenStreamingCore(model, config, clock)
        if hasattr(model, "streaming_decode_token_ids"):
            return _CohereStreamingCore(model, config, clock)
        if hasattr(model, "streaming_transcribe_window"):
            return _MossStreamingCore(model, config, clock)
        raise TypeError(
            "StreamingInferenceSession requires a Qwen3ASR, CohereTranscribe,"
            f" or MossTranscribeDiarize model; got {type(model).__name__}")

    def feed_audio(self, samples: np.ndarray) -> list[TranscriptionEvent]:
        return self.core.feed_audio(samples)

    def stop(self) -> list[TranscriptionEvent]:
        return self.core.stop()

    async def stream(self, chunks):
        """Async event API over an (async or sync) iterable of sample
        chunks: yields TranscriptionEvents as they are produced and finishes
        with stats + ended (the reference's AsyncStream surface)."""
        import inspect

        if inspect.isasyncgen(chunks) or hasattr(chunks, "__aiter__"):
            async for chunk in chunks:
                for ev in self.feed_audio(chunk):
                    yield ev
        else:
            import asyncio

            for chunk in chunks:
                for ev in self.feed_audio(chunk):
                    yield ev
                await asyncio.sleep(0)
        for ev in self.stop():
            yield ev
