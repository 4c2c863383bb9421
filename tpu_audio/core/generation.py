"""Shared generation event types, perf-info structs and parameter structs.

Rebuild of the reference's GenerationTypes
(Sources/MLXAudioCore/Generation/GenerationTypes.swift:14-128) and the STT
parameter surface (Sources/MLXAudioSTT/Generation.swift:8-64). Streaming uses
plain (sync or async) Python generators yielding these events in place of
Swift's AsyncThrowingStream.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Iterator

import numpy as np

__all__ = [
    "AudioGeneration",
    "AudioGenerationInfo",
    "AudioGenerateParameters",
    "STTGenerateParameters",
    "STTOutput",
    "STTSegment",
    "AudioGenerationError",
    "Timer",
]


class AudioGenerationError(RuntimeError):
    pass


@dataclass
class AudioGenerationInfo:
    """Perf stats emitted with generation results
    (GenerationTypes.swift:14-45)."""

    prompt_token_count: int = 0
    generation_token_count: int = 0
    prompt_time: float = 0.0
    generate_time: float = 0.0
    audio_duration: float = 0.0
    peak_memory_bytes: int = 0

    @property
    def prompt_tokens_per_second(self) -> float:
        return self.prompt_token_count / self.prompt_time if self.prompt_time else 0.0

    @property
    def tokens_per_second(self) -> float:
        return (
            self.generation_token_count / self.generate_time
            if self.generate_time
            else 0.0
        )

    @property
    def real_time_factor(self) -> float:
        """generation wall time / audio duration (< 1 is faster than RT)."""
        total = self.prompt_time + self.generate_time
        return total / self.audio_duration if self.audio_duration else 0.0


class AudioGenerationKind(str, Enum):
    TOKEN = "token"
    INFO = "info"
    AUDIO = "audio"
    PROGRESS = "progress"


@dataclass
class AudioGeneration:
    """Streaming event (GenerationTypes.swift:50-61): ``.token(int)``,
    ``.info(AudioGenerationInfo)``, ``.audio(np.ndarray)``,
    ``.progress(float)``."""

    kind: AudioGenerationKind
    token: int | None = None
    info: AudioGenerationInfo | None = None
    audio: np.ndarray | None = None
    progress: float | None = None

    @classmethod
    def from_token(cls, t: int) -> "AudioGeneration":
        return cls(AudioGenerationKind.TOKEN, token=t)

    @classmethod
    def from_info(cls, i: AudioGenerationInfo) -> "AudioGeneration":
        return cls(AudioGenerationKind.INFO, info=i)

    @classmethod
    def from_audio(cls, a: np.ndarray) -> "AudioGeneration":
        return cls(AudioGenerationKind.AUDIO, audio=a)

    @classmethod
    def from_progress(cls, p: float) -> "AudioGeneration":
        return cls(AudioGenerationKind.PROGRESS, progress=p)


AudioGenerationStream = Iterator[AudioGeneration]


def samples_stream(model, text: str, **kwargs) -> Iterator[np.ndarray]:
    """Yield raw float32 sample chunks from ``model.generate_stream`` —
    the reference's ``generateSamplesStream`` default implementation
    (MLXAudioTTS/Generation.swift:53): audio events only, tokens/info
    dropped."""
    for event in model.generate_stream(text, **kwargs):
        if event.kind == AudioGenerationKind.AUDIO and event.audio is not None:
            yield np.asarray(event.audio, np.float32)


def pcm_stream(model, text: str, out_rate: int | None = None,
               dtype=np.int16, **kwargs) -> Iterator[np.ndarray]:
    """Yield playback-ready PCM chunks — the reference's
    ``generatePCMBufferStream`` (MLXAudioTTS/Generation.swift:79): model
    audio resampled to ``out_rate`` through the stateful
    :class:`~tpu_audio.core.audio_stream.PCMStreamConverter` and
    quantized to ``dtype`` (int16 by default; pass ``np.float32`` to
    skip quantization)."""
    from tpu_audio.core.audio_stream import PCMStreamConverter

    sr = int(getattr(model, "sample_rate", 24000))
    out_rate = int(out_rate or sr)
    conv = PCMStreamConverter(out_rate=out_rate) if out_rate != sr else None

    def emit(x: np.ndarray) -> np.ndarray | None:
        if x.size == 0:
            return None
        if dtype == np.int16:
            from tpu_audio.core.audio_io import float_to_pcm16

            return float_to_pcm16(x)
        return x.astype(dtype)

    for chunk in samples_stream(model, text, **kwargs):
        out = conv.push(chunk, sr) if conv is not None else chunk
        pcm = emit(np.asarray(out, np.float32))
        if pcm is not None:
            yield pcm
    if conv is not None:
        pcm = emit(conv.finish())
        if pcm is not None:
            yield pcm


@dataclass
class AudioGenerateParameters:
    """TTS generation parameters (GenerationTypes.swift:108-128)."""

    max_tokens: int = 1200
    temperature: float = 0.6
    top_p: float = 0.8
    top_k: int = 0
    repetition_penalty: float = 1.3
    repetition_context_size: int = 64
    seed: int | None = None
    streaming_interval: float = 0.5  # seconds of audio per streamed chunk
    verbose: bool = False
    extra: dict[str, Any] = field(default_factory=dict)


@dataclass
class STTGenerateParameters:
    """STT generation parameters (MLXAudioSTT/Generation.swift:8-27),
    including KV-cache quantization knobs."""

    language: str | None = None
    task: str = "transcribe"
    max_tokens: int = 448
    temperature: float = 0.0
    chunk_duration: float | None = None
    # KV quantization (Generation.swift:14-19): kv_bits 8 = int8 symmetric,
    # 4 = packed affine int4; quantized_kv_start keeps positions below it
    # full precision (hybrid dense-prefix cache)
    kv_bits: int | None = None
    kv_group_size: int = 64
    quantized_kv_start: int = 0
    # AED beam decode width where the model supports it (FireRedASR2's
    # reference default is 3; None = the model's own default)
    beam_size: int | None = None
    # Long-audio window batching (whisper): decode all 30 s windows of a
    # file through one batched graph instead of sequentially — the decoder
    # weight reads amortize across windows, so multi-window files decode
    # several times faster. Greedy output is token-identical to the
    # sequential loop on the shared XLA path; two documented deviations:
    # (a) kv_bits=8 on a real TPU routes the *sequential* b=1 decode
    # through the fused Pallas cross-KV kernel, whose transposed
    # quantization layout has slightly different numerics, and (b) with
    # temperature > 0 the batched loop draws per-window sampling streams
    # (fold_in per row) instead of the sequential loop's shared
    # PRNGKey(0) per chunk, so sampled tokens differ between the modes.
    # Beyond-reference surface (the reference loops windows serially,
    # WhisperModel.swift:165-182).
    batch_windows: bool = True
    verbose: bool = False
    extra: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        from tpu_audio.core.kv_cache import validate_kv_bits

        validate_kv_bits(self.kv_bits)


@dataclass
class STTSegment:
    text: str
    start: float
    end: float
    tokens: list[int] = field(default_factory=list)
    # diarizing models (MossTranscribeDiarize) attach a speaker label
    speaker: str | None = None


@dataclass
class STTOutput:
    """Transcription result + perf info
    (Models/GLMASR/STTOutput.swift:13-109)."""

    text: str
    segments: list[STTSegment] = field(default_factory=list)
    language: str | None = None
    prompt_token_count: int = 0
    generation_token_count: int = 0
    prompt_time: float = 0.0
    generation_time: float = 0.0
    total_time: float = 0.0
    peak_memory_bytes: int = 0

    @property
    def prompt_tps(self) -> float:
        return self.prompt_token_count / self.prompt_time if self.prompt_time else 0.0

    @property
    def generation_tps(self) -> float:
        return (
            self.generation_token_count / self.generation_time
            if self.generation_time
            else 0.0
        )


class Timer:
    """Tiny wall-clock timer for perf-info accounting."""

    def __init__(self):
        self.t0 = time.perf_counter()

    def lap(self) -> float:
        now = time.perf_counter()
        dt = now - self.t0
        self.t0 = now
        return dt
