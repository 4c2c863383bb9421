"""Silero VAD: STFT-conv + LSTM speech-probability model.

TPU-first rebuild of the reference
(Sources/MLXAudioVAD/Models/SileroVAD/SileroVAD.swift): two branches
(16 kHz / 8 kHz), 512/256-sample chunks with 64-sample context carry,
streaming ``feed`` API and offline ``predict_proba`` / speech timestamps.

TPU delta: the reference loops chunks in Python with a lazy-eval cadence
(SileroVAD.swift:218-231); here the offline path is ONE jitted ``lax.scan``
over all chunks — the conv frontend batches over the scan and the LSTM state
is the carry, so an hour of audio is a single device dispatch.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import hub, loading, nn
from tpu_audio.core.jitting import ajit

__all__ = ["SileroVAD", "SileroVADConfig", "SileroTimestamp"]


@dataclass
class SileroBranchConfig:
    sample_rate: int = 16000
    filter_length: int = 256
    hop_length: int = 128
    pad: int = 64
    cutoff: int = 129
    context_size: int = 64
    chunk_size: int = 512


@dataclass
class SileroVADConfig:
    threshold: float = 0.5
    min_speech_duration_ms: int = 250
    min_silence_duration_ms: int = 100
    speech_pad_ms: int = 30
    branch16k: SileroBranchConfig = field(default_factory=SileroBranchConfig)
    branch8k: SileroBranchConfig = field(
        default_factory=lambda: SileroBranchConfig(
            sample_rate=8000, filter_length=128, hop_length=64, pad=32,
            cutoff=65, context_size=32, chunk_size=256,
        )
    )

    @classmethod
    def from_dict(cls, d: dict) -> "SileroVADConfig":
        cfg = cls()
        for k in ("threshold",):
            if k in d:
                cfg.threshold = d[k]
        for k_src, k_dst in (("min_speech_duration_ms", "min_speech_duration_ms"),
                             ("min_silence_duration_ms", "min_silence_duration_ms"),
                             ("speech_pad_ms", "speech_pad_ms")):
            if k_src in d:
                setattr(cfg, k_dst, d[k_src])
        return cfg


@dataclass
class SileroTimestamp:
    start: int
    end: int


def sanitize(weights: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """vad_16k/vad_8k prefixes -> branch16k/branch8k; MLX conv layout
    [O,K,I] -> torch [O,I,K]; MLX LSTM Wx/Wh/bias -> torch names
    (reference SileroVAD.sanitize, SileroVAD.swift:341-355)."""
    out = {}
    for k, v in weights.items():
        if k.startswith("val_"):
            continue
        k = k.replace("vad_16k.", "branch16k.").replace("vad_8k.", "branch8k.")
        if k.endswith(".weight") and v.ndim == 3 and "conv" in k:
            v = np.transpose(v, (0, 2, 1))
        k = k.replace("lstm.Wx", "lstm.weight_ih").replace(
            "lstm.Wh", "lstm.weight_hh").replace("lstm.bias", "lstm.bias_ih")
        out[k] = v
    return out


def _branch_window_forward(p, window, h, c, cfg: SileroBranchConfig):
    """One chunk window [B, ctx+chunk] -> (prob [B], new h, c)."""
    b = window.shape[0]
    # reflect pad right (SileroVAD.swift:51-57)
    n = window.shape[-1]
    reflected = window[:, n - 2 : n - cfg.pad - 2 : -1]
    x = jnp.concatenate([window, reflected], axis=-1)[..., None]  # [B, T, 1]
    x = nn.conv1d(p["stft_conv"], x, stride=cfg.hop_length)  # [B, F, 2*cutoff]
    real, imag = x[..., : cfg.cutoff], x[..., cfg.cutoff : 2 * cfg.cutoff]
    x = jnp.sqrt(real * real + imag * imag)
    x = jax.nn.relu(nn.conv1d(p["conv1"], x, padding=1))
    x = jax.nn.relu(nn.conv1d(p["conv2"], x, stride=2, padding=1))
    x = jax.nn.relu(nn.conv1d(p["conv3"], x, stride=2, padding=1))
    x = jax.nn.relu(nn.conv1d(p["conv4"], x, padding=1))
    hs, (h, c) = nn.lstm(p["lstm"], x, h, c)
    out = jax.nn.sigmoid(nn.conv1d(p["final_conv"], jax.nn.relu(hs)))
    return out[..., 0].mean(axis=1), h, c


@functools.partial(ajit, static_argnames=("cfg_key",))
def _scan_chunks(params, windows, cfg_key):
    """windows [N, B, ctx+chunk] -> probs [B, N] in one scan."""
    cfg = _BRANCH_CFGS[cfg_key]
    b = windows.shape[1]
    h0 = jnp.zeros((b, 128), windows.dtype)
    c0 = jnp.zeros((b, 128), windows.dtype)

    def step(carry, window):
        h, c = carry
        prob, h, c = _branch_window_forward(params, window, h, c, cfg)
        return (h, c), prob

    _, probs = jax.lax.scan(step, (h0, c0), windows)
    return probs.T  # [B, N]


_BRANCH_CFGS = {
    16000: SileroBranchConfig(),
    8000: SileroBranchConfig(sample_rate=8000, filter_length=128, hop_length=64,
                             pad=32, cutoff=65, context_size=32, chunk_size=256),
}


class SileroVAD:
    def __init__(self, config: SileroVADConfig, params):
        self.config = config
        self.params = params
        self._feed = ajit(
            lambda p, w, h, c, sr: None)  # placeholder (built per rate below)
        self._feed_fns = {}

    @classmethod
    def from_pretrained(cls, repo_or_path: str) -> "SileroVAD":
        model_dir = hub.resolve_or_download_model(repo_or_path)
        config = SileroVADConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize)
        return cls(config, params)

    def _branch(self, sample_rate: int):
        if sample_rate == 16000:
            return self.params["branch16k"], _BRANCH_CFGS[16000]
        if sample_rate == 8000:
            return self.params["branch8k"], _BRANCH_CFGS[8000]
        raise ValueError(f"Silero VAD supports 8000/16000 Hz (got {sample_rate})")

    # -- offline ---------------------------------------------------------------

    def predict_proba(self, audio: np.ndarray, sample_rate: int = 16000
                      ) -> np.ndarray:
        """Per-chunk speech probabilities [N] (or [B, N] for batched input),
        one probability per 512/256 samples."""
        p, cfg = self._branch(sample_rate)
        a = np.asarray(audio, np.float32)
        squeeze = a.ndim == 1
        if squeeze:
            a = a[None]
        if a.shape[-1] == 0:
            return np.zeros((0,) if squeeze else (a.shape[0], 0), np.float32)
        cs, ctx = cfg.chunk_size, cfg.context_size
        pad = (cs - a.shape[-1] % cs) % cs
        a = np.pad(a, ((0, 0), (ctx, pad)))
        n_chunks = (a.shape[-1] - ctx) // cs
        # windows [N, B, ctx+cs]
        idx = (np.arange(n_chunks)[:, None] * cs
               + np.arange(ctx + cs)[None, :])
        windows = a[:, idx].transpose(1, 0, 2)
        probs = np.asarray(_scan_chunks(p, jnp.asarray(windows), sample_rate))
        return probs[0] if squeeze else probs

    def get_speech_timestamps(
        self, audio: np.ndarray, sample_rate: int = 16000,
        threshold: float | None = None,
        min_speech_duration_ms: int | None = None,
        min_silence_duration_ms: int | None = None,
        speech_pad_ms: int | None = None,
    ) -> list[SileroTimestamp]:
        probs = self.predict_proba(audio, sample_rate)
        audio_len = np.asarray(audio).shape[-1]
        return probs_to_timestamps(
            probs, audio_len, sample_rate,
            threshold if threshold is not None else self.config.threshold,
            min_speech_duration_ms or self.config.min_speech_duration_ms,
            min_silence_duration_ms or self.config.min_silence_duration_ms,
            speech_pad_ms if speech_pad_ms is not None else self.config.speech_pad_ms,
        )

    # -- streaming ---------------------------------------------------------------

    def initial_state(self, batch: int = 1, sample_rate: int = 16000):
        _, cfg = self._branch(sample_rate)
        return {
            "h": jnp.zeros((batch, 128), jnp.float32),
            "c": jnp.zeros((batch, 128), jnp.float32),
            "context": jnp.zeros((batch, cfg.context_size), jnp.float32),
            "sample_rate": sample_rate,
        }

    def feed(self, chunk: np.ndarray, state=None, sample_rate: int = 16000):
        """One 512/256-sample chunk -> (prob [B], new state)
        (reference feed, SileroVAD.swift:172-193)."""
        p, cfg = self._branch(sample_rate)
        c = np.asarray(chunk, np.float32)
        if c.ndim == 1:
            c = c[None]
        if c.shape[-1] != cfg.chunk_size:
            raise ValueError(
                f"expected {cfg.chunk_size} samples per chunk, got {c.shape[-1]}")
        if state is None:
            state = self.initial_state(c.shape[0], sample_rate)
        if state["sample_rate"] != sample_rate:
            raise ValueError("streaming state sample-rate mismatch")
        if sample_rate not in self._feed_fns:
            cfg_key = sample_rate

            @ajit
            def feed_fn(p, window, h, c_):
                return _branch_window_forward(p, window, h, c_,
                                              _BRANCH_CFGS[cfg_key])

            self._feed_fns[sample_rate] = feed_fn
        window = jnp.concatenate([state["context"], jnp.asarray(c)], axis=-1)
        prob, h, c_ = self._feed_fns[sample_rate](p, window, state["h"], state["c"])
        new_state = {
            "h": h, "c": c_,
            "context": jnp.asarray(c[:, -cfg.context_size:]),
            "sample_rate": sample_rate,
        }
        return np.asarray(prob), new_state


def probs_to_timestamps(probs, audio_len: int, sample_rate: int,
                        threshold: float, min_speech_duration_ms: int,
                        min_silence_duration_ms: int, speech_pad_ms: int
                        ) -> list[SileroTimestamp]:
    """Hysteresis thresholding of chunk probabilities into speech runs
    (reference probsToTimestamps, SileroVAD.swift:266-339)."""
    probs = np.asarray(probs)
    if probs.ndim == 2:
        probs = probs[0]
    chunk = 512 if sample_rate == 16000 else 256
    min_speech = sample_rate * min_speech_duration_ms / 1000
    min_silence = sample_rate * min_silence_duration_ms / 1000
    pad = int(sample_rate * speech_pad_ms / 1000)
    neg_threshold = max(threshold - 0.15, 0.01)

    speeches: list[list[int]] = []
    triggered = False
    current_start = temp_end = 0
    for i, p in enumerate(probs):
        start = i * chunk
        if p >= threshold and not triggered:
            triggered, current_start, temp_end = True, start, 0
            continue
        if triggered and p >= threshold:
            temp_end = 0
            continue
        if triggered and p < neg_threshold:
            if temp_end == 0:
                temp_end = start
            if start - temp_end >= min_silence:
                if temp_end - current_start >= min_speech:
                    speeches.append([current_start, temp_end])
                triggered, temp_end = False, 0
    if triggered:
        end = min(audio_len, len(probs) * chunk)
        if end - current_start >= min_speech:
            speeches.append([current_start, end])

    padded: list[list[int]] = []
    for s, e in speeches:
        s, e = max(0, s - pad), min(audio_len, e + pad)
        if padded and s <= padded[-1][1]:
            padded[-1][1] = max(padded[-1][1], e)
        else:
            padded.append([s, e])
    return [SileroTimestamp(s, e) for s, e in padded]
