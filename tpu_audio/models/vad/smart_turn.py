"""SmartTurn: end-of-turn detection (speech endpointing) model.

TPU-first rebuild of the reference
(Sources/MLXAudioVAD/Models/SmartTurn/SmartTurn.swift): a small
Whisper-style pre-LN transformer encoder over 8 s of Whisper-normalized
log-mel features, followed by tanh attention pooling
(SmartTurn.swift:185-189) and an MLP classifier (Linear-LN-GELU-Linear-
GELU-Linear) with a sigmoid "turn is complete" probability.

Preprocessing (SmartTurnFeatures.swift:10-46): resample to 16 kHz, keep
the LAST ``max_audio_seconds`` seconds (left-pad with zeros when
shorter), mean/std normalize, Whisper log-mel (slaney scale + norm,
max-8 clamp, (x+4)/4), then pad/trim frames on the left to exactly
``max_audio_seconds*sr/hop`` frames. The whole forward (features ->
probability) is one jitted static-shape graph — the fixed 8 s window
means a single compile serves every call.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import dsp, hub, loading, nn
from tpu_audio.core.audio_io import resample_audio
from tpu_audio.core.jitting import ajit

__all__ = ["SmartTurn", "SmartTurnConfig", "SmartTurnEndpointOutput"]


@dataclass
class SmartTurnConfig:
    """SmartTurnConfig.swift:3-140 (encoder + processor, flattened)."""

    num_mel_bins: int = 80
    max_source_positions: int = 400
    d_model: int = 384
    encoder_attention_heads: int = 6
    encoder_layers: int = 4
    encoder_ffn_dim: int = 1536
    k_proj_bias: bool = False
    sampling_rate: int = 16000
    max_audio_seconds: int = 8
    n_fft: int = 400
    hop_length: int = 160
    n_mels: int = 80
    normalize_audio: bool = True
    threshold: float = 0.5

    @classmethod
    def from_dict(cls, d: dict) -> "SmartTurnConfig":
        merged = dict(d.get("encoder_config", {}))
        merged.update(d.get("processor_config", {}))
        for k in ("sample_rate", "max_audio_seconds", "threshold"):
            if k in d:
                merged["sampling_rate" if k == "sample_rate" else k] = d[k]
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in merged.items() if k in keys})


@dataclass
class SmartTurnEndpointOutput:
    prediction: int
    probability: float


def _encoder_layer(p, x, n_heads: int):
    """Pre-LN whisper encoder layer (SmartTurn.swift:71-98)."""
    h = nn.layer_norm(p["self_attn_layer_norm"], x)
    a = p["self_attn"]
    q = nn.linear(a["q_proj"], h)
    k = nn.linear(a["k_proj"], h)
    v = nn.linear(a["v_proj"], h)
    b, t, d = q.shape
    hd = d // n_heads
    q = q.reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
    o = nn.sdpa(q, k, v).transpose(0, 2, 1, 3).reshape(b, t, d)
    x = x + nn.linear(a["out_proj"], o)
    h = nn.layer_norm(p["final_layer_norm"], x)
    return x + nn.linear(p["fc2"], nn.gelu(nn.linear(p["fc1"], h)))


def forward(params, features, cfg: SmartTurnConfig):
    """features [B, n_mels, T] (HF layout) -> probability [B, 1]
    (SmartTurn.swift:135-205)."""
    e = params["encoder"]
    x = features.transpose(0, 2, 1)
    x = nn.gelu(nn.conv1d(e["conv1"], x, padding=1))
    x = nn.gelu(nn.conv1d(e["conv2"], x, stride=2, padding=1))
    x = x + e["embed_positions"]["weight"][None, : x.shape[1]].astype(x.dtype)
    for i in range(cfg.encoder_layers):
        x = _encoder_layer(e["layers"][str(i)], x, cfg.encoder_attention_heads)
    hidden = nn.layer_norm(e["layer_norm"], x)
    # tanh attention pooling (SmartTurn.swift:185-189)
    attn = nn.linear(params["pool_attention_2"],
                     jnp.tanh(nn.linear(params["pool_attention_0"], hidden)))
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=1)
    pooled = jnp.sum(hidden.astype(jnp.float32) * attn, axis=1)
    h = nn.layer_norm(params["classifier_1"],
                      nn.linear(params["classifier_0"], pooled))
    h = nn.gelu(nn.linear(params["classifier_4"], nn.gelu(h)))
    logits = nn.linear(params["classifier_6"], h)
    return jax.nn.sigmoid(logits)


def sanitize(weights):
    """SmartTurn.swift:274-325: strip inner., dot->underscore submodule
    names, fix conv/linear layout heuristics, drop val_* buffers."""
    out = {}
    for k, v in weights.items():
        if k.startswith("val_"):
            continue
        if k.startswith("inner."):
            k = k[len("inner."):]
        for a, b in (("pool_attention.0.", "pool_attention_0."),
                     ("pool_attention.2.", "pool_attention_2."),
                     ("classifier.0.", "classifier_0."),
                     ("classifier.1.", "classifier_1."),
                     ("classifier.4.", "classifier_4."),
                     ("classifier.6.", "classifier_6.")):
            if k.startswith(a):
                k = b + k[len(a):]
        if k in ("encoder.conv1.weight", "encoder.conv2.weight") and v.ndim == 3:
            # MLX [O, K, I] -> torch [O, I, K]
            if v.shape[1] == 3:
                v = np.transpose(v, (0, 2, 1))
        if k.endswith("fc1.weight") and v.ndim == 2 and v.shape[0] < v.shape[1]:
            v = np.transpose(v)
        if k.endswith("fc2.weight") and v.ndim == 2 and v.shape[0] > v.shape[1]:
            v = np.transpose(v)
        if k == "pool_attention_0.weight" and v.ndim == 2 and v.shape[0] != 256:
            v = np.transpose(v)
        if k == "pool_attention_2.weight" and v.ndim == 2 and v.shape[0] != 1:
            v = np.transpose(v)
        out[k] = v
    return out


class SmartTurn:
    def __init__(self, config: SmartTurnConfig, params, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        self.sample_rate = config.sampling_rate
        self._forward = ajit(functools.partial(forward, cfg=config))

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32) -> "SmartTurn":
        model_dir = hub.resolve_or_download_model(repo_or_path)
        config = SmartTurnConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        return cls(config, params, dtype)

    # -- preprocessing (SmartTurnFeatures.swift) ----------------------------------

    def prepare_audio(self, audio: np.ndarray, sample_rate: int | None = None
                      ) -> np.ndarray:
        cfg = self.config
        audio = np.asarray(audio, np.float32).reshape(-1)
        src = sample_rate or cfg.sampling_rate
        if src != cfg.sampling_rate:
            audio = resample_audio(audio, src, cfg.sampling_rate)
        max_samples = cfg.max_audio_seconds * cfg.sampling_rate
        if len(audio) > max_samples:
            audio = audio[-max_samples:]
        elif len(audio) < max_samples:
            audio = np.concatenate(
                [np.zeros(max_samples - len(audio), np.float32), audio])
        if cfg.normalize_audio and len(audio):
            std = max(float(audio.std()), 1e-7)
            audio = (audio - audio.mean()) / std
        return audio

    def prepare_input_features(self, audio: np.ndarray,
                               sample_rate: int | None = None) -> np.ndarray:
        """audio -> [n_mels, target_frames] (SmartTurn.swift:212-247)."""
        cfg = self.config
        prepared = self.prepare_audio(audio, sample_rate)
        mel = np.asarray(dsp.log_mel_spectrogram(
            prepared, n_mels=cfg.n_mels, n_fft=cfg.n_fft,
            hop_length=cfg.hop_length, sample_rate=cfg.sampling_rate)).T
        target = cfg.max_audio_seconds * cfg.sampling_rate // cfg.hop_length
        if mel.shape[0] > target:
            mel = mel[-target:]
        elif mel.shape[0] < target:
            mel = np.pad(mel, ((target - mel.shape[0], 0), (0, 0)))
        return mel.T.astype(np.float32)

    # -- inference ----------------------------------------------------------------

    def __call__(self, features) -> jnp.ndarray:
        features = jnp.asarray(features, self.dtype)
        if features.ndim == 2:
            features = features[None]
        return self._forward(self.params, features)

    def predict_endpoint(self, audio: np.ndarray,
                         sample_rate: int | None = None,
                         threshold: float | None = None
                         ) -> SmartTurnEndpointOutput:
        features = self.prepare_input_features(audio, sample_rate)
        prob = float(self(features)[0, 0])
        thr = threshold if threshold is not None else self.config.threshold
        return SmartTurnEndpointOutput(prediction=int(prob > thr),
                                       probability=prob)
