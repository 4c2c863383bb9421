"""Qwen3TTS speaker encoder: ECAPA-TDNN-style embedding network used for
ref-audio voice cloning on "base" checkpoints.

Reference: Qwen3TTSSpeakerEncoder.swift (TimeDelayNetBlock with reflect pad
and NO batch norm, Res2Net hierarchical splits, squeeze-excitation,
multi-feature aggregation over the SE blocks' outputs, attentive statistics
pooling with global context, conv1x1 projection) and the mel frontend in
Qwen3TTS.swift:838-880 (whisper-style log-mel, n_fft 1024, hop 256,
128 mels at the encoder's sample rate).

TPU design: one jittable pure function over a param tree; weights stay in
torch layout ([O, I, K] convs) so no per-call transposes; the whole
embedding extraction is a single device call.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import dsp, nn
from tpu_audio.core.jitting import ajit

__all__ = ["SpeakerEncoderConfig", "speaker_encoder_forward", "speaker_mel",
           "sanitize_speaker_encoder", "SPEAKER_ENCODER_MARKER"]

SPEAKER_ENCODER_MARKER = "speaker_encoder"


@dataclass
class SpeakerEncoderConfig:
    """config.json ``speaker_encoder_config`` (Qwen3TTSConfig.swift:69-115)."""

    mel_dim: int = 128
    enc_dim: int = 1024
    enc_channels: tuple = (512, 512, 512, 512, 1536)
    enc_kernel_sizes: tuple = (5, 3, 3, 3, 1)
    enc_dilations: tuple = (1, 2, 3, 4, 1)
    enc_attention_channels: int = 128
    enc_res2net_scale: int = 8
    enc_se_channels: int = 128
    sample_rate: int = 24000

    @classmethod
    def from_dict(cls, d: dict) -> "SpeakerEncoderConfig":
        keys = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in d.items() if k in keys}
        for k in ("enc_channels", "enc_kernel_sizes", "enc_dilations"):
            if k in kw:
                kw[k] = tuple(kw[k])
        return cls(**kw)


def _reflect_pad_time(x, pad: int):
    """Reflect-pad along time of [B, T, C] (reflectPad1D, clamped to T-1)."""
    if pad <= 0:
        return x
    t = x.shape[1]
    if t <= 1:
        return x
    pad = min(pad, t - 1)
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")


def _tdnn(p, x, kernel: int, dilation: int = 1):
    """TimeDelayNetBlock: reflect pad -> conv -> relu (no norm)."""
    pad = (kernel - 1) * dilation // 2
    x = _reflect_pad_time(x, pad)
    return jax.nn.relu(nn.conv1d(p["conv"], x, dilation=dilation))


def _res2net(p, x, scale: int, kernel: int, dilation: int):
    """Res2NetBlock hierarchical splits (Qwen3TTSSpeakerEncoder.swift:46-96):
    chunk 0 passes through; chunk i>=2 adds the previous block output."""
    chunks = jnp.split(x, scale, axis=-1)
    outs = [chunks[0]]
    prev = None
    for i in range(1, scale):
        inp = chunks[i] if i == 1 else chunks[i] + prev
        prev = _tdnn(p["blocks"][str(i - 1)], inp, kernel, dilation)
        outs.append(prev)
    return jnp.concatenate(outs, axis=-1)


def _se_block(p, x):
    s = x.mean(axis=1, keepdims=True)
    s = jax.nn.relu(nn.conv1d(p["conv1"], s))
    s = jax.nn.sigmoid(nn.conv1d(p["conv2"], s))
    return x * s


def _se_res2net(p, x, cfg: SpeakerEncoderConfig, kernel: int, dilation: int):
    residual = x
    out = _tdnn(p["tdnn1"], x, 1)
    out = _res2net(p["res2net_block"], out, cfg.enc_res2net_scale, kernel,
                   dilation)
    out = _tdnn(p["tdnn2"], out, 1)
    out = _se_block(p["se_block"], out)
    return out + residual


def speaker_encoder_forward(p, mel, cfg: SpeakerEncoderConfig):
    """mel [B, T, mel_dim] -> speaker embedding [B, enc_dim]."""
    h = _tdnn(p["blocks"]["0"], mel, cfg.enc_kernel_sizes[0],
              cfg.enc_dilations[0])
    hiddens = []
    for i in range(1, len(cfg.enc_channels) - 1):
        h = _se_res2net(p["blocks"][str(i)], h, cfg, cfg.enc_kernel_sizes[i],
                        cfg.enc_dilations[i])
        hiddens.append(h)
    h = jnp.concatenate(hiddens, axis=-1) if len(hiddens) >= 2 else h
    h = _tdnn(p["mfa"], h, cfg.enc_kernel_sizes[-1], cfg.enc_dilations[-1])

    # attentive statistics pooling with global context
    eps = 1e-12
    mean = h.mean(axis=1, keepdims=True)
    std = jnp.sqrt(((h - mean) ** 2).mean(axis=1, keepdims=True) + eps)
    attn_in = jnp.concatenate(
        [h, jnp.broadcast_to(mean, h.shape), jnp.broadcast_to(std, h.shape)],
        axis=-1)
    a = jnp.tanh(_tdnn(p["asp"]["tdnn"], attn_in, 1))
    a = jax.nn.softmax(nn.conv1d(p["asp"]["conv"], a), axis=1)
    w_mean = (a * h).sum(axis=1, keepdims=True)
    w_std = jnp.sqrt(jnp.maximum(
        (a * (h - w_mean) ** 2).sum(axis=1, keepdims=True), eps))
    pooled = jnp.concatenate([w_mean, w_std], axis=-1)  # [B, 1, 2C]
    return nn.conv1d(p["fc"], pooled)[:, 0]


def speaker_mel(audio: np.ndarray, cfg: SpeakerEncoderConfig) -> jnp.ndarray:
    """Reference mel frontend (Qwen3TTS.swift:862-874): whisper-style
    normalized log-mel, n_fft 1024, hop 256, mel_dim mels. -> [1, T, mel]."""
    mel = dsp.log_mel_spectrogram(
        np.asarray(audio, np.float32).reshape(-1), n_mels=cfg.mel_dim,
        sample_rate=cfg.sample_rate, n_fft=1024, hop_length=256)
    return mel.T[None]  # [1, T, mel_dim]


def sanitize_speaker_encoder(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Extract ``...speaker_encoder.*`` keys from a talker checkpoint's flat
    weights, stripping the prefix (Qwen3TTSSpeakerEncoder.sanitize). Weights
    stay in torch conv layout [O, I, K]."""
    out = {}
    for key, v in flat.items():
        parts = key.split(".")
        if SPEAKER_ENCODER_MARKER not in parts:
            continue
        idx = parts.index(SPEAKER_ENCODER_MARKER)
        suffix = ".".join(parts[idx + 1 :])
        if suffix:
            out[suffix] = v
    return out


class Qwen3SpeakerEncoder:
    """Stateful wrapper: waveform -> speaker embedding [1, enc_dim]."""

    def __init__(self, config: SpeakerEncoderConfig, params,
                 dtype=jnp.float32):
        import functools

        self.config = config
        self.params = params
        self.dtype = dtype
        self._fwd = ajit(
            functools.partial(speaker_encoder_forward, cfg=config))

    def __call__(self, audio) -> jnp.ndarray:
        mel = speaker_mel(audio, self.config).astype(self.dtype)
        return self._fwd(self.params, mel)
