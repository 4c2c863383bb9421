"""BigVGAN v2: anti-aliased snake-activation GAN vocoder (mel -> waveform).

TPU-first rebuild of the reference
(Sources/MLXAudioCodecs/BigVGAN/*): weight-normalized convs (folded to
plain weights at load), AMP residual blocks whose Snake/SnakeBeta
activations are anti-aliased by a kaiser-sinc 2x upsample -> activate ->
2x downsample sandwich (BigVGANLayers.swift:267-352), transposed-conv
upsampling stages, and a final activation + conv with tanh or clip.

All filters are precomputed host-side (numpy kaiser window / sinc); the
whole mel->waveform pass is one jitted channels-last graph — unlike the
reference, nothing is normalized per call and the per-channel filter
convs are grouped lax convs.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import hub, loading, nn
from tpu_audio.core.jitting import ajit

__all__ = ["BigVGAN", "BigVGANConfig", "kaiser_sinc_filter1d"]


@dataclass
class BigVGANConfig:
    """BigVGANConfig.swift:13-65."""

    num_mels: int = 80
    upsample_rates: tuple = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: tuple = (8, 8, 4, 4, 4, 4)
    upsample_initial_channel: int = 1536
    resblock: str = "1"
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    activation: str = "snakebeta"
    snake_logscale: bool = True
    use_bias_at_final: bool = True
    use_tanh_at_final: bool = True
    sampling_rate: int = 24000

    @classmethod
    def from_dict(cls, d: dict) -> "BigVGANConfig":
        keys = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in d.items() if k in keys}
        for k in ("upsample_rates", "upsample_kernel_sizes",
                  "resblock_kernel_sizes"):
            if k in kw:
                kw[k] = tuple(kw[k])
        if "resblock_dilation_sizes" in kw:
            kw["resblock_dilation_sizes"] = tuple(
                tuple(v) for v in kw["resblock_dilation_sizes"])
        if "resblock" in kw:
            kw["resblock"] = str(kw["resblock"])
        return cls(**kw)


# -- kaiser-sinc filters (host side) -------------------------------------------------


@functools.lru_cache(maxsize=32)
def kaiser_sinc_filter1d(cutoff: float, half_width: float,
                         kernel_size: int) -> np.ndarray:
    """Normalized lowpass FIR [kernel_size]
    (BigVGANLayers.swift:47-81)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4.0 * half_width
    a = 2.285 * max(half_size - 1, 0) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21.0) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(kernel_size) - half_size + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff <= 0:
        return np.zeros(kernel_size, np.float32)
    filt = 2.0 * cutoff * window * np.sinc(2.0 * cutoff * time)
    return (filt / max(filt.sum(), 1e-12)).astype(np.float32)


def _snake(x, alpha, beta, logscale: bool):
    """(Snake|SnakeBeta) on channels-last [B, T, C]
    (BigVGANLayers.swift:83-111)."""
    a = alpha.astype(jnp.float32)[None, None, :]
    b = (beta if beta is not None else alpha).astype(jnp.float32)[None, None, :]
    if logscale:
        a, b = jnp.exp(a), jnp.exp(b)
    xf = x.astype(jnp.float32)
    s = jnp.sin(xf * a)
    return (xf + s * s / (b + 1e-9)).astype(x.dtype)


def _upsample2x(x, ratio: int):
    """Anti-aliased upsample: edge pad, per-channel transposed kaiser-sinc
    conv, crop (BigVGANLayers.swift:267-304)."""
    k = 6 * ratio
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, k)
    pad = k // ratio - 1
    pad_left = pad * ratio + (k - ratio) // 2
    pad_right = pad * ratio + (k - ratio + 1) // 2
    c = x.shape[-1]
    h = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    w = jnp.broadcast_to(jnp.asarray(filt)[None, None, :], (c, 1, k))
    h = ratio * nn.conv_transpose1d({"weight": w}, h, stride=ratio, groups=c)
    end = h.shape[1] - pad_right
    return h[:, pad_left:end] if end > pad_left else h


def _downsample2x(x, ratio: int):
    """Anti-aliased downsample: edge pad + strided kaiser-sinc conv
    (BigVGANLayers.swift:227-264, 308-323)."""
    k = 6 * ratio
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, k)
    even = k % 2 == 0
    pad_left = k // 2 - (1 if even else 0)
    pad_right = k // 2
    c = x.shape[-1]
    h = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    w = jnp.broadcast_to(jnp.asarray(filt)[None, None, :], (c, 1, k))
    return nn.conv1d({"weight": w}, h, stride=ratio, groups=c)


def _activation1d(p, x, cfg: BigVGANConfig):
    """upsample 2x -> snake -> downsample 2x
    (BigVGANLayers.swift:326-352)."""
    h = _upsample2x(x, 2)
    h = _snake(h, p["act"]["alpha"], p["act"].get("beta"),
               cfg.snake_logscale)
    return _downsample2x(h, 2)


def _amp_block1(p, x, cfg: BigVGANConfig, kernel: int, dilations):
    """AMPBlock1 (BigVGAN.swift:5-55)."""
    out = x
    for i, dil in enumerate(dilations):
        h = _activation1d(p["activations"][str(2 * i)], out, cfg)
        h = nn.conv1d(p["convs1"][str(i)], h,
                      padding=((kernel - 1) * dil) // 2, dilation=dil)
        h = _activation1d(p["activations"][str(2 * i + 1)], h, cfg)
        h = nn.conv1d(p["convs2"][str(i)], h, padding=(kernel - 1) // 2)
        out = out + h
    return out


def _amp_block2(p, x, cfg: BigVGANConfig, kernel: int, dilations):
    """AMPBlock2 (BigVGAN.swift:57-90)."""
    out = x
    for i, dil in enumerate(dilations):
        h = _activation1d(p["activations"][str(i)], out, cfg)
        h = nn.conv1d(p["convs"][str(i)], h,
                      padding=((kernel - 1) * dil) // 2, dilation=dil)
        out = out + h
    return out


def forward(params, mel, cfg: BigVGANConfig):
    """mel [B, T, n_mels] (channels-last) -> waveform [B, samples]
    (BigVGAN.swift:169-188)."""
    n_kernels = len(cfg.resblock_kernel_sizes)
    h = nn.conv1d(params["conv_pre"], mel, padding=3)
    for step in range(len(cfg.upsample_rates)):
        k = cfg.upsample_kernel_sizes[step]
        s = cfg.upsample_rates[step]
        h = nn.conv_transpose1d(params["ups"][str(step)]["0"], h, stride=s,
                                padding=(k - s) // 2)
        acc = None
        for j in range(n_kernels):
            p = params["resblocks"][str(step * n_kernels + j)]
            kern = cfg.resblock_kernel_sizes[j]
            dil = cfg.resblock_dilation_sizes[j]
            blk = (_amp_block1 if cfg.resblock == "1" else _amp_block2)(
                p, h, cfg, kern, dil)
            acc = blk if acc is None else acc + blk
        h = acc / n_kernels
    h = _activation1d(params["activation_post"], h, cfg)
    h = nn.conv1d(params["conv_post"], h, padding=3)
    h = jnp.tanh(h) if cfg.use_tanh_at_final else jnp.clip(h, -1.0, 1.0)
    return h[..., 0]


def _fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=axes, keepdims=True))
    return (g.astype(np.float64) * v.astype(np.float64)
            / (norm + 1e-12)).astype(np.float32)


def sanitize(weights, num_mels: int | None = None):
    """Fold weight_g/weight_v (torch parametrizations names too), drop
    num_batches_tracked, and map MLX conv layouts back to torch
    (BigVGAN.swift:190-222 works in the opposite direction). Layout is
    detected ONCE from conv_pre, whose input dim is num_mels: torch
    stores it at axis 1, MLX at axis 2."""
    flat = {}
    for k, v in weights.items():
        k = k.replace(".parametrizations.weight.original0", ".weight_g")
        k = k.replace(".parametrizations.weight.original1", ".weight_v")
        if "num_batches_tracked" in k:
            continue
        flat[k] = v
    probe = flat.get("conv_pre.weight_v", flat.get("conv_pre.weight"))
    is_mlx = (probe is not None and num_mels is not None
              and probe.ndim == 3 and probe.shape[2] == num_mels
              and probe.shape[1] != num_mels)
    out = {}
    for k, v in flat.items():
        if k.endswith(".weight_g"):
            continue
        if k.endswith(".weight_v"):
            g = flat.get(k[:-len(".weight_v")] + ".weight_g")
            if g is None:
                continue
            k = k[:-len(".weight_v")] + ".weight"
            v = _fold_weight_norm(g, v)
        if is_mlx and k.endswith(".weight") and v.ndim == 3:
            # MLX layout [O, K, I] (kernel in the middle)
            if ".ups." in k:
                v = np.transpose(v, (2, 0, 1))  # -> torch convT [I, O, K]
            else:
                v = np.transpose(v, (0, 2, 1))  # -> torch conv [O, I, K]
        if k.endswith((".alpha", ".beta")):
            v = v.reshape(-1)
        out[k] = v
    return out


class BigVGAN:
    """Mel-spectrogram vocoder (nvidia/bigvgan_v2_* checkpoints)."""

    def __init__(self, config: BigVGANConfig, params, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        self.sample_rate = config.sampling_rate
        self._forward = ajit(functools.partial(forward, cfg=config))

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32
                        ) -> "BigVGAN":
        model_dir = hub.resolve_or_download_model(repo_or_path)
        config = BigVGANConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(
            model_dir,
            sanitize=functools.partial(sanitize, num_mels=config.num_mels),
            dtype=dtype)
        return cls(config, params, dtype)

    def decode(self, mel) -> jnp.ndarray:
        """mel [B, T, n_mels] or [B, n_mels, T] -> waveform [B, samples]."""
        mel = jnp.asarray(mel, self.dtype)
        if mel.ndim == 2:
            mel = mel[None]
        if mel.shape[-1] != self.config.num_mels:
            mel = mel.transpose(0, 2, 1)
        return self._forward(self.params, mel)

    __call__ = decode

    # codec-registry compatibility: BigVGAN is decode-only
    def encode(self, audio):
        raise NotImplementedError("BigVGAN is a vocoder (decode-only)")
