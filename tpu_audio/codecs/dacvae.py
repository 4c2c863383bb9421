"""DACVAE: continuous-latent DAC variant (48 kHz, VAE bottleneck).

TPU-first rebuild of the reference
(Sources/MLXAudioCodecs/DACVAE/*): a DAC-style snake SEANet whose
bottleneck is a VAE — the encoder output is 1x1-projected to
mean|logvar in codebook_dim space and ENCODE returns the mean
(DACVAE.swift:264-278); DECODE projects codebook_dim features back to
latent_dim and runs the decoder blocks' MAIN path (snake -> transposed
conv -> 3 snake residual units; DACVAEDecoder.swift:276-284) followed
by snake_out/conv_out/tanh. Convs use the "pad_mode none" scheme:
padding (k-stride)*dilation/2, transposed convs pad (stride+1)/2.

The audio watermarker riding the decoder (wm_model + the blocks'
ELU/causal side paths) is inference-optional in the reference (only
active when a message is passed) and is not implemented; its weights
are dropped at load.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.codecs import AudioCodecModel
from tpu_audio.codecs.snac import _fold_weight_norm
from tpu_audio.core import hub, loading, nn

__all__ = ["DACVAE", "DACVAEConfig"]


@dataclass
class DACVAEConfig:
    """DACVAEConfig.swift:31-86."""

    encoder_dim: int = 64
    encoder_rates: tuple = (2, 8, 10, 12)
    latent_dim: int = 1024
    decoder_dim: int = 1536
    decoder_rates: tuple = (12, 10, 8, 2)
    codebook_dim: int = 128
    sample_rate: int = 48000
    mean: float = 0.0
    std: float = 1.0

    @classmethod
    def from_dict(cls, d: dict) -> "DACVAEConfig":
        keys = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in d.items() if k in keys}
        for k in ("encoder_rates", "decoder_rates"):
            if k in kw:
                kw[k] = tuple(kw[k])
        return cls(**kw)

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.encoder_rates))


def _conv(p, x, kernel: int, stride: int = 1, dilation: int = 1):
    """pad_mode "none" conv: padding (k-stride)*dil/2
    (DACVAELayers.swift:81-158)."""
    pad = (kernel - stride) * dilation // 2
    return nn.conv1d(p, x, stride=stride, padding=pad, dilation=dilation)


def _convt(p, x, kernel: int, stride: int):
    """pad_mode "none" transposed conv: padding (stride+1)/2."""
    return nn.conv_transpose1d(p, x, stride=stride,
                               padding=(stride + 1) // 2)


def _res_unit(p, x, dilation: int, kernel: int = 7):
    """Snake residual unit with center-cropped skip
    (DACVAELayers.swift:291-381)."""
    y = nn.snake(x, p["act1"]["alpha"])
    y = _conv(p["conv1"], y, kernel, dilation=dilation)
    y = nn.snake(y, p["act2"]["alpha"])
    y = _conv(p["conv2"], y, 1)
    crop = (x.shape[1] - y.shape[1]) // 2
    if crop > 0:
        x = x[:, crop:x.shape[1] - crop]
    return x + y


def encode(params, audio, cfg: DACVAEConfig):
    """waveform [B, T, 1] -> latent mean [B, T/hop, codebook_dim]
    (DACVAE.swift:264-278; channels-last here)."""
    p = params["encoder"]
    h = _conv(p["conv_in"], audio, 7)
    for i, stride in enumerate(cfg.encoder_rates):
        bp = p["blocks"][str(i)]
        for j, dil in enumerate((1, 3, 9)):
            h = _res_unit(bp[f"res{j + 1}"], h, dil)
        h = nn.snake(h, bp["snake"]["alpha"])
        h = _conv(bp["conv"], h, 2 * stride, stride=stride)
    h = nn.snake(h, p["snake_out"]["alpha"])
    h = _conv(p["conv_out"], h, 3)
    proj = nn.conv1d(params["quantizer_in_proj"], h)
    mean, _ = jnp.split(proj, 2, axis=-1)
    return mean


def decode(params, features, cfg: DACVAEConfig):
    """features [B, T', codebook_dim] -> waveform [B, T, 1]
    (DACVAE.swift:287-310, main path only)."""
    p = params["decoder"]
    h = nn.conv1d(params["quantizer_out_proj"], features)
    h = _conv(p["conv_in"], h, 7)
    for i, stride in enumerate(cfg.decoder_rates):
        bp = p["blocks"][str(i)]
        h = nn.snake(h, bp["block_0"]["alpha"])
        h = _convt(bp["block_1"], h, 2 * stride, stride)
        h = _res_unit(bp["block_4"], h, 1)
        h = _res_unit(bp["block_5"], h, 3)
        h = _res_unit(bp["block_8"], h, 9)
    h = nn.snake(h, p["snake_out"]["alpha"])
    h = _conv(p["conv_out"], h, 7)
    return jnp.tanh(h)


def sanitize(weights):
    """Fold weight norm, drop the watermark subtrees, map MLX layouts
    ([O, K, I] / convT [O, K, I]) to torch."""
    flat = {}
    for k, v in weights.items():
        if k.startswith("wm_model.") or ".wm_model." in k:
            continue
        if any(f".block_{i}." in k for i in (2, 3, 6, 7, 10, 11)):
            continue  # watermark side paths
        flat[k] = v
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
        if k.endswith(".weight") and v.ndim == 3:
            # MLX [O, K, I] -> torch; transposed convs ("block_1") keep
            # output-major in MLX too, so -> [I, O, K]
            if ".block_1." in k:
                v = np.transpose(v, (2, 0, 1))
            else:
                v = np.transpose(v, (0, 2, 1))
        if k.endswith(".alpha"):
            v = v.reshape(-1)
        out[k] = v
    return out


class DACVAE(AudioCodecModel):
    def __init__(self, config: DACVAEConfig, params, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        self.sample_rate = config.sample_rate
        self._encode = jax.jit(functools.partial(encode, cfg=config))
        self._decode = jax.jit(functools.partial(decode, cfg=config))

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32
                        ) -> "DACVAE":
        model_dir = hub.resolve_or_download_model(repo_or_path)
        config = DACVAEConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        return cls(config, params, dtype)

    def encode(self, audio):
        """waveform -> latent means [B, T', codebook_dim] (normalized by
        config mean/std)."""
        x = np.asarray(audio, np.float32)
        if x.ndim == 1:
            x = x[None, :, None]
        elif x.ndim == 2:
            x = x[:, :, None]
        hop = self.config.hop_length
        pad = (-x.shape[1]) % hop
        if pad:
            x = np.pad(x, ((0, 0), (0, pad), (0, 0)))
        z = self._encode(self.params, jnp.asarray(x, self.dtype))
        return (z - self.config.mean) / self.config.std

    def decode(self, features):
        feats = jnp.asarray(features, self.dtype) * self.config.std \
            + self.config.mean
        if feats.ndim == 2:
            feats = feats[None]
        return self._decode(self.params, feats)

    def reconstruct(self, audio):
        audio = np.atleast_1d(np.asarray(audio))
        out = np.asarray(self.decode(self.encode(audio)))
        return out[:, : audio.shape[-1], 0]
