"""Vocos: ConvNeXt backbone + ISTFT-head vocoder.

TPU-first rebuild of the reference
(Sources/MLXAudioCodecs/Vocos/{Vocos,VocosBackbone}.swift): embedding conv +
LayerNorm + ConvNeXt stack (depthwise k7 conv, LN, pointwise GELU MLP, layer
scale) + final LN, and an ISTFT head projecting to magnitude/phase with
overlap-add synthesis normalized by the *window sum* (the mlx_audio dsp.istft
convention — SopranoDecoder.swift:129-207 — not window-squared).

``VocosBackbone``/``ISTFTHead`` are shared by Soprano's decoder and the
standalone Vocos vocoder (mel-features mode; Encodec features arrive with the
Encodec codec).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import dsp, hub, loading, nn

__all__ = ["vocos_backbone", "istft_head", "istft_window_norm", "Vocos"]


def convnext_block(p, x, dw_kernel: int = 7):
    """[B, T, C] ConvNeXt block (VocosBackbone.swift:18-101)."""
    res = x
    h = nn.conv1d(p["dwconv"], x, padding=dw_kernel // 2, groups=x.shape[-1])
    h = nn.layer_norm(p["norm"], h, eps=1e-6)
    h = nn.gelu(nn.linear(p["pwconv1"], h))
    h = nn.linear(p["pwconv2"], h)
    if "gamma" in p:
        h = p["gamma"].astype(h.dtype) * h
    return res + h


def vocos_backbone(p, x, num_layers: int, input_kernel: int = 7,
                   dw_kernel: int = 7):
    """features [B, T, C_in] -> hidden [B, T, D]."""
    h = nn.conv1d(p["embed"], x, padding=input_kernel // 2)
    h = nn.layer_norm(p["norm"], h, eps=1e-6)
    for i in range(num_layers):
        h = convnext_block(p["convnext"][str(i)], h, dw_kernel)
    return nn.layer_norm(p["final_layer_norm"], h, eps=1e-6)


def istft_window_norm(spec: jnp.ndarray, window, n_fft: int, hop: int):
    """ISTFT with window-SUM normalization and center trim
    (mlx_audio dsp.istft parity; SopranoDecoder.performISTFT)."""
    window = jnp.asarray(window, jnp.float32)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window[None]
    n_frames = frames.shape[0]
    out_len = n_fft + hop * (n_frames - 1)
    idx = (np.arange(n_frames)[:, None] * hop
           + np.arange(n_fft)[None, :]).reshape(-1)
    sig = jnp.zeros((out_len,), jnp.float32).at[idx].add(frames.reshape(-1))
    wsum = jnp.zeros((out_len,), jnp.float32).at[idx].add(
        jnp.tile(window, (n_frames,)))
    sig = jnp.where(wsum != 0, sig / wsum, sig)
    return sig[n_fft // 2 : out_len - n_fft // 2]


def istft_head(p, x, n_fft: int, hop: int):
    """hidden [B, T, D] -> waveform [B, samples] (ISTFTHead)."""
    h = nn.linear(p["out"], x)  # [B, T, n_fft+2]
    half = (n_fft + 2) // 2
    mag = jnp.clip(jnp.exp(h[..., :half]), None, 1e2)
    phase = h[..., half:]
    spec = (mag * jnp.cos(phase) + 1j * mag * jnp.sin(phase)).astype(jnp.complex64)
    window = dsp.hanning_window(n_fft, periodic=False)
    outs = [istft_window_norm(spec[b], window, n_fft, hop)
            for b in range(spec.shape[0])]
    return jnp.stack(outs, axis=0)


class Vocos:
    """Standalone vocoder: mel features [B, T, n_mels] -> waveform."""

    def __init__(self, config: dict, params, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        self.sample_rate = config.get("sampling_rate", 24000)
        self.n_fft = config.get("n_fft", 1024)
        self.hop = config.get("hop_length", 256)
        self.num_layers = config.get("num_layers", 8)

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32) -> "Vocos":
        model_dir = hub.resolve_or_download_model(repo_or_path)
        config = hub.load_config(model_dir)

        def sanitize(w):
            out = {}
            for k, v in w.items():
                # MLX conv layout [O,K,I] -> torch [O,I,K] for conv weights
                if (k.endswith(".weight") and v.ndim == 3
                        and ("dwconv" in k or "embed" in k)):
                    v = np.transpose(v, (0, 2, 1))
                out[k] = v
            return out

        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        return cls(config, params, dtype)

    def decode(self, features) -> jnp.ndarray:
        p = self.params.get("backbone", self.params)
        h = vocos_backbone(p, jnp.asarray(features, self.dtype),
                           self.num_layers)
        return istft_head(self.params["head"], h, self.n_fft, self.hop)
