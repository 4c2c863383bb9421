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

__all__ = ["vocos_backbone", "istft_head", "istft_window_norm", "Vocos",
           "ada_layer_norm", "EncodecFeatures"]


def ada_layer_norm(p, x, cond):
    """Adaptive LayerNorm conditioned on a one-hot bandwidth embedding
    (Vocos.swift:17-47): parameterless LN then per-condition scale/shift."""
    scale = nn.linear(p["scale"], cond)
    shift = nn.linear(p["shift"], cond)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    h = (x - mean) * jax.lax.rsqrt(var + 1e-6)
    return h * scale[:, None, :] + shift[:, None, :]


def _norm(p, x, cond):
    if cond is not None:
        return ada_layer_norm(p, x, cond)
    return nn.layer_norm(p, x, eps=1e-6)


def convnext_block(p, x, dw_kernel: int = 7, cond=None):
    """[B, T, C] ConvNeXt block (VocosBackbone.swift:18-101)."""
    res = x
    h = nn.conv1d(p["dwconv"], x, padding=dw_kernel // 2, groups=x.shape[-1])
    h = _norm(p["norm"], h, cond)
    h = nn.gelu(nn.linear(p["pwconv1"], h))
    h = nn.linear(p["pwconv2"], h)
    if "gamma" in p:
        h = p["gamma"].astype(h.dtype) * h
    return res + h


def vocos_backbone(p, x, num_layers: int, input_kernel: int = 7,
                   dw_kernel: int = 7, cond=None):
    """features [B, T, C_in] -> hidden [B, T, D]. ``cond`` is a one-hot
    bandwidth embedding enabling AdaLayerNorm (VocosBackbone.swift:166)."""
    h = nn.conv1d(p["embed"], x, padding=input_kernel // 2)
    h = _norm(p["norm"], h, cond)
    for i in range(num_layers):
        h = convnext_block(p["convnext"][str(i)], h, dw_kernel, cond)
    return nn.layer_norm(p["final_layer_norm"], h, eps=1e-6)


def istft_window_norm(spec: jnp.ndarray, window, n_fft: int, hop: int):
    """ISTFT with window-SUM normalization and center trim
    (mlx_audio dsp.istft parity; SopranoDecoder.performISTFT)."""
    window = jnp.asarray(window, jnp.float32)
    from tpu_audio.core.dsp import irfft
    frames = irfft(spec, n=n_fft, axis=-1) * window[None]
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
    # lax.complex, not `re + 1j*im`: a python complex scalar device_puts
    # a complex constant, which the axon TPU backend cannot transfer
    spec = jax.lax.complex(mag * jnp.cos(phase), mag * jnp.sin(phase))
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

    def decode(self, features, bandwidth_id: int | None = None) -> jnp.ndarray:
        p = self.params.get("backbone", self.params)
        features = jnp.asarray(features, self.dtype)
        cond = None
        n_emb = self.config.get("adanorm_num_embeddings")
        if bandwidth_id is not None and n_emb:
            cond = jax.nn.one_hot(jnp.asarray([bandwidth_id]), n_emb,
                                  dtype=features.dtype)
            cond = jnp.broadcast_to(cond, (features.shape[0], n_emb))
        h = vocos_backbone(p, features, self.num_layers, cond=cond)
        return istft_head(self.params["head"], h, self.n_fft, self.hop)


class EncodecFeatures:
    """Vocos feature extractor over EnCodec codes (Vocos.swift:188-277):
    per-codebook embeddings are offset-indexed into one concatenated
    ``codebook_weights`` table and summed across codebooks."""

    def __init__(self, encodec, codebook_weights,
                 bandwidths=(1.5, 3.0, 6.0, 12.0)):
        self.encodec = encodec
        self.codebook_weights = jnp.asarray(codebook_weights)
        self.bandwidths = tuple(bandwidths)

    @classmethod
    def from_encodec(cls, encodec, bandwidths=(1.5, 3.0, 6.0, 12.0)
                     ) -> "EncodecFeatures":
        n_q = encodec.n_quantizers_for_bandwidth(max(bandwidths))
        layers = encodec.params["quantizer"]["layers"]
        weights = jnp.concatenate(
            [layers[str(i)]["codebook"]["embed"] for i in range(n_q)], axis=0)
        return cls(encodec, weights, bandwidths)

    def get_encodec_codes(self, audio, bandwidth_id: int):
        codes, _ = self.encodec.encode(audio,
                                       bandwidth=self.bandwidths[bandwidth_id])
        # [chunks, B, n_q, T] -> [n_q, 1, T] (Vocos.swift:245-247)
        return codes.reshape(codes.shape[2], 1, codes.shape[3])

    def get_features_from_codes(self, codes):
        size = self.encodec.config.codebook_size
        n_q = codes.shape[0]
        offsets = (jnp.arange(n_q) * size).reshape(n_q, 1, 1)
        emb = self.codebook_weights[codes + offsets]
        return jnp.sum(emb, axis=0)

    def __call__(self, audio, bandwidth_id: int):
        return self.get_features_from_codes(
            self.get_encodec_codes(audio, bandwidth_id))
