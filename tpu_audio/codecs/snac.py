"""SNAC: multi-scale neural audio codec (RVQ with per-codebook strides).

TPU-first rebuild of the reference SNAC runtime
(Sources/MLXAudioCodecs/SNAC/{SNACDecoder,Layers,VQ,Attention}.swift).
Architecture: SEANet-style conv encoder (snake activations, weight-normed
convs, optional depthwise + local windowed attention) -> residual VQ with
per-quantizer time strides [8,4,2,1] -> mirror decoder with transposed convs
and optional noise blocks. Used by Orpheus/LlamaTTS for 24 kHz speech
(LlamaTTS.swift:600).

TPU design choices: activations are channels-last [B, T, C] so 1x1 convs and
codebook matmuls ride the MXU; weight normalization (weight_g/weight_v) is
folded into dense weights at load time (inference-only — identical numerics,
half the reads); encode/decode are jitted per input-length bucket.
"""

from __future__ import annotations

import functools
import json
import math
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.codecs import AudioCodecModel
from tpu_audio.core import hub, loading, nn
from tpu_audio.core.jitting import ajit

__all__ = ["SNAC", "SNACConfig", "sanitize"]


@dataclass
class SNACConfig:
    sampling_rate: int = 24000
    encoder_dim: int = 64
    encoder_rates: tuple = (2, 4, 8, 8)
    latent_dim: int | None = None
    decoder_dim: int = 1024
    decoder_rates: tuple = (8, 8, 4, 2)
    attn_window_size: int | None = None
    codebook_size: int = 4096
    codebook_dim: int = 8
    vq_strides: tuple = (4, 2, 1)
    noise: bool = True
    depthwise: bool = True

    @property
    def computed_latent_dim(self) -> int:
        return self.latent_dim or self.encoder_dim * (2 ** len(self.encoder_rates))

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.encoder_rates))

    @classmethod
    def from_dict(cls, d: dict) -> "SNACConfig":
        keys = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in d.items() if k in keys}
        for k in ("encoder_rates", "decoder_rates", "vq_strides"):
            if k in kw:
                kw[k] = tuple(kw[k])
        return cls(**kw)


# ---------------------------------------------------------------------------
# Weight-norm folding + key normalization
# ---------------------------------------------------------------------------


def _fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """w = g * v / ||v|| with the norm over all dims except dim 0
    (reference Layers.swift:34-40 normalizeWeight)."""
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=axes, keepdims=True))
    return (g.astype(np.float64) * v.astype(np.float64) / (norm + 1e-12)).astype(
        np.float32
    )


def sanitize(weights: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Normalize checkpoint keys and fold weight norm.

    Handles both torch-saved SNAC checkpoints ("decoder.model.3.block.1.*",
    conv [O,I,K] / convT [I,O,K]) and MLX-converted ones
    (".layers.N." wrappers, conv [O,K,I] / convT [I,K,O]).
    """
    # strip Sequential ".layers." wrappers -> bare integer indices
    flat = {}
    for k, v in weights.items():
        flat[k.replace(".layers.", ".")] = v

    # torch parametrized weight-norm names -> weight_g/weight_v
    renamed = {}
    for k, v in flat.items():
        k = k.replace(".parametrizations.weight.original0", ".weight_g")
        k = k.replace(".parametrizations.weight.original1", ".weight_v")
        renamed[k] = v
    flat = renamed

    # detect layout via the first encoder conv (in_channels == 1)
    probe = None
    for k, v in flat.items():
        if k.endswith("encoder.block.0.weight_v") and v.ndim == 3:
            probe = v
            break
    is_mlx = probe is not None and probe.shape[2] == 1 and probe.shape[1] != 1

    out: dict[str, np.ndarray] = {}
    for k, v in flat.items():
        if k.endswith(".weight_v"):
            g = flat.get(k[: -len(".weight_v")] + ".weight_g")
            if g is None:
                continue
            w = _fold_weight_norm(g, v)
            if is_mlx and w.ndim == 3:
                # MLX layouts: conv [O,K,I]->[O,I,K]; convT [I,K,O]->[I,O,K]
                w = np.transpose(w, (0, 2, 1))
            out[k[: -len(".weight_v")] + ".weight"] = w
        elif k.endswith(".weight_g"):
            continue
        elif k.endswith(".alpha"):
            out[k] = v.reshape(-1)  # [1,C,1] -> [C]
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# Blocks (channels-last activations)
# ---------------------------------------------------------------------------


def _residual_unit(p, x, dilation: int, groups: int, kernel: int = 7):
    """Snake -> dilated conv -> snake -> 1x1 conv, residual add with center
    crop (reference Layers.swift ResidualUnit)."""
    y = nn.snake(x, p["block"]["0"]["alpha"])
    pad = ((kernel - 1) * dilation) // 2
    y = nn.conv1d(p["block"]["1"], y, padding=pad, dilation=dilation, groups=groups)
    y = nn.snake(y, p["block"]["2"]["alpha"])
    y = nn.conv1d(p["block"]["3"], y)
    crop = (x.shape[1] - y.shape[1]) // 2
    if crop > 0:
        x = x[:, crop:-crop]
    return x + y


def _local_mha(p, x, window_size: int, dim_head: int = 64):
    """Windowed MHA with rotary embeddings (reference Attention.swift:14-99).
    x: [B, T, C], T must be a multiple of window_size."""
    b, t, c = x.shape
    heads = c // dim_head
    residual = x
    h = nn.layer_norm(p["norm"], x)
    qkv = nn.linear(p["to_qkv"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    w = t // window_size

    def arrange(z):
        return z.reshape(b, w, window_size, heads, dim_head).transpose(0, 3, 1, 2, 4)

    q, k, v = arrange(q), arrange(k), arrange(v)
    # rotary within each window (SinusoidalEmbeddings, no xpos scaling)
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim_head, 2) / dim_head))
    tpos = np.arange(window_size)
    freqs = np.concatenate([tpos[:, None] * inv_freq[None, :]] * 2, axis=-1)
    cos = jnp.asarray(np.cos(freqs), x.dtype)
    sin = jnp.asarray(np.sin(freqs), x.dtype)

    def rotate_half(z):
        z1, z2 = jnp.split(z.reshape(*z.shape[:-1], 2, dim_head // 2), 2, axis=-2)
        return jnp.concatenate([-z2, z1], axis=-2).reshape(z.shape)

    q = q * cos + rotate_half(q) * sin
    k = k * cos + rotate_half(k) * sin

    scale = 1.0 / math.sqrt(dim_head)
    scores = jnp.einsum("bhwnd,bhwmd->bhwnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhwnm,bhwmd->bhwnd", probs, v)
    o = o.transpose(0, 2, 3, 1, 4).reshape(b, t, c)
    return nn.linear(p["to_out"], o) + residual


def _noise_block(p, x, rng):
    """x + N(0,1) * conv1x1(x) (reference Layers.swift NoiseBlock)."""
    b, t, _ = x.shape
    noise = jax.random.normal(rng, (b, t, 1), x.dtype)
    return x + noise * nn.conv1d(p["linear"], x)


def encoder_forward(params, x, cfg: SNACConfig):
    """x [B, T, 1] -> z [B, T/hop, latent]."""
    p = params["encoder"]["block"]
    idx = 0
    x = nn.conv1d(p[str(idx)], x, padding=3)
    idx += 1
    d = cfg.encoder_dim
    for stride in cfg.encoder_rates:
        d *= 2
        groups = d // 2 if cfg.depthwise else 1
        bp = p[str(idx)]["block"]
        x = _residual_unit({"block": bp["0"]["block"]}, x, 1, groups)
        x = _residual_unit({"block": bp["1"]["block"]}, x, 3, groups)
        x = _residual_unit({"block": bp["2"]["block"]}, x, 9, groups)
        x = nn.snake(x, bp["3"]["alpha"])
        x = nn.conv1d(bp["4"], x, stride=stride, padding=math.ceil(stride / 2))
        idx += 1
    if cfg.attn_window_size:
        x = _local_mha(p[str(idx)], x, cfg.attn_window_size)
        idx += 1
    groups = d if cfg.depthwise else 1
    x = nn.conv1d(p[str(idx)], x, padding=3, groups=groups)
    return x


def decoder_forward(params, z, cfg: SNACConfig, rng=None):
    """z [B, T, latent] -> waveform [B, T*hop, 1]."""
    p = params["decoder"]["model"]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    idx = 0
    if cfg.depthwise:
        z = nn.conv1d(p[str(idx)], z, padding=3, groups=cfg.computed_latent_dim)
        idx += 1
        z = nn.conv1d(p[str(idx)], z)
        idx += 1
    else:
        z = nn.conv1d(p[str(idx)], z, padding=3)
        idx += 1
    if cfg.attn_window_size:
        z = _local_mha(p[str(idx)], z, cfg.attn_window_size)
        idx += 1
    channels = cfg.decoder_dim
    x = z
    for i, stride in enumerate(cfg.decoder_rates):
        out_dim = channels // (2 ** (i + 1))
        groups = out_dim if cfg.depthwise else 1
        bp = p[str(idx)]["block"]
        j = 0
        x = nn.snake(x, bp[str(j)]["alpha"]); j += 1
        x = nn.conv_transpose1d(bp[str(j)], x, stride=stride,
                                padding=math.ceil(stride / 2),
                                output_padding=stride % 2); j += 1
        if cfg.noise:
            rng, sub = jax.random.split(rng)
            x = _noise_block(bp[str(j)], x, sub); j += 1
        for dil in (1, 3, 9):
            x = _residual_unit({"block": bp[str(j)]["block"]}, x, dil, groups); j += 1
        idx += 1
    x = nn.snake(x, p[str(idx)]["alpha"]); idx += 1
    x = nn.conv1d(p[str(idx)], x, padding=3)
    return jnp.tanh(x)


# ---------------------------------------------------------------------------
# Vector quantization
# ---------------------------------------------------------------------------


def _l2norm(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def vq_encode(params, z, cfg: SNACConfig):
    """z [B, T, latent] -> list of codes [B, T/stride] per quantizer
    (residual, with avg-pool striding; reference VQ.swift:60-140)."""
    residual = z
    codes = []
    for i, stride in enumerate(cfg.vq_strides):
        qp = params["quantizer"]["quantizers"][str(i)]
        r = residual
        if stride > 1:
            b, t, c = r.shape
            r = r.reshape(b, t // stride, stride, c).mean(axis=2)  # avg pool
        z_e = nn.conv1d(qp["in_proj"], r)  # 1x1 conv = linear
        enc = _l2norm(z_e)  # [B, T', D]
        cb = _l2norm(qp["codebook"]["weight"].astype(z_e.dtype))  # [N, D]
        dist = (
            (enc**2).sum(-1, keepdims=True)
            - 2 * enc @ cb.T
            + (cb**2).sum(-1)[None, None]
        )
        idx = jnp.argmin(dist, axis=-1)  # [B, T']
        codes.append(idx)
        z_q = qp["codebook"]["weight"][idx].astype(z_e.dtype)
        z_q = nn.conv1d(qp["out_proj"], z_q)
        if stride > 1:
            z_q = jnp.repeat(z_q, stride, axis=1)
        residual = residual - z_q
    return codes


def vq_from_codes(params, codes, cfg: SNACConfig):
    """codes list -> z_q [B, T, latent] (reference VQ.swift fromCodes)."""
    z_q = None
    for i, stride in enumerate(cfg.vq_strides):
        qp = params["quantizer"]["quantizers"][str(i)]
        emb = qp["codebook"]["weight"][codes[i]]  # [B, T', D]
        z = nn.conv1d(qp["out_proj"], emb.astype(qp["out_proj"]["weight"].dtype))
        if stride > 1:
            z = jnp.repeat(z, stride, axis=1)
        z_q = z if z_q is None else z_q + z
    return z_q


# ---------------------------------------------------------------------------
# Public model
# ---------------------------------------------------------------------------


class SNAC(AudioCodecModel):
    def __init__(self, config: SNACConfig, params, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.sample_rate = config.sampling_rate
        self.dtype = dtype
        cfg = config
        self._encode_fn = ajit(
            lambda p, x: vq_encode(p, encoder_forward(p, x, cfg), cfg)
        )
        self._decode_fn = ajit(
            lambda p, codes, rng: decoder_forward(
                p, vq_from_codes(p, codes, cfg), cfg, rng
            )
        )

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32) -> "SNAC":
        model_dir = hub.resolve_or_download_model(repo_or_path)
        config = SNACConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        return cls(config, params, dtype)

    # -- padding (reference SNACDecoder.swift preprocess) --------------------

    def _pad_to(self) -> int:
        lcm = functools.reduce(math.lcm, self.config.vq_strides)
        if self.config.attn_window_size:
            lcm = math.lcm(lcm, self.config.attn_window_size)
        return self.config.hop_length * lcm

    def preprocess(self, audio: np.ndarray) -> np.ndarray:
        audio = np.asarray(audio, np.float32)
        if audio.ndim == 1:
            audio = audio[None]
        length = audio.shape[-1]
        pad_to = self._pad_to()
        right = math.ceil(length / pad_to) * pad_to - length
        return np.pad(audio, ((0, 0), (0, right)))

    # -- protocol -------------------------------------------------------------

    def encode(self, audio) -> list[jnp.ndarray]:
        x = self.preprocess(audio)[..., None].astype(self.dtype)  # [B, T, 1]
        return self._encode_fn(self.params, jnp.asarray(x))

    def decode(self, codes, seed: int = 0) -> jnp.ndarray:
        codes = [jnp.asarray(c) for c in codes]
        rng = jax.random.PRNGKey(seed)
        wav = self._decode_fn(self.params, codes, rng)
        return wav[..., 0]  # [B, T]

    def reconstruct(self, audio) -> np.ndarray:
        length = np.asarray(audio).shape[-1]
        wav = self.decode(self.encode(audio))
        return np.asarray(wav)[..., :length]
