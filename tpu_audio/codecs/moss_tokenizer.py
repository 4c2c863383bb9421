"""MOSS audio tokenizer: patched transformer codec with residual LFQ.

TPU-first rebuild of the reference
(Sources/MLXAudioCodecs/MossAudioTokenizer/MossAudioTokenizer.swift):
a config-driven stack of stages — "PatchedPretransform" (time-patching
reshapes that trade sequence length for channels) and "Transformer"
(projected causal transformers with context-limited attention, exact
GELU FFNs, optional layer scale and sin/rope positions) — around a
residual LFQ quantizer whose per-level lookup L2-normalizes latents and
codebooks (MossAudioTokenizer.swift:565-685). Weight-normalized 1x1
projections are folded at load.

Everything runs channels-last; encode and decode are each one jitted
call per shape bucket.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.codecs.snac import _fold_weight_norm
from tpu_audio.core import hub, loading, nn
from tpu_audio.core.jitting import ajit

__all__ = ["MossAudioTokenizer", "MossTokenizerConfig"]


@dataclass
class MossTokenizerConfig:
    """MossAudioTokenizer.swift:28-95."""

    sample_rate: int = 48000
    sampling_rate: int = 48000
    downsample_rate: int = 3840
    causal_transformer_context_duration: float = 10.0
    number_channels: int = 1
    enable_channel_interleave: bool = True
    encoder_kwargs: list = field(default_factory=list)
    decoder_kwargs: list = field(default_factory=list)
    quantizer_kwargs: dict = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "MossTokenizerConfig":
        return cls(
            sample_rate=d.get("sample_rate", d.get("sampling_rate", 48000)),
            sampling_rate=d.get("sampling_rate", d.get("sample_rate", 48000)),
            downsample_rate=d.get("downsample_rate", 3840),
            causal_transformer_context_duration=d.get(
                "causal_transformer_context_duration", 10.0),
            number_channels=d.get("number_channels", 1),
            enable_channel_interleave=d.get("enable_channel_interleave",
                                            True),
            encoder_kwargs=d.get("encoder_kwargs", []),
            decoder_kwargs=d.get("decoder_kwargs", []),
            quantizer_kwargs=d.get("quantizer_kwargs", {}))


def _patch(x, p: int, down: bool):
    """Time patching [B, T, C] <-> [B, T/p, C*p] (channel-major order,
    MossAudioTokenizer.swift:537-563)."""
    b, t, c = x.shape
    if down:
        return x.reshape(b, t // p, p, c).transpose(0, 1, 3, 2).reshape(
            b, t // p, c * p)
    cc = c // p
    return x.reshape(b, t, cc, p).transpose(0, 1, 3, 2).reshape(b, t * p, cc)


def _rope_pairs(q, k, max_period: float):
    """Interleaved-pair rope on [B, H, T, D]
    (MossAudioTokenizer.swift:273-300)."""
    t, d = q.shape[2], q.shape[3]
    inv = np.exp(np.arange(d // 2) * (-math.log(max_period) * 2.0 / d))
    ang = np.arange(t)[:, None] * inv[None, :]
    cos = jnp.asarray(np.cos(ang), jnp.float32)
    sin = jnp.asarray(np.sin(ang), jnp.float32)
    return (nn.apply_rope(q, cos, sin, interleaved=True),
            nn.apply_rope(k, cos, sin, interleaved=True))


def _transformer_stage(p, x, kw: dict, lengths, context: int):
    """MossProjectedTransformer (channels-last;
    MossAudioTokenizer.swift:302-535)."""
    d_model = kw.get("d_model")
    n_heads = kw.get("num_heads", 1)
    n_layers = kw.get("num_layers", 1)
    pos_type = kw.get("positional_embedding", "rope")
    max_period = float(kw.get("max_period", 10000.0))
    pos_scale = float(kw.get("positional_scale", 1.0))
    causal = kw.get("causal", True)
    has_scale = kw.get("layer_scale") is not None
    h = nn.linear(p["input_proj"], x) if "input_proj" in p else x
    b, t, _ = h.shape
    hd = d_model // n_heads
    if pos_type in ("sin", "sin_rope"):
        half = d_model // 2
        scale = max_period ** (np.arange(half) / max(half - 1, 1))
        phase = np.arange(t)[:, None] / scale[None, :]
        emb = np.concatenate([np.cos(phase), np.sin(phase)], axis=-1)
        h = h + pos_scale * jnp.asarray(emb, h.dtype)[None]
    pos = jnp.arange(t)
    allowed = pos[None, :] < lengths[:, None]  # [B, Tk]
    allowed = allowed[:, None, None, :]
    delta = pos[:, None] - pos[None, :]
    if causal:
        allowed = allowed & (delta >= 0)[None, None]
    allowed = allowed & (delta < context)[None, None]
    mask = jnp.where(allowed, 0.0, -1e9).astype(jnp.float32)
    q_valid = (pos[None, :] < lengths[:, None])[:, None, :, None]
    for i in range(n_layers):
        lp = p["transformer"]["layers"][str(i)]
        hn = nn.layer_norm(lp["norm1"], h)
        qkv = nn.linear(lp["self_attn"]["in_proj"], hn).reshape(
            b, t, 3, n_heads, hd)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        if pos_type in ("rope", "sin_rope"):
            q, k = _rope_pairs(q, k, max_period)
        o = nn.sdpa(q, k, v, mask=mask)
        o = jnp.where(q_valid, o, 0.0)
        o = nn.linear(lp["self_attn"]["out_proj"],
                      o.transpose(0, 2, 1, 3).reshape(b, t, d_model))
        if has_scale:
            o = o * lp["layer_scale_1"]["scale"]
        h = h + o
        hn = nn.layer_norm(lp["norm2"], h)
        ff = nn.linear(lp["ffn"]["2"], nn.gelu(nn.linear(lp["ffn"]["0"],
                                                         hn)))
        if has_scale:
            ff = ff * lp["layer_scale_2"]["scale"]
        h = h + ff
    if "output_proj" in p:
        h = nn.linear(p["output_proj"], h)
    return h


def _run_stages(params, x, kwargs_list, cfg: MossTokenizerConfig, lengths,
                down: bool, prefix: str):
    frame_rate = float(cfg.sampling_rate
                       * (cfg.number_channels
                          if cfg.enable_channel_interleave
                          and cfg.number_channels > 1 else 1))
    if not down:
        for kw in cfg.encoder_kwargs:
            if kw.get("module_type") == "PatchedPretransform":
                frame_rate /= kw.get("patch_size", 1)
    for i, kw in enumerate(kwargs_list):
        mtype = kw.get("module_type")
        if mtype == "PatchedPretransform":
            patch = kw.get("patch_size", 1)
            x = _patch(x, patch, down)
            lengths = lengths // patch if down else lengths * patch
            frame_rate = frame_rate / patch if down else frame_rate * patch
        elif mtype == "Transformer":
            dur = kw.get("context_duration",
                         cfg.causal_transformer_context_duration)
            context = int(round(frame_rate * dur))
            x = _transformer_stage(params[prefix][str(i)], x, kw, lengths,
                                   max(context, 1))
        else:
            raise ValueError(f"unsupported module_type {mtype!r}")
    return x, lengths


def _l2norm(x, axis=-1, eps=1e-12):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


def _lfq_encode(qp, residual):
    z_e = nn.conv1d(qp["in_proj"], residual)
    emb = qp["codebook"]["weight"].astype(jnp.float32)
    enc = _l2norm(z_e.astype(jnp.float32))
    code = _l2norm(emb)
    dist = (jnp.sum(enc * enc, axis=-1, keepdims=True)
            - 2.0 * enc @ code.T + jnp.sum(code * code, axis=-1)[None, None])
    idx = jnp.argmin(dist, axis=-1)
    z_q = nn.conv1d(qp["out_proj"], emb[idx].astype(residual.dtype))
    return z_q, idx.astype(jnp.int32)


def rlfq_encode(params, z, lengths, n_quantizers: int):
    """[B, T, D] -> codes [nq, B, T] (MossAudioTokenizer.swift:648-673)."""
    q = params["quantizer"]
    h = nn.conv1d(q["input_proj"], z)
    mask = (jnp.arange(h.shape[1])[None, :]
            < lengths[:, None])[..., None].astype(h.dtype)
    residual = h * mask
    codes = []
    for i in range(n_quantizers):
        z_q_i, idx = _lfq_encode(q["quantizers"][str(i)], residual)
        residual = residual - z_q_i * mask
        codes.append(idx)
    return jnp.stack(codes, axis=0)


def rlfq_decode(params, codes):
    """codes [nq, B, T] -> [B, T, out_dim]
    (MossAudioTokenizer.swift:675-685)."""
    q = params["quantizer"]
    emb = None
    for i in range(codes.shape[0]):
        qp = q["quantizers"][str(i)]
        e = qp["codebook"]["weight"][codes[i]]
        e = nn.conv1d(qp["out_proj"], e.astype(jnp.float32))
        emb = e if emb is None else emb + e
    return nn.conv1d(q["output_proj"], emb)


def sanitize(weights):
    """MossAudioTokenizer.swift:796-820 + weight-norm folding: in_projs.0
    -> in_proj, linear1/2 -> ffn.0/2; parametrizations folded."""
    flat = {}
    for k, v in weights.items():
        k = k.replace(".self_attn.in_projs.0.", ".self_attn.in_proj.")
        k = k.replace(".self_attn.out_projs.0.", ".self_attn.out_proj.")
        if ".transformer.layers." in k:
            k = k.replace(".linear1.", ".ffn.0.")
            k = k.replace(".linear2.", ".ffn.2.")
        k = k.replace(".parametrizations.weight.original0", ".weight_g")
        k = k.replace(".parametrizations.weight.original1", ".weight_v")
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
        out[k] = v
    return out


class MossAudioTokenizer:
    def __init__(self, config: MossTokenizerConfig, params,
                 dtype=jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        self.sample_rate = config.sample_rate
        self.num_quantizers = config.quantizer_kwargs.get(
            "num_quantizers", 32)
        self._encode = ajit(self._encode_impl, static_argnums=(3,))
        self._decode = ajit(self._decode_impl)

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32
                        ) -> "MossAudioTokenizer":
        model_dir = hub.resolve_or_download_model(repo_or_path)
        config = MossTokenizerConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        return cls(config, params, dtype)

    def _encode_impl(self, params, x, lengths, n_q: int):
        h, lens = _run_stages(params, x, self.config.encoder_kwargs,
                              self.config, lengths, down=True,
                              prefix="encoder")
        return rlfq_encode(params, h, lens, n_q), lens

    def _decode_impl(self, params, codes):
        z = rlfq_decode(params, codes)
        lens = jnp.full((z.shape[0],), z.shape[1], jnp.int32)
        wav, _ = _run_stages(params, z, self.config.decoder_kwargs,
                             self.config, lens, down=False,
                             prefix="decoder")
        return wav

    def encode(self, audio, n_quantizers: int | None = None):
        """waveform [T] or [T, C] -> codes [nq, B, frames]
        (MossAudioTokenizer encodeAudio)."""
        cfg = self.config
        x = np.asarray(audio, np.float32)
        if x.ndim == 1:
            x = x[:, None]
        if x.shape[1] != cfg.number_channels:
            if cfg.number_channels == 1:
                x = x.mean(axis=1, keepdims=True)
            else:
                x = np.repeat(x[:, :1], cfg.number_channels, axis=1)
        if cfg.enable_channel_interleave and cfg.number_channels > 1:
            x = x.reshape(-1, 1)  # interleave channels along time
        ds = cfg.downsample_rate // (
            cfg.number_channels if cfg.enable_channel_interleave
            and cfg.number_channels > 1 else 1)
        pad = (-x.shape[0]) % max(ds, 1)
        if pad:
            x = np.pad(x, ((0, pad), (0, 0)))
        n_q = min(n_quantizers or self.num_quantizers, self.num_quantizers)
        codes, _ = self._encode(
            self.params, jnp.asarray(x, self.dtype)[None],
            jnp.asarray([x.shape[0]], jnp.int32), n_q)
        return codes

    def decode(self, codes) -> np.ndarray:
        """codes [nq, B, frames] -> waveform [B, T] (mono) or
        de-interleaved [B, T, C]."""
        cfg = self.config
        wav = np.asarray(self._decode(self.params, jnp.asarray(codes)))
        if cfg.enable_channel_interleave and cfg.number_channels > 1:
            wav = wav.reshape(wav.shape[0], -1, cfg.number_channels)
            return wav
        return wav[..., 0]

    def reconstruct(self, audio):
        return self.decode(self.encode(audio))
