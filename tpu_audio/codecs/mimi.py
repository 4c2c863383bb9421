"""Mimi: SEANet conv encoder/decoder + windowed-rope transformer + split RVQ,
with step-wise streaming encode/decode.

TPU-first rebuild of the reference
(Sources/MLXAudioCodecs/Mimi/{Mimi,Seanet,Conv,Transformer,Quantization}.swift):
24 kHz, 12.5 Hz frame rate, SEANet ratios [8,6,5,4] with causal streamable
convs, ProjectedTransformer (pre-LN, layer-scale, traditional/interleaved
rope, 250-frame context), ConvDownsample/ConvTrUpsample to the 12.5 Hz grid,
and a split residual VQ (semantic first codebook + acoustic rest) with
EMA EuclideanCodebooks (embedding = embedding_sum / cluster_usage).

Activations are channels-last [B, T, C]. Offline encode/decode are jittable
pure functions; the streaming ``*_step`` APIs carry explicit host-side state
(variable-length conv tails and overlap-add carries, like the reference's
module-held buffers) and run eagerly.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.codecs import AudioCodecModel
from tpu_audio.core import hub, kv_cache, loading, nn

__all__ = ["Mimi", "MimiConfig", "mimi_202407"]


@dataclass
class SeanetConfig:
    dimension: int = 512
    channels: int = 1
    causal: bool = True
    nfilters: int = 64
    nresidual_layers: int = 1
    ratios: tuple = (8, 6, 5, 4)
    ksize: int = 7
    residual_ksize: int = 3
    last_ksize: int = 3
    dilation_base: int = 2
    compress: int = 2


@dataclass
class TransformerConfig:
    d_model: int = 512
    num_heads: int = 8
    num_layers: int = 8
    layer_scale: float = 0.01
    context: int = 250
    max_period: float = 10000.0
    dim_feedforward: int = 2048

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads


@dataclass
class MimiConfig:
    channels: int = 1
    sample_rate: int = 24000
    frame_rate: float = 12.5
    seanet: SeanetConfig = field(default_factory=SeanetConfig)
    transformer: TransformerConfig = field(default_factory=TransformerConfig)
    quantizer_nq: int = 16
    quantizer_bins: int = 2048
    quantizer_dim: int = 256

    @property
    def downsample_stride(self) -> int:
        enc_fps = self.sample_rate / int(np.prod(self.seanet.ratios))
        return int(enc_fps / self.frame_rate)

    @classmethod
    def from_dict(cls, d: dict) -> "MimiConfig":
        cfg = mimi_202407(d.get("num_codebooks", d.get("num_quantizers", 16)))
        if "sampling_rate" in d:
            cfg.sample_rate = d["sampling_rate"]
        if "frame_rate" in d:
            cfg.frame_rate = d["frame_rate"]
        if "quantizer_dim" in d:
            cfg.quantizer_dim = d["quantizer_dim"]
        if "quantizer_bins" in d:
            cfg.quantizer_bins = d["quantizer_bins"]
        for sub, sub_cls in (("seanet", SeanetConfig), ("transformer", TransformerConfig)):
            if sub in d:
                keys = set(sub_cls.__dataclass_fields__)
                kw = {k: v for k, v in d[sub].items() if k in keys}
                if "ratios" in kw:
                    kw["ratios"] = tuple(kw["ratios"])
                setattr(cfg, sub, sub_cls(**kw))
        return cfg


def mimi_202407(num_codebooks: int = 16) -> MimiConfig:
    """The kyutai mimi-202407 architecture (Mimi.swift:47-99)."""
    return MimiConfig(quantizer_nq=num_codebooks)


# ---------------------------------------------------------------------------
# Streamable convs (channels-last)
# ---------------------------------------------------------------------------


def _extra_pad(length, k_eff, stride, pad_total):
    n_frames = max(length + pad_total - k_eff, 0) / stride + 1.0
    ideal = (math.ceil(n_frames) - 1) * stride + k_eff - pad_total
    return max(0, ideal - length)


def s_conv1d(p, x, ksize, stride=1, dilation=1, groups=1, pad_mode="constant"):
    """Causal streamable conv, full sequence (StreamableConv1d)."""
    k_eff = (ksize - 1) * dilation + 1
    pad_total = k_eff - stride
    extra = _extra_pad(x.shape[1], k_eff, stride, pad_total)
    mode = "edge" if pad_mode == "edge" else "constant"
    x = jnp.pad(x, ((0, 0), (pad_total, extra), (0, 0)), mode=mode)
    return nn.conv1d(p["conv"]["conv"], x, stride=stride, dilation=dilation,
                     groups=groups)


def s_conv1d_step(p, x, state, ksize, stride=1, dilation=1, groups=1,
                  pad_mode="constant"):
    """Streaming step: state dict {prev: np/jnp [B, t, C] | None, padded: bool}."""
    b = x.shape[0]
    k_eff = (ksize - 1) * dilation + 1
    if not state.get("padded"):
        state["padded"] = True
        pad_total = k_eff - stride
        mode = "edge" if pad_mode == "edge" else "constant"
        x = jnp.pad(x, ((0, 0), (pad_total, 0), (0, 0)), mode=mode)
    if state.get("prev") is not None:
        x = jnp.concatenate([state["prev"], x], axis=1)
    length = x.shape[1]
    n_frames = max(length + stride - k_eff, 0) // stride
    if n_frames == 0:
        state["prev"] = x
        out_c = p["conv"]["conv"]["weight"].shape[0]
        return jnp.zeros((b, 0, out_c), x.dtype), state
    offset = n_frames * stride
    state["prev"] = x[:, offset:] if offset < length else None
    in_len = (n_frames - 1) * stride + k_eff
    y = nn.conv1d(p["conv"]["conv"], x[:, :in_len], stride=stride,
                  dilation=dilation, groups=groups)
    return y, state


def s_convtr1d(p, x, ksize, stride, groups=1):
    """Causal streamable transposed conv, full sequence: trim k-stride right."""
    w = p["convtr"]["convtr"]["weight"]
    y = nn.conv_transpose1d({"weight": w, **({"bias": p["convtr"]["convtr"]["bias"]}
                                            if "bias" in p["convtr"]["convtr"] else {})},
                            x, stride=stride, padding=0, groups=groups)
    trim = max(ksize - stride, 0)
    return y[:, : y.shape[1] - trim] if trim else y


def s_convtr1d_step(p, x, state, ksize, stride, groups=1):
    """Streaming transposed conv with overlap-add carry (bias-free carry)."""
    pp = p["convtr"]["convtr"]
    y = nn.conv_transpose1d(pp, x, stride=stride, padding=0, groups=groups)
    if state.get("prev") is not None:
        prev = state["prev"]
        if "bias" in pp:
            prev = prev - pp["bias"]
        pt = prev.shape[1]
        y = y.at[:, :pt].add(prev)
    invalid = ksize - stride
    ot = y.shape[1]
    valid = y[:, : max(ot - invalid, 0)]
    state["prev"] = y[:, max(ot - invalid, 0):] if invalid > 0 else None
    return valid, state


# ---------------------------------------------------------------------------
# SEANet
# ---------------------------------------------------------------------------


def _resnet_block(p, x, cfg: SeanetConfig, dilation, step_state=None, prefix=None):
    ks = [(cfg.residual_ksize, dilation), (1, 1)]
    h = x
    for i, (k, d) in enumerate(ks):
        h = jax.nn.elu(h)
        bp = p["block"][str(i)]
        if step_state is None:
            h = s_conv1d(bp, h, k, dilation=d)
        else:
            key = f"{prefix}.block.{i}"
            st = step_state.setdefault(key, {})
            h, _ = s_conv1d_step(bp, h, st, k, dilation=d)
    if step_state is None:
        return x + h
    # streaming residual add with length alignment (StreamingAdd)
    key = f"{prefix}.add"
    st = step_state.setdefault(key, {"l": None, "r": None})
    l, r = h, x
    if st["l"] is not None:
        l = jnp.concatenate([st["l"], l], axis=1)
        st["l"] = None
    if st["r"] is not None:
        r = jnp.concatenate([st["r"], r], axis=1)
        st["r"] = None
    n = min(l.shape[1], r.shape[1])
    if l.shape[1] > n:
        st["l"] = l[:, n:]
    if r.shape[1] > n:
        st["r"] = r[:, n:]
    return l[:, :n] + r[:, :n]


def seanet_encode(p, x, cfg: SeanetConfig, state=None):
    """x [B, T, 1] -> [B, T/prod(ratios), dimension]."""
    def conv(pp, h, k, stride=1, key=None, pad_mode="constant"):
        if state is None:
            return s_conv1d(pp, h, k, stride=stride, pad_mode=pad_mode)
        st = state.setdefault(key, {})
        y, _ = s_conv1d_step(pp, h, st, k, stride=stride, pad_mode=pad_mode)
        return y

    h = conv(p["init_conv1d"], x, cfg.ksize, key="enc.init")
    for li, ratio in enumerate(reversed(cfg.ratios)):
        lp = p["layers"][str(li)]
        dilation = 1
        for ri in range(cfg.nresidual_layers):
            h = _resnet_block(lp["residuals"][str(ri)], h, cfg, dilation,
                              step_state=state, prefix=f"enc.{li}.{ri}")
            dilation *= cfg.dilation_base
        h = jax.nn.elu(h)
        h = conv(lp["downsample"], h, ratio * 2, stride=ratio,
                 key=f"enc.{li}.down")
    h = jax.nn.elu(h)
    return conv(p["final_conv1d"], h, cfg.last_ksize, key="enc.final")


def seanet_decode(p, z, cfg: SeanetConfig, state=None):
    """[B, T, dimension] -> [B, T*prod(ratios), channels]."""
    def conv(pp, h, k, stride=1, key=None):
        if state is None:
            return s_conv1d(pp, h, k, stride=stride)
        st = state.setdefault(key, {})
        y, _ = s_conv1d_step(pp, h, st, k, stride=stride)
        return y

    h = conv(p["init_conv1d"], z, cfg.ksize, key="dec.init")
    for li, ratio in enumerate(cfg.ratios):
        lp = p["layers"][str(li)]
        h = jax.nn.elu(h)
        if state is None:
            h = s_convtr1d(lp["upsample"], h, ratio * 2, ratio)
        else:
            st = state.setdefault(f"dec.{li}.up", {})
            h, _ = s_convtr1d_step(lp["upsample"], h, st, ratio * 2, ratio)
        dilation = 1
        for ri in range(cfg.nresidual_layers):
            h = _resnet_block(lp["residuals"][str(ri)], h, cfg, dilation,
                              step_state=state, prefix=f"dec.{li}.{ri}")
            dilation *= cfg.dilation_base
    h = jax.nn.elu(h)
    return conv(p["final_conv1d"], h, cfg.last_ksize, key="dec.final")


# ---------------------------------------------------------------------------
# Transformer (pre-LN, layer scale, traditional rope, windowed context)
# ---------------------------------------------------------------------------


def transformer_forward(p, x, cfg: TransformerConfig, cache=None):
    """ProjectedTransformer over [B, T, D]; cache enables step-wise use."""
    h = nn.linear(p["input_proj"], x) if "input_proj" in p else x
    b, t, d = h.shape
    n_heads, hd = cfg.num_heads, cfg.head_dim
    offset = cache.offset if cache is not None else 0
    positions = offset + jnp.arange(t)
    cos, sin = nn.rope(positions, hd, cfg.max_period)
    for i in range(cfg.num_layers):
        lp = p["transformer"]["layers"][str(i)]
        hn = nn.layer_norm(lp["norm1"], h)
        qkv = nn.linear(lp["self_attn"]["in_proj"], hn)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
        q = nn.apply_rope(q, cos, sin, interleaved=True)
        k = nn.apply_rope(k, cos, sin, interleaved=True)
        if cache is not None:
            cache, k_full, v_full = kv_cache.update_cache(cache, i, k, v)
            key_pos = jnp.arange(cache.max_len)
            query_pos = offset + jnp.arange(t)
            mask = ((key_pos[None] <= query_pos[:, None])
                    & (key_pos[None] > query_pos[:, None] - cfg.context))
            o = nn.sdpa(q, k_full, v_full, mask=mask[None, None])
        else:
            pos_q = jnp.arange(t)
            mask = ((pos_q[None] <= pos_q[:, None])
                    & (pos_q[None] > pos_q[:, None] - cfg.context))
            o = nn.sdpa(q, k, v, mask=mask[None, None])
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        o = nn.linear(lp["self_attn"]["out_proj"], o)
        h = h + lp["layer_scale_1"]["scale"].astype(h.dtype) * o
        hn = nn.layer_norm(lp["norm2"], h)
        m = nn.linear(lp["gating"]["linear2"],
                      nn.gelu(nn.linear(lp["gating"]["linear1"], hn)))
        h = h + lp["layer_scale_2"]["scale"].astype(h.dtype) * m
    if "output_projs" in p and "0" in p["output_projs"]:
        h = nn.linear(p["output_projs"]["0"], h)
    if cache is not None:
        cache = cache._replace(offset=cache.offset + t)
    return h, cache


# ---------------------------------------------------------------------------
# Quantizer (EMA Euclidean codebooks)
# ---------------------------------------------------------------------------


def _codebook_embed(p):
    if "embedding" in p:
        return p["embedding"]
    return p["embedding_sum"] / jnp.maximum(p["cluster_usage"], 1e-5)[:, None]


def _vq_encode(p, x):
    emb = _codebook_embed(p["codebook"])
    if "project_in" in p:
        x = nn.linear(p["project_in"], x)
    c2 = (emb**2).sum(-1) / 2
    dists = c2[None, None] - x @ emb.T
    return jnp.argmin(dists, axis=-1)


def _vq_decode(p, codes):
    emb = _codebook_embed(p["codebook"])
    x = emb[codes]
    if "project_out" in p:
        x = nn.linear(p["project_out"], x)
    return x


def _rvq_encode(p, x, n_q):
    codes = []
    residual = x
    for i in range(n_q):
        lp = p["vq"]["layers"][str(i)]
        idx = _vq_encode(lp, residual)
        residual = residual - _vq_decode(lp, idx)
        codes.append(idx)
    return jnp.stack(codes, axis=1)  # [B, n_q, T]


def _rvq_decode(p, codes):
    out = None
    for i in range(codes.shape[1]):
        q = _vq_decode(p["vq"]["layers"][str(i)], codes[:, i])
        out = q if out is None else out + q
    return out


def quantizer_encode(p, x, nq_semantic: int = 1):
    """x [B, T, D_in] -> codes [B, n_q, T] (SplitResidualVectorQuantizer)."""
    def proj(pp, h, key):
        return nn.conv1d(pp[key], h) if key in pp else h

    first = p["rvq_first"]
    rest = p.get("rvq_rest")
    xf = proj(first, x, "input_proj")
    codes = [_rvq_encode(first, xf, len(first["vq"]["layers"]))]
    if rest is not None:
        xr = proj(rest, x, "input_proj")
        codes.append(_rvq_encode(rest, xr, len(rest["vq"]["layers"])))
    return jnp.concatenate(codes, axis=1)


def quantizer_decode(p, codes, nq_semantic: int = 1):
    def proj(pp, h):
        return nn.conv1d(pp["output_proj"], h) if "output_proj" in pp else h

    first = p["rvq_first"]
    out = proj(first, _rvq_decode(first, codes[:, :nq_semantic]))
    if codes.shape[1] > nq_semantic and "rvq_rest" in p:
        out = out + proj(p["rvq_rest"], _rvq_decode(p["rvq_rest"],
                                                    codes[:, nq_semantic:]))
    return out


def encode_forward(params, x, cfg: "MimiConfig") -> "jnp.ndarray":
    """Pure offline encode: waveform [B, T, 1] -> codes [B, n_q, frames].
    Shared by :class:`Mimi` and the Qwen3 speech tokenizer encoder
    (tpu_audio.codecs.qwen3_codec.Qwen3CodecEncoder) — the architectures
    are identical."""
    h = seanet_encode(params["encoder"], x, cfg.seanet)
    h, _ = transformer_forward(params["encoder_transformer"], h,
                               cfg.transformer)
    stride = cfg.downsample_stride
    if stride > 1:
        h = s_conv1d(params["downsample"], h, 2 * stride, stride=stride,
                     pad_mode="edge")
    return quantizer_encode(params["quantizer"], h)


# ---------------------------------------------------------------------------
# Sanitize (Mimi.swift:337-416)
# ---------------------------------------------------------------------------


def sanitize(weights: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    enc_idx = {1: 0, 4: 1, 7: 2, 10: 3}
    out = {}
    for raw_k, v in weights.items():
        k = ".".join(seg[1:] if seg.startswith("_") else seg
                     for seg in raw_k.split("."))
        k = k.replace("encoder.model.", "encoder.").replace(
            "decoder.model.", "decoder.")
        k = k.replace(".in_proj_weight", ".in_proj.weight")
        for a, b in (("linear1", "gating.linear1"), ("linear2", "gating.linear2")):
            if f".{a}.weight" in k and "gating" not in k:
                k = k.replace(f".{a}.", f".{b}.")
        # decoder/encoder flat Sequential index -> structured names
        for li, dec in enumerate((2, 5, 8, 11)):
            k = k.replace(f"decoder.{dec}.", f"decoder.layers.{li}.upsample.")
            k = k.replace(f"decoder.{dec+1}.", f"decoder.layers.{li}.residuals.0.")
        k = k.replace("decoder.0.", "decoder.init_conv1d.")
        k = k.replace("decoder.14.", "decoder.final_conv1d.")
        for src, li in enc_idx.items():
            k = k.replace(f"encoder.{src}.", f"encoder.layers.{li}.residuals.0.")
            k = k.replace(f"encoder.{src+2}.", f"encoder.layers.{li}.downsample.")
        k = k.replace("encoder.0.", "encoder.init_conv1d.")
        k = k.replace("encoder.14.", "encoder.final_conv1d.")
        # layouts: conv [O,K,I] -> [O,I,K]; transposed [O,K,I] -> [I,O,K]
        if k.endswith(".weight") and v.ndim == 3:
            if "convtr" in k or "upsample" in k:
                if v.shape[2] == 1 and v.shape[0] > 1:  # depthwise [C,K,1]
                    v = np.transpose(v, (0, 2, 1))  # -> [C,1,K]
                else:
                    v = np.transpose(v, (2, 0, 1))  # [O,K,I] -> [I,O,K]
            else:
                v = np.transpose(v, (0, 2, 1))
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


class Mimi(AudioCodecModel):
    def __init__(self, config: MimiConfig, params, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.sample_rate = config.sample_rate
        self.dtype = dtype
        self._enc_state = None
        self._dec_state = None
        self._enc_cache = None
        self._dec_cache = None

    @classmethod
    def from_pretrained(cls, repo_or_path: str, num_codebooks: int = 16,
                        dtype=jnp.float32) -> "Mimi":
        from pathlib import Path

        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        cfg_dict = {}
        if (model_dir / "config.json").exists():
            cfg_dict = hub.load_config(model_dir)
        cfg_dict.setdefault("num_codebooks", num_codebooks)
        config = MimiConfig.from_dict(cfg_dict)
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        return cls(config, params, dtype)

    # -- offline ---------------------------------------------------------------

    def encode(self, audio) -> jnp.ndarray:
        """waveform [B, T] or [T] -> codes [B, n_q, frames] (Mimi.encode)."""
        x = jnp.asarray(audio, self.dtype)
        if x.ndim == 1:
            x = x[None]
        return encode_forward(self.params, x[..., None], self.config)

    def decode(self, codes) -> jnp.ndarray:
        """codes [B, n_q, frames] -> waveform [B, T] (Mimi.decode)."""
        codes = jnp.asarray(codes)
        p = self.params
        h = quantizer_decode(p["quantizer"], codes)
        stride = self.config.downsample_stride
        h = s_convtr1d(p["upsample"], h, 2 * stride, stride,
                       groups=h.shape[-1])
        h, _ = transformer_forward(p["decoder_transformer"], h,
                                   self.config.transformer)
        wav = seanet_decode(p["decoder"], h, self.config.seanet)
        return wav[..., 0]

    # -- streaming -------------------------------------------------------------

    def reset_state(self):
        self._enc_state = {}
        self._dec_state = {}
        tc = self.config.transformer
        self._enc_cache = kv_cache.init_cache(tc.num_layers, 1, tc.num_heads,
                                              tc.head_dim, 2048, self.dtype)
        self._dec_cache = kv_cache.init_cache(tc.num_layers, 1, tc.num_heads,
                                              tc.head_dim, 2048, self.dtype)

    def decode_step(self, codes) -> jnp.ndarray:
        """Incremental decode of new frames [B, n_q, t] (Mimi.decodeStep)."""
        if self._dec_state is None:
            self.reset_state()
        p = self.params
        codes = jnp.asarray(codes)
        h = quantizer_decode(p["quantizer"], codes)
        stride = self.config.downsample_stride
        st = self._dec_state.setdefault("upsample", {})
        h, _ = s_convtr1d_step(p["upsample"], h, st, 2 * stride, stride,
                               groups=h.shape[-1])
        if h.shape[1] == 0:
            return jnp.zeros((codes.shape[0], 0))
        h, self._dec_cache = transformer_forward(
            p["decoder_transformer"], h, self.config.transformer,
            self._dec_cache)
        wav = seanet_decode(p["decoder"], h, self.config.seanet,
                            state=self._dec_state)
        return wav[..., 0]

    def encode_step(self, audio) -> jnp.ndarray:
        """Incremental encode of new samples [B, t] (Mimi.encodeStep)."""
        if self._enc_state is None:
            self.reset_state()
        p = self.params
        x = jnp.asarray(audio, self.dtype)
        if x.ndim == 1:
            x = x[None]
        x = x[..., None]
        h = seanet_encode(p["encoder"], x, self.config.seanet,
                          state=self._enc_state)
        if h.shape[1] == 0:
            return jnp.zeros((x.shape[0], self.config.quantizer_nq, 0),
                             jnp.int32)
        h, self._enc_cache = transformer_forward(
            p["encoder_transformer"], h, self.config.transformer,
            self._enc_cache)
        stride = self.config.downsample_stride
        st = self._enc_state.setdefault("downsample", {})
        h, _ = s_conv1d_step(p["downsample"], h, st, 2 * stride,
                             stride=stride, pad_mode="edge")
        if h.shape[1] == 0:
            return jnp.zeros((x.shape[0], self.config.quantizer_nq, 0),
                             jnp.int32)
        return quantizer_encode(p["quantizer"], h)


class MimiStreamingDecoder:
    """Per-frame streaming decode wrapper (MimiStreamingDecoder,
    Mimi.swift:207-233; used by Marvis CSM)."""

    def __init__(self, mimi: Mimi):
        self.mimi = mimi
        self.reset()

    def reset(self):
        self.mimi.reset_state()

    def decode_frames(self, tokens) -> np.ndarray:
        """tokens [B, n_q, t] -> new waveform samples [B, t_samples]."""
        return np.asarray(self.mimi.decode_step(tokens))
