"""SAM-Audio: text-prompted source separation via flow matching.

TPU-first rebuild of the reference
(Sources/MLXAudioSTS/Models/SAMAudio/*): a DACVAE encodes the mixture to
continuous latents; a DiT with adaLN scale-shift tables, qk-normed
rotary self-attention and cross-attention to T5 text features predicts
the velocity field of a rectified flow whose state holds BOTH the target
and the residual latents ([B, T, 2C], SAMAudio.swift:264-267,418-424);
an Euler or midpoint ODE integrates from noise and the two halves decode
to the separated stems. Long audio runs chunked with cosine crossfade
(SAMAudio.swift:471-567); a streaming variant yields blended chunks.

TPU design deltas: the whole ODE solve is a jitted ``lax.fori_loop`` over
a precomputed schedule (the reference host-syncs every step,
SAMAudio.swift:383-416); the T5 encoder is shared with the ByT5 G2P
module.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.codecs.dacvae import DACVAE
from tpu_audio.core import hub, loading, nn
from tpu_audio.models.g2p import byt5 as t5
from tpu_audio.core.jitting import ajit

__all__ = ["SAMAudio", "SAMAudioConfig", "SeparationResult"]


@dataclass
class SAMTransformerConfig:
    """TransformerConfig (SAMAudioConfig.swift:40-170)."""

    dim: int = 2816
    n_heads: int = 22
    n_layers: int = 22
    norm_eps: float = 1e-5
    qk_norm: bool = True
    fc_bias: bool = False
    ffn_exp: int = 4
    ffn_dim_multiplier: float = 1.0
    multiple_of: int = 64
    use_rope: bool = True
    max_positions: int = 10000
    frequency_embedding_dim: int = 256
    t_block_bias: bool = True
    context_dim: int = 2816
    context_norm: bool = False
    out_channels: int = 256

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    def ffn_hidden(self) -> int:
        h = self.ffn_exp * self.dim
        h = int(2 * h / 3)  # swiglu
        h = int(h * self.ffn_dim_multiplier)
        m = self.multiple_of
        return m * ((h + m - 1) // m)

    @classmethod
    def from_dict(cls, d: dict) -> "SAMTransformerConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass
class SAMAudioConfig:
    transformer: SAMTransformerConfig = field(
        default_factory=SAMTransformerConfig)
    text_encoder: t5.T5Config = field(default_factory=t5.T5Config)
    in_channels: int = 768          # 6 * codebook_dim
    num_anchors: int = 16
    anchor_embedding_dim: int = 128

    @classmethod
    def from_dict(cls, d: dict) -> "SAMAudioConfig":
        te = d.get("text_encoder") or {}
        te_cfg = t5.T5Config.from_dict(te) if hasattr(t5.T5Config,
                                                      "from_dict") \
            else t5.T5Config(**{k: v for k, v in te.items()
                                if k in t5.T5Config.__dataclass_fields__})
        return cls(
            transformer=SAMTransformerConfig.from_dict(
                d.get("transformer") or {}),
            text_encoder=te_cfg,
            in_channels=d.get("in_channels", 768),
            num_anchors=d.get("num_anchors", 16),
            anchor_embedding_dim=d.get("anchor_embedding_dim", 128))


@dataclass
class SeparationResult:
    """SAMAudioSeparationResult (SAMAudioTypes.swift:63-80)."""

    target: list
    residual: list
    noise: np.ndarray | None = None


# ---------------------------------------------------------------------------
# DiT pieces (SAMAudioTransformer.swift)
# ---------------------------------------------------------------------------


def _sam_rms(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt((xf * xf).mean(-1, keepdims=True) + eps)
    return (normed * p["weight"].astype(jnp.float32)).astype(x.dtype)


def _swiglu_proj(p, x):
    """ProjectionLayer / FeedForward with swiglu
    (SAMAudioTransformer.swift:36-69)."""
    h = nn.silu(nn.linear(p["w1"], x)) * nn.linear(p["w3"], x)
    return nn.linear(p["w2"], h)


def _rope_tables(head_dim: int, length: int, theta: float):
    half = head_dim // 2
    freqs = 1.0 / (theta ** (np.arange(half, dtype=np.float32)
                             / (half * 2) * 2.0))
    ang = np.arange(length, dtype=np.float32)[:, None] * freqs[None]
    return jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))


def _sam_attention(p, x, cfg: SAMTransformerConfig, cross_x=None,
                   key_padding_mask=None, rope=None):
    """SAMAttention: head layout [B, T, headDim, H] -> [B, H, T, headDim]
    (reshapeHeads, SAMAudioTransformer.swift:112-118), interleaved-pair
    rope on self-attention only."""
    b, t, _ = x.shape
    hd = cfg.head_dim
    n = cfg.n_heads
    kv_src = cross_x if cross_x is not None else x
    t_kv = kv_src.shape[1]
    q = nn.linear(p["wq"], x).reshape(b, t, hd, n).transpose(0, 3, 1, 2)
    k = nn.linear(p["wk"], kv_src).reshape(b, t_kv, hd,
                                           n).transpose(0, 3, 1, 2)
    v = nn.linear(p["wv"], kv_src).reshape(b, t_kv, hd,
                                           n).transpose(0, 3, 1, 2)
    if cfg.qk_norm:
        q = _sam_rms(p["q_norm"], q, cfg.norm_eps)
        k = _sam_rms(p["k_norm"], k, cfg.norm_eps)
    if rope is not None and cross_x is None:
        cos, sin = rope
        q = nn.apply_rope(q, cos[:t], sin[:t], interleaved=True)
        k = nn.apply_rope(k, cos[:t_kv], sin[:t_kv], interleaved=True)
    mask = None
    if key_padding_mask is not None:
        mask = key_padding_mask[:, None, None, :]
    o = nn.sdpa(q, k, v, mask=mask)
    return nn.linear(p["wo"], o.transpose(0, 2, 1, 3).reshape(b, t, -1))


def _dit_block(p, x, cross_x, t6, cfg: SAMTransformerConfig,
               padding_mask=None, memory_mask=None, rope=None):
    """DiTBlock with scale_shift_table adaLN
    (SAMAudioTransformer.swift:307-397)."""
    biases = p["scale_shift_table"][None] + t6.reshape(x.shape[0], 6, -1)
    (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp,
     gate_mlp) = [biases[:, i: i + 1] for i in range(6)]
    h = _sam_rms(p["attention_norm"], x, cfg.norm_eps)
    h = h * (1 + scale_msa) + shift_msa
    x = x + _sam_attention(p["attention"], h, cfg,
                           key_padding_mask=padding_mask,
                           rope=rope) * gate_msa
    if "cross_attention" in p and cross_x is not None:
        x = x + _sam_attention(p["cross_attention"], x, cfg,
                               cross_x=cross_x,
                               key_padding_mask=memory_mask)
    h = _sam_rms(p["ffn_norm"], x, cfg.norm_eps)
    h = h * (1 + scale_mlp) + shift_mlp
    return x + _swiglu_proj(p["feed_forward"], h) * gate_mlp


def _sam_conv1d(p, x, kernel: int, stride: int = 1, dilation: int = 1):
    """Asymmetric 'same' padding conv on channels-last [B, T, C]
    (SAMConv1d, SAMAudioPatcher.swift:66-123)."""
    eff_k = (kernel - 1) * dilation + 1
    pad_total = eff_k - stride
    length = x.shape[1]
    n_frames = (length - eff_k + pad_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (eff_k - pad_total)
    extra = ideal - length
    pad_right = pad_total // 2
    pad_left = pad_total - pad_right
    x = jnp.pad(x, ((0, 0), (pad_left, pad_right + extra), (0, 0)))
    return nn.conv1d(p, x, stride=stride, dilation=dilation)


def _patcher_forward(p, x, cfg: SAMTransformerConfig):
    """x_embedder ResnetBlock1d (patch size 1)
    (Patcher, SAMAudioPatcher.swift:202-233)."""
    bp = p["block"]

    def conv_block(cp, h, kernel=3):
        h = nn.group_norm(cp["groupnorm"], h, num_groups=1)
        return _sam_conv1d(cp["project"], nn.silu(h), kernel)

    h = conv_block(bp["block1"], x)
    h = conv_block(bp["block2"], h)
    res = _sam_conv1d(bp["to_out"], x, 1) if "to_out" in bp else x
    return h + res


def dit_forward(p, x, time, cfg: SAMTransformerConfig, padding_mask=None,
                memory=None, memory_mask=None):
    """x [B, T, dim] (already projected + anchored), time [B] ->
    velocity [B, T, out_channels] (DiT, SAMAudioTransformer.swift:467-510)."""
    h = _patcher_forward(p["x_embedder"], x, cfg)

    half = cfg.frequency_embedding_dim // 2
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = time[:, None].astype(jnp.float32) * freqs[None]
    temb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    t_vec = _swiglu_proj(p["t_embedder"]["projection"],
                         temb.astype(x.dtype))
    t6 = nn.linear(p["t_block"], nn.silu(t_vec))

    y = None
    if memory is not None:
        ye = p["y_embedder"]
        mem = memory
        if cfg.context_norm and "norm" in ye:
            mem = _sam_rms(ye["norm"], mem, cfg.norm_eps)
        y = _swiglu_proj(ye["projection"], mem)

    rope = None
    if cfg.use_rope:
        theta = float(max(10000, 2 * cfg.max_positions))
        rope = _rope_tables(cfg.head_dim, x.shape[1], theta)

    for i in sorted(p["layers"], key=int):
        h = _dit_block(p["layers"][i], h, y, t6, cfg, padding_mask,
                       memory_mask, rope)

    final = p["final_layer_scale_shift_table"][None] + t_vec[:, None]
    shift, scale = final[:, 0: 1], final[:, 1: 2]
    h = _sam_rms(p["norm"], h, cfg.norm_eps)
    h = h * (1 + scale) + shift
    return nn.linear(p["output"], h)


def embed_anchors(p, x, anchor_ids=None, anchor_alignment=None):
    """Add gated anchor embeddings at aligned frames
    (EmbedAnchors, SAMAudioAlign.swift:51-80)."""
    if anchor_ids is None or anchor_alignment is None:
        return x
    gathered = jnp.take_along_axis(jnp.asarray(anchor_ids, jnp.int32),
                                   jnp.asarray(anchor_alignment,
                                               jnp.int32), axis=1)
    embs = nn.embedding(p["embed"], gathered)
    projected = nn.linear(p["proj"], embs)
    return x + jnp.tanh(p["gate"]) * projected


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


class SAMAudio:
    def __init__(self, config: SAMAudioConfig, params,
                 codec: DACVAE | None = None, text_params=None,
                 tokenizer=None, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.codec = codec
        self.text_params = text_params
        self.tokenizer = tokenizer
        self.dtype = dtype
        self._solvers: dict = {}

    @property
    def sample_rate(self) -> int:
        return self.codec.sample_rate if self.codec else 48000

    @classmethod
    def from_pretrained(cls, repo_or_path: str,
                        dtype=jnp.float32) -> "SAMAudio":
        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        cfg_dict = hub.load_config(model_dir)
        config = SAMAudioConfig.from_dict(cfg_dict)

        def split_sanitize(w):
            from tpu_audio.codecs import dacvae as dacvae_mod

            codec_flat, text_flat, rest = {}, {}, {}
            for k, v in w.items():
                if k.startswith("audio_codec."):
                    codec_flat[k[len("audio_codec."):]] = v
                elif k.startswith("text_encoder."):
                    text_flat[k[len("text_encoder."):]] = v
                else:
                    # MLX-converted SAMConv1d weights are [O, K, I]
                    if k.endswith(".weight") and v.ndim == 3 and any(
                            t in k for t in ("x_embedder", ".project.",
                                             ".to_out.")) \
                            and v.shape[1] < v.shape[2]:
                        v = np.transpose(v, (0, 2, 1))
                    rest[k] = v
            out = dict(rest)
            for k, v in dacvae_mod.sanitize(codec_flat).items():
                out["audio_codec." + k] = v
            for k, v in t5.sanitize(text_flat).items():
                out["text_encoder." + k] = v
            return out

        params = loading.load_params(model_dir, sanitize=split_sanitize,
                                     dtype=dtype)
        codec = None
        if "audio_codec" in params:
            from tpu_audio.codecs.dacvae import DACVAEConfig

            codec_cfg = DACVAEConfig.from_dict(
                cfg_dict.get("audio_codec") or {})
            codec = DACVAE(codec_cfg, params["audio_codec"], dtype)
        text_params = params.get("text_encoder")
        tokenizer = None
        tok = model_dir / "tokenizer.json"
        if tok.exists():
            from tokenizers import Tokenizer

            tokenizer = Tokenizer.from_file(str(tok))
        return cls(config, params, codec, text_params, tokenizer, dtype)

    # -- text conditioning --------------------------------------------------------

    def encode_text(self, descriptions: list[str]):
        """-> (features [B, T, d_model], mask [B, T] bool) via the shared
        T5 encoder (T5TextEncoder, SAMAudioTextEncoder.swift)."""
        if self.tokenizer is None or self.text_params is None:
            raise RuntimeError("text encoder / tokenizer not loaded")
        encoded = [self.tokenizer.encode(d).ids + [1]  # </s>
                   for d in descriptions]
        max_len = max(len(e) for e in encoded)
        ids = np.zeros((len(encoded), max_len), np.int32)
        mask = np.zeros((len(encoded), max_len), bool)
        for i, e in enumerate(encoded):
            ids[i, : len(e)] = e
            mask[i, : len(e)] = True
        feats = t5.encode(self.text_params, jnp.asarray(ids),
                          jnp.asarray(mask.sum(1), jnp.int32),
                          self.config.text_encoder)
        return feats, jnp.asarray(mask)

    # -- core (SAMAudio.callAsFunction, SAMAudio.swift:230-262) --------------------

    def _velocity(self, params, noisy, audio_features, text_features,
                  time, text_mask, pad_mask, anchor_ids,
                  anchor_alignment):
        x = jnp.concatenate([noisy, jnp.zeros_like(audio_features),
                             audio_features], axis=2)
        x = nn.linear(params["proj"], x)
        x = embed_anchors(params["embed_anchors"], x, anchor_ids,
                          anchor_alignment)
        tcfg = self.config.transformer
        half = tcfg.dim // 2
        inv = jnp.exp(-math.log(10000.0)
                      * jnp.arange(half, dtype=jnp.float32) / half)
        emb = time[:, None].astype(jnp.float32) * inv[None]
        temb = jnp.concatenate([jnp.cos(emb), jnp.sin(emb)],
                               axis=-1)[:, None].astype(x.dtype)
        if text_features is not None:
            memory = nn.linear(params["memory_proj"],
                               text_features) + temb
        else:
            memory = temb
        return dit_forward(params["transformer"], x, time, tcfg,
                           padding_mask=pad_mask, memory=memory,
                           memory_mask=text_mask)

    def _get_solver(self, n_steps: int, method: str, has_anchors: bool):
        key = (n_steps, method, has_anchors)
        if key in self._solvers:
            return self._solvers[key]
        dt = 1.0 / n_steps

        def solve(params, noise, audio_features, text_features, text_mask,
                  pad_mask, anchor_ids, anchor_alignment):
            def vel(x, t):
                time = jnp.full((x.shape[0],), t, jnp.float32)
                return self._velocity(params, x, audio_features,
                                      text_features, time, text_mask,
                                      pad_mask, anchor_ids,
                                      anchor_alignment)

            def body(i, x):
                t = i.astype(jnp.float32) * dt
                if method == "midpoint":
                    v1 = vel(x, t)
                    mid = x + 0.5 * dt * v1
                    v = self._velocity(
                        params, mid, audio_features, text_features,
                        jnp.full((x.shape[0],), 0.0, jnp.float32) + t
                        + 0.5 * dt, text_mask, pad_mask, anchor_ids,
                        anchor_alignment)
                else:
                    v = vel(x, t)
                return x + dt * v

            return jax.lax.fori_loop(0, n_steps, body, noise)

        fn = ajit(solve)
        self._solvers[key] = fn
        return fn

    # -- separation -----------------------------------------------------------------

    def separate(self, audio: np.ndarray, descriptions: list[str],
                 n_steps: int = 16, method: str = "euler",
                 anchor_ids=None, anchor_alignment=None,
                 seed: int = 0) -> SeparationResult:
        """mixture [T] or [B, T] + text prompts -> separated target /
        residual stems (SAMAudio.separate, SAMAudio.swift:334-445)."""
        audio = np.atleast_2d(np.asarray(audio, np.float32))
        feats = self.codec.encode(audio)  # [B, T', C]
        audio_features = jnp.concatenate([feats, feats],
                                         axis=2).astype(self.dtype)
        b, seq, _ = audio_features.shape
        text_features, text_mask = self.encode_text(descriptions)
        noise = jax.random.normal(jax.random.PRNGKey(seed),
                                  audio_features.shape, self.dtype)
        pad_mask = jnp.ones((b, seq), bool)
        solver = self._get_solver(n_steps, method, anchor_ids is not None)
        out = solver(self.params, noise,
                     audio_features, text_features.astype(self.dtype),
                     text_mask,
                     pad_mask,
                     None if anchor_ids is None
                     else jnp.asarray(anchor_ids, jnp.int32),
                     None if anchor_alignment is None
                     else jnp.asarray(anchor_alignment, jnp.int32))
        channels = out.shape[2] // 2
        target = np.asarray(self.codec.decode(out[..., :channels]))[..., 0]
        residual = np.asarray(self.codec.decode(out[...,
                                                    channels:]))[..., 0]
        n = audio.shape[1]
        return SeparationResult(
            target=[target[i, :n] for i in range(b)],
            residual=[residual[i, :n] for i in range(b)],
            noise=np.asarray(out))

    def separate_long(self, audio: np.ndarray, descriptions: list[str],
                      chunk_seconds: float = 10.0,
                      overlap_seconds: float = 3.0, n_steps: int = 16,
                      method: str = "euler", seed: int = 0
                      ) -> SeparationResult:
        """Chunked separation with cosine crossfade
        (separateLong, SAMAudio.swift:471-567)."""
        audio = np.asarray(audio, np.float32).reshape(-1)
        sr = self.sample_rate
        chunk = max(1, int(sr * chunk_seconds))
        overlap = max(0, int(sr * overlap_seconds))
        hop = max(1, chunk - overlap)
        if len(audio) <= chunk:
            return self.separate(audio, descriptions, n_steps, method,
                                 seed=seed)
        target = residual = None
        for s in range(0, max(len(audio) - overlap, 1), hop):
            piece = audio[s: s + chunk]
            r = self.separate(piece, descriptions, n_steps, method,
                              seed=seed)
            t_c, r_c = r.target[0], r.residual[0]
            if target is None:
                target, residual = t_c, r_c
            else:
                target = self._crossfade(target, t_c, overlap)
                residual = self._crossfade(residual, r_c, overlap)
        return SeparationResult(target=[target], residual=[residual])

    def separate_streaming(self, audio: np.ndarray,
                           descriptions: list[str],
                           chunk_seconds: float = 10.0,
                           overlap_seconds: float = 3.0,
                           n_steps: int = 16, seed: int = 0):
        """Yields (target_chunk, residual_chunk, index, is_last) with
        crossfaded overlaps (separateStreaming, SAMAudio.swift:589-761)."""
        audio = np.asarray(audio, np.float32).reshape(-1)
        sr = self.sample_rate
        chunk = max(1, int(sr * chunk_seconds))
        overlap = max(0, int(sr * overlap_seconds))
        hop = max(1, chunk - overlap)
        starts = list(range(0, max(len(audio) - overlap, 1), hop))
        prev_tail = None
        idx = 0
        for i, s in enumerate(starts):
            piece = audio[s: s + chunk]
            r = self.separate(piece, descriptions, n_steps, seed=seed)
            t_c, r_c = r.target[0], r.residual[0]
            is_last = i == len(starts) - 1
            if prev_tail is not None and overlap > 0:
                ov = min(overlap, len(prev_tail[0]), len(t_c))
                fade_in = 0.5 * (1 - np.cos(
                    np.pi * np.arange(ov) / max(ov - 1, 1)))
                blended_t = prev_tail[0][:ov] * (1 - fade_in) \
                    + t_c[:ov] * fade_in
                blended_r = prev_tail[1][:ov] * (1 - fade_in) \
                    + r_c[:ov] * fade_in
                yield blended_t, blended_r, idx, False
                idx += 1
                t_c, r_c = t_c[ov:], r_c[ov:]
            if is_last:
                yield t_c, r_c, idx, True
                idx += 1
            else:
                tail = min(overlap, len(t_c))
                emit = len(t_c) - tail
                if emit > 0:
                    yield t_c[:emit], r_c[:emit], idx, False
                    idx += 1
                prev_tail = (t_c[emit:], r_c[emit:])

    @staticmethod
    def _crossfade(prev: np.ndarray, new: np.ndarray, overlap: int
                   ) -> np.ndarray:
        ov = min(overlap, len(prev), len(new))
        if ov <= 0:
            return np.concatenate([prev, new])
        fade_in = 0.5 * (1 - np.cos(np.pi * np.arange(ov)
                                    / max(ov - 1, 1)))
        blended = prev[-ov:] * (1 - fade_in) + new[:ov] * fade_in
        return np.concatenate([prev[:-ov], blended, new[ov:]])

    @staticmethod
    def anchors_to_frames(anchors: list[tuple[int, float, float]],
                          n_frames: int, frames_per_second: float):
        """[(anchor_id, start_s, end_s)] -> (anchor_ids [1, N],
        alignment [1, T]) where unaligned frames point at the null slot."""
        ids = [0] + [a[0] for a in anchors]
        alignment = np.zeros((1, n_frames), np.int32)
        for slot, (_, start, end) in enumerate(anchors, start=1):
            lo = int(start * frames_per_second)
            hi = min(n_frames, int(end * frames_per_second) + 1)
            alignment[0, lo:hi] = slot
        return np.asarray([ids], np.int32), alignment
