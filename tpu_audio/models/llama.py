"""Generic Llama-family decoder backbone (HF layout) with KV-cached steps.

Shared by LlamaTTS/Orpheus, Qwen3/VyvoTTS and other AR audio models — the
TPU rebuild of the reference's per-model Llama copies
(LlamaTTS.swift:206-379). Supports GQA, Llama-3 NTK rope scaling, optional
QK-norm (Qwen3), attention bias (Qwen2), tied embeddings and MLX-quantized
weights.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import kv_cache, nn

__all__ = ["LlamaConfig", "forward", "init_random_params", "maybe_stack",
           "fuse_projections"]


@dataclass
class LlamaConfig:
    hidden_size: int = 2048
    num_hidden_layers: int = 16
    intermediate_size: int = 8192
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: int | None = None
    rms_norm_eps: float = 1e-5
    vocab_size: int = 128256
    rope_theta: float = 500000.0
    rope_scaling: dict | None = None
    tie_word_embeddings: bool = True
    attention_bias: bool = False
    qk_norm: bool = False  # Qwen3-style per-head q/k RMSNorm
    rope_interleaved: bool = False  # "traditional"/NeoX pairing (GLM)
    max_position_embeddings: int = 8192
    # Granite-style scale knobs (GraniteSpeech.swift:536-668); the defaults
    # are exact no-ops for every other Llama-family model
    embedding_multiplier: float = 1.0
    residual_multiplier: float = 1.0
    attention_multiplier: float | None = None  # sdpa scale override
    logits_scaling: float = 1.0

    @property
    def resolved_head_dim(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @classmethod
    def from_dict(cls, d: dict) -> "LlamaConfig":
        keys = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in d.items() if k in keys}
        return cls(**kw)


def _is_per_layer_dict(layers) -> bool:
    # require a contiguous "0".."N-1" key set so checkpoints with gaps or
    # extra non-numeric keys fall back to the unrolled path instead of
    # raising KeyError during stacking
    return (isinstance(layers, dict) and "0" in layers
            and all(str(i) in layers for i in range(len(layers))))


def maybe_stack(params: dict) -> dict:
    """Stack the decoder's ``layers`` container for the lax.scan forward
    path (see ``loading.stack_layer_params``) when all layers share one
    structure; heterogeneous layers (e.g. per-layer quantization configs)
    are left as dicts and take the unrolled path."""
    p = params["model"] if "model" in params else params
    layers = p.get("layers")
    if not _is_per_layer_dict(layers):
        return params
    structs = {
        jax.tree.structure(layers[str(i)])
        for i in range(len(layers))
    }
    shapes = {
        tuple(x.shape for x in jax.tree.leaves(layers[str(i)]))
        for i in range(len(layers))
    }
    if len(structs) > 1 or len(shapes) > 1:
        return params
    p["layers"] = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[layers[str(i)] for i in range(len(layers))],
    )
    return params


def _concat_weights(parts, axis):
    """Concatenate linear weights along the output axis; supports dense
    arrays and (packed, scales, biases, scales_w all share the O axis)
    :class:`quant.QuantizedTensor` leaves. Returns None when the parts
    are not homogeneous (mixed dense/quantized or differing quant params
    — e.g. per-layer quantization configs, LlamaTTS.swift:959-969)."""
    from tpu_audio.core import quant

    def kind(p):
        if isinstance(p, quant.Int8Tensor):
            return "i8"
        if isinstance(p, quant.QuantizedTensor):
            return "mlx"
        return "dense"

    if len({kind(p) for p in parts}) > 1:
        return None
    if isinstance(parts[0], quant.Int8Tensor):
        # weight [..., O, I] concat on O; per-channel scale [..., O] on -1
        return quant.Int8Tensor(
            jnp.concatenate([p.weight for p in parts], axis=axis),
            jnp.concatenate([p.scale for p in parts], axis=-1))
    if isinstance(parts[0], quant.QuantizedTensor):
        if ({p.group_size for p in parts} != {parts[0].group_size}
                or {p.bits for p in parts} != {parts[0].bits}):
            return None
        sw = None
        if all(p.scales_w is not None for p in parts):
            sw = jnp.concatenate([p.scales_w for p in parts], axis=axis)
        return quant.QuantizedTensor(
            jnp.concatenate([p.weight for p in parts], axis=axis),
            jnp.concatenate([p.scales for p in parts], axis=axis),
            jnp.concatenate([p.biases for p in parts], axis=axis),
            sw, group_size=parts[0].group_size, bits=parts[0].bits)
    return jnp.concatenate(parts, axis=axis)


def fuse_projections(params: dict) -> dict:
    """Fuse q/k/v -> ``qkv_proj`` and gate/up -> ``gate_up_proj`` (concat
    along the output-features axis; the input axis — and therefore the
    quantization group structure — is untouched).

    One GEMV per fused weight instead of three/two: fewer kernel
    dispatches in the decode hot loop, and bigger dots for the MXU. The
    forward pass detects the fused layout per layer; biases are fused
    too when present.
    """
    p = params["model"] if "model" in params else params
    layers = p.get("layers")

    def fuse_group(container, names, fused_name, axis):
        """Fuse ``names`` linears into ``fused_name`` when homogeneous
        (all-or-none biases; same weight kind); else leave untouched."""
        if not all(n in container for n in names):
            return container
        if any("scales" in container[n] for n in names):
            # raw (un-tagged) MLX-quantized triples: fusing the packed
            # uint32 weight would silently drop scales/biases — callers
            # must quant.tag_quantized first
            return container
        with_bias = ["bias" in container[n] for n in names]
        if any(with_bias) and not all(with_bias):
            return container
        w = _concat_weights([container[n]["weight"] for n in names], axis)
        if w is None:
            return container
        fused = {"weight": w}
        if all(with_bias):
            fused["bias"] = jnp.concatenate(
                [container[n]["bias"] for n in names], axis=-1)
        out = {k: v for k, v in container.items() if k not in names}
        out[fused_name] = fused
        return out

    def fuse_layer(lp, axis):
        out = dict(lp)
        out["self_attn"] = fuse_group(
            lp["self_attn"], ("q_proj", "k_proj", "v_proj"), "qkv_proj",
            axis)
        out["mlp"] = fuse_group(
            lp["mlp"], ("gate_proj", "up_proj"), "gate_up_proj", axis)
        return out

    if _is_per_layer_dict(layers):
        p["layers"] = {k: fuse_layer(v, 0) for k, v in layers.items()}
    else:
        p["layers"] = fuse_layer(layers, 1)  # stacked [L, O, I]
    return params


def _rope_tables(cfg: LlamaConfig, positions: jnp.ndarray):
    scaling = None
    rs = cfg.rope_scaling
    if rs and rs.get("rope_type", rs.get("type")) == "llama3":
        scaling = rs
    inv_freq = nn.rope_freqs(cfg.resolved_head_dim, cfg.rope_theta, scaling)
    ang = positions[:, None].astype(jnp.float32) * inv_freq[None, :]
    return jnp.cos(ang), jnp.sin(ang)


def layer_forward(x, lp, cfg: LlamaConfig, cos, sin, *, mask=None,
                  attn_mask=None, causal: bool = True, kv_update=None):
    """One decoder layer on ``x [B, T, D]``; ``kv_update(k, v)`` (optional)
    returns the full-capacity K/V views for attention and stashes the cache
    write. Shared by :func:`forward` and the pipeline-parallel stage
    runner (parallel/pipeline.py)."""
    b, t = x.shape[:2]
    n_heads, n_kv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                         cfg.resolved_head_dim)
    h = nn.rms_norm(lp["input_layernorm"], x, cfg.rms_norm_eps)
    ap = lp["self_attn"]
    if "qkv_proj" in ap:
        qkv = nn.linear(ap["qkv_proj"], h)
        nq, nk = n_heads * hd, n_kv * hd
        q = qkv[..., :nq].reshape(b, t, n_heads, hd)
        k = qkv[..., nq:nq + nk].reshape(b, t, n_kv, hd)
        v = qkv[..., nq + nk:].reshape(b, t, n_kv, hd)
    else:
        q = nn.linear(ap["q_proj"], h).reshape(b, t, n_heads, hd)
        k = nn.linear(ap["k_proj"], h).reshape(b, t, n_kv, hd)
        v = nn.linear(ap["v_proj"], h).reshape(b, t, n_kv, hd)
    if cfg.qk_norm:
        q = nn.rms_norm(ap["q_norm"], q, cfg.rms_norm_eps)
        k = nn.rms_norm(ap["k_norm"], k, cfg.rms_norm_eps)
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    q = nn.apply_rope(q, cos, sin, interleaved=cfg.rope_interleaved)
    k = nn.apply_rope(k, cos, sin, interleaved=cfg.rope_interleaved)
    if kv_update is not None:
        k_full, v_full = kv_update(k, v)
        o = nn.sdpa(q, k_full, v_full, mask=mask,
                    scale=cfg.attention_multiplier)
    else:
        o = nn.sdpa(q, k, v, mask=attn_mask,
                    is_causal=causal and attn_mask is None,
                    scale=cfg.attention_multiplier)
    o = o.transpose(0, 2, 1, 3).reshape(b, t, n_heads * hd)
    x = x + nn.linear(ap["o_proj"], o) * cfg.residual_multiplier

    h = nn.rms_norm(lp["post_attention_layernorm"], x, cfg.rms_norm_eps)
    mp = lp["mlp"]
    if "gate_up_proj" in mp:
        gu = nn.linear(mp["gate_up_proj"], h)
        ffn = gu.shape[-1] // 2
        act = nn.silu(gu[..., :ffn]) * gu[..., ffn:]
    else:
        act = nn.silu(nn.linear(mp["gate_proj"], h)) * nn.linear(
            mp["up_proj"], h)
    x = x + nn.linear(mp["down_proj"], act) * cfg.residual_multiplier
    return x


def layers_apply(layers_stacked, x, cfg: LlamaConfig, cos, sin,
                 attn_mask=None, causal: bool = True):
    """Cache-less scan over a stacked ``[L, ...]`` layer tree — the
    building block a pipeline stage runs over its local layer slice."""
    def layer(x, lp):
        return layer_forward(x, lp, cfg, cos, sin, attn_mask=attn_mask,
                             causal=causal), None

    x, _ = jax.lax.scan(layer, x, layers_stacked)
    return x


def forward(params, tokens, cache: kv_cache.KVCache | None, cfg: LlamaConfig,
            inputs_embeds=None, return_hidden: bool = False,
            attn_mask=None, causal: bool = True):
    """Decoder forward over ``tokens [B, T]`` (or precomputed
    ``inputs_embeds [B, T, D]``, e.g. spliced audio features) appending to
    ``cache``.

    Returns (logits [B, T, V], cache). Left padding from prompt bucketing is
    masked via ``cache.valid_from`` (RoPE is relative under causal masking,
    so the absolute position shift is harmless). Without a cache,
    ``causal=False`` runs full bidirectional attention (NAR diffusion LMs,
    e.g. OmniVoice) and ``attn_mask`` ([..., q, k] boolean) can exclude
    padded positions.
    """
    p = params["model"] if "model" in params else params
    n_heads = cfg.num_attention_heads
    n_kv = cfg.num_key_value_heads
    hd = cfg.resolved_head_dim
    if inputs_embeds is not None:
        x = inputs_embeds
        b, t = x.shape[:2]
    else:
        b, t = tokens.shape
        x = nn.embedding(p["embed_tokens"], tokens)
    if cfg.embedding_multiplier != 1.0:
        x = x * cfg.embedding_multiplier
    offset = cache.offset if cache is not None else 0
    positions = offset + jnp.arange(t)
    cos, sin = _rope_tables(cfg, positions)

    mask = kv_cache.attention_mask(cache, t) if cache is not None else None
    offset0 = cache.offset if cache is not None else None
    cache_xs, cache_update, cache_fold = kv_cache.make_layer_updater(cache)
    stacked = not _is_per_layer_dict(p["layers"])

    def attn_mlp(x, lp, kv_update):
        return layer_forward(x, lp, cfg, cos, sin, mask=mask,
                             attn_mask=attn_mask, causal=causal,
                             kv_update=kv_update)

    if stacked:
        # scan over the stacked layer axis: one compiled layer body
        # regardless of depth; cache buffers ([L, ...]) ride as xs/ys —
        # dense/int8/int4/hybrid handling lives in kv_cache.make_layer_updater
        def layer(x, xs):
            lp, cache_l = xs
            written = []

            def kv_update(k, v):
                new_l, k_full, v_full = cache_update(
                    cache_l, offset0, k, v, x.dtype)
                written.append(new_l)
                return k_full, v_full

            x = attn_mlp(x, lp, kv_update if cache_l is not None else None)
            return x, (written[0] if written else None)

        xs = (p["layers"], cache_xs)
        # NOTE: measured on v5e — unroll>1 here REGRESSES decode 2.4x
        # (unroll=4: 32 tok/s vs 79 tok/s on an Orpheus-3B-shaped decode);
        # the bigger body defeats XLA's in-place scan buffer reuse. Keep
        # the plain scan.
        x, cache_ys = jax.lax.scan(layer, x, xs)
        if cache is not None:
            cache = cache_fold(cache, cache_ys)
    else:
        # per-layer dict path: kept for heterogeneous checkpoints
        # (e.g. per-layer quantization configs, LlamaTTS.swift:959-969)
        for i in range(cfg.num_hidden_layers):
            lp = p["layers"][str(i)]
            if cache is not None:
                def kv_update(k, v, _i=i):
                    nonlocal cache
                    cache, k_full, v_full = kv_cache.update_cache(cache, _i, k, v)
                    return k_full, v_full
            else:
                kv_update = None
            x = attn_mlp(x, lp, kv_update)

    x = nn.rms_norm(p["norm"], x, cfg.rms_norm_eps)
    if cache is not None:
        cache = cache._replace(offset=cache.offset + t)
    if return_hidden:
        return x, cache
    if "lm_head" in params and not cfg.tie_word_embeddings:
        logits = nn.linear(params["lm_head"], x)
    else:
        logits = nn.embedding_as_linear(p["embed_tokens"], x)
    if cfg.logits_scaling != 1.0:
        logits = logits / cfg.logits_scaling
    return logits, cache


def make_cache(cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16,
               valid_from: int = 0, kv_bits: int | None = None,
               kv_group_size: int = 64, quantized_kv_start: int = 0):
    """Cache factory honoring the reference's kvBits/kvGroupSize/
    quantizedKVStart knobs (Generation.swift:14-19). With a multi-token
    prefill and ``quantized_kv_start > 0``, pass
    ``quantized_kv_start=max(start, prefill_len)`` so the prefill write does
    not straddle the dense/quant boundary."""
    return kv_cache.make_cache_for(
        cfg.num_hidden_layers, batch, cfg.num_key_value_heads,
        cfg.resolved_head_dim, max_len, dtype, valid_from,
        kv_bits=kv_bits, kv_group_size=kv_group_size,
        quantized_kv_start=quantized_kv_start,
    )


def sanitize(weights: dict[str, np.ndarray], cfg: LlamaConfig) -> dict:
    """Drop rotary inv_freq buffers; drop lm_head when embeddings are tied
    (reference LlamaTTS.sanitize, LlamaTTS.swift:583-593)."""
    out = {}
    for k, v in weights.items():
        if "self_attn.rotary_emb.inv_freq" in k:
            continue
        if cfg.tie_word_embeddings and k == "lm_head.weight":
            continue
        out[k] = v
    return out


def init_random_params(cfg: LlamaConfig, seed: int = 0, dtype=jnp.bfloat16,
                       on_device: bool = False) -> dict:
    """Random params in HF layout, for benchmarks/fixtures.

    ``on_device=True`` generates directly with ``jax.random`` — on
    tunneled TPU backends, host-generating a 3B tree and uploading it
    takes minutes; on-device generation takes seconds."""
    d, ffn, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    hd = cfg.resolved_head_dim

    if on_device:
        key_holder = [jax.random.PRNGKey(seed)]

        def rand(*shape):
            key_holder[0], sub = jax.random.split(key_holder[0])
            return jax.random.normal(sub, shape, dtype) * 0.02
    else:
        rng = np.random.default_rng(seed)

        def rand(*shape):
            return rng.standard_normal(shape, dtype=np.float32) * 0.02

    # stacked scan-over-layers layout: every layer leaf leads with [L]
    n = cfg.num_hidden_layers
    attn = {
        "q_proj": {"weight": rand(n, cfg.num_attention_heads * hd, d)},
        "k_proj": {"weight": rand(n, cfg.num_key_value_heads * hd, d)},
        "v_proj": {"weight": rand(n, cfg.num_key_value_heads * hd, d)},
        "o_proj": {"weight": rand(n, d, cfg.num_attention_heads * hd)},
    }
    if cfg.qk_norm:
        attn["q_norm"] = {"weight": np.ones((n, hd), np.float32)}
        attn["k_norm"] = {"weight": np.ones((n, hd), np.float32)}
    layers = {
        "input_layernorm": {"weight": np.ones((n, d), np.float32)},
        "self_attn": attn,
        "post_attention_layernorm": {"weight": np.ones((n, d), np.float32)},
        "mlp": {
            "gate_proj": {"weight": rand(n, ffn, d)},
            "up_proj": {"weight": rand(n, ffn, d)},
            "down_proj": {"weight": rand(n, d, ffn)},
        },
    }
    params = {
        "model": {
            "embed_tokens": {"weight": rand(v, d)},
            "layers": layers,
            "norm": {"weight": np.ones((d,), np.float32)},
        }
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"weight": rand(v, d)}
    # cast on HOST first: transferring fp32 then casting would peak at
    # 3x the bf16 footprint on device and OOM large configs
    np_dtype = np.dtype(dtype)

    def _to_device(v):
        if np.issubdtype(v.dtype, np.floating):
            v = v.astype(np_dtype)
        return jnp.asarray(v)

    return jax.tree.map(_to_device, params)
