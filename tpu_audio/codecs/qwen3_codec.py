"""Qwen3-TTS speech tokenizer decoder: split-RVQ -> causal-conv/transformer
token-to-waveform stack with true streaming decode.

TPU-first rebuild of the reference
(Sources/MLXAudioTTS/Models/Qwen3TTS/Qwen3TTSSpeechTokenizer.swift):
SplitResidualVectorQuantizer decode (:91-120), causal convolutions with
stream buffers (:132-234), SnakeBeta (:236-253), ConvNeXt upsample blocks
(:257-298, :751-789), a pre-transformer with layer-scale and rope (:352-503),
and the BigVGAN-style causal decoder stack (:505-720) with
``streamingStep`` incremental decode (:979-1050).

TPU design: streaming state is an explicit fixed-shape pytree (zero-filled
conv history buffers + transposed-conv overlap tails + a KV cache), so the
whole ``streaming_step(chunk)`` is ONE jitted graph per chunk size — the
reference mutates module-held optional buffers host-side instead.
Activations are channels-last [B, T, C].
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import kv_cache, nn
from tpu_audio.core.jitting import ajit

__all__ = ["Qwen3CodecDecoderConfig", "Qwen3CodecDecoder"]


@dataclass
class Qwen3CodecDecoderConfig:
    hidden_size: int = 1024
    intermediate_size: int = 3072
    num_hidden_layers: int = 8
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    head_dim: int = 64
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    max_position_embeddings: int = 8000
    attention_bias: bool = False
    latent_dim: int = 1024
    codebook_dim: int = 512
    codebook_size: int = 2048
    decoder_dim: int = 1536
    num_quantizers: int = 16
    num_semantic_quantizers: int = 1
    upsample_rates: tuple = (8, 5, 4, 3)
    upsampling_ratios: tuple = (2, 2)
    layer_scale_initial_scale: float = 0.01
    sampling_rate: int = 24000

    @property
    def total_upsample(self) -> int:
        return int(np.prod(self.upsample_rates)) * int(np.prod(self.upsampling_ratios))

    @classmethod
    def from_dict(cls, d: dict) -> "Qwen3CodecDecoderConfig":
        keys = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in d.items() if k in keys}
        for k in ("upsample_rates", "upsampling_ratios"):
            if k in kw:
                kw[k] = tuple(kw[k])
        return cls(**kw)


# ---------------------------------------------------------------------------
# RVQ decode
# ---------------------------------------------------------------------------


def _codebook_embed(p: dict) -> jnp.ndarray:
    if "embed" in p:
        return p["embed"]
    if "embedding" in p:
        return p["embedding"]
    # EMA codebooks store sums + usage counts
    return p["embedding_sum"] / jnp.maximum(p["cluster_usage"], 1e-5)[:, None]


def _rvq_decode(p, codes, n_q: int):
    """codes [B, n_q, T] -> latent [B, T, dim] for one ResidualVectorQuantizer
    (input/output 1x1 conv projections in torch layout)."""
    total = None
    for i in range(n_q):
        lp = p["vq"]["layers"][str(i)]
        emb = _codebook_embed(lp["codebook"])[codes[:, i]]  # [B, T, cb_dim]
        if "project_out" in lp:
            emb = nn.linear(lp["project_out"], emb)
        total = emb if total is None else total + emb
    if "output_proj" in p:
        total = nn.conv1d(p["output_proj"], total)
    return total


def quantizer_decode(p, codes, cfg: Qwen3CodecDecoderConfig):
    """Split RVQ: first n_semantic quantizers + the rest
    (SplitResidualVectorQuantizer.decode)."""
    ns = cfg.num_semantic_quantizers
    out = _rvq_decode(p["rvq_first"], codes[:, :ns], ns)
    if codes.shape[1] > ns:
        out = out + _rvq_decode(p["rvq_rest"], codes[:, ns:], codes.shape[1] - ns)
    return out  # [B, T, codebook_dim]


# ---------------------------------------------------------------------------
# Causal conv primitives with explicit stream state
# ---------------------------------------------------------------------------


def causal_conv(p, x, kernel: int, dilation: int = 1, groups: int = 1):
    """Full-sequence causal conv on [B, T, C] (left pad = k_eff - 1)."""
    pad = (kernel - 1) * dilation
    x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
    return nn.conv1d(p, x, dilation=dilation, groups=groups)


def causal_conv_step(p, x, buf, kernel: int, dilation: int = 1, groups: int = 1):
    """Streaming causal conv: ``buf`` holds the last ``(k-1)*d`` inputs."""
    h = jnp.concatenate([buf, x], axis=1)
    y = nn.conv1d(p, h, dilation=dilation, groups=groups)
    pad = (kernel - 1) * dilation
    new_buf = h[:, h.shape[1] - pad:]
    return y, new_buf


def causal_conv_state(batch: int, channels: int, kernel: int,
                      dilation: int = 1, dtype=jnp.float32):
    return jnp.zeros((batch, (kernel - 1) * dilation, channels), dtype)


def causal_convt(p, x, kernel: int, stride: int):
    """Causal transposed conv: full conv then trim ``k - stride`` from the
    right (CausalTransposeConv1d)."""
    y = nn.conv_transpose1d(p, x, stride=stride, padding=0)
    trim = kernel - stride
    return y[:, : y.shape[1] - trim] if trim > 0 else y


def causal_convt_step(p, x, overflow, kernel: int, stride: int):
    """Streaming transposed conv with overlap-add tail carry
    (DecoderBlockUpsample.step). The carried tail excludes the bias so the
    overlap positions don't count it twice — exact parity with the
    full-sequence decode (the reference's step carries the biased tail,
    DecoderBlockUpsample.step, which drifts when bias != 0)."""
    y = nn.conv_transpose1d(p, x, stride=stride, padding=0)  # [B, t*s + trim, C]
    trim = kernel - stride
    if trim == 0:
        return y, overflow
    y = y.at[:, : overflow.shape[1]].add(overflow)
    emit = y[:, : y.shape[1] - trim]
    new_overflow = y[:, y.shape[1] - trim:]
    if "bias" in p:
        new_overflow = new_overflow - p["bias"].astype(y.dtype)
    return emit, new_overflow


def snake_beta(p, x):
    """x + sin^2(x * e^alpha) / (e^beta + eps), per channel (SnakeBeta)."""
    a = jnp.exp(p["alpha"]).astype(x.dtype)
    b = jnp.exp(p["beta"]).astype(x.dtype)
    s = jnp.sin(x * a)
    return x + (1.0 / (b + 1e-9)) * s * s


# ---------------------------------------------------------------------------
# ConvNeXt + upsample layers
# ---------------------------------------------------------------------------


def _convnext(p, x, state=None):
    res = x
    if state is None:
        h = causal_conv(p["dwconv"]["conv"], x, 7, groups=x.shape[-1])
    else:
        h, state = causal_conv_step(p["dwconv"]["conv"], x, state, 7,
                                    groups=x.shape[-1])
    h = nn.layer_norm(p["norm"], h, eps=1e-6)
    h = nn.gelu(nn.linear(p["pwconv1"], h))
    h = p["gamma"].astype(h.dtype) * nn.linear(p["pwconv2"], h)
    return res + h, state


def _residual_unit(p, x, dilation: int, state=None):
    h = snake_beta(p["act1"], x)
    if state is None:
        h = causal_conv(p["conv1"]["conv"], h, 7, dilation=dilation)
        h = snake_beta(p["act2"], h)
        h = causal_conv(p["conv2"]["conv"], h, 1)
        return x + h, None
    s1, s2 = state
    h, s1 = causal_conv_step(p["conv1"]["conv"], h, s1, 7, dilation=dilation)
    h = snake_beta(p["act2"], h)
    h = causal_conv(p["conv2"]["conv"], h, 1)  # k=1: stateless
    return x + h, (s1, s2)


# ---------------------------------------------------------------------------
# Pre-transformer (DecoderTransformer)
# ---------------------------------------------------------------------------


def _decoder_transformer(p, x, cfg: Qwen3CodecDecoderConfig, cache=None):
    h = nn.linear(p["input_proj"], x)
    b, t, _ = h.shape
    offset = cache.offset if cache is not None else 0
    positions = offset + jnp.arange(t)
    cos, sin = nn.rope(positions, cfg.head_dim, cfg.rope_theta)
    n_heads, n_kv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                         cfg.head_dim)
    scale = p.get("_layer_scale", None)
    for i in range(cfg.num_hidden_layers):
        lp = p["layers"][str(i)]
        hn = nn.rms_norm(lp["input_layernorm"], h, cfg.rms_norm_eps)
        ap = lp["self_attn"]
        q = nn.linear(ap["q_proj"], hn).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
        k = nn.linear(ap["k_proj"], hn).reshape(b, t, n_kv, hd).transpose(0, 2, 1, 3)
        v = nn.linear(ap["v_proj"], hn).reshape(b, t, n_kv, hd).transpose(0, 2, 1, 3)
        q = nn.apply_rope(q, cos, sin)
        k = nn.apply_rope(k, cos, sin)
        if cache is not None:
            cache, k_full, v_full = kv_cache.update_cache(cache, i, k, v)
            mask = kv_cache.attention_mask(cache, t)
            o = nn.sdpa(q, k_full, v_full, mask=mask)
        else:
            o = nn.sdpa(q, k, v, is_causal=True)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, n_heads * hd)
        o = nn.linear(ap["o_proj"], o)
        h = h + lp["self_attn_layer_scale"]["scale"].astype(h.dtype) * o
        m = nn.rms_norm(lp["post_attention_layernorm"], h, cfg.rms_norm_eps)
        mp = lp["mlp"]
        m = nn.linear(mp["down_proj"],
                      nn.silu(nn.linear(mp["gate_proj"], m)) * nn.linear(mp["up_proj"], m))
        h = h + lp["mlp_layer_scale"]["scale"].astype(h.dtype) * m
    h = nn.rms_norm(p["norm"], h, cfg.rms_norm_eps)
    out = nn.linear(p["output_proj"], h)
    if cache is not None:
        cache = cache._replace(offset=cache.offset + t)
    return out, cache


# ---------------------------------------------------------------------------
# Full decoder
# ---------------------------------------------------------------------------


def decoder_forward(params, codes, cfg: Qwen3CodecDecoderConfig, state=None):
    """codes [B, n_q, T] -> waveform [B, T * total_upsample].

    With ``state`` (from :func:`init_streaming_state`) this is the
    incremental ``streaming_step``; state threads through every causal conv.
    """
    p = params
    streaming = state is not None
    hidden = quantizer_decode(p["quantizer"], codes, cfg)  # [B, T, cb_dim]
    si = 0

    def conv_full_or_step(pp, x, kernel, dilation=1, groups=1):
        nonlocal si
        if not streaming:
            return causal_conv(pp, x, kernel, dilation, groups)
        y, state["convs"][si] = causal_conv_step(
            pp, x, state["convs"][si], kernel, dilation, groups)
        si += 1
        return y

    # NB: streaming conv-state consumption order must match init order below.
    hidden = conv_full_or_step(p["pre_conv"]["conv"], hidden, 3)
    if streaming:
        hidden, state["cache"] = _decoder_transformer(
            p["pre_transformer"], hidden, cfg, state["cache"])
    else:
        hidden, _ = _decoder_transformer(p["pre_transformer"], hidden, cfg)

    # upsample (CausalTransposeConv + ConvNeXt) per ratio
    oi = 0
    for u, factor in enumerate(cfg.upsampling_ratios):
        up = p["upsample"][str(u)]
        hidden = causal_convt(up["conv_t"]["conv"], hidden, factor, factor)
        if streaming:
            hidden, state["convnext"][u] = _convnext(up["convnext"], hidden,
                                                     state["convnext"][u])
        else:
            hidden, _ = _convnext(up["convnext"], hidden)

    # BigVGAN-style decoder stack
    d = p["decoder"]
    wav = conv_full_or_step(d["0"]["conv"], hidden, 7)
    n_blocks = len(cfg.upsample_rates)
    for bidx in range(n_blocks):
        bp = d[str(1 + bidx)]["block"]
        rate = cfg.upsample_rates[bidx]
        wav = snake_beta(bp["0"], wav)
        if streaming:
            wav, state["overflow"][bidx] = causal_convt_step(
                bp["1"]["conv"], wav, state["overflow"][bidx], 2 * rate, rate)
        else:
            wav = causal_convt(bp["1"]["conv"], wav, 2 * rate, rate)
        for j, dil in enumerate((1, 3, 9)):
            rp = bp[str(2 + j)]
            if streaming:
                key = (bidx, j)
                wav, state["resunits"][key] = _residual_unit(
                    rp, wav, dil, state["resunits"][key])
            else:
                wav, _ = _residual_unit(rp, wav, dil)
    wav = snake_beta(d[str(1 + n_blocks)], wav)
    wav = conv_full_or_step(d[str(2 + n_blocks)]["conv"], wav, 7)
    wav = jnp.clip(wav, -1.0, 1.0)[..., 0]  # [B, T_out]
    return (wav, state) if streaming else wav


def init_streaming_state(cfg: Qwen3CodecDecoderConfig, batch: int = 1,
                         max_frames: int = 4096, dtype=jnp.float32):
    """Zero-initialized stream state: conv history buffers, transposed-conv
    overlap tails, ConvNeXt/res-unit buffers, transformer KV cache."""
    convs = [
        causal_conv_state(batch, cfg.codebook_dim, 3, dtype=dtype),  # pre_conv
        causal_conv_state(batch, cfg.latent_dim, 7, dtype=dtype),    # decoder.0
        causal_conv_state(
            batch, cfg.decoder_dim // (1 << len(cfg.upsample_rates)), 7,
            dtype=dtype),                                            # out conv
    ]
    convnext = [causal_conv_state(batch, cfg.latent_dim, 7, dtype=dtype)
                for _ in cfg.upsampling_ratios]
    overflow = [
        jnp.zeros((batch, rate, cfg.decoder_dim // (1 << (i + 1))), dtype)
        for i, rate in enumerate(cfg.upsample_rates)
    ]
    resunits = {}
    for i in range(len(cfg.upsample_rates)):
        dim = cfg.decoder_dim // (1 << (i + 1))
        for j, dil in enumerate((1, 3, 9)):
            resunits[(i, j)] = (
                causal_conv_state(batch, dim, 7, dil, dtype),
                None,
            )
    cache = kv_cache.init_cache(
        cfg.num_hidden_layers, batch, cfg.num_key_value_heads, cfg.head_dim,
        max_frames, dtype,
    )
    return {"convs": convs, "convnext": convnext, "overflow": overflow,
            "resunits": resunits, "cache": cache}


def init_random_params(cfg: Qwen3CodecDecoderConfig, seed: int = 0,
                       dtype=jnp.float32, on_device: bool = False) -> dict:
    """Random decoder params in the post-load tree layout, for benchmarks
    (key set mirrors the HF speech_tokenizer export; see
    tests/fixtures.make_qwen3_tts_fixture speech-tokenizer section).
    ``on_device=True`` generates with ``jax.random``."""
    if on_device:
        holder = [jax.random.PRNGKey(seed + 31)]

        def rand(*shape, scale=0.05):
            holder[0], sub = jax.random.split(holder[0])
            return jax.random.normal(sub, shape, dtype) * scale
    else:
        nprng = np.random.default_rng(seed + 31)

        def rand(*shape, scale=0.05):
            return jnp.asarray(
                nprng.standard_normal(shape, dtype=np.float32) * scale, dtype)

    def lin(o, i, bias=True):
        p = {"weight": rand(o, i)}
        if bias:
            p["bias"] = rand(o, scale=0.01)
        return p

    def conv(o, i, k, bias=True, transpose=False):
        p = {"weight": rand(*((i, o, k) if transpose else (o, i, k)))}
        if bias:
            p["bias"] = rand(o, scale=0.01)
        return {"conv": p}

    H, L, CB, CV = (cfg.hidden_size, cfg.latent_dim, cfg.codebook_dim,
                    cfg.codebook_size)
    vq_dim = CB // 2

    def rvq(n):
        return {
            "vq": {"layers": {str(i): {"codebook": {"embed": rand(CV, vq_dim,
                                                                  scale=0.5)}}
                              for i in range(n)}},
            "output_proj": {"weight": rand(CB, vq_dim, 1)},
        }

    ns = cfg.num_semantic_quantizers
    quantizer = {"rvq_first": rvq(ns),
                 "rvq_rest": rvq(cfg.num_quantizers - ns)}

    def ones(*shape):
        return jnp.ones(shape, dtype)

    def tf_layer():
        qd = cfg.num_attention_heads * cfg.head_dim
        kd = cfg.num_key_value_heads * cfg.head_dim
        return {
            "input_layernorm": {"weight": ones(H)},
            "post_attention_layernorm": {"weight": ones(H)},
            "self_attn": {"q_proj": lin(qd, H, bias=False),
                          "k_proj": lin(kd, H, bias=False),
                          "v_proj": lin(kd, H, bias=False),
                          "o_proj": lin(H, qd, bias=False)},
            "self_attn_layer_scale": {
                "scale": jnp.full((H,), cfg.layer_scale_initial_scale, dtype)},
            "mlp_layer_scale": {
                "scale": jnp.full((H,), cfg.layer_scale_initial_scale, dtype)},
            "mlp": {"gate_proj": lin(cfg.intermediate_size, H, bias=False),
                    "up_proj": lin(cfg.intermediate_size, H, bias=False),
                    "down_proj": lin(H, cfg.intermediate_size, bias=False)},
        }

    pre_transformer = {
        "input_proj": lin(H, H),
        "output_proj": lin(L, H),
        "norm": {"weight": ones(H)},
        "layers": {str(i): tf_layer() for i in range(cfg.num_hidden_layers)},
    }

    def snake(c):
        return {"alpha": jnp.zeros((c,), dtype), "beta": jnp.zeros((c,), dtype)}

    upsample = {}
    for u, factor in enumerate(cfg.upsampling_ratios):
        upsample[str(u)] = {
            "conv_t": conv(L, L, factor, transpose=True),
            "convnext": {
                "dwconv": conv(L, 1, 7),  # depthwise: groups == channels
                "norm": {"weight": ones(L), "bias": jnp.zeros((L,), dtype)},
                "pwconv1": lin(4 * L, L),
                "pwconv2": lin(L, 4 * L),
                "gamma": jnp.full((L,), 1e-6, dtype),
            },
        }

    D = cfg.decoder_dim
    decoder = {"0": conv(D, L, 7)}
    ch = D
    for b, rate in enumerate(cfg.upsample_rates):
        out = ch // 2
        block = {"0": snake(ch), "1": conv(out, ch, 2 * rate, transpose=True)}
        for j in range(3):
            block[str(2 + j)] = {
                "act1": snake(out), "conv1": conv(out, out, 7),
                "act2": snake(out), "conv2": conv(out, out, 1),
            }
        decoder[str(1 + b)] = {"block": block}
        ch = out
    n_blocks = len(cfg.upsample_rates)
    decoder[str(1 + n_blocks)] = snake(ch)
    decoder[str(2 + n_blocks)] = conv(1, ch, 7)

    return {"quantizer": quantizer, "pre_conv": conv(H, CB, 3),
            "pre_transformer": pre_transformer, "upsample": upsample,
            "decoder": decoder}


class Qwen3CodecDecoder:
    """Stateful wrapper: offline ``decode`` + chunked ``streaming`` decode."""

    def __init__(self, config: Qwen3CodecDecoderConfig, params,
                 dtype=jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        self.sample_rate = config.sampling_rate
        self._decode = ajit(
            functools.partial(decoder_forward, cfg=config))
        self._step = ajit(
            lambda p, codes, state: decoder_forward(p, codes, config, state))
        self._stream_state = None

    def decode(self, codes) -> jnp.ndarray:
        """codes [B, n_q, T] -> [B, T * upsample]."""
        return self._decode(self.params, jnp.asarray(codes))

    def reset_streaming_state(self, batch: int = 1, max_frames: int = 4096):
        self._stream_state = init_streaming_state(
            self.config, batch, max_frames, self.dtype)

    def streaming_step(self, codes) -> jnp.ndarray:
        if self._stream_state is None:
            self.reset_streaming_state(batch=np.asarray(codes).shape[0])
        wav, self._stream_state = self._step(
            self.params, jnp.asarray(codes), self._stream_state)
        return wav


# ---------------------------------------------------------------------------
# Speech tokenizer ENCODER (ref-audio ICL): Mimi-architecture SEANet encoder
# + windowed-rope transformer + downsample + split RVQ encode
# (Qwen3TTSSpeechTokenizer.swift:793-880 Qwen3TTSSpeechTokenizerEncoder).
# The architecture is identical to Mimi's encoder, so the compute functions
# are shared with tpu_audio.codecs.mimi; only the config plumbing and the
# HF-checkpoint weight mapping are Qwen3-specific.
# ---------------------------------------------------------------------------


def encoder_config_from_dict(d: dict):
    """Build a MimiConfig for the speech tokenizer's ``encoder_config``
    section (Qwen3TTSConfig.swift:391-494 key set + defaults)."""
    from tpu_audio.codecs.mimi import MimiConfig, SeanetConfig, TransformerConfig

    e = d.get("encoder_config", {}) or {}
    seanet = SeanetConfig(
        dimension=e.get("hidden_size", 512),
        channels=e.get("audio_channels", 1),
        nfilters=e.get("num_filters", 64),
        nresidual_layers=e.get("num_residual_layers", 1),
        ratios=tuple(e.get("upsampling_ratios", (8, 6, 5, 4))),
        ksize=e.get("kernel_size", 7),
        residual_ksize=e.get("residual_kernel_size", 3),
        last_ksize=e.get("last_kernel_size", 3),
        dilation_base=e.get("dilation_growth_rate", 2),
        compress=e.get("compress", 2),
    )
    transformer = TransformerConfig(
        d_model=e.get("hidden_size", 512),
        num_heads=e.get("num_attention_heads", 8),
        num_layers=e.get("num_hidden_layers", 8),
        layer_scale=e.get("layer_scale_initial_scale", 0.01),
        context=e.get("sliding_window", 250),
        max_period=e.get("rope_theta", 10000.0),
        dim_feedforward=e.get("intermediate_size", 2048),
    )
    return MimiConfig(
        channels=e.get("audio_channels", 1),
        sample_rate=e.get("sampling_rate", 24000),
        frame_rate=e.get("frame_rate", 12.5),
        seanet=seanet,
        transformer=transformer,
        quantizer_nq=e.get("num_quantizers", 32),
        quantizer_bins=e.get("codebook_size", 2048),
        quantizer_dim=e.get("codebook_dim", 256),
    )


def sanitize_encoder(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Map HF qwen3 speech-tokenizer encoder weights onto the mimi param
    tree consumed by tpu_audio.codecs.mimi (layer tables from
    Qwen3TTSSpeechTokenizer.swift:1099-1108, name mapping :1240-1370).
    Torch conv layouts [O, I, K] are kept (our convs are torch-layout)."""
    conv_map = {0: "encoder.init_conv1d", 3: "encoder.layers.0.downsample",
                6: "encoder.layers.1.downsample", 9: "encoder.layers.2.downsample",
                12: "encoder.layers.3.downsample", 14: "encoder.final_conv1d"}
    residual_layer = {1: 0, 4: 1, 7: 2, 10: 3}
    residual_block = {1: 0, 3: 1}

    out: dict[str, np.ndarray] = {}
    qkv: dict[int, dict[str, np.ndarray]] = {}

    def strip(key: str) -> str:
        for pre in ("speech_tokenizer.", "encoder_model.", "decoder_model."):
            while key.startswith(pre):
                key = key[len(pre):]
        return key

    for raw, v in flat.items():
        k = strip(raw)
        if not k.startswith("encoder."):
            continue
        if "codebook.initialized" in k or k.endswith("codebook.embed"):
            continue
        if k.startswith("encoder.encoder.layers."):
            parts = k.split(".")
            n = int(parts[3])
            if ".block." in k and n in residual_layer:
                li = residual_layer[n]
                bi = residual_block.get(int(parts[5]))
                if bi is None:
                    continue
                # suffix already carries the trailing "conv.weight" level
                suffix = ".".join(parts[6:])
                out[f"encoder.layers.{li}.residuals.0.block.{bi}.conv.{suffix}"] = v
            elif n in conv_map:
                suffix = ".".join(parts[4:])
                out[f"{conv_map[n]}.conv.{suffix}"] = v
            continue
        if (k.startswith("encoder.encoder_transformer.layers.")
                or k.startswith("encoder.encoder_transformer.transformer.layers.")):
            parts = k.split(".")
            off = 4 if parts[2] == "transformer" else 3
            li = int(parts[off])
            suffix = ".".join(parts[off + 1:])
            base = f"encoder_transformer.transformer.layers.{li}"
            if "self_attn.q_proj.weight" in suffix:
                qkv.setdefault(li, {})["q"] = v
            elif "self_attn.k_proj.weight" in suffix:
                qkv.setdefault(li, {})["k"] = v
            elif "self_attn.v_proj.weight" in suffix:
                qkv.setdefault(li, {})["v"] = v
            elif "self_attn.qkv.weight" in suffix:
                third = v.shape[0] // 3
                qkv.setdefault(li, {}).update(
                    q=v[:third], k=v[third:2 * third], v=v[2 * third:])
            elif ("self_attn.out_proj.weight" in suffix
                  or "self_attn.o_proj.weight" in suffix):
                out[f"{base}.self_attn.out_proj.weight"] = v
            elif "mlp.fc1.weight" in suffix:
                out[f"{base}.gating.linear1.weight"] = v
            elif "mlp.fc2.weight" in suffix:
                out[f"{base}.gating.linear2.weight"] = v
            elif "input_layernorm." in suffix:
                out[f"{base}.norm1.{suffix.rsplit('.', 1)[1]}"] = v
            elif "post_attention_layernorm." in suffix:
                out[f"{base}.norm2.{suffix.rsplit('.', 1)[1]}"] = v
            elif "self_attn_layer_scale.scale" in suffix:
                out[f"{base}.layer_scale_1.scale"] = v
            elif "mlp_layer_scale.scale" in suffix:
                out[f"{base}.layer_scale_2.scale"] = v
            continue
        if k.startswith("encoder.downsample."):
            out["downsample.conv.conv." + k[len("encoder.downsample."):]] = v
            continue
        if k.startswith("encoder.quantizer."):
            rest = k[len("encoder.quantizer."):]
            part = ("rvq_first"
                    if ("semantic_residual_vector_quantizer" in rest
                        or rest.startswith("rvq_first."))
                    else "rvq_rest")
            if "input_proj.weight" in rest or "output_proj.weight" in rest:
                proj = "input_proj" if "input_proj" in rest else "output_proj"
                out[f"quantizer.{part}.{proj}.weight"] = v
                continue
            if ".layers." in rest and (".codebook." in rest or "._codebook." in rest):
                li = rest.split(".layers.")[1].split(".")[0]
                field_name = rest.rsplit(".", 1)[1]
                if field_name == "embed_sum":
                    field_name = "embedding_sum"
                if field_name in ("embedding_sum", "cluster_usage"):
                    out[f"quantizer.{part}.vq.layers.{li}.codebook.{field_name}"] = v
            continue

    for li, d3 in qkv.items():
        if {"q", "k", "v"} <= set(d3):
            out[f"encoder_transformer.transformer.layers.{li}"
                ".self_attn.in_proj.weight"] = np.concatenate(
                    [d3["q"], d3["k"], d3["v"]], axis=0)
    return out


class Qwen3CodecEncoder:
    """Speech tokenizer encoder: waveform -> [1, n_valid_q, frames] codes
    (Qwen3TTSSpeechTokenizerEncoder.encode, :872-880). Runs as one jitted
    graph (SEANet + transformer + downsample + RVQ nearest-codebook search)."""

    def __init__(self, mimi_config, params, valid_num_quantizers: int = 16,
                 dtype=jnp.float32):
        from tpu_audio.codecs.mimi import encode_forward

        self.config = mimi_config
        self.params = params
        self.valid_num_quantizers = valid_num_quantizers
        self.dtype = dtype
        self._encode = ajit(functools.partial(encode_forward,
                                                 cfg=mimi_config))

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def encode(self, audio) -> jnp.ndarray:
        """waveform [T] / [B, T] -> codes [B, n_valid_q, frames]."""
        x = jnp.asarray(audio, self.dtype)
        if x.ndim == 1:
            x = x[None]
        codes = self._encode(self.params, x[..., None])
        return codes[:, : self.valid_num_quantizers]
