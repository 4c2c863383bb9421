"""IndexTTS: conformer-perceiver conditioned GPT-2 + conditioned BigVGAN.

TPU-first rebuild of the reference
(Sources/MLXAudioTTS/Models/IndexTTS/*): reference audio is encoded by a
rel-pos conformer (IndexTTSModules.swift:478-513) and resampled to a fixed
number of conditioning latents by a perceiver (IndexTTSModules.swift:124-169);
a GPT-2 decodes mel tokens autoregressively over [conditioning | text]
embeddings with learned positional tables (IndexTTSModules.swift:719-767);
the per-step GPT latents (not the token ids) drive a BigVGAN vocoder that is
FiLM-conditioned on an ECAPA-TDNN speaker embedding at every upsampling
stage (IndexTTSBigVGAN.swift:131-163).

TPU design deltas: the whole mel-token generation (GPT step + sampling +
stop detection + latent collection) runs as one jitted ``lax.while_loop``
writing into fixed [budget, D] buffers — the reference syncs the host per
token (IndexTTSModules.swift:744-761). BigVGAN AMP blocks and the ECAPA
backbone are shared with tpu_audio.codecs.bigvgan / models.lid.ecapa_lid.
"""

from __future__ import annotations

import functools
import math
import re
import time
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.codecs import bigvgan as bigvgan_mod
from tpu_audio.core import dsp, hub, kv_cache, loading, nn
from tpu_audio.core.generation import (
    AudioGenerateParameters,
    AudioGeneration,
    AudioGenerationError,
    AudioGenerationInfo,
)
from tpu_audio.models.lid.ecapa_lid import EcapaConfig, ecapa_backbone_forward
from tpu_audio.core.jitting import ajit

__all__ = ["IndexTTS", "IndexTTSConfig", "normalize_text",
           "tokenize_by_cjk_char"]


# ---------------------------------------------------------------------------
# Configs (IndexTTSConfig.swift)
# ---------------------------------------------------------------------------


@dataclass
class IndexTTSConformerConfig:
    input_size: int = 100
    output_size: int = 256
    num_blocks: int = 6
    linear_units: int = 2048
    attention_heads: int = 4
    pos_enc_layer_type: str = "rel_pos"
    input_layer: str = "conv2d"
    cnn_module_kernel: int = 15
    pos_emb_max_len: int = 2048
    use_bias: bool = True
    xscaling: bool = True
    macaron_style: bool = False
    perceiver_mult: int = 2

    @classmethod
    def from_dict(cls, d: dict) -> "IndexTTSConformerConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass
class IndexTTSGPTConfig:
    model_dim: int = 1024
    heads: int = 16
    layers: int = 20
    max_mel_tokens: int = 600
    max_text_tokens: int = 400
    number_text_tokens: int = 12000
    number_mel_codes: int = 8194
    start_mel_token: int = 8192
    stop_mel_token: int = 8193
    start_text_token: int = 0
    stop_text_token: int = 1
    use_mel_codes_as_input: bool = True
    mel_length_compression: int = 1024
    condition_type: str = "conformer_perceiver"
    condition_module: IndexTTSConformerConfig = field(
        default_factory=IndexTTSConformerConfig)
    max_conditioning_inputs: int = 1
    condition_num_latent: int = 32

    @classmethod
    def from_dict(cls, d: dict) -> "IndexTTSGPTConfig":
        keys = set(cls.__dataclass_fields__) - {"condition_module"}
        kw = {k: v for k, v in d.items() if k in keys}
        kw["condition_module"] = IndexTTSConformerConfig.from_dict(
            d.get("condition_module") or {})
        return cls(**kw)


@dataclass
class IndexTTSVocoderConfig:
    num_mels: int = 100
    upsample_rates: tuple = (8, 8, 2, 2)
    upsample_kernel_sizes: tuple = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock: str = "1"
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    activation: str = "snakebeta"
    snake_logscale: bool = True
    use_bias_at_final: bool = True
    use_tanh_at_final: bool = True
    gpt_dim: int = 1
    speaker_embedding_dim: int = 1
    cond_d_vector_in_each_upsampling_layer: bool = True

    @classmethod
    def from_dict(cls, d: dict) -> "IndexTTSVocoderConfig":
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

    def as_bigvgan(self) -> bigvgan_mod.BigVGANConfig:
        """Shared AMP-block/activation config for codecs.bigvgan reuse."""
        return bigvgan_mod.BigVGANConfig(
            num_mels=self.num_mels, upsample_rates=self.upsample_rates,
            upsample_kernel_sizes=self.upsample_kernel_sizes,
            upsample_initial_channel=self.upsample_initial_channel,
            resblock=self.resblock,
            resblock_kernel_sizes=self.resblock_kernel_sizes,
            resblock_dilation_sizes=self.resblock_dilation_sizes,
            activation=self.activation, snake_logscale=self.snake_logscale,
            use_bias_at_final=self.use_bias_at_final,
            use_tanh_at_final=self.use_tanh_at_final)


@dataclass
class IndexTTSConfig:
    gpt: IndexTTSGPTConfig = field(default_factory=IndexTTSGPTConfig)
    bigvgan: IndexTTSVocoderConfig = field(
        default_factory=IndexTTSVocoderConfig)
    tokenizer_name: str = ""
    sample_rate: int = 24000
    # optional ECAPA overrides; the reference hardwires channels=512
    # (IndexTTSBigVGAN.swift:114-129)
    speaker_encoder: dict = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "IndexTTSConfig":
        return cls(
            gpt=IndexTTSGPTConfig.from_dict(d.get("gpt") or {}),
            bigvgan=IndexTTSVocoderConfig.from_dict(d.get("bigvgan") or {}),
            tokenizer_name=d.get("tokenizer_name", ""),
            sample_rate=d.get("sample_rate", 24000),
            speaker_encoder=d.get("speaker_encoder") or {})


# ---------------------------------------------------------------------------
# Text normalization (IndexTTSTextNormalizer, IndexTTSModel.swift:31-323)
# ---------------------------------------------------------------------------

_CHAR_MAP = [
    ("：", ","), ("；", ","), (";", ","), ("，", ","),
    ("。", "."), ("！", "!"), ("？", "?"), ("\n", " "),
    ("·", "-"), ("、", ","), ("...", "…"), (",,,", "…"),
    ("“", "'"), ("”", "'"), ('"', "'"), ("（", "'"),
    ("）", "'"), ("(", "'"), (")", "'"), ("《", "'"), ("》", "'"),
    ("【", "'"), ("】", "'"), ("[", "'"), ("]", "'"), ("—", "-"),
    ("～", "-"), ("~", "-"), ("「", "'"), ("」", "'"), (":", ","),
]

_ONES = ["", "one", "two", "three", "four", "five", "six", "seven", "eight",
         "nine"]
_TEENS = ["ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
          "sixteen", "seventeen", "eighteen", "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]
_THOUSANDS = ["", "thousand", "million", "billion", "trillion"]

_PINYIN = re.compile(
    r"(?<![a-z])((?:[bpmfdtnlgkhjqxzcsryw]|[zcs]h)?"
    r"(?:[aeiouüv]|[ae]i|u[aio]|ao|ou|i[aue]|[uüv]e|"
    r"[uvü]ang?|uai|[aeiuv]n|[aeio]ng|ia[no]|i[ao]ng)|ng|er)([1-5])",
    re.IGNORECASE)


def _number_to_words(n: int) -> str:
    if n == 0:
        return "zero"

    def hundreds(v: int) -> str:
        if v == 0:
            return ""
        if v < 10:
            return _ONES[v]
        if v < 20:
            return _TEENS[v - 10]
        if v < 100:
            return _TENS[v // 10] + ("" if v % 10 == 0
                                     else f" {_ONES[v % 10]}")
        return (f"{_ONES[v // 100]} hundred"
                + ("" if v % 100 == 0 else f" {hundreds(v % 100)}"))

    groups = []
    gi = 0
    while n > 0 and gi < len(_THOUSANDS):
        g = n % 1000
        if g:
            label = _THOUSANDS[gi]
            groups.append(hundreds(g) + (f" {label}" if label else ""))
        n //= 1000
        gi += 1
    return " ".join(reversed(groups))


def _expand_contractions(text: str) -> str:
    return re.sub(
        r"(what|where|who|which|how|t?here|it|s?he|that|this)'s",
        lambda m: f"{m.group(1)} is", text, flags=re.IGNORECASE)


def _replace_chars(text: str, char_map) -> str:
    for old, new in char_map:
        text = text.replace(old, new)
    return text


def _has_chinese(text: str) -> bool:
    return any(0x4E00 <= ord(c) <= 0x9FFF for c in text)


def normalize_text(text: str) -> str:
    """English/Chinese normalization (IndexTTSModel.swift:92-140):
    contractions, $-amounts, digit runs, number->words, char map."""
    use_chinese = (_has_chinese(text) or not re.search(r"[A-Za-z]", text)
                   or _PINYIN.search(text) is not None)
    if use_chinese:
        result = _expand_contractions(text.rstrip())
        result = _PINYIN.sub(
            lambda m: (m.group(0)[:1] + "v" + m.group(0)[2:]).upper()
            if m.group(0)[0] in "JQXjqx" and len(m.group(0)) > 1
            and m.group(0)[1] in "uUüÜ" else m.group(0).upper()
            if m.group(0)[0] in "JQXjqx" else m.group(0),
            result)
        return _replace_chars(result, [("$", ".")] + _CHAR_MAP)
    result = _expand_contractions(text)
    result = re.sub(
        r"\$\s*[0-9,.\s]+",
        lambda m: (lambda digits: f"{_number_to_words(int(digits))} dollar"
                   f"{'' if digits == '1' else 's'} "
                   if digits else m.group(0))(
            "".join(ch for ch in m.group(0) if ch.isdigit())),
        result).rstrip()
    result = re.sub(
        r"\b\d(\s+\d)+\b",
        lambda m: " ".join(_number_to_words(int(p))
                           for p in m.group(0).split()),
        result)
    result = re.sub(
        r"\b\d+(?:,\d+)*\b",
        lambda m: _number_to_words(
            int("".join(ch for ch in m.group(0) if ch.isdigit()))),
        result)
    result = " ".join(result.split())
    return _replace_chars(result, _CHAR_MAP)


def _is_cjk(cp: int) -> bool:
    return (0x1100 <= cp <= 0x11FF or 0x2E80 <= cp <= 0xA4CF
            or 0xA840 <= cp <= 0xD7AF or 0xF900 <= cp <= 0xFAFF
            or 0xFE30 <= cp <= 0xFE4F or 0xFF65 <= cp <= 0xFFDC
            or 0x20000 <= cp <= 0x2FFFF)


def tokenize_by_cjk_char(text: str, uppercase_ascii: bool = True) -> str:
    """Space-separate CJK chars, uppercase the rest
    (IndexTTSModel.swift:36-51)."""
    pieces = []
    for ch in text:
        if _is_cjk(ord(ch)):
            pieces.append(f" {ch} ")
        else:
            pieces.append(ch.upper() if uppercase_ascii else ch)
    return " ".join("".join(pieces).split())


# ---------------------------------------------------------------------------
# Conditioning: conformer encoder + perceiver resampler
# ---------------------------------------------------------------------------

_SUBSAMPLING_SPECS = {
    "conv2d": [(3, 2)], "conv2d2": [(3, 2)], "conv2d3": [(5, 3)],
    "conv2d4": [(3, 2), (3, 2)], "conv2d6": [(3, 2), (5, 3)],
    "conv2d8": [(3, 2), (3, 2), (3, 2)],
}


def _subsampling_forward(p, x, cfg: IndexTTSConformerConfig):
    """[B, T, n_mels] -> [B, T', D] (IndexTTSConv2dSubsampling,
    IndexTTSModules.swift:418-476). Convs run channels-last NHWC."""
    h = x[..., None]  # [B, T, F, 1]
    for i, (k, s) in enumerate(_SUBSAMPLING_SPECS[cfg.input_layer]):
        h = jax.nn.relu(nn.conv2d(p["conv"][str(i)], h, stride=(s, s)))
    b, t, f, c = h.shape
    h = h.transpose(0, 1, 3, 2).reshape(b, t, c * f)
    return nn.linear(p["out"]["0"], h)


def _rel_pos_encoding(length: int, d_model: int) -> np.ndarray:
    """Interleaved sin/cos table (IndexTTSRelPositionalEncoding,
    IndexTTSModules.swift:185-194)."""
    pos = np.arange(length, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * (-math.log(10000.0) / d_model))
    return np.stack([np.sin(pos * div), np.cos(pos * div)],
                    axis=-1).reshape(length, d_model)[None]


def _rel_attention(p, x, pos_emb, n_heads: int):
    """Transformer-XL style attention with pos_bias_u/v
    (IndexTTSRelPositionMultiHeadAttention, IndexTTSModules.swift:208-277)."""
    b, t, d = x.shape
    hd = d // n_heads
    q = nn.linear(p["linear_q"], x).reshape(b, t, n_heads, hd)
    k = nn.linear(p["linear_k"], x).reshape(b, t, n_heads, hd)
    v = nn.linear(p["linear_v"], x).reshape(b, t, n_heads, hd)
    pe = nn.linear(p["linear_pos"], pos_emb)
    pe = pe.reshape(1, -1, n_heads, hd).transpose(0, 2, 1, 3)
    scale = 1.0 / math.sqrt(hd)
    q_u = (q + p["pos_bias_u"]).transpose(0, 2, 1, 3)
    q_v = (q + p["pos_bias_v"]).transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    rel_bias = jnp.einsum("bhqd,bhkd->bhqk", q_v, pe) * scale
    o = nn.sdpa(q_u, k, v, mask=rel_bias, scale=scale)
    return nn.linear(p["linear_out"],
                     o.transpose(0, 2, 1, 3).reshape(b, t, d))


def _conformer_block(p, x, pos_emb, cfg: IndexTTSConformerConfig):
    """IndexTTSConformerBlock (IndexTTSModules.swift:343-416)."""
    ff_scale = 0.5 if cfg.macaron_style else 1.0
    if cfg.macaron_style:
        h = nn.layer_norm(p["norm_ff_macaron"], x)
        x = x + ff_scale * nn.linear(
            p["feed_forward_macaron"]["w_2"],
            nn.silu(nn.linear(p["feed_forward_macaron"]["w_1"], h)))
    h = nn.layer_norm(p["norm_mha"], x)
    if cfg.pos_enc_layer_type == "rel_pos":
        x = x + _rel_attention(p["self_attn"], h, pos_emb,
                               cfg.attention_heads)
    else:
        a = p["self_attn"]
        b_, t, d = h.shape
        hd = d // cfg.attention_heads
        q = nn.linear(a["linear_q"], h).reshape(
            b_, t, cfg.attention_heads, hd).transpose(0, 2, 1, 3)
        k = nn.linear(a["linear_k"], h).reshape(
            b_, t, cfg.attention_heads, hd).transpose(0, 2, 1, 3)
        v = nn.linear(a["linear_v"], h).reshape(
            b_, t, cfg.attention_heads, hd).transpose(0, 2, 1, 3)
        o = nn.sdpa(q, k, v)
        x = x + nn.linear(a["linear_out"],
                          o.transpose(0, 2, 1, 3).reshape(b_, t, d))
    # convolution module (IndexTTSModules.swift:293-341)
    h = nn.layer_norm(p["norm_conv"], x)
    cm = p["conv_module"]
    proj = nn.conv1d(cm["pointwise_conv1"], h)
    ch = proj.shape[-1] // 2
    g = proj[..., :ch] * jax.nn.sigmoid(proj[..., ch:])
    g = nn.conv1d(cm["depthwise_conv"], g,
                  padding=(cfg.cnn_module_kernel - 1) // 2,
                  groups=cfg.output_size)
    g = nn.silu(nn.layer_norm(cm["norm"], g))
    x = x + nn.conv1d(cm["pointwise_conv2"], g)
    h = nn.layer_norm(p["norm_ff"], x)
    x = x + ff_scale * nn.linear(p["feed_forward"]["w_2"],
                                 nn.silu(nn.linear(p["feed_forward"]["w_1"],
                                                   h)))
    return nn.layer_norm(p["norm_final"], x)


def conditioning_encoder_forward(p, x, cfg: IndexTTSConformerConfig):
    """[B, T, n_mels] -> [B, T', D] (IndexTTSConformerEncoder,
    IndexTTSModules.swift:478-513)."""
    h = _subsampling_forward(p["embed"], x, cfg)
    pos_emb = None
    if cfg.pos_enc_layer_type == "rel_pos":
        if cfg.xscaling:
            h = h * math.sqrt(cfg.output_size)
        pos_emb = jnp.asarray(_rel_pos_encoding(h.shape[1],
                                                cfg.output_size), h.dtype)
    for i in range(cfg.num_blocks):
        h = _conformer_block(p["encoders"][str(i)], h, pos_emb, cfg)
    return nn.layer_norm(p["after_norm"], h)


def perceiver_forward(p, context, n_heads: int, head_dim: int):
    """Fixed latents cross-attend to [context; latents]
    (IndexTTSPerceiverResampler, IndexTTSModules.swift:124-169)."""
    b = context.shape[0]
    if "proj_context" in p:
        context = nn.linear(p["proj_context"], context)
    latents = jnp.broadcast_to(p["latents"][None],
                               (b,) + p["latents"].shape)
    n_lat, d = p["latents"].shape
    for i in sorted(p["layers"], key=int):
        lp = p["layers"][i]
        kv = jnp.concatenate([context, latents], axis=1)
        a = lp["attention"]
        t_kv = kv.shape[1]
        q = nn.linear(a["linear_q"], latents).reshape(
            b, n_lat, n_heads, head_dim).transpose(0, 2, 1, 3)
        k = nn.linear(a["linear_k"], kv).reshape(
            b, t_kv, n_heads, head_dim).transpose(0, 2, 1, 3)
        v = nn.linear(a["linear_v"], kv).reshape(
            b, t_kv, n_heads, head_dim).transpose(0, 2, 1, 3)
        o = nn.sdpa(q, k, v)
        latents = latents + nn.linear(
            a["linear_out"], o.transpose(0, 2, 1, 3).reshape(b, n_lat, -1))
        # gated GELU feed-forward (IndexTTSPerceiverFeedForward)
        proj = nn.linear(lp["feed_forward"]["w_1"], latents)
        dff = proj.shape[-1] // 2
        latents = latents + nn.linear(
            lp["feed_forward"]["w_2"],
            nn.gelu(proj[..., dff:]) * proj[..., :dff])
    return nn.rms_norm(p["norm"], latents, 1e-5)


# ---------------------------------------------------------------------------
# GPT-2 core
# ---------------------------------------------------------------------------


def gpt2_forward(p, embeds, cache, cfg: IndexTTSGPTConfig):
    """GPT-2 over precomputed embeds (IndexTTSGPT2Model,
    IndexTTSModules.swift:602-623). Returns (ln_f output, cache)."""
    b, t, d = embeds.shape
    heads = cfg.heads
    hd = d // heads
    mask = kv_cache.attention_mask(cache, t)
    x = embeds
    for i in range(cfg.layers):
        lp = p["h"][str(i)]
        h = nn.layer_norm(lp["ln_1"], x)
        qkv = nn.linear(lp["attn"]["c_attn"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, heads, hd).transpose(0, 2, 1, 3)
        cache, k_full, v_full = kv_cache.update_cache(cache, i, k, v)
        o = nn.sdpa(q, k_full, v_full, mask=mask)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + nn.linear(lp["attn"]["c_proj"], o)
        h = nn.layer_norm(lp["ln_2"], x)
        x = x + nn.linear(lp["mlp"]["c_proj"],
                          nn.gelu(nn.linear(lp["mlp"]["c_fc"], h),
                                  approximate=True))
    x = nn.layer_norm(p["ln_f"], x)
    return x, cache._replace(offset=cache.offset + t)


# ---------------------------------------------------------------------------
# Conditioned BigVGAN vocoder
# ---------------------------------------------------------------------------


def vocoder_forward(p, latents, speaker, cfg: IndexTTSVocoderConfig):
    """GPT latents [B, T, gpt_dim] + speaker [B, 1, spk_dim] -> waveform
    [B, samples] (IndexTTSBigVGANConditioning, IndexTTSBigVGAN.swift:131-163).
    AMP blocks shared with codecs.bigvgan."""
    bcfg = cfg.as_bigvgan()
    n_kernels = len(cfg.resblock_kernel_sizes)
    h = nn.conv1d(p["conv_pre"], latents, padding=3)
    h = h + nn.conv1d(p["cond_layer"], speaker)
    for step in range(len(cfg.upsample_rates)):
        k = cfg.upsample_kernel_sizes[step]
        s = cfg.upsample_rates[step]
        h = nn.conv_transpose1d(p["ups"][str(step)]["0"], h, stride=s,
                                padding=(k - s) // 2)
        if cfg.cond_d_vector_in_each_upsampling_layer:
            h = h + nn.conv1d(p["conds"][str(step)], speaker)
        acc = None
        for j in range(n_kernels):
            rp = p["resblocks"][str(step * n_kernels + j)]
            kern = cfg.resblock_kernel_sizes[j]
            dil = cfg.resblock_dilation_sizes[j]
            blk = (bigvgan_mod._amp_block1 if cfg.resblock == "1"
                   else bigvgan_mod._amp_block2)(rp, h, bcfg, kern, dil)
            acc = blk if acc is None else acc + blk
        h = acc / n_kernels
    h = bigvgan_mod._activation1d(p["activation_post"], h, bcfg)
    h = nn.conv1d(p["conv_post"], h, padding=3)
    h = jnp.tanh(h) if cfg.use_tanh_at_final else jnp.clip(h, -1.0, 1.0)
    return h[..., 0]


# ---------------------------------------------------------------------------
# Weight sanitize (IndexTTSModel.sanitize, IndexTTSModel.swift:556-626 +
# IndexTTSBigVGAN.swift:194-239)
# ---------------------------------------------------------------------------


def _fold_vocoder_weight_norm(voc: dict) -> dict:
    """Fold torch weight-norm pairs (g, v) in the vocoder subtree."""
    flat = {}
    for k, v in voc.items():
        k = k.replace(".parametrizations.weight.original0", ".weight_g")
        k = k.replace(".parametrizations.weight.original1", ".weight_v")
        flat[k] = v
    out = {}
    for k, v in flat.items():
        if k.endswith(".weight_g"):
            continue
        if k.endswith(".weight_v"):
            g = flat.get(k[: -len(".weight_v")] + ".weight_g")
            if g is None:
                continue
            k = k[: -len(".weight_v")] + ".weight"
            v = bigvgan_mod._fold_weight_norm(g, v)
        out[k] = v
    return out


def sanitize(weights: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out = {}
    voc = {}
    raw = any("num_batches_tracked" in k for k in weights)
    for k, v in weights.items():
        if "num_batches_tracked" in k or ".pos_enc" in k:
            continue
        for pre in ("model.", "indextts."):
            if k.startswith(pre):
                k = k[len(pre):]
        # vocoder subtree
        if k.startswith("bigvgan."):
            k = k[len("bigvgan."):]
        if k.split(".")[0] in ("ups", "speaker_encoder", "resblocks",
                               "conv_pre", "conv_post", "conds",
                               "cond_layer", "activation_post"):
            k = re.sub(r"speaker_encoder\.blocks\.(\d)\.",
                       r"speaker_encoder.block\1.", k)
            k = k.replace("norm.norm", "norm").replace("conv.conv", "conv")
            k = k.replace("conv1.conv", "conv1").replace("conv2.conv",
                                                         "conv2")
            k = k.replace("fc.conv", "fc").replace("asp_bn.norm", "asp_bn")
            voc[k] = v
            continue
        if k == "perceiver_encoder.norm.gamma":
            out["perceiver_encoder.norm.weight"] = v
            continue
        if k == "perceiver_encoder.norm.beta":
            continue
        # raw torch checkpoints store GPT-2 Conv1D [in, out] -> transpose
        if raw and v.ndim == 2 and k.startswith("gpt.h.") and any(
                t in k for t in (".attn.c_attn.", ".attn.c_proj.",
                                 ".mlp.c_fc.", ".mlp.c_proj.")) \
                and k.endswith(".weight"):
            v = v.T
        # conformer embed conv indices 0,2,4.. -> 0,1,2 (ReLU interleaved)
        m = re.match(r"conditioning_encoder\.embed\.conv\.(\d+)\.(.*)", k)
        if m and raw and int(m.group(1)) % 2 == 0 and int(m.group(1)) > 0:
            k = (f"conditioning_encoder.embed.conv.{int(m.group(1)) // 2}."
                 f"{m.group(2)}")
        # perceiver layer [0]=attention / [1]=ff sequential indices
        m = re.match(r"perceiver_encoder\.layers\.(\d+)\.(.*)", k)
        if m:
            rest = m.group(2)
            pre = f"perceiver_encoder.layers.{m.group(1)}"
            if rest == "0.to_q.weight":
                out[f"{pre}.attention.linear_q.weight"] = v
                continue
            if rest == "0.to_kv.weight":
                half = v.shape[0] // 2
                out[f"{pre}.attention.linear_k.weight"] = v[:half]
                out[f"{pre}.attention.linear_v.weight"] = v[half:]
                continue
            if rest == "0.to_out.weight":
                out[f"{pre}.attention.linear_out.weight"] = v
                continue
            for a, b in (("0.linear_q.", "attention.linear_q."),
                         ("0.linear_k.", "attention.linear_k."),
                         ("0.linear_v.", "attention.linear_v."),
                         ("0.linear_out.", "attention.linear_out."),
                         ("1.0.", "feed_forward.w_1."),
                         ("1.2.", "feed_forward.w_2."),
                         ("1.w_1.", "feed_forward.w_1."),
                         ("1.w_2.", "feed_forward.w_2.")):
                if rest.startswith(a):
                    out[f"{pre}.{b}{rest[len(a):]}"] = v
                    break
            else:
                out[k] = v
            continue
        # torch conv layouts already match ours; MLX-converted ones need
        # the reverse of the reference's raw-path transposes
        # (IndexTTSModel.swift:600-607)
        if not raw and "conv" in k and k.endswith(".weight"):
            if v.ndim == 3:
                v = np.transpose(v, (0, 2, 1))  # MLX [O,K,I] -> [O,I,K]
            elif v.ndim == 4:
                v = np.transpose(v, (0, 3, 1, 2))  # MLX NHWC -> OIHW
        out[k] = v
    for k, v in _fold_vocoder_weight_norm(voc).items():
        if (".alpha" in k or ".beta" in k) and v.ndim == 3:
            v = v.reshape(-1)
        if not raw and k.endswith(".weight"):
            # MLX-converted layouts back to torch (ours): ConvTranspose
            # [O, K, I] -> [I, O, K]; Conv1d [O, K, I] -> [O, I, K]
            if k.startswith("ups.") and v.ndim == 3:
                v = np.transpose(v, (2, 0, 1))
            elif v.ndim == 3 and "conv" in k:
                v = np.transpose(v, (0, 2, 1))
        out["vocoder." + k] = v
    return out


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


class IndexTTS:
    def __init__(self, config: IndexTTSConfig, params, tokenizer=None,
                 dtype=jnp.float32):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.dtype = dtype
        self.sample_rate = config.sample_rate
        cm = config.gpt.condition_module
        self._condition = ajit(functools.partial(self._condition_impl))
        self._vocode = ajit(functools.partial(
            vocoder_forward, cfg=config.bigvgan))
        self._speaker_cfg = EcapaConfig.from_dict({
            "input_size": config.bigvgan.num_mels, "channels": 512,
            "embed_dim": config.bigvgan.speaker_embedding_dim,
            "kernel_sizes": (5, 3, 3, 3, 1), "dilations": (1, 2, 3, 4, 1),
            "attention_channels": 128, "res2net_scale": 8,
            "se_channels": 128, "global_context": True,
            "reflect_padding": True, **config.speaker_encoder})
        self._loops: dict = {}

    def default_generation_parameters(self) -> AudioGenerateParameters:
        return AudioGenerateParameters(
            max_tokens=min(5000, self.config.gpt.max_mel_tokens),
            temperature=0.8, top_p=1.0, top_k=30)

    @classmethod
    def from_pretrained(cls, repo_or_path: str,
                        dtype=jnp.float32) -> "IndexTTS":
        from tpu_audio.core.spm import SentencePieceTokenizer

        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = IndexTTSConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize,
                                     dtype=dtype)
        tokenizer = None
        tok_path = model_dir / "tokenizer.model"
        if tok_path.exists():
            tokenizer = SentencePieceTokenizer.from_model_file(tok_path)
        return cls(config, params, tokenizer, dtype)

    # -- text -------------------------------------------------------------------

    def encode_text(self, text: str) -> list[int]:
        if self.tokenizer is None:
            raise AudioGenerationError("IndexTTS tokenizer.model not loaded")
        return self.tokenizer.encode(
            tokenize_by_cjk_char(normalize_text(text)))

    # -- conditioning -------------------------------------------------------------

    def reference_features(self, audio: np.ndarray,
                           sample_rate: int | None = None,
                           n_fft: int = 1024,
                           hop_length: int = 256) -> np.ndarray:
        """log(max(mel, 1e-5)) magnitudes with HTK unnormalized filters
        (indexTTSLogMelSpectrogram, IndexTTSModel.swift:813-836)."""
        from tpu_audio.core.audio_io import resample_audio

        wf = np.asarray(audio, np.float32).reshape(-1)
        src = sample_rate or self.config.sample_rate
        if src != self.config.sample_rate:
            wf = resample_audio(wf, src, self.config.sample_rate)
        window = dsp.hanning_window(n_fft)
        freqs = dsp.stft(jnp.asarray(wf), window, n_fft, hop_length)
        mag = jnp.abs(freqs)
        filt = jnp.asarray(dsp.mel_filters(
            self.config.sample_rate, n_fft,
            self.config.gpt.condition_module.input_size, norm=None,
            mel_scale="htk"))
        mel = jnp.log(jnp.maximum(mag @ filt, 1e-5))
        return np.asarray(mel)[None]  # [1, frames, n_mels]

    def _condition_impl(self, params, features):
        cm = self.config.gpt.condition_module
        enc = conditioning_encoder_forward(
            params["conditioning_encoder"], features, cm)
        head_dim = 64  # perceiver default nDimHead (IndexTTSModules:138)
        return perceiver_forward(params["perceiver_encoder"], enc,
                                 cm.attention_heads, head_dim)

    def get_conditioning(self, features: np.ndarray) -> jnp.ndarray:
        return self._condition(self.params,
                               jnp.asarray(features, self.dtype))

    # -- mel-token generation -------------------------------------------------------

    def _get_loop(self, budget: int, temperature: float, top_p: float,
                  top_k: int):
        key = (budget, temperature, top_p, top_k)
        if key in self._loops:
            return self._loops[key]
        cfg = self.config.gpt
        stop = cfg.stop_mel_token
        from tpu_audio.core.sampling import _mask_top_k, _mask_top_p

        def sample(rng, logits):
            logits = logits.astype(jnp.float32)
            if temperature <= 0:
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)
            if top_k and top_k > 0:
                logits = _mask_top_k(logits, top_k)
            if top_p < 1.0:
                logits = _mask_top_p(logits, top_p)
            return jax.random.categorical(rng, logits / temperature,
                                          axis=-1).astype(jnp.int32)

        def loop(params, prompt_embeds, cache, rng):
            prompt_len = prompt_embeds.shape[1]
            h, cache = gpt2_forward(params["gpt"], prompt_embeds, cache, cfg)
            h = nn.layer_norm(params["final_norm"], h[:, -1:], 1e-5)

            latents = jnp.zeros((budget, cfg.model_dim), jnp.float32)
            tokens = jnp.zeros((budget,), jnp.int32)

            def cond(c):
                _, _, i, _, _, _, finished, _ = c
                return jnp.logical_and(~finished, i < budget)

            def body(c):
                latents, tokens, i, ntok, cache, h, finished, rng = c
                latents = latents.at[i].set(h[0, -1].astype(jnp.float32))
                logits = nn.linear(params["mel_head"], h[:, -1])
                rng, sub = jax.random.split(rng)
                tok = sample(sub, logits)
                valid = tok[0] != stop
                tokens = jnp.where(valid, tokens.at[ntok].set(tok[0]),
                                   tokens)
                # next step: mel embed + learned mel position at
                # prompt_len + i (IndexTTSModules.swift:756-760)
                emb = nn.embedding(params["mel_embedding"], tok[:, None])
                pos = nn.embedding(
                    params["mel_pos_embedding"]["emb"],
                    jnp.full((1, 1), prompt_len + i, jnp.int32))
                nxt = (emb + pos).astype(prompt_embeds.dtype)
                h, cache = gpt2_forward(params["gpt"], nxt, cache, cfg)
                h = nn.layer_norm(params["final_norm"], h, 1e-5)
                return (latents, tokens, i + 1,
                        ntok + valid.astype(jnp.int32), cache, h,
                        ~valid, rng)

            init = (latents, tokens, jnp.int32(0), jnp.int32(0), cache, h,
                    jnp.bool_(False), rng)
            latents, tokens, n_lat, n_tok, *_ = jax.lax.while_loop(
                cond, body, init)
            return latents, tokens, n_lat, n_tok

        fn = ajit(loop, donate_argnums=(2,))
        self._loops[key] = fn
        return fn

    def prepare_prompt_embeds(self, text_ids: list[int],
                              conditioning: jnp.ndarray) -> jnp.ndarray:
        """[conditioning | start text stop start_mel] embeddings
        (prepareInputEmbedding, IndexTTSModules.swift:676-703)."""
        cfg = self.config.gpt
        ids = ([cfg.start_text_token]
               + [min(max(t, 0), cfg.number_text_tokens) for t in text_ids]
               + [cfg.stop_text_token, cfg.start_mel_token])
        if len(ids) > cfg.max_text_tokens + 2:
            raise AudioGenerationError(
                f"text token count {len(ids)} exceeds max_text_tokens + 2")
        arr = jnp.asarray([ids], jnp.int32)
        text_emb = nn.embedding(self.params["text_embedding"], arr)
        pos = nn.embedding(self.params["text_pos_embedding"]["emb"],
                           jnp.arange(len(ids), dtype=jnp.int32)[None])
        return jnp.concatenate(
            [conditioning.astype(text_emb.dtype), text_emb + pos], axis=1)

    def generate_mel_tokens(self, text_ids: list[int],
                            conditioning: jnp.ndarray, max_tokens: int,
                            temperature: float = 0.0, top_p: float = 1.0,
                            top_k: int = 0, seed: int = 0):
        """-> (token_ids list, latents [1, n, D])."""
        embeds = self.prepare_prompt_embeds(text_ids, conditioning)
        prompt_len = embeds.shape[1]
        loop = self._get_loop(max_tokens, temperature, top_p, top_k)
        cache = kv_cache.init_cache(
            self.config.gpt.layers, 1, self.config.gpt.heads,
            self.config.gpt.model_dim // self.config.gpt.heads,
            prompt_len + max_tokens + 1, self.dtype)
        latents, tokens, n_lat, n_tok = loop(
            self.params, embeds.astype(self.dtype), cache,
            jax.random.PRNGKey(seed))
        n_lat, n_tok = int(n_lat), int(n_tok)
        return (np.asarray(tokens)[:n_tok].tolist(),
                np.asarray(latents)[None, :n_lat])

    # -- vocoder ------------------------------------------------------------------

    def speaker_embedding(self, features: np.ndarray) -> jnp.ndarray:
        emb = ecapa_backbone_forward(
            self.params["vocoder"]["speaker_encoder"],
            jnp.asarray(features, jnp.float32), self._speaker_cfg)
        return emb[:, None]  # [B, 1, spk_dim]

    def decode_waveform(self, latents: np.ndarray,
                        features: np.ndarray) -> np.ndarray:
        speaker = self.speaker_embedding(features)
        wav = self._vocode(self.params["vocoder"],
                           jnp.asarray(latents, self.dtype),
                           speaker.astype(self.dtype))
        return np.asarray(wav, np.float32)[0]

    # -- public API ---------------------------------------------------------------

    def generate(self, text: str, voice: str | None = None, ref_audio=None,
                 ref_text: str | None = None, language: str | None = None,
                 generation_parameters: AudioGenerateParameters | None = None
                 ) -> np.ndarray:
        del voice, ref_text, language
        if ref_audio is None:
            raise AudioGenerationError(
                "IndexTTS generation requires reference audio for "
                "conditioning")
        gp = generation_parameters or self.default_generation_parameters()
        features = self.reference_features(np.asarray(ref_audio))
        conditioning = self.get_conditioning(features)
        text_ids = self.encode_text(text)
        _, latents = self.generate_mel_tokens(
            text_ids, conditioning,
            gp.max_tokens or min(5000, self.config.gpt.max_mel_tokens),
            gp.temperature, gp.top_p, gp.top_k, seed=gp.seed or 0)
        if latents.shape[1] == 0:
            return np.zeros((0,), np.float32)
        return self.decode_waveform(latents, features)

    def generate_stream(self, text: str, voice: str | None = None,
                        ref_audio=None, ref_text: str | None = None,
                        language: str | None = None,
                        generation_parameters: AudioGenerateParameters
                        | None = None):
        t0 = time.perf_counter()
        audio = self.generate(text, voice, ref_audio, ref_text, language,
                              generation_parameters)
        yield AudioGeneration.from_audio(audio)
        yield AudioGeneration.from_info(AudioGenerationInfo(
            generate_time=time.perf_counter() - t0,
            audio_duration=len(audio) / self.sample_rate))
