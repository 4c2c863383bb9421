"""Whisper STT: conv stem + encoder-decoder transformer with a fully
on-device KV-cached greedy/temperature decode loop.

TPU-first rebuild of the reference's Whisper
(Sources/MLXAudioSTT/Models/Whisper/WhisperModel.swift,
WhisperLayers.swift, WhisperAudio.swift). Key design deltas from the
reference, driven by XLA semantics:

- The whole per-chunk generation (prompt prefill + AR decode + sampling +
  token suppression + EOT stop) is ONE jitted ``lax.while_loop`` — the
  reference syncs the device every token (`eval(logits)` / `.item()`,
  WhisperModel.swift:228-269), which would be fatal on TPU. Prompt tokens are
  teacher-forced through the same single-token step so there is exactly one
  compiled graph regardless of prompt length.
- Cross-attention K/V are computed once per chunk and passed into the loop.
- 30 s chunks are padded to a fixed shape so every chunk reuses the compiled
  encoder (WhisperModel.swift:165-182 chunk loop semantics preserved).

Checkpoint support mirrors WhisperModel.sanitize (WhisperModel.swift:321-480):
both HF `transformers` layout and OpenAI/mlx-whisper layout, sinusoid
synthesis for the missing encoder positional embedding, and MLX 4/8-bit
quantized checkpoints (gated on `.scales` keys, WhisperModel.swift:499-511).
"""

from __future__ import annotations

import functools
import json
import math
import time
import warnings
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import dsp, hub, kv_cache, loading, nn
from tpu_audio.core.generation import (
    STTGenerateParameters,
    STTOutput,
    STTSegment,
)
from tpu_audio.core.jitting import ajit

SAMPLE_RATE = 16000

# tokenizer-less checkpoints fetch assets from the openai sibling repo that
# matches the checkpoint's vocab size (WhisperModel.swift:566-575)
TOKENIZER_REPO_BY_VOCAB = {
    51866: "openai/whisper-large-v3",
    51865: "openai/whisper-medium",
    51864: "openai/whisper-medium.en",
}
TOKENIZER_ASSET_FILES = [
    "tokenizer.json",
    "tokenizer_config.json",
    "special_tokens_map.json",
    "added_tokens.json",
    "vocab.json",
    "merges.txt",
    "normalizer.json",
    "generation_config.json",
]


def fetch_tokenizer_dir(vocab_size: int) -> Path:
    """Resolve (cache-first) the sibling openai repo holding tokenizer assets
    for a tokenizer-less whisper checkpoint (WhisperModel.swift:566-639).

    Only official whisper vocab sizes resolve (the reference's default-case
    large-v3 fallback is restricted to the >=51864 family): a custom-vocab
    fine-tune must ship its own tokenizer — fetching large-v3 ids above the
    model's vocab would silently clamp embeddings into garbage."""
    from tpu_audio.core import hub as _hub

    repo = TOKENIZER_REPO_BY_VOCAB.get(vocab_size)
    if repo is None:
        if vocab_size < 51864:
            raise RuntimeError(
                f"no sibling tokenizer repo for vocab size {vocab_size}; "
                "this checkpoint needs its own tokenizer.json")
        repo = "openai/whisper-large-v3"
    return _hub.resolve_or_download_model(
        repo,
        required_files=("tokenizer.json",),
        allow_patterns=list(TOKENIZER_ASSET_FILES),
    )
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH_SECONDS = 30
CHUNK_LENGTH_SAMPLES = CHUNK_LENGTH_SECONDS * SAMPLE_RATE

# long-audio window batching: windows per batched decode group, and the
# shape buckets the group is padded to (compile once per bucket)
_WINDOW_BATCH_MAX = 8
_WINDOW_BATCH_BUCKETS = (2, 4, 8)
FRAMES_PER_CHUNK = 3000


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------


@dataclass
class WhisperConfig:
    num_mel_bins: int = 80
    d_model: int = 384
    encoder_layers: int = 4
    encoder_attention_heads: int = 6
    encoder_ffn_dim: int = 1536
    decoder_layers: int = 4
    decoder_attention_heads: int = 6
    decoder_ffn_dim: int = 1536
    vocab_size: int = 51865
    max_source_positions: int = 1500
    max_target_positions: int = 448
    quantization: dict | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "WhisperConfig":
        keys = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass
class WhisperGenerationConfig:
    suppress_tokens: list[int] = field(default_factory=list)
    begin_suppress_tokens: list[int] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict) -> "WhisperGenerationConfig":
        return cls(
            suppress_tokens=d.get("suppress_tokens") or [],
            begin_suppress_tokens=d.get("begin_suppress_tokens") or [],
        )


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

WHISPER_LANGUAGES = [
    "en", "zh", "de", "es", "ru", "ko", "fr", "ja", "pt", "tr", "pl", "ca",
    "nl", "ar", "sv", "it", "id", "hi", "fi", "vi", "he", "uk", "el", "ms",
    "cs", "ro", "da", "hu", "ta", "no", "th", "ur", "hr", "bg", "lt", "la",
    "mi", "ml", "cy", "sk", "te", "fa", "lv", "bn", "sr", "az", "sl", "kn",
    "et", "mk", "br", "eu", "is", "hy", "ne", "mn", "bs", "kk", "sq", "sw",
    "gl", "mr", "pa", "si", "km", "sn", "yo", "so", "af", "oc", "ka", "be",
    "tg", "sd", "gu", "am", "yi", "lo", "uz", "fo", "ht", "ps", "tk", "nn",
    "mt", "sa", "lb", "my", "bo", "tl", "mg", "as", "tt", "haw", "ln", "ha",
    "ba", "jw", "su", "yue",
]


class WhisperTokenizer:
    """Thin adapter over a `tokenizers.Tokenizer`, providing the special-token
    ids and prompt construction the decode loop needs
    (reference WhisperTokenizer.swift semantics)."""

    def __init__(self, tok, vocab_size: int):
        self._tok = tok
        self.is_multilingual = vocab_size >= 51865
        self.sot = self._id("<|startoftranscript|>")
        self.eot = self._id("<|endoftext|>")
        self.transcribe = self._id("<|transcribe|>")
        self.translate = self._id("<|translate|>")
        self.no_timestamps = self._id("<|notimestamps|>")
        self.no_speech = self._id("<|nospeech|>")
        if self.no_speech is None:
            self.no_speech = self._id("<|nocaptions|>")
        self.timestamp_begin = self._id("<|0.00|>")
        if self.timestamp_begin is None and self.no_timestamps is not None:
            self.timestamp_begin = self.no_timestamps + 1
        self.language_to_id = {}
        if self.is_multilingual:
            for code in WHISPER_LANGUAGES:
                tid = self._id(f"<|{code}|>")
                if tid is not None:
                    self.language_to_id[code] = tid
        self.id_to_language = {v: k for k, v in self.language_to_id.items()}

    def _id(self, token: str) -> int | None:
        tid = self._tok.token_to_id(token)
        return tid

    @classmethod
    def from_dir(cls, model_dir: str | Path, vocab_size: int) -> "WhisperTokenizer":
        from tokenizers import Tokenizer

        tok = Tokenizer.from_file(str(Path(model_dir) / "tokenizer.json"))
        return cls(tok, vocab_size)

    def build_prompt_tokens(self, language: str | None, task: str = "transcribe") -> list[int]:
        if not self.is_multilingual:
            return [self.sot, self.no_timestamps]
        lang_id = self.language_to_id.get(language or "en", None)
        if lang_id is None:
            lang_id = self.language_to_id.get("en")
        task_id = self.translate if task == "translate" else self.transcribe
        return [self.sot, lang_id, task_id, self.no_timestamps]

    def decode(self, tokens: list[int]) -> str:
        tokens = [t for t in tokens if t < self.sot]
        return self._tok.decode(tokens, skip_special_tokens=True)


# ---------------------------------------------------------------------------
# Model graph (pure functions over the param tree, HF key names)
# ---------------------------------------------------------------------------


def _attention(p, x, kv_x=None, mask=None, n_heads=8):
    """MHA; kv_x != None → cross attention. q/v/out have bias, k doesn't."""
    b, t, d = x.shape
    src = x if kv_x is None else kv_x
    q = nn.linear(p["q_proj"], x)
    k = nn.linear(p["k_proj"], src)
    v = nn.linear(p["v_proj"], src)
    hd = d // n_heads
    q = q.reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, -1, n_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, -1, n_heads, hd).transpose(0, 2, 1, 3)
    o = nn.sdpa(q, k, v, mask=mask)
    o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
    return nn.linear(p["out_proj"], o)


def encoder_forward(params, mel, cfg: WhisperConfig):
    """mel [B, T=3000, n_mels] -> hidden [B, 1500, D]
    (reference WhisperLayers.swift:110 encoder).

    Layer params are STACKED ([L, ...] leaves, see
    ``loading.stack_layer_params``) and the layer body is ``lax.scan``ed —
    one compiled body regardless of depth."""
    p = params["model"]["encoder"]
    x = nn.gelu(nn.conv1d(p["conv1"], mel, stride=1, padding=1))
    x = nn.gelu(nn.conv1d(p["conv2"], x, stride=2, padding=1))
    x = x + p["embed_positions"]["weight"][: x.shape[1]].astype(x.dtype)
    n_heads = cfg.encoder_attention_heads

    def layer(x, lp):
        h = nn.layer_norm(lp["self_attn_layer_norm"], x)
        x = x + _attention(lp["self_attn"], h, n_heads=n_heads)
        h = nn.layer_norm(lp["final_layer_norm"], x)
        x = x + nn.linear(lp["fc2"], nn.gelu(nn.linear(lp["fc1"], h)))
        return x, None

    x, _ = jax.lax.scan(layer, x, p["layers"])
    return nn.layer_norm(p["layer_norm"], x)


def _cross_kv(params, enc_out, cfg: WhisperConfig):
    """Precompute per-layer cross-attention K/V: [L, B, H, S_src, Dh] each
    (vmapped over the stacked layer axis)."""
    ap_stack = params["model"]["decoder"]["layers"]["encoder_attn"]
    n_heads = cfg.decoder_attention_heads
    b, s, d = enc_out.shape
    hd = d // n_heads

    def kv(ap):
        k = nn.linear(ap["k_proj"], enc_out).reshape(b, s, n_heads, hd).transpose(0, 2, 1, 3)
        v = nn.linear(ap["v_proj"], enc_out).reshape(b, s, n_heads, hd).transpose(0, 2, 1, 3)
        return k, v

    return jax.vmap(kv)(ap_stack)


def decoder_step(params, tokens, pos, cache: kv_cache.KVCache, cross_k, cross_v,
                 cfg: WhisperConfig, cross_mode: str | None = None,
                 cross_valid=None, pallas_interpret: bool = False):
    """One decode step: tokens [B, T] at positions pos..pos+T.
    Returns (logits [B, T, V], new cache).

    The layer body is ``lax.scan``ed over the stacked layer axis; the KV
    cache's layer-stacked buffers ride the scan as xs/ys so each layer
    writes its own slice.

    ``cross_mode``: "dense" (bf16 [L,B,H,S,Dh] K/V), "quant" (6-tuple of
    quantized arrays, XLA dequant), or "pallas" (transposed int8 layout
    for the fused ops/pallas_kv_attention kernel; requires B=1, T=1 and
    ``cross_valid`` [1] int32). Auto-detected from the tuple shape when
    None (backwards compatible)."""
    p = params["model"]["decoder"]
    n_heads = cfg.decoder_attention_heads
    b, t = tokens.shape
    x = nn.embedding(p["embed_tokens"], tokens)
    pos_emb = jax.lax.dynamic_slice_in_dim(
        p["embed_positions"]["weight"], pos, t, axis=0
    )
    x = x + pos_emb.astype(x.dtype)
    d = x.shape[-1]
    hd = d // n_heads
    mask = kv_cache.attention_mask(cache, t)
    offset = cache.offset
    if cross_mode is None:
        cross_mode = "quant" if isinstance(cross_k, tuple) else "dense"

    cache_xs, cache_update, cache_fold = kv_cache.make_layer_updater(cache)
    cross_xs = (tuple(cross_k) + tuple(cross_v)
                if cross_mode != "dense" else (cross_k, cross_v))

    def layer(x, xs):
        lp, cross_l, cache_l = xs
        h = nn.layer_norm(lp["self_attn_layer_norm"], x)
        ap = lp["self_attn"]
        q = nn.linear(ap["q_proj"], h).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
        k = nn.linear(ap["k_proj"], h).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
        v = nn.linear(ap["v_proj"], h).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
        cache_l, k_full, v_full = cache_update(cache_l, offset, k, v, x.dtype)
        o = nn.sdpa(q, k_full, v_full, mask=mask)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + nn.linear(ap["out_proj"], o)

        h = nn.layer_norm(lp["encoder_attn_layer_norm"], x)
        cp = lp["encoder_attn"]
        q = nn.linear(cp["q_proj"], h).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
        if cross_mode == "pallas":  # fused int8 dequant+attention kernel
            from tpu_audio.ops import pallas_kv_attention as pk

            o = pk.decode_attention_int8(
                q[0], *cross_l, cross_valid,
                sm_scale=1.0 / math.sqrt(hd),
                interpret=pallas_interpret)[None].astype(x.dtype)
        elif cross_mode == "quant":  # quantized cross KV, XLA dequant
            ck = kv_cache._dequantize(cross_l[0], cross_l[1], cross_l[2], x.dtype)
            cv = kv_cache._dequantize(cross_l[3], cross_l[4], cross_l[5], x.dtype)
            o = nn.sdpa(q, ck, cv)
        else:
            ck, cv = cross_l
            o = nn.sdpa(q, ck, cv)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + nn.linear(cp["out_proj"], o)

        h = nn.layer_norm(lp["final_layer_norm"], x)
        x = x + nn.linear(lp["fc2"], nn.gelu(nn.linear(lp["fc1"], h)))
        return x, cache_l

    x, cache_ys = jax.lax.scan(layer, x, (p["layers"], cross_xs, cache_xs))
    cache = cache_fold(cache, cache_ys)
    x = nn.layer_norm(p["layer_norm"], x)
    logits = nn.embedding_as_linear(p["embed_tokens"], x)
    cache = cache._replace(offset=cache.offset + t)
    return logits, cache


def decoder_forward(params, tokens, enc_out, cfg: WhisperConfig):
    """Full-sequence decoder forward (causal, no cache): tokens [B, T] ->
    logits [B, T, V]. Used for training steps and parity tests."""
    p = params["model"]["decoder"]
    n_heads = cfg.decoder_attention_heads
    b, t = tokens.shape
    x = nn.embedding(p["embed_tokens"], tokens)
    x = x + p["embed_positions"]["weight"][:t].astype(x.dtype)
    d = x.shape[-1]
    hd = d // n_heads

    def layer(x, lp):
        h = nn.layer_norm(lp["self_attn_layer_norm"], x)
        ap = lp["self_attn"]
        q = nn.linear(ap["q_proj"], h).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
        k = nn.linear(ap["k_proj"], h).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
        v = nn.linear(ap["v_proj"], h).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
        o = nn.sdpa(q, k, v, is_causal=True)
        x = x + nn.linear(ap["out_proj"], o.transpose(0, 2, 1, 3).reshape(b, t, d))

        h = nn.layer_norm(lp["encoder_attn_layer_norm"], x)
        x = x + _attention(lp["encoder_attn"], h, kv_x=enc_out, n_heads=n_heads)
        h = nn.layer_norm(lp["final_layer_norm"], x)
        x = x + nn.linear(lp["fc2"], nn.gelu(nn.linear(lp["fc1"], h)))
        return x, None

    x, _ = jax.lax.scan(layer, x, p["layers"])
    x = nn.layer_norm(p["layer_norm"], x)
    return nn.embedding_as_linear(p["embed_tokens"], x)


def init_params(cfg: WhisperConfig, seed: int = 0, dtype=jnp.bfloat16) -> dict:
    """Random-initialized parameter tree in the canonical (HF) layout —
    for benchmarks, graft entries and sharding dryruns (no real weights)."""
    rng = np.random.default_rng(seed)
    d, ffn, v = cfg.d_model, cfg.decoder_ffn_dim, cfg.vocab_size
    scale = 0.02

    def rand(*shape):
        return rng.standard_normal(shape, dtype=np.float32) * scale

    def ones(*shape):
        return np.ones(shape, np.float32)

    def zeros(*shape):
        return np.zeros(shape, np.float32)

    # stacked layout: every layer leaf carries a leading [L] dim
    el, dl = cfg.encoder_layers, cfg.decoder_layers
    effn = cfg.encoder_ffn_dim

    def attn(n):
        return {
            "q_proj": {"weight": rand(n, d, d), "bias": zeros(n, d)},
            "k_proj": {"weight": rand(n, d, d)},
            "v_proj": {"weight": rand(n, d, d), "bias": zeros(n, d)},
            "out_proj": {"weight": rand(n, d, d), "bias": zeros(n, d)},
        }

    def ln(n):
        return {"weight": ones(n, d), "bias": zeros(n, d)}

    enc_layers = {
        "self_attn": attn(el),
        "self_attn_layer_norm": ln(el),
        "fc1": {"weight": rand(el, effn, d), "bias": zeros(el, effn)},
        "fc2": {"weight": rand(el, d, effn), "bias": zeros(el, d)},
        "final_layer_norm": ln(el),
    }
    dec_layers = {
        "self_attn": attn(dl),
        "self_attn_layer_norm": ln(dl),
        "encoder_attn": attn(dl),
        "encoder_attn_layer_norm": ln(dl),
        "fc1": {"weight": rand(dl, ffn, d), "bias": zeros(dl, ffn)},
        "fc2": {"weight": rand(dl, d, ffn), "bias": zeros(dl, d)},
        "final_layer_norm": ln(dl),
    }
    params = {
        "model": {
            "encoder": {
                "conv1": {"weight": rand(d, cfg.num_mel_bins, 3), "bias": zeros(d)},
                "conv2": {"weight": rand(d, d, 3), "bias": zeros(d)},
                "embed_positions": {"weight": whisper_sinusoids(cfg.max_source_positions, d)},
                "layers": enc_layers,
                "layer_norm": {"weight": ones(d), "bias": zeros(d)},
            },
            "decoder": {
                "embed_tokens": {"weight": rand(v, d)},
                "embed_positions": {"weight": rand(cfg.max_target_positions, d)},
                "layers": dec_layers,
                "layer_norm": {"weight": ones(d), "bias": zeros(d)},
            },
        }
    }
    # cast on HOST first: shipping fp32 over the device link doubles the
    # transfer bytes and peaks at 3x the bf16 footprint on device
    np_dtype = np.dtype(dtype)

    def _to_device(x):
        if np.issubdtype(x.dtype, np.floating):
            x = x.astype(np_dtype)
        return jnp.asarray(x)

    return jax.tree.map(_to_device, params)


# ---------------------------------------------------------------------------
# Sanitizers (WhisperModel.swift:321-480)
# ---------------------------------------------------------------------------


def whisper_sinusoids(length: int, channels: int) -> np.ndarray:
    half = channels // 2
    log_inc = math.log(10000.0) / max(half - 1, 1)
    scaled = np.arange(length)[:, None] * np.exp(-log_inc * np.arange(half))[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


_MLX_ATTN_MAP = {"query": "q_proj", "key": "k_proj", "value": "v_proj", "out": "out_proj"}
_MLX_SUFFIX_MAP = {
    "attn_ln": "self_attn_layer_norm",
    "cross_attn_ln": "encoder_attn_layer_norm",
    "mlp_ln": "final_layer_norm",
    "mlp1": "fc1",
    "mlp2": "fc2",
}


def _remap_mlx_key(key: str) -> str | None:
    if key == "encoder.positional_embedding":
        return "model.encoder.embed_positions.weight"
    if key == "decoder.positional_embedding":
        return "model.decoder.embed_positions.weight"
    if key.startswith("decoder.token_embedding."):
        return "model.decoder.embed_tokens." + key[len("decoder.token_embedding."):]
    for conv in ("encoder.conv1.", "encoder.conv2."):
        if key.startswith(conv):
            return "model." + key
    if key.startswith("encoder.ln_post."):
        return "model.encoder.layer_norm." + key[len("encoder.ln_post."):]
    if key.startswith("decoder.ln."):
        return "model.decoder.layer_norm." + key[len("decoder.ln."):]
    for stem in ("encoder", "decoder"):
        prefix = f"{stem}.blocks."
        if not key.startswith(prefix):
            continue
        rest = key[len(prefix):]
        layer, _, suffix = rest.partition(".")
        head, _, tail = suffix.partition(".")
        if head in _MLX_SUFFIX_MAP:
            mapped = f"{_MLX_SUFFIX_MAP[head]}.{tail}"
        elif head in ("attn", "cross_attn"):
            container = "self_attn" if head == "attn" else "encoder_attn"
            proj, _, t2 = tail.partition(".")
            if proj not in _MLX_ATTN_MAP:
                return None
            mapped = f"{container}.{_MLX_ATTN_MAP[proj]}.{t2}"
        else:
            return None
        return f"model.{stem}.layers.{layer}.{mapped}"
    return None


def sanitize(weights: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    is_mlx = any(".blocks." in k for k in weights)
    out: dict[str, np.ndarray] = {}
    if not is_mlx:
        for key, value in weights.items():
            if key in ("proj_out.weight", "model.proj_out.weight"):
                continue  # tied to embed_tokens
            if not key.startswith("model.") and key.startswith(("encoder.", "decoder.")):
                key = "model." + key
            out[key] = value
    else:
        for key, value in weights.items():
            if key == "alignment_heads":
                continue
            mapped = _remap_mlx_key(key)
            if mapped is None:
                continue
            # mlx Conv1d layout [O, K, I] -> torch [O, I, K]
            if mapped.endswith(("conv1.weight", "conv2.weight")) and value.ndim == 3:
                value = np.transpose(value, (0, 2, 1))
            out[mapped] = value
        if "model.encoder.embed_positions.weight" not in out:
            conv2 = out.get("model.encoder.conv2.weight")
            if conv2 is not None:
                out["model.encoder.embed_positions.weight"] = whisper_sinusoids(
                    1500, conv2.shape[0]
                )
    return out


# ---------------------------------------------------------------------------
# Model wrapper
# ---------------------------------------------------------------------------


class Whisper:
    """Whisper STT with `from_pretrained` / `generate` / `generate_stream`."""

    def __init__(self, config: WhisperConfig, params, tokenizer=None,
                 generation_config: WhisperGenerationConfig | None = None,
                 dtype=jnp.bfloat16):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.generation_config = generation_config or WhisperGenerationConfig()
        self.dtype = dtype
        cfg = config
        self._encode = ajit(
            functools.partial(encoder_forward, cfg=cfg)
        )
        self._decode_loop = ajit(
            functools.partial(_decode_loop, cfg=cfg),
            static_argnames=("max_total", "kv_bits", "kv_group_size",
                             "quantized_kv_start"),
        )
        self._decode_loop_b = ajit(
            functools.partial(_decode_loop_batched, cfg=cfg),
            static_argnames=("max_total", "kv_bits", "kv_group_size",
                             "quantized_kv_start"),
        )
        self._decode_loop_f = ajit(
            functools.partial(_decode_loop_fused, cfg=cfg),
            static_argnames=("max_total", "pallas_interpret"),
        )
        self._fused_pack = None
        if config.quantization:
            from tpu_audio.core import quant

            q = config.quantization
            self.params = quant.tag_quantized(
                self.params, q.get("group_size", 64), q.get("bits", 4)
            )

    # -- loading ------------------------------------------------------------

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.bfloat16) -> "Whisper":
        model_dir = hub.resolve_or_download_model(repo_or_path)
        cfg_dict = hub.load_config(model_dir)
        config = WhisperConfig.from_dict(cfg_dict)
        config.quantization = cfg_dict.get("quantization")
        gen_cfg = None
        gc_path = Path(model_dir) / "generation_config.json"
        if gc_path.exists():
            gen_cfg = WhisperGenerationConfig.from_dict(json.loads(gc_path.read_text()))
        elif "suppress_tokens" in cfg_dict or "begin_suppress_tokens" in cfg_dict:
            gen_cfg = WhisperGenerationConfig.from_dict(cfg_dict)
        params = loading.load_params(
            model_dir, sanitize=sanitize, dtype=dtype, expected_prefixes=("model",)
        )
        params = loading.stack_layer_params(params)
        tokenizer = None
        if (Path(model_dir) / "tokenizer.json").exists():
            tokenizer = WhisperTokenizer.from_dir(model_dir, config.vocab_size)
        else:
            # many mlx-community whisper checkpoints ship no tokenizer.json;
            # fetch the assets from the openai sibling repo selected by vocab
            # size (reference WhisperModel.swift:566-639)
            try:
                tok_dir = fetch_tokenizer_dir(config.vocab_size)
                tokenizer = WhisperTokenizer.from_dir(tok_dir, config.vocab_size)
            except Exception as e:  # offline / fetch failure: defer to generate
                warnings.warn(
                    f"whisper checkpoint at {model_dir} has no tokenizer.json "
                    f"and the sibling-repo fallback failed ({e}); generate() "
                    "will raise until a tokenizer is provided"
                )
        return cls(config, params, tokenizer, gen_cfg, dtype)

    # -- features -----------------------------------------------------------

    def encoder_features(self, audio: np.ndarray) -> jnp.ndarray:
        """Pad/trim to 30 s and compute [1, 3000, n_mels] features
        (WhisperAudio.encoderFeatures)."""
        audio = np.asarray(audio, np.float32)
        if audio.shape[0] > CHUNK_LENGTH_SAMPLES:
            audio = audio[:CHUNK_LENGTH_SAMPLES]
        elif audio.shape[0] < CHUNK_LENGTH_SAMPLES:
            audio = np.pad(audio, (0, CHUNK_LENGTH_SAMPLES - audio.shape[0]))
        mel = dsp.log_mel_spectrogram(audio, n_mels=self.config.num_mel_bins)
        return mel.T[None].astype(self.dtype)

    # -- suppression masks ----------------------------------------------------

    def _suppress_masks(self, tokenizer) -> tuple[np.ndarray, np.ndarray]:
        v = self.config.vocab_size
        suppress = np.zeros((v,), np.float32)
        for tid in self.generation_config.suppress_tokens:
            if 0 <= tid < v:
                suppress[tid] = -1e9
        # suppress all timestamp tokens (reference suppressFromIndex)
        if tokenizer is not None and tokenizer.timestamp_begin is not None:
            suppress[tokenizer.timestamp_begin :] = -1e9
        begin = np.zeros((v,), np.float32)
        begin_ids = self.generation_config.begin_suppress_tokens or (
            [tokenizer.eot] if tokenizer is not None else []
        )
        for tid in begin_ids:
            if 0 <= tid < v:
                begin[tid] = -1e9
        return suppress, begin

    # -- generation -----------------------------------------------------------

    def generate(self, audio: np.ndarray,
                 generation_parameters: STTGenerateParameters | None = None
                 ) -> STTOutput:
        params = generation_parameters or STTGenerateParameters()
        tokenizer = self.tokenizer
        if tokenizer is None:
            raise RuntimeError("tokenizer not loaded; use from_pretrained")
        t_start = time.perf_counter()
        audio = np.asarray(audio, np.float32)
        if audio.ndim > 1:
            audio = audio.mean(axis=-1)

        chunks = [
            (audio[s : s + CHUNK_LENGTH_SAMPLES], s / SAMPLE_RATE)
            for s in range(0, max(len(audio), 1), CHUNK_LENGTH_SAMPLES)
        ]
        suppress, begin = self._suppress_masks(tokenizer)
        prompt = tokenizer.build_prompt_tokens(params.language, params.task)

        if params.batch_windows and len(chunks) > 1:
            # batched-window decode: all 30 s windows advance through one
            # graph, amortizing the HBM-bound decoder weight reads
            token_lists = []
            for g in range(0, len(chunks), _WINDOW_BATCH_MAX):
                group = chunks[g : g + _WINDOW_BATCH_MAX]
                token_lists.extend(self._transcribe_chunks_batched(
                    [c for c, _ in group], prompt, suppress, begin, params))
        else:
            token_lists = [
                self._transcribe_chunk(chunk, prompt, suppress, begin, params)
                for chunk, _ in chunks
            ]

        all_text, segments = [], []
        total_prompt = total_gen = 0
        for (chunk, offset), tokens in zip(chunks, token_lists):
            total_prompt += len(prompt)
            total_gen += len(tokens)
            text = tokenizer.decode(tokens).strip()
            if text:
                all_text.append(text)
                segments.append(STTSegment(
                    text=text, start=offset,
                    end=offset + len(chunk) / SAMPLE_RATE, tokens=tokens,
                ))
        elapsed = time.perf_counter() - t_start
        lang = params.language
        if lang is None and tokenizer.is_multilingual and len(prompt) > 1:
            lang = tokenizer.id_to_language.get(prompt[1])
        return STTOutput(
            text=" ".join(all_text), segments=segments, language=lang,
            prompt_token_count=total_prompt, generation_token_count=total_gen,
            prompt_time=elapsed, generation_time=elapsed, total_time=elapsed,
        )

    def generate_stream(self, audio: np.ndarray,
                        generation_parameters: STTGenerateParameters | None = None):
        """Generator yielding per-chunk text deltas then the final STTOutput
        (reference generateStream, WhisperModel.swift:93-156)."""
        params = generation_parameters or STTGenerateParameters()
        tokenizer = self.tokenizer
        audio = np.asarray(audio, np.float32)
        if audio.ndim > 1:
            audio = audio.mean(axis=-1)
        suppress, begin = self._suppress_masks(tokenizer)
        prompt = tokenizer.build_prompt_tokens(params.language, params.task)
        t_start = time.perf_counter()
        all_text, segments = [], []
        total_gen = 0
        for s in range(0, max(len(audio), 1), CHUNK_LENGTH_SAMPLES):
            chunk = audio[s : s + CHUNK_LENGTH_SAMPLES]
            tokens = self._transcribe_chunk(chunk, prompt, suppress, begin, params)
            total_gen += len(tokens)
            text = tokenizer.decode(tokens).strip()
            if text:
                yield {"type": "token", "text": text}
                all_text.append(text)
                segments.append(STTSegment(
                    text=text, start=s / SAMPLE_RATE,
                    end=(s + len(chunk)) / SAMPLE_RATE, tokens=tokens))
        elapsed = time.perf_counter() - t_start
        yield {"type": "result", "output": STTOutput(
            text=" ".join(all_text), segments=segments,
            prompt_token_count=len(prompt) * max(1, len(segments)),
            generation_token_count=total_gen,
            total_time=elapsed, generation_time=elapsed)}

    def _transcribe_chunks_batched(self, chunk_audios, prompt, suppress,
                                   begin, params: STTGenerateParameters
                                   ) -> list[list[int]]:
        """Transcribe up to ``_WINDOW_BATCH_MAX`` 30 s windows in ONE
        batched encode + ONE batched decode loop. The window count is
        padded up to a small bucket ({2,4,8}, repeating the last window)
        so any file length reuses at most three compiled graphs."""
        n = len(chunk_audios)
        bucket = next(b for b in _WINDOW_BATCH_BUCKETS if b >= n)
        padded = list(chunk_audios) + [chunk_audios[-1]] * (bucket - n)
        feats = jnp.concatenate(
            [self.encoder_features(c) for c in padded], axis=0)
        enc_out = self._encode(self.params, feats)
        max_total = min(
            self.config.max_target_positions,
            len(prompt) + max(1, params.max_tokens),
        )
        prompt_buf = np.full((self.config.max_target_positions,), 0, np.int32)
        prompt_buf[: len(prompt)] = prompt
        rng = jax.random.PRNGKey(0)
        tokens, count = self._decode_loop_b(
            self.params, enc_out,
            jnp.asarray(prompt_buf), jnp.int32(len(prompt)),
            jnp.int32(self.tokenizer.eot), jnp.asarray(suppress),
            jnp.asarray(begin), jnp.float32(params.temperature), rng,
            max_total=max_total, kv_bits=params.kv_bits,
            kv_group_size=params.kv_group_size,
            quantized_kv_start=params.quantized_kv_start,
        )
        tokens = np.asarray(tokens)
        count = int(count)
        eot = self.tokenizer.eot
        outs = []
        for r in range(n):
            gen = tokens[r, len(prompt) : count].tolist()
            if eot in gen:
                gen = gen[: gen.index(eot)]
            outs.append(gen)
        return outs

    def _fused_supported(self) -> bool:
        """Structural gate for the monolithic Pallas decoder: published
        whisper dims + int8 (w8a8) decoder weights + a TPU backend (or
        forced interpret mode for CPU tests)."""
        from tpu_audio.core import quant
        from tpu_audio.ops import pallas_fused_decoder as F

        mode = _fused_decoder_mode()
        if mode == "0" or not F.supported(self.config):
            return False
        fc1 = self.params["model"]["decoder"]["layers"]["fc1"]["weight"]
        if not isinstance(fc1, quant.Int8Tensor):
            return False
        if mode == "interpret":
            return True
        from tpu_audio.ops import pallas_kv_attention as pk

        return pk.is_tpu()

    def fused_decoder_pack(self):
        """Lazy load-time weight pack for the fused decoder kernel."""
        if self._fused_pack is None:
            from tpu_audio.ops import pallas_fused_decoder as F

            self._fused_pack = F.pack_decoder_weights(self.params,
                                                      self.config)
        return self._fused_pack

    def _transcribe_chunk(self, chunk, prompt, suppress, begin,
                          params: STTGenerateParameters) -> list[int]:
        features = self.encoder_features(chunk)
        enc_out = self._encode(self.params, features)
        max_total = min(
            self.config.max_target_positions,
            len(prompt) + max(1, params.max_tokens),
        )
        prompt_buf = np.full((self.config.max_target_positions,), 0, np.int32)
        prompt_buf[: len(prompt)] = prompt
        rng = jax.random.PRNGKey(0)
        # kv8d+w8-shaped requests route through the monolithic Pallas
        # decoder when available (mode "1"/"interpret" routes any request
        # the kernel structurally supports)
        mode = _fused_decoder_mode()
        kv8d_like = (params.kv_bits == 8
                     and params.quantized_kv_start >= max_total)
        if self._fused_supported() and (mode in ("1", "interpret")
                                        or kv8d_like):
            tokens, count = self._decode_loop_f(
                self.params, self.fused_decoder_pack(), enc_out,
                jnp.asarray(prompt_buf), jnp.int32(len(prompt)),
                jnp.int32(self.tokenizer.eot), jnp.asarray(suppress),
                jnp.asarray(begin), jnp.float32(params.temperature), rng,
                max_total=max_total,
                pallas_interpret=(mode == "interpret"),
            )
            tokens = np.asarray(tokens)
            gen = tokens[len(prompt): int(count)].tolist()
            eot = self.tokenizer.eot if self.tokenizer else None
            if eot in gen:
                gen = gen[: gen.index(eot)]
            return gen
        tokens, count = self._decode_loop(
            self.params, enc_out,
            jnp.asarray(prompt_buf), jnp.int32(len(prompt)),
            jnp.int32(self.tokenizer.eot), jnp.asarray(suppress),
            jnp.asarray(begin), jnp.float32(params.temperature), rng,
            max_total=max_total, kv_bits=params.kv_bits,
            kv_group_size=params.kv_group_size,
            quantized_kv_start=params.quantized_kv_start,
        )
        tokens = np.asarray(tokens)
        count = int(count)
        gen = tokens[len(prompt) : count].tolist()
        eot = self.tokenizer.eot if self.tokenizer else None
        if eot in gen:
            gen = gen[: gen.index(eot)]
        return gen

    def detect_language(self, audio: np.ndarray) -> tuple[str, float]:
        """Single forward pass from SOT, argmax over language tokens."""
        tokenizer = self.tokenizer
        features = self.encoder_features(np.asarray(audio, np.float32))
        enc_out = self._encode(self.params, features)
        cfg = self.config
        cross_k, cross_v = _cross_kv(self.params, enc_out, cfg)
        cache = kv_cache.init_cache(
            cfg.decoder_layers, 1, cfg.decoder_attention_heads,
            cfg.d_model // cfg.decoder_attention_heads,
            cfg.max_target_positions, self.dtype,
        )
        logits, _ = decoder_step(
            self.params, jnp.asarray([[tokenizer.sot]]), 0, cache,
            cross_k, cross_v, cfg,
        )
        probs = jax.nn.softmax(logits[0, -1].astype(jnp.float32))
        lang_ids = np.asarray(sorted(tokenizer.language_to_id.values()))
        lang_probs = np.asarray(probs)[lang_ids]
        best = int(np.argmax(lang_probs))
        return tokenizer.id_to_language[int(lang_ids[best])], float(lang_probs[best])


def _pallas_kv_enabled() -> tuple[bool, bool]:
    """(enabled, interpret): ``TPU_AUDIO_PALLAS_KV`` = ``0`` disables,
    ``interpret`` forces the kernel in interpreter mode (CPU testing);
    default is on whenever the backend is a TPU."""
    import os

    v = os.environ.get("TPU_AUDIO_PALLAS_KV", "auto")
    if v == "0":
        return False, False
    if v == "interpret":
        return True, True
    from tpu_audio.ops import pallas_kv_attention as pk

    return pk.is_tpu(), False


def _decode_loop(params, enc_out, prompt_buf, prompt_len, eot_id, suppress,
                 begin, temperature, rng, *, max_total: int, cfg: WhisperConfig,
                 kv_bits: int | None = None, kv_group_size: int = 64,
                 quantized_kv_start: int = 0):
    """One jitted graph: cross-KV precompute + prompt prefill (teacher-forced
    through the single-token step) + AR decode with fused suppression and
    sampling + on-device EOT stop. ``kv_bits=8/4`` stores the self-attention
    KV cache AND the cross-attention K/V quantized per-head-group
    (int8 symmetric / packed-int4 affine; Generation.swift:14-19 knobs).
    With ``kv_bits=8`` on TPU the cross-attention runs through the fused
    Pallas dequant+attention kernel (ops/pallas_kv_attention.py) — int8
    cross-KV is then ~1.8x FASTER than dense bf16 (0.51 vs 0.93 ms/token
    measured at large-v3 shapes on v5e); the XLA fallback path (4-bit, CPU,
    batched) materializes the dequantized KV and is a memory-footprint
    option only. ``quantized_kv_start>0`` keeps positions below it
    full precision (hybrid cache); the loop is single-token throughout, so
    any split point is safe."""
    kv_cache.validate_kv_bits(kv_bits)
    b = enc_out.shape[0]
    n_heads = cfg.decoder_attention_heads
    head_dim = cfg.d_model // n_heads
    cross_k, cross_v = _cross_kv(params, enc_out, cfg)
    cross_mode = "dense"
    cross_valid = None
    pallas_interp = False
    if kv_bits:
        from tpu_audio.ops import pallas_kv_attention as pk

        n_groups = head_dim // min(kv_group_size, head_dim)
        use_pallas, pallas_interp = _pallas_kv_enabled()
        if use_pallas and b == 1 and pk.supported(n_heads, head_dim, kv_bits):
            # transposed int8 layout for the fused kernel: 4.2x faster
            # than the XLA dequant path, 1.8x faster than dense bf16
            # (ops/pallas_kv_attention.py docstring, measured v5e)
            qt = jax.vmap(functools.partial(pk.quantize_kv_transposed,
                                            n_groups=n_groups))
            cross_k = qt(cross_k[:, 0])
            cross_v = qt(cross_v[:, 0])
            cross_mode = "pallas"
            cross_valid = jnp.asarray([enc_out.shape[1]], jnp.int32)
        else:
            quantize = jax.vmap(functools.partial(kv_cache._quantize,
                                                  n_groups=n_groups,
                                                  bits=kv_bits))
            cross_k = quantize(cross_k)
            cross_v = quantize(cross_v)
            cross_mode = "quant"
        cache = kv_cache.make_cache_for(
            cfg.decoder_layers, b, n_heads, head_dim, max_total,
            enc_out.dtype, kv_bits=kv_bits, kv_group_size=kv_group_size,
            quantized_kv_start=quantized_kv_start,
        )
    else:
        cache = kv_cache.init_cache(
            cfg.decoder_layers, b, n_heads, head_dim, max_total,
            enc_out.dtype,
        )
    tokens0 = prompt_buf[:max_total] if prompt_buf.shape[0] >= max_total else jnp.pad(
        prompt_buf, (0, max_total - prompt_buf.shape[0])
    )

    def cond(carry):
        tokens, i, cache, finished, rng = carry
        return jnp.logical_and(~finished, i < max_total - 1)

    def body(carry):
        tokens, i, cache, finished, rng = carry
        tok = jax.lax.dynamic_slice(tokens, (i,), (1,))[None]  # [1,1]
        logits, cache = decoder_step(params, tok, i, cache, cross_k, cross_v,
                                     cfg, cross_mode=cross_mode,
                                     cross_valid=cross_valid,
                                     pallas_interpret=pallas_interp)
        logits = logits[:, -1].astype(jnp.float32)  # [B, V]
        is_gen = i >= prompt_len - 1
        is_first = i == prompt_len - 1
        step_logits = logits + suppress[None]
        step_logits = jnp.where(is_first, step_logits + begin[None], step_logits)
        rng, sub = jax.random.split(rng)
        greedy = jnp.argmax(step_logits, axis=-1).astype(jnp.int32)
        sampled = jax.random.categorical(
            sub, step_logits / jnp.maximum(temperature, 1e-6), axis=-1
        ).astype(jnp.int32)
        next_tok = jnp.where(temperature <= 0.0, greedy, sampled)[0]
        # teacher-force remaining prompt tokens
        next_tok = jnp.where(is_gen, next_tok, tokens[i + 1])
        tokens = jax.lax.dynamic_update_slice(tokens, next_tok[None], (i + 1,))
        finished = jnp.logical_and(is_gen, next_tok == eot_id)
        return (tokens, i + 1, cache, finished, rng)

    init = (tokens0, jnp.int32(0), cache, jnp.bool_(False), rng)
    tokens, count, *_ = jax.lax.while_loop(cond, body, init)
    return tokens, count + 1

def _decode_loop_fused(params, pack, enc_out, prompt_buf, prompt_len,
                       eot_id, suppress, begin, temperature, rng, *,
                       max_total: int, cfg: WhisperConfig,
                       pallas_interpret: bool = False):
    """Monolithic-kernel decode: the entire per-token layer stack (self-
    attn + cross-attn + MLP x L layers) runs as ONE ``pallas_call``
    (ops/pallas_fused_decoder.py) instead of XLA's ~280 fusions.

    Semantics are the kv8d+w8 deployment config: int8 decoder weights
    with dynamic int8 activation quantization, int8 cross-attention K/V
    (per-position scales), dense bf16 self-attention cache, tanh-approx
    GELU. Prompt prefill is teacher-forced through the same single-token
    kernel (4 extra ~2 ms steps — negligible against 224 decode steps);
    suppression/sampling/EOT stop mirror :func:`_decode_loop` exactly.

    Measured on v5e (large-v3): 1.94 ms/token layer stack vs 2.80 for
    the XLA scan — see docs/DESIGN.md "The whisper decode floor"."""
    from tpu_audio.ops import pallas_fused_decoder as F

    d = cfg.d_model
    L = cfg.decoder_layers
    s_src = enc_out.shape[1]
    cross_k, cross_v = _cross_kv(params, enc_out, cfg)
    ck, ks, cv, vs = F.quantize_cross_kv(cross_k, cross_v, chunk=d // 2)
    s_max = -(-max_total // F.SUB) * F.SUB
    kc0 = jnp.zeros((L, s_max, d), jnp.bfloat16)
    vc0 = jnp.zeros((L, s_max, d), jnp.bfloat16)
    p = params["model"]["decoder"]
    tokens0 = prompt_buf[:max_total] if prompt_buf.shape[0] >= max_total \
        else jnp.pad(prompt_buf, (0, max_total - prompt_buf.shape[0]))

    def cond(carry):
        tokens, i, kc, vc, finished, rng = carry
        return jnp.logical_and(~finished, i < max_total - 1)

    def body(carry):
        tokens, i, kc, vc, finished, rng = carry
        tok = jax.lax.dynamic_slice(tokens, (i,), (1,))
        x = nn.embedding(p["embed_tokens"], tok[None])[0, 0]
        pos = jax.lax.dynamic_slice_in_dim(
            p["embed_positions"]["weight"], i, 1, axis=0)[0]
        x8 = jnp.zeros((8, d), jnp.float32).at[0].set(
            x.astype(jnp.float32) + pos.astype(jnp.float32))
        y, nk, nv = F.fused_stack(pack, ck, ks, cv, vs, kc, vc, x8, i,
                                  cfg=cfg, s_src=s_src,
                                  interpret=pallas_interpret)
        kc = jax.lax.dynamic_update_slice(
            kc, nk[:, 0:1].astype(kc.dtype), (0, i, 0))
        vc = jax.lax.dynamic_update_slice(
            vc, nv[:, 0:1].astype(vc.dtype), (0, i, 0))
        h = nn.layer_norm(p["layer_norm"], y[0:1])
        logits = nn.embedding_as_linear(
            p["embed_tokens"], h.astype(enc_out.dtype)
        ).astype(jnp.float32)                                   # [1, V]
        is_gen = i >= prompt_len - 1
        is_first = i == prompt_len - 1
        step_logits = logits + suppress[None]
        step_logits = jnp.where(is_first, step_logits + begin[None],
                                step_logits)
        rng, sub = jax.random.split(rng)
        greedy = jnp.argmax(step_logits, axis=-1).astype(jnp.int32)
        sampled = jax.random.categorical(
            sub, step_logits / jnp.maximum(temperature, 1e-6), axis=-1
        ).astype(jnp.int32)
        next_tok = jnp.where(temperature <= 0.0, greedy, sampled)[0]
        next_tok = jnp.where(is_gen, next_tok, tokens[i + 1])
        tokens = jax.lax.dynamic_update_slice(tokens, next_tok[None],
                                              (i + 1,))
        finished = jnp.logical_and(is_gen, next_tok == eot_id)
        return (tokens, i + 1, kc, vc, finished, rng)

    init = (tokens0, jnp.int32(0), kc0, vc0, jnp.bool_(False), rng)
    tokens, count, *_ = jax.lax.while_loop(cond, body, init)
    return tokens, count + 1


def _fused_decoder_mode() -> str:
    """``TPU_AUDIO_FUSED_DECODER``: ``0`` off, ``1`` force (wherever
    structurally supported), ``interpret`` force in interpreter mode
    (CPU tests), ``auto`` (default) = use for kv8d+w8-shaped requests on
    a real TPU when the decoder weights are already int8."""
    import os

    return os.environ.get("TPU_AUDIO_FUSED_DECODER", "auto")


def _decode_loop_batched(params, enc_out, prompt_buf, prompt_len, eot_id,
                         suppress, begin, temperature, rng, *,
                         max_total: int, cfg: WhisperConfig,
                         kv_bits: int | None = None, kv_group_size: int = 64,
                         quantized_kv_start: int = 0):
    """Batched-window decode: B independent 30 s windows advance through the
    SAME decode step, so the HBM-bound decoder weight reads (~0.9 GB/token
    at large-v3 w8) are amortized across all rows — the per-step cost is
    nearly flat in B, i.e. long-file decode throughput scales ~linearly
    until the MXU fills. With ``temperature <= 0`` every row reproduces the
    sequential greedy loop token-for-token (the parity test pins this);
    with sampling each row draws from a per-row ``fold_in`` key instead of
    the sequential loop's shared chunk key.

    Beyond-reference surface: the reference transcribes 30 s windows
    strictly sequentially (WhisperModel.swift:165-182). Rows that hit EOT
    keep emitting EOT so late rows can't perturb them; extraction trims at
    the first EOT.

    The fused Pallas int8 cross-KV kernel is single-row, so ``kv_bits``
    here takes the XLA quantized path; dense bf16 cross-KV is the fast
    default for batched decode.
    """
    kv_cache.validate_kv_bits(kv_bits)
    b = enc_out.shape[0]
    n_heads = cfg.decoder_attention_heads
    head_dim = cfg.d_model // n_heads
    cross_k, cross_v = _cross_kv(params, enc_out, cfg)
    cross_mode = "dense"
    if kv_bits:
        n_groups = head_dim // min(kv_group_size, head_dim)
        quantize = jax.vmap(functools.partial(
            kv_cache._quantize, n_groups=n_groups, bits=kv_bits))
        cross_k = quantize(cross_k)
        cross_v = quantize(cross_v)
        cross_mode = "quant"
        cache = kv_cache.make_cache_for(
            cfg.decoder_layers, b, n_heads, head_dim, max_total,
            enc_out.dtype, kv_bits=kv_bits, kv_group_size=kv_group_size,
            quantized_kv_start=quantized_kv_start,
        )
    else:
        cache = kv_cache.init_cache(
            cfg.decoder_layers, b, n_heads, head_dim, max_total,
            enc_out.dtype,
        )
    prompt_row = (prompt_buf[:max_total] if prompt_buf.shape[0] >= max_total
                  else jnp.pad(prompt_buf, (0, max_total - prompt_buf.shape[0])))
    tokens0 = jnp.broadcast_to(prompt_row[None], (b, max_total))

    def cond(carry):
        tokens, i, cache, finished, rng = carry
        return jnp.logical_and(~jnp.all(finished), i < max_total - 1)

    def body(carry):
        tokens, i, cache, finished, rng = carry
        tok = jax.lax.dynamic_slice(tokens, (0, i), (b, 1))  # [B,1]
        logits, cache = decoder_step(params, tok, i, cache, cross_k, cross_v,
                                     cfg, cross_mode=cross_mode)
        logits = logits[:, -1].astype(jnp.float32)  # [B, V]
        is_gen = i >= prompt_len - 1
        is_first = i == prompt_len - 1
        step_logits = logits + suppress[None]
        step_logits = jnp.where(is_first, step_logits + begin[None], step_logits)
        rng, sub = jax.random.split(rng)
        greedy = jnp.argmax(step_logits, axis=-1).astype(jnp.int32)  # [B]
        row_keys = jax.vmap(lambda r: jax.random.fold_in(sub, r))(
            jnp.arange(b, dtype=jnp.uint32))
        sampled = jax.vmap(
            lambda k, lg: jax.random.categorical(
                k, lg / jnp.maximum(temperature, 1e-6))
        )(row_keys, step_logits).astype(jnp.int32)
        next_tok = jnp.where(temperature <= 0.0, greedy, sampled)  # [B]
        # teacher-force remaining prompt tokens (shared across rows)
        next_tok = jnp.where(is_gen, next_tok, tokens[:, i + 1])
        # finished rows keep emitting EOT so extraction trims them stably
        next_tok = jnp.where(finished, eot_id, next_tok)
        tokens = jax.lax.dynamic_update_slice(tokens, next_tok[:, None],
                                              (0, i + 1))
        finished = jnp.logical_or(
            finished, jnp.logical_and(is_gen, next_tok == eot_id))
        return (tokens, i + 1, cache, finished, rng)

    init = (tokens0, jnp.int32(0), cache,
            jnp.zeros((b,), jnp.bool_), rng)
    tokens, count, *_ = jax.lax.while_loop(cond, body, init)
    return tokens, count + 1
