"""ByT5 neural grapheme-to-phoneme (charsiu-style multilingual G2P).

TPU-first rebuild of the reference (Sources/MLXAudioG2P/*): a byte-level
T5 — UTF-8 bytes + 3 special ids, inputs formatted ``<lang>: word``
(Tokenizer.swift:35-37) — with T5 relative-position-bucket attention
bias (encoder bidirectional, decoder causal), unscaled attention
(Attention.swift:40-47), RMSNorm pre-norms, and gated-gelu FFs.
Greedy decoding runs as one jitted `lax.while_loop` with a fixed-size
self-attention KV cache and the decoder position bias computed in-graph
per step.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import hub, kv_cache, loading, nn
from tpu_audio.core.jitting import ajit

__all__ = ["ByT5G2P", "T5Config", "ByT5Tokenizer"]

PAD_ID, EOS_ID, UNK_ID, BYTE_OFFSET = 0, 1, 2, 3


@dataclass
class T5Config:
    """Config.swift:3-40 (HF t5 config keys)."""

    vocab_size: int = 384
    d_model: int = 512
    d_ff: int = 1024
    d_kv: int = 64
    num_heads: int = 6
    num_layers: int = 12
    num_decoder_layers: int = 4
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    tie_word_embeddings: bool = False
    decoder_start_token_id: int = 0
    eos_token_id: int = 1
    pad_token_id: int = 0

    @classmethod
    def from_dict(cls, d: dict) -> "T5Config":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


class ByT5Tokenizer:
    """UTF-8 bytes + 3 specials (Tokenizer.swift:1-38)."""

    @staticmethod
    def encode(text: str) -> list[int]:
        return [b + BYTE_OFFSET for b in text.encode("utf-8")] + [EOS_ID]

    @staticmethod
    def decode(ids) -> str:
        out = bytearray()
        for i in ids:
            i = int(i)
            if i == EOS_ID:
                break
            if i in (PAD_ID, UNK_ID):
                continue
            b = i - BYTE_OFFSET
            if 0 <= b <= 255:
                out.append(b)
        return out.decode("utf-8", errors="ignore")

    @staticmethod
    def format_input(word: str, language: str) -> str:
        return f"<{language}>: {word}"


def _relative_bucket(rel, bidirectional: bool, num_buckets: int,
                     max_distance: int):
    """T5 relative-position bucketing (RelativePositionBias.swift:6-45)."""
    buckets = jnp.zeros_like(rel)
    if bidirectional:
        num_buckets //= 2
        buckets = buckets + (rel > 0).astype(jnp.int32) * num_buckets
        rel = jnp.abs(rel)
    else:
        rel = -jnp.minimum(rel, 0)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    rel_f = rel.astype(jnp.float32)
    large = max_exact + (
        jnp.log(jnp.maximum(rel_f, 1.0) / max_exact)
        / math.log(max_distance / max_exact) * (num_buckets - max_exact))
    large = jnp.minimum(large, num_buckets - 1).astype(jnp.int32)
    return buckets + jnp.where(is_small, rel, large)


def _position_bias(p, q_pos, k_pos, cfg: T5Config, bidirectional: bool):
    """[H, Tq, Tk] additive bias from the bucket embedding table."""
    rel = k_pos[None, :] - q_pos[:, None]
    buckets = _relative_bucket(rel, bidirectional,
                               cfg.relative_attention_num_buckets,
                               cfg.relative_attention_max_distance)
    return p["embeddings"]["weight"][buckets].transpose(2, 0, 1)


def _t5_attention(p, q_in, kv_in, cfg: T5Config, mask=None):
    """Unscaled T5 attention (Attention.swift)."""
    b, tq, _ = q_in.shape
    tk = kv_in.shape[1]
    h, dk = cfg.num_heads, cfg.d_kv
    q = nn.linear(p["query_proj"], q_in).reshape(b, tq, h, dk).transpose(
        0, 2, 1, 3)
    k = nn.linear(p["key_proj"], kv_in).reshape(b, tk, h, dk).transpose(
        0, 2, 1, 3)
    v = nn.linear(p["value_proj"], kv_in).reshape(b, tk, h, dk).transpose(
        0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(q_in.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return nn.linear(p["out_proj"],
                     o.transpose(0, 2, 1, 3).reshape(b, tq, h * dk))


def _dense(p, x, cfg: T5Config):
    if "wi" in p:  # non-gated relu FF (t5-base, used by SAM-Audio)
        return nn.linear(p["wo"], jax.nn.relu(nn.linear(p["wi"], x)))
    return nn.linear(p["wo"], nn.gelu(nn.linear(p["wi_0"], x))
                     * nn.linear(p["wi_1"], x))


def encode(params, input_ids, n_valid, cfg: T5Config):
    """[B, T] byte ids (right-padded) -> encoder memory [B, T, D]
    (Encoder.swift). Padded keys are masked so bucketing is exact."""
    p = params["encoder"]
    x = nn.embedding(params["wte"], input_ids)
    t = input_ids.shape[1]
    pos = jnp.arange(t)
    bias = _position_bias(p["relative_attention_bias"], pos, pos, cfg,
                          bidirectional=True)[None]
    # per-item valid lengths (batched callers like SAM-Audio) or a scalar
    key_valid = pos[None, :] < jnp.atleast_1d(n_valid)[:, None]  # [B, T]
    bias = bias + jnp.where(key_valid, 0.0, -1e9)[:, None, None, :]
    for i in range(cfg.num_layers):
        lp = p["layers"][str(i)]
        x = x + _t5_attention(lp["attention"],
                              nn.rms_norm(lp["ln1"], x,
                                          cfg.layer_norm_epsilon),
                              nn.rms_norm(lp["ln1"], x,
                                          cfg.layer_norm_epsilon),
                              cfg, mask=bias)
        x = x + _dense(lp["dense"],
                       nn.rms_norm(lp["ln2"], x, cfg.layer_norm_epsilon),
                       cfg)
    return nn.rms_norm(p["ln"], x, cfg.layer_norm_epsilon)


def _decoder_step(params, tok, cache, memory, mem_mask, cfg: T5Config):
    """One cached decode step with in-graph decoder position bias."""
    p = params["decoder"]
    b = tok.shape[0]
    h, dk = cfg.num_heads, cfg.d_kv
    x = nn.embedding(params["wte"], tok)
    pos = cache.offset
    k_pos = jnp.arange(cache.max_len)
    bias = _position_bias(p["relative_attention_bias"], pos[None], k_pos,
                          cfg, bidirectional=False)[None]
    key_valid = k_pos <= pos
    bias = jnp.where(key_valid[None, None, None, :], bias, -1e9)
    for i in range(cfg.num_decoder_layers):
        lp = p["layers"][str(i)]
        hn = nn.rms_norm(lp["ln1"], x, cfg.layer_norm_epsilon)
        sa = lp["self_attention"]
        q = nn.linear(sa["query_proj"], hn).reshape(b, 1, h, dk).transpose(
            0, 2, 1, 3)
        k = nn.linear(sa["key_proj"], hn).reshape(b, 1, h, dk).transpose(
            0, 2, 1, 3)
        v = nn.linear(sa["value_proj"], hn).reshape(b, 1, h, dk).transpose(
            0, 2, 1, 3)
        cache, k_full, v_full = kv_cache.update_cache(cache, i, k, v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k_full,
                            preferred_element_type=jnp.float32) + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, v_full)
        x = x + nn.linear(sa["out_proj"],
                          o.transpose(0, 2, 1, 3).reshape(b, 1, h * dk))
        hn = nn.rms_norm(lp["ln2"], x, cfg.layer_norm_epsilon)
        x = x + _t5_attention(lp["cross_attention"], hn, memory, cfg,
                              mask=mem_mask)
        hn = nn.rms_norm(lp["ln3"], x, cfg.layer_norm_epsilon)
        x = x + _dense(lp["dense"], hn, cfg)
    x = nn.rms_norm(p["ln"], x, cfg.layer_norm_epsilon)
    if cfg.tie_word_embeddings:
        logits = nn.embedding_as_linear(
            params["wte"], x / math.sqrt(cfg.d_model))
    else:
        logits = nn.linear(params["lm_head"]["linear"], x)
    cache = cache._replace(offset=cache.offset + 1)
    return logits[:, -1], cache


def sanitize(weights):
    """HF t5 names -> this module's names (Weights.swift:7-70)."""
    out = {}
    for k, v in weights.items():
        k = k.replace(".block.", ".layers.")
        k = k.replace("shared.", "wte.")
        k = k.replace("lm_head.", "lm_head.linear.")
        k = k.replace(
            "layers.0.layer.0.SelfAttention.relative_attention_bias.",
            "relative_attention_bias.embeddings.")
        if k.startswith("encoder."):
            k = k.replace(".layer.0.SelfAttention.", ".attention.")
            k = k.replace(".layer.1.DenseReluDense.", ".dense.")
            k = k.replace(".layer.0.layer_norm.", ".ln1.")
            k = k.replace(".layer.1.layer_norm.", ".ln2.")
        elif k.startswith("decoder."):
            k = k.replace(".layer.0.SelfAttention.", ".self_attention.")
            k = k.replace(".layer.1.EncDecAttention.", ".cross_attention.")
            k = k.replace(".layer.2.DenseReluDense.", ".dense.")
            k = k.replace(".layer.0.layer_norm.", ".ln1.")
            k = k.replace(".layer.1.layer_norm.", ".ln2.")
            k = k.replace(".layer.2.layer_norm.", ".ln3.")
        k = k.replace(".final_layer_norm.", ".ln.")
        for a, b in ((".k.", ".key_proj."), (".o.", ".out_proj."),
                     (".q.", ".query_proj."), (".v.", ".value_proj.")):
            k = k.replace(a, b)
        if ".cross_attention.relative_attention_bias." in k:
            continue
        out[k] = v
    return out


class ByT5G2P:
    """Word -> phoneme string (G2P.swift:5-56)."""

    def __init__(self, config: T5Config, params, max_length: int = 50,
                 dtype=jnp.float32):
        self.config = config
        self.params = params
        self.max_length = max_length
        self.dtype = dtype
        self._encode = ajit(functools.partial(encode, cfg=config))
        self._loops: dict = {}

    @classmethod
    def from_pretrained(cls, repo_or_path: str, max_length: int = 50,
                        dtype=jnp.float32) -> "ByT5G2P":
        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = T5Config.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        return cls(config, params, max_length, dtype)

    def _get_loop(self):
        if "loop" in self._loops:
            return self._loops["loop"]
        cfg = self.config
        max_len = self.max_length

        def loop(params, memory, n_valid):
            cache = kv_cache.init_cache(cfg.num_decoder_layers, 1,
                                        cfg.num_heads, cfg.d_kv,
                                        max_len + 1, jnp.float32)
            tokens = jnp.zeros((max_len,), jnp.int32)
            mem_mask = jnp.where(jnp.arange(memory.shape[1]) < n_valid,
                                 0.0, -1e9)[None, None, None, :]

            def cond(c):
                _, i, _, last = c
                return jnp.logical_and(last != cfg.eos_token_id, i < max_len)

            def body(c):
                tokens, i, cache, last = c
                logits, cache = _decoder_step(params, last[None, None],
                                              cache, memory, mem_mask, cfg)
                nxt = jnp.argmax(logits[0].astype(jnp.float32)).astype(
                    jnp.int32)
                tokens = tokens.at[i].set(nxt)
                return tokens, i + 1, cache, nxt

            start = jnp.int32(cfg.decoder_start_token_id)
            tokens, count, *_ = jax.lax.while_loop(
                cond, body, (tokens, jnp.int32(0), cache, start))
            return tokens, count

        self._loops["loop"] = ajit(loop)
        return self._loops["loop"]

    def convert(self, word: str, language: str) -> str:
        ids = ByT5Tokenizer.encode(ByT5Tokenizer.format_input(word, language))
        # bucket input lengths to limit recompiles
        bucket = max(8, 1 << (len(ids) - 1).bit_length())
        padded = np.full((1, bucket), PAD_ID, np.int32)
        padded[0, : len(ids)] = ids
        n = jnp.int32(len(ids))
        memory = self._encode(self.params, jnp.asarray(padded), n)
        tokens, count = self._get_loop()(self.params, memory, n)
        out = np.asarray(tokens)[: int(count)].tolist()
        return ByT5Tokenizer.decode(out)

    def convert_batch(self, words, language: str) -> list[str]:
        return [self.convert(w, language) for w in words]
