"""Misaki English G2P BART fallback network for out-of-lexicon words.

Reference: Models/StyleTTS2/G2P/FallbackNetwork/{BARTModel,BARTConfig,
BARTEncoderLayer,BARTDecoderLayer,EnglishFallbackNetwork}.swift — a tiny
character-level BART (post-LN, learned positions with the BART +2 offset,
shared embedding tied to the LM head plus final_logits_bias) mapping
grapheme characters to phoneme characters; tokens <= id 3 are specials
(pad/bos/eos/unk).

TPU design: greedy generation runs as ONE jitted ``lax.while_loop`` over a
fixed-capacity decoder buffer (the reference re-decodes the growing prefix
each step host-side, BARTModel.swift:110-139); encoder + decode loop is a
single device call per word.
"""

from __future__ import annotations

import functools
import json
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import loading, nn
from tpu_audio.core.jitting import ajit

__all__ = ["BartG2PConfig", "BartFallbackNetwork"]

UNKNOWN_TOKEN_ID = 3  # EnglishFallbackNetwork.unknownTokenId


@dataclass
class BartG2PConfig:
    """``{us,gb}_bart_config.json`` (BARTConfig.swift:1-76)."""

    d_model: int = 256
    encoder_layers: int = 3
    decoder_layers: int = 3
    encoder_attention_heads: int = 4
    decoder_attention_heads: int = 4
    encoder_ffn_dim: int = 1024
    decoder_ffn_dim: int = 1024
    vocab_size: int = 128
    max_position_embeddings: int = 64
    bos_token_id: int = 0
    eos_token_id: int = 2
    pad_token_id: int = 1
    grapheme_chars: str = ""
    phoneme_chars: str = ""

    @classmethod
    def from_dict(cls, d: dict) -> "BartG2PConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


def _attention(p, x, kv, n_heads: int, mask=None):
    b, t, d = x.shape
    hd = d // n_heads
    q = nn.linear(p["q_proj"], x).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
    k = nn.linear(p["k_proj"], kv).reshape(b, -1, n_heads, hd).transpose(0, 2, 1, 3)
    v = nn.linear(p["v_proj"], kv).reshape(b, -1, n_heads, hd).transpose(0, 2, 1, 3)
    o = nn.sdpa(q, k, v, mask=mask)
    return nn.linear(p["out_proj"], o.transpose(0, 2, 1, 3).reshape(b, t, d))


def _ffn(p, x):
    return nn.linear(p["fc2"], nn.gelu(nn.linear(p["fc1"], x)))


def encode(params, input_ids, cfg: BartG2PConfig, mask=None):
    """input_ids [B, S] -> encoder hidden [B, S, D] (BARTModel.encode)."""
    p = params["model"]
    t = input_ids.shape[1]
    h = nn.embedding(p["shared"], input_ids)
    h = h + p["encoder"]["embed_positions"]["weight"][2 : t + 2][None]
    h = nn.layer_norm(p["encoder"]["layernorm_embedding"], h)
    for i in range(cfg.encoder_layers):
        lp = p["encoder"]["layers"][str(i)]
        h = nn.layer_norm(lp["self_attn_layer_norm"],
                          h + _attention(lp["self_attn"], h, h,
                                         cfg.encoder_attention_heads, mask))
        h = nn.layer_norm(lp["final_layer_norm"], h + _ffn(lp, h))
    return h


def decode(params, input_ids, enc_out, cfg: BartG2PConfig, self_mask=None):
    """input_ids [B, T] -> logits [B, T, V] (BARTModel.decode)."""
    p = params["model"]
    t = input_ids.shape[1]
    h = nn.embedding(p["shared"], input_ids)
    h = h + p["decoder"]["embed_positions"]["weight"][2 : t + 2][None]
    h = nn.layer_norm(p["decoder"]["layernorm_embedding"], h)
    for i in range(cfg.decoder_layers):
        lp = p["decoder"]["layers"][str(i)]
        h = nn.layer_norm(lp["self_attn_layer_norm"],
                          h + _attention(lp["self_attn"], h, h,
                                         cfg.decoder_attention_heads,
                                         self_mask))
        h = nn.layer_norm(lp["encoder_attn_layer_norm"],
                          h + _attention(lp["encoder_attn"], h, enc_out,
                                         cfg.decoder_attention_heads))
        h = nn.layer_norm(lp["final_layer_norm"], h + _ffn(lp, h))
    logits = nn.embedding_as_linear(p["shared"], h)
    if "final_logits_bias" in params:
        logits = logits + params["final_logits_bias"].reshape(-1)[None, None]
    return logits


def _greedy_generate(params, input_ids, src_mask, cfg: BartG2PConfig,
                     max_length: int):
    """One jitted graph: encode + greedy decode into a fixed [1, max_length]
    buffer (causal mask; only the current position's logits are consumed, so
    this matches the reference's unmasked growing-prefix decode)."""
    enc_out = encode(params, input_ids, cfg,
                     mask=src_mask[:, None, None, :])
    buf = jnp.full((1, max_length), cfg.pad_token_id, jnp.int32)
    buf = buf.at[0, 0].set(cfg.bos_token_id)
    causal = jnp.tril(jnp.ones((max_length, max_length), bool))[None, None]

    def cond(c):
        i, buf, finished = c
        return (~finished) & (i < max_length - 1)

    def body(c):
        i, buf, finished = c
        logits = decode(params, buf, enc_out, cfg, self_mask=causal)
        nxt = jnp.argmax(logits[0, i].astype(jnp.float32)).astype(jnp.int32)
        buf = buf.at[0, i + 1].set(nxt)
        return i + 1, buf, nxt == cfg.eos_token_id

    n, buf, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), buf, jnp.bool_(False)))
    return buf, n


class BartFallbackNetwork:
    """Word -> phoneme string via the BART G2P (EnglishFallbackNetwork)."""

    def __init__(self, config: BartG2PConfig, params, max_length: int = 50):
        self.config = config
        self.params = params
        self.max_length = max_length
        self.grapheme_to_token = {c: i for i, c
                                  in enumerate(config.grapheme_chars)}
        self.token_to_phoneme = dict(enumerate(config.phoneme_chars))
        self._generate = ajit(functools.partial(
            _greedy_generate, cfg=config, max_length=max_length))

    @classmethod
    def from_pretrained(cls, directory: str | Path, british: bool = False
                        ) -> "BartFallbackNetwork | None":
        """Load ``{us,gb}_bart{.safetensors,_config.json}`` from a Kokoro
        checkpoint directory; returns None when absent (the lexicon-only
        path stays available). British falls back to the US files
        (EnglishFallbackNetwork.loadConfig/loadWeights)."""
        directory = Path(directory)
        prefixes = ["gb", "us"] if british else ["us"]
        for prefix in prefixes:
            cfg_path = directory / f"{prefix}_bart_config.json"
            w_path = directory / f"{prefix}_bart.safetensors"
            if cfg_path.exists() and w_path.exists():
                cfg = BartG2PConfig.from_dict(json.loads(cfg_path.read_text()))
                flat = loading.load_safetensors_file(w_path)
                params = jax.tree.map(jnp.asarray, loading.unflatten(flat))
                return cls(cfg, params)
        return None

    def graphemes_to_tokens(self, word: str) -> list[int]:
        return ([self.config.bos_token_id]
                + [self.grapheme_to_token.get(c, UNKNOWN_TOKEN_ID)
                   for c in word]
                + [self.config.eos_token_id])

    def tokens_to_phonemes(self, tokens) -> str:
        return "".join(self.token_to_phoneme.get(int(t), "")
                       for t in tokens if int(t) > UNKNOWN_TOKEN_ID)

    def __call__(self, word: str) -> tuple[str, int]:
        """-> (phonemes, rating=1) (EnglishFallbackNetwork.callAsFunction)."""
        ids = self.graphemes_to_tokens(word)
        # bucket the source length so repeated words share compiled graphs
        bucket = 8 * max(1, -(-len(ids) // 8))
        padded = np.full((1, bucket), self.config.pad_token_id, np.int32)
        padded[0, : len(ids)] = ids
        mask = np.zeros((1, bucket), bool)
        mask[0, : len(ids)] = True
        buf, n = self._generate(self.params, jnp.asarray(padded),
                                jnp.asarray(mask))
        out = np.asarray(buf)[0, 1 : int(n) + 1]
        out = [t for t in out.tolist() if t != self.config.eos_token_id]
        return self.tokens_to_phonemes(out), 1

    def convert(self, word: str, language: str | None = None) -> str:
        """Misaki fallback-hook interface (matches ByT5G2P.convert)."""
        return self(word)[0]
