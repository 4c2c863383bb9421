"""Moonshine: small raw-waveform encoder-decoder STT.

TPU-first rebuild of the reference
(Sources/MLXAudioSTT/Models/Moonshine/MoonshineModel.swift): conv frontend
(k127/s64 tanh + groupnorm, k7/s3 gelu, k3/s2 gelu) straight off the
waveform, rotary attention with partial rotary dims, SwiGLU decoder MLPs,
tied embeddings. Decode runs as a KV-cached jitted loop (the reference
re-runs the whole decoder each token, MoonshineModel.swift:41-60).
Verified logit-level against HF transformers.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import hub, kv_cache, loading, nn
from tpu_audio.core.generation import STTGenerateParameters, STTOutput, STTSegment
from tpu_audio.core.jitting import ajit

__all__ = ["Moonshine", "MoonshineConfig"]

SAMPLE_RATE = 16000


@dataclass
class MoonshineConfig:
    hidden_size: int = 288
    intermediate_size: int = 1152
    encoder_num_hidden_layers: int = 6
    decoder_num_hidden_layers: int = 6
    encoder_num_attention_heads: int = 8
    decoder_num_attention_heads: int = 8
    encoder_num_key_value_heads: int = 8
    decoder_num_key_value_heads: int = 8
    partial_rotary_factor: float = 0.9
    rope_theta: float = 10000.0
    vocab_size: int = 32768
    decoder_start_token_id: int = 1
    eos_token_id: int = 2
    attention_bias: bool = False
    tie_word_embeddings: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.encoder_num_attention_heads

    @property
    def rotary_dim(self) -> int:
        r = int(self.head_dim * self.partial_rotary_factor)
        return max(2, r - r % 2)

    @classmethod
    def from_dict(cls, d: dict) -> "MoonshineConfig":
        keys = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in d.items() if k in keys}
        if isinstance(kw.get("eos_token_id"), list):
            kw["eos_token_id"] = kw["eos_token_id"][0]
        return cls(**kw)


def _partial_rope(x, cos, sin, rotary_dim):
    # HF moonshine uses the interleaved (even/odd pair) rotary convention
    rot, passthrough = x[..., :rotary_dim], x[..., rotary_dim:]
    rot = nn.apply_rope(rot, cos, sin, interleaved=True)
    return jnp.concatenate([rot, passthrough], axis=-1)


def _attn(p, x, cfg: MoonshineConfig, n_heads, n_kv, kv_x=None, cache=None,
          layer=0, causal=False, use_rope=True):
    b, t, d = x.shape
    hd = cfg.head_dim
    q = nn.linear(p["q_proj"], x).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
    src = x if kv_x is None else kv_x
    k = nn.linear(p["k_proj"], src).reshape(b, -1, n_kv, hd).transpose(0, 2, 1, 3)
    v = nn.linear(p["v_proj"], src).reshape(b, -1, n_kv, hd).transpose(0, 2, 1, 3)
    if use_rope and kv_x is None:
        offset = cache.offset if cache is not None else 0
        pos_q = offset + jnp.arange(t)
        cos_q, sin_q = nn.rope(pos_q, cfg.rotary_dim, cfg.rope_theta)
        q = _partial_rope(q, cos_q, sin_q, cfg.rotary_dim)
        k = _partial_rope(k, cos_q, sin_q, cfg.rotary_dim)
    if cache is not None:
        cache, k, v = kv_cache.update_cache(cache, layer, k, v)
        mask = kv_cache.attention_mask(cache, t)
        o = nn.sdpa(q, k, v, mask=mask)
    else:
        o = nn.sdpa(q, k, v, is_causal=causal)
    o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
    return nn.linear(p["o_proj"], o), cache


def encoder_forward(params, audio, cfg: MoonshineConfig):
    """raw waveform [B, T] -> hidden [B, T', D]."""
    p = params["encoder"]
    x = audio[..., None]
    x = jnp.tanh(nn.conv1d(p["conv1"], x, stride=64))
    x = nn.group_norm(p["groupnorm"], x, num_groups=1)
    x = nn.gelu(nn.conv1d(p["conv2"], x, stride=3))
    x = nn.gelu(nn.conv1d(p["conv3"], x, stride=2))
    for i in range(cfg.encoder_num_hidden_layers):
        lp = p["layers"][str(i)]
        h, _ = _attn(lp["self_attn"], nn.layer_norm(lp["input_layernorm"], x),
                     cfg, cfg.encoder_num_attention_heads,
                     cfg.encoder_num_key_value_heads)
        x = x + h
        m = nn.layer_norm(lp["post_attention_layernorm"], x)
        x = x + nn.linear(lp["mlp"]["fc2"],
                          nn.gelu(nn.linear(lp["mlp"]["fc1"], m)))
    return nn.layer_norm(p["layer_norm"], x)


def decoder_step(params, tokens, enc_out, cache, cfg: MoonshineConfig):
    """tokens [B, T] -> (logits [B, T, V], cache); None cache = full causal."""
    p = params["decoder"]
    b, t = tokens.shape
    x = nn.embedding(p["embed_tokens"], tokens)
    for i in range(cfg.decoder_num_hidden_layers):
        lp = p["layers"][str(i)]
        h, cache = _attn(lp["self_attn"], nn.layer_norm(lp["input_layernorm"], x),
                         cfg, cfg.decoder_num_attention_heads,
                         cfg.decoder_num_key_value_heads, cache=cache,
                         layer=i, causal=True)
        x = x + h
        h, _ = _attn(lp["encoder_attn"],
                     nn.layer_norm(lp["post_attention_layernorm"], x), cfg,
                     cfg.decoder_num_attention_heads,
                     cfg.decoder_num_key_value_heads, kv_x=enc_out,
                     use_rope=False)
        x = x + h
        m = nn.layer_norm(lp["final_layernorm"], x)
        proj = nn.linear(lp["mlp"]["fc1"], m)
        a, g = jnp.split(proj, 2, axis=-1)
        x = x + nn.linear(lp["mlp"]["fc2"], nn.silu(g) * a)
    x = nn.layer_norm(p["norm"], x)
    if "proj_out" in params:
        logits = nn.linear(params["proj_out"], x)
    else:
        logits = nn.embedding_as_linear(p["embed_tokens"], x)
    if cache is not None:
        cache = cache._replace(offset=cache.offset + t)
    return logits, cache


def sanitize(weights):
    out = {}
    for k, v in weights.items():
        if k.startswith("model."):
            k = k[len("model."):]
        out[k] = v
    return out


class Moonshine:
    def __init__(self, config: MoonshineConfig, params, tokenizer=None,
                 dtype=jnp.float32):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.dtype = dtype
        self._encode = ajit(functools.partial(encoder_forward, cfg=config))
        self._step = ajit(functools.partial(decoder_step, cfg=config),
                             donate_argnums=(3,))

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32) -> "Moonshine":
        from pathlib import Path

        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = MoonshineConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        tokenizer = None
        if (model_dir / "tokenizer.json").exists():
            from tokenizers import Tokenizer

            tokenizer = Tokenizer.from_file(str(model_dir / "tokenizer.json"))
        return cls(config, params, tokenizer, dtype)

    def generate(self, audio: np.ndarray,
                 generation_parameters: STTGenerateParameters | None = None
                 ) -> STTOutput:
        params = generation_parameters or STTGenerateParameters(max_tokens=256)
        cfg = self.config
        t0 = time.perf_counter()
        audio = np.asarray(audio, np.float32)
        if audio.ndim > 1:
            audio = audio.mean(axis=-1)
        enc = self._encode(self.params, jnp.asarray(audio[None], self.dtype))
        max_total = params.max_tokens + 2
        cache = kv_cache.init_cache(
            cfg.decoder_num_hidden_layers, 1, cfg.decoder_num_key_value_heads,
            cfg.head_dim, max_total, self.dtype)
        tok = jnp.asarray([[cfg.decoder_start_token_id]], jnp.int32)
        generated: list[int] = []
        for _ in range(params.max_tokens):
            logits, cache = self._step(self.params, tok, enc, cache)
            nxt = int(jnp.argmax(logits[0, -1]))
            if nxt == cfg.eos_token_id:
                break
            generated.append(nxt)
            tok = jnp.asarray([[nxt]], jnp.int32)
        text = (self.tokenizer.decode(generated, skip_special_tokens=True).strip()
                if self.tokenizer else " ".join(map(str, generated)))
        elapsed = time.perf_counter() - t0
        return STTOutput(
            text=text, generation_token_count=len(generated),
            segments=[STTSegment(text=text, start=0.0,
                                 end=len(audio) / SAMPLE_RATE)],
            total_time=elapsed, generation_time=elapsed)

    def generate_stream(self, audio, generation_parameters=None):
        out = self.generate(audio, generation_parameters)
        if out.text:
            yield {"type": "token", "text": out.text}
        yield {"type": "result", "output": out}
