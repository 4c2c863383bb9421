"""Canary: NVIDIA attention-encoder-decoder multilingual ASR/AST.

TPU-first rebuild of the reference
(Sources/MLXAudioSTT/Models/Canary/*): the Parakeet FastConformer
encoder (reused from `parakeet.py`) with an optional output projection,
and a post-LN-free transformer decoder — embedding + fixed interleaved
sin/cos positions scaled by 1/sqrt(d) (CanaryModel.swift:166-198),
embedding LayerNorm, pre-norm blocks (self-attn, cross-attn, relu FFN),
final norm and an output projection. Prompts are NeMo canary control
tokens ([startofcontext, startoftranscript, emo, <src>, <tgt>, pnc...],
CanaryModel.swift:63-81).

Unlike the reference's per-token full-decoder re-runs
(CanaryModel.swift:401-417, O(T^2) in decoded length), decoding here is
one jitted `lax.while_loop` with a KV cache for self-attention and
precomputed per-layer cross K/V — the whisper decode pattern.
"""

from __future__ import annotations

import functools
import math
import time
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import hub, kv_cache, loading, nn
from tpu_audio.core.audio_io import resample_audio
from tpu_audio.core.generation import (
    STTGenerateParameters,
    STTOutput,
    STTSegment,
)
from tpu_audio.models.stt import parakeet
from tpu_audio.core.jitting import ajit

__all__ = ["Canary", "CanaryConfig"]


@dataclass
class CanaryDecoderConfig:
    num_layers: int = 8
    hidden_size: int = 1024
    num_attention_heads: int = 16
    inner_size: int = 4096


@dataclass
class CanaryConfig:
    """CanaryConfig.swift:254-346."""

    preprocess: parakeet.PreprocessConfig = field(
        default_factory=parakeet.PreprocessConfig)
    encoder: parakeet.ConformerConfig = field(
        default_factory=parakeet.ConformerConfig)
    decoder: CanaryDecoderConfig = field(default_factory=CanaryDecoderConfig)
    vocab_size: int = 16384
    enc_output_dim: int = 1024
    startofcontext_id: int = 0
    startoftranscript_id: int = 1
    emo_undefined_id: int = 2
    endoftext_id: int = 3
    supported_languages: tuple = ("en", "de", "es", "fr")
    max_target_positions: int = 1024

    @classmethod
    def from_dict(cls, d: dict) -> "CanaryConfig":
        pre_keys = set(parakeet.PreprocessConfig.__dataclass_fields__)
        enc_keys = set(parakeet.ConformerConfig.__dataclass_fields__)
        dec_keys = set(CanaryDecoderConfig.__dataclass_fields__)
        pre = parakeet.PreprocessConfig(**{
            k: v for k, v in d.get("preprocessor", {}).items()
            if k in pre_keys})
        enc = parakeet.ConformerConfig(**{
            k: v for k, v in d.get("encoder", {}).items() if k in enc_keys})
        dec_src = d.get("decoder", d.get("transf_decoder", {}))
        if "decoder" in dec_src:  # NeMo nests one level deeper
            dec_src = dec_src["decoder"]
        dec = CanaryDecoderConfig(**{
            k: v for k, v in dec_src.items() if k in dec_keys})
        keys = set(cls.__dataclass_fields__) - {"preprocess", "encoder",
                                                "decoder"}
        kw = {k: v for k, v in d.items() if k in keys}
        if "supported_languages" in kw:
            kw["supported_languages"] = tuple(kw["supported_languages"])
        return cls(preprocess=pre, encoder=enc, decoder=dec, **kw)


def _position_table(d_model: int, max_len: int) -> np.ndarray:
    """Interleaved sin/cos positions scaled by 1/sqrt(d)
    (CanaryModel.swift:166-182)."""
    table = np.zeros((max_len, d_model), np.float32)
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    ch = np.arange(0, d_model, 2, dtype=np.float32)
    div = np.exp(-math.log(10000.0) * ch / d_model)
    table[:, 0::2] = np.sin(pos * div)
    table[:, 1::2] = np.cos(pos * div[: (d_model // 2)])
    return table / math.sqrt(d_model)


def _attn(p, q_in, kv, n_heads: int, mask=None):
    b, tq, d = q_in.shape
    hd = d // n_heads
    q = nn.linear(p["q_proj"], q_in).reshape(b, tq, n_heads, hd)
    k = nn.linear(p["k_proj"], kv).reshape(b, kv.shape[1], n_heads, hd)
    v = nn.linear(p["v_proj"], kv).reshape(b, kv.shape[1], n_heads, hd)
    o = nn.sdpa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), mask=mask)
    return nn.linear(p["out_proj"], o.transpose(0, 2, 1, 3).reshape(b, tq, d))


def decoder_forward(params, tokens, enc_out, cfg: CanaryConfig,
                    enc_mask=None, start_position: int = 0):
    """Full (non-cached) decoder pass, used for training/prefill parity
    (CanaryModel.swift:306-329)."""
    p = params["decoder"]
    d = cfg.enc_output_dim
    x = nn.embedding(p["embedding"], tokens)
    table = jnp.asarray(_position_table(d, cfg.max_target_positions))
    t = tokens.shape[1]
    x = x + table[start_position:start_position + t][None].astype(x.dtype)
    x = nn.layer_norm(p["embedding_layer_norm"], x)
    causal = jnp.where(
        jnp.arange(t)[:, None] >= jnp.arange(t)[None, :], 0.0, -1e9)[
        None, None].astype(jnp.float32)
    for i in range(cfg.decoder.num_layers):
        bp = p["blocks"][str(i)]
        h = nn.layer_norm(bp["self_attn_norm"], x)
        x = x + _attn(bp["self_attn"], h, h,
                      cfg.decoder.num_attention_heads, mask=causal)
        h = nn.layer_norm(bp["cross_attn_norm"], x)
        x = x + _attn(bp["cross_attn"], h, enc_out,
                      cfg.decoder.num_attention_heads, mask=enc_mask)
        h = nn.layer_norm(bp["ff_norm"], x)
        x = x + nn.linear(bp["ff2"], jax.nn.relu(nn.linear(bp["ff1"], h)))
    return nn.linear(p["output_proj"], nn.layer_norm(p["final_norm"], x))


def _cross_kv(params, enc_out, cfg: CanaryConfig):
    """Precompute per-layer cross-attention K/V (whisper pattern)."""
    n, hd = cfg.decoder.num_attention_heads, \
        cfg.enc_output_dim // cfg.decoder.num_attention_heads
    b, s, _ = enc_out.shape
    ks, vs = [], []
    for i in range(cfg.decoder.num_layers):
        bp = params["decoder"]["blocks"][str(i)]["cross_attn"]
        k = nn.linear(bp["k_proj"], enc_out).reshape(b, s, n, hd)
        v = nn.linear(bp["v_proj"], enc_out).reshape(b, s, n, hd)
        ks.append(k.transpose(0, 2, 1, 3))
        vs.append(v.transpose(0, 2, 1, 3))
    return jnp.stack(ks), jnp.stack(vs)


def _decoder_step(params, tok, cache, cross_k, cross_v, enc_mask,
                  cfg: CanaryConfig):
    """One cached decode step. tok [B, 1]; cache holds self-attn K/V."""
    p = params["decoder"]
    d = cfg.enc_output_dim
    nh = cfg.decoder.num_attention_heads
    hd = d // nh
    x = nn.embedding(p["embedding"], tok)
    table = jnp.asarray(_position_table(d, cfg.max_target_positions))
    pos = jnp.clip(cache.offset, 0, cfg.max_target_positions - 1)
    x = x + jax.lax.dynamic_slice_in_dim(table, pos, 1, axis=0)[
        None].astype(x.dtype)
    x = nn.layer_norm(p["embedding_layer_norm"], x)
    b = tok.shape[0]
    for i in range(cfg.decoder.num_layers):
        bp = p["blocks"][str(i)]
        h = nn.layer_norm(bp["self_attn_norm"], x)
        q = nn.linear(bp["self_attn"]["q_proj"], h).reshape(b, 1, nh, hd)
        k = nn.linear(bp["self_attn"]["k_proj"], h).reshape(b, 1, nh, hd)
        v = nn.linear(bp["self_attn"]["v_proj"], h).reshape(b, 1, nh, hd)
        cache, k_full, v_full = kv_cache.update_cache(
            cache, i, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3))
        mask = kv_cache.attention_mask(cache, 1)
        o = nn.sdpa(q.transpose(0, 2, 1, 3), k_full, v_full, mask=mask)
        x = x + nn.linear(bp["self_attn"]["out_proj"],
                          o.transpose(0, 2, 1, 3).reshape(b, 1, d))
        h = nn.layer_norm(bp["cross_attn_norm"], x)
        q = nn.linear(bp["cross_attn"]["q_proj"], h).reshape(
            b, 1, nh, hd).transpose(0, 2, 1, 3)
        o = nn.sdpa(q, cross_k[i], cross_v[i], mask=enc_mask)
        x = x + nn.linear(bp["cross_attn"]["out_proj"],
                          o.transpose(0, 2, 1, 3).reshape(b, 1, d))
        h = nn.layer_norm(bp["ff_norm"], x)
        x = x + nn.linear(bp["ff2"], jax.nn.relu(nn.linear(bp["ff1"], h)))
    logits = nn.linear(p["output_proj"], nn.layer_norm(p["final_norm"], x))
    cache = cache._replace(offset=cache.offset + 1)
    return logits[:, -1], cache


def sanitize(weights):
    """CanaryModel.swift:478-486/535-700: NeMo and MLX-native layouts
    both mapped to [encoder.* (parakeet naming), decoder.blocks.*]."""
    is_mlx_native = any(k.startswith("transf_decoder.layers.")
                        or k.startswith("head.classifier.")
                        for k in weights)
    out = {}
    for k, v in weights.items():
        if ("num_batches_tracked" in k or "attn_dropout" in k
                or "layer_dropout" in k or k.startswith("encoder_decoder_proj.")
                or "position_embedding" in k
                or k == "log_softmax.mlp.log_softmax"):
            continue
        nk = None
        if k.startswith("encoder."):
            nk = k  # parakeet.sanitize handles the encoder subtree below
        elif is_mlx_native:
            if k.startswith("transf_decoder.token_embedding."):
                nk = "decoder.embedding." + k.split(".", 2)[2]
            elif k.startswith("transf_decoder.embedding_layer_norm."):
                nk = "decoder.embedding_layer_norm." + k.split(".", 2)[2]
            elif k.startswith("transf_decoder.final_layer_norm."):
                nk = "decoder.final_norm." + k.split(".", 2)[2]
            elif k.startswith("head.classifier."):
                nk = "decoder.output_proj." + k.split(".", 2)[2]
            elif k.startswith("transf_decoder.layers."):
                rest = k[len("transf_decoder.layers."):]
                layer, sub = rest.split(".", 1)
                for a, bnm in (("first_sub_layer.", "self_attn."),
                               ("second_sub_layer.", "cross_attn."),
                               ("layer_norm_1.", "self_attn_norm."),
                               ("layer_norm_2.", "cross_attn_norm."),
                               ("layer_norm_3.", "ff_norm."),
                               ("third_sub_layer.linear1.", "ff1."),
                               ("third_sub_layer.linear2.", "ff2.")):
                    if sub.startswith(a):
                        sub = bnm + sub[len(a):]
                        break
                for a, bnm in (("linear_q.", "q_proj."),
                               ("linear_k.", "k_proj."),
                               ("linear_v.", "v_proj."),
                               ("linear_out.", "out_proj.")):
                    sub = sub.replace(a, bnm)
                nk = f"decoder.blocks.{layer}.{sub}"
        else:  # NeMo export naming
            if k.startswith("transf_decoder._embedding.token_embedding."):
                nk = "decoder.embedding." + k.rsplit(".", 1)[1]
            elif k.startswith("transf_decoder._embedding.layer_norm."):
                nk = "decoder.embedding_layer_norm." + k.rsplit(".", 1)[1]
            elif k.startswith("transf_decoder._decoder.final_layer_norm."):
                nk = "decoder.final_norm." + k.rsplit(".", 1)[1]
            elif k.startswith("log_softmax.mlp.layer0."):
                nk = "decoder.output_proj." + k.rsplit(".", 1)[1]
            elif k.startswith("transf_decoder._decoder.layers."):
                rest = k[len("transf_decoder._decoder.layers."):]
                layer, sub = rest.split(".", 1)
                for a, bnm in (("first_sub_layer.query_net.", "self_attn.q_proj."),
                               ("first_sub_layer.key_net.", "self_attn.k_proj."),
                               ("first_sub_layer.value_net.", "self_attn.v_proj."),
                               ("first_sub_layer.out_projection.", "self_attn.out_proj."),
                               ("second_sub_layer.query_net.", "cross_attn.q_proj."),
                               ("second_sub_layer.key_net.", "cross_attn.k_proj."),
                               ("second_sub_layer.value_net.", "cross_attn.v_proj."),
                               ("second_sub_layer.out_projection.", "cross_attn.out_proj."),
                               ("third_sub_layer.dense_in.", "ff1."),
                               ("third_sub_layer.dense_out.", "ff2."),
                               ("layer_norm_1.", "self_attn_norm."),
                               ("layer_norm_2.", "cross_attn_norm."),
                               ("layer_norm_3.", "ff_norm.")):
                    if sub.startswith(a):
                        sub = bnm + sub[len(a):]
                        break
                nk = f"decoder.blocks.{layer}.{sub}"
            else:
                nk = k
        if nk is None:
            continue
        out[nk] = v
    # encoder subtree: reuse parakeet's conv renumbering + layout rules
    enc = {k: v for k, v in out.items() if k.startswith("encoder.")}
    rest = {k: v for k, v in out.items() if not k.startswith("encoder.")}
    rest.update(parakeet.sanitize(enc))
    return rest


class CanaryTokenizer:
    """tokens.txt ("<token> <id>" lines) + optional tokenizer.json
    (CanaryModel.swift:8-163)."""

    def __init__(self, model_dir: Path, cfg: CanaryConfig):
        self.cfg = cfg
        self.token_to_id: dict[str, int] = {}
        self.id_to_token: dict[int, str] = {}
        self.tok = None
        tokens_txt = model_dir / "tokens.txt"
        if tokens_txt.exists():
            for line in tokens_txt.read_text().splitlines():
                parts = line.rsplit(" ", 1)
                if len(parts) == 2 and parts[1].lstrip("-").isdigit():
                    self.token_to_id[parts[0]] = int(parts[1])
            self.id_to_token = {v: k for k, v in self.token_to_id.items()}
        tok_json = model_dir / "tokenizer.json"
        if tok_json.exists():
            from tokenizers import Tokenizer

            self.tok = Tokenizer.from_file(str(tok_json))

    @property
    def available(self) -> bool:
        return self.tok is not None or bool(self.token_to_id)

    def _id(self, token: str, fallback: int) -> int:
        if token in self.token_to_id:
            return self.token_to_id[token]
        if self.tok is not None:
            tid = self.tok.token_to_id(token)
            if tid is not None:
                return tid
        return fallback

    def _maybe(self, token: str, tokens: list[int]) -> None:
        tid = self._id(token, -1)
        if tid >= 0:
            tokens.append(tid)

    def build_prompt(self, source_language: str, target_language: str,
                     pnc: bool = True) -> list[int]:
        cfg = self.cfg
        out = [self._id("<|startofcontext|>", cfg.startofcontext_id),
               self._id("<|startoftranscript|>", cfg.startoftranscript_id),
               self._id("<|emo:undefined|>", cfg.emo_undefined_id)]
        self._maybe(f"<|{source_language}|>", out)
        self._maybe(f"<|{target_language}|>", out)
        self._maybe("<|pnc|>" if pnc else "<|nopnc|>", out)
        self._maybe("<|noitn|>", out)
        self._maybe("<|notimestamp|>", out)
        self._maybe("<|nodiarize|>", out)
        return out

    @property
    def eos_id(self) -> int:
        return self._id("<|endoftext|>", self.cfg.endoftext_id)

    def decode(self, ids: list[int]) -> str:
        if self.tok is not None:
            return self.tok.decode(ids).strip()
        pieces = [self.id_to_token.get(i, "") for i in ids]
        pieces = [p for p in pieces
                  if p and not (p.startswith("<|") and p.endswith("|>"))]
        return "".join(pieces).replace("▁", " ").strip()


class Canary:
    def __init__(self, config: CanaryConfig, params, tokenizer=None,
                 dtype=jnp.float32):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.dtype = dtype
        self.sample_rate = config.preprocess.sample_rate
        self._encode = ajit(functools.partial(
            self._encode_impl, cfg=config))
        self._loops: dict = {}

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32) -> "Canary":
        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = CanaryConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        tok = CanaryTokenizer(model_dir, config)
        return cls(config, params, tok if tok.available else None, dtype)

    @staticmethod
    def _encode_impl(params, mel, lengths, cfg: CanaryConfig):
        enc, out_len = parakeet.encoder_forward(
            {"encoder": params["encoder"]}, mel, lengths, cfg.encoder)
        if "projection" in params["encoder"]:
            enc = nn.linear(params["encoder"]["projection"], enc)
        cross_k, cross_v = _cross_kv(params, enc, cfg)
        mask = (jnp.arange(enc.shape[1])[None] < out_len[:, None])
        enc_mask = jnp.where(mask, 0.0, -1e9).astype(jnp.float32)[
            :, None, None, :]
        return enc, cross_k, cross_v, enc_mask

    def _get_loop(self, max_total: int, kv_bits: int | None = None,
                  kv_group_size: int = 64, quantized_kv_start: int = 0):
        key = (max_total, kv_bits, kv_group_size, quantized_kv_start)
        if key in self._loops:
            return self._loops[key]
        cfg = self.config

        def loop(params, cross_k, cross_v, enc_mask, prompt_buf, prompt_len,
                 eos_id):
            cache = kv_cache.make_cache_for(
                cfg.decoder.num_layers, 1, cfg.decoder.num_attention_heads,
                cfg.enc_output_dim // cfg.decoder.num_attention_heads,
                max_total, jnp.float32, kv_bits=kv_bits,
                kv_group_size=kv_group_size,
                quantized_kv_start=quantized_kv_start)
            tokens = jnp.zeros((max_total,), jnp.int32)

            def cond(c):
                _, i, _, finished = c
                return jnp.logical_and(~finished, i < max_total)

            def body(c):
                tokens, i, cache, finished = c
                tok = tokens[i - 1]
                logits, cache = _decoder_step(
                    params, tok[None, None], cache, cross_k, cross_v,
                    enc_mask, cfg)
                nxt = jnp.argmax(logits[0].astype(jnp.float32)).astype(
                    jnp.int32)
                # teacher-force the prompt
                nxt = jnp.where(i < prompt_len, prompt_buf[i], nxt)
                tokens = tokens.at[i].set(nxt)
                finished = jnp.logical_and(i >= prompt_len, nxt == eos_id)
                return tokens, i + 1, cache, finished

            tokens = tokens.at[0].set(prompt_buf[0])
            tokens, count, *_ = jax.lax.while_loop(
                cond, body, (tokens, jnp.int32(1), cache, jnp.bool_(False)))
            return tokens, count

        fn = ajit(loop)
        self._loops[key] = fn
        return fn

    def generate(self, audio, generation_parameters:
                 STTGenerateParameters | None = None,
                 sample_rate: int | None = None) -> STTOutput:
        gp = generation_parameters or STTGenerateParameters(max_tokens=200)
        max_new = gp.max_tokens or 200
        lang = gp.language or "en"
        t0 = time.perf_counter()
        wf = np.asarray(audio, np.float32).reshape(-1)
        src = sample_rate or self.sample_rate
        if src != self.sample_rate:
            wf = resample_audio(wf, src, self.sample_rate)
        mel = parakeet.log_mel_spectrogram(wf, self.config.preprocess)
        if mel.shape[1] == 0:
            return STTOutput(text="")
        bucket = max(16, 1 << (mel.shape[1] - 1).bit_length())
        padded = np.zeros((1, bucket, mel.shape[2]), np.float32)
        padded[0, :mel.shape[1]] = np.asarray(mel)[0]
        enc, ck, cv, enc_mask = self._encode(
            self.params, jnp.asarray(padded, self.dtype),
            jnp.asarray([mel.shape[1]], jnp.int32))
        if self.tokenizer is not None:
            prompt = self.tokenizer.build_prompt(lang, lang)
            eos = self.tokenizer.eos_id
        else:
            prompt = [self.config.startofcontext_id,
                      self.config.startoftranscript_id,
                      self.config.emo_undefined_id]
            eos = self.config.endoftext_id
        max_total = len(prompt) + max_new
        buf = np.zeros((max_total,), np.int32)
        buf[: len(prompt)] = prompt
        loop = self._get_loop(max_total, kv_bits=gp.kv_bits,
                              kv_group_size=gp.kv_group_size,
                              quantized_kv_start=gp.quantized_kv_start)
        tokens, count = loop(self.params, ck, cv, enc_mask,
                             jnp.asarray(buf), jnp.int32(len(prompt)),
                             jnp.int32(eos))
        tokens = np.asarray(tokens)[: int(count)].tolist()
        generated = [t for t in tokens[len(prompt):] if t != eos]
        text = (self.tokenizer.decode(generated) if self.tokenizer
                else " ".join(str(t) for t in generated))
        elapsed = time.perf_counter() - t0
        return STTOutput(
            text=text, language=lang,
            segments=[STTSegment(text=text, start=0.0,
                                 end=len(wf) / self.sample_rate,
                                 tokens=generated)],
            prompt_token_count=len(prompt),
            generation_token_count=len(generated),
            generation_time=elapsed, total_time=elapsed)

    def generate_stream(self, audio, generation_parameters=None, **kw):
        out = self.generate(audio, generation_parameters, **kw)
        if out.text:
            yield {"type": "token", "text": out.text}
        yield {"type": "result", "output": out}
