"""LlamaTTS (Orpheus): Llama-3 AR decoder emitting 7-token SNAC frames.

TPU-first rebuild of the reference's Orpheus runtime
(Sources/MLXAudioTTS/Models/Llama/LlamaTTS.swift): special-token prompt
framing (:446-553), 7-token frame ungrouping to 3 SNAC layers (:41-69),
voice-prefix conditioning (:474), ref-audio cloning via SNAC encode
(:457-469), temperature/top-p/repetition sampling (:691-692).

The decode loop is the shared ``core.ar_loop`` chunked ``lax.while_loop`` —
one host sync per chunk instead of the reference's per-token ``.item()``
(:727-744). Streaming decodes the SNAC code prefix incrementally and emits
waveform deltas, giving real incremental audio rather than the reference's
single final ``.audio`` event.
"""

from __future__ import annotations

import functools
import math
import os
import time
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import hub, kv_cache, loading, nn
from tpu_audio.core.ar_loop import make_decode_chunk
from tpu_audio.core.generation import (
    AudioGenerateParameters,
    AudioGeneration,
    AudioGenerationError,
    AudioGenerationInfo,
)
from tpu_audio.core.sampling import SamplingParams
from tpu_audio.models import llama
from tpu_audio.core.jitting import ajit

__all__ = ["LlamaTTS", "LlamaTTSConfig", "OrpheusTokens"]


class FusedDecodeKV(NamedTuple):
    """Decode-time KV state for the monolithic Pallas llama kernel
    (ops/pallas_fused_llama): position-major ``[L, S, dkv]`` caches with
    K rows stored post-RoPE, plus the scalar write offset and the
    left-pad ``valid_from`` mask bound (mirrors ``KVCache``)."""

    k: jnp.ndarray
    v: jnp.ndarray
    offset: jnp.ndarray
    valid_from: jnp.ndarray


# ContinuousTTS lane cache rows use the engines' shared fused-lane
# contract (k/v are [L, s_max, dkv] position-major, K rows post-RoPE)
FusedLaneRow = kv_cache.FusedLaneRow


def _fused_llama_mode() -> str:
    """``TPU_AUDIO_FUSED_LLAMA``: ``0`` off, ``1``/``auto`` route w8a8
    checkpoints through the monolithic Pallas decode kernel on TPU,
    ``interpret`` forces the kernel in interpreter mode (CPU tests)."""
    return os.environ.get("TPU_AUDIO_FUSED_LLAMA", "auto")


@dataclass(frozen=True)
class OrpheusTokens:
    """Orpheus special token ids (reference LlamaTTS.swift:20-30)."""

    start_of_human: int = 128259
    end_of_human: int = 128260
    end_of_text: int = 128009
    start_of_speech: int = 128257
    end_of_speech: int = 128258
    pad_token: int = 128263
    audio_start: int = 128261
    audio_end: int = 128262
    audio_token_offset: int = 128266
    codebook_size: int = 4096


@dataclass
class LlamaTTSConfig(llama.LlamaConfig):
    sample_rate: int = 24000
    snac_repo: str = "mlx-community/snac_24khz"
    quantization: dict | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "LlamaTTSConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


def ungroup_codes(code_list: list[int], codebook_size: int = 4096):
    """7-token frames -> 3 SNAC layers (reference
    llamaDecodeAudioFromCodes, LlamaTTS.swift:41-69)."""
    l1, l2, l3 = [], [], []
    for g in range(len(code_list) // 7):
        b = 7 * g
        l1.append(code_list[b])
        l2.append(code_list[b + 1] - codebook_size)
        l3.append(code_list[b + 2] - 2 * codebook_size)
        l3.append(code_list[b + 3] - 3 * codebook_size)
        l2.append(code_list[b + 4] - 4 * codebook_size)
        l3.append(code_list[b + 5] - 5 * codebook_size)
        l3.append(code_list[b + 6] - 6 * codebook_size)
    return l1, l2, l3


def group_codes(l1, l2, l3, codebook_size: int = 4096) -> list[int]:
    """3 SNAC layers -> interleaved 7-token frames (reference
    llamaEncodeAudioToCodes, LlamaTTS.swift:73-103)."""
    out = []
    for i in range(len(l1)):
        out += [
            int(l1[i]),
            int(l2[2 * i]) + codebook_size,
            int(l3[4 * i]) + 2 * codebook_size,
            int(l3[4 * i + 1]) + 3 * codebook_size,
            int(l2[2 * i + 1]) + 4 * codebook_size,
            int(l3[4 * i + 2]) + 5 * codebook_size,
            int(l3[4 * i + 3]) + 6 * codebook_size,
        ]
    return out


class LlamaTTS:
    """Orpheus-style TTS with generate / generate_stream."""

    def __init__(self, config: LlamaTTSConfig, params, tokenizer=None,
                 codec=None, tokens: OrpheusTokens = OrpheusTokens(),
                 dtype=jnp.bfloat16, audio_band_head: bool = False):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.codec = codec
        self.tokens = tokens
        self.dtype = dtype
        self.audio_band_head = bool(audio_band_head)
        cfg = config

        def prefill(params, ids, cache):
            # band mode: hidden states only — the full-vocab logits matmul
            # over the whole prompt would be discarded anyway (and the
            # dense lm_head is dropped from the band params tree)
            return llama.forward(params, ids, cache, cfg,
                                 return_hidden=self.audio_band_head)

        self._prefill = ajit(prefill, donate_argnums=(2,))
        self._prefill_fn = prefill  # unjitted: parallel.continuous wraps it

        if self.audio_band_head:
            # Decode-time lm_head restricted to the 7x4096 audio band +
            # end_of_speech: generation past start_of_speech only ever emits
            # those ids (parse_output crops everything else,
            # LlamaTTS.swift:383-434), but the full-vocab head still reads
            # ~0.96 GB/token at bf16 — 12% of the whole decode step. The
            # sliced head keeps the packed/quantized layout (quant.slice_rows)
            # and make_decode_chunk maps sampled band indices back to ids.
            from tpu_audio.core import quant

            T = tokens
            band = T.audio_token_offset + np.arange(7 * T.codebook_size)
            rows = np.concatenate([band, [T.end_of_speech]]).astype(np.int32)
            if cfg.vocab_size <= int(rows.max()):
                # jnp gather clamps out-of-range rows silently — fail fast
                raise ValueError(
                    f"audio_band_head needs vocab_size > {int(rows.max())} "
                    f"(got {cfg.vocab_size}); token table doesn't cover "
                    f"the audio band")
            head = (params["lm_head"]
                    if "lm_head" in params and not cfg.tie_word_embeddings
                    else params["model"]["embed_tokens"])
            self.params = dict(params)
            self.params["band_head"] = quant.slice_rows(head, rows)
            if "lm_head" in self.params and not cfg.tie_word_embeddings:
                # the sliced head fully replaces it in decode, and band-mode
                # prefill returns hidden states only — drop ~1 GB of HBM
                del self.params["lm_head"]
            band_size = 7 * T.codebook_size

            def step_fn(params, tok, cache):
                hidden, cache = llama.forward(params, tok, cache, cfg,
                                              return_hidden=True)
                logits = nn.linear(params["band_head"], hidden[:, -1])
                if cfg.logits_scaling != 1.0:
                    logits = logits / cfg.logits_scaling
                return logits, cache

            self._token_map = lambda idx: jnp.where(
                idx >= band_size, jnp.int32(T.end_of_speech),
                idx + jnp.int32(T.audio_token_offset))
        else:
            def step_fn(params, tok, cache):
                logits, cache = llama.forward(params, tok, cache, cfg)
                return logits[:, -1], cache

            self._token_map = None
        self._step_fn = step_fn
        self._decoders: dict = {}

        # monolithic Pallas decode kernel (whole layer stack = ONE
        # pallas_call per token): w8a8 checkpoints on TPU route through
        # this automatically; closes the distributed small-GEMV gap the
        # XLA loop pays (docs/DESIGN.md roofline chapter)
        self._fused_pack = None

        def fused_step_fn(params, tok, fc: FusedDecodeKV):
            from tpu_audio.ops import pallas_fused_llama as FL

            x = nn.embedding(params["model"]["embed_tokens"], tok[:, 0])
            if cfg.embedding_multiplier != 1.0:
                x = x * cfg.embedding_multiplier
            x8 = jnp.zeros((8, cfg.hidden_size), jnp.float32
                           ).at[0].set(x[0].astype(jnp.float32))
            y, nk, nv = FL.fused_llama_stack(
                params["fused_pack"], fc.k, fc.v, x8, fc.offset, cfg=cfg,
                valid_from=fc.valid_from,
                interpret=(_fused_llama_mode() == "interpret"))
            kc = jax.lax.dynamic_update_slice(
                fc.k, nk[:, 0:1].astype(fc.k.dtype), (0, fc.offset, 0))
            vc = jax.lax.dynamic_update_slice(
                fc.v, nv[:, 0:1].astype(fc.v.dtype), (0, fc.offset, 0))
            h = nn.rms_norm(params["model"]["norm"],
                            y[0:1].astype(self.dtype), cfg.rms_norm_eps)
            if self.audio_band_head:
                logits = nn.linear(params["band_head"], h)
            elif "lm_head" in params and not cfg.tie_word_embeddings:
                logits = nn.linear(params["lm_head"], h)
            else:
                logits = nn.embedding_as_linear(
                    params["model"]["embed_tokens"], h)
            if cfg.logits_scaling != 1.0:
                logits = logits / cfg.logits_scaling
            return logits.astype(jnp.float32), FusedDecodeKV(
                kc, vc, fc.offset + jnp.int32(1), fc.valid_from)

        self._fused_step_fn = fused_step_fn

        @functools.partial(ajit, donate_argnums=(0,))
        def to_fused_cache(cache):
            # standard [L, B=1, n_kv, S, hd] cache (K rows already
            # post-RoPE — llama.forward's convention) -> the kernel's
            # position-major [L, S, dkv] layout
            L, _, n_kv, S, hd = cache.k.shape
            kc = cache.k[:, 0].transpose(0, 2, 1, 3).reshape(L, S, n_kv * hd)
            vc = cache.v[:, 0].transpose(0, 2, 1, 3).reshape(L, S, n_kv * hd)
            return FusedDecodeKV(kc, vc, cache.offset, cache.valid_from)

        self._to_fused_cache = to_fused_cache

        @functools.partial(ajit, static_argnums=(1,), donate_argnums=(0,))
        def from_fused_cache(fc, capacity: int):
            # inverse of to_fused_cache, grown to ``capacity`` rows: the
            # mid-generation fallback hands the kernel's position-major
            # cache back to the XLA loop once a generation outgrows the
            # kernel's VMEM cap (S_MAX_CAP) instead of refusing fused
            # decode for the whole request
            L, S, dkv = fc.k.shape
            n_kv = cfg.num_key_value_heads
            hd = dkv // n_kv

            def grow(t):
                x = t.reshape(L, S, n_kv, hd).transpose(0, 2, 1, 3)[:, None]
                return jnp.pad(
                    x, ((0, 0), (0, 0), (0, 0), (0, capacity - S), (0, 0)))

            return kv_cache.KVCache(grow(fc.k), grow(fc.v),
                                    fc.offset, fc.valid_from)

        self._from_fused_cache = from_fused_cache

    # -- loading --------------------------------------------------------------

    @classmethod
    def from_pretrained(cls, repo_or_path: str, codec=None,
                        snac_repo: str | None = None,
                        dtype=jnp.bfloat16,
                        quantize_bits: int | str | None = None,
                        fuse: bool = True,
                        audio_band_head: bool = False) -> "LlamaTTS":
        """``quantize_bits=4/8`` post-load-quantizes a full-precision
        checkpoint to MLX grouped-affine (reference
        ``quantize(model:filter:)`` semantics); ``quantize_bits="w8a8"``
        uses per-channel int8 for the native MXU path — the fastest
        decode on TPU. No-op when the checkpoint already ships a
        ``quantization`` config."""
        model_dir = hub.resolve_or_download_model(repo_or_path)
        cfg_dict = hub.load_config(model_dir)
        config = LlamaTTSConfig.from_dict(cfg_dict)
        config.quantization = cfg_dict.get("quantization")
        params = loading.load_params(
            model_dir, sanitize=lambda w: llama.sanitize(w, config),
            dtype=dtype, expected_prefixes=("model",),
        )
        params = llama.maybe_stack(params)
        if config.quantization:
            from tpu_audio.core import quant

            q = config.quantization
            params = quant.tag_quantized(params, q.get("group_size", 64),
                                         q.get("bits", 4))
        elif quantize_bits == "w8a8":
            from tpu_audio.core import quant

            params = quant.quantize_tree(params, scheme="w8a8")
        elif quantize_bits:
            from tpu_audio.core import quant

            params = quant.quantize_tree(params, bits=quantize_bits)
        # fused qkv/gate_up GEMVs: fewer dispatches in the decode hot
        # loop. Pass fuse=False for tensor-parallel sharding (Megatron
        # column-parallel specs want separate q/k/v under GQA). When the
        # monolithic Pallas decode kernel will take the decode loop
        # (w8a8 on TPU), the tree stays unfused — the kernel pack reads
        # separate q/k/v, and prefill GEMMs don't care either way.
        if fuse:
            from tpu_audio.core import quant

            mode = _fused_llama_mode()
            fused_route = False
            # gate on the tree ACTUALLY being w8a8 (Int8Tensor), not the
            # requested arg: a checkpoint that ships its own quantization
            # config ignores quantize_bits="w8a8" (tag_quantized above),
            # and leaving it unfused would slow the XLA fallback without
            # the kernel ever engaging
            lyrs = params["model"]["layers"]
            is_w8a8 = ("self_attn" in lyrs and isinstance(
                lyrs["self_attn"].get("q_proj", {}).get("weight"),
                quant.Int8Tensor))
            if is_w8a8 and mode != "0":
                from tpu_audio.ops import pallas_fused_llama as FL

                if FL.supported(config):
                    if mode == "interpret":
                        fused_route = True
                    else:
                        from tpu_audio.ops import pallas_kv_attention as pk

                        fused_route = pk.is_tpu()
            if not fused_route:
                params = llama.fuse_projections(params)
        tokenizer = None
        from pathlib import Path

        if (Path(model_dir) / "tokenizer.json").exists():
            from tokenizers import Tokenizer

            tokenizer = Tokenizer.from_file(str(Path(model_dir) / "tokenizer.json"))
        if codec is None:
            # post_load_hook: SNAC auto-fetch (reference LlamaTTS.swift:600)
            from tpu_audio.codecs import load_codec

            try:
                codec = load_codec(snac_repo or config.snac_repo,
                                   codec_type="snac")
            except Exception:
                codec = None  # decode unavailable; token generation still works
        # token table scaled for tiny fixture vocabs
        tokens = OrpheusTokens()
        if config.vocab_size < tokens.audio_token_offset:
            base = cfg_dict.get("audio_token_offset")
            if base is None:
                raise ValueError(
                    "vocab smaller than Orpheus token table; set "
                    "audio_token_offset etc. in config.json")
            tokens = OrpheusTokens(
                start_of_human=cfg_dict["start_of_human"],
                end_of_human=cfg_dict["end_of_human"],
                end_of_text=cfg_dict["end_of_text"],
                start_of_speech=cfg_dict["start_of_speech"],
                end_of_speech=cfg_dict["end_of_speech"],
                pad_token=cfg_dict["pad_token"],
                audio_start=cfg_dict["audio_start"],
                audio_end=cfg_dict["audio_end"],
                audio_token_offset=base,
                codebook_size=cfg_dict.get("codebook_size", 4096),
            )
        return cls(config, params, tokenizer, codec, tokens, dtype,
                   audio_band_head=audio_band_head)

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def default_generation_parameters(self) -> AudioGenerateParameters:
        # reference defaultGenerationParameters (LlamaTTS.swift:573-581)
        return AudioGenerateParameters(
            max_tokens=1200, temperature=0.6, top_p=0.8,
            repetition_penalty=1.3, repetition_context_size=20,
        )

    # -- prompt framing ---------------------------------------------------------

    def prepare_input_ids(self, text: str, voice: str | None = None,
                          ref_audio=None, ref_text: str | None = None) -> list[int]:
        T = self.tokens
        prompt = f"{voice}: {text}" if voice else text
        ids = list(self.tokenizer.encode(prompt).ids)
        parts = []
        if ref_audio is not None and ref_text is not None:
            if self.codec is None:
                raise AudioGenerationError("SNAC codec required for ref audio")
            codes = self.codec.encode(np.asarray(ref_audio, np.float32))
            l1 = np.asarray(codes[0])[0].tolist()
            l2 = np.asarray(codes[1])[0].tolist()
            l3 = np.asarray(codes[2])[0].tolist()
            audio_ids = [c + T.audio_token_offset
                         for c in group_codes(l1, l2, l3, T.codebook_size)]
            ref_ids = list(self.tokenizer.encode(ref_text).ids)
            parts += [T.start_of_human, *ref_ids, T.end_of_text, T.end_of_human,
                      T.audio_start, T.start_of_speech, *audio_ids,
                      T.end_of_speech, T.audio_end]
        parts += [T.start_of_human, *ids, T.end_of_text, T.end_of_human]
        return parts

    # -- parsing (reference parseOutput, LlamaTTS.swift:383-434) ---------------

    def parse_output(self, all_tokens: list[int]) -> list[int]:
        T = self.tokens
        sos_positions = [i for i, t in enumerate(all_tokens)
                         if t == T.start_of_speech]
        cropped = all_tokens[sos_positions[-1] + 1:] if sos_positions else all_tokens
        kept = [t for t in cropped if t != T.end_of_speech
                and t >= T.audio_token_offset]
        kept = kept[: (len(kept) // 7) * 7]
        return [t - T.audio_token_offset for t in kept]

    # -- generation ---------------------------------------------------------------

    def _fused_supported(self) -> bool:
        """Structural gate for the monolithic Pallas decoder: supported
        llama dims + stacked UNFUSED w8a8 (Int8Tensor) projections + a TPU
        backend (or forced interpret mode for CPU tests)."""
        from tpu_audio.core import quant
        from tpu_audio.ops import pallas_fused_llama as FL

        mode = _fused_llama_mode()
        if mode == "0" or not FL.supported(self.config):
            return False
        layers = self.params["model"]["layers"]
        if "self_attn" not in layers:          # per-layer dict checkpoints
            return False
        if "qkv_proj" in layers["self_attn"]:  # pack needs unfused q/k/v
            return False
        if not isinstance(layers["self_attn"]["q_proj"]["weight"],
                          quant.Int8Tensor):
            return False
        if mode == "interpret":
            return True
        from tpu_audio.ops import pallas_kv_attention as pk

        return pk.is_tpu()

    def fused_decoder_pack(self):
        """Lazy weight pack for the fused decode kernel (one jitted
        dispatch; holds a second int8 copy of the layer weights)."""
        if self._fused_pack is None:
            from tpu_audio.ops import pallas_fused_llama as FL

            self._fused_pack = FL.pack_llama_weights(self.params,
                                                     self.config)
        return self._fused_pack

    def _fused_lane_hooks(self, max_len: int):
        """Engine hooks routing :class:`parallel.continuous.ContinuousTTS`
        ticks through the M-lane monolithic Pallas kernel
        (ops/pallas_fused_llama.fused_llama_stack_lanes): one weight
        sweep per decode step shared by every live lane. Returns None
        when the model/shape is unsupported (dims, non-w8a8 tree, cache
        beyond the VMEM cap) — the engine then uses the vmapped XLA
        tick. Greedy/sampled tokens are bit-identical to the XLA engine
        (tested, test_continuous.py)."""
        from tpu_audio.ops import pallas_fused_llama as FL

        cfg = self.config
        if not self._fused_supported():
            return None
        s_max = -(-max_len // FL.SUB) * FL.SUB
        if s_max > FL.S_MAX_CAP:
            return None
        L = cfg.num_hidden_layers
        dkv = cfg.num_key_value_heads * 128
        d = cfg.hidden_size
        interp = _fused_llama_mode() == "interpret"
        dtype = self.dtype
        band = self.audio_band_head
        engine_params = {"params": self.params,
                         "fused_pack": self.fused_decoder_pack()}

        def batch_step_fn(ep, cache, last, ctx):
            params = ep["params"]
            n = last.shape[0]                     # static lane bucket
            x = nn.embedding(params["model"]["embed_tokens"], last[None])[0]
            if cfg.embedding_multiplier != 1.0:
                x = x * cfg.embedding_multiplier
            x8 = jnp.zeros((8, d), jnp.float32).at[:n].set(
                x.astype(jnp.float32))
            off8 = jnp.zeros((8,), jnp.int32).at[:n].set(cache.offset)
            st8 = jnp.zeros((8,), jnp.int32).at[:n].set(cache.valid_from)
            y, nk, nv = FL.fused_llama_stack_lanes(
                ep["fused_pack"], cache.k, cache.v, x8, off8, st8,
                cfg=cfg, interpret=interp)

            def put(kc, row, o):
                return jax.lax.dynamic_update_slice(
                    kc, row[:, None].astype(kc.dtype), (0, o, 0))

            newk = jax.vmap(put)(
                cache.k, jnp.transpose(nk[:, :n], (1, 0, 2)), cache.offset)
            newv = jax.vmap(put)(
                cache.v, jnp.transpose(nv[:, :n], (1, 0, 2)), cache.offset)
            h = nn.rms_norm(params["model"]["norm"], y[:n].astype(dtype),
                            cfg.rms_norm_eps)
            if band:
                logits = nn.linear(params["band_head"], h)
            elif "lm_head" in params and not cfg.tie_word_embeddings:
                logits = nn.linear(params["lm_head"], h)
            else:
                logits = nn.embedding_as_linear(
                    params["model"]["embed_tokens"], h)
            if cfg.logits_scaling != 1.0:
                logits = logits / cfg.logits_scaling
            return logits.astype(jnp.float32), cache._replace(
                k=newk, v=newv)

        def prefill_fn(ep, ids, cache):
            # XLA batched prefill into a standard cache (one pass over
            # the whole padded prompt), then a pure transpose into the
            # kernel's position-major layout — llama.forward caches
            # post-RoPE K, exactly what the kernel expects (same
            # conversion as the offline _to_fused_cache)
            std = llama.make_cache(cfg, 1, s_max, dtype=dtype,
                                   valid_from=cache.valid_from)
            # return_hidden: skip the full-vocab head over the whole
            # padded prompt — the output is discarded either way, and in
            # band-head mode the tied head would stream the ~1 GB
            # embedding matrix per admission
            _, std = llama.forward(ep["params"], ids, std, cfg,
                                   return_hidden=True)
            kc = std.k[:, 0].transpose(0, 2, 1, 3).reshape(L, s_max, dkv)
            vc = std.v[:, 0].transpose(0, 2, 1, 3).reshape(L, s_max, dkv)
            return None, cache._replace(
                k=kc.astype(cache.k.dtype), v=vc.astype(cache.v.dtype),
                offset=jnp.asarray(std.offset, jnp.int32))

        def cache_factory(valid_from):
            return FusedLaneRow(
                k=jnp.zeros((L, s_max, dkv), dtype),
                v=jnp.zeros((L, s_max, dkv), dtype),
                offset=jnp.int32(0),
                valid_from=jnp.asarray(valid_from, jnp.int32))

        return dict(params=engine_params, batch_step_fn=batch_step_fn,
                    prefill_fn=prefill_fn, cache_factory=cache_factory)

    def _get_decoder(self, params: AudioGenerateParameters,
                     fused: bool = False):
        key = (params.temperature, params.top_p, params.top_k,
               params.repetition_penalty, params.repetition_context_size,
               fused)
        if key not in self._decoders:
            sp = SamplingParams(
                temperature=params.temperature, top_p=params.top_p,
                top_k=params.top_k,
                repetition_penalty=params.repetition_penalty,
                repetition_context_size=params.repetition_context_size,
            )
            self._decoders[key] = make_decode_chunk(
                self._fused_step_fn if fused else self._step_fn, sp,
                history_size=max(params.repetition_context_size, 1),
                token_map=self._token_map,
            )
        return self._decoders[key]

    def _run_generation(self, text, voice, ref_audio, ref_text,
                        params: AudioGenerateParameters, chunk_tokens: int):
        """Core loop: yields (new_tokens, done, timing) per chunk."""
        if self.tokenizer is None:
            raise AudioGenerationError("tokenizer not loaded")
        prompt = self.prepare_input_ids(text, voice, ref_audio, ref_text)
        T = self.tokens
        bucket = max(64, 1 << math.ceil(math.log2(max(len(prompt), 2))))
        pad_len = bucket - len(prompt)
        padded = np.full((1, bucket), T.pad_token, np.int32)
        padded[0, pad_len:] = prompt
        max_total = bucket + params.max_tokens + 1
        use_fused = False
        fused_cap = max_total  # rows the fused cache can hold
        if self._fused_supported():
            from tpu_audio.ops import pallas_fused_llama as FL

            # the kernel holds the position-major cache block in VMEM
            # (cap S_MAX_CAP). Longer generations still START fused —
            # when the cache is about to overflow, the loop converts it
            # back to the XLA layout mid-generation and continues there
            # (the cheap tail of a long request, after the fused kernel
            # already carried the prompt-heavy early chunks).
            cap = -(-min(max_total, FL.S_MAX_CAP) // FL.SUB) * FL.SUB
            # the FIRST decode chunk must fit under the cap, else the
            # mid-generation fallback fires before a single fused step
            # and the pack + two layout conversions are pure waste
            # (non-streaming generate() has chunk_tokens == max_tokens)
            use_fused = (bucket + min(chunk_tokens, params.max_tokens)
                         + 1 <= cap)
            if use_fused:
                fused_cap = cap
        cache = llama.make_cache(self.config, 1,
                                 fused_cap if use_fused else max_total,
                                 self.dtype)
        cache = cache._replace(valid_from=jnp.asarray(pad_len, jnp.int32))

        t0 = time.perf_counter()
        # prefill all but the last prompt token; the decode loop re-feeds it
        _, cache = self._prefill(self.params, jnp.asarray(padded[:, :-1]), cache)
        jax.block_until_ready(cache.k)
        prefill_time = time.perf_counter() - t0

        step_params = self.params
        if use_fused:
            cache = self._to_fused_cache(cache)
            # same leaves, plus the packed kernel weight stream — built
            # per call so self.params stays pack-free for prefill/serving
            step_params = {**self.params,
                           "fused_pack": self.fused_decoder_pack()}

        decoder = self._get_decoder(params, fused=use_fused)
        rng = jax.random.PRNGKey(params.seed if params.seed is not None else 0)
        last = jnp.asarray([prompt[-1]], jnp.int32)
        history = jnp.zeros((1, max(params.repetition_context_size, 1)), jnp.int32)
        hist_pos = jnp.int32(0)
        emitted = 0
        t1 = time.perf_counter()
        all_tokens = list(prompt)
        while emitted < params.max_tokens:
            n = min(chunk_tokens, params.max_tokens - emitted)
            # mid-generation fallback: the next chunk would write past
            # the fused VMEM cache — convert position-major -> standard
            # layout (pure transpose; K rows are post-RoPE either way),
            # grown to the full request capacity, and continue on XLA
            if use_fused and bucket + emitted + n + 1 > fused_cap:
                cache = self._from_fused_cache(cache, max_total)
                step_params = self.params
                use_fused = False
                decoder = self._get_decoder(params, fused=False)
            buf = jnp.zeros((n,), jnp.int32)
            tokens, count, cache, last, finished, rng, history, hist_pos = decoder(
                step_params, cache, last, buf, rng,
                jnp.int32(T.end_of_speech), history, hist_pos,
            )
            count = int(count)
            new = np.asarray(tokens)[:count].tolist()
            done = bool(finished)
            if done and new and new[-1] == T.end_of_speech:
                new = new[:-1]
            all_tokens += new
            emitted += count
            yield new, done or emitted >= params.max_tokens, (
                prefill_time, time.perf_counter() - t1, len(prompt), all_tokens
            )
            if done:
                return

    def generate(self, text: str, voice: str | None = None,
                 ref_audio=None, ref_text: str | None = None,
                 language: str | None = None,
                 generation_parameters: AudioGenerateParameters | None = None
                 ) -> np.ndarray:
        params = generation_parameters or self.default_generation_parameters()
        all_tokens = None
        for _new, _done, (_pt, _gt, _pl, toks) in self._run_generation(
            text, voice, ref_audio, ref_text, params,
            chunk_tokens=params.max_tokens,
        ):
            all_tokens = toks
        code_list = self.parse_output(all_tokens)
        if not code_list:
            raise AudioGenerationError("no audio codes generated")
        if self.codec is None:
            raise AudioGenerationError("SNAC codec not loaded")
        l1, l2, l3 = ungroup_codes(code_list, self.tokens.codebook_size)
        wav = self.codec.decode([
            np.asarray([l1], np.int32), np.asarray([l2], np.int32),
            np.asarray([l3], np.int32),
        ])
        return np.asarray(wav)[0]

    def generate_stream(self, text: str, voice: str | None = None,
                        ref_audio=None, ref_text: str | None = None,
                        language: str | None = None,
                        generation_parameters: AudioGenerateParameters | None = None):
        """Yields AudioGeneration events: .token per generated token, .audio
        waveform deltas as enough 7-token frames accumulate, final .info."""
        params = generation_parameters or self.default_generation_parameters()
        # frames per streamed chunk: interval seconds of codec output
        hop = getattr(self.codec, "config", None)
        samples_per_group = 4 * (hop.hop_length if hop else 512)
        groups_per_chunk = max(
            1, int(params.streaming_interval * self.sample_rate / samples_per_group)
        )
        chunk_tokens = 7 * groups_per_chunk
        decoded_samples = 0
        gen_count = 0
        info = None
        for new, done, (pt, gt, plen, all_tokens) in self._run_generation(
            text, voice, ref_audio, ref_text, params, chunk_tokens=chunk_tokens,
        ):
            for t in new:
                gen_count += 1
                yield AudioGeneration.from_token(t)
            code_list = self.parse_output(all_tokens)
            n_groups = len(code_list) // 7
            if self.codec is not None and n_groups > 0:
                l1, l2, l3 = ungroup_codes(code_list, self.tokens.codebook_size)
                wav = np.asarray(self.codec.decode([
                    np.asarray([l1], np.int32), np.asarray([l2], np.int32),
                    np.asarray([l3], np.int32)]))[0]
                if wav.shape[0] > decoded_samples:
                    yield AudioGeneration.from_audio(wav[decoded_samples:])
                    decoded_samples = wav.shape[0]
            if done:
                info = AudioGenerationInfo(
                    prompt_token_count=plen, generation_token_count=gen_count,
                    prompt_time=pt, generate_time=gt,
                    audio_duration=decoded_samples / self.sample_rate,
                )
                break
        if info is not None:
            yield AudioGeneration.from_info(info)
