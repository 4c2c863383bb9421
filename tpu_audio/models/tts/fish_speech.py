"""FishSpeech (fish-audio S2): dual-AR transformer TTS over FishS1DAC.

TPU-first rebuild of the reference
(Sources/MLXAudioTTS/Models/FishSpeech/FishSpeechModel.swift): a slow
transformer over [K+1, T] token grids (row 0 = text/semantic ids, rows
1..K = codebook ids, embed() at FishSpeechModel.swift:307-338) emits one
semantic token per frame; a small "fast" transformer with a fresh cache per
frame autoregresses the K-1 residual codebooks
(FishSpeechModel.swift:860-892). Sampling uses RAS (repetition-aware
sampling): if the chosen semantic token appeared in the last 10, resample
at temperature 1.0 / top-p 0.9 (FishSpeechModel.swift:757-790).

TPU design deltas:
- The whole batch generation (backbone step + RAS + the unrolled fast
  decoder) runs as ONE jitted ``lax.while_loop``; the reference syncs the
  host per semantic token AND per residual codebook
  (FishSpeechModel.swift:843,873). The RAS membership test uses an
  on-device ring buffer of the last 10 semantic tokens.
- The fast decoder's fresh per-frame cache is a zeroed fixed-shape buffer
  created inside the loop body (static shapes; no reallocation).
"""

from __future__ import annotations

import math
import re
import time
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.codecs.fish_s1_dac import FishS1DAC
from tpu_audio.core import hub, kv_cache, loading, nn
from tpu_audio.core.generation import (
    AudioGenerateParameters,
    AudioGeneration,
    AudioGenerationError,
    AudioGenerationInfo,
)
from tpu_audio.core.jitting import ajit

__all__ = ["FishSpeech", "FishSpeechConfig", "FishTransformerConfig"]

RAS_WINDOW = 10
RAS_HIGH_TEMPERATURE = 1.0
RAS_HIGH_TOP_P = 0.9

IM_START = "<|im_start|>"
IM_END = "<|im_end|>"
_SPEAKER_TAG = re.compile(r"<\|speaker:\d+\|>")


@dataclass
class FishTransformerConfig:
    """FishSpeechConfig.swift FishTextConfig / FishAudioDecoderConfig."""

    vocab_size: int = 155776
    n_layer: int = 36
    n_head: int = 32
    dim: int = 2560
    intermediate_size: int = 9728
    n_local_heads: int = 8
    head_dim: int = 128
    rope_base: float = 1e6
    norm_eps: float = 1e-6
    max_seq_len: int = 32768
    attention_qkv_bias: bool = False
    attention_o_bias: bool = False
    attention_qk_norm: bool = True

    @property
    def resolved_local_heads(self) -> int:
        return self.n_local_heads if self.n_local_heads > 0 else self.n_head

    @classmethod
    def from_dict(cls, d: dict) -> "FishTransformerConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass
class FishSpeechConfig:
    """FishSpeechConfig.swift:184-273."""

    text: FishTransformerConfig = field(default_factory=FishTransformerConfig)
    fast: FishTransformerConfig = field(default_factory=lambda:
                                        FishTransformerConfig(
                                            vocab_size=4096, n_layer=4,
                                            attention_qk_norm=False,
                                            max_seq_len=11))
    num_codebooks: int = 10
    pad_token_id: int = 151669
    eos_token_id: int = 151645
    semantic_start_token_id: int = 151678
    semantic_end_token_id: int = 155773
    sample_rate: int = 44100
    quantization: dict | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "FishSpeechConfig":
        text = FishTransformerConfig.from_dict(d.get("text_config") or {})
        fast_d = d.get("audio_decoder_config") or {}
        fast = FishTransformerConfig.from_dict(
            {"attention_qk_norm": False, "max_seq_len": 11,
             "vocab_size": 4096, "n_layer": 4, **fast_d})
        return cls(
            text=text, fast=fast,
            num_codebooks=fast_d.get("num_codebooks", 10),
            pad_token_id=d.get("pad_token_id", 151669),
            eos_token_id=d.get("eos_token_id", 151645),
            semantic_start_token_id=d.get("semantic_start_token_id", 151678),
            semantic_end_token_id=d.get("semantic_end_token_id", 155773),
            sample_rate=d.get("sample_rate", 44100),
            quantization=d.get("quantization")
            or d.get("quantization_config"),
        )


def sanitize(weights: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """FishSpeechModel.sanitize (FishSpeechModel.swift:517-538):
    ``text_model.model.*`` -> root, ``audio_decoder.*`` -> ``fast_*``
    (except codebook_embeddings)."""
    out = {}
    for k, v in weights.items():
        if k.startswith("model."):
            out[k[len("model."):]] = v
        elif k.startswith("text_model.model."):
            out[k[len("text_model.model."):]] = v
        elif k.startswith("audio_decoder."):
            suffix = k[len("audio_decoder."):]
            if suffix.startswith("codebook_embeddings."):
                out[suffix] = v
            else:
                out["fast_" + suffix] = v
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# Transformer (wqkv fused attention, w1/w2/w3 FFN, interleaved RoPE)
# ---------------------------------------------------------------------------


def transformer_forward(params, layers_key: str, x, cache, cfg:
                        FishTransformerConfig, n_layers: int | None = None):
    """Forward ``x [B, T, D]`` through Fish transformer blocks
    (FishSpeechTransformerBlock, FishSpeechModel.swift:178-222). Returns
    (hidden [B, T, D] before final norm, cache)."""
    b, t = x.shape[:2]
    heads, kv, hd = cfg.n_head, cfg.resolved_local_heads, cfg.head_dim
    q_size, kv_size = heads * hd, kv * hd
    positions = (cache.offset if cache is not None else 0) + jnp.arange(t)
    cos, sin = nn.rope(positions, hd, cfg.rope_base)
    mask = kv_cache.attention_mask(cache, t) if cache is not None else None
    for i in range(n_layers if n_layers is not None else cfg.n_layer):
        lp = params[layers_key][str(i)]
        h = nn.rms_norm(lp["attention_norm"], x, cfg.norm_eps)
        ap = lp["attention"]
        qkv = nn.linear(ap["wqkv"], h)
        q = qkv[..., :q_size].reshape(b, t, heads, hd)
        k = qkv[..., q_size: q_size + kv_size].reshape(b, t, kv, hd)
        v = qkv[..., q_size + kv_size:].reshape(b, t, kv, hd)
        if cfg.attention_qk_norm:
            q = nn.rms_norm(ap["q_norm"], q, cfg.norm_eps)
            k = nn.rms_norm(ap["k_norm"], k, cfg.norm_eps)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        # even/odd pairing (FishSpeechRotaryEmbedding.apply,
        # FishSpeechModel.swift:54-69)
        q = nn.apply_rope(q, cos, sin, interleaved=True)
        k = nn.apply_rope(k, cos, sin, interleaved=True)
        if cache is not None:
            cache, k_full, v_full = kv_cache.update_cache(cache, i, k, v)
            o = nn.sdpa(q, k_full, v_full, mask=mask)
        else:
            o = nn.sdpa(q, k, v, is_causal=True)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, q_size)
        x = x + nn.linear(ap["wo"], o)
        h = nn.rms_norm(lp["ffn_norm"], x, cfg.norm_eps)
        fp = lp["feed_forward"]
        x = x + nn.linear(fp["w2"],
                          nn.silu(nn.linear(fp["w1"], h))
                          * nn.linear(fp["w3"], h))
    if cache is not None:
        cache = cache._replace(offset=cache.offset + t)
    return x, cache


def embed_grid(params, grid, cfg: FishSpeechConfig):
    """Token grid [B, K+1, T] -> embeds [B, T, D]
    (FishSpeechDualARTransformer.embed, FishSpeechModel.swift:307-338):
    semantic-row embedding plus the codebook-row sum, scaled by
    1/sqrt(K+1) inside the semantic range."""
    k = cfg.num_codebooks
    sem_ids = grid[:, 0]
    offsets = (jnp.arange(k, dtype=grid.dtype)
               * cfg.fast.vocab_size)[None, :, None]
    vq = nn.embedding(params["codebook_embeddings"],
                      grid[:, 1:] + offsets).sum(axis=1)  # [B, T, D]
    sem_emb = nn.embedding(params["embeddings"], sem_ids)
    in_range = ((sem_ids >= cfg.semantic_start_token_id)
                & (sem_ids <= cfg.semantic_end_token_id))[..., None]
    combined = sem_emb + jnp.where(in_range, vq.astype(sem_emb.dtype), 0)
    scale = 1.0 / math.sqrt(k + 1)
    return jnp.where(in_range, combined * scale, combined)


# ---------------------------------------------------------------------------
# Text batching (FishSpeechPrompt.swift:117-276)
# ---------------------------------------------------------------------------


def split_text_into_batches(text: str, max_bytes: int) -> list[str]:
    """Greedy utf-8 byte-budget splitting, preferring whitespace boundaries
    (fishSpeechSplitTextIntoBatches, FishSpeechPrompt.swift:144-212)."""
    limit = max(1, max_bytes)
    if len(text.encode()) <= limit:
        return [text] if text else []
    batches: list[str] = []
    current = ""
    current_bytes = 0
    last_ws = None  # split point inside `current`
    for ch in text:
        nb = len(ch.encode())
        if current_bytes + nb > limit and current:
            if last_ws is not None and current[:last_ws].strip():
                batches.append(current[:last_ws])
                current = current[last_ws:]
            else:
                batches.append(current)
                current = ""
            current_bytes = len(current.encode())
            last_ws = None
        current += ch
        current_bytes += nb
        if ch.isspace():
            last_ws = len(current)
    if current:
        batches.append(current)
    return batches


def generation_batches(text: str, max_bytes: int) -> list[str]:
    """Speaker-turn aware batching (fishSpeechGenerationBatches,
    FishSpeechPrompt.swift:229-276): split on <|speaker:N|> markers, then
    group turns into <=5-speaker / byte-budget batches."""
    marks = list(_SPEAKER_TAG.finditer(text))
    if not marks:
        return [b for b in split_text_into_batches(text, max_bytes)
                if b.strip()]
    turns = []
    for i, m in enumerate(marks):
        end = marks[i + 1].start() if i + 1 < len(marks) else len(text)
        turn = text[m.start():end].strip()
        if not turn:
            continue
        marker = m.group(0)
        payload = turn[len(marker):]
        payload_limit = max(1, max_bytes - len(marker.encode()))
        turns.extend(marker + p
                     for p in split_text_into_batches(payload, payload_limit))
    batches: list[str] = []
    current: list[str] = []
    current_bytes = 0
    for turn in turns:
        tb = len(turn.encode())
        sep = 0 if not current else 1
        if current and (len(current) >= 5 or current_bytes + sep + tb
                        > max_bytes):
            batches.append("\n".join(current))
            current, current_bytes = [turn], tb
        else:
            current.append(turn)
            current_bytes += sep + tb
    if current:
        batches.append("\n".join(current))
    return [b for b in batches if b.strip()]


def adjust_speed(audio: np.ndarray, speed: float) -> np.ndarray:
    """Linear-interp resample (fishSpeechAdjustSpeed,
    FishSpeechModel.swift:388-400)."""
    if abs(speed - 1.0) <= 1e-6:
        return audio
    old = len(audio)
    new = max(1, int(old / speed))
    pos = np.linspace(0.0, old - 1, new)
    return np.interp(pos, np.arange(old), audio).astype(audio.dtype)


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


class FishSpeech:
    def __init__(self, config: FishSpeechConfig, params, tokenizer=None,
                 codec: FishS1DAC | None = None, dtype=jnp.bfloat16):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.codec = codec
        self.dtype = dtype
        self.sample_rate = config.sample_rate
        self._loops: dict = {}
        self._sem_bias = None
        self._im_end_id = config.eos_token_id
        if tokenizer is not None:
            tid = tokenizer.token_to_id(IM_END)
            if tid is not None:
                self._im_end_id = tid
            self._sem_bias = self._build_semantic_bias()

    def default_generation_parameters(self) -> AudioGenerateParameters:
        # FishSpeechModel.defaultGenerationParameters
        return AudioGenerateParameters(max_tokens=1024, temperature=0.7,
                                       top_p=0.7, top_k=30)

    @classmethod
    def from_pretrained(cls, repo_or_path: str,
                        dtype=jnp.bfloat16) -> "FishSpeech":
        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = FishSpeechConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize,
                                     dtype=dtype)
        if config.quantization:
            from tpu_audio.core import quant

            q = config.quantization
            params = quant.tag_quantized(params, q.get("group_size", 64),
                                         q.get("bits", 4))
        tokenizer = None
        if (model_dir / "tokenizer.json").exists():
            from tokenizers import Tokenizer

            tokenizer = Tokenizer.from_file(str(model_dir / "tokenizer.json"))
        codec = None
        if (model_dir / "codec.safetensors").exists() or \
                (model_dir / "firefly-gan-vq.safetensors").exists() or \
                (model_dir / "codec_config.json").exists():
            codec = FishS1DAC.from_pretrained(str(model_dir))
        else:
            try:
                codec = FishS1DAC.from_pretrained(str(model_dir))
            except Exception:
                codec = None
        return cls(config, params, tokenizer, codec, dtype)

    def _build_semantic_bias(self) -> np.ndarray:
        """-1e9 everywhere except semantic range and <|im_end|>
        (buildSemanticLogitBias, FishSpeechModel.swift:663-686)."""
        vocab = self.params["embeddings"]["weight"].shape[0]
        bias = np.full((vocab,), -1e9, np.float32)
        lo = self.config.semantic_start_token_id
        hi = min(self.config.semantic_end_token_id, vocab - 1)
        if lo <= hi:
            bias[lo: hi + 1] = 0.0
        if self._im_end_id < vocab:
            bias[self._im_end_id] = 0.0
        return bias

    # -- prompt -----------------------------------------------------------------

    def _encode_text(self, text: str) -> list[int]:
        return self.tokenizer.encode(text).ids

    def build_prompt_grid(self, batch_text: str,
                          ref_codes: np.ndarray | None = None,
                          ref_text: str | None = None,
                          history: list[tuple[str, np.ndarray]] | None = None,
                          ) -> np.ndarray:
        """Conversation -> [K+1, T] grid (FishSpeechConversation
        .encodeForInference, FishSpeechPrompt.swift:48-114). ``history`` is
        prior (text, codes) exchanges for multi-batch conditioning."""
        k = self.config.num_codebooks
        sem_begin = self.config.semantic_start_token_id
        cols: list[np.ndarray] = []

        def add_text(t: str):
            ids = self._encode_text(t)
            col = np.zeros((k + 1, len(ids)), np.int32)
            col[0] = ids
            cols.append(col)

        def add_vq(codes: np.ndarray):
            codes = np.asarray(codes, np.int32)
            col = np.zeros((k + 1, codes.shape[1]), np.int32)
            col[0] = codes[0] + sem_begin
            col[1: 1 + min(k, codes.shape[0])] = codes[:k]
            cols.append(col)

        # system message
        if ref_codes is not None:
            tagged = (ref_text or "")
            if "<|speaker:" not in tagged:
                tagged = f"<|speaker:0|>{tagged}"
            add_text(f"{IM_START}system\n")
            add_text("convert the provided text to speech reference to the "
                     "following:\n\nText:\n")
            add_text(tagged)
            add_text("\n\nSpeech:\n")
            add_vq(ref_codes)
            add_text(f"{IM_END}\n")
        else:
            add_text(f"{IM_START}system\nconvert the provided text to speech"
                     f"{IM_END}\n")
        for prev_text, prev_codes in history or []:
            add_text(f"{IM_START}user\n{prev_text}{IM_END}\n")
            add_text(f"{IM_START}assistant\n<|voice|>")
            add_vq(prev_codes)
            add_text(f"{IM_END}\n")
        add_text(f"{IM_START}user\n{batch_text}{IM_END}\n")
        add_text(f"{IM_START}assistant\n<|voice|>")
        return np.concatenate(cols, axis=1)

    # -- jitted generation loop ---------------------------------------------------

    def _get_loop(self, budget: int, temperature: float, top_p: float,
                  top_k: int):
        key = (budget, temperature, top_p, top_k)
        if key in self._loops:
            return self._loops[key]
        cfg = self.config
        k = cfg.num_codebooks
        fast_cfg = cfg.fast
        sem_start = cfg.semantic_start_token_id
        fast_vocab = fast_cfg.vocab_size
        im_end = self._im_end_id
        from tpu_audio.core.sampling import _mask_top_k, _mask_top_p

        def sample(rng, logits, temp, tp, tk):
            logits = logits.astype(jnp.float32)
            if temp <= 0:
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)
            if tk and tk > 0:
                logits = _mask_top_k(logits, tk)
            if tp < 1.0:
                logits = _mask_top_p(logits, tp)
            return jax.random.categorical(rng, logits / temp,
                                          axis=-1).astype(jnp.int32)

        def slow_logits(params, h):
            w = params["embeddings"]["weight"]
            return (h @ w.T.astype(h.dtype)).astype(jnp.float32) \
                + params["_sem_bias"]

        def fast_project(params, h):
            if "fast_project_in" in params:
                return nn.linear(params["fast_project_in"], h)
            return h

        def fast_decode(params, h, sem_code, rng):
            """Fresh-cache residual-codebook loop
            (FishSpeechModel.swift:859-879). h [B, D]; returns codes
            [B, K]."""
            b = h.shape[0]
            fcache = kv_cache.init_cache(
                fast_cfg.n_layer, b, fast_cfg.resolved_local_heads,
                fast_cfg.head_dim, k + 1, h.dtype)
            x, fcache = transformer_forward(params, "fast_layers", h[:, None],
                                            fcache, fast_cfg)
            codes = [sem_code]
            cur = nn.embedding(params["fast_embeddings"], sem_code[:, None])
            for _ in range(k - 1):
                x, fcache = transformer_forward(params, "fast_layers", cur,
                                                fcache, fast_cfg)
                logits = nn.linear(
                    params["fast_output"],
                    nn.rms_norm(params["fast_norm"], x[:, -1],
                                fast_cfg.norm_eps))
                rng, sub = jax.random.split(rng)
                ci = sample(sub, logits, temperature, top_p, top_k)
                codes.append(ci)
                cur = nn.embedding(params["fast_embeddings"], ci[:, None])
            return jnp.stack(codes, axis=1), rng

        def loop(params, grid, cache, rng):
            """grid [1, K+1, T] prompt -> (codes [budget, K], count)."""
            embeds = embed_grid(params, grid, cfg).astype(self.dtype)
            x, cache = transformer_forward(params, "layers", embeds, cache,
                                           cfg.text)
            h_slow = nn.rms_norm(params["norm"], x[:, -1:], cfg.text.norm_eps)
            logits0 = slow_logits(params, h_slow[:, -1])
            h0 = fast_project(params, h_slow[:, -1])

            codes_buf = jnp.zeros((budget, k), jnp.int32)
            ring = jnp.full((RAS_WINDOW,), -1, jnp.int32)

            def cond(c):
                _, i, _, _, _, finished, _, _ = c
                return jnp.logical_and(~finished, i < budget)

            def body(c):
                codes_buf, i, cache, logits, h, finished, ring, rng = c
                rng, r1, r2 = jax.random.split(rng, 3)
                normal = sample(r1, logits, temperature, top_p, top_k)
                high = sample(r2, logits, RAS_HIGH_TEMPERATURE,
                              RAS_HIGH_TOP_P, top_k)
                seen = jnp.any(ring == normal[0])
                in_range = ((normal[0] >= sem_start)
                            & (normal[0] <= cfg.semantic_end_token_id))
                sem = jnp.where(seen & in_range, high, normal)
                valid = sem[0] != im_end
                ring = jnp.where(valid,
                                 ring.at[i % RAS_WINDOW].set(sem[0]), ring)
                sem_code = jnp.clip(sem - sem_start, 0,
                                    fast_vocab - 1).astype(jnp.int32)
                frame, rng = fast_decode(params, h, sem_code, rng)
                codes_buf = jnp.where(valid,
                                      codes_buf.at[i].set(frame[0]),
                                      codes_buf)
                # next backbone step over [sem, frame codes]
                step = jnp.concatenate([sem[:, None], frame],
                                       axis=1)[:, :, None]
                embeds = embed_grid(params, step, cfg).astype(self.dtype)
                x, cache = transformer_forward(params, "layers", embeds,
                                               cache, cfg.text)
                h_slow = nn.rms_norm(params["norm"], x[:, -1:],
                                     cfg.text.norm_eps)
                logits = slow_logits(params, h_slow[:, -1])
                h = fast_project(params, h_slow[:, -1])
                return (codes_buf, i + valid.astype(jnp.int32), cache,
                        logits, h, ~valid, ring, rng)

            init = (codes_buf, jnp.int32(0), cache, logits0, h0,
                    jnp.bool_(False), ring, rng)
            codes_buf, count, *_ = jax.lax.while_loop(cond, body, init)
            return codes_buf, count

        fn = ajit(loop, donate_argnums=(2,))
        self._loops[key] = fn
        return fn

    def _generate_codes(self, grid: np.ndarray, batch_text: str,
                        params: AudioGenerateParameters) -> np.ndarray:
        """-> codes [K, T] for one batch
        (generateCodesForBatch, FishSpeechModel.swift:792-913)."""
        text_tokens = len(self._encode_text(batch_text))
        budget = min(params.max_tokens or 1024, max(32, text_tokens * 12))
        loop = self._get_loop(budget, params.temperature, params.top_p,
                              params.top_k or 30)
        cache = kv_cache.init_cache(
            self.config.text.n_layer, 1,
            self.config.text.resolved_local_heads,
            self.config.text.head_dim,
            grid.shape[1] + budget + 1, self.dtype)
        lp = dict(self.params)
        lp["_sem_bias"] = jnp.asarray(self._sem_bias)
        seed = params.seed if params.seed is not None else 0
        codes, count = loop(lp, jnp.asarray(grid[None], jnp.int32), cache,
                            jax.random.PRNGKey(seed))
        count = int(count)
        if count == 0:
            raise AudioGenerationError(
                f"No audio tokens were generated for batch text: {batch_text}")
        return np.asarray(codes)[:count].T  # [K, T]

    # -- public API --------------------------------------------------------------

    def _segments(self, text: str, ref_audio=None, ref_text=None,
                  params: AudioGenerateParameters | None = None,
                  chunk_bytes: int = 300, speed: float = 1.0):
        if not text.strip():
            raise AudioGenerationError("Text prompt cannot be empty")
        if self.tokenizer is None:
            raise AudioGenerationError("Tokenizer not loaded")
        if self.codec is None:
            raise AudioGenerationError("Codec not loaded")
        params = params or self.default_generation_parameters()
        ref_codes = None
        if ref_audio is not None:
            ref = np.asarray(ref_audio, np.float32)
            if ref.ndim > 1:
                ref = ref.mean(axis=tuple(range(ref.ndim - 1))) \
                    if ref.shape[0] <= 8 else ref.reshape(-1)
            ref_codes = np.asarray(self.codec.encode(ref))[0]
        history: list[tuple[str, np.ndarray]] = []
        for batch_text in generation_batches(text, chunk_bytes):
            t0 = time.perf_counter()
            grid = self.build_prompt_grid(batch_text, ref_codes, ref_text,
                                          history)
            codes = self._generate_codes(grid, batch_text, params)
            audio = np.asarray(self.codec.decode(codes))[0, :, 0]
            audio = adjust_speed(audio, speed)
            history.append((batch_text, codes))
            yield audio, grid.shape[1], codes.shape[1], \
                time.perf_counter() - t0

    def generate(self, text: str, voice: str | None = None, ref_audio=None,
                 ref_text: str | None = None, language: str | None = None,
                 generation_parameters: AudioGenerateParameters | None = None,
                 speed: float = 1.0) -> np.ndarray:
        del voice, language  # reference ignores both (FishSpeechModel:548)
        parts = [a for a, *_ in self._segments(
            text, ref_audio, ref_text, generation_parameters, speed=speed)]
        if not parts:
            return np.zeros((0,), np.float32)
        return np.concatenate(parts)

    def generate_stream(self, text: str, voice: str | None = None,
                        ref_audio=None, ref_text: str | None = None,
                        language: str | None = None,
                        generation_parameters: AudioGenerateParameters
                        | None = None):
        """Yields .audio per text batch + final .info
        (streaming chunk bytes = interval*40, FishSpeechModel.swift:402-407)."""
        del voice, language
        params = generation_parameters or self.default_generation_parameters()
        interval = params.streaming_interval or 2.0
        chunk_bytes = max(40, int(min(interval, 60.0) * 40))
        n_prompt = n_gen = 0
        total = 0.0
        for audio, pt, gt, elapsed in self._segments(
                text, ref_audio, ref_text, params, chunk_bytes=chunk_bytes):
            n_prompt += pt
            n_gen += gt
            total += elapsed
            yield AudioGeneration.from_audio(audio)
        yield AudioGeneration.from_info(AudioGenerationInfo(
            prompt_token_count=n_prompt, generation_token_count=n_gen,
            generate_time=total))
