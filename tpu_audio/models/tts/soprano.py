"""Soprano: small (80M) AR transformer TTS with a Vocos-style hidden-state
decoder and ISTFT head.

TPU-first rebuild of the reference
(Sources/MLXAudioTTS/Models/Soprano/*): Qwen3-style backbone (per-head QK
RMSNorm), prompts framed as ``[STOP][TEXT]{text}[START]`` with [STOP]=3 as
the stop token (Soprano.swift:405,863), hidden states (not tokens!) of every
decode step collected and vocoded: linear-interpolated 4x, ConvNeXt
backbone, mag/phase ISTFT head with window-sum normalization; the final
``token_size`` trim keeps ``count*token_size - token_size`` samples from the
end (Soprano.swift:662-671). Text is split per sentence/newline and chunks
are synthesized independently.

The decode loop is one jitted ``lax.while_loop`` that also scatters each
step's hidden state into a buffer — no per-token host syncs.
"""

from __future__ import annotations

import functools
import math
import re
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.codecs.vocos import istft_head, vocos_backbone
from tpu_audio.core import hub, kv_cache, loading, nn
from tpu_audio.core.generation import (
    AudioGenerateParameters,
    AudioGeneration,
    AudioGenerationError,
    AudioGenerationInfo,
)
from tpu_audio.core.sampling import apply_repetition_penalty, _mask_top_p
from tpu_audio.models import llama
from tpu_audio.core.jitting import ajit

__all__ = ["Soprano", "SopranoConfig"]


@dataclass
class SopranoConfig(llama.LlamaConfig):
    token_size: int = 2048
    sample_rate: int = 32000
    decoder_dim: int = 768
    decoder_num_layers: int = 8
    decoder_intermediate_dim: int | None = None
    decoder_n_fft: int = 2048
    decoder_hop: int = 512
    upscale: int = 4
    stop_token_id: int = 3

    @classmethod
    def from_dict(cls, d: dict) -> "SopranoConfig":
        keys = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in d.items() if k in keys}
        cfg = cls(**kw)
        cfg.qk_norm = True
        return cfg


def sanitize(weights):
    """Soprano.sanitize (Soprano.swift:540-600): strip 'model.' prefixes,
    lift language_model.* to model.*, lm_head to top level."""
    out = {}
    for k, v in weights.items():
        if k.startswith("model."):
            k = k[len("model."):]
        if k.startswith("language_model.lm_head"):
            k = k.replace("language_model.", "")
        elif k.startswith("language_model."):
            k = k.replace("language_model.", "model.")
        if "rotary_emb.inv_freq" in k:
            continue
        # decoder convs: MLX [O,K,I] -> torch [O,I,K]
        if (k.startswith("decoder.") and k.endswith(".weight") and v.ndim == 3):
            v = np.transpose(v, (0, 2, 1))
        out[k] = v
    return out


def _interp_linear_aligned(x, size):
    """align_corners=True linear interpolation along axis 1 of [B, T, C]."""
    b, t, c = x.shape
    if t == 1:
        return jnp.broadcast_to(x, (b, size, c))
    pos = jnp.linspace(0.0, t - 1, size)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, t - 1)
    frac = (pos - lo)[None, :, None]
    return x[:, lo] * (1 - frac) + x[:, hi] * frac


def soprano_decode_audio(params, hidden, cfg: SopranoConfig):
    """hidden states [B, T, C] -> waveform [B, samples]
    (SopranoDecoder.swift:225-285)."""
    p = params["decoder"]
    t = hidden.shape[1]
    target = cfg.upscale * (t - 1) + 1
    h = _interp_linear_aligned(hidden.astype(jnp.float32), target)
    h = vocos_backbone(p["decoder"], h, cfg.decoder_num_layers,
                       input_kernel=1, dw_kernel=3)
    return istft_head(p["head"], h, cfg.decoder_n_fft, cfg.decoder_hop)


class Soprano:
    def __init__(self, config: SopranoConfig, params, tokenizer=None,
                 dtype=jnp.float32):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.dtype = dtype
        self.sample_rate = config.sample_rate
        self._loops: dict = {}
        self._decode_audio = ajit(
            functools.partial(soprano_decode_audio, cfg=config))

    @property
    def _lm_params(self):
        return {k: v for k, v in self.params.items() if k != "decoder"}

    def default_generation_parameters(self) -> AudioGenerateParameters:
        return AudioGenerateParameters(
            max_tokens=512, temperature=0.3, top_p=0.95,
            repetition_penalty=1.5, repetition_context_size=30)

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32) -> "Soprano":
        from pathlib import Path

        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = SopranoConfig.from_dict(hub.load_config(model_dir))
        params = llama.maybe_stack(
            loading.load_params(model_dir, sanitize=sanitize, dtype=dtype))
        tokenizer = None
        if (model_dir / "tokenizer.json").exists():
            from tokenizers import Tokenizer

            tokenizer = Tokenizer.from_file(str(model_dir / "tokenizer.json"))
        return cls(config, params, tokenizer, dtype)

    # -- jitted generation loop --------------------------------------------------

    def _get_loop(self, gp: AudioGenerateParameters, max_tokens: int):
        key = (gp.temperature, gp.top_p, gp.repetition_penalty,
               gp.repetition_context_size, max_tokens)
        if key in self._loops:
            return self._loops[key]
        cfg = self.config
        ctx = max(gp.repetition_context_size, 1)

        def loop(params, prompt_ids, prompt_len, cache, rng):
            """Returns (hidden_buf [max_tokens+1, D], count, tokens)."""
            # prefill all but last token
            _, cache = llama.forward(params, prompt_ids[:, :-1], cache, cfg)
            d = cfg.hidden_size
            hidden_buf = jnp.zeros((max_tokens + 1, d), jnp.float32)

            def step(tok, cache):
                h, cache = llama.forward(params, tok, cache, cfg,
                                         return_hidden=True)
                if "lm_head" in params:
                    logits = nn.linear(params["lm_head"], h[:, -1])
                else:
                    logits = nn.embedding_as_linear(
                        params["model"]["embed_tokens"], h[:, -1])
                return h[:, -1], logits, cache

            def cond(c):
                (_, i, _, _, finished, _, _, _) = c
                return jnp.logical_and(~finished, i < max_tokens + 1)

            def body(c):
                (buf, i, cache, last, finished, rng, hist, hpos) = c
                h, logits, cache = step(last[:, None], cache)
                buf = buf.at[i].set(h[0].astype(jnp.float32))
                logits = logits.astype(jnp.float32)
                if gp.repetition_penalty != 1.0:
                    valid = (jax.lax.broadcasted_iota(jnp.int32, hist.shape, 1)
                             < jnp.minimum(hpos, ctx))
                    logits = apply_repetition_penalty(
                        logits, hist, valid, gp.repetition_penalty)
                rng, sub = jax.random.split(rng)
                if gp.temperature == 0.0:
                    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                else:
                    masked = _mask_top_p(logits, gp.top_p) if gp.top_p < 1.0 else logits
                    nxt = jax.random.categorical(
                        sub, masked / gp.temperature, axis=-1).astype(jnp.int32)
                finished = nxt[0] == cfg.stop_token_id
                hist = jax.lax.dynamic_update_slice(hist, nxt[:, None],
                                                    (0, hpos % ctx))
                return (buf, i + 1, cache, nxt, finished, rng, hist, hpos + 1)

            init = (hidden_buf, jnp.int32(0), cache,
                    prompt_ids[:, -1], jnp.bool_(False), rng,
                    jnp.zeros((1, ctx), jnp.int32), jnp.int32(0))
            buf, count, *_ = jax.lax.while_loop(cond, body, init)
            return buf, count

        fn = ajit(loop, donate_argnums=(3,))
        self._loops[key] = fn
        return fn

    # -- text preprocessing (TextUtils.swift; simplified) ------------------------

    @staticmethod
    def _split_text(text: str) -> list[str]:
        pieces = [p.strip() for p in re.split(r"\n", text) if p.strip()]
        out = []
        for p in pieces:
            if len(p) <= 500:
                out.append(p)
            else:
                out += [s.strip() for s in re.findall(r"[^.!?]+[.!?]?", p)
                        if s.strip()]
        return out or [text]

    def _tokenize_prompt(self, text: str) -> list[int]:
        return list(self.tokenizer.encode(f"[STOP][TEXT]{text}[START]").ids)

    # -- generation ----------------------------------------------------------------

    def generate(self, text: str, voice: str | None = None, ref_audio=None,
                 ref_text: str | None = None, language: str | None = None,
                 generation_parameters: AudioGenerateParameters | None = None
                 ) -> np.ndarray:
        parts = [ev.audio for ev in self.generate_stream(
            text, voice, ref_audio, ref_text, language, generation_parameters)
            if ev.audio is not None]
        if not parts:
            raise AudioGenerationError("no audio generated")
        return np.concatenate(parts)

    def generate_stream(self, text: str, voice: str | None = None,
                        ref_audio=None, ref_text: str | None = None,
                        language: str | None = None,
                        generation_parameters: AudioGenerateParameters | None = None):
        if self.tokenizer is None:
            raise AudioGenerationError("tokenizer not loaded")
        gp = generation_parameters or self.default_generation_parameters()
        cfg = self.config
        t_start = time.perf_counter()
        total_tokens = 0
        total_samples = 0
        for chunk_text in self._split_text(text):
            prompt = self._tokenize_prompt(chunk_text)
            bucket = max(16, 1 << math.ceil(math.log2(max(len(prompt), 2))))
            padded = np.zeros((1, bucket), np.int32)
            padded[0, bucket - len(prompt):] = prompt
            cache = llama.make_cache(cfg, 1, bucket + gp.max_tokens + 2,
                                     self.dtype)
            cache = cache._replace(
                valid_from=jnp.asarray(bucket - len(prompt), jnp.int32))
            loop = self._get_loop(gp, gp.max_tokens)
            rng = jax.random.PRNGKey(gp.seed if gp.seed is not None else 0)
            buf, count = loop(self._lm_params, jnp.asarray(padded),
                              jnp.int32(len(prompt)), cache, rng)
            count = int(count)
            if count == 0:
                continue
            hidden = buf[None, :count]
            audio = np.asarray(self._decode_audio(self.params, hidden))
            keep = count * cfg.token_size - cfg.token_size
            wav = audio[0, -keep:] if keep > 0 else audio[0]
            total_tokens += count
            total_samples += len(wav)
            yield AudioGeneration.from_audio(wav)
        yield AudioGeneration.from_info(AudioGenerationInfo(
            generation_token_count=total_tokens,
            generate_time=time.perf_counter() - t_start,
            audio_duration=total_samples / self.sample_rate))
