"""Marvis / CSM (Conversational Speech Model): Llama backbone + depth
decoder emitting 12.5 fps Mimi frames, with per-frame streaming decode.

TPU-first rebuild of the reference
(Sources/MLXAudioTTS/Models/Marvis/{MarvisTTSModel,CSMModel}.swift):
frames are [T, K+1] grids (K Mimi codebooks + one text column) with a
validity mask; per step the backbone consumes the mask-summed embeddings,
codebook0_head samples the first code and the small depth decoder
autoregresses codebooks 1..K-1 with a fresh cache (CSMModel.swift:467-526).
Voices are bundled prompt wav+txt pairs used as in-context segments
(MarvisTTSModel.swift:380-397); EOS is an all-zero frame.

The whole frame step (backbone step + unrolled depth-decoder loop) is one
jitted function; frames stream through MimiStreamingDecoder every
``streaming_interval`` seconds.
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

from tpu_audio.codecs.mimi import Mimi, MimiStreamingDecoder
from tpu_audio.core import hub, kv_cache, loading, nn
from tpu_audio.core.generation import (
    AudioGenerateParameters,
    AudioGeneration,
    AudioGenerationError,
    AudioGenerationInfo,
)
from tpu_audio.models import llama
from tpu_audio.core.jitting import ajit

__all__ = ["MarvisTTS", "CSMConfig"]

FRAME_RATE = 12.5


@dataclass
class CSMConfig:
    text_vocab_size: int = 128256
    audio_vocab_size: int = 2051
    audio_num_codebooks: int = 32
    backbone: llama.LlamaConfig = field(default_factory=llama.LlamaConfig)
    decoder: llama.LlamaConfig = field(default_factory=llama.LlamaConfig)
    sample_rate: int = 24000

    @classmethod
    def from_dict(cls, d: dict) -> "CSMConfig":
        flavors = {
            "llama-1B": dict(hidden_size=2048, num_hidden_layers=16,
                             intermediate_size=8192, num_attention_heads=32,
                             num_key_value_heads=8, rope_theta=500000.0),
            "llama-100M": dict(hidden_size=1024, num_hidden_layers=4,
                               intermediate_size=8192, num_attention_heads=8,
                               num_key_value_heads=2, rope_theta=500000.0),
        }

        def subcfg(src: dict | None, flavor: str | None):
            base = dict(flavors.get(flavor or "", {}))
            if src:
                base.update({k: v for k, v in src.items()
                             if k in llama.LlamaConfig.__dataclass_fields__})
            c = llama.LlamaConfig.from_dict(base)
            c.tie_word_embeddings = True
            return c

        return cls(
            text_vocab_size=d.get("text_vocab_size", 128256),
            audio_vocab_size=d.get("audio_vocab_size", 2051),
            audio_num_codebooks=d.get("audio_num_codebooks", 32),
            backbone=subcfg(d.get("backbone_config"), d.get("backbone_flavor")),
            decoder=subcfg(d.get("depth_decoder_config"), d.get("decoder_flavor")),
        )


def sanitize(weights: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """torchtune names -> HF-style (MarvisTTSModel.sanitize,
    MarvisTTSModel.swift:225-267); the ``model.`` prefix is stripped so the
    tree roots at backbone/decoder/embeddings."""
    out = {}
    for k, v in weights.items():
        if k.startswith("model."):
            k = k[len("model."):]
        if "attn" in k and "self_attn" not in k:
            k = k.replace("attn", "self_attn").replace("output_proj", "o_proj")
        if "mlp" in k:
            k = k.replace("w1", "gate_proj").replace("w2", "down_proj").replace(
                "w3", "up_proj")
        k = k.replace("sa_norm.scale", "input_layernorm.weight")
        k = k.replace("mlp_norm.scale", "post_attention_layernorm.weight")
        k = k.replace("backbone.norm.scale", "backbone.norm.weight")
        k = k.replace("decoder.norm.scale", "decoder.norm.weight")
        out[k] = v
    return out


class MarvisTTS:
    def __init__(self, config: CSMConfig, params, tokenizer=None,
                 codec: Mimi | None = None, model_dir: str | None = None,
                 dtype=jnp.float32):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.codec = codec
        self.model_dir = model_dir
        self.dtype = dtype
        self.sample_rate = config.sample_rate
        self._frame_steps: dict = {}
        self._prefill = ajit(self._prefill_impl, donate_argnums=(2,))

    def default_generation_parameters(self) -> AudioGenerateParameters:
        return AudioGenerateParameters(temperature=0.9, top_p=0.8,
                                       max_tokens=int(60000 / 80))

    @classmethod
    def from_pretrained(cls, repo_or_path: str, codec: Mimi | None = None,
                        mimi_repo: str | None = None,
                        dtype=jnp.float32) -> "MarvisTTS":
        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = CSMConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        for sub in ("backbone", "decoder"):
            if sub in params:
                params[sub] = llama.maybe_stack(params[sub])
        tokenizer = None
        if (model_dir / "tokenizer.json").exists():
            from tokenizers import Tokenizer

            tokenizer = Tokenizer.from_file(str(model_dir / "tokenizer.json"))
        if codec is None and mimi_repo:
            try:
                codec = Mimi.from_pretrained(
                    mimi_repo, num_codebooks=config.audio_num_codebooks)
            except Exception:
                codec = None
        if codec is None:
            mimi_dir = model_dir / "mimi"
            if mimi_dir.is_dir():
                codec = Mimi.from_pretrained(
                    str(mimi_dir), num_codebooks=config.audio_num_codebooks)
        return cls(config, params, tokenizer, codec, str(model_dir), dtype)

    # -- embedding (CSMModel._embedTokens) ------------------------------------

    def _embed_frames(self, params, tokens, mask):
        """tokens [B, T, K+1] -> mask-summed embeds [B, T, D]."""
        cfg = self.config
        k = cfg.audio_num_codebooks
        audio_ids = tokens[..., :k]
        text_ids = tokens[..., k]
        offsets = (jnp.arange(k) * cfg.audio_vocab_size)[None, None]
        audio_emb = nn.embedding(params["audio_embeddings"], audio_ids + offsets)
        text_emb = nn.embedding(params["text_embeddings"], text_ids)[..., None, :]
        embeds = jnp.concatenate([audio_emb, text_emb], axis=2)  # [B,T,K+1,D]
        return (embeds * mask[..., None]).sum(axis=2)

    def _prefill_impl(self, params, embeds, cache):
        h, cache = llama.forward(params["backbone"], None, cache,
                                 self.config.backbone, inputs_embeds=embeds,
                                 return_hidden=True)
        return h[:, -1], cache

    def _get_frame_step(self, gen_params: AudioGenerateParameters,
                        max_codebooks: int):
        key = (gen_params.temperature, gen_params.top_p, max_codebooks)
        if key in self._frame_steps:
            return self._frame_steps[key]
        cfg = self.config
        from tpu_audio.core.sampling import _mask_top_k, _mask_top_p

        def sample(rng, logits):
            logits = logits.astype(jnp.float32)
            if gen_params.temperature == 0.0:
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)
            if gen_params.top_p < 1.0:
                logits = _mask_top_p(logits, gen_params.top_p)
            return jax.random.categorical(
                rng, logits / gen_params.temperature, axis=-1).astype(jnp.int32)

        def frame_step(params, last_frame, last_mask, cache, rng):
            """last_frame [B, 1, K+1] -> (codes [B, K], cache, rng)."""
            embeds = self._embed_frames(params, last_frame, last_mask)
            h, cache = llama.forward(params["backbone"], None, cache,
                                     cfg.backbone, inputs_embeds=embeds,
                                     return_hidden=True)
            last_h = h[:, -1]  # [B, D]
            rng, sub = jax.random.split(rng)
            c0 = sample(sub, last_h @ params["codebook0_head"]["weight"].T.astype(last_h.dtype))
            c0_embed = nn.embedding(params["audio_embeddings"], c0[:, None])
            curr = jnp.concatenate([last_h[:, None], c0_embed], axis=1)
            codes = [c0]
            dec_cache = kv_cache.init_cache(
                cfg.decoder.num_hidden_layers, last_h.shape[0],
                cfg.decoder.num_key_value_heads, cfg.decoder.resolved_head_dim,
                max_codebooks + 2, embeds.dtype)
            for i in range(1, max_codebooks):
                proj = nn.linear(params["projection"], curr)
                dec_h, dec_cache = llama.forward(
                    params["decoder"], None, dec_cache, cfg.decoder,
                    inputs_embeds=proj, return_hidden=True)
                w_i = params["audio_head"][i - 1].astype(dec_h.dtype)
                rng, sub = jax.random.split(rng)
                ci = sample(sub, dec_h[:, -1] @ w_i)
                codes.append(ci)
                offset = i * cfg.audio_vocab_size
                curr = nn.embedding(params["audio_embeddings"],
                                    ci[:, None] + offset)
            return jnp.stack(codes, axis=1), cache, rng

        fn = ajit(frame_step, donate_argnums=(3,))
        self._frame_steps[key] = fn
        return fn

    # -- tokenization (MarvisTTSModel.swift:70-142) ----------------------------

    def _tokenize_text(self, text: str, speaker: int):
        k = self.config.audio_num_codebooks
        ids = self.tokenizer.encode(f"[{speaker}]{text}").ids
        t = len(ids)
        frame = np.zeros((t, k + 1), np.int32)
        mask = np.zeros((t, k + 1), bool)
        frame[:, k] = ids
        mask[:, k] = True
        return frame, mask

    def _tokenize_audio(self, audio: np.ndarray, add_eos: bool = True):
        k = self.config.audio_num_codebooks
        codes = np.asarray(self.codec.encode(np.asarray(audio, np.float32)))[0]
        if add_eos:
            codes = np.concatenate([codes, np.zeros((k, 1), codes.dtype)], axis=1)
        t = codes.shape[1]
        frame = np.zeros((t, k + 1), np.int32)
        mask = np.zeros((t, k + 1), bool)
        frame[:, :k] = codes.T
        mask[:, :k] = True
        return frame, mask

    def _load_voice_prompt(self, voice: str):
        """Bundled prompt wav+txt pair (MarvisTTSModel.swift:380-397)."""
        from tpu_audio.core.audio_io import load_audio

        base = Path(self.model_dir or ".") / "prompts"
        wav = base / f"{voice}.wav"
        txt = base / f"{voice}.txt"
        if not wav.exists() or not txt.exists():
            raise AudioGenerationError(f"voice prompt {voice!r} not found in {base}")
        audio, _ = load_audio(wav, sample_rate=self.sample_rate)
        return audio, txt.read_text().strip()

    # -- generation -------------------------------------------------------------

    def generate_stream(self, text: str, voice: str | None = None,
                        ref_audio=None, ref_text: str | None = None,
                        language: str | None = None,
                        generation_parameters: AudioGenerateParameters | None = None,
                        max_codebooks: int | None = None):
        params = generation_parameters or self.default_generation_parameters()
        if self.tokenizer is None or self.codec is None:
            raise AudioGenerationError("tokenizer/codec not loaded")
        if ref_audio is not None and ref_text is not None:
            ctx_audio, ctx_text = np.asarray(ref_audio), ref_text
        else:
            ctx_audio, ctx_text = self._load_voice_prompt(
                voice or "conversational_a")
        cfg = self.config
        k = cfg.audio_num_codebooks
        max_cb = min(k, max_codebooks or k)

        gen_text = (ctx_text + " " + text).strip()
        tf, tm = self._tokenize_text(gen_text, speaker=0)
        af, am = self._tokenize_audio(ctx_audio, add_eos=False)
        frames = np.concatenate([tf, af], axis=0)[None]
        masks = np.concatenate([tm, am], axis=0)[None]

        max_frames = params.max_tokens
        cache = kv_cache.init_cache(
            cfg.backbone.num_hidden_layers, 1, cfg.backbone.num_key_value_heads,
            cfg.backbone.resolved_head_dim,
            frames.shape[1] + max_frames + 1, self.dtype)
        t0 = time.perf_counter()
        embeds = self._embed_frames(self.params, jnp.asarray(frames),
                                    jnp.asarray(masks)).astype(self.dtype)
        _, cache = self._prefill(self.params, embeds[:, :-1], cache)
        # re-feed the last prompt frame through the step fn
        last_frame = jnp.asarray(frames[:, -1:])
        last_mask = jnp.asarray(masks[:, -1:], jnp.float32)
        step = self._get_frame_step(params, max_cb)
        rng = jax.random.PRNGKey(params.seed if params.seed is not None else 0)
        prefill_time = time.perf_counter() - t0

        decoder = MimiStreamingDecoder(self.codec)
        interval_frames = max(1, int(params.streaming_interval * FRAME_RATE))
        pending: list[np.ndarray] = []
        n_frames = 0
        total_samples = 0
        t1 = time.perf_counter()
        for _ in range(max_frames):
            codes, cache, rng = step(self.params, last_frame, last_mask,
                                     cache, rng)
            codes_np = np.asarray(codes)  # [1, max_cb]
            if not codes_np.any():
                break  # all-zero frame = EOS
            full = np.zeros((1, k), np.int32)
            full[:, :max_cb] = codes_np
            pending.append(full)
            n_frames += 1
            next_frame = np.zeros((1, 1, k + 1), np.int32)
            next_frame[0, 0, :k] = full[0]
            next_mask = np.zeros((1, 1, k + 1), np.float32)
            next_mask[0, 0, :k] = 1.0
            last_frame = jnp.asarray(next_frame)
            last_mask = jnp.asarray(next_mask)
            if len(pending) >= interval_frames:
                tokens = np.stack(pending, axis=2)  # [1, K, t]
                wav = decoder.decode_frames(tokens)[0]
                pending.clear()
                if wav.size:
                    total_samples += len(wav)
                    yield AudioGeneration.from_audio(wav)
        if pending:
            tokens = np.stack(pending, axis=2)
            wav = decoder.decode_frames(tokens)[0]
            if wav.size:
                total_samples += len(wav)
                yield AudioGeneration.from_audio(wav)
        yield AudioGeneration.from_info(AudioGenerationInfo(
            generation_token_count=n_frames, prompt_time=prefill_time,
            generate_time=time.perf_counter() - t1,
            audio_duration=total_samples / self.sample_rate))

    def generate(self, text: str, voice: str | None = None, ref_audio=None,
                 ref_text: str | None = None, language: str | None = None,
                 generation_parameters: AudioGenerateParameters | None = None
                 ) -> np.ndarray:
        chunks = [ev.audio for ev in self.generate_stream(
            text, voice, ref_audio, ref_text, language, generation_parameters)
            if ev.audio is not None]
        if not chunks:
            raise AudioGenerationError("no audio generated")
        return np.concatenate(chunks)
