"""GLM-ASR: Whisper-style audio encoder + GLM LLM decoder.

TPU-first rebuild of the reference
(Sources/MLXAudioSTT/Models/GLMASR/*): a Whisper encoder variant whose
self-attention can use rotary positions (dims = head_dim/2, traditional
pairing; GLMASRLayers.swift:41) instead of learned embeddings, followed
by LayerNorm, a merge-factor frame stacking ([B, T, D] -> [B, T/m, D*m],
GLMASRLayers.swift:252-275) and an "adapting" MLP into the LM hidden
size. Audio embeddings are spliced over a `<|user|>\\n<|begin_of_audio|>
... <|end_of_audio|>\\nPlease transcribe this audio into text
<|assistant|>\\n` ChatML-style prompt (GLMASR.swift:26-29) and decoded
by a llama-family GLM backbone (traditional/interleaved rope).

Decode runs as prefill + a jitted `lax.while_loop` with a multi-EOS
stop, instead of the reference's per-token python loop.
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

from tpu_audio.core import dsp, hub, loading, nn
from tpu_audio.core.audio_io import resample_audio
from tpu_audio.core.generation import (
    STTGenerateParameters,
    STTOutput,
    STTSegment,
)
from tpu_audio.models import llama
from tpu_audio.core.jitting import ajit

__all__ = ["GLMASR", "GLMASRConfig"]

USER_PREFIX = "<|user|>\n<|begin_of_audio|>"
USER_SUFFIX = ("<|end_of_audio|>\nPlease transcribe this audio into text"
               "<|assistant|>\n")


@dataclass
class GLMWhisperConfig:
    """GLMASRConfig.swift whisper_config."""

    d_model: int = 1280
    encoder_attention_heads: int = 20
    encoder_ffn_dim: int = 5120
    encoder_layers: int = 32
    num_mel_bins: int = 128
    max_source_positions: int = 1500
    rope_traditional: bool = True


@dataclass
class GLMASRConfig:
    """GLMASRConfig.swift:272-318."""

    whisper: GLMWhisperConfig = field(default_factory=GLMWhisperConfig)
    lm: llama.LlamaConfig = field(default_factory=llama.LlamaConfig)
    merge_factor: int = 4
    use_rope: bool = True
    max_whisper_length: int = 1500
    eos_token_ids: tuple = ()

    @classmethod
    def from_dict(cls, d: dict) -> "GLMASRConfig":
        wk = set(GLMWhisperConfig.__dataclass_fields__)
        wcfg_dict = d.get("whisper_config", {})
        wcfg = GLMWhisperConfig(**{k: v for k, v in wcfg_dict.items()
                                   if k in wk})
        lm_dict = dict(d.get("lm_config", {}))
        lm = llama.LlamaConfig.from_dict(lm_dict)
        lm.rope_interleaved = bool(lm_dict.get("rope_traditional", True))
        eos = lm_dict.get("eos_token_id", [])
        if isinstance(eos, int):
            eos = [eos]
        return cls(
            whisper=wcfg, lm=lm,
            merge_factor=d.get("merge_factor", 4),
            use_rope=d.get("use_rope", True),
            max_whisper_length=d.get("max_whisper_length", 1500),
            eos_token_ids=tuple(eos))


def _glm_log_mel(audio, n_mels: int, sample_rate: int = 16000,
                 n_fft: int = 400, hop: int = 160):
    """Whisper-style log-mel but with the generic filterbank (HTK scale +
    slaney norm) and no drop-last-frame (DSP.swift computeMelSpectrogram,
    230-268). Returns [T, n_mels]."""
    window = dsp.hanning_window(n_fft, periodic=True)
    freqs = dsp.stft(jnp.asarray(audio, jnp.float32), window, n_fft, hop,
                     pad_mode="reflect")
    filters = jnp.asarray(dsp.mel_filters(
        sample_rate, n_fft, n_mels, norm="slaney", mel_scale="htk"))
    mel = (jnp.abs(freqs) ** 2) @ filters
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max() - 8.0)
    return (log_spec + 4.0) / 4.0


def _whisper_layer(p, x, cfg: GLMWhisperConfig, use_rope: bool):
    """Pre-LN whisper layer, optionally rotary (GLMASRLayers.swift:15-120).
    k_proj has no bias."""
    h = nn.layer_norm(p["self_attn_layer_norm"], x)
    a = p["self_attn"]
    b, t, d = h.shape
    heads = cfg.encoder_attention_heads
    hd = d // heads
    q = nn.linear(a["q_proj"], h).reshape(b, t, heads, hd).transpose(0, 2, 1, 3)
    k = nn.linear(a["k_proj"], h).reshape(b, t, heads, hd).transpose(0, 2, 1, 3)
    v = nn.linear(a["v_proj"], h).reshape(b, t, heads, hd).transpose(0, 2, 1, 3)
    if use_rope:
        # rope over the first half of head dims (dims = head_dim/2)
        rd = hd // 2
        inv = 1.0 / (10000.0 ** (np.arange(0, rd, 2) / rd))
        ang = np.arange(t)[:, None] * inv[None, :]
        cos = jnp.asarray(np.cos(ang), jnp.float32)
        sin = jnp.asarray(np.sin(ang), jnp.float32)

        def rot(z):
            zr, zp = z[..., :rd], z[..., rd:]
            zr = nn.apply_rope(zr, cos, sin,
                               interleaved=cfg.rope_traditional)
            return jnp.concatenate([zr, zp.astype(zr.dtype)], axis=-1)

        q, k = rot(q), rot(k)
    o = nn.sdpa(q, k, v).transpose(0, 2, 1, 3).reshape(b, t, d)
    x = x + nn.linear(a["out_proj"], o)
    h = nn.layer_norm(p["final_layer_norm"], x)
    return x + nn.linear(p["fc2"], nn.gelu(nn.linear(p["fc1"], h)))


def audio_encoder_forward(params, mel, cfg: GLMASRConfig):
    """mel [B, T, n_mels] -> LM-space audio embeds [B, T/2/merge, lm_d]
    (GLMASRLayers.swift:210-278)."""
    p = params["audio_encoder"]
    w = p["whisper"]
    x = nn.gelu(nn.conv1d(w["conv1"], mel, padding=1))
    x = nn.gelu(nn.conv1d(w["conv2"], x, stride=2, padding=1))
    if not cfg.use_rope:
        x = x + w["embed_positions"]["weight"][None, : x.shape[1]].astype(
            x.dtype)
    for i in range(cfg.whisper.encoder_layers):
        x = _whisper_layer(w["layers"][str(i)], x, cfg.whisper, cfg.use_rope)
    x = nn.layer_norm(p["layer_norm"], x)
    m = cfg.merge_factor
    b, t, d = x.shape
    n = min((t - m) // m + 1, cfg.max_whisper_length // m)
    merged = x[:, : n * m].reshape(b, n, m * d)
    h = nn.gelu(nn.linear(p["adapting"]["fc1"], merged))
    return nn.linear(p["adapting"]["fc2"], h)


def sanitize(weights):
    """GLMASR.swift:552-594: adapting.{0,2} -> fc1/fc2, model./lm_head. ->
    language_model.*, MLX conv layout -> torch."""
    out = {}
    for k, v in weights.items():
        k = k.replace("audio_encoder.adapting.0.", "audio_encoder.adapting.fc1.")
        k = k.replace("audio_encoder.adapting.2.", "audio_encoder.adapting.fc2.")
        if k.startswith("model.") or k.startswith("lm_head."):
            k = "language_model." + k
        # MLX conv layout [O, K, I] (small kernel in the middle) -> torch
        # [O, I, K]; torch checkpoints already match our convs
        if "conv" in k and "weight" in k and v.ndim == 3 \
                and v.shape[1] < v.shape[2]:
            v = np.transpose(v, (0, 2, 1))
        out[k] = v
    return out


class GLMASR:
    def __init__(self, config: GLMASRConfig, params, tokenizer=None,
                 dtype=jnp.float32):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.dtype = dtype
        self.sample_rate = 16000
        self._encode = ajit(functools.partial(audio_encoder_forward,
                                                 cfg=config))
        self._loops: dict = {}

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32) -> "GLMASR":
        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = GLMASRConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        if "language_model" in params:
            params["language_model"] = llama.fuse_projections(
                llama.maybe_stack(params["language_model"]))
        tokenizer = None
        if (model_dir / "tokenizer.json").exists():
            from tokenizers import Tokenizer

            tokenizer = Tokenizer.from_file(str(model_dir / "tokenizer.json"))
        return cls(config, params, tokenizer, dtype)

    @property
    def _lm_params(self):
        return self.params["language_model"]

    def _get_loop(self, max_new: int):
        if max_new in self._loops:
            return self._loops[max_new]
        cfg = self.config.lm
        eos = (jnp.asarray(self.config.eos_token_ids, jnp.int32)
               if self.config.eos_token_ids else jnp.asarray([-1], jnp.int32))

        def loop(params, embeds, cache):
            """prefill on embeds then greedy-decode up to max_new tokens."""
            logits, cache = llama.forward(params, None, cache, cfg,
                                          inputs_embeds=embeds)
            first = jnp.argmax(logits[:, -1].astype(jnp.float32),
                               axis=-1).astype(jnp.int32)
            tokens = jnp.zeros((max_new,), jnp.int32)

            def cond(c):
                _, i, _, _, finished = c
                return jnp.logical_and(~finished, i < max_new)

            def body(c):
                tokens, i, cache, last, finished = c
                tokens = tokens.at[i].set(last[0])
                logits, cache = llama.forward(params, last[:, None], cache,
                                              cfg)
                nxt = jnp.argmax(logits[:, -1].astype(jnp.float32),
                                 axis=-1).astype(jnp.int32)
                finished = jnp.any(nxt[0] == eos)
                return tokens, i + 1, cache, nxt, finished

            finished0 = jnp.any(first[0] == eos)
            tokens, count, *_ = jax.lax.while_loop(
                cond, body, (tokens, jnp.int32(0), cache, first, finished0))
            return tokens, count

        fn = ajit(loop, donate_argnums=(2,))
        self._loops[max_new] = fn
        return fn

    def generate(self, audio, generation_parameters:
                 STTGenerateParameters | None = None,
                 sample_rate: int | None = None) -> STTOutput:
        if self.tokenizer is None:
            raise ValueError("tokenizer not loaded")
        gp = generation_parameters or STTGenerateParameters(max_tokens=128)
        max_new = gp.max_tokens or 128
        t0 = time.perf_counter()
        wf = np.asarray(audio, np.float32).reshape(-1)
        src = sample_rate or 16000
        if src != 16000:
            wf = resample_audio(wf, src, 16000)
        mel = np.asarray(_glm_log_mel(
            wf, self.config.whisper.num_mel_bins))[None]
        if mel.shape[1] < self.config.merge_factor * 2:
            return STTOutput(text="")
        audio_embeds = self._encode(self.params,
                                    jnp.asarray(mel, self.dtype))
        audio_len = audio_embeds.shape[1]
        prefix = self.tokenizer.encode(USER_PREFIX).ids
        suffix = self.tokenizer.encode(USER_SUFFIX).ids
        tokens = prefix + [0] * audio_len + suffix
        embeds = nn.embedding(self._lm_params["model"]["embed_tokens"],
                              jnp.asarray([tokens], jnp.int32))
        embeds = jax.lax.dynamic_update_slice(
            embeds, audio_embeds.astype(embeds.dtype),
            (0, len(prefix), 0))
        cache = llama.make_cache(
            self.config.lm, 1, len(tokens) + max_new + 1, self.dtype,
            kv_bits=gp.kv_bits, kv_group_size=gp.kv_group_size,
            quantized_kv_start=(max(gp.quantized_kv_start, len(tokens))
                                if gp.quantized_kv_start else 0))
        loop = self._get_loop(max_new)
        out_tokens, count = loop(self._lm_params, embeds, cache)
        ids = np.asarray(out_tokens)[: int(count)].tolist()
        text = self.tokenizer.decode(ids).strip()
        elapsed = time.perf_counter() - t0
        return STTOutput(
            text=text, language=gp.language,
            segments=[STTSegment(text=text, start=0.0,
                                 end=len(wf) / 16000, tokens=ids)],
            prompt_token_count=len(tokens),
            generation_token_count=len(ids),
            generation_time=elapsed, total_time=elapsed)

    def generate_stream(self, audio, generation_parameters=None, **kw):
        out = self.generate(audio, generation_parameters, **kw)
        if out.text:
            yield {"type": "token", "text": out.text}
        yield {"type": "result", "output": out}
