"""PocketTTS: continuous-latent flow-matching TTS over a Mimi decoder
(kyutai "pocket" TTS).

TPU-first rebuild of the reference
(Sources/MLXAudioTTS/Models/PocketTTS/*): a causal streaming transformer
("FlowLM") consumes text-token embeddings plus previously generated Mimi
LATENTS (continuous, not discrete codes; NaN slots become a learned BOS
embedding) and conditions a SimpleMLPAdaLN flow network that Euler-
integrates noise into the next latent (PocketTTSFlowLM.swift:7-112).
An `out_eos` head decides stopping; `framesAfterEos` extra frames are
decoded past it. Latents are de-normalized (`emb_std/emb_mean`), passed
through the Mimi "dummy quantizer" output projection, and decoded
step-by-step by the Mimi SEANet/transformer stack (reused from
`tpu_audio.codecs.mimi`; PocketTTSMimiAdapter.swift).

Voice prompts are precomputed conditioning embeddings
(`embeddings/<voice>.safetensors: audio_prompt`) prefilled into the
transformer cache; ref audio is encoded through the Mimi encoder and a
`speaker_proj_weight` matmul (PocketTTSModel.swift:91-183).

The per-frame macro step (transformer step + unrolled Euler flow +
EOS logit) is one jitted call; Mimi decode steps run through the
existing streaming conv-state machinery.
"""

from __future__ import annotations

import functools
import math
import re
import time
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.codecs import mimi as M
from tpu_audio.core import hub, kv_cache, loading, nn
from tpu_audio.core.generation import (
    AudioGenerateParameters,
    AudioGeneration,
    AudioGenerationError,
    AudioGenerationInfo,
)
from tpu_audio.core.jitting import ajit

__all__ = ["PocketTTS", "PocketTTSConfig"]


@dataclass
class PocketFlowLMConfig:
    """PocketTTSConfig.swift:3-52."""

    flow_dim: int = 512
    flow_depth: int = 6
    d_model: int = 768
    num_heads: int = 12
    num_layers: int = 12
    hidden_scale: int = 4
    max_period: float = 10000.0
    lut_dim: int = 768
    lut_n_bins: int = 8000


@dataclass
class PocketTTSConfig:
    flow_lm: PocketFlowLMConfig = field(default_factory=PocketFlowLMConfig)
    mimi: M.MimiConfig = field(default_factory=M.MimiConfig)
    latent_dim: int = 256  # mimi.quantizer.dimension
    quantizer_output_dim: int = 512
    temperature: float = 0.7
    lsd_decode_steps: int = 4
    noise_clamp: float | None = 3.0
    eos_threshold: float = 0.0

    @classmethod
    def from_dict(cls, d: dict) -> "PocketTTSConfig":
        fl = d.get("flow_lm", {})
        tr = fl.get("transformer", {})
        lut = fl.get("lookup_table", {})
        flow = fl.get("flow", {})
        flm = PocketFlowLMConfig(
            flow_dim=flow.get("dim", 512), flow_depth=flow.get("depth", 6),
            d_model=tr.get("d_model", 768),
            num_heads=tr.get("num_heads", 12),
            num_layers=tr.get("num_layers", 12),
            hidden_scale=tr.get("hidden_scale", 4),
            max_period=tr.get("max_period", 10000.0),
            lut_dim=lut.get("dim", 768), lut_n_bins=lut.get("n_bins", 8000))
        md = d.get("mimi", {})
        mt = md.get("transformer", {})
        mimi_cfg = M.MimiConfig(
            sample_rate=md.get("sample_rate", 24000),
            frame_rate=md.get("frame_rate", 12.5),
            seanet=M.SeanetConfig(**{
                k: v for k, v in {
                    "dimension": md.get("seanet", {}).get("dimension", 512),
                    "channels": md.get("seanet", {}).get("channels", 1),
                    "nfilters": md.get("seanet", {}).get("n_filters", 64),
                    "nresidual_layers": md.get("seanet", {}).get(
                        "n_residual_layers", 1),
                    "ratios": tuple(md.get("seanet", {}).get(
                        "ratios", (8, 6, 5, 4))),
                    "ksize": md.get("seanet", {}).get("kernel_size", 7),
                    "residual_ksize": md.get("seanet", {}).get(
                        "residual_kernel_size", 3),
                    "last_ksize": md.get("seanet", {}).get(
                        "last_kernel_size", 3),
                    "dilation_base": md.get("seanet", {}).get(
                        "dilation_base", 2),
                    "compress": md.get("seanet", {}).get("compress", 2),
                }.items()}),
            transformer=M.TransformerConfig(
                d_model=mt.get("d_model", 512),
                num_heads=mt.get("num_heads", 8),
                num_layers=mt.get("num_layers", 8),
                layer_scale=mt.get("layer_scale", 0.01),
                context=mt.get("context", 250),
                max_period=mt.get("max_period", 10000.0),
                dim_feedforward=mt.get("dim_feedforward", 2048)))
        q = md.get("quantizer", {})
        return cls(flow_lm=flm, mimi=mimi_cfg,
                   latent_dim=q.get("dimension", 256),
                   quantizer_output_dim=q.get("output_dimension", 512))


# -- flow net (SimpleMLPAdaLN) -------------------------------------------------------


def _timestep_embed(p, t, hidden: int, freq_size: int = 256):
    """cos|sin frequency embedding -> SiLU MLP -> RMSNorm-over-(n-1)
    (PocketTTSMLP.swift:56-89)."""
    half = freq_size // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                    * (-math.log(10000.0) / half))
    args = t.astype(jnp.float32) * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    h = nn.linear(p["mlp"]["0"], emb)
    h = nn.linear(p["mlp"]["2"], jax.nn.silu(h))
    # PocketRMSNorm: mean-centered, unbiased variance (n-1)
    n = h.shape[-1]
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.sum((h - mean) ** 2, axis=-1, keepdims=True) / max(n - 1, 1)
    return h / jnp.sqrt(var + 1e-5) * p["mlp"]["3"]["alpha"]


def _modulate(x, shift, scale):
    return x * (1.0 + scale) + shift


def flow_net_forward(p, c, s, t, x, cfg: PocketFlowLMConfig):
    """condition [B, D], times s/t [B,1], x [B, ldim] -> velocity [B, ldim]
    (PocketTTSMLP.swift:175-230)."""
    h = nn.linear(p["input_proj"], x)
    tc = (_timestep_embed(p["time_embed"]["0"], s, cfg.flow_dim)
          + _timestep_embed(p["time_embed"]["1"], t, cfg.flow_dim)) / 2.0
    y = tc + nn.linear(p["cond_embed"], c)
    for i in range(cfg.flow_depth):
        bp = p["res_blocks"][str(i)]
        mod = nn.linear(bp["adaLN_modulation"]["1"], jax.nn.silu(y))
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        hh = _modulate(nn.layer_norm(bp["in_ln"], h, eps=1e-6), shift, scale)
        hh = nn.linear(bp["mlp"]["2"],
                       jax.nn.silu(nn.linear(bp["mlp"]["0"], hh)))
        h = h + gate * hh
    fp = p["final_layer"]
    mod = nn.linear(fp["adaLN_modulation"]["1"], jax.nn.silu(y))
    shift, scale = jnp.split(mod, 2, axis=-1)
    hh = _modulate(nn.layer_norm(None, h, eps=1e-6), shift, scale)
    return nn.linear(fp["linear"], hh)


# -- streaming transformer -----------------------------------------------------------


def pocket_transformer(p, x, cfg: PocketFlowLMConfig, cache):
    """Causal pre-LN transformer with fused in_proj and interleaved rope
    (PocketTTSTransformer.swift:90-231)."""
    b, t, d = x.shape
    nh = cfg.num_heads
    hd = d // nh
    offset = cache.offset
    positions = offset + jnp.arange(t)
    cos, sin = nn.rope(positions, hd, cfg.max_period)
    h = x
    for i in range(cfg.num_layers):
        lp = p["layers"][str(i)]
        hn = nn.layer_norm(lp["norm1"], h, eps=1e-5)
        qkv = nn.linear(lp["self_attn"]["in_proj"], hn)
        qkv = qkv.reshape(b, t, 3, nh, hd)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        q = nn.apply_rope(q, cos, sin, interleaved=True)
        k = nn.apply_rope(k, cos, sin, interleaved=True)
        cache, k_full, v_full = kv_cache.update_cache(cache, i, k, v)
        mask = kv_cache.attention_mask(cache, t)
        o = nn.sdpa(q, k_full, v_full, mask=mask)
        h = h + nn.linear(lp["self_attn"]["out_proj"],
                          o.transpose(0, 2, 1, 3).reshape(b, t, d))
        hn = nn.layer_norm(lp["norm2"], h, eps=1e-5)
        h = h + nn.linear(lp["linear2"],
                          nn.gelu(nn.linear(lp["linear1"], hn)))
    cache = cache._replace(offset=cache.offset + t)
    return h, cache


def sanitize(weights):
    """Pocket checkpoints store MLX conv layouts inside the mimi subtree;
    reuse the mimi sanitizer there and pass flow_lm through (the
    reference loads these names verbatim, PocketTTSModel.swift:376)."""
    mimi_w = {k[len("mimi."):]: v for k, v in weights.items()
              if k.startswith("mimi.")}
    rest = {k: v for k, v in weights.items() if not k.startswith("mimi.")}
    out = {f"mimi.{k}": v for k, v in M.sanitize(mimi_w).items()}
    out.update(rest)
    return out


def prepare_text_prompt(text: str) -> tuple[str, int]:
    """PocketTTSTextUtils.swift:4-26."""
    t = " ".join(text.strip().replace("\n", " ").replace("\r", " ").split())
    if not t:
        raise AudioGenerationError("text prompt cannot be empty")
    words = t.split(" ")
    frames_after_eos_guess = 3 if len(words) <= 4 else 1
    if not t[0].isupper():
        t = t[0].upper() + t[1:]
    if t[-1].isalnum():
        t += "."
    if len(t.split(" ")) < 5:
        t = " " * 8 + t
    return t, frames_after_eos_guess


def split_sentences(text: str, max_words: int = 40) -> list[str]:
    """Sentence chunking (word-count based stand-in for the tokenizer
    token-count rule, PocketTTSTextUtils.swift:28-86)."""
    prepared, _ = prepare_text_prompt(text)
    parts = [s.strip() for s in re.findall(r"[^.!?]+[.!?]*", prepared.strip())
             if s.strip()]
    chunks, cur, cur_n = [], "", 0
    for s in parts:
        n = len(s.split())
        if cur and cur_n + n > max_words:
            chunks.append(cur.strip())
            cur, cur_n = s, n
        else:
            cur = s if not cur else cur + " " + s
            cur_n += n
    if cur:
        chunks.append(cur.strip())
    return chunks or [prepared]


class PocketTTS:
    def __init__(self, config: PocketTTSConfig, params, tokenizer=None,
                 model_dir: Path | None = None, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.model_dir = model_dir
        self.dtype = dtype
        self.sample_rate = config.mimi.sample_rate
        self._step = ajit(self._step_impl, donate_argnums=(2,))
        self._prefill = ajit(self._prefill_impl, donate_argnums=(2,))
        self._mimi_state: dict = {}
        self._mimi_cache = None

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32
                        ) -> "PocketTTS":
        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = PocketTTSConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        tokenizer = None
        if (model_dir / "tokenizer.json").exists():
            from tokenizers import Tokenizer

            tokenizer = Tokenizer.from_file(str(model_dir / "tokenizer.json"))
        return cls(config, params, tokenizer, model_dir, dtype)

    # -- flow LM pieces --------------------------------------------------------------

    @property
    def _fl(self):
        return self.params["flow_lm"]

    def _make_cache(self, max_len: int):
        cfg = self.config.flow_lm
        return kv_cache.init_cache(cfg.num_layers, 1, cfg.num_heads,
                                   cfg.d_model // cfg.num_heads, max_len,
                                   self.dtype)

    def _prefill_impl(self, params, embeds, cache):
        _, cache = pocket_transformer(params["transformer"], embeds,
                                      self.config.flow_lm, cache)
        return cache

    def _step_impl(self, params, latent, cache, rng):
        """One frame: transformer step on the latent, EOS logit, Euler
        flow decode of the next latent (FlowLMModel.callAsFunction)."""
        cfg = self.config
        x = nn.linear(params["input_linear"], latent)
        out, cache = pocket_transformer(params["transformer"], x,
                                        cfg.flow_lm, cache)
        out = nn.layer_norm(params["out_norm"], out, eps=1e-5).astype(
            jnp.float32)
        last = out[:, -1]
        eos_logit = nn.linear(params["out_eos"], last)[:, 0]
        rng, sub = jax.random.split(rng)
        noise = jax.random.normal(sub, (1, cfg.latent_dim), jnp.float32) \
            * math.sqrt(cfg.temperature)
        if cfg.noise_clamp is not None:
            noise = jnp.clip(noise, -cfg.noise_clamp, cfg.noise_clamp)
        cur = noise
        n = cfg.lsd_decode_steps
        for i in range(n):
            s = jnp.full((1, 1), i / n, jnp.float32)
            t = jnp.full((1, 1), (i + 1) / n, jnp.float32)
            cur = cur + flow_net_forward(params["flow_net"], last, s, t,
                                         cur, cfg.flow_lm) / n
        return cur, eos_logit, cache

    def _text_embeds(self, text: str):
        ids = self.tokenizer.encode(text).ids
        cfg = self.config.flow_lm
        emb = nn.embedding(self._fl["conditioner"]["embed"],
                           jnp.asarray([ids], jnp.int32))
        if "output_proj" in self._fl["conditioner"]:
            emb = nn.linear(self._fl["conditioner"]["output_proj"], emb)
        return emb.astype(self.dtype)

    # -- mimi adapter ---------------------------------------------------------------

    def _mimi_reset(self):
        self._mimi_state = {}
        tc = self.config.mimi.transformer
        self._mimi_cache = kv_cache.init_cache(
            tc.num_layers, 1, tc.num_heads, tc.head_dim, 2048, self.dtype)

    def _mimi_decode_step(self, latent):
        """de-normalized latent [1, 1, ldim] -> audio samples
        (PocketTTSMimiAdapter.swift:141-157)."""
        p = self.params["mimi"]
        h = nn.conv1d(p["quantizer"]["output_proj"]["conv"]["conv"], latent)
        stride = self.config.mimi.downsample_stride
        st = self._mimi_state.setdefault("upsample", {})
        h, _ = M.s_convtr1d_step(p["upsample"], h, st, 2 * stride, stride,
                                 groups=h.shape[-1])
        if h.shape[1] == 0:
            return np.zeros((0,), np.float32)
        h, self._mimi_cache = M.transformer_forward(
            p["decoder_transformer"], h, self.config.mimi.transformer,
            self._mimi_cache)
        wav = M.seanet_decode(p["decoder"], h, self.config.mimi.seanet,
                              state=self._mimi_state)
        return np.asarray(wav[0, :, 0], np.float32)

    def encode_ref_audio(self, audio):
        """ref waveform -> conditioning [1, T, d_model]
        (PocketTTSModel.swift:91-97)."""
        p = self.params["mimi"]
        x = jnp.asarray(np.asarray(audio, np.float32).reshape(1, -1, 1),
                        self.dtype)
        h = M.seanet_encode(p["encoder"], x, self.config.mimi.seanet)
        h, _ = M.transformer_forward(p["encoder_transformer"], h,
                                     self.config.mimi.transformer)
        stride = self.config.mimi.downsample_stride
        h = M.s_conv1d(p["downsample"], h, 2 * stride, stride=stride,
                       pad_mode="edge")
        return (h.astype(jnp.float32)
                @ self.params["speaker_proj_weight"].T.astype(jnp.float32)
                ).astype(self.dtype)

    def load_voice(self, voice: str):
        path = self.model_dir / "embeddings" / f"{voice}.safetensors"
        if not path.exists():
            raise AudioGenerationError(f"missing audio prompt for {voice!r}")
        from safetensors.numpy import load_file

        return jnp.asarray(load_file(str(path))["audio_prompt"], self.dtype)

    # -- generation -------------------------------------------------------------------

    def default_generation_parameters(self) -> AudioGenerateParameters:
        return AudioGenerateParameters(temperature=self.config.temperature)

    def generate(self, text: str, voice: str | None = None, ref_audio=None,
                 ref_text=None, language=None,
                 generation_parameters: AudioGenerateParameters | None = None,
                 max_frames: int | None = None) -> np.ndarray:
        parts = [ev.audio for ev in self.generate_stream(
            text, voice, ref_audio, ref_text, language, generation_parameters,
            max_frames=max_frames)
            if ev.audio is not None]
        if not parts:
            raise AudioGenerationError("no audio generated")
        return np.concatenate(parts)

    def generate_stream(self, text: str, voice: str | None = None,
                        ref_audio=None, ref_text=None, language=None,
                        generation_parameters:
                        AudioGenerateParameters | None = None,
                        max_frames: int | None = None):
        if self.tokenizer is None:
            raise AudioGenerationError("tokenizer not loaded")
        gp = generation_parameters or self.default_generation_parameters()
        t_start = time.perf_counter()
        if ref_audio is not None:
            conditioning = self.encode_ref_audio(ref_audio)
        else:
            conditioning = self.load_voice(voice or "alba")
        rng = jax.random.PRNGKey(gp.seed if gp.seed is not None else 0)
        total_samples = 0
        total_frames = 0
        for chunk_text in split_sentences(text):
            prepared, guess = prepare_text_prompt(chunk_text)
            frames_after_eos = guess + 2
            words = len(prepared.split())
            computed_max = int((words * 1.0 + 2.0)
                               * self.config.mimi.frame_rate)
            max_gen = min(max_frames, computed_max) if max_frames \
                else computed_max
            text_emb = self._text_embeds(prepared)
            prompt_len = conditioning.shape[1] + text_emb.shape[1]
            cache = self._make_cache(prompt_len + max_gen + 2)
            cache = self._prefill(self._fl, conditioning, cache)
            cache = self._prefill(self._fl, text_emb, cache)
            self._mimi_reset()
            bos = self._fl["bos_emb"].astype(self.dtype).reshape(1, 1, -1)
            emb_std = np.asarray(self._fl["emb_std"], np.float32)
            emb_mean = np.asarray(self._fl["emb_mean"], np.float32)
            latent_in = bos
            eos_step = None
            for step in range(max_gen):
                rng, sub = jax.random.split(rng)
                next_latent, eos_logit, cache = self._step(
                    self._fl, latent_in, cache, sub)
                if eos_step is None and \
                        float(eos_logit[0]) > self.config.eos_threshold:
                    eos_step = step
                if eos_step is not None and step >= eos_step + frames_after_eos:
                    break
                denorm = (np.asarray(next_latent, np.float32)
                          * emb_std + emb_mean)
                wav = self._mimi_decode_step(
                    jnp.asarray(denorm, self.dtype)[:, None, :])
                total_frames += 1
                if len(wav):
                    total_samples += len(wav)
                    yield AudioGeneration.from_audio(wav)
                latent_in = next_latent.astype(self.dtype)[:, None, :]
        yield AudioGeneration.from_info(AudioGenerationInfo(
            generation_token_count=total_frames,
            generate_time=time.perf_counter() - t_start,
            audio_duration=total_samples / self.sample_rate))
