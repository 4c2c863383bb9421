"""OmniVoice: massively multilingual (600+ languages) zero-shot TTS via a
bidirectional diffusion LM on a Qwen3 backbone.

TPU-first rebuild of the reference
(Sources/MLXAudioTTS/Models/OmniVoice/OmniVoice.swift): per-codebook
audio embeddings are summed with text embeddings into a Qwen3 trunk run
with FULL bidirectional attention (NAR diffusion — no causal mask,
OmniVoice.swift:134-145); per-codebook heads give [B, S, C, V] logits;
generation iteratively unmasks the target region with classifier-free
guidance, layer (codebook) penalties and Gumbel position sampling
(OmniVoice.swift:286-497).

TPU mapping: the reference drives the mask-predict loop from the host
with data-dependent top-k scatter per step. Here the WHOLE loop is one
jitted ``lax.fori_loop``: the per-step unmask counts come from the
precomputed t-schedule, and "reveal top-k positions" becomes a
rank-threshold select (rank = inverse argsort of the scores; a position
flips when ``rank < k_step``), so every step has identical static
shapes. Prompt/target lengths are bucketed and excluded via an explicit
bidirectional attention mask instead of recompiling per utterance.

Style prompt format, rule-based duration estimation (per-script phonetic
weights), CFG log-prob combination and output post-processing follow
OmniVoice.swift:499-846.
"""

from __future__ import annotations

import time
import unicodedata
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import hub, loading, nn
from tpu_audio.core.generation import (
    AudioGenerateParameters,
    AudioGeneration,
    AudioGenerationError,
    AudioGenerationInfo,
)
from tpu_audio.models import llama
from tpu_audio.core.jitting import ajit

__all__ = ["OmniVoice", "OmniVoiceConfig", "estimate_rule_duration_tokens",
           "phonetic_weight", "get_time_steps"]

_LEN_BUCKET = 32


@dataclass
class OmniVoiceConfig:
    """OmniVoiceConfig.swift:173-240."""

    llm_config: llama.LlamaConfig = field(
        default_factory=lambda: llama.LlamaConfig(
            hidden_size=1024, num_hidden_layers=28, intermediate_size=3072,
            num_attention_heads=16, num_key_value_heads=8, head_dim=128,
            rms_norm_eps=1e-6, vocab_size=151676, rope_theta=1e6,
            tie_word_embeddings=True, qk_norm=True))
    audio_codebook_weights: tuple = (8, 8, 8, 6, 6, 4, 4, 2, 2)
    audio_mask_id: int = 1024
    audio_vocab_size: int = 1025
    eos_token_id: int = 151645
    pad_token_id: int = 151643
    num_audio_codebook: int = 9
    sample_rate: int = 24000

    @classmethod
    def from_dict(cls, d: dict) -> "OmniVoiceConfig":
        lc = dict(d.get("llm_config", {}))
        lc.setdefault("rope_theta", 1e6)
        lc.setdefault("tie_word_embeddings", True)
        lang = llama.LlamaConfig.from_dict(lc)
        lang.qk_norm = True
        keys = set(cls.__dataclass_fields__) - {"llm_config"}
        kw = {k: v for k, v in d.items() if k in keys}
        if "audio_codebook_weights" in kw:
            kw["audio_codebook_weights"] = tuple(kw["audio_codebook_weights"])
        return cls(llm_config=lang, **kw)


@dataclass
class OmniVoiceGenerateParameters:
    """Diffusion knobs (OmniVoiceGenerateParameters.swift:8-127)."""

    num_step: int = 32
    guidance_scale: float = 2.0
    speed: float = 1.0
    duration: float | None = None
    t_shift: float = 0.1
    denoise: bool = True
    postprocess_output: bool = True
    layer_penalty_factor: float = 5.0
    position_temperature: float = 5.0
    class_temperature: float = 0.0
    seed: int | None = None


# -- duration estimation (OmniVoice.swift:580-705) ----------------------------------

_SCRIPT_RANGES = [
    (0x02AF, 1.0), (0x03FF, 1.0), (0x052F, 1.0), (0x058F, 1.0),
    (0x05FF, 1.5), (0x08FF, 1.5), (0x0DFF, 1.8), (0x0EFF, 1.5),
    (0x0FFF, 1.8), (0x109F, 1.8), (0x10FF, 1.0), (0x11FF, 2.5),
    (0x139F, 3.0), (0x17FF, 1.8), (0x1C7F, 1.8), (0x1C8F, 1.0),
    (0x1CBF, 1.0), (0x1CFF, 1.8), (0x1EFF, 1.0), (0x309F, 2.2),
    (0x30FF, 2.2), (0x312F, 3.0), (0x318F, 2.5), (0x9FFF, 3.0),
    (0xA4CF, 3.0), (0xA69F, 1.0), (0xA7FF, 1.0), (0xA8FF, 1.8),
    (0xA97F, 2.5), (0xAADF, 1.8), (0xAB2F, 3.0), (0xAB6F, 1.0),
    (0xABFF, 1.8), (0xD7AF, 2.5), (0xFAFF, 3.0), (0xFEFF, 1.5),
    (0xFFEF, 1.0),
]


def phonetic_weight(ch: str) -> float:
    code = ord(ch)
    if 65 <= code <= 90 or 97 <= code <= 122:
        return 1.0
    if code == 32:
        return 0.2
    if code == 0x0640:  # Arabic tatweel
        return 0.0
    cat = unicodedata.category(ch)
    if cat in ("Mn", "Mc", "Me"):
        return 0.0
    if cat in ("Pc", "Pd", "Ps", "Pe", "Pi", "Pf", "Po",
               "Sm", "Sc", "Sk", "So"):
        return 0.5
    if cat in ("Zs", "Zl", "Zp"):
        return 0.2
    if cat in ("Nd", "Nl", "No"):
        return 3.5
    for upper, weight in _SCRIPT_RANGES:
        if code <= upper:
            return weight
    return 3.0 if code > 0x20000 else 1.0


def _text_weight(text: str) -> float:
    return sum(phonetic_weight(c) for c in text)


def estimate_rule_duration_tokens(target_text: str,
                                  ref_text: str = "Nice to meet you.",
                                  ref_duration: float = 25.0,
                                  low_threshold: float = 50.0,
                                  boost_strength: float = 3.0) -> float:
    """RuleDurationEstimator parity (OmniVoice.swift:607-625)."""
    if ref_duration <= 0 or not ref_text:
        return 0.0
    ref_weight = _text_weight(ref_text)
    if ref_weight <= 0:
        return 0.0
    estimated = _text_weight(target_text) / (ref_weight / ref_duration)
    if estimated < low_threshold:
        return low_threshold * (estimated / low_threshold) ** (
            1.0 / boost_strength)
    return estimated


def get_time_steps(t_start: float, t_end: float, num_step: int,
                   t_shift: float) -> np.ndarray:
    """Shifted diffusion schedule (OmniVoice.swift:570-578)."""
    t = t_start + (t_end - t_start) * np.arange(num_step + 1) / num_step
    return (t_shift * t / (1.0 + (t_shift - 1.0) * t)).astype(np.float32)


def sanitize(weights, num_codebooks: int):
    """OmniVoiceModel.sanitize (OmniVoice.swift:1040-1085): split fused
    per-codebook tables, drop offsets, route backbone keys under llm."""
    out = {}
    for k, v in weights.items():
        if k.endswith("codebook_layer_offsets"):
            continue
        if k in ("audio_embeddings.weight", "audio_heads.weight"):
            prefix = k.rsplit(".", 1)[0]
            vocab = v.shape[0] // num_codebooks
            for i in range(num_codebooks):
                out[f"{prefix}.{i}.weight"] = v[i * vocab:(i + 1) * vocab]
        elif k.startswith(("audio_embeddings.", "audio_heads.")):
            out[k] = v
        elif k == "lm_head.weight":
            out["llm.lm_head.weight"] = v
        elif k.startswith("model."):
            out[f"llm.{k}"] = v
        elif k.startswith("backbone."):
            out[f"llm.model.{k[len('backbone.'):]}"] = v
        elif k.startswith("llm."):
            out[f"llm.model.{k[4:]}"] = v
        else:
            out[f"llm.model.{k}"] = v
    return out


class OmniVoice:
    """Voice design / voice cloning / auto-voice diffusion TTS."""

    def __init__(self, config: OmniVoiceConfig, params, tokenizer=None,
                 audio_tokenizer=None, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.audio_tokenizer = audio_tokenizer
        self.dtype = dtype
        self.sample_rate = config.sample_rate
        self._loops: dict = {}

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32
                        ) -> "OmniVoice":
        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        cfg_dict = hub.load_config(model_dir)
        config = OmniVoiceConfig.from_dict(cfg_dict)
        params = loading.load_params(
            model_dir,
            sanitize=lambda w: sanitize(w, config.num_audio_codebook),
            dtype=dtype)
        if "llm" in params:
            params["llm"] = llama.maybe_stack(params["llm"])
        # infer codebook count from split checkpoint keys
        # (OmniVoice.swift:1022-1037)
        embs = params.get("audio_embeddings", {})
        if embs:
            config.num_audio_codebook = max(int(i) for i in embs) + 1
        tokenizer = None
        if (model_dir / "tokenizer.json").exists():
            from tokenizers import Tokenizer

            tokenizer = Tokenizer.from_file(str(model_dir / "tokenizer.json"))
        audio_tok = None
        if (model_dir / "audio_tokenizer" / "config.json").exists():
            from tpu_audio.codecs.higgs_audio import HiggsAudioTokenizer

            audio_tok = HiggsAudioTokenizer.from_pretrained(
                str(model_dir / "audio_tokenizer"), dtype=dtype)
        return cls(config, params, tokenizer, audio_tok, dtype)

    def default_generation_parameters(self) -> AudioGenerateParameters:
        return AudioGenerateParameters(max_tokens=4096, temperature=1.0,
                                       top_p=0.95, repetition_penalty=1.05)

    # -- forward ----------------------------------------------------------------------

    def _embed_inputs(self, params, input_ids, audio_mask):
        """[B, C, S] ids -> [B, S, D]: text embedding where mask is false,
        summed per-codebook audio embeddings elsewhere
        (OmniVoice.swift:86-116)."""
        cfg = self.config
        lm = params["llm"]["model"]
        text = nn.embedding(lm["embed_tokens"], input_ids[:, 0])
        masked = input_ids * audio_mask[:, None, :].astype(input_ids.dtype)
        tables = jnp.stack(
            [params["audio_embeddings"][str(i)]["weight"]
             for i in range(cfg.num_audio_codebook)])
        audio = jax.vmap(lambda tbl, ids: tbl[ids],
                         in_axes=(0, 1))(tables, masked).sum(axis=0)
        return jnp.where(audio_mask[..., None], audio.astype(text.dtype),
                         text)

    def _forward(self, params, input_ids, audio_mask, valid):
        """-> audio logits [B, S, C, V]; ``valid [S]`` excludes padded
        positions from the bidirectional attention."""
        cfg = self.config
        emb = self._embed_inputs(params, input_ids, audio_mask)
        hidden, _ = llama.forward(
            params["llm"], None, None, cfg.llm_config, inputs_embeds=emb,
            return_hidden=True, causal=False,
            attn_mask=valid[None, None, None, :])
        heads = jnp.stack(
            [params["audio_heads"][str(i)]["weight"]
             for i in range(cfg.num_audio_codebook)])  # [C, V, D]
        return jnp.einsum("bsd,cvd->bscv", hidden.astype(jnp.float32),
                          heads.astype(jnp.float32))

    # -- diffusion loop ---------------------------------------------------------------

    def _get_loop(self, key):
        if key in self._loops:
            return self._loops[key]
        (prefix_b, target_b, num_steps, guidance, layer_penalty, pos_temp,
         class_temp) = key
        cfg = self.config
        n_cb = cfg.num_audio_codebook
        v = cfg.audio_vocab_size
        mask_id = cfg.audio_mask_id
        total_len = prefix_b + target_b
        layer_ids = jnp.arange(n_cb, dtype=jnp.float32)[:, None]

        def predict(c_logits, u_logits, rng):
            """CFG log-prob combine + mask-id suppression + optional
            top-10% gumbel class sampling (OmniVoice.swift:501-568).
            [C, T, V] -> (tokens, scores, rng)."""
            if guidance != 0.0:
                c_lp = jax.nn.log_softmax(c_logits, axis=-1)
                u_lp = jax.nn.log_softmax(u_logits, axis=-1)
                lp = jax.nn.log_softmax(c_lp + guidance * (c_lp - u_lp),
                                        axis=-1)
            else:
                lp = jax.nn.log_softmax(c_logits, axis=-1)
            lp = lp.at[..., mask_id].set(-jnp.inf)
            if class_temp > 0.0:
                k10 = max(1, int(np.ceil(0.1 * v)))
                kth = jax.lax.top_k(lp, k10)[0][..., -1:]
                filt = jnp.where(lp < kth, -jnp.inf, lp)
                rng, sub = jax.random.split(rng)
                g = jax.random.uniform(sub, filt.shape, minval=1e-10,
                                       maxval=1.0)
                gumbel = -jnp.log(-jnp.log(g + 1e-10) + 1e-10)
                pred = jnp.argmax(filt / class_temp + gumbel, axis=-1)
            else:
                pred = jnp.argmax(lp, axis=-1)
            return pred.astype(jnp.int32), lp.max(-1), rng

        def loop(params, ids0, audio_mask, u_audio_mask, valid, u_valid,
                 target_valid, k_sched, rng):
            # ids0 [1, C, total]; target occupies [prefix_b, total)
            def step(i, carry):
                ids, tokens, rng = carry
                u_ids = tokens  # uncond input = target region only
                c_logits = self._forward(params, ids, audio_mask, valid)
                u_logits = self._forward(params, u_ids, u_audio_mask,
                                         u_valid)
                c = c_logits[0, prefix_b:].transpose(1, 0, 2)  # [C, T, V]
                u = u_logits[0].transpose(1, 0, 2)
                pred, scores, rng = predict(c, u, rng)
                scores = scores - layer_ids * layer_penalty
                if pos_temp > 0.0:
                    rng, sub = jax.random.split(rng)
                    g = jax.random.uniform(sub, scores.shape,
                                           minval=1e-10, maxval=1.0)
                    scores = scores / pos_temp - jnp.log(
                        -jnp.log(g + 1e-10) + 1e-10)
                cur = tokens[0]  # [C, T]
                can_fill = (cur == mask_id) & target_valid[None, :]
                scores = jnp.where(can_fill, scores, -jnp.inf)
                flat = scores.reshape(-1)
                order = jnp.argsort(-flat)
                rank = jnp.zeros_like(order).at[order].set(
                    jnp.arange(flat.shape[0]))
                newly = (rank.reshape(n_cb, target_b) < k_sched[i]) \
                    & can_fill
                new_tokens = jnp.where(newly, pred, cur)[None]
                ids = jax.lax.dynamic_update_slice(ids, new_tokens,
                                                   (0, 0, prefix_b))
                return ids, new_tokens, rng

            ids, tokens, _ = jax.lax.fori_loop(
                0, num_steps, step,
                (ids0, ids0[:, :, prefix_b:], rng))
            # any stragglers decode as code 0 (OmniVoice.swift:485-491)
            return jnp.where(tokens == mask_id, 0, tokens)

        fn = ajit(loop)
        self._loops[key] = fn
        return fn

    # -- prompting (OmniVoice.swift:707-800) --------------------------------------------

    def _tokenize(self, text: str) -> list[int]:
        if self.tokenizer is None:
            raise AudioGenerationError("OmniVoice tokenizer is not loaded")
        return self.tokenizer.encode(text, add_special_tokens=False).ids

    @staticmethod
    def combine_text(ref_text: str | None, text: str) -> str:
        full = ""
        if ref_text:
            full = ref_text.strip() + " "
        full += text.strip()
        return " ".join(full.split())

    def build_prompt(self, text: str, ref_text=None, language=None,
                     instruct=None, denoise=True, has_ref=False
                     ) -> list[int]:
        style = ""
        if denoise and has_ref:
            style += "<|denoise|>"
        style += f"<|lang_start|>{language or 'None'}<|lang_end|>"
        style += f"<|instruct_start|>{instruct or 'None'}<|instruct_end|>"
        wrapped = (style
                   + f"<|text_start|>{self.combine_text(ref_text, text)}"
                   + "<|text_end|>")
        return self._tokenize(wrapped)

    def estimate_target_tokens(self, text: str, speed: float = 1.0,
                               duration: float | None = None) -> int:
        hop = (self.audio_tokenizer.acoustic_hop
               if self.audio_tokenizer is not None else 960)
        tokens_per_second = self.config.sample_rate / hop
        if duration is not None:
            return max(1, int(np.ceil(duration * tokens_per_second)))
        raw = estimate_rule_duration_tokens(text)
        base = max(10, int(raw * 1.15))
        if speed > 0 and speed != 1.0:
            base = int(base / speed)
        return max(1, base)

    # -- generation -------------------------------------------------------------------

    def generate_codes(self, text: str, ref_text=None, ref_audio_tokens=None,
                       language=None, instruct=None,
                       params: OmniVoiceGenerateParameters | None = None
                       ) -> np.ndarray:
        """text (+ optional clone reference) -> audio codes [C, T]
        (OmniVoice.swift:286-497)."""
        gp = params or OmniVoiceGenerateParameters()
        cfg = self.config
        n_cb = cfg.num_audio_codebook

        n_ref = 0 if ref_audio_tokens is None else ref_audio_tokens.shape[1]
        target_len = self.estimate_target_tokens(text, gp.speed, gp.duration)
        prompt = self.build_prompt(text, ref_text, language, instruct,
                                   gp.denoise, ref_audio_tokens is not None)

        prefix_len = len(prompt) + n_ref
        prefix_b = -(-prefix_len // _LEN_BUCKET) * _LEN_BUCKET
        target_b = -(-target_len // _LEN_BUCKET) * _LEN_BUCKET
        total = prefix_b + target_b

        ids = np.full((1, n_cb, total), cfg.pad_token_id, np.int32)
        ids[:, :, :len(prompt)] = np.asarray(prompt, np.int32)[None, None]
        if ref_audio_tokens is not None:
            ref = np.asarray(ref_audio_tokens, np.int32)
            if ref.shape[0] < n_cb:
                pad = np.full((n_cb - ref.shape[0], ref.shape[1]),
                              cfg.audio_mask_id, np.int32)
                ref = np.concatenate([ref, pad], axis=0)
            ids[0, :, len(prompt):prefix_len] = ref[:n_cb]
        ids[:, :, prefix_b:] = cfg.audio_mask_id

        audio_mask = np.zeros((1, total), bool)
        audio_mask[0, len(prompt):prefix_len] = True  # ref audio region
        audio_mask[0, prefix_b:] = True  # target region
        valid = np.ones(total, bool)
        valid[prefix_len:prefix_b] = False
        valid[prefix_b + target_len:] = False
        target_valid = np.zeros(target_b, bool)
        target_valid[:target_len] = True
        u_audio_mask = np.ones((1, target_b), bool)
        u_valid = target_valid.copy()

        # unmask schedule (OmniVoice.swift:351-374)
        num_steps = max(1, gp.num_step)
        ts = get_time_steps(0.0, 1.0, num_steps, gp.t_shift)
        total_mask = target_len * n_cb
        rem, sched = total_mask, []
        for s in range(num_steps):
            if s == num_steps - 1:
                k = rem
            else:
                k = min(max(1, int(np.ceil(total_mask * (ts[s + 1] - ts[s])))),
                        rem)
            sched.append(max(k, 0))
            rem -= k

        key = (prefix_b, target_b, num_steps, float(gp.guidance_scale),
               float(gp.layer_penalty_factor), float(gp.position_temperature),
               float(gp.class_temperature))
        loop = self._get_loop(key)
        tokens = loop(self.params, jnp.asarray(ids), jnp.asarray(audio_mask),
                      jnp.asarray(u_audio_mask), jnp.asarray(valid),
                      jnp.asarray(u_valid), jnp.asarray(target_valid),
                      jnp.asarray(sched, jnp.int32),
                      jax.random.PRNGKey(gp.seed or 0))
        return np.asarray(tokens[0])[:, :target_len]

    @staticmethod
    def postprocess(audio: np.ndarray, postprocess_output: bool = True
                    ) -> np.ndarray:
        """Peak normalize to 0.5 + edge fades (OmniVoice.swift:807-832)."""
        out = np.asarray(audio, np.float32)
        peak = np.abs(out).max() if out.size else 0.0
        if peak > 1e-6:
            out = out * (0.5 / peak)
        if postprocess_output and len(out):
            fade = min(480, len(out) // 2)
            if fade > 0:
                out = out.copy()
                ramp = np.arange(fade, dtype=np.float32) / fade
                out[:fade] *= ramp
                out[-fade:] *= ramp[::-1]
        return out

    def generate(self, text: str, voice: str | None = None, ref_audio=None,
                 ref_text=None, language=None,
                 generation_parameters: AudioGenerateParameters | None = None,
                 ov_parameters: OmniVoiceGenerateParameters | None = None
                 ) -> np.ndarray:
        """``voice`` is the voice-design instruction; ref_audio+ref_text
        clones a voice (OmniVoice.swift:164-216)."""
        if self.audio_tokenizer is None:
            raise AudioGenerationError("OmniVoice audio tokenizer missing")
        gp = ov_parameters or OmniVoiceGenerateParameters()
        if generation_parameters is not None \
                and generation_parameters.seed is not None:
            gp.seed = generation_parameters.seed
        ref_tokens = None
        if ref_audio is not None:
            ref_tokens = self.audio_tokenizer.encode(ref_audio)
        codes = self.generate_codes(text, ref_text=ref_text,
                                    ref_audio_tokens=ref_tokens,
                                    language=language, instruct=voice,
                                    params=gp)
        wav = self.audio_tokenizer.decode(codes)
        return self.postprocess(wav, gp.postprocess_output)

    def generate_stream(self, text: str, **kw):
        t0 = time.perf_counter()
        wav = self.generate(text, **kw)
        yield AudioGeneration.from_audio(wav)
        yield AudioGeneration.from_info(AudioGenerationInfo(
            generate_time=time.perf_counter() - t0,
            audio_duration=len(wav) / self.sample_rate))
