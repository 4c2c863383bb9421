"""MOSS-TTS full variants: Qwen3 backbone with delay-pattern or
local-transformer multi-codebook decoding.

TPU-first rebuild of the reference
(Sources/MLXAudioTTS/Models/MossTTS/MossTTSModel.swift,
MossTTSQwen3.swift, MossTTSProcessor.swift, MossTTSFullSampling.swift):

* **delay** (`moss_tts` / `moss_tts_delay`): a Qwen3 LM consumes rows of
  ``[text_id, audio_ch_0..n_vq-1]`` whose embeddings are summed
  (MossTTSModel.swift:165-182); each step emits one text token plus one
  token per codebook, with codebook c delayed by c frames
  (MossTTSProcessor.swift:76-110). The reference drives the
  text/audio-slot state machine from the host per token
  (MossTTSModel.swift:379-534); here the ENTIRE state machine —
  delayed-length countdown, audio-span tracking, constrained text
  sampling, per-channel masked sampling with repetition sets — runs
  on-device inside one jitted ``lax.while_loop``, and the n_vq codebook
  heads/embeddings are stacked so all channels sample as one batched
  matmul instead of a per-channel host loop.

* **local** (`moss_tts_local`): a "global" Qwen3 over summed channel
  embeddings feeds a small rope-free local transformer that emits the
  text decision then the n_vq codebooks channel-by-channel within each
  frame (MossTTSModel.swift:536-644). The channel loop is statically
  unrolled inside the jitted frame step over a fixed-size local buffer
  (causal masking makes padded future slots inert).

Generated rows are de-delayed, split on all-pad frames and decoded to
waveform by the bundled ``tpu_audio.codecs.moss_tokenizer``
(MossTTSModel.swift:646-701).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import hub, kv_cache, loading, nn
from tpu_audio.core.generation import (
    AudioGenerateParameters,
    AudioGeneration,
    AudioGenerationError,
    AudioGenerationInfo,
)
from tpu_audio.core.sampling import _mask_top_k, _mask_top_p
from tpu_audio.models import llama
from tpu_audio.core.jitting import ajit

__all__ = [
    "MossTTS",
    "MossTTSFullConfig",
    "MossTTSProcessor",
    "apply_delay_pattern",
    "apply_dedelay_pattern",
]

AUDIO_PLACEHOLDER = "<|audio|>"
_DELAY_INACTIVE = np.int32(2 ** 30)  # reference Int.max sentinel
_PROMPT_BUCKET = 64


@dataclass
class MossTTSFullConfig:
    """MossTTSConfig.swift:100-246 (token ids default to the Qwen2 added
    tokens used by OpenMOSS checkpoints)."""

    language_config: llama.LlamaConfig = field(
        default_factory=lambda: llama.LlamaConfig(
            hidden_size=4096, num_hidden_layers=36, intermediate_size=12288,
            num_attention_heads=32, num_key_value_heads=8, head_dim=128,
            rms_norm_eps=1e-6, vocab_size=155648, rope_theta=1e6,
            tie_word_embeddings=False, qk_norm=True,
            max_position_embeddings=40960))
    n_vq: int = 32
    audio_vocab_size: int = 1024
    audio_user_slot_token_id: int = 151654
    audio_assistant_gen_slot_token_id: int = 151656
    audio_assistant_delay_slot_token_id: int = 151662
    audio_start_token_id: int = 151652
    audio_end_token_id: int = 151653
    audio_pad_code: int = 1024
    pad_token_id: int = 151643
    im_start_token_id: int = 151644
    im_end_token_id: int = 151645
    sampling_rate: int = 24000
    audio_tokenizer_pretrained_name_or_path: str | None = None
    # local-transformer variant knobs (all four present => local)
    additional_mlp_ffn_hidden_size: int | None = None
    local_ffn_hidden_size: int | None = None
    local_hidden_size: int | None = None
    local_num_layers: int | None = None

    @property
    def is_local_transformer(self) -> bool:
        return (self.additional_mlp_ffn_hidden_size is not None
                and self.local_ffn_hidden_size is not None
                and self.local_hidden_size is not None
                and self.local_num_layers is not None)

    @property
    def uses_dialogue_scene_prompt(self) -> bool:
        return self.n_vq == 16  # MossTTSConfig.swift:131-133

    @property
    def hidden_size(self) -> int:
        return self.language_config.hidden_size

    @property
    def vocab_size(self) -> int:
        return self.language_config.vocab_size

    @classmethod
    def from_dict(cls, d: dict) -> "MossTTSFullConfig":
        lc = dict(d.get("language_config", {}))
        if "rope_theta" not in lc and isinstance(
                lc.get("rope_parameters"), dict):
            lc["rope_theta"] = lc["rope_parameters"].get("rope_theta", 1e6)
        lc.setdefault("rope_theta", 1e6)
        lc.setdefault("rms_norm_eps", 1e-6)
        lc.setdefault("tie_word_embeddings", False)
        lang = llama.LlamaConfig.from_dict(lc)
        lang.qk_norm = True
        keys = set(cls.__dataclass_fields__) - {"language_config"}
        kw = {k: v for k, v in d.items() if k in keys}
        if "sampling_rate" not in kw and "sample_rate" in d:
            kw["sampling_rate"] = d["sample_rate"]
        return cls(language_config=lang, **kw)

    def local_config(self) -> llama.LlamaConfig:
        """MossTTSConfig.swift:233-245: language config with local dims."""
        lc = llama.LlamaConfig(**{
            k: getattr(self.language_config, k)
            for k in llama.LlamaConfig.__dataclass_fields__})
        lc.hidden_size = self.local_hidden_size
        lc.intermediate_size = self.local_ffn_hidden_size
        lc.num_hidden_layers = self.local_num_layers
        return lc


# -- delay pattern ------------------------------------------------------------------


def apply_delay_pattern(codes: np.ndarray, pad_code: int) -> np.ndarray:
    """[frames, n_vq] -> [frames + n_vq - 1, n_vq]; codebook c shifted
    down by c rows, pad elsewhere (MossTTSProcessor.swift:76-90)."""
    codes = np.asarray(codes, np.int32)
    frames, n_vq = codes.shape
    out = np.full((frames + n_vq - 1, n_vq), pad_code, np.int32)
    for c in range(n_vq):
        out[c:c + frames, c] = codes[:, c]
    return out


def apply_dedelay_pattern(delayed: np.ndarray) -> np.ndarray:
    """Inverse of :func:`apply_delay_pattern`
    (MossTTSProcessor.swift:92-110)."""
    delayed = np.asarray(delayed, np.int32)
    d_frames, n_vq = delayed.shape
    out_len = d_frames - n_vq + 1
    if out_len <= 0:
        return np.zeros((0, n_vq), np.int32)
    out = np.zeros((out_len, n_vq), np.int32)
    for c in range(n_vq):
        out[:, c] = delayed[c:c + out_len, c]
    return out


# -- processor ----------------------------------------------------------------------


class MossTTSProcessor:
    """Chat-templated prompt builder producing ``[T, n_vq+1]`` rows
    (MossTTSProcessor.swift:112-499). ``use_delay_pattern=False`` plus
    ``append_audio_start=True`` is the local variant's processor."""

    def __init__(self, tokenizer, config: MossTTSFullConfig,
                 use_delay_pattern: bool = True,
                 append_audio_start: bool = False):
        self.tokenizer = tokenizer
        self.config = config
        self.use_delay_pattern = use_delay_pattern
        self.append_audio_start = append_audio_start
        c = config
        self._tok = {
            "user_slot": self._token_string(c.audio_user_slot_token_id),
            "gen_slot": self._token_string(
                c.audio_assistant_gen_slot_token_id),
            "delay_slot": self._token_string(
                c.audio_assistant_delay_slot_token_id),
            "audio_start": self._token_string(c.audio_start_token_id),
            "audio_end": self._token_string(c.audio_end_token_id),
        }

    def _token_string(self, token_id: int) -> str:
        s = self.tokenizer.id_to_token(token_id)
        if not s:
            s = self.tokenizer.decode([token_id], skip_special_tokens=False)
        if not s:
            raise AudioGenerationError(
                f"tokenizer cannot resolve MOSS special token id {token_id}")
        return s

    def _encode(self, text: str) -> list[int]:
        return self.tokenizer.encode(text, add_special_tokens=False).ids

    # message construction (MossTTSProcessor.swift:152-207)

    def build_user_message(self, text=None, reference=None, instruction=None,
                           tokens=None, quality=None, sound_event=None,
                           ambient_sound=None, language=None, scene=None
                           ) -> dict:
        audio_codes = []
        if reference is not None:
            parts = []
            for i, item in enumerate(reference):
                if item is not None:
                    parts.append(f"[S{i + 1}]:\n{AUDIO_PLACEHOLDER}")
                    audio_codes.append(item)
                else:
                    parts.append(f"[S{i + 1}]: None")
            ref_text = "\n".join(parts)
        else:
            ref_text = "None"
        fields = [("Reference(s)", ref_text),
                  ("Instruction", instruction or "None"),
                  ("Tokens", str(tokens) if tokens is not None else "None"),
                  ("Quality", quality or "None"),
                  ("Sound Event", sound_event or "None"),
                  ("Ambient Sound", ambient_sound or "None"),
                  ("Language", language or "None")]
        if self.config.uses_dialogue_scene_prompt:
            fields.append(("Scene", scene or "None"))
        fields.append(("Text", text if text is not None else "None"))
        body = "\n".join(f"- {name}:\n{value}" for name, value in fields)
        content = f"<user_inst>\n{body}\n</user_inst>"
        return {"role": "user", "content": content,
                "audio_codes_list": audio_codes}

    def build_assistant_message(self, audio_codes_list,
                                content: str = AUDIO_PLACEHOLDER) -> dict:
        return {"role": "assistant", "content": content,
                "audio_codes_list": list(audio_codes_list)}

    @staticmethod
    def apply_chat_template(role: str, content: str,
                            add_generation_prompt: bool) -> str:
        rendered = f"<|im_start|>{role}\n{content}<|im_end|>\n"
        if add_generation_prompt:
            rendered += "<|im_start|>assistant\n"
        return rendered

    # row assembly (MossTTSProcessor.swift:259-343)

    def _replace_placeholders(self, content: str, lengths: list[int],
                              gen_slot: str, delay_slot: str) -> str:
        cfg = self.config
        if content.count(AUDIO_PLACEHOLDER) != len(lengths):
            raise AudioGenerationError(
                "audio placeholders do not match audio code lengths")
        start, end = self._tok["audio_start"], self._tok["audio_end"]
        for length in lengths:
            if length == 0:
                block = start + end
            elif delay_slot:
                block = (start + gen_slot * length
                         + delay_slot * (cfg.n_vq - 1) + end)
            else:
                block = start + gen_slot * length + end
            content = content.replace(AUDIO_PLACEHOLDER, block, 1)
        return content

    @staticmethod
    def _normalize_codes(codes_list, n_vq: int) -> list[np.ndarray]:
        out = []
        for codes in codes_list:
            codes = np.asarray(codes, np.int32)
            if codes.ndim != 2:
                raise AudioGenerationError(
                    f"expected audio codes [frames, n_vq], got {codes.shape}")
            if codes.shape[1] < n_vq and codes.shape[0] >= n_vq:
                codes = codes.T
            if codes.shape[1] < n_vq:
                raise AudioGenerationError(
                    f"audio_codes channels ({codes.shape[1]}) < n_vq ({n_vq})")
            out.append(codes[:, :n_vq])
        return out

    def _unified_codes(self, role: str, content: str, audio_codes_list,
                       truncation: bool) -> np.ndarray:
        cfg = self.config
        if role == "user":
            gen_slot = delay_slot = self._tok["user_slot"]
            truncation = False
        else:
            gen_slot = self._tok["gen_slot"]
            delay_slot = self._tok["delay_slot"]
        codes_list = self._normalize_codes(audio_codes_list, cfg.n_vq)
        content = self._replace_placeholders(
            content, [c.shape[0] for c in codes_list], gen_slot,
            delay_slot if self.use_delay_pattern else "")
        ids = self._encode(content)
        starts = [i for i, t in enumerate(ids)
                  if t == cfg.audio_start_token_id]
        ends = [i for i, t in enumerate(ids) if t == cfg.audio_end_token_id]
        if len(starts) != len(codes_list) or len(ends) != len(codes_list):
            raise AudioGenerationError(
                "audio placeholders do not match the provided audio codes")
        n_vq = cfg.n_vq
        if not codes_list:
            audio_rows = np.full((len(ids), n_vq), cfg.audio_pad_code,
                                 np.int32)
        else:
            sections = []
            prefix = 0
            for start_idx, end_idx, codes in zip(starts, ends, codes_list):
                eff = (apply_delay_pattern(codes, cfg.audio_pad_code)
                       if self.use_delay_pattern else codes)
                pad_rows = max(start_idx - prefix + 1, 0)
                sections.append(np.full((pad_rows, n_vq), cfg.audio_pad_code,
                                        np.int32))
                sections.append(eff)
                prefix = end_idx
            if truncation and self.use_delay_pattern and n_vq > 1:
                # continuation: drop the delay tail so generation resumes
                # mid-pattern (MossTTSProcessor.swift:325-327)
                keep = max(sections[-1].shape[0] - (n_vq - 1), 0)
                sections[-1] = sections[-1][:keep]
            elif not truncation:
                sections.append(np.full((max(len(ids) - ends[-1], 0), n_vq),
                                        cfg.audio_pad_code, np.int32))
            audio_rows = np.concatenate(sections, axis=0)
        out_len = min(len(ids), audio_rows.shape[0])
        text_col = np.asarray(ids[:out_len], np.int32)[:, None]
        return np.concatenate([text_col, audio_rows[:out_len]], axis=1)

    def __call__(self, conversation: list[dict], mode: str = "generation"
                 ) -> np.ndarray:
        """conversation -> rows [T, n_vq+1] (batch 1;
        MossTTSProcessor.swift:401-454)."""
        if mode not in ("generation", "continuation"):
            raise AudioGenerationError("mode must be generation|continuation")
        truncation = mode == "continuation"
        unified = []
        for i, message in enumerate(conversation):
            add_gen = mode == "generation" and i == len(conversation) - 1
            content = self.apply_chat_template(
                message["role"], message["content"], add_gen)
            unified.append(self._unified_codes(
                message["role"], content,
                message.get("audio_codes_list", []), truncation))
        rows = np.concatenate(unified, axis=0)
        if self.append_audio_start and mode == "generation":
            extra = np.full((1, self.config.n_vq + 1),
                            self.config.audio_pad_code, np.int32)
            extra[0, 0] = self.config.audio_start_token_id
            rows = np.concatenate([rows, extra], axis=0)
        return rows


# -- weights ------------------------------------------------------------------------


def sanitize_delay(weights):
    """Strip the ``model.`` prefix (delay variant only;
    MossTTSModel.swift:151-163)."""
    return {(k[len("model."):] if k.startswith("model.") else k): v
            for k, v in weights.items()}


def _local_transformer_forward(params, x, cfg: llama.LlamaConfig):
    """Rope-free Qwen3-style blocks over ``x [B, C, D]`` with causal
    masking (MossTTSQwen3.swift:181-269). Padded future slots beyond the
    channel being read are inert under the causal mask."""
    b, t, _ = x.shape
    nh, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.resolved_head_dim)
    for i in range(cfg.num_hidden_layers):
        lp = params["layers"][str(i)]
        h = nn.rms_norm(lp["input_layernorm"], x, cfg.rms_norm_eps)
        ap = lp["self_attn"]
        q = nn.linear(ap["q_proj"], h).reshape(b, t, nh, hd)
        k = nn.linear(ap["k_proj"], h).reshape(b, t, nkv, hd)
        v = nn.linear(ap["v_proj"], h).reshape(b, t, nkv, hd)
        q = nn.rms_norm(ap["q_norm"], q, cfg.rms_norm_eps)
        k = nn.rms_norm(ap["k_norm"], k, cfg.rms_norm_eps)
        o = nn.sdpa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                    v.transpose(0, 2, 1, 3), is_causal=True)
        x = x + nn.linear(ap["o_proj"],
                          o.transpose(0, 2, 1, 3).reshape(b, t, nh * hd))
        h = nn.rms_norm(lp["post_attention_layernorm"], x, cfg.rms_norm_eps)
        mp = lp["mlp"]
        x = x + nn.linear(mp["down_proj"],
                          nn.silu(nn.linear(mp["gate_proj"], h))
                          * nn.linear(mp["up_proj"], h))
    return nn.rms_norm(params["norm"], x, cfg.rms_norm_eps)


def _mlp(params, x):
    """MossTTSMLP (SwiGLU; MossTTSQwen3.swift:165-179)."""
    return nn.linear(params["down_proj"],
                     nn.silu(nn.linear(params["gate_proj"], x))
                     * nn.linear(params["up_proj"], x))


def _penalize(logits, seen, penalty: float):
    """Divide positive / multiply negative logits at previously generated
    ids (MossTTSFullSampling.swift:4-50)."""
    if penalty == 1.0:
        return logits
    return jnp.where(seen,
                     jnp.where(logits > 0, logits / penalty,
                               logits * penalty), logits)


def _sample(rng, logits, temperature: float, top_p: float, top_k: int):
    """mossTTSSampleToken (MossTTSFullSampling.swift:52-77) on ``[..., V]``;
    temperature <= 0 means greedy."""
    if temperature <= 0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / temperature
    if top_k:
        scaled = _mask_top_k(scaled, min(top_k, logits.shape[-1]))
    if top_p is not None and top_p < 1.0:
        scaled = _mask_top_p(scaled, top_p)
    return jax.random.categorical(rng, scaled, axis=-1).astype(jnp.int32)


class MossTTS:
    """MOSS-TTS / MOSS-TTSD (delay) and local-transformer variants."""

    def __init__(self, config: MossTTSFullConfig, params, tokenizer=None,
                 audio_tokenizer=None, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.audio_tokenizer = audio_tokenizer
        self.dtype = dtype
        self.sample_rate = config.sampling_rate
        self.generation_config: dict = {}
        self._loops: dict = {}

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32
                        ) -> "MossTTS":
        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = MossTTSFullConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(
            model_dir,
            sanitize=None if config.is_local_transformer else sanitize_delay,
            dtype=dtype)
        lm_key = ("model", "language_model") if config.is_local_transformer \
            else ("language_model",)
        sub = params
        for k in lm_key[:-1]:
            sub = sub.get(k, {})
        if lm_key[-1] in sub:
            sub[lm_key[-1]] = llama.maybe_stack(sub[lm_key[-1]])
        tokenizer = None
        if (model_dir / "tokenizer.json").exists():
            from tokenizers import Tokenizer

            tokenizer = Tokenizer.from_file(str(model_dir / "tokenizer.json"))
        audio_tok = None
        if (model_dir / "audio_tokenizer" / "config.json").exists():
            from tpu_audio.codecs.moss_tokenizer import MossAudioTokenizer

            audio_tok = MossAudioTokenizer.from_pretrained(
                str(model_dir / "audio_tokenizer"), dtype=dtype)
        model = cls(config, params, tokenizer, audio_tok, dtype)
        gen_cfg = model_dir / "generation_config.json"
        if gen_cfg.exists():
            import json

            model.generation_config = json.loads(gen_cfg.read_text())
        return model

    # -- shared embedding -----------------------------------------------------------

    def _stacked_audio_tables(self, params):
        cfg = self.config
        if cfg.is_local_transformer:
            emb = params["model"]["embedding_list"]
            tables = [emb[str(c + 1)]["weight"] for c in range(cfg.n_vq)]
        else:
            tables = [params["emb_ext"][str(c)]["weight"]
                      for c in range(cfg.n_vq)]
        return jnp.stack(tables)  # [n_vq, A+1, D]

    def _embed_rows(self, params, rows, audio_tables, n_active=None):
        """rows [B, T, n_vq+1] -> summed channel embeddings
        (MossTTSModel.swift:29-47,165-182)."""
        cfg = self.config
        if cfg.is_local_transformer:
            text_table = params["model"]["embedding_list"]["0"]
        else:
            text_table = params["language_model"]["embed_tokens"]
        e = nn.embedding(text_table, rows[..., 0])
        n = cfg.n_vq if n_active is None else n_active
        ids = rows[..., 1:1 + n].transpose(2, 0, 1)  # [n, B, T]
        ae = jax.vmap(lambda tbl, i: tbl[i])(audio_tables[:n], ids)
        return e + ae.sum(axis=0).astype(e.dtype)

    def _lm_params(self, params):
        return (params["model"]["language_model"]
                if self.config.is_local_transformer
                else params["language_model"])

    # -- delay-pattern generation ---------------------------------------------------

    def _get_delay_loop(self, key):
        if key in self._loops:
            return self._loops[key]
        (p_bucket, max_new, text_temp, text_top_p, text_top_k, audio_temp,
         audio_top_p, audio_top_k, audio_rep) = key
        cfg = self.config
        lcfg = cfg.language_config
        n_vq, width = cfg.n_vq, cfg.n_vq + 1
        a_size = cfg.audio_vocab_size + 1
        total = p_bucket + max_new
        gen_id = cfg.audio_assistant_gen_slot_token_id
        delay_id = cfg.audio_assistant_delay_slot_token_id
        start_id, end_id = cfg.audio_start_token_id, cfg.audio_end_token_id
        exclude_outside = jnp.asarray(
            [cfg.pad_token_id, gen_id, delay_id, end_id], jnp.int32)
        keep_inside = jnp.asarray([gen_id, delay_id], jnp.int32)
        c_idx = jnp.arange(n_vq)

        def loop(params, rows, pad, seen0, audio_len0, is_audio0, rng):
            audio_tables = self._stacked_audio_tables(params)
            audio_heads = jnp.stack(
                [params["lm_heads"][str(c + 1)]["weight"]
                 for c in range(n_vq)])  # [n_vq, A+1, D]
            text_head = params["lm_heads"]["0"]["weight"]
            lm = self._lm_params(params)
            cache = kv_cache.init_cache(
                lcfg.num_hidden_layers, 1, lcfg.num_key_value_heads,
                lcfg.resolved_head_dim, total, self.dtype)
            cache = cache._replace(valid_from=pad)
            emb = self._embed_rows(params, rows[:, :p_bucket - 1],
                                   audio_tables)
            _, cache = llama.forward(lm, None, cache, lcfg,
                                     inputs_embeds=emb, return_hidden=True)
            out = jnp.zeros((1, total, width), jnp.int32)
            out = jax.lax.dynamic_update_slice(out, rows, (0, 0, 0))

            def cond(carry):
                step, stopped = carry[0], carry[1]
                return (~stopped) & (step < max_new)

            def body(carry):
                (step, stopped, cur, cache, out, seen, audio_len, delayed,
                 is_audio, rng) = carry
                emb = self._embed_rows(params, cur, audio_tables)
                hidden, cache = llama.forward(
                    lm, None, cache, lcfg, inputs_embeds=emb,
                    return_hidden=True)
                h = hidden[0, -1].astype(jnp.float32)
                # MossTTSModel.swift:439-443: temperature on raw logits
                text_logits = h @ text_head.T.astype(jnp.float32)
                if text_temp > 0:
                    text_logits = text_logits / text_temp
                audio_logits = jnp.einsum(
                    "d,nad->na", h, audio_heads.astype(jnp.float32))
                if audio_temp > 0:
                    audio_logits = audio_logits / audio_temp

                # -- text token (MossTTSModel.swift:445-479)
                forced_delay = delayed < n_vq
                forced_end = delayed == n_vq
                inside = jnp.full_like(text_logits, -jnp.inf)
                inside = inside.at[keep_inside].set(
                    text_logits[keep_inside])
                outside = text_logits.at[exclude_outside].set(-jnp.inf)
                tl = jnp.where(is_audio, inside, outside)
                tl = tl.at[delay_id].set(
                    jnp.where(step == 0, -jnp.inf, tl[delay_id]))
                tl = tl.at[cfg.im_end_token_id].set(
                    jnp.where(step <= n_vq, -jnp.inf,
                              tl[cfg.im_end_token_id]))
                rng, sub = jax.random.split(rng)
                sampled_text = _sample(sub, tl, 1.0 if text_temp > 0 else 0.0,
                                       text_top_p, text_top_k)
                text_tok = jnp.where(
                    forced_delay, delay_id,
                    jnp.where(forced_end, end_id, sampled_text)
                ).astype(jnp.int32)
                is_audio = ((is_audio & ~forced_end)
                            | (text_tok == start_id))
                stopped = stopped | (text_tok == cfg.im_end_token_id)

                # -- audio channels, batched over n_vq
                # (MossTTSModel.swift:481-499)
                pre = audio_len > c_idx
                post = (delayed == _DELAY_INACTIVE) | (c_idx >= delayed)
                samp_mask = pre & post
                al = audio_logits.at[:, cfg.audio_pad_code].set(-jnp.inf)
                al = al.at[:, a_size - 1].set(-jnp.inf)  # headLogits pad col
                al = _penalize(al, seen, audio_rep)
                rng, sub = jax.random.split(rng)
                sampled = _sample(sub, al, 1.0 if audio_temp > 0 else 0.0,
                                  audio_top_p, audio_top_k)
                frame = jnp.where(samp_mask, sampled,
                                  cfg.audio_pad_code).astype(jnp.int32)
                seen = seen.at[c_idx, frame].set(True)

                # -- state machine (MossTTSModel.swift:501-519)
                grows = ((text_tok == start_id) | (text_tok == gen_id)
                         | (text_tok == delay_id))
                audio_len = jnp.where(grows, audio_len + 1, audio_len)
                audio_len = jnp.where(text_tok == end_id, 0, audio_len)
                delayed = jnp.where(
                    (delayed == _DELAY_INACTIVE) & (text_tok == delay_id),
                    0, delayed)
                delayed = jnp.where(delayed != _DELAY_INACTIVE,
                                    delayed + 1, delayed)
                delayed = jnp.where(delayed > n_vq, _DELAY_INACTIVE, delayed)

                row = jnp.concatenate([text_tok[None], frame])[None, None]
                out = jax.lax.dynamic_update_slice(out, row,
                                                   (0, p_bucket + step, 0))
                return (step + 1, stopped, row, cache, out, seen, audio_len,
                        delayed, is_audio, rng)

            init = (jnp.int32(0), jnp.asarray(False),
                    rows[:, p_bucket - 1:p_bucket], cache, out, seen0,
                    audio_len0, _DELAY_INACTIVE * jnp.ones((), jnp.int32),
                    is_audio0, rng)
            final = jax.lax.while_loop(cond, body, init)
            return final[4], final[0]

        fn = ajit(loop)
        self._loops[key] = fn
        return fn

    def generate_delay_pattern_ids(
            self, rows: np.ndarray, max_new_tokens: int = 4096,
            text_temperature: float = 1.5, text_top_p: float = 1.0,
            text_top_k: int = 50, audio_temperature: float = 1.7,
            audio_top_p: float = 0.8, audio_top_k: int = 25,
            audio_repetition_penalty: float = 1.0, seed: int = 0
    ) -> list[tuple[int, np.ndarray]]:
        """rows [T, n_vq+1] -> [(start_length, generated rows)]
        (MossTTSModel.swift:379-534)."""
        cfg = self.config
        rows = np.asarray(rows, np.int32)
        seq_len = rows.shape[0]
        text_col = rows[:, 0]
        last = int(text_col[-1])
        starts = np.flatnonzero(text_col == cfg.audio_start_token_id)
        audio_start_idx = int(starts[-1]) if len(starts) else -1
        is_cont = last in (cfg.audio_start_token_id,
                           cfg.audio_assistant_gen_slot_token_id)
        is_audio0 = is_cont and audio_start_idx != -1
        audio_len0 = seq_len - audio_start_idx if is_audio0 else 0

        p_bucket = -(-(seq_len) // _PROMPT_BUCKET) * _PROMPT_BUCKET
        pad = p_bucket - seq_len
        pad_rows = np.full((pad, cfg.n_vq + 1), cfg.audio_pad_code, np.int32)
        pad_rows[:, 0] = cfg.pad_token_id
        padded = np.concatenate([pad_rows, rows], axis=0)[None]

        seen0 = np.zeros((cfg.n_vq, cfg.audio_vocab_size + 1), bool)
        for c in range(cfg.n_vq):
            seen0[c, np.clip(rows[:, c + 1], 0, cfg.audio_vocab_size)] = True

        key = (p_bucket, max_new_tokens, float(text_temperature),
               float(text_top_p), int(text_top_k), float(audio_temperature),
               float(audio_top_p), int(audio_top_k),
               float(audio_repetition_penalty))
        loop = self._get_delay_loop(key)
        out, n_gen = loop(self.params, jnp.asarray(padded), jnp.int32(pad),
                          jnp.asarray(seen0), jnp.int32(audio_len0),
                          jnp.asarray(is_audio0), jax.random.PRNGKey(seed))
        out = np.asarray(out[0])[pad:p_bucket + int(n_gen)]

        im_starts = np.flatnonzero(text_col == cfg.im_start_token_id)
        start_idx = int(im_starts[-1]) + 3 if len(im_starts) else seq_len
        start_idx = min(start_idx, seq_len)
        return [(seq_len - start_idx, out[start_idx:])]

    # -- local-transformer generation -------------------------------------------------

    def _get_local_loop(self, key):
        if key in self._loops:
            return self._loops[key]
        (p_bucket, max_new, n_vq_inf, text_temp, text_top_p, text_top_k,
         text_rep, audio_temp, audio_top_p, audio_top_k, audio_rep) = key
        cfg = self.config
        lcfg = cfg.language_config
        local_cfg = cfg.local_config()
        n_vq, width = cfg.n_vq, cfg.n_vq + 1
        active = 1 + n_vq_inf
        total = p_bucket + max_new
        # doSample gates the penalty in the local path
        # (MossTTSModel.swift:607-611)
        text_rep = text_rep if text_temp > 0 else 1.0
        audio_rep = audio_rep if audio_temp > 0 else 1.0

        def channel_decode(params, g_hidden, seen_text, seen_audio, rng):
            """One frame: text decision + codebooks, statically unrolled
            (MossTTSModel.swift:582-638)."""
            mlp_in = params["speech_embedding_to_local_mlp"]
            emb_list = params["model"]["embedding_list"]
            cur = _mlp(mlp_in, g_hidden)  # [1, D_local]
            buf = jnp.zeros((1, active, cfg.local_hidden_size), cur.dtype)
            tokens = []
            for ch in range(active):
                buf = buf.at[:, ch].set(cur)
                lh = _local_transformer_forward(
                    params["local_transformer"], buf, local_cfg)[:, ch]
                h2 = _mlp(params["local_to_speech_embedding_mlps"][str(ch)],
                          lh)
                h2 = nn.rms_norm(
                    params["layer_norm_before_lm_heads"][str(ch)], h2,
                    lcfg.rms_norm_eps)
                logits = (h2.astype(jnp.float32)
                          @ params["lm_heads"][str(ch)]["weight"]
                          .T.astype(jnp.float32))[0]
                if ch == 0:
                    logits = _penalize(logits, seen_text, text_rep)
                    temp, top_p, top_k = text_temp, text_top_p, text_top_k
                else:
                    logits = logits.at[cfg.audio_pad_code].set(-jnp.inf)
                    logits = _penalize(logits, seen_audio[ch - 1], audio_rep)
                    temp, top_p, top_k = audio_temp, audio_top_p, audio_top_k
                rng, sub = jax.random.split(rng)
                tok = _sample(sub, logits / max(temp, 1e-9)
                              if temp > 0 else logits,
                              1.0 if temp > 0 else 0.0, top_p, top_k)
                tokens.append(tok)
                if ch == 0:
                    seen_text = seen_text.at[tok].set(True)
                else:
                    seen_audio = seen_audio.at[ch - 1, tok].set(True)
                cur = _mlp(mlp_in, nn.embedding(emb_list[str(ch)],
                                                tok[None, None])[:, 0])
            frame = jnp.stack(tokens + [jnp.int32(0)] * (width - active))
            return frame, seen_text, seen_audio, rng

        def loop(params, rows, pad, seen_text0, seen_audio0, rng):
            audio_tables = self._stacked_audio_tables(params)
            lm = self._lm_params(params)
            cache = kv_cache.init_cache(
                lcfg.num_hidden_layers, 1, lcfg.num_key_value_heads,
                lcfg.resolved_head_dim, total, self.dtype)
            cache = cache._replace(valid_from=pad)
            emb = self._embed_rows(params, rows[:, :p_bucket - 1],
                                   audio_tables, n_active=n_vq_inf)
            _, cache = llama.forward(lm, None, cache, lcfg,
                                     inputs_embeds=emb, return_hidden=True)
            out = jnp.zeros((1, total, width), jnp.int32)
            out = jax.lax.dynamic_update_slice(out, rows, (0, 0, 0))

            def cond(carry):
                return (~carry[1]) & (carry[0] < max_new)

            def body(carry):
                step, stopped, cur, cache, out, seen_t, seen_a, rng = carry
                emb = self._embed_rows(params, cur, audio_tables,
                                       n_active=n_vq_inf)
                hidden, cache = llama.forward(
                    lm, None, cache, lcfg, inputs_embeds=emb,
                    return_hidden=True)
                frame, seen_t, seen_a, rng = channel_decode(
                    params, hidden[:, -1], seen_t, seen_a, rng)
                stopped = stopped | (frame[0] == cfg.audio_end_token_id)
                row = frame[None, None]
                out = jax.lax.dynamic_update_slice(out, row,
                                                   (0, p_bucket + step, 0))
                return step + 1, stopped, row, cache, out, seen_t, seen_a, rng

            init = (jnp.int32(0), jnp.asarray(False),
                    rows[:, p_bucket - 1:p_bucket], cache, out, seen_text0,
                    seen_audio0, rng)
            final = jax.lax.while_loop(cond, body, init)
            return final[4], final[0]

        fn = ajit(loop)
        self._loops[key] = fn
        return fn

    def generate_local_ids(
            self, rows: np.ndarray, max_new_tokens: int = 4096,
            text_temperature: float = 1.5, text_top_p: float = 1.0,
            text_top_k: int = 50, text_repetition_penalty: float = 1.0,
            audio_temperature: float = 1.0, audio_top_p: float = 0.95,
            audio_top_k: int = 50, audio_repetition_penalty: float = 1.1,
            n_vq_for_inference: int | None = None, seed: int = 0
    ) -> list[tuple[int, np.ndarray]]:
        """rows [T, n_vq+1] -> [(start_length, generated rows)]
        (MossTTSModel.swift:536-644)."""
        cfg = self.config
        rows = np.asarray(rows, np.int32)
        seq_len = rows.shape[0]
        n_vq_inf = max(1, min(cfg.n_vq, n_vq_for_inference or cfg.n_vq))

        p_bucket = -(-(seq_len) // _PROMPT_BUCKET) * _PROMPT_BUCKET
        pad = p_bucket - seq_len
        pad_rows = np.full((pad, cfg.n_vq + 1), cfg.audio_pad_code, np.int32)
        pad_rows[:, 0] = cfg.pad_token_id
        padded = np.concatenate([pad_rows, rows], axis=0)[None]

        seen_text0 = np.zeros((cfg.vocab_size,), bool)
        seen_text0[np.clip(rows[:, 0], 0, cfg.vocab_size - 1)] = True
        seen_audio0 = np.zeros((cfg.n_vq, cfg.audio_vocab_size + 1), bool)
        for c in range(cfg.n_vq):
            seen_audio0[c, np.clip(rows[:, c + 1], 0,
                                   cfg.audio_vocab_size)] = True

        key = (p_bucket, max_new_tokens, n_vq_inf, float(text_temperature),
               float(text_top_p), int(text_top_k),
               float(text_repetition_penalty), float(audio_temperature),
               float(audio_top_p), int(audio_top_k),
               float(audio_repetition_penalty))
        loop = self._get_local_loop(key)
        out, n_gen = loop(self.params, jnp.asarray(padded), jnp.int32(pad),
                          jnp.asarray(seen_text0), jnp.asarray(seen_audio0),
                          jax.random.PRNGKey(seed))
        out = np.asarray(out[0])[pad:p_bucket + int(n_gen)]

        starts = np.flatnonzero(rows[:, 0] == cfg.audio_start_token_id)
        if len(starts):
            start_idx = int(starts[-1])
            start_length = seq_len - start_idx - 1
        else:
            start_idx, start_length = seq_len, 0
        return [(start_length, out[start_idx:])]

    # -- audio decode -----------------------------------------------------------------

    def encode_reference_audio(self, audio) -> np.ndarray:
        """waveform -> codes [frames, n_vq]
        (MossTTSModel.swift:309-317)."""
        if self.audio_tokenizer is None:
            raise AudioGenerationError("MOSS audio tokenizer is not loaded")
        codes = np.asarray(self.audio_tokenizer.encode(
            audio, n_quantizers=self.config.n_vq))
        return codes[:, 0].T

    def decode_generated(self, outputs: list[tuple[int, np.ndarray]]
                         ) -> np.ndarray:
        """De-delay, split on all-pad frames, decode each audio segment
        (MossTTSModel.swift:646-701)."""
        if self.audio_tokenizer is None:
            raise AudioGenerationError("MOSS audio tokenizer is not loaded")
        cfg = self.config
        segments = []
        for start_length, gen in outputs:
            audio_codes = np.asarray(gen, np.int32)[:, 1:]
            if not cfg.is_local_transformer:
                audio_codes = apply_dedelay_pattern(audio_codes)
            non_pad = np.flatnonzero(
                (audio_codes != cfg.audio_pad_code).any(axis=1))
            if not len(non_pad):
                continue
            breaks = np.flatnonzero(np.diff(non_pad) != 1) + 1
            for group in np.split(non_pad, breaks):
                codes = audio_codes[group[0]:group[-1] + 1]
                wav = np.asarray(self.audio_tokenizer.decode(
                    codes.T[:, None, :]))[0]
                if start_length > 0 and not segments and codes.shape[0] > 0:
                    ratio = min(max(start_length / codes.shape[0], 0.0), 1.0)
                    trim = int(len(wav) * ratio)
                    wav = wav[trim:] if trim < len(wav) else wav[:0]
                segments.append(wav)
        if not segments:
            return np.zeros((0,), np.float32)
        return np.concatenate(segments, axis=0)

    # -- top-level API ----------------------------------------------------------------

    def default_generation_parameters(self) -> AudioGenerateParameters:
        """defaultGenerationParameters (MossTTSModel.swift:87-104)."""
        gc = self.generation_config
        if self.config.is_local_transformer:
            return AudioGenerateParameters(
                max_tokens=4096, temperature=1.0, top_p=0.95, top_k=50,
                repetition_penalty=1.1)
        return AudioGenerateParameters(
            max_tokens=gc.get("max_new_tokens", 4096),
            temperature=gc.get("temperature", 1.7),
            top_p=gc.get("top_p", 0.8), top_k=gc.get("top_k", 25),
            repetition_penalty=gc.get("repetition_penalty", 1.0))

    def processor(self) -> MossTTSProcessor:
        if self.tokenizer is None:
            raise AudioGenerationError("MOSS tokenizer is not loaded")
        local = self.config.is_local_transformer
        return MossTTSProcessor(self.tokenizer, self.config,
                                use_delay_pattern=not local,
                                append_audio_start=local)

    def generate(self, text: str, voice=None, ref_audio=None, ref_text=None,
                 language=None,
                 generation_parameters: AudioGenerateParameters | None = None,
                 max_new_tokens: int | None = None) -> np.ndarray:
        """text (+ optional voice-clone reference) -> waveform
        (MossTTSModel.swift:703-768)."""
        gp = generation_parameters or self.default_generation_parameters()
        proc = self.processor()
        prompt_codes = (self.encode_reference_audio(ref_audio)
                        if ref_audio is not None else None)
        mode = ("continuation"
                if ref_text is not None and prompt_codes is not None
                else "generation")
        user = proc.build_user_message(
            text=text if mode == "generation" else (ref_text or "") + text,
            reference=[prompt_codes]
            if mode == "generation" and prompt_codes is not None else None,
            language=language)
        conversation = [user]
        if mode == "continuation":
            conversation.append(proc.build_assistant_message([prompt_codes]))
        rows = proc(conversation, mode=mode)
        max_new = max_new_tokens or gp.max_tokens or 4096
        seed = gp.seed or 0
        if self.config.is_local_transformer:
            outputs = self.generate_local_ids(
                rows, max_new_tokens=max_new,
                audio_temperature=gp.temperature,
                audio_top_p=gp.top_p,
                audio_top_k=gp.top_k or 50,
                audio_repetition_penalty=gp.repetition_penalty,
                seed=seed)
        else:
            outputs = self.generate_delay_pattern_ids(
                rows, max_new_tokens=max_new,
                text_temperature=1.5, text_top_p=1.0, text_top_k=50,
                audio_temperature=gp.temperature,
                audio_top_p=gp.top_p,
                audio_top_k=gp.top_k or 25,
                audio_repetition_penalty=gp.repetition_penalty,
                seed=seed)
        return self.decode_generated(outputs)

    def generate_stream(self, text: str, **kw):
        t0 = time.perf_counter()
        wav = self.generate(text, **kw)
        yield AudioGeneration.from_audio(wav)
        yield AudioGeneration.from_info(AudioGenerationInfo(
            generate_time=time.perf_counter() - t0,
            audio_duration=len(wav) / self.sample_rate))
