"""MOSS-TTS Nano: RQ-Transformer TTS over the MOSS audio tokenizer.

TPU-first rebuild of the reference
(Sources/MLXAudioTTS/Models/MossTTSNano/*): a rope GPT-2 "global"
transformer consumes rows of [text_id, audio_ch_0..n_vq-1] whose
embeddings are SUMMED (pad channels masked out,
MossTTSNanoModel.swift:121-138), and a small "local" GPT-2 (no token
embedding) autoregressively emits one frame: first a text decision
(assistant-slot = keep talking, anything else = stop), then the n_vq
codebook tokens channel-by-channel, each sampled against its own
per-channel history with repetition penalty
(MossTTSNanoModel.swift:290-410). Text/audio LM heads are tied to the
respective embedding tables.

The per-frame macro step (global step + text head + unrolled local
channel decode) is ONE jitted call with a donated KV cache; frames are
decoded to waveform by `tpu_audio.codecs.moss_tokenizer` when the
checkpoint bundles an `audio_tokenizer/` directory.
"""

from __future__ import annotations

import functools
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
from tpu_audio.core.jitting import ajit

__all__ = ["MossTTSNano", "MossTTSConfig"]

USER_ROLE_PREFIX = "user\n"
USER_REFERENCE_PREFIX = "<user_inst>\n- Reference(s):\n"
USER_AFTER_REFERENCE = "\n- Begin to synthesize the speech of the " \
    "following text:\n"
USER_TEMPLATE_SUFFIX = "\n</user_inst>"
ASSISTANT_TURN_PREFIX = "\n"
ASSISTANT_ROLE_PREFIX = "assistant\n"


@dataclass
class MossGPT2Config:
    """MossTTSNanoConfig.swift gpt2Config (HF gpt2 keys)."""

    vocab_size: int = 50257
    n_positions: int = 8192
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    n_inner: int | None = None
    activation_function: str = "gelu_new"
    layer_norm_epsilon: float = 1e-5
    scale_attn_weights: bool = True
    scale_attn_by_inverse_layer_idx: bool = False
    position_embedding_type: str = "rope"
    rope_base: float = 10000.0

    @property
    def intermediate_size(self) -> int:
        return self.n_inner or 4 * self.n_embd

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    @classmethod
    def from_dict(cls, d: dict) -> "MossGPT2Config":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass
class MossTTSConfig:
    gpt2: MossGPT2Config = field(default_factory=MossGPT2Config)
    local_transformer_layers: int = 4
    n_vq: int = 16
    audio_vocab_size: int = 1024
    audio_pad_token_id: int = 1024
    im_start_token_id: int = 4
    im_end_token_id: int = 5
    audio_start_token_id: int = 6
    audio_end_token_id: int = 7
    audio_user_slot_token_id: int = 8
    audio_assistant_slot_token_id: int = 9
    audio_tokenizer_sample_rate: int = 24000

    @classmethod
    def from_dict(cls, d: dict) -> "MossTTSConfig":
        gpt2 = MossGPT2Config.from_dict(d.get("gpt2_config", d))
        keys = set(cls.__dataclass_fields__) - {"gpt2"}
        kw = {k: v for k, v in d.items() if k in keys}
        return cls(gpt2=gpt2, **kw)

    def local_gpt2(self) -> MossGPT2Config:
        cfg = MossGPT2Config(**{k: getattr(self.gpt2, k)
                                for k in MossGPT2Config.__dataclass_fields__})
        cfg.n_layer = self.local_transformer_layers
        cfg.n_positions = self.n_vq + 1
        return cfg


def gpt2_forward(params, embeds, cfg: MossGPT2Config, cache=None):
    """GPT-2 with fused c_attn and interleaved-pair rope
    (MossGPT2.swift:65-263); input is embeddings."""
    x = embeds
    b, t, d = x.shape
    nh, hd = cfg.n_head, cfg.head_dim
    offset = cache.offset if cache is not None else 0
    positions = offset + jnp.arange(t)
    cos, sin = nn.rope(positions, hd, cfg.rope_base)
    for i in range(cfg.n_layer):
        lp = params["h"][str(i)]
        h = nn.layer_norm(lp["ln_1"], x, eps=cfg.layer_norm_epsilon)
        qkv = nn.linear(lp["attn"]["c_attn"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        if cfg.position_embedding_type.lower() == "rope":
            q = nn.apply_rope(q, cos, sin, interleaved=True)
            k = nn.apply_rope(k, cos, sin, interleaved=True)
        scale = hd ** -0.5 if cfg.scale_attn_weights else 1.0
        if cfg.scale_attn_by_inverse_layer_idx:
            scale /= (i + 1)
        if cache is not None:
            cache, k_full, v_full = kv_cache.update_cache(cache, i, k, v)
            mask = kv_cache.attention_mask(cache, t)
            o = nn.sdpa(q, k_full, v_full, mask=mask, scale=scale)
        else:
            o = nn.sdpa(q, k, v, is_causal=True, scale=scale)
        x = x + nn.linear(lp["attn"]["c_proj"],
                          o.transpose(0, 2, 1, 3).reshape(b, t, d))
        h = nn.layer_norm(lp["ln_2"], x, eps=cfg.layer_norm_epsilon)
        ff = nn.linear(lp["mlp"]["fc_in"], h)
        ff = nn.gelu(ff, approximate=cfg.activation_function == "gelu_new")
        x = x + nn.linear(lp["mlp"]["fc_out"], ff)
    x = nn.layer_norm(params["ln_f"], x, eps=cfg.layer_norm_epsilon)
    if cache is not None:
        cache = cache._replace(offset=cache.offset + t)
    return x, cache


def sanitize(weights):
    """MossTTSNanoModel.swift:42-50: drop the untied head aliases."""
    out = {}
    for k, v in weights.items():
        if (k == "text_lm_head.weight" or k.startswith("audio_lm_heads.")
                or k == "local_transformer.wte.weight"):
            continue
        out[k] = v
    return out


class MossTTSNano:
    def __init__(self, config: MossTTSConfig, params, tokenizer=None,
                 audio_tokenizer=None, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.audio_tokenizer = audio_tokenizer
        self.dtype = dtype
        self.sample_rate = config.audio_tokenizer_sample_rate
        self._prefill = ajit(self._prefill_impl, donate_argnums=(2,))
        self._frame_step = ajit(self._frame_step_impl,
                                   donate_argnums=(2,))

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32
                        ) -> "MossTTSNano":
        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = MossTTSConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        tokenizer = None
        if (model_dir / "tokenizer.json").exists():
            from tokenizers import Tokenizer

            tokenizer = Tokenizer.from_file(str(model_dir / "tokenizer.json"))
        audio_tok = None
        if (model_dir / "audio_tokenizer" / "config.json").exists():
            from tpu_audio.codecs.moss_tokenizer import MossAudioTokenizer

            audio_tok = MossAudioTokenizer.from_pretrained(
                str(model_dir / "audio_tokenizer"), dtype=dtype)
        return cls(config, params, tokenizer, audio_tok, dtype)

    # -- embedding of [text | audio channels] rows ---------------------------------

    def _rows_embeds(self, params, rows):
        """rows [B, T, n_vq+1] -> summed embeddings
        (MossTTSNanoModel.swift:121-138)."""
        cfg = self.config
        emb = nn.embedding(params["transformer"]["wte"], rows[..., 0])
        for ch in range(cfg.n_vq):
            ids = rows[..., ch + 1]
            valid = ids != cfg.audio_pad_token_id
            safe = jnp.where(valid, ids, 0)
            e = nn.embedding(params["audio_embeddings"][str(ch)], safe)
            emb = emb + e * valid[..., None].astype(emb.dtype)
        return emb

    def _prefill_impl(self, params, rows, cache):
        emb = self._rows_embeds(params, rows)
        _, cache = gpt2_forward(params["transformer"], emb,
                                self.config.gpt2, cache)
        return cache

    def _frame_step_impl(self, params, row, cache, rng, history, hist_len):
        """One frame (MossTTSNanoModel.swift:327-404). row [1, 1, n_vq+1];
        history [n_vq, H] ring of previous channel tokens."""
        cfg = self.config
        lcfg = cfg.local_gpt2()
        emb = self._rows_embeds(params, row)
        hidden, cache = gpt2_forward(params["transformer"], emb,
                                     cfg.gpt2, cache)
        g = hidden[:, -1]  # [1, d]
        local_seq = g[:, None, :]
        lh, _ = gpt2_forward(params["local_transformer"], local_seq, lcfg)
        wte = params["transformer"]["wte"]["weight"]
        text_logits = (lh[:, -1].astype(jnp.float32)
                       @ wte.T.astype(jnp.float32))
        text_tok = jnp.argmax(text_logits, axis=-1).astype(jnp.int32)[0]
        cur = nn.embedding(params["transformer"]["wte"],
                           text_tok[None, None])[:, 0]
        frame = jnp.zeros((cfg.n_vq,), jnp.int32)
        for ch in range(cfg.n_vq):
            local_seq = jnp.concatenate([local_seq, cur[:, None, :]], axis=1)
            lh, _ = gpt2_forward(params["local_transformer"], local_seq,
                                 lcfg)
            table = params["audio_embeddings"][str(ch)]["weight"]
            logits = (lh[:, -1].astype(jnp.float32)
                      @ table.T.astype(jnp.float32))[0]
            # repetition penalty over this channel's history
            hpos = jnp.arange(history.shape[1])
            valid = hpos < hist_len
            prev = jnp.where(valid, history[ch], -1)
            penal = jnp.zeros_like(logits).at[jnp.clip(prev, 0, None)].set(
                jnp.where(valid, 1.0, 0.0))
            logits = jnp.where(
                penal > 0,
                jnp.where(logits > 0, logits / 1.2, logits * 1.2), logits)
            rng, sub = jax.random.split(rng)
            masked = _mask_top_k(logits[None],
                                 min(25, logits.shape[-1]))
            masked = _mask_top_p(masked, 0.95)
            tok = jax.random.categorical(sub, masked / 0.8,
                                         axis=-1).astype(jnp.int32)[0]
            frame = frame.at[ch].set(tok)
            cur = nn.embedding(params["audio_embeddings"][str(ch)],
                               tok[None, None])[:, 0]
        pos = jnp.clip(hist_len, 0, history.shape[1] - 1)
        history = jax.lax.dynamic_update_slice(history, frame[:, None],
                                               (0, pos))
        return text_tok, frame, cache, rng, history

    # -- prompting ------------------------------------------------------------------

    def _encode(self, text: str) -> list[int]:
        return self.tokenizer.encode(text).ids

    def build_prompt_rows(self, text: str, prompt_audio_codes=None
                          ) -> np.ndarray:
        """Continuation (no ref) or voice-clone rows
        (MossTTSNanoModel.swift:176-252)."""
        cfg = self.config
        width = cfg.n_vq + 1

        def text_rows(ids):
            rows = np.full((len(ids), width), cfg.audio_pad_token_id,
                           np.int32)
            rows[:, 0] = ids
            return rows

        if prompt_audio_codes is None:
            ids = ([cfg.im_start_token_id] + self._encode(USER_ROLE_PREFIX)
                   + self._encode(USER_REFERENCE_PREFIX)
                   + self._encode("None")
                   + self._encode(USER_AFTER_REFERENCE)
                   + self._encode(text)
                   + self._encode(USER_TEMPLATE_SUFFIX)
                   + [cfg.im_end_token_id]
                   + self._encode(ASSISTANT_TURN_PREFIX)
                   + [cfg.im_start_token_id]
                   + self._encode(ASSISTANT_ROLE_PREFIX)
                   + [cfg.audio_start_token_id])
            return text_rows(ids)
        codes = np.asarray(prompt_audio_codes, np.int32)
        audio_rows = np.full((codes.shape[0], width),
                             cfg.audio_pad_token_id, np.int32)
        audio_rows[:, 0] = cfg.audio_user_slot_token_id
        n = min(codes.shape[1], cfg.n_vq)
        audio_rows[:, 1:1 + n] = codes[:, :n]
        prefix = text_rows([cfg.im_start_token_id]
                           + self._encode(USER_ROLE_PREFIX)
                           + self._encode(USER_REFERENCE_PREFIX)
                           + [cfg.audio_start_token_id])
        suffix = text_rows([cfg.audio_end_token_id]
                           + self._encode(USER_AFTER_REFERENCE)
                           + self._encode(text)
                           + self._encode(USER_TEMPLATE_SUFFIX)
                           + [cfg.im_end_token_id]
                           + self._encode(ASSISTANT_TURN_PREFIX)
                           + [cfg.im_start_token_id]
                           + self._encode(ASSISTANT_ROLE_PREFIX)
                           + [cfg.audio_start_token_id])
        return np.concatenate([prefix, audio_rows, suffix], axis=0)

    # -- generation -----------------------------------------------------------------

    def generate_codes(self, text: str, prompt_audio_codes=None,
                       max_new_frames: int = 375, seed: int = 0
                       ) -> np.ndarray:
        """text -> audio codes [frames, n_vq]."""
        if self.tokenizer is None:
            raise AudioGenerationError("tokenizer not loaded")
        cfg = self.config
        rows = self.build_prompt_rows(text, prompt_audio_codes)
        cache = kv_cache.init_cache(
            cfg.gpt2.n_layer, 1, cfg.gpt2.n_head, cfg.gpt2.head_dim,
            rows.shape[0] + max_new_frames + 1, self.dtype)
        cache = self._prefill(self.params,
                              jnp.asarray(rows[None, :-1]), cache)
        row = jnp.asarray(rows[None, -1:])
        rng = jax.random.PRNGKey(seed)
        history = jnp.zeros((cfg.n_vq, max_new_frames), jnp.int32)
        frames = []
        for step in range(max_new_frames):
            text_tok, frame, cache, rng, history = self._frame_step(
                self.params, row, cache, rng, history, jnp.int32(step))
            if int(text_tok) != cfg.audio_assistant_slot_token_id:
                break
            frame_np = np.asarray(frame)
            frames.append(frame_np)
            next_row = np.full((1, 1, cfg.n_vq + 1),
                               cfg.audio_pad_token_id, np.int32)
            next_row[0, 0, 0] = cfg.audio_assistant_slot_token_id
            next_row[0, 0, 1:] = frame_np
            row = jnp.asarray(next_row)
        if not frames:
            return np.zeros((0, cfg.n_vq), np.int32)
        return np.stack(frames, axis=0)

    def default_generation_parameters(self) -> AudioGenerateParameters:
        return AudioGenerateParameters(max_tokens=375, temperature=0.8,
                                       top_p=0.95, top_k=25,
                                       repetition_penalty=1.2)

    def generate(self, text: str, voice=None, ref_audio=None, ref_text=None,
                 language=None,
                 generation_parameters: AudioGenerateParameters | None = None,
                 max_new_frames: int = 375) -> np.ndarray:
        gp = generation_parameters or AudioGenerateParameters()
        prompt_codes = None
        if ref_audio is not None:
            if self.audio_tokenizer is None:
                raise AudioGenerationError("audio tokenizer not loaded")
            codes = np.asarray(self.audio_tokenizer.encode(ref_audio))
            prompt_codes = codes[:, 0].T  # [frames, nq]
        frames = self.generate_codes(text, prompt_codes, max_new_frames,
                                     seed=gp.seed or 0)
        if self.audio_tokenizer is None:
            raise AudioGenerationError("audio tokenizer not loaded")
        codes = frames.T[:, None, :]  # [nq, 1, frames]
        wav = np.asarray(self.audio_tokenizer.decode(codes))
        return wav.reshape(-1)

    def generate_stream(self, text: str, **kw):
        t0 = time.perf_counter()
        wav = self.generate(text, **kw)
        yield AudioGeneration.from_audio(wav)
        yield AudioGeneration.from_info(AudioGenerationInfo(
            generate_time=time.perf_counter() - t0,
            audio_duration=len(wav) / self.sample_rate))
