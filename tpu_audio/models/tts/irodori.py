"""Irodori-TTS: Japanese flow-matching TTS (Echo-TTS family).

TPU-first rebuild of the reference
(Sources/MLXAudioTTS/Models/IrodoriTTS/*): a Rectified-Flow DiT over
continuous Semantic-DACVAE latents (48 kHz) with

* joint attention over latent self tokens + text + speaker and/or
  caption contexts (VoiceDesign), half-head rotary, low-rank adaLN
  (IrodoriDiT.swift:80-402),
* a v3 duration predictor (token-sum AdaRN-Zero SwiGLU stack regressing
  log1p(frames) from text state + 14 handcrafted features,
  IrodoriDiT.swift:409-648, IrodoriDuration.swift),
* a CFG Euler sampler with independent / joint / alternating guidance
  modes, sway t-schedule, temporal score rescale, and speaker-KV scaling
  with mid-trajectory rollback (IrodoriTTSSampling.swift).

TPU mapping: conditions are encoded and their per-layer K/V stacked
ONCE per utterance; the whole ODE runs as a jitted ``lax.fori_loop``
over a precomputed t-schedule. The CFG window gate and the
speaker-KV scale factor are folded into per-step multipliers so every
step has identical static shapes (the reference instead branches
per step on the host, IrodoriTTSSampling.swift:270-436); outside the
window the guidance term is multiplied by zero, which matches the
reference's single-forward path exactly. The alternating mode's parity
branch becomes an on-device select over equal-shaped operands. Latent
sequence lengths are bucketed to multiples of 32 frames to bound jit
recompiles; the latent is cut back to the predicted frame count before
decoding.

Echo-TTS primitives (rotary, RMS, SwiGLU, low-rank adaLN, encoder
blocks, timestep embedding) are shared with
:mod:`tpu_audio.models.tts.echo_tts` — the reference does the same
(IrodoriDiT.swift:6-11).
"""

from __future__ import annotations

import re
import time
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
from tpu_audio.models.tts.echo_tts import (
    _echo_mlp,
    _echo_rms,
    _encoder_block,
    _freqs_cis,
    _low_rank_adaln,
    _rotary_half_heads,
    _timestep_embedding,
)
from tpu_audio.core.jitting import ajit

__all__ = ["IrodoriTTS", "IrodoriTTSConfig", "normalize_text",
           "build_duration_features"]

DEFAULT_CAPTION = "落ち着いた自然な声で、はっきりと読み上げてください。"
_SEQ_BUCKET = 32


# -- configuration ------------------------------------------------------------------


@dataclass
class IrodoriDiTConfig:
    """IrodoriTTSConfig.swift:6-168 (mirrors irodori_tts config.py)."""

    latent_dim: int = 32
    latent_patch_size: int = 1
    model_dim: int = 1280
    num_layers: int = 12
    num_heads: int = 20
    mlp_ratio: float = 2.875
    text_mlp_ratio: float | None = 2.6
    speaker_mlp_ratio: float | None = 2.6
    text_vocab_size: int = 99574
    text_tokenizer_repo: str = "llm-jp/llm-jp-3-150m"
    text_add_bos: bool = True
    text_dim: int = 512
    text_layers: int = 10
    text_heads: int = 8
    speaker_dim: int = 768
    speaker_layers: int = 8
    speaker_heads: int = 12
    speaker_patch_size: int = 1
    timestep_embed_dim: int = 512
    adaln_rank: int = 192
    norm_eps: float = 1e-5
    use_caption_condition: bool = False
    use_speaker_condition: bool | None = None
    caption_vocab_size: int | None = None
    caption_tokenizer_repo: str | None = None
    caption_add_bos: bool | None = None
    caption_dim: int | None = None
    caption_layers: int | None = None
    caption_heads: int | None = None
    caption_mlp_ratio: float | None = None
    use_duration_predictor: bool = False
    duration_aux_dim: int = 14
    duration_hidden_dim: int = 1024
    duration_layers: int = 3
    duration_attention_heads: int = 8
    duration_architecture: str = "token_sum_adarn_zero_no_aux"
    duration_token_init_frames: float = 9.0

    @property
    def use_speaker(self) -> bool:
        if self.use_speaker_condition is not None:
            return self.use_speaker_condition
        return not self.use_caption_condition

    @property
    def caption_dim_r(self) -> int:
        return self.caption_dim or self.text_dim

    @property
    def caption_layers_r(self) -> int:
        return self.caption_layers or self.text_layers

    @property
    def caption_heads_r(self) -> int:
        return self.caption_heads or self.text_heads

    @property
    def patched_latent_dim(self) -> int:
        return self.latent_dim * self.latent_patch_size

    @property
    def speaker_patched_latent_dim(self) -> int:
        return self.patched_latent_dim * self.speaker_patch_size

    @classmethod
    def from_dict(cls, d: dict) -> "IrodoriDiTConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass
class IrodoriSamplerConfig:
    """IrodoriTTSConfig.swift:171-246."""

    num_steps: int = 40
    cfg_scale_text: float = 3.0
    cfg_scale_speaker: float = 5.0
    cfg_scale_caption: float = 3.0
    cfg_guidance_mode: str = "independent"
    cfg_min_t: float = 0.5
    cfg_max_t: float = 1.0
    truncation_factor: float | None = None
    rescale_k: float | None = None
    rescale_sigma: float | None = None
    speaker_kv_scale: float | None = None
    speaker_kv_min_t: float | None = 0.9
    speaker_kv_max_layers: int | None = None
    sequence_length: int = 750
    t_schedule_mode: str = "linear"
    sway_coeff: float = -1.0
    duration_scale: float = 1.0
    min_seconds: float = 0.5
    max_seconds: float = 30.0

    @classmethod
    def from_dict(cls, d: dict) -> "IrodoriSamplerConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass
class IrodoriTTSConfig:
    """IrodoriTTSConfig.swift:248-289."""

    model_type: str = "irodori_tts"
    sample_rate: int = 48000
    max_text_length: int = 256
    max_caption_length: int = 512
    max_speaker_latent_length: int = 6400
    audio_downsample_factor: int = 1920
    dacvae_repo: str = "Aratako/Semantic-DACVAE-Japanese-32dim"
    dit: IrodoriDiTConfig = field(default_factory=IrodoriDiTConfig)
    sampler: IrodoriSamplerConfig = field(
        default_factory=IrodoriSamplerConfig)

    @classmethod
    def from_dict(cls, d: dict) -> "IrodoriTTSConfig":
        keys = set(cls.__dataclass_fields__) - {"dit", "sampler"}
        kw = {k: v for k, v in d.items() if k in keys}
        return cls(dit=IrodoriDiTConfig.from_dict(d.get("dit", {})),
                   sampler=IrodoriSamplerConfig.from_dict(
                       d.get("sampler", {})), **kw)


# -- Japanese text normalisation (IrodoriTTSText.swift:9-79) ------------------------

_REGEX_REPLACEMENTS = [
    (r"\t", ""), (r"\[n\]", ""), (" ", ""), ("　", ""),
    (r"[;▼♀♂《》≪≫①②③④⑤⑥]", ""),
    ("[˗‐-―⁃−⎯⏤─━⸺"
     "⸻]", ""),
    ("[～〜]", "ー"), ("？", "?"), ("！", "!"), ("[●◯〇]", "○"),
    ("♥", "♡"),
]
_HW_KANA = "ｦｧｨｩｪｫｬｭｮｯｰｱｲｳｴｵｶｷｸｹｺｻｼｽｾｿﾀﾁﾂﾃﾄﾅﾆﾇﾈﾉﾊﾋﾌﾍﾎﾏﾐﾑﾒﾓﾔﾕﾖﾗﾘﾙﾚﾛﾜﾝ"
_FW_KANA = ("ヲァィゥェォャュョッーアイウエオカキクケコサシスセソタチツテト"
            "ナニヌネノハヒフヘホマミムメモヤユヨラリルレロワン")
_KANA_MAP = str.maketrans(dict(zip(_HW_KANA, _FW_KANA)))


def _width_fold(ch: str) -> str:
    v = ord(ch)
    if 0xFF21 <= v <= 0xFF3A:
        return chr(v - 0xFF21 + 0x41)
    if 0xFF41 <= v <= 0xFF5A:
        return chr(v - 0xFF41 + 0x61)
    if 0xFF10 <= v <= 0xFF19:
        return chr(v - 0xFF10 + 0x30)
    return ch


def normalize_text(text: str) -> str:
    for pattern, repl in _REGEX_REPLACEMENTS:
        text = re.sub(pattern, repl, text)
    text = "".join(_width_fold(c) for c in text)
    text = text.translate(_KANA_MAP)
    text = re.sub("…{3,}", "……", text)
    for open_b, close_b in [("「", "」"), ("『", "』"), ("（", "）"),
                            ("【", "】"), ("(", ")")]:
        if text.startswith(open_b) and text.endswith(close_b) \
                and len(text) >= 2:
            text = text[1:-1]
    while text.endswith(("。", "、")):
        text = text[:-1]
    return text


# -- duration features (IrodoriDuration.swift:9-117) --------------------------------

ANNOTATION_EMOJIS = [
    "⏩", "⏱️", "⏸️", "🌬️", "🍭", "🎛️", "🎭", "🎵", "🐢", "🐱", "👂", "👃",
    "👅", "👌", "👏", "💋", "💥", "💦", "💪", "📄", "📞", "📢", "📣", "😆",
    "😊", "😌", "😎", "😏", "😒", "😖", "😟", "😠", "😪", "😭", "😮",
    "😮‍💨", "😰", "😱", "😲", "😴", "🙄", "🙏", "🤐", "🤔", "🤢", "🤧",
    "🤭", "🥤", "🥱", "🥴", "🥵", "🥹", "🥺", "🫣", "🫶", "📖",
]
_EMOJIS_LONGEST_FIRST = sorted(ANNOTATION_EMOJIS, key=len, reverse=True)


def count_annotation_emojis(text: str) -> int:
    count, i = 0, 0
    while i < len(text):
        for e in _EMOJIS_LONGEST_FIRST:
            if text.startswith(e, i):
                count += 1
                i += len(e)
                break
        else:
            i += 1
    return count


def _log1p_cap(count, cap) -> float:
    return float(np.log1p(min(max(count, 0), cap)) / np.log1p(cap))


def build_duration_features(texts, token_counts, max_text_len: int,
                            has_speaker) -> np.ndarray:
    """(B, 14) per-utterance duration features
    (IrodoriDuration.swift:67-117)."""
    rows = []
    for text, n_tok, spk in zip(texts, token_counts, has_speaker):
        chars = max(len(text), 1)
        kana = sum(1 for c in text
                   if 0x3040 <= ord(c) <= 0x309F or 0x30A0 <= ord(c) <= 0x30FF)
        kanji = sum(1 for c in text
                    if 0x3400 <= ord(c) <= 0x4DBF or 0x4E00 <= ord(c) <= 0x9FFF
                    or 0xF900 <= ord(c) <= 0xFAFF
                    or 0x20000 <= ord(c) <= 0x2FA1F)
        alnum = sum(1 for c in text if c.isascii() and c.isalnum())
        rows.append([
            min(max(float(n_tok), 0.0), float(max_text_len)) / max_text_len,
            _log1p_cap(float(chars), 512.0),
            float(n_tok) / chars,
            _log1p_cap(text.count("。") + text.count("."), 8),
            _log1p_cap(text.count("、") + text.count(","), 16),
            _log1p_cap(text.count("ー"), 8),
            _log1p_cap(text.count("…"), 8),
            _log1p_cap(text.count("！") + text.count("!"), 8),
            _log1p_cap(text.count("？") + text.count("?"), 8),
            _log1p_cap(count_annotation_emojis(text), 8),
            kana / chars, kanji / chars, alnum / chars,
            1.0 if spk else 0.0,
        ])
    return np.asarray(rows, np.float32)


# -- encoders (IrodoriDiT.swift:242-339) --------------------------------------------


def _masked_encoder(p, x, mask, heads: int, layers: int, eps: float):
    """Non-causal encoder stack that re-zeroes masked positions after each
    block (IrodoriTextEncoder, IrodoriDiT.swift:270-288)."""
    hd = x.shape[-1] // heads
    cos, sin = _freqs_cis(hd, x.shape[1])
    mf = mask[..., None].astype(x.dtype)
    x = x * mf
    for i in range(layers):
        x = _encoder_block(p["blocks"][str(i)], x, mask, cos, sin, heads,
                           False, eps) * mf
    return x


def text_encoder_forward(p, ids, mask, heads: int, layers: int, eps: float):
    return _masked_encoder(p, nn.embedding(p["text_embedding"], ids), mask,
                           heads, layers, eps)


def ref_encoder_forward(p, latent, mask, heads: int, layers: int,
                        eps: float):
    """IrodoriReferenceLatentEncoder (IrodoriDiT.swift:293-339); input is
    already speaker-patched."""
    return _masked_encoder(p, nn.linear(p["in_proj"], latent) / 6.0, mask,
                           heads, layers, eps)


def patch_sequence(seq: np.ndarray, mask: np.ndarray, patch: int):
    """(B, S, D) -> (B, S/p, D*p); mask true iff every token in the patch
    is valid (IrodoriDiT.swift:27-42)."""
    if patch <= 1:
        return seq, mask
    b, s, d = seq.shape
    usable = (s // patch) * patch
    return (seq[:, :usable].reshape(b, usable // patch, d * patch),
            mask[:, :usable].reshape(b, usable // patch, patch).all(-1))


# -- DiT ----------------------------------------------------------------------------


def build_kv(p, state, suffix: str, dcfg: IrodoriDiTConfig):
    """Per-layer stacked context K/V [L, B, T, H, D] with k_norm, no rotary
    (IrodoriJointAttention.getKVCache*, IrodoriDiT.swift:143-171)."""
    b, t, _ = state.shape
    hd = dcfg.model_dim // dcfg.num_heads
    ks, vs = [], []
    for i in range(dcfg.num_layers):
        ap = p["blocks"][str(i)]["attention"]
        k = nn.linear(ap[f"wk{suffix}"], state).reshape(
            b, t, dcfg.num_heads, hd)
        ks.append(_echo_rms(ap["k_norm"], k, dcfg.norm_eps))
        vs.append(nn.linear(ap[f"wv{suffix}"], state).reshape(
            b, t, dcfg.num_heads, hd))
    return jnp.stack(ks), jnp.stack(vs)


def _iro_attention(p, x, cos, sin, contexts, dcfg: IrodoriDiTConfig):
    """Gated joint attention: latent self K/V + context K/Vs
    (IrodoriJointAttention, IrodoriDiT.swift:173-234). ``contexts`` is a
    list of ((k, v), mask) with k/v [B, T', H, D]."""
    b, t, d = x.shape
    heads = dcfg.num_heads
    hd = d // heads
    q = nn.linear(p["wq"], x).reshape(b, t, heads, hd)
    k = nn.linear(p["wk"], x).reshape(b, t, heads, hd)
    v = nn.linear(p["wv"], x).reshape(b, t, heads, hd)
    gate = nn.linear(p["gate"], x)
    q = _echo_rms(p["q_norm"], q, dcfg.norm_eps)
    k = _echo_rms(p["k_norm"], k, dcfg.norm_eps)
    q = _rotary_half_heads(q, cos[:t], sin[:t])
    k = _rotary_half_heads(k, cos[:t], sin[:t])
    pieces_k, pieces_v = [k], [v]
    masks = [jnp.ones((b, t), bool)]
    for (ck, cv), cmask in contexts:
        pieces_k.append(ck)
        pieces_v.append(cv)
        masks.append(cmask)
    keys = jnp.concatenate(pieces_k, axis=1)
    values = jnp.concatenate(pieces_v, axis=1)
    full_mask = jnp.concatenate(masks, axis=1)
    o = nn.sdpa(q.transpose(0, 2, 1, 3), keys.transpose(0, 2, 1, 3),
                values.transpose(0, 2, 1, 3),
                mask=full_mask[:, None, None, :])
    o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
    return nn.linear(p["wo"], o * jax.nn.sigmoid(gate))


def dit_forward(p, x_t, t, contexts, dcfg: IrodoriDiTConfig):
    """Velocity prediction (IrodoriDiT.forwardWithConditions,
    IrodoriDiT.swift:886-960). ``contexts`` is a list of
    ((k [L,B,T,H,D], v), mask [B,T])."""
    temb = _timestep_embedding(t, dcfg.timestep_embed_dim).astype(x_t.dtype)
    cm = p["cond_module"]
    cond = nn.linear(cm["4"], nn.silu(nn.linear(
        cm["2"], nn.silu(nn.linear(cm["0"], temb)))))[:, None]
    h = nn.linear(p["in_proj"], x_t)
    hd = dcfg.model_dim // dcfg.num_heads
    cos, sin = _freqs_cis(hd, x_t.shape[1])
    for i in range(dcfg.num_layers):
        bp = p["blocks"][str(i)]
        a_in, a_gate = _low_rank_adaln(bp["attention_adaln"], h, cond,
                                       dcfg.norm_eps)
        layer_ctx = [(((ck[i], cv[i])), m) for (ck, cv), m in contexts]
        h = h + a_gate * _iro_attention(bp["attention"], a_in, cos, sin,
                                        layer_ctx, dcfg)
        m_in, m_gate = _low_rank_adaln(bp["mlp_adaln"], h, cond,
                                       dcfg.norm_eps)
        h = h + m_gate * _echo_mlp(bp["mlp"], m_in)
    return nn.linear(p["out_proj"],
                     _echo_rms(p["out_norm"], h,
                               dcfg.norm_eps)).astype(jnp.float32)


# -- duration predictor (IrodoriDiT.swift:409-648) ----------------------------------


def duration_forward(p, text_state, text_mask, speaker_vec, caption_vec,
                     dcfg: IrodoriDiTConfig):
    """log1p(total frames) [B] from text state; AdaRN-Zero SwiGLU token
    stack, softplus per-token frames summed over valid tokens."""
    h = nn.linear(p["token_input_proj"], text_state)
    dual = dcfg.duration_architecture == "token_sum_dual_adarn_zero_no_aux"
    for i in range(dcfg.duration_layers):
        bp = p["token_blocks"][str(i)]
        hn = _echo_rms(bp["norm"], h, dcfg.norm_eps)
        shift = scale = gate = 0.0
        mod = nn.linear(bp["modulation"], nn.silu(speaker_vec))
        s0, s1, s2 = jnp.split(mod, 3, axis=-1)
        shift = shift + s0[:, None]
        scale = scale + s1[:, None]
        gate = gate + s2[:, None]
        if dual:
            cmod = nn.linear(bp["caption_modulation"], nn.silu(caption_vec))
            c0, c1, c2 = jnp.split(cmod, 3, axis=-1)
            shift = shift + c0[:, None]
            scale = scale + c1[:, None]
            gate = gate + c2[:, None]
        hn = hn * (scale + 1) + shift
        h = h + jnp.tanh(gate) * _echo_mlp(bp["mlp"], hn)
    logits = nn.linear(p["token_out_proj"],
                       _echo_rms(p["token_out_norm"], h,
                                 dcfg.norm_eps))[..., 0]
    # softplus in f32 (log(1+exp) per the reference, stable form)
    frames = jnp.logaddexp(0.0, logits.astype(jnp.float32))
    total = (frames * text_mask.astype(jnp.float32)).sum(axis=1)
    return jnp.log1p(jnp.maximum(total, 0.0))


# -- sampler schedule (IrodoriTTSSampling.swift:78-98) ------------------------------


def t_schedule(num_steps: int, init_scale: float, mode: str,
               sway_coeff: float) -> np.ndarray:
    u0 = np.arange(num_steps + 1, dtype=np.float32) / num_steps
    if mode.strip().lower() == "sway":
        u = u0 + sway_coeff * (np.cos(0.5 * np.pi * u0) + u0 - 1.0)
        u = np.clip(u, 0.0, 1.0)
        return (1.0 - u) * init_scale
    return init_scale * (1.0 - u0)


def sanitize(weights):
    """Strip the ``model.`` prefix (IrodoriTTSModel.swift:42-78; the rest
    of the key tree matches the Python snake_case layout directly)."""
    return {(k[len("model."):] if k.startswith("model.") else k): v
            for k, v in weights.items()}


# -- model --------------------------------------------------------------------------


class IrodoriTTS:
    """Japanese flow-matching TTS with VoiceDesign captions and automatic
    duration (IrodoriTTSModel.swift)."""

    def __init__(self, config: IrodoriTTSConfig, params, tokenizer=None,
                 caption_tokenizer=None, dacvae=None, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.caption_tokenizer = caption_tokenizer or tokenizer
        self.dacvae = dacvae
        self.dtype = dtype
        self.sample_rate = config.sample_rate
        self._samplers: dict = {}
        self._duration = ajit(self._duration_impl)

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32
                        ) -> "IrodoriTTS":
        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = IrodoriTTSConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize,
                                     dtype=dtype)
        dacvae = None
        if (model_dir / "dacvae" / "config.json").exists():
            from tpu_audio.codecs.dacvae import DACVAE

            dacvae = DACVAE.from_pretrained(str(model_dir / "dacvae"),
                                            dtype=dtype)
        tokenizer = None
        for cand in (model_dir / "tokenizer.json",
                     model_dir / "tokenizer" / "tokenizer.json"):
            if cand.exists():
                from tokenizers import Tokenizer

                tokenizer = Tokenizer.from_file(str(cand))
                break
        return cls(config, params, tokenizer, None, dacvae, dtype)

    def default_generation_parameters(self) -> AudioGenerateParameters:
        return AudioGenerateParameters(
            max_tokens=self.config.sampler.sequence_length, temperature=0.0,
            top_p=1.0)

    # -- text / caption / reference preparation --------------------------------------

    def _encode_ids(self, text: str, max_length: int, add_bos: bool):
        """Manual BOS, right-pad with eos/pad to ``max_length``
        (irodoriEncodeText, IrodoriTTSText.swift:87-121)."""
        if self.tokenizer is None:
            raise AudioGenerationError("Irodori tokenizer is not loaded")
        ids = list(self.tokenizer.encode(text,
                                         add_special_tokens=False).ids)
        if add_bos:
            bos = self.tokenizer.token_to_id("<s>")
            if bos is None:
                raise AudioGenerationError("tokenizer has no <s> bos token")
            ids.insert(0, bos)
        ids = ids[:max_length]
        n = len(ids)
        pad = self.tokenizer.token_to_id("</s>") or 0
        ids = ids + [pad] * (max_length - n)
        mask = np.zeros((1, max_length), bool)
        mask[0, :n] = True
        return np.asarray(ids, np.int32)[None], mask

    def prepare_text(self, text: str):
        return self._encode_ids(normalize_text(text),
                                self.config.max_text_length,
                                self.config.dit.text_add_bos)

    def prepare_caption(self, caption: str):
        add_bos = self.config.dit.caption_add_bos
        if add_bos is None:
            add_bos = self.config.dit.text_add_bos
        return self._encode_ids(caption, self.config.max_caption_length,
                                add_bos)

    def encode_ref_audio(self, audio):
        """waveform -> (latent [1, T, D], mask)
        (IrodoriTTSModel.swift:100-126)."""
        if self.dacvae is None:
            raise AudioGenerationError("DACVAE is not loaded")
        cfg = self.config
        audio = np.asarray(audio, np.float32)
        if audio.ndim == 2:
            audio = audio.mean(axis=0) if audio.shape[0] > 1 else audio[0]
        max_samples = cfg.max_speaker_latent_length \
            * cfg.audio_downsample_factor
        audio = audio[:max_samples]
        latent = np.asarray(self.dacvae.encode(audio[None]))  # [1, T, D]
        actual = min(len(audio) // cfg.audio_downsample_factor,
                     latent.shape[1])
        p = cfg.dit.speaker_patch_size
        if p > 1:
            actual = (actual // p) * p
        latent = latent[:, :max(actual, 1)]
        mask = np.ones((1, latent.shape[1]), bool)
        if actual == 0:
            mask[:] = False
        return latent, mask

    # -- duration ---------------------------------------------------------------------

    def _duration_impl(self, params, text_ids, text_mask, ref_latent,
                       ref_mask, cap_ids, cap_mask, aux, has_speaker,
                       has_caption):
        dcfg = self.config.dit
        text_state = _echo_rms(
            params["text_norm"],
            text_encoder_forward(params["text_encoder"], text_ids,
                                 text_mask, dcfg.text_heads,
                                 dcfg.text_layers, dcfg.norm_eps),
            dcfg.norm_eps)
        dp = params["duration_predictor"]
        # speaker vector: first frame of speaker state or the learned null
        # (IrodoriDiT.swift:536-552)
        if dcfg.use_speaker:
            spk_state = _echo_rms(
                params["speaker_norm"],
                ref_encoder_forward(params["speaker_encoder"], ref_latent,
                                    ref_mask, dcfg.speaker_heads,
                                    dcfg.speaker_layers, dcfg.norm_eps),
                dcfg.norm_eps)
            spk_vec = jnp.where(has_speaker[:, None], spk_state[:, 0],
                                dp["null_speaker"][None])
        else:
            spk_vec = jnp.broadcast_to(dp["null_speaker"][None],
                                       (text_ids.shape[0],
                                        dp["null_speaker"].shape[0]))
        cap_vec = None
        if dcfg.duration_architecture == "token_sum_dual_adarn_zero_no_aux":
            cap_state = _echo_rms(
                params["caption_norm"],
                text_encoder_forward(params["caption_encoder"], cap_ids,
                                     cap_mask, dcfg.caption_heads_r,
                                     dcfg.caption_layers_r, dcfg.norm_eps),
                dcfg.norm_eps)
            mf = cap_mask[..., None].astype(jnp.float32)
            pooled = (cap_state * mf).sum(axis=1) \
                / jnp.maximum(mf.sum(axis=1), 1.0)
            cap_vec = jnp.where(has_caption[:, None], pooled,
                                dp["null_caption"][None])
        return duration_forward(dp, text_state, text_mask, spk_vec, cap_vec,
                                dcfg)

    def compute_latent_steps(self, text, text_ids, text_mask, ref_latent,
                             ref_mask, cap_ids, cap_mask,
                             seconds_override=None) -> int:
        """Predicted (or overridden) latent frame count
        (IrodoriTTSModel.swift:130-179)."""
        cfg = self.config
        fps = cfg.sample_rate / cfg.audio_downsample_factor
        s = cfg.sampler
        if seconds_override is not None:
            secs = min(s.max_seconds, max(s.min_seconds, seconds_override))
            return int(np.ceil(secs * cfg.sample_rate
                               / cfg.audio_downsample_factor))
        if not cfg.dit.use_duration_predictor:
            return s.sequence_length
        aux = build_duration_features(
            [normalize_text(text)], [int(text_mask.sum())],
            cfg.max_text_length, [bool(ref_mask.any())])
        has_spk = np.asarray([bool(ref_mask.any())])
        has_cap = np.asarray(
            [bool(cap_mask.any()) if cap_mask is not None else False])
        if cap_ids is None:
            cap_ids = np.zeros((1, 1), np.int32)
            cap_mask = np.zeros((1, 1), bool)
        pred_log = np.asarray(self._duration(
            self.params, jnp.asarray(text_ids), jnp.asarray(text_mask),
            jnp.asarray(ref_latent, self.dtype), jnp.asarray(ref_mask),
            jnp.asarray(cap_ids), jnp.asarray(cap_mask), jnp.asarray(aux),
            jnp.asarray(has_spk), jnp.asarray(has_cap)))
        frames = float(np.expm1(pred_log[0])) * s.duration_scale
        lo = max(1, int(np.ceil(s.min_seconds * fps)))
        hi = max(1, int(np.floor(s.max_seconds * fps)))
        return int(min(hi, max(lo, round(frames))))

    # -- sampler ----------------------------------------------------------------------

    def _get_sampler(self, key):
        if key in self._samplers:
            return self._samplers[key]
        (seq_len, steps, mode, use_spk, use_cap, has_text_cfg,
         has_spk_cfg, has_cap_cfg, scale_text, scale_spk, scale_cap,
         rescale_k, rescale_sigma, cfg_min_t, cfg_max_t) = key
        dcfg = self.config.dit
        is_dual = use_spk and use_cap
        # single-context "context" scale (IrodoriTTSSampling.swift:122)
        scale_ctx = scale_spk if (is_dual or not use_cap) else scale_cap
        has_ctx_cfg = False if is_dual else (scale_ctx > 0)

        def encode_all(params, text_ids, text_mask, ref_latent, ref_mask,
                       cap_ids, cap_mask):
            text_state = _echo_rms(
                params["text_norm"],
                text_encoder_forward(params["text_encoder"], text_ids,
                                     text_mask, dcfg.text_heads,
                                     dcfg.text_layers, dcfg.norm_eps),
                dcfg.norm_eps)
            spk_state = None
            if use_spk:
                spk_state = _echo_rms(
                    params["speaker_norm"],
                    ref_encoder_forward(params["speaker_encoder"],
                                        ref_latent, ref_mask,
                                        dcfg.speaker_heads,
                                        dcfg.speaker_layers, dcfg.norm_eps),
                    dcfg.norm_eps)
            cap_state = None
            if use_cap:
                cap_state = _echo_rms(
                    params["caption_norm"],
                    text_encoder_forward(params["caption_encoder"], cap_ids,
                                         cap_mask, dcfg.caption_heads_r,
                                         dcfg.caption_layers_r,
                                         dcfg.norm_eps),
                    dcfg.norm_eps)
            return text_state, spk_state, cap_state

        def run(params, text_ids, text_mask, ref_latent, ref_mask, cap_ids,
                cap_mask, noise, t_sched, spk_factors):
            text_state, spk_state, cap_state = encode_all(
                params, text_ids, text_mask, ref_latent, ref_mask, cap_ids,
                cap_mask)
            kv_text = build_kv(params, text_state, "_text", dcfg)
            kv_spk = (build_kv(params, spk_state, "_speaker", dcfg)
                      if use_spk else None)
            kv_cap = (build_kv(params, cap_state, "_caption", dcfg)
                      if use_cap else None)
            zeros2 = jnp.zeros_like(text_mask)
            b = text_ids.shape[0]

            # static bundle layout for independent mode:
            # [cond, text-uncond?, spk/ctx-uncond?, cap-uncond?]
            bundles = [("cond", 1.0)]
            if mode == "independent":
                if is_dual:
                    if has_text_cfg:
                        bundles.append(("text_u", scale_text))
                    if has_spk_cfg:
                        bundles.append(("spk_u", scale_spk))
                    if has_cap_cfg:
                        bundles.append(("cap_u", scale_cap))
                else:
                    if has_text_cfg:
                        bundles.append(("text_u", scale_text))
                    if has_ctx_cfg:
                        bundles.append(("ctx_u", scale_ctx))
            n_b = len(bundles)

            def bundle_masks(which):
                tm = zeros2 if which == "text_u" else text_mask
                sm = cm = None
                if use_spk:
                    sm = jnp.zeros_like(ref_mask) \
                        if which in ("spk_u", "ctx_u") else ref_mask
                if use_cap:
                    drop = which == "cap_u" or (not is_dual
                                                and which == "ctx_u")
                    cm = jnp.zeros_like(cap_mask) if drop else cap_mask
                return tm, sm, cm

            def kv_zero(kv, drop):
                return ((kv[0] * 0.0, kv[1] * 0.0) if drop else kv)

            def step(i, x):
                t = t_sched[i]
                t_next = t_sched[i + 1]
                window = ((cfg_min_t <= t) & (t <= cfg_max_t)).astype(
                    jnp.float32) if (has_text_cfg or has_spk_cfg) else 0.0
                f = spk_factors[i]  # [L] speaker-KV scale this step
                kv_s = ((kv_spk[0] * f[:, None, None, None, None],
                         kv_spk[1] * f[:, None, None, None, None])
                        if use_spk else None)
                tb = jnp.broadcast_to(t, (b,))

                def contexts(which):
                    tm, sm, cm = bundle_masks(which)
                    ctx = [(kv_zero(kv_text, which == "text_u"), tm)]
                    if use_spk:
                        ctx.append((kv_zero(
                            kv_s, which in ("spk_u", "ctx_u")), sm))
                    if use_cap:
                        drop = which == "cap_u" or (not is_dual
                                                    and which == "ctx_u")
                        ctx.append((kv_zero(kv_cap, drop), cm))
                    return ctx

                if mode == "independent" and n_b > 1:
                    x_in = jnp.concatenate([x] * n_b, axis=0)
                    t_in = jnp.concatenate([tb] * n_b, axis=0)
                    merged = []
                    for ci in range(len(contexts("cond"))):
                        ks = jnp.concatenate(
                            [contexts(w)[ci][0][0] for w, _ in bundles],
                            axis=1)
                        vs = jnp.concatenate(
                            [contexts(w)[ci][0][1] for w, _ in bundles],
                            axis=1)
                        ms = jnp.concatenate(
                            [contexts(w)[ci][1] for w, _ in bundles],
                            axis=0)
                        merged.append(((ks, vs), ms))
                    v_out = dit_forward(params, x_in, t_in, merged, dcfg)
                    parts = jnp.split(v_out, n_b, axis=0)
                    v = parts[0]
                    for j, (_, scale) in enumerate(bundles[1:], start=1):
                        v = v + scale * window * (parts[0] - parts[j])
                elif mode == "joint":
                    if is_dual:
                        scales = [s for s, flag in
                                  [(scale_text, has_text_cfg),
                                   (scale_spk, has_spk_cfg),
                                   (scale_cap, has_cap_cfg)] if flag]
                        joint_scale = scales[0] if scales else scale_text
                    elif has_text_cfg:
                        joint_scale = scale_text
                    else:
                        joint_scale = scale_ctx
                    v_cond = dit_forward(params, x, tb, contexts("cond"),
                                         dcfg)
                    # fully-unconditional pass: all contexts dropped
                    tm = zeros2
                    ctx_u = [(kv_zero(kv_text, True), tm)]
                    if use_spk:
                        ctx_u.append((kv_zero(kv_s, True),
                                      jnp.zeros_like(ref_mask)))
                    if use_cap:
                        ctx_u.append((kv_zero(kv_cap, True),
                                      jnp.zeros_like(cap_mask)))
                    v_unc = dit_forward(params, x, tb, ctx_u, dcfg)
                    v = v_cond + joint_scale * window * (v_cond - v_unc)
                elif mode == "alternating":
                    v_cond = dit_forward(params, x, tb, contexts("cond"),
                                         dcfg)
                    if has_text_cfg and has_ctx_cfg:
                        use_text_u = (i % 2) == 0
                    else:
                        use_text_u = jnp.asarray(has_text_cfg)
                    # equal-shape select between the two uncond variants
                    tm = jnp.where(use_text_u, zeros2, text_mask)
                    tk = (kv_text[0]
                          * jnp.where(use_text_u, 0.0, 1.0),
                          kv_text[1] * jnp.where(use_text_u, 0.0, 1.0))
                    ctx_a = [(tk, tm)]
                    if use_spk:
                        sf = jnp.where(use_text_u, 1.0, 0.0)
                        ctx_a.append(((kv_s[0] * sf, kv_s[1] * sf),
                                      jnp.where(use_text_u, ref_mask,
                                                jnp.zeros_like(ref_mask))))
                    if use_cap and not is_dual:
                        cf = jnp.where(use_text_u, 1.0, 0.0)
                        ctx_a.append(((kv_cap[0] * cf, kv_cap[1] * cf),
                                      jnp.where(use_text_u, cap_mask,
                                                jnp.zeros_like(cap_mask))))
                    elif use_cap:
                        ctx_a.append((kv_cap, cap_mask))
                    v_unc = dit_forward(params, x, tb, ctx_a, dcfg)
                    scale = jnp.where(use_text_u, scale_text, scale_ctx)
                    v = v_cond + scale * window * (v_cond - v_unc)
                else:
                    v = dit_forward(params, x, tb, contexts("cond"), dcfg)

                if rescale_k is not None and rescale_sigma is not None:
                    # temporal score rescale
                    # (IrodoriTTSSampling.swift:46-55)
                    one_m = 1.0 - t
                    snr = (one_m * one_m) / jnp.maximum(t * t, 1e-12)
                    ssq = rescale_sigma * rescale_sigma
                    ratio = (snr * ssq + 1.0) / (snr * ssq / rescale_k + 1.0)
                    v_res = (ratio * (one_m * v + x) - x) \
                        / jnp.maximum(one_m, 1e-12)
                    v = jnp.where(t >= 1.0, v, v_res)
                return x + v * (t_next - t)

            return jax.lax.fori_loop(0, steps, step, noise)

        fn = ajit(run)
        self._samplers[key] = fn
        return fn

    # -- generation -------------------------------------------------------------------

    @staticmethod
    def find_silence_point(latent: np.ndarray, window: int = 20,
                           std_threshold: float = 0.05) -> int:
        """First frame where a zero-padded forward window goes quiet
        (irodoriFindSilencePoint, IrodoriTTSModel.swift:420-445)."""
        t, d = latent.shape
        padded = np.concatenate(
            [latent, np.zeros((window, d), latent.dtype)], axis=0)
        for i in range(t):
            win = padded[i:i + window]
            if win.std() < std_threshold and abs(win.mean()) < 0.1:
                return i
        return t

    def generate_waveform(self, text: str, caption: str | None = None,
                          ref_audio=None, seed: int = 0,
                          seconds_override: float | None = None,
                          num_steps: int | None = None) -> np.ndarray:
        """text (+VoiceDesign caption / reference clone) -> waveform
        (IrodoriTTSModel.swift:183-272)."""
        cfg = self.config
        dcfg = cfg.dit
        s = cfg.sampler
        if self.dacvae is None:
            raise AudioGenerationError("Irodori requires the DACVAE codec")
        text_ids, text_mask = self.prepare_text(text)
        cap_ids = cap_mask = None
        if dcfg.use_caption_condition:
            cap_ids, cap_mask = self.prepare_caption(
                caption or DEFAULT_CAPTION)
        if ref_audio is not None:
            ref_latent, ref_mask = self.encode_ref_audio(ref_audio)
        else:
            ref_latent = np.zeros((1, 1, dcfg.latent_dim), np.float32)
            ref_mask = np.zeros((1, 1), bool)
        # speaker patching + bucketing on the host (static shapes into the
        # jit; padded frames are mask-false and zeroed inside the encoder)
        ref_latent_p, ref_mask_p = patch_sequence(
            np.asarray(ref_latent), np.asarray(ref_mask),
            dcfg.speaker_patch_size)
        pad = (-ref_latent_p.shape[1]) % 64
        if pad:
            ref_latent_p = np.pad(ref_latent_p, ((0, 0), (0, pad), (0, 0)))
            ref_mask_p = np.pad(ref_mask_p, ((0, 0), (0, pad)))

        latent_steps = self.compute_latent_steps(
            text, text_ids, text_mask, ref_latent_p, ref_mask_p, cap_ids,
            cap_mask, seconds_override)
        patched = int(np.ceil(latent_steps / dcfg.latent_patch_size))
        seq_len = max(_SEQ_BUCKET,
                      -(-patched // _SEQ_BUCKET) * _SEQ_BUCKET)

        steps = num_steps or s.num_steps
        init_scale = 0.999
        sched = t_schedule(steps, init_scale, s.t_schedule_mode,
                           s.sway_coeff)
        # per-step speaker-KV scale factors, rolled back below min_t
        # (IrodoriTTSSampling.swift:27-43,419-431)
        n_scaled = (s.speaker_kv_max_layers
                    if s.speaker_kv_max_layers is not None
                    else dcfg.num_layers)
        factors = np.ones((steps, dcfg.num_layers), np.float32)
        if s.speaker_kv_scale is not None:
            min_t = s.speaker_kv_min_t if s.speaker_kv_min_t is not None \
                else -1.0
            for i in range(steps):
                if sched[i] >= min_t:
                    factors[i, :n_scaled] = s.speaker_kv_scale

        mode = s.cfg_guidance_mode.strip().lower()
        key = (seq_len, steps, mode, dcfg.use_speaker,
               dcfg.use_caption_condition, s.cfg_scale_text > 0,
               s.cfg_scale_speaker > 0 and dcfg.use_speaker,
               s.cfg_scale_caption > 0 and dcfg.use_caption_condition,
               float(s.cfg_scale_text), float(s.cfg_scale_speaker),
               float(s.cfg_scale_caption), s.rescale_k, s.rescale_sigma,
               float(s.cfg_min_t), float(s.cfg_max_t))
        sampler = self._get_sampler(key)

        rng = jax.random.PRNGKey(seed)
        noise = jax.random.normal(
            rng, (1, seq_len, dcfg.patched_latent_dim), jnp.float32)
        if s.truncation_factor is not None:
            noise = noise * s.truncation_factor
        if cap_ids is None:
            cap_in = jnp.zeros((1, 1), jnp.int32)
            cap_m = jnp.zeros((1, 1), bool)
        else:
            cap_in, cap_m = jnp.asarray(cap_ids), jnp.asarray(cap_mask)
        latent = np.asarray(sampler(
            self.params, jnp.asarray(text_ids), jnp.asarray(text_mask),
            jnp.asarray(ref_latent_p, self.dtype), jnp.asarray(ref_mask_p),
            cap_in, cap_m, noise, jnp.asarray(sched),
            jnp.asarray(factors)))[0]

        latent = latent[:patched].reshape(-1, dcfg.latent_dim)[:latent_steps]
        wav = np.asarray(self.dacvae.decode(latent[None]))[0, :, 0]
        silence = self.find_silence_point(latent)
        trim = min(silence * cfg.audio_downsample_factor,
                   latent_steps * cfg.audio_downsample_factor, len(wav))
        return wav[:trim] if trim > 0 else wav[:0]

    def generate(self, text: str, voice: str | None = None, ref_audio=None,
                 ref_text=None, language=None,
                 generation_parameters: AudioGenerateParameters | None = None
                 ) -> np.ndarray:
        gp = generation_parameters or self.default_generation_parameters()
        return self.generate_waveform(text, caption=voice,
                                      ref_audio=ref_audio,
                                      seed=gp.seed or 0)

    def generate_stream(self, text: str, **kw):
        t0 = time.perf_counter()
        wav = self.generate(text, **kw)
        yield AudioGeneration.from_audio(wav)
        yield AudioGeneration.from_info(AudioGenerationInfo(
            generate_time=time.perf_counter() - t0,
            audio_duration=len(wav) / self.sample_rate))
