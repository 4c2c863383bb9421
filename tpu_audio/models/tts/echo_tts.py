"""EchoTTS: DiT latent diffusion TTS with dual independent CFG over a
FishS1DAC + PCA latent space.

TPU-first rebuild of the reference
(Sources/MLXAudioTTS/Models/EchoTTS/*): a byte-level text encoder and a
causal patched speaker-latent encoder produce per-layer cross-attention
K/V caches (EchoDiT.swift:674-709); the DiT denoises a fixed-length latent
sequence with gated joint attention (self + latent-prefix + text +
speaker K/V, EchoDiT.swift:195-348), low-rank adaLN conditioning
(EchoDiT.swift:70-101) and an Euler sampler with INDEPENDENT text and
speaker guidance scales applied only inside [cfg_min_t, cfg_max_t]
(EchoTTSSampling.swift:41-144). Latents map to audio through a PCA basis
over FishS1DAC's continuous quantized z_q space (EchoTTSAudio.swift:42-61).

TPU design deltas: each Euler step is one jitted call on a fixed-shape
batch (the CFG-active steps run the 3x batch [cond, text-uncond,
speaker-uncond]); per-layer K/V caches are precomputed as stacked arrays.
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

from tpu_audio.codecs.fish_s1_dac import FishS1DAC
from tpu_audio.core import hub, loading, nn
from tpu_audio.core.generation import (
    AudioGenerateParameters,
    AudioGeneration,
    AudioGenerationError,
    AudioGenerationInfo,
)
from tpu_audio.core.jitting import ajit

__all__ = ["EchoTTS", "EchoTTSConfig", "normalize_text_prompt"]


@dataclass
class EchoDiTConfig:
    """EchoTTSConfig.swift:23-60."""

    latent_size: int = 80
    model_size: int = 2048
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 5888
    norm_eps: float = 1e-5
    text_vocab_size: int = 256
    text_model_size: int = 1280
    text_num_layers: int = 14
    text_num_heads: int = 10
    text_intermediate_size: int = 3328
    speaker_patch_size: int = 4
    speaker_model_size: int = 1280
    speaker_num_layers: int = 14
    speaker_num_heads: int = 10
    speaker_intermediate_size: int = 3328
    timestep_embed_size: int = 512
    adaln_rank: int = 256

    @classmethod
    def from_dict(cls, d: dict) -> "EchoDiTConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass
class EchoSamplerConfig:
    """EchoTTSConfig.swift:99-126."""

    num_steps: int = 40
    cfg_scale_text: float = 3.0
    cfg_scale_speaker: float = 8.0
    cfg_min_t: float = 0.5
    cfg_max_t: float = 1.0
    truncation_factor: float | None = None
    rescale_k: float | None = None
    rescale_sigma: float | None = None
    speaker_kv_scale: float | None = None
    speaker_kv_max_layers: int | None = None
    speaker_kv_min_t: float | None = None
    sequence_length: int = 640

    @classmethod
    def from_dict(cls, d: dict) -> "EchoSamplerConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass
class EchoTTSConfig:
    dit: EchoDiTConfig = field(default_factory=EchoDiTConfig)
    sampler: EchoSamplerConfig = field(default_factory=EchoSamplerConfig)
    sample_rate: int = 44100
    audio_downsample_factor: int = 2048
    max_text_length: int = 768
    max_speaker_latent_length: int = 6400
    normalize_text: bool = True
    delete_blockwise_modules: bool = False
    pca_filename: str = "pca_state.safetensors"
    fish_codec_repo: str = ""

    @classmethod
    def from_dict(cls, d: dict) -> "EchoTTSConfig":
        keys = set(cls.__dataclass_fields__) - {"dit", "sampler"}
        kw = {k: v for k, v in d.items() if k in keys}
        return cls(dit=EchoDiTConfig.from_dict(d.get("dit") or {}),
                   sampler=EchoSamplerConfig.from_dict(d.get("sampler")
                                                       or {}), **kw)


# ---------------------------------------------------------------------------
# Text frontend (EchoTTSText.swift)
# ---------------------------------------------------------------------------


def normalize_text_prompt(text: str) -> str:
    for old, new in (("…", "..."), ("’", "'"), ("“", '"'), ("”", '"'),
                     ("\n", " "), (":", ","), (";", ","), ("—", ", ")):
        text = text.replace(old, new)
    if not text.startswith(("[", "(")) and "S1" not in text \
            and "S2" not in text:
        text = "[S1] " + text
    return text


def encode_text(text: str, max_length: int, normalize: bool = True
                ) -> tuple[np.ndarray, np.ndarray]:
    """utf-8 bytes + BOS 0 -> (ids [1, T], mask [1, T])."""
    if normalize:
        text = normalize_text_prompt(text)
    tokens = [0] + list(text.encode("utf-8"))
    tokens = tokens[:max_length]
    ids = np.asarray([tokens], np.int32)
    return ids, np.ones_like(ids, bool)


# ---------------------------------------------------------------------------
# DiT modules
# ---------------------------------------------------------------------------


def _freqs_cis(dim: int, end: int, theta: float = 10000.0):
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    ang = np.arange(end, dtype=np.float32)[:, None] * freqs[None]
    return jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))


def _apply_rotary(x, cos, sin):
    """x [B, T, H, D] interleaved even/odd rotation
    (echoTtsApplyRotaryEmb, EchoDiT.swift:21-30)."""
    xe, xo = x[..., 0::2], x[..., 1::2]
    cos = cos[None, :, None]
    sin = sin[None, :, None]
    re = xe * cos - xo * sin
    ro = xo * cos + xe * sin
    return jnp.stack([re, ro], axis=-1).reshape(x.shape).astype(x.dtype)


def _rotary_half_heads(x, cos, sin):
    """Rotary on the first half of the heads only (EchoDiT.swift:248-253)."""
    half = x.shape[2] // 2
    return jnp.concatenate([_apply_rotary(x[:, :, :half], cos, sin),
                            x[:, :, half:]], axis=2)


def _echo_rms(p, x, eps):
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt((xf * xf).mean(-1, keepdims=True) + eps)
    return (normed * p["weight"].astype(jnp.float32)).astype(x.dtype)


def _timestep_embedding(t, size: int):
    half = size // 2
    freqs = 1000.0 * jnp.exp(-math.log(10000.0)
                             * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _echo_mlp(p, x):
    return nn.linear(p["w2"], nn.silu(nn.linear(p["w1"], x))
                     * nn.linear(p["w3"], x))


def _self_attention(p, x, mask, cos, sin, n_heads: int, causal: bool,
                    eps: float):
    """Gated self-attention (EchoSelfAttention, EchoDiT.swift:123-193)."""
    b, t, d = x.shape
    hd = d // n_heads
    q = nn.linear(p["wq"], x).reshape(b, t, n_heads, hd)
    k = nn.linear(p["wk"], x).reshape(b, t, n_heads, hd)
    v = nn.linear(p["wv"], x).reshape(b, t, n_heads, hd)
    gate = nn.linear(p["gate"], x)
    q = _echo_rms(p["q_norm"], q, eps)
    k = _echo_rms(p["k_norm"], k, eps)
    q = _apply_rotary(q, cos[:t], sin[:t])
    k = _apply_rotary(k, cos[:t], sin[:t])
    attn_mask = None
    if mask is not None:
        attn_mask = mask[:, None, None, :]
    if causal:
        cmask = jnp.tril(jnp.ones((t, t), bool))[None, None]
        attn_mask = cmask if attn_mask is None else (attn_mask & cmask)
    o = nn.sdpa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), mask=attn_mask)
    o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
    return nn.linear(p["wo"], o * jax.nn.sigmoid(gate))


def _encoder_block(p, x, mask, cos, sin, n_heads, causal, eps):
    h = x + _self_attention(p["attention"],
                            _echo_rms(p["attention_norm"], x, eps), mask,
                            cos, sin, n_heads, causal, eps)
    return h + _echo_mlp(p["mlp"], _echo_rms(p["mlp_norm"], h, eps))


def text_encoder_forward(p, ids, mask, cfg: EchoDiTConfig):
    x = nn.embedding(p["text_embedding"], ids)
    hd = cfg.text_model_size // cfg.text_num_heads
    cos, sin = _freqs_cis(hd, ids.shape[1])
    for i in range(cfg.text_num_layers):
        x = _encoder_block(p["blocks"][str(i)], x, mask, cos, sin,
                           cfg.text_num_heads, False, cfg.norm_eps)
    return x


def speaker_encoder_forward(p, latent, cfg: EchoDiTConfig):
    """Causal patched encoder (EchoSpeakerEncoder, EchoDiT.swift:494-540)."""
    ps = cfg.speaker_patch_size
    t = (latent.shape[1] // ps) * ps
    x = latent[:, :t].reshape(latent.shape[0], t // ps,
                              latent.shape[2] * ps)
    x = nn.linear(p["in_proj"], x) / 6.0
    hd = cfg.speaker_model_size // cfg.speaker_num_heads
    cos, sin = _freqs_cis(hd, max(x.shape[1], 1))
    for i in range(cfg.speaker_num_layers):
        x = _encoder_block(p["blocks"][str(i)], x, None, cos, sin,
                           cfg.speaker_num_heads, True, cfg.norm_eps)
    return x


def _low_rank_adaln(p, x, cond, eps):
    """(EchoLowRankAdaLN, EchoDiT.swift:70-101). cond [B, 1, 3*D]."""
    shift_c, scale_c, gate_c = jnp.split(cond, 3, axis=-1)
    shift = nn.linear(p["shift_up"], nn.linear(
        p["shift_down"], nn.silu(shift_c))) + shift_c
    scale = nn.linear(p["scale_up"], nn.linear(
        p["scale_down"], nn.silu(scale_c))) + scale_c
    gate = jnp.tanh(nn.linear(p["gate_up"], nn.linear(
        p["gate_down"], nn.silu(gate_c))) + gate_c)
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt((xf * xf).mean(-1, keepdims=True) + eps)
    return (normed * (scale + 1) + shift).astype(x.dtype), gate


def _joint_attention(p, x, text_mask, speaker_mask, cos, sin, kv_text,
                     kv_speaker, cfg: EchoDiTConfig, start_pos=0,
                     kv_latent=None, latent_mask=None):
    """Self + latent-prefix + text + speaker K/V joint attention
    (EchoJointAttention, EchoDiT.swift:255-318)."""
    b, t, d = x.shape
    n_heads = cfg.num_heads
    hd = d // n_heads
    q = nn.linear(p["wq"], x).reshape(b, t, n_heads, hd)
    k = nn.linear(p["wk"], x).reshape(b, t, n_heads, hd)
    v = nn.linear(p["wv"], x).reshape(b, t, n_heads, hd)
    gate = nn.linear(p["gate"], x)
    q = _echo_rms(p["q_norm"], q, cfg.norm_eps)
    k = _echo_rms(p["k_norm"], k, cfg.norm_eps)
    qcos = cos[start_pos: start_pos + t]
    qsin = sin[start_pos: start_pos + t]
    q = _rotary_half_heads(q, qcos, qsin)
    k = _rotary_half_heads(k, qcos, qsin)

    pieces_k = [k]
    pieces_v = [v]
    masks = [jnp.ones((b, t), bool)]
    if kv_latent is not None:
        pieces_k.append(kv_latent[0])
        pieces_v.append(kv_latent[1])
        masks.append(latent_mask)
    pieces_k += [kv_text[0], kv_speaker[0]]
    pieces_v += [kv_text[1], kv_speaker[1]]
    masks += [text_mask, speaker_mask]
    keys = jnp.concatenate(pieces_k, axis=1)
    values = jnp.concatenate(pieces_v, axis=1)
    full_mask = jnp.concatenate(masks, axis=1)

    o = nn.sdpa(q.transpose(0, 2, 1, 3), keys.transpose(0, 2, 1, 3),
                values.transpose(0, 2, 1, 3),
                mask=full_mask[:, None, None, :])
    o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
    return nn.linear(p["wo"], o * jax.nn.sigmoid(gate))


def dit_forward(p, x, t, text_mask, speaker_mask, kv_text, kv_speaker,
                cfg: EchoDiTConfig, start_pos=0, kv_latent=None,
                latent_mask=None):
    """Denoiser: x [B, T, latent], t [B] -> prediction [B, T, latent]
    (EchoDiT.callAsFunction, EchoDiT.swift:640-672). kv_text/kv_speaker are
    per-layer stacked [L, B, T', H, D] key/value arrays."""
    hd = cfg.model_size // cfg.num_heads
    cos, sin = _freqs_cis(hd, start_pos + x.shape[1])
    sp_patch_mask = speaker_mask[:, ::cfg.speaker_patch_size]

    temb = _timestep_embedding(t, cfg.timestep_embed_size)
    cm = p["cond_module"]
    cond = nn.linear(cm["4"], nn.silu(nn.linear(
        cm["2"], nn.silu(nn.linear(cm["0"], temb)))))[:, None]

    h = nn.linear(p["in_proj"], x)
    for i in range(cfg.num_layers):
        bp = p["blocks"][str(i)]
        a_in, a_gate = _low_rank_adaln(bp["attention_adaln"], h, cond,
                                       cfg.norm_eps)
        kvl = None
        if kv_latent is not None:
            kvl = (kv_latent[0][i], kv_latent[1][i])
        attended = _joint_attention(
            bp["attention"], a_in, text_mask, sp_patch_mask, cos, sin,
            (kv_text[0][i], kv_text[1][i]),
            (kv_speaker[0][i], kv_speaker[1][i]), cfg, start_pos, kvl,
            latent_mask)
        h = h + a_gate * attended
        m_in, m_gate = _low_rank_adaln(bp["mlp_adaln"], h, cond,
                                       cfg.norm_eps)
        h = h + m_gate * _echo_mlp(bp["mlp"], m_in)
    return nn.linear(p["out_proj"],
                     _echo_rms(p["out_norm"], h,
                               cfg.norm_eps)).astype(jnp.float32)


def get_kv_cache(p, state, proj_k: str, proj_v: str, cfg: EchoDiTConfig,
                 rotary_positions=None):
    """Per-layer stacked K/V from an encoder state
    (getKVCacheText/Speaker/Latent, EchoDiT.swift:674-709)."""
    b, t, _ = state.shape
    hd = cfg.model_size // cfg.num_heads
    ks, vs = [], []
    for i in range(cfg.num_layers):
        ap = p["blocks"][str(i)]["attention"]
        k = nn.linear(ap[proj_k], state).reshape(b, t, cfg.num_heads, hd)
        k = _echo_rms(ap["k_norm"], k, cfg.norm_eps)
        if rotary_positions is not None:
            cos, sin = rotary_positions
            k = _rotary_half_heads(k, cos, sin)
        v = nn.linear(ap[proj_v], state).reshape(b, t, cfg.num_heads, hd)
        ks.append(k)
        vs.append(v)
    return jnp.stack(ks), jnp.stack(vs)


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


class EchoTTS:
    def __init__(self, config: EchoTTSConfig, params,
                 codec: FishS1DAC | None = None,
                 pca_components=None, pca_mean=None,
                 latent_scale: float = 1.0, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.codec = codec
        self.pca_components = pca_components  # [latent, zq_dim]
        self.pca_mean = pca_mean              # [zq_dim]
        self.latent_scale = latent_scale
        self.dtype = dtype
        self.sample_rate = config.sample_rate
        cfg = config.dit
        self._denoise = ajit(functools.partial(dit_forward, cfg=cfg),
                                static_argnames=("start_pos",))
        self._text_kv = ajit(self._text_kv_impl)
        self._speaker_kv = ajit(self._speaker_kv_impl)

    def default_generation_parameters(self) -> AudioGenerateParameters:
        return AudioGenerateParameters(
            max_tokens=self.config.sampler.sequence_length, temperature=0.0)

    @classmethod
    def from_pretrained(cls, repo_or_path: str,
                        dtype=jnp.float32) -> "EchoTTS":
        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = EchoTTSConfig.from_dict(hub.load_config(model_dir))

        def sanitize(w):
            out = {}
            for k, v in w.items():
                if k in ("pca_components", "pca_mean", "latent_scale"):
                    continue
                if k.startswith("model."):
                    k = k[len("model."):]
                if config.delete_blockwise_modules and (
                        k.startswith(("latent_encoder.", "latent_norm."))
                        or ".wk_latent." in k or ".wv_latent." in k):
                    continue
                out[k] = v
            return out

        params = loading.load_params(
            model_dir, dtype=dtype, sanitize=sanitize,
            exclude_files=(config.pca_filename,))
        pca = model_dir / config.pca_filename
        pca_components = pca_mean = None
        latent_scale = 1.0
        if pca.exists():
            w = loading.load_safetensors_file(pca)
            pca_components = jnp.asarray(w["pca_components"])
            pca_mean = jnp.asarray(w["pca_mean"])
            latent_scale = float(np.asarray(w["latent_scale"]).reshape(-1)[0])
        codec = None
        codec_src = (str(model_dir / "codec") if
                     (model_dir / "codec").is_dir()
                     else config.fish_codec_repo)
        if codec_src:
            try:
                codec = FishS1DAC.from_pretrained(codec_src)
            except Exception:
                codec = None
        return cls(config, params, codec, pca_components, pca_mean,
                   latent_scale, dtype)

    # -- PCA latent space (EchoTTSAudio.swift:42-61) ------------------------------

    def ae_encode(self, audio: np.ndarray) -> jnp.ndarray:
        """waveform -> PCA latents [1, T', latent_size]."""
        zq = self.codec.encode_zq(audio).astype(jnp.float32)
        centered = zq - self.pca_mean
        return (centered @ self.pca_components.T) * self.latent_scale

    def ae_decode(self, latent) -> np.ndarray:
        """PCA latents [B, T', latent_size] -> waveform [B, T]."""
        restored = (jnp.asarray(latent, jnp.float32) / self.latent_scale
                    ) @ self.pca_components + self.pca_mean
        wav = self.codec.decode_zq(restored)
        return np.asarray(wav)[..., 0]

    # -- speaker conditioning ------------------------------------------------------

    def speaker_latent(self, audio: np.ndarray):
        """Reference audio -> (latent [1, T, D], mask [1, T])
        (echoTtsGetSpeakerLatentAndMask, EchoTTSAudio.swift:94-159)."""
        cfg = self.config
        ds = cfg.audio_downsample_factor
        chunk = 640 * ds
        audio = np.asarray(audio, np.float32).reshape(-1)
        audio = audio[: cfg.max_speaker_latent_length * ds]
        chunks = []
        for s in range(0, len(audio), chunk):
            piece = audio[s: s + chunk]
            piece = np.pad(piece, (0, chunk - len(piece)))
            chunks.append(np.asarray(self.ae_encode(piece)))
        if not chunks:
            return (np.zeros((1, 0, cfg.dit.latent_size), np.float32),
                    np.zeros((1, 0), bool))
        latent = np.concatenate(chunks, axis=1)
        actual = len(audio) // ds
        mask = np.arange(latent.shape[1])[None] < actual
        latent = latent[:, :actual]
        mask = mask[:, :actual]
        ps = cfg.dit.speaker_patch_size
        limit = (latent.shape[1] // ps) * ps
        return latent[:, :limit], mask[:, :limit]

    # -- sampling -------------------------------------------------------------------

    def _text_kv_impl(self, params, ids, mask):
        state = text_encoder_forward(params["text_encoder"], ids, mask,
                                     self.config.dit)
        state = _echo_rms(params["text_norm"], state,
                          self.config.dit.norm_eps)
        return get_kv_cache(params, state, "wk_text", "wv_text",
                            self.config.dit)

    def _speaker_kv_impl(self, params, latent):
        state = speaker_encoder_forward(params["speaker_encoder"], latent,
                                        self.config.dit)
        state = _echo_rms(params["speaker_norm"], state,
                          self.config.dit.norm_eps)
        return get_kv_cache(params, state, "wk_speaker", "wv_speaker",
                            self.config.dit)

    def generate_latents(self, text: str, speaker_latent=None,
                         speaker_mask=None, seed: int = 0,
                         num_steps: int | None = None,
                         sequence_length: int | None = None) -> np.ndarray:
        """Euler sampler with independent text/speaker CFG
        (echoTtsSampleEulerCFGIndependentGuidances,
        EchoTTSSampling.swift:41-144)."""
        cfg = self.config
        sp = cfg.sampler
        dit = cfg.dit
        ids, tmask = encode_text(text, cfg.max_text_length,
                                 cfg.normalize_text)
        if speaker_latent is None:
            speaker_latent = np.zeros((1, dit.speaker_patch_size,
                                       dit.latent_size), np.float32)
            speaker_mask = np.zeros((1, dit.speaker_patch_size), bool)
        steps = num_steps or sp.num_steps
        seq_len = sequence_length or sp.sequence_length

        params = self.params
        ids_j = jnp.asarray(ids)
        tmask_j = jnp.asarray(tmask)
        smask_j = jnp.asarray(speaker_mask)
        kv_text = self._text_kv(params, ids_j, tmask_j)
        kv_speaker = self._speaker_kv(
            params, jnp.asarray(speaker_latent, self.dtype))
        if sp.speaker_kv_scale:
            lim = sp.speaker_kv_max_layers or dit.num_layers
            scale = jnp.ones((dit.num_layers, 1, 1, 1, 1))
            scale = scale.at[:lim].set(sp.speaker_kv_scale)
            kv_speaker_scaled = (kv_speaker[0] * scale,
                                 kv_speaker[1] * scale)
        else:
            kv_speaker_scaled = kv_speaker

        def triple(kv):
            return (jnp.concatenate([kv[0]] * 3, axis=1),
                    jnp.concatenate([kv[1]] * 3, axis=1))

        kv_text3 = triple(kv_text)
        tmask3 = jnp.concatenate([tmask_j, jnp.zeros_like(tmask_j),
                                  tmask_j], axis=0)
        smask3 = jnp.concatenate([smask_j, smask_j,
                                  jnp.zeros_like(smask_j)], axis=0)

        rng = jax.random.PRNGKey(seed)
        x = jax.random.normal(rng, (1, seq_len, dit.latent_size))
        x = x * (sp.truncation_factor or 0.96)

        schedule = np.linspace(0.999, 0.0, steps + 1, dtype=np.float32)
        kv_sp_current = kv_speaker_scaled
        kv_sp3 = triple(kv_sp_current)
        for step in range(steps):
            t = float(schedule[step])
            t_next = float(schedule[step + 1])
            has_cfg = sp.cfg_min_t <= t <= sp.cfg_max_t
            if has_cfg:
                x3 = jnp.concatenate([x] * 3, axis=0)
                out = self._denoise(params, x3.astype(self.dtype),
                                    jnp.full((3,), t), tmask3, smask3,
                                    kv_text3, kv_sp3)
                c, ut, us = jnp.split(out, 3, axis=0)
                pred = (c + sp.cfg_scale_text * (c - ut)
                        + sp.cfg_scale_speaker * (c - us))
            else:
                pred = self._denoise(params, x.astype(self.dtype),
                                     jnp.full((1,), t), tmask_j, smask_j,
                                     kv_text, kv_sp_current)
            if sp.rescale_k is not None and sp.rescale_sigma is not None \
                    and t < 1:
                snr = (1 - t) ** 2 / t ** 2
                ratio = ((snr * sp.rescale_sigma ** 2 + 1)
                         / ((snr * sp.rescale_sigma ** 2 / sp.rescale_k)
                            + 1))
                pred = (1 / (1 - t)) * (ratio * ((1 - t) * pred + x) - x)
            if (sp.speaker_kv_scale and sp.speaker_kv_min_t is not None
                    and t_next < sp.speaker_kv_min_t <= t):
                kv_sp_current = kv_speaker
                kv_sp3 = triple(kv_sp_current)
            x = x + pred * (t_next - t)
        return np.asarray(x)

    # -- audio post (EchoTTSAudio.swift:63-92) --------------------------------------

    @staticmethod
    def find_flattening_point(latent: np.ndarray, window: int = 20,
                              std_threshold: float = 0.05) -> int:
        """First window where the latent flattens to ~0 (end of speech)."""
        data = np.asarray(latent, np.float32)
        padded = np.concatenate([data, np.zeros((window, data.shape[1]),
                                                np.float32)])
        for start in range(max(padded.shape[0] - window, 0)):
            win = padded[start: start + window]
            if win.std() < std_threshold and abs(win.mean()) < 0.1:
                return start
        return data.shape[0]

    # -- public API ------------------------------------------------------------------

    def generate(self, text: str, voice: str | None = None, ref_audio=None,
                 ref_text: str | None = None, language: str | None = None,
                 generation_parameters: AudioGenerateParameters | None = None
                 ) -> np.ndarray:
        del voice, ref_text, language
        gp = generation_parameters or self.default_generation_parameters()
        if self.codec is None or self.pca_components is None:
            raise AudioGenerationError("FishS1DAC codec / PCA not loaded")
        sl = sm = None
        if ref_audio is not None:
            ref = np.asarray(ref_audio, np.float32)
            if ref.ndim > 1:
                ref = ref.mean(axis=0) if ref.shape[0] <= 8 \
                    else ref.reshape(-1)
            sl, sm = self.speaker_latent(ref)
            if sl.shape[1] == 0:
                sl = sm = None
        latents = self.generate_latents(
            text, sl, sm, seed=gp.seed or 0,
            sequence_length=gp.max_tokens or None)
        wav = self.ae_decode(latents)[0]
        flat = self.find_flattening_point(latents[0])
        return wav[: flat * self.config.audio_downsample_factor]

    def generate_stream(self, text: str, voice: str | None = None,
                        ref_audio=None, ref_text: str | None = None,
                        language: str | None = None,
                        generation_parameters: AudioGenerateParameters
                        | None = None):
        t0 = time.perf_counter()
        audio = self.generate(text, voice, ref_audio, ref_text, language,
                              generation_parameters)
        yield AudioGeneration.from_audio(audio)
        yield AudioGeneration.from_info(AudioGenerationInfo(
            generate_time=time.perf_counter() - t0,
            audio_duration=len(audio) / self.sample_rate))
