"""Chatterbox TTS: two-stage T3 (text -> speech tokens) + S3Gen (tokens ->
waveform), with voice cloning from reference audio.

TPU-first rebuild of the reference
(Sources/MLXAudioTTS/Models/Chatterbox/*): stage 1 is T3 — a Llama 520M
(Regular, with classifier-free guidance) or GPT-2 Medium (Turbo) backbone
over [conditioning | text | BOS] embeddings emitting speech tokens
(T3Model.swift:367-485, T3GPT2Model.swift:274-358); conditioning packs a
voice-encoder speaker embedding, perceiver-resampled prompt speech tokens,
and an emotion scalar (T3CondEnc.swift:83-130). Stage 2 is the shared
S3Gen stack (tpu_audio.codecs.s3gen).

TPU design deltas:
- The T3 decode (backbone step + CFG combine + repetition penalty +
  temperature/top-k/min-p/top-p sampling + EOS stop) runs as ONE jitted
  ``lax.while_loop``; the reference syncs the host every token
  (T3Model.swift:425-475). The repetition penalty over the full history
  uses an on-device per-vocab "seen" mask instead of a host-side Set
  (applyRepetitionPenalty, T3Model.swift:501-520).
- Loudness normalization approximates -27 LUFS with ungated RMS loudness
  (no K-weighting filter), which is within a fraction of a dB for speech.
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

from tpu_audio.codecs import s3gen as s3gen_mod
from tpu_audio.core import dsp, hub, kv_cache, loading, nn
from tpu_audio.core.generation import (
    AudioGenerateParameters,
    AudioGeneration,
    AudioGenerationError,
    AudioGenerationInfo,
)
from tpu_audio.models import llama
from tpu_audio.core.jitting import ajit

__all__ = ["Chatterbox", "ChatterboxConfig", "T3Config"]

S3_SR = 16000
S3GEN_SR = 24000
S3GEN_SIL = 4299


# ---------------------------------------------------------------------------
# Configs (ChatterboxConfig.swift)
# ---------------------------------------------------------------------------


LLAMA_520M = dict(
    vocab_size=4000, hidden_size=1024, num_hidden_layers=30,
    intermediate_size=4096, num_attention_heads=16, num_key_value_heads=16,
    head_dim=64, rms_norm_eps=1e-5, rope_theta=500000.0,
    rope_scaling={"rope_type": "llama3", "factor": 8.0,
                  "high_freq_factor": 4.0, "low_freq_factor": 1.0,
                  "original_max_position_embeddings": 8192},
    tie_word_embeddings=False)


@dataclass
class GPT2Config:
    hidden_size: int = 1024
    n_head: int = 16
    n_layer: int = 24
    n_ctx: int = 8196
    vocab_size: int = 50276
    layer_norm_epsilon: float = 1e-5

    @classmethod
    def from_dict(cls, d: dict) -> "GPT2Config":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass
class T3Config:
    """T3Configuration (ChatterboxConfig.swift:138-248)."""

    text_tokens_dict_size: int = 704
    start_text_token: int = 255
    stop_text_token: int = 0
    max_text_tokens: int = 2048
    speech_tokens_dict_size: int = 8194
    start_speech_token: int = 6561
    stop_speech_token: int = 6562
    max_speech_tokens: int = 4096
    input_pos_emb: str | None = "learned"
    speech_cond_prompt_len: int = 150
    speaker_embed_size: int = 256
    use_perceiver_resampler: bool = True
    emotion_adv: bool = True

    @classmethod
    def from_dict(cls, d: dict) -> "T3Config":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass
class ChatterboxConfig:
    model_type: str = "chatterbox"
    t3: T3Config = field(default_factory=T3Config)
    llama: llama.LlamaConfig = field(
        default_factory=lambda: llama.LlamaConfig.from_dict(LLAMA_520M))
    gpt2: GPT2Config = field(default_factory=GPT2Config)
    s3gen_sr: int = S3GEN_SR
    enc_cond_len: int = 6 * S3_SR
    dec_cond_len: int = 10 * S3GEN_SR
    meanflow: bool = False
    decoder_in_channels: int = 320
    quantization: dict | None = None
    # tiny-config overrides for the S3Gen stack (tests; real checkpoints
    # use the defaults)
    s3gen_conformer: dict = field(default_factory=dict)
    s3gen_hift: dict = field(default_factory=dict)
    s3gen_n_mels: int = 80
    s3gen_campplus: dict = field(default_factory=dict)

    @property
    def is_turbo(self) -> bool:
        return self.model_type == "chatterbox_turbo" or self.meanflow

    @classmethod
    def from_dict(cls, d: dict) -> "ChatterboxConfig":
        model_type = d.get("model_type", "chatterbox")
        turbo = model_type == "chatterbox_turbo" or d.get("meanflow", False)
        t3_dict = d.get("t3_config") or d.get("t3") or {}
        if turbo and not t3_dict:
            t3_dict = dict(text_tokens_dict_size=50276,
                           speech_tokens_dict_size=6563,
                           input_pos_emb=None, speech_cond_prompt_len=375,
                           use_perceiver_resampler=False, emotion_adv=False)
        t3 = T3Config.from_dict(t3_dict)
        return cls(
            model_type=model_type, t3=t3,
            llama=llama.LlamaConfig.from_dict(
                {**LLAMA_520M, **(d.get("llama_config") or {})}),
            gpt2=GPT2Config.from_dict(d.get("gpt2") or {}),
            s3gen_sr=d.get("s3gen_sr", S3GEN_SR),
            enc_cond_len=d.get("enc_cond_len", 6 * S3_SR),
            dec_cond_len=d.get("dec_cond_len", 10 * S3GEN_SR),
            meanflow=d.get("meanflow", turbo),
            decoder_in_channels=d.get("decoder_in_channels", 320),
            quantization=d.get("quantization")
            or d.get("quantization_config"),
            s3gen_conformer=d.get("s3gen_conformer") or {},
            s3gen_hift=d.get("s3gen_hift") or {},
            s3gen_n_mels=d.get("s3gen_n_mels", 80),
            s3gen_campplus=d.get("s3gen_campplus") or {})


# ---------------------------------------------------------------------------
# Audio preprocessing helpers
# ---------------------------------------------------------------------------


def normalize_loudness(audio: np.ndarray, target_lufs: float = -27.0
                       ) -> np.ndarray:
    """Approximate LUFS normalization via ungated RMS loudness."""
    rms = float(np.sqrt(np.mean(audio.astype(np.float64) ** 2)) + 1e-12)
    lufs = -0.691 + 20.0 * math.log10(rms)
    gain = 10.0 ** ((target_lufs - lufs) / 20.0)
    return (audio * gain).astype(np.float32)


def trim_silence(audio: np.ndarray, top_db: float = 20.0,
                 frame: int = 2048, hop: int = 512) -> np.ndarray:
    """librosa.effects.trim-style edge trimming."""
    audio = np.asarray(audio, np.float32)
    if len(audio) < frame:
        return audio
    n = 1 + (len(audio) - frame) // hop
    idx = np.arange(n)[:, None] * hop + np.arange(frame)[None, :]
    rms = np.sqrt((audio[idx] ** 2).mean(axis=1))
    ref = rms.max() + 1e-12
    db = 20 * np.log10(rms / ref + 1e-12)
    keep = np.where(db > -top_db)[0]
    if len(keep) == 0:
        return audio
    start = keep[0] * hop
    end = min(len(audio), (keep[-1] + 1) * hop + frame)
    return audio[start:end]


def voice_encoder_mel(audio: np.ndarray, is_turbo: bool,
                      n_mels: int = 40) -> np.ndarray:
    """16 kHz waveform -> VE mel [T', 40]: |STFT|^2 @ mel filters
    (voiceEncoderMelSpectrogram, VoiceEncoderMelSpec.swift:26-100)."""
    window = dsp.hanning_window(400, periodic=True)
    spec = dsp.stft(jnp.asarray(audio, jnp.float32), window, 400, 160)
    mag2 = jnp.abs(spec) ** 2
    if is_turbo:
        filters = dsp.mel_filters(16000, 400, n_mels, f_min=0, f_max=8000,
                                  norm=None, mel_scale="htk")
    else:
        filters = dsp.mel_filters(16000, 400, n_mels, f_min=0, f_max=8000,
                                  norm="slaney", mel_scale="slaney")
    return np.asarray(mag2 @ jnp.asarray(filters))


def voice_encoder_embed(p, mels: np.ndarray, partial_frames: int = 160,
                        overlap: float = 0.5, min_coverage: float = 0.8
                        ) -> np.ndarray:
    """VE mel [T, 40] -> speaker embedding [1, 256]: 3-layer LSTM over
    sliding windows, relu + l2 norm, mean over windows
    (VoiceEncoder.inference, VoiceEncoder.swift:161-235)."""
    step = int(round(partial_frames * (1 - overlap)))
    t = mels.shape[0]
    n_wins, rem = divmod(max(t - partial_frames + step, 0), step)
    if n_wins == 0 or (rem + (partial_frames - step)) / partial_frames \
            >= min_coverage:
        n_wins += 1
    target = partial_frames + step * (n_wins - 1)
    if target > t:
        mels = np.pad(mels, ((0, target - t), (0, 0)))
    wins = np.stack([mels[i * step: i * step + partial_frames]
                     for i in range(n_wins)])
    x = jnp.asarray(wins, jnp.float32)
    for name in ("lstm1", "lstm2", "lstm3"):
        x, _ = nn.lstm(p[name], x)
    h = x[:, -1]
    emb = jax.nn.relu(nn.linear(p["proj"], h))
    emb = emb / (jnp.sqrt((emb ** 2).sum(-1, keepdims=True)) + 1e-10)
    emb = emb.mean(axis=0, keepdims=True)
    return np.asarray(
        emb / (jnp.sqrt((emb ** 2).sum(-1, keepdims=True)) + 1e-10))


# ---------------------------------------------------------------------------
# T3 conditioning (T3CondEnc.swift:51-131, Perceiver.swift:66-160)
# ---------------------------------------------------------------------------


def _perceiver_attn_block(p, x1, x2, n_heads: int):
    """Shared pre-norm cross-attention block with residual."""
    h1 = nn.layer_norm(p["norm"], x1)
    h2 = nn.layer_norm(p["norm"], x2)
    b, t1, d = h1.shape
    t2 = h2.shape[1]
    hd = d // n_heads
    q = nn.linear(p["to_q"], h1).reshape(b, t1, n_heads, hd).transpose(0, 2, 1, 3)
    k = nn.linear(p["to_k"], h2).reshape(b, t2, n_heads, hd).transpose(0, 2, 1, 3)
    v = nn.linear(p["to_v"], h2).reshape(b, t2, n_heads, hd).transpose(0, 2, 1, 3)
    o = nn.sdpa(q, k, v)
    return x1 + nn.linear(p["proj_out"],
                          o.transpose(0, 2, 1, 3).reshape(b, t1, d))


def perceiver_resample(p, h, n_heads: int = 4):
    """Variable-length prompt -> 32 latents (Perceiver.swift:146-159)."""
    b = h.shape[0]
    query = jnp.broadcast_to(p["pre_attention_query"],
                             (b,) + p["pre_attention_query"].shape[1:])
    pre = _perceiver_attn_block(p["attn"], query, h, n_heads)
    return _perceiver_attn_block(p["attn"], pre, pre, n_heads)


def cond_enc_forward(p, cfg: T3Config, speaker_emb, prompt_speech_emb,
                     emotion_adv):
    """-> conditioning embeddings [B, cond_len, D]."""
    spkr = nn.linear(p["spkr_enc"], speaker_emb)[:, None]  # [B, 1, D]
    pieces = [spkr]
    if prompt_speech_emb is not None:
        if cfg.use_perceiver_resampler:
            pieces.append(perceiver_resample(p["perceiver"],
                                             prompt_speech_emb))
        else:
            pieces.append(prompt_speech_emb)
    if cfg.emotion_adv:
        emo = jnp.asarray(emotion_adv, jnp.float32).reshape(1, 1, 1)
        pieces.append(nn.linear(p["emotion_adv_fc"], emo))
    return jnp.concatenate(pieces, axis=1)


# ---------------------------------------------------------------------------
# Weight sanitize (ChatterboxModel.sanitize, ChatterboxModel.swift:140-460)
# ---------------------------------------------------------------------------


def _remap_regular_s3gen_key(k: str) -> str:
    """Python-MLX renamed keys -> raw layout our forward expects
    (remapRegularS3GenKey, ChatterboxModel.swift:262-389)."""
    import re

    k = re.sub(r"(down_blocks|mid_blocks|up_blocks)_(\d+)\.", r"\1.\2.", k)
    k = re.sub(r"\btransformer_(\d+)\.", r"transformer_blocks.\1.", k)
    k = k.replace(".attn.query_proj.", ".attn1.to_q.")
    k = k.replace(".attn.key_proj.", ".attn1.to_k.")
    k = k.replace(".attn.value_proj.", ".attn1.to_v.")
    k = k.replace(".attn.out_proj.", ".attn1.to_out.0.")
    k = k.replace(".ff.layers.0.", ".ff.net.0.proj.")
    k = k.replace(".ff.layers.1.", ".ff.net.1.")
    for blk in ("block1", "block2", "final_block"):
        k = k.replace(f".{blk}.conv.conv.", f".{blk}.block.0.conv.conv.")
        k = k.replace(f".{blk}.norm.", f".{blk}.block.1.")
    k = re.sub(r"\.res_conv\.(weight|bias)$", r".res_conv.conv.\1", k)
    k = re.sub(r"(^|\.)final_proj\.(weight|bias)$", r"\1final_proj.conv.\2",
               k)
    k = re.sub(r"\.(downsample|upsample)\.conv\.(weight|bias)$",
               r".\1.conv.conv.\2", k)
    k = k.replace(".mlp_linear.", ".mlp.0.")
    return k


def _sanitize_ve(weights: dict) -> dict:
    """VoiceEncoder LSTM key/format conversion (VoiceEncoder.swift:51-110)
    into our nn.lstm names (weight_ih/weight_hh/bias_ih/bias_hh)."""
    import re

    out = {}
    biases = {}
    for k, v in weights.items():
        m = re.match(r"lstm\.layers\.(\d)\.(Wx|Wh|bias)$", k)
        if not m:
            m = re.match(r"lstm(\d)\.(Wx|Wh|bias)$", k)
            layer = int(m.group(1)) - 1 if m else None
        else:
            layer = int(m.group(1))
        if m and layer is not None:
            part = m.group(2)
            name = f"lstm{layer + 1}"
            if part == "Wx":
                out[f"{name}.weight_ih"] = v
            elif part == "Wh":
                out[f"{name}.weight_hh"] = v
            else:
                out[f"{name}.bias_ih"] = v
                out[f"{name}.bias_hh"] = np.zeros_like(v)
            continue
        m = re.match(r"lstm\.(weight_ih|weight_hh|bias_ih|bias_hh)_l(\d)$",
                     k)
        if m:
            part, layer = m.group(1), int(m.group(2))
            if part.startswith("bias"):
                biases.setdefault(layer, {})[part] = v
            else:
                out[f"lstm{layer + 1}.{part}"] = v
            continue
        out[k] = v
    for layer, b in biases.items():
        out[f"lstm{layer + 1}.bias_ih"] = b.get(
            "bias_ih", np.zeros_like(next(iter(b.values()))))
        out[f"lstm{layer + 1}.bias_hh"] = b.get(
            "bias_hh", np.zeros_like(next(iter(b.values()))))
    return out


def sanitize(weights: dict, is_regular: bool) -> dict:
    out = {}
    ve = {}
    camp = {}
    hift = {}
    for k, v in weights.items():
        if k.startswith("ve."):
            ve[k[len("ve."):]] = v
            continue
        if k.startswith("t3."):
            k = k[len("t3."):]
            if k.startswith("tfmr.model."):
                k = "tfmr." + k[len("tfmr.model."):]
            if k.startswith("tfmr.lm_head."):
                continue
            out["t3." + k] = v
            continue
        if k.startswith("s3gen."):
            k = k[len("s3gen."):]
            if k.startswith("tokenizer."):
                continue
            if k.startswith("flow."):
                k = k[len("flow."):]
            if k.startswith("speaker_encoder."):
                camp[k[len("speaker_encoder."):]] = v
                continue
            if is_regular:
                k = _remap_regular_s3gen_key(k)
            if k.startswith("mel2wav."):
                hift[k[len("mel2wav."):]] = v
                continue
            out["s3gen." + k] = v
            continue
    for k, v in _sanitize_ve(ve).items():
        out["ve." + k] = v
    for k, v in s3gen_mod.sanitize_campplus(camp).items():
        out["s3gen.speaker_encoder." + k] = v
    for k, v in s3gen_mod.sanitize_hift(hift).items():
        out["s3gen.mel2wav." + k] = v
    return out


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


@dataclass
class Conditioning:
    """T3 + S3Gen conditioning bundle (DefaultConditioning / prepared from
    reference audio)."""

    speaker_emb: np.ndarray           # [1, 256]
    prompt_speech_tokens: np.ndarray | None  # [1, T] or None
    emotion_adv: float
    x_vector: np.ndarray              # [1, 192]
    s3_prompt_token: np.ndarray       # [1, T]
    s3_prompt_feat: np.ndarray        # [1, T_mel, 80]


class Chatterbox:
    def __init__(self, config: ChatterboxConfig, params, tokenizer=None,
                 s3_tokenizer=None, default_conditioning=None,
                 dtype=jnp.float32):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.s3_tokenizer = s3_tokenizer
        self.default_conditioning = default_conditioning
        self.dtype = dtype
        self.sample_rate = config.s3gen_sr
        self.cfg_weight = 0.0 if config.is_turbo else 0.5
        self.emotion_adv = 0.5
        conformer_cfg = (s3gen_mod.ConformerConfig(**config.s3gen_conformer)
                         if config.s3gen_conformer else None)
        hift_cfg = (s3gen_mod.HiFTConfig(**config.s3gen_hift)
                    if config.s3gen_hift else None)
        self.token2mel = s3gen_mod.S3Token2Mel(
            params["s3gen"], dtype=dtype, meanflow=config.meanflow,
            vocab_size=6561, n_mels=config.s3gen_n_mels,
            unet_in_channels=config.decoder_in_channels,
            conformer_cfg=conformer_cfg, hift_cfg=hift_cfg)
        if config.s3gen_campplus:
            self.token2mel.campplus_mels = config.s3gen_campplus.get(
                "num_mels", 80)
            self.token2mel.campplus_blocks = tuple(
                tuple(b) for b in config.s3gen_campplus.get(
                    "blocks", s3gen_mod.CAMPPLUS_BLOCKS))
        self._loops: dict = {}

    def default_generation_parameters(self) -> AudioGenerateParameters:
        return AudioGenerateParameters(temperature=0.8, top_p=0.95)

    @classmethod
    def from_pretrained(cls, repo_or_path: str, s3_tokenizer_repo:
                        str | None = None,
                        dtype=jnp.float32) -> "Chatterbox":
        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = ChatterboxConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(
            model_dir,
            sanitize=functools.partial(sanitize,
                                       is_regular=not config.is_turbo),
            dtype=dtype, exclude_files=("conds.safetensors",))
        if not config.is_turbo and "tfmr" in params.get("t3", {}):
            params["t3"]["tfmr"] = llama.maybe_stack(params["t3"]["tfmr"])
        tokenizer = None
        if (model_dir / "tokenizer.json").exists():
            from tokenizers import Tokenizer

            tokenizer = Tokenizer.from_file(str(model_dir /
                                                "tokenizer.json"))
        s3_tok = None
        for candidate in ([s3_tokenizer_repo] if s3_tokenizer_repo
                          else [str(model_dir / "s3_tokenizer")]):
            try:
                from tpu_audio.codecs.s3_tokenizer import S3TokenizerV2

                s3_tok = S3TokenizerV2.from_pretrained(candidate)
                break
            except Exception:
                s3_tok = None
        default_cond = None
        conds = model_dir / "conds.safetensors"
        if conds.exists():
            w = loading.load_safetensors_file(conds)
            feat = w.get("gen.prompt_feat", np.zeros((1, 0, 80), np.float32))
            default_cond = Conditioning(
                speaker_emb=w.get("t3.speaker_emb",
                                  np.zeros((1, 256), np.float32)),
                prompt_speech_tokens=w.get("t3.cond_prompt_speech_tokens"),
                emotion_adv=float(np.asarray(w.get(
                    "t3.emotion_adv", 0.5)).reshape(-1)[0]),
                x_vector=w.get("gen.embedding",
                               np.zeros((1, 192), np.float32)),
                s3_prompt_token=w.get("gen.prompt_token",
                                      np.zeros((1, 0), np.int32)),
                s3_prompt_feat=np.asarray(feat, np.float32))
        return cls(config, params, tokenizer, s3_tok, default_cond, dtype)

    # -- conditioning ------------------------------------------------------------

    def prepare_conditionals(self, ref_audio: np.ndarray,
                             ref_sr: int = S3GEN_SR) -> Conditioning:
        """Reference audio -> full conditioning bundle
        (prepareConditionals, ChatterboxModel.swift:499-651)."""
        from tpu_audio.core.audio_io import resample_audio

        audio = np.asarray(ref_audio, np.float32)
        if audio.ndim > 1:
            audio = audio.mean(axis=0)
        if self.config.is_turbo:
            audio = normalize_loudness(audio, -27.0)
        audio24k = (resample_audio(audio, ref_sr, S3GEN_SR)
                    if ref_sr != S3GEN_SR else audio)
        audio24k = audio24k[: self.config.dec_cond_len]
        audio16k = (resample_audio(audio, ref_sr, S3_SR)
                    if ref_sr != S3_SR else audio)
        enc16k = audio16k[: self.config.enc_cond_len]
        dec_len_16k = self.config.dec_cond_len * S3_SR // S3GEN_SR
        dec16k = audio16k[:dec_len_16k]

        # 1. VoiceEncoder speaker embedding (after silence trim)
        trimmed = trim_silence(enc16k, 20.0)
        ve_mels = voice_encoder_mel(trimmed, self.config.is_turbo)
        speaker_emb = voice_encoder_embed(self.params["ve"], ve_mels)

        # 2. Prompt speech tokens via S3TokenizerV2
        if self.s3_tokenizer is not None:
            t3_tokens = self.s3_tokenizer.tokenize(enc16k)[None]
            plen = self.config.t3.speech_cond_prompt_len
            t3_tokens = t3_tokens[:, :plen]
            s3_tokens = self.s3_tokenizer.tokenize(dec16k)[None]
        elif self.default_conditioning is not None:
            t3_tokens = self.default_conditioning.prompt_speech_tokens
            s3_tokens = self.default_conditioning.s3_prompt_token
        else:
            t3_tokens = None
            s3_tokens = np.zeros((1, 0), np.int32)

        # 3. CAMPPlus x-vector
        x_vector = self.token2mel.speaker_embedding(dec16k)

        # 4. S3Gen prompt mel + token/mel alignment (2 mel frames / token)
        feat = s3gen_mod.s3gen_mel_spectrogram(
            audio24k, num_mels=self.config.s3gen_n_mels)[None]  # [1, T, M]
        if s3_tokens.shape[1] > 0 and feat.shape[1] > 0:
            expected = s3_tokens.shape[1] * 2
            if expected < feat.shape[1]:
                feat = feat[:, :expected]
            elif expected > feat.shape[1]:
                s3_tokens = s3_tokens[:, : feat.shape[1] // 2]
        return Conditioning(
            speaker_emb=speaker_emb, prompt_speech_tokens=t3_tokens,
            emotion_adv=self.emotion_adv, x_vector=x_vector,
            s3_prompt_token=np.asarray(s3_tokens, np.int32),
            s3_prompt_feat=np.asarray(feat, np.float32))

    # -- T3 ----------------------------------------------------------------------

    def _backbone_step(self, params, embeds, cache):
        """-> (hidden [B, T, D], cache). Llama or GPT-2 by variant."""
        if self.config.is_turbo:
            gcfg = self.config.gpt2
            pos = cache.offset + jnp.arange(embeds.shape[1])
            embeds = embeds + nn.embedding(params["tfmr"]["wpe"], pos)[None]
            from tpu_audio.models.tts.indextts import IndexTTSGPTConfig
            from tpu_audio.models.tts.indextts import gpt2_forward

            icfg = IndexTTSGPTConfig(model_dim=gcfg.hidden_size,
                                     heads=gcfg.n_head, layers=gcfg.n_layer)
            return gpt2_forward(params["tfmr"], embeds, cache, icfg)
        return llama.forward(params["tfmr"], None, cache, self.config.llama,
                             inputs_embeds=embeds, return_hidden=True)

    def make_cache(self, batch: int, max_len: int):
        if self.config.is_turbo:
            g = self.config.gpt2
            return kv_cache.init_cache(g.n_layer, batch, g.n_head,
                                       g.hidden_size // g.n_head, max_len,
                                       self.dtype)
        c = self.config.llama
        return llama.make_cache(c, batch, max_len, self.dtype)

    def _get_t3_loop(self, max_new: int, temperature: float, top_k: int,
                     top_p: float, min_p: float, rep_penalty: float,
                     cfg_weight: float):
        key = (max_new, temperature, top_k, top_p, min_p, rep_penalty,
               cfg_weight)
        if key in self._loops:
            return self._loops[key]
        cfg = self.config.t3
        stop = cfg.stop_speech_token
        vocab = cfg.speech_tokens_dict_size
        use_cfg = cfg_weight > 0.0
        from tpu_audio.core.sampling import (_mask_min_p, _mask_top_k,
                                             _mask_top_p)

        def sample(rng, logits):
            logits = logits.astype(jnp.float32)
            if temperature > 0 and temperature != 1.0:
                logits = logits / temperature
            if top_k > 0:
                logits = _mask_top_k(logits, top_k)
            if min_p > 0.0:
                logits = _mask_min_p(logits, min_p)
            if top_p < 1.0:
                logits = _mask_top_p(logits, top_p)
            return jax.random.categorical(rng, logits,
                                          axis=-1).astype(jnp.int32)

        def loop(params, prompt_embeds, cache, rng):
            h, cache = self._backbone_step(params, prompt_embeds, cache)
            h = h[:, -1:]
            tokens = jnp.zeros((max_new,), jnp.int32)
            seen = jnp.zeros((vocab,), jnp.bool_)

            def cond_fn(c):
                _, i, _, _, finished, _, _ = c
                return jnp.logical_and(~finished, i < max_new)

            def body(c):
                tokens, i, cache, h, finished, seen, rng = c
                logits = nn.linear(params["speech_head"],
                                   h[:, -1]).astype(jnp.float32)
                if use_cfg:
                    cond_l, uncond_l = logits[:1], logits[1:2]
                    logits = cond_l + cfg_weight * (cond_l - uncond_l)
                else:
                    logits = logits[:1]
                if rep_penalty != 1.0:
                    logits = jnp.where(
                        seen[None],
                        jnp.where(logits < 0, logits * rep_penalty,
                                  logits / rep_penalty), logits)
                rng, sub = jax.random.split(rng)
                tok = sample(sub, logits)
                valid = tok[0] != stop
                tokens = jnp.where(valid, tokens.at[i].set(tok[0]), tokens)
                seen = seen.at[tok[0]].set(True)
                emb = nn.embedding(params["speech_emb"], tok[:, None])
                if cfg.input_pos_emb == "learned":
                    emb = emb + nn.embedding(
                        params["speech_pos_emb"]["emb"],
                        jnp.reshape(i + 1, (1, 1)))
                if use_cfg:
                    emb = jnp.concatenate([emb, emb], axis=0)
                h, cache = self._backbone_step(params,
                                               emb.astype(self.dtype),
                                               cache)
                return (tokens, i + valid.astype(jnp.int32), cache, h,
                        ~valid, seen, rng)

            init = (tokens, jnp.int32(0), cache, h, jnp.bool_(False), seen,
                    rng)
            tokens, count, *_ = jax.lax.while_loop(cond_fn, body, init)
            return tokens, count

        fn = ajit(loop, donate_argnums=(2,))
        self._loops[key] = fn
        return fn

    def t3_generate(self, text_tokens: np.ndarray, cond: Conditioning,
                    gp: AudioGenerateParameters) -> np.ndarray:
        """text ids [1, T] -> speech token ids [n]
        (T3Model.inference / T3GPT2Model.inference)."""
        p = self.params["t3"]
        cfg = self.config.t3
        prompt_emb = None
        if cond.prompt_speech_tokens is not None \
                and cond.prompt_speech_tokens.shape[1] > 0:
            toks = jnp.asarray(cond.prompt_speech_tokens, jnp.int32)
            prompt_emb = nn.embedding(p["speech_emb"], toks)
            if not self.config.is_turbo:
                prompt_emb = prompt_emb + nn.embedding(
                    p["speech_pos_emb"]["emb"],
                    jnp.arange(toks.shape[1]))[None]
        cond_emb = cond_enc_forward(
            p["cond_enc"], cfg, jnp.asarray(cond.speaker_emb, jnp.float32),
            prompt_emb, cond.emotion_adv)

        ids = jnp.asarray(text_tokens, jnp.int32)
        text_emb = nn.embedding(p["text_emb"], ids)
        if cfg.input_pos_emb == "learned":
            text_emb = text_emb + nn.embedding(
                p["text_pos_emb"]["emb"], jnp.arange(ids.shape[1]))[None]

        bos = jnp.asarray([[cfg.start_speech_token]], jnp.int32)
        bos_emb = nn.embedding(p["speech_emb"], bos)
        if cfg.input_pos_emb == "learned":
            bos_emb = bos_emb + p["speech_pos_emb"]["emb"]["weight"][None,
                                                                     :1]
        cfg_weight = 0.0 if self.config.is_turbo else self.cfg_weight
        if cfg_weight > 0.0:
            text_emb = jnp.concatenate([text_emb, jnp.zeros_like(text_emb)],
                                       axis=0)
            cond_emb = jnp.broadcast_to(
                cond_emb, (2,) + cond_emb.shape[1:])
            bos_emb = jnp.concatenate([bos_emb, bos_emb], axis=0)
        embeds = jnp.concatenate([cond_emb, text_emb, bos_emb],
                                 axis=1).astype(self.dtype)

        has_prompt = prompt_emb is not None
        if has_prompt:
            max_new = min(gp.max_tokens or cfg.max_speech_tokens,
                          cfg.max_speech_tokens)
        else:
            max_new = min(768, max(200, text_tokens.shape[1] * 10))
        if self.config.is_turbo:
            loop = self._get_t3_loop(max_new, gp.temperature, 1000,
                                     gp.top_p, 0.0, 1.2, 0.0)
        else:
            loop = self._get_t3_loop(max_new, gp.temperature, 0, 1.0, 0.05,
                                     1.2, cfg_weight)
        batch = embeds.shape[0]
        cache = self.make_cache(batch, embeds.shape[1] + max_new + 1)
        tokens, count = loop(p, embeds, cache,
                             jax.random.PRNGKey(gp.seed or 0))
        return np.asarray(tokens)[: int(count)]

    # -- public API ---------------------------------------------------------------

    def generate(self, text: str, voice: str | None = None, ref_audio=None,
                 ref_text: str | None = None, language: str | None = None,
                 generation_parameters: AudioGenerateParameters | None = None
                 ) -> np.ndarray:
        del voice, ref_text, language
        gp = generation_parameters or self.default_generation_parameters()
        if ref_audio is not None:
            cond = self.prepare_conditionals(np.asarray(ref_audio))
        elif self.default_conditioning is not None:
            cond = self.default_conditioning
        else:
            raise AudioGenerationError(
                "Chatterbox requires reference audio for voice cloning")
        if self.tokenizer is None:
            raise AudioGenerationError("tokenizer not loaded")
        ids = self.tokenizer.encode(text).ids
        if not self.config.is_turbo:
            ids = ([self.config.t3.start_text_token] + ids
                   + [self.config.t3.stop_text_token])
        speech = self.t3_generate(np.asarray([ids], np.int32), cond, gp)
        # drop invalid/control tokens + append silence
        # (ChatterboxModel.swift:658-787)
        speech = speech[(speech >= 0)
                        & (speech < self.config.t3.start_speech_token)]
        if len(speech) == 0:
            speech = np.asarray([0], np.int32)
        speech = np.concatenate([speech, [S3GEN_SIL] * 3]).astype(np.int32)

        n_timesteps = 2 if self.config.meanflow else 10
        mel = self.token2mel.inference(
            token=speech[None], prompt_token=cond.s3_prompt_token,
            prompt_feat=cond.s3_prompt_feat, embedding=cond.x_vector,
            n_timesteps=n_timesteps, seed=gp.seed or 0)
        wav = np.array(self.token2mel.vocode(mel)[0])

        # fade-in + peak normalize (ChatterboxModel.swift:829-856)
        n_trim = self.sample_rate // 50
        if len(wav) >= 2 * n_trim:
            ramp = (np.cos(np.pi * (1 - np.arange(n_trim)
                                    / (n_trim - 1))) + 1) / 2
            fade = np.concatenate([np.zeros(n_trim), ramp])
            wav[: 2 * n_trim] = wav[: 2 * n_trim] * fade
        peak = np.abs(wav).max()
        if peak > 1e-6:
            wav = wav * (0.95 / peak)
        return wav.astype(np.float32)

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
