"""SenseVoice-small: non-autoregressive multilingual ASR with SANM encoder.

TPU-first rebuild of the reference
(Sources/MLXAudioSTT/Models/SenseVoice/*): Kaldi fbank (HTK mel scale,
fmin=20, no norm, DC removal + 0.97 pre-emphasis per frame, symmetric
hamming window, power-of-two FFT) -> LFR (m=7, n=6, ceil(T/n) output
frames, repeat-first/repeat-last padding) -> CMVN ``(x + means) * istd``
-> four learned query embeddings prepended ([lang, event, emotion,
textnorm]) -> SANM encoder (QKV self-attention whose value stream also
runs through a depthwise FSMN memory conv, added to the attention
output; SenseVoiceModel.swift:47-126) -> CTC log-softmax head.

Decoding is greedy CTC over frames 4..T with the first 4 frames giving
the language/emotion/event "rich" tags (SenseVoiceModel.swift:392-443).
The whole encoder+head is one jitted static-shape call; audio is padded
into frame-count buckets so repeated calls reuse compiled graphs.
"""

from __future__ import annotations

import functools
import json
import math
import time
from dataclasses import dataclass
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
from tpu_audio.core.jitting import ajit

__all__ = ["SenseVoice", "SenseVoiceConfig"]


@dataclass
class SenseVoiceConfig:
    """SenseVoiceConfig.swift: encoder_conf + frontend_conf flattened."""

    input_size: int = 560
    vocab_size: int = 25055
    output_size: int = 512
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 50
    tp_blocks: int = 20
    kernel_size: int = 11
    sanm_shift: int = 0
    normalize_before: bool = True
    # frontend
    fs: int = 16000
    window: str = "hamming"
    n_mels: int = 80
    frame_length: int = 25
    frame_shift: int = 10
    lfr_m: int = 7
    lfr_n: int = 6

    @classmethod
    def from_dict(cls, d: dict) -> "SenseVoiceConfig":
        merged = {k: v for k, v in d.items() if not isinstance(v, dict)}
        merged.update(d.get("encoder_conf", {}))
        # typo key in upstream configs (SenseVoiceConfig.swift:53)
        if "sanm_shfit" in merged:
            merged["sanm_shift"] = merged.pop("sanm_shfit")
        for k, v in d.get("frontend_conf", {}).items():
            merged[k] = v
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in merged.items() if k in keys})


# query token ids in the 16-slot embed table (SenseVoiceModel.swift:301-317)
LID_DICT = {"auto": 0, "zh": 3, "en": 4, "yue": 7, "ja": 11, "ko": 12,
            "nospeech": 13}
TEXTNORM_DICT = {"withitn": 14, "woitn": 15}
LID_TOKENS = {24884: "zh", 24885: "en", 24888: "yue", 24892: "ja",
              24896: "ko", 24992: "nospeech"}
EMO_TOKENS = {25001: "happy", 25002: "sad", 25003: "angry",
              25004: "neutral", 25005: "fearful", 25006: "disgusted",
              25007: "surprised", 25008: "other", 25009: "unk"}
EVENT_TOKENS = {24993: "Speech", 24995: "BGM", 24997: "Laughter",
                24999: "Applause"}

_LANG_ALIASES = {"chinese": "zh", "mandarin": "zh", "english": "en",
                 "cantonese": "yue", "japanese": "ja", "korean": "ko"}


def normalize_language(language: str | None) -> str:
    if not language:
        return "auto"
    lang = language.lower()
    lang = _LANG_ALIASES.get(lang, lang)
    return lang if lang in LID_DICT else "auto"


# -- frontend ----------------------------------------------------------------------


def compute_fbank(audio, cfg: SenseVoiceConfig):
    """waveform [S] -> log-fbank [T, n_mels] (SenseVoiceAudio.swift:6-162):
    int16 scaling, per-frame DC removal, pre-emphasis (first sample uses
    itself as history), window, pow2 FFT, HTK mel bank fmin=20 unnormed."""
    audio = np.asarray(audio, np.float32).reshape(-1)
    win = cfg.fs * cfg.frame_length // 1000
    hop = cfg.fs * cfg.frame_shift // 1000
    if len(audio) < win:
        return np.zeros((0, cfg.n_mels), np.float32)
    if np.abs(audio).max() <= 1.0:
        audio = audio * 32768.0
    n = 1 + (len(audio) - win) // hop
    x = jnp.asarray(audio)
    idx = jnp.arange(n)[:, None] * hop + jnp.arange(win)[None, :]
    frames = x[idx]
    frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    frames = jnp.concatenate(
        [frames[:, :1] * (1.0 - 0.97),
         frames[:, 1:] - 0.97 * frames[:, :-1]], axis=1)
    if "hann" in cfg.window.lower():
        wnd = dsp.hanning_window(win, periodic=True)
    else:
        wnd = jnp.asarray(np.hamming(win), jnp.float32)
    n_fft = 1 << max(0, (win - 1)).bit_length()
    spec = jnp.abs(jnp.fft.rfft(frames * wnd, n=n_fft, axis=1)) ** 2
    bank = dsp.mel_filters(cfg.fs, n_fft, cfg.n_mels, f_min=20.0,
                           norm=None, mel_scale="htk")
    return np.asarray(jnp.log(jnp.maximum(spec @ bank, 1e-10)))


def apply_lfr(feats: np.ndarray, m: int, n: int) -> np.ndarray:
    """LFR stacking with ceil(T/n) output frames
    (SenseVoiceAudio.swift:41-72)."""
    t, d = feats.shape
    if t == 0:
        return np.zeros((0, d * m), np.float32)
    left = (m - 1) // 2
    t_out = -(-t // n)
    src = np.arange(t_out)[:, None] * n + np.arange(m)[None, :] - left
    return feats[np.clip(src, 0, t - 1)].reshape(t_out, d * m)


# -- encoder -----------------------------------------------------------------------


def _sinusoidal_positions(t: int, dim: int) -> np.ndarray:
    """1-indexed sin|cos position table (SenseVoiceModel.swift:8-31)."""
    half = max(dim // 2, 1)
    pos = np.arange(1, t + 1, dtype=np.float32)
    inv = np.exp(np.arange(half, dtype=np.float32)
                 * -(math.log(10000.0) / max(half - 1, 1)))
    scaled = pos[:, None] * inv[None, :]
    enc = np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1)
    if enc.shape[1] > dim:
        enc = enc[:, :dim]
    elif enc.shape[1] < dim:
        enc = np.pad(enc, ((0, 0), (0, dim - enc.shape[1])))
    return enc.astype(np.float32)


def _sanm_attention(p, x, cfg: SenseVoiceConfig):
    """QKV attention + FSMN value memory (SenseVoiceModel.swift:47-126)."""
    qkv = nn.linear(p["linear_q_k_v"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    left = (cfg.kernel_size - 1) // 2 + max(cfg.sanm_shift, 0)
    right = cfg.kernel_size - 1 - left
    padded = jnp.pad(v, ((0, 0), (left, right), (0, 0)))
    memory = v + nn.conv1d(p["fsmn_block"], padded, groups=v.shape[-1])
    b, t, d = q.shape
    h = cfg.attention_heads
    hd = d // h
    q = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    o = nn.sdpa(q, k, v).transpose(0, 2, 1, 3).reshape(b, t, d)
    return nn.linear(p["linear_out"], o) + memory


def _sanm_layer(p, x, cfg: SenseVoiceConfig, in_size: int):
    res = x
    h = nn.layer_norm(p["norm1"], x) if cfg.normalize_before else x
    attn = _sanm_attention(p["self_attn"], h, cfg)
    h = res + attn if in_size == cfg.output_size else attn
    res = h
    h2 = nn.layer_norm(p["norm2"], h) if cfg.normalize_before else h
    ff = nn.linear(p["feed_forward"]["w_2"],
                   jax.nn.relu(nn.linear(p["feed_forward"]["w_1"], h2)))
    return res + ff


def encoder_forward(params, x, cfg: SenseVoiceConfig):
    """[B, T, input_size] -> [B, T, output_size]
    (SenseVoiceModel.swift:253-269)."""
    h = x * jnp.asarray(math.sqrt(cfg.output_size), x.dtype)
    pos = jnp.asarray(_sinusoidal_positions(h.shape[1], h.shape[2]))
    h = h + pos[None].astype(h.dtype)
    h = _sanm_layer(params["encoders0"]["0"], h, cfg, cfg.input_size)
    for i in range(cfg.num_blocks - 1):
        h = _sanm_layer(params["encoders"][str(i)], h, cfg, cfg.output_size)
    h = nn.layer_norm(params["after_norm"], h)
    for i in range(cfg.tp_blocks):
        h = _sanm_layer(params["tp_encoders"][str(i)], h, cfg,
                        cfg.output_size)
    return nn.layer_norm(params["tp_norm"], h)


def forward(params, feats, query_ids, cfg: SenseVoiceConfig):
    """feats [B, T, input_size] + query token ids [B, 4] -> CTC log-probs
    [B, 4+T, vocab] (SenseVoiceModel.swift:377-390). query_ids order:
    [lid, event(1), emo(2), textnorm]."""
    queries = nn.embedding(params["embed"], query_ids).astype(feats.dtype)
    speech = jnp.concatenate([queries, feats], axis=1)
    enc = encoder_forward(params["encoder"], speech, cfg)
    logits = nn.linear(params["ctc_lo"], enc)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def sanitize(weights):
    """SenseVoiceModel.swift:515-531: ctc.ctc_lo -> ctc_lo; MLX depthwise
    conv [O, K, 1] -> torch [O, 1, K]."""
    out = {}
    for k, v in weights.items():
        k = k.replace("ctc.ctc_lo.", "ctc_lo.")
        if "fsmn_block.weight" in k and v.ndim == 3 and v.shape[-1] == 1:
            v = np.transpose(v, (0, 2, 1))
        out[k] = v
    return out


class SenseVoiceTokenizer:
    """tokens.json list / sentencepiece decode
    (SenseVoiceTokenizer.swift:4-49)."""

    def __init__(self, model_dir: Path):
        self.token_list = None
        self.sp = None
        tokens = model_dir / "tokens.json"
        if tokens.exists():
            self.token_list = json.loads(tokens.read_text())
        else:
            models = sorted(model_dir.glob("*.model"))
            if models:
                try:
                    import sentencepiece

                    self.sp = sentencepiece.SentencePieceProcessor(
                        model_file=str(models[0]))
                except ImportError:
                    pass

    @property
    def available(self) -> bool:
        return self.token_list is not None or self.sp is not None

    def decode(self, ids: list[int]) -> str:
        if self.sp is not None:
            return self.sp.decode(ids)
        if self.token_list is not None:
            pieces = [self.token_list[i] for i in ids
                      if 0 <= i < len(self.token_list)]
            return "".join(pieces).replace("▁", " ").strip()
        return " ".join(str(i) for i in ids)


class SenseVoice:
    BLANK_ID = 0

    def __init__(self, config: SenseVoiceConfig, params, cmvn=None,
                 tokenizer=None, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.cmvn = cmvn
        self.tokenizer = tokenizer
        self.dtype = dtype
        self.sample_rate = config.fs
        self._forward = ajit(functools.partial(forward, cfg=config))

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32
                        ) -> "SenseVoice":
        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = SenseVoiceConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        cmvn = None
        if (model_dir / "am.mvn").exists():
            from tpu_audio.models.vad.fsmn_vad import parse_kaldi_cmvn

            cmvn = parse_kaldi_cmvn((model_dir / "am.mvn").read_text())
        tok = SenseVoiceTokenizer(model_dir)
        return cls(config, params, cmvn, tok if tok.available else None,
                   dtype)

    def extract_features(self, audio, sample_rate: int | None = None
                         ) -> np.ndarray:
        cfg = self.config
        wf = np.asarray(audio, np.float32).reshape(-1)
        src = sample_rate or cfg.fs
        if src != cfg.fs:
            wf = resample_audio(wf, src, cfg.fs)
        fbank = compute_fbank(wf, cfg)
        feats = apply_lfr(fbank, cfg.lfr_m, cfg.lfr_n)
        if self.cmvn is not None:
            means, istd = self.cmvn
            if means.shape[0] == feats.shape[1]:
                feats = (feats + means) * istd
        return feats

    def _query_ids(self, language: str, use_itn: bool) -> np.ndarray:
        lid = LID_DICT.get(normalize_language(language), 0)
        tn = TEXTNORM_DICT["withitn" if use_itn else "woitn"]
        return np.asarray([[lid, 1, 2, tn]], np.int32)

    def _decode_tokens(self, ids: list[int]) -> str:
        if self.tokenizer is not None:
            return self.tokenizer.decode(ids)
        return " ".join(str(i) for i in ids)

    def generate(self, audio, generation_parameters:
                 STTGenerateParameters | None = None,
                 language: str | None = None, use_itn: bool = False,
                 sample_rate: int | None = None) -> STTOutput:
        gp = generation_parameters or STTGenerateParameters()
        lang = language or gp.language or "auto"
        t0 = time.perf_counter()
        feats = self.extract_features(audio, sample_rate)
        if feats.shape[0] == 0:
            return STTOutput(text="", language=None)
        # bucket the frame count so recompiles are rare
        bucket = max(16, 1 << (feats.shape[0] - 1).bit_length())
        padded = np.zeros((1, bucket, feats.shape[1]), np.float32)
        padded[0, :feats.shape[0]] = feats
        log_probs = np.asarray(self._forward(
            self.params, jnp.asarray(padded, self.dtype),
            jnp.asarray(self._query_ids(lang, use_itn))))[0]
        log_probs = log_probs[:4 + feats.shape[0]]
        # rich tags live on the first 3 frames (SenseVoiceModel.swift:407)
        rich = {
            "language": LID_TOKENS.get(int(log_probs[0].argmax()), "unknown"),
            "emotion": EMO_TOKENS.get(
                int(log_probs[1].argmax()),
                f"token_{int(log_probs[1].argmax())}"),
            "event": EVENT_TOKENS.get(
                int(log_probs[2].argmax()),
                f"token_{int(log_probs[2].argmax())}"),
        }
        best = log_probs[4:].argmax(-1).tolist()
        ids, prev = [], None
        for t in best:
            if t != prev:
                if t != self.BLANK_ID:
                    ids.append(t)
                prev = t
        text = self._decode_tokens(ids)
        elapsed = time.perf_counter() - t0
        seg = STTSegment(text=text, start=0.0,
                         end=len(np.atleast_1d(audio)) / self.sample_rate,
                         tokens=ids)
        return STTOutput(text=text, segments=[seg],
                         language=rich["language"],
                         generation_token_count=len(ids),
                         generation_time=elapsed, total_time=elapsed)

    def generate_stream(self, audio, generation_parameters=None, **kw):
        out = self.generate(audio, generation_parameters, **kw)
        if out.text:
            yield {"type": "token", "text": out.text}
        yield {"type": "result", "output": out}
