"""S3TokenizerV2: supervised semantic speech tokenizer (25 Hz, FSQ).

TPU-first rebuild of the reference
(Sources/MLXAudioCodecs/S3/S3TokenizerV2.swift): Whisper-style 128-mel
log spectrogram -> two stride-2 convs (4x downsample) -> transformer
blocks whose attention carries an FSMN depthwise-conv memory path on
the value stream plus llama-style rotary embeddings -> an FSQ
(finite scalar quantization) codebook: project to 8 dims, tanh*0.999,
round into {-1,0,1}+1 and base-3 encode to ids in [0, 6561)
(S3TokenizerV2.swift:75-100).

The whole mel->tokens pass is one jitted call over frame-count buckets
with exact non-pad masking.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import dsp, hub, loading, nn
from tpu_audio.core.jitting import ajit

__all__ = ["S3TokenizerV2", "S3TokenizerConfig"]


@dataclass
class S3TokenizerConfig:
    """S3TokenizerV2.swift:15-25."""

    n_mels: int = 128
    n_audio_state: int = 1280
    n_audio_head: int = 20
    n_audio_layer: int = 6
    n_codebook_size: int = 6561
    kernel_size: int = 31

    @classmethod
    def from_dict(cls, d: dict) -> "S3TokenizerConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


def _rope_tables(head_dim: int, max_len: int):
    inv = 1.0 / (10000.0 ** (np.arange(0, head_dim, 2) / head_dim))
    ang = np.arange(max_len)[:, None] * inv[None, :]
    cos = np.concatenate([np.cos(ang), np.cos(ang)], axis=-1)
    sin = np.concatenate([np.sin(ang), np.sin(ang)], axis=-1)
    return cos.astype(np.float32), sin.astype(np.float32)


def _attention(p, x, cfg: S3TokenizerConfig, mask_bias, mask_pad,
               cos, sin):
    """FSMN multi-head attention (S3TokenizerV2.swift:121-206)."""
    b, t, d = x.shape
    h = cfg.n_audio_head
    hd = d // h
    scale = hd ** -0.25
    q = nn.linear(p["query"], x).reshape(b, t, h, hd)
    k = nn.linear(p["key"], x).reshape(b, t, h, hd)
    v = nn.linear(p["value"], x).reshape(b, t, h, hd)

    def rope(z):
        half = hd // 2
        rot = jnp.concatenate([-z[..., half:], z[..., :half]], axis=-1)
        return z * cos[None, :t, None, :] + rot * sin[None, :t, None, :]

    q, k = rope(q), rope(k)
    # FSMN memory on the (un-rotated) value stream
    vm = v.reshape(b, t, d) * mask_pad
    kernel = cfg.kernel_size
    left = (kernel - 1) // 2
    padded = jnp.pad(vm, ((0, 0), (left, kernel - 1 - left), (0, 0)))
    mem = nn.conv1d(p["fsmn_block"], padded, groups=d) + vm
    mem = mem * mask_pad
    o = nn.sdpa(q.transpose(0, 2, 1, 3) * scale,
                k.transpose(0, 2, 1, 3) * scale,
                v.transpose(0, 2, 1, 3), mask=mask_bias, scale=1.0)
    o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
    return nn.linear(p["out"], o) + mem


def fsq_encode(p, x, level: int = 3):
    """FSQ base-3 ids (S3TokenizerV2.swift:75-100)."""
    h = nn.linear(p["fsq_codebook"]["project_down"], x).astype(jnp.float32)
    h = jnp.round(jnp.tanh(h) * 0.9990000128746033) + 1.0
    powers = jnp.asarray([float(level) ** i for i in range(8)], jnp.float32)
    return jnp.sum(h * powers, axis=-1).astype(jnp.int32)


def forward(params, mel, mel_len, cfg: S3TokenizerConfig):
    """mel [B, T, n_mels] + lengths -> (tokens [B, T/4], token_lens)
    (S3TokenizerV2.swift:248-352)."""
    p = params["encoder"]
    x = mel
    out_len = mel_len

    def non_pad(lengths, t):
        return (jnp.arange(t)[None, :] < lengths[:, None]).astype(x.dtype)

    m = non_pad(out_len, x.shape[1])[..., None]
    x = jax.nn.gelu(nn.conv1d(p["conv1"], x * m, stride=2, padding=1))
    out_len = (out_len - 1) // 2 + 1
    m = non_pad(out_len, x.shape[1])[..., None]
    x = jax.nn.gelu(nn.conv1d(p["conv2"], x * m, stride=2, padding=1))
    out_len = (out_len - 1) // 2 + 1
    mask = non_pad(out_len, x.shape[1])
    mask_pad = mask[..., None]
    mask_bias = jnp.where(mask > 0, 0.0, -1e9).astype(jnp.float32)[
        :, None, None, :]
    hd = cfg.n_audio_state // cfg.n_audio_head
    cos, sin = _rope_tables(hd, x.shape[1])
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    for i in range(cfg.n_audio_layer):
        bp = p["blocks"][str(i)]
        x = x + _attention(bp["attn"], nn.layer_norm(bp["attn_ln"], x,
                                                     eps=1e-6),
                           cfg, mask_bias, mask_pad, cos, sin)
        h2 = nn.layer_norm(bp["mlp_ln"], x)
        x = x + nn.linear(bp["mlp"]["2"],
                          nn.gelu(nn.linear(bp["mlp"]["0"], h2)))
    tokens = fsq_encode(params["quantizer"], x)
    return tokens, out_len


def sanitize(weights):
    """S3TokenizerV2.swift sanitize: codebook aliases, mlp Sequential
    indices, drop rope/mel buffers; MLX conv layouts -> torch."""
    out = {}
    for k, v in weights.items():
        if "freqs_cis" in k or "_mel_filters" in k:
            continue
        k = k.replace("quantizer._codebook.", "quantizer.fsq_codebook.")
        k = k.replace("quantizer.codebook.", "quantizer.fsq_codebook.")
        k = k.replace(".mlp.layers.", ".mlp.")
        if ("conv" in k or "fsmn_block" in k) and k.endswith(".weight") \
                and v.ndim == 3 and (v.shape[1] < v.shape[2]
                                     or (v.shape[2] == 1 and v.shape[1] > 1)):
            v = np.transpose(v, (0, 2, 1))  # MLX [O,K,I] -> [O,I,K]
        out[k] = v
    return out


class S3TokenizerV2:
    """16 kHz waveform -> 25 Hz semantic tokens."""

    def __init__(self, config: S3TokenizerConfig, params, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        self.sample_rate = 16000
        self._forward = ajit(functools.partial(forward, cfg=config))

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32
                        ) -> "S3TokenizerV2":
        model_dir = hub.resolve_or_download_model(repo_or_path)
        try:
            cfg_dict = hub.load_config(model_dir)
        except Exception:
            cfg_dict = {}
        config = S3TokenizerConfig.from_dict(cfg_dict)
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        return cls(config, params, dtype)

    def log_mel(self, audio) -> np.ndarray:
        """Whisper-style 128-mel log spectrogram [T, n_mels]."""
        return np.asarray(dsp.log_mel_spectrogram(
            np.asarray(audio, np.float32), n_mels=self.config.n_mels)).T

    def tokenize(self, audio) -> np.ndarray:
        """waveform [T] -> token ids [frames] at 25 Hz."""
        mel = self.log_mel(audio)
        if mel.shape[0] == 0:
            return np.zeros((0,), np.int32)
        bucket = max(16, 1 << (mel.shape[0] - 1).bit_length())
        padded = np.zeros((1, bucket, mel.shape[1]), np.float32)
        padded[0, : mel.shape[0]] = mel
        tokens, lens = self._forward(
            self.params, jnp.asarray(padded, self.dtype),
            jnp.asarray([mel.shape[0]], jnp.int32))
        return np.asarray(tokens)[0, : int(lens[0])]

    # codec-registry compatibility (encode-only tokenizer)
    def encode(self, audio):
        return self.tokenize(audio)

    def decode(self, codes):
        raise NotImplementedError(
            "S3TokenizerV2 is an analysis tokenizer (use S3Gen to decode)")
