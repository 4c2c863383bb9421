"""LASR CTC: conformer-with-RoPE CTC ASR (LiquidAI LFM-style encoder).

TPU-first rebuild of the reference
(Sources/MLXAudioSTT/Models/LasrCTC/*): NeMo log-mel frontend (reused
from parakeet), a dense+2conv subsampler (4x), conformer blocks with
WEIGHTED residuals (ff residual 1.5/0.5, conv residual 2.0/1.0 from the
config, LasrCTCModel.swift:226-247), GQA rotary self-attention, GLU
depthwise conv module with BatchNorm, per-block out-norm, and a CTC
head decoded greedily.

The whole mel->logits pass is one jitted call over frame-count buckets.
"""

from __future__ import annotations

import functools
import math
import time
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import hub, loading, nn
from tpu_audio.core.audio_io import resample_audio
from tpu_audio.core.generation import (
    STTGenerateParameters,
    STTOutput,
    STTSegment,
)
from tpu_audio.models.stt import parakeet
from tpu_audio.core.jitting import ajit

__all__ = ["LasrCTC", "LasrConfig"]


@dataclass
class LasrConfig:
    """LasrCTCConfig.swift: encoder config flattened + vocab."""

    hidden_size: int = 512
    num_hidden_layers: int = 17
    num_attention_heads: int = 8
    num_key_value_heads: int = 8
    intermediate_size: int = 2048
    hidden_act: str = "silu"
    conv_kernel_size: int = 32
    convolution_bias: bool = False
    num_mel_bins: int = 128
    subsampling_conv_channels: int = 256
    subsampling_conv_kernel_size: int = 5
    subsampling_conv_stride: int = 2
    layer_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    conv_residual_weights: tuple = (2.0, 1.0)
    feed_forward_residual_weights: tuple = (1.5, 0.5)
    vocab_size: int = 512
    pad_token_id: int = 0

    @classmethod
    def from_dict(cls, d: dict) -> "LasrConfig":
        merged = dict(d)
        merged.update(d.get("encoder_config", d.get("encoder", {})))
        keys = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in merged.items() if k in keys}
        for k in ("conv_residual_weights", "feed_forward_residual_weights"):
            if k in kw:
                kw[k] = tuple(kw[k])
        return cls(**kw)


def _act(x, name: str):
    return jax.nn.relu(x) if name.lower() == "relu" else jax.nn.silu(x)


def _attention(p, x, cos, sin, cfg: LasrConfig, mask=None):
    """GQA + non-interleaved rope (LasrCTCModel.swift:99-130)."""
    b, t, _ = x.shape
    h, kvh = cfg.num_attention_heads, cfg.num_key_value_heads
    hd = cfg.hidden_size // h
    q = nn.linear(p["q_proj"], x).reshape(b, t, h, hd)
    k = nn.linear(p["k_proj"], x).reshape(b, t, kvh, hd)
    v = nn.linear(p["v_proj"], x).reshape(b, t, kvh, hd)

    def rope(z):
        z1, z2 = jnp.split(z, 2, axis=-1)
        rot = jnp.concatenate([-z2, z1], axis=-1)
        return z * cos[None, :, None, :] + rot * sin[None, :, None, :]

    q, k, v = rope(q).transpose(0, 2, 1, 3), rope(k).transpose(0, 2, 1, 3), \
        v.transpose(0, 2, 1, 3)
    o = nn.sdpa(q, k, v, mask=mask)
    return nn.linear(p["o_proj"], o.transpose(0, 2, 1, 3).reshape(b, t, -1))


def _conv_module(p, x, cfg: LasrConfig, valid=None):
    """GLU pointwise -> asymmetric-pad depthwise -> BN -> act -> pointwise
    (LasrCTCModel.swift:132-180). ``valid`` [T] zeroes bucket padding so
    the depthwise conv sees exactly the zeros the reference's edge pad
    would produce."""
    h = nn.conv1d(p["pointwise_conv1"], x)
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(g)
    if valid is not None:
        h = h * valid[None, :, None].astype(h.dtype)
    kernel = cfg.conv_kernel_size
    left = (kernel - 1) // 2
    h = jnp.pad(h, ((0, 0), (left, kernel - 1 - left), (0, 0)))
    h = nn.conv1d(p["depthwise_conv"], h, groups=h.shape[-1])
    h = nn.batch_norm(p["norm"], h)
    h = _act(h, cfg.hidden_act)
    return nn.conv1d(p["pointwise_conv2"], h)


def _ff(p, x, cfg: LasrConfig):
    return nn.linear(p["linear2"], _act(nn.linear(p["linear1"], x),
                                        cfg.hidden_act))


def _block(p, x, cos, sin, cfg: LasrConfig, valid=None, attn_mask=None):
    """Conformer block with weighted residuals
    (LasrCTCModel.swift:226-247)."""
    fw0, fw1 = cfg.feed_forward_residual_weights
    cw0, cw1 = cfg.conv_residual_weights
    eps = cfg.layer_norm_eps
    h = fw0 * x + fw1 * _ff(p["feed_forward1"],
                            nn.layer_norm(p["norm_feed_forward1"], x, eps=eps),
                            cfg)
    h = h + _attention(p["self_attn"],
                       nn.layer_norm(p["norm_self_att"], h, eps=eps),
                       cos, sin, cfg, mask=attn_mask)
    h = cw0 * h + cw1 * _conv_module(
        p["conv"], nn.layer_norm(p["norm_conv"], h, eps=eps), cfg,
        valid=valid)
    h = fw0 * h + fw1 * _ff(p["feed_forward2"],
                            nn.layer_norm(p["norm_feed_forward2"], h, eps=eps),
                            cfg)
    return nn.layer_norm(p["norm_out"], h, eps=eps)


def forward(params, feats, n_valid, cfg: LasrConfig):
    """mel [B, T, n_mels] (bucket-padded) + true frame count ->
    CTC logits [B, T/4, vocab] (LasrCTCModel.swift:265-296). Bucket
    padding is exact: padded keys are attention-masked and the conv
    modules see zeros there, so valid positions match an unpadded run."""
    p = params["encoder"]
    s = p["subsampler"]
    h = jax.nn.relu(nn.linear(s["dense_0"], feats))
    h = jax.nn.relu(nn.conv1d(s["conv_0"], h,
                              stride=cfg.subsampling_conv_stride))
    h = jax.nn.relu(nn.conv1d(s["conv_1"], h,
                              stride=cfg.subsampling_conv_stride))
    h = nn.linear(s["dense_1"], h)
    k, st = cfg.subsampling_conv_kernel_size, cfg.subsampling_conv_stride
    n_sub = ((n_valid - k) // st + 1 - k) // st + 1
    valid = jnp.arange(h.shape[1]) < n_sub
    attn_mask = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)[
        None, None, None, :]
    hd = cfg.hidden_size // cfg.num_attention_heads
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, hd, 2) / hd))
    ang = np.arange(h.shape[1])[:, None] * inv[None, :]
    emb = np.concatenate([ang, ang], axis=-1)
    cos = jnp.asarray(np.cos(emb), h.dtype)
    sin = jnp.asarray(np.sin(emb), h.dtype)
    for i in range(cfg.num_hidden_layers):
        h = _block(p["layers"][str(i)], h, cos, sin, cfg,
                   valid=valid, attn_mask=attn_mask)
    h = nn.layer_norm(p["out_norm"], h, eps=cfg.layer_norm_eps)
    return nn.linear(params["ctc_head"], h)


def sanitize(weights):
    """LasrCTCModel.swift:352-367 (inverted: checkpoints are torch-layout
    already, which is what our convs use): drop rope/bn counters, squeeze
    3-dim ctc head; MLX-converted conv weights [O, K, I] (kernel mid) are
    mapped back to torch [O, I, K] via the depthwise probe."""
    is_mlx = False
    for k, v in weights.items():
        if "depthwise_conv.weight" in k and v.ndim == 3:
            # torch depthwise is [C, 1, K]; MLX stores [C, K, 1]
            is_mlx = v.shape[2] == 1 and v.shape[1] != 1
            break
    out = {}
    for k, v in weights.items():
        if "rotary_emb.inv_freq" in k or k.endswith("num_batches_tracked"):
            continue
        if is_mlx and "conv" in k and k.endswith(".weight") and v.ndim == 3:
            v = np.transpose(v, (0, 2, 1))
        if k == "ctc_head.weight" and v.ndim == 3:
            v = v[..., 0]
        out[k] = v
    return out


class LasrCTC:
    def __init__(self, config: LasrConfig, params, tokenizer=None,
                 dtype=jnp.float32):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.dtype = dtype
        self.sample_rate = 16000
        self._forward = ajit(functools.partial(forward, cfg=config))
        self._pre = parakeet.PreprocessConfig(
            sample_rate=16000, normalize="per_feature", window_size=0.025,
            window_stride=0.01, window="hann",
            features=config.num_mel_bins, n_fft=512)

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32
                        ) -> "LasrCTC":
        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = LasrConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        tokenizer = None
        if (model_dir / "tokenizer.json").exists():
            from tokenizers import Tokenizer

            tokenizer = Tokenizer.from_file(str(model_dir / "tokenizer.json"))
        return cls(config, params, tokenizer, dtype)

    def _decode_tokens(self, ids: list[int]) -> str:
        if self.tokenizer is not None:
            return self.tokenizer.decode(ids)
        return " ".join(str(i) for i in ids)

    def generate(self, audio, generation_parameters:
                 STTGenerateParameters | None = None,
                 sample_rate: int | None = None) -> STTOutput:
        gp = generation_parameters or STTGenerateParameters()
        t0 = time.perf_counter()
        wf = np.asarray(audio, np.float32).reshape(-1)
        src = sample_rate or 16000
        if src != 16000:
            wf = resample_audio(wf, src, 16000)
        feats = np.asarray(parakeet.log_mel_spectrogram(wf, self._pre))
        if feats.ndim == 2:
            feats = feats[None]
        if feats.shape[1] == 0:
            return STTOutput(text="")
        bucket = max(16, 1 << (feats.shape[1] - 1).bit_length())
        padded = np.zeros((1, bucket, feats.shape[2]), np.float32)
        padded[0, :feats.shape[1]] = feats[0]
        logits = np.asarray(self._forward(
            self.params, jnp.asarray(padded, self.dtype),
            jnp.int32(feats.shape[1])))[0]
        k = self.config.subsampling_conv_kernel_size
        s = self.config.subsampling_conv_stride
        n1 = (feats.shape[1] - k) // s + 1
        n_out = (n1 - k) // s + 1
        best = logits[:max(n_out, 0)].argmax(-1).tolist()
        ids, prev = [], None
        for t in best:
            if t != prev and t != self.config.pad_token_id:
                ids.append(t)
            prev = t
        text = self._decode_tokens(ids)
        elapsed = time.perf_counter() - t0
        return STTOutput(
            text=text, language=gp.language,
            segments=[STTSegment(text=text, start=0.0,
                                 end=len(wf) / 16000, tokens=ids)],
            generation_token_count=len(ids),
            generation_time=elapsed, total_time=elapsed)

    def generate_stream(self, audio, generation_parameters=None, **kw):
        out = self.generate(audio, generation_parameters, **kw)
        if out.text:
            yield {"type": "token", "text": out.text}
        yield {"type": "result", "output": out}
