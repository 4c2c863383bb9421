"""EnCodec: SEANet encoder/decoder + residual VQ neural audio codec.

TPU-first rebuild of the reference
(Sources/MLXAudioCodecs/Encodec/*): channels-last [B, T, C] SEANet with
causal (or asymmetric) reflect padding and "ideal length" extra padding
(EncodecLayers.swift:90-212), 2-layer residual LSTM bottleneck blocks,
transposed convs trimmed by ``trim_right_ratio`` on the causal side, a
Euclidean-distance residual vector quantizer whose active depth is set
by the target bandwidth (EncodecQuantization.swift:67-134), optional
per-chunk RMS normalization with scales returned next to the codes, and
triangular-window linear overlap-add for chunked decode
(Encodec.swift:304-363).

Unlike the reference's per-layer Swift loops (and its scalar host
transposed conv), everything here is vectorized jax: convs via lax
conv_general_dilated, the LSTM as a lax.scan with hoisted input matmul,
and the full encode/decode of one frame as a single jitted graph.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.codecs import AudioCodecModel
from tpu_audio.core import hub, loading, nn
from tpu_audio.core.jitting import ajit

__all__ = ["Encodec", "EncodecConfig"]


@dataclass
class EncodecConfig:
    """EncodecConfig.swift:12-142 (HF transformers EncodecConfig keys)."""

    audio_channels: int = 1
    num_filters: int = 32
    kernel_size: int = 7
    num_residual_layers: int = 1
    dilation_growth_rate: int = 2
    codebook_size: int = 1024
    codebook_dim: int = 128
    hidden_size: int = 128
    num_lstm_layers: int = 2
    residual_kernel_size: int = 3
    use_causal_conv: bool = True
    normalize: bool = False
    pad_mode: str = "reflect"
    norm_type: str = "weight_norm"
    last_kernel_size: int = 7
    trim_right_ratio: float = 1.0
    compress: int = 2
    upsampling_ratios: tuple = (8, 5, 4, 2)
    target_bandwidths: tuple = (1.5, 3.0, 6.0, 12.0, 24.0)
    sampling_rate: int = 24000
    chunk_length_s: float | None = None
    overlap: float | None = None
    use_conv_shortcut: bool = True

    @classmethod
    def from_dict(cls, d: dict) -> "EncodecConfig":
        keys = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in d.items() if k in keys}
        for k in ("upsampling_ratios", "target_bandwidths"):
            if k in kw:
                kw[k] = tuple(kw[k])
        return cls(**kw)

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.upsampling_ratios))

    @property
    def frame_rate(self) -> int:
        return math.ceil(self.sampling_rate / self.hop_length)

    @property
    def num_quantizers(self) -> int:
        return int(1000 * max(self.target_bandwidths)
                   / (self.frame_rate * 10))

    @property
    def chunk_length(self) -> int | None:
        if self.chunk_length_s is None:
            return None
        return int(self.chunk_length_s * self.sampling_rate)

    @property
    def chunk_stride(self) -> int | None:
        if self.chunk_length_s is None or self.overlap is None:
            return None
        return max(1, int((1.0 - self.overlap) * self.chunk_length))


# -- layout ------------------------------------------------------------------------
# SEANet layers live in a flat indexed list where parameterless ELU
# modules also consume an index (Encodec.swift:17-170); these builders
# reproduce the exact index assignment so checkpoint keys line up.


def encoder_layout(cfg: EncodecConfig):
    out = [("conv", cfg.kernel_size, 1, 1)]
    scaling = 1
    for ratio in reversed(cfg.upsampling_ratios):
        dim = scaling * cfg.num_filters
        for j in range(cfg.num_residual_layers):
            out.append(("resnet", dim, cfg.dilation_growth_rate ** j))
        out.append(("elu",))
        out.append(("conv", ratio * 2, ratio, 1))
        scaling *= 2
    out.append(("lstm",))
    out.append(("elu",))
    out.append(("conv", cfg.last_kernel_size, 1, 1))
    return out


def decoder_layout(cfg: EncodecConfig):
    out = [("conv", cfg.kernel_size, 1, 1), ("lstm",)]
    scaling = 2 ** len(cfg.upsampling_ratios)
    for ratio in cfg.upsampling_ratios:
        dim = scaling * cfg.num_filters
        out.append(("elu",))
        out.append(("convt", ratio * 2, ratio))
        for j in range(cfg.num_residual_layers):
            out.append(("resnet", dim // 2, cfg.dilation_growth_rate ** j))
        scaling //= 2
    out.append(("elu",))
    out.append(("conv", cfg.last_kernel_size, 1, 1))
    return out


# -- layers ------------------------------------------------------------------------


def _elu(x):
    return jnp.where(x > 0, x, jnp.exp(x) - 1.0)


def _pad1d(x, left: int, right: int, mode: str):
    """Pad axis 1 of [B, T, C]; reflect indices clamp like the reference
    (EncodecLayers.swift:144-184) so tiny inputs stay valid."""
    if left == 0 and right == 0:
        return x
    if mode != "reflect":
        return jnp.pad(x, ((0, 0), (left, right), (0, 0)))
    t = x.shape[1]
    li = np.minimum(left - np.arange(left), t - 1)
    ri = np.maximum(t - 2 - np.arange(right), 0)
    idx = np.concatenate([li, np.arange(t), ri])
    return x[:, idx]


def _conv1d(p, x, cfg: EncodecConfig, kernel: int, stride: int = 1,
            dilation: int = 1):
    """EncodecConv1d (EncodecLayers.swift:92-212): ideal-length extra pad,
    causal-left or split padding, optional time_group_norm."""
    k_eff = (kernel - 1) * dilation + 1
    pad_total = kernel - stride
    length = x.shape[1]
    n_frames = (length - k_eff + pad_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + k_eff - pad_total
    extra = max(0, ideal - length)
    if cfg.use_causal_conv:
        x = _pad1d(x, pad_total, extra, cfg.pad_mode)
    else:
        right = pad_total // 2
        x = _pad1d(x, pad_total - right, right + extra, cfg.pad_mode)
    h = nn.conv1d(p["conv"], x, stride=stride, dilation=dilation)
    if cfg.norm_type == "time_group_norm":
        h = nn.group_norm(p["norm"], h, num_groups=1)
    return h


def _convt1d(p, x, cfg: EncodecConfig, kernel: int, stride: int):
    """EncodecConvTranspose1dLayer (EncodecLayers.swift:216-373)."""
    h = nn.conv_transpose1d(p["conv"], x, stride=stride)
    if cfg.norm_type == "time_group_norm":
        h = nn.group_norm(p["norm"], h, num_groups=1)
    pad_total = kernel - stride
    if cfg.use_causal_conv:
        right = math.ceil(pad_total * cfg.trim_right_ratio)
    else:
        right = pad_total // 2
    left = pad_total - right
    end = h.shape[1] - right
    if end > left:
        h = h[:, left:end]
    return h


def _resnet_block(p, x, cfg: EncodecConfig, dilation: int):
    """SEANet residual block (EncodecLayers.swift:377-437): block list is
    [ELU, conv, ELU, conv] so convs sit at indices 1 and 3."""
    h = _conv1d(p["block"]["1"], _elu(x), cfg, cfg.residual_kernel_size,
                dilation=dilation)
    h = _conv1d(p["block"]["3"], _elu(h), cfg, 1)
    if cfg.use_conv_shortcut:
        return _conv1d(p["shortcut"], x, cfg, 1) + h
    return x + h


def _lstm_block(p, x, cfg: EncodecConfig):
    """num_lstm_layers stacked LSTMs + residual
    (EncodecLayers.swift:15-89)."""
    h = x
    for i in range(cfg.num_lstm_layers):
        h, _ = nn.lstm(p["lstm"][str(i)], h)
    return h + x


def _run_layout(params, x, cfg: EncodecConfig, layout):
    h = x
    for i, spec in enumerate(layout):
        p = params.get(str(i))
        if spec[0] == "conv":
            h = _conv1d(p, h, cfg, spec[1], stride=spec[2], dilation=spec[3])
        elif spec[0] == "convt":
            h = _convt1d(p, h, cfg, spec[1], spec[2])
        elif spec[0] == "resnet":
            h = _resnet_block(p, h, cfg, spec[2])
        elif spec[0] == "lstm":
            h = _lstm_block(p, h, cfg)
        else:  # elu
            h = _elu(h)
    return h


# -- quantizer ---------------------------------------------------------------------


def rvq_encode(params, emb, n_q: int):
    """[B, T, D] -> codes [B, n_q, T] (EncodecQuantization.swift:99-115)."""
    residual = emb.astype(jnp.float32)
    codes = []
    for i in range(n_q):
        embed = params["layers"][str(i)]["codebook"]["embed"].astype(
            jnp.float32)
        d = (jnp.sum(residual ** 2, axis=-1, keepdims=True)
             - 2.0 * residual @ embed.T
             + jnp.sum(embed ** 2, axis=-1)[None, None])
        idx = jnp.argmin(d, axis=-1)
        codes.append(idx)
        residual = residual - embed[idx]
    return jnp.stack(codes, axis=1).astype(jnp.int32)


def rvq_decode(params, codes):
    """codes [B, n_q, T] -> [B, T, D] (EncodecQuantization.swift:118-133)."""
    out = None
    for i in range(codes.shape[1]):
        embed = params["layers"][str(i)]["codebook"]["embed"]
        q = embed[codes[:, i]]
        out = q if out is None else out + q
    return out


def linear_overlap_add(frames: list[np.ndarray], stride: int) -> np.ndarray:
    """Triangular-weight OLA over decoded chunks [B, T, C]
    (Encodec.swift:304-363)."""
    b, flen, c = frames[0].shape
    total = stride * (len(frames) - 1) + frames[-1].shape[1]
    t = (np.arange(1, flen + 1, dtype=np.float32)) / (flen + 1)
    w = 0.5 - np.abs(t - 0.5)
    out = np.zeros((b, total, c), np.float32)
    wsum = np.zeros(total, np.float32)
    off = 0
    for f in frames:
        n = f.shape[1]
        out[:, off:off + n] += w[:n, None] * np.asarray(f)
        wsum[off:off + n] += w[:n]
        off += stride
    return out / np.maximum(wsum, 1e-12)[None, :, None]


def sanitize(weights):
    """MLX checkpoint layouts -> torch layouts: conv [O,K,I] -> [O,I,K],
    conv transpose [O,K,I] -> [I,O,K], lstm Wx/Wh/bias -> torch names."""
    out = {}
    for k, v in weights.items():
        if k.endswith(".conv.weight") and v.ndim == 3:
            # heuristic: MLX stores [O, K, I]; torch [O, I, K]. In MLX the
            # middle axis is the (small) kernel; detect by the decoder's
            # transposed convs separately below.
            v = np.transpose(v, (0, 2, 1))
        if k.endswith(".Wx"):
            k = k[:-3] + ".weight_ih"
        elif k.endswith(".Wh"):
            k = k[:-3] + ".weight_hh"
        elif ".lstm." in k and k.endswith(".bias"):
            k = k[:-5] + ".bias_ih"
        out[k] = v
    return out


class Encodec(AudioCodecModel):
    """facebook/encodec_24khz-style codec (mono) and encodec_48khz
    (stereo, chunked + normalized)."""

    def __init__(self, config: EncodecConfig, params, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        self.sample_rate = config.sampling_rate
        self._enc_layout = encoder_layout(config)
        self._dec_layout = decoder_layout(config)
        self._encode_frame = ajit(self._encode_frame_impl,
                                     static_argnums=(2,))
        self._decode_frame = ajit(self._decode_frame_impl)

    # decoder conv-transpose indices need layout-aware sanitizing, so the
    # class wires it up with the config in hand
    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32
                        ) -> "Encodec":
        model_dir = hub.resolve_or_download_model(repo_or_path)
        config = EncodecConfig.from_dict(hub.load_config(model_dir))
        convt_prefixes = tuple(
            f"decoder.layers.{i}." for i, spec in
            enumerate(decoder_layout(config)) if spec[0] == "convt")

        def _sanitize(weights):
            w = sanitize(weights)
            out = {}
            for k, v in w.items():
                if k.startswith(convt_prefixes) and k.endswith("conv.weight"):
                    # sanitize() mapped [O,K,I]->[O,I,K]; torch convT wants
                    # [I, O, K]
                    v = np.transpose(v, (1, 0, 2))
                out[k] = v
            return out

        params = loading.load_params(model_dir, sanitize=_sanitize,
                                     dtype=dtype)
        return cls(config, params, dtype)

    # -- frame-level (jitted) -----------------------------------------------------

    def _encode_frame_impl(self, params, frame, n_q: int):
        cfg = self.config
        scale = None
        if cfg.normalize:
            mono = jnp.mean(frame, axis=2, keepdims=True)
            scale = jnp.sqrt(jnp.mean(mono ** 2, axis=1, keepdims=True)) + 1e-8
            frame = frame / scale
        emb = _run_layout(params["encoder"]["layers"], frame, cfg,
                          self._enc_layout)
        codes = rvq_encode(params["quantizer"], emb, n_q)
        return codes, scale

    def _decode_frame_impl(self, params, codes):
        emb = rvq_decode(params["quantizer"], codes).astype(self.dtype)
        return _run_layout(params["decoder"]["layers"], emb, self.config,
                           self._dec_layout)

    # -- public API ----------------------------------------------------------------

    def n_quantizers_for_bandwidth(self, bandwidth: float | None) -> int:
        cfg = self.config
        if bandwidth is None or bandwidth <= 0:
            return cfg.num_quantizers
        bw_per_q = math.log2(cfg.codebook_size) * cfg.frame_rate
        return min(cfg.num_quantizers,
                   max(1, int(bandwidth * 1000 / bw_per_q)))

    def encode(self, audio, bandwidth: float | None = None):
        """audio [B, T, C] (or [T]) -> (codes [chunks, B, n_q, frames],
        scales list) (Encodec.swift:248-290)."""
        cfg = self.config
        x = jnp.asarray(audio, self.dtype)
        if x.ndim == 1:
            x = x[None, :, None]
        elif x.ndim == 2:
            x = x[None]
        bw = bandwidth if bandwidth is not None else cfg.target_bandwidths[0]
        if bw not in cfg.target_bandwidths:
            raise ValueError(
                f"bandwidth {bw} not in {cfg.target_bandwidths}")
        n_q = self.n_quantizers_for_bandwidth(bw)
        length = x.shape[1]
        chunk = cfg.chunk_length or length
        stride = cfg.chunk_stride or length
        codes, scales = [], []
        offset = 0
        step = chunk - stride
        while offset < length - step:
            frame = x[:, offset:offset + chunk]
            c, s = self._encode_frame(self.params, frame, n_q)
            codes.append(c)
            scales.append(s)
            offset += stride
        return jnp.stack(codes, axis=0), scales

    def decode(self, codes, scales=None):
        """codes [chunks, B, n_q, frames] (or the (codes, scales) tuple
        that ``encode`` returns) -> audio [B, T, C]
        (Encodec.swift:366-398)."""
        cfg = self.config
        if isinstance(codes, tuple):
            codes, scales = codes
        codes = jnp.asarray(codes)
        if codes.ndim == 3:
            codes = codes[None]
        scales = scales or [None] * codes.shape[0]
        frames = []
        for i in range(codes.shape[0]):
            out = self._decode_frame(self.params, codes[i])
            if scales[i] is not None:
                out = out * scales[i]
            frames.append(np.asarray(out, np.float32))
        if cfg.chunk_length is None:
            return frames[0]
        return linear_overlap_add(frames, cfg.chunk_stride or 1)

    def reconstruct(self, audio):
        codes, scales = self.encode(audio)
        return self.decode(codes, scales)
