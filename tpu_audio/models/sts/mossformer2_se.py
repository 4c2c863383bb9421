"""MossFormer2-SE: 48 kHz speech enhancement (mask-based, FLASH/GAU
attention + gated FSMN).

TPU-first rebuild of the reference
(Sources/MLXAudioSTS/Models/MossFormer2SE/*): Kaldi fbank (HTK mel,
fmin=20, unnormalized, pow2 FFT) + Kaldi delta/delta-delta features
(edge-padded [-h..h]/denom conv) -> a MossFormer mask net: global
LayerNorm, 1x1 encoder, scaled sinusoidal positions, N blocks of
[FLASH_ShareA GAU attention (token-shift, quad relu^2 in-group + linear
global attention, 4-way offset-scaled qk, partial traditional rope) +
gated FSMN block], gated 1x1 output stack producing a 961-bin magnitude
mask for speaker 0 (MossFormer2Model.swift:76-199). The mask multiplies
a center=false STFT and the result is inverted by window^2-normalized
OLA (MossFormer2DSP.swift:54-154).

Everything is channels-last [B, T, C]; the reference's NCL<->NLC
transposes vanish. The whole feature->mask->wave pass is jitted per
frame-count bucket.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import dsp, hub, loading, nn
from tpu_audio.core.audio_io import resample_audio
from tpu_audio.core.jitting import ajit

__all__ = ["MossFormer2SE", "MossFormer2SEConfig"]


@dataclass
class MossFormer2SEConfig:
    """MossFormer2Config.swift:24-84."""

    sample_rate: int = 48000
    win_len: int = 1920
    win_inc: int = 384
    fft_len: int = 1920
    num_mels: int = 60
    win_type: str = "hamming"
    preemphasis: float = 0.97
    in_channels: int = 180
    out_channels: int = 512
    out_channels_final: int = 961
    num_blocks: int = 24
    group_size: int = 256
    query_key_dim: int = 128

    @classmethod
    def from_dict(cls, d: dict) -> "MossFormer2SEConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


# -- features ----------------------------------------------------------------------


def _window(win_type: str, n: int):
    if "hann" in win_type.lower():
        return jnp.asarray(np.hanning(n), jnp.float32)
    return jnp.asarray(np.hamming(n), jnp.float32)


def kaldi_fbank(audio, cfg: MossFormer2SEConfig):
    """int16-scaled waveform -> log-fbank [T, num_mels]
    (MossFormer2DSP.swift:156-234)."""
    win, inc = cfg.win_len, cfg.win_inc
    if audio.shape[0] < win:
        return jnp.zeros((0, cfg.num_mels), jnp.float32)
    n = 1 + (audio.shape[0] - win) // inc
    idx = jnp.arange(n)[:, None] * inc + jnp.arange(win)[None, :]
    frames = audio[idx]
    frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    p = cfg.preemphasis
    frames = jnp.concatenate(
        [frames[:, :1] * (1.0 - p), frames[:, 1:] - p * frames[:, :-1]],
        axis=1)
    n_fft = 1 << max(0, (win - 1)).bit_length()
    spec = jnp.abs(jnp.fft.rfft(frames * _window(cfg.win_type, win),
                                n=n_fft, axis=1)) ** 2
    bank = jnp.asarray(dsp.mel_filters(cfg.sample_rate, n_fft, cfg.num_mels,
                                       f_min=20.0, norm=None,
                                       mel_scale="htk"))
    return jnp.log(jnp.maximum(spec @ bank, 1e-10))


def kaldi_deltas(feats, win_length: int = 5):
    """[T, C] -> [T, C] finite-difference deltas, edge padding
    (MossFormer2DSP.swift:236-304)."""
    half = max(win_length // 2, 1)
    denom = 2.0 * sum(i * i for i in range(1, half + 1))
    kernel = jnp.asarray([i / denom for i in range(-half, half + 1)],
                         jnp.float32)
    c = feats.shape[1]
    x = jnp.pad(feats[None], ((0, 0), (half, half), (0, 0)), mode="edge")
    w = jnp.broadcast_to(kernel[None, None, :], (c, 1, 2 * half + 1))
    return nn.conv1d({"weight": w}, x, groups=c)[0]


# -- layers ------------------------------------------------------------------------


def _scale_norm(p, x, dim: int):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)) * dim ** -0.5
    return x * (p["g"] / jnp.maximum(norm, 1e-8))


def _ff_convm(p, x, norm_type: str = "scalenorm"):
    """norm -> linear -> silu -> residual depthwise k17 conv
    (MossFormer2Layers.swift:133-180)."""
    if norm_type == "scalenorm":
        h = _scale_norm(p["norm"], x, x.shape[-1])
    else:
        h = nn.layer_norm(p["norm"], x)
    h = jax.nn.silu(nn.linear(p["linear"], h))
    c = h.shape[-1]
    k = p["conv_module"]["weight"].shape[1]
    w = jnp.transpose(p["conv_module"]["weight"], (0, 2, 1))  # [C,K,1]->[C,1,K]
    return h + nn.conv1d({"weight": w}, h, padding=(k - 1) // 2, groups=c)


def _partial_rope(x, dims: int):
    """Traditional (interleaved) rope on the first `dims` channels of
    [B, T, D] (MLX RoPE with dimensions=min(32, qk_dim))."""
    b, t, d = x.shape
    rot, rest = x[..., :dims], x[..., dims:]
    inv = 1.0 / (10000.0 ** (np.arange(0, dims, 2) / dims))
    ang = np.arange(t)[:, None] * inv[None, :]
    cos = jnp.asarray(np.cos(ang), jnp.float32)
    sin = jnp.asarray(np.sin(ang), jnp.float32)
    r = nn.apply_rope(rot[:, None], cos, sin, interleaved=True)[:, 0]
    return jnp.concatenate([r, rest.astype(r.dtype)], axis=-1)


def _flash_block(p, x, cfg: MossFormer2SEConfig):
    """FLASH_ShareA_FFConvM (MossFormer2Layers.swift:313-477)."""
    g = cfg.group_size
    qk_dim = cfg.query_key_dim
    b, n, d = x.shape
    # token shift on the first half of channels
    half1, half2 = jnp.split(x, 2, axis=-1)
    shifted = jnp.pad(half1[:, :-1], ((0, 0), (1, 0), (0, 0)))
    normed = jnp.concatenate([shifted, half2], axis=-1)
    hidden = _ff_convm(p["to_hidden"], normed)
    v, u = jnp.split(hidden, 2, axis=-1)
    qk = _ff_convm(p["to_qk"], normed)
    heads = qk[..., None, :] * p["qk_offset_scale"]["gamma"] \
        + p["qk_offset_scale"]["beta"]
    quad_q, lin_q, quad_k, lin_k = [heads[..., i, :] for i in range(4)]
    rd = min(32, qk_dim)
    quad_q, lin_q = _partial_rope(quad_q, rd), _partial_rope(lin_q, rd)
    quad_k, lin_k = _partial_rope(quad_k, rd), _partial_rope(lin_k, rd)
    pad = (g - n % g) % g
    if pad:
        padw = ((0, 0), (0, pad), (0, 0))
        quad_q, lin_q = jnp.pad(quad_q, padw), jnp.pad(lin_q, padw)
        quad_k, lin_k = jnp.pad(quad_k, padw), jnp.pad(lin_k, padw)
        v_p, u_p = jnp.pad(v, padw), jnp.pad(u, padw)
    else:
        v_p, u_p = v, u
    ng = quad_q.shape[1] // g

    def grouped(z):
        return z.reshape(b, ng, g, z.shape[-1])

    qq, qk_g = grouped(quad_q), grouped(quad_k)
    sim = jnp.einsum("bngd,bnhd->bngh", qq, qk_g) / g
    attn = jnp.maximum(sim, 0.0) ** 2
    quad_v = jnp.einsum("bngh,bnhd->bngd", attn, grouped(v_p))
    quad_u = jnp.einsum("bngh,bnhd->bngd", attn, grouped(u_p))
    # linear (global) branch
    lin_kv = jnp.einsum("btd,bte->bde", lin_k, v_p) / n
    lin_ku = jnp.einsum("btd,bte->bde", lin_k, u_p) / n
    out_v = quad_v.reshape(b, -1, v.shape[-1]) + lin_q @ lin_kv
    out_u = quad_u.reshape(b, -1, u.shape[-1]) + lin_q @ lin_ku
    if pad:
        out_v, out_u = out_v[:, :n], out_u[:, :n]
    out = (out_u * v) * jax.nn.sigmoid(out_v * u)
    return x + _ff_convm(p["to_out"], out)


def _prelu(p, x):
    return jnp.maximum(x, 0.0) + p["weight"] * jnp.minimum(x, 0.0)


def _clayer_norm(p, x):
    return nn.layer_norm(p, x, eps=1e-8)


def _uni_deep_fsmn(p, x, lorder: int = 20):
    """linear -> relu -> project -> causal+anticausal depthwise memory
    (MossFormer2Layers.swift:200-236)."""
    f1 = jax.nn.relu(nn.linear(p["linear"], x))
    p1 = nn.linear(p["project"], f1)
    c = p1.shape[-1]
    w = p["conv1"]["weight"][..., 0]  # [C, K, 1, 1] -> [C, K] after squeeze
    if w.ndim == 3:
        w = w[..., 0]
    k = w.shape[1]
    padded = jnp.pad(p1, ((0, 0), (lorder - 1, lorder - 1), (0, 0)))
    mem = nn.conv1d({"weight": w[:, None, :]}, padded, groups=c)
    out = p1 + mem
    return x + out  # input_dim == output_dim in SE configs


def _gated_fsmn_block(p, x, cfg: MossFormer2SEConfig):
    """conv1 -> prelu -> norm -> gated fsmn -> norm -> conv2 + residual
    (MossFormer2Layers.swift:272-300)."""
    h = nn.conv1d(p["conv1"], x)
    h = _prelu(p["prelu"], h)
    h = _clayer_norm(p["norm1"], h)
    gf = p["gated_fsmn"]
    xu = _ff_convm(gf["to_u"], h, norm_type="layernorm")
    xv = _ff_convm(gf["to_v"], h, norm_type="layernorm")
    xu = _uni_deep_fsmn(gf["fsmn"], xu)
    h = xv * xu + h
    h = _clayer_norm(p["norm2"], h)
    return nn.conv1d(p["conv2"], h) + x


def mask_net_forward(params, feats, cfg: MossFormer2SEConfig):
    """features [B, T, in_channels] -> magnitude mask [B, T, bins]
    (MossFormer2Model.swift:76-217)."""
    p = params["model"]["mossformer"]
    # GlobalLayerNorm over (T, C) with per-channel affine
    xf = feats.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 2), keepdims=True)
    x = (xf - mean) * jax.lax.rsqrt(var + 1e-8)
    x = x * p["norm"]["weight"].reshape(-1) + p["norm"]["bias"].reshape(-1)
    x = nn.conv1d(p["conv1d_encoder"], x)
    # scaled sinusoidal positions
    d = x.shape[-1]
    inv = p["pos_enc"]["inv_freq"]
    pos = jnp.arange(x.shape[1], dtype=jnp.float32)[:, None] * inv[None, :]
    emb = jnp.concatenate([jnp.sin(pos), jnp.cos(pos)], axis=-1) \
        * p["pos_enc"]["scale"]
    x = x + emb[None]
    # computation block: N x (flash + gated fsmn), final LNs, skip
    m = p["mdl"]["intra_mdl"]["mossformerM"]
    h = x
    for i in range(cfg.num_blocks):
        h = _flash_block(m["layers"][str(i)], h, cfg)
        h = _gated_fsmn_block(m["fsmn"][str(i)], h, cfg)
    h = nn.layer_norm(p["mdl"]["intra_mdl"]["norm"], h, eps=1e-8)
    h = nn.layer_norm(p["mdl"]["intra_norm"], h, eps=1e-8)
    x = h + x
    x = _prelu(p["prelu"], x)
    x = nn.conv1d(p["conv1d_out"], x)  # [B, T, out*2spk]
    b, t, _ = x.shape
    x = x.reshape(b, t, 2, cfg.out_channels).transpose(0, 2, 1, 3)
    x = x.reshape(b * 2, t, cfg.out_channels)
    gate = jnp.tanh(nn.conv1d(p["output"], x)) \
        * jax.nn.sigmoid(nn.conv1d(p["output_gate"], x))
    x = nn.conv1d(p["conv1_decoder"], gate)
    x = jax.nn.relu(x.reshape(b, 2, t, cfg.out_channels_final))
    return x[:, 0]  # speaker 0 mask [B, T, bins]


def sanitize(weights):
    """MossFormer2Model.swift:267-289: strip module., mossformer.* ->
    model.mossformer.*; MLX conv layouts -> torch where needed."""
    out = {}
    for k, v in weights.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.startswith("mossformer."):
            k = "model." + k
        # k=1 convs: MLX [O, 1, I] == torch [O, 1? ...]: for kernel-1 convs
        # MLX [O,K=1,I] -> torch [O,I,K=1]
        if (k.endswith(".weight") and v.ndim == 3
                and ("conv1d" in k or ".conv1." in k.replace("fsmn", "")
                     or "output" in k or "conv2" in k or "conv1_decoder" in k)
                and "conv_module" not in k and "gated_fsmn.fsmn" not in k
                and v.shape[1] == 1 and v.shape[2] > 1):
            v = np.transpose(v, (0, 2, 1))
        out[k] = v
    return out


class MossFormer2SE:
    def __init__(self, config: MossFormer2SEConfig, params,
                 dtype=jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        self.sample_rate = config.sample_rate
        self._mask = ajit(functools.partial(mask_net_forward, cfg=config))

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32
                        ) -> "MossFormer2SE":
        model_dir = hub.resolve_or_download_model(repo_or_path)
        config = MossFormer2SEConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        return cls(config, params, dtype)

    def _features(self, audio):
        fb = kaldi_fbank(audio, self.config)
        d1 = kaldi_deltas(fb)
        d2 = kaldi_deltas(d1)
        return jnp.concatenate([fb, d1, d2], axis=-1)

    def enhance(self, audio, sample_rate: int | None = None) -> np.ndarray:
        """noisy waveform -> enhanced waveform
        (MossFormer2Model.swift:395-470)."""
        cfg = self.config
        wf = np.asarray(audio, np.float32).reshape(-1)
        src = sample_rate or cfg.sample_rate
        if src != cfg.sample_rate:
            wf = resample_audio(wf, src, cfg.sample_rate)
        x = jnp.asarray(wf * 32768.0)
        feats = self._features(x)
        if feats.shape[0] == 0:
            return np.zeros_like(wf)
        mask = np.asarray(self._mask(self.params,
                                     feats[None].astype(self.dtype)))[0]
        # STFT center=false, window zero-padded/truncated to win_len
        win = _window(cfg.win_type, cfg.win_len)
        n = 1 + (x.shape[0] - cfg.win_len) // cfg.win_inc
        idx = jnp.arange(n)[:, None] * cfg.win_inc \
            + jnp.arange(cfg.win_len)[None, :]
        frames = x[idx] * win
        spec = jnp.fft.rfft(frames, n=cfg.fft_len, axis=1)
        t = min(spec.shape[0], mask.shape[0])
        enhanced = np.asarray(spec[:t]) * mask[:t]
        # inverse: window^2-normalized OLA
        frames_t = np.fft.irfft(enhanced, n=cfg.fft_len, axis=1)[
            :, : cfg.win_len] * np.asarray(win)
        out_len = (t - 1) * cfg.win_inc + cfg.win_len
        out = np.zeros(out_len, np.float32)
        wsum = np.zeros(out_len, np.float32)
        w2 = np.asarray(win) ** 2
        for i in range(t):
            s = i * cfg.win_inc
            out[s:s + cfg.win_len] += frames_t[i]
            wsum[s:s + cfg.win_len] += w2
        out = out / np.maximum(wsum, 1e-8)
        out = out[: len(wf)]
        if len(out) < len(wf):
            # center=false STFT drops the sub-hop tail; keep output aligned
            # with the input (the reference returns the shorter signal)
            out = np.pad(out, (0, len(wf) - len(out)))
        return out / 32768.0

    # STS CLI compatibility
    def enhance_streaming(self, audio, chunk_seconds: float = 4.0,
                          sample_rate: int | None = None):
        cfg = self.config
        step = int(chunk_seconds * cfg.sample_rate)
        wf = np.asarray(audio, np.float32).reshape(-1)
        for s in range(0, len(wf), step):
            yield self.enhance(wf[s:s + step], sample_rate)
