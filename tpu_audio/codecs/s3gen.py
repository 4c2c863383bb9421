"""S3Gen token2wav stack: conformer encoder + flow matching + HiFT vocoder
+ CAMPPlus speaker encoder.

TPU-first rebuild of the reference S3Gen
(Sources/MLXAudioCodecs/S3Gen/*): the token->waveform pipeline shared by
Chatterbox and Step-Audio-2. Speech tokens are embedded, upsampled 2x by a
conformer encoder (ConformerEncoder.swift:702-930), decoded to mel by flow
matching — either the Chatterbox causal U-Net (FlowMatching.swift:470-818)
or the Step-Audio-2 adaLN DiT (StepAudio2.swift:288-409) — and vocoded by
HiFT (HiFi-GAN + neural source filter, HiFTGenerator.swift:469-719).
CAMPPlus (CAMPPlus.swift:594-723) extracts 192-d x-vectors from Kaldi
fbanks for speaker conditioning.

TPU design deltas: everything runs channels-last ([B, T, C]) — the
reference ping-pongs (B,C,T)<->(B,T,C) around every conv
(FlowMatching.swift:60-65); the Euler ODE solvers run as jitted
``lax.fori_loop``s over a precomputed t_span instead of per-step host
round trips.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import dsp, hub, nn
from tpu_audio.core.jitting import ajit

__all__ = [
    "s3gen_mel_spectrogram", "kaldi_fbank", "campplus_forward",
    "conformer_encoder_forward", "unet_estimator_forward", "cfm_solve",
    "dit_estimator_forward", "hift_forward", "StepAudio2Token2Wav",
    "S3Token2Mel", "sanitize_flow", "sanitize_hift", "sanitize_campplus",
]


# ---------------------------------------------------------------------------
# Mel frontend (S3GenMel.swift:41-88)
# ---------------------------------------------------------------------------


def s3gen_mel_spectrogram(y: np.ndarray, n_fft: int = 1920,
                          num_mels: int = 80, sampling_rate: int = 24000,
                          hop_size: int = 480, fmin: int = 0,
                          fmax: int = 8000) -> np.ndarray:
    """waveform [T] -> log-mel [T', num_mels] (channels-last)."""
    y = np.asarray(y, np.float32).reshape(-1)
    pad = (n_fft - hop_size) // 2
    padded = np.concatenate([y[1: pad + 1][::-1], y,
                             y[-(pad + 1): -1][::-1]])
    window = dsp.hanning_window(n_fft, periodic=True)
    spec = dsp.stft(jnp.asarray(padded), window, n_fft, hop_size,
                    center=False)
    mag = jnp.abs(spec)
    filters = jnp.asarray(dsp.mel_filters(
        sampling_rate, n_fft, num_mels, f_min=fmin, f_max=fmax,
        norm="slaney", mel_scale="slaney"))
    mel = jnp.log(jnp.maximum(mag @ filters, 1e-5))
    return np.asarray(mel)


def kaldi_fbank(audio: np.ndarray, sample_rate: int = 16000,
                num_mels: int = 80) -> np.ndarray:
    """Kaldi-compatible log fbank [T, num_mels]: povey window, DC removal,
    pre-emphasis 0.97, HTK mel fmin=20 (kaldiFbank, CAMPPlus.swift:13-74)."""
    audio = np.asarray(audio, np.float32).reshape(-1)
    frame_len, frame_shift = 400, 160
    n_fft = 512
    n_frames = max(1, 1 + (len(audio) - frame_len) // frame_shift)
    idx = (np.arange(n_frames)[:, None] * frame_shift
           + np.arange(frame_len)[None, :])
    frames = audio[idx]
    frames = frames - frames.mean(axis=1, keepdims=True)
    frames = np.concatenate(
        [frames[:, :1], frames[:, 1:] - 0.97 * frames[:, :-1]], axis=1)
    n = np.arange(frame_len, dtype=np.float32)
    povey = (0.5 * (1 - np.cos(2 * np.pi * n / (frame_len - 1)))) ** 0.85
    frames = frames * povey
    frames = np.pad(frames, ((0, 0), (0, n_fft - frame_len)))
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    filters = dsp.mel_filters(sample_rate, n_fft, num_mels, f_min=20.0,
                              f_max=sample_rate / 2.0, norm=None,
                              mel_scale="htk")
    return np.log(np.maximum(power @ filters, 1.1920929e-07)).astype(
        np.float32)


# ---------------------------------------------------------------------------
# CAMPPlus x-vector speaker encoder (CAMPPlus.swift:594-723)
# ---------------------------------------------------------------------------


def _bn_relu(p, x, ops=("batchnorm", "relu")):
    for i, op in enumerate(ops):
        if op == "batchnorm":
            x = nn.batch_norm(p[str(i)], x)
        else:
            x = jax.nn.relu(x)
    return x


def _basic_res_block(p, x, stride: int):
    """2D res block on NHWC [B, F, T, C]; stride applies to F only."""
    h = jax.nn.relu(nn.batch_norm(p["bn1"], nn.conv2d(
        p["conv1"], x, stride=(stride, 1), padding=(1, 1))))
    h = nn.batch_norm(p["bn2"], nn.conv2d(p["conv2"], h, padding=(1, 1)))
    identity = x
    if "shortcut" in p:
        identity = nn.batch_norm(p["shortcut"]["1"], nn.conv2d(
            p["shortcut"]["0"], identity, stride=(stride, 1)))
    return jax.nn.relu(h + identity)


def _fcm_forward(p, mel):
    """mel [B, T, F] -> [B, T, C*F/8] (FCM, CAMPPlus.swift:259-337)."""
    x = mel.transpose(0, 2, 1)[..., None]  # [B, F, T, 1]
    x = jax.nn.relu(nn.batch_norm(p["bn1"], nn.conv2d(
        p["conv1"], x, padding=(1, 1))))
    for i, stride in ((0, 2), (1, 1)):
        x = _basic_res_block(p["layer1"][str(i)], x, stride)
    for i, stride in ((0, 2), (1, 1)):
        x = _basic_res_block(p["layer2"][str(i)], x, stride)
    x = jax.nn.relu(nn.batch_norm(p["bn2"], nn.conv2d(
        p["conv2"], x, stride=(2, 1), padding=(1, 1))))
    b, f, t, c = x.shape
    return x.transpose(0, 2, 3, 1).reshape(b, t, c * f)  # [B, T, C*F/8]


def _seg_pooling(x, seg_len: int = 100):
    """Segment-mean expanded back to T (segPooling, CAMPPlus.swift:145)."""
    b, t, c = x.shape
    if t <= seg_len:
        return jnp.broadcast_to(x.mean(axis=1, keepdims=True), x.shape)
    n_full = t // seg_len
    full = x[:, : n_full * seg_len].reshape(b, n_full, seg_len, c)
    means = full.mean(axis=2, keepdims=True)
    out = jnp.broadcast_to(means, full.shape).reshape(b, n_full * seg_len, c)
    if t % seg_len:
        rem = jnp.broadcast_to(x[:, n_full * seg_len:].mean(
            axis=1, keepdims=True), (b, t - n_full * seg_len, c))
        out = jnp.concatenate([out, rem], axis=1)
    return out


def _cam_layer(p, x, kernel: int, dilation: int):
    """Context-aware masking (CAMLayer, CAMPPlus.swift:378-438)."""
    pad = (kernel - 1) // 2 * dilation
    y = nn.conv1d(p["linear_local"], x, padding=pad, dilation=dilation)
    context = x.mean(axis=1, keepdims=True) + _seg_pooling(x)
    m = jax.nn.relu(nn.batch_norm(p["bn1"], nn.conv1d(p["linear1"],
                                                      context)))
    m = jax.nn.sigmoid(nn.batch_norm(p["bn2"], nn.conv1d(p["linear2"], m)))
    return y * m


def _dense_tdnn_block(p, x, n_layers: int, kernel: int, dilation: int):
    feats = [x]
    for i in range(n_layers):
        lp = p["layers"][str(i)]
        h = jnp.concatenate(feats, axis=-1)
        h = _bn_relu(lp["nonlinear1"], h)
        h = nn.conv1d(lp["linear1"], h)
        h = _bn_relu(lp["nonlinear2"], h)
        feats.append(_cam_layer(lp["cam_layer"], h, kernel, dilation))
    return jnp.concatenate(feats, axis=-1)


CAMPPLUS_BLOCKS = ((12, 3, 1), (24, 3, 2), (16, 3, 2))


def campplus_forward(p, fbank, blocks=CAMPPLUS_BLOCKS):
    """fbank [B, T, 80] -> x-vector [B, 192]."""
    x = _fcm_forward(p["head"], fbank)
    tp = p["tdnn"]
    x = nn.conv1d(tp["linear"], x, stride=2, padding=2)
    x = _bn_relu(tp["nonlinear"], x)
    for i, (n_layers, kernel, dilation) in enumerate(blocks):
        x = _dense_tdnn_block(p["blocks"][str(i)], x, n_layers, kernel,
                              dilation)
        trans = p["transits"][str(i)]
        x = nn.conv1d(trans["linear"], _bn_relu(trans["nonlinear"], x))
    x = _bn_relu(p["out_nonlinear"], x)
    mean = x.mean(axis=1)
    std = jnp.sqrt(x.var(axis=1) + 1e-5)
    pooled = jnp.concatenate([mean, std], axis=-1)
    d = p["dense"]
    out = nn.conv1d(d["linear"], pooled[:, None])[:, 0]
    return nn.batch_norm(d["nonlinear"]["0"], out)


def campplus_embed(p, audio: np.ndarray, sample_rate: int = 16000,
                   num_mels: int = 80, blocks=CAMPPLUS_BLOCKS):
    """waveform -> x-vector [1, 192] with per-utterance mean norm
    (CAMPPlus.inference, CAMPPlus.swift:695-723)."""
    fb = kaldi_fbank(audio, sample_rate, num_mels)
    fb = fb - fb.mean(axis=0, keepdims=True)
    return campplus_forward(p, jnp.asarray(fb)[None], blocks)


# ---------------------------------------------------------------------------
# Upsample conformer encoder (ConformerEncoder.swift:699-930)
# ---------------------------------------------------------------------------


@dataclass
class ConformerConfig:
    input_size: int = 512
    output_size: int = 512
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6
    num_up_blocks: int = 4
    pre_lookahead_len: int = 3
    upsample_stride: int = 2
    max_len: int = 5000


def _espnet_rel_pe(size: int, d_model: int) -> np.ndarray:
    """Bidirectional interleaved sin/cos table [1, 2*size-1, d]
    (S3GenEspnetRelPositionalEncoding, ConformerEncoder.swift:63-116)."""
    pos = np.arange(size, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * (-math.log(10000.0) / d_model))
    pos_part = np.stack([np.sin(pos * div), np.cos(pos * div)],
                        axis=-1).reshape(size, d_model)
    neg_part = np.stack([np.sin(-pos * div), np.cos(-pos * div)],
                        axis=-1).reshape(size, d_model)
    return np.concatenate([pos_part[::-1], neg_part[1:]], axis=0)[None]


def _rel_shift(x):
    """Transformer-XL rel shift (ConformerEncoder.swift:272-279)."""
    b, h, t1, t2 = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, t2 + 1, t1)[:, :, 1:].reshape(b, h, t1, t2)
    return x[..., : t2 // 2 + 1]


def _rel_mha(p, x, pos_emb, n_heads: int, mask=None):
    """Rel-pos multi-head attention (ConformerEncoder.swift:258-319)."""
    b, t, d = x.shape
    hd = d // n_heads
    q = nn.linear(p["linear_q"], x).reshape(b, t, n_heads, hd)
    k = nn.linear(p["linear_k"], x).reshape(b, t, n_heads, hd)
    v = nn.linear(p["linear_v"], x).reshape(b, t, n_heads, hd)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    pe = nn.linear(p["linear_pos"], pos_emb)
    pe = pe.reshape(pos_emb.shape[0], -1, n_heads, hd).transpose(0, 2, 1, 3)
    q_u = (q + p["pos_bias_u"]).transpose(0, 2, 1, 3)
    q_v = (q + p["pos_bias_v"]).transpose(0, 2, 1, 3)
    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k)
    bd = jnp.einsum("bhqd,bhkd->bhqk", q_v, pe)
    if ac.shape != bd.shape:
        bd = _rel_shift(bd)
    scores = (ac + bd) / math.sqrt(hd)
    if mask is not None:
        scores = jnp.where(mask, scores, -1e9)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
        x.dtype)
    if mask is not None:
        attn = jnp.where(mask, attn, 0.0)
    o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    return nn.linear(p["linear_out"],
                     o.transpose(0, 2, 1, 3).reshape(b, t, d))


def _conformer_layer(p, x, pos_emb, n_heads: int, mask=None):
    """No-macaron, no-conv conformer layer (S3GenConformerEncoderLayer
    with defaults, ConformerEncoder.swift:500-563)."""
    h = nn.layer_norm(p["norm_mha"], x, eps=1e-12)
    x = x + _rel_mha(p["self_attn"], h, pos_emb, n_heads, mask)
    h = nn.layer_norm(p["norm_ff"], x, eps=1e-12)
    ff = p["feed_forward"]
    return x + nn.linear(ff["w_2"], nn.silu(nn.linear(ff["w_1"], h)))


def conformer_encoder_forward(p, xs, xs_lens, cfg: ConformerConfig):
    """Embedded tokens [B, T, D] -> upsampled hidden [B, 2T, D]
    (UpsampleConformerEncoder, ConformerEncoder.swift:859-929)."""
    b, t, _ = xs.shape
    d = cfg.output_size
    valid = (jnp.arange(t)[None] < xs_lens[:, None])  # [B, T]
    mask = valid[:, None, None, :]  # [B, 1, 1, T]

    pe_table = jnp.asarray(_espnet_rel_pe(max(t, 1), d), xs.dtype)

    def embed(ep, x, table_size):
        h = nn.layer_norm(ep["norm"], nn.linear(ep["linear"], x), eps=1e-5)
        h = h * math.sqrt(d)
        center = table_size.shape[1] // 2
        size = x.shape[1]
        pos_emb = table_size[:, center - size + 1: center + size]
        return h, pos_emb

    out, pos_emb = embed(p["embed"], xs, pe_table)

    # pre-lookahead (S3GenPreLookaheadLayer, ConformerEncoder.swift:608-644)
    pl = p["pre_lookahead_layer"]
    h = jnp.pad(out, ((0, 0), (0, cfg.pre_lookahead_len), (0, 0)))
    h = jax.nn.leaky_relu(nn.conv1d(pl["conv1"], h), 0.01)
    h = jnp.pad(h, ((0, 0), (2, 0), (0, 0)))
    h = nn.conv1d(pl["conv2"], h)
    out = h + out

    for i in range(cfg.num_blocks):
        out = _conformer_layer(p["encoders"][str(i)], out, pos_emb,
                               cfg.attention_heads, mask)

    # upsample: repeat + left-pad + conv (S3GenUpsample1D,
    # ConformerEncoder.swift:569-603)
    stride = cfg.upsample_stride
    up = jnp.repeat(out, stride, axis=1)
    up = jnp.pad(up, ((0, 0), (stride * 2, 0), (0, 0)))
    up = nn.conv1d(p["up_layer"]["conv"], up)
    t_up = up.shape[1]
    up_lens = xs_lens * stride
    valid_up = (jnp.arange(t_up)[None] < up_lens[:, None])
    mask_up = valid_up[:, None, None, :]

    pe_table_up = jnp.asarray(_espnet_rel_pe(max(t_up, 1), d), xs.dtype)
    out, pos_emb = embed(p["up_embed"], up, pe_table_up)
    for i in range(cfg.num_up_blocks):
        out = _conformer_layer(p["up_encoders"][str(i)], out, pos_emb,
                               cfg.attention_heads, mask_up)
    return nn.layer_norm(p["after_norm"], out, eps=1e-5)


# ---------------------------------------------------------------------------
# Chatterbox flow-matching U-Net estimator (FlowMatching.swift:470-611)
# ---------------------------------------------------------------------------


def _sinusoidal_pos_emb(t, dim: int, scale: float = 1000.0):
    half = dim // 2
    emb = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                  * (-math.log(10000.0) / (half - 1)))
    out = scale * t[:, None] * emb[None]
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=-1)


def _causal_conv(p, x, kernel: int = 3):
    """Left-padded conv on [B, T, C] (S3GenCausalConv1d)."""
    return nn.conv1d(p, jnp.pad(x, ((0, 0), (kernel - 1, 0), (0, 0))))


def _causal_block(p, x, mask):
    """CausalConv + LayerNorm + Mish (S3GenCausalBlock1D)."""
    h = _causal_conv(p["block"]["0"]["conv"]["conv"], x * mask)
    h = nn.mish(nn.layer_norm(p["block"]["1"], h))
    return h * mask


def _resnet_block(p, x, mask, t_emb):
    """ResnetBlock1D with time injection (FlowMatching.swift:149-174)."""
    h = _causal_block(p["block1"], x, mask)
    h = h + nn.linear(p["mlp"]["0"], nn.mish(t_emb))[:, None]
    h = _causal_block(p["block2"], h, mask)
    return h + nn.conv1d(p["res_conv"]["conv"], x * mask)


def _unet_transformer_block(p, x, valid):
    """Bidirectional pre-norm transformer (FlowMatching.swift:313-333)."""
    h = nn.layer_norm(p["norm1"], x)
    a = p["attn1"]
    b, t, _ = h.shape
    w_q = a["to_q"]["weight"]
    inner = w_q.shape[0]
    n_heads = 8
    hd = inner // n_heads
    q = nn.linear(a["to_q"], h).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
    k = nn.linear(a["to_k"], h).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
    v = nn.linear(a["to_v"], h).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
    mask = valid[:, None, None, :] if valid is not None else None
    o = nn.sdpa(q, k, v, mask=mask)
    x = x + nn.linear(a["to_out"]["0"],
                      o.transpose(0, 2, 1, 3).reshape(b, t, inner))
    h = nn.layer_norm(p["norm3"], x)
    ff = p["ff"]
    return x + nn.linear(ff["net"]["1"],
                         nn.gelu(nn.linear(ff["net"]["0"]["proj"], h)))


def unet_estimator_forward(p, x, mask, mu, t, spks=None, cond=None, r=None,
                           meanflow: bool = True, in_channels: int = 320):
    """Velocity estimator: x/mu/cond [B, T, C], mask [B, T, 1], t [1]
    (S3GenConditionalDecoder, FlowMatching.swift:549-610)."""
    t_emb = _sinusoidal_pos_emb(t, in_channels)
    tm = p["time_mlp"]
    t_emb = nn.linear(tm["linear_2"], nn.silu(nn.linear(tm["linear_1"],
                                                        t_emb)))
    if meanflow and r is not None:
        r_emb = _sinusoidal_pos_emb(r, in_channels)
        r_emb = nn.linear(tm["linear_2"], nn.silu(nn.linear(tm["linear_1"],
                                                            r_emb)))
        t_emb = nn.linear(p["time_embed_mixer"],
                          jnp.concatenate([t_emb, r_emb], axis=-1))

    pieces = [x, mu]
    if spks is not None:
        pieces.append(jnp.broadcast_to(spks[:, None],
                                       (x.shape[0], x.shape[1],
                                        spks.shape[-1])))
    if cond is not None:
        pieces.append(cond)
    h = jnp.concatenate(pieces, axis=-1)

    hiddens, masks = [], [mask]
    for i in sorted(p["down_blocks"], key=int):
        dp = p["down_blocks"][i]
        m = masks[-1]
        h = _resnet_block(dp["resnet"], h, m, t_emb)
        valid = m[..., 0] > 0
        for j in sorted(dp["transformer_blocks"], key=int):
            h = _unet_transformer_block(dp["transformer_blocks"][j], h,
                                        valid)
        hiddens.append(h)
        is_last = int(i) == len(p["down_blocks"]) - 1
        if is_last:
            h = _causal_conv(dp["downsample"]["conv"]["conv"], h * m)
        else:
            h = nn.conv1d(dp["downsample"]["conv"]["conv"], h * m, stride=2,
                          padding=1)
        masks.append(m[:, ::2] if not is_last else m)
    masks.pop()

    m = masks[-1]
    valid = m[..., 0] > 0
    for i in sorted(p["mid_blocks"], key=int):
        mb = p["mid_blocks"][i]
        h = _resnet_block(mb["resnet"], h, m, t_emb)
        for j in sorted(mb["transformer_blocks"], key=int):
            h = _unet_transformer_block(mb["transformer_blocks"][j], h,
                                        valid)

    for i in sorted(p["up_blocks"], key=int):
        up = p["up_blocks"][i]
        m = masks.pop()
        skip = hiddens.pop()
        h = jnp.concatenate([h[:, : skip.shape[1]], skip], axis=-1)
        h = _resnet_block(up["resnet"], h, m, t_emb)
        valid = m[..., 0] > 0
        for j in sorted(up["transformer_blocks"], key=int):
            h = _unet_transformer_block(up["transformer_blocks"][j], h,
                                        valid)
        is_last = int(i) == len(p["up_blocks"]) - 1
        if is_last:
            h = _causal_conv(up["upsample"]["conv"]["conv"], h * m)
        else:
            h = nn.conv_transpose1d(up["upsample"]["conv"]["conv"], h * m,
                                    stride=2, padding=1)

    h = _causal_block(p["final_block"], h, mask)
    return nn.conv1d(p["final_proj"]["conv"], h * mask) * mask


# ---------------------------------------------------------------------------
# Step-Audio-2 DiT estimator (StepAudio2.swift:288-346)
# ---------------------------------------------------------------------------


def _dit_timestep_embed(p, t, freq_size: int = 256, scale: float = 1000.0):
    t = t * scale
    half = freq_size // 2
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    mlp = p["mlp"]
    return nn.linear(mlp["linear2"], nn.silu(nn.linear(mlp["linear1"],
                                                       emb)))


def _ln_no_affine(x, eps=1e-6):
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _dit_block(p, x, c, valid, n_heads: int = 8):
    """adaLN DiT block: attn + causal conv + MLP (StepAudio2.swift:240-268)."""
    mod = nn.linear(p["adaLN_modulation"]["linear"], nn.silu(c))
    pieces = jnp.split(mod, 9, axis=-1)

    def modulate(h, shift, scale):
        return h * (1 + scale) + shift

    # attention with per-head layer-norm on q/k
    a = p["attn"]
    b, t, d = x.shape
    inner = a["to_q"]["weight"].shape[0]
    hd = inner // n_heads
    h = modulate(_ln_no_affine(x), pieces[0], pieces[1])
    q = nn.linear(a["to_q"], h).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
    k = nn.linear(a["to_k"], h).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
    v = nn.linear(a["to_v"], h).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
    q = nn.layer_norm(a["q_norm"], q)
    k = nn.layer_norm(a["k_norm"], k)
    mask = valid[:, None, None, :] if valid is not None else None
    o = nn.sdpa(q, k, v, mask=mask)
    o = nn.linear(a["proj"], o.transpose(0, 2, 1, 3).reshape(b, t, inner))
    x = x + pieces[2] * o

    # causal conv block (StepAudio2CausalConvBlock)
    cb = p["conv"]["block"]
    h = modulate(_ln_no_affine(x), pieces[6], pieces[7])
    h = _causal_conv(cb["conv1"], h)
    h = nn.mish(nn.layer_norm(cb["norm"], h))
    h = _causal_conv(cb["conv2"], h)
    x = x + pieces[8] * h

    # MLP with tanh-approx GELU
    mp = p["mlp"]
    h = modulate(_ln_no_affine(x), pieces[3], pieces[4])
    h = nn.linear(mp["fc2"], nn.gelu(nn.linear(mp["fc1"], h),
                                     approximate=True))
    return x + pieces[5] * h


def dit_estimator_forward(p, x, mask, mu, t, spks=None, cond=None,
                          depth: int = 16, n_heads: int = 8):
    """Step-Audio-2 DiT: inputs channels-last [B, T, C]
    (StepAudio2DiT, StepAudio2.swift:316-345)."""
    c = _dit_timestep_embed(p["t_embedder"], t)[:, None]
    pieces = [x, mu]
    if spks is not None:
        pieces.append(jnp.broadcast_to(spks[:, None],
                                       (x.shape[0], x.shape[1],
                                        spks.shape[-1])))
    if cond is not None:
        pieces.append(cond)
    h = nn.linear(p["in_proj"], jnp.concatenate(pieces, axis=-1))
    valid = mask[..., 0] > 0 if mask is not None else None
    for i in range(depth):
        h = _dit_block(p["blocks"][str(i)], h, c, valid, n_heads)
    fl = p["final_layer"]
    mod = nn.linear(fl["adaLN_modulation"]["linear"], nn.silu(c))
    shift, scale = jnp.split(mod, 2, axis=-1)
    h = _ln_no_affine(h) * (1 + scale) + shift
    return nn.linear(fl["linear"], h)


# ---------------------------------------------------------------------------
# CFM Euler solvers (FlowMatching.swift:622-818, StepAudio2.swift:348-409)
# ---------------------------------------------------------------------------


def cfm_solve(estimator, z, t_span, cfg_rate: float = 0.0):
    """Euler ODE over ``t_span``. With ``cfg_rate > 0`` the estimator is
    called on a doubled batch [cond, uncond] prepared by the caller; here
    ``estimator(x, t, r)`` returns the velocity for plain solve or the
    CFG-combined velocity."""
    n_steps = t_span.shape[0] - 1

    def body(i, x):
        t = jax.lax.dynamic_slice(t_span, (i,), (1,))
        r = jax.lax.dynamic_slice(t_span, (i + 1,), (1,))
        dxdt = estimator(x, t, r)
        return x + (r - t)[:, None, None] * dxdt

    return jax.lax.fori_loop(0, n_steps, body, z)


def cosine_t_span(n_timesteps: int) -> np.ndarray:
    lin = np.linspace(0.0, 1.0, n_timesteps + 1, dtype=np.float32)
    return 1.0 - np.cos(lin * np.pi / 2)


# ---------------------------------------------------------------------------
# HiFT generator (HiFTGenerator.swift:469-719)
# ---------------------------------------------------------------------------


@dataclass
class HiFTConfig:
    in_channels: int = 80
    base_channels: int = 512
    nb_harmonics: int = 8
    sampling_rate: int = 24000
    nsf_alpha: float = 0.1
    nsf_sigma: float = 0.003
    nsf_voiced_threshold: float = 10.0
    upsample_rates: tuple = (8, 5, 3)
    upsample_kernel_sizes: tuple = (16, 11, 7)
    n_fft: int = 16
    hop_len: int = 4
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    source_resblock_kernel_sizes: tuple = (7, 7, 11)
    source_resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    lrelu_slope: float = 0.1
    audio_limit: float = 0.99
    use_interpolation: bool = False  # True for Step-Audio-2
    # last-upsample left pad: "zero" (Chatterbox) or "repeat"
    # (Step-Audio-2 concatenates h[:, 1:2], StepAudio2.swift:543)
    edge_pad: str = "zero"

    @property
    def upsample_scale(self) -> int:
        return int(np.prod(self.upsample_rates)) * self.hop_len


def _snake(p, x):
    """x [B, T, C]; alpha [C] (Snake, HiFTGenerator.swift:95-124)."""
    a = p["alpha"].reshape(1, 1, -1).astype(jnp.float32)
    sign = jnp.sign(a)
    a = jnp.where(jnp.abs(a) < 1e-9, 1e-4,
                  sign * jnp.maximum(jnp.abs(a), 1e-4))
    xf = x.astype(jnp.float32)
    return (xf + (1.0 / a) * jnp.sin(xf * a) ** 2).astype(x.dtype)


def _hifi_resblock(p, x, kernel: int, dilations):
    for i, d in enumerate(dilations):
        h = _snake(p["activations1"][str(i)], x)
        h = nn.conv1d(p["convs1"][str(i)]["conv"], h,
                      padding=(kernel * d - d) // 2, dilation=d)
        h = _snake(p["activations2"][str(i)], h)
        h = nn.conv1d(p["convs2"][str(i)]["conv"], h,
                      padding=(kernel - 1) // 2)
        x = x + h
    return x


def _f0_predictor(p, mel):
    """mel [B, T, 80] -> f0 [B, T] (ConvRNNF0Predictor)."""
    h = mel
    for i in range(5):
        h = jax.nn.elu(nn.conv1d(p["condnet"][str(i)]["conv"], h,
                                 padding=1))
    return jnp.abs(nn.linear(p["classifier"], h)[..., 0])


def _interp_to(x, new_size: int):
    """Linear interpolation along axis 1 of [B, T, C]."""
    t = x.shape[1]
    if t == new_size:
        return x
    pos = jnp.linspace(0.0, t - 1, new_size)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    w = (pos - lo)[None, :, None]
    return x[:, lo] * (1 - w) + x[:, hi] * w


def _sine_source(p, f0_up, cfg: HiFTConfig, rng):
    """f0 [B, T_up, 1] -> merged source [B, T_up, 1] (SourceModuleHnNSF +
    SineGen, HiFTGenerator.swift:200-345)."""
    b, t, _ = f0_up.shape
    h = cfg.nb_harmonics + 1
    harmonics = jnp.arange(1, h + 1, dtype=jnp.float32)[None, None]
    fn = f0_up * harmonics  # [B, T, H]
    k1, k2, k3 = jax.random.split(rng, 3)
    if cfg.use_interpolation:
        rad = (fn / cfg.sampling_rate) % 1.0
        rand_ini = jax.random.uniform(k1, (b, h))
        rand_ini = rand_ini.at[:, 0].set(0.0)
        rad = rad.at[:, 0].add(rand_ini)
        t_down = max(1, t // cfg.upsample_scale)
        rad_down = _interp_to(rad, t_down)
        phase = jnp.cumsum(rad_down, axis=1) * (2 * np.pi)
        phase_up = _interp_to(phase * cfg.upsample_scale, t)
        sines = jnp.sin(phase_up) * cfg.nsf_alpha
    else:
        f_mat = fn / cfg.sampling_rate
        theta = 2 * np.pi * (jnp.cumsum(f_mat, axis=1) % 1.0)
        phase_vec = jax.random.uniform(k1, (b, 1, h), minval=-np.pi,
                                       maxval=np.pi)
        phase_vec = phase_vec * (jnp.arange(h) > 0)[None, None]
        sines = cfg.nsf_alpha * jnp.sin(theta + phase_vec)
    uv = (f0_up > cfg.nsf_voiced_threshold).astype(jnp.float32)
    noise_amp = uv * cfg.nsf_sigma + (1 - uv) * cfg.nsf_alpha / 3
    noisy = sines * uv + noise_amp * jax.random.normal(k2, sines.shape)
    return jnp.tanh(nn.linear(p["l_linear"], noisy))  # [B, T, 1]


def _hift_stft(x, n_fft: int, hop: int):
    """signal [B, T] -> [real|imag] [B, frames, n_fft+2]."""
    pad = n_fft // 2
    x = jnp.concatenate([x[:, 1: pad + 1][:, ::-1], x,
                         x[:, -(pad + 1): -1][:, ::-1]], axis=1)
    n_frames = (x.shape[1] - n_fft) // hop + 1
    idx = (np.arange(n_frames)[:, None] * hop
           + np.arange(n_fft)[None, :])
    window = jnp.asarray(dsp.hanning_window(n_fft, periodic=True))
    frames = x[:, idx] * window[None, None]
    spec = jnp.fft.rfft(frames, axis=-1)  # [B, frames, n_fft/2+1]
    return jnp.concatenate([spec.real, spec.imag], axis=-1)


def _hift_istft(mag, phase, n_fft: int, hop: int):
    """mag/phase [B, frames, n_fft/2+1] -> waveform [B, T]."""
    mag = jnp.minimum(mag, 1e2)
    spec = jax.lax.complex(mag * jnp.cos(phase), mag * jnp.sin(phase))
    from tpu_audio.core.dsp import irfft

    frames = irfft(spec, n=n_fft, axis=-1)  # [B, frames, n_fft]
    window = jnp.asarray(dsp.hanning_window(n_fft, periodic=True))
    frames = frames * window[None, None]
    b, n_frames, _ = frames.shape
    out_len = (n_frames - 1) * hop + n_fft
    idx = (np.arange(n_frames)[:, None] * hop
           + np.arange(n_fft)[None, :]).reshape(-1)
    sig = jnp.zeros((b, out_len)).at[:, idx].add(frames.reshape(b, -1))
    wsum = jnp.zeros((out_len,)).at[idx].add(
        jnp.tile(window * window, n_frames))
    sig = sig / jnp.maximum(wsum, 1e-8)
    pad = n_fft // 2
    return sig[:, pad: out_len - pad]


def hift_forward(p, mel, cfg: HiFTConfig, rng):
    """mel [B, T, 80] -> waveform [B, samples]
    (HiFTGenerator.callAsFunction + decode, HiFTGenerator.swift:617-719)."""
    f0 = _f0_predictor(p["f0_predictor"], mel)  # [B, T]
    f0_up = jnp.repeat(f0[..., None], cfg.upsample_scale, axis=1)
    s = _sine_source(p["m_source"], f0_up, cfg, rng)  # [B, T_up, 1]
    s_stft = _hift_stft(s[..., 0], cfg.n_fft, cfg.hop_len)

    h = nn.conv1d(p["conv_pre"]["conv"], mel, padding=3)
    n_kernels = len(cfg.resblock_kernel_sizes)
    for i, rate in enumerate(cfg.upsample_rates):
        h = jax.nn.leaky_relu(h, cfg.lrelu_slope)
        k = cfg.upsample_kernel_sizes[i]
        h = nn.conv_transpose1d(p["ups"][str(i)]["conv"], h, stride=rate,
                                padding=(k - rate) // 2)
        if i == len(cfg.upsample_rates) - 1:
            if cfg.edge_pad == "repeat":
                h = jnp.concatenate([h[:, 1:2], h], axis=1)
            else:
                h = jnp.pad(h, ((0, 0), (1, 0), (0, 0)))
        # source fusion
        down = p["source_downs"][str(i)]["conv"]
        rates_rev = [1] + list(cfg.upsample_rates[::-1][:-1])
        u = int(np.prod(rates_rev[: len(rates_rev) - i]))
        if u == 1:
            si = nn.conv1d(down, s_stft)
        else:
            si = nn.conv1d(down, s_stft, stride=u, padding=u // 2)
        si = _hifi_resblock(p["source_resblocks"][str(i)], si,
                            cfg.source_resblock_kernel_sizes[i],
                            cfg.source_resblock_dilation_sizes[i])
        n = min(h.shape[1], si.shape[1])
        h = h[:, :n] + si[:, :n]
        acc = None
        for j in range(n_kernels):
            blk = _hifi_resblock(p["resblocks"][str(i * n_kernels + j)], h,
                                 cfg.resblock_kernel_sizes[j],
                                 cfg.resblock_dilation_sizes[j])
            acc = blk if acc is None else acc + blk
        h = acc / n_kernels

    h = jax.nn.leaky_relu(h, cfg.lrelu_slope)
    h = nn.conv1d(p["conv_post"]["conv"], h, padding=3)
    half = cfg.n_fft // 2 + 1
    mag = jnp.exp(h[..., :half])
    phase = jnp.sin(h[..., half:])
    wav = _hift_istft(mag, phase, cfg.n_fft, cfg.hop_len)
    return jnp.clip(wav, -cfg.audio_limit, cfg.audio_limit)


# ---------------------------------------------------------------------------
# Sanitizers
# ---------------------------------------------------------------------------


def _torch_conv_fix(k: str, v: np.ndarray) -> np.ndarray:
    """MLX conv [O, K, I] -> torch/ours [O, I, K] when needed."""
    if k.endswith(".weight") and v.ndim == 3 and "conv" in k \
            and v.shape[1] > 1 and v.shape[1] < v.shape[2]:
        return np.transpose(v, (0, 2, 1))
    return v


def sanitize_flow(weights: dict) -> dict:
    """Step-Audio-2 flow checkpoint (StepAudio2Flow.sanitize,
    StepAudio2.swift:502-516) + Chatterbox flow key fixes."""
    out = {}
    for k, v in weights.items():
        k = k.replace("t_embedder.mlp.0.", "t_embedder.mlp.linear1.")
        k = k.replace("t_embedder.mlp.2.", "t_embedder.mlp.linear2.")
        k = k.replace(".adaLN_modulation.1.", ".adaLN_modulation.linear.")
        k = k.replace(".conv.block.1.", ".conv.block.conv1.")
        k = k.replace(".conv.block.3.", ".conv.block.norm.")
        k = k.replace(".conv.block.6.", ".conv.block.conv2.")
        out[k] = v
    return out


def sanitize_hift(weights: dict) -> dict:
    """Wrap bare conv keys in .conv (StepAudio2HiFTGenerator.sanitize,
    StepAudio2.swift:571-594)."""
    out = {}
    for k, v in weights.items():
        if k == "stft_window":
            continue
        if (k.endswith(".weight") or k.endswith(".bias")) and (
                k.startswith(("conv_pre.", "conv_post.", "ups.",
                              "source_downs."))
                or ".convs1." in k or ".convs2." in k
                or k.startswith("f0_predictor.condnet.")):
            stem, suffix = k.rsplit(".", 1)
            if not stem.endswith(".conv"):
                k = f"{stem}.conv.{suffix}"
        out[k] = v
    return out


def sanitize_campplus(weights: dict) -> dict:
    """CAMPPlus key remapping (CAMPPlus.sanitize, CAMPPlus.swift:730-819):
    xvector.blockN.tdnndM -> blocks.N-1.layers.M-1, .batchnorm. -> .0."""
    import re

    out = {}
    for k, v in weights.items():
        if k.endswith(".num_batches_tracked"):
            continue
        m = re.match(r"^xvector\.block(\d+)\.tdnnd(\d+)\.(.*)", k)
        if m:
            k = (f"blocks.{int(m.group(1)) - 1}.layers."
                 f"{int(m.group(2)) - 1}.{m.group(3)}")
        m = re.match(r"^xvector\.transit(\d+)\.(.*)", k)
        if m:
            k = f"transits.{int(m.group(1)) - 1}.{m.group(2)}"
        for pre in ("xvector.tdnn.", "xvector.out_nonlinear.",
                    "xvector.dense."):
            if k.startswith(pre):
                k = k[len("xvector."):]
        k = k.replace(".batchnorm.", ".0.")
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# Step-Audio-2 token2wav (StepAudio2.swift:596-660)
# ---------------------------------------------------------------------------


@dataclass
class StepAudio2Prompt:
    """Prompt conditioning bundle (StepAudio2.swift:10-30)."""

    prompt_token: np.ndarray   # [1, T_p] int
    prompt_feat: np.ndarray    # [1, T_mel, 80]
    embedding: np.ndarray      # [1, 192]


class StepAudio2Token2Wav:
    """Speech tokens -> waveform for Step-Audio-2 (and the shared S3 flow)."""

    sample_rate = 24000

    def __init__(self, flow_params, hift_params, dtype=jnp.float32,
                 vocab_size: int = 6561, cfg_rate: float = 0.7,
                 dit_depth: int = 16, dit_heads: int = 8, n_mels: int = 80,
                 conformer_cfg: ConformerConfig | None = None,
                 hift_cfg: HiFTConfig | None = None):
        self.flow = flow_params
        self.hift = hift_params
        self.dtype = dtype
        self.vocab_size = vocab_size
        self.cfg_rate = cfg_rate
        self.dit_depth = dit_depth
        self.dit_heads = dit_heads
        self.n_mels = n_mels
        self.conformer_cfg = conformer_cfg or ConformerConfig()
        self.hift_cfg = hift_cfg or HiFTConfig(use_interpolation=True,
                                               edge_pad="repeat")
        self._encode = ajit(functools.partial(
            conformer_encoder_forward, cfg=self.conformer_cfg))
        self._vocode = ajit(functools.partial(hift_forward,
                                                 cfg=self.hift_cfg))
        self._solvers: dict = {}

    @classmethod
    def from_pretrained(cls, repo_or_path: str,
                        dtype=jnp.float32) -> "StepAudio2Token2Wav":
        from tpu_audio.core import loading

        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        flow_flat = loading.load_safetensors_file(model_dir /
                                                  "flow.safetensors")
        hift_flat = loading.load_safetensors_file(model_dir /
                                                  "hift.safetensors")
        flow = loading.unflatten(sanitize_flow(flow_flat))
        hift = loading.unflatten(sanitize_hift(hift_flat))
        flow = jax.tree.map(jnp.asarray, flow)
        hift = jax.tree.map(jnp.asarray, hift)
        return cls(flow, hift, dtype)

    def _get_solver(self, n_timesteps: int):
        if n_timesteps in self._solvers:
            return self._solvers[n_timesteps]
        depth = self.dit_depth
        heads = self.dit_heads
        cfg_rate = self.cfg_rate

        def solve(params, z, mu, mask, spks, cond, t_span):
            mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
            spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
            cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
            mask2 = jnp.concatenate([mask, mask], axis=0)

            def estimator(x, t, r):
                x2 = jnp.concatenate([x, x], axis=0)
                t2 = jnp.concatenate([t, t], axis=0)
                d = dit_estimator_forward(params["decoder"]["estimator"],
                                          x2, mask2, mu2, t2, spks2, cond2,
                                          depth=depth, n_heads=heads)
                c, u = jnp.split(d, 2, axis=0)
                return (1 + cfg_rate) * c - cfg_rate * u

            return cfm_solve(estimator, z, t_span)

        fn = ajit(solve)
        self._solvers[n_timesteps] = fn
        return fn

    def decode_to_mel(self, speech_tokens: np.ndarray,
                      prompt: StepAudio2Prompt,
                      n_timesteps: int = 10) -> np.ndarray:
        """tokens [T] or [1, T] -> generated mel [1, T_mel, 80]
        (StepAudio2Flow.inference, StepAudio2.swift:451-500)."""
        tokens = np.atleast_2d(np.asarray(speech_tokens, np.int32))
        p = self.flow
        emb = jnp.asarray(prompt.embedding, jnp.float32)
        emb = emb / (jnp.sqrt((emb * emb).sum(axis=1, keepdims=True))
                     + 1e-8)
        spks = nn.linear(p["spk_embed_affine_layer"], emb)  # [1, 80]

        combined = np.concatenate(
            [np.atleast_2d(np.asarray(prompt.prompt_token, np.int32)),
             tokens], axis=1)
        combined = np.clip(combined, 0, self.vocab_size - 1)
        lens = jnp.asarray([combined.shape[1]], jnp.int32)
        embedded = nn.embedding(p["input_embedding"],
                                jnp.asarray(combined)).astype(self.dtype)
        enc = self._encode(p["encoder"], embedded, lens)
        h = nn.linear(p["encoder_proj"], enc)  # [1, T_up, 80]

        prompt_feat = np.asarray(prompt.prompt_feat, np.float32)
        prompt_mel_len = prompt_feat.shape[1]
        total = h.shape[1]
        conds = jnp.zeros((1, total, self.n_mels), self.dtype)
        conds = conds.at[:, :prompt_mel_len].set(
            jnp.asarray(prompt_feat[:, :total], self.dtype))
        mask = jnp.ones((1, total, 1), self.dtype)

        noise = self.flow["decoder"].get("rand_noise")
        if noise is not None:
            z = jnp.transpose(noise[:, :, :total], (0, 2, 1))
        else:
            z = jax.random.normal(jax.random.PRNGKey(0),
                                  (1, total, self.n_mels))
        t_span = jnp.asarray(cosine_t_span(n_timesteps))
        solver = self._get_solver(n_timesteps)
        mel = solver(p, z.astype(self.dtype), h, mask, spks, conds, t_span)
        return np.asarray(mel)[:, prompt_mel_len:]

    def vocode(self, mel: np.ndarray, seed: int = 0) -> np.ndarray:
        wav = self._vocode(self.hift, jnp.asarray(mel, self.dtype),
                           rng=jax.random.PRNGKey(seed))
        return np.asarray(wav, np.float32)

    def decode(self, speech_tokens, prompt: StepAudio2Prompt,
               n_timesteps: int = 10) -> np.ndarray:
        return self.vocode(self.decode_to_mel(speech_tokens, prompt,
                                              n_timesteps))


# ---------------------------------------------------------------------------
# Chatterbox token2mel container (CausalMaskedDiffWithXvec,
# FlowMatching.swift:826-974)
# ---------------------------------------------------------------------------


class S3Token2Mel:
    """Speech tokens -> mel via conformer + causal U-Net flow matching.
    Used by Chatterbox; the params tree carries input_embedding,
    spk_embed_affine_layer, encoder, encoder_proj, decoder (CFM U-Net),
    mel2wav (HiFT) and speaker_encoder (CAMPPlus)."""

    def __init__(self, params, dtype=jnp.float32, vocab_size: int = 6561,
                 meanflow: bool = True, cfg_rate: float = 0.7,
                 token_mel_ratio: int = 2, n_mels: int = 80,
                 unet_in_channels: int = 320,
                 conformer_cfg: ConformerConfig | None = None,
                 hift_cfg: HiFTConfig | None = None):
        self.params = params
        self.dtype = dtype
        self.vocab_size = vocab_size
        self.meanflow = meanflow
        self.cfg_rate = cfg_rate
        self.token_mel_ratio = token_mel_ratio
        self.n_mels = n_mels
        self.unet_in_channels = unet_in_channels
        self.conformer_cfg = conformer_cfg or ConformerConfig()
        self.hift_cfg = hift_cfg or HiFTConfig()
        self._encode = ajit(functools.partial(
            conformer_encoder_forward, cfg=self.conformer_cfg))
        self._vocode = ajit(functools.partial(hift_forward,
                                                 cfg=self.hift_cfg))
        self._solvers: dict = {}

    campplus_blocks = CAMPPLUS_BLOCKS
    campplus_mels = 80

    def speaker_embedding(self, audio_16k: np.ndarray) -> np.ndarray:
        return np.asarray(campplus_embed(
            self.params["speaker_encoder"], audio_16k,
            num_mels=self.campplus_mels, blocks=self.campplus_blocks))

    def _get_solver(self, n_timesteps: int):
        key = n_timesteps
        if key in self._solvers:
            return self._solvers[key]
        meanflow = self.meanflow
        cfg_rate = self.cfg_rate
        in_ch = self.unet_in_channels

        if meanflow:
            def solve(params, z, mu, mask, spks, cond, t_span):
                def estimator(x, t, r):
                    return unet_estimator_forward(
                        params["decoder"]["estimator"], x, mask, mu, t,
                        spks, cond, r=r, meanflow=True, in_channels=in_ch)

                return cfm_solve(estimator, z, t_span)
        else:
            def solve(params, z, mu, mask, spks, cond, t_span):
                mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
                spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)],
                                        axis=0)
                cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)],
                                        axis=0)
                mask2 = jnp.concatenate([mask, mask], axis=0)

                def estimator(x, t, r):
                    x2 = jnp.concatenate([x, x], axis=0)
                    t2 = jnp.concatenate([t, t], axis=0)
                    d = unet_estimator_forward(
                        params["decoder"]["estimator"], x2, mask2, mu2, t2,
                        spks2, cond2, r=None, meanflow=False,
                        in_channels=in_ch)
                    c, u = jnp.split(d, 2, axis=0)
                    return (1 + cfg_rate) * c - cfg_rate * u

                return cfm_solve(estimator, z, t_span)

        fn = ajit(solve)
        self._solvers[key] = fn
        return fn

    def inference(self, token: np.ndarray, prompt_token: np.ndarray,
                  prompt_feat: np.ndarray, embedding: np.ndarray,
                  n_timesteps: int = 10, seed: int = 0) -> np.ndarray:
        """-> generated mel [1, T_mel, 80] (CausalMaskedDiffWithXvec
        .inference, FlowMatching.swift:894-973)."""
        p = self.params
        emb = jnp.asarray(embedding, jnp.float32)
        emb = emb / (jnp.sqrt((emb * emb).sum(axis=1, keepdims=True))
                     + 1e-8)
        spks = nn.linear(p["spk_embed_affine_layer"], emb)

        token = np.atleast_2d(np.asarray(token, np.int32))
        prompt_token = np.atleast_2d(np.asarray(prompt_token, np.int32))
        combined = np.clip(np.concatenate([prompt_token, token], axis=1),
                           0, self.vocab_size - 1)
        lens = jnp.asarray([combined.shape[1]], jnp.int32)
        embedded = nn.embedding(p["input_embedding"],
                                jnp.asarray(combined)).astype(self.dtype)
        enc = self._encode(p["encoder"], embedded, lens)
        h = nn.linear(p["encoder_proj"], enc)
        total = h.shape[1]

        prompt_feat = np.asarray(prompt_feat, np.float32)
        prompt_mel_len = prompt_feat.shape[1]
        conds = jnp.zeros((1, total, self.n_mels), self.dtype)
        if prompt_mel_len:
            conds = conds.at[:, :prompt_mel_len].set(
                jnp.asarray(prompt_feat[:, :total], self.dtype))
        mask = jnp.ones((1, total, 1), self.dtype)

        rng = jax.random.PRNGKey(seed)
        if self.meanflow:
            z = jax.random.normal(rng, (1, total, self.n_mels), self.dtype)
            gen_len = token.shape[1] * self.token_mel_ratio
            # noised mels spliced over the generated region
            # (FlowMatching.swift:781-791)
            noised = jax.random.normal(jax.random.split(rng)[0],
                                       (1, gen_len, self.n_mels),
                                       self.dtype)
            if total - gen_len > 0:
                z = jnp.concatenate([z[:, : total - gen_len], noised],
                                    axis=1)
            t_span = jnp.linspace(0.0, 1.0, n_timesteps + 1)
        else:
            noise = p["decoder"].get("rand_noise")
            if noise is not None:
                z = jnp.transpose(noise[:, :, :total],
                                  (0, 2, 1)).astype(self.dtype)
            else:
                z = jax.random.normal(rng, (1, total, self.n_mels),
                                      self.dtype)
            t_span = jnp.asarray(cosine_t_span(n_timesteps))

        solver = self._get_solver(n_timesteps)
        mel = solver(p, z, h, mask, spks, conds, t_span)
        return np.asarray(mel)[:, prompt_mel_len:]

    def vocode(self, mel: np.ndarray, seed: int = 0) -> np.ndarray:
        wav = self._vocode(self.params["mel2wav"],
                           jnp.asarray(mel, self.dtype),
                           rng=jax.random.PRNGKey(seed))
        return np.asarray(wav, np.float32)
