"""DeepFilterNet (v2/v3): real-time speech enhancement via ERB gains + deep
filtering on the low spectrum.

TPU-first rebuild of the reference
(Sources/MLXAudioSTS/Models/DeepFilterNet/*): vorbis-window STFT with the
libDF ``wnorm = 2*hop/fft^2`` scaling, ERB energies + EMA band-mean
normalization (closed-form cumsum instead of the sequential loop),
unit-norm complex DF features, a UNet-ish conv encoder/decoder over
[B, C, T, F] with causal time padding, grouped linears + squeezed GRUs, an
ERB mask decoder (sigmoid gains lifted through ``mask.erb_inv_fb``) and a
deep-filter coefficient decoder applying complex FIR taps over the lowest
``nb_df`` bins (DeepFilterNetForward.swift:157-199).

The reference runs its GRUs on the CPU with Accelerate
(DeepFilterNetLayers.swift:360-440); here they are ``lax.scan``s inside the
same jitted graph as everything else.
"""

from __future__ import annotations

import functools
import math
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import hub, loading, nn

__all__ = ["DeepFilterNet", "DeepFilterNetConfig", "vorbis_window",
           "erb_band_widths"]


@dataclass
class DeepFilterNetConfig:
    sample_rate: int = 48000
    fft_size: int = 960
    hop_size: int = 480
    min_nb_erb_freqs: int = 2
    nb_erb: int = 32
    nb_df: int = 96
    df_order: int = 5
    df_lookahead: int = 2
    conv_lookahead: int = 2
    conv_ch: int = 64
    emb_hidden_dim: int = 256
    emb_num_layers: int = 3
    df_hidden_dim: int = 256
    df_num_layers: int = 2
    enc_concat: bool = False
    lsnr_max: int = 35
    lsnr_min: int = -15
    model_version: str = "DeepFilterNet3"

    @property
    def freq_bins(self) -> int:
        return self.fft_size // 2 + 1

    @classmethod
    def from_dict(cls, d: dict) -> "DeepFilterNetConfig":
        alias = {
            "sampleRate": "sample_rate", "fftSize": "fft_size",
            "hopSize": "hop_size", "minNbErbFreqs": "min_nb_erb_freqs",
            "nbErb": "nb_erb", "nbDf": "nb_df", "dfOrder": "df_order",
            "dfLookahead": "df_lookahead", "convLookahead": "conv_lookahead",
            "convCh": "conv_ch", "embHiddenDim": "emb_hidden_dim",
            "embNumLayers": "emb_num_layers", "dfHiddenDim": "df_hidden_dim",
            "dfNumLayers": "df_num_layers", "encConcat": "enc_concat",
            "lsnrMax": "lsnr_max", "lsnrMin": "lsnr_min",
            "modelVersion": "model_version",
        }
        kw = {}
        keys = set(cls.__dataclass_fields__)
        for k, v in d.items():
            k = alias.get(k, k)
            if k in keys:
                kw[k] = v
        return cls(**kw)


# ---------------------------------------------------------------------------
# DSP
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def vorbis_window(size: int) -> np.ndarray:
    half = max(1, size // 2)
    i = np.arange(size)
    inner = np.sin(0.5 * np.pi * (i + 0.5) / half)
    return np.sin(0.5 * np.pi * inner * inner).astype(np.float32)


def _freq_to_erb(f):
    return 9.265 * np.log1p(f / (24.7 * 9.265))


def _erb_to_freq(e):
    return 24.7 * 9.265 * (np.exp(e / 9.265) - 1.0)


def erb_band_widths(sample_rate: int, fft_size: int, nb_bands: int,
                    min_nb_freqs: int) -> list[int]:
    """libDF ERB band widths (DeepFilterNetDSP.swift:152-200)."""
    nyq = sample_rate / 2
    freq_width = sample_rate / fft_size
    erb_low, erb_high = _freq_to_erb(0.0), _freq_to_erb(nyq)
    step = (erb_high - erb_low) / nb_bands
    widths = []
    prev = over = 0
    for i in range(1, nb_bands + 1):
        fb = int(round(_erb_to_freq(erb_low + i * step) / freq_width))
        nb = fb - prev - over
        if nb < min_nb_freqs:
            over = min_nb_freqs - nb
            nb = min_nb_freqs
        else:
            over = 0
        widths.append(max(1, nb))
        prev = fb
    widths[-1] += 1
    target = fft_size // 2 + 1
    widths[-1] += target - sum(widths)
    return widths


def compute_norm_alpha(hop_size: int, sample_rate: int) -> float:
    a_raw = math.exp(-hop_size / sample_rate)
    precision = 3
    a = 1.0
    while a >= 1.0:
        scale = 10.0**precision
        a = round(a_raw * scale) / scale
        precision += 1
    return a


def _stft(audio, window, n_fft, hop):
    """Non-centered framed STFT [T, F] (MossFormer2DSP.stft semantics)."""
    from tpu_audio.core import dsp

    n = audio.shape[0]
    n_frames = 1 + (n - n_fft + hop - 1) // hop
    need = n_fft + (n_frames - 1) * hop
    if need > n:
        audio = jnp.pad(audio, (0, need - n))
    frames = dsp.frame_signal(audio, n_fft, hop)
    return jnp.fft.rfft(frames * jnp.asarray(window)[None], axis=-1)


def _istft(spec, window, n_fft, hop, length):
    from tpu_audio.core import dsp

    return dsp.istft(spec, window, n_fft, hop, length=length, center=False)


# ---------------------------------------------------------------------------
# Network pieces (flat key-addressed params, like the checkpoint)
# ---------------------------------------------------------------------------


def _conv2d(w, x, fstride: int, lookahead: int = 0, groups: int | None = None):
    """Causal-time conv over [B, T, F, C] (NHWC); torch weight [O,I/g,kT,kF]."""
    k_t, k_f = w.shape[2], w.shape[3]
    in_per_group = w.shape[1]
    g = groups if groups is not None else max(1, x.shape[-1] // in_per_group)
    left = k_t - 1 - lookahead
    crop = max(0, -left)
    if crop and x.shape[1] > crop:
        x = x[:, crop:]
    x = jnp.pad(x, ((0, 0), (max(0, left), max(0, lookahead)),
                    (k_f // 2, k_f // 2), (0, 0)))
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, fstride), padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"), feature_group_count=g)


def _convt2d(w, x, fstride: int, groups: int):
    """Grouped transposed conv over [B, T, F, C]; torch weight [I,O/g,kT,kF].
    padding = (kT-1, kF/2), output_padding (0, kF/2) like the reference."""
    k_t, k_f = w.shape[2], w.shape[3]
    pad_t, pad_f = k_t - 1, k_f // 2
    out_pad_f = k_f // 2
    # grouped transposed conv via per-group slices (groups == channels here)
    in_c = x.shape[-1]
    in_per_g = in_c // groups
    outs = []
    for gi in range(groups):
        wg = w[gi * in_per_g : (gi + 1) * in_per_g]  # [I/g, O/g, kT, kF]
        xg = x[..., gi * in_per_g : (gi + 1) * in_per_g]
        y = jax.lax.conv_general_dilated(
            xg, jnp.flip(wg, axis=(2, 3)).astype(x.dtype),
            window_strides=(1, 1),
            padding=((k_t - 1 - pad_t, k_t - 1 - pad_t),
                     (k_f - 1 - pad_f, k_f - 1 - pad_f + out_pad_f)),
            lhs_dilation=(1, fstride),
            dimension_numbers=("NHWC", "IOHW", "NHWC"))
        outs.append(y)
    return jnp.concatenate(outs, axis=-1)


def _batch_norm(p, prefix, x):
    mean = p[f"{prefix}.running_mean"]
    var = p[f"{prefix}.running_var"]
    scale = p[f"{prefix}.weight"] / jnp.sqrt(var + 1e-5)
    return (x - mean) * scale + p[f"{prefix}.bias"]


def _grouped_linear(w, x):
    """w [groups, in/groups, out/groups]; x [B, T, in]."""
    g, ws, hs = w.shape
    b, t, _ = x.shape
    return jnp.einsum("btgi,gih->btgh", x.reshape(b, t, g, ws),
                      w.astype(x.dtype)).reshape(b, t, g * hs)


def _gru_layer(p, prefix, layer, x):
    return nn.gru({
        "weight_ih": p[f"{prefix}.weight_ih_l{layer}"],
        "weight_hh": p[f"{prefix}.weight_hh_l{layer}"],
        "bias_ih": p[f"{prefix}.bias_ih_l{layer}"],
        "bias_hh": p[f"{prefix}.bias_hh_l{layer}"],
    }, x)[0]


def _squeezed_gru(p, prefix, x, linear_out: bool):
    y = jax.nn.relu(_grouped_linear(p[f"{prefix}.linear_in.0.weight"], x))
    layer = 0
    while f"{prefix}.gru.weight_ih_l{layer}" in p:
        y = _gru_layer(p, f"{prefix}.gru", layer, y)
        layer += 1
    if linear_out and f"{prefix}.linear_out.0.weight" in p:
        y = jax.nn.relu(_grouped_linear(p[f"{prefix}.linear_out.0.weight"], y))
    return y


def _enc_conv(p, x, prefix, main, pointwise, bn, fstride, lookahead=0):
    y = _conv2d(p[f"{prefix}.{main}.weight"], x, fstride, lookahead)
    if pointwise is not None:
        y = _conv2d(p[f"{prefix}.{pointwise}.weight"], y, 1)
    return jax.nn.relu(_batch_norm(p, f"{prefix}.{bn}", y))


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


class DeepFilterNet:
    def __init__(self, config: DeepFilterNetConfig, params: dict,
                 dtype=jnp.float32):
        self.config = config
        self.params = params  # FLAT dict, checkpoint keys
        self.dtype = dtype
        self.sample_rate = config.sample_rate
        self.widths = erb_band_widths(config.sample_rate, config.fft_size,
                                      config.nb_erb, config.min_nb_erb_freqs)
        self.norm_alpha = compute_norm_alpha(config.hop_size, config.sample_rate)
        self.wnorm = 2.0 * config.hop_size / (config.fft_size**2)
        # dense ERB filterbank from widths (mean pooling per band)
        fb = np.zeros((config.freq_bins, config.nb_erb), np.float32)
        start = 0
        for j, wdt in enumerate(self.widths):
            stop = min(start + wdt, config.freq_bins)
            if stop > start:
                fb[start:stop, j] = 1.0 / (stop - start)
            start = stop
        self.erb_fb = params.get("erb_fb", jnp.asarray(fb))
        self._forward = jax.jit(self._forward_impl)

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32) -> "DeepFilterNet":
        model_dir = hub.resolve_or_download_model(repo_or_path)
        config = DeepFilterNetConfig.from_dict(hub.load_config(model_dir))
        flat = loading.load_safetensors(model_dir)
        params = {k: jnp.asarray(v) for k, v in flat.items()}
        return cls(config, params, dtype)

    # -- feature normalization (closed-form EMA; DeepFilterNetDSP.swift:8-46) --

    def _band_mean_norm(self, x):
        a = self.norm_alpha
        t = x.shape[0]
        time = jnp.arange(t, dtype=jnp.float32)
        powers = a**time
        accum = jnp.cumsum(x / powers[:, None], axis=0)
        init = jnp.linspace(-60.0, -90.0, x.shape[1])[None]
        state = powers[:, None] * (init + (1 - a) * accum)
        return (x - state) / 40.0

    def _band_unit_norm(self, real, imag):
        a = self.norm_alpha
        t = real.shape[0]
        powers = (a ** jnp.arange(t, dtype=jnp.float32))[:, None]
        mag = jnp.sqrt(real**2 + imag**2)
        accum = jnp.cumsum(mag / powers, axis=0)
        init = jnp.linspace(0.001, 0.0001, real.shape[1])[None]
        state = powers * (init + (1 - a) * accum)
        denom = jnp.sqrt(jnp.maximum(state, 1e-12))
        return real / denom, imag / denom

    @staticmethod
    def _lookahead(x, n):
        if n <= 0 or x.shape[1] <= n:
            return x
        return jnp.concatenate(
            [x[:, n:], jnp.zeros_like(x[:, :n])], axis=1)

    # -- network ------------------------------------------------------------------

    def _forward_impl(self, params, spec_ri, feat_erb, feat_df):
        """spec_ri [T, F, 2]; feat_erb [T, nb_erb]; feat_df [T, nb_df, 2]
        -> enhanced [T, F, 2]."""
        cfg = self.config
        p = params
        x_erb = feat_erb[None, :, :, None]  # [B, T, E, 1]
        x_df = feat_df[None]  # [B, T, nb_df, 2]

        x_erb = self._lookahead(x_erb, cfg.conv_lookahead)
        x_df = self._lookahead(x_df, cfg.conv_lookahead)

        e0 = _enc_conv(p, x_erb, "enc.erb_conv0", 1, None, 2, 1)
        e1 = _enc_conv(p, e0, "enc.erb_conv1", 0, 1, 2, 2)
        e2 = _enc_conv(p, e1, "enc.erb_conv2", 0, 1, 2, 2)
        e3 = _enc_conv(p, e2, "enc.erb_conv3", 0, 1, 2, 1)

        c0 = _enc_conv(p, x_df, "enc.df_conv0", 1, 2, 3, 1)
        c1 = _enc_conv(p, c0, "enc.df_conv1", 0, 1, 2, 2)

        b, t = c1.shape[0], c1.shape[1]
        cemb = c1.reshape(b, t, -1)
        cemb = jax.nn.relu(_grouped_linear(p["enc.df_fc_emb.0.weight"], cemb))

        emb = e3.reshape(b, t, -1)
        emb = (jnp.concatenate([emb, cemb], -1) if cfg.enc_concat
               else emb + cemb)
        emb = _squeezed_gru(p, "enc.emb_gru", emb, linear_out=True)

        # ERB mask decoder
        d = _squeezed_gru(p, "erb_dec.emb_gru", emb, linear_out=True)
        f8 = e3.shape[2]
        d = d.reshape(b, t, f8, -1)

        def pathway(prefix, e):
            y = _conv2d(p[f"{prefix}.0.weight"], e, 1)
            return jax.nn.relu(_batch_norm(p, f"{prefix}.1", y))

        def transpose_block(prefix, x, fstride):
            y = _convt2d(p[f"{prefix}.0.weight"], x, fstride, groups=cfg.conv_ch)
            y = _conv2d(p[f"{prefix}.1.weight"], y, 1)
            return _batch_norm(p, f"{prefix}.2", y)

        def regular_block(prefix, x):
            y = _conv2d(p[f"{prefix}.0.weight"], x, 1)
            y = _conv2d(p[f"{prefix}.1.weight"], y, 1)
            return _batch_norm(p, f"{prefix}.2", y)

        d3 = jax.nn.relu(pathway("erb_dec.conv3p", e3)) + d
        d3 = jax.nn.relu(regular_block("erb_dec.convt3", d3))
        d2 = jax.nn.relu(pathway("erb_dec.conv2p", e2)) + d3
        d2 = jax.nn.relu(transpose_block("erb_dec.convt2", d2, 2))
        d1 = jax.nn.relu(pathway("erb_dec.conv1p", e1)) + d2
        d1 = jax.nn.relu(transpose_block("erb_dec.convt1", d1, 2))
        d0 = jax.nn.relu(pathway("erb_dec.conv0p", e0)) + d1
        out = _conv2d(p["erb_dec.conv0_out.0.weight"], d0, 1)
        mask = jax.nn.sigmoid(_batch_norm(p, "erb_dec.conv0_out.1", out))
        # mask [B, T, E, 1] -> gains over freq bins
        gains = (mask[..., 0].reshape(b * t, cfg.nb_erb)
                 @ p["mask.erb_inv_fb"].astype(mask.dtype)).reshape(b, t, cfg.freq_bins)
        spec_masked = spec_ri[None] * gains[..., None]

        # DF coefficient decoder
        c = _squeezed_gru(p, "df_dec.df_gru", emb, linear_out=False)
        if "df_dec.df_skip.weight" in p:
            c = c + _grouped_linear(p["df_dec.df_skip.weight"], emb)
        c0p = _conv2d(p["df_dec.df_convp.1.weight"], c0, 1)
        c0p = _conv2d(p["df_dec.df_convp.2.weight"], c0p, 1)
        c0p = jax.nn.relu(_batch_norm(p, "df_dec.df_convp.3", c0p))
        df_out = jnp.tanh(_grouped_linear(p["df_dec.df_out.0.weight"], c)
                          ).reshape(b, t, cfg.nb_df, cfg.df_order * 2)
        coefs = (df_out + c0p).reshape(b, t, cfg.nb_df, cfg.df_order, 2)

        # deep filtering over the low bins
        pad_left = cfg.df_order - 1 - cfg.df_lookahead
        low = spec_ri[None, :, : cfg.nb_df]  # [B, T, nb_df, 2]
        padded = jnp.pad(low, ((0, 0), (pad_left, cfg.df_lookahead),
                               (0, 0), (0, 0)))
        out_r = jnp.zeros((b, t, cfg.nb_df), spec_ri.dtype)
        out_i = jnp.zeros((b, t, cfg.nb_df), spec_ri.dtype)
        for k in range(cfg.df_order):
            win = padded[:, k : k + t]
            sr, si = win[..., 0], win[..., 1]
            cr, ci = coefs[..., k, 0], coefs[..., k, 1]
            out_r = out_r + sr * cr - si * ci
            out_i = out_i + sr * ci + si * cr
        low_out = jnp.stack([out_r, out_i], axis=-1)
        enhanced = jnp.concatenate(
            [low_out, spec_masked[:, :, cfg.nb_df:]], axis=2)
        return enhanced[0]

    # -- public API (enhance, DeepFilterNetModel.swift:323-418) -----------------

    def enhance(self, audio: np.ndarray) -> np.ndarray:
        cfg = self.config
        x = np.asarray(audio, np.float32)
        orig_len = x.shape[0]
        padded = np.concatenate([np.zeros(cfg.hop_size, np.float32), x,
                                 np.zeros(cfg.fft_size, np.float32)])
        window = vorbis_window(cfg.fft_size)
        spec = _stft(jnp.asarray(padded), window, cfg.fft_size, cfg.hop_size)
        spec = spec * self.wnorm
        re, im = spec.real, spec.imag
        erb = (jnp.abs(spec) ** 2) @ jnp.asarray(self.erb_fb)
        erb_db = 10.0 * jnp.log10(erb + 1e-10)
        feat_erb = self._band_mean_norm(erb_db)
        dfr, dfi = self._band_unit_norm(re[:, : cfg.nb_df], im[:, : cfg.nb_df])
        feat_df = jnp.stack([dfr, dfi], axis=-1)
        spec_ri = jnp.stack([re, im], axis=-1)

        enhanced = self._forward(self.params, spec_ri.astype(self.dtype),
                                 feat_erb.astype(self.dtype),
                                 feat_df.astype(self.dtype))
        enh = (enhanced[..., 0] + 1j * enhanced[..., 1]).astype(jnp.complex64)
        enh = enh / self.wnorm
        out = _istft(enh, window, cfg.fft_size, cfg.hop_size,
                     length=orig_len + cfg.hop_size + cfg.fft_size)
        delay = cfg.fft_size - cfg.hop_size
        out = out[delay : delay + orig_len]
        return np.clip(np.asarray(out), -1.0, 1.0)

    def enhance_streaming(self, audio: np.ndarray,
                          chunk_samples: int | None = None):
        """Chunked enhancement generator. Each chunk is enhanced with the
        accumulated context so outputs match offline as context grows (a
        simplified take on the reference's hop-by-hop streamer; the
        stateful single-hop path is future work)."""
        cfg = self.config
        chunk = chunk_samples or cfg.hop_size * 25
        audio = np.asarray(audio, np.float32)
        emitted = 0
        for end in range(chunk, len(audio) + chunk, chunk):
            ctx = audio[: min(end, len(audio))]
            out = self.enhance(ctx)
            yield out[emitted:]
            emitted = len(out)
            if end >= len(audio):
                break
