"""DACVAE: continuous-latent DAC variant (48 kHz, VAE bottleneck).

TPU-first rebuild of the reference
(Sources/MLXAudioCodecs/DACVAE/*): a DAC-style snake SEANet whose
bottleneck is a VAE — the encoder output is 1x1-projected to
mean|logvar in codebook_dim space and ENCODE returns the mean
(DACVAE.swift:264-278); DECODE projects codebook_dim features back to
latent_dim and runs the decoder blocks' MAIN path (snake -> transposed
conv -> 3 snake residual units; DACVAEDecoder.swift:276-284) followed
by snake_out/conv_out/tanh. Convs use the "pad_mode none" scheme:
padding (k-stride)*dilation/2, transposed convs pad (stride+1)/2.

The audio watermarker riding the decoder (DACVAEWatermark.swift,
DACVAEFullDecoder.decodeWithWatermark, DACVAE.swift:153-198) is an
AudioSeal-style delta generator sharing the decoder's output layers:
audio -> causal conv -> strided causal downsample convs (the blocks'
``block_11`` side path) -> skip-LSTM -> 128-d latent, + an n-bit
message embedding, then conv -> skip-LSTM -> causal transposed-conv
upsampling (``block_3``/``block_6``/``block_7``) -> 1-ch delta blended
as ``audio + alpha * delta``. NOTE: the reference iterates the up/down
groups in an order whose channel counts cannot compose
(DACVAE.swift:166-198 applies the 64-in transposed conv to a 32-ch
input); this port runs the shape-consistent AudioSeal order —
downsample through blocks reversed, upsample forward.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.codecs import AudioCodecModel
from tpu_audio.codecs.snac import _fold_weight_norm
from tpu_audio.core import hub, loading, nn
from tpu_audio.core.jitting import ajit

__all__ = ["DACVAE", "DACVAEConfig"]


@dataclass
class DACVAEConfig:
    """DACVAEConfig.swift:31-86."""

    encoder_dim: int = 64
    encoder_rates: tuple = (2, 8, 10, 12)
    latent_dim: int = 1024
    decoder_dim: int = 1536
    decoder_rates: tuple = (12, 10, 8, 2)
    codebook_dim: int = 128
    sample_rate: int = 48000
    mean: float = 0.0
    std: float = 1.0
    wm_rates: tuple = (8, 5, 4, 2)  # DACVAE.swift:94 wmRates default
    wm_nbits: int = 16

    @classmethod
    def from_dict(cls, d: dict) -> "DACVAEConfig":
        keys = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in d.items() if k in keys}
        for k in ("encoder_rates", "decoder_rates", "wm_rates"):
            if k in kw:
                kw[k] = tuple(kw[k])
        return cls(**kw)

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.encoder_rates))


def _conv(p, x, kernel: int, stride: int = 1, dilation: int = 1):
    """pad_mode "none" conv: padding (k-stride)*dil/2
    (DACVAELayers.swift:81-158)."""
    pad = (kernel - stride) * dilation // 2
    return nn.conv1d(p, x, stride=stride, padding=pad, dilation=dilation)


def _convt(p, x, kernel: int, stride: int):
    """pad_mode "none" transposed conv: padding (stride+1)/2."""
    return nn.conv_transpose1d(p, x, stride=stride,
                               padding=(stride + 1) // 2)


def _res_unit(p, x, dilation: int, kernel: int = 7):
    """Snake residual unit with center-cropped skip
    (DACVAELayers.swift:291-381)."""
    y = nn.snake(x, p["act1"]["alpha"])
    y = _conv(p["conv1"], y, kernel, dilation=dilation)
    y = nn.snake(y, p["act2"]["alpha"])
    y = _conv(p["conv2"], y, 1)
    crop = (x.shape[1] - y.shape[1]) // 2
    if crop > 0:
        x = x[:, crop:x.shape[1] - crop]
    return x + y


def _causal_conv(p, x, kernel: int, stride: int = 1, dilation: int = 1):
    """pad_mode "auto" causal conv: full left pad + right extra to land on
    whole frames (DACVAELayers.swift:115-158)."""
    eff = (kernel - 1) * dilation + 1
    total = eff - stride
    length = x.shape[1]
    n_frames = math.ceil((length - eff + total) / stride + 1)
    ideal = (n_frames - 1) * stride + (kernel - total)
    extra = max(0, ideal - length)
    x = jnp.pad(x, ((0, 0), (total, extra), (0, 0)))
    return nn.conv1d(p, x, stride=stride, dilation=dilation)


def _causal_convt(p, x, kernel: int, stride: int):
    """pad_mode "auto" causal transposed conv: trim kernel-stride from the
    end (DACVAELayers.swift:226-255)."""
    y = nn.conv_transpose1d(p, x, stride=stride)
    trim = kernel - stride
    return y[:, :y.shape[1] - trim] if trim > 0 else y


def _elu_res_unit(p, x, kernel: int = 3):
    """ELU residual unit (compress-2 hidden, causal;
    DACVAELayers.swift:291-381 with act="ELU")."""
    y = _causal_conv(p["conv1"], jax.nn.elu(x), kernel)
    y = _causal_conv(p["conv2"], jax.nn.elu(y), 1)
    return x + y


def _skip_lstm(p, x):
    """Stacked LSTM with residual skip (DACVAELSTMBlock,
    DACVAEDecoder.swift:98-117)."""
    h = x
    for i in sorted(p["lstm"]["layers"], key=int):
        h, _ = nn.lstm(p["lstm"]["layers"][i], h)
    return h + x


def encode(params, audio, cfg: DACVAEConfig):
    """waveform [B, T, 1] -> latent mean [B, T/hop, codebook_dim]
    (DACVAE.swift:264-278; channels-last here)."""
    p = params["encoder"]
    h = _conv(p["conv_in"], audio, 7)
    for i, stride in enumerate(cfg.encoder_rates):
        bp = p["blocks"][str(i)]
        for j, dil in enumerate((1, 3, 9)):
            h = _res_unit(bp[f"res{j + 1}"], h, dil)
        h = nn.snake(h, bp["snake"]["alpha"])
        h = _conv(bp["conv"], h, 2 * stride, stride=stride)
    h = nn.snake(h, p["snake_out"]["alpha"])
    h = _conv(p["conv_out"], h, 3)
    proj = nn.conv1d(params["quantizer_in_proj"], h)
    mean, _ = jnp.split(proj, 2, axis=-1)
    return mean


def _decode_trunk(params, features, cfg: DACVAEConfig):
    """features -> pre-output decoder state [B, T, final_dim]
    (DACVAEFullDecoder main path, DACVAEDecoder.swift:276-284)."""
    p = params["decoder"]
    h = nn.conv1d(params["quantizer_out_proj"], features)
    h = _conv(p["conv_in"], h, 7)
    for i, stride in enumerate(cfg.decoder_rates):
        bp = p["blocks"][str(i)]
        h = nn.snake(h, bp["block_0"]["alpha"])
        h = _convt(bp["block_1"], h, 2 * stride, stride)
        h = _res_unit(bp["block_4"], h, 1)
        h = _res_unit(bp["block_5"], h, 3)
        h = _res_unit(bp["block_8"], h, 9)
    return h


def _decode_out(params, h, cfg: DACVAEConfig):
    p = params["decoder"]
    h = nn.snake(h, p["snake_out"]["alpha"])
    return jnp.tanh(_conv(p["conv_out"], h, 7))


def decode(params, features, cfg: DACVAEConfig):
    """features [B, T', codebook_dim] -> waveform [B, T, 1]
    (DACVAE.swift:287-310, main path only)."""
    return _decode_out(params, _decode_trunk(params, features, cfg), cfg)


def decode_watermarked(params, features, message, cfg: DACVAEConfig):
    """Decode and blend an n-bit watermark delta into the waveform
    (DACVAE.swift:153-198 + DACVAEWatermark.swift; see module docstring
    for the corrected group ordering). ``message [B, nbits]`` in {0, 1}."""
    x = _decode_trunk(params, features, cfg)
    base = _decode_out(params, x, cfg)
    p = params["decoder"]
    wm = p["wm_model"]
    n_blocks = len(cfg.decoder_rates)
    # watermark encoder: audio -> latent (strided causal downsample)
    h = _causal_conv(wm["encoder_block"]["pre_3"], base, 7)
    for i in reversed(range(n_blocks)):
        s = cfg.wm_rates[i]
        h = _causal_conv(p["blocks"][str(i)]["block_11"], jax.nn.elu(h),
                         2 * s, stride=s)
    h = _skip_lstm(wm["encoder_block"]["post_0"], h)
    h = _causal_conv(wm["encoder_block"]["post_2"], jax.nn.elu(h), 7)
    # message embedding: sum of per-bit rows (DACVAEWatermark.swift:26-56)
    emb = wm["msg_processor"]["msg_processor"]["weight"]
    nbits = emb.shape[0] // 2
    idx = 2 * jnp.arange(nbits) + message.astype(jnp.int32)
    h = h + emb[idx].sum(axis=1)[:, None, :].astype(h.dtype)
    # watermark decoder: latent -> 1-ch delta (causal upsample)
    h = _causal_conv(wm["decoder_block"]["pre_0"], h, 7)
    h = _skip_lstm(wm["decoder_block"]["pre_1"], h)
    for i in range(n_blocks):
        s = cfg.wm_rates[i]
        bp = p["blocks"][str(i)]
        h = _causal_convt(bp["block_3"], jax.nn.elu(h), 2 * s, s)
        h = _elu_res_unit(bp["block_6"], h)
        h = _elu_res_unit(bp["block_7"], h)
    delta = _causal_conv(wm["decoder_block"]["post_1"], jax.nn.elu(h), 7)
    # alpha = wm_channels / d_wm_out (DACVAE.swift:137)
    wm_ch = wm["encoder_block"]["pre_3"]["weight"].shape[0]
    d_wm = wm["encoder_block"]["post_2"]["weight"].shape[0]
    t = min(base.shape[1], delta.shape[1])
    return base[:, :t] + (wm_ch / d_wm) * delta[:, :t]


def sanitize(weights):
    """Fold weight norm, keep the watermark subtrees (routing bare
    wm_model.* under decoder.), map MLX layouts ([O, K, I] / convT
    [O, K, I]) to torch and MLX LSTM names (Wx/Wh/bias) to torch."""
    flat = {}
    for k, v in weights.items():
        if k.startswith("wm_model."):
            k = "decoder." + k  # reference attaches it to the full decoder
        flat[k] = v
    out = {}
    for k, v in flat.items():
        if k.endswith(".weight_g"):
            continue
        if k.endswith(".weight_v"):
            g = flat.get(k[:-len(".weight_v")] + ".weight_g")
            if g is None:
                continue
            k = k[:-len(".weight_v")] + ".weight"
            v = _fold_weight_norm(g, v)
        if k.endswith(".weight") and v.ndim == 3 \
                and "msg_processor" not in k:
            # MLX [O, K, I] -> torch; transposed convs (block_1 main /
            # block_3 watermark upsample) -> [I, O, K]
            if ".block_1." in k or ".block_3." in k:
                v = np.transpose(v, (2, 0, 1))
            else:
                v = np.transpose(v, (0, 2, 1))
        if k.endswith(".alpha"):
            v = v.reshape(-1)
        if ".lstm.layers." in k:
            base, leaf = k.rsplit(".", 1)
            if leaf == "Wx":
                k = f"{base}.weight_ih_l0"
            elif leaf == "Wh":
                k = f"{base}.weight_hh_l0"
            elif leaf == "bias":
                k = f"{base}.bias_ih_l0"
                out[f"{base}.bias_hh_l0"] = np.zeros_like(v)
        out[k] = v
    return out


class DACVAE(AudioCodecModel):
    def __init__(self, config: DACVAEConfig, params, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        self.sample_rate = config.sample_rate
        self._encode = ajit(functools.partial(encode, cfg=config))
        self._decode = ajit(functools.partial(decode, cfg=config))
        self._decode_wm = ajit(functools.partial(decode_watermarked,
                                                    cfg=config))

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32
                        ) -> "DACVAE":
        model_dir = hub.resolve_or_download_model(repo_or_path)
        config = DACVAEConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        return cls(config, params, dtype)

    def encode(self, audio):
        """waveform -> latent means [B, T', codebook_dim] (normalized by
        config mean/std)."""
        x = np.asarray(audio, np.float32)
        if x.ndim == 1:
            x = x[None, :, None]
        elif x.ndim == 2:
            x = x[:, :, None]
        hop = self.config.hop_length
        pad = (-x.shape[1]) % hop
        if pad:
            x = np.pad(x, ((0, 0), (0, pad), (0, 0)))
        z = self._encode(self.params, jnp.asarray(x, self.dtype))
        return (z - self.config.mean) / self.config.std

    def decode(self, features, message=None):
        """features -> waveform; pass ``message [B, nbits]`` (or ``True``
        for a random message) to blend the audio watermark
        (DACVAEFullDecoder.decodeWithWatermark, DACVAE.swift:153-163)."""
        feats = jnp.asarray(features, self.dtype) * self.config.std \
            + self.config.mean
        if feats.ndim == 2:
            feats = feats[None]
        if message is None:
            return self._decode(self.params, feats)
        if message is True:
            message = self.random_message(feats.shape[0])
        return self._decode_wm(self.params,
                               feats, jnp.asarray(message, jnp.int32))

    def random_message(self, batch: int = 1, seed: int = 0) -> np.ndarray:
        """Random n-bit binary message (DACVAEWatermarker.randomMessage,
        DACVAEWatermark.swift:243-246)."""
        rng = np.random.default_rng(seed)
        return rng.integers(0, 2, (batch, self.config.wm_nbits),
                            dtype=np.int32)

    def reconstruct(self, audio):
        audio = np.atleast_1d(np.asarray(audio))
        out = np.asarray(self.decode(self.encode(audio)))
        return out[:, : audio.shape[-1], 0]
