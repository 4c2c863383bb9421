"""HiggsAudioV2 codec (OmniVoice audio tokenizer): DAC acoustic
encoder/decoder with learnable Snake activations, residual vector
quantization with per-stage projections, and a HuBERT + SemanticEncoder
semantic path fused into the quantizer input for voice cloning.

TPU-first rebuild of the reference
(Sources/MLXAudioTTS/Models/OmniVoice/OmniVoice.swift:1100-1767 and
OmniVoiceSemantic.swift): everything runs channels-last [B, T, C] with
torch-layout conv weights (no NCL round-trips), the RVQ encode is a
jitted residual loop of batched distance matmuls, and the HuBERT trunk
reuses :mod:`tpu_audio.models.stt.wav2vec2` primitives (the reference
ports the same Wav2Vec2 code, OmniVoiceSemantic.swift:8-15) but
collects every layer's hidden state for the HiggsAudioV2
mean-of-all-layers semantic feature.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import hub, loading, nn
from tpu_audio.models.stt import wav2vec2
from tpu_audio.core.jitting import ajit

__all__ = ["HiggsAudioTokenizer", "HiggsAudioConfig", "sinc_resample"]


@dataclass
class HiggsAudioConfig:
    """OmniVoiceConfig.swift:96-169 (acoustic + HuBERT semantic knobs)."""

    codebook_size: int = 1024
    codebook_dim: int = 64
    n_codebooks: int = 9
    hop_length: int = 960
    downsampling_ratios: tuple = (8, 5, 4, 2, 3)
    upsampling_ratios: tuple = (8, 5, 4, 2, 3)
    encoder_hidden_size: int = 64
    decoder_hidden_size: int = 1024
    kernel_size: int = 3
    # HuBERT semantic trunk
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: tuple = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: tuple = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tuple = (5, 2, 2, 2, 2, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    sample_rate: int = 24000
    semantic_sample_rate: int = 16000
    downsample_factor: int = 320

    @classmethod
    def from_dict(cls, d: dict) -> "HiggsAudioConfig":
        d = dict(d)
        # flatten nested acoustic/semantic sub-configs
        # (OmniVoice.swift:1638-1656)
        for sub in ("acoustic_model_config", "semantic_model_config"):
            for k, v in d.get(sub, {}).items():
                d.setdefault(k, v)
        keys = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in d.items() if k in keys}
        for k in ("downsampling_ratios", "upsampling_ratios", "conv_dim",
                  "conv_kernel", "conv_stride"):
            if k in kw:
                kw[k] = tuple(kw[k])
        return cls(**kw)

    def hubert_config(self) -> wav2vec2.Wav2Vec2Config:
        return wav2vec2.Wav2Vec2Config(
            hidden_size=self.hidden_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            intermediate_size=self.intermediate_size,
            conv_dim=self.conv_dim, conv_kernel=self.conv_kernel,
            conv_stride=self.conv_stride, conv_bias=False,
            feat_extract_norm="group", do_stable_layer_norm=False,
            num_conv_pos_embeddings=self.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=self.num_conv_pos_embedding_groups)


# -- sinc resampling (OmniVoiceSemantic.swift:407-460) ------------------------------


def sinc_resample(waveform: np.ndarray, orig_freq: int, new_freq: int,
                  lowpass_filter_width: int = 6, rolloff: float = 0.99
                  ) -> np.ndarray:
    """Hann-windowed sinc resampling (torchaudio sinc_interp_hann parity;
    the reference notes platform resamplers do NOT match)."""
    if orig_freq == new_freq:
        return np.asarray(waveform, np.float32)
    g = math.gcd(orig_freq, new_freq)
    orig_r, new_r = orig_freq // g, new_freq // g
    base_freq = min(orig_r, new_r) * rolloff
    width = int(np.ceil(lowpass_filter_width * orig_r / base_freq))
    k_taps = 2 * width + orig_r

    idx = (np.arange(k_taps) - width) / orig_r  # [K]
    phase = np.arange(new_r)[:, None] / new_r  # [P, 1]
    t = (-phase + idx[None]) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t_pi = t * np.pi
    sinc = np.where(t_pi == 0, 1.0, np.sin(t_pi) / np.where(t_pi == 0, 1.0,
                                                            t_pi))
    kernel = (sinc * window * (base_freq / orig_r)).astype(np.float32)

    wav = np.asarray(waveform, np.float32)
    length = len(wav)
    padded = np.concatenate([np.zeros(width, np.float32), wav,
                             np.zeros(width + orig_r, np.float32)])
    out_len = int(np.ceil(length * new_r / orig_r))
    n_starts = -(-out_len // new_r)
    starts = np.arange(n_starts) * orig_r
    # gather strided frames [n_starts, k_taps] then one matmul per phase
    frames = padded[starts[:, None] + np.arange(k_taps)[None]]
    out = frames @ kernel.T  # [n_starts, P]
    return out.reshape(-1)[:out_len].astype(np.float32)


# -- DAC acoustic path (OmniVoice.swift:1100-1380) ----------------------------------


def _snake(p, x):
    """SnakeAlpha on channels-last (OmniVoice.swift:1160-1188); checkpoint
    alpha broadcasts over [B, T, C]."""
    return nn.snake(x, p["alpha"].reshape(1, 1, -1))


def _res_unit(p, x, dilation: int):
    """Snake -> k7 dilated conv -> Snake -> k1 conv + residual
    (OmniVoiceDACResidualUnit, OmniVoice.swift:1102-1147)."""
    pad = (7 - 1) * dilation // 2
    h = nn.conv1d(p["conv1"], _snake(p["snake1"], x), padding=pad,
                  dilation=dilation)
    h = nn.conv1d(p["conv2"], _snake(p["snake2"], h))
    if h.shape[1] != x.shape[1]:
        cut = (x.shape[1] - h.shape[1]) // 2
        x = x[:, cut:cut + h.shape[1]]
    return x + h


def acoustic_encode(p, x, cfg: HiggsAudioConfig):
    """waveform [B, T, 1] -> acoustic features [B, T', A]
    (OmniVoiceDACAcousticEncoder, OmniVoice.swift:1272-1325)."""
    h = nn.conv1d(p["conv1"], x, padding=3)
    for i, stride in enumerate(cfg.downsampling_ratios):
        bp = p["block"][str(i)]
        for j, dil in enumerate((1, 3, 9)):
            h = _res_unit(bp[f"res_unit{j + 1}"], h, dil)
        h = _snake(bp["snake1"], h)
        h = nn.conv1d(bp["conv1"], h, stride=stride,
                      padding=stride // 2 + stride % 2)
    h = _snake(p["snake1"], h)
    return nn.conv1d(p["conv2"], h, padding=1)


def acoustic_decode(p, z, cfg: HiggsAudioConfig):
    """features [B, T, A] -> waveform [B, T*hop, 1]
    (OmniVoiceDACAcousticDecoder, OmniVoice.swift:1327-1380; no final
    tanh, matching the Python _adjust_dac_decoder)."""
    h = nn.conv1d(p["conv1"], z, padding=3)
    for i, stride in enumerate(cfg.upsampling_ratios):
        bp = p["block"][str(i)]
        h = nn.conv_transpose1d(bp["conv_t1"], _snake(bp["snake1"], h),
                                stride=stride,
                                padding=stride // 2 + stride % 2,
                                output_padding=stride % 2)
        for j, dil in enumerate((1, 3, 9)):
            h = _res_unit(bp[f"res_unit{j + 1}"], h, dil)
    h = _snake(p["snake1"], h)
    return nn.conv1d(p["conv2"], h, padding=3)


# -- residual vector quantizer (OmniVoice.swift:1382-1460) --------------------------


def rvq_encode(p, z, n_codebooks: int):
    """fused features [B, T, F] -> codes [B, T, C] by greedy residual
    quantization; the distance computation is one batched matmul per
    stage."""
    residual = z.astype(jnp.float32)
    tokens = []
    for i in range(n_codebooks):
        qp = p["quantizers"][str(i)]
        cb = qp["codebook"]["embed"].astype(jnp.float32)  # [K, d]
        zq = nn.linear(qp["project_in"], residual)
        dists = ((zq * zq).sum(-1, keepdims=True)
                 + (cb * cb).sum(-1)
                 - 2.0 * zq @ cb.T)
        idx = jnp.argmin(dists, axis=-1).astype(jnp.int32)
        tokens.append(idx)
        recon = nn.linear(qp["project_out"], cb[idx])
        residual = residual - recon
    return jnp.stack(tokens, axis=-1)


def rvq_decode(p, codes, n_codebooks: int):
    """codes [B, C, T] -> features [B, T, F]."""
    out = None
    for i in range(n_codebooks):
        qp = p["quantizers"][str(i)]
        cb = qp["codebook"]["embed"]
        q = nn.linear(qp["project_out"], cb[codes[:, i]])
        out = q if out is None else out + q
    return out


# -- HuBERT semantic path (OmniVoiceSemantic.swift) ---------------------------------


def hubert_mean_hidden(p, waveform, cfg: wav2vec2.Wav2Vec2Config):
    """waveform [B, T] -> mean over ALL hidden states [B, T', D]
    (OmniVoiceHubertModel.meanHiddenStates, OmniVoiceSemantic.swift:299-318;
    HiggsAudioV2 averages the full stack, not just the last layer)."""
    feats = wav2vec2._feature_extractor(p["feature_extractor"], waveform,
                                        cfg)
    fp = p["feature_projection"]
    h = nn.layer_norm(fp["layer_norm"], feats, cfg.layer_norm_eps)
    x = nn.linear(fp["projection"], h)
    enc = p["encoder"]
    x = x + wav2vec2._pos_conv_embed(enc["pos_conv_embed"], x, cfg)
    x = nn.layer_norm(enc["layer_norm"], x, cfg.layer_norm_eps)
    states = [x]
    for i in range(cfg.num_hidden_layers):
        lp = enc["layers"][str(i)]
        x = nn.layer_norm(
            lp["layer_norm"],
            x + wav2vec2._attention(lp["attention"], x,
                                    cfg.num_attention_heads),
            cfg.layer_norm_eps)
        ff = nn.linear(lp["feed_forward"]["output_dense"], nn.gelu(
            nn.linear(lp["feed_forward"]["intermediate_dense"], x)))
        x = nn.layer_norm(lp["final_layer_norm"], x + ff, cfg.layer_norm_eps)
        states.append(x)
    return jnp.mean(jnp.stack(states, axis=0), axis=0)


def semantic_encoder_forward(p, x, kernel: int):
    """Post-HuBERT CNN (OmniVoiceSemanticEncoder,
    OmniVoiceSemantic.swift:320-399): conv + 2 blocks of (2 ELU residual
    units + stride-1 conv)."""
    pad = (kernel - 1) // 2

    def res_unit(up, h):
        y = nn.conv1d(up["conv1"], jax.nn.elu(h), padding=pad)
        y = nn.conv1d(up["conv2"], jax.nn.elu(y))
        return h + y

    h = nn.conv1d(p["conv"], x, padding=pad)
    for i in range(2):
        bp = p["conv_blocks"][str(i)]
        for j in range(2):
            h = res_unit(bp["res_units"][str(j)], h)
        h = nn.conv1d(bp["conv"], h, padding=pad)
    return h


# -- weights ------------------------------------------------------------------------


def sanitize(weights):
    """OmniVoiceAudioTokenizer.sanitize (OmniVoice.swift:1570-1620): keep
    the acoustic/quantizer/semantic trees, drop the decoder-side semantic
    path and EMA stats, fold the HuBERT pos-conv weight norm."""
    keep = ("acoustic_encoder.", "acoustic_decoder.", "quantizer.", "fc2.",
            "semantic_model.", "encoder_semantic.", "fc.")
    out = {}
    folded = {}
    for k, v in weights.items():
        if k == "semantic_model.masked_spec_embed":
            continue
        if k.startswith(("decoder_semantic.", "fc1.")):
            continue
        if not k.startswith(keep):
            continue
        if k.endswith((".embed_avg", ".cluster_size", ".inited")):
            continue
        if ".codebook.weight" in k:
            k = k.replace(".codebook.weight", ".codebook.embed")
        if ".parametrizations.weight.original" in k:
            base = k.split(".parametrizations.")[0]
            folded.setdefault(base, {})[k[-1]] = v
            continue
        out[k] = v
    for base, gv in folded.items():  # pos-conv weight norm (dim=2)
        g, v = np.asarray(gv["0"], np.float32), np.asarray(gv["1"],
                                                           np.float32)
        norm = np.sqrt((v * v).sum(axis=(0, 1), keepdims=True))
        out[f"{base}.weight"] = g * v / norm
    return out


class HiggsAudioTokenizer:
    """OmniVoice audio tokenizer: encode waveform -> [C, T] codes, decode
    codes -> waveform (OmniVoiceAudioTokenizer, OmniVoice.swift:1462-1620).
    """

    def __init__(self, config: HiggsAudioConfig, params, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        self.sample_rate = config.sample_rate
        self.has_semantic = "semantic_model" in params
        self._encode = ajit(self._encode_impl)
        self._decode = ajit(self._decode_impl)

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32
                        ) -> "HiggsAudioTokenizer":
        model_dir = hub.resolve_or_download_model(repo_or_path)
        config = HiggsAudioConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize,
                                     dtype=dtype)
        # infer n_codebooks from the checkpoint (OmniVoice.swift:1695-1707)
        qs = params.get("quantizer", {}).get("quantizers", {})
        if qs:
            config.n_codebooks = max(int(i) for i in qs) + 1
        return cls(config, params, dtype)

    @property
    def acoustic_hop(self) -> int:
        return int(np.prod(self.config.downsampling_ratios))

    @property
    def _semantic_downsample(self) -> int:
        cfg = self.config
        hubert_fps = cfg.semantic_sample_rate / cfg.downsample_factor
        acoustic_fps = cfg.sample_rate / self.acoustic_hop
        return max(1, round(hubert_fps / acoustic_fps))

    def _encode_impl(self, params, wav, wav16):
        cfg = self.config
        acoustic = acoustic_encode(params["acoustic_encoder"], wav, cfg)
        semantic = hubert_mean_hidden(params["semantic_model"], wav16,
                                      cfg.hubert_config())
        dsf = self._semantic_downsample
        if dsf > 1:
            semantic = semantic[:, ::dsf]
        semantic = semantic_encoder_forward(params["encoder_semantic"],
                                            semantic, cfg.kernel_size)
        t = min(acoustic.shape[1], semantic.shape[1])
        fused = jnp.concatenate([acoustic[:, :t], semantic[:, :t]], axis=-1)
        fused = nn.linear(params["fc"], fused)
        return rvq_encode(params["quantizer"], fused, cfg.n_codebooks)

    def _decode_impl(self, params, codes):
        cfg = self.config
        z = rvq_decode(params["quantizer"], codes, cfg.n_codebooks)
        h = nn.linear(params["fc2"], z)
        return acoustic_decode(params["acoustic_decoder"], h, cfg)

    def encode(self, audio) -> np.ndarray:
        """waveform [T] at ``sample_rate`` -> codes [n_codebooks, T']
        (OmniVoice.swift:1500-1553)."""
        if not self.has_semantic:
            raise ValueError(
                "checkpoint lacks the semantic encode path (semantic_model.*)"
                " required for voice cloning")
        cfg = self.config
        wav = np.asarray(audio, np.float32).reshape(-1)
        wav16 = sinc_resample(wav, cfg.sample_rate, cfg.semantic_sample_rate)
        pad = cfg.downsample_factor // 2
        wav16 = np.pad(wav16, (pad, pad))
        codes = self._encode(self.params,
                             jnp.asarray(wav, self.dtype)[None, :, None],
                             jnp.asarray(wav16, self.dtype)[None])
        return np.asarray(codes[0]).T  # [C, T]

    def decode(self, tokens) -> np.ndarray:
        """codes [n_codebooks, T] -> waveform [T*hop]."""
        codes = jnp.asarray(tokens, jnp.int32)[None]
        wav = self._decode(self.params, codes)
        return np.asarray(wav[0, :, 0])
