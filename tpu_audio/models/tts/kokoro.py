"""Kokoro (StyleTTS2): non-AR phoneme-to-speech with style vectors.

TPU-first rebuild of the reference
(Sources/MLXAudioTTS/Models/StyleTTS2/{Kokoro/*,Blocks/*,Albert.swift}):
ALBERT (PL-BERT) text encoder -> prosody predictor (style-conditioned
BiLSTM duration + AdaIN F0/noise heads) -> duration-expanded alignment ->
ISTFTNet-style generator with harmonic source excitation and an
mag/phase ISTFT head. Voices are per-token-length style embedding files
(KokoroModel.swift:56-115, 212).

Structure notes: activations are channels-last [B, T, C]; weight-normed
convs fold to dense at load; BiLSTMs are forward+reverse ``lax.scan``s.
The ALBERT/duration stage is jitted per token bucket; the frame-dependent
decoder stage runs eagerly (AdaIN instance statistics are over true frame
counts, so padding would change results — masked-norm bucketing is a later
optimization).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import dsp, hub, loading, nn
from tpu_audio.core.generation import (
    AudioGenerateParameters,
    AudioGeneration,
    AudioGenerationError,
    AudioGenerationInfo,
)

__all__ = ["Kokoro", "KokoroConfig"]


@dataclass
class PLBertConfig:
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    hidden_size: int = 768
    intermediate_size: int = 2048
    max_position_embeddings: int = 512
    embedding_size: int = 128
    inner_group_num: int = 1
    num_hidden_groups: int = 1
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12

    @classmethod
    def from_dict(cls, d):
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass
class ISTFTNetConfig:
    resblock_kernel_sizes: tuple = (3, 7, 11)
    upsample_rates: tuple = (10, 6)
    upsample_initial_channel: int = 512
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_kernel_sizes: tuple = (20, 12)
    gen_istft_n_fft: int = 20
    gen_istft_hop_size: int = 5

    @classmethod
    def from_dict(cls, d):
        keys = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in d.items() if k in keys}
        for k in ("resblock_kernel_sizes", "upsample_rates", "upsample_kernel_sizes"):
            if k in kw:
                kw[k] = tuple(kw[k])
        if "resblock_dilation_sizes" in kw:
            kw["resblock_dilation_sizes"] = tuple(tuple(x) for x in kw["resblock_dilation_sizes"])
        return cls(**kw)


@dataclass
class KokoroConfig:
    hidden_dim: int = 512
    style_dim: int = 128
    n_layer: int = 3
    max_dur: int = 50
    n_token: int = 178
    text_encoder_kernel_size: int = 5
    asr_res_dim: int = 64
    sample_rate: int = 24000
    vocab: dict = field(default_factory=dict)
    plbert: PLBertConfig = field(default_factory=PLBertConfig)
    istftnet: ISTFTNetConfig = field(default_factory=ISTFTNetConfig)
    voice_aliases: dict = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d):
        keys = set(cls.__dataclass_fields__) - {"plbert", "istftnet"}
        kw = {k: v for k, v in d.items() if k in keys}
        return cls(
            plbert=PLBertConfig.from_dict(d.get("plbert") or {}),
            istftnet=ISTFTNetConfig.from_dict(d.get("istftnet") or {}),
            **kw,
        )


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------


def leaky_relu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


def bilstm(p, x):
    """Bidirectional LSTM [B, T, I] -> [B, T, 2H]
    (Blocks/BiLSTM.swift; param names Wx_forward etc.)."""
    fwd_p = {"weight_ih": p["Wx_forward"], "weight_hh": p["Wh_forward"],
             "bias_ih": p["bias_ih_forward"], "bias_hh": p["bias_hh_forward"]}
    bwd_p = {"weight_ih": p["Wx_backward"], "weight_hh": p["Wh_backward"],
             "bias_ih": p["bias_ih_backward"], "bias_hh": p["bias_hh_backward"]}
    fwd, _ = nn.lstm(fwd_p, x)
    bwd, _ = nn.lstm(bwd_p, x[:, ::-1])
    return jnp.concatenate([fwd, bwd[:, ::-1]], axis=-1)


def instance_norm(x, eps=1e-5):
    """Per-sample, per-channel norm over time: x [B, T, C]."""
    mean = x.mean(axis=1, keepdims=True)
    var = x.var(axis=1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def adain(p, x, s):
    """AdaIN1d: style -> (gamma, beta) over instance-normed x [B, T, C]."""
    h = nn.linear(p["fc"], s)  # [B, 2C]
    gamma, beta = jnp.split(h, 2, axis=-1)
    return (1 + gamma[:, None]) * instance_norm(x) + beta[:, None]


def ada_layer_norm(p, x, s, eps=1e-5):
    h = nn.linear(p["fc"], s)
    gamma, beta = jnp.split(h, 2, axis=-1)
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (1 + gamma[:, None]) * ((x - mean) / jnp.sqrt(var + eps)) + beta[:, None]


def adain_res_block_1d(p, x, s, upsample=False):
    """AdainResBlock1d on [B, T, C] (ResidualBlocks.swift:7-72)."""
    h = adain(p["norm1"], x, s)
    h = leaky_relu(h, 0.2)
    if upsample:
        # depthwise stride-2 transposed conv + right pad 1
        h = nn.conv_transpose1d(p["pool"], h, stride=2, padding=1,
                                groups=h.shape[-1])
        h = jnp.pad(h, ((0, 0), (0, 1), (0, 0)))
    h = nn.conv1d(p["conv1"], h, padding=1)
    h = adain(p["norm2"], h, s)
    h = leaky_relu(h, 0.2)
    h = nn.conv1d(p["conv2"], h, padding=1)
    # shortcut
    sc = x
    if upsample:
        sc = jnp.repeat(sc, 2, axis=1)  # nearest 2x
    if "conv1x1" in p:
        sc = nn.conv1d(p["conv1x1"], sc)
    return (h + sc) / math.sqrt(2.0)


def adain_res_block_snake(p, x, s, kernel: int, dilations):
    """AdaINResBlock1 with snake activations (ResidualBlocks.swift:76-119)."""
    h = x
    for i, d in enumerate(dilations):
        a1 = p[f"alpha1_{i}"].reshape(1, 1, -1)
        a2 = p[f"alpha2_{i}"].reshape(1, 1, -1)
        xt = adain(p["adain1"][str(i)], h, s)
        xt = xt + (1 / a1) * jnp.sin(a1 * xt) ** 2
        xt = nn.conv1d(p["convs1"][str(i)], xt, padding=(kernel * d - d) // 2,
                       dilation=d)
        xt = adain(p["adain2"][str(i)], xt, s)
        xt = xt + (1 / a2) * jnp.sin(a2 * xt) ** 2
        xt = nn.conv1d(p["convs2"][str(i)], xt, padding=(kernel - 1) // 2)
        h = xt + h
    return h


# ---------------------------------------------------------------------------
# ALBERT (PL-BERT)
# ---------------------------------------------------------------------------


def albert_forward(p, input_ids, attention_mask, cfg: PLBertConfig):
    emb = p["embeddings"]
    t = input_ids.shape[1]
    x = (nn.embedding(emb["word_embeddings"], input_ids)
         + emb["position_embeddings"]["weight"][None, :t]
         + nn.embedding(emb["token_type_embeddings"],
                        jnp.zeros_like(input_ids)))
    x = nn.layer_norm(emb["LayerNorm"], x, cfg.layer_norm_eps)

    mask = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -10000.0
    enc = p["encoder"]
    x = nn.linear(enc["embedding_hidden_mapping_in"], x)
    n_heads = cfg.num_attention_heads
    hd = cfg.hidden_size // n_heads
    for i in range(cfg.num_hidden_layers):
        g = str(i // (cfg.num_hidden_layers // cfg.num_hidden_groups))
        for j in range(cfg.inner_group_num):
            lp = enc["albert_layer_groups"][g]["albert_layers"][str(j)]
            ap = lp["attention"]
            b, t, d = x.shape
            q = nn.linear(ap["query"], x).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
            k = nn.linear(ap["key"], x).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
            v = nn.linear(ap["value"], x).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
            o = nn.sdpa(q, k, v, mask=mask)
            o = nn.linear(ap["dense"], o.transpose(0, 2, 1, 3).reshape(b, t, d))
            x = nn.layer_norm(ap["LayerNorm"], o + x, cfg.layer_norm_eps)
            h = nn.linear(lp["ffn"], x)
            h = 0.5 * h * (1.0 + jnp.tanh(0.7978846 * (h + 0.044715 * h**3)))
            h = nn.linear(lp["ffn_output"], h)
            x = nn.layer_norm(lp["full_layer_layer_norm"], h + x,
                              cfg.layer_norm_eps)
    return x


# ---------------------------------------------------------------------------
# Text encoder + prosody predictor
# ---------------------------------------------------------------------------


def text_encoder_forward(p, input_ids, pad_mask, cfg: KokoroConfig):
    """[B, T] -> [B, T, C] (KokoroTextEncoder; pad_mask True where padding)."""
    x = nn.embedding(p["embedding"], input_ids)
    zero = pad_mask[..., None]
    x = jnp.where(zero, 0.0, x)
    for i in range(cfg.n_layer):
        block = p["cnn"][str(i)]
        x = nn.conv1d(block["0"], x, padding=(cfg.text_encoder_kernel_size - 1) // 2)
        x = nn.layer_norm(block["1"], x)
        x = leaky_relu(jnp.where(zero, 0.0, x), 0.2)
        x = jnp.where(zero, 0.0, x)
    x = bilstm(p["lstm"], x)
    return jnp.where(zero, 0.0, x)


def duration_encoder_forward(p, x, style, pad_mask, cfg: KokoroConfig):
    """[B, T, C] + style -> [B, T, C+style] (KokoroDurationEncoder)."""
    b, t, c = x.shape
    s = jnp.broadcast_to(style[:, None], (b, t, style.shape[-1]))
    h = jnp.concatenate([x, s], axis=-1)
    h = jnp.where(pad_mask[..., None], 0.0, h)
    for i in range(cfg.n_layer):
        h = bilstm(p["lstms"][str(2 * i)], h)
        h = ada_layer_norm(p["lstms"][str(2 * i + 1)], h, style)
        h = jnp.concatenate([h, s], axis=-1)
        h = jnp.where(pad_mask[..., None], 0.0, h)
    return h


def prosody_predict(p, en, style):
    """Aligned features [B, T, C+S] -> (F0 [B, 2T], N [B, 2T])."""
    shared = bilstm(p["shared"], en)
    f0 = shared
    for i in range(3):
        f0 = adain_res_block_1d(p["F0"][str(i)], f0, style, upsample=(i == 1))
    f0 = nn.conv1d(p["F0_proj"], f0)[..., 0]
    n = shared
    for i in range(3):
        n = adain_res_block_1d(p["N"][str(i)], n, style, upsample=(i == 1))
    n = nn.conv1d(p["N_proj"], n)[..., 0]
    return f0, n


# ---------------------------------------------------------------------------
# Generator (ISTFTNet with harmonic source)
# ---------------------------------------------------------------------------


def _interp_linear(x, size):
    """Linear resize along axis 1 of [B, T, C]."""
    return jax.image.resize(x, (x.shape[0], size, x.shape[2]), method="linear")


def sine_source(p, f0_up, rng, sample_rate: int, upsample_scale: int,
                harmonic_num: int = 8, sine_amp: float = 0.1,
                noise_std: float = 0.003, voiced_threshold: float = 10.0):
    """Harmonic sine excitation (SineGenerator + SourceModule)."""
    harmonics = jnp.arange(1, harmonic_num + 2, dtype=jnp.float32)[None, None]
    fn = f0_up * harmonics  # [B, T, H+1]
    rad = (fn / sample_rate) % 1.0
    k1, k2, k3 = jax.random.split(rng, 3)
    rand_ini = jax.random.normal(k1, (f0_up.shape[0], harmonic_num + 1))
    rand_ini = rand_ini.at[:, 0].set(0.0)
    rad = rad.at[:, 0].add(rand_ini)
    down = max(1, int(math.ceil(rad.shape[1] / upsample_scale)))
    rad_down = _interp_linear(rad, down)
    phase_down = jnp.cumsum(rad_down, axis=1) * (2 * np.pi)
    phase = _interp_linear(phase_down * upsample_scale, rad.shape[1])
    sines = jnp.sin(phase) * sine_amp
    uv = (f0_up > voiced_threshold).astype(jnp.float32)
    noise_amp = uv * noise_std + (1 - uv) * sine_amp / 3
    sines = sines * uv + noise_amp * jax.random.normal(k2, sines.shape)
    merged = jnp.tanh(nn.linear(p["l_linear"], sines))  # [B, T, 1]
    return merged


def _unwrap(p):
    """np.unwrap along axis 1 (kokoroUnwrap)."""
    diff = p[:, 1:] - p[:, :-1]
    period = 2 * np.pi
    mod = (diff + np.pi) % period - np.pi
    mod = jnp.where((mod == -np.pi) & (diff > 0), np.pi, mod)
    correct = jnp.where(jnp.abs(diff) < np.pi, 0.0, mod - diff)
    return jnp.concatenate([p[:, :1], p[:, 1:] + jnp.cumsum(correct, axis=1)], axis=1)


def generator_forward(p, x, s, f0, cfg: ISTFTNetConfig, sample_rate: int, rng,
                      phase_unwrap: bool = True):
    """x [B, T, C], style, f0 [B, T_f0] -> waveform [B, T_samples]
    (KokoroGenerator). KittenTTS reuses this with ``phase_unwrap=False``
    (KittenGenerator uses sin(h) as the phase directly,
    KittenTTSISTFTNet.swift:102-104)."""
    total_up = int(np.prod(cfg.upsample_rates)) * cfg.gen_istft_hop_size
    n_fft, hop = cfg.gen_istft_n_fft, cfg.gen_istft_hop_size
    win = dsp.hanning_window(n_fft, periodic=True)

    f0_up = jnp.repeat(f0[..., None], total_up, axis=1)  # nearest upsample
    har = sine_source(p["m_source"], f0_up, rng, sample_rate, total_up)[..., 0]
    spec = dsp.stft(har[0], win, n_fft, hop, pad_mode="reflect")
    har_spec = jnp.abs(spec)[None]
    har_phase = jnp.arctan2(spec.imag, spec.real)[None]
    har_cat = jnp.concatenate([har_spec, har_phase], axis=-1)  # [1, F, n_fft+2]

    n_kernels = len(cfg.resblock_kernel_sizes)
    h = x
    for i, rate in enumerate(cfg.upsample_rates):
        h = leaky_relu(h, 0.1)
        if i + 1 < len(cfg.upsample_rates):
            stride_f0 = int(np.prod(cfg.upsample_rates[i + 1:]))
            xs_src = nn.conv1d(p["noise_convs"][str(i)], har_cat,
                               stride=stride_f0, padding=(stride_f0 + 1) // 2)
        else:
            xs_src = nn.conv1d(p["noise_convs"][str(i)], har_cat)
        xs_src = adain_res_block_snake(p["noise_res"][str(i)], xs_src, s, 7
                                       if i + 1 < len(cfg.upsample_rates) else 11,
                                       (1, 3, 5))
        k = cfg.upsample_kernel_sizes[i]
        h = nn.conv_transpose1d(p["ups"][str(i)], h, stride=rate,
                                padding=(k - rate) // 2)
        if i == len(cfg.upsample_rates) - 1:
            h = jnp.pad(h, ((0, 0), (1, 0), (0, 0)))
        n = min(h.shape[1], xs_src.shape[1])
        h = h[:, :n] + xs_src[:, :n]
        acc = None
        for j, rk in enumerate(cfg.resblock_kernel_sizes):
            out = adain_res_block_snake(
                p["resblocks"][str(i * n_kernels + j)], h, s, rk,
                cfg.resblock_dilation_sizes[j])
            acc = out if acc is None else acc + out
        h = acc / n_kernels
    h = leaky_relu(h, 0.01)
    h = nn.conv1d(p["conv_post"], h, padding=3)  # [B, F, n_fft+2]
    mag = jnp.exp(h[..., : n_fft // 2 + 1])
    phase = jnp.sin(h[..., n_fft // 2 + 1:])
    if phase_unwrap:
        phase = _unwrap(phase[0].T[None])[0].T  # unwrap along frames
        spec = jax.lax.complex(mag[0] * jnp.cos(phase),
                               mag[0] * jnp.sin(phase))
    else:
        spec = jax.lax.complex(mag[0] * jnp.cos(phase[0]),
                               mag[0] * jnp.sin(phase[0]))
    wav = dsp.istft(spec, win, n_fft, hop)
    return wav[None]


def decoder_forward(p, asr, f0, n, style, cfg: KokoroConfig, rng,
                    phase_unwrap: bool = True):
    """asr [B, T, C], f0/n [B, 2T] -> audio [B, samples] (KokoroDecoder)."""
    f0_down = nn.conv1d(p["F0_conv"], f0[..., None], stride=2, padding=1)
    n_down = nn.conv1d(p["N_conv"], n[..., None], stride=2, padding=1)
    x = jnp.concatenate([asr, f0_down, n_down], axis=-1)
    x = adain_res_block_1d(p["encode"], x, style)
    asr_res = nn.conv1d(p["asr_res"]["0"], asr)
    res = True
    for i in range(4):
        if res:
            x = jnp.concatenate([x, asr_res, f0_down, n_down], axis=-1)
        upsample = i == 3
        x = adain_res_block_1d(p["decode"][str(i)], x, style, upsample=upsample)
        if upsample:
            res = False
    return generator_forward(p["generator"], x, style, f0, cfg.istftnet,
                             cfg.sample_rate, rng, phase_unwrap=phase_unwrap)


# ---------------------------------------------------------------------------
# Sanitize: fold weight-normed convs, normalize list keys
# ---------------------------------------------------------------------------


def sanitize(weights: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out = {}
    flat = dict(weights)
    for k, v in flat.items():
        if k.endswith(".weight_v"):
            g = flat.get(k[:-9] + ".weight_g")
            if g is None:
                continue
            axes = tuple(range(1, v.ndim))
            norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=axes, keepdims=True))
            w = (g.astype(np.float64) * v.astype(np.float64) / (norm + 1e-7)).astype(np.float32)
            if w.ndim == 3:  # MLX [O,K,I] -> torch [O,I,K]
                w = np.transpose(w, (0, 2, 1))
            out[k[:-9] + ".weight"] = w
        elif k.endswith(".weight_g"):
            continue
        else:
            # every 3D .weight in the checkpoint is a conv in MLX [O,K,I]
            if k.endswith(".weight") and v.ndim == 3:
                v = np.transpose(v, (0, 2, 1))
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


class Kokoro:
    def __init__(self, config: KokoroConfig, params, model_dir: str | None = None,
                 text_processor=None, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.model_dir = model_dir
        self.text_processor = text_processor
        self.dtype = dtype
        self.speed = 1.0
        self._voice_cache: dict[str, np.ndarray] = {}

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def default_generation_parameters(self) -> AudioGenerateParameters:
        return AudioGenerateParameters(temperature=0.0, top_p=1.0)

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32) -> "Kokoro":
        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = KokoroConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        # Always front with the multilingual processor (TTSModel.swift:197);
        # English resolves offline from the model dir when it ships Misaki
        # gold lexicons or a cmudict, else lazily from the hub at generate
        # time exactly like the reference's prepare(for:) download.
        from tpu_audio.models.g2p.lexicon import LexiconG2P
        from tpu_audio.models.g2p.misaki import MisakiTextProcessor
        from tpu_audio.models.g2p.multilingual import (
            KokoroMultilingualProcessor,
        )

        english = (MisakiTextProcessor.try_load(model_dir)
                   or LexiconG2P.try_load(model_dir))
        processor = KokoroMultilingualProcessor(english=english)
        return cls(config, params, str(model_dir), processor, dtype)

    def tokenize(self, phonemes: str) -> list[int]:
        # iterate unicode codepoints so combining marks stay separate tokens
        # (KokoroModel.swift:121-133)
        return [self.config.vocab[ch] for ch in phonemes
                if ch in self.config.vocab]

    def load_voice(self, name: str) -> np.ndarray:
        name = self.config.voice_aliases.get(name, name)
        if name in self._voice_cache:
            return self._voice_cache[name]
        if not self.model_dir:
            raise AudioGenerationError(f"voice {name!r}: no model directory")
        path = Path(self.model_dir) / "voices" / f"{name}.safetensors"
        if not path.exists():
            avail = sorted(p.stem for p in
                           (Path(self.model_dir) / "voices").glob("*.safetensors"))
            raise AudioGenerationError(
                f"voice {name!r} not found. Available: {', '.join(avail)}")
        from safetensors.numpy import load_file

        data = load_file(str(path))
        voice = data.get("voice", next(iter(data.values())))
        self._voice_cache[name] = voice
        return voice

    def forward(self, input_ids: np.ndarray, ref_s: np.ndarray,
                speed: float = 1.0, seed: int = 0):
        """[1, T] tokens + [1, 256] style -> (audio [samples], durations)."""
        cfg = self.config
        ids = jnp.asarray(input_ids)
        t = ids.shape[1]
        pad_mask = jnp.zeros((1, t), bool)  # single utterance: no padding
        att = jnp.ones((1, t), jnp.int32)

        bert_out = albert_forward(self.params["bert"], ids, att, cfg.plbert)
        d_en = nn.linear(self.params["bert_encoder"], bert_out)  # [1, T, C]

        ref_s = jnp.asarray(ref_s, jnp.float32)
        global_style = ref_s[:, cfg.style_dim:]
        acoustic_style = ref_s[:, : cfg.style_dim]

        pred = self.params["predictor"]
        d = duration_encoder_forward(pred["text_encoder"], d_en, global_style,
                                     pad_mask, cfg)
        x = bilstm(pred["lstm"], d)
        duration = nn.linear(pred["duration_proj"], x)  # [1, T, max_dur]
        dur = jax.nn.sigmoid(duration).sum(-1) / speed
        dur = jnp.nan_to_num(dur, nan=1.0)
        pred_dur = np.asarray(jnp.clip(jnp.round(dur), 1, 100).astype(jnp.int32))[0]

        # alignment expansion (host side, data dependent)
        indices = np.repeat(np.arange(t), pred_dur)
        frames = len(indices)
        if frames == 0:
            return np.zeros((1,), np.float32), pred_dur
        aln = np.zeros((t, frames), np.float32)
        aln[indices, np.arange(frames)] = 1.0
        aln = jnp.asarray(aln[None])

        en = jnp.einsum("btc,btf->bfc", d, aln)
        f0, n_pred = prosody_predict(pred, en, global_style)

        t_en = text_encoder_forward(self.params["text_encoder"], ids, pad_mask, cfg)
        asr = jnp.einsum("btc,btf->bfc", t_en, aln)

        audio = decoder_forward(self.params["decoder"], asr, f0, n_pred,
                                acoustic_style, cfg, jax.random.PRNGKey(seed))
        return np.asarray(audio[0]).reshape(-1), pred_dur

    def generate(self, text: str, voice: str | None = None, ref_audio=None,
                 ref_text: str | None = None, language: str | None = None,
                 generation_parameters: AudioGenerateParameters | None = None
                 ) -> np.ndarray:
        voice_name = voice or "af_heart"
        if ref_audio is not None:
            voice_emb = np.asarray(ref_audio)
        else:
            voice_emb = self.load_voice(voice_name)
        # voice-prefix language inference + resource prepare
        # (KokoroModel.swift:147-152)
        from tpu_audio.models.g2p.multilingual import (
            KokoroMultilingualProcessor,
            language_for_voice,
        )

        inferred_lang = language or language_for_voice(voice_name)
        if (isinstance(self.text_processor, KokoroMultilingualProcessor)
                and inferred_lang):
            self.text_processor.prepare(inferred_lang)
        phonemes = (self.text_processor.process(text, inferred_lang)
                    if self.text_processor else text)
        tokens = self.tokenize(phonemes)
        if len(tokens) > 510:
            raise AudioGenerationError(
                f"input too long: {len(tokens)} tokens exceeds max 510")
        ids = np.asarray([[0] + tokens + [0]], np.int32)
        ref_idx = min(len(tokens), voice_emb.shape[0] - 1)
        ref_s = voice_emb[ref_idx : ref_idx + 1]
        params = generation_parameters or self.default_generation_parameters()
        audio, _ = self.forward(ids, ref_s, speed=self.speed,
                                seed=params.seed or 0)
        return audio

    def generate_stream(self, text: str, voice: str | None = None,
                        ref_audio=None, ref_text: str | None = None,
                        language: str | None = None,
                        generation_parameters: AudioGenerateParameters | None = None):
        import time as _time

        t0 = _time.perf_counter()
        audio = self.generate(text, voice, ref_audio, ref_text, language,
                              generation_parameters)
        yield AudioGeneration.from_audio(audio)
        yield AudioGeneration.from_info(AudioGenerationInfo(
            generate_time=_time.perf_counter() - t0,
            audio_duration=len(audio) / self.sample_rate))
