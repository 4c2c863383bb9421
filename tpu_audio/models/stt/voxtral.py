"""Voxtral Realtime: streaming causal audio encoder + Mistral decoder.

TPU-first rebuild of the reference
(Sources/MLXAudioSTT/Models/VoxtralRealtime/). The encoder is a causal
sliding-window (750) transformer with interleaved RoPE over a 2x causal
conv stem (VoxtralRealtimeEncoder.swift); 4 consecutive frames are stacked
and projected into the decoder space. The decoder is a Mistral-style LM
(sliding window 8192, tied embeddings) whose *input embedding at every
position is the audio adapter frame plus the previous token's embedding*
(VoxtralRealtime.swift:60-102) — transcription advances in lockstep with
the 12.5 Hz audio stream. Per-layer AdaRMSNorm scales, conditioned on a
sinusoidal embedding of the transcription-delay token count, modulate each
FFN input (VoxtralRealtimeDecoder.swift:24-41).

TPU design: offline decoding runs as one jitted ``lax.while_loop`` over a
preallocated adapter buffer and fixed-capacity KV cache (sliding-window
masking instead of buffer trimming); the encoder runs in fixed 750-frame
chunks carrying the previous block's K/V with absolute-position window
masks. The streaming session reuses the shared ``kv_cache`` as a
block-local growing cache (relative positions, reset at block boundaries)
so each chunk step is a fixed-shape jitted graph, plus an incremental mel
/conv-carry frontend (VoxtralRealtimeStreamSession.swift).
"""

from __future__ import annotations

import base64
import functools
import json
import math
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import dsp, hub, kv_cache, loading, nn
from tpu_audio.core.generation import STTGenerateParameters, STTOutput
from tpu_audio.core.jitting import ajit

__all__ = ["VoxtralRealtime", "VoxtralConfig", "VoxtralStreamSession"]

SAMPLE_RATE = 16000
HOP = 160
SAMPLES_PER_TOKEN = 1280  # sample_rate / 12.5 Hz
FRAMES_PER_TOKEN = SAMPLES_PER_TOKEN // HOP  # 8 mel frames


@dataclass(frozen=True)
class VoxtralEncoderConfig:
    dim: int = 1280
    n_layers: int = 32
    n_heads: int = 32
    head_dim: int = 64
    hidden_dim: int = 5120
    n_kv_heads: int = 32
    norm_eps: float = 1e-5
    rope_theta: float = 1_000_000.0
    sliding_window: int = 750
    downsample_factor: int = 4

    @classmethod
    def from_dict(cls, d: dict) -> "VoxtralEncoderConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass(frozen=True)
class VoxtralDecoderConfig:
    dim: int = 3072
    n_layers: int = 26
    n_heads: int = 32
    n_kv_heads: int = 8
    head_dim: int = 128
    hidden_dim: int = 9216
    vocab_size: int = 131072
    norm_eps: float = 1e-5
    rope_theta: float = 1_000_000.0
    sliding_window: int = 8192
    ada_rms_norm_t_cond: bool = True
    ada_rms_norm_t_cond_dim: int = 32

    @classmethod
    def from_dict(cls, d: dict) -> "VoxtralDecoderConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass
class VoxtralConfig:
    encoder: VoxtralEncoderConfig = field(default_factory=VoxtralEncoderConfig)
    decoder: VoxtralDecoderConfig = field(default_factory=VoxtralDecoderConfig)
    num_mel_bins: int = 128
    global_log_mel_max: float = 1.5
    transcription_delay_ms: int = 480
    bos_token_id: int = 1
    eos_token_id: int = 2
    streaming_pad_token_id: int = 32
    n_left_pad_tokens: int = 32
    quantization: dict | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "VoxtralConfig":
        enc = d.get("encoder_args") or {}
        audio = (d.get("audio_encoding_args")
                 or enc.get("audio_encoding_args") or {})
        return cls(
            encoder=VoxtralEncoderConfig.from_dict(enc),
            decoder=VoxtralDecoderConfig.from_dict(d.get("decoder") or {}),
            num_mel_bins=audio.get("num_mel_bins", 128),
            global_log_mel_max=audio.get("global_log_mel_max", 1.5),
            transcription_delay_ms=d.get("transcription_delay_ms", 480),
            bos_token_id=d.get("bos_token_id", 1),
            eos_token_id=d.get("eos_token_id", 2),
            streaming_pad_token_id=d.get("streaming_pad_token_id", 32),
            n_left_pad_tokens=d.get("n_left_pad_tokens", 32),
            quantization=d.get("quantization"),
        )


def num_audio_tokens(audio_length: int) -> int:
    """12.5 Hz token count for a sample count
    (VoxtralRealtime.swift numAudioTokens)."""
    if audio_length % HOP != 0:
        frames = math.ceil(audio_length / HOP - 1.0)
    else:
        frames = audio_length // HOP
    return math.ceil(frames / FRAMES_PER_TOKEN)


# ---------------------------------------------------------------------------
# Mel frontend (VoxtralRealtimeAudio.swift)
# ---------------------------------------------------------------------------


def _mel_columns(frames, filters, global_log_mel_max: float):
    """[N, 400] windowed frames -> [N, n_mels] normalized log10 mel."""
    win = 400
    window = 0.5 * (1 - jnp.cos(2 * jnp.pi * jnp.arange(win) / win))
    spec = jnp.fft.rfft(frames * window[None, :], axis=-1)
    power = jnp.abs(spec) ** 2
    mel = power @ filters
    logmel = jnp.log10(jnp.maximum(mel, 1e-10))
    logmel = jnp.maximum(logmel, global_log_mel_max - 8.0)
    return (logmel + 4.0) / 4.0


@functools.partial(ajit, static_argnames=("n_mels", "gmax"))
def _voxtral_mel(audio, n_mels: int, gmax: float):
    """Reflect-padded framing, drop last frame -> [T, n_mels]."""
    x = jnp.pad(audio.astype(jnp.float32), 200, mode="reflect")
    n_frames = 1 + (x.shape[0] - 400) // HOP
    idx = jnp.arange(n_frames - 1)[:, None] * HOP + jnp.arange(400)[None, :]
    filters = jnp.asarray(dsp.mel_filters(SAMPLE_RATE, 400, n_mels,
                                          norm="slaney", mel_scale="slaney"))
    return _mel_columns(x[idx], filters, gmax)


# ---------------------------------------------------------------------------
# Encoder (VoxtralRealtimeEncoder.swift)
# ---------------------------------------------------------------------------


def _rope(positions, head_dim: int, theta: float):
    idx = jnp.arange(0, head_dim, 2, dtype=jnp.float32)
    inv = jnp.exp(-math.log(theta) * idx / head_dim)
    ang = positions.astype(jnp.float32)[:, None] * inv[None, :]
    return jnp.cos(ang), jnp.sin(ang)


def conv_stem(params, mel, cfg: VoxtralEncoderConfig):
    """mel [1, T, n_mels] -> conv rows [T', dim]; caller truncates to a
    downsample multiple (convStem, VoxtralRealtimeEncoder.swift:335-347)."""
    p = params["encoder"]
    x = jnp.pad(mel, ((0, 0), (2, 0), (0, 0)))  # causal k3 s1
    x = nn.gelu(nn.conv1d(p["conv_layers_0_conv"]["conv"], x))
    x = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))  # causal k3 s2
    x = nn.gelu(nn.conv1d(p["conv_layers_1_conv"]["conv"], x, stride=2))
    return x[0]


def _encoder_layers(p, x, positions, key_pos, key_valid,
                    cfg: VoxtralEncoderConfig, prev_k=None, prev_v=None):
    """Shared encoder stack over ``x [1, T, dim]`` attending to (optional
    previous-block KV ++ own KV) under a causal sliding-window mask."""
    b, t, d = x.shape
    nh, hd = cfg.n_heads, cfg.head_dim
    cos, sin = _rope(positions, hd, cfg.rope_theta)
    allowed = (key_pos[None, :] <= positions[:, None]) & \
              (key_pos[None, :] >= positions[:, None] - (cfg.sliding_window - 1)) & \
              key_valid[None, :]
    mask = allowed[None, None]
    new_k, new_v = [], []
    for i in range(cfg.n_layers):
        lp = p["transformer_layers"][str(i)]
        h = nn.rms_norm(lp["attention_norm"], x, cfg.norm_eps)
        ap = lp["attention"]
        q = nn.linear(ap["wq"], h).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        k = nn.linear(ap["wk"], h).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        v = nn.linear(ap["wv"], h).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        q = nn.apply_rope(q, cos, sin, interleaved=True)
        k = nn.apply_rope(k, cos, sin, interleaved=True)
        new_k.append(k)
        new_v.append(v)
        if prev_k is not None:
            k = jnp.concatenate([prev_k[i], k], axis=2)
            v = jnp.concatenate([prev_v[i], v], axis=2)
        o = nn.sdpa(q, k, v, mask=mask)
        x = x + nn.linear(ap["wo"], o.transpose(0, 2, 1, 3).reshape(b, t, d))
        h = nn.rms_norm(lp["ffn_norm"], x, cfg.norm_eps)
        x = x + nn.linear(lp["feed_forward_w2"],
                          nn.silu(nn.linear(lp["feed_forward_w1"], h))
                          * nn.linear(lp["feed_forward_w3"], h))
    x = nn.rms_norm(p["transformer_norm"], x, cfg.norm_eps)
    return x, jnp.stack(new_k), jnp.stack(new_v)


def encode_first_chunk(params, x, n_valid, cfg: VoxtralEncoderConfig):
    """First (or only) <=sliding_window block; positions start at 0."""
    p = params["encoder"]
    t = x.shape[1]
    positions = jnp.arange(t)
    key_valid = jnp.arange(t) < n_valid
    return _encoder_layers(p, x, positions, jnp.arange(t), key_valid, cfg)


def encode_next_chunk(params, x, prev_k, prev_v, chunk_idx, n_valid,
                      cfg: VoxtralEncoderConfig):
    """Block ``chunk_idx`` (full sliding_window sized) attending to the
    previous block's KV (encodeChunked, VoxtralRealtimeEncoder.swift:398-427)."""
    p = params["encoder"]
    sw = cfg.sliding_window
    positions = chunk_idx * sw + jnp.arange(x.shape[1])
    key_pos = (chunk_idx - 1) * sw + jnp.arange(sw + x.shape[1])
    key_valid = key_pos < chunk_idx * sw + n_valid
    return _encoder_layers(p, x, positions, key_pos, key_valid, cfg,
                           prev_k=prev_k, prev_v=prev_v)


def downsample_project(params, enc, cfg: VoxtralEncoderConfig):
    """[T, dim] -> [T/ds, decoder_dim] (downsampleAndProject)."""
    p = params["encoder"]
    ds = cfg.downsample_factor
    n = enc.shape[0] // ds
    x = enc[: n * ds].reshape(n, cfg.dim * ds)
    x = nn.gelu(nn.linear(p["audio_language_projection_0"], x))
    return nn.linear(p["audio_language_projection_2"], x)


# ---------------------------------------------------------------------------
# Decoder (VoxtralRealtimeDecoder.swift)
# ---------------------------------------------------------------------------


def time_embedding(t_value: float, dim: int, theta: float = 10000.0):
    half = dim // 2
    inv = np.exp(-math.log(theta) * np.arange(half, dtype=np.float32) / half)
    emb = t_value * inv
    return np.concatenate([np.cos(emb), np.sin(emb)])


def ada_scales(params, delay_tokens: int, cfg: VoxtralDecoderConfig):
    """Per-layer FFN modulation scales [L, dim] from the delay embedding."""
    t_cond = jnp.asarray(time_embedding(float(delay_tokens), cfg.dim))
    scales = []
    for i in range(cfg.n_layers):
        lp = params["decoder"]["layers"][str(i)]
        if "ada_rms_norm_t_cond" in lp:
            ap = lp["ada_rms_norm_t_cond"]
            h = nn.gelu(nn.linear(ap["ada_down"], t_cond[None]))
            scales.append(nn.linear(ap["ada_up"], h)[0])
        else:
            scales.append(jnp.zeros((cfg.dim,)))
    return jnp.stack(scales)


def decoder_pass(params, embeds, cache, ada, cfg: VoxtralDecoderConfig):
    """Decoder layers over ``embeds [1, T, dim]`` with sliding-window
    causal attention into the fixed-capacity cache."""
    p = params["decoder"]
    b, t, d = embeds.shape
    nh, nkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    positions = cache.offset + jnp.arange(t)
    cos, sin = _rope(positions, hd, cfg.rope_theta)
    key_pos = jnp.arange(cache.max_len)
    mask = ((key_pos[None, :] <= positions[:, None])
            & (key_pos[None, :] >= positions[:, None]
               - (cfg.sliding_window - 1)))[None, None]
    x = embeds
    for i in range(cfg.n_layers):
        lp = p["layers"][str(i)]
        h = nn.rms_norm(lp["attention_norm"], x, cfg.norm_eps)
        ap = lp["attention"]
        q = nn.linear(ap["wq"], h).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        k = nn.linear(ap["wk"], h).reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
        v = nn.linear(ap["wv"], h).reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
        q = nn.apply_rope(q, cos, sin, interleaved=True)
        k = nn.apply_rope(k, cos, sin, interleaved=True)
        cache, k_full, v_full = kv_cache.update_cache(cache, i, k, v)
        o = nn.sdpa(q, k_full, v_full, mask=mask)
        x = x + nn.linear(ap["wo"], o.transpose(0, 2, 1, 3).reshape(b, t, d))
        h = nn.rms_norm(lp["ffn_norm"], x, cfg.norm_eps)
        if cfg.ada_rms_norm_t_cond:
            h = h * (1.0 + ada[i].astype(h.dtype))
        x = x + nn.linear(lp["feed_forward_w2"],
                          nn.silu(nn.linear(lp["feed_forward_w1"], h))
                          * nn.linear(lp["feed_forward_w3"], h))
    x = nn.rms_norm(p["norm"], x, cfg.norm_eps)
    cache = cache._replace(offset=cache.offset + t)
    return x, cache


# ---------------------------------------------------------------------------
# Weight sanitization (VoxtralRealtimeModel.sanitize)
# ---------------------------------------------------------------------------

_ENC_PREFIX = "mm_streams_embeddings.embedding_module.whisper_encoder"
_ADAPTER_PREFIX = "mm_streams_embeddings.embedding_module"


def sanitize(weights):
    out = {}
    for k, v in weights.items():
        if k == f"{_ADAPTER_PREFIX}.tok_embeddings.weight":
            out["decoder.tok_embeddings.weight"] = v
        elif k == "norm.weight":
            out["decoder.norm.weight"] = v
        elif k.startswith(f"{_ENC_PREFIX}.conv_layers."):
            rest = k[len(f"{_ENC_PREFIX}.conv_layers."):]
            idx, _, param = rest.split(".", 2)
            # torch [O, I, K] is canonical for our conv1d
            out[f"encoder.conv_layers_{idx}_conv.conv.{param}"] = v
        elif k.startswith(f"{_ENC_PREFIX}.transformer.layers."):
            rest = k[len(f"{_ENC_PREFIX}.transformer.layers."):]
            idx, path = rest.split(".", 1)
            for a, b in (("feed_forward.w1.", "feed_forward_w1."),
                         ("feed_forward.w2.", "feed_forward_w2."),
                         ("feed_forward.w3.", "feed_forward_w3.")):
                path = path.replace(a, b)
            out[f"encoder.transformer_layers.{idx}.{path}"] = v
        elif k.startswith(f"{_ENC_PREFIX}.transformer.norm."):
            out["encoder.transformer_norm."
                + k[len(f"{_ENC_PREFIX}.transformer.norm."):]] = v
        elif k.startswith(f"{_ADAPTER_PREFIX}.audio_language_projection."):
            rest = k[len(f"{_ADAPTER_PREFIX}.audio_language_projection."):]
            idx, param = rest.split(".", 1)
            out[f"encoder.audio_language_projection_{idx}.{param}"] = v
        elif k.startswith("layers."):
            idx, path = k[len("layers."):].split(".", 1)
            for a, b in (("feed_forward.w1.", "feed_forward_w1."),
                         ("feed_forward.w2.", "feed_forward_w2."),
                         ("feed_forward.w3.", "feed_forward_w3."),
                         ("ada_rms_norm_t_cond.0.", "ada_rms_norm_t_cond.ada_down."),
                         ("ada_rms_norm_t_cond.2.", "ada_rms_norm_t_cond.ada_up.")):
                path = path.replace(a, b)
            out[f"decoder.layers.{idx}.{path}"] = v
        else:
            # pre-formatted exports keep our names; fix MLX conv layouts
            if ("conv_layers" in k and k.endswith(".weight") and v.ndim == 3
                    and v.shape[1] == 3 and v.shape[2] != 3):
                v = v.transpose(0, 2, 1)  # MLX [O, K, I] -> torch [O, I, K]
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# Tekken tokenizer (VoxtralRealtimeTokenizer.swift)
# ---------------------------------------------------------------------------


class TekkenTokenizer:
    """Decode-only byte-level tokenizer from ``tekken.json``."""

    def __init__(self, path):
        data = json.loads(open(path, "rb").read())
        self.vocab = [base64.b64decode(e["token_bytes"])
                      for e in data["vocab"]]
        self.n_special = (data.get("config") or {}).get(
            "default_num_special_tokens", 1000)
        self.special_ids = {t["rank"] for t in data.get("special_tokens", [])
                            if t.get("rank") is not None}

    def decode(self, ids) -> str:
        out = b""
        for tid in ids:
            if tid < self.n_special or tid in self.special_ids:
                continue
            vid = tid - self.n_special
            if 0 <= vid < len(self.vocab):
                out += self.vocab[vid]
        return out.decode("utf-8", errors="ignore")


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

_ADAPTER_BUCKET = 128


class VoxtralRealtime:
    def __init__(self, config: VoxtralConfig, params, tokenizer=None,
                 dtype=jnp.bfloat16):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.dtype = dtype
        self._conv_stem = ajit(
            functools.partial(conv_stem, cfg=config.encoder))
        self._encode_first = ajit(
            functools.partial(encode_first_chunk, cfg=config.encoder))
        self._encode_next = ajit(
            functools.partial(encode_next_chunk, cfg=config.encoder))
        self._project = ajit(
            functools.partial(downsample_project, cfg=config.encoder))
        self._prefill = ajit(
            functools.partial(decoder_pass, cfg=config.decoder),
            donate_argnums=(2,))
        self._decode = ajit(self._decode_fn, donate_argnums=(2,))
        self._ada_cache = {}

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.bfloat16):
        from pathlib import Path

        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = VoxtralConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        if config.quantization:
            from tpu_audio.core import quant

            q = config.quantization
            params = quant.tag_quantized(params, q.get("group_size", 64),
                                         q.get("bits", 4))
        tokenizer = None
        if (model_dir / "tekken.json").exists():
            tokenizer = TekkenTokenizer(model_dir / "tekken.json")
        return cls(config, params, tokenizer, dtype)

    # -- audio path ----------------------------------------------------------

    def _ada(self, delay_tokens: int):
        if delay_tokens not in self._ada_cache:
            self._ada_cache[delay_tokens] = ada_scales(
                self.params, delay_tokens, self.config.decoder)
        return self._ada_cache[delay_tokens]

    def prepare_mel(self, audio: np.ndarray, delay_ms: int | None):
        """Pad for streaming alignment and compute mel (prepareMel)."""
        delay = delay_ms or self.config.transcription_delay_ms
        n_delay = num_audio_tokens(
            int(delay / 1000.0 * SAMPLE_RATE))
        n_left = self.config.n_left_pad_tokens
        n_right = (n_delay + 1) + 10
        align = (-len(audio)) % SAMPLES_PER_TOKEN
        padded = np.pad(audio, (n_left * SAMPLES_PER_TOKEN,
                                align + n_right * SAMPLES_PER_TOKEN))
        mel = np.asarray(_voxtral_mel(jnp.asarray(padded),
                                      n_mels=self.config.num_mel_bins,
                                      gmax=self.config.global_log_mel_max))
        if mel.shape[0] % 2:
            mel = mel[1:]
        return mel, n_delay

    def encode_audio(self, mel: np.ndarray):
        """mel [T, n_mels] -> (adapter [n_tokens, dec_dim], n_audio_total)."""
        ecfg = self.config.encoder
        conv = np.asarray(self._conv_stem(
            self.params, jnp.asarray(mel[None], self.dtype)))
        trunc = conv.shape[0] % ecfg.downsample_factor
        conv = conv[trunc:]
        n_total = conv.shape[0] // ecfg.downsample_factor
        sw = ecfg.sliding_window
        t = conv.shape[0]
        pieces = []
        prev_k = prev_v = None
        for c, start in enumerate(range(0, t, sw)):
            end = min(start + sw, t)
            block = np.zeros((sw if t > sw else
                              _bucket(end - start, 64), ecfg.dim), conv.dtype)
            block[: end - start] = conv[start:end]
            xb = jnp.asarray(block[None], self.dtype)
            if c == 0:
                out, prev_k, prev_v = self._encode_first(
                    self.params, xb, jnp.int32(end - start))
            else:
                out, prev_k, prev_v = self._encode_next(
                    self.params, xb, prev_k, prev_v, jnp.int32(c),
                    jnp.int32(end - start))
            pieces.append(np.asarray(out.astype(jnp.float32))[0, : end - start])
        enc = np.concatenate(pieces, axis=0)
        adapter = np.asarray(self._project(
            self.params, jnp.asarray(enc, self.dtype)).astype(jnp.float32))
        return adapter, n_total

    # -- decoding --------------------------------------------------------------

    def _decode_fn(self, params, first_logits, cache, adapter, ada,
                   start_pos, n_total, max_tokens, buf):
        """Greedy lockstep decode: position p consumes adapter[p] + the
        previous token embedding (generate, VoxtralRealtime.swift:60-102)."""
        cfg = self.config.decoder
        eos = jnp.int32(self.config.eos_token_id)
        emb_table = params["decoder"]["tok_embeddings"]["weight"]

        def cond(state):
            pos, count, tok, _cache, _buf = state
            return (pos < n_total) & (tok != eos) & (count < max_tokens)

        def body(state):
            pos, count, tok, cache, buf = state
            buf = buf.at[count].set(tok)
            embed = (jnp.take(adapter, pos, axis=0)
                     + emb_table[tok].astype(adapter.dtype))
            x, cache = decoder_pass(params, embed[None, None], cache, ada, cfg)
            logits = nn.embedding_as_linear(
                params["decoder"]["tok_embeddings"], x)[0, -1]
            return pos + 1, count + 1, jnp.argmax(logits).astype(jnp.int32), \
                cache, buf

        tok0 = jnp.argmax(first_logits).astype(jnp.int32)
        state = (jnp.int32(start_pos), jnp.int32(0), tok0, cache, buf)
        _, count, last, cache, buf = jax.lax.while_loop(cond, body, state)
        # the final sampled token (eos or not) was never written to buf
        buf = buf.at[count].set(last)
        return buf, count + 1

    def generate(self, audio, generation_parameters=None) -> STTOutput:
        params = generation_parameters or STTGenerateParameters(max_tokens=4096)
        if self.tokenizer is None:
            raise RuntimeError("tokenizer (tekken.json) not loaded")
        t0 = time.perf_counter()
        audio = np.asarray(audio, np.float32)
        if audio.ndim > 1:
            audio = audio.mean(axis=-1)
        mel, n_delay = self.prepare_mel(audio, None)
        adapter, n_total = self.encode_audio(mel)
        prompt_len = 1 + self.config.n_left_pad_tokens + n_delay
        ada = self._ada(n_delay)

        prompt_ids = np.array(
            [self.config.bos_token_id]
            + [self.config.streaming_pad_token_id] * (prompt_len - 1), np.int32)
        emb = np.asarray(nn.embedding(
            self.params["decoder"]["tok_embeddings"], jnp.asarray(prompt_ids)))
        prefix = adapter[:prompt_len] + emb

        cap = _bucket(n_total + 1, 256)
        cache = kv_cache.init_cache(
            self.config.decoder.n_layers, 1, self.config.decoder.n_kv_heads,
            self.config.decoder.head_dim, cap, self.dtype)
        h, cache = self._prefill(self.params, jnp.asarray(prefix[None], self.dtype),
                                 cache, ada)
        logits = np.asarray(nn.embedding_as_linear(
            self.params["decoder"]["tok_embeddings"],
            h[:, -1].astype(jnp.float32)))[0]

        pad_adapter = np.zeros((cap, adapter.shape[1]), np.float32)
        pad_adapter[: adapter.shape[0]] = adapter
        buf = jnp.zeros((cap,), jnp.int32)
        tokens, count = self._decode(
            self.params, jnp.asarray(logits), cache,
            jnp.asarray(pad_adapter, self.dtype), ada,
            jnp.int32(prompt_len), jnp.int32(n_total),
            jnp.int32(params.max_tokens), buf)
        ids = np.asarray(tokens)[: int(count)].tolist()
        ids = [t for t in ids if t != self.config.eos_token_id]
        text = self.tokenizer.decode(ids).strip()
        elapsed = time.perf_counter() - t0
        return STTOutput(text=text, language=params.language,
                         prompt_token_count=prompt_len,
                         generation_token_count=len(ids),
                         total_time=elapsed, generation_time=elapsed)

    def generate_stream(self, audio, generation_parameters=None):
        """Chunk-fed session streaming (transcribeStreaming)."""
        params = generation_parameters or STTGenerateParameters(max_tokens=4096)
        audio = np.asarray(audio, np.float32)
        if audio.ndim > 1:
            audio = audio.mean(axis=-1)
        session = VoxtralStreamSession(self, max_tokens=params.max_tokens)
        t0 = time.perf_counter()
        chunk = int(0.48 * SAMPLE_RATE)
        for s in range(0, max(len(audio), 1), chunk):
            delta = session.step(audio[s : s + chunk])
            if delta:
                yield {"type": "token", "text": delta}
        delta = session.finish()
        if delta:
            yield {"type": "token", "text": delta}
        elapsed = time.perf_counter() - t0
        yield {"type": "result", "output": STTOutput(
            text=session.text.strip(), language=params.language,
            generation_token_count=len(session.tokens),
            total_time=elapsed, generation_time=elapsed)}

    def make_stream_session(self, **kwargs) -> "VoxtralStreamSession":
        return VoxtralStreamSession(self, **kwargs)


def _bucket(n: int, step: int) -> int:
    return step * max(1, math.ceil(n / step))


# ---------------------------------------------------------------------------
# Streaming session (VoxtralRealtimeStreamSession.swift)
# ---------------------------------------------------------------------------


class VoxtralStreamSession:
    """Incremental transcription: feed samples, receive text deltas.

    Mel frames are produced incrementally from a zero-seeded carry (exact
    vs offline because the left pad exceeds the reflect span), the conv
    stem carries its causal suffixes, the encoder runs block-local with a
    fixed-capacity shared KV cache reset every sliding_window frames, and
    the decoder advances one audio position per emitted token behind a
    1-token guard on unflushed audio.
    """

    FROZEN_GUARD = 1

    def __init__(self, model: VoxtralRealtime, temperature: float = 0.0,
                 max_tokens: int = 4096, transcription_delay_ms: int | None = None,
                 max_total_tokens: int = 8192):
        self.m = model
        self.max_tokens = max_tokens
        cfg = model.config
        delay = transcription_delay_ms or cfg.transcription_delay_ms
        self.n_delay = num_audio_tokens(int(delay / 1000.0 * SAMPLE_RATE))
        self.prompt_len = 1 + cfg.n_left_pad_tokens + self.n_delay
        self.ada = model._ada(self.n_delay)
        # mel carry: window/2 reflect zeros + left-pad zeros
        self.carry = np.zeros(200 + cfg.n_left_pad_tokens * SAMPLES_PER_TOKEN,
                              np.float32)
        self.real_fed = 0
        self.flushed = False
        self.done = False
        self.mel_tail = np.zeros((0, cfg.num_mel_bins), np.float32)
        self.conv1_carry = np.zeros((2, cfg.num_mel_bins), np.float32)
        self.conv2_carry = np.zeros((1, cfg.encoder.dim), np.float32)
        self.conv_rows = np.zeros((0, cfg.encoder.dim), np.float32)
        self.enc_cache = self._fresh_enc_cache()
        self.enc_consumed = 0
        self.block_base = 0
        self.adapter = np.zeros((0, cfg.decoder.dim), np.float32)
        self.dec_cache = None
        self.last_logits = None
        self.dec_pos = 0
        self.prefilled = False
        self.tokens: list[int] = []
        self.text = ""
        self.max_total = max_total_tokens
        self._mel_filters = jnp.asarray(dsp.mel_filters(
            SAMPLE_RATE, 400, cfg.num_mel_bins, norm="slaney",
            mel_scale="slaney"))

    def _fresh_enc_cache(self):
        e = self.m.config.encoder
        return kv_cache.init_cache(e.n_layers, 1, e.n_heads, e.head_dim,
                                   e.sliding_window, self.m.dtype)

    # incremental pieces -----------------------------------------------------

    def _append_mel(self, samples: np.ndarray) -> np.ndarray:
        self.carry = np.concatenate([self.carry, samples])
        if len(self.carry) < 400:
            return np.zeros((0, self.m.config.num_mel_bins), np.float32)
        n = 1 + (len(self.carry) - 400) // HOP
        idx = np.arange(n)[:, None] * HOP + np.arange(400)[None, :]
        frames = jnp.asarray(self.carry[idx])
        self.carry = self.carry[n * HOP:]
        return np.asarray(_mel_columns(frames, self._mel_filters,
                                       self.m.config.global_log_mel_max))

    def _conv_step(self, mel: np.ndarray) -> np.ndarray:
        """Causal conv stem over new mel rows using carried suffixes."""
        if not mel.shape[0]:
            return np.zeros((0, self.m.config.encoder.dim), np.float32)
        p = self.m.params
        x = np.concatenate([self.conv1_carry, mel])  # [2+T, mels]
        self.conv1_carry = x[-2:]
        h = np.asarray(nn.gelu(nn.conv1d(
            p["encoder"]["conv_layers_0_conv"]["conv"],
            jnp.asarray(x[None], self.m.dtype))).astype(jnp.float32))[0]
        x2 = np.concatenate([self.conv2_carry, h])
        new_rows = (x2.shape[0] - 3) // 2 + 1 if x2.shape[0] >= 3 else 0
        self.conv2_carry = x2[new_rows * 2:]
        if new_rows <= 0:
            return np.zeros((0, self.m.config.encoder.dim), np.float32)
        out = np.asarray(nn.gelu(nn.conv1d(
            p["encoder"]["conv_layers_1_conv"]["conv"],
            jnp.asarray(x2[None], self.m.dtype), stride=2)).astype(jnp.float32))[0]
        return out[:new_rows]

    def _feed_encoder(self, up_to: int):
        """Advance the block-local encoder to conv row ``up_to``; extend the
        adapter buffer (feedIncremental)."""
        e = self.m.config.encoder
        sw = e.sliding_window
        pieces = []
        while self.enc_consumed < up_to:
            block_end = self.block_base + sw
            end = min(up_to, block_end)
            x = jnp.asarray(
                self.conv_rows[self.enc_consumed : end][None], self.m.dtype)
            out, self.enc_cache = _enc_stream_step(
                self.m.params, x, self.enc_cache, e)
            pieces.append(np.asarray(out.astype(jnp.float32))[0])
            self.enc_consumed = end
            if end == block_end:
                self.enc_cache = self._fresh_enc_cache()
                self.block_base = block_end
        if pieces:
            enc = np.concatenate(pieces, axis=0)
            rows = np.asarray(self.m._project(
                self.m.params, jnp.asarray(enc, self.m.dtype)
            ).astype(jnp.float32))
            self.adapter = np.concatenate([self.adapter, rows], axis=0)

    # public API ---------------------------------------------------------------

    def step(self, samples) -> str:
        return self._advance(np.asarray(samples, np.float32).reshape(-1),
                             final=False)

    def finish(self) -> str:
        return self._advance(np.zeros(0, np.float32), final=True)

    def _advance(self, samples: np.ndarray, final: bool) -> str:
        if self.done or (self.flushed and not final):
            return ""
        cfg = self.m.config
        ds = cfg.encoder.downsample_factor
        self.real_fed += len(samples)
        if final and not self.flushed:
            align = (-self.real_fed) % SAMPLES_PER_TOKEN
            right = ((self.n_delay + 1) + 10) * SAMPLES_PER_TOKEN
            tail = 400 - HOP - 200  # offline right-reflect samples kept
            samples = np.concatenate(
                [samples, np.zeros(align + right + tail, np.float32)])
            self.flushed = True
        mel = self._append_mel(samples)
        # parity with offline odd-frame drop: offline drops the FIRST frame
        # when total is odd; streaming total is always even by construction
        rows = self._conv_step(mel)
        if rows.shape[0]:
            self.conv_rows = np.concatenate([self.conv_rows, rows])
        real_region = cfg.n_left_pad_tokens + num_audio_tokens(self.real_fed)
        emit_limit = (self.conv_rows.shape[0] // ds if final
                      else max(0, real_region - self.FROZEN_GUARD))
        conv_freeze = min(self.conv_rows.shape[0] // ds, emit_limit) * ds
        if conv_freeze > self.enc_consumed:
            self._feed_encoder(conv_freeze)
        if not self.adapter.shape[0]:
            return ""
        self._prefill_if_needed()
        return self._decode(min(emit_limit, self.adapter.shape[0]))

    def _prefill_if_needed(self):
        if self.prefilled or self.adapter.shape[0] < self.prompt_len:
            return
        cfg = self.m.config
        ids = np.array([cfg.bos_token_id] + [cfg.streaming_pad_token_id]
                       * (self.prompt_len - 1), np.int32)
        emb = np.asarray(nn.embedding(
            self.m.params["decoder"]["tok_embeddings"], jnp.asarray(ids)))
        prefix = self.adapter[: self.prompt_len] + emb
        cache = kv_cache.init_cache(
            cfg.decoder.n_layers, 1, cfg.decoder.n_kv_heads,
            cfg.decoder.head_dim, self.max_total, self.m.dtype)
        h, self.dec_cache = self.m._prefill(
            self.m.params, jnp.asarray(prefix[None], self.m.dtype), cache,
            self.ada)
        self.last_logits = np.asarray(nn.embedding_as_linear(
            self.m.params["decoder"]["tok_embeddings"],
            h[:, -1].astype(jnp.float32)))[0]
        self.dec_pos = self.prompt_len
        self.prefilled = True

    def _decode(self, emit_limit: int) -> str:
        if not self.prefilled:
            return ""
        cfg = self.m.config
        new = False
        while self.dec_pos < min(emit_limit, self.max_total - 1):
            tok = int(np.argmax(self.last_logits))
            self.tokens.append(tok)
            if tok == cfg.eos_token_id or len(self.tokens) > self.max_tokens:
                self.done = True
                if self.tokens and self.tokens[-1] == cfg.eos_token_id:
                    self.tokens.pop()
                break
            new = True
            embed = (self.adapter[self.dec_pos]
                     + np.asarray(nn.embedding(
                         self.m.params["decoder"]["tok_embeddings"],
                         jnp.asarray([tok]))) [0])
            h, self.dec_cache = _dec_stream_step(
                self.m.params, jnp.asarray(embed[None, None], self.m.dtype),
                self.dec_cache, self.ada, cfg.decoder)
            self.last_logits = np.asarray(nn.embedding_as_linear(
                self.m.params["decoder"]["tok_embeddings"],
                h[:, -1].astype(jnp.float32)))[0]
            self.dec_pos += 1
        if not new and not self.done:
            return ""
        full = self.m.tokenizer.decode(self.tokens) if self.m.tokenizer else ""
        delta = full[len(self.text):] if full.startswith(self.text) else full
        self.text = full
        return delta


@functools.partial(ajit, static_argnames=("cfg",))
def _enc_stream_step(params, x, cache, cfg: VoxtralEncoderConfig):
    """Block-local encoder chunk: rope positions relative to the block start,
    growing KV inside the shared fixed-capacity cache."""
    p = params["encoder"]
    b, t, d = x.shape
    nh, hd = cfg.n_heads, cfg.head_dim
    positions = cache.offset + jnp.arange(t)
    cos, sin = _rope(positions, hd, cfg.rope_theta)
    mask = kv_cache.attention_mask(cache, t)
    for i in range(cfg.n_layers):
        lp = p["transformer_layers"][str(i)]
        h = nn.rms_norm(lp["attention_norm"], x, cfg.norm_eps)
        ap = lp["attention"]
        q = nn.linear(ap["wq"], h).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        k = nn.linear(ap["wk"], h).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        v = nn.linear(ap["wv"], h).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        q = nn.apply_rope(q, cos, sin, interleaved=True)
        k = nn.apply_rope(k, cos, sin, interleaved=True)
        cache, k_full, v_full = kv_cache.update_cache(cache, i, k, v)
        o = nn.sdpa(q, k_full, v_full, mask=mask)
        x = x + nn.linear(ap["wo"], o.transpose(0, 2, 1, 3).reshape(b, t, d))
        h = nn.rms_norm(lp["ffn_norm"], x, cfg.norm_eps)
        x = x + nn.linear(lp["feed_forward_w2"],
                          nn.silu(nn.linear(lp["feed_forward_w1"], h))
                          * nn.linear(lp["feed_forward_w3"], h))
    cache = cache._replace(offset=cache.offset + t)
    return nn.rms_norm(p["transformer_norm"], x, cfg.norm_eps), cache


@functools.partial(ajit, static_argnames=("cfg",), donate_argnums=(2,))
def _dec_stream_step(params, embed, cache, ada, cfg: VoxtralDecoderConfig):
    return decoder_pass(params, embed, cache, ada, cfg)
