"""Nemotron ASR: cache-aware streaming FastConformer-RNNT.

TPU-first rebuild of the reference
(Sources/MLXAudioSTT/Models/NemotronASR/*): a CAUSAL dw-striding
subsampler (every conv pads (2,1) in both time and freq,
NemotronASRConformer.swift:97-197), conformer blocks with silu FFNs,
LayerNorm-normalized causal conv modules, NeMo relative-position
attention under a chunked-limited mask (left/right context in
subsampled frames), an optional language "prompt kernel" (one-hot
concat + MLP over encoder frames), and the shared NeMo RNNT
prediction/joint networks decoded greedily (reused from `parakeet`).

Streaming (NemotronASRStreaming.swift): the encoder runs chunk-by-chunk
with per-layer caches — attention K/V input cache of the last
`left_context` frames, causal-conv input cache of `kernel-1` frames,
and a 16-frame mel cache ahead of the subsampler — producing frames
bit-identical to the offline encode at the native chunk size
(right_context+1 subsampled frames). Caches here are FIXED-SIZE,
right-aligned buffers with a validity counter, so every post-warmup
chunk step is one static-shape jitted call.
"""

from __future__ import annotations

import functools
import math
import time
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import dsp, hub, loading, nn
from tpu_audio.core.audio_io import resample_audio
from tpu_audio.core.generation import (
    STTGenerateParameters,
    STTOutput,
    STTSegment,
)
from tpu_audio.models.stt import parakeet
from tpu_audio.core.jitting import ajit

__all__ = ["NemotronASR", "NemotronConfig", "NemotronStreamSession"]

MEL_CACHE = 16  # >= causal receptive field of the 8x subsampler


@dataclass
class NemotronPreprocess:
    sample_rate: int = 16000
    features: int = 128
    n_fft: int = 512
    window_size: float = 0.025
    window_stride: float = 0.01
    window: str = "hann"
    preemph: float = 0.97
    log_zero_guard_value: float = 2.0 ** -24
    normalize: str = "per_feature"


@dataclass
class NemotronEncoderConfig:
    feat_in: int = 128
    n_layers: int = 24
    d_model: int = 1024
    n_heads: int = 8
    ff_expansion_factor: int = 4
    subsampling_factor: int = 8
    subsampling_conv_channels: int = 256
    conv_kernel_size: int = 9
    use_bias: bool = True
    xscaling: bool = False
    att_context_style: str = "chunked_limited"
    att_context_size: tuple = ((56, 13),)


@dataclass
class NemotronConfig:
    preprocess: NemotronPreprocess = field(default_factory=NemotronPreprocess)
    encoder: NemotronEncoderConfig = field(
        default_factory=NemotronEncoderConfig)
    vocabulary: list = field(default_factory=list)
    pred_hidden: int = 640
    pred_rnn_layers: int = 2
    joint_hidden: int = 640
    joint_activation: str = "relu"
    num_prompts: int = 0
    prompt_hidden: int = 2048
    prompt_dictionary: dict = field(default_factory=dict)
    default_language: str = "en"
    max_symbols: int | None = 10

    @classmethod
    def from_dict(cls, d: dict) -> "NemotronConfig":
        pk = set(NemotronPreprocess.__dataclass_fields__)
        ek = set(NemotronEncoderConfig.__dataclass_fields__)
        pre = NemotronPreprocess(**{k: v for k, v in
                                    d.get("preprocessor", {}).items()
                                    if k in pk})
        enc_d = {k: v for k, v in d.get("encoder", {}).items() if k in ek}
        if "att_context_size" in enc_d:
            acs = enc_d["att_context_size"]
            if acs and isinstance(acs[0], (list, tuple)):
                enc_d["att_context_size"] = tuple(tuple(a) for a in acs)
            else:
                enc_d["att_context_size"] = (tuple(acs),)
        enc = NemotronEncoderConfig(**enc_d)
        dec = d.get("decoder", {})
        joint = d.get("joint", {})
        prompt = d.get("prompt", {})
        return cls(
            preprocess=pre, encoder=enc,
            vocabulary=(d.get("vocabulary") or joint.get("vocabulary")
                        or dec.get("vocabulary") or []),
            pred_hidden=dec.get("pred_hidden", 640),
            pred_rnn_layers=dec.get("pred_rnn_layers", 2),
            joint_hidden=joint.get("joint_hidden", 640),
            joint_activation=joint.get("activation", "relu"),
            num_prompts=prompt.get("num_prompts", 0),
            prompt_hidden=prompt.get("prompt_hidden", 2048),
            prompt_dictionary=prompt.get("prompt_dictionary", {}),
            default_language=d.get("default_language", "en"),
            max_symbols=d.get("max_symbols", 10))

    def parakeet_cfg(self) -> parakeet.ParakeetConfig:
        """Decode-side config for the shared NeMo RNNT loop."""
        cfg = parakeet.ParakeetConfig(variant="rnnt")
        cfg.vocabulary = list(self.vocabulary)
        cfg.durations = []
        cfg.max_symbols = self.max_symbols
        cfg.pred_hidden = self.pred_hidden
        cfg.pred_rnn_layers = self.pred_rnn_layers
        cfg.joint_activation = self.joint_activation
        return cfg


# -- frontend ----------------------------------------------------------------------


def log_mel(audio, cfg: NemotronPreprocess):
    """NemotronASRAudio.logMelSpectrogram: signal-level preemphasis,
    center constant-pad stft, slaney mel, log(x + guard), per-feature
    normalize with unbiased std. Returns [T, features]."""
    x = jnp.asarray(audio, jnp.float32)
    if cfg.preemph > 0 and x.shape[0] > 1:
        x = jnp.concatenate([x[:1], x[1:] - cfg.preemph * x[:-1]])
    win_len = int(cfg.window_size * cfg.sample_rate)
    hop = int(cfg.window_stride * cfg.sample_rate)
    window = dsp.hanning_window(win_len, periodic=False)
    if win_len < cfg.n_fft:
        window = jnp.concatenate(
            [window, jnp.zeros(cfg.n_fft - win_len, jnp.float32)])
    freqs = dsp.stft(x, window, cfg.n_fft, hop, pad_mode="constant")
    power = jnp.abs(freqs) ** 2
    filters = jnp.asarray(dsp.mel_filters(
        cfg.sample_rate, cfg.n_fft, cfg.features, norm="slaney",
        mel_scale="slaney"))
    mel = jnp.log(power @ filters + cfg.log_zero_guard_value)
    if cfg.normalize == "per_feature":
        mean = mel.mean(axis=0, keepdims=True)
        var = jnp.sum((mel - mean) ** 2, axis=0, keepdims=True) \
            / max(mel.shape[0] - 1, 1)
        mel = (mel - mean) / (jnp.sqrt(var) + 1e-5)
    return mel


# -- encoder -----------------------------------------------------------------------


def _causal_pad2d(x):
    return jnp.pad(x, ((0, 0), (2, 1), (2, 1), (0, 0)))


def causal_subsample(p, x, cfg: NemotronEncoderConfig):
    """mel [B, T, F] -> [B, T/sf, d_model]
    (NemotronASRConformer.swift:97-197). NHWC with causal (2,1) pads."""
    n_stages = int(math.log2(cfg.subsampling_factor))
    y = x[..., None]  # [B, T, F, 1]
    y = jax.nn.relu(nn.conv2d(p["conv0"], _causal_pad2d(y), stride=2))
    for i in range(n_stages - 1):
        y = _causal_pad2d(y)
        y = nn.conv2d(p["depthwise_layers"][str(i)], y, stride=2,
                      groups=y.shape[-1])
        y = jax.nn.relu(nn.conv2d(p["pointwise_layers"][str(i)], y))
    b, t, f, c = y.shape
    y = y.transpose(0, 1, 3, 2).reshape(b, t, c * f)
    return nn.linear(p["out"], y)


def _rel_pos_table(kv_len: int, d_model: int) -> np.ndarray:
    """[2*kv_len-1, d] interleaved sin/cos of positions kv_len-1 .. -(kv_len-1)
    (NemoAttention.swift:143-191)."""
    pos = np.arange(kv_len - 1, -kv_len, -1, dtype=np.float32)
    ch = np.arange(0, d_model, 2, dtype=np.float32)
    div = np.exp(-ch * (math.log(10000.0) / d_model))
    table = np.zeros((2 * kv_len - 1, d_model), np.float32)
    table[:, 0::2] = np.sin(pos[:, None] * div)
    table[:, 1::2] = np.cos(pos[:, None] * div[: d_model // 2])
    return table


def _nemo_attention(p, q_in, kv_in, pos_emb, n_heads: int, mask=None):
    """Rel-pos MHA with separate query/key-value streams
    (NemoAttention.swift:90-140)."""
    b, tq, d = q_in.shape
    tk = kv_in.shape[1]
    hd = d // n_heads
    scale = hd ** -0.5
    q = nn.linear(p["linear_q"], q_in).reshape(b, tq, n_heads, hd)
    k = nn.linear(p["linear_k"], kv_in).reshape(b, tk, n_heads, hd)
    v = nn.linear(p["linear_v"], kv_in).reshape(b, tk, n_heads, hd)
    pp = nn.linear(p["linear_pos"], pos_emb.astype(q_in.dtype))
    ph = pp.reshape(1, -1, n_heads, hd).transpose(0, 2, 1, 3)
    q_u = (q + p["posBiasU"].astype(q.dtype)).transpose(0, 2, 1, 3)
    q_v = (q + p["posBiasV"].astype(q.dtype)).transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    bd = jnp.einsum("bhqd,bhpd->bhqp", q_v, ph,
                    preferred_element_type=jnp.float32)
    bd = parakeet._rel_shift(bd)[..., :tk] * scale
    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k,
                    preferred_element_type=jnp.float32) * scale
    scores = ac + bd
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(q_in.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return nn.linear(p["linear_out"],
                     o.transpose(0, 2, 1, 3).reshape(b, tq, d))


def _ff(p, x):
    return nn.linear(p["linear2"], jax.nn.silu(nn.linear(p["linear1"], x)))


def _conv_module(p, x, kernel: int, conv_cache=None):
    """GLU -> causal depthwise -> LayerNorm (checkpoint key batch_norm) ->
    silu -> pointwise (NemotronASRConformer.swift:37-95). With
    ``conv_cache`` [B, kernel-1, C] the zero pad is replaced by cached
    frames; returns (out, next_cache)."""
    h = nn.conv1d(p["pointwise_conv1"], x)
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(g)
    if conv_cache is None:
        din = jnp.pad(h, ((0, 0), (kernel - 1, 0), (0, 0)))
        nxt = None
    else:
        din = jnp.concatenate([conv_cache, h], axis=1)
        nxt = din[:, din.shape[1] - (kernel - 1):]
    y = nn.conv1d(p["depthwise_conv"], din, groups=din.shape[-1])
    y = jax.nn.silu(nn.layer_norm(p["batch_norm"], y))
    return nn.conv1d(p["pointwise_conv2"], y), nxt


def _block(p, x, pos_emb, cfg: NemotronEncoderConfig, mask=None, kv=None,
           conv_cache=None):
    """Conformer block (NemotronASRConformer.swift:199-243); with kv /
    conv_cache it runs the cache-aware streaming variant
    (NemotronASRStreaming.swift:32-70)."""
    x = x + 0.5 * _ff(p["feed_forward1"],
                      nn.layer_norm(p["norm_feed_forward1"], x))
    h = nn.layer_norm(p["norm_self_att"], x)
    kv_in = h if kv is None else jnp.concatenate([kv, h], axis=1)
    x = x + _nemo_attention(p["self_attn"], h, kv_in, pos_emb,
                            cfg.n_heads, mask=mask)
    c_out, c_next = _conv_module(p["conv"], nn.layer_norm(p["norm_conv"], x),
                                 cfg.conv_kernel_size, conv_cache)
    x = x + c_out
    x = x + 0.5 * _ff(p["feed_forward2"],
                      nn.layer_norm(p["norm_feed_forward2"], x))
    return nn.layer_norm(p["norm_out"], x), kv_in, c_next


def chunked_limited_mask(seq_len: int, left: int, right: int) -> np.ndarray:
    """Additive [1, 1, T, T] mask (NemotronASRConformer.swift:8-21)."""
    chunk = max(right + 1, 1)
    left_chunks = left // chunk if left >= 0 else 10 ** 6
    ci = np.arange(seq_len) // chunk
    diff = ci[:, None] - ci[None, :]
    visible = (diff >= 0) & (diff <= left_chunks)
    return np.where(visible, 0.0, -1e9).astype(np.float32)[None, None]


def encoder_forward(params, mel, cfg: NemotronEncoderConfig):
    """Offline encode: mel [B, T, F] -> [B, T/sf, d]
    (NemotronASRConformer.swift:245-297)."""
    p = params["encoder"]
    h = causal_subsample(p["pre_encode"], mel, cfg)
    xscale = math.sqrt(cfg.d_model) if cfg.xscaling else 1.0
    h = h * xscale
    t = h.shape[1]
    pos_emb = jnp.asarray(_rel_pos_table(t, cfg.d_model))[None]
    left, right = cfg.att_context_size[0]
    mask = None
    if cfg.att_context_style == "chunked_limited":
        mask = jnp.asarray(chunked_limited_mask(t, left, right))
    for i in range(cfg.n_layers):
        h, _, _ = _block(p["layers"][str(i)], h, pos_emb, cfg, mask=mask)
    return h


def apply_prompt(params, encoded, cfg: NemotronConfig, prompt_index: int):
    """One-hot language conditioning MLP (NemotronASRModel.swift:263-283)."""
    if cfg.num_prompts == 0 or "prompt_kernel" not in params:
        return encoded
    b, t, _ = encoded.shape
    one_hot = jax.nn.one_hot(jnp.full((b, t), prompt_index, jnp.int32),
                             cfg.num_prompts, dtype=encoded.dtype)
    h = jnp.concatenate([encoded, one_hot], axis=-1)
    pk = params["prompt_kernel"]
    return nn.linear(pk["linear2"], jax.nn.relu(nn.linear(pk["linear0"], h)))


def sanitize(weights):
    """NemotronASRModel.swift:470-526 + parakeet layout rules (prompt
    kernel renumber, pre_encode conv list renumber, MLX conv layouts)."""
    out = {}
    for k, v in weights.items():
        k = k.replace("prompt_kernel.0.", "prompt_kernel.linear0.")
        k = k.replace("prompt_kernel.2.", "prompt_kernel.linear2.")
        out[k] = v
    return parakeet.sanitize(out)


class NemotronASR:
    def __init__(self, config: NemotronConfig, params, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        self.sample_rate = config.preprocess.sample_rate
        self._encode = ajit(functools.partial(
            encoder_forward, cfg=config.encoder))
        self._pcfg = config.parakeet_cfg()
        self._decoders: dict = {}

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32
                        ) -> "NemotronASR":
        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = NemotronConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        return cls(config, params, dtype)

    @property
    def blank_id(self) -> int:
        return len(self.config.vocabulary)

    def _decoder(self, max_emit: int):
        if max_emit not in self._decoders:
            self._decoders[max_emit] = parakeet.make_tdt_decoder(
                self._pcfg, max_emit)
        return self._decoders[max_emit]

    def _decode_tokens(self, ids) -> str:
        vocab = self.config.vocabulary
        pieces = [vocab[i] for i in ids if 0 <= i < len(vocab)]
        return "".join(pieces).replace("▁", " ").strip()

    def generate(self, audio, generation_parameters:
                 STTGenerateParameters | None = None,
                 sample_rate: int | None = None) -> STTOutput:
        gp = generation_parameters or STTGenerateParameters()
        t0 = time.perf_counter()
        wf = np.asarray(audio, np.float32).reshape(-1)
        src = sample_rate or self.sample_rate
        if src != self.sample_rate:
            wf = resample_audio(wf, src, self.sample_rate)
        mel = log_mel(wf, self.config.preprocess)
        if mel.shape[0] < self.config.encoder.subsampling_factor:
            return STTOutput(text="")
        enc = self._encode(self.params,
                           jnp.asarray(mel, self.dtype)[None])
        idx = self.config.prompt_dictionary.get(
            gp.language or self.config.default_language, 0)
        enc = apply_prompt(self.params, enc, self.config, idx)
        t_frames = enc.shape[1]
        decode = self._decoder(max(16, t_frames * 4))
        toks, _, _, counts = decode(self.params, enc,
                                    jnp.asarray([t_frames], jnp.int32))
        n = int(counts[0])
        ids = np.asarray(toks[0, :n]).tolist()
        text = self._decode_tokens(ids)
        elapsed = time.perf_counter() - t0
        return STTOutput(
            text=text, language=gp.language or self.config.default_language,
            segments=[STTSegment(text=text, start=0.0,
                                 end=len(wf) / self.sample_rate, tokens=ids)],
            generation_token_count=n, generation_time=elapsed,
            total_time=elapsed)

    def generate_stream(self, audio, generation_parameters=None, **kw):
        """Chunked cache-aware streaming over a complete waveform."""
        gp = generation_parameters or STTGenerateParameters()
        session = NemotronStreamSession(self, language=gp.language)
        wf = np.asarray(audio, np.float32).reshape(-1)
        step = self.sample_rate  # 1 s feeds
        for s in range(0, len(wf), step):
            delta = session.feed(wf[s:s + step])
            if delta:
                yield {"type": "token", "text": delta}
        final = session.finish()
        yield {"type": "result", "output": final}


class NemotronStreamSession:
    """Cache-aware incremental transcription
    (NemotronASRStreamSession/NemotronASRStreaming.swift). Fixed-size
    right-aligned attention/conv caches keep every post-warmup chunk a
    static-shape jitted step."""

    def __init__(self, model: NemotronASR, language: str | None = None,
                 chunk_frames: int | None = None):
        self.m = model
        cfg = model.config
        enc = cfg.encoder
        left, right = enc.att_context_size[0]
        self.cf = chunk_frames or max(1, right + 1)
        self.chunk_mel = self.cf * enc.subsampling_factor
        self.left_cache = left
        self.conv_left = enc.conv_kernel_size - 1
        self.prompt_index = cfg.prompt_dictionary.get(
            language or cfg.default_language, 0)
        n_layers = enc.n_layers
        d = enc.d_model
        self.attn_cache = jnp.zeros((n_layers, 1, self.left_cache, d),
                                    model.dtype)
        self.conv_cache = jnp.zeros((n_layers, 1, self.conv_left, d),
                                    model.dtype)
        self.attn_valid = 0
        self.mel_cache = np.zeros((0, enc.feat_in), np.float32)
        self.consumed = 0  # absolute mel frames consumed
        self.emitted = 0  # absolute subsampled frames emitted
        self.audio = np.zeros((0,), np.float32)
        # RNNT carry
        self.last_tok = model.blank_id
        self.h = jnp.zeros((cfg.pred_rnn_layers, 1, cfg.pred_hidden),
                           model.dtype)
        self.c = jnp.zeros_like(self.h)
        self.tokens: list[int] = []
        self._chunk_step = ajit(self._chunk_step_impl,
                                   static_argnums=(6,))
        self._rnnt_chunk = ajit(self._rnnt_chunk_impl,
                                   static_argnums=(5,))

    # -- jitted pieces -------------------------------------------------------------

    def _chunk_step_impl(self, params, mel_win, attn_cache, conv_cache,
                         attn_valid, lo, hi_len):
        """Subsample a [cache|chunk] mel window, run all blocks cache-
        aware, return (frames [1, cf, d], new caches)."""
        cfg = self.m.config.encoder
        sub = causal_subsample(params["encoder"]["pre_encode"], mel_win, cfg)
        xscale = math.sqrt(cfg.d_model) if cfg.xscaling else 1.0
        sub = sub * xscale
        h = jax.lax.dynamic_slice_in_dim(sub, lo, hi_len, axis=1)
        kv_len = self.left_cache + h.shape[1]
        pos_emb = jnp.asarray(_rel_pos_table(kv_len, cfg.d_model))[None]
        # mask invalid (right-aligned) cache slots
        kv_pos = jnp.arange(kv_len)
        valid = kv_pos >= (self.left_cache - attn_valid)
        mask = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)[
            None, None, None, :]
        new_attn, new_conv = [], []
        for i in range(cfg.n_layers):
            p = params["encoder"]["layers"][str(i)]
            h, kv_in, c_next = _block(p, h, pos_emb, cfg, mask=mask,
                                      kv=attn_cache[i],
                                      conv_cache=conv_cache[i])
            new_attn.append(kv_in[:, kv_in.shape[1] - self.left_cache:])
            new_conv.append(c_next)
        frames = apply_prompt(params, h, self.m.config, self.prompt_index)
        return frames, jnp.stack(new_attn), jnp.stack(new_conv)

    def _rnnt_chunk_impl(self, params, frames, last_tok, h, c, n_frames):
        """Greedy RNNT over one chunk with carried LSTM state."""
        pcfg = self.m._pcfg
        blank = self.m.blank_id
        max_emit = n_frames * 4

        def cond(carry):
            t_i = carry[0]
            return t_i < n_frames

        def body(carry):
            t_i, new_sym, last, h, c, toks, count = carry
            frame = frames[0, t_i]
            pred, h_new, c_new = parakeet._predict_step(
                params, last[None], h, c, pcfg)
            logits = parakeet._joint(params, frame[None],
                                     pred.astype(frame.dtype), pcfg)
            tok = jnp.argmax(logits[0, : blank + 1].astype(jnp.float32)
                             ).astype(jnp.int32)
            emit = tok != blank
            jump = jnp.where(emit, 0, 1)
            next_new = jnp.where(emit, new_sym + 1, 0)
            hit = emit & (next_new >= (pcfg.max_symbols or 10))
            jump = jnp.where(hit, 1, jump)
            next_new = jnp.where(hit, 0, next_new)
            h = jnp.where(emit, h_new, h)
            c = jnp.where(emit, c_new, c)
            last = jnp.where(emit, tok, last)
            pos = jnp.clip(count, 0, max_emit - 1)
            toks = toks.at[pos].set(jnp.where(emit, tok, toks[pos]))
            count = count + emit.astype(jnp.int32)
            return t_i + jump, next_new, last, h, c, toks, count

        init = (jnp.int32(0), jnp.int32(0), last_tok,
                h, c, jnp.zeros((max_emit,), jnp.int32), jnp.int32(0))
        _, _, last, h, c, toks, count = jax.lax.while_loop(cond, body, init)
        return toks, count, last, h, c

    # -- public API -----------------------------------------------------------------

    def feed(self, audio_chunk, final: bool = False) -> str:
        """Append audio, process frozen mel frames, return newly decoded
        text."""
        self.audio = np.concatenate(
            [self.audio, np.asarray(audio_chunk, np.float32).reshape(-1)])
        pre = self.m.config.preprocess
        hop = int(pre.window_stride * pre.sample_rate)
        mel = np.asarray(log_mel(self.audio, pre))
        # frozen frames: STFT center window fully covered by real samples
        frozen = max(0, (len(self.audio) - pre.n_fft // 2) // hop + 1)
        limit = mel.shape[0] if final else min(mel.shape[0], frozen)
        new_text = []
        sf = self.m.config.encoder.subsampling_factor
        while self.consumed < limit:
            end = min(self.consumed + self.chunk_mel, limit)
            if not final and end - self.consumed < self.chunk_mel:
                break
            cache_len = self.mel_cache.shape[0]
            win = np.concatenate([self.mel_cache, mel[self.consumed:end]])
            base = (self.consumed - cache_len) // sf
            lo = self.emitted - base
            # subsampled length of the window: out = floor(L/2)+1 per stage
            n_sub = win.shape[0]
            for _ in range(int(math.log2(sf))):
                n_sub = n_sub // 2 + 1
            hi_v = n_sub if (final and end >= limit) else (end // sf - base)
            self.consumed = end
            self.mel_cache = win[max(0, win.shape[0] - MEL_CACHE):]
            if hi_v <= lo:
                self.emitted = base + max(lo, hi_v)
                continue
            n_frames = hi_v - lo
            frames, self.attn_cache, self.conv_cache = self._chunk_step(
                self.m.params, jnp.asarray(win, self.m.dtype)[None],
                self.attn_cache, self.conv_cache,
                jnp.int32(self.attn_valid), jnp.int32(lo), n_frames)
            self.attn_valid = min(self.attn_valid + n_frames,
                                  self.left_cache)
            self.emitted = base + hi_v
            toks, count, last, self.h, self.c = self._rnnt_chunk(
                self.m.params, frames, jnp.int32(self.last_tok),
                self.h, self.c, n_frames)
            self.last_tok = int(last)
            ids = np.asarray(toks[: int(count)]).tolist()
            if ids:
                self.tokens.extend(ids)
                new_text.append(self.m._decode_tokens(ids))
        return "".join(new_text)

    def finish(self) -> STTOutput:
        self.feed(np.zeros(0, np.float32), final=True)
        text = self.m._decode_tokens(self.tokens)
        return STTOutput(
            text=text,
            segments=[STTSegment(text=text, start=0.0,
                                 end=len(self.audio) / self.m.sample_rate,
                                 tokens=list(self.tokens))],
            generation_token_count=len(self.tokens))
