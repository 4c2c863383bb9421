"""Sortformer: 4-speaker streaming diarization.

TPU-first rebuild of the reference
(Sources/MLXAudioVAD/Models/Sortformer/*.swift): FastConformer encoder
(8x conv subsampling + Transformer-XL rel-pos attention), BART-style
transformer encoder with learned positions, per-frame speaker sigmoids;
offline ``generate`` with silence trim + peak normalize; streaming
spkcache/FIFO state machine with AOSC speaker-cache compression
(Sortformer.swift:1088-1282).

TPU design: the encoder stack runs jitted over length-bucketed padded
sequences (padding masked via lengths) so streaming steps reuse compiled
graphs; the AOSC compression logic operates on small host-side NumPy arrays
([1, ~400, 192]) where data-dependent top-k selection is cheap and would
only cause recompiles on device.
"""

from __future__ import annotations

import functools
import math
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import dsp, hub, loading, nn
from tpu_audio.core.jitting import ajit

__all__ = ["Sortformer", "SortformerConfig", "DiarizationSegment",
           "segments_to_rttm"]

LOG_GUARD = 2.0**-24


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------


@dataclass
class FCEncoderConfig:
    hidden_size: int = 512
    num_hidden_layers: int = 18
    num_attention_heads: int = 8
    intermediate_size: int = 2048
    num_mel_bins: int = 80
    conv_kernel_size: int = 9
    subsampling_factor: int = 8
    subsampling_conv_channels: int = 256
    subsampling_conv_kernel_size: int = 3
    subsampling_conv_stride: int = 2
    attention_bias: bool = True
    scale_input: bool = True


@dataclass
class TFEncoderConfig:
    d_model: int = 192
    encoder_layers: int = 18
    encoder_attention_heads: int = 8
    encoder_ffn_dim: int = 768
    layer_norm_eps: float = 1e-5
    max_source_positions: int = 1500
    k_proj_bias: bool = False


@dataclass
class ModulesConfig:
    num_speakers: int = 4
    fc_d_model: int = 512
    tf_d_model: int = 192
    subsampling_factor: int = 8
    chunk_len: int = 188
    fifo_len: int = 188
    spkcache_len: int = 188
    spkcache_update_period: int = 144
    chunk_left_context: int = 1
    chunk_right_context: int = 1
    spkcache_sil_frames_per_spk: int = 3
    pred_score_threshold: float = 0.25
    max_index: int = 99999
    scores_boost_latest: float = 0.0
    sil_threshold: float = 0.2
    strong_boost_rate: float = 0.75
    weak_boost_rate: float = 1.5
    min_pos_scores_rate: float = 0.5
    use_aosc: bool = True


@dataclass
class ProcessorConfig:
    sampling_rate: int = 16000
    n_fft: int = 512
    hop_length: int = 160
    win_length: int = 400
    feature_size: int = 80
    preemphasis: float = 0.97


@dataclass
class SortformerConfig:
    fc_encoder: FCEncoderConfig = field(default_factory=FCEncoderConfig)
    tf_encoder: TFEncoderConfig = field(default_factory=TFEncoderConfig)
    modules: ModulesConfig = field(default_factory=ModulesConfig)
    processor: ProcessorConfig = field(default_factory=ProcessorConfig)

    @classmethod
    def from_dict(cls, d: dict) -> "SortformerConfig":
        def sub(cfg_cls, key):
            src = d.get(key) or {}
            keys = set(cfg_cls.__dataclass_fields__)
            return cfg_cls(**{k: v for k, v in src.items() if k in keys})

        return cls(
            fc_encoder=sub(FCEncoderConfig, "fc_encoder_config"),
            tf_encoder=sub(TFEncoderConfig, "tf_encoder_config"),
            modules=sub(ModulesConfig, "modules_config"),
            processor=sub(ProcessorConfig, "processor_config"),
        )


@dataclass
class DiarizationSegment:
    start: float
    end: float
    speaker: int


def segments_to_rttm(segments: list["DiarizationSegment"],
                     uri: str = "audio") -> str:
    """Format diarization segments as RTTM text (VADOutput.swift:42-51):
    one ``SPEAKER <uri> 1 <start> <dur> <NA> <NA> speaker_<n> <NA> <NA>``
    line per segment."""
    return "\n".join(
        f"SPEAKER {uri} 1 {seg.start:.3f} {seg.end - seg.start:.3f} "
        f"<NA> <NA> speaker_{seg.speaker} <NA> <NA>"
        for seg in segments
    )


# ---------------------------------------------------------------------------
# Features (SortformerFeatures.swift)
# ---------------------------------------------------------------------------


@functools.partial(ajit, static_argnames=("n_fft", "hop", "win", "n_mels",
                                             "preemph", "per_feature", "sr"))
def _mel_impl(wav, sr, n_fft, hop, win, n_mels, preemph, per_feature):
    x = wav.astype(jnp.float32)
    x = jnp.concatenate([x[:1], x[1:] - preemph * x[:-1]])
    window = dsp.hanning_window(win, periodic=False)
    if win < n_fft:
        left = (n_fft - win) // 2
        window = np.pad(window, (left, n_fft - win - left))
    spec = dsp.stft(x, window, n_fft, hop, pad_mode="constant")
    power = jnp.abs(spec) ** 2
    fb = jnp.asarray(dsp.mel_filters(sr, n_fft, n_mels, norm="slaney",
                                     mel_scale="slaney"))
    mel = jnp.log(power @ fb + LOG_GUARD)  # [T, n_mels]
    if per_feature:
        mean = mel.mean(axis=0, keepdims=True)
        denom = max(mel.shape[0] - 1, 1)
        var = ((mel - mean) ** 2).sum(axis=0, keepdims=True) / denom
        mel = (mel - mean) / (jnp.sqrt(var) + 1e-5)
    return mel


def extract_mel_features(wav: np.ndarray, proc: ProcessorConfig,
                         normalize: str | None = "per_feature",
                         pad_to: int = 16) -> np.ndarray:
    """-> [1, T, n_mels] (channels-last; the reference uses [1, mels, T])."""
    mel = np.asarray(_mel_impl(
        jnp.asarray(np.asarray(wav, np.float32)), proc.sampling_rate,
        proc.n_fft, proc.hop_length, proc.win_length, proc.feature_size,
        float(proc.preemphasis), normalize == "per_feature"))
    if pad_to > 0 and mel.shape[0] % pad_to:
        mel = np.pad(mel, ((0, pad_to - mel.shape[0] % pad_to), (0, 0)))
    return mel[None]


# ---------------------------------------------------------------------------
# FastConformer encoder
# ---------------------------------------------------------------------------


def _subsample_lengths(lengths, n_stages=3):
    out = lengths.astype(jnp.float32)
    for _ in range(n_stages):
        out = jnp.floor((out - 1) / 2) + 1
    return out.astype(jnp.int32)


def pre_encode(params, mel, lengths, cfg: FCEncoderConfig):
    """mel [B, T, F] -> (embs [B, T/8, H], lengths)."""
    p = params["fc_encoder"]["subsampling"]
    ch = cfg.subsampling_conv_channels
    y = mel[..., None]  # [B, T, F, 1]
    y = jax.nn.relu(nn.conv2d(p["layers_0"], y, stride=(2, 2), padding=(1, 1)))
    y = nn.conv2d(p["layers_2"], y, stride=(2, 2), padding=(1, 1), groups=ch)
    y = jax.nn.relu(nn.conv2d(p["layers_3"], y))
    y = nn.conv2d(p["layers_5"], y, stride=(2, 2), padding=(1, 1), groups=ch)
    y = jax.nn.relu(nn.conv2d(p["layers_6"], y))
    b, t, f, c = y.shape
    y = y.transpose(0, 1, 3, 2).reshape(b, t, c * f)
    return nn.linear(p["linear"], y), _subsample_lengths(lengths)


def _rel_pos_emb(length: int, d_model: int) -> np.ndarray:
    """Interleaved sin/cos PE over positions L-1..-(L-1) -> [1, 2L-1, D]."""
    positions = np.arange(length - 1, -(length), -1, dtype=np.float64)
    div = np.exp(np.arange(0, d_model, 2) * (-math.log(10000.0) / d_model))
    ang = positions[:, None] * div[None, :]
    pe = np.stack([np.sin(ang), np.cos(ang)], axis=-1).reshape(len(positions), d_model)
    return pe[None].astype(np.float32)


def _fc_attention(p, x, pos_emb, n_heads: int, mask=None):
    b, t, d = x.shape
    hd = d // n_heads
    scale = 1.0 / math.sqrt(hd)
    q = nn.linear(p["q_proj"], x).reshape(b, t, n_heads, hd)
    k = nn.linear(p["k_proj"], x).reshape(b, -1, n_heads, hd).transpose(0, 2, 1, 3)
    v = nn.linear(p["v_proj"], x).reshape(b, -1, n_heads, hd).transpose(0, 2, 1, 3)
    pp = nn.linear(p["relative_k_proj"], pos_emb.astype(x.dtype))
    ph = pp.reshape(1, -1, n_heads, hd).transpose(0, 2, 1, 3)
    q_u = (q + p["bias_u"].astype(x.dtype)).transpose(0, 2, 1, 3)
    q_v = (q + p["bias_v"].astype(x.dtype)).transpose(0, 2, 1, 3)
    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k, preferred_element_type=jnp.float32)
    bd = jnp.einsum("bhqd,bhpd->bhqp", q_v, ph, preferred_element_type=jnp.float32)
    # rel shift
    b_, h_, tq, pl = bd.shape
    bd = jnp.pad(bd, ((0, 0), (0, 0), (0, 0), (1, 0)))
    bd = bd.reshape(b_, h_, pl + 1, tq)[:, :, 1:].reshape(b_, h_, tq, pl)[..., :t]
    scores = (ac + bd) * scale
    if mask is not None:
        scores = jnp.where(mask, -1e4, scores)
    attn = jax.nn.softmax(scores, axis=-1)
    if mask is not None:
        attn = jnp.where(mask, 0.0, attn)
    o = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(x.dtype), v)
    o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
    return nn.linear(p["o_proj"], o)


def _fc_layer(p, x, pos_emb, cfg: FCEncoderConfig, mask=None):
    h = nn.linear(p["feed_forward1"]["linear2"],
                  nn.silu(nn.linear(p["feed_forward1"]["linear1"],
                                    nn.layer_norm(p["norm_feed_forward1"], x))))
    x = x + 0.5 * h
    x = x + _fc_attention(p["self_attn"], nn.layer_norm(p["norm_self_att"], x),
                          pos_emb, cfg.num_attention_heads, mask)
    h = nn.layer_norm(p["norm_conv"], x)
    h = nn.conv1d(p["conv"]["pointwise_conv1"], h)
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(g)
    h = nn.conv1d(p["conv"]["depthwise_conv"], h,
                  padding=(cfg.conv_kernel_size - 1) // 2, groups=h.shape[-1])
    h = nn.batch_norm(p["conv"]["norm"], h)
    h = nn.conv1d(p["conv"]["pointwise_conv2"], nn.silu(h))
    x = x + h
    h = nn.linear(p["feed_forward2"]["linear2"],
                  nn.silu(nn.linear(p["feed_forward2"]["linear1"],
                                    nn.layer_norm(p["norm_feed_forward2"], x))))
    x = x + 0.5 * h
    return nn.layer_norm(p["norm_out"], x)


def fc_encode(params, embs, cfg: FCEncoderConfig):
    """Conformer layers over pre-encoded embeddings [B, T, H]."""
    x = embs * math.sqrt(cfg.hidden_size) if cfg.scale_input else embs
    pos_emb = jnp.asarray(_rel_pos_emb(x.shape[1], cfg.hidden_size))
    for i in range(cfg.num_hidden_layers):
        x = _fc_layer(params["fc_encoder"]["layers"][str(i)], x, pos_emb, cfg)
    return x


def tf_encode(params, x, valid_len, cfg: TFEncoderConfig):
    """BART-style post-LN transformer with learned positions [B, T, D]."""
    p = params["tf_encoder"]
    b, t, d = x.shape
    x = x + p["embed_positions"]["weight"][:t].astype(x.dtype)
    invalid = (jnp.arange(t) >= valid_len)[None, None, None, :]
    mask = invalid.astype(jnp.float32) * -1e4
    n_heads = cfg.encoder_attention_heads
    hd = d // n_heads
    for i in range(cfg.encoder_layers):
        lp = p["layers"][str(i)]
        ap = lp["self_attn"]
        q = nn.linear(ap["q_proj"], x).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
        k = nn.linear(ap["k_proj"], x).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
        v = nn.linear(ap["v_proj"], x).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
        o = nn.sdpa(q, k, v, mask=mask)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = nn.layer_norm(lp["self_attn_layer_norm"],
                          x + nn.linear(ap["out_proj"], o), cfg.layer_norm_eps)
        h = nn.linear(lp["fc2"], jax.nn.relu(nn.linear(lp["fc1"], x)))
        x = nn.layer_norm(lp["final_layer_norm"], x + h, cfg.layer_norm_eps)
    return x


def forward(params, mel, lengths, cfg: SortformerConfig):
    """mel [B, T, F] -> speaker probs [B, T/8, n_spk]."""
    embs, emb_len = pre_encode(params, mel, lengths, cfg.fc_encoder)
    x = fc_encode(params, embs, cfg.fc_encoder)
    x = nn.linear(params["sortformer_modules"]["encoder_proj"], x)
    x = tf_encode(params, x, emb_len[0], cfg.tf_encoder)
    m = params["sortformer_modules"]
    h = jax.nn.relu(x)
    h = jax.nn.relu(nn.linear(m["first_hidden_to_hidden"], h))
    preds = jax.nn.sigmoid(nn.linear(m["single_hidden_to_spks"], h))
    valid = (jnp.arange(preds.shape[1])[None] < emb_len[:, None])
    return preds * valid[..., None]


def encode_sequence(params, embs, valid_len, cfg: SortformerConfig):
    """Conformer + transformer + sigmoids over pre-encoded embeddings
    (the streaming full-pass, Sortformer.swift:717-724)."""
    x = fc_encode(params, embs, cfg.fc_encoder)
    x = nn.linear(params["sortformer_modules"]["encoder_proj"], x)
    x = tf_encode(params, x, valid_len, cfg.tf_encoder)
    m = params["sortformer_modules"]
    h = jax.nn.relu(x)
    h = jax.nn.relu(nn.linear(m["first_hidden_to_hidden"], h))
    preds = jax.nn.sigmoid(nn.linear(m["single_hidden_to_spks"], h))
    valid = jnp.arange(preds.shape[1])[None] < valid_len
    return preds * valid[..., None]


# ---------------------------------------------------------------------------
# Sanitize (torch checkpoint -> canonical; Sortformer.swift:1346-1382)
# ---------------------------------------------------------------------------


def sanitize(weights: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out = {}
    for k, v in weights.items():
        if "num_batches_tracked" in k:
            continue
        if "subsampling.layers." in k:
            k = k.replace("subsampling.layers.", "subsampling.layers_")
        # MLX-converted checkpoints: conv2d [O,H,W,I] -> [O,I,H,W];
        # conv1d [O,K,I] -> [O,I,K]. Torch checkpoints are already canonical.
        # MLX conv2d has the (square) kernel in dims 1,2.
        if "subsampling" in k and k.endswith("weight") and v.ndim == 4:
            if v.shape[1] == v.shape[2] and v.shape[3] in (1, v.shape[0]):
                v = np.transpose(v, (0, 3, 1, 2))
        if "pointwise_conv" in k and k.endswith("weight") and v.ndim == 3:
            if v.shape[1] == 1 and v.shape[2] > 1:  # MLX [O,1,I]
                v = np.transpose(v, (0, 2, 1))
        if "depthwise_conv" in k and k.endswith("weight") and v.ndim == 3:
            if v.shape[2] == 1 and v.shape[1] > 1:  # MLX [O,K,1]
                v = np.transpose(v, (0, 2, 1))
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# AOSC compression (host-side NumPy; Sortformer.swift:1088-1282)
# ---------------------------------------------------------------------------


def _get_silence_profile(mean_sil, n_sil, embs, preds, sil_threshold):
    is_sil = preds.sum(axis=2) < sil_threshold  # [1, T]
    sil_count = is_sil.sum(axis=1).astype(np.float32)
    sil_sum = (embs * is_sil[..., None]).sum(axis=1)
    upd_n = n_sil + sil_count
    total = mean_sil * n_sil[:, None] + sil_sum
    return total / np.maximum(upd_n[:, None], 1), upd_n


def _log_pred_scores(preds, threshold):
    logp = np.log(np.clip(preds, threshold, None))
    log1p = np.log(np.clip(1.0 - preds, threshold, None))
    return logp - log1p + log1p.sum(axis=2, keepdims=True) - math.log(0.5)


def _compress_aosc(embs, preds, mean_sil, mc: ModulesConfig):
    n_spk = mc.num_speakers
    sl = mc.spkcache_len
    sil_per_spk = mc.spkcache_sil_frames_per_spk
    per_spk = sl // n_spk - sil_per_spk
    strong = int(per_spk * mc.strong_boost_rate)
    weak = int(per_spk * mc.weak_boost_rate)
    min_pos = int(per_spk * mc.min_pos_scores_rate)

    scores = _log_pred_scores(preds, mc.pred_score_threshold)
    # disable low scores
    is_speech = preds > 0.5
    scores = np.where(is_speech, scores, -np.inf)
    pos_count = (scores > 0).sum(axis=1, keepdims=True)
    replace = (~(scores > 0)) & is_speech & (pos_count >= min_pos)
    scores = np.where(replace, -np.inf, scores)
    if mc.scores_boost_latest > 0 and scores.shape[1] > sl:
        scores[:, sl:] += mc.scores_boost_latest

    def boost(scores, k, scale):
        if k <= 0:
            return scores
        k = min(k, scores.shape[1])
        boost_val = -scale * math.log(0.5)
        out = scores.copy()
        for spk in range(scores.shape[2]):
            flat = scores[0, :, spk]
            topk = np.argpartition(-flat, k - 1)[:k]
            finite = np.isfinite(flat[topk])
            out[0, topk[finite], spk] += boost_val
        return out

    scores = boost(scores, strong, 2.0)
    scores = boost(scores, weak, 1.0)
    if sil_per_spk > 0:
        pad = np.full((1, sil_per_spk, n_spk), np.inf, np.float32)
        scores = np.concatenate([scores, pad], axis=1)

    n_frames = scores.shape[1]
    n_no_sil = n_frames - sil_per_spk
    flat = scores[0].T.reshape(-1)  # [n_spk * n_frames]
    k = min(sl, flat.shape[0])
    top = np.argpartition(-flat, k - 1)[:k]
    vals = flat[top]
    top = np.where(np.isfinite(vals) & (vals > -np.inf), top, mc.max_index)
    top = np.where(vals > -np.inf, top, mc.max_index)
    top = np.sort(top)
    disabled = top == mc.max_index
    top = top % n_frames
    disabled = disabled | (top >= n_no_sil)
    top = np.where(disabled, 0, top)

    gathered = embs[0, top]  # [sl, D]
    gathered = np.where(disabled[:, None], mean_sil[0][None], gathered)
    gpreds = preds[0, top]
    gpreds = np.where(disabled[:, None], 0.0, gpreds)
    return gathered[None], gpreds[None]


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


def preds_to_segments(preds: np.ndarray, frame_duration: float,
                      threshold: float = 0.5, min_duration: float = 0.0,
                      merge_gap: float = 0.0) -> list[DiarizationSegment]:
    """[T, n_spk] probabilities -> per-speaker segments
    (Sortformer.swift:1284-1344)."""
    preds = np.asarray(preds)
    segments = []
    for spk in range(preds.shape[1]):
        active = preds[:, spk] > threshold
        spk_segs = []
        start = -1
        for f, a in enumerate(active):
            if a and start < 0:
                start = f
            elif not a and start >= 0:
                s, e = start * frame_duration, f * frame_duration
                if e - s >= min_duration:
                    spk_segs.append(DiarizationSegment(s, e, spk))
                start = -1
        if start >= 0:
            s, e = start * frame_duration, len(active) * frame_duration
            if e - s >= min_duration:
                spk_segs.append(DiarizationSegment(s, e, spk))
        if merge_gap > 0 and len(spk_segs) > 1:
            merged = [spk_segs[0]]
            for seg in spk_segs[1:]:
                if seg.start - merged[-1].end <= merge_gap:
                    merged[-1] = DiarizationSegment(merged[-1].start, seg.end, spk)
                else:
                    merged.append(seg)
            spk_segs = merged
        segments += spk_segs
    segments.sort(key=lambda s: s.start)
    return segments


class Sortformer:
    def __init__(self, config: SortformerConfig, params, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        self._forward = ajit(functools.partial(forward, cfg=config))
        self._pre_encode = ajit(
            functools.partial(pre_encode, cfg=config.fc_encoder))
        self._encode_seq = ajit(
            functools.partial(encode_sequence, cfg=config))

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32) -> "Sortformer":
        model_dir = hub.resolve_or_download_model(repo_or_path)
        config = SortformerConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype,
                                     expected_prefixes=("fc_encoder", "tf_encoder"))
        return cls(config, params, dtype)

    @property
    def frame_duration(self) -> float:
        proc = self.config.processor
        return proc.hop_length * self.config.fc_encoder.subsampling_factor \
            / proc.sampling_rate

    # -- offline (Sortformer.swift:563-651) ------------------------------------

    def generate(self, audio: np.ndarray, threshold: float = 0.5,
                 min_duration: float = 0.0, merge_gap: float = 0.0) -> dict:
        t0 = time.perf_counter()
        proc = self.config.processor
        wav = np.asarray(audio, np.float32)
        if wav.ndim > 1:
            wav = wav.mean(axis=-1)
        # trim leading/trailing silence + peak normalize
        energy = np.abs(wav)
        nz = np.where(energy > 0.01 * max(energy.max(), 1e-9))[0]
        trim_offset = int(nz[0]) if len(nz) else 0
        wav = wav[trim_offset:]
        wav = wav / (np.abs(wav).max() + 1e-3)
        feats = extract_mel_features(wav, proc)
        lengths = jnp.asarray([feats.shape[1]], jnp.int32)
        preds = np.asarray(self._forward(self.params,
                                         jnp.asarray(feats, self.dtype), lengths))[0]
        offset = trim_offset / proc.sampling_rate
        segments = [
            DiarizationSegment(s.start + offset, s.end + offset, s.speaker)
            for s in preds_to_segments(preds, self.frame_duration, threshold,
                                       min_duration, merge_gap)
        ]
        return {
            "segments": segments,
            "speaker_probs": preds,
            "num_speakers": len({s.speaker for s in segments}),
            "total_time": time.perf_counter() - t0,
        }

    # -- streaming (Sortformer.swift:655-834) ----------------------------------

    def init_streaming_state(self) -> dict:
        d = self.config.fc_encoder.hidden_size
        n_spk = self.config.modules.num_speakers
        return {
            "spkcache": np.zeros((1, 0, d), np.float32),
            "spkcache_preds": np.zeros((1, 0, n_spk), np.float32),
            "fifo": np.zeros((1, 0, d), np.float32),
            "fifo_preds": np.zeros((1, 0, n_spk), np.float32),
            "frames_processed": 0,
            "mean_sil_emb": np.zeros((1, d), np.float32),
            "n_sil_frames": np.zeros((1,), np.float32),
        }

    def streaming_step(self, chunk_features: np.ndarray, state: dict,
                       right_context_embs: np.ndarray | None = None):
        """One chunk of mel features [1, T, F] -> (chunk preds, new state)."""
        mc = self.config.modules
        lc = mc.chunk_left_context if mc.use_aosc else 0
        lengths = jnp.asarray([chunk_features.shape[1]], jnp.int32)
        chunk_embs, emb_len = self._pre_encode(
            self.params, jnp.asarray(chunk_features, self.dtype), lengths)
        chunk_len = int(emb_len[0])
        chunk_embs = np.asarray(chunk_embs)[:, :chunk_len]

        left = None
        left_len = 0
        fifo_len = state["fifo"].shape[1]
        if lc > 0 and fifo_len > 0:
            left_len = min(lc, fifo_len)
            left = state["fifo"][:, fifo_len - left_len:]

        parts = [p for p in (state["spkcache"], state["fifo"], left,
                             chunk_embs, right_context_embs)
                 if p is not None and p.shape[1] > 0]
        all_embs = np.concatenate(parts, axis=1)
        total = all_embs.shape[1]
        # bucket to multiples of 32 so compiled graphs are reused
        bucket = max(32, ((total + 31) // 32) * 32)
        padded = np.zeros((1, bucket, all_embs.shape[2]), np.float32)
        padded[:, :total] = all_embs
        all_preds = np.asarray(self._encode_seq(
            self.params, jnp.asarray(padded, self.dtype), jnp.int32(total)))

        sp_len = state["spkcache"].shape[1]
        start = sp_len + fifo_len + left_len
        chunk_preds = all_preds[:, start : start + chunk_len]
        new_state = dict(state)
        if sp_len > 0:
            new_state["spkcache_preds"] = all_preds[:, :sp_len]
        if fifo_len > 0:
            new_state["fifo_preds"] = all_preds[:, sp_len : sp_len + fifo_len]
        new_state["fifo"] = np.concatenate(
            [new_state["fifo"], chunk_embs], axis=1)
        new_state["fifo_preds"] = np.concatenate(
            [new_state["fifo_preds"], chunk_preds], axis=1)
        new_state["frames_processed"] = state["frames_processed"] + chunk_preds.shape[1]
        return chunk_preds[0], new_state

    def maybe_compress_state(self, state: dict, spkcache_max: int = 188,
                             fifo_max: int = 188) -> dict:
        mc = self.config.modules
        fifo_len = state["fifo"].shape[1]
        if fifo_len <= fifo_max:
            return state
        pop = fifo_len - fifo_max
        if mc.use_aosc:
            pop = min(pop, mc.spkcache_update_period)
        popped = state["fifo"][:, :pop]
        popped_preds = state["fifo_preds"][:, :pop]
        mean_sil, n_sil = state["mean_sil_emb"], state["n_sil_frames"]
        if mc.use_aosc:
            mean_sil, n_sil = _get_silence_profile(
                mean_sil, n_sil, popped, popped_preds, mc.sil_threshold)
        cache = np.concatenate([state["spkcache"], popped], axis=1)
        cache_preds = np.concatenate([state["spkcache_preds"], popped_preds], axis=1)
        if cache.shape[1] > spkcache_max:
            if mc.use_aosc:
                cache, cache_preds = _compress_aosc(cache, cache_preds,
                                                    mean_sil, mc)
            else:
                scores = np.log(np.clip(cache_preds[0], 1e-7, 1.0)).sum(-1)
                top = np.sort(np.argsort(-scores)[:spkcache_max])
                cache, cache_preds = cache[:, top], cache_preds[:, top]
        out = dict(state)
        out.update(spkcache=cache, spkcache_preds=cache_preds,
                   fifo=state["fifo"][:, pop:],
                   fifo_preds=state["fifo_preds"][:, pop:],
                   mean_sil_emb=mean_sil, n_sil_frames=n_sil)
        return out

    def feed(self, chunk: np.ndarray, state: dict, threshold: float = 0.5,
             spkcache_max: int = 188, fifo_max: int = 188):
        """Feed one audio chunk -> (output dict, new state)."""
        proc = self.config.processor
        wav = np.asarray(chunk, np.float32)
        if wav.ndim > 1:
            wav = wav.mean(axis=-1)
        offset = state["frames_processed"] * self.frame_duration
        use_v2 = self.config.modules.use_aosc
        if not use_v2:
            wav = wav / (np.abs(wav).max() + 1e-3)
        feats = extract_mel_features(
            wav, proc, normalize=None if use_v2 else "per_feature", pad_to=0)
        preds, state = self.streaming_step(feats, state)
        segments = [
            DiarizationSegment(s.start + offset, s.end + offset, s.speaker)
            for s in preds_to_segments(preds, self.frame_duration, threshold)
        ]
        state = self.maybe_compress_state(state, spkcache_max, fifo_max)
        return {
            "segments": segments,
            "speaker_probs": preds,
            "num_speakers": len({s.speaker for s in segments}),
        }, state

    def generate_stream(self, audio: np.ndarray, chunk_duration: float = 5.0,
                        threshold: float = 0.5, spkcache_max: int = 188,
                        fifo_max: int = 188):
        """Chunked streaming over a full recording, yielding per-chunk
        outputs (Sortformer.swift:834-988)."""
        proc = self.config.processor
        wav = np.asarray(audio, np.float32)
        if wav.ndim > 1:
            wav = wav.mean(axis=-1)
        state = self.init_streaming_state()
        sf = self.config.fc_encoder.subsampling_factor
        chunk_samples = max(
            int(round(chunk_duration * proc.sampling_rate / proc.hop_length / sf))
            * sf * proc.hop_length, sf * proc.hop_length)
        for start in range(0, len(wav), chunk_samples):
            piece = wav[start : start + chunk_samples]
            if len(piece) < proc.win_length:
                break
            out, state = self.feed(piece, state, threshold,
                                   spkcache_max, fifo_max)
            yield out
