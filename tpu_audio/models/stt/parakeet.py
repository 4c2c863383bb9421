"""Parakeet (NeMo FastConformer) STT: TDT / RNNT / CTC variants with fully
on-device batched decode.

TPU-first rebuild of the reference Parakeet runtime
(Sources/MLXAudioSTT/Models/Parakeet/*, Models/Nemo/*):

- NeMo log-mel frontend: preemphasis, constant-pad STFT with a symmetric
  hann window zero-padded to n_fft, slaney mel, log + guard, per-feature
  mean/std normalization (ParakeetAudio.swift:6-79).
- FastConformer encoder: depthwise-striding 2D subsampling
  (ParakeetConformer.swift:63-153), conformer blocks with half-step FFNs,
  GLU conv module with BatchNorm, and Transformer-XL style relative-position
  attention with pos_bias_u/v and rel-shift (NemoAttention.swift:60-141).
- TDT/RNNT decode: the reference's "hybrid" vectorized decoder
  (ParakeetModel.swift:481-604) — per-row time cursors, LSTM prediction
  network, additive joint — rebuilt as ONE ``lax.while_loop`` where every
  row's cursor/state/commit logic is masked arithmetic on device. The
  reference syncs per step (eval(decisions), :545); here the host syncs once
  per utterance batch. RNNT is TDT with jump = (token == blank).
- CTC decode: argmax + collapse (NemoDecodingLogic.ctcSpans).

Checkpoints are the MLX-community conversions the reference consumes: same
key remaps (pre_encode conv-list renumbering, joint_net.2 flattening,
pos_bias naming — ParakeetModel.swift:1081-1160) plus layout transposes to
torch conventions.
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
from tpu_audio.core.generation import STTGenerateParameters, STTOutput, STTSegment
from tpu_audio.models.stt import nemo_alignment
from tpu_audio.core.jitting import ajit

__all__ = ["Parakeet", "ParakeetConfig"]


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------


@dataclass
class PreprocessConfig:
    sample_rate: int = 16000
    normalize: str = "per_feature"
    window_size: float = 0.025
    window_stride: float = 0.01
    window: str = "hann"
    features: int = 80
    n_fft: int = 512
    pad_to: int = 0
    pad_value: float = 0.0
    preemph: float = 0.97
    log_zero_guard_value: float = 2.0**-24


@dataclass
class ConformerConfig:
    feat_in: int = 80
    n_layers: int = 17
    d_model: int = 512
    n_heads: int = 8
    ff_expansion_factor: int = 4
    subsampling_factor: int = 8
    self_attention_model: str = "rel_pos"
    subsampling: str = "dw_striding"
    conv_kernel_size: int = 9
    subsampling_conv_channels: int = 256
    pos_emb_max_len: int = 5000
    causal_downsampling: bool = False
    use_bias: bool = True
    xscaling: bool = False


@dataclass
class ParakeetConfig:
    variant: str = "tdt"  # tdt | rnnt | ctc | tdt_ctc
    preprocess: PreprocessConfig = field(default_factory=PreprocessConfig)
    encoder: ConformerConfig = field(default_factory=ConformerConfig)
    vocabulary: list[str] = field(default_factory=list)
    durations: list[int] = field(default_factory=lambda: [0, 1, 2, 3, 4])
    max_symbols: int | None = 10
    pred_hidden: int = 640
    pred_rnn_layers: int = 1
    joint_hidden: int = 640
    joint_activation: str = "relu"
    num_extra_outputs: int = 0
    quantization: dict | None = None

    @property
    def blank_token(self) -> int:
        return len(self.vocabulary)

    @classmethod
    def from_dict(cls, d: dict) -> "ParakeetConfig":
        pp = {k: v for k, v in d.get("preprocessor", {}).items()
              if k in PreprocessConfig.__dataclass_fields__}
        enc = {k: v for k, v in d.get("encoder", {}).items()
               if k in ConformerConfig.__dataclass_fields__}
        cfg = cls(preprocess=PreprocessConfig(**pp), encoder=ConformerConfig(**enc))
        joint = d.get("joint") or {}
        dec = d.get("decoder") or {}
        decoding = d.get("decoding") or {}
        defaults = d.get("model_defaults") or {}
        cfg.vocabulary = joint.get("vocabulary") or dec.get("vocabulary") or []
        durations = decoding.get("durations") or defaults.get("tdt_durations")
        has_joint = bool(joint.get("jointnet"))
        if durations:
            cfg.variant = "tdt_ctc" if d.get("aux_ctc") else "tdt"
            cfg.durations = list(durations)
        elif has_joint:
            cfg.variant = "rnnt"
            cfg.durations = []
        else:
            cfg.variant = "ctc"
            cfg.durations = []
        greedy = decoding.get("greedy") or {}
        cfg.max_symbols = greedy.get("max_symbols", 10)
        prednet = dec.get("prednet") or {}
        cfg.pred_hidden = prednet.get("pred_hidden", cfg.pred_hidden)
        cfg.pred_rnn_layers = prednet.get("pred_rnn_layers", 1)
        jointnet = joint.get("jointnet") or {}
        cfg.joint_hidden = jointnet.get("joint_hidden", cfg.joint_hidden)
        cfg.joint_activation = jointnet.get("activation", "relu")
        cfg.num_extra_outputs = joint.get("num_extra_outputs", 0)
        cfg.quantization = d.get("quantization")
        return cfg


# ---------------------------------------------------------------------------
# Audio frontend (ParakeetAudio.swift)
# ---------------------------------------------------------------------------


def _make_window(name: str, win_length: int, n_fft: int) -> np.ndarray:
    name = name.lower()
    if name in ("hann", "hanning"):
        base = dsp.hanning_window(win_length, periodic=False)
    elif name == "hamming":
        base = dsp.hamming_window(win_length, periodic=False)
    elif name == "blackman":
        n = np.arange(win_length)
        k = 2 * np.pi * n / (win_length - 1)
        base = (0.42 - 0.5 * np.cos(k) + 0.08 * np.cos(2 * k)).astype(np.float32)
    elif name == "bartlett":
        base = np.bartlett(win_length).astype(np.float32)
    else:
        base = dsp.hanning_window(win_length, periodic=False)
    if win_length >= n_fft:
        return base[:n_fft]
    left = (n_fft - win_length) // 2
    return np.pad(base, (left, n_fft - win_length - left))


@functools.partial(ajit, static_argnames=("sr", "n_fft", "hop", "win_len",
                                             "n_mels", "preemph", "per_feature",
                                             "guard", "window_name"))
def _log_mel(audio, sr, n_fft, hop, win_len, n_mels, preemph, per_feature,
             guard, window_name):
    x = audio.astype(jnp.float32)
    if preemph > 0:
        x = jnp.concatenate([x[:1], x[1:] - preemph * x[:-1]])
    window = _make_window(window_name, win_len, n_fft)
    spec = dsp.stft(x, window, n_fft, hop, pad_mode="constant")
    power = jnp.abs(spec) ** 2  # [T, F]
    filters = jnp.asarray(dsp.mel_filters(sr, n_fft, n_mels, norm="slaney",
                                          mel_scale="slaney"))
    mel = jnp.log(power @ filters + guard)
    if per_feature:
        mean = mel.mean(axis=0, keepdims=True)
        denom = max(mel.shape[0] - 1, 1)
        var = ((mel - mean) ** 2).sum(axis=0, keepdims=True) / denom
        mel = (mel - mean) / (jnp.sqrt(var) + 1e-5)
    else:
        mel = (mel - mel.mean()) / (mel.std() + 1e-5)
    return mel  # [T, n_mels]


def log_mel_spectrogram(audio: np.ndarray, cfg: PreprocessConfig) -> jnp.ndarray:
    """NeMo-style normalized log-mel [1, T, n_mels]."""
    audio = np.asarray(audio, np.float32)
    if cfg.pad_to > 0 and audio.shape[0] < cfg.pad_to:
        audio = np.pad(audio, (0, cfg.pad_to - audio.shape[0]),
                       constant_values=cfg.pad_value)
    mel = _log_mel(
        jnp.asarray(audio), cfg.sample_rate, cfg.n_fft,
        int(cfg.window_stride * cfg.sample_rate),
        int(cfg.window_size * cfg.sample_rate), cfg.features,
        float(cfg.preemph), cfg.normalize == "per_feature",
        float(cfg.log_zero_guard_value), cfg.window,
    )
    return mel[None]


# ---------------------------------------------------------------------------
# Conformer encoder
# ---------------------------------------------------------------------------


def _subsample(p, x, lengths, cfg: ConformerConfig):
    """dw_striding subsampling: [B, T, F] -> [B, T/sf, d_model]."""
    sampling_num = int(math.log2(cfg.subsampling_factor))
    out_len = lengths.astype(jnp.float32)
    for _ in range(sampling_num):
        out_len = jnp.floor((out_len + 2 * 1 - 3) / 2) + 1
    out_len = out_len.astype(jnp.int32)

    y = x[..., None]  # [B, T, F, 1]
    y = jax.nn.relu(nn.conv2d(p["conv0"], y, stride=(2, 2), padding=(1, 1)))
    ch = cfg.subsampling_conv_channels
    for i in range(sampling_num - 1):
        y = nn.conv2d(p["depthwise_layers"][str(i)], y, stride=(2, 2),
                      padding=(1, 1), groups=ch)
        y = jax.nn.relu(nn.conv2d(p["pointwise_layers"][str(i)], y))
    b, t, f, c = y.shape
    y = y.transpose(0, 1, 3, 2).reshape(b, t, c * f)
    return nn.linear(p["out"], y), out_len


def _rel_pos_encoding(length: int, d_model: int, xscale: float):
    """Relative positional embeddings [1, 2L-1, d] centered at position 0
    (NemoRelPositionalEncoding, NemoAttention.swift:143-188)."""
    rows = 2 * length - 1
    pos = (length - 1 - np.arange(rows))[:, None].astype(np.float64)
    div = np.exp(-np.arange(0, d_model, 2) * math.log(10000.0) / d_model)
    pe = np.zeros((rows, d_model), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe[None]


def _rel_shift(x):
    """[B, H, Tq, P] Transformer-XL relative shift (NemoAttention.swift:79-89)."""
    b, h, tq, p = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, p + 1, tq)[:, :, 1:]
    return x.reshape(b, h, tq, p)


def _rel_pos_attention(p, x, pos_emb, n_heads: int):
    b, t, d = x.shape
    hd = d // n_heads
    scale = hd**-0.5
    q = nn.linear(p["linear_q"], x).reshape(b, t, n_heads, hd)
    k = nn.linear(p["linear_k"], x).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
    v = nn.linear(p["linear_v"], x).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
    pp = nn.linear(p["linear_pos"], pos_emb.astype(x.dtype))
    pos_len = pp.shape[1]
    ph = pp.reshape(1, pos_len, n_heads, hd).transpose(0, 2, 1, 3)

    q_u = (q + p["posBiasU"].astype(x.dtype)).transpose(0, 2, 1, 3)
    q_v = (q + p["posBiasV"].astype(x.dtype)).transpose(0, 2, 1, 3)

    bd = jnp.einsum("bhqd,bhpd->bhqp", q_v, ph, preferred_element_type=jnp.float32)
    bd = _rel_shift(bd)[..., :t] * scale

    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k,
                    preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(ac + bd, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
    return nn.linear(p["linear_out"], o)


def _conformer_conv(p, x, kernel_size: int):
    pw = nn.conv1d(p["pointwise_conv1"], x)
    a, g = jnp.split(pw, 2, axis=-1)
    y = a * jax.nn.sigmoid(g)
    y = nn.conv1d(p["depthwise_conv"], y, padding=(kernel_size - 1) // 2,
                  groups=y.shape[-1])
    y = nn.silu(nn.batch_norm(p["batch_norm"], y))
    return nn.conv1d(p["pointwise_conv2"], y)


def _conformer_block(p, x, pos_emb, cfg: ConformerConfig):
    x = x + 0.5 * _ff(p["feed_forward1"], nn.layer_norm(p["norm_feed_forward1"], x))
    h = nn.layer_norm(p["norm_self_att"], x)
    x = x + _rel_pos_attention(p["self_attn"], h, pos_emb, cfg.n_heads)
    x = x + _conformer_conv(p["conv"], nn.layer_norm(p["norm_conv"], x),
                            cfg.conv_kernel_size)
    x = x + 0.5 * _ff(p["feed_forward2"], nn.layer_norm(p["norm_feed_forward2"], x))
    return nn.layer_norm(p["norm_out"], x)


def _ff(p, x):
    return nn.linear(p["linear2"], nn.silu(nn.linear(p["linear1"], x)))


def encoder_forward(params, mel, lengths, cfg: ConformerConfig):
    """mel [B, T, F] -> (features [B, T/sf, d_model], out_lengths [B])."""
    p = params["encoder"]
    x, out_len = _subsample(p["pre_encode"], mel, lengths, cfg)
    xscale = math.sqrt(cfg.d_model) if cfg.xscaling else 1.0
    if cfg.self_attention_model == "rel_pos":
        pos_emb = jnp.asarray(_rel_pos_encoding(x.shape[1], cfg.d_model, xscale))
        x = x * xscale
    else:
        pos_emb = None
    for i in range(cfg.n_layers):
        x = _conformer_block(p["layers"][str(i)], x, pos_emb, cfg)
    return x, out_len


# ---------------------------------------------------------------------------
# Prediction + joint
# ---------------------------------------------------------------------------


def _predict_step(params, tokens, h, c, cfg: ParakeetConfig):
    """One LSTM prediction-network step. tokens [B] (blank -> zero embedding,
    NemoPredictNetwork.predictBatched); h/c [L, B, H]."""
    p = params["decoder"]["prediction"]
    blank = cfg.blank_token
    safe = jnp.where(tokens == blank, 0, tokens)
    emb = nn.embedding(p["embed"], safe)
    emb = jnp.where((tokens == blank)[:, None], 0.0, emb)
    x = emb
    hs, cs = [], []
    for i in range(cfg.pred_rnn_layers):
        lp = p["dec_rnn"]["lstm"][str(i)]
        h_i, c_i = nn.lstm_cell(lp, x, h[i], c[i])
        x = h_i
        hs.append(h_i)
        cs.append(c_i)
    return x, jnp.stack(hs), jnp.stack(cs)


def _joint(params, enc_frame, pred, cfg: ParakeetConfig):
    """Additive joint: enc [B, D], pred [B, H] -> logits [B, classes]."""
    p = params["joint"]
    x = nn.linear(p["enc"], enc_frame) + nn.linear(p["pred"], pred)
    act = cfg.joint_activation.lower()
    if act == "relu":
        x = jax.nn.relu(x)
    elif act == "sigmoid":
        x = jax.nn.sigmoid(x)
    else:
        x = jnp.tanh(x)
    return nn.linear(p["joint_net"], x)


# ---------------------------------------------------------------------------
# TDT / RNNT decode: one lax.while_loop for the whole batch
# ---------------------------------------------------------------------------


def make_tdt_decoder(cfg: ParakeetConfig, max_emit: int):
    blank = cfg.blank_token
    durations = np.asarray(cfg.durations, np.int32) if cfg.durations else None
    max_symbols = cfg.max_symbols
    n_layers = cfg.pred_rnn_layers
    hidden = cfg.pred_hidden

    @ajit
    def decode(params, features, lengths):
        b, t_max, _ = features.shape
        dtype = features.dtype

        def cond(carry):
            time = carry[0]
            return jnp.any(time < lengths)

        def body(carry):
            (time, new_sym, last_tok, h, c, toks, times, jumps, counts) = carry
            active = time < lengths
            frame = features[jnp.arange(b), jnp.clip(time, 0, t_max - 1)]
            pred, h_new, c_new = _predict_step(params, last_tok, h, c, cfg)
            logits = _joint(params, frame, pred.astype(dtype), cfg)
            logits = logits.astype(jnp.float32)
            tok = jnp.argmax(logits[:, : blank + 1], axis=-1).astype(jnp.int32)
            if durations is not None:
                dur_idx = jnp.argmax(logits[:, blank + 1 :], axis=-1)
                jump = jnp.asarray(durations)[dur_idx]
            else:
                jump = (tok == blank).astype(jnp.int32)  # RNNT
            # TDT reduction (NemoDecodingLogic.tdtStep)
            next_time = time + jump
            next_new = jnp.where(jump != 0, 0, new_sym + 1)
            if max_symbols is not None:
                hit = (jump == 0) & (next_new >= max_symbols)
                next_time = jnp.where(hit, next_time + 1, next_time)
                next_new = jnp.where(hit, 0, next_new)
            commit = active & (tok != blank)
            # commit LSTM state + last token only on emission
            h = jnp.where(commit[None, :, None], h_new, h)
            c = jnp.where(commit[None, :, None], c_new, c)
            last_tok = jnp.where(commit, tok, last_tok)
            # append to per-row buffers
            pos = jnp.clip(counts, 0, max_emit - 1)
            row = jnp.arange(b)
            toks = toks.at[row, pos].set(jnp.where(commit, tok, toks[row, pos]))
            times = times.at[row, pos].set(jnp.where(commit, time, times[row, pos]))
            jumps = jumps.at[row, pos].set(jnp.where(commit, jump, jumps[row, pos]))
            counts = counts + commit.astype(jnp.int32)
            time = jnp.where(active, next_time, time)
            new_sym = jnp.where(active, next_new, new_sym)
            return (time, new_sym, last_tok, h, c, toks, times, jumps, counts)

        init = (
            jnp.zeros((b,), jnp.int32),
            jnp.zeros((b,), jnp.int32),
            jnp.full((b,), blank, jnp.int32),
            jnp.zeros((n_layers, b, hidden), dtype),
            jnp.zeros((n_layers, b, hidden), dtype),
            jnp.zeros((b, max_emit), jnp.int32),
            jnp.zeros((b, max_emit), jnp.int32),
            jnp.zeros((b, max_emit), jnp.int32),
            jnp.zeros((b,), jnp.int32),
        )
        out = jax.lax.while_loop(cond, body, init)
        return out[5], out[6], out[7], out[8]  # toks, times, jumps, counts

    return decode


# ---------------------------------------------------------------------------
# Sanitize (ParakeetModel.swift:1081-1160 + layout transposes)
# ---------------------------------------------------------------------------


def sanitize(weights: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out = {}
    for key, v in weights.items():
        k = key
        k = k.replace(".decoder_layers.0.", ".decoder_layers.")
        k = k.replace("joint.joint_net.2.", "joint.joint_net.")
        k = k.replace(".pos_bias_u", ".posBiasU")
        k = k.replace(".pos_bias_v", ".posBiasV")
        # pre_encode conv-list renumbering
        parts = k.split(".")
        if (len(parts) >= 5 and parts[0] == "encoder" and parts[1] == "pre_encode"
                and parts[2] == "conv" and parts[3].isdigit()):
            idx = int(parts[3])
            suffix = ".".join(parts[4:])
            if idx == 0:
                k = f"encoder.pre_encode.conv0.{suffix}"
            elif idx >= 2:
                sh = idx - 2
                if sh % 3 == 0:
                    k = f"encoder.pre_encode.depthwise_layers.{sh//3}.{suffix}"
                elif sh % 3 == 1:
                    k = f"encoder.pre_encode.pointwise_layers.{sh//3}.{suffix}"
                else:
                    continue  # ReLU placeholder
            else:
                continue
        # MLX layouts -> torch: conv2d [O,H,W,I]->[O,I,H,W]; conv1d [O,K,I]->[O,I,K]
        if k.endswith(".weight") and v.ndim == 4:
            v = np.transpose(v, (0, 3, 1, 2))
        elif (k.endswith(".weight") and v.ndim == 3
              and ("conv" in k or "decoder_layers" in k)):
            v = np.transpose(v, (0, 2, 1))
        # MLX LSTM names
        k = k.replace(".Wx", ".weight_ih").replace(".Wh", ".weight_hh")
        out[k] = v
    # MLX LSTM single bias key "lstm.N.bias" -> bias_ih
    renamed = {}
    for k, v in out.items():
        parts = k.split(".")
        if len(parts) >= 3 and parts[-1] == "bias" and parts[-3] == "lstm" \
                and parts[-2].isdigit():
            renamed[".".join(parts[:-1]) + ".bias_ih"] = v
        else:
            renamed[k] = v
    return renamed


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


class Parakeet:
    def __init__(self, config: ParakeetConfig, params, dtype=jnp.bfloat16):
        self.config = config
        self.params = params
        self.dtype = dtype  # bf16 compute default (ParakeetModel.swift:25-27)
        self._encode = ajit(
            functools.partial(encoder_forward, cfg=config.encoder))
        self._decoders: dict[int, callable] = {}
        self._ctc_head = ajit(self._ctc_logits) if "ctc" in config.variant else None

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.bfloat16) -> "Parakeet":
        model_dir = hub.resolve_or_download_model(repo_or_path)
        config = ParakeetConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype,
                                     expected_prefixes=("encoder",))
        if config.quantization:
            from tpu_audio.core import quant

            q = config.quantization
            params = quant.tag_quantized(params, q.get("group_size", 64),
                                         q.get("bits", 4))
        return cls(config, params, dtype)

    # -- pieces ---------------------------------------------------------------

    def _ctc_logits(self, params, features):
        p = params["ctc_decoder"] if "ctc_decoder" in params else params["aux_ctc"]
        return nn.conv1d(p["decoder_layers"], features)

    def _frame_seconds(self, frame: int) -> float:
        cfg = self.config
        return frame * cfg.preprocess.window_stride * cfg.encoder.subsampling_factor

    def _decode_text(self, token_ids: list[int]) -> str:
        vocab = self.config.vocabulary
        pieces = [vocab[t] for t in token_ids if 0 <= t < len(vocab)]
        return "".join(pieces).replace("▁", " ").strip()

    def _token_text(self, token_id: int) -> str | None:
        """SentencePiece piece -> display text; None for special tokens
        (ParakeetTokenizer.isSpecialToken)."""
        vocab = self.config.vocabulary
        if not 0 <= token_id < len(vocab):
            return None
        piece = vocab[token_id]
        if piece.startswith("<") and piece.endswith(">"):
            return None
        return piece.replace("▁", " ")

    def _aligned_tokens(self, ids, starts, ends) -> list:
        """Lattice emissions -> AlignedTokens with absolute seconds
        (ParakeetModel.swift:455-465 TDT / :786-799 CTC)."""
        out = []
        for tok, s, e in zip(ids, starts, ends):
            text = self._token_text(int(tok))
            if text is None:
                continue
            start = self._frame_seconds(int(s))
            out.append(nemo_alignment.AlignedToken(
                id=int(tok), text=text, start=start,
                duration=max(self._frame_seconds(int(e)) - start, 0.0)))
        return out

    @staticmethod
    def _result_to_segments(result) -> list[STTSegment]:
        return [
            STTSegment(text=s.text.strip(), start=s.start, end=s.end,
                       tokens=[t.id for t in s.tokens])
            for s in result.sentences
        ]

    def _get_decoder(self, max_emit: int):
        if max_emit not in self._decoders:
            self._decoders[max_emit] = make_tdt_decoder(self.config, max_emit)
        return self._decoders[max_emit]

    # -- batch decode (reference generateBatch, ParakeetModel.swift:168-198) --

    def generate_batch(self, audios: list[np.ndarray],
                       generation_parameters: STTGenerateParameters | None = None
                       ) -> list[STTOutput]:
        return self.generate_batch_aligned(audios, generation_parameters)[0]

    def generate_batch_aligned(
            self, audios: list[np.ndarray],
            generation_parameters: STTGenerateParameters | None = None
    ) -> tuple[list[STTOutput], list[list]]:
        """Batch decode returning both STTOutputs and the per-utterance
        aligned token lists (timing from the TDT/CTC lattice) used by the
        long-audio overlap merge."""
        params = generation_parameters or STTGenerateParameters(max_tokens=8192)
        t0 = time.perf_counter()
        cfg = self.config
        mels = [np.asarray(log_mel_spectrogram(a, cfg.preprocess)[0]) for a in audios]
        t_max = max(m.shape[0] for m in mels)
        # pad time to a bucket so encoder shapes are reused across calls
        bucket = max(64, 1 << math.ceil(math.log2(max(t_max, 2))))
        batch = np.zeros((len(mels), bucket, cfg.preprocess.features), np.float32)
        lengths = np.zeros((len(mels),), np.int32)
        for i, m in enumerate(mels):
            batch[i, : m.shape[0]] = m
            lengths[i] = m.shape[0]
        feats, out_lens = self._encode(
            self.params, jnp.asarray(batch, self.dtype), jnp.asarray(lengths))

        if cfg.variant == "ctc":
            return self._generate_ctc(feats, out_lens, audios, t0)

        max_emit = min(params.max_tokens,
                       int(feats.shape[1]) * (cfg.max_symbols or 10))
        max_emit = max(64, 1 << math.ceil(math.log2(max(max_emit, 2))))
        decode = self._get_decoder(max_emit)
        toks, times, jumps, counts = decode(self.params, feats, out_lens)
        toks, times, jumps, counts = (np.asarray(toks), np.asarray(times),
                                      np.asarray(jumps), np.asarray(counts))
        elapsed = time.perf_counter() - t0

        outputs, aligned_lists = [], []
        for i, audio in enumerate(audios):
            n = int(counts[i])
            ids = toks[i, :n].tolist()
            aligned = self._aligned_tokens(
                ids, times[i, :n],
                times[i, :n] + np.maximum(jumps[i, :n], 1))
            aligned_lists.append(aligned)
            result = nemo_alignment.sentences_to_result(
                nemo_alignment.tokens_to_sentences(aligned))
            outputs.append(STTOutput(
                text=result.text, segments=self._result_to_segments(result),
                language=params.language,
                generation_token_count=n, total_time=elapsed,
                generation_time=elapsed,
            ))
        return outputs, aligned_lists

    def _generate_ctc(self, feats, out_lens, audios, t0):
        logits = self._ctc_head(self.params, feats)
        best = np.asarray(jnp.argmax(logits, axis=-1))
        out_lens = np.asarray(out_lens)
        blank = self.config.blank_token
        elapsed = time.perf_counter() - t0
        outputs, aligned_lists = [], []
        for i in range(len(audios)):
            seq = best[i, : int(out_lens[i])].tolist()
            # collapse repeats then remove blanks, keeping [start, end) frame
            # spans per emission (ctcSpans, ParakeetModel.swift:786-799)
            ids, starts, ends = [], [], []
            prev = -1
            for t, tok in enumerate(seq):
                if tok == prev:
                    if tok != blank:
                        ends[-1] = t + 1
                else:
                    if tok != blank:
                        ids.append(tok)
                        starts.append(t)
                        ends.append(t + 1)
                prev = tok
            aligned = self._aligned_tokens(ids, starts, ends)
            aligned_lists.append(aligned)
            result = nemo_alignment.sentences_to_result(
                nemo_alignment.tokens_to_sentences(aligned))
            outputs.append(STTOutput(
                text=result.text, segments=self._result_to_segments(result),
                generation_token_count=len(ids), total_time=elapsed,
                generation_time=elapsed,
            ))
        return outputs, aligned_lists

    # -- single utterance with long-audio chunking ------------------------------

    def generate(self, audio: np.ndarray,
                 generation_parameters: STTGenerateParameters | None = None
                 ) -> STTOutput:
        params = generation_parameters or STTGenerateParameters(max_tokens=8192)
        audio = np.asarray(audio, np.float32)
        if audio.ndim > 1:
            audio = audio.mean(axis=-1)
        sr = self.config.preprocess.sample_rate
        chunk_s = params.chunk_duration or 1200.0
        overlap_s = min(2.0, chunk_s / 4)
        chunk = int(chunk_s * sr)
        if len(audio) <= chunk:
            return self.generate_batch([audio], params)[0]
        # chunk with overlap; merge chunks by aligning their shared tokens
        # (timestamped-anchor merge, ParakeetModel.swift:118-160 +
        # NemoAlignment.swift:123-273) — robust to repeated phrases at the
        # boundary, unlike naive duplicate dropping
        step = max(1, chunk - int(overlap_s * sr))
        pieces = [audio[s : s + chunk] for s in range(0, len(audio), step)]
        outs, aligned_lists = self.generate_batch_aligned(pieces, params)
        all_tokens: list = []
        for idx, chunk_tokens in enumerate(aligned_lists):
            offset = idx * step / sr
            shifted = [
                nemo_alignment.AlignedToken(
                    id=t.id, text=t.text, start=t.start + offset,
                    duration=t.duration)
                for t in chunk_tokens
            ]
            all_tokens = nemo_alignment.merge_token_sequences(
                all_tokens, shifted, overlap_s)
        result = nemo_alignment.sentences_to_result(
            nemo_alignment.tokens_to_sentences(all_tokens))
        return STTOutput(text=result.text,
                         segments=self._result_to_segments(result),
                         generation_token_count=len(all_tokens),
                         total_time=sum(o.total_time for o in outs),
                         generation_time=sum(o.generation_time for o in outs))

    def generate_stream(self, audio, generation_parameters=None):
        out = self.generate(audio, generation_parameters)
        yield {"type": "token", "text": out.text}
        yield {"type": "result", "output": out}
