"""CohereTranscribe: NeMo-style conformer encoder + AED transformer decoder.

TPU-first rebuild of the reference
(Sources/MLXAudioSTT/Models/CohereTranscribe/): depthwise-separable conv2d
8x subsampling (CohereTranscribeEncoder.swift:5-113), conformer layers with
Transformer-XL relative-position attention and a per-layer output LayerNorm
(:325-372), an optional bridge projection, and a cross-attention transformer
decoder with fixed interleaved sin/cos positions scaled by 1/sqrt(d)
(CohereTranscribeDecoder.swift:37-64) feeding a classification lm_head.
The prompt is 9 control tokens (<|startofcontext|><|startoftranscript|>
emotion/lang/pnc/itn/timestamp/diarize flags,
CohereTranscribeTokenizer.swift:36-56).

TPU design: the mel features are padded to a frame bucket and the true
length is threaded into the jitted encoder (masks between subsampling convs,
attention key masking, zeroing before the depthwise conv) so bucketing is
exact; decoding runs as one jitted ``lax.while_loop`` over a fixed-size self
KV cache with per-layer cross K/V precomputed once from the encoder output
(the same pattern as canary.py). Weights load from NeMo-style keys
(separate linear_q/k/v) or pre-fused qkv_proj exports; both are normalized
to split q/k/v projections so single-token decode steps do 1/3 the matmul
work of the fused layout.
"""

from __future__ import annotations

import functools
import math
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import dsp, hub, kv_cache, loading, nn
from tpu_audio.core.generation import STTGenerateParameters, STTOutput, STTSegment
from tpu_audio.models.stt.parakeet import _rel_pos_encoding, _rel_shift
from tpu_audio.core.jitting import ajit

__all__ = ["CohereTranscribe", "CohereConfig", "CohereTokenizer"]

_FRAME_BUCKET = 400  # 4 s of mel frames per encoder bucket step


@dataclass
class CohereEncoderConfig:
    d_model: int = 1024
    ff_expansion_factor: int = 4
    n_heads: int = 8
    conv_kernel_size: int = 9
    n_layers: int = 24
    pos_emb_max_len: int = 5000
    subsampling_conv_channels: int = 256
    subsampling_factor: int = 8
    feat_in: int = 128

    @classmethod
    def from_dict(cls, d: dict) -> "CohereEncoderConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass
class CohereDecoderConfig:
    hidden_size: int = 1024
    inner_size: int = 4096
    num_attention_heads: int = 8
    num_layers: int = 6
    max_sequence_length: int = 512

    @classmethod
    def from_dict(cls, d: dict) -> "CohereDecoderConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass
class CohereConfig:
    encoder: CohereEncoderConfig = field(default_factory=CohereEncoderConfig)
    decoder: CohereDecoderConfig = field(default_factory=CohereDecoderConfig)
    vocab_size: int = 16384
    sample_rate: int = 16000
    max_audio_clip_s: int = 30
    quantization: dict | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "CohereConfig":
        vocab = d.get("vocab_size")
        if vocab is None:
            vocab = (d.get("head") or {}).get("num_classes", 16384)
        dec = ((d.get("transf_decoder") or {}).get("config_dict")
               or d.get("transf_decoder") or {})
        return cls(
            encoder=CohereEncoderConfig.from_dict(d.get("encoder") or {}),
            decoder=CohereDecoderConfig.from_dict(dec),
            vocab_size=vocab,
            sample_rate=d.get("sample_rate", 16000),
            max_audio_clip_s=d.get("max_audio_clip_s", 30),
            quantization=d.get("quantization")
            or d.get("quantization_config"),
        )


# ---------------------------------------------------------------------------
# Audio frontend (CohereTranscribeAudio.swift)
# ---------------------------------------------------------------------------


@functools.partial(ajit, static_argnames=("sr", "n_mels"))
def _cohere_features(audio, sr: int, n_mels: int):
    """Pre-emphasized power-mel with per-bin mean/std normalization ->
    [T, n_mels] (computeFeatures, CohereTranscribeAudio.swift:23-60)."""
    x = audio.astype(jnp.float32)
    x = jnp.concatenate([x[:1], x[1:] - 0.97 * x[:-1]])
    n_fft, win, hop = 512, 400, 160
    window = np.zeros(n_fft, np.float32)
    left = (n_fft - win) // 2
    window[left : left + win] = dsp.hanning_window(win, periodic=False)
    spec = dsp.stft(x, jnp.asarray(window), n_fft, hop, pad_mode="constant")
    power = jnp.abs(spec) ** 2  # [T, F]
    filters = jnp.asarray(dsp.mel_filters(sr, n_fft, n_mels, norm="slaney",
                                          mel_scale="slaney"))
    mel = jnp.log(power @ filters + 2.0 ** -24)
    mean = mel.mean(axis=0, keepdims=True)
    std = jnp.sqrt(((mel - mean) ** 2).mean(axis=0, keepdims=True)) + 1e-5
    return (mel - mean) / std


# ---------------------------------------------------------------------------
# Encoder (CohereTranscribeEncoder.swift)
# ---------------------------------------------------------------------------


def _conv_len(n):
    return (n + 2 - 3) // 2 + 1  # kernel 3 stride 2 pad 1


def _time_mask(x, lengths):
    """Boolean [B, T, 1...] validity mask matching x's rank."""
    t = x.shape[1]
    m = jnp.arange(t)[None, :] < lengths[:, None]
    while m.ndim < x.ndim:
        m = m[..., None]
    return m


def _subsample(p, x, lengths):
    """Depthwise-separable 8x conv subsampling. x: [B, F, T] -> [B, T', d].
    (ConvSubsampling, CohereTranscribeEncoder.swift:5-113)."""
    h = x.transpose(0, 2, 1)[..., None]  # [B, T, F, 1] NHWC
    h = jnp.where(_time_mask(h, lengths), h, 0)
    h = jax.nn.relu(nn.conv2d(p["conv0"], h, stride=(2, 2), padding=(1, 1)))
    lengths = _conv_len(lengths)
    h = jnp.where(_time_mask(h, lengths), h, 0)
    h = nn.conv2d(p["conv2"], h, stride=(2, 2), padding=(1, 1),
                  groups=h.shape[-1])
    h = jax.nn.relu(nn.conv2d(p["conv3"], h))
    lengths = _conv_len(lengths)
    h = jnp.where(_time_mask(h, lengths), h, 0)
    h = nn.conv2d(p["conv5"], h, stride=(2, 2), padding=(1, 1),
                  groups=h.shape[-1])
    h = jax.nn.relu(nn.conv2d(p["conv6"], h))
    lengths = _conv_len(lengths)
    h = jnp.where(_time_mask(h, lengths), h, 0)
    b, t, f, c = h.shape
    h = h.transpose(0, 1, 3, 2).reshape(b, t, c * f)
    return nn.linear(p["out"], h), lengths


def _rel_attention(p, x, pos_emb, n_heads: int, key_mask):
    """Rel-pos MHA with split q/k/v (RelPositionMultiHeadAttention,
    CohereTranscribeEncoder.swift:232-323); scale applied to AC+BD."""
    b, t, d = x.shape
    hd = d // n_heads
    q = nn.linear(p["q_proj"], x).reshape(b, t, n_heads, hd)
    k = nn.linear(p["k_proj"], x).reshape(b, t, n_heads, hd)
    v = nn.linear(p["v_proj"], x).reshape(b, t, n_heads, hd)
    pp = nn.linear(p["pos_proj"], pos_emb.astype(x.dtype))
    ph = pp.reshape(1, -1, n_heads, hd).transpose(0, 2, 1, 3)
    q_u = (q + p["pos_bias_u"].astype(x.dtype)).transpose(0, 2, 1, 3)
    q_v = (q + p["pos_bias_v"].astype(x.dtype)).transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k,
                    preferred_element_type=jnp.float32)
    bd = jnp.einsum("bhqd,bhpd->bhqp", q_v, ph,
                    preferred_element_type=jnp.float32)
    bd = _rel_shift(bd)[..., :t]
    scores = (ac + bd) * (hd ** -0.5)
    scores = jnp.where(key_mask[:, None, None, :], scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return nn.linear(p["out_proj"], o.transpose(0, 2, 1, 3).reshape(b, t, d))


def _conformer_conv(p, x, kernel_size: int, valid):
    h = nn.conv1d(p["pointwise_conv1"], x)
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(g)
    h = jnp.where(valid[..., None], h, 0)  # zero pad before depthwise conv
    h = nn.conv1d(p["depthwise_conv"], h, padding=(kernel_size - 1) // 2,
                  groups=h.shape[-1])
    h = nn.silu(nn.batch_norm(p["batch_norm"], h))
    return nn.conv1d(p["pointwise_conv2"], h)


def _ff(p, x):
    return nn.linear(p["linear2"], nn.silu(nn.linear(p["linear1"], x)))


def _conformer_layer(p, x, pos_emb, cfg: CohereEncoderConfig, valid):
    """Macaron conformer with trailing norm_out
    (ConformerLayer, CohereTranscribeEncoder.swift:325-372)."""
    x = x + 0.5 * _ff(p["feed_forward1"], nn.layer_norm(p["norm_feed_forward1"], x))
    x = x + _rel_attention(p["self_attn"], nn.layer_norm(p["norm_self_att"], x),
                           pos_emb, cfg.n_heads, valid)
    x = x + _conformer_conv(p["conv"], nn.layer_norm(p["norm_conv"], x),
                            cfg.conv_kernel_size, valid)
    x = x + 0.5 * _ff(p["feed_forward2"], nn.layer_norm(p["norm_feed_forward2"], x))
    return nn.layer_norm(p["norm_out"], x)


def encoder_forward(params, features, lengths, cfg: CohereEncoderConfig):
    """features [B, F, T] + valid frame lengths -> ([B, T', d], out_lengths)."""
    p = params["encoder"]
    x, out_len = _subsample(p["subsampling"], features, lengths)
    t = x.shape[1]
    pos_emb = jnp.asarray(_rel_pos_encoding(t, cfg.d_model, 1.0))
    valid = jnp.arange(t)[None, :] < out_len[:, None]
    for i in range(cfg.n_layers):
        x = _conformer_layer(p["layers"][str(i)], x, pos_emb, cfg, valid)
    return x, out_len


# ---------------------------------------------------------------------------
# Decoder (CohereTranscribeDecoder.swift)
# ---------------------------------------------------------------------------


def _position_table(d: int, max_len: int) -> np.ndarray:
    """Interleaved sin/cos positions / sqrt(d)
    (FixedPositionalEncoding, CohereTranscribeDecoder.swift:37-64)."""
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(-math.log(10000.0) / d * np.arange(0, d, 2, np.float32))
    table = np.zeros((max_len, d), np.float32)
    table[:, 0::2] = np.sin(pos * div)
    table[:, 1::2] = np.cos(pos * div)
    return table / math.sqrt(d)


def _embed(p, tokens, positions, cfg: CohereConfig):
    table = jnp.asarray(_position_table(cfg.decoder.hidden_size,
                                        cfg.decoder.max_sequence_length))
    x = nn.embedding(p["embedding"]["token_embedding"], tokens)
    x = x + table[positions].astype(x.dtype)
    return nn.layer_norm(p["embedding"]["layer_norm"], x)


def _cross_kv(params, enc_out, cfg: CohereConfig):
    """Per-layer cross-attention K/V computed once from the encoder output."""
    nh = cfg.decoder.num_attention_heads
    hd = cfg.decoder.hidden_size // nh
    b, s, _ = enc_out.shape
    ks, vs = [], []
    for i in range(cfg.decoder.num_layers):
        ap = params["decoder"]["core"]["layers"][str(i)]["second_sub_layer"]
        k = nn.linear(ap["k_proj"], enc_out).reshape(b, s, nh, hd)
        v = nn.linear(ap["v_proj"], enc_out).reshape(b, s, nh, hd)
        ks.append(k.transpose(0, 2, 1, 3))
        vs.append(v.transpose(0, 2, 1, 3))
    return jnp.stack(ks), jnp.stack(vs)


def _decoder_pass(params, tokens, positions, cache, cross_k, cross_v,
                  enc_mask, cfg: CohereConfig):
    """Decoder layers over ``tokens [B, T]`` appending self K/V to ``cache``.
    Returns (logits [B, T, V], cache)."""
    p = params["decoder"]
    nh = cfg.decoder.num_attention_heads
    d = cfg.decoder.hidden_size
    hd = d // nh
    x = _embed(p, tokens, positions, cfg)
    b, t = tokens.shape
    mask = kv_cache.attention_mask(cache, t)
    for i in range(cfg.decoder.num_layers):
        lp = p["core"]["layers"][str(i)]
        h = nn.layer_norm(lp["layer_norm_1"], x)
        ap = lp["first_sub_layer"]
        q = nn.linear(ap["q_proj"], h).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        k = nn.linear(ap["k_proj"], h).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        v = nn.linear(ap["v_proj"], h).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        cache, k_full, v_full = kv_cache.update_cache(cache, i, k, v)
        o = nn.sdpa(q, k_full, v_full, mask=mask)
        x = x + nn.linear(ap["out_proj"],
                          o.transpose(0, 2, 1, 3).reshape(b, t, d))
        h = nn.layer_norm(lp["layer_norm_2"], x)
        ap = lp["second_sub_layer"]
        q = nn.linear(ap["q_proj"], h).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
        o = nn.sdpa(q, cross_k[i], cross_v[i], mask=enc_mask)
        x = x + nn.linear(ap["out_proj"],
                          o.transpose(0, 2, 1, 3).reshape(b, t, d))
        h = nn.layer_norm(lp["layer_norm_3"], x)
        fp = lp["third_sub_layer"]
        x = x + nn.linear(fp["dense_out"],
                          jax.nn.relu(nn.linear(fp["dense_in"], h)))
    x = nn.layer_norm(p["core"]["final_layer_norm"], x)
    cache = cache._replace(offset=cache.offset + t)
    return nn.linear(params["lm_head"], x), cache


# ---------------------------------------------------------------------------
# Weight sanitization (normalizeCohereWeightKeys, CohereTranscribe.swift)
# ---------------------------------------------------------------------------

_PREFIX_RENAMES = [
    ("encoder.pre_encode.", "encoder.subsampling."),
    ("encoder_decoder_proj.", "bridge_proj."),
    ("log_softmax.mlp.layer0.", "lm_head."),
    ("transf_decoder.embedding.", "decoder.embedding."),
    ("transf_decoder._embedding.", "decoder.embedding."),
    ("transf_decoder.decoder.", "decoder.core."),
    ("transf_decoder._decoder.", "decoder.core."),
]
_SUB_RENAMES = [
    ("encoder.subsampling.conv.0.", "encoder.subsampling.conv0."),
    ("encoder.subsampling.conv.2.", "encoder.subsampling.conv2."),
    ("encoder.subsampling.conv.3.", "encoder.subsampling.conv3."),
    ("encoder.subsampling.conv.5.", "encoder.subsampling.conv5."),
    ("encoder.subsampling.conv.6.", "encoder.subsampling.conv6."),
    ("self_attn.linear_q.", "self_attn.q_proj."),
    ("self_attn.linear_k.", "self_attn.k_proj."),
    ("self_attn.linear_v.", "self_attn.v_proj."),
    ("self_attn.linear_out.", "self_attn.out_proj."),
    ("self_attn.linear_pos.", "self_attn.pos_proj."),
    (".query_net.", ".q_proj."),
    (".key_net.", ".k_proj."),
    (".value_net.", ".v_proj."),
    (".out_projection.", ".out_proj."),
]
_SUBSAMPLING_KERNELS = {"conv0": 3, "conv2": 3, "conv3": 1, "conv5": 3,
                        "conv6": 1}


def sanitize(weights):
    out = {}
    fused = {}
    for k, v in weights.items():
        if k.endswith(".num_batches_tracked") or k.startswith("preprocessor."):
            continue
        for src, dst in _PREFIX_RENAMES:
            if k.startswith(src):
                k = dst + k[len(src):]
                break
        for src, dst in _SUB_RENAMES:
            k = k.replace(src, dst)
        if "decoder.embedding.position_embedding" in k:
            continue  # computed, not stored
        if ".qkv_proj." in k:
            fused[k] = v  # pre-fused exports: split below
            continue
        if k.endswith(".weight") and v.ndim == 4:
            kern = _SUBSAMPLING_KERNELS.get(k.split(".")[-2])
            if kern is not None:
                if v.shape[2] == kern and v.shape[3] == kern:
                    pass  # torch [O,I,Kh,Kw] — canonical
                elif v.shape[1] == kern and v.shape[2] == kern:
                    v = v.transpose(0, 3, 1, 2)  # MLX [O,H,W,I]
        elif k.endswith(".weight") and v.ndim == 3 and ".conv." in k:
            if "depthwise_conv" in k:
                if v.shape[2] == 1 and v.shape[1] > 1:  # MLX [C,K,1]
                    v = v.transpose(0, 2, 1)
            elif v.shape[1] == 1 and v.shape[2] > 1:  # MLX [O,1,I] pointwise
                v = v.transpose(0, 2, 1)
        out[k] = v
    for k, v in fused.items():
        for part, piece in zip(("q_proj", "k_proj", "v_proj"),
                               np.split(v, 3, axis=0)):
            out[k.replace("qkv_proj", part)] = piece
    return out


# ---------------------------------------------------------------------------
# Tokenizer (CohereTranscribeTokenizer.swift)
# ---------------------------------------------------------------------------

_LANG_TOKENS = {
    "english": "<|en|>", "en": "<|en|>", "french": "<|fr|>", "fr": "<|fr|>",
    "german": "<|de|>", "de": "<|de|>", "spanish": "<|es|>", "es": "<|es|>",
    "italian": "<|it|>", "it": "<|it|>", "portuguese": "<|pt|>",
    "pt": "<|pt|>", "dutch": "<|nl|>", "nl": "<|nl|>", "polish": "<|pl|>",
    "pl": "<|pl|>", "greek": "<|el|>", "el": "<|el|>", "arabic": "<|ar|>",
    "ar": "<|ar|>", "japanese": "<|ja|>", "ja": "<|ja|>", "chinese": "<|zh|>",
    "zh": "<|zh|>", "vietnamese": "<|vi|>", "vi": "<|vi|>",
    "korean": "<|ko|>", "ko": "<|ko|>",
}


class CohereTokenizer:
    """SentencePiece + special-token table from tokenizer_config.json."""

    def __init__(self, model_dir):
        import json
        from pathlib import Path

        from tpu_audio.core.spm import SentencePieceTokenizer

        model_dir = Path(model_dir)
        self.sp = SentencePieceTokenizer.from_model_file(
            model_dir / "tokenizer.model")
        cfg = json.loads((model_dir / "tokenizer_config.json").read_text())
        self.special = {
            tok["content"]: int(tid)
            for tid, tok in (cfg.get("added_tokens_decoder") or {}).items()
        }
        self.special_ids = set(self.special.values())

    def encode(self, text: str) -> list[int]:
        if text in self.special:
            return [self.special[text]]
        return self.sp.encode(text)

    def decode(self, ids) -> str:
        return self.sp.decode([i for i in ids if i not in self.special_ids])

    @property
    def eos_id(self) -> int:
        return self.special.get("<|endoftext|>", 0)

    def build_prompt(self, language: str = "en", use_punctuation: bool = True,
                     use_timestamps: bool = False) -> list[int]:
        lang = _LANG_TOKENS.get((language or "en").lower(), "<|en|>")
        names = [
            "<|startofcontext|>", "<|startoftranscript|>",
            "<|emo:undefined|>", lang, lang,
            "<|pnc|>" if use_punctuation else "<|nopnc|>",
            "<|noitn|>",
            "<|timestamp|>" if use_timestamps else "<|notimestamp|>",
            "<|nodiarize|>",
        ]
        return [self.special[n] for n in names if n in self.special]


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


class CohereTranscribe:
    def __init__(self, config: CohereConfig, params, tokenizer=None,
                 dtype=jnp.bfloat16):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.dtype = dtype
        self._encode = ajit(
            functools.partial(encoder_forward, cfg=config.encoder))
        self._prefill = ajit(self._prefill_fn, donate_argnums=(2,))
        self._decode = ajit(self._decode_fn, donate_argnums=(2,),
                               static_argnums=(6,))

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.bfloat16):
        from pathlib import Path

        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = CohereConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        if config.quantization:
            from tpu_audio.core import quant

            q = config.quantization
            params = quant.tag_quantized(params, q.get("group_size", 64),
                                         q.get("bits", 4))
        tokenizer = None
        if (model_dir / "tokenizer.model").exists():
            tokenizer = CohereTokenizer(model_dir)
        return cls(config, params, tokenizer, dtype)

    # -- jitted graphs -------------------------------------------------------

    def _prefill_fn(self, params, prompt_ids, cache, enc_out, enc_mask):
        cross_k, cross_v = _cross_kv(params, enc_out, self.config)
        t = prompt_ids.shape[1]
        positions = jnp.arange(t)
        logits, cache = _decoder_pass(params, prompt_ids, positions, cache,
                                      cross_k, cross_v, enc_mask, self.config)
        return logits[:, -1], cache, cross_k, cross_v

    def _decode_fn(self, params, first_logits, cache, cross_k, cross_v,
                   enc_mask, max_tokens: int, forced_buf=None,
                   forced_len=None):
        """Greedy while_loop decode. Returns (tokens [max], count).
        ``forced_buf[:forced_len]`` teacher-forces the first steps — the
        streaming session replays confirmed tokens so new decodes extend
        them (streamingDecodeTokenIds confirmed prefix)."""
        eos = jnp.int32(self.tokenizer.eos_id if self.tokenizer else 0)

        def cond(state):
            i, tok, _cache, _buf = state
            live = tok != eos
            if forced_buf is not None:
                live = live | (i < forced_len)
            return (i < max_tokens) & live

        def body(state):
            i, tok, cache, buf = state
            if forced_buf is not None:
                tok = jnp.where(
                    i < forced_len,
                    forced_buf[jnp.clip(i, 0, forced_buf.shape[0] - 1)], tok)
            buf = buf.at[i].set(tok)
            positions = jnp.full((1, 1), cache.offset)
            logits, cache = _decoder_pass(
                params, tok.reshape(1, 1), positions, cache, cross_k,
                cross_v, enc_mask, self.config)
            return i + 1, jnp.argmax(logits[0, -1]).astype(jnp.int32), \
                cache, buf

        tok0 = jnp.argmax(first_logits[0]).astype(jnp.int32)
        buf = jnp.zeros((max_tokens,), jnp.int32)
        i, last, cache, buf = jax.lax.while_loop(
            cond, body, (jnp.int32(0), tok0, cache, buf))
        return buf, i

    # -- generation ----------------------------------------------------------

    def _encode_audio(self, audio: np.ndarray):
        """-> (enc_out [1, T', d] np, enc_len int)."""
        feats = np.asarray(_cohere_features(
            jnp.asarray(audio, jnp.float32), sr=self.config.sample_rate,
            n_mels=self.config.encoder.feat_in))  # [T, F]
        n = feats.shape[0]
        bucket = _FRAME_BUCKET * max(1, math.ceil(n / _FRAME_BUCKET))
        padded = np.zeros((1, self.config.encoder.feat_in, bucket), np.float32)
        padded[0, :, :n] = feats.T
        enc_out, out_len = self._encode(
            self.params, jnp.asarray(padded, self.dtype),
            jnp.asarray([n], jnp.int32))
        enc_out = np.asarray(enc_out.astype(jnp.float32))
        if "bridge_proj" in self.params:
            enc_out = np.asarray(nn.linear(
                self.params["bridge_proj"],
                jnp.asarray(enc_out, self.dtype)).astype(jnp.float32))
        return enc_out, int(out_len[0])

    def _transcribe_chunk(self, audio, params: STTGenerateParameters):
        enc_out, enc_len = self._encode_audio(audio)
        prompt = self.tokenizer.build_prompt(
            language=params.language or "en")
        max_new = min(params.max_tokens,
                      self.config.decoder.max_sequence_length
                      - len(prompt) - 1)
        cache = kv_cache.init_cache(
            self.config.decoder.num_layers, 1,
            self.config.decoder.num_attention_heads,
            self.config.decoder.hidden_size
            // self.config.decoder.num_attention_heads,
            len(prompt) + max_new + 1, self.dtype)
        enc_mask = (jnp.arange(enc_out.shape[1])[None, None, None, :]
                    < enc_len)
        logits, cache, cross_k, cross_v = self._prefill(
            self.params, jnp.asarray([prompt], jnp.int32), cache,
            jnp.asarray(enc_out, self.dtype), enc_mask)
        buf, count = self._decode(self.params, logits, cache, cross_k,
                                  cross_v, enc_mask, max_new)
        ids = np.asarray(buf)[: int(count)].tolist()
        eos = self.tokenizer.eos_id
        ids = [t for t in ids if t != eos]
        return self.tokenizer.decode(ids).strip(), len(prompt), len(ids)

    def generate(self, audio, generation_parameters=None,
                 vad=None) -> STTOutput:
        """Transcribe with fixed-duration chunking, or — when ``vad`` is a
        ``(silero_model, SpeechSegmentConfig)`` pair — with opt-in
        Silero-VAD chunking that trims silence and aligns chunks to natural
        pauses (CohereTranscribe.swift:318-352 +
        CohereTranscribe/README.md:43-66). VAD failure falls back to fixed
        chunking like the reference."""
        params = generation_parameters or STTGenerateParameters(
            max_tokens=self.config.decoder.max_sequence_length)
        if self.tokenizer is None:
            raise RuntimeError("tokenizer not loaded")
        t0 = time.perf_counter()
        audio = np.asarray(audio, np.float32)
        if audio.ndim > 1:
            audio = audio.mean(axis=-1)
        chunk_s = params.chunk_duration or float(self.config.max_audio_clip_s)
        chunk = int(chunk_s * self.config.sample_rate)
        pieces: list[tuple[np.ndarray, float]] | None = None
        if vad is not None:
            try:
                from tpu_audio.models.vad.segmenter import segment_speech

                vad_model, vad_config = vad
                pieces = segment_speech(audio, self.config.sample_rate,
                                        vad_model, vad_config)
            except Exception:
                pieces = None  # fixed-chunking fallback (swift:333-341)
        if pieces is None:
            pieces = [(audio[s : s + chunk], s / self.config.sample_rate)
                      for s in range(0, max(len(audio), 1), chunk)]
        texts, segments = [], []
        n_prompt = n_gen = 0
        remaining = params.max_tokens
        for piece, offset_s in pieces:
            if remaining <= 0:
                break
            chunk_params = STTGenerateParameters(
                max_tokens=remaining, language=params.language,
                temperature=params.temperature)
            text, p, g = self._transcribe_chunk(piece, chunk_params)
            n_prompt += p
            n_gen += g
            remaining -= g
            if text:
                texts.append(text)
                segments.append(STTSegment(
                    text=text, start=offset_s,
                    end=offset_s + len(piece) / self.config.sample_rate))
        elapsed = time.perf_counter() - t0
        return STTOutput(
            text="\n".join(texts), segments=segments,
            language=params.language, prompt_token_count=n_prompt,
            generation_token_count=n_gen, total_time=elapsed,
            generation_time=elapsed)

    # -- streaming session hooks (CohereStreamingInferenceSessionCore) -------

    def streaming_decode_token_ids(self, audio, config,
                                   confirmed_token_ids) -> tuple[list[int], float]:
        """Decode a window's token ids with previously confirmed tokens
        teacher-forced as a prefix (streamingDecodeTokenIds). Returns
        (all token ids incl. the confirmed prefix, decode seconds)."""
        t0 = time.perf_counter()
        enc_out, enc_len = self._encode_audio(np.asarray(audio, np.float32))
        prompt = self.tokenizer.build_prompt(
            language=(getattr(config, "language", None) or "en"))
        max_total = min(
            getattr(config, "max_tokens_per_pass", 512),
            self.config.decoder.max_sequence_length - len(prompt) - 1)
        cache = kv_cache.init_cache(
            self.config.decoder.num_layers, 1,
            self.config.decoder.num_attention_heads,
            self.config.decoder.hidden_size
            // self.config.decoder.num_attention_heads,
            len(prompt) + max_total + 1, self.dtype)
        enc_mask = (jnp.arange(enc_out.shape[1])[None, None, None, :]
                    < enc_len)
        logits, cache, cross_k, cross_v = self._prefill(
            self.params, jnp.asarray([prompt], jnp.int32), cache,
            jnp.asarray(enc_out, self.dtype), enc_mask)
        forced = np.zeros((max_total,), np.int32)
        n_forced = min(len(confirmed_token_ids), max_total)
        if n_forced:
            forced[:n_forced] = confirmed_token_ids[:n_forced]
        buf, count = self._decode(
            self.params, logits, cache, cross_k, cross_v, enc_mask,
            max_total, jnp.asarray(forced), jnp.int32(n_forced))
        eos = self.tokenizer.eos_id
        ids = [t for t in np.asarray(buf)[: int(count)].tolist() if t != eos]
        return ids, time.perf_counter() - t0

    def streaming_decode_text(self, tokens) -> str:
        """Token ids -> display text (streamingDecodeText)."""
        if not tokens:
            return ""
        return self.tokenizer.decode([int(t) for t in tokens]).strip()

    def generate_stream(self, audio, generation_parameters=None):
        """Chunk-level streaming (generateStream,
        CohereTranscribe.swift:478-530)."""
        params = generation_parameters or STTGenerateParameters(
            max_tokens=self.config.decoder.max_sequence_length)
        audio = np.asarray(audio, np.float32)
        if audio.ndim > 1:
            audio = audio.mean(axis=-1)
        chunk_s = params.chunk_duration or float(self.config.max_audio_clip_s)
        chunk = int(chunk_s * self.config.sample_rate)
        texts = []
        n_prompt = n_gen = 0
        t0 = time.perf_counter()
        for s in range(0, max(len(audio), 1), chunk):
            piece = audio[s : s + chunk]
            text, p, g = self._transcribe_chunk(piece, params)
            n_prompt += p
            n_gen += g
            if text:
                texts.append(text)
                yield {"type": "token", "text": text}
        elapsed = time.perf_counter() - t0
        yield {"type": "result", "output": STTOutput(
            text="\n".join(texts), language=params.language,
            prompt_token_count=n_prompt, generation_token_count=n_gen,
            total_time=elapsed, generation_time=elapsed)}
