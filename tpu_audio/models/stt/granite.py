"""GraniteSpeech: block-attention CTC conformer + QFormer projector + Granite LLM.

TPU-first rebuild of the reference
(Sources/MLXAudioSTT/Models/GraniteSpeech/GraniteSpeech.swift): a conformer
encoder whose attention is confined to 200-frame blocks with Shaw-style
learned relative-position embeddings (:67-160) and a mid-stack CTC
re-injection (x += out_mid(softmax(out(x))) at layer N/2, :262-273); a
BLIP-2 QFormer projector that cross-attends 3 learned queries to each
15-frame window (:280-496); and a Granite LLM (llama with embedding/
residual/attention/logits multipliers, :536-668) decoding over spliced
audio embeddings.

TPU design: the stacked-mel input is padded to a block multiple with the
true length threaded into the jitted encoder — per-block validity masks the
attention and the pad region is zeroed before each depthwise conv, so
bucket padding is exact (verified by test). The frontend stacks 2 mel
frames (max-floored log10 power mel, extractFeatures :739-775). The LLM
decode reuses the shared llama while_loop machinery.
"""

from __future__ import annotations

import functools
import json
import math
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import dsp, hub, kv_cache, loading, nn
from tpu_audio.core.ar_loop import make_decode_chunk
from tpu_audio.core.generation import STTGenerateParameters, STTOutput
from tpu_audio.core.sampling import SamplingParams
from tpu_audio.models import llama
from tpu_audio.core.jitting import ajit

__all__ = ["GraniteSpeech", "GraniteConfig"]

SAMPLE_RATE = 16000

_LANGUAGE_NAMES = {"en": "English", "fr": "French", "de": "German",
                   "es": "Spanish", "pt": "Portuguese", "ja": "Japanese"}


@dataclass
class GraniteEncoderConfig:
    input_dim: int = 160
    num_layers: int = 10
    hidden_dim: int = 1024
    feedforward_mult: int = 4
    num_heads: int = 8
    dim_head: int = 128
    output_dim: int = 42
    context_size: int = 200
    max_pos_emb: int = 512
    conv_kernel_size: int = 15
    conv_expansion_factor: int = 2

    @classmethod
    def from_dict(cls, d: dict) -> "GraniteEncoderConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass
class GraniteProjectorConfig:
    hidden_size: int = 1024
    num_hidden_layers: int = 2
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    layer_norm_eps: float = 1e-12
    encoder_hidden_size: int = 1024

    @classmethod
    def from_dict(cls, d: dict) -> "GraniteProjectorConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass
class GraniteConfig:
    encoder: GraniteEncoderConfig = field(default_factory=GraniteEncoderConfig)
    projector: GraniteProjectorConfig = field(
        default_factory=GraniteProjectorConfig)
    text: llama.LlamaConfig = field(default_factory=llama.LlamaConfig)
    audio_token_index: int = 100352
    downsample_rate: int = 5
    window_size: int = 15
    quantization: dict | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "GraniteConfig":
        tc = d.get("text_config") or {}
        text = llama.LlamaConfig.from_dict(tc)
        text.attention_multiplier = tc.get("attention_multiplier", 0.0078125)
        text.embedding_multiplier = tc.get("embedding_multiplier", 12.0)
        text.residual_multiplier = tc.get("residual_multiplier", 0.22)
        text.logits_scaling = tc.get("logits_scaling", 8.0)
        return cls(
            encoder=GraniteEncoderConfig.from_dict(d.get("encoder_config") or {}),
            projector=GraniteProjectorConfig.from_dict(
                d.get("projector_config") or {}),
            text=text,
            audio_token_index=d.get("audio_token_index", 100352),
            downsample_rate=d.get("downsample_rate", 5),
            window_size=d.get("window_size", 15),
            quantization=d.get("quantization"),
        )


# ---------------------------------------------------------------------------
# Audio frontend (extractFeatures, GraniteSpeech.swift:739-790)
# ---------------------------------------------------------------------------


@ajit
def _granite_mel(audio):
    """Max-floored log10 power mel, 2-frame stacked -> [T/2, 160]."""
    x = audio.astype(jnp.float32)
    n_fft, win, hop, n_mels = 512, 400, 160, 80
    base = 0.5 * (1 - jnp.cos(2 * jnp.pi * jnp.arange(win) / win))  # periodic
    left = (n_fft - win) // 2
    window = jnp.zeros(n_fft).at[left : left + win].set(base)
    spec = dsp.stft(x, window, n_fft, hop, pad_mode="reflect")
    power = jnp.abs(spec) ** 2
    filters = jnp.asarray(dsp.mel_filters(SAMPLE_RATE, n_fft, n_mels,
                                          norm=None, mel_scale="htk"))
    logmel = jnp.log10(jnp.clip(power @ filters, 1e-10))
    logmel = jnp.maximum(logmel, logmel.max() - 8.0) / 4.0 + 1.0
    t = (logmel.shape[0] // 2) * 2
    return logmel[:t].reshape(t // 2, 2 * n_mels)


# ---------------------------------------------------------------------------
# CTC conformer encoder
# ---------------------------------------------------------------------------


def _block_attention(p, x, cfg: GraniteEncoderConfig, block_valid):
    """Attention within context_size blocks with Shaw relative-position
    embeddings (GraniteSpeechConformerAttention, GraniteSpeech.swift:67-160).
    ``block_valid``: [n_blocks, C] bool validity per block."""
    x = nn.layer_norm(p["pre_norm"], x)
    b, t, _ = x.shape
    cs = cfg.context_size
    nb = t // cs
    nh, hd = cfg.num_heads, cfg.dim_head
    q = nn.linear(p["to_q"], x)
    k, v = jnp.split(nn.linear(p["to_kv"], x), 2, axis=-1)
    q = q.reshape(b, nb, cs, nh, hd).transpose(0, 1, 3, 2, 4)
    k = k.reshape(b, nb, cs, nh, hd).transpose(0, 1, 3, 2, 4)
    v = v.reshape(b, nb, cs, nh, hd).transpose(0, 1, 3, 2, 4)
    scale = hd ** -0.5
    # distance ids: clip(i-j, +-cs) + max_pos_emb (constant)
    seq = np.arange(cs)
    dists = np.clip(seq[:, None] - seq[None, :], -cs, cs) + cfg.max_pos_emb
    rel = p["rel_pos_emb"]["weight"][jnp.asarray(dists)]  # [C, C, hd]
    pos_attn = jnp.einsum("bnhid,ijd->bnhij", q, rel.astype(x.dtype),
                          preferred_element_type=jnp.float32) * scale
    scores = jnp.einsum("bnhid,bnhjd->bnhij", q, k,
                        preferred_element_type=jnp.float32) * scale + pos_attn
    pair_ok = block_valid[:, :, None] & block_valid[:, None, :]
    scores = jnp.where(pair_ok[None, :, None], scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    o = jnp.einsum("bnhij,bnhjd->bnhid", probs, v)
    o = o.transpose(0, 1, 3, 2, 4).reshape(b, t, nh * hd)
    return nn.linear(p["to_out"], o)


def _conv_module(p, x, cfg: GraniteEncoderConfig, valid):
    """GLU conv with asymmetric-for-even padding
    (GraniteSpeechConformerConvModule, GraniteSpeech.swift:162-220)."""
    h = nn.layer_norm(p["norm"], x)
    h = nn.conv1d(p["up_conv"], h)
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(g)
    h = jnp.where(valid[..., None], h, 0)  # pad must not leak into the conv
    ks = cfg.conv_kernel_size
    pad_l = ks // 2
    pad_r = pad_l - (ks + 1) % 2
    h = jnp.pad(h, ((0, 0), (pad_l, pad_r), (0, 0)))
    h = nn.conv1d(p["depth_conv"]["conv"], h, groups=h.shape[-1])
    h = nn.silu(nn.batch_norm(p["batch_norm"], h))
    return nn.conv1d(p["down_conv"], h)


def _ff(p, x):
    return nn.linear(p["down_proj"],
                     nn.silu(nn.linear(p["up_proj"],
                                       nn.layer_norm(p["pre_norm"], x))))


def encoder_forward(params, feats, lengths, cfg: GraniteEncoderConfig):
    """feats [B, T, input_dim] (T a multiple of context_size) + valid length
    -> [B, T, hidden] (GraniteSpeechCTCEncoder, GraniteSpeech.swift:244-277)."""
    p = params["encoder"]
    x = nn.linear(p["input_linear"], feats)
    t = x.shape[1]
    cs = cfg.context_size
    pos = jnp.arange(t).reshape(t // cs, cs)
    block_valid = pos < lengths[:, None, None][0]  # [nb, C]
    valid = (jnp.arange(t) < lengths[:, None])  # [B, T]
    for i in range(cfg.num_layers):
        lp = p["layers"][str(i)]
        x = x + 0.5 * _ff(lp["ff1"], x)
        x = x + _block_attention(lp["attn"], x, cfg, block_valid)
        x = x + _conv_module(lp["conv"], x, cfg, valid)
        x = x + 0.5 * _ff(lp["ff2"], x)
        x = nn.layer_norm(lp["post_norm"], x)
        if i + 1 == cfg.num_layers // 2:
            mid = jax.nn.softmax(nn.linear(p["out"], x), axis=-1)
            x = x + nn.linear(p["out_mid"], mid)
    return x


# ---------------------------------------------------------------------------
# QFormer projector (GraniteSpeechEncoderProjector, GraniteSpeech.swift:280-496)
# ---------------------------------------------------------------------------


def _qformer_attn(p, x, kv, n_heads: int):
    b, l, d = x.shape
    hd = d // n_heads
    q = nn.linear(p["attention"]["query"], x).reshape(b, l, n_heads, hd)
    k = nn.linear(p["attention"]["key"], kv).reshape(b, kv.shape[1], n_heads, hd)
    v = nn.linear(p["attention"]["value"], kv).reshape(b, kv.shape[1], n_heads, hd)
    o = nn.sdpa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3))
    o = o.transpose(0, 2, 1, 3).reshape(b, l, d)
    h = nn.linear(p["output"]["dense"], o) + x
    return nn.layer_norm(p["output"]["LayerNorm"], h, eps=1e-12)


def projector_forward(params, enc_out, cfg: GraniteConfig):
    """Windowed QFormer: [B, T, D] -> [B, nblocks*num_queries, llm_dim]."""
    p = params["projector"]
    pc = cfg.projector
    b, t, d = enc_out.shape
    ws = cfg.window_size
    nq = ws // cfg.downsample_rate
    nblocks = math.ceil(t / ws)
    pad = nblocks * ws - t
    h = jnp.pad(enc_out, ((0, 0), (0, pad), (0, 0)))
    h = h.reshape(b * nblocks, ws, d)
    q = jnp.broadcast_to(p["query"].astype(h.dtype),
                         (b * nblocks, nq, pc.hidden_size))
    x = nn.layer_norm(p["qformer"]["layernorm"], q, eps=pc.layer_norm_eps)
    for i in range(pc.num_hidden_layers):
        lp = p["qformer"]["encoder"]["layer"][str(i)]
        x = _qformer_attn(lp["attention"], x, x, pc.num_attention_heads)
        x = _qformer_attn(lp["crossattention"], x, h, pc.num_attention_heads)
        inter = nn.gelu(nn.linear(lp["intermediate_query"]["dense"], x))
        y = nn.linear(lp["output_query"]["dense"], inter) + x
        x = nn.layer_norm(lp["output_query"]["LayerNorm"], y,
                          eps=pc.layer_norm_eps)
    x = x.reshape(b, nblocks * nq, -1)
    return nn.linear(p["linear"], x)


# ---------------------------------------------------------------------------
# Weight sanitization (GraniteSpeechModel.sanitize)
# ---------------------------------------------------------------------------


def sanitize(weights):
    out = {}
    for k, v in weights.items():
        if "num_batches_tracked" in k or "rotary_emb.inv_freq" in k:
            continue
        if k.endswith(".weight") and v.ndim == 3 and (
                "up_conv" in k or "down_conv" in k or "depth_conv" in k):
            if "depth_conv" in k:
                if v.shape[2] == 1 and v.shape[1] > 1:  # MLX [C,K,1]
                    v = v.transpose(0, 2, 1)
            elif v.shape[1] == 1 and v.shape[2] > 1:  # MLX [O,1,I] pointwise
                v = v.transpose(0, 2, 1)
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


class GraniteSpeech:
    def __init__(self, config: GraniteConfig, params, tokenizer=None,
                 eos_token_id: int = 0, dtype=jnp.bfloat16):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.eos_token_id = eos_token_id
        self.dtype = dtype
        self._encoder = ajit(
            functools.partial(encoder_forward, cfg=config.encoder))
        self._projector = ajit(
            functools.partial(projector_forward, cfg=config))
        self._prefill = ajit(
            lambda p, embeds, cache: llama.forward(
                p["language_model"], None, cache, config.text,
                inputs_embeds=embeds),
            donate_argnums=(2,))

        def step_fn(p, tok, cache):
            logits, cache = llama.forward(p["language_model"], tok, cache,
                                          config.text)
            return logits[:, -1], cache

        self._step_fn = step_fn
        self._decoders = {}

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.bfloat16):
        from pathlib import Path

        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = GraniteConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        if "language_model" in params:
            params["language_model"] = llama.maybe_stack(
                params["language_model"])
        if config.quantization:
            from tpu_audio.core import quant

            q = config.quantization
            params = quant.tag_quantized(params, q.get("group_size", 64),
                                         q.get("bits", 4))
        if "language_model" in params:
            # fuse AFTER quant tagging: fusing raw packed uint32 triples
            # would drop their scales/biases
            params["language_model"] = llama.fuse_projections(
                params["language_model"])
        tokenizer = None
        eos = 0
        if (model_dir / "tokenizer.json").exists():
            from tokenizers import Tokenizer

            tokenizer = Tokenizer.from_file(str(model_dir / "tokenizer.json"))
            tcfg_path = model_dir / "tokenizer_config.json"
            tcfg = (json.loads(tcfg_path.read_text())
                    if tcfg_path.exists() else {})
            eos_tok = tcfg.get("eos_token")
            if isinstance(eos_tok, dict):
                eos_tok = eos_tok.get("content")
            if eos_tok:
                enc = tokenizer.encode(eos_tok).ids
                if len(enc) == 1:
                    eos = enc[0]
        return cls(config, params, tokenizer, eos, dtype)

    # -- audio path ----------------------------------------------------------

    def extract_features(self, audio: np.ndarray):
        """-> (stacked mel [T, 160], num_audio_tokens)."""
        feats = np.asarray(_granite_mel(jnp.asarray(audio, jnp.float32)))
        t = feats.shape[0]
        nblocks = math.ceil(t / self.config.window_size)
        n_tokens = nblocks * (self.config.window_size
                              // self.config.downsample_rate)
        return feats, n_tokens

    def encode_audio(self, feats: np.ndarray) -> np.ndarray:
        """stacked mel [T, 160] -> projected audio embeds [n_tokens, llm_d]."""
        t = feats.shape[0]
        cs = self.config.encoder.context_size
        bucket = cs * max(1, math.ceil(t / cs))
        padded = np.zeros((1, bucket, feats.shape[1]), np.float32)
        padded[0, :t] = feats
        enc = self._encoder(self.params, jnp.asarray(padded, self.dtype),
                            jnp.asarray([t], jnp.int32))
        enc = enc[:, :t]  # valid frames only; projector windows on true length
        return np.asarray(self._projector(self.params, enc).astype(jnp.float32))[0]

    # -- prompt --------------------------------------------------------------

    def build_prompt(self, num_audio_tokens: int, user_prompt: str | None,
                     language: str | None) -> list[int]:
        if user_prompt is None and language:
            name = _LANGUAGE_NAMES.get(language.lower(), language)
            user_prompt = f"Translate the speech to {name}."
        prompt = user_prompt or "can you transcribe the speech into a written format?"
        content = "<|audio|>" * num_audio_tokens + prompt
        text = (f"<|start_of_role|>user<|end_of_role|>{content}"
                "<|end_of_text|>\n<|start_of_role|>assistant<|end_of_role|>")
        ids = self.tokenizer.encode(text).ids
        if not ids or self.config.audio_token_index not in ids:
            # tokenizer without the granite role markers: plain fallback
            # (buildPrompt, GraniteSpeech.swift:794-812)
            ids = self.tokenizer.encode(f"USER: {content}\nASSISTANT:").ids
        return list(ids)

    def _merge_audio(self, ids: np.ndarray, audio_embeds: np.ndarray):
        safe = np.where(ids == self.config.audio_token_index, 0, ids)
        embeds = np.array(nn.embedding(
            self.params["language_model"]["model"]["embed_tokens"],
            jnp.asarray(safe)))
        pos = np.where(ids[0] == self.config.audio_token_index)[0]
        n = min(len(pos), audio_embeds.shape[0])
        if n:
            embeds[0, pos[:n]] = audio_embeds[:n]
        return embeds

    # -- generation ----------------------------------------------------------

    def generate(self, audio, generation_parameters=None) -> STTOutput:
        params = generation_parameters or STTGenerateParameters(max_tokens=448)
        if self.tokenizer is None:
            raise RuntimeError("tokenizer not loaded")
        t0 = time.perf_counter()
        audio = np.asarray(audio, np.float32)
        if audio.ndim > 1:
            audio = audio.mean(axis=-1)
        feats, n_tokens = self.extract_features(audio)
        audio_embeds = self.encode_audio(feats)
        ids = np.asarray([self.build_prompt(
            n_tokens, params.extra.get("prompt"), params.language)], np.int32)
        embeds = self._merge_audio(ids, audio_embeds)
        tcfg = self.config.text
        prefill_len = embeds.shape[1] - 1
        cache = llama.make_cache(
            tcfg, 1, ids.shape[1] + params.max_tokens + 1, self.dtype,
            kv_bits=params.kv_bits, kv_group_size=params.kv_group_size,
            quantized_kv_start=(max(params.quantized_kv_start, prefill_len)
                                if params.quantized_kv_start else 0))
        _, cache = self._prefill(self.params,
                                 jnp.asarray(embeds[:, :-1], self.dtype), cache)
        key = (params.temperature,)
        if key not in self._decoders:
            self._decoders[key] = make_decode_chunk(
                self._step_fn,
                SamplingParams(temperature=params.temperature,
                               repetition_penalty=1.0),
                history_size=1)
        buf = jnp.zeros((params.max_tokens,), jnp.int32)
        hist = jnp.zeros((1, 1), jnp.int32)
        tokens, count, *_ = self._decoders[key](
            self.params, cache, jnp.asarray(ids[0, -1:], jnp.int32), buf,
            jax.random.PRNGKey(0), jnp.int32(self.eos_token_id), hist,
            jnp.int32(0))
        gen = [t for t in np.asarray(tokens)[: int(count)].tolist()
               if t != self.eos_token_id]
        text = self.tokenizer.decode(gen, skip_special_tokens=True).strip()
        elapsed = time.perf_counter() - t0
        return STTOutput(text=text, language=params.language,
                         prompt_token_count=ids.shape[1],
                         generation_token_count=len(gen),
                         total_time=elapsed, generation_time=elapsed)

    def generate_stream(self, audio, generation_parameters=None):
        out = self.generate(audio, generation_parameters)
        yield {"type": "token", "text": out.text}
        yield {"type": "result", "output": out}
