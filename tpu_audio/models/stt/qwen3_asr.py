"""Qwen3-ASR: block-attention audio tower + Qwen3 text LM.

TPU-first rebuild of the reference
(Sources/MLXAudioSTT/Models/Qwen3ASR/Qwen3ASR.swift): conv2d x3 (stride 2 in
time and frequency) frontend + sinusoidal positions + transformer layers with
full attention *within* 800-frame windows only (:390-650) — windows encode
independently, the property that enables streaming. Audio embeddings are
spliced over the contiguous ``<|audio_pad|>`` placeholder run (:1015-1053)
and decoding runs on the shared Llama/Qwen3 backbone with the generic
chunked ``lax.while_loop`` decoder.

Window encoding is jitted per chunk-count bucket: mel windows are split into
100-frame conv chunks, padded to a fixed chunk count, conv+transformer run
batched over chunks with a validity mask.
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
from tpu_audio.core.ar_loop import make_decode_chunk
from tpu_audio.core.generation import STTGenerateParameters, STTOutput, STTSegment
from tpu_audio.core.sampling import SamplingParams
from tpu_audio.models import llama
from tpu_audio.core.jitting import ajit

__all__ = ["Qwen3ASR", "Qwen3ASRConfig", "split_audio_into_chunks"]

SAMPLE_RATE = 16000


def split_audio_into_chunks(
    audio: np.ndarray,
    sample_rate: int,
    chunk_duration: float = 1200.0,
    min_chunk_duration: float = 1.0,
    search_expand_sec: float = 5.0,
    min_window_ms: float = 100.0,
) -> list[tuple[np.ndarray, float]]:
    """Split long audio at low-energy points into <= chunk_duration pieces.

    Energy-based chunker matching the reference's ``splitAudioIntoChunks``
    (Qwen3ASR.swift:156-268): around each nominal cut point a +/-
    ``search_expand_sec`` window is scanned with a ``min_window_ms`` sliding
    energy window and the cut lands at the quietest point, so chunks break
    at pauses rather than mid-word. Chunks shorter than
    ``min_chunk_duration`` are zero-padded up to it. Returns
    ``[(chunk, offset_seconds), ...]``.
    """
    wav = np.asarray(audio, np.float32)
    if wav.ndim > 1:
        wav = wav.mean(axis=-1)
    total = len(wav)
    total_sec = total / sample_rate
    min_samples = int(min_chunk_duration * sample_rate)

    def padded(chunk: np.ndarray) -> np.ndarray:
        if len(chunk) < min_samples:
            chunk = np.pad(chunk, (0, min_samples - len(chunk)))
        return chunk

    if total_sec <= chunk_duration:
        return [(padded(wav), 0.0)]

    chunks: list[tuple[np.ndarray, float]] = []
    max_chunk = int(chunk_duration * sample_rate)
    search = int(search_expand_sec * sample_rate)
    win = int(min_window_ms * sample_rate / 1000.0)
    start = 0
    while start < total:
        end = min(start + max_chunk, total)
        if end >= total:
            chunks.append((padded(wav[start:]), start / sample_rate))
            break
        lo = max(start, end - search)
        hi = min(total, end + search)
        if hi - lo > win:
            region = wav[lo:hi]
            # sliding mean energy via cumulative sum (O(n))
            csum = np.concatenate([[0.0], np.cumsum(region.astype(np.float64) ** 2)])
            energy = (csum[win:] - csum[:-win]) / win
            cut = lo + int(np.argmin(energy)) + win // 2
        else:
            cut = end
        cut = max(cut, start + sample_rate)
        chunks.append((padded(wav[start:min(cut, total)]), start / sample_rate))
        start = cut
    return chunks


@dataclass
class AudioEncoderConfig:
    d_model: int = 1280
    encoder_layers: int = 32
    encoder_attention_heads: int = 20
    encoder_ffn_dim: int = 5120
    downsample_hidden_size: int = 480
    num_mel_bins: int = 128
    output_dim: int = 2048
    n_window: int = 50
    n_window_infer: int = 800
    max_source_positions: int = 1500
    conv_chunksize: int = 500

    @classmethod
    def from_dict(cls, d: dict) -> "AudioEncoderConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass
class Qwen3ASRConfig:
    audio: AudioEncoderConfig = field(default_factory=AudioEncoderConfig)
    text: llama.LlamaConfig = field(default_factory=llama.LlamaConfig)
    audio_token_id: int = 151646
    support_languages: list = field(default_factory=list)
    quantization: dict | None = None
    # forced-aligner head (Qwen3ForcedAligner.swift:336-358)
    classify_num: int = 5000
    timestamp_token_id: int = 151705
    timestamp_segment_time: float = 80.0

    @classmethod
    def from_dict(cls, d: dict) -> "Qwen3ASRConfig":
        audio = AudioEncoderConfig.from_dict(d.get("audio_config") or {})
        text_cfg = llama.LlamaConfig.from_dict(d.get("text_config") or {})
        text_cfg.qk_norm = True  # Qwen3 attention
        return cls(
            audio=audio, text=text_cfg,
            audio_token_id=d.get("audio_token_id", 151646),
            support_languages=d.get("support_languages") or [],
            quantization=d.get("quantization"),
            classify_num=d.get("classify_num", 5000),
            timestamp_token_id=d.get("timestamp_token_id", 151705),
            timestamp_segment_time=d.get("timestamp_segment_time", 80.0),
        )


def feat_extract_output_lengths(lengths):
    """3x stride-2 conv output lengths (Qwen3ASR.swift:100-109)."""
    out = lengths
    for _ in range(3):
        out = (out + 1) // 2
    return out


def _sinusoid_pe(length: int, channels: int) -> np.ndarray:
    half = channels // 2
    log_inc = math.log(10000.0) / max(half - 1, 1)
    scaled = np.arange(length)[:, None] * np.exp(-log_inc * np.arange(half))[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def _encoder_layer(p, x, cfg: AudioEncoderConfig, mask=None):
    """Pre-LN transformer layer (Qwen3ASRAudioEncoderLayer)."""
    h = nn.layer_norm(p["self_attn_layer_norm"], x)
    b, t, d = h.shape
    n_heads = cfg.encoder_attention_heads
    hd = d // n_heads
    ap = p["self_attn"]
    q = nn.linear(ap["q_proj"], h).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
    k = nn.linear(ap["k_proj"], h).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
    v = nn.linear(ap["v_proj"], h).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
    o = nn.sdpa(q, k, v, mask=mask)
    x = x + nn.linear(ap["out_proj"], o.transpose(0, 2, 1, 3).reshape(b, t, d))
    h = nn.layer_norm(p["final_layer_norm"], x)
    x = x + nn.linear(p["fc2"], nn.gelu(nn.linear(p["fc1"], h)))
    return x


def encode_window(params, mel_chunks, valid_tokens, cfg: AudioEncoderConfig):
    """Encode one <=n_window_infer-frame window.

    ``mel_chunks``: [n_chunks, chunk_frames(=2*n_window), n_mels] conv chunks
    (zero-padded); ``valid_tokens``: total valid encoder tokens across chunks.
    Returns [n_chunks * tokens_per_chunk, output_dim] (valid prefix semantics
    apply per chunk; callers slice with the per-chunk valid counts).
    """
    p = params["audio_tower"] if "audio_tower" in params else params
    x = mel_chunks.transpose(0, 2, 1)[..., None]  # [N, n_mels, T, 1] NHWC
    x = nn.gelu(nn.conv2d(p["conv2d1"], x, stride=(2, 2), padding=(1, 1)))
    x = nn.gelu(nn.conv2d(p["conv2d2"], x, stride=(2, 2), padding=(1, 1)))
    x = nn.gelu(nn.conv2d(p["conv2d3"], x, stride=(2, 2), padding=(1, 1)))
    n, f, t, c = x.shape
    x = x.transpose(0, 2, 3, 1).reshape(n, t, c * f)
    x = nn.linear(p["conv_out"], x)  # [N, t, d_model]
    pe = jnp.asarray(_sinusoid_pe(t, x.shape[-1]), x.dtype)
    x = x + pe[None]
    # flatten chunks -> one window sequence, full attention inside the window
    x = x.reshape(1, n * t, -1)
    token_pos = jnp.arange(n * t)
    mask = (token_pos[None, :] < valid_tokens) & (token_pos[:, None] < valid_tokens)
    mask = mask[None, None]
    for i in range(cfg.encoder_layers):
        x = _encoder_layer(p["layers"][str(i)], x, cfg, mask=mask)
    x = nn.layer_norm(p["ln_post"], x)
    x = nn.gelu(nn.linear(p["proj1"], x))
    x = nn.linear(p["proj2"], x)
    return x[0]  # [n*t, output_dim]


class Qwen3ASR:
    def __init__(self, config: Qwen3ASRConfig, params, tokenizer=None,
                 dtype=jnp.bfloat16):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.dtype = dtype
        self._encode_window = ajit(
            functools.partial(encode_window, cfg=config.audio))
        self._prefill = ajit(
            lambda p, embeds, cache: llama.forward(
                p, None, cache, config.text, inputs_embeds=embeds),
            donate_argnums=(2,))

        def step_fn(p, tok, cache):
            logits, cache = llama.forward(p, tok, cache, config.text)
            return logits[:, -1], cache

        self._step_fn = step_fn
        self._decoders = {}

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.bfloat16) -> "Qwen3ASR":
        from pathlib import Path

        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = Qwen3ASRConfig.from_dict(hub.load_config(model_dir))

        def sanitize(w):
            out = {}
            for k, v in w.items():
                if "rotary_emb.inv_freq" in k:
                    continue
                # strip the HF "thinker." wrapper if present
                if k.startswith("thinker."):
                    k = k[len("thinker."):]
                out[k] = v
            return out

        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        params = llama.maybe_stack(params)  # text LM under params["model"]
        if config.quantization:
            from tpu_audio.core import quant

            q = config.quantization
            params = quant.tag_quantized(params, q.get("group_size", 64),
                                         q.get("bits", 4))
        # fuse AFTER quant tagging: fusing raw packed uint32 triples would
        # drop their scales/biases
        params = llama.fuse_projections(params)
        tokenizer = None
        if (model_dir / "tokenizer.json").exists():
            from tokenizers import Tokenizer

            tokenizer = Tokenizer.from_file(str(model_dir / "tokenizer.json"))
        return cls(config, params, tokenizer, dtype)

    # -- audio features ---------------------------------------------------------

    def preprocess_audio(self, audio: np.ndarray):
        """-> (mel [T, n_mels], num_audio_tokens)."""
        mel = dsp.mel_spectrogram(np.asarray(audio, np.float32), SAMPLE_RATE,
                                  400, 160, self.config.audio.num_mel_bins)
        n_frames = mel.shape[0]
        return np.asarray(mel), int(feat_extract_output_lengths(np.asarray(n_frames)))

    def encode_audio(self, mel: np.ndarray) -> np.ndarray:
        """Window-wise encode: mel [T, n_mels] -> features [tokens, out_dim]
        (block attention - windows are independent, Qwen3ASR.swift:390-650)."""
        acfg = self.config.audio
        win = acfg.n_window_infer
        outs = []
        for start in range(0, mel.shape[0], win):
            outs.append(self.encode_single_window(mel[start : start + win]))
        return np.concatenate(outs, axis=0) if outs else np.zeros(
            (0, acfg.output_dim), np.float32)

    def encode_single_window(self, mel_window: np.ndarray) -> np.ndarray:
        """Encode <=800 mel frames -> [tokens, output_dim]
        (encodeSingleWindow, Qwen3ASR.swift:650-735)."""
        acfg = self.config.audio
        chunk = acfg.n_window * 2
        n_frames = mel_window.shape[0]
        n_chunks = max(1, math.ceil(n_frames / chunk))
        # pad to the full window's chunk count bucket for graph reuse
        bucket_chunks = max(1, math.ceil(acfg.n_window_infer / chunk))
        if n_chunks > bucket_chunks:
            bucket_chunks = n_chunks
        chunks = np.zeros((bucket_chunks, chunk, acfg.num_mel_bins), np.float32)
        chunk_valid = []
        for j in range(n_chunks):
            s = j * chunk
            e = min(s + chunk, n_frames)
            chunks[j, : e - s] = mel_window[s:e]
            chunk_valid.append(
                int(feat_extract_output_lengths(np.asarray(e - s))))
        tokens_per_chunk = int(feat_extract_output_lengths(np.asarray(chunk)))
        total_valid = sum(chunk_valid)
        out = np.asarray(self._encode_window(
            self.params, jnp.asarray(chunks, self.dtype),
            jnp.int32(n_chunks * tokens_per_chunk)))
        # gather valid tokens per chunk (last chunk may be partial)
        pieces = []
        for j in range(n_chunks):
            s = j * tokens_per_chunk
            pieces.append(out[s : s + chunk_valid[j]])
        return np.concatenate(pieces, axis=0)

    # -- prompt (buildPromptText, Qwen3ASR.swift:1168-1208) --------------------

    def build_prompt(self, num_audio_tokens: int, context: str = "",
                     language: str | None = None) -> list[int]:
        lang_prefix = f"language {language}<asr_text>" if language else ""
        text = (f"<|im_start|>system\n{context}<|im_end|>\n"
                "<|im_start|>user\n<|audio_start|>"
                + "<|audio_pad|>" * num_audio_tokens
                + "<|audio_end|><|im_end|>\n<|im_start|>assistant\n"
                + lang_prefix)
        return list(self.tokenizer.encode(text).ids)

    def _merge_audio_features(self, ids: np.ndarray, audio_features: np.ndarray):
        embeds = np.array(nn.embedding(
            self.params["model"]["embed_tokens"], jnp.asarray(ids)))
        mask = ids[0] == self.config.audio_token_id
        pos = np.where(mask)[0]
        if len(pos):
            n = min(len(pos), audio_features.shape[0])
            embeds[0, pos[0] : pos[0] + n] = audio_features[:n]
        return embeds

    # -- generation -------------------------------------------------------------

    def generate(self, audio: np.ndarray,
                 generation_parameters: STTGenerateParameters | None = None
                 ) -> STTOutput:
        params = generation_parameters or STTGenerateParameters(max_tokens=448)
        if self.tokenizer is None:
            raise RuntimeError("tokenizer not loaded")
        t0 = time.perf_counter()
        audio = np.asarray(audio, np.float32)
        if audio.ndim > 1:
            audio = audio.mean(axis=-1)
        chunk_s = params.chunk_duration or 1200.0
        texts, segments = [], []
        total_prompt = total_gen = 0
        language = None
        if len(audio) == 0:
            audio = np.zeros(1, np.float32)
        total_duration = len(audio) / SAMPLE_RATE
        for piece, offset in split_audio_into_chunks(
                audio, SAMPLE_RATE, chunk_duration=chunk_s):
            text, lang, n_prompt, n_gen = self._generate_chunk(piece, params)
            total_prompt += n_prompt
            total_gen += n_gen
            if language is None:
                language = lang
            if text:
                texts.append(text)
                # chunks can be zero-padded up to min_chunk_duration; clamp
                # the end to the real audio so padding never inflates it
                segments.append(STTSegment(
                    text=text, start=offset,
                    end=min(offset + len(piece) / SAMPLE_RATE,
                            total_duration)))
        elapsed = time.perf_counter() - t0
        return STTOutput(
            text=" ".join(texts), segments=segments, language=language,
            prompt_token_count=total_prompt, generation_token_count=total_gen,
            total_time=elapsed, generation_time=elapsed)

    def _generate_chunk(self, audio, params: STTGenerateParameters):
        mel, _ = self.preprocess_audio(audio)
        feats = self.encode_audio(mel)
        return self.decode_features(feats, params)

    def decode_features(self, feats: np.ndarray, params: STTGenerateParameters):
        """Decode encoder features -> (text, language, n_prompt, n_gen)."""
        gen, n_prompt = self.decode_features_tokens(feats, params)
        decoded = self.tokenizer.decode(gen, skip_special_tokens=True)
        lang, text = self._parse_output(decoded, params.language)
        return text, lang, n_prompt, len(gen)

    def decode_features_tokens(self, feats: np.ndarray,
                               params: STTGenerateParameters,
                               forced_tokens=None):
        """Decode encoder features -> (token ids incl. the forced prefix,
        n_prompt). ``forced_tokens`` teacher-forces previously confirmed
        tokens so the pass extends them (the streaming session's confirmed
        prefix, decodeAllTokenIds in StreamingInferenceSession.swift)."""
        forced = [int(t) for t in (forced_tokens or [])]
        ids = np.asarray([self.build_prompt(feats.shape[0],
                                            language=params.language)
                          + forced], np.int32)
        embeds = self._merge_audio_features(ids, feats)
        tcfg = self.config.text
        max_total = ids.shape[1] + params.max_tokens + 1
        prefill_len = embeds.shape[1] - 1
        cache = llama.make_cache(
            tcfg, 1, max_total, self.dtype, kv_bits=params.kv_bits,
            kv_group_size=params.kv_group_size,
            # round the dense/quant split up so the prefill write does not
            # straddle the hybrid boundary
            quantized_kv_start=(max(params.quantized_kv_start, prefill_len)
                                if params.quantized_kv_start else 0))
        _, cache = self._prefill(self.params, jnp.asarray(embeds[:, :-1], self.dtype),
                                 cache)
        key = (params.temperature,)
        if key not in self._decoders:
            self._decoders[key] = make_decode_chunk(
                self._step_fn,
                SamplingParams(temperature=params.temperature,
                               repetition_penalty=1.0),
                history_size=1)
        decoder = self._decoders[key]
        eos_ids = (151645, 151643)
        buf = jnp.zeros((params.max_tokens,), jnp.int32)
        hist = jnp.zeros((1, 1), jnp.int32)
        tokens, count, *_ = decoder(
            self.params, cache, jnp.asarray(ids[0, -1:], jnp.int32), buf,
            jax.random.PRNGKey(0), jnp.int32(eos_ids[0]), hist, jnp.int32(0))
        gen = np.asarray(tokens)[: int(count)].tolist()
        gen = [t for t in gen if t not in eos_ids]
        return forced + gen, ids.shape[1] - len(forced)

    @staticmethod
    def _parse_output(decoded: str, forced_language: str | None):
        """``language X<asr_text>transcript`` parsing
        (extractLanguage, Qwen3ASR.swift:1085-1101)."""
        text = decoded.strip()
        if forced_language:
            marker = "<asr_text>"
            if marker in text:
                text = text.split(marker, 1)[1].strip()
            return forced_language, text
        if text.startswith("language ") and "<asr_text>" in text:
            head, _, rest = text.partition("<asr_text>")
            return head[len("language "):].strip() or None, rest.strip()
        return ("English", text) if text else (None, "")

    def generate_stream(self, audio, generation_parameters=None):
        out = self.generate(audio, generation_parameters)
        yield {"type": "token", "text": out.text}
        yield {"type": "result", "output": out}
