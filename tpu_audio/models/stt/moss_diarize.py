"""MOSS-Transcribe-Diarize: joint timestamped transcription + speaker labels.

TPU-first rebuild of the reference
(Sources/MLXAudioSTT/Models/MossTranscribeDiarize/MossTranscribeDiarize.swift):
a Whisper encoder over 30 s chunks, a 4x time-merge + MLP "VQ adaptor" into
the LM space (MossTranscribeDiarize.swift:88-134), and a Qwen3 decoder that
emits ``[12.34][S01] text [15.60]`` style diarized segments. The audio span
in the prompt interleaves literal digit tokens as time markers every 5 s
(audioSpanIds, MossTranscribeDiarize.swift:521-560).

TPU design deltas from the reference:
- The reference's per-token decode loop syncs the host every token
  (``.item()``, MossTranscribeDiarize.swift:757-800); here decode is one
  jitted ``lax.while_loop`` with an on-device multi-EOS stop AND the
  reference's degenerate-tail guard (<=3 unique tokens in the last 24,
  MossTranscribeDiarize.swift:767-772) computed via an on-device ring
  buffer + sort instead of a host-side ``Set``.
- Whisper chunks are padded to the fixed 30 s shape so every chunk reuses
  one compiled encoder graph.
"""

from __future__ import annotations

import functools
import re
import time
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import dsp, hub, loading, nn
from tpu_audio.core.generation import (
    STTGenerateParameters,
    STTOutput,
    STTSegment,
)
from tpu_audio.models import llama
from tpu_audio.models.stt import whisper as whisper_mod
from tpu_audio.core.jitting import ajit

__all__ = ["MossTranscribeDiarize", "MossTranscribeDiarizeConfig"]

SAMPLE_RATE = 16000
HOP_LENGTH = 160
CHUNK_SAMPLES = 30 * SAMPLE_RATE
ENCODER_STRIDE = 2  # conv2 stride inside the whisper encoder

AUDIO_PAD = "<|audio_pad|>"
AUDIO_START = "<|audio_start|>"
AUDIO_END = "<|audio_end|>"

DEFAULT_PROMPT = (
    "Transcribe the audio into text. Start each segment with the start "
    "timestamp and speaker label ([S01], [S02], [S03], ...), write the "
    "corresponding spoken content, and end each segment with the ending "
    "timestamp to clearly mark the segment range."
)

_TS_TAG = re.compile(r"\[(\d+(?:[.,]\d+)?)\]")
_SEGMENT = re.compile(
    r"\[(\d+(?:[.,]\d+)?)\]\[(S\d+)\](.*?)\[(\d+(?:[.,]\d+)?)\]", re.DOTALL
)


@dataclass
class MossTranscribeDiarizeConfig:
    """MossTranscribeDiarizeConfig.swift:4-103."""

    text: llama.LlamaConfig = field(default_factory=llama.LlamaConfig)
    audio: whisper_mod.WhisperConfig = field(
        default_factory=whisper_mod.WhisperConfig)
    audio_token_id: int = 151671
    audio_merge_size: int = 4
    sample_rate: int = 16000
    quantization: dict | None = None
    # processor_config.json knobs (loadProcessorConfig,
    # MossTranscribeDiarize.swift:1071-1089)
    audio_tokens_per_second: float = 12.5
    time_marker_every_seconds: int = 5
    enable_time_marker: bool = True

    @classmethod
    def from_dict(cls, d: dict) -> "MossTranscribeDiarizeConfig":
        text = llama.LlamaConfig.from_dict(d.get("text_config") or {})
        text.qk_norm = True  # Qwen3 attention
        text.tie_word_embeddings = d.get("tie_word_embeddings", True)
        audio = whisper_mod.WhisperConfig.from_dict(
            d.get("audio_config")
            or {
                "num_mel_bins": 80,
                "d_model": 1024,
                "encoder_layers": 24,
                "encoder_attention_heads": 16,
                "encoder_ffn_dim": 4096,
                "max_source_positions": 1500,
            }
        )
        return cls(
            text=text,
            audio=audio,
            audio_token_id=d.get("audio_token_id", 151671),
            audio_merge_size=d.get("audio_merge_size", 4),
            sample_rate=d.get("sample_rate", 16000),
            quantization=d.get("quantization")
            or d.get("quantization_config"),
        )


_VQ_IDX = {"0": "fc1", "2": "fc2", "3": "norm"}


def sanitize(weights: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """MossTranscribeDiarize.swift:951-995: fix the ``vq_adwaptor`` typo,
    collapse Sequential nesting to fc1/fc2/norm, re-root the whisper encoder
    and language model, transpose MLX conv layouts."""
    out = {}
    for k, v in weights.items():
        if k == "lm_head.weight":
            # dropped when tied (reference skips it unconditionally)
            out["language_model.lm_head.weight"] = v
            continue
        k = k.replace("model.vq_adwaptor.", "model.vq_adaptor.")
        if k.startswith("model.vq_adaptor."):
            rest = k[len("model.vq_adaptor."):]
            parts = [p for p in rest.split(".") if p != "layers"]
            if parts and parts[0] in _VQ_IDX:
                out[f"vq_adaptor.{_VQ_IDX[parts[0]]}.{'.'.join(parts[1:])}"] = v
            continue
        if k.startswith("model.whisper_encoder."):
            k = "whisper.model.encoder." + k[len("model.whisper_encoder."):]
            # MLX conv layout [O, K, I] -> torch [O, I, K]
            if "conv" in k and k.endswith(".weight") and v.ndim == 3 \
                    and v.shape[1] < v.shape[2]:
                v = np.transpose(v, (0, 2, 1))
            out[k] = v
            continue
        if k.startswith("model.language_model."):
            out["language_model.model." + k[len("model.language_model."):]] = v
            continue
        out[k] = v
    return out


def _adaptor_forward(params, feats, merge: int):
    """Time-merge by ``merge`` then Linear-SiLU-Linear-LayerNorm
    (timeMerge + MossTranscribeDiarizeVQAdaptor,
    MossTranscribeDiarize.swift:88-134). feats [T, D] -> [T//merge, lm_d]."""
    t, d = feats.shape
    n = t // merge
    merged = feats[: n * merge].reshape(n, merge * d)
    p = params["vq_adaptor"]
    h = nn.silu(nn.linear(p["fc1"], merged))
    h = nn.linear(p["fc2"], h)
    return nn.layer_norm(p["norm"], h)


class MossTranscribeDiarize:
    eos_token_ids = (151643, 151645)

    def __init__(self, config: MossTranscribeDiarizeConfig, params,
                 tokenizer=None, dtype=jnp.bfloat16):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.dtype = dtype
        self.sample_rate = config.sample_rate
        self._digit_ids: dict[str, int] = {}
        self._encode = ajit(functools.partial(
            whisper_mod.encoder_forward, cfg=config.audio))
        self._prefill = ajit(
            lambda p, embeds, cache: llama.forward(
                p, None, cache, config.text, inputs_embeds=embeds),
            donate_argnums=(2,))
        self._loops: dict = {}
        if tokenizer is not None:
            self._init_digit_ids()

    # -- loading ---------------------------------------------------------------

    @classmethod
    def from_pretrained(cls, repo_or_path: str,
                        dtype=jnp.bfloat16) -> "MossTranscribeDiarize":
        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        cfg_dict = hub.load_config(model_dir)
        config = MossTranscribeDiarizeConfig.from_dict(cfg_dict)
        proc = model_dir / "processor_config.json"
        if proc.exists():
            import json

            pd = json.loads(proc.read_text())
            config.audio_tokens_per_second = pd.get(
                "audio_tokens_per_second", config.audio_tokens_per_second)
            config.time_marker_every_seconds = pd.get(
                "time_marker_every_seconds", config.time_marker_every_seconds)
            config.enable_time_marker = pd.get(
                "enable_time_marker", config.enable_time_marker)
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        if "whisper" in params:  # scan-over-layers layout (see whisper.py)
            params["whisper"] = loading.stack_layer_params(params["whisper"])
        if "language_model" in params:
            params["language_model"] = llama.maybe_stack(
                params["language_model"])
        if config.text.tie_word_embeddings:
            params.get("language_model", {}).pop("lm_head", None)
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
        if (model_dir / "tokenizer.json").exists():
            from tokenizers import Tokenizer

            tokenizer = Tokenizer.from_file(str(model_dir / "tokenizer.json"))
        return cls(config, params, tokenizer, dtype)

    def _init_digit_ids(self):
        """initializeDigitTokenIds (MossTranscribeDiarize.swift:1091-1104)."""
        for digit in "0123456789":
            enc = self.tokenizer.encode(digit).ids
            if len(enc) == 1:
                self._digit_ids[digit] = enc[0]

    # -- audio frontend ----------------------------------------------------------

    def _audio_token_length(self, num_samples: int) -> int:
        """(numSamples-1) / (hop*stride*merge) + 1
        (computeAudioTokenLength, MossTranscribeDiarize.swift:475-478)."""
        stride = HOP_LENGTH * ENCODER_STRIDE * self.config.audio_merge_size
        return (max(1, num_samples) - 1) // stride + 1

    def encode_audio(self, audio: np.ndarray) -> np.ndarray:
        """Waveform -> LM-space audio embeds [tokens, lm_d]: 30 s whisper
        chunks, concat valid frames, time-merge, adaptor
        (getAudioFeatures, MossTranscribeDiarize.swift:136-168)."""
        audio = np.asarray(audio, np.float32).reshape(-1)
        mels, keep_frames = [], []
        for s in range(0, max(len(audio), 1), CHUNK_SAMPLES):
            piece = audio[s: s + CHUNK_SAMPLES]
            tok_len = self._audio_token_length(len(piece))
            keep_frames.append(tok_len * self.config.audio_merge_size)
            padded = np.pad(piece, (0, CHUNK_SAMPLES - len(piece)))
            mel = dsp.log_mel_spectrogram(
                padded, n_mels=self.config.audio.num_mel_bins)
            mels.append(np.asarray(mel).T)
        feats = np.asarray(self._encode(
            self.params["whisper"], jnp.asarray(np.stack(mels), self.dtype)))
        pieces = [feats[i, :n] for i, n in enumerate(keep_frames)]
        flat = jnp.asarray(np.concatenate(pieces, axis=0))
        return np.asarray(_adaptor_forward(self.params, flat,
                                           self.config.audio_merge_size))

    # -- prompt ------------------------------------------------------------------

    def _audio_span_ids(self, n_tokens: int) -> list[int]:
        """Audio pad span with literal digit-token time markers every
        ``time_marker_every_seconds`` (audioSpanIds,
        MossTranscribeDiarize.swift:521-560)."""
        cfg = self.config
        pad = cfg.audio_token_id
        if not cfg.enable_time_marker or n_tokens <= 0 \
                or cfg.time_marker_every_seconds <= 0 or not self._digit_ids:
            return [pad] * max(n_tokens, 0)
        per_marker = int(cfg.audio_tokens_per_second
                         * cfg.time_marker_every_seconds)
        if per_marker <= 0:
            return [pad] * n_tokens
        duration = n_tokens / cfg.audio_tokens_per_second
        out: list[int] = []
        consumed = 0
        seconds = cfg.time_marker_every_seconds
        while seconds <= int(duration):
            position = (seconds // cfg.time_marker_every_seconds) * per_marker
            seg = position - consumed
            if seg > 0:
                out.extend([pad] * seg)
                consumed += seg
            for digit in str(seconds):
                if digit in self._digit_ids:
                    out.append(self._digit_ids[digit])
            seconds += cfg.time_marker_every_seconds
        if n_tokens > consumed:
            out.extend([pad] * (n_tokens - consumed))
        return out

    def build_prompt(self, n_audio_tokens: int,
                     prompt: str | None = None) -> list[int]:
        """ChatML prompt with the audio span spliced over <|audio_pad|>
        (buildPrompt, MossTranscribeDiarize.swift:562-590)."""
        resolved = (prompt or "").strip() or DEFAULT_PROMPT
        if AUDIO_PAD in resolved:
            rendered = resolved
        else:
            rendered = (
                "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
                f"<|im_start|>user\n{AUDIO_START}{AUDIO_PAD}{AUDIO_END}\n"
                f"{resolved}<|im_end|>\n<|im_start|>assistant\n")
        parts = rendered.split(AUDIO_PAD)
        if len(parts) != 2:
            raise ValueError(f"expected exactly one {AUDIO_PAD} in prompt")
        return (self.tokenizer.encode(parts[0]).ids
                + self._audio_span_ids(n_audio_tokens)
                + self.tokenizer.encode(parts[1]).ids)

    def _inject_audio(self, ids: np.ndarray, audio_embeds: np.ndarray):
        """Scatter audio embeds over <|audio_pad|> positions — which are
        NON-contiguous because digit time markers interleave
        (injectAudioFeatures, MossTranscribeDiarize.swift:170-215)."""
        embeds = np.array(nn.embedding(
            self.params["language_model"]["model"]["embed_tokens"],
            jnp.asarray(ids)))
        pos = np.where(ids[0] == self.config.audio_token_id)[0]
        if len(pos) != audio_embeds.shape[0]:
            raise ValueError(
                f"audio tokens ({len(pos)}) != audio features "
                f"({audio_embeds.shape[0]})")
        embeds[0, pos] = audio_embeds.astype(embeds.dtype)
        return embeds

    # -- decode ------------------------------------------------------------------

    def _get_loop(self, max_new: int, temperature: float):
        key = (max_new, temperature)
        if key in self._loops:
            return self._loops[key]
        cfg = self.config.text
        eos = jnp.asarray(self.eos_token_ids, jnp.int32)

        def degenerate(ring):
            # <=3 unique tokens in the last 24 (reference suffix(24) check)
            s = jnp.sort(ring)
            uniq = 1 + jnp.sum((s[1:] != s[:-1]).astype(jnp.int32))
            return uniq <= 3

        def loop(params, embeds, cache, rng):
            logits, cache = llama.forward(params, None, cache, cfg,
                                          inputs_embeds=embeds)
            last_logits = logits[:, -1].astype(jnp.float32)
            if temperature > 0:
                rng, sub = jax.random.split(rng)
                first = jax.random.categorical(
                    sub, last_logits / temperature, axis=-1).astype(jnp.int32)
            else:
                first = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
            tokens = jnp.zeros((max_new,), jnp.int32)
            ring = jnp.full((24,), -1, jnp.int32)

            def cond(c):
                _, i, _, _, finished, _, _ = c
                return jnp.logical_and(~finished, i < max_new)

            def body(c):
                tokens, i, cache, last, finished, ring, rng = c
                tokens = tokens.at[i].set(last[0])
                ring = ring.at[i % 24].set(last[0])
                logits, cache = llama.forward(params, last[:, None], cache,
                                              cfg)
                last_logits = logits[:, -1].astype(jnp.float32)
                if temperature > 0:
                    rng, sub = jax.random.split(rng)
                    nxt = jax.random.categorical(
                        sub, last_logits / temperature,
                        axis=-1).astype(jnp.int32)
                else:
                    nxt = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
                finished = jnp.any(nxt[0] == eos)
                finished = finished | ((i >= 23) & degenerate(ring))
                return tokens, i + 1, cache, nxt, finished, ring, rng

            finished0 = jnp.any(first[0] == eos)
            tokens, count, *_ = jax.lax.while_loop(
                cond, body,
                (tokens, jnp.int32(0), cache, first, finished0, ring, rng))
            return tokens, count

        fn = ajit(loop, donate_argnums=(2,))
        self._loops[key] = fn
        return fn

    # -- generation ----------------------------------------------------------------

    def generate(self, audio, generation_parameters:
                 STTGenerateParameters | None = None,
                 prompt: str | None = None) -> STTOutput:
        if self.tokenizer is None:
            raise RuntimeError("tokenizer not loaded")
        gp = generation_parameters or STTGenerateParameters(max_tokens=2048)
        t0 = time.perf_counter()
        audio = np.asarray(audio, np.float32)
        if audio.ndim > 1:
            audio = audio.mean(axis=-1)
        chunk_s = gp.chunk_duration or 1800.0
        chunk = int(chunk_s * self.sample_rate)
        texts: list[str] = []
        segments: list[STTSegment] = []
        total_prompt = total_gen = 0
        for s in range(0, max(len(audio), 1), chunk):
            piece = audio[s: s + chunk]
            offset = s / self.sample_rate
            text, n_prompt, n_gen = self._generate_chunk(piece, gp, prompt)
            total_prompt += n_prompt
            total_gen += n_gen
            shifted = self._offset_tags(text, offset)
            if shifted:
                texts.append(shifted)
            segments.extend(self._parse_segments(
                text, fallback_end=len(piece) / self.sample_rate,
                offset=offset))
        elapsed = time.perf_counter() - t0
        return STTOutput(
            text="\n".join(texts), segments=segments,
            prompt_token_count=total_prompt,
            generation_token_count=total_gen,
            generation_time=elapsed, total_time=elapsed)

    def _generate_chunk(self, audio, gp: STTGenerateParameters,
                        prompt: str | None):
        feats = self.encode_audio(audio)
        ids = np.asarray([self.build_prompt(feats.shape[0], prompt)],
                         np.int32)
        embeds = self._inject_audio(ids, feats)
        max_new = gp.max_tokens or 2048
        cache = llama.make_cache(self.config.text, 1,
                                 ids.shape[1] + max_new + 1, self.dtype)
        loop = self._get_loop(max_new, gp.temperature or 0.0)
        tokens, count = loop(self.params["language_model"],
                             jnp.asarray(embeds, self.dtype), cache,
                             jax.random.PRNGKey(0))
        gen = [t for t in np.asarray(tokens)[: int(count)].tolist()
               if t not in self.eos_token_ids]
        text = self.tokenizer.decode(gen, skip_special_tokens=True).strip()
        return text, ids.shape[1], len(gen)

    # -- streaming session hook (MossStreamingInferenceSessionCore) ----------

    def streaming_transcribe_window(self, samples, offset_seconds: float = 0.0,
                                    language: str | None = None,
                                    max_tokens: int | None = None) -> str:
        """Transcribe one streaming window; timestamps shifted by the window
        offset (streamingTranscribeWindow). ``max_tokens`` caps partial
        passes (the session budgets ~16 tok/s of audio)."""
        gp = STTGenerateParameters(max_tokens=max_tokens or 2048,
                                   language=language)
        text, _, _ = self._generate_chunk(
            np.asarray(samples, np.float32), gp, None)
        return self._offset_tags(text, offset_seconds)

    def generate_stream(self, audio, generation_parameters=None, **kw):
        out = self.generate(audio, generation_parameters, **kw)
        if out.text:
            yield {"type": "token", "text": out.text}
        yield {"type": "result", "output": out}

    # -- timestamp post-processing -------------------------------------------------

    @staticmethod
    def _offset_tags(text: str, offset: float) -> str:
        """Shift every ``[12.34]`` tag by the chunk offset
        (offsetTimestampTags, MossTranscribeDiarize.swift:869-900)."""
        if not offset:
            return text
        return _TS_TAG.sub(
            lambda m: "[%.2f]" % (float(m.group(1).replace(",", ".")) + offset),
            text)

    @staticmethod
    def _parse_segments(text: str, fallback_end: float,
                        offset: float = 0.0) -> list[STTSegment]:
        """``[start][SXX] text [end]`` -> segments
        (parseSegments, MossTranscribeDiarize.swift:902-945)."""
        segs = []
        for m in _SEGMENT.finditer(text):
            start = float(m.group(1).replace(",", "."))
            end = float(m.group(4).replace(",", "."))
            body = m.group(3).strip()
            if end < start or not body:
                continue
            segs.append(STTSegment(
                text=f"[{m.group(2)}] {body}", start=start + offset,
                end=end + offset, speaker=m.group(2)))
        if segs:
            return segs
        if not text:
            return []
        return [STTSegment(text=text, start=offset,
                           end=offset + max(fallback_end, 0.0))]
