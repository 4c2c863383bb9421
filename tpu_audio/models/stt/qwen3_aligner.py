"""Qwen3 forced aligner: word-level timestamps from (audio, transcript).

TPU-first rebuild of the reference
(Sources/MLXAudioSTT/Models/Qwen3ASR/Qwen3ForcedAligner.swift). The model is
the Qwen3-ASR audio tower + text backbone with a timestamp classification head
(``lm_head``: hidden -> classify_num, no bias, :336-358). The prompt is
``<|audio_start|>(<|audio_pad|> x N)<|audio_end|>`` followed by the transcript
words, each word trailed by two ``<timestamp>`` marker tokens (:280-295).
One causal forward classifies every position; at each ``<timestamp>`` input
position the argmax class * 80 ms is that word's start/end time (:455-480).
A longest-increasing-subsequence repair (:181-278) fixes non-monotonic
predictions, then words are paired with (start, end) (:300-320).

TPU notes: the single forward runs jitted with ``cache=None`` causal
attention; the prompt is zero-padded up to a length bucket — trailing pad
cannot influence earlier positions under causal masking, so bucketing is
exact (verified by test) and avoids a recompile per utterance length.
"""

from __future__ import annotations

import functools
import math
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import nn
from tpu_audio.models import llama
from tpu_audio.models.stt import qwen3_asr
from tpu_audio.core.jitting import ajit

__all__ = ["Qwen3ForcedAligner", "ForceAlignProcessor", "ForcedAlignItem",
           "ForcedAlignResult"]

_PAD_BUCKET = 64

# CJK unicode ranges (Qwen3ForcedAligner.swift:92-104)
_CJK_RANGES = (
    (0x4E00, 0x9FFF),      # CJK Unified Ideographs
    (0x3400, 0x4DBF),      # Extension A
    (0x20000, 0x2A6DF),    # Extension B
    (0x2A700, 0x2B73F),    # Extension C
    (0x2B740, 0x2B81F),    # Extension D
    (0x2B820, 0x2CEAF),    # Extension E
    (0xF900, 0xFAFF),      # Compatibility Ideographs
)


@dataclass
class ForcedAlignItem:
    """One aligned word with times in seconds (ForcedAlignResult types)."""

    text: str
    start_time: float
    end_time: float


@dataclass
class ForcedAlignResult:
    items: list[ForcedAlignItem] = field(default_factory=list)
    prompt_tokens: int = 0
    total_time: float = 0.0

    @property
    def text(self) -> str:
        return " ".join(item.text for item in self.items)


class ForceAlignProcessor:
    """Host-side text preparation + timestamp repair
    (ForceAlignProcessor, Qwen3ForcedAligner.swift:75-335)."""

    @staticmethod
    def is_kept_char(ch: str) -> bool:
        return ch == "'" or ch.isalpha() or ch.isnumeric()

    def clean_token(self, token: str) -> str:
        return "".join(ch for ch in token if self.is_kept_char(ch))

    @staticmethod
    def is_cjk_char(ch: str) -> bool:
        code = ord(ch)
        return any(lo <= code <= hi for lo, hi in _CJK_RANGES)

    def tokenize_chinese_mixed(self, text: str) -> list[str]:
        """Each CJK char is its own token; latin runs are cleaned words."""
        tokens: list[str] = []
        latin: list[str] = []

        def flush():
            if latin:
                cleaned = self.clean_token("".join(latin))
                if cleaned:
                    tokens.append(cleaned)
                latin.clear()

        for ch in text:
            if self.is_cjk_char(ch):
                flush()
                tokens.append(ch)
            elif self.is_kept_char(ch):
                latin.append(ch)
            else:
                flush()
        flush()
        return tokens

    def _split_segment_with_chinese(self, seg: str) -> list[str]:
        tokens: list[str] = []
        buf: list[str] = []
        for ch in seg:
            if self.is_cjk_char(ch):
                if buf:
                    tokens.append("".join(buf))
                    buf = []
                tokens.append(ch)
            else:
                buf.append(ch)
        if buf:
            tokens.append("".join(buf))
        return tokens

    def tokenize_space_lang(self, text: str) -> list[str]:
        """Space-separated languages; embedded CJK chars still split out."""
        tokens: list[str] = []
        for seg in text.split(" "):
            cleaned = self.clean_token(seg)
            if cleaned:
                tokens.extend(self._split_segment_with_chinese(cleaned))
        return tokens

    # -- timestamp repair (LIS, Qwen3ForcedAligner.swift:181-278) -----------

    def fix_timestamp(self, data: list[float]) -> list[int]:
        """Repair non-monotonic timestamps: keep the longest non-decreasing
        subsequence, patch <=2-long anomaly runs from the nearest valid
        neighbor, linearly interpolate longer runs."""
        n = len(data)
        if n == 0:
            return []
        vals = [int(x) for x in data]

        dp = [1] * n
        parent = [-1] * n
        for i in range(1, n):
            for j in range(i):
                if vals[j] <= vals[i] and dp[j] + 1 > dp[i]:
                    dp[i] = dp[j] + 1
                    parent[i] = j
        max_idx = dp.index(max(dp))
        is_normal = [False] * n
        idx = max_idx
        while idx != -1:
            is_normal[idx] = True
            idx = parent[idx]

        result = list(vals)
        i = 0
        while i < n:
            if is_normal[i]:
                i += 1
                continue
            j = i
            while j < n and not is_normal[j]:
                j += 1
            left_val = next((result[k] for k in range(i - 1, -1, -1)
                             if is_normal[k]), None)
            right_val = next((result[k] for k in range(j, n)
                              if is_normal[k]), None)
            count = j - i
            if count <= 2:
                for k in range(i, j):
                    if left_val is None:
                        result[k] = right_val if right_val is not None else 0
                    elif right_val is None:
                        result[k] = left_val
                    else:
                        result[k] = (left_val if (k - (i - 1)) <= (j - k)
                                     else right_val)
            else:
                if left_val is not None and right_val is not None:
                    step = (right_val - left_val) / (count + 1)
                    for k in range(i, j):
                        result[k] = left_val + int(step * (k - i + 1))
                elif left_val is not None:
                    for k in range(i, j):
                        result[k] = left_val
                elif right_val is not None:
                    for k in range(i, j):
                        result[k] = right_val
            i = j
        return result

    # -- prompt encode / parse (Qwen3ForcedAligner.swift:280-335) -----------

    def encode_timestamp(self, text: str, language: str) -> tuple[list[str], str]:
        if language.lower() == "chinese":
            word_list = self.tokenize_chinese_mixed(text)
        else:
            word_list = self.tokenize_space_lang(text)
        input_text = ("<|audio_start|><|audio_pad|><|audio_end|>"
                      + "<timestamp><timestamp>".join(word_list)
                      + "<timestamp><timestamp>")
        return word_list, input_text

    def parse_timestamp(self, word_list: list[str],
                        timestamp: list[float]) -> list[ForcedAlignItem]:
        fixed = self.fix_timestamp(timestamp)
        items = []
        for i, word in enumerate(word_list):
            if i * 2 + 1 >= len(fixed):
                break
            items.append(ForcedAlignItem(
                text=word,
                start_time=fixed[i * 2] / 1000.0,
                end_time=fixed[i * 2 + 1] / 1000.0,
            ))
        return items


class Qwen3ForcedAligner(qwen3_asr.Qwen3ASR):
    """Qwen3-ASR backbone + timestamp classification head.

    Shares audio preprocessing / window encoding / feature splicing with
    :class:`~tpu_audio.models.stt.qwen3_asr.Qwen3ASR`; replaces
    autoregressive decoding with a single jitted causal forward through the
    ``lm_head`` classifier (Qwen3ForcedAligner.swift:360-406).
    """

    is_forced_aligner = True

    def __init__(self, config, params, tokenizer=None, dtype=jnp.bfloat16):
        super().__init__(config, params, tokenizer, dtype)
        self.processor = ForceAlignProcessor()
        self._classify = ajit(
            functools.partial(_classify, cfg=config.text))

    def generate(self, audio, text: str | None = None,
                 language: str = "English", **_kwargs) -> ForcedAlignResult:
        """Align ``text`` to ``audio`` -> word items
        (Qwen3ForcedAligner.swift:432-505)."""
        if not text:
            raise ValueError("forced alignment requires the transcript text")
        if self.tokenizer is None:
            raise RuntimeError("tokenizer not loaded")
        t0 = time.perf_counter()
        audio = np.asarray(audio, np.float32)
        if audio.ndim > 1:
            audio = audio.mean(axis=-1)
        mel, _ = self.preprocess_audio(audio)
        feats = self.encode_audio(mel)
        num_audio_tokens = feats.shape[0]

        word_list, aligner_text = self.processor.encode_timestamp(text, language)
        expanded = aligner_text.replace(
            "<|audio_pad|>", "<|audio_pad|>" * num_audio_tokens)
        ids = np.asarray([self.tokenizer.encode(expanded).ids], np.int32)
        n_valid = ids.shape[1]
        embeds = self._merge_audio_features(ids, feats)

        # pad to a length bucket: trailing pad is invisible to earlier
        # positions under causal attention, so predictions are exact
        bucket = _PAD_BUCKET * math.ceil(n_valid / _PAD_BUCKET)
        if bucket > n_valid:
            embeds = np.pad(embeds, ((0, 0), (0, bucket - n_valid), (0, 0)))
        classes = np.asarray(
            self._classify(self.params, jnp.asarray(embeds, self.dtype)))[0]

        seg_ms = self.config.timestamp_segment_time
        ts_positions = np.where(
            ids[0] == self.config.timestamp_token_id)[0]
        timestamps = [float(classes[p]) * seg_ms for p in ts_positions]
        items = self.processor.parse_timestamp(word_list, timestamps)
        return ForcedAlignResult(
            items=items, prompt_tokens=n_valid,
            total_time=time.perf_counter() - t0)

    def generate_stream(self, audio, generation_parameters=None):
        raise NotImplementedError(
            "streaming is not supported for forced aligner models")


def _classify(params, embeds, cfg):
    """Single causal forward -> per-position argmax class ids [B, T]."""
    hidden, _ = llama.forward(params, None, None, cfg,
                              inputs_embeds=embeds, return_hidden=True)
    return jnp.argmax(nn.linear(params["lm_head"], hidden), axis=-1)
