"""VyvoTTS: Qwen3 AR decoder emitting 7-token SNAC frames.

Rebuild of the reference's Qwen3 TTS family
(Sources/MLXAudioTTS/Models/Qwen3/Qwen3.swift): same 7-token SNAC frame
protocol as Orpheus but on a Qwen3 backbone (per-head QK RMSNorm,
Qwen3.swift:154-192) with the VyvoTTS special-token table (:18-29) and
START_OF_AI framing for reference audio (:428-441).

Implementation: the Orpheus runtime (``llama_tts.LlamaTTS``) with the shared
Llama-family backbone's ``qk_norm`` enabled and a swapped token table —
the decode loop, streaming, SNAC protocol and CLI are all inherited.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_audio.core import hub, loading
from tpu_audio.models import llama
from tpu_audio.models.tts.llama_tts import LlamaTTS, LlamaTTSConfig, OrpheusTokens

__all__ = ["VyvoTTS", "VYVO_TOKENS"]

_TOKENIZER_LENGTH = 151669
VYVO_TOKENS = OrpheusTokens(
    start_of_human=_TOKENIZER_LENGTH + 3,   # 151672
    end_of_human=_TOKENIZER_LENGTH + 4,     # 151673
    end_of_text=151645,
    start_of_speech=_TOKENIZER_LENGTH + 1,  # 151670
    end_of_speech=_TOKENIZER_LENGTH + 2,    # 151671
    pad_token=_TOKENIZER_LENGTH + 7,        # 151676
    audio_start=_TOKENIZER_LENGTH + 5,      # START_OF_AI 151674
    audio_end=_TOKENIZER_LENGTH + 6,        # END_OF_AI 151675
    audio_token_offset=_TOKENIZER_LENGTH + 10,  # 151679
    codebook_size=4096,
)


class VyvoTTS(LlamaTTS):
    @classmethod
    def from_pretrained(cls, repo_or_path: str, codec=None,
                        snac_repo: str | None = None,
                        dtype=jnp.bfloat16,
                        quantize_bits: int | str | None = None,
                        fuse: bool = True) -> "VyvoTTS":
        model_dir = hub.resolve_or_download_model(repo_or_path)
        cfg_dict = hub.load_config(model_dir)
        config = LlamaTTSConfig.from_dict(cfg_dict)
        config.qk_norm = True  # Qwen3 attention
        config.quantization = cfg_dict.get("quantization")
        params = loading.load_params(
            model_dir, sanitize=lambda w: llama.sanitize(w, config),
            dtype=dtype, expected_prefixes=("model",),
        )
        params = llama.maybe_stack(params)
        if config.quantization:
            from tpu_audio.core import quant

            q = config.quantization
            params = quant.tag_quantized(params, q.get("group_size", 64),
                                         q.get("bits", 4))
        elif quantize_bits == "w8a8":
            from tpu_audio.core import quant

            params = quant.quantize_tree(params, scheme="w8a8")
        elif quantize_bits:
            from tpu_audio.core import quant

            params = quant.quantize_tree(params, bits=quantize_bits)
        if fuse:
            params = llama.fuse_projections(params)
        tokenizer = None
        from pathlib import Path

        if (Path(model_dir) / "tokenizer.json").exists():
            from tokenizers import Tokenizer

            tokenizer = Tokenizer.from_file(str(Path(model_dir) / "tokenizer.json"))
        if codec is None:
            from tpu_audio.codecs import load_codec

            try:
                codec = load_codec(snac_repo or config.snac_repo, codec_type="snac")
            except Exception:
                codec = None
        tokens = VYVO_TOKENS
        if config.vocab_size < tokens.audio_token_offset:
            if "audio_token_offset" not in cfg_dict:
                raise ValueError("tiny vocab requires token table in config.json")
            tokens = OrpheusTokens(
                start_of_human=cfg_dict["start_of_human"],
                end_of_human=cfg_dict["end_of_human"],
                end_of_text=cfg_dict["end_of_text"],
                start_of_speech=cfg_dict["start_of_speech"],
                end_of_speech=cfg_dict["end_of_speech"],
                pad_token=cfg_dict["pad_token"],
                audio_start=cfg_dict["audio_start"],
                audio_end=cfg_dict["audio_end"],
                audio_token_offset=cfg_dict["audio_token_offset"],
                codebook_size=cfg_dict.get("codebook_size", 4096),
            )
        return cls(config, params, tokenizer, codec, tokens, dtype)

    def parse_output(self, all_tokens: list[int]) -> list[int]:
        """Adds the START_OF_AI fallback: when no START_OF_SPEECH is present,
        start at the first audio token after the last START_OF_AI
        (reference parseOutputRow, Qwen3.swift:333-358)."""
        T = self.tokens
        start_idx = None
        for i, t in enumerate(all_tokens):
            if t == T.start_of_speech:
                start_idx = i
        if start_idx is None:
            soa = [i for i, t in enumerate(all_tokens) if t == T.audio_start]
            if soa:
                for j in range(soa[-1] + 1, len(all_tokens)):
                    if all_tokens[j] >= T.audio_token_offset:
                        start_idx = j - 1
                        break
        seq = all_tokens[start_idx + 1:] if start_idx is not None else all_tokens
        kept = [t for t in seq if t != T.end_of_speech and t >= T.audio_token_offset]
        kept = kept[: (len(kept) // 7) * 7]
        return [t - T.audio_token_offset for t in kept]
