"""Synthetic tiny-checkpoint fixtures, written to disk and loaded through the
real `from_pretrained` path — the reference's fixture-model pattern
(Tests/ParakeetBatchParityTests.swift:561 makeFixtureDirectory,
Tests/ModuloFloatFixtureValues.swift deterministic pseudo-weights)."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def modulo_values(shape, modulus: int = 17, scale: float = 0.05) -> np.ndarray:
    """Deterministic reproducible pseudo-weights without RNG:
    value[i] = ((i % m) - m/2) * scale / m."""
    n = int(np.prod(shape))
    vals = ((np.arange(n) % modulus) - modulus / 2) * (scale / modulus)
    return vals.reshape(shape).astype(np.float32)


def make_whisper_fixture(
    path: Path,
    n_mels: int = 80,
    d_model: int = 32,
    layers: int = 2,
    heads: int = 2,
    ffn: int = 64,
    vocab: int = 64,
    max_target_positions: int = 48,
) -> Path:
    """Write a minimal HF-layout Whisper checkpoint."""
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    cfg = {
        "model_type": "whisper",
        "num_mel_bins": n_mels,
        "d_model": d_model,
        "encoder_layers": layers,
        "encoder_attention_heads": heads,
        "encoder_ffn_dim": ffn,
        "decoder_layers": layers,
        "decoder_attention_heads": heads,
        "decoder_ffn_dim": ffn,
        "vocab_size": vocab,
        "max_source_positions": 1500,
        "max_target_positions": max_target_positions,
    }
    (path / "config.json").write_text(json.dumps(cfg))

    w: dict[str, np.ndarray] = {}
    m = 0

    def add(key, shape):
        nonlocal m
        m += 1
        w[key] = modulo_values(shape, modulus=13 + (m % 7))

    add("model.encoder.conv1.weight", (d_model, n_mels, 3))
    add("model.encoder.conv1.bias", (d_model,))
    add("model.encoder.conv2.weight", (d_model, d_model, 3))
    add("model.encoder.conv2.bias", (d_model,))
    add("model.encoder.embed_positions.weight", (1500, d_model))
    add("model.encoder.layer_norm.weight", (d_model,))
    add("model.encoder.layer_norm.bias", (d_model,))
    add("model.decoder.embed_tokens.weight", (vocab, d_model))
    add("model.decoder.embed_positions.weight", (max_target_positions, d_model))
    add("model.decoder.layer_norm.weight", (d_model,))
    add("model.decoder.layer_norm.bias", (d_model,))
    for stem, has_cross in (("encoder", False), ("decoder", True)):
        for i in range(layers):
            base = f"model.{stem}.layers.{i}"
            for attn, ln in [("self_attn", "self_attn_layer_norm")] + (
                [("encoder_attn", "encoder_attn_layer_norm")] if has_cross else []
            ):
                add(f"{base}.{attn}.q_proj.weight", (d_model, d_model))
                add(f"{base}.{attn}.q_proj.bias", (d_model,))
                add(f"{base}.{attn}.k_proj.weight", (d_model, d_model))
                add(f"{base}.{attn}.v_proj.weight", (d_model, d_model))
                add(f"{base}.{attn}.v_proj.bias", (d_model,))
                add(f"{base}.{attn}.out_proj.weight", (d_model, d_model))
                add(f"{base}.{attn}.out_proj.bias", (d_model,))
                add(f"{base}.{ln}.weight", (d_model,))
                add(f"{base}.{ln}.bias", (d_model,))
            add(f"{base}.fc1.weight", (ffn, d_model))
            add(f"{base}.fc1.bias", (ffn,))
            add(f"{base}.fc2.weight", (d_model, ffn))
            add(f"{base}.fc2.bias", (d_model,))
            add(f"{base}.final_layer_norm.weight", (d_model,))
            add(f"{base}.final_layer_norm.bias", (d_model,))
    save_file(w, str(path / "model.safetensors"))
    return path


def write_fixture_tokenizer(path: Path, vocab: int = 64) -> None:
    """Write a real tokenizer.json (WordLevel) with whisper-style special
    tokens at the top of the vocab, loadable by WhisperTokenizer.from_dir."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    specials = [
        "<|endoftext|>", "<|startoftranscript|>", "<|transcribe|>",
        "<|translate|>", "<|notimestamps|>", "<|nospeech|>",
        "<|en|>", "<|fr|>",
    ]
    n_words = vocab - len(specials)
    vocab_map = {f"w{i}": i for i in range(n_words)}
    # specials occupy the top ids, eot highest
    vocab_map.update({s: vocab - 1 - k for k, s in enumerate(specials)})
    tok = Tokenizer(WordLevel(vocab_map, unk_token="w0"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(Path(path) / "tokenizer.json"))


class FakeWhisperTokenizer:
    """Stand-in tokenizer for fixture models: specials occupy the top of a
    tiny vocab, decode() is a readable stub."""

    def __init__(self, vocab: int = 64):
        self.is_multilingual = True
        self.eot = vocab - 1
        self.sot = vocab - 2
        self.transcribe = vocab - 3
        self.translate = vocab - 4
        self.no_timestamps = vocab - 5
        self.no_speech = vocab - 6
        self.timestamp_begin = vocab - 1  # no timestamp tokens in fixture
        self.language_to_id = {"en": vocab - 7, "fr": vocab - 8}
        self.id_to_language = {v: k for k, v in self.language_to_id.items()}

    def build_prompt_tokens(self, language=None, task="transcribe"):
        lang = self.language_to_id.get(language or "en")
        task_id = self.translate if task == "translate" else self.transcribe
        return [self.sot, lang, task_id, self.no_timestamps]

    def decode(self, tokens):
        return " ".join(f"t{t}" for t in tokens if t < self.sot - 7)
