"""Wav2Vec2 / MMS: raw-waveform conv feature extractor + transformer encoder
with CTC head (STT) and sequence-classification head (LID).

TPU-first rebuild of the reference
(Sources/MLXAudioSTT/Models/Wav2Vec2/Wav2Vec2CTC.swift and
Sources/MLXAudioLID/Models/Wav2Vec2/Wav2Vec2LID.swift): 7-layer conv
frontend (group-norm or layer-norm modes), weight-normed positional conv
embedding (folded at load), post-LN or stable pre-LN encoder layers, MMS
per-language attention adapters and per-language vocabularies.
"""

from __future__ import annotations

import functools
import json
import time
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import hub, loading, nn
from tpu_audio.core.generation import STTGenerateParameters, STTOutput, STTSegment
from tpu_audio.core.jitting import ajit

__all__ = ["Wav2Vec2CTC", "Wav2Vec2Config"]


@dataclass
class Wav2Vec2Config:
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    conv_dim: tuple = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: tuple = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tuple = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = True
    feat_extract_norm: str = "layer"  # "group" | "layer"
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    do_stable_layer_norm: bool = True
    layer_norm_eps: float = 1e-5
    vocab_size: int = 32
    pad_token_id: int = 0
    adapter_attn_dim: int | None = None
    hidden_act: str = "gelu"
    # LID head
    classifier_proj_size: int = 256
    num_labels: int | None = None
    id2label: dict | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "Wav2Vec2Config":
        keys = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in d.items() if k in keys}
        for k in ("conv_dim", "conv_kernel", "conv_stride"):
            if k in kw:
                kw[k] = tuple(kw[k])
        return cls(**kw)


def _feature_extractor(p, x, cfg: Wav2Vec2Config):
    """waveform [B, T] -> features [B, T', conv_dim[-1]]."""
    h = x[..., None]  # [B, T, 1]
    for i, (dim, k, s) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel,
                                        cfg.conv_stride)):
        lp = p["conv_layers"][str(i)]
        h = nn.conv1d(lp["conv"], h, stride=s)
        if cfg.feat_extract_norm == "group" and i == 0:
            h = nn.group_norm(lp["layer_norm"], h, num_groups=dim)
        elif cfg.feat_extract_norm == "layer":
            h = nn.layer_norm(lp["layer_norm"], h, cfg.layer_norm_eps)
        h = nn.gelu(h)
    return h


def _pos_conv_embed(p, x, cfg: Wav2Vec2Config):
    k = cfg.num_conv_pos_embeddings
    pad = k // 2
    h = nn.conv1d(p["conv"], x, padding=pad,
                  groups=cfg.num_conv_pos_embedding_groups)
    if k % 2 == 0:
        h = h[:, :-1]
    return nn.gelu(h)


def _attention(p, x, n_heads: int):
    b, t, d = x.shape
    hd = d // n_heads
    q = nn.linear(p["q_proj"], x).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
    k = nn.linear(p["k_proj"], x).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
    v = nn.linear(p["v_proj"], x).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
    o = nn.sdpa(q, k, v)
    return nn.linear(p["out_proj"], o.transpose(0, 2, 1, 3).reshape(b, t, d))


def _encoder(p, x, cfg: Wav2Vec2Config):
    x = x + _pos_conv_embed(p["pos_conv_embed"], x, cfg)
    if not cfg.do_stable_layer_norm:
        x = nn.layer_norm(p["layer_norm"], x, cfg.layer_norm_eps)
    for i in range(cfg.num_hidden_layers):
        lp = p["layers"][str(i)]
        if cfg.do_stable_layer_norm:
            h = nn.layer_norm(lp["layer_norm"], x, cfg.layer_norm_eps)
            x = x + _attention(lp["attention"], h, cfg.num_attention_heads)
            h = nn.layer_norm(lp["final_layer_norm"], x, cfg.layer_norm_eps)
            ff = nn.linear(lp["feed_forward"]["output_dense"],
                           nn.gelu(nn.linear(lp["feed_forward"]["intermediate_dense"], h)))
            x = x + ff
        else:
            x = x + _attention(lp["attention"], x, cfg.num_attention_heads)
            x = nn.layer_norm(lp["layer_norm"], x, cfg.layer_norm_eps)
            ff = nn.linear(lp["feed_forward"]["output_dense"],
                           nn.gelu(nn.linear(lp["feed_forward"]["intermediate_dense"], x)))
            x = nn.layer_norm(lp["final_layer_norm"], x + ff, cfg.layer_norm_eps)
        if "adapter_layer" in lp:
            a = lp["adapter_layer"]
            h = nn.layer_norm(a["norm"], x, cfg.layer_norm_eps)
            x = x + nn.linear(a["linear_2"], jax.nn.relu(nn.linear(a["linear_1"], h)))
    if cfg.do_stable_layer_norm:
        x = nn.layer_norm(p["layer_norm"], x, cfg.layer_norm_eps)
    return x


def trunk_forward(params, waveform, cfg: Wav2Vec2Config):
    """waveform [B, T] -> hidden [B, T', D]."""
    p = params["wav2vec2"] if "wav2vec2" in params else params
    feats = _feature_extractor(p["feature_extractor"], waveform, cfg)
    fp = p["feature_projection"]
    h = nn.layer_norm(fp["layer_norm"], feats, cfg.layer_norm_eps)
    h = nn.linear(fp["projection"], h)
    return _encoder(p["encoder"], h, cfg)


def sanitize(weights: dict[str, np.ndarray],
             keep_prefixes: tuple = ("wav2vec2.", "lm_head.", "projector.",
                                     "classifier.")) -> dict[str, np.ndarray]:
    """HF checkpoint -> canonical: fold pos-conv weight norm, drop
    masked_spec_embed (Wav2Vec2LID.swift:100-148; conv weights stay in torch
    [O,I,K] layout)."""
    out = {}
    wg = wv = None
    for k, v in weights.items():
        if "masked_spec_embed" in k:
            continue
        if not any(k.startswith(p) for p in keep_prefixes):
            continue
        if k.endswith("pos_conv_embed.conv.weight_g") or \
                k.endswith("pos_conv_embed.conv.parametrizations.weight.original0"):
            wg = v
            continue
        if k.endswith("pos_conv_embed.conv.weight_v") or \
                k.endswith("pos_conv_embed.conv.parametrizations.weight.original1"):
            wv = v
            continue
        out[k] = v
    if wg is not None and wv is not None:
        # torch weight_norm(dim=2) on [O, I/g, K]
        norm = np.sqrt((wv.astype(np.float64) ** 2).sum(axis=(0, 1), keepdims=True)
                       + 1e-12)
        out["wav2vec2.encoder.pos_conv_embed.conv.weight"] = (
            wg * wv / norm).astype(np.float32)
    return out


class Wav2Vec2CTC:
    """CTC STT with MMS per-language adapters/vocabularies."""

    def __init__(self, config: Wav2Vec2Config, params, vocab: dict[int, str],
                 vocabularies: dict[str, dict[int, str]] | None = None,
                 model_dir: str | None = None, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.vocab = vocab
        self.vocabularies = vocabularies or {}
        self.model_dir = model_dir
        self.dtype = dtype
        self._forward = ajit(
            lambda p, x: nn.linear(p["lm_head"], trunk_forward(p, x, config)))

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32) -> "Wav2Vec2CTC":
        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = Wav2Vec2Config.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        vocab, vocabularies = {}, {}
        vp = model_dir / "vocab.json"
        if vp.exists():
            raw = json.loads(vp.read_text())
            if raw and isinstance(next(iter(raw.values())), dict):
                # MMS: per-language nested vocabs
                vocabularies = {lang.lower(): {v: k for k, v in m.items()}
                                for lang, m in raw.items()}
                vocab = next(iter(vocabularies.values()))
            else:
                vocab = {v: k for k, v in raw.items()}
        return cls(config, params, vocab, vocabularies, str(model_dir), dtype)

    def load_adapter(self, language: str) -> bool:
        """Load MMS language-adapter weights (adapter.<lang>.safetensors)
        into the adapter layers (reference Wav2Vec2CTC.swift:404-460)."""
        if not self.model_dir:
            return False
        path = Path(self.model_dir) / f"adapter.{language.lower()}.safetensors"
        if not path.exists():
            return False
        from safetensors.numpy import load_file

        flat = sanitize(load_file(str(path)))
        merged = loading.flatten(self.params)
        for k, v in flat.items():
            merged[k] = jnp.asarray(v, self.dtype)
        self.params = loading.unflatten(merged)
        return True

    def _vocab_for(self, language: str | None) -> dict[int, str]:
        if language and language.lower() in self.vocabularies:
            return self.vocabularies[language.lower()]
        return self.vocab

    def generate(self, audio: np.ndarray,
                 generation_parameters: STTGenerateParameters | None = None
                 ) -> STTOutput:
        params = generation_parameters or STTGenerateParameters()
        t0 = time.perf_counter()
        x = np.asarray(audio, np.float32)
        if x.ndim == 1:
            x = x[None]
        # zero-mean unit-variance normalization
        x = (x - x.mean(-1, keepdims=True)) / (x.std(-1, keepdims=True) + 1e-7)
        logits = np.asarray(self._forward(self.params, jnp.asarray(x, self.dtype)))
        best = logits.argmax(-1)[0]
        blank = self.config.pad_token_id
        ids, prev = [], -1
        for t in best.tolist():
            if t != prev and t != blank:
                ids.append(t)
            prev = t
        vocab = self._vocab_for(params.language)
        text = "".join(vocab.get(t, "") for t in ids).replace("|", " ").strip()
        elapsed = time.perf_counter() - t0
        return STTOutput(
            text=text, language=params.language,
            segments=[STTSegment(text=text, start=0.0,
                                 end=x.shape[-1] / 16000)],
            generation_token_count=len(ids), total_time=elapsed,
            generation_time=elapsed)

    def generate_stream(self, audio, generation_parameters=None):
        out = self.generate(audio, generation_parameters)
        if out.text:
            yield {"type": "token", "text": out.text}
        yield {"type": "result", "output": out}
