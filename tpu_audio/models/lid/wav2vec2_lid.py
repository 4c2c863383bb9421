"""MMS-LID: Wav2Vec2 trunk + mean-pool + projector/classifier head
(reference Sources/MLXAudioLID/Models/Wav2Vec2/Wav2Vec2LID.swift)."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import hub, loading, nn
from tpu_audio.models.stt.wav2vec2 import Wav2Vec2Config, sanitize, trunk_forward
from tpu_audio.core.jitting import ajit

__all__ = ["Wav2Vec2LID", "LIDOutput", "LanguagePrediction"]


@dataclass
class LanguagePrediction:
    language: str
    confidence: float


@dataclass
class LIDOutput:
    language: str
    confidence: float
    top_languages: list[LanguagePrediction] = field(default_factory=list)


class Wav2Vec2LID:
    def __init__(self, config: Wav2Vec2Config, params,
                 id2label: dict[int, str], dtype=jnp.float32):
        self.config = config
        self.params = params
        self.id2label = id2label
        self.dtype = dtype

        def fwd(p, x):
            h = trunk_forward(p, x, config)
            h = h.mean(axis=1)
            h = nn.linear(p["projector"], h)
            return nn.linear(p["classifier"], h)

        self._forward = ajit(fwd)

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32) -> "Wav2Vec2LID":
        model_dir = hub.resolve_or_download_model(repo_or_path)
        cfg_dict = hub.load_config(model_dir)
        config = Wav2Vec2Config.from_dict(cfg_dict)
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        id2label = {int(k): v for k, v in (cfg_dict.get("id2label") or {}).items()}
        return cls(config, params, id2label, dtype)

    def predict(self, waveform: np.ndarray, top_k: int = 5) -> LIDOutput:
        x = np.asarray(waveform, np.float32)
        x = (x - x.mean()) / (x.std() + 1e-7)
        logits = self._forward(self.params, jnp.asarray(x[None], self.dtype))
        probs = np.asarray(jax.nn.softmax(logits[0].astype(jnp.float32)))
        order = np.argsort(-probs)[: min(top_k, len(probs))]
        top = [LanguagePrediction(self.id2label.get(int(i), f"unknown_{i}"),
                                  float(probs[i])) for i in order]
        best = top[0] if top else LanguagePrediction("unknown", 0.0)
        return LIDOutput(best.language, best.confidence, top)
