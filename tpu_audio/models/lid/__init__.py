"""LID task module (reference Sources/MLXAudioLID)."""

from __future__ import annotations

from tpu_audio.core import hub

_REGISTRY: dict[str, str] = {
    "wav2vec2": "tpu_audio.models.lid.wav2vec2_lid:Wav2Vec2LID",
    "mms-lid": "tpu_audio.models.lid.wav2vec2_lid:Wav2Vec2LID",
    "ecapa": "tpu_audio.models.lid.ecapa_lid:EcapaLID",
}


def register(model_type: str, target: str) -> None:
    _REGISTRY[model_type] = target


def load_model(repo_or_path: str, **kwargs):
    model_dir = hub.resolve_or_download_model(repo_or_path)
    cfg = hub.load_config(model_dir)
    model_type = hub.resolve_model_type(cfg, str(repo_or_path))
    if model_type is None or model_type not in _REGISTRY:
        name = str(repo_or_path).lower()
        for key in _REGISTRY:
            if key.replace("-", "") in name.replace("-", "").replace("_", ""):
                model_type = key
                break
    if model_type is None or model_type not in _REGISTRY:
        raise ValueError(f"unsupported LID model_type {model_type!r}")
    import importlib

    module_name, cls_name = _REGISTRY[model_type].split(":")
    return getattr(importlib.import_module(module_name), cls_name).from_pretrained(
        str(model_dir), **kwargs)
