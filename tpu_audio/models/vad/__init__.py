"""VAD / diarization task module (reference Sources/MLXAudioVAD)."""

from __future__ import annotations

from tpu_audio.core import hub

_REGISTRY: dict[str, str] = {
    "silero_vad": "tpu_audio.models.vad.silero:SileroVAD",
    "silero": "tpu_audio.models.vad.silero:SileroVAD",
    "sortformer": "tpu_audio.models.vad.sortformer:Sortformer",
    "smart_turn": "tpu_audio.models.vad.smart_turn:SmartTurn",
    "fsmn": "tpu_audio.models.vad.fsmn_vad:FSMNVAD",
    "fsmn_vad": "tpu_audio.models.vad.fsmn_vad:FSMNVAD",
    "smartturn": "tpu_audio.models.vad.smart_turn:SmartTurn",
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
            if key.replace("_", "") in name.replace("-", "").replace("_", ""):
                model_type = key
                break
    if model_type is None or model_type not in _REGISTRY:
        raise ValueError(f"unsupported VAD model_type {model_type!r}")
    import importlib

    module_name, cls_name = _REGISTRY[model_type].split(":")
    return getattr(importlib.import_module(module_name), cls_name).from_pretrained(
        str(model_dir), **kwargs)
