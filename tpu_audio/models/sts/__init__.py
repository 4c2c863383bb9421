"""STS (speech-to-speech: enhancement/separation/chat) task module
(reference Sources/MLXAudioSTS/STSModel.swift)."""

from __future__ import annotations

from tpu_audio.core import hub

_REGISTRY: dict[str, str] = {
    "deepfilternet": "tpu_audio.models.sts.deepfilternet:DeepFilterNet",
    "deepfilternet2": "tpu_audio.models.sts.deepfilternet:DeepFilterNet",
    "deepfilternet3": "tpu_audio.models.sts.deepfilternet:DeepFilterNet",
    "mossformer2_se": "tpu_audio.models.sts.mossformer2_se:MossFormer2SE",
    "mossformer2se": "tpu_audio.models.sts.mossformer2_se:MossFormer2SE",
    "mossformer2": "tpu_audio.models.sts.mossformer2_se:MossFormer2SE",
    "sam_audio": "tpu_audio.models.sts.sam_audio:SAMAudio",
    "samaudio": "tpu_audio.models.sts.sam_audio:SAMAudio",
    "lfm_audio": "tpu_audio.models.sts.lfm_audio:LFM2Audio",
    "lfm2_audio": "tpu_audio.models.sts.lfm_audio:LFM2Audio",
    "lfm2audio": "tpu_audio.models.sts.lfm_audio:LFM2Audio",
}


def register(model_type: str, target: str) -> None:
    _REGISTRY[model_type] = target


def load_model(repo_or_path: str, **kwargs):
    model_dir = hub.resolve_or_download_model(repo_or_path)
    cfg = hub.load_config(model_dir)
    model_type = (cfg.get("modelVersion") or cfg.get("model_type")
                  or hub.resolve_model_type(cfg, str(repo_or_path)) or "")
    model_type = str(model_type).lower()
    if model_type not in _REGISTRY:
        name = str(repo_or_path).lower()
        for key in _REGISTRY:
            if key in name.replace("-", "").replace("_", ""):
                model_type = key
                break
    if model_type not in _REGISTRY:
        raise ValueError(f"unsupported STS model_type {model_type!r}")
    import importlib

    module_name, cls_name = _REGISTRY[model_type].split(":")
    return getattr(importlib.import_module(module_name), cls_name).from_pretrained(
        str(model_dir), **kwargs)
