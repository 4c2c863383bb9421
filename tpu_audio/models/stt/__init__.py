"""STT task module: model registry + factory.

Mirrors the reference's `STT.loadModel` factory
(Sources/MLXAudioSTT/MLXAudioSTT.swift:23-85): resolve the checkpoint,
read ``model_type`` from config.json, dispatch to the model family.
"""

from __future__ import annotations

from tpu_audio.core import hub

_REGISTRY: dict[str, str] = {
    # model_type -> "module:Class"
    "whisper": "tpu_audio.models.stt.whisper:Whisper",
    "parakeet": "tpu_audio.models.stt.parakeet:Parakeet",
    "qwen3_asr": "tpu_audio.models.stt.qwen3_asr:Qwen3ASR",
    "wav2vec2": "tpu_audio.models.stt.wav2vec2:Wav2Vec2CTC",
    "sense_voice": "tpu_audio.models.stt.sensevoice:SenseVoice",
    "lasr": "tpu_audio.models.stt.lasr:LasrCTC",
    "canary": "tpu_audio.models.stt.canary:Canary",
    "glmasr": "tpu_audio.models.stt.glm_asr:GLMASR",
    "glm_asr": "tpu_audio.models.stt.glm_asr:GLMASR",
    "glm4_voice_asr": "tpu_audio.models.stt.glm_asr:GLMASR",
    "nemotron": "tpu_audio.models.stt.nemotron:NemotronASR",
    "fireredasr2": "tpu_audio.models.stt.fireredasr:FireRedASR2",
    "fireredasr": "tpu_audio.models.stt.fireredasr:FireRedASR2",
    "nemotron_asr": "tpu_audio.models.stt.nemotron:NemotronASR",
    "lasr_ctc": "tpu_audio.models.stt.lasr:LasrCTC",
    "sensevoice": "tpu_audio.models.stt.sensevoice:SenseVoice",
    "moonshine": "tpu_audio.models.stt.moonshine:Moonshine",
    "qwen3_forced_aligner": "tpu_audio.models.stt.qwen3_aligner:Qwen3ForcedAligner",
    "cohere_asr": "tpu_audio.models.stt.cohere:CohereTranscribe",
    "cohere": "tpu_audio.models.stt.cohere:CohereTranscribe",
    "granite_speech": "tpu_audio.models.stt.granite:GraniteSpeech",
    "granitespeech": "tpu_audio.models.stt.granite:GraniteSpeech",
    "voxtral_realtime": "tpu_audio.models.stt.voxtral:VoxtralRealtime",
    "voxtral": "tpu_audio.models.stt.voxtral:VoxtralRealtime",
    "moss_transcribe_diarize": (
        "tpu_audio.models.stt.moss_diarize:MossTranscribeDiarize"),
    "mosstranscribediarize": (
        "tpu_audio.models.stt.moss_diarize:MossTranscribeDiarize"),
}


def register(model_type: str, target: str) -> None:
    _REGISTRY[model_type] = target


def load_model(repo_or_path: str, **kwargs):
    """Load any supported STT model from a local dir or HF repo id."""
    model_dir = hub.resolve_or_download_model(repo_or_path)
    cfg = hub.load_config(model_dir)
    # forced-aligner checkpoints share the qwen3_asr config; like the
    # reference they are detected by repo name (App.swift:448-452)
    if "forcedalign" in str(repo_or_path).lower().replace("-", "").replace("_", ""):
        model_type = "qwen3_forced_aligner"
    else:
        model_type = hub.resolve_model_type(cfg, str(repo_or_path))
    if model_type is None or model_type not in _REGISTRY:
        # repo-name inference fallback (reference MLXAudioSTT.swift:51-85)
        name = str(repo_or_path).lower()
        for key in _REGISTRY:
            if key.replace("_", "") in name.replace("-", "").replace("_", ""):
                model_type = key
                break
    if model_type is None or model_type not in _REGISTRY:
        raise ValueError(
            f"unsupported STT model_type {model_type!r} "
            f"(supported: {sorted(_REGISTRY)})"
        )
    module_name, cls_name = _REGISTRY[model_type].split(":")
    import importlib

    cls = getattr(importlib.import_module(module_name), cls_name)
    return cls.from_pretrained(str(model_dir), **kwargs)
