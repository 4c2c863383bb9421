"""TTS task module: model registry + factory (reference TTS.loadModel,
Sources/MLXAudioTTS/TTSModel.swift:38-333)."""

from __future__ import annotations

from tpu_audio.core import hub

_REGISTRY: dict[str, str] = {
    "llama_tts": "tpu_audio.models.tts.llama_tts:LlamaTTS",
    "qwen3": "tpu_audio.models.tts.qwen3_vyvo:VyvoTTS",
    "qwen3_tts": "tpu_audio.models.tts.qwen3_tts:Qwen3TTS",
    "kokoro": "tpu_audio.models.tts.kokoro:Kokoro",
    "kitten_tts": "tpu_audio.models.tts.kitten_tts:KittenTTS",
    "kittentts": "tpu_audio.models.tts.kitten_tts:KittenTTS",
    "soprano": "tpu_audio.models.tts.soprano:Soprano",
    "pocket_tts": "tpu_audio.models.tts.pocket_tts:PocketTTS",
    "moss_tts_nano": "tpu_audio.models.tts.moss_tts:MossTTSNano",
    "mosstts": "tpu_audio.models.tts.moss_tts:MossTTSNano",
    "moss_tts": "tpu_audio.models.tts.moss_tts_full:MossTTS",
    "moss_tts_delay": "tpu_audio.models.tts.moss_tts_full:MossTTS",
    "moss_tts_local": "tpu_audio.models.tts.moss_tts_full:MossTTS",
    "moss_ttsd": "tpu_audio.models.tts.moss_tts_full:MossTTS",
    "pockettts": "tpu_audio.models.tts.pocket_tts:PocketTTS",
    "echo_tts": "tpu_audio.models.tts.echo_tts:EchoTTS",
    "echotts": "tpu_audio.models.tts.echo_tts:EchoTTS",
    "chatterbox": "tpu_audio.models.tts.chatterbox:Chatterbox",
    "chatterbox_turbo": "tpu_audio.models.tts.chatterbox:Chatterbox",
    "indextts": "tpu_audio.models.tts.indextts:IndexTTS",
    "index_tts": "tpu_audio.models.tts.indextts:IndexTTS",
    "fish_speech": "tpu_audio.models.tts.fish_speech:FishSpeech",
    "fishspeech": "tpu_audio.models.tts.fish_speech:FishSpeech",
    "fishaudio": "tpu_audio.models.tts.fish_speech:FishSpeech",
    "omnivoice": "tpu_audio.models.tts.omnivoice:OmniVoice",
    "omni_voice": "tpu_audio.models.tts.omnivoice:OmniVoice",
    "irodori_tts": "tpu_audio.models.tts.irodori:IrodoriTTS",
    "irodori": "tpu_audio.models.tts.irodori:IrodoriTTS",
    "csm": "tpu_audio.models.tts.csm:MarvisTTS",
    "marvis": "tpu_audio.models.tts.csm:MarvisTTS",
    # repo-name fallbacks
    "orpheus": "tpu_audio.models.tts.llama_tts:LlamaTTS",
    "vyvo": "tpu_audio.models.tts.qwen3_vyvo:VyvoTTS",
}


def register(model_type: str, target: str) -> None:
    _REGISTRY[model_type] = target


def load_model(repo_or_path: str, **kwargs):
    model_dir = hub.resolve_or_download_model(repo_or_path)
    cfg = hub.load_config(model_dir)
    model_type = hub.resolve_model_type(cfg, str(repo_or_path))
    if model_type is None or model_type not in _REGISTRY:
        # repo-name inference fallback (TTSModel.swift:273-333)
        name = str(repo_or_path).lower()
        for key in _REGISTRY:
            if key.replace("_", "") in name.replace("-", "").replace("_", ""):
                model_type = key
                break
    if model_type is None or model_type not in _REGISTRY:
        raise ValueError(
            f"unsupported TTS model_type {model_type!r} "
            f"(supported: {sorted(_REGISTRY)})"
        )
    import importlib

    module_name, cls_name = _REGISTRY[model_type].split(":")
    cls = getattr(importlib.import_module(module_name), cls_name)
    return cls.from_pretrained(str(model_dir), **kwargs)
