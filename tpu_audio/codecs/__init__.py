"""Neural audio codecs: the token <-> waveform layer.

Mirrors the reference's MLXAudioCodecs protocol surface
(Sources/MLXAudioCodecs/AudioCodecModel.swift:4-27): every codec exposes
``encode`` / ``decode`` / ``reconstruct`` plus ``from_pretrained``.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from tpu_audio.core import hub

__all__ = ["AudioCodecModel", "load_codec", "register"]


class AudioCodecModel(ABC):
    """Codec protocol: waveform [B?, T] <-> discrete codes."""

    sample_rate: int

    @abstractmethod
    def encode(self, audio):
        """waveform -> codes (codec-specific structure)"""

    @abstractmethod
    def decode(self, codes):
        """codes -> waveform"""

    def reconstruct(self, audio):
        """encode then decode (codec CLI roundtrip,
        reference AudioCodecModel.swift:23)."""
        return self.decode(self.encode(audio))


_REGISTRY: dict[str, str] = {
    "snac": "tpu_audio.codecs.snac:SNAC",
    "mimi": "tpu_audio.codecs.mimi:Mimi",
    "encodec": "tpu_audio.codecs.encodec:Encodec",
    "bigvgan": "tpu_audio.codecs.bigvgan:BigVGAN",
    "dac": "tpu_audio.codecs.dac:DescriptDAC",
    "dacvae": "tpu_audio.codecs.dacvae:DACVAE",
    "fish_s1_dac": "tpu_audio.codecs.fish_s1_dac:FishS1DAC",
    "s3tokenizer": "tpu_audio.codecs.s3_tokenizer:S3TokenizerV2",
    "higgs_audio_v2_tokenizer": "tpu_audio.codecs.higgs:HiggsAudioTokenizer",
    "higgs": "tpu_audio.codecs.higgs:HiggsAudioTokenizer",
    "higgs_audio_tokenizer":
        "tpu_audio.codecs.higgs_audio:HiggsAudioTokenizer",
    "moss_audio_tokenizer": "tpu_audio.codecs.moss_tokenizer:MossAudioTokenizer",
    "mossaudio": "tpu_audio.codecs.moss_tokenizer:MossAudioTokenizer",
    "s3_tokenizer": "tpu_audio.codecs.s3_tokenizer:S3TokenizerV2",
    "firefly": "tpu_audio.codecs.fish_s1_dac:FishS1DAC",
    "descript": "tpu_audio.codecs.dac:DescriptDAC",
}


def register(name: str, target: str) -> None:
    _REGISTRY[name] = target


def load_codec(repo_or_path: str, codec_type: str | None = None, **kwargs):
    model_dir = hub.resolve_or_download_model(repo_or_path)
    if codec_type is None:
        cfg = hub.load_config(model_dir)
        codec_type = cfg.get("model_type")
        if codec_type is None:
            name = str(repo_or_path).lower()
            for key in _REGISTRY:
                if key in name:
                    codec_type = key
                    break
    if codec_type not in _REGISTRY:
        raise ValueError(f"unsupported codec {codec_type!r} (supported: {sorted(_REGISTRY)})")
    import importlib

    module_name, cls_name = _REGISTRY[codec_type].split(":")
    cls = getattr(importlib.import_module(module_name), cls_name)
    return cls.from_pretrained(str(model_dir), **kwargs)
