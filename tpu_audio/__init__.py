"""tpu-audio: a TPU-native (JAX/XLA/Pallas) audio ML framework.

A ground-up rebuild of the capability surface of MLX Audio Swift
(/root/reference) for TPU hardware: TTS, STT, STS, codecs, VAD/diarization,
LID and G2P, with `from_pretrained` HF loading, `generate` /
`generate_stream` APIs and jit-compiled KV-cached decode loops.
"""

__version__ = "0.1.0"


def load_tts(repo_or_path: str, **kw):
    """Load any TTS model by dir/repo (model_type-dispatched)."""
    from tpu_audio.models.tts import load_model

    return load_model(repo_or_path, **kw)


def load_stt(repo_or_path: str, **kw):
    """Load any STT model by dir/repo (model_type-dispatched)."""
    from tpu_audio.models.stt import load_model

    return load_model(repo_or_path, **kw)


def load_sts(repo_or_path: str, **kw):
    """Load any speech-to-speech model (enhance/separate/chat)."""
    from tpu_audio.models.sts import load_model

    return load_model(repo_or_path, **kw)


def load_codec(repo_or_path: str, **kw):
    """Load any audio codec by dir/repo."""
    from tpu_audio.codecs import load_codec as _load

    return _load(repo_or_path, **kw)
