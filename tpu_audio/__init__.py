"""tpu-audio: a TPU-native (JAX/XLA/Pallas) audio ML framework.

A ground-up rebuild of the capability surface of MLX Audio Swift
(/root/reference) for TPU hardware: TTS, STT, STS, codecs, VAD/diarization,
LID and G2P, with `from_pretrained` HF loading, `generate` /
`generate_stream` APIs and jit-compiled KV-cached decode loops.
"""

__version__ = "0.1.0"
