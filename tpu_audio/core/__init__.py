from tpu_audio.core import dsp  # noqa: F401
