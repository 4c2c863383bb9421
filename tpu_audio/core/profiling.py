"""Opt-in device tracing — the TPU analog of the reference's point
profiling solutions (SURVEY.md §5: TTS CLI benchmark mode, per-stage
streamer profilers).

Set ``TPU_AUDIO_PROFILE=/some/dir`` and wrap work in
:func:`maybe_trace`: a full ``jax.profiler`` trace (XLA ops, fusion
boundaries, HBM traffic — viewable in TensorBoard/Perfetto) is written
under that directory. Without the env var the context is free.

The CLIs and ``bench.py`` wrap their hot path in this, so any run can be
traced without code changes:

    TPU_AUDIO_PROFILE=/tmp/trace python -m tpu_audio.cli.stt ...
"""

from __future__ import annotations

import contextlib
import os

__all__ = ["maybe_trace"]


@contextlib.contextmanager
def maybe_trace(label: str = "tpu_audio"):
    """Trace the enclosed block with ``jax.profiler`` when
    ``TPU_AUDIO_PROFILE`` names a directory; no-op otherwise."""
    target = os.environ.get("TPU_AUDIO_PROFILE")
    if not target:
        yield
        return
    import jax

    os.makedirs(target, exist_ok=True)
    with jax.profiler.trace(target):
        with jax.profiler.TraceAnnotation(label):
            yield
