"""AOT warmup CLI: precompile a model's steady-state graphs.

Production TPU deployments should treat XLA compilation as a build step
(README "Cold compile and AOT"): this tool loads a checkpoint, enables the
persistent compilation cache, and drives each hot entrypoint once so every
jitted graph serializes to the cache directory. Ship that directory with
the container image and later process starts replay the compiles in
seconds. The reference has no analog (MLX compiles per-process lazily,
`compile{}` at ParakeetModel.swift:319-330); on TPU the cold compile of a
3B-scale graph is minutes, so warmup-at-build is the deployment story.

Usage:
    python -m tpu_audio.cli.warmup --model DIR [--task auto]
        [--seconds 30] [--text "..."] [--max-tokens 256]
        [--slots N] [--cache-dir .jax_cache] [--verify]

``--verify`` re-runs the same shapes a second time and reports the warm
wall time so the cache hit can be confirmed.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

__all__ = ["main", "detect_task", "warm_model"]

_TASKS = ("stt", "tts", "sts", "codec", "lid", "vad")


def detect_task(model_dir: str) -> str | None:
    """Resolve which task registry owns this checkpoint's model_type
    (the per-task factories at models/*/__init__.py mirror the reference's
    TTSModel.swift:104-219 / MLXAudioSTT.swift:51-85 switches)."""
    cfg = Path(model_dir) / "config.json"
    if not cfg.exists():
        return None
    model_type = (json.loads(cfg.read_text()).get("model_type") or "").lower()
    if not model_type:
        return None
    import importlib

    for task in _TASKS:
        mod = importlib.import_module(
            "tpu_audio.codecs" if task == "codec"
            else f"tpu_audio.models.{task}")
        if model_type in getattr(mod, "_REGISTRY", {}):
            return task
    return None


def _drive(task: str, model, args) -> None:
    import numpy as np

    if task == "tts":
        params = model.default_generation_parameters()
        params.max_tokens = args.max_tokens
        params.seed = 0
        model.generate(args.text, generation_parameters=params)
        return
    sr = getattr(model, "sample_rate", 16000)
    audio = np.zeros(int(args.seconds * sr), np.float32)
    audio[:: sr // 100] = 0.1  # clicks: keep VAD/energy chunkers non-trivial
    if task == "stt":
        model.generate(audio)
    elif task == "codec":
        model.reconstruct(audio)
    elif task == "lid":
        model.predict(audio)
    elif task == "vad":
        if hasattr(model, "generate"):
            model.generate(audio)
        else:
            model.predict_proba(audio, sr)
    elif task == "sts":
        if hasattr(model, "enhance"):
            model.enhance(audio)
        elif hasattr(model, "separate"):
            model.separate(audio, args.text or "speech")
        else:
            raise SystemExit(
                "chat-style STS models need task-specific warmup; drive "
                "them through their own generate API")


def _warm_serving(task: str, model, args) -> bool:
    """Compile the continuous-serving tick graphs (``--slots N``): every
    lane-bucket decode graph, the prefill bucket(s), and — for w8a8
    checkpoints on TPU — the M-lane fused Pallas kernels, whose remote
    Mosaic compiles are the most expensive cold-start item a serving
    deployment pays (minutes per kernel instance; see docs/DESIGN.md).
    Occupancy is raised one request at a time so each power-of-two lane
    bucket traces. Returns False when the task/model has no serving
    engine."""
    import numpy as np

    if task == "stt" and hasattr(model, "_suppress_masks"):
        from tpu_audio.parallel.continuous_stt import ContinuousSTT

        srv = ContinuousSTT(model, slots=args.slots, max_tokens=8,
                            step_tokens=2, min_tick_tokens=2)
        audio = np.zeros(16000, np.float32)
        for _ in range(args.slots):
            srv.submit(audio, language="en")
            srv.step()
        srv.drain()
        return True
    if task == "tts" and hasattr(model, "_fused_lane_hooks"):
        from tpu_audio.parallel.continuous import ContinuousTTS

        gp = model.default_generation_parameters()
        gp.max_tokens = 16
        srv = ContinuousTTS(model, slots=args.slots,
                            generation_parameters=gp)
        for _ in range(args.slots):
            srv.submit(args.text)
            srv.step()
        for _ in srv.run():
            pass
        return True
    return False


def warm_model(model_dir: str, task: str, args) -> dict:
    import importlib

    loader = importlib.import_module(
        "tpu_audio.codecs" if task == "codec"
        else f"tpu_audio.models.{task}")
    t0 = time.perf_counter()
    model = loader.load_model(model_dir) if task != "codec" \
        else loader.load_codec(model_dir)
    load_s = time.perf_counter() - t0

    t1 = time.perf_counter()
    _drive(task, model, args)
    cold_s = time.perf_counter() - t1
    out = {"task": task, "load_s": round(load_s, 2),
           "compile_and_run_s": round(cold_s, 2)}
    if getattr(args, "slots", 0):
        t_srv = time.perf_counter()
        if _warm_serving(task, model, args):
            out["serving_compile_s"] = round(
                time.perf_counter() - t_srv, 2)
        else:
            out["serving_compile_s"] = None  # no engine for this task
    if args.verify:
        # drop the in-process executable cache so the verify run exercises
        # the PERSISTENT cache deserialization path — the thing a shipped
        # container will actually hit (a read-only/failed cache dir would
        # otherwise go unnoticed behind the in-memory hit)
        import jax

        jax.clear_caches()
        t2 = time.perf_counter()
        _drive(task, model, args)
        out["warm_run_s"] = round(time.perf_counter() - t2, 2)
    return out


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        "tpu-audio-warmup",
        description="Precompile a model's steady-state graphs into the "
                    "persistent XLA compilation cache (AOT build step).")
    parser.add_argument("--model", required=True)
    parser.add_argument("--task", default="auto", choices=("auto",) + _TASKS)
    parser.add_argument("--seconds", type=float, default=30.0,
                        help="synthetic audio length for audio-input tasks "
                             "(use the deployment chunk length)")
    parser.add_argument("--text", default="Warm up the decode graphs.",
                        help="warmup text for TTS")
    parser.add_argument("--max-tokens", type=int, default=256,
                        help="TTS decode-chunk bucket to compile")
    parser.add_argument("--slots", type=int, default=0,
                        help="also compile the continuous-serving tick "
                             "graphs for N lanes (whisper STT / "
                             "Orpheus-family TTS), incl. the fused "
                             "M-lane Pallas kernels for w8a8 models")
    parser.add_argument("--cache-dir", default=".jax_cache")
    parser.add_argument("--verify", action="store_true",
                        help="run each shape twice and report the warm time")
    args = parser.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(args.cache_dir).resolve()))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpu_audio.core import hub

    model_dir = hub.resolve_or_download_model(args.model)
    task = args.task
    if task == "auto":
        task = detect_task(model_dir)
        if task is None:
            raise SystemExit(
                f"cannot infer task from {model_dir}/config.json "
                f"model_type; pass --task")
    result = warm_model(model_dir, task, args)
    result["cache_dir"] = str(Path(args.cache_dir).resolve())
    print(json.dumps(result))


if __name__ == "__main__":
    main()
