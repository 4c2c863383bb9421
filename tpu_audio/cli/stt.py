"""STT command line: wav -> text.

Rebuild of the reference CLI (Sources/Tools/mlx-audio-swift-stt/App.swift):
transcribe with --format txt/srt/json, --stream per-chunk streaming, perf
stats. Usage: ``python -m tpu_audio.cli.stt audio.wav --model <dir-or-repo>``.
"""

from __future__ import annotations

import argparse
import json
import sys


def _format_srt_time(t: float) -> str:
    h = int(t // 3600)
    m = int(t % 3600 // 60)
    s = int(t % 60)
    ms = int((t - int(t)) * 1000)
    return f"{h:02}:{m:02}:{s:02},{ms:03}"


def main(argv=None):
    parser = argparse.ArgumentParser(prog="tpu-audio-stt", description=__doc__)
    parser.add_argument("audio", help="input audio file (wav)")
    parser.add_argument("--model", required=True, help="model dir or HF repo id")
    parser.add_argument("--language", default=None)
    parser.add_argument("--task", default="transcribe", choices=["transcribe", "translate"])
    parser.add_argument("--max-tokens", type=int, default=448)
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument("--format", default="txt", choices=["txt", "srt", "json"])
    parser.add_argument("--stream", action="store_true", help="stream per-chunk text")
    parser.add_argument("--text", default=None,
                        help="alignment text (required for forced aligner models)")
    parser.add_argument("--output", default=None, help="write result to file")
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--chunk-duration", type=float, default=None,
                        help="chunking window in seconds (model-dependent)")
    parser.add_argument("--kv-bits", type=int, default=None,
                        choices=[4, 8],
                        help="quantize the decode KV cache "
                        "(8=int8 symmetric, 4=packed affine int4)")
    parser.add_argument("--kv-group-size", type=int, default=64)
    parser.add_argument("--beam-size", type=int, default=None,
                        help="beam width for AED beam-decode models "
                             "(FireRedASR2: default 3, 1 = greedy)")
    parser.add_argument("--quantized-kv-start", type=int, default=0,
                        help="keep KV positions below this index full "
                        "precision (Generation.swift quantizedKVStart)")
    parser.add_argument("--no-batch-windows", action="store_true",
                        help="decode 30 s windows sequentially (reference "
                        "semantics) instead of the batched long-audio "
                        "decode; greedy output is identical on the XLA "
                        "dequant path (kv8-on-TPU sequential decode uses "
                        "a fused Pallas kernel with its own quantization "
                        "numerics, and temperature>0 sampling draws "
                        "per-window streams when batched)")
    args = parser.parse_args(argv)

    from tpu_audio.core.audio_io import load_audio
    from tpu_audio.core.generation import STTGenerateParameters
    from tpu_audio.models.stt import load_model

    model = load_model(args.model)
    audio, _sr = load_audio(args.audio, sample_rate=16000)
    params = STTGenerateParameters(
        language=args.language, task=args.task, max_tokens=args.max_tokens,
        temperature=args.temperature, verbose=args.verbose,
        chunk_duration=args.chunk_duration, kv_bits=args.kv_bits,
        kv_group_size=args.kv_group_size,
        quantized_kv_start=args.quantized_kv_start,
        beam_size=args.beam_size,
        batch_windows=not args.no_batch_windows,
    )

    import contextlib as _ctx

    from tpu_audio.core.profiling import maybe_trace

    _prof = _ctx.ExitStack()  # TPU_AUDIO_PROFILE=dir -> jax.profiler trace
    _prof.enter_context(maybe_trace("stt_generate"))

    if getattr(model, "is_forced_aligner", False):
        # forced aligner: (audio, --text) -> word timestamps
        # (reference App.swift:317-340)
        if args.stream:
            parser.error("--stream is not supported for forced aligner models")
        if not args.text:
            parser.error("--text is required when using a forced aligner model")
        from tpu_audio.core.generation import STTOutput, STTSegment

        aligned = model.generate(audio, text=args.text,
                                 language=args.language or "English")
        output = STTOutput(
            text=aligned.text,
            segments=[STTSegment(text=i.text, start=i.start_time,
                                 end=i.end_time) for i in aligned.items],
            language=args.language,
            prompt_token_count=aligned.prompt_tokens,
            total_time=aligned.total_time,
            generation_time=aligned.total_time,
        )
    elif args.stream and (hasattr(model, "encode_single_window")
                          or hasattr(model, "streaming_decode_token_ids")
                          or hasattr(model, "streaming_transcribe_window")):
        # live session (Qwen3ASR/Cohere/Moss cores) with provisional/
        # confirmed promotion, boundary-boost cadence, window finalization
        from tpu_audio.core.generation import STTOutput
        from tpu_audio.models.stt.streaming import (
            EventKind,
            StreamingInferenceSession,
        )

        session = StreamingInferenceSession(model, language=args.language)
        sr = getattr(getattr(model, "config", None), "sample_rate", None) \
            or getattr(model, "sample_rate", 16000)
        chunk = int(sr)  # 1 s cadence
        confirmed = ""
        stats = {}

        def consume(events):
            nonlocal confirmed, stats
            for ev in events:
                if ev.kind == EventKind.DISPLAY_UPDATE and args.verbose:
                    print(f"[display] {ev.confirmed_text} | {ev.text}",
                          file=sys.stderr)
                elif ev.kind in (EventKind.CONFIRMED, EventKind.ENDED):
                    if ev.confirmed_text:
                        print(ev.confirmed_text, flush=True)
                        confirmed = ev.confirmed_text
                elif ev.kind == EventKind.STATS:
                    stats = ev.stats

        for s in range(0, len(audio), chunk):
            consume(session.feed_audio(audio[s : s + chunk]))
        consume(session.stop())
        output = STTOutput(text=confirmed,
                           total_time=stats.get("wall_seconds", 0.0),
                           generation_time=stats.get("decode_time", 0.0))
        print(f"[stream] RTF {stats.get('real_time_factor', 0):.3f} "
              f"({stats.get('decode_passes', 0)} passes)", file=sys.stderr)
    elif args.stream:
        output = None
        for event in model.generate_stream(audio, params):
            if event["type"] == "token":
                print(event["text"], end=" ", flush=True)
            elif event["type"] == "result":
                output = event["output"]
        print()
    else:
        output = model.generate(audio, params)
    _prof.close()

    if args.format == "txt":
        text = output.text
    elif args.format == "srt":
        lines = []
        for i, seg in enumerate(output.segments, 1):
            lines += [str(i), f"{_format_srt_time(seg.start)} --> {_format_srt_time(seg.end)}",
                      seg.text, ""]
        text = "\n".join(lines)
    else:
        text = json.dumps({
            "text": output.text,
            "language": output.language,
            "segments": [
                {"text": s.text, "start": s.start, "end": s.end}
                for s in output.segments
            ],
        }, indent=2)

    if args.output:
        with open(args.output, "w") as f:
            f.write(text + "\n")
    if not args.stream or args.format != "txt":
        print(text)
    print(
        f"[stt] {output.generation_token_count} tokens in {output.total_time:.2f}s "
        f"({output.generation_tps:.1f} tok/s, audio {len(audio)/16000:.1f}s, "
        f"RTF {output.total_time/(len(audio)/16000):.3f})",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
