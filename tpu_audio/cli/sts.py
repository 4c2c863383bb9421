"""STS command line: speech enhancement / text-prompted separation
(reference Sources/Tools/mlx-audio-swift-sts/App.swift: --mode
short|long|stream, streaming-to-disk at App.swift:359-396).

Usage:
  enhance:  ``python -m tpu_audio.cli.sts in.wav --model <dir> -o out.wav``
  separate: ``python -m tpu_audio.cli.sts in.wav --model <sam-dir>
             --prompt "a dog barking" -o target.wav``
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser(prog="tpu-audio-sts", description=__doc__)
    parser.add_argument("audio")
    parser.add_argument("--model", required=True)
    parser.add_argument("--mode", default="short",
                        choices=["short", "long", "stream"])
    parser.add_argument("--prompt", default=None,
                        help="text prompt for SAM-Audio separation")
    parser.add_argument("--residual-output", default=None,
                        help="also write the separation residual here")
    parser.add_argument("--chunk-seconds", type=float, default=10.0)
    parser.add_argument("--overlap-seconds", type=float, default=3.0)
    parser.add_argument("--ode-steps", type=int, default=16)
    parser.add_argument("-o", "--output", default="enhanced.wav")
    args = parser.parse_args(argv)

    import numpy as np

    from tpu_audio.core.audio_io import StreamingWAVWriter, load_audio, save_wav
    from tpu_audio.models.sts import load_model

    model = load_model(args.model)
    audio, sr = load_audio(args.audio, sample_rate=model.sample_rate)
    t0 = time.perf_counter()

    if args.prompt is not None:
        # SAM-Audio text-prompted separation
        if args.mode == "stream":
            with StreamingWAVWriter(args.output, model.sample_rate) as w:
                total = 0
                for target, _residual, _idx, _last in model.separate_streaming(
                        audio, [args.prompt],
                        chunk_seconds=args.chunk_seconds,
                        overlap_seconds=args.overlap_seconds,
                        n_steps=args.ode_steps):
                    w.append(np.asarray(target))
                    total += len(target)
        else:
            sep = (model.separate_long if args.mode == "long"
                   else model.separate)
            kwargs = dict(n_steps=args.ode_steps)
            if args.mode == "long":
                kwargs.update(chunk_seconds=args.chunk_seconds,
                              overlap_seconds=args.overlap_seconds)
            result = sep(audio, [args.prompt], **kwargs)
            save_wav(args.output, np.asarray(result.target[0]),
                     model.sample_rate)
            if args.residual_output:
                save_wav(args.residual_output,
                         np.asarray(result.residual[0]), model.sample_rate)
            total = len(result.target[0])
    elif args.mode == "stream":
        with StreamingWAVWriter(args.output, model.sample_rate) as w:
            total = 0
            for chunk in model.enhance_streaming(audio):
                w.append(chunk)
                total += len(chunk)
    else:
        out = model.enhance(audio)
        save_wav(args.output, np.asarray(out), model.sample_rate)
        total = len(out)
    dt = time.perf_counter() - t0
    dur = total / model.sample_rate
    print(f"[sts] {dur:.2f}s audio in {dt:.2f}s ({dur/dt:.1f}x realtime) "
          f"-> {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
