"""STS command line: speech enhancement / separation
(reference Sources/Tools/mlx-audio-swift-sts/App.swift).

Usage: ``python -m tpu_audio.cli.sts in.wav --model <dir-or-repo> -o out.wav``
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser(prog="tpu-audio-sts", description=__doc__)
    parser.add_argument("audio")
    parser.add_argument("--model", required=True)
    parser.add_argument("--mode", default="short", choices=["short", "stream"])
    parser.add_argument("-o", "--output", default="enhanced.wav")
    args = parser.parse_args(argv)

    import numpy as np

    from tpu_audio.core.audio_io import StreamingWAVWriter, load_audio, save_wav
    from tpu_audio.models.sts import load_model

    model = load_model(args.model)
    audio, sr = load_audio(args.audio, sample_rate=model.sample_rate)
    t0 = time.perf_counter()
    if args.mode == "stream":
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
