"""Language ID CLI: wav -> top-k languages
(reference Sources/Tools/mlx-audio-swift-lid/App.swift).

Usage: ``python -m tpu_audio.cli.lid audio.wav --model <dir-or-repo>``
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(prog="tpu-audio-lid", description=__doc__)
    parser.add_argument("audio")
    parser.add_argument("--model", required=True)
    parser.add_argument("--top-k", type=int, default=5)
    args = parser.parse_args(argv)

    from tpu_audio.core.audio_io import load_audio
    from tpu_audio.models.lid import load_model

    model = load_model(args.model)
    audio, _ = load_audio(args.audio, sample_rate=16000)
    out = model.predict(audio, top_k=args.top_k)
    print(f"language: {out.language} ({out.confidence:.3f})")
    for p in out.top_languages:
        print(f"  {p.language:>16}  {p.confidence:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
