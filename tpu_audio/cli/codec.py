"""Codec roundtrip CLI: encode+decode any codec repo and write the
reconstruction (reference Tools/mlx-audio-swift-codec/App.swift:34-93).

Usage: ``python -m tpu_audio.cli.codec in.wav --model <dir-or-repo> -o out.wav``
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser(prog="tpu-audio-codec", description=__doc__)
    parser.add_argument("audio")
    parser.add_argument("--model", required=True)
    parser.add_argument("--codec-type", default=None)
    parser.add_argument("-o", "--output", default="reconstructed.wav")
    args = parser.parse_args(argv)

    import numpy as np

    from tpu_audio.codecs import load_codec
    from tpu_audio.core.audio_io import load_audio, save_wav

    codec = load_codec(args.model, codec_type=args.codec_type)
    audio, sr = load_audio(args.audio, sample_rate=codec.sample_rate)
    t0 = time.perf_counter()
    codes = codec.encode(audio)
    out = np.asarray(codec.decode(codes))
    if out.ndim == 3 and out.shape[-1] == 1:  # [B, T, C] mono -> [B, T]
        out = out[..., 0]
    out = out[..., : len(audio)]
    dt = time.perf_counter() - t0
    save_wav(args.output, out[0], codec.sample_rate)
    import jax

    n_tokens = sum(int(np.asarray(leaf).size)
                   for leaf in jax.tree_util.tree_leaves(codes)
                   if np.issubdtype(np.asarray(leaf).dtype, np.integer))
    print(f"[codec] {len(audio)/sr:.2f}s audio -> {n_tokens} tokens -> {args.output} "
          f"({dt:.2f}s, {len(audio)/sr/dt:.1f}x realtime)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
