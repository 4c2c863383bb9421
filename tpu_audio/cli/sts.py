"""STS command line: speech enhancement / text-prompted separation /
LFM2.5-Audio chat (reference Sources/Tools/mlx-audio-swift-sts/App.swift:
--mode short|long|stream, streaming-to-disk at App.swift:359-396, LFM chat
flags --text/--system/--audio-temperature/--audio-top-k).

Usage:
  enhance:  ``python -m tpu_audio.cli.sts in.wav --model <dir> -o out.wav``
  separate: ``python -m tpu_audio.cli.sts in.wav --model <sam-dir>
             --prompt "a dog barking" -o target.wav``
  chat:     ``python -m tpu_audio.cli.sts q.wav --model <lfm-dir>
             --system "You are an assistant" -o reply.wav``
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser(prog="tpu-audio-sts", description=__doc__)
    parser.add_argument("audio", nargs="?", default=None)
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
    # LFM2.5-Audio chat surface (App.swift LFM flags)
    parser.add_argument("--text", default=None,
                        help="user text turn for LFM chat")
    parser.add_argument("--system", default=None,
                        help="system prompt for LFM chat")
    parser.add_argument("--max-new-tokens", type=int, default=256)
    parser.add_argument("--temperature", type=float, default=0.7)
    parser.add_argument("--top-k", type=int, default=50)
    parser.add_argument("--audio-temperature", type=float, default=1.0)
    parser.add_argument("--audio-top-k", type=int, default=4)
    parser.add_argument("--output-text", default=None,
                        help="write the chat text reply to this file")
    parser.add_argument("--text-only", action="store_true",
                        help="chat: reply in text only (no audio synthesis)")
    args = parser.parse_args(argv)

    import numpy as np

    from tpu_audio.core.audio_io import StreamingWAVWriter, load_audio, save_wav
    from tpu_audio.models.sts import load_model
    from tpu_audio.models.sts.lfm_audio import LFM2Audio

    model = load_model(args.model)
    if isinstance(model, LFM2Audio):
        return _chat(model, args)
    if args.audio is None:
        parser.error("an input wav is required for enhance/separate")
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


def _chat(model, args):
    """LFM2.5-Audio voice/text chat turn (LFMAudioModel.swift:394-559)."""
    import numpy as np

    from tpu_audio.core.audio_io import load_audio, save_wav

    user_audio = None
    if args.audio is not None:
        user_audio, _ = load_audio(args.audio, sample_rate=16000)
    modality = "text" if args.text_only else "audio"
    segments = model.build_chat(args.system, user_text=args.text,
                                user_audio=user_audio,
                                assistant_modality=modality)
    t0 = time.perf_counter()
    text_ids, codes = model.generate(
        text_tokens=segments, max_new_tokens=args.max_new_tokens,
        temperature=args.temperature, top_k=args.top_k,
        audio_temperature=args.audio_temperature,
        audio_top_k=args.audio_top_k)
    dt = time.perf_counter() - t0
    reply = model.tokenizer.decode(list(map(int, text_ids))) \
        if model.tokenizer is not None else ""
    if reply:
        print(reply)
    if args.output_text:
        with open(args.output_text, "w") as f:
            f.write(reply + "\n")
    n_frames = int(np.asarray(codes).shape[-1]) if np.asarray(codes).size else 0
    if modality == "audio" and n_frames:
        wav = model.decode_audio(codes)
        if wav.size:
            save_wav(args.output, wav, model.sample_rate)
            print(f"[sts] chat: {len(text_ids)} text tokens + "
                  f"{len(wav)/model.sample_rate:.2f}s audio in {dt:.2f}s "
                  f"-> {args.output}", file=sys.stderr)
            return 0
    print(f"[sts] chat: {len(text_ids)} text tokens in {dt:.2f}s",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
