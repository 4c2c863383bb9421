"""TTS command line: text -> wav.

Rebuild of the reference CLI (Sources/Tools/mlx-audio-swift-tts/App.swift):
--voice / --ref_audio / --ref_text conditioning, --stream chunked synthesis,
--benchmark TTFB + RTFx metrics from the event stream (App.swift:128-175).

Usage: ``python -m tpu_audio.cli.tts "Hello" --model <dir-or-repo> -o out.wav``
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser(prog="tpu-audio-tts", description=__doc__)
    parser.add_argument("text")
    parser.add_argument("--model", required=True)
    parser.add_argument("--voice", default=None)
    parser.add_argument("--language", default=None,
                        help="language hint forwarded to the model")
    parser.add_argument("--ref-audio", default=None, help="reference wav for cloning")
    parser.add_argument("--ref-text", default=None, help="transcript of --ref-audio")
    parser.add_argument("--codec", default=None, help="codec dir/repo override")
    parser.add_argument("-o", "--output", default="output.wav")
    parser.add_argument("--max-tokens", type=int, default=1200)
    parser.add_argument("--temperature", type=float, default=None)
    parser.add_argument("--top-p", type=float, default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--stream", action="store_true",
                        help="write audio incrementally as it is generated")
    parser.add_argument("--benchmark", action="store_true",
                        help="report TTFB and RTFx from the stream")
    parser.add_argument("--timestamps", nargs="?", default=None,
                        const="mlx-community/Qwen3-ForcedAligner-0.6B-4bit",
                        metavar="ALIGNER",
                        help="emit word timestamps of the generated audio "
                             "via a Qwen3 forced aligner (App.swift:214-236)")
    parser.add_argument("--raw-ipa", action="store_true",
                        help="treat the input text as raw IPA phonemes "
                             "(bypasses the model's text processor)")
    parser.add_argument("--quantize", choices=("4", "8", "w8a8"),
                        default=None,
                        help="post-load-quantize a full-precision LM: 4/8 = "
                             "MLX grouped-affine, w8a8 = per-channel int8 "
                             "for the native MXU path (llama-family TTS)")
    parser.add_argument("--band-head", action="store_true",
                        help="decode with the lm_head sliced to the audio "
                             "token band + EOS (Orpheus-family): ~1 ms/token "
                             "less HBM traffic; outputs stay in-band by "
                             "construction")
    args = parser.parse_args(argv)

    import numpy as np

    from tpu_audio.core.audio_io import StreamingWAVWriter, load_audio, save_wav
    from tpu_audio.core.generation import AudioGenerationKind
    from tpu_audio.models.tts import load_model

    kwargs = {}
    if args.codec:
        kwargs["snac_repo"] = args.codec
    if args.band_head:
        kwargs["audio_band_head"] = True
    if args.quantize:
        kwargs["quantize_bits"] = (args.quantize if args.quantize == "w8a8"
                                   else int(args.quantize))
    try:
        model = load_model(args.model, **kwargs)
    except TypeError as e:
        if ("unexpected keyword argument" in str(e)
                and "quantize_bits" in str(e)):
            raise SystemExit(
                "--quantize is supported by the llama-family TTS models "
                "(Orpheus/llama_tts, VyvoTTS/qwen3, Qwen3TTS); this model "
                "does not take it") from e
        if ("unexpected keyword argument" in str(e)
                and "audio_band_head" in str(e)):
            raise SystemExit(
                "--band-head is supported by the Orpheus-family models "
                "(llama_tts); this model does not take it") from e
        raise
    if args.raw_ipa and hasattr(model, "text_processor"):
        # PassthroughProcessor equivalent (App.swift:93)
        model.text_processor = None
    params = model.default_generation_parameters()
    params.max_tokens = args.max_tokens
    if args.temperature is not None:
        params.temperature = args.temperature
    if args.top_p is not None:
        params.top_p = args.top_p
    if args.seed is not None:
        params.seed = args.seed

    ref_audio = None
    if args.ref_audio:
        ref_audio, _ = load_audio(args.ref_audio, sample_rate=model.sample_rate)

    import contextlib as _ctx

    from tpu_audio.core.profiling import maybe_trace

    _prof = _ctx.ExitStack()  # TPU_AUDIO_PROFILE=dir -> jax.profiler trace
    _prof.enter_context(maybe_trace("tts_generate"))

    if args.stream or args.benchmark:
        t0 = time.perf_counter()
        ttfb = None
        total_samples = 0
        info = None
        with StreamingWAVWriter(args.output, model.sample_rate) as writer:
            for ev in model.generate_stream(
                args.text, voice=args.voice, ref_audio=ref_audio,
                ref_text=args.ref_text, language=args.language,
                generation_parameters=params,
            ):
                if ev.kind == AudioGenerationKind.AUDIO:
                    if ttfb is None:
                        ttfb = time.perf_counter() - t0
                    writer.append(ev.audio)
                    total_samples += len(ev.audio)
                elif ev.kind == AudioGenerationKind.INFO:
                    info = ev.info
        wall = time.perf_counter() - t0
        dur = total_samples / model.sample_rate
        rtfx = dur / wall if wall else 0.0
        print(f"[tts] {dur:.2f}s audio -> {args.output}", file=sys.stderr)
        if args.benchmark:
            print(f"[bench] TTFB {ttfb:.3f}s  RTFx {rtfx:.2f}x  wall {wall:.2f}s"
                  + (f"  tok/s {info.tokens_per_second:.1f}" if info else ""),
                  file=sys.stderr)
    else:
        t0 = time.perf_counter()
        audio = model.generate(
            args.text, voice=args.voice, ref_audio=ref_audio,
            ref_text=args.ref_text, language=args.language,
            generation_parameters=params,
        )
        wall = time.perf_counter() - t0
        save_wav(args.output, np.asarray(audio), model.sample_rate)
        dur = len(audio) / model.sample_rate
        print(f"[tts] {dur:.2f}s audio in {wall:.2f}s "
              f"(RTFx {dur/wall:.2f}x) -> {args.output}", file=sys.stderr)
    _prof.close()

    if args.timestamps:
        from tpu_audio.core.audio_io import resample_audio
        from tpu_audio.models.stt import load_model as load_stt

        aligner = load_stt(args.timestamps)
        wav, sr = load_audio(args.output)
        aligned = aligner.generate(resample_audio(wav, sr, 16000),
                                   text=args.text, language="English")
        print("Timestamps:")
        for item in aligned.items:
            print(f"  [{item.start_time:.3f}s - {item.end_time:.3f}s] "
                  f"{item.text}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
