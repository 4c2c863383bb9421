"""Voice agent pipeline example — the headless equivalent of the
reference's SimpleChat app (Examples/SimpleChat: mic -> SemanticVAD
(+ SmartTurn endpointing) -> local LLM -> TTS -> speaker).

This server-side version reads a WAV as the "microphone", converts it
through the streaming PCM converter, segments speech with a VAD,
transcribes each segment, forms a reply (pluggable `respond` hook —
wire in your LLM here), synthesizes it with a TTS model, and schedules
the audio chunks through the AudioPlayer sink into an output WAV.

Usage::

    python examples/voice_agent.py input.wav \
        --vad <silero-dir> --stt <whisper-dir> --tts <tts-dir> \
        [--smart-turn <smart-turn-dir>] -o reply.wav

All model directories are standard checkpoints loadable by the
respective registries (tests/fixtures.py can create tiny ones).
"""

from __future__ import annotations

import argparse
import sys
import time


def default_respond(transcript: str) -> str:
    """Replace with an LLM call; SimpleChat uses a local chat model."""
    transcript = transcript.strip()
    if not transcript:
        return "I did not catch that."
    return f"You said: {transcript}"


def make_llm_responder(model_dir: str, max_tokens: int = 64,
                       template: str = "User: {transcript}\nAssistant:"):
    """A real local-LLM responder over any llama-family chat checkpoint —
    the analog of SimpleChat's on-device chat model. Greedy decode in one
    jitted while_loop (prefill bucket + KV cache), tokenizer.json via the
    tokenizers library."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tokenizers import Tokenizer

    from tpu_audio.core import hub, loading
    from tpu_audio.models import llama

    d = hub.resolve_or_download_model(model_dir)
    raw = hub.load_config(d)
    cfg = llama.LlamaConfig.from_dict(raw)
    params = loading.load_params(
        d, sanitize=lambda w: llama.sanitize(w, cfg), dtype=jnp.bfloat16)
    params = llama.maybe_stack(params)
    tok = Tokenizer.from_file(str(__import__("pathlib").Path(d)
                                  / "tokenizer.json"))
    # instruct checkpoints list several stop ids (e.g. Llama-3's
    # [end_of_text, eom, eot]); decode must stop on ANY of them or the
    # loop runs past the end-of-turn into hallucinated extra turns
    eos = raw.get("eos_token_id", -1)
    eos_ids = list(eos) if isinstance(eos, (list, tuple)) else [eos]
    eos_ids = [int(t) for t in eos_ids] or [-1]
    eos_arr = jnp.asarray(eos_ids, jnp.int32)
    eos_set = set(eos_ids)

    @jax.jit
    def decode(params, prompt, n_prompt):
        max_len = prompt.shape[0] + max_tokens
        cache = llama.make_cache(cfg, 1, max_len, jnp.bfloat16,
                                 valid_from=prompt.shape[0] - n_prompt)
        _, cache = llama.forward(params, prompt[None, :-1], cache, cfg)
        out = jnp.zeros((max_tokens,), jnp.int32)

        def cond(c):
            _, i, _, last = c
            return jnp.logical_and(i < max_tokens,
                                   jnp.all(last != eos_arr))

        def body(c):
            out, i, cache, last = c
            logits, cache = llama.forward(params, last[None, None], cache,
                                          cfg)
            nxt = jnp.argmax(logits[0, -1].astype(jnp.float32)).astype(
                jnp.int32)
            return out.at[i].set(nxt), i + 1, cache, nxt

        out, count, *_ = jax.lax.while_loop(
            cond, body, (out, jnp.int32(0), cache, prompt[-1]))
        return out, count

    bucket = 64

    def respond(transcript: str) -> str:
        ids = tok.encode(template.format(
            transcript=transcript.strip())).ids
        pad = (-len(ids)) % bucket or 0
        buf = np.zeros((len(ids) + pad,), np.int32)
        buf[pad:] = ids
        out, count = decode(params, jnp.asarray(buf),
                            jnp.int32(len(ids)))
        reply_ids = [t for t in np.asarray(out)[: int(count)].tolist()
                     if t not in eos_set]
        text = tok.decode(reply_ids).strip()
        return text or default_respond(transcript)

    return respond


def run_agent(audio, sample_rate, vad_model, stt_model, tts_model,
              smart_turn=None, respond=default_respond, player_sink=None,
              verbose=True, incomplete_timeout_s=4.0):
    """One listen->transcribe->reply->speak turn per VAD segment.
    Returns a list of (transcript, reply, reply_audio).

    When SmartTurn judges a segment incomplete, it is buffered and merged
    with the following segment; if more than ``incomplete_timeout_s`` of
    audio passes without a completed turn, the buffered utterance is
    forced through anyway (the reference SimpleChat's incomplete-utterance
    timeout, SemanticVAD.swift:380-498)."""
    import numpy as np

    from tpu_audio.core.audio_stream import AudioPlayer, PCMStreamConverter
    from tpu_audio.models.vad.segmenter import segment_speech

    # mic front end: stream the input through the PCM converter in
    # 100 ms pushes (PCMStreamConverter.swift push/finish semantics)
    conv = PCMStreamConverter(16000)
    chunks = []
    hop = max(1, sample_rate // 10)
    for i in range(0, len(audio), hop):
        chunks.append(conv.push(audio[i:i + hop], in_rate=sample_rate))
    chunks.append(conv.finish())
    mic = np.concatenate([c for c in chunks if len(c)])

    segments = segment_speech(mic, 16000, vad_model)
    if verbose:
        print(f"[agent] {len(segments)} speech segment(s)", file=sys.stderr)

    player = AudioPlayer(tts_model.sample_rate, sink=player_sink)
    turns = []
    pending = None  # buffered incomplete utterance
    pending_since = 0.0
    # (transcript, reply, wav, play_start_s) — kept mutable for barge-in
    scheduled: list[list] = []
    tts_sr = tts_model.sample_rate
    for seg_audio, offset in segments:
        # barge-in (SimpleChat: VAD .started cancels the in-flight reply and
        # the UI stops playback, ConversationController.swift:345-351 +
        # stopSpeaking :283): a new user segment starting while the previous
        # reply would still be playing truncates that reply at the
        # interruption point
        if scheduled:
            prev = scheduled[-1]
            user_start = offset / 16000
            prev_end = prev[3] + len(prev[2]) / tts_sr
            if user_start < prev_end:
                keep = int(max(0.0, user_start - prev[3]) * tts_sr)
                if verbose:
                    cut = len(prev[2]) - keep
                    print(f"[agent] barge-in at {user_start:.2f}s: cut "
                          f"{cut / tts_sr:.2f}s of reply audio",
                          file=sys.stderr)
                prev[2] = prev[2][:keep]
        seg_end = (offset + len(seg_audio)) / 16000  # before the merge:
        # a buffered incomplete utterance must not inflate this turn's
        # playback-start time
        if pending is not None:
            seg_audio = np.concatenate([pending, seg_audio])
        if smart_turn is not None:
            ep = smart_turn.predict_endpoint(seg_audio)
            if verbose:
                print(f"[agent] endpoint p={ep.probability:.2f}",
                      file=sys.stderr)
            timed_out = pending is not None and (
                offset / 16000 - pending_since) > incomplete_timeout_s
            if not ep.prediction and not timed_out:
                # user still mid-utterance: buffer and wait for more
                if pending is None:
                    pending_since = offset / 16000
                pending = seg_audio
                continue
        pending = None
        t0 = time.perf_counter()
        result = stt_model.generate(seg_audio)
        transcript = result.text if hasattr(result, "text") else str(result)
        reply = respond(transcript)
        wav = np.asarray(tts_model.generate(reply))
        if verbose:
            dt = time.perf_counter() - t0
            print(f"[agent] {offset / 16000:.2f}s: {transcript!r} -> "
                  f"{reply!r} ({dt:.2f}s)", file=sys.stderr)
        # reply playback starts when the user's segment ends
        scheduled.append([transcript, reply, wav, seg_end])
    # stream the (possibly barge-in-truncated) replies through the player in
    # ~0.5 s chunks with crossfade
    step = max(1, tts_sr // 2)
    for transcript, reply, wav, _start in scheduled:
        for j in range(0, len(wav), step):
            player.schedule_audio_chunk(wav[j:j + step])
        turns.append((transcript, reply, wav))
    player.finish_streaming()
    return turns


def main(argv=None):
    parser = argparse.ArgumentParser(prog="voice-agent", description=__doc__)
    parser.add_argument("audio")
    parser.add_argument("--vad", required=True)
    parser.add_argument("--stt", required=True)
    parser.add_argument("--tts", required=True)
    parser.add_argument("--smart-turn", default=None)
    parser.add_argument("--llm", default=None,
                        help="llama-family chat checkpoint for real "
                             "replies (default: echo responder)")
    parser.add_argument("-o", "--output", default="reply.wav")
    args = parser.parse_args(argv)

    from tpu_audio.core.audio_io import StreamingWAVWriter, load_audio
    from tpu_audio.models.stt import load_model as load_stt
    from tpu_audio.models.tts import load_model as load_tts
    from tpu_audio.models.vad.silero import SileroVAD

    vad = SileroVAD.from_pretrained(args.vad)
    stt = load_stt(args.stt)
    tts = load_tts(args.tts)
    smart_turn = None
    if args.smart_turn:
        from tpu_audio.models.vad.smart_turn import SmartTurn

        smart_turn = SmartTurn.from_pretrained(args.smart_turn)

    respond = (make_llm_responder(args.llm) if args.llm
               else default_respond)
    audio, sr = load_audio(args.audio)
    with StreamingWAVWriter(args.output, tts.sample_rate) as writer:
        turns = run_agent(audio, sr, vad, stt, tts, smart_turn=smart_turn,
                          respond=respond, player_sink=writer.append)
    print(f"[agent] {len(turns)} turn(s) -> {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
