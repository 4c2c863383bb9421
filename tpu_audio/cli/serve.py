"""Inference HTTP server: production serving surface over any model.

New TPU-native surface (the reference is an on-device SDK with no server;
SURVEY.md §2.0): a dependency-free stdlib HTTP front end over the task
factories, suitable as the single-chip serving unit behind a load
balancer. Endpoints follow the OpenAI audio API paths:

- ``POST /v1/audio/transcriptions`` — body = raw WAV bytes
  (``curl --data-binary @in.wav``); JSON out: text/segments/language +
  timing. STT models.
- ``POST /v1/audio/transcriptions/stream`` — same body; chunked
  ``application/x-ndjson``: one ``{"type": "token", "text": ...}`` line
  per transcribed chunk as the model emits it, then a final
  ``{"type": "result", ...}`` line with text/segments/language.
- ``POST /v1/audio/speech`` — JSON body ``{"input": "...", "voice": ...,
  "max_tokens": ..., "seed": ...}``; WAV bytes out. TTS models. Voice
  cloning: ``"ref_audio_b64"`` (base64 WAV bytes) + ``"ref_text"``.
- ``POST /v1/audio/speech/stream`` — same body as /speech; response is
  **chunked raw PCM16** (``Content-Type: audio/L16; rate=<sr>``): each
  synthesized audio chunk flushes as soon as the model emits it, so
  playback can start at time-to-first-chunk instead of full synthesis.
- ``POST /v1/audio/enhance`` — raw WAV in, enhanced WAV out. STS
  enhancement models.
- ``POST /v1/audio/lid`` — raw WAV in; JSON
  ``{"language", "confidence", "top": [{"language", "confidence"}...]}``.
  LID models (``?top_k=N`` query, default 5).
- ``POST /v1/audio/codec`` — raw WAV in, encode+decode reconstruction
  WAV out (codec repos; the roundtrip the codec CLI performs).
- ``POST /v1/audio/vad`` — raw WAV in; JSON speech segments. Sortformer
  returns speaker-labelled diarization (``{"segments": [{"start",
  "end", "speaker"}], "num_speakers"}``); Silero/FSMN return plain
  speech runs.
- ``GET /healthz`` — liveness + model metadata.
- ``GET /metrics`` — Prometheus text format: per-route request/error
  counts and wall-time totals.

Device access is serialized with a lock (one model graph per chip);
``--slots N`` upgrades TTS serving to continuous batching — concurrent
speech requests decode together in one jitted ``[slots, ...]`` step
(``tpu_audio.parallel.continuous.TTSEngineWorker``) instead of queueing
on the lock. Scale-out beyond one chip belongs to the mesh layer
(``tpu_audio.parallel.serve.BatchServer``). Start with:

    python -m tpu_audio.cli.serve --model DIR [--task auto] [--port 8080]
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import tempfile
import threading
import time
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

__all__ = ["main", "build_server"]


def _wav_bytes(audio: np.ndarray, sample_rate: int) -> bytes:
    from tpu_audio.core.audio_io import float_to_pcm16

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(float_to_pcm16(audio).tobytes())
    return buf.getvalue()


def _load_wav_body(body: bytes, target_sr: int | None):
    from tpu_audio.core.audio_io import load_audio

    with tempfile.NamedTemporaryFile(suffix=".wav") as f:
        f.write(body)
        f.flush()
        return load_audio(f.name, sample_rate=target_sr)


def _ref_audio(req: dict, model):
    """Decode the request's base64-WAV cloning reference, if any."""
    if not req.get("ref_audio_b64"):
        return None
    import base64

    audio, _ = _load_wav_body(base64.b64decode(req["ref_audio_b64"]),
                              getattr(model, "sample_rate", 24000))
    return audio


_KNOWN_ROUTES = (
    "/v1/audio/transcriptions", "/v1/audio/transcriptions/stream",
    "/v1/audio/speech", "/v1/audio/speech/stream", "/v1/audio/enhance",
    "/v1/audio/lid", "/v1/audio/vad", "/v1/audio/codec",
    "/healthz", "/metrics",
)


class _Metrics:
    """Per-route counters in Prometheus text exposition format.

    Label values are the closed set of known routes (+ ``other``), never
    the raw request path: unique scanner paths must not grow the label
    space unboundedly or inject quotes/newlines into the exposition."""

    def __init__(self):
        self._lock = threading.Lock()
        self.requests: dict[str, int] = {}
        self.errors: dict[str, int] = {}
        self.wall: dict[str, float] = {}

    def observe(self, route: str, seconds: float, error: bool) -> None:
        route = route.split("?", 1)[0].rstrip("/") or "/"
        if route not in _KNOWN_ROUTES:
            route = "other"
        with self._lock:
            self.requests[route] = self.requests.get(route, 0) + 1
            self.wall[route] = self.wall.get(route, 0.0) + seconds
            if error:
                self.errors[route] = self.errors.get(route, 0) + 1

    def render(self) -> str:
        lines = [
            "# TYPE tpu_audio_requests_total counter",
            "# TYPE tpu_audio_errors_total counter",
            "# TYPE tpu_audio_request_seconds_total counter",
        ]
        with self._lock:
            for route, n in sorted(self.requests.items()):
                lines.append(
                    f'tpu_audio_requests_total{{route="{route}"}} {n}')
                lines.append(
                    f'tpu_audio_request_seconds_total{{route="{route}"}} '
                    f'{self.wall[route]:.6f}')
            for route, n in sorted(self.errors.items()):
                lines.append(
                    f'tpu_audio_errors_total{{route="{route}"}} {n}')
        return "\n".join(lines) + "\n"


class _LIDBatcher:
    """Micro-batches concurrent /v1/audio/lid requests into one device
    dispatch (ecapa_lid.predict_batch).

    On a tunneled chip the fixed dispatch+readback cost (~50 ms)
    dominates the 3 ms fused LID graph, so a per-request device call
    caps the endpoint at ~18 req/s no matter how light the model is.
    The batcher thread drains whatever arrived within ``window_s`` of
    the first request (up to ``max_batch``) and classifies them in one
    padded masked-batch call — p50 under concurrency drops from
    N x round-trip to round-trip + window."""

    def __init__(self, model, window_s: float = 0.004,
                 max_batch: int = 16):
        import queue

        self.model = model
        self.window_s = float(window_s)
        self.max_batch = int(max_batch)
        self._q: "queue.Queue" = queue.Queue()
        self._queue_mod = queue
        t = threading.Thread(target=self._run, daemon=True,
                             name="lid-batcher")
        t.start()

    def predict(self, audio, top_k: int):
        done = threading.Event()
        box: dict = {}
        self._q.put((audio, int(top_k), done, box))
        done.wait()
        if "err" in box:
            raise box["err"]
        return box["out"]

    def _run(self) -> None:
        from tpu_audio.models.lid.wav2vec2_lid import LIDOutput

        while True:
            batch = [self._q.get()]
            deadline = time.perf_counter() + self.window_s
            while len(batch) < self.max_batch:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except self._queue_mod.Empty:
                    break
            try:
                k_max = max(k for _, k, _, _ in batch)
                outs = self.model.predict_batch(
                    [a for a, _, _, _ in batch], top_k=k_max)
                for (_, k, done, box), o in zip(batch, outs):
                    box["out"] = LIDOutput(o.language, o.confidence,
                                           o.top_languages[:k])
                    done.set()
            except Exception as e:  # noqa: BLE001 — unblock all waiters
                for _, _, done, box in batch:
                    box["err"] = e
                    done.set()


def build_server(model, task: str, model_name: str,
                 host: str = "127.0.0.1", port: int = 8080,
                 slots: int = 1, generation_parameters=None,
                 step_tokens: int = 7, fused: str = "auto"):
    """Construct (but don't start) the ThreadingHTTPServer for ``model``.

    ``slots > 1`` on a TTS task routes the speech endpoints through a
    shared :class:`~tpu_audio.parallel.continuous.TTSEngineWorker`:
    concurrent requests decode together in one continuously-batched
    jitted step instead of serializing on the device lock. Sampling
    parameters are then fixed per server (``max_tokens``/``seed``/
    ``voice`` stay per-request); the server's jitted graph bakes them in.
    """
    lock = threading.Lock()
    metrics = _Metrics()
    worker = None
    stt_worker = None
    if slots > 1 and task == "tts":
        from tpu_audio.models.tts.qwen3_tts import Qwen3TTS

        if isinstance(model, Qwen3TTS):
            from tpu_audio.parallel.continuous_qwen3 import (
                Qwen3TTSEngineWorker,
            )

            worker = Qwen3TTSEngineWorker(
                model, slots=slots,
                generation_parameters=generation_parameters)
        else:
            from tpu_audio.parallel.continuous import TTSEngineWorker

            worker = TTSEngineWorker(
                model, slots=slots,
                generation_parameters=generation_parameters,
                step_tokens=step_tokens, fused=fused)
    elif slots > 1 and task == "stt":
        from tpu_audio.models.stt.qwen3_asr import Qwen3ASR
        from tpu_audio.models.stt.whisper import Whisper

        if isinstance(model, (Whisper, Qwen3ASR)):
            from tpu_audio.parallel.continuous_stt import (
                ContinuousQwen3ASR, STTEngineWorker)

            stt_kw = ({} if isinstance(model, Qwen3ASR)
                      else {"fused": fused})
            stt_worker = STTEngineWorker(
                model, slots=slots, step_tokens=step_tokens,
                engine_cls=(ContinuousQwen3ASR
                            if isinstance(model, Qwen3ASR) else None),
                **stt_kw)
    lid_batcher = (_LIDBatcher(model)
                   if task == "lid" and hasattr(model, "predict_batch")
                   else None)

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, payload: bytes,
                  ctype: str = "application/json") -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _json(self, code: int, obj) -> None:
            self._send(code, json.dumps(obj).encode())

        def _body(self) -> bytes | None:
            """Request body, or None when no Content-Length was sent
            (chunked encoding would desync the keep-alive connection)."""
            if self.headers.get("Content-Length") is None:
                return None
            return self.rfile.read(int(self.headers["Content-Length"]))

        def _stream_chunks(self, ctype: str, chunks) -> None:
            """Chunked transfer encoding: flush each piece as it arrives."""
            self._streaming = True
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            for piece in chunks:
                data = bytes(piece)
                if not data:
                    continue
                self.wfile.write(f"{len(data):x}\r\n".encode())
                self.wfile.write(data)
                self.wfile.write(b"\r\n")
                self.wfile.flush()
            self.wfile.write(b"0\r\n\r\n")

        def _speech_batched(self, req: dict) -> None:
            """Speech request via the continuous-batching worker: events
            for this request arrive as the shared engine steps, so many
            connections synthesize concurrently on one device."""
            from tpu_audio.core.audio_io import float_to_pcm16
            from tpu_audio.core.generation import AudioGenerationKind

            events = worker.synthesize(
                req.get("input", ""), voice=req.get("voice"),
                ref_audio=_ref_audio(req, model),
                ref_text=req.get("ref_text"),
                max_tokens=(int(req["max_tokens"])
                            if req.get("max_tokens") is not None else None),
                seed=int(req.get("seed") or 0))
            try:
                chunks = (np.asarray(ev.audio) for ev in events
                          if ev.kind == AudioGenerationKind.AUDIO)
                if self.path.endswith("/stream"):
                    self._stream_chunks(
                        f"audio/L16; rate={model.sample_rate}",
                        (float_to_pcm16(c).tobytes() for c in chunks))
                else:
                    parts = [c for c in chunks if c.size]
                    wav = (np.concatenate(parts) if parts
                           else np.zeros((0,), np.float32))
                    self._send(200, _wav_bytes(wav, model.sample_rate),
                               "audio/wav")
            finally:
                # a broken client connection mid-stream cancels the
                # request and frees its decode lane immediately
                events.close()

        def do_GET(self):  # noqa: N802 — http.server API
            if self.path == "/healthz":
                self._json(200, {"ok": True, "task": task,
                                 "model": model_name})
            elif self.path == "/metrics":
                self._send(200, metrics.render().encode(),
                           "text/plain; version=0.0.4")
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):  # noqa: N802 — http.server API
            t_start = time.perf_counter()
            failed = False
            self._streaming = False
            try:
                body = self._body()
                if body is None:
                    self.close_connection = True
                    failed = True
                    self._json(411, {"error": "Content-Length required"})
                    return
                if (self.path == "/v1/audio/transcriptions/stream"
                        and task == "stt"):
                    audio, _ = _load_wav_body(
                        body, getattr(model, "sample_rate", 16000))

                    def ndjson():
                        with lock:
                            for ev in model.generate_stream(audio):
                                if ev.get("type") == "result":
                                    out = ev["output"]
                                    ev = {"type": "result",
                                          "text": out.text,
                                          "language": out.language,
                                          "segments": [
                                              {"text": s.text,
                                               "start": s.start,
                                               "end": s.end}
                                              for s in (out.segments or [])]}
                                yield (json.dumps(ev) + "\n").encode()

                    self._stream_chunks("application/x-ndjson", ndjson())
                elif self.path == "/v1/audio/transcriptions" and task == "stt":
                    audio, _ = _load_wav_body(
                        body, getattr(model, "sample_rate", 16000))
                    t0 = time.perf_counter()
                    if (stt_worker is not None
                            and len(audio) <= stt_worker._srv.window):
                        # window-sized requests share the continuously
                        # batched decode lanes; long-form falls back to
                        # the chunked offline path under the lock
                        out = stt_worker.transcribe(audio)
                    else:
                        with lock:
                            out = model.generate(audio)
                    self._json(200, {
                        "text": out.text,
                        "language": out.language,
                        "segments": [
                            {"text": s.text, "start": s.start, "end": s.end}
                            for s in (out.segments or [])],
                        "wall_s": round(time.perf_counter() - t0, 3),
                    })
                elif (self.path in ("/v1/audio/speech",
                                    "/v1/audio/speech/stream")
                      and task == "tts"):
                    req = json.loads(body or b"{}")
                    if worker is not None:
                        self._speech_batched(req)
                        return
                    # cloning kwargs only when supplied: models without
                    # ref-audio support keep their plain signature
                    clone = {}
                    ra = _ref_audio(req, model)
                    if ra is not None:
                        clone = {"ref_audio": ra,
                                 "ref_text": req.get("ref_text")}
                    params = model.default_generation_parameters()
                    if req.get("max_tokens") is not None:
                        params.max_tokens = int(req["max_tokens"])
                    if req.get("seed") is not None:
                        params.seed = int(req["seed"])
                    if self.path.endswith("/stream"):
                        from tpu_audio.core.audio_io import float_to_pcm16
                        from tpu_audio.core.generation import samples_stream

                        sr = model.sample_rate

                        def pcm_chunks():
                            with lock:
                                for chunk in samples_stream(
                                        model, req.get("input", ""),
                                        voice=req.get("voice"),
                                        generation_parameters=params,
                                        **clone):
                                    yield float_to_pcm16(chunk).tobytes()

                        self._stream_chunks(f"audio/L16; rate={sr}",
                                            pcm_chunks())
                    else:
                        with lock:
                            wav = model.generate(
                                req.get("input", ""), voice=req.get("voice"),
                                generation_parameters=params, **clone)
                        self._send(200, _wav_bytes(wav, model.sample_rate),
                                   "audio/wav")
                elif self.path.split("?")[0] == "/v1/audio/lid" \
                        and task == "lid":
                    from urllib.parse import parse_qs, urlparse

                    q = parse_qs(urlparse(self.path).query)
                    top_k = int(q.get("top_k", ["5"])[0])
                    audio, _ = _load_wav_body(
                        body, getattr(model, "sample_rate", 16000))
                    if lid_batcher is not None:
                        # concurrent requests share ONE device dispatch
                        # (the batcher thread is the sole device user for
                        # this task, so no lock is needed)
                        out = lid_batcher.predict(audio, top_k)
                    else:
                        with lock:
                            out = model.predict(audio, top_k=top_k)
                    self._json(200, {
                        "language": out.language,
                        "confidence": round(out.confidence, 6),
                        "top": [{"language": p.language,
                                 "confidence": round(p.confidence, 6)}
                                for p in out.top_languages],
                    })
                elif self.path == "/v1/audio/vad" and task == "vad":
                    audio, _ = _load_wav_body(body, 16000)
                    with lock:
                        if hasattr(model, "generate"):  # diarization
                            out = model.generate(audio)
                            payload = {
                                "segments": [
                                    {"start": round(float(s.start), 3),
                                     "end": round(float(s.end), 3),
                                     "speaker": int(s.speaker)}
                                    for s in out["segments"]],
                                "num_speakers": out["num_speakers"],
                            }
                        elif hasattr(model, "detect"):  # FSMN ms spans
                            payload = {"segments": [
                                {"start": round(s / 1000.0, 3),
                                 "end": round(e / 1000.0, 3)}
                                for s, e in model.detect(audio, 16000)]}
                        else:  # Silero-style frame probs -> runs
                            from tpu_audio.models.vad.segmenter import (
                                SpeechSegmentConfig, detect_speech_runs)

                            runs = detect_speech_runs(
                                audio, 16000, model, SpeechSegmentConfig())
                            payload = {"segments": [
                                {"start": round(s / 16000.0, 3),
                                 "end": round(e / 16000.0, 3)}
                                for s, e in runs]}
                    self._json(200, payload)
                elif self.path == "/v1/audio/codec" and task == "codec":
                    audio, _ = _load_wav_body(body, model.sample_rate)
                    with lock:
                        out = np.asarray(model.decode(model.encode(audio)))
                    if out.ndim == 3 and out.shape[-1] == 1:
                        out = out[..., 0]
                    out = out[0, : len(audio)]
                    self._send(200, _wav_bytes(out, model.sample_rate),
                               "audio/wav")
                elif self.path == "/v1/audio/enhance" and task == "sts":
                    audio, sr = _load_wav_body(
                        body, getattr(model, "sample_rate", None))
                    with lock:
                        out = model.enhance(audio)
                    self._send(200, _wav_bytes(out, sr), "audio/wav")
                else:
                    failed = True
                    self._json(404, {"error":
                                     f"no route {self.path} for task {task}"})
            except Exception as e:  # noqa: BLE001 — report, don't kill server
                failed = True
                if self._streaming:
                    # headers already sent: a JSON 500 here would corrupt
                    # the chunked body — drop the connection instead, which
                    # the client sees as a truncated (invalid) stream.
                    self.close_connection = True
                else:
                    self._json(500, {"error": f"{type(e).__name__}: {e}"})
            finally:
                metrics.observe(self.path, time.perf_counter() - t_start,
                                failed)

    return ThreadingHTTPServer((host, port), Handler)


def apply_tensor_parallel(model, tp: int):
    """Shard a loaded model's parameter tree Megatron-style over a
    ``tp``-device ``model`` mesh axis, in place (``--tp``).

    The serving engines are GSPMD-transparent (parallel/continuous.py):
    sharded params flow through the SAME jitted prefill/decode graphs and
    XLA inserts the TP collectives, so tokens are bit-identical to the
    single-device server (pinned by test_cli.py on the virtual 8-device
    CPU mesh). Leaves whose sharded dim does not divide ``tp``
    replicate (parallel/mesh.py:shard_params)."""
    from tpu_audio.parallel.mesh import (TRANSFORMER_TP_RULES, make_mesh,
                                         shard_params)

    if not hasattr(model, "params"):
        raise SystemExit(
            f"--tp: {type(model).__name__} does not expose a .params tree")
    import jax

    n_avail = len(jax.devices())
    if n_avail < tp:
        raise SystemExit(
            f"--tp {tp}: only {n_avail} device(s) available "
            f"({[str(d) for d in jax.devices()]}); a smaller mesh would "
            "silently serve under-sharded")
    mesh = make_mesh(tp, axes=("model",))
    stats: dict = {}
    model.params = shard_params(model.params, mesh, TRANSFORMER_TP_RULES,
                                stats=stats)
    if stats.get("sharded", 0) == 0:
        print(f"[serve] WARNING: --tp {tp} sharded 0 of "
              f"{stats.get('replicated', 0)} parameter leaves — the model "
              "is fully replicated (tp degree likely does not divide the "
              "projection dims); serving will waste the extra chips",
              file=sys.stderr)
    else:
        print(f"[serve] tp={tp}: {stats['sharded']} leaves sharded, "
              f"{stats['replicated']} replicated", file=sys.stderr)
    return mesh


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        "tpu-audio-serve", description=__doc__.splitlines()[0])
    parser.add_argument("--model", required=True)
    parser.add_argument("--task", default="auto",
                        choices=("auto", "stt", "tts", "sts", "lid",
                                 "codec", "vad"))
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--slots", type=int, default=1,
                        help="continuous-batching decode lanes for TTS "
                             "(>1 lets concurrent requests share the "
                             "trunk; sampling params become per-server)")
    parser.add_argument("--fused", default="auto",
                        choices=("auto", "off"),
                        help="M-lane fused Pallas serving tick for w8a8 "
                             "whisper/Orpheus-family models (auto routes "
                             "when supported; off forces the XLA tick — "
                             "e.g. to skip the one-time Mosaic kernel "
                             "compile on a cold cache)")
    parser.add_argument("--step-tokens", type=int, default=7,
                        help="decode tokens per jitted tick under "
                             "--slots (amortizes dispatch overhead; "
                             "tokens are identical for any value)")
    parser.add_argument("--warmup", action="store_true",
                        help="precompile steady-state graphs before "
                             "accepting traffic (cli.warmup)")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel degree: shard the model's "
                             "weights Megatron-style over a tp-device "
                             "'model' mesh axis before serving (GSPMD "
                             "inserts the collectives inside the same "
                             "jitted graphs; composes with --slots as "
                             "slots x TP). Requires tp local devices.")
    args = parser.parse_args(argv)

    from tpu_audio.core import hub

    model_dir = hub.resolve_or_download_model(args.model)
    task = args.task
    if task == "auto":
        from tpu_audio.cli.warmup import detect_task

        task = detect_task(model_dir)
        if task not in ("stt", "tts", "sts", "lid", "codec", "vad"):
            raise SystemExit("cannot infer a servable task; pass --task")

    if task == "codec":
        from tpu_audio.codecs import load_codec

        model = load_codec(model_dir)
    else:
        import importlib

        model = importlib.import_module(
            f"tpu_audio.models.{task}").load_model(model_dir)
    if args.tp > 1:
        apply_tensor_parallel(model, args.tp)
    if args.warmup:
        from tpu_audio.cli import warmup as W

        ns = argparse.Namespace(seconds=30.0, text="Warm up.",
                                max_tokens=256, verify=False)
        W._drive(task, model, ns)
    server = build_server(model, task, args.model, args.host, args.port,
                          slots=args.slots, step_tokens=args.step_tokens,
                          fused=args.fused)
    print(json.dumps({"serving": args.model, "task": task,
                      "addr": f"http://{args.host}:{args.port}"}))
    server.serve_forever()


if __name__ == "__main__":
    main()
