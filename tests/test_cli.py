"""End-to-end CLI tests with fixture checkpoints (real tokenizer.json)."""

import json

import numpy as np
import pytest

from tpu_audio.core.audio_io import save_wav

from fixtures import make_whisper_fixture, write_fixture_tokenizer


@pytest.fixture(scope="module")
def whisper_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("whisper_cli")
    make_whisper_fixture(d)
    write_fixture_tokenizer(d, 64)
    return d


@pytest.fixture(scope="module")
def wav_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("audio") / "in.wav"
    rng = np.random.default_rng(0)
    save_wav(p, rng.standard_normal(16000).astype(np.float32) * 0.1, 16000)
    return p


def test_stt_cli_txt(whisper_dir, wav_path, capsys):
    from tpu_audio.cli import stt

    rc = stt.main([str(wav_path), "--model", str(whisper_dir), "--max-tokens", "4"])
    assert rc == 0
    out = capsys.readouterr()
    assert "[stt]" in out.err


def test_stt_cli_json_and_output_file(whisper_dir, wav_path, tmp_path, capsys):
    from tpu_audio.cli import stt

    out_file = tmp_path / "result.json"
    rc = stt.main([str(wav_path), "--model", str(whisper_dir),
                   "--max-tokens", "4", "--format", "json",
                   "--output", str(out_file)])
    assert rc == 0
    data = json.loads(out_file.read_text())
    assert "text" in data and "segments" in data


def test_stt_cli_stream(whisper_dir, wav_path, capsys):
    from tpu_audio.cli import stt

    rc = stt.main([str(wav_path), "--model", str(whisper_dir),
                   "--max-tokens", "4", "--stream"])
    assert rc == 0


def test_whisper_tokenizer_from_fixture(whisper_dir):
    from tpu_audio.models.stt.whisper import WhisperTokenizer

    tok = WhisperTokenizer.from_dir(whisper_dir, 64)
    assert tok.eot == 63
    assert tok.sot == 62
    prompt = tok.build_prompt_tokens(None)
    assert prompt[0] == tok.sot
    assert tok.decode([1, 2, tok.eot]) == "w1 w2"


def test_tts_cli_timestamps_and_raw_ipa(tmp_path, capsys):
    """--timestamps runs the forced aligner on the generated audio
    (App.swift:214-236); --raw-ipa bypasses the text processor."""
    from fixtures import make_kokoro_fixture, make_qwen3_aligner_fixture

    from tpu_audio.cli import tts

    tts_dir = make_kokoro_fixture(tmp_path / "tts")
    aligner_dir = make_qwen3_aligner_fixture(
        tmp_path / "qwen3-forced-aligner")
    out = str(tmp_path / "o.wav")
    rc = tts.main(["hello world", "--model", str(tts_dir), "-o", out,
                   "--timestamps", str(aligner_dir)])
    assert rc == 0
    captured = capsys.readouterr()
    assert "Timestamps:" in captured.out
    assert "hello" in captured.out and "world" in captured.out

    rc2 = tts.main(["h@loU", "--model", str(tts_dir),
                    "-o", str(tmp_path / "o2.wav"), "--raw-ipa"])
    assert rc2 == 0


def test_sts_cli_enhance(tmp_path):
    """sts CLI short-mode enhance through a DFN fixture
    (mlx-audio-swift-sts App.swift surface)."""
    from fixtures import make_deepfilternet_fixture

    from tpu_audio.cli import sts as sts_cli
    from tpu_audio.core.audio_io import load_audio, save_wav

    d = make_deepfilternet_fixture(tmp_path / "dfn")
    rng = np.random.default_rng(0)
    wav_path = tmp_path / "noisy.wav"
    save_wav(str(wav_path), (rng.standard_normal(48000) * 0.1
                             ).astype(np.float32), 48000)
    out = tmp_path / "enhanced.wav"
    rc = sts_cli.main(["--model", str(d), str(wav_path), "-o", str(out)])
    assert rc in (0, None)
    y, sr = load_audio(str(out))
    assert sr == 48000 and len(y) > 0 and np.isfinite(y).all()


def test_sts_cli_stream_mode(tmp_path):
    from fixtures import make_deepfilternet_fixture

    from tpu_audio.cli import sts as sts_cli
    from tpu_audio.core.audio_io import load_audio, save_wav

    d = make_deepfilternet_fixture(tmp_path / "dfn")
    rng = np.random.default_rng(1)
    wav_path = tmp_path / "noisy.wav"
    save_wav(str(wav_path), (rng.standard_normal(24000) * 0.1
                             ).astype(np.float32), 48000)
    out = tmp_path / "enhanced.wav"
    rc = sts_cli.main(["--model", str(d), str(wav_path), "--mode", "stream",
                       "-o", str(out)])
    assert rc in (0, None)
    y, _ = load_audio(str(out))
    assert len(y) > 0


def test_sts_cli_lfm_chat(tmp_path):
    """sts CLI LFM2.5-Audio chat turn: wav in -> text + audio reply
    (mlx-audio-swift-sts App.swift LFM chat flags)."""
    from fixtures import make_lfm_audio_fixture

    from tpu_audio.cli import sts as sts_cli
    from tpu_audio.core.audio_io import save_wav

    d = make_lfm_audio_fixture(tmp_path / "lfm")
    rng = np.random.default_rng(2)
    wav_path = tmp_path / "q.wav"
    save_wav(str(wav_path), (rng.standard_normal(3200) * 0.1
                             ).astype(np.float32), 16000)
    out = tmp_path / "reply.wav"
    txt = tmp_path / "reply.txt"
    rc = sts_cli.main([str(wav_path), "--model", str(d),
                       "--system", "sys", "--max-new-tokens", "4",
                       "--temperature", "0", "-o", str(out),
                       "--output-text", str(txt)])
    assert rc in (0, None)
    assert txt.exists()


def test_sts_cli_lfm_chat_text_only(tmp_path):
    from fixtures import make_lfm_audio_fixture

    from tpu_audio.cli import sts as sts_cli

    d = make_lfm_audio_fixture(tmp_path / "lfm")
    rc = sts_cli.main(["--model", str(d), "--text", "hi there",
                       "--text-only", "--max-new-tokens", "3",
                       "--temperature", "0"])
    assert rc in (0, None)


def test_warmup_cli_stt_fixture(tmp_path, capsys):
    """AOT warmup drives the full generate path once and reports timings;
    --verify re-runs warm (README 'Cold compile and AOT' made actionable)."""
    import json as _json

    from fixtures import make_cohere_fixture
    from tpu_audio.cli import warmup

    model_dir = make_cohere_fixture(tmp_path / "cohere")
    assert warmup.detect_task(str(model_dir)) == "stt"
    warmup.main(["--model", str(model_dir), "--seconds", "1",
                 "--cache-dir", str(tmp_path / "cache"), "--verify"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["task"] == "stt"
    assert out["compile_and_run_s"] > 0
    assert "warm_run_s" in out


def test_warmup_cli_tts_fixture(tmp_path, capsys):
    import json as _json

    from fixtures import make_llama_tts_fixture, make_snac_fixture
    from tpu_audio.cli import warmup

    model_dir = make_llama_tts_fixture(tmp_path / "orpheus")
    make_snac_fixture(model_dir / "snac", vq_strides=(4, 2, 1))
    # point the checkpoint at its local codec so load_model finds it
    import json

    cfg = json.loads((model_dir / "config.json").read_text())
    cfg["snac_repo"] = str(model_dir / "snac")
    (model_dir / "config.json").write_text(json.dumps(cfg))
    assert warmup.detect_task(str(model_dir)) == "tts"
    warmup.main(["--model", str(model_dir), "--max-tokens", "14",
                 "--cache-dir", str(tmp_path / "cache")])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["task"] == "tts"


def test_serve_stt_and_tts(tmp_path):
    """HTTP serving surface: transcription + speech endpoints end-to-end
    over fixture models on an ephemeral port."""
    import io
    import json as _json
    import threading
    import urllib.request
    import wave

    import numpy as np

    from fixtures import (make_cohere_fixture, make_qwen3_tts_fixture)
    from tpu_audio.cli.serve import build_server
    from tpu_audio.models.stt import load_model as load_stt
    from tpu_audio.models.tts import load_model as load_tts

    def start(model, task):
        srv = build_server(model, task, "fixture", port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv, f"http://127.0.0.1:{srv.server_address[1]}"

    stt_srv, stt_url = start(load_stt(str(make_cohere_fixture(tmp_path / "c"))),
                             "stt")
    try:
        with urllib.request.urlopen(f"{stt_url}/healthz") as r:
            assert _json.loads(r.read())["task"] == "stt"
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
            w.writeframes((np.sin(np.arange(16000) * 0.03) * 8000)
                          .astype("<i2").tobytes())
        req = urllib.request.Request(
            f"{stt_url}/v1/audio/transcriptions", data=buf.getvalue(),
            headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req) as r:
            out = _json.loads(r.read())
        assert "text" in out and "segments" in out
        # streaming transcription: ndjson token lines + final result
        req = urllib.request.Request(
            f"{stt_url}/v1/audio/transcriptions/stream",
            data=buf.getvalue(), headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req) as r:
            assert r.headers["Content-Type"] == "application/x-ndjson"
            lines = [_json.loads(x) for x in r.read().splitlines() if x]
        assert lines and lines[-1]["type"] == "result"
        assert "text" in lines[-1] and "segments" in lines[-1]
        assert all(ev["type"] in ("token", "result") for ev in lines)
    finally:
        stt_srv.shutdown()

    tts_srv, tts_url = start(
        load_tts(str(make_qwen3_tts_fixture(tmp_path / "q",
                                            with_icl=True))), "tts")
    try:
        req = urllib.request.Request(
            f"{tts_url}/v1/audio/speech",
            data=_json.dumps({"input": "hello world", "max_tokens": 8,
                              "seed": 0}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            wav_bytes = r.read()
        with wave.open(io.BytesIO(wav_bytes)) as w:
            assert w.getframerate() == 24000
            assert w.getnframes() > 0
        # unknown route -> structured 404
        try:
            urllib.request.urlopen(f"{tts_url}/nope", data=b"")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
        # chunked streaming speech: raw PCM16 frames, nonzero length
        req = urllib.request.Request(
            f"{tts_url}/v1/audio/speech/stream",
            data=_json.dumps({"input": "hello again", "max_tokens": 8,
                              "seed": 0}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            ctype = r.headers["Content-Type"]
            assert ctype.startswith("audio/L16")
            pcm = r.read()  # urllib de-chunks for us
        assert len(pcm) > 0 and len(pcm) % 2 == 0
        # voice cloning over HTTP: base64 ref audio + text conditions
        # the prompt (qwen3 fixture implements ref-audio ICL)
        import base64

        ref = io.BytesIO()
        with wave.open(ref, "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(24000)
            w.writeframes((np.sin(np.arange(12000) * 0.02) * 8000)
                          .astype("<i2").tobytes())
        req = urllib.request.Request(
            f"{tts_url}/v1/audio/speech",
            data=_json.dumps({
                "input": "hello world", "max_tokens": 8, "seed": 0,
                "ref_audio_b64":
                    base64.b64encode(ref.getvalue()).decode(),
                "ref_text": "a reference"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            cloned = r.read()
        with wave.open(io.BytesIO(cloned)) as w:
            assert w.getnframes() > 0
        assert cloned != wav_bytes  # conditioning changed the output

        # prometheus metrics reflect the traffic above (observed in the
        # handler's finally AFTER the response body: poll briefly)
        import time as _time

        for _ in range(50):
            with urllib.request.urlopen(f"{tts_url}/metrics") as r:
                text = r.read().decode()
            if ('tpu_audio_requests_total{route="/v1/audio/speech/stream"} 1'
                    in text):
                break
            _time.sleep(0.1)
        assert 'tpu_audio_requests_total{route="/v1/audio/speech"} 2' in text
        assert ('tpu_audio_requests_total{route="/v1/audio/speech/stream"} 1'
                in text)
        # unknown paths fold into the closed "other" label (no unbounded
        # label cardinality / exposition injection from scanner paths)
        assert 'tpu_audio_errors_total{route="other"} 1' in text
        assert '/nope' not in text
    finally:
        tts_srv.shutdown()


def test_serve_lid(tmp_path):
    """LID classification endpoint: WAV in, top-k language JSON out."""
    import io
    import json as _json
    import threading
    import urllib.request
    import wave

    import numpy as np

    from fixtures import make_ecapa_fixture
    from tpu_audio.cli.serve import build_server
    from tpu_audio.models.lid import load_model

    d = tmp_path / "ecapa"
    make_ecapa_fixture(d)
    srv = build_server(load_model(str(d)), "lid", "fixture", port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
            w.writeframes((np.sin(np.arange(16000) * 0.05) * 8000)
                          .astype("<i2").tobytes())
        req = urllib.request.Request(
            f"{url}/v1/audio/lid?top_k=3", data=buf.getvalue(),
            headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req) as r:
            out = _json.loads(r.read())
        assert out["language"] and 0.0 <= out["confidence"] <= 1.0
        assert len(out["top"]) == 3
        assert out["top"][0]["language"] == out["language"]

        # concurrent requests of mixed lengths + top_k share the
        # micro-batched device dispatch and still answer per-request
        import concurrent.futures as cf

        def ask(seconds, top_k):
            b = io.BytesIO()
            with wave.open(b, "wb") as w:
                w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
                w.writeframes(
                    (np.sin(np.arange(int(16000 * seconds)) * 0.05) * 8000)
                    .astype("<i2").tobytes())
            rq = urllib.request.Request(
                f"{url}/v1/audio/lid?top_k={top_k}", data=b.getvalue(),
                headers={"Content-Type": "audio/wav"})
            with urllib.request.urlopen(rq) as r:
                return _json.loads(r.read())

        jobs = [(0.5, 2), (1.0, 3), (2.5, 1), (1.0, 4)]
        with cf.ThreadPoolExecutor(len(jobs)) as ex:
            outs = list(ex.map(lambda a: ask(*a), jobs))
        for (seconds, top_k), o in zip(jobs, outs):
            assert len(o["top"]) == top_k
            assert o["top"][0]["language"] == o["language"]
        # identical clips must classify identically through the batcher
        assert outs[1]["language"] == outs[3]["language"]
    finally:
        srv.shutdown()


def test_serve_vad(tmp_path):
    """VAD endpoints: Sortformer returns speaker-labelled diarization,
    Silero returns plain speech runs — one route, surface-dispatched."""
    import io
    import json as _json
    import threading
    import urllib.request
    import wave

    import numpy as np

    from fixtures import make_silero_fixture, make_sortformer_fixture
    from tpu_audio.cli.serve import build_server
    from tpu_audio.models.vad import load_model

    def start(model):
        srv = build_server(model, "vad", "fixture", port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv, f"http://127.0.0.1:{srv.server_address[1]}"

    def wav_body(seconds=2.0):
        rng = np.random.default_rng(0)
        n = int(16000 * seconds)
        x = np.zeros(n, np.float32)
        x[n // 4: 3 * n // 4] = (
            np.sin(np.arange(n // 2) * 0.08)
            * (0.5 + 0.3 * np.sin(np.arange(n // 2) * 0.004)))
        x += rng.standard_normal(n).astype(np.float32) * 0.01
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
            w.writeframes((x * 20000).astype("<i2").tobytes())
        return buf.getvalue()

    for fixture, labelled in ((make_sortformer_fixture, True),
                              (make_silero_fixture, False)):
        d = tmp_path / fixture.__name__
        fixture(d)
        srv, url = start(load_model(str(d)))
        try:
            req = urllib.request.Request(
                f"{url}/v1/audio/vad", data=wav_body(),
                headers={"Content-Type": "audio/wav"})
            with urllib.request.urlopen(req) as r:
                out = _json.loads(r.read())
            assert "segments" in out
            for s in out["segments"]:
                assert 0.0 <= s["start"] <= s["end"]
                assert ("speaker" in s) == labelled
            if labelled:
                assert "num_speakers" in out
        finally:
            srv.shutdown()


def test_serve_codec_roundtrip(tmp_path):
    """Codec endpoint: WAV in, encode+decode reconstruction WAV out at
    the codec's sample rate and the input's length."""
    import io
    import json as _json
    import threading
    import urllib.request
    import wave

    import numpy as np

    from fixtures import make_snac_fixture
    from tpu_audio.cli.serve import build_server
    from tpu_audio.codecs import load_codec

    d = tmp_path / "snac"
    make_snac_fixture(d, vq_strides=(4, 2, 1))
    codec = load_codec(str(d))
    srv = build_server(codec, "codec", "fixture", port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        n = codec.sample_rate  # 1 s
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1); w.setsampwidth(2)
            w.setframerate(codec.sample_rate)
            w.writeframes((np.sin(np.arange(n) * 0.05) * 8000)
                          .astype("<i2").tobytes())
        req = urllib.request.Request(
            f"{url}/v1/audio/codec", data=buf.getvalue(),
            headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req) as r:
            out = r.read()
        with wave.open(io.BytesIO(out)) as w:
            assert w.getframerate() == codec.sample_rate
            assert 0 < w.getnframes() <= n
    finally:
        srv.shutdown()


def test_serve_tts_slots_continuous(tmp_path):
    """--slots > 1: concurrent speech requests share the trunk through
    the continuous-batching worker; each connection still gets its own
    complete WAV / PCM stream."""
    import io
    import json as _json
    import threading
    import urllib.request
    import wave

    from fixtures import make_llama_tts_fixture, make_snac_fixture
    from tpu_audio.cli.serve import build_server
    from tpu_audio.models.tts import load_model as load_tts

    model_dir = make_llama_tts_fixture(tmp_path / "orpheus")
    make_snac_fixture(model_dir / "snac", vq_strides=(4, 2, 1))
    cfg = _json.loads((model_dir / "config.json").read_text())
    cfg["snac_repo"] = str(model_dir / "snac")
    (model_dir / "config.json").write_text(_json.dumps(cfg))

    from tpu_audio.core.generation import AudioGenerateParameters

    model = load_tts(str(model_dir), audio_band_head=True)
    params = AudioGenerateParameters(
        max_tokens=21, temperature=0.0, top_p=1.0,
        repetition_penalty=1.3, repetition_context_size=8,
        streaming_interval=0.02)
    srv = build_server(model, "tts", "fixture", port=0, slots=2,
                       generation_parameters=params)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        results = {}

        def post(i, path):
            req = urllib.request.Request(
                f"{url}{path}",
                data=_json.dumps({"input": f"hello number {i}",
                                  "max_tokens": 21, "seed": i}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                results[i] = (r.headers["Content-Type"], r.read())

        threads = [
            threading.Thread(target=post, args=(0, "/v1/audio/speech")),
            threading.Thread(target=post, args=(1, "/v1/audio/speech")),
            threading.Thread(target=post,
                             args=(2, "/v1/audio/speech/stream")),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
            assert not t.is_alive()
        for i in (0, 1):
            assert results[i][0] == "audio/wav"
            with wave.open(io.BytesIO(results[i][1])) as w:
                assert w.getnframes() > 0
        assert results[2][0].startswith("audio/L16")
        assert len(results[2][1]) > 0 and len(results[2][1]) % 2 == 0
    finally:
        srv.shutdown()


def test_serve_tensor_parallel_helper(tmp_path):
    """``--tp`` shards the loaded model's params in place over a 'model'
    mesh axis; generation through the same public path is bit-identical
    to the single-device server (GSPMD-transparent graphs)."""
    import json as _json

    import numpy as np

    from fixtures import make_llama_tts_fixture, make_snac_fixture
    from tpu_audio.cli.serve import apply_tensor_parallel
    from tpu_audio.models.tts import load_model as load_tts

    d = make_llama_tts_fixture(tmp_path / "m")
    make_snac_fixture(d / "snac", vq_strides=(4, 2, 1))
    cfg = _json.loads((d / "config.json").read_text())
    cfg["snac_repo"] = str(d / "snac")
    (d / "config.json").write_text(_json.dumps(cfg))

    model = load_tts(str(d))
    p = model.default_generation_parameters()
    p.max_tokens, p.seed = 21, 7
    base = np.asarray(model.generate("tensor parallel",
                                     generation_parameters=p))

    mesh = apply_tensor_parallel(model, 8)
    assert mesh.shape == {"model": 8}
    tp = np.asarray(model.generate("tensor parallel",
                                   generation_parameters=p))
    np.testing.assert_array_equal(base, tp)


def test_serve_tensor_parallel_rejects_paramless_model(tmp_path):
    import pytest

    from tpu_audio.cli.serve import apply_tensor_parallel

    with pytest.raises(SystemExit, match="does not expose"):
        apply_tensor_parallel(object(), 8)


def test_serve_qwen3_tts_slots_continuous(tmp_path):
    """--slots > 1 on a qwen3_tts checkpoint routes through the
    Qwen3TTSEngineWorker (talker + code predictor + streaming codec
    under continuous batching); concurrent requests each get a full WAV."""
    import io
    import json as _json
    import threading
    import urllib.request
    import wave

    from fixtures import make_qwen3_tts_fixture
    from tpu_audio.cli.serve import build_server
    from tpu_audio.core.generation import AudioGenerateParameters
    from tpu_audio.models.tts import load_model as load_tts

    model = load_tts(str(make_qwen3_tts_fixture(tmp_path / "q3")))
    params = AudioGenerateParameters(
        max_tokens=10, temperature=0.0, streaming_interval=0.4)
    srv = build_server(model, "tts", "fixture", port=0, slots=2,
                       generation_parameters=params)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        results = {}

        def post(i):
            req = urllib.request.Request(
                f"{url}/v1/audio/speech",
                data=_json.dumps({"input": f"hello number {i}",
                                  "max_tokens": 10, "seed": i}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                results[i] = (r.headers["Content-Type"], r.read())

        threads = [threading.Thread(target=post, args=(i,)) for i in (0, 1)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
            assert not t.is_alive()
        for i in (0, 1):
            assert results[i][0] == "audio/wav"
            with wave.open(io.BytesIO(results[i][1])) as w:
                assert w.getnframes() > 0
                assert w.getframerate() == model.sample_rate
    finally:
        srv.shutdown()


def test_warmup_cli_slots_serving_graphs(tmp_path, capsys):
    """--slots N also compiles the continuous-serving tick graphs (every
    lane bucket) — the cold-start item a serving deployment pays."""
    import json as _json

    from fixtures import FakeWhisperTokenizer, make_whisper_fixture, \
        write_fixture_tokenizer
    from tpu_audio.cli import warmup

    model_dir = make_whisper_fixture(tmp_path / "w")
    write_fixture_tokenizer(model_dir)
    warmup.main(["--model", str(model_dir), "--seconds", "1",
                 "--slots", "2", "--cache-dir", str(tmp_path / "cache")])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["task"] == "stt"
    assert out["serving_compile_s"] > 0
