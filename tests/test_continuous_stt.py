"""Continuous batching for Whisper serving: per-lane cross-attention
context, suppression via the logits hook, exact greedy parity with the
offline decode loop."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from fixtures import FakeWhisperTokenizer, make_whisper_fixture  # noqa: E402


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from tpu_audio.models.stt import load_model

    m = load_model(str(make_whisper_fixture(
        tmp_path_factory.mktemp("w") / "w")))
    m.tokenizer = FakeWhisperTokenizer(vocab=m.config.vocab_size)
    return m


def solo_tokens(model, audio, language, max_tokens):
    """The offline single-request decode (the bench/generate path)."""
    import jax

    from tpu_audio.models.stt import whisper as W

    feats = model.encoder_features(np.asarray(audio, np.float32))
    enc = model._encode(model.params, feats)
    prompt = model.tokenizer.build_prompt_tokens(language)
    suppress, begin = model._suppress_masks(model.tokenizer)
    buf = np.zeros((model.config.max_target_positions,), np.int32)
    buf[: len(prompt)] = prompt
    tokens, count = model._decode_loop(
        model.params, enc, jnp.asarray(buf), jnp.int32(len(prompt)),
        jnp.int32(model.tokenizer.eot), jnp.asarray(suppress),
        jnp.asarray(begin), jnp.float32(0.0), jax.random.PRNGKey(0),
        max_total=min(model.config.max_target_positions,
                      len(prompt) + max_tokens))
    out = np.asarray(tokens)[len(prompt): int(count)].tolist()
    return [t for t in out if t != model.tokenizer.eot]


def test_continuous_stt_matches_offline(model):
    """Three staggered requests (two languages) through the shared lanes
    reproduce each solo offline greedy decode token-for-token."""
    from tpu_audio.parallel.continuous_stt import ContinuousSTT

    rng = np.random.default_rng(0)
    clips = [(rng.standard_normal(12000).astype(np.float32) * 0.2, lang)
             for lang in ("en", "fr", "en")]
    max_tokens = 12
    want = [solo_tokens(model, a, lang, max_tokens) for a, lang in clips]

    srv = ContinuousSTT(model, slots=2, max_tokens=max_tokens,
                        step_tokens=3)
    r0 = srv.submit(clips[0][0], language=clips[0][1])
    srv.step()
    r1 = srv.submit(clips[1][0], language=clips[1][1])
    r2 = srv.submit(clips[2][0], language=clips[2][1])  # queues for a lane
    srv.drain()
    got = [srv.engine.requests[r.request_id].tokens for r in (r0, r1, r2)]
    assert got == want

    out = srv.result(r0.request_id)
    assert out.generation_token_count == len(want[0])
    assert isinstance(out.text, str)
    with pytest.raises(KeyError):
        srv.result(999)


def test_continuous_stt_context_required(model):
    """The engine refuses context-less submits once built with a
    template (and the STT wrapper always supplies one)."""
    from tpu_audio.parallel.continuous_stt import ContinuousSTT

    srv = ContinuousSTT(model, slots=1, max_tokens=4)
    with pytest.raises(ValueError):
        srv.engine.submit(np.asarray([1, 2, 3, 4], np.int32), max_new=2)


def test_serve_stt_slots(model):
    """--slots on a whisper STT server: concurrent transcription requests
    share the decode lanes and each connection gets its own result,
    identical to the solo offline decode."""
    import io
    import json as _json
    import threading
    import urllib.request
    import wave

    from tpu_audio.cli.serve import build_server

    srv = build_server(model, "stt", "fixture", port=0, slots=2)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        rng = np.random.default_rng(3)
        clips = [rng.standard_normal(12000).astype(np.float32) * 0.2
                 for _ in range(3)]
        results = {}

        def post(i):
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
                w.writeframes((clips[i] * 32767).clip(-32768, 32767)
                              .astype("<i2").tobytes())
            req = urllib.request.Request(
                f"{url}/v1/audio/transcriptions", data=buf.getvalue(),
                headers={"Content-Type": "audio/wav"})
            with urllib.request.urlopen(req, timeout=300) as r:
                results[i] = _json.loads(r.read())

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
            assert not t.is_alive()
        for i in range(3):
            # PCM16 quantization of the clip perturbs the mel slightly on
            # a random-weight fixture, so compare text to the decode of
            # the SAME quantized audio
            quant = (clips[i] * 32767).clip(-32768, 32767).astype(
                np.int16).astype(np.float32) / 32768.0
            toks = solo_tokens(model, quant, "en", 224)
            assert results[i]["text"] == model.tokenizer.decode(
                toks).strip()
    finally:
        srv.shutdown()


@pytest.fixture(scope="module")
def w8_model():
    """Kernel-supported dims + w8a8 decoder tree: routes the fused
    serving tick in interpret mode (same fixture shape as
    test_fused_decoder.test_whisper_generate_routes_fused_and_matches_xla)."""
    from tpu_audio.core import quant
    from tpu_audio.models.stt import whisper as W

    cfg = W.WhisperConfig(num_mel_bins=80, d_model=256, encoder_layers=1,
                          encoder_attention_heads=4, encoder_ffn_dim=1024,
                          decoder_layers=2, decoder_attention_heads=4,
                          decoder_ffn_dim=1024, vocab_size=128,
                          max_source_positions=1500,
                          max_target_positions=64)
    params = W.init_params(cfg, seed=5, dtype=jnp.float32)
    params["model"]["decoder"] = quant.quantize_tree(
        params["model"]["decoder"], scheme="w8a8")
    m = W.Whisper(cfg, params, dtype=jnp.float32)
    m.tokenizer = FakeWhisperTokenizer(vocab=cfg.vocab_size)
    return m


def test_continuous_stt_fused_matches_xla_engine(w8_model, monkeypatch):
    """The fused serving tick (one fused_stack_lanes call per step shared
    by all live lanes) produces the SAME greedy tokens as the XLA w8a8
    engine for staggered concurrent requests — covering the lanes kernel
    end-to-end through admission, bucketed underload ticks (1 live lane),
    the full tick (2 lanes), per-lane cross K/V quantization, in-kernel
    prefill, and the engine's freeze/admission machinery."""
    from tpu_audio.parallel.continuous_stt import ContinuousSTT

    rng = np.random.default_rng(2)
    clips = [rng.standard_normal(8000).astype(np.float32) * 0.2
             for _ in range(3)]
    max_tokens = 6

    def run(fused):
        monkeypatch.setenv("TPU_AUDIO_FUSED_DECODER",
                           "interpret" if fused else "0")
        srv = ContinuousSTT(w8_model, slots=2, max_tokens=max_tokens,
                            step_tokens=2, min_tick_tokens=2,
                            fused=fused)
        assert srv.fused == bool(fused)
        r0 = srv.submit(clips[0], language="en")
        srv.step()                      # bucket-1 tick: r0 alone
        r1 = srv.submit(clips[1], language="fr")
        r2 = srv.submit(clips[2], language="en")   # queues for a lane
        srv.drain()
        return [srv.engine.requests[r.request_id].tokens
                for r in (r0, r1, r2)]

    assert run(True) == run(False)


@pytest.fixture(scope="module")
def qwen_model(tmp_path_factory):
    from fixtures import make_qwen3_asr_fixture
    from tpu_audio.models.stt import load_model

    return load_model(str(make_qwen3_asr_fixture(
        tmp_path_factory.mktemp("qasr") / "q")), dtype=jnp.float32)


def test_continuous_qwen3_asr_matches_offline(qwen_model):
    """Audio-LLM continuous serving: the merged prompt embeddings ride
    the lane context and staggered requests reproduce the offline
    decode_features_tokens greedy output exactly."""
    from tpu_audio.core.generation import STTGenerateParameters
    from tpu_audio.parallel.continuous_stt import ContinuousQwen3ASR

    model = qwen_model
    window_s, max_tokens = 1.0, 8
    rng = np.random.default_rng(1)
    clips = [rng.standard_normal(12000).astype(np.float32) * 0.2
             for _ in range(3)]

    def solo(audio):
        audio = np.asarray(audio, np.float32)[: int(16000 * window_s)]
        if len(audio) < int(16000 * window_s):
            audio = np.pad(audio, (0, int(16000 * window_s) - len(audio)))
        mel, _ = model.preprocess_audio(audio)
        feats = model.encode_audio(mel)
        gen, _ = model.decode_features_tokens(
            feats, STTGenerateParameters(max_tokens=max_tokens,
                                         temperature=0.0))
        return gen

    want = [solo(a) for a in clips]

    srv = ContinuousQwen3ASR(model, slots=2, window_s=window_s,
                             max_tokens=max_tokens, step_tokens=3)
    reqs = [srv.submit(a) for a in clips]
    srv.step()
    srv.drain()
    got = [[t for t in srv.engine.requests[r.request_id].tokens
            if t not in srv.EOS_IDS] for r in reqs]
    assert got == want
    out = srv.result(reqs[0].request_id)
    assert isinstance(out.text, str)


def test_serve_qwen3_asr_slots(qwen_model):
    """--slots on a Qwen3-ASR server routes window-sized requests
    through the audio-LLM continuous engine."""
    import io
    import json as _json
    import threading
    import urllib.request
    import wave

    from tpu_audio.cli.serve import build_server

    srv = build_server(qwen_model, "stt", "fixture", port=0, slots=2)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        rng = np.random.default_rng(5)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
            w.writeframes((rng.standard_normal(16000) * 4000)
                          .astype("<i2").tobytes())
        req = urllib.request.Request(
            f"{url}/v1/audio/transcriptions", data=buf.getvalue(),
            headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req, timeout=300) as r:
            out = _json.loads(r.read())
        assert "text" in out and isinstance(out["text"], str)
    finally:
        srv.shutdown()


def test_continuous_stt_fused_cancel_midstream(w8_model, monkeypatch):
    """Cancelling one request mid-generation under the fused tick frees
    its lane (the kernel keeps running garbage for the freed lane, the
    engine ignores it) and the surviving request still matches the XLA
    engine token-for-token."""
    from tpu_audio.parallel.continuous_stt import ContinuousSTT

    rng = np.random.default_rng(9)
    a0 = rng.standard_normal(8000).astype(np.float32) * 0.2
    a1 = rng.standard_normal(8000).astype(np.float32) * 0.2

    def run(fused):
        monkeypatch.setenv("TPU_AUDIO_FUSED_DECODER",
                           "interpret" if fused else "0")
        srv = ContinuousSTT(w8_model, slots=2, max_tokens=8,
                            step_tokens=2, min_tick_tokens=2,
                            fused=fused)
        r0 = srv.submit(a0, language="en")
        r1 = srv.submit(a1, language="en")
        srv.step()
        srv.step()
        assert srv.cancel(r1.request_id)
        srv.drain()
        return srv.engine.requests[r0.request_id].tokens

    assert run(True) == run(False)
