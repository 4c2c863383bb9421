"""Continuous batching engine: staggered-admission parity, slot reuse,
composition-independent sampling, capacity bounds."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.core.sampling import SamplingParams
from tpu_audio.models import llama
from tpu_audio.parallel.continuous import ContinuousBatcher

STOP = 7


@pytest.fixture(scope="module")
def tiny():
    cfg = llama.LlamaConfig(
        hidden_size=64, num_hidden_layers=2, intermediate_size=128,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=96,
        rope_theta=10000.0, tie_word_embeddings=True)
    params = llama.init_random_params(cfg, seed=0, dtype=jnp.float32)
    return params, cfg


def solo_greedy(params, cfg, prompt, max_new, pad_to, max_len=64):
    """Reference single-request loop: left-padded bucketed prefill (the
    exact layout the engine uses) + greedy argmax decode."""
    pad = pad_to - len(prompt)
    tokens = np.zeros((pad_to,), np.int32)
    tokens[pad:] = prompt
    cache = llama.make_cache(cfg, 1, max_len, dtype=jnp.float32,
                             valid_from=pad)
    logits, cache = llama.forward(params, jnp.asarray(tokens)[None],
                                  cache, cfg)
    out = [int(jnp.argmax(logits[0, -1]))]
    while (out[-1] != STOP and len(out) < max_new
           and int(cache.offset) < max_len):
        logits, cache = llama.forward(
            params, jnp.asarray([[out[-1]]], jnp.int32), cache, cfg)
        out.append(int(jnp.argmax(logits[0, -1])))
    return [t for t in out if t != STOP]


def test_staggered_greedy_matches_solo(tiny):
    """Requests admitted at different ticks into a shared batch must each
    reproduce their solo greedy decode exactly."""
    params, cfg = tiny
    rng = np.random.default_rng(1)
    prompts = [rng.integers(8, 96, size=n).astype(np.int32)
               for n in (5, 11, 8)]
    eng = ContinuousBatcher(params, cfg, slots=2, max_len=64,
                            stop_token=STOP,
                            prefill_buckets=(8, 16))
    r0 = eng.submit(prompts[0], max_new=10)
    eng.step(); eng.step()  # r0 runs alone for two ticks
    r1 = eng.submit(prompts[1], max_new=12)
    eng.step()
    r2 = eng.submit(prompts[2], max_new=8)  # waits for a free lane
    for _ in eng.run():
        pass
    assert r0.done and r1.done and r2.done
    for req, prompt in zip((r0, r1, r2), prompts):
        bucket = 8 if len(prompt) <= 8 else 16
        expect = solo_greedy(params, cfg, prompt, req.max_new, bucket)
        assert req.tokens == expect, (req.request_id, req.tokens, expect)


def test_sampling_is_composition_independent(tiny):
    """Stochastic sampling keys off (request seed, sample index) only:
    the same request yields identical tokens whether it runs alone or
    packed with different neighbours in a different lane."""
    params, cfg = tiny
    sampling = SamplingParams(temperature=0.9, top_k=40, top_p=0.95)
    prompt_a = np.arange(10, 16, dtype=np.int32)
    prompt_b = np.arange(30, 41, dtype=np.int32)

    def run(order):
        eng = ContinuousBatcher(params, cfg, slots=2, max_len=64,
                                stop_token=STOP, sampling=sampling,
                                prefill_buckets=(8, 16), seed=123)
        reqs = {}
        for name, prompt, seed in order:
            reqs[name] = eng.submit(prompt, max_new=12, seed=seed)
            eng.step()
        for _ in eng.run():
            pass
        return {k: r.tokens for k, r in reqs.items()}

    both = run([("a", prompt_a, 5), ("b", prompt_b, 9)])
    flipped = run([("b", prompt_b, 9), ("a", prompt_a, 5)])
    solo_a = run([("a", prompt_a, 5)])
    assert both["a"] == flipped["a"] == solo_a["a"]
    assert both["b"] == flipped["b"]
    assert len(both["a"]) > 0


@pytest.mark.parametrize("k", [2, 5])
def test_step_tokens_invariance(tiny, k):
    """Chunked ticks (step_tokens=K) emit bit-identical tokens to K=1 for
    greedy AND stochastic sampling, including stop-mid-chunk freezing and
    staggered admission at tick boundaries."""
    params, cfg = tiny
    sampling = SamplingParams(temperature=0.9, top_k=40, top_p=0.95,
                              repetition_penalty=1.2,
                              repetition_context_size=6)
    rng = np.random.default_rng(7)
    prompts = [rng.integers(8, 96, size=n).astype(np.int32)
               for n in (5, 11, 8)]

    def run(step_tokens):
        eng = ContinuousBatcher(params, cfg, slots=2, max_len=64,
                                stop_token=STOP, sampling=sampling,
                                prefill_buckets=(8, 16), seed=11,
                                step_tokens=step_tokens)
        reqs = [eng.submit(p, max_new=9 + i, seed=i)
                for i, p in enumerate(prompts)]
        emitted = eng.step()  # r0+r1 run; r2 waits for a lane
        emitted += list(eng.run())
        assert all(r.done for r in reqs)
        return [r.tokens for r in reqs], emitted

    base, _ = run(1)
    toks, emitted = run(k)
    assert toks == base
    # the shared stream carries exactly each request's tokens, in order
    by_id = {i: [] for i in range(len(prompts))}
    for rid, tok in emitted:
        by_id[rid].append(tok)
    assert [by_id[i] for i in range(len(prompts))] == base


@pytest.mark.parametrize("min_tick", [None, 6, 16])
def test_pipeline_and_min_tick_invariance(tiny, min_tick):
    """Pipelined ticks (fetch overlapped with the next tick's compute)
    and per-bucket scan lengths (min_tick_tokens) must both be invisible
    in token content and per-request order — incl. staggered admission,
    stochastic sampling, and stop-mid-tick freezing."""
    params, cfg = tiny
    sampling = SamplingParams(temperature=0.9, top_k=40, top_p=0.95)
    rng = np.random.default_rng(5)
    prompts = [rng.integers(8, 96, size=n).astype(np.int32)
               for n in (5, 11, 8)]

    def run(pipeline, min_tick_tokens):
        eng = ContinuousBatcher(params, cfg, slots=2, max_len=64,
                                stop_token=STOP, sampling=sampling,
                                prefill_buckets=(8, 16), seed=11,
                                step_tokens=2, pipeline=pipeline,
                                min_tick_tokens=min_tick_tokens)
        reqs = [eng.submit(p, max_new=9 + i, seed=i)
                for i, p in enumerate(prompts)]
        emitted = eng.step()
        emitted += list(eng.run())
        assert all(r.done for r in reqs)
        assert eng.idle
        return [r.tokens for r in reqs], emitted

    base, _ = run(False, None)
    toks, emitted = run(True, min_tick)
    assert toks == base
    by_id = {i: [] for i in range(len(prompts))}
    for rid, tok in emitted:
        by_id[rid].append(tok)
    assert [by_id[i] for i in range(len(prompts))] == base


def test_pipeline_cancel_between_launch_and_harvest(tiny):
    """Cancelling a request whose tick is still in flight must not credit
    it the in-flight tokens, must free the lane for the next pending
    request, and must leave the neighbour's stream untouched."""
    params, cfg = tiny
    eng = ContinuousBatcher(params, cfg, slots=2, max_len=64,
                            stop_token=STOP, prefill_buckets=(8,),
                            pipeline=True)
    prompts = [np.arange(10 + 8 * i, 15 + 8 * i, dtype=np.int32)
               for i in range(3)]
    solo = [solo_greedy(params, cfg, p, 12, 8) for p in prompts]
    r0 = eng.submit(prompts[0], max_new=12)
    r1 = eng.submit(prompts[1], max_new=12)
    r2 = eng.submit(prompts[2], max_new=12)   # pending
    eng.step(); eng.step()                    # tick 2 in flight
    n0 = len(r0.tokens)
    assert eng.cancel(r0.request_id)
    assert r0.done and len(r0.tokens) == n0   # in-flight tick not credited
    for _ in eng.run():
        pass
    assert len(r0.tokens) == n0               # harvest skipped the dead req
    assert r1.tokens == solo[1]
    assert r2.tokens == solo[2]               # admitted into the freed lane
    assert eng.idle


def test_slot_reuse_more_requests_than_lanes(tiny):
    """5 requests through 2 lanes: all complete, budgets respected, and
    every lane outlives multiple occupants."""
    params, cfg = tiny
    eng = ContinuousBatcher(params, cfg, slots=2, max_len=32,
                            stop_token=STOP, prefill_buckets=(8,))
    rng = np.random.default_rng(3)
    reqs = [eng.submit(rng.integers(8, 96, size=4).astype(np.int32),
                       max_new=5) for _ in range(5)]
    emitted = list(eng.run())
    assert all(r.done for r in reqs)
    for r in reqs:
        assert 0 < len(r.tokens) <= 5
        assert STOP not in r.tokens
    # every request's tokens arrived through the shared stream
    by_id = {r.request_id: [] for r in reqs}
    for rid, tok in emitted:
        by_id[rid].append(tok)
    for r in reqs:
        assert by_id[r.request_id] == r.tokens


def test_capacity_bound_terminates(tiny):
    """A request whose budget exceeds the cache capacity stops exactly
    when the cache fills instead of clobbering position max_len-1."""
    params, cfg = tiny
    eng = ContinuousBatcher(params, cfg, slots=1, max_len=12,
                            stop_token=STOP, prefill_buckets=(8,))
    req = eng.submit(np.arange(20, 25, dtype=np.int32), max_new=100)
    for _ in eng.run():
        pass
    assert req.done
    # prefill fills 8 positions + first token; then 12 - 8 = 4 more
    # writes fit -> at most 5 sampled tokens (fewer if STOP landed)
    assert len(req.tokens) <= 5


def test_submit_validation(tiny):
    params, cfg = tiny
    eng = ContinuousBatcher(params, cfg, slots=1, max_len=8,
                            stop_token=STOP, prefill_buckets=(8,))
    with pytest.raises(ValueError):
        eng.submit(np.arange(4, dtype=np.int32), max_new=4)  # pads to 8
    with pytest.raises(ValueError):
        eng.submit(np.zeros((0,), np.int32), max_new=4)
    with pytest.raises(ValueError):
        eng.submit(np.arange(2, dtype=np.int32), max_new=0)


def test_submit_canonicalizes_out_of_int32_ints(tiny):
    """Client-supplied seed/max_tokens beyond int32 must not raise
    OverflowError inside the engine tick (which runs on the serving
    thread, where it would kill the whole worker, not one request)."""
    params, cfg = tiny
    eng = ContinuousBatcher(params, cfg, slots=1, max_len=16,
                            stop_token=STOP,
                            sampling=SamplingParams(temperature=0.8),
                            prefill_buckets=(4,))
    req = eng.submit(np.arange(20, 23, dtype=np.int32),
                     max_new=10**12, seed=2**33 + 5)
    for _ in eng.run():
        pass
    assert req.done and len(req.tokens) >= 1
    # canonical seed: 2**33 + 5 ≡ 5 (mod 2**31) — same tokens as seed=5
    again = eng.submit(np.arange(20, 23, dtype=np.int32),
                       max_new=10, seed=5)
    for _ in eng.run():
        pass
    assert again.tokens[: len(req.tokens)] == req.tokens[: len(again.tokens)]


def test_repetition_penalty_matches_offline_loop(tiny):
    """Greedy + repetition penalty through the engine reproduces the
    offline core.ar_loop chunked decoder token-for-token (same logits
    -space ring-history mechanics)."""
    import jax

    from tpu_audio.core.ar_loop import make_decode_chunk

    params, cfg = tiny
    prompt = np.arange(40, 48, dtype=np.int32)  # bucket 8 exactly
    sampling = SamplingParams(temperature=0.0, repetition_penalty=1.3,
                              repetition_context_size=6)
    max_new, max_len = 12, 64

    def step_fn(p, tok, cache):
        logits, cache = llama.forward(p, tok, cache, cfg)
        return logits[:, -1], cache

    cache = llama.make_cache(cfg, 1, max_len, dtype=jnp.float32)
    _, cache = llama.forward(params, jnp.asarray(prompt[:-1])[None],
                             cache, cfg)
    decoder = make_decode_chunk(step_fn, sampling, history_size=6)
    tokens, count, *_ = decoder(
        params, cache, jnp.asarray([prompt[-1]], jnp.int32),
        jnp.zeros((max_new,), jnp.int32), jax.random.PRNGKey(0),
        jnp.int32(STOP), jnp.zeros((1, 6), jnp.int32), jnp.int32(0))
    expect = [t for t in np.asarray(tokens)[:int(count)].tolist()
              if t != STOP]

    eng = ContinuousBatcher(params, cfg, slots=3, max_len=max_len,
                            stop_token=STOP, sampling=sampling,
                            prefill_buckets=(8,))
    req = eng.submit(prompt, max_new=max_new)
    # a neighbour in the batch must not perturb the penalty mechanics
    eng.submit(np.arange(10, 15, dtype=np.int32), max_new=max_new)
    for _ in eng.run():
        pass
    assert req.tokens == expect


def test_cancel_frees_lane_and_preserves_neighbours(tiny):
    """Cancelling an in-flight request frees its lane for the next
    pending one, never disturbs a neighbour's tokens, and cancelling
    pending/finished/unknown ids behaves sanely."""
    params, cfg = tiny
    eng = ContinuousBatcher(params, cfg, slots=2, max_len=64,
                            stop_token=STOP, prefill_buckets=(8,))
    prompts = [np.arange(10 + 8 * i, 15 + 8 * i, dtype=np.int32)
               for i in range(3)]
    solo = [solo_greedy(params, cfg, p, 12, 8) for p in prompts]

    r0 = eng.submit(prompts[0], max_new=12)
    r1 = eng.submit(prompts[1], max_new=12)
    r2 = eng.submit(prompts[2], max_new=12)  # pending (no lane)
    eng.step(); eng.step()
    assert eng.cancel(r0.request_id)      # in-flight: lane frees
    assert r0.done and len(r0.tokens) == 2
    eng.step()                            # r2 admits into r0's old lane
    for _ in eng.run():
        pass
    assert r1.tokens == solo[1]           # neighbour unaffected
    assert r2.tokens == solo[2]           # fresh occupant decodes cleanly
    assert not eng.cancel(r0.request_id)  # already finished
    assert not eng.cancel(999)            # unknown

    # cancelling a PENDING request dequeues it before it ever runs
    r3 = eng.submit(prompts[0], max_new=4)
    r4 = eng.submit(prompts[1], max_new=4)
    assert eng.cancel(r4.request_id) and r4.done
    for _ in eng.run():
        pass
    assert r3.tokens == solo[0][:4] and r4.tokens == []


def test_worker_generator_close_cancels(tts_model):
    """Abandoning a synthesize() generator (client hang-up) cancels the
    request inside the engine; the worker keeps serving others."""
    from tpu_audio.core.generation import (AudioGenerateParameters,
                                           AudioGenerationKind)
    from tpu_audio.models.tts.llama_tts import LlamaTTS
    from tpu_audio.parallel.continuous import TTSEngineWorker

    import jax.numpy as _jnp

    model = LlamaTTS.from_pretrained(str(tts_model), dtype=_jnp.float32,
                                     audio_band_head=True)
    params = AudioGenerateParameters(
        max_tokens=35, temperature=0.0, top_p=1.0,
        repetition_penalty=1.3, repetition_context_size=8,
        streaming_interval=0.02)
    worker = TTSEngineWorker(model, slots=1, generation_parameters=params)

    gen = worker.synthesize("a sentence that will be abandoned")
    next(gen)          # request is live in the engine
    gen.close()        # client hangs up

    # the single lane must free: a second request completes fully
    toks = [ev.token for ev in worker.synthesize("hello world")
            if ev.kind == AudioGenerationKind.TOKEN]
    assert len(toks) > 0
    worker.close()
    assert worker._srv.idle
    assert all(r.done for r in worker._srv.engine.requests.values())


def test_worker_engine_death_unblocks_callers(tts_model):
    """If the engine thread dies mid-step, waiting callers get the
    failure raised instead of hanging, and the worker refuses new
    work."""
    from tpu_audio.core.generation import AudioGenerateParameters
    from tpu_audio.models.tts.llama_tts import LlamaTTS
    from tpu_audio.parallel.continuous import TTSEngineWorker

    import jax.numpy as _jnp

    model = LlamaTTS.from_pretrained(str(tts_model), dtype=_jnp.float32)
    params = AudioGenerateParameters(
        max_tokens=30, temperature=0.0, top_p=1.0,
        repetition_penalty=1.0, streaming_interval=0.02)
    worker = TTSEngineWorker(model, slots=1, generation_parameters=params)

    calls = {"n": 0}
    orig = worker._srv.step

    def dying_step():
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("injected device failure")
        return orig()

    worker._srv.step = dying_step
    with pytest.raises(RuntimeError, match="engine thread died"):
        for _ in worker.synthesize("this request will see the crash"):
            pass
    with pytest.raises(RuntimeError):
        next(worker.synthesize("rejected after death"))


def test_tensor_parallel_params_parity(tiny):
    """The engine is GSPMD-transparent: Megatron-sharded params over a
    'model' mesh axis (parallel/mesh.py rules) produce bit-identical
    tokens to single-device params — XLA inserts the TP collectives
    inside the same jitted tick (slots x TP serving)."""
    from tpu_audio.parallel.mesh import (TRANSFORMER_TP_RULES, make_mesh,
                                         shard_params)

    params, _ = tiny
    # TP shards attention over heads: use an 8-head variant
    cfg = llama.LlamaConfig(
        hidden_size=64, num_hidden_layers=2, intermediate_size=128,
        num_attention_heads=8, num_key_value_heads=8, vocab_size=96,
        rope_theta=10000.0, tie_word_embeddings=True)
    params = llama.init_random_params(cfg, seed=0, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    prompts = [rng.integers(8, 96, size=n).astype(np.int32)
               for n in (5, 11)]

    def run(p):
        eng = ContinuousBatcher(p, cfg, slots=2, max_len=64,
                                stop_token=STOP, prefill_buckets=(8, 16),
                                step_tokens=3)
        reqs = [eng.submit(q, max_new=10) for q in prompts]
        list(eng.run())
        return [r.tokens for r in reqs]

    base = run(params)
    mesh = make_mesh(8, axes=("model",))
    assert run(shard_params(params, mesh, TRANSFORMER_TP_RULES)) == base


@pytest.fixture(scope="module")
def tts_model(tmp_path_factory):
    import json

    from fixtures import make_llama_tts_fixture, make_snac_fixture

    tmp = tmp_path_factory.mktemp("orpheus")
    model_dir = make_llama_tts_fixture(tmp / "m")
    make_snac_fixture(model_dir / "snac", vq_strides=(4, 2, 1))
    cfg = json.loads((model_dir / "config.json").read_text())
    cfg["snac_repo"] = str(model_dir / "snac")
    (model_dir / "config.json").write_text(json.dumps(cfg))
    return model_dir


@pytest.mark.parametrize("band", [False, True])
def test_continuous_tts_matches_solo_stream(tts_model, band):
    """Two staggered TTS requests through ContinuousTTS reproduce the
    solo generate_stream token sequences exactly (greedy), band head
    included, and each request streams nonzero audio."""
    from tpu_audio.core.generation import (AudioGenerateParameters,
                                           AudioGenerationKind)
    from tpu_audio.models.tts.llama_tts import LlamaTTS
    from tpu_audio.parallel.continuous import ContinuousTTS

    import jax.numpy as _jnp

    model = LlamaTTS.from_pretrained(str(tts_model), dtype=_jnp.float32,
                                     audio_band_head=band)
    params = AudioGenerateParameters(
        max_tokens=21, temperature=0.0, top_p=1.0,
        repetition_penalty=1.3, repetition_context_size=8,
        streaming_interval=0.02)
    texts = ["hello world", "a much longer second sentence to say"]

    def solo(text):
        toks, samples = [], 0
        for ev in model.generate_stream(text,
                                        generation_parameters=params):
            if ev.kind == AudioGenerationKind.TOKEN:
                toks.append(ev.token)
            elif ev.kind == AudioGenerationKind.AUDIO:
                samples += len(np.asarray(ev.audio))
        return toks, samples

    expected = [solo(t) for t in texts]

    srv = ContinuousTTS(model, slots=2, generation_parameters=params)
    r0 = srv.submit(texts[0])
    srv.step()
    r1 = srv.submit(texts[1])
    audio = {r0.request_id: 0, r1.request_id: 0}
    for rid, ev in srv.run():
        if ev.kind == AudioGenerationKind.AUDIO:
            audio[rid] += len(np.asarray(ev.audio))
    assert r0.tokens == expected[0][0]
    assert r1.tokens == expected[1][0]
    # identical tokens -> identical total decoded audio (zero for the
    # dense tiny model when greedy tokens land outside the audio band;
    # the band head forces in-band codes so audio is guaranteed there)
    assert audio[r0.request_id] == expected[0][1]
    assert audio[r1.request_id] == expected[1][1]
    if band:
        assert audio[r0.request_id] > 0 and audio[r1.request_id] > 0


def test_continuous_tts_windowed_decode_long_request(tts_model):
    """Long requests decode a bounded suffix window per flush (O(1) host
    work instead of O(total)): tokens stay exact, the streamed sample
    count equals the full decode length, and samples emitted before the
    window engages are bit-identical to the full-prefix decode."""
    from tpu_audio.core.generation import (AudioGenerateParameters,
                                           AudioGenerationKind)
    from tpu_audio.models.tts.llama_tts import LlamaTTS
    from tpu_audio.parallel.continuous import ContinuousTTS

    import jax.numpy as _jnp

    model = LlamaTTS.from_pretrained(str(tts_model), dtype=_jnp.float32,
                                     audio_band_head=True)
    params = AudioGenerateParameters(
        max_tokens=70, temperature=0.0, top_p=1.0,
        repetition_penalty=1.3, repetition_context_size=8,
        streaming_interval=0.001)  # flush every group

    def collect(srv, text):
        req = srv.submit(text)
        chunks = []
        for rid, ev in srv.run():
            if ev.kind == AudioGenerationKind.AUDIO:
                chunks.append(np.asarray(ev.audio))
        return req.tokens, np.concatenate(chunks)

    full_srv = ContinuousTTS(model, slots=1, generation_parameters=params)
    tok_full, wav_full = collect(full_srv, "a long windowed test")

    win_srv = ContinuousTTS(model, slots=1, generation_parameters=params)
    win_srv.decode_window_groups = 4   # force windowing (10 groups total)
    win_srv._align_groups = 2
    tok_win, wav_win = collect(win_srv, "a long windowed test")

    assert tok_win == tok_full
    assert wav_win.shape == wav_full.shape
    spg = win_srv._spg
    # flushes happen every group; the first windowed flush starts no
    # earlier than group 10-4=6, so everything before it decoded with
    # start=0 (or emitted-clamped starts that still cover it exactly)
    assert np.array_equal(wav_win[: 2 * spg], wav_full[: 2 * spg])
    assert np.all(np.isfinite(wav_win))


def test_continuous_tts_vyvo_variant(tmp_path):
    """ContinuousTTS works unchanged for the VyvoTTS (Qwen3-attention)
    family — the ar_loop contract covers both Orpheus runtimes."""
    import json

    from fixtures import make_llama_tts_fixture, make_snac_fixture
    from tpu_audio.core.generation import (AudioGenerateParameters,
                                           AudioGenerationKind)
    from tpu_audio.models.tts.qwen3_vyvo import VyvoTTS
    from tpu_audio.parallel.continuous import ContinuousTTS

    import jax.numpy as _jnp

    model_dir = make_llama_tts_fixture(tmp_path / "vyvo", qwen3=True)
    make_snac_fixture(model_dir / "snac", vq_strides=(4, 2, 1))
    cfg = json.loads((model_dir / "config.json").read_text())
    cfg["snac_repo"] = str(model_dir / "snac")
    (model_dir / "config.json").write_text(json.dumps(cfg))
    model = VyvoTTS.from_pretrained(str(model_dir), dtype=_jnp.float32)
    params = AudioGenerateParameters(
        max_tokens=21, temperature=0.0, top_p=1.0,
        repetition_penalty=1.3, repetition_context_size=8,
        streaming_interval=0.02)

    toks_solo = []
    for ev in model.generate_stream("hello vyvo",
                                    generation_parameters=params):
        if ev.kind == AudioGenerationKind.TOKEN:
            toks_solo.append(ev.token)

    srv = ContinuousTTS(model, slots=2, generation_parameters=params,
                        step_tokens=7)
    r = srv.submit("hello vyvo")
    srv.submit("a second concurrent vyvo request")
    for _ in srv.run():
        pass
    assert r.tokens == toks_solo


def test_engine_worker_concurrent_callers(tts_model):
    """TTSEngineWorker multiplexes threaded callers onto one engine:
    each caller's event stream matches its solo greedy decode, errors
    surface in the offending caller only, and close() drains cleanly."""
    import threading

    from tpu_audio.core.generation import (AudioGenerateParameters,
                                           AudioGenerationKind)
    from tpu_audio.models.tts.llama_tts import LlamaTTS
    from tpu_audio.parallel.continuous import TTSEngineWorker

    import jax.numpy as _jnp

    model = LlamaTTS.from_pretrained(str(tts_model), dtype=_jnp.float32,
                                     audio_band_head=True)
    params = AudioGenerateParameters(
        max_tokens=21, temperature=0.0, top_p=1.0,
        repetition_penalty=1.3, repetition_context_size=8,
        streaming_interval=0.02)
    texts = ["hello world", "a much longer second sentence to say"]

    def solo(text):
        toks, samples = [], 0
        for ev in model.generate_stream(text,
                                        generation_parameters=params):
            if ev.kind == AudioGenerationKind.TOKEN:
                toks.append(ev.token)
            elif ev.kind == AudioGenerationKind.AUDIO:
                samples += len(np.asarray(ev.audio))
        return toks, samples

    expected = [solo(t) for t in texts]

    worker = TTSEngineWorker(model, slots=2,
                             generation_parameters=params)
    results = {}

    def call(i):
        toks, samples = [], 0
        for ev in worker.synthesize(texts[i]):
            if ev.kind == AudioGenerationKind.TOKEN:
                toks.append(ev.token)
            elif ev.kind == AudioGenerationKind.AUDIO:
                samples += len(np.asarray(ev.audio))
        results[i] = (toks, samples)

    threads = [threading.Thread(target=call, args=(i,))
               for i in range(len(texts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
        assert not t.is_alive()
    assert results[0] == expected[0]
    assert results[1] == expected[1]
    assert results[0][1] > 0  # band head guarantees audio

    # a rejected request raises in its own caller, engine stays up
    with pytest.raises(ValueError):
        list(worker.synthesize(texts[0], max_tokens=-1))
    for ev in worker.synthesize(texts[0]):
        pass
    worker.close()
    # consumed requests are released: no unbounded growth in serving
    assert worker._srv.engine.requests == {}
    with pytest.raises(RuntimeError):
        next(worker.synthesize("after close"))


def test_tick_k_guarantees_live_tokens():
    """_tick_k divides min_tick_tokens by the LIVE lane count, not the
    padded bucket size: with 3 live lanes in a bucket of 4, a bucket-
    based division would decode 25% fewer tokens than the documented
    '>= min_tick_tokens per tick' contract (SERVING.md)."""
    from types import SimpleNamespace

    tick_k = ContinuousBatcher._tick_k
    eng = SimpleNamespace(min_tick_tokens=64, step_tokens=8)
    for live in (1, 2, 3, 4):
        k = tick_k(eng, live)
        assert k % eng.step_tokens == 0
        assert live * k >= eng.min_tick_tokens, (live, k)
    # 3 live lanes: ceil(64/3)=22 -> rounded up to 24 steps (x3 = 72 >= 64);
    # the old bucket-of-4 division gave 16 steps (x3 = 48 < 64)
    assert tick_k(eng, 3) == 24
    assert tick_k(SimpleNamespace(min_tick_tokens=None, step_tokens=8), 3) == 8


def test_continuous_tts_fused_matches_xla_engine(monkeypatch):
    """The M-lane fused llama serving tick produces the SAME greedy
    tokens as the vmapped XLA w8a8 engine for staggered requests —
    covers lane admission, bucketed underload ticks, left-pad prefill
    conversion, and the band-free head path."""
    from types import SimpleNamespace

    from tpu_audio.core import quant
    from tpu_audio.models.tts import llama_tts
    from tpu_audio.parallel.continuous import ContinuousTTS

    cfg = llama_tts.LlamaTTSConfig(
        hidden_size=1024, num_hidden_layers=2, intermediate_size=2048,
        num_attention_heads=8, num_key_value_heads=4, head_dim=128,
        vocab_size=96, rope_theta=10000.0, tie_word_embeddings=True,
        max_position_embeddings=256)
    params = llama.init_random_params(cfg, seed=13, dtype=jnp.float32)
    params = quant.quantize_tree(params, scheme="w8a8")
    toks = llama_tts.OrpheusTokens(
        start_of_human=1, end_of_human=2, end_of_text=3, start_of_speech=4,
        end_of_speech=5, pad_token=0, audio_start=6, audio_end=7,
        audio_token_offset=10, codebook_size=4)
    tokenizer = SimpleNamespace(
        encode=lambda s: SimpleNamespace(ids=[10 + (ord(c) % 30)
                                              for c in s]))
    codec = SimpleNamespace(
        config=None,
        decode=lambda codes: np.zeros((1, 2048 * max(1, len(codes[0][0]))),
                                      np.float32))
    gen = llama_tts.AudioGenerateParameters(
        max_tokens=6, temperature=0.0, repetition_penalty=1.0)

    def run(mode):
        monkeypatch.setenv("TPU_AUDIO_FUSED_LLAMA", mode)
        m = llama_tts.LlamaTTS(cfg, params, tokenizer=tokenizer,
                               codec=codec, tokens=toks,
                               dtype=jnp.float32)
        srv = ContinuousTTS(m, slots=2, generation_parameters=gen,
                            prefill_buckets=(16, 32), step_tokens=2,
                            max_len=64)
        assert srv.fused == (mode == "interpret")
        r0 = srv.submit("hello there")
        srv.step()
        r1 = srv.submit("hi")
        r2 = srv.submit("a third request queues")
        while not srv.idle:
            srv.step()
        return [srv.engine.requests[r.request_id].tokens
                for r in (r0, r1, r2)]

    assert run("interpret") == run("0")


def test_coerce_fused_flag():
    from tpu_audio.parallel.continuous import coerce_fused_flag

    for on in ("auto", "1", "on", True, 1):
        assert coerce_fused_flag(on) is True, on
    for off in ("0", "off", "false", "no", "disabled", "none", "",
                False, 0, None):
        assert coerce_fused_flag(off) is False, off
