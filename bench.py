"""Benchmarks on one TPU chip (BASELINE.md north stars).

Default (``python bench.py``): Whisper-large-v3 STT real-time factor —
baseline RTF <= 0.05 on a single v5e. Runs the real model graph
(large-v3 dims, random weights — weights don't change FLOPs or memory
traffic) end-to-end: log-mel frontend + encoder + 224-token KV-cached
decode of a 30 s window.

``python bench.py tts``: streaming Orpheus-shaped time-to-first-audio —
baseline "faster than real time": the first audio chunk must take less
wall-clock than its own playback duration. Measures prefill + the first
28-token LM chunk (Orpheus-3B dims, bf16) + a real-size SNAC decode of
the resulting 4 frames. Variants: ``tts w8`` (int8 MXU decode),
``tts band`` (audio-band lm_head).

Other modes: ``qwen3tts`` (talker + code predictor + codec first chunk at
real default dims), ``vad``, ``parakeet``, ``dfn``, ``lid``, and
``large-v3 [kv8|kv8d|w8]`` whisper variants. Default ``all`` runs every
north-star config and folds the rest under ``detail.also``.

Single modes print ONE json line {"metric", "value", "unit",
"vs_baseline"}. ``all`` streams one compact line per sub-bench as it
completes (so a driver timeout still captures finished metrics) and ends
with a merged line sized to fit the driver's ~2 KB output tail.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

# Stamped at import so standalone-learned wall times include interpreter
# startup + module imports — the costs a bench_all subprocess run pays too.
# (main()'s old in-function stamp biased learned estimates optimistic.)
_T_IMPORT0 = time.perf_counter()


def _enable_compile_cache():
    """Persistent XLA compilation cache: the large-v3 graphs take minutes to
    compile; cached re-runs (driver round benches) skip that entirely."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # floor 0: cache EVERY XLA executable. Measured (r4, headline mode
    # cold with JAX_EXPLAIN_CACHE_MISSES): 77 compiles, every one < 5 s,
    # so the default 5 s floor wrote NOTHING and re-runs re-paid ~40-60 s
    # of small XLA compiles. With floor 0 the cache entry serializes the
    # LOADED executable including the Mosaic kernel binary, so warm
    # re-runs also skip the minutes-long remote Mosaic compile that
    # otherwise happens at first execution (r5 measured: whisper_fused
    # 1540 s cold -> 168.6 s warm; see docs/DESIGN.md).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


_WHISPER_SIZES = {
    "tiny": dict(d_model=384, layers=4, heads=6, ffn=1536, n_mels=80),
    "base": dict(d_model=512, layers=6, heads=8, ffn=2048, n_mels=80),
    "small": dict(d_model=768, layers=12, heads=12, ffn=3072, n_mels=80),
    "medium": dict(d_model=1024, layers=24, heads=16, ffn=4096, n_mels=80),
    "large-v3": dict(d_model=1280, layers=32, heads=20, ffn=5120,
                     n_mels=128),
}


def _build_whisper(size: str, w8_decoder: bool = False,
                   w8_encoder: bool = False):
    """Real-dims Whisper model (random weights — weights don't change
    FLOPs or memory traffic) plus the shared decode-prompt setup, used by
    every whisper bench mode."""
    import jax
    import jax.numpy as jnp

    from tpu_audio.models.stt import whisper as W

    s = _WHISPER_SIZES[size]
    cfg = W.WhisperConfig(
        num_mel_bins=s["n_mels"], d_model=s["d_model"],
        encoder_layers=s["layers"], encoder_attention_heads=s["heads"],
        encoder_ffn_dim=s["ffn"], decoder_layers=s["layers"],
        decoder_attention_heads=s["heads"], decoder_ffn_dim=s["ffn"],
        vocab_size=51866, max_target_positions=448,
    )
    params = W.init_params(cfg, seed=0, dtype=jnp.bfloat16)
    if w8_decoder or w8_encoder:
        from tpu_audio.core import quant

        for part, on in (("decoder", w8_decoder), ("encoder", w8_encoder)):
            if on:
                params["model"][part] = quant.quantize_tree(
                    params["model"][part], scheme="w8a8")
    model = W.Whisper(cfg, params, dtype=jnp.bfloat16)

    prompt = [50258, 50259, 50360, 50364]
    prompt_buf = np.zeros((cfg.max_target_positions,), np.int32)
    prompt_buf[: len(prompt)] = prompt
    suppress = np.zeros((cfg.vocab_size,), np.float32)
    begin = np.zeros((cfg.vocab_size,), np.float32)
    setup = dict(
        prompt_len=len(prompt),
        prompt_buf=jnp.asarray(prompt_buf),
        suppress=jnp.asarray(suppress),
        begin=jnp.asarray(begin),
        key=jax.random.PRNGKey(0),
    )
    return model, cfg, setup


def bench_whisper_rtf(size: str = "large-v3", decode_tokens: int = 224,
                      repeats: int = 3, kv_bits: int | None = None,
                      w8_decoder: bool = False,
                      dense_self: bool = False,
                      w8_encoder: bool = False,
                      fused: bool = False) -> dict:
    """``w8_decoder`` quantizes the decoder stack (incl. the tied
    embedding head) to per-channel int8 for the native MXU path — the
    224-token decode loop is HBM-bound on decoder weight reads.
    ``dense_self`` sets ``quantized_kv_start=max_total`` so the
    self-attention cache stays full precision while the cross-KV runs
    int8 through the fused Pallas kernel (mode token ``kv8d``) — the
    fastest whisper config measured (RTF 0.0339 vs 0.0379 bf16 on v5e).
    ``w8_encoder`` (token ``w8e``) additionally runs the encoder stack's
    attention/FFN GEMMs in int8 — the 1500-frame encode is MXU
    compute-bound and v5e's s8 dot has 2x the bf16 peak (convs and
    position embeddings stay dense)."""
    import jax.numpy as jnp

    from tpu_audio.models.stt import whisper as W

    model, cfg, st = _build_whisper(size, w8_decoder=w8_decoder,
                                    w8_encoder=w8_encoder)

    rng = np.random.default_rng(0)
    audio = rng.standard_normal(W.CHUNK_LENGTH_SAMPLES).astype(np.float32) * 0.1
    max_total = st["prompt_len"] + decode_tokens

    if fused:
        # monolithic Pallas decoder (ops/pallas_fused_decoder): the whole
        # layer stack as one kernel per token; implies w8 + int8 cross KV
        # (mode token ``fused``; pair with ``w8e`` for the full headline)
        pack = model.fused_decoder_pack()

        def run_once():
            feats = model.encoder_features(audio)
            enc_out = model._encode(model.params, feats)
            tokens, count = model._decode_loop_f(
                model.params, pack, enc_out,
                st["prompt_buf"], jnp.int32(st["prompt_len"]),
                jnp.int32(-1),  # unmatched EOT -> full-length decode
                st["suppress"], st["begin"],
                jnp.float32(0.0), st["key"], max_total=max_total,
            )
            return tokens.block_until_ready(), int(count)
    else:
        def run_once():
            feats = model.encoder_features(audio)
            enc_out = model._encode(model.params, feats)
            tokens, count = model._decode_loop(
                model.params, enc_out,
                st["prompt_buf"], jnp.int32(st["prompt_len"]),
                jnp.int32(-1),  # unmatched EOT -> full-length decode
                st["suppress"], st["begin"],
                jnp.float32(0.0), st["key"], max_total=max_total,
                kv_bits=kv_bits,
                quantized_kv_start=max_total if dense_self else 0,
            )
            return tokens.block_until_ready(), int(count)

    # warmup/compile
    t0 = time.perf_counter()
    _, count = run_once()
    compile_time = time.perf_counter() - t0

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    wall = min(times)
    rtf = wall / 30.0
    baseline_rtf = 0.05
    return {
        "metric": f"whisper_{size}_rtf_30s_{decode_tokens}tok"
                  + ("_kv8" if kv_bits == 8 else "")
                  + ("d" if dense_self else "")
                  + ("_w8" if w8_decoder else "")
                  + ("_w8e" if w8_encoder else "")
                  + ("_fused" if fused else ""),
        "value": round(rtf, 5),
        "unit": "rtf",
        "vs_baseline": round(baseline_rtf / rtf, 3),
        "detail": {
            "wall_s": round(wall, 4),
            "compile_s": round(compile_time, 1),
            "decoded_tokens": count,
            "tokens_per_s": round(decode_tokens / wall, 1),
            "device": str(__import__("jax").devices()[0]),
        },
    }


def bench_whisper_longfile(size: str = "large-v3", n_windows: int = 8,
                           decode_tokens: int = 224, repeats: int = 3,
                           w8_decoder: bool = True) -> dict:
    """Long-audio batched-window decode vs the reference's sequential
    window loop (WhisperModel.swift:165-182). All ``n_windows`` 30 s
    windows are encoded in one batched call and decoded through ONE
    batched loop — the HBM-bound decoder weight reads amortize across
    rows, so the per-window decode cost collapses. Reports the RTF of the
    whole file through the batched path; ``detail`` carries the sequential
    RTF on the same graphs and the resulting speedup."""
    import jax.numpy as jnp

    from tpu_audio.models.stt import whisper as W

    model, cfg, st = _build_whisper(size, w8_decoder=w8_decoder)

    rng = np.random.default_rng(0)
    windows = [rng.standard_normal(W.CHUNK_LENGTH_SAMPLES)
               .astype(np.float32) * 0.1 for _ in range(n_windows)]
    max_total = st["prompt_len"] + decode_tokens
    args = (st["prompt_buf"], jnp.int32(st["prompt_len"]),
            jnp.int32(-1),  # unmatched EOT -> full-length decode
            st["suppress"], st["begin"], jnp.float32(0.0), st["key"])

    def run_batched():
        feats = jnp.concatenate(
            [model.encoder_features(w) for w in windows], axis=0)
        enc_out = model._encode(model.params, feats)
        tokens, count = model._decode_loop_b(
            model.params, enc_out, *args, max_total=max_total)
        return tokens.block_until_ready(), int(count)

    def run_sequential():
        n_tok = 0
        for w in windows:
            feats = model.encoder_features(w)
            enc_out = model._encode(model.params, feats)
            tokens, count = model._decode_loop(
                model.params, enc_out, *args, max_total=max_total)
            tokens.block_until_ready()
            n_tok += int(count)
        return n_tok

    t0 = time.perf_counter()
    run_batched()
    compile_b = time.perf_counter() - t0
    wall_b = min(_timed(run_batched) for _ in range(repeats))

    run_sequential()  # compile the per-window graphs
    wall_s = min(_timed(run_sequential) for _ in range(repeats))

    audio_s = n_windows * 30.0
    rtf = wall_b / audio_s
    return {
        "metric": f"whisper_{size}_longfile_{n_windows}x30s"
                  + ("_w8" if w8_decoder else ""),
        "value": round(rtf, 5),
        "unit": "rtf",
        "vs_baseline": round(0.05 / rtf, 3),
        "detail": {
            "batched_wall_s": round(wall_b, 3),
            "sequential_wall_s": round(wall_s, 3),
            "speedup_vs_sequential": round(wall_s / wall_b, 2),
            "sequential_rtf": round(wall_s / audio_s, 5),
            "aggregate_tokens_per_s": round(
                n_windows * decode_tokens / wall_b, 1),
            "compile_s": round(compile_b, 1),
            "device": str(__import__("jax").devices()[0]),
        },
    }


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def bench_tts_ttfb(chunk_tokens: int = 28, repeats: int = 3,
                   lm_dims: dict | None = None,
                   snac_dims: dict | None = None,
                   quantize_bits: int | None = None,
                   band_head: bool = False,
                   fused: bool = False) -> dict:
    """Streaming TTS time-to-first-audio: Orpheus-3B-shaped llama decode
    + real-size SNAC 24k decode of the first 4 frames.

    ``quantize_bits=4/8`` runs the LM with MLX grouped-affine quantized
    weights through the fused Pallas GEMV (the deployment config the
    reference itself benchmarks — mlx-community Orpheus checkpoints ship
    4-bit; BASELINE config 5 is 8-bit Qwen3-TTS streaming)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    if quantize_bits:
        os.environ["TPU_AUDIO_PALLAS"] = "1"

    from tpu_audio.codecs.snac import SNAC
    from tpu_audio.core.ar_loop import make_decode_chunk
    from tpu_audio.core.sampling import SamplingParams
    from tpu_audio.models import llama

    # Orpheus-3b = llama-3.2-3B backbone with ~28k audio tokens appended
    cfg = llama.LlamaConfig(**(lm_dims or dict(
        vocab_size=156940, hidden_size=3072, num_hidden_layers=28,
        num_attention_heads=24, num_key_value_heads=8,
        intermediate_size=8192, max_position_embeddings=4096,
    )))
    params = llama.init_random_params(cfg, seed=0, dtype=jnp.bfloat16,
                                      on_device=True)
    pack = None
    if fused:
        # monolithic Pallas llama decoder (ops/pallas_fused_llama):
        # implies w8a8; the pack needs the UNFUSED quantized tree
        from tpu_audio.core import quant
        from tpu_audio.ops import pallas_fused_llama as FL

        assert FL.supported(cfg)
        quantize_bits = -8
        params = quant.quantize_tree(params, scheme="w8a8")
        pack = FL.pack_llama_weights(params, cfg)
        band_head = True  # deployment head; the stack is what changed
    elif quantize_bits:
        from tpu_audio.core import quant

        if quantize_bits == -8:  # w8a8 int8 MXU path
            params = quant.quantize_tree(params, scheme="w8a8")
        else:
            params = quant.quantize_tree(params, group_size=64,
                                         bits=quantize_bits)
        params = llama.fuse_projections(params)

    # real-size SNAC 24 kHz decoder (random weights via the fixture writer)
    sys.path.insert(0, "tests")
    from fixtures import make_snac_fixture

    snac_dir = tempfile.mkdtemp(prefix="bench_snac_")
    make_snac_fixture(
        __import__("pathlib").Path(snac_dir), **(snac_dims or dict(
            sampling_rate=24000, encoder_dim=64, encoder_rates=(2, 4, 8, 8),
            decoder_dim=1024, decoder_rates=(8, 8, 4, 2),
            vq_strides=(4, 2, 1), codebook_size=4096, codebook_dim=8)))
    snac = SNAC.from_pretrained(snac_dir, dtype=jnp.bfloat16)

    from tpu_audio.codecs.snac import decoder_forward as snac_decoder
    from tpu_audio.codecs.snac import vq_from_codes
    from tpu_audio.core.sampling import _mask_top_p

    sp = SamplingParams(temperature=0.6, top_p=0.9)
    bucket = 64
    prompt = np.zeros((1, bucket), np.int32)
    prompt[0, -8:] = np.arange(8) + 100
    n_frames = chunk_tokens // 7

    band_params = None
    if band_head:
        # audio-band decode head: 7*4096 audio rows + EOS instead of the
        # full 156940-row lm_head (the deployment fast path in llama_tts)
        from tpu_audio.core import quant

        offset, eos = 128266, 128258
        rows = np.concatenate([offset + np.arange(7 * 4096), [eos]])
        band_params = quant.slice_rows(
            params.get("lm_head") or params["model"]["embed_tokens"],
            rows.astype(np.int32))

    # ONE jitted graph: prefill + chunk_tokens-step decode + SNAC decode.
    # A single device call = single tunnel round-trip; no host syncs
    # between the LM chunk and the codec.
    @jax.jit
    def first_chunk(p, band_params, snac_p, prompt_ids, rng):
        cache = llama.make_cache(cfg, 1, bucket + chunk_tokens + 2,
                                 jnp.bfloat16)
        # band mode skips the discarded full-vocab prefill logits, matching
        # the llama_tts prefill path
        _, cache = llama.forward(p, prompt_ids[:, :-1], cache, cfg,
                                 return_hidden=band_params is not None)
        tokens = jnp.zeros((chunk_tokens,), jnp.int32)

        def body(c, _):
            tokens_c, cache, last, rng = c
            if band_params is not None:
                from tpu_audio.core import nn as _nn

                hidden, cache = llama.forward(p, last[:, None], cache, cfg,
                                              return_hidden=True)
                logits = _nn.linear(band_params,
                                    hidden[:, -1]).astype(jnp.float32)
            else:
                logits, cache = llama.forward(p, last[:, None], cache, cfg)
                logits = logits[:, -1].astype(jnp.float32)
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(
                sub, _mask_top_p(logits, sp.top_p) / sp.temperature,
                axis=-1).astype(jnp.int32)
            if band_params is not None:
                nxt = jnp.where(nxt >= 7 * 4096, jnp.int32(128258),
                                nxt + jnp.int32(128266))
            return (tokens_c, cache, nxt, rng), nxt[0]

        (_, cache, _, rng), toks = jax.lax.scan(
            body, (tokens, cache, prompt_ids[:, -1], rng),
            None, length=chunk_tokens)
        f = toks.reshape(n_frames, 7) % 4096
        codes = [f[:, :1].reshape(1, -1), f[:, 1:3].reshape(1, -1),
                 f[:, 3:7].reshape(1, -1)]
        z = vq_from_codes(snac.params, codes, snac.config)
        return snac_decoder(snac.params, z, snac.config, rng=rng)

    if fused:
        from tpu_audio.core import nn as _nn
        from tpu_audio.ops import pallas_fused_llama as FL

        dkv = cfg.num_key_value_heads * 128
        s_max = -(-(bucket + chunk_tokens + 2) // FL.SUB) * FL.SUB
        L = cfg.num_hidden_layers

        @jax.jit
        def first_chunk_fused(p, pk, band_p, snac_p, prompt_ids, rng):
            # XLA prefill fills a standard cache in one pass; convert to
            # the kernel's position-major [L, S, dkv] layout (k rows are
            # already rotated — llama.forward caches post-RoPE K)
            cache = llama.make_cache(cfg, 1, s_max, jnp.bfloat16)
            _, cache = llama.forward(p, prompt_ids[:, :-1], cache, cfg,
                                     return_hidden=True)
            kc = cache.k[:, 0].transpose(0, 2, 1, 3).reshape(
                L, s_max, dkv).astype(jnp.bfloat16)
            vc = cache.v[:, 0].transpose(0, 2, 1, 3).reshape(
                L, s_max, dkv).astype(jnp.bfloat16)
            emb = p["model"]["embed_tokens"]

            def body(c, i):
                kc, vc, last, rng = c
                x = _nn.embedding(emb, last)[0].astype(jnp.float32)
                x8 = jnp.zeros((8, cfg.hidden_size), jnp.float32
                               ).at[0].set(x)
                pos = bucket - 1 + i
                y, nk, nv = FL.fused_llama_stack(pk, kc, vc, x8, pos,
                                                 cfg=cfg)
                kc = jax.lax.dynamic_update_slice(
                    kc, nk[:, 0:1].astype(kc.dtype), (0, pos, 0))
                vc = jax.lax.dynamic_update_slice(
                    vc, nv[:, 0:1].astype(vc.dtype), (0, pos, 0))
                h = _nn.rms_norm(p["model"]["norm"],
                                 y[0:1].astype(jnp.bfloat16),
                                 cfg.rms_norm_eps)
                logits = _nn.linear(band_p, h).astype(jnp.float32)
                rng, sub = jax.random.split(rng)
                nxt = jax.random.categorical(
                    sub, _mask_top_p(logits, sp.top_p) / sp.temperature,
                    axis=-1).astype(jnp.int32)
                nxt = jnp.where(nxt >= 7 * 4096, jnp.int32(128258),
                                nxt + jnp.int32(128266))
                return (kc, vc, nxt, rng), nxt[0]

            (_, _, _, rng), toks = jax.lax.scan(
                body, (kc, vc, prompt_ids[:, -1], rng),
                jnp.arange(chunk_tokens))
            f = toks.reshape(n_frames, 7) % 4096
            codes = [f[:, :1].reshape(1, -1), f[:, 1:3].reshape(1, -1),
                     f[:, 3:7].reshape(1, -1)]
            z = vq_from_codes(snac.params, codes, snac.config)
            return snac_decoder(snac.params, z, snac.config, rng=rng)

        def run_once(seed):
            wav = first_chunk_fused(params, pack, band_params, snac.params,
                                    jnp.asarray(prompt),
                                    jax.random.PRNGKey(seed))
            return np.asarray(wav)
    else:
        def run_once(seed):
            wav = first_chunk(params, band_params, snac.params,
                              jnp.asarray(prompt), jax.random.PRNGKey(seed))
            return np.asarray(wav)

    wav = run_once(0)  # warmup/compile
    audio_s = wav.size / 24000.0

    times = []
    for r in range(repeats):
        t0 = time.perf_counter()
        run_once(r + 1)
        times.append(time.perf_counter() - t0)
    ttfb = min(times)
    rtx = audio_s / ttfb  # >1 = first chunk arrives faster than realtime
    return {
        "metric": f"orpheus3b_tts_ttfb_{chunk_tokens}tok"
                  + ("_w8a8" if quantize_bits == -8 else
                     f"_q{quantize_bits}" if quantize_bits else "")
                  + ("_band" if band_head else "")
                  + ("_fusedk" if fused else ""),
        "value": round(ttfb * 1000, 1),
        "unit": "ms",
        "vs_baseline": round(rtx, 3),
        "detail": {
            "first_audio_s": round(audio_s, 3),
            "realtime_x": round(rtx, 2),
            "tokens_per_s": round(chunk_tokens / ttfb, 1),
            "device": str(__import__("jax").devices()[0]),
        },
    }


def bench_qwen3_serving(slots: int = 4, ticks: int = 8) -> dict:
    """Qwen3TTS continuous-batching serving: aggregate frames/s with
    ``slots`` concurrent requests through the real ContinuousQwen3TTS
    engine (talker + 15-step code-predictor sub-loop per frame), and the
    same engine driving ONE stream (bucket-1 graph) as the single-stream
    baseline. Real default dims (talker 20L x 1024, cp 4L, 16 groups);
    per-lane realtime_x = frames/s/lane / 12.5 Hz."""
    import jax.numpy as jnp

    from tpu_audio.codecs import qwen3_codec as QC
    from tpu_audio.core.generation import AudioGenerateParameters
    from tpu_audio.models import llama
    from tpu_audio.models.tts import qwen3_tts as QT
    from tpu_audio.parallel.continuous_qwen3 import ContinuousQwen3TTS

    import dataclasses as _dc

    config = QT.Qwen3TTSConfig()
    # real checkpoints size the talker head past the special codec ids
    # (codec_bos_id 4197); the bare default (4096 == eos id) is
    # checkpoint-inconsistent
    config.talker = _dc.replace(config.talker, vocab_size=4198)
    config.code_predictor = _dc.replace(
        config.code_predictor, num_code_groups=config.talker.num_code_groups)
    params = QT.init_random_params(config, dtype=jnp.bfloat16,
                                   on_device=True)
    params = llama.fuse_projections(params)
    params["code_predictor"] = llama.fuse_projections(
        params["code_predictor"])
    codec_cfg = QC.Qwen3CodecDecoderConfig()
    codec = QC.Qwen3CodecDecoder(
        codec_cfg, QC.init_random_params(codec_cfg, on_device=True))

    class _Tok:  # byte-level stub: prepare_generation_inputs needs .encode
        class _Ids:
            def __init__(self, ids):
                self.ids = ids

        def encode(self, text):
            return self._Ids([b % 1000 for b in text.encode()])

    model = QT.Qwen3TTS(config, params, tokenizer=_Tok(), codec=codec,
                        dtype=jnp.bfloat16)
    max_new = ticks + 4
    gp = AudioGenerateParameters(
        temperature=0.9, top_k=50, max_tokens=max_new,
        streaming_interval=30.0)  # decode audio only at flush
    text = "the quick brown fox jumps over the lazy dog " * 2

    def measure(n_live: int) -> float:
        srv = ContinuousQwen3TTS(model, slots=slots,
                                 generation_parameters=gp,
                                 prefill_buckets=(64,))
        for i in range(n_live):
            srv.submit(text, seed=i)
        srv.step(); srv.step()  # compile prefill + tick; steady state
        t0 = time.perf_counter()
        for _ in range(ticks):
            srv.step()
        return (time.perf_counter() - t0) / ticks

    tick_solo = measure(1)          # bucket-1 graph inside the slots=4 srv
    tick_batch = measure(slots)
    frames_s = slots / tick_batch
    solo_frames_s = 1.0 / tick_solo
    mult = frames_s / solo_frames_s
    return {
        "metric": f"qwen3tts_serving_frames_s_slots{slots}",
        "value": round(frames_s, 1),
        "unit": "frames/s",
        "vs_baseline": round(mult, 2),  # aggregate vs single-stream
        "detail": {
            "single_stream_frames_s": round(solo_frames_s, 1),
            "per_lane_realtime_x_batched": round(frames_s / slots / 12.5, 2),
            "single_stream_realtime_x": round(solo_frames_s / 12.5, 2),
            "ms_per_tick_batch": round(tick_batch * 1000, 1),
            "ms_per_tick_solo": round(tick_solo * 1000, 1),
            "device": str(__import__("jax").devices()[0]),
        },
    }


def bench_serving_throughput(slots: int = 4, step_tokens: int = 16,
                             ticks: int = 6, lm_dims: dict | None = None,
                             fused: bool = False) -> dict:
    """Continuous-batching serving throughput on Orpheus-3B-shaped decode.

    Measures aggregate sampled tokens/s with ``slots`` concurrent
    requests sharing one jitted ``[slots]``-lane decode tick
    (``parallel/continuous.py``), and the same engine at slots=1 as the
    single-stream baseline — the serving win is that the batched HBM
    weight sweep feeds all lanes at once, so aggregate throughput scales
    near-linearly in slots while per-stream latency stays ~flat. No
    reference analog (the reference is single-request); baseline is our
    own single-stream rate.

    ``fused=True`` (the ``serve_fused`` mode) runs the SAME measurement
    with w8a8 weights through the M-lane fused llama kernel
    (ops/pallas_fused_llama.fused_llama_stack_lanes via
    LlamaTTS._fused_lane_hooks) — the recommended serving config the
    offline `tts w8`/`tts fused` rows use."""
    import jax
    import jax.numpy as jnp

    from tpu_audio.core.sampling import SamplingParams
    from tpu_audio.models import llama
    from tpu_audio.parallel.continuous import ContinuousBatcher

    dims = lm_dims or dict(
        vocab_size=156940, hidden_size=3072, num_hidden_layers=28,
        num_attention_heads=24, num_key_value_heads=8,
        intermediate_size=8192, max_position_embeddings=4096,
    )
    sampling = SamplingParams(temperature=0.6, top_p=0.9, top_k=512)
    max_new = step_tokens * (ticks + 2)
    max_len = 64 + max_new + step_tokens + 2
    rng = np.random.default_rng(0)

    if fused:
        from tpu_audio.core import quant
        from tpu_audio.models.tts import llama_tts

        cfg = llama_tts.LlamaTTSConfig(**dims)
        params = llama.init_random_params(cfg, seed=0, dtype=jnp.bfloat16,
                                          on_device=True)
        params = quant.quantize_tree(params, scheme="w8a8")
        model = llama_tts.LlamaTTS(cfg, params, tokenizer=None,
                                   codec=None, dtype=jnp.bfloat16)
        hooks = model._fused_lane_hooks(max_len)
        if hooks is None:
            raise RuntimeError("fused lane hooks unsupported here (needs "
                               "a TPU backend + w8a8 tree)")
    else:
        cfg = llama.LlamaConfig(**dims)
        params = llama.init_random_params(cfg, seed=0, dtype=jnp.bfloat16,
                                          on_device=True)
        hooks = None

    def measure(n_slots: int) -> float:
        """Steady-state seconds per tick with every lane occupied."""
        hk = dict(hooks) if hooks is not None else {"params": params}
        eng = ContinuousBatcher(
            hk.pop("params"), cfg, slots=n_slots, stop_token=-1,
            sampling=sampling, max_len=max_len,
            prefill_buckets=(64,), seed=0, step_tokens=step_tokens, **hk)
        for s in range(n_slots):
            eng.submit(rng.integers(100, 4000, size=60).astype(np.int32),
                       max_new=max_new, seed=s)
        eng.step()  # compile prefill + tick; admits all lanes
        eng.step()  # steady state
        t0 = time.perf_counter()
        for _ in range(ticks):
            eng.step()
        return (time.perf_counter() - t0) / ticks

    tick_solo = measure(1)
    tick_batch = measure(slots)
    tok_s = slots * step_tokens / tick_batch
    solo_tok_s = step_tokens / tick_solo
    mult = tok_s / solo_tok_s
    tag = "_fused" if fused else ""
    return {
        "metric": f"orpheus3b_serving{tag}_tok_s_slots{slots}",
        "value": round(tok_s, 1),
        "unit": "tok/s",
        "vs_baseline": round(mult, 2),  # aggregate vs single-stream
        "detail": {
            "single_stream_tok_s": round(solo_tok_s, 1),
            "throughput_multiple": round(mult, 2),
            "ms_per_tick_batch": round(tick_batch * 1000, 1),
            "ms_per_tick_solo": round(tick_solo * 1000, 1),
            "step_tokens": step_tokens,
            "per_stream_tok_s_batched": round(tok_s / slots, 1),
            "device": str(__import__("jax").devices()[0]),
        },
    }


def bench_serving_stt(slots: int = 4, step_tokens: int = 8,
                      ticks: int = 3, size: str = "large-v3") -> dict:
    """Whisper continuous-serving throughput: aggregate decoded tokens/s
    with ``slots`` concurrent <=30 s transcriptions sharing the batched
    decode tick (parallel/continuous_stt.py), vs a single stream in the
    SAME engine (the bucketed underload path a lightly-loaded server
    pays). Decoder weights are int8 (w8) — the deployment config the
    offline headline (kv8d w8 w8e) uses, so single_stream_tok_s compares
    directly against the offline decode rate. Encodes are per-request
    one-shot dispatches and excluded — the decode loop is what scales
    with concurrent load."""
    from tpu_audio.models.stt import whisper as W

    model, cfg, _ = _build_whisper(size, w8_decoder=True)
    sys.path.insert(0, "tests")
    from fixtures import FakeWhisperTokenizer

    model.tokenizer = FakeWhisperTokenizer(vocab=cfg.vocab_size)
    from tpu_audio.parallel.continuous_stt import ContinuousSTT

    rng = np.random.default_rng(0)
    audio = rng.standard_normal(W.CHUNK_LENGTH_SAMPLES).astype(
        np.float32) * 0.1
    fused_route = {"fused": False}   # set by measure() from the engine

    def measure(n_live: int) -> tuple[float, float]:
        """tok/s and ms/tick with ``n_live`` streams in the SAME
        slots=``slots`` engine — n_live < slots exercises the bucketed
        underload graphs (larger per-tick scan + pipelined fetch), which
        is what a real server pays when traffic is light."""
        srv = ContinuousSTT(model, slots=slots, max_tokens=440,
                            step_tokens=step_tokens)
        fused_route["fused"] = srv.fused
        # disable the EOT stop (set before the first tick traces): every
        # lane must stay live the whole measurement on random weights
        srv.engine.stop_token = -1
        # budget check: lanes must never exhaust max_tokens mid-measure
        # (a frozen lane silently deflates tok/s)
        k_solo = srv.engine._tick_k(1)
        assert (2 + ticks + 1) * k_solo <= srv.max_tokens, \
            "measurement would outrun the per-request token budget"
        for _ in range(n_live):
            srv.submit(audio)
        for _ in range(2):   # compile + fill the pipeline
            srv.step()
        t0 = time.perf_counter()
        emitted = 0
        for _ in range(ticks):
            emitted += len(srv.step())
        dt = time.perf_counter() - t0
        return emitted / dt, dt / ticks

    solo_tok_s, tick_solo = measure(1)
    tok_s, tick_batch = measure(slots)
    return {
        "metric": f"whisper_{size}_serving_tok_s_slots{slots}",
        "value": round(tok_s, 1),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / solo_tok_s, 2),
        "detail": {
            "single_stream_tok_s": round(solo_tok_s, 1),
            "ms_per_tick_batch": round(tick_batch * 1000, 1),
            "ms_per_tick_solo": round(tick_solo * 1000, 1),
            "step_tokens": step_tokens,
            "fused": fused_route["fused"],
            "device": str(__import__("jax").devices()[0]),
        },
    }


def bench_qwen3_tts_ttfb(chunk_frames: int = 12, repeats: int = 3,
                         prefix_len: int = 32, talker_dims: dict | None = None,
                         codec_dims: dict | None = None) -> dict:
    """Streaming Qwen3-TTS time-to-first-audio (BASELINE config 5 shape):
    real-default-size talker (20L x 1024) + code-predictor (4L, 16 groups)
    + real-size 12.5 Hz codec decoder, random weights initialized on device
    (init trees are shape-verified against ``from_pretrained`` checkpoints
    in test_qwen3_tts.py::test_init_random_params_matches_loaded_tree).

    One jitted graph = prefill + ``chunk_frames`` macro steps (talker step
    + 15 code-predictor sub-steps each) + first-chunk codec decode — a
    single tunnel dispatch, mirroring the streaming_interval=~1 s first
    chunk (Qwen3TTS.swift:394-420 semantics)."""
    import jax
    import jax.numpy as jnp

    from tpu_audio.codecs import qwen3_codec as QC
    from tpu_audio.core import kv_cache, nn
    from tpu_audio.models import llama
    from tpu_audio.models.tts import qwen3_tts as QT

    config = QT.Qwen3TTSConfig()
    if talker_dims:
        config.talker = QT.TalkerConfig(**talker_dims)
        config.code_predictor = QT.CodePredictorConfig.from_dict(
            dict(talker_dims.get("code_predictor_config") or {},
                 num_code_groups=config.talker.num_code_groups))
    tcfg, ccfg = config.talker, config.code_predictor
    params = QT.init_random_params(config, dtype=jnp.bfloat16, on_device=True)
    params = llama.fuse_projections(params)
    params["code_predictor"] = llama.fuse_projections(params["code_predictor"])
    cp_stacked = QT.Qwen3TTS._stack_group_heads(params)
    codec_cfg = QC.Qwen3CodecDecoderConfig(**(codec_dims or {}))
    codec_params = QC.init_random_params(codec_cfg, on_device=True)

    G = tcfg.num_code_groups
    temp, top_k = 0.9, 50

    @jax.jit
    def first_chunk(p, cp, rng):
        rng, sub = jax.random.split(rng)
        embeds = jax.random.normal(
            sub, (1, prefix_len, tcfg.hidden_size), jnp.bfloat16) * 0.1
        rng, sub = jax.random.split(rng)
        pad_embed = jax.random.normal(
            sub, (1, 1, tcfg.hidden_size), jnp.bfloat16) * 0.1
        cache = kv_cache.init_cache(
            tcfg.num_hidden_layers, 1, tcfg.num_key_value_heads,
            tcfg.head_dim, prefix_len + chunk_frames + 2, jnp.bfloat16)
        _, _, cache = QT.talker_forward(p, embeds[:, :-1], cache, tcfg)

        lm_stack, emb_stack = cp_stacked

        def body(carry, _):
            emb, cache, rng = carry
            logits, hidden, cache = QT.talker_forward(p, emb, cache, tcfg)
            rng, sub = jax.random.split(rng)
            c0 = QT._sample(sub, logits[:, -1], temp, top_k, 1.0)
            cpp = p["code_predictor"]
            cp_cache = kv_cache.init_cache(
                ccfg.num_hidden_layers, 1, ccfg.num_key_value_heads,
                ccfg.head_dim, G + 2, jnp.bfloat16)
            c0_embed = nn.embedding(p["model"]["codec_embedding"],
                                    c0[:, None]).astype(jnp.bfloat16)
            # same shape as the model's macro step: group 0 unrolled (T=2
            # input), groups 1..G-2 as one scan body (qwen3_tts.py)
            code_input = jnp.concatenate([hidden[:, -1:], c0_embed], axis=1)
            h, cp_cache = QT._cp_hidden(cpp, code_input, cp_cache, ccfg)
            rng, sub = jax.random.split(rng)
            c1 = QT._sample(sub, h[:, -1] @ lm_stack[0].T.astype(h.dtype),
                            temp, top_k, 1.0)
            g1_embed = emb_stack[0][c1][:, None].astype(jnp.bfloat16)

            def group_step(c, g):
                code_input, cp_cache, rng = c
                h, cp_cache = QT._cp_hidden(cpp, code_input, cp_cache, ccfg)
                rng, sub = jax.random.split(rng)
                cg = QT._sample(sub, h[:, -1] @ lm_stack[g].T.astype(h.dtype),
                                temp, top_k, 1.0)
                g_embed = emb_stack[g][cg][:, None].astype(jnp.bfloat16)
                return (g_embed, cp_cache, rng), (cg, g_embed[:, 0])

            (_, cp_cache, rng), (cgs, g_embeds) = jax.lax.scan(
                group_step, (g1_embed, cp_cache, rng), jnp.arange(1, G - 1))
            codes = jnp.concatenate([c0[:, None], c1[:, None], cgs.T], 1)[0]
            embed_sum = c0_embed + g1_embed + g_embeds.sum(axis=0)[:, None]
            return (pad_embed + embed_sum, cache, rng), codes

        (_, cache, rng), codes = jax.lax.scan(
            body, (embeds[:, -1:], cache, rng), None, length=chunk_frames)
        codes = (codes.T[None] % codec_cfg.codebook_size)  # [1, G, T]
        return QC.decoder_forward(cp, codes, codec_cfg)

    def run_once(seed):
        return np.asarray(first_chunk(params, codec_params,
                                      jax.random.PRNGKey(seed)))

    wav = run_once(0)  # warmup/compile
    audio_s = wav.size / codec_cfg.sampling_rate

    times = []
    for r in range(repeats):
        t0 = time.perf_counter()
        run_once(r + 1)
        times.append(time.perf_counter() - t0)
    ttfb = min(times)
    rtx = audio_s / ttfb
    return {
        "metric": f"qwen3tts_ttfb_{chunk_frames}frames",
        "value": round(ttfb * 1000, 1),
        "unit": "ms",
        "vs_baseline": round(rtx, 3),
        "detail": {
            "first_audio_s": round(audio_s, 3),
            "realtime_x": round(rtx, 2),
            "frames_per_s": round(chunk_frames / ttfb, 1),
            "device": str(jax.devices()[0]),
        },
    }


def bench_vad_diarization(audio_seconds: float = 30.0, repeats: int = 3,
                          sortformer_dims: dict | None = None) -> dict:
    """BASELINE config 2: Sortformer 4-spk streaming diarization. Real
    Sortformer-4spk dims (18-layer FastConformer d=512 + 18-layer
    transformer d=192), random weights.

    Silero runs as its own ``vad_silero`` mode: r4's combined mode burnt
    a 267 s sweep timeout on the Sortformer compile and reported NOTHING
    — split sub-models mean a partial result always survives."""
    import tempfile

    sys.path.insert(0, "tests")
    from pathlib import Path

    from fixtures import make_sortformer_fixture

    from tpu_audio.models.vad.sortformer import Sortformer

    srt_dir = Path(tempfile.mkdtemp(prefix="bench_srt_"))
    make_sortformer_fixture(srt_dir, **(sortformer_dims or dict(
        H=512, TF=192, CH=256, MELS=128, HEADS=8, fc_layers=18,
        tf_layers=18, fc_ffn=2048, tf_ffn=768, tf_heads=8)))
    diar = Sortformer.from_pretrained(str(srt_dir))

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(int(16000 * audio_seconds))
             .astype(np.float32) * 0.1)

    def run_once():
        return list(diar.generate_stream(audio, chunk_duration=5.0))

    run_once()  # warmup/compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    wall = min(times)
    rtf = wall / audio_seconds
    return {
        "metric": f"sortformer4spk_stream_rtf_{int(audio_seconds)}s",
        "value": round(rtf, 5),
        "unit": "rtf",
        "vs_baseline": round(1.0 / rtf, 3),  # baseline: real time
        "detail": {
            "wall_s": round(wall, 4),
            "device": str(__import__("jax").devices()[0]),
        },
    }


def bench_vad_silero(audio_seconds: float = 30.0, repeats: int = 3) -> dict:
    """Silero VAD streaming probabilities over ``audio_seconds`` of 16 kHz
    audio (512-sample chunks through the stateful jitted step)."""
    import tempfile

    sys.path.insert(0, "tests")
    from pathlib import Path

    from fixtures import make_silero_fixture

    from tpu_audio.models.vad.silero import SileroVAD

    sil_dir = Path(tempfile.mkdtemp(prefix="bench_sil_"))
    make_silero_fixture(sil_dir)
    vad = SileroVAD.from_pretrained(str(sil_dir))

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(int(16000 * audio_seconds))
             .astype(np.float32) * 0.1)

    def run_once():
        return vad.predict_proba(audio)

    run_once()  # warmup/compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    wall = min(times)
    rtf = wall / audio_seconds
    return {
        "metric": f"silero_vad_rtf_{int(audio_seconds)}s",
        "value": round(rtf, 5),
        "unit": "rtf",
        "vs_baseline": round(1.0 / rtf, 3),  # baseline: real time
        "detail": {
            "wall_s": round(wall, 4),
            "device": str(__import__("jax").devices()[0]),
        },
    }


def bench_parakeet_batch(batch: int = 8, audio_seconds: float = 30.0,
                         repeats: int = 3,
                         dims: dict | None = None) -> dict:
    """BASELINE config 3: Parakeet-TDT batched decode. Real TDT-0.6B dims
    (24-layer FastConformer d=1024), random weights, hybrid batch decode."""
    import tempfile

    sys.path.insert(0, "tests")
    from pathlib import Path

    from fixtures import make_parakeet_fixture

    from tpu_audio.models.stt.parakeet import Parakeet

    d = Path(tempfile.mkdtemp(prefix="bench_parakeet_"))
    make_parakeet_fixture(d, **(dims or dict(
        vocab=1024, d_model=1024, n_layers=24, n_heads=8, features=128,
        variant="tdt", pred_hidden=640, joint_hidden=640, conv_ch=256)))
    model = Parakeet.from_pretrained(str(d))

    rng = np.random.default_rng(0)
    audios = [
        (rng.standard_normal(int(16000 * audio_seconds)).astype(np.float32)
         * 0.1)
        for _ in range(batch)
    ]

    def run_once():
        return model.generate_batch(audios)

    run_once()  # warmup/compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    wall = min(times)
    rtfx = batch * audio_seconds / wall
    return {
        "metric": f"parakeet_tdt0.6b_batch{batch}_rtfx_{int(audio_seconds)}s",
        "value": round(rtfx, 1),
        "unit": "rtfx",
        "vs_baseline": round(rtfx, 1),  # baseline: real time per stream
        "detail": {
            "wall_s": round(wall, 4),
            "device": str(__import__("jax").devices()[0]),
        },
    }


def bench_lid(audio_seconds: float = 10.0, repeats: int = 5) -> dict:
    """ECAPA-TDNN voxlingua107-geometry LID latency per 10 s clip
    (reference: ~15 ms on M1, MLXAudioLID/README.md:7-10). Real dims
    (channels 1024, res2net scale 8, emb 256, 107 classes ~= the 81 MB
    checkpoint), random weights through the real from_pretrained path."""
    import tempfile
    from pathlib import Path

    sys.path.insert(0, "tests")
    from fixtures import make_ecapa_fixture

    from tpu_audio.models.lid import load_model

    d = Path(tempfile.mkdtemp(prefix="bench_ecapa_"))
    make_ecapa_fixture(d, CH=1024, EMB=256, HID=512, NCLS=107, MELS=60,
                       SCALE=8, SE=128)
    model = load_model(str(d))

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(int(16000 * audio_seconds))
             .astype(np.float32) * 0.1)

    # SLOPE timing: one compiled graph with a traced trip count runs the
    # full waveform->probs pipeline n times back-to-back on device; per-clip
    # cost = (wall(n2) - wall(n1)) / (n2 - n1). This is immune to the axon
    # tunnel's fixed per-dispatch/readback costs AND to the question of
    # whether block_until_ready truly synchronizes on a remote-attached
    # backend (it does not always) — the scalar readback at the end forces
    # completion, and the fixed cost cancels in the difference. The
    # reference's ~15 ms M1 number is pure unified-memory compute, so the
    # on-device slope is the apples-to-apples quantity.
    import jax
    import jax.numpy as jnp

    full = model._predict_jit.__wrapped__  # raw fused waveform->probs fn
    dev_audio = jnp.asarray(audio)

    @jax.jit
    def loop(p, a, n):
        def body(i, carry):
            out = full(p, a + carry * 1e-12)  # data dep across iterations
            return out.sum()
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n):
        t0 = time.perf_counter()
        float(loop(model.params, dev_audio, jnp.int32(n)))
        return time.perf_counter() - t0

    timed(2)  # compile + warm
    n1, n2 = 8, 40
    w1 = min(timed(n1) for _ in range(repeats))
    w2 = min(timed(n2) for _ in range(repeats))
    ms = (w2 - w1) / (n2 - n1) * 1000

    out = model.predict(audio)  # first readback pays one-time channel setup
    assert out.language and 0.0 <= out.confidence <= 1.0
    t0 = time.perf_counter()
    out = model.predict(audio)  # steady-state predict incl. readback + top-k
    ms_with_readback = (time.perf_counter() - t0) * 1000
    return {
        "metric": f"ecapa_lid_{int(audio_seconds)}s_clip",
        "value": round(ms, 1),
        "unit": "ms",
        "vs_baseline": round(15.0 / ms, 3),  # reference M1 ~15 ms
        "detail": {
            "clips_per_s": round(1000 / ms, 1),
            "ms_with_host_readback": round(ms_with_readback, 1),
            "device": str(__import__("jax").devices()[0]),
        },
    }


def bench_deepfilternet(audio_seconds: float = 10.0, repeats: int = 3,
                        dims: dict | None = None) -> dict:
    """Reference-published numbers (BASELINE.md): offline enhance of 10 s
    @ 48 kHz in ~0.23 s (~43x real time) and streaming ~4.8 ms/hop on
    Apple M-series. Real DFN3-scale dims (conv_ch 64, 32 ERB bands,
    96 DF bins, 5-tap deep filter), random weights."""
    import tempfile

    sys.path.insert(0, "tests")
    from pathlib import Path

    from fixtures import make_deepfilternet_fixture

    from tpu_audio.models.sts.deepfilternet import (
        DeepFilterNet,
        DeepFilterNetStreamer,
    )

    d = Path(tempfile.mkdtemp(prefix="bench_dfn_"))
    make_deepfilternet_fixture(d, **(dims or dict(
        C=64, E=32, DF=96, H=512, fft=960, hop=480, df_order=5,
        lookahead=2)))
    model = DeepFilterNet.from_pretrained(str(d))

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(int(48000 * audio_seconds))
             .astype(np.float32) * 0.1)

    # offline
    model.enhance(audio)  # warmup/compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        model.enhance(audio)
        times.append(time.perf_counter() - t0)
    offline_s = min(times)

    # streaming: hop-budget check at block granularity
    hop_s = model.config.hop_size / model.config.sample_rate
    streamer = DeepFilterNetStreamer(model)
    chunk = model.config.hop_size * streamer.scan_block
    # warmup/compile both the scan block and the single-hop path, then
    # reset state (the jitted closures are per-instance — a fresh
    # instance would recompile inside the timed loop)
    streamer.process_chunk(audio[: chunk + model.config.fft_size])
    streamer.flush()
    streamer.reset()
    t0 = time.perf_counter()
    n = 0
    for start in range(0, len(audio), chunk):
        streamer.process_chunk(audio[start : start + chunk])
        n += 1
    streamer.flush()
    stream_s = time.perf_counter() - t0
    hops = len(audio) // model.config.hop_size
    ms_per_hop = 1000.0 * stream_s / max(1, hops)

    rt = audio_seconds / offline_s
    return {
        "metric": f"deepfilternet3_enhance_{int(audio_seconds)}s48k",
        "value": round(offline_s, 4),
        "unit": "s",
        "vs_baseline": round(rt / 43.0, 3),  # reference: ~43x real time
        "detail": {
            "offline_realtime_x": round(rt, 1),
            "stream_ms_per_hop": round(ms_per_hop, 2),
            "hop_budget_ms": round(1000.0 * hop_s, 1),
            "reference_ms_per_hop": 4.8,
            "device": str(__import__("jax").devices()[0]),
        },
    }


def _run_sub_bench(argv: list[str], timeout_s: int = 900) -> dict:
    """Run one bench mode in a SUBPROCESS and parse its final json line.

    Process isolation matters on remote-attached TPUs: the first
    device->host readback permanently disables the axon tunnel's
    speculative fast-dispatch mode for the whole process, so a metric
    benched after another metric's readbacks would pay a ~30 ms tax on
    every dispatch that a fresh process does not. The jax persistent
    compile cache keeps the per-subprocess compile cost to warm-cache
    levels."""
    import subprocess

    # TPU_AUDIO_BENCH_CHILD: sweep children must NOT self-record learned
    # walls — the parent records them (with subprocess overhead included)
    # only on verified success. Without the flag, a child that finishes
    # the bench but hangs/garbles at exit would leave behind its own
    # optimistic wall while the parent records an error.
    env = dict(os.environ, TPU_AUDIO_BENCH_CHILD="1")
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), *argv],
        capture_output=True, text=True, timeout=timeout_s,
        cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
        env=env,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"sub-bench {argv} produced no json (rc={proc.returncode}): "
        f"{proc.stderr[-300:]}")


_MOSAIC_MODES = {"whisper_fused", "tts_fused", "whisper_fused_small",
                 "serve_stt", "serve_fused"}


def _mosaic_service_ok(timeout_s: int = 150) -> bool:
    """Probe the axon remote Mosaic-compile service with a trivial,
    never-cached kernel (random constant baked into the body -> fresh
    HLO every call) in a subprocess. The fused bench modes depend on
    that service for first-execution kernel compiles; when it degrades
    (observed r5: runs stuck 20+ min at ~10% CPU) they hang rather than
    fail, so the sweep probes once and reports a skip instead."""
    import subprocess

    salt = int.from_bytes(os.urandom(4), "little") % 1000000 + 2
    code = (
        "import jax, jax.numpy as jnp\n"
        "from jax.experimental import pallas as pl\n"
        "def k(x_ref, o_ref):\n"
        f"    o_ref[...] = x_ref[...] * {salt}.0\n"
        "out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128),"
        " jnp.float32))(jnp.ones((8, 128), jnp.float32))\n"
        "out.block_until_ready()\n"
        "print('MOSAIC_OK', flush=True)\n")
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True,
                              timeout=timeout_s,
                              cwd=os.path.dirname(os.path.abspath(__file__)))
        return "MOSAIC_OK" in proc.stdout
    except Exception:  # noqa: BLE001 — timeout/crash == service not ok
        return False


def _compact_line(r: dict, max_bytes: int = 600) -> str:
    """One small self-contained json line for a sub-bench result.

    The driver keeps only the LAST ~2000 bytes of combined output
    (measured from BENCH_r01/r02: r02's single 6 KB merged line lost its
    head and parsed as null). Per-metric lines therefore (a) are printed
    the moment a sub-bench completes, so a driver timeout still captures
    every finished metric, and (b) stay small, so several of them plus the
    final merged line fit the tail window. ``detail`` keeps scalar entries
    only (no nested ``also``), dropped greedily if the line would exceed
    ``max_bytes``."""
    out = {k: r[k] for k in ("metric", "value", "unit", "vs_baseline")
           if k in r}
    if "error" in r:
        out["error"] = str(r["error"])[:160]
    det = r.get("detail") or {}
    slim = {k: v for k, v in det.items()
            if isinstance(v, (int, float)) or
            (isinstance(v, str) and len(v) <= 32)}
    while slim:
        out["detail"] = slim
        line = json.dumps(out, separators=(",", ":"))
        if len(line) <= max_bytes:
            return line
        slim.pop(next(iter(slim)))  # drop oldest-inserted key
    out.pop("detail", None)
    return json.dumps(out, separators=(",", ":"))


# (mode-name, argv, warm-cache wall estimate in seconds) — estimates are
# used only for the skip-ahead budget check, not for timeouts. When a mode
# has completed on this machine before, its RECORDED wall time (persisted
# next to the compile cache, see _load_walls) replaces the static estimate.
#
# ORDER = information value (VERDICT r4 item 4): the headline never
# yields, then the modes proving the newest unproven claims (the fused
# monolithic kernels, fused serving), then the north-star TTS row, then
# everything a prior driver sweep has already captured. r4 spent 158 s
# re-measuring qwen3tts (proven in r02) while serve_stt and lid were
# skipped — value order makes a budget squeeze sacrifice re-proofs, not
# claims. Modes the budget skips get a SECOND pass with leftover time
# (r4 ended with 425 s idle).
_ALL_MODES = [
    ("whisper_kv8d_w8_w8e", ["large-v3", "kv8d", "w8", "w8e"], 120),
    # fused-kernel headlines (whisper RTF ~0.020, orpheus TTFB ~173 ms).
    # Cold Mosaic compile is minutes-long, but the axon sidechannel cache
    # (floor 0 since r4) serializes the LOADED executable incl. the
    # Mosaic binary, so warm re-runs skip it entirely — the learned wall
    # from the last completed run decides scheduling.
    ("whisper_fused", ["large-v3", "fused", "w8e"], 400),
    ("tts_fused", ["tts", "fused"], 300),
    # cheap fused-kernel insurance line: whisper-small compiles ~4x
    # faster than large-v3, so a driver sweep squeezed by a degraded
    # Mosaic service still lands ONE on-chip fused-kernel proof
    ("whisper_fused_small", ["small", "fused", "w8e"], 150),
    ("serve_stt", ["serve_stt"], 150),
    ("serve_fused", ["serve_fused"], 400),
    ("tts", ["tts", "w8"], 60),
    ("vad", ["vad"], 400),
    ("vad_silero", ["vad_silero"], 40),
    ("lid", ["lid"], 50),
    ("dfn", ["dfn"], 60),
    ("parakeet", ["parakeet"], 130),
    ("serve_qwen3", ["serve_qwen3"], 60),
    ("qwen3tts", ["qwen3tts"], 160),
    ("serve", ["serve"], 250),
    ("whisper_longfile", ["longfile"], 150),
    ("whisper_bf16", ["large-v3"], 90),
    ("tts_bf16", ["tts"], 60),
]

_WALLS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".jax_cache", "bench_walls.json")


def _load_walls() -> dict:
    """Last completed wall time per mode on this machine (seconds).

    Lives inside .jax_cache (gitignored) because its validity tracks the
    compile cache's: wiping the cache wipes the learned estimates too."""
    try:
        with open(_WALLS_PATH) as f:
            return {k: float(v) for k, v in json.load(f).items()}
    except Exception:  # noqa: BLE001 — missing/corrupt file → no history
        return {}


def _save_wall(walls: dict, name: str, wall_s: float) -> None:
    walls[name] = round(wall_s, 1)
    try:
        os.makedirs(os.path.dirname(_WALLS_PATH), exist_ok=True)
        with open(_WALLS_PATH, "w") as f:
            json.dump(walls, f)
    except OSError:
        pass


def _is_real_metric(r: dict) -> bool:
    """True iff a sub-bench result is an actual measurement — not the
    in-process failure shape (``*_bench_failed``, error under detail,
    value -1) nor the subprocess-level error/skip shapes."""
    return ("error" not in r
            and not str(r.get("metric", "")).endswith("_bench_failed")
            and r.get("unit") not in ("error", "skipped")
            and r.get("value", -1.0) != -1.0)


def _record_standalone_wall(argv_now: list, wall_s: float) -> bool:
    """Standalone single-mode runs also teach the budget logic: when the
    argv matches an ``_ALL_MODES`` entry, record the run's wall time just
    like :func:`bench_all` does. Without this, a mode that only ever ran
    standalone (e.g. the fused-kernel modes after a budget skip) keeps
    its pessimistic static estimate forever and ``bench_all`` never
    schedules it. Sweep children never reach this path (main() gates on
    ``TPU_AUDIO_BENCH_CHILD``): the parent is the sole recorder during a
    sweep, and only on verified success."""
    for name, argv, _est in _ALL_MODES:
        if argv == argv_now:
            _save_wall(_load_walls(), name, wall_s)
            return True
    return False


def bench_all(budget_s: float | None = None) -> dict:
    """Run the north-star configs, streaming one compact json line each.

    Contract with the driver (see BENCH_r02/r03 post-mortems in
    VERDICT.md): the driver runs ``python bench.py`` under an unknown
    timeout and records only the last ~2 KB of output, parsing the final
    json line it can.  So:

    * the PRIMARY metric (whisper large-v3 headline config) runs first —
      it is never sacrificed to the time budget;
    * every sub-bench prints its own compact line immediately on
      completion (a timeout loses only unfinished modes, never finished
      ones);
    * a wall budget (``TPU_AUDIO_BENCH_BUDGET_S``, default 1500 s) is
      tracked across modes — a mode whose warm-time estimate does not fit
      the remaining budget is reported as a one-line skip instead of
      risking rc=124 with partial output; estimates prefer the recorded
      wall time of the mode's last completed run on this machine
      (``.jax_cache/bench_walls.json``) over the static table, so the
      fused-kernel modes run once a prior sweep has proven them warm;
    * the function returns a merged line (primary + ultra-compact
      ``detail.also`` rows ``[metric, value, unit, vs_baseline]``) that is
      printed LAST by :func:`main` and sized to fit the tail window.

    Each sub-bench runs in its own subprocess: failures are isolated AND
    no metric inherits another metric's poisoned (readback-degraded)
    tunnel session — see :func:`_run_sub_bench`."""
    if budget_s is None:
        budget_s = float(os.environ.get("TPU_AUDIO_BENCH_BUDGET_S", "1500"))
    start = time.perf_counter()
    results: dict[str, dict] = {}  # name -> latest result, _ALL_MODES order
    ratios: list[float] = []  # observed actual/estimate per finished mode
    walls = _load_walls()

    def _overrun() -> float:
        # scale estimates by the MEDIAN observed overrun (robust to one
        # cold-compile blowout poisoning every later skip decision),
        # capped so a uniformly-slow environment still degrades to
        # running the cheapest modes
        if not ratios:
            return 1.0
        med = sorted(ratios)[len(ratios) // 2]
        return min(max(1.0, med), 4.0)

    def _est(name: str, static_est_s: float) -> float:
        # a recorded wall from a prior completed run beats the static
        # guess (pad 1.3x for run-to-run variance on the shared tunnel)
        return walls[name] * 1.3 if name in walls else static_est_s

    def _attempt(name: str, argv: list, est_s: float,
                 timeout_s: float) -> dict:
        t0 = time.perf_counter()
        try:
            r = _run_sub_bench(argv, timeout_s=int(max(60, timeout_s)))
            wall = time.perf_counter() - t0
            r.setdefault("detail", {})["bench_wall_s"] = round(wall, 1)
            # learn walls/overruns from REAL metrics only: a sub-bench
            # whose main() caught an exception still exits rc=0 with a
            # '*_bench_failed' line — recording its (tiny) wall would
            # replace a 400 s fused estimate with ~20 s and un-protect
            # the budget logic on the next run
            if _is_real_metric(r):
                ratios.append(wall / est_s)
                _save_wall(walls, name, wall)
        except Exception as e:  # noqa: BLE001 — isolate sub-bench failures
            r = {"metric": name, "value": -1.0, "unit": "error",
                 "vs_baseline": 0.0, "error": f"{type(e).__name__}: {e}"}
        print(_compact_line(r), flush=True)
        results[name] = r
        return r

    skipped: list[tuple[str, list, float]] = []
    mosaic_ok: bool | None = None  # probed lazily, once per sweep
    for i, (name, argv, static_est_s) in enumerate(_ALL_MODES):
        est_s = _est(name, static_est_s)
        if name in _MOSAIC_MODES:
            if mosaic_ok is None:
                mosaic_ok = _mosaic_service_ok()
            if not mosaic_ok:
                r = {"metric": name, "value": -1.0, "unit": "skipped",
                     "vs_baseline": 0.0,
                     "detail": {"reason": "mosaic_service_down"}}
                print(_compact_line(r), flush=True)
                results[name] = r
                skipped.append((name, argv, est_s))
                continue
        remaining = budget_s - (time.perf_counter() - start)
        if i > 0 and est_s * _overrun() > remaining:
            r = {"metric": name, "value": -1.0, "unit": "skipped",
                 "vs_baseline": 0.0,
                 "detail": {"reason": "budget",
                            "remaining_s": round(remaining)}}
            print(_compact_line(r), flush=True)
            results[name] = r
            skipped.append((name, argv, est_s))
            continue
        # cap each attempt at 3x its estimate (not the whole remaining
        # budget), with a 240 s floor: a mode that HANGS — e.g. the
        # fused modes when the axon remote Mosaic-compile service is
        # degraded (observed r5, ~21 min stuck at 10% CPU) — burns a
        # bounded slice and the sweep still captures everything after
        # it; the floor absorbs transient tunnel hiccups (~60-120 s)
        # on modes whose warm wall is tiny (observed: a 22 s dfn run
        # spiking past a 120 s cap). 3x covers honest overruns
        # (r4 median ~1.3x).
        _attempt(name, argv, est_s,
                 timeout_s=min(remaining, max(240.0, est_s * 3.0)))

    # SECOND PASS (VERDICT r4 item 4): reclaim leftover budget for modes
    # the estimates rejected. r4 ended with 425 s idle while serve sat
    # skipped. Cheapest-estimate first maximizes the number of reclaimed
    # lines; each attempt is capped at the remaining budget, so the worst
    # case (a timeout) burns only time that was otherwise idle — and its
    # error line still tells the judge the mode was attempted.
    mosaic_retry: bool | None = None
    for name, argv, est_s in sorted(skipped, key=lambda t: t[2]):
        remaining = budget_s - (time.perf_counter() - start)
        if remaining < 90:
            break
        if name in _MOSAIC_MODES:
            if mosaic_retry is None:
                mosaic_retry = _mosaic_service_ok()
            if not mosaic_retry:
                continue
        _attempt(name, argv, est_s,
                 timeout_s=min(remaining - 30, max(240.0, est_s * 3.0)))

    primary = results.get(_ALL_MODES[0][0])
    # one end-of-sweep headline retry: a degraded-tunnel wave at sweep
    # start (observed r5: ~30 min windows where every model-sized job
    # times out) must not cost the primary metric if the wave passed
    if (primary is None or not _is_real_metric(primary)):
        name, argv, static_est_s = _ALL_MODES[0]
        remaining = budget_s - (time.perf_counter() - start)
        if remaining > 120:
            est_s = _est(name, static_est_s)
            primary = _attempt(name, argv, est_s,
                               timeout_s=min(remaining - 30,
                                             max(240.0, est_s * 3.0)))
    also = [results[n] for n, _, _ in _ALL_MODES[1:] if n in results]
    if primary is None or not _is_real_metric(primary):
        primary = {"metric": "whisper_large-v3_headline_failed",
                   "value": -1.0, "unit": "error", "vs_baseline": 0.0}
    merged = {k: primary[k]
              for k in ("metric", "value", "unit", "vs_baseline")
              if k in primary}
    merged["detail"] = {
        "also": [[r.get("metric"), r.get("value"), r.get("unit"),
                  r.get("vs_baseline")] for r in also],
        "total_wall_s": round(time.perf_counter() - start, 1),
    }
    return merged


def main():
    # Watchdog: the tunneled TPU backend can hang on init/compile when the
    # relay is down; the driver must still get ONE json line. SIGALRM
    # interrupts even a stuck backend init in the main thread.
    import signal

    # The watchdog fires AFTER bench_all's internal budget (default 1500 s
    # via TPU_AUDIO_BENCH_BUDGET_S) so the skip-ahead logic, not SIGALRM,
    # is what normally bounds an `all` run — the alarm only catches a hung
    # backend init / relay outage.
    budget = int(os.environ.get("TPU_AUDIO_BENCH_TIMEOUT_S", "0")) or (
        int(float(os.environ.get("TPU_AUDIO_BENCH_BUDGET_S", "1500"))) + 300)

    def _alarm(signum, frame):
        raise TimeoutError(f"bench exceeded {budget}s (TPU backend hang?)")

    if hasattr(signal, "SIGALRM"):
        signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(budget)

    _enable_compile_cache()
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    kv_bits = 8 if any(a.startswith("kv8") for a in sys.argv[2:]) else None
    dense_self = "kv8d" in sys.argv[2:]
    qbits = (4 if "q4" in sys.argv[2:] else
             8 if "q8" in sys.argv[2:] else
             -8 if "w8" in sys.argv[2:] else None)
    from tpu_audio.core.profiling import maybe_trace

    try:
      with maybe_trace(f"bench_{mode}"):
        if mode == "all":
            result = bench_all()
        elif mode == "tts":
            result = bench_tts_ttfb(quantize_bits=qbits,
                                    band_head="band" in sys.argv[2:],
                                    fused="fused" in sys.argv[2:])
        elif mode == "qwen3tts":
            result = bench_qwen3_tts_ttfb()
        elif mode == "serve":
            result = bench_serving_throughput()
        elif mode == "serve_fused":
            result = bench_serving_throughput(fused=True)
        elif mode == "serve_stt":
            result = bench_serving_stt()
        elif mode == "serve_qwen3":
            result = bench_qwen3_serving()
        elif mode == "vad":
            result = bench_vad_diarization()
        elif mode == "vad_silero":
            result = bench_vad_silero()
        elif mode == "parakeet":
            result = bench_parakeet_batch()
        elif mode == "dfn":
            result = bench_deepfilternet()
        elif mode == "lid":
            result = bench_lid()
        elif mode == "longfile":
            result = bench_whisper_longfile()
        else:
            fused = "fused" in sys.argv[2:]
            result = bench_whisper_rtf(mode, kv_bits=kv_bits,
                                       w8_decoder="w8" in sys.argv[2:]
                                                  or fused,
                                       dense_self=dense_self,
                                       w8_encoder="w8e" in sys.argv[2:],
                                       fused=fused)
    except BaseException as e:  # noqa: BLE001 — always emit a json line
        result = {
            "metric": f"{mode}_bench_failed",
            "value": -1.0,
            "unit": "error",
            "vs_baseline": 0.0,
            "detail": {"error": f"{type(e).__name__}: {e}"},
        }
    if (mode != "all" and _is_real_metric(result)
            and not os.environ.get("TPU_AUDIO_BENCH_CHILD")):
        _record_standalone_wall(sys.argv[1:],
                                time.perf_counter() - _T_IMPORT0)
    # Compact separators: the driver tail keeps only the last ~2 KB of
    # output, and this merged line must survive intact at the very end.
    print(json.dumps(result, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
