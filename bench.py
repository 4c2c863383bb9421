"""Benchmark: Whisper-large-v3 STT real-time factor on one TPU chip.

Baseline (BASELINE.md north star): RTF <= 0.05 for whisper-large-v3 on a
single v5e chip. This harness runs the real model graph (large-v3 dims,
random weights — weights don't change FLOPs or memory traffic) end-to-end:
log-mel frontend + encoder + 224-token KV-cached decode of a 30 s window,
the shape of a realistic dense transcription workload.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def bench_whisper_rtf(size: str = "large-v3", decode_tokens: int = 224,
                      repeats: int = 3) -> dict:
    import jax
    import jax.numpy as jnp

    from tpu_audio.core import dsp
    from tpu_audio.models.stt import whisper as W

    sizes = {
        "tiny": dict(d_model=384, layers=4, heads=6, ffn=1536, n_mels=80),
        "base": dict(d_model=512, layers=6, heads=8, ffn=2048, n_mels=80),
        "small": dict(d_model=768, layers=12, heads=12, ffn=3072, n_mels=80),
        "medium": dict(d_model=1024, layers=24, heads=16, ffn=4096, n_mels=80),
        "large-v3": dict(d_model=1280, layers=32, heads=20, ffn=5120, n_mels=128),
    }
    s = sizes[size]
    cfg = W.WhisperConfig(
        num_mel_bins=s["n_mels"], d_model=s["d_model"],
        encoder_layers=s["layers"], encoder_attention_heads=s["heads"],
        encoder_ffn_dim=s["ffn"], decoder_layers=s["layers"],
        decoder_attention_heads=s["heads"], decoder_ffn_dim=s["ffn"],
        vocab_size=51866, max_target_positions=448,
    )
    model = W.Whisper(cfg, W.init_params(cfg, seed=0, dtype=jnp.bfloat16),
                      dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    audio = rng.standard_normal(W.CHUNK_LENGTH_SAMPLES).astype(np.float32) * 0.1

    suppress = np.zeros((cfg.vocab_size,), np.float32)
    begin = np.zeros((cfg.vocab_size,), np.float32)
    prompt = [50258, 50259, 50360, 50364]
    prompt_buf = np.zeros((cfg.max_target_positions,), np.int32)
    prompt_buf[: len(prompt)] = prompt
    max_total = len(prompt) + decode_tokens
    key = jax.random.PRNGKey(0)

    def run_once():
        feats = model.encoder_features(audio)
        enc_out = model._encode(model.params, feats)
        tokens, count = model._decode_loop(
            model.params, enc_out,
            jnp.asarray(prompt_buf), jnp.int32(len(prompt)),
            jnp.int32(-1),  # unmatched EOT -> full-length decode
            jnp.asarray(suppress), jnp.asarray(begin),
            jnp.float32(0.0), key, max_total=max_total,
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
        "metric": f"whisper_{size}_rtf_30s_{decode_tokens}tok",
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


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
    result = bench_whisper_rtf(size)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
