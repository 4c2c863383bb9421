"""KV cache tests: fixed-buffer semantics, left-pad masking, int8
quantized storage accuracy, and whisper decode parity with kv_bits=8."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.core import kv_cache

from fixtures import FakeWhisperTokenizer, make_whisper_fixture


def test_update_and_mask():
    cache = kv_cache.init_cache(2, 1, 2, 4, 8, jnp.float32)
    k = jnp.ones((1, 2, 3, 4))
    cache, k_full, v_full = kv_cache.update_cache(cache, 0, k, k * 2)
    assert k_full.shape == (1, 2, 8, 4)
    assert float(k_full[0, 0, 2, 0]) == 1.0 and float(k_full[0, 0, 3, 0]) == 0
    cache = cache._replace(offset=cache.offset + 3)
    mask = kv_cache.attention_mask(cache, 1)
    assert mask.shape == (1, 1, 1, 8)
    np.testing.assert_array_equal(
        np.asarray(mask[0, 0, 0]),
        [True, True, True, True, False, False, False, False])


def test_valid_from_masks_left_pad():
    cache = kv_cache.init_cache(1, 1, 1, 4, 8, jnp.float32, valid_from=2)
    cache = cache._replace(offset=jnp.int32(4))
    mask = np.asarray(kv_cache.attention_mask(cache, 1))[0, 0, 0]
    assert not mask[0] and not mask[1] and mask[2] and mask[4]


def test_quant_cache_roundtrip():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((1, 2, 5, 64)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, 5, 64)).astype(np.float32))
    cache = kv_cache.init_quant_cache(1, 1, 2, 64, 16, group_size=32)
    assert cache.group_size == 32
    cache, k_full, v_full = kv_cache.update_cache(cache, 0, k, v)
    # int8 per-group affine: ~1% relative error on gaussian data
    err = np.abs(np.asarray(k_full[:, :, :5]) - np.asarray(k))
    assert err.max() < np.abs(np.asarray(k)).max() * 0.02
    err_v = np.abs(np.asarray(v_full[:, :, :5]) - np.asarray(v))
    assert err_v.max() < np.abs(np.asarray(v)).max() * 0.02
    assert k_full.dtype == k.dtype
    # attention_mask works on the quantized cache too
    cache = cache._replace(offset=cache.offset + 5)
    assert kv_cache.attention_mask(cache, 1).shape == (1, 1, 1, 16)


def test_quant_cache_storage_halves_bytes():
    full = kv_cache.init_cache(2, 1, 4, 64, 128, jnp.bfloat16)
    quant = kv_cache.init_quant_cache(2, 1, 4, 64, 128, group_size=64)
    full_bytes = full.k.nbytes + full.v.nbytes
    quant_bytes = (quant.k_q.nbytes + quant.v_q.nbytes
                   + quant.k_scale.nbytes + quant.v_scale.nbytes)
    assert quant_bytes < full_bytes * 0.6  # int8 + small scales vs bf16


def test_whisper_kv_bits_parity(tmp_path):
    """int8 KV cache gives the same greedy transcript on the tiny model."""
    from tpu_audio.core.generation import STTGenerateParameters
    from tpu_audio.models.stt import load_model

    d = make_whisper_fixture(tmp_path / "w")
    model = load_model(str(d))
    model.tokenizer = FakeWhisperTokenizer(vocab=model.config.vocab_size)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    base = model.generate(audio, STTGenerateParameters(max_tokens=12))
    quant = model.generate(audio, STTGenerateParameters(max_tokens=12,
                                                        kv_bits=8))
    assert quant.text == base.text


def test_quant4_pack_roundtrip():
    """Packed int4 affine codes reconstruct within the 4-bit step size."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 2, 3, 64)).astype(np.float32))
    q, s, b = kv_cache._quantize(x, n_groups=2, bits=4)
    assert q.dtype == jnp.uint8 and q.shape == (1, 2, 3, 32)
    back = np.asarray(kv_cache._dequantize(q, s, b, jnp.float32))
    # max error is half a quantization step: step = range/15
    grouped = np.asarray(x).reshape(1, 2, 3, 2, 32)
    step = (grouped.max(-1) - grouped.min(-1)) / 15.0
    assert np.abs(back - np.asarray(x)).max() <= step.max() * 0.51 + 1e-6


def test_quant4_cache_roundtrip_and_bytes():
    rng = np.random.default_rng(2)
    k = jnp.asarray(rng.standard_normal((1, 2, 5, 64)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, 5, 64)).astype(np.float32))
    cache = kv_cache.init_quant_cache(1, 1, 2, 64, 16, group_size=32, bits=4)
    assert cache.bits == 4 and cache.group_size == 32
    cache, k_full, v_full = kv_cache.update_cache(cache, 0, k, v)
    err = np.abs(np.asarray(k_full[:, :, :5]) - np.asarray(k))
    # 4-bit affine: coarser than int8 but bounded
    assert err.max() < np.abs(np.asarray(k)).max() * 0.12
    # packed codes take half the bytes of int8 codes
    c8 = kv_cache.init_quant_cache(1, 1, 2, 64, 16, group_size=32, bits=8)
    assert cache.k_q.nbytes == c8.k_q.nbytes // 2


def test_hybrid_cache_dense_prefix_exact():
    """Positions below the split are stored bit-exact; beyond quantized."""
    rng = np.random.default_rng(3)
    cache = kv_cache.init_hybrid_cache(1, 1, 2, 64, 16, split=4,
                                       group_size=32, dtype=jnp.float32)
    ks, vs = [], []
    for t in range(8):
        k = jnp.asarray(rng.standard_normal((1, 2, 1, 64)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((1, 2, 1, 64)).astype(np.float32))
        ks.append(np.asarray(k)[0, :, 0])
        vs.append(np.asarray(v)[0, :, 0])
        cache, k_full, v_full = kv_cache.update_cache(cache, 0, k, v)
        cache = cache._replace(offset=cache.offset + 1)
    assert k_full.shape == (1, 2, 16, 64)
    got = np.asarray(k_full)[0]
    for t in range(4):  # dense prefix: exact
        np.testing.assert_array_equal(got[:, t], ks[t])
    for t in range(4, 8):  # quantized tail: close
        err = np.abs(got[:, t] - ks[t]).max()
        assert 0 < err < np.abs(ks[t]).max() * 0.02
    assert kv_cache.attention_mask(cache, 1).shape == (1, 1, 1, 16)


def test_make_cache_for_dispatch():
    c = kv_cache.make_cache_for(1, 1, 2, 64, 16)
    assert isinstance(c, kv_cache.KVCache)
    c = kv_cache.make_cache_for(1, 1, 2, 64, 16, kv_bits=8)
    assert isinstance(c, kv_cache.QuantKVCache) and c.bits == 8
    c = kv_cache.make_cache_for(1, 1, 2, 64, 16, kv_bits=4,
                                quantized_kv_start=4)
    assert isinstance(c, kv_cache.HybridKVCache) and c.bits == 4
    assert c.split == 4 and c.max_len == 16
    # start >= capacity degenerates to a dense cache
    c = kv_cache.make_cache_for(1, 1, 2, 64, 16, kv_bits=8,
                                quantized_kv_start=16)
    assert isinstance(c, kv_cache.KVCache)
    with pytest.raises(ValueError, match="kv_bits"):
        kv_cache.make_cache_for(1, 1, 2, 64, 16, kv_bits=3)


def test_unsupported_kv_bits_raises():
    from tpu_audio.core.generation import STTGenerateParameters

    with pytest.raises(ValueError, match="kv_bits"):
        STTGenerateParameters(kv_bits=2)


def test_whisper_kv4_and_hybrid_parity(tmp_path):
    """4-bit and hybrid KV caches give the same greedy transcript on the
    tiny model (per-bit-width parity, VERDICT r1 item 6)."""
    from tpu_audio.core.generation import STTGenerateParameters
    from tpu_audio.models.stt import load_model

    d = make_whisper_fixture(tmp_path / "w")
    model = load_model(str(d))
    model.tokenizer = FakeWhisperTokenizer(vocab=model.config.vocab_size)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    base = model.generate(audio, STTGenerateParameters(max_tokens=12))
    q4 = model.generate(audio, STTGenerateParameters(max_tokens=12,
                                                     kv_bits=4))
    assert q4.text == base.text
    hybrid = model.generate(audio, STTGenerateParameters(
        max_tokens=12, kv_bits=8, quantized_kv_start=6))
    assert hybrid.text == base.text


def test_llama_forward_quant_cache_bitwidths():
    """llama scan path runs with int8, int4, and hybrid caches and stays
    close to the dense-cache logits."""
    from tpu_audio.models import llama

    cfg = llama.LlamaConfig(
        vocab_size=64, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
        max_position_embeddings=64)
    params = llama.init_random_params(cfg, seed=0, dtype=jnp.float32)
    toks = jnp.asarray([[1, 2, 3, 4]], jnp.int32)

    def run(cache):
        logits, cache = llama.forward(params, toks, cache, cfg)
        outs = [np.asarray(logits[:, -1], np.float32)]
        cache = cache._replace(offset=cache.offset + 0)  # already advanced
        last = jnp.asarray([[5]], jnp.int32)
        for _ in range(3):
            logits, cache = llama.forward(params, last, cache, cfg)
            outs.append(np.asarray(logits[:, -1], np.float32))
        return np.stack(outs)

    ref = run(llama.make_cache(cfg, 1, 12, jnp.float32))
    for kwargs in (dict(kv_bits=8), dict(kv_bits=4),
                   dict(kv_bits=8, quantized_kv_start=4)):
        got = run(llama.make_cache(cfg, 1, 12, jnp.float32, **kwargs))
        denom = np.abs(ref).max() + 1e-9
        tol = 0.06 if kwargs.get("kv_bits") == 4 else 0.02
        assert np.abs(got - ref).max() / denom < tol, kwargs
        np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


def test_hybrid_prefill_longer_than_quant_tail():
    """A multi-token prefill into the dense prefix must not trace the quant
    branch (whose tail can be SHORTER than the prefill) — the code-review
    failure case: quantized_kv_start small, long prompt, short max_tokens."""
    from tpu_audio.models import llama

    cfg = llama.LlamaConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, num_key_value_heads=4, intermediate_size=64,
        max_position_embeddings=128)
    params = llama.init_random_params(cfg, seed=0, dtype=jnp.float32)
    prefill_len = 20
    max_new = 4
    # split rounded up to the prefill (call-site contract): quant tail is
    # only max_new + 1 positions — shorter than the prefill write
    cache = llama.make_cache(cfg, 1, prefill_len + max_new + 1, jnp.float32,
                             kv_bits=8, quantized_kv_start=prefill_len)
    toks = jnp.asarray([list(range(1, prefill_len + 1))], jnp.int32)
    logits, cache = jax.jit(
        lambda p, t, c: llama.forward(p, t, c, cfg))(params, toks, cache)
    assert np.isfinite(np.asarray(logits, np.float32)).all()
    # decode steps continue into the quant tail
    last = toks[:, -1:]
    for _ in range(3):
        logits, cache = llama.forward(params, last, cache, cfg)
        last = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    # an unsatisfiable prefill (longer than the dense prefix) raises clearly
    bad = kv_cache.init_hybrid_cache(1, 1, 4, 8, 64, split=4)
    with pytest.raises(ValueError, match="dense prefix"):
        kv_cache.update_cache(bad, 0, jnp.zeros((1, 4, 10, 8)),
                              jnp.zeros((1, 4, 10, 8)))


def test_whisper_kv8_pallas_kernel_parity(tmp_path, monkeypatch):
    """kv_bits=8 routed through the fused Pallas dequant+attention kernel
    (interpret mode on CPU) gives the same greedy transcript as the dense
    decode — the integration path `_decode_loop -> decoder_step(cross_mode=
    "pallas")` that runs compiled on TPU."""
    from tpu_audio.core.generation import STTGenerateParameters
    from tpu_audio.models.stt import load_model

    monkeypatch.setenv("TPU_AUDIO_PALLAS_KV", "interpret")
    # head_dim must be >= 32 for the kernel's int8 tiling gate
    d = make_whisper_fixture(tmp_path / "w", d_model=64, heads=2)
    model = load_model(str(d))
    model.tokenizer = FakeWhisperTokenizer(vocab=model.config.vocab_size)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    base = model.generate(audio, STTGenerateParameters(max_tokens=12))
    quant = model.generate(audio, STTGenerateParameters(max_tokens=12,
                                                        kv_bits=8))
    assert quant.text == base.text
