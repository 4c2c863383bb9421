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
