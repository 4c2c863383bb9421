"""Tests for quantization, KV cache, sampling and the loading path."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.core import kv_cache, loading, nn, quant, sampling
from tpu_audio.core.hub import load_config, resolve_model_type


# ---------------------------------------------------------------------------
# quant
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bits,group_size", [(4, 64), (8, 64), (4, 32), (8, 32)])
def test_quant_roundtrip(bits, group_size):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((32, 128)).astype(np.float32)
    packed, scales, biases = quant.quantize(w, group_size=group_size, bits=bits)
    assert packed.dtype == np.uint32
    assert packed.shape == (32, 128 * bits // 32)
    assert scales.shape == (32, 128 // group_size)
    deq = np.asarray(quant.dequantize(jnp.asarray(packed), jnp.asarray(scales),
                                      jnp.asarray(biases), group_size, bits))
    # max error is half a quantization level per group
    max_lvl = (w.reshape(32, -1, group_size).max(-1) - w.reshape(32, -1, group_size).min(-1)) / (2**bits - 1)
    err = np.abs(deq - w).reshape(32, -1, group_size).max(-1)
    assert np.all(err <= max_lvl * 0.51 + 1e-6)


def test_quantized_linear_close_to_dense():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 128)).astype(np.float32) * 0.1
    x = rng.standard_normal((2, 3, 128)).astype(np.float32)
    packed, scales, biases = quant.quantize(w, 64, 8)
    p = quant.tag_quantized({"weight": jnp.asarray(packed),
                             "scales": jnp.asarray(scales),
                             "biases": jnp.asarray(biases)}, 64, 8)
    assert isinstance(p["weight"], quant.QuantizedTensor)
    # QuantizedTensor must survive jit with static metadata
    got = np.asarray(jax.jit(nn.linear)(p, jnp.asarray(x)))
    want = x @ w.T
    assert np.abs(got - want).max() < 0.05
    # 8-bit quantized matmul should be within ~1% mean relative error
    assert np.abs(got - want).mean() / np.abs(want).mean() < 0.01


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


def test_kv_cache_prefill_then_decode_matches_full_attention():
    rng = np.random.default_rng(2)
    b, h, d, s_max = 1, 2, 8, 16
    q_all = jnp.asarray(rng.standard_normal((b, h, 10, d)).astype(np.float32))
    k_all = jnp.asarray(rng.standard_normal((b, h, 10, d)).astype(np.float32))
    v_all = jnp.asarray(rng.standard_normal((b, h, 10, d)).astype(np.float32))

    # ground truth: full causal attention
    want = np.asarray(nn.sdpa(q_all, k_all, v_all, is_causal=True))

    cache = kv_cache.init_cache(1, b, h, d, s_max, dtype=jnp.float32)
    # prefill 6
    cache, k, v = kv_cache.update_cache(cache, 0, k_all[:, :, :6], v_all[:, :, :6])
    mask = kv_cache.attention_mask(cache, 6)
    out_prefill = nn.sdpa(q_all[:, :, :6], k, v, mask=mask)
    cache = cache._replace(offset=cache.offset + 6)
    np.testing.assert_allclose(np.asarray(out_prefill), want[:, :, :6], atol=1e-5)

    # decode 4 single steps
    for t in range(6, 10):
        cache, k, v = kv_cache.update_cache(cache, 0, k_all[:, :, t : t + 1],
                                            v_all[:, :, t : t + 1])
        mask = kv_cache.attention_mask(cache, 1)
        out = nn.sdpa(q_all[:, :, t : t + 1], k, v, mask=mask)
        cache = cache._replace(offset=cache.offset + 1)
        np.testing.assert_allclose(np.asarray(out)[:, :, 0], want[:, :, t], atol=1e-5)


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def test_greedy_sampling():
    logits = jnp.asarray([[0.1, 5.0, 0.2, 0.3]])
    t = sampling.sample_token(jax.random.PRNGKey(0), logits,
                              sampling.SamplingParams(temperature=0.0))
    assert int(t[0]) == 1


def test_top_k_restricts_support():
    logits = jnp.asarray([[1.0, 2.0, 3.0, 4.0, 5.0]])
    params = sampling.SamplingParams(temperature=1.0, top_k=2)
    for seed in range(20):
        t = sampling.sample_token(jax.random.PRNGKey(seed), logits, params)
        assert int(t[0]) in (3, 4)


def test_top_p_keeps_argmax_and_restricts():
    logits = jnp.asarray([[10.0, 1.0, 0.5, 0.1, -3.0]])
    params = sampling.SamplingParams(temperature=1.0, top_p=0.5)
    for seed in range(20):
        t = sampling.sample_token(jax.random.PRNGKey(seed), logits, params)
        assert int(t[0]) == 0  # argmax has p>0.99, nucleus is {0}


def test_top_p_multiple_tokens():
    # three tokens with p ~ [0.5, 0.3, 0.2]; top_p=0.7 keeps first two
    probs = np.array([0.5, 0.3, 0.2])
    logits = jnp.asarray([np.log(probs)])
    params = sampling.SamplingParams(temperature=1.0, top_p=0.7)
    seen = {int(sampling.sample_token(jax.random.PRNGKey(s), logits, params)[0])
            for s in range(50)}
    assert seen == {0, 1}


def test_repetition_penalty():
    logits = jnp.asarray([[2.0, 2.0, -1.0]])
    hist = jnp.asarray([[0, 0]], dtype=jnp.int32)
    mask = jnp.asarray([[True, True]])
    out = sampling.apply_repetition_penalty(logits, hist, mask, 2.0)
    np.testing.assert_allclose(np.asarray(out), [[1.0, 2.0, -1.0]])
    # negative logits get multiplied
    hist2 = jnp.asarray([[2, 2]], dtype=jnp.int32)
    out2 = sampling.apply_repetition_penalty(logits, hist2, mask, 2.0)
    np.testing.assert_allclose(np.asarray(out2), [[2.0, 2.0, -2.0]])


# ---------------------------------------------------------------------------
# loading + hub
# ---------------------------------------------------------------------------


def test_load_params_fixture(tmp_path):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(3)
    flat = {
        "encoder.layers.0.w": rng.standard_normal((4, 4)).astype(np.float32),
        "encoder.layers.1.w": rng.standard_normal((4, 4)).astype(np.float32),
        "head.weight": rng.standard_normal((8, 4)).astype(np.float32),
    }
    save_file(flat, str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({"model_type": "whisper"}))

    def sanitize(d):
        return {k.replace("head.", "decoder.head."): v for k, v in d.items()}

    params = loading.load_params(tmp_path, sanitize=sanitize,
                                 dtype=jnp.bfloat16,
                                 expected_prefixes=("encoder", "decoder"))
    assert params["encoder"]["layers"]["0"]["w"].dtype == jnp.bfloat16
    assert params["decoder"]["head"]["weight"].shape == (8, 4)

    cfg = load_config(tmp_path)
    assert resolve_model_type(cfg) == "whisper"


def test_load_params_sharded(tmp_path):
    from safetensors.numpy import save_file

    a = {"a.w": np.ones((2, 2), np.float32)}
    b = {"b.w": np.zeros((3,), np.float32)}
    save_file(a, str(tmp_path / "model-00001-of-00002.safetensors"))
    save_file(b, str(tmp_path / "model-00002-of-00002.safetensors"))
    (tmp_path / "model.safetensors.index.json").write_text(json.dumps({
        "weight_map": {"a.w": "model-00001-of-00002.safetensors",
                       "b.w": "model-00002-of-00002.safetensors"}}))
    params = loading.load_params(tmp_path)
    assert set(params) == {"a", "b"}


def test_verify_params_rejects_missing_group(tmp_path):
    with pytest.raises(KeyError):
        loading.verify_params({"a": {"w": np.ones(1)}}, expected_prefixes=("decoder",))


def test_resolve_model_type_fallbacks():
    assert resolve_model_type({"model_type": "Whisper"}) == "whisper"
    assert resolve_model_type({"architectures": ["LlamaForCausalLM"]}) == "llamaforcausallm"
    assert resolve_model_type({"model_version": "v2"}) == "v2"
    assert resolve_model_type({}) is None


def test_dequantize_tree_expands_leaves():
    import jax.numpy as jnp
    import numpy as np

    from tpu_audio.core import quant

    rng = np.random.default_rng(0)
    w = rng.standard_normal((32, 128)).astype(np.float32)
    packed, scales, biases = quant.quantize(w, 64, 4)
    tree = {"layer": {"weight": quant.QuantizedTensor(
        jnp.asarray(packed), jnp.asarray(scales), jnp.asarray(biases),
        group_size=64, bits=4), "bias": jnp.zeros(32)}}
    dense = quant.dequantize_tree(tree, jnp.float32)
    assert dense["layer"]["weight"].shape == (32, 128)
    assert not isinstance(dense["layer"]["weight"], quant.QuantizedTensor)
    # 4-bit grouped affine reconstruction error stays small
    err = np.abs(np.asarray(dense["layer"]["weight"]) - w).max()
    assert err < np.abs(w).max() * 0.15


def test_maybe_trace_writes_profile(tmp_path, monkeypatch):
    """TPU_AUDIO_PROFILE=dir captures a jax.profiler trace of the
    enclosed work; unset, the context is a free no-op."""
    import jax
    import jax.numpy as jnp

    from tpu_audio.core.profiling import maybe_trace

    monkeypatch.delenv("TPU_AUDIO_PROFILE", raising=False)
    with maybe_trace("noop"):
        pass  # no env -> no-op

    target = tmp_path / "trace"
    monkeypatch.setenv("TPU_AUDIO_PROFILE", str(target))
    with maybe_trace("unit"):
        jax.jit(lambda x: x * 2)(jnp.ones((8,))).block_until_ready()
    files = list(target.rglob("*"))
    assert any(f.is_file() for f in files), "no trace output written"
