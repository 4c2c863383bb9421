"""Fused int8-KV decode attention kernel (ops/pallas_kv_attention.py).

Runs the Pallas kernel in interpreter mode on CPU so the kernel body's
math (transposed dequant, masked softmax, both MXU contractions) is
covered by CI; the on-device speed numbers are in the module docstring.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_audio.core import kv_cache
from tpu_audio.ops import pallas_kv_attention as pk


@pytest.mark.parametrize("h,s,hd,g", [(4, 300, 64, 1), (2, 128, 64, 2)])
def test_kernel_matches_xla_dequant_path(h, s, hd, g):
    rng = np.random.default_rng(0)
    k = rng.standard_normal((h, s, hd)).astype(np.float32)
    v = rng.standard_normal((h, s, hd)).astype(np.float32)
    q = rng.standard_normal((h, 1, hd)).astype(np.float32) * 0.3
    sm = 1.0 / math.sqrt(hd)

    kt, ks, kb = pk.quantize_kv_transposed(jnp.asarray(k), n_groups=g)
    vt, vs, vb = pk.quantize_kv_transposed(jnp.asarray(v), n_groups=g)
    valid = jnp.asarray([s], jnp.int32)

    out = np.asarray(pk.decode_attention_int8(
        jnp.asarray(q), kt, ks, kb, vt, vs, vb, valid,
        sm_scale=sm, interpret=True))

    # vs the pure-numpy reference of the same quantized math
    ref = pk.reference_attention_int8(q, kt, ks, kb, vt, vs, vb, valid, sm)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)

    # vs the existing XLA dequant + sdpa path on the SAME codes
    kq, ksc, kbi = kv_cache._quantize(jnp.asarray(k), n_groups=g, bits=8)
    vq, vsc, vbi = kv_cache._quantize(jnp.asarray(v), n_groups=g, bits=8)
    kd = kv_cache._dequantize(kq, ksc, kbi, jnp.float32)
    vd = kv_cache._dequantize(vq, vsc, vbi, jnp.float32)
    scores = jnp.einsum("hqd,hkd->hqk", jnp.asarray(q), kd) * sm
    p = jax.nn.softmax(scores, axis=-1)
    xla = np.asarray(jnp.einsum("hqk,hkd->hqd", p, vd))
    np.testing.assert_allclose(out, xla, atol=3e-5, rtol=1e-4)


def test_padding_positions_are_masked():
    """S not a lane multiple: padded tail must not leak into the softmax."""
    rng = np.random.default_rng(1)
    h, s, hd = 2, 100, 32
    k = rng.standard_normal((h, s, hd)).astype(np.float32)
    v = rng.standard_normal((h, s, hd)).astype(np.float32)
    q = rng.standard_normal((h, 1, hd)).astype(np.float32)
    sm = 1.0 / math.sqrt(hd)
    kt, ks, kb = pk.quantize_kv_transposed(jnp.asarray(k), n_groups=1)
    vt, vs, vb = pk.quantize_kv_transposed(jnp.asarray(v), n_groups=1)
    assert kt.shape[-1] == 128  # padded
    out = np.asarray(pk.decode_attention_int8(
        jnp.asarray(q), kt, ks, kb, vt, vs, vb,
        jnp.asarray([s], jnp.int32), sm_scale=sm, interpret=True))
    ref = pk.reference_attention_int8(
        q, kt, ks, kb, vt, vs, vb, np.asarray([s]), sm)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)
    assert np.isfinite(out).all()


def test_valid_shorter_than_s():
    """Dynamic valid < stored positions (self-attn style masking)."""
    rng = np.random.default_rng(2)
    h, s, hd = 2, 256, 32
    k = rng.standard_normal((h, s, hd)).astype(np.float32)
    v = rng.standard_normal((h, s, hd)).astype(np.float32)
    q = rng.standard_normal((h, 1, hd)).astype(np.float32)
    sm = 1.0 / math.sqrt(hd)
    kt, ks, kb = pk.quantize_kv_transposed(jnp.asarray(k), n_groups=1)
    vt, vs, vb = pk.quantize_kv_transposed(jnp.asarray(v), n_groups=1)
    out = np.asarray(pk.decode_attention_int8(
        jnp.asarray(q), kt, ks, kb, vt, vs, vb,
        jnp.asarray([57], jnp.int32), sm_scale=sm, interpret=True))
    # equals attention computed over only the first 57 positions
    kt2, ks2, kb2 = pk.quantize_kv_transposed(jnp.asarray(k[:, :57]), n_groups=1)
    vt2, vs2, vb2 = pk.quantize_kv_transposed(jnp.asarray(v[:, :57]), n_groups=1)
    ref = pk.reference_attention_int8(
        q, kt2, ks2, kb2, vt2, vs2, vb2, np.asarray([57]), sm)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_supported_gate():
    assert pk.supported(20, 64, 8)
    assert not pk.supported(20, 64, 4)
    assert not pk.supported(20, 50, 8)
    assert not pk.supported(20, 64, None)
