"""Fused Pallas mel kernel: interpret-mode parity with the XLA reference,
and the TPU_AUDIO_PALLAS-gated frontend wiring."""

import numpy as np
import pytest


def test_fused_log_mel_interpret_parity(monkeypatch):
    from jax.experimental import pallas as pl

    import jax.numpy as jnp
    import tpu_audio.ops.pallas_mel as PM

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)
    rng = np.random.default_rng(0)
    t, f, m = 300, 201, 128
    re = rng.standard_normal((t, f)).astype(np.float32)
    im = rng.standard_normal((t, f)).astype(np.float32)
    fb = np.abs(rng.standard_normal((f, m)).astype(np.float32)) * 0.01
    got = np.asarray(PM.fused_log_mel(jnp.asarray(re), jnp.asarray(im),
                                      jnp.asarray(fb)))
    want = np.log10(np.maximum((re**2 + im**2) @ fb, 1e-10))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_log_mel_odd_shapes(monkeypatch):
    """Padding path: non-multiple-of-tile dims crop back correctly."""
    from jax.experimental import pallas as pl

    import jax.numpy as jnp
    import tpu_audio.ops.pallas_mel as PM

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))
    rng = np.random.default_rng(1)
    t, f, m = 37, 101, 80
    re = rng.standard_normal((t, f)).astype(np.float32)
    im = rng.standard_normal((t, f)).astype(np.float32)
    fb = np.abs(rng.standard_normal((f, m)).astype(np.float32)) * 0.01
    got = np.asarray(PM.fused_log_mel(jnp.asarray(re), jnp.asarray(im),
                                      jnp.asarray(fb), tile_t=64))
    want = np.log10(np.maximum((re**2 + im**2) @ fb, 1e-10))
    assert got.shape == (t, m)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_quantized_matvec_matches_dequant():
    """Fused int4/int8 GEMV kernel (interpret mode) matches the XLA
    dequantize-then-matmul path."""
    import jax.numpy as jnp

    from tpu_audio.core import quant
    from tpu_audio.ops.pallas_qmm import quantized_matvec

    rng = np.random.default_rng(0)
    for bits, o, i, b in [(4, 96, 128, 1), (8, 64, 256, 3), (4, 300, 192, 2)]:
        w = rng.standard_normal((o, i)).astype(np.float32)
        packed, scales, biases = quant.quantize(w, group_size=64, bits=bits)
        x = rng.standard_normal((b, i)).astype(np.float32)
        want = np.asarray(quant.quantized_matmul(
            jnp.asarray(x), jnp.asarray(packed), jnp.asarray(scales),
            jnp.asarray(biases), 64, bits))
        got = np.asarray(quantized_matvec(
            jnp.asarray(x), jnp.asarray(packed), jnp.asarray(scales),
            jnp.asarray(biases), 64, bits, tile_o=128, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)
