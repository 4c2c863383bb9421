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


def test_pallas_quantized_matvec_word_scales():
    """Precomputed bf16 word-scale planes (scales_w) match the default
    per-call f32 expansion within bf16 scale rounding."""
    import jax.numpy as jnp

    from tpu_audio.core import quant
    from tpu_audio.ops.pallas_qmm import expand_word_scales, quantized_matvec

    rng = np.random.default_rng(1)
    for bits in (4, 8):
        o, i, b = 128, 256, 2
        w = rng.standard_normal((o, i)).astype(np.float32)
        packed, scales, biases = quant.quantize(w, group_size=64, bits=bits)
        x = rng.standard_normal((b, i)).astype(np.float32)
        sw = expand_word_scales(jnp.asarray(scales), 64, bits)
        # exact reference for what the kernel computes: dequant with the
        # *bf16-rounded* scales
        scales_bf = np.asarray(
            jnp.asarray(scales).astype(jnp.bfloat16).astype(jnp.float32))
        dense_bf = np.asarray(quant.dequantize(
            jnp.asarray(packed), jnp.asarray(scales_bf), jnp.asarray(biases),
            64, bits, dtype=jnp.float32))
        want = x @ dense_bf.T
        got = np.asarray(quantized_matvec(
            jnp.asarray(x), jnp.asarray(packed), jnp.asarray(scales),
            jnp.asarray(biases), 64, bits, tile_o=128, interpret=True,
            scales_w=sw))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)
        # and the bf16-scale rounding stays well below the int-quantization
        # noise floor vs the full-precision weight
        dense = np.asarray(quant.dequantize(
            jnp.asarray(packed), jnp.asarray(scales), jnp.asarray(biases),
            64, bits, dtype=jnp.float32))
        np.testing.assert_allclose(got, x @ dense.T, rtol=0.5, atol=0.5)


def test_quantize_tree_and_fused_projections_parity():
    """quantize_tree tags stacked llama layers; fuse_projections (dense
    and quantized) preserves forward outputs."""
    import jax
    import jax.numpy as jnp

    from tpu_audio.core import quant
    from tpu_audio.models import llama

    cfg = llama.LlamaConfig(
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=512, max_position_embeddings=128)
    params = llama.init_random_params(cfg, seed=0, dtype=jnp.float32)
    tokens = jnp.asarray(np.arange(6)[None, :] % 512, jnp.int32)
    cache = llama.make_cache(cfg, 1, 16, jnp.float32)
    ref, _ = llama.forward(params, tokens, cache, cfg)

    # dense fusion parity (exact)
    fused = llama.fuse_projections(jax.tree.map(lambda x: x, params))
    p = fused["model"]
    assert "qkv_proj" in p["layers"]["self_attn"]
    assert "gate_up_proj" in p["layers"]["mlp"]
    cache = llama.make_cache(cfg, 1, 16, jnp.float32)
    got, _ = llama.forward(fused, tokens, cache, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # quantized (8-bit keeps the parity check tight) + fusion still runs
    qparams = quant.quantize_tree(
        {"model": dict(params["model"])}, group_size=64, bits=8,
        word_scales=True)
    qt = qparams["model"]["layers"]["self_attn"]["q_proj"]["weight"]
    assert isinstance(qt, quant.QuantizedTensor)
    assert qt.scales_w is not None and qt.scales_w.dtype == jnp.bfloat16
    qfused = llama.fuse_projections(qparams)
    # quantized embeddings dequantize to bf16 — run the whole pass bf16
    cache = llama.make_cache(cfg, 1, 16, jnp.bfloat16)
    qgot, _ = llama.forward(qfused, tokens, cache, cfg)
    # int8 grouped-affine + bf16 compute error bound on logits
    err = np.abs(np.asarray(qgot, np.float32) - np.asarray(ref)).max()
    assert err < 0.5, err


def test_int8_w8a8_path():
    """Per-channel int8 (w8a8) leaves: matmul accuracy, embedding gather,
    fused projections, and forward parity on the llama backbone."""
    import jax
    import jax.numpy as jnp

    from tpu_audio.core import nn, quant
    from tpu_audio.models import llama

    rng = np.random.default_rng(3)
    w = rng.standard_normal((48, 256)).astype(np.float32) * 0.1
    x = rng.standard_normal((5, 256)).astype(np.float32)
    t = quant.quantize_int8_jax(jnp.asarray(w))
    got = np.asarray(quant.int8_matmul(jnp.asarray(x), t))
    want = x @ w.T
    # w8a8 error: ~1% relative on random dense layers
    assert np.abs(got - want).max() < np.abs(want).max() * 0.03

    # embedding row gather
    emb = {"weight": t}
    ids = jnp.asarray([[0, 5, 47]])
    rows = np.asarray(nn.embedding(emb, ids))
    np.testing.assert_allclose(
        rows[0], np.asarray(t.dequantize(jnp.float32))[[0, 5, 47]],
        rtol=1e-6)

    # backbone forward with w8a8 tree + fusion
    cfg = llama.LlamaConfig(
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=512, max_position_embeddings=128)
    params = llama.init_random_params(cfg, seed=0, dtype=jnp.float32)
    tokens = jnp.asarray(np.arange(6)[None, :] % 512, jnp.int32)
    cache = llama.make_cache(cfg, 1, 16, jnp.float32)
    ref, _ = llama.forward(params, tokens, cache, cfg)

    qparams = quant.quantize_tree(
        {"model": dict(params["model"])}, scheme="w8a8")
    assert isinstance(
        qparams["model"]["layers"]["self_attn"]["q_proj"]["weight"],
        quant.Int8Tensor)
    qfused = llama.fuse_projections(qparams)
    assert "qkv_proj" in qfused["model"]["layers"]["self_attn"]
    cache = llama.make_cache(cfg, 1, 16, jnp.float32)
    got, _ = llama.forward(qfused, tokens, cache, cfg)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(ref)).max()
    assert err < 0.35, err


def test_fuse_projections_preserves_biases_and_skips_raw_quant():
    """Regression (review findings): MLP/attention biases must fuse, and
    raw un-tagged MLX-quantized triples must be left alone."""
    import jax.numpy as jnp

    from tpu_audio.models import llama

    rng = np.random.default_rng(0)
    d, ffn = 16, 32

    def lin(o, i, bias=True):
        p = {"weight": jnp.asarray(rng.standard_normal((o, i)), jnp.float32)}
        if bias:
            p["bias"] = jnp.asarray(rng.standard_normal((o,)), jnp.float32)
        return p

    layers = {
        "self_attn": {"q_proj": lin(d, d), "k_proj": lin(d, d),
                      "v_proj": lin(d, d), "o_proj": lin(d, d)},
        "mlp": {"gate_proj": lin(ffn, d), "up_proj": lin(ffn, d),
                "down_proj": lin(d, ffn)},
    }
    params = {"model": {"layers": dict(layers)}}
    fused = llama.fuse_projections(params)
    ap = fused["model"]["layers"]["self_attn"]
    mp = fused["model"]["layers"]["mlp"]
    assert "qkv_proj" in ap and "bias" in ap["qkv_proj"]
    np.testing.assert_array_equal(
        np.asarray(ap["qkv_proj"]["bias"]),
        np.concatenate([np.asarray(layers["self_attn"][n]["bias"])
                        for n in ("q_proj", "k_proj", "v_proj")]))
    assert "gate_up_proj" in mp and "bias" in mp["gate_up_proj"]

    # mixed bias presence -> no fusion
    layers2 = {
        "self_attn": {"q_proj": lin(d, d), "k_proj": lin(d, d, bias=False),
                      "v_proj": lin(d, d), "o_proj": lin(d, d)},
        "mlp": {"gate_proj": lin(ffn, d, bias=False), "up_proj": lin(ffn, d),
                "down_proj": lin(d, ffn)},
    }
    fused2 = llama.fuse_projections({"model": {"layers": layers2}})
    assert "qkv_proj" not in fused2["model"]["layers"]["self_attn"]
    assert "gate_up_proj" not in fused2["model"]["layers"]["mlp"]

    # raw un-tagged quantized triples -> no fusion (scales would be lost)
    def rawq(o, i):
        return {"weight": jnp.zeros((o, i // 8), jnp.uint32),
                "scales": jnp.ones((o, i // 64)),
                "biases": jnp.zeros((o, i // 64))}
    layers3 = {
        "self_attn": {"q_proj": rawq(64, 64), "k_proj": rawq(64, 64),
                      "v_proj": rawq(64, 64), "o_proj": rawq(64, 64)},
        "mlp": {"gate_proj": rawq(128, 64), "up_proj": rawq(128, 64),
                "down_proj": rawq(64, 128)},
    }
    fused3 = llama.fuse_projections({"model": {"layers": layers3}})
    ap3 = fused3["model"]["layers"]["self_attn"]
    assert "qkv_proj" not in ap3 and "scales" in ap3["q_proj"]
