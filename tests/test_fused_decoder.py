"""Fused whisper decoder kernel (ops/pallas_fused_decoder.py): interpret-
mode parity against (a) an exact pure-JAX emulation of the kernel's int8
math and (b) the float decoder_step (semantic tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.models.stt import whisper as W
from tpu_audio.ops import pallas_fused_decoder as F

CFG = dict(num_mel_bins=80, d_model=256, encoder_layers=1,
           encoder_attention_heads=4, encoder_ffn_dim=1024,
           decoder_layers=2, decoder_attention_heads=4,
           decoder_ffn_dim=1024, vocab_size=128,
           max_source_positions=150, max_target_positions=64)


@pytest.fixture(scope="module")
def setup():
    cfg = W.WhisperConfig(**CFG)
    assert F.supported(cfg)
    params = W.init_params(cfg, seed=3, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.standard_normal(
        (1, cfg.max_source_positions, cfg.d_model)).astype(np.float32) * 0.3)
    cross_k, cross_v = W._cross_kv(params, enc, cfg)
    pack = F.pack_decoder_weights(params, cfg)
    ck, ks, cv, vs = F.quantize_cross_kv(cross_k, cross_v,
                                         chunk=cfg.d_model // 2)
    return cfg, params, enc, (cross_k, cross_v), pack, (ck, ks, cv, vs)


def _q8(w):
    s = np.maximum(np.abs(w).max(-1) / 127.0, 1e-12)
    return np.clip(np.round(w / s[..., None]), -127, 127), s


def _act_q8(x):
    s = max(np.abs(x).max() / 127.0, 1e-12)
    return np.clip(np.round(x / s), -127, 127), s


def _ref_fused(cfg, params, cross8, kc, vc, x0, offset):
    """Pure-numpy emulation of the kernel's exact arithmetic."""
    d = cfg.d_model
    H = cfg.decoder_attention_heads
    hd = d // H
    sm = 1.0 / np.sqrt(hd)
    ck, ks, cv, vs = [np.asarray(t, np.float64) for t in cross8]
    s_src = cfg.max_source_positions
    lp = jax.tree.map(lambda t: np.asarray(t, np.float64),
                      params["model"]["decoder"]["layers"])

    def gemv(x, w, bias=None):
        q, ws = _q8(np.asarray(w, np.float64))
        xq, xs = _act_q8(x)
        y = (xq @ q.T) * (ws * xs)
        return y if bias is None else y + np.asarray(bias, np.float64)

    def ln(x, p):
        mu = x.mean()
        v = ((x - mu) ** 2).mean()
        return ((x - mu) / np.sqrt(v + 1e-5)) * p["weight"] + p["bias"]

    def gelu_tanh(x):
        return 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi)
                                      * (x + 0.044715 * x ** 3)))

    def attn(q, K, V, n):
        sc = (K[:n].reshape(n, H, hd) * (q * sm).reshape(H, hd)).sum(-1)
        p = np.exp(sc - sc.max(0))
        p = p / p.sum(0)
        return (p[:, :, None] * V[:n].reshape(n, H, hd)).sum(0).reshape(d)

    x = np.asarray(x0, np.float64)
    newk, newv = [], []
    for li in range(cfg.decoder_layers):
        g = lambda tree, *path: np.asarray(  # noqa: E731
            __import__("functools").reduce(lambda t, k: t[k], path, tree)[li],
            np.float64)
        h = ln(x, {"weight": g(lp, "self_attn_layer_norm", "weight"),
                   "bias": g(lp, "self_attn_layer_norm", "bias")})
        q = gemv(h, g(lp, "self_attn", "q_proj", "weight"),
                 g(lp, "self_attn", "q_proj", "bias"))
        k = gemv(h, g(lp, "self_attn", "k_proj", "weight"))
        v = gemv(h, g(lp, "self_attn", "v_proj", "weight"),
                 g(lp, "self_attn", "v_proj", "bias"))
        K = np.asarray(kc[li], np.float64).copy()
        V = np.asarray(vc[li], np.float64).copy()
        K[offset], V[offset] = k, v
        newk.append(k)
        newv.append(v)
        o = attn(q, K, V, offset + 1)
        x = x + gemv(o, g(lp, "self_attn", "out_proj", "weight"),
                     g(lp, "self_attn", "out_proj", "bias"))

        h = ln(x, {"weight": g(lp, "encoder_attn_layer_norm", "weight"),
                   "bias": g(lp, "encoder_attn_layer_norm", "bias")})
        q2 = gemv(h, g(lp, "encoder_attn", "q_proj", "weight"),
                  g(lp, "encoder_attn", "q_proj", "bias"))
        CK = ck[li] * ks[li][:, None]
        CV = cv[li] * vs[li][:, None]
        o2 = attn(q2, CK, CV, s_src)
        x = x + gemv(o2, g(lp, "encoder_attn", "out_proj", "weight"),
                     g(lp, "encoder_attn", "out_proj", "bias"))

        h = ln(x, {"weight": g(lp, "final_layer_norm", "weight"),
                   "bias": g(lp, "final_layer_norm", "bias")})
        hh = gelu_tanh(gemv(h, g(lp, "fc1", "weight"),
                            g(lp, "fc1", "bias")))
        # fc2 int8 per-out-channel, act-quantized hidden
        w2 = g(lp, "fc2", "weight")
        q2w, s2 = _q8(w2)
        hq, hs = _act_q8(hh)
        x = x + (hq @ q2w.T) * (s2 * hs) + g(lp, "fc2", "bias")
    return x, np.stack(newk), np.stack(newv)


def test_fused_stack_matches_reference(setup):
    cfg, params, enc, dense_cross, pack, cross8 = setup
    rng = np.random.default_rng(1)
    d = cfg.d_model
    offset = 5
    s_max = 64
    kc = rng.standard_normal((cfg.decoder_layers, s_max, d)) * 0.2
    vc = rng.standard_normal((cfg.decoder_layers, s_max, d)) * 0.2
    kc[:, offset:] = 0
    vc[:, offset:] = 0
    x0 = rng.standard_normal(d) * 0.5

    x8 = jnp.zeros((8, d), jnp.float32).at[0].set(jnp.asarray(x0))
    y, nk, nv = F.fused_stack(
        pack, *cross8,
        jnp.asarray(kc, jnp.bfloat16), jnp.asarray(vc, jnp.bfloat16),
        x8, offset, cfg=cfg, s_src=cfg.max_source_positions,
        interpret=True)
    ref_y, ref_k, ref_v = _ref_fused(
        cfg, params, cross8, jnp.asarray(kc, jnp.bfloat16),
        jnp.asarray(vc, jnp.bfloat16), x0, offset)

    got = np.asarray(y)[0]
    scale = np.abs(ref_y).max()
    assert np.abs(got - ref_y).max() / scale < 2e-2, \
        np.abs(got - ref_y).max() / scale
    assert np.abs(np.asarray(nk)[:, 0] - ref_k).max() < 2e-2 * np.abs(
        ref_k).max()
    assert np.abs(np.asarray(nv)[:, 0] - ref_v).max() < 2e-2 * np.abs(
        ref_v).max()


def test_fused_stack_semantics_vs_float_decoder(setup):
    """Cosine similarity vs the float decoder_step layer stack must be
    very high (int8 + tanh-gelu are the only deviations)."""
    from tpu_audio.core import kv_cache

    cfg, params, enc, (cross_k, cross_v), pack, cross8 = setup
    d = cfg.d_model
    H = cfg.decoder_attention_heads
    hd = d // H
    s_max = 64
    rng = np.random.default_rng(2)

    # drive BOTH paths for 3 tokens from an empty cache
    cache = kv_cache.init_cache(cfg.decoder_layers, 1, H, hd, s_max,
                                jnp.float32)
    kc = jnp.zeros((cfg.decoder_layers, s_max, d), jnp.bfloat16)
    vc = jnp.zeros((cfg.decoder_layers, s_max, d), jnp.bfloat16)
    p = params["model"]["decoder"]

    toks = [3, 17, 9]
    for i, t in enumerate(toks):
        logits, cache = W.decoder_step(
            params, jnp.asarray([[t]], jnp.int32), i, cache,
            cross_k, cross_v, cfg)

        x = (p["embed_tokens"]["weight"][t]
             + p["embed_positions"]["weight"][i]).astype(jnp.float32)
        x8 = jnp.zeros((8, d), jnp.float32).at[0].set(x)
        y, nk, nv = F.fused_stack(
            pack, *cross8, kc, vc, x8, i, cfg=cfg,
            s_src=cfg.max_source_positions, interpret=True)
        kc = jax.lax.dynamic_update_slice(
            kc, nk[:, 0:1].astype(kc.dtype), (0, i, 0))
        vc = jax.lax.dynamic_update_slice(
            vc, nv[:, 0:1].astype(vc.dtype), (0, i, 0))

    # float-path final hidden (pre final-LN) is not exposed; compare
    # logits computed from the fused hidden through the same head
    h_fused = W.nn.layer_norm(p["layer_norm"], np.asarray(y)[0:1])
    logits_fused = W.nn.embedding_as_linear(p["embed_tokens"], h_fused)
    a = np.asarray(logits[0, -1], np.float64)
    b = np.asarray(logits_fused[0], np.float64)
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.995, cos
    assert np.argmax(a) == np.argmax(b)


def test_fused_decode_loop_mechanics(setup):
    """_decode_loop_fused plumbing: teacher-forced prompt, EOT stop, and
    token parity against manually stepping fused_stack + the same
    sampling tail."""
    cfg, params, enc, _, pack, cross8 = setup
    d = cfg.d_model
    prompt = [3, 7, 1]
    max_total = 12
    V = cfg.vocab_size
    prompt_buf = np.zeros((max_total,), np.int32)
    prompt_buf[: len(prompt)] = prompt
    suppress = np.zeros((V,), np.float32)
    begin = np.zeros((V,), np.float32)

    tokens, count = W._decode_loop_fused(
        params, pack, enc, jnp.asarray(prompt_buf),
        jnp.int32(len(prompt)), jnp.int32(-1), jnp.asarray(suppress),
        jnp.asarray(begin), jnp.float32(0.0), jax.random.PRNGKey(0),
        max_total=max_total, cfg=cfg, pallas_interpret=True)
    tokens = np.asarray(tokens)
    count = int(count)
    assert count == max_total
    assert tokens[: len(prompt)].tolist() == prompt  # teacher-forced

    # manual replication: step fused_stack greedily from scratch
    import tpu_audio.ops.pallas_fused_decoder as F
    p = params["model"]["decoder"]
    s_max = -(-max_total // F.SUB) * F.SUB
    kc = jnp.zeros((cfg.decoder_layers, s_max, d), jnp.bfloat16)
    vc = jnp.zeros((cfg.decoder_layers, s_max, d), jnp.bfloat16)
    seq = list(prompt)
    for i in range(max_total - 1):
        tok = seq[i]
        x = (p["embed_tokens"]["weight"][tok]
             + p["embed_positions"]["weight"][i]).astype(jnp.float32)
        x8 = jnp.zeros((8, d), jnp.float32).at[0].set(x)
        y, nk, nv = F.fused_stack(pack, *cross8, kc, vc, x8, i, cfg=cfg,
                                  s_src=cfg.max_source_positions,
                                  interpret=True)
        kc = jax.lax.dynamic_update_slice(
            kc, nk[:, 0:1].astype(kc.dtype), (0, i, 0))
        vc = jax.lax.dynamic_update_slice(
            vc, nv[:, 0:1].astype(vc.dtype), (0, i, 0))
        h = W.nn.layer_norm(p["layer_norm"], np.asarray(y)[0:1])
        logits = W.nn.embedding_as_linear(p["embed_tokens"], h)
        nxt = int(np.argmax(np.asarray(logits)[0]))
        if i + 1 >= len(seq):
            seq.append(nxt)
    assert tokens[: count].tolist() == seq[:count]

    # an EOT id equal to the first generated token must stop immediately
    eot = int(tokens[len(prompt)])
    _, count2 = W._decode_loop_fused(
        params, pack, enc, jnp.asarray(prompt_buf),
        jnp.int32(len(prompt)), jnp.int32(eot), jnp.asarray(suppress),
        jnp.asarray(begin), jnp.float32(0.0), jax.random.PRNGKey(0),
        max_total=max_total, cfg=cfg, pallas_interpret=True)
    assert int(count2) == len(prompt) + 1


def test_fused_stack_lanes_matches_b1(setup):
    """Every live lane of the M-lane serving kernel must match a B=1
    ``fused_stack`` run fed the same per-lane inputs. Per-row activation
    quantization + row-independent dots/LN make lane rows mathematically
    independent, so the tolerance is tight (f32 noise only). Covers
    distinct per-lane offsets (incl. 0 = empty cache), per-lane caches,
    and per-lane cross K/V."""
    cfg, params, enc, _, pack, _ = setup
    rng = np.random.default_rng(7)
    d = cfg.d_model
    L = cfg.decoder_layers
    n = 3
    s_max = 64
    offsets = np.zeros((8,), np.int32)
    offsets[:n] = [5, 0, 33]

    kc = (rng.standard_normal((n, L, s_max, d)) * 0.2).astype(np.float32)
    vc = (rng.standard_normal((n, L, s_max, d)) * 0.2).astype(np.float32)
    kcj = jnp.asarray(kc, jnp.bfloat16)
    vcj = jnp.asarray(vc, jnp.bfloat16)

    # per-lane cross K/V from distinct encoder outputs
    lanes_cross = []
    for m in range(n):
        e = jnp.asarray(rng.standard_normal(
            (1, cfg.max_source_positions, d)).astype(np.float32) * 0.3)
        k, v = W._cross_kv(params, e, cfg)
        lanes_cross.append(F.quantize_cross_kv(k, v, chunk=d // 2))
    ck = jnp.stack([c[0] for c in lanes_cross])
    ks = jnp.stack([c[1] for c in lanes_cross])
    cv = jnp.stack([c[2] for c in lanes_cross])
    vs = jnp.stack([c[3] for c in lanes_cross])

    x = (rng.standard_normal((8, d)) * 0.5).astype(np.float32)
    x[n:] = 0.0
    xj = jnp.asarray(x)

    y, nk, nv = F.fused_stack_lanes(
        pack, ck, ks, cv, vs, kcj, vcj, xj, offsets,
        cfg=cfg, s_src=cfg.max_source_positions, interpret=True)

    for m in range(n):
        x8 = jnp.zeros((8, d), jnp.float32).at[0].set(xj[m])
        y1, nk1, nv1 = F.fused_stack(
            pack, ck[m], ks[m], cv[m], vs[m], kcj[m], vcj[m],
            x8, int(offsets[m]), cfg=cfg,
            s_src=cfg.max_source_positions, interpret=True)
        ref = np.asarray(y1)[0]
        got = np.asarray(y)[m]
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() / scale < 1e-5, (m, np.abs(
            got - ref).max() / scale)
        assert np.abs(np.asarray(nk)[:, m]
                      - np.asarray(nk1)[:, 0]).max() < 1e-5
        assert np.abs(np.asarray(nv)[:, m]
                      - np.asarray(nv1)[:, 0]).max() < 1e-5


def test_fused_stack_chunk_sizes_match(setup):
    """The r5 default weight chunk (ch=d, one grid step per projection)
    must match the r4 chunking (ch=d//2) bit-for-bit — same math, only
    the grid timeline differs. Covers both NW branches of the step
    timeline and the decoupled cross chunk."""
    cfg, params, enc, _, pack, cross8 = setup
    ck, ks, cv, vs = cross8
    d = cfg.d_model
    rng = np.random.default_rng(11)
    kc = jnp.asarray(rng.standard_normal(
        (cfg.decoder_layers, 64, d)) * 0.2, jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal(
        (cfg.decoder_layers, 64, d)) * 0.2, jnp.bfloat16)
    x = jnp.zeros((8, d), jnp.float32).at[0].set(
        jnp.asarray(rng.standard_normal(d) * 0.5))
    outs = {}
    for ch in (d // 2, d):
        outs[ch] = F.fused_stack(
            pack, ck, ks, cv, vs, kc, vc, x, 7, cfg=cfg,
            s_src=cfg.max_source_positions, interpret=True, ch=ch)
    for a, b in zip(outs[d // 2], outs[d]):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() / max(np.abs(a).max(), 1e-9) < 1e-5


def test_whisper_generate_routes_fused_and_matches_xla(monkeypatch):
    """End-to-end through Whisper.generate(): the auto-routed fused decode
    (interpret mode) must produce the SAME greedy tokens as the XLA w8
    loop — covers the routing predicate in _transcribe_chunk, the fused
    branch's prompt/count slice and EOT strip, and the real mel+encoder
    front end feeding the kernel's cross-KV quantization."""
    from tests.fixtures import FakeWhisperTokenizer
    from tpu_audio.core import quant
    from tpu_audio.core.generation import STTGenerateParameters

    cfg = W.WhisperConfig(num_mel_bins=80, d_model=256, encoder_layers=1,
                          encoder_attention_heads=4, encoder_ffn_dim=1024,
                          decoder_layers=2, decoder_attention_heads=4,
                          decoder_ffn_dim=1024, vocab_size=128,
                          max_source_positions=1500,
                          max_target_positions=64)
    params = W.init_params(cfg, seed=5, dtype=jnp.float32)
    params["model"]["decoder"] = quant.quantize_tree(
        params["model"]["decoder"], scheme="w8a8")
    rng = np.random.default_rng(1)
    audio = rng.standard_normal(16000).astype(np.float32) * 0.1

    def run(mode):
        monkeypatch.setenv("TPU_AUDIO_FUSED_DECODER", mode)
        m = W.Whisper(cfg, params, dtype=jnp.float32)
        m.tokenizer = FakeWhisperTokenizer(vocab=cfg.vocab_size)
        assert m._fused_supported() == (mode == "interpret")
        out = m.generate(audio, STTGenerateParameters(max_tokens=4))
        return [s.tokens for s in out.segments]

    assert run("interpret") == run("0")


def test_fused_stack_lanes_full_bucket_n8(setup):
    """n=8 (the kernel's lane cap / a full slots=8 tick): every lane
    matches its B=1 reference — exercises the full grid timeline (8
    self-attention steps, 8 lane-major cross windows) and the index-map
    pinning at the bucket boundary."""
    cfg, params, enc, _, pack, _ = setup
    rng = np.random.default_rng(21)
    d = cfg.d_model
    L = cfg.decoder_layers
    n = 8
    s_max = 64
    offsets = np.asarray([5, 0, 33, 12, 1, 63, 7, 20], np.int32)
    kc = jnp.asarray(rng.standard_normal((n, L, s_max, d)) * 0.2,
                     jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((n, L, s_max, d)) * 0.2,
                     jnp.bfloat16)
    lanes_cross = []
    for m in range(n):
        e = jnp.asarray(rng.standard_normal(
            (1, cfg.max_source_positions, d)).astype(np.float32) * 0.3)
        k, v = W._cross_kv(params, e, cfg)
        lanes_cross.append(F.quantize_cross_kv(k, v, chunk=d // 2))
    ck = jnp.stack([c[0] for c in lanes_cross])
    ks = jnp.stack([c[1] for c in lanes_cross])
    cv = jnp.stack([c[2] for c in lanes_cross])
    vs = jnp.stack([c[3] for c in lanes_cross])
    x = jnp.asarray(rng.standard_normal((8, d)).astype(np.float32) * 0.5)

    y, nk, nv = F.fused_stack_lanes(
        pack, ck, ks, cv, vs, kc, vc, x, offsets,
        cfg=cfg, s_src=cfg.max_source_positions, interpret=True)

    for m in range(n):
        x8 = jnp.zeros((8, d), jnp.float32).at[0].set(x[m])
        y1, nk1, nv1 = F.fused_stack(
            pack, ck[m], ks[m], cv[m], vs[m], kc[m], vc[m],
            x8, int(offsets[m]), cfg=cfg,
            s_src=cfg.max_source_positions, interpret=True)
        ref = np.asarray(y1)[0]
        got = np.asarray(y)[m]
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5, m
        assert np.abs(np.asarray(nk)[:, m]
                      - np.asarray(nk1)[:, 0]).max() < 1e-5
