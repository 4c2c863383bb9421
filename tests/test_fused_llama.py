"""Fused llama decoder kernel (ops/pallas_fused_llama.py): interpret-mode
semantic parity against the float llama.forward path (int8 quantization
is the only intended deviation) plus pack invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.core import kv_cache, nn
from tpu_audio.models import llama
from tpu_audio.ops import pallas_fused_llama as FL


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LlamaConfig(
        hidden_size=1024, num_hidden_layers=2, intermediate_size=2048,
        num_attention_heads=8, num_key_value_heads=4, head_dim=128,
        vocab_size=96, rope_theta=10000.0, tie_word_embeddings=True,
        max_position_embeddings=128)
    assert FL.supported(cfg)
    params = llama.init_random_params(cfg, seed=5, dtype=jnp.float32)
    pack = FL.pack_llama_weights(params, cfg)
    return cfg, params, pack


def test_pack_shapes(setup):
    cfg, params, pack = setup
    d, ffn = cfg.hidden_size, cfg.intermediate_size
    dkv = cfg.num_key_value_heads * 128
    rows = d + 2 * dkv + d + 2 * ffn + ffn
    assert pack.wstream.shape == (cfg.num_hidden_layers, rows, d)
    assert pack.wstream.dtype == jnp.int8
    assert pack.row_scales.shape == (cfg.num_hidden_layers, rows)
    # down section carries unit row scales (scale lives in normpack[2])
    assert np.allclose(np.asarray(pack.row_scales)[:, -ffn:], 1.0)
    assert pack.winv.shape == (1, 128)
    # lane table repeats inv_freq twice (half-split rotation)
    w = np.asarray(pack.winv)[0]
    assert np.allclose(w[:64], w[64:])


def test_fused_llama_matches_float_forward(setup):
    """Three decode steps: fused hidden -> final norm -> tied head must
    track the float path (cosine > 0.995, same argmax) — covers RoPE,
    the GQA pack permutation, SwiGLU, and the cache protocol."""
    cfg, params, pack = setup
    d = cfg.hidden_size
    dkv = cfg.num_key_value_heads * 128
    s_max = 64
    cache = llama.make_cache(cfg, 1, s_max, dtype=jnp.float32)
    kc = jnp.zeros((cfg.num_hidden_layers, s_max, dkv), jnp.bfloat16)
    vc = jnp.zeros((cfg.num_hidden_layers, s_max, dkv), jnp.bfloat16)

    toks = [5, 41, 12]
    for i, t in enumerate(toks):
        logits, cache = llama.forward(
            params, jnp.asarray([[t]], jnp.int32), cache, cfg)

        x = params["model"]["embed_tokens"]["weight"][t].astype(jnp.float32)
        x8 = jnp.zeros((8, d), jnp.float32).at[0].set(x)
        y, nk, nv = FL.fused_llama_stack(pack, kc, vc, x8, i, cfg=cfg,
                                         interpret=True)
        kc = jax.lax.dynamic_update_slice(
            kc, nk[:, 0:1].astype(kc.dtype), (0, i, 0))
        vc = jax.lax.dynamic_update_slice(
            vc, nv[:, 0:1].astype(vc.dtype), (0, i, 0))

    h = nn.rms_norm(params["model"]["norm"], np.asarray(y)[0:1].astype(jnp.float32),
                    cfg.rms_norm_eps)
    logits_f = nn.embedding_as_linear(params["model"]["embed_tokens"], h)
    a = np.asarray(logits[0, -1], np.float64)
    b = np.asarray(logits_f[0], np.float64)
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.995, cos
    assert np.argmax(a) == np.argmax(b)


def test_llama_tts_routes_fused_and_matches_xla(monkeypatch):
    """End-to-end through LlamaTTS._run_generation: the auto-routed fused
    decode (interpret mode) must produce the SAME greedy tokens as the
    XLA w8a8 loop — covers the left-pad valid_from mask, the prefill
    cache layout conversion, and the band-free head path."""
    from types import SimpleNamespace

    from tpu_audio.core import quant
    from tpu_audio.models.tts import llama_tts

    cfg = llama_tts.LlamaTTSConfig(
        hidden_size=1024, num_hidden_layers=2, intermediate_size=2048,
        num_attention_heads=8, num_key_value_heads=4, head_dim=128,
        vocab_size=96, rope_theta=10000.0, tie_word_embeddings=True,
        max_position_embeddings=256)
    params = llama.init_random_params(cfg, seed=11, dtype=jnp.float32)
    params = quant.quantize_tree(params, scheme="w8a8")
    toks = llama_tts.OrpheusTokens(
        start_of_human=1, end_of_human=2, end_of_text=3, start_of_speech=4,
        end_of_speech=5, pad_token=0, audio_start=6, audio_end=7,
        audio_token_offset=10, codebook_size=4)
    tokenizer = SimpleNamespace(
        encode=lambda s: SimpleNamespace(ids=[10 + (ord(c) % 30)
                                              for c in s]))
    gen = llama_tts.AudioGenerateParameters(
        max_tokens=9, temperature=0.0, repetition_penalty=1.0)

    def run(mode):
        monkeypatch.setenv("TPU_AUDIO_FUSED_LLAMA", mode)
        m = llama_tts.LlamaTTS(cfg, params, tokenizer=tokenizer,
                               codec=None, tokens=toks, dtype=jnp.float32)
        assert m._fused_supported() == (mode == "interpret")
        out = None
        for _new, _done, (_pt, _gt, _pl, all_tokens) in m._run_generation(
                "hi there", None, None, None, gen, chunk_tokens=9):
            out = all_tokens
        return out

    assert run("interpret") == run("0")


def test_fused_llama_qk_norm_matches_float():
    """Qwen3-style per-head q/k RMSNorm (the VyvoTTS backbone): the
    in-kernel lane-reduction norm must track the float path — same
    cosine/argmax bar as the base parity test, with non-trivial norm
    weights so a missing/misplaced norm fails loudly."""
    cfg = llama.LlamaConfig(
        hidden_size=1024, num_hidden_layers=2, intermediate_size=2048,
        num_attention_heads=8, num_key_value_heads=4, head_dim=128,
        vocab_size=96, rope_theta=10000.0, tie_word_embeddings=True,
        max_position_embeddings=128, qk_norm=True)
    assert FL.supported(cfg)
    params = llama.init_random_params(cfg, seed=7, dtype=jnp.float32)
    # init gives all-ones norm weights — randomize so the test can tell
    # normed from unnormed (and q's pack permutation from identity)
    key = jax.random.PRNGKey(3)
    kq, kk = jax.random.split(key)
    lp = params["model"]["layers"]["self_attn"]
    lp["q_norm"]["weight"] = 1.0 + 0.5 * jax.random.normal(
        kq, lp["q_norm"]["weight"].shape)
    lp["k_norm"]["weight"] = 1.0 + 0.5 * jax.random.normal(
        kk, lp["k_norm"]["weight"].shape)
    pack = FL.pack_llama_weights(params, cfg)

    d = cfg.hidden_size
    dkv = cfg.num_key_value_heads * 128
    s_max = 64
    cache = llama.make_cache(cfg, 1, s_max, dtype=jnp.float32)
    kc = jnp.zeros((cfg.num_hidden_layers, s_max, dkv), jnp.bfloat16)
    vc = jnp.zeros((cfg.num_hidden_layers, s_max, dkv), jnp.bfloat16)
    for i, t in enumerate([5, 41, 12]):
        logits, cache = llama.forward(
            params, jnp.asarray([[t]], jnp.int32), cache, cfg)
        x = params["model"]["embed_tokens"]["weight"][t].astype(jnp.float32)
        x8 = jnp.zeros((8, d), jnp.float32).at[0].set(x)
        y, nk, nv = FL.fused_llama_stack(pack, kc, vc, x8, i, cfg=cfg,
                                         interpret=True)
        kc = jax.lax.dynamic_update_slice(
            kc, nk[:, 0:1].astype(kc.dtype), (0, i, 0))
        vc = jax.lax.dynamic_update_slice(
            vc, nv[:, 0:1].astype(vc.dtype), (0, i, 0))

    h = nn.rms_norm(params["model"]["norm"],
                    np.asarray(y)[0:1].astype(jnp.float32),
                    cfg.rms_norm_eps)
    logits_f = nn.embedding_as_linear(params["model"]["embed_tokens"], h)
    a = np.asarray(logits[0, -1], np.float64)
    b = np.asarray(logits_f[0], np.float64)
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.995, cos
    assert np.argmax(a) == np.argmax(b)


def test_llama_tts_midgen_fallback_matches_xla(monkeypatch):
    """A generation that outgrows the kernel's VMEM cache cap must START
    fused and hand off to the XLA loop mid-generation — token-identical
    to running the XLA loop throughout."""
    from types import SimpleNamespace

    from tpu_audio.core import quant
    from tpu_audio.models.tts import llama_tts

    cfg = llama_tts.LlamaTTSConfig(
        hidden_size=1024, num_hidden_layers=2, intermediate_size=2048,
        num_attention_heads=8, num_key_value_heads=4, head_dim=128,
        vocab_size=96, rope_theta=10000.0, tie_word_embeddings=True,
        max_position_embeddings=512)
    params = llama.init_random_params(cfg, seed=13, dtype=jnp.float32)
    params = quant.quantize_tree(params, scheme="w8a8")
    toks = llama_tts.OrpheusTokens(
        start_of_human=1, end_of_human=2, end_of_text=3, start_of_speech=4,
        end_of_speech=5, pad_token=0, audio_start=6, audio_end=7,
        audio_token_offset=10, codebook_size=4)
    tokenizer = SimpleNamespace(
        encode=lambda s: SimpleNamespace(ids=[10 + (ord(c) % 30)
                                              for c in s]))
    # bucket = 64; cap 128 leaves ~62 fused rows -> the 8th chunk of 8
    # greedy tokens must trigger the fallback well before max_tokens
    import tpu_audio.ops.pallas_fused_llama as FL_mod
    monkeypatch.setattr(FL_mod, "S_MAX_CAP", 128)
    gen = llama_tts.AudioGenerateParameters(
        max_tokens=80, temperature=0.0, repetition_penalty=1.0)

    def run(mode):
        monkeypatch.setenv("TPU_AUDIO_FUSED_LLAMA", mode)
        m = llama_tts.LlamaTTS(cfg, params, tokenizer=tokenizer,
                               codec=None, tokens=toks, dtype=jnp.float32)
        out = None
        for _new, _done, (_pt, _gt, _pl, all_tokens) in m._run_generation(
                "hi there", None, None, None, gen, chunk_tokens=8):
            out = all_tokens
        return out

    assert run("interpret") == run("0")


def test_fused_llama_valid_from_masks_padding(setup):
    """A garbage row BELOW valid_from must not change the output; the
    same garbage row inside the valid window must."""
    cfg, params, pack = setup
    d = cfg.hidden_size
    dkv = cfg.num_key_value_heads * 128
    s_max = 64
    x = params["model"]["embed_tokens"]["weight"][7].astype(jnp.float32)
    x8 = jnp.zeros((8, d), jnp.float32).at[0].set(x)

    def out(garbage_row, valid_from):
        kc = jnp.zeros((cfg.num_hidden_layers, s_max, dkv), jnp.bfloat16)
        vc = jnp.zeros((cfg.num_hidden_layers, s_max, dkv), jnp.bfloat16)
        kc = kc.at[:, garbage_row].set(3.0)
        vc = vc.at[:, garbage_row].set(-2.0)
        y, _, _ = FL.fused_llama_stack(pack, kc, vc, x8, 5, cfg=cfg,
                                       valid_from=valid_from,
                                       interpret=True)
        return np.asarray(y[0])

    clean = out(garbage_row=0, valid_from=1)   # masked out
    dirty = out(garbage_row=1, valid_from=1)   # attended
    base = out(garbage_row=63, valid_from=1)   # beyond offset: ignored
    assert np.allclose(clean, base, atol=1e-5)
    assert not np.allclose(dirty, base, atol=1e-3)


def test_fused_llama_cached_k_is_rotated(setup):
    """The cache stores post-RoPE K: step i's newk must equal the float
    path's rotated k row (per-layer, within int8 tolerance)."""
    cfg, params, pack = setup
    d = cfg.hidden_size
    dkv = cfg.num_key_value_heads * 128
    s_max = 64
    kc = jnp.zeros((cfg.num_hidden_layers, s_max, dkv), jnp.bfloat16)
    vc = jnp.zeros((cfg.num_hidden_layers, s_max, dkv), jnp.bfloat16)
    t, i = 9, 0
    x = params["model"]["embed_tokens"]["weight"][t].astype(jnp.float32)
    x8 = jnp.zeros((8, d), jnp.float32).at[0].set(x)
    _, nk, _ = FL.fused_llama_stack(pack, kc, vc, x8, i, cfg=cfg,
                                    interpret=True)

    # float reference: layer-0 k projection + rope at position 0
    lp = jax.tree.map(lambda a: a[0], params["model"]["layers"])
    h = nn.rms_norm(lp["input_layernorm"], x[None], cfg.rms_norm_eps)
    k = nn.linear(lp["self_attn"]["k_proj"], h).reshape(
        1, 1, cfg.num_key_value_heads, 128).transpose(0, 2, 1, 3)
    cos, sin = llama._rope_tables(cfg, jnp.asarray([i]))
    k = nn.apply_rope(k, cos, sin)[0, :, 0]            # [n_kv, 128]
    ref = np.asarray(k).reshape(-1)
    got = np.asarray(nk)[0, 0]
    assert np.abs(got - ref).max() < 2e-2 * np.abs(ref).max()


def test_fused_llama_chunk_sizes_match():
    """ch=1024 (the r5 preferred chunk, _best_chunk at real Orpheus/Vyvo
    dims) must match ch=512 (the r4 chunk, what the tiny default fixture
    selects) bit-for-bit — dims here divide both."""
    cfg = llama.LlamaConfig(
        hidden_size=1024, num_hidden_layers=2, intermediate_size=2048,
        num_attention_heads=8, num_key_value_heads=8, head_dim=128,
        vocab_size=96, rope_theta=10000.0, tie_word_embeddings=True,
        max_position_embeddings=128)
    assert FL._best_chunk(1024, 1024, 2048) == 1024
    params = llama.init_random_params(cfg, seed=9, dtype=jnp.float32)
    pack = FL.pack_llama_weights(params, cfg)
    d = cfg.hidden_size
    dkv = cfg.num_key_value_heads * 128
    rng = np.random.default_rng(3)
    kc = jnp.asarray(rng.standard_normal(
        (cfg.num_hidden_layers, 64, dkv)) * 0.2, jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal(
        (cfg.num_hidden_layers, 64, dkv)) * 0.2, jnp.bfloat16)
    x = jnp.zeros((8, d), jnp.float32).at[0].set(
        jnp.asarray(rng.standard_normal(d) * 0.5))
    outs = {}
    for ch in (512, 1024):
        outs[ch] = FL.fused_llama_stack(pack, kc, vc, x, 9, cfg=cfg,
                                        interpret=True, ch=ch)
    for a, b in zip(outs[512], outs[1024]):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() / max(np.abs(a).max(), 1e-9) < 1e-5


def test_fused_llama_lanes_matches_b1():
    """Every live lane of the M-lane serving kernel must match a B=1
    ``fused_llama_stack`` run fed the same per-lane inputs (per-row
    activation quantization keeps lane rows independent). Covers
    distinct per-lane offsets (incl. 0 = empty cache), left-pad starts
    (valid_from), per-lane caches, qk_norm off."""
    cfg = llama.LlamaConfig(
        hidden_size=1024, num_hidden_layers=2, intermediate_size=2048,
        num_attention_heads=8, num_key_value_heads=4, head_dim=128,
        vocab_size=96, rope_theta=10000.0, tie_word_embeddings=True,
        max_position_embeddings=128)
    params = llama.init_random_params(cfg, seed=7, dtype=jnp.float32)
    pack = FL.pack_llama_weights(params, cfg)
    d = cfg.hidden_size
    dkv = cfg.num_key_value_heads * 128
    L = cfg.num_hidden_layers
    n, s_max = 3, 64
    rng = np.random.default_rng(5)
    offsets = np.zeros((8,), np.int32)
    offsets[:n] = [9, 0, 33]
    starts = np.zeros((8,), np.int32)
    starts[:n] = [2, 0, 0]
    kc = jnp.asarray(rng.standard_normal((n, L, s_max, dkv)) * 0.2,
                     jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((n, L, s_max, dkv)) * 0.2,
                     jnp.bfloat16)
    x = (rng.standard_normal((8, d)) * 0.5).astype(np.float32)
    x[n:] = 0.0
    xj = jnp.asarray(x)

    y, nk, nv = FL.fused_llama_stack_lanes(
        pack, kc, vc, xj, offsets, starts, cfg=cfg, interpret=True)

    for m in range(n):
        x8 = jnp.zeros((8, d), jnp.float32).at[0].set(xj[m])
        y1, nk1, nv1 = FL.fused_llama_stack(
            pack, kc[m], vc[m], x8, int(offsets[m]), cfg=cfg,
            valid_from=int(starts[m]), interpret=True)
        ref = np.asarray(y1)[0]
        got = np.asarray(y)[m]
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() / scale < 1e-5, (
            m, np.abs(got - ref).max() / scale)
        assert np.abs(np.asarray(nk)[:, m]
                      - np.asarray(nk1)[:, 0]).max() < 1e-5
        assert np.abs(np.asarray(nv)[:, m]
                      - np.asarray(nv1)[:, 0]).max() < 1e-5


def test_fused_llama_lanes_qk_norm():
    """Lanes kernel with Qwen3-style per-head q/k RMSNorm (VyvoTTS
    backbone) matches B=1 per lane."""
    cfg = llama.LlamaConfig(
        hidden_size=1024, num_hidden_layers=2, intermediate_size=2048,
        num_attention_heads=8, num_key_value_heads=4, head_dim=128,
        vocab_size=96, rope_theta=10000.0, tie_word_embeddings=True,
        max_position_embeddings=128, qk_norm=True)
    params = llama.init_random_params(cfg, seed=8, dtype=jnp.float32)
    pack = FL.pack_llama_weights(params, cfg)
    d = cfg.hidden_size
    dkv = cfg.num_key_value_heads * 128
    L = cfg.num_hidden_layers
    n, s_max = 2, 64
    rng = np.random.default_rng(6)
    offsets = np.zeros((8,), np.int32)
    offsets[:n] = [5, 17]
    starts = np.zeros((8,), np.int32)
    kc = jnp.asarray(rng.standard_normal((n, L, s_max, dkv)) * 0.2,
                     jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((n, L, s_max, dkv)) * 0.2,
                     jnp.bfloat16)
    x = (rng.standard_normal((8, d)) * 0.5).astype(np.float32)
    x[n:] = 0.0
    xj = jnp.asarray(x)
    y, nk, nv = FL.fused_llama_stack_lanes(
        pack, kc, vc, xj, offsets, starts, cfg=cfg, interpret=True)
    for m in range(n):
        x8 = jnp.zeros((8, d), jnp.float32).at[0].set(xj[m])
        y1, nk1, nv1 = FL.fused_llama_stack(
            pack, kc[m], vc[m], x8, int(offsets[m]), cfg=cfg,
            interpret=True)
        ref = np.asarray(y1)[0]
        got = np.asarray(y)[m]
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5
        assert np.abs(np.asarray(nk)[:, m]
                      - np.asarray(nk1)[:, 0]).max() < 1e-5


def test_use_fused_requires_first_chunk_to_fit(monkeypatch):
    """Non-streaming generate (chunk_tokens == max_tokens) whose first
    chunk cannot fit the fused VMEM cap must never START fused — the
    r4 gate packed a second int8 weight copy and did two cache layout
    conversions only to fall back before a single fused step."""
    from types import SimpleNamespace

    from tpu_audio.core import quant
    from tpu_audio.models.tts import llama_tts

    cfg = llama_tts.LlamaTTSConfig(
        hidden_size=1024, num_hidden_layers=2, intermediate_size=2048,
        num_attention_heads=8, num_key_value_heads=4, head_dim=128,
        vocab_size=96, rope_theta=10000.0, tie_word_embeddings=True,
        max_position_embeddings=256)
    params = llama.init_random_params(cfg, seed=15, dtype=jnp.float32)
    params = quant.quantize_tree(params, scheme="w8a8")
    toks = llama_tts.OrpheusTokens(
        start_of_human=1, end_of_human=2, end_of_text=3, start_of_speech=4,
        end_of_speech=5, pad_token=0, audio_start=6, audio_end=7,
        audio_token_offset=10, codebook_size=4)
    tokenizer = SimpleNamespace(
        encode=lambda s: SimpleNamespace(ids=[10 + (ord(c) % 30)
                                              for c in s]))
    import tpu_audio.ops.pallas_fused_llama as FL_mod
    monkeypatch.setattr(FL_mod, "S_MAX_CAP", 128)
    monkeypatch.setenv("TPU_AUDIO_FUSED_LLAMA", "interpret")
    m = llama_tts.LlamaTTS(cfg, params, tokenizer=tokenizer,
                           codec=None, tokens=toks, dtype=jnp.float32)
    assert m._fused_supported()

    # bucket 64 + 80 tokens + 1 > cap 128: one big chunk -> no fused start
    gen = llama_tts.AudioGenerateParameters(
        max_tokens=80, temperature=0.0, repetition_penalty=1.0)
    for _ in m._run_generation("hi", None, None, None, gen,
                               chunk_tokens=80):
        pass
    assert m._fused_pack is None, "fused pack built despite no fused step"

    # small chunks fit: fused starts (pack built), falls back mid-gen
    for _ in m._run_generation("hi", None, None, None, gen,
                               chunk_tokens=8):
        pass
    assert m._fused_pack is not None


def test_fused_llama_lanes_n4_matches_b1():
    """n=4 — the lane bucket the serve_fused bench actually measures at
    slots=4: every lane matches its B=1 reference (distinct offsets,
    incl. the 0 = empty-cache edge and a left-pad start)."""
    cfg = llama.LlamaConfig(
        hidden_size=1024, num_hidden_layers=2, intermediate_size=2048,
        num_attention_heads=8, num_key_value_heads=4, head_dim=128,
        vocab_size=96, rope_theta=10000.0, tie_word_embeddings=True,
        max_position_embeddings=128)
    params = llama.init_random_params(cfg, seed=17, dtype=jnp.float32)
    pack = FL.pack_llama_weights(params, cfg)
    d = cfg.hidden_size
    dkv = cfg.num_key_value_heads * 128
    L = cfg.num_hidden_layers
    n, s_max = 4, 64
    rng = np.random.default_rng(12)
    offsets = np.zeros((8,), np.int32)
    offsets[:n] = [3, 0, 40, 63]
    starts = np.zeros((8,), np.int32)
    starts[:n] = [0, 0, 8, 0]
    kc = jnp.asarray(rng.standard_normal((n, L, s_max, dkv)) * 0.2,
                     jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((n, L, s_max, dkv)) * 0.2,
                     jnp.bfloat16)
    x = (rng.standard_normal((8, d)) * 0.5).astype(np.float32)
    x[n:] = 0.0
    xj = jnp.asarray(x)
    y, nk, nv = FL.fused_llama_stack_lanes(
        pack, kc, vc, xj, offsets, starts, cfg=cfg, interpret=True)
    for m in range(n):
        x8 = jnp.zeros((8, d), jnp.float32).at[0].set(xj[m])
        y1, nk1, nv1 = FL.fused_llama_stack(
            pack, kc[m], vc[m], x8, int(offsets[m]), cfg=cfg,
            valid_from=int(starts[m]), interpret=True)
        ref = np.asarray(y1)[0]
        got = np.asarray(y)[m]
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5, m
        assert np.abs(np.asarray(nk)[:, m]
                      - np.asarray(nk1)[:, 0]).max() < 1e-5
        assert np.abs(np.asarray(nv)[:, m]
                      - np.asarray(nv1)[:, 0]).max() < 1e-5
