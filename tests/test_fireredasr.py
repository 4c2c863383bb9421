"""FireRedASR2 tests: conformer AED encoder, greedy KV-cached decode."""

import numpy as np
import pytest

from tpu_audio.models.stt import load_model
from tpu_audio.models.stt.fireredasr import FireRedASR2, encoder_forward

from fixtures import make_firered_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_firered_fixture(
        tmp_path_factory.mktemp("firered"))))


def test_factory(model):
    assert isinstance(model, FireRedASR2)
    assert model.config.sos_id == 3 and model.config.eos_id == 4
    assert model.cmvn is not None
    # MLX conv2d layout mapped to torch [O, I, H, W]
    conv1 = model.params["encoder"]["input_preprocessor"]["conv1"]["weight"]
    assert np.asarray(conv1).shape == (8, 1, 3, 3)


def test_encoder_shapes(model):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((1, 20, 16)).astype(np.float32))
    enc = encoder_forward(model.params, feats, model.config)
    # +6 right context, two VALID k3 s2 convs: ((26-1)//2 -1)//2 = 5
    assert enc.shape == (1, 5, 16)
    assert np.isfinite(np.asarray(enc)).all()


def test_generate(model):
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    out = model.generate(audio)
    assert isinstance(out.text, str)
    out2 = model.generate(audio)
    assert out.text == out2.text


def test_eos_excluded_from_tokens(model):
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    out = model.generate(audio)
    assert model.config.eos_id not in out.segments[0].tokens


def test_empty_audio(model):
    out = model.generate(np.zeros(100, np.float32))
    assert out.text == ""


def test_resample_path(model):
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    out = model.generate(audio, sample_rate=8000)
    assert isinstance(out.text, str)


def _host_beam_search(model, enc, cross_k, cross_v, max_total, B=3,
                      smooth=1.25, eos_penalty=1.0):
    """Eager per-step mirror of the reference beamSearch
    (FireRedASR2Model.swift:581-737): python candidate lists + host sort,
    calling the same jitted decoder step. The oracle for the one-graph
    lax.while_loop implementation."""
    import jax.numpy as jnp

    from tpu_audio.core import kv_cache
    from tpu_audio.models.stt.fireredasr import _decoder_step

    cfg = model.config
    eos, sos = cfg.eos_id, cfg.sos_id
    cache = kv_cache.init_cache(
        cfg.decoder.n_layers, B, cfg.decoder.n_head,
        cfg.decoder.d_model // cfg.decoder.n_head, max_total, jnp.float32)
    ck = jnp.repeat(cross_k, B, axis=1)
    cv = jnp.repeat(cross_v, B, axis=1)
    tokens = [[sos] for _ in range(B)]
    scores = [0.0] + [-np.inf] * (B - 1)
    finished = [False] * B
    for _ in range(max_total - 1):
        last = jnp.asarray([[t[-1]] for t in tokens], jnp.int32)
        logits, cache = _decoder_step(model.params, last, cache, ck, cv,
                                      cfg)
        # float32 softmax/log matching the jitted path bit-for-bit
        logits = np.asarray(logits, np.float32)
        z = (logits / np.float32(smooth)).astype(np.float32)
        ex = np.exp(z - z.max(axis=-1, keepdims=True), dtype=np.float32)
        step = np.log(ex / ex.sum(axis=-1, keepdims=True)
                      + np.float32(1e-10), dtype=np.float32)
        step[:, eos] *= eos_penalty
        cands = []
        for b in range(B):
            if finished[b]:
                cands.append((scores[b], b, eos, 0.0))
                for _ in range(B - 1):
                    cands.append((-np.inf, b, eos, -np.inf))
                continue
            top = np.argsort(step[b])[::-1][:B]
            for t in top:
                cands.append((scores[b] + step[b, t], b, int(t),
                              step[b, t]))
        cands.sort(key=lambda c: c[0], reverse=True)
        chosen = cands[:B]
        src = [c[1] for c in chosen]
        tokens = [tokens[s] + [c[2]] for s, c in zip(src, chosen)]
        cache = cache._replace(k=cache.k[:, np.asarray(src)],
                               v=cache.v[:, np.asarray(src)])
        scores = [c[0] for c in chosen]
        finished = [c[2] == eos for c in chosen]
        if all(finished):
            break
    lengths = [sum(1 for t in seq if t != eos) for seq in tokens]
    finals = [s / ((5.0 + n) / 6.0) ** 0.6 for s, n in zip(scores, lengths)]
    best = int(np.argmax(finals))
    return [t for t in tokens[best][1:] if t != eos]


def test_beam_search_matches_host_reference(tmp_path):
    """The one-graph lax.while_loop beam decode reproduces the reference
    algorithm (eager python candidate merge) token-for-token, and
    beam_size=1 falls back to the greedy loop."""
    import jax.numpy as jnp

    from tpu_audio.models.stt.fireredasr import _cross_kv, compute_fbank

    # fresh instance: the shared fixture's output projection yields
    # near-uniform logits (pure tie-breaking); reseed it so the beam
    # ordering is decided by scores, not argsort tie order
    model = load_model(str(make_firered_fixture(tmp_path / "f")))
    rng = np.random.default_rng(5)
    prj = model.params["decoder"]["tgt_word_prj"]
    prj["weight"] = jnp.asarray(
        rng.standard_normal(np.asarray(prj["weight"]).shape)
        .astype(np.float32))
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    feats = compute_fbank(audio, model._fbank_cfg)
    feats = (feats - model.cmvn[0]) * model.cmvn[1]
    enc = model._encode(model.params, jnp.asarray(feats, model.dtype)[None])
    cross_k, cross_v = _cross_kv(model.params, enc, model.config)
    max_total = enc.shape[1] + 1

    want = _host_beam_search(model, enc, cross_k, cross_v, max_total, B=3)
    got, confs = model._beam_decode(cross_k, cross_v, max_total, 3)
    assert got == want
    assert len(confs) == len(got)
    assert all(0.0 <= c <= 1.0 + 1e-6 for c in confs)

    greedy = model.generate(audio, beam_size=1)
    beam = model.generate(audio)  # default beam_size=3, reference default
    assert isinstance(beam.text, str)
    assert greedy.text is not None
