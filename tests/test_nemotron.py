"""Nemotron streaming ASR tests: causal subsample, chunked mask,
cache-aware streaming == offline parity."""

import numpy as np
import pytest

from tpu_audio.models.stt import load_model
from tpu_audio.models.stt.nemotron import (
    NemotronASR,
    NemotronStreamSession,
    chunked_limited_mask,
)

from fixtures import make_nemotron_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_nemotron_fixture(
        tmp_path_factory.mktemp("nemotron"))))


def test_factory(model):
    assert isinstance(model, NemotronASR)
    assert model.blank_id == 12
    assert "linear0" in model.params["prompt_kernel"]
    # parakeet sanitize renamed pos biases + renumbered pre_encode convs
    attn = model.params["encoder"]["layers"]["0"]["self_attn"]
    assert "posBiasU" in attn
    assert "conv0" in model.params["encoder"]["pre_encode"]


def test_chunked_limited_mask():
    m = chunked_limited_mask(8, left=4, right=1)[0, 0]
    # chunk size 2, left_chunks 2: query chunk i sees chunks [i-2, i]
    assert m[0, 0] == 0 and m[0, 1] == 0
    assert m[0, 2] < -1e8  # future chunk masked
    assert m[6, 0] < -1e8  # too far left
    assert m[6, 2] == 0 and m[6, 7] == 0


def test_generate_offline(model):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    out = model.generate(audio)
    assert isinstance(out.text, str)
    out2 = model.generate(audio)
    assert out.text == out2.text


def test_prompt_changes_encoding(model):
    import jax.numpy as jnp
    from tpu_audio.models.stt.nemotron import apply_prompt

    rng = np.random.default_rng(1)
    enc = jnp.asarray(rng.standard_normal((1, 6, 16)).astype(np.float32))
    en = np.asarray(apply_prompt(model.params, enc, model.config, 0))
    de = np.asarray(apply_prompt(model.params, enc, model.config, 1))
    assert not np.allclose(en, de)


def test_streaming_matches_offline_tokens(model):
    """Cache-aware streaming must produce the same token sequence as the
    offline chunked-limited decode."""
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(16000) * 0.3).astype(np.float32)
    offline = model.generate(audio)

    session = NemotronStreamSession(model)
    for s in range(0, len(audio), 2000):
        session.feed(audio[s:s + 2000])
    final = session.finish()
    assert final.text == offline.text


def test_streaming_incremental_feed_sizes(model):
    """Different feed sizes give the same final text."""
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(12000) * 0.3).astype(np.float32)
    texts = []
    for step in (1500, 4000):
        session = NemotronStreamSession(model)
        for s in range(0, len(audio), step):
            session.feed(audio[s:s + step])
        texts.append(session.finish().text)
    assert texts[0] == texts[1]


def test_generate_stream_events(model):
    rng = np.random.default_rng(4)
    audio = (rng.standard_normal(8000) * 0.3).astype(np.float32)
    events = list(model.generate_stream(audio))
    assert events[-1]["type"] == "result"
