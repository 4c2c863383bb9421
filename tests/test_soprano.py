"""Soprano tests: prompt framing, hidden-state loop, vocoder decode."""

import numpy as np
import pytest

from tpu_audio.core.generation import AudioGenerateParameters, AudioGenerationKind
from tpu_audio.models.tts import load_model
from tpu_audio.models.tts.soprano import Soprano

from fixtures import make_soprano_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    import jax.numpy as jnp

    return load_model(str(make_soprano_fixture(tmp_path_factory.mktemp("soprano"))),
                      dtype=jnp.float32)


def test_factory(model):
    assert isinstance(model, Soprano)
    assert model.config.stop_token_id == 3
    assert model.config.qk_norm
    assert "lm_head" in model.params  # untied


def test_prompt_framing(model):
    ids = model._tokenize_prompt("hello world")
    assert ids[0] == 3  # [STOP]
    assert ids[1] == 70  # [TEXT]
    assert ids[-1] == 71  # [START]
    assert 72 in ids and 73 in ids


def test_split_text():
    parts = Soprano._split_text("line one\nline two")
    assert parts == ["line one", "line two"]
    long = "sentence. " * 80
    parts = Soprano._split_text(long)
    assert all(len(p) <= 500 for p in parts)


def test_generate_end_to_end(model):
    gp = AudioGenerateParameters(max_tokens=6, temperature=0.0,
                                 repetition_penalty=1.0, seed=0)
    audio = model.generate("hello world", generation_parameters=gp)
    assert audio.ndim == 1
    assert len(audio) > 0
    assert np.isfinite(audio).all()
    # trim rule: count*token_size - token_size samples per chunk
    assert len(audio) % model.config.token_size == 0


def test_generate_stream_info(model):
    gp = AudioGenerateParameters(max_tokens=4, temperature=0.0,
                                 repetition_penalty=1.0, seed=1)
    events = list(model.generate_stream("hello", generation_parameters=gp))
    assert events[-1].kind == AudioGenerationKind.INFO
    assert events[-1].info.generation_token_count <= 5


def test_deterministic(model):
    gp = AudioGenerateParameters(max_tokens=5, temperature=0.0,
                                 repetition_penalty=1.0, seed=2)
    a = model.generate("hello", generation_parameters=gp)
    b = model.generate("hello", generation_parameters=gp)
    np.testing.assert_array_equal(a, b)
