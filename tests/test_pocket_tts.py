"""PocketTTS tests: text prep, flow net, frame loop, mimi streaming."""

import numpy as np
import pytest

from tpu_audio.core.generation import AudioGenerateParameters
from tpu_audio.models.tts import load_model
from tpu_audio.models.tts.pocket_tts import (
    PocketTTS,
    prepare_text_prompt,
    split_sentences,
)

from fixtures import make_pocket_tts_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_pocket_tts_fixture(
        tmp_path_factory.mktemp("pocket"))))


def test_factory(model):
    assert isinstance(model, PocketTTS)
    assert model.config.latent_dim == 8
    assert model.config.flow_lm.d_model == 16
    # mimi subtree sanitized to torch conv layouts
    k = model.params["mimi"]["encoder"]["init_conv1d"]["conv"]["conv"]["weight"]
    assert np.asarray(k).shape == (4, 1, 3)


def test_prepare_text_prompt():
    t, guess = prepare_text_prompt("hello world")
    assert t.endswith("Hello world.")  # capitalized + period
    assert t.startswith(" " * 8)  # short text left-padded
    assert guess == 3
    t2, guess2 = prepare_text_prompt("one two three four five six seven")
    assert guess2 == 1
    assert not t2.startswith(" ")


def test_split_sentences():
    chunks = split_sentences("First sentence. Second one here!")
    assert len(chunks) >= 1
    # sentences are packed up to the word budget, never split mid-sentence
    long = "One two three four five six seven eight nine ten. " * 10
    chunks = split_sentences(long)
    assert len(chunks) > 1
    assert all(len(c.split()) <= 40 for c in chunks)


def test_flow_net_velocity_shape(model):
    import jax.numpy as jnp
    from tpu_audio.models.tts.pocket_tts import flow_net_forward

    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.standard_normal((1, 16)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((1, 8)).astype(np.float32))
    s = jnp.zeros((1, 1), jnp.float32)
    t = jnp.full((1, 1), 0.25, jnp.float32)
    v = flow_net_forward(model.params["flow_lm"]["flow_net"], c, s, t, x,
                         model.config.flow_lm)
    assert v.shape == (1, 8)
    assert np.isfinite(np.asarray(v)).all()
    # time conditioning changes the velocity
    v2 = flow_net_forward(model.params["flow_lm"]["flow_net"], c, s,
                          jnp.full((1, 1), 0.75, jnp.float32), x,
                          model.config.flow_lm)
    assert not np.allclose(np.asarray(v), np.asarray(v2))


def test_generate_stream(model):
    gp = AudioGenerateParameters(seed=0)
    events = list(model.generate_stream("hello world test",
                                        generation_parameters=gp,
                                        max_frames=4))
    audio_events = [e for e in events if e.audio is not None]
    assert len(audio_events) >= 1
    for e in audio_events:
        assert np.isfinite(e.audio).all()
    info = events[-1].info
    assert info.generation_token_count <= 4 * 2  # per sentence cap


def test_generate_deterministic(model):
    gp = AudioGenerateParameters(seed=3)
    a = model.generate("hello world", generation_parameters=gp, max_frames=3)
    b = model.generate("hello world", generation_parameters=gp, max_frames=3)
    np.testing.assert_array_equal(a, b)


def test_ref_audio_conditioning(model):
    rng = np.random.default_rng(1)
    ref = (rng.standard_normal(240) * 0.1).astype(np.float32)
    cond = model.encode_ref_audio(ref)
    assert cond.ndim == 3 and cond.shape[2] == 16
    gp = AudioGenerateParameters(seed=2)
    audio = model.generate("hello world", ref_audio=ref,
                           generation_parameters=gp, max_frames=3)
    assert np.isfinite(audio).all()


def test_missing_voice_raises(model):
    from tpu_audio.core.generation import AudioGenerationError

    with pytest.raises(AudioGenerationError):
        model.load_voice("nonexistent")
