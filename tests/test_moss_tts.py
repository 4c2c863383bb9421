"""MOSS-TTS Nano tests: row embeddings, prompt build, frame loop."""

import numpy as np
import pytest

from tpu_audio.models.tts import load_model
from tpu_audio.models.tts.moss_tts import MossTTSNano

from fixtures import make_moss_tts_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_moss_tts_fixture(
        tmp_path_factory.mktemp("mosstts"))))


def test_factory(model):
    assert isinstance(model, MossTTSNano)
    assert model.config.n_vq == 2
    assert model.audio_tokenizer is not None
    # alias heads dropped by sanitize
    assert "text_lm_head" not in model.params
    assert "audio_lm_heads" not in model.params


def test_prompt_rows_continuation(model):
    rows = model.build_prompt_rows("w1 w2 w3")
    assert rows.shape[1] == 3  # text + 2 audio channels
    assert rows[0, 0] == 4  # im_start
    assert rows[-1, 0] == 6  # audio_start
    assert (rows[:, 1:] == model.config.audio_pad_token_id).all()


def test_prompt_rows_voice_clone(model):
    codes = np.array([[1, 2], [3, 4], [5, 6]], np.int32)
    rows = model.build_prompt_rows("w1", prompt_audio_codes=codes)
    slot = model.config.audio_user_slot_token_id
    slot_rows = rows[rows[:, 0] == slot]
    assert slot_rows.shape[0] == 3
    np.testing.assert_array_equal(slot_rows[:, 1:], codes)


def test_rows_embeds_pad_masked(model):
    """Pad channels must contribute nothing to the summed embedding."""
    import jax.numpy as jnp

    cfg = model.config
    text_only = np.full((1, 1, cfg.n_vq + 1), cfg.audio_pad_token_id,
                        np.int32)
    text_only[0, 0, 0] = 6
    with_audio = text_only.copy()
    with_audio[0, 0, 1] = 3
    e_pad = np.asarray(model._rows_embeds(model.params,
                                          jnp.asarray(text_only)))
    e_audio = np.asarray(model._rows_embeds(model.params,
                                            jnp.asarray(with_audio)))
    assert not np.allclose(e_pad, e_audio)
    # pad-only audio row equals pure text embedding
    wte = np.asarray(model.params["transformer"]["wte"]["weight"])
    np.testing.assert_allclose(e_pad[0, 0], wte[6], atol=1e-6)


def test_generate_codes(model):
    frames = model.generate_codes("w1 w2", max_new_frames=3, seed=0)
    assert frames.shape[1] == 2
    assert frames.shape[0] <= 3
    if frames.shape[0]:
        assert frames.min() >= 0 and frames.max() < 16


def test_generate_codes_deterministic(model):
    a = model.generate_codes("w1 w2", max_new_frames=3, seed=1)
    b = model.generate_codes("w1 w2", max_new_frames=3, seed=1)
    np.testing.assert_array_equal(a, b)
