"""KittenTTS tests: symbol table, voices/speed priors, end-to-end synth,
and the no-unwrap ISTFT phase path."""

import numpy as np
import pytest

from tpu_audio.core.generation import AudioGenerationError
from tpu_audio.models.tts import load_model
from tpu_audio.models.tts.kitten_tts import KittenTTS, clean_text

from fixtures import make_kitten_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    m = load_model(str(make_kitten_fixture(
        tmp_path_factory.mktemp("kitten"))))
    m.text_processor = None  # feed IPA directly in tests
    return m


def test_factory(model):
    assert isinstance(model, KittenTTS)
    assert set(model.voices) == {"expr-voice-5-m", "expr-voice-2-f"}
    assert model.config.speed_priors["expr-voice-5-m"] == 1.25


def test_clean_text():
    # '$' pad is id 0; punctuation follows
    assert clean_text("$") == [0]
    ids = clean_text("hə'loʊ")  # ' not in table, rest mapped
    assert len(ids) >= 4
    assert clean_text("") == []  # unknown chars dropped


def test_alpha_key_rename(model):
    gen = model.params["decoder"]["generator"]
    blk = gen["resblocks"]["0"]
    assert "alpha1_0" in blk and "alpha1_2" in blk


def test_voice_alias_and_speed(model):
    ids, ref_s, speed = model.prepare_inputs("hello", "voice-5")
    assert speed == 1.25
    assert ref_s.shape == (1, 16)
    assert ids[0, 0] == 0 and ids[0, -1] == 0


def test_unknown_voice(model):
    with pytest.raises(AudioGenerationError, match="not available"):
        model.prepare_inputs("hi", "nope")


def test_generate_end_to_end(model):
    audio = model.generate("həloʊ wɜːld", voice="expr-voice-5-m")
    assert audio.ndim == 1 and len(audio) > 0
    assert np.isfinite(audio).all()


def test_speed_scales_duration(model):
    ids, ref_s, _ = model.prepare_inputs("həloʊ həloʊ", "expr-voice-2-f")
    a_slow, dur_slow = model.forward(ids, ref_s, speed=0.5)
    a_fast, dur_fast = model.forward(ids, ref_s, speed=2.0)
    assert dur_slow.sum() >= dur_fast.sum()
    assert len(a_slow) >= len(a_fast)
