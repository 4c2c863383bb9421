"""Kokoro tests through the real from_pretrained path: end-to-end synthesis,
voice loading, duration/alignment behavior, tokenizer, lexicon G2P."""

import numpy as np
import pytest

from tpu_audio.core.generation import AudioGenerateParameters, AudioGenerationError
from tpu_audio.models.tts import load_model
from tpu_audio.models.tts.kokoro import Kokoro
from tpu_audio.models.g2p.lexicon import LexiconG2P, arpabet_to_ipa, parse_cmudict

from fixtures import make_kokoro_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_kokoro_fixture(tmp_path_factory.mktemp("kokoro"))))


def test_factory(model):
    assert isinstance(model, Kokoro)
    assert model.sample_rate == 24000


def test_tokenize_skips_oov(model):
    toks = model.tokenize("abc!x")
    # '!' not in fixture vocab -> dropped; combining-mark-safe iteration
    assert toks == [model.config.vocab[c] for c in "abcx"]


def test_load_voice(model):
    v = model.load_voice("af_heart")
    assert v.shape == (8, 16)
    with pytest.raises(AudioGenerationError, match="not found"):
        model.load_voice("nonexistent")


def test_generate_end_to_end(model):
    audio = model.generate("hello world", voice="af_heart")
    assert audio.ndim == 1
    assert len(audio) > 0
    assert np.isfinite(audio).all()
    # total upsample = 2*2*2(hop) = 8 per frame, 2 frames per token-frame
    # duration >=1 per token -> at least n_tokens*2*... samples
    n_tokens = len(model.tokenize("hello world")) + 2
    assert len(audio) >= n_tokens * 8


def test_generate_deterministic(model):
    p = AudioGenerateParameters(seed=3)
    a = model.generate("abc", generation_parameters=p)
    b = model.generate("abc", generation_parameters=p)
    np.testing.assert_array_equal(a, b)


def test_speed_changes_duration(model):
    a = model.generate("hello world abcdefg")
    model.speed = 2.0
    b = model.generate("hello world abcdefg")
    model.speed = 1.0
    assert len(b) <= len(a)


def test_forward_durations(model):
    ids = np.asarray([[0] + model.tokenize("abcd") + [0]], np.int32)
    ref = model.load_voice("af_heart")[:1]
    audio, durs = model.forward(ids, ref)
    assert durs.shape == (6,)
    assert np.all(durs >= 1)
    total_frames = int(durs.sum())
    # audio length tracks frames through the 2x prosody + generator upsampling
    assert len(audio) > total_frames


def test_ref_audio_as_style(model):
    style = np.random.default_rng(0).standard_normal((4, 16)).astype(np.float32) * 0.3
    audio = model.generate("ab", ref_audio=style)
    assert len(audio) > 0


# ---------------------------------------------------------------------------
# lexicon G2P
# ---------------------------------------------------------------------------


def test_arpabet_to_ipa():
    assert arpabet_to_ipa(["HH", "AH0", "L", "OW1"]) == "hʌlˈoʊ"
    assert arpabet_to_ipa(["K", "AE1", "T"]) == "kˈæt"


def test_parse_cmudict_and_process():
    text = """;;; comment
CAT  K AE1 T
DOG  D AO1 G
DOG(2)  D AO2 G
"""
    lex = LexiconG2P(parse_cmudict(text))
    assert lex.word_to_ipa("cat") == "kˈæt"
    assert lex.word_to_ipa("CAT") == "kˈæt"
    assert lex.word_to_ipa("missing") is None
    out = lex.process("cat dog zebra!")
    assert "kˈæt" in out and "dˈɔɡ" in out and "zebra" in out
