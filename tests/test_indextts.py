"""IndexTTS tests: text normalizer, conditioning stack, GPT mel loop,
conditioned BigVGAN decode."""

import numpy as np
import pytest

from tpu_audio.core.generation import AudioGenerateParameters
from tpu_audio.models.tts import load_model
from tpu_audio.models.tts.indextts import (
    IndexTTS,
    normalize_text,
    tokenize_by_cjk_char,
)

from fixtures import make_indextts_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_indextts_fixture(
        tmp_path_factory.mktemp("indextts"))))


def test_factory(model):
    assert isinstance(model, IndexTTS)
    assert model.config.gpt.stop_mel_token == 11
    assert model.tokenizer is not None


def test_normalize_text_english():
    assert normalize_text("it's here") == "it is here"
    assert normalize_text("I have $5") == "I have five dollars"
    assert normalize_text("call 911 now") == "call nine hundred eleven now"
    assert normalize_text("digits 1 2 3") == "digits one two three"
    assert normalize_text("a: b; c") == "a, b, c"


def test_normalize_text_chinese():
    out = normalize_text("你好。世界！")
    assert out == "你好.世界!"
    # only J/Q/X pinyin get the v-substitution + uppercase
    # (correctPinyin, IndexTTSModel.swift:181-197)
    assert "JV1" in normalize_text("ju1 hao3")
    assert "ni3" in normalize_text("ni3 hao3")


def test_tokenize_by_cjk_char():
    assert tokenize_by_cjk_char("ab你好cd") == "AB 你 好 CD"
    assert tokenize_by_cjk_char("hello") == "HELLO"


def test_sanitize_layout(model):
    # GPT-2 Conv1D [in, out] transposed to [out, in]
    assert model.params["gpt"]["h"]["0"]["attn"]["c_attn"][
        "weight"].shape == (48, 16)
    # perceiver to_kv split into k/v
    lay = model.params["perceiver_encoder"]["layers"]["0"]["attention"]
    assert lay["linear_k"]["weight"].shape == (128, 16)
    assert lay["linear_v"]["weight"].shape == (128, 16)
    # vocoder weight norm folded, speaker encoder remapped
    voc = model.params["vocoder"]
    assert "weight" in voc["conv_pre"] and "weight_v" not in voc["conv_pre"]
    assert "block0" in voc["speaker_encoder"]
    # snake params flattened
    assert voc["activation_post"]["act"]["alpha"].ndim == 1


def test_reference_features(model):
    audio = np.sin(np.arange(4800) / 20).astype(np.float32)
    feats = model.reference_features(audio)
    assert feats.ndim == 3 and feats.shape[2] == 8
    # log floor
    assert feats.min() >= np.log(1e-5) - 1e-5


def test_conditioning_latents(model):
    audio = np.sin(np.arange(4800) / 20).astype(np.float32)
    feats = model.reference_features(audio)
    cond = np.asarray(model.get_conditioning(feats))
    assert cond.shape == (1, 4, 16)  # condition_num_latent x model_dim


def test_mel_token_generation(model):
    audio = np.sin(np.arange(4800) / 20).astype(np.float32)
    feats = model.reference_features(audio)
    cond = model.get_conditioning(feats)
    ids = model.encode_text("hello world")
    tokens, latents = model.generate_mel_tokens(ids, cond, max_tokens=6,
                                                temperature=0.0)
    assert len(tokens) <= 6
    assert all(0 <= t < 12 and t != 11 for t in tokens)
    # latent count: tokens+1 when stopped early, budget otherwise
    assert latents.shape[1] in (len(tokens), len(tokens) + 1)
    assert latents.shape[2] == 16


def test_generate_end_to_end(model):
    ref = np.sin(np.arange(4800) / 15).astype(np.float32) * 0.5
    audio = model.generate(
        "hello world", ref_audio=ref,
        generation_parameters=AudioGenerateParameters(
            max_tokens=6, temperature=0.0))
    assert audio.ndim == 1
    assert np.all(np.abs(audio) <= 1.0)  # tanh final


def test_requires_ref_audio(model):
    from tpu_audio.core.generation import AudioGenerationError

    with pytest.raises(AudioGenerationError):
        model.generate("hello")
