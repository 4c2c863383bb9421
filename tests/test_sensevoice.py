"""SenseVoice tests: frontend invariants, SANM encoder, CTC decode."""

import numpy as np
import pytest

from tpu_audio.models.stt import load_model
from tpu_audio.models.stt.sensevoice import (
    SenseVoice,
    SenseVoiceConfig,
    apply_lfr,
    compute_fbank,
    normalize_language,
)

from fixtures import make_sensevoice_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_sensevoice_fixture(
        tmp_path_factory.mktemp("sensevoice"))))


def test_factory(model):
    assert isinstance(model, SenseVoice)
    assert "ctc_lo" in model.params  # ctc.ctc_lo renamed
    assert model.cmvn is not None
    assert model.tokenizer is not None
    # fsmn_block transposed to torch depthwise layout [O, 1, K]
    blk = model.params["encoder"]["encoders0"]["0"]["self_attn"]["fsmn_block"]
    assert blk["weight"].shape == (16, 1, 11)


def test_normalize_language():
    assert normalize_language("Mandarin") == "zh"
    assert normalize_language("ENGLISH") == "en"
    assert normalize_language(None) == "auto"
    assert normalize_language("klingon") == "auto"


def test_lfr_frame_count():
    feats = np.arange(26 * 3, dtype=np.float32).reshape(26, 3)
    out = apply_lfr(feats, m=7, n=6)
    assert out.shape == (5, 21)  # ceil(26/6) = 5
    # first frame stacks [0,0,0,0,1,2,3] (repeat-first left pad of 3)
    np.testing.assert_array_equal(out[0, :3], feats[0])
    np.testing.assert_array_equal(out[0, 9:12], feats[0])
    np.testing.assert_array_equal(out[0, 12:15], feats[1])
    # last frame clamps to the final source row
    np.testing.assert_array_equal(out[-1, -3:], feats[-1])


def test_fbank_scaling_invariance():
    """Unit-scale audio is rescaled to int16 range, so a [-1,1] float and
    its int16-scaled counterpart give the same features."""
    cfg = SenseVoiceConfig(n_mels=8)
    rng = np.random.default_rng(0)
    a = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    f1 = compute_fbank(a, cfg)
    f2 = compute_fbank(a * 32768.0, cfg)
    assert f1.shape[1] == 8
    np.testing.assert_allclose(f1, f2, atol=1e-3)


def test_generate_end_to_end(model):
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    out = model.generate(audio)
    assert isinstance(out.text, str)
    assert out.language is not None
    assert out.segments[0].end == pytest.approx(1.0)
    # deterministic
    out2 = model.generate(audio)
    assert out.text == out2.text


def test_language_query_changes_logits(model):
    """Different language queries prepend different embeddings, so the
    rich-tag frames must differ."""
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    feats = model.extract_features(audio)
    import jax.numpy as jnp

    padded = np.zeros((1, 32, feats.shape[1]), np.float32)
    padded[0, :feats.shape[0]] = feats
    lp_auto = np.asarray(model._forward(
        model.params, jnp.asarray(padded), jnp.asarray(
            model._query_ids("auto", False))))
    lp_zh = np.asarray(model._forward(
        model.params, jnp.asarray(padded), jnp.asarray(
            model._query_ids("zh", False))))
    assert not np.allclose(lp_auto[0, 0], lp_zh[0, 0])


def test_empty_audio(model):
    out = model.generate(np.zeros(10, np.float32))
    assert out.text == ""


def test_resampled_input(model):
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    out = model.generate(audio, sample_rate=8000)
    assert isinstance(out.text, str)


def test_stream_wrapper(model):
    rng = np.random.default_rng(4)
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    events = list(model.generate_stream(audio))
    assert events[-1]["type"] == "result"
