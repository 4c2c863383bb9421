"""SmartTurn endpoint-detection tests."""

import numpy as np
import pytest

from tpu_audio.models.vad import load_model
from tpu_audio.models.vad.smart_turn import SmartTurn

from fixtures import make_smart_turn_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_smart_turn_fixture(
        tmp_path_factory.mktemp("smart_turn"))))


def test_factory(model):
    assert isinstance(model, SmartTurn)
    assert model.config.d_model == 16
    assert "val_accuracy" not in model.params
    # k_proj has no bias (k_proj_bias=False default)
    assert "bias" not in model.params["encoder"]["layers"]["0"]["self_attn"]["k_proj"]


def test_prepare_audio_pads_left(model):
    short = np.ones(4000, np.float32)
    prepared = model.prepare_audio(short)
    assert len(prepared) == 16000
    # left-padded: leading region from the zero pad, post-normalization
    assert prepared[0] == prepared[1000]
    assert prepared[0] != prepared[-1]


def test_prepare_audio_trims_to_last_window(model):
    long = np.concatenate([np.zeros(16000, np.float32),
                           np.ones(16000, np.float32)])
    prepared = model.prepare_audio(long)
    # the kept tail is the constant-ones region -> zero variance pre-norm
    assert len(prepared) == 16000
    np.testing.assert_allclose(prepared, prepared[0], atol=1e-5)


def test_features_shape(model):
    rng = np.random.default_rng(0)
    feats = model.prepare_input_features(
        rng.standard_normal(16000).astype(np.float32))
    assert feats.shape == (8, 100)


def test_predict_endpoint(model):
    rng = np.random.default_rng(1)
    audio = rng.standard_normal(12000).astype(np.float32)
    out = model.predict_endpoint(audio)
    assert 0.0 <= out.probability <= 1.0
    assert out.prediction in (0, 1)
    assert out.prediction == int(out.probability > model.config.threshold)
    # deterministic
    out2 = model.predict_endpoint(audio)
    assert out.probability == out2.probability


def test_batch_matches_single(model):
    rng = np.random.default_rng(2)
    f1 = model.prepare_input_features(
        rng.standard_normal(9000).astype(np.float32))
    f2 = model.prepare_input_features(
        rng.standard_normal(16000).astype(np.float32))
    batched = np.asarray(model(np.stack([f1, f2])))
    np.testing.assert_allclose(batched[0], np.asarray(model(f1))[0], atol=1e-5)
    np.testing.assert_allclose(batched[1], np.asarray(model(f2))[0], atol=1e-5)


def test_resample_path(model):
    rng = np.random.default_rng(3)
    audio = rng.standard_normal(8000).astype(np.float32)
    out = model.predict_endpoint(audio, sample_rate=8000)
    assert 0.0 <= out.probability <= 1.0
