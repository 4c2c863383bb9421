"""ECAPA-TDNN LID tests."""

import numpy as np
import pytest

from tpu_audio.models.lid import load_model
from tpu_audio.models.lid.ecapa_lid import EcapaLID, ecapa_mel

from fixtures import make_ecapa_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return EcapaLID.from_pretrained(
        str(make_ecapa_fixture(tmp_path_factory.mktemp("ecapa"))))


def test_factory(tmp_path):
    m = load_model(str(make_ecapa_fixture(tmp_path / "e")))
    assert isinstance(m, EcapaLID)


def test_mel_shape():
    mel = np.asarray(ecapa_mel(np.zeros(16000, np.float32)))
    assert mel.shape[0] == 1 and mel.shape[2] == 60
    assert mel.shape[1] == 16000 // 160 + 1


def test_predict(model):
    wav = (np.random.default_rng(0).standard_normal(16000) * 0.1).astype(np.float32)
    out = model.predict(wav, top_k=3)
    assert out.language.startswith("lang")
    assert len(out.top_languages) == 3
    probs = [p.confidence for p in out.top_languages]
    assert probs == sorted(probs, reverse=True)
    assert 0 < out.confidence <= 1


def test_predict_deterministic(model):
    wav = np.sin(np.arange(8000) * 0.01).astype(np.float32) * 0.3
    a = model.predict(wav)
    b = model.predict(wav)
    assert a.language == b.language
    assert a.confidence == b.confidence


def test_id2label_strips_description(model):
    assert model.id2label[0] == "lang0"


def test_predict_batch_matches_solo(model):
    """Masked batched inference (serving micro-batcher path) must match
    per-clip predict: same argmax, close probabilities, even for rows
    padded up to 2x inside a length bucket."""
    rng = np.random.default_rng(3)
    clips = [
        (rng.standard_normal(16000) * 0.1).astype(np.float32),     # 1 s
        np.sin(np.arange(9000) * 0.02).astype(np.float32) * 0.3,   # 0.56 s
        (rng.standard_normal(26000) * 0.2).astype(np.float32),     # 1.6 s
    ]
    solo = [model.predict(c, top_k=4) for c in clips]
    batched = model.predict_batch(clips, top_k=4)
    for s, b in zip(solo, batched):
        assert b.language == s.language
        assert abs(b.confidence - s.confidence) < 0.05
        assert [p.language for p in b.top_languages] \
            == [p.language for p in s.top_languages]


def test_predict_batch_exact_when_unpadded(model):
    """A clip that exactly fills its bucket takes the same numeric path
    modulo batching; probabilities must agree tightly."""
    wav = np.sin(np.arange(16000) * 0.01).astype(np.float32) * 0.3
    solo = np.asarray(model.predict_device(wav))
    import jax.numpy as jnp
    probs = np.asarray(model._predict_batch_jit(
        model.params, jnp.asarray(wav[None]),
        jnp.asarray([1 + len(wav) // 160], np.int32)))[0]
    assert np.abs(probs - solo).max() < 1e-4
