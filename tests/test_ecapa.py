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
