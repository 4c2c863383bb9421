"""HiggsAudio tokenizer tests (decode path)."""

import numpy as np
import pytest

from tpu_audio.codecs import load_codec
from tpu_audio.codecs.higgs import HiggsAudioTokenizer

from fixtures import make_higgs_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_codec(str(make_higgs_fixture(tmp_path_factory.mktemp("hg"))))


def test_factory_sanitize(model):
    assert isinstance(model, HiggsAudioTokenizer)
    p = model.params
    assert "fc1" not in p and "semantic_model" not in p
    q = p["quantizer"]["quantizers"]["0"]["codebook"]
    assert "weight" in q and "embed_avg" not in q


def test_decode_shapes(model):
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 16, size=(10, 2)).astype(np.int32)
    wav = model.decode(tokens)
    # downsample factor 8 (strides 4*2): 10 frames -> 80 samples
    assert wav.shape == (80,)
    assert np.isfinite(wav).all()


def test_decode_batched(model):
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 16, size=(2, 6, 2)).astype(np.int32)
    wav = model.decode(tokens)
    assert wav.shape == (2, 48)
    single = model.decode(tokens[0])
    np.testing.assert_allclose(wav[0], single, atol=1e-5)


def test_codebooks_contribute(model):
    rng = np.random.default_rng(2)
    t0 = rng.integers(0, 16, size=(6, 2)).astype(np.int32)
    t1 = t0.copy()
    t1[:, 1] = (t1[:, 1] + 5) % 16
    assert not np.allclose(model.decode(t0), model.decode(t1))


def test_encode_acoustic_shapes_and_range(model):
    """encodeAcoustic parity (HiggsAudioTokenizer.swift:370-374):
    downsample by prod(ratios), K codebooks, indices within codebook."""
    audio = np.sin(np.linspace(0, 40, 64, dtype=np.float32))
    codes = model.encode_acoustic(audio)
    assert codes.shape == (64 // 8, 2)  # ratios (4,2) -> /8, 2 codebooks
    assert codes.dtype == np.int32
    assert (codes >= 0).all() and (codes < 16).all()
    # batched input keeps the batch dim; encode() is the same surface
    b = model.encode(np.stack([audio, audio * 0.5]))
    assert b.shape == (2, 8, 2)
    np.testing.assert_array_equal(b[0], codes)


def test_encode_decode_roundtrip_deterministic(model):
    audio = np.sin(np.linspace(0, 40, 64, dtype=np.float32))
    c1 = model.encode_acoustic(audio)
    c2 = model.encode_acoustic(audio)
    np.testing.assert_array_equal(c1, c2)
    wav = model.decode(c1)
    assert wav.shape == (64,)  # decoder upsamples back by 8
    assert np.isfinite(wav).all()
