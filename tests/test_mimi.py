"""Mimi codec tests: shapes, roundtrip, and the streaming-vs-offline parity
invariants for both encode and decode."""

import numpy as np
import pytest

from tpu_audio.codecs import load_codec
from tpu_audio.codecs.mimi import Mimi, MimiStreamingDecoder

from fixtures import make_mimi_fixture


@pytest.fixture(scope="module")
def mimi(tmp_path_factory):
    return Mimi.from_pretrained(
        str(make_mimi_fixture(tmp_path_factory.mktemp("mimi"))))


def test_factory(tmp_path):
    codec = load_codec(str(make_mimi_fixture(tmp_path / "m")))
    assert isinstance(codec, Mimi)


def test_encode_decode_shapes(mimi):
    # hop = ratios 2*2 * downsample stride 2 = 8 samples per frame
    audio = np.random.default_rng(0).standard_normal(64).astype(np.float32) * 0.2
    codes = np.asarray(mimi.encode(audio))
    assert codes.shape == (1, 4, 8)
    assert codes.min() >= 0 and codes.max() < 16
    wav = np.asarray(mimi.decode(codes))
    assert wav.shape == (1, 64)
    assert np.isfinite(wav).all()


def test_reconstruct(mimi):
    audio = np.random.default_rng(1).standard_normal(128).astype(np.float32) * 0.2
    out = np.asarray(mimi.reconstruct(audio))
    assert out.shape[-1] == 128


def test_streaming_decode_matches_offline(mimi):
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 16, (1, 4, 12)).astype(np.int32)
    offline = np.asarray(mimi.decode(codes))

    dec = MimiStreamingDecoder(mimi)
    chunks = [dec.decode_frames(codes[:, :, s:e])
              for s, e in [(0, 3), (3, 4), (4, 9), (9, 12)]]
    streamed = np.concatenate([c for c in chunks if c.size], axis=-1)
    n = streamed.shape[-1]
    assert n > 0
    np.testing.assert_allclose(streamed, offline[:, :n], atol=1e-4)


def test_streaming_encode_matches_offline(mimi):
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(96) * 0.2).astype(np.float32)
    offline = np.asarray(mimi.encode(audio))

    mimi.reset_state()
    pieces = []
    for s, e in [(0, 24), (24, 40), (40, 96)]:
        c = np.asarray(mimi.encode_step(audio[None, s:e]))
        if c.shape[-1]:
            pieces.append(c)
    streamed = np.concatenate(pieces, axis=-1)
    n = streamed.shape[-1]
    assert n > 0
    np.testing.assert_array_equal(streamed, offline[:, :, :n])
