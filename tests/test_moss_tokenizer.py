"""MOSS audio tokenizer tests: patching, RLFQ, transformer stages."""

import numpy as np
import pytest

from tpu_audio.codecs import load_codec
from tpu_audio.codecs.moss_tokenizer import MossAudioTokenizer, _patch

from fixtures import make_moss_tokenizer_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_codec(str(make_moss_tokenizer_fixture(
        tmp_path_factory.mktemp("moss"))))


def test_patch_roundtrip():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 3)).astype(np.float32))
    down = _patch(x, 4, down=True)
    assert down.shape == (2, 3, 12)
    up = _patch(down, 4, down=False)
    np.testing.assert_allclose(np.asarray(up), np.asarray(x), atol=1e-6)


def test_factory_sanitize(model):
    assert isinstance(model, MossAudioTokenizer)
    p = model.params
    # weight norm folded on quantizer projections
    assert "weight" in p["quantizer"]["input_proj"]
    assert "weight_v" not in p["quantizer"]["input_proj"]
    # in_projs.0 renamed
    layer = p["encoder"]["1"]["transformer"]["layers"]["0"]
    assert "in_proj" in layer["self_attn"]
    assert "0" in layer["ffn"] and "2" in layer["ffn"]


def test_encode_decode_shapes(model):
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(64) * 0.1).astype(np.float32)
    codes = np.asarray(model.encode(audio))
    assert codes.shape == (2, 1, 16)  # nq, B, 64/patch4
    assert codes.min() >= 0 and codes.max() < 16
    wav = model.decode(codes)
    assert wav.shape == (1, 64)
    assert np.isfinite(wav).all()


def test_n_quantizers_subset(model):
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(32) * 0.1).astype(np.float32)
    c1 = np.asarray(model.encode(audio, n_quantizers=1))
    c2 = np.asarray(model.encode(audio))
    assert c1.shape[0] == 1 and c2.shape[0] == 2
    np.testing.assert_array_equal(c1[0], c2[0])  # level 0 shared


def test_deterministic(model):
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(48) * 0.1).astype(np.float32)
    a = model.reconstruct(audio)
    b = model.reconstruct(audio)
    np.testing.assert_array_equal(a, b)
