"""S3TokenizerV2 tests: FSQ range, 4x downsample, pad invariance."""

import numpy as np
import pytest

from tpu_audio.codecs import load_codec
from tpu_audio.codecs.s3_tokenizer import S3TokenizerV2

from fixtures import make_s3_tokenizer_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_codec(str(make_s3_tokenizer_fixture(
        tmp_path_factory.mktemp("s3"))))


def test_factory(model):
    assert isinstance(model, S3TokenizerV2)
    assert model.config.n_codebook_size == 6561
    blk = model.params["encoder"]["blocks"]["0"]["attn"]["fsmn_block"]
    assert np.asarray(blk["weight"]).shape == (16, 1, 7)  # torch depthwise


def test_tokenize_rate_and_range(model):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    toks = model.tokenize(audio)
    # 1s @ 16k -> ~100 mel frames -> 25 tokens (4x downsample)
    assert 24 <= len(toks) <= 26
    assert toks.min() >= 0 and toks.max() < 6561


def test_fsq_ids_base3(model):
    """FSQ ids must be representable in base-3 with 8 digits."""
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(8000) * 0.5).astype(np.float32)
    toks = model.tokenize(audio)
    assert (toks < 3 ** 8).all()


def test_pad_invariance(model):
    """Bucket padding must not change the valid tokens."""
    rng = np.random.default_rng(2)
    a = (rng.standard_normal(9000) * 0.1).astype(np.float32)
    import jax.numpy as jnp

    mel = model.log_mel(a)
    t = mel.shape[0]
    outs = []
    for bucket in (64, 128):
        assert bucket >= t
        padded = np.zeros((1, bucket, mel.shape[1]), np.float32)
        padded[0, :t] = mel
        toks, lens = model._forward(model.params, jnp.asarray(padded),
                                    jnp.asarray([t], jnp.int32))
        outs.append(np.asarray(toks)[0, : int(lens[0])])
    np.testing.assert_array_equal(outs[0], outs[1])


def test_empty_audio(model):
    assert len(model.tokenize(np.zeros(10, np.float32))) == 0


def test_decode_raises(model):
    with pytest.raises(NotImplementedError):
        model.decode(np.zeros(5, np.int32))
