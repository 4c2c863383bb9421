"""MossFormer2-SE tests: Kaldi features, FLASH attention, mask + OLA."""

import numpy as np
import pytest

from tpu_audio.models.sts import load_model
from tpu_audio.models.sts.mossformer2_se import (
    MossFormer2SE,
    MossFormer2SEConfig,
    kaldi_deltas,
    kaldi_fbank,
)

from fixtures import make_mossformer2_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_mossformer2_fixture(
        tmp_path_factory.mktemp("mossformer"))))


def test_factory(model):
    assert isinstance(model, MossFormer2SE)
    # mossformer.* lifted under model.
    assert "mossformer" in model.params["model"]
    enc = model.params["model"]["mossformer"]["conv1d_encoder"]["weight"]
    assert np.asarray(enc).shape == (16, 24, 1)  # [O,1,I] -> [O,I,1]


def test_kaldi_fbank_shapes():
    import jax.numpy as jnp

    cfg = MossFormer2SEConfig(sample_rate=16000, win_len=320, win_inc=160,
                              num_mels=8)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal(1600).astype(np.float32) * 1000)
    fb = kaldi_fbank(audio, cfg)
    assert fb.shape == (9, 8)  # 1 + (1600-320)//160
    assert np.isfinite(np.asarray(fb)).all()
    # sub-window audio -> empty
    assert kaldi_fbank(jnp.zeros(100), cfg).shape == (0, 8)


def test_kaldi_deltas_linear_ramp():
    """Deltas of a linear ramp equal the slope (away from edges)."""
    import jax.numpy as jnp

    t = np.arange(20, dtype=np.float32)
    feats = jnp.asarray(np.stack([t, 2 * t], axis=1))
    d = np.asarray(kaldi_deltas(feats))
    np.testing.assert_allclose(d[5:15, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(d[5:15, 1], 2.0, atol=1e-5)


def test_mask_shape_and_range(model):
    import jax.numpy as jnp
    from tpu_audio.models.sts.mossformer2_se import mask_net_forward

    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((1, 12, 24)).astype(np.float32))
    mask = np.asarray(mask_net_forward(model.params, feats, model.config))
    assert mask.shape == (1, 12, 161)
    assert (mask >= 0).all()  # relu output


def test_enhance_end_to_end(model):
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    out = model.enhance(audio)
    assert out.shape == (16000,)
    assert np.isfinite(out).all()
    # deterministic
    out2 = model.enhance(audio)
    np.testing.assert_array_equal(out, out2)


def test_enhance_group_padding(model):
    """Lengths that don't divide the attention group size still work."""
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(5000) * 0.1).astype(np.float32)
    out = model.enhance(audio)
    assert out.shape == (5000,)
    assert np.isfinite(out).all()


def test_enhance_streaming_chunks(model):
    rng = np.random.default_rng(4)
    audio = (rng.standard_normal(12000) * 0.1).astype(np.float32)
    chunks = list(model.enhance_streaming(audio, chunk_seconds=0.25))
    assert len(chunks) == 3
    assert sum(len(c) for c in chunks) == 12000
