"""SAM-Audio tests: text encoding, anchors, ODE separation (euler +
midpoint), chunked long-audio crossfade, streaming chunks."""

import numpy as np
import pytest

from tpu_audio.models.sts import load_model
from tpu_audio.models.sts.sam_audio import SAMAudio

from fixtures import make_sam_audio_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_sam_audio_fixture(
        tmp_path_factory.mktemp("sam"))))


def test_factory(model):
    assert isinstance(model, SAMAudio)
    assert model.codec is not None
    assert model.sample_rate == 16000
    # MLX-layout patcher convs were transposed to torch layout
    proj = model.params["transformer"]["x_embedder"]["block"]["block1"][
        "project"]["weight"]
    assert proj.shape == (8, 8, 3)


def test_encode_text(model):
    feats, mask = model.encode_text(["speech", "music noise"])
    assert feats.shape[0] == 2 and feats.shape[2] == 8
    assert bool(mask[0, 1]) and not bool(mask[0, 2])  # padded row masked


def test_separate_shapes(model):
    audio = np.sin(np.arange(1024) / 9).astype(np.float32) * 0.3
    result = model.separate(audio, ["speech"], n_steps=2)
    assert len(result.target) == 1 and len(result.residual) == 1
    assert len(result.target[0]) == len(audio)
    assert np.isfinite(result.target[0]).all()
    assert np.isfinite(result.residual[0]).all()


def test_separate_midpoint(model):
    audio = np.sin(np.arange(512) / 9).astype(np.float32) * 0.3
    r_euler = model.separate(audio, ["speech"], n_steps=2, method="euler")
    r_mid = model.separate(audio, ["speech"], n_steps=2, method="midpoint")
    # different integrators give different outputs
    assert not np.allclose(r_euler.target[0], r_mid.target[0])


def test_separate_deterministic(model):
    audio = np.sin(np.arange(512) / 9).astype(np.float32) * 0.3
    a = model.separate(audio, ["speech"], n_steps=2, seed=1)
    b = model.separate(audio, ["speech"], n_steps=2, seed=1)
    np.testing.assert_allclose(a.target[0], b.target[0], atol=1e-6)


def test_anchors(model):
    audio = np.sin(np.arange(512) / 9).astype(np.float32) * 0.3
    feats = model.codec.encode(audio[None])
    n_frames = feats.shape[1]
    fps = model.sample_rate / model.codec.config.hop_length
    ids, align = SAMAudio.anchors_to_frames([(2, 0.0, 0.01)], n_frames,
                                            fps)
    assert ids.shape == (1, 2) and align.shape == (1, n_frames)
    assert align[0, 0] == 1  # first frame aligned to anchor slot
    r = model.separate(audio, ["speech"], n_steps=2, anchor_ids=ids,
                       anchor_alignment=align)
    assert np.isfinite(r.target[0]).all()


def test_separate_long_crossfade(model):
    audio = np.sin(np.arange(4096) / 9).astype(np.float32) * 0.3
    r = model.separate_long(audio, ["speech"], chunk_seconds=0.1,
                            overlap_seconds=0.03, n_steps=2)
    # crossfaded chunks reassemble to roughly the input length
    assert abs(len(r.target[0]) - len(audio)) < 2048
    assert np.isfinite(r.target[0]).all()


def test_separate_streaming(model):
    audio = np.sin(np.arange(4096) / 9).astype(np.float32) * 0.3
    chunks = list(model.separate_streaming(audio, ["speech"],
                                           chunk_seconds=0.1,
                                           overlap_seconds=0.03,
                                           n_steps=2))
    assert len(chunks) >= 2
    assert chunks[-1][3] is True  # last flag
    total = sum(len(c[0]) for c in chunks)
    assert total > 0
