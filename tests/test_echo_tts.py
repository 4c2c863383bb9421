"""EchoTTS tests: text frontend, PCA roundtrip, dual-CFG Euler sampling,
flattening-point crop, end-to-end synth through FishS1DAC."""

import numpy as np
import pytest

from tpu_audio.core.generation import AudioGenerateParameters
from tpu_audio.models.tts import load_model
from tpu_audio.models.tts.echo_tts import (
    EchoTTS,
    encode_text,
    normalize_text_prompt,
)

from fixtures import make_echo_tts_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_echo_tts_fixture(
        tmp_path_factory.mktemp("echo"))))


def test_factory(model):
    assert isinstance(model, EchoTTS)
    assert model.codec is not None
    assert model.pca_components.shape == (6, 8)
    assert model.latent_scale == 0.5


def test_normalize_text_prompt():
    assert normalize_text_prompt("hi there") == "[S1] hi there"
    assert normalize_text_prompt("[S2] yo") == "[S2] yo"
    assert normalize_text_prompt("a: b; c") == "[S1] a, b, c"


def test_encode_text_bytes():
    ids, mask = encode_text("ab", 64, normalize=False)
    assert ids[0].tolist() == [0, 97, 98]  # BOS + utf-8 bytes
    assert mask.all()
    ids, _ = encode_text("x" * 100, 10, normalize=False)
    assert ids.shape[1] == 10  # truncated to max length


def test_pca_roundtrip(model):
    import jax.numpy as jnp

    zq = np.random.default_rng(0).standard_normal((1, 5, 8)).astype(
        np.float32)
    lat = ((jnp.asarray(zq) - model.pca_mean)
           @ model.pca_components.T) * model.latent_scale
    assert lat.shape == (1, 5, 6)


def test_speaker_latent(model):
    audio = np.sin(np.arange(640) / 5).astype(np.float32) * 0.3
    lat, mask = model.speaker_latent(audio)
    # 640 samples / ds 8 = 80 frames, clipped to max_speaker_latent_length
    assert lat.shape[1] == 64 and lat.shape[2] == 6
    assert mask.all()


def test_generate_latents_shapes(model):
    lat = model.generate_latents("hi", seed=0, num_steps=2,
                                 sequence_length=8)
    assert lat.shape == (1, 8, 6)
    assert np.isfinite(lat).all()


def test_sampling_deterministic(model):
    a = model.generate_latents("hi", seed=3, num_steps=2, sequence_length=8)
    b = model.generate_latents("hi", seed=3, num_steps=2, sequence_length=8)
    np.testing.assert_allclose(a, b, atol=1e-6)
    c = model.generate_latents("hi", seed=4, num_steps=2, sequence_length=8)
    assert not np.allclose(a, c)


def test_find_flattening_point():
    lat = np.concatenate([
        np.random.default_rng(0).standard_normal((30, 6)).astype(np.float32),
        np.zeros((40, 6), np.float32)])
    fp = EchoTTS.find_flattening_point(lat)
    assert 25 <= fp <= 45


def test_generate_end_to_end(model):
    audio = model.generate(
        "hello", generation_parameters=AudioGenerateParameters(
            max_tokens=8))
    assert audio.ndim == 1
    assert len(audio) <= 8 * 8  # seq_len * downsample factor
    assert np.isfinite(audio).all()


def test_generate_with_ref_audio(model):
    ref = np.sin(np.arange(1280) / 7).astype(np.float32) * 0.4
    audio = model.generate(
        "hello", ref_audio=ref,
        generation_parameters=AudioGenerateParameters(max_tokens=8))
    assert np.isfinite(audio).all()
