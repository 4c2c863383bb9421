"""FishSpeech dual-AR TTS tests: batching, prompt grids, embed scaling,
end-to-end generation through the FishS1DAC codec."""

import numpy as np
import pytest

from tpu_audio.core.generation import AudioGenerateParameters
from tpu_audio.models.tts import load_model
from tpu_audio.models.tts.fish_speech import (
    FishSpeech,
    adjust_speed,
    generation_batches,
    split_text_into_batches,
)

from fixtures import make_fish_speech_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_fish_speech_fixture(
        tmp_path_factory.mktemp("fish"))))


def test_factory(model):
    assert isinstance(model, FishSpeech)
    assert model.config.num_codebooks == 3
    assert model._im_end_id == 61
    assert model.codec is not None


def test_semantic_bias(model):
    bias = model._sem_bias
    assert bias.shape == (128,)
    assert bias[64] == 0.0 and bias[95] == 0.0 and bias[61] == 0.0
    assert bias[0] < -1e8 and bias[96] < -1e8


def test_split_text_into_batches():
    assert split_text_into_batches("", 10) == []
    assert split_text_into_batches("short", 10) == ["short"]
    parts = split_text_into_batches("aaa bbb ccc ddd", 8)
    assert "".join(parts) == "aaa bbb ccc ddd"
    assert all(len(p.encode()) <= 8 for p in parts)


def test_generation_batches_speakers():
    text = "<|speaker:0|>hello there<|speaker:1|>general kenobi"
    batches = generation_batches(text, 200)
    assert len(batches) == 1  # grouped into one 2-speaker batch
    assert "<|speaker:0|>" in batches[0] and "<|speaker:1|>" in batches[0]
    # byte budget forces separate batches
    batches = generation_batches(text, 20)
    assert len(batches) >= 2


def test_adjust_speed():
    audio = np.arange(100, dtype=np.float32)
    fast = adjust_speed(audio, 2.0)
    assert len(fast) == 50
    assert np.allclose(adjust_speed(audio, 1.0), audio)


def test_prompt_grid_structure(model):
    grid = model.build_prompt_grid("hello world")
    assert grid.shape[0] == 4  # K+1 rows
    ids = grid[0].tolist()
    assert ids.count(60) == 3  # system/user/assistant <|im_start|>
    assert ids[-1] == 62  # ends with <|voice|>
    assert (grid[1:] == 0).all()  # no VQ parts -> codebook rows zero


def test_prompt_grid_with_ref(model):
    ref_codes = np.ones((3, 5), np.int32) * 2
    grid = model.build_prompt_grid("hello", ref_codes=ref_codes,
                                   ref_text="world")
    # semantic row carries codes[0] + semantic_start inside the VQ span
    assert (grid[0] == 2 + 64).sum() == 5
    assert (grid[1] == 2).sum() >= 5


def test_embed_grid_scaling(model):
    import jax.numpy as jnp

    from tpu_audio.models.tts.fish_speech import embed_grid

    # semantic-range position: (sem_emb + vq_sum) / sqrt(K+1)
    grid = np.zeros((1, 4, 2), np.int32)
    grid[0, 0, 0] = 10   # plain text token
    grid[0, 0, 1] = 70   # semantic token (in range 64..95)
    grid[0, 1:, 1] = 3
    out = np.asarray(embed_grid(model.params, jnp.asarray(grid),
                                model.config))
    emb = np.asarray(model.params["embeddings"]["weight"])
    np.testing.assert_allclose(out[0, 0], emb[10], atol=1e-5)
    assert not np.allclose(out[0, 1], emb[70], atol=1e-4)


def test_generate_end_to_end(model):
    audio = model.generate(
        "hello world", generation_parameters=AudioGenerateParameters(
            max_tokens=6, temperature=0.0))
    assert audio.ndim == 1
    # every frame decodes to frame_length samples (8 here)
    assert len(audio) % 8 == 0 and len(audio) > 0


def test_generate_stream_events(model):
    events = list(model.generate_stream(
        "hello world",
        generation_parameters=AudioGenerateParameters(
            max_tokens=6, temperature=0.0, streaming_interval=2.0)))
    kinds = [e.kind.name for e in events]
    assert "AUDIO" in kinds and kinds[-1] == "INFO"


def test_ref_audio_cloning_path(model):
    ref = np.sin(np.arange(400) / 10).astype(np.float32)
    audio = model.generate(
        "hello", ref_audio=ref, ref_text="world",
        generation_parameters=AudioGenerateParameters(
            max_tokens=4, temperature=0.0))
    assert len(audio) > 0
