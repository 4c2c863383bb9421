"""MOSS-Transcribe-Diarize tests: frontend math, time markers, injection,
segment parsing, end-to-end decode."""

import numpy as np
import pytest

from tpu_audio.models.stt import load_model
from tpu_audio.models.stt.moss_diarize import MossTranscribeDiarize

from fixtures import make_moss_diarize_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_moss_diarize_fixture(
        tmp_path_factory.mktemp("mossdiar"))))


def test_factory(model):
    assert isinstance(model, MossTranscribeDiarize)
    assert model.config.audio_token_id == 94
    assert model.config.text.qk_norm
    assert model.config.audio_tokens_per_second == 12.5
    # digit tokens resolved from the tokenizer
    assert model._digit_ids["5"] == 85


def test_sanitize_vq_typo(model):
    # the checkpoint's "vq_adwaptor.layers.N" nests into fc1/fc2/norm
    assert set(model.params["vq_adaptor"]) == {"fc1", "fc2", "norm"}
    assert model.params["vq_adaptor"]["fc1"]["weight"].shape == (24, 64)


def test_audio_token_length(model):
    # (n-1) // (160*2*4) + 1
    assert model._audio_token_length(16000) == 13
    assert model._audio_token_length(480000) == 375
    assert model._audio_token_length(1) == 1


def test_audio_span_time_markers(model):
    # 75 tokens = 6 s: one marker ("5") after 62 pads
    span = model._audio_span_ids(75)
    assert len(span) == 76
    assert span[62] == 85  # digit "5"
    assert span.count(94) == 75
    # short spans have no markers
    assert model._audio_span_ids(13) == [94] * 13


def test_build_prompt_counts(model):
    ids = np.asarray([model.build_prompt(75)], np.int32)
    assert int((ids == 94).sum()) == 75
    # marker digit present in the prompt
    assert 85 in ids[0].tolist()


def test_encode_audio_shape(model):
    audio = np.sin(np.arange(16000) / 40).astype(np.float32)
    feats = model.encode_audio(audio)
    assert feats.shape == (13, 24)


def test_inject_audio_noncontiguous(model):
    ids = np.asarray([model.build_prompt(75)], np.int32)
    feats = np.full((75, 24), 7.0, np.float32)
    embeds = model._inject_audio(ids, feats)
    pos = np.where(ids[0] == 94)[0]
    np.testing.assert_allclose(embeds[0, pos], 7.0, atol=1e-2)
    # the digit marker between pads keeps its text embedding
    marker = [i for i in range(pos[0], pos[-1]) if i not in set(pos.tolist())]
    assert marker and abs(float(embeds[0, marker[0], 0])) < 7.0


def test_generate_end_to_end(model):
    from tpu_audio.core.generation import STTGenerateParameters

    audio = np.sin(np.arange(8000) / 25).astype(np.float32) * 0.3
    out = model.generate(audio, STTGenerateParameters(max_tokens=8))
    assert out.prompt_token_count > 0
    assert out.generation_token_count <= 8
    assert out.total_time > 0


def test_offset_tags():
    shifted = MossTranscribeDiarize._offset_tags(
        "[0.00][S01] hi [2,50] x [bad]", 10.0)
    assert shifted == "[10.00][S01] hi [12.50] x [bad]"
    assert MossTranscribeDiarize._offset_tags("[1.00]", 0.0) == "[1.00]"


def test_parse_segments():
    segs = MossTranscribeDiarize._parse_segments(
        "[0.00][S01] hello there [2.50]\n[3.00][S02] bye [4.00]",
        fallback_end=5.0)
    assert len(segs) == 2
    assert segs[0].speaker == "S01"
    assert segs[0].text == "[S01] hello there"
    assert segs[1].start == 3.0 and segs[1].end == 4.0
    # offset applied
    segs = MossTranscribeDiarize._parse_segments(
        "[0.00][S01] a [1.00]", fallback_end=1.0, offset=30.0)
    assert segs[0].start == 30.0
    # no tags -> single fallback segment
    segs = MossTranscribeDiarize._parse_segments("plain", fallback_end=2.0)
    assert len(segs) == 1 and segs[0].end == 2.0
    assert MossTranscribeDiarize._parse_segments("", fallback_end=1.0) == []


def test_degenerate_tail_stop(model):
    """The on-device <=3-unique-in-24 guard stops runaway repetition."""
    import jax
    import jax.numpy as jnp

    from tpu_audio.models import llama

    # force degenerate logits by zeroing the LM: argmax is constant
    zeroed = jax.tree.map(jnp.zeros_like, model.params["language_model"])
    ids = np.asarray([model.build_prompt(13)], np.int32)
    feats = np.zeros((13, 24), np.float32)
    embeds = model._inject_audio(ids, feats)
    cache = llama.make_cache(model.config.text, 1,
                             ids.shape[1] + 65, model.dtype)
    loop = model._get_loop(64, 0.0)
    tokens, count = loop(zeroed, jnp.zeros_like(
        jnp.asarray(embeds, model.dtype)), cache, jax.random.PRNGKey(0))
    assert int(count) <= 25  # stopped by the guard, not max_tokens
