"""Qwen3 forced aligner tests: text processor, LIS repair, alignment."""

import numpy as np
import pytest

from tpu_audio.models.stt import load_model
from tpu_audio.models.stt.qwen3_aligner import (
    ForceAlignProcessor,
    Qwen3ForcedAligner,
)

from fixtures import make_qwen3_aligner_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    # dir name carries the forced-aligner marker, like real repo ids
    return load_model(str(make_qwen3_aligner_fixture(
        tmp_path_factory.mktemp("qwen3-forced-aligner"))))


@pytest.fixture(scope="module")
def proc():
    return ForceAlignProcessor()


def test_factory_detects_by_name(model):
    assert isinstance(model, Qwen3ForcedAligner)
    assert "lm_head" in model.params
    assert model.config.classify_num == 40


def test_tokenize_space_lang(proc):
    assert proc.tokenize_space_lang("Hello, world! it's 42.") == [
        "Hello", "world", "it's", "42"]


def test_tokenize_chinese_mixed(proc):
    # CJK chars split individually; latin runs flush as words
    assert proc.tokenize_chinese_mixed("你好ab 世c!") == [
        "你", "好", "ab", "世", "c"]


def test_encode_timestamp_layout(proc):
    words, text = proc.encode_timestamp("a b", "English")
    assert words == ["a", "b"]
    assert text == ("<|audio_start|><|audio_pad|><|audio_end|>"
                    "a<timestamp><timestamp>b<timestamp><timestamp>")


def test_fix_timestamp_monotonic_passthrough(proc):
    assert proc.fix_timestamp([0.0, 80.0, 160.0, 160.0]) == [0, 80, 160, 160]


def test_fix_timestamp_small_anomaly(proc):
    # single outlier patched from the nearest valid neighbor
    assert proc.fix_timestamp([0.0, 80.0, 40.0, 160.0]) == [0, 80, 80, 160]


def test_fix_timestamp_large_anomaly_interpolates(proc):
    # a 3-long broken run is linearly interpolated between anchors
    out = proc.fix_timestamp([0.0, 400.0, 300.0, 200.0, 800.0])
    assert out[0] == 0 and out[-1] == 800
    assert all(out[i] <= out[i + 1] for i in range(len(out) - 1))


def test_generate_alignment(model):
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(16000).astype(np.float32) * 0.1
    res = model.generate(audio, text="w1 w2 w3", language="English")
    assert [i.text for i in res.items] == ["w1", "w2", "w3"]
    starts = [i.start_time for i in res.items]
    ends = [i.end_time for i in res.items]
    # fixed timestamps are non-decreasing across the word sequence
    seq = [t for pair in zip(starts, ends) for t in pair]
    assert all(a <= b for a, b in zip(seq, seq[1:]))
    assert res.prompt_tokens > 0


def test_generate_requires_text(model):
    with pytest.raises(ValueError):
        model.generate(np.zeros(1600, np.float32))


def test_padding_bucket_invariance(model):
    """Trailing pad in the classify bucket must not change predictions."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    embeds = rng.standard_normal((1, 10, 24)).astype(np.float32) * 0.1
    short = np.asarray(model._classify(
        model.params, jnp.asarray(embeds, model.dtype)))[0]
    padded = np.pad(embeds, ((0, 0), (0, 54), (0, 0)))
    long = np.asarray(model._classify(
        model.params, jnp.asarray(padded, model.dtype)))[0]
    np.testing.assert_array_equal(short, long[:10])
