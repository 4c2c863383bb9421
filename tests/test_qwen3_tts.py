"""Qwen3-TTS tests: codec decoder offline/streaming parity, talker macro
step, end-to-end generate + streaming events."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.codecs.qwen3_codec import (
    Qwen3CodecDecoder,
    init_streaming_state,
)
from tpu_audio.core.generation import AudioGenerateParameters, AudioGenerationKind
from tpu_audio.models.tts import load_model
from tpu_audio.models.tts.qwen3_tts import Qwen3TTS

from fixtures import make_qwen3_tts_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = make_qwen3_tts_fixture(tmp_path_factory.mktemp("qwen3tts"))
    return load_model(str(path), dtype=jnp.float32)


def test_factory(model):
    assert isinstance(model, Qwen3TTS)
    assert model.codec is not None
    assert model.config.talker.num_code_groups == 4
    assert model.config.tts_model_type == "custom_voice"


def test_codec_offline_decode_shape(model):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 32, (1, 4, 10)).astype(np.int32)
    wav = np.asarray(model.codec.decode(codes))
    # total upsample = 2 (ratio) * 2 * 2 (rates) = 8
    assert wav.shape == (1, 80)
    assert np.abs(wav).max() <= 1.0
    assert np.isfinite(wav).all()


def test_codec_streaming_matches_offline(model):
    """Chunked streaming decode must be frame-identical to one-shot decode
    (the causal-conv state-carry invariant; reference streamingStep)."""
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 32, (1, 4, 12)).astype(np.int32)
    offline = np.asarray(model.codec.decode(codes))

    model.codec.reset_streaming_state()
    chunks = []
    for s, e in [(0, 3), (3, 4), (4, 9), (9, 12)]:
        chunks.append(np.asarray(model.codec.streaming_step(codes[:, :, s:e])))
    streamed = np.concatenate(chunks, axis=-1)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, atol=1e-5)


def test_prepare_generation_inputs(model):
    embeds, trailing, pad = model.prepare_generation_inputs("hello world")
    assert embeds.ndim == 3 and embeds.shape[0] == 1
    assert trailing.shape[0] == 1
    assert pad.shape[:2] == (1, 1)
    # custom voice speaker path
    e2, _, _ = model.prepare_generation_inputs("hello", speaker="vivian")
    assert e2.shape[1] == embeds.shape[1] + 1  # speaker embed inserted


def test_generate_end_to_end(model):
    params = AudioGenerateParameters(max_tokens=6, temperature=0.0, seed=0)
    audio = model.generate("hello world", generation_parameters=params)
    assert audio.ndim == 1
    assert len(audio) % 8 == 0 and len(audio) > 0
    assert np.isfinite(audio).all()


def test_generate_deterministic(model):
    params = AudioGenerateParameters(max_tokens=5, temperature=0.0, seed=1)
    a = model.generate("hello", generation_parameters=params)
    b = model.generate("hello", generation_parameters=params)
    np.testing.assert_array_equal(a, b)


def test_generate_stream_chunks_match_offline(model):
    params = AudioGenerateParameters(max_tokens=6, temperature=0.0, seed=0,
                                     streaming_interval=0.16)  # 2 codec frames
    offline = model.generate("hello world", generation_parameters=params)
    events = list(model.generate_stream("hello world",
                                        generation_parameters=params))
    audio_chunks = [e.audio for e in events if e.kind == AudioGenerationKind.AUDIO]
    assert len(audio_chunks) >= 2
    streamed = np.concatenate(audio_chunks)
    np.testing.assert_allclose(streamed, offline, atol=1e-5)
    info = events[-1].info
    assert info.generation_token_count == len(offline) // 8


def test_voice_parsing(model):
    assert model._parse_voice("vivian, speak slowly") == ("vivian", "speak slowly")
    assert model._parse_voice("vivian") == ("vivian", None)
    assert model._parse_voice(None) == (None, None)


# -- ref-audio ICL voice cloning (Qwen3TTS.swift:267-302, 699-836) -----------


@pytest.fixture(scope="module")
def icl_model(tmp_path_factory):
    path = make_qwen3_tts_fixture(tmp_path_factory.mktemp("q3tts_icl"),
                                  with_icl=True)
    return Qwen3TTS.from_pretrained(str(path))


def _ref_audio(n=2048):
    rng = np.random.default_rng(7)
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


def test_icl_components_load(icl_model):
    assert icl_model.speaker_encoder is not None
    assert icl_model.codec_encoder is not None
    emb = np.asarray(icl_model.extract_speaker_embedding(_ref_audio()))
    assert emb.shape == (1, 16) and np.isfinite(emb).all()
    codes = np.asarray(icl_model.codec_encoder.encode(_ref_audio()))
    # 2048 samples / 16x seanet / stride-2 downsample = 64 frames, 4 books
    assert codes.shape[1] == 4 and codes.shape[2] == 64
    assert codes.min() >= 0 and codes.max() < 32


def test_ref_audio_changes_prefill(icl_model):
    """Providing ref audio must change the talker prefill (the r1 build
    silently ignored it)."""
    plain, _, _ = icl_model.prepare_generation_inputs("hello world")
    icl, trailing, _, ref_codes = icl_model.prepare_icl_generation_inputs(
        "hello world", _ref_audio(), "hello")
    assert icl.shape[1] > plain.shape[1]
    assert ref_codes.shape[1] == 4
    # speaker embedding adds one prefix position vs the no-speaker layout:
    # prefix = role(3) + pads+bos aligned to codec prefill(3+spk1+2) - 1
    assert trailing.shape[1] == 1  # all target text is in the prompt


def test_generate_with_ref_audio_runs(icl_model):
    params = AudioGenerateParameters(max_tokens=8, temperature=0.0)
    wav = icl_model.generate("hello world", ref_audio=_ref_audio(),
                             ref_text="hello", generation_parameters=params)
    assert wav.ndim == 1 and len(wav) > 0 and np.isfinite(wav).all()
    # differs from the uncloned output (conditioning reaches the talker)
    plain = icl_model.generate("hello world", generation_parameters=params)
    assert len(wav) != len(plain) or not np.allclose(wav[: len(plain)], plain)


def test_ref_audio_without_text_raises(icl_model):
    from tpu_audio.core.generation import AudioGenerationError

    with pytest.raises(AudioGenerationError, match="BOTH"):
        icl_model.generate("hi", ref_audio=_ref_audio())


def test_ref_audio_without_encoder_raises(model):
    from tpu_audio.core.generation import AudioGenerationError

    with pytest.raises(AudioGenerationError, match="encoder"):
        model.generate("hi", ref_audio=_ref_audio(), ref_text="hi")


def test_ref_context_cached(icl_model):
    a = _ref_audio()
    ctx1 = icl_model._reference_audio_context(a)
    ctx2 = icl_model._reference_audio_context(a)
    assert ctx1 is ctx2


def test_init_random_params_matches_loaded_tree(model):
    """The benchmark random initializers must produce byte-for-byte the same
    tree structure and leaf shapes as ``from_pretrained`` builds from a real
    checkpoint — so on-device random-weight benches run the same graphs."""
    import jax

    from tpu_audio.codecs import qwen3_codec
    from tpu_audio.models import llama
    from tpu_audio.models.tts import qwen3_tts

    rand = qwen3_tts.init_random_params(model.config, dtype=jnp.float32)
    rand = llama.fuse_projections(rand)
    rand["code_predictor"] = llama.fuse_projections(rand["code_predictor"])
    a = jax.tree.map(lambda x: tuple(x.shape), model.params)
    b = jax.tree.map(lambda x: tuple(x.shape), rand)
    assert jax.tree.structure(a) == jax.tree.structure(b)
    assert a == b

    rd = qwen3_codec.init_random_params(model.codec.config)
    ca = jax.tree.map(lambda x: tuple(x.shape), model.codec.params)
    cb = jax.tree.map(lambda x: tuple(x.shape), rd)
    assert jax.tree.structure(ca) == jax.tree.structure(cb)
    assert ca == cb
