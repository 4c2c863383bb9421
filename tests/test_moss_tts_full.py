"""MOSS-TTS full-variant tests: delay pattern helpers, processor prompt
assembly (generation + continuation truncation), on-device delay-state
machine, local-transformer channel decode, waveform decode."""

import numpy as np
import pytest

from tpu_audio.core.generation import AudioGenerateParameters
from tpu_audio.models.tts import load_model
from tpu_audio.models.tts.moss_tts_full import (
    MossTTS,
    apply_dedelay_pattern,
    apply_delay_pattern,
)

from fixtures import make_moss_tts_full_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_moss_tts_full_fixture(
        tmp_path_factory.mktemp("moss_delay"))))


@pytest.fixture(scope="module")
def local_model(tmp_path_factory):
    return load_model(str(make_moss_tts_full_fixture(
        tmp_path_factory.mktemp("moss_local"), local=True)))


def test_factory(model, local_model):
    assert isinstance(model, MossTTS)
    assert not model.config.is_local_transformer
    assert local_model.config.is_local_transformer
    assert model.config.n_vq == 2
    assert "language_model" in model.params  # model. prefix stripped
    assert "model" in local_model.params  # local keeps raw layout


def test_delay_pattern_roundtrip():
    codes = np.arange(12).reshape(4, 3) % 7
    delayed = apply_delay_pattern(codes, pad_code=99)
    assert delayed.shape == (6, 3)
    assert delayed[0, 0] == codes[0, 0] and delayed[0, 1] == 99
    assert (apply_dedelay_pattern(delayed) == codes).all()
    assert apply_dedelay_pattern(np.full((1, 3), 0)).shape == (0, 3)


def test_processor_generation_prompt(model):
    proc = model.processor()
    user = proc.build_user_message(text="w1 w2 w3", language="en")
    rows = proc([user], mode="generation")
    cfg = model.config
    assert rows.ndim == 2 and rows.shape[1] == cfg.n_vq + 1
    # no audio reference: every audio channel is pad
    assert (rows[:, 1:] == cfg.audio_pad_code).all()
    # chat template: im_start x2 (user + generation prompt), im_end x1
    assert (rows[:, 0] == cfg.im_start_token_id).sum() == 2
    assert (rows[:, 0] == cfg.im_end_token_id).sum() == 1


def test_processor_reference_delay_alignment(model):
    proc = model.processor()
    cfg = model.config
    codes = (np.arange(8).reshape(4, 2) % cfg.audio_vocab_size).astype(
        np.int32)
    user = proc.build_user_message(text="w1", reference=[codes])
    rows = proc([user], mode="generation")
    text = rows[:, 0]
    start = int(np.flatnonzero(text == cfg.audio_start_token_id)[0])
    end = int(np.flatnonzero(text == cfg.audio_end_token_id)[0])
    # block length = frames + n_vq - 1 slot tokens between start/end
    assert end - start - 1 == 4 + cfg.n_vq - 1
    seg = rows[start + 1:end, 1:]
    assert (apply_dedelay_pattern(seg) == codes).all()
    # user-role slots
    assert (text[start + 1:end] == cfg.audio_user_slot_token_id).all()


def test_processor_continuation_truncation(model):
    proc = model.processor()
    cfg = model.config
    codes = np.ones((5, cfg.n_vq), np.int32)
    user = proc.build_user_message(text="w1")
    asst = proc.build_assistant_message([codes])
    rows = proc([user, asst], mode="continuation")
    # last rows end mid-delay-pattern: final text token is a gen slot
    assert rows[-1, 0] == cfg.audio_assistant_gen_slot_token_id
    # the delay tail (n_vq - 1 rows) was dropped
    gen_rows = proc([user], mode="generation")
    del gen_rows
    full = proc._unified_codes(
        "assistant",
        proc.apply_chat_template("assistant", "<|audio|>", False),
        [codes], truncation=False)
    trunc = proc._unified_codes(
        "assistant",
        proc.apply_chat_template("assistant", "<|audio|>", False),
        [codes], truncation=True)
    assert full.shape[0] - trunc.shape[0] >= cfg.n_vq - 1


def test_generate_delay_ids(model):
    proc = model.processor()
    rows = proc([proc.build_user_message(text="w1 w2")], mode="generation")
    outputs = model.generate_delay_pattern_ids(
        rows, max_new_tokens=8, audio_temperature=0.0, text_temperature=0.0,
        seed=0)
    assert len(outputs) == 1
    start_length, gen = outputs[0]
    assert gen.shape[1] == model.config.n_vq + 1
    assert gen.shape[0] >= start_length
    assert (gen >= 0).all()


def test_generate_delay_continuation_produces_audio(model):
    """Continuation resumes inside an audio span: channels sample
    immediately, so decoded audio is non-empty."""
    proc = model.processor()
    cfg = model.config
    codes = (np.arange(10 * cfg.n_vq).reshape(10, cfg.n_vq)
             % cfg.audio_vocab_size).astype(np.int32)
    conv = [proc.build_user_message(text="w1 w2"),
            proc.build_assistant_message([codes])]
    rows = proc(conv, mode="continuation")
    outputs = model.generate_delay_pattern_ids(
        rows, max_new_tokens=6, audio_temperature=0.8, seed=3)
    _, gen = outputs[0]
    audio = apply_dedelay_pattern(gen[:, 1:])
    assert ((audio != cfg.audio_pad_code).any(axis=1)).sum() > 0
    wav = model.decode_generated(outputs)
    assert wav.ndim == 1 and np.isfinite(wav).all()


def test_generate_end_to_end(model):
    wav = model.generate(
        "w1 w2 w3",
        generation_parameters=AudioGenerateParameters(
            temperature=0.9, top_p=0.9, top_k=10, repetition_penalty=1.0,
            max_tokens=10, seed=1))
    assert wav.ndim == 1
    assert np.isfinite(wav).all()


def test_generate_local_ids(local_model):
    proc = local_model.processor()
    rows = proc([proc.build_user_message(text="w1 w2")], mode="generation")
    cfg = local_model.config
    # local processor appends the audio-start row
    assert rows[-1, 0] == cfg.audio_start_token_id
    # local blocks have no delay-slot padding in the prompt
    outputs = local_model.generate_local_ids(
        rows, max_new_tokens=5, text_temperature=0.0, audio_temperature=0.0,
        seed=0)
    start_length, gen = outputs[0]
    assert gen.shape[1] == cfg.n_vq + 1
    assert gen.shape[0] >= 1


def test_generate_local_end_to_end(local_model):
    wav = local_model.generate(
        "w1 w2",
        generation_parameters=AudioGenerateParameters(
            temperature=0.9, top_p=0.95, top_k=10, repetition_penalty=1.1,
            max_tokens=6, seed=2))
    assert wav.ndim == 1 and np.isfinite(wav).all()


def test_local_n_vq_for_inference(local_model):
    proc = local_model.processor()
    rows = proc([proc.build_user_message(text="w1")], mode="generation")
    outputs = local_model.generate_local_ids(
        rows, max_new_tokens=3, n_vq_for_inference=1,
        text_temperature=0.0, audio_temperature=0.0, seed=0)
    _, gen = outputs[0]
    # inactive channels are filled with 0 (reference pads nextValues)
    n_prompt = rows.shape[0]
    new = gen[-(gen.shape[0] - (n_prompt - int(np.flatnonzero(
        rows[:, 0] == local_model.config.audio_start_token_id)[-1]))):]
    assert (new[:, 2] == 0).all() or new.shape[0] == 0


def test_deterministic(model):
    proc = model.processor()
    rows = proc([proc.build_user_message(text="w2 w3")], mode="generation")
    a = model.generate_delay_pattern_ids(rows, max_new_tokens=6,
                                         audio_temperature=0.9, seed=7)
    b = model.generate_delay_pattern_ids(rows, max_new_tokens=6,
                                         audio_temperature=0.9, seed=7)
    assert (a[0][1] == b[0][1]).all()
