"""Pinned-expected-value regression tests for the full model zoo.

Companion to test_codec_regression.py, extending the reference's
hardcoded-golden-vector precedent (MLXAudioVADTests.swift:74-142,
MLXAudioSTSTests.swift:311) across every VAD / STS / LID / G2P / TTS / STT
family: each model runs a deterministic input through deterministic fixture
weights via its public generate/predict path and must keep reproducing the
committed values in tests/golden/zoo_goldens.json.

Regenerate intentionally with: python tests/golden/regen_zoo_goldens.py
"""

import importlib.util
import json
from pathlib import Path

import numpy as np
import pytest

GOLDEN_DIR = Path(__file__).parent / "golden"

FAMILIES = [
    "silero_probs", "sortformer_speaker_probs", "fsmn_scores",
    "smart_turn_probability", "mossformer2_enhance", "sam_audio_target",
    "ecapa_lid_scores", "byt5_g2p_hello", "whisper_text_bytes",
    "parakeet_text_bytes", "qwen3_asr_audio_feats", "qwen3_asr_text_bytes",
    "sensevoice_text_bytes",
    "canary_text_bytes", "nemotron_text_bytes", "llama_tts_generate",
    "soprano_generate", "kokoro_generate", "kitten_generate", "csm_generate",
    "glm_asr_text_bytes", "granite_text_bytes", "voxtral_text_bytes",
    "firered_text_bytes", "lasr_text_bytes", "cohere_text_bytes",
    "moss_diarize_text_bytes", "qwen3_aligner_starts", "qwen3_tts_generate",
    "pocket_tts_generate", "moss_tts_codes", "moss_tts_full_generate",
    "moss_tts_full_delay_ids",
    "fish_speech_prompt_grid", "fish_speech_embed", "fish_speech_generate",
    "indextts_generate", "chatterbox_generate",
    "echo_tts_generate", "irodori_generate", "omnivoice_generate",
    "lfm_audio_text_tokens",
]


def _load_regen():
    spec = importlib.util.spec_from_file_location(
        "regen_zoo_goldens", GOLDEN_DIR / "regen_zoo_goldens.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def computed():
    return _load_regen().compute()


@pytest.fixture(scope="module")
def stored():
    return json.loads((GOLDEN_DIR / "zoo_goldens.json").read_text())


def test_all_families_present(stored):
    assert set(stored) >= set(FAMILIES)


@pytest.mark.parametrize("name", FAMILIES)
def test_zoo_golden(name, computed, stored):
    got, want = computed[name], stored[name]
    assert got["shape"] == want["shape"], name
    if "mean" in want:  # float-vector entry
        np.testing.assert_allclose(got["first"], want["first"],
                                   atol=3e-6, rtol=2e-4, err_msg=name)
        assert abs(got["mean"] - want["mean"]) < max(
            3e-6, 2e-4 * abs(want["mean"])), name
        assert abs(got["abs_max"] - want["abs_max"]) < max(
            1e-5, 2e-4 * abs(want["abs_max"])), name
    else:  # integer-sequence entry: exact
        assert got["first"] == want["first"], name
