"""Pinned-expected-value regression tests for the codec zoo.

Offline analog of the reference's hardcoded golden vectors
(MLXAudioCodecsTests.swift:207-348, MLXAudioSTSTests.swift:311): each codec
family decodes deterministic inputs through deterministic fixture weights
and must keep reproducing the committed golden values in
tests/golden/codec_goldens.json within an explicit tolerance. Catches
silent numerics drift in any layer of the stack (DSP, conv semantics,
quantizer math, loaders). Includes real-audio fixtures: DeepFilterNet on
the reference noisy_audio.wav and the whisper mel of conversational_a.wav.

Regenerate intentionally with: python tests/golden/regen_codec_goldens.py
"""

import importlib.util
import json
from pathlib import Path

import numpy as np
import pytest

GOLDEN_DIR = Path(__file__).parent / "golden"


def _load_regen():
    spec = importlib.util.spec_from_file_location(
        "regen_codec_goldens", GOLDEN_DIR / "regen_codec_goldens.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def computed():
    return _load_regen().compute()


@pytest.fixture(scope="module")
def stored():
    return json.loads((GOLDEN_DIR / "codec_goldens.json").read_text())


def test_all_families_present(stored):
    assert set(stored) >= {
        "snac_decode", "dacvae_reconstruct", "fish_s1_reconstruct",
        "bigvgan_decode", "higgs_decode", "moss_tokenizer_reconstruct",
        "qwen3_codec_decode", "deepfilternet_enhance_noisy",
        "whisper_mel_conversational_a",
    }


@pytest.mark.parametrize("name", [
    "snac_decode", "dacvae_reconstruct", "fish_s1_reconstruct",
    "bigvgan_decode", "higgs_decode", "moss_tokenizer_reconstruct",
    "qwen3_codec_decode", "deepfilternet_enhance_noisy",
    "whisper_mel_conversational_a",
])
def test_codec_golden(name, computed, stored):
    if name not in computed:
        pytest.skip("reference media checkout not available")
    got, want = computed[name], stored[name]
    assert got["shape"] == want["shape"], name
    np.testing.assert_allclose(got["first"], want["first"],
                               atol=3e-6, rtol=2e-4, err_msg=name)
    assert abs(got["mean"] - want["mean"]) < 3e-6
    assert abs(got["abs_max"] - want["abs_max"]) < 1e-5
