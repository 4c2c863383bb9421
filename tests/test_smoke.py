"""Tier-3 smoke tests: real HuggingFace checkpoints, full generates,
liveness asserts, perf prints.

Mirrors the reference's off-CI smoke tier
(/root/reference/Tests/MLXAudioSmokeTests.swift:70-110 — download ->
load -> generate on the bundled media -> assert liveness -> print perf;
suites serialized with memory resets between tests :43-55). These are
deliberately SEPARATE from the fast fixture tests so CI skips them: they
run only when the network is reachable (``HF_HUB_OFFLINE`` unset and
huggingface.co answering) and are marked ``smoke``:

    python -m pytest tests/test_smoke.py -m smoke -v -s

Seven families' fixture tests are self-pinned-only offline (no torch
reference implementation is installed for them): SNAC, Vocos, DACVAE,
S3Gen, Silero-VAD, Sortformer, DeepFilterNet. Their smoke tests below
are the real-weights check that closes that gap — one network grant away
— including the reference's own end-to-end enhancement golden
(``noisy_audio.wav`` -> ``noisy_audio_target.wav``,
MLXAudioSTSTests.swift:311).
"""

from __future__ import annotations

import functools
import os
import time
from pathlib import Path

import numpy as np
import pytest

MEDIA = Path(os.environ.get("REFERENCE_MEDIA_DIR",
                            "/root/reference/Tests/media"))

pytestmark = pytest.mark.smoke


@functools.lru_cache(maxsize=1)
def _network_available() -> bool:
    if os.environ.get("HF_HUB_OFFLINE"):
        return False
    import socket

    try:
        socket.create_connection(("huggingface.co", 443), timeout=5).close()
        return True
    except OSError:
        return False


# The probe must stay LAZY: skipif with a plain bool would open a TCP
# connection during collection of every ordinary pytest run (smoke tests
# are only deselected AFTER collection by addopts '-m not smoke').
# skipif with a condition STRING is evaluated only at the setup of a test
# that was actually selected, and the lru_cache bounds it to one probe
# per session.
requires_network = pytest.mark.skipif(
    "not __import__('tests.test_smoke', fromlist=['_'])."
    "_network_available()",
    reason="smoke tier needs network access to huggingface.co "
           "(HF_HUB_OFFLINE is set or the host is unreachable)")

requires_media = pytest.mark.skipif(
    not MEDIA.is_dir(), reason="reference test media not available "
                               "(set REFERENCE_MEDIA_DIR)")


def _load(name: str, sr: int):
    from tpu_audio.core.audio_io import load_audio

    return load_audio(str(MEDIA / name), sample_rate=sr)[0]


def _perf(name: str, wall: float, audio_s: float | None = None,
          **extra) -> None:
    parts = [f"[smoke:{name}] {wall:.2f}s"]
    if audio_s:
        parts.append(f"audio {audio_s:.1f}s (RTFx {audio_s / wall:.1f})")
    parts += [f"{k}={v}" for k, v in extra.items()]
    print(" ".join(parts))


# ---------------------------------------------------------------------------
# Codecs (SNAC + Vocos + DACVAE are self-pinned-only offline)
# ---------------------------------------------------------------------------


@requires_network
@requires_media
def test_snac_encode_decode_cycle():
    """MLXAudioSmokeTests.swift:78 (mlx-community/snac_24khz)."""
    from tpu_audio.codecs.snac import SNAC

    snac = SNAC.from_pretrained("mlx-community/snac_24khz")
    audio = _load("intention.wav", 24000)
    t0 = time.perf_counter()
    codes = snac.encode(audio[None, None, :])
    out = np.asarray(snac.decode(codes))
    _perf("snac", time.perf_counter() - t0, len(audio) / 24000,
          levels=len(codes))
    assert out.shape[-1] > 0
    assert np.isfinite(out).all()


@requires_network
@requires_media
def test_vocos_mel_decode():
    from tpu_audio.codecs.vocos import Vocos
    from tpu_audio.core.dsp import mel_spectrogram

    model = Vocos.from_pretrained("mlx-community/vocos-mel-24khz")
    audio = _load("intention.wav", model.sample_rate)
    mel = mel_spectrogram(
        audio, sample_rate=model.sample_rate, n_fft=model.n_fft,
        hop_length=model.hop,
        n_mels=model.config.get("input_channels", 100))
    feats = np.log(np.clip(np.asarray(mel), 1e-7, None))
    t0 = time.perf_counter()
    out = np.asarray(model.decode(feats.T[None]))
    _perf("vocos", time.perf_counter() - t0, len(audio) / model.sample_rate)
    assert out.shape[-1] > 0 and np.isfinite(out).all()
    assert np.abs(out).max() > 1e-3  # produced actual audio


# ---------------------------------------------------------------------------
# TTS
# ---------------------------------------------------------------------------


@requires_network
def test_orpheus_generate():
    """MLXAudioSmokeTests.swift:246 (mlx-community/orpheus-3b-0.1-ft)."""
    from tpu_audio.models.tts import load_model

    model = load_model("mlx-community/orpheus-3b-0.1-ft-4bit")
    t0 = time.perf_counter()
    wav = np.asarray(model.generate("Hello from the smoke tier.",
                                    voice="tara"))
    wall = time.perf_counter() - t0
    _perf("orpheus", wall, wav.shape[-1] / model.sample_rate)
    assert wav.shape[-1] > model.sample_rate // 2  # >0.5 s of audio
    assert np.isfinite(wav).all()


@requires_network
def test_kokoro_generate():
    from tpu_audio.models.tts import load_model

    model = load_model("mlx-community/Kokoro-82M-bf16")
    t0 = time.perf_counter()
    wav = np.asarray(model.generate("The quick brown fox jumps over "
                                    "the lazy dog.", voice="af_heart"))
    _perf("kokoro", time.perf_counter() - t0,
          wav.shape[-1] / model.sample_rate)
    assert wav.shape[-1] > model.sample_rate // 2
    assert np.isfinite(wav).all()


# ---------------------------------------------------------------------------
# STT
# ---------------------------------------------------------------------------


@requires_network
@requires_media
def test_whisper_transcribe():
    from tpu_audio.models.stt import load_model

    model = load_model("openai/whisper-tiny")
    audio = _load("conversational_a.wav", 16000)
    t0 = time.perf_counter()
    out = model.generate(audio)
    wall = time.perf_counter() - t0
    _perf("whisper-tiny", wall, len(audio) / 16000,
          tokens=out.generation_token_count)
    assert out.text.strip()
    assert out.generation_token_count > 0


@requires_network
@requires_media
def test_qwen3_asr_transcribe():
    """MLXAudioSmokeTests.swift:618 (mlx-community/Qwen3-ASR ckpt)."""
    from tpu_audio.models.stt import load_model

    model = load_model("mlx-community/Qwen3-ASR-0.6B-4bit")
    audio = _load("conversational_a.wav", 16000)
    t0 = time.perf_counter()
    out = model.generate(audio)
    _perf("qwen3-asr", time.perf_counter() - t0, len(audio) / 16000,
          tokens=out.generation_token_count)
    assert out.text.strip()


# ---------------------------------------------------------------------------
# VAD / diarization (Silero + Sortformer are self-pinned-only offline)
# ---------------------------------------------------------------------------


@requires_network
@requires_media
def test_silero_vad_detects_speech():
    from tpu_audio.models.vad.silero import SileroVAD

    model = SileroVAD.from_pretrained("mlx-community/silero-vad")
    audio = _load("conversational_a.wav", 16000)
    t0 = time.perf_counter()
    probs = np.asarray(model.predict_proba(audio))
    _perf("silero", time.perf_counter() - t0, len(audio) / 16000)
    assert probs.max() > 0.5          # real speech must trigger
    assert probs.min() < 0.5          # silence must not


@requires_network
@requires_media
def test_sortformer_offline_diarization():
    """MLXAudioSmokeTests.swift:876 (diar_streaming_sortformer_4spk)."""
    from tpu_audio.models.vad.sortformer import Sortformer

    model = Sortformer.from_pretrained(
        "mlx-community/diar_streaming_sortformer_4spk-v2.1-fp16")
    audio = _load("multi_speaker.wav", 16000)
    t0 = time.perf_counter()
    out = model.generate(audio)
    _perf("sortformer", time.perf_counter() - t0, len(audio) / 16000,
          segments=len(out["segments"]))
    assert len(out["segments"]) > 0
    assert out["num_speakers"] >= 2


# ---------------------------------------------------------------------------
# LID
# ---------------------------------------------------------------------------


@requires_network
@requires_media
def test_ecapa_lid_predicts_english():
    from tpu_audio.models.lid.ecapa_lid import EcapaLID

    model = EcapaLID.from_pretrained(
        "mlx-community/speechbrain-lang-id-voxlingua107-ecapa-fp16")
    audio = _load("conversational_a.wav", 16000)
    t0 = time.perf_counter()
    out = model.predict(audio, top_k=3)
    _perf("ecapa-lid", time.perf_counter() - t0, len(audio) / 16000,
          top=out.language)
    assert out.language.startswith("en")


# ---------------------------------------------------------------------------
# STS — incl. the reference's end-to-end enhancement golden
# ---------------------------------------------------------------------------


@requires_network
@requires_media
def test_deepfilternet_denoise_matches_golden_target():
    """The reference's deepFilterNetDenoiseMatchesGoldenSpectrogram
    (MLXAudioSTSTests.swift:311): enhance the bundled noisy_audio.wav
    with real DFN3 weights and compare the log-mel spectrogram against
    the bundled noisy_audio_target.wav golden."""
    from tpu_audio.core.dsp import log_mel_spectrogram
    from tpu_audio.models.sts.deepfilternet import DeepFilterNet

    model = DeepFilterNet.from_pretrained(
        os.environ.get("TPU_AUDIO_DFN_REPO",
                       "mlx-community/DeepFilterNet3"))
    noisy = _load("noisy_audio.wav", 48000)
    target = _load("noisy_audio_target.wav", 48000)
    t0 = time.perf_counter()
    enhanced = np.asarray(model.enhance(noisy))
    wall = time.perf_counter() - t0
    _perf("dfn-golden", wall, len(noisy) / 48000)

    n = min(len(enhanced), len(target))
    mel_e = np.asarray(log_mel_spectrogram(enhanced[:n], sample_rate=48000,
                                           n_mels=80))
    mel_t = np.asarray(log_mel_spectrogram(target[:n], sample_rate=48000,
                                           n_mels=80))
    err = np.abs(mel_e - mel_t).mean()
    print(f"[smoke:dfn-golden] mean log-mel deviation {err:.4f}")
    # the reference asserts spectrogram-level agreement with real weights;
    # tolerance covers codec/resampler differences across exporters
    assert err < 0.15, err
