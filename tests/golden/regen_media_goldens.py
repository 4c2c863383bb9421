"""Regenerate tests/golden/media_goldens.json.

End-to-end pinned goldens computed over the committed *audio fixtures*
(tests/media/*.wav) — the analog of the reference's paired-audio golden
test (MLXAudioSTSTests.swift:311 with Tests/media/noisy_audio.wav /
noisy_audio_target.wav): real waveform in, pinned floats out, through the
real model paths with deterministic fixture checkpoints.

Run from the repo root: python tests/golden/regen_media_goldens.py
"""

import hashlib
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import fixtures as F  # noqa: E402
from tpu_audio.core.audio_io import load_audio  # noqa: E402

MEDIA = Path(__file__).resolve().parents[1] / "media"


def vec(x, n=12):
    x = np.asarray(x, np.float64).reshape(-1)
    return {
        "shape": int(x.size),
        "first": [float(f"{v:.8g}") for v in x[:n]],
        "mean": float(f"{x.mean():.8g}") if x.size else 0.0,
        "abs_max": float(f"{np.abs(x).max():.8g}") if x.size else 0.0,
    }


def compute():
    tmp = Path(tempfile.mkdtemp())
    g = {"files": {}}

    for f in ("speech_16k.wav", "two_speaker_16k.wav", "noisy_48k.wav",
              "clean_48k.wav"):
        g["files"][f] = hashlib.sha256((MEDIA / f).read_bytes()).hexdigest()

    speech, _ = load_audio(MEDIA / "speech_16k.wav")
    noisy, _ = load_audio(MEDIA / "noisy_48k.wav")

    # Whisper-style offline log-mel over the speech fixture
    from tpu_audio.core import dsp

    mel = np.asarray(dsp.log_mel_spectrogram(speech, n_mels=80))
    g["speech_log_mel"] = vec(mel)

    # Silero fixture probabilities over the speech fixture
    from tpu_audio.models.vad.silero import SileroVAD

    sil = SileroVAD.from_pretrained(str(F.make_silero_fixture(tmp / "sil")))
    g["silero_probs"] = vec(sil.predict_proba(speech, 16000))

    # DeepFilterNet fixture enhance over the first 0.5 s of the noisy pair
    from tpu_audio.models.sts.deepfilternet import DeepFilterNet

    dfn = DeepFilterNet.from_pretrained(
        str(F.make_deepfilternet_fixture(tmp / "dfn")))
    g["dfn_enhanced"] = vec(dfn.enhance(noisy[:24000]))

    return g


if __name__ == "__main__":
    out = Path(__file__).with_name("media_goldens.json")
    out.write_text(json.dumps(compute(), indent=1) + "\n")
    print(f"wrote {out}")
