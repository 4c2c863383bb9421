"""Regenerate tests/golden/codec_goldens.json.

Pinned-expected-value regression fixtures for every codec family that has
no torch reference available offline (the reference pins outputs the same
way, MLXAudioCodecsTests.swift:207-348 — but against real checkpoints it
downloads; here the weights are the deterministic modulo fixtures, so the
goldens pin OUR numerics against silent regressions).

Run from the repo root: python tests/golden/regen_codec_goldens.py
"""

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


def entry(wav, n=12):
    wav = np.asarray(wav, np.float32).reshape(-1)
    return {
        "shape": int(wav.size),
        "first": [float(f"{x:.8g}") for x in wav[:n]],
        "mean": float(f"{wav.mean():.8g}"),
        "abs_max": float(f"{np.abs(wav).max():.8g}"),
    }


def compute():
    tmp = Path(tempfile.mkdtemp())
    goldens = {}
    rng = np.random.default_rng(0)

    # SNAC: 3-plane decode from deterministic codes
    from tpu_audio.codecs.snac import SNAC

    m = SNAC.from_pretrained(str(F.make_snac_fixture(tmp / "snac")))
    codes = [np.arange(4).reshape(1, 4) % 8, np.arange(8).reshape(1, 8) % 8,
             np.arange(16).reshape(1, 16) % 8]
    goldens["snac_decode"] = entry(m.decode(codes))

    # DACVAE: full reconstruct
    from tpu_audio.codecs.dacvae import DACVAE

    m = DACVAE.from_pretrained(str(F.make_dacvae_fixture(tmp / "dacvae")))
    audio = (rng.standard_normal(512) * 0.3).astype(np.float32)
    goldens["dacvae_reconstruct"] = entry(m.reconstruct(audio))

    # FishS1DAC: reconstruct
    from tpu_audio.codecs.fish_s1_dac import FishS1DAC

    m = FishS1DAC.from_pretrained(str(F.make_fish_s1_fixture(tmp / "fish")))
    audio = (rng.standard_normal(1024) * 0.3).astype(np.float32)
    goldens["fish_s1_reconstruct"] = entry(m.reconstruct(audio))

    # BigVGAN: mel -> wav
    from tpu_audio.codecs.bigvgan import BigVGAN

    m = BigVGAN.from_pretrained(str(F.make_bigvgan_fixture(tmp / "bv")))
    mel = (F.modulo_values((1, 6, 8), 11, 0.3))
    goldens["bigvgan_decode"] = entry(m.decode(mel))

    # Higgs tokenizer: decode
    from tpu_audio.codecs.higgs import HiggsAudioTokenizer

    m = HiggsAudioTokenizer.from_pretrained(str(F.make_higgs_fixture(tmp / "hg")))
    tokens = (np.arange(16).reshape(8, 2) % 8).astype(np.int32)  # [T, nq]
    goldens["higgs_decode"] = entry(m.decode(tokens))

    # MOSS tokenizer: reconstruct
    from tpu_audio.codecs.moss_tokenizer import MossAudioTokenizer

    m = MossAudioTokenizer.from_pretrained(
        str(F.make_moss_tokenizer_fixture(tmp / "moss")))
    audio = (rng.standard_normal(1024) * 0.3).astype(np.float32)
    goldens["moss_tokenizer_reconstruct"] = entry(m.reconstruct(audio))

    # Qwen3 speech codec: decode deterministic codes
    from tpu_audio.codecs.qwen3_codec import (
        Qwen3CodecDecoder,
        Qwen3CodecDecoderConfig,
    )
    from tpu_audio.core import hub, loading

    d = F.make_qwen3_tts_fixture(tmp / "q3")
    st = d / "speech_tokenizer"
    cfg = Qwen3CodecDecoderConfig.from_dict(hub.load_config(st))
    m = Qwen3CodecDecoder(cfg, loading.load_params(st))
    codes = (np.arange(4 * 6).reshape(1, 4, 6) % 8).astype(np.int32)
    goldens["qwen3_codec_decode"] = entry(m.decode(codes))

    # Real-audio fixtures (reference Tests/media pair,
    # MLXAudioSTSTests.swift:311 precedent) — only where the reference
    # checkout exists (skipped on CI runners without it)
    media = Path("/root/reference/Tests/media")
    if media.is_dir():
        from tpu_audio.core.audio_io import load_audio
        from tpu_audio.models.sts.deepfilternet import DeepFilterNet

        noisy, _ = load_audio(str(media / "noisy_audio.wav"),
                              sample_rate=48000)
        m = DeepFilterNet.from_pretrained(
            str(F.make_deepfilternet_fixture(tmp / "dfn")))
        enhanced = np.asarray(m.enhance(noisy[: 48000]))
        goldens["deepfilternet_enhance_noisy"] = entry(enhanced)

        from tpu_audio.core.dsp import log_mel_spectrogram

        speech, _ = load_audio(str(media / "conversational_a.wav"),
                               sample_rate=16000)
        mel = np.asarray(log_mel_spectrogram(speech[:16000], n_mels=80))
        goldens["whisper_mel_conversational_a"] = entry(mel)

    return goldens


def main():
    goldens = compute()
    out = Path(__file__).parent / "codec_goldens.json"
    out.write_text(json.dumps(goldens, indent=1))
    print(f"wrote {out} with {len(goldens)} entries")


if __name__ == "__main__":
    main()
