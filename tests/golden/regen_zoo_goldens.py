"""Regenerate tests/golden/zoo_goldens.json.

Pinned-expected-value regression fixtures for the VAD / STS / LID / G2P /
TTS / STT model zoo — the same precedent the reference sets with hardcoded
golden vectors (MLXAudioVADTests.swift:74-142, MLXAudioSTSTests.swift:311,
MLXAudioCodecsTests.swift:207-348) but computed offline from the
deterministic modulo fixture checkpoints, so every family's full
forward/generate path is pinned against silent numerics drift.

Run from the repo root: python tests/golden/regen_zoo_goldens.py
"""

import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import fixtures as F  # noqa: E402


def vec(x, n=12):
    """Float-vector entry: shape + first-n values + summary stats."""
    x = np.asarray(x, np.float64).reshape(-1)
    return {
        "shape": int(x.size),
        "first": [float(f"{v:.8g}") for v in x[:n]],
        "mean": float(f"{x.mean():.8g}") if x.size else 0.0,
        "abs_max": float(f"{np.abs(x).max():.8g}") if x.size else 0.0,
    }


def ids(x, n=24):
    """Integer-sequence entry (token ids, predictions): exact prefix."""
    x = np.asarray(x).reshape(-1).astype(int)
    return {"shape": int(x.size), "first": [int(v) for v in x[:n]]}


def _noise(seed, n, scale=0.1):
    return (np.random.default_rng(seed).standard_normal(n) * scale).astype(
        np.float32)


def compute():  # noqa: C901 — one entry per model family, linear script
    tmp = Path(tempfile.mkdtemp())
    g = {}

    # ----- VAD ------------------------------------------------------------
    from tpu_audio.models.vad.silero import SileroVAD

    m = SileroVAD.from_pretrained(str(F.make_silero_fixture(tmp / "silero")))
    g["silero_probs"] = vec(m.predict_proba(_noise(0, 16000)))

    from tpu_audio.models.vad.sortformer import Sortformer

    m = Sortformer.from_pretrained(
        str(F.make_sortformer_fixture(tmp / "sortformer")))
    out = m.generate(_noise(0, 16000 * 2, 0.2))
    g["sortformer_speaker_probs"] = vec(out["speaker_probs"])

    from tpu_audio.models.vad.fsmn_vad import FSMNVAD

    m = FSMNVAD.from_pretrained(str(F.make_fsmn_vad_fixture(tmp / "fsmn")))
    g["fsmn_scores"] = vec(m.scores(_noise(1, 8000)))

    from tpu_audio.models.vad.smart_turn import SmartTurn

    m = SmartTurn.from_pretrained(
        str(F.make_smart_turn_fixture(tmp / "smart_turn")))
    out = m.predict_endpoint(_noise(2, 12000, 1.0))
    g["smart_turn_probability"] = vec([out.probability])

    # ----- STS ------------------------------------------------------------
    from tpu_audio.models.sts.mossformer2_se import MossFormer2SE

    m = MossFormer2SE.from_pretrained(
        str(F.make_mossformer2_fixture(tmp / "mf2")))
    g["mossformer2_enhance"] = vec(m.enhance(_noise(3, 16000)))

    from tpu_audio.models.sts.sam_audio import SAMAudio

    m = SAMAudio.from_pretrained(str(F.make_sam_audio_fixture(tmp / "sam")))
    audio = np.sin(np.arange(1024) / 9).astype(np.float32) * 0.3
    r = m.separate(audio, ["speech"], n_steps=2, seed=0)
    g["sam_audio_target"] = vec(r.target[0])

    # ----- LID / G2P ------------------------------------------------------
    from tpu_audio.models.lid.ecapa_lid import EcapaLID

    m = EcapaLID.from_pretrained(str(F.make_ecapa_fixture(tmp / "ecapa")))
    out = m.predict(_noise(4, 16000), top_k=3)
    g["ecapa_lid_scores"] = vec([p.confidence for p in out.top_languages])

    from tpu_audio.models.g2p.byt5 import ByT5G2P

    m = ByT5G2P.from_pretrained(str(F.make_byt5_fixture(tmp / "byt5")))
    g["byt5_g2p_hello"] = ids(list(m.convert("hello", "eng-us").encode()))

    # ----- STT (greedy decode token ids through fixture checkpoints) ------
    from tpu_audio.models.stt.whisper import Whisper

    m = Whisper.from_pretrained(str(F.make_whisper_fixture(tmp / "whisper")))
    m.tokenizer = F.FakeWhisperTokenizer(vocab=m.config.vocab_size)
    out = m.generate(_noise(5, 16000))
    g["whisper_text_bytes"] = ids(list(out.text.encode()))

    from tpu_audio.models.stt.parakeet import Parakeet

    m = Parakeet.from_pretrained(
        str(F.make_parakeet_fixture(tmp / "parakeet")))
    out = m.generate(_noise(6, 16000))
    g["parakeet_text_bytes"] = ids(list(out.text.encode()))

    from tpu_audio.models.stt.qwen3_asr import Qwen3ASR

    m = Qwen3ASR.from_pretrained(
        str(F.make_qwen3_asr_fixture(tmp / "qwen3_asr")))
    mel, _ = m.preprocess_audio(_noise(7, 16000))
    g["qwen3_asr_audio_feats"] = vec(m.encode_audio(mel))
    out = m.generate(_noise(7, 16000))
    g["qwen3_asr_text_bytes"] = ids(list(out.text.encode()))

    from tpu_audio.models.stt.sensevoice import SenseVoice

    m = SenseVoice.from_pretrained(
        str(F.make_sensevoice_fixture(tmp / "sensevoice")))
    out = m.generate(_noise(8, 16000))
    g["sensevoice_text_bytes"] = ids(list(out.text.encode()))

    from tpu_audio.models.stt.canary import Canary

    m = Canary.from_pretrained(str(F.make_canary_fixture(tmp / "canary")))
    out = m.generate(_noise(9, 16000))
    g["canary_text_bytes"] = ids(list(out.text.encode()))

    from tpu_audio.models.stt.nemotron import NemotronASR

    m = NemotronASR.from_pretrained(
        str(F.make_nemotron_fixture(tmp / "nemotron")))
    out = m.generate(_noise(10, 16000))
    g["nemotron_text_bytes"] = ids(list(out.text.encode()))

    # ----- TTS (seeded / greedy generate through fixture checkpoints) -----
    from tpu_audio.core.generation import AudioGenerateParameters

    from tpu_audio.codecs.snac import SNAC
    from tpu_audio.models.tts.llama_tts import LlamaTTS

    m = LlamaTTS.from_pretrained(
        str(F.make_llama_tts_fixture(tmp / "llama_tts")))
    m.codec = SNAC.from_pretrained(
        str(F.make_snac_fixture(tmp / "snac4tts", vq_strides=(4, 2, 1))))
    gp = AudioGenerateParameters(temperature=0.0, max_tokens=21, seed=0)
    g["llama_tts_generate"] = vec(
        m.generate("hello world", generation_parameters=gp))

    from tpu_audio.models.tts.soprano import Soprano

    m = Soprano.from_pretrained(str(F.make_soprano_fixture(tmp / "soprano")))
    gp = AudioGenerateParameters(temperature=0.0, max_tokens=8, seed=0)
    g["soprano_generate"] = vec(
        m.generate("hello world", generation_parameters=gp))

    from tpu_audio.models.tts.kokoro import Kokoro

    m = Kokoro.from_pretrained(str(F.make_kokoro_fixture(tmp / "kokoro")))
    g["kokoro_generate"] = vec(m.generate("hello world", voice="af_heart"))

    from tpu_audio.models.tts.kitten_tts import KittenTTS

    m = KittenTTS.from_pretrained(str(F.make_kitten_fixture(tmp / "kitten")))
    g["kitten_generate"] = vec(
        m.generate("həloʊ wɜːld",
                   voice="expr-voice-5-m"))

    from tpu_audio.models.tts.csm import MarvisTTS

    m = MarvisTTS.from_pretrained(str(F.make_csm_fixture(tmp / "csm")))
    gp = AudioGenerateParameters(temperature=0.0, max_tokens=4, seed=0)
    ref = _noise(11, 1920, 0.2)
    g["csm_generate"] = vec(m.generate(
        "hello", ref_audio=ref, ref_text="ref", generation_parameters=gp))

    # ----- STT batch 2 ----------------------------------------------------
    from tpu_audio.core.generation import STTGenerateParameters
    from tpu_audio.models.stt import load_model as load_stt

    m = load_stt(str(F.make_glm_asr_fixture(tmp / "glm")))
    out = m.generate(_noise(12, 16000), STTGenerateParameters(max_tokens=6))
    g["glm_asr_text_bytes"] = ids(list(out.text.encode()))

    m = load_stt(str(F.make_granite_fixture(tmp / "granite")))
    out = m.generate(_noise(13, 16000), STTGenerateParameters(max_tokens=6))
    g["granite_text_bytes"] = ids(list(out.text.encode()))

    m = load_stt(str(F.make_voxtral_fixture(tmp / "voxtral")))
    out = m.generate(_noise(14, 16000), STTGenerateParameters(max_tokens=16))
    g["voxtral_text_bytes"] = ids(list(out.text.encode()))

    m = load_stt(str(F.make_firered_fixture(tmp / "firered")))
    out = m.generate(_noise(15, 16000))
    g["firered_text_bytes"] = ids(list(out.text.encode()))

    m = load_stt(str(F.make_lasr_fixture(tmp / "lasr")))
    out = m.generate(_noise(16, 16000))
    g["lasr_text_bytes"] = ids(list(out.text.encode()))

    m = load_stt(str(F.make_cohere_fixture(tmp / "cohere")))
    out = m.generate(_noise(17, 16000), STTGenerateParameters(max_tokens=8))
    g["cohere_text_bytes"] = ids(list(out.text.encode()))

    m = load_stt(str(F.make_moss_diarize_fixture(tmp / "moss_dia")))
    out = m.generate(_noise(18, 16000), STTGenerateParameters(max_tokens=8))
    g["moss_diarize_text_bytes"] = ids(list(out.text.encode()))

    # the factory detects the aligner by the repo-name marker
    m = load_stt(str(F.make_qwen3_aligner_fixture(
        tmp / "qwen3-forced-aligner")))
    res = m.generate(_noise(19, 16000), text="w1 w2 w3", language="English")
    g["qwen3_aligner_starts"] = vec(
        [w.start_time for w in res.items] if res.items else [0.0])

    # ----- TTS batch 2 ----------------------------------------------------
    from tpu_audio.models.tts import load_model as load_tts

    m = load_tts(str(F.make_qwen3_tts_fixture(tmp / "qwen3_tts")),
                 dtype=None)
    gp = AudioGenerateParameters(max_tokens=6, temperature=0.0, seed=0)
    g["qwen3_tts_generate"] = vec(
        m.generate("hello world", generation_parameters=gp))

    m = load_tts(str(F.make_pocket_tts_fixture(tmp / "pocket")))
    gp = AudioGenerateParameters(seed=3)
    g["pocket_tts_generate"] = vec(
        m.generate("hello world", generation_parameters=gp, max_frames=3))

    m = load_tts(str(F.make_moss_tts_fixture(tmp / "moss_tts")))
    g["moss_tts_codes"] = ids(
        m.generate_codes("w1 w2", max_new_frames=3, seed=0))

    m = load_tts(str(F.make_moss_tts_full_fixture(tmp / "moss_full")))
    gp = AudioGenerateParameters(temperature=0.9, top_p=0.9, top_k=10,
                                 repetition_penalty=1.0, max_tokens=10,
                                 seed=1)
    g["moss_tts_full_generate"] = vec(
        m.generate("w1 w2 w3", generation_parameters=gp))
    # delay-pattern continuation ids: guaranteed non-empty audio channels
    proc = m.processor()
    cfg = m.config
    codes = (np.arange(10 * cfg.n_vq).reshape(10, cfg.n_vq)
             % cfg.audio_vocab_size).astype(np.int32)
    conv = [proc.build_user_message(text="w1 w2"),
            proc.build_assistant_message([codes])]
    rows = proc(conv, mode="continuation")
    outputs = m.generate_delay_pattern_ids(
        rows, max_new_tokens=6, audio_temperature=0.8, seed=3)
    g["moss_tts_full_delay_ids"] = ids(outputs[0][1])

    m = load_tts(str(F.make_fish_speech_fixture(tmp / "fish_tts")))
    from tpu_audio.models.tts.fish_speech import embed_grid

    grid = m.build_prompt_grid("hello world")
    g["fish_speech_prompt_grid"] = ids(grid)
    g["fish_speech_embed"] = vec(
        embed_grid(m.params, jnp.asarray(grid[None]), m.config))
    gp = AudioGenerateParameters(max_tokens=6, temperature=0.0, seed=0)
    g["fish_speech_generate"] = vec(
        m.generate("hello world", generation_parameters=gp))

    m = load_tts(str(F.make_indextts_fixture(tmp / "indextts")))
    ref = np.sin(np.arange(4800) / 15).astype(np.float32) * 0.5
    gp = AudioGenerateParameters(max_tokens=6, temperature=0.0, seed=0)
    g["indextts_generate"] = vec(
        m.generate("hello world", ref_audio=ref, generation_parameters=gp))

    m = load_tts(str(F.make_chatterbox_fixture(tmp / "chatterbox")))
    gp = AudioGenerateParameters(max_tokens=6, temperature=0.0, seed=0)
    g["chatterbox_generate"] = vec(
        m.generate("hello world", generation_parameters=gp))

    m = load_tts(str(F.make_echo_tts_fixture(tmp / "echo")))
    gp = AudioGenerateParameters(max_tokens=8, seed=0)
    g["echo_tts_generate"] = vec(
        m.generate("hello", generation_parameters=gp))

    m = load_tts(str(F.make_irodori_fixture(tmp / "irodori")))
    g["irodori_generate"] = vec(m.generate("w1 w2 w3", voice="w9 w10"))

    from tpu_audio.models.tts.omnivoice import OmniVoiceGenerateParameters

    m = load_tts(str(F.make_omnivoice_fixture(tmp / "omnivoice")))
    g["omnivoice_generate"] = vec(m.generate(
        "w1 w2 w3",
        ov_parameters=OmniVoiceGenerateParameters(num_step=3, seed=0)))

    # ----- STS batch 2 ----------------------------------------------------
    from tpu_audio.models.sts import load_model as load_sts

    m = load_sts(str(F.make_lfm_audio_fixture(tmp / "lfm")))
    text, codes = m.generate(
        text_tokens=np.asarray([[1, 50, 52]], np.int32),
        max_new_tokens=5, temperature=0.0)
    g["lfm_audio_text_tokens"] = ids(text)

    return g


def main():
    goldens = compute()
    out = Path(__file__).parent / "zoo_goldens.json"
    out.write_text(json.dumps(goldens, indent=1))
    print(f"wrote {out} with {len(goldens)} entries")


if __name__ == "__main__":
    main()
