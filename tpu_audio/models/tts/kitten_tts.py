"""KittenTTS: small StyleTTS2 (PL-BERT prosody + ISTFTNet vocoder).

TPU-first rebuild of the reference
(Sources/MLXAudioTTS/Models/StyleTTS2/KittenTTS/*). The pipeline is the
Kokoro StyleTTS2 stack (ALBERT text encoder, BiLSTM duration encoder,
AdaIN F0/N prosody, AdaIN decoder, harmonic-source ISTFTNet generator)
with a fixed symbol table instead of a config vocab
(KittenTTSTextCleaner.swift:3-22), a single ``voices.safetensors`` file of
named style matrices (KittenTTSModel.swift:322-337), per-voice speed
priors/aliases, and a generator that uses sin(h) as the ISTFT phase
directly — no unwrap (KittenTTSISTFTNet.swift:102-104). All network
forwards are shared with tpu_audio.models.tts.kokoro.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import hub, loading, nn
from tpu_audio.core.generation import (
    AudioGenerateParameters,
    AudioGeneration,
    AudioGenerationError,
    AudioGenerationInfo,
)
from tpu_audio.models.tts import kokoro as kk

__all__ = ["KittenTTS", "KittenTTSConfig", "clean_text"]

_PAD = "$"
_PUNCTUATION = ';:,.!?¡¿—…"«»“” '
_LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
_LETTERS_IPA = ("ɑɐɒæɓʙβɔɕçɗɖðʤəɘɚɛɜɝɞɟʄɡɠɢʛɦɧħɥʜɨɪʝɭɬɫɮʟɱɯɰŋɳɲɴøɵɸθœɶʘɹɺɾɻ"
                "ʀʁɽʂʃʈʧʉʊʋⱱʌɣɤʍχʎʏʑʐʒʔʡʕʢǀǁǂǃˈˌːˑʼʴʰʱʲʷˠˤ˞↓↑→↗↘‘̩"
                "’ᵻ")

SYMBOL_TO_ID = {ch: i for i, ch in
                enumerate(_PAD + _PUNCTUATION + _LETTERS + _LETTERS_IPA)}


def clean_text(text: str) -> list[int]:
    """IPA string -> symbol ids, dropping unknown chars
    (KittenTTSTextCleaner.cleanText)."""
    return [SYMBOL_TO_ID[ch] for ch in text if ch in SYMBOL_TO_ID]


@dataclass
class KittenTTSConfig:
    """KittenTTSConfig.swift:4-72."""

    hidden_dim: int = 512
    max_conv_dim: int = 512
    max_dur: int = 50
    n_layer: int = 3
    n_mels: int = 80
    n_token: int = 178
    style_dim: int = 128
    text_encoder_kernel_size: int = 5
    asr_res_dim: int = 64
    sample_rate: int = 24000
    decoder_out_dim: int | None = None
    voices_path: str = "voices.npz"
    speed_priors: dict = field(default_factory=dict)
    voice_aliases: dict = field(default_factory=dict)
    plbert: kk.PLBertConfig = field(default_factory=kk.PLBertConfig)
    istftnet: kk.ISTFTNetConfig = field(default_factory=kk.ISTFTNetConfig)
    quantization: dict | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "KittenTTSConfig":
        keys = set(cls.__dataclass_fields__) - {"plbert", "istftnet"}
        kw = {k: v for k, v in d.items() if k in keys}
        kw["plbert"] = kk.PLBertConfig.from_dict(d.get("plbert") or {})
        kw["istftnet"] = kk.ISTFTNetConfig.from_dict(d.get("istftnet") or {})
        kw["speed_priors"] = d.get("speed_priors") or {}
        kw["voice_aliases"] = d.get("voice_aliases") or {}
        return cls(**kw)

    def as_kokoro(self) -> kk.KokoroConfig:
        """Shared-forward shim: the Kokoro functions only read these."""
        return kk.KokoroConfig(
            n_layer=self.n_layer, style_dim=self.style_dim,
            hidden_dim=self.hidden_dim, max_dur=self.max_dur,
            text_encoder_kernel_size=self.text_encoder_kernel_size,
            sample_rate=self.sample_rate, plbert=self.plbert,
            istftnet=self.istftnet)


def sanitize(weights: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """.alphaN. list keys -> alphaN_ names, then the Kokoro weight-norm
    fold + MLX conv transpose (KittenTTSModel.sanitize,
    KittenTTSModel.swift:312-320)."""
    renamed = {k.replace(".alpha1.", ".alpha1_").replace(
        ".alpha2.", ".alpha2_"): v for k, v in weights.items()}
    return kk.sanitize(renamed)


class KittenTTS:
    def __init__(self, config: KittenTTSConfig, params,
                 voices: dict[str, np.ndarray] | None = None,
                 text_processor=None, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.voices = voices or {}
        self.text_processor = text_processor
        self.dtype = dtype
        self.sample_rate = config.sample_rate
        self._kcfg = config.as_kokoro()

    def default_generation_parameters(self) -> AudioGenerateParameters:
        return AudioGenerateParameters(temperature=0.0, top_p=1.0)

    @classmethod
    def from_pretrained(cls, repo_or_path: str,
                        dtype=jnp.float32) -> "KittenTTS":
        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = KittenTTSConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(
            model_dir, sanitize=sanitize, dtype=dtype,
            exclude_files=("voices.safetensors",))
        voices = {}
        vf = model_dir / "voices.safetensors"
        if vf.exists():
            from safetensors.numpy import load_file

            voices = {k: np.asarray(v, np.float32)
                      for k, v in load_file(str(vf)).items()}
        from tpu_audio.models.g2p.misaki import MisakiTextProcessor

        # offline-safe: None (raw-phoneme passthrough) when neither the model
        # dir nor the hub cache ships the kitten-tts-g2p lexicons
        processor = MisakiTextProcessor.try_load(model_dir)
        return cls(config, params, voices, processor, dtype)

    # -- inputs -----------------------------------------------------------------

    def prepare_inputs(self, text: str, voice: str | None,
                       language: str | None = None):
        """(input_ids [1, T], ref style [1, 256], speed)
        (prepareInputs, KittenTTSModel.swift:146-171)."""
        key = voice or "expr-voice-5-m"
        key = self.config.voice_aliases.get(key, key)
        if key not in self.voices:
            avail = ", ".join(sorted(self.voices))
            raise AudioGenerationError(
                f"Voice {key!r} not available. Choose from: {avail}")
        emb = self.voices[key]
        speed = float(self.config.speed_priors.get(key, 1.0))
        phonemes = (self.text_processor.process(text, language)
                    if self.text_processor else text)
        tokens = clean_text(phonemes)
        ids = np.asarray([[0] + tokens + [0]], np.int32)
        ref_idx = min(len(text), emb.shape[0] - 1)
        return ids, emb[ref_idx: ref_idx + 1], speed

    # -- forward (KittenTTSModel.callAsFunction, KittenTTSModel.swift:50-90) ----

    def forward(self, input_ids: np.ndarray, ref_s: np.ndarray,
                speed: float = 1.0, seed: int = 0):
        cfg = self._kcfg
        ids = jnp.asarray(input_ids)
        t = ids.shape[1]
        pad_mask = jnp.zeros((1, t), bool)
        att = jnp.ones((1, t), jnp.int32)

        bert_out = kk.albert_forward(self.params["bert"], ids, att,
                                     cfg.plbert)
        d_en = nn.linear(self.params["bert_encoder"], bert_out)

        ref_s = jnp.asarray(ref_s, jnp.float32)
        global_style = ref_s[:, cfg.style_dim:]
        acoustic_style = ref_s[:, : cfg.style_dim]

        pred = self.params["predictor"]
        d = kk.duration_encoder_forward(pred["text_encoder"], d_en,
                                        global_style, pad_mask, cfg)
        x = kk.bilstm(pred["lstm"], d)
        duration = nn.linear(pred["duration_proj"], x)
        dur = jax.nn.sigmoid(duration).sum(-1) / speed
        dur = jnp.nan_to_num(dur, nan=1.0)
        # clip(round(dur), min: 1) — no upper clamp unlike Kokoro
        pred_dur = np.asarray(jnp.maximum(jnp.round(dur),
                                          1).astype(jnp.int32))[0]

        indices = np.repeat(np.arange(t), pred_dur)
        frames = len(indices)
        if frames == 0:
            return np.zeros((1,), np.float32), pred_dur
        aln = np.zeros((t, frames), np.float32)
        aln[indices, np.arange(frames)] = 1.0
        aln = jnp.asarray(aln[None])

        en = jnp.einsum("btc,btf->bfc", d, aln)
        f0, n_pred = kk.prosody_predict(pred, en, global_style)

        t_en = kk.text_encoder_forward(self.params["text_encoder"], ids,
                                       pad_mask, cfg)
        asr = jnp.einsum("btc,btf->bfc", t_en, aln)

        audio = kk.decoder_forward(self.params["decoder"], asr, f0, n_pred,
                                   acoustic_style, cfg,
                                   jax.random.PRNGKey(seed),
                                   phase_unwrap=False)
        return np.asarray(audio[0]).reshape(-1), pred_dur

    # -- public API ---------------------------------------------------------------

    def generate(self, text: str, voice: str | None = None, ref_audio=None,
                 ref_text: str | None = None, language: str | None = None,
                 generation_parameters: AudioGenerateParameters | None = None
                 ) -> np.ndarray:
        del ref_audio, ref_text
        gp = generation_parameters or self.default_generation_parameters()
        ids, ref_s, speed = self.prepare_inputs(text, voice, language)
        audio, _ = self.forward(ids, ref_s, speed=speed, seed=gp.seed or 0)
        return audio

    def generate_stream(self, text: str, voice: str | None = None,
                        ref_audio=None, ref_text: str | None = None,
                        language: str | None = None,
                        generation_parameters: AudioGenerateParameters
                        | None = None):
        t0 = time.perf_counter()
        audio = self.generate(text, voice, ref_audio, ref_text, language,
                              generation_parameters)
        yield AudioGeneration.from_audio(audio)
        yield AudioGeneration.from_info(AudioGenerationInfo(
            generate_time=time.perf_counter() - t0,
            audio_duration=len(audio) / self.sample_rate))
