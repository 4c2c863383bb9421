"""OmniVoice tests: HiggsAudio codec roundtrip, sinc resample, phonetic
duration rules, diffusion schedule, mask-predict loop (auto voice,
voice design, voice cloning), fused-weight sanitize split."""

import numpy as np
import pytest

from tpu_audio.codecs.higgs_audio import HiggsAudioTokenizer, sinc_resample
from tpu_audio.models.tts import load_model
from tpu_audio.models.tts.omnivoice import (
    OmniVoice,
    OmniVoiceGenerateParameters,
    estimate_rule_duration_tokens,
    get_time_steps,
    phonetic_weight,
)

from fixtures import make_higgs_audio_fixture, make_omnivoice_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_omnivoice_fixture(
        tmp_path_factory.mktemp("omnivoice"))))


@pytest.fixture(scope="module")
def codec(tmp_path_factory):
    return HiggsAudioTokenizer.from_pretrained(str(make_higgs_audio_fixture(
        tmp_path_factory.mktemp("higgs"))))


def test_factory(model):
    assert isinstance(model, OmniVoice)
    assert model.audio_tokenizer is not None
    # fused [C*V, H] tables were split per codebook
    assert set(model.params["audio_embeddings"]) == {"0", "1"}
    assert model.params["audio_heads"]["0"]["weight"].shape == (17, 16)
    # offsets buffer dropped
    assert "codebook_layer_offsets" not in str(model.params.keys())


def test_codec_roundtrip(codec):
    audio = np.sin(np.arange(1024) / 9).astype(np.float32) * 0.4
    codes = codec.encode(audio)
    assert codes.shape[0] == 2  # [C, T]
    assert codes.dtype == np.int32
    assert (codes >= 0).all() and (codes < 16).all()
    wav = codec.decode(codes)
    assert wav.ndim == 1 and len(wav) == codes.shape[1] * codec.acoustic_hop
    assert np.isfinite(wav).all()


def test_sinc_resample():
    t = np.arange(1600) / 1600
    x = np.sin(2 * np.pi * 20 * t).astype(np.float32)
    y = sinc_resample(x, 24000, 16000)
    assert len(y) == int(np.ceil(len(x) * 2 / 3))
    # a 20-cycle sine survives a 2/3 downsample nearly unchanged
    ref = np.sin(2 * np.pi * 20 * np.arange(len(y)) / len(y))
    assert np.abs(y[50:-50] - ref[50:-50]).max() < 0.05
    assert sinc_resample(x, 16000, 16000) is not None


def test_phonetic_weights():
    assert phonetic_weight("a") == 1.0
    assert phonetic_weight(" ") == 0.2
    assert phonetic_weight("5") == 3.5
    assert phonetic_weight(".") == 0.5
    assert phonetic_weight("中") == 3.0  # CJK
    assert phonetic_weight("あ") == 2.2  # kana
    assert phonetic_weight("한") == 2.5  # hangul syllable


def test_rule_duration():
    short = estimate_rule_duration_tokens("Hi.")
    longer = estimate_rule_duration_tokens(
        "This is a much longer sentence with many more words in it.")
    assert 0 < short < longer
    # low-threshold boost compresses very short texts upward
    assert short > estimate_rule_duration_tokens("Hi.", boost_strength=1.0)


def test_time_steps():
    ts = get_time_steps(0.0, 1.0, 8, 0.1)
    assert len(ts) == 9
    assert ts[0] == 0.0 and ts[-1] == pytest.approx(1.0)
    assert (np.diff(ts) > 0).all()
    # t_shift < 1 front-loads small steps
    assert ts[4] < 0.5


def test_generate_auto_voice(model):
    wav = model.generate("w1 w2 w3", ov_parameters=OmniVoiceGenerateParameters(
        num_step=3, seed=0))
    assert wav.ndim == 1 and len(wav) > 0
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() <= 0.5 + 1e-5  # peak normalized


def test_generate_voice_design(model):
    wav = model.generate("w1 w2", voice="w9 w10",
                         ov_parameters=OmniVoiceGenerateParameters(
                             num_step=2, seed=1))
    assert np.isfinite(wav).all()


def test_generate_voice_clone(model):
    ref = np.sin(np.arange(2048) / 7).astype(np.float32) * 0.3
    wav = model.generate("w1 w2", ref_audio=ref, ref_text="w5 w6",
                         ov_parameters=OmniVoiceGenerateParameters(
                             num_step=2, seed=2, duration=0.1))
    assert np.isfinite(wav).all()


def test_generate_codes_unmask_complete(model):
    """Every valid target position must be revealed by the schedule."""
    codes = model.generate_codes(
        "w1 w2", params=OmniVoiceGenerateParameters(num_step=3, seed=0,
                                                    duration=0.05))
    assert (codes != model.config.audio_mask_id).all()
    assert codes.shape[0] == model.config.num_audio_codebook


def test_deterministic(model):
    p = OmniVoiceGenerateParameters(num_step=2, seed=5, duration=0.05)
    a = model.generate_codes("w1 w2", params=p)
    b = model.generate_codes("w1 w2", params=p)
    assert (a == b).all()
    c = model.generate_codes("w1 w2", params=OmniVoiceGenerateParameters(
        num_step=2, seed=6, duration=0.05))
    assert not (a == c).all()


def test_guidance_changes_output(model):
    a = model.generate_codes("w1 w2", params=OmniVoiceGenerateParameters(
        num_step=2, seed=0, duration=0.05, guidance_scale=0.0,
        position_temperature=0.0))
    b = model.generate_codes("w1 w2", params=OmniVoiceGenerateParameters(
        num_step=2, seed=0, duration=0.05, guidance_scale=4.0,
        position_temperature=0.0))
    assert not (a == b).all()


def test_class_temperature(model):
    wav = model.generate("w1", ov_parameters=OmniVoiceGenerateParameters(
        num_step=2, seed=0, duration=0.05, class_temperature=1.0))
    assert np.isfinite(wav).all()


def test_prompt_format(model):
    ids = model.build_prompt("w1 w2", language="en", instruct="w9",
                             has_ref=True)
    toks = [model.tokenizer.id_to_token(i) for i in ids]
    assert toks[0] == "<|denoise|>"
    assert "<|lang_start|>" in toks and "<|text_end|>" in toks
    ids2 = model.build_prompt("w1", has_ref=False)
    assert model.tokenizer.id_to_token(ids2[0]) == "<|lang_start|>"


def test_hubert_semantic_matches_transformers():
    """The HiggsAudio semantic trunk (mean over all hidden states) matches
    torch HubertModel bit-for-bit within float tolerance — validates the
    voice-clone encode path math."""
    import torch
    from transformers import HubertConfig, HubertModel

    from tpu_audio.codecs import higgs_audio as ha
    from tpu_audio.core import loading

    hf_cfg = HubertConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[8, 8], conv_kernel=[4, 2],
        conv_stride=[2, 2], conv_bias=False, feat_extract_norm="group",
        do_stable_layer_norm=False, num_conv_pos_embeddings=8,
        num_conv_pos_embedding_groups=2, feat_proj_dropout=0.0,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        layerdrop=0.0,
    )
    torch.manual_seed(0)
    hf = HubertModel(hf_cfg).eval()
    wav = torch.randn(1, 800) * 0.1
    with torch.no_grad():
        out = hf(wav, output_hidden_states=True)
    ref = torch.stack(out.hidden_states).mean(0).numpy()

    weights = {f"semantic_model.{k}": v.numpy()
               for k, v in hf.state_dict().items()}
    params = loading.unflatten(ha.sanitize(weights))
    cfg = ha.HiggsAudioConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=(8, 8), conv_kernel=(4, 2),
        conv_stride=(2, 2), num_conv_pos_embeddings=8,
        num_conv_pos_embedding_groups=2)
    got = np.asarray(ha.hubert_mean_hidden(
        params["semantic_model"], wav.numpy(), cfg.hubert_config()))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)
