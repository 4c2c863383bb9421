"""LFM2.5-Audio tests: preprocessor, conformer+adapter encode, hybrid
backbone caching, depthformer frame sampling, interleaved/sequential
generation, detokenizer ISTFT."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_audio.core import nn
from tpu_audio.models.sts import load_model
from tpu_audio.models.sts.lfm_audio import (
    AUDIO_START_TOKEN,
    LFM2Audio,
    LFM2BackboneConfig,
    audio_token_count,
    lfm2_forward,
    lfm2_make_cache,
    preprocess_audio,
)

from fixtures import make_lfm_audio_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_lfm_audio_fixture(
        tmp_path_factory.mktemp("lfm"))))


def test_factory(model):
    assert isinstance(model, LFM2Audio)
    assert model.config.codebooks == 2
    assert model.config.lfm.attn_idxs == {1}
    assert model.detok_params is not None


def test_sanitize_layout(model):
    p = model.params
    # conformer.* -> audio_encoder.* with renamed norms
    l0 = p["audio_encoder"]["layers"]["0"]
    assert "ff1_norm" in l0 and "attn" in l0
    assert "pos_proj" in l0["attn"]
    # adapter model.N -> norm + linears
    assert "norm" in p["audio_adapter"]
    assert "0" in p["audio_adapter"]["linears"]
    # depthformer fused qkv split
    attn = p["audio_head"]["depthformer"]["blocks"]["0"]["attn"]
    assert attn["q_proj"]["weight"].shape == (8, 8)
    assert attn["k_proj"]["weight"].shape == (4, 8)


def test_preprocessor(model):
    audio = np.sin(np.arange(3200) / 10).astype(np.float32)
    mel = preprocess_audio(audio, model.config.preprocessor)
    assert mel.shape[1] == 8
    assert np.isfinite(mel).all()
    # per-feature normalized
    assert abs(mel.mean()) < 1.0


def test_audio_token_count():
    assert audio_token_count(80) == 10
    assert audio_token_count(8) == 1


def test_encode_audio(model):
    audio = np.sin(np.arange(3200) / 10).astype(np.float32)
    emb = np.asarray(model.encode_audio(audio))
    assert emb.ndim == 3 and emb.shape[2] == 16
    assert np.isfinite(emb).all()


def test_sequential_generation_text(model):
    text, codes = model.generate(
        text_tokens=np.asarray([[1, 50, 52]], np.int32),
        max_new_tokens=5, temperature=0.0)
    assert len(text) <= 5
    assert all(0 <= t < 200 for t in text)


def test_sequential_audio_mode(model):
    # prompt ending in <|audio_start|> switches straight to audio frames
    text, codes = model.generate(
        text_tokens=np.asarray([[1, 50, AUDIO_START_TOKEN]], np.int32),
        max_new_tokens=4, temperature=0.0, audio_temperature=0.0)
    assert codes.shape[0] == 2  # K codebooks
    assert codes.shape[1] <= 4


def test_interleaved_generation(model):
    text, codes = model.generate(
        text_tokens=np.asarray([[1, 50]], np.int32),
        max_new_tokens=8, temperature=0.0, audio_temperature=0.0,
        interleaved=True)
    # n_text=2 then n_audio=3 alternation: both modalities appear
    assert len(text) + codes.shape[1] <= 8


def test_chat_segments_with_audio(model):
    audio = np.sin(np.arange(3200) / 9).astype(np.float32)
    segments = model.build_chat("system prompt", user_audio=audio,
                                assistant_modality="text")
    kinds = [k for k, _ in segments]
    assert kinds == ["text", "audio_embeds", "text"]
    text, codes = model.generate(text_tokens=segments, max_new_tokens=3,
                                 temperature=0.0)
    assert len(text) <= 3


def test_detokenizer(model):
    codes = np.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], np.int32)
    wav = model.decode_audio(codes)
    # 4 frames * upsample 2 = 8 detok positions, hop 2, n_fft 8
    assert wav.ndim == 1 and len(wav) > 0
    assert np.isfinite(wav).all()
    # EOS frames stripped
    eos = np.asarray([[2048, 1], [2048, 5]], np.int32)
    wav2 = model.decode_audio(eos)
    assert np.isfinite(wav2).all()


# ---------------------------------------------------------------------------
# torch parity: the LFM2 hybrid backbone vs transformers Lfm2Model
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def lfm2_pair():
    torch = pytest.importorskip("torch")
    from transformers import Lfm2Config, Lfm2Model

    hf_cfg = Lfm2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        layer_types=["conv", "full_attention", "conv", "full_attention"],
        conv_L_cache=3, block_auto_adjust_ff_dim=False, norm_eps=1e-5,
        rope_theta=1e6, conv_bias=False)
    torch.manual_seed(11)
    hf = Lfm2Model(hf_cfg).eval()
    cfg = LFM2BackboneConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, norm_eps=1e-5,
        conv_L_cache=3, rope_theta=1e6, block_ff_dim=64,
        block_auto_adjust_ff_dim=False,
        layer_types=["conv", "full_attention", "conv", "full_attention"])
    return hf, cfg


def _lfm2_params(hf):
    """HF state_dict -> the repo's lfm2 tree (names already line up; conv
    weights are torch [C, 1, K] depthwise == our conv1d layout)."""
    from tpu_audio.core import loading

    flat = {k: jnp.asarray(v.detach().numpy())
            for k, v in hf.state_dict().items()}
    return loading.unflatten(flat)


def test_lfm2_backbone_torch_parity(lfm2_pair):
    """lfm2_forward hidden states == transformers Lfm2Model (gated
    short-conv layers + qk-normed GQA attention + SwiGLU; the LFM2.5-Audio
    backbone was previously self-pinned only)."""
    torch = pytest.importorskip("torch")

    hf, cfg = lfm2_pair
    params = _lfm2_params(hf)
    tokens = np.asarray([[3, 17, 42, 8, 61, 55, 7, 30]], np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(tokens, dtype=torch.long)).last_hidden_state
    embeds = nn.embedding(params["embed_tokens"], jnp.asarray(tokens))
    caches = lfm2_make_cache(cfg, 1, 16)
    got, _ = lfm2_forward(params, embeds, caches, cfg)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=3e-5, rtol=2e-4)


def test_lfm2_backbone_cached_step_torch_parity(lfm2_pair):
    """KV/conv-cached incremental steps reproduce the full-sequence torch
    states (the streaming-decode path: attention KV rows + conv L-1
    carries)."""
    torch = pytest.importorskip("torch")

    hf, cfg = lfm2_pair
    params = _lfm2_params(hf)
    tokens = np.asarray([[5, 9, 23, 61, 2, 44]], np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(tokens, dtype=torch.long)).last_hidden_state
    embeds = nn.embedding(params["embed_tokens"], jnp.asarray(tokens))
    caches = lfm2_make_cache(cfg, 1, 16)
    out1, caches = lfm2_forward(params, embeds[:, :3], caches, cfg)
    outs = [np.asarray(out1)]
    for i in (3, 4, 5):
        step, caches = lfm2_forward(params, embeds[:, i:i + 1], caches, cfg)
        outs.append(np.asarray(step))
    np.testing.assert_allclose(np.concatenate(outs, axis=1),
                               want.numpy(), atol=3e-5, rtol=2e-4)
