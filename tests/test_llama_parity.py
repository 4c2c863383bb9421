"""Golden parity of the shared Llama-family backbone vs torch.

``tpu_audio.models.llama.forward`` serves Orpheus, VyvoTTS, Qwen3-TTS,
Chatterbox T3, MossTTS, GLM/Granite/Qwen3 ASR and OmniVoice; this pins
its math (GQA, rope, qk-norm, tied heads, KV-cached stepping) to the
transformers reference implementations within float tolerance."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_audio.core import kv_cache
from tpu_audio.models import llama


def _to_params(hf_model):
    return {k: v.numpy() for k, v in hf_model.state_dict().items()}


def _nested(flat):
    from tpu_audio.core import loading

    return loading.unflatten(flat)


@pytest.fixture(scope="module")
def qwen3():
    import torch
    from transformers import Qwen3Config, Qwen3ForCausalLM

    cfg = Qwen3Config(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=True, attention_dropout=0.0)
    torch.manual_seed(0)
    model = Qwen3ForCausalLM(cfg).eval()
    ours = llama.LlamaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=True, qk_norm=True)
    return model, ours


def test_qwen3_full_forward_matches(qwen3):
    import torch

    hf, cfg = qwen3
    tokens = np.asarray([[3, 17, 42, 8, 91, 55, 7]], np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    params = _nested(_to_params(hf))
    got, _ = llama.forward(params, jnp.asarray(tokens), None, cfg)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_qwen3_cached_decode_matches_full(qwen3):
    import torch

    hf, cfg = qwen3
    tokens = np.asarray([[5, 9, 23, 61, 2, 44]], np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    params = _nested(_to_params(hf))
    cache = llama.make_cache(cfg, 1, 16, jnp.float32)
    # prefill 4, then step the last 2 one at a time
    out1, cache = llama.forward(params, jnp.asarray(tokens[:, :4]), cache,
                                cfg)
    outs = [np.asarray(out1)]
    for i in (4, 5):
        step, cache = llama.forward(params, jnp.asarray(tokens[:, i:i + 1]),
                                    cache, cfg)
        outs.append(np.asarray(step))
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_llama_gqa_rope_matches():
    import torch
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HFLlamaConfig(
        vocab_size=80, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=500000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
        attention_bias=False, attention_dropout=0.0)
    torch.manual_seed(1)
    hf = LlamaForCausalLM(hf_cfg).eval()
    cfg = llama.LlamaConfig(
        vocab_size=80, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=500000.0, rms_norm_eps=1e-5, tie_word_embeddings=False)
    tokens = np.asarray([[1, 7, 33, 12, 70]], np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(tokens, dtype=torch.long)).logits.numpy()
    params = _nested(_to_params(hf))
    got, _ = llama.forward(params, jnp.asarray(tokens), None, cfg)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_bidirectional_matches_torch_no_mask(qwen3):
    """causal=False (OmniVoice NAR mode) equals torch with a full-ones
    attention mask... torch has no such mode for causal LM; instead verify
    internal consistency: permuting positions of a bidirectional forward
    with identity rope would commute. Here we simply check causal=False
    differs from causal=True beyond the first position and stays finite."""
    hf, cfg = qwen3
    params = _nested(_to_params(hf))
    tokens = jnp.asarray([[3, 17, 42, 8]], jnp.int32)
    causal, _ = llama.forward(params, tokens, None, cfg)
    bidir, _ = llama.forward(params, tokens, None, cfg, causal=False)
    assert np.isfinite(np.asarray(bidir)).all()
    # first position sees the future under bidirectional attention
    assert not np.allclose(np.asarray(causal)[0, 0], np.asarray(bidir)[0, 0])
    # an explicit all-true attn_mask is exactly full bidirectional
    ones = jnp.ones((1, 1, 4, 4), bool)
    masked, _ = llama.forward(params, tokens, None, cfg, causal=False,
                              attn_mask=ones)
    np.testing.assert_allclose(np.asarray(masked), np.asarray(bidir),
                               atol=1e-6)
