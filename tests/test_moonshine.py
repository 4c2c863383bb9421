"""Moonshine tests: golden parity vs HF transformers + cached-decode parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.core import kv_cache
from tpu_audio.core.generation import STTGenerateParameters
from tpu_audio.models.stt.moonshine import Moonshine, decoder_step


@pytest.fixture(scope="module")
def hf_pair(tmp_path_factory):
    import torch
    from transformers import MoonshineConfig as HFCfg
    from transformers import MoonshineForConditionalGeneration

    torch.manual_seed(0)
    cfg = HFCfg(hidden_size=32, intermediate_size=64,
                encoder_num_hidden_layers=2, decoder_num_hidden_layers=2,
                encoder_num_attention_heads=4, decoder_num_attention_heads=4,
                encoder_num_key_value_heads=4, decoder_num_key_value_heads=4,
                vocab_size=64, partial_rotary_factor=0.9)
    hf = MoonshineForConditionalGeneration(cfg).eval()
    d = tmp_path_factory.mktemp("moonshine_hf")
    hf.save_pretrained(d, safe_serialization=True)
    return Moonshine.from_pretrained(str(d)), hf


def test_logits_match_transformers(hf_pair):
    import torch

    model, hf = hf_pair
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((1, 16000)).astype(np.float32) * 0.1
    tokens = np.asarray([[1, 5, 9, 3]], np.int64)
    enc = model._encode(model.params, jnp.asarray(audio))
    logits, _ = decoder_step(model.params, jnp.asarray(tokens, jnp.int32),
                             enc, None, model.config)
    with torch.no_grad():
        want = hf(input_values=torch.from_numpy(audio),
                  decoder_input_ids=torch.from_numpy(tokens)).logits.numpy()
    np.testing.assert_allclose(np.asarray(logits), want, atol=3e-4)


def test_cached_decode_matches_full(hf_pair):
    model, _ = hf_pair
    cfg = model.config
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((1, 8000)).astype(np.float32) * 0.1
    enc = model._encode(model.params, jnp.asarray(audio))
    seq = [1, 7, 3, 9]
    full, _ = decoder_step(model.params, jnp.asarray([seq], jnp.int32),
                           enc, None, cfg)
    cache = kv_cache.init_cache(cfg.decoder_num_hidden_layers, 1,
                                cfg.decoder_num_key_value_heads,
                                cfg.head_dim, 8, jnp.float32)
    steps = []
    for t in seq:
        lg, cache = decoder_step(model.params, jnp.asarray([[t]], jnp.int32),
                                 enc, cache, cfg)
        steps.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.stack(steps), np.asarray(full[0]), atol=2e-4)


def test_generate(hf_pair):
    model, _ = hf_pair
    audio = np.random.default_rng(2).standard_normal(8000).astype(np.float32) * 0.1
    out = model.generate(audio, STTGenerateParameters(max_tokens=6))
    assert out.generation_token_count <= 6
    assert out.total_time > 0
