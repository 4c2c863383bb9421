"""Canary tests: prompt build, cached-vs-full decoder parity, generate."""

import numpy as np
import pytest

from tpu_audio.models.stt import load_model
from tpu_audio.models.stt.canary import Canary, decoder_forward

from fixtures import make_canary_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_canary_fixture(
        tmp_path_factory.mktemp("canary"))))


def test_factory_and_sanitize(model):
    assert isinstance(model, Canary)
    p = model.params
    assert "blocks" in p["decoder"]
    assert "q_proj" in p["decoder"]["blocks"]["0"]["self_attn"]
    assert "output_proj" in p["decoder"]
    # encoder went through parakeet renumbering
    assert "conv0" in p["encoder"]["pre_encode"]


def test_prompt_tokens(model):
    tok = model.tokenizer
    prompt = tok.build_prompt("en", "en")
    assert prompt[:3] == [0, 1, 2]
    assert 4 in prompt  # <|en|> twice (src+tgt)
    assert prompt.count(4) == 2
    assert 6 in prompt  # <|pnc|>
    assert tok.eos_id == 3
    nopnc = tok.build_prompt("de", "de", pnc=False)
    assert 7 in nopnc and 6 not in nopnc


def test_cached_decode_matches_full(model):
    """The KV-cached step loop must reproduce the full decoder pass."""
    import jax.numpy as jnp
    from tpu_audio.core import kv_cache
    from tpu_audio.models.stt.canary import _cross_kv, _decoder_step

    cfg = model.config
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.standard_normal((1, 12, cfg.enc_output_dim))
                      .astype(np.float32) * 0.3)
    tokens = np.array([[0, 1, 2, 5, 9, 11]], np.int32)
    full = np.asarray(decoder_forward(model.params, jnp.asarray(tokens),
                                      enc, cfg))
    ck, cv = _cross_kv(model.params, enc, cfg)
    cache = kv_cache.init_cache(
        cfg.decoder.num_layers, 1, cfg.decoder.num_attention_heads,
        cfg.enc_output_dim // cfg.decoder.num_attention_heads, 16,
        jnp.float32)
    step_logits = []
    for t in range(tokens.shape[1]):
        lg, cache = _decoder_step(model.params, jnp.asarray(tokens[:, t:t+1]),
                                  cache, ck, cv, None, cfg)
        step_logits.append(np.asarray(lg)[0])
    np.testing.assert_allclose(np.stack(step_logits), full[0], atol=2e-4)


def test_generate(model):
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    out = model.generate(audio)
    assert isinstance(out.text, str)
    assert out.language == "en"
    assert out.prompt_token_count >= 3
    out2 = model.generate(audio)
    assert out.text == out2.text


def test_generate_respects_max_tokens(model):
    from tpu_audio.core.generation import STTGenerateParameters

    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    out = model.generate(audio, STTGenerateParameters(max_tokens=5))
    assert out.generation_token_count <= 5


def test_stream_wrapper(model):
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    events = list(model.generate_stream(audio))
    assert events[-1]["type"] == "result"
