"""VoxtralRealtime tests: frontend, lockstep decode, streaming parity."""

import numpy as np
import pytest

from tpu_audio.core.generation import STTGenerateParameters
from tpu_audio.models.stt import load_model
from tpu_audio.models.stt.voxtral import (
    VoxtralRealtime,
    num_audio_tokens,
)

from fixtures import make_voxtral_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_voxtral_fixture(
        tmp_path_factory.mktemp("voxtral"))))


def test_factory(model):
    assert isinstance(model, VoxtralRealtime)
    assert model.config.eos_token_id == 2
    # raw keys were remapped
    assert "transformer_layers" in model.params["encoder"]
    assert "ada_rms_norm_t_cond" in model.params["decoder"]["layers"]["0"]


def test_num_audio_tokens():
    # 12.5 Hz: 1280 samples/token; hop-aligned vs unaligned rounding
    assert num_audio_tokens(1280) == 1
    assert num_audio_tokens(16000) == 13  # 100 frames -> ceil(100/8)
    assert num_audio_tokens(1281) == 1    # ceil(1281/160 - 1) = 8 frames
    assert num_audio_tokens(0) == 0


def test_prepare_mel_even_frames(model):
    audio = np.zeros(1600, np.float32)
    mel, n_delay = model.prepare_mel(audio, None)
    assert n_delay == 1  # 80 ms at 12.5 Hz
    assert mel.shape[1] == model.config.num_mel_bins
    assert mel.shape[0] % 2 == 0


def test_generate(model):
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(1600).astype(np.float32) * 0.1
    out = model.generate(audio, STTGenerateParameters(max_tokens=32))
    assert out.prompt_token_count == 3  # 1 bos + 1 left pad + 1 delay
    assert isinstance(out.text, str)
    assert out.generation_token_count >= 0


def test_generate_deterministic(model):
    rng = np.random.default_rng(1)
    audio = rng.standard_normal(1600).astype(np.float32) * 0.1
    a = model.generate(audio, STTGenerateParameters(max_tokens=16))
    b = model.generate(audio, STTGenerateParameters(max_tokens=16))
    assert a.text == b.text


def test_streaming_matches_offline(model):
    """Single-block audio: the chunk-fed session must produce the same
    token sequence as the offline lockstep decode."""
    rng = np.random.default_rng(2)
    audio = rng.standard_normal(1600).astype(np.float32) * 0.1
    offline = model.generate(audio, STTGenerateParameters(max_tokens=64))

    session = model.make_stream_session(max_tokens=64)
    chunk = 480
    for s in range(0, len(audio), chunk):
        session.step(audio[s : s + chunk])
    session.finish()
    stream_text = session.text.strip()
    assert stream_text == offline.text


def test_streaming_feed_size_invariance(model):
    """Different chunk cadences must give identical transcripts."""
    rng = np.random.default_rng(3)
    audio = rng.standard_normal(2400).astype(np.float32) * 0.1
    texts = []
    for chunk in (320, 800):
        session = model.make_stream_session(max_tokens=64)
        for s in range(0, len(audio), chunk):
            session.step(audio[s : s + chunk])
        session.finish()
        texts.append(session.text)
    assert texts[0] == texts[1]


def test_chunked_encoder_long_audio(model):
    """Audio exceeding the encoder sliding window takes the chunked path."""
    rng = np.random.default_rng(4)
    audio = rng.standard_normal(8000).astype(np.float32) * 0.1
    mel, _ = model.prepare_mel(audio, None)
    adapter, n_total = model.encode_audio(mel)
    assert adapter.shape[0] == n_total
    assert n_total > model.config.encoder.sliding_window // 4


def test_generate_stream_events(model):
    rng = np.random.default_rng(5)
    audio = rng.standard_normal(1600).astype(np.float32) * 0.1
    events = list(model.generate_stream(
        audio, STTGenerateParameters(max_tokens=32)))
    assert events[-1]["type"] == "result"
    joined = "".join(e["text"] for e in events if e["type"] == "token")
    assert joined.strip() == events[-1]["output"].text


# ---------------------------------------------------------------------------
# torch parity: the Mistral-style decoder core vs transformers MistralModel
# ---------------------------------------------------------------------------


def _unpermute_rope(w, n_heads, head_dim):
    """HF stores q/k projections permuted for half-rotation rope; the repo
    decoder uses the original interleaved layout — invert the permutation."""
    w = w.reshape(n_heads, 2, head_dim // 2, -1)
    return np.ascontiguousarray(
        w.transpose(0, 2, 1, 3).reshape(n_heads * head_dim, -1))


def _mistral_to_voxtral_params(m, cfg):
    """transformers MistralModel state_dict -> the repo's decoder tree."""
    import jax.numpy as jnp
    from tpu_audio.core import loading

    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    nh, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)
    flat = {"decoder.norm.weight": sd["norm.weight"],
            "decoder.tok_embeddings.weight": sd["embed_tokens.weight"]}
    for i in range(cfg.num_hidden_layers):
        src, dst = f"layers.{i}.", f"decoder.layers.{i}."
        flat[dst + "attention.wq.weight"] = _unpermute_rope(
            sd[src + "self_attn.q_proj.weight"], nh, hd)
        flat[dst + "attention.wk.weight"] = _unpermute_rope(
            sd[src + "self_attn.k_proj.weight"], nkv, hd)
        flat[dst + "attention.wv.weight"] = sd[src + "self_attn.v_proj.weight"]
        flat[dst + "attention.wo.weight"] = sd[src + "self_attn.o_proj.weight"]
        flat[dst + "attention_norm.weight"] = sd[src + "input_layernorm.weight"]
        flat[dst + "ffn_norm.weight"] = sd[src + "post_attention_layernorm.weight"]
        flat[dst + "feed_forward_w1.weight"] = sd[src + "mlp.gate_proj.weight"]
        flat[dst + "feed_forward_w2.weight"] = sd[src + "mlp.down_proj.weight"]
        flat[dst + "feed_forward_w3.weight"] = sd[src + "mlp.up_proj.weight"]
    return loading.unflatten(
        {k: jnp.asarray(v, jnp.float32) for k, v in flat.items()})


@pytest.fixture(scope="module")
def mistral_pair():
    torch = pytest.importorskip("torch")
    from transformers import MistralConfig, MistralModel

    cfg = MistralConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        vocab_size=48, max_position_embeddings=128, rope_theta=1e6,
        sliding_window=64, rms_norm_eps=1e-5,
        attn_implementation="eager")
    torch.manual_seed(7)
    return cfg, MistralModel(cfg).eval()


def test_decoder_torch_parity_prefill(mistral_pair):
    """decoder_pass hidden states == transformers MistralModel on the same
    weights (interleaved-RoPE GQA + sliding window + SwiGLU + RMSNorm;
    VoxtralRealtimeDecoder.swift core), ada modulation off."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from tpu_audio.core import kv_cache
    from tpu_audio.models.stt.voxtral import (VoxtralDecoderConfig,
                                              decoder_pass)

    cfg, m = mistral_pair
    params = _mistral_to_voxtral_params(m, cfg)
    dcfg = VoxtralDecoderConfig(
        dim=32, n_layers=2, n_heads=4, n_kv_heads=2, head_dim=8,
        hidden_dim=64, vocab_size=48, rope_theta=1e6, sliding_window=64,
        ada_rms_norm_t_cond=False)

    rng = np.random.default_rng(0)
    embeds = rng.standard_normal((1, 7, 32)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = m(inputs_embeds=torch.from_numpy(embeds)).last_hidden_state

    cache = kv_cache.init_cache(2, 1, 2, 8, 32, dtype=jnp.float32)
    ada = jnp.zeros((2, 32), jnp.float32)
    out, _ = decoder_pass(params, jnp.asarray(embeds), cache, ada, dcfg)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               atol=3e-5, rtol=2e-4)


def test_decoder_torch_parity_incremental(mistral_pair):
    """KV-cached one-token steps reproduce the full-sequence torch states."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from tpu_audio.core import kv_cache
    from tpu_audio.models.stt.voxtral import (VoxtralDecoderConfig,
                                              decoder_pass)

    cfg, m = mistral_pair
    params = _mistral_to_voxtral_params(m, cfg)
    dcfg = VoxtralDecoderConfig(
        dim=32, n_layers=2, n_heads=4, n_kv_heads=2, head_dim=8,
        hidden_dim=64, vocab_size=48, rope_theta=1e6, sliding_window=64,
        ada_rms_norm_t_cond=False)

    rng = np.random.default_rng(1)
    embeds = rng.standard_normal((1, 6, 32)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = m(inputs_embeds=torch.from_numpy(embeds)).last_hidden_state

    cache = kv_cache.init_cache(2, 1, 2, 8, 32, dtype=jnp.float32)
    ada = jnp.zeros((2, 32), jnp.float32)
    outs = []
    for t in range(6):
        out, cache = decoder_pass(params, jnp.asarray(embeds[:, t:t+1]),
                                  cache, ada, dcfg)
        outs.append(np.asarray(out)[0, 0])
    np.testing.assert_allclose(np.stack(outs), ref.numpy()[0],
                               atol=3e-5, rtol=2e-4)
