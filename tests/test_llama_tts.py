"""LlamaTTS/Orpheus tests: prompt framing, code grouping, parse, the full
generate path (with a deterministic scripted step), streaming events, and
Llama backbone KV-cache parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.core.generation import AudioGenerateParameters, AudioGenerationKind
from tpu_audio.codecs.snac import SNAC
from tpu_audio.models import llama
from tpu_audio.models.tts import load_model
from tpu_audio.models.tts.llama_tts import (
    LlamaTTS,
    group_codes,
    ungroup_codes,
)

from fixtures import make_llama_tts_fixture, make_snac_fixture


@pytest.fixture(scope="module")
def snac(tmp_path_factory):
    return SNAC.from_pretrained(
        str(make_snac_fixture(tmp_path_factory.mktemp("snac4tts"),
                              vq_strides=(4, 2, 1))))


@pytest.fixture(scope="module")
def tts(tmp_path_factory, snac):
    path = make_llama_tts_fixture(tmp_path_factory.mktemp("orpheus"))
    model = load_model(str(path), dtype=jnp.float32)
    model.codec = snac
    return model


def test_factory_and_token_table(tts):
    assert isinstance(tts, LlamaTTS)
    assert tts.tokens.audio_token_offset == 100
    assert tts.tokens.codebook_size == 32
    assert tts.sample_rate == 24000


def test_group_ungroup_roundtrip():
    rng = np.random.default_rng(0)
    n = 5
    l1 = rng.integers(0, 4096, n).tolist()
    l2 = rng.integers(0, 4096, 2 * n).tolist()
    l3 = rng.integers(0, 4096, 4 * n).tolist()
    grouped = group_codes(l1, l2, l3)
    assert len(grouped) == 7 * n
    g1, g2, g3 = ungroup_codes(grouped)
    assert (g1, g2, g3) == (l1, l2, l3)


def test_prepare_input_ids_framing(tts):
    ids = tts.prepare_input_ids("hello world", voice="tara")
    T = tts.tokens
    assert ids[0] == T.start_of_human
    assert ids[-2:] == [T.end_of_text, T.end_of_human]
    # voice prefix: "tara : hello world" -> ids 62, 63, 60, 61
    assert ids[1:5] == [62, 63, 60, 61]


def test_parse_output(tts):
    T = tts.tokens
    seq = [1, 2, T.start_of_speech, 100, 101, 102, 103, 104, 105, 106,
           107, T.end_of_speech]
    codes = tts.parse_output(seq)
    assert codes == [0, 1, 2, 3, 4, 5, 6]  # trimmed to 7, offset removed
    # no SOS: keeps audio-range tokens only
    codes = tts.parse_output([1, 2, 100, 101, 102, 103, 104, 105, 106])
    assert codes == [0, 1, 2, 3, 4, 5, 6]


def _scripted_step(tts, n_groups=2):
    """A deterministic step_fn emitting valid audio frames then EOS."""
    T = tts.tokens
    cb = T.codebook_size
    vocab = tts.config.vocab_size
    layer_mult = np.asarray([0, 1, 2, 3, 4, 5, 6])
    prompt_len_holder = {}

    def step_fn(params, tok, cache):
        i = cache.offset - prompt_len_holder["plen"] + 1  # generated idx
        pos_in_group = i % 7
        code = (i * 3) % cb
        audio_tok = T.audio_token_offset + pos_in_group * cb + code
        tok_id = jnp.where(i >= 7 * n_groups, T.end_of_speech, audio_tok)
        logits = jax.nn.one_hot(tok_id, vocab)[None] * 100.0
        return logits, cache._replace(offset=cache.offset + 1)

    return step_fn, prompt_len_holder


def test_generate_full_path_scripted(tts):
    step_fn, holder = _scripted_step(tts, n_groups=3)
    tts._step_fn = step_fn
    tts._decoders.clear()
    prompt = tts.prepare_input_ids("hello world")
    holder["plen"] = 1 << max(6, int(np.ceil(np.log2(len(prompt)))))
    # run with greedy sampling
    params = AudioGenerateParameters(max_tokens=40, temperature=0.0,
                                     repetition_penalty=1.0)
    audio = tts.generate("hello world", generation_parameters=params)
    # 3 groups -> 12 latent frames -> 12*hop samples (snac fixture hop=4)
    assert audio.shape == (3 * 4 * tts.codec.config.hop_length,)
    assert np.isfinite(audio).all()
    tts._decoders.clear()


def test_generate_stream_events(tts):
    step_fn, holder = _scripted_step(tts, n_groups=2)
    tts._step_fn = step_fn
    tts._decoders.clear()
    prompt = tts.prepare_input_ids("hello")
    holder["plen"] = 1 << max(6, int(np.ceil(np.log2(len(prompt)))))
    params = AudioGenerateParameters(max_tokens=40, temperature=0.0,
                                     repetition_penalty=1.0,
                                     streaming_interval=0.01)
    events = list(tts.generate_stream("hello", generation_parameters=params))
    kinds = [e.kind for e in events]
    assert AudioGenerationKind.TOKEN in kinds
    assert AudioGenerationKind.AUDIO in kinds
    assert kinds[-1] == AudioGenerationKind.INFO
    total = sum(len(e.audio) for e in events if e.kind == AudioGenerationKind.AUDIO)
    assert total == 2 * 4 * tts.codec.config.hop_length
    info = events[-1].info
    assert info.generation_token_count == 14  # 2 groups x 7, EOS stripped
    tts._decoders.clear()


def test_llama_backbone_cache_parity():
    """Incremental KV-cached decode == full causal forward."""
    cfg = llama.LlamaConfig(
        hidden_size=32, num_hidden_layers=2, intermediate_size=64,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=50,
        rope_theta=10000.0,
    )
    params = llama.init_random_params(cfg, seed=0, dtype=jnp.float32)
    tokens = jnp.asarray([[3, 7, 1, 4, 9, 2]])

    full_logits, _ = llama.forward(params, tokens, None, cfg)

    cache = llama.make_cache(cfg, 1, 8, jnp.float32)
    step_logits = []
    for t in range(tokens.shape[1]):
        lg, cache = llama.forward(params, tokens[:, t : t + 1], cache, cfg)
        step_logits.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(
        np.stack(step_logits), np.asarray(full_logits[0]), atol=2e-4
    )


def test_llama_left_pad_invariance():
    """Bucketed left-padded prompts must produce the same logits as unpadded
    (valid_from masking + relative RoPE)."""
    cfg = llama.LlamaConfig(
        hidden_size=32, num_hidden_layers=2, intermediate_size=64,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=50,
        rope_theta=10000.0,
    )
    params = llama.init_random_params(cfg, seed=1, dtype=jnp.float32)
    prompt = [5, 8, 2, 9]

    cache = llama.make_cache(cfg, 1, 16, jnp.float32)
    logits_a, _ = llama.forward(params, jnp.asarray([prompt]), cache, cfg)

    pad = 4
    padded = [0] * pad + prompt
    cache_b = llama.make_cache(cfg, 1, 16, jnp.float32)
    cache_b = cache_b._replace(valid_from=jnp.asarray(pad, jnp.int32))
    logits_b, _ = llama.forward(params, jnp.asarray([padded]), cache_b, cfg)

    np.testing.assert_allclose(
        np.asarray(logits_a[0]), np.asarray(logits_b[0, pad:]), atol=2e-4
    )


def test_vyvo_qwen3_variant(tmp_path, snac):
    """VyvoTTS: qwen3 backbone (qk_norm) + SOA-fallback parsing."""
    from tpu_audio.models.tts.qwen3_vyvo import VyvoTTS

    path = make_llama_tts_fixture(tmp_path / "vyvo", qwen3=True)
    model = load_model(str(path), dtype=jnp.float32)
    assert isinstance(model, VyvoTTS)
    assert model.config.qk_norm
    model.codec = snac
    T = model.tokens
    # SOS present
    seq = [1, T.start_of_speech] + list(range(100, 107)) + [T.end_of_speech]
    assert model.parse_output(seq) == [0, 1, 2, 3, 4, 5, 6]
    # SOA fallback: no SOS, audio tokens after START_OF_AI
    seq2 = [1, T.audio_start, 5, 100, 101, 102, 103, 104, 105, 106]
    assert model.parse_output(seq2) == [0, 1, 2, 3, 4, 5, 6]
    # scripted end-to-end
    step_fn, holder = _scripted_step(model, n_groups=2)
    model._step_fn = step_fn
    model._decoders.clear()
    prompt = model.prepare_input_ids("hello")
    holder["plen"] = 1 << max(6, int(np.ceil(np.log2(len(prompt)))))
    params = AudioGenerateParameters(max_tokens=30, temperature=0.0,
                                     repetition_penalty=1.0)
    audio = model.generate("hello", generation_parameters=params)
    assert audio.shape == (2 * 4 * snac.config.hop_length,)


def test_band_head_logits_match_full_slice(tts, tmp_path):
    """The audio-band decode head must produce exactly the full head's
    logits at the band rows (7*codebook_size audio tokens + end_of_speech),
    and its sampled indices must map back to the same token ids a
    band-masked full head would pick."""
    # fresh instances: earlier tests swap the module fixture's _step_fn for
    # a scripted one
    full = LlamaTTS(tts.config, dict(tts.params), tts.tokenizer, tts.codec,
                    tts.tokens, dtype=jnp.float32)
    band = LlamaTTS(tts.config, dict(tts.params), tts.tokenizer, tts.codec,
                    tts.tokens, dtype=jnp.float32, audio_band_head=True)
    T = tts.tokens
    rows = np.concatenate([
        T.audio_token_offset + np.arange(7 * T.codebook_size),
        [T.end_of_speech]]).astype(np.int32)

    ids = jnp.asarray([[T.start_of_human, 5, T.end_of_human]], jnp.int32)
    cache_a = llama.make_cache(tts.config, 1, 16, jnp.float32)
    full_logits, _ = full._step_fn(full.params, ids, cache_a)
    cache_b = llama.make_cache(tts.config, 1, 16, jnp.float32)
    band_logits, _ = band._step_fn(band.params, ids, cache_b)
    np.testing.assert_allclose(np.asarray(band_logits),
                               np.asarray(full_logits)[:, rows], atol=1e-6)

    # greedy pick through the band head == full-head argmax over the band
    idx = int(jnp.argmax(band_logits, -1)[0])
    mapped = int(band._token_map(jnp.asarray([idx], jnp.int32))[0])
    want = int(rows[np.argmax(np.asarray(full_logits)[0, rows])])
    assert mapped == want


def test_band_head_generate_emits_only_band_tokens(tmp_path, snac):
    path = make_llama_tts_fixture(tmp_path / "orpheus_band")
    model = load_model(str(path), dtype=jnp.float32, audio_band_head=True)
    model.codec = snac
    T = model.tokens
    params = model.default_generation_parameters()
    params.max_tokens = 16
    params.seed = 0
    for kind, payload in (
            (e.kind, e) for e in model.generate_stream("hi",
                generation_parameters=params)):
        if kind == AudioGenerationKind.TOKEN:
            tok = payload.token
            assert (T.audio_token_offset <= tok
                    < T.audio_token_offset + 7 * T.codebook_size
                    or tok == T.end_of_speech), tok
