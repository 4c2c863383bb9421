"""Whisper fixture-model tests through the real loading path: shapes,
KV-cached decode parity vs full forward, sanitizer remaps, chunk loop,
quantized checkpoint loading."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.core import kv_cache, loading
from tpu_audio.core.generation import STTGenerateParameters
from tpu_audio.models.stt import load_model
from tpu_audio.models.stt import whisper as W

from fixtures import FakeWhisperTokenizer, make_whisper_fixture, modulo_values


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    path = make_whisper_fixture(tmp_path_factory.mktemp("whisper_tiny"))
    model = W.Whisper.from_pretrained(str(path), dtype=jnp.float32)
    model.tokenizer = FakeWhisperTokenizer(vocab=model.config.vocab_size)
    return model


def test_factory_dispatch(tmp_path):
    path = make_whisper_fixture(tmp_path / "m")
    model = load_model(str(path), dtype=jnp.float32)
    assert isinstance(model, W.Whisper)


def test_encoder_shapes(tiny_model):
    feats = tiny_model.encoder_features(np.zeros(16000, np.float32))
    assert feats.shape == (1, 3000, 80)
    enc = tiny_model._encode(tiny_model.params, feats)
    assert enc.shape == (1, 1500, tiny_model.config.d_model)


def test_generate_end_to_end(tiny_model):
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(16000).astype(np.float32) * 0.1
    out = tiny_model.generate(audio, STTGenerateParameters(max_tokens=8))
    assert out.generation_token_count <= 8
    assert out.total_time > 0
    assert out.language == "en"


def test_decode_is_deterministic_greedy(tiny_model):
    rng = np.random.default_rng(1)
    audio = rng.standard_normal(8000).astype(np.float32) * 0.1
    p = STTGenerateParameters(max_tokens=6, temperature=0.0)
    a = tiny_model.generate(audio, p)
    b = tiny_model.generate(audio, p)
    assert a.text == b.text
    assert [s.tokens for s in a.segments] == [s.tokens for s in b.segments]


def test_kv_cached_decode_matches_full_forward(tiny_model):
    """Parity invariant: incremental cached decode must equal running the
    decoder over the whole sequence at once (the fixture-parity pattern of
    ParakeetBatchParityTests)."""
    cfg = tiny_model.config
    params = tiny_model.params
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.standard_normal((1, 3000, cfg.num_mel_bins)).astype(np.float32))
    enc = W.encoder_forward(params, feats, cfg)
    cross_k, cross_v = W._cross_kv(params, enc, cfg)
    seq = [5, 9, 3, 7, 1]
    hd = cfg.d_model // cfg.decoder_attention_heads

    # full forward in one step
    cache_full = kv_cache.init_cache(cfg.decoder_layers, 1,
                                     cfg.decoder_attention_heads, hd, 16, jnp.float32)
    logits_full, _ = W.decoder_step(params, jnp.asarray([seq]), 0, cache_full,
                                    cross_k, cross_v, cfg)

    # incremental
    cache = kv_cache.init_cache(cfg.decoder_layers, 1,
                                cfg.decoder_attention_heads, hd, 16, jnp.float32)
    step_logits = []
    for t, tok in enumerate(seq):
        lg, cache = W.decoder_step(params, jnp.asarray([[tok]]), t, cache,
                                   cross_k, cross_v, cfg)
        step_logits.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(
        np.stack(step_logits), np.asarray(logits_full[0]), atol=2e-4
    )


def test_chunking_long_audio(tiny_model):
    rng = np.random.default_rng(3)
    audio = rng.standard_normal(16000 * 61).astype(np.float32) * 0.05
    out = tiny_model.generate(audio, STTGenerateParameters(max_tokens=4))
    # 61 s -> 3 chunks of <=30 s
    assert out.prompt_token_count == 3 * 4
    if out.segments:
        assert out.segments[-1].end == pytest.approx(61.0, abs=0.1)


def test_mlx_whisper_sanitizer():
    flat = {
        "encoder.positional_embedding": np.zeros((1500, 8), np.float32),
        "decoder.positional_embedding": np.zeros((448, 8), np.float32),
        "decoder.token_embedding.weight": np.zeros((10, 8), np.float32),
        "encoder.conv1.weight": np.zeros((8, 3, 4), np.float32),  # [O,K,I] mlx
        "encoder.conv1.bias": np.zeros((8,), np.float32),
        "encoder.ln_post.weight": np.zeros((8,), np.float32),
        "decoder.ln.weight": np.zeros((8,), np.float32),
        "encoder.blocks.0.attn.query.weight": np.zeros((8, 8), np.float32),
        "encoder.blocks.0.attn_ln.weight": np.zeros((8,), np.float32),
        "encoder.blocks.0.mlp1.weight": np.zeros((16, 8), np.float32),
        "decoder.blocks.1.cross_attn.key.weight": np.zeros((8, 8), np.float32),
        "decoder.blocks.1.cross_attn_ln.bias": np.zeros((8,), np.float32),
        "alignment_heads": np.zeros((2, 2), np.float32),
    }
    out = W.sanitize(flat)
    assert "model.encoder.embed_positions.weight" in out
    assert "model.decoder.embed_tokens.weight" in out
    assert out["model.encoder.conv1.weight"].shape == (8, 4, 3)  # -> [O,I,K]
    assert "model.encoder.layers.0.self_attn.q_proj.weight" in out
    assert "model.encoder.layers.0.self_attn_layer_norm.weight" in out
    assert "model.encoder.layers.0.fc1.weight" in out
    assert "model.decoder.layers.1.encoder_attn.k_proj.weight" in out
    assert "model.decoder.layers.1.encoder_attn_layer_norm.bias" in out
    assert "alignment_heads" not in out


def test_hf_sanitizer_strips_proj_out():
    flat = {
        "model.encoder.conv1.weight": np.zeros((4, 2, 3), np.float32),
        "proj_out.weight": np.zeros((10, 4), np.float32),
        "encoder.layer_norm.weight": np.zeros((4,), np.float32),
    }
    out = W.sanitize(flat)
    assert "proj_out.weight" not in out
    assert "model.encoder.layer_norm.weight" in out
    # HF conv layout passes through untouched (already [O,I,K])
    assert out["model.encoder.conv1.weight"].shape == (4, 2, 3)


def test_sinusoid_synthesis_matches_reference_formula():
    sins = W.whisper_sinusoids(4, 6)
    assert sins.shape == (4, 6)
    # position 0: sin=0, cos=1
    np.testing.assert_allclose(sins[0, :3], 0.0, atol=1e-7)
    np.testing.assert_allclose(sins[0, 3:], 1.0, atol=1e-7)


def test_quantized_fixture_loads_and_runs(tmp_path):
    """Quantize the fixture's linears to MLX 4-bit layout and run the full
    generate path (mirrors WhisperQuantizedTiedEmbeddingTests)."""
    from safetensors.numpy import save_file

    from tpu_audio.core import quant

    src = make_whisper_fixture(tmp_path / "f32", d_model=32, vocab=64)
    flat = loading.load_safetensors(src)
    qflat = {}
    group_size, bits = 16, 4
    for k, v in flat.items():
        is_linear = (
            v.ndim == 2 and k.endswith(".weight")
            and ("proj" in k or "fc" in k or k.endswith("embed_tokens.weight"))
        )
        if is_linear and v.shape[1] % group_size == 0:
            packed, scales, biases = quant.quantize(v, group_size, bits)
            qflat[k] = packed
            qflat[k.replace(".weight", ".scales")] = scales
            qflat[k.replace(".weight", ".biases")] = biases
        else:
            qflat[k] = v
    qdir = tmp_path / "q4"
    qdir.mkdir()
    cfg = json.loads((src / "config.json").read_text())
    cfg["quantization"] = {"group_size": group_size, "bits": bits}
    (qdir / "config.json").write_text(json.dumps(cfg))
    save_file(qflat, str(qdir / "model.safetensors"))

    model = W.Whisper.from_pretrained(str(qdir), dtype=jnp.float32)
    model.tokenizer = FakeWhisperTokenizer(vocab=model.config.vocab_size)
    # tied embedding must be dequantized for lookup AND used quantized as head
    from tpu_audio.core import quant

    emb = model.params["model"]["decoder"]["embed_tokens"]
    assert isinstance(emb["weight"], quant.QuantizedTensor)
    assert emb["weight"].weight.dtype == jnp.uint32
    out = model.generate(np.zeros(8000, np.float32), STTGenerateParameters(max_tokens=4))
    assert out.generation_token_count <= 4


def test_detect_language(tiny_model):
    lang, prob = tiny_model.detect_language(np.zeros(8000, np.float32))
    assert lang in ("en", "fr")
    assert 0.0 <= prob <= 1.0


def test_logits_match_transformers(tmp_path):
    """Golden parity: encoder+decoder logits vs HF torch WhisperForConditionalGeneration."""
    import torch
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperForConditionalGeneration

    torch.manual_seed(0)
    hf_cfg = HFWhisperConfig(
        vocab_size=64, num_mel_bins=16, d_model=32,
        encoder_layers=2, encoder_attention_heads=2, encoder_ffn_dim=64,
        decoder_layers=2, decoder_attention_heads=2, decoder_ffn_dim=64,
        max_source_positions=100, max_target_positions=24,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1, suppress_tokens=[], begin_suppress_tokens=[],
    )
    hf = WhisperForConditionalGeneration(hf_cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    model = W.Whisper.from_pretrained(str(tmp_path), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 200, 16)).astype(np.float32)
    tokens = np.asarray([[5, 9, 3, 7]], np.int32)

    enc = W.encoder_forward(model.params, jnp.asarray(mel), model.config)
    logits = W.decoder_forward(model.params, jnp.asarray(tokens), enc,
                               model.config)
    with torch.no_grad():
        want = hf(
            input_features=torch.from_numpy(mel).transpose(1, 2),
            decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)),
        ).logits.numpy()
    np.testing.assert_allclose(np.asarray(logits), want, atol=2e-4)


def test_w8a8_decoder_logits_close(tiny_model):
    """Per-channel int8 decoder (native MXU path) stays close to the dense
    decoder logits and produces the same greedy argmax on the fixture."""
    import copy

    from tpu_audio.core import quant

    model = tiny_model
    enc = jnp.zeros((1, 12, model.config.d_model), jnp.float32)
    rngv = np.random.default_rng(0)
    enc = jnp.asarray(rngv.standard_normal(enc.shape).astype(np.float32) * 0.3)
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    ref = np.asarray(
        W.decoder_forward(model.params, tokens, enc, model.config),
        np.float32)

    qparams = {"model": dict(model.params["model"])}
    qparams["model"]["decoder"] = quant.quantize_tree(
        model.params["model"]["decoder"], scheme="w8a8", min_in_features=16)
    got = np.asarray(
        W.decoder_forward(qparams, tokens, enc, model.config), np.float32)
    # int8 weight + int8 activation error stays small relative to spread
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / denom < 0.05
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


def test_w8a8_encoder_hidden_close(tiny_model):
    """Per-channel int8 encoder GEMMs (bench token ``w8e``) stay close to
    the dense encoder hidden states; convs/position embeddings remain
    dense so only the attention/FFN projections carry quant noise."""
    from tpu_audio.core import quant

    model = tiny_model
    rngv = np.random.default_rng(0)
    mel = jnp.asarray(rngv.standard_normal(
        (1, 2 * model.config.max_source_positions,
         model.config.num_mel_bins)).astype(np.float32) * 0.1)
    ref = np.asarray(W.encoder_forward(model.params, mel, model.config),
                     np.float32)

    qparams = {"model": dict(model.params["model"])}
    qparams["model"]["encoder"] = quant.quantize_tree(
        model.params["model"]["encoder"], scheme="w8a8",
        min_in_features=16, group_size=16)
    enc = qparams["model"]["encoder"]
    from tpu_audio.core.quant import Int8Tensor

    assert isinstance(enc["layers"]["fc1"]["weight"], Int8Tensor)
    assert not isinstance(enc["conv1"]["weight"], Int8Tensor)
    got = np.asarray(W.encoder_forward(qparams, mel, model.config),
                     np.float32)
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / denom < 0.05


def test_tokenizer_autofetch_by_vocab_size(tmp_path, monkeypatch):
    """A tokenizer-less checkpoint resolves its tokenizer from the sibling
    openai repo selected by vocab size (WhisperModel.swift:566-639), via a
    mocked hub resolver."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel

    from tpu_audio.core import hub

    # official multilingual vocab size -> the medium sibling repo
    model_dir = make_whisper_fixture(tmp_path / "m", vocab=51865)
    assert not (model_dir / "tokenizer.json").exists()

    # sibling repo dir holding only tokenizer assets
    sibling = tmp_path / "sibling"
    sibling.mkdir()
    specials = [
        "<|endoftext|>", "<|startoftranscript|>", "<|transcribe|>",
        "<|translate|>", "<|notimestamps|>", "<|nospeech|>", "<|en|>",
    ]
    vocab = {f"w{i}": i for i in range(8)}
    vocab.update({s: 8 + i for i, s in enumerate(specials)})
    Tokenizer(WordLevel(vocab, unk_token="w0")).save(
        str(sibling / "tokenizer.json"))

    calls = {}

    def fake_resolve(repo, required_files=(), allow_patterns=None, **kw):
        if Path(str(repo)).exists():  # model-dir resolution passes through
            return Path(str(repo))
        calls["repo"] = str(repo)
        calls["patterns"] = allow_patterns
        return sibling

    monkeypatch.setattr(hub, "resolve_or_download_model", fake_resolve)
    model = W.Whisper.from_pretrained(str(model_dir))
    assert calls["repo"] == "openai/whisper-medium"  # vocab 51865 routing
    assert "tokenizer.json" in calls["patterns"]
    assert model.tokenizer is not None
    assert model.tokenizer.sot == vocab["<|startoftranscript|>"]
    assert model.tokenizer.eot == vocab["<|endoftext|>"]

    # vocab-size routing table matches the reference switch
    assert W.TOKENIZER_REPO_BY_VOCAB[51866] == "openai/whisper-large-v3"
    assert W.TOKENIZER_REPO_BY_VOCAB[51865] == "openai/whisper-medium"
    assert W.TOKENIZER_REPO_BY_VOCAB[51864] == "openai/whisper-medium.en"
    # custom vocab sizes never fetch a mismatched sibling tokenizer
    with pytest.raises(RuntimeError, match="own tokenizer"):
        W.fetch_tokenizer_dir(32000)


def test_tokenizer_autofetch_failure_warns_not_raises(tmp_path, monkeypatch):
    """Offline with no cached sibling snapshot: loading still succeeds
    (tokenizer None) with a warning; generate() raises a clear error."""
    from tpu_audio.core import hub

    model_dir = make_whisper_fixture(tmp_path / "m")

    def fail_resolve(repo, *a, **k):
        if Path(str(repo)).exists():
            return Path(str(repo))
        raise RuntimeError("no network")

    monkeypatch.setattr(hub, "resolve_or_download_model", fail_resolve)
    with pytest.warns(UserWarning, match="no tokenizer.json"):
        model = W.Whisper.from_pretrained(str(model_dir))
    assert model.tokenizer is None
    with pytest.raises(RuntimeError, match="tokenizer"):
        model.generate(np.zeros(160, np.float32))


# ---------------------------------------------------------------------------
# Batched-window long-audio decode (beyond-reference TPU surface)
# ---------------------------------------------------------------------------


def test_batched_windows_match_sequential(tiny_model):
    """Greedy batched-window decode must be token-identical per window to
    the reference-semantics sequential loop (WhisperModel.swift:165-182)."""
    rng = np.random.default_rng(7)
    audio = rng.standard_normal(16000 * 75).astype(np.float32) * 0.05  # 3 windows
    p_seq = STTGenerateParameters(max_tokens=6, batch_windows=False)
    p_bat = STTGenerateParameters(max_tokens=6, batch_windows=True)
    seq = tiny_model.generate(audio, p_seq)
    bat = tiny_model.generate(audio, p_bat)
    assert [s.tokens for s in bat.segments] == [s.tokens for s in seq.segments]
    assert bat.text == seq.text
    assert [(s.start, s.end) for s in bat.segments] \
        == [(s.start, s.end) for s in seq.segments]


def test_batched_windows_kv8_match_sequential(tiny_model, monkeypatch):
    """The quantized cross-KV path must hold the same parity (the batched
    loop uses the XLA dequant path; the Pallas kernel is single-row).

    Pins ``TPU_AUDIO_PALLAS_KV=0``: on a real TPU the sequential b=1 path
    would auto-select the fused Pallas int8 cross-KV kernel, whose
    transposed quantization layout has different numerics from the
    batched loop's ``kv_cache._quantize`` + XLA dequant — exact token
    equality is the contract of the shared XLA path only."""
    monkeypatch.setenv("TPU_AUDIO_PALLAS_KV", "0")
    rng = np.random.default_rng(8)
    audio = rng.standard_normal(16000 * 40).astype(np.float32) * 0.05  # 2 windows
    p_seq = STTGenerateParameters(max_tokens=5, batch_windows=False, kv_bits=8)
    p_bat = STTGenerateParameters(max_tokens=5, batch_windows=True, kv_bits=8)
    seq = tiny_model.generate(audio, p_seq)
    bat = tiny_model.generate(audio, p_bat)
    assert [s.tokens for s in bat.segments] == [s.tokens for s in seq.segments]


def test_batched_windows_bucket_padding(tiny_model):
    """5 windows -> one bucket-8 group (padded rows dropped); output count
    and ordering must match the chunk list."""
    rng = np.random.default_rng(9)
    audio = rng.standard_normal(16000 * 125).astype(np.float32) * 0.05  # 5 windows
    out = tiny_model.generate(
        audio, STTGenerateParameters(max_tokens=4, batch_windows=True))
    assert out.prompt_token_count == 5 * len(
        tiny_model.tokenizer.build_prompt_tokens(None, "transcribe"))
    if out.segments:
        assert out.segments[-1].end == pytest.approx(125.0, abs=0.1)
