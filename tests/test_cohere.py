"""CohereTranscribe + SentencePiece tests."""

import numpy as np
import pytest

from tpu_audio.core.spm import SentencePieceTokenizer
from tpu_audio.models.stt import load_model
from tpu_audio.models.stt.cohere import CohereTranscribe, sanitize

from fixtures import make_cohere_fixture, serialize_sp_model


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_cohere_fixture(
        tmp_path_factory.mktemp("cohere"))))


# -- SentencePiece -----------------------------------------------------------


@pytest.fixture(scope="module")
def sp(tmp_path_factory):
    pieces = [
        ("<unk>", 0.0, 2),
        ("▁hello", -1.0, 1), ("▁world", -1.5, 1),
        ("▁", -10.0, 1), ("h", -20.0, 1), ("e", -20.0, 1), ("l", -20.0, 1),
        ("o", -20.0, 1), ("w", -20.0, 1), ("r", -20.0, 1), ("d", -20.0, 1),
    ] + [(f"<0x{b:02X}>", 0.0, 6) for b in range(256)]
    p = tmp_path_factory.mktemp("sp") / "m.model"
    p.write_bytes(serialize_sp_model(pieces))
    return SentencePieceTokenizer.from_model_file(p)


def test_sp_parse(sp):
    assert sp.unk_id == 0
    assert sp.model_type == 1
    assert sp.id_for("▁hello") == 1


def test_sp_unigram_prefers_whole_words(sp):
    ids = sp.encode("hello world")
    assert ids == [1, 2]  # viterbi picks the high-score word pieces


def test_sp_byte_fallback(sp):
    # é is not in vocab -> utf-8 byte pieces
    ids = sp.encode("é")
    decoded = sp.decode(ids)
    assert decoded == "é"


def test_sp_decode_roundtrip(sp):
    assert sp.decode(sp.encode("hello world")) == "hello world"


def test_sp_bpe_mode(tmp_path):
    pieces = [("<unk>", 0.0, 2), ("▁ab", -1.0, 1), ("▁a", -3.0, 1),
              ("b", -3.0, 1), ("▁", -5.0, 1), ("a", -5.0, 1)]
    p = tmp_path / "bpe.model"
    p.write_bytes(serialize_sp_model(pieces, model_type=2))
    tok = SentencePieceTokenizer.from_model_file(p)
    assert tok.model_type == 2
    assert tok.encode("ab") == [1]  # merges ▁+a -> ▁a, ▁a+b -> ▁ab


# -- model -------------------------------------------------------------------


def test_factory(model):
    assert isinstance(model, CohereTranscribe)
    assert model.config.vocab_size == 64
    assert "lm_head" in model.params
    # NeMo keys were normalized
    enc = model.params["encoder"]
    assert "conv0" in enc["subsampling"]
    assert "q_proj" in enc["layers"]["0"]["self_attn"]
    assert "q_proj" in model.params["decoder"]["core"]["layers"]["0"][
        "first_sub_layer"]


def test_sanitize_fused_qkv_split():
    w = np.arange(12 * 4, dtype=np.float32).reshape(12, 4)
    out = sanitize({"decoder.core.layers.0.first_sub_layer.qkv_proj.weight": w})
    q = out["decoder.core.layers.0.first_sub_layer.q_proj.weight"]
    np.testing.assert_array_equal(q, w[:4])
    np.testing.assert_array_equal(
        out["decoder.core.layers.0.first_sub_layer.v_proj.weight"], w[8:])


def test_prompt_tokens(model):
    prompt = model.tokenizer.build_prompt(language="en")
    assert len(prompt) == 9
    assert prompt[0] == 40  # <|startofcontext|>
    assert model.tokenizer.eos_id == 50


def test_generate(model):
    from tpu_audio.core.generation import STTGenerateParameters

    rng = np.random.default_rng(0)
    audio = rng.standard_normal(16000).astype(np.float32) * 0.1
    out = model.generate(audio, STTGenerateParameters(max_tokens=8))
    assert out.prompt_token_count == 9
    assert out.generation_token_count <= 8
    assert isinstance(out.text, str)


def test_generate_deterministic(model):
    from tpu_audio.core.generation import STTGenerateParameters

    rng = np.random.default_rng(1)
    audio = rng.standard_normal(8000).astype(np.float32) * 0.1
    a = model.generate(audio, STTGenerateParameters(max_tokens=6))
    b = model.generate(audio, STTGenerateParameters(max_tokens=6))
    assert a.text == b.text


class _FakeVAD:
    """predict_proba stub: speech only inside [speech_start, speech_end)."""

    def __init__(self, speech_start_s, speech_end_s, fail=False):
        self.span = (speech_start_s, speech_end_s)
        self.fail = fail

    def predict_proba(self, audio, sample_rate):
        if self.fail:
            raise RuntimeError("vad broke")
        chunk = 512 if sample_rate == 16000 else 256
        n = len(audio) // chunk
        t = np.arange(n) * chunk / sample_rate
        return np.where((t >= self.span[0]) & (t < self.span[1]), 0.9, 0.0)


def test_generate_vad_chunking(model):
    """Opt-in Silero-VAD chunking aligns segments to speech runs and trims
    silence (CohereTranscribe.swift:318-352, README.md:43-66)."""
    from tpu_audio.core.generation import STTGenerateParameters
    from tpu_audio.models.vad.segmenter import SpeechSegmentConfig

    rng = np.random.default_rng(3)
    sr = 16000
    audio = rng.standard_normal(3 * sr).astype(np.float32) * 0.1
    vad = _FakeVAD(1.0, 2.0)
    cfg = SpeechSegmentConfig(speech_pad_ms=0, min_speech_ms=250)
    out = model.generate(audio, STTGenerateParameters(max_tokens=6),
                         vad=(vad, cfg))
    assert len(out.segments) == 1
    seg = out.segments[0]
    # segment boundaries snap to the VAD speech run (256 ms block grid)
    assert 0.7 <= seg.start <= 1.3
    assert 1.7 <= seg.end <= 2.3
    # the transcribed piece is the trimmed region, not the whole buffer
    assert seg.end - seg.start < 1.6


def test_generate_vad_failure_falls_back_to_fixed(model):
    from tpu_audio.core.generation import STTGenerateParameters
    from tpu_audio.models.vad.segmenter import SpeechSegmentConfig

    rng = np.random.default_rng(4)
    audio = rng.standard_normal(8000).astype(np.float32) * 0.1
    fixed = model.generate(audio, STTGenerateParameters(max_tokens=6))
    fell_back = model.generate(audio, STTGenerateParameters(max_tokens=6),
                               vad=(_FakeVAD(0, 1, fail=True),
                                    SpeechSegmentConfig()))
    assert fell_back.text == fixed.text
    assert [(s.start, s.end) for s in fell_back.segments] == \
        [(s.start, s.end) for s in fixed.segments]


def test_encoder_bucket_invariance(model):
    """Padding the mel bucket must not change valid encoder frames."""
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    mels = model.config.encoder.feat_in
    feats = rng.standard_normal((mels, 37)).astype(np.float32) * 0.3
    short = np.zeros((1, mels, 40), np.float32)
    short[0, :, :37] = feats
    long = np.zeros((1, mels, 80), np.float32)
    long[0, :, :37] = feats
    lengths = jnp.asarray([37], jnp.int32)
    a, la = model._encode(model.params, jnp.asarray(short), lengths)
    b, lb = model._encode(model.params, jnp.asarray(long), lengths)
    assert int(la[0]) == int(lb[0])
    n = int(la[0])
    np.testing.assert_allclose(np.asarray(a)[0, :n], np.asarray(b)[0, :n],
                               atol=2e-2)


def test_stream_chunks(model):
    from tpu_audio.core.generation import STTGenerateParameters

    rng = np.random.default_rng(3)
    audio = rng.standard_normal(32000).astype(np.float32) * 0.1
    events = list(model.generate_stream(
        audio, STTGenerateParameters(max_tokens=6, chunk_duration=1.0)))
    assert events[-1]["type"] == "result"
