"""Kokoro multilingual text processor.

TPU-repo rebuild of the reference
``Sources/MLXAudioTTS/Models/StyleTTS2/Kokoro/KokoroMultilingualProcessor.swift:11-358``:

- English (``en``/``en-us``/``en-gb``): delegates to the Misaki English
  pipeline (gold/silver lexicon + stress rules + BART OOV fallback).
- ja / hi / cmn / zh: neural ByT5 G2P (charsiu multilingual), with
  character-level word splitting for ja/zh (``splitWords``, swift:285-314).
- Other supported languages: IPA lexicon lookup from gruut espeak TSV
  dictionaries (``loadLexicon``, swift:97-133), accent-stripped retry for
  OOV (``lookupWord``, swift:316-332), unknown words passed through.

Resources resolve through the hub cache exactly like the reference's
HubClient snapshots (swift:161-205); tests inject local directories.
"""

from __future__ import annotations

import unicodedata
from pathlib import Path

from tpu_audio.core.generation import AudioGenerationError

__all__ = [
    "KokoroMultilingualProcessor",
    "language_for_voice",
    "load_lexicon_tsv",
    "VOICE_LANGUAGE_MAP",
]

# Kokoro voice prefix -> language code (swift:21-31).
VOICE_LANGUAGE_MAP = {
    "a": "en-us",
    "b": "en-gb",
    "e": "es",
    "f": "fr",
    "h": "hi",
    "i": "it",
    "j": "ja",
    "p": "pt",
    "z": "cmn",
}

# Language codes routed to the Misaki English processor (swift:34).
ENGLISH_CODES = {"en", "en-us", "en-gb"}

# Languages handled by the neural ByT5 G2P and their charsiu tags (swift:36-41).
NEURAL_LANG_MAP = {"ja": "jpn", "hi": "hin", "cmn": "zho-s", "zh": "zho-s"}

# Languages split per character rather than per word (swift:43).
CHAR_SPLIT_LANGS = {"ja", "cmn", "zh"}

# Language code -> gruut espeak lexicon TSV filename (swift:46-60).
LANG_FILE_MAP = {
    "es": "es_lexicon.tsv",
    "fr": "fr_lexicon.tsv",
    "it": "it_lexicon.tsv",
    "pt": "pt_lexicon.tsv",
    "pt-br": "pt_lexicon.tsv",
    "de": "de_lexicon.tsv",
    "ru": "ru_lexicon.tsv",
    "ar": "ar_lexicon.tsv",
    "cs": "cs_lexicon.tsv",
    "fa": "fa_lexicon.tsv",
    "nl": "nl_lexicon.tsv",
    "sv": "sv_lexicon.tsv",
    "sw": "sw_lexicon.tsv",
}

SUPPORTED_LANGUAGES = (
    sorted(ENGLISH_CODES) + sorted(NEURAL_LANG_MAP) + sorted(LANG_FILE_MAP)
)

_SENTENCE_PUNCT = set(",.!?:;")
# word characters inside the lexicon tokenizer (swift:215, :298):
# letters, apostrophe, hyphen, combining acute
_WORD_CHARS = {"'", "-", "\u0301"}


def language_for_voice(voice: str | None) -> str | None:
    """Infer language code from the Kokoro voice-name prefix (swift:75-78)."""
    if not voice:
        return None
    return VOICE_LANGUAGE_MAP.get(voice[0])


def load_lexicon_tsv(path: str | Path) -> dict[str, str]:
    """Parse a gruut espeak lexicon TSV: ``word<TAB>ph ph ph`` with the
    space-separated phonemes concatenated into one IPA string (swift:116-126)."""
    lex: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if "\t" not in line:
                continue
            word, phonemes = line.split("\t", 1)
            lex[word.lower()] = phonemes.replace(" ", "")
    return lex


def _strip_combining(word: str) -> str:
    """NFD-decompose and drop U+0300-U+036F combining marks (swift:321-326)."""
    return "".join(
        ch for ch in unicodedata.normalize("NFD", word)
        if not (0x0300 <= ord(ch) <= 0x036F)
    )


def lookup_word(word: str, lexicon: dict[str, str]) -> str:
    """Lexicon lookup with accent-stripped retry; OOV passes through
    (swift:316-332)."""
    ipa = lexicon.get(word)
    if ipa is not None:
        return ipa
    stripped = _strip_combining(word)
    if stripped != word:
        ipa = lexicon.get(stripped)
        if ipa is not None:
            return ipa
    return word


def phonemize_with_lexicon(text: str, lexicon: dict[str, str]) -> str:
    """Word-by-word lexicon phonemization with ``,.!?:;`` passthrough
    (swift:209-235)."""
    result: list[str] = []
    current = ""
    for ch in text.lower():
        if ch.isalpha() or ch in _WORD_CHARS:
            current += ch
        else:
            if current:
                result.append(lookup_word(current, lexicon))
                current = ""
            if ch in _SENTENCE_PUNCT:
                result.append(ch)
    if current:
        result.append(lookup_word(current, lexicon))
    return " ".join(result)


def split_words(text: str, lang: str) -> list[str]:
    """Tokenize for the neural path: per-character for ja/zh, per-word with
    punctuation tokens otherwise (swift:285-314)."""
    if lang in CHAR_SPLIT_LANGS:
        return [ch for ch in text if not ch.isspace()]
    tokens: list[str] = []
    current = ""
    for ch in text:
        # combining marks (Mn/Mc) count as letters: Swift iterates grapheme
        # clusters, so Devanagari matras/viramas stay inside their word
        if (ch.isalpha() or ch == "'" or ch == "-"
                or unicodedata.category(ch) in ("Mn", "Mc")):
            current += ch
        else:
            if current:
                tokens.append(current)
                current = ""
            if unicodedata.category(ch).startswith("P"):
                tokens.append(ch)
    if current:
        tokens.append(current)
    return tokens


def _is_punct_or_space(token: str) -> bool:
    return all(
        ch.isspace() or unicodedata.category(ch).startswith("P") for ch in token
    )


class UnsupportedLanguageError(AudioGenerationError):
    """swift LexiconError.unsupportedLanguage (:337-348)."""

    def __init__(self, lang: str):
        super().__init__(
            f"Unsupported language: {lang}. "
            f"Available: {', '.join(SUPPORTED_LANGUAGES)}"
        )


class KokoroMultilingualProcessor:
    """Multilingual TextProcessor for Kokoro (swift:11-333).

    ``english``, ``lexicon_dir`` and ``neural_g2p`` are injectable so offline
    checkpoints and tests can supply local resources; when absent they resolve
    through the hub cache like the reference's HubClient snapshot downloads.
    """

    LEXICON_REPO = "beshkenadze/kokoro-ipa-lexicons"
    NEURAL_G2P_REPO = "beshkenadze/g2p-multilingual-byT5-tiny-mlx"

    def __init__(self, english=None, lexicon_dir: str | Path | None = None,
                 neural_g2p=None, lexicon_repo: str | None = None,
                 neural_g2p_repo: str | None = None):
        self._english = english
        self._lexicon_dir = Path(lexicon_dir) if lexicon_dir else None
        self._neural_g2p = neural_g2p
        self.lexicon_repo = lexicon_repo or self.LEXICON_REPO
        self.neural_g2p_repo = neural_g2p_repo or self.NEURAL_G2P_REPO
        self._lexicons: dict[str, dict[str, str]] = {}

    # -- resource resolution (swift prepare(for:), :142-205) -------------------

    def prepare(self, language: str) -> None:
        lang = language.lower()
        if lang in ENGLISH_CODES or lang.startswith("en"):
            self._ensure_english()
        elif lang in NEURAL_LANG_MAP:
            self._ensure_neural()
        elif lang in LANG_FILE_MAP:
            self._load_lexicon(lang)
        else:
            raise UnsupportedLanguageError(lang)

    def _ensure_english(self):
        if self._english is None:
            from tpu_audio.models.g2p.misaki import MisakiTextProcessor

            proc = MisakiTextProcessor()
            proc.prepare()
            self._english = proc
        return self._english

    def _ensure_neural(self):
        if self._neural_g2p is None:
            from tpu_audio.core import hub
            from tpu_audio.models.g2p.byt5 import ByT5G2P

            model_dir = hub.resolve_or_download_model(self.neural_g2p_repo)
            self._neural_g2p = ByT5G2P.from_pretrained(str(model_dir))
        return self._neural_g2p

    def _load_lexicon(self, lang: str) -> dict[str, str]:
        cached = self._lexicons.get(lang)
        if cached is not None:
            return cached
        filename = LANG_FILE_MAP.get(lang)
        if filename is None:
            raise UnsupportedLanguageError(lang)
        if self._lexicon_dir is None:
            from tpu_audio.core import hub

            self._lexicon_dir = hub.resolve_or_download_model(
                self.lexicon_repo, required_files=(filename,),
                allow_patterns=["*.tsv"])
        path = Path(self._lexicon_dir) / filename
        if not path.exists():
            raise AudioGenerationError(
                f"lexicon file not found: {path}. Call prepare({lang!r}) with "
                f"network access or pass lexicon_dir.")
        lex = load_lexicon_tsv(path)
        self._lexicons[lang] = lex
        return lex

    # -- processing (swift process(text:language:), :80-93) --------------------

    def process(self, text: str, language: str | None = None) -> str:
        lang = (language or "en-us").lower()
        if lang in ENGLISH_CODES or lang.startswith("en"):
            return self._ensure_english().process(text, language)
        byt5_lang = NEURAL_LANG_MAP.get(lang)
        if byt5_lang is not None:
            return self._neural_phonemize(text, lang, byt5_lang)
        return phonemize_with_lexicon(text, self._load_lexicon(lang))

    def _neural_phonemize(self, text: str, lang: str, byt5_lang: str) -> str:
        """ByT5 per-token conversion with punctuation passthrough
        (swift:262-283)."""
        g2p = self._ensure_neural()
        result: list[str] = []
        for token in split_words(text, lang):
            if _is_punct_or_space(token):
                punct = "".join(ch for ch in token if ch in _SENTENCE_PUNCT)
                if punct:
                    result.append(punct)
                continue
            ipa = g2p.convert(token, byt5_lang)
            if ipa:
                result.append(ipa)
        return " ".join(result)
