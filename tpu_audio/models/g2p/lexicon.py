"""Lexicon-based English G2P: CMUDict parsing + ARPAbet -> IPA mapping.

Rebuild of the reference lexicon pipeline
(Sources/MLXAudioG2P/Lexicon/CMUDict/*: CMUDictLoader/Parser, ARPAbetMapper,
LexiconProviding). Used as Kokoro's fallback text processor when a
``cmudict`` file or a ``lexicon.json`` ships with the model.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

__all__ = ["LexiconG2P", "arpabet_to_ipa", "parse_cmudict"]

# ARPAbet phone -> IPA (stress handled via markers)
_ARPA_IPA = {
    "AA": "ɑ", "AE": "æ", "AH": "ʌ", "AO": "ɔ", "AW": "aʊ", "AY": "aɪ",
    "B": "b", "CH": "ʧ", "D": "d", "DH": "ð", "EH": "ɛ", "ER": "ɝ",
    "EY": "eɪ", "F": "f", "G": "ɡ", "HH": "h", "IH": "ɪ", "IY": "i",
    "JH": "ʤ", "K": "k", "L": "l", "M": "m", "N": "n", "NG": "ŋ",
    "OW": "oʊ", "OY": "ɔɪ", "P": "p", "R": "ɹ", "S": "s", "SH": "ʃ",
    "T": "t", "TH": "θ", "UH": "ʊ", "UW": "u", "V": "v", "W": "w",
    "Y": "j", "Z": "z", "ZH": "ʒ",
}
_STRESS = {"1": "ˈ", "2": "ˌ", "0": ""}


def arpabet_to_ipa(phones: list[str]) -> str:
    """ARPAbet phones (with stress digits) -> IPA string; primary/secondary
    stress markers precede the stressed vowel."""
    out = []
    for ph in phones:
        m = re.match(r"([A-Z]+)([012])?$", ph.upper())
        if not m:
            continue
        base, stress = m.group(1), m.group(2)
        ipa = _ARPA_IPA.get(base, "")
        if stress and stress in _STRESS and _STRESS[stress]:
            out.append(_STRESS[stress])
        out.append(ipa)
    return "".join(out)


def parse_cmudict(text: str) -> dict[str, list[str]]:
    """Parse cmudict format: ``WORD  PH1 PH2 ...`` (';;;' comments,
    ``WORD(2)`` alternates kept only for the primary entry)."""
    lexicon: dict[str, list[str]] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith(";;;"):
            continue
        parts = line.split()
        if len(parts) < 2:
            continue
        word = parts[0]
        if "(" in word:  # alternate pronunciation
            continue
        lexicon[word.lower()] = parts[1:]
    return lexicon


class LexiconG2P:
    """Word-level lexicon G2P with IPA output."""

    def __init__(self, lexicon: dict[str, list[str] | str]):
        self.lexicon = lexicon

    @classmethod
    def try_load(cls, model_dir) -> "LexiconG2P | None":
        model_dir = Path(model_dir)
        for name in ("cmudict.dict", "cmudict-0.7b.txt", "cmudict.txt"):
            p = model_dir / name
            if p.exists():
                return cls(parse_cmudict(p.read_text(errors="ignore")))
        p = model_dir / "lexicon.json"
        if p.exists():
            return cls(json.loads(p.read_text()))
        return None

    def word_to_ipa(self, word: str) -> str | None:
        entry = self.lexicon.get(word.lower())
        if entry is None:
            return None
        if isinstance(entry, str):
            return entry
        return arpabet_to_ipa(entry)

    def process(self, text: str, language: str | None = None) -> str:
        """Text -> IPA phoneme string; OOV words pass through unchanged so
        direct-IPA input keeps working."""
        pieces = []
        for token in re.findall(r"[\w']+|[^\w\s]", text):
            if re.match(r"[\w']+$", token):
                ipa = self.word_to_ipa(token)
                pieces.append(ipa if ipa is not None else token)
            else:
                pieces.append(token)
        return " ".join(pieces)
