"""Misaki English G2P: lexicon-first phonemizer with number expansion.

TPU-agnostic rebuild of the reference
(Sources/MLXAudioTTS/Models/StyleTTS2/G2P/*): gold/silver lexicon JSON
(entries are IPA strings or {DEFAULT/VERB/NOUN/...} maps) grown with
capitalization variants (Lexicon.swift:44-64), Misaki stress
rearrangement rules (applyStress, Lexicon.swift:66-120), English
number-to-words expansion (cardinal/ordinal/year/decimal/currency,
EnglishNum2Word.swift), punctuation passthrough, and an optional
neural fallback (the ByT5 G2P — EnglishFallbackNetwork in the
reference) for out-of-lexicon words.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

__all__ = ["MisakiEnglishG2P", "MisakiTextProcessor", "num_to_words",
           "apply_stress"]

PRIMARY_STRESS = "ˈ"
SECONDARY_STRESS = "ˌ"
STRESSES = PRIMARY_STRESS + SECONDARY_STRESS
VOWELS = set("AIOQWYaiuæɑɒɔəɛɜɪʊʌᵻeoɐ")
PUNCT_PASSTHROUGH = set(";:,.!?—…\"“”()")

_ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven",
         "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
         "fifteen", "sixteen", "seventeen", "eighteen", "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]
_SCALE = [(10 ** 12, "trillion"), (10 ** 9, "billion"), (10 ** 6, "million"),
          (1000, "thousand"), (100, "hundred")]
_ORDS = {"one": "first", "two": "second", "three": "third", "five": "fifth",
         "eight": "eighth", "nine": "ninth", "twelve": "twelfth"}
CURRENCIES = {"$": ("dollar", "cent"), "£": ("pound", "pence"),
              "€": ("euro", "cent")}


def _cardinal(n: int) -> str:
    if n < 0:
        return "minus " + _cardinal(-n)
    if n < 20:
        return _ONES[n]
    if n < 100:
        t, r = divmod(n, 10)
        return _TENS[t] + ("-" + _ONES[r] if r else "")
    for val, name in _SCALE:
        if n >= val:
            head, rest = divmod(n, val)
            out = _cardinal(head) + " " + name
            if rest:
                joiner = " and " if rest < 100 and val == 100 else " "
                out += joiner + _cardinal(rest)
            return out
    return _ONES[0]


def _ordinal(n: int) -> str:
    words = _cardinal(n)
    parts = words.replace("-", " - ").split(" ")
    last = parts[-1]
    if last in _ORDS:
        parts[-1] = _ORDS[last]
    elif last.endswith("y"):
        parts[-1] = last[:-1] + "ieth"
    else:
        parts[-1] = last + "th"
    return " ".join(parts).replace(" - ", "-")


def num_to_words(token: str, mode: str = "cardinal") -> str:
    """EnglishNum2Word.swift behavior for the modes the G2P uses."""
    token = token.replace(",", "")
    if mode == "year":
        n = int(float(token))
        if 1000 <= n < 10000 and n % 1000:
            head, tail = divmod(n, 100)
            if tail == 0:
                return _cardinal(head) + " hundred"
            if tail < 10:
                return _cardinal(head) + " oh " + _cardinal(tail)
            return _cardinal(head) + " " + _cardinal(tail)
        return _cardinal(n)
    if mode == "ordinal":
        return _ordinal(int(float(token)))
    if "." in token:
        whole, frac = token.split(".", 1)
        out = _cardinal(int(whole or 0)) + " point"
        for d in frac:
            out += " " + _ONES[int(d)]
        return out
    return _cardinal(int(token))


def grow_dictionary(d: dict) -> dict:
    """Add capitalization variants, originals win (Lexicon.swift:44-64)."""
    extra = {}
    for k, v in d.items():
        if len(k) < 2:
            continue
        if k == k.lower():
            if k != k.capitalize():
                extra[k.capitalize()] = v
        elif k == k.lower().capitalize():
            extra[k.lower()] = v
    extra.update(d)
    return extra


def apply_stress(ps: str | None, stress: float | None) -> str | None:
    """Misaki stress rearrangement (Lexicon.swift:66-120)."""
    if ps is None or stress is None:
        return ps

    def restress(s: str) -> str:
        chars = list(s)
        pos = [float(i) for i in range(len(chars))]
        for i, c in enumerate(chars):
            if c in STRESSES:
                for j in range(i + 1, len(chars)):
                    if chars[j] in VOWELS:
                        pos[i] = j - 0.5
                        break
        order = sorted(range(len(chars)), key=lambda i: pos[i])
        return "".join(chars[i] for i in order)

    has_primary = PRIMARY_STRESS in ps
    has_any = any(c in STRESSES for c in ps)
    if stress < -1:
        return ps.replace(PRIMARY_STRESS, "").replace(SECONDARY_STRESS, "")
    if stress == -1 or (stress in (0, -0.5) and has_primary):
        return ps.replace(SECONDARY_STRESS, "").replace(
            PRIMARY_STRESS, SECONDARY_STRESS)
    if stress in (0, 0.5, 1) and not has_any:
        if not any(c in VOWELS for c in ps):
            return ps
        return restress(SECONDARY_STRESS + ps)
    if stress >= 1 and not has_primary and SECONDARY_STRESS in ps:
        return ps.replace(SECONDARY_STRESS, PRIMARY_STRESS)
    if stress > 1 and not has_any:
        if not any(c in VOWELS for c in ps):
            return ps
        return restress(PRIMARY_STRESS + ps)
    return ps


_TOKEN_RE = re.compile(
    r"[$£€]?\d[\d,]*(?:\.\d+)?%?|[A-Za-z]+(?:['’][A-Za-z]+)*|[^\sA-Za-z\d]")


class MisakiEnglishG2P:
    """text -> IPA phoneme string (MisakiTextProcessor.process)."""

    def __init__(self, model_dir: str | Path | None = None,
                 british: bool = False, fallback=None,
                 cap_stress: tuple = (0.5, 2.0)):
        self.british = british
        self.fallback = fallback  # BartFallbackNetwork / ByT5G2P instance
        self.cap_stress = cap_stress
        self.golds: dict = {}
        self.silvers: dict = {}
        if model_dir is not None:
            prefix = "gb" if british else "us"
            d = Path(model_dir)
            gold = d / f"{prefix}_gold.json"
            silver = d / f"{prefix}_silver.json"
            if gold.exists():
                self.golds = grow_dictionary(json.loads(gold.read_text()))
            if silver.exists():
                self.silvers = grow_dictionary(json.loads(silver.read_text()))
            if self.fallback is None:
                # the kokoro-checkpoint BART OOV network
                # (G2P/FallbackNetwork/BARTModel.swift); None when the
                # checkpoint ships no {us,gb}_bart files
                from tpu_audio.models.g2p.bart_fallback import (
                    BartFallbackNetwork,
                )

                self.fallback = BartFallbackNetwork.from_pretrained(
                    d, british=british)

    # -- lexicon --------------------------------------------------------------------

    def _entry(self, word: str, tag: str | None = None) -> str | None:
        for table in (self.golds, self.silvers):
            v = table.get(word)
            if v is None:
                continue
            if isinstance(v, dict):
                if tag and tag in v:
                    return v[tag]
                return v.get("DEFAULT")
            return v
        return None

    def lookup(self, word: str, tag: str | None = None) -> str | None:
        """Word lookup with capitalization stress boosts
        (Lexicon getWord semantics)."""
        ps = self._entry(word, tag)
        stress = None
        if ps is None and word != word.lower():
            low = self._entry(word.lower(), tag)
            if low is not None:
                ps = low
                stress = self.cap_stress[1] if word == word.upper() \
                    else self.cap_stress[0]
        return apply_stress(ps, stress)

    # -- text expansion ---------------------------------------------------------------

    def _expand_number(self, tok: str) -> str:
        currency = None
        if tok and tok[0] in CURRENCIES:
            currency, tok = CURRENCIES[tok[0]], tok[1:]
        percent = tok.endswith("%")
        if percent:
            tok = tok[:-1]
        if currency:
            clean = tok.replace(",", "")
            if "." in clean:
                whole, frac = clean.split(".", 1)
                units = int(whole or 0)
                cents = int((frac + "0")[:2])
                words = _cardinal(units) + " " + currency[0] \
                    + ("s" if units != 1 else "")
                if cents:
                    words += " and " + _cardinal(cents) + " " + currency[1] \
                        + ("s" if cents != 1 and currency[1] != "pence"
                           else "")
            else:
                units = int(clean)
                words = _cardinal(units) + " " + currency[0] \
                    + ("s" if units != 1 else "")
        elif re.fullmatch(r"[12]\d{3}", tok.replace(",", "")):
            words = num_to_words(tok, "year")
        else:
            words = num_to_words(tok)
        if percent:
            words += " percent"
        return words

    # -- main -------------------------------------------------------------------------

    def phonemize(self, text: str) -> str:
        out: list[str] = []
        for tok in _TOKEN_RE.findall(text):
            if tok and (tok[0].isdigit() or (tok[0] in "$£€"
                                             and any(c.isdigit()
                                                     for c in tok))):
                for word in self._expand_number(tok).replace("-", " ").split():
                    ps = self.lookup(word) or self.lookup(word.lower())
                    if ps is None and self.fallback is not None:
                        ps = self.fallback.convert(
                            word, "eng-gb" if self.british else "eng-us")
                    out.append(ps or "")
                continue
            if len(tok) == 1 and tok in PUNCT_PASSTHROUGH:
                if out:
                    out[-1] = out[-1] + tok
                continue
            ps = self.lookup(tok)
            if ps is None and self.fallback is not None:
                ps = self.fallback.convert(
                    tok, "eng-gb" if self.british else "eng-us")
            # an empty fallback result is a miss: keep the raw token rather
            # than silently dropping the word
            out.append(ps if ps else tok)
        return " ".join(p for p in out if p)

    process = phonemize


class MisakiTextProcessor:
    """TextProcessor facade over the per-accent English G2Ps
    (MisakiTextProcessor.swift:5-61): resolves the kitten-tts-g2p resource
    snapshot, then lazily builds/caches a US and a GB ``MisakiEnglishG2P``;
    ``process`` routes on 'gb' in the language code (swift:25-30)."""

    G2P_REPO = "beshkenadze/kitten-tts-g2p"

    def __init__(self, resource_dir: str | Path | None = None):
        self._dir = Path(resource_dir) if resource_dir else None
        self._g2ps: dict[bool, MisakiEnglishG2P] = {}

    def prepare(self) -> None:
        """Resolve the G2P resource snapshot (swift:15-23). Raises when the
        repo is neither cached nor downloadable."""
        if self._dir is not None:
            return
        from tpu_audio.core import hub

        self._dir = hub.resolve_or_download_model(
            self.G2P_REPO, required_files=("us_gold.json",))

    @classmethod
    def try_load(cls, model_dir: str | Path | None = None
                 ) -> "MisakiTextProcessor | None":
        """Offline-safe constructor: use ``model_dir`` if it ships the gold
        lexicon, else the hub cache; None when neither resolves (the callers'
        processor-less passthrough then applies)."""
        if model_dir is not None and (Path(model_dir) / "us_gold.json").exists():
            return cls(model_dir)
        proc = cls()
        try:
            proc.prepare()
        except Exception:
            return None
        return proc

    def _get(self, british: bool) -> MisakiEnglishG2P:
        g2p = self._g2ps.get(british)
        if g2p is None:
            if self._dir is None:
                self.prepare()
            g2p = MisakiEnglishG2P(self._dir, british=british)
            self._g2ps[british] = g2p
        return g2p

    def process(self, text: str, language: str | None = None) -> str:
        british = "gb" in (language or "").lower()
        return self._get(british).process(text)
