"""Misaki English G2P tests: num2words, stress rules, lexicon pipeline."""

import json

import pytest

from tpu_audio.models.g2p.misaki import (
    PRIMARY_STRESS,
    SECONDARY_STRESS,
    MisakiEnglishG2P,
    apply_stress,
    grow_dictionary,
    num_to_words,
)


def test_cardinals():
    assert num_to_words("0") == "zero"
    assert num_to_words("17") == "seventeen"
    assert num_to_words("42") == "forty-two"
    assert num_to_words("105") == "one hundred and five"
    assert num_to_words("1234") == \
        "one thousand two hundred and thirty-four"
    assert num_to_words("-5") == "minus five"


def test_decimal_and_ordinal():
    assert num_to_words("3.14") == "three point one four"
    assert num_to_words("1", "ordinal") == "first"
    assert num_to_words("22", "ordinal") == "twenty-second"
    assert num_to_words("30", "ordinal") == "thirtieth"


def test_years():
    assert num_to_words("1984", "year") == "nineteen eighty-four"
    assert num_to_words("2005", "year") == "twenty oh five"
    assert num_to_words("2000", "year") == "two thousand"
    assert num_to_words("1900", "year") == "nineteen hundred"


def test_grow_dictionary():
    d = grow_dictionary({"hello": "h", "World": "w"})
    assert d["Hello"] == "h"
    assert d["world"] == "w"
    # originals win over grown variants
    d2 = grow_dictionary({"cat": "1", "Cat": "2"})
    assert d2["Cat"] == "2" and d2["cat"] == "1"


def test_apply_stress():
    ps = PRIMARY_STRESS + "haloʊ"
    # destress completely
    assert apply_stress(ps, -2) == "haloʊ"
    # demote primary -> secondary
    assert apply_stress(ps, -1) == SECONDARY_STRESS + "haloʊ"
    # promote secondary -> primary
    ps2 = SECONDARY_STRESS + "haloʊ"
    assert apply_stress(ps2, 1) == PRIMARY_STRESS + "haloʊ"
    # add stress before first vowel when none present
    out = apply_stress("hæt", 2)
    assert PRIMARY_STRESS in out
    assert out.index(PRIMARY_STRESS) == out.index("æ") - 1
    # no vowels -> unchanged
    assert apply_stress("st", 2) == "st"
    assert apply_stress(None, 1) is None


@pytest.fixture()
def g2p(tmp_path):
    gold = {"hello": "həˈloʊ", "world": "ˈwɜːld",
            "one": "ˈwʌn", "two": "ˈtuː", "dollar": "ˈdɑlɚ",
            "dollars": "ˈdɑlɚz", "percent": "pɚˈsɛnt",
            "read": {"DEFAULT": "ˈɹiːd", "VERB": "ˈɹɛd"}}
    (tmp_path / "us_gold.json").write_text(json.dumps(gold))
    return MisakiEnglishG2P(tmp_path)


def test_phonemize_basic(g2p):
    out = g2p.phonemize("hello world")
    assert "həˈloʊ" in out and "ˈwɜːld" in out


def test_phonemize_punctuation_attached(g2p):
    out = g2p.phonemize("hello, world!")
    assert "həˈloʊ," in out
    assert out.endswith("!")


def test_phonemize_numbers(g2p):
    out = g2p.phonemize("one two")
    assert out.count("ˈ") >= 2
    out_num = g2p.phonemize("2 dollar")
    assert "ˈtuː" in out_num


def test_currency(g2p):
    out = g2p.phonemize("$2")
    assert "ˈtuː" in out and "ˈdɑlɚz" in out
    out1 = g2p.phonemize("$1")
    assert "ˈdɑlɚ" in out1 and "ˈdɑlɚz" not in out1


def test_pos_tag_entry(g2p):
    assert g2p.lookup("read") == "ˈɹiːd"
    assert g2p.lookup("read", "VERB") == "ˈɹɛd"


def test_capitalization_stress(g2p):
    # uppercase word falls back to lowercase entry with a stress boost
    up = g2p.lookup("HELLO")
    assert up is not None


def test_oov_passthrough(g2p):
    out = g2p.phonemize("zzqx")
    assert "zzqx" in out
