"""NemoAlignment semantics: sentence grouping, contiguous overlap merge,
LCS fallback, and the repeated-phrase boundary case the naive
duplicate-dropping merge gets wrong (NemoAlignment.swift:97-273)."""

import pytest

from tpu_audio.models.stt import nemo_alignment as na


def tok(i, text, start, dur=0.08):
    return na.AlignedToken(id=i, text=text, start=start, duration=dur)


def seq(words, t0=0.0, step=0.1, id0=0):
    return [tok(id0 + i, (" " if i else "") + w, t0 + i * step)
            for i, w in enumerate(words)]


def test_tokens_to_sentences_period_rule():
    tokens = [tok(1, "Hi", 0.0), tok(2, ".", 0.1), tok(3, " there", 0.2),
              tok(4, "!", 0.3), tok(5, " ok", 0.4)]
    sents = na.tokens_to_sentences(tokens)
    # '.' closes only when next token starts a new word (has a space)
    assert [s.text for s in sents] == ["Hi.", " there!", " ok"]
    assert sents[0].start == 0.0 and sents[1].end == pytest.approx(0.38)


def test_period_inside_word_does_not_close():
    tokens = [tok(1, "3", 0.0), tok(2, ".", 0.1), tok(3, "14", 0.2),
              tok(4, " done", 0.3)]
    sents = na.tokens_to_sentences(tokens)
    assert len(sents) == 1


def test_merge_disjoint_concatenates():
    a = seq(["one", "two"], 0.0)
    b = seq(["three", "four"], 5.0, id0=10)
    merged = na.merge_token_sequences(a, b, overlap_duration=2.0)
    assert [t.id for t in merged] == [0, 1, 10, 11]


def test_merge_contiguous_anchors_on_shared_tokens():
    # chunk A covers 0..2s, chunk B covers 1..3s; both saw tokens 5,6 in
    # the overlap at (nearly) the same absolute times
    a = seq(["a", "b"], 0.0) + [tok(5, " x", 1.0), tok(6, " y", 1.2)]
    b = [tok(5, " x", 1.02), tok(6, " y", 1.21), tok(7, " z", 2.0)]
    merged = na.merge_token_sequences(a, b, overlap_duration=1.0)
    assert [t.id for t in merged] == [0, 1, 5, 6, 7]


def test_merge_repeated_phrase_boundary():
    """A phrase repeated on both sides of the chunk boundary must not be
    deduplicated: the instances have different timestamps, so the aligned
    merge keeps both (the r1 naive merge dropped one)."""
    # "the cat the cat" around the boundary: A sees both, B sees the second
    # instance plus continuation
    a = [tok(1, " the", 0.8), tok(2, " cat", 1.0),
         tok(1, " the", 1.6), tok(2, " cat", 1.8)]
    b = [tok(1, " the", 1.62), tok(2, " cat", 1.81), tok(3, " ran", 2.2)]
    merged = na.merge_token_sequences(a, b, overlap_duration=1.0)
    assert [t.id for t in merged] == [1, 2, 1, 2, 3]
    texts = "".join(t.text for t in merged)
    assert texts == " the cat the cat ran"


def test_lcs_fallback_on_weak_overlap():
    """Contiguous merge raises NoStrongOverlap when the chunks disagree on
    most overlap tokens; LCS fallback still stitches on what matches."""
    a = [tok(1, " a", 0.0), tok(2, " b", 0.5), tok(3, " c", 1.0),
         tok(4, " d", 1.5), tok(5, " e", 2.0)]
    # b disagrees except for tokens 3 and 5, and token ordering has junk
    b = [tok(9, " q", 1.01), tok(3, " c", 1.02), tok(8, " r", 1.4),
         tok(5, " e", 2.02), tok(6, " f", 2.5)]
    with pytest.raises(na.NoStrongOverlap):
        na.merge_longest_contiguous(a, b, overlap_duration=2.0)
    merged = na.merge_token_sequences(a, b, overlap_duration=2.0)
    ids = [t.id for t in merged]
    assert 3 in ids and 5 in ids and 6 in ids
    assert ids == sorted(range(len(ids)), key=lambda i: merged[i].start) \
        or merged == sorted(merged, key=lambda t: t.start)


def test_cutoff_merge_when_overlap_too_small():
    a = [tok(1, " a", 0.0, 0.1), tok(2, " b", 1.0, 0.1)]
    b = [tok(3, " c", 0.9, 0.1)]
    merged = na.merge_token_sequences(a, b, overlap_duration=0.5)
    # (a_end + b_start)/2 = (1.1+0.9)/2 = 1.0 -> 'a' (<1.0) from a kept,
    # 'b' dropped, 'c' dropped (starts 0.9 < 1.0)... cutoff keeps sorted halves
    assert all(t.end <= 1.0 for t in merged if t.id in (1, 2))


def test_parakeet_long_audio_merge_has_no_duplicate_tail(tmp_path):
    """End-to-end: chunked generate runs the aligned merge and produces
    monotonically ordered sentence segments with no duplicated overlap."""
    import numpy as np

    from fixtures import make_parakeet_fixture

    from tpu_audio.core.generation import STTGenerateParameters
    from tpu_audio.models.stt.parakeet import Parakeet

    d = make_parakeet_fixture(tmp_path / "p")
    model = Parakeet.from_pretrained(str(d))
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    out = model.generate(audio, STTGenerateParameters(
        max_tokens=256, chunk_duration=1.0))
    starts = [s.start for s in out.segments]
    assert starts == sorted(starts)
    # merged transcript is bounded by what the chunks produced
    single = model.generate(audio, STTGenerateParameters(max_tokens=256))
    assert out.generation_token_count <= 2 * max(
        1, single.generation_token_count) + 8
