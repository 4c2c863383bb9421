"""DeepFilterNet tests: ERB machinery, normalization, end-to-end enhance."""

import numpy as np
import pytest

from tpu_audio.models.sts import load_model
from tpu_audio.models.sts.deepfilternet import (
    DeepFilterNet,
    compute_norm_alpha,
    erb_band_widths,
    vorbis_window,
)

from fixtures import make_deepfilternet_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return DeepFilterNet.from_pretrained(
        str(make_deepfilternet_fixture(tmp_path_factory.mktemp("dfn"))))


def test_factory(tmp_path):
    m = load_model(str(make_deepfilternet_fixture(tmp_path / "d")))
    assert isinstance(m, DeepFilterNet)
    assert m.sample_rate == 48000


def test_erb_band_widths_cover_bins():
    widths = erb_band_widths(48000, 960, 32, 2)
    assert len(widths) == 32
    assert sum(widths) == 481
    assert all(w >= 1 for w in widths)
    # fixture-sized variant
    widths2 = erb_band_widths(48000, 96, 8, 2)
    assert sum(widths2) == 49


def test_vorbis_window_power_complementary():
    """Vorbis window with 50% overlap satisfies Princen-Bradley:
    w[n]^2 + w[n+N/2]^2 == 1."""
    w = vorbis_window(960)
    s = w[:480] ** 2 + w[480:] ** 2
    np.testing.assert_allclose(s, 1.0, atol=1e-5)


def test_norm_alpha():
    a = compute_norm_alpha(480, 48000)
    assert 0.98 < a < 1.0


def test_band_mean_norm_matches_sequential(model):
    """Closed-form cumsum EMA must equal the libDF sequential loop."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((20, 8)).astype(np.float32) * 10 - 60
    got = np.asarray(model._band_mean_norm(x))
    a = model.norm_alpha
    # v2/v3 closed form: state_t = a^t * init + (1-a) * sum a^(t-k) x_k
    # (bandMeanNorm, DeepFilterNetDSP.swift:8-25; the a^t-init variant, not
    # the v1 sequential-exact path)
    init = np.linspace(-60.0, -90.0, 8)
    want = np.zeros_like(x)
    for t in range(20):
        ks = np.arange(t + 1)
        state = a**t * init + (1 - a) * np.sum(
            (a ** (t - ks))[:, None] * x[: t + 1], axis=0)
        want[t] = (x[t] - state) / 40.0
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_enhance_end_to_end(model):
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(4800) * 0.1).astype(np.float32)
    out = model.enhance(audio)
    assert out.shape == audio.shape
    assert np.isfinite(out).all()
    assert np.abs(out).max() <= 1.0


def test_enhance_deterministic(model):
    audio = (np.sin(np.arange(2400) * 0.01)).astype(np.float32) * 0.3
    a = model.enhance(audio)
    b = model.enhance(audio)
    np.testing.assert_array_equal(a, b)


def test_enhance_streaming_covers_input(model):
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(3000) * 0.1).astype(np.float32)
    chunks = list(model.enhance_streaming(audio, chunk_samples=960))
    total = sum(len(c) for c in chunks)
    assert total == len(audio)


def test_streamer_matches_offline(model):
    """Stateful hop-by-hop streamer is sample-identical to offline enhance
    under adversarial chunk sizes (reference front-end-equivalence pattern,
    VoxtralRealtimeStreamingFrontEndTests.swift:1-47)."""
    from tpu_audio.models.sts.deepfilternet import DeepFilterNetStreamer

    rng = np.random.default_rng(0)
    hop = model.config.hop_size
    audio = (rng.standard_normal(hop * 23 + 37).astype(np.float32) * 0.3)
    want = model.enhance(audio)

    streamer = DeepFilterNetStreamer(model)
    outs = []
    pos = 0
    for size in [hop, 173, hop * 7, 1, 999, hop * 30]:
        if pos >= len(audio):
            break
        outs.append(streamer.process_chunk(audio[pos : pos + size]))
        pos += size
    if pos < len(audio):
        outs.append(streamer.process_chunk(audio[pos:]))
    outs.append(streamer.flush())
    got = np.concatenate([o for o in outs if len(o)])

    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=5e-4)
    summary = streamer.profiling_summary()
    assert "ms/hop" in summary


def test_enhance_streaming_generator_matches_offline(model):
    rng = np.random.default_rng(1)
    hop = model.config.hop_size
    audio = (rng.standard_normal(hop * 11).astype(np.float32) * 0.2)
    want = model.enhance(audio)
    got = np.concatenate(list(model.enhance_streaming(audio,
                                                      chunk_samples=hop * 3)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_band_norm_stable_for_long_audio(model):
    """Regression: the closed-form a**t EMA underflowed float32 past ~88 s
    (x/powers -> inf -> NaN); the associative-scan recurrence is stable
    and matches a sequential EMA at arbitrary length."""
    import jax.numpy as jnp

    a = model.norm_alpha
    t = 100_000
    rng = np.random.default_rng(0)
    x = rng.standard_normal((t, 4)).astype(np.float32) * 10 - 60.0
    got = np.asarray(model._band_mean_norm(jnp.asarray(x)))
    assert np.isfinite(got).all()
    # sequential reference on the last frames
    init = np.linspace(-60.0, -90.0, 4, dtype=np.float64)
    s = init / a
    for i in range(t):
        s = a * s + (1 - a) * x[i].astype(np.float64)
    np.testing.assert_allclose(got[-1], (x[-1] - s) / 40.0, atol=1e-3)


def test_enhance_bucketing_invariant(model):
    """Bucket padding must not change results: lengths that land in
    different buckets produce identical prefixes."""
    rng = np.random.default_rng(2)
    hop = model.config.hop_size
    audio = rng.standard_normal(hop * 40 + 7).astype(np.float32) * 0.2
    full = model.enhance(audio)
    short = model.enhance(audio[: hop * 9 + 3])
    # prefix far from the short signal's tail is identical
    n = hop * 5
    np.testing.assert_allclose(full[:n], short[:n], atol=2e-4)
