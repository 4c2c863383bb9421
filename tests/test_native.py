"""Native (C++) host audio runtime: build, correctness vs the NumPy
reference paths, and the PCMStreamConverter integration."""

import numpy as np
import pytest

from tpu_audio import native
from tpu_audio.core.audio_stream import PCMStreamConverter


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_polyphase_matches_numpy():
    rng = np.random.default_rng(0)
    buf = rng.standard_normal(5000).astype(np.float32)
    kernel = rng.standard_normal((5, 37)).astype(np.float32)
    orig_r, n_frames, start0 = 3, 100, 7
    out = native.polyphase(buf, start0, orig_r, kernel, n_frames)
    starts = start0 + np.arange(n_frames) * orig_r
    frames = buf[starts[:, None] + np.arange(37)[None]]
    want = (frames @ kernel.T).reshape(-1)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)


def test_pcm16_and_mono():
    x = np.array([-32768, -1, 0, 1, 32767], np.int16)
    out = native.pcm16_to_f32(x)
    np.testing.assert_allclose(out, x.astype(np.float32) / 32768.0)
    st = np.random.default_rng(1).standard_normal((50, 2)).astype(np.float32)
    np.testing.assert_allclose(native.mix_to_mono(st), st.mean(axis=1),
                               rtol=1e-6, atol=1e-7)


def test_stream_converter_native_matches_numpy(monkeypatch):
    rng = np.random.default_rng(2)
    chunks = [rng.standard_normal(n).astype(np.float32) * 0.5
              for n in (480, 1, 1600, 333, 4800)]

    def run():
        conv = PCMStreamConverter(out_rate=16000)
        outs = [conv.push(c, in_rate=48000) for c in chunks]
        outs.append(conv.finish())
        return np.concatenate(outs)

    with_native = run()
    monkeypatch.setattr(native, "polyphase", lambda *a, **k: None)
    without = run()
    assert with_native.shape == without.shape
    np.testing.assert_allclose(with_native, without, rtol=1e-4, atol=1e-6)
