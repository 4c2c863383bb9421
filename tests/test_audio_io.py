import numpy as np
import pytest

from tpu_audio.core import audio_io


def test_wav_roundtrip_mono(tmp_path):
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    x = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    p = tmp_path / "tone.wav"
    audio_io.save_wav(p, x, sr)
    y, sr2 = audio_io.load_audio(p)
    assert sr2 == sr
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1.0 / 32767 + 1e-6)


def test_wav_roundtrip_stereo_and_mixdown(tmp_path):
    sr = 8000
    x = np.stack(
        [np.linspace(-0.5, 0.5, sr, dtype=np.float32),
         np.linspace(0.5, -0.5, sr, dtype=np.float32)],
        axis=1,
    )
    p = tmp_path / "st.wav"
    audio_io.save_wav(p, x, sr)
    y, _ = audio_io.load_audio(p, mono=False)
    assert y.shape == (sr, 2)
    m, _ = audio_io.load_audio(p, mono=True)
    np.testing.assert_allclose(m, y.mean(axis=1), atol=1e-6)


def test_load_with_resample(tmp_path):
    sr = 48000
    t = np.arange(sr, dtype=np.float32) / sr
    x = 0.3 * np.sin(2 * np.pi * 1000.0 * t)
    p = tmp_path / "hi.wav"
    audio_io.save_wav(p, x, sr)
    y, sr2 = audio_io.load_audio(p, sample_rate=16000)
    assert sr2 == 16000
    assert abs(len(y) - 16000) <= 2
    # energy of a pure tone is preserved through polyphase resampling
    assert abs(np.sqrt((y**2).mean()) - np.sqrt((x**2).mean())) < 0.01


def test_streaming_wav_writer_matches_one_shot(tmp_path):
    sr = 16000
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(12345).astype(np.float32) * 0.2).clip(-1, 1)
    p1, p2 = tmp_path / "stream.wav", tmp_path / "oneshot.wav"
    with audio_io.StreamingWAVWriter(str(p1), sr) as w:
        for start in range(0, len(x), 1000):
            w.append(x[start : start + 1000])
    audio_io.save_wav(p2, x, sr)
    y1, _ = audio_io.load_audio(p1)
    y2, _ = audio_io.load_audio(p2)
    np.testing.assert_array_equal(y1, y2)


def test_float32_wav(tmp_path):
    # IEEE-float WAVs appear in TTS voice prompt assets
    import struct

    sr = 16000
    x = np.linspace(-1, 1, 100, dtype=np.float32)
    p = tmp_path / "f32.wav"
    data = x.astype("<f4").tobytes()
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, sr, sr * 4, 4, 32))
        f.write(b"data" + struct.pack("<I", len(data)) + data)
    y, sr2 = audio_io.load_audio(p)
    assert sr2 == sr
    np.testing.assert_allclose(y, x, atol=1e-6)


def test_bad_file_raises(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"not a wav file at all")
    with pytest.raises(ValueError):
        audio_io.load_audio(p)
