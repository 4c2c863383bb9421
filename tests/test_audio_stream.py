"""Streaming PCM conversion + chunk-scheduler tests: streaming resample
matches the offline sinc resampler, format/rate handling, fade-in and
speaking-state semantics."""

import numpy as np

from tpu_audio.codecs.higgs_audio import sinc_resample
from tpu_audio.core.audio_stream import AudioPlayer, PCMStreamConverter


def test_streaming_matches_offline():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(24000) * 0.3).astype(np.float32)
    ref = sinc_resample(x, 24000, 16000)
    conv = PCMStreamConverter(16000)
    outs = []
    for i in range(0, len(x), 1111):  # ragged chunks
        outs.append(conv.push(x[i:i + 1111], in_rate=24000))
    outs.append(conv.finish())
    y = np.concatenate(outs)
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_upsample_and_length():
    x = np.sin(np.arange(1600) / 5).astype(np.float32)
    conv = PCMStreamConverter(48000)
    y = np.concatenate([conv.push(x, in_rate=16000), conv.finish()])
    assert len(y) == len(x) * 3
    ref = sinc_resample(x, 16000, 48000)
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_int16_and_stereo_downmix():
    x16 = (np.sin(np.arange(800) / 7) * 20000).astype(np.int16)
    conv = PCMStreamConverter(16000)
    y = conv.push(x16, in_rate=16000)  # same rate: passthrough
    assert y.dtype == np.float32 and np.abs(y).max() < 1.0
    stereo = np.stack([x16, x16], axis=1)
    y2 = conv.push(stereo, in_rate=16000)
    np.testing.assert_allclose(y2, y, atol=1e-6)


def test_rate_change_flushes():
    conv = PCMStreamConverter(16000)
    a = conv.push(np.ones(480, np.float32), in_rate=48000)
    b = conv.push(np.ones(320, np.float32), in_rate=32000)
    # the 32 kHz push first flushed the 48 kHz converter tail
    assert len(a) + len(b) > 0
    tail = conv.finish()
    total = len(a) + len(b) + len(tail)
    # 480@48k -> 160 out, 320@32k -> 160 out
    assert total == 320


def test_player_fades_and_state():
    sink = []
    events = []
    p = AudioPlayer(16000, sink=sink.append)
    p.on_speaking_state_changed = events.append
    first = p.schedule_audio_chunk(np.ones(800, np.float32))
    assert first[0] == 0.0  # 10 ms fade-in from zero
    assert first[159] < 1.0 and first[160] == 1.0
    second = p.schedule_audio_chunk(np.ones(800, np.float32))
    assert second[319] < 1.0 and second[320] == 1.0  # 20 ms crossfade
    nofade = p.schedule_audio_chunk(np.ones(100, np.float32),
                                    with_crossfade=False)
    assert (nofade == 1.0).all()
    assert len(sink) == 3 and p.duration == 1700 / 16000
    assert events == [True]
    done = []
    p.on_did_finish_streaming = lambda: done.append(1)
    p.finish_streaming()
    assert events == [True, False] and done == [1]
    p.stop()
    assert p.scheduled_frames == 0 and not p.is_streaming


def test_samples_and_pcm_stream_helpers():
    """generateSamplesStream / generatePCMBufferStream analogs
    (MLXAudioTTS/Generation.swift:53,79) over a stubbed generate_stream."""
    import numpy as np

    from tpu_audio.core.generation import (AudioGeneration, pcm_stream,
                                           samples_stream)

    class Stub:
        sample_rate = 16000

        def generate_stream(self, text, **kw):
            yield AudioGeneration.from_token(3)
            yield AudioGeneration.from_audio(
                np.sin(np.arange(1600) * 0.05).astype(np.float32) * 0.5)
            yield AudioGeneration.from_audio(
                np.sin(np.arange(800) * 0.05).astype(np.float32) * 0.5)
            yield AudioGeneration.from_progress(1.0)

    chunks = list(samples_stream(Stub(), "hi"))
    assert [len(c) for c in chunks] == [1600, 800]
    assert all(c.dtype == np.float32 for c in chunks)

    pcm = np.concatenate(list(pcm_stream(Stub(), "hi", out_rate=8000)))
    assert pcm.dtype == np.int16
    # 2400 samples at 16 kHz -> ~1200 at 8 kHz
    assert abs(len(pcm) - 1200) <= 8
    assert np.abs(pcm.astype(np.int32)).max() <= 32767

    same_rate = np.concatenate(list(pcm_stream(Stub(), "hi")))
    assert len(same_rate) == 2400
