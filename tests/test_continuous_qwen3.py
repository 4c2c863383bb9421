"""ContinuousQwen3TTS serving tests: exact solo parity, composition
independence, lane reuse, bucketed underload ticks."""

import numpy as np
import pytest

from tpu_audio.core.generation import AudioGenerateParameters
from tpu_audio.models.tts import load_model
from tpu_audio.parallel.continuous_qwen3 import ContinuousQwen3TTS

from fixtures import make_qwen3_tts_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_qwen3_tts_fixture(
        tmp_path_factory.mktemp("q3serve"))))


GP = AudioGenerateParameters(temperature=0.0, max_tokens=12,
                             streaming_interval=0.4)


def solo_run(model, text, seed=0):
    """Reference: codes + concatenated audio from generate_stream."""
    p = AudioGenerateParameters(
        temperature=GP.temperature, max_tokens=GP.max_tokens,
        streaming_interval=GP.streaming_interval, seed=seed)
    chunks = [np.asarray(ev.audio) for ev in
              model.generate_stream(text, generation_parameters=p)
              if ev.audio is not None]
    codes, *_ = model._run(text, None, None, None, p)
    return codes, (np.concatenate(chunks) if chunks else
                   np.zeros((0,), np.float32))


def serve_run(model, texts, slots=2, seeds=None):
    srv = ContinuousQwen3TTS(model, slots=slots, generation_parameters=GP)
    reqs = [srv.submit(t, seed=(seeds or [0] * len(texts))[i])
            for i, t in enumerate(texts)]
    audio = {r.request_id: [] for r in reqs}
    for rid, wav in srv.run():
        audio[rid].append(wav)
    return srv, reqs, {rid: (np.concatenate(a) if a else
                             np.zeros((0,), np.float32))
                       for rid, a in audio.items()}


def test_solo_parity_codes_and_audio(model):
    """A served request's codes AND streamed audio are bit-identical to
    generate_stream (the VERDICT done-criterion for Qwen3TTS serving)."""
    ref_codes, ref_audio = solo_run(model, "hello world")
    srv, (req,), audio = serve_run(model, ["hello world"], slots=2)
    assert len(req.codes) == len(ref_codes)
    np.testing.assert_array_equal(np.stack(req.codes),
                                  np.stack(ref_codes))
    np.testing.assert_allclose(audio[req.request_id], ref_audio,
                               atol=2e-5, rtol=2e-4)


def test_composition_independent(model):
    """Codes are identical whether a request runs alone or packed with a
    different request in the other lane."""
    _, (alone,), _ = serve_run(model, ["hello world"], slots=2)
    _, (packed, other), _ = serve_run(
        model, ["hello world", "a much longer different sentence here"],
        slots=2)
    np.testing.assert_array_equal(np.stack(alone.codes),
                                  np.stack(packed.codes))
    assert len(other.codes) > 0


def test_lane_reuse_and_idle(model):
    """More requests than slots: lanes recycle and the engine drains."""
    srv, reqs, audio = serve_run(
        model, ["one", "two", "three"], slots=2, seeds=[0, 1, 2])
    assert srv.idle
    assert all(r.done for r in reqs)
    assert all(len(r.codes) > 0 for r in reqs)
    assert all(len(audio[r.request_id]) > 0 for r in reqs)


def test_bucketed_solo_tick_used(model):
    """A lone request in a slots=4 engine runs the bucket-1 graph and
    still produces solo-identical codes."""
    ref_codes, _ = solo_run(model, "hello world")
    srv = ContinuousQwen3TTS(model, slots=4, generation_parameters=GP)
    req = srv.submit("hello world")
    srv.step()
    # one live lane -> bucket size 1 compiled
    entries = srv._tick_bucket._cache
    assert entries, "bucketed tick was not used"
    for _ in range(64):
        if req.done:
            break
        srv.step()
    np.testing.assert_array_equal(np.stack(req.codes), np.stack(ref_codes))


def test_cancel(model):
    srv = ContinuousQwen3TTS(model, slots=2, generation_parameters=GP)
    r = srv.submit("hello world")
    srv.step()
    assert srv.cancel(r.request_id)
    assert r.done and srv.idle
    assert not srv.cancel(r.request_id)
