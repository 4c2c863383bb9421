"""LASR CTC tests: weighted-residual conformer, subsampling, CTC decode."""

import numpy as np
import pytest

from tpu_audio.models.stt import load_model
from tpu_audio.models.stt.lasr import LasrCTC, LasrConfig

from fixtures import make_lasr_fixture


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    return load_model(str(make_lasr_fixture(tmp_path_factory.mktemp("lasr"))))


def test_factory(model):
    assert isinstance(model, LasrCTC)
    assert model.config.num_mel_bins == 8
    assert model.config.vocab_size == 24
    # num_batches_tracked dropped by sanitize
    norm = model.params["encoder"]["layers"]["0"]["conv"]["norm"]
    assert "num_batches_tracked" not in norm


def test_config_residual_weights_defaults():
    cfg = LasrConfig.from_dict({"encoder_config": {"hidden_size": 32}})
    assert cfg.conv_residual_weights == (2.0, 1.0)
    assert cfg.feed_forward_residual_weights == (1.5, 0.5)
    assert cfg.hidden_size == 32


def test_generate(model):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    out = model.generate(audio)
    assert isinstance(out.text, str)
    assert out.segments[0].end == pytest.approx(1.0)
    out2 = model.generate(audio)
    assert out.text == out2.text  # deterministic


def test_padding_does_not_change_tokens(model):
    """Bucketed padding must not alter the valid-region CTC argmax: a
    longer bucket (forced by longer audio length then cropping) vs the
    raw length gives identical token ids for the shared prefix."""
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(12000) * 0.1).astype(np.float32)
    import jax.numpy as jnp
    from tpu_audio.models.stt import parakeet

    feats = np.asarray(parakeet.log_mel_spectrogram(audio, model._pre))
    t = feats.shape[1]
    for bucket in (128, 256):
        assert bucket >= t
        padded = np.zeros((1, bucket, feats.shape[2]), np.float32)
        padded[0, :t] = feats[0]
        logits = np.asarray(model._forward(model.params, jnp.asarray(padded),
                                           jnp.int32(t)))
        if bucket == 128:
            ref = logits[0, :20].argmax(-1)
        else:
            np.testing.assert_array_equal(logits[0, :20].argmax(-1), ref)


def test_resample_path(model):
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    out = model.generate(audio, sample_rate=8000)
    assert isinstance(out.text, str)


def test_stream_wrapper(model):
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    events = list(model.generate_stream(audio))
    assert events[-1]["type"] == "result"
