"""Wav2Vec2 tests: golden parity against HF transformers (torch) for both
CTC and the trunk, MMS adapters, LID head."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.core.generation import STTGenerateParameters
from tpu_audio.models.stt.wav2vec2 import Wav2Vec2CTC, Wav2Vec2Config
from tpu_audio.models.lid.wav2vec2_lid import Wav2Vec2LID


def _tiny_hf_config(**kw):
    from transformers import Wav2Vec2Config as HFConfig

    base = dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=[16, 16, 16], conv_kernel=[10, 3, 3],
        conv_stride=[5, 2, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, vocab_size=12, pad_token_id=0,
        do_stable_layer_norm=False, feat_extract_norm="group",
    )
    base.update(kw)
    return HFConfig(**base)


@pytest.fixture(scope="module")
def hf_ctc_dir(tmp_path_factory):
    """Save a random HF Wav2Vec2ForCTC as a local checkpoint."""
    import torch
    from transformers import Wav2Vec2ForCTC

    torch.manual_seed(0)
    model = Wav2Vec2ForCTC(_tiny_hf_config())
    model.eval()
    d = tmp_path_factory.mktemp("w2v2_hf")
    model.save_pretrained(d, safe_serialization=True)
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4, "a": 5,
             "b": 6, "c": 7, "d": 8, "e": 9, "f": 10, "g": 11}
    (d / "vocab.json").write_text(json.dumps(vocab))
    return d, model


def test_ctc_logits_match_transformers(hf_ctc_dir):
    """Bit-level architecture parity with the HF torch implementation."""
    import torch

    d, hf_model = hf_ctc_dir
    model = Wav2Vec2CTC.from_pretrained(str(d))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4000)).astype(np.float32)

    got = np.asarray(model._forward(model.params, jnp.asarray(x)))
    with torch.no_grad():
        want = hf_model(torch.from_numpy(x)).logits.numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_ctc_generate(hf_ctc_dir):
    d, _ = hf_ctc_dir
    model = Wav2Vec2CTC.from_pretrained(str(d))
    audio = np.random.default_rng(1).standard_normal(8000).astype(np.float32)
    out = model.generate(audio)
    assert isinstance(out.text, str)
    assert out.total_time > 0


def test_stable_layer_norm_variant(tmp_path):
    import torch
    from transformers import Wav2Vec2ForCTC

    torch.manual_seed(1)
    cfg = _tiny_hf_config(do_stable_layer_norm=True, feat_extract_norm="layer")
    hf = Wav2Vec2ForCTC(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    (tmp_path / "vocab.json").write_text(json.dumps({"<pad>": 0, "a": 1}))
    model = Wav2Vec2CTC.from_pretrained(str(tmp_path))
    x = np.random.default_rng(2).standard_normal((1, 4000)).astype(np.float32)
    got = np.asarray(model._forward(model.params, jnp.asarray(x)))
    with torch.no_grad():
        want = hf(torch.from_numpy(x)).logits.numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_lid_matches_transformers(tmp_path):
    import torch
    from transformers import Wav2Vec2ForSequenceClassification

    torch.manual_seed(2)
    cfg = _tiny_hf_config()
    cfg.num_labels = 6
    cfg.id2label = {i: f"lang{i}" for i in range(6)}
    cfg.label2id = {v: k for k, v in cfg.id2label.items()}
    cfg.classifier_proj_size = 16
    cfg.use_weighted_layer_sum = False
    hf = Wav2Vec2ForSequenceClassification(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    model = Wav2Vec2LID.from_pretrained(str(tmp_path))
    wav = np.random.default_rng(3).standard_normal(6000).astype(np.float32)
    out = model.predict(wav, top_k=3)
    assert out.language.startswith("lang")
    assert len(out.top_languages) == 3

    # logits parity (HF normalizes externally; replicate predict's norm)
    x = (wav - wav.mean()) / (wav.std() + 1e-7)
    got = np.asarray(model._forward(model.params, jnp.asarray(x[None])))
    with torch.no_grad():
        want = hf(torch.from_numpy(x[None])).logits.numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_mms_multilang_vocab_and_adapter(tmp_path, hf_ctc_dir):
    """Per-language vocabularies select by language; adapter files merge."""
    d, hf_model = hf_ctc_dir
    import shutil

    work = tmp_path / "mms"
    shutil.copytree(d, work)
    vocab = {"eng": {"<pad>": 0, "a": 5, "b": 6},
             "fra": {"<pad>": 0, "x": 5, "y": 6}}
    (work / "vocab.json").write_text(json.dumps(vocab))
    model = Wav2Vec2CTC.from_pretrained(str(work))
    assert model._vocab_for("fra")[5] == "x"
    assert model._vocab_for("eng")[5] == "a"
    assert model._vocab_for(None)[5] in ("a", "x")
    # adapter file missing -> False
    assert model.load_adapter("deu") is False
