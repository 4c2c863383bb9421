"""Golden parity of the Kokoro PL-BERT (ALBERT) text encoder vs torch.

``tpu_audio.models.tts.kokoro.albert_forward`` is the text-encoder stage of
the Kokoro StyleTTS2 pipeline (reference Albert.swift); the param tree uses
HF AlbertModel key names, so a seeded ``transformers.AlbertModel`` pins the
math (factorized embeddings, layer-group sharing, post-LN attention,
gelu_new FFN, additive attention mask) within float tolerance."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_audio.models.tts.kokoro import PLBertConfig, albert_forward


@pytest.fixture(scope="module")
def albert():
    import torch
    from transformers import AlbertConfig, AlbertModel

    hf_cfg = AlbertConfig(
        vocab_size=64, embedding_size=16, hidden_size=32,
        num_hidden_layers=3, num_hidden_groups=1, inner_group_num=1,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=32, type_vocab_size=2,
        hidden_act="gelu_new", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, classifier_dropout_prob=0.0,
        layer_norm_eps=1e-12)
    torch.manual_seed(7)
    hf = AlbertModel(hf_cfg, add_pooling_layer=False).eval()
    ours = PLBertConfig(
        num_hidden_layers=3, num_attention_heads=4, hidden_size=32,
        intermediate_size=64, max_position_embeddings=32,
        embedding_size=16, inner_group_num=1, num_hidden_groups=1,
        type_vocab_size=2, layer_norm_eps=1e-12)
    return hf, ours


def _params(hf):
    from tpu_audio.core import loading

    return loading.unflatten({k: v.numpy()
                              for k, v in hf.state_dict().items()})


def test_albert_full_forward_matches(albert):
    import torch

    hf, cfg = albert
    ids = np.asarray([[2, 9, 41, 13, 60, 5, 33, 1]], np.int32)
    mask = np.ones_like(ids)
    with torch.no_grad():
        want = hf(torch.tensor(ids, dtype=torch.long),
                  attention_mask=torch.tensor(mask, dtype=torch.long)
                  ).last_hidden_state.numpy()
    got = albert_forward(_params(hf), jnp.asarray(ids), jnp.asarray(mask),
                         cfg)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_albert_padded_batch_matches(albert):
    """Non-pad positions must match with a real attention mask (batch of
    two rows, second right-padded) — pins the additive-mask semantics."""
    import torch

    hf, cfg = albert
    ids = np.asarray([[4, 7, 19, 22, 58, 11, 3, 9],
                      [8, 30, 44, 2, 0, 0, 0, 0]], np.int32)
    mask = np.asarray([[1] * 8, [1] * 4 + [0] * 4], np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(ids, dtype=torch.long),
                  attention_mask=torch.tensor(mask, dtype=torch.long)
                  ).last_hidden_state.numpy()
    got = np.asarray(albert_forward(_params(hf), jnp.asarray(ids),
                                    jnp.asarray(mask), cfg))
    np.testing.assert_allclose(got[0], want[0], atol=3e-5)
    np.testing.assert_allclose(got[1, :4], want[1, :4], atol=3e-5)


def test_albert_layer_group_sharing(albert):
    """ALBERT reuses one layer group's weights across all layers — zeroing
    the shared FFN must change every position (proves each of the 3 layers
    routed through group 0, not per-layer params)."""
    hf, cfg = albert
    ids = np.asarray([[2, 9, 41, 13]], np.int32)
    mask = np.ones_like(ids)
    params = _params(hf)
    base = np.asarray(albert_forward(params, jnp.asarray(ids),
                                     jnp.asarray(mask), cfg))
    lp = params["encoder"]["albert_layer_groups"]["0"]["albert_layers"]["0"]
    lp["ffn"]["weight"] = np.zeros_like(lp["ffn"]["weight"])
    changed = np.asarray(albert_forward(params, jnp.asarray(ids),
                                        jnp.asarray(mask), cfg))
    assert np.abs(base - changed).max() > 1e-3
