"""Golden parity of the shared T5/ByT5 stack vs transformers (serves the
neural G2P and the SAM-Audio text encoder)."""

import numpy as np

import jax.numpy as jnp


def test_byt5_encoder_matches_transformers():
    import torch
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    from tpu_audio.core import loading
    from tpu_audio.models.g2p import byt5

    hf_cfg = HFT5Config(
        vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
        layer_norm_epsilon=1e-6, feed_forward_proj="gated-gelu",
        tie_word_embeddings=True, decoder_start_token_id=0)
    torch.manual_seed(0)
    hf = T5ForConditionalGeneration(hf_cfg).eval()

    cfg = byt5.T5Config(
        vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, layer_norm_epsilon=1e-6,
        tie_word_embeddings=True)
    params = loading.unflatten(byt5.sanitize(
        {k: v.numpy() for k, v in hf.state_dict().items()}))

    ids = np.asarray([[5, 9, 23, 61, 2, 44, 7, 1]], np.int32)
    with torch.no_grad():
        want = hf.encoder(torch.tensor(ids, dtype=torch.long)
                          ).last_hidden_state.numpy()
    got = np.asarray(byt5.encode(params, jnp.asarray(ids),
                                 jnp.int32(ids.shape[1]), cfg))
    # the reference (and this port) uses exact-erf gelu in the gated FF
    # (FeedForward.swift:16); HF ByT5 uses the tanh approximation, a
    # known ~5e-4 activation delta
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_byt5_greedy_decode_matches_transformers():
    import torch
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    from tpu_audio.core import loading
    from tpu_audio.models.g2p import byt5

    hf_cfg = HFT5Config(
        vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
        layer_norm_epsilon=1e-6, feed_forward_proj="gated-gelu",
        tie_word_embeddings=True, decoder_start_token_id=0, eos_token_id=1,
        pad_token_id=0)
    torch.manual_seed(1)
    hf = T5ForConditionalGeneration(hf_cfg).eval()

    cfg = byt5.T5Config(
        vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, layer_norm_epsilon=1e-6,
        tie_word_embeddings=True)
    params = loading.unflatten(byt5.sanitize(
        {k: v.numpy() for k, v in hf.state_dict().items()}))
    model = byt5.ByT5G2P(cfg, params, max_length=8)

    ids = [7, 12, 33, 2, 1]
    with torch.no_grad():
        want = hf.generate(torch.tensor([ids], dtype=torch.long),
                           max_new_tokens=8, do_sample=False,
                           num_beams=1).numpy()[0]
    arr = np.asarray([ids], np.int32)
    memory = model._encode(model.params, jnp.asarray(arr),
                           jnp.int32(len(ids)))
    tokens, count = model._get_loop()(model.params, memory,
                                      jnp.int32(len(ids)))
    got_list = np.asarray(tokens)[: int(count)].tolist()
    # HF output starts with the decoder_start token; strip it
    want_list = want.tolist()[1:]
    assert got_list == want_list[: len(got_list)]
    assert len(got_list) > 0
