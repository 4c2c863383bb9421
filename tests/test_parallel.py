"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_audio.models.stt import whisper as W
from tpu_audio.parallel import make_mesh, shard_params
from tpu_audio.parallel.mesh import TRANSFORMER_TP_RULES
from tpu_audio.parallel.train import make_train_step


def _tiny_cfg():
    return W.WhisperConfig(
        num_mel_bins=16, d_model=64, encoder_layers=2,
        encoder_attention_heads=4, encoder_ffn_dim=128,
        decoder_layers=2, decoder_attention_heads=4, decoder_ffn_dim=128,
        vocab_size=128, max_source_positions=64, max_target_positions=32,
    )


def test_mesh_shapes():
    mesh = make_mesh(8, axes=("data", "model"))
    assert mesh.shape["data"] * mesh.shape["model"] == 8


def test_shard_params_applies_tp_rules():
    mesh = make_mesh(8, axes=("data", "model"))
    cfg = _tiny_cfg()
    params = shard_params(W.init_params(cfg, dtype=jnp.float32), mesh)
    # stacked layer layout: [L, O, I] — the rule right-aligns, the layer
    # axis replicates
    fc1 = params["model"]["encoder"]["layers"]["fc1"]["weight"]
    spec = fc1.sharding.spec
    assert spec[-2] == "model"  # column parallel
    fc2 = params["model"]["encoder"]["layers"]["fc2"]["weight"]
    assert fc2.sharding.spec[-1] == "model"  # row parallel


def test_sharded_train_step_runs_and_matches_single_device():
    cfg = _tiny_cfg()
    optimizer = optax.sgd(1e-2)
    train_step = make_train_step(cfg, optimizer)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((4, 128, cfg.num_mel_bins)).astype(np.float32) * 0.1
    tokens = rng.integers(0, cfg.vocab_size, (4, 16)).astype(np.int32)

    # single device
    p1 = W.init_params(cfg, dtype=jnp.float32)
    o1 = optimizer.init(p1)
    _, _, loss1 = train_step(p1, o1, {"mel": jnp.asarray(mel), "tokens": jnp.asarray(tokens)})

    # sharded dp x tp
    mesh = make_mesh(8, axes=("data", "model"))
    p2 = shard_params(W.init_params(cfg, dtype=jnp.float32), mesh)
    o2 = optimizer.init(p2)
    bs = NamedSharding(mesh, P("data"))
    batch = {"mel": jax.device_put(mel, bs), "tokens": jax.device_put(tokens, bs)}
    with mesh:
        _, _, loss2 = train_step(p2, o2, batch)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)


def test_inference_sharded_forward_matches_replicated():
    cfg = _tiny_cfg()
    mesh = make_mesh(8, axes=("data", "model"))
    params = W.init_params(cfg, dtype=jnp.float32)
    sharded = shard_params(params, mesh)
    mel = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 128, cfg.num_mel_bins)).astype(np.float32)
    )
    want = np.asarray(W.encoder_forward(params, mel, cfg))
    with mesh:
        got = np.asarray(W.encoder_forward(sharded, mel, cfg))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_batch_server_matches_local():
    """BatchServer shards the batch over the data axis and matches the
    unsharded forward, including ragged batch padding."""
    import jax.numpy as jnp

    from tpu_audio.parallel.serve import BatchServer

    params = {"w": jnp.asarray(np.linspace(-1, 1, 8 * 4,
                                           dtype=np.float32).reshape(8, 4))}

    def fn(p, x):  # [B, 8] -> [B, 4]
        return jnp.tanh(x @ p["w"])

    server = BatchServer(fn, params)
    assert server.n_data == 8
    rng = np.random.default_rng(0)
    for b in (8, 16, 5):  # even, multiple, ragged
        x = rng.standard_normal((b, 8)).astype(np.float32)
        got = np.asarray(server(x))
        want = np.asarray(fn(params, jnp.asarray(x)))
        assert got.shape == (b, 4)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_batch_server_whisper_encoder():
    """Whisper encoder features sharded over 8 virtual devices match the
    single-device encoder."""
    import jax.numpy as jnp

    from tpu_audio.models.stt import whisper as W
    from tpu_audio.parallel.serve import BatchServer

    cfg = W.WhisperConfig(num_mel_bins=80, d_model=32, encoder_layers=2,
                          encoder_attention_heads=2, encoder_ffn_dim=64,
                          decoder_layers=2, decoder_attention_heads=2,
                          decoder_ffn_dim=64, vocab_size=64,
                          max_target_positions=48)
    params = W.init_params(cfg, seed=0, dtype=jnp.float32)

    def encode(p, feats):
        return W.encoder_forward(p, feats, cfg=cfg)

    server = BatchServer(encode, params)
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((8, 3000, 80)).astype(np.float32)
    got = np.asarray(server(feats))
    want = np.asarray(encode(params, jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_tp_llama_decode_matches_replicated():
    """Tensor-parallel KV-cached llama decode (Megatron specs over the
    model axis) matches the replicated result — the sharding story for
    serving 3B+ AR TTS backbones across chips."""
    from tpu_audio.models import llama

    cfg = llama.LlamaConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4,
        intermediate_size=128, max_position_embeddings=64)
    params = llama.init_random_params(cfg, seed=0, dtype=jnp.float32)
    tokens = jnp.asarray(np.arange(5)[None, :] % 256, jnp.int32)

    cache = llama.make_cache(cfg, 1, 12, jnp.float32)
    want, cache_w = llama.forward(params, tokens, cache, cfg)
    step = jnp.asarray([[7]], jnp.int32)
    want2, _ = llama.forward(params, step, cache_w, cfg)

    mesh = make_mesh(8, axes=("data", "model"), shape=(2, 4))
    sharded = shard_params(params, mesh)
    with mesh:
        cache = llama.make_cache(cfg, 1, 12, jnp.float32)
        got, cache_g = llama.forward(sharded, tokens, cache, cfg)
        got2, _ = llama.forward(sharded, step, cache_g, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=2e-4)


def test_tp_llama_decode_fused_projections():
    """The fused qkv/gate_up layout also runs under the TP specs (GSPMD
    reshards the uneven GQA split; correctness is what's pinned)."""
    from tpu_audio.models import llama

    cfg = llama.LlamaConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4,
        intermediate_size=128, max_position_embeddings=64)
    params = llama.init_random_params(cfg, seed=0, dtype=jnp.float32)
    fused = llama.fuse_projections(params)
    tokens = jnp.asarray(np.arange(5)[None, :] % 256, jnp.int32)
    cache = llama.make_cache(cfg, 1, 12, jnp.float32)
    want, _ = llama.forward(fused, tokens, cache, cfg)

    mesh = make_mesh(8, axes=("data", "model"), shape=(2, 4))
    sharded = shard_params(fused, mesh)
    with mesh:
        cache = llama.make_cache(cfg, 1, 12, jnp.float32)
        got, _ = llama.forward(sharded, tokens, cache, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_tensor_parallel_decode_matches_single_device():
    """TensorParallelLM over a model-axis mesh reproduces the single-device
    greedy decode exactly (GSPMD collectives vs local matmuls)."""
    from tpu_audio.models import llama
    from tpu_audio.parallel.infer import TensorParallelLM
    from tpu_audio.parallel.mesh import make_mesh

    cfg = llama.LlamaConfig(
        vocab_size=96, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, intermediate_size=64,
        max_position_embeddings=128)
    params = llama.init_random_params(cfg, seed=0, dtype=jnp.float32)
    prompt = [3, 17, 45, 9, 22]

    # single-device reference
    single = TensorParallelLM(cfg, params, mesh=make_mesh(1, axes=("model",)),
                              dtype=jnp.float32)
    want = single.generate(prompt, max_new=10)

    mesh = make_mesh(8, axes=("data", "model"))
    tp = TensorParallelLM(cfg, params, mesh=mesh, dtype=jnp.float32)
    got = tp.generate(prompt, max_new=10)
    assert got == want
    # weights really are sharded over the model axis
    q = tp.params["model"]["layers"]["self_attn"]["q_proj"]["weight"]
    assert "model" in str(q.sharding.spec)


def test_tensor_parallel_stop_token():
    from tpu_audio.models import llama
    from tpu_audio.parallel.infer import TensorParallelLM
    from tpu_audio.parallel.mesh import make_mesh

    cfg = llama.LlamaConfig(
        vocab_size=96, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, num_key_value_heads=4, intermediate_size=64,
        max_position_embeddings=128)
    params = llama.init_random_params(cfg, seed=1, dtype=jnp.float32)
    tp = TensorParallelLM(cfg, params, mesh=make_mesh(4, axes=("model",)),
                          dtype=jnp.float32)
    full = tp.generate([5, 6], max_new=8)
    assert len(full) <= 8
    if len(full) > 1:
        stopped = tp.generate([5, 6], max_new=8, stop_token=full[0])
        assert stopped == []  # crops strictly before the stop token


def test_pipeline_parallel_matches_single_device():
    """GPipe stage pipeline (ppermute over the 'stage' axis) is numerically
    identical to the plain stacked-layer forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_audio.models import llama
    from tpu_audio.parallel.mesh import make_mesh
    from tpu_audio.parallel.pipeline import pipeline_forward

    cfg = llama.LlamaConfig(
        vocab_size=96, hidden_size=32, num_hidden_layers=8,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=64, max_position_embeddings=64)
    params = llama.init_random_params(cfg, seed=0, dtype=jnp.float32)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 96, (4, 12)), jnp.int32)

    want, _ = llama.forward(params, tokens, None, cfg)

    mesh = make_mesh(4, axes=("stage",))
    got = pipeline_forward(params, tokens, cfg, mesh, n_microbatches=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    # 8 stages x 4 microbatches, batch not equal to microbatches
    mesh8 = make_mesh(8, axes=("stage",))
    got8 = pipeline_forward(params, tokens, cfg, mesh8, n_microbatches=4)
    np.testing.assert_allclose(np.asarray(got8), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
