"""GPipe-style pipeline parallelism over the stacked-layer Llama backbone.

New TPU-native surface (the reference is single-device, SURVEY.md §2.0):
the decoder's stacked ``[L, ...]`` layer tree is split into S contiguous
stages sharded over a ``stage`` mesh axis; microbatches flow through the
stages with :func:`jax.lax.ppermute` point-to-point transfers over ICI
(scaling-book pipeline recipe: S + M - 1 ticks, bubble fraction
(S-1)/(S+M-1)). Complements the Megatron tensor-parallel layout in
``parallel/infer.py`` — PP moves *weights* off-chip-boundary once per
tick, TP moves *activations* every matmul, so PP wins when layers are
large and interconnect is narrow.

Teacher-forced (cache-less) forward — scoring/training shape. Exact
numerical parity with ``llama.forward`` is pinned in
``tests/test_parallel.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # stable since jax 0.6; experimental path kept for older versions
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from tpu_audio.models import llama

__all__ = ["split_stages", "pipeline_hidden", "pipeline_forward"]


def split_stages(layers_stacked, n_stages: int):
    """Reshape every ``[L, ...]`` leaf to ``[S, L/S, ...]`` (contiguous
    layer ranges per stage)."""
    def reshape(a):
        L = a.shape[0]
        if L % n_stages:
            raise ValueError(f"{L} layers not divisible into "
                             f"{n_stages} stages")
        return a.reshape(n_stages, L // n_stages, *a.shape[1:])

    return jax.tree.map(reshape, layers_stacked)


def pipeline_hidden(staged_layers, inputs_embeds, cfg, mesh,
                    n_microbatches: int, axis: str = "stage"):
    """Run embeddings ``[B, T, D]`` through all layers, stages sharded over
    ``mesh[axis]``. Returns hidden states ``[B, T, D]`` (replicated).

    B must divide into ``n_microbatches``. Every stage computes every tick
    (idle ticks do throwaway work — the schedule cost model is unchanged
    and it keeps the loop shape static for XLA).
    """
    S = mesh.shape[axis]
    B, T, D = inputs_embeds.shape
    M = n_microbatches
    if B % M:
        raise ValueError(f"batch {B} not divisible into {M} microbatches")
    x_mb = inputs_embeds.reshape(M, B // M, T, D)
    positions = jnp.arange(T)
    cos, sin = llama._rope_tables(cfg, positions)

    def stage_fn(layers_local, x_mb):
        sid = jax.lax.axis_index(axis)
        layers_local = jax.tree.map(lambda a: a[0], layers_local)

        def tick(carry, t):
            cur, out = carry
            mb = jnp.clip(t, 0, M - 1)
            inp = jnp.where(sid == 0, x_mb[mb], cur)
            y = llama.layers_apply(layers_local, inp, cfg, cos, sin)
            # hand the activation to the next stage; stage 0 receives zeros
            nxt = jax.lax.ppermute(
                y, axis, [(i, i + 1) for i in range(S - 1)])
            # the last stage finished microbatch t-(S-1) this tick
            idx = t - (S - 1)
            take = jnp.logical_and(sid == S - 1, idx >= 0)
            slot = jnp.clip(idx, 0, M - 1)
            out = out.at[slot].set(jnp.where(take, y, out[slot]))
            return (nxt, out), None

        zeros = jnp.zeros_like(x_mb[0])
        out0 = jnp.zeros_like(x_mb)
        (_, out), _ = jax.lax.scan(tick, (zeros, out0),
                                   jnp.arange(M + S - 1))
        # replicate the last stage's collected outputs to every device
        return jax.lax.psum(jnp.where(sid == S - 1, out, 0.0), axis)

    layer_specs = jax.tree.map(lambda _: P(axis), staged_layers)
    # psum/ppermute under manual collectives: disable replication checking
    # (kwarg renamed check_rep -> check_vma when shard_map stabilized)
    import inspect

    flag = ("check_vma" if "check_vma"
            in inspect.signature(shard_map).parameters else "check_rep")
    fn = shard_map(stage_fn, mesh=mesh,
                   in_specs=(layer_specs, P()), out_specs=P(),
                   **{flag: False})
    out = fn(staged_layers, x_mb)
    return out.reshape(B, T, D)


def pipeline_forward(params, tokens, cfg, mesh, n_microbatches: int = 4,
                     axis: str = "stage"):
    """Full teacher-forced forward: embed -> pipelined layers -> final
    norm + head. ``params`` is the standard stacked post-load tree; the
    layer stack is re-split per call (cheap reshape; pre-place with
    ``split_stages`` + ``jax.device_put`` for production)."""
    from tpu_audio.core import nn

    p = params["model"] if "model" in params else params
    staged = split_stages(p["layers"], mesh.shape[axis])
    staged = jax.device_put(
        staged, jax.tree.map(
            lambda _: NamedSharding(mesh, P(axis)), staged))
    x = nn.embedding(p["embed_tokens"], tokens)
    if cfg.embedding_multiplier != 1.0:
        x = x * cfg.embedding_multiplier
    x = pipeline_hidden(staged, x, cfg, mesh, n_microbatches, axis)
    x = nn.rms_norm(p["norm"], x, cfg.rms_norm_eps)
    if "lm_head" in params and not cfg.tie_word_embeddings:
        logits = nn.linear(params["lm_head"], x)
    else:
        logits = nn.embedding_as_linear(p["embed_tokens"], x)
    if cfg.logits_scaling != 1.0:
        logits = logits / cfg.logits_scaling
    return logits
