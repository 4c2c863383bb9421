"""Tensor-parallel autoregressive decode over an ICI mesh.

New TPU-native surface (the reference is single-device, SURVEY.md §2.0):
for LMs whose per-token latency is HBM-bound on weight reads (Orpheus-3B:
~6.6 GB/token), sharding the weights Megatron-style over the ``model`` axis
divides the per-chip bytes by the TP degree — 4-way TP on a v5e pod slice
puts the ~8 ms/token roofline at ~2 ms. The implementation is pure GSPMD:
params are placed with :data:`TRANSFORMER_TP_RULES` (column-parallel
QKV/fc1, row-parallel out/fc2), the unmodified ``llama.forward`` runs under
``jax.jit``, and XLA inserts the psum collectives on the row-parallel
projections. The KV cache shards over the head axis by propagation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.models import llama
from tpu_audio.parallel.mesh import TRANSFORMER_TP_RULES, make_mesh, shard_params
from tpu_audio.core.jitting import ajit

__all__ = ["TensorParallelLM"]


class TensorParallelLM:
    """Greedy/temperature decode of a llama-family LM with tensor-parallel
    weights. Single jitted graph per (bucket, max_new): prefill + decode
    scan, one device dispatch per generate call."""

    def __init__(self, cfg: "llama.LlamaConfig", params, mesh=None,
                 rules=TRANSFORMER_TP_RULES, dtype=jnp.bfloat16):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.dtype = dtype
        self.params = shard_params(params, self.mesh, rules)
        self._fns: dict = {}

    def _get_fn(self, bucket: int, max_new: int):
        key = (bucket, max_new)
        if key in self._fns:
            return self._fns[key]
        cfg = self.cfg

        @functools.partial(ajit, static_argnames=("temperature_zero",))
        def run(params, prompt_ids, prompt_len, stop_token, rng, temperature,
                temperature_zero: bool = True):
            # right-aligned prompt in a fixed bucket: the left-pad region
            # [0, bucket - prompt_len) is masked via the cache's valid_from
            cache = llama.make_cache(cfg, 1, bucket + max_new + 1, self.dtype,
                                     valid_from=bucket - prompt_len)
            logits, cache = llama.forward(params, prompt_ids[:, :-1], cache,
                                          cfg)

            def body(c, _):
                cache, last, rng = c
                step_logits, cache = llama.forward(params, last[:, None],
                                                   cache, cfg)
                step_logits = step_logits[:, -1].astype(jnp.float32)
                rng, sub = jax.random.split(rng)
                if temperature_zero:
                    nxt = jnp.argmax(step_logits, axis=-1).astype(jnp.int32)
                else:
                    nxt = jax.random.categorical(
                        sub, step_logits / jnp.maximum(temperature, 1e-6),
                        axis=-1).astype(jnp.int32)
                return (cache, nxt, rng), nxt[0]

            (_, _, _), toks = jax.lax.scan(
                body, (cache, prompt_ids[:, -1], rng), None, length=max_new)
            # on-device stop-token crop count
            hit = toks == stop_token
            count = jnp.where(hit.any(), jnp.argmax(hit), max_new)
            return toks, count

        self._fns[key] = run
        return run

    def generate(self, prompt: list[int] | np.ndarray, max_new: int = 64,
                 stop_token: int = -1, temperature: float = 0.0,
                 seed: int = 0) -> list[int]:
        prompt = np.asarray(prompt, np.int32).reshape(-1)
        bucket = 16 * max(1, -(-len(prompt) // 16))
        buf = np.zeros((1, bucket), np.int32)
        buf[0, bucket - len(prompt):] = prompt  # right-align: last = next in
        run = self._get_fn(bucket, max_new)
        with self.mesh:
            toks, count = run(self.params, jnp.asarray(buf),
                              jnp.int32(len(prompt)), jnp.int32(stop_token),
                              jax.random.PRNGKey(seed),
                              jnp.float32(temperature),
                              temperature_zero=temperature == 0.0)
        return np.asarray(toks)[: int(count)].tolist()
