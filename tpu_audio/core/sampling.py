"""Fused on-device token sampling: temperature / top-k / top-p /
min-p / repetition penalty.

Replaces MLXLMCommon's sampler/processor factories (consumed at
LlamaTTS.swift:691-692). Everything here is jnp inside the jitted decode
step — no per-token host sync, which is the single most important perf
delta vs the reference's ``.item()``-per-token loop on TPU.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

__all__ = ["SamplingParams", "sample_token", "apply_repetition_penalty"]


@dataclass(frozen=True)
class SamplingParams:
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0  # 0 = disabled
    min_p: float = 0.0
    repetition_penalty: float = 1.0
    repetition_context_size: int = 64


def apply_repetition_penalty(logits: jnp.ndarray, token_history: jnp.ndarray,
                             history_mask: jnp.ndarray,
                             penalty: float) -> jnp.ndarray:
    """Divide positive / multiply negative logits of recently generated
    tokens (CTRL-style; mirrors mlx_lm's repetition processor).

    ``logits``: [B, V]; ``token_history``: [B, C] int32 ring of recent
    tokens; ``history_mask``: [B, C] bool of valid entries.
    """
    if penalty == 1.0:
        return logits
    b, v = logits.shape
    onehot = jax.nn.one_hot(token_history, v, dtype=jnp.bool_)  # [B, C, V]
    seen = jnp.any(onehot & history_mask[..., None], axis=1)  # [B, V]
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def _mask_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    k = min(k, logits.shape[-1])
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


# Nucleus filtering only ever needs the head of the distribution; sorting
# the full 100k+ vocab every decode step is pure waste on TPU. Prefilter
# with lax.top_k (O(V) selection) and sort only this many candidates. If
# the true nucleus is wider than this (flat distributions, e.g. acoustic
# code tokens at high temperature), the tail beyond the prefilter is
# dropped. 512 keeps >0.999 of the nucleus mass for p<=0.95 on LM-shaped
# distributions and roughly halves the top_k cost vs 2048 (measured on the
# Orpheus-3B decode: sampling overhead 0.40 -> ~0.25 ms/token on v5e);
# widen via TPU_AUDIO_TOP_P_PREFILTER when sampling very flat distributions
# at top_p > 0.95.
TOP_P_PREFILTER = int(os.environ.get("TPU_AUDIO_TOP_P_PREFILTER", "512"))


def _prefilter_top(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Top-k head of the logits, sorted descending. On TPU uses the
    hardware-optimized ``approx_max_k`` (recall ~= 0.95 *per element of
    the true top-k*): for a nucleus prefilter the handful of possibly
    swapped-out tail candidates carry negligible probability mass, and
    the kernel is several times faster than exact top_k at 100k+ vocab."""
    if k == logits.shape[-1]:
        return jnp.sort(logits, axis=-1)[..., ::-1]
    if jax.default_backend() in ("tpu", "axon"):
        vals, _ = jax.lax.approx_max_k(logits, k)
        return vals
    return jax.lax.top_k(logits, k)[0]


def _mask_top_p(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Nucleus filtering. Keeps the smallest set of tokens whose cumulative
    probability exceeds ``top_p`` (always keeps the argmax)."""
    vocab = logits.shape[-1]
    k = min(TOP_P_PREFILTER, vocab)
    top_vals = _prefilter_top(logits, k)  # sorted descending
    probs = jax.nn.softmax(top_vals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # mask tokens whose *preceding* cumulative mass already exceeds top_p
    exceeded = (cum - probs) > top_p
    cutoff = jnp.where(exceeded, jnp.inf, top_vals).min(
        axis=-1, keepdims=True)
    return jnp.where(logits < cutoff, -jnp.inf, logits)


def _mask_min_p(logits: jnp.ndarray, min_p: float) -> jnp.ndarray:
    probs = jax.nn.softmax(logits, axis=-1)
    top = probs.max(axis=-1, keepdims=True)
    return jnp.where(probs < min_p * top, -jnp.inf, logits)


def sample_token(rng: jax.Array, logits: jnp.ndarray,
                 params: SamplingParams,
                 token_history: jnp.ndarray | None = None,
                 history_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Sample next tokens ``[B]`` from ``logits [B, V]``, fully on device."""
    logits = logits.astype(jnp.float32)
    if params.repetition_penalty != 1.0 and token_history is not None:
        logits = apply_repetition_penalty(
            logits, token_history, history_mask, params.repetition_penalty
        )
    if params.temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if params.top_k and params.top_k > 0:
        logits = _mask_top_k(logits, params.top_k)
    if params.top_p < 1.0:
        logits = _mask_top_p(logits, params.top_p)
    if params.min_p > 0.0:
        logits = _mask_min_p(logits, params.min_p)
    return jax.random.categorical(
        rng, logits / params.temperature, axis=-1
    ).astype(jnp.int32)
