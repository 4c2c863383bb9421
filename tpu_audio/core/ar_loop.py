"""Generic jit-compiled autoregressive decode loop.

The reusable TPU replacement for the reference's per-model token loops
(e.g. LlamaTTS.swift:714-744, WhisperModel.swift:228-269), which sync the
host every token. Here the whole decode — sampling (temperature/top-p/top-k/
repetition penalty), stop-token detection, token buffering — runs inside one
``lax.while_loop`` per chunk; the host syncs once per *chunk* (a chunk is
``max_new`` for offline generation or a small N for streaming).

Models supply a ``step_fn(params, tokens[B,1], cache) -> (logits[B,V],
cache)`` closure; everything else is shared.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from tpu_audio.core.sampling import SamplingParams, apply_repetition_penalty
from tpu_audio.core.jitting import ajit

__all__ = ["make_decode_chunk", "DecodeState"]


def make_decode_chunk(step_fn: Callable, sampling: SamplingParams,
                      history_size: int = 64,
                      token_map: Callable | None = None):
    """Build a jitted chunked decoder.

    Returns ``decode_chunk(params, cache, last_token[B], tokens_out[N],
    rng, stop_token, history, hist_pos, n_emitted) -> (...)`` where each call
    decodes up to ``tokens_out.shape[0]`` new tokens, stopping early on the
    stop token. ``history`` is a [B, history_size] ring buffer for the
    repetition penalty carried across chunks.

    ``token_map`` (optional) maps each sampled logits-space index to the
    model's token id before it is emitted / fed back / stop-compared — for
    restricted output heads whose logits cover only a token sub-band (the
    repetition history stays in logits space so the penalty indexes the
    restricted logits correctly).
    """

    @functools.partial(ajit, donate_argnums=(1, 3, 6))
    def decode_chunk(params, cache, last_token, tokens_out, rng, stop_token,
                     history, hist_pos):
        chunk = tokens_out.shape[0]
        b = last_token.shape[0]

        def cond(c):
            (_, i, _, _, finished, _, _, _) = c
            return jnp.logical_and(~finished, i < chunk)

        def body(c):
            (tokens, i, cache, last, finished, rng, hist, hpos) = c
            logits, cache = step_fn(params, last[:, None], cache)
            logits = logits.astype(jnp.float32)
            if sampling.repetition_penalty != 1.0:
                hist_mask = jnp.ones(hist.shape, jnp.bool_)
                valid = (
                    jax.lax.broadcasted_iota(jnp.int32, hist.shape, 1)
                    < jnp.minimum(hpos, history_size)
                )
                logits = apply_repetition_penalty(
                    logits, hist, hist_mask & valid, sampling.repetition_penalty
                )
            rng, sub = jax.random.split(rng)
            if sampling.temperature == 0.0:
                next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            elif (sampling.top_k and sampling.top_k > 0
                    and sampling.min_p == 0.0):
                # fused top-k -> nucleus -> sample in the k-candidate
                # space: ONE O(V) top_k per token instead of two (the
                # top-p nucleus is a subset of the top-k set, so the
                # distribution is identical)
                vals, idx = jax.lax.top_k(
                    logits, min(sampling.top_k, logits.shape[-1]))
                if sampling.top_p < 1.0:
                    probs = jax.nn.softmax(vals, axis=-1)
                    exceeded = (jnp.cumsum(probs, -1) - probs) \
                        > sampling.top_p
                    vals = jnp.where(exceeded, -jnp.inf, vals)
                choice = jax.random.categorical(
                    sub, vals / sampling.temperature, axis=-1)
                next_tok = jnp.take_along_axis(
                    idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)
            else:
                from tpu_audio.core.sampling import (
                    _mask_min_p,
                    _mask_top_k,
                    _mask_top_p,
                )

                masked = logits
                if sampling.top_k and sampling.top_k > 0:
                    masked = _mask_top_k(masked, sampling.top_k)
                if sampling.top_p < 1.0:
                    masked = _mask_top_p(masked, sampling.top_p)
                if sampling.min_p > 0.0:
                    masked = _mask_min_p(masked, sampling.min_p)
                next_tok = jax.random.categorical(
                    sub, masked / sampling.temperature, axis=-1
                ).astype(jnp.int32)
            hist = jax.lax.dynamic_update_slice(
                hist, next_tok[:, None], (0, hpos % history_size)
            )
            if token_map is not None:
                next_tok = token_map(next_tok)
            finished = jnp.all(next_tok == stop_token)
            tokens = tokens.at[i].set(next_tok[0])
            return (tokens, i + 1, cache, next_tok, finished, rng, hist, hpos + 1)

        init = (tokens_out, jnp.int32(0), cache, last_token,
                jnp.bool_(False), rng, history, hist_pos)
        (tokens, count, cache, last, finished, rng, hist, hpos) = (
            jax.lax.while_loop(cond, body, init)
        )
        return tokens, count, cache, last, finished, rng, hist, hpos

    return decode_chunk
