"""Continuous batching for autoregressive decode — slot-based serving.

New TPU-native surface (the reference is a single-request on-device SDK,
SURVEY.md §2.0; this is the serving analog of vLLM-style continuous
batching re-designed for XLA's static-shape compilation model):

- The engine owns ``slots`` decode lanes. Each lane holds one in-flight
  request's KV cache row; lanes admit new requests the moment the
  previous occupant finishes — no waiting for the whole batch to drain
  (the throughput win over static batching when request lengths differ).
- **Static shapes throughout**: the batched decode step is ONE jitted
  graph of shape ``[slots, ...]`` regardless of how many lanes are
  live; idle lanes run masked garbage (their offsets are frozen so
  nothing corrupts). Prompts are left-padded into a small set of
  bucket lengths, so prefill compiles once per bucket, not per prompt
  (`llama.forward` masks the padding via ``valid_from``; RoPE is
  relative under causal masking so the shift is harmless).
- **Per-row caches via vmap**: each lane's cache is an ordinary
  batch=1 :class:`~tpu_audio.core.kv_cache.KVCache` with its own
  traced ``offset``; the engine stacks them on a leading slot axis and
  ``jax.vmap``s the stock :func:`tpu_audio.models.llama.forward` over
  it. Per-row offsets/rope/masks fall out for free and the model code
  is untouched — the batched GEMVs feed the MXU ``slots`` rows at a
  time, amortizing the HBM weight sweep that dominates single-stream
  decode.
- **Composition-independent sampling**: each step's RNG key is
  ``fold_in(fold_in(base, request_seed), sample_index)``, a pure
  function of the request — NOT of the slot it landed in or who else
  is in the batch. A request's sampled tokens are bit-reproducible
  whether it runs alone or packed with others (tested).

Reference scope note: the closest reference capability is Parakeet's
intra-model ``generateBatch`` (ParakeetModel.swift:168-198), which
batches a *closed* set of utterances; continuous admission is new
surface for production serving.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import kv_cache
from tpu_audio.core.sampling import SamplingParams
from tpu_audio.models import llama

__all__ = ["ContinuousBatcher", "GenRequest"]


@dataclasses.dataclass
class GenRequest:
    """One submitted generation request and its accumulated output."""

    request_id: int
    prompt: np.ndarray
    max_new: int
    seed: int = 0
    tokens: list = dataclasses.field(default_factory=list)
    done: bool = False


class _BatchState(NamedTuple):
    cache: kv_cache.KVCache  # leaves stacked [slots, ...]
    last: jnp.ndarray        # [slots] int32 — last sampled token per lane
    active: jnp.ndarray      # [slots] bool
    n_new: jnp.ndarray       # [slots] int32 — tokens sampled so far
    max_new: jnp.ndarray     # [slots] int32 — per-request budget
    seeds: jnp.ndarray       # [slots] int32 — request RNG seeds


def _sample_one(logits: jnp.ndarray, key, s: SamplingParams) -> jnp.ndarray:
    """Sample one token from ``logits [V]`` (same distribution as
    core.ar_loop's chunked decoder, minus the repetition penalty)."""
    logits = logits.astype(jnp.float32)
    if s.temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if s.top_k and s.top_k > 0 and s.min_p == 0.0:
        vals, idx = jax.lax.top_k(logits, min(s.top_k, logits.shape[-1]))
        if s.top_p < 1.0:
            probs = jax.nn.softmax(vals, axis=-1)
            exceeded = (jnp.cumsum(probs, -1) - probs) > s.top_p
            vals = jnp.where(exceeded, -jnp.inf, vals)
        choice = jax.random.categorical(key, vals / s.temperature, axis=-1)
        return idx[choice].astype(jnp.int32)
    from tpu_audio.core.sampling import _mask_min_p, _mask_top_k, _mask_top_p

    masked = logits
    if s.top_k and s.top_k > 0:
        masked = _mask_top_k(masked[None], s.top_k)[0]
    if s.top_p < 1.0:
        masked = _mask_top_p(masked[None], s.top_p)[0]
    if s.min_p > 0.0:
        masked = _mask_min_p(masked[None], s.min_p)[0]
    return jax.random.categorical(
        key, masked / s.temperature, axis=-1).astype(jnp.int32)


class ContinuousBatcher:
    """Slot-based continuous batching over a llama-family LM.

    >>> eng = ContinuousBatcher(params, cfg, slots=4, max_len=512,
    ...                         stop_token=eos)
    >>> eng.submit(prompt_tokens, max_new=64)
    >>> for request_id, token in eng.run():
    ...     ...                         # tokens stream out as lanes step

    ``params`` is a (stacked-layer) llama parameter tree; ``sampling``
    selects greedy/temperature/top-k/top-p exactly as the offline
    decode loop does. ``prefill_buckets`` are the compiled prompt
    lengths; prompts longer than the largest bucket pad up to the next
    multiple of it.
    """

    def __init__(self, params, cfg: llama.LlamaConfig, *, slots: int = 4,
                 max_len: int = 1024, stop_token: int = -1,
                 sampling: SamplingParams | None = None,
                 prefill_buckets: tuple[int, ...] = (32, 64, 128, 256),
                 seed: int = 0, cache_dtype=None):
        self.params = params
        self.cfg = cfg
        self.slots = int(slots)
        self.max_len = int(max_len)
        self.stop_token = int(stop_token)
        self.sampling = sampling or SamplingParams(temperature=0.0)
        self.buckets = tuple(sorted(prefill_buckets))
        if cache_dtype is None:
            lead = jax.tree.leaves(params)[0]
            cache_dtype = lead.dtype
        self.cache_dtype = cache_dtype
        self._base_key = jax.random.PRNGKey(seed)
        self._next_id = 0
        self._pending: list[GenRequest] = []
        self._lane: list[GenRequest | None] = [None] * self.slots
        self.requests: dict[int, GenRequest] = {}
        self._state = self._init_state()

        sample = functools.partial(_sample_one, s=self.sampling)

        def step_key(req_seed, sample_idx):
            return jax.random.fold_in(
                jax.random.fold_in(self._base_key, req_seed), sample_idx)

        def row_step(cache, tok):
            logits, cache = llama.forward(
                self.params, tok[None, None], cache, cfg)
            return logits[0, -1], cache

        @functools.partial(jax.jit, donate_argnums=(0,))
        def decode_step(state: _BatchState):
            old_offset = state.cache.offset
            logits, cache = jax.vmap(row_step)(state.cache, state.last)
            keys = jax.vmap(step_key)(state.seeds, state.n_new)
            toks = jax.vmap(sample)(logits, keys)
            toks = jnp.where(state.active, toks, state.last)
            # freeze idle lanes: their garbage KV write landed at the
            # (unattended) old offset; keep it unattended
            offset = jnp.where(state.active, old_offset + 1, old_offset)
            cache = cache._replace(offset=offset)
            n_new = state.n_new + state.active.astype(jnp.int32)
            active = (state.active
                      & (toks != self.stop_token)
                      & (n_new < state.max_new)
                      & (offset < self.max_len))
            return state._replace(cache=cache, last=toks, active=active,
                                  n_new=n_new), toks

        self._decode_step = decode_step

        @functools.partial(jax.jit, static_argnums=(1,))
        def prefill(tokens, pad: int, req_seed):
            cache = llama.make_cache(cfg, 1, self.max_len,
                                     dtype=self.cache_dtype,
                                     valid_from=0)
            cache = cache._replace(valid_from=jnp.asarray(pad, jnp.int32))
            logits, cache = llama.forward(
                self.params, tokens[None], cache, cfg)
            tok = sample(logits[0, -1], step_key(req_seed, 0))
            return cache, tok

        self._prefill = prefill

        @functools.partial(jax.jit, donate_argnums=(0,),
                           static_argnums=(2,))
        def insert(state: _BatchState, row_cache, slot: int, tok,
                   max_new, req_seed):
            def put(stacked, row):
                row = jnp.asarray(row)
                return jax.lax.dynamic_update_slice(
                    stacked, row[None].astype(stacked.dtype),
                    (slot,) + (0,) * row.ndim)

            cache = jax.tree.map(put, state.cache, row_cache)
            return state._replace(
                cache=cache,
                last=state.last.at[slot].set(tok),
                active=state.active.at[slot].set(
                    (tok != self.stop_token) & (max_new > 1)
                    & (row_cache.offset < self.max_len)),
                n_new=state.n_new.at[slot].set(1),
                max_new=state.max_new.at[slot].set(max_new),
                seeds=state.seeds.at[slot].set(req_seed))

        self._insert = insert

    # -- state ---------------------------------------------------------

    def _init_state(self) -> _BatchState:
        row = llama.make_cache(self.cfg, 1, self.max_len,
                               dtype=self.cache_dtype)
        cache = jax.tree.map(
            lambda x: jnp.zeros((self.slots,) + x.shape, x.dtype), row)
        def zeros():
            # distinct buffers: donated states must not alias leaves
            return jnp.zeros((self.slots,), jnp.int32)

        return _BatchState(cache=cache, last=zeros(),
                           active=jnp.zeros((self.slots,), bool),
                           n_new=zeros(), max_new=zeros(), seeds=zeros())

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        big = self.buckets[-1]
        return ((n + big - 1) // big) * big

    # -- public API ----------------------------------------------------

    def submit(self, prompt, max_new: int, seed: int = 0) -> GenRequest:
        """Queue a request; it is admitted at the next :meth:`step` with a
        free lane. Returns the live :class:`GenRequest` (its ``tokens``
        list fills in as the engine runs)."""
        prompt = np.asarray(prompt, np.int32).reshape(-1)
        if prompt.size == 0:
            raise ValueError("empty prompt")
        padded = self._bucket(prompt.size)
        if padded >= self.max_len:
            raise ValueError(
                f"prompt pads to {padded} >= max_len={self.max_len}")
        req = GenRequest(request_id=self._next_id, prompt=prompt,
                         max_new=int(max_new), seed=int(seed))
        self._next_id += 1
        self._pending.append(req)
        self.requests[req.request_id] = req
        return req

    @property
    def idle(self) -> bool:
        return not self._pending and all(r is None for r in self._lane)

    def _admit(self) -> list[tuple[int, int]]:
        """Prefill pending requests into free lanes. Returns
        ``(request_id, first_token)`` for requests whose first sampled
        token arrived during admission."""
        emitted = []
        for slot in range(self.slots):
            if self._lane[slot] is not None or not self._pending:
                continue
            req = self._pending.pop(0)
            padded = self._bucket(req.prompt.size)
            pad = padded - req.prompt.size
            tokens = np.full((padded,), 0, np.int32)
            tokens[pad:] = req.prompt
            row_cache, tok = self._prefill(jnp.asarray(tokens), pad,
                                           req.seed)
            tok_host = int(tok)
            self._state = self._insert(self._state, row_cache, slot,
                                       tok, req.max_new, req.seed)
            self._lane[slot] = req
            if tok_host == self.stop_token:
                req.done = True
                self._lane[slot] = None
            else:
                req.tokens.append(tok_host)
                emitted.append((req.request_id, tok_host))
                if req.max_new <= 1 or padded >= self.max_len:
                    req.done = True
                    self._lane[slot] = None
        return emitted

    def step(self) -> list[tuple[int, int]]:
        """Admit pending requests, then run ONE batched decode step.
        Returns the ``(request_id, token)`` pairs emitted this tick."""
        emitted = self._admit()
        if all(r is None for r in self._lane):
            return emitted
        live = [s for s, r in enumerate(self._lane) if r is not None]
        self._state, toks = self._decode_step(self._state)
        toks_host = np.asarray(toks)
        active_host = np.asarray(self._state.active)
        for slot in live:
            req = self._lane[slot]
            tok = int(toks_host[slot])
            if tok != self.stop_token:
                req.tokens.append(tok)
                emitted.append((req.request_id, tok))
            if not active_host[slot]:
                req.done = True
                self._lane[slot] = None
        return emitted

    def run(self):
        """Generator draining the engine: yields ``(request_id, token)``
        until every submitted request is done."""
        while not self.idle:
            yield from self.step()
