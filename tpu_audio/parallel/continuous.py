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
  ``jax.vmap``s the model's single-stream ``step_fn`` over it. Per-row
  offsets/rope/masks fall out for free and the model code is
  untouched — the batched GEMVs feed the MXU ``slots`` rows at a
  time, amortizing the HBM weight sweep that dominates single-stream
  decode.
- **Composition-independent sampling**: each step's RNG key is
  ``fold_in(fold_in(base, request_seed), sample_index)``, a pure
  function of the request — NOT of the slot it landed in or who else
  is in the batch. A request's sampled tokens are bit-reproducible
  whether it runs alone or packed with others (tested).
- **Same decode semantics as the offline loop**: the per-step pipeline
  (repetition penalty over a logits-space ring history → sample →
  record raw index → ``token_map`` to the model's id space → stop
  compare) mirrors ``core.ar_loop.make_decode_chunk`` exactly, so a
  model's restricted output head (e.g. the Orpheus audio-band head)
  and its sampling knobs behave identically under the server.

Reference scope note: the closest reference capability is Parakeet's
intra-model ``generateBatch`` (ParakeetModel.swift:168-198), which
batches a *closed* set of utterances; continuous admission is new
surface for production serving.

Multi-chip: the engine is GSPMD-transparent — pass params sharded
Megatron-style over a ``model`` mesh axis
(``parallel.mesh.shard_params`` + ``TRANSFORMER_TP_RULES``) and the
jitted tick runs slots x TP: XLA inserts the psum collectives and the
per-lane KV caches shard over the head axis by propagation, with
bit-identical tokens (tested on the 8-device CPU mesh).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core.sampling import SamplingParams, apply_repetition_penalty
from tpu_audio.models import llama
from tpu_audio.core.jitting import ajit

__all__ = ["ContinuousBatcher", "ContinuousTTS", "EngineWorkerBase",
           "GenRequest", "TTSEngineWorker"]


@dataclasses.dataclass
class GenRequest:
    """One submitted generation request and its accumulated output."""

    request_id: int
    prompt: np.ndarray
    max_new: int
    seed: int = 0
    tokens: list = dataclasses.field(default_factory=list)
    done: bool = False
    context: object = None   # per-request conditioning pytree (or None)


class _Tick(NamedTuple):
    """One launched decode tick, harvested later (pipelined engines fetch
    a tick's outputs only after the NEXT tick is already in flight)."""

    packed: object           # device [2K+1, bucket|slots] int32
    cols: list               # output column of each live lane
    live: list               # slot index of each live lane at launch
    reqs: list               # the occupying GenRequest per live lane
    k: int                   # scan length the tick's graph used


class _BatchState(NamedTuple):
    cache: object            # per-lane cache pytree, leaves [slots, ...]
    last: jnp.ndarray        # [slots] int32 — next input token per lane
    active: jnp.ndarray      # [slots] bool
    n_new: jnp.ndarray       # [slots] int32 — tokens sampled so far
    max_new: jnp.ndarray     # [slots] int32 — per-request budget
    seeds: jnp.ndarray       # [slots] int32 — request RNG seeds
    hist: jnp.ndarray        # [slots, H] int32 — logits-space ring buffer
    hpos: jnp.ndarray        # [slots] int32 — ring write position
    ctx: object = None       # per-lane conditioning pytree [slots, ...]


def coerce_fused_flag(fused) -> bool:
    """Normalize the engines' ``fused: str | bool`` knob: "auto"/"1"/
    truthy enable, "0"/"off"/"false"/"no"/"disabled"/"none"/"" disable
    (bool(str) alone would ENABLE for any non-empty string)."""
    if isinstance(fused, str):
        return fused.lower() not in ("0", "off", "false", "no",
                                     "disabled", "none", "")
    return bool(fused)


def _sample_one(logits: jnp.ndarray, key, s: SamplingParams) -> jnp.ndarray:
    """Sample one token from ``logits [V]`` (same distribution as
    core.ar_loop's chunked decoder; the repetition penalty is applied by
    the caller on the batched logits)."""
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
    """Slot-based continuous batching over a single-stream decode step.

    >>> eng = ContinuousBatcher(params, cfg, slots=4, max_len=512,
    ...                         stop_token=eos)
    >>> eng.submit(prompt_tokens, max_new=64)
    >>> for request_id, token in eng.run():
    ...     ...                         # tokens stream out as lanes step

    By default the engine decodes a (stacked-layer) llama parameter
    tree with the full-vocab head. Custom models plug in via the
    ``core.ar_loop`` contract:

    - ``step_fn(params, tokens [1, 1], cache) -> (logits [1, V], cache)``
    - ``prefill_fn(params, ids [1, T], cache) -> (_, cache)``
    - ``cache_factory(valid_from) ->`` a fresh batch=1 cache
    - ``token_map``: sampled logits-space index -> model token id
      (restricted heads); the repetition history stays in logits space.
    - ``batch_step_fn(params, cache, last [n], ctx) -> (logits [n, V],
      cache)``: lane-aware alternative to ``step_fn`` — receives the
      WHOLE stacked lane state (cache/ctx leaves ``[n, ...]``, ``n`` the
      current tick's static lane-bucket size) instead of being vmapped
      row-wise, so a single kernel can share work across lanes (the
      M-lane monolithic Pallas decoder shares its HBM weight sweep over
      every live lane). The engine still owns offsets/sampling/freezing.

    Per-request conditioning (encoder-decoder serving): pass
    ``context_template`` (a pytree of zero arrays shaped like ONE
    request's conditioning, e.g. whisper's precomputed cross-attention
    K/V) and supply a matching ``context=`` pytree to :meth:`submit`.
    ``step_fn``/``prefill_fn`` then take it as a 4th argument and the
    engine stacks it on the slot axis exactly like the KV cache.
    ``logits_hook(logits [V], n_new []) -> logits`` applies model logit
    rules inside the tick (e.g. whisper suppression; ``n_new == 0``
    marks the first sampled position for begin-suppression).

    ``sampling`` selects greedy/temperature/top-k/top-p/repetition
    penalty exactly as the offline decode loop does. ``prefill_buckets``
    are the compiled prompt lengths; prompts longer than the largest
    bucket pad up to the next multiple of it.

    ``step_tokens=K`` decodes K tokens per jitted tick (a ``lax.scan``
    inside one graph) instead of one: host dispatch overhead amortizes
    K-fold, which matters when per-call latency rivals the step compute
    (the tunneled-TPU dispatch floor is ~3x a 3B-model decode step).
    Sampled tokens are bit-identical for any K — each request's RNG key
    depends only on (request seed, sample index) — and lanes that hit
    their stop mid-chunk freeze for the rest of the tick; admission
    happens at tick boundaries, so K trades a little admission latency
    for serving throughput.
    """

    def __init__(self, params, cfg: llama.LlamaConfig | None = None, *,
                 slots: int = 4, max_len: int = 1024, stop_token: int = -1,
                 sampling: SamplingParams | None = None,
                 prefill_buckets: tuple[int, ...] = (32, 64, 128, 256),
                 seed: int = 0, cache_dtype=None,
                 step_fn: Callable | None = None,
                 batch_step_fn: Callable | None = None,
                 prefill_fn: Callable | None = None,
                 cache_factory: Callable | None = None,
                 token_map: Callable | None = None,
                 pad_token: int = 0, step_tokens: int = 1,
                 context_template=None,
                 logits_hook: Callable | None = None,
                 min_tick_tokens: int | None = None,
                 pipeline: bool = False):
        self.params = params
        self.slots = int(slots)
        self.max_len = int(max_len)
        self.stop_token = int(stop_token)
        self.sampling = sampling or SamplingParams(temperature=0.0)
        self.step_tokens = int(step_tokens)
        if self.step_tokens < 1:
            raise ValueError(f"step_tokens must be >= 1, got {step_tokens}")
        # Underload amortization: with n live lanes a tick's fixed cost
        # (host dispatch + the tunneled device->host result fetch, ~30-45
        # ms on a remote-attached chip) is paid once per tick regardless
        # of how many tokens it decodes. min_tick_tokens=T makes every
        # bucket graph scan enough steps that the tick decodes >= T tokens
        # across its live lanes (K_b = ceil(T / b) rounded up to a
        # step_tokens multiple), so a lone stream in a slots=8 server
        # amortizes the tick cost over T tokens instead of step_tokens.
        self.min_tick_tokens = (None if min_tick_tokens is None
                                else int(min_tick_tokens))
        # Pipelined ticks: launch tick N+1 BEFORE fetching tick N's packed
        # outputs, so the (tunneled) device->host readback of tick N
        # overlaps tick N+1's decode compute instead of serializing with
        # it. step() then returns the PREVIOUS tick's tokens (one tick of
        # emission latency); token content/order per request is unchanged.
        self.pipeline = bool(pipeline)
        self._inflight: _Tick | None = None
        self.buckets = tuple(sorted(prefill_buckets))
        self.pad_token = int(pad_token)
        self.history_size = max(1, self.sampling.repetition_context_size) \
            if self.sampling.repetition_penalty != 1.0 else 1
        if cache_dtype is None:
            lead = jax.tree.leaves(params)[0]
            cache_dtype = lead.dtype

        if step_fn is None and batch_step_fn is None:
            if cfg is None:
                raise ValueError("pass cfg for the default llama step")

            def step_fn(params, tok, cache):
                logits, cache = llama.forward(params, tok, cache, cfg)
                return logits[:, -1], cache

        if prefill_fn is None:
            prefill_fn = functools.partial(
                lambda params, ids, cache, cfg: llama.forward(
                    params, ids, cache, cfg), cfg=cfg)
        if cache_factory is None:
            def cache_factory(valid_from):
                return llama.make_cache(cfg, 1, self.max_len,
                                        dtype=cache_dtype,
                                        valid_from=valid_from)
        self._cache_factory = cache_factory
        self._ctx_template = context_template
        self._base_key = jax.random.PRNGKey(seed)
        self._next_id = 0
        self._pending: list[GenRequest] = []
        self._lane: list[GenRequest | None] = [None] * self.slots
        self.requests: dict[int, GenRequest] = {}
        self._state = self._init_state()

        sample = functools.partial(_sample_one, s=self.sampling)
        H = self.history_size
        penalty = self.sampling.repetition_penalty
        has_ctx = context_template is not None

        def step_key(req_seed, sample_idx):
            return jax.random.fold_in(
                jax.random.fold_in(self._base_key, req_seed), sample_idx)

        def row_step(params, cache, tok, ctx):
            if has_ctx:
                logits, cache = step_fn(params, tok[None, None], cache, ctx)
            else:
                logits, cache = step_fn(params, tok[None, None], cache)
            return logits[0], cache

        def one_step(params, state: _BatchState, _):
            # shape-polymorphic over the lane count: the same body traces
            # at [slots] for the full tick and at [b] for bucketed ticks
            old_offset = state.cache.offset
            valid = state.active  # this step's samples count iff live
            if batch_step_fn is not None:
                # lane-aware step (e.g. the M-lane monolithic Pallas
                # decoder, ops/pallas_fused_decoder.fused_stack_lanes):
                # takes the WHOLE stacked state so one kernel can share
                # its weight sweep across every live lane
                logits, cache = batch_step_fn(
                    params, state.cache, state.last, state.ctx)
            else:
                logits, cache = jax.vmap(
                    row_step, in_axes=(None, 0, 0, 0 if has_ctx else None))(
                    params, state.cache, state.last, state.ctx)
            logits = logits.astype(jnp.float32)
            if logits_hook is not None:
                logits = jax.vmap(logits_hook)(logits, state.n_new)
            if penalty != 1.0:
                hvalid = (
                    jax.lax.broadcasted_iota(jnp.int32, state.hist.shape, 1)
                    < jnp.minimum(state.hpos, H)[:, None])
                logits = apply_repetition_penalty(
                    logits, state.hist, hvalid, penalty)
            keys = jax.vmap(step_key)(state.seeds, state.n_new)
            idx = jax.vmap(sample)(logits, keys)
            rows = jnp.arange(state.hist.shape[0])
            slot_pos = state.hpos % H
            hist = state.hist.at[rows, slot_pos].set(
                jnp.where(state.active, idx, state.hist[rows, slot_pos]))
            toks = token_map(idx) if token_map is not None else idx
            toks = jnp.where(state.active, toks, state.last)
            # freeze idle lanes: their garbage KV write landed at the
            # (unattended) old offset; keep it unattended
            offset = jnp.where(state.active, old_offset + 1, old_offset)
            cache = cache._replace(offset=offset)
            n_new = state.n_new + state.active.astype(jnp.int32)
            hpos = state.hpos + state.active.astype(jnp.int32)
            active = (state.active
                      & (toks != self.stop_token)
                      & (n_new < state.max_new)
                      & (offset < self.max_len))
            return state._replace(cache=cache, last=toks, active=active,
                                  n_new=n_new, hist=hist, hpos=hpos), \
                (toks, valid)

        # params ride as a jit ARGUMENT (not a captured closure constant):
        # capturing a multi-GB tree as lowering constants bloats the
        # executable/compile cache and can pin a second copy of the
        # weights in HBM; as arguments they also stay swappable (e.g.
        # TP-resharded) without retracing through a stale closure.
        def _pack(toks, valid, active):
            """Fuse the tick's host-bound outputs into ONE int32 array
            [2K+1, lanes] — tokens, per-step validity, final active — so
            step() pays a single device->host sync per tick (on a
            tunneled TPU each separate fetch costs a full round-trip)."""
            return jnp.concatenate(
                [toks.astype(jnp.int32), valid.astype(jnp.int32),
                 active[None].astype(jnp.int32)], axis=0)

        @functools.partial(ajit, donate_argnums=(1,), static_argnums=(2,))
        def decode_step(params, state: _BatchState, k: int):
            """One tick = ``k`` scanned decode steps; returns the packed
            ``[2k+1, slots]`` outputs (tokens / per-step liveness / final
            active — a lane's token rows are garbage once it froze
            mid-tick)."""
            state, (toks, valid) = jax.lax.scan(
                functools.partial(one_step, params), state, None,
                length=k)
            return state, _pack(toks, valid, state.active)

        self._decode_step = decode_step

        # Bucketed lane graphs for the underload case: with n live lanes a
        # [slots]-wide tick burns slots/n times the decode compute. Gather
        # the live rows (padded with a free lane) into a power-of-two
        # bucket b >= n, scan the same one_step body at [b], and scatter
        # the rows back in place (the donated full state aliases the
        # untouched suffix). One compiled graph per bucket size; a lone
        # stream in a slots=8 server then decodes at ~1-lane cost.
        self._lane_buckets = tuple(
            b for b in (1, 2, 4, 8, 16, 32, 64) if b < self.slots
        ) + (self.slots,)

        @functools.partial(ajit, donate_argnums=(1,), static_argnums=(3,))
        def decode_step_bucket(params, state: _BatchState, lane_idx,
                               k: int):
            sub = jax.tree.map(lambda x: x[lane_idx], state)
            sub, (toks, valid) = jax.lax.scan(
                functools.partial(one_step, params), sub, None,
                length=k)
            new_state = jax.tree.map(
                lambda full, part: full.at[lane_idx].set(part), state, sub)
            return new_state, _pack(toks, valid, sub.active)

        self._decode_step_bucket = decode_step_bucket

        @ajit
        def prefill(params, tokens, valid_from, ctx):
            cache = self._cache_factory(0)
            cache = jax.tree.map(jnp.asarray, cache)
            cache = cache._replace(
                valid_from=jnp.asarray(valid_from, jnp.int32))
            if has_ctx:
                _, cache = prefill_fn(params, tokens[None], cache, ctx)
            else:
                _, cache = prefill_fn(params, tokens[None], cache)
            return cache

        self._prefill = prefill

        @functools.partial(ajit, donate_argnums=(0,),
                           static_argnums=(3,))
        def insert(state: _BatchState, row_cache, row_ctx, slot: int,
                   last_tok, max_new, req_seed):
            def put(stacked, row):
                row = jnp.asarray(row)
                return jax.lax.dynamic_update_slice(
                    stacked, row[None].astype(stacked.dtype),
                    (slot,) + (0,) * row.ndim)

            cache = jax.tree.map(put, state.cache, row_cache)
            ctx = (jax.tree.map(put, state.ctx, row_ctx)
                   if has_ctx else state.ctx)
            return state._replace(
                cache=cache, ctx=ctx,
                last=state.last.at[slot].set(last_tok),
                active=state.active.at[slot].set(
                    (max_new > 0) & (row_cache.offset < self.max_len)),
                n_new=state.n_new.at[slot].set(0),
                max_new=state.max_new.at[slot].set(max_new),
                seeds=state.seeds.at[slot].set(req_seed),
                hist=state.hist.at[slot].set(0),
                hpos=state.hpos.at[slot].set(0))

        self._insert = insert

    # -- state ---------------------------------------------------------

    def _init_state(self) -> _BatchState:
        row = jax.tree.map(jnp.asarray, self._cache_factory(0))

        def stack(x):
            return jnp.zeros((self.slots,) + x.shape, x.dtype)

        cache = jax.tree.map(stack, row)
        ctx = (jax.tree.map(stack, self._ctx_template)
               if self._ctx_template is not None else None)

        def zeros(*shape):
            # distinct buffers: donated states must not alias leaves
            return jnp.zeros(shape or (self.slots,), jnp.int32)

        return _BatchState(cache=cache, last=zeros(),
                           active=jnp.zeros((self.slots,), bool),
                           n_new=zeros(), max_new=zeros(), seeds=zeros(),
                           hist=zeros(self.slots, self.history_size),
                           hpos=zeros(), ctx=ctx)

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        big = self.buckets[-1]
        return ((n + big - 1) // big) * big

    # -- public API ----------------------------------------------------

    def submit(self, prompt, max_new: int, seed: int = 0,
               context=None) -> GenRequest:
        """Queue a request; it is admitted at the next :meth:`step` with a
        free lane. Returns the live :class:`GenRequest` (its ``tokens``
        list fills in as the engine runs). ``context`` is the request's
        conditioning pytree, required iff the engine was built with a
        ``context_template``."""
        prompt = np.asarray(prompt, np.int32).reshape(-1)
        if prompt.size == 0:
            raise ValueError("empty prompt")
        if max_new < 1:
            raise ValueError(f"max_new must be >= 1, got {max_new}")
        # canonicalize into int32 range BEFORE anything reaches a jitted
        # call: a client-supplied 2**33 seed must not raise OverflowError
        # inside _admit (which runs on the engine thread, where it would
        # kill the server loop, not the offending request). max_new is
        # capped by the cache anyway (one_step: offset < max_len).
        max_new = min(int(max_new), self.max_len)
        seed = int(seed) % (2 ** 31)
        if (context is None) != (self._ctx_template is None):
            raise ValueError(
                "context must be supplied exactly when the engine has a "
                "context_template")
        padded = self._bucket(prompt.size)
        if padded >= self.max_len:
            raise ValueError(
                f"prompt pads to {padded} >= max_len={self.max_len}")
        req = GenRequest(request_id=self._next_id, prompt=prompt,
                         max_new=int(max_new), seed=int(seed),
                         context=context)
        self._next_id += 1
        self._pending.append(req)
        self.requests[req.request_id] = req
        return req

    @property
    def idle(self) -> bool:
        return (not self._pending and self._inflight is None
                and all(r is None for r in self._lane))

    def _tick_k(self, live: int) -> int:
        """Scan length for a tick over ``live`` occupied lanes: enough
        steps that the tick decodes >= ``min_tick_tokens`` LIVE tokens
        total (filler lanes in a padded bucket produce nothing, so the
        guarantee must divide by the live count, not the bucket size),
        rounded up to a ``step_tokens`` multiple (keeps emission
        granularity aligned for frame-structured consumers, e.g. 7-token
        SNAC frames). Distinct live counts within one bucket add at most
        a couple of (bucket, k) graph variants, compiled lazily."""
        if self.min_tick_tokens is None:
            return self.step_tokens
        steps = -(-self.min_tick_tokens // max(1, live))    # ceil div
        return max(self.step_tokens,
                   -(-steps // self.step_tokens) * self.step_tokens)

    def release(self, request_id: int) -> None:
        """Forget a finished/cancelled request (long-running servers must
        release consumed requests or ``requests`` grows unboundedly)."""
        req = self.requests.get(request_id)
        if req is not None and req.done:
            del self.requests[request_id]

    def cancel(self, request_id: int) -> bool:
        """Abort a request: a pending one is dequeued; an in-flight one
        frees its lane at once (its device flag flips so the next tick
        spends nothing on it). Returns False for unknown/finished ids.
        Tokens already sampled stay on the request."""
        req = self.requests.get(request_id)
        if req is None or req.done:
            return False
        if req in self._pending:
            self._pending.remove(req)
        for slot, occupant in enumerate(self._lane):
            if occupant is req:
                self._state = self._state._replace(
                    active=self._state.active.at[slot].set(False))
                self._lane[slot] = None
        req.done = True
        if self._inflight is not None and all(r is None for r in self._lane):
            # the in-flight tick concerns only done/cancelled requests:
            # drop it unharvested (post-tick device state is current)
            self._inflight = None
        return True

    def _admit(self) -> None:
        """Prefill pending requests into free lanes. The prefill covers
        the padded prompt *minus its last token*; the first decode step
        feeds that token — identical to the offline chunked loop."""
        for slot in range(self.slots):
            if self._lane[slot] is not None or not self._pending:
                continue
            req = self._pending.pop(0)
            padded = self._bucket(req.prompt.size)
            pad = padded - req.prompt.size
            tokens = np.full((padded,), self.pad_token, np.int32)
            tokens[pad:] = req.prompt
            row_cache = self._prefill(self.params, jnp.asarray(tokens[:-1]),
                                      pad, req.context)
            self._state = self._insert(
                self._state, row_cache, req.context, slot,
                jnp.asarray(req.prompt[-1], jnp.int32), req.max_new,
                req.seed)
            req.context = None  # free host reference; rows live on device
            self._lane[slot] = req

    def _launch(self) -> _Tick:
        """Dispatch one decode tick (async — nothing syncs here)."""
        live = [s for s, r in enumerate(self._lane) if r is not None]
        reqs = [self._lane[s] for s in live]
        bucket = next(b for b in self._lane_buckets if b >= len(live))
        k = self._tick_k(len(live))
        if bucket < self.slots:
            free = next(s for s, r in enumerate(self._lane) if r is None)
            lane_idx = np.full((bucket,), free, np.int32)
            lane_idx[: len(live)] = live
            self._state, packed = self._decode_step_bucket(
                self.params, self._state, jnp.asarray(lane_idx), k)
            # column j of the [*, bucket] outputs belongs to slot live[j];
            # filler columns are the (inactive) free lane and never valid
            cols = list(range(len(live)))
        else:
            self._state, packed = self._decode_step(self.params,
                                                    self._state, k)
            cols = live
        return _Tick(packed, cols, live, reqs, k)

    def _harvest(self, tick: _Tick) -> list[tuple[int, int]]:
        """Fetch a launched tick's outputs and credit them to requests.
        Requests cancelled (``done``) between launch and harvest are
        skipped; a lane whose launch-time occupant already moved on (slot
        reused after cancel) is left untouched."""
        packed = np.asarray(tick.packed)      # ONE sync: [2K+1, bucket|slots]
        K = tick.k
        toks_host = packed[:K]
        valid_host = packed[K : 2 * K].astype(bool)
        active_host = packed[2 * K].astype(bool)
        emitted = []
        for k in range(K):
            for j, slot, req in zip(tick.cols, tick.live, tick.reqs):
                if req.done or not valid_host[k, j]:
                    continue
                tok = int(toks_host[k, j])
                if tok != self.stop_token:
                    req.tokens.append(tok)
                    emitted.append((req.request_id, tok))
        for j, slot, req in zip(tick.cols, tick.live, tick.reqs):
            if not active_host[j] and not req.done:
                req.done = True
                if self._lane[slot] is req:
                    self._lane[slot] = None
        return emitted

    def step(self) -> list[tuple[int, int]]:
        """Admit pending requests, then run ONE batched decode tick
        (``_tick_k(len(live))`` scanned steps). Returns the ``(request_id,
        token)`` pairs emitted in per-lane sample order — this tick's
        with ``pipeline=False``; the PREVIOUS tick's with
        ``pipeline=True`` (the new tick is dispatched before the old
        tick's device->host fetch, so the fetch rides the decode)."""
        self._admit()
        prev, self._inflight = self._inflight, None
        if any(r is not None for r in self._lane):
            tick = self._launch()
            if self.pipeline:
                self._inflight = tick
            else:
                emitted = self._harvest(prev) if prev is not None else []
                return emitted + self._harvest(tick)
        return self._harvest(prev) if prev is not None else []

    def run(self):
        """Generator draining the engine: yields ``(request_id, token)``
        until every submitted request is done."""
        while not self.idle:
            yield from self.step()


class ContinuousTTS:
    """Continuous-batching front end for Orpheus-family TTS serving.

    Wraps a loaded :class:`~tpu_audio.models.tts.llama_tts.LlamaTTS`
    (or VyvoTTS) model: text requests share the model trunk through a
    :class:`ContinuousBatcher` (band head, repetition penalty, and stop
    token all flow through the ``ar_loop`` contract), while each
    request's SNAC frames decode to waveform host-side as they
    accumulate — the multi-request analog of ``generate_stream``.

    >>> srv = ContinuousTTS(model, slots=4)
    >>> r = srv.submit("Hello there.", voice="tara")
    >>> for request_id, event in srv.run():
    ...     ...  # AudioGeneration token/audio events per request

    One sampling configuration per server instance (the sampling
    pipeline is baked into the jitted step); ``max_tokens``/``seed``
    stay per-request.
    """

    def __init__(self, model, *, slots: int = 4,
                 generation_parameters=None, seed: int = 0,
                 max_len: int | None = None,
                 prefill_buckets: tuple[int, ...] = (64, 128, 256, 512),
                 step_tokens: int = 7, pipeline: bool = True,
                 fused: str | bool = "auto"):
        from tpu_audio.core.generation import AudioGenerationError

        if model.tokenizer is None:
            raise AudioGenerationError("tokenizer not loaded")
        if model.codec is None:
            raise AudioGenerationError("SNAC codec not loaded")
        self.model = model
        p = generation_parameters or model.default_generation_parameters()
        self.gen_params = p
        if max_len is None:
            max_len = max(prefill_buckets) + p.max_tokens + 1
        sampling = SamplingParams(
            temperature=p.temperature, top_p=p.top_p, top_k=p.top_k,
            repetition_penalty=p.repetition_penalty,
            repetition_context_size=p.repetition_context_size)
        # M-lane fused tick (w8a8 checkpoints on TPU, or interpret mode
        # under test): one Pallas kernel decodes every live lane per
        # step, sharing the HBM weight sweep — see llama_tts.
        # _fused_lane_hooks. Falls back to the vmapped XLA tick when
        # unsupported (dims, dtype, VMEM cap, slots > 8).
        hooks = (model._fused_lane_hooks(max_len)
                 if coerce_fused_flag(fused) and slots <= 8
                 and hasattr(model, "_fused_lane_hooks") else None)
        self.fused = hooks is not None
        engine_kw = hooks if self.fused else dict(
            params=model.params,
            step_fn=model._step_fn,
            prefill_fn=model._prefill_fn,
            cache_factory=lambda valid_from: llama.make_cache(
                model.config, 1, max_len, dtype=model.dtype,
                valid_from=valid_from))
        self.engine = ContinuousBatcher(
            engine_kw.pop("params"), model.config, slots=slots,
            max_len=max_len,
            stop_token=model.tokens.end_of_speech, sampling=sampling,
            prefill_buckets=prefill_buckets, seed=seed,
            cache_dtype=model.dtype,
            **engine_kw,
            token_map=model._token_map,
            pad_token=model.tokens.pad_token,
            # one SNAC code group per tick: frame-aligned emission with
            # the dispatch overhead amortized 7x (tokens are K-invariant);
            # pipelined ticks overlap the token fetch with the next
            # tick's decode (costs one tick of emission latency)
            step_tokens=step_tokens, pipeline=pipeline)
        ccfg = getattr(model.codec, "config", None)
        samples_per_group = 4 * (ccfg.hop_length if ccfg else 512)
        self._spg = samples_per_group
        self.chunk_tokens = 7 * max(
            1, int(p.streaming_interval * model.sample_rate
                   / samples_per_group))
        # bounded SNAC decode window: long requests decode only the
        # last ~decode_window_s of frames per flush (O(1) per flush
        # instead of O(total), which would stall every lane's tick as
        # any one request grows). The window start aligns to the
        # decoder's local-attention blocks (block-local attention is
        # then EXACT for the suffix) and the ~7 s of overlap context
        # absorbs conv edge transients; below the threshold the decode
        # covers the full prefix, identical to solo generate_stream.
        decode_window_s = 8.0
        strides = getattr(ccfg, "vq_strides", None) or [4, 2, 1]
        latent_per_group = strides[0]
        attn = getattr(ccfg, "attn_window_size", None)
        self._align_groups = max(1, (attn or 1) // latent_per_group)
        chunk_groups = self.chunk_tokens // 7
        self.decode_window_groups = max(
            2 * chunk_groups + self._align_groups,
            int(decode_window_s * model.sample_rate / samples_per_group))
        self._meta: dict[int, dict] = {}

    def submit(self, text: str, voice: str | None = None,
               ref_audio=None, ref_text: str | None = None,
               max_tokens: int | None = None, seed: int = 0) -> GenRequest:
        prompt = self.model.prepare_input_ids(text, voice, ref_audio,
                                              ref_text)
        req = self.engine.submit(
            np.asarray(prompt, np.int32),
            max_new=max_tokens or self.gen_params.max_tokens, seed=seed)
        self._meta[req.request_id] = {
            "prompt": list(prompt), "decoded_samples": 0, "last_decode": 0}
        return req

    def _audio_delta(self, req: GenRequest) -> np.ndarray | None:
        """Decode the request's pending frames (bounded suffix window,
        see ``decode_window_groups``); return new samples."""
        meta = self._meta[req.request_id]
        code_list = self.model.parse_output(meta["prompt"] + req.tokens)
        n_groups = len(code_list) // 7
        if n_groups < 1:
            return None
        start = 0
        if n_groups > self.decode_window_groups:
            start = n_groups - self.decode_window_groups
            # the window must still cover everything not yet emitted
            start = min(start, meta["decoded_samples"] // self._spg)
            start -= start % self._align_groups
        from tpu_audio.models.tts.llama_tts import ungroup_codes

        l1, l2, l3 = ungroup_codes(code_list[start * 7: n_groups * 7],
                                   self.model.tokens.codebook_size)
        wav = np.asarray(self.model.codec.decode([
            np.asarray([l1], np.int32), np.asarray([l2], np.int32),
            np.asarray([l3], np.int32)]))[0]
        emitted_in_window = meta["decoded_samples"] - start * self._spg
        if wav.shape[0] <= emitted_in_window:
            return None
        delta = wav[emitted_in_window:]
        meta["decoded_samples"] = start * self._spg + wav.shape[0]
        return delta

    def step(self):
        """One engine tick. Returns ``(request_id, AudioGeneration)``
        events: a token event per sampled token plus an audio event per
        request whose pending frames crossed the streaming interval."""
        from tpu_audio.core.generation import AudioGeneration

        events = []
        for rid, tok in self.engine.step():
            events.append((rid, AudioGeneration.from_token(tok)))
        for rid, meta in list(self._meta.items()):
            req = self.engine.requests[rid]
            fresh = len(req.tokens) - meta["last_decode"]
            if req.done or fresh >= self.chunk_tokens:
                meta["last_decode"] = len(req.tokens)
                delta = self._audio_delta(req)
                if delta is not None:
                    events.append((rid, AudioGeneration.from_audio(delta)))
                if req.done:
                    del self._meta[rid]
        return events

    def is_finished(self, request_id: int) -> bool:
        """True once the request's tokens are done AND its audio has been
        flushed (i.e. no further events will arrive for it)."""
        req = self.engine.requests.get(request_id)
        return req is not None and req.done and request_id not in self._meta

    def cancel(self, request_id: int) -> bool:
        """Abort a request (e.g. the client hung up): frees its decode
        lane and drops its un-flushed audio."""
        out = self.engine.cancel(request_id)
        self._meta.pop(request_id, None)
        return out

    @property
    def idle(self) -> bool:
        return self.engine.idle and not self._meta

    def run(self):
        """Generator draining the server: yields ``(request_id, event)``
        until every submitted request has finished (audio flushed)."""
        while not self.idle:
            yield from self.step()


class EngineWorkerBase:
    """Owns a slot engine on a dedicated thread; callers on any thread
    hand work in through an inbox and block only on their own queue.

    The engine is single-threaded by design (one device, one jitted
    step). Subclasses provide the engine-specific pieces: ``_idle``,
    ``_handle(item)`` (admit one inbox item), ``_service()`` (one engine
    tick + result delivery) and ``_fail_item`` (route a drained item's
    failure to its caller).

    Thread-death safety: ``_enqueue`` atomically checks ``_closing``
    under ``_lock`` against the death handler's drain, so an item either
    lands before the drain (and gets the failure) or the caller raises —
    a dying engine can never strand a caller on an unserviced queue.
    """

    _thread_name = "engine"

    def __init__(self):
        import queue as _queue
        import threading as _threading

        self._queue_mod = _queue
        self._inbox: _queue.Queue = _queue.Queue()
        self._out: dict[int, _queue.Queue] = {}
        self._closing = False
        self._lock = _threading.Lock()
        self._thread = _threading.Thread(target=self._loop, daemon=True,
                                         name=self._thread_name)
        self._thread.start()

    def _enqueue(self, item) -> None:
        with self._lock:
            if self._closing:
                raise RuntimeError("worker is closed")
            self._inbox.put(item)

    def close(self) -> None:
        """Drain in-flight requests, then stop the engine thread."""
        with self._lock:
            self._closing = True
            self._inbox.put(None)
        self._thread.join()

    def _loop(self) -> None:
        try:
            self._run_loop()
        except BaseException as e:  # noqa: BLE001 — engine died: unblock
            # every waiting caller gets the failure instead of hanging
            # forever on its queue; subsequent submissions raise
            failure = RuntimeError(
                f"{self._thread_name} thread died: {e!r}")
            with self._lock:
                self._closing = True
                for q in self._out.values():
                    q.put(failure)
                self._out.clear()
                while not self._inbox.empty():
                    item = self._inbox.get_nowait()
                    if item is not None:
                        self._fail_item(item, failure)

    def _fail_item(self, item, failure: Exception) -> None:
        item[-1].put(failure)

    def _run_loop(self) -> None:
        stop = False
        while not (stop and self._idle and self._inbox.empty()):
            # drain submissions; block only when the engine has no work
            block = self._idle and not stop
            while True:
                try:
                    item = self._inbox.get(block=block, timeout=None)
                except self._queue_mod.Empty:
                    break
                block = False
                if item is None:
                    stop = True
                    continue
                self._handle(item)
                if self._inbox.empty():
                    break
            self._service()

    # -- subclass hooks --------------------------------------------------

    @property
    def _idle(self) -> bool:
        raise NotImplementedError

    def _handle(self, item) -> None:
        raise NotImplementedError

    def _service(self) -> None:
        raise NotImplementedError

    def _admit(self, submit, outq) -> None:
        """Run one engine ``submit`` thunk, registering its out-queue;
        rejections flow to the caller, and even a thread-killing failure
        mid-submit still unblocks them before propagating."""
        try:
            req = submit()
            self._out[req.request_id] = outq
        except Exception as e:  # noqa: BLE001 — caller re-raises
            outq.put(e)
        except BaseException as e:
            outq.put(RuntimeError(
                f"{self._thread_name} thread died: {e!r}"))
            raise


class TTSEngineWorker(EngineWorkerBase):
    """Thread multiplexing concurrent callers onto one ContinuousTTS:

    >>> worker = TTSEngineWorker(model, slots=4)
    >>> for event in worker.synthesize("hello"):   # any thread
    ...     ...                     # AudioGeneration token/audio events

    Requests admit as lanes free up; callers block only on their own
    queue. ``close()`` stops the thread after in-flight work drains.
    """

    _thread_name = "tts-engine"

    def __init__(self, model, *, slots: int = 4,
                 generation_parameters=None, seed: int = 0, **kw):
        self._srv = ContinuousTTS(
            model, slots=slots,
            generation_parameters=generation_parameters, seed=seed, **kw)
        super().__init__()

    def synthesize(self, text: str, voice: str | None = None,
                   ref_audio=None, ref_text: str | None = None,
                   max_tokens: int | None = None, seed: int = 0):
        """Submit a request; yields its AudioGeneration events (token +
        audio) as the shared engine produces them. Raises here if the
        engine rejected the request (e.g. prompt too long). Closing the
        generator early (client hang-up) cancels the request and frees
        its decode lane."""
        outq = self._queue_mod.Queue()
        self._enqueue(("submit",
                       (text, voice, ref_audio, ref_text, max_tokens,
                        seed), outq))
        finished = False
        try:
            while True:
                ev = outq.get()
                if ev is None:
                    finished = True
                    return
                if isinstance(ev, Exception):
                    finished = True
                    raise ev
                yield ev
        finally:
            if not finished:
                try:
                    self._enqueue(("cancel", None, outq))
                except RuntimeError:
                    pass  # worker already closed/dead: nothing to cancel

    def _fail_item(self, item, failure: Exception) -> None:
        if item[0] == "submit":
            item[2].put(failure)

    @property
    def _idle(self) -> bool:
        return self._srv.idle

    def _handle(self, item) -> None:
        kind, payload, outq = item
        if kind == "cancel":
            # FIFO inbox: the submit for this outq (if any) was
            # already processed, so the reverse lookup is exact
            for rid, q in list(self._out.items()):
                if q is outq:
                    self._srv.cancel(rid)
                    self._srv.engine.release(rid)
                    del self._out[rid]
            return
        text, voice, ref_audio, ref_text, max_tokens, seed = payload
        self._admit(lambda: self._srv.submit(text, voice, ref_audio,
                                             ref_text, max_tokens, seed),
                    outq)

    def _service(self) -> None:
        for rid, ev in self._srv.step():
            if rid in self._out:
                self._out[rid].put(ev)
        for rid in [r for r in self._out if self._srv.is_finished(r)]:
            self._out.pop(rid).put(None)
            self._srv.engine.release(rid)
