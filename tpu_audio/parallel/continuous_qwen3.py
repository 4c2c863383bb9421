"""Continuous batching for Qwen3TTS — slot-based serving of the talker +
code-predictor + streaming-codec pipeline.

Extends the ContinuousBatcher design (parallel/continuous.py) beyond the
llama token contract: Qwen3TTS decodes *embeddings* (per-step input =
trailing text embedding + the previous frame's summed codec embeddings)
and each macro step emits a [G]-codebook frame via the talker + an inner
code-predictor sub-loop (Qwen3TTS.swift:838-897, tts/qwen3_tts.py
``_build_macro_body``). The engine:

- vmaps the model's EXACT solo macro-step body over slot lanes, so a
  request's sampled codes are bit-identical to ``generate_stream`` —
  each lane carries its own rng chain seeded at ``PRNGKey(seed)``, its
  own repetition history, trailing-embed cursor, and KV-cache row.
- keeps every tick ONE jitted graph of static shape; idle lanes run
  masked garbage with frozen cache offsets (ContinuousBatcher's lane
  discipline), and an underloaded server gathers the live lanes into a
  power-of-two bucket so a lone stream pays ~1-lane compute.
- decodes audio host-side per request through the streaming codec with a
  PER-REQUEST stream-state pytree (conv carries, overlap tails, KV), the
  multi-request analog of the solo loop's ``codec.streaming_step``.

Prompts left-pad into prefill buckets with ``valid_from`` masking —
positions shift but rope is relative under the causal mask, so valid
logits are unchanged (same property the llama batcher pins in tests).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import kv_cache
from tpu_audio.core.jitting import ajit
from tpu_audio.parallel.continuous import EngineWorkerBase

__all__ = ["ContinuousQwen3TTS", "Qwen3TTSEngineWorker",
           "Qwen3TTSRequest"]


@dataclasses.dataclass
class Qwen3TTSRequest:
    """One submitted synthesis request and its accumulated frames."""

    request_id: int
    max_new: int
    seed: int = 0
    codes: list = dataclasses.field(default_factory=list)  # [G] rows
    done: bool = False


class _Q3State(NamedTuple):
    cache: object            # talker KV rows, stacked [slots, ...]
    embeds: jnp.ndarray      # [slots, 1, 1, D] next macro-step input
    rng: jnp.ndarray         # [slots, 2] per-lane PRNG keys
    history: jnp.ndarray     # [slots, 1, R] repetition history (c0 space)
    hpos: jnp.ndarray        # [slots] int32 samples so far (== n_new)
    max_new: jnp.ndarray     # [slots] int32
    active: jnp.ndarray      # [slots] bool
    trailing: jnp.ndarray    # [slots, T_trail, D] per-request text embeds
    trailing_len: jnp.ndarray  # [slots] int32
    tts_pad: jnp.ndarray     # [slots, D]


class ContinuousQwen3TTS:
    """Slot-based continuous batching for a loaded Qwen3TTS model.

    >>> srv = ContinuousQwen3TTS(model, slots=4)
    >>> r = srv.submit("Hello there.", voice="vivian")
    >>> for request_id, wav in srv.run():
    ...     ...  # np.float32 audio chunks per request as frames decode

    One sampling configuration per server (baked into the jitted tick);
    ``seed`` stays per-request and a request's codes/audio are
    bit-identical to solo ``generate_stream`` regardless of batch
    composition.
    """

    def __init__(self, model, *, slots: int = 4,
                 generation_parameters=None,
                 prefill_buckets: tuple[int, ...] = (64, 128, 256),
                 max_trailing: int = 256,
                 max_new_cap: int = 1024,
                 pipeline: bool = True):
        from tpu_audio.core.generation import AudioGenerationError

        if model.tokenizer is None:
            raise AudioGenerationError("tokenizer not loaded")
        if model.codec is None:
            raise AudioGenerationError("codec decoder not loaded")
        self.model = model
        self.slots = int(slots)
        p = generation_parameters or model.default_generation_parameters()
        self.gen_params = p
        self.buckets = tuple(sorted(prefill_buckets))
        self.max_trailing = int(max_trailing)
        self.max_new_cap = int(max_new_cap)
        tcfg = model.config.talker
        self._tcfg = tcfg
        self._dim = tcfg.hidden_size
        self._eos = tcfg.codec_eos_token_id
        self._R = max(p.repetition_context_size, 1)
        self.max_len = self.buckets[-1] + self.max_new_cap + 2
        self.chunk_frames = max(
            1, int(p.streaming_interval * 12.5))  # CODEC_TOKEN_RATE_HZ

        # suppress vector: only codec codes + EOS are sampleable
        # (qwen3_tts._run_iter)
        suppress = np.zeros((tcfg.vocab_size,), np.float32)
        suppress[tcfg.vocab_size - 1024:] = -1e9
        suppress[self._eos] = 0.0

        body = model._build_macro_body(p)
        eos = self._eos
        R = self._R
        n_slots = self.slots
        t_trail = self.max_trailing
        max_len = self.max_len

        def lane(params, embeds, cache, rng, history, hpos):
            return body(params, embeds, cache, rng, jnp.asarray(suppress),
                        history, hpos)

        def tick_body(params, state: _Q3State):
            rows = jnp.arange(state.hpos.shape[0])
            old_offset = state.cache.offset
            codes, embed_sum, cache, rng = jax.vmap(
                lane, in_axes=(None, 0, 0, 0, 0, 0))(
                params, state.embeds, cache_in(state), state.rng,
                state.history, state.hpos)
            c0 = codes[:, 0, 0]
            emit = state.active & (c0 != eos)
            # history records only emitted c0 (solo loop order)
            pos = state.hpos % R
            hist = state.history.at[rows, 0, pos].set(
                jnp.where(emit, c0, state.history[rows, 0, pos]))
            # next input: trailing[step] (or tts_pad past the text) + the
            # frame's summed codec embeddings — solo's
            # ``text_embed + embed_sum``
            step_idx = state.hpos  # pre-increment == solo loop index
            te = state.trailing[rows, jnp.clip(step_idx, 0, t_trail - 1)]
            text_embed = jnp.where(
                (step_idx < state.trailing_len)[:, None], te, state.tts_pad)
            new_embeds = text_embed[:, None, None, :] + embed_sum
            embeds = jnp.where(emit[:, None, None, None], new_embeds,
                               state.embeds)
            hpos = state.hpos + emit.astype(jnp.int32)
            # freeze non-emitting lanes' cache offsets (their garbage KV
            # write stays unattended)
            offset = jnp.where(emit, cache.offset, old_offset)
            cache = cache._replace(offset=offset)
            active = (emit & (hpos < state.max_new)
                      & (offset < max_len))
            # pack codes/emit/active into one int32 [G+2, lanes] download
            # so step() pays a single device->host sync per tick
            packed = jnp.concatenate(
                [codes[:, 0, :].T.astype(jnp.int32),   # [G, lanes]
                 emit[None].astype(jnp.int32),
                 active[None].astype(jnp.int32)], axis=0)
            return state._replace(
                cache=cache, embeds=embeds, rng=rng, history=hist,
                hpos=hpos, active=active), packed

        def cache_in(state):
            return state.cache

        @functools.partial(ajit, donate_argnums=(1,))
        def tick(params, state: _Q3State):
            return tick_body(params, state)

        self._tick = tick

        # bucketed underload ticks: gather live lanes (+ a free-lane
        # filler) into a power-of-two sub-state, run the same body, and
        # scatter back in place (see ContinuousBatcher._decode_step_bucket)
        @functools.partial(ajit, donate_argnums=(1,))
        def tick_bucket(params, state: _Q3State, lane_idx):
            sub = jax.tree.map(lambda x: x[lane_idx], state)
            sub, packed = tick_body(params, sub)
            new_state = jax.tree.map(
                lambda full, part: full.at[lane_idx].set(part), state, sub)
            return new_state, packed

        self._tick_bucket = tick_bucket
        self._lane_buckets = tuple(
            b for b in (1, 2, 4, 8, 16, 32) if b < n_slots) + (n_slots,)

        @ajit
        def prefill(params, embeds, valid_from):
            cache = kv_cache.init_cache(
                tcfg.num_hidden_layers, 1, tcfg.num_key_value_heads,
                tcfg.head_dim, max_len, embeds.dtype)
            cache = cache._replace(
                valid_from=jnp.asarray(valid_from, jnp.int32))
            from tpu_audio.models.tts.qwen3_tts import talker_forward

            _, _, cache = talker_forward(params, embeds[None], cache, tcfg)
            return cache

        self._prefill = prefill

        @functools.partial(ajit, donate_argnums=(0,), static_argnums=(5,))
        def insert(state: _Q3State, row_cache, first_embed, trailing,
                   tts_pad, slot: int, trailing_len, max_new, seed):
            def put(stacked, row):
                return jax.lax.dynamic_update_slice(
                    stacked, jnp.asarray(row)[None].astype(stacked.dtype),
                    (slot,) + (0,) * jnp.asarray(row).ndim)

            cache = jax.tree.map(put, state.cache, row_cache)
            return state._replace(
                cache=cache,
                embeds=state.embeds.at[slot].set(
                    first_embed.astype(state.embeds.dtype)),
                rng=state.rng.at[slot].set(jax.random.PRNGKey(seed)),
                history=state.history.at[slot].set(0),
                hpos=state.hpos.at[slot].set(0),
                max_new=state.max_new.at[slot].set(max_new),
                active=state.active.at[slot].set(max_new > 0),
                trailing=state.trailing.at[slot].set(
                    trailing.astype(state.trailing.dtype)),
                trailing_len=state.trailing_len.at[slot].set(trailing_len),
                tts_pad=state.tts_pad.at[slot].set(
                    tts_pad.astype(state.tts_pad.dtype)))

        self._insert = insert

        self._next_id = 0
        self._pending: list[tuple] = []
        self._lane: list[Qwen3TTSRequest | None] = [None] * self.slots
        self.requests: dict[int, Qwen3TTSRequest] = {}
        self._meta: dict[int, dict] = {}
        self._state = self._init_state()
        # pipelined ticks: launch tick N+1 before fetching tick N's packed
        # outputs so the tunneled device->host fetch overlaps decode (see
        # ContinuousBatcher.pipeline); one tick of emission latency
        self.pipeline = bool(pipeline)
        self._inflight = None

    # -- state ----------------------------------------------------------

    def _init_state(self) -> _Q3State:
        tcfg = self._tcfg
        dtype = self.model.dtype
        row = kv_cache.init_cache(
            tcfg.num_hidden_layers, 1, tcfg.num_key_value_heads,
            tcfg.head_dim, self.max_len, dtype)

        def stack(x):
            return jnp.zeros((self.slots,) + x.shape, x.dtype)

        D = self._dim
        return _Q3State(
            cache=jax.tree.map(stack, jax.tree.map(jnp.asarray, row)),
            embeds=jnp.zeros((self.slots, 1, 1, D), dtype),
            rng=jnp.stack([jax.random.PRNGKey(0)] * self.slots),
            history=jnp.zeros((self.slots, 1, self._R), jnp.int32),
            hpos=jnp.zeros((self.slots,), jnp.int32),
            max_new=jnp.zeros((self.slots,), jnp.int32),
            active=jnp.zeros((self.slots,), bool),
            trailing=jnp.zeros((self.slots, self.max_trailing, D), dtype),
            trailing_len=jnp.zeros((self.slots,), jnp.int32),
            tts_pad=jnp.zeros((self.slots, D), dtype))

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        big = self.buckets[-1]
        return ((n + big - 1) // big) * big

    # -- public API -------------------------------------------------------

    def submit(self, text: str, voice: str | None = None,
               language: str | None = None, instruct: str | None = None,
               max_tokens: int | None = None, seed: int = 0
               ) -> Qwen3TTSRequest:
        """Queue a synthesis request (CustomVoice path: speaker + optional
        instruct, qwen3_tts.prepare_generation_inputs)."""
        m = self.model
        speaker, parsed_instr = m._parse_voice(voice)
        language = language or "auto"
        instruct = instruct or parsed_instr
        input_embeds, trailing, tts_pad = m.prepare_generation_inputs(
            text, language, instruct, speaker)
        target_tokens = len(m.tokenizer.encode(text).ids)
        p = self.gen_params
        max_new = min(max_tokens or p.max_tokens,
                      max(75, target_tokens * 6), self.max_new_cap)
        if trailing.shape[1] > self.max_trailing:
            raise ValueError(
                f"trailing text embeds ({trailing.shape[1]}) exceed "
                f"max_trailing={self.max_trailing}")
        req = Qwen3TTSRequest(request_id=self._next_id, max_new=int(max_new),
                              seed=int(seed) % (2 ** 31))
        self._next_id += 1
        self.requests[req.request_id] = req
        ccfg = self.model.codec.config
        from tpu_audio.codecs.qwen3_codec import init_streaming_state

        self._meta[req.request_id] = {
            "codec_state": init_streaming_state(
                ccfg, 1, dtype=self.model.codec.dtype),
            "decoded": 0,
        }
        self._pending.append((req, np.asarray(input_embeds[0]),
                              np.asarray(trailing[0]),
                              np.asarray(tts_pad[0, 0])))
        return req

    @property
    def idle(self) -> bool:
        return (not self._pending and self._inflight is None
                and all(r is None for r in self._lane))

    def is_finished(self, request_id: int) -> bool:
        req = self.requests.get(request_id)
        return req is not None and req.done

    def release(self, request_id: int) -> None:
        """Forget a finished/cancelled request (long-running servers must
        release consumed requests or ``requests`` grows unboundedly)."""
        req = self.requests.get(request_id)
        if req is not None and req.done:
            del self.requests[request_id]
            self._meta.pop(request_id, None)

    def cancel(self, request_id: int) -> bool:
        req = self.requests.get(request_id)
        if req is None or req.done:
            return False
        self._pending = [p for p in self._pending if p[0] is not req]
        for slot, occ in enumerate(self._lane):
            if occ is req:
                self._state = self._state._replace(
                    active=self._state.active.at[slot].set(False))
                self._lane[slot] = None
        req.done = True
        self._meta.pop(request_id, None)
        if self._inflight is not None and all(r is None for r in self._lane):
            # every request the in-flight tick concerns is done/cancelled:
            # drop it unharvested (the post-tick device state is already
            # current; frozen lanes wrote nothing attended)
            self._inflight = None
        return True

    def _admit(self) -> None:
        for slot in range(self.slots):
            if self._lane[slot] is not None or not self._pending:
                continue
            req, input_embeds, trailing, tts_pad = self._pending.pop(0)
            t = input_embeds.shape[0]
            padded = self._bucket(t)
            pad = padded - t
            buf = np.zeros((padded, input_embeds.shape[1]),
                           input_embeds.dtype)
            buf[pad:] = input_embeds
            row_cache = self._prefill(self.model.params,
                                      jnp.asarray(buf[:-1]), pad)
            trail_buf = np.zeros((self.max_trailing, trailing.shape[1]),
                                 trailing.dtype)
            trail_buf[: trailing.shape[0]] = trailing
            self._state = self._insert(
                self._state, row_cache,
                jnp.asarray(input_embeds[-1:])[None],  # [1, 1, D]
                jnp.asarray(trail_buf), jnp.asarray(tts_pad), slot,
                trailing.shape[0], req.max_new, req.seed)
            self._lane[slot] = req

    def _audio_delta(self, req: Qwen3TTSRequest, flush: bool = False):
        """Stream pending frames through the request's codec state when a
        chunk is ready (solo loop's streaming_step cadence)."""
        meta = self._meta.get(req.request_id)
        if meta is None:
            return None
        pending = len(req.codes) - meta["decoded"]
        if pending < 1 or (pending < self.chunk_frames and not flush):
            return None
        chunk = np.stack(req.codes[meta["decoded"]:], axis=1)[None]
        codec = self.model.codec
        wav, meta["codec_state"] = codec._step(
            codec.params, jnp.asarray(chunk), meta["codec_state"])
        meta["decoded"] = len(req.codes)
        return np.asarray(wav)[0]

    def _launch(self):
        """Dispatch one macro tick (async — nothing syncs here)."""
        live = [s for s, r in enumerate(self._lane) if r is not None]
        reqs = [self._lane[s] for s in live]
        bucket = next(b for b in self._lane_buckets if b >= len(live))
        if bucket < self.slots:
            free = next(s for s, r in enumerate(self._lane) if r is None)
            lane_idx = np.full((bucket,), free, np.int32)
            lane_idx[: len(live)] = live
            self._state, packed = self._tick_bucket(
                self.model.params, self._state, jnp.asarray(lane_idx))
            cols = list(range(len(live)))
        else:
            self._state, packed = self._tick(self.model.params, self._state)
            cols = live
        return (packed, cols, live, reqs)

    def _harvest(self, tick):
        packed, cols, live, reqs = tick
        packed = np.asarray(packed)           # ONE sync: [G+2, bucket|slots]
        codes_host = packed[:-2].T            # [lanes, G]
        emit_host = packed[-2].astype(bool)
        active_host = packed[-1].astype(bool)
        events = []
        for j, slot, req in zip(cols, live, reqs):
            if req.done:                      # cancelled while in flight
                continue
            if emit_host[j]:
                req.codes.append(codes_host[j])
            finished = not active_host[j]
            wav = self._audio_delta(req, flush=finished)
            if wav is not None and len(wav):
                events.append((req.request_id, wav))
            if finished:
                req.done = True
                if self._lane[slot] is req:
                    self._lane[slot] = None
                self._meta.pop(req.request_id, None)
        return events

    def step(self):
        """Admit + one batched macro tick. Returns ``(request_id, wav)``
        audio-chunk events (np.float32 arrays) — this tick's with
        ``pipeline=False``, the previous tick's with ``pipeline=True``
        (the new tick dispatches before the old tick's device->host
        fetch, so the fetch rides the decode compute)."""
        self._admit()
        prev, self._inflight = self._inflight, None
        if any(r is not None for r in self._lane):
            tick = self._launch()
            if self.pipeline:
                self._inflight = tick
            else:
                events = self._harvest(prev) if prev is not None else []
                return events + self._harvest(tick)
        return self._harvest(prev) if prev is not None else []

    def run(self):
        """Drain the engine, yielding ``(request_id, wav)`` chunks until
        every submitted request finishes."""
        while not self.idle:
            yield from self.step()


class Qwen3TTSEngineWorker(EngineWorkerBase):
    """Thread multiplexing concurrent callers onto one ContinuousQwen3TTS
    (the Qwen3 counterpart of continuous.TTSEngineWorker; same
    EngineWorkerBase loop and synthesize contract — events are
    AudioGeneration audio chunks)."""

    _thread_name = "qwen3tts-engine"

    def __init__(self, model, *, slots: int = 4,
                 generation_parameters=None, **kw):
        self._srv = ContinuousQwen3TTS(
            model, slots=slots,
            generation_parameters=generation_parameters, **kw)
        super().__init__()

    def synthesize(self, text: str, voice: str | None = None,
                   ref_audio=None, ref_text: str | None = None,
                   max_tokens: int | None = None, seed: int = 0):
        """Submit a request; yields AudioGeneration audio events as the
        shared engine streams them. Ref-audio cloning is a solo-path
        feature (per-request ICL prefixes don't share the batched
        graph)."""
        if ref_audio is not None or ref_text:
            raise ValueError(
                "qwen3 continuous batching serves CustomVoice requests; "
                "use the solo endpoint for ref-audio cloning")
        outq = self._queue_mod.Queue()
        self._enqueue(("submit", (text, voice, max_tokens, seed), outq))
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
                    pass

    def _fail_item(self, item, failure: Exception) -> None:
        if item[0] == "submit":
            item[2].put(failure)

    @property
    def _idle(self) -> bool:
        return self._srv.idle

    def _handle(self, item) -> None:
        kind, payload, outq = item
        if kind == "cancel":
            for rid, q in list(self._out.items()):
                if q is outq:
                    self._srv.cancel(rid)
                    self._srv.release(rid)
                    del self._out[rid]
            return
        text, voice, max_tokens, seed = payload
        self._admit(lambda: self._srv.submit(
            text, voice=voice, max_tokens=max_tokens, seed=seed), outq)

    def _service(self) -> None:
        from tpu_audio.core.generation import AudioGeneration

        for rid, wav in self._srv.step():
            if rid in self._out:
                self._out[rid].put(AudioGeneration.from_audio(wav))
        for rid in [r for r in self._out if self._srv.is_finished(r)]:
            self._out.pop(rid).put(None)
            self._srv.release(rid)
