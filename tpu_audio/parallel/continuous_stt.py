"""Continuous batching for Whisper transcription serving.

New TPU-native surface (the reference is a single-request SDK,
SURVEY.md §2.0): concurrent transcription requests share ONE jitted
``[slots]``-lane decode tick through :class:`ContinuousBatcher`'s
per-request-context extension — each lane carries its own precomputed
cross-attention K/V (the whisper conditioning, whisper.py:_cross_kv)
stacked on the slot axis exactly like the KV cache, while whisper's
suppression rules ride the engine's ``logits_hook`` (begin-suppression
fires where a lane's ``n_new == 0``).

Design notes vs the offline loop (stt/whisper.py:_decode_loop):

- Whisper's learned decoder positions are NOT shift-invariant, so lanes
  must not be left-padded: prompts from ``build_prompt_tokens`` have a
  fixed per-model length (4 multilingual / 2 English-only), which IS the
  single prefill bucket — pad is always zero and positions match the
  solo decode exactly (greedy tokens are bit-identical, tested).
- Encode (30 s mel + encoder) runs per-request at submit time — it is
  one big MXU-bound dispatch that does not benefit from lane packing —
  and only the decode loop (HBM-bound on decoder weights, the part that
  scales with requested tokens) is continuously batched.
- One language/task PER REQUEST (prompt content varies, length does
  not); sampling configuration is per engine instance.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import kv_cache, nn
from tpu_audio.core.generation import STTOutput, STTSegment
from tpu_audio.core.sampling import SamplingParams
from tpu_audio.models.stt import whisper as W
from tpu_audio.parallel.continuous import (ContinuousBatcher,
                                           EngineWorkerBase, GenRequest)

__all__ = ["ContinuousSTT", "ContinuousQwen3ASR", "STTEngineWorker"]


# whisper lane cache rows use the engines' shared fused-lane contract
# (k/v are [L, s_max, d] bf16 position-major; valid_from is always 0 —
# whisper prompts have one fixed length and are never left-padded)
_FusedLaneRow = kv_cache.FusedLaneRow


@dataclasses.dataclass
class _Meta:
    audio_seconds: float
    t_submit: float


class ContinuousSTT:
    """Slot-based continuous transcription over a loaded Whisper model.

    >>> srv = ContinuousSTT(model, slots=4)
    >>> r = srv.submit(audio, language="en")
    >>> srv.drain()
    >>> srv.result(r.request_id).text

    ``submit`` accepts one <=30 s chunk per request (shorter audio is
    padded like the offline path; long-form chunking composes on top).
    """

    def __init__(self, model: "W.Whisper", *, slots: int = 4,
                 max_tokens: int = 224, step_tokens: int = 8,
                 temperature: float = 0.0, seed: int = 0,
                 min_tick_tokens: int | None = None,
                 pipeline: bool = True, fused: str | bool = "auto"):
        from tpu_audio.core.generation import AudioGenerationError

        if model.tokenizer is None:
            raise AudioGenerationError("tokenizer not loaded")
        self.model = model
        cfg = model.config
        tok = model.tokenizer
        nh = cfg.decoder_attention_heads
        hd = cfg.d_model // nh
        src = cfg.max_source_positions
        prompt_len = len(tok.build_prompt_tokens("en"))
        # whisper's decoder positions are a LEARNED table: decoding past
        # max_target_positions would silently reuse the last row (the
        # offline loop clamps the same way, stt/whisper.py)
        max_tokens = min(max_tokens, cfg.max_target_positions - prompt_len)
        max_total = prompt_len + max_tokens

        suppress, begin = model._suppress_masks(tok)
        suppress = jnp.asarray(suppress)
        begin = jnp.asarray(begin)

        def logits_hook(logits, n_new):
            logits = logits + suppress
            return jnp.where(n_new == 0, logits + begin, logits)

        # Fused serving tick (VERDICT r4 item 2): when the model routes
        # through the monolithic Pallas decoder (w8a8 tree on TPU, or
        # interpret mode under test), every live lane decodes through ONE
        # fused_stack_lanes call per step — the HBM weight sweep that
        # dominates decode is paid once per step, not once per lane. The
        # kernel is capped at 8 lanes (its activation rows are the MXU's
        # [8, d] dot shape).
        from tpu_audio.parallel.continuous import coerce_fused_flag

        self.fused = (coerce_fused_flag(fused) and slots <= 8
                      and model._fused_supported())
        if self.fused:
            engine_kw = self._build_fused(cfg, max_total, src)
        else:
            def step_fn(params, tok_ids, cache, ctx):
                ck, cv = ctx
                logits, cache = W.decoder_step(
                    params, tok_ids, cache.offset, cache,
                    ck[:, None], cv[:, None], cfg)
                return logits[:, -1], cache

            def prefill_fn(params, ids, cache, ctx):
                ck, cv = ctx

                def one(cache, t):
                    _, cache = W.decoder_step(
                        params, t[None, None], cache.offset, cache,
                        ck[:, None], cv[:, None], cfg)
                    return cache, None

                cache, _ = jax.lax.scan(one, cache, ids[0])
                return None, cache

            def cache_factory(valid_from):
                return kv_cache.init_cache(
                    cfg.decoder_layers, 1, nh, hd, max_total, model.dtype,
                    valid_from=valid_from)

            ctx_template = (
                jnp.zeros((cfg.decoder_layers, nh, src, hd), model.dtype),
                jnp.zeros((cfg.decoder_layers, nh, src, hd), model.dtype),
            )
            engine_kw = dict(step_fn=step_fn, prefill_fn=prefill_fn,
                             cache_factory=cache_factory,
                             context_template=ctx_template)
        self.engine = ContinuousBatcher(
            engine_kw.pop("params", model.params), slots=slots,
            max_len=max_total, stop_token=tok.eot,
            sampling=SamplingParams(temperature=temperature),
            prefill_buckets=(prompt_len,), seed=seed,
            cache_dtype=model.dtype,
            step_tokens=step_tokens, logits_hook=logits_hook,
            **engine_kw,
            # Underload throughput (VERDICT r3 item 2): every tick decodes
            # >= 64 tokens across its live lanes so the fixed per-tick
            # cost (~40 ms dispatch+fetch on a tunneled chip — the relay
            # serializes the fetch behind the in-flight dispatch, so
            # pipelining alone cannot hide it) amortizes: a lone stream in
            # a slots=4 server runs K=64 ticks at ~4.2 ms/token instead of
            # step_tokens=8 ticks at 8.3 ms/token. Ticks are still
            # pipelined for the marginal dispatch overlap.
            min_tick_tokens=(8 * step_tokens if min_tick_tokens is None
                             else min_tick_tokens),
            pipeline=pipeline)
        self.max_tokens = max_tokens
        self.window = W.CHUNK_LENGTH_SAMPLES  # serving cap per request
        self._meta: dict[int, _Meta] = {}

    def _build_fused(self, cfg, max_total: int, src: int) -> dict:
        """Engine pieces for the fused-tick path: the per-lane cache is
        the kernel's position-major bf16 layout (:class:`_FusedLaneRow`),
        the per-lane context is the request's int8-quantized cross K/V,
        prefill teacher-forces the prompt through the B=1 kernel (same
        numerics as the offline fused loop, whisper._decode_loop_fused),
        and the decode tick runs ``fused_stack_lanes`` — one weight sweep
        shared by all live lanes, per-lane attention in the grid
        timeline. Greedy tokens are bit-identical to the XLA w8a8 engine
        (tested, test_continuous_stt.py)."""
        from tpu_audio.ops import pallas_fused_decoder as F

        model = self.model
        d = cfg.d_model
        L = cfg.decoder_layers
        s_max = -(-max_total // F.SUB) * F.SUB
        sp = -(-src // (d // 2)) * (d // 2)
        interp = W._fused_decoder_mode() == "interpret"
        # the pack rides as part of the engine's params ARGUMENT (a
        # closure capture would bake ~0.7 GB of int8 weights into every
        # tick executable as lowering constants)
        engine_params = (model.params, model.fused_decoder_pack())
        # jitted per-request cross-K/V quantization: eager it is ~16
        # separate dispatches on [L, ~1920, d] arrays — on a tunneled
        # chip each pays a fixed round-trip, pure admission latency
        from tpu_audio.core.jitting import ajit

        self._quantize_ctx = ajit(
            lambda k, v: F.quantize_cross_kv(k, v, chunk=d // 2))

        def step(params, cache, last, ctx):
            params, pack = params
            p = params["model"]["decoder"]
            ck, ks, cv, vs = ctx
            n = last.shape[0]                     # static lane bucket
            off = cache.offset
            x = nn.embedding(p["embed_tokens"], last[None])[0]
            pos = p["embed_positions"]["weight"][off]
            x8 = jnp.zeros((8, d), jnp.float32).at[:n].set(
                x.astype(jnp.float32) + pos.astype(jnp.float32))
            off8 = jnp.zeros((8,), jnp.int32).at[:n].set(off)
            y, nk, nv = F.fused_stack_lanes(
                pack, ck, ks, cv, vs, cache.k, cache.v, x8, off8,
                cfg=cfg, s_src=src, interpret=interp)

            def put(kc, row, o):
                return jax.lax.dynamic_update_slice(
                    kc, row[:, None].astype(kc.dtype), (0, o, 0))

            newk = jax.vmap(put)(
                cache.k, jnp.transpose(nk[:, :n], (1, 0, 2)), off)
            newv = jax.vmap(put)(
                cache.v, jnp.transpose(nv[:, :n], (1, 0, 2)), off)
            h = nn.layer_norm(p["layer_norm"], y[:n])
            logits = nn.embedding_as_linear(
                p["embed_tokens"], h.astype(model.dtype))
            return logits.astype(jnp.float32), cache._replace(
                k=newk, v=newv)

        def prefill_fn(params, ids, cache, ctx):
            # teacher-force the (3-4 token) prompt through the LANES
            # kernel at n=1 — the SAME Mosaic module as the engine's
            # 1-live-lane decode tick, so a cold serving start compiles
            # one fewer kernel instance (numerics identical to the B=1
            # fused_stack, tested lanes-vs-B1)
            params, pack = params
            p = params["model"]["decoder"]
            ck, ks, cv, vs = ctx
            T = ids.shape[1]

            def one(carry, ti):
                kc, vc = carry
                t, i = ti
                x = nn.embedding(p["embed_tokens"], t[None, None])[0, 0]
                pos = jax.lax.dynamic_slice_in_dim(
                    p["embed_positions"]["weight"], i, 1, axis=0)[0]
                x8 = jnp.zeros((8, d), jnp.float32).at[0].set(
                    x.astype(jnp.float32) + pos.astype(jnp.float32))
                off8 = jnp.zeros((8,), jnp.int32).at[0].set(i)
                _, nk, nv = F.fused_stack_lanes(
                    pack, ck[None], ks[None], cv[None], vs[None],
                    kc[None], vc[None], x8, off8,
                    cfg=cfg, s_src=src, interpret=interp)
                kc = jax.lax.dynamic_update_slice(
                    kc, nk[:, 0:1].astype(kc.dtype), (0, i, 0))
                vc = jax.lax.dynamic_update_slice(
                    vc, nv[:, 0:1].astype(vc.dtype), (0, i, 0))
                return (kc, vc), None

            (kc, vc), _ = jax.lax.scan(
                one, (cache.k, cache.v), (ids[0], jnp.arange(T)))
            return None, cache._replace(k=kc, v=vc,
                                        offset=jnp.int32(T))

        def cache_factory(valid_from):
            return _FusedLaneRow(
                k=jnp.zeros((L, s_max, d), jnp.bfloat16),
                v=jnp.zeros((L, s_max, d), jnp.bfloat16),
                offset=jnp.int32(0),
                valid_from=jnp.asarray(valid_from, jnp.int32))

        ctx_template = (
            jnp.zeros((L, sp, d), jnp.int8),      # cross K int8
            jnp.zeros((L, sp), jnp.float32),      # per-position K scales
            jnp.zeros((L, sp, d), jnp.int8),      # cross V int8
            jnp.zeros((L, sp), jnp.float32),      # per-position V scales
        )
        return dict(params=engine_params, batch_step_fn=step,
                    prefill_fn=prefill_fn, cache_factory=cache_factory,
                    context_template=ctx_template)

    def submit(self, audio, language: str | None = None,
               task: str = "transcribe", max_tokens: int | None = None,
               seed: int = 0) -> GenRequest:
        """Encode one <=30 s request and queue its decode. Longer audio
        is truncated to the 30 s window (the reported segment covers the
        transcribed span only); long-form chunking composes on top."""
        from tpu_audio.ops import pallas_fused_decoder as F

        audio = np.asarray(audio, np.float32).reshape(-1)[: self.window]
        feats = self.model.encoder_features(audio)
        enc = self.model._encode(self.model.params, feats)
        ck, cv = W._cross_kv(self.model.params, enc, self.model.config)
        if self.fused:
            context = self._quantize_ctx(ck, cv)
        else:
            context = (ck[:, 0], cv[:, 0])
        prompt = self.model.tokenizer.build_prompt_tokens(language, task)
        req = self.engine.submit(
            np.asarray(prompt, np.int32),
            max_new=min(max_tokens or self.max_tokens, self.max_tokens),
            seed=seed, context=context)
        self._meta[req.request_id] = _Meta(
            audio_seconds=len(audio) / W.SAMPLE_RATE,
            t_submit=time.perf_counter())
        return req

    def step(self):
        """One engine tick -> ``(request_id, token)`` pairs."""
        return self.engine.step()

    def drain(self):
        """Run until every submitted request finishes."""
        for _ in self.engine.run():
            pass

    def cancel(self, request_id: int) -> bool:
        self._meta.pop(request_id, None)
        return self.engine.cancel(request_id)

    def result(self, request_id: int) -> STTOutput:
        """Decode a finished request's tokens into an STTOutput."""
        req = self.engine.requests[request_id]
        if not req.done:
            raise RuntimeError(f"request {request_id} still decoding")
        meta = self._meta.pop(request_id, None)
        text = self.model.tokenizer.decode(req.tokens).strip()
        wall = (time.perf_counter() - meta.t_submit) if meta else 0.0
        end = meta.audio_seconds if meta else 0.0
        return STTOutput(
            text=text,
            segments=[STTSegment(text=text, start=0.0, end=end,
                                 tokens=list(req.tokens))],
            generation_token_count=len(req.tokens),
            generation_time=wall, total_time=wall)


class ContinuousQwen3ASR:
    """Continuous batching for Qwen3-ASR — the audio-LLM variant of
    :class:`ContinuousSTT`: the per-request conditioning is the MERGED
    PROMPT EMBEDDINGS (text template + spliced audio-tower features,
    qwen3_asr.py:_merge_audio_features) carried as the lane context, and
    the prefill runs ``llama.forward(inputs_embeds=ctx)`` — showing the
    engine contract covers decoder-only audio-LLM STT (GLM/Granite/
    Cohere share this shape), not just encoder-decoder whisper.

    Every request pads/truncates to a fixed ``window_s`` so the prompt
    length (audio placeholder count) is one static shape — the single
    prefill bucket, zero left-pad, positions identical to the offline
    decode (greedy tokens bit-identical, tested). Language forcing
    varies the prompt LENGTH in this model, so it is per-engine
    (None = auto-detect from the decoded output)."""

    EOS_IDS = (151645, 151643)  # im_end, endoftext (qwen3_asr.py)

    def __init__(self, model, *, slots: int = 4, window_s: float = 20.0,
                 max_tokens: int = 96, step_tokens: int = 8,
                 temperature: float = 0.0, seed: int = 0,
                 language: str | None = None,
                 min_tick_tokens: int | None = None,
                 pipeline: bool = True):
        from tpu_audio.models import llama
        from tpu_audio.models.stt.qwen3_asr import SAMPLE_RATE

        self.model = model
        self.language = language
        self.window = int(window_s * SAMPLE_RATE)
        self._sr = SAMPLE_RATE
        # fixed window -> constant frame count -> constant prompt length
        mel, n_audio = model.preprocess_audio(
            np.zeros((self.window,), np.float32))
        self._n_audio = n_audio
        prompt = model.build_prompt(n_audio, language=language)
        L = len(prompt)
        tcfg = model.config.text
        max_total = L + max_tokens + 1

        def step_fn(params, tok, cache, ctx):
            return model._step_fn(params, tok, cache)

        def prefill_fn(params, ids, cache, ctx):
            return llama.forward(params, None, cache, tcfg,
                                 inputs_embeds=ctx[None])

        self.engine = ContinuousBatcher(
            model.params, slots=slots, max_len=max_total,
            stop_token=self.EOS_IDS[0],
            sampling=SamplingParams(temperature=temperature,
                                    repetition_penalty=1.0),
            prefill_buckets=(L,), seed=seed, cache_dtype=model.dtype,
            step_fn=step_fn, prefill_fn=prefill_fn,
            cache_factory=lambda valid_from: llama.make_cache(
                tcfg, 1, max_total, model.dtype, valid_from=valid_from),
            step_tokens=step_tokens,
            context_template=jnp.zeros(
                (L - 1, tcfg.hidden_size), model.dtype),
            min_tick_tokens=(4 * step_tokens if min_tick_tokens is None
                             else min_tick_tokens),
            pipeline=pipeline)
        self.max_tokens = max_tokens
        self._meta: dict[int, _Meta] = {}

    def submit(self, audio, language: str | None = None,
               task: str = "transcribe", max_tokens: int | None = None,
               seed: int = 0) -> GenRequest:
        """Encode one fixed-window request and queue its decode.
        ``language`` forcing is per-engine in this model (it changes the
        prompt length); a differing per-request value is rejected."""
        if language is not None and language != self.language:
            raise ValueError(
                "Qwen3-ASR language forcing is per-engine; rebuild the "
                f"engine with language={language!r}")
        if task != "transcribe":
            raise ValueError("Qwen3-ASR serves transcription only")
        audio = np.asarray(audio, np.float32).reshape(-1)[: self.window]
        seconds = len(audio) / self._sr
        if len(audio) < self.window:
            audio = np.pad(audio, (0, self.window - len(audio)))
        mel, n_audio = self.model.preprocess_audio(audio)
        feats = self.model.encode_audio(mel)
        ids = np.asarray([self.model.build_prompt(
            n_audio, language=self.language)], np.int32)
        embeds = self.model._merge_audio_features(ids, feats)
        req = self.engine.submit(
            ids[0], max_new=max_tokens or self.max_tokens, seed=seed,
            context=jnp.asarray(embeds[0, :-1], self.model.dtype))
        self._meta[req.request_id] = _Meta(
            audio_seconds=seconds, t_submit=time.perf_counter())
        return req

    def step(self):
        return self.engine.step()

    def drain(self):
        for _ in self.engine.run():
            pass

    def cancel(self, request_id: int) -> bool:
        self._meta.pop(request_id, None)
        return self.engine.cancel(request_id)

    def result(self, request_id: int) -> STTOutput:
        req = self.engine.requests[request_id]
        if not req.done:
            raise RuntimeError(f"request {request_id} still decoding")
        meta = self._meta.pop(request_id, None)
        gen = [t for t in req.tokens if t not in self.EOS_IDS]
        decoded = self.model.tokenizer.decode(gen, skip_special_tokens=True)
        lang, text = self.model._parse_output(decoded, self.language)
        wall = (time.perf_counter() - meta.t_submit) if meta else 0.0
        end = meta.audio_seconds if meta else 0.0
        return STTOutput(
            text=text, language=lang,
            segments=[STTSegment(text=text, start=0.0, end=end,
                                 tokens=gen)],
            generation_token_count=len(gen),
            generation_time=wall, total_time=wall)


class STTEngineWorker(EngineWorkerBase):
    """Thread multiplexing concurrent transcription callers onto one
    :class:`ContinuousSTT` — the STT sibling of
    :class:`~tpu_audio.parallel.continuous.TTSEngineWorker` (both share
    :class:`~tpu_audio.parallel.continuous.EngineWorkerBase`'s
    thread/inbox machinery and its death-race guarantees):

    >>> worker = STTEngineWorker(model, slots=4)
    >>> out = worker.transcribe(audio, language="en")   # any thread

    Encodes happen on the engine thread as requests arrive (one device
    dispatch each); the decode loops of all in-flight requests share the
    continuously-batched tick. ``engine_cls`` picks the engine for the
    model family (:class:`ContinuousSTT` for whisper,
    :class:`ContinuousQwen3ASR` for the audio-LLM)."""

    _thread_name = "stt-engine"

    def __init__(self, model, *, slots: int = 4,
                 engine_cls=None, **kw):
        self._srv = (engine_cls or ContinuousSTT)(model, slots=slots, **kw)
        super().__init__()

    def transcribe(self, audio, language: str | None = None,
                   task: str = "transcribe", max_tokens: int | None = None,
                   seed: int = 0) -> STTOutput:
        """Blocking: submit and wait for this request's transcription."""
        outq = self._queue_mod.Queue()
        self._enqueue((audio, language, task, max_tokens, seed, outq))
        out = outq.get()
        if isinstance(out, Exception):
            raise out
        return out

    @property
    def _idle(self) -> bool:
        return self._srv.engine.idle

    def _handle(self, item) -> None:
        audio, language, task, max_tokens, seed, outq = item
        self._admit(lambda: self._srv.submit(audio, language=language,
                                             task=task,
                                             max_tokens=max_tokens,
                                             seed=seed), outq)

    def _service(self) -> None:
        self._srv.step()
        for rid in [r for r in self._out
                    if self._srv.engine.requests[r].done]:
            self._out.pop(rid).put(self._srv.result(rid))
            self._srv.engine.release(rid)
