"""FireRedASR2: conformer attention-encoder-decoder ASR (Chinese/English).

TPU-first rebuild of the reference
(Sources/MLXAudioSTT/Models/FireRedASR2/*): Kaldi fbank (HTK mel,
fmin=20, int16 scaling — shared with SenseVoice) + CMVN, a conformer
encoder with macaron FFNs THAT CARRY THEIR OWN residuals
(FireRedASR2Model.swift:107-126), per-stream LayerNorms inside the
rel-pos attention (layer_norm_q/k/v), double-width GLU conv modules,
and a 2x2-strided VALID conv subsampler fed 6 extra right-context
frames. The transformer decoder (scaled embedding + absolute sin/cos
positions, pre-LN self/cross/MLP) decodes with KV caches and
precomputed cross K/V in one jitted `lax.while_loop` — the
reference re-runs full hidden states per step
(FireRedASR2Model.swift:437-480). The default decode is the
reference's 3-beam search (beamSearch, FireRedASR2Model.swift:581-737,
smoothing 1.25 / length penalty 0.6): here the beams ride the batch
axis and the candidate merge is an on-device top-k, so the whole
search is one graph with no per-step host sort; `beam_size=1` takes
the cheaper greedy loop.
"""

from __future__ import annotations

import functools
import math
import time
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import hub, kv_cache, loading, nn
from tpu_audio.core.audio_io import resample_audio
from tpu_audio.core.generation import (
    STTGenerateParameters,
    STTOutput,
    STTSegment,
)
from tpu_audio.models.stt import parakeet
from tpu_audio.models.stt.nemotron import _rel_pos_table
from tpu_audio.models.stt.sensevoice import SenseVoiceConfig, compute_fbank
from tpu_audio.core.jitting import ajit

__all__ = ["FireRedASR2", "FireRedConfig"]


@dataclass
class FireRedSubConfig:
    n_layers: int = 16
    n_head: int = 20
    d_model: int = 1280
    kernel_size: int = 33
    pe_maxlen: int = 5000


@dataclass
class FireRedConfig:
    """FireRedASR2Config.swift:113-140."""

    idim: int = 80
    odim: int = 8667
    sos_id: int = 3
    eos_id: int = 4
    pad_id: int = 2
    encoder: FireRedSubConfig = field(default_factory=FireRedSubConfig)
    decoder: FireRedSubConfig = field(default_factory=FireRedSubConfig)

    @classmethod
    def from_dict(cls, d: dict) -> "FireRedConfig":
        sk = set(FireRedSubConfig.__dataclass_fields__)

        def sub(name):
            return FireRedSubConfig(**{k: v for k, v in
                                       d.get(name, {}).items() if k in sk})

        keys = set(cls.__dataclass_fields__) - {"encoder", "decoder"}
        kw = {k: v for k, v in d.items() if k in keys}
        return cls(encoder=sub("encoder"), decoder=sub("decoder"), **kw)


SUBSAMPLE_CONTEXT = 7  # right-pad context-1 frames before the convs


def _ffn(p, x):
    """Macaron FF with internal residual and swish
    (FireRedASR2Model.swift:107-126)."""
    h = nn.layer_norm(p["net_0"], x)
    h = nn.linear(p["net_1"], h)
    h = h * jax.nn.sigmoid(h)
    return nn.linear(p["net_4"], h) + x


def _conv_module(p, x, kernel: int):
    """Double-width GLU conv with internal residual
    (FireRedASR2Model.swift:128-175)."""
    h = nn.layer_norm(p["pre_layer_norm"], x)
    h = nn.conv1d(p["pointwise_conv1"], h)
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(g)
    h = nn.conv1d(p["depthwise_conv"], h, padding=(kernel - 1) // 2,
                  groups=h.shape[-1])
    h = nn.layer_norm(p["batch_norm"], h)  # LayerNorm despite the name
    h = h * jax.nn.sigmoid(h)
    return nn.conv1d(p["pointwise_conv2"], h) + x


def _rel_attention(p, x, pos_emb, n_heads: int):
    """Per-stream-LN rel-pos attention with internal residual
    (FireRedASR2Model.swift:176-254)."""
    b, t, d = x.shape
    hd = d // n_heads
    scale = 1.0 / math.sqrt(hd)
    q = nn.linear(p["w_qs"], nn.layer_norm(p["layer_norm_q"], x)).reshape(
        b, t, n_heads, hd)
    k = nn.linear(p["w_ks"], nn.layer_norm(p["layer_norm_k"], x)).reshape(
        b, t, n_heads, hd).transpose(0, 2, 1, 3)
    v = nn.linear(p["w_vs"], nn.layer_norm(p["layer_norm_v"], x)).reshape(
        b, t, n_heads, hd).transpose(0, 2, 1, 3)
    pp = nn.linear(p["linear_pos"], pos_emb.astype(x.dtype))
    ph = pp.reshape(1, -1, n_heads, hd).transpose(0, 2, 1, 3)
    q_u = (q + p["pos_bias_u"].astype(x.dtype)).transpose(0, 2, 1, 3)
    q_v = (q + p["pos_bias_v"].astype(x.dtype)).transpose(0, 2, 1, 3)
    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k,
                    preferred_element_type=jnp.float32)
    bd = jnp.einsum("bhqd,bhpd->bhqp", q_v, ph,
                    preferred_element_type=jnp.float32)
    bd = parakeet._rel_shift(bd)[..., :t]
    probs = jax.nn.softmax((ac + bd) * scale, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return nn.linear(p["fc"], o.transpose(0, 2, 1, 3).reshape(b, t, d)) + x


def encoder_forward(params, feats, cfg: FireRedConfig):
    """fbank [B, T, idim] -> [B, T/4, d]
    (FireRedASR2Model.swift:280-318)."""
    p = params["encoder"]
    x = jnp.pad(feats, ((0, 0), (0, SUBSAMPLE_CONTEXT - 1), (0, 0)))
    y = x[..., None]
    y = jax.nn.relu(nn.conv2d(p["input_preprocessor"]["conv1"], y, stride=2))
    y = jax.nn.relu(nn.conv2d(p["input_preprocessor"]["conv2"], y, stride=2))
    b, t, f, c = y.shape
    y = y.transpose(0, 1, 3, 2).reshape(b, t, c * f)
    h = nn.linear(p["input_preprocessor"]["out"], y)
    pos_emb = jnp.asarray(_rel_pos_table(t, cfg.encoder.d_model))[None]
    for i in range(cfg.encoder.n_layers):
        lp = p["layer_stack"][str(i)]
        h = 0.5 * h + 0.5 * _ffn(lp["ffn1"], h)
        h = _rel_attention(lp["mhsa"], h, pos_emb, cfg.encoder.n_head)
        h = _conv_module(lp["conv"], h, cfg.encoder.kernel_size)
        h = 0.5 * h + 0.5 * _ffn(lp["ffn2"], h)
        h = nn.layer_norm(lp["layer_norm"], h)
    return h


def _abs_positions(max_len: int, d: int) -> np.ndarray:
    pos = np.arange(max_len, dtype=np.float32)
    div = np.exp(np.arange(0, d, 2, dtype=np.float32)
                 * (-math.log(10000.0) / d))
    table = np.zeros((max_len, d), np.float32)
    table[:, 0::2] = np.sin(pos[:, None] * div)
    table[:, 1::2] = np.cos(pos[:, None] * div[: d // 2])
    return table


def _cross_kv(params, enc_out, cfg: FireRedConfig):
    nh = cfg.decoder.n_head
    hd = cfg.decoder.d_model // nh
    b, s, _ = enc_out.shape
    ks, vs = [], []
    for i in range(cfg.decoder.n_layers):
        lp = params["decoder"]["layer_stack"][str(i)]["cross_attn"]
        k = nn.linear(lp["w_ks"], enc_out).reshape(b, s, nh, hd)
        v = nn.linear(lp["w_vs"], enc_out).reshape(b, s, nh, hd)
        ks.append(k.transpose(0, 2, 1, 3))
        vs.append(v.transpose(0, 2, 1, 3))
    return jnp.stack(ks), jnp.stack(vs)


def _decoder_step(params, tok, cache, cross_k, cross_v, cfg: FireRedConfig):
    """One KV-cached decode step (FireRedASR2Model.swift:416-480)."""
    p = params["decoder"]
    d = cfg.decoder.d_model
    nh = cfg.decoder.n_head
    hd = d // nh
    b = tok.shape[0]
    x = nn.embedding(p["tgt_word_emb"], tok) * math.sqrt(d)
    table = jnp.asarray(_abs_positions(cfg.decoder.pe_maxlen, d))
    pos = jnp.clip(cache.offset, 0, cfg.decoder.pe_maxlen - 1)
    x = x + jax.lax.dynamic_slice_in_dim(table, pos, 1)[None].astype(x.dtype)
    for i in range(cfg.decoder.n_layers):
        lp = p["layer_stack"][str(i)]
        h = nn.layer_norm(lp["self_attn_norm"], x)
        sa = lp["self_attn"]
        q = nn.linear(sa["w_qs"], h).reshape(b, 1, nh, hd)
        k = nn.linear(sa["w_ks"], h).reshape(b, 1, nh, hd)
        v = nn.linear(sa["w_vs"], h).reshape(b, 1, nh, hd)
        cache, k_full, v_full = kv_cache.update_cache(
            cache, i, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3))
        mask = kv_cache.attention_mask(cache, 1)
        o = nn.sdpa(q.transpose(0, 2, 1, 3), k_full, v_full, mask=mask)
        x = x + nn.linear(sa["fc"], o.transpose(0, 2, 1, 3).reshape(b, 1, d))
        h = nn.layer_norm(lp["cross_attn_norm"], x)
        ca = lp["cross_attn"]
        q = nn.linear(ca["w_qs"], h).reshape(b, 1, nh, hd).transpose(
            0, 2, 1, 3)
        o = nn.sdpa(q, cross_k[i], cross_v[i])
        x = x + nn.linear(ca["fc"], o.transpose(0, 2, 1, 3).reshape(b, 1, d))
        h = nn.layer_norm(lp["mlp_norm"], x)
        x = x + nn.linear(lp["mlp"]["w_2"],
                          nn.gelu(nn.linear(lp["mlp"]["w_1"], h)))
    x = nn.layer_norm(p["layer_norm_out"], x)
    cache = cache._replace(offset=cache.offset + 1)
    return nn.linear(p["tgt_word_prj"], x)[:, -1], cache


def sanitize(weights):
    out = {}
    for k, v in weights.items():
        if "conv" in k and k.endswith(".weight"):
            # MLX layouts -> torch: conv2d [O,H,W,I] -> [O,I,H,W];
            # conv1d [O,K,I] -> [O,I,K] (kernel middle-axis probe)
            if v.ndim == 4:
                v = np.transpose(v, (0, 3, 1, 2))
            elif v.ndim == 3:
                v = np.transpose(v, (0, 2, 1))
        out[k] = v
    return out


class FireRedASR2:
    def __init__(self, config: FireRedConfig, params, tokenizer=None,
                 cmvn=None, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.cmvn = cmvn
        self.dtype = dtype
        self.sample_rate = 16000
        self._fbank_cfg = SenseVoiceConfig(n_mels=config.idim, fs=16000,
                                           frame_length=25, frame_shift=10,
                                           window="hamming")
        self._encode = ajit(functools.partial(encoder_forward, cfg=config))
        self._loops: dict = {}

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32
                        ) -> "FireRedASR2":
        import json

        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = FireRedConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        cmvn = None
        if (model_dir / "cmvn.json").exists():
            d = json.loads((model_dir / "cmvn.json").read_text())
            means = np.asarray(d.get("means", d.get("cmvn_means")),
                               np.float32)
            istd = np.asarray(d.get("istd", d.get("cmvn_istd")), np.float32)
            cmvn = (means, istd)
        tokenizer = None
        if (model_dir / "tokenizer.json").exists():
            from tokenizers import Tokenizer

            tokenizer = Tokenizer.from_file(str(model_dir / "tokenizer.json"))
        return cls(config, params, tokenizer, cmvn, dtype)

    def _get_loop(self, max_total: int):
        if max_total in self._loops:
            return self._loops[max_total]
        cfg = self.config

        def loop(params, cross_k, cross_v):
            cache = kv_cache.init_cache(
                cfg.decoder.n_layers, 1, cfg.decoder.n_head,
                cfg.decoder.d_model // cfg.decoder.n_head, max_total,
                jnp.float32)
            tokens = jnp.zeros((max_total,), jnp.int32).at[0].set(cfg.sos_id)

            def cond(c):
                _, i, _, finished = c
                return jnp.logical_and(~finished, i < max_total)

            def body(c):
                tokens, i, cache, _ = c
                logits, cache = _decoder_step(
                    params, tokens[i - 1][None, None], cache, cross_k,
                    cross_v, cfg)
                nxt = jnp.argmax(logits[0].astype(jnp.float32)).astype(
                    jnp.int32)
                tokens = tokens.at[i].set(nxt)
                return tokens, i + 1, cache, nxt == cfg.eos_id

            tokens, count, *_ = jax.lax.while_loop(
                cond, body, (tokens, jnp.int32(1), cache, jnp.bool_(False)))
            return tokens, count

        fn = ajit(loop)
        self._loops[max_total] = fn
        return fn

    # beam hyperparameters fixed by the reference's generate call
    # (FireRedASR2Model.swift:581-588, 821: beamSize 3, softmax
    # smoothing 1.25, length penalty 0.6, eos penalty 1.0)
    BEAM_SMOOTHING = 1.25
    LENGTH_PENALTY = 0.6
    EOS_PENALTY = 1.0

    def _get_beam_loop(self, max_total: int, beam: int):
        """Batched beam search as ONE jitted ``lax.while_loop``
        (FireRedASR2Model.swift:581-737 beamSearch): the B beams ride the
        decoder's batch axis, the candidate merge is a top-k over the
        flattened [B*B] (beam x rank) score table, and beam reordering
        gathers the KV cache on its batch axis — all on device, no
        per-step host sync (the reference sorts candidates host-side
        every step)."""
        key = ("beam", max_total, beam)
        if key in self._loops:
            return self._loops[key]
        cfg = self.config
        B = beam
        eos = cfg.eos_id
        smooth = self.BEAM_SMOOTHING
        eosp = self.EOS_PENALTY

        def loop(params, cross_k, cross_v):
            cache = kv_cache.init_cache(
                cfg.decoder.n_layers, B, cfg.decoder.n_head,
                cfg.decoder.d_model // cfg.decoder.n_head, max_total,
                jnp.float32)
            tokens = jnp.full((B, max_total), eos,
                              jnp.int32).at[:, 0].set(cfg.sos_id)
            scores = jnp.full((B,), -jnp.inf, jnp.float32).at[0].set(0.0)
            conf = jnp.zeros((B, max_total), jnp.float32)
            finished = jnp.zeros((B,), bool)
            ck = jnp.repeat(cross_k, B, axis=1)
            cv = jnp.repeat(cross_v, B, axis=1)

            def cond(c):
                _, i, _, _, _, finished = c
                return jnp.logical_and(~jnp.all(finished), i < max_total)

            def body(c):
                tokens, i, cache, scores, conf, finished = c
                last = jax.lax.dynamic_slice_in_dim(tokens, i - 1, 1,
                                                    axis=1)
                logits, cache = _decoder_step(params, last, cache, ck, cv,
                                              cfg)
                step = jnp.log(
                    jax.nn.softmax(logits.astype(jnp.float32) / smooth,
                                   axis=-1) + 1e-10)
                if eosp != 1.0:
                    step = step.at[:, eos].multiply(eosp)
                vals, idx = jax.lax.top_k(step, B)       # [B, B]
                # finished beams carry exactly ONE candidate: themselves
                # extended by eos at unchanged score (tokenScore 0)
                rank0 = jnp.arange(B)[None, :] == 0
                cand_tot = jnp.where(
                    finished[:, None],
                    jnp.where(rank0, scores[:, None], -jnp.inf),
                    scores[:, None] + vals)
                cand_tok = jnp.where(finished[:, None], eos, idx)
                cand_ts = jnp.where(finished[:, None], 0.0, vals)
                sel_tot, sel_flat = jax.lax.top_k(cand_tot.reshape(-1), B)
                src = sel_flat // B
                tok_sel = cand_tok.reshape(-1)[sel_flat]
                ts_sel = cand_ts.reshape(-1)[sel_flat]
                tokens = jax.lax.dynamic_update_slice(
                    tokens[src], tok_sel[:, None].astype(jnp.int32), (0, i))
                conf = jax.lax.dynamic_update_slice(
                    conf[src], jnp.exp(ts_sel)[:, None], (0, i))
                cache = cache._replace(k=cache.k[:, src], v=cache.v[:, src])
                return (tokens, i + 1, cache, sel_tot, conf,
                        tok_sel == eos)

            tokens, i, _, scores, conf, _ = jax.lax.while_loop(
                cond, body,
                (tokens, jnp.int32(1), cache, scores, conf, finished))
            return tokens, i, scores, conf

        fn = ajit(loop)
        self._loops[key] = fn
        return fn

    def _beam_decode(self, cross_k, cross_v, max_total: int,
                     beam: int):
        """Run the jitted beam loop and pick the best beam with the
        reference's length-penalty rescoring (host-side finalize,
        FireRedASR2Model.swift:704-736)."""
        loop = self._get_beam_loop(max_total, beam)
        tokens, count, scores, conf = loop(self.params, cross_k, cross_v)
        toks = np.asarray(tokens)[:, : int(count)]
        scores = np.asarray(scores, np.float64)
        # reference counts non-eos over the FULL row incl. the sos slot
        lengths = (toks != self.config.eos_id).sum(axis=1)
        if self.LENGTH_PENALTY > 0:
            scores = scores / ((5.0 + lengths) / 6.0) ** self.LENGTH_PENALTY
        best = int(scores.argmax())
        ids = [t for t in toks[best, 1:].tolist() if t != self.config.eos_id]
        confs = np.asarray(conf)[best, 1 : 1 + len(ids)].tolist()
        return ids, confs

    def generate(self, audio, generation_parameters:
                 STTGenerateParameters | None = None,
                 sample_rate: int | None = None,
                 beam_size: int | None = None) -> STTOutput:
        gp = generation_parameters or STTGenerateParameters()
        if beam_size is None:
            beam_size = gp.beam_size if gp.beam_size is not None else 3
        t0 = time.perf_counter()
        wf = np.asarray(audio, np.float32).reshape(-1)
        src = sample_rate or 16000
        if src != 16000:
            wf = resample_audio(wf, src, 16000)
        feats = compute_fbank(wf, self._fbank_cfg)
        if feats.shape[0] == 0:
            return STTOutput(text="")
        if self.cmvn is not None:
            feats = (feats - self.cmvn[0]) * self.cmvn[1]
        enc = self._encode(self.params,
                           jnp.asarray(feats, self.dtype)[None])
        cross_k, cross_v = _cross_kv(self.params, enc, self.config)
        max_total = max(8, min(gp.max_tokens or enc.shape[1],
                               enc.shape[1]) + 1)
        if beam_size > 1:
            ids, _ = self._beam_decode(cross_k, cross_v, max_total,
                                       beam_size)
        else:
            loop = self._get_loop(max_total)
            tokens, count = loop(self.params, cross_k, cross_v)
            ids = [t for t in np.asarray(tokens)[1: int(count)].tolist()
                   if t != self.config.eos_id]
        if self.tokenizer is not None:
            text = self.tokenizer.decode(ids).strip()
        else:
            text = " ".join(str(i) for i in ids)
        elapsed = time.perf_counter() - t0
        return STTOutput(
            text=text, language=gp.language,
            segments=[STTSegment(text=text, start=0.0,
                                 end=len(wf) / 16000, tokens=ids)],
            generation_token_count=len(ids),
            generation_time=elapsed, total_time=elapsed)

    def generate_stream(self, audio, generation_parameters=None, **kw):
        out = self.generate(audio, generation_parameters, **kw)
        if out.text:
            yield {"type": "token", "text": out.text}
        yield {"type": "result", "output": out}
