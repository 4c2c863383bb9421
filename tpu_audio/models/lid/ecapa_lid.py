"""ECAPA-TDNN language identification (VoxLingua107) + the shared
ECAPA backbone used for speaker embeddings.

TPU-first rebuild of the reference
(Sources/MLXAudioCodecs/EcapaTdnn/EcapaTdnnBackbone.swift and
Sources/MLXAudioLID/Models/EcapaTdnn/*): TDNN blocks (conv+relu+BN),
SE-Res2Net blocks, multi-layer feature aggregation, attentive statistics
pooling, BN + 1x1-conv embedding head, then the SpeechBrain classifier
(leaky-relu + BN + DNN block + linear + log-softmax). The frontend is a
SpeechBrain-compatible mel: periodic hamming, constant pad, HTK mel,
power-to-dB with top_db 80, sentence mean normalization.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import dsp, hub, loading, nn
from tpu_audio.models.lid.wav2vec2_lid import LanguagePrediction, LIDOutput
from tpu_audio.core.jitting import ajit

__all__ = ["EcapaLID", "EcapaConfig", "ecapa_backbone_forward"]


@dataclass
class EcapaConfig:
    input_size: int = 60
    channels: int = 1024
    embed_dim: int = 256
    kernel_sizes: tuple = (5, 3, 3, 3, 1)
    dilations: tuple = (1, 2, 3, 4, 1)
    attention_channels: int = 128
    res2net_scale: int = 8
    se_channels: int = 128
    global_context: bool = False
    # IndexTTS's speaker encoder pads convs with reflect instead of zeros
    # (IndexTTSBigVGAN.swift:127 reflectPadding: true)
    reflect_padding: bool = False
    num_classes: int = 107
    classifier_hidden_dim: int = 512
    id2label: dict = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "EcapaConfig":
        keys = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in d.items() if k in keys}
        for k in ("kernel_sizes", "dilations"):
            if k in kw:
                kw[k] = tuple(kw[k])
        return cls(**kw)


def _tdnn(p, x, kernel: int, dilation: int = 1, reflect: bool = False):
    pad = (kernel - 1) * dilation // 2
    if reflect and pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
        pad = 0
    y = jax.nn.relu(nn.conv1d(p["conv"], x, padding=pad, dilation=dilation))
    return nn.batch_norm(p["norm"], y)


def _se_res2net(p, x, cfg: EcapaConfig, kernel: int, dilation: int):
    residual = x
    out = _tdnn(p["tdnn1"], x, 1)  # kernel 1: padding mode irrelevant
    # Res2Net: hierarchical splits (Res2NetBlock)
    chunks = jnp.split(out, cfg.res2net_scale, axis=-1)
    outs = [chunks[0]]
    for i in range(cfg.res2net_scale - 1):
        inp = chunks[i + 1] if i == 0 else chunks[i + 1] + outs[-1]
        outs.append(_tdnn(p["res2net_block"]["blocks"][str(i)], inp, kernel,
                          dilation, reflect=cfg.reflect_padding))
    out = jnp.concatenate(outs, axis=-1)
    out = _tdnn(p["tdnn2"], out, 1)
    # SE
    s = out.mean(axis=1, keepdims=True)
    s = jax.nn.relu(nn.conv1d(p["se_block"]["conv1"], s))
    s = jax.nn.sigmoid(nn.conv1d(p["se_block"]["conv2"], s))
    return out * s + residual


def ecapa_backbone_forward(p, x, cfg: EcapaConfig, mask=None):
    """mel [B, T, n_mels] -> embeddings [B, embed_dim].

    ``mask`` [B, T] bool marks valid frames for LENGTH-PADDED batched
    rows (the serving micro-batcher pads clips to a shared bucket): the
    global-context statistics and the attentive-pooling softmax then
    exclude padded frames, so a padded row's embedding matches its solo
    embedding up to conv receptive-field edge effects (~30 frames)."""
    out = _tdnn(p["block0"], x, cfg.kernel_sizes[0], cfg.dilations[0],
                reflect=cfg.reflect_padding)
    feats = []
    for i in (1, 2, 3):
        out = _se_res2net(p[f"block{i}"], out, cfg, cfg.kernel_sizes[i],
                          cfg.dilations[i])
        feats.append(out)
    out = jnp.concatenate(feats, axis=-1)
    out = _tdnn(p["mfa"], out, cfg.kernel_sizes[4], cfg.dilations[4],
                reflect=cfg.reflect_padding)
    # attentive statistics pooling
    ap = p["asp"]
    mf = None if mask is None else mask[..., None].astype(out.dtype)
    nf = None if mask is None else jnp.maximum(
        mask.sum(axis=1).astype(out.dtype), 1.0)[:, None, None]
    if cfg.global_context:
        if mask is None:
            mean = out.mean(axis=1, keepdims=True)
            std = jnp.sqrt(out.var(axis=1, keepdims=True) + 1e-9)
        else:
            mean = (out * mf).sum(axis=1, keepdims=True) / nf
            var = ((out - mean) ** 2 * mf).sum(axis=1, keepdims=True) / nf
            std = jnp.sqrt(var + 1e-9)
        attn_in = jnp.concatenate(
            [out, jnp.broadcast_to(mean, out.shape),
             jnp.broadcast_to(std, out.shape)], axis=-1)
    else:
        attn_in = out
    a = jnp.tanh(_tdnn(ap["tdnn"], attn_in, 1))
    logits = nn.conv1d(ap["conv"], a)
    if mask is not None:
        logits = jnp.where(mask[..., None], logits, -1e9)
    a = jax.nn.softmax(logits, axis=1)
    w_mean = (a * out).sum(axis=1)
    w_var = (a * out * out).sum(axis=1) - w_mean**2
    pooled = jnp.concatenate([w_mean, jnp.sqrt(jnp.maximum(w_var, 1e-9))],
                             axis=-1)
    pooled = nn.batch_norm(p["asp_bn"], pooled)
    return nn.conv1d(p["fc"], pooled[:, None])[:, 0]


def ecapa_mel(audio: np.ndarray) -> jnp.ndarray:
    """SpeechBrain-compatible mel [1, T, 60] (EcapaMelSpectrogram.swift)."""
    window = dsp.hamming_window(400, periodic=True)
    spec = dsp.stft(jnp.asarray(np.asarray(audio, np.float32)), window, 400,
                    160, pad_mode="constant")
    power = jnp.abs(spec) ** 2
    fb = jnp.asarray(dsp.mel_filters(16000, 400, 60, norm=None,
                                     mel_scale="htk"))
    mel = dsp.power_to_db(power @ fb, top_db=80.0)
    return mel[None]


def sanitize(weights: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """SpeechBrain checkpoint remaps (EcapaTdnnLID.swift:99-137) + conv
    layout [O,K,I] -> [O,I,K] for MLX-converted checkpoints."""
    out = {}
    for k, v in weights.items():
        if "num_batches_tracked" in k:
            continue
        for i in range(4):
            k = k.replace(f"embedding_model.blocks.{i}.",
                          f"embedding_model.block{i}.")
        k = k.replace(".conv.conv.", ".conv.").replace(".norm.norm.", ".norm.")
        k = k.replace(".se_block.conv1.conv.", ".se_block.conv1.")
        k = k.replace(".se_block.conv2.conv.", ".se_block.conv2.")
        k = k.replace(".asp_bn.norm.", ".asp_bn.")
        k = k.replace(".fc.conv.", ".fc.")
        if k.endswith(".weight") and v.ndim == 3:
            # MLX conv layout [O,K,I] -> torch [O,I,K] (kernel in middle)
            if v.shape[1] <= 5 and v.shape[1] != v.shape[2]:
                v = np.transpose(v, (0, 2, 1))
        out[k] = v
    return out


class EcapaLID:
    def __init__(self, config: EcapaConfig, params, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        self.id2label = {int(k): str(v).split(":")[0].strip()
                         for k, v in (config.id2label or {}).items()}

        # mel constants closed over as NUMPY arrays so the whole
        # waveform -> probs pipeline is ONE compiled graph / ONE dispatch
        # (the round-2 driver measured 96 ms for the eager per-op front end
        # through the axon tunnel; fused it runs in ~2.4 ms on v5e).
        # numpy (not jnp) closures matter: fetching a device-array const at
        # trace time is a device->host read, which permanently drops the
        # axon session out of its speculative fast-dispatch mode.
        window = np.asarray(dsp.hamming_window(400, periodic=True),
                            np.float32)
        fb = np.asarray(dsp.mel_filters(16000, 400, 60, norm=None,
                                        mel_scale="htk"), np.float32)

        def fwd(p, mel):
            mel = mel - mel.mean(axis=1, keepdims=True)  # sentence mean norm
            emb = ecapa_backbone_forward(p["embedding_model"], mel, config)
            c = p["classifier"]
            h = jnp.where(emb >= 0, emb, 0.01 * emb)  # leaky relu
            h = nn.batch_norm(c["norm"], h)
            h = nn.linear(c["DNN"]["block_0"]["linear"]["w"], h)
            h = jnp.where(h >= 0, h, 0.01 * h)
            h = nn.batch_norm(c["DNN"]["block_0"]["norm"], h)
            h = nn.linear(c["out"]["w"], h)
            return jax.nn.log_softmax(h, axis=-1)

        self._forward = ajit(fwd)

        def full(p, audio):
            spec = dsp.stft(audio, window, 400, 160, pad_mode="constant")
            power = jnp.abs(spec) ** 2
            mel = dsp.power_to_db(power @ fb, top_db=80.0)[None]
            return jnp.exp(fwd(p, mel.astype(dtype))[0].astype(jnp.float32))

        # compiled per distinct audio length (static shapes for the MXU)
        self._predict_jit = ajit(full)

        def full_batch(p, audio, n_frames):
            """audio [B, S] (rows zero-padded to the bucket), n_frames [B]
            = each row's true 1 + n_samples//160 frame count. One graph,
            one dispatch for the whole micro-batch — on a tunneled chip
            the ~50 ms dispatch+readback then amortizes across every
            concurrent request instead of being paid per request."""
            spec = jax.vmap(
                lambda a: dsp.stft(a, window, 400, 160,
                                   pad_mode="constant"))(audio)
            power = jnp.abs(spec) ** 2
            mel = power @ fb                                    # [B, T, 60]
            t = mel.shape[1]
            mask = (jnp.arange(t)[None, :] < n_frames[:, None])
            mf = mask[..., None].astype(jnp.float32)
            n = jnp.maximum(n_frames.astype(jnp.float32), 1.0)[:, None, None]
            # per-row masked power_to_db (the solo path's global max must
            # not leak across batch rows)
            db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
            row_max = jnp.max(jnp.where(mask[..., None], db, -jnp.inf),
                              axis=(1, 2), keepdims=True)
            db = jnp.maximum(db, row_max - 80.0)
            mean = (db * mf).sum(axis=1, keepdims=True) / n
            meln = ((db - mean) * mf).astype(dtype)
            emb = ecapa_backbone_forward(p["embedding_model"], meln, config,
                                         mask=mask)
            c = p["classifier"]
            h = jnp.where(emb >= 0, emb, 0.01 * emb)
            h = nn.batch_norm(c["norm"], h)
            h = nn.linear(c["DNN"]["block_0"]["linear"]["w"], h)
            h = jnp.where(h >= 0, h, 0.01 * h)
            h = nn.batch_norm(c["DNN"]["block_0"]["norm"], h)
            h = nn.linear(c["out"]["w"], h)
            return jnp.exp(jax.nn.log_softmax(
                h.astype(jnp.float32), axis=-1))

        self._predict_batch_jit = ajit(full_batch)

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32) -> "EcapaLID":
        model_dir = hub.resolve_or_download_model(repo_or_path)
        config = EcapaConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        return cls(config, params, dtype)

    def predict_device(self, waveform: np.ndarray) -> jnp.ndarray:
        """waveform -> language probabilities [num_classes], left ON DEVICE.

        The whole mel+backbone+classifier pipeline is one compiled graph;
        keeping the result device-resident lets pipelines (and latency
        benchmarks) avoid the host readback that costs a full tunnel
        round-trip per call on remote-attached TPUs."""
        audio = jnp.asarray(np.asarray(waveform, np.float32).reshape(-1))
        return self._predict_jit(self.params, audio)

    def predict(self, waveform: np.ndarray, top_k: int = 5) -> LIDOutput:
        probs = np.asarray(self.predict_device(waveform))
        return self._to_output(probs, top_k)

    def _to_output(self, probs: np.ndarray, top_k: int) -> LIDOutput:
        order = np.argsort(-probs)[: min(top_k, len(probs))]
        top = [LanguagePrediction(self.id2label.get(int(i), f"unknown_{i}"),
                                  float(probs[i])) for i in order]
        best = top[0] if top else LanguagePrediction("unknown", 0.0)
        return LIDOutput(best.language, best.confidence, top)

    # sample-count buckets: one compiled batched graph per (bucket,
    # batch-bucket) pair; clips pad up to <=2x their length
    _LEN_BUCKETS = tuple(16000 * s for s in (1, 2, 4, 8, 16, 30))

    def predict_batch(self, waveforms: list[np.ndarray],
                      top_k: int = 5) -> list[LIDOutput]:
        """Classify several clips in ONE device dispatch per length
        bucket. Padded rows run the masked pipeline (mask-aware mean
        norm, dB clamp, global-context stats, attention softmax), so a
        padded row's probabilities match its solo ``predict`` up to conv
        edge effects. Serving micro-batcher entry point (the /v1/audio/
        lid endpoint groups concurrent requests here)."""
        clips = [np.asarray(w, np.float32).reshape(-1) for w in waveforms]
        out: list[LIDOutput | None] = [None] * len(clips)
        groups: dict[int, list[int]] = {}
        for i, c in enumerate(clips):
            bucket = next((b for b in self._LEN_BUCKETS if len(c) <= b),
                          None)
            if bucket is None:  # beyond the largest bucket: solo graph
                out[i] = self.predict(c, top_k)
            else:
                groups.setdefault(bucket, []).append(i)
        for bucket, idxs in groups.items():
            bb = 1
            while bb < len(idxs):
                bb *= 2
            audio = np.zeros((bb, bucket), np.float32)
            n_frames = np.ones((bb,), np.int32)
            for row, i in enumerate(idxs):
                c = clips[i]
                audio[row, : len(c)] = c
                n_frames[row] = 1 + len(c) // 160
            probs = np.asarray(self._predict_batch_jit(
                self.params, jnp.asarray(audio), jnp.asarray(n_frames)))
            for row, i in enumerate(idxs):
                out[i] = self._to_output(probs[row], top_k)
        return out  # type: ignore[return-value]
