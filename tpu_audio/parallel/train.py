"""Sharded training step (dp x tp) for the flagship Whisper model.

The reference framework is inference-only; this exists so the TPU build can
fine-tune and so multi-chip shardings are exercised end-to-end: parameters
are tensor-parallel over the ``model`` mesh axis (Megatron-style rules in
``parallel.mesh``), the batch is data-parallel over ``data``, and XLA GSPMD
inserts the psum/all-gather collectives over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from tpu_audio.models.stt import whisper as W
from tpu_audio.core.jitting import ajit

__all__ = ["make_train_step", "cross_entropy_loss"]


def cross_entropy_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                       mask: jnp.ndarray | None = None) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if mask is not None:
        return (nll * mask).sum() / jnp.maximum(mask.sum(), 1)
    return nll.mean()


def make_train_step(cfg: W.WhisperConfig, optimizer: optax.GradientTransformation):
    """Returns a jittable ``(params, opt_state, batch, rng) -> (params,
    opt_state, loss)`` teacher-forced ASR training step. ``batch`` carries
    ``mel [B, 3000, n_mels]`` and ``tokens [B, T]``."""

    def loss_fn(params, batch):
        enc_out = W.encoder_forward(params, batch["mel"], cfg)
        logits = W.decoder_forward(params, batch["tokens"][:, :-1], enc_out, cfg)
        mask = (batch["tokens"][:, 1:] >= 0).astype(jnp.float32)
        targets = jnp.maximum(batch["tokens"][:, 1:], 0)
        return cross_entropy_loss(logits, targets, mask)

    @functools.partial(ajit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
