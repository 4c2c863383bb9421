"""Pallas TPU kernel: fused mel projection (power spectrum -> mel matmul ->
log10) in one VMEM pass.

The mel frontend's hot path after the rfft is ``|S|^2 @ filters`` followed by
``log10(max(., eps))`` — three XLA ops with two HBM-resident [T, F]/[T, M]
intermediates. This kernel fuses them: each grid step loads a frame tile of
the complex spectrum into VMEM, squares on the VPU, rides the MXU for the
filterbank matmul, and writes only the final log-mel tile. The global-max
clamp + (x+4)/4 normalization stay in XLA (they need a cross-tile max).

Opt-in via ``TPU_AUDIO_PALLAS=1``. Verified on-device (v5e, max err
6e-4 vs XLA at 30 s/128-mel whisper shapes) at performance parity —
XLA already fuses this chain well, so the XLA path stays the default;
the kernel is the template for frontends XLA fuses poorly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from tpu_audio.core.jitting import ajit

__all__ = ["fused_log_mel", "is_tpu"]


def is_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon") or \
            "TPU" in str(jax.devices()[0])
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(re_ref, im_ref, fb_ref, out_ref):
    re = re_ref[:]
    im = im_ref[:]
    power = re * re + im * im  # VPU
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32)  # MXU
    out_ref[:] = jnp.log10(jnp.maximum(mel, 1e-10))


@functools.partial(ajit, static_argnames=("tile_t",))
def fused_log_mel(spec_re: jnp.ndarray, spec_im: jnp.ndarray,
                  filters: jnp.ndarray, tile_t: int = 256) -> jnp.ndarray:
    """``log10(max(|S|^2 @ filters, 1e-10))`` fused.

    spec_re/spec_im: [T, F] float32; filters: [F, M]. Returns [T, M].
    T/F/M are zero-padded to TPU tile multiples internally (zero rows
    produce log10(1e-10) entries, cropped before return).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, f = spec_re.shape
    m = filters.shape[1]
    t_pad = _round_up(max(t, 8), tile_t)
    f_pad = _round_up(f, 128)
    m_pad = _round_up(m, 128)

    re = jnp.zeros((t_pad, f_pad), jnp.float32).at[:t, :f].set(spec_re)
    im = jnp.zeros((t_pad, f_pad), jnp.float32).at[:t, :f].set(spec_im)
    fb = jnp.zeros((f_pad, m_pad), jnp.float32).at[:f, :m].set(filters)

    grid = (t_pad // tile_t,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_t, f_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, f_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, m_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_t, m_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, m_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * f_pad * m_pad + 3 * t_pad * f_pad,
            bytes_accessed=4 * (2 * t_pad * f_pad + f_pad * m_pad
                                + t_pad * m_pad),
            transcendentals=t_pad * m_pad,
        ),
    )(re, im, fb)
    return out[:t, :m]
