"""Batch-parallel inference over a device mesh.

New TPU-native surface (the reference is single-device, SURVEY.md §2.0):
shard a batch of utterances across the ``data`` axis of a
:func:`tpu_audio.parallel.mesh.make_mesh` mesh and run one jitted forward
per bucket — XLA GSPMD splits the batch over ICI with no code changes to
the model. Replicated parameters + batch-sharded activations is the
right layout for audio-sized models (each chip holds the full model;
collectives only gather the outputs).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_audio.parallel.mesh import make_mesh

__all__ = ["BatchServer"]


class BatchServer:
    """Data-parallel batch runner for a jittable ``fn(params, batch)``.

    >>> server = BatchServer(fn, params)        # mesh over all devices
    >>> out = server(np.stack(inputs))          # batch sharded over chips

    Batches are padded up to a multiple of the data-axis size (the pad
    rows are dropped from the output), so ragged request counts still map
    evenly onto the mesh.
    """

    def __init__(self, fn, params, mesh=None, data_axis: str = "data"):
        self.mesh = mesh if mesh is not None else make_mesh(axes=("data",))
        self.data_axis = data_axis
        self.n_data = self.mesh.shape[data_axis]
        self._batch_sharding = NamedSharding(self.mesh, P(data_axis))
        replicated = NamedSharding(self.mesh, P())
        self.params = jax.device_put(params, replicated)
        self._fn = jax.jit(
            fn,
            in_shardings=(replicated, self._batch_sharding),
            out_shardings=self._batch_sharding,
        )

    def __call__(self, batch: np.ndarray):
        """batch [B, ...] -> fn outputs [B, ...] with B restored to the
        caller's size after mesh padding."""
        b = batch.shape[0]
        pad = (-b) % self.n_data
        if pad:
            batch = np.concatenate(
                [batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)],
                axis=0)
        out = self._fn(self.params,
                       jax.device_put(batch, self._batch_sharding))
        return jax.tree.map(lambda x: x[:b], out)
