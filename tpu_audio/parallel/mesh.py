"""Device mesh + parameter sharding utilities.

The reference is single-device (SURVEY.md §2.0: no DP/TP/PP anywhere), so
this layer is *new TPU-native surface*: batch-parallel serving and
tensor-parallel large-model inference via ``jax.sharding`` over an ICI mesh.
Shardings are declared as regex rules over parameter paths; XLA GSPMD inserts
the collectives.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_audio.core import loading

__all__ = ["make_mesh", "ShardingRules", "shard_params", "data_sharding"]


def make_mesh(n_devices: int | None = None,
              axes: tuple[str, ...] = ("data", "model"),
              shape: tuple[int, ...] | None = None) -> Mesh:
    """Create a mesh over the available devices. With no explicit shape the
    model axis gets the largest power-of-two divisor <= 4 and data gets the
    rest — a sensible default for small audio models."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if shape is None:
        if len(axes) == 1:
            shape = (n,)
        else:
            model = 1
            for cand in (4, 2, 1):
                if n % cand == 0:
                    model = cand
                    break
            shape = (n // model, model)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


@dataclass
class ShardingRules:
    """Ordered (regex, PartitionSpec) rules mapped over flattened param
    paths; first match wins, default is full replication."""

    rules: list[tuple[str, P]] = field(default_factory=list)

    def spec_for(self, path: str, ndim: int) -> P:
        for pattern, spec in self.rules:
            if re.search(pattern, path):
                if len(spec) <= ndim:
                    # right-align so leading dims replicate — a stacked
                    # layer axis [L, O, I] keeps O/I sharding from a 2D rule
                    return P(*((None,) * (ndim - len(spec)) + tuple(spec)))
        return P()


# Megatron-style rules for transformer blocks: column-parallel QKV/fc1,
# row-parallel out/fc2, vocab-parallel embedding.
TRANSFORMER_TP_RULES = ShardingRules([
    (r"(q_proj|k_proj|v_proj|qkv_proj)\.weight$", P("model", None)),
    (r"(q_proj|k_proj|v_proj|qkv_proj)\.bias$", P("model")),
    (r"gate_up_proj\.weight$", P("model", None)),
    (r"(out_proj|o_proj)\.weight$", P(None, "model")),
    (r"(fc1|up_proj|gate_proj)\.weight$", P("model", None)),
    (r"(fc1|up_proj|gate_proj)\.bias$", P("model")),
    (r"(fc2|down_proj)\.weight$", P(None, "model")),
    (r"embed_tokens\.weight$", P("model", None)),
    (r"lm_head\.weight$", P("model", None)),
])


def shard_params(params: dict, mesh: Mesh,
                 rules: ShardingRules = TRANSFORMER_TP_RULES,
                 stats: dict | None = None) -> dict:
    """Place a param tree on the mesh according to the rules (unmatched or
    indivisible leaves replicate). Pass ``stats`` (a dict) to receive
    ``{"sharded": n, "replicated": n}`` counts so callers can detect a
    silently-all-replicated model (e.g. a tp degree that divides nothing)."""
    flat = loading.flatten(params)
    placed = {}
    n_sharded = n_replicated = 0
    for path, leaf in flat.items():
        spec = rules.spec_for(path, getattr(leaf, "ndim", 0))
        # replicate when the sharded dim does not divide evenly
        ok = True
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            size = mesh.shape[axis] if isinstance(axis, str) else 1
            if leaf.shape[dim] % size != 0:
                ok = False
        if not ok:
            spec = P()
        if any(a is not None for a in spec):
            n_sharded += 1
        else:
            n_replicated += 1
        placed[path] = jax.device_put(leaf, NamedSharding(mesh, spec))
    if stats is not None:
        stats["sharded"] = n_sharded
        stats["replicated"] = n_replicated
    return loading.unflatten(placed)


def data_sharding(mesh: Mesh, *batch_axes: str) -> NamedSharding:
    axis = batch_axes[0] if batch_axes else "data"
    return NamedSharding(mesh, P(axis))
