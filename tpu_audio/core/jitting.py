"""axon-safe ``jit``: hoist jaxpr array constants into runtime arguments.

The axon TPU backend permanently drops the whole process into a
~30 ms-per-dispatch slow mode the first time it executes a compiled
program with an embedded array literal — i.e. any ``jax.jit`` function
that closes over a numpy/JAX array (mel filterbanks, STFT windows, index
tables, rotary caches...). Measured on TPU v5e via the axon tunnel:
a jitted ``x @ B`` with closure-captured ``B [160,402]`` costs 33 ms per
call vs 0.03 ms with ``B`` passed as an argument, and after one such call
EVERY subsequent dispatch in the process (const-free ones included) pays
the same 30 ms floor.

:func:`ajit` is a drop-in replacement for ``jax.jit`` that traces the
function to a jaxpr once per input signature, extracts its array consts,
commits them to device, and re-feeds them as ordinary runtime arguments
of a const-free executable. Scalar literals stay inline (they are jaxpr
``Literal``s, which do not trigger the slow mode).

Supported ``jax.jit`` features: ``static_argnums``, ``static_argnames``,
``donate_argnums`` (mapped onto the rewritten signature). Sharding
arguments are not supported — keep ``jax.jit`` for explicitly sharded
entry points. Set ``TPU_AUDIO_NO_CONST_HOIST=1`` to fall back to plain
``jax.jit`` everywhere.
"""

from __future__ import annotations

import functools
import inspect
import os

import jax
import numpy as np
from jax import core as jax_core
from jax import tree_util

__all__ = ["ajit"]


def _no_hoist() -> bool:
    return os.environ.get("TPU_AUDIO_NO_CONST_HOIST", "") == "1"


def _aval_key(leaf):
    """Hashable signature of one argument leaf (shape/dtype/weak_type)."""
    aval = jax.api_util.shaped_abstractify(leaf)
    return (aval.shape, str(aval.dtype), getattr(aval, "weak_type", False))


class _AjitFunction:
    def __init__(self, fun, static_argnums, static_argnames, donate_argnums):
        functools.update_wrapper(self, fun)
        self._fun = fun
        self._static_argnums = tuple(static_argnums or ())
        self._static_argnames = tuple(static_argnames or ())
        self._donate_argnums = tuple(donate_argnums or ())
        self._cache: dict = {}
        self._fallback = None
        try:
            self._sig = inspect.signature(fun)
        except (TypeError, ValueError):  # builtins / C callables
            self._sig = None

    # -- fallback ---------------------------------------------------------------

    def _jax_jit(self):
        if self._fallback is None:
            self._fallback = jax.jit(
                self._fun,
                static_argnums=self._static_argnums or None,
                static_argnames=self._static_argnames or None,
                donate_argnums=self._donate_argnums or None,
            )
        return self._fallback

    # -- static/dynamic split ---------------------------------------------------

    def _split(self, args, kwargs):
        """-> (static_key, dyn_args list, dyn_positions, dyn_kwargs dict)."""
        static_nums = set(self._static_argnums)
        static_names = set(self._static_argnames)
        if static_names and self._sig is not None:
            # map names to positional indices so positionally-passed static
            # args are caught (jax.jit semantics)
            params = list(self._sig.parameters)
            for name in static_names:
                if name in params:
                    static_nums.add(params.index(name))
        statics = []
        dyn_args, dyn_pos = [], []
        for i, a in enumerate(args):
            if i in static_nums:
                statics.append((i, a))
            else:
                dyn_args.append(a)
                dyn_pos.append(i)
        dyn_kwargs = {}
        for k, v in kwargs.items():
            if k in static_names:
                statics.append((k, v))
            else:
                dyn_kwargs[k] = v
        return tuple(statics), dyn_args, tuple(dyn_pos), dyn_kwargs

    # -- call -------------------------------------------------------------------

    def __call__(self, *args, **kwargs):
        if _no_hoist():
            return self._jax_jit()(*args, **kwargs)

        statics, dyn_args, dyn_pos, dyn_kwargs = self._split(args, kwargs)
        flat, treedef = tree_util.tree_flatten((tuple(dyn_args), dyn_kwargs))
        try:
            key = (statics, treedef, tuple(_aval_key(x) for x in flat))
            hash(key)
        except Exception:
            return self._jax_jit()(*args, **kwargs)

        entry = self._cache.get(key)
        if entry is None:
            entry = self._build(key, statics, dyn_pos, treedef, flat,
                                len(args), tuple(dyn_kwargs))
            self._cache[key] = entry
        jf, consts, out_tree = entry
        if jf is None:  # build failed once; permanent fallback for this key
            return self._jax_jit()(*args, **kwargs)
        out_flat = jf(consts, *flat)
        return tree_util.tree_unflatten(out_tree, out_flat)

    def _build(self, key, statics, dyn_pos, treedef, flat, n_args, kw_names):
        fun = self._fun
        static_by_pos = {i: v for i, v in statics if isinstance(i, int)}
        static_kw = {k: v for k, v in statics if isinstance(k, str)}

        def call_flat(*leaves):
            dyn_args, dyn_kwargs = tree_util.tree_unflatten(treedef, leaves)
            full = [None] * n_args
            for i, v in static_by_pos.items():
                full[i] = v
            for p, v in zip(dyn_pos, dyn_args):
                full[p] = v
            return fun(*full, **dyn_kwargs, **static_kw)

        try:
            closed, out_shape = jax.make_jaxpr(
                call_flat, return_shape=True)(*flat)
        except Exception:
            return (None, None, None)
        # Split consts: device arrays are hoisted to runtime arguments
        # (embedding them would fetch their VALUE to host at lowering —
        # the readback that permanently poisons the axon fast path);
        # host (numpy) consts stay closure-inlined as HLO literals so XLA
        # keeps constant-folding them (measurably faster, and literals
        # never require a device fetch).
        jaxpr = closed.jaxpr
        split = [(i, c) for i, c in enumerate(closed.consts)
                 if isinstance(c, jax.Array)]
        dev_idx = [i for i, _ in split]
        consts = [c for _, c in split]
        host_consts = [(i, c) for i, c in enumerate(closed.consts)
                       if i not in set(dev_idx)]
        out_tree = tree_util.tree_structure(out_shape)

        def run(dev_consts, *leaves):
            all_consts: list = [None] * (len(dev_consts) + len(host_consts))
            for slot, c in zip(dev_idx, dev_consts):
                all_consts[slot] = c
            for slot, c in host_consts:
                all_consts[slot] = c
            return jax_core.eval_jaxpr(jaxpr, all_consts, *leaves)

        donate = ()
        if self._donate_argnums:
            # original donated positions -> positions in the flattened leaf
            # argument list of `run` (offset +1 for the consts arg)
            donate = []
            offset = 1
            dyn_args_trees = tree_util.tree_unflatten(
                treedef, flat)[0]
            for p, arg in zip(dyn_pos, dyn_args_trees):
                n = len(tree_util.tree_leaves(arg))
                if p in self._donate_argnums:
                    donate.extend(range(offset, offset + n))
                offset += n
            donate = tuple(donate)
        jf = jax.jit(run, donate_argnums=donate or None)
        return (jf, consts, out_tree)


def ajit(fun=None, *, static_argnums=None, static_argnames=None,
         donate_argnums=None):
    """Drop-in ``jax.jit`` replacement that produces const-free executables
    (see module docstring). Usable as ``ajit(f)``, ``@ajit``, or
    ``@functools.partial(ajit, static_argnames=(...,))``."""
    if fun is None:
        return functools.partial(ajit, static_argnums=static_argnums,
                                 static_argnames=static_argnames,
                                 donate_argnums=donate_argnums)
    if isinstance(static_argnums, int):
        static_argnums = (static_argnums,)
    if isinstance(static_argnames, str):
        static_argnames = (static_argnames,)
    if isinstance(donate_argnums, int):
        donate_argnums = (donate_argnums,)
    return _AjitFunction(fun, static_argnums, static_argnames, donate_argnums)
