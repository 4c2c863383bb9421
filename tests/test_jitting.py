"""axon-safe jit (const hoisting) tests: numerical equivalence with jax.jit
across the call patterns used in the repo, and the const-free-executable
guarantee itself."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.core.jitting import ajit


W = np.arange(12, dtype=np.float32).reshape(3, 4)
B_dev = jnp.asarray(np.arange(4, dtype=np.float32))


def test_closure_const_correctness():
    f = lambda x: x @ jnp.asarray(W) + B_dev
    x = jnp.ones((2, 3))
    np.testing.assert_allclose(np.asarray(ajit(f)(x)),
                               np.asarray(jax.jit(f)(x)))


def test_device_consts_hoisted_numpy_inlined():
    # device-array closure -> hoisted to a runtime argument (embedding it
    # would trigger a device->host fetch at lowering)
    dev = jnp.asarray(W) + 0  # committed device array
    f = ajit(lambda x: (x @ dev) + B_dev)
    x = jnp.ones((2, 3))
    f(x)
    (jf, consts, _), = f._cache.values()
    assert len(consts) == 2
    assert {tuple(c.shape) for c in consts} == {(3, 4), (4,)}
    # numpy closure -> stays inlined as a literal so XLA can constant-fold
    g = ajit(lambda x: x @ W)
    g(x)
    (jg, gconsts, _), = g._cache.values()
    assert gconsts == []
    np.testing.assert_allclose(np.asarray(g(x)), np.ones((2, 3)) @ W)


def test_static_argnames_kw_and_positional():
    def f(x, n, scale=2.0):
        return jnp.tile(x, n) * scale

    g = ajit(f, static_argnames=("n",))
    x = jnp.arange(3.0)
    np.testing.assert_allclose(np.asarray(g(x, n=2)), np.tile(np.arange(3.0), 2) * 2)
    # positional static arg is caught via the signature
    np.testing.assert_allclose(np.asarray(g(x, 3)), np.tile(np.arange(3.0), 3) * 2)
    assert len(g._cache) == 2  # one entry per static value


def test_static_argnums():
    def f(x, n):
        return x.reshape(n, -1).sum(0)

    g = ajit(f, static_argnums=(1,))
    x = jnp.arange(12.0)
    np.testing.assert_allclose(np.asarray(g(x, 3)),
                               np.arange(12.0).reshape(3, 4).sum(0))


def test_pytree_inputs_outputs():
    def f(params, batch):
        y = batch["x"] @ params["w"] + params["b"]
        return {"y": y, "stats": (y.sum(), y.max())}

    params = {"w": jnp.ones((3, 2)), "b": jnp.zeros((2,))}
    batch = {"x": jnp.ones((4, 3))}
    out = ajit(f)(params, batch)
    ref = jax.jit(f)(params, batch)
    np.testing.assert_allclose(np.asarray(out["y"]), np.asarray(ref["y"]))
    assert float(out["stats"][0]) == float(ref["stats"][0])


def test_scan_with_array_const_inside():
    table = np.linspace(0, 1, 5).astype(np.float32)

    def f(x):
        def step(c, t):
            return c + t * jnp.asarray(table).sum(), c
        return jax.lax.scan(step, x, jnp.arange(4.0))

    x = jnp.float32(1.0)
    out = ajit(f)(x)
    ref = jax.jit(f)(x)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]))
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]))


def test_nested_jit_with_consts():
    inner = jax.jit(lambda x: x * jnp.asarray(W).sum())

    def f(x):
        return inner(x) + 1.0

    x = jnp.ones((2,))
    np.testing.assert_allclose(np.asarray(ajit(f)(x)),
                               np.asarray(jax.jit(f)(x)))


def test_decorator_partial_form():
    @functools.partial(ajit, static_argnames=("k",))
    def topk_sum(x, k):
        return jax.lax.top_k(x, k)[0].sum()

    x = jnp.asarray([3.0, 1.0, 2.0])
    assert float(topk_sum(x, k=2)) == 5.0


def test_donate_argnums_runs():
    @functools.partial(ajit, donate_argnums=(1,))
    def update(delta, state):
        return jax.tree.map(lambda s: s + delta, state)

    state = {"a": jnp.zeros((8,)), "b": jnp.ones((4,))}
    out = update(jnp.float32(2.0), state)
    np.testing.assert_allclose(np.asarray(out["a"]), 2.0)
    np.testing.assert_allclose(np.asarray(out["b"]), 3.0)


def test_cache_reuse_same_signature():
    calls = []

    def f(x):
        calls.append(1)
        return x * 2

    g = ajit(f)
    g(jnp.ones((3,)))
    g(jnp.ones((3,)) * 5)
    assert len(g._cache) == 1
    # traced once for make_jaxpr (the jitted eval_jaxpr does not re-call f)
    assert len(calls) == 1
    g(jnp.ones((4,)))
    assert len(g._cache) == 2


def test_python_scalar_args_not_baked():
    g = ajit(lambda x, s: x * s)
    a = jnp.ones((2,))
    assert float(g(a, 2.0)[0]) == 2.0
    assert float(g(a, 7.0)[0]) == 7.0
    assert len(g._cache) == 1


def test_fallback_env(monkeypatch):
    monkeypatch.setenv("TPU_AUDIO_NO_CONST_HOIST", "1")
    g = ajit(lambda x: x + jnp.asarray(W).sum())
    out = g(jnp.zeros((1,)))
    assert float(out[0]) == float(W.sum())
    assert not g._cache  # plain jax.jit path
