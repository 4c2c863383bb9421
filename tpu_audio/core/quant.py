"""MLX-format grouped affine quantization: unpack/dequantize and
quantized-matmul application.

The reference ecosystem ships 4/8-bit checkpoints in MLX ``quantize()``
layout (consumed at e.g. LlamaTTS.swift:959-969, WhisperModel.swift:499-511):
for a weight ``[out, in]`` with ``group_size`` g and ``bits`` b,

- ``weight``: uint32 ``[out, in * b / 32]`` — ``32/b`` consecutive input-dim
  elements packed per uint32, least-significant bits first
- ``scales``: ``[out, in / g]``
- ``biases``: ``[out, in / g]``

and ``w[o, i] = scales[o, i // g] * q[o, i] + biases[o, i // g]``.

On TPU we keep the packed weights in HBM and dequantize on the fly inside the
jitted matmul — for memory-bound AR decode this reads 4-8x less HBM than a
bf16 weight, which is a win, and XLA fuses the unpack+affine into the matmul
producer.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "dequantize",
    "dequantize_tree",
    "quantize",
    "quantize_jax",
    "quantize_tree",
    "quantized_matmul",
    "quantized_matmul_qt",
    "Int8Tensor",
    "quantize_int8_jax",
    "int8_matmul",
    "is_quantized",
    "QuantizedTensor",
    "slice_rows",
    "tag_quantized",
]

import jax


@jax.tree_util.register_pytree_node_class
class QuantizedTensor:
    """Packed quantized weight with *static* group_size/bits metadata, so the
    config never leaks into jit traces as a tracer."""

    __slots__ = ("weight", "scales", "biases", "scales_w", "group_size",
                 "bits")

    def __init__(self, weight, scales, biases, scales_w=None,
                 group_size: int = 64, bits: int = 4):
        self.weight = weight
        self.scales = scales
        self.biases = biases
        # optional precomputed bf16 per-word scale planes ([..., O, words]);
        # lets the Pallas GEMV skip the per-call scale expansion in decode
        # loops (ops/pallas_qmm.py)
        self.scales_w = scales_w
        self.group_size = int(group_size)
        self.bits = int(bits)

    def tree_flatten(self):
        return ((self.weight, self.scales, self.biases, self.scales_w),
                (self.group_size, self.bits))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def with_word_scales(self) -> "QuantizedTensor":
        """Copy with ``scales_w`` precomputed (bf16) for decode loops."""
        from tpu_audio.ops.pallas_qmm import expand_word_scales

        sw = expand_word_scales(self.scales, self.group_size, self.bits)
        return QuantizedTensor(self.weight, self.scales, self.biases, sw,
                               self.group_size, self.bits)

    def dequantize(self, dtype=jnp.float32):
        return dequantize(self.weight, self.scales, self.biases,
                          self.group_size, self.bits, dtype)


@jax.tree_util.register_pytree_node_class
class Int8Tensor:
    """Per-channel symmetric int8 weight for the MXU's native s8xs8->s32
    matmul path (w8a8).

    On TPU v5e the grouped-affine 4/8-bit kernels are VPU-bound on the
    in-kernel dequantize (~4 vector ops per weight ≈ 3 ms/token on a 3B
    model — measured), while an int8 weight fed straight to the MXU with
    dynamically quantized activations does ZERO per-weight vector work:
    decode becomes purely HBM-bound at 1 byte/weight. This is the
    deployment quantization the TPU actually wants.
    """

    __slots__ = ("weight", "scale")

    def __init__(self, weight, scale):
        self.weight = weight  # int8 [..., O, I]
        self.scale = scale    # f32 [..., O]

    def tree_flatten(self):
        return (self.weight, self.scale), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def dequantize(self, dtype=jnp.float32):
        return (self.weight.astype(dtype)
                * self.scale[..., None].astype(dtype))


def quantize_int8_jax(w) -> Int8Tensor:
    """Per-output-channel symmetric int8 quantization (on-device)."""
    wf = jnp.asarray(w).astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-1) / 127.0
    scale = jnp.where(scale == 0, 1e-8, scale)
    q = jnp.clip(jnp.round(wf / scale[..., None]), -127, 127).astype(jnp.int8)
    return Int8Tensor(q, scale)


def int8_matmul(x: jnp.ndarray, t: Int8Tensor) -> jnp.ndarray:
    """``x @ W.T`` with dynamic per-row int8 activation quantization and
    an s8xs8->s32 MXU dot. Output dtype follows ``x``.

    Rows are padded to >=8: XLA lowers an M=1 int8 dot to a VPU
    multiply-reduce (3 vector ops/weight — measured 6.0 ms/token on an
    Orpheus-3B decode), but M>=8 emits the native s8xs8 MXU convolution
    with zero per-weight vector work. The padded rows are free — the op
    is HBM-bound on the 1-byte weight reads either way."""
    lead = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    rows = xf.shape[0]
    xs = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    xs = jnp.maximum(xs, 1e-12)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    if rows < 8:
        xq = jnp.zeros((8, xq.shape[1]), jnp.int8).at[:rows].set(xq)
    acc = jax.lax.dot_general(xq, t.weight, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)[:rows]
    y = acc.astype(jnp.float32) * (xs * t.scale[None, :])
    return y.reshape(*lead, t.weight.shape[0]).astype(x.dtype)


def slice_rows(p: dict, rows) -> dict:
    """Slice the output rows of a linear/head param dict (``{"weight": ...}``
    dense, :class:`QuantizedTensor` or :class:`Int8Tensor`), keeping the
    packed layout intact — every per-output plane (packed words, scales,
    biases, word-scale planes, int8 scale) shares the leading O axis."""
    rows = jnp.asarray(rows, jnp.int32)
    w = p["weight"]
    if isinstance(w, Int8Tensor):
        out = {"weight": Int8Tensor(w.weight[rows], w.scale[rows])}
    elif isinstance(w, QuantizedTensor):
        out = {"weight": QuantizedTensor(
            w.weight[rows], w.scales[rows], w.biases[rows],
            None if w.scales_w is None else w.scales_w[rows],
            w.group_size, w.bits)}
    else:
        out = {"weight": w[rows]}
    if "bias" in p:
        out["bias"] = p["bias"][rows]
    return out


def tag_quantized(params: dict, group_size: int = 64, bits: int = 4,
                  word_scales: bool | None = None) -> dict:
    """Walk a loaded param tree, folding ``{weight(uint32), scales, biases}``
    triples into :class:`QuantizedTensor` nodes under the ``weight`` key
    (any sibling linear ``bias`` is preserved).

    ``word_scales=None`` (auto) precomputes the bf16 per-word scale planes
    exactly when the Pallas quantized GEMV is active — the decode fast
    path — and skips the extra memory otherwise."""
    if word_scales is None:
        word_scales = _use_pallas_qmm()

    def walk(node):
        if not isinstance(node, dict):
            return node
        if (
            "scales" in node and "biases" in node and "weight" in node
            and hasattr(node["weight"], "dtype")
            and node["weight"].dtype == jnp.uint32
        ):
            qt = QuantizedTensor(
                node["weight"], node["scales"], node["biases"],
                group_size=group_size, bits=bits,
            )
            if word_scales:
                qt = qt.with_word_scales()
            new = {"weight": qt}
            if "bias" in node:
                new["bias"] = node["bias"]
            return new
        return {k: walk(v) for k, v in node.items()}

    return walk(params)


def dequantize_tree(params: dict, dtype=jnp.bfloat16) -> dict:
    """Expand every :class:`QuantizedTensor` leaf to a dense weight.

    The speed-optimal way to run quantized checkpoints on TPU today:
    per-step on-the-fly dequant reads fewer HBM bytes but XLA
    materializes the dense weight anyway (and the Pallas GEMV is
    launch-overhead-bound at decode shapes — see ops/pallas_qmm.py), so
    paying the expansion ONCE at load wins decode latency at the cost of
    full-precision memory footprint."""

    def walk(node):
        if isinstance(node, (QuantizedTensor, Int8Tensor)):
            return node.dequantize(dtype)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def is_quantized(p: dict) -> bool:
    if isinstance(p.get("weight"), QuantizedTensor):
        return True
    return (
        "scales" in p and "weight" in p
        and hasattr(p["weight"], "dtype") and p["weight"].dtype == jnp.uint32
    )


def _unpack(w_packed, bits: int):
    """uint32 [..., out, in*b/32] -> unsigned values [..., out, in]
    (LSB-first within each word)."""
    per_word = 32 // bits
    shifts = jnp.arange(per_word, dtype=jnp.uint32) * bits
    # [..., out, words, per_word]
    vals = (w_packed[..., None] >> shifts) & jnp.uint32((1 << bits) - 1)
    return vals.reshape(*w_packed.shape[:-1], w_packed.shape[-1] * per_word)


def dequantize(
    w_packed: jnp.ndarray,
    scales: jnp.ndarray,
    biases: jnp.ndarray,
    group_size: int = 64,
    bits: int = 4,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Packed uint32 + scales/biases -> dense [..., out, in] weight
    (leading dims pass through, e.g. stacked scan-over-layers [L, O, I])."""
    *lead, out_features, words = w_packed.shape
    in_features = words * (32 // bits)
    q = _unpack(w_packed, bits).astype(dtype)
    n_groups = in_features // group_size
    q = q.reshape(*lead, out_features, n_groups, group_size)
    w = q * scales[..., None].astype(dtype) + biases[..., None].astype(dtype)
    return w.reshape(*lead, out_features, in_features)


def _use_pallas_qmm() -> bool:
    import os

    if os.environ.get("TPU_AUDIO_PALLAS") != "1":
        return False
    try:
        import jax

        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def quantized_matmul(
    x: jnp.ndarray,
    w_packed: jnp.ndarray,
    scales: jnp.ndarray,
    biases: jnp.ndarray,
    group_size: int = 64,
    bits: int = 4,
    scales_w: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """``x @ W.T`` with on-the-fly dequantization (W stays packed in HBM).

    Decode-shaped calls (<=64 rows) route to the fused Pallas GEMV when
    ``TPU_AUDIO_PALLAS=1`` (ops/pallas_qmm.py) — the XLA path
    materializes the dequantized weight, which costs more than the
    packed reads save. Pass ``scales_w`` (precomputed bf16 word-scale
    planes, see ``QuantizedTensor.with_word_scales``) to keep the
    kernel's scale reads at 0.25 B/weight inside decode loops."""
    lead = x.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    if rows <= 64 and _use_pallas_qmm():
        from tpu_audio.ops.pallas_qmm import quantized_matvec

        y = quantized_matvec(x.reshape(rows, x.shape[-1]), w_packed,
                             scales, biases, group_size, bits,
                             scales_w=scales_w)
        return y.reshape(*lead, w_packed.shape[0])
    w = dequantize(w_packed, scales, biases, group_size, bits, dtype=x.dtype)
    return x @ w.T


def quantized_matmul_qt(x: jnp.ndarray, qt: "QuantizedTensor") -> jnp.ndarray:
    """`quantized_matmul` over a :class:`QuantizedTensor` leaf."""
    return quantized_matmul(x, qt.weight, qt.scales, qt.biases,
                            qt.group_size, qt.bits, scales_w=qt.scales_w)


def quantize_jax(w, group_size: int = 64, bits: int = 4):
    """On-device MLX-compatible quantizer (same affine scheme as
    :func:`quantize`): for device-resident weights this avoids pulling
    them to host and re-uploading packed tensors — on tunneled TPU
    backends host<->device transfers of GB-scale trees take minutes.

    Accepts [O, I] or stacked [L, O, I]; returns (packed, scales, biases)
    jnp arrays with the same leading dims.
    """
    w = w.astype(jnp.float32)
    *lead, o, i = w.shape
    assert i % group_size == 0
    n_levels = (1 << bits) - 1
    per_word = 32 // bits
    g = w.reshape(*lead, o, i // group_size, group_size)
    w_min = g.min(-1)
    w_max = g.max(-1)
    scales = (w_max - w_min) / n_levels
    scales = jnp.where(scales == 0, 1e-8, scales)
    q = jnp.clip(jnp.round((g - w_min[..., None]) / scales[..., None]),
                 0, n_levels).astype(jnp.uint32)
    q = q.reshape(*lead, o, i // per_word, per_word)
    shifts = (jnp.arange(per_word, dtype=jnp.uint32) * bits)
    # nibble planes occupy disjoint bits, so sum == bitwise-or
    packed = (q << shifts).sum(axis=-1, dtype=jnp.uint32)
    return packed, scales, w_min


def quantize_tree(params, group_size: int = 64, bits: int = 4,
                  min_in_features: int = 256,
                  word_scales: bool | None = None,
                  scheme: str = "mlx"):
    """Quantize every eligible 2-D/stacked-3-D float weight leaf of a param
    tree (one-time load cost).

    The TPU analog of the reference's post-load ``quantize(model:filter:)``
    (WhisperModel.swift:499-511, LlamaTTS.swift:959-969) for checkpoints
    that ship full-precision: norms, biases and small/ragged weights stay
    dense; stacked scan-over-layers leaves ([L, O, I]) quantize per layer.

    ``scheme="mlx"``: grouped-affine :class:`QuantizedTensor` (MLX
    checkpoint-compatible; ``word_scales`` precomputes the bf16 scale
    planes for the Pallas GEMV). ``scheme="w8a8"``: per-channel
    :class:`Int8Tensor` for the native int8 MXU path — the fastest
    decode on TPU (``bits`` is ignored).

    ``word_scales=None`` (auto) precomputes bf16 per-word scale planes
    exactly when the Pallas GEMV is active, like ``tag_quantized``.
    """
    if word_scales is None:
        word_scales = _use_pallas_qmm()

    def walk(node, name="", in_layers=False):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (k == "weight" and not isinstance(v, QuantizedTensor)
                        and "norm" not in name.lower()
                        and not name.lower().startswith("ln")
                        and "position" not in name.lower()
                        and "pos_emb" not in name.lower()
                        and "conv" not in name.lower()
                        and hasattr(v, "dtype")
                        and jnp.issubdtype(v.dtype, jnp.floating)
                        # 3-D is only the stacked [L, O, I] per-layer layout
                        # under a "layers" container; a conv-style 3-D
                        # weight elsewhere must stay dense (nn.conv* cannot
                        # consume QuantizedTensor leaves)
                        and (v.ndim == 2 or (v.ndim == 3 and in_layers))
                        and v.shape[-1] % group_size == 0
                        and v.shape[-1] >= min_in_features):
                    if scheme == "w8a8":
                        if isinstance(v, jnp.ndarray) and v.ndim == 3:
                            # per-layer: bounds the f32 workspace on
                            # stacked GB-scale tensors
                            parts = [quantize_int8_jax(v[l])
                                     for l in range(v.shape[0])]
                            out[k] = Int8Tensor(
                                jnp.stack([p.weight for p in parts]),
                                jnp.stack([p.scale for p in parts]))
                        else:
                            out[k] = quantize_int8_jax(v)
                        continue
                    if isinstance(v, jnp.ndarray):
                        # device path; stacked [L, O, I] per-layer to keep
                        # the f32 workspace bounded
                        if v.ndim == 3:
                            parts = [quantize_jax(v[l], group_size, bits)
                                     for l in range(v.shape[0])]
                            packed = jnp.stack([p[0] for p in parts])
                            scales = jnp.stack([p[1] for p in parts])
                            biases = jnp.stack([p[2] for p in parts])
                        else:
                            packed, scales, biases = quantize_jax(
                                v, group_size, bits)
                    else:
                        host = np.asarray(v, np.float32)
                        shape = host.shape
                        packed, scales, biases = quantize(
                            host.reshape(-1, shape[-1]), group_size, bits)
                        per_word = 32 // bits
                        packed = jnp.asarray(packed.reshape(
                            *shape[:-1], shape[-1] // per_word))
                        scales = jnp.asarray(scales.reshape(
                            *shape[:-1], shape[-1] // group_size))
                        biases = jnp.asarray(biases.reshape(
                            *shape[:-1], shape[-1] // group_size))
                    qt = QuantizedTensor(
                        packed, scales, biases,
                        group_size=group_size, bits=bits)
                    if word_scales:
                        qt = qt.with_word_scales()
                    out[k] = qt
                else:
                    out[k] = walk(v, k, in_layers or k == "layers")
            return out
        return node

    return walk(params)


def quantize(
    w: np.ndarray, group_size: int = 64, bits: int = 4
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side MLX-compatible quantizer (for tests/fixtures).

    Per group: scale = (max - min) / (2^b - 1), bias = min, rounding to the
    nearest level — the affine scheme MLX's ``quantize()`` uses.
    """
    w = np.asarray(w, np.float32)
    out_features, in_features = w.shape
    assert in_features % group_size == 0
    n_groups = in_features // group_size
    g = w.reshape(out_features, n_groups, group_size)
    w_min = g.min(axis=-1)
    w_max = g.max(axis=-1)
    n_levels = (1 << bits) - 1
    scales = (w_max - w_min) / n_levels
    scales = np.where(scales == 0, 1e-8, scales)
    biases = w_min
    q = np.clip(np.round((g - biases[..., None]) / scales[..., None]), 0, n_levels)
    q = q.astype(np.uint32).reshape(out_features, in_features)

    per_word = 32 // bits
    q = q.reshape(out_features, in_features // per_word, per_word)
    shifts = (np.arange(per_word, dtype=np.uint32) * bits)[None, None, :]
    packed = np.bitwise_or.reduce(q << shifts, axis=-1).astype(np.uint32)
    return packed, scales.astype(np.float32), biases.astype(np.float32)
