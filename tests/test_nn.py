"""Layer golden tests vs torch (the reference's numerics source of truth)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tpu_audio.core import nn


def _r(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_linear_matches_torch():
    x, w, b = _r(2, 5, 16), _r(32, 16, seed=1), _r(32, seed=2)
    got = np.asarray(nn.linear({"weight": jnp.asarray(w), "bias": jnp.asarray(b)}, jnp.asarray(x)))
    want = F.linear(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("stride,padding,dilation,groups", [
    (1, 0, 1, 1), (2, 3, 1, 1), (1, 2, 2, 1), (1, 1, 1, 4),
])
def test_conv1d_matches_torch(stride, padding, dilation, groups):
    cin, cout, k = 8, 16, 5
    x = _r(2, 50, cin)
    w = _r(cout, cin // groups, k, seed=1)
    b = _r(cout, seed=2)
    got = np.asarray(nn.conv1d(
        {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}, jnp.asarray(x),
        stride=stride, padding=padding, dilation=dilation, groups=groups))
    want = F.conv1d(torch.from_numpy(x).transpose(1, 2), torch.from_numpy(w),
                    torch.from_numpy(b), stride=stride, padding=padding,
                    dilation=dilation, groups=groups).transpose(1, 2).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("stride,padding,output_padding,groups", [
    (1, 0, 0, 1), (2, 1, 0, 1), (4, 2, 0, 1), (8, 4, 0, 1), (2, 1, 1, 1), (2, 0, 0, 2),
])
def test_conv_transpose1d_matches_torch(stride, padding, output_padding, groups):
    cin, cout, k = 8, 16, 2 * stride if stride > 1 else 5
    x = _r(2, 30, cin)
    w = _r(cin, cout // groups, k, seed=1)
    b = _r(cout, seed=2)
    got = np.asarray(nn.conv_transpose1d(
        {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}, jnp.asarray(x),
        stride=stride, padding=padding, output_padding=output_padding, groups=groups))
    want = F.conv_transpose1d(torch.from_numpy(x).transpose(1, 2), torch.from_numpy(w),
                              torch.from_numpy(b), stride=stride, padding=padding,
                              output_padding=output_padding, groups=groups
                              ).transpose(1, 2).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv2d_matches_torch():
    x = _r(2, 20, 18, 3)
    w = _r(8, 3, 3, 3, seed=1)
    b = _r(8, seed=2)
    got = np.asarray(nn.conv2d({"weight": jnp.asarray(w), "bias": jnp.asarray(b)},
                               jnp.asarray(x), stride=(2, 2), padding=(1, 1)))
    want = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w),
                    torch.from_numpy(b), stride=2, padding=1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_norms_match_torch():
    x = _r(2, 7, 24)
    w, b = _r(24, seed=1), _r(24, seed=2)
    got = np.asarray(nn.layer_norm({"weight": jnp.asarray(w), "bias": jnp.asarray(b)}, jnp.asarray(x)))
    want = F.layer_norm(torch.from_numpy(x), (24,), torch.from_numpy(w), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)

    got = np.asarray(nn.rms_norm({"weight": jnp.asarray(w)}, jnp.asarray(x), eps=1e-6))
    xt = torch.from_numpy(x)
    want = (xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-6) * torch.from_numpy(w)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)

    got = np.asarray(nn.group_norm({"weight": jnp.asarray(w), "bias": jnp.asarray(b)},
                                   jnp.asarray(x), num_groups=4))
    want = F.group_norm(torch.from_numpy(x).transpose(1, 2), 4, torch.from_numpy(w),
                        torch.from_numpy(b)).transpose(1, 2).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sdpa_matches_torch():
    q, k, v = _r(2, 4, 9, 16), _r(2, 4, 9, 16, seed=1), _r(2, 4, 9, 16, seed=2)
    got = np.asarray(nn.sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), is_causal=True))
    want = F.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v), is_causal=True
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sdpa_gqa():
    q = _r(1, 8, 5, 16)
    k, v = _r(1, 2, 5, 16, seed=1), _r(1, 2, 5, 16, seed=2)
    got = np.asarray(nn.sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), is_causal=True))
    want = F.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
        is_causal=True, enable_gqa=True).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_lstm_matches_torch():
    tl = torch.nn.LSTM(12, 20, batch_first=True)
    x = _r(3, 15, 12)
    p = {k: jnp.asarray(v.detach().numpy()) for k, v in tl.named_parameters()}
    got, (h, c) = nn.lstm(p, jnp.asarray(x))
    want, (ht, ct) = tl(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), ht[0].detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), ct[0].detach().numpy(), atol=1e-5)


def test_gru_matches_torch():
    tg = torch.nn.GRU(10, 14, batch_first=True)
    x = _r(2, 12, 10)
    p = {k: jnp.asarray(v.detach().numpy()) for k, v in tg.named_parameters()}
    got, h = nn.gru(p, jnp.asarray(x))
    want, ht = tg(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=1e-5)


def test_rope_matches_torch_llama():
    """Half-split RoPE vs a direct implementation of HF Llama's apply_rotary_pos_emb."""
    b, h, s, d = 1, 2, 6, 8
    x = _r(b, h, s, d)
    pos = np.arange(s)
    inv = 1.0 / (10000.0 ** (np.arange(0, d, 2) / d))
    ang = pos[:, None] * inv[None, :]
    cos_full = np.cos(np.concatenate([ang, ang], -1))
    sin_full = np.sin(np.concatenate([ang, ang], -1))

    def rotate_half(t):
        x1, x2 = np.split(t, 2, axis=-1)
        return np.concatenate([-x2, x1], -1)

    want = x * cos_full[None, None] + rotate_half(x) * sin_full[None, None]
    cos, sin = nn.rope(jnp.arange(s), d)
    got = np.asarray(nn.apply_rope(jnp.asarray(x), cos, sin))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_snake_activation():
    x = _r(2, 10, 4)
    a = np.abs(_r(4, seed=3)) + 0.5
    got = np.asarray(nn.snake(jnp.asarray(x), jnp.asarray(a)))
    want = x + np.sin(a * x) ** 2 / (a + 1e-9)
    np.testing.assert_allclose(got, want, atol=1e-5)
