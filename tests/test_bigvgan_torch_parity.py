"""Golden parity of the BigVGAN vocoder vs the torch reference.

``transformers`` ships the NVIDIA BigVGAN generator as
``Qwen2_5OmniToken2WavBigVGANModel`` — the same architecture the repo's
``tpu_audio.codecs.bigvgan`` implements (reference BigVGAN.swift /
BigVGANLayers.swift): conv_pre -> [convT upsample -> mean of AMPBlock1s]*
-> anti-aliased SnakeBeta -> conv_post -> clamp. State-dict key names are
identical, so a seeded torch model pins the whole stack: kaiser-sinc
up/down anti-aliasing, log-scale SnakeBeta, dilated residual convs."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_audio.codecs.bigvgan import BigVGANConfig, forward


@pytest.fixture(scope="module")
def hf_bigvgan():
    import torch
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
        Qwen2_5OmniBigVGANConfig,
    )
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import (
        Qwen2_5OmniToken2WavBigVGANModel,
    )

    cfg = Qwen2_5OmniBigVGANConfig(
        mel_dim=8, upsample_initial_channel=16, upsample_rates=[4, 4],
        upsample_kernel_sizes=[8, 8], resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3, 5]])
    torch.manual_seed(11)
    hf = Qwen2_5OmniToken2WavBigVGANModel(cfg).eval()
    # snake alpha/beta init to zeros (exp(0)=1) — randomize so the
    # log-scale exponentiation and the anti-aliased activation actually
    # shape the output
    with torch.no_grad():
        for name, p in hf.named_parameters():
            if name.endswith((".alpha", ".beta")):
                p.copy_(torch.randn_like(p) * 0.3)
    ours = BigVGANConfig(
        num_mels=8, upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=16, resblock="1",
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3, 5),),
        activation="snakebeta", snake_logscale=True,
        use_tanh_at_final=False)
    return hf, ours


def _processed_mel(mel: np.ndarray) -> np.ndarray:
    """HF's process_mel_spectrogram (exp -> dB floor -115 -> -20 ->
    normalize to [-1, 1]) in numpy, [B, C, T] layout."""
    amp = np.exp(mel)
    min_level = np.exp(-115 / 20.0 * np.log(10.0))
    db = 20.0 * np.log10(np.maximum(amp, min_level)) - 20.0
    return np.clip(2.0 * ((db + 115.0) / 115.0) - 1.0, -1.0, 1.0)


def test_bigvgan_waveform_matches_torch(hf_bigvgan):
    import torch

    hf, cfg = hf_bigvgan
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((1, 8, 32)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.tensor(mel)).numpy()  # squeeze()d -> [samples]
    params = {k: v.numpy() for k, v in hf.state_dict().items()}
    from tpu_audio.core import loading

    tree = loading.unflatten(params)
    ours_in = jnp.asarray(_processed_mel(mel).transpose(0, 2, 1))
    got = np.asarray(forward(tree, ours_in, cfg))[0]
    assert got.shape == want.shape  # 32 frames * 16x upsample = 512
    np.testing.assert_allclose(got, want, atol=2e-4)
