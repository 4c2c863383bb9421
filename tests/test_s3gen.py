"""S3Gen token2wav tests: mel frontend, CAMPPlus x-vectors, conformer
upsampling, DiT + U-Net flow matching, HiFT vocoder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_audio.codecs.s3gen import (
    ConformerConfig,
    HiFTConfig,
    S3Token2Mel,
    StepAudio2Prompt,
    StepAudio2Token2Wav,
    campplus_embed,
    conformer_encoder_forward,
    cosine_t_span,
    hift_forward,
    kaldi_fbank,
    s3gen_mel_spectrogram,
    sanitize_campplus,
    sanitize_flow,
    sanitize_hift,
)
from tpu_audio.core import loading

from fixtures import make_s3gen_fixture

TINY_CONFORMER = ConformerConfig(input_size=8, output_size=8,
                                 attention_heads=2, linear_units=16,
                                 num_blocks=1, num_up_blocks=1)
TINY_HIFT = HiFTConfig(
    in_channels=4, base_channels=8, nb_harmonics=2, sampling_rate=16000,
    upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4), n_fft=8,
    hop_len=2, resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    source_resblock_kernel_sizes=(3, 3),
    source_resblock_dilation_sizes=((1, 3), (1, 3)))
TINY_BLOCKS = ((2, 3, 1), (2, 3, 2))


@pytest.fixture(scope="module")
def dit_dir(tmp_path_factory):
    return make_s3gen_fixture(tmp_path_factory.mktemp("s3gen_dit"), "dit")


@pytest.fixture(scope="module")
def unet_dir(tmp_path_factory):
    return make_s3gen_fixture(tmp_path_factory.mktemp("s3gen_unet"), "unet")


def _load(path, name, sanitize):
    flat = loading.load_safetensors_file(path / name)
    return jax.tree.map(jnp.asarray, loading.unflatten(sanitize(flat)))


def test_mel_frontend():
    y = np.sin(np.arange(24000) / 30).astype(np.float32)
    mel = s3gen_mel_spectrogram(y)
    assert mel.shape == (24000 // 480, 80)  # 50 fps at 24 kHz
    assert mel.min() >= np.log(1e-5) - 1e-4


def test_kaldi_fbank():
    y = np.sin(np.arange(16000) / 20).astype(np.float32)
    fb = kaldi_fbank(y)
    assert fb.shape == ((16000 - 400) // 160 + 1, 80)
    assert np.isfinite(fb).all()


def test_campplus_embedding(dit_dir):
    p = _load(dit_dir, "campplus.safetensors", sanitize_campplus)
    y = np.sin(np.arange(8000) / 15).astype(np.float32)
    emb = np.asarray(campplus_embed(p, y, num_mels=8, blocks=TINY_BLOCKS))
    assert emb.shape == (1, 6)
    assert np.isfinite(emb).all()


def test_campplus_sanitize_turbo_keys():
    w = {"xvector.block2.tdnnd3.linear1.weight": np.zeros((2, 2, 1)),
         "xvector.transit1.linear.weight": np.zeros((2, 2, 1)),
         "xvector.tdnn.nonlinear.batchnorm.weight": np.zeros((2,)),
         "head.bn1.num_batches_tracked": np.zeros(())}
    out = sanitize_campplus(w)
    assert "blocks.1.layers.2.linear1.weight" in out
    assert "transits.0.linear.weight" in out
    assert "tdnn.nonlinear.0.weight" in out
    assert not any("num_batches" in k for k in out)


def test_conformer_upsamples_2x(dit_dir):
    p = _load(dit_dir, "flow.safetensors", sanitize_flow)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 6, 8)).astype(np.float32)) * 0.1
    out = conformer_encoder_forward(p["encoder"], x,
                                    jnp.asarray([6], jnp.int32),
                                    TINY_CONFORMER)
    assert out.shape == (1, 12, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_hift_vocoder(dit_dir):
    p = _load(dit_dir, "hift.safetensors", sanitize_hift)
    # sanitize wrapped bare conv keys
    assert "conv" in p["conv_pre"]
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 10, 4)).astype(np.float32)) * 0.1
    wav = np.asarray(hift_forward(p, mel, TINY_HIFT,
                                  jax.random.PRNGKey(0)))
    # total upsample = 2*2*hop(2) = 8x
    assert wav.shape == (1, 80)
    assert np.abs(wav).max() <= TINY_HIFT.audio_limit + 1e-6


def test_step_audio2_token2wav(dit_dir):
    model = StepAudio2Token2Wav.from_pretrained(str(dit_dir))
    model.conformer_cfg = TINY_CONFORMER
    model.hift_cfg = HiFTConfig(**{**TINY_HIFT.__dict__,
                                   "use_interpolation": True,
                                   "edge_pad": "repeat"})
    model._encode = jax.jit(lambda p, x, l: conformer_encoder_forward(
        p, x, l, TINY_CONFORMER))
    model._vocode = jax.jit(lambda p, m, rng: hift_forward(
        p, m, model.hift_cfg, rng))
    model.dit_depth, model.dit_heads, model.n_mels = 1, 2, 4
    model.vocab_size = 32
    prompt = StepAudio2Prompt(
        prompt_token=np.asarray([[1, 2, 3]], np.int32),
        prompt_feat=np.zeros((1, 6, 4), np.float32),
        embedding=np.ones((1, 6), np.float32))
    mel = model.decode_to_mel(np.asarray([4, 5, 6, 7], np.int32), prompt,
                              n_timesteps=2)
    # generated region: (3+4 tokens)*2 - 6 prompt mel = 8
    assert mel.shape == (1, 8, 4)
    wav = model.vocode(mel)
    assert wav.shape == (1, 8 * 8)
    assert np.isfinite(wav).all()


def test_s3_token2mel_unet(unet_dir):
    flow = _load(unet_dir, "flow.safetensors", sanitize_flow)
    hift = _load(unet_dir, "hift.safetensors", sanitize_hift)
    camp = _load(unet_dir, "campplus.safetensors", sanitize_campplus)
    params = dict(flow)
    params["mel2wav"] = hift
    params["speaker_encoder"] = camp
    model = S3Token2Mel(params, vocab_size=32, meanflow=True, n_mels=4,
                        unet_in_channels=16, conformer_cfg=TINY_CONFORMER,
                        hift_cfg=TINY_HIFT)
    emb = np.ones((1, 6), np.float32)
    mel = model.inference(
        token=np.asarray([[4, 5, 6, 7]], np.int32),
        prompt_token=np.asarray([[1, 2]], np.int32),
        prompt_feat=np.zeros((1, 4, 4), np.float32),
        embedding=emb, n_timesteps=2)
    assert mel.shape == (1, 8, 4)
    wav = model.vocode(mel)
    assert wav.shape == (1, 64)
    assert np.isfinite(wav).all()


def test_s3_token2mel_cfg_path(unet_dir):
    """Non-meanflow regular model: CFG euler + deterministic rand_noise."""
    flow = _load(unet_dir, "flow.safetensors", sanitize_flow)
    model = S3Token2Mel(dict(flow), vocab_size=32, meanflow=False,
                        n_mels=4, unet_in_channels=16,
                        conformer_cfg=TINY_CONFORMER, hift_cfg=TINY_HIFT)
    mel_a = model.inference(
        token=np.asarray([[4, 5]], np.int32),
        prompt_token=np.asarray([[1]], np.int32),
        prompt_feat=np.zeros((1, 2, 4), np.float32),
        embedding=np.ones((1, 6), np.float32), n_timesteps=2)
    mel_b = model.inference(
        token=np.asarray([[4, 5]], np.int32),
        prompt_token=np.asarray([[1]], np.int32),
        prompt_feat=np.zeros((1, 2, 4), np.float32),
        embedding=np.ones((1, 6), np.float32), n_timesteps=2)
    # deterministic: fixed rand_noise buffer, no fresh sampling
    np.testing.assert_allclose(mel_a, mel_b, atol=1e-6)


def test_cosine_t_span():
    ts = cosine_t_span(10)
    assert ts[0] == 0.0 and abs(ts[-1] - 1.0) < 1e-6
    assert (np.diff(ts) > 0).all()
