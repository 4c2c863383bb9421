"""Golden parity vs torch/transformers reference implementations (CPU).

The reference repo pins codec outputs to Python-reference golden vectors
computed from real checkpoints (MLXAudioCodecsTests.swift:207-348) — those
gate on downloaded weights. The offline equivalent here is stronger where
possible: build a seeded tiny *torch* reference model (transformers), export
its weights into our checkpoint format, and require our jitted graphs to
reproduce the torch outputs — exact code indices for encoders, float
tolerance for waveforms.

Covered: Encodec (encoder codes exact + decoder waveform), Descript DAC,
Mimi (SEANet + windowed transformer + split RVQ). Whisper/Wav2Vec2/T5/
HuBERT/Moonshine have the same style of test in their own files.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fixtures import modulo_values  # noqa: E402,F401


def _save(d, weights, config):
    from safetensors.numpy import save_file

    d.mkdir(parents=True, exist_ok=True)
    (d / "config.json").write_text(json.dumps(config))
    # safetensors silently corrupts non-contiguous arrays
    save_file({k: np.ascontiguousarray(v) for k, v in weights.items()},
              str(d / "model.safetensors"))
    return d


def _strip_weight_norm(m):
    import torch.nn.utils.parametrize as P

    for mod in m.modules():
        if hasattr(mod, "parametrizations") \
                and "weight" in getattr(mod, "parametrizations", {}):
            P.remove_parametrizations(mod, "weight")
    return m


# ---------------------------------------------------------------------------
# Encodec
# ---------------------------------------------------------------------------


def _tiny_encodec():
    from transformers import EncodecConfig, EncodecModel

    cfg = EncodecConfig(
        audio_channels=1, num_filters=4, num_residual_layers=1,
        upsampling_ratios=[8, 4, 2], codebook_size=1024, codebook_dim=8,
        hidden_size=8, num_lstm_layers=1, kernel_size=3, last_kernel_size=3,
        residual_kernel_size=3, sampling_rate=24000,
        target_bandwidths=[7.5, 15.0], normalize=False, compress=2)
    torch.manual_seed(0)
    return cfg, _strip_weight_norm(EncodecModel(cfg).eval())


def _export_encodec(m, cfg, d):
    """torch state dict -> mlx-community-layout checkpoint our loader eats."""
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    # decoder flat indices holding transposed convs: [conv, lstm,
    # (elu, convt, resnet) per ratio, ...] -> 3, 6, 9 for three ratios
    convt = {f"decoder.layers.{3 + 3 * i}"
             for i in range(len(cfg.upsampling_ratios))}
    out = {}
    for k, v in sd.items():
        if k.endswith("codebook.embed"):
            out[k] = v
            continue
        if any(s in k for s in ("inited", "cluster_size", "embed_avg")):
            continue
        if k.endswith(".lstm.weight_ih_l0"):
            out[k.replace(".lstm.weight_ih_l0", ".lstm.0.Wx")] = v
            continue
        if k.endswith(".lstm.weight_hh_l0"):
            out[k.replace(".lstm.weight_hh_l0", ".lstm.0.Wh")] = v
            continue
        if k.endswith(".lstm.bias_ih_l0"):
            # MLX single-bias LSTM: fold both torch biases
            out[k.replace(".lstm.bias_ih_l0", ".lstm.0.bias")] = \
                v + sd[k.replace("bias_ih", "bias_hh")]
            continue
        if k.endswith(".lstm.bias_hh_l0"):
            continue
        if k.endswith(".conv.weight") and v.ndim == 3:
            base = ".".join(k.split(".")[:3])
            # conv torch [O,I,K] -> MLX [O,K,I]; convt torch [I,O,K] -> [O,K,I]
            out[k] = (np.transpose(v, (1, 2, 0)) if base in convt
                      else np.transpose(v, (0, 2, 1)))
            continue
        out[k] = v
    cfg_d = {"model_type": "encodec", **{k: getattr(cfg, k) for k in [
        "audio_channels", "num_filters", "num_residual_layers",
        "upsampling_ratios", "codebook_size", "codebook_dim", "hidden_size",
        "num_lstm_layers", "kernel_size", "last_kernel_size",
        "residual_kernel_size", "sampling_rate", "target_bandwidths",
        "normalize", "compress", "dilation_growth_rate", "use_causal_conv",
        "pad_mode", "norm_type", "trim_right_ratio", "use_conv_shortcut"]}}
    return _save(d, out, cfg_d)


def test_encodec_torch_parity(tmp_path):
    from tpu_audio.codecs.encodec import Encodec

    cfg, m = _tiny_encodec()
    ours = Encodec.from_pretrained(str(_export_encodec(m, cfg, tmp_path / "e")))
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(640) * 0.3).astype(np.float32)
    with torch.no_grad():
        t_codes = m.encode(torch.from_numpy(audio)[None, None],
                           bandwidth=15.0).audio_codes
        t_wav = m.decode(t_codes, [None]).audio_values.numpy().reshape(-1)
    codes, scales = ours.encode(audio, bandwidth=15.0)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(t_codes))
    wav = np.asarray(ours.decode(codes, scales)).reshape(-1)
    n = min(len(t_wav), len(wav))
    np.testing.assert_allclose(wav[:n], t_wav[:n], atol=1e-5)


# ---------------------------------------------------------------------------
# Descript DAC (transformers DacModel)
# ---------------------------------------------------------------------------


def _tiny_dac():
    from transformers import DacConfig, DacModel

    cfg = DacConfig(
        encoder_hidden_size=8, downsampling_ratios=[2, 4],
        decoder_hidden_size=8, upsampling_ratios=[4, 2], n_codebooks=2,
        codebook_size=32, codebook_dim=4, sampling_rate=16000, hidden_size=8)
    torch.manual_seed(0)
    return cfg, DacModel(cfg).eval()


def _export_dac(m, cfg, d):
    """transformers named modules -> descript Sequential-index layout."""
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    n_enc = len(cfg.downsampling_ratios)
    n_dec = len(cfg.upsampling_ratios)
    out = {}
    for k, v in sd.items():
        parts = k.split(".")
        if k.startswith("encoder.conv1."):
            nk = k.replace("encoder.conv1.", "encoder.block.0.")
        elif k.startswith("encoder.snake1."):
            nk = f"encoder.block.{n_enc + 1}.{parts[-1]}"
        elif k.startswith("encoder.conv2."):
            nk = k.replace("encoder.conv2.", f"encoder.block.{n_enc + 2}.")
        elif k.startswith("encoder.block."):
            b = int(parts[2]) + 1
            rest = parts[3]
            tail = ".".join(parts[4:])
            if rest.startswith("res_unit"):
                u = int(rest[len("res_unit"):]) - 1
                inner = {"snake1.alpha": "block.0.alpha",
                         "conv1.weight": "block.1.weight",
                         "conv1.bias": "block.1.bias",
                         "snake2.alpha": "block.2.alpha",
                         "conv2.weight": "block.3.weight",
                         "conv2.bias": "block.3.bias"}[
                    f"{parts[4]}.{parts[5]}"]
                nk = f"encoder.block.{b}.block.{u}.{inner}"
            elif rest == "snake1":
                nk = f"encoder.block.{b}.block.3.{tail}"
            else:  # conv1
                nk = f"encoder.block.{b}.block.4.{tail}"
        elif k.startswith("decoder.conv1."):
            nk = k.replace("decoder.conv1.", "decoder.model.0.")
        elif k.startswith("decoder.snake1."):
            nk = f"decoder.model.{n_dec + 1}.{parts[-1]}"
        elif k.startswith("decoder.conv2."):
            nk = k.replace("decoder.conv2.", f"decoder.model.{n_dec + 2}.")
        elif k.startswith("decoder.block."):
            b = int(parts[2]) + 1
            rest = parts[3]
            tail = ".".join(parts[4:])
            if rest.startswith("res_unit"):
                u = int(rest[len("res_unit"):]) + 1
                inner = {"snake1.alpha": "block.0.alpha",
                         "conv1.weight": "block.1.weight",
                         "conv1.bias": "block.1.bias",
                         "snake2.alpha": "block.2.alpha",
                         "conv2.weight": "block.3.weight",
                         "conv2.bias": "block.3.bias"}[
                    f"{parts[4]}.{parts[5]}"]
                nk = f"decoder.model.{b}.block.{u}.{inner}"
            elif rest == "snake1":
                nk = f"decoder.model.{b}.block.0.{tail}"
            else:  # conv_t1
                nk = f"decoder.model.{b}.block.1.{tail}"
        elif k.startswith("quantizer.quantizers."):
            nk = k
        else:
            nk = k
        out[nk] = v
    cfg_d = {"model_type": "dac",
             "encoder_dim": cfg.encoder_hidden_size,
             "encoder_rates": list(cfg.downsampling_ratios),
             "decoder_dim": cfg.decoder_hidden_size,
             "decoder_rates": list(cfg.upsampling_ratios),
             "n_codebooks": cfg.n_codebooks,
             "codebook_size": cfg.codebook_size,
             "codebook_dim": cfg.codebook_dim,
             "sample_rate": cfg.sampling_rate,
             "latent_dim": cfg.hidden_size}
    return _save(d, out, cfg_d)


def test_dac_torch_parity(tmp_path):
    from tpu_audio.codecs.dac import DescriptDAC

    cfg, m = _tiny_dac()
    ours = DescriptDAC.from_pretrained(str(_export_dac(m, cfg, tmp_path / "d")))
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(256) * 0.3).astype(np.float32)
    with torch.no_grad():
        enc = m.encode(torch.from_numpy(audio)[None, None])
        t_codes = enc.audio_codes
        t_wav = m.decode(enc.quantized_representation).audio_values
        t_wav = t_wav.numpy().reshape(-1)
    codes = np.asarray(ours.encode(audio))
    np.testing.assert_array_equal(codes, np.asarray(t_codes))
    wav = np.asarray(ours.decode(codes)).reshape(-1)
    n = min(len(t_wav), len(wav))
    np.testing.assert_allclose(wav[:n], t_wav[:n], atol=1e-5)


# ---------------------------------------------------------------------------
# Mimi (transformers MimiModel)
# ---------------------------------------------------------------------------


def _tiny_mimi():
    from transformers import MimiConfig, MimiModel

    cfg = MimiConfig(
        audio_channels=1, num_filters=4, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, head_dim=8, num_key_value_heads=2,
        intermediate_size=32, upsampling_ratios=[4, 2], codebook_size=32,
        codebook_dim=4, num_quantizers=4, num_semantic_quantizers=1,
        sampling_rate=16000, frame_rate=1000.0,
        vector_quantization_hidden_dimension=4, sliding_window=250,
        upsample_groups=16)
    torch.manual_seed(0)
    return cfg, MimiModel(cfg).eval()


def _unpermute_rope(w, n_heads, head_dim):
    """HF checkpoints store q/k projections permuted for half-rotation rope;
    our transformer uses the original interleaved layout — invert the
    conversion permutation."""
    w = w.reshape(n_heads, 2, head_dim // 2, -1)
    return np.ascontiguousarray(w.transpose(0, 2, 1, 3).reshape(
        n_heads * head_dim, -1))


def _export_mimi(m, cfg, d, unpermute=True):
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    n_ratios = len(cfg.upsampling_ratios)
    out = {}
    qkv = {}
    for k, v in sd.items():
        parts = k.split(".")
        if "codebook.initialized" in k:
            continue
        if k.startswith("encoder.layers.") or k.startswith("decoder.layers."):
            stem = parts[0]
            n = int(parts[2])
            tail = ".".join(parts[3:])
            # tail is e.g. "conv.weight"; the final tree nests one more
            # module level (s_conv1d reads p["conv"]["conv"])
            if stem == "encoder":
                # [init, (res, elu?, down)...] flat: 0 init; res at 1,4,...;
                # down at 3,6,...; final at 2+3*n_ratios
                if n == 0:
                    nk = f"encoder.init_conv1d.{tail}"
                elif n == 2 + 3 * n_ratios:
                    nk = f"encoder.final_conv1d.{tail}"
                elif (n - 1) % 3 == 0 and ".block." in k:
                    li = (n - 1) // 3
                    bi = {1: 0, 3: 1}[int(parts[4])]
                    nk = (f"encoder.layers.{li}.residuals.0.block.{bi}"
                          f".{'.'.join(parts[5:])}")
                else:
                    li = (n - 3) // 3
                    nk = f"encoder.layers.{li}.downsample.{tail}"
            else:
                # decoder flat: 0 init; convt at 2,5,...; res at 3,6,...;
                if n == 0:
                    nk = f"decoder.init_conv1d.{tail}"
                elif n == 2 + 3 * n_ratios:
                    nk = f"decoder.final_conv1d.{tail}"
                elif (n - 2) % 3 == 0 and ".block." not in k:
                    li = (n - 2) // 3
                    nk = (f"decoder.layers.{li}.upsample."
                          + tail.replace("conv.", "convtr."))
                else:
                    li = (n - 3) // 3
                    bi = {1: 0, 3: 1}[int(parts[4])]
                    nk = (f"decoder.layers.{li}.residuals.0.block.{bi}"
                          f".{'.'.join(parts[5:])}")
            out[nk.replace(".conv.weight", ".conv.conv.weight")
                  .replace(".conv.bias", ".conv.conv.bias")
                  .replace(".convtr.weight", ".convtr.convtr.weight")
                  .replace(".convtr.bias", ".convtr.convtr.bias")] = v
            continue
        if "_transformer.layers." in k:
            stem = "encoder_transformer" if k.startswith("encoder") \
                else "decoder_transformer"
            li = parts[2]
            suffix = ".".join(parts[3:])
            base = f"{stem}.transformer.layers.{li}"
            if suffix.startswith("self_attn.q_proj"):
                qkv.setdefault((stem, li), {})["q"] = \
                    _unpermute_rope(v, nh, hd) if unpermute else v
            elif suffix.startswith("self_attn.k_proj"):
                qkv.setdefault((stem, li), {})["k"] = \
                    _unpermute_rope(v, nh, hd) if unpermute else v
            elif suffix.startswith("self_attn.v_proj"):
                qkv.setdefault((stem, li), {})["v"] = v
            elif suffix.startswith("self_attn.o_proj"):
                out[f"{base}.self_attn.out_proj.weight"] = v
            elif suffix.startswith("mlp.fc1"):
                out[f"{base}.gating.linear1.weight"] = v
            elif suffix.startswith("mlp.fc2"):
                out[f"{base}.gating.linear2.weight"] = v
            elif suffix.startswith("input_layernorm"):
                out[f"{base}.norm1.{parts[-1]}"] = v
            elif suffix.startswith("post_attention_layernorm"):
                out[f"{base}.norm2.{parts[-1]}"] = v
            elif suffix == "self_attn_layer_scale.scale":
                out[f"{base}.layer_scale_1.scale"] = v
            elif suffix == "mlp_layer_scale.scale":
                out[f"{base}.layer_scale_2.scale"] = v
            continue
        if k.startswith("downsample.conv."):
            out["downsample.conv.conv." + parts[-1]] = v
            continue
        if k.startswith("upsample.conv."):
            out["upsample.convtr.convtr." + parts[-1]] = v
            continue
        if k.startswith("quantizer."):
            part = ("rvq_first" if "semantic" in parts[1] else "rvq_rest")
            rest = ".".join(parts[2:])
            rest = rest.replace("embed_sum", "embedding_sum")
            if rest.startswith("layers."):
                out[f"quantizer.{part}.vq.{rest}"] = v
            else:
                out[f"quantizer.{part}.{rest}"] = v
            continue
        out[k] = v
    for (stem, li), d3 in qkv.items():
        out[f"{stem}.transformer.layers.{li}.self_attn.in_proj.weight"] = \
            np.concatenate([d3["q"], d3["k"], d3["v"]], axis=0)
    cfg_d = {
        "model_type": "mimi",
        "sampling_rate": cfg.sampling_rate, "frame_rate": cfg.frame_rate,
        "num_quantizers": cfg.num_quantizers,
        "quantizer_dim": cfg.codebook_dim, "quantizer_bins": cfg.codebook_size,
        "seanet": {"dimension": cfg.hidden_size, "channels": 1,
                   "nfilters": cfg.num_filters, "nresidual_layers": 1,
                   "ratios": list(cfg.upsampling_ratios), "ksize": 7,
                   "residual_ksize": 3, "last_ksize": 3, "dilation_base": 2,
                   "compress": 2},
        "transformer": {"d_model": cfg.hidden_size,
                        "num_heads": cfg.num_attention_heads,
                        "num_layers": cfg.num_hidden_layers,
                        "layer_scale": 0.01, "context": cfg.sliding_window,
                        "max_period": 10000.0,
                        "dim_feedforward": cfg.intermediate_size},
    }
    return _save(d, out, cfg_d)


def test_mimi_torch_parity(tmp_path):
    from tpu_audio.codecs.mimi import Mimi, MimiConfig as OurMimiConfig

    cfg, m = _tiny_mimi()
    d = _export_mimi(m, cfg, tmp_path / "m")
    # bypass the mlx-layout sanitize: the export writes final tree names
    from tpu_audio.core import hub, loading

    our_cfg = OurMimiConfig.from_dict(json.loads((d / "config.json").read_text()))
    params = loading.load_params(d, dtype=jnp.float32)
    ours = Mimi(our_cfg, params, jnp.float32)

    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(320) * 0.3).astype(np.float32)
    with torch.no_grad():
        t_codes = m.encode(torch.from_numpy(audio)[None, None]).audio_codes
        t_wav = m.decode(t_codes).audio_values.numpy().reshape(-1)
    codes = np.asarray(ours.encode(audio))
    np.testing.assert_array_equal(codes, np.asarray(t_codes))
    wav = np.asarray(ours.decode(codes)).reshape(-1)
    n = min(len(t_wav), len(wav))
    np.testing.assert_allclose(wav[:n], t_wav[:n], atol=2e-5)


# ---------------------------------------------------------------------------
# GPT-2 trunk (IndexTTS / Chatterbox-T3 / MossTTSNano backbone)
# ---------------------------------------------------------------------------


def test_gpt2_trunk_torch_parity():
    """Our shared GPT-2 core (indextts.gpt2_forward) vs transformers
    GPT2Model hidden states on a seeded tiny model."""
    from transformers import GPT2Config, GPT2Model

    from tpu_audio.core import kv_cache, nn
    from tpu_audio.models.tts.indextts import IndexTTSGPTConfig, gpt2_forward

    cfg = GPT2Config(vocab_size=64, n_positions=32, n_embd=16, n_layer=2,
                     n_head=2, resid_pdrop=0.0, embd_pdrop=0.0,
                     attn_pdrop=0.0)
    torch.manual_seed(0)
    tm = GPT2Model(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    # torch GPT2 Conv1D stores [in, out]; our nn.linear wants [out, in]
    params = {"h": {}, "ln_f": {"weight": sd["ln_f.weight"],
                                "bias": sd["ln_f.bias"]}}
    for i in range(cfg.n_layer):
        b = f"h.{i}"
        params["h"][str(i)] = {
            "ln_1": {"weight": sd[f"{b}.ln_1.weight"],
                     "bias": sd[f"{b}.ln_1.bias"]},
            "ln_2": {"weight": sd[f"{b}.ln_2.weight"],
                     "bias": sd[f"{b}.ln_2.bias"]},
            "attn": {
                "c_attn": {"weight": sd[f"{b}.attn.c_attn.weight"].T,
                           "bias": sd[f"{b}.attn.c_attn.bias"]},
                "c_proj": {"weight": sd[f"{b}.attn.c_proj.weight"].T,
                           "bias": sd[f"{b}.attn.c_proj.bias"]},
            },
            "mlp": {
                "c_fc": {"weight": sd[f"{b}.mlp.c_fc.weight"].T,
                         "bias": sd[f"{b}.mlp.c_fc.bias"]},
                "c_proj": {"weight": sd[f"{b}.mlp.c_proj.weight"].T,
                           "bias": sd[f"{b}.mlp.c_proj.bias"]},
            },
        }
    params = jax.tree.map(jnp.asarray, params)

    tokens = np.asarray([[1, 5, 9, 13, 2]], np.int64)
    with torch.no_grad():
        want = tm(torch.from_numpy(tokens)).last_hidden_state.numpy()

    embeds = (nn.embedding({"weight": jnp.asarray(sd["wte.weight"])},
                           jnp.asarray(tokens, jnp.int32))
              + jnp.asarray(sd["wpe.weight"])[: tokens.shape[1]][None])
    icfg = IndexTTSGPTConfig(layers=cfg.n_layer, heads=cfg.n_head)
    cache = kv_cache.init_cache(cfg.n_layer, 1, cfg.n_head,
                                cfg.n_embd // cfg.n_head, 16, jnp.float32)
    got, cache = gpt2_forward(params, embeds, cache, icfg)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    # KV-cached incremental decode matches the full forward
    cache2 = kv_cache.init_cache(cfg.n_layer, 1, cfg.n_head,
                                 cfg.n_embd // cfg.n_head, 16, jnp.float32)
    outs = []
    for t in range(tokens.shape[1]):
        step, cache2 = gpt2_forward(params, embeds[:, t : t + 1], cache2, icfg)
        outs.append(np.asarray(step))
    np.testing.assert_allclose(np.concatenate(outs, axis=1), want, atol=2e-5)


# ---------------------------------------------------------------------------
# CSM (Marvis) — backbone frame embeds + codebook0 head + depth decoder
# ---------------------------------------------------------------------------


def _tiny_csm():
    from transformers import CsmConfig, CsmForConditionalGeneration
    from transformers.models.csm.configuration_csm import CsmDepthDecoderConfig

    dd = CsmDepthDecoderConfig(
        num_codebooks=4, vocab_size=35, backbone_hidden_size=32,
        hidden_size=24, intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=6,
        rope_theta=500000.0)
    cfg = CsmConfig(
        text_vocab_size=50, vocab_size=35, num_codebooks=4, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, rope_theta=500000.0,
        depth_decoder_config=dd.to_dict(),
        codec_config={"model_type": "mimi"})
    torch.manual_seed(3)
    return cfg, CsmForConditionalGeneration(cfg).eval()


def _export_csm(m, cfg, d):
    """HF Csm state dict -> the tree MarvisTTS expects (csm.sanitize is a
    no-op on these already-HF-style names)."""
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()
          if "codec_model" not in k}
    out = {}
    for k, v in sd.items():
        if k == "lm_head.weight":
            out["codebook0_head.weight"] = v
        elif k == "embed_text_tokens.weight":
            out["text_embeddings.weight"] = v
        elif k == "backbone_model.embed_tokens.embed_audio_tokens.weight":
            out["audio_embeddings.weight"] = v
        elif k == "depth_decoder.model.inputs_embeds_projector.weight":
            out["projection.weight"] = v
        elif k == "depth_decoder.codebooks_head.weight":
            out["audio_head"] = v
        elif k == "depth_decoder.model.embed_tokens.weight":
            continue  # tied to audio_embeddings
        elif k.startswith("depth_decoder.model."):
            out["decoder." + k[len("depth_decoder.model."):]] = v
        elif k.startswith("backbone_model."):
            out["backbone." + k[len("backbone_model."):]] = v
        else:
            raise AssertionError(f"unmapped key {k}")
    dcfg = cfg.depth_decoder_config
    sub = lambda c, hd: {  # noqa: E731
        "hidden_size": c.hidden_size, "num_hidden_layers": c.num_hidden_layers,
        "intermediate_size": c.intermediate_size,
        "num_attention_heads": c.num_attention_heads,
        "num_key_value_heads": c.num_key_value_heads,
        "rope_theta": c.rope_theta, "rms_norm_eps": c.rms_norm_eps,
        "head_dim": hd}
    cfg_d = {
        "model_type": "csm", "text_vocab_size": cfg.text_vocab_size,
        "audio_vocab_size": cfg.vocab_size,
        "audio_num_codebooks": cfg.num_codebooks,
        "backbone_config": sub(cfg, cfg.head_dim),
        "depth_decoder_config": sub(dcfg, dcfg.head_dim),
    }
    return _save(d, out, cfg_d)


def test_csm_torch_parity(tmp_path):
    """Backbone frame-grid embeds + codebook0 logits + teacher-forced depth
    decoder logits vs transformers CsmForConditionalGeneration
    (reference: MarvisTTSModel.swift / CSMModel.swift:467-526)."""
    from tpu_audio.core import kv_cache, nn
    from tpu_audio.models import llama
    from tpu_audio.models.tts.csm import MarvisTTS

    cfg, m = _tiny_csm()
    d = _export_csm(m, cfg, tmp_path / "csm")
    ours = MarvisTTS.from_pretrained(str(d))
    K, V = cfg.num_codebooks, cfg.vocab_size

    # prompt: 2 text rows then 3 audio frames (the [T, K+1] grid of
    # MarvisTTSModel.swift:70-142)
    rng = np.random.default_rng(0)
    text_ids = np.asarray([[7, 21]], np.int64)
    audio_ids = rng.integers(0, V, size=(1, 3, K)).astype(np.int64)

    frames = np.zeros((1, 5, K + 1), np.int32)
    masks = np.zeros((1, 5, K + 1), np.float32)
    frames[0, :2, K] = text_ids[0]
    masks[0, :2, K] = 1.0
    frames[0, 2:, :K] = audio_ids[0]
    masks[0, 2:, :K] = 1.0

    with torch.no_grad():
        text_emb = m.embed_text_tokens(torch.from_numpy(text_ids))
        audio_emb = m.backbone_model.embed_tokens(torch.from_numpy(audio_ids))
        t_embeds = torch.cat([text_emb, audio_emb], dim=1)
        t_h = m.backbone_model(inputs_embeds=t_embeds).last_hidden_state
        t_last = t_h[:, -1]
        t_c0_logits = m.lm_head(t_last).numpy()

    embeds = ours._embed_frames(ours.params, jnp.asarray(frames),
                                jnp.asarray(masks))
    np.testing.assert_allclose(np.asarray(embeds), t_embeds.numpy(), atol=1e-6)

    bb_cache = kv_cache.init_cache(
        ours.config.backbone.num_hidden_layers, 1,
        ours.config.backbone.num_key_value_heads,
        ours.config.backbone.resolved_head_dim, 8, jnp.float32)
    h, bb_cache = llama.forward(ours.params["backbone"], None, bb_cache,
                                ours.config.backbone, inputs_embeds=embeds,
                                return_hidden=True)
    np.testing.assert_allclose(np.asarray(h), t_h.numpy(), atol=3e-5)
    last_h = h[:, -1]
    c0_logits = np.asarray(
        last_h @ ours.params["codebook0_head"]["weight"].T)
    np.testing.assert_allclose(c0_logits, t_c0_logits, atol=3e-5)

    # depth decoder, teacher-forced on fixed codes c0..c_{K-2}
    codes = rng.integers(0, V, size=(1, K - 1)).astype(np.int64)
    with torch.no_grad():
        # HF embeds position p with codebook offset p-1 and replaces
        # position 0 by the backbone hidden, so teacher-forced input is
        # [pad, c0, .., c_{K-2}]
        t_dec = m.depth_decoder(
            input_ids=torch.from_numpy(
                np.concatenate([np.zeros((1, 1), np.int64), codes], axis=1)),
            backbone_last_hidden_state=t_last)
        # HF already drops position 0 (the backbone hidden slot) and applies
        # weight[pos-1] per remaining position -> [1, K-1, V]
        t_depth_logits = t_dec.logits.numpy()

    dcfg = ours.config.decoder
    dec_cache = kv_cache.init_cache(
        dcfg.num_hidden_layers, 1, dcfg.num_key_value_heads,
        dcfg.resolved_head_dim, K + 2, jnp.float32)
    c0_embed = nn.embedding(ours.params["audio_embeddings"],
                            jnp.asarray(codes[:, :1], jnp.int32))
    curr = jnp.concatenate([last_h[:, None], c0_embed], axis=1)
    got_logits = []
    for i in range(1, K):
        proj = nn.linear(ours.params["projection"], curr)
        dec_h, dec_cache = llama.forward(
            ours.params["decoder"], None, dec_cache, dcfg,
            inputs_embeds=proj, return_hidden=True)
        w_i = ours.params["audio_head"][i - 1]
        got_logits.append(np.asarray(dec_h[:, -1] @ w_i))
        if i < K - 1:
            curr = nn.embedding(
                ours.params["audio_embeddings"],
                jnp.asarray(codes[:, i : i + 1], jnp.int32) + i * V)
    got = np.stack(got_logits, axis=1)
    np.testing.assert_allclose(got, t_depth_logits, atol=3e-5)


# ---------------------------------------------------------------------------
# GraniteSpeech — conformer CTC encoder + QFormer projector
# ---------------------------------------------------------------------------


def test_granite_encoder_projector_torch_parity():
    """Our block-attention conformer encoder (mid-layer CTC softmax
    reinjection) and windowed QFormer projector vs transformers
    GraniteSpeech modules (reference: GraniteSpeech.swift:67-496)."""
    from transformers import Blip2QFormerConfig
    from transformers.models.granite_speech import (
        GraniteSpeechConfig, GraniteSpeechCTCEncoder,
        GraniteSpeechEncoderConfig)
    from transformers.models.granite_speech.modeling_granite_speech import (
        GraniteSpeechEncoderProjector)

    from tpu_audio.core import loading
    from tpu_audio.models.stt import granite as G

    enc_cfg = GraniteSpeechEncoderConfig(
        input_dim=40, num_layers=2, hidden_dim=32, feedforward_mult=2,
        num_heads=4, dim_head=8, output_dim=12, context_size=8,
        conv_kernel_size=3, conv_expansion_factor=2, dropout=0.0)
    proj_cfg = Blip2QFormerConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, encoder_hidden_size=32, vocab_size=30,
        cross_attention_frequency=1)
    full_cfg = GraniteSpeechConfig(
        encoder_config=enc_cfg.to_dict(), projector_config=proj_cfg.to_dict(),
        text_config={"model_type": "granite", "hidden_size": 16,
                     "num_hidden_layers": 1, "num_attention_heads": 2,
                     "intermediate_size": 32, "vocab_size": 60},
        downsample_rate=2, window_size=4)
    torch.manual_seed(5)
    t_enc = GraniteSpeechCTCEncoder(enc_cfg).eval()
    t_proj = GraniteSpeechEncoderProjector(full_cfg).eval()

    flat = {}
    for k, v in t_enc.state_dict().items():
        if "num_batches_tracked" in k:
            continue
        flat["encoder." + k] = v.detach().numpy()
    for k, v in t_proj.state_dict().items():
        flat["projector." + k] = v.detach().numpy()
        if k == "query":
            flat["projector.query"] = v.detach().numpy()[0]
    # word-embedding rows of the qformer are unused by the projector path
    flat = {k: v for k, v in flat.items() if "word_embedding" not in k
            and "position_embedding" not in k}
    params = jax.tree.map(jnp.asarray, loading.unflatten(G.sanitize(flat)))

    our_enc_cfg = G.GraniteEncoderConfig.from_dict(enc_cfg.to_dict())
    our_cfg = G.GraniteConfig.from_dict({
        "encoder_config": enc_cfg.to_dict(),
        "projector_config": proj_cfg.to_dict(),
        "text_config": {}, "downsample_rate": 2, "window_size": 4})

    rng = np.random.default_rng(1)
    feats = rng.standard_normal((1, 16, 40)).astype(np.float32)
    with torch.no_grad():
        t_h = t_enc(torch.from_numpy(feats)).numpy()
        t_out = t_proj(torch.from_numpy(t_h)).numpy()

    h = G.encoder_forward(params, jnp.asarray(feats),
                          jnp.asarray([16]), our_enc_cfg)
    np.testing.assert_allclose(np.asarray(h), t_h, atol=3e-5)
    out = G.projector_forward(params, h, our_cfg)
    np.testing.assert_allclose(np.asarray(out), t_out, atol=3e-5)


# ---------------------------------------------------------------------------
# Parakeet FastConformer + CTC head vs transformers ParakeetForCTC
# ---------------------------------------------------------------------------


def _tiny_parakeet_hf():
    from transformers import (ParakeetCTCConfig, ParakeetEncoderConfig,
                              ParakeetForCTC)

    ec = ParakeetEncoderConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, conv_kernel_size=9, subsampling_factor=4,
        subsampling_conv_channels=8, num_mel_bins=16,
        dropout=0.0, dropout_positions=0.0, layerdrop=0.0,
        activation_dropout=0.0, attention_dropout=0.0, scale_input=False)
    cfg = ParakeetCTCConfig.from_encoder_config(ec, vocab_size=17,
                                                pad_token_id=16)
    torch.manual_seed(11)
    return ParakeetForCTC(cfg).eval(), ec


def _export_parakeet(m, ec, d):
    """HF torch state dict -> the NeMo/MLX-community checkpoint layout
    our loader's ``sanitize`` expects (ParakeetModel.swift weight names)."""
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    w = {}
    # dw_striding subsampling: torch conv2d [O,I,H,W] -> MLX [O,H,W,I];
    # HF layers indices {0, 2, 3} == NeMo conv-list indices for factor 4
    for idx in (0, 2, 3):
        w[f"encoder.pre_encode.conv.{idx}.weight"] = sd[
            f"encoder.subsampling.layers.{idx}.weight"].transpose(0, 2, 3, 1)
        w[f"encoder.pre_encode.conv.{idx}.bias"] = sd[
            f"encoder.subsampling.layers.{idx}.bias"]
    w["encoder.pre_encode.out.weight"] = sd["encoder.subsampling.linear.weight"]
    w["encoder.pre_encode.out.bias"] = sd["encoder.subsampling.linear.bias"]

    attn_map = {"q_proj": "linear_q", "k_proj": "linear_k",
                "v_proj": "linear_v", "o_proj": "linear_out",
                "relative_k_proj": "linear_pos"}
    for i in range(ec.num_hidden_layers):
        hb, b = f"encoder.layers.{i}", f"encoder.layers.{i}"
        for ff in ("feed_forward1", "feed_forward2"):
            for lin in ("linear1", "linear2"):
                for p in ("weight", "bias"):
                    w[f"{b}.{ff}.{lin}.{p}"] = sd[f"{hb}.{ff}.{lin}.{p}"]
        for nrm in ("norm_feed_forward1", "norm_self_att", "norm_conv",
                    "norm_feed_forward2", "norm_out"):
            for p in ("weight", "bias"):
                w[f"{b}.{nrm}.{p}"] = sd[f"{hb}.{nrm}.{p}"]
        for hf_name, nemo_name in attn_map.items():
            w[f"{b}.self_attn.{nemo_name}.weight"] = sd[
                f"{hb}.self_attn.{hf_name}.weight"]
            hf_bias = f"{hb}.self_attn.{hf_name}.bias"
            if hf_bias in sd:
                w[f"{b}.self_attn.{nemo_name}.bias"] = sd[hf_bias]
        w[f"{b}.self_attn.pos_bias_u"] = sd[f"{hb}.self_attn.bias_u"]
        w[f"{b}.self_attn.pos_bias_v"] = sd[f"{hb}.self_attn.bias_v"]
        # conv module: torch conv1d [O,I,K] -> MLX [O,K,I]; HF "norm" ==
        # NeMo "batch_norm" (running stats included)
        for cv in ("pointwise_conv1", "depthwise_conv", "pointwise_conv2"):
            w[f"{b}.conv.{cv}.weight"] = sd[
                f"{hb}.conv.{cv}.weight"].transpose(0, 2, 1)
            w[f"{b}.conv.{cv}.bias"] = sd[f"{hb}.conv.{cv}.bias"]
        for p in ("weight", "bias", "running_mean", "running_var"):
            w[f"{b}.conv.batch_norm.{p}"] = sd[f"{hb}.conv.norm.{p}"]
    # CTC head: torch conv1d [V,D,1] -> MLX [V,1,D], NeMo decoder_layers.0
    w["ctc_decoder.decoder_layers.0.weight"] = sd["ctc_head.weight"].transpose(0, 2, 1)
    w["ctc_decoder.decoder_layers.0.bias"] = sd["ctc_head.bias"]

    vocab = [("▁" if i % 3 == 0 else "") + chr(ord("a") + i)
             for i in range(16)]
    cfg = {
        "model_type": "parakeet",
        "target": "nemo.collections.asr.models.EncDecCTCModelBPE",
        "preprocessor": {
            "sample_rate": 16000, "normalize": "per_feature",
            "window_size": 0.025, "window_stride": 0.01, "window": "hann",
            "features": ec.num_mel_bins, "n_fft": 512, "preemph": 0.97,
        },
        "encoder": {
            "feat_in": ec.num_mel_bins, "n_layers": ec.num_hidden_layers,
            "d_model": ec.hidden_size, "n_heads": ec.num_attention_heads,
            "ff_expansion_factor": ec.intermediate_size // ec.hidden_size,
            "subsampling_factor": ec.subsampling_factor,
            "self_attention_model": "rel_pos", "subsampling": "dw_striding",
            "conv_kernel_size": ec.conv_kernel_size,
            "subsampling_conv_channels": ec.subsampling_conv_channels,
            "xscaling": bool(ec.scale_input),
        },
        "decoder": {"vocabulary": vocab},
        "decoding": {"greedy": {"max_symbols": 10}},
    }
    return _save(d, w, cfg)


def test_parakeet_torch_parity(tmp_path):
    """FastConformer encoder (dw_striding subsample, rel-pos attention,
    conv module with batch norm) + NeMo CTC head vs HF ParakeetForCTC
    (reference: ParakeetModel.swift / NemoAttention.swift)."""
    from tpu_audio.models.stt.parakeet import Parakeet

    m, ec = _tiny_parakeet_hf()
    d = _export_parakeet(m, ec, tmp_path / "parakeet")
    ours = Parakeet.from_pretrained(str(d), dtype=jnp.float32)

    rng = np.random.default_rng(3)
    mel = rng.standard_normal((1, 50, 16)).astype(np.float32) * 0.5
    with torch.no_grad():
        t_logits = m(input_features=torch.from_numpy(mel)).logits.numpy()

    feats, out_len = ours._encode(ours.params, jnp.asarray(mel),
                                  jnp.asarray([50]))
    logits = np.asarray(ours._ctc_head(ours.params, feats))
    assert logits.shape == t_logits.shape
    np.testing.assert_allclose(logits, t_logits, atol=5e-5, rtol=1e-4)
