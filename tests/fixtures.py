"""Synthetic tiny-checkpoint fixtures, written to disk and loaded through the
real `from_pretrained` path — the reference's fixture-model pattern
(Tests/ParakeetBatchParityTests.swift:561 makeFixtureDirectory,
Tests/ModuloFloatFixtureValues.swift deterministic pseudo-weights)."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def modulo_values(shape, modulus: int = 17, scale: float = 0.05) -> np.ndarray:
    """Deterministic reproducible pseudo-weights without RNG:
    value[i] = ((i % m) - m/2) * scale / m."""
    n = int(np.prod(shape))
    vals = ((np.arange(n) % modulus) - modulus / 2) * (scale / modulus)
    return vals.reshape(shape).astype(np.float32)


def make_whisper_fixture(
    path: Path,
    n_mels: int = 80,
    d_model: int = 32,
    layers: int = 2,
    heads: int = 2,
    ffn: int = 64,
    vocab: int = 64,
    max_target_positions: int = 48,
) -> Path:
    """Write a minimal HF-layout Whisper checkpoint."""
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    cfg = {
        "model_type": "whisper",
        "num_mel_bins": n_mels,
        "d_model": d_model,
        "encoder_layers": layers,
        "encoder_attention_heads": heads,
        "encoder_ffn_dim": ffn,
        "decoder_layers": layers,
        "decoder_attention_heads": heads,
        "decoder_ffn_dim": ffn,
        "vocab_size": vocab,
        "max_source_positions": 1500,
        "max_target_positions": max_target_positions,
    }
    (path / "config.json").write_text(json.dumps(cfg))

    w: dict[str, np.ndarray] = {}
    m = 0

    def add(key, shape):
        nonlocal m
        m += 1
        w[key] = modulo_values(shape, modulus=13 + (m % 7))

    add("model.encoder.conv1.weight", (d_model, n_mels, 3))
    add("model.encoder.conv1.bias", (d_model,))
    add("model.encoder.conv2.weight", (d_model, d_model, 3))
    add("model.encoder.conv2.bias", (d_model,))
    add("model.encoder.embed_positions.weight", (1500, d_model))
    add("model.encoder.layer_norm.weight", (d_model,))
    add("model.encoder.layer_norm.bias", (d_model,))
    add("model.decoder.embed_tokens.weight", (vocab, d_model))
    add("model.decoder.embed_positions.weight", (max_target_positions, d_model))
    add("model.decoder.layer_norm.weight", (d_model,))
    add("model.decoder.layer_norm.bias", (d_model,))
    for stem, has_cross in (("encoder", False), ("decoder", True)):
        for i in range(layers):
            base = f"model.{stem}.layers.{i}"
            for attn, ln in [("self_attn", "self_attn_layer_norm")] + (
                [("encoder_attn", "encoder_attn_layer_norm")] if has_cross else []
            ):
                add(f"{base}.{attn}.q_proj.weight", (d_model, d_model))
                add(f"{base}.{attn}.q_proj.bias", (d_model,))
                add(f"{base}.{attn}.k_proj.weight", (d_model, d_model))
                add(f"{base}.{attn}.v_proj.weight", (d_model, d_model))
                add(f"{base}.{attn}.v_proj.bias", (d_model,))
                add(f"{base}.{attn}.out_proj.weight", (d_model, d_model))
                add(f"{base}.{attn}.out_proj.bias", (d_model,))
                add(f"{base}.{ln}.weight", (d_model,))
                add(f"{base}.{ln}.bias", (d_model,))
            add(f"{base}.fc1.weight", (ffn, d_model))
            add(f"{base}.fc1.bias", (ffn,))
            add(f"{base}.fc2.weight", (d_model, ffn))
            add(f"{base}.fc2.bias", (d_model,))
            add(f"{base}.final_layer_norm.weight", (d_model,))
            add(f"{base}.final_layer_norm.bias", (d_model,))
    save_file(w, str(path / "model.safetensors"))
    return path


def make_snac_fixture(
    path: Path,
    sampling_rate: int = 24000,
    encoder_dim: int = 16,
    encoder_rates=(2, 2),
    decoder_dim: int = 64,
    decoder_rates=(2, 2),
    vq_strides=(2, 1),
    codebook_size: int = 32,
    codebook_dim: int = 4,
    attn_window_size=None,
    noise: bool = True,
    depthwise: bool = True,
) -> Path:
    """Write a tiny torch-layout SNAC checkpoint (weight_g/weight_v pairs)."""
    import math as _math

    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    cfg = dict(
        sampling_rate=sampling_rate, encoder_dim=encoder_dim,
        encoder_rates=list(encoder_rates), decoder_dim=decoder_dim,
        decoder_rates=list(decoder_rates), attn_window_size=attn_window_size,
        codebook_size=codebook_size, codebook_dim=codebook_dim,
        vq_strides=list(vq_strides), noise=noise, depthwise=depthwise,
    )
    (path / "config.json").write_text(json.dumps(cfg))

    w: dict[str, np.ndarray] = {}
    counter = [0]

    def wn_conv(prefix, out_c, in_c, k, bias=True, transpose=False):
        counter[0] += 1
        shape = (in_c, out_c, k) if transpose else (out_c, in_c, k)
        v = modulo_values(shape, modulus=11 + counter[0] % 7, scale=1.0)
        g = np.abs(modulo_values((shape[0], 1, 1), modulus=9 + counter[0] % 5,
                                 scale=0.8)) + 0.2
        w[f"{prefix}.weight_v"] = v
        w[f"{prefix}.weight_g"] = g.astype(np.float32)
        if bias:
            w[f"{prefix}.bias"] = modulo_values((out_c,), scale=0.01)

    def snake_p(prefix, c):
        w[f"{prefix}.alpha"] = np.ones((1, c, 1), np.float32)

    def res_unit(prefix, dim, groups):
        snake_p(f"{prefix}.block.0", dim)
        wn_conv(f"{prefix}.block.1", dim, dim // groups, 7)
        snake_p(f"{prefix}.block.2", dim)
        wn_conv(f"{prefix}.block.3", dim, dim, 1)

    def mha(prefix, dim):
        w[f"{prefix}.norm.weight"] = np.ones((dim,), np.float32)
        w[f"{prefix}.norm.bias"] = np.zeros((dim,), np.float32)
        w[f"{prefix}.to_qkv.weight"] = modulo_values((dim * 3, dim), scale=0.3)
        w[f"{prefix}.to_out.weight"] = modulo_values((dim, dim), scale=0.3)

    # encoder
    wn_conv("encoder.block.0", encoder_dim, 1, 7)
    d = encoder_dim
    idx = 1
    for s in encoder_rates:
        d *= 2
        in_d = d // 2
        groups = in_d if depthwise else 1
        base = f"encoder.block.{idx}.block"
        for j in range(3):
            res_unit(f"{base}.{j}", in_d, groups)
        snake_p(f"{base}.3", in_d)
        wn_conv(f"{base}.4", d, in_d, 2 * s)
        idx += 1
    if attn_window_size:
        mha(f"encoder.block.{idx}", d)
        idx += 1
    groups = d if depthwise else 1
    wn_conv(f"encoder.block.{idx}", d, d // groups, 7)

    latent = encoder_dim * (2 ** len(encoder_rates))
    # quantizers
    for i in range(len(vq_strides)):
        q = f"quantizer.quantizers.{i}"
        wn_conv(f"{q}.in_proj", codebook_dim, latent, 1)
        wn_conv(f"{q}.out_proj", latent, codebook_dim, 1)
        w[f"{q}.codebook.weight"] = modulo_values(
            (codebook_size, codebook_dim), modulus=23, scale=1.0)

    # decoder
    idx = 0
    if depthwise:
        wn_conv(f"decoder.model.{idx}", latent, 1, 7)  # dw: in/groups = 1
        idx += 1
        wn_conv(f"decoder.model.{idx}", decoder_dim, latent, 1)
        idx += 1
    else:
        wn_conv(f"decoder.model.{idx}", decoder_dim, latent, 7)
        idx += 1
    if attn_window_size:
        mha(f"decoder.model.{idx}", decoder_dim)
        idx += 1
    ch = decoder_dim
    for i, s in enumerate(decoder_rates):
        in_d = ch // (2**i)
        out_d = ch // (2 ** (i + 1))
        groups = out_d if depthwise else 1
        base = f"decoder.model.{idx}.block"
        j = 0
        snake_p(f"{base}.{j}", in_d); j += 1
        wn_conv(f"{base}.{j}", out_d, in_d, 2 * s, transpose=True); j += 1
        if noise:
            wn_conv(f"{base}.{j}.linear", out_d, out_d, 1, bias=False); j += 1
        for _ in range(3):
            res_unit(f"{base}.{j}", out_d, groups); j += 1
        idx += 1
    final = ch // (2 ** len(decoder_rates))
    snake_p(f"decoder.model.{idx}", final); idx += 1
    wn_conv(f"decoder.model.{idx}", 1, final, 7)

    save_file(w, str(path / "model.safetensors"))
    return path


def make_llama_tts_fixture(path: Path, vocab: int = 400,
                           codebook_size: int = 32,
                           qwen3: bool = False) -> Path:
    """Tiny Orpheus-style checkpoint: Llama backbone + scaled-down special
    token table (audio_token_offset=100, 7*codebook_size audio tokens)."""
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    cfg = {
        "model_type": "qwen3" if qwen3 else "llama_tts",
        "hidden_size": 32,
        "num_hidden_layers": 2,
        "intermediate_size": 64,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "rms_norm_eps": 1e-5,
        "vocab_size": vocab,
        "rope_theta": 10000.0,
        "tie_word_embeddings": True,
        "sample_rate": 24000,
        # scaled-down Orpheus token table
        "start_of_human": 90, "end_of_human": 91, "end_of_text": 92,
        "start_of_speech": 93, "end_of_speech": 94, "pad_token": 95,
        "audio_start": 96, "audio_end": 97,
        "audio_token_offset": 100, "codebook_size": codebook_size,
    }
    (path / "config.json").write_text(json.dumps(cfg))

    d, ffn, hd = 32, 64, 8
    w = {"model.embed_tokens.weight": modulo_values((vocab, d), scale=0.5),
         "model.norm.weight": np.ones((d,), np.float32)}
    for i in range(2):
        base = f"model.layers.{i}"
        w[f"{base}.input_layernorm.weight"] = np.ones((d,), np.float32)
        w[f"{base}.post_attention_layernorm.weight"] = np.ones((d,), np.float32)
        w[f"{base}.self_attn.q_proj.weight"] = modulo_values((4 * hd, d), 13 + i, 0.3)
        w[f"{base}.self_attn.k_proj.weight"] = modulo_values((2 * hd, d), 11 + i, 0.3)
        w[f"{base}.self_attn.v_proj.weight"] = modulo_values((2 * hd, d), 17 + i, 0.3)
        w[f"{base}.self_attn.o_proj.weight"] = modulo_values((d, 4 * hd), 19 + i, 0.3)
        if qwen3:
            w[f"{base}.self_attn.q_norm.weight"] = np.ones((hd,), np.float32)
            w[f"{base}.self_attn.k_norm.weight"] = np.ones((hd,), np.float32)
        w[f"{base}.mlp.gate_proj.weight"] = modulo_values((ffn, d), 7 + i, 0.3)
        w[f"{base}.mlp.up_proj.weight"] = modulo_values((ffn, d), 5 + i, 0.3)
        w[f"{base}.mlp.down_proj.weight"] = modulo_values((d, ffn), 3 + i, 0.3)
    save_file(w, str(path / "model.safetensors"))

    # WordLevel tokenizer covering w0..w79 (ids 0-79)
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    vocab_map = {f"w{i}": i for i in range(60)}
    vocab_map.update({"hello": 60, "world": 61, "tara": 62, ":": 63})
    tok = Tokenizer(WordLevel(vocab_map, unk_token="w0"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(path / "tokenizer.json"))
    return path


def make_silero_fixture(path: Path) -> Path:
    """Tiny Silero VAD checkpoint in the MLX-converted layout the reference
    consumes (vad_16k/vad_8k prefixes, conv [O,K,I], LSTM Wx/Wh/bias)."""
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps({
        "model_type": "silero_vad", "threshold": 0.5,
        "min_speech_duration_ms": 250, "min_silence_duration_ms": 100,
        "speech_pad_ms": 30,
    }))
    w = {}
    for prefix, cutoff, filt in (("vad_16k", 129, 256), ("vad_8k", 65, 128)):
        m = 7 if prefix == "vad_16k" else 11

        def conv(name, o, i, k, bias=True):
            w[f"{prefix}.{name}.weight"] = modulo_values((o, k, i), m, 0.2)  # [O,K,I]
            if bias:
                w[f"{prefix}.{name}.bias"] = modulo_values((o,), m, 0.01)

        conv("stft_conv", cutoff * 2, 1, filt, bias=False)
        conv("conv1", 128, cutoff, 3)
        conv("conv2", 64, 128, 3)
        conv("conv3", 64, 64, 3)
        conv("conv4", 128, 64, 3)
        w[f"{prefix}.lstm.Wx"] = modulo_values((512, 128), m, 0.1)
        w[f"{prefix}.lstm.Wh"] = modulo_values((512, 128), m + 2, 0.1)
        w[f"{prefix}.lstm.bias"] = modulo_values((512,), m, 0.01)
        conv("final_conv", 1, 128, 1)
    save_file(w, str(path / "model.safetensors"))
    return path


def make_parakeet_fixture(path: Path, vocab: int = 16, d_model: int = 32,
                          n_layers: int = 2, n_heads: int = 4,
                          features: int = 16, variant: str = "tdt",
                          pred_hidden: int = 16, joint_hidden: int = 16,
                          conv_ch: int = 8) -> Path:
    """Tiny Parakeet-TDT checkpoint in the MLX-community layout: pre_encode
    conv list indices, MLX conv/LSTM layouts, joint_net.2 naming. Pass
    real dims (d_model=1024, n_layers=24, ...) for benchmark-scale models."""
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    durations = [0, 1, 2, 3, 4] if variant == "tdt" else []
    vocab_list = [("▁" if i % 3 == 0 else "") + chr(ord("a") + i % 26)
                  for i in range(vocab)]
    cfg = {
        "model_type": "parakeet",
        "target": "nemo.collections.asr.models.EncDecRNNTBPEModel",
        "preprocessor": {
            "sample_rate": 16000, "normalize": "per_feature",
            "window_size": 0.025, "window_stride": 0.01, "window": "hann",
            "features": features, "n_fft": 512, "preemph": 0.97,
            "pad_to": 0, "log_zero_guard_value": 2**-24,
        },
        "encoder": {
            "feat_in": features, "n_layers": n_layers, "d_model": d_model,
            "n_heads": n_heads, "ff_expansion_factor": 4,
            "subsampling_factor": 4, "self_attention_model": "rel_pos",
            "subsampling": "dw_striding", "conv_kernel_size": 9,
            "subsampling_conv_channels": conv_ch, "xscaling": False,
        },
        "decoder": {"prednet": {"pred_hidden": pred_hidden, "pred_rnn_layers": 1}},
        "joint": {"jointnet": {"joint_hidden": joint_hidden, "activation": "relu",
                               "encoder_hidden": d_model, "pred_hidden": pred_hidden},
                  "vocabulary": vocab_list,
                  "num_extra_outputs": len(durations)},
        "decoding": {"model_type": variant, "durations": durations,
                     "greedy": {"max_symbols": 10}},
    }
    (path / "config.json").write_text(json.dumps(cfg))

    w = {}
    c = [0]

    def lin(name, o, i, bias=True):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.3)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 13, 0.01)

    def conv2d_mlx(name, o, h, k, i):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, h, k, i), 9 + c[0] % 5, 0.3)
        w[f"{name}.bias"] = modulo_values((o,), 7, 0.01)

    def conv1d_mlx(name, o, k, i, bias=True):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, k, i), 9 + c[0] % 5, 0.3)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 7, 0.01)

    # subsampling: factor 4 -> conv0 + one dw/pw pair (indices 2, 3)
    conv2d_mlx("encoder.pre_encode.conv.0", conv_ch, 3, 3, 1)
    conv2d_mlx("encoder.pre_encode.conv.2", conv_ch, 3, 3, 1)  # dw groups=ch
    conv2d_mlx("encoder.pre_encode.conv.3", conv_ch, 1, 1, conv_ch)
    f_out = features
    for _ in range(2):
        f_out = (f_out + 2 - 3) // 2 + 1
    lin("encoder.pre_encode.out", d_model, conv_ch * f_out)

    hd = d_model // n_heads
    for i in range(n_layers):
        base = f"encoder.layers.{i}"
        for nrm in ("norm_feed_forward1", "norm_self_att", "norm_conv",
                    "norm_feed_forward2", "norm_out"):
            w[f"{base}.{nrm}.weight"] = np.ones((d_model,), np.float32)
            w[f"{base}.{nrm}.bias"] = np.zeros((d_model,), np.float32)
        for ff in ("feed_forward1", "feed_forward2"):
            lin(f"{base}.{ff}.linear1", d_model * 4, d_model)
            lin(f"{base}.{ff}.linear2", d_model, d_model * 4)
        for proj in ("linear_q", "linear_k", "linear_v", "linear_out"):
            lin(f"{base}.self_attn.{proj}", d_model, d_model)
        lin(f"{base}.self_attn.linear_pos", d_model, d_model, bias=False)
        w[f"{base}.self_attn.pos_bias_u"] = modulo_values((n_heads, hd), 5, 0.1)
        w[f"{base}.self_attn.pos_bias_v"] = modulo_values((n_heads, hd), 3, 0.1)
        conv1d_mlx(f"{base}.conv.pointwise_conv1", d_model * 2, 1, d_model)
        conv1d_mlx(f"{base}.conv.depthwise_conv", d_model, 9, 1)
        conv1d_mlx(f"{base}.conv.pointwise_conv2", d_model, 1, d_model)
        w[f"{base}.conv.batch_norm.weight"] = np.ones((d_model,), np.float32)
        w[f"{base}.conv.batch_norm.bias"] = np.zeros((d_model,), np.float32)
        w[f"{base}.conv.batch_norm.running_mean"] = np.zeros((d_model,), np.float32)
        w[f"{base}.conv.batch_norm.running_var"] = np.ones((d_model,), np.float32)

    w["decoder.prediction.embed.weight"] = modulo_values((vocab + 1, pred_hidden), 17, 0.3)
    w["decoder.prediction.dec_rnn.lstm.0.Wx"] = modulo_values((4 * pred_hidden, pred_hidden), 19, 0.2)
    w["decoder.prediction.dec_rnn.lstm.0.Wh"] = modulo_values((4 * pred_hidden, pred_hidden), 23, 0.2)
    w["decoder.prediction.dec_rnn.lstm.0.bias"] = modulo_values((4 * pred_hidden,), 5, 0.01)
    lin("joint.enc", joint_hidden, d_model)
    lin("joint.pred", joint_hidden, pred_hidden)
    lin("joint.joint_net.2", vocab + 1 + len(durations), joint_hidden)

    save_file(w, str(path / "model.safetensors"))
    return path


def make_qwen3_tts_fixture(path: Path, with_icl: bool = False) -> Path:
    """Tiny Qwen3-TTS checkpoint: talker + code predictor (talker.* keys) and
    a speech_tokenizer/ subdirectory with the RVQ decoder. ``with_icl`` adds
    the ref-audio cloning components: a speaker encoder in the talker file
    (HF ``talker.speaker_encoder.*`` names) and a speech tokenizer encoder
    in HF qwen3 layout (``encoder.encoder.layers.N...``)."""
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    H, TH, CPH, G, CV = 16, 24, 16, 4, 32  # talker hid, text hid, cp hid, groups, codec vocab
    heads, kv, hd = 2, 2, 8
    cfg = {
        "model_type": "qwen3_tts",
        "tts_model_type": "base" if with_icl else "custom_voice",
        "tts_bos_token_id": 60, "tts_eos_token_id": 61, "tts_pad_token_id": 62,
        "talker_config": {
            "vocab_size": 1060 + 1024,  # leaves room for the suppressed band
            "hidden_size": H, "intermediate_size": 32,
            "num_hidden_layers": 2, "num_attention_heads": heads,
            "num_key_value_heads": kv, "head_dim": hd,
            "rms_norm_eps": 1e-6, "rope_theta": 10000.0,
            "num_code_groups": G, "text_hidden_size": TH,
            "text_vocab_size": 64,
            "codec_eos_token_id": 1056, "codec_think_id": 1026,
            "codec_nothink_id": 1025, "codec_think_bos_id": 1027,
            "codec_think_eos_id": 1028, "codec_pad_id": 1029,
            "codec_bos_id": 1030,
            "codec_language_id": {"english": 1031},
            "spk_id": {"vivian": 1040},
            "code_predictor_config": {
                "vocab_size": CV, "hidden_size": CPH, "intermediate_size": 32,
                "num_hidden_layers": 1, "num_attention_heads": heads,
                "num_key_value_heads": kv, "head_dim": hd,
                "num_code_groups": G,
            },
        },
    }
    (path / "config.json").write_text(json.dumps(cfg))

    w = {}
    c = [0]

    def lin(name, o, i, bias=False):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.2)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    def qwen_layer(base, hid, inter):
        lin(f"{base}.self_attn.q_proj", heads * hd, hid)
        lin(f"{base}.self_attn.k_proj", kv * hd, hid)
        lin(f"{base}.self_attn.v_proj", kv * hd, hid)
        lin(f"{base}.self_attn.o_proj", hid, heads * hd)
        w[f"{base}.self_attn.q_norm.weight"] = np.ones((hd,), np.float32)
        w[f"{base}.self_attn.k_norm.weight"] = np.ones((hd,), np.float32)
        w[f"{base}.input_layernorm.weight"] = np.ones((hid,), np.float32)
        w[f"{base}.post_attention_layernorm.weight"] = np.ones((hid,), np.float32)
        lin(f"{base}.mlp.gate_proj", inter, hid)
        lin(f"{base}.mlp.up_proj", inter, hid)
        lin(f"{base}.mlp.down_proj", hid, inter)

    V = cfg["talker_config"]["vocab_size"]
    w["talker.model.codec_embedding.weight"] = modulo_values((V, H), 13, 0.3)
    w["talker.model.text_embedding.weight"] = modulo_values((64, TH), 17, 0.3)
    for i in range(2):
        qwen_layer(f"talker.model.layers.{i}", H, 32)
    w["talker.model.norm.weight"] = np.ones((H,), np.float32)
    lin("talker.text_projection.linear_fc1", TH, TH, bias=True)
    lin("talker.text_projection.linear_fc2", H, TH, bias=True)
    lin("talker.codec_head", V, H)
    # code predictor (hidden == talker hidden -> no projection)
    for g in range(G - 1):
        w[f"talker.code_predictor.model.codec_embedding.{g}.weight"] = (
            modulo_values((CV, H), 19 + g, 0.3))
        lin(f"talker.code_predictor.lm_head.{g}", CV, CPH)
    qwen_layer("talker.code_predictor.model.layers.0", CPH, 32)
    w["talker.code_predictor.model.norm.weight"] = np.ones((CPH,), np.float32)
    if with_icl:
        # speaker encoder (Qwen3TTSSpeakerEncoder.swift) — tiny dims, torch
        # conv layout [O, I, K]
        cfg["speaker_encoder_config"] = {
            "mel_dim": 16, "enc_dim": H,
            "enc_channels": [8, 8, 8, 8, 24],
            "enc_kernel_sizes": [5, 3, 3, 3, 1],
            "enc_dilations": [1, 2, 3, 4, 1],
            "enc_attention_channels": 4, "enc_res2net_scale": 4,
            "enc_se_channels": 4, "sample_rate": 24000,
        }
        (path / "config.json").write_text(json.dumps(cfg))

        def spk_conv(name, o, i, k):
            c[0] += 1
            w[f"talker.speaker_encoder.{name}.weight"] = modulo_values(
                (o, i, k), 7 + c[0] % 5, 0.2)
            w[f"talker.speaker_encoder.{name}.bias"] = modulo_values(
                (o,), 3, 0.01)

        spk_conv("blocks.0.conv", 8, 16, 5)
        for b in (1, 2, 3):
            spk_conv(f"blocks.{b}.tdnn1.conv", 8, 8, 1)
            for j in range(3):  # res2net scale 4 -> 3 blocks of width 2
                spk_conv(f"blocks.{b}.res2net_block.blocks.{j}.conv", 2, 2, 3)
            spk_conv(f"blocks.{b}.tdnn2.conv", 8, 8, 1)
            spk_conv(f"blocks.{b}.se_block.conv1", 4, 8, 1)
            spk_conv(f"blocks.{b}.se_block.conv2", 8, 4, 1)
        spk_conv("mfa.conv", 24, 24, 1)
        spk_conv("asp.tdnn.conv", 4, 72, 1)
        spk_conv("asp.conv", 24, 4, 1)
        spk_conv("fc", H, 48, 1)
    save_file(w, str(path / "model.safetensors"))

    # tokenizer
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    vocab_map = {f"w{i}": i for i in range(55)}
    vocab_map.update({"hello": 55, "world": 56, "assistant": 57, "user": 58})
    tok = Tokenizer(WordLevel(vocab_map, unk_token="w0"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(path / "tokenizer.json"))

    # speech tokenizer decoder
    st = path / "speech_tokenizer"
    st.mkdir(exist_ok=True)
    st_cfg = {
        "latent_dim": 16, "codebook_dim": 8, "codebook_size": CV,
        "decoder_dim": 32, "num_quantizers": G, "num_semantic_quantizers": 1,
        "upsample_rates": [2, 2], "upsampling_ratios": [2],
        "hidden_size": 16, "intermediate_size": 32, "num_hidden_layers": 1,
        "num_attention_heads": 2, "num_key_value_heads": 2, "head_dim": 8,
        "sampling_rate": 24000,
    }
    (st / "config.json").write_text(json.dumps(st_cfg))
    sw = {}

    def slin(name, o, i, bias=True):
        c[0] += 1
        sw[f"{name}.weight"] = modulo_values((o, i), 7 + c[0] % 5, 0.2)
        if bias:
            sw[f"{name}.bias"] = modulo_values((o,), 3, 0.01)

    def sconv(name, o, i, k, bias=True, transpose=False):
        c[0] += 1
        shape = (i, o, k) if transpose else (o, i, k)
        sw[f"{name}.weight"] = modulo_values(shape, 7 + c[0] % 5, 0.2)
        if bias:
            sw[f"{name}.bias"] = modulo_values((o,), 3, 0.01)

    vq_dim = 4  # codebook_dim / 2
    sw["quantizer.rvq_first.vq.layers.0.codebook.embed"] = modulo_values((CV, vq_dim), 23, 0.5)
    sconv("quantizer.rvq_first.output_proj", 8, vq_dim, 1, bias=False)
    for i in range(G - 1):
        sw[f"quantizer.rvq_rest.vq.layers.{i}.codebook.embed"] = modulo_values(
            (CV, vq_dim), 29 + i, 0.5)
    sconv("quantizer.rvq_rest.output_proj", 8, vq_dim, 1, bias=False)
    sconv("pre_conv.conv", 16, 8, 3)
    slin("pre_transformer.input_proj", 16, 16)
    slin("pre_transformer.output_proj", 16, 16)
    sw["pre_transformer.norm.weight"] = np.ones((16,), np.float32)
    base = "pre_transformer.layers.0"
    for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
        slin(f"{base}.self_attn.{proj}", 16, 16, bias=False)
    sw[f"{base}.input_layernorm.weight"] = np.ones((16,), np.float32)
    sw[f"{base}.post_attention_layernorm.weight"] = np.ones((16,), np.float32)
    sw[f"{base}.self_attn_layer_scale.scale"] = np.full((16,), 0.01, np.float32)
    sw[f"{base}.mlp_layer_scale.scale"] = np.full((16,), 0.01, np.float32)
    for proj, o, i in (("gate_proj", 32, 16), ("up_proj", 32, 16), ("down_proj", 16, 32)):
        slin(f"{base}.mlp.{proj}", o, i, bias=False)
    # upsample (ratio 2)
    sconv("upsample.0.conv_t.conv", 16, 16, 2, transpose=True)
    sconv("upsample.0.convnext.dwconv.conv", 16, 1, 7)
    sw["upsample.0.convnext.norm.weight"] = np.ones((16,), np.float32)
    sw["upsample.0.convnext.norm.bias"] = np.zeros((16,), np.float32)
    slin("upsample.0.convnext.pwconv1", 64, 16)
    slin("upsample.0.convnext.pwconv2", 16, 64)
    sw["upsample.0.convnext.gamma"] = np.full((16,), 1e-6, np.float32)
    # decoder stack: 0 conv, 1..2 blocks (rates 2,2), 3 snake, 4 out conv
    sconv("decoder.0.conv", 32, 16, 7)
    dims = [(32, 16), (16, 8)]
    for b_i, (ind, outd) in enumerate(dims):
        db = f"decoder.{1+b_i}.block"
        sw[f"{db}.0.alpha"] = np.zeros((ind,), np.float32)
        sw[f"{db}.0.beta"] = np.zeros((ind,), np.float32)
        sconv(f"{db}.1.conv", outd, ind, 4, transpose=True)
        for j in range(3):
            rb = f"{db}.{2+j}"
            sw[f"{rb}.act1.alpha"] = np.zeros((outd,), np.float32)
            sw[f"{rb}.act1.beta"] = np.zeros((outd,), np.float32)
            sconv(f"{rb}.conv1.conv", outd, outd, 7)
            sw[f"{rb}.act2.alpha"] = np.zeros((outd,), np.float32)
            sw[f"{rb}.act2.beta"] = np.zeros((outd,), np.float32)
            sconv(f"{rb}.conv2.conv", outd, outd, 1)
    sw["decoder.3.alpha"] = np.zeros((8,), np.float32)
    sw["decoder.3.beta"] = np.zeros((8,), np.float32)
    sconv("decoder.4.conv", 1, 8, 7)
    if with_icl:
        # speech tokenizer ENCODER in HF qwen3 layout (4-ratio SEANet +
        # transformer + downsample + split RVQ), tiny dims; the qwen3_codec
        # sanitize maps these onto the mimi tree
        st_cfg["encoder_valid_num_quantizers"] = G
        st_cfg["encoder_config"] = {
            "hidden_size": 16, "audio_channels": 1, "num_filters": 2,
            "num_residual_layers": 1, "upsampling_ratios": [2, 2, 2, 2],
            "kernel_size": 7, "residual_kernel_size": 3,
            "last_kernel_size": 3, "dilation_growth_rate": 2, "compress": 2,
            "num_attention_heads": 2, "num_hidden_layers": 1,
            "intermediate_size": 32, "layer_scale_initial_scale": 0.01,
            "sliding_window": 64, "rope_theta": 10000.0,
            "num_quantizers": G, "codebook_size": CV, "codebook_dim": 4,
            "sampling_rate": 256, "frame_rate": 8.0,
        }
        (st / "config.json").write_text(json.dumps(st_cfg))

        def econv(name, o, i, k):
            c[0] += 1
            sw[f"encoder.encoder.layers.{name}.weight"] = modulo_values(
                (o, i, k), 7 + c[0] % 5, 0.2)
            sw[f"encoder.encoder.layers.{name}.bias"] = modulo_values(
                (o,), 3, 0.01)

        econv("0.conv", 2, 1, 7)  # init
        ch = 2
        for n_res, n_down in ((1, 3), (4, 6), (7, 9), (10, 12)):
            econv(f"{n_res}.block.1.conv", max(ch // 2, 1), ch, 3)
            econv(f"{n_res}.block.3.conv", ch, max(ch // 2, 1), 1)
            econv(f"{n_down}.conv", ch * 2, ch, 4)
            ch *= 2
        econv("14.conv", 16, ch, 3)  # final -> hidden 16
        base = "encoder.encoder_transformer.layers.0"
        for proj in ("q_proj", "k_proj", "v_proj"):
            c[0] += 1
            sw[f"{base}.self_attn.{proj}.weight"] = modulo_values(
                (16, 16), 7 + c[0] % 5, 0.2)
        sw[f"{base}.self_attn.out_proj.weight"] = modulo_values((16, 16), 9, 0.2)
        sw[f"{base}.mlp.fc1.weight"] = modulo_values((32, 16), 11, 0.2)
        sw[f"{base}.mlp.fc2.weight"] = modulo_values((16, 32), 13, 0.2)
        for ln in ("input_layernorm", "post_attention_layernorm"):
            sw[f"{base}.{ln}.weight"] = np.ones((16,), np.float32)
            sw[f"{base}.{ln}.bias"] = np.zeros((16,), np.float32)
        sw[f"{base}.self_attn_layer_scale.scale"] = np.full((16,), 0.01, np.float32)
        sw[f"{base}.mlp_layer_scale.scale"] = np.full((16,), 0.01, np.float32)
        # downsample: 256 Hz audio / 16x seanet = 16 fps enc, frame_rate 8
        # -> stride 2, kernel 2*stride = 4
        sw["encoder.downsample.weight"] = modulo_values((16, 16, 4), 17, 0.2)
        # quantizer: semantic 1 + acoustic G-1, EMA codebooks
        eq = "encoder.quantizer"
        sw[f"{eq}.semantic_residual_vector_quantizer.input_proj.weight"] = (
            modulo_values((4, 16, 1), 19, 0.3))
        sw[f"{eq}.semantic_residual_vector_quantizer.layers.0.codebook"
           ".embed_sum"] = modulo_values((CV, 4), 23, 0.5)
        sw[f"{eq}.semantic_residual_vector_quantizer.layers.0.codebook"
           ".cluster_usage"] = np.ones((CV,), np.float32)
        sw[f"{eq}.acoustic_residual_vector_quantizer.input_proj.weight"] = (
            modulo_values((4, 16, 1), 29, 0.3))
        for i in range(G - 1):
            sw[f"{eq}.acoustic_residual_vector_quantizer.layers.{i}.codebook"
               ".embed_sum"] = modulo_values((CV, 4), 31 + i, 0.5)
            sw[f"{eq}.acoustic_residual_vector_quantizer.layers.{i}.codebook"
               ".cluster_usage"] = np.ones((CV,), np.float32)
    save_file(sw, str(st / "model.safetensors"))
    return path


def make_sortformer_fixture(path: Path, H: int = 16, TF: int = 8,
                            CH: int = 8, MELS: int = 16, HEADS: int = 2,
                            fc_layers: int = 2, tf_layers: int = 2,
                            fc_ffn: int = 32, tf_ffn: int = 16,
                            tf_heads: int = 2) -> Path:
    """Tiny Sortformer checkpoint (torch-canonical layouts). Pass real
    dims (H=512, fc_layers=18, TF=192, tf_layers=18, MELS=128, CH=256)
    for benchmark-scale models."""
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    cfg = {
        "model_type": "sortformer",
        "fc_encoder_config": {
            "hidden_size": H, "num_hidden_layers": fc_layers,
            "num_attention_heads": HEADS, "intermediate_size": fc_ffn,
            "num_mel_bins": MELS, "conv_kernel_size": 9,
            "subsampling_factor": 8, "subsampling_conv_channels": CH,
        },
        "tf_encoder_config": {
            "d_model": TF, "encoder_layers": tf_layers,
            "encoder_attention_heads": tf_heads,
            "encoder_ffn_dim": tf_ffn, "max_source_positions": 500,
        },
        "modules_config": {
            "num_speakers": 4, "fc_d_model": H, "tf_d_model": TF,
            "spkcache_len": 16, "fifo_len": 16, "spkcache_update_period": 64,
            "spkcache_sil_frames_per_spk": 1, "use_aosc": True,
        },
        "processor_config": {"feature_size": MELS},
    }
    (path / "config.json").write_text(json.dumps(cfg))
    w = {}
    c = [0]

    def lin(name, o, i, bias=True):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.2)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    def conv2(name, o, i, k):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i, k, k), 9 + c[0] % 5, 0.2)
        w[f"{name}.bias"] = modulo_values((o,), 3, 0.01)

    sub = "fc_encoder.subsampling"
    conv2(f"{sub}.layers_0", CH, 1, 3)
    conv2(f"{sub}.layers_2", CH, 1, 3)  # depthwise
    conv2(f"{sub}.layers_3", CH, CH, 1)
    conv2(f"{sub}.layers_5", CH, 1, 3)
    conv2(f"{sub}.layers_6", CH, CH, 1)
    f_out = MELS
    for _ in range(3):
        f_out = (f_out - 1) // 2 + 1
    lin(f"{sub}.linear", H, CH * f_out)
    for i in range(fc_layers):
        base = f"fc_encoder.layers.{i}"
        for nrm in ("norm_feed_forward1", "norm_self_att", "norm_conv",
                    "norm_feed_forward2", "norm_out"):
            w[f"{base}.{nrm}.weight"] = np.ones((H,), np.float32)
            w[f"{base}.{nrm}.bias"] = np.zeros((H,), np.float32)
        for ff in ("feed_forward1", "feed_forward2"):
            lin(f"{base}.{ff}.linear1", fc_ffn, H)
            lin(f"{base}.{ff}.linear2", H, fc_ffn)
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            lin(f"{base}.self_attn.{proj}", H, H)
        lin(f"{base}.self_attn.relative_k_proj", H, H, bias=False)
        w[f"{base}.self_attn.bias_u"] = modulo_values((HEADS, H // HEADS), 5, 0.1)
        w[f"{base}.self_attn.bias_v"] = modulo_values((HEADS, H // HEADS), 7, 0.1)
        c[0] += 1
        w[f"{base}.conv.pointwise_conv1.weight"] = modulo_values((2 * H, H, 1), 9, 0.2)
        w[f"{base}.conv.pointwise_conv1.bias"] = modulo_values((2 * H,), 3, 0.01)
        w[f"{base}.conv.depthwise_conv.weight"] = modulo_values((H, 1, 9), 11, 0.2)
        w[f"{base}.conv.depthwise_conv.bias"] = modulo_values((H,), 3, 0.01)
        w[f"{base}.conv.pointwise_conv2.weight"] = modulo_values((H, H, 1), 13, 0.2)
        w[f"{base}.conv.pointwise_conv2.bias"] = modulo_values((H,), 3, 0.01)
        w[f"{base}.conv.norm.weight"] = np.ones((H,), np.float32)
        w[f"{base}.conv.norm.bias"] = np.zeros((H,), np.float32)
        w[f"{base}.conv.norm.running_mean"] = np.zeros((H,), np.float32)
        w[f"{base}.conv.norm.running_var"] = np.ones((H,), np.float32)
    w["tf_encoder.embed_positions.weight"] = modulo_values((500, TF), 17, 0.2)
    for i in range(tf_layers):
        base = f"tf_encoder.layers.{i}"
        lin(f"{base}.self_attn.q_proj", TF, TF)
        lin(f"{base}.self_attn.k_proj", TF, TF, bias=False)
        lin(f"{base}.self_attn.v_proj", TF, TF)
        lin(f"{base}.self_attn.out_proj", TF, TF)
        w[f"{base}.self_attn_layer_norm.weight"] = np.ones((TF,), np.float32)
        w[f"{base}.self_attn_layer_norm.bias"] = np.zeros((TF,), np.float32)
        lin(f"{base}.fc1", tf_ffn, TF)
        lin(f"{base}.fc2", TF, tf_ffn)
        w[f"{base}.final_layer_norm.weight"] = np.ones((TF,), np.float32)
        w[f"{base}.final_layer_norm.bias"] = np.zeros((TF,), np.float32)
    lin("sortformer_modules.encoder_proj", TF, H)
    lin("sortformer_modules.first_hidden_to_hidden", TF, TF)
    lin("sortformer_modules.single_hidden_to_spks", 4, TF)
    lin("sortformer_modules.hidden_to_spks", 4, 2 * TF)
    save_file(w, str(path / "model.safetensors"))
    return path


def make_qwen3_asr_fixture(path: Path) -> Path:
    """Tiny Qwen3-ASR checkpoint: block-attention audio tower + Qwen3 LM."""
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    AD, AH, DS, MELS, OUT = 16, 2, 4, 16, 24
    TH, THEADS, TKV, VOCAB = 24, 2, 2, 80
    cfg = {
        "model_type": "qwen3_asr",
        "audio_token_id": 70,
        "support_languages": ["English", "Chinese"],
        "audio_config": {
            "d_model": AD, "encoder_layers": 1, "encoder_attention_heads": AH,
            "encoder_ffn_dim": 32, "downsample_hidden_size": DS,
            "num_mel_bins": MELS, "output_dim": OUT, "n_window": 4,
            "n_window_infer": 16,
        },
        "text_config": {
            "hidden_size": TH, "num_hidden_layers": 2,
            "intermediate_size": 48, "num_attention_heads": THEADS,
            "num_key_value_heads": TKV, "vocab_size": VOCAB,
            "rope_theta": 10000.0, "rms_norm_eps": 1e-6,
            "tie_word_embeddings": True,
        },
    }
    (path / "config.json").write_text(json.dumps(cfg))
    w = {}
    c = [0]

    def lin(name, o, i, bias=False):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.2)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    at = "audio_tower"
    for i, (o, ic) in enumerate([(DS, 1), (DS, DS), (DS, DS)], 1):
        c[0] += 1
        w[f"{at}.conv2d{i}.weight"] = modulo_values((o, ic, 3, 3), 9 + i, 0.2)
        w[f"{at}.conv2d{i}.bias"] = modulo_values((o,), 3, 0.01)
    f_after = MELS
    for _ in range(3):
        f_after = (f_after - 1) // 2 + 1
    lin(f"{at}.conv_out", AD, DS * f_after)
    base = f"{at}.layers.0"
    for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
        lin(f"{base}.self_attn.{proj}", AD, AD, bias=True)
    for nrm in ("self_attn_layer_norm", "final_layer_norm"):
        w[f"{base}.{nrm}.weight"] = np.ones((AD,), np.float32)
        w[f"{base}.{nrm}.bias"] = np.zeros((AD,), np.float32)
    lin(f"{base}.fc1", 32, AD, bias=True)
    lin(f"{base}.fc2", AD, 32, bias=True)
    w[f"{at}.ln_post.weight"] = np.ones((AD,), np.float32)
    w[f"{at}.ln_post.bias"] = np.zeros((AD,), np.float32)
    lin(f"{at}.proj1", AD, AD, bias=True)
    lin(f"{at}.proj2", OUT, AD, bias=True)

    hd = TH // THEADS
    w["model.embed_tokens.weight"] = modulo_values((VOCAB, TH), 13, 0.3)
    w["model.norm.weight"] = np.ones((TH,), np.float32)
    for i in range(2):
        base = f"model.layers.{i}"
        w[f"{base}.input_layernorm.weight"] = np.ones((TH,), np.float32)
        w[f"{base}.post_attention_layernorm.weight"] = np.ones((TH,), np.float32)
        lin(f"{base}.self_attn.q_proj", THEADS * hd, TH)
        lin(f"{base}.self_attn.k_proj", TKV * hd, TH)
        lin(f"{base}.self_attn.v_proj", TKV * hd, TH)
        lin(f"{base}.self_attn.o_proj", TH, THEADS * hd)
        w[f"{base}.self_attn.q_norm.weight"] = np.ones((hd,), np.float32)
        w[f"{base}.self_attn.k_norm.weight"] = np.ones((hd,), np.float32)
        lin(f"{base}.mlp.gate_proj", 48, TH)
        lin(f"{base}.mlp.up_proj", 48, TH)
        lin(f"{base}.mlp.down_proj", TH, 48)
    save_file(w, str(path / "model.safetensors"))

    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    # ids must be collision-free: the tokenizers WordLevel reverse map drops
    # one of two tokens sharing an id NONDETERMINISTICALLY per load (Rust
    # HashMap order), which made prompt encodings flip across processes
    vocab_map = {f"w{i}": i for i in range(60)}  # no id holes before specials
    vocab_map.update({"hello": 60, "system": 61, "user": 62, "assistant": 63,
                      "w64": 64, "w65": 65})
    specials = ["<|im_start|>", "<|im_end|>", "<|audio_start|>",
                "<|audio_end|>", "<|audio_pad|>", "<asr_text>"]
    for j, s in enumerate(specials):
        vocab_map[s] = 66 + j  # audio_pad -> 70
    tok = Tokenizer(WordLevel(vocab_map, unk_token="w0"))
    tok.pre_tokenizer = Whitespace()
    tok.add_special_tokens(specials)
    tok.save(str(path / "tokenizer.json"))
    return path


def make_qwen3_aligner_fixture(path: Path) -> Path:
    """Tiny Qwen3 forced-aligner checkpoint: the qwen3_asr fixture plus a
    timestamp classification lm_head and a ``<timestamp>`` special token.
    Detected by repo/dir name like the reference (App.swift:448-452), so the
    caller should pass a path whose name contains ``forced-aligner``."""
    from safetensors.numpy import load_file, save_file
    from tokenizers import Tokenizer

    path = make_qwen3_asr_fixture(path)
    w = dict(load_file(str(path / "model.safetensors")))
    w["lm_head.weight"] = modulo_values((40, 24), 19, 0.2)
    save_file(w, str(path / "model.safetensors"))

    tok = Tokenizer.from_file(str(path / "tokenizer.json"))
    tok.add_special_tokens(["<timestamp>"])
    tok.save(str(path / "tokenizer.json"))
    # derive the id from a reload: it must be stable across save/load
    ts_id = Tokenizer.from_file(
        str(path / "tokenizer.json")).token_to_id("<timestamp>")
    assert ts_id == 72, ts_id

    cfg = json.loads((path / "config.json").read_text())
    cfg.update(classify_num=40, timestamp_token_id=ts_id,
               timestamp_segment_time=80.0)
    (path / "config.json").write_text(json.dumps(cfg))
    return path


def serialize_sp_model(pieces, model_type: int = 1) -> bytes:
    """Hand-serialize a SentencePiece ModelProto: repeated pieces (field 1:
    piece=1 str, score=2 float32, type=3 enum) + TrainerSpec.model_type
    (field 2 -> field 3). Assumes all lengths < 128 (tiny fixtures)."""
    import struct

    out = b""
    for tok, score, ty in pieces:
        tb = tok.encode("utf-8")
        body = bytes([0x0A, len(tb)]) + tb
        body += bytes([0x15]) + struct.pack("<f", score)
        body += bytes([0x18, ty])
        out += bytes([0x0A, len(body)]) + body
    ts = bytes([0x18, model_type])
    out += bytes([0x12, len(ts)]) + ts
    return out


def make_cohere_fixture(path: Path) -> Path:
    """Tiny CohereTranscribe checkpoint with NeMo-style keys (exercises the
    full sanitize mapping) + a hand-serialized sentencepiece tokenizer.model
    and special tokens in tokenizer_config.json."""
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    D, CH, MELS, H, INNER, VOCAB = 16, 4, 16, 16, 32, 64
    cfg = {
        "model_type": "cohere_asr",
        "sample_rate": 16000,
        "max_audio_clip_s": 30,
        "head": {"num_classes": VOCAB},
        "encoder": {
            "d_model": D, "ff_expansion_factor": 2, "n_heads": 2,
            "conv_kernel_size": 5, "n_layers": 1, "pos_emb_max_len": 64,
            "subsampling_conv_channels": CH, "subsampling_factor": 8,
            "feat_in": MELS,
        },
        "transf_decoder": {"config_dict": {
            "hidden_size": H, "inner_size": INNER,
            "num_attention_heads": 2, "num_layers": 1,
            "max_sequence_length": 64,
        }},
    }
    (path / "config.json").write_text(json.dumps(cfg))

    w = {}
    c = [0]

    def lin(name, o, i, bias=True):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.15)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    def ln(name):
        w[f"{name}.weight"] = np.ones((D,), np.float32)
        w[f"{name}.bias"] = np.zeros((D,), np.float32)

    # subsampling (torch conv2d layouts, NeMo flat-index keys)
    pre = "encoder.pre_encode"
    w[f"{pre}.conv.0.weight"] = modulo_values((CH, 1, 3, 3), 7, 0.2)
    w[f"{pre}.conv.0.bias"] = modulo_values((CH,), 3, 0.01)
    w[f"{pre}.conv.2.weight"] = modulo_values((CH, 1, 3, 3), 9, 0.2)
    w[f"{pre}.conv.2.bias"] = modulo_values((CH,), 4, 0.01)
    w[f"{pre}.conv.3.weight"] = modulo_values((CH, CH, 1, 1), 11, 0.2)
    w[f"{pre}.conv.3.bias"] = modulo_values((CH,), 5, 0.01)
    w[f"{pre}.conv.5.weight"] = modulo_values((CH, 1, 3, 3), 13, 0.2)
    w[f"{pre}.conv.5.bias"] = modulo_values((CH,), 6, 0.01)
    w[f"{pre}.conv.6.weight"] = modulo_values((CH, CH, 1, 1), 15, 0.2)
    w[f"{pre}.conv.6.bias"] = modulo_values((CH,), 7, 0.01)
    lin(f"{pre}.out", D, CH * (MELS // 8))

    base = "encoder.layers.0"
    for nm in ("norm_feed_forward1", "norm_self_att", "norm_conv",
               "norm_feed_forward2", "norm_out"):
        ln(f"{base}.{nm}")
    for ff in ("feed_forward1", "feed_forward2"):
        lin(f"{base}.{ff}.linear1", D * 2, D)
        lin(f"{base}.{ff}.linear2", D, D * 2)
    for proj in ("linear_q", "linear_k", "linear_v", "linear_out"):
        lin(f"{base}.self_attn.{proj}", D, D)
    lin(f"{base}.self_attn.linear_pos", D, D, bias=False)
    w[f"{base}.self_attn.pos_bias_u"] = modulo_values((2, D // 2), 7, 0.05)
    w[f"{base}.self_attn.pos_bias_v"] = modulo_values((2, D // 2), 9, 0.05)
    w[f"{base}.conv.pointwise_conv1.weight"] = modulo_values((D * 2, D, 1), 8, 0.15)
    w[f"{base}.conv.pointwise_conv1.bias"] = modulo_values((D * 2,), 3, 0.01)
    w[f"{base}.conv.depthwise_conv.weight"] = modulo_values((D, 1, 5), 10, 0.15)
    w[f"{base}.conv.depthwise_conv.bias"] = modulo_values((D,), 4, 0.01)
    w[f"{base}.conv.batch_norm.weight"] = np.ones((D,), np.float32)
    w[f"{base}.conv.batch_norm.bias"] = np.zeros((D,), np.float32)
    w[f"{base}.conv.batch_norm.running_mean"] = np.zeros((D,), np.float32)
    w[f"{base}.conv.batch_norm.running_var"] = np.ones((D,), np.float32)
    w[f"{base}.conv.batch_norm.num_batches_tracked"] = np.zeros((), np.int64)
    w[f"{base}.conv.pointwise_conv2.weight"] = modulo_values((D, D, 1), 12, 0.15)
    w[f"{base}.conv.pointwise_conv2.bias"] = modulo_values((D,), 5, 0.01)

    # decoder (NeMo underscore-prefixed module names)
    w["transf_decoder._embedding.token_embedding.weight"] = \
        modulo_values((VOCAB, H), 13, 0.3)
    w["transf_decoder._embedding.layer_norm.weight"] = np.ones((H,), np.float32)
    w["transf_decoder._embedding.layer_norm.bias"] = np.zeros((H,), np.float32)
    dbase = "transf_decoder._decoder.layers.0"
    for nm in ("layer_norm_1", "layer_norm_2", "layer_norm_3"):
        w[f"{dbase}.{nm}.weight"] = np.ones((H,), np.float32)
        w[f"{dbase}.{nm}.bias"] = np.zeros((H,), np.float32)
    for sub in ("first_sub_layer", "second_sub_layer"):
        for proj in ("query_net", "key_net", "value_net", "out_projection"):
            lin(f"{dbase}.{sub}.{proj}", H, H)
    lin(f"{dbase}.third_sub_layer.dense_in", INNER, H)
    lin(f"{dbase}.third_sub_layer.dense_out", H, INNER)
    w["transf_decoder._decoder.final_layer_norm.weight"] = np.ones((H,), np.float32)
    w["transf_decoder._decoder.final_layer_norm.bias"] = np.zeros((H,), np.float32)
    lin("log_softmax.mlp.layer0", VOCAB, H)
    save_file(w, str(path / "model.safetensors"))

    # sentencepiece vocab: ids 0..39; specials 40..50 via tokenizer_config
    pieces = [("<unk>", 0.0, 2)]
    pieces += [(f"▁w{i}", -float(i), 1) for i in range(1, 20)]
    pieces += [(ch, -25.0, 1) for ch in "abcdefghij"]
    pieces += [(f"<0x{b:02X}>", 0.0, 6) for b in range(10)]
    (path / "tokenizer.model").write_bytes(serialize_sp_model(pieces))
    specials = ["<|startofcontext|>", "<|startoftranscript|>",
                "<|emo:undefined|>", "<|en|>", "<|pnc|>", "<|nopnc|>",
                "<|noitn|>", "<|notimestamp|>", "<|timestamp|>",
                "<|nodiarize|>", "<|endoftext|>"]
    (path / "tokenizer_config.json").write_text(json.dumps({
        "added_tokens_decoder": {
            str(40 + i): {"content": s} for i, s in enumerate(specials)
        }
    }))
    return path


def make_granite_fixture(path: Path) -> Path:
    """Tiny GraniteSpeech: block-attention conformer + QFormer + Granite LM."""
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    ED, HD, NH = 12, 6, 2          # encoder hidden, dim_head, heads
    PD, TH, VOCAB = 12, 16, 96     # projector hidden, text hidden, vocab
    CS = 8                          # context_size
    cfg = {
        "model_type": "granite_speech",
        "audio_token_index": 90,
        "downsample_rate": 5,
        "window_size": 15,
        "encoder_config": {
            "input_dim": 160, "num_layers": 2, "hidden_dim": ED,
            "feedforward_mult": 2, "num_heads": NH, "dim_head": HD,
            "output_dim": 10, "context_size": CS, "max_pos_emb": 16,
            "conv_kernel_size": 4, "conv_expansion_factor": 2,
        },
        "projector_config": {
            "hidden_size": PD, "num_hidden_layers": 1,
            "num_attention_heads": 2, "intermediate_size": 24,
            "layer_norm_eps": 1e-12, "encoder_hidden_size": ED,
        },
        "text_config": {
            "hidden_size": TH, "num_hidden_layers": 2,
            "intermediate_size": 32, "num_attention_heads": 2,
            "num_key_value_heads": 2, "vocab_size": VOCAB,
            "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
            "tie_word_embeddings": True,
            "attention_multiplier": 0.125, "embedding_multiplier": 12.0,
            "residual_multiplier": 0.22, "logits_scaling": 8.0,
        },
    }
    (path / "config.json").write_text(json.dumps(cfg))

    w = {}
    c = [0]

    def lin(name, o, i, bias=True):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.12)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    def ln(name, d):
        w[f"{name}.weight"] = np.ones((d,), np.float32)
        w[f"{name}.bias"] = np.zeros((d,), np.float32)

    inner_attn = NH * HD
    inner_conv = ED * 2
    lin("encoder.input_linear", ED, 160)
    for i in range(2):
        b = f"encoder.layers.{i}"
        for ff in ("ff1", "ff2"):
            ln(f"{b}.{ff}.pre_norm", ED)
            lin(f"{b}.{ff}.up_proj", ED * 2, ED)
            lin(f"{b}.{ff}.down_proj", ED, ED * 2)
        ln(f"{b}.attn.pre_norm", ED)
        lin(f"{b}.attn.to_q", inner_attn, ED, bias=False)
        lin(f"{b}.attn.to_kv", inner_attn * 2, ED, bias=False)
        lin(f"{b}.attn.to_out", ED, inner_attn)
        w[f"{b}.attn.rel_pos_emb.weight"] = modulo_values((33, HD), 9, 0.05)
        ln(f"{b}.conv.norm", ED)
        w[f"{b}.conv.up_conv.weight"] = modulo_values(
            (inner_conv * 2, ED, 1), 8, 0.12)
        w[f"{b}.conv.up_conv.bias"] = modulo_values((inner_conv * 2,), 3, 0.01)
        w[f"{b}.conv.depth_conv.conv.weight"] = modulo_values(
            (inner_conv, 1, 4), 10, 0.12)
        w[f"{b}.conv.batch_norm.weight"] = np.ones((inner_conv,), np.float32)
        w[f"{b}.conv.batch_norm.bias"] = np.zeros((inner_conv,), np.float32)
        w[f"{b}.conv.batch_norm.running_mean"] = np.zeros(
            (inner_conv,), np.float32)
        w[f"{b}.conv.batch_norm.running_var"] = np.ones(
            (inner_conv,), np.float32)
        w[f"{b}.conv.down_conv.weight"] = modulo_values((ED, inner_conv, 1),
                                                        12, 0.12)
        w[f"{b}.conv.down_conv.bias"] = modulo_values((ED,), 5, 0.01)
        ln(f"{b}.post_norm", ED)
    lin("encoder.out", 10, ED)
    lin("encoder.out_mid", ED, 10)

    w["projector.query"] = modulo_values((1, 3, PD), 7, 0.1)
    ln("projector.qformer.layernorm", PD)
    b = "projector.qformer.encoder.layer.0"
    for attn, kvd in (("attention", PD), ("crossattention", ED)):
        lin(f"{b}.{attn}.attention.query", PD, PD)
        lin(f"{b}.{attn}.attention.key", PD, kvd)
        lin(f"{b}.{attn}.attention.value", PD, kvd)
        lin(f"{b}.{attn}.output.dense", PD, PD)
        ln(f"{b}.{attn}.output.LayerNorm", PD)
    lin(f"{b}.intermediate_query.dense", 24, PD)
    lin(f"{b}.output_query.dense", PD, 24)
    ln(f"{b}.output_query.LayerNorm", PD)
    lin("projector.linear", TH, PD)

    hd = TH // 2
    w["language_model.model.embed_tokens.weight"] = modulo_values(
        (VOCAB, TH), 13, 0.3)
    w["language_model.model.norm.weight"] = np.ones((TH,), np.float32)
    for i in range(2):
        b = f"language_model.model.layers.{i}"
        w[f"{b}.input_layernorm.weight"] = np.ones((TH,), np.float32)
        w[f"{b}.post_attention_layernorm.weight"] = np.ones((TH,), np.float32)
        lin(f"{b}.self_attn.q_proj", TH, TH, bias=False)
        lin(f"{b}.self_attn.k_proj", TH, TH, bias=False)
        lin(f"{b}.self_attn.v_proj", TH, TH, bias=False)
        lin(f"{b}.self_attn.o_proj", TH, TH, bias=False)
        lin(f"{b}.mlp.gate_proj", 32, TH, bias=False)
        lin(f"{b}.mlp.up_proj", 32, TH, bias=False)
        lin(f"{b}.mlp.down_proj", TH, 32, bias=False)
    save_file(w, str(path / "model.safetensors"))

    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    vocab_map = {f"w{i}": i for i in range(85)}
    specials = ["<|start_of_role|>", "<|end_of_role|>", "<|end_of_text|>",
                "user", "assistant", "<|audio|>"]
    for j, s in enumerate(specials):
        vocab_map[s] = 85 + j  # <|audio|> -> 90
    tok = Tokenizer(WordLevel(vocab_map, unk_token="w0"))
    tok.pre_tokenizer = Whitespace()
    tok.add_special_tokens(specials)
    tok.save(str(path / "tokenizer.json"))
    (path / "tokenizer_config.json").write_text(json.dumps(
        {"eos_token": "<|end_of_text|>"}))
    return path


def make_voxtral_fixture(path: Path) -> Path:
    """Tiny VoxtralRealtime checkpoint with raw Mistral-style keys
    (exercises the sanitize renames) and a tekken.json tokenizer."""
    import base64

    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    ED, EH, EHD, EFF, MELS = 8, 2, 4, 16, 16
    DD, DH, DKV, DHD, DFF, VOCAB = 12, 2, 1, 6, 24, 64
    cfg = {
        "model_type": "voxtral_realtime",
        "encoder_args": {
            "dim": ED, "n_layers": 1, "n_heads": EH, "head_dim": EHD,
            "hidden_dim": EFF, "n_kv_heads": EH, "rope_theta": 10000.0,
            "sliding_window": 64, "downsample_factor": 4,
            "audio_encoding_args": {"num_mel_bins": MELS,
                                    "global_log_mel_max": 1.5},
        },
        "decoder": {
            "dim": DD, "n_layers": 1, "n_heads": DH, "n_kv_heads": DKV,
            "head_dim": DHD, "hidden_dim": DFF, "vocab_size": VOCAB,
            "rope_theta": 10000.0, "sliding_window": 32,
            "ada_rms_norm_t_cond": True, "ada_rms_norm_t_cond_dim": 4,
        },
        "transcription_delay_ms": 80,
        "bos_token_id": 1, "eos_token_id": 2,
        "streaming_pad_token_id": 3, "n_left_pad_tokens": 1,
    }
    (path / "config.json").write_text(json.dumps(cfg))

    w = {}
    c = [0]

    def lin(name, o, i, bias=False):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.12)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    enc = "mm_streams_embeddings.embedding_module.whisper_encoder"
    w[f"{enc}.conv_layers.0.conv.weight"] = modulo_values((ED, MELS, 3), 7, 0.15)
    w[f"{enc}.conv_layers.0.conv.bias"] = modulo_values((ED,), 3, 0.01)
    w[f"{enc}.conv_layers.1.conv.weight"] = modulo_values((ED, ED, 3), 9, 0.15)
    w[f"{enc}.conv_layers.1.conv.bias"] = modulo_values((ED,), 4, 0.01)
    b = f"{enc}.transformer.layers.0"
    w[f"{b}.attention_norm.weight"] = np.ones((ED,), np.float32)
    lin(f"{b}.attention.wq", EH * EHD, ED, bias=True)
    lin(f"{b}.attention.wk", EH * EHD, ED)
    lin(f"{b}.attention.wv", EH * EHD, ED, bias=True)
    lin(f"{b}.attention.wo", ED, EH * EHD, bias=True)
    w[f"{b}.ffn_norm.weight"] = np.ones((ED,), np.float32)
    lin(f"{b}.feed_forward.w1", EFF, ED)
    lin(f"{b}.feed_forward.w3", EFF, ED)
    lin(f"{b}.feed_forward.w2", ED, EFF, bias=True)
    w[f"{enc}.transformer.norm.weight"] = np.ones((ED,), np.float32)
    adapter = "mm_streams_embeddings.embedding_module"
    lin(f"{adapter}.audio_language_projection.0", DD, ED * 4)
    lin(f"{adapter}.audio_language_projection.2", DD, DD)
    w[f"{adapter}.tok_embeddings.weight"] = modulo_values((VOCAB, DD), 13, 0.3)

    b = "layers.0"
    w[f"{b}.attention_norm.weight"] = np.ones((DD,), np.float32)
    lin(f"{b}.attention.wq", DH * DHD, DD)
    lin(f"{b}.attention.wk", DKV * DHD, DD)
    lin(f"{b}.attention.wv", DKV * DHD, DD)
    lin(f"{b}.attention.wo", DD, DH * DHD)
    w[f"{b}.ffn_norm.weight"] = np.ones((DD,), np.float32)
    lin(f"{b}.ada_rms_norm_t_cond.0", 4, DD)
    lin(f"{b}.ada_rms_norm_t_cond.2", DD, 4)
    lin(f"{b}.feed_forward.w1", DFF, DD)
    lin(f"{b}.feed_forward.w3", DFF, DD)
    lin(f"{b}.feed_forward.w2", DD, DFF)
    w["norm.weight"] = np.ones((DD,), np.float32)
    save_file(w, str(path / "model.safetensors"))

    n_special = 10
    vocab = [{"token_bytes": base64.b64encode(
        f" w{i}".encode()).decode()} for i in range(VOCAB - n_special)]
    (path / "tekken.json").write_text(json.dumps({
        "config": {"default_num_special_tokens": n_special},
        "vocab": vocab,
        "special_tokens": [{"rank": i} for i in range(n_special)],
    }))
    return path


def make_kokoro_fixture(path: Path) -> Path:
    """Tiny Kokoro (StyleTTS2) checkpoint in the MLX-ish layout the sanitizer
    expects: conv weights [O,K,I], transpose convs [I,K,O], weight-norm pairs
    for the weight-normed convs."""
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    H, S, EMB, BH = 16, 8, 8, 16  # hidden, style, albert emb, albert hidden
    CH0 = 16  # upsample_initial_channel
    vocab = {c: i + 1 for i, c in enumerate("abcdefghijklmnopqrstuvwxyz ˈˌəɹ")}
    cfg = {
        "model_type": "kokoro",
        "hidden_dim": H, "style_dim": S, "n_layer": 2, "max_dur": 10,
        "n_token": 40, "text_encoder_kernel_size": 5, "asr_res_dim": 8,
        "sample_rate": 24000, "vocab": vocab,
        "plbert": {"num_hidden_layers": 2, "num_attention_heads": 2,
                   "hidden_size": BH, "intermediate_size": 32,
                   "max_position_embeddings": 64, "embedding_size": EMB,
                   "inner_group_num": 1, "num_hidden_groups": 1,
                   "type_vocab_size": 2, "layer_norm_eps": 1e-12},
        "istftnet": {"resblock_kernel_sizes": [3],
                     "upsample_rates": [2, 2],
                     "upsample_initial_channel": CH0,
                     "resblock_dilation_sizes": [[1, 3, 5]],
                     "upsample_kernel_sizes": [4, 4],
                     "gen_istft_n_fft": 8, "gen_istft_hop_size": 2},
    }
    (path / "config.json").write_text(json.dumps(cfg))
    w = {}
    c = [0]

    def lin(name, o, i, bias=True):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.2)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    def conv(name, o, i, k, bias=True):  # MLX layout [O,K,I]
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, k, i), 9 + c[0] % 5, 0.2)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 3, 0.01)

    def wnconv(name, o, i, k, bias=True, transpose=False):
        c[0] += 1
        shape = (i, k, o) if transpose else (o, k, i)
        w[f"{name}.weight_v"] = modulo_values(shape, 9 + c[0] % 5, 0.5)
        w[f"{name}.weight_g"] = np.abs(modulo_values((shape[0], 1, 1), 7, 0.5)) + 0.3
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 3, 0.01)

    def ln(name, d):
        w[f"{name}.weight"] = np.ones((d,), np.float32)
        w[f"{name}.bias"] = np.zeros((d,), np.float32)

    def bilstm_p(name, inp, hid):
        for direc in ("forward", "backward"):
            c[0] += 1
            w[f"{name}.Wx_{direc}"] = modulo_values((4 * hid, inp), 13 + c[0] % 5, 0.2)
            w[f"{name}.Wh_{direc}"] = modulo_values((4 * hid, hid), 17 + c[0] % 5, 0.2)
            w[f"{name}.bias_ih_{direc}"] = modulo_values((4 * hid,), 5, 0.01)
            w[f"{name}.bias_hh_{direc}"] = modulo_values((4 * hid,), 7, 0.01)

    def adain_p(name, features):
        lin(f"{name}.fc", 2 * features, S)

    def res1d(name, din, dout, upsample=False):
        wnconv(f"{name}.conv1", dout, din, 3)
        wnconv(f"{name}.conv2", dout, dout, 3)
        adain_p(f"{name}.norm1", din)
        adain_p(f"{name}.norm2", dout)
        if din != dout:
            wnconv(f"{name}.conv1x1", dout, din, 1, bias=False)
        if upsample:
            # depthwise transposed conv: sanitized -> [din, 1, 3], bias [din]
            c[0] += 1
            w[f"{name}.pool.weight_v"] = modulo_values((din, 3, 1), 9 + c[0] % 5, 0.5)
            w[f"{name}.pool.weight_g"] = np.abs(modulo_values((din, 1, 1), 7, 0.5)) + 0.3
            w[f"{name}.pool.bias"] = modulo_values((din,), 3, 0.01)

    def snake_block(name, ch, k):
        for i, d in enumerate((1, 3, 5)):
            wnconv(f"{name}.convs1.{i}", ch, ch, k)
            wnconv(f"{name}.convs2.{i}", ch, ch, k)
            adain_p(f"{name}.adain1.{i}", ch)
            adain_p(f"{name}.adain2.{i}", ch)
            w[f"{name}.alpha1_{i}"] = np.ones((1, ch, 1), np.float32)
            w[f"{name}.alpha2_{i}"] = np.ones((1, ch, 1), np.float32)

    # ALBERT
    w["bert.embeddings.word_embeddings.weight"] = modulo_values((40, EMB), 13, 0.3)
    w["bert.embeddings.position_embeddings.weight"] = modulo_values((64, EMB), 17, 0.1)
    w["bert.embeddings.token_type_embeddings.weight"] = modulo_values((2, EMB), 19, 0.1)
    ln("bert.embeddings.LayerNorm", EMB)
    lin("bert.encoder.embedding_hidden_mapping_in", BH, EMB)
    al = "bert.encoder.albert_layer_groups.0.albert_layers.0"
    for proj in ("query", "key", "value", "dense"):
        lin(f"{al}.attention.{proj}", BH, BH)
    ln(f"{al}.attention.LayerNorm", BH)
    lin(f"{al}.ffn", 32, BH)
    lin(f"{al}.ffn_output", BH, 32)
    ln(f"{al}.full_layer_layer_norm", BH)
    lin("bert.pooler", BH, BH)
    lin("bert_encoder", H, BH)

    # predictor
    pe = "predictor.text_encoder"
    for i in range(2):
        bilstm_p(f"{pe}.lstms.{2*i}", H + S, H // 2)
        lin(f"{pe}.lstms.{2*i+1}.fc", 2 * H, S)
    bilstm_p("predictor.lstm", H + S, H // 2)
    lin("predictor.duration_proj", 10, H)
    bilstm_p("predictor.shared", H + S, H // 2)
    for head in ("F0", "N"):
        res1d(f"predictor.{head}.0", H, H)
        res1d(f"predictor.{head}.1", H, H // 2, upsample=True)
        res1d(f"predictor.{head}.2", H // 2, H // 2)
        conv(f"predictor.{head}_proj", 1, H // 2, 1)

    # text encoder
    w["text_encoder.embedding.weight"] = modulo_values((40, H), 23, 0.3)
    for i in range(2):
        wnconv(f"text_encoder.cnn.{i}.0", H, H, 5)
        ln(f"text_encoder.cnn.{i}.1", H)
    bilstm_p("text_encoder.lstm", H, H // 2)

    # decoder
    DEC = CH0 * 2
    res1d("decoder.encode", H + 2, DEC)
    for i in range(3):
        res1d(f"decoder.decode.{i}", DEC + 2 + 8, DEC)
    res1d("decoder.decode.3", DEC + 2 + 8, CH0, upsample=True)
    wnconv("decoder.F0_conv", 1, 1, 3)
    wnconv("decoder.N_conv", 1, 1, 3)
    wnconv("decoder.asr_res.0", 8, H, 1)
    g = "decoder.generator"
    lin(f"{g}.m_source.l_linear", 1, 9)
    # ups: transpose convs [I,K,O]
    wnconv(f"{g}.ups.0", CH0 // 2, CH0, 4, transpose=True)
    wnconv(f"{g}.ups.1", CH0 // 4, CH0 // 2, 4, transpose=True)
    conv(f"{g}.noise_convs.0", CH0 // 2, 10, 4)
    conv(f"{g}.noise_convs.1", CH0 // 4, 10, 1)
    snake_block(f"{g}.noise_res.0", CH0 // 2, 7)
    snake_block(f"{g}.noise_res.1", CH0 // 4, 11)
    snake_block(f"{g}.resblocks.0", CH0 // 2, 3)
    snake_block(f"{g}.resblocks.1", CH0 // 4, 3)
    wnconv(f"{g}.conv_post", 10, CH0 // 4, 7)
    save_file(w, str(path / "model.safetensors"))

    # voice file
    voices = path / "voices"
    voices.mkdir(exist_ok=True)
    save_file({"voice": modulo_values((8, 2 * S), 29, 0.5)},
              str(voices / "af_heart.safetensors"))

    # Misaki gold lexicon so the English route loads offline through the
    # real MisakiTextProcessor path; marker-only entries keep the other
    # generate tests on raw passthrough.
    (path / "us_gold.json").write_text(json.dumps({
        "parity": "pˈæɹəti", "check": "ʧˈɛk",
    }))
    return path


def make_mimi_fixture(path: Path) -> Path:
    """Tiny Mimi checkpoint in the MLX-converted layout (conv [O,K,I],
    transposed [O,K,I], depthwise transposed [C,K,1])."""
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    D, NF, QD, BINS, NQ = 16, 4, 8, 16, 4
    cfg = {
        "model_type": "mimi", "sampling_rate": 24000, "frame_rate": 3000,
        "num_codebooks": NQ, "quantizer_dim": QD, "quantizer_bins": BINS,
        "seanet": {"dimension": D, "channels": 1, "nfilters": NF,
                   "ratios": [2, 2], "ksize": 3, "residual_ksize": 3,
                   "last_ksize": 3, "dilation_base": 2, "compress": 2,
                   "nresidual_layers": 1},
        "transformer": {"d_model": D, "num_heads": 2, "num_layers": 1,
                        "dim_feedforward": 32, "context": 8,
                        "layer_scale": 0.01},
    }
    (path / "config.json").write_text(json.dumps(cfg))
    w = {}
    c = [0]

    def conv(name, o, k, i, bias=True):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, k, i), 9 + c[0] % 5, 0.3)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 3, 0.01)

    def lin(name, o, i, bias=False):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.3)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    def res_block(prefix, dim):
        hidden = dim // 2
        conv(f"{prefix}.block.0.conv.conv", hidden, 3, dim)
        conv(f"{prefix}.block.1.conv.conv", dim, 1, hidden)

    # encoder (ratios reversed: [2, 2])
    conv("encoder.init_conv1d.conv.conv", NF, 3, 1)
    mult = 1
    for li in range(2):
        dim = mult * NF
        res_block(f"encoder.layers.{li}.residuals.0", dim)
        conv(f"encoder.layers.{li}.downsample.conv.conv", dim * 2, 4, dim)
        mult *= 2
    conv("encoder.final_conv1d.conv.conv", D, 3, mult * NF)
    # decoder
    conv("decoder.init_conv1d.conv.conv", mult * NF, 3, D)
    for li in range(2):
        dim = mult * NF
        conv(f"decoder.layers.{li}.upsample.convtr.convtr", dim // 2, 4, dim)
        res_block(f"decoder.layers.{li}.residuals.0", dim // 2)
        mult //= 2
    conv("decoder.final_conv1d.conv.conv", 1, 3, NF)
    # transformers
    for name in ("encoder_transformer", "decoder_transformer"):
        lin(f"{name}.input_proj", D, D)
        lin(f"{name}.output_projs.0", D, D)
        base = f"{name}.transformer.layers.0"
        lin(f"{base}.self_attn.in_proj", 3 * D, D)
        lin(f"{base}.self_attn.out_proj", D, D)
        for nrm in ("norm1", "norm2"):
            w[f"{base}.{nrm}.weight"] = np.ones((D,), np.float32)
            w[f"{base}.{nrm}.bias"] = np.zeros((D,), np.float32)
        w[f"{base}.layer_scale_1.scale"] = np.full((D,), 0.01, np.float32)
        w[f"{base}.layer_scale_2.scale"] = np.full((D,), 0.01, np.float32)
        lin(f"{base}.gating.linear1", 32, D)
        lin(f"{base}.gating.linear2", D, 32)
    # down/upsample to frame rate (stride 2)
    conv("downsample.conv.conv", D, 4, D, bias=False)
    w["upsample.convtr.convtr.weight"] = modulo_values((D, 4, 1), 13, 0.3)
    # quantizer
    for part, nq in (("rvq_first", 1), ("rvq_rest", NQ - 1)):
        conv(f"quantizer.{part}.input_proj", QD, 1, D, bias=False)
        conv(f"quantizer.{part}.output_proj", D, 1, QD, bias=False)
        for i in range(nq):
            base = f"quantizer.{part}.vq.layers.{i}.codebook"
            w[f"{base}.embedding_sum"] = modulo_values((BINS, QD), 17 + i, 1.0)
            w[f"{base}.cluster_usage"] = np.abs(
                modulo_values((BINS,), 7, 1.0)) + 1.0
            w[f"{base}.initialized"] = np.ones((1,), np.float32)
    save_file(w, str(path / "model.safetensors"))
    return path


def make_csm_fixture(path: Path) -> Path:
    """Tiny Marvis/CSM checkpoint (torchtune-style names) with a bundled
    mimi/ codec dir, prompts/, and tokenizer."""
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    BD, DD, K, AV, TV = 16, 8, 4, 20, 64
    cfg = {
        "model_type": "csm",
        "text_vocab_size": TV, "audio_vocab_size": AV,
        "audio_num_codebooks": K,
        "backbone_config": {"hidden_size": BD, "num_hidden_layers": 2,
                            "intermediate_size": 32, "num_attention_heads": 2,
                            "num_key_value_heads": 2, "rope_theta": 10000.0},
        "depth_decoder_config": {"hidden_size": DD, "num_hidden_layers": 1,
                                 "intermediate_size": 16,
                                 "num_attention_heads": 2,
                                 "num_key_value_heads": 2,
                                 "rope_theta": 10000.0},
    }
    (path / "config.json").write_text(json.dumps(cfg))
    w = {}
    c = [0]

    def lin(name, o, i):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.2)

    def tt_layer(base, hid, inter, heads, kv, hd):
        lin(f"{base}.attn.q_proj", heads * hd, hid)
        lin(f"{base}.attn.k_proj", kv * hd, hid)
        lin(f"{base}.attn.v_proj", kv * hd, hid)
        lin(f"{base}.attn.output_proj", hid, heads * hd)
        w[f"{base}.sa_norm.scale"] = np.ones((hid,), np.float32)
        w[f"{base}.mlp_norm.scale"] = np.ones((hid,), np.float32)
        lin(f"{base}.mlp.w1", inter, hid)
        lin(f"{base}.mlp.w3", inter, hid)
        lin(f"{base}.mlp.w2", hid, inter)

    for i in range(2):
        tt_layer(f"backbone.layers.{i}", BD, 32, 2, 2, BD // 2)
    w["backbone.norm.scale"] = np.ones((BD,), np.float32)
    tt_layer("decoder.layers.0", DD, 16, 2, 2, DD // 2)
    w["decoder.norm.scale"] = np.ones((DD,), np.float32)
    w["text_embeddings.weight"] = modulo_values((TV, BD), 13, 0.3)
    w["audio_embeddings.weight"] = modulo_values((AV * K, BD), 17, 0.3)
    lin("projection", DD, BD)
    lin("codebook0_head", AV, BD)
    w["audio_head"] = modulo_values((K - 1, DD, AV), 19, 0.3)
    save_file(w, str(path / "model.safetensors"))

    # tokenizer
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    vocab_map = {f"w{i}": i for i in range(60)}
    vocab_map.update({"hello": 60, "[0]hello": 61, "[0]": 62, "ref": 63})
    tok = Tokenizer(WordLevel(vocab_map, unk_token="w0"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(path / "tokenizer.json"))

    # bundled mimi + prompt voice
    make_mimi_fixture(path / "mimi")
    prompts = path / "prompts"
    prompts.mkdir(exist_ok=True)
    from tpu_audio.core.audio_io import save_wav

    save_wav(prompts / "conversational_a.wav",
             (np.sin(np.arange(256) * 0.05) * 0.3).astype(np.float32), 24000)
    (prompts / "conversational_a.txt").write_text("ref hello")
    return path


def make_deepfilternet_fixture(path: Path, C: int = 8, E: int = 8,
                               DF: int = 12, H: int = 16,
                               fft: int = 96, hop: int = 48,
                               df_order: int = 3, lookahead: int = 1) -> Path:
    """Tiny DeepFilterNet3 checkpoint (flat torch keys). Pass real DFN3
    dims (C=64, E=32, DF=96, H=256, fft=960, hop=480, df_order=5,
    lookahead=2) for benchmark-scale models."""
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    cfg = {
        "sampleRate": 48000, "fftSize": fft, "hopSize": hop,
        "nbErb": E, "nbDf": DF, "dfOrder": df_order,
        "dfLookahead": lookahead,
        "convLookahead": lookahead, "convCh": C, "embHiddenDim": H,
        "dfHiddenDim": H, "modelVersion": "DeepFilterNet3",
        "model_type": "deepfilternet3",
    }
    (path / "config.json").write_text(json.dumps(cfg))
    w = {}
    c = [0]

    def t(name, *shape, scale=0.2):
        c[0] += 1
        w[name] = modulo_values(shape, 9 + c[0] % 7, scale)

    def bn(prefix, ch):
        w[f"{prefix}.weight"] = np.ones((ch,), np.float32)
        w[f"{prefix}.bias"] = np.zeros((ch,), np.float32)
        w[f"{prefix}.running_mean"] = np.zeros((ch,), np.float32)
        w[f"{prefix}.running_var"] = np.ones((ch,), np.float32)

    def gru(prefix, inp, hid):
        t(f"{prefix}.weight_ih_l0", 3 * hid, inp)
        t(f"{prefix}.weight_hh_l0", 3 * hid, hid)
        t(f"{prefix}.bias_ih_l0", 3 * hid, scale=0.01)
        t(f"{prefix}.bias_hh_l0", 3 * hid, scale=0.01)

    # encoder
    t("enc.erb_conv0.1.weight", C, 1, 3, 3)
    bn("enc.erb_conv0.2", C)
    for i in (1, 2, 3):
        t(f"enc.erb_conv{i}.0.weight", C, 1, 1, 3)  # depthwise
        t(f"enc.erb_conv{i}.1.weight", C, C, 1, 1)
        bn(f"enc.erb_conv{i}.2", C)
    t("enc.df_conv0.1.weight", C, 2, 3, 3)
    t("enc.df_conv0.2.weight", C, C, 1, 1)
    bn("enc.df_conv0.3", C)
    t("enc.df_conv1.0.weight", C, 1, 1, 3)
    t("enc.df_conv1.1.weight", C, C, 1, 1)
    bn("enc.df_conv1.2", C)
    t("enc.df_fc_emb.0.weight", 4, C * (DF // 2) // 4, H // 4)
    t("enc.emb_gru.linear_in.0.weight", 4, (C * (E // 4)) // 4, H // 4)
    gru("enc.emb_gru.gru", H, H)
    t("enc.emb_gru.linear_out.0.weight", 4, H // 4, H // 4)
    t("enc.lsnr_fc.0.weight", 1, H)
    t("enc.lsnr_fc.0.bias", 1)
    # erb decoder
    t("erb_dec.emb_gru.linear_in.0.weight", 4, H // 4, H // 4)
    gru("erb_dec.emb_gru.gru", H, H)
    t("erb_dec.emb_gru.linear_out.0.weight", 4, H // 4, H // 4)
    for pfx in ("conv3p", "conv2p", "conv1p", "conv0p"):
        t(f"erb_dec.{pfx}.0.weight", C, C, 1, 1)
        bn(f"erb_dec.{pfx}.1", C)
    t("erb_dec.convt3.0.weight", C, C, 1, 3)
    t("erb_dec.convt3.1.weight", C, C, 1, 1)
    bn("erb_dec.convt3.2", C)
    for pfx in ("convt2", "convt1"):
        t(f"erb_dec.{pfx}.0.weight", C, 1, 1, 3)  # grouped transpose [I, O/g, kT, kF]
        t(f"erb_dec.{pfx}.1.weight", C, C, 1, 1)
        bn(f"erb_dec.{pfx}.2", C)
    t("erb_dec.conv0_out.0.weight", 1, C, 1, 3)
    bn("erb_dec.conv0_out.1", 1)
    # df decoder
    t("df_dec.df_gru.linear_in.0.weight", 4, H // 4, H // 4)
    gru("df_dec.df_gru.gru", H, H)
    t("df_dec.df_skip.weight", 4, H // 4, H // 4)
    t("df_dec.df_convp.1.weight", C, 1, 1, 3)
    t("df_dec.df_convp.2.weight", df_order * 2, C, 1, 1)
    bn("df_dec.df_convp.3", df_order * 2)
    t("df_dec.df_out.0.weight", 4, H // 4, DF * df_order * 2 // 4)
    t("mask.erb_inv_fb", E, fft // 2 + 1, scale=0.5)
    w["mask.erb_inv_fb"] = np.abs(w["mask.erb_inv_fb"])
    save_file(w, str(path / "model.safetensors"))
    return path


def make_ecapa_fixture(path: Path, CH: int = 16, EMB: int = 8, HID: int = 12,
                       NCLS: int = 5, MELS: int = 60, SCALE: int = 4,
                       SE: int = 8) -> Path:
    """Tiny ECAPA-TDNN LID checkpoint (SpeechBrain-style nested keys); pass
    ``CH=1024, EMB=256, SCALE=8, SE=128, NCLS=107`` for the real
    voxlingua107 geometry (bench)."""
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    cfg = {
        "model_type": "ecapa", "input_size": MELS, "channels": CH,
        "embed_dim": EMB, "kernel_sizes": [5, 3, 3, 3, 1],
        "dilations": [1, 2, 3, 4, 1], "attention_channels": SE,
        "res2net_scale": SCALE, "se_channels": SE,
        "num_classes": NCLS, "classifier_hidden_dim": HID,
        "id2label": {str(i): f"lang{i}: Language {i}" for i in range(NCLS)},
    }
    (path / "config.json").write_text(json.dumps(cfg))
    w = {}
    c = [0]

    def conv(name, o, i, k, bias=True):  # MLX layout [O,K,I]
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, k, i), 9 + c[0] % 7, 0.2)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 3, 0.01)

    def bn(name, ch):
        w[f"{name}.weight"] = np.ones((ch,), np.float32)
        w[f"{name}.bias"] = np.zeros((ch,), np.float32)
        w[f"{name}.running_mean"] = np.zeros((ch,), np.float32)
        w[f"{name}.running_var"] = np.ones((ch,), np.float32)

    def tdnn(prefix, o, i, k):
        conv(f"{prefix}.conv.conv", o, i, k)
        bn(f"{prefix}.norm.norm", o)

    em = "embedding_model"
    tdnn(f"{em}.blocks.0", CH, MELS, 5)
    hidden = CH // SCALE
    for b in (1, 2, 3):
        base = f"{em}.blocks.{b}"
        tdnn(f"{base}.tdnn1", CH, CH, 1)
        for i in range(SCALE - 1):
            tdnn(f"{base}.res2net_block.blocks.{i}", hidden, hidden, 3)
        tdnn(f"{base}.tdnn2", CH, CH, 1)
        conv(f"{base}.se_block.conv1.conv", SE, CH, 1)
        conv(f"{base}.se_block.conv2.conv", CH, SE, 1)
    tdnn(f"{em}.mfa", CH * 3, CH * 3, 1)
    tdnn(f"{em}.asp.tdnn", SE, CH * 3, 1)
    conv(f"{em}.asp.conv", CH * 3, SE, 1)
    bn(f"{em}.asp_bn.norm", CH * 6)
    conv(f"{em}.fc.conv", EMB, CH * 6, 1)
    bn("classifier.norm", EMB)
    c[0] += 1
    w["classifier.DNN.block_0.linear.w.weight"] = modulo_values((HID, EMB), 11, 0.2)
    w["classifier.DNN.block_0.linear.w.bias"] = modulo_values((HID,), 5, 0.01)
    bn("classifier.DNN.block_0.norm", HID)
    w["classifier.out.w.weight"] = modulo_values((NCLS, HID), 13, 0.2)
    w["classifier.out.w.bias"] = modulo_values((NCLS,), 5, 0.01)
    save_file(w, str(path / "model.safetensors"))
    return path


def make_soprano_fixture(path: Path) -> Path:
    """Tiny Soprano checkpoint: Qwen3-style LM + Vocos decoder + ISTFT head."""
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    H, DD, NFFT, HOP, TS = 16, 24, 32, 8, 16
    cfg = {
        "model_type": "soprano",
        "hidden_size": H, "num_hidden_layers": 2, "intermediate_size": 32,
        "num_attention_heads": 2, "num_key_value_heads": 2, "head_dim": 8,
        "vocab_size": 80, "rope_theta": 10000.0, "rms_norm_eps": 1e-6,
        "tie_word_embeddings": False, "token_size": TS, "sample_rate": 32000,
        "decoder_dim": DD, "decoder_num_layers": 2,
        "decoder_n_fft": NFFT, "decoder_hop": HOP, "upscale": 4,
        "stop_token_id": 3,
    }
    (path / "config.json").write_text(json.dumps(cfg))
    w = {}
    c = [0]

    def lin(name, o, i, bias=True):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.2)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    # LM (stored with language_model prefix, MLX-ish)
    w["language_model.embed_tokens.weight"] = modulo_values((80, H), 13, 0.3)
    w["language_model.norm.weight"] = np.ones((H,), np.float32)
    for i in range(2):
        b = f"language_model.layers.{i}"
        lin(f"{b}.self_attn.q_proj", 16, H, bias=False)
        lin(f"{b}.self_attn.k_proj", 16, H, bias=False)
        lin(f"{b}.self_attn.v_proj", 16, H, bias=False)
        lin(f"{b}.self_attn.o_proj", H, 16, bias=False)
        w[f"{b}.self_attn.q_norm.weight"] = np.ones((8,), np.float32)
        w[f"{b}.self_attn.k_norm.weight"] = np.ones((8,), np.float32)
        w[f"{b}.input_layernorm.weight"] = np.ones((H,), np.float32)
        w[f"{b}.post_attention_layernorm.weight"] = np.ones((H,), np.float32)
        lin(f"{b}.mlp.gate_proj", 32, H, bias=False)
        lin(f"{b}.mlp.up_proj", 32, H, bias=False)
        lin(f"{b}.mlp.down_proj", H, 32, bias=False)
    lin("language_model.lm_head", 80, H, bias=False)
    # decoder: VocosBackbone(inputChannels=H, dim=DD, k_in=1, k_dw=3) + head
    c[0] += 1
    w["decoder.decoder.embed.weight"] = modulo_values((DD, 1, H), 9, 0.2)  # MLX [O,K,I]
    w["decoder.decoder.embed.bias"] = modulo_values((DD,), 3, 0.01)
    w["decoder.decoder.norm.weight"] = np.ones((DD,), np.float32)
    w["decoder.decoder.norm.bias"] = np.zeros((DD,), np.float32)
    for i in range(2):
        b = f"decoder.decoder.convnext.{i}"
        c[0] += 1
        w[f"{b}.dwconv.weight"] = modulo_values((DD, 3, 1), 9 + i, 0.2)  # MLX dw
        w[f"{b}.dwconv.bias"] = modulo_values((DD,), 3, 0.01)
        w[f"{b}.norm.weight"] = np.ones((DD,), np.float32)
        w[f"{b}.norm.bias"] = np.zeros((DD,), np.float32)
        lin(f"{b}.pwconv1", 3 * DD, DD)
        lin(f"{b}.pwconv2", DD, 3 * DD)
        w[f"{b}.gamma"] = np.full((DD,), 0.5, np.float32)
    w["decoder.decoder.final_layer_norm.weight"] = np.ones((DD,), np.float32)
    w["decoder.decoder.final_layer_norm.bias"] = np.zeros((DD,), np.float32)
    lin("decoder.head.out", NFFT + 2, DD)
    save_file(w, str(path / "model.safetensors"))

    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    vocab_map = {f"w{i}": i for i in range(70)}
    vocab_map.update({"[STOP]": 3, "[TEXT]": 70, "[START]": 71,
                      "hello": 72, "world": 73})
    del vocab_map["w3"]
    tok = Tokenizer(WordLevel(vocab_map, unk_token="w0"))
    tok.pre_tokenizer = Whitespace()
    tok.add_special_tokens(["[STOP]", "[TEXT]", "[START]"])
    tok.save(str(path / "tokenizer.json"))
    return path


def make_smart_turn_fixture(path: Path) -> Path:
    """Tiny SmartTurn checkpoint: whisper-style encoder + pool/classifier,
    using the checkpoint's dotted submodule names (pool_attention.0 etc.)
    so the sanitizer is exercised."""
    from safetensors.numpy import save_file

    d, heads, layers, ffn = 16, 2, 2, 32
    n_mels, max_pos = 8, 64
    w = {
        "encoder.conv1.weight": modulo_values((d, n_mels, 3)),
        "encoder.conv1.bias": modulo_values((d,), 5),
        "encoder.conv2.weight": modulo_values((d, d, 3), 19),
        "encoder.conv2.bias": modulo_values((d,), 7),
        "encoder.embed_positions.weight": modulo_values((max_pos, d), 23),
        "encoder.layer_norm.weight": np.ones(d, np.float32),
        "encoder.layer_norm.bias": np.zeros(d, np.float32),
        "pool_attention.0.weight": modulo_values((256, d), 11),
        "pool_attention.0.bias": modulo_values((256,), 5),
        "pool_attention.2.weight": modulo_values((1, 256), 13),
        "pool_attention.2.bias": np.zeros(1, np.float32),
        "classifier.0.weight": modulo_values((256, d), 29),
        "classifier.0.bias": modulo_values((256,), 7),
        "classifier.1.weight": np.ones(256, np.float32),
        "classifier.1.bias": np.zeros(256, np.float32),
        "classifier.4.weight": modulo_values((64, 256), 31),
        "classifier.4.bias": modulo_values((64,), 5),
        "classifier.6.weight": modulo_values((1, 64), 17),
        "classifier.6.bias": np.zeros(1, np.float32),
        # a val_* buffer the sanitizer must drop
        "val_accuracy": np.zeros(1, np.float32),
    }
    for i in range(layers):
        pre = f"encoder.layers.{i}"
        w[f"{pre}.self_attn.q_proj.weight"] = modulo_values((d, d), 13 + i)
        w[f"{pre}.self_attn.q_proj.bias"] = modulo_values((d,), 5)
        w[f"{pre}.self_attn.k_proj.weight"] = modulo_values((d, d), 17 + i)
        w[f"{pre}.self_attn.v_proj.weight"] = modulo_values((d, d), 19 + i)
        w[f"{pre}.self_attn.v_proj.bias"] = modulo_values((d,), 7)
        w[f"{pre}.self_attn.out_proj.weight"] = modulo_values((d, d), 23 + i)
        w[f"{pre}.self_attn.out_proj.bias"] = np.zeros(d, np.float32)
        w[f"{pre}.self_attn_layer_norm.weight"] = np.ones(d, np.float32)
        w[f"{pre}.self_attn_layer_norm.bias"] = np.zeros(d, np.float32)
        w[f"{pre}.fc1.weight"] = modulo_values((ffn, d), 29 + i)
        w[f"{pre}.fc1.bias"] = np.zeros(ffn, np.float32)
        w[f"{pre}.fc2.weight"] = modulo_values((d, ffn), 31 + i)
        w[f"{pre}.fc2.bias"] = np.zeros(d, np.float32)
        w[f"{pre}.final_layer_norm.weight"] = np.ones(d, np.float32)
        w[f"{pre}.final_layer_norm.bias"] = np.zeros(d, np.float32)
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps({
        "model_type": "smart_turn",
        "encoder_config": {
            "num_mel_bins": n_mels, "max_source_positions": max_pos,
            "d_model": d, "encoder_attention_heads": heads,
            "encoder_layers": layers, "encoder_ffn_dim": ffn,
        },
        "processor_config": {
            "sampling_rate": 16000, "max_audio_seconds": 1,
            "n_fft": 400, "hop_length": 160, "n_mels": n_mels,
            "normalize_audio": True, "threshold": 0.5,
        },
    }))
    save_file(w, str(path / "model.safetensors"))
    return path


def make_fsmn_vad_fixture(path: Path) -> Path:
    """Tiny FSMN VAD checkpoint with an am.mvn CMVN file. The encoder is
    shrunk but keeps the real topology (4 fsmn layers, depthwise causal
    memory convs); output_dim=4 with sil_pdf_ids=[0]."""
    from safetensors.numpy import save_file

    n_mels, lfr_m = 8, 5
    input_dim = n_mels * lfr_m  # 40
    affine, lin, proj, lorder, out_dim = 16, 24, 12, 4, 4
    w = {
        "encoder.in_linear1.weight": modulo_values((affine, input_dim)),
        "encoder.in_linear1.bias": modulo_values((affine,), 5),
        "encoder.in_linear2.weight": modulo_values((lin, affine), 19),
        "encoder.in_linear2.bias": modulo_values((lin,), 7),
        "encoder.out_linear1.weight": modulo_values((affine, lin), 23),
        "encoder.out_linear1.bias": np.zeros(affine, np.float32),
        "encoder.out_linear2.weight": modulo_values((out_dim, affine), 29),
        "encoder.out_linear2.bias": np.zeros(out_dim, np.float32),
    }
    for i in range(4):
        pre = f"encoder.fsmn.{i}"
        w[f"{pre}.linear.weight"] = modulo_values((proj, lin), 11 + i)
        w[f"{pre}.fsmn_block.conv_left.weight"] = modulo_values(
            (proj, 1, lorder), 13 + i, 0.1)
        w[f"{pre}.affine.weight"] = modulo_values((lin, proj), 17 + i)
        w[f"{pre}.affine.bias"] = np.zeros(lin, np.float32)
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps({
        "model_type": "fsmn",
        "encoder": {
            "input_dim": input_dim, "input_affine_dim": affine,
            "fsmn_layers": 4, "linear_dim": lin, "proj_dim": proj,
            "lorder": lorder, "output_affine_dim": affine,
            "output_dim": out_dim,
        },
        "n_mels": n_mels, "sil_pdf_ids": [0],
    }))
    shift = " ".join(f"{v:.4f}" for v in modulo_values((input_dim,), 7, 0.2))
    scale = " ".join("1.0" for _ in range(input_dim))
    (path / "am.mvn").write_text(
        "<Nnet>\n<Splice> 40 40\n[ 0 ]\n<AddShift> 40 40\n"
        f"<LearnRateCoef> 0 [ {shift} ]\n<Rescale> 40 40\n"
        f"<LearnRateCoef> 0 [ {scale} ]\n</Nnet>\n")
    save_file(w, str(path / "model.safetensors"))
    return path


def make_sensevoice_fixture(path: Path) -> Path:
    """Tiny SenseVoice checkpoint: SANM encoder (encoders0/encoders/tp),
    ctc head under the checkpoint's ctc.ctc_lo name, 16-slot query embed,
    am.mvn CMVN, tokens.json vocab."""
    from safetensors.numpy import save_file

    n_mels, lfr_m = 8, 7
    input_size = n_mels * lfr_m  # 56
    d, heads, linear, vocab = 16, 2, 32, 40
    kernel = 11

    def sanm_layer(pre, in_size, seed):
        return {
            f"{pre}.self_attn.linear_q_k_v.weight":
                modulo_values((3 * d, in_size), seed),
            f"{pre}.self_attn.linear_q_k_v.bias":
                modulo_values((3 * d,), 5),
            f"{pre}.self_attn.linear_out.weight":
                modulo_values((d, d), seed + 2),
            f"{pre}.self_attn.linear_out.bias": np.zeros(d, np.float32),
            f"{pre}.self_attn.fsmn_block.weight":
                modulo_values((d, 1, kernel), seed + 4, 0.1),
            f"{pre}.feed_forward.w_1.weight":
                modulo_values((linear, d), seed + 6),
            f"{pre}.feed_forward.w_1.bias": np.zeros(linear, np.float32),
            f"{pre}.feed_forward.w_2.weight":
                modulo_values((d, linear), seed + 8),
            f"{pre}.feed_forward.w_2.bias": np.zeros(d, np.float32),
            f"{pre}.norm1.weight": np.ones(in_size, np.float32),
            f"{pre}.norm1.bias": np.zeros(in_size, np.float32),
            f"{pre}.norm2.weight": np.ones(d, np.float32),
            f"{pre}.norm2.bias": np.zeros(d, np.float32),
        }

    w = {
        "embed.weight": modulo_values((16, input_size), 23),
        "ctc.ctc_lo.weight": modulo_values((vocab, d), 29),
        "ctc.ctc_lo.bias": np.zeros(vocab, np.float32),
        "encoder.after_norm.weight": np.ones(d, np.float32),
        "encoder.after_norm.bias": np.zeros(d, np.float32),
        "encoder.tp_norm.weight": np.ones(d, np.float32),
        "encoder.tp_norm.bias": np.zeros(d, np.float32),
    }
    w.update(sanm_layer("encoder.encoders0.0", input_size, 11))
    w.update(sanm_layer("encoder.encoders.0", d, 13))
    w.update(sanm_layer("encoder.tp_encoders.0", d, 17))
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps({
        "model_type": "sense_voice",
        "input_size": input_size, "vocab_size": vocab,
        "encoder_conf": {
            "output_size": d, "attention_heads": heads,
            "linear_units": linear, "num_blocks": 2, "tp_blocks": 1,
            "kernel_size": kernel, "sanm_shfit": 0,
        },
        "frontend_conf": {"n_mels": n_mels, "lfr_m": lfr_m, "lfr_n": 6},
    }))
    dim = input_size
    shift = " ".join(f"{v:.4f}" for v in modulo_values((dim,), 7, 0.2))
    scale = " ".join("1.0" for _ in range(dim))
    (path / "am.mvn").write_text(
        f"<Nnet>\n<AddShift> {dim} {dim}\n<LearnRateCoef> 0 [ {shift} ]\n"
        f"<Rescale> {dim} {dim}\n<LearnRateCoef> 0 [ {scale} ]\n</Nnet>\n")
    (path / "tokens.json").write_text(json.dumps(
        ["<blank>"] + [f"▁w{i}" for i in range(vocab - 1)]))
    save_file(w, str(path / "model.safetensors"))
    return path


def make_encodec_fixture(path: Path, chunked: bool = False) -> Path:
    """Tiny EnCodec checkpoint in the MLX-community layout: flat indexed
    SEANet layers (ELUs consume indices), lstm Wx/Wh/bias naming, conv
    weights [O, K, I]. ratios (4,2), hidden 8, codebook 16x8."""
    from safetensors.numpy import save_file

    nf, hidden, cb_size = 4, 8, 16

    def conv(pre, o, i, k, seed):
        return {f"{pre}.conv.weight": modulo_values((o, k, i), seed),
                f"{pre}.conv.bias": modulo_values((o,), 5)}

    def resnet(pre, dim, seed):
        h = dim // 2
        w = {}
        w.update(conv(f"{pre}.block.1", h, dim, 3, seed))
        w.update(conv(f"{pre}.block.3", dim, h, 1, seed + 2))
        w.update(conv(f"{pre}.shortcut", dim, dim, 1, seed + 4))
        return w

    def lstm(pre, dim, seed):
        return {f"{pre}.lstm.0.Wx": modulo_values((4 * dim, dim), seed, 0.1),
                f"{pre}.lstm.0.Wh": modulo_values((4 * dim, dim), seed + 2, 0.1),
                f"{pre}.lstm.0.bias": np.zeros(4 * dim, np.float32)}

    w = {}
    # encoder: 0 conv, 1 resnet(4), 2 elu, 3 conv s2, 4 resnet(8), 5 elu,
    # 6 conv s4, 7 lstm, 8 elu, 9 conv->hidden
    w.update(conv("encoder.layers.0", nf, 1, 3, 7))
    w.update(resnet("encoder.layers.1", nf, 11))
    w.update(conv("encoder.layers.3", 2 * nf, nf, 4, 13))
    w.update(resnet("encoder.layers.4", 2 * nf, 17))
    w.update(conv("encoder.layers.6", 4 * nf, 2 * nf, 8, 19))
    w.update(lstm("encoder.layers.7", 4 * nf, 23))
    w.update(conv("encoder.layers.9", hidden, 4 * nf, 3, 29))
    # decoder: 0 conv, 1 lstm, 2 elu, 3 convt s4, 4 resnet(8), 5 elu,
    # 6 convt s2, 7 resnet(4), 8 elu, 9 conv->1
    w.update(conv("decoder.layers.0", 4 * nf, hidden, 3, 31))
    w.update(lstm("decoder.layers.1", 4 * nf, 7))
    w.update(conv("decoder.layers.3", 2 * nf, 4 * nf, 8, 11))
    w.update(resnet("decoder.layers.4", 2 * nf, 13))
    w.update(conv("decoder.layers.6", nf, 2 * nf, 4, 17))
    w.update(resnet("decoder.layers.7", nf, 19))
    w.update(conv("decoder.layers.9", 1, nf, 3, 23))
    for i in range(2):
        w[f"quantizer.layers.{i}.codebook.embed"] = modulo_values(
            (cb_size, hidden), 29 + i, 0.5)
    cfg = {
        "model_type": "encodec",
        "audio_channels": 1, "num_filters": nf, "kernel_size": 3,
        "num_residual_layers": 1, "dilation_growth_rate": 2,
        "codebook_size": cb_size, "codebook_dim": hidden,
        "hidden_size": hidden, "num_lstm_layers": 1,
        "residual_kernel_size": 3, "use_causal_conv": True,
        "normalize": False, "pad_mode": "reflect",
        "norm_type": "weight_norm", "last_kernel_size": 3,
        "trim_right_ratio": 1.0, "compress": 2,
        "upsampling_ratios": [4, 2], "target_bandwidths": [30.0, 60.0],
        "sampling_rate": 24000,
    }
    if chunked:
        cfg.update(normalize=True, chunk_length_s=0.01, overlap=0.5)
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps(cfg))
    save_file(w, str(path / "model.safetensors"))
    return path


def make_bigvgan_fixture(path: Path) -> Path:
    """Tiny BigVGAN: 2 upsample stages, 2 resblock kernels, snakebeta,
    torch weight_g/weight_v naming so the fold path is exercised."""
    from safetensors.numpy import save_file

    n_mels, ch = 8, 16
    rates, kernels = [4, 2], [8, 4]
    res_kernels, res_dils = [3, 5], [[1, 3], [1, 3]]

    def wn_conv(pre, o, i, k, seed):
        v = modulo_values((o, i, k), seed)
        g = np.linalg.norm(v.reshape(o, -1), axis=1).reshape(o, 1, 1).astype(
            np.float32)
        return {f"{pre}.weight_g": g, f"{pre}.weight_v": v,
                f"{pre}.bias": modulo_values((o,), 5)}

    def wn_convt(pre, i, o, k, seed):
        v = modulo_values((i, o, k), seed)
        g = np.linalg.norm(v.reshape(i, -1), axis=1).reshape(i, 1, 1).astype(
            np.float32)
        return {f"{pre}.weight_g": g, f"{pre}.weight_v": v,
                f"{pre}.bias": modulo_values((o,), 7)}

    def act(pre, c, seed):
        return {f"{pre}.act.alpha": modulo_values((c,), seed, 0.1),
                f"{pre}.act.beta": modulo_values((c,), seed + 2, 0.1)}

    w = {}
    w.update(wn_conv("conv_pre", ch, n_mels, 7, 11))
    c = ch
    n_k = len(res_kernels)
    for s, (rate, k) in enumerate(zip(rates, kernels)):
        w.update(wn_convt(f"ups.{s}.0", c, c // 2, k, 13 + s))
        c //= 2
        for j, (rk, dils) in enumerate(zip(res_kernels, res_dils)):
            pre = f"resblocks.{s * n_k + j}"
            for i, _ in enumerate(dils):
                w.update(wn_conv(f"{pre}.convs1.{i}", c, c, rk, 17 + i))
                w.update(wn_conv(f"{pre}.convs2.{i}", c, c, rk, 19 + i))
                w.update(act(f"{pre}.activations.{2 * i}", c, 23))
                w.update(act(f"{pre}.activations.{2 * i + 1}", c, 29))
    w.update(act("activation_post", c, 31))
    w.update(wn_conv("conv_post", 1, c, 7, 37))
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps({
        "model_type": "bigvgan",
        "num_mels": n_mels, "upsample_rates": rates,
        "upsample_kernel_sizes": kernels, "upsample_initial_channel": ch,
        "resblock": "1", "resblock_kernel_sizes": res_kernels,
        "resblock_dilation_sizes": res_dils, "activation": "snakebeta",
        "snake_logscale": True, "use_bias_at_final": True,
        "use_tanh_at_final": True, "sampling_rate": 24000,
    }))
    save_file(w, str(path / "model.safetensors"))
    return path


def make_dac_fixture(path: Path) -> Path:
    """Tiny Descript DAC checkpoint (torch weight-norm layout with
    Sequential .layers. wrappers like MLX exports of descript/dac)."""
    from safetensors.numpy import save_file

    enc_dim, enc_rates = 8, (2, 4)
    dec_dim, dec_rates = 32, (4, 2)
    latent = enc_dim * 4  # 32
    n_q, cb_size, cb_dim = 3, 16, 4

    w = {}

    def wn(pre, o, i, k, seed):
        v = modulo_values((o, i, k), seed)
        g = np.linalg.norm(v.reshape(o, -1), axis=1).reshape(
            o, 1, 1).astype(np.float32)
        w[f"{pre}.weight_v"] = v
        w[f"{pre}.weight_g"] = g
        w[f"{pre}.bias"] = modulo_values((o,), 5)

    def wnt(pre, i, o, k, seed):
        v = modulo_values((i, o, k), seed)
        g = np.linalg.norm(v.reshape(i, -1), axis=1).reshape(
            i, 1, 1).astype(np.float32)
        w[f"{pre}.weight_v"] = v
        w[f"{pre}.weight_g"] = g
        w[f"{pre}.bias"] = modulo_values((o,), 7)

    def snake(pre, c):
        w[f"{pre}.alpha"] = np.ones((1, c, 1), np.float32)

    def res_unit(pre, dim, seed):
        snake(f"{pre}.block.0", dim)
        wn(f"{pre}.block.1", dim, dim, 7, seed)
        snake(f"{pre}.block.2", dim)
        wn(f"{pre}.block.3", dim, dim, 1, seed + 2)

    # encoder
    wn("encoder.block.0", enc_dim, 1, 7, 11)
    dim = enc_dim
    for i, s in enumerate(enc_rates):
        dim *= 2
        pre = f"encoder.block.{i + 1}.block"
        for j in range(3):
            res_unit(f"{pre}.{j}", dim // 2, 13 + j)
        snake(f"{pre}.3", dim // 2)
        wn(f"{pre}.4", dim, dim // 2, 2 * s, 17 + i)
    snake(f"encoder.block.{len(enc_rates) + 1}", dim)
    wn(f"encoder.block.{len(enc_rates) + 2}", latent, dim, 3, 19)
    # quantizers
    for i in range(n_q):
        pre = f"quantizer.quantizers.{i}"
        wn(f"{pre}.in_proj", cb_dim, latent, 1, 23 + i)
        wn(f"{pre}.out_proj", latent, cb_dim, 1, 29 + i)
        w[f"{pre}.codebook.weight"] = modulo_values((cb_size, cb_dim),
                                                    31 + i, 0.5)
    # decoder
    wn("decoder.model.0", dec_dim, latent, 7, 37)
    d = dec_dim
    for i, s in enumerate(dec_rates):
        pre = f"decoder.model.{i + 1}.block"
        snake(f"{pre}.0", d)
        wnt(f"{pre}.1", d, d // 2, 2 * s, 41 + i)
        d //= 2
        for j in range(3):
            res_unit(f"{pre}.{j + 2}", d, 43 + j)
    snake(f"decoder.model.{len(dec_rates) + 1}", d)
    wn(f"decoder.model.{len(dec_rates) + 2}", 1, d, 7, 47)

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps({
        "model_type": "dac",
        "encoder_dim": enc_dim, "encoder_rates": list(enc_rates),
        "decoder_dim": dec_dim, "decoder_rates": list(dec_rates),
        "n_codebooks": n_q, "codebook_size": cb_size,
        "codebook_dim": cb_dim, "sample_rate": 16000,
    }))
    save_file(w, str(path / "model.safetensors"))
    return path


def make_lasr_fixture(path: Path) -> Path:
    """Tiny LASR CTC checkpoint (2 conformer blocks, GQA, 4x subsample)."""
    from safetensors.numpy import save_file

    d, heads, kvh, ffn, n_mels, vocab, kernel = 16, 4, 2, 32, 8, 24, 8
    sub_ch, sub_k = 12, 5
    hd = d // heads

    def lin(pre, o, i, seed, bias=True):
        w = {f"{pre}.weight": modulo_values((o, i), seed)}
        if bias:
            w[f"{pre}.bias"] = modulo_values((o,), 5)
        return w

    def ln(pre, c):
        return {f"{pre}.weight": np.ones(c, np.float32),
                f"{pre}.bias": np.zeros(c, np.float32)}

    w = {}
    w.update(lin("encoder.subsampler.dense_0", d, n_mels, 7))
    w["encoder.subsampler.conv_0.weight"] = modulo_values((d, d, sub_k), 11)
    w["encoder.subsampler.conv_0.bias"] = np.zeros(d, np.float32)
    w["encoder.subsampler.conv_1.weight"] = modulo_values((sub_ch, d, sub_k), 13)
    w["encoder.subsampler.conv_1.bias"] = np.zeros(sub_ch, np.float32)
    w.update(lin("encoder.subsampler.dense_1", d, sub_ch, 17))
    for i in range(2):
        pre = f"encoder.layers.{i}"
        w.update(lin(f"{pre}.self_attn.q_proj", d, d, 19 + i, bias=False))
        w.update(lin(f"{pre}.self_attn.k_proj", kvh * hd, d, 23 + i,
                     bias=False))
        w.update(lin(f"{pre}.self_attn.v_proj", kvh * hd, d, 29 + i,
                     bias=False))
        w.update(lin(f"{pre}.self_attn.o_proj", d, d, 31 + i, bias=False))
        w[f"{pre}.conv.pointwise_conv1.weight"] = modulo_values(
            (2 * d, d, 1), 37 + i)
        w[f"{pre}.conv.depthwise_conv.weight"] = modulo_values(
            (d, 1, kernel), 41 + i, 0.1)
        w[f"{pre}.conv.pointwise_conv2.weight"] = modulo_values(
            (d, d, 1), 43 + i)
        w[f"{pre}.conv.norm.weight"] = np.ones(d, np.float32)
        w[f"{pre}.conv.norm.bias"] = np.zeros(d, np.float32)
        w[f"{pre}.conv.norm.running_mean"] = np.zeros(d, np.float32)
        w[f"{pre}.conv.norm.running_var"] = np.ones(d, np.float32)
        w[f"{pre}.conv.norm.num_batches_tracked"] = np.zeros(1, np.float32)
        for ff in ("feed_forward1", "feed_forward2"):
            w.update(lin(f"{pre}.{ff}.linear1", ffn, d, 47 + i, bias=False))
            w.update(lin(f"{pre}.{ff}.linear2", d, ffn, 53 + i, bias=False))
        for name in ("norm_feed_forward1", "norm_self_att", "norm_conv",
                     "norm_feed_forward2", "norm_out"):
            w.update(ln(f"{pre}.{name}", d))
    w.update(ln("encoder.out_norm", d))
    w.update(lin("ctc_head", vocab, d, 59))
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps({
        "model_type": "lasr",
        "vocab_size": vocab, "pad_token_id": 0,
        "encoder_config": {
            "hidden_size": d, "num_hidden_layers": 2,
            "num_attention_heads": heads, "num_key_value_heads": kvh,
            "intermediate_size": ffn, "conv_kernel_size": kernel,
            "num_mel_bins": n_mels, "subsampling_conv_channels": sub_ch,
            "subsampling_conv_kernel_size": sub_k,
            "subsampling_conv_stride": 2,
        },
    }))
    save_file(w, str(path / "model.safetensors"))
    return path


def make_canary_fixture(path: Path) -> Path:
    """Tiny Canary checkpoint in the MLX-native layout (encoder.* parakeet
    keys; transf_decoder.layers.* with first/second/third_sub_layer naming;
    head.classifier) plus a tokens.txt map."""
    from safetensors.numpy import save_file

    d_model, n_heads, n_layers, features, conv_ch = 32, 4, 2, 16, 8
    dec_layers, dec_heads, inner, vocab = 2, 4, 64, 48
    w = {}
    c = [0]

    def lin(name, o, i, bias=True):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.3)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 13, 0.01)

    def ln(name, dim):
        w[f"{name}.weight"] = np.ones((dim,), np.float32)
        w[f"{name}.bias"] = np.zeros((dim,), np.float32)

    def conv2d_mlx(name, o, h, k, i):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, h, k, i), 9 + c[0] % 5, 0.3)
        w[f"{name}.bias"] = modulo_values((o,), 7, 0.01)

    def conv1d_mlx(name, o, k, i, bias=True):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, k, i), 9 + c[0] % 5, 0.3)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 7, 0.01)

    # encoder (parakeet fastconformer, subsampling factor 4)
    conv2d_mlx("encoder.pre_encode.conv.0", conv_ch, 3, 3, 1)
    conv2d_mlx("encoder.pre_encode.conv.2", conv_ch, 3, 3, 1)
    conv2d_mlx("encoder.pre_encode.conv.3", conv_ch, 1, 1, conv_ch)
    f_out = features
    for _ in range(2):
        f_out = (f_out + 2 - 3) // 2 + 1
    lin("encoder.pre_encode.out", d_model, conv_ch * f_out)
    hd = d_model // n_heads
    for i in range(n_layers):
        base = f"encoder.layers.{i}"
        for nrm in ("norm_feed_forward1", "norm_self_att", "norm_conv",
                    "norm_feed_forward2", "norm_out"):
            ln(f"{base}.{nrm}", d_model)
        for ff in ("feed_forward1", "feed_forward2"):
            lin(f"{base}.{ff}.linear1", d_model * 4, d_model)
            lin(f"{base}.{ff}.linear2", d_model, d_model * 4)
        for proj in ("linear_q", "linear_k", "linear_v", "linear_out"):
            lin(f"{base}.self_attn.{proj}", d_model, d_model)
        lin(f"{base}.self_attn.linear_pos", d_model, d_model, bias=False)
        w[f"{base}.self_attn.pos_bias_u"] = modulo_values((n_heads, hd), 5, 0.1)
        w[f"{base}.self_attn.pos_bias_v"] = modulo_values((n_heads, hd), 3, 0.1)
        conv1d_mlx(f"{base}.conv.pointwise_conv1", d_model * 2, 1, d_model)
        conv1d_mlx(f"{base}.conv.depthwise_conv", d_model, 9, 1)
        conv1d_mlx(f"{base}.conv.pointwise_conv2", d_model, 1, d_model)
        w[f"{base}.conv.batch_norm.weight"] = np.ones((d_model,), np.float32)
        w[f"{base}.conv.batch_norm.bias"] = np.zeros((d_model,), np.float32)
        w[f"{base}.conv.batch_norm.running_mean"] = np.zeros((d_model,),
                                                             np.float32)
        w[f"{base}.conv.batch_norm.running_var"] = np.ones((d_model,),
                                                           np.float32)
    # decoder (MLX-native naming)
    w["transf_decoder.token_embedding.weight"] = modulo_values(
        (vocab, d_model), 17, 0.3)
    ln("transf_decoder.embedding_layer_norm", d_model)
    ln("transf_decoder.final_layer_norm", d_model)
    for i in range(dec_layers):
        base = f"transf_decoder.layers.{i}"
        for sub in ("first_sub_layer", "second_sub_layer"):
            for proj in ("linear_q", "linear_k", "linear_v", "linear_out"):
                lin(f"{base}.{sub}.{proj}", d_model, d_model)
        lin(f"{base}.third_sub_layer.linear1", inner, d_model)
        lin(f"{base}.third_sub_layer.linear2", d_model, inner)
        for nrm in ("layer_norm_1", "layer_norm_2", "layer_norm_3"):
            ln(f"{base}.{nrm}", d_model)
    lin("head.classifier", vocab, d_model)
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps({
        "model_type": "canary",
        "preprocessor": {"sample_rate": 16000, "features": features,
                         "n_fft": 512, "window_size": 0.025,
                         "window_stride": 0.01},
        "encoder": {"feat_in": features, "n_layers": n_layers,
                    "d_model": d_model, "n_heads": n_heads,
                    "subsampling_factor": 4,
                    "subsampling_conv_channels": conv_ch,
                    "xscaling": False},
        "decoder": {"num_layers": dec_layers, "hidden_size": d_model,
                    "num_attention_heads": dec_heads, "inner_size": inner},
        "vocab_size": vocab, "enc_output_dim": d_model,
        "startofcontext_id": 0, "startoftranscript_id": 1,
        "emo_undefined_id": 2, "endoftext_id": 3,
        "supported_languages": ["en", "de"],
    }))
    specials = ["<|startofcontext|>", "<|startoftranscript|>",
                "<|emo:undefined|>", "<|endoftext|>", "<|en|>", "<|de|>",
                "<|pnc|>", "<|nopnc|>"]
    lines = [f"{t} {i}" for i, t in enumerate(specials)]
    lines += [f"▁w{i} {len(specials) + i}" for i in range(vocab - len(specials))]
    (path / "tokens.txt").write_text("\n".join(lines))
    save_file(w, str(path / "model.safetensors"))
    return path


def make_glm_asr_fixture(path: Path) -> Path:
    """Tiny GLM-ASR: rope-whisper encoder + adapting MLP (checkpoint
    adapting.0/adapting.2 naming) + GLM llama LM, tokenizer.json with
    the audio special tokens."""
    from safetensors.numpy import save_file
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    wd, wheads, wlayers, n_mels = 16, 2, 2, 8
    lm_d, lm_layers, lm_heads, lm_kv, lm_ffn, vocab = 32, 2, 4, 2, 64, 64
    merge = 2
    w = {}

    def lin(pre, o, i, seed, bias=True):
        w[f"{pre}.weight"] = modulo_values((o, i), seed)
        if bias:
            w[f"{pre}.bias"] = modulo_values((o,), 5)

    def ln(pre, c):
        w[f"{pre}.weight"] = np.ones(c, np.float32)
        w[f"{pre}.bias"] = np.zeros(c, np.float32)

    w["audio_encoder.whisper.conv1.weight"] = modulo_values((wd, n_mels, 3), 7)
    w["audio_encoder.whisper.conv1.bias"] = np.zeros(wd, np.float32)
    w["audio_encoder.whisper.conv2.weight"] = modulo_values((wd, wd, 3), 11)
    w["audio_encoder.whisper.conv2.bias"] = np.zeros(wd, np.float32)
    w["audio_encoder.whisper.embed_positions.weight"] = modulo_values(
        (64, wd), 13)
    for i in range(wlayers):
        pre = f"audio_encoder.whisper.layers.{i}"
        lin(f"{pre}.self_attn.q_proj", wd, wd, 17 + i)
        lin(f"{pre}.self_attn.k_proj", wd, wd, 19 + i, bias=False)
        lin(f"{pre}.self_attn.v_proj", wd, wd, 23 + i)
        lin(f"{pre}.self_attn.out_proj", wd, wd, 29 + i)
        ln(f"{pre}.self_attn_layer_norm", wd)
        ln(f"{pre}.final_layer_norm", wd)
        lin(f"{pre}.fc1", 2 * wd, wd, 31 + i)
        lin(f"{pre}.fc2", wd, 2 * wd, 37 + i)
    ln("audio_encoder.layer_norm", wd)
    lin("audio_encoder.proj", lm_d, wd, 41)
    lin("audio_encoder.adapting.0", 2 * lm_d, merge * wd, 43)
    lin("audio_encoder.adapting.2", lm_d, 2 * lm_d, 47)
    w["audio_encoder.audio_bos_eos_token.weight"] = modulo_values(
        (2, lm_d), 53)
    # GLM LM (llama HF layout under model.*)
    hd = lm_d // lm_heads
    w["model.embed_tokens.weight"] = modulo_values((vocab, lm_d), 59)
    w["model.norm.weight"] = np.ones(lm_d, np.float32)
    w["lm_head.weight"] = modulo_values((vocab, lm_d), 61)
    for i in range(lm_layers):
        pre = f"model.layers.{i}"
        w[f"{pre}.input_layernorm.weight"] = np.ones(lm_d, np.float32)
        w[f"{pre}.post_attention_layernorm.weight"] = np.ones(lm_d, np.float32)
        lin(f"{pre}.self_attn.q_proj", lm_heads * hd, lm_d, 63 + i, bias=False)
        lin(f"{pre}.self_attn.k_proj", lm_kv * hd, lm_d, 67 + i, bias=False)
        lin(f"{pre}.self_attn.v_proj", lm_kv * hd, lm_d, 71 + i, bias=False)
        lin(f"{pre}.self_attn.o_proj", lm_d, lm_heads * hd, 73 + i, bias=False)
        lin(f"{pre}.mlp.gate_proj", lm_ffn, lm_d, 79 + i, bias=False)
        lin(f"{pre}.mlp.up_proj", lm_ffn, lm_d, 83 + i, bias=False)
        lin(f"{pre}.mlp.down_proj", lm_d, lm_ffn, 89 + i, bias=False)
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps({
        "model_type": "glmasr",
        "whisper_config": {
            "d_model": wd, "encoder_attention_heads": wheads,
            "encoder_ffn_dim": 2 * wd, "encoder_layers": wlayers,
            "num_mel_bins": n_mels, "max_source_positions": 64,
            "rope_traditional": True,
        },
        "lm_config": {
            "vocab_size": vocab, "hidden_size": lm_d,
            "num_hidden_layers": lm_layers,
            "num_attention_heads": lm_heads, "num_key_value_heads": lm_kv,
            "intermediate_size": lm_ffn, "tie_word_embeddings": False,
            "rope_traditional": True, "eos_token_id": [2],
        },
        "merge_factor": merge, "use_rope": True,
        "max_whisper_length": 64,
    }))
    specials = ["<|user|>", "<|begin_of_audio|>", "<|end_of_audio|>",
                "<|assistant|>"]
    words = ["Please", "transcribe", "this", "audio", "into", "text"]
    vmap = {f"w{i}": i for i in range(vocab - len(specials) - len(words))}
    base = len(vmap)
    for j, t in enumerate(words + specials):
        vmap[t] = base + j
    tok = Tokenizer(WordLevel(vmap, unk_token="w0"))
    tok.pre_tokenizer = Whitespace()
    tok.add_special_tokens(specials)
    tok.save(str(path / "tokenizer.json"))
    save_file(w, str(path / "model.safetensors"))
    return path


def make_pocket_tts_fixture(path: Path) -> Path:
    """Tiny PocketTTS: flow LM (streaming transformer + AdaLN flow net),
    mimi adapter with dummy-quantizer output_proj, one voice embedding."""
    from safetensors.numpy import save_file
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    D, LDIM, FD, HEADS, LAYERS, DEPTH = 16, 8, 16, 2, 2, 2
    MD, NF = 12, 4  # mimi transformer/seanet dims
    w = {}
    c = [0]

    def lin(name, o, i, bias=True):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.3)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    def ln(name, dim):
        w[f"{name}.weight"] = np.ones((dim,), np.float32)
        w[f"{name}.bias"] = np.zeros((dim,), np.float32)

    # flow LM
    w["flow_lm.emb_std"] = np.ones((LDIM,), np.float32)
    w["flow_lm.emb_mean"] = np.zeros((LDIM,), np.float32)
    w["flow_lm.bos_emb"] = modulo_values((LDIM,), 7, 0.3)
    w["flow_lm.conditioner.embed.weight"] = modulo_values((33, D), 13, 0.3)
    lin("flow_lm.input_linear", D, LDIM, bias=False)
    ln("flow_lm.out_norm", D)
    lin("flow_lm.out_eos", 1, D)
    for i in range(LAYERS):
        base = f"flow_lm.transformer.layers.{i}"
        lin(f"{base}.self_attn.in_proj", 3 * D, D, bias=False)
        lin(f"{base}.self_attn.out_proj", D, D, bias=False)
        ln(f"{base}.norm1", D)
        ln(f"{base}.norm2", D)
        lin(f"{base}.linear1", 4 * D, D, bias=False)
        lin(f"{base}.linear2", D, 4 * D, bias=False)
    # flow net
    lin("flow_lm.flow_net.input_proj", FD, LDIM)
    lin("flow_lm.flow_net.cond_embed", FD, D)
    for t in range(2):
        lin(f"flow_lm.flow_net.time_embed.{t}.mlp.0", FD, 256)
        lin(f"flow_lm.flow_net.time_embed.{t}.mlp.2", FD, FD)
        w[f"flow_lm.flow_net.time_embed.{t}.mlp.3.alpha"] = np.ones(
            (FD,), np.float32)
    for i in range(DEPTH):
        base = f"flow_lm.flow_net.res_blocks.{i}"
        ln(f"{base}.in_ln", FD)
        lin(f"{base}.mlp.0", FD, FD)
        lin(f"{base}.mlp.2", FD, FD)
        lin(f"{base}.adaLN_modulation.1", 3 * FD, FD)
    lin("flow_lm.flow_net.final_layer.linear", LDIM, FD)
    lin("flow_lm.flow_net.final_layer.adaLN_modulation.1", 2 * FD, FD)
    w["speaker_proj_weight"] = modulo_values((D, MD), 17, 0.3)

    # mimi adapter (MLX-converted layouts like make_mimi_fixture)
    def conv(name, o, k, i, bias=True):
        c[0] += 1
        w[f"mimi.{name}.weight"] = modulo_values((o, k, i), 9 + c[0] % 5, 0.3)
        if bias:
            w[f"mimi.{name}.bias"] = modulo_values((o,), 3, 0.01)

    def mlin(name, o, i):
        c[0] += 1
        w[f"mimi.{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.3)

    conv("encoder.init_conv1d.conv.conv", NF, 3, 1)
    mult = 1
    for li in range(2):
        dim = mult * NF
        conv(f"encoder.layers.{li}.residuals.0.block.0.conv.conv",
             dim // 2, 3, dim)
        conv(f"encoder.layers.{li}.residuals.0.block.1.conv.conv",
             dim, 1, dim // 2)
        conv(f"encoder.layers.{li}.downsample.conv.conv", dim * 2, 4, dim)
        mult *= 2
    conv("encoder.final_conv1d.conv.conv", MD, 3, mult * NF)
    conv("decoder.init_conv1d.conv.conv", mult * NF, 3, MD)
    for li in range(2):
        dim = mult * NF
        conv(f"decoder.layers.{li}.upsample.convtr.convtr", dim // 2, 4, dim)
        conv(f"decoder.layers.{li}.residuals.0.block.0.conv.conv",
             dim // 4, 3, dim // 2)
        conv(f"decoder.layers.{li}.residuals.0.block.1.conv.conv",
             dim // 2, 1, dim // 4)
        mult //= 2
    conv("decoder.final_conv1d.conv.conv", 1, 3, NF)
    for name in ("encoder_transformer", "decoder_transformer"):
        mlin(f"{name}.input_proj", MD, MD)
        mlin(f"{name}.output_projs.0", MD, MD)
        base = f"{name}.transformer.layers.0"
        mlin(f"{base}.self_attn.in_proj", 3 * MD, MD)
        mlin(f"{base}.self_attn.out_proj", MD, MD)
        for nrm in ("norm1", "norm2"):
            w[f"mimi.{base}.{nrm}.weight"] = np.ones((MD,), np.float32)
            w[f"mimi.{base}.{nrm}.bias"] = np.zeros((MD,), np.float32)
        w[f"mimi.{base}.layer_scale_1.scale"] = np.full((MD,), 0.01,
                                                        np.float32)
        w[f"mimi.{base}.layer_scale_2.scale"] = np.full((MD,), 0.01,
                                                        np.float32)
        mlin(f"{base}.gating.linear1", 24, MD)
        mlin(f"{base}.gating.linear2", MD, 24)
    conv("downsample.conv.conv", MD, 4, MD, bias=False)
    w["mimi.upsample.convtr.convtr.weight"] = modulo_values((MD, 4, 1),
                                                            13, 0.3)
    conv("quantizer.output_proj.conv.conv", MD, 1, LDIM, bias=False)

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps({
        "model_type": "pocket_tts",
        "flow_lm": {
            "flow": {"dim": FD, "depth": DEPTH},
            "transformer": {"d_model": D, "num_heads": HEADS,
                            "num_layers": LAYERS, "hidden_scale": 4,
                            "max_period": 10000.0},
            "lookup_table": {"dim": D, "n_bins": 32, "tokenizer": "word",
                             "tokenizer_path": "tokenizer.json"},
        },
        "mimi": {
            "sample_rate": 24000, "channels": 1, "frame_rate": 3000,
            "seanet": {"dimension": MD, "channels": 1, "n_filters": NF,
                       "n_residual_layers": 1, "ratios": [2, 2],
                       "kernel_size": 3, "residual_kernel_size": 3,
                       "last_kernel_size": 3, "dilation_base": 2,
                       "pad_mode": "constant", "compress": 2},
            "transformer": {"d_model": MD, "num_heads": 2, "num_layers": 1,
                            "dim_feedforward": 24, "context": 8,
                            "layer_scale": 0.01, "max_period": 10000.0,
                            "input_dimension": MD,
                            "output_dimensions": [MD]},
            "quantizer": {"dimension": LDIM, "output_dimension": MD},
        },
    }))
    vmap = {f"w{i}": i for i in range(30)}
    vmap.update({".": 30, "!": 31, "?": 32})
    tok = Tokenizer(WordLevel(vmap, unk_token="w0"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(path / "tokenizer.json"))
    emb_dir = path / "embeddings"
    emb_dir.mkdir(exist_ok=True)
    save_file({"audio_prompt": modulo_values((1, 3, D), 19, 0.3)},
              str(emb_dir / "alba.safetensors"))
    save_file(w, str(path / "model.safetensors"))
    return path


def make_mossformer2_fixture(path: Path) -> Path:
    """Tiny MossFormer2-SE: 2 blocks, 8 kHz-ish dims, MLX conv layouts
    ([O, K, I]) plus mossformer.-prefixed keys to exercise sanitize."""
    from safetensors.numpy import save_file

    sr, win, inc, mels = 16000, 320, 160, 8
    in_ch, out_ch, bins, blocks = mels * 3, 16, win // 2 + 1, 2
    gsz, qk = 8, 8
    w = {}
    c = [0]

    def lin(name, o, i, bias=True):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.2)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    def conv1_mlx(name, o, i, bias=True):  # k=1 conv, MLX [O, 1, I]
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, 1, i), 9 + c[0] % 5, 0.2)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 3, 0.01)

    def ffconvm(pre, i, o, scalenorm=True):
        if scalenorm:
            w[f"{pre}.norm.g"] = np.ones((1,), np.float32)
        else:
            w[f"{pre}.norm.weight"] = np.ones((i,), np.float32)
            w[f"{pre}.norm.bias"] = np.zeros((i,), np.float32)
        lin(f"{pre}.linear", o, i)
        w[f"{pre}.conv_module.weight"] = modulo_values((o, 17, 1), 13, 0.1)

    base0 = "mossformer.mdl.intra_mdl.mossformerM"
    for i in range(blocks):
        fb = f"{base0}.layers.{i}"
        ffconvm(f"{fb}.to_hidden", out_ch, 2 * out_ch)
        ffconvm(f"{fb}.to_qk", out_ch, qk)
        w[f"{fb}.qk_offset_scale.gamma"] = modulo_values((4, qk), 7, 0.1) + 1.0
        w[f"{fb}.qk_offset_scale.beta"] = np.zeros((4, qk), np.float32)
        ffconvm(f"{fb}.to_out", out_ch, out_ch)  # in = hidden/2 (v dim)
        gb = f"{base0}.fsmn.{i}"
        conv1_mlx(f"{gb}.conv1", out_ch, out_ch)
        w[f"{gb}.prelu.weight"] = np.asarray(0.25, np.float32)
        for nrm in ("norm1", "norm2"):
            w[f"{gb}.{nrm}.weight"] = np.ones((out_ch,), np.float32)
            w[f"{gb}.{nrm}.bias"] = np.zeros((out_ch,), np.float32)
        gf = f"{gb}.gated_fsmn"
        ffconvm(f"{gf}.to_u", out_ch, out_ch, scalenorm=False)
        ffconvm(f"{gf}.to_v", out_ch, out_ch, scalenorm=False)
        lin(f"{gf}.fsmn.linear", out_ch, out_ch)
        lin(f"{gf}.fsmn.project", out_ch, out_ch, bias=False)
        w[f"{gf}.fsmn.conv1.weight"] = modulo_values((out_ch, 39, 1, 1),
                                                     17, 0.05)
        conv1_mlx(f"{gb}.conv2", out_ch, out_ch)
    w[f"{base0.rsplit('.', 1)[0]}.norm.weight"] = np.ones((out_ch,),
                                                          np.float32)
    w[f"{base0.rsplit('.', 1)[0]}.norm.bias"] = np.zeros((out_ch,),
                                                         np.float32)
    w["mossformer.mdl.intra_norm.weight"] = np.ones((out_ch,), np.float32)
    w["mossformer.mdl.intra_norm.bias"] = np.zeros((out_ch,), np.float32)
    w["mossformer.norm.weight"] = np.ones((in_ch, 1), np.float32)
    w["mossformer.norm.bias"] = np.zeros((in_ch, 1), np.float32)
    conv1_mlx("mossformer.conv1d_encoder", out_ch, in_ch, bias=False)
    w["mossformer.pos_enc.scale"] = np.ones((1,), np.float32)
    w["mossformer.pos_enc.inv_freq"] = (
        1.0 / 10000.0 ** (np.arange(0, out_ch, 2) / out_ch)).astype(
            np.float32)
    conv1_mlx("mossformer.conv1d_out", out_ch * 2, out_ch)
    w["mossformer.prelu.weight"] = np.asarray(0.25, np.float32)
    conv1_mlx("mossformer.output", out_ch, out_ch)
    conv1_mlx("mossformer.output_gate", out_ch, out_ch)
    conv1_mlx("mossformer.conv1_decoder", bins, out_ch, bias=False)
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps({
        "model_type": "mossformer2_se",
        "sample_rate": sr, "win_len": win, "win_inc": inc,
        "fft_len": win, "num_mels": mels, "win_type": "hamming",
        "in_channels": in_ch, "out_channels": out_ch,
        "out_channels_final": bins, "num_blocks": blocks,
        "group_size": gsz, "query_key_dim": qk,
    }))
    save_file(w, str(path / "model.safetensors"))
    return path


def make_nemotron_fixture(path: Path) -> Path:
    """Tiny Nemotron streaming ASR: causal subsample (sf=4), 2 conformer
    blocks with chunked-limited attention, prompt kernel, RNNT head.
    NeMo/MLX key+layout conventions (pre_encode.conv list, pos_bias_u)."""
    from safetensors.numpy import save_file

    d, heads, layers, feat, conv_ch, kernel = 16, 4, 2, 16, 8, 5
    vocab = [("▁" if i % 3 == 0 else "") + chr(ord("a") + i % 26)
             for i in range(12)]
    pred_hidden, joint_hidden, n_prompts = 12, 12, 3
    w = {}
    c = [0]

    def lin(name, o, i, bias=True):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.3)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 13, 0.01)

    def ln(name, dim):
        w[f"{name}.weight"] = np.ones((dim,), np.float32)
        w[f"{name}.bias"] = np.zeros((dim,), np.float32)

    def conv2d_mlx(name, o, h, k, i):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, h, k, i), 9 + c[0] % 5, 0.3)
        w[f"{name}.bias"] = modulo_values((o,), 7, 0.01)

    def conv1d_mlx(name, o, k, i, bias=True):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, k, i), 9 + c[0] % 5, 0.3)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 7, 0.01)

    conv2d_mlx("encoder.pre_encode.conv.0", conv_ch, 3, 3, 1)
    conv2d_mlx("encoder.pre_encode.conv.2", conv_ch, 3, 3, 1)  # depthwise
    conv2d_mlx("encoder.pre_encode.conv.3", conv_ch, 1, 1, conv_ch)
    f_out = feat
    for _ in range(2):
        f_out = f_out // 2 + 1  # causal (2,1) pad, k3 s2
    lin("encoder.pre_encode.out", d, conv_ch * f_out)
    hd = d // heads
    for i in range(layers):
        base = f"encoder.layers.{i}"
        for nrm in ("norm_feed_forward1", "norm_self_att", "norm_conv",
                    "norm_feed_forward2", "norm_out"):
            ln(f"{base}.{nrm}", d)
        for ff in ("feed_forward1", "feed_forward2"):
            lin(f"{base}.{ff}.linear1", d * 4, d)
            lin(f"{base}.{ff}.linear2", d, d * 4)
        for proj in ("linear_q", "linear_k", "linear_v", "linear_out"):
            lin(f"{base}.self_attn.{proj}", d, d)
        lin(f"{base}.self_attn.linear_pos", d, d, bias=False)
        w[f"{base}.self_attn.pos_bias_u"] = modulo_values((heads, hd), 5, 0.1)
        w[f"{base}.self_attn.pos_bias_v"] = modulo_values((heads, hd), 3, 0.1)
        conv1d_mlx(f"{base}.conv.pointwise_conv1", d * 2, 1, d)
        conv1d_mlx(f"{base}.conv.depthwise_conv", d, kernel, 1)
        conv1d_mlx(f"{base}.conv.pointwise_conv2", d, 1, d)
        ln(f"{base}.conv.batch_norm", d)  # LayerNorm despite the name
    lin("prompt_kernel.0", 24, d + n_prompts)
    lin("prompt_kernel.2", d, 24)
    w["decoder.prediction.embed.weight"] = modulo_values(
        (len(vocab) + 1, pred_hidden), 17, 0.3)
    w["decoder.prediction.dec_rnn.lstm.0.Wx"] = modulo_values(
        (4 * pred_hidden, pred_hidden), 19, 0.2)
    w["decoder.prediction.dec_rnn.lstm.0.Wh"] = modulo_values(
        (4 * pred_hidden, pred_hidden), 23, 0.2)
    w["decoder.prediction.dec_rnn.lstm.0.bias"] = modulo_values(
        (4 * pred_hidden,), 5, 0.01)
    lin("joint.enc", joint_hidden, d)
    lin("joint.pred", joint_hidden, pred_hidden)
    lin("joint.joint_net.2", len(vocab) + 1, joint_hidden)
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps({
        "model_type": "nemotron",
        "preprocessor": {"sample_rate": 16000, "features": feat,
                         "n_fft": 128, "window_size": 0.008,
                         "window_stride": 0.004, "window": "hann"},
        "encoder": {"feat_in": feat, "n_layers": layers, "d_model": d,
                    "n_heads": heads, "subsampling_factor": 4,
                    "subsampling_conv_channels": conv_ch,
                    "conv_kernel_size": kernel, "xscaling": False,
                    "att_context_style": "chunked_limited",
                    "att_context_size": [[8, 3]]},
        "decoder": {"pred_hidden": pred_hidden, "pred_rnn_layers": 1},
        "joint": {"joint_hidden": joint_hidden, "activation": "relu"},
        "vocabulary": vocab,
        "prompt": {"num_prompts": n_prompts, "prompt_hidden": 24,
                   "prompt_dictionary": {"en": 0, "de": 1}},
        "default_language": "en",
    }))
    save_file(w, str(path / "model.safetensors"))
    return path


def make_firered_fixture(path: Path) -> Path:
    """Tiny FireRedASR2: 2+2 layer conformer AED, cmvn.json, WordLevel
    tokenizer. MLX conv layouts (conv2d [O,H,W,I], conv1d [O,K,I])."""
    from safetensors.numpy import save_file
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    d, heads, layers, idim, odim, kernel, ch = 16, 4, 2, 16, 32, 5, 8
    w = {}
    c = [0]

    def lin(name, o, i, bias=True):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.25)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 13, 0.01)

    def ln(name, dim):
        w[f"{name}.weight"] = np.ones((dim,), np.float32)
        w[f"{name}.bias"] = np.zeros((dim,), np.float32)

    w["encoder.input_preprocessor.conv1.weight"] = modulo_values(
        (ch, 3, 3, 1), 7, 0.3)
    w["encoder.input_preprocessor.conv1.bias"] = np.zeros(ch, np.float32)
    w["encoder.input_preprocessor.conv2.weight"] = modulo_values(
        (ch, 3, 3, ch), 11, 0.3)
    w["encoder.input_preprocessor.conv2.bias"] = np.zeros(ch, np.float32)
    sub_f = ((idim - 1) // 2 - 1) // 2
    lin("encoder.input_preprocessor.out", d, ch * sub_f)
    hd = d // heads
    for i in range(layers):
        b = f"encoder.layer_stack.{i}"
        for ff in ("ffn1", "ffn2"):
            ln(f"{b}.{ff}.net_0", d)
            lin(f"{b}.{ff}.net_1", 4 * d, d)
            lin(f"{b}.{ff}.net_4", d, 4 * d)
        m = f"{b}.mhsa"
        for proj in ("w_qs", "w_ks", "w_vs", "fc", "linear_pos"):
            lin(f"{m}.{proj}", d, d, bias=False)
        for nrm in ("layer_norm_q", "layer_norm_k", "layer_norm_v"):
            ln(f"{m}.{nrm}", d)
        w[f"{m}.pos_bias_u"] = modulo_values((heads, hd), 5, 0.1)
        w[f"{m}.pos_bias_v"] = modulo_values((heads, hd), 3, 0.1)
        ln(f"{b}.conv.pre_layer_norm", d)
        w[f"{b}.conv.pointwise_conv1.weight"] = modulo_values(
            (4 * d, 1, d), 17, 0.2)
        w[f"{b}.conv.depthwise_conv.weight"] = modulo_values(
            (2 * d, kernel, 1), 19, 0.1)
        ln(f"{b}.conv.batch_norm", 2 * d)
        w[f"{b}.conv.pointwise_conv2.weight"] = modulo_values(
            (d, 1, 2 * d), 23, 0.2)
        ln(f"{b}.layer_norm", d)
    w["decoder.tgt_word_emb.weight"] = modulo_values((odim, d), 29, 0.3)
    for i in range(layers):
        b = f"decoder.layer_stack.{i}"
        for attn in ("self_attn", "cross_attn"):
            lin(f"{b}.{attn}.w_qs", d, d)
            lin(f"{b}.{attn}.w_ks", d, d, bias=False)
            lin(f"{b}.{attn}.w_vs", d, d)
            lin(f"{b}.{attn}.fc", d, d)
        for nrm in ("self_attn_norm", "cross_attn_norm", "mlp_norm"):
            ln(f"{b}.{nrm}", d)
        lin(f"{b}.mlp.w_1", 4 * d, d)
        lin(f"{b}.mlp.w_2", d, 4 * d)
    ln("decoder.layer_norm_out", d)
    lin("decoder.tgt_word_prj", odim, d, bias=False)
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps({
        "model_type": "fireredasr2",
        "idim": idim, "odim": odim, "sos_id": 3, "eos_id": 4, "pad_id": 2,
        "encoder": {"n_layers": layers, "n_head": heads, "d_model": d,
                    "kernel_size": kernel, "pe_maxlen": 512},
        "decoder": {"n_layers": layers, "n_head": heads, "d_model": d,
                    "pe_maxlen": 512},
    }))
    (path / "cmvn.json").write_text(json.dumps({
        "means": modulo_values((idim,), 7, 0.2).tolist(),
        "istd": np.ones(idim, np.float32).tolist(),
    }))
    vmap = {f"w{i}": i for i in range(odim)}
    tok = Tokenizer(WordLevel(vmap, unk_token="w0"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(path / "tokenizer.json"))
    save_file(w, str(path / "model.safetensors"))
    return path


def make_byt5_fixture(path: Path) -> Path:
    """Tiny ByT5 G2P in HF t5 naming (block/SelfAttention/DenseReluDense)."""
    from safetensors.numpy import save_file

    v, d, dff, dkv, heads, enc_l, dec_l, buckets = 384, 16, 32, 4, 4, 2, 2, 8
    w = {"shared.weight": modulo_values((v, d), 7, 0.2),
         "lm_head.weight": modulo_values((v, d), 11, 0.2),
         "encoder.final_layer_norm.weight": np.ones(d, np.float32),
         "decoder.final_layer_norm.weight": np.ones(d, np.float32),
         "encoder.block.0.layer.0.SelfAttention.relative_attention_bias"
         ".weight": modulo_values((buckets, heads), 13, 0.1),
         "decoder.block.0.layer.0.SelfAttention.relative_attention_bias"
         ".weight": modulo_values((buckets, heads), 17, 0.1)}

    def lin(name, o, i):
        w[f"{name}.weight"] = modulo_values((o, i), 19 + (o + i) % 7, 0.25)

    for i in range(enc_l):
        b = f"encoder.block.{i}"
        for proj in ("q", "k", "v"):
            lin(f"{b}.layer.0.SelfAttention.{proj}", heads * dkv, d)
        lin(f"{b}.layer.0.SelfAttention.o", d, heads * dkv)
        w[f"{b}.layer.0.layer_norm.weight"] = np.ones(d, np.float32)
        lin(f"{b}.layer.1.DenseReluDense.wi_0", dff, d)
        lin(f"{b}.layer.1.DenseReluDense.wi_1", dff, d)
        lin(f"{b}.layer.1.DenseReluDense.wo", d, dff)
        w[f"{b}.layer.1.layer_norm.weight"] = np.ones(d, np.float32)
    for i in range(dec_l):
        b = f"decoder.block.{i}"
        for li, mod in ((0, "SelfAttention"), (1, "EncDecAttention")):
            for proj in ("q", "k", "v"):
                lin(f"{b}.layer.{li}.{mod}.{proj}", heads * dkv, d)
            lin(f"{b}.layer.{li}.{mod}.o", d, heads * dkv)
            w[f"{b}.layer.{li}.layer_norm.weight"] = np.ones(d, np.float32)
        lin(f"{b}.layer.2.DenseReluDense.wi_0", dff, d)
        lin(f"{b}.layer.2.DenseReluDense.wi_1", dff, d)
        lin(f"{b}.layer.2.DenseReluDense.wo", d, dff)
        w[f"{b}.layer.2.layer_norm.weight"] = np.ones(d, np.float32)
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps({
        "model_type": "byt5", "vocab_size": v, "d_model": d, "d_ff": dff,
        "d_kv": dkv, "num_heads": heads, "num_layers": enc_l,
        "num_decoder_layers": dec_l, "relative_attention_num_buckets": buckets,
        "relative_attention_max_distance": 32,
        "tie_word_embeddings": False, "decoder_start_token_id": 0,
        "eos_token_id": 1, "pad_token_id": 0,
    }))
    save_file(w, str(path / "model.safetensors"))
    return path


def make_dacvae_fixture(path: Path) -> Path:
    """Tiny DACVAE (VAE bottleneck, main decoder path; includes a
    watermark key that sanitize must drop). MLX conv layouts."""
    from safetensors.numpy import save_file

    enc_dim, enc_rates = 4, (2, 4)
    dec_dim, dec_rates = 16, (4, 2)
    latent, cb = 8, 4
    w = {}
    c = [0]

    def wn(pre, o, k, i, transpose=False):
        c[0] += 1
        v = modulo_values((o, k, i), 9 + c[0] % 5, 0.2)
        axes = (2,) if transpose else tuple(range(1, 3))
        g = np.sqrt((v.astype(np.float64) ** 2).sum(
            axis=(1, 2), keepdims=True)).astype(np.float32)
        w[f"{pre}.weight_g"] = g
        w[f"{pre}.weight_v"] = v
        w[f"{pre}.bias"] = modulo_values((o,), 3, 0.01)

    def snake(pre, ch):
        w[f"{pre}.alpha"] = np.ones((1, ch, 1), np.float32)

    def res(pre, dim, k=7):
        snake(f"{pre}.act1", dim)
        wn(f"{pre}.conv1", dim, k, dim)
        snake(f"{pre}.act2", dim)
        wn(f"{pre}.conv2", dim, 1, dim)

    wn("encoder.conv_in", enc_dim, 7, 1)
    dim = enc_dim
    for i, s in enumerate(enc_rates):
        dim *= 2
        pre = f"encoder.blocks.{i}"
        for j in range(3):
            res(f"{pre}.res{j + 1}", dim // 2)
        snake(f"{pre}.snake", dim // 2)
        wn(f"{pre}.conv", dim, 2 * s, dim // 2)
    snake("encoder.snake_out", dim)
    wn("encoder.conv_out", latent, 3, dim)
    wn("quantizer_in_proj", 2 * cb, 1, latent)
    wn("quantizer_out_proj", latent, 1, cb)
    def plain(name, o, k, i):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, k, i), 9 + c[0] % 5, 0.2)
        w[f"{name}.bias"] = modulo_values((o,), 3, 0.01)

    def lstm(name, h, layers=1):
        for i in range(layers):
            w[f"{name}.lstm.layers.{i}.Wx"] = modulo_values((4 * h, h), 7,
                                                            0.1)
            w[f"{name}.lstm.layers.{i}.Wh"] = modulo_values((4 * h, h), 9,
                                                            0.1)
            w[f"{name}.lstm.layers.{i}.bias"] = np.zeros(4 * h, np.float32)

    wn("decoder.conv_in", dec_dim, 7, latent)
    d = dec_dim
    # watermark channel chain: wm_in[i] -> wm_out[i] (== wm_in[i+1])
    wm_dims = [(8, 4), (4, 2)]
    wm_strides = [2, 2]
    for i, s in enumerate(dec_rates):
        pre = f"decoder.blocks.{i}"
        snake(f"{pre}.block_0", d)
        wn(f"{pre}.block_1", d // 2, 2 * s, d, transpose=True)
        d //= 2
        for bi in (4, 5, 8):
            res(f"{pre}.block_{bi}", d)
        # watermark side paths (plain convs, norm "none")
        wi, wo = wm_dims[i]
        ws = wm_strides[i]
        plain(f"{pre}.block_3", wo, 2 * ws, wi)  # MLX convT [O, K, I]
        plain(f"{pre}.block_11", wi, 2 * ws, wo)
        for bi in (6, 7):
            plain(f"{pre}.block_{bi}.conv1", wo // 2, 3, wo)
            plain(f"{pre}.block_{bi}.conv2", wo, 1, wo // 2)
    snake("decoder.snake_out", d)
    wn("decoder.conv_out", 1, 7, d)
    # AudioSeal-style watermarker (wm hidden 8, latent 4, nbits 4)
    plain("wm_model.encoder_block.pre_3", 2, 7, 1)
    lstm("wm_model.encoder_block.post_0", 8)
    plain("wm_model.encoder_block.post_2", 4, 7, 8)
    w["wm_model.msg_processor.msg_processor.weight"] = modulo_values(
        (8, 4), 11, 0.2)
    plain("wm_model.decoder_block.pre_0", 8, 7, 4)
    lstm("wm_model.decoder_block.pre_1", 8)
    plain("wm_model.decoder_block.post_1", 1, 7, 2)
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps({
        "model_type": "dacvae",
        "encoder_dim": enc_dim, "encoder_rates": list(enc_rates),
        "latent_dim": latent, "decoder_dim": dec_dim,
        "decoder_rates": list(dec_rates), "codebook_dim": cb,
        "sample_rate": 16000, "mean": 0.0, "std": 1.0,
        "wm_rates": [2, 2], "wm_nbits": 4,
    }))
    save_file(w, str(path / "model.safetensors"))
    return path


def make_fish_s1_fixture(path: Path) -> Path:
    """Tiny Fish-S1 DAC: causal SEANet with one encoder-stage transformer,
    2x-downsampled dual RVQ with pre/post window transformers. Uses
    torch-style parametrized weight-norm keys with .conv wrappers."""
    from safetensors.numpy import save_file

    enc_dim, enc_rates = 4, (2, 2)
    dec_dim, dec_rates = 16, (2, 2)
    latent, cb_dim, cb_size, sem_size, n_q = 8, 4, 16, 32, 2
    head_dim = 4
    w = {}
    c = [0]

    def conv(pre, o, i, k, wrapped=True):
        c[0] += 1
        v = modulo_values((o, i, k), 9 + c[0] % 5, 0.2)
        g = np.sqrt((v.astype(np.float64) ** 2).sum(
            axis=(1, 2), keepdims=True)).astype(np.float32)
        mid = ".conv" if wrapped else ""
        w[f"{pre}{mid}.parametrizations.weight.original0"] = g
        w[f"{pre}{mid}.parametrizations.weight.original1"] = v
        w[f"{pre}{mid}.bias"] = modulo_values((o,), 3, 0.01)

    def convt(pre, i, o, k):
        c[0] += 1
        v = modulo_values((i, o, k), 9 + c[0] % 5, 0.2)
        g = np.sqrt((v.astype(np.float64) ** 2).sum(
            axis=(1, 2), keepdims=True)).astype(np.float32)
        w[f"{pre}.conv.parametrizations.weight.original0"] = g
        w[f"{pre}.conv.parametrizations.weight.original1"] = v
        w[f"{pre}.conv.bias"] = modulo_values((o,), 3, 0.01)

    def snake(pre, ch):
        w[f"{pre}.alpha"] = np.ones((1, ch, 1), np.float32)

    def res(pre, dim):
        snake(f"{pre}.block.0", dim)
        conv(f"{pre}.block.1", dim, dim, 7)
        snake(f"{pre}.block.2", dim)
        conv(f"{pre}.block.3", dim, dim, 1)

    def lin(name, o, i, bias=False):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.2)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    def transformer(pre, dim, n_layers, n_heads):
        ad = n_heads * head_dim
        for i in range(n_layers):
            b = f"{pre}.layers.{i}"
            lin(f"{b}.attention.wqkv", 3 * ad, dim)
            lin(f"{b}.attention.wo", dim, ad)
            w[f"{b}.attention_norm.weight"] = np.ones(dim, np.float32)
            w[f"{b}.ffn_norm.weight"] = np.ones(dim, np.float32)
            w[f"{b}.attention_layer_scale.gamma"] = np.full(
                (dim,), 0.01, np.float32)
            w[f"{b}.ffn_layer_scale.gamma"] = np.full((dim,), 0.01,
                                                      np.float32)
            lin(f"{b}.feed_forward.w1", 2 * dim, dim)
            lin(f"{b}.feed_forward.w3", 2 * dim, dim)
            lin(f"{b}.feed_forward.w2", dim, 2 * dim)
        w[f"{pre}.norm.weight"] = np.ones(dim, np.float32)

    def convnext(pre, dim):
        conv(f"{pre}.dwconv", dim, 1, 7, wrapped=False)
        # depthwise torch weight [C,1,K]; fix shape after the fact
        del w[f"{pre}.dwconv.parametrizations.weight.original0"]
        del w[f"{pre}.dwconv.parametrizations.weight.original1"]
        del w[f"{pre}.dwconv.bias"]
        w[f"{pre}.dwconv.weight"] = modulo_values((dim, 1, 7), 13, 0.1)
        w[f"{pre}.dwconv.bias"] = np.zeros(dim, np.float32)
        w[f"{pre}.norm.weight"] = np.ones(dim, np.float32)
        w[f"{pre}.norm.bias"] = np.zeros(dim, np.float32)
        lin(f"{pre}.pwconv1", 2 * dim, dim, bias=True)
        lin(f"{pre}.pwconv2", dim, 2 * dim, bias=True)
        w[f"{pre}.gamma"] = np.full((dim,), 1e-2, np.float32)

    # encoder: block.0 conv, stages 1..2, snake, out conv
    conv("encoder.block.0", enc_dim, 1, 7)
    dim = enc_dim
    for i, s in enumerate(enc_rates):
        dim *= 2
        pre = f"encoder.block.{i + 1}.block"
        for j in range(3):
            res(f"{pre}.{j}", dim // 2)
        snake(f"{pre}.3", dim // 2)
        conv(f"{pre}.4", dim, dim // 2, 2 * s)
        if i == 1:  # encoder_transformer_layers (0, 1)
            transformer(f"{pre}.5", dim, 1, max(dim // 64, 1))
    snake("encoder.block.3", dim)
    conv("encoder.block.4", latent, dim, 3)
    # quantizer
    conv("quantizer.downsample.0.0", latent, latent, 2, wrapped=False)
    convnext("quantizer.downsample.0.1", latent)
    convt("quantizer.upsample.0.0", latent, latent, 2)
    convnext("quantizer.upsample.0.1", latent)
    transformer("quantizer.pre_module", latent, 1, 2)
    transformer("quantizer.post_module", latent, 1, 2)
    for part, nq, size in (("semantic_quantizer", 1, sem_size),
                           ("quantizer", n_q, cb_size)):
        for i in range(nq):
            pre = f"quantizer.{part}.quantizers.{i}"
            conv(f"{pre}.in_proj", cb_dim, latent, 1)
            conv(f"{pre}.out_proj", latent, cb_dim, 1)
            w[f"{pre}.codebook.weight"] = modulo_values((size, cb_dim),
                                                        17 + i, 0.5)
    # decoder
    conv("decoder.model.0", dec_dim, latent, 7)
    d = dec_dim
    for i, s in enumerate(dec_rates):
        pre = f"decoder.model.{i + 1}.block"
        snake(f"{pre}.0", d)
        convt(f"{pre}.1", d, d // 2, 2 * s)
        d //= 2
        for j in range(3):
            res(f"{pre}.{j + 2}", d)
    snake("decoder.model.3", d)
    conv("decoder.model.4", 1, d, 7)
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps({
        "model_type": "fish_s1_dac",
        "encoder_dim": enc_dim, "encoder_rates": list(enc_rates),
        "latent_dim": latent, "decoder_dim": dec_dim,
        "decoder_rates": list(dec_rates), "n_codebooks": n_q,
        "codebook_size": cb_size, "codebook_dim": cb_dim,
        "semantic_codebook_size": sem_size, "downsample_factor": [2],
        "sample_rate": 16000, "causal": True,
        "encoder_transformer_layers": [0, 1],
        "decoder_transformer_layers": [0, 0],
        "quantizer_transformer_layers": 1,
        "quantizer_transformer_heads": 2,
        "quantizer_transformer_dim": latent,
        "transformer_head_dim": head_dim,
        "quantizer_window_size": 16, "window_size": 16,
    }))
    save_file(w, str(path / "model.safetensors"))
    return path


def make_s3_tokenizer_fixture(path: Path) -> Path:
    """Tiny S3TokenizerV2 (FSMN attention + FSQ)."""
    from safetensors.numpy import save_file

    d, heads, layers, n_mels, kernel = 16, 4, 2, 8, 7
    w = {}

    def lin(name, o, i, seed, bias=True):
        w[f"{name}.weight"] = modulo_values((o, i), seed, 0.25)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    w["encoder.conv1.weight"] = modulo_values((d, 3, n_mels), 7, 0.3)
    w["encoder.conv1.bias"] = np.zeros(d, np.float32)
    w["encoder.conv2.weight"] = modulo_values((d, 3, d), 11, 0.3)
    w["encoder.conv2.bias"] = np.zeros(d, np.float32)
    for i in range(layers):
        b = f"encoder.blocks.{i}"
        lin(f"{b}.attn.query", d, d, 13 + i)
        lin(f"{b}.attn.key", d, d, 17 + i, bias=False)
        lin(f"{b}.attn.value", d, d, 19 + i)
        lin(f"{b}.attn.out", d, d, 23 + i)
        w[f"{b}.attn.fsmn_block.weight"] = modulo_values((d, kernel, 1),
                                                         29 + i, 0.1)
        for nrm in ("attn_ln", "mlp_ln"):
            w[f"{b}.{nrm}.weight"] = np.ones(d, np.float32)
            w[f"{b}.{nrm}.bias"] = np.zeros(d, np.float32)
        lin(f"{b}.mlp.0", 4 * d, d, 31 + i)
        lin(f"{b}.mlp.2", d, 4 * d, 37 + i)
    lin("quantizer.fsq_codebook.project_down", 8, d, 41)
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps({
        "model_type": "s3tokenizer",
        "n_mels": n_mels, "n_audio_state": d, "n_audio_head": heads,
        "n_audio_layer": layers, "n_codebook_size": 6561,
        "kernel_size": kernel,
    }))
    save_file(w, str(path / "model.safetensors"))
    return path


def make_higgs_fixture(path: Path) -> Path:
    """Tiny HiggsAudio tokenizer (decode path): 2-stage decoder,
    2-codebook RVQ, with semantic-branch keys that sanitize must drop."""
    from safetensors.numpy import save_file

    latent, cb_dim, cb_size, n_q = 8, 4, 16, 2
    dec_in = 8  # fc2 output / decoder conv1 input
    w = {}
    c = [0]

    def conv(pre, o, i, k):
        c[0] += 1
        w[f"{pre}.weight"] = modulo_values((o, i, k), 9 + c[0] % 5, 0.2)
        w[f"{pre}.bias"] = modulo_values((o,), 3, 0.01)

    def convt(pre, i, o, k):
        c[0] += 1
        w[f"{pre}.weight"] = modulo_values((i, o, k), 9 + c[0] % 5, 0.2)
        w[f"{pre}.bias"] = modulo_values((o,), 3, 0.01)

    def lin(pre, o, i):
        c[0] += 1
        w[f"{pre}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.25)
        w[f"{pre}.bias"] = modulo_values((o,), 5, 0.01)

    def snake(pre, ch):
        w[f"{pre}.alpha"] = np.ones((1, ch, 1), np.float32)

    def res(pre, dim):
        snake(f"{pre}.snake1", dim)
        conv(f"{pre}.conv1", dim, dim, 7)
        snake(f"{pre}.snake2", dim)
        conv(f"{pre}.conv2", dim, dim, 1)

    for i in range(n_q):
        pre = f"quantizer.quantizers.{i}"
        lin(f"{pre}.project_in", cb_dim, latent)
        lin(f"{pre}.project_out", latent, cb_dim)
        w[f"{pre}.codebook.embed"] = modulo_values((cb_size, cb_dim),
                                                   17 + i, 0.5)
        w[f"{pre}.codebook.embed_avg"] = np.zeros((cb_size, cb_dim),
                                                  np.float32)
        w[f"{pre}.codebook.cluster_size"] = np.ones(cb_size, np.float32)
    lin("fc2", dec_in, latent)
    # acoustic encoder (mirror of the decoder; head width == RVQ latent so
    # encode_acoustic round-trips like the reference's encodeAcoustic)
    conv("acoustic_encoder.conv1", 4, 1, 7)
    e = 4
    for i, s in enumerate((4, 2)):
        pre = f"acoustic_encoder.block.{i}"
        for j in range(3):
            res(f"{pre}.res_unit{j + 1}", e)
        snake(f"{pre}.snake1", e)
        conv(f"{pre}.conv1", 2 * e, e, 2 * s)
        e *= 2
    snake("acoustic_encoder.snake1", e)
    conv("acoustic_encoder.conv2", latent, e, 3)
    conv("acoustic_decoder.conv1", 16, dec_in, 7)
    d = 16
    for i, s in enumerate((4, 2)):
        pre = f"acoustic_decoder.block.{i}"
        snake(f"{pre}.snake1", d)
        convt(f"{pre}.conv_t1", d, d // 2, 2 * s)
        d //= 2
        for j in range(3):
            res(f"{pre}.res_unit{j + 1}", d)
    snake("acoustic_decoder.snake1", d)
    conv("acoustic_decoder.conv2", 1, d, 7)
    # semantic branch keys that must be dropped
    w["semantic_model.masked_spec_embed"] = np.zeros(4, np.float32)
    lin("fc1", 4, 4)
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps({
        "model_type": "higgs_audio_v2_tokenizer",
        "sample_rate": 16000, "codebook_size": cb_size,
        "codebook_dim": cb_dim, "downsample_factor": 8,
        "dac_num_codebooks": n_q, "dac_encoder_ratios": [4, 2],
        "dac_decoder_hidden": latent,
    }))
    save_file(w, str(path / "model.safetensors"))
    return path


def make_moss_tokenizer_fixture(path: Path) -> Path:
    """Tiny MOSS audio tokenizer: patch(4) + transformer encoder, RLFQ,
    transformer + unpatch decoder. Weight-norm 1x1 projs."""
    from safetensors.numpy import save_file

    d, heads, layers = 8, 2, 1
    rvq, cb_dim, cb_size, n_q = 8, 4, 16, 2
    w = {}
    c = [0]

    def lin(name, o, i):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.25)

    def wn1x1(pre, o, i):
        c[0] += 1
        v = modulo_values((o, i, 1), 9 + c[0] % 5, 0.3)
        g = np.sqrt((v.astype(np.float64) ** 2).sum(
            axis=(1, 2), keepdims=True)).astype(np.float32)
        w[f"{pre}.parametrizations.weight.original0"] = g
        w[f"{pre}.parametrizations.weight.original1"] = v
        w[f"{pre}.bias"] = modulo_values((o,), 3, 0.01)

    def transformer(pre, d_model, in_dim, out_dim):
        if in_dim != d_model:
            lin(f"{pre}.input_proj", d_model, in_dim)
        if out_dim != d_model:
            lin(f"{pre}.output_proj", out_dim, d_model)
        for i in range(layers):
            b = f"{pre}.transformer.layers.{i}"
            lin(f"{b}.self_attn.in_projs.0", 3 * d_model, d_model)
            lin(f"{b}.self_attn.out_projs.0", d_model, d_model)
            for nrm in ("norm1", "norm2"):
                w[f"{b}.{nrm}.weight"] = np.ones(d_model, np.float32)
                w[f"{b}.{nrm}.bias"] = np.zeros(d_model, np.float32)
            lin(f"{b}.linear1", 2 * d_model, d_model)
            lin(f"{b}.linear2", d_model, 2 * d_model)
            w[f"{b}.layer_scale_1.scale"] = np.full((d_model,), 0.01,
                                                    np.float32)
            w[f"{b}.layer_scale_2.scale"] = np.full((d_model,), 0.01,
                                                    np.float32)

    transformer("encoder.1", d, 4, rvq)  # after patch(4): 4 channels in
    wn1x1("quantizer.input_proj", rvq, rvq)
    wn1x1("quantizer.output_proj", rvq, rvq)
    for i in range(n_q):
        pre = f"quantizer.quantizers.{i}"
        wn1x1(f"{pre}.in_proj", cb_dim, rvq)
        wn1x1(f"{pre}.out_proj", rvq, cb_dim)
        w[f"{pre}.codebook.weight"] = modulo_values((cb_size, cb_dim),
                                                    17 + i, 0.5)
    transformer("decoder.0", d, rvq, 4)
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps({
        "model_type": "moss_audio_tokenizer",
        "sample_rate": 16000, "sampling_rate": 16000,
        "downsample_rate": 4, "number_channels": 1,
        "enable_channel_interleave": False,
        "causal_transformer_context_duration": 0.01,
        "encoder_kwargs": [
            {"module_type": "PatchedPretransform", "patch_size": 4},
            {"module_type": "Transformer", "input_dimension": 4,
             "output_dimension": rvq, "d_model": d, "num_heads": heads,
             "num_layers": layers, "dim_feedforward": 2 * d,
             "causal": True, "positional_embedding": "rope",
             "layer_scale": 0.01},
        ],
        "decoder_kwargs": [
            {"module_type": "Transformer", "input_dimension": rvq,
             "output_dimension": 4, "d_model": d, "num_heads": heads,
             "num_layers": layers, "dim_feedforward": 2 * d,
             "causal": True, "positional_embedding": "rope",
             "layer_scale": 0.01},
            {"module_type": "PatchedPretransform", "patch_size": 4},
        ],
        "quantizer_type": "rlfq",
        "quantizer_kwargs": {"input_dim": rvq, "rvq_dim": rvq,
                             "output_dim": rvq, "num_quantizers": n_q,
                             "codebook_size": cb_size,
                             "codebook_dim": cb_dim},
    }))
    save_file(w, str(path / "model.safetensors"))
    return path


def make_moss_tts_fixture(path: Path) -> Path:
    """Tiny MOSS-TTS Nano: rope GPT-2 global + local transformers, 2
    audio codebooks, bundled audio_tokenizer dir, WordLevel tokenizer."""
    from safetensors.numpy import save_file
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    d, heads, n_vq, avocab, tvocab = 16, 4, 2, 16, 64
    w = {}
    c = [0]

    def lin(name, o, i):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.25)
        w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    def gpt2(pre, layers):
        for i in range(layers):
            b = f"{pre}.h.{i}"
            lin(f"{b}.attn.c_attn", 3 * d, d)
            lin(f"{b}.attn.c_proj", d, d)
            for nrm in ("ln_1", "ln_2"):
                w[f"{b}.{nrm}.weight"] = np.ones(d, np.float32)
                w[f"{b}.{nrm}.bias"] = np.zeros(d, np.float32)
            lin(f"{b}.mlp.fc_in", 4 * d, d)
            lin(f"{b}.mlp.fc_out", d, 4 * d)
        w[f"{pre}.ln_f.weight"] = np.ones(d, np.float32)
        w[f"{pre}.ln_f.bias"] = np.zeros(d, np.float32)

    w["transformer.wte.weight"] = modulo_values((tvocab, d), 7, 0.3)
    gpt2("transformer", 2)
    gpt2("local_transformer", 1)
    for ch in range(n_vq):
        w[f"audio_embeddings.{ch}.weight"] = modulo_values(
            (avocab + 1, d), 13 + ch, 0.3)  # +1 pad row
    # alias keys sanitize must drop
    w["text_lm_head.weight"] = modulo_values((tvocab, d), 3, 0.1)
    w["audio_lm_heads.0.weight"] = modulo_values((avocab, d), 3, 0.1)
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps({
        "model_type": "moss_tts_nano",
        "gpt2_config": {"vocab_size": tvocab, "n_embd": d, "n_layer": 2,
                        "n_head": heads, "n_positions": 1024,
                        "activation_function": "gelu_new",
                        "position_embedding_type": "rope"},
        "local_transformer_layers": 1,
        "n_vq": n_vq, "audio_vocab_size": avocab,
        "audio_pad_token_id": avocab,
        "im_start_token_id": 4, "im_end_token_id": 5,
        "audio_start_token_id": 6, "audio_end_token_id": 7,
        "audio_user_slot_token_id": 8, "audio_assistant_slot_token_id": 9,
        "audio_tokenizer_sample_rate": 16000,
    }))
    vmap = {f"w{i}": i for i in range(tvocab)}
    tok = Tokenizer(WordLevel(vmap, unk_token="w0"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(path / "tokenizer.json"))
    # bundled audio tokenizer (reuse the MOSS tokenizer fixture layout)
    make_moss_tokenizer_fixture(path / "audio_tokenizer")
    save_file(w, str(path / "model.safetensors"))
    return path


def write_fixture_tokenizer(path: Path, vocab: int = 64) -> None:
    """Write a real tokenizer.json (WordLevel) with whisper-style special
    tokens at the top of the vocab, loadable by WhisperTokenizer.from_dir."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    specials = [
        "<|endoftext|>", "<|startoftranscript|>", "<|transcribe|>",
        "<|translate|>", "<|notimestamps|>", "<|nospeech|>",
        "<|en|>", "<|fr|>",
    ]
    n_words = vocab - len(specials)
    vocab_map = {f"w{i}": i for i in range(n_words)}
    # specials occupy the top ids, eot highest
    vocab_map.update({s: vocab - 1 - k for k, s in enumerate(specials)})
    tok = Tokenizer(WordLevel(vocab_map, unk_token="w0"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(Path(path) / "tokenizer.json"))


class FakeWhisperTokenizer:
    """Stand-in tokenizer for fixture models: specials occupy the top of a
    tiny vocab, decode() is a readable stub."""

    def __init__(self, vocab: int = 64):
        self.is_multilingual = True
        self.eot = vocab - 1
        self.sot = vocab - 2
        self.transcribe = vocab - 3
        self.translate = vocab - 4
        self.no_timestamps = vocab - 5
        self.no_speech = vocab - 6
        self.timestamp_begin = vocab - 1  # no timestamp tokens in fixture
        self.language_to_id = {"en": vocab - 7, "fr": vocab - 8}
        self.id_to_language = {v: k for k, v in self.language_to_id.items()}

    def build_prompt_tokens(self, language=None, task="transcribe"):
        lang = self.language_to_id.get(language or "en")
        task_id = self.translate if task == "translate" else self.transcribe
        return [self.sot, lang, task_id, self.no_timestamps]

    def decode(self, tokens):
        return " ".join(f"t{t}" for t in tokens if t < self.sot - 7)


def make_moss_diarize_fixture(path: Path) -> Path:
    """Tiny MOSS-Transcribe-Diarize checkpoint: whisper encoder + VQ adaptor
    (written in raw HF layout to exercise sanitize, including the
    ``vq_adwaptor`` typo path) + Qwen3 LM + digit-token tokenizer."""
    import json

    from safetensors.numpy import save_file
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    MELS, AD, AH, AFFN = 16, 16, 2, 32
    TH, THEADS, TKV, TFFN, VOCAB = 24, 2, 1, 48, 100
    cfg = {
        "model_type": "moss_transcribe_diarize",
        "audio_token_id": 94,
        "audio_merge_size": 4,
        "tie_word_embeddings": True,
        "sample_rate": 16000,
        "audio_config": {
            "num_mel_bins": MELS, "d_model": AD, "encoder_layers": 1,
            "encoder_attention_heads": AH, "encoder_ffn_dim": AFFN,
            "max_source_positions": 1500,
        },
        "text_config": {
            "hidden_size": TH, "num_hidden_layers": 2,
            "intermediate_size": TFFN, "num_attention_heads": THEADS,
            "num_key_value_heads": TKV, "vocab_size": VOCAB,
            "rope_theta": 10000.0, "rms_norm_eps": 1e-6,
        },
    }
    (path / "config.json").write_text(json.dumps(cfg))
    (path / "processor_config.json").write_text(json.dumps({
        "audio_tokens_per_second": 12.5,
        "time_marker_every_seconds": 5,
        "enable_time_marker": True,
    }))

    w = {}
    c = [0]

    def lin(name, o, i, bias=True):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.2)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    enc = "model.whisper_encoder"
    w[f"{enc}.conv1.weight"] = modulo_values((AD, MELS, 3), 9, 0.2)
    w[f"{enc}.conv1.bias"] = modulo_values((AD,), 3, 0.01)
    w[f"{enc}.conv2.weight"] = modulo_values((AD, AD, 3), 10, 0.2)
    w[f"{enc}.conv2.bias"] = modulo_values((AD,), 3, 0.01)
    w[f"{enc}.embed_positions.weight"] = modulo_values((1500, AD), 7, 0.05)
    w[f"{enc}.layer_norm.weight"] = np.ones((AD,), np.float32)
    w[f"{enc}.layer_norm.bias"] = np.zeros((AD,), np.float32)
    base = f"{enc}.layers.0"
    for proj in ("q_proj", "v_proj", "out_proj"):
        lin(f"{base}.self_attn.{proj}", AD, AD)
    lin(f"{base}.self_attn.k_proj", AD, AD, bias=False)
    for nrm in ("self_attn_layer_norm", "final_layer_norm"):
        w[f"{base}.{nrm}.weight"] = np.ones((AD,), np.float32)
        w[f"{base}.{nrm}.bias"] = np.zeros((AD,), np.float32)
    lin(f"{base}.fc1", AFFN, AD)
    lin(f"{base}.fc2", AD, AFFN)

    # VQ adaptor, with the checkpoint's "vq_adwaptor" typo
    lin("model.vq_adwaptor.layers.0", TH, AD * 4)
    lin("model.vq_adwaptor.layers.2", TH, TH)
    w["model.vq_adwaptor.layers.3.weight"] = np.ones((TH,), np.float32)
    w["model.vq_adwaptor.layers.3.bias"] = np.zeros((TH,), np.float32)

    lm = "model.language_model"
    hd = TH // THEADS
    w[f"{lm}.embed_tokens.weight"] = modulo_values((VOCAB, TH), 13, 0.3)
    w[f"{lm}.norm.weight"] = np.ones((TH,), np.float32)
    for i in range(2):
        base = f"{lm}.layers.{i}"
        w[f"{base}.input_layernorm.weight"] = np.ones((TH,), np.float32)
        w[f"{base}.post_attention_layernorm.weight"] = np.ones((TH,),
                                                               np.float32)
        lin(f"{base}.self_attn.q_proj", THEADS * hd, TH, bias=False)
        lin(f"{base}.self_attn.k_proj", TKV * hd, TH, bias=False)
        lin(f"{base}.self_attn.v_proj", TKV * hd, TH, bias=False)
        lin(f"{base}.self_attn.o_proj", TH, THEADS * hd, bias=False)
        w[f"{base}.self_attn.q_norm.weight"] = np.ones((hd,), np.float32)
        w[f"{base}.self_attn.k_norm.weight"] = np.ones((hd,), np.float32)
        lin(f"{base}.mlp.gate_proj", TFFN, TH, bias=False)
        lin(f"{base}.mlp.up_proj", TFFN, TH, bias=False)
        lin(f"{base}.mlp.down_proj", TH, TFFN, bias=False)
    save_file(w, str(path / "model.safetensors"))

    vocab_map = {f"w{i}": i for i in range(80)}
    for d in range(10):
        vocab_map[str(d)] = 80 + d
    specials = ["<|im_start|>", "<|im_end|>", "<|audio_start|>",
                "<|audio_end|>", "<|audio_pad|>"]
    for j, s in enumerate(specials):
        vocab_map[s] = 90 + j  # audio_pad -> 94
    tok = Tokenizer(WordLevel(vocab_map, unk_token="w0"))
    tok.pre_tokenizer = Whitespace()
    tok.add_special_tokens(specials)
    tok.save(str(path / "tokenizer.json"))
    return path


def make_fish_speech_fixture(path: Path) -> Path:
    """Tiny FishSpeech checkpoint: the fish_s1 codec fixture plus a dual-AR
    LM (slow 2-layer + fast 1-layer) in raw HF layout (text_model.model.* /
    audio_decoder.*) and a merged config.json."""
    import json

    from safetensors.numpy import load_file, save_file
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    path = make_fish_s1_fixture(path)
    w = dict(load_file(str(path / "model.safetensors")))

    D, HEADS, KV, HD, FFN, VOCAB = 16, 2, 1, 8, 32, 128
    FAST_VOCAB, K = 32, 3  # 1 semantic + 2 residual codebooks
    c = [0]

    def lin(name, o, i):
        c[0] += 1
        w[name + ".weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.2)

    w["text_model.model.embeddings.weight"] = modulo_values((VOCAB, D), 13, 0.3)
    w["text_model.model.codebook_embeddings.weight"] = modulo_values(
        (FAST_VOCAB * K, D), 15, 0.3)
    w["text_model.model.norm.weight"] = np.ones((D,), np.float32)
    for i in range(2):
        base = f"text_model.model.layers.{i}"
        lin(f"{base}.attention.wqkv", (HEADS + 2 * KV) * HD, D)
        lin(f"{base}.attention.wo", D, HEADS * HD)
        w[f"{base}.attention.q_norm.weight"] = np.ones((HD,), np.float32)
        w[f"{base}.attention.k_norm.weight"] = np.ones((HD,), np.float32)
        w[f"{base}.attention_norm.weight"] = np.ones((D,), np.float32)
        w[f"{base}.ffn_norm.weight"] = np.ones((D,), np.float32)
        lin(f"{base}.feed_forward.w1", FFN, D)
        lin(f"{base}.feed_forward.w2", D, FFN)
        lin(f"{base}.feed_forward.w3", FFN, D)
    # fast decoder (audio_decoder.*, no qk_norm, same dim -> no project_in)
    w["audio_decoder.embeddings.weight"] = modulo_values((FAST_VOCAB, D), 19, 0.3)
    w["audio_decoder.norm.weight"] = np.ones((D,), np.float32)
    lin("audio_decoder.output", FAST_VOCAB, D)
    base = "audio_decoder.layers.0"
    lin(f"{base}.attention.wqkv", (HEADS + 2 * HEADS) * HD, D)
    lin(f"{base}.attention.wo", D, HEADS * HD)
    w[f"{base}.attention_norm.weight"] = np.ones((D,), np.float32)
    w[f"{base}.ffn_norm.weight"] = np.ones((D,), np.float32)
    lin(f"{base}.feed_forward.w1", FFN, D)
    lin(f"{base}.feed_forward.w2", D, FFN)
    lin(f"{base}.feed_forward.w3", FFN, D)
    save_file(w, str(path / "model.safetensors"))

    codec_cfg = json.loads((path / "config.json").read_text())
    codec_cfg.update({
        "model_type": "fish_speech",
        "pad_token_id": 1, "eos_token_id": 61,
        "semantic_start_token_id": 64, "semantic_end_token_id": 95,
        "text_config": {
            "vocab_size": VOCAB, "n_layer": 2, "n_head": HEADS,
            "dim": D, "intermediate_size": FFN, "n_local_heads": KV,
            "head_dim": HD, "rope_base": 10000.0, "norm_eps": 1e-6,
            "attention_qk_norm": True,
        },
        "audio_decoder_config": {
            "vocab_size": FAST_VOCAB, "n_layer": 1, "n_head": HEADS,
            "dim": D, "intermediate_size": FFN, "n_local_heads": HEADS,
            "head_dim": HD, "rope_base": 10000.0, "norm_eps": 1e-6,
            "attention_qk_norm": False, "num_codebooks": K, "text_dim": D,
        },
    })
    (path / "config.json").write_text(json.dumps(codec_cfg))

    vocab_map = {f"w{i}": i for i in range(60) if i not in (50, 51, 52)}
    # collision-free ids (see make_qwen3_asr_fixture note)
    vocab_map.update({"hello": 50, "world": 51, "speech": 52})
    specials = ["<|im_start|>", "<|im_end|>", "<|voice|>", "<|speaker:0|>"]
    for j, s in enumerate(specials):
        vocab_map[s] = 60 + j  # im_end -> 61
    tok = Tokenizer(WordLevel(vocab_map, unk_token="w0"))
    tok.pre_tokenizer = Whitespace()
    tok.add_special_tokens(specials)
    tok.save(str(path / "tokenizer.json"))
    return path


def make_indextts_fixture(path: Path) -> Path:
    """Tiny IndexTTS checkpoint in RAW torch layout (num_batches_tracked
    markers, GPT-2 Conv1D [in,out] weights, weight-normed BigVGAN,
    SpeechBrain-style speaker encoder keys) to exercise the full sanitize."""
    import json
    import struct

    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    D, HEADS = 16, 2                      # gpt
    CD, CH_HEADS, CFF = 16, 2, 32         # conformer (output dim = D)
    MELS = 8                              # conformer + vocoder mels
    N_LAT, P_HD = 4, 64                   # perceiver latents / head dim
    N_TEXT, N_MEL = 30, 12
    SPK, VCH = 4, 8                       # speaker dim, vocoder channels

    cfg = {
        "model_type": "indextts",
        "sample_rate": 24000,
        "gpt": {
            "model_dim": D, "heads": HEADS, "layers": 1,
            "max_mel_tokens": 32, "max_text_tokens": 32,
            "number_text_tokens": N_TEXT, "number_mel_codes": N_MEL,
            "start_mel_token": 10, "stop_mel_token": 11,
            "start_text_token": 0, "stop_text_token": 1,
            "use_mel_codes_as_input": True, "mel_length_compression": 256,
            "condition_type": "conformer_perceiver",
            "condition_num_latent": N_LAT,
            "condition_module": {
                "input_size": MELS, "output_size": CD, "num_blocks": 1,
                "linear_units": CFF, "attention_heads": CH_HEADS,
                "pos_enc_layer_type": "rel_pos", "input_layer": "conv2d",
                "cnn_module_kernel": 3, "perceiver_mult": 2,
            },
        },
        "bigvgan": {
            "num_mels": MELS, "upsample_rates": [2],
            "upsample_kernel_sizes": [4], "upsample_initial_channel": VCH,
            "resblock": "1", "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3]],
            "activation": "snakebeta", "snake_logscale": True,
            "gpt_dim": D, "speaker_embedding_dim": SPK,
            "cond_d_vector_in_each_upsampling_layer": True,
        },
        "speaker_encoder": {
            "channels": 8, "attention_channels": 4, "se_channels": 4,
            "res2net_scale": 4,
        },
    }
    (path / "config.json").write_text(json.dumps(cfg))

    w = {}
    c = [0]

    def lin(name, o, i, bias=True):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.2)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    def ln(name, ch):
        w[f"{name}.weight"] = np.ones((ch,), np.float32)
        w[f"{name}.bias"] = np.zeros((ch,), np.float32)

    # conformer conditioning encoder (raw torch: embed.conv.0 / .2)
    ce = "conditioning_encoder"
    c[0] += 1
    w[f"{ce}.embed.conv.0.weight"] = modulo_values((CD, 1, 3, 3), 9, 0.2)
    w[f"{ce}.embed.conv.0.bias"] = modulo_values((CD,), 3, 0.01)
    out_freq = (MELS - 3 + 2) // 2
    lin(f"{ce}.embed.out.0", CD, CD * out_freq)
    b0 = f"{ce}.encoders.0"
    for nm in ("norm_mha", "norm_conv", "norm_ff", "norm_final"):
        ln(f"{b0}.{nm}", CD)
    sa = f"{b0}.self_attn"
    for proj in ("linear_q", "linear_k", "linear_v", "linear_out"):
        lin(f"{sa}.{proj}", CD, CD)
    lin(f"{sa}.linear_pos", CD, CD, bias=False)
    w[f"{sa}.pos_bias_u"] = modulo_values((CH_HEADS, CD // CH_HEADS), 7, 0.1)
    w[f"{sa}.pos_bias_v"] = modulo_values((CH_HEADS, CD // CH_HEADS), 9, 0.1)
    cm = f"{b0}.conv_module"
    lin(f"{cm}.pointwise_conv1", CD * 2, CD)
    w[f"{cm}.pointwise_conv1.weight"] = w.pop(
        f"{cm}.pointwise_conv1.weight")[..., None]  # conv1d k=1
    c[0] += 1
    w[f"{cm}.depthwise_conv.weight"] = modulo_values((CD, 1, 3), 13, 0.2)
    w[f"{cm}.depthwise_conv.bias"] = modulo_values((CD,), 3, 0.01)
    ln(f"{cm}.norm", CD)
    lin(f"{cm}.pointwise_conv2", CD, CD)
    w[f"{cm}.pointwise_conv2.weight"] = w.pop(
        f"{cm}.pointwise_conv2.weight")[..., None]
    lin(f"{b0}.feed_forward.w_1", CFF, CD)
    lin(f"{b0}.feed_forward.w_2", CD, CFF)
    ln(f"{ce}.after_norm", CD)

    # perceiver (raw names: layers.N.0.to_q / .1.0)
    pe = "perceiver_encoder"
    w[f"{pe}.latents"] = modulo_values((N_LAT, D), 15, 0.3)
    dff = (D * 2 * 2) // 3
    for i in range(2):
        lin(f"{pe}.layers.{i}.0.to_q", P_HD * CH_HEADS, D, bias=False)
        lin(f"{pe}.layers.{i}.0.to_kv", P_HD * CH_HEADS * 2, D, bias=False)
        lin(f"{pe}.layers.{i}.0.to_out", D, P_HD * CH_HEADS, bias=False)
        lin(f"{pe}.layers.{i}.1.0", dff * 2, D)
        lin(f"{pe}.layers.{i}.1.2", D, dff)
    w[f"{pe}.norm.gamma"] = np.ones((D,), np.float32)
    w[f"{pe}.norm.beta"] = np.zeros((D,), np.float32)

    # GPT core
    w["text_embedding.weight"] = modulo_values((N_TEXT + 1, D), 17, 0.3)
    w["mel_embedding.weight"] = modulo_values((N_MEL, D), 19, 0.3)
    w["text_pos_embedding.emb.weight"] = modulo_values((34, D), 21, 0.1)
    w["mel_pos_embedding.emb.weight"] = modulo_values((64, D), 23, 0.1)
    lin("text_head", N_TEXT + 1, D)
    lin("mel_head", N_MEL, D)
    ln("final_norm", D)
    g0 = "gpt.h.0"
    ln(f"{g0}.ln_1", D)
    ln(f"{g0}.ln_2", D)
    ln("gpt.ln_f", D)
    # raw GPT-2 Conv1D stores [in, out]
    c[0] += 1
    w[f"{g0}.attn.c_attn.weight"] = modulo_values((D, 3 * D), 25, 0.2)
    w[f"{g0}.attn.c_attn.bias"] = modulo_values((3 * D,), 5, 0.01)
    w[f"{g0}.attn.c_proj.weight"] = modulo_values((D, D), 27, 0.2)
    w[f"{g0}.attn.c_proj.bias"] = modulo_values((D,), 5, 0.01)
    w[f"{g0}.mlp.c_fc.weight"] = modulo_values((D, 4 * D), 29, 0.2)
    w[f"{g0}.mlp.c_fc.bias"] = modulo_values((4 * D,), 5, 0.01)
    w[f"{g0}.mlp.c_proj.weight"] = modulo_values((4 * D, D), 31, 0.2)
    w[f"{g0}.mlp.c_proj.bias"] = modulo_values((D,), 5, 0.01)

    # BigVGAN vocoder (weight-normed, "bigvgan." prefix)
    def wn_conv(pre, o, i, k, seed):
        v = modulo_values((o, i, k), seed)
        g = np.linalg.norm(v.reshape(o, -1), axis=1).reshape(
            o, 1, 1).astype(np.float32)
        w[f"{pre}.weight_g"] = g
        w[f"{pre}.weight_v"] = v
        w[f"{pre}.bias"] = modulo_values((o,), 5)

    def wn_convt(pre, i, o, k, seed):
        v = modulo_values((i, o, k), seed)
        g = np.linalg.norm(v.reshape(i, -1), axis=1).reshape(
            i, 1, 1).astype(np.float32)
        w[f"{pre}.weight_g"] = g
        w[f"{pre}.weight_v"] = v
        w[f"{pre}.bias"] = modulo_values((o,), 7)

    bv = "bigvgan"
    wn_conv(f"{bv}.conv_pre", VCH, D, 7, 11)
    c[0] += 1
    w[f"{bv}.cond_layer.weight"] = modulo_values((VCH, SPK, 1), 33, 0.2)
    w[f"{bv}.cond_layer.bias"] = modulo_values((VCH,), 5, 0.01)
    wn_convt(f"{bv}.ups.0.0", VCH, VCH // 2, 4, 13)
    w[f"{bv}.conds.0.weight"] = modulo_values((VCH // 2, SPK, 1), 35, 0.2)
    w[f"{bv}.conds.0.bias"] = modulo_values((VCH // 2,), 5, 0.01)
    rb = f"{bv}.resblocks.0"
    for i in range(2):
        wn_conv(f"{rb}.convs1.{i}", VCH // 2, VCH // 2, 3, 17 + i)
        wn_conv(f"{rb}.convs2.{i}", VCH // 2, VCH // 2, 3, 19 + i)
        for j in (2 * i, 2 * i + 1):
            w[f"{rb}.activations.{j}.act.alpha"] = modulo_values(
                (1, VCH // 2, 1), 23 + j, 0.1)
            w[f"{rb}.activations.{j}.act.beta"] = modulo_values(
                (1, VCH // 2, 1), 29 + j, 0.1)
    w[f"{bv}.activation_post.act.alpha"] = modulo_values((1, VCH // 2, 1),
                                                         31, 0.1)
    w[f"{bv}.activation_post.act.beta"] = modulo_values((1, VCH // 2, 1),
                                                        37, 0.1)
    wn_conv(f"{bv}.conv_post", 1, VCH // 2, 7, 37)

    # speaker encoder (SpeechBrain keys, torch conv layout [O, I, K])
    def sconv(name, o, i, k, bias=True):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i, k), 9 + c[0] % 7, 0.2)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 3, 0.01)

    def sbn(name, ch):
        w[f"{name}.weight"] = np.ones((ch,), np.float32)
        w[f"{name}.bias"] = np.zeros((ch,), np.float32)
        w[f"{name}.running_mean"] = np.zeros((ch,), np.float32)
        w[f"{name}.running_var"] = np.ones((ch,), np.float32)
        w[f"{name}.num_batches_tracked"] = np.zeros((), np.int64)

    def stdnn(prefix, o, i, k):
        sconv(f"{prefix}.conv.conv", o, i, k)
        sbn(f"{prefix}.norm.norm", o)

    SCH, SCALE, SATT = 8, 4, 4
    se = f"{bv}.speaker_encoder"
    stdnn(f"{se}.blocks.0", SCH, MELS, 5)
    hidden = SCH // SCALE
    for b in (1, 2, 3):
        base = f"{se}.blocks.{b}"
        stdnn(f"{base}.tdnn1", SCH, SCH, 1)
        for i in range(SCALE - 1):
            stdnn(f"{base}.res2net_block.blocks.{i}", hidden, hidden, 3)
        stdnn(f"{base}.tdnn2", SCH, SCH, 1)
        sconv(f"{base}.se_block.conv1.conv", SATT, SCH, 1)
        sconv(f"{base}.se_block.conv2.conv", SCH, SATT, 1)
    stdnn(f"{se}.mfa", SCH * 3, SCH * 3, 1)
    stdnn(f"{se}.asp.tdnn", SATT, SCH * 9, 1)
    sconv(f"{se}.asp.conv", SCH * 3, SATT, 1)
    sbn(f"{se}.asp_bn.norm", SCH * 6)
    sconv(f"{se}.fc.conv", SPK, SCH * 6, 1)

    save_file(w, str(path / "model.safetensors"))

    # sentencepiece tokenizer (uppercase pieces: IndexTTS uppercases text)
    pieces = [("<unk>", 0.0, 2)]
    pieces += [(f"▁W{i}", -float(i), 1) for i in range(1, 10)]
    pieces += [("▁HELLO", -1.0, 1), ("▁WORLD", -1.5, 1)]
    pieces += [(ch, -25.0, 1) for ch in "ABCDEFGHIJ"]
    pieces += [(f"<0x{b:02X}>", 0.0, 6) for b in range(8)]
    (path / "tokenizer.model").write_bytes(serialize_sp_model(pieces))
    return path


def make_kitten_fixture(path: Path) -> Path:
    """Tiny KittenTTS: the Kokoro fixture nets with kitten-style config,
    ``.alphaN.i`` list keys (exercising the rename), and a single
    voices.safetensors of named style matrices."""
    import json

    from safetensors.numpy import load_file, save_file

    path = make_kokoro_fixture(path)
    # a real KittenTTS checkpoint ships no Misaki lexicon (the g2p repo is
    # separate); drop the kokoro fixture's so raw-IPA input passes through
    (path / "us_gold.json").unlink()
    w = {}
    for k, v in load_file(str(path / "model.safetensors")).items():
        k = k.replace(".alpha1_", ".alpha1.").replace(".alpha2_", ".alpha2.")
        w[k] = v
    save_file(w, str(path / "model.safetensors"))

    cfg = json.loads((path / "config.json").read_text())
    cfg.update({
        "model_type": "kitten_tts",
        "max_conv_dim": 32, "n_mels": 80, "decoder_out_dim": 16,
        "voices_path": "voices.npz",
        "speed_priors": {"expr-voice-5-m": 1.25},
        "voice_aliases": {"voice-5": "expr-voice-5-m"},
    })
    del cfg["vocab"]
    (path / "config.json").write_text(json.dumps(cfg))

    save_file({
        "expr-voice-5-m": modulo_values((8, 16), 29, 0.5),
        "expr-voice-2-f": modulo_values((8, 16), 31, 0.5),
    }, str(path / "voices.safetensors"))
    return path


def make_s3gen_fixture(path: Path, estimator: str = "dit") -> Path:
    """Tiny S3Gen token2wav: flow.safetensors (conformer + DiT or U-Net
    estimator) + hift.safetensors (raw torch key names, exercising
    sanitize_hift) + campplus.safetensors."""
    import json

    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    D, HEADS, FF, V, M, SPK = 8, 2, 16, 32, 4, 6
    c = [0]

    def lin(w, name, o, i, bias=True):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.2)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    def conv(w, name, o, i, k, bias=True):  # torch [O, I, K]
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i, k), 9 + c[0] % 5, 0.2)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 3, 0.01)

    def ln(w, name, d):
        w[f"{name}.weight"] = np.ones((d,), np.float32)
        w[f"{name}.bias"] = np.zeros((d,), np.float32)

    # ---- flow ----
    fw = {}
    fw["input_embedding.weight"] = modulo_values((V, D), 13, 0.3)
    lin(fw, "spk_embed_affine_layer", M, SPK)
    lin(fw, "encoder_proj", M, D)
    enc = "encoder"
    for emb in ("embed", "up_embed"):
        lin(fw, f"{enc}.{emb}.linear", D, D)
        ln(fw, f"{enc}.{emb}.norm", D)
    conv(fw, f"{enc}.pre_lookahead_layer.conv1", D, D, 4)
    conv(fw, f"{enc}.pre_lookahead_layer.conv2", D, D, 3)
    conv(fw, f"{enc}.up_layer.conv", D, D, 5)
    ln(fw, f"{enc}.after_norm", D)
    for group in ("encoders", "up_encoders"):
        base = f"{enc}.{group}.0"
        ln(fw, f"{base}.norm_mha", D)
        ln(fw, f"{base}.norm_ff", D)
        sa = f"{base}.self_attn"
        for proj in ("linear_q", "linear_k", "linear_v", "linear_out"):
            lin(fw, f"{sa}.{proj}", D, D)
        lin(fw, f"{sa}.linear_pos", D, D, bias=False)
        fw[f"{sa}.pos_bias_u"] = modulo_values((HEADS, D // HEADS), 7, 0.1)
        fw[f"{sa}.pos_bias_v"] = modulo_values((HEADS, D // HEADS), 9, 0.1)
        lin(fw, f"{base}.feed_forward.w_1", FF, D)
        lin(fw, f"{base}.feed_forward.w_2", D, FF)

    est = "decoder.estimator"
    if estimator == "dit":
        HID, HD = 8, 4
        # raw sequential names exercising sanitize_flow
        lin(fw, f"{est}.t_embedder.mlp.0", HID, 256)
        lin(fw, f"{est}.t_embedder.mlp.2", HID, HID)
        lin(fw, f"{est}.in_proj", HID, 4 * M)
        b0 = f"{est}.blocks.0"
        lin(fw, f"{b0}.adaLN_modulation.1", 9 * HID, HID)
        for proj in ("to_q", "to_k", "to_v"):
            lin(fw, f"{b0}.attn.{proj}", HEADS * HD, HID)
        ln(fw, f"{b0}.attn.q_norm", HD)
        ln(fw, f"{b0}.attn.k_norm", HD)
        lin(fw, f"{b0}.attn.proj", HID, HEADS * HD)
        conv(fw, f"{b0}.conv.block.1", HID, HID, 3)
        ln(fw, f"{b0}.conv.block.3", HID)
        conv(fw, f"{b0}.conv.block.6", HID, HID, 3)
        lin(fw, f"{b0}.mlp.fc1", 4 * HID, HID)
        lin(fw, f"{b0}.mlp.fc2", HID, 4 * HID)
        lin(fw, f"{est}.final_layer.adaLN_modulation.1", 2 * HID, HID)
        lin(fw, f"{est}.final_layer.linear", M, HID)
        fw["decoder.rand_noise"] = modulo_values((1, M, 512), 21, 1.0)
    else:  # unet
        CH = 8  # channels[0]
        TE = CH * 4
        IN = 4 * M  # x + mu + spks + cond
        lin(fw, f"{est}.time_mlp.linear_1", TE, IN)
        lin(fw, f"{est}.time_mlp.linear_2", TE, TE)
        lin(fw, f"{est}.time_embed_mixer", TE, TE * 2, bias=False)

        def resnet(name, din, dout):
            conv(fw, f"{name}.block1.block.0.conv.conv", dout, din, 3)
            ln(fw, f"{name}.block1.block.1", dout)
            conv(fw, f"{name}.block2.block.0.conv.conv", dout, dout, 3)
            ln(fw, f"{name}.block2.block.1", dout)
            lin(fw, f"{name}.mlp.0", dout, TE)
            conv(fw, f"{name}.res_conv.conv", dout, din, 1)

        def tblock(name, dim):
            ln(fw, f"{name}.norm1", dim)
            for proj in ("to_q", "to_k", "to_v"):
                lin(fw, f"{name}.attn1.{proj}", 8 * 2, dim, bias=False)
            lin(fw, f"{name}.attn1.to_out.0", dim, 8 * 2)
            ln(fw, f"{name}.norm3", dim)
            lin(fw, f"{name}.ff.net.0.proj", dim * 4, dim)
            lin(fw, f"{name}.ff.net.1", dim, dim * 4)

        d0 = f"{est}.down_blocks.0"
        resnet(f"{d0}.resnet", IN, CH)
        tblock(f"{d0}.transformer_blocks.0", CH)
        conv(fw, f"{d0}.downsample.conv.conv", CH, CH, 3)  # isLast: causal
        m0 = f"{est}.mid_blocks.0"
        resnet(f"{m0}.resnet", CH, CH)
        tblock(f"{m0}.transformer_blocks.0", CH)
        u0 = f"{est}.up_blocks.0"
        resnet(f"{u0}.resnet", CH * 2, CH)
        tblock(f"{u0}.transformer_blocks.0", CH)
        conv(fw, f"{u0}.upsample.conv.conv", CH, CH, 3)  # isLast: causal
        conv(fw, f"{est}.final_block.block.0.conv.conv", CH, CH, 3)
        ln(fw, f"{est}.final_block.block.1", CH)
        conv(fw, f"{est}.final_proj.conv", M, CH, 1)
        fw["decoder.rand_noise"] = modulo_values((1, M, 512), 21, 1.0)
    save_file(fw, str(path / "flow.safetensors"))

    # ---- hift (raw torch names, no .conv nesting) ----
    hw = {}
    BASE = 8
    conv(hw, "f0_predictor.condnet.0", BASE, M, 3)
    for i in range(1, 5):
        conv(hw, f"f0_predictor.condnet.{i}", BASE, BASE, 3)
    lin(hw, "f0_predictor.classifier", 1, BASE)
    lin(hw, "m_source.l_linear", 1, 3)  # harmonics+1 = 3
    conv(hw, "conv_pre", BASE, M, 7)
    # ups: torch ConvTranspose [I, O, K]
    c[0] += 1
    hw["ups.0.weight"] = modulo_values((BASE, BASE // 2, 4), 15, 0.2)
    hw["ups.0.bias"] = modulo_values((BASE // 2,), 3, 0.01)
    hw["ups.1.weight"] = modulo_values((BASE // 2, BASE // 4, 4), 17, 0.2)
    hw["ups.1.bias"] = modulo_values((BASE // 4,), 3, 0.01)
    NF2 = 8 + 2  # n_fft + 2
    conv(hw, "source_downs.0", BASE // 2, NF2, 4)
    conv(hw, "source_downs.1", BASE // 4, NF2, 1)

    def hifi_res(name, ch, k, dils):
        for i in range(len(dils)):
            hw[f"{name}.activations1.{i}.alpha"] = np.ones((ch,), np.float32)
            hw[f"{name}.activations2.{i}.alpha"] = np.ones((ch,), np.float32)
            conv(hw, f"{name}.convs1.{i}", ch, ch, k)
            conv(hw, f"{name}.convs2.{i}", ch, ch, k)

    hifi_res("source_resblocks.0", BASE // 2, 3, (1, 3))
    hifi_res("source_resblocks.1", BASE // 4, 3, (1, 3))
    hifi_res("resblocks.0", BASE // 2, 3, (1, 3))
    hifi_res("resblocks.1", BASE // 4, 3, (1, 3))
    conv(hw, "conv_post", NF2, BASE // 4, 7)
    save_file(hw, str(path / "hift.safetensors"))

    # ---- campplus (tiny: 2 dense blocks of (2,3,1)/(2,3,2)) ----
    cw = {}
    MC = 4  # m_channels; feat_dim 8 -> FCM out = MC * 1 = 4
    GROWTH, BN_CH, INIT = 4, 8, 8

    def bn(name, ch):
        cw[f"{name}.weight"] = np.ones((ch,), np.float32)
        cw[f"{name}.bias"] = np.zeros((ch,), np.float32)
        cw[f"{name}.running_mean"] = np.zeros((ch,), np.float32)
        cw[f"{name}.running_var"] = np.ones((ch,), np.float32)

    def conv2d(name, o, i, bias=False):
        c[0] += 1
        cw[f"{name}.weight"] = modulo_values((o, i, 3, 3), 9 + c[0] % 5, 0.2)

    conv2d("head.conv1", MC, 1)
    bn("head.bn1", MC)
    for layer in ("layer1", "layer2"):
        for i, stride in ((0, 2), (1, 1)):
            base = f"head.{layer}.{i}"
            conv2d(f"{base}.conv1", MC, MC)
            bn(f"{base}.bn1", MC)
            conv2d(f"{base}.conv2", MC, MC)
            bn(f"{base}.bn2", MC)
            if stride != 1:
                c[0] += 1
                cw[f"{base}.shortcut.0.weight"] = modulo_values(
                    (MC, MC, 1, 1), 9 + c[0] % 5, 0.2)
                bn(f"{base}.shortcut.1", MC)
    conv2d("head.conv2", MC, MC)
    bn("head.bn2", MC)
    conv(cw, "tdnn.linear", INIT, MC, 5, bias=False)
    bn("tdnn.nonlinear.0", INIT)
    ch = INIT
    for bi, (n_layers, kernel, dil) in enumerate(((2, 3, 1), (2, 3, 2))):
        for li in range(n_layers):
            base = f"blocks.{bi}.layers.{li}"
            lin_ch = ch + li * GROWTH
            bn(f"{base}.nonlinear1.0", lin_ch)
            conv(cw, f"{base}.linear1", BN_CH, lin_ch, 1, bias=False)
            bn(f"{base}.nonlinear2.0", BN_CH)
            cl = f"{base}.cam_layer"
            conv(cw, f"{cl}.linear_local", GROWTH, BN_CH, kernel,
                 bias=False)
            conv(cw, f"{cl}.linear1", BN_CH // 2, BN_CH, 1)
            conv(cw, f"{cl}.linear2", GROWTH, BN_CH // 2, 1)
            bn(f"{cl}.bn1", BN_CH // 2)
            bn(f"{cl}.bn2", GROWTH)
        block_out = ch + n_layers * GROWTH
        bn(f"transits.{bi}.nonlinear.0", block_out)
        conv(cw, f"transits.{bi}.linear", block_out // 2, block_out, 1)
        ch = block_out // 2
    bn("out_nonlinear.0", ch)
    conv(cw, "dense.linear", SPK, ch * 2, 1, bias=False)
    bn("dense.nonlinear.0", SPK)
    save_file(cw, str(path / "campplus.safetensors"))

    (path / "config.json").write_text(json.dumps({
        "model_type": "s3gen", "estimator": estimator,
        "n_mels": M, "vocab_size": V, "spk_dim": SPK,
    }))
    return path


def make_chatterbox_fixture(path: Path) -> Path:
    """Tiny Chatterbox (Regular/Llama variant): VE + T3 + the tiny unet
    S3Gen stack in one model.safetensors (s3gen.flow.* keys exercising the
    prefix routing), plus conds.safetensors default voice + tokenizer."""
    import json

    from safetensors.numpy import load_file, save_file
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    path = Path(path)
    s3dir = path / "_s3gen_src"
    make_s3gen_fixture(s3dir, "unet")

    w = {}
    for k, v in load_file(str(s3dir / "flow.safetensors")).items():
        w[f"s3gen.flow.{k}"] = v
    for k, v in load_file(str(s3dir / "hift.safetensors")).items():
        w[f"s3gen.mel2wav.{k}"] = v
    for k, v in load_file(str(s3dir / "campplus.safetensors")).items():
        w[f"s3gen.speaker_encoder.{k}"] = v

    D, HEADS, KV, HD, FFN = 16, 2, 2, 8, 32
    TVOC, SVOC, SPKR = 40, 20, 8
    c = [0]

    def lin(name, o, i, bias=True):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.2)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    # voice encoder (MLX lstm.layers.N naming, exercising _sanitize_ve)
    for i, inp in enumerate((40, 8, 8)):
        c[0] += 1
        w[f"ve.lstm.layers.{i}.Wx"] = modulo_values((32, inp), 13 + i, 0.2)
        w[f"ve.lstm.layers.{i}.Wh"] = modulo_values((32, 8), 17 + i, 0.2)
        w[f"ve.lstm.layers.{i}.bias"] = modulo_values((32,), 5, 0.01)
    lin("ve.proj", SPKR, 8)

    # T3: llama backbone (tfmr.model.* exercising the strip)
    w["t3.tfmr.model.embed_tokens.weight"] = modulo_values((50, D), 19, 0.3)
    w["t3.tfmr.model.norm.weight"] = np.ones((D,), np.float32)
    w["t3.tfmr.lm_head.weight"] = modulo_values((50, D), 21, 0.3)  # dropped
    base = "t3.tfmr.model.layers.0"
    w[f"{base}.input_layernorm.weight"] = np.ones((D,), np.float32)
    w[f"{base}.post_attention_layernorm.weight"] = np.ones((D,), np.float32)
    lin(f"{base}.self_attn.q_proj", HEADS * HD, D, bias=False)
    lin(f"{base}.self_attn.k_proj", KV * HD, D, bias=False)
    lin(f"{base}.self_attn.v_proj", KV * HD, D, bias=False)
    lin(f"{base}.self_attn.o_proj", D, HEADS * HD, bias=False)
    lin(f"{base}.mlp.gate_proj", FFN, D, bias=False)
    lin(f"{base}.mlp.up_proj", FFN, D, bias=False)
    lin(f"{base}.mlp.down_proj", D, FFN, bias=False)
    w["t3.text_emb.weight"] = modulo_values((TVOC, D), 23, 0.3)
    w["t3.speech_emb.weight"] = modulo_values((SVOC, D), 25, 0.3)
    w["t3.text_pos_emb.emb.weight"] = modulo_values((34, D), 27, 0.1)
    w["t3.speech_pos_emb.emb.weight"] = modulo_values((36, D), 29, 0.1)
    lin("t3.text_head", TVOC, D, bias=False)
    lin("t3.speech_head", SVOC, D, bias=False)
    lin("t3.cond_enc.spkr_enc", D, SPKR)
    lin("t3.cond_enc.emotion_adv_fc", D, 1, bias=False)
    w["t3.cond_enc.perceiver.pre_attention_query"] = modulo_values(
        (1, 4, D), 31, 0.3)
    pa = "t3.cond_enc.perceiver.attn"
    w[f"{pa}.norm.weight"] = np.ones((D,), np.float32)
    w[f"{pa}.norm.bias"] = np.zeros((D,), np.float32)
    for proj in ("to_q", "to_k", "to_v", "proj_out"):
        lin(f"{pa}.{proj}", D, D)
    save_file(w, str(path / "model.safetensors"))

    save_file({
        "t3.speaker_emb": modulo_values((1, SPKR), 33, 0.5),
        "t3.cond_prompt_speech_tokens": np.asarray([[1, 2, 3, 4]],
                                                   np.int32),
        "t3.emotion_adv": np.full((1, 1, 1), 0.5, np.float32),
        "gen.embedding": modulo_values((1, 6), 35, 0.5),
        "gen.prompt_token": np.asarray([[1, 2]], np.int32),
        "gen.prompt_feat": modulo_values((1, 4, 4), 37, 0.3),
    }, str(path / "conds.safetensors"))

    cfg = {
        "model_type": "chatterbox",
        "t3_config": {
            "text_tokens_dict_size": TVOC, "start_text_token": 38,
            "stop_text_token": 0, "max_text_tokens": 32,
            "speech_tokens_dict_size": SVOC, "start_speech_token": 16,
            "stop_speech_token": 17, "max_speech_tokens": 32,
            "input_pos_emb": "learned", "speech_cond_prompt_len": 6,
            "speaker_embed_size": SPKR, "use_perceiver_resampler": True,
            "emotion_adv": True,
        },
        "llama_config": {
            "vocab_size": 50, "hidden_size": D, "num_hidden_layers": 1,
            "intermediate_size": FFN, "num_attention_heads": HEADS,
            "num_key_value_heads": KV, "head_dim": HD,
            "rope_theta": 10000.0, "rope_scaling": None,
        },
        "enc_cond_len": 16000, "dec_cond_len": 24000,
        "decoder_in_channels": 16, "s3gen_n_mels": 4,
        "s3gen_conformer": {
            "input_size": 8, "output_size": 8, "attention_heads": 2,
            "linear_units": 16, "num_blocks": 1, "num_up_blocks": 1,
        },
        "s3gen_hift": {
            "in_channels": 4, "base_channels": 8, "nb_harmonics": 2,
            "sampling_rate": 16000, "upsample_rates": [2, 2],
            "upsample_kernel_sizes": [4, 4], "n_fft": 8, "hop_len": 2,
            "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3]],
            "source_resblock_kernel_sizes": [3, 3],
            "source_resblock_dilation_sizes": [[1, 3], [1, 3]],
        },
        "s3gen_campplus": {"num_mels": 8,
                           "blocks": [[2, 3, 1], [2, 3, 2]]},
    }
    (path / "config.json").write_text(json.dumps(cfg))

    vocab_map = {f"w{i}": i for i in range(36) if i not in (30, 31)}
    vocab_map.update({"hello": 30, "world": 31})  # collision-free ids
    tok = Tokenizer(WordLevel(vocab_map, unk_token="w0"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(path / "tokenizer.json"))
    return path


def make_echo_tts_fixture(path: Path) -> Path:
    """Tiny EchoTTS: DiT with joint attention + low-rank adaLN, byte text
    encoder, patched speaker encoder, PCA state, fish_s1 codec in codec/."""
    import json

    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    make_fish_s1_fixture(path / "codec")

    L, D, HEADS = 6, 16, 2
    TD, SD = 8, 8  # text/speaker model sizes
    RANK = 4
    c = [0]
    w = {}

    def lin(name, o, i, bias=False):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.15)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    def rms(name, shape):
        w[f"{name}.weight"] = np.ones(shape, np.float32)

    def enc_block(name, dim, inter):
        for proj in ("wq", "wk", "wv", "wo", "gate"):
            lin(f"{name}.attention.{proj}", dim, dim)
        rms(f"{name}.attention.q_norm", (HEADS, dim // HEADS))
        rms(f"{name}.attention.k_norm", (HEADS, dim // HEADS))
        rms(f"{name}.attention_norm", (dim,))
        rms(f"{name}.mlp_norm", (dim,))
        lin(f"{name}.mlp.w1", inter, dim)
        lin(f"{name}.mlp.w3", inter, dim)
        lin(f"{name}.mlp.w2", dim, inter)

    w["text_encoder.text_embedding.weight"] = modulo_values((256, TD), 13,
                                                            0.3)
    enc_block("text_encoder.blocks.0", TD, 16)
    lin("speaker_encoder.in_proj", SD, L * 2, bias=True)
    enc_block("speaker_encoder.blocks.0", SD, 16)
    lin("latent_encoder.in_proj", SD, L * 2, bias=True)
    enc_block("latent_encoder.blocks.0", SD, 16)
    rms("latent_norm", (SD,))
    rms("text_norm", (TD,))
    rms("speaker_norm", (SD,))
    lin("cond_module.0", D, 16)
    lin("cond_module.2", D, D)
    lin("cond_module.4", 3 * D, D)
    lin("in_proj", D, L, bias=True)
    b0 = "blocks.0"
    for proj in ("wq", "wk", "wv", "wo", "gate"):
        lin(f"{b0}.attention.{proj}", D, D)
    for proj in ("wk_text", "wv_text"):
        lin(f"{b0}.attention.{proj}", D, TD)
    for proj in ("wk_speaker", "wv_speaker", "wk_latent", "wv_latent"):
        lin(f"{b0}.attention.{proj}", D, SD)
    rms(f"{b0}.attention.q_norm", (HEADS, D // HEADS))
    rms(f"{b0}.attention.k_norm", (HEADS, D // HEADS))
    for ada in ("attention_adaln", "mlp_adaln"):
        for part in ("shift", "scale", "gate"):
            lin(f"{b0}.{ada}.{part}_down", RANK, D)
            lin(f"{b0}.{ada}.{part}_up", D, RANK, bias=True)
    lin(f"{b0}.mlp.w1", 32, D)
    lin(f"{b0}.mlp.w3", 32, D)
    lin(f"{b0}.mlp.w2", D, 32)
    rms("out_norm", (D,))
    lin("out_proj", L, D, bias=True)
    save_file(w, str(path / "model.safetensors"))

    save_file({
        "pca_components": modulo_values((L, 8), 17, 0.4),
        "pca_mean": modulo_values((8,), 19, 0.1),
        "latent_scale": np.asarray(0.5, np.float32),
    }, str(path / "pca_state.safetensors"))

    (path / "config.json").write_text(json.dumps({
        "model_type": "echo_tts",
        "sample_rate": 16000, "audio_downsample_factor": 8,
        "max_text_length": 64, "max_speaker_latent_length": 64,
        "normalize_text": True,
        "dit": {
            "latent_size": L, "model_size": D, "num_layers": 1,
            "num_heads": HEADS, "intermediate_size": 32,
            "norm_eps": 1e-5, "text_vocab_size": 256,
            "text_model_size": TD, "text_num_layers": 1,
            "text_num_heads": HEADS, "text_intermediate_size": 16,
            "speaker_patch_size": 2, "speaker_model_size": SD,
            "speaker_num_layers": 1, "speaker_num_heads": HEADS,
            "speaker_intermediate_size": 16,
            "timestep_embed_size": 16, "adaln_rank": RANK,
        },
        "sampler": {"num_steps": 2, "sequence_length": 8,
                    "cfg_scale_text": 3.0, "cfg_scale_speaker": 8.0,
                    "cfg_min_t": 0.5, "cfg_max_t": 1.0},
    }))
    return path


def make_lfm_audio_fixture(path: Path) -> Path:
    """Tiny LFM2.5-Audio: conformer encoder + adapter + hybrid LFM2
    backbone + depthformer audio head, in raw checkpoint layout
    (conformer.* / depthformer.* keys exercising sanitize), plus the
    audio_detokenizer subdirectory."""
    import json

    from safetensors.numpy import save_file
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    H, HEADS, KV, HD = 16, 2, 1, 8      # lfm backbone
    CD, CH = 8, 4                       # conformer d_model / subsample ch
    K, AV = 2, 12                       # codebooks, audio vocab (EOS=8)
    DD, DHEADS, DKV = 8, 2, 1           # depthformer
    MELS = 8
    c = [0]
    w = {}

    def lin(name, o, i, bias=False):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.15)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    def ln(name, d):
        w[f"{name}.weight"] = np.ones((d,), np.float32)
        w[f"{name}.bias"] = np.zeros((d,), np.float32)

    def rms(name, d):
        w[f"{name}.weight"] = np.ones((d,), np.float32)

    # conformer (raw "conformer." keys)
    pe = "conformer.pre_encode"
    c[0] += 1
    w[f"{pe}.conv.0.weight"] = modulo_values((CH, 1, 3, 3), 9, 0.2)
    w[f"{pe}.conv.0.bias"] = modulo_values((CH,), 3, 0.01)
    w[f"{pe}.conv.2.weight"] = modulo_values((CH, 1, 3, 3), 10, 0.2)
    w[f"{pe}.conv.2.bias"] = modulo_values((CH,), 3, 0.01)
    w[f"{pe}.conv.3.weight"] = modulo_values((CH, CH, 1, 1), 11, 0.2)
    w[f"{pe}.conv.3.bias"] = modulo_values((CH,), 3, 0.01)
    w[f"{pe}.conv.5.weight"] = modulo_values((CH, 1, 3, 3), 12, 0.2)
    w[f"{pe}.conv.5.bias"] = modulo_values((CH,), 3, 0.01)
    w[f"{pe}.conv.6.weight"] = modulo_values((CH, CH, 1, 1), 13, 0.2)
    w[f"{pe}.conv.6.bias"] = modulo_values((CH,), 3, 0.01)
    lin(f"{pe}.out", CD, CH * (MELS // 8), bias=True)
    l0 = "conformer.layers.0"
    for nm in ("norm_feed_forward1", "norm_feed_forward2", "norm_self_att",
               "norm_conv", "norm_out"):
        ln(f"{l0}.{nm}", CD)
    for ff in ("feed_forward1", "feed_forward2"):
        lin(f"{l0}.{ff}.linear1", CD * 4, CD, bias=True)
        lin(f"{l0}.{ff}.linear2", CD, CD * 4, bias=True)
    sa = f"{l0}.self_attn"
    for proj in ("linear_q", "linear_k", "linear_v", "linear_out"):
        lin(f"{sa}.{proj}", CD, CD, bias=True)
    lin(f"{sa}.linear_pos", CD, CD)
    w[f"{sa}.pos_bias_u"] = modulo_values((2, CD // 2), 7, 0.1)
    w[f"{sa}.pos_bias_v"] = modulo_values((2, CD // 2), 9, 0.1)
    cv = f"{l0}.conv"
    lin(f"{cv}.pointwise_conv1", 2 * CD, CD, bias=True)
    c[0] += 1
    w[f"{cv}.depthwise_conv.weight"] = modulo_values((CD, 1, 3), 15, 0.2)
    w[f"{cv}.depthwise_conv.bias"] = modulo_values((CD,), 3, 0.01)
    for nm in ("weight", "bias"):
        pass
    w[f"{cv}.batch_norm.weight"] = np.ones((CD,), np.float32)
    w[f"{cv}.batch_norm.bias"] = np.zeros((CD,), np.float32)
    w[f"{cv}.batch_norm.running_mean"] = np.zeros((CD,), np.float32)
    w[f"{cv}.batch_norm.running_var"] = np.ones((CD,), np.float32)
    lin(f"{cv}.pointwise_conv2", CD, CD, bias=True)

    # adapter (model.N indices: norm at 0, linears at 1,2)
    ln("audio_adapter.model.0", CD)
    lin("audio_adapter.model.1", 12, CD, bias=True)
    lin("audio_adapter.model.2", H, 12, bias=True)

    # lfm backbone: layer 0 conv, layer 1 attention
    w["lfm.embed_tokens.weight"] = modulo_values((200, H), 17, 0.3)
    rms("lfm.embedding_norm", H)
    b0 = "lfm.layers.0"
    rms(f"{b0}.operator_norm", H)
    rms(f"{b0}.ffn_norm", H)
    lin(f"{b0}.conv.in_proj", 3 * H, H)
    c[0] += 1
    w[f"{b0}.conv.conv.weight"] = modulo_values((H, 1, 3), 19, 0.2)
    lin(f"{b0}.conv.out_proj", H, H)
    lin(f"{b0}.feed_forward.linear1", 32, H)
    lin(f"{b0}.feed_forward.linear2", H, 32)
    lin(f"{b0}.feed_forward.linear3", 32, H)
    b1 = "lfm.layers.1"
    rms(f"{b1}.operator_norm", H)
    rms(f"{b1}.ffn_norm", H)
    lin(f"{b1}.self_attn.q_proj", HEADS * HD, H)
    lin(f"{b1}.self_attn.k_proj", KV * HD, H)
    lin(f"{b1}.self_attn.v_proj", KV * HD, H)
    lin(f"{b1}.self_attn.out_proj", H, HEADS * HD)
    rms(f"{b1}.self_attn.q_layernorm", HD)
    rms(f"{b1}.self_attn.k_layernorm", HD)
    lin(f"{b1}.feed_forward.linear1", 32, H)
    lin(f"{b1}.feed_forward.linear2", H, 32)
    lin(f"{b1}.feed_forward.linear3", 32, H)

    # audio embedding + depth
    w["audio_embedding.embedding.weight"] = modulo_values((AV * K, H), 21,
                                                          0.3)
    rms("audio_embedding.embedding_norm", H)
    lin("audio_embedding.to_logits", AV * K, H)
    for i in range(K):
        w[f"depth_embeddings.{i}.embedding.weight"] = modulo_values(
            (AV, DD), 23 + i, 0.3)
        rms(f"depth_embeddings.{i}.embedding_norm", DD)
        lin(f"depth_embeddings.{i}.to_logits", AV, DD)
    lin("depth_linear", K * DD, H, bias=True)
    # depthformer (raw fused-qkv layout exercising the split)
    for i in range(1):
        base = f"depthformer.layers.{i}"
        c[0] += 1
        w[f"{base}.operator.qkv_proj.weight"] = modulo_values(
            (DHEADS * 4 + 2 * DKV * 4, DD), 25, 0.2)  # q=8, k=v=4
        lin(f"{base}.operator.out_proj", DD, DHEADS * 4)
        rms(f"{base}.operator.bounded_attention.q_layernorm", 4)
        rms(f"{base}.operator.bounded_attention.k_layernorm", 4)
        rms(f"{base}.operator_norm", DD)
        rms(f"{base}.ffn_norm", DD)
        lin(f"{base}.feed_forward.w1", 16, DD)
        lin(f"{base}.feed_forward.w2", DD, 16)
        lin(f"{base}.feed_forward.w3", 16, DD)
    save_file(w, str(path / "model.safetensors"))

    # detokenizer subdir
    dw = {}
    DH = 8
    dw["emb.emb.weight"] = modulo_values((K * (AV - 1), DH), 27, 0.3)

    def dlin(name, o, i, bias=False):
        c[0] += 1
        dw[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.15)
        if bias:
            dw[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    d0 = "lfm.layers.0"
    dw[f"{d0}.operator_norm.weight"] = np.ones((DH,), np.float32)
    dw[f"{d0}.ffn_norm.weight"] = np.ones((DH,), np.float32)
    dlin(f"{d0}.conv.in_proj", 3 * DH, DH)
    c[0] += 1
    dw[f"{d0}.conv.conv.weight"] = modulo_values((DH, 1, 3), 29, 0.2)
    dlin(f"{d0}.conv.out_proj", DH, DH)
    dlin(f"{d0}.feed_forward.w1", 16, DH)
    dlin(f"{d0}.feed_forward.w2", DH, 16)
    dlin(f"{d0}.feed_forward.w3", 16, DH)
    d1 = "lfm.layers.1"
    dw[f"{d1}.operator_norm.weight"] = np.ones((DH,), np.float32)
    dw[f"{d1}.ffn_norm.weight"] = np.ones((DH,), np.float32)
    dlin(f"{d1}.self_attn.q_proj", DH, DH)
    dlin(f"{d1}.self_attn.k_proj", 4, DH)
    dlin(f"{d1}.self_attn.v_proj", 4, DH)
    dlin(f"{d1}.self_attn.out_proj", DH, DH)
    dw[f"{d1}.self_attn.q_layernorm.weight"] = np.ones((4,), np.float32)
    dw[f"{d1}.self_attn.k_layernorm.weight"] = np.ones((4,), np.float32)
    dlin(f"{d1}.feed_forward.w1", 16, DH)
    dlin(f"{d1}.feed_forward.w2", DH, 16)
    dlin(f"{d1}.feed_forward.w3", 16, DH)
    dw["lfm.embedding_norm.weight"] = np.ones((DH,), np.float32)
    dlin("lin", 10, DH, bias=True)  # n_fft 8 -> 5 mag + 5 phase
    detok_dir = path / "audio_detokenizer"
    detok_dir.mkdir(exist_ok=True)
    save_file(dw, str(detok_dir / "model.safetensors"))
    (detok_dir / "config.json").write_text(json.dumps({
        "hidden_size": DH, "num_attention_heads": 2,
        "num_key_value_heads": 1, "layer_types": ["conv",
                                                  "sliding_attention"],
        "sliding_window": 4, "norm_eps": 1e-5, "rope_theta": 10000.0,
        "output_size": 10, "num_codebooks": K, "vocab_size": AV - 1,
        "n_fft": 8, "hop_length": 2, "upsample_factor": 2,
    }))

    (path / "config.json").write_text(json.dumps({
        "model_type": "lfm_audio", "sample_rate": 16000, "codebooks": K,
        "audio_vocab_size": AV, "interleaved_n_text": 2,
        "interleaved_n_audio": 3,
        "preprocessor": {"sample_rate": 16000, "features": MELS,
                         "n_fft": 64, "window_size": 0.004,
                         "window_stride": 0.002},
        "encoder": {"feat_in": MELS, "n_layers": 1, "d_model": CD,
                    "subsampling_conv_channels": CH, "n_heads": 2,
                    "conv_kernel_size": 3},
        "lfm": {"vocab_size": 200, "hidden_size": H,
                "num_hidden_layers": 2, "num_attention_heads": HEADS,
                "num_key_value_heads": KV, "conv_L_cache": 3,
                "full_attn_idxs": [1], "rope_theta": 10000.0},
        "depthformer": {"layers": 1, "dim": DD, "num_heads": DHEADS,
                        "num_kv_heads": DKV},
    }))

    vocab_map = {f"w{i}": i for i in range(140)
                 if i not in (50, 51, 52, 53)}
    vocab_map.update({"hello": 50, "system": 51, "user": 52,
                      "assistant": 53})  # collision-free ids
    specials = ["<|im_start|>", "<|im_end|>"]
    for j, s in enumerate(specials):
        vocab_map[s] = 140 + j
    tok = Tokenizer(WordLevel(vocab_map, unk_token="w0"))
    tok.pre_tokenizer = Whitespace()
    tok.add_special_tokens(specials)
    tok.save(str(path / "tokenizer.json"))
    return path


def make_sam_audio_fixture(path: Path) -> Path:
    """Tiny SAM-Audio: DACVAE codec (audio_codec.*), HF-layout T5 text
    encoder (text_encoder.*), adaLN DiT with cross-attention and anchors."""
    import json

    from safetensors.numpy import load_file, save_file
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    path = Path(path)
    codec_dir = path / "_codec_src"
    make_dacvae_fixture(codec_dir)
    codec_cfg = json.loads((codec_dir / "config.json").read_text())

    w = {}
    for k, v in load_file(str(codec_dir / "model.safetensors")).items():
        w[f"audio_codec.{k}"] = v

    D, HEADS, HD, C = 8, 2, 4, 4  # DiT dim/heads/head_dim, codebook dim
    TD = 8                         # t5 d_model
    FFN = 24                       # per ffn_hidden() with multiple_of=4
    c = [0]

    def lin(name, o, i, bias=False):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.15)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    def rms(name, d):
        w[f"{name}.weight"] = np.ones((d,), np.float32)

    # text encoder (HF t5-base layout, non-gated relu FF)
    te = "text_encoder"
    w[f"{te}.shared.weight"] = modulo_values((64, TD), 13, 0.3)
    b0 = f"{te}.encoder.block.0.layer"
    for proj in ("q", "k", "v", "o"):
        lin(f"{b0}.0.SelfAttention.{proj}", TD, TD)
    w[f"{te}.encoder.block.0.layer.0.SelfAttention."
      f"relative_attention_bias.weight"] = modulo_values((32, 2), 15, 0.1)
    rms(f"{b0}.0.layer_norm", TD)
    lin(f"{b0}.1.DenseReluDense.wi", 16, TD)
    lin(f"{b0}.1.DenseReluDense.wo", TD, 16)
    rms(f"{b0}.1.layer_norm", TD)
    rms(f"{te}.encoder.final_layer_norm", TD)

    # top-level projections
    lin("proj", D, 6 * C, bias=True)
    w["embed_anchors.embed.weight"] = modulo_values((5, 4), 17, 0.3)
    w["embed_anchors.gate"] = np.zeros((1,), np.float32)
    lin("embed_anchors.proj", D, 4)
    lin("memory_proj", D, TD, bias=True)

    # DiT
    tr = "transformer"
    xb = f"{tr}.x_embedder.block"
    for blk in ("block1", "block2"):
        w[f"{xb}.{blk}.groupnorm.weight"] = np.ones((D,), np.float32)
        w[f"{xb}.{blk}.groupnorm.bias"] = np.zeros((D,), np.float32)
        # MLX layout [O, K, I] exercising the transpose heuristic
        c[0] += 1
        w[f"{xb}.{blk}.project.weight"] = modulo_values((D, 3, D),
                                                        19 + c[0] % 5, 0.2)
        w[f"{xb}.{blk}.project.bias"] = modulo_values((D,), 3, 0.01)
    l0 = f"{tr}.layers.0"
    for attn in ("attention", "cross_attention"):
        for proj in ("wq", "wk", "wv", "wo"):
            lin(f"{l0}.{attn}.{proj}", D, D)
        rms(f"{l0}.{attn}.q_norm", HD)
        rms(f"{l0}.{attn}.k_norm", HD)
    rms(f"{l0}.attention_norm", D)
    rms(f"{l0}.ffn_norm", D)
    lin(f"{l0}.feed_forward.w1", FFN, D)
    lin(f"{l0}.feed_forward.w3", FFN, D)
    lin(f"{l0}.feed_forward.w2", D, FFN)
    w[f"{l0}.scale_shift_table"] = modulo_values((6, D), 21, 0.1)
    rms(f"{tr}.norm", D)
    lin(f"{tr}.output", 2 * C, D)
    for emb, in_d in (("t_embedder", 8), ("y_embedder", D)):
        lin(f"{tr}.{emb}.projection.w1", D, in_d)
        lin(f"{tr}.{emb}.projection.w3", D, in_d)
        lin(f"{tr}.{emb}.projection.w2", D, D)
    lin(f"{tr}.t_block", 6 * D, D, bias=True)
    w[f"{tr}.final_layer_scale_shift_table"] = modulo_values((2, D), 23,
                                                             0.1)
    path.mkdir(parents=True, exist_ok=True)
    save_file(w, str(path / "model.safetensors"))

    (path / "config.json").write_text(json.dumps({
        "model_type": "sam_audio",
        "in_channels": 6 * C, "num_anchors": 4,
        "anchor_embedding_dim": 4,
        "transformer": {
            "dim": D, "n_heads": HEADS, "n_layers": 1,
            "qk_norm": True, "fc_bias": False, "ffn_exp": 4,
            "multiple_of": 4, "use_rope": True, "max_positions": 512,
            "frequency_embedding_dim": 8, "context_dim": D,
            "out_channels": 2 * C,
        },
        "text_encoder": {
            "vocab_size": 64, "d_model": TD, "d_kv": HD,
            "num_heads": HEADS, "num_layers": 1, "d_ff": 16,
        },
        "audio_codec": codec_cfg,
    }))

    vocab_map = {f"w{i}": i for i in range(60) if i not in (40, 41, 42)}
    vocab_map.update({"speech": 40, "music": 41, "noise": 42})  # no id dupes
    tok = Tokenizer(WordLevel(vocab_map, unk_token="w0"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(path / "tokenizer.json"))
    return path


def make_moss_tts_full_fixture(path: Path, local: bool = False) -> Path:
    """Tiny MOSS-TTS full variant: Qwen3 backbone, 2 codebooks, bundled
    audio_tokenizer; ``local=True`` adds the local-transformer stack."""
    from safetensors.numpy import save_file
    from tokenizers import AddedToken, Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    d, heads, kv, hd, ffn = 16, 2, 1, 8, 32
    tvocab, n_vq, avocab = 64, 2, 16
    w = {}
    c = [0]

    def lin(name, o, i):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.2)

    def qwen3(pre, dim, inter, layers):
        for i in range(layers):
            b = f"{pre}.layers.{i}"
            lin(f"{b}.self_attn.q_proj", heads * hd, dim)
            lin(f"{b}.self_attn.k_proj", kv * hd, dim)
            lin(f"{b}.self_attn.v_proj", kv * hd, dim)
            lin(f"{b}.self_attn.o_proj", dim, heads * hd)
            w[f"{b}.self_attn.q_norm.weight"] = np.ones(hd, np.float32)
            w[f"{b}.self_attn.k_norm.weight"] = np.ones(hd, np.float32)
            w[f"{b}.input_layernorm.weight"] = np.ones(dim, np.float32)
            w[f"{b}.post_attention_layernorm.weight"] = np.ones(
                dim, np.float32)
            lin(f"{b}.mlp.gate_proj", inter, dim)
            lin(f"{b}.mlp.up_proj", inter, dim)
            lin(f"{b}.mlp.down_proj", dim, inter)
        w[f"{pre}.norm.weight"] = np.ones(dim, np.float32)

    if local:
        dl, ffl, add_ffn = 12, 24, 24
        w["model.embedding_list.0.weight"] = modulo_values((tvocab, d), 7,
                                                           0.3)
        for ch in range(n_vq):
            w[f"model.embedding_list.{ch + 1}.weight"] = modulo_values(
                (avocab + 1, d), 13 + ch, 0.3)
        w["model.language_model.embed_tokens.weight"] = modulo_values(
            (tvocab, d), 7, 0.3)
        qwen3("model.language_model", d, ffn, 2)
        qwen3("local_transformer", dl, ffl, 1)
        lin("speech_embedding_to_local_mlp.gate_proj", add_ffn, d)
        lin("speech_embedding_to_local_mlp.up_proj", add_ffn, d)
        lin("speech_embedding_to_local_mlp.down_proj", dl, add_ffn)
        for ch in range(n_vq + 1):
            p = f"local_to_speech_embedding_mlps.{ch}"
            lin(f"{p}.gate_proj", add_ffn, dl)
            lin(f"{p}.up_proj", add_ffn, dl)
            lin(f"{p}.down_proj", d, add_ffn)
            w[f"layer_norm_before_lm_heads.{ch}.weight"] = np.ones(
                d, np.float32)
    else:
        w["model.language_model.embed_tokens.weight"] = modulo_values(
            (tvocab, d), 7, 0.3)
        qwen3("model.language_model", d, ffn, 2)
        for ch in range(n_vq):
            w[f"model.emb_ext.{ch}.weight"] = modulo_values(
                (avocab + 1, d), 13 + ch, 0.3)
    w["lm_heads.0.weight"] = modulo_values((tvocab, d), 3, 0.15)
    for ch in range(n_vq):
        w[f"lm_heads.{ch + 1}.weight"] = modulo_values((avocab + 1, d),
                                                       19 + ch, 0.15)

    specials = ["<pad>", "<|im_start|>", "<|im_end|>", "<|audio_start|>",
                "<|audio_end|>", "<|user_slot|>", "<|gen_slot|>",
                "<|delay_slot|>"]
    ids = {s: 56 + k for k, s in enumerate(specials)}
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    cfg = {
        "model_type": "moss_tts_local" if local else "moss_tts_delay",
        "language_config": {
            "model_type": "qwen3", "vocab_size": tvocab, "hidden_size": d,
            "num_hidden_layers": 2, "intermediate_size": ffn,
            "num_attention_heads": heads, "num_key_value_heads": kv,
            "head_dim": hd, "rms_norm_eps": 1e-6, "rope_theta": 10000.0,
            "max_position_embeddings": 2048, "tie_word_embeddings": False,
        },
        "n_vq": n_vq, "audio_vocab_size": avocab, "audio_pad_code": avocab,
        "pad_token_id": ids["<pad>"],
        "im_start_token_id": ids["<|im_start|>"],
        "im_end_token_id": ids["<|im_end|>"],
        "audio_start_token_id": ids["<|audio_start|>"],
        "audio_end_token_id": ids["<|audio_end|>"],
        "audio_user_slot_token_id": ids["<|user_slot|>"],
        "audio_assistant_gen_slot_token_id": ids["<|gen_slot|>"],
        "audio_assistant_delay_slot_token_id": ids["<|delay_slot|>"],
        "sampling_rate": 16000,
    }
    if local:
        cfg.update({"additional_mlp_ffn_hidden_size": 24,
                    "local_ffn_hidden_size": 24, "local_hidden_size": 12,
                    "local_num_layers": 1})
    (path / "config.json").write_text(json.dumps(cfg))
    vmap = {f"w{i}": i for i in range(56)}
    vmap.update(ids)
    tok = Tokenizer(WordLevel(vmap, unk_token="w0"))
    tok.pre_tokenizer = Whitespace()
    tok.add_special_tokens([AddedToken(s, special=True) for s in specials])
    tok.save(str(path / "tokenizer.json"))
    make_moss_tokenizer_fixture(path / "audio_tokenizer")
    save_file(w, str(path / "model.safetensors"))
    return path


def make_irodori_fixture(path: Path) -> Path:
    """Tiny Irodori-TTS v3 VoiceDesign: dual speaker+caption DiT, duration
    predictor, bundled DACVAE, WordLevel tokenizer with <s>/</s>."""
    from safetensors.numpy import save_file
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    D, HEADS = 16, 2          # DiT dim/heads
    TD, SD = 8, 8             # text / speaker encoder dims
    LAT = 4                   # latent dim (matches DACVAE cb)
    DH = 8                    # duration hidden
    w = {}
    c = [0]

    def lin(name, o, i, bias=False):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.15)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    def rms(name, shape):
        w[f"{name}.weight"] = np.ones(shape, np.float32)

    def enc_block(name, dim, heads, inter):
        for proj in ("wq", "wk", "wv", "gate", "wo"):
            lin(f"{name}.attention.{proj}", dim, dim)
        rms(f"{name}.attention.q_norm", (heads, dim // heads))
        rms(f"{name}.attention.k_norm", (heads, dim // heads))
        rms(f"{name}.attention_norm", (dim,))
        rms(f"{name}.mlp_norm", (dim,))
        lin(f"{name}.mlp.w1", inter, dim)
        lin(f"{name}.mlp.w2", dim, inter)
        lin(f"{name}.mlp.w3", inter, dim)

    pre = "model."
    # text + caption encoders
    for enc, dim in (("text_encoder", TD), ("caption_encoder", TD)):
        w[f"{pre}{enc}.text_embedding.weight"] = modulo_values((64, dim),
                                                               13, 0.3)
        enc_block(f"{pre}{enc}.blocks.0", dim, 2, 2 * dim)
    rms(f"{pre}text_norm", (TD,))
    rms(f"{pre}caption_norm", (TD,))
    # speaker encoder
    lin(f"{pre}speaker_encoder.in_proj", SD, LAT, bias=True)
    enc_block(f"{pre}speaker_encoder.blocks.0", SD, 2, 2 * SD)
    rms(f"{pre}speaker_norm", (SD,))
    # duration predictor (dual token-sum)
    dp = f"{pre}duration_predictor"
    w[f"{dp}.null_speaker"] = modulo_values((SD,), 3, 0.1)
    w[f"{dp}.null_caption"] = modulo_values((TD,), 5, 0.1)
    lin(f"{dp}.token_input_proj", DH, TD, bias=True)
    b = f"{dp}.token_blocks.0"
    rms(f"{b}.norm", (DH,))
    lin(f"{b}.mlp.w1", DH, DH)
    lin(f"{b}.mlp.w2", DH, DH)
    lin(f"{b}.mlp.w3", DH, DH)
    lin(f"{b}.modulation", 3 * DH, SD, bias=True)
    lin(f"{b}.caption_modulation", 3 * DH, TD, bias=True)
    rms(f"{dp}.token_out_norm", (DH,))
    lin(f"{dp}.token_out_proj", 1, DH, bias=True)
    # cond module + DiT blocks (strong weights so the adaLN gates are not
    # ~tanh(0) and context guidance is measurable in tests)
    w[f"{pre}cond_module.0.weight"] = modulo_values((D, 8), 7, 1.0)
    w[f"{pre}cond_module.2.weight"] = modulo_values((D, D), 9, 0.8)
    w[f"{pre}cond_module.4.weight"] = modulo_values((3 * D, D), 11, 0.8)
    lin(f"{pre}in_proj", D, LAT, bias=True)
    for i in range(2):
        bb = f"{pre}blocks.{i}"
        for proj in ("wq", "wk", "wv", "gate", "wo"):
            lin(f"{bb}.attention.{proj}", D, D)
        for proj in ("wk_text", "wv_text"):
            lin(f"{bb}.attention.{proj}", D, TD)
        for proj in ("wk_speaker", "wv_speaker"):
            lin(f"{bb}.attention.{proj}", D, SD)
        for proj in ("wk_caption", "wv_caption"):
            lin(f"{bb}.attention.{proj}", D, TD)
        rms(f"{bb}.attention.q_norm", (HEADS, D // HEADS))
        rms(f"{bb}.attention.k_norm", (HEADS, D // HEADS))
        for ada in ("attention_adaln", "mlp_adaln"):
            for part in ("shift", "scale", "gate"):
                lin(f"{bb}.{ada}.{part}_down", 4, D)
                lin(f"{bb}.{ada}.{part}_up", D, 4)
        lin(f"{bb}.mlp.w1", 2 * D, D)
        lin(f"{bb}.mlp.w2", D, 2 * D)
        lin(f"{bb}.mlp.w3", 2 * D, D)
    rms(f"{pre}out_norm", (D,))
    lin(f"{pre}out_proj", LAT, D, bias=True)

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps({
        "model_type": "irodori_tts",
        "sample_rate": 16000, "max_text_length": 12,
        "max_caption_length": 12, "max_speaker_latent_length": 64,
        "audio_downsample_factor": 8,
        "dit": {
            "latent_dim": LAT, "latent_patch_size": 1, "model_dim": D,
            "num_layers": 2, "num_heads": HEADS, "mlp_ratio": 2.0,
            "text_vocab_size": 64, "text_dim": TD, "text_layers": 1,
            "text_heads": 2, "speaker_dim": SD, "speaker_layers": 1,
            "speaker_heads": 2, "speaker_patch_size": 1,
            "timestep_embed_dim": 8, "adaln_rank": 4, "norm_eps": 1e-5,
            "use_caption_condition": True, "use_speaker_condition": True,
            "use_duration_predictor": True, "duration_aux_dim": 14,
            "duration_hidden_dim": DH, "duration_layers": 1,
            "duration_architecture": "token_sum_dual_adarn_zero_no_aux",
        },
        "sampler": {
            "num_steps": 2, "cfg_scale_text": 1.0, "cfg_scale_speaker": 1.0,
            "cfg_scale_caption": 1.0, "cfg_guidance_mode": "independent",
            "cfg_min_t": 0.0, "cfg_max_t": 1.0, "sequence_length": 16,
            "min_seconds": 0.1, "max_seconds": 4.0,
        },
    }))
    vmap = {f"w{i}": i for i in range(62)}
    vmap["<s>"] = 62
    vmap["</s>"] = 63
    tok = Tokenizer(WordLevel(vmap, unk_token="w0"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(path / "tokenizer.json"))
    make_dacvae_fixture(path / "dacvae")
    save_file(w, str(path / "model.safetensors"))
    return path


def make_higgs_audio_fixture(path: Path) -> Path:
    """Tiny HiggsAudioV2 codec: DAC acoustic path (2 stride-2 stages),
    HuBERT semantic trunk, RVQ with 2 codebooks, fused fc."""
    from safetensors.numpy import save_file

    E, A, HS, F, CB = 2, 4, 8, 12, 4  # enc hidden/acoustic/semantic/fused/cb
    w = {}
    c = [0]

    def conv(name, o, i, k, bias=True):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i, k), 9 + c[0] % 5, 0.2)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 3, 0.01)

    def convt(name, i, o, k):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((i, o, k), 9 + c[0] % 5, 0.2)
        w[f"{name}.bias"] = modulo_values((o,), 3, 0.01)

    def lin(name, o, i, bias=True):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.2)
        if bias:
            w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    def snake(name, ch):
        w[f"{name}.alpha"] = np.ones((1, 1, ch), np.float32)

    def res_unit(name, ch):
        snake(f"{name}.snake1", ch)
        conv(f"{name}.conv1", ch, ch, 7)
        snake(f"{name}.snake2", ch)
        conv(f"{name}.conv2", ch, ch, 1)

    # acoustic encoder: 1 -> E, blocks E->2E->4E, snake, conv2 4E -> A
    conv("acoustic_encoder.conv1", E, 1, 7)
    ch = E
    for i in range(2):
        b = f"acoustic_encoder.block.{i}"
        for j in range(3):
            res_unit(f"{b}.res_unit{j + 1}", ch)
        snake(f"{b}.snake1", ch)
        conv(f"{b}.conv1", ch * 2, ch, 4)
        ch *= 2
    snake("acoustic_encoder.snake1", ch)
    conv("acoustic_encoder.conv2", A, ch, 3)
    # acoustic decoder: A -> 4E, up blocks 4E->2E->E, snake, conv2 -> 1
    conv("acoustic_decoder.conv1", 2 * E * 2, A, 7)
    ch = 2 * E * 2
    for i in range(2):
        b = f"acoustic_decoder.block.{i}"
        snake(f"{b}.snake1", ch)
        convt(f"{b}.conv_t1", ch, ch // 2, 4)
        ch //= 2
        for j in range(3):
            res_unit(f"{b}.res_unit{j + 1}", ch)
    snake("acoustic_decoder.snake1", ch)
    conv("acoustic_decoder.conv2", 1, ch, 7)
    # RVQ: project_in F->CB, codebook [16, CB], project_out CB->F
    for i in range(2):
        q = f"quantizer.quantizers.{i}"
        lin(f"{q}.project_in", CB, F)
        lin(f"{q}.project_out", F, CB)
        w[f"{q}.codebook.weight"] = modulo_values((16, CB), 17 + i, 0.5)
        w[f"{q}.codebook.embed_avg"] = np.zeros((16, CB), np.float32)
        w[f"{q}.codebook.cluster_size"] = np.zeros((16,), np.float32)
    lin("fc2", A, F)
    lin("fc", F, F)
    w["fc1.weight"] = modulo_values((4, 4), 7, 0.1)  # dropped
    # HuBERT semantic trunk (2 conv layers, 1 encoder layer)
    fe = "semantic_model.feature_extractor.conv_layers"
    conv(f"{fe}.0.conv", 4, 1, 4, bias=False)
    w[f"{fe}.0.layer_norm.weight"] = np.ones(4, np.float32)
    w[f"{fe}.0.layer_norm.bias"] = np.zeros(4, np.float32)
    conv(f"{fe}.1.conv", 4, 4, 2, bias=False)
    lin("semantic_model.feature_projection.projection", HS, 4)
    w["semantic_model.feature_projection.layer_norm.weight"] = np.ones(
        4, np.float32)
    w["semantic_model.feature_projection.layer_norm.bias"] = np.zeros(
        4, np.float32)
    w["semantic_model.masked_spec_embed"] = np.zeros((HS,), np.float32)
    enc = "semantic_model.encoder"
    pc = f"{enc}.pos_conv_embed.conv"
    w[f"{pc}.parametrizations.weight.original0"] = np.ones((1, 1, 4),
                                                           np.float32)
    w[f"{pc}.parametrizations.weight.original1"] = modulo_values(
        (HS, HS // 2, 4), 13, 0.1)
    w[f"{pc}.bias"] = np.zeros((HS,), np.float32)
    w[f"{enc}.layer_norm.weight"] = np.ones(HS, np.float32)
    w[f"{enc}.layer_norm.bias"] = np.zeros(HS, np.float32)
    el = f"{enc}.layers.0"
    for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
        lin(f"{el}.attention.{proj}", HS, HS)
    for nrm in ("layer_norm", "final_layer_norm"):
        w[f"{el}.{nrm}.weight"] = np.ones(HS, np.float32)
        w[f"{el}.{nrm}.bias"] = np.zeros(HS, np.float32)
    lin(f"{el}.feed_forward.intermediate_dense", 2 * HS, HS)
    lin(f"{el}.feed_forward.output_dense", HS, 2 * HS)
    # post-HuBERT semantic CNN
    se = "encoder_semantic"
    conv(f"{se}.conv", HS, HS, 3, bias=False)
    for i in range(2):
        b = f"{se}.conv_blocks.{i}"
        for j in range(2):
            conv(f"{b}.res_units.{j}.conv1", HS, HS, 3, bias=False)
            conv(f"{b}.res_units.{j}.conv2", HS, HS, 1, bias=False)
        conv(f"{b}.conv", HS, HS, 3)
    w["decoder_semantic.conv.weight"] = modulo_values((4, 4, 3), 5, 0.1)

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps({
        "model_type": "higgs_audio_tokenizer",
        "codebook_size": 16, "codebook_dim": CB, "n_codebooks": 2,
        "hop_length": 4, "downsampling_ratios": [2, 2],
        "upsampling_ratios": [2, 2], "encoder_hidden_size": E,
        "decoder_hidden_size": F, "kernel_size": 3,
        "hidden_size": HS, "num_hidden_layers": 1,
        "num_attention_heads": 2, "intermediate_size": 2 * HS,
        "conv_dim": [4, 4], "conv_kernel": [4, 2], "conv_stride": [2, 2],
        "num_conv_pos_embeddings": 4, "num_conv_pos_embedding_groups": 2,
        "sample_rate": 16000, "semantic_sample_rate": 16000,
        "downsample_factor": 4,
    }))
    save_file(w, str(path / "model.safetensors"))
    return path


def make_omnivoice_fixture(path: Path) -> Path:
    """Tiny OmniVoice: Qwen3 diffusion LM with 2 codebooks (FUSED
    embedding/head layout to exercise the split), bundled HiggsAudio
    tokenizer and special-token WordLevel tokenizer."""
    from safetensors.numpy import save_file
    from tokenizers import AddedToken, Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    d, heads, kv, hd, ffn = 16, 2, 1, 8, 32
    tvocab, n_cb, avocab = 64, 2, 17  # audio vocab incl. mask id 16
    w = {}
    c = [0]

    def lin(name, o, i):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.2)

    w["model.embed_tokens.weight"] = modulo_values((tvocab, d), 7, 0.3)
    for i in range(2):
        b = f"model.layers.{i}"
        lin(f"{b}.self_attn.q_proj", heads * hd, d)
        lin(f"{b}.self_attn.k_proj", kv * hd, d)
        lin(f"{b}.self_attn.v_proj", kv * hd, d)
        lin(f"{b}.self_attn.o_proj", d, heads * hd)
        w[f"{b}.self_attn.q_norm.weight"] = np.ones(hd, np.float32)
        w[f"{b}.self_attn.k_norm.weight"] = np.ones(hd, np.float32)
        w[f"{b}.input_layernorm.weight"] = np.ones(d, np.float32)
        w[f"{b}.post_attention_layernorm.weight"] = np.ones(d, np.float32)
        lin(f"{b}.mlp.gate_proj", ffn, d)
        lin(f"{b}.mlp.up_proj", ffn, d)
        lin(f"{b}.mlp.down_proj", d, ffn)
    w["model.norm.weight"] = np.ones(d, np.float32)
    # fused per-codebook tables [C*V, H] (sanitize must split)
    w["audio_embeddings.weight"] = modulo_values((n_cb * avocab, d), 13, 0.3)
    w["audio_heads.weight"] = modulo_values((n_cb * avocab, d), 19, 0.15)
    w["audio_embeddings.codebook_layer_offsets"] = np.arange(
        n_cb, dtype=np.float32)

    specials = ["<|denoise|>", "<|lang_start|>", "<|lang_end|>",
                "<|instruct_start|>", "<|instruct_end|>", "<|text_start|>",
                "<|text_end|>"]
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps({
        "model_type": "omnivoice",
        "llm_config": {
            "model_type": "qwen3", "vocab_size": tvocab, "hidden_size": d,
            "num_hidden_layers": 2, "intermediate_size": ffn,
            "num_attention_heads": heads, "num_key_value_heads": kv,
            "head_dim": hd, "rms_norm_eps": 1e-6, "rope_theta": 10000.0,
            "tie_word_embeddings": True,
        },
        "audio_codebook_weights": [8, 8], "audio_mask_id": 16,
        "audio_vocab_size": avocab, "num_audio_codebook": n_cb,
        "pad_token_id": 0, "eos_token_id": 1, "sample_rate": 16000,
    }))
    vmap = {f"w{i}": i for i in range(57)}
    vmap.update({s: 57 + k for k, s in enumerate(specials)})
    tok = Tokenizer(WordLevel(vmap, unk_token="w0"))
    tok.pre_tokenizer = Whitespace()
    tok.add_special_tokens([AddedToken(s, special=True) for s in specials])
    tok.save(str(path / "tokenizer.json"))
    make_higgs_audio_fixture(path / "audio_tokenizer")
    save_file(w, str(path / "model.safetensors"))
    return path


def make_bart_g2p_files(path: Path, prefix: str = "us") -> Path:
    """Tiny Misaki BART fallback files (``{us}_bart.safetensors`` +
    ``{us}_bart_config.json``) in the HF BART key layout the reference
    consumes (BARTModel.swift:17-66)."""
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    D, H, FF, V, L = 16, 2, 32, 40, 1
    graphemes = ";:,.!?¡¿—…\"«»“” abcdefghijklmnop"  # len 32 < V
    phonemes = ";:,.!?¡¿—…\"«»“” ɑɐɒæβɔbcdefhijkl"
    cfg = {
        "d_model": D, "encoder_layers": L, "decoder_layers": L,
        "encoder_attention_heads": H, "decoder_attention_heads": H,
        "encoder_ffn_dim": FF, "decoder_ffn_dim": FF, "vocab_size": V,
        "max_position_embeddings": 64, "bos_token_id": 0,
        "eos_token_id": 2, "pad_token_id": 1,
        "grapheme_chars": graphemes, "phoneme_chars": phonemes,
    }
    (path / f"{prefix}_bart_config.json").write_text(json.dumps(cfg))
    w = {}
    c = [0]

    def lin(name, o, i):
        c[0] += 1
        w[f"{name}.weight"] = modulo_values((o, i), 11 + c[0] % 7, 0.2)
        w[f"{name}.bias"] = modulo_values((o,), 5, 0.01)

    def ln(name, d):
        w[f"{name}.weight"] = np.ones((d,), np.float32)
        w[f"{name}.bias"] = np.zeros((d,), np.float32)

    w["model.shared.weight"] = modulo_values((V, D), 13, 0.3)
    w["model.encoder.embed_positions.weight"] = modulo_values((66, D), 17, 0.1)
    w["model.decoder.embed_positions.weight"] = modulo_values((66, D), 19, 0.1)
    ln("model.encoder.layernorm_embedding", D)
    ln("model.decoder.layernorm_embedding", D)
    for stem, n, cross in (("encoder", L, False), ("decoder", L, True)):
        for i in range(n):
            base = f"model.{stem}.layers.{i}"
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                lin(f"{base}.self_attn.{proj}", D, D)
            ln(f"{base}.self_attn_layer_norm", D)
            if cross:
                for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                    lin(f"{base}.encoder_attn.{proj}", D, D)
                ln(f"{base}.encoder_attn_layer_norm", D)
            lin(f"{base}.fc1", FF, D)
            lin(f"{base}.fc2", D, FF)
            ln(f"{base}.final_layer_norm", D)
    w["final_logits_bias"] = np.zeros((1, V), np.float32)
    save_file(w, str(path / f"{prefix}_bart.safetensors"))
    return path
