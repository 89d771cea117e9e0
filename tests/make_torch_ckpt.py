"""Synthesize reference-format torch checkpoints for a tiny config.

Builds gpt.pth / bigvgan_generator.pth state dicts with the key names and
shapes the published IndexTTS-1.5 checkpoints use (UnifiedVoice + BigVGAN
state_dict layouts, incl. weight-normed convs), so the converter and the
whole engine load path can be driven end-to-end without the real 2GB models.
"""

from __future__ import annotations

import numpy as np


def _t(shape, rng, scale=0.05):
    import torch

    return torch.from_numpy((scale * rng.standard_normal(shape)).astype(np.float32))


def make_gpt_state_dict(cfg, rng=None):
    """UnifiedVoice state dict for a conformer_perceiver config."""
    import torch

    rng = rng or np.random.default_rng(0)
    d = cfg.model_dim
    cm = cfg.condition_module
    n_text = cfg.number_text_tokens * cfg.types + 1
    sd = {
        "text_embedding.weight": _t((n_text, d), rng),
        "mel_embedding.weight": _t((cfg.number_mel_codes, d), rng),
        "text_pos_embedding.emb.weight": _t((cfg.max_text_seq_len, d), rng),
        "mel_pos_embedding.emb.weight": _t((cfg.max_mel_seq_len, d), rng),
        "final_norm.weight": torch.ones(d),
        "final_norm.bias": torch.zeros(d),
        "text_head.weight": _t((n_text, d), rng),
        "text_head.bias": torch.zeros(n_text),
        "mel_head.weight": _t((cfg.number_mel_codes, d), rng),
        "mel_head.bias": torch.zeros(cfg.number_mel_codes),
        "gpt.ln_f.weight": torch.ones(d),
        "gpt.ln_f.bias": torch.zeros(d),
    }
    for i in range(cfg.layers):
        p = f"gpt.h.{i}"
        sd[f"{p}.ln_1.weight"] = torch.ones(d)
        sd[f"{p}.ln_1.bias"] = torch.zeros(d)
        sd[f"{p}.attn.c_attn.weight"] = _t((d, 3 * d), rng)  # HF Conv1D layout [in, out]
        sd[f"{p}.attn.c_attn.bias"] = torch.zeros(3 * d)
        sd[f"{p}.attn.c_proj.weight"] = _t((d, d), rng)
        sd[f"{p}.attn.c_proj.bias"] = torch.zeros(d)
        sd[f"{p}.ln_2.weight"] = torch.ones(d)
        sd[f"{p}.ln_2.bias"] = torch.zeros(d)
        sd[f"{p}.mlp.c_fc.weight"] = _t((d, 4 * d), rng)
        sd[f"{p}.mlp.c_fc.bias"] = torch.zeros(4 * d)
        sd[f"{p}.mlp.c_proj.weight"] = _t((4 * d, d), rng)
        sd[f"{p}.mlp.c_proj.bias"] = torch.zeros(d)

    # conformer conditioning encoder (conv2d2 input layer)
    ce = "conditioning_encoder"
    o = cm.output_size
    f_out = (100 - 1) // 2
    sd[f"{ce}.embed.conv.0.weight"] = _t((o, 1, 3, 3), rng)
    sd[f"{ce}.embed.conv.0.bias"] = torch.zeros(o)
    sd[f"{ce}.embed.out.0.weight"] = _t((o, o * f_out), rng, scale=0.02)
    sd[f"{ce}.embed.out.0.bias"] = torch.zeros(o)
    sd[f"{ce}.after_norm.weight"] = torch.ones(o)
    sd[f"{ce}.after_norm.bias"] = torch.zeros(o)
    dk = o // cm.attention_heads
    for i in range(cm.num_blocks):
        p = f"{ce}.encoders.{i}"
        for nm in ("linear_q", "linear_k", "linear_v", "linear_out"):
            sd[f"{p}.self_attn.{nm}.weight"] = _t((o, o), rng)
            sd[f"{p}.self_attn.{nm}.bias"] = torch.zeros(o)
        sd[f"{p}.self_attn.linear_pos.weight"] = _t((o, o), rng)
        sd[f"{p}.self_attn.pos_bias_u"] = _t((cm.attention_heads, dk), rng)
        sd[f"{p}.self_attn.pos_bias_v"] = _t((cm.attention_heads, dk), rng)
        sd[f"{p}.feed_forward.w_1.weight"] = _t((cm.linear_units, o), rng)
        sd[f"{p}.feed_forward.w_1.bias"] = torch.zeros(cm.linear_units)
        sd[f"{p}.feed_forward.w_2.weight"] = _t((o, cm.linear_units), rng)
        sd[f"{p}.feed_forward.w_2.bias"] = torch.zeros(o)
        sd[f"{p}.conv_module.pointwise_conv1.weight"] = _t((2 * o, o, 1), rng)
        sd[f"{p}.conv_module.pointwise_conv1.bias"] = torch.zeros(2 * o)
        sd[f"{p}.conv_module.depthwise_conv.weight"] = _t((o, 1, 15), rng)
        sd[f"{p}.conv_module.depthwise_conv.bias"] = torch.zeros(o)
        sd[f"{p}.conv_module.norm.weight"] = torch.ones(o)
        sd[f"{p}.conv_module.norm.bias"] = torch.zeros(o)
        sd[f"{p}.conv_module.pointwise_conv2.weight"] = _t((o, o, 1), rng)
        sd[f"{p}.conv_module.pointwise_conv2.bias"] = torch.zeros(o)
        for nm in ("norm_mha", "norm_ff", "norm_conv", "norm_final"):
            sd[f"{p}.{nm}.weight"] = torch.ones(o)
            sd[f"{p}.{nm}.bias"] = torch.zeros(o)

    # perceiver resampler
    pe = "perceiver_encoder"
    inner = 64 * 8  # dim_head * heads (perceiver.py defaults dim_head=64)
    heads = cm.attention_heads
    inner = 64 * heads
    ff_inner = int(d * cm.perceiver_mult * 2 / 3)
    sd[f"{pe}.latents"] = _t((cfg.condition_num_latent, d), rng)
    sd[f"{pe}.norm.gamma"] = torch.ones(d)
    if cm.output_size != d:
        sd[f"{pe}.proj_context.weight"] = _t((d, cm.output_size), rng)
        sd[f"{pe}.proj_context.bias"] = torch.zeros(d)
    for i in range(2):
        sd[f"{pe}.layers.{i}.0.to_q.weight"] = _t((inner, d), rng)
        sd[f"{pe}.layers.{i}.0.to_kv.weight"] = _t((inner * 2, d), rng)
        sd[f"{pe}.layers.{i}.0.to_out.weight"] = _t((d, inner), rng)
        sd[f"{pe}.layers.{i}.1.0.weight"] = _t((ff_inner * 2, d), rng)
        sd[f"{pe}.layers.{i}.1.0.bias"] = torch.zeros(ff_inner * 2)
        sd[f"{pe}.layers.{i}.1.2.weight"] = _t((d, ff_inner), rng)
        sd[f"{pe}.layers.{i}.1.2.bias"] = torch.zeros(d)
    return sd


def _wn(sd, prefix, shape, rng, out_dim: int = 0):
    """weight-normed conv entries (weight_g over dim 0, torch default).
    out_dim: which weight dim holds out_channels (0 for Conv1d, 1 for
    ConvTranspose1d) — the bias length."""
    import torch

    v = _t(shape, rng)
    g_shape = (shape[0],) + (1,) * (len(shape) - 1)
    sd[f"{prefix}.weight_g"] = torch.ones(g_shape)
    sd[f"{prefix}.weight_v"] = v
    sd[f"{prefix}.bias"] = torch.zeros(shape[out_dim])


def make_bigvgan_state_dict(h, rng=None):
    import torch

    rng = rng or np.random.default_rng(1)
    sd = {}
    _wn(sd, "conv_pre", (h.upsample_initial_channel, h.gpt_dim, 7), rng)
    n_ups = len(h.upsample_rates)
    for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
        cin = h.upsample_initial_channel // (2**i)
        cout = h.upsample_initial_channel // (2 ** (i + 1))
        _wn(sd, f"ups.{i}.0", (cin, cout, k), rng, out_dim=1)
        if h.cond_d_vector_in_each_upsampling_layer:
            sd[f"conds.{i}.weight"] = _t((cout, h.speaker_embedding_dim, 1), rng)
            sd[f"conds.{i}.bias"] = torch.zeros(cout)
        for j, (kk, dd) in enumerate(zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes)):
            n = i * len(h.resblock_kernel_sizes) + j
            n_convs = len(dd)
            for c in range(n_convs):
                _wn(sd, f"resblocks.{n}.convs1.{c}", (cout, cout, kk), rng)
                _wn(sd, f"resblocks.{n}.convs2.{c}", (cout, cout, kk), rng)
            for a in range(2 * n_convs):
                sd[f"resblocks.{n}.activations.{a}.act.alpha"] = torch.zeros(cout)
                if h.activation == "snakebeta":
                    sd[f"resblocks.{n}.activations.{a}.act.beta"] = torch.zeros(cout)
    ch_last = h.upsample_initial_channel // (2**n_ups)
    sd["activation_post.act.alpha"] = torch.zeros(ch_last)
    if h.activation == "snakebeta":
        sd["activation_post.act.beta"] = torch.zeros(ch_last)
    _wn(sd, "conv_post", (1, ch_last, 7), rng)
    sd["cond_layer.weight"] = _t((h.upsample_initial_channel, h.speaker_embedding_dim, 1), rng)
    sd["cond_layer.bias"] = torch.zeros(h.upsample_initial_channel)

    # ECAPA speaker encoder (speechbrain key layout)
    import torch as _torch

    def tdnn(prefix, cin, cout, k):
        sd[f"{prefix}.conv.conv.weight"] = _t((cout, cin, k), rng)
        sd[f"{prefix}.conv.conv.bias"] = _torch.zeros(cout)
        sd[f"{prefix}.norm.norm.weight"] = _torch.ones(cout)
        sd[f"{prefix}.norm.norm.bias"] = _torch.zeros(cout)
        sd[f"{prefix}.norm.norm.running_mean"] = _torch.zeros(cout)
        sd[f"{prefix}.norm.norm.running_var"] = _torch.ones(cout)
        sd[f"{prefix}.norm.norm.num_batches_tracked"] = _torch.tensor(0)

    se = "speaker_encoder"
    CH = (512, 512, 512, 512, 1536)
    KS = (5, 3, 3, 3, 1)
    tdnn(f"{se}.blocks.0", h.num_mels, CH[0], KS[0])
    for i in range(1, 4):
        bp = f"{se}.blocks.{i}"
        tdnn(f"{bp}.tdnn1", CH[i - 1], CH[i], 1)
        hid = CH[i] // 8
        for j in range(7):
            tdnn(f"{bp}.res2net_block.blocks.{j}", hid, hid, KS[i])
        tdnn(f"{bp}.tdnn2", CH[i], CH[i], 1)
        sd[f"{bp}.se_block.conv1.conv.weight"] = _t((128, CH[i], 1), rng)
        sd[f"{bp}.se_block.conv1.conv.bias"] = _torch.zeros(128)
        sd[f"{bp}.se_block.conv2.conv.weight"] = _t((CH[i], 128, 1), rng)
        sd[f"{bp}.se_block.conv2.conv.bias"] = _torch.zeros(CH[i])
    tdnn(f"{se}.mfa", CH[3] * 3, CH[4], 1)
    tdnn(f"{se}.asp.tdnn", CH[4] * 3, 128, 1)
    sd[f"{se}.asp.conv.conv.weight"] = _t((CH[4], 128, 1), rng)
    sd[f"{se}.asp.conv.conv.bias"] = _torch.zeros(CH[4])
    sd[f"{se}.asp_bn.norm.weight"] = _torch.ones(CH[4] * 2)
    sd[f"{se}.asp_bn.norm.bias"] = _torch.zeros(CH[4] * 2)
    sd[f"{se}.asp_bn.norm.running_mean"] = _torch.zeros(CH[4] * 2)
    sd[f"{se}.asp_bn.norm.running_var"] = _torch.ones(CH[4] * 2)
    sd[f"{se}.asp_bn.norm.num_batches_tracked"] = _torch.tensor(0)
    sd[f"{se}.fc.conv.weight"] = _t((h.speaker_embedding_dim, CH[4] * 2, 1), rng)
    sd[f"{se}.fc.conv.bias"] = _torch.zeros(h.speaker_embedding_dim)
    return sd


def make_discriminator_state_dict(h, rng=None):
    """bigvgan_discriminator.pth layout: flat "mpd."/"mrd."-prefixed
    weight-normed Conv2d keys (reference structure: BigVGAN/models.py:278-417)."""
    import torch

    rng = rng or np.random.default_rng(2)
    sd = {}

    def wn2d(prefix, shape):
        sd[f"{prefix}.weight_g"] = torch.ones((shape[0], 1, 1, 1))
        sd[f"{prefix}.weight_v"] = _t(shape, rng)
        sd[f"{prefix}.bias"] = torch.zeros(shape[0])

    dm = h.discriminator_channel_mult
    chans = [1, int(32 * dm), int(128 * dm), int(512 * dm), int(1024 * dm), int(1024 * dm)]
    for i in range(len(h.mpd_reshapes)):
        p = f"mpd.discriminators.{i}"
        for j in range(5):
            wn2d(f"{p}.convs.{j}", (chans[j + 1], chans[j], 5, 1))
        wn2d(f"{p}.conv_post", (1, chans[5], 3, 1))
    c = int(32 * dm)
    for i in range(len(h.resolutions)):
        p = f"mrd.discriminators.{i}"
        wn2d(f"{p}.convs.0", (c, 1, 3, 9))
        for j in (1, 2, 3):
            wn2d(f"{p}.convs.{j}", (c, c, 3, 9))
        wn2d(f"{p}.convs.4", (c, c, 3, 3))
        wn2d(f"{p}.conv_post", (1, c, 3, 3))
    return sd


def make_dvae_state_dict(cfg, rng=None):
    """dvae.pth layout (Sequential indices per convert_dvae's docstring /
    reference vqvae/xtts_dvae.py:251-291), shapes taken from our init tree
    and transposed back to torch conv layout."""
    import torch

    import jax

    # shapes only — force the init onto CPU: under the container's pinned
    # axon platform this otherwise pays a minutes-long remote TPU compile
    # (and ties up the one TPU) just to read shapes
    jax.config.update("jax_platforms", "cpu")

    from indextts_tpu.models.dvae import init_dvae

    rng = rng or np.random.default_rng(3)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_dvae(jax.random.PRNGKey(11), cfg)
    L, R = cfg.num_layers, cfg.num_resnet_blocks
    sd = {}

    def conv(prefix, p):
        w = np.asarray(p["weight"])  # [K, Cin, Cout]
        sd[f"{prefix}.weight"] = _t(np.transpose(w, (2, 1, 0)).shape, rng)
        sd[f"{prefix}.bias"] = torch.zeros(w.shape[2])

    def res(prefix, p):
        conv(f"{prefix}.net.0", p["conv0"])
        conv(f"{prefix}.net.2", p["conv1"])
        conv(f"{prefix}.net.4", p["conv2"])

    for i in range(L):
        conv(f"encoder.{i}.0", params["enc_convs"][i])
    for r in range(R):
        res(f"encoder.{L + r}", params["enc_res"][r])
    conv(f"encoder.{L + R}", params["enc_out"])
    dec_off = 1 if R > 0 else 0
    if R > 0:
        conv("decoder.0", params["dec_in"])
    for r in range(R):
        res(f"decoder.{dec_off + r}", params["dec_res"][r])
    for i in range(L):
        conv(f"decoder.{dec_off + R + i}.0.conv", params["dec_convs"][i])
    conv(f"decoder.{dec_off + R + L}", params["dec_out"])
    cb = params["codebook"]
    sd["codebook.embed"] = _t(np.asarray(cb["embed"]).shape, rng, scale=0.5)
    sd["codebook.cluster_size"] = torch.ones(np.asarray(cb["cluster_size"]).shape)
    sd["codebook.embed_avg"] = _t(np.asarray(cb["embed_avg"]).shape, rng, scale=0.5)
    return sd


def write_checkpoints(cfg, out_dir: str):
    """Write gpt.pth + bigvgan_generator.pth (+ config.yaml) for `cfg`."""
    import os

    import torch

    from indextts_tpu.config import save_config

    os.makedirs(out_dir, exist_ok=True)
    torch.save(make_gpt_state_dict(cfg.gpt), os.path.join(out_dir, "gpt.pth"))
    torch.save(
        {"generator": make_bigvgan_state_dict(cfg.bigvgan)},
        os.path.join(out_dir, "bigvgan_generator.pth"),
    )
    torch.save(
        make_discriminator_state_dict(cfg.bigvgan),
        os.path.join(out_dir, "bigvgan_discriminator.pth"),
    )
    torch.save(make_dvae_state_dict(cfg.dvae), os.path.join(out_dir, "dvae.pth"))
    save_config(cfg, os.path.join(out_dir, "config.yaml"))

    # a real serialized sentencepiece BPE model (A-Z chars + punctuation)
    from indextts_tpu.utils.spm import build_vocab_from_pieces, serialize_model_proto

    pieces = [(chr(65 + i), -float(i + 1)) for i in range(26)]
    pieces += [("▁", -30.0), (".", -31.0), (",", -32.0), ("!", -33.0), ("?", -34.0), ("-", -35.0), ("'", -36.0)]
    vocab = build_vocab_from_pieces(pieces, model_type=2)
    with open(os.path.join(out_dir, "bpe.model"), "wb") as f:
        f.write(serialize_model_proto(vocab))


if __name__ == "__main__":
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from test_engine import tiny_config

    write_checkpoints(tiny_config(), sys.argv[1] if len(sys.argv) > 1 else "/tmp/tiny_ckpt")
    print("checkpoints written")
