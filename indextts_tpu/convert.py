"""Checkpoint conversion: published IndexTTS-1.5 torch .pth -> JAX pytrees.

The reference loads plain torch.save state dicts (utils/checkpoint.py:25-34,
infer.py:49,63-64; the vocoder nested under "generator"). This module maps
those state-dict names onto the indextts_tpu parameter trees, transposing to
lax-native layouts and folding weight norm (the reference folds at load via
remove_weight_norm(), models.py:252-260).

torch is imported lazily and used only here — the runtime path is pure JAX.
Converted trees can be cached as .npz for torch-free startup.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import numpy as np

from indextts_tpu.config import BigVGANConfig, GPTConfig
from indextts_tpu.ops.conv import weight_norm_fold


def load_torch_state_dict(path: str, key: Optional[str] = None) -> Dict[str, np.ndarray]:
    """torch.load -> {name: np.ndarray} (optionally unwrapping ['model'] like
    utils/checkpoint.py:28-30 or ['generator'] like infer.py:63-64)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if key is not None:
        if key not in obj:
            # fail HERE, not with a far-away KeyError on some weight name
            # after silently unwrapping the wrong nesting
            raise KeyError(
                f"checkpoint {path!r} has no top-level entry {key!r} "
                f"(keys: {sorted(map(str, obj))[:10]})"
            )
        obj = obj[key]
    elif "model" in obj and isinstance(obj.get("model"), dict):
        obj = obj["model"]

    def to_np(v):
        if isinstance(v, dict):  # nested module state dicts (e.g. {'mpd': ..., 'mrd': ...})
            return {k: to_np(x) for k, x in v.items()}
        if hasattr(v, "numpy"):
            # Tensor.numpy() rejects bf16 (re-exported/fine-tuned ckpts)
            if str(getattr(v, "dtype", "")) == "torch.bfloat16":
                v = v.float()
            return v.numpy()
        return np.asarray(v)

    return {k: to_np(v) for k, v in obj.items()}


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear [out, in] -> [in, out]."""
    return np.ascontiguousarray(w.T)


def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch Conv1d [Cout, Cin/g, K] -> [K, Cin/g, Cout] (also ConvTranspose1d
    [Cin, Cout/g, K] -> [K, Cout/g, Cin])."""
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def _conv2d_w(w: np.ndarray) -> np.ndarray:
    """torch Conv2d [Cout, Cin, Kh, Kw] -> [Kh, Kw, Cin, Cout]."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _wn_folded_weight(sd: Dict[str, np.ndarray], prefix: str) -> np.ndarray:
    """Resolve a (possibly weight-normed) torch conv weight: legacy
    weight_v/weight_g, the parametrize-era original1/original0 pair, or a
    plain weight. ONE resolution chain shared by the 1d and 2d folders so a
    future key-format fix cannot silently miss one of them."""
    if f"{prefix}.weight_v" in sd:
        return weight_norm_fold(sd[f"{prefix}.weight_v"], sd[f"{prefix}.weight_g"])
    if f"{prefix}.parametrizations.weight.original1" in sd:
        return weight_norm_fold(
            sd[f"{prefix}.parametrizations.weight.original1"],
            sd[f"{prefix}.parametrizations.weight.original0"],
        )
    return sd[f"{prefix}.weight"]


def _folded_conv(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Weight-normed torch conv -> folded lax-layout conv params."""
    out = {"weight": _conv_w(_wn_folded_weight(sd, prefix))}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _linear(sd, prefix, bias=True):
    p = {"weight": _t(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _ln(sd, prefix):
    return {"weight": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _bn(sd, prefix):
    return {
        "weight": sd[f"{prefix}.weight"],
        "bias": sd[f"{prefix}.bias"],
        "running_mean": sd[f"{prefix}.running_mean"],
        "running_var": sd[f"{prefix}.running_var"],
    }


# ---------------------------------------------------------------------------
# GPT (UnifiedVoice)
# ---------------------------------------------------------------------------


def convert_gpt2_blocks(sd: Dict[str, np.ndarray], layers: int, prefix: str = "gpt") -> Dict[str, Any]:
    """HF GPT2Model block stack -> stacked arrays [L, ...]. HF Conv1D stores
    weight as [in, out], which is already our convention."""

    def stack(fmt):
        return np.stack([sd[fmt.format(i=i)] for i in range(layers)])

    return {
        "ln_1": {"weight": stack(prefix + ".h.{i}.ln_1.weight"), "bias": stack(prefix + ".h.{i}.ln_1.bias")},
        "attn_qkv": {
            "weight": stack(prefix + ".h.{i}.attn.c_attn.weight"),
            "bias": stack(prefix + ".h.{i}.attn.c_attn.bias"),
        },
        "attn_proj": {
            "weight": stack(prefix + ".h.{i}.attn.c_proj.weight"),
            "bias": stack(prefix + ".h.{i}.attn.c_proj.bias"),
        },
        "ln_2": {"weight": stack(prefix + ".h.{i}.ln_2.weight"), "bias": stack(prefix + ".h.{i}.ln_2.bias")},
        "mlp_fc": {
            "weight": stack(prefix + ".h.{i}.mlp.c_fc.weight"),
            "bias": stack(prefix + ".h.{i}.mlp.c_fc.bias"),
        },
        "mlp_proj": {
            "weight": stack(prefix + ".h.{i}.mlp.c_proj.weight"),
            "bias": stack(prefix + ".h.{i}.mlp.c_proj.bias"),
        },
    }


def _convert_conformer(sd: Dict[str, np.ndarray], cfg: GPTConfig) -> Dict[str, Any]:
    cm = cfg.condition_module
    pfx = "conditioning_encoder"
    params: Dict[str, Any] = {}
    # input layer
    if cm.input_layer == "linear":
        params["embed"] = {
            "out": _linear(sd, f"{pfx}.embed.out.0"),
            "ln": _ln(sd, f"{pfx}.embed.out.1"),
        }
    elif cm.input_layer == "conv2d2":
        params["embed"] = {
            "conv0": {
                "weight": _conv2d_w(sd[f"{pfx}.embed.conv.0.weight"]),
                "bias": sd[f"{pfx}.embed.conv.0.bias"],
            },
            "out": _linear(sd, f"{pfx}.embed.out.0"),
        }
    elif cm.input_layer == "conv2d":
        params["embed"] = {
            "conv0": {
                "weight": _conv2d_w(sd[f"{pfx}.embed.conv.0.weight"]),
                "bias": sd[f"{pfx}.embed.conv.0.bias"],
            },
            "conv1": {
                "weight": _conv2d_w(sd[f"{pfx}.embed.conv.2.weight"]),
                "bias": sd[f"{pfx}.embed.conv.2.bias"],
            },
            "out": _linear(sd, f"{pfx}.embed.out.0"),
        }
    else:
        raise ValueError(cm.input_layer)

    layers = []
    for i in range(cm.num_blocks):
        lp = f"{pfx}.encoders.{i}"
        layers.append(
            {
                "attn": {
                    "linear_q": _linear(sd, f"{lp}.self_attn.linear_q"),
                    "linear_k": _linear(sd, f"{lp}.self_attn.linear_k"),
                    "linear_v": _linear(sd, f"{lp}.self_attn.linear_v"),
                    "linear_out": _linear(sd, f"{lp}.self_attn.linear_out"),
                    "linear_pos": _linear(sd, f"{lp}.self_attn.linear_pos", bias=False),
                    "pos_bias_u": sd[f"{lp}.self_attn.pos_bias_u"],
                    "pos_bias_v": sd[f"{lp}.self_attn.pos_bias_v"],
                },
                "ff": {
                    "w1": _linear(sd, f"{lp}.feed_forward.w_1"),
                    "w2": _linear(sd, f"{lp}.feed_forward.w_2"),
                },
                "conv": {
                    "pw1": {
                        "weight": _conv_w(sd[f"{lp}.conv_module.pointwise_conv1.weight"]),
                        "bias": sd[f"{lp}.conv_module.pointwise_conv1.bias"],
                    },
                    "dw": {
                        "weight": _conv_w(sd[f"{lp}.conv_module.depthwise_conv.weight"]),
                        "bias": sd[f"{lp}.conv_module.depthwise_conv.bias"],
                    },
                    "ln": _ln(sd, f"{lp}.conv_module.norm"),
                    "pw2": {
                        "weight": _conv_w(sd[f"{lp}.conv_module.pointwise_conv2.weight"]),
                        "bias": sd[f"{lp}.conv_module.pointwise_conv2.bias"],
                    },
                },
                "norm_mha": _ln(sd, f"{lp}.norm_mha"),
                "norm_ff": _ln(sd, f"{lp}.norm_ff"),
                "norm_conv": _ln(sd, f"{lp}.norm_conv"),
                "norm_final": _ln(sd, f"{lp}.norm_final"),
            }
        )
    params["layers"] = layers
    params["after_norm"] = _ln(sd, f"{pfx}.after_norm")
    # the checkpoint registers the sinusoidal PE table as a buffer
    # (conformer/embedding.py:44 self.pe, shape [1, max_len, d]); consume it
    # when present so the table is bit-identical to the reference's
    pe_key = f"{pfx}.embed.pos_enc.pe"
    if pe_key in sd:
        params["pe"] = sd[pe_key][0]
    else:
        from indextts_tpu.models.conformer import sinusoidal_pe

        params["pe"] = sinusoidal_pe(5000, cm.output_size)
    return params


def _convert_perceiver(sd: Dict[str, np.ndarray], cfg: GPTConfig) -> Dict[str, Any]:
    pfx = "perceiver_encoder"
    params: Dict[str, Any] = {"latents": sd[f"{pfx}.latents"], "norm_gamma": sd[f"{pfx}.norm.gamma"]}
    if f"{pfx}.proj_context.weight" in sd:
        params["proj_context"] = _linear(sd, f"{pfx}.proj_context")
    layers = []
    i = 0
    while f"{pfx}.layers.{i}.0.to_q.weight" in sd:
        layers.append(
            {
                "to_q": _linear(sd, f"{pfx}.layers.{i}.0.to_q", bias=False),
                "to_kv": _linear(sd, f"{pfx}.layers.{i}.0.to_kv", bias=False),
                "to_out": _linear(sd, f"{pfx}.layers.{i}.0.to_out", bias=False),
                "ff_in": _linear(sd, f"{pfx}.layers.{i}.1.0"),
                "ff_out": _linear(sd, f"{pfx}.layers.{i}.1.2"),
            }
        )
        i += 1
    params["layers"] = layers
    return params


def convert_unified_voice(sd: Dict[str, np.ndarray], cfg: GPTConfig) -> Dict[str, Any]:
    """UnifiedVoice state dict (gpt.pth) -> params tree for models/gpt.py."""
    params: Dict[str, Any] = {
        "text_embedding": sd["text_embedding.weight"],
        "mel_embedding": sd["mel_embedding.weight"],
        "text_pos_embedding": sd["text_pos_embedding.emb.weight"],
        "mel_pos_embedding": sd["mel_pos_embedding.emb.weight"],
        "gpt": {
            "blocks": convert_gpt2_blocks(sd, cfg.layers, prefix="gpt"),
            "ln_f": _ln(sd, "gpt.ln_f"),
        },
        "final_norm": _ln(sd, "final_norm"),
        "text_head": _linear(sd, "text_head"),
        "mel_head": _linear(sd, "mel_head"),
    }
    if cfg.condition_type in ("conformer_perceiver", "conformer_encoder"):
        params["conditioning_encoder"] = _convert_conformer(sd, cfg)
        if cfg.condition_type == "conformer_perceiver":
            params["perceiver_encoder"] = _convert_perceiver(sd, cfg)
    elif cfg.condition_type in ("perceiver", "default"):
        params["conditioning_encoder"] = _convert_legacy_conditioning(sd)
        if cfg.condition_type == "perceiver":
            params["perceiver_encoder"] = _convert_perceiver(sd, cfg)
    return params


def _convert_legacy_conditioning(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """AttentionBlock-stack ConditioningEncoder (model.py:210-234,
    arch_util.py:78-120). 1x1 convs become [Cin, Cout] matrices."""
    pfx = "conditioning_encoder"

    def conv1x1(prefix):
        return {"weight": np.ascontiguousarray(sd[f"{prefix}.weight"][:, :, 0].T), "bias": sd[f"{prefix}.bias"]}

    params: Dict[str, Any] = {"init": conv1x1(f"{pfx}.init"), "attn": []}
    i = 0
    while f"{pfx}.attn.{i}.qkv.weight" in sd:
        blk = {
            "norm": _ln(sd, f"{pfx}.attn.{i}.norm"),
            "qkv": conv1x1(f"{pfx}.attn.{i}.qkv"),
            "proj_out": conv1x1(f"{pfx}.attn.{i}.proj_out"),
        }
        rp_key = f"{pfx}.attn.{i}.relative_pos_embeddings.relative_attention_bias.weight"
        if rp_key in sd:
            blk["rel_pos"] = {"emb": sd[rp_key]}
        params["attn"].append(blk)
        i += 1
    return params


# ---------------------------------------------------------------------------
# ECAPA + BigVGAN
# ---------------------------------------------------------------------------


def _ecapa_tdnn_block(sd, prefix):
    return {"conv": _sb_conv(sd, f"{prefix}.conv"), "bn": _bn(sd, f"{prefix}.norm.norm")}


def _sb_conv(sd, prefix):
    """SpeechBrain Conv1d wrapper: actual conv under `.conv`."""
    return {"weight": _conv_w(sd[f"{prefix}.conv.weight"]), "bias": sd[f"{prefix}.conv.bias"]}


def convert_ecapa(sd: Dict[str, np.ndarray], prefix: str = "speaker_encoder") -> Dict[str, Any]:
    from indextts_tpu.models.ecapa import RES2NET_SCALE

    p: Dict[str, Any] = {"block0": _ecapa_tdnn_block(sd, f"{prefix}.blocks.0")}
    for i in range(1, 4):
        bp = f"{prefix}.blocks.{i}"
        p[f"block{i}"] = {
            "tdnn1": _ecapa_tdnn_block(sd, f"{bp}.tdnn1"),
            "res2net": [
                _ecapa_tdnn_block(sd, f"{bp}.res2net_block.blocks.{j}") for j in range(RES2NET_SCALE - 1)
            ],
            "tdnn2": _ecapa_tdnn_block(sd, f"{bp}.tdnn2"),
            "se_conv1": _sb_conv(sd, f"{bp}.se_block.conv1"),
            "se_conv2": _sb_conv(sd, f"{bp}.se_block.conv2"),
        }
    p["mfa"] = _ecapa_tdnn_block(sd, f"{prefix}.mfa")
    p["asp_tdnn"] = _ecapa_tdnn_block(sd, f"{prefix}.asp.tdnn")
    p["asp_conv"] = _sb_conv(sd, f"{prefix}.asp.conv")
    p["asp_bn"] = _bn(sd, f"{prefix}.asp_bn.norm")
    p["fc"] = _sb_conv(sd, f"{prefix}.fc")
    return p


def convert_bigvgan(sd: Dict[str, np.ndarray], h: BigVGANConfig) -> Dict[str, Any]:
    """BigVGAN generator state dict (bigvgan_generator.pth['generator']) ->
    params tree for models/bigvgan.py, with weight norm folded."""
    params: Dict[str, Any] = {
        "conv_pre": _folded_conv(sd, "conv_pre"),
        "ups": [],
        "resblocks": [],
        "conds": [],
        "activation_post": {"alpha": sd["activation_post.act.alpha"]},
        "conv_post": _folded_conv(sd, "conv_post"),
        "cond_layer": {"weight": _conv_w(sd["cond_layer.weight"]), "bias": sd["cond_layer.bias"]},
        "speaker_encoder": convert_ecapa(sd, "speaker_encoder"),
    }
    if "activation_post.act.beta" in sd:
        params["activation_post"]["beta"] = sd["activation_post.act.beta"]
    for i in range(len(h.upsample_rates)):
        params["ups"].append(_folded_conv(sd, f"ups.{i}.0"))
        if h.cond_d_vector_in_each_upsampling_layer:
            params["conds"].append(
                {"weight": _conv_w(sd[f"conds.{i}.weight"]), "bias": sd[f"conds.{i}.bias"]}
            )
    n_res = len(h.upsample_rates) * len(h.resblock_kernel_sizes)
    for n in range(n_res):
        rp = f"resblocks.{n}"
        if h.resblock == "1":
            n_convs = len(h.resblock_dilation_sizes[n % len(h.resblock_kernel_sizes)])
            block = {
                "convs1": [_folded_conv(sd, f"{rp}.convs1.{j}") for j in range(n_convs)],
                "convs2": [_folded_conv(sd, f"{rp}.convs2.{j}") for j in range(n_convs)],
                "acts": [],
            }
            n_acts = 2 * n_convs
        else:
            n_convs = len(h.resblock_dilation_sizes[n % len(h.resblock_kernel_sizes)])
            block = {"convs": [_folded_conv(sd, f"{rp}.convs.{j}") for j in range(n_convs)], "acts": []}
            n_acts = n_convs
        for j in range(n_acts):
            act = {"alpha": sd[f"{rp}.activations.{j}.act.alpha"]}
            if f"{rp}.activations.{j}.act.beta" in sd:
                act["beta"] = sd[f"{rp}.activations.{j}.act.beta"]
            block["acts"].append(act)
        params["resblocks"].append(block)
    return params


# ---------------------------------------------------------------------------
# DVAE
# ---------------------------------------------------------------------------


def convert_dvae(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """DiscreteVAE state dict (dvae.pth) -> params tree for models/dvae.py.

    Reference Sequential indices (xtts_dvae.py:251-291, positional_dims=1,
    use_transposed_convs=False): encoder = [L strided (conv,act) blocks] +
    [R ResBlocks] + [1x1 out conv]; decoder = [1x1 in conv (when R>0)] +
    [R ResBlocks] + [L (UpsampledConv,act) blocks] + [1x1 out conv].
    Codebook buffers embed/cluster_size/embed_avg (xtts_dvae.py:66-69).
    """
    L, R = cfg.num_layers, cfg.num_resnet_blocks

    def conv(prefix):
        return {"weight": _conv_w(sd[f"{prefix}.weight"]), "bias": sd[f"{prefix}.bias"]}

    def res(prefix):
        return {"conv0": conv(f"{prefix}.net.0"), "conv1": conv(f"{prefix}.net.2"), "conv2": conv(f"{prefix}.net.4")}

    dec_off = 1 if R > 0 else 0
    params: Dict[str, Any] = {
        "enc_convs": [conv(f"encoder.{i}.0") for i in range(L)],
        "enc_res": [res(f"encoder.{L + r}") for r in range(R)],
        "enc_out": conv(f"encoder.{L + R}"),
        "dec_res": [res(f"decoder.{dec_off + r}") for r in range(R)],
        "dec_convs": [conv(f"decoder.{dec_off + R + i}.0.conv") for i in range(L)],
        "dec_out": conv(f"decoder.{dec_off + R + L}"),
        "codebook": {
            "embed": sd["codebook.embed"],
            "cluster_size": sd["codebook.cluster_size"],
            "embed_avg": sd["codebook.embed_avg"],
        },
    }
    if R > 0:
        params["dec_in"] = conv("decoder.0")
    return params


# ---------------------------------------------------------------------------
# BigVGAN discriminators (bigvgan_discriminator.pth)
# ---------------------------------------------------------------------------


def _folded_conv2d(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Weight-normed torch Conv2d -> folded lax-layout conv params (same
    resolution chain as _folded_conv; only the transpose differs)."""
    out = {"weight": _conv2d_w(_wn_folded_weight(sd, prefix))}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def convert_discriminator(sd: Dict[str, Any], h: BigVGANConfig) -> Dict[str, Any]:
    """bigvgan_discriminator.pth -> {"mpd": ..., "mrd": ...} param trees for
    models/bigvgan.py's mpd_apply/mrd_apply.

    Accepts either the nested training-checkpoint layout
    ({"mpd": state_dict, "mrd": state_dict} — the upstream BigVGAN `do_*`
    convention) or a flat state dict with "mpd."/"mrd." key prefixes.
    Weight norm is folded at conversion (reference structure:
    /root/reference/indextts/BigVGAN/models.py:278-417 — DiscriminatorP
    convs are (K,1) weight-normed Conv2ds, DiscriminatorR convs are (3,9)
    / (3,3) Conv2ds over the magnitude STFT)."""
    if "mpd" in sd and isinstance(sd["mpd"], dict):
        flat: Dict[str, np.ndarray] = {}
        for mod in ("mpd", "mrd"):
            for k, v in sd[mod].items():
                flat[f"{mod}.{k}"] = np.asarray(v)
        sd = flat

    def one(mod, i):
        p = f"{mod}.discriminators.{i}"
        n_convs = len(
            [k for k in sd if k.startswith(f"{p}.convs.") and k.endswith(".bias")]
        )
        return {
            "convs": [_folded_conv2d(sd, f"{p}.convs.{j}") for j in range(n_convs)],
            "conv_post": _folded_conv2d(sd, f"{p}.conv_post"),
        }

    return {
        "mpd": {"discriminators": [one("mpd", i) for i in range(len(h.mpd_reshapes))]},
        "mrd": {"discriminators": [one("mrd", i) for i in range(len(h.resolutions))]},
    }


# ---------------------------------------------------------------------------
# npz caching
# ---------------------------------------------------------------------------


# empty containers get an explicit marker entry: silently dropping them
# would make the npz cache round-trip return a STRUCTURALLY different tree
# than the cold conversion (e.g. bigvgan params['conds'] == [] when
# cond_d_vector_in_each_upsampling_layer=False) — breaking tree_map against
# init-shaped trees and turning [] into a KeyError on warm start
_EMPTY_LIST_KEY = "__empty_list__"
_EMPTY_DICT_KEY = "__empty_dict__"


def flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        if not tree:
            out[f"{prefix}{_EMPTY_DICT_KEY}"] = np.zeros((), np.int8)
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        if not tree:
            out[f"{prefix}{_EMPTY_LIST_KEY}"] = np.zeros((), np.int8)
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys == [_EMPTY_LIST_KEY]:
            return []
        if keys == [_EMPTY_DICT_KEY]:
            return {}
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_params_npz(params: Any, path: str) -> None:
    np.savez(path, **flatten_tree(params))


def load_params_npz(path: str) -> Any:
    with np.load(path) as data:
        return unflatten_tree({k: data[k] for k in data.files})
