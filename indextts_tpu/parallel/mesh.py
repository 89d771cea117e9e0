"""Device-mesh and sharding rules for multi-chip execution.

The reference is strictly single-device (SURVEY.md §2.6: DeepSpeed wrap with
mp_size=1, vestigial HF parallelize hooks, one latent all_reduce in DVAE
training). The TPU design replaces all of that with jax.sharding over a
("data", "model") mesh: batch rows ride the data axis, the GPT matmuls are
tensor-parallel over the model axis, and XLA/GSPMD inserts the ICI
collectives. No hand-rolled comm layer exists anywhere in this stack.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    tp: Optional[int] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build a (data, model) mesh. tp defaults to min(2, n) so every dryrun
    exercises a real tensor-parallel split when more than one device exists."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    if len(devices) < n:
        raise ValueError(
            f"make_mesh needs {n} devices but only {len(devices)} are visible "
            f"({[d.platform for d in devices]}); for virtual multi-chip runs "
            f"bootstrap --xla_force_host_platform_device_count first "
            f"(see __graft_entry__._bootstrap_virtual_devices)"
        )
    devices = devices[:n]
    if tp is None:
        tp = 2 if n % 2 == 0 and n >= 2 else 1
    assert n % tp == 0, f"n_devices {n} not divisible by tp {tp}"
    arr = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(arr, axis_names)


def gpt_param_spec(path: Tuple[str, ...]) -> P:
    """Tensor-parallel PartitionSpec for a UnifiedVoice parameter, addressed
    by its pytree path. Megatron-style: qkv/mlp_fc column-parallel,
    attn_proj/mlp_proj row-parallel, everything else replicated (norms,
    embeddings, conditioning)."""
    name = "/".join(str(p) for p in path)
    if "attn_qkv/weight" in name or "mlp_fc/weight" in name:
        return P(None, None, "model")  # [L, D, 3D/4D] -> split output
    if "attn_qkv/bias" in name or "mlp_fc/bias" in name:
        return P(None, "model")
    if "attn_proj/weight" in name or "mlp_proj/weight" in name:
        return P(None, "model", None)  # [L, 4D/D, D] -> split input
    if name.endswith("mel_head/weight") or name.endswith("text_head/weight"):
        return P(None, "model")  # [D, V] -> split vocab
    if name.endswith("mel_head/bias") or name.endswith("text_head/bias"):
        return P("model")
    return P()


def _check_divisible(spec: P, shape: Tuple[int, ...], mesh: Mesh) -> P:
    """Fall back to replication when a sharded dim isn't divisible by the
    mesh axis (odd vocab sizes like number_mel_codes=8194 hit this)."""
    for dim, axis in enumerate(spec):
        if axis is None:
            continue
        size = mesh.shape[axis]
        if dim >= len(shape) or shape[dim] % size != 0:
            return P()
    return spec


def _path_str(path) -> Tuple[str, ...]:
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "idx"):
            out.append(str(p.idx))
        else:
            out.append(str(p))
    return tuple(out)


def shard_gpt_params(params: Any, mesh: Mesh) -> Any:
    """Place a UnifiedVoice param tree onto the mesh with TP shardings."""

    def place(path, x):
        spec = _check_divisible(gpt_param_spec(_path_str(path)), x.shape, mesh)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def gpt_param_shardings(params: Any, mesh: Mesh) -> Any:
    def spec_of(path, x):
        spec = _check_divisible(gpt_param_spec(_path_str(path)), x.shape, mesh)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_of, params)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def vocoder_sharding(mesh: Mesh) -> NamedSharding:
    """BigVGAN generator + ECAPA placement: REPLICATED, by design.

    The vocoder is ~56 MB of bf16 conv weights — 2% of the GPT — and its
    compute is 1-D convolutions whose natural parallel axis is the batch.
    Tensor-splitting conv channels would insert halo/all-gather collectives
    around every K=3..11 conv for negligible memory savings, so weights are
    replicated and multi-chip vocoding rides the DATA axis (each chip
    vocodes its own batch rows; see shard_batch). The conditioning stack
    (conformer/perceiver, inside the GPT tree) is replicated for the same
    reason via gpt_param_spec's default P()."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Place activation arrays batch-first onto the data axis (DP serving:
    batch rows split across chips, model weights replicated or TP-sharded).
    Arrays whose leading dim doesn't divide the data axis stay replicated."""
    dp = mesh.shape["data"]

    def place(x):
        nd = getattr(x, "ndim", 0)
        if nd >= 1 and x.shape[0] % dp == 0 and x.shape[0] > 0:
            return jax.device_put(x, data_sharding(mesh, nd))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(place, tree)
