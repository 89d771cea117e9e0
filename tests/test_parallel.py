"""Multi-device mesh/sharding tests on the virtual 8-CPU mesh: TP+DP sharded
train step compiles and runs, and TP-sharded inference matches unsharded."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from indextts_tpu.parallel.mesh import (
    data_sharding,
    gpt_param_shardings,
    make_mesh,
    shard_gpt_params,
)


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")
    mesh1 = make_mesh(1)
    assert mesh1.devices.shape == (1, 1)


def test_dryrun_multichip_entrypoint():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.ndim == 3


def test_tp_sharded_forward_matches_unsharded():
    from indextts_tpu.config import ConditionModuleConfig, GPTConfig
    from indextts_tpu.models.gpt import init_unified_voice, unified_voice_forward

    cfg = GPTConfig(
        layers=2, model_dim=64, heads=4, max_text_tokens=30, max_mel_tokens=48,
        number_text_tokens=50, number_mel_codes=66, start_mel_token=64, stop_mel_token=65,
        condition_num_latent=8, condition_type="conformer_perceiver",
        condition_module=ConditionModuleConfig(
            output_size=32, linear_units=64, attention_heads=4, num_blocks=1,
            input_layer="conv2d2", perceiver_mult=2,
        ),
    )
    params = init_unified_voice(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((4, 40, 100)).astype(np.float32))
    mel_lens = jnp.asarray([40, 40, 40, 40])
    text = jnp.asarray(rng.integers(2, 40, (4, 8)).astype(np.int32))
    text_lens = jnp.asarray([8, 6, 7, 8])
    codes = jnp.asarray(rng.integers(0, 60, (4, 12)).astype(np.int32))
    wav_lens = jnp.asarray([12 * 1024, 10 * 1024, 12 * 1024, 11 * 1024])

    def fn(p, mel, mel_lens, text, text_lens, codes, wav_lens):
        return unified_voice_forward(p, cfg, mel, text, text_lens, codes, wav_lens, mel_lens, return_latent=True)

    ref = jax.jit(fn)(params, mel, mel_lens, text, text_lens, codes, wav_lens)

    mesh = make_mesh(8)
    sharded_params = shard_gpt_params(params, mesh)
    shardings = gpt_param_shardings(params, mesh)
    sharded_fn = jax.jit(
        fn,
        in_shardings=(
            shardings,
            data_sharding(mesh, 3),
            data_sharding(mesh, 1),
            data_sharding(mesh, 2),
            data_sharding(mesh, 1),
            data_sharding(mesh, 2),
            data_sharding(mesh, 1),
        ),
    )
    args = (
        jax.device_put(mel, data_sharding(mesh, 3)),
        jax.device_put(mel_lens, data_sharding(mesh, 1)),
        jax.device_put(text, data_sharding(mesh, 2)),
        jax.device_put(text_lens, data_sharding(mesh, 1)),
        jax.device_put(codes, data_sharding(mesh, 2)),
        jax.device_put(wav_lens, data_sharding(mesh, 1)),
    )
    out = sharded_fn(sharded_params, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)
