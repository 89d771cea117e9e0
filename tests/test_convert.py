"""Converter tests. The GPT-2 block mapping is validated numerically against
HF transformers' GPT2Model with inputs_embeds (the exact core the reference
wraps, model.py:253-274); tree flatten/unflatten round-trips are exact."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from indextts_tpu.convert import (
    convert_gpt2_blocks,
    flatten_tree,
    load_params_npz,
    save_params_npz,
    unflatten_tree,
)
from indextts_tpu.models.gpt import gpt2_apply


class TestGPT2Parity:
    def test_matches_hf_gpt2(self):
        torch = pytest.importorskip("torch")
        from transformers import GPT2Config, GPT2Model

        cfg = GPT2Config(
            vocab_size=32, n_positions=64, n_ctx=64, n_embd=32, n_layer=2, n_head=4, use_cache=False
        )
        model = GPT2Model(cfg).eval()
        with torch.no_grad():  # the reference nulls wpe (model.py:269-270)
            model.wpe.weight.zero_()
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        blocks = convert_gpt2_blocks({f"gpt.{k}": v for k, v in sd.items()}, layers=2, prefix="gpt")
        gpt_params = {
            "blocks": jax.tree_util.tree_map(jnp.asarray, blocks),
            "ln_f": {"weight": jnp.asarray(sd["ln_f.weight"]), "bias": jnp.asarray(sd["ln_f.bias"])},
        }
        rng = np.random.default_rng(0)
        emb = rng.standard_normal((2, 10, 32)).astype(np.float32)
        with torch.no_grad():
            gold = model(inputs_embeds=torch.from_numpy(emb)).last_hidden_state.numpy()
        mine = np.asarray(gpt2_apply(gpt_params, jnp.asarray(emb), heads=4))
        np.testing.assert_allclose(mine, gold, atol=2e-4, rtol=1e-3)

    def test_matches_hf_gpt2_with_attention_mask(self):
        torch = pytest.importorskip("torch")
        from transformers import GPT2Config, GPT2Model

        cfg = GPT2Config(vocab_size=32, n_positions=64, n_embd=32, n_layer=2, n_head=4, use_cache=False)
        model = GPT2Model(cfg).eval()
        with torch.no_grad():
            model.wpe.weight.zero_()
        sd = {f"gpt.{k}": v.detach().numpy() for k, v in model.state_dict().items()}
        blocks = convert_gpt2_blocks(sd, layers=2, prefix="gpt")
        gpt_params = {
            "blocks": jax.tree_util.tree_map(jnp.asarray, blocks),
            "ln_f": {"weight": jnp.asarray(sd["gpt.ln_f.weight"]), "bias": jnp.asarray(sd["gpt.ln_f.bias"])},
        }
        rng = np.random.default_rng(1)
        emb = rng.standard_normal((2, 8, 32)).astype(np.float32)
        mask = np.array([[0, 0, 1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 1, 1, 1, 1]], np.int64)
        with torch.no_grad():
            gold = model(
                inputs_embeds=torch.from_numpy(emb), attention_mask=torch.from_numpy(mask)
            ).last_hidden_state.numpy()
        mine = np.asarray(gpt2_apply(gpt_params, jnp.asarray(emb), heads=4, attention_mask=jnp.asarray(mask)))
        # compare only valid positions (masked positions are junk in both)
        np.testing.assert_allclose(mine[0, 2:], gold[0, 2:], atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(mine[1], gold[1], atol=2e-4, rtol=1e-3)


class TestTreeIO:
    def test_flatten_round_trip(self, tmp_path):
        tree = {
            "a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": [{"w": np.ones(4)}, {"w": np.zeros(4)}],
            "c": {"d": {"e": np.asarray(3.0)}},
        }
        flat = flatten_tree(tree)
        back = unflatten_tree(flat)
        assert isinstance(back["b"], list) and len(back["b"]) == 2
        np.testing.assert_array_equal(back["a"], tree["a"])
        np.testing.assert_array_equal(back["b"][1]["w"], tree["b"][1]["w"])
        path = str(tmp_path / "p.npz")
        save_params_npz(tree, path)
        loaded = load_params_npz(path)
        np.testing.assert_array_equal(loaded["c"]["d"]["e"], 3.0)

    def test_empty_containers_survive_round_trip(self, tmp_path):
        """The npz cache must return a STRUCTURALLY identical tree: bigvgan
        params carry 'conds': [] when per-layer conditioning is off, and a
        warm start that drops the key breaks tree_map against init trees."""
        tree = {
            "conds": [],
            "meta": {},
            "ups": [{"w": np.ones(2)}],
        }
        path = str(tmp_path / "e.npz")
        save_params_npz(tree, path)
        loaded = load_params_npz(path)
        assert loaded["conds"] == [] and isinstance(loaded["conds"], list)
        assert loaded["meta"] == {} and isinstance(loaded["meta"], dict)
        np.testing.assert_array_equal(loaded["ups"][0]["w"], tree["ups"][0]["w"])
        import jax

        jax.tree_util.tree_map(lambda a, b: None, tree, loaded)  # same structure


class TestTorchLoading:
    def test_missing_explicit_key_raises(self, tmp_path):
        torch = pytest.importorskip("torch")
        from indextts_tpu.convert import load_torch_state_dict

        p = str(tmp_path / "c.pth")
        torch.save({"other": {"w": torch.zeros(2)}}, p)
        with pytest.raises(KeyError, match="generator"):
            load_torch_state_dict(p, key="generator")

    def test_bf16_tensors_convert(self, tmp_path):
        torch = pytest.importorskip("torch")
        from indextts_tpu.convert import load_torch_state_dict

        p = str(tmp_path / "b.pth")
        torch.save({"w": torch.ones(3, dtype=torch.bfloat16)}, p)
        sd = load_torch_state_dict(p)
        np.testing.assert_array_equal(sd["w"], np.ones(3, np.float32))


class TestFidelityLoop:
    def test_eval_fidelity_runs_on_converted_weights(self, tmp_path, capsys):
        """End-to-end VERDICT #5 contract: when dvae.pth and
        bigvgan_discriminator.pth exist in --model_dir, the fidelity loop
        converts and uses them (no SystemExit, report names the files)."""
        pytest.importorskip("torch")
        import json
        import sys

        from tests.make_torch_ckpt import write_checkpoints
        from tests.test_engine import tiny_config

        out = str(tmp_path / "ckpt")
        write_checkpoints(tiny_config(), out)

        sys.path.insert(0, "/root/repo/tools")
        import eval_fidelity

        eval_fidelity.main([
            "--wav", "tests/sample_prompt.wav",
            "--model_dir", out,
            "--cfg", f"{out}/config.yaml",
        ])
        report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert report["dvae_weights"].endswith("dvae.pth")
        assert report["discriminator_weights"].endswith("bigvgan_discriminator.pth")
        assert np.isfinite(report["dvae_round_trip_mse"])
        assert np.isfinite(report["mpd_disc_loss"]) and np.isfinite(report["mrd_disc_loss"])
