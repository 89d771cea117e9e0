"""Ops layer tests against torch/HF oracles (torch CPU is used only as a test
oracle; the framework's runtime path is pure JAX)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from indextts_tpu.ops.activations import gelu, gelu_new, glu, silu, snake, snake_beta  # noqa: E402
from indextts_tpu.ops.antialias import (  # noqa: E402
    anti_aliased_activation,
    downsample1d,
    kaiser_sinc_filter1d,
    upsample1d,
)
from indextts_tpu.ops.conv import (  # noqa: E402
    conv1d,
    conv2d,
    conv_transpose1d,
    pad1d,
    weight_norm_fold,
)
from indextts_tpu.ops.norms import batch_norm_inference, group_norm, layer_norm, rms_norm  # noqa: E402
from indextts_tpu.ops.sampling import (  # noqa: E402
    apply_repetition_penalty,
    apply_top_k,
    apply_top_p,
    apply_typical,
)

rng = np.random.default_rng(42)


def t2j_conv_w(w):
    return jnp.asarray(np.transpose(w, (2, 1, 0)))


class TestConv:
    @pytest.mark.parametrize(
        "cin,cout,k,s,p,d,g",
        [
            (8, 16, 3, 1, 1, 1, 1),
            (8, 16, 7, 1, 3, 1, 1),
            (8, 8, 3, 1, 3, 3, 1),
            (8, 8, 3, 2, 1, 1, 1),
            (6, 6, 5, 1, 2, 1, 6),
            (8, 4, 3, 1, 0, 1, 2),
            (8, 8, 11, 1, 25, 5, 1),
        ],
    )
    def test_conv1d_matches_torch(self, cin, cout, k, s, p, d, g):
        x = rng.standard_normal((2, 50, cin)).astype(np.float32)
        w = rng.standard_normal((cout, cin // g, k)).astype(np.float32)
        b = rng.standard_normal(cout).astype(np.float32)
        gold = (
            F.conv1d(torch.from_numpy(x).transpose(1, 2), torch.from_numpy(w), torch.from_numpy(b), s, p, d, g)
            .transpose(1, 2)
            .numpy()
        )
        mine = np.asarray(conv1d(jnp.asarray(x), t2j_conv_w(w), jnp.asarray(b), s, p, d, g))
        assert mine.shape == gold.shape
        np.testing.assert_allclose(mine, gold, atol=2e-4, rtol=1e-4)

    @pytest.mark.parametrize(
        "cin,cout,k,s,p,g",
        [(8, 4, 8, 4, 2, 1), (16, 8, 4, 2, 1, 1), (8, 8, 12, 2, 0, 8), (6, 12, 5, 1, 2, 1), (4, 4, 12, 2, 5, 4)],
    )
    def test_conv_transpose1d_matches_torch(self, cin, cout, k, s, p, g):
        x = rng.standard_normal((2, 30, cin)).astype(np.float32)
        w = rng.standard_normal((cin, cout // g, k)).astype(np.float32)
        b = rng.standard_normal(cout).astype(np.float32)
        gold = (
            F.conv_transpose1d(
                torch.from_numpy(x).transpose(1, 2), torch.from_numpy(w), torch.from_numpy(b), s, p, groups=g
            )
            .transpose(1, 2)
            .numpy()
        )
        mine = np.asarray(
            conv_transpose1d(jnp.asarray(x), t2j_conv_w(w), jnp.asarray(b), stride=s, padding=p, groups=g)
        )
        assert mine.shape == gold.shape
        np.testing.assert_allclose(mine, gold, atol=2e-4, rtol=1e-4)

    def test_conv2d_matches_torch(self):
        x = rng.standard_normal((2, 20, 100, 1)).astype(np.float32)
        w = rng.standard_normal((32, 1, 3, 3)).astype(np.float32)
        b = rng.standard_normal(32).astype(np.float32)
        gold = (
            F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w), torch.from_numpy(b), stride=2)
            .permute(0, 2, 3, 1)
            .numpy()
        )
        mine = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(np.transpose(w, (2, 3, 1, 0))), jnp.asarray(b), stride=2))
        np.testing.assert_allclose(mine, gold, atol=2e-4, rtol=1e-4)

    @pytest.mark.parametrize("mode", ["reflect", "replicate", "constant"])
    def test_pad_modes(self, mode):
        x = rng.standard_normal((1, 10, 3)).astype(np.float32)
        gold = F.pad(torch.from_numpy(x).transpose(1, 2), (2, 3), mode=mode).transpose(1, 2).numpy()
        mine = np.asarray(pad1d(jnp.asarray(x), (2, 3), mode=mode))
        np.testing.assert_allclose(mine, gold, atol=1e-6)

    def test_weight_norm_fold(self):
        conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(8, 16, 3))
        v = conv.weight_v.detach().numpy()
        g = conv.weight_g.detach().numpy()
        mine = weight_norm_fold(v, g)
        with torch.no_grad():
            gold = torch.nn.utils.remove_weight_norm(conv).weight.detach().numpy()
        np.testing.assert_allclose(mine, gold, atol=1e-6)


class TestActivations:
    def test_snake(self):
        x = rng.standard_normal((2, 7, 4)).astype(np.float32)
        alpha = rng.standard_normal(4).astype(np.float32)
        xt = torch.from_numpy(x)
        at = torch.from_numpy(alpha)
        gold = (xt + (1.0 / (at + 1e-9)) * torch.sin(xt * at) ** 2).numpy()
        mine = np.asarray(snake(jnp.asarray(x), jnp.asarray(alpha)))
        np.testing.assert_allclose(mine, gold, atol=1e-5)

    def test_snake_beta_logscale(self):
        x = rng.standard_normal((2, 7, 4)).astype(np.float32)
        alpha = rng.standard_normal(4).astype(np.float32)
        beta = rng.standard_normal(4).astype(np.float32)
        xt = torch.from_numpy(x)
        a = torch.exp(torch.from_numpy(alpha))
        b = torch.exp(torch.from_numpy(beta))
        gold = (xt + (1.0 / (b + 1e-9)) * torch.sin(xt * a) ** 2).numpy()
        mine = np.asarray(snake_beta(jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta), alpha_logscale=True))
        np.testing.assert_allclose(mine, gold, atol=1e-5)

    def test_approx_sin_accuracy(self):
        from indextts_tpu.ops.activations import approx_sin

        u = jnp.asarray(np.linspace(-50, 50, 200001), jnp.float32)
        err = float(jnp.abs(jnp.sin(u) - approx_sin(u)).max())
        assert err < 1e-4, err

    def test_bf16_snake_approx_below_quantization(self):
        """bf16 snake uses the polynomial sin by default; the result must be
        bit-comparable (within 1 bf16 ulp) to exact-sin bf16 snake."""
        x = jnp.asarray(rng.standard_normal((4, 256, 8)), jnp.bfloat16)
        alpha = jnp.asarray(rng.standard_normal(8), jnp.float32)
        beta = jnp.asarray(rng.standard_normal(8), jnp.float32)
        approx = snake_beta(x, alpha, beta, alpha_logscale=True)  # default: approx for bf16
        exact = snake_beta(x, alpha, beta, alpha_logscale=True, approx_sin_=False)
        d = np.abs(approx.astype(jnp.float32) - exact.astype(jnp.float32))
        scale = np.abs(np.asarray(exact.astype(jnp.float32))) + 1.0
        assert float((d / scale).max()) < 2 ** -7  # <= 2 bf16 ulps

    def test_fp32_snake_stays_exact(self):
        x = jnp.asarray(rng.standard_normal((2, 64, 4)), jnp.float32)
        alpha = jnp.asarray(rng.standard_normal(4), jnp.float32)
        a = snake(x, alpha)
        b = snake(x, alpha, approx_sin_=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_gelus(self):
        x = rng.standard_normal((32,)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(gelu_new(jnp.asarray(x))),
            F.gelu(torch.from_numpy(x), approximate="tanh").numpy(),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(gelu(jnp.asarray(x))), F.gelu(torch.from_numpy(x)).numpy(), atol=1e-5
        )

    def test_silu_glu(self):
        x = rng.standard_normal((2, 6)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(silu(jnp.asarray(x))), F.silu(torch.from_numpy(x)).numpy(), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(glu(jnp.asarray(x))), F.glu(torch.from_numpy(x), dim=-1).numpy(), atol=1e-6
        )


class TestNorms:
    def test_layer_norm(self):
        x = rng.standard_normal((2, 5, 16)).astype(np.float32)
        g = rng.standard_normal(16).astype(np.float32)
        b = rng.standard_normal(16).astype(np.float32)
        gold = F.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(g), torch.from_numpy(b)).numpy()
        mine = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b)))
        np.testing.assert_allclose(mine, gold, atol=1e-5)

    def test_group_norm(self):
        # torch GroupNorm operates on [B, C, T]; ours on [B, T, C]
        x = rng.standard_normal((2, 12, 32)).astype(np.float32)  # [B, T, C]
        g = rng.standard_normal(32).astype(np.float32)
        b = rng.standard_normal(32).astype(np.float32)
        gold = (
            F.group_norm(torch.from_numpy(x).transpose(1, 2), 8, torch.from_numpy(g), torch.from_numpy(b))
            .transpose(1, 2)
            .numpy()
        )
        mine = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b), num_groups=8))
        np.testing.assert_allclose(mine, gold, atol=1e-4)

    def test_rms_norm(self):
        x = rng.standard_normal((2, 5, 16)).astype(np.float32)
        g = rng.standard_normal(16).astype(np.float32)
        xt = torch.from_numpy(x)
        gold = (F.normalize(xt, dim=-1) * (16**0.5) * torch.from_numpy(g)).numpy()
        mine = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(g), scale=16**0.5))
        np.testing.assert_allclose(mine, gold, atol=1e-5)

    def test_batch_norm_inference(self):
        x = rng.standard_normal((2, 5, 16)).astype(np.float32)
        bn = torch.nn.BatchNorm1d(16).eval()
        with torch.no_grad():
            bn.running_mean.copy_(torch.from_numpy(rng.standard_normal(16).astype(np.float32)))
            bn.running_var.copy_(torch.from_numpy(rng.uniform(0.5, 2, 16).astype(np.float32)))
            bn.weight.copy_(torch.from_numpy(rng.standard_normal(16).astype(np.float32)))
            bn.bias.copy_(torch.from_numpy(rng.standard_normal(16).astype(np.float32)))
            gold = bn(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).numpy()
        mine = np.asarray(
            batch_norm_inference(
                jnp.asarray(x),
                jnp.asarray(bn.weight.detach().numpy()),
                jnp.asarray(bn.bias.detach().numpy()),
                jnp.asarray(bn.running_mean.numpy()),
                jnp.asarray(bn.running_var.numpy()),
            )
        )
        np.testing.assert_allclose(mine, gold, atol=1e-4)


def _torch_kaiser_sinc(cutoff, half_width, kernel_size):
    """Reference filter design in torch (filter.py:29-58 math)."""
    import math

    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if A > 50.0:
        beta = 0.1102 * (A - 8.7)
    elif A >= 21.0:
        beta = 0.5842 * (A - 21) ** 0.4 + 0.07886 * (A - 21.0)
    else:
        beta = 0.0
    window = torch.kaiser_window(kernel_size, beta=beta, periodic=False)
    if even:
        time = torch.arange(-half_size, half_size) + 0.5
    else:
        time = torch.arange(kernel_size) - half_size
    filt = 2 * cutoff * window * torch.sinc(2 * cutoff * time)
    filt = filt / filt.sum()
    return filt


class TestAntiAlias:
    def test_filter_matches_torch_design(self):
        mine = kaiser_sinc_filter1d(0.25, 0.3, 12)
        gold = _torch_kaiser_sinc(0.25, 0.3, 12).numpy()
        np.testing.assert_allclose(mine, gold, atol=1e-6)

    def test_upsample_matches_torch_pipeline(self):
        # reference resample.py:10-33 math reproduced with torch primitives
        x = rng.standard_normal((2, 40, 3)).astype(np.float32)
        xt = torch.from_numpy(x).transpose(1, 2)  # [B, C, T]
        filt = _torch_kaiser_sinc(0.25, 0.3, 12).view(1, 1, 12)
        C = 3
        pad, stride, k = 12 // 2 - 1, 2, 12
        pad_left = pad * stride + (k - stride) // 2
        pad_right = pad * stride + (k - stride + 1) // 2
        xp = F.pad(xt, (pad, pad), mode="replicate")
        y = 2 * F.conv_transpose1d(xp, filt.expand(C, -1, -1), stride=stride, groups=C)
        gold = y[..., pad_left:-pad_right].transpose(1, 2).numpy()
        mine = np.asarray(upsample1d(jnp.asarray(x), 2, 12))
        assert mine.shape == gold.shape == (2, 80, 3)
        np.testing.assert_allclose(mine, gold, atol=1e-4)

    def test_downsample_matches_torch_pipeline(self):
        x = rng.standard_normal((2, 80, 3)).astype(np.float32)
        xt = torch.from_numpy(x).transpose(1, 2)
        filt = _torch_kaiser_sinc(0.25, 0.3, 12).view(1, 1, 12)
        xp = F.pad(xt, (12 // 2 - 1, 12 // 2), mode="replicate")
        gold = F.conv1d(xp, filt.expand(3, -1, -1), stride=2, groups=3).transpose(1, 2).numpy()
        mine = np.asarray(downsample1d(jnp.asarray(x), 2, 12))
        assert mine.shape == gold.shape == (2, 40, 3)
        np.testing.assert_allclose(mine, gold, atol=1e-4)

    def test_round_trip_preserves_band_limited_signal(self):
        t = np.arange(256) / 256
        sig = np.sin(2 * np.pi * 8 * t).astype(np.float32)[None, :, None]
        up = upsample1d(jnp.asarray(sig), 2, 12)
        down = downsample1d(up, 2, 12)
        # interior should round-trip closely for a low-frequency tone
        np.testing.assert_allclose(np.asarray(down)[0, 20:-20, 0], sig[0, 20:-20, 0], atol=2e-3)

    def test_activation_shape(self):
        x = rng.standard_normal((1, 64, 8)).astype(np.float32)
        a = np.zeros(8, dtype=np.float32)
        b = np.zeros(8, dtype=np.float32)
        y = anti_aliased_activation(jnp.asarray(x), jnp.asarray(a), jnp.asarray(b), alpha_logscale=True)
        assert y.shape == x.shape


class TestFoldedAntiAlias:
    """The phase-folded reformulation ([B,T,2C] stride-1 dense convs) must be
    numerically identical to the composed path it replaces on narrow stages."""

    @pytest.mark.parametrize("s", [1, 2, 4, 8])
    @pytest.mark.parametrize("b,t,c", [(2, 64, 5), (1, 8, 3), (3, 32, 24), (1, 128, 1)])
    def test_upsample_folded_matches_composed(self, b, t, c, s):
        from indextts_tpu.ops.antialias import fold_time, unfold_time, upsample1d_folded

        if t % s:
            pytest.skip("fold must divide T")
        x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
        gold = np.asarray(upsample1d(x, 2, 12))
        mine = np.asarray(unfold_time(upsample1d_folded(fold_time(x, s), s, c), 2 * s))
        np.testing.assert_allclose(mine, gold, atol=2e-6)

    @pytest.mark.parametrize("s", [1, 2, 4, 8])
    @pytest.mark.parametrize("b,t,c", [(2, 64, 5), (1, 8, 3), (3, 32, 24)])
    def test_downsample_folded_matches_composed(self, b, t, c, s):
        from indextts_tpu.ops.antialias import downsample1d_folded, fold_time, unfold_time

        y2 = jnp.asarray(rng.standard_normal((b, 2 * t, c)).astype(np.float32))
        gold = np.asarray(downsample1d(y2, 2, 12))
        mine = np.asarray(unfold_time(downsample1d_folded(fold_time(y2, 2 * s), s, c), s))
        np.testing.assert_allclose(mine, gold, atol=2e-6)

    @pytest.mark.parametrize("s", [1, 2, 8])
    @pytest.mark.parametrize("logscale", [True, False])
    @pytest.mark.parametrize("with_beta", [True, False])
    def test_activation_folded_matches_composed(self, logscale, with_beta, s):
        from indextts_tpu.ops.antialias import anti_aliased_activation_folded

        x = jnp.asarray(rng.standard_normal((2, 48, 7)).astype(np.float32))
        a = jnp.asarray(rng.standard_normal(7).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(7).astype(np.float32)) if with_beta else None
        gold = np.asarray(anti_aliased_activation(x, a, b, alpha_logscale=logscale))
        mine = np.asarray(anti_aliased_activation_folded(x, a, b, alpha_logscale=logscale, s=s))
        np.testing.assert_allclose(mine, gold, atol=1e-5)

    @pytest.mark.parametrize("s", [2, 4, 8])
    @pytest.mark.parametrize("k,d", [(3, 1), (7, 3), (11, 5)])
    def test_conv_same_folded_matches_unfolded(self, k, d, s):
        from indextts_tpu.ops.antialias import conv1d_same_folded, fold_time, unfold_time

        x = jnp.asarray(rng.standard_normal((2, 64, 6)).astype(np.float32))
        w = jnp.asarray((0.1 * rng.standard_normal((k, 6, 6))).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(6).astype(np.float32))
        gold = np.asarray(conv1d(x, w, b, padding=d * (k - 1) // 2, dilation=d))
        mine = np.asarray(unfold_time(conv1d_same_folded(fold_time(x, s), w, b, dilation=d, s=s), s))
        np.testing.assert_allclose(mine, gold, atol=2e-6)


class TestSampling:
    def test_beam_sampling_keeps_two_tokens(self):
        """HF builds top-k/top-p warpers with min_tokens_to_keep=2 when
        num_beams>1 (beam_sample needs >=2 live candidates per beam). A
        rep-penalty-peaked distribution under top_p=0.5 must leave >=2
        survivors for beams, exactly 1 for single-row sampling."""
        from indextts_tpu.ops.sampling import process_logits

        logits = jnp.asarray([[10.0, 0.0, -1.0, -2.0]])
        for top_k in (0, 30):
            out = np.asarray(process_logits(
                logits, do_sample=True, top_p=jnp.float32(0.5),
                num_beams=3, top_k=top_k))
            assert (out > -1e29).sum() >= 2, top_k
        out1 = np.asarray(process_logits(
            logits, do_sample=True, top_p=jnp.float32(0.5), num_beams=1, top_k=0))
        assert (out1 > -1e29).sum() == 1

    def test_top_k_matches_hf(self):
        from transformers.generation.logits_process import TopKLogitsWarper

        logits = rng.standard_normal((3, 50)).astype(np.float32)
        gold = TopKLogitsWarper(top_k=10)(None, torch.from_numpy(logits)).numpy()
        mine = np.asarray(apply_top_k(jnp.asarray(logits), 10))
        np.testing.assert_array_equal(np.isinf(gold) | (gold < -1e29), np.asarray(mine < -1e29))
        kept = ~(gold < -1e29)
        np.testing.assert_allclose(np.where(kept, mine, 0), np.where(kept, gold, 0), atol=1e-6)

    def test_top_p_matches_hf(self):
        from transformers.generation.logits_process import TopPLogitsWarper

        logits = rng.standard_normal((4, 50)).astype(np.float32) * 3
        gold = TopPLogitsWarper(top_p=0.8)(None, torch.from_numpy(logits)).numpy()
        mine = np.asarray(apply_top_p(jnp.asarray(logits), 0.8))
        np.testing.assert_array_equal(gold < -1e29, np.asarray(mine < -1e29))

    def test_repetition_penalty_matches_hf(self):
        from transformers.generation.logits_process import RepetitionPenaltyLogitsProcessor

        logits = rng.standard_normal((2, 20)).astype(np.float32)
        input_ids = torch.tensor([[1, 3, 3, 5], [2, 4, 6, 8]])
        gold = RepetitionPenaltyLogitsProcessor(10.0)(input_ids, torch.from_numpy(logits)).numpy()
        seen = np.zeros((2, 20), dtype=bool)
        for b in range(2):
            seen[b, input_ids[b].numpy()] = True
        mine = np.asarray(apply_repetition_penalty(jnp.asarray(logits), jnp.asarray(seen), 10.0))
        np.testing.assert_allclose(mine, gold, atol=1e-5)

    def test_typical_matches_reference_math(self):
        # reference implementation math (typical_sampling.py:4-30) in torch
        logits = rng.standard_normal((3, 30)).astype(np.float32) * 2
        scores = torch.from_numpy(logits)
        normalized = torch.nn.functional.log_softmax(scores, dim=-1)
        p = torch.exp(normalized)
        ent = -(normalized * p).nansum(-1, keepdim=True)
        shifted_scores = torch.abs((-normalized) - ent)
        sorted_scores, sorted_indices = torch.sort(shifted_scores, descending=False)
        sorted_logits = scores.gather(-1, sorted_indices)
        cumulative_probs = sorted_logits.softmax(dim=-1).cumsum(dim=-1)
        last_ind = (cumulative_probs < 0.9).sum(dim=1)
        last_ind[last_ind < 0] = 0
        sorted_indices_to_remove = sorted_scores > sorted_scores.gather(1, last_ind.view(-1, 1))
        indices_to_remove = sorted_indices_to_remove.scatter(1, sorted_indices, sorted_indices_to_remove)
        gold_removed = indices_to_remove.numpy()
        mine = np.asarray(apply_typical(jnp.asarray(logits), 0.9))
        np.testing.assert_array_equal(mine < -1e29, gold_removed)


def test_fused_top_k_top_p_exact():
    """apply_top_k_top_p == apply_top_p(apply_top_k(.)) bit-for-bit,
    INCLUDING ties at the k-th boundary (apply_top_k's `logits < kth` mask
    keeps every tied copy, enlarging the softmax support — the fused form
    must reproduce that, not take exactly k values)."""
    from indextts_tpu.ops.sampling import apply_top_k, apply_top_k_top_p, apply_top_p

    # the boundary-tie counterexample: both 5s survive top_k=2, so the
    # composed path keeps all three tokens at top_p=0.99
    x = jnp.asarray([[10.0, 5.0, 5.0]])
    np.testing.assert_array_equal(
        np.asarray(apply_top_p(apply_top_k(x, 2), 0.99)),
        np.asarray(apply_top_k_top_p(x, 2, 0.99)),
    )

    rng = np.random.default_rng(42)
    for trial in range(20):
        b, v = int(rng.integers(1, 5)), int(rng.integers(40, 300))
        k = int(rng.integers(1, 35))
        p = float(rng.uniform(0.05, 1.0))
        x = rng.standard_normal((b, v)) * 3
        if trial % 2:  # quantize to force ties, incl. at the k-th boundary
            x = np.round(x * 2) / 2
        xj = jnp.asarray(x.astype(np.float32))
        gold = apply_top_p(apply_top_k(xj, k), p)
        np.testing.assert_array_equal(np.asarray(gold), np.asarray(apply_top_k_top_p(xj, k, p)))
    ties = jnp.zeros((2, 50), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(apply_top_p(apply_top_k(ties, 5), 0.5)),
        np.asarray(apply_top_k_top_p(ties, 5, 0.5)),
    )


class TestPhaseSpaceAntiAlias:
    """anti_aliased_activation_phase: whole-activation polyphase form with NO
    2x interleave (snake commutes with the interleave). Exact vs composed."""

    @pytest.mark.parametrize("logscale", [True, False])
    @pytest.mark.parametrize("with_beta", [True, False])
    def test_matches_composed(self, logscale, with_beta):
        from indextts_tpu.ops.antialias import anti_aliased_activation_phase

        x = jnp.asarray(rng.standard_normal((2, 48, 7)).astype(np.float32))
        a = jnp.asarray(rng.standard_normal(7).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(7).astype(np.float32)) if with_beta else None
        gold = np.asarray(anti_aliased_activation(x, a, b, alpha_logscale=logscale))
        mine = np.asarray(anti_aliased_activation_phase(x, a, b, alpha_logscale=logscale))
        np.testing.assert_allclose(mine, gold, atol=1e-5)

    def test_matches_composed_wide_short(self):
        from indextts_tpu.ops.antialias import anti_aliased_activation_phase

        x = jnp.asarray(rng.standard_normal((1, 16, 192)).astype(np.float32))
        a = jnp.asarray(rng.standard_normal(192).astype(np.float32))
        gold = np.asarray(anti_aliased_activation(x, a, None, alpha_logscale=True))
        mine = np.asarray(anti_aliased_activation_phase(x, a, None, alpha_logscale=True))
        np.testing.assert_allclose(mine, gold, atol=1e-5)


class TestPerRowSamplingParams:
    """Per-row sampling parameter vectors (continuous batching): a [B]
    parameter vector must act on each row exactly as that row's scalar —
    pinned per transform and through the full process_logits stack."""

    def _logits(self, b=4, v=64, seed=0):
        return jnp.asarray(np.random.default_rng(seed).standard_normal((b, v)).astype(np.float32))

    def test_each_transform_matches_rowwise_scalar(self):
        from indextts_tpu.ops.sampling import (
            apply_repetition_penalty, apply_temperature, apply_top_k_top_p,
            apply_top_p, apply_typical,
        )

        lf = self._logits()
        b = lf.shape[0]
        seen = jnp.asarray(np.random.default_rng(1).random((b, lf.shape[1])) < 0.3)
        vecs = {
            "temperature": np.asarray([0.5, 1.0, 1.5, 2.0], np.float32),
            "penalty": np.asarray([1.0, 2.0, 5.0, 10.0], np.float32),
            "top_p": np.asarray([0.5, 0.8, 0.95, 1.0], np.float32),
            "mass": np.asarray([0.5, 0.8, 0.9, 0.99], np.float32),
        }
        cases = [
            (lambda p: apply_temperature(lf, p), "temperature"),
            (lambda p: apply_repetition_penalty(lf, seen, p), "penalty"),
            (lambda p: apply_top_p(lf, p), "top_p"),
            (lambda p: apply_top_k_top_p(lf, 8, p), "top_p"),
            (lambda p: apply_typical(lf, p), "mass"),
        ]
        for fn, name in cases:
            vec = vecs[name]
            batched = np.asarray(fn(jnp.asarray(vec)))
            for i in range(b):
                solo = np.asarray(fn(float(vec[i])))
                np.testing.assert_allclose(batched[i], solo[i], atol=1e-6,
                                           err_msg=f"{name} row {i}")

    def test_process_logits_stack_per_row(self):
        from indextts_tpu.ops.sampling import process_logits

        lf = self._logits(seed=2)
        b = lf.shape[0]
        seen = jnp.asarray(np.random.default_rng(3).random((b, lf.shape[1])) < 0.2)
        temp = np.asarray([0.7, 1.0, 1.2, 0.9], np.float32)
        topp = np.asarray([0.6, 0.8, 0.9, 1.0], np.float32)
        pen = np.asarray([1.0, 4.0, 8.0, 10.0], np.float32)
        batched = np.asarray(process_logits(
            lf, seen_mask=seen, repetition_penalty=jnp.asarray(pen),
            temperature=jnp.asarray(temp), top_k=10, top_p=jnp.asarray(topp),
            do_sample=True,
        ))
        for i in range(b):
            solo = np.asarray(process_logits(
                lf, seen_mask=seen, repetition_penalty=float(pen[i]),
                temperature=float(temp[i]), top_k=10, top_p=float(topp[i]),
                do_sample=True,
            ))
            np.testing.assert_allclose(batched[i], solo[i], atol=1e-6)
