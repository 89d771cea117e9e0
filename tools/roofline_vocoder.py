"""Analytical HBM/MXU roofline for the folded BigVGAN vocoder graph.

Enumerates every op of the round-3 phase-folded execution at the flagship
config (configs/indextts_1_5.yaml) and computes, per op group:
  - logical bf16 bytes (in + out),
  - physical bytes under the observed XLA:TPU layout (C-minor padded to 128
    lanes, B=8 sublanes exact, docs/PERF.md trace section),
  - MXU FLOPs with 128x128 tile padding,
  - the per-group time bound max(bytes/BW, flops/PEAK) on v5e
    (819 GB/s HBM, 197 bf16 TFLOP/s).

Pure host arithmetic — no jax. Prints a markdown table for docs/PERF.md and
the summed lower bound to compare against the measured ~425-475 ms/iter.

Run: python tools/roofline_vocoder.py [BATCH] [GEN_TOKENS]
"""

import math
import sys

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
CODES = int(sys.argv[2]) if len(sys.argv) > 2 else 200

HBM_GBS = 819e9
MXU_FLOPS = 197e12
LANE = 128

# flagship config
GPT_DIM = 1280
C0 = 1536
RATES = [4, 4, 2, 2, 2, 2]
KUPS = [8, 8, 4, 4, 4, 4]
RB_K = [3, 7, 11]
RB_D = [1, 3, 5]
FOLDED_MAX_C = 96

rows = []


def pad_lane(c):
    return max(LANE, math.ceil(c / LANE) * LANE)


def add(group, count, t, cin, cout, k, elementwise=False, fp32_out=False):
    """One op instance: [B, t, cin] -> [B, t, cout] conv with k taps (or
    elementwise when elementwise=True). count = instances per vocoder call."""
    bytes_log = B * t * (cin + cout) * 2
    out_b = 4 if fp32_out else 2
    bytes_phys = B * t * (pad_lane(cin) * 2 + pad_lane(cout) * out_b)
    flops = 0 if elementwise else 2 * B * t * pad_lane(cin) * pad_lane(cout) * k
    rows.append((group, count, bytes_log * count, bytes_phys * count, flops * count))


def stage_fold(c):
    s = 1
    while s * c < LANE:
        s *= 2
    return s


def folded_conv_taps(k, d, s):
    """Tap count of _fold_conv_scatter(k, d, s)."""
    k0 = (k - 1) // 2
    dts = [
        (r + (kk - k0) * d) // s for r in range(s) for kk in range(k)
    ]
    return max(dts) - min(dts) + 1


def folded_resample_taps(s, up):
    """Tap counts of _folded_up_kernel/_folded_down_kernel."""
    if up:
        dts = [(r // 2 + w - 3) // s for r in range(2 * s) for w in range(7)]
    else:
        dts = [(2 * r + j - 5) // (2 * s) for r in range(s) for j in range(12)]
    return max(dts) - min(dts) + 1


T0 = CODES * 4  # feat_upsample x4
add("interp_x4", 1, T0, GPT_DIM, GPT_DIM, 0, elementwise=True)
add("conv_pre", 1, T0, GPT_DIM, C0, 7)

t = T0
c = C0
for i, (r, ku) in enumerate(zip(RATES, KUPS)):
    cout = c // 2
    t_out = t * r
    # transposed conv: every input sample feeds ku outputs
    add(f"s{i} convT", 1, t, c, cout * r, ku // r)  # flops == 2*B*t*ku*c*cout
    c, t = cout, t_out
    s = stage_fold(c)
    n_pairs = len(RB_K) * len(RB_D)  # 9 (conv1, conv2) pairs per stage
    if c <= FOLDED_MAX_C and s > 1:
        n = t // s
        # per activation: up [sC->2sC], snake at 2sC, down [2sC->sC]
        n_acts = 2 * n_pairs
        add(f"s{i} fold up", n_acts, n, s * c, 2 * s * c, folded_resample_taps(s, True))
        add(f"s{i} fold snake", n_acts, n, 2 * s * c, 2 * s * c, 0, elementwise=True)
        add(f"s{i} fold down", n_acts, n, 2 * s * c, s * c, folded_resample_taps(s, False))
        for k in RB_K:
            for d in RB_D:
                add(f"s{i} fold conv", 1, n, s * c, s * c, folded_conv_taps(k, d, s))
                add(f"s{i} fold conv", 1, n, s * c, s * c, folded_conv_taps(k, 1, s))
    else:
        # composed path: up 2x (depthwise K=12 -> treat as elementwise-ish
        # memory op with depthwise FLOPs), snake at 2x (fp32 intermediate
        # observed in the round-2 trace), down 2x
        n_acts = 2 * n_pairs
        # depthwise flops are C*K not C^2*K; model as memory ops + dw flops
        dw_flops = 2 * B * (2 * t) * c * 12
        rows.append((f"s{i} comp up", n_acts, B * 3 * t * c * 2 * n_acts,
                     B * 3 * t * pad_lane(c) * 2 * n_acts, dw_flops * n_acts))
        add(f"s{i} comp snake", n_acts, 2 * t, c, c, 0, elementwise=True, fp32_out=True)
        rows.append((f"s{i} comp down", n_acts, B * 3 * t * c * 2 * n_acts,
                     B * 3 * t * pad_lane(c) * 2 * n_acts, dw_flops * n_acts))
        for k in RB_K:
            for d in RB_D:
                add(f"s{i} dense conv", 1, t, c, c, k)
                add(f"s{i} dense conv", 1, t, c, c, k)

# post activation (C=24 folded s=8) + conv_post
s = stage_fold(c)
n = t // s
add("post act up", 1, n, s * c, 2 * s * c, folded_resample_taps(s, True))
add("post act snake", 1, n, 2 * s * c, 2 * s * c, 0, elementwise=True)
add("post act down", 1, n, 2 * s * c, s * c, folded_resample_taps(s, False))
add("conv_post", 1, t, c, 1, 7)

# aggregate by group
agg = {}
for g, cnt, bl, bp, fl in rows:
    a = agg.setdefault(g, [0, 0, 0, 0])
    a[0] += cnt
    a[1] += bl
    a[2] += bp
    a[3] += fl

print(f"B={B} codes={CODES} -> samples={t} ({t/24000:.1f}s audio/row)")
print()
print("| op group | n | logical GB | padded GB | GFLOP | t_mem ms | t_mxu ms | bound ms |")
print("|---|---|---|---|---|---|---|---|")
tot_mem = tot_mxu = tot_bound = 0.0
for g, (cnt, bl, bp, fl) in agg.items():
    t_mem = bp / HBM_GBS * 1e3
    t_mxu = fl / MXU_FLOPS * 1e3
    bound = max(t_mem, t_mxu)
    tot_mem += t_mem
    tot_mxu += t_mxu
    tot_bound += bound
    print(f"| {g} | {cnt} | {bl/1e9:.2f} | {bp/1e9:.2f} | {fl/1e9:.0f} | "
          f"{t_mem:.2f} | {t_mxu:.2f} | {bound:.2f} |")
print(f"| **total** | | | | | {tot_mem:.1f} | {tot_mxu:.1f} | **{tot_bound:.1f}** |")
