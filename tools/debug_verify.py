"""Stagewise TPU-vs-CPU divergence diagnosis for the bench verify gate."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from indextts_tpu.config import BigVGANConfig, ConditionModuleConfig, GPTConfig
from indextts_tpu.models.bigvgan import bigvgan_apply, init_bigvgan
from indextts_tpu.models.gpt import get_conditioning, init_unified_voice, unified_voice_forward
from indextts_tpu.models.gpt_decode import GenerationConfig, generate_speech

gpt_cfg = GPTConfig(
    layers=2, model_dim=64, heads=4, max_text_tokens=60, max_mel_tokens=48,
    number_text_tokens=50, number_mel_codes=66, start_mel_token=64,
    stop_mel_token=65, condition_num_latent=8,
    condition_type="conformer_perceiver",
    condition_module=ConditionModuleConfig(
        output_size=32, linear_units=64, attention_heads=4, num_blocks=1,
        input_layer="conv2d2", perceiver_mult=2,
    ),
)
h = BigVGANConfig(
    gpt_dim=64, upsample_initial_channel=32, upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4), resblock="1", resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),), activation="snakebeta",
    snake_logscale=True, feat_upsample=True,
    cond_d_vector_in_each_upsampling_layer=True, num_mels=100,
    speaker_embedding_dim=32, sampling_rate=24000,
)
bf16 = jnp.bfloat16

cpu = jax.devices("cpu")[0]
# real random init on CPU, cast to bf16, pull to host
with jax.default_device(cpu):
    gpt_raw = init_unified_voice(jax.random.PRNGKey(0), gpt_cfg)
    bv_raw = init_bigvgan(jax.random.PRNGKey(1), h)
cast = lambda tree: jax.tree_util.tree_map(
    lambda x: np.asarray(x).astype(bf16) if np.issubdtype(np.asarray(x).dtype, np.floating) else np.asarray(x),
    tree,
)
gpt_np = cast(gpt_raw)
bv_np = cast(bv_raw)
npr = np.random.default_rng(42)
mel_np = npr.standard_normal((1, 40, 100)).astype(np.float32).astype(bf16)
text_np = npr.integers(2, 48, (2, 12)).astype(np.int32)
gen = GenerationConfig(do_sample=False, num_beams=1, max_new_tokens=24)


def run_on(device):
    put = lambda tree: jax.tree_util.tree_map(lambda x: jax.device_put(x, device), tree)
    gpt_p = put(gpt_np)
    bv_p = put(bv_np)
    mel = jax.device_put(mel_np, device)
    text = jax.device_put(text_np, device)
    lens = jax.device_put(np.asarray([12, 12], np.int32), device)
    conds = jax.jit(lambda p, m, l: get_conditioning(p, gpt_cfg, m, l))(
        gpt_p, mel, jax.device_put(np.asarray([40]), device)
    )
    conds_b = jnp.broadcast_to(conds, (2,) + conds.shape[1:])
    codes, code_lens = jax.jit(partial(generate_speech, cfg=gpt_cfg, gen=gen))(
        params=gpt_p, conds=conds_b, text_tokens=text, text_lengths=lens,
        rng=jax.device_put(jax.random.PRNGKey(3), device),
    )
    # fixed codes for latent/vocoder comparison (decouple from decode tokens)
    fixed_codes = jax.device_put(npr.integers(2, 60, (2, 24)).astype(np.int32), device)
    wl = jax.device_put(np.asarray([24 * 1024, 24 * 1024], np.int32), device)
    latent = jax.jit(
        lambda p, c, t, tl, mc, wl_: unified_voice_forward(
            p, gpt_cfg, None, t, tl, mc, wl_, None, return_latent=True, conds=c
        )
    )(gpt_p, conds_b, text, lens, fixed_codes, wl)
    wav = jax.jit(lambda p, lat, m: bigvgan_apply(p, h, lat, m))(
        bv_p, latent, jnp.broadcast_to(mel, (2,) + mel.shape[1:])
    )
    return {
        "conds": np.asarray(conds.astype(jnp.float32)),
        "codes": np.asarray(codes),
        "latent": np.asarray(latent.astype(jnp.float32)),
        "wav": np.asarray(wav.astype(jnp.float32)),
    }


# reset rng consumption identically per backend
state = npr.bit_generator.state
t = run_on(jax.devices()[0])
npr.bit_generator.state = state
c = run_on(cpu)
for k in ("conds", "latent", "wav"):
    d = np.max(np.abs(t[k] - c[k]))
    print(f"{k}: maxdiff={d:.5f} tpu_absmax={np.abs(t[k]).max():.4f} "
          f"tpu_nan={np.isnan(t[k]).any()} cpu_nan={np.isnan(c[k]).any()}")
eq = np.array_equal(t["codes"], c["codes"])
print("codes equal:", eq)
if not eq:
    mism = np.nonzero(t["codes"] != c["codes"])
    print("first mismatches:", list(zip(*[m[:5] for m in mism])))
    print("tpu codes row0:", t["codes"][0][:24])
    print("cpu codes row0:", c["codes"][0][:24])
