"""Fidelity evaluation loop (BASELINE config #5): DVAE mel tokenize ->
detokenize round-trip error + BigVGAN discriminator forward scoring between a
reference waveform and a resynthesized one.

With real checkpoints (dvae.pth / bigvgan_discriminator.pth via --model_dir)
this reports the reference-comparable numbers; without them it runs on random
init so the loop itself stays exercised in CI-less environments.

Usage:
  python tools/eval_fidelity.py --wav tests/sample_prompt.wav [--model_dir checkpoints]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--wav", default="tests/sample_prompt.wav")
    parser.add_argument("--wav_hat", default=None, help="resynthesized wav (defaults to --wav)")
    parser.add_argument("--model_dir", default=None,
                        help="checkpoints dir with dvae.pth / bigvgan_discriminator.pth")
    parser.add_argument("--cfg", default=None,
                        help="config.yaml providing dvae/bigvgan sections (default: published scale)")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from indextts_tpu.config import BigVGANConfig, DVAEConfig
    from indextts_tpu.models.bigvgan import (
        discriminator_loss,
        feature_loss,
        init_mpd,
        init_mrd,
        mpd_apply,
        mrd_apply,
    )
    from indextts_tpu.models.dvae import dvae_infer, get_codebook_indices, init_dvae
    from indextts_tpu.utils.audio import load_audio
    from indextts_tpu.utils.mel import dvae_wav_to_mel

    wav = load_audio(args.wav, 22050)
    wav_hat = load_audio(args.wav_hat, 22050) if args.wav_hat else wav

    if args.cfg:
        from indextts_tpu.config import load_config

        eng_cfg = load_config(args.cfg)
        dvae_cfg, h = eng_cfg.dvae, eng_cfg.bigvgan
    else:
        dvae_cfg, h = DVAEConfig(), BigVGANConfig()

    # --- DVAE round-trip ---------------------------------------------------
    rng = jax.random.PRNGKey(0)
    dvae_weights = "random-init"
    dvae_path = args.model_dir and os.path.join(args.model_dir, "dvae.pth")
    if dvae_path and os.path.exists(dvae_path):
        from indextts_tpu.convert import convert_dvae, load_torch_state_dict

        dvae_params = jax.tree_util.tree_map(
            jnp.asarray, convert_dvae(load_torch_state_dict(dvae_path), dvae_cfg)
        )
        dvae_weights = dvae_path
    else:
        dvae_params = init_dvae(rng, dvae_cfg)
    mel = dvae_wav_to_mel(wav)  # [1, 80, T]
    mel_t = jnp.asarray(np.transpose(mel, (0, 2, 1)))  # [1, T, 80]
    t4 = (mel_t.shape[1] // 4) * 4
    mel_t = mel_t[:, :t4]
    codes = get_codebook_indices(dvae_params, dvae_cfg, mel_t)
    recon = dvae_infer(dvae_params, dvae_cfg, mel_t)
    rt_mse = float(jnp.mean((recon[:, : mel_t.shape[1]] - mel_t) ** 2))

    # --- discriminator scoring ---------------------------------------------
    n = min(wav.shape[1], wav_hat.shape[1], 24000)
    y = jnp.asarray(wav[:, :n])[..., None]  # [1, n, 1]
    y_hat = jnp.asarray(wav_hat[:, :n])[..., None]
    disc_weights = "random-init"
    disc_path = args.model_dir and os.path.join(args.model_dir, "bigvgan_discriminator.pth")
    if disc_path and os.path.exists(disc_path):
        from indextts_tpu.convert import convert_discriminator, load_torch_state_dict

        disc = jax.tree_util.tree_map(
            jnp.asarray, convert_discriminator(load_torch_state_dict(disc_path), h)
        )
        mpd, mrd = disc["mpd"], disc["mrd"]
        disc_weights = disc_path
    else:
        mpd = init_mpd(jax.random.fold_in(rng, 1), h)
        mrd = init_mrd(jax.random.fold_in(rng, 2), h)
    rs, gs, fr, fg = mpd_apply(mpd, h, y, y_hat)
    rs2, gs2, fr2, fg2 = mrd_apply(mrd, h, y, y_hat)
    d_mpd, _, _ = discriminator_loss(rs, gs)
    d_mrd, _, _ = discriminator_loss(rs2, gs2)
    f_mpd = feature_loss(fr, fg)
    f_mrd = feature_loss(fr2, fg2)

    report = {
        "dvae_round_trip_mse": round(rt_mse, 6),
        "dvae_codes_used": int(len(np.unique(np.asarray(codes)))),
        "mpd_disc_loss": round(float(d_mpd), 4),
        "mrd_disc_loss": round(float(d_mrd), 4),
        "mpd_feature_loss": round(float(f_mpd), 4),
        "mrd_feature_loss": round(float(f_mrd), 4),
        "dvae_weights": dvae_weights,
        "discriminator_weights": disc_weights,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
