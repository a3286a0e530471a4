"""BEAT/TWH sampling CLI (DiffuseStyleGesture / + / ++).

Usage (mirrors `BEAT-TWH-main/mydiffusion_beat_twh/sample.py:271-344`):
  python -m diffusestylegesture_tpu.cli.sample_beat --config configs/beat_twh.yml \
      --dataset TWH --name DiffuseStyleGesture+ --model_path model001200000.pt \
      --textaudio_npy features.npy --seed_gesture_npy seed.npy --speaker 5

Feature inputs are the precomputed text+audio npy path (the reference's
`audio_*.npy + text_*.npy` concat path, `sample.py:239-244`) or are built
live from wav+tsv with `data.beat_twh.build_beat_twh_clip` components.
"""
from __future__ import annotations

import argparse
import os
from datetime import datetime

import jax
import numpy as np

from .. import diffusion as D
from ..config import apply_beat_twh_derivations, load_yaml_config
from ..models import convert
from ..models.mdm_plus import MDMPlus, MDMPlusConfig
from ..sample import BeatEngineConfig, BeatTwhSampler, prepare_seed_gesture

VARIANTS = {
    "DiffuseStyleGesture": "attention3",
    "DiffuseStyleGesture+": "attention4",
    "DiffuseStyleGesture++": "attention5",
}


def main(argv=None):
    p = argparse.ArgumentParser(description="DiffuseStyleGesture+ TPU sampling")
    p.add_argument("--config", required=True)
    p.add_argument("--dataset", default=None)
    p.add_argument("--name", default=None)
    p.add_argument("--model_path", required=True)
    p.add_argument("--textaudio_npy", default=None,
                   help="precomputed fused text+audio features (T, A)")
    # live-feature path (ref `sample.py:248-266`): wav + aligned-word tsv
    p.add_argument("--wav", default=None)
    p.add_argument("--tsv", default=None)
    p.add_argument("--word_vectors", default=None,
                   help="fastText .vec file for the tsv words")
    p.add_argument("--wavlm_path", default=None,
                   help="WavLM .pt; zeros substituted when omitted")
    p.add_argument("--seed_gesture_npy", required=True,
                   help="(n_seed+2, motion_dim) raw reference clip")
    p.add_argument("--mean_npy", required=True)
    p.add_argument("--std_npy", required=True)
    p.add_argument("--speaker", type=int, default=0)
    p.add_argument("--max_len", type=int, default=0)
    p.add_argument("--seed", type=int, default=123456)
    p.add_argument("--serve_fast", action="store_true",
                   help="bf16 trunk + tanh-approx GELU serving mode")
    p.add_argument("--sampler", default="ddpm",
                   choices=["ddpm", "ddim", "plms", "dpmpp"],
                   help="reverse-process sampler (dpmpp = DPM-Solver++(2M))")
    p.add_argument("--respace", type=int, default=0,
                   help="respace the schedule to N timesteps for few-step serving")
    p.add_argument("--allow_degraded", action="store_true",
                   help="serve a fast mode even if the motion-quality "
                        "harness measured its FGD/diversity as degraded "
                        "beyond tolerance (see sample/quality_gate.py)")
    p.add_argument("--save_dir", default="./sample_dir")
    args = p.parse_args(argv)

    cfg = load_yaml_config(args.config, {"dataset": args.dataset, "name": args.name})
    cfg = apply_beat_twh_derivations(cfg)
    os.makedirs(args.save_dir, exist_ok=True)

    # motion-quality gate on fast serving modes, per dataset family
    # (harness-measured FGD/diversity vs the DDPM baseline for THIS
    # family's MDM+; `sample/quality_gate.py`) — checked BEFORE any model
    # loading/compilation so a refused mode costs nothing. Mirrors
    # `cli.sample`; the reference exposes the same fast-serving surface
    # for BEAT/TWH (`BEAT-TWH-main/mydiffusion_beat_twh/sample.py:44-201`)
    from ..sample.quality_gate import check_mode

    status, message = check_mode(
        args.sampler, args.respace, cfg.diffusion_steps,
        family=cfg.dataset.lower())
    if status == "degraded" and not args.allow_degraded:
        raise SystemExit(f"REFUSED: {message}")
    if status != "baseline":
        print(("note: " if status == "unknown" else "") + message)

    import dataclasses as _dc

    mcfg = MDMPlusConfig(
        njoints=cfg.njoints, latent_dim=cfg.latent_dim, n_seed=cfg.n_seed,
        cond_mode=cfg.cond_mode, cond_mask_prob=cfg.cond_mask_prob,
        source_audio_dim=cfg.audio_feature_dim,
        audio_feat_dim=cfg.audio_feat_dim_latent, style_dim_in=cfg.style_dim,
        moe_experts=cfg.get("moe_experts", 0),
    )
    if args.serve_fast:
        import jax.numpy as _jnp

        mcfg = _dc.replace(mcfg, dtype=_jnp.bfloat16, activation="gelu_tanh")
    if args.model_path.endswith(".pt"):
        sd = convert.load_torch_checkpoint(args.model_path)
        params = {"params": convert.convert_mdm_beat_twh(sd)}
    else:
        from .sample import load_orbax_params

        params = load_orbax_params(args.model_path)
    from .sample import resolve_moe_config

    mcfg = resolve_moe_config(mcfg, params)
    model = MDMPlus(mcfg)

    if args.serve_fast:
        import jax.numpy as _jnp

        params = jax.tree.map(
            lambda a: a.astype(_jnp.bfloat16)
            if getattr(a, "dtype", None) == _jnp.float32 else a, params)
    mean = np.load(args.mean_npy)
    std = np.load(args.std_npy)
    if args.textaudio_npy:
        textaudio = np.load(args.textaudio_npy)
    elif args.wav and args.tsv:
        # live features (ref `sample.py:248-266`): 1133-d audio + 301/302-d
        # aligned-text vectors, concatenated audio-first
        from ..data.beat_twh import load_audio_features
        from ..data.text import load_tsv, load_word_vectors
        from ..data.zeggs import load_wav_16k

        wav = load_wav_16k(args.wav)
        wavlm_feats = None
        if args.wavlm_path:
            import jax.numpy as jnp

            from ..models.wavlm import (
                WavLM,
                load_wavlm_checkpoint,
                make_twh_wavlm_fn,
            )

            wcfg, wparams = load_wavlm_checkpoint(args.wavlm_path)
            twh_fn = make_twh_wavlm_fn(WavLM(wcfg))
            wavlm_feats = np.asarray(twh_fn(wparams, jnp.asarray(wav)))
        audio_feats = load_audio_features(wav, 16000, wavlm_feats)
        w2v = load_word_vectors(args.word_vectors) if args.word_vectors else {}
        text = load_tsv(
            args.tsv, w2v, len(audio_feats),
            laughter_flag=(cfg.dataset == "TWH"),
        )
        textaudio = np.concatenate([audio_feats, text], axis=-1)
        assert textaudio.shape[1] == cfg.audio_feature_dim, (
            textaudio.shape, cfg.audio_feature_dim
        )
    else:
        raise SystemExit("provide --textaudio_npy or (--wav and --tsv)")
    seed_raw = np.load(args.seed_gesture_npy)[: cfg.n_seed + 2]
    seed = prepare_seed_gesture(seed_raw, mean, std)

    style = np.zeros(cfg.style_dim, np.float32)
    style[args.speaker] = 1.0

    betas = D.named_beta_schedule(cfg.get("noise_schedule", "cosine"), cfg.diffusion_steps)
    if args.respace:
        sched = D.spaced_schedule(
            betas, D.space_timesteps(cfg.diffusion_steps, f"ddim{args.respace}"))
    else:
        sched = D.Schedule.create(betas)

    def model_apply(params, x, t, cond, uncond=None):
        return model.apply(params, x, t, cond, uncond=uncond)

    sampler = BeatTwhSampler(
        model_apply, sched,
        BeatEngineConfig(
            n_poses=cfg.n_poses, n_seed=cfg.n_seed, njoints=cfg.njoints,
            audio_dim=cfg.audio_feature_dim, variant=VARIANTS[cfg.name],
            sampler=args.sampler,
        ),
    )
    kwargs = {}
    if VARIANTS[cfg.name] == "attention5":
        kwargs["seed_last"] = seed
    out = sampler.generate(
        params, textaudio, seed, style[None], jax.random.PRNGKey(args.seed),
        mean, std, max_len=args.max_len, **kwargs,
    )

    prefix = datetime.now().strftime("%Y%m%d_%H%M%S") + f"_spk{args.speaker}"
    npy_path = os.path.join(args.save_dir, prefix + "_motion.npy")
    np.save(npy_path, out[0])
    print("wrote", npy_path, out.shape)
    print(
        "convert to BVH with motion.pipeline.beat_features_to_bvh / "
        "twh_features_to_bvh using the pipeline fitted at data-prep time"
    )


if __name__ == "__main__":
    main()
