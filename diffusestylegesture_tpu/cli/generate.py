"""Text-to-motion generation CLI (MDM-legacy product path).

Mirrors `main/sample/generate.py:22-216` semantics: raw text prompts
(--text_prompt / --input_text) -> frozen CLIP text features ->
classifier-free-guided p_sample_loop over the TextMDM denoiser ->
inverse z-normalization -> `recover_from_ric` joint positions ->
`results.npy` ({'motion' (N, J, 3, T), 'text', 'lengths', 'num_samples',
'num_repetitions'}) + `results.txt`, exactly the reference's output
contract (`generate.py:139-175`). The reference's follow-on mp4 plotting
(`plot_3d_motion`) is visualization, covered by `motion/viz.py`.

TPU-first: all repetitions stack into ONE batched jitted sampling program
(the reference loops `num_repetitions` sequential p_sample_loops); CFG
runs cond+uncond as a doubled batch through the shared
`make_cfg_model_fn` (`main/model/cfg_sampler.py:8-31` semantics).

Usage:
  python -m diffusestylegesture_tpu.cli.generate \
      --model_path save/t2m --text_prompt "a person walks forward" \
      [--motion_length 6.0 --guidance_param 2.5 --num_repetitions 3]
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import diffusion as D
from ..diffusion.sampling import SamplerConfig, make_cfg_model_fn, p_sample_loop
from ..models.clip_text import make_caption_encoder
from ..models.mdm_text import TextMDM, TextMDMConfig
from ..motion.humanml import recover_from_ric
from .sample import load_orbax_params


def main(argv=None):
    p = argparse.ArgumentParser(description="MDM text-to-motion generation")
    p.add_argument("--model_path", required=True,
                   help="train_t2m save_dir (t2m_config.json + orbax steps)")
    p.add_argument("--output_dir", default="")
    p.add_argument("--text_prompt", default="")
    p.add_argument("--input_text", default="",
                   help="file with one prompt per line")
    p.add_argument("--num_samples", type=int, default=10,
                   help="with neither --text_prompt nor --input_text: "
                        "number of unconditioned-prompt samples is not "
                        "supported here — prompts are required (the "
                        "reference's dataset-driven default needs the "
                        "HumanML3D test split)")
    p.add_argument("--num_repetitions", type=int, default=3)
    p.add_argument("--motion_length", type=float, default=6.0,
                   help="seconds (capped at num_frames/fps like the "
                        "reference's 9.8 s)")
    p.add_argument("--guidance_param", type=float, default=2.5)
    p.add_argument("--seed", type=int, default=10)
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--sampler", default="ddpm",
                   choices=["ddpm", "ddim", "plms", "dpmpp"])
    p.add_argument("--respace", type=int, default=0)
    p.add_argument("--save_feats", action="store_true",
                   help="also dump the de-normalized hml_vec features "
                        "(results_feats.npy) — the representation the T2M "
                        "evaluators embed (`eval/t2m_evaluator.py`)")
    args = p.parse_args(argv)

    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    with open(os.path.join(args.model_path, "t2m_config.json")) as f:
        cfg = json.load(f)

    if args.text_prompt:
        texts = [args.text_prompt]
    elif args.input_text:
        with open(args.input_text) as f:
            texts = [ln.strip() for ln in f if ln.strip()]
    else:
        raise SystemExit("pass --text_prompt or --input_text")
    num_samples = len(texts)

    fps = float(cfg["fps"])
    max_frames = int(cfg["num_frames"])
    n_frames = min(max_frames, int(args.motion_length * fps))

    encode, _ = make_caption_encoder(
        cfg["clip"]["params_path"], seed=cfg["clip"]["seed"],
        width=cfg["clip"]["width"], layers=cfg["clip"]["layers"],
        heads=cfg["clip"]["heads"], vocab_size=cfg["clip"]["vocab_size"],
        projection_dim=cfg["clip"]["projection_dim"],
        context_length=cfg["clip"]["context_length"],
        tokenizer_dir=cfg["clip"]["tokenizer_dir"])
    text_emb = encode(texts)  # (num_samples, clip_dim)

    mcfg = TextMDMConfig(
        njoints=cfg["njoints"], latent_dim=cfg["latent_dim"],
        ff_size=cfg["ff_size"], num_layers=cfg["num_layers"],
        clip_dim=text_emb.shape[-1], cond_mask_prob=cfg["cond_mask_prob"])
    model = TextMDM(mcfg)
    params = load_orbax_params(args.model_path, use_ema=args.use_ema)

    betas = D.named_beta_schedule(cfg["noise_schedule"],
                                  cfg["diffusion_steps"])
    if args.respace:
        sched = D.spaced_schedule(
            betas, D.space_timesteps(cfg["diffusion_steps"],
                                     f"ddim{args.respace}"))
    else:
        sched = D.Schedule.create(betas)

    # one batched program: (num_repetitions * num_samples) rows — row
    # layout rep-major to match the reference's per-rep loop ordering
    B = args.num_repetitions * num_samples
    cond = {"text_emb": jnp.asarray(np.tile(text_emb,
                                            (args.num_repetitions, 1)))}

    def model_apply(params, x, t, c, uncond=None):
        return model.apply(params, x, t, c, uncond=uncond)

    if args.guidance_param != 1.0:
        model_fn = make_cfg_model_fn(
            model_apply, args.guidance_param, B, params=params, cond=cond)
    else:
        def model_fn(x, t):
            return model_apply(params, x, t, cond)

    shape = (B, cfg["njoints"], 1, n_frames)
    scfg = SamplerConfig()
    from ..diffusion.sampling import dpmpp2m_sample_loop

    loops = {"ddpm": p_sample_loop, "ddim": D.ddim_sample_loop,
             "plms": D.plms_sample_loop, "dpmpp": dpmpp2m_sample_loop}
    sample = loops[args.sampler](
        sched, model_fn, shape, jax.random.PRNGKey(args.seed), cfg=scfg)

    mean = np.load(cfg["mean"])
    std = np.load(cfg["std"])
    feats = np.asarray(sample)[:, :, 0, :].transpose(0, 2, 1)  # (B, T, C)
    feats = feats * std + mean
    joints_num = 22 if cfg["dataset"] == "humanml" else 21
    xyz = np.asarray(recover_from_ric(jnp.asarray(feats, jnp.float32),
                                      joints_num))  # (B, T, J, 3)
    # reference layout: (N, joints, 3, T) (`generate.py:139-147` permute)
    motion = xyz.transpose(0, 2, 3, 1)

    out_path = args.output_dir
    if not out_path:
        out_path = os.path.join(
            args.model_path,
            f"samples_seed{args.seed}" + (
                "_" + args.text_prompt.replace(" ", "_").replace(".", "")
                if args.text_prompt else ""))
    os.makedirs(out_path, exist_ok=True)
    all_text = texts * args.num_repetitions
    lengths = np.full((B,), n_frames, np.int64)
    np.save(os.path.join(out_path, "results.npy"),
            {"motion": motion, "text": all_text, "lengths": lengths,
             "num_samples": num_samples,
             "num_repetitions": args.num_repetitions})
    if args.save_feats:
        np.save(os.path.join(out_path, "results_feats.npy"), feats)
    with open(os.path.join(out_path, "results.txt"), "w") as f:
        f.write("\n".join(all_text))
    print("wrote", os.path.join(out_path, "results.npy"),
          f"motion {motion.shape}")
    return out_path


if __name__ == "__main__":
    main()
