"""Text-to-motion training CLI (MDM-legacy product path).

Mirrors `main/train/train_mdm.py` (+ `main/utils/parser_util.py` defaults)
for the HumanML3D/KIT datasets: Text2MotionDataset windows + CLIP text
conditioning -> `TextMDM` denoiser -> the shared jitted train loop
(cosine-1000, predict-x0, masked loss over each clip's real length).

Usage:
  python -m diffusestylegesture_tpu.cli.train_t2m \
      --motion_dir .../new_joint_vecs --text_dir .../texts \
      --split .../train.txt --mean .../Mean.npy --std .../Std.npy \
      --save_dir ./save/t2m [--clip_params clip.npz --tokenizer_dir ...]

Differences from the reference, by design:
  * CLIP features are precomputed once per distinct caption (the text
    corpus is static) instead of re-encoded per batch on the GPU —
    the train step then touches only the denoiser.
  * The text encoder is NOT saved in the checkpoint (matching
    `load_model_wo_clip` semantics); its reconstruction spec is recorded
    in `<save_dir>/t2m_config.json`, which `cli.generate` consumes.
"""
from __future__ import annotations

import argparse
import json
import os

import jax.numpy as jnp
import numpy as np

from .. import diffusion as D
from ..data.humanml import T2MConfig, Text2MotionDataset
from ..models.clip_text import make_caption_encoder
from ..models.mdm_text import TextMDM, TextMDMConfig, make_t2m_cond_builder
from ..train import LoopConfig, TrainConfig, TrainLoop


def main(argv=None):
    p = argparse.ArgumentParser(description="MDM text-to-motion training")
    p.add_argument("--motion_dir", required=True)
    p.add_argument("--text_dir", required=True)
    p.add_argument("--split", required=True, help="split id-list file")
    p.add_argument("--mean", required=True)
    p.add_argument("--std", required=True)
    p.add_argument("--save_dir", required=True)
    p.add_argument("--dataset", default="humanml", choices=["humanml", "kit"])
    # parser_util.py defaults: latent 512, 8 layers, ff 1024, lr 1e-4,
    # batch 64, cond_mask_prob .1, cosine-1000
    p.add_argument("--latent_dim", type=int, default=512)
    p.add_argument("--num_layers", type=int, default=8)
    p.add_argument("--ff_size", type=int, default=1024)
    p.add_argument("--cond_mask_prob", type=float, default=0.1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_steps", type=int, default=600_000)
    p.add_argument("--diffusion_steps", type=int, default=1000)
    p.add_argument("--noise_schedule", default="cosine")
    p.add_argument("--num_frames", type=int, default=196)
    p.add_argument("--log_interval", type=int, default=50)
    p.add_argument("--save_interval", type=int, default=50_000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true")
    # frozen text encoder: converted CLIP weights + real tokenizer, or a
    # deterministic toy encoder (hash tokenizer) for from-scratch runs
    p.add_argument("--clip_params", default=None)
    p.add_argument("--tokenizer_dir", default=None)
    p.add_argument("--clip_seed", type=int, default=0)
    p.add_argument("--clip_width", type=int, default=512)
    p.add_argument("--clip_layers", type=int, default=12)
    args = p.parse_args(argv)

    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    njoints = 263 if args.dataset == "humanml" else 251
    fps = 20 if args.dataset == "humanml" else 12.5
    mean, std = np.load(args.mean), np.load(args.std)
    dcfg = T2MConfig(
        motion_dir=args.motion_dir, text_dir=args.text_dir,
        dataset_name="t2m" if args.dataset == "humanml" else "kit",
        max_motion_length=args.num_frames, fps=int(fps),
    )
    dataset = Text2MotionDataset(dcfg, mean, std, args.split,
                                 w_vectorizer=None, seed=args.seed)
    if len(dataset) == 0:
        raise SystemExit("no usable clips under --motion_dir/--text_dir")

    encode, clip_spec = make_caption_encoder(
        args.clip_params, seed=args.clip_seed, width=args.clip_width,
        layers=args.clip_layers, tokenizer_dir=args.tokenizer_dir)
    captions = dataset.captions()
    embs = np.concatenate(
        [encode(captions[i: i + 256]) for i in range(0, len(captions), 256)])
    text_embs = dict(zip(captions, embs))
    print(f"{len(dataset)} clips, {len(captions)} distinct captions encoded")

    mcfg = TextMDMConfig(
        njoints=njoints, latent_dim=args.latent_dim,
        ff_size=args.ff_size, num_layers=args.num_layers,
        clip_dim=int(clip_spec["projection_dim"]),
        cond_mask_prob=args.cond_mask_prob,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    model = TextMDM(mcfg)
    batches = dataset.train_batches(args.batch_size, text_embs)
    builder = make_t2m_cond_builder()

    batch = next(batches)
    import itertools

    import jax

    x0, cond, _ = builder({k: jnp.asarray(v) for k, v in batch.items()})
    params = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed), x0,
        jnp.zeros((x0.shape[0],), jnp.int32), cond)

    def apply(params, x, t, cond, train=False, rngs=None, uncond=None):
        return model.apply(params, x, t, cond, train=train, rngs=rngs,
                           uncond=uncond)

    sched = D.Schedule.create(
        D.named_beta_schedule(args.noise_schedule, args.diffusion_steps))

    os.makedirs(args.save_dir, exist_ok=True)
    with open(os.path.join(args.save_dir, "t2m_config.json"), "w") as f:
        json.dump({
            "dataset": args.dataset, "njoints": njoints,
            "latent_dim": args.latent_dim, "num_layers": args.num_layers,
            "ff_size": args.ff_size, "cond_mask_prob": args.cond_mask_prob,
            "diffusion_steps": args.diffusion_steps,
            "noise_schedule": args.noise_schedule,
            "num_frames": args.num_frames, "fps": fps,
            "mean": os.path.abspath(args.mean),
            "std": os.path.abspath(args.std),
            "clip": clip_spec,
        }, f, indent=1)

    loop = TrainLoop(
        apply, sched, params, itertools.chain([batch], batches),
        train_cfg=TrainConfig(
            lr=args.lr,
            compute_dtype="bfloat16" if args.bf16 else "float32"),
        loop_cfg=LoopConfig(
            num_steps=args.num_steps, log_interval=args.log_interval,
            save_interval=args.save_interval, checkpoint_dir=args.save_dir),
        cond_builder=builder,
        seed=args.seed,
    )
    loop.run()


if __name__ == "__main__":
    main()
