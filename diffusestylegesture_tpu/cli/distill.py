"""Progressive-distillation CLI: halve the sampling chain, stage by stage.

  python -m diffusestylegesture_tpu.cli.distill --config configs/zeggs.yml \
      --teacher ckpts/zeggs_450k --stages 3 --steps_per_stage 10000 \
      --save_dir ckpts/distilled

Stage k trains a student whose DDIM grid has half the teacher's steps
(1000 → 500 → 250 → 125 …) on the prepared ZEGGS window data; each
stage's student becomes the next teacher. Outputs per-stage orbax
checkpoints plus a `schedule.json` recording the surviving timestep grid
(feed it to the sampler via `spaced_schedule`).
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def load_distilled(stage_dir: str):
    """Load a distillation stage → (params, spaced Schedule).

    Feed the schedule to any sampler with cfg.sampler='ddim': the engine's
    `timestep_map` remaps the shrunken grid onto the original timestep
    vocabulary the distilled network was trained with.
    """
    import orbax.checkpoint as ocp

    from .. import diffusion as D

    with open(os.path.join(stage_dir, "schedule.json")) as f:
        meta = json.load(f)
    params = ocp.StandardCheckpointer().restore(
        os.path.abspath(os.path.join(stage_dir, "params"))
    )
    betas = D.named_beta_schedule(meta["noise_schedule"], meta["base_steps"])
    sched = D.spaced_schedule(betas, set(meta["use_timesteps"]))
    return params, sched


def main(argv=None):
    p = argparse.ArgumentParser(description="progressive distillation (ZEGGS)")
    p.add_argument("--config", required=True)
    p.add_argument("--teacher", required=True, help=".pt or orbax params")
    p.add_argument("--save_dir", required=True)
    p.add_argument("--stages", type=int, default=1)
    p.add_argument("--steps_per_stage", type=int, default=10000)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--chunk", type=int, default=100,
                   help="optimizer steps per device dispatch (lax.scan "
                        "body): per-step host dispatch through a remote "
                        "backend measured ~1.4 steps/s vs ~60 on-device")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .. import diffusion as D
    from ..config import load_yaml_config
    from ..data import ZeggsWindowDataset
    from ..models.mdm import MDM, MDMConfig
    from ..train.distill import make_distill_step, student_schedule
    from ..train.state import make_zeggs_cond_builder
    from ..utils.compile_cache import enable_persistent_cache
    from .sample import load_denoiser_params

    enable_persistent_cache()
    cfg = load_yaml_config(args.config)
    os.makedirs(args.save_dir, exist_ok=True)
    batch_size = args.batch_size or cfg.batch_size

    mcfg = MDMConfig(
        njoints=cfg.njoints, latent_dim=cfg.latent_dim,
        ff_size=cfg.get("ff_size", 1024), num_layers=cfg.get("num_layers", 8),
        n_seed=cfg.n_seed, cond_mode=cfg.cond_mode,
        cond_mask_prob=cfg.cond_mask_prob, audio_feat=cfg.audio_feat,
        moe_experts=cfg.get("moe_experts", 0),
    )
    teacher_params = load_denoiser_params(args.teacher, mcfg.num_layers)
    from .sample import resolve_moe_config

    mcfg = resolve_moe_config(mcfg, teacher_params)
    model = MDM(mcfg)

    data = ZeggsWindowDataset(
        f"{cfg.data_dir}/train", None,
        n_poses=cfg.n_poses, stride=cfg.subdivision_stride,
        fps=cfg.motion_resampling_framerate,
    )
    if data.wavlm is None:
        raise SystemExit(
            "distillation needs cached WavLM features in the window cache "
            "(run training once with a wavlm checkpoint, or prepare-data)"
        )
    builder = make_zeggs_cond_builder(cfg.n_seed)

    base_betas = D.named_beta_schedule(
        cfg.get("noise_schedule", "cosine"), cfg.diffusion_steps
    )
    sched_teacher = D.Schedule.create(base_betas)

    key = jax.random.PRNGKey(args.seed)

    # device-resident windows with an in-jit gather (`data/device_cache`
    # pattern): per-step host batches (~24 MB at batch 32) dominate wall
    # time through tunneled/remote backends
    from ..data.device_cache import DeviceWindowCache

    cache = DeviceWindowCache.from_zeggs(data)

    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    student_params = teacher_params  # warm start from the teacher

    for stage in range(args.stages):
        nt = sched_teacher.num_timesteps
        print(f"stage {stage}: {nt} → {nt // 2} steps")

        def student_apply(pp, x, t, cond):
            return model.apply(pp, x, t, cond)

        def _make(tp):
            return make_distill_step(
                lambda x, t, cond: model.apply(tp, x, t, cond),
                student_apply, sched_teacher, lr=args.lr, conditioned=True,
            )

        init_fn, _ = _make(teacher_params)

        # teacher params and the dataset arrays enter the jit as ARGUMENTS
        # — closing over either would bake them into the executable as
        # constants (compile bloat; remote-compile transports reject the
        # oversized program). The optimization loop runs as a lax.scan of
        # `--chunk` steps per dispatch: per-step host dispatch through a
        # tunneled backend is stime-bound at ~1.4 steps/s for this call's
        # arg-tree size, while the scanned body runs at compiled speed.
        chunk = max(min(args.chunk, args.steps_per_stage), 1)

        @jax.jit
        def chunk_fn(tp, params, opt_state, key, arrays):
            def body(carry, _):
                params, opt_state, key = carry
                key, k_data, k_step = jax.random.split(key, 3)
                batch = DeviceWindowCache.sample_batch(
                    arrays, k_data, batch_size)
                x0, cond, _mask = builder(batch)
                params, opt_state, m = _make(tp)[1](
                    params, opt_state, x0, k_step, cond)
                return (params, opt_state, key), m["loss"]

            (params, opt_state, key), losses = jax.lax.scan(
                body, (params, opt_state, key), None, length=chunk)
            return params, opt_state, key, losses[-1]

        opt = init_fn(student_params)
        params = student_params
        n_chunks = -(-args.steps_per_stage // chunk) if args.steps_per_stage else 0
        for i in range(n_chunks):
            params, opt, key, last_loss = chunk_fn(
                teacher_params, params, opt, key, cache.arrays)
            if i % max(1, n_chunks // 10) == 0:
                print(f"  step {i * chunk}: loss {float(last_loss):.5f}")

        sched_student = student_schedule(sched_teacher, base_betas=base_betas)
        stage_dir = os.path.abspath(
            os.path.join(args.save_dir, f"stage{stage}_steps{nt // 2}")
        )
        ckpt.save(os.path.join(stage_dir, "params"), params)
        ckpt.wait_until_finished()
        with open(os.path.join(stage_dir, "schedule.json"), "w") as f:
            json.dump(
                {
                    "base_steps": int(cfg.diffusion_steps),
                    "noise_schedule": cfg.get("noise_schedule", "cosine"),
                    "use_timesteps": np.asarray(sched_student.timestep_map).tolist(),
                },
                f,
            )
        print("  wrote", stage_dir)

        teacher_params = params
        student_params = params
        sched_teacher = sched_student


if __name__ == "__main__":
    main()
