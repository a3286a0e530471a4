"""Training CLI.

Usage (mirrors the reference entry points):
  python -m diffusestylegesture_tpu.cli.train --config configs/zeggs.yml
  python -m diffusestylegesture_tpu.cli.train --config configs/beat_twh.yml \
      --dataset TWH --name DiffuseStyleGesture+

Parity: `main/mydiffusion_zeggs/end2end.py:19-71` and
`BEAT-TWH-main/mydiffusion_beat_twh/end2end.py:19-101`.
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from .. import diffusion as D
from ..config import apply_beat_twh_derivations, load_yaml_config
from ..models.mdm import MDM, MDMConfig
from ..models.mdm_plus import MDMPlus, MDMPlusConfig
from ..train import LoopConfig, TrainConfig, TrainLoop
from ..train.state import make_beat_cond_builder, make_zeggs_cond_builder


def build_zeggs(cfg, mcfg_extra=None):
    from ..data import ZeggsWindowDataset

    mcfg = MDMConfig(
        njoints=cfg.njoints,
        latent_dim=cfg.latent_dim,
        ff_size=cfg.get("ff_size", 1024),
        num_layers=cfg.get("num_layers", 8),
        n_seed=cfg.n_seed,
        cond_mode=cfg.cond_mode,
        cond_mask_prob=cfg.cond_mask_prob,
        audio_feat=cfg.audio_feat,
        split_qkv=cfg.get("split_qkv", False),
        dtype=jnp.dtype(cfg.get("compute_dtype", "float32")),
        **(mcfg_extra or {}),
    )
    model = MDM(mcfg)

    wavlm_fn = None
    try:
        from ..models.wavlm import load_wavlm_checkpoint, make_zeggs_wavlm_fn, WavLM

        wcfg, wparams = load_wavlm_checkpoint(cfg.wavlm_path)
        fn = make_zeggs_wavlm_fn(WavLM(wcfg), cfg.n_poses)
        jfn = jax.jit(lambda w: fn(wparams, w))
        wavlm_fn = lambda w: jfn(jnp.asarray(w))  # noqa: E731
    except (FileNotFoundError, ImportError):
        # also ImportError: the converter needs torch, which a JAX-only
        # machine may lack — cached wavlm features make it unnecessary
        print(f"WavLM unavailable ({cfg.wavlm_path}); "
              "expecting cached wavlm features in the dataset")

    data = ZeggsWindowDataset(
        f"{cfg.data_dir}/train", wavlm_fn,
        n_poses=cfg.n_poses, stride=cfg.subdivision_stride,
        fps=cfg.motion_resampling_framerate,
    )
    builder = make_zeggs_cond_builder(cfg.n_seed)
    return model, mcfg, data.batches(cfg.batch_size), builder, data


def build_beat_twh(cfg, mcfg_extra=None):
    from ..data import SpeechGestureDataset, gesture_statistics

    cfg = apply_beat_twh_derivations(cfg)
    mcfg = MDMPlusConfig(
        njoints=cfg.njoints,
        latent_dim=cfg.latent_dim,
        ff_size=cfg.get("ff_size", 1024),
        num_layers=cfg.get("num_layers", 8),
        n_seed=cfg.n_seed,
        cond_mode=cfg.cond_mode,
        cond_mask_prob=cfg.cond_mask_prob,
        source_audio_dim=cfg.audio_feature_dim,
        audio_feat_dim=cfg.audio_feat_dim_latent,
        style_dim_in=cfg.style_dim,
        split_qkv=cfg.get("split_qkv", False),
        dtype=jnp.dtype(cfg.get("compute_dtype", "float32")),
        **(mcfg_extra or {}),
    )
    model = MDMPlus(mcfg)
    mean, std = gesture_statistics(cfg.h5file)
    data = SpeechGestureDataset(cfg.h5file, mean, std, n_poses=cfg.n_poses)
    builder = make_beat_cond_builder(cfg.cond_mode, cfg.n_seed)
    return model, mcfg, data.batches(cfg.batch_size), builder, data


def main(argv=None):
    p = argparse.ArgumentParser(description="DiffuseStyleGesture-TPU training")
    p.add_argument("--config", required=True)
    p.add_argument("--dataset", default=None)
    p.add_argument("--name", default=None)
    p.add_argument("--num_steps", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--use_mesh", action="store_true")
    p.add_argument("--tp", type=int, default=0,
                   help="tensor-parallel degree over the 'model' mesh axis")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3: shard params + optimizer moments + EMA "
                        "along the 'data' mesh axis (parallel/fsdp.py); "
                        "implies --use_mesh, composes with --tp")
    p.add_argument("--pp", type=int, default=0,
                   help="pipeline-parallel degree: shard the trunk's layer "
                        "stack over a 'pipe' mesh axis and stream GPipe "
                        "microbatches (parallel/pipeline.py); implies a "
                        "mesh, composes with --sp on remaining devices")
    p.add_argument("--sp", type=int, default=0,
                   help="sequence-parallel degree: shard the local "
                        "attention's TIME axis over a 'seq' mesh axis with "
                        "a one-window ppermute halo "
                        "(parallel/seq_parallel.py); n_poses must divide "
                        "into sp shards of whole windows")
    p.add_argument("--moe_experts", type=int, default=None,
                   help="swap the trunk FFN for a Switch-routed MoE with "
                        "this many experts (models/moe.py); the "
                        "load-balance aux loss is added with weight "
                        "--moe_aux_weight. Defaults to the yaml's "
                        "moe_experts (0 = dense); an explicit 0 forces "
                        "dense even when the yaml configures MoE")
    p.add_argument("--moe_aux_weight", type=float, default=0.01)
    p.add_argument("--split_qkv", action="store_true",
                   help="store attention projections as separate q/k/v "
                        "kernels instead of the torch-packed in_proj — "
                        "head-aligned under --tp (parallel/tp.py); defaults "
                        "on when --tp > 1. Checkpoints convert both ways "
                        "with parallel.{split,merge}_qkv_params")
    p.add_argument("--device_cache", action="store_true",
                   help="upload the whole dataset to HBM once and gather "
                        "batches on device inside the step (zero host "
                        "traffic per iteration): ZEGGS window gathers, "
                        "BEAT/TWH in-jit random clip crops")
    p.add_argument("--bf16", action="store_true",
                   help="mixed-precision training: bf16 trunk compute with "
                        "f32 master weights/optimizer (the TPU-native "
                        "completion of the reference MixedPrecisionTrainer, "
                        "main/diffusion/fp16_util.py:148-232)")
    args = p.parse_args(argv)

    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # warm restarts skip the train-step compile

    cfg = load_yaml_config(
        args.config,
        {k: getattr(args, k) for k in ("dataset", "name", "num_steps", "batch_size")},
    )
    if args.bf16:
        cfg.compute_dtype = "bfloat16"  # Config is attribute-style
    if args.split_qkv or args.tp > 1:
        # under TP the split layout is strictly better (head-aligned
        # shards, no activation re-gather before attention); without TP
        # it is numerically identical, so defaulting it on with --tp is
        # safe for resumes too (orbax trees differ, but a fresh --tp run
        # inits in the split layout from step 0)
        cfg.split_qkv = True

    # model-parallel axes the MODEL needs at construction time: build ONE
    # mesh shared by model and loop (data × [model] × [seq] × [pipe])
    mesh = None
    mcfg_extra = {}
    pp, sp = max(0, args.pp), max(0, args.sp)
    if pp > 1 or sp > 1:
        from ..parallel import make_mesh

        axes, shape = ["data"], [len(jax.devices())]
        for deg, name in ((args.tp, "model"), (sp, "seq"), (pp, "pipe")):
            if deg > 1:
                if shape[0] % deg:
                    raise SystemExit(
                        f"{name} degree {deg} does not divide "
                        f"{shape[0]} remaining devices")
                axes.append(name)
                shape.append(deg)
                shape[0] //= deg
        mesh = make_mesh(axes=tuple(axes), shape=tuple(shape))
        if sp > 1:
            mcfg_extra.update(attn_impl="seq_parallel", seq_mesh=mesh)
        if pp > 1:
            mcfg_extra.update(trunk_impl="pipeline", pipe_mesh=mesh)
    if args.moe_experts is None:
        # honor a yaml-configured MoE too: every serving CLI reads
        # cfg.moe_experts, so training must not silently build dense from
        # the same yaml. The flag, when GIVEN, wins — None is the
        # default sentinel, so an explicit `--moe_experts 0` still
        # forces a dense ablation from an MoE yaml
        args.moe_experts = int(cfg.get("moe_experts", 0))
    if args.moe_experts > 0:
        if pp > 1:
            raise SystemExit(
                "--moe_experts with --pp is unsupported in the CLI: the "
                "pipelined trunk cannot sow the MoE aux loss")
        mcfg_extra.update(moe_experts=args.moe_experts)

    if cfg.dataset == "ZEGGS":
        model, mcfg, batches, builder, dataset = build_zeggs(cfg, mcfg_extra)
    else:
        model, mcfg, batches, builder, dataset = build_beat_twh(cfg, mcfg_extra)

    device_cache = None
    if args.device_cache:
        from ..data.device_cache import DeviceWindowCache

        sharding = None
        if args.use_mesh or args.tp > 1 or args.fsdp or mesh is not None:
            # replicate the cache across the mesh so the in-jit batch
            # gather runs on every device (committed-to-device-0 arrays
            # would funnel all gathers through one chip)
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import make_mesh

            sharding = NamedSharding(
                mesh if mesh is not None else make_mesh(), P())
        if cfg.dataset == "ZEGGS":
            device_cache = DeviceWindowCache.from_zeggs(
                dataset, sharding=sharding)
        else:
            device_cache = DeviceWindowCache.from_beat_twh(
                dataset, sharding=sharding)

    sched = D.Schedule.create(
        D.named_beta_schedule(cfg.get("noise_schedule", "cosine"), cfg.diffusion_steps)
    )

    # init params from one batch
    batch = next(iter(batches))
    x0, cond, _ = builder({k: jnp.asarray(v) for k, v in batch.items()})
    # jit the init: one compiled program instead of thousands of eagerly
    # dispatched ops — through a remote (axon) backend the eager chain
    # queues ~minutes of round-trips that the first device sync then
    # blocks on (same reason bench.py jits its inits)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed), x0, jnp.zeros((x0.shape[0],), jnp.int32), cond
    )
    # keep only the trainable collection: an MoE init also returns the
    # sown 'losses' scalar, which must not enter the TrainState (it would
    # be checkpointed and optimized as if it were a parameter)
    if isinstance(params, dict) and "params" in params:
        params = {"params": params["params"]}

    if args.moe_experts > 0 and args.moe_aux_weight > 0:
        from ..models.moe import make_moe_apply

        apply = make_moe_apply(model)
    else:
        def apply(params, x, t, cond, train=False, rngs=None, uncond=None):
            return model.apply(params, x, t, cond, train=train, rngs=rngs,
                               uncond=uncond)

    import itertools

    loop = TrainLoop(
        apply,
        sched,
        params,
        itertools.chain([batch], batches),
        train_cfg=TrainConfig(
            lr=cfg.lr,
            weight_decay=cfg.get("weight_decay", 0.0),
            lr_anneal_steps=cfg.get("lr_anneal_steps", 0),
            schedule_sampler=cfg.get("schedule_sampler", "uniform"),
            compute_dtype=cfg.get("compute_dtype", "float32"),
            moe_aux_weight=(args.moe_aux_weight
                            if args.moe_experts > 0 else 0.0),
            dropout_rng_impl=cfg.get("dropout_rng_impl", "rbg"),
        ),
        loop_cfg=LoopConfig(
            num_steps=cfg.get("num_steps", 100000),
            log_interval=cfg.get("log_interval", 50),
            save_interval=cfg.get("save_interval", 50000),
            checkpoint_dir=cfg.get("save_dir"),
            use_mesh=args.use_mesh or args.tp > 1 or args.fsdp
            or mesh is not None,
            tensor_parallel=args.tp,
            fsdp=args.fsdp,
            mesh=mesh,
            log_dir=cfg.get("log_dir"),
            log_formats=tuple(cfg.get("log_formats", ("stdout",))),
        ),
        cond_builder=builder,
        seed=args.seed,
        device_cache=device_cache,
        batch_size=cfg.batch_size if device_cache is not None else 0,
    )
    loop.run()


if __name__ == "__main__":
    main()
