"""Sampling / generation CLI.

Usage (mirrors `main/mydiffusion_zeggs/sample.py:400-420`):
  python -m diffusestylegesture_tpu.cli.sample --config configs/zeggs.yml \
      --model_path model000450000.pt --audiowavlm_path 015_Happy_4_x_1_0.wav \
      --max_len 320

Loads either a reference torch checkpoint (via the converter) or an orbax
checkpoint directory, runs the compiled windowed sampler, and writes a
.bvh next to `save_dir`.
"""
from __future__ import annotations

import argparse
import os
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from .. import diffusion as D
from ..config import load_yaml_config
from ..data import load_wav_16k
from ..models import convert
from ..models.mdm import MDM, MDMConfig
from ..motion import zeggs_features as zf
from ..sample import ZeggsEngineConfig, ZeggsSampler


def load_orbax_params(model_path: str, use_ema: bool = False):
    """Load params from a bare orbax params dir (``cli.convert_ckpt``
    output) or a ``TrainLoop`` checkpoint directory (orbax
    CheckpointManager with numbered steps holding the full TrainState) —
    the latest step's params (or EMA params with ``use_ema``)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(model_path)
    # cli.distill stage dir: params live under <stage>/params next to
    # schedule.json (the student's halved DDIM grid)
    if os.path.exists(os.path.join(path, "schedule.json")) and os.path.isdir(
            os.path.join(path, "params")):
        path = os.path.join(path, "params")
    steps = [int(d) for d in os.listdir(path) if d.isdigit()]
    if steps:
        mgr = ocp.CheckpointManager(path)
        try:
            tree = mgr.restore(max(steps))
        except ValueError:
            # cross-platform restore: a TPU-saved checkpoint records TPU
            # device shardings that don't resolve under JAX_PLATFORMS=cpu
            # ("Device TPU v5 lite0 was not found") — re-read as host
            # numpy; jit re-places the params on first use
            tree = mgr.restore(max(steps), args=ocp.args.PyTreeRestore())
        mgr.close()
    else:
        try:
            tree = ocp.StandardCheckpointer().restore(path)
        except ValueError:
            import numpy as np

            ckptr = ocp.PyTreeCheckpointer()
            meta = ckptr.metadata(path)
            meta_tree = getattr(meta, "item_metadata", meta)
            restore_args = jax.tree_util.tree_map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray),
                getattr(meta_tree, "tree", meta_tree))
            tree = ckptr.restore(path, restore_args=restore_args)
    if isinstance(tree, dict) and "opt_state" in tree:  # full TrainState
        if use_ema and tree.get("ema_params") is not None:
            tree = tree["ema_params"]
        else:
            tree = tree["params"]
    # a --tp/--split_qkv training run writes split q/k/v attention
    # kernels; the serving model uses the packed torch-parity layout, and
    # the two are numerically interchangeable — merge on load
    if "q_proj" in str(jax.tree_util.tree_structure(tree)):
        from ..parallel import merge_qkv_params

        tree = merge_qkv_params(tree)
    return tree


def load_denoiser_params(model_path: str, num_layers: int = 8, use_ema: bool = False):
    """Reference ``.pt`` (converted on the fly) or any orbax layout."""
    if model_path.endswith(".pt"):
        sd = convert.load_torch_checkpoint(model_path)
        return {"params": convert.convert_mdm_zeggs(sd, num_layers)}
    return load_orbax_params(model_path, use_ema=use_ema)


def infer_moe_experts(params) -> int:
    """Expert count of an MoE-trained checkpoint, 0 for dense.

    `cli.train --moe_experts` stores the expert FFN stacks under a
    per-layer 'moe' scope with w1 of shape (E, D, F); every serving-side
    CLI (sample, sample_beat, serve, distill) infers E from the params so
    a checkpoint loads correctly even when the yaml lacks the flag."""
    return next(
        (int(leaf.shape[0])
         for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
         if [str(getattr(p, "key", "")) for p in path][-2:] == ["moe", "w1"]),
        0)


def resolve_moe_config(mcfg, params, out=None):
    """Model config with ``moe_experts`` matching the loaded checkpoint.

    One shared override for every serving-side CLI (sample, sample_beat,
    serve, distill): when the params carry MoE expert stacks but the yaml
    lacks the flag (or disagrees), the checkpoint wins — the alternative
    is a flax missing-parameter error at the first apply. Works for any
    dataclass config with a ``moe_experts`` field (MDMConfig,
    MDMPlusConfig)."""
    import dataclasses
    import sys

    moe_e = infer_moe_experts(params)
    if moe_e != mcfg.moe_experts:
        # BOTH directions: an MoE checkpoint under a dense yaml AND a
        # dense checkpoint under an MoE yaml (either mismatch is a flax
        # missing-parameter crash at the first apply)
        print(f"note: checkpoint is "
              + (f"MoE-trained ({moe_e} experts)" if moe_e else "dense")
              + " — overriding config", file=out or sys.stdout)
        mcfg = dataclasses.replace(mcfg, moe_experts=moe_e)
    return mcfg


def main(argv=None):
    p = argparse.ArgumentParser(description="DiffuseStyleGesture-TPU sampling")
    p.add_argument("--config", required=True)
    p.add_argument("--model_path", required=True)
    p.add_argument("--audiowavlm_path", required=True)
    p.add_argument("--max_len", type=int, default=0)
    p.add_argument("--style", default=None,
                   help="style token (e.g. Happy) or additive blend "
                        "'Happy:0.6,Sad:0.4' (ZeroEGGS-style 'add')")
    p.add_argument("--styles", default=None,
                   help="';'- or ','-separated style specs — ONE batched "
                        "engine call generates every style concurrently, one "
                        "BVH each (the batch axis is free on the MXU). Use "
                        "';' between specs when a spec is itself a blend "
                        "('Happy:0.6,Sad:0.4;Angry'). Batched runs pin the "
                        "crossfade width to 1 so each output equals its "
                        "single-style run (see ZeggsEngineConfig.crossfade_n)")
    p.add_argument("--guidance_scale", type=float, default=0.0)
    p.add_argument("--skip_timesteps", type=int, default=0,
                   help="skip the first N reverse steps (warm start)")
    p.add_argument("--seed", type=int, default=123456)
    p.add_argument("--save_dir", default="./sample_dir")
    p.add_argument("--aot_dir", default=None,
                   help="directory for AOT engine snapshots (warm restarts "
                        "skip tracing+lowering+compiling)")
    p.add_argument("--use_ema", action="store_true",
                   help="sample from the EMA params of a TrainLoop checkpoint")
    p.add_argument("--serve_fast", action="store_true",
                   help="bf16 trunk + tanh-approx GELU serving mode "
                        "(~4x benched throughput at batch; output deviation "
                        "vs f32 is within the bf16 noise floor - see bench.py "
                        "gates)")
    p.add_argument("--sampler", default="ddpm",
                   choices=["ddpm", "ddim", "plms", "dpmpp"],
                   help="reverse-process sampler (dpmpp = DPM-Solver++(2M), "
                        "pair with --respace for few-step serving)")
    p.add_argument("--respace", type=int, default=0,
                   help="respace the schedule to N timesteps "
                        "(ddimN striding; the reference supports respacing "
                        "but never enables it)")
    p.add_argument("--allow_degraded", action="store_true",
                   help="serve a fast mode even if the motion-quality "
                        "harness flagged it as degrading FGD beyond "
                        "tolerance (see sample/quality_gate.py)")
    p.add_argument("--normalize_loudness", action="store_true",
                   help="EBU R128 normalize the input wav to -23 LUFS first "
                        "(the reference's ffmpeg-normalize pre-step on its "
                        "--audio_path route; its --audiowavlm_path demo path "
                        "skips it, so this is off by default)")
    p.add_argument("--window_buckets", default=None,
                   help="comma-separated window-count buckets (e.g. 2,4,8,16): "
                        "clip lengths pad up to the next bucket so a few "
                        "compiled/AOT programs serve every length")
    args = p.parse_args(argv)

    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # warm restarts skip the engine compile

    cfg = load_yaml_config(args.config)
    os.makedirs(args.save_dir, exist_ok=True)

    # distilled-student checkpoint (cli.distill stage dir): serve on the
    # student's EXACT halved DDIM grid from schedule.json — NOT a ddimN
    # re-striding, which visits different timesteps than the student was
    # trained to match — and gate under the harness's distillN key
    distill_grid = None
    distill_meta = None
    if os.path.isdir(args.model_path) and os.path.exists(
            os.path.join(args.model_path, "schedule.json")):
        import json as _json

        with open(os.path.join(args.model_path, "schedule.json")) as f:
            distill_meta = _json.load(f)
        distill_grid = distill_meta["use_timesteps"]
        # discard --respace BEFORE the ddpm→ddim auto-switch: checked the
        # other way round, `--respace N` suppressed the switch and DDPM
        # ancestral steps ran on the student's DDIM grid — a mode the
        # quality gate never measured, under a distillN verdict
        if args.respace:
            print("note: --respace ignored for a distilled student "
                  "(schedule.json fixes the grid)")
            args.respace = 0
        if args.sampler == "ddpm":
            print(f"note: distilled student checkpoint — serving its "
                  f"{len(distill_grid)}-step DDIM grid")
            args.sampler = "ddim"

    # motion-quality gate on fast serving modes (harness-measured FGD vs
    # DDPM-1000; `sample/quality_gate.py`) — checked BEFORE any model
    # loading/compilation so a refused mode costs nothing
    from ..sample.quality_gate import check_key, check_mode

    if distill_grid is not None:
        # gate against the base schedule the student was DISTILLED from
        # (schedule.json), not the serving yaml — the two can disagree
        status, message = check_key(
            f"distill{len(distill_grid)}",
            diffusion_steps=int(
                distill_meta.get("base_steps", cfg.diffusion_steps)))
    else:
        status, message = check_mode(args.sampler, args.respace, cfg.diffusion_steps)
    if status == "degraded" and not args.allow_degraded:
        raise SystemExit(f"REFUSED: {message}")
    if status != "baseline":
        print(("note: " if status == "unknown" else "") + message)

    import dataclasses as _dc

    mcfg = MDMConfig(
        njoints=cfg.njoints, latent_dim=cfg.latent_dim,
        ff_size=cfg.get("ff_size", 1024), num_layers=cfg.get("num_layers", 8),
        n_seed=cfg.n_seed, cond_mode=cfg.cond_mode,
        cond_mask_prob=cfg.cond_mask_prob, audio_feat=cfg.audio_feat,
        moe_experts=cfg.get("moe_experts", 0),
    )
    if args.serve_fast:
        mcfg = _dc.replace(mcfg, dtype=jnp.bfloat16, activation="gelu_tanh")
    params = load_denoiser_params(args.model_path, mcfg.num_layers, use_ema=args.use_ema)
    mcfg = resolve_moe_config(mcfg, params)
    model = MDM(mcfg)
    if args.serve_fast:
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if getattr(a, "dtype", None) == jnp.float32 else a, params)

    from ..models.wavlm import WavLM, load_wavlm_checkpoint, make_zeggs_wavlm_fn

    wcfg, wparams = load_wavlm_checkpoint(cfg.wavlm_path)
    if args.serve_fast:
        # bf16 params AND bf16 compute (WavLMConfig.dtype casts the
        # activations; bf16 params alone promote back to f32 compute) —
        # the encoder dominates few-step serving wall time
        wparams = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if getattr(a, "dtype", None) == jnp.float32 else a, wparams)
        wcfg = _dc.replace(wcfg, dtype=jnp.bfloat16)
    wavlm_fn = make_zeggs_wavlm_fn(WavLM(wcfg), cfg.n_poses)

    betas = D.named_beta_schedule(cfg.get("noise_schedule", "cosine"), cfg.diffusion_steps)
    if distill_grid is not None:
        # the student's grid indexes its TEACHER's base schedule: build
        # betas from schedule.json's recorded base_steps/noise_schedule,
        # not the serving yaml — a shorter yaml schedule would silently
        # drop out-of-range grid entries (space_timesteps keeps only
        # `i in use_timesteps`) and index the wrong alphas_cumprod
        base_steps = int(distill_meta.get("base_steps", cfg.diffusion_steps))
        base_name = distill_meta.get(
            "noise_schedule", cfg.get("noise_schedule", "cosine"))
        if (base_steps != cfg.diffusion_steps
                or base_name != cfg.get("noise_schedule", "cosine")):
            print(f"note: distilled student records a {base_name}-"
                  f"{base_steps} base schedule; using it over the yaml's "
                  f"{cfg.get('noise_schedule', 'cosine')}-"
                  f"{cfg.diffusion_steps}")
        sched = D.spaced_schedule(
            D.named_beta_schedule(base_name, base_steps), distill_grid)
    elif args.respace:
        sched = D.spaced_schedule(
            betas, D.space_timesteps(cfg.diffusion_steps, f"ddim{args.respace}"))
    else:
        sched = D.Schedule.create(betas)

    audio = load_wav_16k(args.audiowavlm_path)
    if args.normalize_loudness:
        from ..audio.loudness import normalize_loudness

        audio = normalize_loudness(audio, 16000.0)
    if args.max_len:
        audio = audio[: int(args.max_len * 16000 // cfg.motion_resampling_framerate)]

    def parse_style(spec: str):
        """Token, or additive blend 'Happy:0.6,Sad:0.4' (ZeroEGGS 'add')."""
        if ":" in spec:
            from ..sample.styles import blend_styles

            names, weights = zip(*(part.split(":") for part in spec.split(",")))
            return blend_styles(names, [float(w) for w in weights])
        v = zf.style_onehot(spec)
        if v is None:
            raise SystemExit(f"unknown style token {spec!r}")
        return v

    def sanitize(tok):
        return tok.replace(":", "").replace(",", "-").replace(";", "-")

    if args.styles:
        sep = ";" if ";" in args.styles else ","
        specs = args.styles.split(sep)
        style = np.stack([parse_style(t) for t in specs])
        tokens = [sanitize(t) for t in specs]
    else:
        token = args.style
        if not token:
            parts = os.path.basename(args.audiowavlm_path).split("_")
            if len(parts) < 2:
                # ZEGGS filename convention is NNN_Style_...; anything
                # else needs an explicit style instead of an IndexError
                raise SystemExit(
                    f"cannot infer a style from "
                    f"{os.path.basename(args.audiowavlm_path)!r} "
                    "(expected NNN_Style_... naming) — pass --style")
            token = parts[1]
        style = parse_style(token)[None]
        tokens = [sanitize(token)]

    mean = np.load(os.path.join(cfg.data_dir, "mean.npz"))["mean"]
    std = np.load(os.path.join(cfg.data_dir, "std.npz"))["std"]

    def model_apply(params, x, t, cond, uncond=None):
        return model.apply(params, x, t, cond, uncond=uncond)

    sampler = ZeggsSampler(
        model_apply,
        wavlm_fn,
        sched,
        ZeggsEngineConfig(
            n_poses=cfg.n_poses, n_seed=cfg.n_seed, njoints=cfg.njoints,
            fps=cfg.motion_resampling_framerate,
            guidance_scale=args.guidance_scale,
            skip_timesteps=args.skip_timesteps,
            sampler=args.sampler,
            # multi-style batches pin the crossfade width to 1 (the
            # reference quirk's batch-1 value) so each style's BVH equals
            # its own single-style run; single runs keep the quirk
            crossfade_n=1 if style.shape[0] > 1 else None,
        ),
        aot_dir=args.aot_dir,
        program_tag="bf16-gelutanh" if args.serve_fast else "",
    )
    buckets = None
    if args.window_buckets:
        buckets = tuple(int(b) for b in args.window_buckets.split(","))
    out = sampler.generate(
        params, wparams, audio, style, jax.random.PRNGKey(args.seed),
        mean=mean, std=std, window_buckets=buckets,
    )

    stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    for i, tok in enumerate(tokens):
        out_path = os.path.join(args.save_dir, f"{stamp}_{tok}_{args.seed}.bvh")
        zf.pose_features_to_bvh(out[i], out_path, smoothing=True)
        print("wrote", out_path)


if __name__ == "__main__":
    main()
