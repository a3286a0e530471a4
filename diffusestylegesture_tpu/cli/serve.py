"""Batch-serving CLI: JSONL requests in → stylized BVH files out.

  python -m diffusestylegesture_tpu.cli.serve --config configs/zeggs.yml \
      --model_path model000450000.pt [--requests reqs.jsonl] [--aot_dir /x]

Each input line is a request:
  {"wav": "clip.wav", "style": "Happy", "out": "clip_happy.bvh"}
(`style` is a ZEGGS style token or a 6-float list; `out` defaults next to
the wav.) Requests are read from `--requests` or stdin and fed through the
micro-batching `GestureServer` — concurrent lines ride one batched engine
call. One JSON result line is printed per request.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="DiffuseStyleGesture-TPU serving")
    p.add_argument("--config", required=True)
    p.add_argument("--model_path", required=True)
    p.add_argument("--requests", default=None, help="JSONL file (default stdin)")
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--max_delay_ms", type=float, default=50.0)
    p.add_argument("--aot_dir", default=None)
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--serve_fast", action="store_true",
                   help="bf16 trunk + tanh-approx GELU serving mode")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--crossfade_n", type=int, default=1,
                   help="crossfade width in overlap frames (default 1 = the "
                        "reference's effective batch-1 behavior, independent "
                        "of server batch padding; -1 restores the reference "
                        "quirk where the width follows the batch size)")
    args = p.parse_args(argv)

    from .. import diffusion as D
    from ..config import load_yaml_config
    from ..data import load_wav_16k
    from ..models.mdm import MDM, MDMConfig
    from ..models.wavlm import WavLM, load_wavlm_checkpoint, make_zeggs_wavlm_fn
    from ..motion import zeggs_features as zf
    from ..sample import GestureServer, ServerConfig, ZeggsEngineConfig, ZeggsSampler
    from ..utils.compile_cache import enable_persistent_cache
    from .sample import load_denoiser_params

    enable_persistent_cache()
    cfg = load_yaml_config(args.config)

    import dataclasses as _dc

    mcfg = MDMConfig(
        njoints=cfg.njoints, latent_dim=cfg.latent_dim,
        ff_size=cfg.get("ff_size", 1024), num_layers=cfg.get("num_layers", 8),
        n_seed=cfg.n_seed, cond_mode=cfg.cond_mode,
        cond_mask_prob=cfg.cond_mask_prob, audio_feat=cfg.audio_feat,
        moe_experts=cfg.get("moe_experts", 0),
    )
    if args.serve_fast:
        import jax
        import jax.numpy as jnp

        mcfg = _dc.replace(mcfg, dtype=jnp.bfloat16, activation="gelu_tanh")
    params = load_denoiser_params(args.model_path, mcfg.num_layers, use_ema=args.use_ema)
    from .sample import resolve_moe_config

    # notes go to stderr: stdout is the JSONL result stream
    mcfg = resolve_moe_config(mcfg, params, out=sys.stderr)
    model = MDM(mcfg)
    wcfg, wparams = load_wavlm_checkpoint(cfg.wavlm_path)
    if args.serve_fast:
        cast = lambda t: jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if getattr(a, "dtype", None) == jnp.float32 else a, t)
        params, wparams = cast(params), cast(wparams)
        # bf16 compute too — bf16 params alone promote back to f32
        wcfg = _dc.replace(wcfg, dtype=jnp.bfloat16)
    wavlm_fn = make_zeggs_wavlm_fn(WavLM(wcfg), cfg.n_poses)
    sched = D.Schedule.create(
        D.named_beta_schedule(cfg.get("noise_schedule", "cosine"), cfg.diffusion_steps)
    )

    def model_apply(params, x, t, cond, uncond=None):
        return model.apply(params, x, t, cond, uncond=uncond)

    sampler = ZeggsSampler(
        model_apply, wavlm_fn, sched,
        ZeggsEngineConfig(
            n_poses=cfg.n_poses, n_seed=cfg.n_seed, njoints=cfg.njoints,
            fps=cfg.motion_resampling_framerate,
            # batch-size-independent blending: with the reference quirk
            # (crossfade_n=None → n = batch) a request's output would
            # depend on how many requests share its padded batch
            crossfade_n=None if args.crossfade_n < 0 else args.crossfade_n,
        ),
        aot_dir=args.aot_dir,
        program_tag="bf16-gelutanh" if args.serve_fast else "",
    )
    mean = np.load(os.path.join(cfg.data_dir, "mean.npz"))["mean"]
    std = np.load(os.path.join(cfg.data_dir, "std.npz"))["std"]
    server = GestureServer(
        sampler, params, wparams, mean=mean, std=std,
        cfg=ServerConfig(max_batch=args.max_batch, max_delay_ms=args.max_delay_ms),
        seed=args.seed,
    ).start()

    def parse_style(spec, wav_path):
        if isinstance(spec, (list, tuple)):
            return np.asarray(spec, np.float32)
        token = spec or os.path.basename(wav_path).split("_")[1]
        if ":" in token:
            # additive blend 'Happy:0.6,Sad:0.4' (same spec as cli.sample)
            from ..sample.styles import blend_styles

            names, weights = zip(*(p.split(":") for p in token.split(",")))
            return blend_styles(names, [float(w) for w in weights])
        onehot = zf.style_onehot(token)
        if onehot is None:
            raise ValueError(f"unknown style token {token!r}")
        return onehot

    src = open(args.requests) if args.requests else sys.stdin

    import threading
    from collections import deque

    pending = deque()
    plock = threading.Condition()
    out_lock = threading.Lock()
    done_reading = False
    # backpressure: without a bound, the read loop decodes and enqueues an
    # ENTIRE large JSONL batch (10k × 30 s wavs ≈ 10 GB of float32) while
    # the engine drains max_batch at a time — RSS grows until OOM
    inflight = threading.Semaphore(max(4 * args.max_batch, 8))

    def say(obj):
        # one result line per request; emitter thread and main thread
        # both print, so serialize the writes
        with out_lock:
            print(json.dumps(obj), flush=True)

    def emit(req, out_path, fut):
        try:
            poses = fut.result()
            zf.pose_features_to_bvh(poses, out_path, smoothing=True)
            say({"wav": req["wav"], "out": out_path,
                 "frames": int(poses.shape[0])})
        except Exception as e:
            say({"wav": req["wav"], "error": str(e)})
        finally:
            inflight.release()

    def emitter():
        # dedicated consumer: results print in submit order the moment
        # each future resolves, independent of the input stream. A drain
        # hook on the read loop is NOT enough — an interactive
        # request/response client (write one line, block reading the
        # result) would deadlock with the reader, and a bursty producer
        # that goes idle would leave every finished pose array pinned
        # until EOF.
        while True:
            with plock:
                while not pending and not done_reading:
                    plock.wait()
                if not pending:
                    return
                item = pending.popleft()
            emit(*item)  # blocks on the future in this thread only

    emit_thread = threading.Thread(target=emitter, daemon=True)
    emit_thread.start()
    try:
        for line in src:
            line = line.strip()
            if not line:
                continue
            try:
                req = json.loads(line)
                wav_path = req["wav"]
            except Exception as e:
                # one malformed line must not abandon the whole run
                say({"line": line[:200], "error": str(e)})
                continue
            out_path = req.get("out") or (os.path.splitext(wav_path)[0] + "_gen.bvh")
            inflight.acquire()  # released by emit() when the result lands
            try:
                style = parse_style(req.get("style"), wav_path)
                fut = server.submit(load_wav_16k(wav_path), style)
                with plock:
                    pending.append((req, out_path, fut))
                    plock.notify()
            except Exception as e:
                inflight.release()
                say({"wav": wav_path, "error": str(e)})
    finally:
        with plock:
            done_reading = True
            plock.notify()
        emit_thread.join()
        if args.requests:
            src.close()
        server.stop()
    say({"served": server.requests_served,
         "batches": server.batches_served})


if __name__ == "__main__":
    main()
