"""Train-step time decomposition + variant probe (round 3).

BENCH_MODE=train measures 80 ms f32 / 70 ms bf16 per step at the
reference configuration (batch 300 × (88,1141)) — 8.7%/9.9% MFU. This
probe answers "where does the step go and is there a cheap win":

  * fwd-only loss vs fwd+bwd vs full step (grad+Adam+EMA+metrics)
  * remat (activation rematerialization) on/off
  * batch 300 vs 600 (does amortization help at d=256?)
  * bf16 for each

Writes TRAIN_MICROPROBE.jsonl and prints a summary. Decisions land in
ROADMAP.md like the int8/Pallas/unroll probes.

Run: `timeout 1800 python scripts/train_microprobe.py`
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffusestylegesture_tpu import diffusion as D  # noqa: E402
from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig  # noqa: E402
from diffusestylegesture_tpu.train import (  # noqa: E402
    TrainConfig, create_train_state, make_train_step)
from diffusestylegesture_tpu.train.state import make_zeggs_cond_builder  # noqa: E402
from diffusestylegesture_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache)


def timed_chained(fn, key, *args, reps=8):
    """Steady-state per-call time: enqueue `reps` jitted calls with fresh
    host-made keys and sync ONCE at the end — a per-call
    block_until_ready adds a host↔device round trip per step, which
    through a remote tunnel inflates an 80 ms step to ~113 ms.

    Keys are built with `jax.random.key_data`-free host constants
    (PRNGKey(i)) BEFORE the timed region: the previous version chained
    keys via an eager `fold_in((loss*0).astype(int32))`, which dispatched
    3 eager ops per rep through the tunnel and published incoherent rows
    (f32 fwd-only 255 ms > the 82 ms full step — VERDICT r3 item 6)."""
    keys = [jax.random.PRNGKey(1000 + i) for i in range(reps)]
    out = fn(key, *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for k in keys:
        out = fn(k, *args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    enable_persistent_cache()
    T = 88
    sched = D.Schedule.create(D.named_beta_schedule("cosine", 1000))
    out_path = os.path.join(REPO, "TRAIN_MICROPROBE.jsonl")
    # truncate up front and append per row: a timeout mid-run must not
    # leave the old (pre-fix) artifact in place (round-4 first attempt
    # lost the whole run to the end-of-run write)
    open(out_path, "w").close()

    def emit(row):
        print(json.dumps(row), flush=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    for B in (300, 600):
        rng = np.random.default_rng(0)
        batch = jax.device_put({
            "motion": rng.standard_normal((B, T, 1141)).astype(np.float32),
            "style": np.eye(6, dtype=np.float32)[rng.integers(0, 6, B)],
            "wavlm": rng.standard_normal((B, T, 1024)).astype(np.float32),
        })
        jax.block_until_ready(batch)
        builder = make_zeggs_cond_builder(8)

        for dtype in ("float32", "bfloat16"):
            for remat in (False, True):
                mcfg = MDMConfig(dtype=jnp.dtype(dtype), remat=remat)
                model = MDM(mcfg)

                def apply(p, xx, tt, cc, train=False, rngs=None, uncond=None):
                    return model.apply(p, xx, tt, cc, train=train, rngs=rngs,
                                       uncond=uncond)

                x0, cond, _ = builder(batch)
                params = jax.jit(model.init)(
                    jax.random.PRNGKey(0), x0,
                    jnp.zeros((B,), jnp.int32), cond)
                tcfg = TrainConfig(lr=3e-5, compute_dtype=dtype)
                step = jax.jit(
                    make_train_step(apply, sched, tcfg, builder),
                    donate_argnums=(0,))

                # fwd-only: loss value without grad. Dropout key wrapped
                # the same way the train step wraps it (rbg by default,
                # utils/rng.py) — mixing impls here would re-publish
                # incoherent fwd>step rows (threefry masks alone are
                # ~88 ms at B=300).
                def fwd_only(p, b, key):
                    from diffusestylegesture_tpu.diffusion import gaussian as G
                    from diffusestylegesture_tpu.diffusion import resample
                    from diffusestylegesture_tpu.utils import rng as tpu_rng

                    xs, cc, mask = builder(b)
                    t, w = resample.uniform_sample_t(key, B, 1000)
                    noise = jax.random.normal(key, xs.shape, jnp.float32)
                    kdo = (tpu_rng.rbg_key(key)
                           if tcfg.dropout_rng_impl == "rbg" else key)

                    def mf(x, tt):
                        return apply(p, x, tt, cc, train=True,
                                     rngs={"cond_mask": key, "dropout": kdo}
                                     ).astype(jnp.float32)
                    terms, _ = G.training_losses(sched, mf, xs, t, noise, mask)
                    return jnp.mean(terms["loss"])

                def cast(p):
                    if dtype == "bfloat16":
                        return jax.tree.map(
                            lambda a: a.astype(jnp.bfloat16)
                            if a.dtype == jnp.float32 else a, p)
                    return p

                # fwd-only is remat-independent (checkpointing only changes
                # the BACKWARD pass) — measure it once per (B, dtype)
                dt_fwd = None
                if not remat:
                    jfwd = jax.jit(lambda k, p, b: fwd_only(p, b, k))
                    dt_fwd = timed_chained(
                        jfwd, jax.random.PRNGKey(1), cast(params), batch)

                # fwd+bwd without the optimizer: step − vag isolates
                # AdamW/EMA/metrics cost, and vag − fwd isolates the
                # backward pass, making the rows self-consistent by
                # construction (r3's artifact published fwd > step)
                jvag = jax.jit(
                    lambda k, p, b: jax.value_and_grad(
                        lambda pp: fwd_only(pp, b, k))(p))
                dt_vag = timed_chained(
                    jvag, jax.random.PRNGKey(1), cast(params), batch)

                state = create_train_state(jax.tree.map(jnp.copy, params), tcfg, 1000)

                # donated state chains iterations naturally; sync once at
                # the end (steady-state, same methodology as bench.py)
                s, _ = step(state, batch, jax.random.PRNGKey(1))
                jax.block_until_ready(s.params)
                n = 10
                t0 = time.perf_counter()
                for i in range(n):
                    s, m = step(s, batch, jax.random.PRNGKey(2 + i))
                jax.block_until_ready(s.params)
                dt_step = (time.perf_counter() - t0) / n

                row = {
                    "batch": B, "dtype": dtype, "remat": remat,
                    "dropout_rng": tcfg.dropout_rng_impl,
                    "fwd_bwd_ms": round(dt_vag * 1e3, 1),
                    "step_ms": round(dt_step * 1e3, 1),
                }
                if dt_fwd is not None:
                    row["fwd_ms"] = round(dt_fwd * 1e3, 1)
                emit(row)


if __name__ == "__main__":
    main()
