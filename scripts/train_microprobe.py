"""Train-step time decomposition + variant probe (rounds 3-5).

BENCH_MODE=train measures ~80 ms f32 / ~70 ms bf16 per step at the
reference configuration (batch 300 × (88,1141)) — 8.7%/9.9% MFU. This
probe answers "where does the step go and is there a cheap win":

  * fwd-only loss vs fwd+bwd vs full step (grad+Adam+EMA+metrics),
    with DERIVED bwd_ms = fwd_bwd − fwd and opt_ms = step − fwd_bwd
  * remat (activation rematerialization) on/off
  * batch 300 vs 600 (does amortization help at d=256?)
  * bf16 for each

Round-5 methodology fixes (VERDICT r4 item 3 — the r4 artifact
published f32 fwd_ms 105 > fwd_bwd_ms 79.7, an impossible row):

  * the fwd / fwd+bwd / step programs are timed INTERLEAVED (multiple
    rounds of fwd→vag→step→fwd→…) so slow drift of the shared dev
    tunnel/chip cannot skew one program's mean against another's —
    the r4 run timed each program in one contiguous block;
  * per-program medians + MAD over rounds are reported, not single
    means;
  * each jitted program's XLA cost analysis (GFLOPs, HBM bytes) is
    emitted alongside its time, so a genuine compilation difference
    (e.g. different matmul precision between the fwd-only and the
    differentiated program) is visible in the artifact instead of
    surfacing as an "impossible" wall-time row;
  * rows where the derived bwd_ms or opt_ms comes out negative beyond
    noise are flagged `"suspect": true` rather than published bare.

Writes TRAIN_MICROPROBE.jsonl and prints a summary. Decisions land in
ROADMAP.md like the int8/Pallas/unroll probes.

Run: `timeout 3600 python scripts/train_microprobe.py`
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

ROUNDS = int(os.environ.get("PROBE_ROUNDS", "6"))
CHAIN = int(os.environ.get("PROBE_CHAIN", "5"))


def cost_summary(compiled) -> dict:
    """GFLOPs + HBM-traffic estimate from XLA's cost analysis."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {
            "gflops": round(float(ca.get("flops", 0.0)) / 1e9, 2),
            "hbm_gb": round(float(ca.get("bytes accessed", 0.0)) / 1e9, 3),
        }
    except Exception as e:  # pragma: no cover
        return {"cost_analysis": f"unavailable: {e}"[:80]}


def median_mad(xs):
    med = float(np.median(xs))
    mad = 1.4826 * float(np.median([abs(x - med) for x in xs]))
    return med, mad


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

                def fwd_eval(p, b, key):
                    """Same loss, dropout OFF (train=False, no rng
                    plumbing): isolates the dropout-mask + RNG cost
                    inside the training forward."""
                    from diffusestylegesture_tpu.diffusion import gaussian as G
                    from diffusestylegesture_tpu.diffusion import resample

                    xs, cc, mask = builder(b)
                    t, w = resample.uniform_sample_t(key, B, 1000)
                    noise = jax.random.normal(key, xs.shape, jnp.float32)

                    def mf(x, tt):
                        return apply(p, x, tt, cc).astype(jnp.float32)
                    terms, _ = G.training_losses(sched, mf, xs, t, noise, mask)
                    return jnp.mean(terms["loss"])

                cparams = cast(params)

                # AOT-compile each program so (a) compile time stays out
                # of every timed window and (b) cost_analysis is exact
                progs = {}
                # fwd-only is remat-independent (checkpointing only
                # changes the BACKWARD pass) — measure under remat=False
                if not remat:
                    progs["fwd"] = (
                        jax.jit(lambda k, p, b: fwd_only(p, b, k))
                        .lower(jax.random.PRNGKey(1), cparams, batch)
                        .compile())
                    progs["fwd_nodrop"] = (
                        jax.jit(lambda k, p, b: fwd_eval(p, b, k))
                        .lower(jax.random.PRNGKey(1), cparams, batch)
                        .compile())
                progs["fwd_bwd"] = (
                    jax.jit(lambda k, p, b: jax.value_and_grad(
                        lambda pp: fwd_only(pp, b, k))(p))
                    .lower(jax.random.PRNGKey(1), cparams, batch)
                    .compile())

                # the full step mutates/donates state — time it over its
                # own chained loop each round, interleaved with the others
                step = jax.jit(
                    make_train_step(apply, sched, tcfg, builder),
                    donate_argnums=(0,))
                state = create_train_state(
                    jax.tree.map(jnp.copy, params), tcfg, 1000)
                state, _ = step(state, batch, jax.random.PRNGKey(1))
                jax.block_until_ready(state.params)

                # warmup every program once before ANY timed round
                for name, prog in progs.items():
                    jax.block_until_ready(
                        prog(jax.random.PRNGKey(1), cparams, batch))

                # interleaved rounds: fwd → vag → step per round so
                # tunnel/chip drift hits all three alike
                times = {name: [] for name in progs}
                times["step"] = []
                for r in range(ROUNDS):
                    for name, prog in progs.items():
                        t0 = time.perf_counter()
                        for c in range(CHAIN):
                            out = prog(jax.random.PRNGKey(100 + r * CHAIN + c),
                                       cparams, batch)
                        jax.block_until_ready(out)
                        times[name].append(
                            (time.perf_counter() - t0) / CHAIN)
                    t0 = time.perf_counter()
                    for c in range(CHAIN):
                        state, m = step(state, batch,
                                        jax.random.PRNGKey(200 + r * CHAIN + c))
                    jax.block_until_ready(state.params)
                    times["step"].append((time.perf_counter() - t0) / CHAIN)

                row = {"batch": B, "dtype": dtype, "remat": remat,
                       "dropout_rng": tcfg.dropout_rng_impl,
                       "rounds": ROUNDS, "chain": CHAIN}
                for name in times:
                    med, mad = median_mad(times[name])
                    key_name = {"fwd": "fwd_ms", "fwd_bwd": "fwd_bwd_ms",
                                "fwd_nodrop": "fwd_nodrop_ms",
                                "step": "step_ms"}[name]
                    row[key_name] = round(med * 1e3, 1)
                    row[key_name.replace("_ms", "_mad_ms")] = round(mad * 1e3, 2)
                for name, prog in progs.items():
                    row[f"{name}_cost"] = cost_summary(prog)
                # derived decomposition + self-consistency check
                if "fwd_ms" in row:
                    row["bwd_ms_derived"] = round(
                        row["fwd_bwd_ms"] - row["fwd_ms"], 1)
                row["opt_ms_derived"] = round(
                    row["step_ms"] - row["fwd_bwd_ms"], 1)
                noise = 2.0 * (row.get("fwd_bwd_mad_ms", 0)
                               + row.get("fwd_mad_ms", 0)
                               + row.get("step_mad_ms", 0))
                row["suspect"] = bool(
                    row.get("bwd_ms_derived", 0) < -noise
                    or row["opt_ms_derived"] < -noise)
                emit(row)


if __name__ == "__main__":
    main()
