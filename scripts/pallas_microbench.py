"""On-chip Pallas-vs-XLA microbenchmark (VERDICT r1 item 5).

Runs BOTH custom kernels compiled (not interpret mode) on the real TPU,
checks numerics against the XLA paths on-device, and times them at the
flagship shapes (batch 1 and the serving batch 16). Because the chip sits
behind a remote-dispatch tunnel (~24 ms RTT per call), each measurement
scans ITERS applications inside a single jit and divides — the same way
the sampler amortizes dispatch in production.

The results drive the keep/demote decision recorded in ROADMAP.md and
the kernel docstrings.

Usage: python scripts/pallas_microbench.py
Prints one JSON line per comparison.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 200


def chain_timer(fn_one):
    """jit(x → scan of ITERS dependent applications); returns s/iter."""
    import jax

    @jax.jit
    def chained(x):
        def body(h, _):
            return fn_one(h), None

        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return out

    def run(x):
        chained(x).block_until_ready()  # compile + warm
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            chained(x).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best / ITERS

    return run


def main():
    import jax
    import jax.numpy as jnp

    from diffusestylegesture_tpu.models.local_attention import local_attention
    from diffusestylegesture_tpu.ops.local_attention_pallas import local_attention_pallas

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} ({dev.platform}), {ITERS} chained iters")

    results = []

    # ---- local attention, flagship dims (H=8, N=88, head_dim=32, w=11) ----
    for B in (1, 16):
        BH, N, Dh, w = 8 * B, 88, 32, 11
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((BH, N, Dh)).astype(np.float32))
        mask = jnp.ones((B, N), bool)

        xla_one = lambda q: local_attention(q, q, q, w, mask, heads=8, impl="xla")  # noqa: E731
        pls_one = lambda q: local_attention_pallas(q, q, q, w, mask, heads=8)  # noqa: E731
        a = np.asarray(jax.jit(xla_one)(q))
        b = np.asarray(jax.jit(pls_one)(q))
        err = float(np.abs(a - b).max())
        t_xla = chain_timer(xla_one)(q)
        t_pls = chain_timer(pls_one)(q)
        results.append(
            dict(
                kernel="local_attention", batch=B, max_err=err,
                xla_us=round(t_xla * 1e6, 2), pallas_us=round(t_pls * 1e6, 2),
                speedup=round(t_xla / t_pls, 3),
            )
        )

    # ---- fused encoder layer at flagship dims ----
    from diffusestylegesture_tpu.models.transformer import TorchEncoderLayer
    from diffusestylegesture_tpu.ops.encoder_layer_pallas import encoder_layer_pallas

    for B in (1, 16):
        T, D, FF, H = 89, 256, 1024, 4
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32) * 0.1)
        layer = TorchEncoderLayer(D, H, FF, dropout=0.0)
        params = layer.init(jax.random.PRNGKey(0), x)
        p = params["params"]

        flax_one = lambda x: layer.apply(params, x)  # noqa: E731
        fused_one = lambda x: encoder_layer_pallas(x, p, nhead=H)  # noqa: E731
        a = np.asarray(jax.jit(flax_one)(x))
        b = np.asarray(jax.jit(fused_one)(x))
        err = float(np.abs(a - b).max())
        t_xla = chain_timer(flax_one)(x)
        t_pls = chain_timer(fused_one)(x)
        results.append(
            dict(
                kernel="encoder_layer", batch=B, max_err=err,
                xla_us=round(t_xla * 1e6, 2), pallas_us=round(t_pls * 1e6, 2),
                speedup=round(t_xla / t_pls, 3),
            )
        )

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
