"""Where does the denoiser-trunk time go at serving shapes?

Measures one 8-layer trunk forward at batch-16 bf16 serving shapes
(T=89, d=256, ff=1024, heads 4) with pieces ablated:

  * full            — LN + MHA + erf-GELU FFN (the serving config)
  * gelu_tanh       — tanh-approx GELU instead of erf
  * no_norm         — LayerNorms removed
  * matmuls_only    — only the projections + FFN matmuls (VPU work gone)

If `matmuls_only` is much faster than `full`, the trunk is VPU-bound
(normalization/softmax/GELU), not MXU-bound, and batch scaling won't
help — which matches the observed batch-16/32 plateau.

Usage: python scripts/trunk_microprobe.py [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
# H=4 matches the flagship trunk (MDMConfig.num_heads=4; the reference's
# '8 heads' comment is its INTERNAL head count) — softmax/VPU work scales
# with H while matmul FLOPs don't, so the wrong head count skews the
# VPU-vs-MXU verdict this probe exists to measure
T, D, FF, H = 89, 256, 1024, 4
DTYPE = jnp.bfloat16
STEPS = 200


class Layer(nn.Module):
    mode: str

    @nn.compact
    def __call__(self, x):
        def mha(x):
            hd = D // H
            q = nn.Dense(D, dtype=DTYPE)(x).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
            k = nn.Dense(D, dtype=DTYPE)(x).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
            v = nn.Dense(D, dtype=DTYPE)(x).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
            if self.mode == "matmuls_only":
                o = (q @ k.transpose(0, 1, 3, 2)) @ v
            else:
                o = jax.nn.softmax((q @ k.transpose(0, 1, 3, 2)) / np.sqrt(hd), -1) @ v
            return nn.Dense(D, dtype=DTYPE)(o.transpose(0, 2, 1, 3).reshape(B, T, D))

        def act(h):
            if self.mode == "gelu_tanh":
                return nn.gelu(h, approximate=True)
            if self.mode == "matmuls_only":
                return h
            return nn.gelu(h, approximate=False)

        def norm(x):
            if self.mode in ("no_norm", "matmuls_only"):
                return x
            return nn.LayerNorm(dtype=DTYPE)(x)

        x = norm(x + mha(x))
        h = nn.Dense(FF, dtype=DTYPE)(x)
        h = nn.Dense(D, dtype=DTYPE)(act(h))
        return norm(x + h)


class Trunk(nn.Module):
    mode: str

    @nn.compact
    def __call__(self, x):
        for _ in range(8):
            x = Layer(self.mode)(x)
        return x


def bench(mode):
    m = Trunk(mode)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, T, D)), DTYPE)
    params = m.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def many(params, x):
        def body(h, _):
            return m.apply(params, h), None

        return jax.lax.scan(body, x, None, length=STEPS)[0]

    # under the axon tunnel block_until_ready can return before the remote
    # computation finishes; a host transfer is the reliable sync
    np.asarray(many(params, x))
    t0 = time.perf_counter()
    np.asarray(many(params, x))
    dt = (time.perf_counter() - t0) / STEPS
    flops = 8 * (4 * 2 * B * T * D * D + 2 * 2 * B * T * D * FF
                 + 2 * 2 * B * T * T * D)
    print(f"{mode:14s} {dt * 1e6:8.1f} us/trunk-fwd   "
          f"{flops / dt / 1e12:6.1f} TFLOP/s effective")
    return dt


if __name__ == "__main__":
    print(f"batch={B} T={T} d={D} ff={FF} bf16, {jax.devices()[0].device_kind}")
    for mode in ("full", "gelu_tanh", "no_norm", "matmuls_only"):
        bench(mode)
