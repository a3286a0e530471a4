"""Worker process for the REAL multi-process multihost test.

Launched N times by `test_multihost.py` (argv: pid nproc port). Each
process owns 4 virtual CPU devices; `jax.distributed.initialize` forms
one 2-process cluster, and the workers drive the actual product path
from `parallel/multihost.py`:

  per-host numpy batch slice
    → `global_batch_from_host_local` (make_array_from_process_local_data)
    → one jitted TRAIN STEP of the tiny MDM over the global ('data',) mesh
    → loss printed for the launcher to compare against the single-process
      run of the SAME global batch.

This is the cross-host analog the reference never activates
(`main/utils/dist_util.py:18-41` is commented out).
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
mode = sys.argv[4] if len(sys.argv) > 4 else "dp"  # dp | tp_lss

flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc,
    process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffusestylegesture_tpu import diffusion as D  # noqa: E402
from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig  # noqa: E402
from diffusestylegesture_tpu.parallel import multihost  # noqa: E402
from diffusestylegesture_tpu.train import (  # noqa: E402
    TrainConfig, create_train_state, make_train_step)
from diffusestylegesture_tpu.train.state import make_zeggs_cond_builder  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())

# tp_lss: cross-host TENSOR parallelism (Megatron specs over 'model')
# composed with the loss-second-moment importance sampler, whose ring
# history updates inside the sharded step — the distributed all_gather
# path the reference wires but never activates (resample.py:83-104)
if mode == "tp_lss":
    mesh = multihost.global_mesh(axes=("data", "model"),
                                 shape=(2 * nproc, 2))
else:
    mesh = multihost.global_mesh(axes=("data",))

cfg = MDMConfig(njoints=32, latent_dim=128, ff_size=128, num_layers=2,
                n_seed=4, window_size=11)
model = MDM(cfg)
B, T = 8, 22
rng = np.random.default_rng(0)
full = {
    "motion": rng.standard_normal((B, T, cfg.njoints)).astype(np.float32),
    "style": np.eye(6, dtype=np.float32)[rng.integers(0, 6, B)],
    "wavlm": rng.standard_normal((B, T, 1024)).astype(np.float32),
}
# THIS host's slice of the global batch (the data loader's per-host view)
lo, hi = pid * (B // nproc), (pid + 1) * (B // nproc)
local = {k: v[lo:hi] for k, v in full.items()}
gbatch = multihost.global_batch_from_host_local(mesh, local)

x = jnp.zeros((B, cfg.njoints, 1, T))
cond = {"seed": x[..., : cfg.n_seed], "style": jnp.asarray(full["style"]),
        "audio": jnp.asarray(full["wavlm"]), "mask_local": jnp.ones((B, T), bool)}
params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((B,), jnp.int32), cond)


def apply(p, xx, tt, cc, train=False, rngs=None, uncond=None):
    return model.apply(p, xx, tt, cc, train=train, rngs=rngs, uncond=uncond)


sched = D.Schedule.create(D.named_beta_schedule("cosine", 50))
tcfg = TrainConfig(lr=1e-4, schedule_sampler=(
    "loss-second-moment" if mode == "tp_lss" else "uniform"))
step = jax.jit(make_train_step(apply, sched, tcfg, make_zeggs_cond_builder(cfg.n_seed)))

with mesh:
    state = create_train_state(params, tcfg, sched.num_timesteps)
    if mode == "tp_lss":
        from diffusestylegesture_tpu.parallel import (
            mdm_param_specs, shard_params)

        specs = mdm_param_specs(state.params["params"])
        state = state.replace(params={
            "params": shard_params(mesh, state.params["params"], specs)})
    state, metrics = step(state, gbatch, jax.random.PRNGKey(1))
    loss = float(np.asarray(metrics["loss"]))
    gnorm = float(np.asarray(metrics["grad_norm"]))

assert np.isfinite(loss) and np.isfinite(gnorm)
print(f"MULTIHOST_RESULT pid={pid} loss={loss:.8f} gnorm={gnorm:.8f}",
      flush=True)
