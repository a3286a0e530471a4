"""Persistent-compilation-cache setup (cold-start latency control).

The 1000-step nested-scan engines compile in minutes; with the
persistent cache every executable (engine, WavLM, train step, even the
jitted param inits) round-trips through disk, so a second process warm-
starts in tens of seconds instead. Verified effective under the axon
remote-dispatch tunnel (cache populated and hit; see ROADMAP.md perf
notes).

Call `enable_persistent_cache()` once before building models. The
thresholds are zeroed so small executables (init fns, host utilities)
cache too — eager `model.init` through a remote tunnel otherwise costs
minutes of per-op dispatch.
"""
from __future__ import annotations

import os

DEFAULT_DIR = "/tmp/dsg_tpu_jax_cache"


def enable_persistent_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", DEFAULT_DIR)
    for k, v in (
        ("jax_compilation_cache_dir", path),
        ("jax_persistent_cache_min_compile_time_secs", 0),
        ("jax_persistent_cache_min_entry_size_bytes", 0),
    ):
        try:
            jax.config.update(k, v)
        except Exception:
            pass  # older jax without the knob
    return path
