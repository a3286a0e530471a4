"""Ahead-of-time executable serialization (cold-start elimination).

The persistent compilation cache removes XLA compile time but NOT the
jaxpr→StableHLO lowering of the big nested-scan engines (~25 s for the
1000-step sampler — tracing happens before the cache is consulted). For
production rollouts this module snapshots the fully compiled executable
(`jax.experimental.serialize_executable`), so a warm start skips
tracing, lowering, AND compilation:

    exe = aot_compile(fn, example_args, "/path/engine.aotx")
    out = exe(*args)   # same shapes/dtypes as example_args

The snapshot is keyed implicitly by the caller's path choice; it is only
valid for the same jaxlib version, backend, and argument
shapes/dtypes/shardings — `aot_compile` falls back to a fresh
compile-and-save when loading fails for any reason.
"""
from __future__ import annotations

import os
import pickle
from typing import Callable

import jax


def aot_compile(fn: Callable, example_args: tuple, path: str, verbose: bool = False):
    """Compile `fn(*example_args)` (or load the saved executable) and
    return a callable over arguments with the same structure/avals.

    Execution is pinned to the first local device (uncommitted inputs would
    otherwise let GSPMD pick a multi-device layout that the snapshot then
    requires forever); the returned callable commits its arguments the
    same way.
    """
    from jax.experimental import serialize_executable as se

    dev = jax.devices()[0]

    def commit(args):
        return jax.tree.map(lambda a: jax.device_put(a, dev), args)

    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            # pin the reloaded executable to the single compile device —
            # execution_devices otherwise defaults to ALL local devices and
            # the program then demands 8-way-sharded inputs
            loaded = se.deserialize_and_load(
                payload, in_tree, out_tree, execution_devices=[dev]
            )
            # validate with one real execution (also the warm-up): stale or
            # incompletely-serialized snapshots can fail only at run time
            jax.block_until_ready(loaded(*commit(example_args)))
            if verbose:
                print(f"aot: loaded {path}")

            def run_loaded(*args):
                return loaded(*commit(args))

            return run_loaded
        except Exception as e:  # stale jaxlib/backend/shape → recompile
            if verbose:
                print(f"aot: reload failed ({type(e).__name__}: {e}); recompiling")

    # compile with the persistent compilation cache bypassed: a cache HIT
    # returns an executable deserialized from disk whose RE-serialization
    # is incomplete (missing buffer-definition events → NOT_FOUND at run
    # time when the snapshot is loaded later)
    prev_cache = getattr(jax.config, "jax_compilation_cache_dir", None)
    try:
        if prev_cache is not None:
            jax.config.update("jax_compilation_cache_dir", None)
        compiled = jax.jit(fn).lower(*commit(example_args)).compile()
        payload, in_tree, out_tree = se.serialize(compiled)
    finally:
        if prev_cache is not None:
            jax.config.update("jax_compilation_cache_dir", prev_cache)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        pickle.dump((payload, in_tree, out_tree), f)
    os.replace(tmp, path)
    if verbose:
        print(f"aot: compiled and saved {path}")

    def run_compiled(*args):
        return compiled(*commit(args))

    return run_compiled
