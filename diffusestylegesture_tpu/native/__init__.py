"""Native (C++) data-path accelerators, loaded via ctypes.

Builds `libbvh_fast.so` on first use (g++, cached next to the sources) and
exposes `parse_bvh_fast(path)` returning the same `ChannelData` structure
as `motion.pipeline.parse_bvh`. Falls back cleanly when no toolchain is
available — every consumer treats this as an optional fast path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libbvh_fast.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False


def _build() -> bool:
    src = os.path.join(_HERE, "bvh_fast.cpp")
    # compile to a per-process temp name, then atomically publish: parallel
    # prepare-data workers (spawned processes — _LOCK is per-process only)
    # may build concurrently, and a reader must never CDLL a half-written
    # .so that another process's g++ is still emitting
    tmp = f"{_SO_PATH}.tmp.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", tmp],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, _SO_PATH)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _FAILED
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        src = os.path.join(_HERE, "bvh_fast.cpp")
        have_so = os.path.exists(_SO_PATH)
        # rebuild when the source is newer; a missing source (deploys that
        # ship only the .so) just uses the prebuilt library
        stale = (
            have_so and os.path.exists(src)
            and os.path.getmtime(_SO_PATH) < os.path.getmtime(src)
        )
        if not have_so or stale:
            if not _build() and not have_so:
                # no library at all → Python fallback; a stale-but-working
                # .so is still better than the 10-40x slower Python path
                _FAILED = True
                return None
        try:
            lib = _bind(ctypes.CDLL(_SO_PATH))
        except Exception:
            # corrupt or ABI-incompatible .so (killed build, foreign
            # prebuilt): one rebuild attempt, then the promised Python
            # fallback — an unguarded CDLL here aborted every BVH parse
            if _build():
                try:
                    lib = _bind(ctypes.CDLL(_SO_PATH))
                except Exception:
                    _FAILED = True
                    return None
            else:
                _FAILED = True
                return None
        _LIB = lib
        return _LIB


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.bvh_parse.restype = ctypes.c_void_p
    lib.bvh_parse.argtypes = [ctypes.c_char_p]
    lib.bvh_num_frames.restype = ctypes.c_long
    lib.bvh_num_frames.argtypes = [ctypes.c_void_p]
    lib.bvh_num_channels.restype = ctypes.c_long
    lib.bvh_num_channels.argtypes = [ctypes.c_void_p]
    lib.bvh_num_joints.restype = ctypes.c_long
    lib.bvh_num_joints.argtypes = [ctypes.c_void_p]
    lib.bvh_frametime.restype = ctypes.c_double
    lib.bvh_frametime.argtypes = [ctypes.c_void_p]
    lib.bvh_error.restype = ctypes.c_char_p
    lib.bvh_error.argtypes = [ctypes.c_void_p]
    lib.bvh_channel_names.restype = ctypes.c_char_p
    lib.bvh_channel_names.argtypes = [ctypes.c_void_p]
    lib.bvh_joint_names.restype = ctypes.c_char_p
    lib.bvh_joint_names.argtypes = [ctypes.c_void_p]
    lib.bvh_parents.restype = ctypes.POINTER(ctypes.c_int)
    lib.bvh_parents.argtypes = [ctypes.c_void_p]
    lib.bvh_offsets.restype = ctypes.POINTER(ctypes.c_float)
    lib.bvh_offsets.argtypes = [ctypes.c_void_p]
    lib.bvh_values.restype = ctypes.POINTER(ctypes.c_double)
    lib.bvh_values.argtypes = [ctypes.c_void_p]
    lib.bvh_free.restype = None
    lib.bvh_free.argtypes = [ctypes.c_void_p]
    return lib


def available() -> bool:
    return _load() is not None


def parse_bvh_fast(path: str):
    """C++-parsed `ChannelData` (see `motion.pipeline.ChannelData`)."""
    from ..motion.pipeline import ChannelData

    lib = _load()
    if lib is None:
        raise RuntimeError("native BVH parser unavailable (no g++?)")
    h = lib.bvh_parse(path.encode())
    try:
        err = lib.bvh_error(h)
        if err:
            raise IOError(f"bvh parse failed: {err.decode()}")
        T = lib.bvh_num_frames(h)
        C = lib.bvh_num_channels(h)
        J = lib.bvh_num_joints(h)
        names = lib.bvh_joint_names(h).decode().splitlines()
        columns = lib.bvh_channel_names(h).decode().splitlines()
        parents_idx = np.ctypeslib.as_array(lib.bvh_parents(h), shape=(J,)).copy()
        offsets_arr = np.ctypeslib.as_array(lib.bvh_offsets(h), shape=(J, 3)).copy()
        values = np.ctypeslib.as_array(lib.bvh_values(h), shape=(T, C)).copy()
        frametime = lib.bvh_frametime(h)
    finally:
        lib.bvh_free(h)

    parents = {
        names[i]: (names[parents_idx[i]] if parents_idx[i] >= 0 else None)
        for i in range(J)
    }
    offsets = {names[i]: offsets_arr[i] for i in range(J)}
    channels = {n: [] for n in names}
    for c in columns:
        joint, chan = c.rsplit("_", 1)
        channels[joint].append(chan)
    root = names[0]
    return ChannelData(
        names, parents, offsets, channels, columns, values, frametime, root
    )
