"""Helpers to import the PyTorch reference (read-only) for parity tests.

The reference targets torch 1.9 / numpy<1.20; a couple of its transitive
imports (`data_loaders.humanml.scripts.motion_process`) use removed numpy
aliases, so we stub them out — the diffusion module only imports the name,
never uses it on the paths we test.
"""
import os
import sys
import types

REFERENCE_MAIN = "/root/reference/main"
REFERENCE_BEAT = "/root/reference/BEAT-TWH-main"


def import_ref_diffusion():
    if REFERENCE_MAIN not in sys.path:
        sys.path.insert(0, REFERENCE_MAIN)
    # Stub the unused humanml import chain (np.float removal breaks it).
    name = "data_loaders.humanml.scripts.motion_process"
    if name not in sys.modules:
        pkgs = [
            "data_loaders",
            "data_loaders.humanml",
            "data_loaders.humanml.scripts",
        ]
        for p in pkgs:
            if p not in sys.modules:
                sys.modules[p] = types.ModuleType(p)
        mod = types.ModuleType(name)
        mod.recover_from_ric = lambda *a, **k: None
        sys.modules[name] = mod
    import diffusion.gaussian_diffusion as gd  # type: ignore
    import diffusion.respace as respace  # type: ignore

    return gd, respace


def import_ref_mdm():
    """Import the ZEGGS MDM (needs local_attention package on path)."""
    model_dir = os.path.join(REFERENCE_MAIN, "model")
    for p in (REFERENCE_MAIN, model_dir):
        if p not in sys.path:
            sys.path.insert(0, p)
    from model.mdm import MDM  # type: ignore

    return MDM
