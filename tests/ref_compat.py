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


def _stub_missing_modules():
    """Stub optional deps the reference imports but never uses on tested
    paths (librosa/easydict/omegaconf are absent in this environment)."""
    if "librosa" not in sys.modules:
        try:
            import librosa  # noqa: F401
        except ImportError:
            sys.modules["librosa"] = types.ModuleType("librosa")
    if "easydict" not in sys.modules:
        try:
            import easydict  # noqa: F401
        except ImportError:
            mod = types.ModuleType("easydict")

            class EasyDict(dict):
                def __getattr__(self, k):
                    try:
                        return self[k]
                    except KeyError as e:  # pragma: no cover
                        raise AttributeError(k) from e

                def __setattr__(self, k, v):
                    self[k] = v

            mod.EasyDict = EasyDict
            sys.modules["easydict"] = mod
    if "omegaconf" not in sys.modules:
        try:
            import omegaconf  # noqa: F401
        except ImportError:
            mod = types.ModuleType("omegaconf")
            mod.DictConfig = dict
            sys.modules["omegaconf"] = mod


def import_ref_zeggs_sample():
    """Import the reference's windowed inference module
    (`main/mydiffusion_zeggs/sample.py`) with its CWD-relative sys.path
    resolved and optional deps stubbed. Returns the module; the caller must
    set its `mydevice`, `batch_size`, and `save_dir` globals before calling
    `inference(...)`."""
    name = "ref_zeggs_sample"
    if name in sys.modules:
        return sys.modules[name]

    _stub_missing_modules()
    import_ref_diffusion()  # humanml stubs + main/ on path

    zeggs_dir = os.path.join(REFERENCE_MAIN, "mydiffusion_zeggs")
    for p in (
        zeggs_dir,
        REFERENCE_MAIN,
        os.path.join(REFERENCE_MAIN, "process"),
        os.path.join(REFERENCE_MAIN, "model"),
        "/root/reference/ubisoft-laforge-ZeroEGGS-main",
        "/root/reference/ubisoft-laforge-ZeroEGGS-main/ZEGGS",
    ):
        if p not in sys.path:
            sys.path.insert(0, p)

    import importlib.util

    cwd = os.getcwd()
    os.chdir(zeggs_dir)  # the module appends CWD-relative sys.path entries
    try:
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(zeggs_dir, "sample.py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    finally:
        os.chdir(cwd)
        # drop the CWD-relative entries the reference module appended
        sys.path[:] = [p for p in sys.path if os.path.isabs(p) or p == ""]
    return mod


def import_ref_mdm():
    """Import the ZEGGS MDM (needs local_attention package on path)."""
    model_dir = os.path.join(REFERENCE_MAIN, "model")
    for p in (REFERENCE_MAIN, model_dir):
        if p not in sys.path:
            sys.path.insert(0, p)
    from model.mdm import MDM  # type: ignore

    return MDM
