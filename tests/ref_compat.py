"""Helpers to import the PyTorch reference (read-only) for parity tests.

The reference targets torch 1.9 / numpy<1.20; a couple of its transitive
imports (`data_loaders.humanml.scripts.motion_process`) use removed numpy
aliases, so we stub them out — the diffusion module only imports the name,
never uses it on the paths we test.
"""
import os
import sys
import types


def stub_module(name: str) -> types.ModuleType:
    """An importable stub with a real ModuleSpec — `__spec__ = None`
    breaks `importlib.util.find_spec` probes (e.g. transformers'
    `_is_package_available('librosa')` raises ValueError)."""
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod

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
                sys.modules[p] = stub_module(p)
        mod = stub_module(name)
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
            sys.modules["librosa"] = stub_module("librosa")
    if "easydict" not in sys.modules:
        try:
            import easydict  # noqa: F401
        except ImportError:
            mod = stub_module("easydict")

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
            mod = stub_module("omegaconf")
            mod.DictConfig = dict
            sys.modules["omegaconf"] = mod


def _stub_audio_toolchain():
    """Stub the audio-processing libs `BEAT-TWH-main/process/tool.py`
    imports at module level (absent in this env; only needed on feature-
    extraction paths we don't exercise)."""

    def _stub(name):
        if name in sys.modules:
            return
        try:
            __import__(name)
        except ImportError:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
            if "." in name:
                parent, child = name.rsplit(".", 1)
                _stub(parent)
                setattr(sys.modules[parent], child, mod)

    for name in (
        "librosa",
        "librosa.display",
        "essentia",
        "essentia.standard",
        "pydub",
        "parselmouth",
        "textgrid",
        "transforms3d",
        "transforms3d.euler",
        "transforms3d.quaternions",
    ):
        _stub(name)
    if not hasattr(sys.modules["pydub"], "AudioSegment"):
        sys.modules["pydub"].AudioSegment = object


def import_ref_beat_sample():
    """Import the reference BEAT/TWH windowed inference module
    (`BEAT-TWH-main/mydiffusion_beat_twh/sample.py`).

    The BEAT tree reuses the top-level package names of `main/` (`model`,
    `utils`, `diffusion`); `utils` is a namespace package merged across
    sys.path portions, so BEAT paths are inserted at the FRONT. Modules
    already cached from `main/` (diffusion, utils.model_util) are content-
    identical for the symbols sample.py touches. Caller sets `mydevice`,
    `batch_size` globals before `inference(...)`."""
    name = "ref_beat_sample"
    if name in sys.modules:
        return sys.modules[name]

    _stub_missing_modules()
    _stub_audio_toolchain()
    import_ref_diffusion()

    beat_dir = os.path.join(REFERENCE_BEAT, "mydiffusion_beat_twh")
    for p in (
        REFERENCE_BEAT,
        os.path.join(REFERENCE_BEAT, "process"),
        os.path.join(REFERENCE_BEAT, "model"),
        beat_dir,
    ):
        if p in sys.path:
            sys.path.remove(p)
        sys.path.insert(0, p)

    import importlib.util

    cwd = os.getcwd()
    os.chdir(beat_dir)
    try:
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(beat_dir, "sample.py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    finally:
        os.chdir(cwd)
        sys.path[:] = [p for p in sys.path if os.path.isabs(p) or p == ""]
    return mod


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


def import_ref_beat_mdm():
    """Import the BEAT/TWH MDM (+/++ variants). The module file is named
    `mdm.py` in a dir that shadows `main/model` — import it as top-level
    `mdm` with the BEAT model dir first on sys.path."""
    import importlib

    model_dir = os.path.join(REFERENCE_BEAT, "model")
    if model_dir in sys.path:
        sys.path.remove(model_dir)
    sys.path.insert(0, model_dir)
    if "mdm" in sys.modules:
        del sys.modules["mdm"]
    import mdm as beat_mdm_mod  # type: ignore

    if "BEAT-TWH-main" not in beat_mdm_mod.__file__:
        beat_mdm_mod = importlib.reload(beat_mdm_mod)
    assert "BEAT-TWH-main" in beat_mdm_mod.__file__
    return beat_mdm_mod.MDM


def import_ref_mdm():
    """Import the ZEGGS MDM (needs local_attention package on path).

    The BEAT tree shadows the `model` package name; if a BEAT import ran
    first, purge the cached package and force `main/` to win."""
    model_dir = os.path.join(REFERENCE_MAIN, "model")
    for p in (REFERENCE_MAIN, model_dir):
        if p in sys.path:
            sys.path.remove(p)
        sys.path.insert(0, p)
    cached = sys.modules.get("model.mdm")
    if cached is not None and "/main/" not in getattr(cached, "__file__", ""):
        for k in [k for k in sys.modules if k == "model" or k.startswith("model.")]:
            del sys.modules[k]
    from model.mdm import MDM  # type: ignore

    assert "/main/" in sys.modules["model.mdm"].__file__
    return MDM
