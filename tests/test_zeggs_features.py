"""BVH I/O and ZEGGS featurizer tests (incl. reference parity on synthetic motion)."""
import os
import sys
import types
import ref_compat

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_ROOT

from diffusestylegesture_tpu.motion import bvh, zeggs_features as zf


def synth_anim(T=40, seed=0):
    """Synthetic 75-joint ZEGGS-skeleton motion at 60 fps."""
    rng = np.random.default_rng(seed)
    J = zf.ZEGGS_NJOINTS
    rotations = rng.uniform(-30, 30, (T, J, 3)).astype(np.float32)
    offsets = rng.uniform(-5, 5, (J, 3)).astype(np.float32)
    offsets[0] = 0
    positions = np.broadcast_to(offsets, (T, J, 3)).copy()
    positions[:, 0, :] = rng.uniform(-50, 50, (T, 3)) + np.array([0, 100, 0])
    return {
        "rotations": rotations,
        "positions": positions.astype(np.float32),
        "offsets": offsets,
        "parents": zf.ZEGGS_PARENTS,
        "names": list(zf.ZEGGS_BONE_NAMES),
        "order": "zyx",
        "frametime": 1.0 / 60.0,
    }


class TestBVHIO:
    def test_roundtrip(self, tmp_path):
        anim = synth_anim()
        path = str(tmp_path / "a.bvh")
        bvh.save(path, anim, translations=False)
        loaded = bvh.load(path)
        assert loaded["names"] == anim["names"]
        np.testing.assert_array_equal(loaded["parents"], anim["parents"])
        assert loaded["order"] == "zyx"
        np.testing.assert_allclose(loaded["rotations"], anim["rotations"], atol=2e-5)
        np.testing.assert_allclose(loaded["positions"][:, 0], anim["positions"][:, 0], atol=2e-5)

    @requires_reference
    def test_loader_matches_reference(self, tmp_path):
        sys.path.insert(0, f"{REFERENCE_ROOT}/ubisoft-laforge-ZeroEGGS-main/ZEGGS")
        from anim import bvh as ref_bvh  # type: ignore

        anim = synth_anim(seed=1)
        path = str(tmp_path / "b.bvh")
        bvh.save(path, anim)
        ours = bvh.load(path)
        theirs = ref_bvh.load(path)
        np.testing.assert_allclose(ours["rotations"], theirs["rotations"], atol=1e-6)
        np.testing.assert_allclose(ours["positions"], theirs["positions"], atol=1e-6)
        np.testing.assert_array_equal(ours["parents"], theirs["parents"])
        assert ours["order"] == theirs["order"]

    @requires_reference
    def test_saver_matches_reference(self, tmp_path):
        sys.path.insert(0, f"{REFERENCE_ROOT}/ubisoft-laforge-ZeroEGGS-main/ZEGGS")
        from anim import bvh as ref_bvh  # type: ignore

        anim = synth_anim(seed=2)
        ours_path = str(tmp_path / "ours.bvh")
        ref_path = str(tmp_path / "ref.bvh")
        bvh.save(ours_path, anim)
        ref_bvh.save(ref_path, anim)
        a = ref_bvh.load(ours_path)
        b = ref_bvh.load(ref_path)
        np.testing.assert_allclose(a["rotations"], b["rotations"], atol=1e-6)
        np.testing.assert_allclose(a["positions"], b["positions"], atol=1e-6)


class TestFeaturizer:
    def test_shapes(self, tmp_path):
        anim = synth_anim(T=60)
        path = str(tmp_path / "c.bvh")
        bvh.save(path, anim)
        out = zf.featurize_bvh_file(path, fps=20)
        assert out["features"].shape == (20, zf.ZEGGS_FEATURE_DIM)
        assert np.isfinite(out["features"]).all()

    def test_style_onehot(self):
        v = zf.style_onehot("Happy")
        assert v is not None and v.argmax() == 0 and v.sum() == 1
        assert zf.style_onehot("NotAStyle") is None

    @requires_reference
    def test_parity_with_reference(self, tmp_path):
        # stub omegaconf (only DictConfig is imported by the module)
        if "omegaconf" not in sys.modules:
            m = ref_compat.stub_module("omegaconf")
            m.DictConfig = dict
            sys.modules["omegaconf"] = m
        sys.path.insert(0, f"{REFERENCE_ROOT}/ubisoft-laforge-ZeroEGGS-main/ZEGGS")
        sys.path.insert(0, f"{REFERENCE_ROOT}/main/process")
        import process_zeggs_bvh as ref_pz  # type: ignore

        anim = synth_anim(T=120, seed=3)
        path = str(tmp_path / "d.bvh")
        bvh.save(path, anim)

        theirs, parents, dt, order, njoints = ref_pz.preprocess_animation(path, fps=20)
        ours = zf.featurize_bvh_file(path, fps=20)["features"]
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-3)

    @requires_reference
    def test_pose2bvh_parity(self, tmp_path):
        if "omegaconf" not in sys.modules:
            m = ref_compat.stub_module("omegaconf")
            m.DictConfig = dict
            sys.modules["omegaconf"] = m
        sys.path.insert(0, f"{REFERENCE_ROOT}/ubisoft-laforge-ZeroEGGS-main/ZEGGS")
        sys.path.insert(0, f"{REFERENCE_ROOT}/main/process")
        import process_zeggs_bvh as ref_pz  # type: ignore
        from anim import bvh as ref_bvh  # type: ignore

        rng = np.random.default_rng(4)
        # build plausible features from a real featurization, then perturb
        anim = synth_anim(T=120, seed=5)
        src = str(tmp_path / "e.bvh")
        bvh.save(src, anim)
        feats = zf.featurize_bvh_file(src, fps=20)["features"]
        feats = feats + rng.standard_normal(feats.shape).astype(np.float32) * 0.01

        ours_path = str(tmp_path / "ours_out.bvh")
        ref_path = str(tmp_path / "ref_out.bvh")
        zf.pose_features_to_bvh(feats.copy(), ours_path, smoothing=True)
        ref_pz.pose2bvh(feats.copy().astype(np.float64), ref_path, length=feats.shape[0], smoothing=True)

        a = ref_bvh.load(ours_path)
        b = ref_bvh.load(ref_path)
        np.testing.assert_allclose(a["rotations"], b["rotations"], atol=2e-3)
        np.testing.assert_allclose(a["positions"], b["positions"], atol=2e-3)
