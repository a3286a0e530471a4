"""pymo-equivalent motion pipeline: parity vs reference pymo on synthetic BVH."""
import os
import sys
import ref_compat

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_ROOT

from diffusestylegesture_tpu.motion import pipeline as P


def synth_beat_bvh(path, T=61, fps=120, seed=0):
    """Hips(6ch) → chain of BEAT joints (3ch XYZ), plus one non-target joint."""
    rng = np.random.default_rng(seed)
    joints = ["Hips", "Spine", "Spine1", "Spine2", "RightShoulder", "RightArm", "Extra1"]
    parents = {
        "Hips": None, "Spine": "Hips", "Spine1": "Spine", "Spine2": "Spine1",
        "RightShoulder": "Spine2", "RightArm": "RightShoulder", "Extra1": "Spine2",
    }
    channels = {"Hips": ["Xposition", "Yposition", "Zposition", "Xrotation", "Yrotation", "Zrotation"]}
    for j in joints[1:]:
        channels[j] = ["Xrotation", "Yrotation", "Zrotation"]
    names = []
    for j in joints:
        names.append(j)
    # add Nub under RightArm and Extra1
    full_names = joints + ["RightArm_Nub", "Extra1_Nub"]
    parents["RightArm_Nub"] = "RightArm"
    parents["Extra1_Nub"] = "Extra1"
    channels["RightArm_Nub"] = []
    channels["Extra1_Nub"] = []
    offsets = {n: rng.uniform(-3, 3, 3).astype(np.float32) for n in full_names}
    columns = [f"{j}_{c}" for j in joints for c in channels[j]]
    vals = rng.uniform(-40, 40, (T, len(columns)))
    vals[:, 0:3] = rng.uniform(-10, 10, (T, 3)) + [0, 90, 0]
    data = P.ChannelData(
        full_names, parents, offsets, channels, columns, vals, 1.0 / fps, "Hips"
    )
    P.write_bvh_channels(data, path)
    return data


class TestParsing:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "a.bvh")
        orig = synth_beat_bvh(path)
        loaded = P.parse_bvh(path)
        assert loaded.columns == orig.columns
        assert loaded.root_name == "Hips"
        np.testing.assert_allclose(loaded.values, orig.values, atol=1e-5)
        assert "RightArm_Nub" in loaded.names

    @requires_reference
    def test_vs_pymo_parser(self, tmp_path):
        sys.path.insert(0, f"{REFERENCE_ROOT}/BEAT-TWH-main/process")
        from pymo.parsers import BVHParser  # type: ignore

        path = str(tmp_path / "b.bvh")
        synth_beat_bvh(path, seed=1)
        ours = P.parse_bvh(path)
        theirs = BVHParser().parse(path)
        assert list(theirs.values.columns) == ours.columns
        np.testing.assert_allclose(theirs.values.values, ours.values, atol=1e-5)


@requires_reference
class TestBeatParity:
    def test_features(self, tmp_path):
        import types

        for _m in ("transforms3d", "transforms3d.euler", "transforms3d.quaternions"):
            if _m not in sys.modules:
                sys.modules[_m] = ref_compat.stub_module(_m)
            if "." in _m:
                _parent, _child = _m.rsplit(".", 1)
                setattr(sys.modules[_parent], _child, sys.modules[_m])
        sys.path.insert(0, f"{REFERENCE_ROOT}/BEAT-TWH-main/process")
        from sklearn.pipeline import Pipeline
        from scipy.spatial.transform import Rotation as Rot
        from pymo.parsers import BVHParser  # type: ignore
        from pymo.preprocessing import DownSampler, JointSelector, Numpyfier  # type: ignore

        path = str(tmp_path / "c.bvh")
        synth_beat_bvh(path, T=121, fps=120, seed=2)

        ref_pipe = Pipeline([
            ("dwnsampl", DownSampler(tgt_fps=30, keep_all=False)),
            ("jtsel", JointSelector(P.BEAT_TARGET_JOINTS, include_root=True)),
            ("np", Numpyfier()),
        ])
        ref_out = ref_pipe.fit_transform([BVHParser().parse(path)])[0]
        T = ref_out.shape[0]
        trip = ref_out.reshape(T, -1, 3)
        mats = Rot.from_euler("XYZ", trip.reshape(-1, 3), degrees=True).as_matrix()
        ref_feats = mats.reshape(T, -1)

        ours, pipe = P.beat_features(path)
        assert ours.shape == ref_feats.shape
        np.testing.assert_allclose(ours, ref_feats, atol=1e-5)

    def test_inverse_roundtrip(self, tmp_path):
        path = str(tmp_path / "d.bvh")
        synth_beat_bvh(path, T=121, fps=120, seed=3)
        feats, pipe = P.beat_features(path)
        out_path = str(tmp_path / "out.bvh")
        P.beat_features_to_bvh(feats, pipe, out_path, smoothing=False)
        # parse back: selected joints' euler channels must roundtrip
        back = P.parse_bvh(out_path)
        orig = P.parse_bvh(path)
        idx_o = orig.column_index()
        idx_b = back.column_index()
        # downsampled (rate 4, drop last) frames of the original
        sel = [c for c in back.columns if "Spine_" in c or "RightArm_" in c]
        for c in sel:
            o = orig.values[0:-1:4, idx_o[c]]
            b = back.values[:, idx_b[c]]
            # euler→matrix→euler roundtrips up to angle wrapping
            diff = np.abs((o - b + 180) % 360 - 180)
            assert diff.max() < 1e-3, c


class TestTWH:
    def _synth_twh(self, path, T=50, seed=0):
        rng = np.random.default_rng(seed)
        joints = ["body_world", "b_root", "b_spine0", "b_spine1", "b_l_shoulder"]
        parents = {"body_world": None, "b_root": "body_world", "b_spine0": "b_root",
                   "b_spine1": "b_spine0", "b_l_shoulder": "b_spine1"}
        channels = {
            j: ["Xposition", "Yposition", "Zposition", "Zrotation", "Xrotation", "Yrotation"]
            for j in joints
        }
        names = joints + ["b_l_shoulder_Nub"]
        parents["b_l_shoulder_Nub"] = "b_l_shoulder"
        channels["b_l_shoulder_Nub"] = []
        offsets = {n: rng.uniform(-3, 3, 3).astype(np.float32) for n in names}
        columns = [f"{j}_{c}" for j in joints for c in channels[j]]
        vals = rng.uniform(-40, 40, (T, len(columns)))
        data = P.ChannelData(names, parents, offsets, channels, columns, vals, 1 / 30, "body_world")
        P.write_bvh_channels(data, path)

    def test_features_shape_and_roundtrip(self, tmp_path):
        path = str(tmp_path / "t.bvh")
        self._synth_twh(path)
        feats, pipe = P.twh_features(path)
        # 4 selected bones (body_world excluded: include_root=False... but
        # body_world is root AND in the bone list) — compute from pipeline
        n_sel = len(pipe.steps[0].selected_channels) // 6
        assert feats.shape[1] == n_sel * 12
        out_path = str(tmp_path / "t_out.bvh")
        P.twh_features_to_bvh(feats, pipe, out_path, smoothing=False)
        back = P.parse_bvh(out_path)
        orig = P.parse_bvh(path)
        idx_o = orig.column_index()
        idx_b = back.column_index()
        for c in [c for c in back.columns if "b_spine0" in c]:
            o = orig.values[:, idx_o[c]]
            b = back.values[:, idx_b[c]]
            diff = np.abs((o - b + 180) % 360 - 180)
            assert diff.max() < 1e-3, c

    @requires_reference
    def test_vs_pymo_twh(self, tmp_path):
        import types

        for _m in ("transforms3d", "transforms3d.euler", "transforms3d.quaternions"):
            if _m not in sys.modules:
                sys.modules[_m] = ref_compat.stub_module(_m)
            if "." in _m:
                _parent, _child = _m.rsplit(".", 1)
                setattr(sys.modules[_parent], _child, sys.modules[_m])
        sys.path.insert(0, f"{REFERENCE_ROOT}/BEAT-TWH-main/process")
        from sklearn.pipeline import Pipeline
        from pymo_TWH.parsers import BVHParser  # type: ignore
        from pymo_TWH.preprocessing import JointSelector, Numpyfier  # type: ignore

        path = str(tmp_path / "u.bvh")
        self._synth_twh(path, seed=4)
        ref_pipe = Pipeline([
            ("jtsel", JointSelector(P.TWH_BONE_NAMES, include_root=False)),
            ("np", Numpyfier()),
        ])
        ref_out = ref_pipe.fit_transform([BVHParser().parse(path)])[0]
        mine = P.twh_pipeline()
        my_out = mine.fit_transform(P.parse_bvh(path))
        assert my_out.shape == ref_out.shape
        np.testing.assert_allclose(my_out, ref_out, atol=1e-5)
