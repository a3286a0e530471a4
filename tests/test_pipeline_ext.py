"""Extended pymo transforms: expmap, Mirror, RootNormalizer, ConstantsRemover_withroot."""
import sys
import types
import ref_compat

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_ROOT

from diffusestylegesture_tpu.motion import pipeline as P
from test_pipeline import synth_beat_bvh


def _stub_pymo_deps():
    for m in ("transforms3d", "transforms3d.euler", "transforms3d.quaternions"):
        if m not in sys.modules:
            sys.modules[m] = ref_compat.stub_module(m)
        if "." in m:
            _parent, _child = m.rsplit(".", 1)
            setattr(sys.modules[_parent], _child, sys.modules[m])
    sys.path.insert(0, f"{REFERENCE_ROOT}/BEAT-TWH-main/process")


def synth_twh_bvh(path, T=40, seed=0):
    rng = np.random.default_rng(seed)
    joints = ["body_world", "b_root", "b_spine0", "b_l_arm", "b_r_arm"]
    parents = {"body_world": None, "b_root": "body_world", "b_spine0": "b_root",
               "b_l_arm": "b_spine0", "b_r_arm": "b_spine0"}
    channels = {
        j: ["Xposition", "Yposition", "Zposition", "Zrotation", "Xrotation", "Yrotation"]
        for j in joints
    }
    names = joints + ["b_l_arm_Nub", "b_r_arm_Nub"]
    parents["b_l_arm_Nub"] = "b_l_arm"
    parents["b_r_arm_Nub"] = "b_r_arm"
    channels["b_l_arm_Nub"] = []
    channels["b_r_arm_Nub"] = []
    offsets = {n: rng.uniform(-2, 2, 3).astype(np.float32) for n in names}
    columns = [f"{j}_{c}" for j in joints for c in channels[j]]
    vals = rng.uniform(-30, 30, (T, len(columns)))
    data = P.ChannelData(names, parents, offsets, channels, columns, vals, 1 / 30, "body_world")
    P.write_bvh_channels(data, path)
    return data


class TestExpmap:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "a.bvh")
        synth_twh_bvh(path)
        data = P.parse_bvh(path)
        mp = P.MocapParameterizer("expmap")
        exp = mp.transform(data)
        assert any(c.endswith("_alpha") for c in exp.columns)
        back = mp.inverse_transform(exp)
        # compare per-channel (column order differs from the original)
        idx_o = data.column_index()
        idx_b = back.column_index()
        for c in data.columns:
            o = data.values[:, idx_o[c]]
            b = back.values[:, idx_b[c]]
            diff = np.abs((o - b + 180) % 360 - 180)
            assert diff.max() < 1e-6, c

    @requires_reference
    def test_vs_pymo(self, tmp_path):
        _stub_pymo_deps()
        from pymo_TWH.parsers import BVHParser  # type: ignore
        from pymo_TWH.preprocessing import MocapParameterizer  # type: ignore

        path = str(tmp_path / "b.bvh")
        synth_twh_bvh(path, seed=2)
        ref = MocapParameterizer("expmap").fit_transform([BVHParser().parse(path)])[0]
        mine = P.MocapParameterizer("expmap").transform(P.parse_bvh(path))
        assert list(ref.values.columns) == mine.columns
        np.testing.assert_allclose(ref.values.values, mine.values, atol=1e-8)

    @requires_reference
    def test_constants_remover_withroot(self, tmp_path):
        _stub_pymo_deps()
        from pymo_TWH.parsers import BVHParser  # type: ignore
        from pymo_TWH.preprocessing import (  # type: ignore
            ConstantsRemover_withroot,
            MocapParameterizer,
        )

        path = str(tmp_path / "c.bvh")
        synth_twh_bvh(path, seed=3)
        tracks = MocapParameterizer("expmap").fit_transform([BVHParser().parse(path)])
        cr = ConstantsRemover_withroot()
        cr.fit(tracks)
        ref_out = cr.transform(tracks)[0]

        mp = P.MocapParameterizer("expmap")
        exp = mp.transform(P.parse_bvh(path))
        mine_cr = P.ConstantsRemoverWithRoot()
        mine_cr.fit(exp)
        mine_out = mine_cr.transform(exp)
        assert list(ref_out.values.columns) == mine_out.columns
        np.testing.assert_allclose(ref_out.values.values, mine_out.values, atol=1e-8)

    @requires_reference
    def test_positions_vs_pymo(self, tmp_path):
        _stub_pymo_deps()
        from pymo_TWH.parsers import BVHParser  # type: ignore
        from pymo_TWH.preprocessing import MocapParameterizer  # type: ignore

        path = str(tmp_path / "d.bvh")
        synth_twh_bvh(path, seed=4, T=10)
        ref = MocapParameterizer("position").fit_transform([BVHParser().parse(path)])[0]
        mine = P.MocapParameterizer("position").transform(P.parse_bvh(path))
        common = [c for c in mine.columns if c in set(ref.values.columns)]
        # column ORDER parity, not just values-by-name: pymo emits
        # positions in traverse() order (stack DFS), which differs from
        # parse order on branching skeletons — positional consumers of a
        # reference-fitted pipeline would silently scramble (regression)
        ref_cols = [c for c in ref.values.columns if c in set(mine.columns)]
        assert common == ref_cols
        idx_m = mine.column_index()
        for c in common:
            np.testing.assert_allclose(
                mine.values[:, idx_m[c]], ref.values[c].values, atol=1e-6, err_msg=c
            )


class TestMirrorRootNorm:
    @requires_reference
    def test_mirror_vs_pymo(self, tmp_path):
        _stub_pymo_deps()
        from pymo.parsers import BVHParser  # type: ignore
        from pymo.preprocessing import Mirror  # type: ignore

        path = str(tmp_path / "e.bvh")
        synth_beat_bvh(path, T=30, seed=5)
        tracks = Mirror(axis="X", append=False).fit_transform([BVHParser().parse(path)])
        ref = tracks[0]
        mine = P.mirror(P.parse_bvh(path), axis="X")
        assert list(ref.values.columns) == mine.columns
        np.testing.assert_allclose(ref.values.values, mine.values, atol=1e-8)

    @requires_reference
    def test_rootnorm_vs_pymo(self, tmp_path):
        _stub_pymo_deps()
        from pymo_TWH.parsers import BVHParser  # type: ignore
        from pymo_TWH.preprocessing import RootNormalizer  # type: ignore

        path = str(tmp_path / "f.bvh")
        synth_twh_bvh(path, seed=6)
        ref = RootNormalizer().fit_transform([BVHParser().parse(path)])[0]
        mine = P.root_normalizer(P.parse_bvh(path))
        idx = mine.column_index()
        for c in mine.columns:
            np.testing.assert_allclose(
                mine.values[:, idx[c]], ref.values[c].values, atol=1e-8, err_msg=c
            )


@requires_reference
class TestTwhExpmapMode:
    def test_full_pipeline_vs_pymo(self, tmp_path):
        _stub_pymo_deps()
        from sklearn.pipeline import Pipeline
        from pymo_TWH.parsers import BVHParser  # type: ignore
        from pymo_TWH.preprocessing import (  # type: ignore
            ConstantsRemover_withroot,
            JointSelector,
            MocapParameterizer,
            Numpyfier,
        )

        path = str(tmp_path / "g.bvh")
        synth_twh_bvh(path, seed=8)
        # NB: the reference's exact pipeline crashes here — include_root=True
        # with 'body_world' also in bone_names duplicates the root columns and
        # pymo's expmap then fails on them. Compare against the de-duplicated
        # reference run (root removed from the explicit list), which is the
        # behavior our JointSelector implements.
        bones_wo_root = [b for b in P.TWH_BONE_NAMES if b != "body_world"]
        ref_pipe = Pipeline([
            ("jtsel", JointSelector(bones_wo_root, include_root=True)),
            ("param", MocapParameterizer("expmap")),
            ("cnst", ConstantsRemover_withroot()),
            ("np", Numpyfier()),
        ])
        ref_out = ref_pipe.fit_transform([BVHParser().parse(path)])[0]

        ours, _ = P.twh_features_expmap(path)
        assert ours.shape == ref_out.shape
        np.testing.assert_allclose(ours, ref_out, atol=1e-6)


class TestRootTransformer:
    @requires_reference
    def test_hip_centric_vs_pymo(self, tmp_path):
        _stub_pymo_deps()
        from pymo.parsers import BVHParser  # type: ignore
        from pymo.preprocessing import RootTransformer  # type: ignore

        path = str(tmp_path / "h.bvh")
        synth_beat_bvh(path, T=30, seed=9)
        ref = RootTransformer("hip_centric").fit_transform([BVHParser().parse(path)])[0]
        mine = P.RootTransformer("hip_centric")
        data = P.parse_bvh(path)
        mine.fit(data)
        out = mine.transform(data)
        idx = out.column_index()
        for c in out.columns:
            np.testing.assert_allclose(
                out.values[:, idx[c]], ref.values[c].values, atol=1e-8, err_msg=c
            )

    def test_deltas_roundtrip(self, tmp_path):
        path = str(tmp_path / "i.bvh")
        synth_beat_bvh(path, T=30, seed=10)
        data = P.parse_bvh(path)
        tr = P.RootTransformer("abdolute_translation_deltas")
        tr.fit(data)
        out = tr.transform(data)
        assert f"{data.root_name}_dXposition" in out.columns
        back = tr.inverse_transform(out, start_pos=(
            data.values[0, data.column_index()[f"{data.root_name}_Xposition"]],
            data.values[0, data.column_index()[f"{data.root_name}_Zposition"]],
        ))
        i_o = data.column_index()
        i_b = back.column_index()
        for c in (f"{data.root_name}_Xposition", f"{data.root_name}_Zposition"):
            np.testing.assert_allclose(
                back.values[:, i_b[c]], data.values[:, i_o[c]], atol=1e-6, err_msg=c
            )


class TestJointSelectorExact:
    def test_twist_collisions_not_duplicated(self, tmp_path):
        """TWH bone names collide by prefix (b_l_arm / b_l_arm_twist);
        the exact matcher must select each channel once. Substring mode
        (BEAT parity) would duplicate the twist channels."""
        joints = ["b_l_arm", "b_l_arm_twist", "b_l_wrist", "b_l_wrist_twist"]
        parents = {"b_l_arm": None, "b_l_arm_twist": "b_l_arm",
                   "b_l_wrist": "b_l_arm_twist", "b_l_wrist_twist": "b_l_wrist"}
        channels = {"b_l_arm": ["Xposition", "Yposition", "Zposition",
                                "Zrotation", "Xrotation", "Yrotation"]}
        for j in joints[1:]:
            channels[j] = ["Zrotation", "Xrotation", "Yrotation"]
        cols = [f"{j}_{c}" for j in joints for c in channels[j]]
        rng = np.random.default_rng(0)
        data = P.ChannelData(joints, parents, {j: np.zeros(3) for j in joints},
                             channels, cols,
                             rng.standard_normal((5, len(cols))), 1/30, "b_l_arm")
        sel = P.JointSelector(joints, exact=True).fit(data)
        assert len(sel.selected_channels) == len(cols)
        assert len(set(sel.selected_channels)) == len(cols)
        out = sel.transform(data)
        assert out.values.shape[1] == len(cols)
        # substring mode duplicates (documents WHY exact exists for TWH)
        sub = P.JointSelector(joints, exact=False).fit(data)
        assert len(sub.selected_channels) > len(cols)

    @requires_reference
    def test_matches_pymo_twh_exact_rule(self, tmp_path):
        _stub_pymo_deps()
        import sys
        sys.path.insert(0, f"{REFERENCE_ROOT}/BEAT-TWH-main/process")
        from pymo_TWH.parsers import BVHParser  # type: ignore
        from pymo_TWH.preprocessing import JointSelector  # type: ignore

        # synthetic BVH with colliding names
        path = str(tmp_path / "tw.bvh")
        joints = ["b_root", "b_l_arm", "b_l_arm_twist"]
        parents = {"b_root": None, "b_l_arm": "b_root",
                   "b_l_arm_twist": "b_l_arm", "b_l_arm_twist_Nub": "b_l_arm_twist"}
        channels = {"b_root": ["Xposition", "Yposition", "Zposition",
                               "Zrotation", "Xrotation", "Yrotation"],
                    "b_l_arm": ["Zrotation", "Xrotation", "Yrotation"],
                    "b_l_arm_twist": ["Zrotation", "Xrotation", "Yrotation"],
                    "b_l_arm_twist_Nub": []}
        cols = [f"{j}_{c}" for j in joints for c in channels[j]]
        rng = np.random.default_rng(1)
        data = P.ChannelData(
            joints + ["b_l_arm_twist_Nub"], parents,
            {j: rng.uniform(-2, 2, 3).astype(np.float32)
             for j in joints + ["b_l_arm_twist_Nub"]},
            channels, cols, rng.uniform(-30, 30, (7, len(cols))), 1/30, "b_root")
        P.write_bvh_channels(data, path)

        theirs = JointSelector(["b_l_arm", "b_l_arm_twist"]).fit(
            [BVHParser().parse(path)])
        ours = P.JointSelector(["b_l_arm", "b_l_arm_twist"], exact=True).fit(
            P.parse_bvh(path))
        assert list(theirs.selected_channels) == ours.selected_channels
