"""beat_data_proc (MyBVH + h5 io) parity vs the reference
(`BEAT-TWH-main/process/beat_data_proc/`)."""
import sys

import numpy as np
import pytest

from conftest import REFERENCE_ROOT

from diffusestylegesture_tpu.data import beat_proc as bp
from test_pipeline import synth_beat_bvh

REF_PROC = f"{REFERENCE_ROOT}/BEAT-TWH-main/process"


@pytest.fixture(scope="module")
def ref():
    if REF_PROC not in sys.path:
        sys.path.insert(0, REF_PROC)
    import beat_data_proc.MyBVH as ref_mybvh

    return ref_mybvh


@pytest.fixture()
def bvh_path(tmp_path):
    # the reference's private pymo parser truncates motion to
    # line_count-431 rows (its BEAT header-size guard), so the clip must
    # be long enough for that to stay positive
    path = str(tmp_path / "clip.bvh")
    synth_beat_bvh(path, T=500, fps=60, seed=4)
    return path


class TestLoadParity:
    def test_load_bvh_data(self, ref, bvh_path):
        ours = bp.load_bvh_data(bvh_path)
        theirs = ref.load_bvh_data(bvh_path)
        assert ours["joint_names"] == theirs["joint_names"]
        np.testing.assert_array_equal(ours["parents"], theirs["parents"])
        np.testing.assert_allclose(ours["offsets"], theirs["offsets"], atol=1e-6)
        assert ours["euler_orders"] == theirs["euler_orders"]
        assert ours["framerate"] == theirs["framerate"]
        # the reference truncates to line_count-431 frames (see module
        # docstring); compare the common prefix
        t = len(theirs["rot_angles"])
        assert 0 < t <= len(ours["rot_angles"])
        np.testing.assert_allclose(ours["rot_angles"][:t], theirs["rot_angles"], atol=1e-6)
        np.testing.assert_allclose(ours["rot_mats"][:t], theirs["rot_mats"], atol=1e-6)
        np.testing.assert_allclose(ours["global_pos"][:t], theirs["global_pos"], atol=1e-6)

    def test_euler2mat(self, ref):
        rng = np.random.default_rng(0)
        angles = rng.uniform(-180, 180, (5, 4, 3))
        orders = ["XYZ", "ZXY", "XYZ", "ZYX"]
        np.testing.assert_allclose(
            bp.euler2mat(angles, orders), ref.euler2mat(angles, orders),
            atol=1e-6)


class TestSelectJoints:
    def test_parity(self, ref, bvh_path):
        info = bp.load_bvh_data(bvh_path)
        # drop intermediate joints so offsets must be merged through
        # unselected ancestors
        selected = ["Hips", "Spine2", "RightArm"]
        ours = bp.select_joints(
            selected, info["joint_names"], parents=info["parents"],
            offsets=info["offsets"], motion=info["rot_mats"])
        theirs = ref.select_joints(
            selected, info["joint_names"], parents=info["parents"],
            offsets=info["offsets"], motion=info["rot_mats"])
        for a, b in zip(ours, theirs):
            np.testing.assert_allclose(a, b, atol=1e-9)
        np.testing.assert_array_equal(ours[0], [-1, 0, 1])


class TestWriteRoundtrip:
    def test_write_and_reload(self, bvh_path, tmp_path):
        info = bp.load_bvh_data(bvh_path)
        out = str(tmp_path / "rewritten.bvh")
        bp.write_bvh_data(
            out,
            joint_names=info["joint_names"],
            skeleton_tree=info["parents"],
            offsets=info["offsets"],
            euler_orders=info["euler_orders"],
            framerate=info["framerate"],
            motion=info["rot_angles"],
            global_trans=info["global_pos"],
        )
        again = bp.load_bvh_data(out)
        assert again["joint_names"] == info["joint_names"]
        np.testing.assert_allclose(again["rot_angles"], info["rot_angles"], atol=1e-5)
        np.testing.assert_allclose(again["global_pos"], info["global_pos"], atol=1e-5)
        np.testing.assert_allclose(again["offsets"], info["offsets"], atol=1e-5)

    def test_reference_can_read_our_output(self, ref, bvh_path, tmp_path):
        info = bp.load_bvh_data(bvh_path)
        out = str(tmp_path / "rewritten.bvh")
        bp.write_bvh_data(
            out, joint_names=info["joint_names"],
            skeleton_tree=info["parents"], offsets=info["offsets"],
            euler_orders=info["euler_orders"], framerate=info["framerate"],
            motion=info["rot_angles"], global_trans=info["global_pos"])
        theirs = ref.load_bvh_data(out)
        t = len(theirs["rot_angles"])
        assert t > 0
        np.testing.assert_allclose(theirs["rot_angles"], info["rot_angles"][:t], atol=1e-5)


class TestH5IO:
    def test_roundtrip_nested(self, tmp_path):
        path = str(tmp_path / "clip.h5")
        rng = np.random.default_rng(1)
        data = {
            "rot_mats": rng.standard_normal((4, 3, 3, 3)).astype(np.float32),
            "parents": np.array([-1, 0, 1], np.int32),
            "joint_names": ["Hips", "Spine", "Head"],
            "meta": {"framerate": np.array(60.0)},
        }
        bp.save_h5_dataset(path, data)
        loaded = bp.load_h5_dataset(path)
        np.testing.assert_array_equal(loaded["rot_mats"], data["rot_mats"])
        np.testing.assert_array_equal(loaded["parents"], data["parents"])
        assert [s.decode() for s in loaded["joint_names"]] == data["joint_names"]
        assert loaded["meta"]["framerate"] == 60.0

    def test_selective_load_and_overwrite(self, tmp_path):
        path = str(tmp_path / "c.h5")
        bp.save_h5_dataset(path, {"a": np.arange(3), "b": np.arange(4)})
        only_a = bp.load_h5_dataset(path, ds_name_list=["a"])
        assert set(only_a) == {"a"}
        with pytest.raises(FileExistsError):
            bp.save_h5_dataset(path, {"a": np.arange(3)}, overwrite=False)
        bp.save_h5_dataset(path, {"c": np.arange(2)})  # overwrite default
        assert set(bp.load_h5_dataset(path)) == {"c"}
        with pytest.raises(FileNotFoundError):
            bp.load_h5_dataset(str(tmp_path / "missing.h5"))
