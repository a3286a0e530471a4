"""Parity of the humanml RIC/skeleton math vs the reference
(`main/data_loaders/humanml/{common/quaternion.py,common/skeleton.py,
scripts/motion_process.py}`), imported from the read-only tree with the
numpy-1.20/scipy-1.12 removals patched around."""
import sys
import types
import ref_compat

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from diffusestylegesture_tpu.motion import humanml as hml

REF = "/root/reference/main"


@pytest.fixture(scope="module")
def ref():
    # The reference targets numpy<1.20 (np.float) and scipy<1.12
    # (scipy.ndimage.filters); alias both before importing.
    if not hasattr(np, "float"):
        np.float = float  # type: ignore[attr-defined]
    try:
        import scipy.ndimage.filters  # noqa: F401
    except ImportError:
        import scipy.ndimage as ndi

        mod = ref_compat.stub_module("scipy.ndimage.filters")
        mod.gaussian_filter1d = ndi.gaussian_filter1d
        sys.modules["scipy.ndimage.filters"] = mod
    # Other tests may have stubbed this import chain; clear the stubs so
    # the real namespace packages load.
    for name in list(sys.modules):
        if name.startswith("data_loaders"):
            mod = sys.modules[name]
            if getattr(mod, "__file__", None) is None and not hasattr(mod, "__path__"):
                del sys.modules[name]
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import data_loaders.humanml.common.quaternion as qt
    import data_loaders.humanml.common.skeleton as sk
    import data_loaders.humanml.scripts.motion_process as mp

    return types.SimpleNamespace(qt=qt, sk=sk, mp=mp)


@pytest.fixture(scope="module")
def ric_data():
    rng = np.random.default_rng(11)
    joints_num = 22
    dim = 263
    data = rng.standard_normal((2, 40, dim)) * 0.1
    return data, joints_num


class TestQuatHelpers:
    def test_qrot_qinv_qmul(self, ref):
        rng = np.random.default_rng(0)
        q = rng.standard_normal((30, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        q2 = rng.standard_normal((30, 4))
        q2 /= np.linalg.norm(q2, axis=-1, keepdims=True)
        v = rng.standard_normal((30, 3))
        np.testing.assert_allclose(
            np.asarray(hml.qrot(jnp.asarray(q), jnp.asarray(v))),
            ref.qt.qrot(torch.from_numpy(q), torch.from_numpy(v)).numpy(),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(hml.qmul(jnp.asarray(q), jnp.asarray(q2))),
            ref.qt.qmul(torch.from_numpy(q), torch.from_numpy(q2)).numpy(),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(hml.qinv(jnp.asarray(q))),
            ref.qt.qinv(torch.from_numpy(q)).numpy(),
            atol=1e-7,
        )

    def test_cont6d(self, ref):
        rng = np.random.default_rng(1)
        q = rng.standard_normal((20, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        np.testing.assert_allclose(
            np.asarray(hml.quaternion_to_cont6d(jnp.asarray(q))),
            ref.qt.quaternion_to_cont6d(torch.from_numpy(q)).numpy(),
            atol=1e-5,
        )
        c6 = rng.standard_normal((20, 6))
        np.testing.assert_allclose(
            np.asarray(hml.cont6d_to_matrix(jnp.asarray(c6))),
            ref.qt.cont6d_to_matrix(torch.from_numpy(c6)).numpy(),
            atol=1e-5,
        )

    def test_qbetween(self, ref):
        rng = np.random.default_rng(2)
        u = rng.standard_normal((15, 3))
        v = rng.standard_normal((15, 3))
        np.testing.assert_allclose(
            np.asarray(hml.qbetween(jnp.asarray(u), jnp.asarray(v))),
            ref.qt.qbetween_np(u, v),
            atol=1e-5,
        )


class TestRicRecovery:
    def test_recover_root_rot_pos(self, ref, ric_data):
        data, _ = ric_data
        q_ref, p_ref = ref.mp.recover_root_rot_pos(torch.from_numpy(data).float())
        q_ours, p_ours = hml.recover_root_rot_pos(jnp.asarray(data))
        np.testing.assert_allclose(np.asarray(q_ours), q_ref.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(p_ours), p_ref.numpy(), atol=1e-5)

    def test_recover_from_ric(self, ref, ric_data):
        data, joints_num = ric_data
        ref_pos = ref.mp.recover_from_ric(
            torch.from_numpy(data).float(), joints_num).numpy()
        ours = np.asarray(hml.recover_from_ric(jnp.asarray(data), joints_num))
        np.testing.assert_allclose(ours, ref_pos, atol=1e-5)

    def test_recover_rot(self, ref, ric_data):
        data, _ = ric_data
        flat = data[0]
        ref_rot = ref.mp.recover_rot(torch.from_numpy(flat).float()).numpy()
        ours = np.asarray(hml.recover_rot(jnp.asarray(flat)))
        np.testing.assert_allclose(ours, ref_rot, atol=1e-5)


class TestSkeleton:
    def _ref_skeleton(self, ref):
        return ref.sk.Skeleton(
            torch.from_numpy(hml.t2m_raw_offsets).float(),
            hml.t2m_kinematic_chain,
            "cpu",
        )

    @pytest.fixture(scope="class")
    def pose(self):
        rng = np.random.default_rng(3)
        # a plausible static pose: raw offsets integrated down the chains
        joints = np.zeros((22, 3))
        parents = [-1] + [0] * 21
        sk = hml.Skeleton(hml.t2m_raw_offsets, hml.t2m_kinematic_chain)
        parents = sk.parents
        for j in range(1, 22):
            joints[j] = joints[parents[j]] + hml.t2m_raw_offsets[j] * (
                0.5 + rng.random())
        return joints

    def test_offsets(self, ref, pose):
        sk_ref = self._ref_skeleton(ref)
        off_ref = sk_ref.get_offsets_joints(torch.from_numpy(pose).float()).numpy()
        sk = hml.Skeleton(hml.t2m_raw_offsets, hml.t2m_kinematic_chain)
        off = np.asarray(sk.get_offsets_joints(jnp.asarray(pose)))
        np.testing.assert_allclose(off, off_ref, atol=1e-5)

    def test_fk_quat(self, ref, pose):
        rng = np.random.default_rng(4)
        q = rng.standard_normal((5, 22, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        root = rng.standard_normal((5, 3))
        sk_ref = self._ref_skeleton(ref)
        sk_ref.get_offsets_joints(torch.from_numpy(pose).float())
        ref_j = sk_ref.forward_kinematics(
            torch.from_numpy(q).float(), torch.from_numpy(root).float()).numpy()
        sk = hml.Skeleton(hml.t2m_raw_offsets, hml.t2m_kinematic_chain)
        sk.get_offsets_joints(jnp.asarray(pose))
        ours = np.asarray(sk.forward_kinematics(jnp.asarray(q), jnp.asarray(root)))
        np.testing.assert_allclose(ours, ref_j, atol=1e-4)

    def test_fk_cont6d_and_recover_from_rot(self, ref, pose, ric_data):
        rng = np.random.default_rng(5)
        c6 = rng.standard_normal((5, 22, 6))
        root = rng.standard_normal((5, 3))
        sk_ref = self._ref_skeleton(ref)
        sk_ref.get_offsets_joints(torch.from_numpy(pose).float())
        ref_j = sk_ref.forward_kinematics_cont6d(
            torch.from_numpy(c6).float(), torch.from_numpy(root).float()).numpy()
        sk = hml.Skeleton(hml.t2m_raw_offsets, hml.t2m_kinematic_chain)
        sk.get_offsets_joints(jnp.asarray(pose))
        ours = np.asarray(sk.forward_kinematics_cont6d(jnp.asarray(c6), jnp.asarray(root)))
        np.testing.assert_allclose(ours, ref_j, atol=1e-4)

        data, joints_num = ric_data
        ref_out = ref.mp.recover_from_rot(
            torch.from_numpy(data[0]).float(), joints_num, sk_ref).numpy()
        ours_out = np.asarray(
            hml.recover_from_rot(jnp.asarray(data[0]), joints_num, sk))
        np.testing.assert_allclose(ours_out, ref_out, atol=1e-4)

    def test_ik_fk_roundtrip(self, ref, pose):
        # IK parity vs reference + FK(IK(x)) ≈ x sanity
        rng = np.random.default_rng(6)
        joints = np.repeat(pose[None], 4, axis=0) + 0.01 * rng.standard_normal((4, 22, 3))
        face = [2, 1, 17, 16]
        sk_ref = self._ref_skeleton(ref)
        q_ref = sk_ref.inverse_kinematics_np(joints.astype(np.float64), face)
        sk = hml.Skeleton(hml.t2m_raw_offsets, hml.t2m_kinematic_chain)
        q_ours = np.asarray(sk.inverse_kinematics(jnp.asarray(joints), face))
        np.testing.assert_allclose(q_ours, q_ref, atol=1e-6)


class TestEditingMasks:
    def test_parity_vs_reference(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ref_hml_utils", f"{REF}/data_loaders/humanml_utils.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert hml.HML_JOINT_NAMES == mod.HML_JOINT_NAMES
        np.testing.assert_array_equal(hml.HML_ROOT_MASK, mod.HML_ROOT_MASK)
        np.testing.assert_array_equal(
            hml.HML_LOWER_BODY_MASK, mod.HML_LOWER_BODY_MASK)
        np.testing.assert_array_equal(
            hml.HML_UPPER_BODY_MASK, mod.HML_UPPER_BODY_MASK)
        assert hml.SMPL_UPPER_BODY_JOINTS == mod.SMPL_UPPER_BODY_JOINTS
        assert hml.HML_ROOT_MASK.shape == (263,)
