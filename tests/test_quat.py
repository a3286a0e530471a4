"""Golden-value and property tests for the quaternion/FK library."""
import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_ROOT

from diffusestylegesture_tpu.motion import quat, txform


def _rand_quats(rng, shape):
    q = rng.standard_normal(shape + (4,)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def _ref_quat():
    import sys

    sys.path.insert(0, f"{REFERENCE_ROOT}/ubisoft-laforge-ZeroEGGS-main/ZEGGS")
    from anim import quat as ref_quat  # type: ignore

    return ref_quat


class TestSelfConsistency:
    def test_mul_identity(self):
        rng = np.random.default_rng(0)
        q = _rand_quats(rng, (5,))
        e = np.asarray(quat.eye((5,)))
        np.testing.assert_allclose(np.asarray(quat.mul(e, q)), q, atol=1e-6)
        np.testing.assert_allclose(np.asarray(quat.mul(q, e)), q, atol=1e-6)

    def test_mul_inv(self):
        rng = np.random.default_rng(1)
        q = _rand_quats(rng, (7,))
        out = np.asarray(quat.mul(q, quat.inv(q)))
        np.testing.assert_allclose(out, np.asarray(quat.eye((7,))), atol=1e-5)

    def test_mul_vec_vs_matrix(self):
        rng = np.random.default_rng(2)
        q = _rand_quats(rng, (6,))
        v = rng.standard_normal((6, 3)).astype(np.float32)
        rotated = np.asarray(quat.mul_vec(q, v))
        mats = np.asarray(quat.to_xform(q))
        np.testing.assert_allclose(rotated, np.einsum("nij,nj->ni", mats, v), atol=1e-5)

    def test_scipy_cross_check(self):
        scipy_rot = pytest.importorskip("scipy.spatial.transform").Rotation
        rng = np.random.default_rng(3)
        q = _rand_quats(rng, (10,))
        # scipy uses (x, y, z, w)
        r = scipy_rot.from_quat(np.concatenate([q[:, 1:], q[:, :1]], axis=-1))
        np.testing.assert_allclose(np.asarray(quat.to_xform(q)), r.as_matrix(), atol=1e-5)

    def test_euler_roundtrip(self):
        # NB: the reference's 'xzy' to_euler is NOT the inverse of its
        # from_euler (verified against /root/reference); only 'zyx'
        # roundtrips. 'xzy' is covered by the parity test below.
        rng = np.random.default_rng(4)
        e = (rng.uniform(-0.45, 0.45, (8, 3)) * np.pi).astype(np.float32)
        q = quat.from_euler(e, "zyx")
        e2 = np.asarray(quat.to_euler(q, "zyx"))
        np.testing.assert_allclose(e2, e, atol=1e-4)

    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(5)
        v = rng.standard_normal((9, 3)).astype(np.float32) * 0.5
        np.testing.assert_allclose(np.asarray(quat.log(quat.exp(v))), v, atol=1e-5)

    def test_from_xform_roundtrip(self):
        rng = np.random.default_rng(6)
        q = _rand_quats(rng, (64,))
        q2 = np.asarray(quat.from_xform(quat.to_xform(q)))
        # quaternion double-cover: compare up to sign
        dot = np.abs(np.sum(q * q2, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_unroll_continuity(self):
        rng = np.random.default_rng(7)
        q = _rand_quats(rng, (50, 3))
        # inject random sign flips
        signs = rng.choice([-1.0, 1.0], size=(50, 1, 1)).astype(np.float32)
        out = np.asarray(quat.unroll(q * signs))
        d = np.sum(out[1:] * out[:-1], axis=-1)
        assert (d >= 0).all()

    def test_orthogonalize_from_xy(self):
        rng = np.random.default_rng(8)
        q = _rand_quats(rng, (12,))
        mats = np.asarray(quat.to_xform(q))
        rebuilt = np.asarray(txform.orthogonalize_from_xy(np.asarray(txform.to_xy(mats))))
        np.testing.assert_allclose(rebuilt, mats, atol=1e-5)

    def test_fk_chain(self):
        # simple 3-joint chain along x with 90 deg z rotations
        parents = (0, 0, 1)
        lpos = np.array([[0, 0, 0], [1, 0, 0], [1, 0, 0]], dtype=np.float32)
        ang = np.float32(np.pi / 2)
        rz = np.asarray(
            quat.from_angle_axis(np.array([0.0, ang, ang], np.float32), np.array([0.0, 0.0, 1.0], np.float32))
        )
        gr, gp = quat.fk(rz, lpos, parents)
        gp = np.asarray(gp)
        np.testing.assert_allclose(gp[1], [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(gp[2], [1, 1, 0], atol=1e-6)


@requires_reference
class TestReferenceParity:
    def test_mul_vec_parity(self):
        ref = _ref_quat()
        rng = np.random.default_rng(10)
        q = _rand_quats(rng, (16, 5))
        v = rng.standard_normal((16, 5, 3)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(quat.mul_vec(q, v)), ref.mul_vec(q, v), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(quat.mul(q, q[::-1])), ref.mul(q, q[::-1]), atol=1e-5)

    def test_euler_xform_parity(self):
        ref = _ref_quat()
        rng = np.random.default_rng(11)
        e = (rng.uniform(-1, 1, (20, 3)) * np.pi).astype(np.float32)
        for order in ("zyx", "xzy"):
            np.testing.assert_allclose(
                np.asarray(quat.from_euler(e, order)), ref.from_euler(e, order), atol=1e-5
            )
        q = _rand_quats(rng, (20,))
        np.testing.assert_allclose(np.asarray(quat.to_xform(q)), ref.to_xform(q), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(quat.from_xform(ref.to_xform(q))),
            ref.from_xform(ref.to_xform(q)),
            atol=1e-4,
        )

    def test_unroll_parity(self):
        ref = _ref_quat()
        rng = np.random.default_rng(12)
        q = _rand_quats(rng, (40, 7))
        signs = rng.choice([-1.0, 1.0], size=(40, 7, 1)).astype(np.float32)
        x = q * signs
        np.testing.assert_allclose(np.asarray(quat.unroll(x)), ref.unroll(x.copy()), atol=1e-6)

    def test_fk_parity(self):
        ref = _ref_quat()
        rng = np.random.default_rng(13)
        # random tree: parent[i] < i
        J = 20
        parents = [0] + [int(rng.integers(0, i)) for i in range(1, J)]
        lrot = _rand_quats(rng, (4, J))
        lpos = rng.standard_normal((4, J, 3)).astype(np.float32)
        gr, gp = quat.fk(lrot, lpos, parents)
        gr_ref, gp_ref = ref.fk(lrot, lpos, parents)
        np.testing.assert_allclose(np.asarray(gr), gr_ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gp), gp_ref, atol=1e-4)

    def test_fk_vel_parity(self):
        ref = _ref_quat()
        rng = np.random.default_rng(14)
        J = 15
        parents = [0] + [int(rng.integers(0, i)) for i in range(1, J)]
        lrot = _rand_quats(rng, (3, J))
        lpos = rng.standard_normal((3, J, 3)).astype(np.float32)
        lvrt = rng.standard_normal((3, J, 3)).astype(np.float32)
        lvel = rng.standard_normal((3, J, 3)).astype(np.float32)
        ours = quat.fk_vel(lrot, lpos, lvrt, lvel, parents)
        theirs = ref.fk_vel(lrot, lpos, lvrt, lvel, parents)
        for a, b in zip(ours, theirs):
            np.testing.assert_allclose(np.asarray(a), b, atol=1e-4)

    def test_txform_parity(self):
        import sys

        import torch

        sys.path.insert(0, f"{REFERENCE_ROOT}/ubisoft-laforge-ZeroEGGS-main/ZEGGS")
        from anim import txform as ref_txform  # type: ignore

        rng = np.random.default_rng(15)
        q = _rand_quats(rng, (10,))
        xy = np.asarray(quat.to_xform(q)).transpose(0, 2, 1)[..., :2, :]
        xy = (xy + rng.standard_normal(xy.shape) * 0.05).astype(np.float32)
        theirs = ref_txform.xform_orthogonalize_from_xy(torch.as_tensor(xy)).numpy()
        np.testing.assert_allclose(
            np.asarray(txform.orthogonalize_from_xy(xy)), theirs, atol=1e-5
        )
