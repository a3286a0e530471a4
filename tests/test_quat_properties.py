"""Property-based hardening of the quaternion/motion math (hypothesis).

The parity tests pin exact agreement with the reference on sampled
inputs; these properties hold for ALL inputs and guard algebraic
invariants the parity fixtures can't exhaust.
"""
import numpy as np
from hypothesis import given, settings, strategies as st

from diffusestylegesture_tpu.motion import quat, txform

settings.register_profile("ci", max_examples=25, deadline=None)
settings.load_profile("ci")


def quats(n):
    return st.lists(
        st.floats(-1, 1).filter(lambda v: abs(v) > 1e-3), min_size=4 * n,
        max_size=4 * n,
    ).map(lambda v: _normalize(np.array(v, np.float64).reshape(n, 4)))


def _normalize(q):
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestAlgebra:
    @given(quats(3), quats(3))
    def test_mul_preserves_norm(self, a, b):
        out = np.asarray(quat.mul(a, b))
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-6)

    @given(quats(4))
    def test_inv_is_inverse(self, q):
        out = np.asarray(quat.mul(q, quat.inv(q)))
        identity = np.zeros_like(q)
        identity[:, 0] = 1.0
        # q * q^-1 = ±identity (double cover); w must be ±1
        np.testing.assert_allclose(np.abs(out[:, 0]), 1.0, atol=1e-6)
        np.testing.assert_allclose(out[:, 1:], 0.0, atol=1e-6)

    @given(quats(3), st.lists(st.floats(-10, 10), min_size=9, max_size=9))
    def test_mul_vec_is_rotation(self, q, v):
        v = np.array(v, np.float64).reshape(3, 3)
        out = np.asarray(quat.mul_vec(q, v))
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=-1), np.linalg.norm(v, axis=-1), atol=1e-5
        )

    @given(quats(5))
    def test_euler_roundtrip(self, q):
        # canonicalize sign (q ≅ −q) then roundtrip through euler zyx
        e = np.asarray(quat.to_euler(q, order="zyx"))
        q2 = np.asarray(quat.from_euler(e, order="zyx"))
        dot = np.abs(np.sum(q * q2, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    @given(quats(6))
    def test_unroll_continuity(self, q):
        """After unroll, consecutive quats never flip hemisphere."""
        u = np.asarray(quat.unroll(q[:, None, :]))[:, 0]
        dots = np.sum(u[1:] * u[:-1], axis=-1)
        assert (dots >= -1e-9).all()

    @given(quats(4))
    def test_from_xform_inverts_to_xform(self, q):
        m = np.asarray(quat.to_xform(q))
        q2 = np.asarray(quat.from_xform(m))
        dot = np.abs(np.sum(q * q2, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)


class TestTxform:
    @given(st.lists(st.floats(-2, 2), min_size=12, max_size=12))
    def test_orthogonalize_produces_rotation(self, v):
        xy = np.array(v, np.float64).reshape(2, 2, 3)
        # degenerate (near-parallel / near-zero) inputs are excluded
        x, y = xy[:, 0], xy[:, 1]
        nx = np.linalg.norm(x, axis=-1)
        ny = np.linalg.norm(y, axis=-1)
        cross = np.linalg.norm(np.cross(x, y), axis=-1)
        if (nx < 1e-2).any() or (ny < 1e-2).any() or (cross < 1e-2).any():
            return
        m = np.asarray(txform.orthogonalize_from_xy(xy))
        eye = np.broadcast_to(np.eye(3), m.shape)
        np.testing.assert_allclose(m @ np.swapaxes(m, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)
