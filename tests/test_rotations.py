"""Rotation-conversion tests vs scipy and (when present) the reference copy."""
import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_ROOT

import jax.numpy as jnp

from diffusestylegesture_tpu.utils import rotations as RT


def rand_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestSelf:
    def test_quat_matrix_roundtrip(self):
        q = rand_quats(32)
        m = np.asarray(RT.quaternion_to_matrix(jnp.asarray(q)))
        q2 = np.asarray(RT.matrix_to_quaternion(jnp.asarray(m)))
        dot = np.abs(np.sum(q * q2, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_vs_scipy(self):
        from scipy.spatial.transform import Rotation

        q = rand_quats(16, seed=1)
        m = np.asarray(RT.quaternion_to_matrix(jnp.asarray(q)))
        m_ref = Rotation.from_quat(np.roll(q, -1, axis=-1)).as_matrix()
        np.testing.assert_allclose(m, m_ref, atol=1e-5)

    def test_axis_angle(self):
        rng = np.random.default_rng(2)
        aa = rng.standard_normal((20, 3)).astype(np.float32)
        m = np.asarray(RT.axis_angle_to_matrix(jnp.asarray(aa)))
        from scipy.spatial.transform import Rotation

        np.testing.assert_allclose(m, Rotation.from_rotvec(aa).as_matrix(), atol=1e-5)
        aa2 = np.asarray(RT.matrix_to_axis_angle(jnp.asarray(m)))
        np.testing.assert_allclose(
            Rotation.from_rotvec(aa2).as_matrix(), m, atol=1e-4
        )

    def test_rot6d(self):
        q = rand_quats(10, seed=3)
        m = np.asarray(RT.quaternion_to_matrix(jnp.asarray(q)))
        d6 = np.asarray(RT.matrix_to_rotation_6d(jnp.asarray(m)))
        m2 = np.asarray(RT.rotation_6d_to_matrix(jnp.asarray(d6)))
        np.testing.assert_allclose(m2, m, atol=1e-5)

    def test_euler(self):
        from scipy.spatial.transform import Rotation

        rng = np.random.default_rng(4)
        e = rng.uniform(-1, 1, (10, 3)).astype(np.float32)
        for conv in ("XYZ", "ZYX", "ZXY"):
            m = np.asarray(RT.euler_angles_to_matrix(jnp.asarray(e), conv))
            m_ref = Rotation.from_euler(conv, e).as_matrix()
            np.testing.assert_allclose(m, m_ref, atol=1e-5)


@requires_reference
class TestReferenceParity:
    def test_vs_vendored_pytorch3d(self):
        import sys
        import torch

        sys.path.insert(0, f"{REFERENCE_ROOT}/main")
        from utils import rotation_conversions as ref  # type: ignore

        q = rand_quats(12, seed=5)
        np.testing.assert_allclose(
            np.asarray(RT.quaternion_to_matrix(jnp.asarray(q))),
            ref.quaternion_to_matrix(torch.as_tensor(q)).numpy(),
            atol=1e-5,
        )
        rng = np.random.default_rng(6)
        d6 = rng.standard_normal((12, 6)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(RT.rotation_6d_to_matrix(jnp.asarray(d6))),
            ref.rotation_6d_to_matrix(torch.as_tensor(d6)).numpy(),
            atol=1e-5,
        )
        aa = rng.standard_normal((12, 3)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(RT.axis_angle_to_matrix(jnp.asarray(aa))),
            ref.axis_angle_to_matrix(torch.as_tensor(aa)).numpy(),
            atol=1e-5,
        )
        m = ref.axis_angle_to_matrix(torch.as_tensor(aa))
        np.testing.assert_allclose(
            np.abs(np.asarray(RT.matrix_to_quaternion(jnp.asarray(m.numpy())))),
            np.abs(ref.matrix_to_quaternion(m).numpy()),
            atol=1e-4,
        )
