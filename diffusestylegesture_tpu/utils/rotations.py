"""Rotation-representation conversions (pytorch3d-convention, JAX).

Parity with the reference's vendored pytorch3d copy
(`main/utils/rotation_conversions.py`, used by the MDM-legacy
`rotation2xyz.py`/SMPL path): (w, x, y, z) quaternions, matrix ↔
quaternion/axis-angle/euler, and the Zhou et al. continuous 6D
representation (`rotation_conversions.py:513` `rotation_6d_to_matrix`:
6D = the first two matrix ROWS, Gram–Schmidt).

(The SMPL mesh regression itself needs the external body-model asset and
is out of the compute path; these conversions are the reusable math.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quaternion_to_matrix(quaternions: jax.Array) -> jax.Array:
    r = quaternions[..., 0]
    i = quaternions[..., 1]
    j = quaternions[..., 2]
    k = quaternions[..., 3]
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.maximum(x, 0.0))


def matrix_to_quaternion(matrix: jax.Array) -> jax.Array:
    """pytorch3d branchless variant: pick the largest-denominator case."""
    m = matrix
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )
    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m[..., 2, 1] - m[..., 1, 2],
                       m[..., 0, 2] - m[..., 2, 0], m[..., 1, 0] - m[..., 0, 1]], -1),
            jnp.stack([m[..., 2, 1] - m[..., 1, 2], q_abs[..., 1] ** 2,
                       m[..., 1, 0] + m[..., 0, 1], m[..., 0, 2] + m[..., 2, 0]], -1),
            jnp.stack([m[..., 0, 2] - m[..., 2, 0], m[..., 1, 0] + m[..., 0, 1],
                       q_abs[..., 2] ** 2, m[..., 2, 1] + m[..., 1, 2]], -1),
            jnp.stack([m[..., 1, 0] - m[..., 0, 1], m[..., 2, 0] + m[..., 0, 2],
                       m[..., 2, 1] + m[..., 1, 2], q_abs[..., 3] ** 2], -1),
        ],
        axis=-2,
    )
    flr = 0.1
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr * 1e-2))
    best = jnp.argmax(q_abs, axis=-1)
    out = jnp.take_along_axis(
        quat_candidates, best[..., None, None].repeat(4, -1), axis=-2
    )[..., 0, :]
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def axis_angle_to_quaternion(axis_angle: jax.Array, eps: float = 1e-6) -> jax.Array:
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = angles * 0.5
    small = jnp.abs(angles) < eps
    sin_half_over = jnp.where(
        small, 0.5 - (angles * angles) / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angles)
    )
    return jnp.concatenate([jnp.cos(half), axis_angle * sin_half_over], axis=-1)


def quaternion_to_axis_angle(quaternions: jax.Array, eps: float = 1e-6) -> jax.Array:
    norms = jnp.linalg.norm(quaternions[..., 1:], axis=-1, keepdims=True)
    half_angles = jnp.arctan2(norms, quaternions[..., :1])
    angles = 2.0 * half_angles
    small = jnp.abs(angles) < eps
    sin_half_over = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / jnp.where(small, 1.0, angles),
    )
    return quaternions[..., 1:] / sin_half_over


def axis_angle_to_matrix(axis_angle: jax.Array) -> jax.Array:
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: jax.Array) -> jax.Array:
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """(..., 6) two-row 6D → (..., 3, 3) (ref `rotation_conversions.py:513`)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(matrix: jax.Array) -> jax.Array:
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


def quaternion_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quaternion_invert(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def euler_angles_to_matrix(euler_angles: jax.Array, convention: str) -> jax.Array:
    """Intrinsic rotations applied in `convention` order (pytorch3d)."""

    def axis_rot(axis: str, angle: jax.Array) -> jax.Array:
        cos, sin = jnp.cos(angle), jnp.sin(angle)
        one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
        if axis == "X":
            flat = [one, zero, zero, zero, cos, -sin, zero, sin, cos]
        elif axis == "Y":
            flat = [cos, zero, sin, zero, one, zero, -sin, zero, cos]
        else:
            flat = [cos, -sin, zero, sin, cos, zero, zero, zero, one]
        return jnp.stack(flat, -1).reshape(angle.shape + (3, 3))

    mats = [axis_rot(c, euler_angles[..., i]) for i, c in enumerate(convention)]
    return mats[0] @ mats[1] @ mats[2]
