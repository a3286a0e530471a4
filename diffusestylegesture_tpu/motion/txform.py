"""Two-axis (6D) rotation representation utilities.

Parity with the reference `anim/txform.py` (`xform_orthogonalize_from_xy`,
`anim/txform.py:23-40`): rebuild an orthonormal rotation matrix from the
first two (x, y) column axes via Gram–Schmidt + cross product. This is the
6D rotation representation used in the ZEGGS 1141-d pose vector
(`main/process/process_zeggs_bvh.py:250-251`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalize(v: jax.Array, eps: float = 1e-10) -> jax.Array:
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + eps)


def orthogonalize_from_xy(xy: jax.Array, eps: float = 1e-10) -> jax.Array:
    """(..., 2, 3) two-axis → (..., 3, 3) rotation matrix.

    Input layout matches the reference featurizer
    (`process_zeggs_bvh.py:182-184`): ``xy[..., 0, :]`` is the rotated x
    axis (first column of R) and ``xy[..., 1, :]`` the approximate rotated
    y axis, each stored as a length-3 row. The output places the
    re-orthogonalized axes as matrix *columns*, matching
    `xform_orthogonalize_from_xy` + transpose (`anim/txform.py:23-40`).
    """
    x = xy[..., 0, :]
    y = xy[..., 1, :]
    z = jnp.cross(x, y)
    x = _normalize(x, eps)
    z = _normalize(z, eps)
    y = _normalize(jnp.cross(z, x), eps)
    return jnp.stack([x, y, z], axis=-1)


def to_xy(xform: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix → (..., 2, 3) two-axis representation."""
    return jnp.stack([xform[..., :, 0], xform[..., :, 1]], axis=-2)
