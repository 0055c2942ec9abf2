"""Cone-set constants and tangent-frame math.

Ref: Shader/VoxelConeTracing.fs:46-57 (weights/directions),
:175-177 (TBN construction), :198 (world-space rotation at trace time).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array

# 6-cone diffuse hemisphere: one axial cone + 5 cones at 60 deg elevation
# spaced 72 deg in azimuth; weights sum to 1.  fs:48-57.
CONE_WEIGHTS = np.array([0.25, 0.15, 0.15, 0.15, 0.15, 0.15], dtype=np.float32)
CONE_DIRECTIONS = np.array(
    [
        [0.0, 0.0, 1.0],
        [0.0, 0.866025, 0.5],
        [0.823639, 0.267617, 0.5],
        [0.509037, -0.700629, 0.5],
        [-0.509037, -0.700629, 0.5],
        [-0.823639, 0.267617, 0.5],
    ],
    dtype=np.float32,
)


def normalize(v: Array, eps: float = 1e-12) -> Array:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def tbn_matrix(tangent: Array, bitangent: Array, normal: Array) -> Array:
    """TBN = inverse(transpose(mat3(T, B, N))) — fs:175.

    Columns of mat3(T,B,N) are T,B,N (GLSL is column-major), so
    inverse(transpose(M)) applied to a tangent-space vector v gives the
    world-space direction. For an orthonormal frame this equals M itself;
    we reproduce the general expression for parity with non-orthonormal
    imported tangents. Inputs (..., 3); returns (..., 3, 3) applying as
    out = mat @ v.
    """
    m = jnp.stack([tangent, bitangent, normal], axis=-1)   # columns T,B,N
    return jnp.linalg.inv(jnp.swapaxes(m, -1, -2))


def rotate_cones(tbn: Array, directions: Array) -> Array:
    """World-space cone directions: normalize(TBN @ dir) — fs:198.

    tbn: (..., 3, 3); directions: (K, 3) -> (..., K, 3).
    """
    out = jnp.einsum("...ij,kj->...ki", tbn, directions)
    return normalize(out)


def orthonormal_frame(normal: Array) -> tuple[Array, Array]:
    """A stable tangent/bitangent for geometry without authored tangents
    (Cornell box, procedural scenes). Duff et al. branchless ONB."""
    n = normal
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + s * n[..., 0] ** 2 * a, s * b, -s * n[..., 0]], axis=-1)
    bt = jnp.stack([b, s + n[..., 1] ** 2 * a, -n[..., 1]], axis=-1)
    return t, bt
