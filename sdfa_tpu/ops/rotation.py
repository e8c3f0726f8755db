"""Batched SO(3) exponential / logarithm maps.

TPU-native (vectorized, jittable) equivalent of the reference C++ rotation
utilities (/root/reference/deformation/cpp/src/rotation/utils_rotation.cpp:4-215)
with the same conventions and tolerance (1e-6):

- skew(a) = [[0,-a2,a1],[a2,0,-a0],[-a1,a0,0]]
- exp: Rodrigues; angle < tol → identity
- log: angle = acos((tr-1)/2); near-0 → zero; near-π explicit sqrt branch.

The dgrad layout packs log-rotation entries as (d6,d7,d8) =
(logR[0,1], logR[0,2], logR[1,2]), i.e. rotvec ω = (−d8, d7, −d6)
(deform_triangle_impl.hpp:226-244, 448-470).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TOL = 1e-6


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) rotation vector → (..., 3, 3) skew matrix."""
    a0, a1, a2 = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(a0)
    return jnp.stack(
        [
            jnp.stack([zero, -a2, a1], axis=-1),
            jnp.stack([a2, zero, -a0], axis=-1),
            jnp.stack([-a1, a0, zero], axis=-1),
        ],
        axis=-2,
    )


def unskew(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) skew matrix → (..., 3) rotation vector."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exp of rotation vectors (..., 3) → (..., 3, 3)."""
    dtype = w.dtype
    angle = jnp.linalg.norm(w, axis=-1, keepdims=True)
    small = angle[..., 0] < TOL
    safe = jnp.where(angle < TOL, 1.0, angle)
    k = skew(w / safe)
    s = jnp.sin(angle)[..., None]
    c1 = (1.0 - jnp.cos(angle))[..., None]
    eye = jnp.eye(3, dtype=dtype)
    rot = eye + s * k + c1 * jnp.matmul(k, k, precision=jax.lax.Precision.HIGHEST)
    return jnp.where(small[..., None, None], eye, rot)


def so3_log(rot: jnp.ndarray) -> jnp.ndarray:
    """Matrix log of rotations (..., 3, 3) → rotation vectors (..., 3).

    Matches the reference branch structure: near-identity → 0; near-π →
    sign-consistent sqrt of (R+I)/2 diagonal; otherwise skew-part formula.
    """
    dtype = rot.dtype
    tr = rot[..., 0, 0] + rot[..., 1, 1] + rot[..., 2, 2]
    csin = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    angle = jnp.arccos(csin)

    near_zero = jnp.abs(angle) < TOL
    near_pi = jnp.abs(angle - jnp.pi) < 1e-4

    # --- generic branch ---
    taxis = jnp.stack(
        [
            rot[..., 2, 1] - rot[..., 1, 2],
            rot[..., 0, 2] - rot[..., 2, 0],
            rot[..., 1, 0] - rot[..., 0, 1],
        ],
        axis=-1,
    )
    sin_safe = jnp.where(near_zero | near_pi, 1.0, jnp.sin(angle))
    axis_gen = taxis / (2.0 * sin_safe[..., None])

    # --- near-π branch: axis from B = (R+I)/2 diagonal with sign consistency ---
    eye = jnp.eye(3, dtype=dtype)
    b = (rot + eye) / 2.0
    diag = jnp.clip(
        jnp.stack([b[..., 0, 0], b[..., 1, 1], b[..., 2, 2]], axis=-1), 0.0, None
    )
    k1 = jnp.sqrt(diag[..., 0])
    k2 = jnp.where(k1 * b[..., 0, 1] > 0, 1.0, -1.0) * jnp.sqrt(diag[..., 1])
    k3 = jnp.where(k1 * b[..., 0, 2] > 0, 1.0, -1.0) * jnp.sqrt(diag[..., 2])
    axis_pi = jnp.stack([k1, k2, k3], axis=-1)

    axis = jnp.where(near_pi[..., None], axis_pi, axis_gen)
    w = axis * angle[..., None]
    return jnp.where(near_zero[..., None], jnp.zeros_like(w), w)


def dgrad_rotvec_to_entries(w: jnp.ndarray) -> jnp.ndarray:
    """rotvec (..., 3) → dgrad rotation entries (d6, d7, d8)."""
    return jnp.stack([-w[..., 2], w[..., 1], -w[..., 0]], axis=-1)


def dgrad_entries_to_rotvec(d: jnp.ndarray) -> jnp.ndarray:
    """dgrad rotation entries (d6, d7, d8) → rotvec (..., 3)."""
    return jnp.stack([-d[..., 2], d[..., 1], -d[..., 0]], axis=-1)
