"""Batched deformation-gradient extraction and reconstruction (triangle level).

TPU-native equivalent of the reference C++ (Sumner-style deformation
transfer) — everything is vectorized over triangles (and any leading batch
dims) instead of per-triangle loops:

- extraction: /root/reference/deformation/cpp/src/deform_triangle_impl.hpp:144-213
  (edge frames with |cross|^(1/2) third edge + degeneracy guard, affine
  T = Mb·Ma⁻¹, polar decomposition via SVD into symmetric scale (6 values,
  diag −1) and rotation log (3 values) → 9 floats/triangle)
- reconstruction: deform_triangle_impl.hpp:226-244 (T = exp(skew)·S, stored
  transposed for the least-squares RHS).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import rotation

EPS_DEFAULT = 1e-6


def _edge3(e1: jnp.ndarray, e2: jnp.ndarray, eps: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Third-edge vector and validity flag (deform_triangle_impl.hpp:150-161)."""
    e3 = jnp.cross(e1, e2)
    len1 = jnp.linalg.norm(e1, axis=-1)
    len2 = jnp.linalg.norm(e2, axis=-1)
    denom = jnp.where(len1 * len2 == 0, 1.0, len1 * len2)
    cos = jnp.abs(jnp.sum(e1 * e2, axis=-1) / denom)
    valid = cos <= (1.0 - eps)
    norm = jnp.power(jnp.sum(e3 * e3, axis=-1), 0.25)
    e3 = e3 / jnp.maximum(norm, eps)[..., None]
    return e3, valid


def triangle_frames(verts: jnp.ndarray, faces: jnp.ndarray, eps: float = EPS_DEFAULT):
    """(..., V, 3), (F, 3) → edge-frame matrices (..., F, 3, 3) (columns
    e1, e2, e3) and validity flags (..., F)."""
    v1 = jnp.take(verts, faces[:, 0], axis=-2)
    v2 = jnp.take(verts, faces[:, 1], axis=-2)
    v3 = jnp.take(verts, faces[:, 2], axis=-2)
    e1 = v2 - v1
    e2 = v3 - v1
    e3, valid = _edge3(e1, e2, eps)
    return jnp.stack([e1, e2, e3], axis=-1), valid


def deformation_gradients(
    src_verts: jnp.ndarray,
    dst_verts: jnp.ndarray,
    faces: jnp.ndarray,
    eps: float = EPS_DEFAULT,
) -> jnp.ndarray:
    """Per-triangle 9-float deformation gradients; (..., V, 3) → (..., F, 9).

    Degenerate source/target triangles produce zero gradients, as the
    reference does.
    """
    ma, ok_a = triangle_frames(src_verts, faces, eps)
    mb, ok_b = triangle_frames(dst_verts, faces, eps)
    t = jnp.matmul(mb, jnp.linalg.inv(ma), precision=jax.lax.Precision.HIGHEST)

    # polar decomposition via SVD with reflection fix
    u, s, vt = jnp.linalg.svd(t)
    v = jnp.swapaxes(vt, -1, -2)
    det = jnp.linalg.det(jnp.matmul(u, vt))
    temp_diag = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    u_fix = u * temp_diag[..., None, :]
    rot = jnp.matmul(u_fix, vt, precision=jax.lax.Precision.HIGHEST)
    scale = jnp.matmul(v * (temp_diag * s)[..., None, :], vt, precision=jax.lax.Precision.HIGHEST)

    w = rotation.so3_log(rot)
    rot_entries = rotation.dgrad_rotvec_to_entries(w)

    grad = jnp.concatenate(
        [
            scale[..., 0, 0, None] - 1.0,
            scale[..., 0, 1, None],
            scale[..., 0, 2, None],
            scale[..., 1, 1, None] - 1.0,
            scale[..., 1, 2, None],
            scale[..., 2, 2, None] - 1.0,
            rot_entries,
        ],
        axis=-1,
    )
    valid = (ok_a & ok_b)[..., None]
    return jnp.where(valid, grad, jnp.zeros_like(grad))


def dgrad_to_transforms_t(dgrad: jnp.ndarray) -> jnp.ndarray:
    """dgrad (..., F, 9) → transposed transforms (..., F, 3, 3):
    (exp(skew)·S)ᵀ, the rows fed into the least-squares RHS."""
    d = dgrad
    s = jnp.stack(
        [
            jnp.stack([d[..., 0] + 1.0, d[..., 1], d[..., 2]], axis=-1),
            jnp.stack([d[..., 1], d[..., 3] + 1.0, d[..., 4]], axis=-1),
            jnp.stack([d[..., 2], d[..., 4], d[..., 5] + 1.0], axis=-1),
        ],
        axis=-2,
    )
    w = rotation.dgrad_entries_to_rotvec(d[..., 6:9])
    r = rotation.so3_exp(w)
    t = jnp.matmul(r, s, precision=jax.lax.Precision.HIGHEST)
    return jnp.swapaxes(t, -1, -2)


def deformation_gradients_np(
    src_verts, dst_verts, faces, eps: float = EPS_DEFAULT
):
    """float64 numpy extraction — the preprocessing-grade path.

    The reference computes in double (deform_triangle_impl.hpp:144-213); the
    float32 jit path above is input-precision-limited (~1e-3 on scale for
    skinny triangles), so dataset-time dgrad generation uses this twin.
    """
    import numpy as np

    src = np.asarray(src_verts, np.float64).reshape(-1, 3)
    dst = np.asarray(dst_verts, np.float64).reshape(-1, 3)
    faces = np.asarray(faces, np.int64).reshape(-1, 3)

    def frame(a1, a2):
        e3 = np.cross(a1, a2)
        len1 = np.linalg.norm(a1, axis=-1)
        len2 = np.linalg.norm(a2, axis=-1)
        denom = np.where(len1 * len2 == 0, 1.0, len1 * len2)
        cos = np.abs(np.sum(a1 * a2, axis=-1) / denom)
        valid = cos <= (1.0 - eps)
        norm = (np.sum(e3 * e3, axis=-1)) ** 0.25
        e3 = e3 / np.maximum(norm, eps)[:, None]
        return np.stack([a1, a2, e3], axis=-1), valid

    v1, v2, v3 = (src[faces[:, i]] for i in range(3))
    w1, w2, w3 = (dst[faces[:, i]] for i in range(3))
    ma, ok_a = frame(v2 - v1, v3 - v1)
    mb, ok_b = frame(w2 - w1, w3 - w1)
    t = mb @ np.linalg.inv(ma)
    u, s, vt = np.linalg.svd(t)
    det = np.linalg.det(u @ vt)
    tmp = np.tile(np.eye(3), (len(t), 1, 1))
    tmp[:, 2, 2] = det
    rot = u @ tmp @ vt
    scale = np.swapaxes(vt, 1, 2) @ tmp @ (s[..., None] * vt)
    # rotation log (utils_rotation.cpp:73-130 conventions)
    tr = np.trace(rot, axis1=1, axis2=2)
    csin = np.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    ang = np.arccos(csin)
    taxis = np.stack(
        [
            rot[:, 2, 1] - rot[:, 1, 2],
            rot[:, 0, 2] - rot[:, 2, 0],
            rot[:, 1, 0] - rot[:, 0, 1],
        ],
        axis=-1,
    )
    sin_safe = np.where(np.abs(np.sin(ang)) < 1e-12, 1.0, np.sin(ang))
    wvec = taxis / (2.0 * sin_safe[:, None]) * ang[:, None]
    wvec[ang < 1e-6] = 0.0
    near_pi = np.abs(ang - np.pi) < 1e-6
    if near_pi.any():
        b = (rot[near_pi] + np.eye(3)) / 2.0
        k1 = np.sqrt(np.clip(b[:, 0, 0], 0, None))
        k2 = np.where(k1 * b[:, 0, 1] > 0, 1.0, -1.0) * np.sqrt(np.clip(b[:, 1, 1], 0, None))
        k3 = np.where(k1 * b[:, 0, 2] > 0, 1.0, -1.0) * np.sqrt(np.clip(b[:, 2, 2], 0, None))
        wvec[near_pi] = np.stack([k1, k2, k3], axis=-1) * np.pi

    g = np.zeros((len(t), 9))
    g[:, 0] = scale[:, 0, 0] - 1.0
    g[:, 1] = scale[:, 0, 1]
    g[:, 2] = scale[:, 0, 2]
    g[:, 3] = scale[:, 1, 1] - 1.0
    g[:, 4] = scale[:, 1, 2]
    g[:, 5] = scale[:, 2, 2] - 1.0
    g[:, 6] = -wvec[:, 2]
    g[:, 7] = wvec[:, 1]
    g[:, 8] = -wvec[:, 0]
    g[~(ok_a & ok_b)] = 0.0
    return g


def deformation_matrices(
    src_verts: jnp.ndarray,
    dst_verts: jnp.ndarray,
    faces: jnp.ndarray,
    eps: float = EPS_DEFAULT,
) -> jnp.ndarray:
    """Raw per-triangle affine transforms (..., F, 3, 3); degenerate → I
    (reference getDeformationMatrix, deform_triangle_impl.hpp:313-383)."""
    ma, ok_a = triangle_frames(src_verts, faces, eps)
    mb, ok_b = triangle_frames(dst_verts, faces, eps)
    t = jnp.matmul(mb, jnp.linalg.inv(ma), precision=jax.lax.Precision.HIGHEST)
    eye = jnp.eye(3, dtype=t.dtype)
    return jnp.where((ok_a & ok_b)[..., None, None], t, eye)
