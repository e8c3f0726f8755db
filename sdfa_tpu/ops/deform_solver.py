"""Deformation-transfer least-squares solver, batched for TPU.

TPU-native re-design of the reference C++ core
(/root/reference/deformation/cpp/src/deform_triangle_impl.hpp):

- ``setStaticTarget`` (:8-142): per-triangle local frame via Gram-Schmidt QR,
  sparse A over free vertices / Ar over constrained vertices, AtA with
  diagonal regularization, prefactorization.  Here the build happens once on
  the host in float64 (numpy/scipy), but instead of a sequential SparseLU we
  precompute a **dense inverse of AtA** (the free system is only
  ~1.3k×1.3k for FLAME) so the per-frame solve becomes a single MXU matmul,
  batched over arbitrarily many frames.
- ``getMeshFromDeformationGradients`` (:215-310): per-frame RHS assembly
  (exp(skew)·S per triangle, constrained-vertex subtraction, At·D) is a pair
  of einsums + one segment-sum on device; optional triangle-correspondence
  fan-out for cross-topology retargeting is precomputed into an equation
  table.

Accuracy: the device path runs in float32 with iterative refinement against
a float32 dense AtA (default 2 steps), which lands max-vertex error well
below the 1e-4 budget vs the float64 host oracle (see tests).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import dgrad as dgrad_ops

from ..nn.precision import OPS_PREC as _PREC


class DeformConsts(NamedTuple):
    """Device-side solver constants as a pytree.

    Passing these as *arguments* (not closure captures) keeps the ~100 MB
    P operator out of jaxprs as an embedded constant — embedding it made
    every downstream jit compile minutes-slow.
    """

    w: jnp.ndarray            # (n_tris, 3 slots, 3) local-frame weights
    p: jnp.ndarray            # (3, n_eqs, n_free) direct-solve operator,
    #   pre-split per component and pre-transposed: slicing the
    #   interleaved (n_free, 3·n_eqs) operator with [:, c::3] per call
    #   showed up as three ~14-30 ms strided copies (3.6 GB/s) gating the
    #   solve matmuls in the round-3 profile
    par: jnp.ndarray          # (n_free, n_cnsts) constraint subtraction
    inv: jnp.ndarray          # (n_free, n_free) (AtA)⁻¹ (refine path)
    ata: jnp.ndarray          # (n_free, n_free) AtA (refine path)
    atar: jnp.ndarray         # (n_free, n_cnsts) At·Ar (refine path)
    eq_src: jnp.ndarray       # (n_eqs,) source-triangle per equation (−1 → I)
    seg_ids: jnp.ndarray      # (3·n_eqs,) segment ids (refine path)
    free_ids: jnp.ndarray     # (n_free,)
    cnst_ids: jnp.ndarray     # (n_cnsts,)
    template_cnst: jnp.ndarray  # (n_cnsts, 3)


class SolverSpec(NamedTuple):
    """Hashable static metadata for :func:`solve_fn`."""

    n_verts: int
    n_tris: int
    n_free: int
    n_cnsts: int
    n_eqs: int
    identity_eq: bool


def _eq_transforms_t(consts: DeformConsts, spec: SolverSpec, dgrad: jnp.ndarray) -> jnp.ndarray:
    """Per-equation transposed transforms (..., n_eqs, 3, 3); identity rows
    where a triangle has no correspondence."""
    tt = dgrad_ops.dgrad_to_transforms_t(dgrad)  # (..., F, 3, 3)
    if spec.identity_eq:
        return tt
    gathered = jnp.take(tt, jnp.clip(consts.eq_src, 0, None), axis=-3)
    eye = jnp.eye(3, dtype=tt.dtype)
    return jnp.where((consts.eq_src < 0)[:, None, None], eye, gathered)


def _rhs_fn(consts: DeformConsts, spec: SolverSpec, dgrad: jnp.ndarray,
            cnst_verts: jnp.ndarray) -> jnp.ndarray:
    """Assemble At·(D − Ar·C): dgrad (..., F, 9) → (..., n_free, 3)."""
    tt_eq = _eq_transforms_t(consts, spec, dgrad)
    w_eq = consts.w if spec.identity_eq else jnp.take(
        consts.w, jnp.clip(consts.eq_src, 0, None), axis=0
    )
    # E[..., k, slot, d] = Σ_c W[k, slot, c] · Tt[..., k, c, d]
    e = jnp.einsum("kvc,...kcd->...kvd", w_eq, tt_eq, precision=_PREC)
    batch_shape = e.shape[:-3]
    flat = e.reshape(batch_shape + (spec.n_eqs * 3, 3))

    def seg_sum(data):
        return jax.ops.segment_sum(data, consts.seg_ids, num_segments=spec.n_free + 1)[
            : spec.n_free
        ]

    for _ in range(len(batch_shape)):
        seg_sum = jax.vmap(seg_sum)
    rhs = seg_sum(flat)
    if spec.n_cnsts > 0:
        rhs = rhs - jnp.einsum("mr,rd->md", consts.atar, cnst_verts, precision=_PREC)
    return rhs


def _transform_entries(dgrad_flat: jnp.ndarray, n_tris: int,
                       layout: str = "tri"):
    """dgrad (..., n_tris·9) → the 9 entries of T = exp(skew)·S as a 3×3
    nested list of (..., n_tris) arrays.

    TPU layout note: keeping per-component planes (minor dim = n_tris)
    avoids the (..., n_tris, 9)/(..., 3, 3) layouts whose 128-lane tile
    padding blows memory up 14-42× on TPU.

    ``layout``: "tri" = the reference frame layout [tri·9 + k] — the
    9 per-component slices are stride-9 gathers, which XLA implements by
    transposing the whole (..., 9·n_tris) array first (19 ms of pure
    layout traffic per serving call at W=8832, round-3 profile). "planes"
    = k-major [k·n_tris + tri]: every slice is contiguous and free. The
    serving decode emits planes directly (models/sdfa.decode_to_anime
    planes=True) — same math, one permutation folded into the decode's
    existing interleave gather.
    """
    if layout == "planes":
        d = [dgrad_flat[..., k * n_tris:(k + 1) * n_tris] for k in range(9)]
    else:
        d = [dgrad_flat[..., k::9] for k in range(9)]
    return transform_entries_from_planes(d)


def transform_entries_from_planes(d):
    """The 9 component planes d[0..8] → t[i][j] planes of T = exp(skew)·S.
    Shared verbatim by the XLA path above and the fused Pallas
    decode+solve kernel (ops/pallas_decode_solve.py) so their math is
    identical by construction."""
    one = jnp.ones_like(d[0])
    # symmetric scale S (+I on the diagonal)
    s = [[d[0] + 1.0, d[1], d[2]],
         [d[1], d[3] + 1.0, d[4]],
         [d[2], d[4], d[5] + 1.0]]
    # rotation R = cosθ·I + sinθ·K + (1−cosθ)·aaᵀ with ω = (−d8, d7, −d6)
    w0, w1, w2 = -d[8], d[7], -d[6]
    theta2 = w0 * w0 + w1 * w1 + w2 * w2
    theta = jnp.sqrt(theta2)
    small = theta < 1e-6
    inv_t = jnp.where(small, 0.0, 1.0 / jnp.where(small, 1.0, theta))
    a0, a1, a2 = w0 * inv_t, w1 * inv_t, w2 * inv_t
    st = jnp.sin(theta)
    ct = jnp.cos(theta)
    omc = 1.0 - ct
    r = [[ct + omc * a0 * a0, -st * a2 + omc * a0 * a1, st * a1 + omc * a0 * a2],
         [st * a2 + omc * a1 * a0, ct + omc * a1 * a1, -st * a0 + omc * a1 * a2],
         [-st * a1 + omc * a2 * a0, st * a0 + omc * a2 * a1, ct + omc * a2 * a2]]
    # identity where θ ≈ 0 (rotation part only)
    eye = [[one, 0 * one, 0 * one], [0 * one, one, 0 * one], [0 * one, 0 * one, one]]
    r = [[jnp.where(small, eye[i][j], r[i][j]) for j in range(3)] for i in range(3)]
    # T = R·S
    t = [[sum(r[i][k] * s[k][j] for k in range(3)) for j in range(3)] for i in range(3)]
    return t


def assemble_from_free(consts: DeformConsts, spec: SolverSpec,
                       x: jnp.ndarray, cnst_verts: jnp.ndarray,
                       out_layout: str) -> jnp.ndarray:
    """Free-vertex solution x (..., 3, n_free) → full vertex array in the
    requested layout: subtract the constrained-vertex correction and
    scatter free + constrained ids. Shared by the XLA direct path and the
    fused Pallas decode+solve kernel."""
    if spec.n_cnsts > 0:
        corr = jnp.matmul(consts.par, cnst_verts, precision=_PREC)  # (n_free, 3)
        x = x - corr.T
    batch_shape = x.shape[:-2]
    out = jnp.zeros(batch_shape + (3, spec.n_verts), x.dtype)
    out = out.at[..., consts.free_ids].set(x)
    if spec.n_cnsts > 0:
        out = out.at[..., consts.cnst_ids].set(
            jnp.broadcast_to(cnst_verts.T, batch_shape + (3, spec.n_cnsts))
        )
    if out_layout == "3v":
        return out
    if out_layout == "flat":
        return jnp.swapaxes(out, -1, -2).reshape(batch_shape + (spec.n_verts * 3,))
    return jnp.swapaxes(out, -1, -2)


def solve_fn(
    consts: DeformConsts,
    dgrad: jnp.ndarray,
    cnst_verts: jnp.ndarray,
    *,
    spec: SolverSpec,
    method: str = "direct",
    refine: int = 2,
    out_layout: str = "v3",
    dgrad_layout: str = "tri",
) -> jnp.ndarray:
    """Pure batched solve: dgrad (..., F, 9) or (..., F·9) → vertices.

    out_layout: "v3" → (..., V, 3) (host-friendly; avoid for huge batches on
    TPU — lane padding), "3v" → (..., 3, V) (TPU-native), "flat" → (..., V·3).
    dgrad_layout: "tri" (reference [tri·9+k]) or "planes" (k-major — the
    TPU-fast serving layout, see _transform_entries).
    Jittable with ``consts`` as a pytree argument.
    """
    if method == "direct":
        if dgrad.shape[-1] == 9:
            dgrad_flat = dgrad.reshape(dgrad.shape[:-2] + (spec.n_tris * 9,))
        else:
            dgrad_flat = dgrad
        t = _transform_entries(dgrad_flat, spec.n_tris, dgrad_layout)
        if not spec.identity_eq:
            src = jnp.clip(consts.eq_src, 0, None)
            ident = (consts.eq_src < 0)
            t = [[jnp.where(ident, 1.0 if i == j else 0.0,
                            jnp.take(t[i][j], src, axis=-1))
                  for j in range(3)] for i in range(3)]
        # Materialize the 9 transform planes ONCE. Without the barrier XLA
        # re-fuses the whole exp(skew)·S construction (trig + selects)
        # into EACH of the 9 P matmuls: the round-3 profile shows those
        # fusions at 14-23 ms apiece vs a ~3.4 ms MXU roofline for the
        # pure (W, n_eqs)@(n_eqs, n_free) product. 9 materialized planes
        # cost one write+read each (~8 ms total at W=8832) and let the
        # matmuls tile cleanly. SDFA_SOLVE_BARRIER=0 restores fusion.
        if os.environ.get("SDFA_SOLVE_BARRIER", "1") == "1":
            t = jax.lax.optimization_barrier(t)
        # X_d = Σ_c T[d][c] @ P_cᵀ, with P_c = P[:, c::3] (n_free, n_eqs)
        xs = []
        if os.environ.get("SDFA_SOLVE_CAT", "0") == "1":
            # fused-row variant: one (…, 3·n_eqs)@(3·n_eqs, n_free) matmul
            # per output row instead of 3 accumulated (…, n_eqs) matmuls —
            # fewer/larger MXU ops and only one row's T planes live at a
            # time (HBM high-water-mark lever, VERDICT r2 #6).
            p_gt = consts.p.reshape(3 * spec.n_eqs, spec.n_free)
            for dd in range(3):
                t_cat = jnp.concatenate([t[dd][c] for c in range(3)], axis=-1)
                xs.append(jnp.matmul(t_cat, p_gt, precision=_PREC))
        else:
            for dd in range(3):
                acc = None
                for c in range(3):
                    term = jnp.matmul(t[dd][c], consts.p[c], precision=_PREC)
                    acc = term if acc is None else acc + term
                xs.append(acc)  # (..., n_free)
        x = jnp.stack(xs, axis=-2)  # (..., 3, n_free)
        return assemble_from_free(consts, spec, x, cnst_verts, out_layout)
    else:
        if dgrad.shape[-1] != 9:
            dgrad = dgrad.reshape(dgrad.shape[:-1] + (spec.n_tris, 9))
        rhs = _rhs_fn(consts, spec, dgrad, cnst_verts)

        def apply_inv(bb):
            return jnp.einsum("mn,...nd->...md", consts.inv, bb, precision=_PREC)

        x = apply_inv(rhs)
        for _ in range(refine):
            r = rhs - jnp.einsum("mn,...nd->...md", consts.ata, x, precision=_PREC)
            x = x + apply_inv(r)

    batch_shape = x.shape[:-2]
    out = jnp.zeros(batch_shape + (spec.n_verts, 3), x.dtype)
    out = out.at[..., consts.free_ids, :].set(x)
    if spec.n_cnsts > 0:
        out = out.at[..., consts.cnst_ids, :].set(
            jnp.broadcast_to(cnst_verts, batch_shape + cnst_verts.shape)
        )
    return out


def solve_mat_fn(
    consts: DeformConsts,
    dmat: jnp.ndarray,
    cnst_verts: jnp.ndarray,
    *,
    spec: SolverSpec,
    out_layout: str = "v3",
) -> jnp.ndarray:
    """Solve from RAW per-triangle affine matrices instead of packed dgrads
    (reference getMeshFromDeformationMatrix, deform_triangle_impl.hpp:383-440).

    dmat: (..., F, 3, 3) or (..., F·9), row-major per triangle — exactly what
    ``dgrad_ops.deformation_matrices`` / ``get_deform_mat`` produce. The
    reference reads the row-major buffer as col-major (:396-398), i.e. the
    least-squares rows are Tᵀ — the same convention as the dgrad path here.
    """
    if dmat.shape[-1] == 3 and dmat.shape[-2] == 3:
        dmat_flat = dmat.reshape(dmat.shape[:-3] + (spec.n_tris * 9,))
    else:
        dmat_flat = dmat
    # t[d][c] = T[d, c] as component planes (minor dim n_tris — layout rule)
    t = [[dmat_flat[..., (3 * d + c)::9] for c in range(3)] for d in range(3)]
    if not spec.identity_eq:
        src = jnp.clip(consts.eq_src, 0, None)
        ident = (consts.eq_src < 0)
        t = [[jnp.where(ident, 1.0 if i == j else 0.0,
                        jnp.take(t[i][j], src, axis=-1))
              for j in range(3)] for i in range(3)]
    xs = []
    for dd in range(3):
        acc = None
        for c in range(3):
            term = jnp.matmul(t[dd][c], consts.p[c], precision=_PREC)
            acc = term if acc is None else acc + term
        xs.append(acc)
    x = jnp.stack(xs, axis=-2)  # (..., 3, n_free)
    if spec.n_cnsts > 0:
        corr = jnp.matmul(consts.par, cnst_verts, precision=_PREC)
        x = x - corr.T
    batch_shape = x.shape[:-2]
    out = jnp.zeros(batch_shape + (3, spec.n_verts), x.dtype)
    out = out.at[..., consts.free_ids].set(x)
    if spec.n_cnsts > 0:
        out = out.at[..., consts.cnst_ids].set(
            jnp.broadcast_to(cnst_verts.T, batch_shape + (3, spec.n_cnsts))
        )
    if out_layout == "3v":
        return out
    if out_layout == "flat":
        return jnp.swapaxes(out, -1, -2).reshape(batch_shape + (spec.n_verts * 3,))
    return jnp.swapaxes(out, -1, -2)


def _gram_schmidt_qr(a: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Column-wise Gram-Schmidt with the reference's degeneracy branch
    (deform_triangle_impl.hpp _qrFactorize, EPSILON=1e-6)."""
    rows, cols = a.shape
    q = np.zeros((rows, cols))
    r = np.zeros((cols, cols))
    for j in range(cols):
        v = a[:, j].copy()
        for i in range(j):
            r[i, j] = q[:, i] @ v
            v -= r[i, j] * q[:, i]
        vlen = np.sqrt(v @ v)
        if vlen < 1e-6:
            r[j, j] = 1.0
            q[:, j] = 0.0
        else:
            r[j, j] = vlen
            q[:, j] = v / vlen
    return q, r


class DeformationSolver:
    """Prefactorized deformation-transfer solver for a fixed template mesh.

    Parameters mirror the reference ``set_target``
    (deformation/cpp/src/pybind.cpp:129-136): vertices, triangle indices,
    constrained vertex indices, per-triangle correspondence counts (optional,
    for cross-topology retargeting) and the diagonal regularizer (1e-10).
    """

    def __init__(
        self,
        verts: np.ndarray,
        faces: np.ndarray,
        cnst_indices: Optional[Sequence[int]] = None,
        corr_count: Optional[Sequence[int]] = None,
        corr_faces: Optional[Sequence[int]] = None,
        reg: float = 1e-10,
        dtype=jnp.float32,
    ):
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        verts = np.asarray(verts, np.float64).reshape(-1, 3)
        faces = np.asarray(faces, np.int64).reshape(-1, 3)
        self.n_verts = len(verts)
        self.n_tris = len(faces)
        self.faces = faces
        self.template_verts = verts
        self._dtype = dtype

        cnst = np.asarray(
            cnst_indices if cnst_indices is not None else [], np.int64
        ).reshape(-1)
        self.n_cnsts = len(cnst)
        self.cnst_indices = cnst

        # --- vertex ↔ column maps (free system keeps ascending vert order) ---
        is_cnst = np.zeros(self.n_verts, bool)
        is_cnst[cnst] = True
        free_ids = np.nonzero(~is_cnst)[0]
        self.n_free = len(free_ids)
        self.free_ids = free_ids
        vi_to_col = np.full(self.n_verts, -1, np.int64)
        vi_to_col[free_ids] = np.arange(self.n_free)
        vi_to_col_r = np.full(self.n_verts, -1, np.int64)
        vi_to_col_r[cnst] = np.arange(self.n_cnsts)
        self._vi_to_col = vi_to_col

        # --- equation table (correspondence fan-out; identity rows for 0) ---
        if corr_count is not None and len(corr_count) > 0:
            corr_count = np.asarray(corr_count, np.int64)
            corr_faces = np.asarray(
                corr_faces if corr_faces is not None else [], np.int64
            )
            assert len(corr_count) == self.n_tris
            eq_tri, eq_src = [], []
            fi = 0
            for j in range(self.n_tris):
                steps = max(1, int(corr_count[j]))
                for _ in range(steps):
                    eq_tri.append(j)
                    if corr_count[j] > 0:
                        eq_src.append(int(corr_faces[fi]))
                    else:
                        eq_src.append(-1)  # identity transform row
                    fi += 1
            eq_tri = np.asarray(eq_tri, np.int64)
            eq_src = np.asarray(eq_src, np.int64)
        else:
            eq_tri = np.arange(self.n_tris, dtype=np.int64)
            eq_src = eq_tri.copy()
        self.n_eqs = len(eq_tri)
        self._eq_tri = eq_tri
        self._eq_src = eq_src

        # --- per-triangle weights from the QR local frame -------------------
        # W[j, slot, c]: slot 0 = v1 (−Uj0c−Uj1c), slot 1 = v2 (Uj0c), 2 = v3
        w = np.zeros((self.n_tris, 3, 3))
        for j in range(self.n_tris):
            v1, v2, v3 = verts[faces[j]]
            va = np.stack([v2 - v1, v3 - v1], axis=1)  # 3×2
            q, r = _gram_schmidt_qr(va)
            uj = np.linalg.inv(r) @ q.T  # 2×3
            w[j, 0] = -uj[0] - uj[1]
            w[j, 1] = uj[0]
            w[j, 2] = uj[1]
        self._w_np = w

        # --- sparse A / Ar over equations ------------------------------------
        rows, cols_a, vals_a = [], [], []
        rows_r, cols_r, vals_r = [], [], []
        for k in range(self.n_eqs):
            j = eq_tri[k]
            for c in range(3):
                rr = 3 * k + c
                for slot in range(3):
                    vi = faces[j, slot]
                    val = w[j, slot, c]
                    if vi_to_col[vi] >= 0:
                        rows.append(rr); cols_a.append(vi_to_col[vi]); vals_a.append(val)
                    else:
                        rows_r.append(rr); cols_r.append(vi_to_col_r[vi]); vals_r.append(val)
        shape_a = (3 * self.n_eqs, self.n_free)
        shape_r = (3 * self.n_eqs, max(self.n_cnsts, 1))
        a_mat = sp.csr_matrix((vals_a, (rows, cols_a)), shape=shape_a)
        ar_mat = sp.csr_matrix((vals_r, (rows_r, cols_r)), shape=shape_r)
        self._a = a_mat
        self._ar = ar_mat
        self._at = a_mat.T.tocsr()
        ata = (self._at @ a_mat).toarray()
        if reg:
            ata[np.diag_indices_from(ata)] += reg
        self._ata_np = ata
        self._lu = spla.splu(sp.csc_matrix(ata))

        # dense inverse: per-frame solve = one matmul on the MXU
        self._inv_np = np.linalg.inv(ata)

        # At·Ar (dense, small) for on-device constrained-vertex subtraction
        atar = (self._at @ ar_mat).toarray()

        # ---- direct solve operator: X = P·D − PAr·C --------------------------
        # P = (AtA)⁻¹·Aᵀ collapses RHS assembly + solve into ONE dense matmul
        # per frame batch (the MXU-native form of the reference's per-frame
        # SparseLU solve).  Computed in float64 on host, stored float32.
        # P = inv·Aᵀ = (A·inv)ᵀ (inv is symmetric); sparse×dense keeps the
        # build cheap (A has only 9 nnz per equation row).
        p_op = np.ascontiguousarray((a_mat @ self._inv_np).T)  # (n_free, 3·n_eqs)
        par = np.ascontiguousarray((ar_mat.T.tocsr() @ p_op.T).T)  # (n_free, n_cnsts)
        self._p_np = p_op

        # --- device constants -------------------------------------------------
        self.w_dev = jnp.asarray(w, dtype)
        self.inv_dev = jnp.asarray(self._inv_np, dtype)
        self.ata_dev = jnp.asarray(ata, dtype)
        self.atar_dev = jnp.asarray(atar, dtype)
        # component planes (3, n_eqs, n_free): contiguous per-component
        # operands for the solve matmuls (see DeformConsts.p)
        self.p_dev = jnp.asarray(
            np.stack([p_op[:, c::3].T for c in range(3)]), dtype)
        self.par_dev = jnp.asarray(par, dtype)
        self.eq_tri_dev = jnp.asarray(eq_tri, jnp.int32)
        self.eq_src_dev = jnp.asarray(eq_src, jnp.int32)
        # segment id per (eq, slot): free column or sentinel n_free (dropped)
        seg = vi_to_col[faces[eq_tri]]
        seg = np.where(seg < 0, self.n_free, seg)
        self.seg_ids_dev = jnp.asarray(seg.reshape(-1), jnp.int32)
        self.free_ids_dev = jnp.asarray(free_ids, jnp.int32)
        self.cnst_ids_dev = jnp.asarray(cnst, jnp.int32)
        self.template_cnst_dev = jnp.asarray(verts[cnst] if self.n_cnsts else np.zeros((0, 3)), dtype)
        self.template_dev = jnp.asarray(verts, dtype)

        self.consts = DeformConsts(
            w=self.w_dev,
            p=self.p_dev,
            par=self.par_dev,
            inv=self.inv_dev,
            ata=self.ata_dev,
            atar=self.atar_dev,
            eq_src=self.eq_src_dev,
            seg_ids=self.seg_ids_dev,
            free_ids=self.free_ids_dev,
            cnst_ids=self.cnst_ids_dev,
            template_cnst=self.template_cnst_dev,
        )
        self.spec = SolverSpec(
            n_verts=self.n_verts,
            n_tris=self.n_tris,
            n_free=self.n_free,
            n_cnsts=self.n_cnsts,
            n_eqs=self.n_eqs,
            identity_eq=bool(self.n_eqs == self.n_tris and np.all(eq_src == eq_tri)),
        )
        self._jit_cache: dict = {}

    # ------------------------------------------------------------------
    def is_same(self, n_verts: int, n_tris: int, n_cnsts: int) -> bool:
        """Cache check mirroring deformation.is_same (pybind.cpp:119-126)."""
        return (
            n_verts == self.n_verts
            and n_tris == self.n_tris
            and n_cnsts == self.n_cnsts
        )

    # ------------------------------------------------------------------
    def solve(
        self,
        dgrad: jnp.ndarray,
        cnst_verts: Optional[jnp.ndarray] = None,
        refine: int = 2,
        method: str = "direct",
    ) -> jnp.ndarray:
        """dgrad (..., F, 9) → vertices (..., V, 3). Batched; jit-cached.

        method="direct" (default): one dense MXU matmul per batch with the
        precomputed P = (AtA)⁻¹Aᵀ operator — the fast path.
        method="refine": RHS segment-sum + inverse + iterative refinement —
        kept as an independent numerical cross-check.

        To embed the solve inside a larger jitted function, call
        :func:`solve_fn` directly with ``solver.consts`` passed through your
        own function arguments (avoids re-embedding the big operator).
        """
        dgrad = jnp.asarray(dgrad, self._dtype)
        if dgrad.ndim == 1:
            dgrad = dgrad.reshape(-1, 9)
        assert dgrad.shape[-2] == self.n_tris and dgrad.shape[-1] == 9, (
            f"dgrad must be (..., {self.n_tris}, 9), got {dgrad.shape}"
        )
        key = (method, refine)
        if key not in self._jit_cache:
            spec = self.spec
            self._jit_cache[key] = jax.jit(
                functools.partial(solve_fn, spec=spec, method=method, refine=refine)
            )
        c = self.template_cnst_dev if cnst_verts is None else jnp.asarray(cnst_verts, self._dtype)
        return self._jit_cache[key](self.consts, dgrad, c)

    # ------------------------------------------------------------------
    def solve_from_matrices(
        self, dmat: jnp.ndarray, cnst_verts: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """Raw matrices (..., F, 3, 3) row-major → vertices (..., V, 3)
        (reference get_mesh_from_dm, pybind.cpp:137-152)."""
        dmat = jnp.asarray(dmat, self._dtype)
        if dmat.ndim >= 2 and dmat.shape[-1] == 9:
            dmat = dmat.reshape(dmat.shape[:-2] + (self.n_tris, 3, 3))
        if dmat.ndim == 2:  # (F·3, 3) row-major block stack, like the C ABI
            dmat = dmat.reshape(self.n_tris, 3, 3)
        key = ("dmat",)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                functools.partial(solve_mat_fn, spec=self.spec)
            )
        c = self.template_cnst_dev if cnst_verts is None else jnp.asarray(cnst_verts, self._dtype)
        return self._jit_cache[key](self.consts, dmat, c)

    def solve_host_from_matrices(
        self, dmat: np.ndarray, cnst_verts: Optional[np.ndarray] = None
    ) -> np.ndarray:
        """float64 oracle for the matrix variant: least-squares rows are Tᵀ
        (the reference's col-major read of the row-major buffer,
        deform_triangle_impl.hpp:396-398)."""
        dmat = np.asarray(dmat, np.float64).reshape(-1, 3, 3)
        assert dmat.shape[0] == self.n_tris
        tt = np.swapaxes(dmat, -1, -2)
        d = np.zeros((3 * self.n_eqs, 3))
        for k in range(self.n_eqs):
            src = self._eq_src[k]
            d[3 * k : 3 * k + 3] = np.eye(3) if src < 0 else tt[src]
        if self.n_cnsts > 0:
            c = (
                self.template_verts[self.cnst_indices]
                if cnst_verts is None
                else np.asarray(cnst_verts, np.float64).reshape(-1, 3)
            )
            d = d - self._ar @ c
        x = self._lu.solve(self._at @ d)
        out = np.zeros((self.n_verts, 3))
        out[self.free_ids] = x
        if self.n_cnsts > 0:
            out[self.cnst_indices] = c
        return out

    # ------------------------------------------------------------------
    def solve_host(self, dgrad: np.ndarray, cnst_verts: Optional[np.ndarray] = None) -> np.ndarray:
        """float64 oracle via SuperLU — the exact reference algorithm
        (deform_triangle_impl.hpp:215-310) in numpy/scipy."""
        dgrad = np.asarray(dgrad, np.float64).reshape(-1, 9)
        assert dgrad.shape[0] == self.n_tris
        tt = np.asarray(
            dgrad_ops.dgrad_to_transforms_t(jnp.asarray(dgrad, jnp.float64))
            if False
            else self._transforms_t_np(dgrad)
        )
        d = np.zeros((3 * self.n_eqs, 3))
        for k in range(self.n_eqs):
            src = self._eq_src[k]
            d[3 * k : 3 * k + 3] = np.eye(3) if src < 0 else tt[src]
        if self.n_cnsts > 0:
            c = (
                self.template_verts[self.cnst_indices]
                if cnst_verts is None
                else np.asarray(cnst_verts, np.float64).reshape(-1, 3)
            )
            d = d - self._ar @ c
        x = self._lu.solve(self._at @ d)
        out = np.zeros((self.n_verts, 3))
        out[self.free_ids] = x
        if self.n_cnsts > 0:
            out[self.cnst_indices] = c
        return out

    @staticmethod
    def _transforms_t_np(dgrad: np.ndarray) -> np.ndarray:
        """float64 numpy twin of dgrad_ops.dgrad_to_transforms_t."""
        n = len(dgrad)
        s = np.zeros((n, 3, 3))
        s[:, 0, 0] = dgrad[:, 0] + 1.0
        s[:, 0, 1] = s[:, 1, 0] = dgrad[:, 1]
        s[:, 0, 2] = s[:, 2, 0] = dgrad[:, 2]
        s[:, 1, 1] = dgrad[:, 3] + 1.0
        s[:, 1, 2] = s[:, 2, 1] = dgrad[:, 4]
        s[:, 2, 2] = dgrad[:, 5] + 1.0
        w = np.stack([-dgrad[:, 8], dgrad[:, 7], -dgrad[:, 6]], axis=-1)
        angle = np.linalg.norm(w, axis=-1)
        r = np.tile(np.eye(3), (n, 1, 1))
        nz = angle >= 1e-6
        if nz.any():
            axis = w[nz] / angle[nz, None]
            k = np.zeros((nz.sum(), 3, 3))
            k[:, 0, 1] = -axis[:, 2]; k[:, 0, 2] = axis[:, 1]
            k[:, 1, 0] = axis[:, 2]; k[:, 1, 2] = -axis[:, 0]
            k[:, 2, 0] = -axis[:, 1]; k[:, 2, 1] = axis[:, 0]
            sa = np.sin(angle[nz])[:, None, None]
            ca = (1 - np.cos(angle[nz]))[:, None, None]
            r[nz] = np.eye(3) + sa * k + ca * (k @ k)
        return np.swapaxes(r @ s, -1, -2)


def padded_chunk_map(fn, tree, n: int, chunk: int):
    """Apply ``fn`` over leading-dim sub-batches of a pytree via lax.map.

    Bounds the HBM high-water mark of memory-amplifying stages (PCA decode
    expands 265→89,784 floats/row; the solve holds ~15 per-component
    (rows, n_tris) temps — DESIGN.md §12): leaves of ``tree`` (leading dim
    ``n``) are zero-padded to ceil(n/chunk) even sub-batches, mapped, and
    the pad rows sliced off. Callers must tolerate fn seeing zero rows
    (e.g. PCA coeffs of 0 decode to the mean — discarded here). Runs
    ``fn`` directly when one chunk suffices."""
    n_chunks = max(1, -(-n // chunk))
    if n_chunks == 1:
        return fn(tree)
    csz = -(-n // n_chunks)
    pad = n_chunks * csz - n
    if pad:
        tree = jax.tree_util.tree_map(
            lambda p: jnp.concatenate(
                [p, jnp.zeros((pad,) + p.shape[1:], p.dtype)]), tree)
    chunked = jax.tree_util.tree_map(
        lambda p: p.reshape((n_chunks, csz) + p.shape[1:]), tree)
    out = jax.lax.map(fn, chunked)
    return out.reshape((-1,) + out.shape[2:])[:n]
