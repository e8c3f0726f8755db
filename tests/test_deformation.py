"""Deformation transfer parity tests.

The float64 host path replicates the reference Eigen algorithm exactly
(deform_triangle_impl.hpp); the float32 device path must stay within the
1e-4 max-vertex-error budget of BASELINE.md against it.
"""

import numpy as np
import pytest

from sdfa_tpu import mesh
from sdfa_tpu.ops import DeformationSolver, deformation_gradients, rotation
from sdfa_tpu.ops import dgrad as dgrad_ops

import jax.numpy as jnp

FLAME_PLY = "/root/reference/speech_anime/datasets/vocaset/template/FLAME_sample.ply"


@pytest.fixture(scope="module")
def flame():
    verts, faces = mesh.read_ply(FLAME_PLY, dtype=np.float64)
    return verts, faces


@pytest.fixture(scope="module")
def non_face_verts():
    import sys

    sys.path.insert(0, "/root/reference/speech_anime/datasets/vocaset/mask")
    import non_face

    return np.asarray(non_face.non_face_verts)


def _smooth_deform(verts, seed=0, scale=0.004):
    """Smooth low-frequency displacement field (facial-motion magnitude)."""
    rng = np.random.default_rng(seed)
    out = verts.copy()
    for _ in range(4):
        center = verts[rng.integers(len(verts))]
        direction = rng.normal(size=3)
        sigma = 0.05
        w = np.exp(-np.sum((verts - center) ** 2, axis=1) / (2 * sigma**2))
        out = out + scale * w[:, None] * direction
    return out


class TestRotation:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(0)
        w = rng.normal(size=(64, 3)) * 0.5
        r = np.asarray(rotation.so3_exp(jnp.asarray(w, jnp.float32)))
        # orthogonality
        eye = np.einsum("nij,nkj->nik", r, r)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
        w2 = np.asarray(rotation.so3_log(jnp.asarray(r)))
        np.testing.assert_allclose(w2, w, atol=1e-4)

    def test_identity_and_small_angles(self):
        w = np.zeros((2, 3), np.float32)
        w[1] = 1e-8
        r = np.asarray(rotation.so3_exp(jnp.asarray(w)))
        np.testing.assert_allclose(r, np.tile(np.eye(3), (2, 1, 1)), atol=1e-7)

    def test_near_pi(self):
        w = np.array([[np.pi - 1e-6, 0, 0]], np.float32)
        r = rotation.so3_exp(jnp.asarray(w))
        w2 = np.asarray(rotation.so3_log(r))
        np.testing.assert_allclose(np.abs(w2), np.abs(w), atol=1e-3)

    def test_entry_conventions(self):
        # skew layout must match the C++ (utils_rotation.cpp:10-16)
        w = jnp.asarray([[0.1, 0.2, 0.3]], jnp.float32)
        k = np.asarray(rotation.skew(w))[0]
        assert k[2, 1] == pytest.approx(0.1)
        assert k[0, 2] == pytest.approx(0.2)
        assert k[1, 0] == pytest.approx(0.3)
        d = rotation.dgrad_rotvec_to_entries(w)
        w2 = rotation.dgrad_entries_to_rotvec(d)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w))


class TestDgradExtraction:
    def test_identity_deformation_gives_zero(self, flame):
        verts, faces = flame
        v32 = verts.astype(np.float32)
        g = np.asarray(deformation_gradients(v32, v32, faces))
        assert g.shape == (9976, 9)
        np.testing.assert_allclose(g, 0.0, atol=1e-4)

    def test_pure_rotation(self, flame):
        verts, faces = flame
        w = np.array([0.0, 0.3, 0.0])
        r = np.asarray(rotation.so3_exp(jnp.asarray(w[None], jnp.float32)))[0]
        rotated = (verts @ r.T).astype(np.float32)
        g = np.asarray(deformation_gradients(verts.astype(np.float32), rotated, faces))
        # scale part ≈ 0, rotation entries constant = the dgrad packing of w
        np.testing.assert_allclose(g[:, :6], 0.0, atol=5e-3)
        expected = np.asarray(rotation.dgrad_rotvec_to_entries(jnp.asarray(w[None], jnp.float32)))[0]
        np.testing.assert_allclose(
            g[:, 6:], np.tile(expected, (9976, 1)), atol=5e-3
        )
        # the float64 preprocessing path must be tight
        from sdfa_tpu.ops import deformation_gradients_np
        g64 = deformation_gradients_np(verts, verts @ np.asarray(
            rotation.so3_exp(jnp.asarray(w[None], jnp.float32)))[0].T.astype(np.float64), faces)
        np.testing.assert_allclose(g64[:, :6], 0.0, atol=1e-5)

    def test_uniform_scale(self, flame):
        verts, faces = flame
        scaled = (verts * 1.05).astype(np.float32)
        g = np.asarray(deformation_gradients(verts.astype(np.float32), scaled, faces))
        np.testing.assert_allclose(g[:, 0], 0.05, atol=5e-3)  # diag −1
        np.testing.assert_allclose(g[:, 3], 0.05, atol=5e-3)
        np.testing.assert_allclose(g[:, 5], 0.05, atol=5e-3)
        np.testing.assert_allclose(g[:, 6:], 0.0, atol=5e-3)

    def test_transform_roundtrip(self):
        """dgrad → T → extract again must be involutive for random SPD-ish T."""
        rng = np.random.default_rng(2)
        d = np.zeros((32, 9), np.float32)
        d[:, [0, 3, 5]] = rng.uniform(-0.1, 0.1, (32, 3))  # diag scale
        d[:, [1, 2, 4]] = rng.uniform(-0.05, 0.05, (32, 3))  # off-diag
        d[:, 6:] = rng.uniform(-0.4, 0.4, (32, 3))  # rotation log
        tt = dgrad_ops.dgrad_to_transforms_t(jnp.asarray(d))
        t = np.swapaxes(np.asarray(tt), -1, -2)
        # re-extract via polar decomposition (same math as extraction)
        u, s, vt = np.linalg.svd(t)
        det = np.linalg.det(u @ vt)
        tmp = np.tile(np.eye(3), (32, 1, 1))
        tmp[:, 2, 2] = det
        scale = np.swapaxes(vt, 1, 2) @ tmp @ (s[..., None] * vt)
        np.testing.assert_allclose(scale[:, 0, 0] - 1, d[:, 0], atol=1e-4)
        np.testing.assert_allclose(scale[:, 1, 2], d[:, 4], atol=1e-4)


class TestSolver:
    @pytest.fixture(scope="class")
    def solver(self, flame, non_face_verts):
        verts, faces = flame
        return DeformationSolver(verts, faces, cnst_indices=non_face_verts)

    def test_shapes(self, solver):
        assert solver.n_verts == 5023
        assert solver.n_tris == 9976
        assert solver.n_cnsts == 3762
        assert solver.n_free == 1261
        assert solver.is_same(5023, 9976, 3762)
        assert not solver.is_same(5023, 9976, 0)

    def test_zero_dgrad_recovers_template(self, solver, flame):
        verts, _ = flame
        out = np.asarray(solver.solve(np.zeros((9976, 9), np.float32)))
        err = np.abs(out - verts).max()
        assert err < 1e-4, f"max vertex err {err}"

    def test_roundtrip_extract_solve(self, solver, flame):
        """deform → extract dgrads → solve must recover the deformed mesh."""
        verts, faces = flame
        deformed = _smooth_deform(verts, seed=1)
        # keep constrained verts at template so constraints are consistent
        deformed[solver.cnst_indices] = verts[solver.cnst_indices]
        from sdfa_tpu.ops import deformation_gradients_np
        g64 = deformation_gradients_np(verts, deformed, faces)
        out = solver.solve_host(g64)
        err = np.abs(out - deformed).max()
        assert err < 1e-8, f"host roundtrip err {err}"

        out_dev = np.asarray(solver.solve(g64.astype(np.float32)))
        err_dev = np.abs(out_dev - deformed).max()
        assert err_dev < 1e-4, f"device roundtrip err {err_dev}"

    def test_device_matches_host_oracle(self, solver):
        rng = np.random.default_rng(7)
        d = np.zeros((9976, 9))
        d[:, [0, 3, 5]] = rng.uniform(-0.05, 0.05, (9976, 3))
        d[:, [1, 2, 4]] = rng.uniform(-0.02, 0.02, (9976, 3))
        d[:, 6:] = rng.uniform(-0.1, 0.1, (9976, 3))
        ref = solver.solve_host(d)
        ours = np.asarray(solver.solve(d.astype(np.float32)))
        err = np.abs(ours - ref).max()
        assert err < 1e-4, f"device vs host oracle err {err}"

    def test_batched_solve(self, solver):
        rng = np.random.default_rng(8)
        d = (rng.uniform(-0.02, 0.02, (4, 9976, 9))).astype(np.float32)
        out = np.asarray(solver.solve(d))
        assert out.shape == (4, 5023, 3)
        single = np.asarray(solver.solve(d[2]))
        np.testing.assert_allclose(out[2], single, atol=1e-5)

    def test_planes_layout_matches_tri(self, solver):
        """dgrad_layout="planes" (k-major, the TPU serving layout) is the
        same math on a permuted view — results must match the reference
        [tri·9+k] layout exactly, barrier on or off."""
        import os

        from sdfa_tpu.ops.deform_solver import solve_fn

        rng = np.random.default_rng(9)
        d = rng.uniform(-0.05, 0.05, (3, 9976 * 9)).astype(np.float32)
        T = 9976
        j = np.arange(T)
        planes = np.empty_like(d)
        for k in range(9):
            planes[:, k * T + j] = d[:, 9 * j + k]
        ref = np.asarray(solve_fn(
            solver.consts, jnp.asarray(d), solver.consts.template_cnst,
            spec=solver.spec, out_layout="flat"))
        for barrier in ("1", "0"):
            os.environ["SDFA_SOLVE_BARRIER"] = barrier
            try:
                out = np.asarray(solve_fn(
                    solver.consts, jnp.asarray(planes),
                    solver.consts.template_cnst, spec=solver.spec,
                    out_layout="flat", dgrad_layout="planes"))
            finally:
                os.environ.pop("SDFA_SOLVE_BARRIER", None)
            np.testing.assert_allclose(out, ref, atol=1e-6)

    # -- matrix variants (reference get_deform_mat/get_mesh_from_dm,
    #    deform_triangle_impl.hpp:313-440, pybind.cpp:137-152) -----------
    def test_matrix_roundtrip(self, solver, flame):
        """deform → raw matrices → solve_from_matrices recovers the mesh."""
        verts, faces = flame
        deformed = _smooth_deform(verts, seed=11)
        deformed[solver.cnst_indices] = verts[solver.cnst_indices]
        dm = np.asarray(dgrad_ops.deformation_matrices(
            jnp.asarray(verts), jnp.asarray(deformed), jnp.asarray(faces)))
        out_host = solver.solve_host_from_matrices(dm)
        err = np.abs(out_host - deformed).max()
        assert err < 1e-5, f"host dm roundtrip err {err}"
        out_dev = np.asarray(solver.solve_from_matrices(dm.astype(np.float32)))
        err_dev = np.abs(out_dev - deformed).max()
        assert err_dev < 1e-4, f"device dm roundtrip err {err_dev}"

    def test_matrix_path_equals_dgrad_path(self, solver, flame):
        """The dm solve with T = exp(skew)·S must equal the dgrad solve —
        cross-checks the transpose convention against the packed path."""
        verts, faces = flame
        deformed = _smooth_deform(verts, seed=12)
        deformed[solver.cnst_indices] = verts[solver.cnst_indices]
        from sdfa_tpu.ops import deformation_gradients_np
        g64 = deformation_gradients_np(verts, deformed, faces)
        tt = solver._transforms_t_np(g64)          # (F, 3, 3) = Tᵀ
        dm = np.swapaxes(tt, -1, -2)               # row-major T
        via_dm = solver.solve_host_from_matrices(dm)
        via_dg = solver.solve_host(g64)
        np.testing.assert_allclose(via_dm, via_dg, atol=1e-9)

    def test_matrix_batched_and_flat_inputs(self, solver):
        rng = np.random.default_rng(13)
        dm = (np.tile(np.eye(3), (3, 9976, 1, 1))
              + rng.uniform(-0.01, 0.01, (3, 9976, 3, 3))).astype(np.float32)
        out = np.asarray(solver.solve_from_matrices(dm))
        assert out.shape == (3, 5023, 3)
        flat = np.asarray(solver.solve_from_matrices(dm.reshape(3, -1, 9)))
        np.testing.assert_allclose(out, flat, atol=0)

    def test_degenerate_triangle_emits_identity_matrix(self, flame):
        verts, faces = flame
        bad = np.asarray(verts).copy()
        # collapse the first triangle of the mesh to a line
        f0 = faces[0]
        bad[f0[2]] = bad[f0[0]] + 2.0 * (bad[f0[1]] - bad[f0[0]])
        dm = np.asarray(dgrad_ops.deformation_matrices(
            jnp.asarray(bad), jnp.asarray(bad), jnp.asarray(faces)))
        np.testing.assert_allclose(dm[0], np.eye(3), atol=0)

    @staticmethod
    def _extract_f64(src, dst, faces):
        """float64 numpy extraction twin (oracle-grade)."""
        v1, v2, v3 = (src[faces[:, i]] for i in range(3))
        w1, w2, w3 = (dst[faces[:, i]] for i in range(3))

        def frame(a1, a2):
            e3 = np.cross(a1, a2)
            norm = (np.sum(e3 * e3, axis=-1)) ** 0.25
            e3 = e3 / np.maximum(norm, 1e-6)[:, None]
            return np.stack([a1, a2, e3], axis=-1)

        ma = frame(v2 - v1, v3 - v1)
        mb = frame(w2 - w1, w3 - w1)
        t = mb @ np.linalg.inv(ma)
        u, s, vt = np.linalg.svd(t)
        det = np.linalg.det(u @ vt)
        tmp = np.tile(np.eye(3), (len(t), 1, 1))
        tmp[:, 2, 2] = det
        r = u @ tmp @ vt
        scale = np.swapaxes(vt, 1, 2) @ tmp @ (s[..., None] * vt)
        # rotation log
        tr = np.trace(r, axis1=1, axis2=2)
        csin = np.clip((tr - 1) / 2, -1, 1)
        ang = np.arccos(csin)
        taxis = np.stack(
            [r[:, 2, 1] - r[:, 1, 2], r[:, 0, 2] - r[:, 2, 0], r[:, 1, 0] - r[:, 0, 1]],
            axis=-1,
        )
        sin_safe = np.where(ang < 1e-6, 1.0, np.sin(ang))
        wvec = taxis / (2 * sin_safe[:, None]) * ang[:, None]
        wvec[ang < 1e-6] = 0
        g = np.zeros((len(t), 9))
        g[:, 0] = scale[:, 0, 0] - 1
        g[:, 1] = scale[:, 0, 1]
        g[:, 2] = scale[:, 0, 2]
        g[:, 3] = scale[:, 1, 1] - 1
        g[:, 4] = scale[:, 1, 2]
        g[:, 5] = scale[:, 2, 2] - 1
        g[:, 6] = -wvec[:, 2]
        g[:, 7] = wvec[:, 1]
        g[:, 8] = -wvec[:, 0]
        return g


class TestCorrespondence:
    """Triangle-correspondence fan-out (cross-topology retargeting,
    deform_triangle_impl.hpp:246-269): equation table vs the f64 oracle."""

    @pytest.fixture(scope="class")
    def small(self):
        # small synthetic mesh: grid of triangles
        import numpy as np

        n = 6
        xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
        verts = np.stack([xs.ravel(), ys.ravel(), 0.02 * np.sin(xs.ravel() * 6)], 1)
        faces = []
        for r in range(n - 1):
            for c in range(n - 1):
                a = r * n + c
                faces.append([a, a + 1, a + n])
                faces.append([a + 1, a + n + 1, a + n])
        return verts, np.asarray(faces, np.int64)

    def test_fanout_matches_host(self, small):
        verts, faces = small
        nf = len(faces)
        rng = np.random.default_rng(0)
        # triangle i ← 2 sources for even i, none for every 5th, else 1
        corr_count, corr_faces = [], []
        for i in range(nf):
            if i % 5 == 4:
                corr_count.append(0)
                corr_faces.append(0)
            elif i % 2 == 0:
                corr_count.append(2)
                corr_faces.extend([i, (i + 3) % nf])
            else:
                corr_count.append(1)
                corr_faces.append(i)
        cnst = np.asarray([0, 1, 2, 3, 4, 5])
        solver = DeformationSolver(verts, faces, cnst_indices=cnst,
                                   corr_count=corr_count, corr_faces=corr_faces)
        assert solver.n_eqs == sum(max(1, c) for c in corr_count)
        d = rng.uniform(-0.05, 0.05, (nf, 9))
        ours = np.asarray(solver.solve(d.astype(np.float32)))
        oracle = solver.solve_host(d)
        err = np.abs(ours - oracle).max()
        assert err < 1e-4, f"corres fan-out err {err}"

    def test_identity_corres_equals_plain(self, small):
        verts, faces = small
        nf = len(faces)
        cnst = np.asarray([0, 1, 2])
        plain = DeformationSolver(verts, faces, cnst_indices=cnst)
        ident = DeformationSolver(verts, faces, cnst_indices=cnst,
                                  corr_count=[1] * nf, corr_faces=list(range(nf)))
        d = np.random.default_rng(1).uniform(-0.03, 0.03, (nf, 9)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(plain.solve(d)),
                                   np.asarray(ident.solve(d)), atol=1e-5)
