"""Native C++ deformation runtime vs the float64 numpy oracle."""

import numpy as np
import pytest

from sdfa_tpu import mesh
from sdfa_tpu import native
from sdfa_tpu.ops import DeformationSolver, deformation_gradients_np

FLAME_PLY = "/root/reference/speech_anime/datasets/vocaset/template/FLAME_sample.ply"


@pytest.fixture(scope="module")
def flame():
    return mesh.read_ply(FLAME_PLY, dtype=np.float64)


@pytest.fixture(scope="module")
def cnst():
    import sys

    sys.path.insert(0, "/root/reference/speech_anime/datasets/vocaset/mask")
    import non_face

    return np.asarray(non_face.non_face_verts)


def _deform(verts, seed=3, scale=0.004):
    rng = np.random.default_rng(seed)
    out = verts.copy()
    for _ in range(3):
        center = verts[rng.integers(len(verts))]
        w = np.exp(-np.sum((verts - center) ** 2, axis=1) / (2 * 0.05**2))
        out = out + scale * w[:, None] * rng.normal(size=3)
    return out


class TestNative:
    def test_dgrad_extraction_matches_oracle(self, flame):
        verts, faces = flame
        deformed = _deform(verts)
        ours = native.get_deform_grad(verts, deformed, faces)
        oracle = deformation_gradients_np(verts, deformed, faces)
        assert ours.shape == (9976, 9)
        np.testing.assert_allclose(ours, oracle, atol=5e-5)

    def test_solve_matches_oracle(self, flame, cnst):
        verts, faces = flame
        assert native.set_target(verts, faces, cnst)
        assert native.is_same(5023, 9976, len(cnst))
        assert not native.is_same(5023, 9976, 0)

        deformed = _deform(verts, seed=4)
        deformed[cnst] = verts[cnst]
        g = deformation_gradients_np(verts, deformed, faces).astype(np.float32)

        out = native.get_mesh(g, n_verts=5023)
        solver = DeformationSolver(verts, faces, cnst_indices=cnst)
        oracle = solver.solve_host(g.astype(np.float64))
        err = np.abs(out - oracle).max()
        assert err < 1e-6, f"native vs scipy oracle err {err}"
        # roundtrip accuracy vs the intended deformation
        err2 = np.abs(out - deformed).max()
        assert err2 < 1e-4, f"native roundtrip err {err2}"

    def test_batched_solve(self, flame, cnst):
        verts, faces = flame
        native.set_target(verts, faces, cnst)
        rng = np.random.default_rng(5)
        d = rng.uniform(-0.02, 0.02, (4, 9976 * 9)).astype(np.float32)
        out = native.get_meshes(d, n_verts=5023)
        assert out.shape == (4, 5023, 3)
        single = native.get_mesh(d[2], n_verts=5023)
        np.testing.assert_allclose(out[2], single, atol=1e-12)

    def test_zero_dgrad_recovers_template(self, flame, cnst):
        verts, faces = flame
        native.set_target(verts, faces, cnst)
        out = native.get_mesh(np.zeros(9976 * 9, np.float32), n_verts=5023)
        assert np.abs(out - verts).max() < 1e-6

    # -- matrix variants (reference pybind.cpp:137-152) -------------------
    def test_deform_mat_roundtrip(self, flame, cnst):
        """get_mesh_from_dm(get_deform_mat(a, b)) ≈ b — the reference's
        own pairing of the raw-matrix surface."""
        verts, faces = flame
        native.set_target(verts, faces, cnst)
        deformed = _deform(verts, seed=6)
        deformed[cnst] = verts[cnst]
        dm = native.get_deform_mat(verts, deformed, faces)
        assert dm.shape == (9976, 9)
        out = native.get_mesh_from_dm(dm, n_verts=5023)
        err = np.abs(out - deformed).max()
        assert err < 1e-4, f"dm roundtrip err {err}"

    def test_deform_mat_matches_jax_and_solver(self, flame, cnst):
        verts, faces = flame
        native.set_target(verts, faces, cnst)
        deformed = _deform(verts, seed=7)
        deformed[cnst] = verts[cnst]
        dm = native.get_deform_mat(verts, deformed, faces)
        # vs the JAX extraction
        import jax.numpy as jnp
        from sdfa_tpu.ops import dgrad as dgrad_ops
        dm_jax = np.asarray(dgrad_ops.deformation_matrices(
            jnp.asarray(verts), jnp.asarray(deformed), jnp.asarray(faces),
        )).reshape(-1, 9)
        np.testing.assert_allclose(dm, dm_jax, atol=5e-5)
        # vs the scipy f64 oracle solve
        solver = DeformationSolver(verts, faces, cnst_indices=cnst)
        oracle = solver.solve_host_from_matrices(dm.astype(np.float64))
        out = native.get_mesh_from_dm(dm, n_verts=5023)
        assert np.abs(out - oracle).max() < 1e-6

    def test_identity_matrices_recover_template(self, flame, cnst):
        verts, faces = flame
        native.set_target(verts, faces, cnst)
        ident = np.tile(np.eye(3, dtype=np.float32).reshape(-1), (9976, 1))
        out = native.get_mesh_from_dm(ident, n_verts=5023)
        assert np.abs(out - verts).max() < 1e-6


class TestSanitizeBuild:
    def test_asan_variant_compiles(self):
        """SURVEY.md §5 race-detection plan: ASan/UBSan build of the native
        runtime must stay compilable."""
        import subprocess

        res = subprocess.run(
            ["make", "-C", "/root/repo/csrc", "sanitize"],
            capture_output=True, text=True,
        )
        assert res.returncode == 0, res.stderr[-500:]
        import os

        assert os.path.exists("/root/repo/csrc/libsdfa_deformation_asan.so")
