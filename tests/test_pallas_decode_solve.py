"""Fused PCA-decode+solve Pallas kernel (ops/pallas_decode_solve.py):
interpret-mode parity on CPU against the XLA planes path, on the real
FLAME template operator."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdfa_tpu.ops import deform_solver
from sdfa_tpu.ops.pallas_decode_solve import (decode_solve_free,
                                              decode_solve_fused,
                                              prep_consts)
from sdfa_tpu.viewer import frame as frame_mod


@pytest.fixture(scope="module")
def setup():
    solver = frame_mod.set_template_mesh()
    consts, spec = solver.consts, solver.spec
    rng = np.random.default_rng(5)
    T = spec.n_tris
    Ks, Kr = 12, 7
    scale_sub = {
        "compT": rng.normal(0, 0.01, (6 * T, Ks)).astype(np.float32),
        "means": rng.normal(0, 0.005, (6 * T,)).astype(np.float32),
    }
    rotat_sub = {
        "compT": rng.normal(0, 0.01, (3 * T, Kr)).astype(np.float32),
        "means": rng.normal(0, 0.005, (3 * T,)).astype(np.float32),
    }
    dsc = prep_consts(scale_sub, rotat_sub, consts, spec)
    return solver, consts, spec, scale_sub, rotat_sub, dsc, rng


def _xla_reference(consts, spec, scale_sub, rotat_sub, coef_s, coef_r,
                   out_layout="flat"):
    """The committed XLA planes path: basis matmul (tri-major) → k-major
    permutation → solve_fn(dgrad_layout='planes')."""
    scale = coef_s @ scale_sub["compT"].T + scale_sub["means"]
    rotat = coef_r @ rotat_sub["compT"].T + rotat_sub["means"]
    T = spec.n_tris
    planes = np.empty((coef_s.shape[0], 9 * T), np.float32)
    j = np.arange(T)
    for k in range(6):
        planes[:, k * T + j] = scale[:, 6 * j + k]
    for k in range(3):
        planes[:, (6 + k) * T + j] = rotat[:, 3 * j + k]
    return np.asarray(deform_solver.solve_fn(
        consts, jnp.asarray(planes), consts.template_cnst, spec=spec,
        out_layout=out_layout, dgrad_layout="planes"))


def test_free_solution_matches_xla(setup):
    solver, consts, spec, scale_sub, rotat_sub, dsc, rng = setup
    rows = 20
    coef_s = rng.normal(0, 1.0, (rows, 12)).astype(np.float32)
    coef_r = rng.normal(0, 1.0, (rows, 7)).astype(np.float32)
    out = np.asarray(decode_solve_fused(
        jnp.asarray(coef_s), jnp.asarray(coef_r), dsc, consts, spec,
        consts.template_cnst, out_layout="flat", interpret=True))
    ref = _xla_reference(consts, spec, scale_sub, rotat_sub, coef_s, coef_r)
    err = float(np.abs(out - ref).max())
    # 3-pass-f32 matmuls both sides; fp reassociation across eq tiles only
    assert err < 1e-5, err


def test_row_padding_and_shapes(setup):
    solver, consts, spec, scale_sub, rotat_sub, dsc, rng = setup
    rows = 9  # not a block multiple
    coef_s = rng.normal(0, 1.0, (rows, 12)).astype(np.float32)
    coef_r = rng.normal(0, 1.0, (rows, 7)).astype(np.float32)
    x = decode_solve_free(jnp.asarray(coef_s), jnp.asarray(coef_r), dsc,
                          interpret=True)
    assert x.shape == (rows, 3, spec.n_free)
    ref = _xla_reference(consts, spec, scale_sub, rotat_sub, coef_s, coef_r,
                         out_layout="3v")
    full = np.asarray(deform_solver.assemble_from_free(
        consts, spec, x, consts.template_cnst, "3v"))
    assert float(np.abs(full - ref).max()) < 1e-5


def test_generate_vertices_kernel_path_matches(setup):
    """AnimationTask.generate_vertices through the fused kernel (interpret
    flag) == the XLA path, same variables."""
    from _assets import ensure_pca_assets

    from sdfa_tpu.models import build_model
    from sdfa_tpu.nn import recurrent
    from sdfa_tpu.task import AnimationTask
    from sdfa_tpu.tools import configure

    hp = configure("dgrad", dataset_root=ensure_pca_assets())
    model = build_model(hp, load_pca=True)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((2, 64, 128, 3), jnp.float32),
                           jnp.zeros((2,), jnp.int32), False)
    sr = int(hp.audio.sample_rate)
    t = np.arange(int(0.9 * sr)) / sr
    sig = (0.3 * np.sin(2 * np.pi * 155 * t)
           * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)

    task = AnimationTask(hp, model, variables, device_frontend=True,
                         overlap_frontend=True)
    ts_ref, verts_ref = task.generate_vertices(sig, speaker=0)
    assert task._verts_base[1][1] is None  # XLA path on CPU by default

    recurrent._FREQ_FUSED_INTERPRET = True
    try:
        task2 = AnimationTask(hp, model, variables, device_frontend=True,
                              overlap_frontend=True)
        ts2, verts2 = task2.generate_vertices(sig, speaker=0)
        assert task2._verts_base[1][1] is not None  # fused kernel engaged
    finally:
        recurrent._FREQ_FUSED_INTERPRET = False
    assert list(ts2) == list(ts_ref)
    err = float(np.abs(np.asarray(verts2) - np.asarray(verts_ref)).max())
    # forward runs the fused LSTM kernels too under the flag; everything
    # is 3-pass-f32 on both sides
    assert err < 1e-4, err


def test_zero_coeffs_give_mean_shape(setup):
    """coef=0 → dgrad = means; kernel must agree with solve of the means."""
    solver, consts, spec, scale_sub, rotat_sub, dsc, rng = setup
    coef_s = np.zeros((8, 12), np.float32)
    coef_r = np.zeros((8, 7), np.float32)
    out = np.asarray(decode_solve_fused(
        jnp.asarray(coef_s), jnp.asarray(coef_r), dsc, consts, spec,
        consts.template_cnst, out_layout="flat", interpret=True))
    ref = _xla_reference(consts, spec, scale_sub, rotat_sub, coef_s, coef_r)
    assert float(np.abs(out - ref).max()) < 1e-5
    assert np.allclose(out[0], out[5])


def test_delta_mode_bf16_truncation_bound(setup):
    """The delta-reference mode's whole point: Mosaic truncates 1-pass
    dot operands to bf16 (``_dot_f32`` applies the same casts explicitly,
    so interpret mode shows the hardware's truncation) — assert the
    ΔT@P products stay ~40× inside the 1e-4 budget vs the f64 host
    oracle, while the SAME truncation on the full-T products (delta off,
    precise off) does not.
    """
    from sdfa_tpu.ops import pallas_decode_solve as pds

    solver, consts, spec, scale_sub, rotat_sub, dsc, rng = setup
    rows = 6
    coef_s = rng.normal(0, 1.0, (rows, 12)).astype(np.float32)
    coef_r = rng.normal(0, 1.0, (rows, 7)).astype(np.float32)
    scale = coef_s @ scale_sub["compT"].T + scale_sub["means"]
    rotat = coef_r @ rotat_sub["compT"].T + rotat_sub["means"]
    T = spec.n_tris
    dg = np.zeros((rows, T, 9), np.float64)
    dg[:, :, :6] = scale.reshape(rows, T, 6)
    dg[:, :, 6:] = rotat.reshape(rows, T, 3)
    oracle = np.stack([solver.solve_host(dg[i]) for i in range(rows)])

    def run(delta, precise):
        out = np.asarray(pds.decode_solve_fused(
            jnp.asarray(coef_s), jnp.asarray(coef_r), dsc, consts, spec,
            consts.template_cnst, out_layout="3v", interpret=True,
            precise=precise, delta=delta))
        return float(np.abs(np.swapaxes(out, 1, 2) - oracle).max())

    err_delta = run(delta=True, precise=True)
    err_1pass = run(delta=False, precise=False)
    assert err_delta < 1e-5, err_delta         # measured ~2.8e-6
    assert err_1pass > 3 * err_delta, (err_1pass, err_delta)


def test_p_bf16_staging_delta_identical_and_guarded(setup, monkeypatch):
    """bf16 P staging (round 4): in delta mode the solve products are
    always 1-pass — both operands round to bf16 in ``_dot_f32`` — so a
    pre-rounded bf16 P is VALUE-IDENTICAL while halving the dominant
    HBM stream. Non-delta multi-pass needs f32 and must refuse."""
    solver, consts, spec, scale_sub, rotat_sub, dsc, rng = setup
    dsc16 = prep_consts(scale_sub, rotat_sub, consts, spec,
                        p_host=solver._p_np, p_dtype=jnp.bfloat16)
    dsc32 = prep_consts(scale_sub, rotat_sub, consts, spec,
                        p_host=solver._p_np, p_dtype=jnp.float32)
    assert dsc16.p.dtype == jnp.bfloat16 and dsc32.p.dtype == jnp.float32
    # x0 is the exact reference point: independent of the staging dtype
    np.testing.assert_array_equal(np.asarray(dsc16.x0), np.asarray(dsc32.x0))

    rows = 5
    coef_s = jnp.asarray(rng.normal(0, 1.0, (rows, 12)).astype(np.float32))
    coef_r = jnp.asarray(rng.normal(0, 1.0, (rows, 7)).astype(np.float32))
    out16 = np.asarray(decode_solve_free(coef_s, coef_r, dsc16,
                                         interpret=True, delta=True))
    out32 = np.asarray(decode_solve_free(coef_s, coef_r, dsc32,
                                         interpret=True, delta=True))
    np.testing.assert_array_equal(out16, out32)
    # non-delta 1-pass also rounds both operands — bf16 P allowed there
    np.testing.assert_array_equal(
        np.asarray(decode_solve_free(coef_s, coef_r, dsc16, interpret=True,
                                     delta=False, precise=False)),
        np.asarray(decode_solve_free(coef_s, coef_r, dsc32, interpret=True,
                                     delta=False, precise=False)))
    # non-delta multi-pass reads the f32 residual — must refuse bf16 P
    with pytest.raises(ValueError, match="bf16"):
        decode_solve_free(coef_s, coef_r, dsc16, interpret=True,
                          delta=False, precise=True)

    # env default: bf16 iff the delta mode is the default
    monkeypatch.delenv("SDFA_SOLVE_P_BF16", raising=False)
    monkeypatch.setenv("SDFA_SOLVE_DELTA", "0")
    assert prep_consts(scale_sub, rotat_sub, consts, spec,
                       p_host=solver._p_np).p.dtype == jnp.float32
    monkeypatch.setenv("SDFA_SOLVE_DELTA", "1")
    assert prep_consts(scale_sub, rotat_sub, consts, spec,
                       p_host=solver._p_np).p.dtype == jnp.bfloat16


def test_prep_consts_p_host_bit_identical(setup):
    """The host-P fast path (skips the ~460 MB device-P download over
    the tunnel) must produce the SAME DecodeSolveConsts as the download
    path — x0 bitwise (the f64 neutral solve goes through the identical
    f32 rounding), everything else tree-equal."""
    solver, consts, spec, scale_sub, rotat_sub, dsc, rng = setup
    dsc_host = prep_consts(scale_sub, rotat_sub, consts, spec,
                           p_host=solver._p_np)
    for name in dsc._fields:
        a, b = np.asarray(getattr(dsc, name)), np.asarray(
            getattr(dsc_host, name))
        assert a.shape == b.shape, name
        np.testing.assert_array_equal(a, b, err_msg=name)
