#!/usr/bin/env python
"""Reproduce the DESIGN.md §12.5 delta-reference solve error table.

Simulates Mosaic's bf16 operand truncation on CPU (numpy rounding via
ml_dtypes) for every solve-matmul precision variant, against the f64
host SuperLU oracle on the real FLAME template operator, in the
near-identity transform regime real faces occupy.

    python artifacts/delta_solve_sim/simulate.py  →  RESULTS.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import ml_dtypes
import numpy as np

from sdfa_tpu.ops.deform_solver import (assemble_from_free,
                                        transform_entries_from_planes)
from sdfa_tpu.viewer import frame as frame_mod

import jax.numpy as jnp


def bf(x):
    return x.astype(ml_dtypes.bfloat16).astype(np.float32)


def main():
    solver = frame_mod.set_template_mesh()
    consts, spec = solver.consts, solver.spec
    rng = np.random.default_rng(5)
    T = spec.n_tris
    Ks, Kr = 12, 7
    scale_sub = {
        "compT": rng.normal(0, 0.01, (6 * T, Ks)).astype(np.float32),
        # S − I deltas (the construction adds +1 on the diagonal)
        "means": rng.normal(0, 0.002, 6 * T).astype(np.float32),
    }
    rotat_sub = {
        "compT": rng.normal(0, 0.01, (3 * T, Kr)).astype(np.float32),
        "means": rng.normal(0, 0.01, (3 * T,)).astype(np.float32),
    }
    rows = 8
    coef_s = rng.normal(0, 1.0, (rows, Ks)).astype(np.float32)
    coef_r = rng.normal(0, 1.0, (rows, Kr)).astype(np.float32)
    scale = coef_s @ scale_sub["compT"].T + scale_sub["means"]
    rotat = coef_r @ rotat_sub["compT"].T + rotat_sub["means"]
    dg = np.zeros((rows, T, 9), np.float64)
    dg[:, :, :6] = scale.reshape(rows, T, 6)
    dg[:, :, 6:] = rotat.reshape(rows, T, 3)
    oracle = np.stack([solver.solve_host(dg[i]) for i in range(rows)])

    def planes_of(scale, rotat, n):
        pl = np.empty((n, 9 * T), np.float32)
        j = np.arange(T)
        for k in range(6):
            pl[:, k * T + j] = scale[:, 6 * j + k]
        for k in range(3):
            pl[:, (6 + k) * T + j] = rotat[:, 3 * j + k]
        return pl

    def t_planes(pl):
        d = [jnp.asarray(pl[:, k * T:(k + 1) * T]) for k in range(9)]
        t = transform_entries_from_planes(d)
        return [[np.asarray(t[i][j]) for j in range(3)] for i in range(3)]

    t_all = t_planes(planes_of(scale, rotat, rows))
    t_0 = t_planes(planes_of(scale_sub["means"][None],
                             rotat_sub["means"][None], 1))
    p = np.asarray(consts.p)  # (3, n_eqs, n_free), identity equations

    def dot3(a, b):  # 3-pass hi/lo split (what _dot_f32 does on the MXU)
        a_hi, b_hi = bf(a), bf(b)
        a_lo, b_lo = bf(a - a_hi), bf(b - b_hi)
        return a_hi @ b_hi + a_hi @ b_lo + a_lo @ b_hi

    def x0_exact(dd, c):
        return (t_0[dd][c].astype(np.float64)
                @ p[c].astype(np.float64)).astype(np.float32)

    variants = {
        "3pass_f32": lambda dd, c: dot3(t_all[dd][c], p[c]),
        "1pass_bf16_full_T": lambda dd, c: bf(t_all[dd][c]) @ bf(p[c]),
        "2pass_T_split": lambda dd, c: (
            bf(t_all[dd][c]) @ bf(p[c])
            + bf(t_all[dd][c] - bf(t_all[dd][c])) @ bf(p[c])),
        "2pass_P_split": lambda dd, c: (
            bf(t_all[dd][c]) @ bf(p[c])
            + bf(t_all[dd][c]) @ bf(p[c] - bf(p[c]))),
        "delta_1pass": lambda dd, c: (
            bf(t_all[dd][c] - t_0[dd][c]) @ bf(p[c]) + x0_exact(dd, c)),
        "delta_psplit": lambda dd, c: (
            bf(t_all[dd][c] - t_0[dd][c]) @ bf(p[c])
            + bf(t_all[dd][c] - t_0[dd][c]) @ bf(p[c] - bf(p[c]))
            + x0_exact(dd, c)),
    }

    results = {}
    for name, term in variants.items():
        x = np.stack([sum(term(dd, c) for c in range(3)) for dd in range(3)],
                     axis=1)  # (rows, 3, n_free)
        out = np.asarray(assemble_from_free(
            consts, spec, jnp.asarray(x), consts.template_cnst, "3v"))
        err = float(np.abs(np.swapaxes(out, 1, 2) - oracle).max())
        results[name] = err
        print(f"{name}: {err:.3e}")

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "RESULTS.json")
    with open(out_path, "w") as fp:
        json.dump({"max_vertex_err_vs_f64_oracle_m": results,
                   "rows": rows, "n_tris": T,
                   "regime": "near-identity transforms (real-face regime)",
                   "budget_m": 1e-4}, fp, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
