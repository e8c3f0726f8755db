"""Pallas TPU kernel: fused PCA-decode → transform build → deformation
solve.

Round-3 op-level profile of the serving pipeline (DESIGN.md §12.4): the
XLA decode+solve chunk runs ~180 ms/call at W=8832 — ~59 ms building the
exp(skew)·S transform planes (9 × 352 MB written + re-read), ~65 ms for
the nine (W, n_eqs)@(n_eqs, n_free) solve matmuls at 24% MXU, ~19 ms for
the scale|rotat concat — all of it traffic/fusion overhead on a stage
whose fundamental inputs are TINY: per window just 265 PCA coefficients.

This kernel consumes the coefficients directly and keeps everything else
in VMEM per (row-block × eq-tile) step:

1. decode: d_k = coef @ basis[k-plane tile] + means  (9 planes, k-major
   bases — the same permuted-basis trick as decode_to_anime(planes=True))
2. transform build: t[i][j] tiles via the SHARED
   ``deform_solver.transform_entries_from_planes`` (identical math to the
   XLA path by construction),
3. solve: acc[dd] += Σ_c t[dd][c] @ P[c]-tile, accumulated across eq
   tiles in VMEM; the (row, 3, n_free) result is written once.

HBM traffic per call at W=8832 (blk=512 → 18 row blocks): the P operator
(~160 MB) and bases (~42 MB) re-stream once per ROW BLOCK (their block
index rides the inner eq-tile loop), so ≈ 18 × 0.2 GB + output ≈ 3.8 GB
— vs ~25 GB for the XLA chain (dgrad planes + transform planes, each
written and re-read), and fully overlappable with the MXU work (the
kernel is compute-bound; see DESIGN.md §12.4). Halving block_rows
doubles the P traffic — the re-stream term scales 1/blk. All matmuls
accumulate f32 via the 3-pass bf16 hi/lo split (``_dot_f32``), matching
lax.Precision.HIGH.

Equation fan-out (n_eqs > n_tris) is NOT supported here — callers must
check ``spec.identity_eq`` and fall back to ``solve_fn`` (the shipped
FLAME template is identity; fan-out retargeting stays on the XLA path).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .deform_solver import (DeformConsts, SolverSpec, assemble_from_free,
                            transform_entries_from_planes)
from .pallas_freq_lstm import _dot_f32, row_block, rows_partitioned


class DecodeSolveConsts(NamedTuple):
    """Kernel-ready constants: k-major bases (eq-padded) + pre-split P.

    Shapes (T' = n_tris padded to the eq-tile multiple; NF = n_free):
    basis_s (Ks, 6, T'), means_s (6, T'), basis_r (Kr, 3, T'),
    means_r (3, T'), p (3, T', NF). The padded tail has zero basis AND
    zero means (decoded d=0 → identity transform) and zero P rows, so it
    contributes exactly nothing regardless of the transform values.

    t0 (9, T') / x0 (3, NF) support the delta-reference solve mode: t0 is
    the transform-entry planes of the PCA MEANS (the neutral pose) and x0
    its exact (f64) solve. The kernel then computes
    ``x = x0 + (T − T0) @ P`` with the delta product in 1-pass bf16 —
    the deformation signal rides on the precomputed x0, so truncating the
    small ΔT loses almost nothing (measured 2.4e-6 max vertex error vs
    the f64 oracle, ~40× inside the 1e-4 budget, at 1/3 the MXU passes
    of the 3-pass split; DESIGN.md §12.5).
    """

    basis_s: jnp.ndarray
    means_s: jnp.ndarray
    basis_r: jnp.ndarray
    means_r: jnp.ndarray
    p: jnp.ndarray
    t0: jnp.ndarray
    x0: jnp.ndarray


def _env_int(name: str, fallback: Optional[int]) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else fallback


def _prep_device(scale_comp, scale_means, rotat_comp, rotat_means, p,
                 T: int, Tp: int, p_dtype_name: str = "float32"):
    """All of prep_consts' device-side reshuffles in ONE traced program.

    Eager jnp ops here each cost a remote-compile round trip over the
    axon tunnel (~25 s apiece; none persist — the compilation cache only
    keeps programs that took ≥1 s to compile), so the original eager
    chain paid ~4 min of tunnel compiles per bench process. One jit =
    one compile, and it is big enough to persist.
    """

    def km(comp, means, per_tri):
        K = comp.shape[1]
        # tri-major (T, per_tri, K) → k-major (K, per_tri, T), then pad T
        b = jnp.transpose(comp.reshape(T, per_tri, K), (2, 1, 0))
        m = jnp.transpose(means.reshape(T, per_tri), (1, 0))
        b = jnp.pad(b, ((0, 0), (0, 0), (0, Tp - T)))
        m = jnp.pad(m, ((0, 0), (0, Tp - T)))
        return b, m

    basis_s, means_s = km(scale_comp, scale_means, 6)
    basis_r, means_r = km(rotat_comp, rotat_means, 3)
    p_pad = jnp.pad(p, ((0, 0), (0, Tp - T), (0, 0)))  # (3, T', NF)
    # bf16 P staging: the delta kernel's solve products are ALWAYS
    # 1-pass (_dot_f32 rounds both operands to bf16), so rounding P at
    # the STORE is value-identical there and halves both the dsc
    # footprint (~200 → ~130 MB) and the kernel's dominant HBM read —
    # the (3, eq_tile, NF) P tile is re-streamed for every row block.
    p_pad = p_pad.astype(jnp.dtype(p_dtype_name))

    # delta-reference constants: transform entries of the means (f32 — the
    # SAME value the kernel subtracts, so T = ΔT + T0 decomposes exactly).
    # Padded tail: means 0 → T0 = I there, and the in-kernel T is I too →
    # ΔT tail ≡ 0.
    d0 = [means_s[k] for k in range(6)] + [means_r[k] for k in range(3)]
    t0_ll = transform_entries_from_planes(d0)
    t0 = jnp.stack([t0_ll[i][j] for i in range(3) for j in range(3)])
    return basis_s, means_s, basis_r, means_r, p_pad, t0


_prep_device_jit = jax.jit(_prep_device, static_argnums=(5, 6, 7))


def prep_consts(scale_sub, rotat_sub, consts: DeformConsts,
                spec: SolverSpec,
                eq_tile: Optional[int] = None,
                p_host: Optional[np.ndarray] = None,
                p_dtype=None) -> DecodeSolveConsts:
    """Build DecodeSolveConsts from the model's PCA subtrees
    ({"compT": (6T|3T, K), "means": (…)}) and the solver consts. Do this
    ONCE per task/bench process and pass the result to
    ``decode_solve_fused`` — it holds ~200 MB of device arrays.

    ``eq_tile=None`` resolves SDFA_SOLVE_EQT (default 512) — the SAME
    knob decode_solve_free reads, so a tile sweep pads and slices
    consistently without code edits.

    ``p_host``: the solver's host-side float64 P operator
    (``DeformationSolver._p_np``, (n_free, 3·n_eqs) interleaved). When
    given, the x0 neutral solve uses it directly instead of downloading
    the ~460 MB device P over the tunnel; it is cast through float32
    first so x0 is bit-identical to the download path.

    ``p_dtype``: storage dtype of the staged P operator. ``None``
    resolves SDFA_SOLVE_P_BF16 (default: bf16 iff the delta solve mode
    is the default, i.e. SDFA_SOLVE_DELTA != 0). bf16 is VALUE-IDENTICAL
    in delta mode (the kernel's ΔT@P products are always 1-pass — both
    operands round to bf16 regardless) and halves the P HBM stream that
    dominates the solve stage; non-delta 3-pass callers need
    ``p_dtype=jnp.float32`` (the impl refuses a bf16 P there).
    """
    assert spec.identity_eq, "fused decode+solve needs identity equations"
    if eq_tile is None:
        eq_tile = _env_int("SDFA_SOLVE_EQT", 512)
    if p_dtype is None:
        delta_default = os.environ.get("SDFA_SOLVE_DELTA", "1") == "1"
        want_bf16 = os.environ.get("SDFA_SOLVE_P_BF16",
                                   "1" if delta_default else "0") == "1"
        p_dtype = jnp.bfloat16 if want_bf16 else jnp.float32
    T = spec.n_tris
    Tp = -(-T // eq_tile) * eq_tile

    basis_s, means_s, basis_r, means_r, p, t0 = _prep_device_jit(
        jnp.asarray(scale_sub["compT"]),
        jnp.asarray(scale_sub["means"]).reshape(-1),
        jnp.asarray(rotat_sub["compT"]),
        jnp.asarray(rotat_sub["means"]).reshape(-1),
        consts.p, T, Tp, jnp.dtype(p_dtype).name)

    # exact f64 solve of the neutral pose: x0 = Σ_c T0[3d+c] @ P[c]
    t064 = np.asarray(t0, np.float64)  # (9, T'); tail rows multiply 0 rows
    if p_host is not None:
        # planes view of the host operator, rounded through f32 so the
        # result matches np.asarray(device_p) exactly
        p64 = np.stack([
            np.ascontiguousarray(p_host[:, c::3].T) for c in range(3)
        ]).astype(np.float32).astype(np.float64)  # (3, T, NF) — unpadded
        x0 = np.stack([
            sum(t064[3 * dd + c][:T] @ p64[c] for c in range(3))
            for dd in range(3)
        ]).astype(np.float32)  # (3, NF)
    else:
        # download the solver's f32 operator, NOT the staged (possibly
        # bf16) p — x0 is the exact reference point and must not inherit
        # the staging truncation
        p64 = np.asarray(consts.p, np.float64)  # (3, T, NF) download
        x0 = np.stack([
            sum(t064[3 * dd + c][:T] @ p64[c] for c in range(3))
            for dd in range(3)
        ]).astype(np.float32)  # (3, NF)
    return DecodeSolveConsts(basis_s, means_s, basis_r, means_r, p,
                             t0, jnp.asarray(x0))


def _kernel(coef_s, coef_r, basis_s, means_s, basis_r, means_r, p,
            o0, o1, o2, *, precise: bool):
    # the output blocks are j-invariant (index map (i, 0)), so they stay
    # VMEM-resident across the inner eq-tile loop — accumulate into them
    # directly (the standard pallas matmul pattern), no scratch needed
    j = pl.program_id(1)
    outs = (o0, o1, o2)

    @pl.when(j == 0)
    def _():
        for o in outs:
            o[:] = jnp.zeros_like(o)

    d = [
        _dot_f32(coef_s[:], basis_s[:, k, :], precise) + means_s[k:k + 1, :]
        for k in range(6)
    ] + [
        _dot_f32(coef_r[:], basis_r[:, k, :], precise) + means_r[k:k + 1, :]
        for k in range(3)
    ]
    t = transform_entries_from_planes(d)
    for dd in range(3):
        outs[dd][:] = outs[dd][:] + (
            _dot_f32(t[dd][0], p[0], precise)
            + _dot_f32(t[dd][1], p[1], precise)
            + _dot_f32(t[dd][2], p[2], precise))


def _kernel_delta(coef_s, coef_r, basis_s, means_s, basis_r, means_r, p,
                  t0, x0, o0, o1, o2, *, precise: bool):
    """Delta-reference variant: x = x0 + ΔT @ P with ΔT = T − T0 and the
    delta products in 1-pass bf16 (f32 accumulate). The deformation
    signal lives in x0 (exact) + a small ΔT, so the bf16 truncation error
    scales with ‖ΔT‖ ~ 0.05, not ‖T‖ ~ 1 — measured 2.4e-6 max vertex
    error vs f64, at 1/3 the solve-matmul passes. The decode matmuls
    (tiny K) keep the 3-pass split."""
    j = pl.program_id(1)
    outs = (o0, o1, o2)

    @pl.when(j == 0)
    def _():
        for dd, o in enumerate(outs):
            o[:] = jnp.broadcast_to(x0[dd:dd + 1, :], o.shape)

    d = [
        _dot_f32(coef_s[:], basis_s[:, k, :], precise) + means_s[k:k + 1, :]
        for k in range(6)
    ] + [
        _dot_f32(coef_r[:], basis_r[:, k, :], precise) + means_r[k:k + 1, :]
        for k in range(3)
    ]
    t = transform_entries_from_planes(d)
    for dd in range(3):
        outs[dd][:] = outs[dd][:] + (
            _dot_f32(t[dd][0] - t0[3 * dd + 0:3 * dd + 1, :], p[0], False)
            + _dot_f32(t[dd][1] - t0[3 * dd + 1:3 * dd + 2, :], p[1], False)
            + _dot_f32(t[dd][2] - t0[3 * dd + 2:3 * dd + 3, :], p[2], False))


@functools.lru_cache(maxsize=None)
def _ds_cp(eq_tile: int, block_rows: int, interpret: bool, precise: bool,
           delta: bool):
    def impl(coef_s, coef_r, basis_s, means_s, basis_r, means_r, p, t0, x0):
        return _decode_solve_impl(
            coef_s, coef_r,
            DecodeSolveConsts(basis_s, means_s, basis_r, means_r, p, t0, x0),
            eq_tile=eq_tile, block_rows=block_rows, interpret=interpret,
            precise=precise, delta=delta)

    # rows-batch parallel under GSPMD/Shardy, like the LSTM kernels:
    # the coefficient rows shard, every constant replicates
    return rows_partitioned(
        impl,
        "i a, i b, c u e, u e, f g e, g e, g e l, q e, g l -> i g l",
        ("a", "b", "c", "u", "e", "f", "g", "l", "q"))


def decode_solve_free(
    coef_s: jnp.ndarray,
    coef_r: jnp.ndarray,
    dsc: DecodeSolveConsts,
    eq_tile: Optional[int] = None,
    block_rows: Optional[int] = None,
    interpret: bool = False,
    precise: Optional[bool] = None,
    delta: Optional[bool] = None,
) -> jnp.ndarray:
    """(rows, Ks), (rows, Kr) coefficients → free-vertex solution
    (rows, 3, n_free). Wrap with ``assemble_from_free`` for full meshes.

    ``delta=None`` resolves from SDFA_SOLVE_DELTA (default 1): the
    delta-reference mode — x = x0 + (T−T0)@P with the delta products in
    1-pass bf16, 1/3 the solve-matmul passes at 2.4e-6 measured error
    (see DecodeSolveConsts). SDFA_SOLVE_DELTA=0 restores the 3-pass
    full-T products. ``precise=None`` resolves from
    SDFA_PALLAS_SOLVE_PRECISE (default 1 = 3-pass f32 for the non-delta
    products and the decode matmuls; 0 = 1-pass bf16 everywhere — an
    experiment knob, only shippable if the bench realism line's
    f64-oracle error stays < 1e-4)."""
    if precise is None:
        precise = os.environ.get("SDFA_PALLAS_SOLVE_PRECISE", "1") == "1"
    if delta is None:
        delta = os.environ.get("SDFA_SOLVE_DELTA", "1") == "1"
    # tile-sweep knobs (delta mode shifts the compute/bandwidth balance —
    # with 1/3 the MXU passes the P re-stream hides less, so bigger row
    # blocks may win; hardware sweeps set these without code edits).
    # None = env with 512 fallback; explicit keyword args always win.
    if block_rows is None:
        # 1024 beat 512 by 7.4% at the 128-clip serving shape (92.5 vs
        # 99.9 ms/call, interleaved in-process A/B — tools/solve_tile_ab.py,
        # artifacts/batch_scaling_r4/solve_blk_ab.json): bigger row blocks
        # halve the per-block P re-streams. Row tiling never changes
        # per-row math, so values are identical across block sizes.
        block_rows = _env_int("SDFA_SOLVE_BLK", 1024)
    if eq_tile is None:
        eq_tile = _env_int("SDFA_SOLVE_EQT", 512)
    from .pallas_freq_lstm import _passes

    # cache on the normalized pass count: hash(True) == hash(1)
    return _ds_cp(eq_tile, block_rows, interpret, _passes(precise), delta)(
        coef_s, coef_r, dsc.basis_s, dsc.means_s, dsc.basis_r, dsc.means_r,
        dsc.p, dsc.t0, dsc.x0)


def _decode_solve_impl(
    coef_s: jnp.ndarray,
    coef_r: jnp.ndarray,
    dsc: DecodeSolveConsts,
    eq_tile: int = 512,
    block_rows: int = 512,
    interpret: bool = False,
    precise: bool = True,
    delta: bool = False,
) -> jnp.ndarray:
    rows = coef_s.shape[0]
    Ks, six, Tp = dsc.basis_s.shape
    Kr = dsc.basis_r.shape[0]
    nf = dsc.p.shape[2]
    assert six == 6 and Tp % eq_tile == 0, (dsc.basis_s.shape, eq_tile)
    from .pallas_freq_lstm import _passes

    if dsc.p.dtype == jnp.bfloat16 and not delta and _passes(precise) > 1:
        raise ValueError(
            "dsc.p is bf16 but the non-delta multi-pass kernel needs the "
            "f32 operator (the hi/lo split reads the residual) — build "
            "the consts with prep_consts(..., p_dtype=jnp.float32)")
    n_eq_tiles = Tp // eq_tile

    blk = row_block(rows, block_rows, align=8)
    pad = (-rows) % blk
    if pad:
        coef_s = jnp.pad(coef_s, ((0, pad), (0, 0)))
        coef_r = jnp.pad(coef_r, ((0, pad), (0, 0)))
    nb = coef_s.shape[0] // blk

    in_specs = [
        pl.BlockSpec((blk, Ks), lambda i, j: (i, 0)),        # coef_s
        pl.BlockSpec((blk, Kr), lambda i, j: (i, 0)),        # coef_r
        pl.BlockSpec((Ks, 6, eq_tile), lambda i, j: (0, 0, j)),
        pl.BlockSpec((6, eq_tile), lambda i, j: (0, j)),
        pl.BlockSpec((Kr, 3, eq_tile), lambda i, j: (0, 0, j)),
        pl.BlockSpec((3, eq_tile), lambda i, j: (0, j)),
        pl.BlockSpec((3, eq_tile, nf), lambda i, j: (0, j, 0)),
    ]
    args = [coef_s, coef_r, dsc.basis_s, dsc.means_s, dsc.basis_r,
            dsc.means_r, dsc.p]
    if delta:
        in_specs += [
            pl.BlockSpec((9, eq_tile), lambda i, j: (0, j)),   # t0
            pl.BlockSpec((3, nf), lambda i, j: (0, 0)),        # x0
        ]
        args += [dsc.t0, dsc.x0]
        kernel = functools.partial(_kernel_delta, precise=precise)
    else:
        kernel = functools.partial(_kernel, precise=precise)
    outs = pl.pallas_call(
        kernel,
        grid=(nb, n_eq_tiles),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((blk, nf), lambda i, j: (i, 0)) for _ in range(3)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((coef_s.shape[0], nf), jnp.float32)
            for _ in range(3)
        ],
        # the step body holds 9 d-planes + 9 t-planes + trig temps + the
        # 3-pass bf16 operand splits — past Mosaic's default 16 MB scoped
        # stack at (256, 512) tiles; give it real VMEM headroom
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    x = jnp.stack(outs, axis=-2)  # (rows', 3, nf)
    return x[:rows]


def decode_solve_fused(
    coef_s: jnp.ndarray,
    coef_r: jnp.ndarray,
    dsc: DecodeSolveConsts,
    consts: DeformConsts,
    spec: SolverSpec,
    cnst_verts: jnp.ndarray,
    out_layout: str = "flat",
    **kw,
) -> jnp.ndarray:
    """Full fused path: PCA coefficients → vertices in ``out_layout``."""
    x = decode_solve_free(coef_s, coef_r, dsc, **kw)
    return assemble_from_free(consts, spec, x, cnst_verts, out_layout)
