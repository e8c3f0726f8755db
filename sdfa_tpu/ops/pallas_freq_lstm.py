"""Pallas TPU kernel: fully-fused FreqLstm ("spectral gathering").

DESIGN.md §9's round-2 profile: the freq-LSTM's sequential machinery
(while loops + the two 0.96 ms recurrent-gate fusions + scan plumbing) is
the single largest slice of forward device time, and its working set
(32 freq steps, weights + state) fits VMEM — the named #1 pallas target
(VERDICT r2 #1). Reference semantics: speech_anime/layers/freq_lstm.py:5-67
— per-timestep bidirectional LSTM along the frequency axis, concat all F
outputs ("full" mode), FC to output_size.

What this kernel fuses, per (B·T)-row block, entirely on-chip:

1. the per-step input projections x_t·W_ih (both directions),
2. the 32-step recurrences h·W_hh + gate nonlinearities (both
   directions, run in the same step loop: forward walks f, reverse
   walks F−1−f),
3. the output projection: instead of materializing the (rows, F·2H)
   concat (32 KB/row) and one huge FC, each step accumulates
   h_dir(f) @ W_proj[dir, f] into a VMEM accumulator — mathematically
   identical because the FC is linear in each h slice.

HBM traffic per row: read F·C·4 = 8 KB (raw features) + write out·4 =
1 KB, vs ~160 KB/row for the lax.scan path (x_proj read per step, h
concat write + FC re-read). The recurrent weights, input-proj weights,
projection matrix (8 MB) and h/c state never leave VMEM.

Numerics: every matmul accumulates in f32; the multiplies run as a
3-pass bf16 split (hi/lo error compensation — ``_dot_f32``), because
Mosaic's single-pass f32 matmul truncates operands to bf16 (measured in
round 2: max |Δ| 2.4e-3, outside the 1e-4 serving budget). The 3-pass
product matches jax.lax.Precision.HIGH semantics (~2e-7 relative).

Layouts: x arrives as (F, C, rows) so each step's DMA slice (C, blk)
has rows on the 128-lane axis (no tile padding; C=64 is a sublane
multiple). The gate matmul contracts the C axis of the (C, blk) tile
directly (xᵀ·W via dot_general) — no in-kernel transpose.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as _P


def kernel_side_effects() -> bool:
    """has_side_effects on the recurrence kernels' custom calls.

    True pins a kernel in place even where XLA cannot see a use of its
    outputs — but it also marks every program containing it EFFECTFUL,
    which knocks jax dispatch off the fast path. Over the axon tunnel
    that is ruinous: the round-3 train-kernel qualification measured the
    SAME fused step at 556 ms/step effectful vs 89 ms/step not (scan
    97 ms) — the whole round-2 "fused loses 5×" verdict was dispatch,
    not kernel time. Every kernel here returns genuine pallas_call
    results its consumer reads, so dataflow alone keeps them alive;
    default off (SDFA_KERNEL_SIDEFX=1 restores the pinned behavior)."""
    return os.environ.get("SDFA_KERNEL_SIDEFX", "0") == "1"


def rows_partitioned(impl, rule: str, need_replication: tuple):
    """Make a rows-batched opaque kernel GSPMD/Shardy-partitionable.

    A ``pallas_call`` is an opaque custom call the SPMD partitioner
    cannot split, which forced multi-chip serving back to the scan path
    (DESIGN §9). This wrapper declares the batch-parallel structure:
    operand 0's leading (rows) axis may shard; every other operand is
    replicated (the partitioner inserts resharding if a caller handed
    weights in sharded). Each shard then runs ``impl`` on its local rows
    — identical math, zero collectives.

    ``rule`` is the einsum-style SdyShardingRule (Shardy is the default
    partitioner in this JAX); ``need_replication`` lists every factor
    except the rows factor. The GSPMD callbacks are also provided for
    the legacy partitioner.
    """
    cp = custom_partitioning(impl)

    def _rows_spec(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[0] if len(spec) else None

    def _sharding(mesh, spec0, ndim):
        return NamedSharding(mesh, _P(spec0, *([None] * (ndim - 1))))

    def infer(mesh, arg_shapes, result_shape):
        return _sharding(mesh, _rows_spec(arg_shapes),
                         len(result_shape.shape))

    def partition(mesh, arg_shapes, result_shape):
        s0 = _rows_spec(arg_shapes)
        arg_sh = tuple(
            _sharding(mesh, s0, len(a.shape)) if i == 0
            else NamedSharding(mesh, _P())
            for i, a in enumerate(arg_shapes))
        return mesh, impl, _sharding(mesh, s0, len(result_shape.shape)), arg_sh

    cp.def_partition(partition, infer_sharding_from_operands=infer,
                     sharding_rule=rule,
                     need_replication_factors=need_replication)
    return cp


def row_block(rows: int, block_rows: int, align: int, floor: int = 128) -> int:
    """Row-block size for a kernel that slices rows off an HBM axis:
    capped at ``block_rows``, at least ``floor``, rounded UP to ``align``
    (Mosaic requires lane slices 128-aligned and sublane slices
    8-aligned — a 192-row pool batch fails lane slicing otherwise)."""
    blk = min(block_rows, max(floor, rows))
    return -(-blk // align) * align


def _passes(precise) -> int:
    """Normalize the kernel precision knob: True→3 (hi/lo split both
    operands), 2→2 (split only the weight operand), False/1→1
    (plain bf16 product).

    Callers that cache on the knob MUST cache the normalized int:
    ``hash(True) == hash(1)``, so a raw (…, True) lru entry would be
    silently returned for (…, 1) and vice versa."""
    if precise is True:
        return 3
    if precise is False:
        return 1
    return int(precise)


def _dot_f32(a, b, precise=True):
    """MXU matmul with f32 accumulation at 1/2/3 bf16 passes.

    3 (default): hi/lo error compensation on BOTH operands — HIGH-
    precision semantics. 2: split only ``b`` (the weight operand — its
    truncation dominates the LSTM recurrence error; splitting the
    activation side instead measured barely better than 1-pass),
    ``a`` rounds to bf16. 1: both operands round to bf16 — exactly what
    Mosaic does to a plain f32 dot anyway; the cast is explicit so
    interpret mode (CPU tests, simulations) shows the same truncation
    the hardware applies."""
    n = _passes(precise)
    dims = (((a.ndim - 1,), (0,)), ((), ()))

    def bf16_dot(x, y):
        return jax.lax.dot_general(x, y, dims,
                                   preferred_element_type=jnp.float32)

    a_hi = a.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    if n == 1:
        return bf16_dot(a_hi, b_hi)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    if n == 2:
        return bf16_dot(a_hi, b_hi) + bf16_dot(a_hi, b_lo)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return bf16_dot(a_hi, b_hi) + bf16_dot(a_hi, b_lo) + bf16_dot(a_lo, b_hi)


def _dot_t_f32(a_t, b, precise=True):
    """(C, blk)ᵀ @ (C, G) with f32 accumulation — contracts dim 0 of
    both. Same 1/2/3-pass semantics as ``_dot_f32`` (2 splits b)."""
    n = _passes(precise)
    dims = (((0,), (0,)), ((), ()))

    def dot(x, y):
        return jax.lax.dot_general(x, y, dims,
                                   preferred_element_type=jnp.float32)

    a_hi = a_t.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    if n == 1:
        return dot(a_hi, b_hi)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    if n == 2:
        return dot(a_hi, b_hi) + dot(a_hi, b_lo)
    a_lo = (a_t - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)


def _freq_lstm_kernel(x_hbm, w_ih, w_hh, gate_bias, w_proj_hbm, b_proj,
                      out_ref, wproj_vmem, acc_ref, hf, cf, hr, cr,
                      xf_buf, xr_buf, in_sems, *,
                      n_freq: int, n_in: int, blk: int, hidden: int,
                      precise: bool):
    """One grid program = the full F-step bidirectional recurrence + fused
    output projection for one row block.

    x_hbm: (F, C, rows) ANY — per-step (C, blk) slices stream in via
    double-buffered DMA (2 per step: forward reads f, reverse F−1−f).
    w_ih: (2, C, 4H) VMEM; w_hh: (2, H, 4H) VMEM; gate_bias: (2, 1, 4H)
    VMEM (b_ih+b_hh). w_proj_hbm: (2, F, H, out) ANY — DMA'd once into
    the persistent VMEM scratch at program 0 (8 MB; kept out of the
    BlockSpec pipeline so it is never double-buffered). b_proj: (1, out).
    out_ref: (blk, out) VMEM output block.
    """
    b0 = pl.program_id(0) * blk

    # one-time weight DMA (scratch persists across sequential grid steps)
    @pl.when(pl.program_id(0) == 0)
    def _():
        def load_wproj(sem):
            dma = pltpu.make_async_copy(w_proj_hbm, wproj_vmem, sem)
            dma.start()
            dma.wait()

        pl.run_scoped(load_wproj, pltpu.SemaphoreType.DMA(()))

    hf[:] = jnp.zeros_like(hf)
    cf[:] = jnp.zeros_like(cf)
    hr[:] = jnp.zeros_like(hr)
    cr[:] = jnp.zeros_like(cr)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def in_dma(buf, slot, sem_slot, f_idx):
        return pltpu.make_async_copy(
            x_hbm.at[f_idx, :, pl.ds(b0, blk)],
            buf.at[slot], in_sems.at[sem_slot])

    # warm-up: both directions' step-0 tiles (sem slots 0-1 fwd, 2-3 rev)
    in_dma(xf_buf, 0, 0, 0).start()
    in_dma(xr_buf, 0, 2, n_freq - 1).start()

    def cell(x_t, h, c, d):
        gates = _dot_t_f32(x_t, w_ih[d], precise)
        gates = gates + _dot_f32(h, w_hh[d], precise)
        gates = gates + gate_bias[d]
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden:])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return h_new, c_new

    def loop(step, _):
        slot = step % 2
        nxt = (step + 1) % 2

        @pl.when(step + 1 < n_freq)
        def _():
            in_dma(xf_buf, nxt, nxt, step + 1).start()
            in_dma(xr_buf, nxt, 2 + nxt, n_freq - 2 - step).start()

        in_dma(xf_buf, slot, slot, step).wait()
        h_new, c_new = cell(xf_buf[slot], hf[:], cf[:], 0)
        hf[:] = h_new
        cf[:] = c_new
        acc_ref[:] = acc_ref[:] + _dot_f32(h_new, wproj_vmem[0, step], precise)

        in_dma(xr_buf, slot, 2 + slot, n_freq - 1 - step).wait()
        h_new, c_new = cell(xr_buf[slot], hr[:], cr[:], 1)
        hr[:] = h_new
        cr[:] = c_new
        acc_ref[:] = acc_ref[:] + _dot_f32(
            h_new, wproj_vmem[1, n_freq - 1 - step], precise)
        return 0

    jax.lax.fori_loop(0, n_freq, loop, 0)
    out_ref[:] = acc_ref[:] + b_proj[:]


def _freq_fused_impl(x, w_ih, w_hh, gate_bias, w_proj, b_proj,
                     *, block_rows: int, interpret: bool, precise: bool):
    rows, n_freq, n_in = x.shape
    two, _, gdim = w_ih.shape
    assert two == 2, "freq_lstm_fused is bidirectional"
    hidden = gdim // 4
    out_dim = w_proj.shape[1]
    assert w_proj.shape[0] == n_freq * 2 * hidden, (
        w_proj.shape, n_freq, hidden)

    # rows ride the 128-lane axis inside the kernel: every per-step DMA
    # slices x_hbm[..., b0:b0+blk] along lanes → blk must be 128-aligned
    blk = row_block(rows, block_rows, align=128)
    pad = (-rows) % blk
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    padded_rows = x.shape[0]
    nb = padded_rows // blk

    # (rows, F, C) → (F, C, rows): rows on the lane axis, so each step's
    # (C, blk) DMA tile is unpadded (C=64 sublanes, blk lanes)
    x_fcr = jnp.transpose(x, (1, 2, 0))

    # (F·2H, out) with row index f·2H + d·H + h  →  (2, F, H, out)
    w_proj_4d = jnp.transpose(
        w_proj.reshape(n_freq, 2, hidden, out_dim), (1, 0, 2, 3))

    gb = (gate_bias if gate_bias is not None
          else jnp.zeros((2, gdim), x.dtype)).reshape(2, 1, gdim)
    bp = (b_proj if b_proj is not None
          else jnp.zeros((out_dim,), x.dtype)).reshape(1, out_dim)

    kernel = functools.partial(
        _freq_lstm_kernel, n_freq=n_freq, n_in=n_in, blk=blk,
        hidden=hidden, precise=precise)

    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # x (F, C, rows)
            pl.BlockSpec((2, n_in, gdim), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),            # w_ih
            pl.BlockSpec((2, hidden, gdim), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),            # w_hh
            pl.BlockSpec((2, 1, gdim), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),            # gate bias
            pl.BlockSpec(memory_space=pl.ANY),             # w_proj (DMA'd)
            pl.BlockSpec((1, out_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),            # b_proj
        ],
        out_specs=pl.BlockSpec((blk, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded_rows, out_dim), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, n_freq, hidden, out_dim), jnp.float32),  # w_proj
            pltpu.VMEM((blk, out_dim), jnp.float32),                # acc
            pltpu.VMEM((blk, hidden), jnp.float32),                 # h fwd
            pltpu.VMEM((blk, hidden), jnp.float32),                 # c fwd
            pltpu.VMEM((blk, hidden), jnp.float32),                 # h rev
            pltpu.VMEM((blk, hidden), jnp.float32),                 # c rev
            pltpu.VMEM((2, n_in, blk), jnp.float32),                # x fwd buf
            pltpu.VMEM((2, n_in, blk), jnp.float32),                # x rev buf
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=kernel_side_effects()),
        interpret=interpret,
    )(x_fcr, w_ih, w_hh, gb, w_proj_4d, bp)
    return out[:rows]


@functools.lru_cache(maxsize=None)
def _freq_cp(block_rows: int, precise: bool, interpret: bool):
    # plain positional closure: custom_partitioning rejects partials with
    # keyword-only bindings ("keyword arguments could not be resolved")
    def impl(x, w_ih, w_hh, gb, w_proj, bp):
        return _freq_fused_impl(x, w_ih, w_hh, gb, w_proj, bp,
                                block_rows=block_rows, precise=precise,
                                interpret=interpret)

    return rows_partitioned(
        impl, "i f c, a c g, a h g, a g, p o, o -> i o",
        ("f", "c", "a", "g", "h", "p", "o"))


def freq_lstm_fused(
    x: jnp.ndarray,
    w_ih: jnp.ndarray,
    w_hh: jnp.ndarray,
    gate_bias: Optional[jnp.ndarray],
    w_proj: jnp.ndarray,
    b_proj: Optional[jnp.ndarray],
    block_rows: int = 512,
    interpret: bool = False,
    precise: bool = True,
) -> jnp.ndarray:
    """Fused FreqLstm ("full" mode): x (rows, F, C) → (rows, out).

    w_ih: (2, C, 4H) — dir 0 forward, dir 1 reverse (torch gate order
    i,f,g,o along the 4H axis, matching nn/recurrent.py).
    w_hh: (2, H, 4H). gate_bias: (2, 4H) = b_ih+b_hh per direction (or
    None). w_proj: (F·2H, out) — the FC consuming the concat layout
    [f, dir, h] exactly as FreqLstm reshapes it. b_proj: (out,) or None.

    Partition-aware: under a sharded jit the rows axis splits across the
    mesh and each shard runs the kernel locally (``rows_partitioned``);
    weights replicate. Single-device lowering is unchanged.
    """
    gdim = w_ih.shape[2]
    gb = (gate_bias if gate_bias is not None
          else jnp.zeros((2, gdim), x.dtype))
    bp = (b_proj if b_proj is not None
          else jnp.zeros((w_proj.shape[1],), x.dtype))
    # cache on the NORMALIZED pass count: hash(True) == hash(1), so raw
    # bool/int knobs would collide in the lru cache (see _passes)
    return _freq_cp(block_rows, _passes(precise), interpret)(
        x, w_ih, w_hh, gb, w_proj, bp)


def freq_lstm_reference(x, w_ih, w_hh, gate_bias, w_proj, b_proj):
    """Scan-path oracle with the SAME argument convention (f32 HIGHEST) —
    used by tests to pin the kernel's numerics independently of the
    FreqLstm module plumbing."""
    prec = jax.lax.Precision.HIGHEST
    rows, n_freq, n_in = x.shape
    hidden = w_hh.shape[1]

    def run_dir(d, reverse):
        xp = jnp.matmul(x, w_ih[d], precision=prec)
        if gate_bias is not None:
            xp = xp + gate_bias[d]
        h = jnp.zeros((rows, hidden), x.dtype)
        c = jnp.zeros((rows, hidden), x.dtype)

        def step(carry, xt):
            h, c = carry
            gates = xt + jnp.matmul(h, w_hh[d], precision=prec)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        xs = jnp.swapaxes(xp, 0, 1)
        _, hs = jax.lax.scan(step, (h, c), xs, reverse=reverse)
        return jnp.swapaxes(hs, 0, 1)  # (rows, F, H)

    h_f = run_dir(0, False)
    h_r = run_dir(1, True)
    h_cat = jnp.concatenate([h_f, h_r], axis=-1)       # (rows, F, 2H)
    flat = h_cat.reshape(rows, n_freq * 2 * hidden)
    out = jnp.matmul(flat, w_proj, precision=prec)
    if b_proj is not None:
        out = out + b_proj
    return out
