"""Pallas TPU kernels: fused bidirectional LSTM *training* core.

Round-2/3 shipped fused inference kernels (ops/pallas_bilstm.py,
ops/pallas_freq_lstm.py) but "training keeps the scan path (no custom
VJP)" — the one asymmetry left in DESIGN §9. This module closes it with
a custom_vjp whose forward AND backward recurrences run as fused Pallas
programs:

- ``bilstm_core(xp, w_hh)``: the recurrent core only. The input
  projection ``x @ W_ih + b`` stays OUTSIDE (one big XLA matmul whose
  gradient XLA already handles optimally as a batched matmul); the
  kernel consumes the time-ordered projections of both directions
  ``xp (2, T, rows, 4H)`` and runs both 64-step recurrences in one
  VMEM-resident program — half the sequential steps of two scans, no
  HBM round-trip between steps (the lax.scan path dispatches one
  while-iteration per step). Because the core consumes xp directly,
  it has no input-width alignment constraint: it covers the temporal
  biLSTM (in 256/512, H 256) and the FreqLstm core (in 3, H 128) with
  the same kernel.
- forward saves the post-activation gates (i,f,g,o) and the cell states
  per direction-step — exactly the residuals BPTT needs, written via
  the same double-buffered DMA as the h output.
- backward is a second fused program walking both directions' steps in
  reverse, carrying dh/dc in VMEM; it emits d(gates_pre), which IS
  d(xp). The weight gradients are then two big XLA matmuls over all
  rows·T (far better MXU schedules than per-step accumulation):
  ``dW_hh[d] = h_prev[d]^T @ dg[d]``, and dW_ih/db flow through the
  XLA autodiff of the outside projection.

All matmuls accumulate f32 via the 3-pass bf16 hi/lo split (`_dot_f32`)
— gradient parity vs the f32 scan autodiff is tested in interpret mode
(tests/test_pallas_bilstm_train.py).

Gate order is torch's i,f,g,o (reference rnn.py:4-21 semantics).
Partition-aware like the inference kernels: both the forward and the
BPTT program declare rows-batch parallelism (``_axis_partitioned`` —
rows_partitioned generalized to a rows axis at any position and multiple
results), so a data-parallel sharded train step runs each kernel on its
local rows with zero collectives
(tests/test_pallas_bilstm_train.py::TestShardedPartitioning).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as _P

from .pallas_freq_lstm import _dot_f32, kernel_side_effects, row_block

_HI = jax.lax.Precision.HIGHEST


def _axis_partitioned(impl, rule: str, need_replication: tuple,
                      arg_rows_axes: tuple, res_rows_axes: tuple):
    """rows_partitioned generalized to a rows axis at ANY position (and
    multiple results): ``arg_rows_axes``/``res_rows_axes`` give the rows
    axis index per argument/result (None = fully replicated). Each shard
    runs ``impl`` on its local rows — identical math, zero collectives."""
    cp = custom_partitioning(impl)

    def _rows_spec(arg_shapes):
        for a, ax in zip(arg_shapes, arg_rows_axes):
            if ax is not None:
                spec = a.sharding.spec
                return spec[ax] if len(spec) > ax else None
        return None

    def _sh(mesh, spec0, ndim, ax):
        names = [None] * ndim
        if ax is not None:
            names[ax] = spec0
        return NamedSharding(mesh, _P(*names))

    def infer(mesh, arg_shapes, result_shape):
        s0 = _rows_spec(arg_shapes)
        if isinstance(result_shape, (list, tuple)):
            return tuple(_sh(mesh, s0, len(r.shape), ax)
                         for r, ax in zip(result_shape, res_rows_axes))
        return _sh(mesh, s0, len(result_shape.shape), res_rows_axes[0])

    def partition(mesh, arg_shapes, result_shape):
        s0 = _rows_spec(arg_shapes)
        arg_sh = tuple(_sh(mesh, s0, len(a.shape), ax)
                       for a, ax in zip(arg_shapes, arg_rows_axes))
        return mesh, impl, infer(mesh, arg_shapes, result_shape), arg_sh

    cp.def_partition(partition, infer_sharding_from_operands=infer,
                     sharding_rule=rule,
                     need_replication_factors=need_replication)
    return cp


def _fwd_kernel(xp_hbm, w_hh, out_hbm, gates_hbm, c_hbm,
                hf, cf, hr, cr, xbufs, obufs, gbufs, cbufs,
                in_sems, out_sems, g_sems, c_sems, *,
                seq_len: int, blk: int, hidden: int, precise: bool):
    """Both directions' recurrences for one row block.

    xp_hbm (2, T, rows, 4H) time-ordered; out_hbm (T, rows, 2H) h concat;
    gates_hbm (2, T, rows, 4H) and c_hbm (2, T, rows, H) are indexed by
    the DIRECTION'S OWN step order (dir 0 step s = time s; dir 1 step s
    = time T-1-s) so the backward kernel walks both contiguously."""
    b0 = pl.program_id(0) * blk

    hf[:] = jnp.zeros_like(hf)
    cf[:] = jnp.zeros_like(cf)
    hr[:] = jnp.zeros_like(hr)
    cr[:] = jnp.zeros_like(cr)

    def t_of(d, step):
        # direction step → time index into xp/out
        return step if d == 0 else seq_len - 1 - step

    def xp_dma(d, slot, step):
        return pltpu.make_async_copy(
            xp_hbm.at[d, t_of(d, step), pl.ds(b0, blk), :],
            xbufs.at[d, slot], in_sems.at[d, slot])

    def h_dma(d, slot, step):
        return pltpu.make_async_copy(
            obufs.at[d, slot],
            out_hbm.at[t_of(d, step), pl.ds(b0, blk),
                       pl.ds(d * hidden, hidden)],
            out_sems.at[d, slot])

    def g_dma(d, slot, step):
        return pltpu.make_async_copy(
            gbufs.at[d, slot], gates_hbm.at[d, step, pl.ds(b0, blk), :],
            g_sems.at[d, slot])

    def c_dma(d, slot, step):
        return pltpu.make_async_copy(
            cbufs.at[d, slot], c_hbm.at[d, step, pl.ds(b0, blk), :],
            c_sems.at[d, slot])

    xp_dma(0, 0, 0).start()
    xp_dma(1, 0, 0).start()

    def loop(step, _):
        slot = step % 2
        nxt = (step + 1) % 2

        @pl.when(step + 1 < seq_len)
        def _():
            xp_dma(0, nxt, step + 1).start()
            xp_dma(1, nxt, step + 1).start()

        @pl.when(step >= 2)
        def _():
            for d in (0, 1):
                h_dma(d, slot, step - 2).wait()
                g_dma(d, slot, step - 2).wait()
                c_dma(d, slot, step - 2).wait()

        for d, (h_s, c_s) in ((0, (hf, cf)), (1, (hr, cr))):
            xp_dma(d, slot, step).wait()
            gates = xbufs[d, slot] + _dot_f32(h_s[:], w_hh[d], precise)
            i = jax.nn.sigmoid(gates[:, :hidden])
            f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
            g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
            o = jax.nn.sigmoid(gates[:, 3 * hidden:])
            c_new = f * c_s[:] + i * g
            h_new = o * jnp.tanh(c_new)
            h_s[:] = h_new
            c_s[:] = c_new
            obufs[d, slot] = h_new
            gbufs[d, slot] = jnp.concatenate([i, f, g, o], axis=-1)
            cbufs[d, slot] = c_new
            h_dma(d, slot, step).start()
            g_dma(d, slot, step).start()
            c_dma(d, slot, step).start()
        return 0

    jax.lax.fori_loop(0, seq_len, loop, 0)

    @pl.when(seq_len >= 2)
    def _():
        s = (seq_len - 2) % 2
        for d in (0, 1):
            h_dma(d, s, seq_len - 2).wait()
            g_dma(d, s, seq_len - 2).wait()
            c_dma(d, s, seq_len - 2).wait()
    s = (seq_len - 1) % 2
    for d in (0, 1):
        h_dma(d, s, seq_len - 1).wait()
        g_dma(d, s, seq_len - 1).wait()
        c_dma(d, s, seq_len - 1).wait()


def _bwd_kernel(gates_hbm, c_hbm, w_hht, dout_hbm, dg_hbm,
                dhf, dcf, dhr, dcr, cstate, gbufs, dbufs, cpbufs, dgbufs,
                g_sems, d_sems, cp_sems, dg_sems, ci_sem, *,
                seq_len: int, blk: int, hidden: int, precise: bool):
    """BPTT for both directions: walks each direction's steps s = T-1..0
    carrying dh/dc in VMEM; emits d(gates_pre) = d(xp) time-ordered.

    gates_hbm/c_hbm as written by the forward (direction-step order);
    w_hht (2, 4H, H); dout_hbm (T, rows, 2H); dg_hbm (2, T, rows, 4H)
    TIME-ordered (aligned with xp)."""
    b0 = pl.program_id(0) * blk

    dhf[:] = jnp.zeros_like(dhf)
    dcf[:] = jnp.zeros_like(dcf)
    dhr[:] = jnp.zeros_like(dhr)
    dcr[:] = jnp.zeros_like(dcr)

    def t_of(d, step):
        return step if d == 0 else seq_len - 1 - step

    def g_dma(d, slot, step):
        return pltpu.make_async_copy(
            gates_hbm.at[d, step, pl.ds(b0, blk), :],
            gbufs.at[d, slot], g_sems.at[d, slot])

    def dout_dma(d, slot, step):
        return pltpu.make_async_copy(
            dout_hbm.at[t_of(d, step), pl.ds(b0, blk),
                        pl.ds(d * hidden, hidden)],
            dbufs.at[d, slot], d_sems.at[d, slot])

    def cprev_dma(d, slot, step):
        # c at the direction's PREVIOUS step (step-1); caller guards step>0
        return pltpu.make_async_copy(
            c_hbm.at[d, step - 1, pl.ds(b0, blk), :],
            cpbufs.at[d, slot], cp_sems.at[d, slot])

    def dg_dma(d, slot, step):
        return pltpu.make_async_copy(
            dgbufs.at[d, slot], dg_hbm.at[d, t_of(d, step), pl.ds(b0, blk), :],
            dg_sems.at[d, slot])

    # init: c_state ← c[d, T-1]; first gates/dout loads for k=0 (s = T-1)
    for d in (0, 1):
        pltpu.make_async_copy(
            c_hbm.at[d, seq_len - 1, pl.ds(b0, blk), :],
            cstate.at[d], ci_sem.at[d]).start()
        g_dma(d, 0, seq_len - 1).start()
        dout_dma(d, 0, seq_len - 1).start()
    for d in (0, 1):
        pltpu.make_async_copy(
            c_hbm.at[d, seq_len - 1, pl.ds(b0, blk), :],
            cstate.at[d], ci_sem.at[d]).wait()

    def loop(k, _):
        s = seq_len - 1 - k  # this direction-step, both dirs
        slot = k % 2
        nxt = (k + 1) % 2

        @pl.when(s > 0)
        def _():
            for d in (0, 1):
                cprev_dma(d, slot, s).start()  # c[d, s-1], used THIS iter

        @pl.when(k + 1 < seq_len)
        def _():
            for d in (0, 1):
                g_dma(d, nxt, s - 1).start()
                dout_dma(d, nxt, s - 1).start()

        @pl.when(k >= 2)
        def _():
            for d in (0, 1):
                dg_dma(d, slot, s + 2).wait()

        for d, (dh_s, dc_s) in ((0, (dhf, dcf)), (1, (dhr, dcr))):
            g_dma(d, slot, s).wait()
            dout_dma(d, slot, s).wait()
            gates = gbufs[d, slot]
            i = gates[:, :hidden]
            f = gates[:, hidden:2 * hidden]
            g = gates[:, 2 * hidden:3 * hidden]
            o = gates[:, 3 * hidden:]
            tc = jnp.tanh(cstate[d])
            dh_tot = dbufs[d, slot] + dh_s[:]
            dc = dc_s[:] + dh_tot * o * (1.0 - tc * tc)
            do_ = dh_tot * tc

            @pl.when(s > 0)
            def _():
                cprev_dma(d, slot, s).wait()

            c_prev = jnp.where(s > 0, cpbufs[d, slot],
                               jnp.zeros_like(cpbufs[d, slot]))
            d_pre = jnp.concatenate([
                dc * g * i * (1.0 - i),
                dc * c_prev * f * (1.0 - f),
                dc * i * (1.0 - g * g),
                do_ * o * (1.0 - o),
            ], axis=-1)
            dgbufs[d, slot] = d_pre
            dg_dma(d, slot, s).start()
            dh_s[:] = _dot_f32(d_pre, w_hht[d], precise)
            dc_s[:] = dc * f
            cstate[d] = c_prev
        return 0

    jax.lax.fori_loop(0, seq_len, loop, 0)

    @pl.when(seq_len >= 2)
    def _():
        for d in (0, 1):
            dg_dma(d, seq_len % 2, 1).wait()
    for d in (0, 1):
        dg_dma(d, (seq_len - 1) % 2, 0).wait()


def _pad_rows(a, axis: int, pad: int):
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


def _fwd_impl(xp, w_hh, block_rows: int, interpret: bool, precise: bool):
    two, seq_len, rows, gdim = xp.shape
    assert two == 2
    hidden = gdim // 4
    blk = row_block(rows, block_rows, align=8)
    pad = (-rows) % blk
    xp = _pad_rows(xp, 2, pad)
    padded = rows + pad

    kernel = functools.partial(_fwd_kernel, seq_len=seq_len, blk=blk,
                               hidden=hidden, precise=precise)
    out, gates, c = pl.pallas_call(
        kernel,
        grid=(padded // blk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2, hidden, gdim), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((seq_len, padded, 2 * hidden), jnp.float32),
            jax.ShapeDtypeStruct((2, seq_len, padded, gdim), jnp.float32),
            jax.ShapeDtypeStruct((2, seq_len, padded, hidden), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk, hidden), jnp.float32),      # h fwd
            pltpu.VMEM((blk, hidden), jnp.float32),      # c fwd
            pltpu.VMEM((blk, hidden), jnp.float32),      # h rev
            pltpu.VMEM((blk, hidden), jnp.float32),      # c rev
            pltpu.VMEM((2, 2, blk, gdim), jnp.float32),  # xp in bufs
            pltpu.VMEM((2, 2, blk, hidden), jnp.float32),  # h out bufs
            pltpu.VMEM((2, 2, blk, gdim), jnp.float32),    # gates out bufs
            pltpu.VMEM((2, 2, blk, hidden), jnp.float32),  # c out bufs
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=kernel_side_effects(),
            # the double-buffered xp/gates streams at blk=256,
            # gdim=1024 total ~13 MB — past Mosaic's default 16 MB
            # scoped budget once compiler temps land on top
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, w_hh)
    return out[:, :rows], gates[:, :, :rows], c[:, :, :rows]


def _bwd_impl(gates, c, w_hht, dout, block_rows: int, interpret: bool,
              precise: bool):
    two, seq_len, rows, gdim = gates.shape
    hidden = gdim // 4
    blk = row_block(rows, block_rows, align=8)
    pad = (-rows) % blk
    gates = _pad_rows(gates, 2, pad)
    c = _pad_rows(c, 2, pad)
    dout = _pad_rows(dout, 1, pad)
    padded = rows + pad

    kernel = functools.partial(_bwd_kernel, seq_len=seq_len, blk=blk,
                               hidden=hidden, precise=precise)
    dg = pl.pallas_call(
        kernel,
        grid=(padded // blk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2, gdim, hidden), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((2, seq_len, padded, gdim),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((blk, hidden), jnp.float32),      # dh fwd
            pltpu.VMEM((blk, hidden), jnp.float32),      # dc fwd
            pltpu.VMEM((blk, hidden), jnp.float32),      # dh rev
            pltpu.VMEM((blk, hidden), jnp.float32),      # dc rev
            pltpu.VMEM((2, blk, hidden), jnp.float32),   # c_state per dir
            pltpu.VMEM((2, 2, blk, gdim), jnp.float32),  # gates in bufs
            pltpu.VMEM((2, 2, blk, hidden), jnp.float32),  # dout in bufs
            pltpu.VMEM((2, 2, blk, hidden), jnp.float32),  # c_prev bufs
            pltpu.VMEM((2, 2, blk, gdim), jnp.float32),    # dg out bufs
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=kernel_side_effects(),
            # the double-buffered xp/gates streams at blk=256,
            # gdim=1024 total ~13 MB — past Mosaic's default 16 MB
            # scoped budget once compiler temps land on top
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(gates, c, w_hht, dout)
    return dg[:, :, :rows]


@functools.lru_cache(maxsize=None)
def _fwd_cp(block_rows: int, interpret: bool, precise: bool):
    def impl(xp, w_hh):
        return _fwd_impl(xp, w_hh, block_rows, interpret, precise)

    # rows factor i shards (GSPMD/Shardy); everything else replicates —
    # multi-chip data-parallel training runs the kernel per shard
    return _axis_partitioned(
        impl, "a t i g, a h g -> t i d, a t i g, a t i h",
        ("a", "t", "g", "h", "d"),
        arg_rows_axes=(2, None), res_rows_axes=(1, 2, 2))


@functools.lru_cache(maxsize=None)
def _bwd_cp(block_rows: int, interpret: bool, precise: bool):
    def impl(gates, c, w_hht, dout):
        return _bwd_impl(gates, c, w_hht, dout, block_rows, interpret,
                         precise)

    return _axis_partitioned(
        impl, "a t i g, a t i h, a g h, t i d -> a t i g",
        ("a", "t", "g", "h", "d"),
        arg_rows_axes=(2, 2, None, 1), res_rows_axes=(2,))


@functools.lru_cache(maxsize=None)
def _core(block_rows: int, interpret: bool, precise: bool):
    @jax.custom_vjp
    def core(xp, w_hh):
        out, _, _ = _fwd_cp(block_rows, interpret, precise)(xp, w_hh)
        return out

    def fwd(xp, w_hh):
        out, gates, c = _fwd_cp(block_rows, interpret, precise)(xp, w_hh)
        return out, (gates, c, out, w_hh)

    def bwd(res, dout):
        gates, c, out, w_hh = res
        hidden = w_hh.shape[1]
        dg = _bwd_cp(block_rows, interpret, precise)(
            gates, c, jnp.swapaxes(w_hh, 1, 2), dout)  # (2,T,rows,4H) time
        h_f = out[..., :hidden]
        h_r = out[..., hidden:]
        # previous-step h in TIME order: fwd dir shifts right, rev shifts
        # left (rev's previous step is time t+1)
        h_prev_f = jnp.concatenate(
            [jnp.zeros_like(h_f[:1]), h_f[:-1]], axis=0)
        h_prev_r = jnp.concatenate(
            [h_r[1:], jnp.zeros_like(h_r[:1])], axis=0)
        dw_hh = jnp.stack([
            jnp.einsum("trh,trg->hg", h_prev_f, dg[0], precision=_HI),
            jnp.einsum("trh,trg->hg", h_prev_r, dg[1], precision=_HI),
        ])
        return dg, dw_hh

    core.defvjp(fwd, bwd)
    return core


def bilstm_core(xp: jnp.ndarray, w_hh: jnp.ndarray, block_rows: int = 256,
                interpret: bool = False, precise: bool = True) -> jnp.ndarray:
    """Differentiable fused biLSTM recurrent core.

    xp: (2, T, rows, 4H) time-ordered input projections (+bias) of both
    directions; w_hh: (2, H, 4H). Returns (T, rows, 2H) — forward h in
    [..., :H], reverse h in [..., H:] (torch concat order).
    """
    from .pallas_freq_lstm import _passes

    # cache on the normalized pass count: hash(True) == hash(1)
    return _core(block_rows, interpret, _passes(precise))(xp, w_hh)


def bilstm_core_reference(xp, w_hh):
    """Scan-path oracle with the same calling convention (f32 HIGHEST)."""
    hidden = w_hh.shape[1]

    def run_dir(d, reverse):
        rows = xp.shape[2]
        h = jnp.zeros((rows, hidden), xp.dtype)
        c = jnp.zeros((rows, hidden), xp.dtype)

        def step(carry, xt):
            h, c = carry
            gates = xt + jnp.matmul(h, w_hh[d], precision=_HI)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        _, hs = jax.lax.scan(step, (h, c), xp[d], reverse=reverse)
        return hs  # (T, rows, H)

    return jnp.concatenate([run_dir(0, False), run_dir(1, True)], axis=-1)
