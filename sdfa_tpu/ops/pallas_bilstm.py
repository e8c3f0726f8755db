"""Pallas TPU kernel: fused bidirectional LSTM layer (time axis).

Companion to ops/pallas_freq_lstm.py for the model's main temporal
biLSTM (reference rnn.py:4-21 via config: 256→256×2 layers,
bidirectional — SURVEY.md A17). The lax.scan path runs 4 sequential
scans per forward (2 layers × 2 directions), each step a small matmul;
round 2 measured a time-axis kernel LOSING to the scan because it
streamed the precomputed x·W_ih (4H wide = 4× the input's traffic) and
ran one direction per call. This kernel:

- streams the RAW layer input (T, rows, in) — in ∈ {256, 512} keeps the
  (blk, in) DMA tile lane-aligned, no transpose anywhere;
- runs BOTH directions in one T-step loop (half the sequential steps of
  two scans), weights + h/c VMEM-resident;
- computes the input projections in-kernel (one (blk,in)@(in,4H) per
  step per direction) — ¼ the HBM read traffic of streaming x_proj;
- writes the concat output (T, rows, 2H) per step via double-buffered
  DMA, which is exactly the next layer's streaming input layout;
- accumulates every matmul in f32 via the same 3-pass bf16 hi/lo split
  (Mosaic's 1-pass f32 dot truncates to bf16 — outside the 1e-4 serving
  budget).

Used by nn/recurrent.LSTM for inference on single-chip TPU (same
gating as the freq-LSTM kernel; scan path for training/GSPMD).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_freq_lstm import (_dot_f32, kernel_side_effects, row_block,
                               rows_partitioned)


def _bilstm_kernel(x_hbm, w_ih, w_hh, gate_bias, out_hbm,
                   hf, cf, hr, cr, xf_buf, xr_buf, of_buf, or_buf,
                   in_sems, out_sems, *,
                   seq_len: int, n_in: int, blk: int, hidden: int,
                   precise: bool):
    """One grid program = the full T-step bidirectional layer for one row
    block. x_hbm: (T, rows, in) ANY; out_hbm: (T, rows, 2H) ANY — forward
    h in [..., :H], reverse h in [..., H:] (torch biLSTM concat order)."""
    b0 = pl.program_id(0) * blk

    hf[:] = jnp.zeros_like(hf)
    cf[:] = jnp.zeros_like(cf)
    hr[:] = jnp.zeros_like(hr)
    cr[:] = jnp.zeros_like(cr)

    def in_dma(buf, slot, sem_slot, t):
        return pltpu.make_async_copy(
            x_hbm.at[t, pl.ds(b0, blk), :], buf.at[slot],
            in_sems.at[sem_slot])

    def out_dma(buf, slot, sem_slot, t, half):
        return pltpu.make_async_copy(
            buf.at[slot],
            out_hbm.at[t, pl.ds(b0, blk), pl.ds(half * hidden, hidden)],
            out_sems.at[sem_slot])

    in_dma(xf_buf, 0, 0, 0).start()
    in_dma(xr_buf, 0, 2, seq_len - 1).start()

    def cell(x_t, h, c, d):
        gates = _dot_f32(x_t, w_ih[d], precise)
        gates = gates + _dot_f32(h, w_hh[d], precise)
        gates = gates + gate_bias[d]
        i = jax.nn.sigmoid(gates[:, :hidden])
        f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden:])
        c_new = f * c + i * g
        return o * jnp.tanh(c_new), c_new

    def loop(step, _):
        slot = step % 2
        nxt = (step + 1) % 2

        @pl.when(step + 1 < seq_len)
        def _():
            in_dma(xf_buf, nxt, nxt, step + 1).start()
            in_dma(xr_buf, nxt, 2 + nxt, seq_len - 2 - step).start()

        # wait for this slot's previous output writes before reuse
        @pl.when(step >= 2)
        def _():
            out_dma(of_buf, slot, slot, step - 2, 0).wait()
            out_dma(or_buf, slot, 2 + slot, seq_len + 1 - step, 1).wait()

        in_dma(xf_buf, slot, slot, step).wait()
        h_new, c_new = cell(xf_buf[slot], hf[:], cf[:], 0)
        hf[:] = h_new
        cf[:] = c_new
        # out buffers may be bf16 (inter-layer staging): in 1-pass mode
        # the next layer's _dot_f32 casts its activation to bf16 anyway,
        # so rounding at the WRITE is value-identical and halves the
        # (T, rows, 2H) HBM stack — the 256-clip OOM's entire bulk
        of_buf[slot] = h_new.astype(of_buf.dtype)
        out_dma(of_buf, slot, slot, step, 0).start()

        in_dma(xr_buf, slot, 2 + slot, seq_len - 1 - step).wait()
        h_new, c_new = cell(xr_buf[slot], hr[:], cr[:], 1)
        hr[:] = h_new
        cr[:] = c_new
        or_buf[slot] = h_new.astype(or_buf.dtype)
        out_dma(or_buf, slot, 2 + slot, seq_len - 1 - step, 1).start()
        return 0

    jax.lax.fori_loop(0, seq_len, loop, 0)
    # drain the last two output DMAs of each stream
    @pl.when(seq_len >= 2)
    def _():
        out_dma(of_buf, (seq_len - 2) % 2, (seq_len - 2) % 2,
                seq_len - 2, 0).wait()
        out_dma(or_buf, (seq_len - 2) % 2, 2 + (seq_len - 2) % 2, 1, 1).wait()

    out_dma(of_buf, (seq_len - 1) % 2, (seq_len - 1) % 2,
            seq_len - 1, 0).wait()
    out_dma(or_buf, (seq_len - 1) % 2, 2 + (seq_len - 1) % 2, 0, 1).wait()


def _bilstm_fused_impl(x, w_ih, w_hh, gate_bias,
                       *, block_rows: int, interpret: bool, precise: bool,
                       out_dtype=None):
    rows, seq_len, n_in = x.shape
    two, _, gdim = w_ih.shape
    assert two == 2
    hidden = gdim // 4
    out_dtype = jnp.dtype(out_dtype or jnp.float32)

    # rows ride the sublane axis of each (blk, in)/(blk, H) DMA tile —
    # Mosaic requires sublane slices tile-aligned; bf16 tiles are (16,
    # 128) vs f32's (8, 128), so a bf16 input or output needs 16-aligned
    # row blocks; round up and zero-pad
    align = 16 if (x.dtype == jnp.bfloat16
                   or out_dtype == jnp.bfloat16) else 8
    blk = row_block(rows, block_rows, align=align)
    pad = (-rows) % blk
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    padded_rows = x.shape[0]
    nb = padded_rows // blk

    x_trc = jnp.swapaxes(x, 0, 1)  # (T, rows, in): clean (blk, in) tiles

    gb = (gate_bias if gate_bias is not None
          else jnp.zeros((2, gdim), jnp.float32)).reshape(2, 1, gdim)

    kernel = functools.partial(
        _bilstm_kernel, seq_len=seq_len, n_in=n_in, blk=blk, hidden=hidden,
        precise=precise)

    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                # x (T, rows, in)
            pl.BlockSpec((2, n_in, gdim), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hidden, gdim), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, gdim), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((seq_len, padded_rows, 2 * hidden),
                                       out_dtype),
        scratch_shapes=[
            pltpu.VMEM((blk, hidden), jnp.float32),   # h fwd
            pltpu.VMEM((blk, hidden), jnp.float32),   # c fwd
            pltpu.VMEM((blk, hidden), jnp.float32),   # h rev
            pltpu.VMEM((blk, hidden), jnp.float32),   # c rev
            pltpu.VMEM((2, blk, n_in), x.dtype),      # x fwd bufs
            pltpu.VMEM((2, blk, n_in), x.dtype),      # x rev bufs
            pltpu.VMEM((2, blk, hidden), out_dtype),  # out fwd bufs
            pltpu.VMEM((2, blk, hidden), out_dtype),  # out rev bufs
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=kernel_side_effects()),
        interpret=interpret,
    )(x_trc, w_ih, w_hh, gb)
    out = jnp.swapaxes(out, 0, 1)  # (rows', T, 2H)
    return out[:rows]


@functools.lru_cache(maxsize=None)
def _bilstm_cp(block_rows: int, precise: bool, interpret: bool,
               out_dtype_name: str):
    # plain positional closure: custom_partitioning rejects partials with
    # keyword-only bindings
    def impl(x, w_ih, w_hh, gb):
        return _bilstm_fused_impl(x, w_ih, w_hh, gb, block_rows=block_rows,
                                  precise=precise, interpret=interpret,
                                  out_dtype=jnp.dtype(out_dtype_name))

    return rows_partitioned(
        impl, "i t c, a c g, a h g, a g -> i t d",
        ("t", "c", "a", "g", "h", "d"))


def bilstm_layer_fused(
    x: jnp.ndarray,
    w_ih: jnp.ndarray,
    w_hh: jnp.ndarray,
    gate_bias: Optional[jnp.ndarray],
    block_rows: int = 256,
    interpret: bool = False,
    precise: bool = True,
    out_dtype=None,
) -> jnp.ndarray:
    """Fused bidirectional LSTM layer: x (rows, T, in) → (rows, T, 2H).

    w_ih (2, in, 4H), w_hh (2, H, 4H), gate_bias (2, 4H) or None —
    direction 0 forward, 1 reverse; torch gate order i,f,g,o.

    ``out_dtype=jnp.bfloat16`` halves the (rows, T, 2H) output stack —
    for INTER-layer staging in 1-pass mode it is value-identical (the
    next layer's ``_dot_f32`` rounds its activation to bf16 regardless),
    and it is the HBM bulk that capped the serving batch at 128 clips
    (artifacts/batch_scaling_r4/). Default f32.

    Partition-aware like freq_lstm_fused: rows may shard across a mesh,
    each shard runs the kernel locally; weights replicate.
    """
    gdim = w_ih.shape[2]
    gb = (gate_bias if gate_bias is not None
          else jnp.zeros((2, gdim), jnp.float32))
    # cache on the NORMALIZED pass count (hash(True) == hash(1) — raw
    # bool/int knobs collide in the lru cache)
    from .pallas_freq_lstm import _passes
    return _bilstm_cp(block_rows, _passes(precise), interpret,
                      jnp.dtype(out_dtype or jnp.float32).name)(
        x, w_ih, w_hh, gb)


def bilstm_layer_reference(x, w_ih, w_hh, gate_bias):
    """Scan-path oracle, same argument convention (f32 HIGHEST)."""
    prec = jax.lax.Precision.HIGHEST
    rows, seq_len, n_in = x.shape
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

        _, hs = jax.lax.scan(step, (h, c), jnp.swapaxes(xp, 0, 1),
                             reverse=reverse)
        return jnp.swapaxes(hs, 0, 1)

    return jnp.concatenate([run_dir(0, False), run_dir(1, True)], axis=-1)
