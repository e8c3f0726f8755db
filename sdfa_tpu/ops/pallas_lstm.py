"""Pallas TPU kernel: fused LSTM sequence.

The LSTM stacks are the throughput bound of this model (SURVEY.md §7 hard
part 2; measured in DESIGN.md §5): ~320 sequential scan steps per clip, each
a small matmul. lax.scan executes one XLA loop iteration per step — the
recurrent weights re-stream from HBM and each step pays loop overhead.

This kernel runs the WHOLE sequence inside one Pallas program:
- recurrent weights (H, 4H) and the h/c state stay resident in VMEM;
- the precomputed input projections x·Wih (T, B, 4H) stream in with a
  double-buffered async DMA, one tile per step, overlapped with the gate
  matmul of the previous step;
- outputs stream back to HBM per step.

Batch is tiled over the grid so arbitrarily large window batches fit VMEM.
Gate order follows torch (i, f, g, o) like nn/recurrent.py.

Enabled via SDFA_PALLAS_LSTM=1 (nn/recurrent.py picks it up); validated
against the lax.scan path in interpret mode (tests/test_pallas_lstm.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_freq_lstm import row_block


def _lstm_kernel(x_hbm, w_hh, bias, out_hbm, *, seq_len: int, blk: int,
                 hidden: int, reverse: bool, use_bias: bool):
    """One grid program: full sequence for one batch block.

    x_hbm: (T, B, 4H) full array in ANY/HBM (TPU lowering requires trivial
    ANY blocks — the batch block is addressed inside via program_id);
    w_hh: (H, 4H) VMEM; bias: (1, 4H) VMEM; out_hbm: (T, B, H) ANY/HBM.
    """
    b0 = pl.program_id(0) * blk

    def body(x_buf, h_ref, c_ref, out_buf, in_sems, out_sems):
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

        def t_of(step):
            return (seq_len - 1 - step) if reverse else step

        def in_dma(slot, step):
            return pltpu.make_async_copy(
                x_hbm.at[t_of(step), pl.ds(b0, blk), :],
                x_buf.at[slot], in_sems.at[slot]
            )

        def out_dma(slot, step):
            return pltpu.make_async_copy(
                out_buf.at[slot],
                out_hbm.at[t_of(step), pl.ds(b0, blk), :],
                out_sems.at[slot]
            )

        in_dma(0, 0).start()

        def loop(step, _):
            slot = step % 2
            nxt = (step + 1) % 2

            @pl.when(step + 1 < seq_len)
            def _():
                in_dma(nxt, step + 1).start()

            in_dma(slot, step).wait()
            gates = x_buf[slot] + jnp.dot(
                h_ref[:], w_hh[:], preferred_element_type=jnp.float32
            )
            if use_bias:
                gates = gates + bias[:]
            i = jax.nn.sigmoid(gates[:, :hidden])
            f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
            g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
            o = jax.nn.sigmoid(gates[:, 3 * hidden :])
            c = f * c_ref[:] + i * g
            h = o * jnp.tanh(c)
            c_ref[:] = c
            h_ref[:] = h

            # wait for the previous write of this slot before reusing it
            @pl.when(step >= 2)
            def _():
                out_dma(slot, step - 2).wait()

            out_buf[slot] = h
            out_dma(slot, step).start()
            return 0

        jax.lax.fori_loop(0, seq_len, loop, 0)
        # drain the last two output DMAs
        @pl.when(seq_len >= 2)
        def _():
            out_dma((seq_len - 2) % 2, seq_len - 2).wait()

        out_dma((seq_len - 1) % 2, seq_len - 1).wait()

    pl.run_scoped(
        body,
        x_buf=pltpu.VMEM((2, blk, 4 * hidden), jnp.float32),
        h_ref=pltpu.VMEM((blk, hidden), jnp.float32),
        c_ref=pltpu.VMEM((blk, hidden), jnp.float32),
        out_buf=pltpu.VMEM((2, blk, hidden), jnp.float32),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


def lstm_sequence_pallas(
    x_proj: jnp.ndarray,
    w_hh: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    reverse: bool = False,
    block_b: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x_proj (B, T, 4H), w_hh (H, 4H), bias (4H,)|None → (B, T, H)."""
    bsz, seq_len, gdim = x_proj.shape
    hidden = gdim // 4
    # batch rides the sublane axis: 8-align the block's HBM slices
    blk = row_block(bsz, block_b, align=8, floor=8)
    pad = (-bsz) % blk
    if pad:
        x_proj = jnp.pad(x_proj, ((0, pad), (0, 0), (0, 0)))
    nb = x_proj.shape[0] // blk
    x_tm = jnp.swapaxes(x_proj, 0, 1)  # (T, B', 4H) — stream per step

    use_bias = bias is not None
    bias_arr = (bias if use_bias else jnp.zeros((gdim,), x_proj.dtype)).reshape(1, gdim)

    kernel = functools.partial(
        _lstm_kernel, seq_len=seq_len, blk=blk, hidden=hidden,
        reverse=reverse, use_bias=use_bias,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((hidden, gdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((seq_len, x_proj.shape[0], hidden),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(x_tm, w_hh, bias_arr)
    out = jnp.swapaxes(out, 0, 1)  # (B', T, H)
    return out[:bsz]
