"""Pallas TPU kernel: BOTH temporal biLSTM layers fused in one program,
inter-layer activations VMEM-resident (VERDICT r4 #1 "wavefront" fusion).

The per-layer kernel (ops/pallas_bilstm.py) writes layer 1's (rows, T, 2H)
output stack to HBM and layer 2 re-reads it — at the 128-clip serving
batch that stack is the largest tensor in the suffix (two ~4.6 GB bf16
stacks; the 256-clip OOM's entire bulk, artifacts/batch_scaling_r4/).
This kernel keeps one row block's full (T, blk, 2H) layer-1 output in
VMEM and runs layer 2 from it directly:

- phase 1 (T steps): layer-1 fwd/rev cells; output written to the VMEM
  stack only — no HBM DMA at all;
- phase 2 (T steps): layer-2 fwd/rev cells read the stack and stream the
  final (T, rows, 2H) out via double-buffered DMA.

A true wavefront (layer 2 step t−1 concurrent with layer 1 step t) is
IMPOSSIBLE for bidirectional layers: layer 2's first fwd step needs
layer 1's reverse output at t=0, which exists only after the whole
reverse pass. Two sequential phases inside one program is the strongest
legal fusion; it halves kernel launches and removes the inter-layer HBM
round trip at the cost of a smaller row block (the VMEM budget: stack
blk·T·2H·2B + both layers' bf16 weights ≈ 13 MB at blk=96 vs the ~15 MB
scratch ceiling measured in artifacts/suffix_probe_r5/).

1-pass bf16 only (weights are cast to bf16 going in — the precise 2/3-
pass serving modes keep the per-layer kernels, whose f32 weights fit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_freq_lstm import _dot_f32, kernel_side_effects, rows_partitioned


def _cell(x_t, h, c, w_ih, w_hh, gb, hidden):
    gates = _dot_f32(x_t, w_ih, 1) + _dot_f32(h, w_hh, 1) + gb
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden:])
    c_new = f * c + i * g
    return o * jnp.tanh(c_new), c_new


def _bilstm2_kernel(x_hbm, w1, u1, b1, w2, u2, b2, out_hbm,
                    stack, h1f, c1f, h1r, c1r, h2f, c2f, h2r, c2r,
                    xf_buf, xr_buf, of_buf, or_buf, in_sems, out_sems, *,
                    seq_len: int, blk: int, hidden: int):
    b0 = pl.program_id(0) * blk
    for ref in (h1f, c1f, h1r, c1r, h2f, c2f, h2r, c2r):
        ref[:] = jnp.zeros_like(ref)

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

    # ---- phase 1: layer 1, output into the VMEM stack ----
    def loop1(step, _):
        slot = step % 2
        nxt = (step + 1) % 2

        @pl.when(step + 1 < seq_len)
        def _():
            in_dma(xf_buf, nxt, nxt, step + 1).start()
            in_dma(xr_buf, nxt, 2 + nxt, seq_len - 2 - step).start()

        in_dma(xf_buf, slot, slot, step).wait()
        h_new, c_new = _cell(xf_buf[slot], h1f[:], c1f[:], w1[0], u1[0],
                             b1[0], hidden)
        h1f[:] = h_new
        c1f[:] = c_new
        stack[step, :, :hidden] = h_new.astype(stack.dtype)

        in_dma(xr_buf, slot, 2 + slot, seq_len - 1 - step).wait()
        h_new, c_new = _cell(xr_buf[slot], h1r[:], c1r[:], w1[1], u1[1],
                             b1[1], hidden)
        h1r[:] = h_new
        c1r[:] = c_new
        stack[seq_len - 1 - step, :, hidden:] = h_new.astype(stack.dtype)
        return 0

    jax.lax.fori_loop(0, seq_len, loop1, 0)

    # ---- phase 2: layer 2 from the stack, streamed out ----
    def loop2(step, _):
        slot = step % 2

        @pl.when(step >= 2)
        def _():
            out_dma(of_buf, slot, slot, step - 2, 0).wait()
            out_dma(or_buf, slot, 2 + slot, seq_len + 1 - step, 1).wait()

        h_new, c_new = _cell(stack[step], h2f[:], c2f[:], w2[0], u2[0],
                             b2[0], hidden)
        h2f[:] = h_new
        c2f[:] = c_new
        of_buf[slot] = h_new.astype(of_buf.dtype)
        out_dma(of_buf, slot, slot, step, 0).start()

        h_new, c_new = _cell(stack[seq_len - 1 - step], h2r[:], c2r[:],
                             w2[1], u2[1], b2[1], hidden)
        h2r[:] = h_new
        c2r[:] = c_new
        or_buf[slot] = h_new.astype(or_buf.dtype)
        out_dma(or_buf, slot, 2 + slot, seq_len - 1 - step, 1).start()
        return 0

    jax.lax.fori_loop(0, seq_len, loop2, 0)

    @pl.when(seq_len >= 2)
    def _():
        out_dma(of_buf, (seq_len - 2) % 2, (seq_len - 2) % 2,
                seq_len - 2, 0).wait()
        out_dma(or_buf, (seq_len - 2) % 2, 2 + (seq_len - 2) % 2, 1, 1).wait()

    out_dma(of_buf, (seq_len - 1) % 2, (seq_len - 1) % 2,
            seq_len - 1, 0).wait()
    out_dma(or_buf, (seq_len - 1) % 2, 2 + (seq_len - 1) % 2, 0, 1).wait()


def _bilstm2_fused_impl(x, w1, u1, b1, w2, u2, b2,
                        *, block_rows: int, interpret: bool, out_dtype=None):
    rows, seq_len, n_in = x.shape
    hidden = u1.shape[1]
    out_dtype = jnp.dtype(out_dtype or jnp.bfloat16)

    align = 16  # bf16 stack/out tiles need 16-aligned sublane slices
    blk = -(-min(block_rows, max(rows, align)) // align) * align
    pad = (-rows) % blk
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    padded_rows = x.shape[0]
    nb = padded_rows // blk
    x_trc = jnp.swapaxes(x, 0, 1)  # (T, rows, in)

    # bf16 weights: halves the VMEM the 2-layer weight set occupies; the
    # 1-pass dot rounds them to bf16 anyway (value-identical)
    w1b, u1b, w2b, u2b = (a.astype(jnp.bfloat16) for a in (w1, u1, w2, u2))
    b1r = b1.reshape(2, 1, 4 * hidden)
    b2r = b2.reshape(2, 1, 4 * hidden)

    kernel = functools.partial(_bilstm2_kernel, seq_len=seq_len, blk=blk,
                               hidden=hidden)
    vm = lambda shape, dt: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # x (T, rows, in)
            vm((2, n_in, 4 * hidden), jnp.bfloat16),       # w1
            vm((2, hidden, 4 * hidden), jnp.bfloat16),     # u1
            vm((2, 1, 4 * hidden), jnp.float32),           # b1
            vm((2, 2 * hidden, 4 * hidden), jnp.bfloat16),  # w2
            vm((2, hidden, 4 * hidden), jnp.bfloat16),     # u2
            vm((2, 1, 4 * hidden), jnp.float32),           # b2
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((seq_len, padded_rows, 2 * hidden),
                                       out_dtype),
        scratch_shapes=[
            pltpu.VMEM((seq_len, blk, 2 * hidden), jnp.bfloat16),  # stack
            pltpu.VMEM((blk, hidden), jnp.float32),   # h1 fwd
            pltpu.VMEM((blk, hidden), jnp.float32),   # c1 fwd
            pltpu.VMEM((blk, hidden), jnp.float32),   # h1 rev
            pltpu.VMEM((blk, hidden), jnp.float32),   # c1 rev
            pltpu.VMEM((blk, hidden), jnp.float32),   # h2 fwd
            pltpu.VMEM((blk, hidden), jnp.float32),   # c2 fwd
            pltpu.VMEM((blk, hidden), jnp.float32),   # h2 rev
            pltpu.VMEM((blk, hidden), jnp.float32),   # c2 rev
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
    )(x_trc, w1b, u1b, b1r, w2b, u2b, b2r)
    out = jnp.swapaxes(out, 0, 1)  # (rows', T, 2H)
    return out[:rows]


@functools.lru_cache(maxsize=None)
def _bilstm2_cp(block_rows: int, interpret: bool, out_dtype_name: str):
    def impl(x, w1, u1, b1, w2, u2, b2):
        return _bilstm2_fused_impl(
            x, w1, u1, b1, w2, u2, b2, block_rows=block_rows,
            interpret=interpret, out_dtype=jnp.dtype(out_dtype_name))

    return rows_partitioned(
        impl, "i t c, a c g, a h g, a g, a d g, a h g, a g -> i t d",
        ("t", "c", "a", "g", "h", "d"))


def bilstm_2layer_fused(x, w_ih1, w_hh1, gate_bias1, w_ih2, w_hh2,
                        gate_bias2, block_rows: int = 96,
                        interpret: bool = False, out_dtype=None):
    """Two stacked bidirectional LSTM layers, one Pallas program:
    x (rows, T, in) → (rows, T, 2H); layer-1 activations never touch HBM.

    Weight conventions match bilstm_layer_fused (direction 0 fwd, 1 rev;
    torch gate order i,f,g,o); biases may be None. 1-pass bf16 only.
    Partition-aware: rows may shard across a mesh (rows_partitioned)."""
    gdim = w_ih1.shape[2]
    gb1 = (gate_bias1 if gate_bias1 is not None
           else jnp.zeros((2, gdim), jnp.float32))
    gb2 = (gate_bias2 if gate_bias2 is not None
           else jnp.zeros((2, gdim), jnp.float32))
    return _bilstm2_cp(block_rows, interpret,
                       jnp.dtype(out_dtype or jnp.bfloat16).name)(
        x, w_ih1, w_hh1, gb1, w_ih2, w_hh2, gb2)


def bilstm_2layer_reference(x, w_ih1, w_hh1, gb1, w_ih2, w_hh2, gb2):
    """Scan-path oracle (f32 HIGHEST), same argument convention."""
    from .pallas_bilstm import bilstm_layer_reference

    mid = bilstm_layer_reference(x, w_ih1, w_hh1, gb1)
    return bilstm_layer_reference(mid, w_ih2, w_hh2, gb2)
