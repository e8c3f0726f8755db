"""Recurrent layers: LSTM/GRU stacks, FreqLstm ("spectral gathering").

Reference semantics: torch.nn.LSTM/GRU created by
/root/reference/speech_anime/layers/rnn.py:4-21 (note bias=False default!)
and FreqLstm /root/reference/speech_anime/layers/freq_lstm.py:5-67.

TPU-first: the input projection x·Wihᵀ for the whole sequence is one large
matmul before the scan; the scan carries only h·Whhᵀ (B,H)·(H,4H).  FreqLstm
folds B·T into the matmul batch (the reference does the same reshape), so the
frequency scan of 32 steps runs with a few-thousand-row batch — MXU-shaped.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .precision import MODEL_PREC as _PREC


_SCAN_UNROLL = 1  # >1 balloons compile time over the remote tunnel without speedup

import os as _os

# tests set this to run the fused Pallas kernels in interpret mode on CPU
_FREQ_FUSED_INTERPRET = False

# tests set this to run the fused TRAINING core in interpret mode on CPU
_TRAIN_FUSED_INTERPRET = False


def _pallas_train_eligible(env_name: str) -> bool:
    """Gating for the fused biLSTM training core (custom VJP,
    ops/pallas_bilstm_train.py). Hardware-qualified round 3
    (tools/qualify_train_kernel.py: 88.6 vs 96.7 ms/step at batch 100
    windows, 5-step loss trajectory within 1e-6 rel) → default ON for
    TPU training; env=0 restores the scan path. Partition-aware: a
    sharded train step splits the rows axis and runs the kernels per
    shard."""
    if _TRAIN_FUSED_INTERPRET:
        return True
    if _os.environ.get(env_name, "1") != "1":
        return False
    return jax.default_backend() == "tpu"


def _lstm_passes() -> int:
    """bf16 passes per matmul inside the fused INFERENCE LSTM kernels
    (SDFA_LSTM_PASSES ∈ {1,2,3}; 3 = hi/lo split both operands, 2 splits
    only the weight operand, 1 = plain bf16 products).

    Default 1, qualified end-to-end (DESIGN §12.6-12.7): the suffix's
    PCA bottleneck + deformation solve contract the recurrence
    truncation ~4 orders — full-pipeline sim 3.50e-7 m vs the f32 scan
    oracle (passes=3: 2.98e-7), and on hardware the trained-checkpoint
    f64-oracle parity is unchanged (2.61e-6 vs 2.59e-6 m) while the
    64-clip serving headline moves 812→1056× realtime (+30%).
    SDFA_LSTM_PASSES=3 restores the split-accumulation kernels; the
    bench realism line re-checks trained parity every hardware run.
    Training kernels are unaffected (their VJP stays 3-pass)."""
    return int(_os.environ.get("SDFA_LSTM_PASSES", "1"))


def _pallas_inference_eligible(training: bool, env_name: str) -> bool:
    """Shared gating for the fused inference kernels: no autodiff rule →
    training keeps the scan path. Multi-chip is fine: the kernels are
    partition-aware (``ops.pallas_freq_lstm.rows_partitioned`` declares
    rows-batch parallelism to GSPMD/Shardy, so a sharded jit splits the
    rows axis and runs the kernel per shard). env=0 disables, env=1
    forces (any TPU), default "auto" = any TPU inference."""
    if training:
        return False
    if _FREQ_FUSED_INTERPRET:
        return True
    flag = _os.environ.get(env_name, "auto")
    if flag == "0":
        return False
    return jax.default_backend() == "tpu"


def _run_lstm(x_proj, w_hh, bias_sum, hidden_size, reverse=False):
    # single-direction path (GRU-less stacks, odd layer widths); the fused
    # bidirectional kernels (ops/pallas_bilstm.py, f32 accumulation) are
    # selected one level up in LstmStack/FreqLstm.
    return _lstm_scan(x_proj, w_hh, bias_sum, hidden_size, reverse=reverse)


def _lstm_scan(x_proj, w_hh, b, hidden_size: int, reverse: bool = False):
    """x_proj: (B, T, 4H) precomputed input projection; returns (B, T, H).

    Gate order follows torch: i, f, g, o.
    """
    bsz = x_proj.shape[0]
    h0 = jnp.zeros((bsz, hidden_size), x_proj.dtype)
    c0 = jnp.zeros((bsz, hidden_size), x_proj.dtype)

    def step(carry, xt):
        h, c = carry
        gates = xt + jnp.matmul(h, w_hh, precision=_PREC)
        if b is not None:
            gates = gates + b
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    xs = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 4H)
    (_, _), hs = jax.lax.scan(step, (h0, c0), xs, reverse=reverse,
                              unroll=_SCAN_UNROLL)
    return jnp.swapaxes(hs, 0, 1)  # (B, T, H)


def _lstm_scan_bidir(x_proj_f, x_proj_r, w_hh_f, w_hh_r, b_f, b_r, hidden_size: int):
    """Both directions in ONE scan: the reverse stream runs on time-flipped
    projections, gate matmuls batch over a leading direction axis — half the
    sequential scan steps of two separate scans (TPU: scan steps serialize)."""
    bsz, t, gdim = x_proj_f.shape
    xs = jnp.stack([
        jnp.swapaxes(x_proj_f, 0, 1),                      # (T, B, 4H)
        jnp.swapaxes(jnp.flip(x_proj_r, axis=1), 0, 1),
    ], axis=1)  # (T, 2, B, 4H)
    w_hh = jnp.stack([w_hh_f, w_hh_r])  # (2, H, 4H)
    bias = jnp.stack([b_f, b_r]) if b_f is not None else None  # (2, 4H)
    h0 = jnp.zeros((2, bsz, hidden_size), x_proj_f.dtype)
    c0 = jnp.zeros((2, bsz, hidden_size), x_proj_f.dtype)

    def step(carry, xt):
        h, c = carry
        gates = xt + jnp.einsum("dbh,dhg->dbg", h, w_hh, precision=_PREC)
        if b_f is not None:
            gates = gates + bias[:, None, :]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    (_, _), hs = jax.lax.scan(step, (h0, c0), xs, unroll=_SCAN_UNROLL)
    # hs: (T, 2, B, H) → fwd (B,T,H) + rev unflipped (B,T,H)
    fwd = jnp.swapaxes(hs[:, 0], 0, 1)
    rev = jnp.flip(jnp.swapaxes(hs[:, 1], 0, 1), axis=1)
    return jnp.concatenate([fwd, rev], axis=-1)


def _gru_scan(x_proj, w_hh, b_hh, hidden_size: int, reverse: bool = False):
    """torch GRU gate order r, z, n; n-gate uses r·(h·Whn + bhn)."""
    bsz = x_proj.shape[0]
    h0 = jnp.zeros((bsz, hidden_size), x_proj.dtype)

    def step(h, xt):
        hh = jnp.matmul(h, w_hh, precision=_PREC)
        if b_hh is not None:
            hh = hh + b_hh
        xr, xz, xn = jnp.split(xt, 3, axis=-1)
        hr, hz, hn = jnp.split(hh, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h = (1.0 - z) * n + z * h
        return h, h

    xs = jnp.swapaxes(x_proj, 0, 1)
    _, hs = jax.lax.scan(step, h0, xs, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)


class _RNNBase(nn.Module):
    input_size: int = 0
    hidden_size: int = 0
    num_layers: int = 1
    bias: bool = False  # reference rnn.py defaults bias=False
    batch_first: bool = True
    dropout: float = 0.0
    bidirectional: bool = False

    n_gates = 4  # overridden

    def _gate_params(self, layer: int, direction: int, in_size: int):
        import math

        n = self.n_gates * self.hidden_size
        stdv = 1.0 / math.sqrt(self.hidden_size)

        def uni(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -stdv, stdv)

        sfx = f"_l{layer}" + ("_reverse" if direction else "")
        w_ih = self.param(f"w_ih{sfx}", uni, (in_size, n))
        w_hh = self.param(f"w_hh{sfx}", uni, (self.hidden_size, n))
        b = None
        if self.bias:
            b_ih = self.param(f"b_ih{sfx}", uni, (n,))
            b_hh = self.param(f"b_hh{sfx}", uni, (n,))
            b = (b_ih, b_hh)
        return w_ih, w_hh, b

    def _layer_dropout(self, x, training: bool):
        if self.dropout <= 0.0 or not training:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.dropout
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)


class LSTM(_RNNBase):
    """Multi-layer (bi)LSTM over time; input (B, T, C) → (B, T, H·dirs).

    ``return_params=True`` creates the parameters (same names, same
    order — checkpoint-tree identical) and returns them WITHOUT running
    the scans: ``{(layer, dir): (w_ih, w_hh, bias_sum)}``. Used by fused
    kernels (ops/pallas_freq_lstm.py) that consume the weights directly.
    """

    n_gates = 4

    def _use_2layer_fused(self, training: bool, return_params: bool) -> bool:
        """Whole-stack fusion (ops/pallas_bilstm2.py): both biLSTM layers
        in one Pallas program, inter-layer stack VMEM-resident. 1-pass
        inference only (bf16 weights in VMEM); value-identical to the
        chained per-layer kernels (tests/test_pallas_bilstm2.py).

        DEFAULT ON since round 5's hardware A/B (DESIGN §13.5): speed-
        neutral in the serving pipeline (1758.34× vs 1753.31× at 128
        clips) but it deletes the two (T, rows, 2H) inter-layer HBM
        stacks — 8.62 GB each at 256 clips — which erases the round-4
        256-clip batch cliff (1565.8× → 1758.51×,
        artifacts/batch_scaling_r5/). SDFA_PALLAS_BILSTM2=0 restores
        the chained per-layer kernels."""
        return (self.num_layers == 2 and self.bidirectional
                and not return_params and not training
                and self.input_size % 128 == 0 and self.hidden_size % 128 == 0
                and _lstm_passes() == 1
                and _os.environ.get("SDFA_PALLAS_BILSTM2", "1") == "1"
                and _pallas_inference_eligible(training,
                                               "SDFA_PALLAS_BILSTM"))

    @nn.compact
    def __call__(self, x, training: bool = False, return_params: bool = False):
        assert self.batch_first, "only batch_first layout is used"
        out = x
        dirs = 2 if self.bidirectional else 1
        params = {}
        if self._use_2layer_fused(training, return_params):
            from ..ops.pallas_bilstm2 import bilstm_2layer_fused

            lw = []
            for layer in range(2):
                in_size = self.input_size if layer == 0 else 2 * self.hidden_size
                dir_p = [self._gate_params(layer, d, in_size)
                         for d in range(2)]
                lw.append((
                    jnp.stack([p[0] for p in dir_p]),
                    jnp.stack([p[1] for p in dir_p]),
                    None if dir_p[0][2] is None else jnp.stack(
                        [p[2][0] + p[2][1] for p in dir_p]),
                ))
            stage_last = _os.environ.get("SDFA_LSTM_STAGE_BF16_LAST",
                                         "1") == "1"
            return bilstm_2layer_fused(
                out, lw[0][0], lw[0][1], lw[0][2],
                lw[1][0], lw[1][1], lw[1][2],
                # blk 128, NOT the sweep's fastest point (192, §13.5:
                # 96/128/160/192 → 116.0/115.8/124.1/111.9 ms): blk 192's
                # VMEM footprint (12.58 M stack + 5.24 M bf16 weights =
                # 17.8 M) sits ABOVE the 16 M scoped-vmem limit and only
                # compiled when the tunnel helper took its permissive
                # path — the strict AOT path rejects it (observed on the
                # r5 streaming-capacity compile). blk 128 (13.6 M) fits
                # the limit everywhere at a ~0.3% in-pipeline cost.
                block_rows=int(_os.environ.get("SDFA_BILSTM2_BLOCK", "128")),
                interpret=_FREQ_FUSED_INTERPRET,
                out_dtype=jnp.bfloat16 if stage_last else jnp.float32)
        for layer in range(self.num_layers):
            in_size = self.input_size if layer == 0 else self.hidden_size * dirs
            # NOTE: a fused both-directions-in-one-scan variant (batched
            # d=2 einsum per step) measured 25-40% SLOWER on v5e — the tiny
            # batched matmul lowers off the MXU fast path. Keep separate
            # direction scans with one shared input projection — or, at
            # inference on single-chip TPU, the fused Pallas layer kernel
            # (both directions in one VMEM-resident program,
            # ops/pallas_bilstm.py; in_size must be lane-aligned).
            # in_size AND hidden must be lane-aligned: the kernel slices
            # gate columns at multiples of hidden on the 128-lane axis
            # (Mosaic rejects unaligned lane slices at compile time —
            # fall back to the scan path instead of failing at serving)
            fused = (dirs == 2 and not return_params and in_size % 128 == 0
                     and self.hidden_size % 128 == 0
                     and _pallas_inference_eligible(training,
                                                    "SDFA_PALLAS_BILSTM"))
            # training: the differentiable fused recurrent core (custom
            # VJP); consumes the XLA-side input projections, so the input
            # width is unconstrained — covers FreqLstm (in=3) too. hidden
            # itself must stay 128-aligned: the kernel lane-slices the h
            # output at d*hidden (pallas_bilstm_train.py h_dma/dout_dma)
            fused_train = (dirs == 2 and not return_params and training
                           and self.hidden_size % 128 == 0
                           and _pallas_train_eligible("SDFA_PALLAS_LSTM_TRAIN"))
            outs = []
            dir_params = []
            for direction in range(dirs):
                w_ih, w_hh, b = self._gate_params(layer, direction, in_size)
                bias_sum = None if b is None else (b[0] + b[1])
                if return_params:
                    params[(layer, direction)] = (w_ih, w_hh, bias_sum)
                    continue
                if fused or fused_train:
                    dir_params.append((w_ih, w_hh, bias_sum))
                    continue
                x_proj = jnp.matmul(out, w_ih, precision=_PREC)
                outs.append(_run_lstm(x_proj, w_hh, bias_sum, self.hidden_size,
                                      reverse=bool(direction)))
            if return_params:
                continue
            if fused:
                from ..ops.pallas_bilstm import bilstm_layer_fused

                w_ih2 = jnp.stack([dir_params[0][0], dir_params[1][0]])
                w_hh2 = jnp.stack([dir_params[0][1], dir_params[1][1]])
                gb2 = (None if dir_params[0][2] is None
                       else jnp.stack([dir_params[0][2], dir_params[1][2]]))
                # INTER-layer staging in bf16 (1-pass mode only, where it
                # is value-identical: the next layer's _dot_f32 rounds its
                # activation operand to bf16 regardless — the rounding
                # just moves from the read to the write). Halves the
                # (rows, T, 2H) stacks that cap the serving batch
                # (artifacts/batch_scaling_r4/). SDFA_LSTM_STAGE_BF16=0
                # opts out. The LAST layer's staging is NOT value-
                # identical (attention consumes it at MODEL_PREC), so it
                # was hardware-qualified like the 1-pass default before
                # becoming one: 1671.5× vs 1646.8× realtime at the
                # 128-clip serving batch with the trained f64-oracle
                # parity unchanged (2.57e-6 vs 2.61e-6 m) — see
                # artifacts/batch_scaling_r4/bench_128clips_last_bf16.
                # SDFA_LSTM_STAGE_BF16_LAST=0 restores the f32 stack.
                stage_bf16 = (_lstm_passes() == 1
                              and _os.environ.get(
                                  "SDFA_LSTM_STAGE_BF16", "1") == "1"
                              and (layer < self.num_layers - 1
                                   or _os.environ.get(
                                       "SDFA_LSTM_STAGE_BF16_LAST",
                                       "1") == "1"))
                out = bilstm_layer_fused(
                    out, w_ih2, w_hh2, gb2,
                    # r5 probe (artifacts/suffix_probe_r5/): per-step
                    # fixed overhead ≈ 2× the matmul time at blk=256 —
                    # bigger row blocks amortize it (VMEM-bounded)
                    block_rows=int(_os.environ.get("SDFA_BILSTM_BLOCK",
                                                   "256")),
                    interpret=_FREQ_FUSED_INTERPRET,
                    precise=_lstm_passes(),
                    out_dtype=jnp.bfloat16 if stage_bf16 else None)
            elif fused_train:
                from ..ops.pallas_bilstm_train import bilstm_core

                xps = []
                for w_ih, _w_hh, bias_sum in dir_params:
                    xp = jnp.matmul(out, w_ih, precision=_PREC)
                    if bias_sum is not None:
                        xp = xp + bias_sum
                    xps.append(jnp.swapaxes(xp, 0, 1))  # (T, B, 4H)
                core_out = bilstm_core(
                    jnp.stack(xps),
                    jnp.stack([p[1] for p in dir_params]),
                    interpret=_TRAIN_FUSED_INTERPRET)
                out = jnp.swapaxes(core_out, 0, 1)  # (B, T, 2H)
            else:
                out = jnp.concatenate(outs, axis=-1) if dirs == 2 else outs[0]
            if layer < self.num_layers - 1:
                out = self._layer_dropout(out, training)
        return params if return_params else out


class GRU(_RNNBase):
    n_gates = 3

    @nn.compact
    def __call__(self, x, training: bool = False):
        assert self.batch_first
        out = x
        dirs = 2 if self.bidirectional else 1
        for layer in range(self.num_layers):
            in_size = self.input_size if layer == 0 else self.hidden_size * dirs
            outs = []
            for direction in range(dirs):
                w_ih, w_hh, b = self._gate_params(layer, direction, in_size)
                x_proj = jnp.matmul(out, w_ih, precision=_PREC)
                if b is not None:
                    x_proj = x_proj + b[0]
                outs.append(
                    _gru_scan(x_proj, w_hh, None if b is None else b[1],
                              self.hidden_size, reverse=bool(direction))
                )
            out = jnp.concatenate(outs, axis=-1) if dirs == 2 else outs[0]
            if layer < self.num_layers - 1:
                out = self._layer_dropout(out, training)
        return out


class FreqLstm(nn.Module):
    """Bidirectional LSTM along the *frequency* axis — "spectral gathering".

    Input (B, C, F, T) → per-timestep biLSTM over F, concat all F outputs
    (mode="full") → FC to output_size → (B, C_out, 1, T)
    (reference: freq_lstm.py:5-67).
    """

    input_size: int = 0
    freq_length: int = 0
    hidden_size: int = 128
    output_size: int = 256
    bias: bool = True
    mode: str = "full"

    def _use_fused(self, training: bool) -> bool:
        """Fused-kernel eligibility ("full" mode only). Default ON for
        single-chip TPU inference after hardware qualification (v5e: 1.6×
        at 6400 rows, 3.6× at the 13184-row serving batch vs the scan
        path, parity 1.2e-5 — DESIGN.md §9); SDFA_PALLAS_FREQ_LSTM=0
        opts out."""
        return (self.mode == "full"
                # kernel alignment: gate columns slice the 128-lane axis
                # at multiples of hidden; the (C, blk) input DMA tile puts
                # channels on sublanes (8-aligned) — unaligned configs
                # fall back to the scan path rather than failing Mosaic
                and self.hidden_size % 128 == 0
                and self.input_size % 8 == 0
                and _pallas_inference_eligible(training,
                                               "SDFA_PALLAS_FREQ_LSTM"))

    @nn.compact
    def __call__(self, x, training: bool = False):
        from .layers import FullyConnected

        dim4 = x.ndim == 4
        if dim4:
            bsz, ch, fq, t = x.shape
            # (B, C, F, T) → (B·T, F, C)
            x = jnp.transpose(x, (0, 3, 2, 1)).reshape(bsz * t, fq, ch)
        else:
            bsz, ch, fq = x.shape
            t = 1
            x = jnp.transpose(x, (0, 2, 1))
        assert fq == self.freq_length, f"expected {self.freq_length} freq bins, got {fq}"

        lstm = LSTM(
            input_size=self.input_size,
            hidden_size=self.hidden_size,
            num_layers=1,
            bias=self.bias,
            bidirectional=True,
            name="lstm",
        )
        proj_in = (self.freq_length * 2 * self.hidden_size
                   if self.mode == "full" else 2 * self.hidden_size)
        proj = FullyConnected(in_channels=proj_in, out_channels=self.output_size,
                              bias=self.bias, name="proj")

        if self._use_fused(training):
            # fully-fused Pallas kernel: input proj + both freq scans +
            # output proj in one program, F·2H concat never materialized
            # (ops/pallas_freq_lstm.py; the profiled #1 target, DESIGN §9)
            from ..ops.pallas_freq_lstm import freq_lstm_fused

            lp = lstm(x, return_params=True)
            w_ih = jnp.stack([lp[(0, 0)][0], lp[(0, 1)][0]])
            w_hh = jnp.stack([lp[(0, 0)][1], lp[(0, 1)][1]])
            gb = (None if lp[(0, 0)][2] is None
                  else jnp.stack([lp[(0, 0)][2], lp[(0, 1)][2]]))
            w_proj, b_proj = proj(None, return_params=True)
            out = freq_lstm_fused(
                x, w_ih, w_hh, gb, w_proj, b_proj,
                # same per-step-overhead lever as SDFA_BILSTM_BLOCK
                # (DESIGN §13.2); default matches the kernel's (HLO-
                # identical, compile-cache-safe)
                block_rows=int(_os.environ.get("SDFA_FREQ_BLOCK", "512")),
                interpret=_FREQ_FUSED_INTERPRET,
                precise=_lstm_passes(),
            ).reshape(bsz, t, self.output_size)
        else:
            h = lstm(x, training=training)  # (B·T, F, 2H)
            if self.mode == "full":
                h = h.reshape(bsz * t, proj_in)
            else:  # "last": final states of both directions
                h = jnp.concatenate(
                    [h[:, -1, : self.hidden_size], h[:, 0, self.hidden_size :]],
                    axis=-1)
            out = proj(h, training=training).reshape(bsz, t, self.output_size)
        out = jnp.transpose(out, (0, 2, 1))  # (B, C, T)
        return out[:, :, None, :] if dim4 else out


class LSTM2d(nn.Module):
    """Alternating freq-axis/time-axis biLSTM layers with residuals
    (reference: speech_anime/layers/lstm2d.py:4-50; unused in shipped configs)."""

    input_size: int = 0
    hidden_size: int = 0
    num_layers: int = 2
    bias: bool = True

    @nn.compact
    def __call__(self, x, training: bool = False):
        # x: (B, C, F, T)
        bsz, ch, fq, t = x.shape
        out = x
        size = self.input_size
        for layer in range(self.num_layers):
            axis_is_freq = layer % 2 == 0
            lstm = LSTM(
                input_size=size,
                hidden_size=self.hidden_size,
                num_layers=1,
                bias=self.bias,
                bidirectional=True,
                name=f"lstm_{layer}",
            )
            if axis_is_freq:
                seq = jnp.transpose(out, (0, 3, 2, 1)).reshape(bsz * t, fq, size)
                h = lstm(seq, training=training)
                h = h.reshape(bsz, t, fq, -1).transpose(0, 3, 2, 1)
            else:
                seq = jnp.transpose(out, (0, 2, 3, 1)).reshape(bsz * fq, t, size)
                h = lstm(seq, training=training)
                h = h.reshape(bsz, fq, t, -1).transpose(0, 3, 1, 2)
            if h.shape == out.shape:
                h = h + out
            out = h
            size = 2 * self.hidden_size
        return out
