"""Fused biLSTM *training* core (ops/pallas_bilstm_train.py): forward and
custom-VJP gradient parity vs the lax.scan oracle's autodiff, in interpret
mode on CPU. Covers both flagship shapes: the temporal biLSTM (H=256) and
the FreqLstm core (H=128, 32 steps)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdfa_tpu.ops.pallas_bilstm_train import (bilstm_core,
                                              bilstm_core_reference)


def _rand(key, *shape, scale=0.5):
    return scale * jax.random.normal(key, shape, jnp.float32)


def _make(seq_len, rows, hidden, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 2)
    xp = _rand(ks[0], 2, seq_len, rows, 4 * hidden)
    w_hh = _rand(ks[1], 2, hidden, 4 * hidden, scale=1.0 / np.sqrt(hidden))
    return xp, w_hh


@pytest.mark.parametrize("seq_len,rows,hidden", [
    (64, 12, 256),   # temporal biLSTM shape (rows pad 12 → 128)
    (32, 136, 128),  # FreqLstm core shape (rows pad 136 → 256)
    (1, 8, 128),     # degenerate single step
])
def test_forward_parity(seq_len, rows, hidden):
    xp, w_hh = _make(seq_len, rows, hidden)
    got = bilstm_core(xp, w_hh, interpret=True)
    want = bilstm_core_reference(xp, w_hh)
    assert got.shape == (seq_len, rows, 2 * hidden)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("seq_len,rows,hidden", [
    (16, 12, 256),
    (32, 24, 128),
])
def test_grad_parity(seq_len, rows, hidden):
    xp, w_hh = _make(seq_len, rows, hidden, seed=3)
    # a non-trivial scalar loss touching every output element unevenly
    key = jax.random.PRNGKey(9)
    w_out = jax.random.normal(key, (seq_len, rows, 2 * hidden), jnp.float32)

    def loss_fused(xp, w_hh):
        return jnp.sum(w_out * bilstm_core(xp, w_hh, interpret=True))

    def loss_ref(xp, w_hh):
        return jnp.sum(w_out * bilstm_core_reference(xp, w_hh))

    (lf, gf) = jax.value_and_grad(loss_fused, argnums=(0, 1))(xp, w_hh)
    (lr, gr) = jax.value_and_grad(loss_ref, argnums=(0, 1))(xp, w_hh)
    np.testing.assert_allclose(lf, lr, rtol=1e-5)
    # gradient magnitudes vary over ~4 orders through the recurrence;
    # compare with a scale-aware tolerance
    for got, want, name in [(gf[0], gr[0], "d_xp"), (gf[1], gr[1], "d_w_hh")]:
        scale = float(np.max(np.abs(want))) + 1e-12
        np.testing.assert_allclose(
            got, want, atol=3e-5 * scale, rtol=2e-4,
            err_msg=f"gradient mismatch: {name}")


def _module_grads(module, x, training=True, seed=0):
    rng = jax.random.PRNGKey(seed)
    variables = module.init({"params": rng, "dropout": rng}, x, training)

    def loss(params, x):
        out = module.apply({"params": params}, x, training,
                           rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.mean(out ** 2)

    val, grads = jax.value_and_grad(loss)(variables["params"], x)
    return val, grads


class TestModuleIntegration:
    """LSTM / FreqLstm modules: the fused training core (interpret mode)
    must match the scan path's loss and gradients."""

    def _compare(self, module, x, tol=3e-5):
        from sdfa_tpu.nn import recurrent

        val_ref, g_ref = _module_grads(module, x)
        recurrent._TRAIN_FUSED_INTERPRET = True
        try:
            val_fused, g_fused = _module_grads(module, x)
        finally:
            recurrent._TRAIN_FUSED_INTERPRET = False
        np.testing.assert_allclose(val_fused, val_ref, rtol=1e-5)
        flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
        flat_fused = dict(jax.tree_util.tree_leaves_with_path(g_fused))
        for path, want in flat_ref:
            got = flat_fused[path]
            scale = float(np.max(np.abs(want))) + 1e-12
            np.testing.assert_allclose(
                got, want, atol=tol * scale, rtol=5e-4,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")

    def test_bilstm_module(self):
        from sdfa_tpu.nn.recurrent import LSTM

        module = LSTM(input_size=128, hidden_size=128, num_layers=2,
                      bias=False, bidirectional=True, dropout=0.3)
        x = _rand(jax.random.PRNGKey(5), 6, 16, 128)
        self._compare(module, x)

    def test_freq_lstm_module(self):
        from sdfa_tpu.nn.recurrent import FreqLstm

        module = FreqLstm(input_size=3, freq_length=16, hidden_size=128,
                          output_size=64)
        x = _rand(jax.random.PRNGKey(6), 2, 3, 16, 5)  # (B, C, F, T)
        self._compare(module, x)


class TestShardedPartitioning:
    """The training core is partition-aware: under a sharded jit the rows
    axis splits across the mesh in BOTH the forward and the BPTT kernel
    (no replicated fallback), and value + grads match the unsharded run."""

    def test_core_partitions_rows_fwd_and_bwd(self, monkeypatch):
        from jax.sharding import PartitionSpec as P

        from sdfa_tpu.ops import pallas_bilstm_train as pbt
        from sdfa_tpu.parallel import mesh as mesh_lib

        seq_len, rows, hidden = 8, 64, 128
        xp, w_hh = _make(seq_len, rows, hidden, seed=5)

        def loss(xp, w_hh):
            return jnp.sum(jnp.tanh(
                pbt.bilstm_core(xp, w_hh, interpret=True)))

        want_val, want_grads = jax.value_and_grad(
            loss, argnums=(0, 1))(xp, w_hh)

        fwd_shapes, bwd_shapes = [], []
        orig_fwd, orig_bwd = pbt._fwd_impl, pbt._bwd_impl

        def spy_fwd(xp, *a, **k):
            fwd_shapes.append(xp.shape)
            return orig_fwd(xp, *a, **k)

        def spy_bwd(gates, *a, **k):
            bwd_shapes.append(gates.shape)
            return orig_bwd(gates, *a, **k)

        monkeypatch.setattr(pbt, "_fwd_impl", spy_fwd)
        monkeypatch.setattr(pbt, "_bwd_impl", spy_bwd)

        mesh = mesh_lib.make_mesh()
        assert mesh.devices.size == 8
        rows_sh = jax.NamedSharding(mesh, P(None, None, "data", None))
        repl = mesh_lib.replicated(mesh)

        fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)),
                     in_shardings=(rows_sh, repl))
        got_val, got_grads = fn(jax.device_put(xp, rows_sh),
                                jax.device_put(w_hh, repl))
        np.testing.assert_allclose(got_val, want_val, rtol=1e-5)
        for got, want in zip(got_grads, want_grads):
            scale = float(np.max(np.abs(want))) + 1e-12
            np.testing.assert_allclose(np.asarray(got), want,
                                       atol=3e-5 * scale, rtol=5e-4)
        # both kernels must have traced at the LOCAL row count (rows/8)
        assert (2, seq_len, rows // 8, 4 * hidden) in fwd_shapes, fwd_shapes
        assert (2, seq_len, rows // 8, 4 * hidden) in bwd_shapes, bwd_shapes


def test_grad_matches_jacobian_direction():
    """Directional-derivative check independent of the oracle: f(x+εv)
    numerics vs ⟨∇f, v⟩ from the custom VJP."""
    xp, w_hh = _make(8, 8, 128, seed=7)

    def loss(xp, w_hh):
        out = bilstm_core(xp, w_hh, interpret=True)
        return jnp.sum(jnp.tanh(out))

    g_xp, g_w = jax.grad(loss, argnums=(0, 1))(xp, w_hh)
    key = jax.random.PRNGKey(11)
    v_xp = jax.random.normal(key, xp.shape, jnp.float32)
    v_w = jax.random.normal(jax.random.fold_in(key, 1), w_hh.shape,
                            jnp.float32)
    eps = 1e-3
    f0 = loss(xp - eps * v_xp, w_hh - eps * v_w)
    f1 = loss(xp + eps * v_xp, w_hh + eps * v_w)
    fd = (f1 - f0) / (2 * eps)
    an = jnp.sum(g_xp * v_xp) + jnp.sum(g_w * v_w)
    np.testing.assert_allclose(fd, an, rtol=2e-3)
