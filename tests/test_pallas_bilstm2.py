"""Fused 2-layer biLSTM kernel (ops/pallas_bilstm2.py, VERDICT r4 #1):
interpret-mode parity + sharding on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _rand(rng, shape, scale):
    return jnp.asarray(rng.normal(0, scale, shape).astype(np.float32))


def _weights(rng, IN, H):
    return (
        _rand(rng, (2, IN, 4 * H), 0.05),      # w_ih1
        _rand(rng, (2, H, 4 * H), 0.05),       # w_hh1
        _rand(rng, (2, 4 * H), 0.05),          # gb1
        _rand(rng, (2, 2 * H, 4 * H), 0.05),   # w_ih2
        _rand(rng, (2, H, 4 * H), 0.05),       # w_hh2
        _rand(rng, (2, 4 * H), 0.05),          # gb2
    )


class TestBilstm2Fused:
    def test_matches_chained_single_layer_kernels_bitwise(self, rng):
        """The fused 2-layer program must be VALUE-IDENTICAL to the
        shipped chain (layer-1 kernel at 1-pass with bf16 staging →
        layer-2 kernel at 1-pass): same bf16 roundings in the same
        places, just without the HBM round trip."""
        from sdfa_tpu.ops.pallas_bilstm import bilstm_layer_fused
        from sdfa_tpu.ops.pallas_bilstm2 import bilstm_2layer_fused

        rows, T, IN, H = 72, 12, 256, 256
        x = _rand(rng, (rows, T, IN), 1.0)
        w1, u1, b1, w2, u2, b2 = _weights(rng, IN, H)

        mid = bilstm_layer_fused(x, w1, u1, b1, block_rows=128,
                                 interpret=True, precise=1,
                                 out_dtype=jnp.bfloat16)
        want = bilstm_layer_fused(mid, w2, u2, b2, block_rows=128,
                                  interpret=True, precise=1)
        got = bilstm_2layer_fused(x, w1, u1, b1, w2, u2, b2,
                                  block_rows=128, interpret=True,
                                  out_dtype=jnp.float32)
        assert got.shape == (rows, T, 2 * H)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_close_to_f32_scan_reference(self, rng):
        """Sanity vs the f32 HIGHEST scan oracle: 1-pass truncation only
        (bounded; the e2e budget is qualified at the pipeline level)."""
        from sdfa_tpu.ops.pallas_bilstm2 import (bilstm_2layer_fused,
                                                 bilstm_2layer_reference)

        rows, T, IN, H = 40, 10, 256, 256
        x = _rand(rng, (rows, T, IN), 1.0)
        w1, u1, b1, w2, u2, b2 = _weights(rng, IN, H)
        ref = bilstm_2layer_reference(x, w1, u1, b1, w2, u2, b2)
        got = bilstm_2layer_fused(x, w1, u1, b1, w2, u2, b2,
                                  block_rows=128, interpret=True,
                                  out_dtype=jnp.float32)
        assert float(jnp.abs(got - ref).max()) < 0.05
        # and not degenerate
        assert float(jnp.abs(got).max()) > 1e-3

    def test_row_padding_and_bf16_out(self, rng):
        from sdfa_tpu.ops.pallas_bilstm2 import bilstm_2layer_fused

        rows, T, IN, H = 50, 8, 256, 256  # rows not a block multiple
        x = _rand(rng, (rows, T, IN), 1.0)
        w1, u1, b1, w2, u2, b2 = _weights(rng, IN, H)
        out = bilstm_2layer_fused(x, w1, u1, b1, w2, u2, b2,
                                  block_rows=32, interpret=True)
        assert out.shape == (rows, T, 2 * H)
        assert out.dtype == jnp.bfloat16
        big = bilstm_2layer_fused(x, w1, u1, b1, w2, u2, b2,
                                  block_rows=128, interpret=True)
        # block size must not change values (each row's math is its own)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(big))

    def test_lstm_module_opt_in_matches_per_layer_path(self, rng,
                                                       monkeypatch):
        """SDFA_PALLAS_BILSTM2=1: the LSTM module routes the whole 2-layer
        stack through the fused program — same param tree, values equal
        to the per-layer fused path (both 1-pass + bf16 staging)."""
        from sdfa_tpu.nn import recurrent

        monkeypatch.setenv("SDFA_LSTM_PASSES", "1")
        mod = recurrent.LSTM(input_size=256, hidden_size=256, num_layers=2,
                             bias=False, bidirectional=True)
        x = _rand(rng, (24, 8, 256), 1.0)
        variables = mod.init(jax.random.PRNGKey(0), x)
        recurrent._FREQ_FUSED_INTERPRET = True
        try:
            want = mod.apply(variables, x)  # per-layer fused kernels
            monkeypatch.setenv("SDFA_PALLAS_BILSTM2", "1")
            v2 = mod.init(jax.random.PRNGKey(0), x)
            assert (jax.tree_util.tree_structure(variables)
                    == jax.tree_util.tree_structure(v2))
            got = mod.apply(variables, x)
        finally:
            recurrent._FREQ_FUSED_INTERPRET = False
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want.astype(got.dtype)))

    def test_partitions_rows_on_mesh(self, rng):
        """rows_partitioned: a rows-sharded jit splits the kernel per
        shard with no resharding of the batch axis."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from sdfa_tpu.ops.pallas_bilstm2 import bilstm_2layer_fused
        from sdfa_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(jax.devices()[:8])
        rows, T, IN, H = 64, 6, 256, 256
        x = _rand(rng, (rows, T, IN), 1.0)
        w1, u1, b1, w2, u2, b2 = _weights(rng, IN, H)

        def fn(x, *w):
            return bilstm_2layer_fused(x, *w, block_rows=16,
                                       interpret=True,
                                       out_dtype=jnp.float32)

        want = fn(x, w1, u1, b1, w2, u2, b2)
        sharded = jax.jit(
            fn,
            in_shardings=(NamedSharding(mesh, P("data")),) + (
                NamedSharding(mesh, P()),) * 6,
            out_shardings=NamedSharding(mesh, P("data")),
        )
        got = sharded(jax.device_put(x, NamedSharding(mesh, P("data"))),
                      w1, u1, b1, w2, u2, b2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)
