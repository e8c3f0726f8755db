"""Fused FreqLstm Pallas kernel (ops/pallas_freq_lstm.py) — interpret-mode
parity on CPU. Hardware qualification happens via SDFA_PALLAS_FREQ_LSTM=1
on the real chip (numbers recorded in DESIGN.md §9)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdfa_tpu.nn import recurrent
from sdfa_tpu.ops.pallas_freq_lstm import freq_lstm_fused, freq_lstm_reference


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _rand(rng, shape, scale=0.1):
    return jnp.asarray(rng.normal(0, scale, shape).astype(np.float32))


class TestKernelParity:
    def test_matches_reference_scan(self, rng):
        rows, F, C, H, OUT = 300, 32, 64, 128, 256
        x = _rand(rng, (rows, F, C), 1.0)
        w_ih = _rand(rng, (2, C, 4 * H))
        w_hh = _rand(rng, (2, H, 4 * H))
        gb = _rand(rng, (2, 4 * H))
        w_proj = _rand(rng, (F * 2 * H, OUT), 0.02)
        b_proj = _rand(rng, (OUT,))
        ref = freq_lstm_reference(x, w_ih, w_hh, gb, w_proj, b_proj)
        out = freq_lstm_fused(x, w_ih, w_hh, gb, w_proj, b_proj,
                              block_rows=128, interpret=True)
        # f32-accumulating 3-pass matmuls: far inside the 1e-4 serving
        # budget (VERDICT r2 weak #2 — the old time-LSTM kernel was 2.4e-3)
        assert float(jnp.abs(out - ref).max()) < 2e-5

    def test_no_bias(self, rng):
        rows, F, C, H, OUT = 130, 8, 64, 128, 256
        x = _rand(rng, (rows, F, C), 1.0)
        w_ih = _rand(rng, (2, C, 4 * H))
        w_hh = _rand(rng, (2, H, 4 * H))
        w_proj = _rand(rng, (F * 2 * H, OUT), 0.02)
        ref = freq_lstm_reference(x, w_ih, w_hh, None, w_proj, None)
        out = freq_lstm_fused(x, w_ih, w_hh, None, w_proj, None,
                              block_rows=128, interpret=True)
        assert float(jnp.abs(out - ref).max()) < 2e-5

    def test_block_alignment(self):
        """Mosaic slice alignment: the freq kernel slices rows on the
        128-lane axis, the time kernels on the 8-sublane axis. A 192-row
        pool batch (StreamingServer N=12·emit 16) used to pick blk=192
        and fail Mosaic compile ("must be aligned to tiling (128)")."""
        from sdfa_tpu.ops.pallas_freq_lstm import row_block
        assert row_block(192, 512, align=128) == 256
        assert row_block(128, 512, align=128) == 128
        assert row_block(13184, 512, align=128) == 512
        assert row_block(50, 512, align=128) == 128
        assert row_block(132, 256, align=8) == 136
        assert row_block(13, 512, align=8, floor=8) == 16
        for rows in (1, 100, 192, 640, 5000):
            assert row_block(rows, 512, align=128) % 128 == 0
            assert row_block(rows, 256, align=8) % 8 == 0

    def test_unaligned_pool_rows(self, rng):
        """rows=192 (the failing server shape) end-to-end in interpret."""
        rows, F, C, H, OUT = 192, 4, 64, 128, 256
        x = _rand(rng, (rows, F, C), 1.0)
        w_ih = _rand(rng, (2, C, 4 * H))
        w_hh = _rand(rng, (2, H, 4 * H))
        w_proj = _rand(rng, (F * 2 * H, OUT), 0.02)
        out = freq_lstm_fused(x, w_ih, w_hh, None, w_proj, None,
                              interpret=True)
        assert out.shape == (rows, OUT)
        ref = freq_lstm_reference(x, w_ih, w_hh, None, w_proj, None)
        assert float(jnp.abs(out - ref).max()) < 2e-5

    def test_row_padding(self, rng):
        """rows not a block multiple: padded rows must not leak."""
        rows, F, C, H, OUT = 200, 4, 64, 128, 256
        x = _rand(rng, (rows, F, C), 1.0)
        w_ih = _rand(rng, (2, C, 4 * H))
        w_hh = _rand(rng, (2, H, 4 * H))
        w_proj = _rand(rng, (F * 2 * H, OUT), 0.02)
        out = freq_lstm_fused(x, w_ih, w_hh, None, w_proj, None,
                              block_rows=128, interpret=True)
        assert out.shape == (rows, OUT)
        ref = freq_lstm_reference(x, w_ih, w_hh, None, w_proj, None)
        assert float(jnp.abs(out - ref).max()) < 2e-5


class TestShardedPartitioning:
    """rows_partitioned: under a sharded jit the fused kernels split the
    rows axis across the mesh and run per shard (no fallback to a
    replicated whole-batch call), matching the unsharded reference."""

    def test_freq_kernel_partitions_rows(self, rng, monkeypatch):
        from jax.sharding import PartitionSpec as P

        from sdfa_tpu.ops import pallas_freq_lstm as pfl
        from sdfa_tpu.parallel import mesh as mesh_lib

        rows, F, C, H, OUT = 256, 4, 64, 128, 256
        x = _rand(rng, (rows, F, C), 1.0)
        w_ih = _rand(rng, (2, C, 4 * H))
        w_hh = _rand(rng, (2, H, 4 * H))
        gb = _rand(rng, (2, 4 * H))
        w_proj = _rand(rng, (F * 2 * H, OUT), 0.02)
        b_proj = _rand(rng, (OUT,))
        ref = freq_lstm_reference(x, w_ih, w_hh, gb, w_proj, b_proj)

        seen = []
        orig = pfl._freq_fused_impl

        def spy(xx, *a, **k):
            seen.append(xx.shape)
            return orig(xx, *a, **k)

        # the cp closure resolves _freq_fused_impl globally at call time
        monkeypatch.setattr(pfl, "_freq_fused_impl", spy)

        mesh = mesh_lib.make_mesh()
        assert mesh.devices.size == 8
        batch = mesh_lib.batch_sharding(mesh)
        repl = mesh_lib.replicated(mesh)

        fn = jax.jit(
            lambda *args: freq_lstm_fused(*args, interpret=True),
            in_shardings=(batch, repl, repl, repl, repl, repl),
            out_shardings=batch)
        out = fn(jax.device_put(x, batch), *(
            jax.device_put(w, repl) for w in (w_ih, w_hh, gb, w_proj, b_proj)))
        assert out.sharding.is_equivalent_to(batch, out.ndim)
        assert float(jnp.abs(out - ref).max()) < 2e-5
        # the partition lowering must have traced the kernel at the LOCAL
        # row count (rows/8), proving the rows axis actually split
        assert (rows // 8, F, C) in seen, seen

    def test_bilstm_kernel_partitions_rows(self, rng):
        from sdfa_tpu.ops.pallas_bilstm import (bilstm_layer_fused,
                                                bilstm_layer_reference)
        from sdfa_tpu.parallel import mesh as mesh_lib

        rows, T, IN, H = 128, 6, 256, 256
        x = _rand(rng, (rows, T, IN), 1.0)
        w_ih = _rand(rng, (2, IN, 4 * H), 0.05)
        w_hh = _rand(rng, (2, H, 4 * H), 0.05)
        gb = _rand(rng, (2, 4 * H), 0.05)
        ref = bilstm_layer_reference(x, w_ih, w_hh, gb)

        mesh = mesh_lib.make_mesh()
        batch = mesh_lib.batch_sharding(mesh)
        repl = mesh_lib.replicated(mesh)
        fn = jax.jit(
            lambda *args: bilstm_layer_fused(*args, interpret=True),
            in_shardings=(batch, repl, repl, repl), out_shardings=batch)
        out = fn(jax.device_put(x, batch),
                 *(jax.device_put(w, repl) for w in (w_ih, w_hh, gb)))
        assert out.sharding.is_equivalent_to(batch, out.ndim)
        assert float(jnp.abs(out - ref).max()) < 2e-5


class TestModuleIntegration:
    """FreqLstm(fused) ≡ FreqLstm(scan) with the SAME parameter tree."""

    def _module_and_vars(self, rng):
        mod = recurrent.FreqLstm(input_size=64, freq_length=32,
                                 hidden_size=128, output_size=256)
        x = _rand(rng, (4, 64, 32, 20), 1.0)  # (B, C, F, T)
        variables = mod.init(jax.random.PRNGKey(0), x)
        return mod, variables, x

    def test_fused_equals_scan_and_tree_identical(self, rng, monkeypatch):
        # pin 3-pass: this test isolates the module↔kernel plumbing at
        # full precision; the default-1-pass e2e budget is qualified by
        # artifacts/lstm_precision_sim + the task-level 1e-4 tests
        monkeypatch.setenv("SDFA_LSTM_PASSES", "3")
        mod, variables, x = self._module_and_vars(rng)
        ref = mod.apply(variables, x)
        recurrent._FREQ_FUSED_INTERPRET = True
        try:
            # init under the fused path must build the identical tree
            v2 = mod.init(jax.random.PRNGKey(0), x)
            t1 = jax.tree_util.tree_structure(variables)
            t2 = jax.tree_util.tree_structure(v2)
            assert t1 == t2
            for a, b in zip(jax.tree_util.tree_leaves(variables),
                            jax.tree_util.tree_leaves(v2)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            out = mod.apply(variables, x)
        finally:
            recurrent._FREQ_FUSED_INTERPRET = False
        assert out.shape == ref.shape
        assert float(jnp.abs(out - ref).max()) < 2e-5

    def test_training_keeps_scan_path(self, rng):
        """training=True must not take the fused (inference-only) path —
        gradients flow through the scan implementation."""
        mod, variables, x = self._module_and_vars(rng)
        recurrent._FREQ_FUSED_INTERPRET = True
        try:
            def loss(v):
                return jnp.sum(mod.apply(v, x, training=True,
                                         rngs={"dropout": jax.random.PRNGKey(1)}) ** 2)

            g = jax.grad(loss)(variables)
        finally:
            recurrent._FREQ_FUSED_INTERPRET = False
        gnorm = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(gnorm) and gnorm > 0


class TestBilstmKernel:
    """Fused bidirectional time-LSTM layer (ops/pallas_bilstm.py)."""

    def test_kernel_matches_reference(self, rng):
        from sdfa_tpu.ops.pallas_bilstm import (bilstm_layer_fused,
                                                bilstm_layer_reference)

        rows, T, IN, H = 200, 16, 256, 256
        x = _rand(rng, (rows, T, IN), 1.0)
        w_ih = _rand(rng, (2, IN, 4 * H), 0.05)
        w_hh = _rand(rng, (2, H, 4 * H), 0.05)
        gb = _rand(rng, (2, 4 * H), 0.05)
        ref = bilstm_layer_reference(x, w_ih, w_hh, gb)
        out = bilstm_layer_fused(x, w_ih, w_hh, gb, block_rows=128,
                                 interpret=True)
        assert float(jnp.abs(out - ref).max()) < 2e-5

    def test_lstm_module_fused_equals_scan(self, rng, monkeypatch):
        """2-layer biLSTM module: fused layers ≡ scan path, same params
        (3-pass pinned — plumbing test, not the e2e budget)."""
        monkeypatch.setenv("SDFA_LSTM_PASSES", "3")
        mod = recurrent.LSTM(input_size=256, hidden_size=256, num_layers=2,
                             bias=False, bidirectional=True)
        x = _rand(rng, (6, 12, 256), 1.0)
        variables = mod.init(jax.random.PRNGKey(0), x)
        ref = mod.apply(variables, x)
        recurrent._FREQ_FUSED_INTERPRET = True
        try:
            v2 = mod.init(jax.random.PRNGKey(0), x)
            assert (jax.tree_util.tree_structure(variables)
                    == jax.tree_util.tree_structure(v2))
            out = mod.apply(variables, x)
        finally:
            recurrent._FREQ_FUSED_INTERPRET = False
        assert float(jnp.abs(out - ref).max()) < 5e-5

    def test_unaligned_input_keeps_scan(self, rng):
        """in_size not lane-aligned (e.g. the freq-LSTM's 64) must not
        take the fused layer path — identical output either way."""
        mod = recurrent.LSTM(input_size=64, hidden_size=128, num_layers=1,
                             bias=True, bidirectional=True)
        x = _rand(rng, (4, 8, 64), 1.0)
        variables = mod.init(jax.random.PRNGKey(0), x)
        ref = mod.apply(variables, x)
        recurrent._FREQ_FUSED_INTERPRET = True
        try:
            out = mod.apply(variables, x)
        finally:
            recurrent._FREQ_FUSED_INTERPRET = False
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)


class TestReducedPasses:
    """SDFA_LSTM_PASSES plumbing: _dot_f32 at 2/1 passes casts operands to
    bf16 EXPLICITLY (what Mosaic does to a plain f32 dot on the MXU),
    so interpret mode shows the hardware's truncation. End-to-end error
    through the full serving pipeline is measured in
    artifacts/lstm_precision_sim/ — here we pin the per-layer ordering:
    err(3) < err(2) < err(1), with 3-pass inside the parity budget."""

    def test_pass_count_error_ordering(self, rng):
        rows, F, C, H, OUT = 136, 8, 64, 128, 256
        x = _rand(rng, (rows, F, C), 1.0)
        w_ih = _rand(rng, (2, C, 4 * H))
        w_hh = _rand(rng, (2, H, 4 * H))
        gb = _rand(rng, (2, 4 * H))
        w_proj = _rand(rng, (F * 2 * H, OUT), 0.02)
        b_proj = _rand(rng, (OUT,))
        ref = freq_lstm_reference(x, w_ih, w_hh, gb, w_proj, b_proj)
        errs = {}
        for passes in (3, 2, 1):
            out = freq_lstm_fused(x, w_ih, w_hh, gb, w_proj, b_proj,
                                  block_rows=128, interpret=True,
                                  precise=passes)
            errs[passes] = float(jnp.abs(out - ref).max())
        assert errs[3] < 2e-5
        assert errs[3] < errs[2] < errs[1]
        # plain bf16 recurrence stays bounded (not catastrophic): the sim
        # qualifies the end-to-end budget; this guards degeneration
        assert errs[1] < 5e-2

    def test_bool_int_cache_no_collision(self, rng):
        """hash(True) == hash(1): a raw (…, True) lru entry used to be
        returned for precise=1 when the True variant was built first —
        the 1-pass request silently ran 3-pass (and vice versa). The
        entry points now cache the normalized pass count."""
        rows, F, C, H, OUT = 136, 4, 64, 128, 256
        x = _rand(rng, (rows, F, C), 1.0)
        w_ih = _rand(rng, (2, C, 4 * H))
        w_hh = _rand(rng, (2, H, 4 * H))
        w_proj = _rand(rng, (F * 2 * H, OUT), 0.02)
        ref = freq_lstm_reference(x, w_ih, w_hh, None, w_proj, None)
        args = (x, w_ih, w_hh, None, w_proj, None)
        # build the True entry FIRST, then request 1-pass
        e_true = float(jnp.abs(freq_lstm_fused(
            *args, block_rows=128, interpret=True, precise=True) - ref).max())
        e_one = float(jnp.abs(freq_lstm_fused(
            *args, block_rows=128, interpret=True, precise=1) - ref).max())
        assert e_true < 2e-5
        assert e_one > 10 * e_true, (
            f"precise=1 returned the 3-pass variant (cache collision): "
            f"{e_one:.2e} vs {e_true:.2e}")

    def test_bool_compat(self, rng):
        """precise=True/False still mean 3/1 passes (train kernel callers)."""
        from sdfa_tpu.ops.pallas_freq_lstm import _passes
        assert _passes(True) == 3 and _passes(False) == 1
        assert _passes(2) == 2 and _passes(1) == 1 and _passes(3) == 3

    def test_env_knob_reaches_kernels(self, monkeypatch):
        from sdfa_tpu.nn.recurrent import _lstm_passes
        monkeypatch.setenv("SDFA_LSTM_PASSES", "2")
        assert _lstm_passes() == 2
        monkeypatch.delenv("SDFA_LSTM_PASSES")
        # default 1: hardware-qualified (DESIGN §12.7 — 812→1056× at
        # unchanged trained-checkpoint parity)
        assert _lstm_passes() == 1


class TestBf16InterLayerStaging:
    """out_dtype=bf16 staging (round 4: halves the (rows, T, 2H) stacks
    that capped the serving batch — artifacts/batch_scaling_r4/). In
    1-pass mode it must be VALUE-IDENTICAL: the next layer's _dot_f32
    rounds its activation operand to bf16 regardless, so rounding at the
    write changes nothing."""

    def test_two_layer_chain_bitwise_identical(self, rng):
        from sdfa_tpu.ops.pallas_bilstm import bilstm_layer_fused

        rows, T, IN, H = 48, 8, 256, 256
        x = _rand(rng, (rows, T, IN), 1.0)
        w_ih1 = _rand(rng, (2, IN, 4 * H), 0.05)
        w_hh1 = _rand(rng, (2, H, 4 * H), 0.05)
        w_ih2 = _rand(rng, (2, 2 * H, 4 * H), 0.05)
        w_hh2 = _rand(rng, (2, H, 4 * H), 0.05)

        mid32 = bilstm_layer_fused(x, w_ih1, w_hh1, None, block_rows=128,
                                   interpret=True, precise=1)
        mid16 = bilstm_layer_fused(x, w_ih1, w_hh1, None, block_rows=128,
                                   interpret=True, precise=1,
                                   out_dtype=jnp.bfloat16)
        assert mid16.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(mid32.astype(jnp.bfloat16)), np.asarray(mid16))

        out32 = bilstm_layer_fused(mid32, w_ih2, w_hh2, None, block_rows=128,
                                   interpret=True, precise=1)
        out16 = bilstm_layer_fused(mid16, w_ih2, w_hh2, None, block_rows=128,
                                   interpret=True, precise=1)
        assert out16.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(out32), np.asarray(out16))

    def test_lstm_module_staging_identical_and_gated(self, rng, monkeypatch):
        """Module level: SDFA_LSTM_STAGE_BF16 on/off produce the same
        f32 output at 1-pass; 3-pass mode never stages (the hi/lo split
        needs the f32 activation)."""
        mod = recurrent.LSTM(input_size=256, hidden_size=256, num_layers=2,
                             bias=False, bidirectional=True)
        x = _rand(rng, (6, 12, 256), 1.0)
        variables = mod.init(jax.random.PRNGKey(0), x)
        monkeypatch.setenv("SDFA_LSTM_PASSES", "1")
        # isolate the INTER-layer knob: the final layer's (value-changing,
        # separately qualified) staging default would turn the output bf16
        monkeypatch.setenv("SDFA_LSTM_STAGE_BF16_LAST", "0")
        recurrent._FREQ_FUSED_INTERPRET = True
        try:
            monkeypatch.setenv("SDFA_LSTM_STAGE_BF16", "0")
            ref = mod.apply(variables, x)
            monkeypatch.setenv("SDFA_LSTM_STAGE_BF16", "1")
            out = mod.apply(variables, x)
            # 3-pass: staging must gate itself off (value would differ)
            monkeypatch.setenv("SDFA_LSTM_PASSES", "3")
            out3 = mod.apply(variables, x)
        finally:
            recurrent._FREQ_FUSED_INTERPRET = False
        assert ref.dtype == out.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
        # 3-pass output is the higher-precision one — different from
        # 1-pass (sanity that the pass knob still reaches the kernel)
        assert float(jnp.abs(out3 - out).max()) > 0

    def test_last_layer_staging_knob(self, rng, monkeypatch):
        """The FINAL layer's bf16 staging is the hardware-qualified
        default (1671.5× vs 1646.8× realtime, trained parity 2.57e-6 m —
        artifacts/batch_scaling_r4/); it is NOT value-identical
        (attention consumes it at MODEL_PREC), so SDFA_LSTM_STAGE_BF16_
        LAST=0 restores the f32 stack. Assert the dtype plumbing and that
        the bf16 output is exactly the write-side rounding of f32."""
        mod = recurrent.LSTM(input_size=256, hidden_size=256, num_layers=2,
                             bias=False, bidirectional=True)
        x = _rand(rng, (4, 10, 256), 1.0)
        variables = mod.init(jax.random.PRNGKey(0), x)
        monkeypatch.setenv("SDFA_LSTM_PASSES", "1")
        recurrent._FREQ_FUSED_INTERPRET = True
        try:
            monkeypatch.setenv("SDFA_LSTM_STAGE_BF16_LAST", "0")
            ref = mod.apply(variables, x)
            monkeypatch.delenv("SDFA_LSTM_STAGE_BF16_LAST")
            out = mod.apply(variables, x)
        finally:
            recurrent._FREQ_FUSED_INTERPRET = False
        assert ref.dtype == jnp.float32 and out.dtype == jnp.bfloat16
        # exactly the write-side rounding of the f32 result
        np.testing.assert_array_equal(
            np.asarray(ref.astype(jnp.bfloat16)), np.asarray(out))
