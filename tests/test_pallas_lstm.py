"""Pallas fused LSTM kernel vs the lax.scan reference (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdfa_tpu.nn.recurrent import _lstm_scan
from sdfa_tpu.ops.pallas_lstm import lstm_sequence_pallas


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("bsz,t,h", [(16, 8, 8), (24, 12, 16)])
def test_matches_scan(reverse, bsz, t, h):
    rng = np.random.default_rng(0)
    x_proj = jnp.asarray(rng.normal(0, 0.5, (bsz, t, 4 * h)), jnp.float32)
    w_hh = jnp.asarray(rng.normal(0, 0.2, (h, 4 * h)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (4 * h,)), jnp.float32)

    ref = _lstm_scan(x_proj, w_hh, bias, h, reverse=reverse)
    ours = lstm_sequence_pallas(x_proj, w_hh, bias, reverse=reverse,
                                block_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_no_bias_and_padding():
    rng = np.random.default_rng(1)
    # bsz=10 with block 8 → padded batch path
    x_proj = jnp.asarray(rng.normal(0, 0.5, (10, 6, 16)), jnp.float32)
    w_hh = jnp.asarray(rng.normal(0, 0.2, (4, 16)), jnp.float32)
    ref = _lstm_scan(x_proj, w_hh, None, 4)
    ours = lstm_sequence_pallas(x_proj, w_hh, None, block_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)
