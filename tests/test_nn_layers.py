"""NN layer parity tests against torch oracles (the reference's backend)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sdfa_tpu.nn import LayerStack, freeze_specs, functions as fn
from sdfa_tpu.nn import layers as L
from sdfa_tpu.nn import recurrent as R


def _init(module, *args, rngs=None, **kwargs):
    rngs = rngs or {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    return module.init(rngs, *args, **kwargs)


class TestPaddingMath:
    @pytest.mark.parametrize("size,k,s,d", [(64, 3, 1, 1), (64, 3, 2, 1), (63, 4, 2, 1), (128, 5, 1, 2)])
    def test_pad_tuple_left_heavy(self, size, k, s, d):
        lo, hi = fn.get_pad_tuple(size, k, s, d, "same")
        # reference: right = padlr // 2, left = padlr - right  (left-heavy!)
        padlr = (size // s - 1) * s + d * (k - 1) + 1 - size
        padlr = max(padlr, 0)
        assert (lo, hi) == (padlr - padlr // 2, padlr // 2)

    def test_causal(self):
        lo, hi = fn.get_pad_tuple(64, 3, 1, 1, "causal")
        assert (lo, hi) == (2, 0)


class TestConvParity:
    def test_conv2d_matches_torch(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 3, 16, 8)).astype(np.float32)
        conv = L.Conv2d(in_channels=3, out_channels=5, kernel_size=(3, 1), stride=(1, 1))
        variables = _init(conv, jnp.asarray(x))
        kernel = np.asarray(variables["params"]["kernel"])  # (O, I, kh, kw)
        bias = np.asarray(variables["params"]["bias"])
        ours = np.asarray(conv.apply(variables, jnp.asarray(x)))

        tx = torch.from_numpy(x)
        # reference pads left-heavy "same" then VALID conv
        lo_w, hi_w = fn.get_pad_tuple(8, 1, 1, 1, "same")
        lo_h, hi_h = fn.get_pad_tuple(16, 3, 1, 1, "same")
        tx = torch.nn.functional.pad(tx, (lo_w, hi_w, lo_h, hi_h))
        ref = torch.nn.functional.conv2d(tx, torch.from_numpy(kernel), torch.from_numpy(bias))
        np.testing.assert_allclose(ours, ref.numpy(), atol=1e-5)

    def test_conv1d_stride_matches_torch(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 4, 33)).astype(np.float32)
        conv = L.Conv1d(in_channels=4, out_channels=6, kernel_size=5, stride=2)
        variables = _init(conv, jnp.asarray(x))
        kernel = np.asarray(variables["params"]["kernel"])
        bias = np.asarray(variables["params"]["bias"])
        ours = np.asarray(conv.apply(variables, jnp.asarray(x)))
        lo, hi = fn.get_pad_tuple(33, 5, 2, 1, "same")
        tx = torch.nn.functional.pad(torch.from_numpy(x), (lo, hi))
        ref = torch.nn.functional.conv1d(tx, torch.from_numpy(kernel), torch.from_numpy(bias), stride=2)
        np.testing.assert_allclose(ours, ref.numpy(), atol=1e-5)

    def test_weight_norm_decomposition(self):
        fc = L.FullyConnected(in_channels=8, out_channels=4, weight_norm=True)
        variables = _init(fc, jnp.ones((1, 8)))
        v = np.asarray(variables["params"]["kernel_v"])
        g = np.asarray(variables["params"]["kernel_g"])
        # g initialized to ||v|| per output (torch weight_norm convention)
        np.testing.assert_allclose(g, np.linalg.norm(v, axis=0), rtol=1e-6)
        # effective kernel = v/||v||·g == v at init
        x = np.random.default_rng(2).normal(size=(3, 8)).astype(np.float32)
        ours = np.asarray(fc.apply(variables, jnp.asarray(x)))
        ref = x @ v + np.asarray(variables["params"]["bias"])
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestBatchNorm:
    def test_torch_semantics(self):
        rng = np.random.default_rng(3)
        x = rng.normal(2.0, 3.0, size=(8, 5)).astype(np.float32)
        fc = L.FullyConnected(in_channels=5, out_channels=5, bias=False,
                              batch_norm=dict(momentum=0.01, eps=1e-3))
        variables = _init(fc, jnp.asarray(x))
        # force identity kernel so BN sees x directly
        import flax
        new_params = dict(flax.core.unfreeze(variables["params"]))
        new_params["kernel"] = jnp.eye(5)
        params = {"params": new_params, "batch_stats": variables["batch_stats"]}
        out, mutated = fc.apply(params, jnp.asarray(x), training=True, mutable=["batch_stats"])

        tbn = torch.nn.BatchNorm1d(5, momentum=0.01, eps=1e-3)
        ref = tbn(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
        # running mean after one step: 0.99·0 + 0.01·batch_mean
        run_mean = np.asarray(jax.tree_util.tree_leaves(
            mutated["batch_stats"])[0] if False else
            mutated["batch_stats"]["post_bn"]["mean"])
        np.testing.assert_allclose(run_mean, tbn.running_mean.numpy(), atol=1e-4)


class TestLSTMParity:
    @pytest.mark.parametrize("bidirectional", [False, True])
    def test_matches_torch(self, bidirectional):
        B, T, C, H = 3, 7, 6, 5
        rng = np.random.default_rng(4)
        x = rng.normal(size=(B, T, C)).astype(np.float32)
        ours_mod = R.LSTM(input_size=C, hidden_size=H, num_layers=2, bias=True,
                          bidirectional=bidirectional)
        variables = _init(ours_mod, jnp.asarray(x))

        tl = torch.nn.LSTM(C, H, num_layers=2, bias=True, batch_first=True,
                           bidirectional=bidirectional)
        # copy our params into torch (transpose: ours (in, 4H) vs torch (4H, in))
        params = variables["params"]
        with torch.no_grad():
            for layer in range(2):
                for direction in range(2 if bidirectional else 1):
                    sfx = f"_l{layer}" + ("_reverse" if direction else "")
                    getattr(tl, f"weight_ih{sfx}").copy_(
                        torch.from_numpy(np.asarray(params[f"w_ih{sfx}"]).T))
                    getattr(tl, f"weight_hh{sfx}").copy_(
                        torch.from_numpy(np.asarray(params[f"w_hh{sfx}"]).T))
                    getattr(tl, f"bias_ih{sfx}").copy_(
                        torch.from_numpy(np.asarray(params[f"b_ih{sfx}"])))
                    getattr(tl, f"bias_hh{sfx}").copy_(
                        torch.from_numpy(np.asarray(params[f"b_hh{sfx}"])))
        ref, _ = tl(torch.from_numpy(x))
        ours = np.asarray(ours_mod.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref.detach().numpy(), atol=2e-5)


class TestGRUParity:
    def test_matches_torch(self):
        B, T, C, H = 2, 5, 4, 3
        rng = np.random.default_rng(5)
        x = rng.normal(size=(B, T, C)).astype(np.float32)
        ours_mod = R.GRU(input_size=C, hidden_size=H, num_layers=1, bias=True)
        variables = _init(ours_mod, jnp.asarray(x))
        tg = torch.nn.GRU(C, H, num_layers=1, bias=True, batch_first=True)
        params = variables["params"]
        with torch.no_grad():
            tg.weight_ih_l0.copy_(torch.from_numpy(np.asarray(params["w_ih_l0"]).T))
            tg.weight_hh_l0.copy_(torch.from_numpy(np.asarray(params["w_hh_l0"]).T))
            tg.bias_ih_l0.copy_(torch.from_numpy(np.asarray(params["b_ih_l0"])))
            tg.bias_hh_l0.copy_(torch.from_numpy(np.asarray(params["b_hh_l0"])))
        ref, _ = tg(torch.from_numpy(x))
        ours = np.asarray(ours_mod.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref.detach().numpy(), atol=2e-5)


class TestFreqLstm:
    def test_shapes(self):
        m = R.FreqLstm(input_size=64, freq_length=32, hidden_size=128, output_size=256)
        x = jnp.zeros((2, 64, 32, 7))  # B, C, F, T
        variables = _init(m, x)
        out = m.apply(variables, x)
        assert out.shape == (2, 256, 1, 7)

    def test_wrong_freq_bins(self):
        m = R.FreqLstm(input_size=64, freq_length=32, hidden_size=8, output_size=16)
        with pytest.raises(AssertionError):
            _init(m, jnp.zeros((1, 64, 31, 2)))


class TestEngine:
    def test_cat_condition_and_skip(self):
        specs = [
            ("fc", 12, 8, "act=linear", "cat_condition=2"),
            ("fc", 8, 8, "act=linear", "skip_connect=1"),
        ]
        stack = LayerStack(specs=freeze_specs(specs), tag="t")
        x = jnp.ones((2, 4, 8))
        cond = jnp.ones((2, 4))
        variables = _init(stack, x, cond)
        (out, _), = (stack.apply(variables, x, cond),)
        assert out.shape == (2, 4, 8)

    def test_attention_query_window(self):
        specs = [("attn", "bah", 8, 4, 2)]
        stack = LayerStack(specs=freeze_specs(specs), tag="t")
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 8)), jnp.float32)
        variables = _init(stack, x, None)
        out, aligns = stack.apply(variables, x, None)
        assert out.shape == (2, 1, 8)
        align = aligns["t00"]
        assert align.shape == (2, 1, 64)
        np.testing.assert_allclose(np.asarray(align).sum(-1), 1.0, atol=1e-5)

    def test_pool_shapes_match_reference_design(self):
        # encoder pools (2,1) halve the freq axis: 128 → 64 → 32
        p = L.Pool2d(mode="max", kernel_size=(2, 1))
        x = jnp.zeros((1, 32, 128, 64))
        assert p.apply({}, x).shape == (1, 32, 64, 64)
