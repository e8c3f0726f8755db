"""Parity vs the ACTUAL reference modules (not a re-written twin).

Round-1 weakness #3 (VERDICT.md): the e2e oracle re-implemented the
reference forward from the builder's understanding, so a shared misreading
would pass silently. Here the oracle lines are the reference's own code:
`speech_anime/layers/{freq_lstm,attentions}.py` and `saber/nn/layers`,
imported from /root/reference with the missing audio deps stubbed
(tests/_reference_oracle.py), driven with weights copied from OUR modules.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from _reference_oracle import load_reference_modules

from sdfa_tpu.nn import attention as our_attention
from sdfa_tpu.nn import layers as our_layers
from sdfa_tpu.nn import recurrent as our_recurrent

ref_freq_lstm, ref_attentions, saber = load_reference_modules()


def _t(x):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(x)))


class TestFreqLstmOracle:
    def test_full_mode_matches_reference(self):
        B, C, F, T, H, OUT = 3, 64, 32, 7, 128, 256
        ours = our_recurrent.FreqLstm(
            input_size=C, freq_length=F, hidden_size=H, output_size=OUT)
        x = np.random.default_rng(0).normal(0, 0.5, (B, C, F, T)).astype(np.float32)
        variables = ours.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))
        out_ours = np.asarray(ours.apply(variables, jnp.asarray(x)))

        ref = ref_freq_lstm.FreqLstm(
            input_size=C, freq_length=F, hidden_size=H, output_size=OUT)
        p = jax.device_get(variables["params"])
        with torch.no_grad():
            for sfx in ("_l0", "_l0_reverse"):
                getattr(ref._lstm, f"weight_ih{sfx}").copy_(_t(p["lstm"][f"w_ih{sfx}"].T))
                getattr(ref._lstm, f"weight_hh{sfx}").copy_(_t(p["lstm"][f"w_hh{sfx}"].T))
                getattr(ref._lstm, f"bias_ih{sfx}").copy_(_t(p["lstm"][f"b_ih{sfx}"]))
                getattr(ref._lstm, f"bias_hh{sfx}").copy_(_t(p["lstm"][f"b_hh{sfx}"]))
            ref._proj.weight.copy_(_t(p["proj"]["kernel"].T))
            ref._proj.bias.copy_(_t(p["proj"]["bias"]))
        ref.eval()
        with torch.no_grad():
            out_ref = ref(_t(x)).numpy()

        assert out_ours.shape == out_ref.shape == (B, OUT, 1, T)
        np.testing.assert_allclose(out_ours, out_ref, atol=2e-5, rtol=0)

    def test_last_mode_matches_reference(self):
        B, C, F, H, OUT = 4, 16, 8, 24, 10
        ours = our_recurrent.FreqLstm(
            input_size=C, freq_length=F, hidden_size=H, output_size=OUT,
            mode="last")
        x = np.random.default_rng(1).normal(0, 0.5, (B, C, F)).astype(np.float32)
        variables = ours.init({"params": jax.random.PRNGKey(1)}, jnp.asarray(x))
        out_ours = np.asarray(ours.apply(variables, jnp.asarray(x)))

        ref = ref_freq_lstm.FreqLstm(
            input_size=C, freq_length=F, hidden_size=H, output_size=OUT,
            mode="last")
        p = jax.device_get(variables["params"])
        with torch.no_grad():
            for sfx in ("_l0", "_l0_reverse"):
                getattr(ref._lstm, f"weight_ih{sfx}").copy_(_t(p["lstm"][f"w_ih{sfx}"].T))
                getattr(ref._lstm, f"weight_hh{sfx}").copy_(_t(p["lstm"][f"w_hh{sfx}"].T))
                getattr(ref._lstm, f"bias_ih{sfx}").copy_(_t(p["lstm"][f"b_ih{sfx}"]))
                getattr(ref._lstm, f"bias_hh{sfx}").copy_(_t(p["lstm"][f"b_hh{sfx}"]))
            ref._proj.weight.copy_(_t(p["proj"]["kernel"].T))
            ref._proj.bias.copy_(_t(p["proj"]["bias"]))
        ref.eval()
        with torch.no_grad():
            out_ref = ref(_t(x)).numpy()
        np.testing.assert_allclose(out_ours, out_ref, atol=2e-5, rtol=0)


def _copy_attention_weights(ref, p):
    with torch.no_grad():
        # ours stores conv kernels in torch layout (O, I, k); fc as (I, O)
        ref._conv_query.weight.copy_(_t(p["conv_query"]["kernel"]))
        ref.proj_qry.weight.copy_(_t(np.asarray(p["proj_qry"]["kernel"]).T))
        ref.proj_key.weight.copy_(_t(np.asarray(p["proj_key"]["kernel"]).T))
        ref.v.weight.copy_(_t(np.asarray(p["v"]["kernel"]).T))
        ref.b.copy_(_t(p["b"]))


class TestBahdanauOracle:
    @pytest.mark.parametrize("smooth,scale", [(False, 1.0), (False, 2.5), (True, 1.0)])
    def test_matches_reference(self, smooth, scale):
        N, T, C, U, R = 3, 64, 512, 128, 2
        ours = our_attention.BahdanauAttention(
            num_units=U, query_size=C, key_size=C, query_radius=R,
            smooth=smooth, scale_score_at_eval=scale)
        rng = np.random.default_rng(2)
        mem = rng.normal(0, 0.5, (N, T, C)).astype(np.float32)
        mid = T // 2
        query = mem[:, mid - (R - 1) : mid + R, :]
        variables = ours.init({"params": jax.random.PRNGKey(2)},
                              jnp.asarray(query), jnp.asarray(mem))
        ctx_ours, align_ours = ours.apply(
            variables, jnp.asarray(query), jnp.asarray(mem), training=False)

        ref = ref_attentions.BahdanauAttention(
            U, C, C, query_radius=R, smooth=smooth, scale_score_at_eval=scale)
        _copy_attention_weights(ref, jax.device_get(variables["params"]))
        ref.eval()
        with torch.no_grad():
            ctx_ref, align_ref = ref(_t(query), _t(mem))

        np.testing.assert_allclose(np.asarray(align_ours), align_ref.numpy(),
                                   atol=2e-6, rtol=0)
        np.testing.assert_allclose(np.asarray(ctx_ours), ctx_ref.numpy(),
                                   atol=2e-5, rtol=0)

    def test_training_mode_skips_score_scaling_like_reference(self):
        N, T, C, U, R = 2, 16, 32, 16, 2
        ours = our_attention.BahdanauAttention(
            num_units=U, query_size=C, key_size=C, query_radius=R,
            scale_score_at_eval=3.0)
        rng = np.random.default_rng(3)
        mem = rng.normal(0, 0.5, (N, T, C)).astype(np.float32)
        query = mem[:, T // 2 - 1 : T // 2 + 2, :]
        variables = ours.init({"params": jax.random.PRNGKey(3)},
                              jnp.asarray(query), jnp.asarray(mem))
        _, align_train = ours.apply(variables, jnp.asarray(query),
                                    jnp.asarray(mem), training=True)

        ref = ref_attentions.BahdanauAttention(
            U, C, C, query_radius=R, scale_score_at_eval=3.0)
        _copy_attention_weights(ref, jax.device_get(variables["params"]))
        ref.train()
        with torch.no_grad():
            _, align_ref = ref(_t(query), _t(mem))
        np.testing.assert_allclose(np.asarray(align_train), align_ref.numpy(),
                                   atol=2e-6, rtol=0)


class TestSaberLayerOracle:
    """Our conv/pool padding semantics vs saber's own layer zoo."""

    @pytest.mark.parametrize("ksz,stride,width", [
        ((3, 1), (1, 1), 64), ((3, 3), (2, 1), 33), ((5, 3), (2, 2), 31),
    ])
    def test_conv2d_same_pad(self, ksz, stride, width):
        Cin, Cout, H = 3, 8, 29
        ours = our_layers.Conv2d(in_channels=Cin, out_channels=Cout,
                                 kernel_size=ksz, stride=stride)
        x = np.random.default_rng(4).normal(0, 1, (2, Cin, H, width)).astype(np.float32)
        variables = ours.init({"params": jax.random.PRNGKey(4)}, jnp.asarray(x))
        out_ours = np.asarray(ours.apply(variables, jnp.asarray(x)))

        ref = saber.nn.layers.Conv2d(Cin, Cout, ksz, stride)
        p = jax.device_get(variables["params"])
        with torch.no_grad():
            # ours stores conv kernels in torch layout (O, I, kh, kw)
            ref.weight.copy_(_t(p["kernel"]))
            ref.bias.copy_(_t(p["bias"]))
        ref.eval()
        with torch.no_grad():
            out_ref = ref(_t(x)).numpy()
        assert out_ours.shape == out_ref.shape
        np.testing.assert_allclose(out_ours, out_ref, atol=2e-5, rtol=0)

    @pytest.mark.parametrize("ksz", [(2, 1), (2, 2), (3, 1)])
    def test_maxpool2d(self, ksz):
        ours = our_layers.Pool2d(mode="max", kernel_size=ksz)
        x = np.random.default_rng(5).normal(0, 1, (2, 4, 32, 17)).astype(np.float32)
        variables = ours.init({"params": jax.random.PRNGKey(5)}, jnp.asarray(x))
        out_ours = np.asarray(ours.apply(variables, jnp.asarray(x)))
        ref = saber.nn.layers.Pool2d("max", ksz)
        with torch.no_grad():
            out_ref = ref(_t(x)).numpy()
        assert out_ours.shape == out_ref.shape
        np.testing.assert_allclose(out_ours, out_ref, atol=0, rtol=0)

    @pytest.mark.parametrize("k,s,t_in,want", [
        (1, 4, 2, 7),   # padlr = -6 → (lo, hi) = (-3, -3): negative crop
        (3, 2, 4, 7),   # padlr = -2 → (-1, -1)
        (3, 1, 7, 7),   # padlr = +2 → (1, 1): normal crop
    ])
    def test_convtranspose1d_want_size_crop(self, k, s, t_in, want):
        """want_size crop incl. NEGATIVE pad tuples: the reference's
        conv_unpad (functions.py:252-270) slices with the raw (possibly
        negative) pad values — torch wraps a negative start exactly like
        Python, and we intentionally reproduce that (layers.py crop sites,
        no clamp). This pins the wrap behavior against saber itself."""
        Cin, Cout = 3, 5
        ours = our_layers.ConvTranspose1d(
            in_channels=Cin, out_channels=Cout, kernel_size=k, stride=s,
            want_size=want)
        x = np.random.default_rng(6).normal(0, 1, (2, Cin, t_in)).astype(np.float32)
        variables = ours.init({"params": jax.random.PRNGKey(6)}, jnp.asarray(x))
        out_ours = np.asarray(ours.apply(variables, jnp.asarray(x)))

        ref = saber.nn.layers.ConvTranspose1d(Cin, Cout, k, s, want_size=want)
        p = jax.device_get(variables["params"])
        with torch.no_grad():
            ref.weight.copy_(_t(p["kernel"]))
            ref.bias.copy_(_t(p["bias"]))
        ref.eval()
        with torch.no_grad():
            out_ref = ref(_t(x)).numpy()
        assert out_ours.shape == out_ref.shape
        np.testing.assert_allclose(out_ours, out_ref, atol=2e-5, rtol=0)
