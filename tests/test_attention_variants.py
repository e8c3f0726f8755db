"""GMM / Prod attention variants + DSL edge cases."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdfa_tpu.nn import LayerStack, freeze_specs
from sdfa_tpu.nn.attention import GmmAttention, ProdAttention, create_self_atten


def _init(module, *args):
    return module.init({"params": jax.random.PRNGKey(0)}, *args)


class TestProdAttention:
    def test_alignment_softmax(self):
        m = ProdAttention(num_units=8, query_size=16, key_size=16, query_radius=2)
        q = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 16)), jnp.float32)
        k = jnp.asarray(np.random.default_rng(1).normal(size=(2, 10, 16)), jnp.float32)
        v = _init(m, q, k)
        ctx, align = m.apply(v, q, k)
        assert ctx.shape == (2, 1, 16)
        np.testing.assert_allclose(np.asarray(align).sum(-1), 1.0, atol=1e-5)


class TestGmmAttention:
    def test_alignment_positive(self):
        m = GmmAttention(num_units=8, query_size=16, key_size=16,
                         query_radius=1, num_k=3)
        q = jnp.asarray(np.random.default_rng(2).normal(size=(2, 1, 16)), jnp.float32)
        k = jnp.asarray(np.random.default_rng(3).normal(size=(2, 12, 16)), jnp.float32)
        v = _init(m, q, k)
        ctx, align = m.apply(v, q, k)
        assert ctx.shape == (2, 1, 16)
        assert (np.asarray(align) >= 0).all()  # GMM mixture is unnormalized

    def test_factory(self):
        assert isinstance(create_self_atten("gmm", 16, 8, 1, num_k=2), GmmAttention)
        assert isinstance(create_self_atten("prod", 16, 8, 1), ProdAttention)
        with pytest.raises(NotImplementedError):
            create_self_atten("multi-head", 16, 8, 1, num_heads=4)


class TestDSLExtras:
    def test_query_offset(self):
        specs = [("attn", "bah", 8, 4, 1, "query_offset=2")]
        stack = LayerStack(specs=freeze_specs(specs), tag="q")
        x = jnp.asarray(np.random.default_rng(4).normal(size=(1, 10, 8)), jnp.float32)
        v = stack.init({"params": jax.random.PRNGKey(0)}, x, None, False)
        out, _ = stack.apply(v, x, None)
        assert out.shape == (1, 1, 8)

    def test_smooth_normalization(self):
        specs = [("attn", "bah", 8, 4, 1, "smooth=true")]
        stack = LayerStack(specs=freeze_specs(specs), tag="s")
        x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 6, 8)), jnp.float32)
        v = stack.init({"params": jax.random.PRNGKey(0)}, x, None, False)
        out, aligns = stack.apply(v, x, None)
        a = np.asarray(list(aligns.values())[0])
        np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-5)

    def test_scale_score_at_eval(self):
        # score scaling applies only in eval mode
        specs = [("attn", "bah", 8, 4, 1, "scale_score_at_eval=5.0")]
        stack = LayerStack(specs=freeze_specs(specs), tag="e")
        x = jnp.asarray(np.random.default_rng(6).normal(size=(1, 6, 8)), jnp.float32)
        v = stack.init({"params": jax.random.PRNGKey(0)}, x, None, False)
        _, a_eval = stack.apply(v, x, None, False)
        _, a_train = stack.apply(v, x, None, True,
                                 rngs={"dropout": jax.random.PRNGKey(1)})
        ae = np.asarray(list(a_eval.values())[0])
        at = np.asarray(list(a_train.values())[0])
        assert not np.allclose(ae, at)  # sharper (scaled) softmax at eval
