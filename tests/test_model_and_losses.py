"""Model assembly, losses, and scaler-state tests (small dims for speed)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdfa_tpu.models import ScalerState, build_model, dynamic_scale, eloss, mloss, ploss
from sdfa_tpu.models.sdfa import PcaInversion, SpeakerEmbedding, SpeechDrivenAnimation
from sdfa_tpu.nn import freeze_specs


def _tiny_model(face_type="dgrad_3d", using_pca=True, pred_type="face_data"):
    enc = [
        ("permute", (0, 3, 2, 1)),
        ("conv2d", 3, 4, (3, 1), (1, 1), "act=lrelu@a:0.2"),
        ("pool2d", "max", (4, 1)),
        ("freq-lstm", 4, 4, "hidden_size=4", "output_size=8"),
        ("squeeze", 2),
        ("permute", (0, 2, 1)),
        ("lstm", 8, 8, "num_layers=1", "bidirectional=True"),
        ("attn", "bah", 16, 8, 2),
    ]
    trunk = [("fc", 18, 8, "act=lrelu@a:0.2", "cat_condition=2")]
    head = [("fc", 10, 8, "act=tanh", "cat_condition=2"), ("fc", 8, 5, "act=linear")]
    kwargs = dict(
        encoder_specs=freeze_specs(enc),
        output_specs=freeze_specs(trunk),
        face_type=face_type,
        pred_type=pred_type,
        using_pca=using_pca,
        weight_norm=True,
        num_speakers=2,
        speaker_onehot=True,
    )
    rng = np.random.default_rng(99)

    def _pca_init(out_dim):
        comp = rng.normal(0, 0.1, (out_dim, 5)).astype(np.float32)
        means = rng.normal(0, 0.01, (out_dim,)).astype(np.float32)
        return lambda: (comp, means)

    if face_type == "dgrad_3d":
        kwargs.update(
            output_scale_specs=freeze_specs(head),
            output_rotat_specs=freeze_specs(head),
            output_dim_scale=60, output_dim_rotat=30,
            pca_coeffs_scale=5, pca_coeffs_rotat=5,
            pca_scale_init=_pca_init(60), pca_rotat_init=_pca_init(30),
        )
    else:
        kwargs.update(output_dim=30, pca_coeffs=5, pca_init=_pca_init(30),
                      output_specs=freeze_specs(trunk + [("fc", 8, 5, "act=linear")]))
    return SpeechDrivenAnimation(**kwargs)


@pytest.fixture(scope="module")
def tiny():
    model = _tiny_model()
    feat = jnp.zeros((4, 8, 16, 3))
    spk = jnp.zeros((4,), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, feat, spk, False)
    return model, variables, feat, spk


class TestModel:
    def test_forward_shapes(self, tiny):
        model, variables, feat, spk = tiny
        preds, z, aligns = model.apply(variables, feat, spk, False)
        # flat outputs (layout-safe on TPU): tris·6 / tris·3
        assert preds["dgrad_3d_scale"].shape == (4, 1, 60)
        assert preds["dgrad_3d_rotat"].shape == (4, 1, 30)
        assert z.shape == (4, 1, 16)
        assert len(aligns) == 1

    def test_decode_to_anime(self, tiny):
        model, variables, feat, spk = tiny
        preds, _, _ = model.apply(variables, feat, spk, False)
        anime = model.decode_to_anime(variables, preds)
        assert anime.shape == (4, 1, 90)
        # layout: per-triangle [6 scale, 3 rotat]
        scale = np.asarray(preds["dgrad_3d_scale"]).reshape(4, 1, 10, 6)
        rotat = np.asarray(preds["dgrad_3d_rotat"]).reshape(4, 1, 10, 3)
        out = np.asarray(anime).reshape(4, 1, 10, 9)
        np.testing.assert_allclose(out[..., :6], scale, atol=1e-6)
        np.testing.assert_allclose(out[..., 6:], rotat, atol=1e-6)
        # planes=True: k-major permutation of the same values (the TPU
        # serving layout consumed by solve_fn(dgrad_layout="planes"))
        planes = np.asarray(
            model.decode_to_anime(variables, preds, planes=True)
        ).reshape(4, 1, 9, 10)
        np.testing.assert_array_equal(planes,
                                      np.moveaxis(out, -1, -2))

    def test_speaker_onehot(self):
        emb = SpeakerEmbedding(num_speakers=4, using_onehot=True)
        out = emb.apply({}, jnp.asarray([1, 3]))
        np.testing.assert_array_equal(np.asarray(out),
                                      [[0, 1, 0, 0], [0, 0, 0, 1]])

    def test_pca_inversion_values(self):
        rng = np.random.default_rng(0)
        comp = rng.normal(size=(12, 3)).astype(np.float32)
        means = rng.normal(size=(12,)).astype(np.float32)
        m = PcaInversion(coeffs_dim=3, output_dim=12, trainable=False,
                         init_fn=lambda: (comp, means))
        variables = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)))
        x = rng.normal(size=(2, 3)).astype(np.float32)
        out = np.asarray(m.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(out, x @ comp.T + means, atol=1e-5)

    def test_deterministic_eval(self, tiny):
        model, variables, feat, spk = tiny
        a = model.apply(variables, feat, spk, False)[0]["dgrad_3d_scale"]
        b = model.apply(variables, feat, spk, False)[0]["dgrad_3d_scale"]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestLosses:
    def setup_method(self):
        rng = np.random.default_rng(0)
        self.pred = jnp.asarray(rng.normal(size=(4, 1, 10, 6)), jnp.float32)
        self.true = jnp.asarray(rng.normal(size=(4, 1, 10, 6)), jnp.float32)
        self.w = jnp.ones((4,))

    def test_ploss_matches_reference_math(self):
        out = float(ploss(self.pred, self.true, self.w, is_dgrad=True, is_face_data=True))
        diff = (np.asarray(self.pred) - np.asarray(self.true)) ** 2
        ref = diff.sum(-1).mean(-1).mean(-1)  # sum last dim, mean rest
        assert out == pytest.approx(float(ref.mean()), rel=1e-5)

    def test_ploss_exp_for_rotation_branch(self):
        pred = self.pred[..., :3]
        true = self.true[..., :3]
        out = float(ploss(pred, true, self.w, is_dgrad=True, is_face_data=True))
        diff = (np.exp(np.asarray(pred)) - np.exp(np.asarray(true))) ** 2
        ref = diff.sum(-1).mean(-1).mean(-1).mean()
        assert out == pytest.approx(float(ref), rel=1e-5)

    def test_mloss_adjacent_halves(self):
        out = float(mloss(self.pred, self.true, self.w, is_dgrad=True, is_face_data=True))
        p, t = np.asarray(self.pred), np.asarray(self.true)
        mp = p[2:] - p[:2]
        mt = t[2:] - t[:2]
        ref = ((mp - mt) ** 2).sum(-1).mean(-1).mean(-1)
        hw = np.asarray(self.w)[2:] + np.asarray(self.w)[:2]
        assert out == pytest.approx(float((ref * hw).mean()), rel=1e-5)

    def test_eloss(self):
        e = jnp.asarray(np.random.default_rng(1).normal(size=(4, 8)), jnp.float32)
        out = float(eloss(e))
        assert np.isfinite(out) and out >= 0

    def test_dynamic_scaler_ema(self):
        st = ScalerState.init()
        loss = jnp.asarray(2.0)
        scaled, st = dynamic_scale(loss, st, training=True)
        # after 1 update: vt = 0.01·4, beta_t = 0.99 → scale = sqrt(vt/(1-βt))+eps = 2
        assert float(scaled) == pytest.approx(1.0, rel=1e-4)
        scaled2, st2 = dynamic_scale(loss, st, training=False)
        # eval: no state update
        assert st2.vt == st.vt and st2.beta_t == st.beta_t

    def test_scaler_eval_before_any_update(self):
        st = ScalerState.init()
        scaled, _ = dynamic_scale(jnp.asarray(3.0), st, training=False)
        assert float(scaled) == pytest.approx(3.0, rel=1e-5)  # scale 1.0


class TestFlatLossParity:
    """ploss_flat/mloss_flat must equal the (…, tris, k) reference math."""

    def test_flat_equals_shaped(self):
        from sdfa_tpu.models.losses import mloss_flat, ploss_flat

        rng = np.random.default_rng(7)
        w = jnp.asarray(rng.uniform(0.5, 2.0, (4,)), jnp.float32)
        for group, exp_vals in ((6, False), (3, True)):
            pred = jnp.asarray(rng.normal(0, 0.1, (4, 1, 10, group)), jnp.float32)
            true = jnp.asarray(rng.normal(0, 0.1, (4, 1, 10, group)), jnp.float32)
            ref_p = ploss(pred, true, w, is_dgrad=True, is_face_data=exp_vals)
            ref_m = mloss(pred, true, w, is_dgrad=True, is_face_data=exp_vals)
            pf = pred.reshape(4, 1, -1)
            tf = true.reshape(4, 1, -1)
            out_p = ploss_flat(pf, tf, w, group=group, exp_values=exp_vals)
            out_m = mloss_flat(pf, tf, w, group=group, exp_values=exp_vals)
            assert float(out_p) == pytest.approx(float(ref_p), rel=1e-5)
            assert float(out_m) == pytest.approx(float(ref_m), rel=1e-5)


class TestPcaPredictionTypes:
    """pred_type=pca_coeffs/pca_normal: the net outputs PCA coefficients
    directly; loss compares in PCA space; decode applies the inversion
    (reference PredictionType, tools/data_type.py:37-41)."""

    @pytest.mark.parametrize("pred_type", ["pca_coeffs", "pca_normal"])
    def test_forward_loss_decode(self, pred_type):
        from sdfa_tpu.train.trainer import make_loss_fn
        from test_experiment_resume import _tiny_hp

        model = _tiny_model(pred_type=pred_type)
        feat = jnp.zeros((2, 8, 16, 3))
        spk = jnp.zeros((2,), jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)}, feat, spk, False)
        preds, _, _ = model.apply(variables, feat, spk, False)
        assert set(preds) == {"dgrad_3d_scale_pca", "dgrad_3d_rotat_pca"}
        assert preds["dgrad_3d_scale_pca"].shape[-1] == 5  # coeff space

        anime = model.decode_to_anime(variables, preds)
        assert anime.shape[-1] == 90  # decoded to full dgrad

        hp = _tiny_hp()
        loss_fn = make_loss_fn(model, hp)
        rng = np.random.default_rng(0)
        batch = {
            "audio_feat": np.zeros((2, 8, 16, 3), np.float32),
            "speaker_id": np.zeros((2,), np.int32),
            "dgrad_3d_scale_pca": rng.normal(size=(2, 1, 5)).astype(np.float32),
            "dgrad_3d_rotat_pca": rng.normal(size=(2, 1, 5)).astype(np.float32),
            "anime_weight": np.ones((2,), np.float32),
        }
        scalers = {n: ScalerState.init() for n in
                   ("dyn_p_scale", "dyn_m_scale", "dyn_p_rotat", "dyn_m_rotat", "dyn_e")}
        total, aux = loss_fn(variables["params"], variables.get("batch_stats", {}),
                             variables.get("constants", {}), scalers, batch,
                             jax.random.PRNGKey(1), False)
        assert np.isfinite(float(total))
