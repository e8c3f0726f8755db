"""Offsets model family (verts_off_3d): forward/decode, training step, and
the shipped config (the reference's second headline model, config/model/
offsets.py)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdfa_tpu.train import Experiment, Trainer
from sdfa_tpu.utils.config import ConfigDict

from test_experiment_resume import _tiny_hp
from test_model_and_losses import _tiny_model

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _offsets_batch(bsz=8):
    rng = np.random.default_rng(0)
    return {
        "audio_feat": rng.normal(size=(bsz, 8, 16, 3)).astype(np.float32),
        "speaker_id": np.zeros((bsz,), np.int32),
        "verts_off_3d": rng.normal(0, 0.001, (bsz, 1, 30)).astype(np.float32),
        "anime_weight": np.ones((bsz,), np.float32),
    }


class TestOffsetsModel:
    def test_forward_and_decode(self):
        model = _tiny_model(face_type="verts_off_3d")
        feat = jnp.zeros((2, 8, 16, 3))
        spk = jnp.zeros((2,), jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)}, feat, spk, False)
        preds, z, _ = model.apply(variables, feat, spk, False)
        assert "verts_off_3d" in preds or "verts_off_3d_pca" in preds
        anime = model.decode_to_anime(variables, preds)
        assert anime.shape[-1] == 30  # output_dim (PCA-decoded)
        assert np.isfinite(np.asarray(anime)).all()

    def test_training_updates_params(self, tmp_path):
        hp = _tiny_hp()
        hp.model.set_key("face_data_type", "verts_off_3d")
        model = _tiny_model(face_type="verts_off_3d")
        exp = Experiment(hp, model, log_dir=str(tmp_path / "run"), training=True)
        p0 = jax.device_get(exp.state.params)
        trainer = Trainer(exp, train_loader=[_offsets_batch() for _ in range(3)])
        trainer.train()
        assert int(jax.device_get(exp.state.step)) == 3
        p1 = jax.device_get(exp.state.params)
        leaves0 = jax.tree_util.tree_leaves(p0)
        leaves1 = jax.tree_util.tree_leaves(p1)
        changed = sum(not np.allclose(a, b) for a, b in zip(leaves0, leaves1))
        assert changed > len(leaves0) // 2  # most params moved

    def test_offsets_scaler_names(self):
        from sdfa_tpu.train.trainer import _scaler_names

        assert _scaler_names("verts_off_3d") == ("dyn_p", "dyn_m", "dyn_e")


class TestShippedOffsetsConfig:
    def test_config_builds_model(self):
        """configs/model/offsets.py parses and builds (structure check only —
        PCA npy loading is deferred with load_pca=False)."""
        from sdfa_tpu.models import build_model

        hp = ConfigDict.parse_file(os.path.join(REPO, "configs", "model", "offsets.py"))
        model = build_model(hp, load_pca=False)
        assert model.face_type == "verts_off_3d"
        assert model.output_dim == 5023 * 3  # FLAME vertex offsets
        assert model.using_pca
