"""Training-step + multi-device sharding tests on the virtual CPU mesh.

Uses a tiny model (same architecture family) so CPU compiles stay fast;
the full-size model is covered by __graft_entry__.dryrun_multichip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdfa_tpu.models import losses as L
from sdfa_tpu.parallel import mesh as mesh_lib
from sdfa_tpu.train.trainer import (
    TrainState, _scaler_names, make_loss_fn, make_optimizer, make_train_step,
)
from sdfa_tpu.utils.config import ConfigDict

from test_model_and_losses import _tiny_model


@pytest.fixture(scope="module")
def setup():
    model = _tiny_model()
    hp = ConfigDict(dict(
        loss=dict(ploss_scale=1, mloss_scale=1, eloss_scale=1,
                  dynamic_scalar=True, anime_loss_weight=None),
        optim=dict(name="Adam", args=dict(lr=1e-3, weight_decay=0), lr_scheduler=None),
    ))
    rng = jax.random.PRNGKey(0)
    feat = jnp.zeros((4, 8, 16, 3))
    spk = jnp.zeros((4,), jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, feat, spk, False)
    tx, lr_fn, b1_fn, mode, base_lr = make_optimizer(hp)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        constants=variables.get("constants", {}),
        opt_state=tx.init(variables["params"]),
        scalers={n: L.ScalerState.init() for n in _scaler_names("dgrad_3d")},
        step=jnp.zeros((), jnp.int32),
    )
    return model, hp, tx, state


def _batch(bsz=8):
    rng = np.random.default_rng(0)
    return {
        "audio_feat": rng.normal(size=(bsz, 8, 16, 3)).astype(np.float32),
        "speaker_id": np.zeros((bsz,), np.int32),
        "dgrad_3d_scale": rng.normal(0, 0.01, (bsz, 1, 10, 6)).astype(np.float32),
        "dgrad_3d_rotat": rng.normal(0, 0.01, (bsz, 1, 10, 3)).astype(np.float32),
        "anime_weight": np.ones((bsz,), np.float32),
    }


class TestTrainStep:
    def test_step_updates_and_metrics(self, setup):
        model, hp, tx, state = setup
        step_fn = make_train_step(model, hp, tx, donate=False)
        new_state, metrics = step_fn(state, _batch(), jax.random.PRNGKey(1),
                                     jnp.asarray(1e-3), jnp.asarray(0.9))
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["total"]))
        assert float(metrics["grad_norm"]) > 0
        # params actually changed
        p0 = jax.tree_util.tree_leaves(state.params)[0]
        p1 = jax.tree_util.tree_leaves(new_state.params)[0]
        assert not np.allclose(np.asarray(p0), np.asarray(p1))
        # scaler state advanced
        assert float(new_state.scalers["dyn_p_scale"].beta_t) < 1.0

    def test_loss_decreases_over_steps(self, setup):
        model, hp, tx, state = setup
        step_fn = make_train_step(model, hp, tx, donate=False)
        batch = _batch()
        rng = jax.random.PRNGKey(2)
        first = None
        for i in range(12):
            rng, k = jax.random.split(rng)
            state, metrics = step_fn(state, batch, k, jnp.asarray(3e-3), jnp.asarray(0.9))
            val = float(metrics["scalar_ploss"])
            if first is None:
                first = val
        assert val < first, f"ploss did not decrease: {first} → {val}"

    def test_eval_step_no_state_change(self, setup):
        from sdfa_tpu.train.trainer import make_eval_step

        model, hp, tx, state = setup
        eval_fn = make_eval_step(model, hp)
        m1 = eval_fn(state, _batch(), jax.random.PRNGKey(0))
        m2 = eval_fn(state, _batch(), jax.random.PRNGKey(0))
        assert float(m1["scalar_ploss"]) == pytest.approx(float(m2["scalar_ploss"]))


class TestSharding:
    def test_eight_device_mesh(self):
        assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
        mesh = mesh_lib.make_mesh()
        assert mesh.devices.size == 8

    def test_sharded_step_matches_single_device(self, setup):
        model, hp, tx, state = setup
        step_fn = make_train_step(model, hp, tx, donate=False)
        batch = _batch(16)
        rngk = jax.random.PRNGKey(3)

        # single device
        s1, m1 = step_fn(state, batch, rngk, jnp.asarray(1e-3), jnp.asarray(0.9))

        # sharded over the 8-device mesh
        mesh = mesh_lib.make_mesh()
        state_r = mesh_lib.replicate(mesh, state)
        batch_s = mesh_lib.shard_batch(mesh, batch)
        s8, m8 = step_fn(state_r, batch_s, rngk, jnp.asarray(1e-3), jnp.asarray(0.9))

        assert float(m8["total"]) == pytest.approx(float(m1["total"]), rel=1e-4)
        p1 = jax.tree_util.tree_leaves(s1.params)[0]
        p8 = jax.tree_util.tree_leaves(s8.params)[0]
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-5)

    def test_pad_batch_to_devices(self):
        batch = {"x": np.zeros((13, 2))}
        padded, real = mesh_lib.pad_batch_to_devices(batch, 8)
        assert padded["x"].shape[0] == 16 and real == 13


class TestCheckpointRoundtrip:
    def test_save_load(self, setup, tmp_path):
        import flax.serialization as fser

        from sdfa_tpu.train import checkpoints as ck

        model, hp, tx, state = setup
        payload = dict(
            epoch=3, global_step=7,
            params=jax.device_get(state.params),
            scalers={k: tuple(np.asarray(x) for x in v) for k, v in state.scalers.items()},
        )
        path = ck.save_checkpoint(str(tmp_path), payload, 3, 7, max_nb=2)
        back = ck.load_checkpoint(path, payload)
        assert back["epoch"] == 3 and back["global_step"] == 7
        a = jax.tree_util.tree_leaves(payload["params"])[0]
        b = jax.tree_util.tree_leaves(back["params"])[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_rolling_retention(self, setup, tmp_path):
        from sdfa_tpu.train import checkpoints as ck

        payload = dict(x=np.zeros(3))
        for i in range(5):
            ck.save_checkpoint(str(tmp_path), payload, i, i * 10, max_nb=2)
        import os

        ckpts = [f for f in os.listdir(tmp_path) if f.startswith("epoch")]
        assert len(ckpts) == 2
        assert ck.latest_checkpoint(str(tmp_path)) is not None
