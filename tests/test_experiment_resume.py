"""Experiment checkpoint/resume + Trainer hook registry tests."""

import os

import numpy as np
import pytest

import jax

from sdfa_tpu.train import Experiment, Trainer
from sdfa_tpu.utils.config import ConfigDict


def _tiny_hp():
    from test_model_and_losses import _tiny_model  # noqa

    return ConfigDict(dict(
        audio=dict(feature=dict(sliding_window_frames=8, with_delta=True),
                   mel=dict(n_mels=16), sample_rate=8000),
        anime=dict(fps=60, feature=dict(ts_delta=100)),
        loss=dict(ploss_scale=1, mloss_scale=1, eloss_scale=1,
                  dynamic_scalar=True, anime_loss_weight=None),
        optim=dict(name="Adam", args=dict(lr=1e-3, weight_decay=0), lr_scheduler=None),
        trainer=dict(max_epochs=1, save_gap_epochs=1, valid_gap_epochs=0,
                     reference_metric="ploss", reference_metric_larger=False),
        dataset_anime=dict(speakers=dict(m0=0), emotions=dict(neutral=0)),
        model=dict(face_data_type="dgrad_3d", prediction_type="face_data"),
    ))


def _batch(bsz=8):
    rng = np.random.default_rng(0)
    return {
        "audio_feat": rng.normal(size=(bsz, 8, 16, 3)).astype(np.float32),
        "speaker_id": np.zeros((bsz,), np.int32),
        "dgrad_3d_scale": rng.normal(0, 0.01, (bsz, 1, 10, 6)).astype(np.float32),
        "dgrad_3d_rotat": rng.normal(0, 0.01, (bsz, 1, 10, 3)).astype(np.float32),
        "anime_weight": np.ones((bsz,), np.float32),
    }


class TestResume:
    def test_train_save_resume(self, tmp_path):
        from test_model_and_losses import _tiny_model

        hp = _tiny_hp()
        model = _tiny_model()
        exp = Experiment(hp, model, log_dir=str(tmp_path / "run"), training=True)
        trainer = Trainer(exp, train_loader=[_batch() for _ in range(3)])
        trainer.train()
        step1 = int(jax.device_get(exp.state.step))
        assert step1 == 3
        assert os.path.exists(str(tmp_path / "run" / "last.ckpt"))

        # resume in a fresh Experiment (restart-after-crash story,
        # SURVEY.md §5 "Recovery = restart with --load_from last.ckpt")
        exp2 = Experiment(hp, model, log_dir=str(tmp_path / "run2"), training=True,
                          load_from=str(tmp_path / "run" / "last.ckpt"))
        assert int(jax.device_get(exp2.state.step)) == step1
        assert exp2.epoch == 1
        p1 = jax.tree_util.tree_leaves(jax.device_get(exp.state.params))[0]
        p2 = jax.tree_util.tree_leaves(jax.device_get(exp2.state.params))[0]
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        # scaler EMA state survives
        assert float(exp2.state.scalers["dyn_p_scale"].beta_t) < 1.0

        # and training continues from there
        hp.trainer.set_key("max_epochs", 2)
        trainer2 = Trainer(exp2, train_loader=[_batch() for _ in range(2)])
        trainer2.train()
        assert int(jax.device_get(exp2.state.step)) == step1 + 2


class TestHooks:
    def test_hook_registry_fires(self, tmp_path):
        from test_model_and_losses import _tiny_model

        calls = []

        @Trainer.register_hook("prev_epoch")
        def on_prev_epoch(exp, **kw):
            calls.append(("prev_epoch", kw.get("epoch")))

        @Trainer.register_hook("post_train")
        def on_post_train(exp, **kw):
            calls.append(("post_train", kw.get("epoch")))

        try:
            hp = _tiny_hp()
            model = _tiny_model()
            exp = Experiment(hp, model, log_dir=str(tmp_path / "h"), training=True)
            Trainer(exp, train_loader=[_batch()]).train()
            assert ("prev_epoch", 0) in calls
            assert ("post_train", 0) in calls
        finally:
            Trainer._hooks["prev_epoch"].remove(on_prev_epoch)
            Trainer._hooks["post_train"].remove(on_post_train)


class TestAuxLoaders:
    def test_aux_loader_cycles(self, tmp_path):
        from test_model_and_losses import _tiny_model

        hp = _tiny_hp()
        hp.trainer.set_key("max_epochs", 1)
        model = _tiny_model()
        exp = Experiment(hp, model, log_dir=str(tmp_path / "aux"), training=True)
        # 3 main batches + a 1-batch aux loader that must cycle 3 times
        trainer = Trainer(exp, train_loader=[_batch() for _ in range(3)],
                          aux_loaders={"speech": [_batch()]})
        trainer.train()
        # 3 main + 3 aux steps
        assert int(jax.device_get(exp.state.step)) == 6


class TestProfileWindow:
    def test_trace_captured_during_training(self, tmp_path):
        """trainer.profile hparam captures a jax.profiler trace of warm steps
        (SURVEY §5 tracing — the TPU-native equivalent)."""
        import glob

        from test_model_and_losses import _tiny_model

        hp = _tiny_hp()
        prof_dir = str(tmp_path / "prof")
        hp.trainer.set_key("profile",
                           dict(dir=prof_dir, start_step=1, num_steps=2))
        model = _tiny_model()
        exp = Experiment(hp, model, log_dir=str(tmp_path / "run"), training=True)
        trainer = Trainer(exp, train_loader=[_batch() for _ in range(4)])
        trainer.train()
        assert not trainer._prof_active
        traces = glob.glob(os.path.join(prof_dir, "**", "*.xplane.pb"),
                           recursive=True) + glob.glob(
            os.path.join(prof_dir, "**", "*.trace.json.gz"), recursive=True)
        assert traces, f"no profiler artifacts under {prof_dir}"


class TestPlotPlugins:
    def test_plot_gap_steps_writes_tb_images(self, tmp_path):
        """plot_gap_steps triggers plot_forward_fn + the shipped TB plugins
        mid-epoch (reference trainer.py plot hooks / model/logger.py)."""
        import glob

        from test_model_and_losses import _tiny_model

        hp = _tiny_hp()
        hp.trainer.set_key("plot_gap_steps", 2)
        model = _tiny_model()
        exp = Experiment(hp, model, log_dir=str(tmp_path / "run"), training=True)
        trainer = Trainer(exp, train_loader=[_batch() for _ in range(4)])
        trainer.train()
        events = glob.glob(str(tmp_path / "run" / "**" / "events.out.tfevents*"),
                           recursive=True)
        assert events, "no TB event files written"
        # plugins ran: image summaries present in some event file
        found = False
        for ev in events:
            with open(ev, "rb") as fp:
                if b"inputs/mel" in fp.read():
                    found = True
        assert found, "plot plugin image tag not found in TB events"


class TestMeshAudioPlugins:
    def test_mesh_and_audio_plugins_write_events(self, tmp_path):
        """The pred/true-mesh and audio-clip TB plugins (reference
        logger.py:14-34 plot_anime_frames + :95-103 _add_audio) run against
        the real flagship model and land their tags in the event files
        (VERDICT r4 #9)."""
        import sys
        import types

        sys.path.insert(0, "tests")
        import glob

        import jax.numpy as jnp
        from _assets import ensure_pca_assets

        from sdfa_tpu.models import build_model
        from sdfa_tpu.tools import configure
        from sdfa_tpu.train import summary as summary_lib

        hp = configure("dgrad", dataset_root=ensure_pca_assets())
        model = build_model(hp, load_pca=True)
        rng = jax.random.PRNGKey(0)
        feats = jnp.zeros((2, 64, 128, 3), jnp.float32)
        spk = jnp.zeros((2,), jnp.int32)
        variables = model.init({"params": rng, "dropout": rng},
                               feats, spk, False)
        preds, _, aligns = model.apply(variables, feats, spk, False)

        state = types.SimpleNamespace(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            constants=variables.get("constants", {}))
        exp = types.SimpleNamespace(model=model, state=state, hp=hp)
        gen = np.random.default_rng(0)
        batch = {
            "audio_feat": np.asarray(feats),
            "speaker_id": np.zeros((2,), np.int32),
            "dgrad_3d_scale": gen.normal(
                0, 0.001, (2, 1, 9976, 6)).astype(np.float32),
            "dgrad_3d_rotat": gen.normal(
                0, 0.001, (2, 1, 9976, 3)).astype(np.float32),
            "signal": gen.normal(0, 0.1, (2, 4544)).astype(np.float32),
        }
        outputs = dict(prediction=jax.device_get(preds),
                       align_dict=jax.device_get(aligns),
                       audio_feat=np.asarray(feats))
        summary = summary_lib.SummaryHelper(str(tmp_path / "tb"))
        assert summary.enabled
        summary_lib.run_plot_plugins(summary, exp, batch, outputs, 1)
        summary.flush()

        blob = b""
        for ev in glob.glob(str(tmp_path / "tb" / "events.out.tfevents*")):
            with open(ev, "rb") as fp:
                blob += fp.read()
        for tag in (b"frame-pred", b"frame-true", b"audio-signal"):
            assert tag in blob, f"plugin tag {tag} missing from TB events"


class TestSaveGapSteps:
    def test_step_cadence_checkpoints(self, tmp_path):
        """save_gap_steps checkpoints every N optimizer steps
        (reference trainer.py:55,356)."""
        from test_model_and_losses import _tiny_model

        hp = _tiny_hp()
        hp.trainer.delete_key("save_gap_epochs")
        hp.trainer.set_key("save_gap_steps", 2)
        model = _tiny_model()
        exp = Experiment(hp, model, log_dir=str(tmp_path / "run"), training=True)
        Trainer(exp, train_loader=[_batch() for _ in range(5)]).train()
        cps = sorted(f for f in os.listdir(tmp_path / "run") if f.startswith("epoch"))
        # steps 2 and 4 checkpointed mid-epoch (+ the end-of-train save)
        assert any("step000002" in f for f in cps)
        assert any("step000004" in f for f in cps)

    def test_both_cadences_rejected(self, tmp_path):
        from test_model_and_losses import _tiny_model

        hp = _tiny_hp()
        hp.trainer.set_key("save_gap_steps", 3)  # epochs cadence already set
        model = _tiny_model()
        exp = Experiment(hp, model, log_dir=str(tmp_path / "run"), training=True)
        with pytest.raises(AssertionError, match="XOR"):
            Trainer(exp, train_loader=[])


class TestResumeEquivalence:
    def test_resume_equivalence(self, tmp_path):
        """Kill-and-resume must be invisible: train 5 steps straight vs
        3 steps + checkpoint + fresh-process resume + 2 steps, identical
        batches → bitwise-identical parameters, optimizer and scaler
        state (VERDICT r2 #5). Holds because the per-step dropout rng is
        FOLDED from the global step, not split sequentially."""
        from test_model_and_losses import _tiny_model

        def batches(k0, k1):
            rng = np.random.default_rng(100)
            all_b = []
            for i in range(5):
                b = _batch()
                b["audio_feat"] = rng.normal(
                    size=b["audio_feat"].shape).astype(np.float32)
                all_b.append(b)
            return all_b[k0:k1]

        # straight 5-step run
        hp = _tiny_hp()
        exp_a = Experiment(hp, _tiny_model(), log_dir=str(tmp_path / "a"),
                           training=True)
        Trainer(exp_a, train_loader=batches(0, 5)).train()

        # interrupted run: 3 steps, save, resume in a fresh Experiment
        hp_b = _tiny_hp()
        exp_b = Experiment(hp_b, _tiny_model(), log_dir=str(tmp_path / "b"),
                           training=True)
        Trainer(exp_b, train_loader=batches(0, 3)).train()
        ckpt = str(tmp_path / "b" / "last.ckpt")
        assert os.path.exists(ckpt)
        hp_c = _tiny_hp()
        hp_c.trainer.set_key("max_epochs", 2)
        exp_c = Experiment(hp_c, _tiny_model(), log_dir=str(tmp_path / "c"),
                           training=True, load_from=ckpt)
        Trainer(exp_c, train_loader=batches(3, 5)).train()

        assert int(jax.device_get(exp_a.state.step)) == int(
            jax.device_get(exp_c.state.step)) == 5
        pa = jax.device_get(exp_a.state.params)
        pc = jax.device_get(exp_c.state.params)
        for la, lc in zip(jax.tree_util.tree_leaves(pa),
                          jax.tree_util.tree_leaves(pc)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lc))
        oa = jax.device_get(exp_a.state.opt_state)
        oc = jax.device_get(exp_c.state.opt_state)
        for la, lc in zip(jax.tree_util.tree_leaves(oa),
                          jax.tree_util.tree_leaves(oc)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lc))
        for name in exp_a.state.scalers:
            np.testing.assert_array_equal(
                np.asarray(jax.device_get(exp_a.state.scalers[name].vt)),
                np.asarray(jax.device_get(exp_c.state.scalers[name].vt)))


class TestLossHistoryAcrossResume:
    def test_csv_keeps_pre_kill_epochs(self, tmp_path):
        """epoch-loss.csv is rewritten from in-memory history each epoch;
        a resumed run must seed that history from the file so the
        pre-kill epochs survive (long-run artifact integrity)."""
        import csv as csv_mod

        from test_model_and_losses import _tiny_model

        hp = _tiny_hp()
        hp.trainer.set_key("max_epochs", 2)
        run = str(tmp_path / "run")
        exp = Experiment(hp, _tiny_model(), log_dir=run, training=True)
        Trainer(exp, train_loader=[_batch() for _ in range(2)]).train()
        path = os.path.join(run, "train_log", "loss", "epoch-loss.csv")
        with open(path) as fp:
            rows_before = list(csv_mod.DictReader(fp))
        assert [r["epoch"] for r in rows_before] == ["0", "1"]

        hp2 = _tiny_hp()
        hp2.trainer.set_key("max_epochs", 3)
        exp2 = Experiment(hp2, _tiny_model(), log_dir=run, training=True,
                          load_from=os.path.join(run, "last.ckpt"))
        Trainer(exp2, train_loader=[_batch() for _ in range(2)]).train()
        with open(path) as fp:
            rows = list(csv_mod.DictReader(fp))
        assert [r["epoch"] for r in rows] == ["0", "1", "2"]
        # pre-kill values preserved (same loss column, same value)
        loss_key = next(k for k in rows_before[0] if k.startswith("train_"))
        assert float(rows[0][loss_key]) == pytest.approx(
            float(rows_before[0][loss_key]))
