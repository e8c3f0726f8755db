"""LR schedule math (reference lr_schedulers.py formulas) + configure()."""

import numpy as np
import pytest

import jax.numpy as jnp

from sdfa_tpu.tools import configure
from sdfa_tpu.train import lr_schedules


class TestSchedules:
    def test_constant(self):
        fn, b1, mode = lr_schedules.build(None, 1e-3)
        assert float(fn(jnp.asarray(0))) == pytest.approx(1e-3)
        assert float(fn(jnp.asarray(10000))) == pytest.approx(1e-3)
        assert b1 is None

    def test_exp_decay(self):
        fn, _, _ = lr_schedules.build(
            "ExpDecay", 1e-3,
            dict(mode="step", gamma=0.5, start_iter=10, gap_iters=5, min_scale=0.01),
        )
        assert float(fn(jnp.asarray(5))) == pytest.approx(1e-3)  # before start
        # (20−10)//5 = 2 → 0.5² = 0.25
        assert float(fn(jnp.asarray(20))) == pytest.approx(0.25e-3, rel=1e-5)
        # floor at min_scale
        assert float(fn(jnp.asarray(10_000))) == pytest.approx(1e-5, rel=1e-5)

    def test_noam(self):
        warm = 100
        fn, _, _ = lr_schedules.build("NoamDecay", 1e-3, dict(mode="step", warmup_iters=warm))
        # peak at warmup: scale = 1
        assert float(fn(jnp.asarray(warm - 1))) == pytest.approx(1e-3, rel=1e-3)
        # reference formula at it=24 (cur=25): sqrt(100)·min(25·100^-1.5, 25^-0.5)
        expected = 1e-3 * (warm**0.5) * min(25 * warm**-1.5, 25**-0.5)
        assert float(fn(jnp.asarray(24))) == pytest.approx(expected, rel=1e-5)

    def test_noam_zero_ramps_lr_and_beta(self):
        fn, b1, _ = lr_schedules.build(
            "NoamZero", 1e-3,
            dict(mode="step", warmup_iters=10, start_ramp=100, total_iters=200),
        )
        # before ramp: plain noam, beta1 = 0.9
        assert float(b1(jnp.asarray(50))) == pytest.approx(0.9)
        # end of ramp: lr → 0, beta1 → 0.5
        assert float(fn(jnp.asarray(199))) == pytest.approx(0.0, abs=1e-8)
        assert float(b1(jnp.asarray(199))) == pytest.approx(0.5, abs=0.01)
        # midway: beta1 between
        mid = float(b1(jnp.asarray(150)))
        assert 0.5 < mid < 0.9


class TestConfigure:
    def test_dgrad_assembly(self):
        hp = configure("dgrad", dataset_root="/tmp/cfg_root")
        # model hparams merged over default
        assert hp.tag == "dgrad"
        assert hp.model.face_data_type == "dgrad_3d"
        # dataset file pulled in by name (voca-dgrad)
        assert hp.audio.sample_rate == 8000
        assert hp.audio.mel.n_mels == 128
        assert hp.dataset_anime.speakers["m1"] == 2
        # {DATASET_ANIME_ROOT} substituted
        assert hp.model.output.pca_scale[0].startswith("/tmp/cfg_root")

    def test_entirety_replaced_default_slots(self):
        hp = configure("dgrad", dataset_root="/tmp/cfg_root")
        # default.py model has asr_encoder etc.; dgrad model uses __entirety__
        assert "asr_encoder" not in hp.model
        assert "audio_encoder" in hp.model

    def test_overrides_win(self):
        hp = configure("dgrad", dataset_root="/tmp/x",
                       overrides={"trainer": {"max_epochs": 7}})
        assert hp.trainer.max_epochs == 7
        # sibling keys survive the merge
        assert hp.trainer.save_gap_epochs == 10

    def test_offsets_assembly(self):
        hp = configure("offsets", dataset_root="/tmp/y")
        assert hp.model.face_data_type == "verts_off_3d"
        assert hp.model.output.output_dim == 15069
