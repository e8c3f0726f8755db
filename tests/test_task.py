"""AnimationTask inference-wrapper tests (tiny model, fast on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdfa_tpu.task import AnimationTask
from sdfa_tpu.utils.config import ConfigDict

from test_model_and_losses import _tiny_model


def _tiny_hparams():
    return ConfigDict(dict(
        audio=dict(
            sample_rate=8000,
            feature=dict(name="mel", with_delta=True, sliding_window_frames=12),
            mel=dict(n_mels=16, win_size=512, hop_size=64, win_fn="hamm",
                     padding=False, fmin=50, fmax=3600, ref_db=20, top_db=80,
                     normalize=True, clip_normalized=True, subtract_mean=False,
                     preemphasis=0.65),
        ),
        anime=dict(fps=60, feature=dict(ts_delta=100)),
        dataset_anime=dict(speakers=dict(m0=0, m1=1), emotions=dict(neutral=0),
                           audio_target_db=-24.5),
        ensembling_ms=0,
        model=dict(face_data_type="dgrad_3d", prediction_type="face_data"),
    ))


@pytest.fixture(scope="module")
def task():
    model = _tiny_model()
    hp = _tiny_hparams()
    feat = jnp.zeros((2, 12, 16, 3))
    spk = jnp.zeros((2,), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, feat, spk, False)
    return AnimationTask(hp, model, variables, batch_windows=16)


class TestAnimationTask:
    def test_feature_to_anime_padding(self, task):
        # 21 windows with bs=16 → one full chunk + one padded chunk
        feats = np.random.default_rng(0).normal(size=(21, 12, 16, 3)).astype(np.float32)
        animes, others = task.feature_to_anime(feats, speaker_id=1)
        assert animes.shape == (21, 90)
        assert others["latent"].shape[0] == 21

    def test_generate_animation_and_cache(self, task):
        rng = np.random.default_rng(1)
        sig = (0.1 * rng.normal(size=4000)).clip(-1, 1).astype(np.float32)
        ts1, an1, _ = task.generate_animation(sig, speaker="m1")
        assert len(ts1) == len(an1)
        # same signal → cached features (identical result)
        ts2, an2, _ = task.generate_animation(sig, speaker="m1")
        np.testing.assert_array_equal(an1, an2)

    def test_ensembling_averages(self, task):
        rng = np.random.default_rng(2)
        sig = (0.1 * rng.normal(size=4000)).clip(-1, 1).astype(np.float32)
        _, plain, _ = task.generate_animation(sig, speaker=0, ensembling_ms=0)
        _, ens, _ = task.generate_animation(sig, speaker=0, ensembling_ms=50)
        assert plain.shape == ens.shape
        assert not np.allclose(plain, ens)  # shifted pass mixed in

    def test_speaker_name_resolution(self, task):
        sig = np.zeros(4000, np.float32)
        ts_a, a, _ = task.generate_animation(sig, speaker="m0")
        ts_b, b, _ = task.generate_animation(sig, speaker=0)
        np.testing.assert_array_equal(a, b)


class TestDatasetDirSource:
    def test_truth_track_from_dataset_dir(self, task, tmp_path):
        """Directory eval source → truth frames + audio blob loaded
        (reference eval_utils._load_source dataset branch)."""
        import os
        import numpy as np

        d = str(tmp_path / "sent001")
        os.makedirs(d)
        # 6 fake 60fps dgrad frames (tiny model dim: 10 tris → 90 floats)
        for i in range(6):
            np.save(os.path.join(d, f"{i:06d}.npy"),
                    np.zeros(90, np.float32))
        sig = (0.1 * np.sin(2 * np.pi * 200 * np.arange(8000) / 8000)).astype(np.float32)
        np.savez(d + "_audio.npz", sr=8000, start_ts=0.0, audio=sig)

        results = task.evaluate(
            [(d, "speaker=m0")], output_dir=str(tmp_path / "out"),
            save_video=False, export_mesh_frames=False,
        )
        assert len(results) == 1
        assert results[0]["animes"].shape[1] == 90


class TestTracedRoundTrip:
    def test_load_traced_matches_live_model(self, tmp_path):
        """hparams.json + model.msgpack (the trace_model dump format) must
        rebuild a task whose outputs match the live model bit-for-bit."""
        import os

        import flax.serialization as fser

        from sdfa_tpu import api
        from sdfa_tpu.models import build_model

        hp = _tiny_hparams()
        enc = [
            ["permute", [0, 3, 2, 1]],
            ["conv2d", 3, 4, [3, 1], [1, 1], "act=lrelu@a:0.2"],
            ["pool2d", "max", [16, 1]],
            ["squeeze", 2],
            ["permute", [0, 2, 1]],
            ["lstm", 4, 8, "num_layers=1"],
        ]
        hp.set_key("model", ConfigDict(dict(
            face_data_type="dgrad_3d", prediction_type="face_data",
            weight_norm=True,
            speaker_embedding=dict(num_speakers=2, using_onehot=True),
            audio_encoder=dict(layers=enc),
            output=dict(
                using_pca=False,
                layers=[["fc", 10, 8, "act=tanh", "cat_condition=2"]],
                layers_scale=[["fc", 10, 8, "cat_condition=2"], ["fc", 8, 60, "act=linear"]],
                layers_rotat=[["fc", 10, 8, "cat_condition=2"], ["fc", 8, 30, "act=linear"]],
                output_dim_scale=60, output_dim_rotat=30,
            ),
        )))
        model = build_model(hp, load_pca=False)
        feat = jnp.zeros((2, 12, 16, 3))
        spk = jnp.zeros((2,), jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)}, feat, spk, False)

        dump = str(tmp_path / "traced")
        os.makedirs(dump)
        hp.dump(os.path.join(dump, "hparams.json"))
        with open(os.path.join(dump, "model.msgpack"), "wb") as fp:
            fp.write(fser.to_bytes(jax.device_get(variables)))

        task = api.load_traced(dump, batch_windows=8)
        feats = np.random.default_rng(3).normal(size=(5, 12, 16, 3)).astype(np.float32)
        got, _ = task.feature_to_anime(feats, speaker_id=1)

        ref_task = AnimationTask(hp, model, variables, batch_windows=8)
        want, _ = ref_task.feature_to_anime(feats, speaker_id=1)
        np.testing.assert_array_equal(got, want)


class TestGenerateVertices:
    """generate_vertices (device-fused decode+solve, flat download) equals
    generate_animation + frames_to_meshes (download dgrads, re-upload,
    solve) on the shipped flagship model."""

    @pytest.fixture(scope="class")
    def shipped_task(self):
        from _assets import ensure_pca_assets
        from sdfa_tpu.models import build_model
        from sdfa_tpu.tools import configure

        hp = configure("dgrad", dataset_root=ensure_pca_assets())
        model = build_model(hp, load_pca=True)
        rng = jax.random.PRNGKey(0)
        variables = model.init(
            {"params": rng, "dropout": rng},
            jnp.zeros((2, 64, 128, 3), jnp.float32),
            jnp.zeros((2,), jnp.int32), False)
        # device_frontend+overlap ON so generate_vertices takes the FUSED
        # device path (on the CPU test backend the defaults would fall back
        # to generate_animation + frames_to_meshes — a tautological test)
        task = AnimationTask(hp, model, variables,
                             device_frontend=True, overlap_frontend=True)
        assert task.overlap_frontend, "fused path must be active under test"
        return hp, task

    def test_fused_matches_roundtrip(self, shipped_task):
        from sdfa_tpu.viewer import frame as frame_mod

        hp, task = shipped_task
        sr = int(hp.audio.sample_rate)
        t = np.arange(int(1.2 * sr)) / sr
        sig = (0.3 * np.sin(2 * np.pi * 150 * t)
               * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)

        ts_v, verts = task.generate_vertices(sig, 0)
        ts_a, animes, _ = task.generate_animation(sig, 0)
        assert ts_v == ts_a
        ref, _ = frame_mod.frames_to_meshes(animes, "dgrad_3d")
        assert verts.shape == ref.shape == (len(animes), 5023, 3)
        np.testing.assert_allclose(verts, ref, atol=1e-6)

    def test_fallback_when_overlap_off(self, shipped_task):
        hp, task = shipped_task
        from sdfa_tpu.task import AnimationTask as AT

        task_exact = AT(hp, task.model, task.variables, overlap_frontend=False)
        sr = int(hp.audio.sample_rate)
        t = np.arange(int(1.2 * sr)) / sr
        sig = (0.2 * np.sin(2 * np.pi * 180 * t)).astype(np.float32)
        ts, verts = task_exact.generate_vertices(sig, 0)
        assert verts.shape[1:] == (5023, 3) and np.isfinite(verts).all()

    def test_i16_wire_matches_f32(self, shipped_task):
        """generate_vertices(wire='i16') (device-quantized int16 download,
        the StreamingServer wire format) == the f32 wire within the
        WIRE_LSB/2 = 5e-6 m quantization bound, dequantized to float32."""
        from sdfa_tpu.task import WIRE_LSB

        hp, task = shipped_task
        sr = int(hp.audio.sample_rate)
        t = np.arange(int(1.2 * sr)) / sr
        sig = (0.3 * np.sin(2 * np.pi * 150 * t)
               * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
        ts_f, verts_f = task.generate_vertices(sig, 0)
        ts_q, verts_q = task.generate_vertices(sig, 0, wire="i16")
        assert ts_f == ts_q
        assert verts_q.dtype == np.float32
        assert np.abs(verts_q - verts_f).max() <= WIRE_LSB / 2 + 1e-7

    def test_i8d_wire_matches_f32_across_chunks(self, shipped_task,
                                                monkeypatch):
        """generate_vertices(wire='i8d'): frame 0 absolute int16 (LSB8
        units) + clamped int8 deltas, carry device-resident across window
        chunks. Forcing a tiny SDFA_MAX_WINDOW_BATCH exercises the
        inter-chunk carry; bound = WIRE_LSB8/2 = 2e-5 m (drift-free)."""
        from sdfa_tpu.task import WIRE_LSB8, AnimationTask as AT

        hp, task = shipped_task
        sr = int(hp.audio.sample_rate)
        t = np.arange(int(1.2 * sr)) / sr
        sig = (0.3 * np.sin(2 * np.pi * 150 * t)
               * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
        ts_f, verts_f = task.generate_vertices(sig, 0)
        ts_d, verts_d = task.generate_vertices(sig, 0, wire="i8d")
        assert ts_f == ts_d
        assert verts_d.dtype == np.float32
        assert np.abs(verts_d - verts_f).max() <= WIRE_LSB8 / 2 + 1e-7
        # multi-chunk: a 5 s clip (W ≈ 300 > the 256 cap → 2 chunks, the
        # second padded) on a fresh task, exercising the device-resident
        # inter-chunk carry
        t5 = np.arange(int(5.0 * sr)) / sr
        sig5 = (0.3 * np.sin(2 * np.pi * 150 * t5)
                * (1 + 0.4 * np.sin(2 * np.pi * 3 * t5))).astype(np.float32)
        monkeypatch.setenv("SDFA_MAX_WINDOW_BATCH", "256")
        task2 = AT(hp, task.model, task.variables)
        _, verts_f5 = task2.generate_vertices(sig5, 0)
        _, verts_d5 = task2.generate_vertices(sig5, 0, wire="i8d")
        assert len(verts_d5) > 256  # really crossed a chunk boundary
        assert np.abs(verts_d5 - verts_f5).max() <= WIRE_LSB8 / 2 + 1e-7

    def test_coef_wire_matches_f32_and_warmup(self, shipped_task):
        """generate_vertices(wire='coef') downloads only the (W, 265) PCA
        coefficients and reconstructs on the host via CoefDecoder (the f64
        solve oracle) — the latency-oriented single-clip path (VERDICT r4
        #5). Must match the device f32 wire within the device solve's own
        f32-vs-f64 budget; warmup() pre-pays the path's one-time costs."""
        hp, task = shipped_task
        sr = int(hp.audio.sample_rate)
        t = np.arange(int(1.2 * sr)) / sr
        sig = (0.3 * np.sin(2 * np.pi * 150 * t)
               * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
        ts_f, verts_f = task.generate_vertices(sig, 0)
        ts_c, verts_c = task.generate_vertices(sig, 0, wire="coef")
        assert ts_f == ts_c
        assert verts_c.shape == verts_f.shape
        assert np.abs(verts_c - verts_f).max() <= 5e-5
        # warmup is idempotent and returns wall seconds
        assert task.warmup(seconds=1.2, wire="coef") >= 0.0

    def test_chunked_decode_solve_matches_whole(self, shipped_task, monkeypatch):
        """SDFA_DECODE_CHUNK-bounded lax.map decode+solve (the long-clip
        HBM guard) == the single-batch path, exactly."""
        hp, task = shipped_task
        sr = int(hp.audio.sample_rate)
        t = np.arange(int(1.2 * sr)) / sr
        sig = (0.25 * np.sin(2 * np.pi * 160 * t)).astype(np.float32)
        _, want = task.generate_vertices(sig, 0)

        from sdfa_tpu.task import AnimationTask as AT

        monkeypatch.setenv("SDFA_DECODE_CHUNK", "32")
        chunked = AT(hp, task.model, task.variables,
                     device_frontend=True, overlap_frontend=True)
        _, got = chunked.generate_vertices(sig, 0)
        np.testing.assert_allclose(got, want, atol=2e-6)


class TestLoadDatasetTruth:
    def test_negative_frames_sort_numerically(self, tmp_path):
        """-00002 < -00001 < 000000: a lexical sort would play
        [-1, -2, 0, ...]; tslist must carry the true (negative) frame
        times so the truth track aligns with the audio."""
        from sdfa_tpu.task import load_dataset_truth

        d = tmp_path / "sent00"
        d.mkdir()
        order = [-2, -1, 0, 1]
        for fi in order:
            np.save(str(d / f"{fi:06d}.npy"), np.full((4,), float(fi)))
        np.save(str(d / "000000_lips_dist.npy"), np.zeros((1,)))  # excluded
        truth = load_dataset_truth(str(d), fps=60.0)
        np.testing.assert_array_equal(truth["data"][:, 0],
                                      [-2.0, -1.0, 0.0, 1.0])
        np.testing.assert_allclose(
            truth["tslist"], [fi * 1000.0 / 60.0 for fi in order])


class TestLoadTask:
    def test_ckpt_to_task_roundtrip(self, tmp_path):
        """api.load_task(ckpt) rebuilds an AnimationTask from the run
        dir's hparams.json + checkpoint whose outputs match a manually
        constructed task exactly."""
        from test_experiment_resume import _batch, _tiny_hp

        from sdfa_tpu import api
        from sdfa_tpu.models import build_model
        from sdfa_tpu.train import Experiment, Trainer

        hp = _tiny_hp()
        # build_model-compatible spec (load_task reconstructs the model
        # from hparams.json alone)
        hp.set_key("model", ConfigDict(dict(
            face_data_type="dgrad_3d", prediction_type="face_data",
            weight_norm=True,
            speaker_embedding=dict(num_speakers=1, using_onehot=True),
            audio_encoder=dict(layers=[
                ["permute", [0, 3, 2, 1]],
                ["conv2d", 3, 4, [3, 1], [1, 1], "act=lrelu@a:0.2"],
                ["pool2d", "max", [16, 1]],
                ["squeeze", 2],
                ["permute", [0, 2, 1]],
                ["lstm", 4, 8, "num_layers=1"],
            ]),
            output=dict(
                using_pca=False,
                layers=[["fc", 9, 8, "act=tanh", "cat_condition=2"]],
                layers_scale=[["fc", 9, 8, "cat_condition=2"],
                              ["fc", 8, 60, "act=linear"]],
                layers_rotat=[["fc", 9, 8, "cat_condition=2"],
                              ["fc", 8, 30, "act=linear"]],
                output_dim_scale=60, output_dim_rotat=30,
            ),
        )))
        model = build_model(hp, load_pca=False)
        exp = Experiment(hp, model, log_dir=str(tmp_path / "run"), training=True)
        Trainer(exp, train_loader=[_batch() for _ in range(2)]).train()

        task = api.load_task(str(tmp_path / "run" / "last.ckpt"),
                             batch_windows=8)
        feats = np.random.default_rng(9).normal(
            size=(5, 8, 16, 3)).astype(np.float32)
        got, _ = task.feature_to_anime(feats, speaker_id=0)

        variables = {"params": jax.device_get(exp.state.params),
                     "batch_stats": jax.device_get(exp.state.batch_stats),
                     "constants": jax.device_get(exp.state.constants)}
        want, _ = AnimationTask(hp, model, variables,
                                batch_windows=8).feature_to_anime(feats, 0)
        np.testing.assert_array_equal(got, want)


class TestGenerateVerticesOffsets:
    def test_fused_template_add_matches_roundtrip(self):
        """The non-dgrad branch of generate_vertices (verts_off_3d: fused
        template add, no solver) equals generate_animation +
        frames_to_meshes on the shipped offsets model."""
        from _assets import ensure_pca_assets
        from sdfa_tpu.models import build_model
        from sdfa_tpu.tools import configure
        from sdfa_tpu.viewer import frame as frame_mod

        hp = configure("offsets", dataset_root=ensure_pca_assets())
        model = build_model(hp, load_pca=True)
        rng = jax.random.PRNGKey(0)
        variables = model.init(
            {"params": rng, "dropout": rng},
            jnp.zeros((2, 64, 128, 3), jnp.float32),
            jnp.zeros((2,), jnp.int32), False)
        task = AnimationTask(hp, model, variables,
                             device_frontend=True, overlap_frontend=True)
        assert task.overlap_frontend

        sr = int(hp.audio.sample_rate)
        t = np.arange(int(1.2 * sr)) / sr
        sig = (0.3 * np.sin(2 * np.pi * 140 * t)).astype(np.float32)
        ts_v, verts = task.generate_vertices(sig, 0)
        ts_a, animes, _ = task.generate_animation(sig, 0)
        assert ts_v == ts_a
        ref, _ = frame_mod.frames_to_meshes(animes, "verts_off_3d")
        np.testing.assert_allclose(verts, ref, atol=1e-6)

    def test_missing_hparams_raises(self, tmp_path):
        """A bare checkpoint without hparams.json must fail loudly, not
        silently build the default-config model."""
        from sdfa_tpu import api

        ckpt = tmp_path / "orphan.ckpt"
        ckpt.write_bytes(b"\x00")
        with pytest.raises(FileNotFoundError, match="hparams.json"):
            api.load_task(str(ckpt))

    def test_read_only_run_dir(self, tmp_path):
        """load_task is a pure reader: no _state/ dir, no artifacts
        written next to the checkpoint (serving mounts are read-only)."""
        import os

        from test_experiment_resume import _batch, _tiny_hp

        # reuse the run from test_ckpt_to_task_roundtrip's setup is not
        # possible across tests; train a minimal one here
        from sdfa_tpu import api
        from sdfa_tpu.models import build_model
        from sdfa_tpu.train import Experiment, Trainer

        hp = _tiny_hp()
        hp.set_key("model", ConfigDict(dict(
            face_data_type="dgrad_3d", prediction_type="face_data",
            weight_norm=False,
            speaker_embedding=dict(num_speakers=1, using_onehot=True),
            audio_encoder=dict(layers=[
                ["permute", [0, 3, 2, 1]],
                ["conv2d", 3, 4, [3, 1], [1, 1], "act=lrelu@a:0.2"],
                ["pool2d", "max", [16, 1]],
                ["squeeze", 2],
                ["permute", [0, 2, 1]],
                ["lstm", 4, 8, "num_layers=1"],
            ]),
            output=dict(
                using_pca=False,
                layers=[["fc", 9, 8, "act=tanh", "cat_condition=2"]],
                layers_scale=[["fc", 9, 8, "cat_condition=2"],
                              ["fc", 8, 60, "act=linear"]],
                layers_rotat=[["fc", 9, 8, "cat_condition=2"],
                              ["fc", 8, 30, "act=linear"]],
                output_dim_scale=60, output_dim_rotat=30,
            ),
        )))
        model = build_model(hp, load_pca=False)
        run = str(tmp_path / "run")
        exp = Experiment(hp, model, log_dir=run, training=True)
        Trainer(exp, train_loader=[_batch() for _ in range(1)]).train()

        before = set(os.listdir(run))
        task = api.load_task(os.path.join(run, "last.ckpt"))
        assert set(os.listdir(run)) == before  # nothing written
        assert task.model.face_type == "dgrad_3d"
