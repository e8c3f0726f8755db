"""Data pipeline tests: csv, synthetic dataset, sliding window geometry."""

import os

import numpy as np
import pytest

from sdfa_tpu.data import DatasetSlidingWindow, csvio, synthetic
from sdfa_tpu.tools import configure


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth") / "voca")
    synthetic.generate(root, "dgrad_3d", speakers=["m0", "f0"],
                       sentences_per_speaker=1, seconds_per_sentence=1.0,
                       pca_dims=(8, 8))
    return root


@pytest.fixture(scope="module")
def hp(synth_root):
    hp = configure("dgrad", dataset_root=synth_root)
    return hp


class TestCsv:
    def test_roundtrip_with_path_rerooting(self, tmp_path):
        rows = [{
            "npy_data_path:path": str(tmp_path / "data" / "x"),
            "speaker:str": "m0",
            "n:int": 3,
            "ts:float": 1.5,
        }]
        p = tmp_path / "m.csv"
        csvio.write_csv(str(p), rows)
        back = csvio.read_csv(str(p))
        assert back[0]["npy_data_path:path"] == str(tmp_path / "data" / "x")
        assert back[0]["n:int"] == 3 and back[0]["ts:float"] == 1.5


class TestSlidingWindow:
    def test_frame_grid_keeps_gathered_frames_delta_interior(self, hp):
        """ADVICE r2 #1: frame_grid's right pad must keep every GATHERED
        frame >= 4 grid frames away from the end, so the 9-tap Savitzky-
        Golay delta never applies its right-edge fits to a frame a window
        reads — for ALL clip lengths, including ones whose frame count
        lands exactly on the jit bucket boundary."""
        from sdfa_tpu.audio.pipeline import WindowSpec

        wspec = WindowSpec(hp)
        sr = int(hp.audio.sample_rate)
        lengths = list(range(sr // 2, 4 * sr, 977))  # irregular sweep
        # plus lengths engineered to land near/on the 256-frame bucket
        for t_target in (252, 253, 254, 255, 256, 257):
            lengths.append(t_target * wspec.hop_size + wspec.win_size)
        for n in lengths:
            for bucket in (0, 256):
                frame_idx, _, pad_l, pad_r, t_total = wspec.frame_grid(
                    n, bucket=bucket)
                if bucket:
                    assert t_total % bucket == 0, (n, t_total)
                assert int(frame_idx.max()) + 4 < t_total, (
                    n, bucket, int(frame_idx.max()), t_total)
                # the padded signal really yields t_total frames
                total = n + pad_l + pad_r
                assert 1 + (total - wspec.win_size) // wspec.hop_size \
                    == t_total

    def test_window_geometry(self, hp, synth_root):
        ds = DatasetSlidingWindow(hp, training=False)
        # sliding = 64·63 + 512 = 4544 samples = 0.568 s (SURVEY.md §2.5)
        assert ds._sliding_size == 4544
        s, e = ds.coordinates[0]["range"]
        assert e - s == 4544

    def test_item_shapes_and_pairing(self, hp):
        ds = DatasetSlidingWindow(hp, training=False)
        item = ds[0]
        assert item["audio_feat_0"].shape == (64, 128, 3)
        assert item["dgrad_3d_scale_0"].shape == (1, 9976, 6)
        assert item["frame_id_1"] == item["frame_id_0"] + 1

    def test_collate_doubles_batch(self, hp):
        ds = DatasetSlidingWindow(hp, training=False)
        batch = ds.collate([ds[0], ds[1], ds[2]])
        assert batch["audio_feat"].shape == (6, 64, 128, 3)
        assert batch["speaker_id"].shape == (6,)
        # first half = frame i, second half = frame i+1 of the SAME items
        np.testing.assert_allclose(batch["audio_feat"][0], ds[0]["audio_feat_0"], atol=1e-6)

    def test_training_augmentation_changes_features(self, hp):
        ds = DatasetSlidingWindow(hp, training=True)
        a = ds[0]["audio_feat_0"]
        b = ds[0]["audio_feat_0"]
        assert not np.allclose(a, b)  # random augmentation applied

    def test_eval_features_deterministic(self, hp):
        ds = DatasetSlidingWindow(hp, training=False)
        a = ds[0]["audio_feat_0"]
        b = ds[0]["audio_feat_0"]
        np.testing.assert_allclose(a, b, atol=0)

    def test_fetch_audio_features(self, hp):
        sig = np.zeros(8000, np.float32)
        out = DatasetSlidingWindow.fetch_audio_features(sig, hp)
        # ~60 windows per second + lead-in/out margin
        assert 55 <= len(out["tslist"]) <= 130
        assert out["audio_feat"].shape[1:] == (64, 128, 3)
        # ts spacing is exactly one frame (1000/60 ms)
        diffs = np.diff(out["tslist"])
        assert set(diffs.tolist()) <= {16, 17}


class TestDevicePipelineParity:
    def test_device_features_match_host(self, hp):
        from sdfa_tpu.audio import pipeline as ap

        rng = np.random.default_rng(0)
        sig = (0.2 * rng.normal(size=6000)).clip(-1, 1).astype(np.float32)
        host = DatasetSlidingWindow.fetch_audio_features(sig, hp)
        dev = ap.fetch_audio_features_device(sig, hp)
        assert host["tslist"] == dev["tslist"]
        a = np.asarray(dev["audio_feat"])
        b = host["audio_feat"]
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-3)
        # the mel channel (not deltas) should be extremely close
        np.testing.assert_allclose(a[..., 0], b[..., 0], atol=2e-4)


class TestCompactTargets:
    def test_f16_targets_only_when_enabled(self, hp, synth_root):
        from sdfa_tpu.tools import configure

        ds32 = DatasetSlidingWindow(hp, training=True)
        b32 = next(ds32.raw_batches(2))
        assert b32["dgrad_3d_scale"].dtype == np.float32

        hp16 = configure("dgrad", dataset_root=synth_root,
                         overrides={"trainer": {"compact_targets": True}})
        ds16 = DatasetSlidingWindow(hp16, training=True)
        b16 = next(ds16.raw_batches(2))
        assert b16["dgrad_3d_scale"].dtype == np.float16
        assert b16["dgrad_3d_rotat"].dtype == np.float16
        # non-target arrays untouched
        assert b16["raw_wav"].dtype == np.float32
        # payload actually halves for the target arrays
        assert b16["dgrad_3d_scale"].nbytes * 2 == b32["dgrad_3d_scale"].nbytes

    def test_loss_close_to_f32(self):
        """f16 targets change the loss only at f16 resolution."""
        import jax
        import jax.numpy as jnp

        from test_experiment_resume import _tiny_hp, _batch
        from test_model_and_losses import _tiny_model
        from sdfa_tpu.train.trainer import make_loss_fn
        from sdfa_tpu.models import ScalerState

        hp = _tiny_hp()
        model = _tiny_model()
        batch32 = _batch()
        feat = jnp.asarray(batch32["audio_feat"])
        spk = jnp.asarray(batch32["speaker_id"])
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)}, feat, spk, False)
        loss_fn = make_loss_fn(model, hp)
        scalers = {n: ScalerState.init() for n in
                   ("dyn_p_scale", "dyn_m_scale", "dyn_p_rotat", "dyn_m_rotat", "dyn_e")}
        batch16 = dict(batch32,
                       dgrad_3d_scale=batch32["dgrad_3d_scale"].astype(np.float16),
                       dgrad_3d_rotat=batch32["dgrad_3d_rotat"].astype(np.float16))
        args = (variables["params"], variables.get("batch_stats", {}),
                variables.get("constants", {}), scalers)
        rng = jax.random.PRNGKey(2)
        t32, _ = loss_fn(*args, batch32, rng, False)
        t16, _ = loss_fn(*args, batch16, rng, False)
        assert abs(float(t32) - float(t16)) < 2e-3 * max(1.0, abs(float(t32)))


class TestPitchShiftAug:
    """random_pitch_shift source augmentation (VERDICT r2 #9; reference
    sliding_window.py:140-147 + the commented-out preload.py:702-730)."""

    def test_pitch_shift_moves_fundamental(self):
        from sdfa_tpu.audio import dsp

        sr = 8000
        t = np.arange(sr) / sr
        y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        for steps in (4, -2):
            out = dsp.pitch_shift(y, sr, steps)
            assert out.shape == y.shape
            seg = out[sr // 4: sr // 4 + sr // 2]
            freqs = np.fft.rfftfreq(len(seg), 1 / sr)
            peak = freqs[np.abs(np.fft.rfft(seg * np.hanning(len(seg)))).argmax()]
            want = 440 * 2 ** (steps / 12)
            assert abs(peak - want) < 8, (steps, peak, want)

    def _ps_hp(self, synth_root):
        return configure("dgrad", dataset_root=synth_root,
                         overrides=dict(audio=dict(feature=dict(
                             random_pitch_shift=True))))

    def test_missing_variants_raise_with_remedy(self, synth_root):
        ds = DatasetSlidingWindow(self._ps_hp(synth_root), training=True)
        with pytest.raises(KeyError, match="pitch_variants=True"):
            ds[0]

    def test_ps_sources_selected_and_consumed(self, synth_root, tmp_path):
        from sdfa_tpu.audio import dsp

        # graft ps variants onto the synthetic blobs (what
        # preload_voca(pitch_variants=True) writes for real data)
        import glob
        for p in glob.glob(os.path.join(synth_root, "data", "*", "*", "*_audio.npz")):
            blob = dict(np.load(p))
            if "audio_ps_u4" in blob:
                continue
            for sfx, steps in (("u4", 4), ("u2", 2), ("d2", -2), ("d4", -4)):
                blob[f"audio_ps_{sfx}"] = dsp.pitch_shift(
                    blob["audio"], int(blob["sr"]), steps)
                blob[f"audio_8k_ps_{sfx}"] = dsp.pitch_shift(
                    blob["audio_8k"], 8000, steps)
            np.savez(p, **blob)

        ds = DatasetSlidingWindow(self._ps_hp(synth_root), training=True)
        # the two ps families must show up in the selection distribution
        blob = ds._load_audio_blob(ds.info_list[0]["npy_data_path:path"])
        picked = set()
        for _ in range(200):
            sig, sr = ds._choose_source(blob, int(blob["sr"]))
            assert sr in (8000, int(blob["sr"]))
            picked.add(len(sig) if sig.flags["C_CONTIGUOUS"] else -1)
        # items still build end-to-end with augmented sources
        item = ds[0]
        assert item["audio_feat_0"].shape == (64, 128, 3)
        # raw mode too (require_sr filter keeps only config-sr sources)
        raw = ds.raw_item(0)
        assert raw["raw_wav_0"].ndim == 1
