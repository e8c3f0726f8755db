"""VOCASET preprocessing pipeline test on a tiny synthetic raw layout."""

import os

import numpy as np
import pytest

from sdfa_tpu import audio as audio_lib
from sdfa_tpu import mesh
from sdfa_tpu.data import csvio
from sdfa_tpu.data.vocaset import config as vc
from sdfa_tpu.data.vocaset import preload

FLAME_PLY = vc.TEMPLATE_PLY


class TestLogMMSE:
    def test_short_signal_passthrough(self):
        sig = np.random.default_rng(0).normal(0, 0.1, 500).astype(np.float32)
        out = preload.denoise_logmmse(sig, 22050)
        np.testing.assert_array_equal(out, sig)

    def test_reduces_noise_floor_keeps_speech(self):
        sr = 16000
        rng = np.random.default_rng(1)
        n = 2 * sr
        noise = rng.normal(0, 0.02, n).astype(np.float32)
        tone = np.zeros(n, np.float32)
        t = np.arange(sr) / sr
        tone[sr // 2 : sr // 2 + sr] = 0.4 * np.sin(2 * np.pi * 220 * t) * np.hanning(sr)
        sig = tone + noise
        out = preload.denoise_logmmse(sig, sr)
        assert out.shape == sig.shape and out.dtype == np.float32
        # noise-only head (first 0.3 s) is attenuated
        head = slice(0, int(0.3 * sr))
        assert np.sqrt((out[head] ** 2).mean()) < 0.5 * np.sqrt((sig[head] ** 2).mean())
        # speech region keeps most of its energy
        mid = slice(int(0.8 * sr), int(1.2 * sr))
        assert np.sqrt((out[mid] ** 2).mean()) > 0.5 * np.sqrt((sig[mid] ** 2).mean())


@pytest.fixture(scope="module")
def fake_voca(tmp_path_factory):
    """Build root/audio/<alias>/sentenceNN.wav + unposedcleaneddata +
    templates with FLAME-topology frames."""
    root = str(tmp_path_factory.mktemp("voca_raw"))
    verts, faces = mesh.read_ply(FLAME_PLY, dtype=np.float64)
    rng = np.random.default_rng(0)
    sr = 22050

    for spk, sent in [("m0", 1), ("m0", 2), ("f4", 21)]:
        alias = vc.SPEAKER_ALIAS[spk]
        # audio
        adir = os.path.join(root, "audio", alias)
        os.makedirs(adir, exist_ok=True)
        t = np.arange(sr) / sr  # 1 s
        wav = (0.3 * np.sin(2 * np.pi * 160 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t)))
        audio_lib.save(os.path.join(adir, f"sentence{sent:02d}.wav"),
                       wav.astype(np.float32), sr)
        # template
        tdir = os.path.join(root, "templates")
        os.makedirs(tdir, exist_ok=True)
        tpl_path = os.path.join(tdir, f"{alias}.ply")
        if not os.path.exists(tpl_path):
            mesh.write_ply(tpl_path, verts, faces)
        # 60fps frames (1 s → 60 frames is slow for tests; use 12 frames)
        mdir = os.path.join(root, "unposedcleaneddata", alias, f"sentence{sent:02d}")
        os.makedirs(mdir, exist_ok=True)
        center = verts[verts[:, 1].argmin()]
        w = np.exp(-np.sum((verts - center) ** 2, axis=1) / (2 * 0.04**2))
        for fi in range(12):
            amp = 0.004 * np.sin(2 * np.pi * fi / 12)
            frame = verts + amp * w[:, None] * np.array([0, -1, 0.2])
            mesh.write_ply(os.path.join(mdir, f"sentence{sent:02d}.{fi:06d}.ply"),
                           frame, faces)
    return root


class TestPipeline:
    def test_clean(self, fake_voca, tmp_path_factory):
        clean_root = str(tmp_path_factory.mktemp("clean"))
        preload.clean_voca(fake_voca, clean_root, sample_rate=8000,
                           target_db=-24.5, speakers=["m0", "f4"])
        wav_path = os.path.join(clean_root, "m0", "m0_001.wav")
        assert os.path.exists(wav_path)
        wav, sr = audio_lib.load(wav_path)
        assert sr == 8000
        # VAD-masked RMS normalize: measure over the same VAD span the
        # normalizer used (reference preload.py:203-210)
        vad_pairs = []
        with open(os.path.join(clean_root, "m0", "m0_001.vad")) as fp:
            for line in fp:
                lo, hi = line.split()
                vad_pairs.append((int(lo), int(hi)))
        mask = np.zeros(len(wav), bool)
        for lo, hi in vad_pairs:
            mask[lo:hi] = True
        rms_db = 20 * np.log10(np.sqrt(np.mean(wav[mask] ** 2)) + 1e-10)
        assert rms_db == pytest.approx(-24.5, abs=1.0)
        # sample-level VAD pairs + sentence text written
        assert os.path.exists(os.path.join(clean_root, "m0", "m0_001.vad"))
        assert os.path.exists(os.path.join(clean_root, "m0", "m0_001.txt"))
        assert os.path.exists(os.path.join(clean_root, "err_list.txt"))
        self.__class__.clean_root = clean_root

    def test_preload(self, fake_voca, tmp_path_factory):
        out_root = str(tmp_path_factory.mktemp("out"))
        preload.preload_voca(fake_voca, self.clean_root, out_root,
                             sample_rate=8000, speakers=["m0", "f4"])
        rows = csvio.read_csv(os.path.join(out_root, "train.csv"))
        assert len(rows) == 2  # m0 sentences
        row = next(r for r in rows if int(r["sentence_id:int"]) == 0)
        d = str(row["npy_data_path:path"])
        # reference path convention: 0-based zfill-3 sentence dirs
        assert os.path.basename(d) == "000"

        # silence pad/trim bookkeeping: the 1 s all-speech clip gets 0.5 s
        # of silence padded at both ends → start_ts = −500 ms
        start_ts = float(row["start_ts:float"])
        assert start_ts == pytest.approx(-500.0, abs=30.0)
        minfi = int(row["anime_minfi:int"])
        maxfi = int(row["anime_maxfi:int"])
        assert minfi == pytest.approx(start_ts * 60 / 1000, abs=1)
        n_audio_frames = int(int(row["audio_samples:int"]) * 60 / 8000)
        assert maxfi == n_audio_frames  # extended past the 12 mesh frames

        files = os.listdir(d)
        # negative frame indices exist and parse (reference "-00001.npy")
        assert f"{minfi:06d}.npy" in files and f"{maxfi:06d}.npy" in files
        assert any(f.startswith("-") for f in files)
        offs = np.load(os.path.join(d, "000000.npy"))
        assert offs.shape == (5023 * 3,)
        # frames far outside the speech span blend to neutral (zeros)
        assert np.abs(np.load(os.path.join(d, f"{minfi:06d}.npy"))).max() == 0.0

        # 4-variant audio blob (reference preload.py:600-609)
        blob = np.load(d + "_audio.npz")
        for key in ("audio", "audio_denoised", "audio_8k", "audio_denoised_8k"):
            assert key in blob, key
        assert int(blob["sr"]) == 8000
        assert float(blob["start_ts"]) == pytest.approx(start_ts)
        # denoised_8k is genuinely denoised (≠ audio_8k — the reference
        # resamples the raw signal twice, preload.py:600-601)
        assert not np.allclose(blob["audio_8k"], blob["audio_denoised_8k"])

        # signed lips distance against the global FLAME template
        lips = np.load(os.path.join(d, "000000_lips_dist.npy"))
        assert lips.shape == ()

        # valid speaker f4 kept (0-based sentence 20 ≥ 20)
        valid = csvio.read_csv(os.path.join(out_root, "valid.csv"))
        assert len(valid) == 1
        self.__class__.out_root = out_root

    def test_nonzero_start_ts_roundtrip(self, fake_voca):
        """A window at media-time ts must fetch the anime frame at
        ts + start_ts·(−1)… i.e. the sliding-window target lookup honors
        the blob's start_ts (sliding_window.py:176-179 equivalent)."""
        from sdfa_tpu.data.sliding_window import DatasetSlidingWindow
        from sdfa_tpu.tools import configure

        rows = csvio.read_csv(os.path.join(self.out_root, "train.csv"))
        row = rows[0]
        hp = configure("dgrad", dataset_root=self.out_root)
        hp.model.set_key("face_data_type", "verts_off_3d")
        ds = DatasetSlidingWindow.__new__(DatasetSlidingWindow)
        ds._fps = 60.0
        ds._ts_delta = 100.0
        ds._frame_stores = {}
        ds._pca_targets = False
        ds.sample_to_ms = lambda s: s * 1000.0 / 8000.0
        start_ts = float(row["start_ts:float"])
        assert start_ts != 0.0
        d = str(row["npy_data_path:path"])
        # window centered at processed-signal ms 700 → capture-timeline
        # ts = 700 − ts_delta + start_ts — must load the interpolated frame
        # there, NOT at 700−ts_delta (which a start_ts=0 producer would hit)
        center = 700.0 * 8000.0 / 1000.0
        feat, w = ds._anime_target(row, d, center, center)
        ts = 700.0 - 100.0 + start_ts  # ms on the capture timeline
        pos = ts * 60.0 / 1000.0
        lo = int(np.floor(pos))
        a = pos - lo
        f_lo = np.load(os.path.join(d, f"{lo:06d}.npy"))
        f_hi = np.load(os.path.join(d, f"{lo + 1:06d}.npy"))
        np.testing.assert_allclose(feat, f_lo * (1 - a) + f_hi * a, atol=1e-6)

    def test_four_source_selection_observable(self, fake_voca):
        """Training item source augmentation draws all 4 blob variants."""
        from sdfa_tpu.data.sliding_window import _SOURCE_KEYS

        rows = csvio.read_csv(os.path.join(self.out_root, "train.csv"))
        blob = dict(np.load(str(rows[0]["npy_data_path:path"]) + "_audio.npz"))
        avail = [k for k in _SOURCE_KEYS if k in blob]
        assert avail == list(_SOURCE_KEYS)
        rng = np.random.default_rng(0)
        seen = {str(rng.choice(avail)) for _ in range(100)}
        assert seen == set(_SOURCE_KEYS)

    def test_pitch_variant_blobs(self, fake_voca, tmp_path_factory):
        """preload_voca(pitch_variants=True) writes the 8 ps keys the
        random_pitch_shift selection path consumes (VERDICT r2 #9)."""
        out_root = str(tmp_path_factory.mktemp("out_ps"))
        preload.preload_voca(fake_voca, self.clean_root, out_root,
                             sample_rate=8000, speakers=["m0"],
                             pitch_variants=True)
        rows = csvio.read_csv(os.path.join(out_root, "train.csv"))
        blob = dict(np.load(str(rows[0]["npy_data_path:path"]) + "_audio.npz"))
        for sfx in ("u4", "u2", "d2", "d4"):
            for fam in ("audio_ps", "audio_8k_ps"):
                key = f"{fam}_{sfx}"
                assert key in blob, key
                assert blob[key].shape == blob["audio_8k" if "8k" in fam else "audio"].shape
                # a shifted variant is genuinely different audio
                assert np.abs(blob[key] - blob["audio"][: len(blob[key])]).max() > 1e-4

    def test_dgrad_and_pca(self, fake_voca, tmp_path_factory):
        dgrad_root = str(tmp_path_factory.mktemp("dgrad"))
        preload.generate_dgrad(self.out_root, dgrad_root, voca_root=fake_voca)
        rows = csvio.read_csv(os.path.join(dgrad_root, "train.csv"))
        d = str(rows[0]["npy_data_path:path"])
        g = np.load(os.path.join(d, "000003.npy"))
        assert g.shape == (9976 * 9,)
        # non-face triangles zeroed
        _, non_face_tris = vc.non_face_masks()
        g2 = g.reshape(-1, 9)
        assert np.abs(g2[non_face_tris]).max() == 0.0
        assert np.abs(g2).max() > 0  # face region moved

        preload.pca_dgrad(dgrad_root, variance=0.97)
        comp = np.load(os.path.join(dgrad_root, "pca", "scale_compT.npy"))
        means = np.load(os.path.join(dgrad_root, "pca", "scale_means.npy"))
        assert comp.shape[0] == 9976 * 6 and means.shape == (9976 * 6,)
