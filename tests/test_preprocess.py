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
        preload.clean_voca(fake_voca, clean_root, sample_rate=22050,
                           target_db=-24.5, speakers=["m0", "f4"])
        wav_path = os.path.join(clean_root, "m0", "m0_001.wav")
        assert os.path.exists(wav_path)
        wav, sr = audio_lib.load(wav_path)
        assert sr == 22050
        rms_db, _ = audio_lib.rms.analyze_db(wav)
        assert rms_db == pytest.approx(-24.5, abs=1.5)
        self.__class__.clean_root = clean_root

    def test_preload(self, fake_voca, tmp_path_factory):
        out_root = str(tmp_path_factory.mktemp("out"))
        preload.preload_voca(fake_voca, self.clean_root, out_root,
                             sample_rate=8000, speakers=["m0", "f4"])
        rows = csvio.read_csv(os.path.join(out_root, "train.csv"))
        assert len(rows) == 2  # m0 sentences
        d = str(rows[0]["npy_data_path:path"])
        frames = [f for f in os.listdir(d) if f.endswith(".npy") and "lips" not in f]
        assert len(frames) == 12
        offs = np.load(os.path.join(d, "000000.npy"))
        assert offs.shape == (5023 * 3,)
        blob = np.load(d + "_audio.npz")
        assert int(blob["sr"]) == 8000
        # valid speaker f4 kept (sentence 21 ≥ 20)
        valid = csvio.read_csv(os.path.join(out_root, "valid.csv"))
        assert len(valid) == 1
        self.__class__.out_root = out_root

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
