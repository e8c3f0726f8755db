"""VOCASET preprocessing pipeline: clean → preload → dgrad → PCA.

Reference: /root/reference/speech_anime/datasets/vocaset/preload.py (§3.4 of
SURVEY.md).  Input layout is the public VOCASET download:
``root/audio/<alias>/sentenceNN.wav``,
``root/unposedcleaneddata/<alias>/sentenceNN/sentenceNN.FFFFFF.ply``,
``root/templates/<alias>.ply``.

Stages:
1. clean: denoise (logMMSE; the reference shells out to rnnoise) → energy
   VAD → RMS normalize to the target dB → cleaned wav + vad flags.
2. preload: silence pad/trim bookkeeping (start_ts), read 60 fps ply frames,
   offsets = verts − speaker template (non-face verts re-meaned), blend-to-
   neutral ramps (150 ms) outside the speech span, per-frame %06d.npy +
   _lips_dist.npy + _audio.npz blob; 8/2/2 speaker split manifests.
3. generate_dgrad: gaussian σ=1 temporal smoothing → float64 dgrad
   extraction per frame (ops.deformation_gradients_np, vectorized over
   triangles — the reference loops per triangle in C++) → zero non-face tris.
4. pca: PCA(var=0.97) over all training frames → compT/means npy.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional

import numpy as np

from ...audio import io as audio_io
from ...audio import misc as audio_misc
from ...audio import rms as audio_rms
from ...mesh import io as mesh_io
from ...ops import deformation_gradients_np
from ...utils import log
from .. import csvio
from . import config as vc

_FRAME_RE = re.compile(r"^sentence\d\d\.(\d{6})\.ply$")
FPS = 60.0


# ---------------------------------------------------------------------------
# stage 1: clean
# ---------------------------------------------------------------------------
def clean_voca(root: str, clean_root: str, sample_rate: int = 22050,
               target_db: float = -24.5, speakers: Optional[List[str]] = None):
    speakers = speakers or list(vc.SPEAKER_ALIAS)
    for spk in speakers:
        alias = vc.SPEAKER_ALIAS[spk]
        audio_dir = os.path.join(root, "audio", alias)
        if not os.path.isdir(audio_dir):
            log.warn(f"no audio for {alias}")
            continue
        os.makedirs(os.path.join(clean_root, spk), exist_ok=True)
        for name in sorted(os.listdir(audio_dir)):
            m = re.match(r"sentence(\d\d)\.wav$", name)
            if not m:
                continue
            si = int(m.group(1))
            wav, sr = audio_io.load(os.path.join(audio_dir, name), sr=sample_rate)
            wav = denoise_logmmse(wav, sr)
            vad = audio_misc.detect_speech(wav, sr, smooth_ms=100)
            wav = audio_rms.normalize(wav, target_db)
            prefix = os.path.join(clean_root, spk, f"{spk}_{si:03d}")
            audio_io.save(prefix + ".wav", wav, sr)
            np.save(prefix + ".vad.npy", vad)
    log.info(f"clean_voca done → {clean_root}")


def denoise_logmmse(signal: np.ndarray, sr: int, frame_ms: float = 20.0) -> np.ndarray:
    """logMMSE spectral-amplitude denoiser (numpy port of the torch
    implementation surface, saber/data/audio/denoise/logmmse.py:8-95)."""
    slen = int(frame_ms * sr / 1000)
    if slen % 2:
        slen += 1
    if len(signal) < slen * 10:
        return signal
    hop = slen // 2
    win = np.hanning(slen + 1)[:-1]
    nfft = 2 * slen
    n_frames = (len(signal) - slen) // hop + 1
    idx = np.arange(n_frames)[:, None] * hop + np.arange(slen)[None, :]
    frames = signal[idx] * win
    spec = np.fft.rfft(frames, nfft, axis=1)
    mag2 = np.abs(spec) ** 2
    # initial noise estimate from the first 6 frames
    noise_mu2 = mag2[:6].mean(axis=0)
    aa, mu, eta_min = 0.98, 0.98, 10 ** (-25 / 10)
    xk_prev = np.zeros_like(noise_mu2)
    out = np.zeros(len(signal) + nfft)
    from scipy.special import exp1

    for i in range(n_frames):
        gammak = np.minimum(mag2[i] / np.maximum(noise_mu2, 1e-12), 40.0)
        if i == 0:
            ksi = aa + (1 - aa) * np.maximum(gammak - 1, 0)
        else:
            ksi = aa * xk_prev / np.maximum(noise_mu2, 1e-12) + (1 - aa) * np.maximum(gammak - 1, 0)
            ksi = np.maximum(eta_min, ksi)
        log_sigma_k = gammak * ksi / (1 + ksi) - np.log(1 + ksi)
        vad_decision = log_sigma_k.mean()
        if vad_decision < 0.15:  # noise-only frame → update noise estimate
            noise_mu2 = mu * noise_mu2 + (1 - mu) * mag2[i]
        vk = ksi * gammak / (1 + ksi)
        ei_vk = 0.5 * exp1(np.maximum(vk, 1e-8))
        hw = ksi / (1 + ksi) * np.exp(ei_vk)
        xk_prev = (hw**2) * mag2[i]
        frame_out = np.fft.irfft(spec[i] * hw, nfft)[:slen]
        out[i * hop : i * hop + slen] += frame_out * win
    return out[: len(signal)].astype(np.float32)


# ---------------------------------------------------------------------------
# stage 2: preload
# ---------------------------------------------------------------------------
def preload_voca(
    voca_root: str,
    clean_root: str,
    output_root: str,
    sample_rate: int = 8000,
    speakers: Optional[List[str]] = None,
    blend_ms: float = 150.0,
    min_test_sentence: int = 20,
):
    speakers = speakers or list(vc.SPEAKER_ALIAS)
    non_face_verts, _ = vc.non_face_masks()
    rows_by_speaker: Dict[str, List[dict]] = {}

    for spk in speakers:
        alias = vc.SPEAKER_ALIAS[spk]
        spk_root = os.path.join(voca_root, "unposedcleaneddata", alias)
        template_path = os.path.join(voca_root, "templates", f"{alias}.ply")
        if not os.path.isdir(spk_root):
            log.warn(f"no mesh data for {alias}")
            continue
        template, _faces = mesh_io.read_ply(template_path, dtype=np.float64)
        rows = []
        for name in sorted(os.listdir(spk_root)):
            m = re.match(r"sentence(\d\d)$", name)
            if not m:
                continue
            si = int(m.group(1))
            row = _collect_sentence(
                spk, si,
                sent_dir=os.path.join(spk_root, name),
                clean_prefix=os.path.join(clean_root, spk, f"{spk}_{si:03d}"),
                out_dir=os.path.join(output_root, "data", spk, "neutral", f"sent{si:03d}"),
                template=template,
                non_face_verts=non_face_verts,
                sample_rate=sample_rate,
                blend_ms=blend_ms,
            )
            if row is not None:
                rows.append(row)
        rows_by_speaker[spk] = rows

    # 8/2/2 speaker split; valid/test keep only sentences ≥ min_test_sentence
    trainset, validset, testset = [], [], []
    for spk, rows in rows_by_speaker.items():
        if spk in vc.TRAIN_SPEAKERS:
            trainset += rows
        elif spk in vc.VALID_SPEAKERS:
            validset += [r for r in rows if _sent_of(r) >= min_test_sentence]
        else:
            testset += [r for r in rows if _sent_of(r) >= min_test_sentence]
    if trainset:
        csvio.write_csv(os.path.join(output_root, "train.csv"), trainset)
    if validset:
        csvio.write_csv(os.path.join(output_root, "valid.csv"), validset)
    if testset:
        csvio.write_csv(os.path.join(output_root, "test.csv"), testset)
    log.info(f"preload_voca done → {output_root}")


def _sent_of(row) -> int:
    return int(os.path.basename(str(row["npy_data_path:path"]))[4:])


def _collect_sentence(
    spk: str, si: int, sent_dir: str, clean_prefix: str, out_dir: str,
    template: np.ndarray, non_face_verts: np.ndarray,
    sample_rate: int, blend_ms: float,
):
    # --- audio ---
    wav_path = clean_prefix + ".wav"
    if not os.path.exists(wav_path):
        log.warn(f"missing clean wav: {wav_path}")
        return None
    audio, sr = audio_io.load(wav_path, sr=None)
    audio_sr = audio_io.load(wav_path, sr=sample_rate)[0]
    vad_path = clean_prefix + ".vad.npy"
    vad = np.load(vad_path) if os.path.exists(vad_path) else None

    # --- frames ---
    frame_files = sorted(
        f for f in os.listdir(sent_dir) if _FRAME_RE.match(f)
    )
    if not frame_files:
        return None
    os.makedirs(out_dir, exist_ok=True)
    start_ts = 0.0
    n_frames = len(frame_files)

    # speech span in anime frames (for blend-to-neutral ramps)
    speech_lo, speech_hi = 0, n_frames - 1
    if vad is not None and vad.any():
        pairs = audio_misc.vad_to_pairs(vad)
        ms_per_flag = 20.0
        speech_lo = int(pairs[0][0] * ms_per_flag * FPS / 1000.0)
        speech_hi = int(pairs[-1][1] * ms_per_flag * FPS / 1000.0)
    ramp_frames = max(int(blend_ms * FPS / 1000.0), 1)

    offsets_all = []
    for fi, fname in enumerate(frame_files):
        verts, _ = mesh_io.read_ply(os.path.join(sent_dir, fname), dtype=np.float64)
        offsets = verts - template
        # non-face verts: remove their mean drift (head pose leakage)
        if len(non_face_verts):
            offsets[non_face_verts] -= offsets[non_face_verts].mean(axis=0)
        # blend toward neutral outside the speech span
        scale = 1.0
        if fi < speech_lo:
            scale = max(0.0, 1.0 - (speech_lo - fi) / ramp_frames)
        elif fi > speech_hi:
            scale = max(0.0, 1.0 - (fi - speech_hi) / ramp_frames)
        offsets *= scale
        offsets_all.append(offsets.astype(np.float32))
        np.save(os.path.join(out_dir, f"{fi:06d}.npy"),
                offsets.astype(np.float32).reshape(-1))
        posed = template + offsets
        lips = np.float32(posed[vc.LIPS_UPPER_VERT, 1] - posed[vc.LIPS_LOWER_VERT, 1])
        np.save(os.path.join(out_dir, f"{fi:06d}_lips_dist.npy"), np.abs(lips))

    np.savez(out_dir + "_audio.npz", sr=sample_rate, start_ts=start_ts,
             audio=audio_sr, audio_8k=audio_sr if sample_rate == 8000
             else audio_io.load(wav_path, sr=8000)[0])

    return {
        "npy_data_path:path": out_dir,
        "speaker:str": spk,
        "emotion:str": "neutral",
        "sample_rate:int": sample_rate,
        "audio_samples:int": len(audio_sr),
        "start_ts:float": start_ts,
        "anime_minfi:int": 0,
        "anime_maxfi:int": n_frames - 1,
    }


# ---------------------------------------------------------------------------
# stage 3: dgrad
# ---------------------------------------------------------------------------
def generate_dgrad(offsets_root: str, dgrad_root: str, voca_root: Optional[str] = None,
                   smooth_sigma: float = 1.0):
    from scipy.ndimage import gaussian_filter1d

    _, non_face_tris = vc.non_face_masks()
    _, faces = mesh_io.read_ply(vc.TEMPLATE_PLY)

    data_root = os.path.join(offsets_root, "data")
    for spk in sorted(os.listdir(data_root)):
        alias = vc.SPEAKER_ALIAS.get(spk)
        template_path = (
            os.path.join(voca_root, "templates", f"{alias}.ply")
            if voca_root else vc.TEMPLATE_PLY
        )
        if not os.path.exists(template_path):
            template_path = vc.TEMPLATE_PLY
        template, _ = mesh_io.read_ply(template_path, dtype=np.float64)
        for emotion in sorted(os.listdir(os.path.join(data_root, spk))):
            for sent in sorted(os.listdir(os.path.join(data_root, spk, emotion))):
                src = os.path.join(data_root, spk, emotion, sent)
                if not os.path.isdir(src):
                    continue
                dst = os.path.join(dgrad_root, "data", spk, emotion, sent)
                os.makedirs(dst, exist_ok=True)
                frame_files = sorted(
                    f for f in os.listdir(src)
                    if re.match(r"^\d{6}\.npy$", f)
                )
                frames = np.stack([np.load(os.path.join(src, f)) for f in frame_files])
                frames = gaussian_filter1d(frames, sigma=smooth_sigma, axis=0)
                for f, offsets in zip(frame_files, frames):
                    deformed = template + offsets.reshape(-1, 3)
                    g = deformation_gradients_np(template, deformed, faces)
                    if len(non_face_tris):
                        g[non_face_tris] = 0.0
                    np.save(os.path.join(dst, f), g.astype(np.float32).reshape(-1))
                for f in os.listdir(src):
                    if f.endswith("_lips_dist.npy"):
                        np.save(os.path.join(dst, f), np.load(os.path.join(src, f)))
                # share the audio blob
                if os.path.exists(src + "_audio.npz") and not os.path.exists(dst + "_audio.npz"):
                    import shutil

                    shutil.copyfile(src + "_audio.npz", dst + "_audio.npz")
    for name in ("train.csv", "valid.csv", "test.csv"):
        src_csv = os.path.join(offsets_root, name)
        if os.path.exists(src_csv):
            rows = csvio.read_csv(src_csv)
            for row in rows:
                row["npy_data_path:path"] = str(row["npy_data_path:path"]).replace(
                    os.path.abspath(offsets_root), os.path.abspath(dgrad_root)
                )
            csvio.write_csv(os.path.join(dgrad_root, name), rows)
    log.info(f"generate_dgrad done → {dgrad_root}")


# ---------------------------------------------------------------------------
# stage 4: PCA
# ---------------------------------------------------------------------------
def pca_offsets(offsets_root: str, variance: float = 0.97, step: int = 1):
    frames = _load_training_frames(offsets_root, step)
    os.makedirs(os.path.join(offsets_root, "pca"), exist_ok=True)
    _pca_fit_save(frames, variance, os.path.join(offsets_root, "pca"), "")


def pca_dgrad(dgrad_root: str, variance: float = 0.97, step: int = 1):
    frames = _load_training_frames(dgrad_root, step).reshape(-1, vc.N_TRIS, 9)
    out = os.path.join(dgrad_root, "pca")
    os.makedirs(out, exist_ok=True)
    _pca_fit_save(frames[:, :, :6].reshape(len(frames), -1), variance, out, "scale_")
    _pca_fit_save(frames[:, :, 6:].reshape(len(frames), -1), variance, out, "rotat_")


def _load_training_frames(root: str, step: int) -> np.ndarray:
    rows = csvio.read_csv(os.path.join(root, "train.csv"))
    frames = []
    for row in rows:
        d = str(row["npy_data_path:path"])
        files = sorted(f for f in os.listdir(d) if re.match(r"^\d{6}\.npy$", f))
        for f in files[::step]:
            frames.append(np.load(os.path.join(d, f)).reshape(-1))
    return np.stack(frames)


def _pca_fit_save(data: np.ndarray, variance: float, out_dir: str, prefix: str):
    from sklearn.decomposition import PCA

    pca = PCA(n_components=variance, svd_solver="full")
    pca.fit(data)
    np.save(os.path.join(out_dir, f"{prefix}compT.npy"),
            pca.components_.T.astype(np.float32))
    np.save(os.path.join(out_dir, f"{prefix}means.npy"),
            pca.mean_.astype(np.float32))
    log.info(f"pca '{prefix or 'offsets'}': {pca.n_components_} components")


# ---------------------------------------------------------------------------
def run_pipeline(source_root: str, output_root: str, face_type: str = "dgrad_3d",
                 sample_rate: int = 8000, target_db: float = -24.5):
    """Full driver (reference dataset_preprocess.py:21-45)."""
    clean_root = os.path.join(output_root, "_clean")
    offsets_root = os.path.join(output_root, "offsets")
    clean_voca(source_root, clean_root, sample_rate=22050, target_db=target_db)
    preload_voca(source_root, clean_root, offsets_root, sample_rate=sample_rate)
    pca_offsets(offsets_root)
    if face_type == "dgrad_3d":
        dgrad_root = os.path.join(output_root, "dgrad")
        generate_dgrad(offsets_root, dgrad_root, voca_root=source_root)
        pca_dgrad(dgrad_root)
        return dgrad_root
    return offsets_root
