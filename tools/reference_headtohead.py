"""Head-to-head baseline: the REFERENCE implementation's wav→vertices
wall-clock, measured in this image on its only available backend (CPU).

The reference repo publishes no benchmark numbers (BASELINE.md), so this
script produces the direct comparison the north star implies: the same
formant-synthesized utterance bench.py uses, pushed through the
reference's OWN code end-to-end:

  1. features — ``DatasetSlidingWindow.fetch_audio_features``
     (sliding_window.py:325-377): per output frame, a 4544-sample window
     slice + per-window torch.stft mel + Δ/Δ² + rms energy.
  2. forward — ``SaberSpeechDrivenAnimation._feature_to_anime``
     (model.py:428-489): the real torch model (conv → FreqLstm → biLSTM →
     Bahdanau attention → PCA decode) in bs=100 window chunks.
  3. solve — the reference's C++ Eigen SparseLU mesh reconstruction
     (deform_triangle_impl.hpp:215-310), one frame at a time exactly as
     ``viewer/frame.py:102-153`` drives it, compiled VERBATIM from the
     read-only checkout via tools/ref_headtohead/shim.cpp (the vendored
     pybind11 predates Python 3.12; the shim swaps only the binding layer).

librosa is not installed in this image; the three functions this path
needs are filled with numerically-equivalent stand-ins before import:
``filters.mel`` → our slaney bank (parity-tested vs the same formula,
cached by the reference after one call), ``feature.delta`` →
``scipy.signal.savgol_filter`` (librosa's own implementation), and
``feature.rms`` → a three-line framing.  Everything hot (torch.stft per
window, the model forward, the SparseLU solve) is reference code.

Fairness notes recorded in the output: torch uses all host cores for the
forward; the solve is single-threaded by the reference's design (one
global manager, viewer/frame.py); the reference's intended eval backend
is a single CUDA GPU for the forward — the per-frame CPU solve is its
mesh-reconstruction cost on ANY backend.

Usage: python tools/reference_headtohead.py [seconds] (default 8).
Writes artifacts/ref_headtohead_r4/RESULTS.json (override dir name with
HTH_OUT) and prints one JSON line.
"""

import ctypes
import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

SHIM_SO = "/tmp/ref_headtohead/libref_deform.so"


# ---------------------------------------------------------------------------
# librosa stand-ins (installed over the oracle stubs BEFORE reference import)
# ---------------------------------------------------------------------------
def _install_librosa_fillers():
    import scipy.signal

    import _reference_oracle as oracle

    oracle._install_stubs()

    from sdfa_tpu.audio import dsp

    def _mel(*, sr, n_fft, n_mels, fmin, fmax, **_k):
        return dsp.mel_filters(int(sr), int(n_fft), int(n_mels),
                               float(fmin), float(fmax))

    def _delta(data, width=9, order=1, axis=-1, mode="interp", **_k):
        return scipy.signal.savgol_filter(
            data, width, polyorder=order, deriv=order, axis=axis, mode=mode)

    def _rms(*, y, frame_length=2048, hop_length=512, center=True, **_k):
        if center:
            y = np.pad(y, frame_length // 2, mode="constant")
        n = max(0, 1 + (len(y) - frame_length) // hop_length)
        idx = (np.arange(frame_length)[None, :]
               + hop_length * np.arange(n)[:, None])
        return np.sqrt(np.mean(np.square(y[idx]), axis=1))[None, :]

    sys.modules["librosa.filters"].mel = _mel
    sys.modules["librosa.feature"].delta = _delta
    sys.modules["librosa.feature"].rms = _rms


# ---------------------------------------------------------------------------
# reference C++ solver via the extern-C shim
# ---------------------------------------------------------------------------
class RefSolver:
    def __init__(self):
        if not os.path.exists(SHIM_SO):
            subprocess.run(
                ["make", "-C", os.path.join(ROOT, "tools", "ref_headtohead"),
                 f"OUT={SHIM_SO}"],
                check=True, capture_output=True)
        lib = ctypes.CDLL(SHIM_SO)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        lib.ref_set_target.argtypes = [f32p, ctypes.c_int, u32p, ctypes.c_int,
                                       u32p, ctypes.c_int, ctypes.c_double]
        lib.ref_set_target.restype = ctypes.c_int
        lib.ref_get_mesh_from_dg.argtypes = [f32p, f64p, f32p]
        lib.ref_get_mesh_from_dg.restype = ctypes.c_int
        lib.ref_get_deform_grad.argtypes = [f64p, f32p, f32p, ctypes.c_int,
                                            u32p, ctypes.c_int, ctypes.c_double]
        lib.ref_get_deform_grad.restype = ctypes.c_int
        self.lib = lib

    def set_target(self, verts, faces, cnsts, reg=1e-10):
        verts = np.ascontiguousarray(verts, np.float32)
        faces = np.ascontiguousarray(faces, np.uint32)
        cnsts = np.ascontiguousarray(cnsts, np.uint32)
        ok = self.lib.ref_set_target(verts.reshape(-1, 3), len(verts),
                                     faces.reshape(-1, 3), len(faces),
                                     cnsts, len(cnsts), reg)
        assert ok, "reference setStaticTarget failed"
        self.n_verts = len(verts)

    def get_mesh(self, dgrad_f64, cnst_verts_f32):
        out = np.empty((self.n_verts, 3), np.float32)
        ok = self.lib.ref_get_mesh_from_dg(out, dgrad_f64, cnst_verts_f32)
        assert ok, "reference getMeshFromDeformationGradients failed"
        return out


def _ours_on_same_cpu(signal, seconds, pca_root):
    """Our pipeline on the SAME backend the reference just ran on (the host
    CPU, via XLA:CPU) — the only same-hardware comparison possible in this
    image. Random-init weights like the reference leg (timing is
    weight-independent); the architecture is the one we serve with
    (fused on-device frontend + overlap prefix + batched decode/solve)."""
    import jax
    import jax.numpy as jnp

    from sdfa_tpu.models import build_model
    from sdfa_tpu.task import AnimationTask
    from sdfa_tpu.tools import configure

    hp = configure("dgrad", dataset_root=pca_root)
    model = build_model(hp, load_pca=True)
    rng = jax.random.PRNGKey(0)
    feat0 = jnp.zeros((2, 64, 128, 3), jnp.float32)
    spk0 = jnp.zeros((2,), jnp.int32)
    variables = jax.device_get(
        model.init({"params": rng, "dropout": rng}, feat0, spk0, False))
    task = AnimationTask(hp, model, variables,
                         device_frontend=True, overlap_frontend=True)
    _ = task.generate_vertices(signal, 0)  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, verts = task.generate_vertices(signal, 0)
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2]
    assert np.isfinite(verts).all()
    return {
        "x_realtime": round(seconds / dt, 2),
        "seconds_per_run": round(dt, 3),
        "backend": jax.default_backend(),
    }


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0

    # the image pins jax_platforms to "axon,cpu"; this tool is a host-CPU
    # baseline and must not touch (or hang on) the TPU tunnel
    import jax

    jax.config.update("jax_platforms", "cpu")

    import torch

    _install_librosa_fillers()
    from _reference_oracle import load_reference_full_model

    from bench import _ensure_pca, _formant_utterance
    from sdfa_tpu.data.vocaset import config as voca_config

    pca_root = _ensure_pca("/tmp/graft_assets")
    model, hp = load_reference_full_model(pca_root)
    # load_reference_full_model re-runs _install_stubs, which points the
    # librosa hooks back at the loud-failure stubs — restore the fillers.
    _install_librosa_fillers()
    torch.manual_seed(0)
    n_params = sum(p.numel() for p in model.parameters())

    from speech_anime.datasets.sliding_window import DatasetSlidingWindow

    sr = int(hp.audio.sample_rate)
    signal = _formant_utterance(sr, seconds)

    # --- stage 1: the reference's per-window feature extraction ----------
    t0 = time.perf_counter()
    features = DatasetSlidingWindow.fetch_audio_features(signal, hp)
    t_feat = time.perf_counter() - t0
    n_windows = len(features["audio_feat"])

    # --- stage 2: torch forward in bs=100 chunks + PCA decode ------------
    t0 = time.perf_counter()
    animes, _ = model._feature_to_anime(
        feat_list=features["audio_feat"], energy_list=features["energy"],
        speaker_id=0, emotion_id=0, frame_id=0)
    t_forward = time.perf_counter() - t0
    # (N, tris, 9) → flat 89784/frame, like viewer/frame.py:110 flattens
    animes = np.ascontiguousarray(animes.reshape(n_windows, -1))
    assert animes.shape == (n_windows, 89784), animes.shape

    # --- stage 3: per-frame Eigen SparseLU solve (viewer/frame.py) -------
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ref_non_face",
        os.path.join(voca_config.REFERENCE_ASSETS, "mask", "non_face.py"))
    non_face = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(non_face)
    cnst_idx = np.asarray(non_face.non_face_verts, np.uint32)

    from sdfa_tpu.mesh import io as mesh_io

    verts, faces = mesh_io.read_ply(voca_config.TEMPLATE_PLY)
    solver = RefSolver()
    t0 = time.perf_counter()
    solver.set_target(verts, faces, cnst_idx)  # SparseLU factorization
    t_factorize = time.perf_counter() - t0
    cnst_verts = np.ascontiguousarray(verts.reshape(-1, 3)[cnst_idx],
                                      np.float32)

    t0 = time.perf_counter()
    out = None
    for i in range(n_windows):
        out = solver.get_mesh(
            np.ascontiguousarray(animes[i], np.float64), cnst_verts)
    t_solve = time.perf_counter() - t0

    # sanity: solving the dgrad OF the template reconstructs the template
    ident = np.empty(len(faces) * 9, np.float64)
    assert solver.lib.ref_get_deform_grad(
        ident, verts.reshape(-1, 3).astype(np.float32),
        verts.reshape(-1, 3).astype(np.float32), len(verts),
        faces.reshape(-1, 3).astype(np.uint32), len(faces), 1e-6)
    recon = solver.get_mesh(ident, cnst_verts)
    ident_err = float(np.abs(recon - verts.reshape(-1, 3)).max())
    assert ident_err < 1e-4, f"reference solver self-check failed: {ident_err}"

    # --- ours, same host CPU (same-hardware comparison) ------------------
    ours = None
    if os.environ.get("HTH_OURS_CPU", "1") == "1":
        try:
            ours = _ours_on_same_cpu(signal, seconds, pca_root)
        except Exception as e:  # never sink the reference measurement
            print(f"[headtohead] ours-on-cpu skipped: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    total = t_feat + t_forward + t_solve
    result = {
        "metric": "reference_cpu_wav_to_vertices",
        "value": round(seconds / total, 3),
        "unit": "x_realtime",
        "audio_seconds": seconds,
        "n_windows": n_windows,
        "n_params": n_params,
        "stages_s": {
            "features": round(t_feat, 3),
            "forward_plus_pca": round(t_forward, 3),
            "solve_per_frame_lu": round(t_solve, 3),
            "lu_factorize_once": round(t_factorize, 3),
        },
        "stage_x_realtime": {
            "features": round(seconds / t_feat, 2),
            "forward_plus_pca": round(seconds / t_forward, 2),
            "solve_per_frame_lu": round(seconds / t_solve, 2),
        },
        "solver_identity_recon_err_m": ident_err,
        "ours_same_cpu": ours,
        "host": {
            "cpus": os.cpu_count(),
            "torch_threads": __import__("torch").get_num_threads(),
        },
        "notes": (
            "reference code on CPU (its only backend in this image; "
            "thread counts recorded under host). The reference's intended "
            "forward backend is one CUDA GPU; the per-frame SparseLU solve "
            "+ transform construction runs on the host either way, so "
            "solve_per_frame_lu bounds the reference's wav→vertices rate "
            "on ANY backend (single-threaded by its design — one global "
            "manager, viewer/frame.py)."
        ),
    }
    out_dir = os.path.join(
        ROOT, "artifacts", os.environ.get("HTH_OUT", "ref_headtohead_r4"))
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "RESULTS.json"), "w") as fp:
        json.dump(result, fp, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
