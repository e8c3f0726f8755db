"""Import the ACTUAL reference modules (/root/reference) as parity oracles.

The reference's `saber` package imports librosa/soundfile/webrtcvad/pysptk/
plyfile at module load; none are in this image. They are only *used* on code
paths our oracle tests never touch (audio IO, Griffin-Lim, VAD), so package-
shaped stubs in sys.modules let the layer modules import cleanly. The oracle
tests then compare our JAX layers against the reference's own torch code with
shared weights — not against a re-written twin (VERDICT round 1, weak #3).
"""

import sys
import types

_STUBS = (
    "librosa", "librosa.filters", "librosa.util", "librosa.feature",
    "librosa.effects", "soundfile", "webrtcvad", "pysptk", "plyfile",
)


def _install_stubs():
    for name in _STUBS:
        if name in sys.modules:
            continue
        mod = types.ModuleType(name)
        if "." not in name:
            mod.__path__ = []  # mark as package so submodule imports resolve
        sys.modules[name] = mod
    lr = sys.modules["librosa"]
    lr.filters = sys.modules["librosa.filters"]
    lr.util = sys.modules["librosa.util"]
    lr.feature = sys.modules["librosa.feature"]
    lr.effects = sys.modules["librosa.effects"]

    def _unavailable(*_a, **_k):  # loud failure if a test strays onto them
        raise RuntimeError("stubbed audio dependency used by oracle test")

    sys.modules["librosa.filters"].window_sumsquare = _unavailable
    sys.modules["librosa.filters"].mel = _unavailable
    sys.modules["librosa.util"].tiny = _unavailable
    sys.modules["plyfile"].PlyData = _unavailable
    sys.modules["webrtcvad"].Vad = _unavailable

    # run_rnnoise git-clones + makes rnnoise AT IMPORT (run_rnnoise.py:61);
    # pre-stub the module so `from .run_rnnoise import run_rnnoise_demo`
    # resolves without executing it
    name = "saber.data.audio.denoise.run_rnnoise"
    if name not in sys.modules:
        mod = types.ModuleType(name)
        mod.run_rnnoise_demo = _unavailable
        sys.modules[name] = mod


def load_reference_modules():
    """Returns (speech_anime.layers.freq_lstm, .attentions, saber) from the
    read-only reference checkout.

    The layer files are loaded directly from their paths (they use only
    absolute imports: torch, saber, math, numpy) — importing the
    ``speech_anime`` package would execute its __init__, which imports the
    viewer and auto-BUILDS the C++ deformation module inside the read-only
    reference tree (deformation/__init__.py:6-13)."""
    _install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import importlib.util

    import saber  # noqa: F401

    def _load(name, path):
        if name in sys.modules:
            return sys.modules[name]
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    freq_lstm = _load("_ref_freq_lstm",
                      "/root/reference/speech_anime/layers/freq_lstm.py")
    attentions = _load("_ref_attentions",
                       "/root/reference/speech_anime/layers/attentions.py")
    return freq_lstm, attentions, saber


def load_reference_full_model(pca_root: str):
    """Build the reference's ACTUAL ``SaberSpeechDrivenAnimation`` with the
    shipped dgrad config — the real torch model the published checkpoints
    were trained with, not a twin.

    The ``speech_anime`` package __init__ imports api+viewer, and the
    viewer auto-builds the C++ deformation module inside the read-only
    reference tree — so the package is registered WITHOUT executing its
    __init__ (a module stub with the real ``__path__``), and the viewer
    submodule is stubbed (configure-time ``set_template_mesh`` only).
    Returns (torch_model.eval(), reference_hparams).
    """
    _install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    if "speech_anime" not in sys.modules:
        pkg = types.ModuleType("speech_anime")
        pkg.__path__ = ["/root/reference/speech_anime"]
        sys.modules["speech_anime"] = pkg
        viewer = types.ModuleType("speech_anime.viewer")
        viewer.set_template_mesh = lambda *a, **k: None
        sys.modules["speech_anime.viewer"] = viewer

    import saber

    # mirror tools/config.py:15-125 without the viewer/seed side effects
    hp = saber.ConfigDict("/root/reference/speech_anime/config/default.py")
    hp.overwrite_by(
        saber.ConfigDict("/root/reference/speech_anime/config/model/dgrad.py"))
    hp.overwrite_by(
        saber.ConfigDict("/root/reference/speech_anime/config/data/voca-dgrad.py"))
    hp.dataset_anime.set_key("root", pca_root)
    hp.replace_variable("{DATASET_ANIME_ROOT}", pca_root)

    from speech_anime.model.model import SaberSpeechDrivenAnimation

    model = SaberSpeechDrivenAnimation(hp, None, None, load_pca=True)
    model.eval()
    return model, hp
