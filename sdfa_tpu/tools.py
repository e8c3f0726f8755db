"""Config assembly + task-level enums.

Reference surfaces:
- ``configure()`` (/root/reference/speech_anime/tools/config.py:15-87):
  default.py → custom hparams (.py/.json) → dataset hparams file selected by
  ``dataset_anime.name`` with ``{DATASET_ANIME_ROOT}`` substitution → CLI
  overrides → global seeding.
- FaceDataType / PredictionType enums (tools/data_type.py:4-44).
- path-convention helpers (tools/data_info.py:9-41).
"""

from __future__ import annotations

import enum
import os
import random
from typing import Optional

import numpy as np

from .utils import log
from .utils.config import ConfigDict

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_ROOT = os.path.join(REPO_ROOT, "configs")
# canonical template asset (read-only reference checkout)
FLAME_TEMPLATE = (
    "/root/reference/speech_anime/datasets/vocaset/template/FLAME_sample.ply"
)


class FaceDataType(enum.Enum):
    dgrad_3d = "dgrad_3d"
    blend_1d = "blend_1d"
    verts_pos_3d = "verts_pos_3d"
    verts_off_3d = "verts_off_3d"
    marks_pos_2d = "marks_pos_2d"
    marks_off_2d = "marks_off_2d"

    @classmethod
    def valid_types(cls):
        return [t.name for t in cls]

    @classmethod
    def is_mesh(cls, t) -> bool:
        name = t.name if isinstance(t, cls) else str(t)
        return name in ("dgrad_3d", "verts_pos_3d", "verts_off_3d")


class PredictionType(enum.Enum):
    pca_coeffs = "pca_coeffs"
    pca_normal = "pca_normal"
    face_data = "face_data"

    @classmethod
    def valid_types(cls):
        return [t.name for t in cls]


def seed_everything(seed: int = 1234):
    """Global determinism (reference config.py:64-72; cudnn knobs become
    XLA determinism — compilation is already deterministic on TPU)."""
    random.seed(seed)
    np.random.seed(seed)
    return seed


def configure(
    custom_hparams: Optional[str] = None,
    overrides: Optional[dict] = None,
    dataset_root: Optional[str] = None,
    seed: int = 1234,
) -> ConfigDict:
    """Assemble the resolved hparams tree."""
    hp = ConfigDict.parse_file(os.path.join(CONFIG_ROOT, "default.py"))
    if custom_hparams is not None:
        path = custom_hparams
        if not os.path.exists(path):
            for cand in (
                os.path.join(CONFIG_ROOT, path),
                os.path.join(CONFIG_ROOT, "model", path),
                os.path.join(CONFIG_ROOT, "model", path + ".py"),
            ):
                if os.path.exists(cand):
                    path = cand
                    break
        custom = ConfigDict.parse_file(path)
        # when resuming from a dumped hparams.json at evaluate time, the
        # stale evaluate list is dropped (reference tools/config.py:43-44)
        hp.overwrite_by(custom)

    # dataset hparams file selected by name (reference resolves both
    # dataset_anime and dataset_speech this way, tools/config.py:49-50;
    # dataset_speech is vestigial there — resolved but never consumed —
    # and our aux_loaders machinery is the consumer here)
    for ds_key in ("dataset_anime", "dataset_speech"):
        ds_name = (hp.get(ds_key) or {}).get("name")
        if not ds_name:
            continue
        ds_path = os.path.join(CONFIG_ROOT, "data", ds_name + ".py")
        if os.path.exists(ds_path):
            hp.overwrite_by(ConfigDict.parse_file(ds_path))
        else:
            log.warn(f"dataset config not found: {ds_path}")

    if overrides:
        hp.overwrite_by(overrides)

    root = dataset_root or hp.get("dataset_anime", {}).get("root", "")
    if root:
        root = os.path.abspath(os.path.expanduser(root))
        hp.replace_variable("DATASET_ANIME_ROOT", root)
        if "dataset_anime" in hp:
            hp.dataset_anime.set_key("root", root)

    seed_everything(seed)
    return hp


# -- data path conventions (tools/data_info.py:25-32) ------------------------
def data_dir(root: str, speaker: str, emotion: str, sent: int) -> str:
    """root/data/<speaker>/<emotion>/<sent zfill 3> (0-based sentence id)."""
    return os.path.join(root, "data", speaker, emotion, f"{int(sent):03d}")


def parse_data_dir(path: str):
    parts = os.path.normpath(path).split(os.sep)
    sent = parts[-1]
    if sent.startswith("sent"):  # legacy round-1 layout
        sent = sent[4:]
    return dict(speaker=parts[-3], emotion=parts[-2], sent=int(sent))
