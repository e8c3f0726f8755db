"""Template state + prediction→mesh reconstruction.

Reference: /root/reference/speech_anime/viewer/frame.py — global template
+ ``deformation.set_target`` with non-face constraint vertices; dgrad frames
(89,784 floats) go through the solve, offsets add to the template, positions
pass through.

TPU-native: the solver is the batched :class:`DeformationSolver`; whole
clips reconstruct in one device call (frames_to_meshes) instead of the
reference's per-frame C++ SparseLU solve.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..mesh import io as mesh_io
from ..ops import DeformationSolver
from ..tools import FaceDataType
from ..utils import log

REFERENCE_TEMPLATE = (
    "/root/reference/speech_anime/datasets/vocaset/template/FLAME_sample.ply"
)

_state = dict(verts=None, faces=None, cnst_indices=None, solver=None, corres=None)


def default_constraints() -> np.ndarray:
    """FLAME non-face vertex ids (reference mask/non_face.py)."""
    import sys

    mask_dir = "/root/reference/speech_anime/datasets/vocaset/mask"
    if os.path.isdir(mask_dir):
        sys.path.insert(0, mask_dir)
        import non_face

        return np.asarray(non_face.non_face_verts)
    log.warn("non-face mask not found; using no constraints")
    return np.asarray([], np.int64)


def set_template_mesh(
    template_path: Optional[str] = None,
    constraints_path: Optional[str] = None,
    corres_path: Optional[str] = None,
    reg: float = 1e-10,
):
    """Load template, constraints and optional triangle correspondences
    (frame.py:50-99) and prefactorize the solver."""
    template_path = template_path or REFERENCE_TEMPLATE
    verts, faces = mesh_io.read_mesh(template_path, dtype=np.float64)

    if constraints_path is not None:
        with open(constraints_path) as fp:
            tokens = " ".join(line.strip() for line in fp).split()
        cnst = np.asarray([int(t) for t in tokens], np.int64)
    else:
        cnst = default_constraints()

    corr_count = corr_faces = None
    if corres_path is not None:
        corres_dict = {}
        with open(corres_path) as fp:
            count = 0
            for i, line in enumerate(fp):
                if i == 0:
                    count = int(line.strip())
                    continue
                if count == 0:
                    break
                src_i, dst_i, _ = line.strip().split(",")
                corres_dict.setdefault(int(dst_i), []).append(int(src_i))
                count -= 1
        corr_count, corr_faces = [], []
        for i in range(len(faces)):
            src = corres_dict.get(i)
            if src is None:
                corr_count.append(0)
                corr_faces.append(0)
            else:
                corr_count.append(len(src))
                corr_faces.extend(src)

    log.info("deformation solver: building static target")
    solver = DeformationSolver(
        verts, faces, cnst_indices=cnst,
        corr_count=corr_count, corr_faces=corr_faces, reg=reg,
    )
    _state.update(verts=verts.astype(np.float32), faces=faces,
                  cnst_indices=cnst, solver=solver)
    return solver


def get_solver() -> DeformationSolver:
    if _state["solver"] is None:
        set_template_mesh()
    return _state["solver"]


def template() -> Tuple[np.ndarray, np.ndarray]:
    if _state["solver"] is None:
        set_template_mesh()
    return _state["verts"], _state["faces"]


def frames_to_meshes(data_frames: np.ndarray, face_data_type) -> Tuple[np.ndarray, np.ndarray]:
    """Batched (N, D) prediction frames → (N, V, 3) vertices + (F, 3) faces."""
    if isinstance(face_data_type, str):
        face_data_type = FaceDataType[face_data_type]
    verts_t, faces = template()
    data_frames = np.asarray(data_frames, np.float32)
    if data_frames.ndim == 1:
        data_frames = data_frames[None]
    n = len(data_frames)
    if face_data_type == FaceDataType.dgrad_3d:
        solver = get_solver()
        assert data_frames.shape[-1] == solver.n_tris * 9, (
            f"dgrad frame must have {solver.n_tris * 9} floats, "
            f"got {data_frames.shape[-1]}"
        )
        dgrad = data_frames.reshape(n, -1, 9)
        out = np.asarray(solver.solve(dgrad))
        return out, faces
    if face_data_type == FaceDataType.verts_off_3d:
        return data_frames.reshape(n, -1, 3) + verts_t[None], faces
    if face_data_type == FaceDataType.verts_pos_3d:
        return data_frames.reshape(n, -1, 3), faces
    raise NotImplementedError(str(face_data_type))


def frame_to_mesh(data_frame: np.ndarray, face_data_type) -> Tuple[np.ndarray, np.ndarray]:
    """Single-frame convenience wrapper (reference frame.py:102-153)."""
    verts, faces = frames_to_meshes(np.asarray(data_frame)[None], face_data_type)
    return verts[0], faces
