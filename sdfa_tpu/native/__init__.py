"""ctypes binding for the native deformation runtime (csrc/).

Auto-builds on first import like the reference module
(/root/reference/deformation/__init__.py:6-13 runs cmake+make); here a
plain ``make`` in csrc/.  Public surface mirrors the reference pybind
module (pybind.cpp:129-153): ``set_target``, ``is_same``,
``get_deform_grad``, ``get_mesh`` — plus a batched ``get_meshes``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from ..utils import log

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "libsdfa_deformation.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        log.info("building native deformation runtime (make -C csrc)")
        subprocess.run(["make", "-C", _CSRC], check=True, capture_output=True)
    lib = ctypes.CDLL(_SO)
    c_double_p = ctypes.POINTER(ctypes.c_double)
    c_float_p = ctypes.POINTER(ctypes.c_float)
    c_int64_p = ctypes.POINTER(ctypes.c_int64)
    lib.sdfa_set_target.argtypes = [c_double_p, ctypes.c_int, c_int64_p,
                                    ctypes.c_int, c_int64_p, ctypes.c_int,
                                    ctypes.c_double]
    lib.sdfa_set_target.restype = ctypes.c_int
    lib.sdfa_is_same.argtypes = [ctypes.c_int] * 3
    lib.sdfa_is_same.restype = ctypes.c_int
    lib.sdfa_get_deform_grad.argtypes = [c_double_p, c_double_p, ctypes.c_int,
                                         c_int64_p, ctypes.c_int,
                                         ctypes.c_double, c_float_p]
    lib.sdfa_get_deform_grad.restype = ctypes.c_int
    lib.sdfa_get_mesh_from_dgrad.argtypes = [c_float_p, ctypes.c_int,
                                             c_double_p, c_double_p]
    lib.sdfa_get_mesh_from_dgrad.restype = ctypes.c_int
    lib.sdfa_get_deform_mat.argtypes = [c_double_p, c_double_p, ctypes.c_int,
                                        c_int64_p, ctypes.c_int,
                                        ctypes.c_double, c_float_p]
    lib.sdfa_get_deform_mat.restype = ctypes.c_int
    lib.sdfa_get_mesh_from_dm.argtypes = [c_float_p, ctypes.c_int,
                                          c_double_p, c_double_p]
    lib.sdfa_get_mesh_from_dm.restype = ctypes.c_int
    lib.sdfa_n_free.restype = ctypes.c_int
    lib.sdfa_n_tris.restype = ctypes.c_int
    _lib = lib
    return lib


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def set_target(verts, faces, cnsts=None, reg: float = 1e-10) -> bool:
    lib = _load()
    verts = np.ascontiguousarray(np.asarray(verts, np.float64).reshape(-1, 3))
    faces = np.ascontiguousarray(np.asarray(faces, np.int64).reshape(-1, 3))
    cnsts = np.ascontiguousarray(np.asarray(
        cnsts if cnsts is not None else [], np.int64).reshape(-1))
    ok = lib.sdfa_set_target(_dptr(verts), len(verts), _iptr(faces), len(faces),
                             _iptr(cnsts), len(cnsts), reg)
    return bool(ok)


def is_same(n_verts: int, n_tris: int, n_cnsts: int) -> bool:
    return bool(_load().sdfa_is_same(n_verts, n_tris, n_cnsts))


def get_deform_grad(verts_a, verts_b, faces, eps: float = 1e-6) -> np.ndarray:
    lib = _load()
    a = np.ascontiguousarray(np.asarray(verts_a, np.float64).reshape(-1, 3))
    b = np.ascontiguousarray(np.asarray(verts_b, np.float64).reshape(-1, 3))
    faces = np.ascontiguousarray(np.asarray(faces, np.int64).reshape(-1, 3))
    out = np.empty((len(faces), 9), np.float32)
    ok = lib.sdfa_get_deform_grad(_dptr(a), _dptr(b), len(a), _iptr(faces),
                                  len(faces), eps, _fptr(out))
    assert ok, "get_deform_grad failed"
    return out


def get_meshes(dgrad, n_verts: int, cnst_verts: Optional[np.ndarray] = None) -> np.ndarray:
    """Batched: (F?, n_tris·9) → (F?, n_verts, 3)."""
    lib = _load()
    n_tris = lib.sdfa_n_tris()
    assert n_tris > 0, "set_target must be called first"
    dgrad = np.ascontiguousarray(np.asarray(dgrad, np.float32))
    frame_floats = n_tris * 9
    assert dgrad.size % frame_floats == 0, (
        f"dgrad size {dgrad.size} is not a multiple of n_tris*9={frame_floats}"
    )
    squeeze = dgrad.size == frame_floats and dgrad.ndim <= 2
    dgrad = dgrad.reshape(-1, frame_floats)
    out = np.empty((len(dgrad), n_verts, 3), np.float64)
    cv = None
    if cnst_verts is not None and len(cnst_verts):
        cv = np.ascontiguousarray(np.asarray(cnst_verts, np.float64).reshape(-1, 3))
    ok = lib.sdfa_get_mesh_from_dgrad(
        _fptr(dgrad), len(dgrad),
        _dptr(cv) if cv is not None else ctypes.cast(None, ctypes.POINTER(ctypes.c_double)),
        _dptr(out),
    )
    assert ok, "get_mesh_from_dgrad failed (set_target not called?)"
    return out[0] if squeeze else out


def get_mesh(deform_grad, n_verts: int, vert_cnsts=None, **_) -> np.ndarray:
    """Single-frame surface matching the reference call site (frame.py:129)."""
    return get_meshes(deform_grad, n_verts, vert_cnsts)


def get_deform_mat(verts_a, verts_b, faces, eps: float = 1e-6) -> np.ndarray:
    """Raw per-triangle affine transforms (n_tris, 9) row-major; degenerate
    triangles emit identity (reference get_deform_mat, pybind.cpp:137-144)."""
    lib = _load()
    a = np.ascontiguousarray(np.asarray(verts_a, np.float64).reshape(-1, 3))
    b = np.ascontiguousarray(np.asarray(verts_b, np.float64).reshape(-1, 3))
    faces = np.ascontiguousarray(np.asarray(faces, np.int64).reshape(-1, 3))
    out = np.empty((len(faces), 9), np.float32)
    ok = lib.sdfa_get_deform_mat(_dptr(a), _dptr(b), len(a), _iptr(faces),
                                 len(faces), eps, _fptr(out))
    assert ok, "get_deform_mat failed"
    return out


def get_meshes_from_dm(dmat, n_verts: int,
                       cnst_verts: Optional[np.ndarray] = None) -> np.ndarray:
    """Batched mesh reconstruction from raw matrices (reference
    get_mesh_from_dm, pybind.cpp:145-152): (F?, n_tris·9) → (F?, n_verts, 3)."""
    lib = _load()
    n_tris = lib.sdfa_n_tris()
    assert n_tris > 0, "set_target must be called first"
    dmat = np.ascontiguousarray(np.asarray(dmat, np.float32))
    frame_floats = n_tris * 9
    assert dmat.size % frame_floats == 0, (
        f"dmat size {dmat.size} is not a multiple of n_tris*9={frame_floats}"
    )
    squeeze = dmat.size == frame_floats and dmat.ndim <= 3
    dmat = dmat.reshape(-1, frame_floats)
    out = np.empty((len(dmat), n_verts, 3), np.float64)
    cv = None
    if cnst_verts is not None and len(cnst_verts):
        cv = np.ascontiguousarray(np.asarray(cnst_verts, np.float64).reshape(-1, 3))
    ok = lib.sdfa_get_mesh_from_dm(
        _fptr(dmat), len(dmat),
        _dptr(cv) if cv is not None else ctypes.cast(None, ctypes.POINTER(ctypes.c_double)),
        _dptr(out),
    )
    assert ok, "get_mesh_from_dm failed (set_target not called?)"
    return out[0] if squeeze else out


def get_mesh_from_dm(dmat, n_verts: int, vert_cnsts=None, **_) -> np.ndarray:
    """Single-frame raw-matrix reconstruction (pybind.cpp:145-152)."""
    return get_meshes_from_dm(dmat, n_verts, vert_cnsts)
