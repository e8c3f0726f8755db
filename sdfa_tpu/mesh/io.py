"""Mesh I/O: PLY (ascii + binary_little_endian) and OBJ.

Reference surface: saber/data/mesh/io.py:6-85 (plyfile based there; plyfile is
not available here so the PLY parser is self-contained — it covers the
vertex/face layout used by FLAME/VOCASET assets).
"""

from __future__ import annotations

import os
import struct
from typing import Tuple

import numpy as np

_PLY_TYPES = {
    "char": ("b", 1), "int8": ("b", 1),
    "uchar": ("B", 1), "uint8": ("B", 1),
    "short": ("h", 2), "int16": ("h", 2),
    "ushort": ("H", 2), "uint16": ("H", 2),
    "int": ("i", 4), "int32": ("i", 4),
    "uint": ("I", 4), "uint32": ("I", 4),
    "float": ("f", 4), "float32": ("f", 4),
    "double": ("d", 8), "float64": ("d", 8),
}


def read_ply(path: str, dtype=np.float32) -> Tuple[np.ndarray, np.ndarray]:
    """Return (verts (V,3) dtype, faces (F,3) int32)."""
    with open(path, "rb") as fp:
        # --- header ---
        line = fp.readline().strip()
        assert line == b"ply", f"not a ply file: {path}"
        fmt = None
        elements = []  # list of (name, count, [(prop_name, type, list_index_type|None)])
        while True:
            line = fp.readline()
            if not line:
                raise ValueError("unexpected EOF in ply header")
            tokens = line.decode("ascii", "ignore").strip().split()
            if not tokens:
                continue
            if tokens[0] == "format":
                fmt = tokens[1]
            elif tokens[0] == "element":
                elements.append((tokens[1], int(tokens[2]), []))
            elif tokens[0] == "property":
                if tokens[1] == "list":
                    elements[-1][2].append((tokens[4], tokens[3], tokens[2]))
                else:
                    elements[-1][2].append((tokens[2], tokens[1], None))
            elif tokens[0] == "end_header":
                break
        assert fmt in ("ascii", "binary_little_endian"), f"unsupported ply format: {fmt}"

        verts, faces = None, None
        for name, count, props in elements:
            if fmt == "ascii":
                rows = [fp.readline().split() for _ in range(count)]
                if name == "vertex":
                    verts = np.array(
                        [[float(r[i]) for i in range(3)] for r in rows], dtype=dtype
                    )
                elif name == "face":
                    faces = np.array([[int(x) for x in r[1:4]] for r in rows], np.int32)
            else:
                if name == "vertex":
                    fmts = "".join(_PLY_TYPES[t][0] for _, t, _ in props)
                    itemsize = sum(_PLY_TYPES[t][1] for _, t, _ in props)
                    raw = fp.read(itemsize * count)
                    arr = np.frombuffer(
                        raw, dtype=np.dtype([(p, "<" + f) for (p, t, _), f in
                                             zip(props, ["f4" if t in ("float", "float32") else
                                                         "f8" if t in ("double", "float64") else
                                                         "i4" for _, t, _ in props])])
                    )
                    verts = np.stack(
                        [arr["x"], arr["y"], arr["z"]], axis=1
                    ).astype(dtype)
                elif name == "face":
                    assert len(props) == 1 and props[0][2] is not None
                    cnt_fmt, cnt_sz = _PLY_TYPES[props[0][2]]
                    idx_fmt, idx_sz = _PLY_TYPES[props[0][1]]
                    out = np.empty((count, 3), np.int32)
                    for i in range(count):
                        (n,) = struct.unpack("<" + cnt_fmt, fp.read(cnt_sz))
                        vals = struct.unpack("<" + idx_fmt * n, fp.read(idx_sz * n))
                        assert n == 3, "only triangle meshes supported"
                        out[i] = vals
                    faces = out
                else:  # skip unknown element
                    itemsize = sum(_PLY_TYPES[t][1] for _, t, _ in props)
                    fp.read(itemsize * count)
        assert verts is not None, "ply has no vertex element"
        return verts, faces


def read_obj(path: str, dtype=np.float32) -> Tuple[np.ndarray, np.ndarray]:
    verts, faces = [], []
    with open(path) as fp:
        for line in fp:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:4]]
                faces.append(idx)
    return np.asarray(verts, dtype=dtype), np.asarray(faces, np.int32)


def write_obj(path: str, verts: np.ndarray, faces: np.ndarray):
    verts = np.reshape(np.asarray(verts), (-1, 3))
    faces = np.reshape(np.asarray(faces), (-1, 3))
    with open(path, "w") as fp:
        for v in verts:
            fp.write(f"v {v[0]:.8f} {v[1]:.8f} {v[2]:.8f}\n")
        for f in faces:
            fp.write(f"f {f[0]+1} {f[1]+1} {f[2]+1}\n")


def write_ply(path: str, verts: np.ndarray, faces: np.ndarray):
    verts = np.reshape(np.asarray(verts, np.float32), (-1, 3))
    faces = np.reshape(np.asarray(faces, np.int32), (-1, 3))
    with open(path, "wb") as fp:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(verts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(faces)}\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        fp.write(header.encode("ascii"))
        fp.write(verts.astype("<f4").tobytes())
        for f in faces:
            fp.write(struct.pack("<B3i", 3, int(f[0]), int(f[1]), int(f[2])))


def read_mesh(path: str, dtype=np.float32) -> Tuple[np.ndarray, np.ndarray]:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".ply":
        return read_ply(path, dtype)
    if ext == ".obj":
        return read_obj(path, dtype)
    raise ValueError(f"unsupported mesh format: {ext}")
