"""Offscreen mesh renderer (numpy z-sorted rasterizer, cv2 blit).

The reference ships an optional native GL renderer (viewer/render_cpp.py)
with a pyrender fallback (viewer/render_py.py); neither GL stack exists in
this image, so this is a dependency-free painter's-algorithm renderer with
Lambertian shading — fast enough for eval videos (vectorized per frame).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def render_mesh(
    verts: np.ndarray,
    faces: np.ndarray,
    image_size: Tuple[int, int] = (512, 512),
    background: float = 0.15,
) -> np.ndarray:
    """(V, 3), (F, 3) → uint8 (H, W, 3) front view (−z camera)."""
    import cv2

    h, w = image_size
    v = np.asarray(verts, np.float64).copy()
    # center + scale to 0.15/max like the reference (render_py.py)
    v -= v.mean(axis=0)
    scale = 0.85 / max(np.abs(v[:, :2]).max(), 1e-9)
    v *= scale

    tri = v[faces]  # (F, 3, 3)
    # lambertian shading from a headlight + a top-left key light
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    norm = np.linalg.norm(n, axis=1, keepdims=True)
    n = n / np.maximum(norm, 1e-12)
    light1 = np.array([0.0, 0.0, 1.0])
    light2 = np.array([-0.4, 0.6, 0.7])
    light2 = light2 / np.linalg.norm(light2)
    shade = 0.65 * np.clip(n @ light1, 0, 1) + 0.35 * np.clip(n @ light2, 0, 1)
    shade = 0.12 + 0.88 * shade

    # screen coords
    xy = tri[:, :, :2].copy()
    xy[:, :, 0] = (xy[:, :, 0] * 0.5 + 0.5) * (w - 1)
    xy[:, :, 1] = (1.0 - (xy[:, :, 1] * 0.5 + 0.5)) * (h - 1)
    depth = tri[:, :, 2].mean(axis=1)

    # backface cull + painter sort (far → near)
    visible = n[:, 2] > 0
    order = np.argsort(depth[visible])
    idx = np.nonzero(visible)[0][order]

    img = np.full((h, w, 3), int(background * 255), np.uint8)
    pts = xy[idx].astype(np.int32)
    cols = (shade[idx, None] * np.array([230, 212, 200])[None, :]).astype(np.uint8)
    for p, c in zip(pts, cols):
        cv2.fillConvexPoly(img, p, c.tolist(), lineType=cv2.LINE_8)
    return img
