"""Renderer smoke script (reference surface: test_render.py at repo root) —
renders the FLAME template with the software rasterizer and writes a PNG."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2

from sdfa_tpu import mesh
from sdfa_tpu.viewer import frame as frame_mod
from sdfa_tpu.viewer.render import render_mesh


def main():
    verts, faces = mesh.read_mesh(frame_mod.REFERENCE_TEMPLATE)
    img = render_mesh(verts, faces, (512, 512))
    out = os.path.join(os.path.dirname(__file__), "template_render.png")
    cv2.imwrite(out, img[:, :, ::-1])
    print(f"rendered {img.shape} -> {out}")


if __name__ == "__main__":
    main()
