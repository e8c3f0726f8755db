"""Viewer tests: reconstruction dispatch, software renderer, video writer."""

import os

import numpy as np
import pytest

from sdfa_tpu import mesh
from sdfa_tpu.viewer import frame as frame_mod
from sdfa_tpu.viewer.render import render_mesh


@pytest.fixture(scope="module")
def template():
    return mesh.read_ply(frame_mod.REFERENCE_TEMPLATE)


class TestFrameToMesh:
    def test_offsets_passthrough(self, template):
        verts, faces = template
        off = np.full((5023 * 3,), 0.001, np.float32)
        out, f = frame_mod.frames_to_meshes(off[None], "verts_off_3d")
        np.testing.assert_allclose(out[0], verts + 0.001, atol=1e-6)
        assert f.shape == (9976, 3)

    def test_positions_passthrough(self, template):
        verts, _ = template
        out, _ = frame_mod.frames_to_meshes(verts.reshape(1, -1), "verts_pos_3d")
        np.testing.assert_allclose(out[0], verts, atol=0)

    def test_dgrad_shape_guard(self):
        with pytest.raises(AssertionError):
            frame_mod.frames_to_meshes(np.zeros((1, 123), np.float32), "dgrad_3d")


class TestRenderer:
    def test_render_mesh(self, template):
        verts, faces = template
        img = render_mesh(verts, faces, (128, 128))
        assert img.shape == (128, 128, 3) and img.dtype == np.uint8
        # face pixels must differ from background
        assert (img != img[0, 0]).any()

    def test_backface_culled(self):
        # single clockwise-wound triangle (normal −z) must not be drawn
        verts = np.array([[-.5, -.5, 0], [.5, -.5, 0], [0, .5, 0]], np.float64)
        img = render_mesh(verts, np.array([[0, 2, 1]]), (64, 64))
        assert (img == img[0, 0]).all()

    def test_occlusion_painter_order(self):
        # a large far triangle (z=0, flat) behind a tilted near one (z≈0.5):
        # the near triangle's shade must win at the image center
        far = np.array([[-.9, -.9, 0], [.9, -.9, 0], [0, .9, 0]])
        near = np.array([[-.3, -.3, .5], [.3, -.3, .55], [0, .3, .5]])
        faces = np.array([[0, 1, 2]])
        both_v = np.concatenate([far, near])
        both_f = np.array([[0, 1, 2], [3, 4, 5]])
        img_near = render_mesh(near, faces, (64, 64))
        img_far = render_mesh(far, faces, (64, 64))
        img_both = render_mesh(both_v, both_f, (64, 64))
        c = (32, 32)
        # centering/scaling in render_mesh is per-call, so compare the
        # combined render against the far-alone shade: the tilted near
        # face must override it
        assert (img_both[c] != img_far[c]).any()
        assert (img_near[c] != img_far[c]).any()  # shades actually differ

    def test_render_video_with_image_track(self, template, tmp_path):
        from sdfa_tpu.viewer import render_video

        verts, _ = template
        frames = np.stack([verts.reshape(-1), (verts * 1.001).reshape(-1)])
        imgs = np.random.default_rng(0).integers(0, 255, (2, 32, 32, 3), np.uint8)
        path = render_video(
            sources=[
                {"title": "mesh", "verts_pos_3d": frames, "tslist": [0.0, 100.0]},
                {"title": "track", "images": imgs, "tslist": [0.0, 100.0]},
            ],
            video_fps=30.0, audio_sr=8000,
            video_path=str(tmp_path / "out.avi"),
            grid_w=64, grid_h=64,
            audio_signal=np.zeros(800, np.float32),
        )
        assert os.path.exists(path) and os.path.getsize(path) > 0


class TestBlenderToolGate:
    def test_exits_cleanly_without_bpy(self):
        """tools/blender_render.py must fail with a clear message (exit 2)
        outside Blender, not a traceback."""
        import subprocess, sys

        r = subprocess.run(
            [sys.executable, "tools/blender_render.py"],
            capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(__file__)),
        )
        assert r.returncode == 2
        assert "bpy not available" in r.stdout
        assert "Traceback" not in r.stderr
