import numpy as np

from sdfa_tpu import mesh

FLAME_PLY = "/root/reference/speech_anime/datasets/vocaset/template/FLAME_sample.ply"
FLAME_OBJ = "/root/reference/speech_anime/datasets/vocaset/template/FLAME_sample.obj"


class TestPly:
    def test_read_flame_template(self):
        verts, faces = mesh.read_ply(FLAME_PLY)
        assert verts.shape == (5023, 3)
        assert faces.shape == (9976, 3)
        assert faces.min() >= 0 and faces.max() == 5022

    def test_ply_obj_agree(self):
        v1, f1 = mesh.read_ply(FLAME_PLY)
        v2, f2 = mesh.read_obj(FLAME_OBJ)
        assert v1.shape == v2.shape
        np.testing.assert_allclose(v1, v2, atol=1e-5)
        np.testing.assert_array_equal(f1, f2)

    def test_write_roundtrip(self, tmp_path):
        verts, faces = mesh.read_ply(FLAME_PLY)
        p = tmp_path / "out.ply"
        mesh.write_ply(str(p), verts, faces)
        v2, f2 = mesh.read_ply(str(p))
        np.testing.assert_allclose(verts, v2, atol=1e-7)
        np.testing.assert_array_equal(faces, f2)

    def test_obj_roundtrip(self, tmp_path):
        verts, faces = mesh.read_ply(FLAME_PLY)
        p = tmp_path / "out.obj"
        mesh.write_obj(str(p), verts, faces)
        v2, f2 = mesh.read_obj(str(p))
        np.testing.assert_allclose(verts, v2, atol=1e-6)
        np.testing.assert_array_equal(faces, f2)
