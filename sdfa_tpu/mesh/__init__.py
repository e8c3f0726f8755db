from .io import read_mesh, read_obj, read_ply, write_obj, write_ply

__all__ = ["read_mesh", "read_obj", "read_ply", "write_obj", "write_ply"]
