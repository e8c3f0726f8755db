from . import frame, render, video
from .frame import frame_to_mesh, frames_to_meshes, get_solver, set_template_mesh
from .render import render_mesh
from .video import export_mesh_frames, render_video

__all__ = [
    "frame",
    "render",
    "video",
    "frame_to_mesh",
    "frames_to_meshes",
    "get_solver",
    "set_template_mesh",
    "render_mesh",
    "export_mesh_frames",
    "render_video",
]
