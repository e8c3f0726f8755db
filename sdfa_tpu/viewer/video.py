"""Grid video compositor for evaluation results.

Reference: /root/reference/speech_anime/viewer/video.py:41-295 — auto grid
rows/cols, per-source timestamp seek, titles, audio mux.  Here: cv2
VideoWriter (XVID/mp4v); audio mux via ffmpeg only if the binary exists
(it is optional in this image — the wav is saved alongside otherwise).
"""

from __future__ import annotations

import math
import os
import shutil
import subprocess
from typing import Dict, List, Optional

import numpy as np

from ..tools import FaceDataType
from ..utils import log, stream
from . import frame as frame_mod
from .render import render_mesh


def _grid_dims(n: int):
    cols = int(math.ceil(math.sqrt(n)))
    rows = int(math.ceil(n / cols))
    return rows, cols


def render_video(
    sources: List[Dict],
    video_fps: float,
    audio_sr: int,
    video_path: str,
    save_video: bool = True,
    grid_w: int = 512,
    grid_h: int = 512,
    font_size: int = 24,
    audio_signal: Optional[np.ndarray] = None,
    max_seconds: Optional[float] = None,
):
    """Each source dict: {"title", one of FaceDataType keys or "images",
    "tslist"} — mesh sources are reconstructed in one batched solve, then
    rendered per frame."""
    import cv2

    os.makedirs(os.path.dirname(os.path.abspath(video_path)), exist_ok=True)

    # duration = max over sources
    durations = [s["tslist"][-1] for s in sources if s.get("tslist") is not None]
    total_ms = max(durations) if durations else 0.0
    if max_seconds is not None:
        total_ms = min(total_ms, max_seconds * 1000.0)
    n_frames = int(total_ms * video_fps / 1000.0) + 1
    ts_queries = np.arange(n_frames) * 1000.0 / video_fps

    # batched mesh reconstruction per source
    rendered: List[List[np.ndarray]] = []
    for src in sources:
        face_key = next((k for k in src if FaceDataType.__members__.get(k)), None)
        frames_imgs = []
        if face_key is not None:
            data = stream.seek_many(ts_queries, src["tslist"], np.asarray(src[face_key]))
            verts, faces = frame_mod.frames_to_meshes(data, face_key)
            for vi in verts:
                frames_imgs.append(render_mesh(vi, faces, (grid_h, grid_w)))
        elif "images" in src:
            imgs = np.asarray(src["images"])
            src_ts = np.asarray(src.get("tslist", np.arange(len(imgs)) * 1000.0 / video_fps))
            for ts in ts_queries:
                idx = int(np.clip(np.searchsorted(src_ts, ts, "right") - 1, 0, len(imgs) - 1))
                frames_imgs.append(cv2.resize(imgs[idx], (grid_w, grid_h)))
        else:
            frames_imgs = [np.zeros((grid_h, grid_w, 3), np.uint8)] * n_frames
        title = src.get("title", "")
        if title:
            for img in frames_imgs:
                cv2.putText(img, title, (8, 24), cv2.FONT_HERSHEY_SIMPLEX,
                            font_size / 48.0, (255, 255, 255), 1, cv2.LINE_AA)
        rendered.append(frames_imgs)

    rows, cols = _grid_dims(len(sources))
    out_w, out_h = cols * grid_w, rows * grid_h
    tmp_path = os.path.splitext(video_path)[0] + "_noaudio.avi"
    writer = cv2.VideoWriter(tmp_path, cv2.VideoWriter_fourcc(*"XVID"),
                             video_fps, (out_w, out_h))
    for i in range(n_frames):
        canvas = np.zeros((out_h, out_w, 3), np.uint8)
        for j, imgs in enumerate(rendered):
            r, c = divmod(j, cols)
            canvas[r * grid_h : (r + 1) * grid_h, c * grid_w : (c + 1) * grid_w] = imgs[i]
        writer.write(canvas[:, :, ::-1])  # RGB → BGR
    writer.release()

    # audio mux (ffmpeg optional)
    final_path = video_path
    if audio_signal is not None:
        wav_path = os.path.splitext(video_path)[0] + ".wav"
        from ..audio import io as audio_io

        audio_io.save(wav_path, audio_signal, audio_sr)
        if shutil.which("ffmpeg"):
            subprocess.run(
                ["ffmpeg", "-y", "-i", tmp_path, "-i", wav_path,
                 "-c:v", "libx264", "-crf", "15", "-c:a", "aac", final_path],
                check=False, capture_output=True,
            )
            if os.path.exists(final_path):
                os.remove(tmp_path)
                return final_path
        log.warn("ffmpeg unavailable: video saved without muxed audio")
    if tmp_path != final_path:
        shutil.move(tmp_path, final_path)
    return final_path


def export_mesh_frames(
    out_dir: str,
    tslist,
    animes: np.ndarray,
    face_type: str,
    fps: float,
    audio_signal: Optional[np.ndarray] = None,
    audio_sr: int = 44100,
):
    """Dump per-frame obj + raw frames (reference model.py:201-212)."""
    from ..mesh import io as mesh_io

    os.makedirs(out_dir, exist_ok=True)
    if audio_signal is not None:
        from ..audio import io as audio_io

        audio_io.save(os.path.join(out_dir, "audio.wav"), audio_signal, audio_sr)
    max_frame = int(tslist[-1] * fps / 1000.0)
    ts_queries = np.arange(max_frame + 1) * 1000.0 / fps
    data = stream.seek_many(ts_queries, tslist, np.asarray(animes))
    verts, faces = frame_mod.frames_to_meshes(data, face_type)
    for i in range(len(verts)):
        mesh_io.write_obj(os.path.join(out_dir, f"{i:06d}.obj"), verts[i], faces)
        np.save(os.path.join(out_dir, f"{i:06d}_{face_type}.npy"), data[i])
    return out_dir
