"""Render a preprocessed dataset to QA videos.

Reference: /root/reference/dataset_visualize.py — walks the manifest, seeks
the 60 fps frames, reconstructs meshes and writes per-sentence videos with
the audio track saved alongside.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .data import csvio
from .utils import log


def visualize_dataset(
    root: str,
    face_type: str = "dgrad_3d",
    manifest: str = "train.csv",
    out_dir: Optional[str] = None,
    max_items: Optional[int] = 4,
    fps: float = 60.0,
):
    from . import viewer

    out_dir = out_dir or os.path.join(root, "video")
    rows = csvio.read_csv(os.path.join(root, manifest))
    if max_items:
        rows = rows[:max_items]
    for row in rows:
        d = str(row["npy_data_path:path"])
        frames = sorted(
            f for f in os.listdir(d)
            if f.endswith(".npy") and "lips" not in f
        )
        data = np.stack([np.load(os.path.join(d, f)) for f in frames])
        tslist = [i * 1000.0 / fps for i in range(len(frames))]
        blob = np.load(d + "_audio.npz")
        name = f"{row['speaker:str']}_{os.path.basename(d)}"
        path = viewer.render_video(
            sources=[{"title": name, face_type: data, "tslist": tslist}],
            video_fps=fps,
            audio_sr=int(blob["sr"]),
            video_path=os.path.join(out_dir, name + ".avi"),
            audio_signal=np.asarray(blob["audio"]),
        )
        log.info(f"wrote {path}")
    return out_dir


def main():
    import argparse

    parser = argparse.ArgumentParser("sdfa_tpu.visualize")
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--face_type", default="dgrad_3d")
    parser.add_argument("--manifest", default="train.csv")
    parser.add_argument("--out_dir", default=None)
    parser.add_argument("--max_items", type=int, default=4)
    parser.add_argument("--fps", type=float, default=60.0)
    args = parser.parse_args()
    visualize_dataset(args.dataset_root, face_type=args.face_type,
                      manifest=args.manifest, out_dir=args.out_dir,
                      max_items=args.max_items, fps=args.fps)


if __name__ == "__main__":
    main()
