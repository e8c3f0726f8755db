"""Serving example: wav → 3D face-mesh vertices via the fused device path.

Demonstrates ``AnimationTask.generate_vertices`` (no reference
counterpart — the reference downloads dgrad frames and reconstructs on
the CPU, speech_anime/model/model.py:121-222 + viewer): PCA decode and
the deformation-transfer solve stay inside the device program; only flat
vertices cross back to the host.

Usage:
    python examples/serve_vertices.py <ckpt_or_trace_dir> <clip.wav> [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(1)
    src, wav = sys.argv[1], sys.argv[2]
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "serve_out"

    from sdfa_tpu import api, audio, mesh
    from sdfa_tpu.viewer import frame as frame_mod

    task = api.load_traced(src) if os.path.isdir(src) else api.load_task(src)
    sr = int(task.hp.audio.sample_rate)
    signal, _ = audio.load(wav, sr=sr)
    signal = audio.rms.normalize(
        signal, task.hp.dataset_anime.get("audio_target_db", -24.5))

    tslist, verts = task.generate_vertices(signal, speaker=0)
    print(f"{len(tslist)} frames, verts {verts.shape}")

    os.makedirs(out_dir, exist_ok=True)
    _, faces = frame_mod.template()
    for i in range(len(verts)):
        mesh.write_obj(os.path.join(out_dir, f"{i:06d}.obj"), verts[i], faces)
    print(f"wrote {len(verts)} obj frames to {out_dir}")


if __name__ == "__main__":
    main()
