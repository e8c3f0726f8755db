"""Streaming-client example: feed a wav to a running streaming service in
real-time-sized chunks and receive mesh frames as they are produced.

Start the service first (any checkpoint — reference torch checkpoints
ingest transparently):

    python -m sdfa_tpu serve --load_from runs/xxx/ckpt-best.msgpack \
        --port 9876 --capacity 8

Then:

    python examples/stream_client.py <clip.wav> [host] [port] [out_dir]

Frames arrive while the clip is still being pushed (the pipeline's
lookahead is ~0.32 s); each is written as OBJ if an out_dir is given.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(1)
    wav = sys.argv[1]
    host = sys.argv[2] if len(sys.argv) > 2 else "127.0.0.1"
    port = int(sys.argv[3]) if len(sys.argv) > 3 else 9876
    out_dir = sys.argv[4] if len(sys.argv) > 4 else None

    from sdfa_tpu import audio, mesh
    from sdfa_tpu.serve import StreamClient

    # the service consumes samples at the MODEL's rate (voca configs: 8 kHz)
    sig, sr = audio.load(wav, sr=8000)
    sig = audio.rms.normalize(sig.astype(np.float32))
    chunk = sr // 10  # 100 ms pushes, mimicking a live microphone

    faces = None
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        _, faces = mesh.read_mesh(
            "/root/reference/speech_anime/datasets/vocaset/template/"
            "FLAME_sample.ply")

    import threading

    counts = {"frames": 0, "during_push": 0}
    t0 = time.perf_counter()
    with StreamClient((host, port)) as client:
        sid = client.open(speaker=0)
        pushing = threading.Event()
        pushing.set()

        def reader():
            # drain frames WHILE the clip is still being pushed (sends and
            # receives ride opposite socket directions) — this is what
            # keeps the server outbox bounded on long clips
            for ts, verts in client.frames(sid):
                counts["frames"] += 1
                if pushing.is_set():
                    counts["during_push"] += 1
                if out_dir:
                    mesh.write_obj(
                        os.path.join(out_dir, f"{int(ts):07d}.obj"),
                        verts, faces)

        t = threading.Thread(target=reader, daemon=True)
        t.start()
        for lo in range(0, len(sig), chunk):
            client.push(sid, sig[lo:lo + chunk])
            time.sleep(chunk / sr)  # real-time pacing
        pushing.clear()
        client.flush(sid)
        t.join()
    n_frames = counts["frames"]
    wall = time.perf_counter() - t0
    clip_s = len(sig) / sr
    print(f"{n_frames} frames for a {clip_s:.2f}s clip in {wall:.2f}s "
          f"(incl. real-time paced pushes; {counts['during_push']} frames "
          f"arrived while still pushing)")


if __name__ == "__main__":
    main()
