#!/usr/bin/env python
"""Probe the axon tunnel's device→host download bandwidth scaling.

The StreamingServer's delivered capacity is bounded by this link
(~30 MB/s effective measured in round 3, DESIGN.md §12.3). This probe
answers one question: do K concurrent transfers (separate device arrays,
all `copy_to_host_async`-requested before any blocking `np.asarray`)
deliver more aggregate bytes/s than one big transfer? If yes, splitting
each tick's vertex batch into K sub-arrays raises delivered capacity
with zero accuracy cost; if no, the wire format (i16 → i8d) is the only
lever.

Usage: python tools/tunnel_bandwidth.py [total_MB] [--out FILE]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sdfa_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    total_mb = float(args[0]) if args else 16.0
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    n = int(total_mb * 1024 * 1024) // 4
    dev = jax.devices()[0]
    results = {"total_mb": total_mb, "device": str(dev)}
    reps = 3
    # The arrays MUST be produced ON DEVICE (jit output): device_put of a
    # host buffer lets the tunnel client answer np.asarray from its own
    # host copy without a wire round-trip (measured "190 GB/s" = no-op).
    make = jax.jit(
        lambda i, m: (jax.lax.iota(jnp.float32, m) + i * 0.5) * 1.0000001,
        static_argnums=1)
    for k in (1, 2, 4, 8):
        chunk = n // k
        # warm the jit for this shape + one discarded download (sync)
        np.asarray(make(0, chunk))
        times = []
        for rep in range(reps):
            # fresh device values each rep: a client-side cache of a
            # previously-downloaded array must not serve the request. No
            # separate completion-forcing step: an eager p[0] compiles a
            # fresh slice program over the tunnel (~170 s/shape measured);
            # the iota+mul device compute inside the timed window is
            # microseconds against a multi-hundred-ms transfer.
            parts = [make(rep * k + i + 1, chunk) for i in range(k)]
            t0 = time.perf_counter()
            for p in parts:  # request every transfer before blocking
                p.copy_to_host_async()
            for p in parts:
                np.asarray(p)
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        mbps = (chunk * 4 * k) / dt / 1e6
        results[f"k{k}"] = {"s": round(dt, 3), "MB_s": round(mbps, 1)}
        print(json.dumps({"k": k, "s": round(dt, 3),
                          "MB_s": round(mbps, 1)}), flush=True)
        parts = None
    if out_path:
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
