"""Round-5 suffix probe, part 3: fused 2-layer kernel block sweep.

Part 2 measured fused2_blk96 at 115.97 ms vs 156.3 ms for the chained
per-layer kernels (72.31 + 84.0) — the VMEM-resident inter-layer stack
WINS despite the smaller row block, contradicting §13.3's prediction.
This sweep finds the largest block Mosaic accepts (bigger block = fewer
sequential steps = less per-step overhead, §13.2) before the (T, blk,
2H) stack + both layers' weights blow the VMEM budget.

Appends to artifacts/suffix_probe_r5/probe.jsonl. Run alone.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "suffix_probe_r5")
os.makedirs(OUT_DIR, exist_ok=True)
OUT = os.path.join(OUT_DIR, "probe.jsonl")
T0 = time.time()
BUDGET = float(os.environ.get("SDFA_PROBE_BUDGET_S", 6000))


def emit(rec):
    rec = dict(rec, t=round(time.time() - T0, 1))
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as fp:
        fp.write(json.dumps(rec) + "\n")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = "/tmp/sdfa_jax_cache"
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sdfa_tpu.ops.pallas_bilstm2 import bilstm_2layer_fused

    rows, T, H = 35328, 64, 256
    rng = np.random.default_rng(0)

    def mk(shape, dtype=jnp.float32):
        return jnp.asarray(rng.normal(0, 0.05, shape).astype(np.float32),
                           dtype=dtype)

    def time_call(fn, *args, n=3):
        out = fn(*args)
        _ = np.asarray(jnp.ravel(out)[:1])
        ts = []
        for _i in range(n):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = np.asarray(jnp.ravel(out)[:1])
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    def fused2_probe(name, blk):
        x = mk((rows, T, 256), jnp.bfloat16)
        w1 = mk((2, 256, 4 * H))
        u1 = mk((2, H, 4 * H))
        b1 = mk((2, 4 * H))
        w2 = mk((2, 2 * H, 4 * H))
        u2 = mk((2, H, 4 * H))
        b2 = mk((2, 4 * H))
        fn = jax.jit(lambda *a, _blk=blk: bilstm_2layer_fused(
            *a, block_rows=_blk, out_dtype=jnp.bfloat16))
        tc0 = time.time()
        dt = time_call(fn, x, w1, u1, b1, w2, u2, b2)
        flops = rows * T * 2 * 2 * ((256 + H) + (512 + H)) * 4 * H
        emit({"probe": name, "rows": rows, "blk": blk,
              "in_dtype": "bfloat16",
              "compile_s": round(time.time() - tc0, 1),
              "ms": round(dt * 1e3, 2),
              "tflops": round(flops / dt / 1e12, 1),
              "pct_peak_bf16": round(100 * flops / dt / 1e12 / 197, 1)})

    for blk in (128, 160, 192, 256):
        if time.time() - T0 > BUDGET:
            emit({"probe": f"fused2_blk{blk}", "skipped": "budget"})
            continue
        try:
            fused2_probe(f"fused2_blk{blk}", blk)
        except Exception as e:
            emit({"probe": f"fused2_blk{blk}",
                  "err": f"{type(e).__name__}: {str(e)[:400]}"})


if __name__ == "__main__":
    main()
