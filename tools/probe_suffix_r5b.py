"""Round-5 suffix probe, part 2: block-size sweep at the REAL serving
dtypes (bf16 inputs after the bf16-gather change) + the fused 2-layer
kernel A/B. Appends to artifacts/suffix_probe_r5/probe.jsonl.

Run alone — never concurrently with bench.py or probe part 1.
Each new (kernel, shape) costs a ~40 min Mosaic compile over the tunnel;
SDFA_PROBE_BUDGET_S (default 7000) soft-bounds the run.
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
BUDGET = float(os.environ.get("SDFA_PROBE_BUDGET_S", 7000))


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

    from sdfa_tpu.ops.pallas_bilstm import bilstm_layer_fused
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

    def layer_probe(name, n_in, in_dt, blk):
        x = mk((rows, T, n_in), in_dt)
        w_ih = mk((2, n_in, 4 * H))
        w_hh = mk((2, H, 4 * H))
        gb = mk((2, 4 * H))
        fn = jax.jit(lambda x, a, b, c, _blk=blk: bilstm_layer_fused(
            x, a, b, c, block_rows=_blk, precise=1, out_dtype=jnp.bfloat16))
        tc0 = time.time()
        dt = time_call(fn, x, w_ih, w_hh, gb)
        flops = rows * T * 2 * 2 * (n_in + H) * (4 * H)
        emit({"probe": name, "rows": rows, "in": n_in, "blk": blk,
              "in_dtype": str(np.dtype(in_dt)),
              "compile_s": round(time.time() - tc0, 1),
              "ms": round(dt * 1e3, 2),
              "tflops": round(flops / dt / 1e12, 1),
              "pct_peak_bf16": round(100 * flops / dt / 1e12 / 197, 1)})

    def fused2_probe(name, in_dt, blk):
        x = mk((rows, T, 256), in_dt)
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
              "in_dtype": str(np.dtype(in_dt)),
              "compile_s": round(time.time() - tc0, 1),
              "ms": round(dt * 1e3, 2),
              "tflops": round(flops / dt / 1e12, 1),
              "pct_peak_bf16": round(100 * flops / dt / 1e12 / 197, 1)})

    # Ordered by decision value per ~40 min compile: the blk 256-vs-512
    # ranking decides the serving default (input dtype shifts HBM traffic
    # only, ~3 ms of ~78 — f32@256 from part 1 ranks against bf16@512);
    # fused2_blk96 is the wavefront-fusion A/B verdict row.
    plan = [
        ("L1bf16_blk512", lambda: layer_probe("L1bf16_blk512", 256,
                                              jnp.bfloat16, 512)),
        ("L2_blk512", lambda: layer_probe("L2_blk512", 512, jnp.bfloat16, 512)),
        ("fused2_blk96", lambda: fused2_probe("fused2_blk96",
                                              jnp.bfloat16, 96)),
        ("L2_blk256", lambda: layer_probe("L2_blk256", 512,
                                          jnp.bfloat16, 256)),
        ("L1bf16_blk256", lambda: layer_probe("L1bf16_blk256", 256,
                                              jnp.bfloat16, 256)),
        ("L2_blk1024", lambda: layer_probe("L2_blk1024", 512,
                                           jnp.bfloat16, 1024)),
    ]
    for name, fn in plan:
        if time.time() - T0 > BUDGET:
            emit({"probe": name, "skipped": "budget"})
            continue
        try:
            fn()
        except Exception as e:
            emit({"probe": name, "err": f"{type(e).__name__}: {str(e)[:400]}"})


if __name__ == "__main__":
    main()
