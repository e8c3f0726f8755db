"""Round-5 suffix probe: per-layer biLSTM kernel timing at serving shapes
+ VMEM ceiling measurement — the measured basis for the 2-layer wavefront
fusion decision (VERDICT r4 #1).

Writes findings incrementally to artifacts/suffix_probe_r5/probe.jsonl.
Run alone: NEVER concurrently with bench.py (single tunnel chip).
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


def emit(rec):
    rec = dict(rec, t=round(time.time() - T0, 1))
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as fp:
        fp.write(json.dumps(rec) + "\n")


T0 = time.time()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = "/tmp/sdfa_jax_cache"
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    emit({"probe": "backend", "platform": jax.default_backend(),
          "device": str(jax.devices()[0])})

    # ---- VMEM ceiling: bisect the largest single VMEM scratch Mosaic
    # accepts (tells us the budget for the fused kernel's resident
    # inter-layer stack) ----
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def fits(mb: int) -> bool:
        n = mb * 1024 * 1024 // 4 // 128  # (n, 128) f32 rows

        def kern(o_ref, scratch):
            scratch[0, :] = jnp.ones((128,), jnp.float32)
            o_ref[:] = scratch[0:1, :]

        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((n, 128), jnp.float32)],
            )()
            jax.block_until_ready(out)
            return True
        except Exception as e:
            emit({"probe": "vmem_fail", "mb": mb,
                  "err": f"{type(e).__name__}: {str(e)[:300]}"})
            return False

    lo, hi = 8, 256
    while fits(hi):
        lo = hi
        hi *= 2
    while hi - lo > 8:
        mid = (lo + hi) // 2
        if fits(mid):
            lo = mid
        else:
            hi = mid
    emit({"probe": "vmem_scratch_ceiling_mb", "mb": lo})

    # ---- serving-shape biLSTM layer timings ----
    from sdfa_tpu.ops.pallas_bilstm import bilstm_layer_fused

    rows, T, H = 35328, 64, 256
    rng = np.random.default_rng(0)

    def mk(shape, dtype):
        return jnp.asarray(rng.normal(0, 0.05, shape).astype(np.float32),
                           dtype=dtype)

    def time_call(fn, *args, n=3):
        out = fn(*args)
        _ = np.asarray(jnp.ravel(out)[:1])  # tunnel-trustworthy sync
        ts = []
        for _i in range(n):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = np.asarray(jnp.ravel(out)[:1])
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    # layer configs mirroring the model: L1 in=256 (f32 gather output),
    # L2 in=512 (bf16 staged)
    for name, n_in, in_dt, blk in [
        ("L1_blk256", 256, jnp.float32, 256),
        ("L2_blk256", 512, jnp.bfloat16, 256),
        ("L1_blk512", 256, jnp.float32, 512),
        ("L2_blk512", 512, jnp.bfloat16, 512),
        ("L2_blk1024", 512, jnp.bfloat16, 1024),
    ]:
        try:
            x = mk((rows, T, n_in), in_dt)
            w_ih = mk((2, n_in, 4 * H), jnp.float32)
            w_hh = mk((2, H, 4 * H), jnp.float32)
            gb = mk((2, 4 * H), jnp.float32)
            fn = jax.jit(lambda x, a, b, c, _blk=blk: bilstm_layer_fused(
                x, a, b, c, block_rows=_blk, precise=1,
                out_dtype=jnp.bfloat16))
            tc0 = time.time()
            dt = time_call(fn, x, w_ih, w_hh, gb)
            flops = rows * T * 2 * 2 * (n_in + H) * (4 * H)
            emit({"probe": name, "rows": rows, "T": T, "in": n_in,
                  "blk": blk, "compile_s": round(time.time() - tc0, 1),
                  "ms": round(dt * 1e3, 2),
                  "tflops": round(flops / dt / 1e12, 1),
                  "pct_peak_bf16": round(100 * flops / dt / 1e12 / 197, 1)})
            x = None
        except Exception as e:
            emit({"probe": name, "err": f"{type(e).__name__}: {str(e)[:400]}"})


if __name__ == "__main__":
    main()
