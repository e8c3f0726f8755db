"""Interleaved in-process A/B of the fused decode+solve row-block size.

Per-call timing over the axon tunnel is noisy (35 ms RTT floor, and the
link degrades in multi-minute windows — bench medians can swing ±10%
between *processes*). This probe removes both problems for the one
decision it serves (SDFA_SOLVE_BLK default):

- both tile configs are traced in the SAME process and timed
  ALTERNATELY (A B A B ...), so link drift hits both equally;
- each timed call runs the kernel R times inside one jit via
  ``lax.fori_loop`` whose carry feeds the next iteration's input
  (serialized, CSE-proof — CLAUDE.md: isolated op timing over the
  tunnel needs an in-jit repeat loop).

The PCA bases are random (timing only depends on shapes); the solver
constants are the real FLAME operator so n_free/n_eqs match serving.

Usage:  python tools/solve_tile_ab.py [rows] [blk_a] [blk_b]
Defaults: rows=35328 (128-clip serving batch), 512 vs 1024.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from sdfa_tpu.ops.pallas_decode_solve import decode_solve_free, prep_consts
from sdfa_tpu.viewer import frame as frame_mod


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 35328
    blk_a = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    blk_b = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    # the shipped PCA dims (bench._ensure_pca / configs/model/dgrad.py):
    # scale (t6, 85), rotat (t3, 180) — MUST match serving or the Mosaic
    # kernels compile fresh for shapes nobody runs
    ks, kr = 85, 180
    reps, rounds = 8, 4

    solver = frame_mod.set_template_mesh()
    consts, spec = solver.consts, solver.spec
    t6 = spec.n_tris * 6
    rng = np.random.default_rng(0)
    scale_sub = {"compT": jnp.asarray(rng.standard_normal((t6, ks)), jnp.float32) * 1e-2,
                 "means": jnp.asarray(rng.standard_normal((t6,)), jnp.float32) * 1e-2}
    t3 = spec.n_tris * 3
    rotat_sub = {"compT": jnp.asarray(rng.standard_normal((t3, kr)), jnp.float32) * 1e-2,
                 "means": jnp.asarray(rng.standard_normal((t3,)), jnp.float32) * 1e-2}
    print(f"prep_consts (rows={rows}, {blk_a} vs {blk_b}) ...", flush=True)
    dsc = prep_consts(scale_sub, rotat_sub, consts, spec, p_host=solver._p_np)

    cs = jnp.asarray(rng.standard_normal((rows, ks)), jnp.float32)
    cr = jnp.asarray(rng.standard_normal((rows, kr)), jnp.float32)

    def timed(blk):
        @jax.jit
        def rep(cs, cr):
            def body(_, carry):
                cs_c, acc = carry
                x = decode_solve_free(cs_c, cr, dsc, block_rows=blk)
                s = x[0, 0, :8].sum()
                # next iteration's input depends on this output:
                # serialized on device, CSE impossible
                return cs_c + s * 1e-30, acc + s
            return jax.lax.fori_loop(0, reps, body, (cs, jnp.float32(0)))[1]
        return rep

    fns = {blk_a: timed(blk_a), blk_b: timed(blk_b)}
    for blk, fn in fns.items():
        print(f"compiling blk={blk} ...", flush=True)
        np.asarray(fn(cs, cr))  # compile + warm

    results = {blk_a: [], blk_b: []}
    for r in range(rounds):
        for blk, fn in fns.items():
            t0 = time.perf_counter()
            np.asarray(fn(cs, cr))  # only a host sync is trustworthy
            dt = (time.perf_counter() - t0) / reps * 1e3
            results[blk].append(dt)
            print(f"round {r}: blk={blk} {dt:.2f} ms/call", flush=True)

    import json
    out = {f"blk{blk}_ms_per_call_median": float(np.median(v))
           for blk, v in results.items()}
    out.update({f"blk{blk}_ms_all": [round(x, 2) for x in v]
                for blk, v in results.items()})
    out.update(rows=rows, reps_in_jit=reps,
               backend=jax.default_backend())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
