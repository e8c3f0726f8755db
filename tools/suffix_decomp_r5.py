#!/usr/bin/env python
"""RTT-free decomposition of the serving suffix at the 128-clip shape.

The bench stage table says suffix_decode_solve ≈ 286 ms/call, but the
known parts (fused2 biLSTM ~112 incl RTT, fused decode+solve ~92.5)
leave ~100 ms unattributed — attention + output heads + the window
gather, never measured on their own. This times each piece with the
CSE-proof in-jit fori_loop (solve_tile_ab pattern; CLAUDE.md: per-call
timing over the tunnel carries a ~35 ms RTT floor), so the numbers are
device time, not RTT.

Pieces (serving shapes: 128 clips × 4 s, W=35328 windows, T=64):
  fw      forward_windows: gather + biLSTM stack + attention + heads
          → raw (W, 265) PCA coefficients
  lstm    the fused 2-layer biLSTM kernel alone (shipped default blk)
  gather  z_src[frame_idx] + moveaxis alone

attention+heads ≈ fw − lstm − gather. Run alone on a quiet host.
Writes artifacts/suffix_probe_r5/decomp.json.
"""

import json
import os
import sys
import time

os.environ.setdefault("SDFA_MATMUL_PRECISION", "high")
os.environ.setdefault("SDFA_OPS_PRECISION", "high")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sdfa_jax_cache")

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/sdfa_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from sdfa_tpu.audio import pipeline as ap
    from sdfa_tpu.models import build_model
    from sdfa_tpu.models.sdfa import SpeechDrivenAnimation
    from sdfa_tpu.tools import configure

    n_clips, seconds = 128, 4.0
    root = bench._ensure_pca("/tmp/bench_assets")
    hp = configure("dgrad", dataset_root=root)
    model = build_model(hp, load_pca=True)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((2, 64, 128, 3), jnp.float32),
                           jnp.zeros((2,), jnp.int32), False)

    wspec = ap.WindowSpec(hp)
    sr = int(hp.audio.sample_rate)
    sig_len = int(seconds * sr)
    frame_idx_np, _, _pl, _pr, t_total = wspec.frame_grid(sig_len)
    w_per_clip = len(frame_idx_np)
    rows = n_clips * w_per_clip
    idx_all = (np.arange(n_clips, dtype=np.int32)[:, None, None] * t_total
               + frame_idx_np[None]).reshape(-1, frame_idx_np.shape[-1])
    idx_dev = jnp.asarray(idx_all)
    spk = jnp.zeros((rows,), jnp.int32)
    gen = np.random.default_rng(0)
    z_flat = jnp.asarray(
        gen.standard_normal((n_clips * t_total, 256)).astype(np.float32) * 0.1)

    reps, rounds = 4, 3
    out_path = os.path.join(_ROOT, "artifacts", "suffix_probe_r5",
                            "decomp.json")
    results = {"rows": rows, "t_total": int(t_total), "reps": reps,
               "shape": f"{n_clips}x{seconds:g}s"}

    def run(name, rep_fn, *args):
        t0 = time.time()
        np.asarray(jnp.ravel(rep_fn(*args))[:1])  # compile + warm
        compile_s = time.time() - t0
        ts = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            np.asarray(jnp.ravel(rep_fn(*args))[:1])
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        ms = med / reps * 1e3  # per-iteration; RTT amortized over reps
        results[name] = {"ms": round(ms, 2), "compile_s": round(compile_s, 1)}
        print(json.dumps({name: results[name]}), flush=True)

    # ---- fw: full forward_windows (raw PCA out) ----
    @jax.jit
    def rep_fw(z):
        def body(_, carry):
            z_c, acc = carry
            preds, _, _ = model.apply(
                variables, z_c, idx_dev, spk, raw_pca=True,
                method=SpeechDrivenAnimation.forward_windows)
            s = preds["dgrad_3d_scale_pca"][0, 0, :4].sum()
            return z_c + s * 1e-30, acc + s
        return jax.lax.fori_loop(0, reps, body, (z, jnp.float32(0)))[1]

    run("fw_forward_windows", rep_fw, z_flat)

    # ---- lstm: the shipped fused 2-layer kernel alone ----
    from sdfa_tpu.ops.pallas_bilstm2 import bilstm_2layer_fused

    H = 256
    blk = int(os.environ.get("SDFA_BILSTM2_BLOCK", "128"))
    x0 = jnp.asarray(gen.standard_normal(
        (rows, 64, 256)).astype(np.float32) * 0.1, jnp.bfloat16)
    wts = [jnp.asarray(gen.standard_normal(s).astype(np.float32) * 0.05)
           for s in ((2, 256, 4 * H), (2, H, 4 * H), (2, 4 * H),
                     (2, 2 * H, 4 * H), (2, H, 4 * H), (2, 4 * H))]

    @jax.jit
    def rep_lstm(x):
        def body(_, carry):
            x_c, acc = carry
            out = bilstm_2layer_fused(x_c, *wts, block_rows=blk,
                                      out_dtype=jnp.bfloat16)
            s = out[0, 0, :8].astype(jnp.float32).sum()
            return x_c + (s * 1e-30).astype(x_c.dtype), acc + s
        return jax.lax.fori_loop(0, reps, body, (x, jnp.float32(0)))[1]

    run(f"lstm_fused2_blk{blk}", rep_lstm, x0)

    # ---- gather: bf16 cast + window gather + moveaxis ----
    @jax.jit
    def rep_gather(z):
        def body(_, carry):
            z_c, acc = carry
            zw = z_c.astype(jnp.bfloat16)[idx_dev]      # (W, frames, 256)
            s = zw[0, 0, :8].astype(jnp.float32).sum()
            return z_c + s * 1e-30, acc + s
        return jax.lax.fori_loop(0, reps, body, (z, jnp.float32(0)))[1]

    run("gather_bf16", rep_gather, z_flat)

    # ---- decode+solve: one whole-batch call AND the bench's actual
    # 3-chunk padded_chunk_map form (dchunk=16384 → 3×11776) ----
    from sdfa_tpu.ops import padded_chunk_map
    from sdfa_tpu.ops.pallas_decode_solve import (decode_solve_free,
                                                  prep_consts)
    from sdfa_tpu.viewer import frame as frame_mod

    solver = frame_mod.set_template_mesh()
    consts, spec = solver.consts, solver.spec
    ks, kr = 85, 180
    t6, t3 = spec.n_tris * 6, spec.n_tris * 3
    scale_sub = {"compT": jnp.asarray(
        gen.standard_normal((t6, ks)).astype(np.float32) * 1e-2),
        "means": jnp.asarray(
            gen.standard_normal((t6,)).astype(np.float32) * 1e-2)}
    rotat_sub = {"compT": jnp.asarray(
        gen.standard_normal((t3, kr)).astype(np.float32) * 1e-2),
        "means": jnp.asarray(
            gen.standard_normal((t3,)).astype(np.float32) * 1e-2)}
    dsc = prep_consts(scale_sub, rotat_sub, consts, spec,
                      p_host=solver._p_np)
    cs = jnp.asarray(gen.standard_normal((rows, ks)).astype(np.float32))
    cr = jnp.asarray(gen.standard_normal((rows, kr)).astype(np.float32))

    from sdfa_tpu.ops.pallas_decode_solve import decode_solve_fused

    @jax.jit
    def rep_ds(cs_in, cr_in):
        def body(_, carry):
            c, acc = carry
            x = decode_solve_fused(c, cr_in, dsc, consts, spec,
                                   consts.template_cnst, out_layout="3v")
            s = x[0, 0, :8].sum()
            return c + s * 1e-30, acc + s
        return jax.lax.fori_loop(0, reps, body, (cs_in, jnp.float32(0)))[1]

    run("decode_solve_whole", rep_ds, cs, cr)

    dchunk = 16384

    @jax.jit
    def rep_ds_chunked(cs_in, cr_in):
        def one(tree):
            return decode_solve_fused(tree[0], tree[1], dsc, consts, spec,
                                      consts.template_cnst, out_layout="3v")

        def body(_, carry):
            c, acc = carry
            x = padded_chunk_map(one, (c, cr_in), rows, dchunk)
            s = x[0, 0, :8].sum()
            return c + s * 1e-30, acc + s
        return jax.lax.fori_loop(0, reps, body, (cs_in, jnp.float32(0)))[1]

    run("decode_solve_3chunk_map", rep_ds_chunked, cs, cr)

    fw = results["fw_forward_windows"]["ms"]
    lstm = results[f"lstm_fused2_blk{blk}"]["ms"]
    gat = results["gather_bf16"]["ms"]
    results["attention_heads_residual_ms"] = round(fw - lstm - gat, 2)
    results["ledger_ms"] = round(
        fw + results["decode_solve_3chunk_map"]["ms"], 2)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fp:
        json.dump(results, fp, indent=1)
    print(json.dumps(results), flush=True)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
