#!/usr/bin/env python
"""Reproducible long training run (the round-3 proof lived in /tmp and
did not survive the image; this is the checked-in version).

Trains the shipped dgrad architecture for --steps optimizer steps on the
synthetic dgrad dataset (raw-mode device featurization + pca_targets,
same configuration as bench.py's realism checkpoint), exercising the
full production cadence: validation epochs, rolling checkpoints,
best-checkpoint selection, loss CSV. The resulting run dir feeds

  - the bench realism/parity line against a CONVERGED checkpoint
    (BENCH_TRAIN_DIR=<run-dir> BENCH_TRAIN_STEPS=<steps> python bench.py),
    closing DESIGN §12.6's caveat that 1-pass bf16 parity was pinned on a
    30-step checkpoint (VERDICT r3 #5);
  - the end-to-end `python -m sdfa_tpu evaluate` artifact (VERDICT r3 #7).

Usage: python tools/longrun_train.py --steps 2500 \
    --run-dir /tmp/longrun_r4 [--root /tmp/longrun_assets/voca]
"""

import argparse
import os
import sys

os.environ.setdefault("SDFA_MATMUL_PRECISION", "high")
os.environ.setdefault("SDFA_OPS_PRECISION", "high")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sdfa_jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--run-dir", default="/tmp/longrun_r4")
    ap.add_argument("--root", default="/tmp/longrun_assets/voca")
    ap.add_argument("--speakers", type=int, default=2)
    ap.add_argument("--sentences", type=int, default=2)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--cpu", action="store_true",
                    help="smoke-test on XLA:CPU")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from sdfa_tpu import api
    from sdfa_tpu.data import synthetic

    if not os.path.exists(os.path.join(args.root, "train.csv")):
        synthetic.generate(
            args.root, "dgrad_3d",
            speakers=[f"m{i}" if i % 2 == 0 else f"f{i}"
                      for i in range(args.speakers)],
            sentences_per_speaker=args.sentences,
            seconds_per_sentence=args.seconds)
    # max_epochs must not bind before --steps: the synthetic dataset at
    # the defaults yields ~10 optimizer steps/epoch, so the stock
    # max_epochs=100 would stop a 2500-step run at step 1000. The
    # trainer's global max_steps cap empties the loader once reached, so
    # an effectively-unbounded epoch cap makes --steps the binding stop.
    api.train_model(
        "dgrad", dataset_root=args.root, log_dir=args.run_dir,
        max_steps=args.steps,
        overrides=dict(trainer=dict(pca_targets=True,
                                    max_epochs=10 ** 6)))
    print(f"trained {args.steps} steps -> {args.run_dir}")


if __name__ == "__main__":
    main()
