"""CLI: python -m sdfa_tpu {train,evaluate,trace,preprocess,synth}.

Reference surface: /root/reference/speech_anime/__main__.py:8-49 plus the
dataset pipeline driver (dataset_preprocess.py:11-45).
"""

from __future__ import annotations

import argparse
import json


def main():
    parser = argparse.ArgumentParser("sdfa_tpu")
    parser.add_argument("mode", choices=["train", "evaluate", "trace",
                                         "preprocess", "synth", "serve"])
    parser.add_argument("--custom_hparams", type=str, default=None)
    parser.add_argument("--tag", type=str, default=None)
    parser.add_argument("--log_dir", type=str, default=None)
    parser.add_argument("--load_from", type=str, default=None)
    parser.add_argument("--dataset_root", type=str, default=None)
    parser.add_argument("--eval_input", type=str, default=None)
    parser.add_argument("--eval_spk_cond", type=str, default=None)
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--traced_dump_path", type=str, default=None)
    parser.add_argument("--overrides", type=str, default=None,
                        help="JSON dict merged over hparams")
    parser.add_argument("--max_steps", type=int, default=None)
    # preprocess / synth options
    parser.add_argument("--source_root", type=str, default=None,
                        help="raw VOCASET download root (preprocess)")
    parser.add_argument("--face_type", type=str, default="dgrad_3d")
    parser.add_argument("--pitch_variants", action="store_true",
                        help="also generate the ±2/±4-semitone audio blob "
                             "variants consumed by random_pitch_shift")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler device trace of a few "
                             "warm train steps into this dir")
    # evaluate options (reference __main__.py:14-33)
    parser.add_argument("--ensembling_ms", type=int, default=None,
                        help="overwrite 'ensembling_ms'")
    parser.add_argument("--save_video", action=argparse.BooleanOptionalAction,
                        default=True)
    parser.add_argument("--export_mesh_frames",
                        action=argparse.BooleanOptionalAction, default=True)
    parser.add_argument("--draw_latent", action="store_true")
    parser.add_argument("--grid_w", type=int, default=512)
    parser.add_argument("--grid_h", type=int, default=512)
    parser.add_argument("--font_size", type=int, default=24)
    parser.add_argument("--overwrite_video", action=argparse.BooleanOptionalAction,
                        default=True)
    # serve options (sdfa_tpu/serve.py — no reference counterpart)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=9876)
    parser.add_argument("--capacity", type=int, default=8,
                        help="max concurrent live streams (serve)")
    parser.add_argument("--emit_batch", type=int, default=16)
    parser.add_argument("--block_frames", type=int, default=16)
    parser.add_argument("--device_wire",
                        choices=["i16", "f32", "i8d", "coef", "coef16"],
                        default="i16",
                        help="device→host wire format (serve): i16/f32/"
                        "i8d ship vertices; coef/coef16 ship 265 PCA "
                        "coefficients the client decodes locally "
                        "(streaming.CoefDecoder)")
    parser.add_argument("--no_pipeline", action="store_true",
                        help="disable pipelined ticks (serve)")
    # deformation asset overrides (reference __main__.py:15-17)
    parser.add_argument("--template_mesh", type=str, default=None)
    parser.add_argument("--mesh_constraints", type=str, default=None)
    parser.add_argument("--mesh_tricorres", type=str, default=None)
    parser.add_argument("--platform", choices=["tpu", "cpu"], default=None,
                        help="force the JAX backend; needed because some "
                        "images pin jax_platforms at import so the "
                        "JAX_PLATFORMS env var alone is ignored")
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms",
                          "cpu" if args.platform == "cpu" else "axon,cpu")

    overrides = json.loads(args.overrides) if args.overrides else None
    if args.tag:
        overrides = dict(overrides or {})
        overrides["tag"] = args.tag
    if args.profile_dir:
        overrides = dict(overrides or {})
        overrides.setdefault("trainer", {})
        overrides["trainer"] = dict(overrides["trainer"], profile=dict(
            dir=args.profile_dir, start_step=10, num_steps=5))

    if args.mode == "train":
        from .api import train_model

        train_model(
            custom_hparams=args.custom_hparams,
            log_dir=args.log_dir,
            load_from=args.load_from,
            dataset_root=args.dataset_root,
            overrides=overrides,
            max_steps=args.max_steps,
        )
    elif args.mode == "evaluate":
        from .api import evaluate_model

        if args.ensembling_ms is not None:
            overrides = dict(overrides or {}, ensembling_ms=args.ensembling_ms)
        if args.template_mesh or args.mesh_constraints or args.mesh_tricorres:
            from .viewer import frame as frame_mod

            frame_mod.set_template_mesh(
                template_path=args.template_mesh,
                constraints_path=args.mesh_constraints,
                corres_path=args.mesh_tricorres,
            )
        evaluate_model(
            custom_hparams=args.custom_hparams,
            load_from=args.load_from,
            eval_input=args.eval_input,
            eval_spk_cond=args.eval_spk_cond,
            output_dir=args.output_dir,
            dataset_root=args.dataset_root,
            overrides=overrides,
            save_video=args.save_video,
            export_mesh_frames=args.export_mesh_frames,
            draw_latent=args.draw_latent,
            grid_w=args.grid_w,
            grid_h=args.grid_h,
            font_size=args.font_size,
            overwrite_video=args.overwrite_video,
        )
    elif args.mode == "trace":
        from .api import trace_model

        trace_model(
            custom_hparams=args.custom_hparams,
            load_from=args.load_from,
            traced_dump_path=args.traced_dump_path,
            dataset_root=args.dataset_root,
            overrides=overrides,
        )
    elif args.mode == "synth":
        from .data import synthetic

        root = args.dataset_root or "/tmp/synth_voca"
        synthetic.generate(root, face_type=args.face_type)
        print(f"synthetic dataset written to {root}")
    elif args.mode == "serve":
        from .api import load_task, load_traced
        from .serve import serve

        if args.traced_dump_path:
            # warm start from a trace_model dump (api.load_traced):
            # hparams + weights are self-contained, no checkpoint needed
            task = load_traced(args.traced_dump_path, device_frontend=True,
                               overlap_frontend=True)
        elif args.load_from:
            task = load_task(args.load_from,
                             custom_hparams=args.custom_hparams,
                             dataset_root=args.dataset_root,
                             overrides=overrides,
                             device_frontend=True, overlap_frontend=True)
        else:
            parser.error("serve requires --load_from <checkpoint> or "
                         "--traced_dump_path <trace_model dir>")
        serve(task, host=args.host, port=args.port, capacity=args.capacity,
              emit_batch=args.emit_batch, block_frames=args.block_frames,
              wire=args.device_wire, pipeline=not args.no_pipeline)
    elif args.mode == "preprocess":
        from .data.vocaset import preload

        preload.run_pipeline(
            source_root=args.source_root,
            output_root=args.dataset_root,
            face_type=args.face_type,
            pitch_variants=args.pitch_variants,
        )


if __name__ == "__main__":
    main()
