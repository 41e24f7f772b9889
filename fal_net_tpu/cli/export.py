"""AOT export CLI: checkpoint -> single-file compiled serving artifact.

    python -m fal_net_tpu.cli.export --pretrained ckpt.msgpack \
        --height 384 --width 1280 --batch 1 --out falnetB_384x1280.jaxexp

Accepts native .msgpack or reference .pth.tar checkpoints (like cli.test).
The artifact bakes the weights in as constants and runs via
``fal_net_tpu.serve.load_exported`` on any exported platform — no model
code or checkpoint needed on the serving host.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="fal_net_tpu AOT export")
    p.add_argument("--pretrained", required=True,
                   help="native .msgpack or reference .pth.tar checkpoint")
    p.add_argument("--model", default=None, help="override model variant")
    p.add_argument("--no_levels", type=int, default=None)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument(
        "--sizes", default=None,
        help="comma-separated HxW list (e.g. 375x1242,370x1226): export a "
        "multi-shape BUNDLE covering every bucket (overrides "
        "--height/--width); the loaded artifact dispatches by input shape",
    )
    p.add_argument(
        "--with_ms_pp", action="store_true",
        help="also export each size's 2/3-scale shape, so artifact-based "
        "evaluation (cli.test --artifact) can run the default multi-scale "
        "post-processing",
    )
    p.add_argument("--max_disp", type=float, default=300.0)
    p.add_argument("--min_disp", type=float, default=2.0)
    p.add_argument("--pan", action="store_true", help="also emit the pan view")
    p.add_argument("--subocc", action="store_true", help="also emit maskL/maskR")
    p.add_argument(
        "--uint8_input",
        action="store_true",
        help="artifact takes raw uint8 RGB, normalizes on device (4x "
        "smaller uploads)",
    )
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated lowering platforms")
    p.add_argument(
        "--dtype", default="float32", choices=("float32", "bfloat16"),
        help="backbone compute dtype baked into the artifact; bfloat16 is "
        "the measured best-throughput serving config on v5e (193 imgs/s "
        "at batch 32 vs 184 fp32; disparity output stays fp32 either way)",
    )
    p.add_argument("--out", required=True)
    return p


def main(argv=None) -> None:
    from fal_net_tpu.models import create_model
    from fal_net_tpu.serve import export_forward, save_exported
    from fal_net_tpu.train.checkpoint import load_params_any

    import jax.numpy as jnp

    args = build_parser().parse_args(argv)
    if args.uint8_input and args.with_ms_pp:
        # ms-pp needs float inputs for the 2/3-scale resample; Evaluator
        # .from_artifact rejects post-processing on uint8-input artifacts,
        # so the extra shapes could never be used — fail at export time
        # rather than after the bundle ships
        raise SystemExit(
            "--with_ms_pp needs a float32-input artifact; drop --uint8_input "
            "(ms-pp resamples the input, which a uint8 artifact hides "
            "behind its baked normalization)"
        )
    variables, name, levels = load_params_any(args.pretrained)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = create_model(args.model or name or "B", args.no_levels or levels,
                         dtype=dtype)
    kw = dict(
        batch=args.batch,
        min_disp=args.min_disp,
        max_disp=args.max_disp,
        ret_pan=args.pan,
        ret_subocc=args.subocc,
        platforms=tuple(s.strip() for s in args.platforms.split(",") if s.strip()),
        uint8_input=args.uint8_input,
    )
    shapes = []
    if args.sizes:
        for tok in args.sizes.split(","):
            h, w = tok.strip().lower().split("x")
            shapes.append((int(h), int(w)))
    elif args.with_ms_pp:
        shapes = [(args.height, args.width)]
    if args.with_ms_pp:
        up_fac = 2.0 / 3.0  # eval/postprocess.py::ms_post_process scale
        for h, w in list(shapes):
            small = (int(h * up_fac), int(w * up_fac))
            if small not in shapes:
                shapes.append(small)
    if shapes:
        from fal_net_tpu.serve import export_bundle

        batch = kw.pop("batch")
        blob = export_bundle(model, variables, shapes, batch=batch, **kw)
    else:
        blob = export_forward(
            model, variables, height=args.height, width=args.width, **kw
        )
    save_exported(args.out, blob)
    print(f"=> exported {len(blob)} bytes to {args.out}")


if __name__ == "__main__":
    main()
