"""Evaluation CLI (reference Test_KITTI.py).

    python -m fal_net_tpu.cli.test --data_root /data/KITTI \
        --lists_dir /data/lists --pretrained ckpt.msgpack --tdataName Kitti_eigen_test_improved
"""

from __future__ import annotations

import argparse

from fal_net_tpu.data.datasets import (
    kitti2015,
    kitti_eigen_test_improved,
    kitti_eigen_test_original,
    make3d,
)
from fal_net_tpu.eval.evaluate import EvalConfig, Evaluator
from fal_net_tpu.models import create_model
from fal_net_tpu.train.checkpoint import load_params_any

EVAL_DATASETS = {
    "Kitti_eigen_test_improved": kitti_eigen_test_improved,
    "Kitti_eigen_test_original": kitti_eigen_test_original,
    "Kitti2015": lambda root, split=0, lists_dir=None: kitti2015(root, split),
    "Make3D": lambda root, split=0, lists_dir=None: make3d(root, split),
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="fal_net_tpu evaluator")
    p.add_argument("--tdataName", default="Kitti_eigen_test_improved",
                   choices=sorted(EVAL_DATASETS))
    p.add_argument("--data_root", required=True)
    p.add_argument("--lists_dir", default=None)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--pretrained",
                     help="native .msgpack or reference .pth.tar checkpoint")
    src.add_argument("--artifact",
                     help="AOT serving artifact/bundle from cli.export — "
                     "evaluate exactly the deployed forward, no model code "
                     "or checkpoint needed (ms-pp needs a --with_ms_pp "
                     "bundle)")
    p.add_argument("--model", default=None, help="override model variant")
    p.add_argument("--no_levels", type=int, default=None)
    p.add_argument("--max_disp", type=float, default=300.0)
    p.add_argument("--min_disp", type=float, default=2.0)
    p.add_argument("--rel_baselne", "--rel_baseline", dest="rel_baseline",
                   type=float, default=1.0)
    p.add_argument("--f_post_process", action="store_true")
    p.add_argument("--no_ms_post_process", action="store_true")
    p.add_argument("--median", action="store_true")
    p.add_argument("--save", action="store_true")
    p.add_argument("--save_pan", action="store_true")
    p.add_argument("--save_input", action="store_true")
    p.add_argument("--save_pc", action="store_true")
    p.add_argument("--save_path", default="Test_Results")
    p.add_argument("--dtype", default="float32", choices=("float32", "bfloat16"))
    p.add_argument(
        "--maskr_quirk", action="store_true",
        help="bit-for-bit FAL_netA maskR compat: reproduce the reference's "
        "align_corners-less maskR warp (models/FAL_netA.py:264) for "
        "published A checkpoints",
    )
    p.add_argument(
        "--batch_size", type=int, default=8,
        help="images per forward within a shape bucket (metrics are "
        "per-image and identical at any batch size; the reference forces "
        "1, Test_KITTI.py:113)",
    )
    p.add_argument(
        "--relay_retries", type=int, default=2,
        help="re-dispatch an eval batch whose async forward failed with a "
        "transient runtime error, up to this many times (0 = fail fast)",
    )
    p.add_argument(
        "--decode_workers", type=int, default=4,
        help="background threads prefetch-decoding images ahead of the "
        "device (in-order — metrics identical to 0 = inline decode)",
    )
    p.add_argument(
        "--quantize_transfer", action="store_true",
        help="fetch disparities as device-quantized uint16 (1/256 px — the "
        "KITTI GT PNG fixed point; half the device->host bytes, metrics "
        "shift ~1e-5; caps at 255.996 px)",
    )
    p.add_argument(
        "--fp32_upload", action="store_true",
        help="upload host-normalized fp32 images instead of the default "
        "raw uint8 + on-device normalization (uint8 is 4x fewer "
        "host->device bytes and equal to 1 ulp)",
    )
    p.add_argument(
        "--no_med_selfcheck", action="store_true",
        help="skip the per-shape fused-MED-kernel-vs-jnp-oracle gate on "
        "the --save_pan path (on by default; a disagreement falls back to "
        "the jnp MED path with a warning — ops/med_selfcheck.py)",
    )
    p.add_argument(
        "--num_devices", type=int, default=None,
        help="shard each evaluation batch over this many chips (params "
        "replicated; batch_size must be divisible by it)",
    )
    return p


def main(argv=None) -> None:
    import jax.numpy as jnp

    args = build_parser().parse_args(argv)
    artifact_fwd = model = variables = None
    mesh = None
    if args.artifact:
        # These flags are baked into (or fixed by) the export; silently
        # ignoring an explicit value would evaluate a different config than
        # the user asked for (same contract as cli.infer, ADVICE r2).
        # Post-processing / --quantize_transfer / --decode_workers still
        # apply — they run outside the artifact's baked forward.
        parser = build_parser()
        ignored = [
            name
            for name in (
                "model", "no_levels", "max_disp", "min_disp", "rel_baseline",
                "dtype", "maskr_quirk", "batch_size", "fp32_upload",
                "num_devices",
            )
            if getattr(args, name) != parser.get_default(name)
        ]
        if ignored:
            raise SystemExit(
                "--artifact mode evaluates the deployed forward exactly; "
                "these checkpoint-mode flags have no effect here: "
                + ", ".join("--" + n for n in ignored)
                + ".  Re-export with cli.export to change them."
            )
        from fal_net_tpu.serve import load_exported

        artifact_fwd = load_exported(args.artifact)
        print(
            f"=> loaded artifact {args.artifact} "
            f"({artifact_fwd.meta.get('variant')}, "
            f"shapes {artifact_fwd.meta.get('shapes') or [[artifact_fwd.meta['height'], artifact_fwd.meta['width']]]})"
        )
    else:
        variables, name, levels = load_params_any(args.pretrained)
        model_name = args.model or name or "B"
        num_levels = args.no_levels or levels
        dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
        if args.num_devices and args.num_devices > 1:
            from fal_net_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(args.num_devices)
        model = create_model(
            model_name, num_levels, dtype=dtype, a_maskr_quirk=args.maskr_quirk,
            med_mesh=mesh,  # keeps the fused MED head under sharding (save_pan)
        )
        print(f"=> loaded {model_name} (N={model.num_levels}) from {args.pretrained}")

    factory = EVAL_DATASETS[args.tdataName]
    try:
        _, dataset = factory(args.data_root, split=0, lists_dir=args.lists_dir)
    except TypeError:
        _, dataset = factory(args.data_root, split=0)
    print(f"=> {len(dataset)} evaluation samples")
    if artifact_fwd is not None:
        # dataset dtype must match the artifact input signature (the
        # artifact's own input stage decides about normalization)
        raw = artifact_fwd.meta.get("input") == "uint8"
        if hasattr(dataset, "raw_uint8"):
            dataset.raw_uint8 = raw
    elif not args.fp32_upload and hasattr(dataset, "raw_uint8"):
        dataset.raw_uint8 = True  # 4x fewer upload bytes; Evaluator
        #                           normalizes on device (1-ulp equal)

    cfg = EvalConfig(
        dataset=args.tdataName,
        max_disp=args.max_disp,
        min_disp=args.min_disp,
        rel_baseline=args.rel_baseline,
        batch_size=args.batch_size,
        decode_workers=args.decode_workers,
        quantize_transfer=args.quantize_transfer,
        relay_retries=args.relay_retries,
        f_post_process=args.f_post_process,
        ms_post_process=not args.no_ms_post_process and not args.f_post_process,
        use_median=args.median,
        save=args.save,
        save_pan=args.save_pan,
        save_input=args.save_input,
        save_point_cloud=args.save_pc,
        save_path=args.save_path,
        med_selfcheck=not args.no_med_selfcheck,
    )
    if artifact_fwd is not None:
        evaluator = Evaluator.from_artifact(artifact_fwd, cfg)
    else:
        evaluator = Evaluator(model, variables, cfg, mesh=mesh)
    metrics = evaluator.run(dataset)
    print({k: round(v, 4) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
