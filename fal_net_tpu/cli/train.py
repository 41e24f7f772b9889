"""Training CLI.

    python -m fal_net_tpu.cli.train --stage 1 --data_root /data/KITTI \
        --lists_dir /data/lists --model B

Covers the three reference entry scripts (Train_Stage1_K.py,
Train_Stage1_Kslow.py via --slow, Train_Stage2_K.py via --stage 2) with one
flag set; numeric flags are properly typed (the reference left several as
strings, SURVEY §5).
"""

from __future__ import annotations

import argparse

from fal_net_tpu.data import REGISTRY as DATASETS
from fal_net_tpu.data import kitti2015
from fal_net_tpu.train import Stage1Config, Stage2Config, Trainer
from fal_net_tpu.parallel.mesh import make_mesh


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="fal_net_tpu trainer")
    p.add_argument("--stage", type=int, default=1, choices=(1, 2))
    p.add_argument("--slow", action="store_true", help="two-sided stage-1 variant")
    p.add_argument("--model", default="B")
    p.add_argument("--no_levels", type=int, default=None)
    p.add_argument("--dataset", default="Kitti", choices=sorted(DATASETS))
    p.add_argument("--data_root", required=True)
    p.add_argument("--lists_dir", default=None)
    p.add_argument("--val_root", default=None, help="KITTI2015 root for validation")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--epoch_size", type=int, default=0)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument(
        "--weight_decay", "--wd", dest="weight_decay", type=float, default=0.0,
        help="L2-into-grad on non-bias params (torch-Adam per-group "
        "weight_decay semantics; reference --weight-decay default 0.0)",
    )
    p.add_argument(
        "--bias_decay", type=float, default=0.0,
        help="L2-into-grad on bias params (reference --bias-decay, default 0.0)",
    )
    p.add_argument(
        "--momentum", "--beta1", dest="beta1", type=float, default=None,
        help="Adam beta1 (the reference's --momentum, default 0.5)",
    )
    p.add_argument(
        "--beta", "--beta2", dest="beta2", type=float, default=None,
        help="Adam beta2 (the reference's --beta, default 0.999)",
    )
    p.add_argument(
        "--milestones", type=int, nargs="*", default=None,
        help="epochs at which LR halves (MultiStepLR; stage defaults "
        "30 40 / 5 10)",
    )
    p.add_argument("--print_freq", "--print-freq", dest="print_freq",
                   type=int, default=None)
    p.add_argument(
        "--tbatch_size", "--val_batch_size", dest="val_batch_size",
        type=int, default=None,
        help="validation batch size (metrics per-image, identical to 1)",
    )
    p.add_argument(
        "--rel_baset", "--rel_baseline_val", dest="rel_baseline_val",
        type=float, default=None,
        help="validation-set baseline scale (Train_Stage1_K.py:36)",
    )
    p.add_argument("--max_disp", type=float, default=300.0)
    p.add_argument("--min_disp", type=float, default=2.0)
    p.add_argument("--a_p", type=float, default=None)
    p.add_argument("--a_sm", type=float, default=None)
    p.add_argument("--a_mr", type=float, default=None)
    p.add_argument("--crop_height", type=int, default=192)
    p.add_argument("--crop_width", type=int, default=640)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_path", default="runs")
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("--pretrained", default=None,
                   help="params-only warm start (reference --pretrained)")
    p.add_argument("--resume", default=None,
                   help="full-state resume: params + Adam moments + step "
                   "(preemption-safe; epoch restored from the checkpoint)")
    p.add_argument("--save_every_steps", type=int, default=0,
                   help="also checkpoint mid-epoch every N steps")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture an XLA/host profiler trace spanning this "
                   "many first-epoch steps to <save_path>/profile")
    p.add_argument("--relay_retries", type=int, default=2,
                   help="retry transient runtime/dispatch failures this many "
                   "times, rolling back to the last host snapshot if a "
                   "failed step consumed its donated state (0 = fail fast)")
    p.add_argument("--fix_model", default=None, help="stage-2 frozen teacher ckpt")
    p.add_argument("--vgg_weights", default=None)
    p.add_argument(
        "--allow_random_vgg",
        action="store_true",
        help="opt-in: run the a_p>0 perceptual loss against random-init "
        "VGG features when no --vgg_weights are given (the reference "
        "always uses pretrained ImageNet features)",
    )
    p.add_argument("--dtype", default="float32", choices=("float32", "bfloat16"))
    p.add_argument(
        "--no_med_selfcheck",
        action="store_true",
        help="skip the setup-time fused-MED-kernel-vs-jnp-oracle gate at "
        "this run's exact shape (on by default; a disagreement falls back "
        "to the jnp MED path with a warning — ops/med_selfcheck.py)",
    )
    p.add_argument(
        "--grad_accum",
        type=int,
        default=1,
        help="microbatches per step (same update, 1/N activation HBM)",
    )
    p.add_argument("--remat", action="store_true", help="recompute fwd in bwd")
    p.add_argument("--num_devices", type=int, default=None)
    p.add_argument(
        "--spatial",
        type=int,
        default=1,
        help="shard image rows over this many devices (2-D dp x sp mesh)",
    )
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    cls = Stage2Config if args.stage == 2 else Stage1Config
    # slow must reach the constructor: Stage1Config.__post_init__ applies the
    # Kslow batch-size default (4, Train_Stage1_Kslow.py:48); the explicit
    # --batch_size override below still wins.
    extra = {"slow": args.slow} if args.stage == 1 else {}
    cfg = cls(
        **extra,
        model=args.model,
        dataset=args.dataset,
        data_root=args.data_root,
        lists_dir=args.lists_dir,
        crop_size=(args.crop_height, args.crop_width),
        max_disp=args.max_disp,
        min_disp=args.min_disp,
        epoch_size=args.epoch_size,
        workers=args.workers,
        seed=args.seed,
        save_path=args.save_path,
        start_epoch=args.start_epoch,
        pretrained=args.pretrained,
        resume=args.resume,
        save_every_steps=args.save_every_steps,
        profile_steps=args.profile_steps,
        relay_retries=args.relay_retries,
        vgg_weights=args.vgg_weights,
        allow_random_vgg=args.allow_random_vgg,
        compute_dtype=args.dtype,
        grad_accum=args.grad_accum,
        remat=args.remat,
        med_selfcheck=not args.no_med_selfcheck,
    )
    if args.stage == 2:
        cfg.fix_model = args.fix_model  # type: ignore[attr-defined]
        if args.a_mr is not None:
            cfg.a_mr = args.a_mr  # type: ignore[attr-defined]
    if args.no_levels is not None:
        cfg.num_levels = args.no_levels
    cfg.weight_decay = args.weight_decay
    cfg.bias_decay = args.bias_decay
    if args.milestones is not None:
        cfg.milestones = tuple(args.milestones)
    for name in ("batch_size", "epochs", "lr", "a_p", "a_sm", "beta1",
                 "beta2", "print_freq", "val_batch_size",
                 "rel_baseline_val"):
        v = getattr(args, name)
        if v is not None:
            setattr(cfg, name, v)

    stage = "stage2" if args.stage == 2 else ("stage1_slow" if args.slow else "stage1")
    val_dataset = None
    if args.val_root:
        # load_t1=False: validation reads only the _10 pair + disp GT;
        # skipping the t+1 decode halves per-item image IO.
        _, val_dataset = kitti2015(args.val_root, split=0, disp=True, load_t1=False)

    mesh = None
    if args.spatial > 1:
        import jax

        from fal_net_tpu.parallel.spatial import make_2d_mesh

        total = args.num_devices or len(jax.devices())
        if total % args.spatial != 0:
            raise ValueError(
                f"--spatial {args.spatial} must divide the device count {total}"
            )
        mesh = make_2d_mesh(total // args.spatial, args.spatial)
    elif args.num_devices:
        mesh = make_mesh(args.num_devices)

    trainer = Trainer(
        cfg,
        stage=stage,
        mesh=mesh,
        val_dataset=val_dataset,
    )
    result = trainer.fit()
    print(f"best {result['best_metric']}:", result["best_value"])


if __name__ == "__main__":
    main()
