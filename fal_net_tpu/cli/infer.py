"""Pure-inference serving CLI: a directory of images -> disparity maps.

    python -m fal_net_tpu.cli.infer --images /data/frames --out_dir out \
        --pretrained ckpt.msgpack                     # live checkpoint
    python -m fal_net_tpu.cli.infer --images /data/frames --out_dir out \
        --artifact falnetB_384x1280.jaxexp            # AOT artifact

The reference has no GT-free batch-inference path — its closest is
Test_KITTI.py's 'Owndata' branch, still batch-1 inside the eval loop.
This tool streams arbitrary images through the fixed-shape batched
pipeline (eval/pipeline.py): resize to the model resolution, infer,
resize the disparity back and rescale it by the width ratio (disparity
is measured in pixels, so it scales with width).

Outputs per image: 16-bit KITTI-convention disparity PNG (value*256)
and/or plasma-colormap PNG, optional .ply point cloud.
"""

from __future__ import annotations

import argparse
import os
from typing import Iterator, List, Tuple

import numpy as np

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp")


def list_images(root: str) -> List[str]:
    if os.path.isfile(root):
        return [root]
    out = []
    for name in sorted(os.listdir(root)):
        if name.lower().endswith(IMG_EXTS):
            out.append(os.path.join(root, name))
    return out


def load_uint8(path: str, height: int, width: int):
    """-> (HWC uint8 RGB at (height, width), original (H, W))."""
    from PIL import Image

    im = Image.open(path).convert("RGB")
    orig = (im.height, im.width)
    if (im.height, im.width) != (height, width):
        im = im.resize((width, height), Image.BILINEAR)
    return np.asarray(im, np.uint8), orig


def load_normalized(path: str, height: int, width: int):
    """-> (normalized HWC float32 at (height, width), original (H, W))."""
    from fal_net_tpu.data.transforms import normalize

    arr, orig = load_uint8(path, height, width)
    return normalize(arr), orig


def restore_disparity(disp_hw: np.ndarray, orig_hw: Tuple[int, int]) -> np.ndarray:
    """Resize a disparity map back to the original resolution, rescaling
    values by the width ratio (disparity is in pixels of the inference
    width)."""
    from PIL import Image

    h, w = orig_hw
    if disp_hw.shape == (h, w):
        return disp_hw
    scale = w / disp_hw.shape[1]
    im = Image.fromarray(np.asarray(disp_hw, np.float32))
    return np.asarray(im.resize((w, h), Image.BILINEAR), np.float32) * scale


def save_disp16(path: str, disp_hw: np.ndarray) -> None:
    """uint16 PNG, value*256 — the KITTI disparity file convention
    (inverse of data/datasets.py::load_kitti_disp_png).  The format's
    inherent ceiling is 65535/256 = 255.996 px; real KITTI disparities
    stay well under it, but values above are clipped."""
    from fal_net_tpu.native import io as native_io

    arr = np.clip(np.asarray(disp_hw, np.float64) * 256.0, 0, 65535)
    u16 = arr.astype(np.uint16)
    if native_io.available():
        native_io.imwrite_png16(path, u16)
        return
    from PIL import Image

    Image.fromarray(u16).save(path)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="fal_net_tpu batch inference")
    p.add_argument("--images", required=True, help="image file or directory")
    p.add_argument("--out_dir", required=True)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--pretrained", help=".msgpack or reference .pth.tar")
    src.add_argument("--artifact", help="AOT artifact from cli.export")
    p.add_argument("--model", default=None, help="variant override (ckpt mode)")
    p.add_argument("--no_levels", type=int, default=None)
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_disp", type=float, default=300.0)
    p.add_argument("--min_disp", type=float, default=2.0)
    p.add_argument("--ms_post_process", action="store_true")
    p.add_argument(
        "--quantize_transfer",
        action="store_true",
        help="fetch disparities as device-quantized uint16 (half the "
        "device->host bytes). Quantizes to 1/256 px AT THE INFERENCE "
        "RESOLUTION and caps values at 255.996 px, so leave this off "
        "when inputs are resized or disparities can exceed 256",
    )
    p.add_argument(
        "--relay_retries", type=int, default=2,
        help="re-run a batch whose dispatch/fetch failed with a transient "
        "runtime error, up to this many times (0 = fail fast)",
    )
    p.add_argument("--colormap", action="store_true",
                   help="also write plasma-colormap PNGs")
    p.add_argument("--save_pc", action="store_true", help="also write .ply")
    return p


def _run_artifact(fwd, items, relay_retries: int = 2) -> Iterator[Tuple[str, np.ndarray]]:
    """``fwd``: a loaded ``serve.load_exported`` artifact (single-shape or
    multi-shape bundle — images are bucketed by their resized shape and
    each bucket batches independently).  Transient dispatch/fetch
    failures re-run the batch from its host copy (``relay_retries``)."""
    from fal_net_tpu.utils.faults import retry_transient

    bs = fwd.meta["batch"]
    buckets = {}

    def flush(key):
        names, imgs = buckets.pop(key)
        pad = bs - len(imgs)
        batch = np.stack(imgs + [np.zeros_like(imgs[0])] * pad)
        disp = retry_transient(
            lambda: np.asarray(fwd(batch)[0])[..., 0],
            retries=relay_retries,
            describe="artifact serving batch",
        )
        for i, name in enumerate(names):
            yield name, disp[i]

    for name, img in items:
        names, imgs = buckets.setdefault(img.shape, ([], []))
        names.append(name)
        imgs.append(img)
        if len(imgs) == bs:
            yield from flush(img.shape)
    for key in list(buckets):
        yield from flush(key)


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    paths = list_images(args.images)
    if not paths:
        raise SystemExit(f"no images under {args.images}")
    os.makedirs(args.out_dir, exist_ok=True)

    artifact_fwd = None
    if args.artifact:
        # In artifact mode everything below is baked into (or fixed by) the
        # export; silently ignoring an explicit flag would hand back e.g.
        # un-post-processed output with no indication (ADVICE r2).
        parser = build_parser()
        ignored = [
            name
            for name, flag in (
                ("ms_post_process", "--ms_post_process"),
                ("quantize_transfer", "--quantize_transfer"),
                ("batch_size", "--batch_size"),
                ("min_disp", "--min_disp"),
                ("max_disp", "--max_disp"),
                ("height", "--height"),
                ("width", "--width"),
            )
            if getattr(args, name) != parser.get_default(name)
        ]
        if ignored:
            raise SystemExit(
                "--artifact mode bakes the forward into the export; these "
                "checkpoint-mode flags have no effect here: "
                + ", ".join("--" + n for n in ignored)
                + ".  Re-export with cli.export to change them."
            )
        from fal_net_tpu.serve import load_exported

        artifact_fwd = load_exported(args.artifact)
        height, width = artifact_fwd.meta["height"], artifact_fwd.meta["width"]
        bundle_shapes = [tuple(s) for s in artifact_fwd.meta.get("shapes", [])]
    else:
        height, width = args.height, args.width
        bundle_shapes = []

    def pick_target(orig_hw):
        """Nearest bundle bucket by log-scale distance (keeps aspect and
        resolution close, minimizing resample error); single-shape
        artifacts / checkpoint mode use the fixed (height, width)."""
        if not bundle_shapes:
            return height, width
        import math

        oh, ow = orig_hw
        return min(
            bundle_shapes,
            key=lambda s: abs(math.log(s[0] / oh)) + abs(math.log(s[1] / ow)),
        )

    # Unique output names: the stem alone collides for inputs differing
    # only by extension (img.jpg + img.png), which would restore the wrong
    # original size and overwrite one result with the other.  Suffixes are
    # checked against the used set too — 'img.1' could otherwise collide
    # with a real file named img.1.png.
    names, used = {}, set()
    for path in paths:
        stem = os.path.splitext(os.path.basename(path))[0]
        name, k = stem, 0
        while name in used:
            k += 1
            name = f"{stem}.{k}"
        used.add(name)
        names[path] = name

    origs = {}

    def items(raw_uint8: bool):
        loader = load_uint8 if raw_uint8 else load_normalized
        for path in paths:
            if bundle_shapes:
                from PIL import Image

                with Image.open(path) as im0:  # header only, no decode
                    th, tw = pick_target((im0.height, im0.width))
            else:
                th, tw = height, width
            img, orig = loader(path, th, tw)
            name = names[path]
            origs[name] = (orig, path)
            yield name, img

    if args.artifact:
        # the artifact metadata records its input signature: raw uint8
        # (normalize baked in) or host-normalized fp32
        raw = artifact_fwd.meta.get("input") == "uint8"
        results = _run_artifact(
            artifact_fwd, items(raw_uint8=raw), relay_retries=args.relay_retries
        )
    else:
        from fal_net_tpu.eval.pipeline import DisparityPipeline
        from fal_net_tpu.models import create_model
        from fal_net_tpu.train.checkpoint import load_params_any

        variables, name, levels = load_params_any(args.pretrained)
        model = create_model(args.model or name or "B", args.no_levels or levels)
        pipe = DisparityPipeline(
            model,
            variables,
            batch_size=args.batch_size,
            min_disp=args.min_disp,
            max_disp=args.max_disp,
            ms_post_process=args.ms_post_process,
            # opt-in: quantization happens BEFORE the width-ratio rescale
            # below and caps at 255.996 px, so it is only safe when images
            # run at native size with sub-256 disparities (see --help)
            quantize_uint16=args.quantize_transfer,
            # raw uint8 upload + on-device /255 - mean: 4x fewer H2D
            # bytes, same normalization math (fp32, 1-ulp of the host path)
            device_normalize=True,
            relay_retries=args.relay_retries,
        )
        results = pipe.run(items(raw_uint8=True))

    n = 0
    for name, disp in results:
        orig_hw, src_path = origs[name]
        disp = restore_disparity(disp, orig_hw)
        save_disp16(os.path.join(args.out_dir, f"{name}_disp.png"), disp)
        if args.colormap:
            from fal_net_tpu.eval.export import save_disparity_png

            save_disparity_png(os.path.join(args.out_dir, f"{name}_cmap.png"), disp)
        if args.save_pc:
            from PIL import Image

            from fal_net_tpu.eval.export import (
                disparity_to_point_cloud,
                save_point_cloud_ply,
            )
            from fal_net_tpu.eval.metrics import WIDTH_TO_BASELINE, WIDTH_TO_FOCAL

            rgb = np.asarray(Image.open(src_path).convert("RGB"), np.float64)
            w = disp.shape[1]
            # KITTI camera tables when the width matches; otherwise the
            # usual KITTI-like defaults (f ~= 0.58 * W, 54 cm baseline)
            pc = disparity_to_point_cloud(
                rgb,
                disp,
                focal=WIDTH_TO_FOCAL.get(w, 0.58 * w),
                baseline=WIDTH_TO_BASELINE.get(w, 0.54),
            )
            save_point_cloud_ply(os.path.join(args.out_dir, f"{name}.ply"), pc)
        n += 1
    print(f"=> wrote disparities for {n} images to {args.out_dir}")


if __name__ == "__main__":
    main()
