"""AOT model export for serving: a single-file compiled artifact.

The reference ships inference as a Python script that rebuilds the torch
model and loads a checkpoint (Test_KITTI.py:78-131).  TPU-native serving
wants the opposite: trace + lower ONCE, serialize the StableHLO (weights
baked in as constants), and run it anywhere — a serving host without the
model code, flax, or the checkpoint format, on TPU or CPU.

Built on ``jax.export``:

    blob = export_forward(model, variables, batch=1, height=384, width=1280)
    save_exported("falnetB.jaxexp", blob)
    # ... on the serving host:
    fwd = load_exported("falnetB.jaxexp")
    disp = fwd(left_nhwc)          # (B, H, W, 1) fp32 disparity

The artifact is shape-static (one batch/resolution per export — KITTI eval
uses a handful of widths, export one per bucket) which is exactly the
per-shape jit-cache policy of eval/evaluate.py, made ahead-of-time.
"""

from __future__ import annotations

import json
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

MAGIC = b"FALNETTPU_EXPORT1\n"
MAGIC_BUNDLE = b"FALNETTPU_BUNDLE1\n"


def export_forward(
    model,
    variables,
    *,
    batch: int = 1,
    height: int = 384,
    width: int = 1280,
    min_disp: float = 2.0,
    max_disp: float = 300.0,
    ret_pan: bool = False,
    ret_subocc: bool = False,
    platforms: Sequence[str] = ("tpu", "cpu"),
    uint8_input: bool = False,
) -> bytes:
    """Serialize the jitted forward at a fixed shape, weights baked in.

    The MED head runs the portable jnp path (``med_impl='reference'``) so
    the artifact contains no backend-specific custom calls and loads on
    every listed platform; disp-only inference never used the fused Pallas
    head anyway (models/falnet.py).

    ``uint8_input``: the artifact takes raw uint8 HWC RGB and applies the
    /255 − mean normalization on device — 4x smaller uploads on the
    serving host link, and serving inputs are uint8 anyway.  Recorded in
    the metadata as ``input: "uint8"``.
    """
    portable = type(model)(
        spec=model.spec,
        num_levels=model.num_levels,
        dtype=model.dtype,
        med_impl="reference",
        s2d_stem=model.s2d_stem,
        s2d_tail=model.s2d_tail,
        phase_deconv=model.phase_deconv,
        a_maskr_quirk=model.a_maskr_quirk,
    )

    def fwd(left):
        if uint8_input:
            from fal_net_tpu.data.transforms import normalize_device

            left = normalize_device(left)
        out = portable.apply(
            variables,
            left,
            min_disp,
            max_disp,
            ret_disp=True,
            ret_pan=ret_pan,
            ret_subocc=ret_subocc,
        )
        res = [out.disp]
        if ret_pan:
            res.append(out.pan)
        if ret_subocc:
            res.extend([out.maskL, out.maskR])
        return tuple(res)

    in_dtype = jnp.uint8 if uint8_input else jnp.float32
    spec = jax.ShapeDtypeStruct((batch, height, width, 3), in_dtype)
    exported = jax_export.export(jax.jit(fwd), platforms=tuple(platforms))(spec)
    meta = {
        "batch": batch,
        "height": height,
        "width": width,
        "min_disp": min_disp,
        "max_disp": max_disp,
        "outputs": ["disp"]
        + (["pan"] if ret_pan else [])
        + (["maskL", "maskR"] if ret_subocc else []),
        "platforms": list(platforms),
        "variant": model.spec.name,
        "num_levels": model.num_levels,
        "input": "uint8" if uint8_input else "float32_normalized",
        # compute dtype of the baked-in forward (disp output is always
        # fp32: the logits conv emits fp32 from the MXU accumulator and
        # the MED head runs fp32 — models/falnet.py)
        "dtype": jnp.dtype(model.dtype).name,
        # parameter count of the baked weights (reference prints it at
        # eval time, Test_KITTI.py:277 — kept so artifact-based evaluation
        # can report it without the checkpoint)
        "n_params": sum(int(x.size) for x in jax.tree.leaves(variables)),
    }
    meta_blob = json.dumps(meta).encode()
    return (
        MAGIC
        + len(meta_blob).to_bytes(8, "little")
        + meta_blob
        + exported.serialize()
    )


def export_bundle(
    model,
    variables,
    shapes: Sequence[Tuple[int, int]],
    *,
    batch: int = 1,
    **kw,
) -> bytes:
    """Export one artifact per (height, width) into a single bundle file.

    KITTI raw mixes a handful of widths (myUtils.py:177-183); a bundle
    covers every bucket so a serving host dispatches by input shape with
    one file.  ``kw`` is forwarded to :func:`export_forward` (min/max
    disp, outputs, platforms, uint8_input).
    """
    blobs = [
        export_forward(model, variables, batch=batch, height=h, width=w, **kw)
        for h, w in shapes
    ]
    meta = {
        "shapes": [list(s) for s in shapes],
        "batch": batch,
        "count": len(blobs),
    }
    meta_blob = json.dumps(meta).encode()
    out = [MAGIC_BUNDLE, len(meta_blob).to_bytes(8, "little"), meta_blob]
    for b in blobs:
        out.append(len(b).to_bytes(8, "little"))
        out.append(b)
    return b"".join(out)


def save_exported(path: str, blob: bytes) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)


def _load_single(blob: bytes, origin: str):
    if not blob.startswith(MAGIC):
        raise ValueError(f"{origin}: not a falnet-tpu export artifact")
    off = len(MAGIC)
    meta_len = int.from_bytes(blob[off : off + 8], "little")
    off += 8
    meta = json.loads(blob[off : off + meta_len].decode())
    exported = jax_export.deserialize(blob[off + meta_len :])

    def fwd(left):
        return exported.call(left)

    fwd.meta = meta  # type: ignore[attr-defined]
    return fwd


def load_exported(path: str):
    """Load a serving artifact; returns ``fwd(left) -> tuple(outputs)``
    with ``fwd.meta`` describing shapes and output names.

    Bundles (``export_bundle``) load to a dispatcher: ``fwd(left)`` picks
    the export matching ``left.shape[1:3]`` (ValueError on a shape not in
    the bundle); ``fwd.meta['shapes']`` lists the buckets and the other
    meta fields come from the first export.
    """
    with open(path, "rb") as f:
        blob = f.read()
    if not blob.startswith(MAGIC_BUNDLE):
        return _load_single(blob, path)

    off = len(MAGIC_BUNDLE)
    meta_len = int.from_bytes(blob[off : off + 8], "little")
    off += 8
    bmeta = json.loads(blob[off : off + meta_len].decode())
    off += meta_len
    by_shape = {}
    for _ in range(bmeta["count"]):
        blen = int.from_bytes(blob[off : off + 8], "little")
        off += 8
        f = _load_single(blob[off : off + blen], path)
        by_shape[(f.meta["height"], f.meta["width"])] = f
        off += blen

    def fwd(left):
        hw = tuple(left.shape[1:3])
        if hw not in by_shape:
            raise ValueError(
                f"input shape {hw} not in bundle; have {sorted(by_shape)}"
            )
        return by_shape[hw](left)

    first = by_shape[tuple(bmeta["shapes"][0])]
    fwd.meta = {**first.meta, **bmeta}  # type: ignore[attr-defined]
    fwd.by_shape = by_shape  # type: ignore[attr-defined]
    return fwd
