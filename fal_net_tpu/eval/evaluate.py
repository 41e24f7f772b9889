"""Inference + evaluation driver (reference Test_KITTI.py).

Runs a FAL-net over an evaluation dataset: forward disp (optionally pan and
sub-occlusion masks for artifact export), flip or multi-scale
post-processing, per-protocol depth metrics, and artifact export.

TPU-first design vs the reference:
  * The reference forces batch 1 because "kitty mixes image sizes!"
    (Test_KITTI.py:113).  KITTI raw only mixes a handful of widths
    (myUtils.py:177-183), so samples are grouped into per-shape buckets
    and each bucket runs at ``batch_size`` through one jitted forward —
    XLA compiles once per shape (the cuDNN-autotune analog), the ragged
    tail is padded with zero batch slots whose outputs are discarded, and
    every metric is computed per image on the host exactly as at batch 1
    (ms-pp's percentile blend is already per-image —
    eval/postprocess.py:54 — so batched results are bitwise identical to
    the batch-1 loop).
  * One batch of device->host latency is overlapped: the next bucket's
    forward is dispatched (async under jax) before the previous batch's
    disparities are fetched, so device compute and host work (PNG/PLY
    export, depth metrics) run concurrently.  On this container's TPU
    relay (~30 ms/call round-trip) batching alone removes a per-image
    sync the reference's loop pays on every frame.
  * The reference's --save_pan path crashes on the shipped FAL_netB (it
    unpacks 5 outputs incl. a never-returned right disparity,
    Test_KITTI.py:190 — SURVEY §2.1 item 11); here pan/mask export works,
    incl. the normalized-input feature dump (Test_KITTI.py:194's
    ``local_normalization(input_left)`` — the reachable part of its feats
    list).
"""

from __future__ import annotations

import collections
import concurrent.futures
import dataclasses
import functools
import os
import time
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fal_net_tpu.eval.export import (
    disparity_to_point_cloud,
    save_disparity_png,
    save_feature_pngs,
    save_image_png,
    save_point_cloud_ply,
)
from fal_net_tpu.eval.metrics import (
    KITTI_ERROR_NAMES,
    compute_kitti_errors,
    compute_make_errors,
    disps_to_depths_kitti,
    disps_to_depths_kitti2015,
    disps_to_depths_make,
)
from fal_net_tpu.eval.postprocess import flip_post_process, ms_post_process
from fal_net_tpu.losses.epe import real_epe, real_epe_np
from fal_net_tpu.utils.meters import AverageMeter, MultiAverageMeter
from fal_net_tpu.utils.viz import local_normalization


@dataclasses.dataclass
class EvalConfig:
    dataset: str = "Kitti_eigen_test_improved"
    max_disp: float = 300.0
    min_disp: float = 2.0
    rel_baseline: float = 1.0  # scales max_disp (Test_KITTI.py:161)
    batch_size: int = 8  # images per forward within a shape bucket;
    #                      1 reproduces the reference's loop exactly
    #                      (identical math either way)
    f_post_process: bool = False
    ms_post_process: bool = True
    use_median: bool = False
    save: bool = False
    save_pan: bool = False
    save_input: bool = False
    save_point_cloud: bool = False
    save_path: str = "eval_out"
    print_freq: int = 10
    crop_top_95: bool = False  # 'Owndata' mode: keep top 95% of rows
    #                            (Test_KITTI.py:169-172)
    quantize_transfer: bool = False  # opt-in: fetch disparities as
    #   on-device-quantized round(disp*256) uint16 — halves device->host
    #   bytes on slow links.  1/256 px resolution (the SAME fixed point as
    #   KITTI's GT disparity PNGs), capped at 255.996 px; metrics shift at
    #   the ~1e-5 level, so it is NOT bit-identical to the fp32 fetch.
    decode_workers: int = 4  # background threads prefetch-decoding
    #   dataset.get(i) ahead of the device (window = 2 batches, results
    #   consumed strictly in order so metrics/exports are identical to the
    #   serial loop).  0 = decode inline on the main thread.
    med_selfcheck: bool = True  # gate the fused MED kernel against the
    #   jnp oracle once per bucket shape before the first pan/masks
    #   dispatch (only the save_pan path requests pan/masks; plain
    #   disparity eval never selects the fused kernel).  Mosaic compiles a
    #   fresh binary per shape and an untested combination can miscompile
    #   silently (ops/med_selfcheck.py); on disagreement the Evaluator
    #   falls back to the jnp MED path with a warning.
    relay_retries: int = 2  # transient-dispatch fault tolerance: when the
    #   async forward surfaces a retryable runtime error at fetch time
    #   (utils/faults.py), re-dispatch the batch from its still-resident
    #   device input up to this many times.  Nothing is donated on the
    #   eval path, so the retry is always safe.  0 disables.


class Evaluator:
    def __init__(self, model, variables, cfg: EvalConfig, mesh=None):
        """``mesh``: shard each evaluation batch over the mesh's 'data'
        axis (params replicated, XLA partitions the forward) — multi-chip
        batched evaluation.  batch_size must be divisible by the axis
        size.  Pass the same mesh as ``med_mesh`` to ``create_model`` when
        artifact export (pan/masks, the fused MED head) is wanted."""
        self.model = model
        self.cfg = cfg
        self._batch_sharding = None
        self._artifact = None
        if mesh is not None:
            from fal_net_tpu.parallel.mesh import batch_sharding, replicate_sharding

            ndata = mesh.shape.get("data", 1)
            if cfg.batch_size % ndata != 0:
                raise ValueError(
                    f"batch_size {cfg.batch_size} is not divisible by the "
                    f"mesh 'data' axis size {ndata} (mesh {dict(mesh.shape)})"
                )
            variables = jax.device_put(variables, replicate_sharding(mesh))
            self._batch_sharding = batch_sharding(mesh)
        self.variables = variables
        if cfg.quantize_transfer and cfg.max_disp * cfg.rel_baseline > 65535 / 256.0:
            import warnings

            warnings.warn(
                f"quantize_transfer caps fetched disparities at 65535/256 = "
                f"{65535 / 256.0:.3f} px but max_disp*rel_baseline = "
                f"{cfg.max_disp * cfg.rel_baseline} allows larger values; "
                "close-range disparities will clip.",
                stacklevel=2,
            )

    @classmethod
    def from_artifact(cls, fwd, cfg: EvalConfig) -> "Evaluator":
        """Evaluate a compiled serving artifact (``serve.load_exported``)
        instead of a live model — the full protocol (bucketed batches,
        post-processing, metrics, exports) against EXACTLY the deployed
        forward, with no model code or checkpoint on the eval host.

        Requirements:
          * ``cfg.batch_size`` is forced to the artifact's baked batch.
          * ``ms_post_process`` needs the 2/3-scale shape of every image
            shape in the bundle too (``cli.export --sizes ... --with_ms_pp``
            adds them automatically); a missing shape raises with the
            available buckets listed.
          * dataset dtype must match the artifact input signature: raw
            uint8 datasets for ``--uint8_input`` artifacts, float
            otherwise (the artifact's own normalization stage decides —
            the evaluator does not re-normalize here).
          * pan/mask artifact export (``cfg.save_pan``) needs an artifact
            exported with pan+subocc outputs.
        """
        self = cls.__new__(cls)
        self.model = None
        self.variables = None
        self.cfg = cfg
        self._batch_sharding = None
        self._artifact = fwd
        cfg.batch_size = int(fwd.meta["batch"])
        if fwd.meta.get("input") == "uint8" and (
            cfg.ms_post_process or cfg.f_post_process
        ):
            # post-processing resizes/flips the input for a second forward;
            # that math needs float images, which a uint8-input artifact
            # hides behind its baked normalization
            raise ValueError(
                "post-processed artifact evaluation needs a float32-input "
                "artifact (re-export without --uint8_input), or disable "
                "post-processing"
            )
        if cfg.save and cfg.save_pan and not {"pan", "maskL", "maskR"} <= set(
            fwd.meta["outputs"]
        ):
            # _process_image exports pan AND both masks; a pan-only artifact
            # would pass a 'pan' check and then crash on maskL=None mid-run
            raise ValueError(
                f"save_pan needs an artifact exported with --pan --subocc; "
                f"this one emits {fwd.meta['outputs']}"
            )
        return self

    def _artifact_forward(self, left, pan: bool, subocc: bool) -> "MedOutputs":
        from fal_net_tpu.ops.med import MedOutputs

        outs = self._artifact(left)
        d = dict(zip(self._artifact.meta["outputs"], outs))
        if pan and "pan" not in d:
            raise ValueError(
                f"artifact emits {sorted(d)} but pan/masks were requested"
            )
        return MedOutputs(
            pan=d.get("pan"), disp=d["disp"],
            maskL=d.get("maskL"), maskR=d.get("maskR"),
        )

    @staticmethod
    def _prep(left):
        """Raw-uint8 batches (dataset ``raw_uint8=True``) normalize on
        device — 4x fewer host->device bytes, equal to the host
        normalization to 1 ulp (data/transforms.py::normalize_device).
        Float inputs pass through; jit re-traces per dtype."""
        if left.dtype == jnp.uint8:
            from fal_net_tpu.data.transforms import normalize_device

            return normalize_device(left)
        return left

    def _med_guard(self, height: int, width: int) -> None:
        """Gate the fused MED kernel at this bucket's shape before its
        first pan/masks dispatch.  Plain disparity eval never selects the
        fused kernel (models/falnet.py: fused only when pan/masks are
        requested) and artifacts bake the portable jnp path at export
        (serve.py), so only the live-model ``save_pan`` path is exposed —
        and each new image shape compiles a fresh Mosaic binary, the
        silent-miscompile class the training gate exists for
        (ops/med_selfcheck.py).  One oracle comparison per new shape; on
        disagreement the Evaluator flips to the jnp MED path for all
        subsequent traces and warns (already-validated shapes keep their
        compiled executables)."""
        if not getattr(self.cfg, "med_selfcheck", True):
            return
        if self.model is None or self.model.med_impl != "auto":
            return
        if getattr(self.model, "a_maskr_quirk", False):
            return  # the quirk path never selects the fused kernel
        cache = self.__dict__.setdefault("_med_ok", {})
        key = (int(height), int(width))
        if key in cache:
            return
        from fal_net_tpu.ops.med_selfcheck import fused_med_selfcheck

        cfg = self.cfg
        ok, worst = fused_med_selfcheck(
            width,
            self.model.num_levels,
            cfg.min_disp * cfg.rel_baseline,
            cfg.max_disp * cfg.rel_baseline,
            height=height,
            interpret=getattr(self.model, "med_interpret", False),
        )
        cache[key] = ok
        if not ok:
            import warnings

            warnings.warn(
                "fused MED kernel disagrees with the jnp oracle at the "
                f"eval shape {height}x{width} (maxdiff {worst:.3g}); "
                "evaluating through the jnp MED path instead (correct, "
                "slower) — see ops/med_selfcheck.py.",
                RuntimeWarning,
            )
            self.model = self.model.clone(med_impl="reference")

    def _forward(self, variables, left, *, pan: bool, subocc: bool):
        if self._artifact is not None:
            return self._artifact_forward(left, pan, subocc)
        return self.model.apply(
            variables,
            left,
            self.cfg.min_disp * self.cfg.rel_baseline,
            self.cfg.max_disp * self.cfg.rel_baseline,
            ret_disp=True,
            ret_pan=pan,
            ret_subocc=subocc,
        )

    @functools.cached_property
    def _jit_eval_step(self):
        """ONE jitted call per batch: normalize (if raw uint8), forward,
        post-process, optional uint16 quantization.  A single dispatch
        matters on slow host links (each call through this container's TPU
        relay costs ~30 ms of round-trip before any bytes move)."""

        def step(variables, left, *, pan: bool, subocc: bool):
            if self._artifact is None:
                left = self._prep(left)
            # else: the artifact's own input stage decides (uint8-input
            # artifacts normalize internally; fp32 artifacts take
            # host-normalized floats)
            out = self._forward(variables, left, pan=pan, subocc=subocc)
            disp_fn = lambda im: self._forward(
                variables, im, pan=False, subocc=False
            ).disp
            disp = out.disp
            if self.cfg.f_post_process:
                disp = flip_post_process(left, disp_fn, disp)
            elif self.cfg.ms_post_process:
                disp = ms_post_process(left, disp_fn, disp)
            if self.cfg.quantize_transfer:
                disp = jnp.round(disp * 256.0).clip(0, 65535).astype(jnp.uint16)
            return out, disp

        return jax.jit(step, static_argnames=("pan", "subocc"))

    # ------------------------------------------------------------------
    def _stage(self, items: List[Tuple[int, Dict[str, Any], np.ndarray]]):
        """Start the host->device upload of one bucket batch (padded to
        batch_size) on the staging thread, so it overlaps the previous
        batch's device->host fetch and per-image host work.  Returns
        (items, future-of-device-array, stage timestamp)."""
        lefts = [left for _, _, left in items]
        pad = self.cfg.batch_size - len(lefts) if len(lefts) < self.cfg.batch_size else 0
        batch_np = np.stack(lefts + [np.zeros_like(lefts[0])] * pad)
        start = time.time()
        fut = self._uploader.submit(
            jax.device_put, batch_np, self._batch_sharding
        )
        return items, fut, batch_np, start

    @functools.cached_property
    def _uploader(self):
        # one thread: uploads stay ordered and the link is serial anyway
        return concurrent.futures.ThreadPoolExecutor(max_workers=1)

    def _dispatch(self, staged):
        """Launch the forward for a staged (uploaded) batch asynchronously.

        Returns (items, device outputs, stage timestamp); nothing blocks
        until the matching ``_collect``.
        """
        from fal_net_tpu.utils.faults import fetch_with_redispatch, retry_transient

        items, fut, batch_np, start = staged
        cfg = self.cfg
        want_artifacts = cfg.save and cfg.save_pan
        retries = max(0, int(getattr(cfg, "relay_retries", 0)))

        # staged upload: a transient failure poisons the future forever,
        # so the retry must re-issue device_put itself (batch_np is kept
        # host-side exactly for this)
        fresh = {}
        left_dev = fetch_with_redispatch(
            lambda: fresh["left"] if fresh else fut.result(),
            lambda: fresh.__setitem__(
                "left", jax.device_put(batch_np, self._batch_sharding)
            ),
            retries=retries,
            describe="eval upload",
        )
        if want_artifacts:
            self._med_guard(batch_np.shape[1], batch_np.shape[2])
        out, disp = retry_transient(
            self._jit_eval_step,
            self.variables,
            left_dev,
            pan=want_artifacts,
            subocc=want_artifacts,
            retries=retries,
            describe="eval dispatch",
        )
        return items, out, disp, left_dev, start

    def _collect(self, pending, meters, out_dirs) -> None:
        """Fetch a dispatched batch to host and run per-image export/metrics."""
        from fal_net_tpu.utils.faults import fetch_with_redispatch

        cfg = self.cfg
        items, out, disp, left_dev, start = pending
        want_artifacts = cfg.save and cfg.save_pan
        dev = {"out": out, "disp": disp}

        def fetch():
            # np.asarray forces the device->host transfer; on the axon
            # backend block_until_ready alone does not actually block.
            out, disp = dev["out"], dev["disp"]
            return (
                np.asarray(disp)[..., 0],
                np.asarray(out.pan) if want_artifacts and out.pan is not None else None,
                np.asarray(out.maskL) if want_artifacts and out.maskL is not None else None,
                np.asarray(out.maskR) if want_artifacts and out.maskR is not None else None,
            )

        def redispatch():
            # the async forward failed in flight: re-run from the
            # still-resident device input (nothing is donated here)
            dev["out"], dev["disp"] = self._jit_eval_step(
                self.variables, left_dev, pan=want_artifacts, subocc=want_artifacts
            )

        disp_np, pan_np, maskl_np, maskr_np = fetch_with_redispatch(
            fetch, redispatch,
            retries=max(0, int(getattr(cfg, "relay_retries", 0))),
            describe="eval batch",
        )
        if disp_np.dtype == np.uint16:  # quantize_transfer fixed-point
            disp_np = disp_np.astype(np.float32) / 256.0
        meters["batch_time"].update(
            (time.time() - start) / len(items), n=len(items)
        )
        for slot, (i, sample, left_np) in enumerate(items):
            extras = {
                "pan": pan_np[slot] if pan_np is not None else None,
                "maskL": maskl_np[slot] if maskl_np is not None else None,
                "maskR": maskr_np[slot] if maskr_np is not None else None,
            }
            self._process_image(i, sample, left_np, disp_np[slot], extras,
                                meters, out_dirs)

    def _process_image(self, i, sample, left_np, disp_np, extras, meters,
                       out_dirs) -> None:
        """Per-image artifact export + metric update — identical to the
        batch-1 path (all metrics are per-image in the reference too:
        Test_KITTI.py:255-270 with batch forced to 1)."""
        cfg = self.cfg
        if cfg.save:
            if left_np.dtype == np.uint8:  # raw-upload mode: exports want
                from fal_net_tpu.data.transforms import normalize  # normalized floats

                left_np = normalize(left_np)
            save_disparity_png(
                os.path.join(out_dirs["disp"], f"{i:010d}.png"), disp_np
            )
            if cfg.save_input:
                save_image_png(
                    os.path.join(out_dirs["input"], f"{i:010d}.png"), left_np
                )
            if cfg.save_pan and extras["pan"] is not None:
                save_image_png(
                    os.path.join(out_dirs["pan"], f"{i:010d}.png"), extras["pan"]
                )
                # feats = [local_normalization(input), maskL, maskR]: the
                # reachable entries of Test_KITTI.py:193-194's list (its
                # dispr/100 entry can never be produced by the shipped
                # FAL_netB).
                save_feature_pngs(
                    out_dirs["feats"], f"{i:010d}_norm_input",
                    local_normalization(left_np),
                )
                save_feature_pngs(
                    out_dirs["feats"], f"{i:010d}_maskL", extras["maskL"]
                )
                save_feature_pngs(
                    out_dirs["feats"], f"{i:010d}_maskR", extras["maskR"]
                )
            if cfg.save_point_cloud:
                img255 = (left_np + np.asarray([0.411, 0.432, 0.45])) * 255
                pc = disparity_to_point_cloud(img255, disp_np)
                save_point_cloud_ply(
                    os.path.join(out_dirs["pc"], f"{i:010d}.ply"), pc
                )

        if meters["evaluate"] and "targets" in sample:
            target = np.asarray(sample["targets"][0])[..., 0]
            if cfg.dataset in (
                "Kitti_eigen_test_improved",
                "Kitti_eigen_test_original",
            ):
                gt_d, pred_d = disps_to_depths_kitti(
                    target[None], disp_np[None]
                )
                meters["kitti"].update(
                    compute_kitti_errors(
                        gt_d[0],
                        pred_d[0],
                        use_median=cfg.use_median,
                        scale_out=meters["scale"],
                    )
                )
            elif cfg.dataset == "Kitti2015":
                if disp_np.shape == target.shape:
                    epe = real_epe_np(disp_np, target)
                else:  # size mismatch -> real_epe's bilinear upsample matters
                    epe = float(
                        real_epe(
                            jnp.asarray(disp_np)[None, ..., None],
                            jnp.asarray(target)[None, ..., None],
                            sparse=True,
                        )
                    )
                meters["epe"].update(epe)
                gt_d, pred_d = disps_to_depths_kitti2015(
                    target[None], disp_np[None]
                )
                meters["kitti"].update(
                    compute_kitti_errors(
                        gt_d[0],
                        pred_d[0],
                        use_median=cfg.use_median,
                        scale_out=meters["scale"],
                    )
                )
            elif cfg.dataset == "Make3D":
                gt_d, pred_d = disps_to_depths_make(target[None], disp_np[None])
                meters["make"].update(compute_make_errors(gt_d[0], pred_d[0]))

    # ------------------------------------------------------------------
    def _iter_decoded(self, dataset, n: int):
        """Yield ``(i, dataset.get(i))`` strictly in order, with decode
        running ``decode_workers`` samples ahead on background threads.

        The reference decodes inside torch DataLoader workers
        (Test_KITTI.py:113, num_workers from args); here decode (PIL or the
        native C++ core) overlaps device compute + the per-image collect
        work instead.  In-order consumption keeps every downstream effect
        (bucket fill order, metric accumulation, artifact filenames)
        byte-identical to the serial loop."""
        workers = self.cfg.decode_workers
        if workers <= 0 or n <= 1:
            for i in range(n):
                yield i, dataset.get(i)
            return
        window = max(workers, 2 * self.cfg.batch_size)
        with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as ex:
            futs = collections.deque(
                (i, ex.submit(dataset.get, i)) for i in range(min(window, n))
            )
            next_i = len(futs)
            while futs:
                i, fut = futs.popleft()
                if next_i < n:
                    futs.append((next_i, ex.submit(dataset.get, next_i)))
                    next_i += 1
                yield i, fut.result()

    def run(self, dataset, evaluate: bool = True) -> Dict[str, float]:
        cfg = self.cfg
        meters = {
            "epe": AverageMeter(),
            "batch_time": AverageMeter(),
            "kitti": MultiAverageMeter(KITTI_ERROR_NAMES),
            "make": MultiAverageMeter(KITTI_ERROR_NAMES),
            # per-image median-scaling factors under use_median — the
            # reference keeps a running average in module globals and
            # prints it each image (myUtils.py:193-207); we surface the
            # mean in errors.txt / metrics.json instead.
            "scale": [],
            "evaluate": evaluate,
        }

        out_dirs = {}
        if cfg.save:
            for sub in ("disp", "pan", "input", "pc", "feats"):
                d = os.path.join(cfg.save_path, sub)
                os.makedirs(d, exist_ok=True)
                out_dirs[sub] = d

        n = len(dataset)
        done = 0
        last_print = [-cfg.print_freq]  # first collect prints
        # Per-shape buckets filled in dataset order; a bucket dispatches the
        # moment it holds batch_size samples, so at most
        # (num_shapes * batch_size) samples are ever resident on host.
        buckets: Dict[Tuple[int, ...], List[Tuple[int, Dict[str, Any], np.ndarray]]] = {}
        pending = None

        def submit(items):
            nonlocal pending, done
            staged = self._stage(items)  # upload streams in the background
            if pending is not None:
                # fetch + per-image host work overlap the upload above
                self._collect(pending, meters, out_dirs)
                done += len(pending[0])
                if done - last_print[0] >= cfg.print_freq:
                    last_print[0] = done
                    a1 = meters["kitti"].avg[4] if meters["kitti"].count else 0.0
                    print(
                        f"Test: [{done}/{n}] Time {meters['batch_time']} a1 {a1:.4f}"
                    )
            pending = self._dispatch(staged)

        for i, sample in self._iter_decoded(dataset, n):
            left_np = np.asarray(sample["left"])  # float32, or raw uint8
            if cfg.crop_top_95:
                left_np = left_np[: int(0.95 * left_np.shape[0])]
            buckets.setdefault(left_np.shape, []).append((i, sample, left_np))
            items = buckets[left_np.shape]
            if len(items) == cfg.batch_size:
                buckets[left_np.shape] = []
                submit(items)
        for items in buckets.values():  # ragged per-shape tails
            if items:
                submit(items)
        if pending is not None:
            self._collect(pending, meters, out_dirs)
            done += len(pending[0])

        metrics: Dict[str, float] = {
            "epe": meters["epe"].avg,
            "sec_per_image": meters["batch_time"].avg,
        }
        source = meters["make"] if cfg.dataset == "Make3D" else meters["kitti"]
        metrics.update({k: v for k, v in zip(KITTI_ERROR_NAMES, source.avg)})
        if cfg.use_median and meters["scale"]:
            metrics["median_scale_mean"] = float(np.mean(meters["scale"]))

        # errors.txt is always written, like the reference (Test_KITTI.py:276-280
        # writes it unconditionally, independent of --save).
        from fal_net_tpu.utils.meters import count_params

        if self._artifact is not None:
            n_params = int(self._artifact.meta.get("n_params", 0))
        else:
            n_params = count_params(self.variables)
        os.makedirs(cfg.save_path, exist_ok=True)
        with open(os.path.join(cfg.save_path, "errors.txt"), "w") as f:
            f.write(f"Number of parameters {n_params}\n")
            f.write(f"EPE {meters['epe'].avg}\n")
            if "median_scale_mean" in metrics:
                f.write(
                    f"Median scaling mean factor {metrics['median_scale_mean']}\n"
                )
            f.write("Kitti metrics:\n")
            f.write(repr(source) + "\n")
        # machine-readable sibling of errors.txt (same stream format as the
        # trainer's MetricsLogger JSONL)
        import json

        with open(os.path.join(cfg.save_path, "metrics.json"), "w") as f:
            json.dump(
                {"n_params": n_params, "n_images": n, **metrics}, f, indent=1
            )
        print(repr(source))
        return metrics
