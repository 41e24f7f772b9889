"""The training driver: one trainer, three stage strategies.

Replaces the reference's three ~400-line scripts (Train_Stage1_K.py,
Train_Stage1_Kslow.py, Train_Stage2_K.py) with one loop around the pure
stage-loss functions.  The whole optimization step (forward, both losses,
backward, Adam update) is ONE jitted function with donated state; batches
arrive pre-sharded over the mesh's data axis and XLA inserts the gradient
all-reduce.

Validation mirrors Train_Stage1_K.py:279-347 (KITTI 2015): view-synthesis
RMSE (checkpoint-selection metric), sparse realEPE, and the 7 KITTI depth
metrics.  Best checkpoint = lowest pan RMSE, preserving the reference's
selection semantics.
"""

from __future__ import annotations

import functools
import os
import time
import warnings
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fal_net_tpu.data import (
    DataLoader,
    default_train_transform,
    prefetch_to_device,
)
from fal_net_tpu.data.datasets import REGISTRY as DATASETS
from fal_net_tpu.eval.metrics import (
    KITTI_ERROR_NAMES,
    compute_kitti_errors,
    disps_to_depths_kitti2015,
    image_rmse_np,
)
from fal_net_tpu.losses.epe import real_epe, real_epe_np
from fal_net_tpu.losses.vgg import init_vgg19, load_torch_vgg19
from fal_net_tpu.models import create_model
from fal_net_tpu.parallel.mesh import batch_sharding, replicate_sharding
from fal_net_tpu.train.checkpoint import load_checkpoint, load_params_any, save_checkpoint
from fal_net_tpu.train.config import Stage2Config, TrainConfig
from fal_net_tpu.train.stages import stage1_loss, stage1_slow_loss, stage2_loss
from fal_net_tpu.train.state import TrainState, create_train_state
from fal_net_tpu.utils.faults import is_transient, retry_transient, tree_alive
from fal_net_tpu.utils.logging import MetricsLogger, dump_settings
from fal_net_tpu.utils.meters import AverageMeter, MultiAverageMeter


class Trainer:
    def __init__(
        self,
        cfg: TrainConfig,
        stage: str = "stage1",
        mesh: Optional[jax.sharding.Mesh] = None,
        train_dataset=None,
        val_dataset=None,
    ):
        assert stage in ("stage1", "stage1_slow", "stage2")
        self.cfg = cfg
        self.stage = stage
        if mesh is None:
            from fal_net_tpu.parallel.mesh import make_mesh_for_batch

            mesh = make_mesh_for_batch(cfg.batch_size)
        self.mesh = mesh
        self.dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        # Meshes over 'data' (batch) and/or 'spatial' (image rows) keep the
        # fused Pallas MED head via shard_map (pallas_call has no SPMD
        # rule); both splits are exact for the row-local MED math.  Any
        # other sharded axis falls back to the jnp MED path, which XLA
        # shards like any other op.
        known = {"data", "spatial"}
        sharded_axes = {a for a, n in mesh.shape.items() if n > 1}
        self.med_mesh = mesh if sharded_axes and sharded_axes <= known else None
        self.med_spatial_axis = (
            "spatial" if self.med_mesh is not None and "spatial" in sharded_axes
            else None
        )
        self.model = create_model(
            cfg.model,
            cfg.num_levels,
            dtype=self.dtype,
            med_mesh=self.med_mesh,
            med_spatial_axis=self.med_spatial_axis,
        )
        self._external_train = train_dataset
        self._external_val = val_dataset
        self.logger: Optional[MetricsLogger] = None
        self._setup_done = False
        # Per-validation-shape fused-MED gate results (see _val_forward_for:
        # validation frames compile fresh Mosaic binaries at shapes the
        # setup-time gate never saw).
        self._val_med_ok: Dict[tuple, bool] = {}

    # ------------------------------------------------------------------
    def setup(self) -> None:
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed)
        sample = jnp.zeros((1, cfg.crop_size[0], cfg.crop_size[1], 3), jnp.float32)
        variables = self.model.init(
            rng, sample, cfg.min_disp, cfg.max_disp, ret_disp=True
        )
        if cfg.pretrained:
            loaded, name, levels = load_params_any(cfg.pretrained)
            variables = loaded
        self.variables = variables

        # Perceptual net (frozen).
        if cfg.a_p > 0:
            if cfg.vgg_weights:
                self.vgg_model, self.vgg_params = load_torch_vgg19(cfg.vgg_weights)
            elif cfg.allow_random_vgg:
                self.vgg_model, self.vgg_params = init_vgg19(seed=cfg.seed)
            else:
                # The reference always trains a_p>0 against pretrained
                # ImageNet VGG features (loss_functions.py:10,48); training
                # against random features silently changes behavior in a way
                # the loss curve won't show, so it must be opted into.
                raise ValueError(
                    f"a_p={cfg.a_p} > 0 enables the perceptual loss but no "
                    "--vgg_weights were given.  Either supply a torchvision "
                    "vgg19 state_dict (--vgg_weights path.pth), disable the "
                    "term (--a_p 0), or explicitly opt into random-init VGG "
                    "features with --allow_random_vgg."
                )
        else:
            self.vgg_model, self.vgg_params = None, None

        # Stage-2 frozen teacher.
        self.teacher_model = self.teacher_params = None
        if self.stage == "stage2":
            assert isinstance(cfg, Stage2Config) and cfg.fix_model, (
                "stage2 requires cfg.fix_model (frozen stage-1 teacher checkpoint)"
            )
            t_vars, t_name, t_levels = load_params_any(cfg.fix_model)
            self.teacher_model = create_model(
                t_name or cfg.model,
                t_levels or cfg.num_levels,
                dtype=self.dtype,
                med_mesh=self.med_mesh,
                med_spatial_axis=self.med_spatial_axis,
            )
            self.teacher_params = t_vars

        # Fused-MED runtime gate: Mosaic compiles a fresh kernel binary per
        # (W, N, bounds) combination and an untested combination can
        # miscompile silently (observed on-chip at w=128/N=33: all-zero pan,
        # i.e. training against a black synthesized view with no error
        # raised anywhere).  One tiny shared-logits comparison against the
        # jnp oracle at this run's exact shape catches that class before the
        # first step; on disagreement we train through the jnp path instead
        # (correct, ~1.4x slower step) and say so loudly.  Vacuous off-TPU.
        self.med_selfcheck_result = (True, 0.0)
        if cfg.med_selfcheck and self.model.med_impl == "auto":
            from fal_net_tpu.ops.med_selfcheck import fused_med_selfcheck

            n_checks = {self.model.num_levels}
            if self.teacher_model is not None:
                n_checks.add(self.teacher_model.num_levels)
            ok, worst = True, 0.0
            for n in sorted(n_checks):
                o, d = fused_med_selfcheck(
                    cfg.crop_size[1], n, cfg.min_disp, cfg.max_disp,
                    height=cfg.crop_size[0],
                )
                ok &= o
                worst = max(worst, d)
            self.med_selfcheck_result = (ok, worst)
            if not ok:
                warnings.warn(
                    "fused MED kernel disagrees with the jnp oracle at this "
                    f"run's shape (crop {cfg.crop_size}, levels "
                    f"{sorted(n_checks)}, bounds [{cfg.min_disp}, "
                    f"{cfg.max_disp}]): maxdiff {worst:.3g}.  Falling back "
                    "to med_impl='reference' for this run (correct, ~1.4x "
                    "slower step).  This indicates a Mosaic miscompile at "
                    "an untested shape — see ops/med_selfcheck.py and "
                    "scripts/probe_med_shapes.py.",
                    RuntimeWarning,
                )
                self.model = self.model.clone(med_impl="reference")
                if self.teacher_model is not None:
                    self.teacher_model = self.teacher_model.clone(
                        med_impl="reference"
                    )

        # Data.
        if self._external_train is not None:
            train_ds = self._external_train
        else:
            train_ds, _ = DATASETS[cfg.dataset](
                cfg.data_root,
                split=1,
                co_transform=default_train_transform(cfg.crop_size),
                max_pix=cfg.max_disp,
                fix=cfg.fix_order,
                lists_dir=cfg.lists_dir,
            )
        self.train_loader = DataLoader(
            train_ds,
            batch_size=cfg.batch_size,
            shuffle=True,
            num_workers=cfg.workers,
            seed=cfg.seed,
        )
        self.val_dataset = self._external_val

        steps_per_epoch = len(self.train_loader)
        if cfg.epoch_size:
            steps_per_epoch = min(steps_per_epoch, cfg.epoch_size)
        self.steps_per_epoch = steps_per_epoch

        self.state = create_train_state(
            self.model,
            self.variables,
            lr=cfg.lr,
            beta1=cfg.beta1,
            beta2=cfg.beta2,
            milestones=cfg.milestones,
            lr_gamma=cfg.lr_gamma,
            weight_decay=cfg.weight_decay,
            bias_decay=cfg.bias_decay,
            steps_per_epoch=steps_per_epoch,
            # Warm restart (--pretrained + --start_epoch) fast-forwards the
            # LR schedule; full-state --resume restores the optax update
            # count itself, so the shift must stay 0 there.
            start_step=0 if cfg.resume else cfg.start_epoch * steps_per_epoch,
        )
        if cfg.resume:
            # full-state resume: params + optimizer moments + step (the
            # reference restarts Adam moments on resume — SURVEY §5)
            self.state, meta = load_checkpoint(cfg.resume, self.state)
            if meta.get("epoch") is not None:
                self.cfg.start_epoch = int(meta["epoch"]) + 1

        # Replicate state/constants over the mesh; shard batches on 'data'.
        rep = replicate_sharding(self.mesh)
        self.state = jax.device_put(self.state, rep)
        if self.vgg_params is not None:
            self.vgg_params = jax.device_put(self.vgg_params, rep)
        if self.teacher_params is not None:
            self.teacher_params = jax.device_put(self.teacher_params, rep)
        self.batch_sharding = batch_sharding(self.mesh)
        # Host-side state snapshot for transient-dispatch recovery
        # (cfg.relay_retries, utils/faults.py); refreshed per epoch and at
        # save_every_steps saves.
        self._host_state = None

        self.train_step = self._build_train_step()
        self._setup_done = True

    # ------------------------------------------------------------------
    def _loss_fn(self, params, batch, vgg_params, teacher_params):
        cfg = self.cfg
        vgg_fn = None
        if self.vgg_model is not None and vgg_params is not None:
            vgg_fn = lambda im: self.vgg_model.apply(vgg_params, im)
        model_apply = self.model.apply
        if cfg.remat:
            # checkpoint the model forward: recompute activations in the
            # backward pass instead of keeping the U-Net pyramid in HBM
            def model_apply(p, x, mn, mx, **flags):
                fn = lambda p_, x_: self.model.apply(p_, x_, mn, mx, **flags)
                return jax.checkpoint(fn)(p, x)
        common = dict(
            min_disp=cfg.min_disp,
            max_disp=cfg.max_disp,
            a_p=cfg.a_p,
            a_sm=cfg.a_sm,
            vgg_fn=vgg_fn,
        )
        if self.stage == "stage1":
            return stage1_loss(params, batch, model_apply, **common)
        if self.stage == "stage1_slow":
            return stage1_slow_loss(params, batch, model_apply, **common)
        return stage2_loss(
            params,
            batch,
            model_apply,
            self.teacher_model.apply,
            teacher_params,
            a_mr=cfg.a_mr,  # type: ignore[attr-defined]
            **common,
        )

    def _build_train_step(self):
        accum = max(1, int(getattr(self.cfg, "grad_accum", 1)))

        def step(state: TrainState, batch, vgg_params, teacher_params):
            grad_fn = jax.value_and_grad(
                lambda p, b: self._loss_fn(p, b, vgg_params, teacher_params),
                has_aux=True,
            )
            if accum == 1:
                (loss, aux), grads = grad_fn(state.params, batch)
            else:
                # Microbatching: scan sequential grad computations and apply
                # their mean — the same update as the full batch (losses are
                # per-batch means, so mean-of-grads == grad-of-mean up to fp
                # reassociation) at 1/accum the activation memory.
                def split(x):
                    assert x.shape[0] % accum == 0, (x.shape, accum)
                    return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

                micro = jax.tree.map(split, batch)

                # NB: aux leaves are averaged across microbatches below —
                # correct because every stage-loss aux value is a per-batch
                # MEAN scalar (train/stages.py contract); a non-mean aux
                # (count, max, image) must not be added there without
                # changing this reduction.
                def body(carry, mb):
                    (loss, aux), grads = grad_fn(state.params, mb)
                    g_sum, aux_sum = carry
                    g_sum = jax.tree.map(jnp.add, g_sum, grads)
                    aux_sum = jax.tree.map(jnp.add, aux_sum, aux)
                    return (g_sum, aux_sum), None

                first = jax.tree.map(lambda x: x[0], micro)
                (_, aux0), g0 = grad_fn(state.params, first)
                rest = jax.tree.map(lambda x: x[1:], micro)
                (g_sum, aux_sum), _ = jax.lax.scan(body, (g0, aux0), rest)
                grads = jax.tree.map(lambda g: g / accum, g_sum)
                aux = jax.tree.map(lambda a: a / accum, aux_sum)
            new_state = state.apply_gradients(grads)
            return new_state, aux

        return jax.jit(step, donate_argnums=(0,))

    # ------------------------------------------------------------------
    def fit(self, save_path: Optional[str] = None) -> Dict[str, Any]:
        if not self._setup_done:
            self.setup()
        cfg = self.cfg
        # Run-dir layout matches Train_Stage1_K.py:92-103:
        # <save_path>/<dataset>_<stage>/<MM-DD-HH_MM>/<model>,e{E}es{S},b{B},lr{LR}
        # (epoch_size appended after "es" only when positive, like the
        # reference).  The minute-resolution timestamp can collide when
        # two same-config runs launch within one minute (the reference
        # silently clobbers there); we suffix -2, -3, ... instead.
        import datetime

        if save_path is None:
            stamp = datetime.datetime.now().strftime("%m-%d-%H_%M")
            leaf = (
                f"{cfg.model},e{cfg.epochs}es"
                f"{cfg.epoch_size if cfg.epoch_size > 0 else ''},"
                f"b{cfg.batch_size},lr{cfg.lr}"
            )
            base = os.path.join(cfg.save_path, f"{cfg.dataset}_{self.stage}")
            save_path = os.path.join(base, stamp, leaf)
            n = 2
            while os.path.exists(save_path):
                save_path = os.path.join(base, f"{stamp}-{n}", leaf)
                n += 1
        dump_settings(save_path, cfg)
        self.logger = MetricsLogger(save_path)

        # Checkpoint selection: the reference picks model_best on the
        # KITTI-2015 view-synthesis RMSE (Train_Stage1_K.py:191-207).  With
        # no val dataset we fall back to the epoch train loss — a different
        # metric, so the checkpoint meta names it honestly (best_metric)
        # instead of calling a loss an RMSE; epochs where val_freq skips
        # validation don't update "best" (mixing metrics would make "best"
        # meaningless).
        best_metric = "rmse" if self.val_dataset is not None else "train_loss"
        best_value = -1.0
        history = []
        for epoch in range(cfg.start_epoch, cfg.epochs):
            train_metrics = self.train_epoch(epoch, save_path)
            val_metrics = {}
            if self.val_dataset is not None and (epoch % cfg.val_freq == 0):
                val_metrics = self.validate(self.val_dataset, epoch)
                self.logger.scalars(epoch, val_metrics, prefix="val/")
            if best_metric == "rmse":
                candidate = val_metrics.get("rmse")  # None on skipped epochs
            else:
                candidate = train_metrics.get("loss", 0.0)
            is_best = candidate is not None and (
                best_value < 0 or candidate < best_value
            )
            if is_best:
                best_value = candidate
            meta = {
                "epoch": epoch,
                "step": int(self.state.step),
                "model_name": self.model.spec.torch_name,
                "num_levels": self.model.num_levels,
                "best_metric": best_metric,
                "best_value": best_value,
                "stage": self.stage,
            }
            if best_metric == "rmse":
                # reference-compatible key, only when it really is the RMSE
                meta["best_rmse"] = best_value
            save_checkpoint(
                save_path,
                jax.device_get(self.state),
                meta=meta,
                is_best=is_best,
            )
            history.append({"epoch": epoch, **train_metrics, **val_metrics})
        return {
            "best_metric": best_metric,
            "best_value": best_value,
            # legacy alias (cli/train prints it; only an RMSE when val ran)
            "best_rmse": best_value,
            "history": history,
        }

    def train_epoch(self, epoch: int, save_path: Optional[str] = None) -> Dict[str, float]:
        cfg = self.cfg
        self.train_loader.set_epoch(epoch)
        losses = AverageMeter()
        rec_losses = AverageMeter()
        data_time = AverageMeter()
        batch_time = AverageMeter()

        # Optional profiler capture (cfg.profile_steps > 0, first epoch):
        # steps [1, 1+N) — step 0 is compile — traced to
        # <save_path>/profile for TensorBoard/Perfetto.  Failure to start
        # (e.g. a remote backend without profiler support) only warns.
        prof_window = None
        if cfg.profile_steps > 0 and epoch == cfg.start_epoch and save_path:
            prof_window = (1, 1 + cfg.profile_steps)
        prof_active = False

        def _prof(i: int, done: bool = False) -> None:
            nonlocal prof_active
            if prof_window is None:
                return
            try:
                if not prof_active and not done and i == prof_window[0]:
                    jax.profiler.start_trace(os.path.join(save_path, "profile"))
                    prof_active = True
                elif prof_active and (done or i == prof_window[1]):
                    jax.profiler.stop_trace()
                    prof_active = False
                    print(f"=> profiler trace in {save_path}/profile")
            except Exception as e:  # profiling must never kill training
                prof_active = False
                print(f"=> profiler unavailable: {e}")

        # Transient-dispatch fault tolerance (cfg.relay_retries): the train
        # step donates the optimizer state, so recovery needs a host-side
        # snapshot to restore when a failed dispatch already consumed the
        # donated buffers.  The reference has no failure handling at all
        # (SURVEY §5 — manual --pretrained/--start_epoch relaunch).
        retries = max(0, int(getattr(cfg, "relay_retries", 0)))
        snapshot_every = max(0, int(getattr(cfg, "snapshot_every_steps", 0)))
        if retries:
            self._host_state = jax.device_get(self.state)

        def _step_with_recovery(model_batch):
            """One applied train step + its metric fetch, as a single
            recovery unit.  Dispatch is async on remote backends, so an
            execution failure usually surfaces at the metric fetch, after
            the old state was already donated — the fetch must happen
            BEFORE committing ``self.state`` so every failure mode lands
            in the same handler: retry in place when the old state is
            still alive, roll back to the host snapshot when it was
            consumed."""
            for attempt in range(retries + 1):
                try:
                    new_state, aux = self.train_step(
                        self.state, model_batch, self.vgg_params, self.teacher_params
                    )
                    # forces execution; surfaces in-flight failures here
                    metric_vals = (float(aux["loss"]), float(aux["rec_loss"]))
                    self.state = new_state
                    return metric_vals
                except Exception as e:  # noqa: BLE001 - classified below
                    if not is_transient(e) or attempt == retries:
                        raise
                    if not tree_alive(self.state):
                        # the failed step consumed its donated input: roll
                        # back to the last snapshot (step counter included)
                        self.state = jax.device_put(
                            self._host_state, replicate_sharding(self.mesh)
                        )
                        print(
                            "=> transient dispatch failure consumed the "
                            f"donated train state; rolled back to step "
                            f"{int(self.state.step)} and retrying: {e!r}"
                        )
                        if self.logger:
                            # make the step-counter regression visible in
                            # the metric timeline instead of silently
                            # re-emitting old step indices
                            self.logger.scalars(
                                int(self.state.step), {"rollback": 1.0},
                                prefix="train/",
                            )
                    else:
                        print(
                            "=> transient dispatch failure (state intact), "
                            f"retrying step: {e!r}"
                        )
                    time.sleep(2.0 * (attempt + 1))
            raise AssertionError("unreachable")

        end = time.time()
        it = prefetch_to_device(
            iter(self.train_loader), size=2, sharding=self.batch_sharding
        )
        for i, batch in enumerate(it):
            if i >= self.steps_per_epoch:
                break
            _prof(i)
            data_time.update(time.time() - end)
            model_batch = {"left": batch["left"], "right": batch["right"]}
            if not cfg.fix_order and "max_disp" in batch:
                # fix_order=False: random L/R swaps flip each sample's
                # disparity sign; the per-sample x_pix must reach the model
                # (Train_Stage1_K.py:227).  With fix_order=True the value is
                # the constant +max_disp, and keeping it a python float
                # preserves the fused Pallas MED head.
                model_batch["max_disp"] = batch["max_disp"]
            loss_v, rec_v = _step_with_recovery(model_batch)
            losses.update(loss_v, cfg.batch_size)
            rec_losses.update(rec_v, cfg.batch_size)
            if retries and snapshot_every and (i + 1) % snapshot_every == 0:
                # bound the worst-case rollback distance without waiting
                # for save_every_steps (which defaults to off)
                self._host_state = jax.device_get(self.state)
            batch_time.update(time.time() - end)
            end = time.time()
            if i % cfg.print_freq == 0:
                print(
                    f"Epoch: [{epoch}][{i}/{self.steps_per_epoch}] "
                    f"Time {batch_time} Data {data_time} "
                    f"Loss {losses} RecLoss {rec_losses}"
                )
                if self.logger:
                    self.logger.scalars(
                        int(self.state.step),
                        {"loss": losses.val, "rec_loss": rec_losses.val},
                        prefix="train/",
                    )
            if (
                cfg.save_every_steps
                and save_path
                and (i + 1) % cfg.save_every_steps == 0
            ):
                host_state = jax.device_get(self.state)
                if retries:
                    self._host_state = host_state  # advance the recovery point
                save_checkpoint(
                    save_path,
                    host_state,
                    meta={
                        "epoch": epoch - 1,  # resume re-runs this epoch
                        "step": int(self.state.step),
                        "model_name": self.model.spec.torch_name,
                        "num_levels": self.model.num_levels,
                        "stage": self.stage,
                    },
                )
        _prof(self.steps_per_epoch, done=True)  # close a still-open trace
        return {"loss": losses.avg, "rec_loss": rec_losses.avg}

    # ------------------------------------------------------------------
    @functools.cached_property
    def _val_forward(self):
        def fwd(params, left):
            rb = self.cfg.rel_baseline_val
            return self.model.apply(
                params,
                left,
                self.cfg.min_disp * rb,
                self.cfg.max_disp * rb,
                ret_disp=True,
                ret_pan=True,
                ret_subocc=True,
            )

        return jax.jit(fwd)

    @functools.cached_property
    def _val_forward_ref(self):
        """Validation forward through the jnp MED path — the fallback when
        the fused kernel fails its gate at a validation shape."""
        model = self.model.clone(med_impl="reference")

        def fwd(params, left):
            rb = self.cfg.rel_baseline_val
            return model.apply(
                params,
                left,
                self.cfg.min_disp * rb,
                self.cfg.max_disp * rb,
                ret_disp=True,
                ret_pan=True,
                ret_subocc=True,
            )

        return jax.jit(fwd)

    def _val_forward_for(self, height: int, width: int):
        """Pick the validation forward for this bucket shape, gating the
        fused MED kernel first.  The setup-time gate covers the TRAINING
        crop only; validation runs at the val dataset's own shapes, each
        of which compiles a fresh Mosaic binary (same silent-miscompile
        risk class — ops/med_selfcheck.py).  One oracle comparison per new
        shape, cached per Trainer; on disagreement this validation run
        uses the jnp MED path (correct, slower) and warns once."""
        cfg = self.cfg
        if not (cfg.med_selfcheck and self.model.med_impl == "auto"):
            return self._val_forward
        key = (int(height), int(width))
        ok = self._val_med_ok.get(key)
        if ok is None:
            from fal_net_tpu.ops.med_selfcheck import fused_med_selfcheck

            rb = cfg.rel_baseline_val
            ok, worst = fused_med_selfcheck(
                width,
                self.model.num_levels,
                cfg.min_disp * rb,
                cfg.max_disp * rb,
                height=height,
                interpret=getattr(self.model, "med_interpret", False),
            )
            self._val_med_ok[key] = ok
            if not ok:
                warnings.warn(
                    "fused MED kernel disagrees with the jnp oracle at the "
                    f"validation shape {height}x{width} (maxdiff "
                    f"{worst:.3g}); validating through the jnp MED path "
                    "instead (correct, slower) — see ops/med_selfcheck.py.",
                    RuntimeWarning,
                )
        return self._val_forward if ok else self._val_forward_ref

    def validate(self, dataset, epoch: int = 0, log_images: int = 3) -> Dict[str, float]:
        """KITTI-2015 validation (Train_Stage1_K.py:279-347): synthesis RMSE,
        sparse EPE, depth metrics; first ``log_images`` samples' disp/mask/pan
        go to the image logger.

        Runs batched (``cfg.val_batch_size``, per-shape buckets like
        eval/evaluate.py — KITTI-2015 frames are uniform-width so normally
        one bucket): every metric is computed per image exactly as at batch
        1, so batching only removes the per-image device->host sync the
        reference loop pays each frame (Train_Stage1_K.py:283)."""
        from fal_net_tpu.utils.viz import disp2rgb

        bs = max(1, int(getattr(self.cfg, "val_batch_size", 1)))
        rmses = AverageMeter()
        epes = AverageMeter()
        kitti_errors = MultiAverageMeter(KITTI_ERROR_NAMES)

        def process(items):
            lefts = np.stack([np.asarray(s["left"]) for _, s in items])
            if lefts.dtype == np.uint8:
                # raw_uint8 eval datasets: normalize host-side here (the
                # validation forward has no device-normalize stage)
                from fal_net_tpu.data.transforms import normalize

                lefts = normalize(lefts)
            lefts = lefts.astype(np.float32, copy=False)
            pad = bs - len(items)
            if pad:
                lefts = np.concatenate([lefts, np.zeros_like(lefts[:1]).repeat(pad, 0)])
            val_fwd = self._val_forward_for(lefts.shape[1], lefts.shape[2])

            def _fwd_and_fetch():
                # forward + device->host fetch as one retryable unit:
                # nothing is donated here, so a transient dispatch failure
                # just re-runs the batch (utils/faults.py)
                out = val_fwd(self.state.params, jnp.asarray(lefts))
                return (
                    np.asarray(out.pan),
                    np.asarray(out.disp),
                    np.asarray(out.maskL),
                    np.asarray(out.maskR),
                )

            pan_np, disp_np, maskl_np, maskr_np = retry_transient(
                _fwd_and_fetch,
                retries=max(0, int(getattr(self.cfg, "relay_retries", 0))),
                describe="validate forward",
            )
            for slot, (i, s) in enumerate(items):
                # per-image metrics run host-side in numpy: a jnp reduction
                # here would re-upload each frame and block on a device sync
                rmses.update(image_rmse_np(pan_np[slot], np.asarray(s["right"])))
                if self.logger is not None and i < log_images:
                    # Image set mirrors Train_Stage1_K.py:322-338: input left
                    # (first epoch only), disparity, both sub-occ masks, pan.
                    if epoch == 0:
                        self.logger.image(
                            0,
                            f"val{i}/input_left",
                            np.clip(
                                lefts[slot] + np.asarray([0.411, 0.432, 0.45]), 0, 1
                            ),
                        )
                    self.logger.image(epoch, f"val{i}/disparity", disp2rgb(disp_np[slot]))
                    self.logger.image(epoch, f"val{i}/maskL", disp2rgb(maskl_np[slot], 1.0))
                    self.logger.image(epoch, f"val{i}/maskR", disp2rgb(maskr_np[slot], 1.0))
                    self.logger.image(
                        epoch,
                        f"val{i}/pan",
                        np.clip(pan_np[slot] + np.asarray([0.411, 0.432, 0.45]), 0, 1),
                    )
                if "targets" in s:
                    target = np.asarray(s["targets"][0])
                    if disp_np[slot].shape == target.shape:
                        epes.update(real_epe_np(disp_np[slot], target))
                    else:  # size mismatch -> the bilinear upsample matters
                        epes.update(
                            float(
                                real_epe(
                                    jnp.asarray(disp_np[slot])[None],
                                    jnp.asarray(target)[None],
                                    sparse=True,
                                )
                            )
                        )
                    gt_d, pred_d = disps_to_depths_kitti2015(
                        target[None, ..., 0], disp_np[slot][None, ..., 0]
                    )
                    kitti_errors.update(compute_kitti_errors(gt_d[0], pred_d[0]))

        buckets: Dict[tuple, list] = {}
        for i in range(len(dataset)):
            s = dataset.get(i)
            shape = np.asarray(s["left"]).shape
            buckets.setdefault(shape, []).append((i, s))
            if len(buckets[shape]) == bs:
                items, buckets[shape] = buckets[shape], []
                process(items)
        for items in buckets.values():
            if items:
                process(items)

        metrics = {"rmse": rmses.avg, "epe": epes.avg}
        metrics.update(
            {n: v for n, v in zip(KITTI_ERROR_NAMES, kitti_errors.avg)}
        )
        return metrics
