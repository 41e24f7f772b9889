"""Typed training configs, replacing the reference's four near-duplicated
argparse blocks (Train_Stage1_K.py:30-70 etc.).  Defaults mirror the
reference's shipped hyperparameters exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class TrainConfig:
    model: str = "B"
    num_levels: int = 49
    dataset: str = "Kitti"
    data_root: str = ""
    lists_dir: Optional[str] = None
    crop_size: Tuple[int, int] = (192, 640)
    batch_size: int = 8
    workers: int = 4
    epochs: int = 50
    epoch_size: int = 0  # 0 = full epoch (Train_Stage1_K.py:34)
    lr: float = 1e-4
    beta1: float = 0.5  # adam 'momentum' (Train_Stage1_K.py:53)
    beta2: float = 0.999
    milestones: Tuple[int, ...] = (30, 40)
    lr_gamma: float = 0.5
    weight_decay: float = 0.0  # L2-into-grad on non-bias params — torch
    #   Adam per-group weight_decay semantics, NOT decoupled AdamW
    #   (Train_Stage1_K.py:57,177-178; reference default 0.0)
    bias_decay: float = 0.0  # same, on bias params (:58,177)
    max_disp: float = 300.0
    min_disp: float = 2.0
    rel_baseline_val: float = 1.0  # validation-set baseline scale
    #                                 (--rel_baset, Train_Stage1_K.py:36,296)
    a_p: float = 0.01  # perceptual weight (Train_Stage1_K.py:43)
    a_sm: float = 0.2 * 2 / 512  # smoothness weight (Train_Stage1_K.py:44)
    fix_order: bool = True  # trainers always pass fix=True
    seed: int = 0
    save_path: str = "runs"
    print_freq: int = 100
    val_freq: int = 1
    val_batch_size: int = 4  # batched epoch validation (per-shape buckets;
    #   per-image metrics identical to the reference's batch-1 loop,
    #   Train_Stage1_K.py:283)
    compute_dtype: str = "float32"  # "bfloat16" trains ~1.3x faster on v5e
    remat: bool = False  # rematerialize the model forward in the backward
    #                      pass (trade FLOPs for HBM; enables bigger batches)
    grad_accum: int = 1  # microbatch count: split each batch into this many
    #                      sequential grad computations (lax.scan) and apply
    #                      their mean — same update as the full batch (up to
    #                      fp reassociation) at 1/grad_accum the activation
    #                      HBM.  batch_size must be divisible by it.
    start_epoch: int = 0
    pretrained: Optional[str] = None  # params-only warm start
    resume: Optional[str] = None  # full-state resume (params + Adam moments
    #                                + step), preemption-safe
    save_every_steps: int = 0  # 0 = only per-epoch checkpoints
    profile_steps: int = 0  # capture an XLA/host profiler trace spanning
    #   this many steps of the first epoch (starting at step 1 — step 0 is
    #   compile), written to <save_path>/profile for TensorBoard/Perfetto.
    #   The reference's only tracing is wall-clock meters (SURVEY §5).
    relay_retries: int = 2  # transient-dispatch fault tolerance: retry a
    #   train-step/metric dispatch that fails with a retryable runtime
    #   error (FAILED_PRECONDITION/UNAVAILABLE/... — utils/faults.py) up
    #   to this many times, restoring the last host-side state snapshot
    #   when the failed step already consumed its donated buffers.  The
    #   snapshot refreshes at each epoch start, every snapshot_every_steps
    #   steps, and at every save_every_steps save.  0 disables (fail on
    #   first error, like the reference — SURVEY §5 lists no failure
    #   detection there).
    snapshot_every_steps: int = 500  # refresh the in-memory recovery
    #   snapshot every N steps, bounding the worst-case rollback to N
    #   steps of lost updates (a device_get; ~0.1 s per refresh over PCIe
    #   for FAL_netB+Adam).  0 = only epoch-start/save-time snapshots.
    med_selfcheck: bool = True  # before the first step, compare the
    #   compiled fused MED kernel against the jnp oracle at this run's
    #   exact (crop, levels, bounds) and fall back to med_impl='reference'
    #   with a warning on disagreement.  Mosaic compiles a fresh binary
    #   per shape; an untested combination can miscompile silently (seen
    #   on-chip at w=128/N=33: all-zero pan -> training on a black
    #   synthesized view).  Costs one tiny head compile at setup; 0 risk
    #   of a silently-wrong run (ops/med_selfcheck.py).
    vgg_weights: Optional[str] = None  # torchvision vgg19 state_dict path
    allow_random_vgg: bool = False  # explicit opt-in: train the a_p>0
    #   perceptual term against RANDOM-init VGG features (the reference
    #   always trains against pretrained ImageNet features,
    #   loss_functions.py:10,48; without weights this silently changes
    #   behavior, so it must be asked for)

    @property
    def min_max_ratio(self) -> float:
        return self.min_disp / self.max_disp


@dataclasses.dataclass
class Stage1Config(TrainConfig):
    """Stage-1 defaults == TrainConfig defaults (Train_Stage1_K.py)."""

    slow: bool = False  # True -> Train_Stage1_Kslow two-sided variant

    def __post_init__(self):
        if self.slow:
            self.batch_size = 4  # Kslow default (Train_Stage1_Kslow.py:48)


@dataclasses.dataclass
class Stage2Config(TrainConfig):
    """Stage-2 MOM distillation defaults (Train_Stage2_K.py:44-60)."""

    lr: float = 5e-5
    epochs: int = 20
    milestones: Tuple[int, ...] = (5, 10)
    batch_size: int = 4
    a_sm: float = 0.4 * 2 / 512
    a_mr: float = 1.0  # mirror-loss weight
    fix_model: Optional[str] = None  # frozen stage-1 teacher checkpoint
