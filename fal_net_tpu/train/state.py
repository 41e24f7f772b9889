"""Train state: params + Adam + stepwise LR schedule.

Matches the reference optimizer setup: Adam(betas=(0.5, 0.999))
(Train_Stage1_K.py:52-54,180) with MultiStepLR x0.5 at the configured epoch
milestones (Train_Stage1_K.py:55-56,181).  Unlike the reference, optimizer
state IS checkpointed (reference gap: resume restarted Adam moments,
SURVEY §5).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def make_lr_schedule(
    lr: float,
    milestones: Sequence[int],
    gamma: float,
    steps_per_epoch: int,
) -> optax.Schedule:
    """Piecewise-constant epoch-milestone schedule (MultiStepLR semantics)."""
    boundaries = {int(m) * steps_per_epoch: gamma for m in milestones}
    return optax.piecewise_constant_schedule(lr, boundaries)


def _decay_mask(params, want_bias: bool):
    """Boolean pytree selecting bias leaves (flax leaf key 'bias') or
    everything else — the reference's bias_parameters()/weight_parameters()
    split (Train_Stage1_K.py:177-178 builds one Adam param group per
    side, each with its own weight_decay)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: (getattr(path[-1], "key", None) == "bias") == want_bias,
        params,
    )


def create_train_state(
    model,
    params,
    *,
    lr: float,
    beta1: float,
    beta2: float,
    milestones: Sequence[int],
    lr_gamma: float,
    steps_per_epoch: int,
    start_step: int = 0,
    weight_decay: float = 0.0,
    bias_decay: float = 0.0,
) -> TrainState:
    schedule = make_lr_schedule(lr, milestones, lr_gamma, steps_per_epoch)
    if start_step:
        # Warm restart via --pretrained + --start_epoch (the reference's
        # restart idiom, which fast-forwards MultiStepLR at
        # Train_Stage1_K.py:183-184): optax counts updates from tx.init()=0,
        # so shift the schedule by the steps already taken.  Full-state
        # --resume instead restores the optax count itself and must pass
        # start_step=0 (the Trainer does) or the shift double-counts.
        base_schedule = schedule
        schedule = lambda count: base_schedule(count + start_step)
    tx = optax.adam(schedule, b1=beta1, b2=beta2)
    if weight_decay or bias_decay:
        # torch Adam's per-group weight_decay is L2-INTO-GRAD — grad +=
        # wd * param BEFORE the moment update (torch.optim.Adam, NOT the
        # decoupled AdamW form) — so the decay transforms must run before
        # scale_by_adam.  Reference defaults are 0.0 for both
        # (Train_Stage1_K.py:57-58); zero keeps the plain adam transform
        # (and its checkpointed opt_state structure) bit-identical.
        tx = optax.chain(
            optax.add_decayed_weights(
                weight_decay, mask=lambda p: _decay_mask(p, want_bias=False)
            ),
            optax.add_decayed_weights(
                bias_decay, mask=lambda p: _decay_mask(p, want_bias=True)
            ),
            tx,
        )
    import jax.numpy as jnp

    state = TrainState(
        step=jnp.asarray(start_step, jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )
    return state
