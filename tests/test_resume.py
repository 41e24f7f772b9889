"""Full-state resume: params + Adam moments + step survive a restart."""

import numpy as np
import jax
import jax.numpy as jnp

from fal_net_tpu.parallel.mesh import make_mesh
from fal_net_tpu.train import Stage1Config, Trainer
from tests.test_train import SyntheticStereo, _tiny_cfg


def test_resume_restores_full_state(tmp_path):
    cfg = Stage1Config(**_tiny_cfg(epochs=1, epoch_size=3, save_every_steps=2))
    tr = Trainer(cfg, stage="stage1", mesh=make_mesh(1), train_dataset=SyntheticStereo(n=6))
    tr.fit(save_path=str(tmp_path / "a"))
    step1 = int(tr.state.step)
    mu_leaf = np.asarray(
        jax.tree.leaves(jax.device_get(tr.state.opt_state))[0]
    )

    cfg2 = Stage1Config(
        **_tiny_cfg(epochs=2, epoch_size=3),
        resume=str(tmp_path / "a" / "checkpoint.msgpack"),
    )
    tr2 = Trainer(cfg2, stage="stage1", mesh=make_mesh(1), train_dataset=SyntheticStereo(n=6))
    tr2.setup()
    assert int(tr2.state.step) == step1
    # Adam moments restored (nonzero and matching)
    mu_leaf2 = np.asarray(jax.tree.leaves(jax.device_get(tr2.state.opt_state))[0])
    if mu_leaf.shape == mu_leaf2.shape:
        np.testing.assert_allclose(mu_leaf2, mu_leaf)
    # resume fast-forwards past the saved epoch
    assert tr2.cfg.start_epoch == 1

    # training continues without error
    res = tr2.fit(save_path=str(tmp_path / "b"))
    assert np.isfinite(res["history"][-1]["loss"])
