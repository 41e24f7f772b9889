"""Spatial (H-axis) partitioning on the virtual CPU mesh.

Checks that a forward pass with activations sharded over a
('data','spatial') mesh produces the same numbers as the unsharded model
(XLA inserts the conv halo exchanges), and that a full train step runs.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fal_net_tpu.models import create_model
from fal_net_tpu.parallel.spatial import image_sharding, make_2d_mesh, replicated


@pytest.mark.slow
def test_spatial_forward_matches_unsharded(rng):
    mesh = make_2d_mesh(2, 4)
    model = create_model("tiny", 5, med_impl="reference")
    x = jnp.asarray(rng.standard_normal((2, 64, 96, 3)).astype(np.float32) * 0.2)
    variables = model.init(jax.random.PRNGKey(0), x, 2.0, 30.0, ret_disp=True)

    def fwd(variables, x):
        out = model.apply(variables, x, 2.0, 30.0, ret_disp=True, ret_pan=True)
        return out.disp, out.pan

    want_disp, want_pan = jax.jit(fwd)(variables, x)

    xs = jax.device_put(x, image_sharding(mesh))
    vs = jax.device_put(variables, replicated(mesh))
    got_disp, got_pan = jax.jit(fwd)(vs, xs)
    np.testing.assert_allclose(
        np.asarray(got_disp), np.asarray(want_disp), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_pan), np.asarray(want_pan), rtol=1e-4, atol=1e-4
    )
    # the output really is sharded over (data, spatial)
    assert got_disp.sharding.is_equivalent_to(image_sharding(mesh), ndim=4)


@pytest.mark.slow
def test_spatial_train_step_runs(rng):
    from fal_net_tpu.train.stages import stage1_loss
    from fal_net_tpu.train.state import create_train_state

    mesh = make_2d_mesh(2, 2)
    model = create_model("tiny", 5, med_impl="reference")
    left = jnp.asarray(rng.standard_normal((2, 32, 64, 3)).astype(np.float32) * 0.2)
    right = jnp.asarray(rng.standard_normal((2, 32, 64, 3)).astype(np.float32) * 0.2)
    variables = model.init(jax.random.PRNGKey(0), left, 2.0, 30.0, ret_disp=True)
    state = create_train_state(
        model, variables, lr=1e-4, beta1=0.5, beta2=0.999,
        milestones=(30,), lr_gamma=0.5, steps_per_epoch=10,
    )
    state = jax.device_put(state, replicated(mesh))
    batch = {
        "left": jax.device_put(left, image_sharding(mesh)),
        "right": jax.device_put(right, image_sharding(mesh)),
    }

    @jax.jit
    def step(state, batch):
        def loss_fn(p):
            return stage1_loss(
                p, batch, model.apply,
                min_disp=2.0, max_disp=30.0, a_p=0.0, a_sm=0.2 * 2 / 512,
            )

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss

    state, loss = step(state, batch)
    assert np.isfinite(float(loss))


_REMAT_SCRIPT = textwrap.dedent(
    """
    import os, re
    flags = os.environ.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\\d+", "", flags)
    os.environ["XLA_FLAGS"] = (
        flags.strip() + " --xla_force_host_platform_device_count=8"
    ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fal_net_tpu.parallel.mesh import replicate_sharding
    from fal_net_tpu.parallel.spatial import make_2d_mesh
    from fal_net_tpu.models import create_model
    from fal_net_tpu.train.stages import stage1_loss
    from fal_net_tpu.train.state import create_train_state

    mesh = make_2d_mesh(4, 2)
    model = create_model("tiny", 5, med_impl="fused", med_mesh=mesh,
                         med_spatial_axis="spatial", med_interpret=True)
    h, w, batch = 64, 128, 4
    left = jnp.zeros((batch, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), left, 2.0, 300.0,
                           ret_disp=True)
    state = create_train_state(model, variables, lr=1e-4, beta1=0.5,
                               beta2=0.999, milestones=(30, 40),
                               lr_gamma=0.5, steps_per_epoch=100)
    state = jax.device_put(state, replicate_sharding(mesh))
    rng = np.random.default_rng(0)
    sh = NamedSharding(mesh, P("data", "spatial"))
    data = {
        k: jax.device_put(
            rng.standard_normal((batch, h, w, 3)).astype(np.float32) * 0.2, sh
        )
        for k in ("left", "right")
    }

    @jax.jit
    def train_step(state, batch):
        def loss_fn(params):
            return stage1_loss(params, batch, model.apply, min_disp=2.0,
                               max_disp=300.0, a_p=0.0, a_sm=0.2 * 2 / 512,
                               vgg_fn=None)
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss

    state, loss = train_step(state, data)
    assert np.isfinite(float(loss))
    print("STEP_OK", float(loss))
    """
)


@pytest.mark.slow
def test_no_involuntary_remat_on_2d_mesh():
    """VERDICT r3 #2: a full train step over the ('data','spatial') mesh
    must compile without GSPMD's "Involuntary full rematerialization"
    fallback (a full-tensor replication in the hot bwd path).  The H=1
    bottleneck (rb6) used to trigger it: the fwd replicated it over
    'spatial' while the lhs-dilated deconv6 bwd demanded a degenerate
    H-split.  FalNetBackbone._constrain pins fwd/bwd to agree.  Run in a
    subprocess so the XLA C++ warning (stderr) can be asserted on.
    """
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [os.path.dirname(os.path.dirname(__file__)),
                    env.get("PYTHONPATH", "")] if p
    )
    proc = subprocess.run(
        [sys.executable, "-c", _REMAT_SCRIPT],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "STEP_OK" in proc.stdout
    assert "Involuntary full rematerialization" not in proc.stderr, (
        "SPMD replicate-then-partition fallback is back:\n"
        + proc.stderr[-3000:]
    )
