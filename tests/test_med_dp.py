"""Batch-data-parallel fused MED head: shard_map over 'data' must be
bit-identical to the unsharded kernel (interpret mode on the CPU mesh),
including gradients through the custom VJP — VERDICT round-1 item 2
(multi-chip runs previously lost the fused head)."""

import numpy as np
import jax
import jax.numpy as jnp

from fal_net_tpu.models import create_model
from fal_net_tpu.ops.med_pallas import med_outputs_fused, med_outputs_fused_dp
from fal_net_tpu.parallel.mesh import batch_sharding, make_mesh

B, H, W, N, C = 4, 16, 96, 7, 3
MN, MX = 2.0, 30.0


def _data(rng):
    logits = jnp.asarray(rng.standard_normal((B, H, W, N)).astype(np.float32))
    image = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    return logits, image


def test_fused_dp_matches_unsharded(rng):
    logits, image = _data(rng)
    mesh = make_mesh(2)
    want = med_outputs_fused(
        logits, image, MN, MX,
        ret_disp=True, ret_pan=True, ret_subocc=True, interpret=True,
    )
    got = jax.jit(
        lambda lg, im: med_outputs_fused_dp(
            lg, im, MN, MX, mesh=mesh,
            ret_disp=True, ret_pan=True, ret_subocc=True, interpret=True,
        )
    )(
        jax.device_put(logits, batch_sharding(mesh)),
        jax.device_put(image, batch_sharding(mesh)),
    )
    for name in ("disp", "pan", "maskL", "maskR"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(want, name)),
            rtol=1e-6, atol=1e-6, err_msg=name,
        )


def test_fused_dp_gradients_match(rng):
    logits, image = _data(rng)
    mesh = make_mesh(2)

    def loss_unsharded(lg, im):
        out = med_outputs_fused(
            lg, im, MN, MX, ret_disp=True, ret_pan=True, interpret=True
        )
        return jnp.mean(out.disp) + jnp.mean(jnp.abs(out.pan))

    def loss_dp(lg, im):
        out = med_outputs_fused_dp(
            lg, im, MN, MX, mesh=mesh, ret_disp=True, ret_pan=True,
            interpret=True,
        )
        return jnp.mean(out.disp) + jnp.mean(jnp.abs(out.pan))

    g_want = jax.grad(loss_unsharded, argnums=(0, 1))(logits, image)
    g_got = jax.jit(jax.grad(loss_dp, argnums=(0, 1)))(
        jax.device_put(logits, batch_sharding(mesh)),
        jax.device_put(image, batch_sharding(mesh)),
    )
    for a, b, name in zip(g_got, g_want, ("glogits", "gimage")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6, err_msg=name
        )


def test_model_med_mesh_path(rng):
    """FalNet with med_mesh set routes through the shard_map fused head and
    matches the reference jnp path."""
    mesh = make_mesh(2)
    model_dp = create_model(
        "tiny", 5, med_impl="fused", med_mesh=mesh, med_interpret=True
    )
    model_ref = create_model("tiny", 5, med_impl="reference")
    x = jnp.asarray(rng.standard_normal((B, 16, 32, 3)).astype(np.float32) * 0.3)
    variables = model_ref.init(jax.random.PRNGKey(0), x[:1], MN, MX, ret_disp=True)
    want = model_ref.apply(variables, x, MN, MX, ret_disp=True, ret_pan=True)
    got = jax.jit(
        lambda v, xx: model_dp.apply(v, xx, MN, MX, ret_disp=True, ret_pan=True)
    )(variables, jax.device_put(x, batch_sharding(mesh)))
    np.testing.assert_allclose(
        np.asarray(got.disp), np.asarray(want.disp), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.pan), np.asarray(want.pan), rtol=1e-4, atol=1e-4
    )


def test_fused_dp_spatial_matches_unsharded(rng):
    """2-D dp x sp mesh: batch over 'data' AND rows over 'spatial' — the
    MED math is row-local, so the H-split must be exact (incl. per-shard
    H padding to the kernel tile)."""
    from fal_net_tpu.parallel.spatial import image_sharding, make_2d_mesh

    logits, image = _data(rng)
    mesh = make_2d_mesh(2, 2)
    want = med_outputs_fused(
        logits, image, MN, MX,
        ret_disp=True, ret_pan=True, ret_subocc=True, interpret=True,
    )
    got = jax.jit(
        lambda lg, im: med_outputs_fused_dp(
            lg, im, MN, MX, mesh=mesh, spatial_axis="spatial",
            ret_disp=True, ret_pan=True, ret_subocc=True, interpret=True,
        )
    )(
        jax.device_put(logits, image_sharding(mesh)),
        jax.device_put(image, image_sharding(mesh)),
    )
    for name in ("disp", "pan", "maskL", "maskR"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(want, name)),
            rtol=1e-6, atol=1e-6, err_msg=name,
        )


def test_fused_dp_spatial_odd_local_rows(rng):
    """Local H shards that aren't a tile multiple (16 rows / 2 shards = 8
    = exactly one tile; use H=24 -> 12 rows/shard, forcing per-shard pad)."""
    from fal_net_tpu.parallel.spatial import image_sharding, make_2d_mesh

    h = 24
    logits = jnp.asarray(rng.standard_normal((B, h, W, N)).astype(np.float32))
    image = jnp.asarray(rng.standard_normal((B, h, W, C)).astype(np.float32))
    mesh = make_2d_mesh(1, 2)
    want = med_outputs_fused(
        logits, image, MN, MX, ret_disp=True, ret_pan=True, interpret=True
    )
    got = jax.jit(
        lambda lg, im: med_outputs_fused_dp(
            lg, im, MN, MX, mesh=mesh, spatial_axis="spatial",
            ret_disp=True, ret_pan=True, interpret=True,
        )
    )(
        jax.device_put(logits, image_sharding(mesh)),
        jax.device_put(image, image_sharding(mesh)),
    )
    np.testing.assert_allclose(
        np.asarray(got.disp), np.asarray(want.disp), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.pan), np.asarray(want.pan), rtol=1e-6, atol=1e-6
    )


def test_fused_dp_indivisible_batch_falls_back(rng):
    """A model built with a training mesh must survive the batch-1
    validation forward: indivisible batch (or H) falls back to the jnp
    path instead of tripping a shard_map divisibility assert (found in
    review: multi-chip training crashed at the first validation epoch)."""
    mesh = make_mesh(4)
    logits = jnp.asarray(rng.standard_normal((1, H, W, N)).astype(np.float32))
    image = jnp.asarray(rng.standard_normal((1, H, W, C)).astype(np.float32))
    want = med_outputs_fused(
        logits, image, MN, MX, ret_disp=True, ret_pan=True, interpret=True
    )
    got = med_outputs_fused_dp(
        logits, image, MN, MX, mesh=mesh,
        ret_disp=True, ret_pan=True, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got.disp), np.asarray(want.disp), rtol=1e-4, atol=1e-4
    )
    # spatial axis indivisible (H=16 over 3... use H not divisible by sp)
    from fal_net_tpu.parallel.spatial import make_2d_mesh

    mesh2 = make_2d_mesh(1, 2)
    lg = jnp.asarray(rng.standard_normal((2, 15, W, N)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((2, 15, W, C)).astype(np.float32))
    want2 = med_outputs_fused(lg, im, MN, MX, ret_disp=True, interpret=True)
    got2 = med_outputs_fused_dp(
        lg, im, MN, MX, mesh=mesh2, spatial_axis="spatial",
        ret_disp=True, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got2.disp), np.asarray(want2.disp), rtol=1e-4, atol=1e-4
    )


def test_model_med_mesh_batch1_validation_path(rng):
    """FalNet with med_mesh + fused: the batch-1 eval forward (pan+masks,
    as Trainer.validate issues it) runs and matches the reference path."""
    mesh = make_mesh(4)
    model = create_model(
        "tiny", 5, med_impl="fused", med_mesh=mesh, med_interpret=True
    )
    model_ref = create_model("tiny", 5, med_impl="reference")
    x = jnp.asarray(rng.standard_normal((1, 16, 32, 3)).astype(np.float32) * 0.3)
    v = model_ref.init(jax.random.PRNGKey(0), x, MN, MX, ret_disp=True)
    want = model_ref.apply(v, x, MN, MX, ret_disp=True, ret_pan=True, ret_subocc=True)
    got = model.apply(v, x, MN, MX, ret_disp=True, ret_pan=True, ret_subocc=True)
    for name in ("disp", "pan", "maskL", "maskR"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(want, name)),
            rtol=1e-4, atol=1e-4, err_msg=name,
        )
