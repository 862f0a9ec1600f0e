"""Mesh/sharding correctness: the same computation must produce the same
numbers under any (data, model) layout — XLA collectives are an
implementation detail, not a math change."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dove_tpu.config import tiny_test
from dove_tpu.models.dit import init_dit_params
from dove_tpu.ops.scheduler import Schedule
from dove_tpu.parallel.mesh import (
    batch_sharding,
    fsdp_spec,
    make_mesh,
    param_shardings,
    shard_params,
)
from dove_tpu.train.losses import stage1_loss


def _loss_under_mesh(data: int, model: int):
    cfg = tiny_test()
    schedule = Schedule.create(cfg.scheduler)
    mesh = make_mesh(data=data, model=model)
    params = init_dit_params(jax.random.PRNGKey(0), cfg.dit)
    params = shard_params(params, mesh, "model")

    B, Fl, h, w = 4, 2, 4, 8
    batch = {
        "lq_latent": jnp.broadcast_to(
            jnp.linspace(-1, 1, Fl * h * w * cfg.dit.in_channels).reshape(
                1, Fl, h, w, cfg.dit.in_channels
            ),
            (B, Fl, h, w, cfg.dit.in_channels),
        ),
        "hq_latent": jnp.zeros((B, Fl, h, w, cfg.dit.in_channels)),
        "prompt_embeds": jnp.zeros(
            (B, cfg.dit.max_text_seq_length, cfg.dit.text_embed_dim)
        ),
    }
    bs = batch_sharding(mesh)
    batch = jax.tree.map(lambda x: jax.device_put(x, bs), batch)

    @jax.jit
    def loss_fn(p, b):
        loss, _ = stage1_loss(cfg, schedule, p, b, None, remat=False)
        return loss

    with mesh:
        return float(loss_fn(params, batch))


def test_loss_invariant_to_mesh_layout():
    ref = _loss_under_mesh(1, 1)
    assert np.isfinite(ref)
    # batch=4 must divide the data axis
    for data, model in ((4, 1), (2, 2), (1, 4), (4, 2)):
        val = _loss_under_mesh(data, model)
        np.testing.assert_allclose(val, ref, rtol=2e-5, err_msg=f"{data}x{model}")


def test_fsdp_spec_rules():
    mesh = make_mesh(data=2, model=4)
    # big 2D matrix: shard the larger divisible dim
    spec = fsdp_spec(jnp.zeros((64, 128)), "model", 4)
    assert spec == jax.sharding.PartitionSpec(None, "model")
    # scalar / tiny leaves stay replicated
    assert fsdp_spec(jnp.zeros(()), "model", 4) == jax.sharding.PartitionSpec()
    assert fsdp_spec(jnp.zeros((3,)), "model", 4) == jax.sharding.PartitionSpec()
    # shardings tree mirrors placement
    params = {"w": jnp.zeros((64, 128)), "b": jnp.zeros((3,))}
    placed = shard_params(params, mesh, "model")
    specs = param_shardings(params, mesh, "model")
    assert placed["w"].sharding == specs["w"]


def test_grads_match_across_fsdp():
    """Gradients (not just losses) must be layout-invariant."""
    cfg = tiny_test()
    schedule = Schedule.create(cfg.scheduler)

    def grad_norm(model_axis):
        mesh = make_mesh(data=1, model=model_axis)
        params = shard_params(
            init_dit_params(jax.random.PRNGKey(0), cfg.dit), mesh, "model"
        )
        batch = {
            "lq_latent": jnp.ones((2, 2, 4, 8, cfg.dit.in_channels)),
            "hq_latent": jnp.full((2, 2, 4, 8, cfg.dit.in_channels), 0.3),
            "prompt_embeds": jnp.zeros(
                (2, cfg.dit.max_text_seq_length, cfg.dit.text_embed_dim)
            ),
        }

        @jax.jit
        def g(p, b):
            grads = jax.grad(
                lambda q: stage1_loss(cfg, schedule, q, b, None, remat=False)[0]
            )(p)
            return optax.global_norm(grads)

        with mesh:
            return float(g(params, batch))

    np.testing.assert_allclose(grad_norm(1), grad_norm(4), rtol=2e-5)
