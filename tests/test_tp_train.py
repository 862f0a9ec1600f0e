"""Tensor-parallel TRAINING (args.tensor_parallel > 1): the DiT's forward
runs Megatron-style over the mesh "model" axis inside the jitted train step
(losses.py dit_fn hook -> parallel/tp.py shard_map), params + adam moments
take the TP layout, and gradients flow through the two per-block psums.

Equivalence bar: split contractions reorder accumulation, so losses/params
match single-device training to float tolerance, not bit-for-bit.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dove_tpu.config import tiny_test
from dove_tpu.models.dit import init_dit_params
from dove_tpu.ops.scheduler import Schedule
from dove_tpu.parallel import tp
from dove_tpu.parallel.mesh import batch_sharding, make_mesh
from dove_tpu.train.args import Args
from dove_tpu.train.losses import stage1_loss
from dove_tpu.train.optim import make_lr_schedule, make_optimizer


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test()
    schedule = Schedule.create(cfg.scheduler)
    params = init_dit_params(jax.random.PRNGKey(0), cfg.dit)
    B, Fl, h, w = 4, 3, 4, 8
    rng = np.random.default_rng(7)
    batch = {
        "lq_latent": jnp.asarray(rng.normal(size=(B, Fl, h, w, cfg.dit.in_channels)), jnp.float32),
        "hq_latent": jnp.asarray(rng.normal(size=(B, Fl, h, w, cfg.dit.in_channels)), jnp.float32),
        "prompt_embeds": jnp.asarray(
            rng.normal(size=(B, cfg.dit.max_text_seq_length, cfg.dit.text_embed_dim)),
            jnp.float32,
        ),
    }
    return cfg, schedule, params, batch


def _one_sft_step(cfg, schedule, params, batch, dit_fn=None):
    opt = make_optimizer("adamw", make_lr_schedule(1e-3, warmup_steps=0))
    opt_state = opt.init(params)

    def step(p, s, b, rng):
        def loss_fn(q):
            return stage1_loss(cfg, schedule, q, b, rng, remat=True, dit_fn=dit_fn)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    return jax.jit(step)(params, opt_state, batch, jax.random.PRNGKey(3))


def test_tp_train_step_matches_single_device(setup):
    """One SFT train step: loss and updated params under data=2 x model=2 TP
    match the single-device step to accumulation-order tolerance."""
    cfg, schedule, params, batch = setup
    p_ref, _, loss_ref = _one_sft_step(cfg, schedule, params, batch)

    mesh = make_mesh(data=2, model=2)
    sharded = tp.shard_dit_tp(params, mesh, donate=False)
    dit_fn = tp.make_tp_dit(mesh, cfg.dit, remat=True)
    bs = batch_sharding(mesh)
    mesh_batch = jax.tree.map(lambda x: jax.device_put(x, bs), batch)
    with mesh:
        p_tp, _, loss_tp = _one_sft_step(cfg, schedule, sharded, mesh_batch, dit_fn)

    assert abs(float(loss_tp) - float(loss_ref)) < 1e-5 * max(1.0, float(loss_ref))

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12)

    # adam's m/(sqrt(v)+eps) normalization amplifies accumulation-order
    # noise wherever grads are near zero, so the post-update params carry
    # more relative drift than the grads themselves (~2e-6)
    errs = jax.tree.leaves(jax.tree.map(rel, p_tp, p_ref))
    assert max(errs) < 5e-4, f"worst param rel err {max(errs):.2e}"


def test_sp_gradients_match_single_device(setup):
    """A batch that cannot shard over 'data' (B=1) routes the TRAINING
    forward through sequence parallelism too — gradients through the
    token-shard slice/all_gather transposes must match single-device."""
    cfg, schedule, params, batch = setup
    b1 = jax.tree.map(lambda x: x[:1], batch)

    def loss_ref(p):
        return stage1_loss(cfg, schedule, p, b1, jax.random.PRNGKey(3), remat=True)[0]

    g_ref = jax.grad(loss_ref)(params)

    mesh = make_mesh(data=2, model=2)
    sharded = tp.shard_dit_tp(params, mesh, donate=False)
    dit_fn = tp.make_tp_dit(mesh, cfg.dit, remat=True)

    def loss_tp(p):
        return stage1_loss(
            cfg, schedule, p, b1, jax.random.PRNGKey(3), remat=True,
            dit_fn=dit_fn,
        )[0]

    with mesh:
        g_tp = jax.jit(jax.grad(loss_tp))(sharded)

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12)

    errs = jax.tree.leaves(jax.tree.map(rel, g_tp, g_ref))
    assert max(errs) < 1e-4, f"worst grad rel err {max(errs):.2e}"


def test_opt_state_tp_specs(setup):
    """adam mu/nu mirror the param TP specs; counts/scalars replicate; a
    gradient-accumulation (MultiSteps) wrapper's param-shaped accumulators
    match too (path-suffix matching)."""
    cfg, _, params, _ = setup
    opt = optax.MultiSteps(
        make_optimizer("adamw", make_lr_schedule(1e-3, warmup_steps=0)), 2
    )
    state = opt.init(params)
    specs = tp.opt_state_tp_specs(state, params)
    pspecs = tp.dit_tp_specs(params)

    inner = state.inner_opt_state
    sp_inner = specs.inner_opt_state
    # locate the adam moment subtree (structure mirrors the param tree)
    flat_specs = jax.tree.leaves(
        sp_inner, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)
    )
    from jax.sharding import PartitionSpec as P

    assert P(None, None, "model") in flat_specs  # column-parallel moments
    assert P(None, "model", None) in flat_specs  # row-parallel moments
    # gradient accumulators match the param specs leaf-for-leaf
    assert jax.tree.map(
        lambda s: s, specs.acc_grads,
        is_leaf=lambda x: isinstance(x, P),
    ) == pspecs
    # the step counter replicates
    assert specs.mini_step == P()
    del inner


def _tiny_data(root, n_clips=2):
    from tests.test_trainer import TINY_DEGRADATION, _write_clip

    (root / "videos").mkdir(parents=True)
    for i in range(n_clips):
        _write_clip(root / "videos" / f"clip{i}.mp4")
    (root / "videos.txt").write_text(
        "".join(f"videos/clip{i}.mp4\n" for i in range(n_clips))
    )
    (root / "degradation.yaml").write_text(TINY_DEGRADATION)
    return root


def test_trainer_sft_tp_fit(tmp_path):
    """Trainer-level: stage-1 SFT with tensor_parallel=2 — params and adam
    moments land in the TP layout, the jitted step runs, and loss decreases
    on a fixed batch."""
    from tests.test_trainer import _base_args
    from dove_tpu.train.trainer import DOVES1Trainer

    root = _tiny_data(tmp_path / "data")
    args = _base_args(
        root, tmp_path / "out", training_type="sft", tensor_parallel=2,
        data_parallel=2, train_steps=6, checkpointing_steps=100,
        learning_rate=5e-3,
    )
    trainer = DOVES1Trainer(args)
    assert dict(trainer.mesh.shape) == {"data": 2, "model": 2}
    trainer.load_components()

    # DiT q-projection kernels are TP-sharded; adam moments match
    qk = trainer.dit_params["blocks"]["attn1"]["to_q"]["kernel"]
    assert qk.sharding.spec == ("model",) or qk.sharding.spec[-1] == "model"
    trainer.prepare_dataset()
    trainer.prepare_optimizer(total_steps=6)
    mu_q = jax.tree.leaves(
        jax.tree.map(lambda x: x, trainer.opt_state)
    )  # force materialization
    del mu_q

    step_fn = trainer.build_train_step()
    trainer.loader.set_epoch(0)
    batch = trainer._device_batch(next(iter(trainer.loader)))
    frozen = trainer.frozen_params()
    rng = jax.random.PRNGKey(0)
    seen = []
    with trainer.mesh:
        for _ in range(6):
            trainable, trainer.opt_state, loss, aux, gnorm = step_fn(
                trainer.trainable_params(), trainer.opt_state, frozen,
                batch, rng,
            )
            trainer._set_trainable(trainable)
            seen.append(float(loss))
    assert all(np.isfinite(l) for l in seen)
    assert seen[-1] < seen[0], f"no descent under TP: {seen}"


def test_trainer_lora_tp_step(tmp_path):
    """LoRA + tensor_parallel: the frozen base takes the TP layout, LoRA
    trainables stay small/generic, and gradients flow through apply_lora +
    the shard_map TP forward."""
    from tests.test_trainer import _base_args
    from dove_tpu.train.trainer import DOVES1Trainer

    root = _tiny_data(tmp_path / "data", n_clips=1)
    args = _base_args(
        root, tmp_path / "out", training_type="lora", tensor_parallel=2,
        data_parallel=1, train_steps=2, checkpointing_steps=100,
        batch_size=1,
    )
    trainer = DOVES1Trainer(args)
    trainer.load_components()
    trainer.prepare_dataset()
    trainer.prepare_optimizer(total_steps=2)
    step_fn = trainer.build_train_step()
    trainer.loader.set_epoch(0)
    batch = trainer._device_batch(next(iter(trainer.loader)))
    with trainer.mesh:
        trainable, opt_state, loss, aux, gnorm = step_fn(
            trainer.trainable_params(), trainer.opt_state,
            trainer.frozen_params(), batch, jax.random.PRNGKey(0),
        )
    assert np.isfinite(float(loss)) and float(gnorm) > 0


def test_args_rejects_tp_plus_fsdp():
    with pytest.raises(ValueError, match="tensor_parallel"):
        Args(model_path="x", tensor_parallel=2, fsdp=2)


@pytest.mark.slow  # two full fit() runs (~1 min); fast lane guards its budget
def test_resume_fsdp_checkpoint_under_tp(tmp_path):
    """Cross-layout resume: a checkpoint written under fsdp=2 restores into
    a tensor_parallel=2 trainer (orbax reshards values into the template's
    TP shardings) — the layout-migration path real fleets hit when changing
    parallelism mid-run."""
    from tests.test_trainer import _base_args
    from dove_tpu.train.trainer import DOVES1Trainer

    root = _tiny_data(tmp_path / "data")
    out = tmp_path / "out"
    args = _base_args(
        root, out, training_type="sft", fsdp=2, data_parallel=2,
        train_steps=1, checkpointing_steps=1,
    )
    DOVES1Trainer(args).fit()
    assert (out / "checkpoint-1").exists()

    args2 = _base_args(
        root, out, training_type="sft", tensor_parallel=2, data_parallel=2,
        train_steps=2, checkpointing_steps=5,
    )
    trainer2 = DOVES1Trainer(args2)
    trainer2.fit()
    assert trainer2.global_step == 2
    qk = trainer2.dit_params["blocks"]["attn1"]["to_q"]["kernel"]
    assert qk.sharding.spec[-1] == "model"  # restored INTO the TP layout
    import json as _json

    rec = _json.loads(
        (out / "train_log.jsonl").read_text().strip().splitlines()[-1]
    )
    assert np.isfinite(rec["loss"])
