"""CAME optimizer + LR-schedule factory tests.

The reference delegates to came_pytorch (finetune/utils/optimizer_utils.py:
138-153); ours is a native optax implementation, so pin its semantics here:
factored state shapes, convergence, confidence damping, and jit/scan safety.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dove_tpu.train.optim import came, make_lr_schedule, make_optimizer


def test_came_state_is_factored():
    params = {
        "w": jnp.zeros((64, 32)),          # matrix: factored
        "stack": jnp.zeros((4, 16, 8)),    # stacked per-layer leaf: batch + factored
        "b": jnp.zeros((32,)),             # vector: unfactored
    }
    opt = came(1e-3)
    state = opt.init(params)
    # second-moment rows/cols drop one of the last two dims
    assert state.vr["w"].shape == (64,) and state.vc["w"].shape == (32,)
    assert state.vr["stack"].shape == (4, 16) and state.vc["stack"].shape == (4, 8)
    # vectors keep an unfactored second moment and a dummy col stat
    assert state.vr["b"].shape == (32,) and state.vc["b"].shape == ()
    # first moment is always full-shape
    assert state.m["w"].shape == (64, 32)
    # memory check: factored stats are O(m+n), not O(mn)
    assert state.ur["w"].size + state.uc["w"].size == 64 + 32


def test_came_converges_on_quadratic():
    target = jnp.array(np.random.default_rng(0).normal(size=(24, 12)), jnp.float32)
    params = {"w": jnp.zeros((24, 12)), "b": jnp.zeros((12,))}
    opt = came(3e-2)
    state = opt.init(params)

    def loss_fn(p):
        return jnp.mean((p["w"] - target) ** 2) + jnp.mean((p["b"] - 1.0) ** 2)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    first = None
    for i in range(300):
        params, state, loss = step(params, state)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.05 * first


def test_came_confidence_damps_unstable_coordinates():
    """A coordinate whose gradient flips sign every step (instability) must
    get a smaller effective step than one with a steady gradient of the
    same magnitude — that is the C in CAME."""
    params = {"w": jnp.zeros((2, 128))}
    opt = came(1e-2, b1=0.9)
    state = opt.init(params)
    steady = jnp.ones((128,))
    travel = jnp.zeros((2,))
    for i in range(60):
        flip = jnp.ones((128,)) * (1.0 if i % 2 == 0 else -1.0)
        g = {"w": jnp.stack([steady, flip])}
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
        travel = travel + jnp.abs(updates["w"]).mean(axis=1)
    assert float(travel[0]) > 2.0 * float(travel[1])


def test_came_weight_decay_requires_params():
    opt = came(1e-3, weight_decay=0.1)
    p = {"w": jnp.ones((4, 4))}
    state = opt.init(p)
    with pytest.raises(ValueError):
        opt.update({"w": jnp.ones((4, 4))}, state, None)


def test_factory_came_and_grad_clip():
    sched = make_lr_schedule(1e-3, warmup_steps=2, total_steps=10, kind="linear")
    opt = make_optimizer("came", sched, max_grad_norm=1.0, weight_decay=0.01)
    p = {"w": jnp.ones((8, 8), jnp.bfloat16)}
    state = opt.init(p)
    updates, _ = opt.update({"w": jnp.full((8, 8), 100.0, jnp.bfloat16)}, state, p)
    # update dtype follows the gradient dtype (donation-friendly)
    assert updates["w"].dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(updates["w"], np.float32)))


def test_adamw_8bit_tracks_adamw():
    """8-bit blockwise moments must (a) carry ~2 bytes/param of resident
    state, (b) follow fp32 AdamW closely on a quadratic, (c) jit cleanly."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from dove_tpu.train.optim import adamw_8bit

    def loss(p):
        return jnp.sum((p["w"] - 3.0) ** 2) + jnp.sum((p["b"] + 1.0) ** 2)

    params8 = {"w": jnp.zeros((64, 33)), "b": jnp.zeros((7,))}
    params32 = jax.tree.map(jnp.copy, params8)
    opt8 = adamw_8bit(1e-1, weight_decay=0.0)
    opt32 = optax.adam(1e-1)
    s8, s32 = opt8.init(params8), opt32.init(params32)

    @jax.jit
    def step8(p, s):
        g = jax.grad(loss)(p)
        u, s = opt8.update(g, s, p)
        return optax.apply_updates(p, u), s

    @jax.jit
    def step32(p, s):
        g = jax.grad(loss)(p)
        u, s = opt32.update(g, s, p)
        return optax.apply_updates(p, u), s

    for _ in range(150):
        params8, s8 = step8(params8, s8)
        params32, s32 = step32(params32, s32)
    # Adam oscillates near the optimum at this lr; the REAL check is that
    # the 8-bit trajectory tracks fp32 Adam tightly the whole way
    np.testing.assert_allclose(np.asarray(params8["w"]), 3.0, atol=0.3)
    np.testing.assert_allclose(np.asarray(params8["b"]), -1.0, atol=0.3)
    diff = float(jnp.abs(params8["w"] - params32["w"]).max())
    assert diff < 0.05, diff

    # resident state bytes ~ 2 B per (block-padded) param: int8 + uint8
    # streams + one f32 scale per 2048-block per stream
    padded = 4096 + 2048  # w pads 2112 -> 4096; b pads 7 -> 2048
    state_bytes = sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(s8)
    )
    assert state_bytes < 2.1 * padded, state_bytes


def test_make_optimizer_adamw_8bit_name():
    from dove_tpu.train.optim import make_lr_schedule, make_optimizer

    opt = make_optimizer("adamw-8bit", make_lr_schedule(1e-4))
    assert opt is not None
    opt = make_optimizer("adamw_8bit", make_lr_schedule(1e-4))
    assert opt is not None


def test_adamw_4bit_tracks_adamw():
    """4-bit packed-nibble moments must (a) carry ~0.55 bytes/param of
    resident state, (b) converge on a quadratic near where fp32 Adam does
    (looser than 8-bit: 15-16 levels/block), (c) jit cleanly."""
    from dove_tpu.train.optim import adamw_4bit

    def loss(p):
        return jnp.sum((p["w"] - 3.0) ** 2) + jnp.sum((p["b"] + 1.0) ** 2)

    params4 = {"w": jnp.zeros((64, 33)), "b": jnp.zeros((7,))}
    opt4 = adamw_4bit(1e-1, weight_decay=0.0)
    s4 = opt4.init(params4)

    @jax.jit
    def step4(p, s):
        g = jax.grad(loss)(p)
        u, s = opt4.update(g, s, p)
        return optax.apply_updates(p, u), s

    for _ in range(150):
        params4, s4 = step4(params4, s4)
    np.testing.assert_allclose(np.asarray(params4["w"]), 3.0, atol=0.5)
    np.testing.assert_allclose(np.asarray(params4["b"]), -1.0, atol=0.5)

    # resident bytes: two packed-nibble streams (0.5 B/param each over the
    # block-padded size) + one f32 scale per 128-block per stream
    padded = 2176 + 128  # w pads 2112 -> 2176 (17 blocks); b pads 7 -> 128
    state_bytes = sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(s4)
    )
    # 2 * (0.5 B + 4/128 B) per padded param, + the count scalar
    assert state_bytes <= 2 * (0.5 + 4 / 128) * padded + 8, state_bytes


def test_adamw_4bit_codebook_roundtrip():
    """Values that ARE codebook entries survive quantize->pack->unpack->
    dequantize exactly (per block-absmax scale): the packing and the
    nearest-code argmin are the fragile parts."""
    from dove_tpu.train.optim import _CB4_SIGNED, adamw_4bit

    opt = adamw_4bit(1e-2)
    # one 128-block whose entries are scaled codebook values
    base = np.zeros(128, np.float32)
    base[: len(_CB4_SIGNED)] = _CB4_SIGNED * 0.37
    params = {"w": jnp.zeros((128,))}
    state = opt.init(params)
    # drive m to exactly `base` in one step: g = base / (1 - b1)
    g = {"w": jnp.asarray(base / 0.1)}
    _, state = opt.update(g, state, params)
    # m was quantized on the way out; a second zero-gradient-free probe of
    # the stored stream: dequantize via the public update path by checking
    # the NEXT step's m continuity — simpler: check the stored codes decode
    # to `base` through the state tensors directly
    packed = np.asarray(state.m_q["w"])
    scale = np.asarray(state.m_scale["w"])
    lo, hi = packed & 0xF, packed >> 4
    codes = np.stack([lo, hi], axis=-1).reshape(packed.shape[0], -1)
    vals = _CB4_SIGNED[codes] * scale[:, None]
    np.testing.assert_allclose(vals.reshape(-1), base, rtol=1e-6, atol=1e-9)


def test_make_optimizer_adamw_4bit_name():
    opt = make_optimizer("adamw-4bit", make_lr_schedule(1e-4))
    assert opt is not None
    opt = make_optimizer("adam_4bit", make_lr_schedule(1e-4))
    assert opt is not None


def test_low_bit_opt_state_shards_on_mesh():
    """The quantized moment streams are (nb, block)-shaped — different from
    their params — so pin that the ZeRO-analog shard_params placement and a
    jitted update both work for them on a >1 'model' mesh."""
    from jax.sharding import Mesh

    from dove_tpu.parallel import mesh as mesh_mod
    from dove_tpu.train.optim import adamw_4bit, adamw_8bit

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("data", "model"))
    params = {"w": jnp.zeros((16, 256)), "b": jnp.zeros((5,))}
    for opt in (adamw_8bit(1e-2), adamw_4bit(1e-2)):
        state = mesh_mod.shard_params(opt.init(params), mesh, "model")

        @jax.jit
        def step(p, s, _opt=opt):
            g = jax.tree.map(jnp.ones_like, p)
            u, s = _opt.update(g, s, p)
            return optax.apply_updates(p, u), s

        p2, s2 = step(mesh_mod.shard_params(params, mesh, "model"), state)
        assert np.isfinite(np.asarray(p2["w"], np.float32)).all()
        assert int(np.asarray(s2[0])) == 1  # count advanced
