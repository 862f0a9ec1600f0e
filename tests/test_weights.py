"""Weight conversion roundtrips: our export -> diffusers layout -> our loader."""

import jax
import jax.numpy as jnp
import numpy as np

from dove_tpu.config import tiny_test
from dove_tpu.models.dit import init_dit_params
from dove_tpu.train.checkpointing import dit_state_dict, export_lora_safetensors
from dove_tpu.train.lora import apply_lora, init_lora_params
from dove_tpu.weights import convert_dit, fuse_lora_into_dit


def test_dit_state_dict_roundtrip():
    cfg = tiny_test().dit
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    sd = dit_state_dict(params, cfg.patch_size_t)
    assert "transformer_blocks.0.attn1.to_q.weight" in sd
    assert "transformer_blocks.1.ff.net.0.proj.weight" in sd
    back = convert_dit({k: np.asarray(v) for k, v in sd.items()}, cfg, jnp.float32)

    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_lora_export_fuse_matches_apply():
    """Fusing our exported peft-format LoRA into a converted DiT must equal
    apply_lora on the original tree (cross-validates three code paths)."""
    cfg = tiny_test().dit
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    lora = init_lora_params(jax.random.PRNGKey(1), cfg, rank=4)
    # make B nonzero so the delta is visible
    lora = jax.tree.map(lambda x: x + 0.01, lora)

    applied = apply_lora(params, lora, scale=1.0)

    import tempfile
    from pathlib import Path

    from safetensors import safe_open

    with tempfile.TemporaryDirectory() as d:
        path = Path(d) / "pytorch_lora_weights.safetensors"
        export_lora_safetensors(lora, path)
        with safe_open(str(path), framework="np") as fp:
            tensors = {k: fp.get_tensor(k) for k in fp.keys()}
    fused = fuse_lora_into_dit(params, tensors, scale=1.0)

    for t in ("to_q", "to_k", "to_v", "to_out"):
        np.testing.assert_allclose(
            np.asarray(fused["blocks"]["attn1"][t]["kernel"]),
            np.asarray(applied["blocks"]["attn1"][t]["kernel"]),
            atol=1e-5, err_msg=t,
        )
