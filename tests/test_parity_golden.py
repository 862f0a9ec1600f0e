"""Executed numerical parity vs committed torch-oracle goldens.

This is the SURVEY.md §7 parity gate, run for real: the fixtures under
tests/fixtures/golden/ were produced by tests/oracles/ — an independent torch
re-implementation of the published diffusers CogVideoX semantics (the models
the reference imports at /root/reference/inference_script.py:10-17) — and the
state dicts flow through dove_tpu.weights.convert_{vae,dit}, the same
conversion path released checkpoints take.

Pinned conventions (each had at least one plausible wrong alternative):
  * causal 3D conv first-frame temporal padding + conv-cache chunking,
  * encoder temporal avg-pool / decoder nearest-upsample odd-frame handling,
  * SpatialNorm3D zq nearest-resize with first-frame split,
  * 3D RoPE "slice" grid + interleaved-pair rotation,
  * qk-layernorm placement, adaLN-zero chunk order, final AdaLayerNorm
    (shift, scale) chunk order, joint-vs-video-only norm_final,
  * 3D sincos pos-embed layout (temporal quarter first, w-major spatial grid),
  * zero-terminal-SNR rescaled alpha-bar table, add_noise/get_velocity.

Regenerate with: python tests/oracles/make_golden.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
GOLDEN = REPO / "tests" / "fixtures" / "golden"
sys.path.insert(0, str(REPO / "scripts"))

PSNR_BAR_DB = 50.0


def _load_safetensors(path: Path) -> dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(str(path), framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def _config(variant: str):
    from dove_tpu import config as cfg_mod

    if variant == "15":
        return cfg_mod.tiny_test()
    base = cfg_mod.tiny_test()
    return cfg_mod.PipelineConfig(
        dit=cfg_mod.DiTConfig(
            num_layers=2, num_attention_heads=4, attention_head_dim=16,
            in_channels=8, out_channels=8, text_embed_dim=32,
            max_text_seq_length=7, time_embed_dim=16,
            patch_size_t=None, patch_bias=True,
            use_rotary_positional_embeddings=False,
            # latent-unit sample grid == geometry a's grid (see
            # tests/oracles/make_golden.py for why)
            sample_height=8, sample_width=8, sample_frames=9,
        ),
        vae=base.vae,
        scheduler=cfg_mod.SchedulerConfig(snr_shift_scale=3.0),
    )


@pytest.fixture(scope="module",
                params=["15", "2b", "15:g2", "2b:g2"])
def golden(request):
    # ":g2" = second geometry (odd pixel frames, non-square, odd grid dims
    # + the 2b sincos recompute branch) — same committed state dicts,
    # separate golden_g2.npz fixture (VERDICT r4 item 8)
    variant, _, geom = request.param.partition(":")
    d = GOLDEN / variant
    fname = "golden_g2.npz" if geom else "golden.npz"
    fx = dict(np.load(d / fname, allow_pickle=False))
    meta = json.loads(str(fx.pop("meta")))
    # integrity: committed fixtures must match their recorded checksums
    import parity_check as pc

    for name, want in meta["sha256"].items():
        assert pc._sha256(fx[name]) == want, f"fixture {name} corrupted"

    import jax.numpy as jnp

    from dove_tpu.weights import convert_dit, convert_vae

    cfg = _config(variant)
    vae_params = convert_vae(
        _load_safetensors(d / "vae.safetensors"), cfg.vae, jnp.float32)
    dit_params = convert_dit(
        _load_safetensors(d / "transformer.safetensors"), cfg.dit, jnp.float32)
    outs = pc.jax_outputs(cfg, dit_params, vae_params, fx)
    return request.param, cfg, fx, outs


def _assert_parity(name: str, ours, golden_arr):
    import parity_check as pc

    row = pc.compare(name, ours, golden_arr, PSNR_BAR_DB)
    assert row["status"] == "PASS", row


@pytest.mark.parametrize(
    "module",
    ["vae_moments", "vae_decode_out", "dit_out", "dit_block0_out",
     "dit_blocklast_out", "sched_alphas", "sched_x0"],
)
def test_module_parity(golden, module):
    variant, cfg, fx, outs = golden
    if module not in fx:  # geometry-a fixtures predate the last-block tap
        pytest.skip(f"{module} not in this fixture")
    _assert_parity(f"{variant}:{module}", outs[module], fx[module])


def test_add_noise_parity(golden):
    variant, cfg, fx, outs = golden
    import jax.numpy as jnp

    from dove_tpu.ops.scheduler import Schedule

    sched = Schedule.create(cfg.scheduler)
    z = jnp.asarray(fx["dit_latent"], jnp.float32)
    noise = jnp.asarray(fx["dit_latent"][:, ::-1].copy(), jnp.float32)
    t = jnp.asarray([int(fx["timestep"])], jnp.int32)
    ours = np.asarray(sched.add_noise(z, noise, t), np.float32)
    _assert_parity(f"{variant}:sched_add_noise", ours, fx["sched_add_noise"])


def test_oracle_quarantine():
    """dove_tpu must never import tests.oracles, and torch may appear only
    as a lazy in-function import (checkpoint converters / tensorboard) —
    never at module scope, so the compute path has zero torch dependency."""
    for f in (REPO / "dove_tpu").rglob("*.py"):
        text = f.read_text()
        assert "tests.oracles" not in text, f"{f} imports the torch oracle"
        for line in text.splitlines():
            if line.startswith(("import torch", "from torch")):
                raise AssertionError(
                    f"{f}: module-scope torch import: {line.strip()!r}")
