#!/usr/bin/env python
"""On-hardware validation of the Pallas flash-attention kernels.

CI runs the kernels under the Pallas CPU interpreter (tests/
test_flash_attention.py); this script proves the same code compiles and
runs CORRECTLY through real Mosaic on a TPU chip — forward and the two
backward kernels, exact and bounded-logits variants, at an odd sequence
length that exercises block padding/masking. Run on any TPU host:

    python scripts/validate_flash_tpu.py

Recorded result (v5e, 2026-08-17): fwd rel err ~3e-3, dq/dk ~3.6e-3,
dv ~1e-3 vs the fp32-softmax XLA oracle — bf16 noise level.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax, jax.numpy as jnp, numpy as np
from dove_tpu.ops.pallas.flash_attention import flash_attention
from dove_tpu.ops.attention import _naive_attention

B, H, S, D = 1, 4, 2309, 64   # odd S exercises padding/masking
kq, kk, kv, kt = jax.random.split(jax.random.PRNGKey(0), 4)
q = jax.random.normal(kq, (B,H,S,D), jnp.bfloat16)
k = jax.random.normal(kk, (B,H,S,D), jnp.bfloat16)
v = jax.random.normal(kv, (B,H,S,D), jnp.bfloat16)
tan = jax.random.normal(kt, (B,H,S,D), jnp.bfloat16)

def loss_f(fn):
    return lambda q,k,v: jnp.sum(fn(q,k,v).astype(jnp.float32) * tan.astype(jnp.float32))

flash = lambda q,k,v: flash_attention(q,k,v)
flash_b = lambda q,k,v: flash_attention(q,k,v,None,1024,1024,True)

for name, fn in (("flash", flash), ("flash-bounded", flash_b)):
    out = jax.jit(fn)(q,k,v)
    ref = jax.jit(_naive_attention)(q,k,v)
    rel = float(jnp.linalg.norm((out-ref).astype(jnp.float32))/jnp.linalg.norm(ref.astype(jnp.float32)))
    print(f"{name} fwd rel_err {rel:.2e}", flush=True)
    assert rel < 2e-2
    g = jax.jit(jax.grad(loss_f(fn), argnums=(0,1,2)))(q,k,v)
    gr = jax.jit(jax.grad(loss_f(_naive_attention), argnums=(0,1,2)))(q,k,v)
    for a,b,nm in zip(g, gr, "qkv"):
        r = float(jnp.linalg.norm((a-b).astype(jnp.float32))/ (float(jnp.linalg.norm(b.astype(jnp.float32)))+1e-9))
        print(f"{name} d{nm} rel_err {r:.2e}", flush=True)
        assert r < 3e-2, (name, nm, r)
print("TPU flash fwd+bwd OK", flush=True)
