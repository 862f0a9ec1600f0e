"""Quarantined PyTorch oracles for numerical-parity testing.

These modules are INDEPENDENT re-implementations (in torch, the reference's
compute substrate) of the published diffusers CogVideoX model semantics that
the reference imports (/root/reference/inference_script.py:10-17). They exist
only so the JAX implementations in dove_tpu/ can be checked against a second,
independently-derived implementation in this environment (diffusers itself is
not installed here; torch CPU is).

Nothing under tests/oracles/ may be imported by dove_tpu/ — the product never
depends on torch. Enforced by tests/test_parity_golden.py::test_oracle_quarantine.
"""
