"""Device-mesh parallelism for serving and training.

The reference scales with DDP + DeepSpeed ZeRO over NCCL (SURVEY.md §2.7).
The TPU-native equivalents here are pure jax.sharding:

  * serving: independent (clip x chunk x tile) work units shard over the
    "data" axis — embarrassingly parallel, no cross-chip comms inside the
    model; weights are replicated (5B bf16 fits a v5e chip) or sharded over
    "model" when HBM-constrained;
  * training: batch over "data", parameters/optimizer state sharded over
    "model" (ZeRO-3/FSDP analog). XLA inserts all-gathers/reduce-scatters
    over ICI from the shardings — no hand-written collectives.

All rules are PartitionSpec trees computed from leaf shapes, so they apply to
any of our param trees (DiT, VAE, optimizer states).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int | None = None, model: int = 1, devices=None
) -> Mesh:
    """2D ("data", "model") mesh. Defaults to all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model > n:
        raise ValueError(f"data({data}) * model({model}) > devices({n})")
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_spec(leaf: jax.Array | Any, axis: str, axis_size: int) -> P:
    """Shard the largest divisible dim of a leaf over `axis` (ZeRO-3 style).

    Leaves too small to shard stay replicated. For stacked per-layer params
    (leading layer dim) the layer dim is skipped so all layers stay local to
    the scan.
    """
    shape = getattr(leaf, "shape", ())
    if not shape:
        return P()

    def divisible(idx_range):
        return [
            (shape[idx], idx)
            for idx in idx_range
            if shape[idx] % axis_size == 0 and shape[idx] >= axis_size
            and shape[idx] > 1
        ]

    # Skip the leading (layer-stack) dim whenever any later dim can shard:
    # scanned per-layer params must keep all layers local to the scan body.
    # Only a leaf with NO other shardable dim may shard dim 0 (then it is a
    # plain 1D/loner param, not a stack).
    candidates = divisible(range(1, len(shape))) or divisible(range(0, 1))
    if not candidates:
        return P()
    # prefer the largest dim; break ties to the last dim
    _, best = max(candidates, key=lambda t: (t[0], t[1]))
    spec: list[str | None] = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def shard_params(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """Place a param tree on the mesh with FSDP-style sharding over `axis`.

    With axis size 1 this is plain replication.
    """
    axis_size = mesh.shape[axis]

    def place(leaf):
        if axis_size <= 1:
            sharding = NamedSharding(mesh, P())
        else:
            sharding = NamedSharding(mesh, fsdp_spec(leaf, axis, axis_size))
        return jax.device_put(leaf, sharding)

    return jax.tree.map(place, params)


def param_shardings(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """The NamedSharding tree matching shard_params (for jit out_shardings)."""
    axis_size = mesh.shape[axis]

    def spec(leaf):
        if axis_size <= 1:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, fsdp_spec(leaf, axis, axis_size))

    return jax.tree.map(spec, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data-parallel sharding for batched inputs."""
    return NamedSharding(mesh, P("data"))
