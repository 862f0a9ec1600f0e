"""Multi-host (multi-process) support.

The reference scales across hosts with accelerate/torchrun + NCCL
(SURVEY.md §2.7; finetune/trainer.py DDP init). The JAX-native equivalent:
every host runs the same program, ``jax.distributed.initialize`` wires the
processes into one runtime, ``jax.devices()`` becomes the GLOBAL device
list, and the existing ("data", "model") mesh + shardings work unchanged —
XLA routes collectives over ICI within a host and DCN across hosts.

What actually differs from single-host is only the data path:

  * every process builds the SAME global batch order (shared seed), keeps
    its own slice (``PrefetchLoader(process_shard=...)`` — the
    DistributedSampler analog), and
  * global on-device batches assemble from per-process shards via
    ``jax.make_array_from_process_local_data`` (`put_global`).

Launch (per host)::

    DOVE_COORDINATOR=host0:1234 DOVE_NUM_PROCESSES=4 DOVE_PROCESS_ID=<i> \
        python scripts/train.py ...

or on TPU pods just run the script on every worker — ``initialize()`` with
no args autodetects from the TPU metadata (the JAX-recommended path).
"""

from __future__ import annotations

import os

import jax
import numpy as np

_INITIALIZED = False


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> tuple[int, int]:
    """Initialize the multi-process JAX runtime (idempotent).

    Explicit args win; otherwise DOVE_COORDINATOR / DOVE_NUM_PROCESSES /
    DOVE_PROCESS_ID; otherwise, on TPU-pod environments, autodetect. With no
    configuration at all this is a no-op single-process setup.

    Returns (process_index, process_count).
    """
    global _INITIALIZED
    coordinator = coordinator or os.environ.get("DOVE_COORDINATOR")
    if num_processes is None and "DOVE_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["DOVE_NUM_PROCESSES"])
    if process_id is None and "DOVE_PROCESS_ID" in os.environ:
        process_id = int(os.environ["DOVE_PROCESS_ID"])

    if not _INITIALIZED:
        if coordinator or num_processes:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_processes,
                process_id=process_id,
            )
            _INITIALIZED = True
        elif any(
            k in os.environ
            for k in ("TPU_WORKER_HOSTNAMES", "JAX_COORDINATOR_ADDRESS",
                      "MEGASCALE_COORDINATOR_ADDRESS")
        ):
            # TPU pod / GKE: the runtime env carries the topology
            jax.distributed.initialize()
            _INITIALIZED = True
        if _INITIALIZED and jax.process_count() > 1:
            # Eagerly establish the cross-process collective context with a
            # startup sync. Backends create it LAZILY at the first
            # collective with a short peer-exchange timeout (CPU/Gloo:
            # 30 s KV GetKeyValue) — if processes reach their first real
            # collective at very different times (asymmetric compile-cache
            # warmth, skewed data loading), the early one times out
            # (measured on the 2-process CPU cluster test, deterministic
            # with one warm cache). Right after initialize() all processes
            # are within moments of each other, so the sync both dodges
            # that race and fail-fasts on broken connectivity.
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("dove:init_distributed")
    return jax.process_index(), jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def put_global(x: np.ndarray, sharding) -> jax.Array:
    """Assemble a global on-device array from this process's local shard.

    Single-process: a plain device_put. Multi-process: `x` is the LOCAL
    portion of the global batch (the loader's process slice) and the global
    array is built from every process's addressable shards — the JAX analog
    of DDP's per-rank batches.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


