#!/usr/bin/env python
"""DOVE-TPU training entry point.

Mirrors the reference /root/reference/finetune/train.py:11-16:
parse Args -> resolve the registered trainer -> fit().

Example (stage 1, LoRA):
    python scripts/train.py \
        --model_path <cogvideox1.5-5b dir> --model_name dove-s1 \
        --model_type real-sr --training_type lora \
        --data_root data/ --video_column data/HQ-VSR.txt \
        --train_resolution 25x320x640 --batch_size 2 \
        --learning_rate 2e-5 --train_steps 10000
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dove_tpu.train.args import Args
from dove_tpu.train.trainer import get_model_cls


def main() -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    args = Args.parse_args()
    if args.multihost:
        # Multi-host data/model parallelism (the reference's multi-node
        # accelerate/NCCL analog): one process per host, XLA collectives
        # ride ICI within a slice and DCN across slices. Coordinator and
        # process ids come from the TPU runtime environment (GKE/queued
        # resources), the standard JAX_COORDINATOR_* variables, or
        # DOVE_COORDINATOR / DOVE_NUM_PROCESSES / DOVE_PROCESS_ID.
        import jax

        from dove_tpu.parallel.distributed import init_distributed

        init_distributed()
        logging.info(
            "multihost: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    trainer_cls = get_model_cls(args.model_name, args.training_type)
    trainer = trainer_cls(args)
    trainer.fit()


if __name__ == "__main__":
    main()
