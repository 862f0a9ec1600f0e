"""Worker process for the 2-process CPU-cluster multihost test.

Launched by tests/test_multihost.py with DOVE_COORDINATOR / DOVE_NUM_PROCESSES
/ DOVE_PROCESS_ID and 4 virtual CPU devices per process; runs a full
Trainer.fit() (loader process-sharding -> put_global batches -> collective
train step on the global 4x2 mesh -> orbax multihost checkpoint), printing
every step's global loss so the parent can assert cross-process equality.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

from dove_tpu.parallel.distributed import init_distributed  # noqa: E402


def main() -> None:
    pid, nproc = init_distributed()
    print(f"WORKER {pid}/{nproc} local={jax.local_device_count()} "
          f"global={jax.device_count()}", flush=True)
    assert nproc == 2 and jax.device_count() == 8

    data_dir = Path(sys.argv[1])
    out_dir = Path(sys.argv[2])

    from dove_tpu.train.args import Args
    from dove_tpu.train.trainer import DOVES1Trainer

    args = Args(
        model_path=data_dir / "nonexistent_model",
        model_name="dove-s1",
        base_preset="tiny",
        training_type="lora",
        rank=4,
        lora_alpha=4,
        output_dir=out_dir,
        data_root=data_dir,
        video_column=data_dir / "videos.txt",
        degradation_config=str(data_dir / "degradation.yaml"),
        train_resolution=(5, 32, 32),
        batch_size=4,
        data_parallel=4,
        fsdp=2,
        train_steps=3,
        train_epochs=1,
        checkpointing_steps=3,
        mixed_precision="no",
        num_workers=0,
        learning_rate=1e-3,
        lr_warmup_steps=0,
        lr_scheduler="constant",
        stastic_frequency=0,
        seed=7,
    )

    class Worker(DOVES1Trainer):
        def log_step(self, loss, aux, gnorm, t_start):
            print(f"LOSS {self.global_step} {float(loss):.8f}", flush=True)
            super().log_step(loss, aux, gnorm, t_start)

    trainer = Worker(args)
    trainer.fit()
    print("WORKER DONE", flush=True)


if __name__ == "__main__":
    main()
