"""DOVE training orchestration (TPU-native).

Capability map of the reference Trainer (finetune/trainer.py:76-1046 +
models/dove/lora_one_s{1,2}_trainer.py; SURVEY.md §2.3, §3.2-3.4):

  * stage 1 ("dove-s1"): VAE-encode the paired LQ/HQ clips, one DiT pass at
    t=399, velocity->x0, latent MSE;
  * stage 2 ("dove-s2"): same core, then VAE-decode x0 WITH gradients and a
    pixel MSE + perceptual (DISTS/LPIPS, optionally edge-aware) + temporal
    frame-difference L1 composite; per item a coin flip (image_ratio) trains
    on the image pair instead of the video pair;
  * LoRA or SFT trainable-parameter modes (trainer.py:308-345);
  * gradient accumulation, grad-norm clipping, LR warmup schedules;
  * checkpoint-{step} rotation + resume, run metadata dump;
  * periodic validation: full one-step SR on held-out clips + metrics;
  * loss/lr/grad-norm/memory logging.

TPU-native replacements: accelerate/DeepSpeed/NCCL -> a ("data", "model")
jax mesh; ZeRO -> parameter/optimizer sharding via NamedSharding trees; DDP
all-reduce -> XLA collectives inserted from shardings; the whole train step
(VAE encode -> DiT -> loss -> grads -> optimizer) is ONE jitted function.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import time
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from dove_tpu import config as cfg_mod
from dove_tpu.models import vae as vae_mod
from dove_tpu.models.dit import init_dit_params
from dove_tpu.models.vae import init_vae_params
from dove_tpu.ops.scheduler import Schedule
from dove_tpu.parallel import mesh as mesh_mod
from dove_tpu.train import checkpointing as ckpt_mod
from dove_tpu.train import losses
from dove_tpu.train.args import Args
from dove_tpu.train.lora import apply_lora, init_lora_params
from dove_tpu.train.optim import make_lr_schedule, make_optimizer

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Model registry (reference: finetune/models/utils.py SUPPORTED_MODELS)
# ---------------------------------------------------------------------------

SUPPORTED_MODELS: dict[str, dict[str, type]] = {}


def register(model_name: str, training_type: str, cls: type) -> None:
    SUPPORTED_MODELS.setdefault(model_name, {})[training_type] = cls


def get_model_cls(model_name: str, training_type: str) -> type:
    try:
        return SUPPORTED_MODELS[model_name][training_type]
    except KeyError:
        raise ValueError(
            f"no trainer registered for ({model_name}, {training_type}); "
            f"available: { {k: list(v) for k, v in SUPPORTED_MODELS.items()} }"
        )


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------

class Trainer:
    """Generic fit/train/validate loop; stages override ``compute_loss``."""

    stage: int = 1

    def __init__(self, args: Args, pipeline_config=None):
        self.args = args
        self.dtype = {
            "no": jnp.float32, "bf16": jnp.bfloat16, "fp16": jnp.float16
        }[args.mixed_precision]

        if pipeline_config is not None:
            self.config = pipeline_config
        elif (Path(args.model_path) / "transformer" / "config.json").exists():
            self.config = cfg_mod.pipeline_config_from_pretrained(args.model_path)
        else:  # presets for tests / dry runs
            preset = {
                "cogvideox1.5-5b": cfg_mod.cogvideox1_5_5b,
                "cogvideox-2b": cfg_mod.cogvideox_2b,
                "tiny": cfg_mod.tiny_test,
            }[args.base_preset]
            self.config = preset()
        self.config = dataclasses.replace(
            self.config, sr_noise_step=args.sr_noise_step,
            noise_step=args.noise_step,
        )
        self.schedule = Schedule.create(self.config.scheduler)

        # "model" axis: fsdp (param/opt storage sharding) OR tensor_parallel
        # (Megatron DiT compute sharding, parallel/tp.py) — mutually
        # exclusive by Args validation.
        model_axis = args.fsdp
        if args.tensor_parallel > 1:
            from dove_tpu.parallel.tp import validate_tp

            validate_tp(self.config.dit, args.tensor_parallel)
            model_axis = args.tensor_parallel
        data_axis = args.data_parallel or len(jax.devices()) // model_axis
        if args.batch_size % data_axis:
            if jax.process_count() > 1:
                # folding shrinks the mesh to a device PREFIX, which can
                # exclude every device of a later host and deadlock its
                # collectives — multi-host runs must pick a valid batch
                raise ValueError(
                    f"batch_size {args.batch_size} not divisible by the "
                    f"data axis ({data_axis}) in a multi-host run — choose "
                    "batch_size/data_parallel so the global batch shards "
                    "evenly"
                )
            # fold the data axis down so the global batch shards evenly
            while data_axis > 1 and args.batch_size % data_axis:
                data_axis //= 2
            idle = len(jax.devices()) - data_axis * model_axis
            logger.warning(
                "batch_size %d not divisible by data axis; using data=%d"
                "%s",
                args.batch_size, data_axis,
                f" ({idle} of {len(jax.devices())} devices left IDLE — "
                "pick a divisible batch_size to use them)" if idle > 0 else "",
            )
        self.mesh = mesh_mod.make_mesh(data=data_axis, model=model_axis)
        self._dit_fn = None  # tensor-parallel DiT forward when tp>1
        self.global_step = 0
        self._log_file = None
        self._tb = None  # tensorboard SummaryWriter when report_to asks for it
        self._wandb = None  # WandbOfflineRun when report_to in (wandb, all)
        self.perceptual_fn: Callable | None = None

    # ------------------------------------------------------------------
    # Component loading (reference: load_components / from_pretrained)
    # ------------------------------------------------------------------

    def load_components(self) -> None:
        args = self.args
        model_dir = Path(args.model_path)
        if (model_dir / "transformer").exists():
            from dove_tpu import weights

            self.dit_params = weights.load_dit(model_dir, self.config.dit, self.dtype)
            self.vae_params = weights.load_vae(model_dir, self.config.vae, self.dtype)
        else:
            logger.warning(
                "model_path %s has no checkpoint; using random init", model_dir
            )
            self.dit_params = init_dit_params(
                jax.random.PRNGKey(0), self.config.dit, self.dtype
            )
            self.vae_params = init_vae_params(
                jax.random.PRNGKey(1), self.config.vae, self.dtype
            )

        from dove_tpu.data.datasets import EMPTY_PROMPT_SHA

        # same cache layout the dataset builds (datasets.py) — one source
        # of truth for the empty-prompt file location
        emb_path = (
            Path(args.data_root) / "cache" / args.prompt_cache
            / f"{EMPTY_PROMPT_SHA}.safetensors"
        )
        if args.empty_prompt and emb_path.exists():
            from dove_tpu.weights import load_prompt_embedding

            self.empty_prompt = np.asarray(
                load_prompt_embedding(emb_path, jnp.float32)
            )
        else:
            self.empty_prompt = np.zeros(
                (self.config.dit.max_text_seq_length, self.config.dit.text_embed_dim),
                np.float32,
            )

        # Mesh placement: base DiT weights FSDP-sharded over "model" (ZeRO-3
        # analog; fsdp=1 = replication) — or the Megatron tensor-parallel
        # layout when tensor_parallel>1, in which case every DiT forward in
        # training routes through the shard_map TP wrapper (losses.py's
        # dit_fn hook). The VAE stays FSDP-style either way.
        if args.tensor_parallel > 1:
            from dove_tpu.parallel import tp as tp_mod

            self.dit_params = tp_mod.shard_dit_tp(self.dit_params, self.mesh)
            self._dit_fn = tp_mod.make_tp_dit(
                self.mesh, self.config.dit,
                remat=args.gradient_checkpointing,
            )
        else:
            self.dit_params = mesh_mod.shard_params(
                self.dit_params, self.mesh, "model"
            )
        self.vae_params = mesh_mod.shard_params(self.vae_params, self.mesh, "model")

        if args.training_type == "lora":
            self.lora_params = init_lora_params(
                jax.random.PRNGKey(2), self.config.dit, rank=args.rank,
                dtype=jnp.float32,
            )
            self.lora_params = mesh_mod.shard_params(
                self.lora_params, self.mesh, "model"
            )
            self.lora_scale = args.lora_alpha / args.rank

        # Frozen bidirectional RAFT (reference trainer.py:433-434: built
        # when --use_optical_flow, consumed by nothing in the released
        # recipe — the flow toolkit lives in models/flow_fusion.py).
        self.raft_params = None
        if args.use_optical_flow:
            if not args.raft_weights or not Path(args.raft_weights).exists():
                raise FileNotFoundError(
                    "--use_optical_flow needs --raft_weights pointing at "
                    "raft-things.pth (the reference hardcodes "
                    "utils/RAFT/raft-things.pth and fails the same way)"
                )
            from dove_tpu.models.raft import load_raft

            self.raft_params = load_raft(args.raft_weights)

    # ------------------------------------------------------------------
    # Typed component/state views (reference schemas/components.py,
    # schemas/state.py). Read-only: the live sources of truth are the
    # functional attributes (param trees, Schedule, PRNG key), so the bags
    # are assembled on access rather than stored and kept in sync.
    # ------------------------------------------------------------------

    @property
    def components(self) -> "components_mod.Components":
        from dove_tpu.pipeline import DovePipeline
        from dove_tpu.train import components as components_mod

        return components_mod.Components(
            pipeline_cls=DovePipeline,
            vae=getattr(self, "vae_params", None),
            transformer=getattr(self, "dit_params", None),
            scheduler=self.schedule,
        )

    @property
    def state(self) -> "components_mod.State":
        from dove_tpu.train import components as components_mod

        args = self.args
        f, h, w = args.train_resolution
        n_trainable = 0
        if getattr(self, "dit_params", None) is not None:
            n_trainable = sum(
                int(np.prod(x.shape))
                for x in jax.tree_util.tree_leaves(self.trainable_params())
            )
        val_dir = Path(args.validation_dir) if args.validation_dir else None
        videos = (
            sorted(str(p) for p in val_dir.iterdir()) if val_dir and val_dir.is_dir()
            else []
        )
        return components_mod.State(
            train_frames=f, train_height=h, train_width=w,
            transformer_config=dataclasses.asdict(self.config.dit),
            weight_dtype=self.dtype,
            num_trainable_parameters=n_trainable,
            generator=jax.random.PRNGKey(args.seed or 0),
            validation_videos=videos,
            using_fsdp=args.fsdp > 1,
        )

    # ------------------------------------------------------------------
    # Dataset
    # ------------------------------------------------------------------

    def prepare_dataset(self) -> None:
        from dove_tpu.data.datasets import RealSRDataset, RealSRImageVideoDataset
        from dove_tpu.data.loader import PrefetchLoader

        args = self.args
        F, H, W = args.train_resolution
        common = dict(
            data_root=args.data_root,
            video_manifest=args.video_column,
            max_num_frames=F,
            height=H,
            width=W,
            degradation_config=args.degradation_config,
            caption_manifest=args.caption_column,
            empty_ratio=args.empty_ratio,
            # is_prompt_latent (reference trainer.py:279) forces the prompt-
            # embedding precompute/cache pass even when is_cache is off.
            cache_prompts=args.is_cache or args.is_prompt_latent,
            prompt_cache=args.prompt_cache,
            seed=args.seed or 0,
        )
        if args.is_latent:
            common.update(
                is_latent=True,
                encode_video=self._encode_np,
                model_name=args.model_name,
            )
        if args.model_type == "real-sr":
            self.dataset = RealSRDataset(**common)
        else:
            self.dataset = RealSRImageVideoDataset(
                image_data_root=args.image_data_root,
                image_manifest=args.image_column,
                **common,
            )
        # Multi-host: identical global batch order everywhere (shared seed),
        # each process loads only its slice (parallel/distributed.py).
        self.loader = PrefetchLoader(
            self.dataset,
            batch_size=args.batch_size,
            num_workers=args.num_workers,
            drop_last=True,
            seed=args.seed or 0,
            process_shard=(jax.process_index(), jax.process_count()),
        )

    # ------------------------------------------------------------------
    # Optimizer + jitted train step
    # ------------------------------------------------------------------

    def trainable_params(self):
        if self.args.training_type == "lora":
            return self.lora_params
        return self.dit_params

    def _set_trainable(self, new):
        if self.args.training_type == "lora":
            self.lora_params = new
        else:
            self.dit_params = new

    def prepare_optimizer(self, total_steps: int) -> None:
        args = self.args
        lr = make_lr_schedule(
            args.learning_rate,
            warmup_steps=args.lr_warmup_steps,
            total_steps=total_steps,
            kind=args.lr_scheduler,
            num_cycles=args.lr_num_cycles,
            power=args.lr_power,
        )
        self.optimizer = make_optimizer(
            args.optimizer, lr,
            betas=(args.beta1, args.beta2), beta3=args.beta3, eps=args.epsilon,
            weight_decay=args.weight_decay, max_grad_norm=args.max_grad_norm,
        )
        if args.gradient_accumulation_steps > 1:
            import optax

            self.optimizer = optax.MultiSteps(
                self.optimizer, args.gradient_accumulation_steps
            )
        # optimizer moments shard like their params (ZeRO analog); scalars
        # replicate onto the mesh so every leaf lives on the same devices.
        # SFT under tensor parallelism instead matches moments to the TP
        # param layout so the jitted update never reshards 5B-scale moments
        # against TP-sharded grads (LoRA trainables keep the generic layout
        # — they are small and not TP-sharded).
        if args.tensor_parallel > 1 and args.training_type != "lora":
            from dove_tpu.parallel import tp as tp_mod

            self.opt_state = tp_mod.shard_opt_state_tp(
                self.optimizer.init(self.trainable_params()),
                self.trainable_params(), self.mesh,
            )
        else:
            self.opt_state = mesh_mod.shard_params(
                self.optimizer.init(self.trainable_params()), self.mesh, "model"
            )

    # -- loss core (stage-specific) --

    def frozen_params(self) -> dict[str, Any]:
        """Non-trainable model params passed to the jitted step as EXPLICIT
        (non-donated) arguments — never closure constants, so the 5B-scale
        VAE/base-DiT trees don't get baked into the compiled program (compile
        memory) and keep their mesh shardings under jit."""
        frozen = {"vae": self.vae_params}
        if self.args.training_type == "lora":
            frozen["dit_base"] = self.dit_params
        return frozen

    def effective_dit_params(self, trainable, frozen: dict[str, Any] | None = None):
        if self.args.training_type == "lora":
            base = frozen["dit_base"] if frozen else self.dit_params
            return apply_lora(base, trainable, self.lora_scale)
        return trainable

    def compute_loss(self, trainable, frozen, batch, rng):
        raise NotImplementedError

    def _encode(
        self, vae_params, video: jnp.ndarray, rng, per_frame: bool = False
    ) -> jnp.ndarray:
        """Pixel [B, F, H, W, 3] -> scaled latent [B, F', h, w, C] (no grad).

        per_frame treats each frame as an independent 1-frame clip (stage 2:
        reference lora_one_s2_trainer.py:141-145), so F' == F.
        """
        video = video.astype(self.dtype)
        if per_frame:
            B, F = video.shape[:2]
            video = video.reshape((B * F, 1) + video.shape[2:])
        moments = vae_mod.encode_moments(self.config.vae, vae_params, video)
        lat = vae_mod.sample_latent(moments, rng, self.config.vae.scaling_factor)
        if per_frame:
            lat = lat.reshape((B, F) + lat.shape[2:])
        return jax.lax.stop_gradient(lat)

    def _encode_np(self, frames: np.ndarray) -> np.ndarray:
        """Host helper for the latent precompute pass: [F,H,W,3] -> latent."""
        lat = self._encode(self.vae_params, jnp.asarray(frames[None]), None)
        return np.asarray(lat[0], np.float32)

    def build_train_step(self):
        optimizer = self.optimizer

        def train_step(trainable, opt_state, frozen, batch, rng):
            def loss_fn(p):
                return self.compute_loss(p, frozen, batch, rng)

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable
            )
            updates, opt_state = optimizer.update(grads, opt_state, trainable)
            import optax

            trainable = optax.apply_updates(trainable, updates)
            gnorm = optax.global_norm(grads)
            return trainable, opt_state, loss, aux, gnorm

        return jax.jit(train_step, donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    # Batch -> device
    # ------------------------------------------------------------------

    def _device_batch(self, batch: dict[str, Any]) -> dict[str, jnp.ndarray]:
        from dove_tpu.parallel.distributed import put_global

        bs = mesh_mod.batch_sharding(self.mesh)
        out = {}
        B = next(
            v.shape[0] for v in batch.values() if isinstance(v, np.ndarray)
        )
        embs = batch.get("prompt_embedding")
        if embs is None or any(e is None for e in (embs if isinstance(embs, list) else [])):
            emb = np.broadcast_to(self.empty_prompt[None], (B,) + self.empty_prompt.shape)
        elif isinstance(embs, list):
            emb = np.stack(embs)
        else:
            emb = embs
        out["prompt_embeds"] = put_global(np.asarray(emb, np.float32), bs)
        for k in ("hq_video", "lq_video", "hq_image", "lq_image",
                  "hq_latent", "lq_latent"):
            if k in batch and isinstance(batch[k], np.ndarray):
                out[k] = put_global(batch[k].astype(np.float32), bs)
        return out

    # ------------------------------------------------------------------
    # fit / train
    # ------------------------------------------------------------------

    def fit(self) -> None:
        from dove_tpu.parallel.distributed import is_main_process

        args = self.args
        args.output_dir.mkdir(parents=True, exist_ok=True)
        if is_main_process():
            args.dump_yaml(args.output_dir / "args.yaml")
            self._log_file = open(args.output_dir / "train_log.jsonl", "a")
            # Record WHICH video-compression backend synthesizes the MPEG
            # training artifacts (reference degradation.py:478-558 uses
            # PyAV; the cv2 fallback is a different artifact family —
            # docs/reports/DEGRADATION_BACKEND.json quantifies the gap).
            from dove_tpu.data.degradation import compression_backend

            backend_rec = {"video_compression_backend": compression_backend()}
            logger.info("%s", backend_rec)
            self._log_file.write(json.dumps(backend_rec) + "\n")
            self._log_file.flush()
        if is_main_process() and args.report_to in ("tensorboard", "all"):
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(
                    log_dir=str(args.output_dir / "tb" / args.tracker_name)
                )
            except Exception as e:  # tensorboard backend not installed
                logger.warning("tensorboard writer unavailable (%s); "
                               "falling back to jsonl only", e)
        if is_main_process() and args.report_to in ("wandb", "all"):
            from dove_tpu.train.tracking import WandbOfflineRun

            self._wandb = WandbOfflineRun(
                args.output_dir, project=args.tracker_name,
                config={k: (str(v) if isinstance(v, Path) else v)
                        for k, v in args.model_dump().items()},
            )

        self.load_components()
        self.prepare_dataset()
        steps_per_epoch = max(len(self.loader), 1)
        total_steps = args.train_steps or steps_per_epoch * args.train_epochs
        self.prepare_optimizer(total_steps)
        self.maybe_resume()
        self.train(total_steps, steps_per_epoch)

    def maybe_resume(self) -> None:
        args = self.args
        resume = None
        if args.resume_from_checkpoint:
            resume = (
                int(str(args.resume_from_checkpoint).rsplit("-", 1)[-1]),
                args.resume_from_checkpoint,
            )
        else:
            resume = ckpt_mod.latest_checkpoint(args.output_dir)
        if resume is None:
            return
        step, path = resume
        template = {
            "trainable": self.trainable_params(),
            "opt_state": self.opt_state,
        }
        restored = ckpt_mod.restore_checkpoint(path, template)
        self._set_trainable(restored["trainable"])
        self.opt_state = restored["opt_state"]
        self.global_step = step
        logger.info("resumed from %s at step %d", path, step)

    def train(self, total_steps: int, steps_per_epoch: int) -> None:
        args = self.args
        step_fn = self.build_train_step()
        rng = jax.random.PRNGKey(args.seed or 0)
        t_start = time.time()
        epoch = self.global_step // max(steps_per_epoch, 1)

        # Failure handling: SIGTERM/SIGINT triggers a final checkpoint at the
        # next step boundary (the reference's only fault tolerance is a long
        # NCCL timeout + periodic checkpoints; SURVEY.md §5).
        import signal

        stop_requested = {"flag": False}

        def _request_stop(signum, frame):
            logger.warning("signal %s: will checkpoint and stop", signum)
            stop_requested["flag"] = True

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _request_stop)
            except ValueError:  # non-main thread
                pass

        frozen = self.frozen_params()
        with self.mesh:
            while self.global_step < total_steps and not stop_requested["flag"]:
                self.loader.set_epoch(epoch)
                for batch in self.loader:
                    if self.global_step >= total_steps or stop_requested["flag"]:
                        break
                    # fold_in by step (not sequential splits): a resumed run
                    # at step N reproduces the original run's noise stream.
                    step_rng = jax.random.fold_in(rng, self.global_step)
                    dev_batch = self._device_batch(batch)
                    trainable, self.opt_state, loss, aux, gnorm = step_fn(
                        self.trainable_params(), self.opt_state, frozen,
                        dev_batch, step_rng,
                    )
                    self._set_trainable(trainable)
                    self.global_step += 1

                    # per-step logging, like the reference's accelerator.log
                    # (trainer.py:592-624); JSONL cost is negligible next to
                    # a train step.
                    self.log_step(loss, aux, gnorm, t_start)
                    if args.stastic_frequency and (
                        self.global_step % args.stastic_frequency == 0
                    ):
                        self.log_memory()
                    if self.global_step % args.checkpointing_steps == 0:
                        self.save(self.global_step)
                    if (
                        args.do_validation
                        and args.validation_steps
                        and self.global_step % args.validation_steps == 0
                    ):
                        self.validate(self.global_step)
                epoch += 1

        for sig, handler in old_handlers.items():
            signal.signal(sig, handler)
        self.save(self.global_step)
        if self._log_file:
            self._log_file.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()

    # ------------------------------------------------------------------
    # Logging / checkpoint / validation
    # ------------------------------------------------------------------

    def log_step(self, loss, aux, gnorm, t_start) -> None:
        rec = {
            "step": self.global_step,
            "loss": float(loss),
            "grad_norm": float(gnorm),
            "elapsed_s": round(time.time() - t_start, 1),
        }
        rec.update({k: float(v) for k, v in aux.items()})
        logger.info("%s", rec)
        if self._log_file:
            self._log_file.write(json.dumps(rec) + "\n")
            self._log_file.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if isinstance(v, (int, float)) and k != "step":
                    self._tb.add_scalar(f"train/{k}", v, self.global_step)
        if self._wandb is not None:
            self._wandb.log(
                {f"train/{k}": v for k, v in rec.items()
                 if isinstance(v, (int, float)) and k != "step"},
                self.global_step,
            )

    def log_memory(self) -> None:
        try:
            stats = jax.devices()[0].memory_stats() or {}
            rec = {
                "step": self.global_step,
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            }
            logger.info("memory %s", rec)
            if self._log_file:
                self._log_file.write(json.dumps({"memory": rec}) + "\n")
        except Exception:  # memory_stats unsupported on some backends
            pass

    def save(self, step: int) -> None:
        from dove_tpu.parallel.distributed import is_main_process

        state = {
            "trainable": self.trainable_params(),
            "opt_state": self.opt_state,
        }
        # orbax save is COLLECTIVE in multi-host (every process contributes
        # its addressable shards); only rotation is main-process-only.
        path = ckpt_mod.save_checkpoint(
            self.args.output_dir, step, state,
            limit=self.args.checkpointing_limit if is_main_process() else None,
        )
        logger.info("saved checkpoint %s", path)

    def export(self, out_dir: str | Path) -> None:
        """Deployable export (prepare_sft_ckpt / LoRA weights analog)."""
        if self.args.training_type == "lora":
            ckpt_mod.export_lora_safetensors(
                self.lora_params, Path(out_dir) / "pytorch_lora_weights.safetensors"
            )
        else:
            ckpt_mod.export_dit_safetensors(
                self.dit_params, Path(out_dir) / "transformer",
                patch_size_t=self.config.dit.patch_size_t,
                base_config=(
                    Path(self.args.model_path) / "transformer" / "config.json"
                    if (Path(self.args.model_path) / "transformer" / "config.json").exists()
                    else None
                ),
            )

    def validate(self, step: int) -> dict[str, float]:
        """One-step SR on held-out clips + metrics (reference trainer.py:642-871).

        Honors ``eval_metric_list``: psnr/ssim natively; lpips/dists/
        clipiqa/niqe/maniqa when their exported weights are available (like
        the reference's pyiqa nets). Full-reference metrics need ref clips;
        no-reference metrics score the SR output alone. Clips round-robin
        over hosts (the reference round-robins ranks, trainer.py:683-686);
        each host writes its own artifacts and the summary combines
        (sum, count) across hosts.
        """
        args = self.args
        if not args.validation_dir:
            return {}
        from dove_tpu.eval.metrics import get_metric
        from dove_tpu.io import video as video_io
        from dove_tpu.pipeline import DovePipeline

        metric_names = [
            m.strip() for m in (args.eval_metric_list or "psnr,ssim").split(",")
            if m.strip()
        ]
        metric_fns = {}
        for name in metric_names:
            try:
                metric_fns[name] = get_metric(name)
            except NotImplementedError as e:  # weights-gated, keep training
                logger.warning("validation metric %s unavailable: %s", name, e)
            # an UNKNOWN metric name (ValueError with the available list)
            # propagates — a typo must not soft-fail into missing numbers

        # Under tensor parallelism, serve validation over the training mesh
        # (staged path required): the plain forward on TP-sharded 5B params
        # would all-gather full weights per device — OOM on exactly the
        # configs TP exists for. donate_weights=False is REQUIRED: the
        # pipeline aliases the live training params.
        # (single-process only: the serving path device_puts host arrays,
        # which needs every mesh device addressable)
        tp_mode = self._dit_fn is not None and jax.process_count() == 1
        # DovePipeline flips the process-global Pallas-conv serving switch
        # on TPU (models/vae.py:set_pallas_conv); a train-step retrace
        # after validation must NOT pick it up (decode-with-grad cannot
        # differentiate the Pallas call) — restore it when done.
        from dove_tpu.models import vae as _vae_mod

        _prior_pallas = _vae_mod._PALLAS_BF16_CONV
        pipe = DovePipeline(
            config=self.config,
            dit_params=self.effective_dit_params(self.trainable_params()),
            vae_params=self.vae_params,
            prompt_embedding=jnp.asarray(self.empty_prompt, self.dtype),
            dtype=self.dtype,
            donate_input=False,
            donate_weights=False,
            # --is_vae_st-style validation (forced under TP: the mesh
            # serving path is staged-only)
            vae_tiling=self.args.enable_tiling or tp_mode,
        )
        serve_mesh = self.mesh if tp_mode else None
        out_dir = Path(args.output_dir) / "validation_res" / f"Step-{step}"
        out_dir.mkdir(parents=True, exist_ok=True)

        lq_dir = Path(args.validation_dir)
        ref_dir = Path(args.validation_ref_videos) if args.validation_ref_videos else None
        results: dict[str, list[float]] = {k: [] for k in metric_fns}
        clips = sorted(
            p for p in lq_dir.iterdir()
            if p.suffix.lower() in video_io.VIDEO_EXTS or p.is_dir()
        )
        # Round-robin clips across hosts (multi-host data-parallel analog of
        # the reference's per-rank round-robin).
        clips = clips[jax.process_index()::jax.process_count()]
        from dove_tpu.eval.metrics import FULL_REFERENCE

        try:
            for clip in clips:
                frames = video_io.load_sequence(clip)
                sr = pipe.process_frames(frames, mesh=serve_mesh)
                artifact = out_dir / f"{clip.stem}.mp4"
                video_io.save_video(sr, artifact, fps=args.gen_fps)
                if self._wandb is not None:
                    # media record analog of the reference's wandb.Video
                    # validation logging (trainer.py:803-843)
                    self._wandb.log_video(
                        f"validation/{clip.stem}", artifact, step
                    )
                ref = None
                if ref_dir is not None and (ref_dir / clip.name).exists():
                    ref = video_io.load_sequence(ref_dir / clip.name)
                for name, fn in metric_fns.items():
                    if name in FULL_REFERENCE:
                        if ref is None:
                            continue
                        n = min(len(ref), len(sr))
                        h = min(ref.shape[1], sr.shape[1])
                        w = min(ref.shape[2], sr.shape[2])
                        val = fn(sr[:n, :h, :w], ref[:n, :h, :w])
                    else:  # no-reference metrics score the SR clip alone
                        val = fn(sr)
                    results[name].append(float(val))
        finally:
            _vae_mod.set_pallas_conv(_prior_pallas)
        # Multi-host: every process computed a different clip shard — combine
        # (sum, count) across hosts so the logged numbers cover the full set.
        # Fixed-shape collective over every REQUESTED metric name (not just
        # the ones that built here: a metric whose weights exist on only
        # some hosts must not change the collective's shape — it rides along
        # with zero count).
        names = sorted(metric_names)
        results = {n: results.get(n, []) for n in names}
        sums = np.asarray(
            [float(np.sum(results[n])) if results[n] else 0.0 for n in names]
        )
        cnts = np.asarray([float(len(results[n])) for n in names])
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            gathered = multihost_utils.process_allgather(
                np.stack([sums, cnts])
            )  # [n_proc, 2, n_metrics]
            sums, cnts = gathered.sum(axis=0)
        summary = {
            n: float(s / c) for n, s, c in zip(names, sums, cnts) if c > 0
        }
        rec = {"step": step, "validation": summary}
        logger.info("%s", rec)
        if self._log_file:
            self._log_file.write(json.dumps(rec) + "\n")
            self._log_file.flush()
        if self._tb is not None:
            for k, v in summary.items():
                self._tb.add_scalar(f"validation/{k}", v, step)
        if self._wandb is not None:
            self._wandb.log(
                {f"validation/{k}": v for k, v in summary.items()}, step)
        return summary


# ---------------------------------------------------------------------------
# Stage trainers
# ---------------------------------------------------------------------------

class DOVES1Trainer(Trainer):
    """Stage 1: latent-space MSE (reference lora_one_s1_trainer.py:116-209)."""

    stage = 1

    def compute_loss(self, trainable, frozen, batch, rng):
        enc_rng, fwd_rng = jax.random.split(rng)
        dit = self.effective_dit_params(trainable, frozen)
        if "lq_latent" in batch:  # is_latent: precomputed/cached latents
            lq_lat = batch["lq_latent"]
            hq_lat = batch["hq_latent"]
        else:
            lq_lat = self._encode(frozen["vae"], batch["lq_video"], enc_rng)
            hq_lat = self._encode(
                frozen["vae"], batch["hq_video"], jax.random.fold_in(enc_rng, 1)
            )
        loss_batch = {
            "lq_latent": lq_lat,
            "hq_latent": hq_lat,
            "prompt_embeds": batch["prompt_embeds"],
        }
        return losses.stage1_loss(
            self.config, self.schedule, dit, loss_batch, fwd_rng,
            remat=self.args.gradient_checkpointing, dit_fn=self._dit_fn,
        )


class DOVES2Trainer(Trainer):
    """Stage 2: pixel-space composite loss (reference lora_one_s2_trainer.py)."""

    stage = 2

    def load_components(self) -> None:
        super().load_components()
        a = self.args
        weights_on = any(
            w > 0 for w in (a.dists_weight, a.ea_dists_weight,
                            a.lpips_weight, a.ea_lpips_weight)
        )
        if a.use_perceptual_loss and not weights_on:
            logger.warning(
                "use_perceptual_loss=True but every perceptual weight is 0 "
                "— the term contributes nothing (set e.g. --dists_weight)"
            )
        if a.use_perceptual_loss or weights_on:
            import os

            if a.ea_dists_weight > 0 or a.dists_weight > 0:
                kind, edge = "dists", a.ea_dists_weight > 0
                wpath = os.environ.get("DOVE_DISTS_WEIGHTS")
            else:
                kind, edge = "lpips", a.ea_lpips_weight > 0
                wpath = os.environ.get("DOVE_LPIPS_WEIGHTS")
            if not wpath and not a.allow_random_perceptual:
                raise RuntimeError(
                    f"stage-2 perceptual loss requested but no pretrained "
                    f"{kind} weights found (set DOVE_{kind.upper()}_WEIGHTS). "
                    "A run that silently optimizes random-VGG feature "
                    "distance is almost never what you want; pass "
                    "--allow_random_perceptual true to opt in explicitly."
                )
            if not wpath:
                logger.warning(
                    "allow_random_perceptual: using RANDOM %s/VGG features "
                    "(set DOVE_%s_WEIGHTS for the published recipe)",
                    kind, kind.upper(),
                )
            self.perceptual_fn = losses.make_perceptual_fn(
                kind, edge_aware=edge, weights_path=wpath or None
            )

    def build_train_step(self):
        base = super().build_train_step()
        image_ratio = self.args.image_ratio
        seed = self.args.seed or 0

        def step(trainable, opt_state, frozen, batch, rng):
            # image-vs-video coin flip happens host-side per batch
            # (reference lora_one_s2_trainer.py:125). Keyed on (seed, step)
            # rather than a sequential host RNG so a resumed run reproduces
            # the original image/video decision sequence.
            use_image = (
                "hq_image" in batch
                and np.random.default_rng((seed, self.global_step)).uniform()
                < image_ratio
            )
            if use_image:
                batch = {
                    **batch,
                    "hq_video": batch["hq_image"],
                    "lq_video": batch["lq_image"],
                }
            batch = {k: v for k, v in batch.items()
                     if k in ("hq_video", "lq_video", "prompt_embeds")}
            return base(trainable, opt_state, frozen, batch, rng)

        return step

    def compute_loss(self, trainable, frozen, batch, rng):
        enc_rng, fwd_rng = jax.random.split(rng)
        dit = self.effective_dit_params(trainable, frozen)
        lq_lat = self._encode(frozen["vae"], batch["lq_video"], enc_rng, per_frame=True)
        loss_batch = {
            "lq_latent": lq_lat,
            "hq_video": batch["hq_video"],
            "prompt_embeds": batch["prompt_embeds"],
        }
        a = self.args
        # the reference activates exactly ONE perceptual term by elif
        # precedence (lora_one_s2_trainer.py:245-277: ea_dists > dists >
        # ea_lpips > lpips) — summing all four weights would silently scale
        # the single built metric by the weights of metrics never computed
        perceptual_weight = next(
            (w for w in (a.ea_dists_weight, a.dists_weight,
                         a.ea_lpips_weight, a.lpips_weight) if w > 0),
            0.0,
        )
        return losses.stage2_loss(
            self.config, self.schedule, dit, frozen["vae"], loss_batch, fwd_rng,
            pixel_weight=1.0,
            perceptual_weight=perceptual_weight,
            frame_diff_weight=a.frame_diff_weight,
            perceptual_fn=self.perceptual_fn,
            remat=a.gradient_checkpointing, dit_fn=self._dit_fn,
        )


for _name, _cls in (("dove-s1", DOVES1Trainer), ("dove-s2", DOVES2Trainer)):
    register(_name, "lora", _cls)
    register(_name, "sft", _cls)  # SFT = same math, whole-DiT trainable
