"""End-to-end training smoke tests on the tiny config (CPU, synthetic data).

Covers the full stack the reference exercises on GPUs (SURVEY.md §2.3):
dataset + degradation -> loader -> jitted train step (VAE encode -> DiT ->
loss -> grads -> optimizer) -> checkpoint save/rotate/resume -> export.
"""

import json
from pathlib import Path

import cv2
import jax
import numpy as np
import pytest

from dove_tpu.train.args import Args
from dove_tpu.train.trainer import DOVES1Trainer, DOVES2Trainer, get_model_cls

TINY_DEGRADATION = """
degradation_1:
  random_blur:
    params:
      kernel_size: [7]
      kernel_list: ['iso']
      kernel_prob: [1.0]
      sigma_x: [0.2, 1.0]
      sigma_y: [0.2, 1.0]
      rotate_angle: [-3.1416, 3.1416]
      beta_gaussian: [0.5, 4]
      beta_plateau: [1, 2]
  random_resize:
    params:
      resize_mode_prob: [0.2, 0.7, 0.1]
      resize_scale: [0.5, 1.5]
      resize_opt: ['bilinear', 'area', 'bicubic']
      resize_prob: [0.34, 0.33, 0.33]
      is_size_even: True
  random_noise:
    params:
      noise_type: ['gaussian']
      noise_prob: [1.0]
      gaussian_sigma: [1, 10]
      gaussian_gray_noise_prob: 0.4
      poisson_scale: [0.05, 3]
  random_jpeg:
    params:
      quality: [60, 95]
degradation_2:
  random_blur:
    params:
      prob: 0.5
      kernel_size: [7]
      kernel_list: ['iso']
      kernel_prob: [1.0]
      sigma_x: [0.2, 1.0]
      sigma_y: [0.2, 1.0]
      rotate_angle: [-3.1416, 3.1416]
      beta_gaussian: [0.5, 4]
      beta_plateau: [1, 2]
  degradation_with_shuffle:
    degradations:
      -
        -
          type: RandomResize
          params:
            target_size: [8, 8]
            resize_opt: ['bilinear']
            resize_prob: [1.0]
        -
          type: RandomBlur
          params:
            prob: 0.5
            kernel_size: [7]
            kernel_list: ['sinc']
            kernel_prob: [1]
            omega: [1.0472, 3.1416]
degradation_3:
  random_resize:
    params:
      target_size: [8, 8]
      resize_opt: ['bilinear']
      resize_prob: [1.0]
  random_blur:
    params:
      prob: 0.5
      kernel_size: [7]
      kernel_list: ['sinc']
      kernel_prob: [1]
      omega: [1.0472, 3.1416]
"""


def _write_clip(path: Path, frames: int = 9, size: int = 64) -> None:
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), 8, (size, size)
    )
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (size, size, 3), np.uint8)
    for i in range(frames):
        writer.write(np.roll(base, i * 2, axis=1))
    writer.release()


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_data")
    (root / "videos").mkdir()
    for i in range(2):
        _write_clip(root / "videos" / f"clip{i}.mp4")
    (root / "videos.txt").write_text("videos/clip0.mp4\nvideos/clip1.mp4\n")
    img = np.random.default_rng(1).integers(0, 255, (64, 64, 3), np.uint8)
    (root / "images").mkdir()
    cv2.imwrite(str(root / "images" / "img0.png"), img)
    (root / "images.txt").write_text("images/img0.png\n")
    (root / "degradation.yaml").write_text(TINY_DEGRADATION)
    return root


def _base_args(data_dir, out_dir, **over):
    kw = dict(
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
        batch_size=2,
        train_steps=2,
        train_epochs=1,
        checkpointing_steps=2,
        mixed_precision="no",
        num_workers=0,
        learning_rate=1e-3,
        lr_warmup_steps=0,
        lr_scheduler="constant",
        stastic_frequency=0,
    )
    kw.update(over)
    return Args(**kw)


def test_registry():
    assert get_model_cls("dove-s1", "lora") is DOVES1Trainer
    assert get_model_cls("dove-s2", "sft") is DOVES2Trainer
    with pytest.raises(ValueError):
        get_model_cls("nope", "lora")


def test_stage1_lora_train_checkpoint_resume(data_dir, tmp_path):
    out = tmp_path / "s1"
    args = _base_args(data_dir, out)
    trainer = DOVES1Trainer(args)
    trainer.fit()
    assert trainer.global_step == 2
    log = (out / "train_log.jsonl").read_text().strip().splitlines()
    rec = json.loads(log[-1])
    assert np.isfinite(rec["loss"]) and rec["grad_norm"] > 0
    assert (out / "checkpoint-2").exists()
    assert (out / "args.yaml").exists()

    # resume continues from step 2
    args2 = _base_args(data_dir, out, train_steps=3)
    trainer2 = DOVES1Trainer(args2)
    trainer2.fit()
    assert trainer2.global_step == 3

    # LoRA export in peft layout
    trainer2.export(out / "export")
    from safetensors import safe_open

    with safe_open(
        str(out / "export" / "pytorch_lora_weights.safetensors"), framework="np"
    ) as fp:
        keys = list(fp.keys())
    assert any("lora_A" in k for k in keys)
    assert any(k.startswith("transformer.transformer_blocks.0.attn1.to_q") for k in keys)


def test_stage1_loss_decreases(data_dir, tmp_path):
    """Repeated steps on ONE fixed batch must reduce the latent MSE — tests
    that gradients actually flow through the jitted step (encode -> LoRA DiT
    -> loss -> optimizer) rather than only being finite."""
    import jax

    args = _base_args(
        data_dir, tmp_path / "s1b", train_steps=12, checkpointing_steps=100,
        learning_rate=5e-3,
    )
    trainer = DOVES1Trainer(args)
    trainer.load_components()
    trainer.prepare_dataset()
    trainer.prepare_optimizer(total_steps=12)
    step_fn = trainer.build_train_step()
    trainer.loader.set_epoch(0)
    batch = trainer._device_batch(next(iter(trainer.loader)))
    frozen = trainer.frozen_params()
    rng = jax.random.PRNGKey(0)
    losses_seen = []
    with trainer.mesh:
        for _ in range(12):
            trainable, trainer.opt_state, loss, aux, gnorm = step_fn(
                trainer.trainable_params(), trainer.opt_state, frozen,
                batch, rng,
            )
            trainer._set_trainable(trainable)
            losses_seen.append(float(loss))
    assert all(np.isfinite(l) for l in losses_seen)
    # rank-4 LoRA at clipped lr moves slowly; require a real, steady descent
    assert losses_seen[-1] < losses_seen[0] - 0.01, (
        f"loss did not decrease on a fixed batch: {losses_seen}"
    )
    assert all(b < a for a, b in zip(losses_seen, losses_seen[1:])), (
        f"loss not monotonically decreasing: {losses_seen}"
    )


def test_stage1_came_optimizer_fit(data_dir, tmp_path):
    """Full fit() with the native CAME optimizer (reference: came_pytorch via
    optimizer_utils.py:138-153) — factored state must survive the jitted
    step, checkpointing, and produce finite decreasing-ish losses."""
    args = _base_args(
        data_dir, tmp_path / "came", optimizer="came", train_steps=3,
        checkpointing_steps=2, learning_rate=1e-3,
    )
    trainer = DOVES1Trainer(args)
    trainer.fit()
    log = [
        json.loads(l)
        for l in (tmp_path / "came" / "train_log.jsonl").read_text().splitlines()
    ]
    steps = [r for r in log if "loss" in r]
    assert steps and all(np.isfinite(r["loss"]) for r in steps)
    assert (tmp_path / "came" / "checkpoint-2").exists()


@pytest.mark.parametrize("opt_name", ["adamw-8bit", "adamw-4bit"])
def test_stage1_low_bit_optimizer_fit(data_dir, tmp_path, opt_name):
    """Full fit() with the quantized-moment optimizers (reference factory's
    bnb `use_8bit` / torchao `use_4bit` branches, optimizer_utils.py:74-105)
    — the packed int8/uint8 state streams must survive the jitted step AND
    orbax checkpointing, with finite losses."""
    out = tmp_path / opt_name
    args = _base_args(
        data_dir, out, optimizer=opt_name, train_steps=3,
        checkpointing_steps=2, learning_rate=1e-3,
    )
    trainer = DOVES1Trainer(args)
    trainer.fit()
    log = [
        json.loads(l)
        for l in (out / "train_log.jsonl").read_text().splitlines()
    ]
    steps = [r for r in log if "loss" in r]
    assert steps and all(np.isfinite(r["loss"]) for r in steps)
    assert (out / "checkpoint-2").exists()
    # resume restores the quantized streams (dtype-exact) and continues
    args2 = _base_args(
        data_dir, out, optimizer=opt_name, train_steps=4,
        checkpointing_steps=2, learning_rate=1e-3,
    )
    trainer2 = DOVES1Trainer(args2)
    trainer2.fit()
    assert trainer2.global_step == 4


def test_stage2_sft_image_video(data_dir, tmp_path):
    out = tmp_path / "s2"
    args = _base_args(
        data_dir, out,
        model_name="dove-s2",
        model_type="real-sr-image-video",
        training_type="sft",
        image_column=data_dir / "images.txt",
        train_resolution=(5, 32, 32),
        train_steps=2,
        image_ratio=0.5,
        dists_weight=0.0,
        frame_diff_weight=1.0,
        batch_size=1,
    )
    trainer = DOVES2Trainer(args)
    trainer.fit()
    assert trainer.global_step == 2
    rec = json.loads(
        (out / "train_log.jsonl").read_text().strip().splitlines()[-1]
    )
    assert np.isfinite(rec["loss"])
    assert "loss_pixel" in rec

    # SFT export produces a diffusers-layout transformer folder
    trainer.export(out / "export")
    exported = list((out / "export" / "transformer").glob("*.safetensors"))
    assert exported


def test_stage1_latent_cache(data_dir, tmp_path):
    """is_latent: first epoch fills the cache, training consumes latents."""
    out = tmp_path / "s1lat"
    args = _base_args(data_dir, out, train_steps=1, is_latent=True)
    trainer = DOVES1Trainer(args)
    trainer.fit()
    cache = list((data_dir / "cache" / "video_latent").rglob("*.safetensors"))
    assert len(cache) == 4  # hq + lq for 2 clips
    rec = json.loads(
        (out / "train_log.jsonl").read_text().strip().splitlines()[-1]
    )
    assert np.isfinite(rec["loss"])


def test_stage2_with_perceptual_loss(data_dir, tmp_path):
    """DISTS perceptual path (random VGG features) + edge-aware variant."""
    out = tmp_path / "s2p"
    args = _base_args(
        data_dir, out,
        model_name="dove-s2",
        model_type="real-sr-image-video",
        training_type="lora",
        image_column=data_dir / "images.txt",
        train_resolution=(5, 32, 32),
        train_steps=1,
        image_ratio=0.0,
        use_perceptual_loss=True,
        allow_random_perceptual=True,  # no pretrained VGG in the test env
        ea_dists_weight=1.0,
        frame_diff_weight=0.5,
        batch_size=1,
    )
    from dove_tpu.train.trainer import DOVES2Trainer

    trainer = DOVES2Trainer(args)
    trainer.fit()
    rec = json.loads(
        (out / "train_log.jsonl").read_text().strip().splitlines()[-1]
    )
    assert np.isfinite(rec["loss"])
    assert "loss_perceptual" in rec


def test_fsdp_fit_and_resume(data_dir, tmp_path):
    """Full Trainer.fit() with fsdp=2 on the virtual 8-CPU mesh (params +
    optimizer state sharded over "model"), then checkpoint resume — the
    end-to-end ZeRO-analog loop, not just the loss/grad functions."""
    import jax

    if len(jax.devices()) < 4:
        import pytest as _pytest

        _pytest.skip("needs the virtual 8-device mesh")
    out = tmp_path / "fsdp"
    args = _base_args(
        data_dir, out, fsdp=2, data_parallel=2, train_steps=2,
        checkpointing_steps=2,
    )
    trainer = DOVES1Trainer(args)
    trainer.fit()
    assert dict(trainer.mesh.shape) == {"data": 2, "model": 2}
    assert trainer.global_step == 2
    # at least one large LoRA leaf is actually sharded over "model"
    sharded = [
        leaf for leaf in jax.tree.leaves(trainer.trainable_params())
        if hasattr(leaf, "sharding") and not leaf.sharding.is_fully_replicated
    ]
    assert sharded, "no trainable leaf is sharded over the model axis"
    assert (out / "checkpoint-2").exists()

    args2 = _base_args(
        data_dir, out, fsdp=2, data_parallel=2, train_steps=4,
        checkpointing_steps=4,
    )
    trainer2 = DOVES1Trainer(args2)
    trainer2.fit()
    assert trainer2.global_step == 4
    rec = json.loads(
        (out / "train_log.jsonl").read_text().strip().splitlines()[-1]
    )
    assert np.isfinite(rec["loss"])


def test_stage2_random_perceptual_requires_optin(data_dir, tmp_path, monkeypatch):
    """Without pretrained DISTS weights the perceptual path must refuse to
    silently train on random VGG features."""
    import pytest as _pytest

    monkeypatch.delenv("DOVE_DISTS_WEIGHTS", raising=False)
    args = _base_args(
        data_dir, tmp_path / "s2gate",
        model_name="dove-s2",
        model_type="real-sr-image-video",
        image_column=data_dir / "images.txt",
        use_perceptual_loss=True,
        dists_weight=1.0,
    )
    trainer = DOVES2Trainer(args)
    with _pytest.raises(RuntimeError, match="allow_random_perceptual"):
        trainer.load_components()


def test_args_validators():
    import pytest as _pytest

    with _pytest.raises(Exception):
        Args(model_path="x", train_resolution="25x321x640")  # H%16
    with _pytest.raises(Exception):
        Args(model_path="x", train_resolution="24x320x640")  # (F-1)%4
    with _pytest.raises(Exception):
        Args(model_path="x", do_validation=True)  # needs validation_dir
    a = Args(model_path="x", train_resolution="25x320x640")
    assert a.train_resolution == (25, 320, 640)


def test_components_state_views(data_dir, tmp_path):
    """Typed Components/State bags (reference schemas/{components,state}.py)
    assemble from live trainer attributes and track the functional truth."""
    args = _base_args(data_dir, tmp_path / "out")
    trainer = get_model_cls("dove-s1", "lora")(args)
    trainer.load_components()

    comps = trainer.components
    assert comps.transformer is trainer.dit_params
    assert comps.vae is trainer.vae_params
    assert comps.scheduler is trainer.schedule
    assert comps.unet is None and comps.tokenizer_2 is None

    st = trainer.state
    assert (st.train_frames, st.train_height, st.train_width) == (5, 32, 32)
    assert st.weight_dtype == trainer.dtype
    assert st.num_trainable_parameters > 0  # LoRA leaves only
    total = sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(trainer.dit_params)
    )
    assert st.num_trainable_parameters < total
    assert st.using_fsdp is False and st.using_deepspeed is False
    assert st.transformer_config["num_layers"] == trainer.config.dit.num_layers


def test_validate_metrics_and_artifacts(data_dir, tmp_path):
    """Trainer.validate: honors eval_metric_list, computes full-reference
    metrics against ref clips AND no-reference metrics on the SR output
    alone, writes per-step artifacts, and logs a summary."""
    import cv2

    val_lq = tmp_path / "val_lq"
    val_gt = tmp_path / "val_gt"
    val_lq.mkdir(); val_gt.mkdir()
    _write_clip(val_lq / "v0.mp4", frames=9, size=16)
    _write_clip(val_gt / "v0.mp4", frames=9, size=64)

    args = _base_args(
        data_dir, tmp_path / "out",
        do_validation=True,
        validation_dir=val_lq,
        validation_ref_videos=str(val_gt),
        eval_metric_list="psnr,ssim,niqe",  # niqe is weights-gated -> warns
    )
    trainer = DOVES1Trainer(args)
    trainer.load_components()
    (tmp_path / "out").mkdir(exist_ok=True)
    # attach the wandb-offline tracker (fit() does this for report_to=wandb)
    from dove_tpu.train.tracking import WandbOfflineRun

    trainer._wandb = WandbOfflineRun(args.output_dir, "VSR", {"rank": 4})
    summary = trainer.validate(step=1)
    assert set(summary) == {"psnr", "ssim"}  # niqe skipped with a warning
    assert all(np.isfinite(v) for v in summary.values())
    out_mp4 = tmp_path / "out" / "validation_res" / "Step-1" / "v0.mp4"
    assert out_mp4.exists()
    cap = cv2.VideoCapture(str(out_mp4))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 9
    # wandb-offline run dir: summary scalars, a video media record in the
    # history, and the copied media file (reference trainer.py:803-843)
    import json as _json

    files = trainer._wandb.files
    trainer._wandb.finish()
    hist = [_json.loads(ln) for ln in
            (files / "wandb-history.jsonl").read_text().splitlines()]
    assert any("validation/psnr" in r for r in hist)
    media = [r for r in hist
             if any(isinstance(v, dict) and v.get("_type") == "video-file"
                    for v in r.values())]
    assert media, "no video media record in wandb history"
    rel = next(v["path"] for v in media[0].values()
               if isinstance(v, dict) and v.get("_type") == "video-file")
    assert (files / rel).exists()
    summary = _json.loads((files / "wandb-summary.json").read_text())
    assert "validation/psnr" in summary
    assert list(files.glob("events.out.tfevents.*")), "no tfevents written"


def test_wandb_offline_tracker_unit(tmp_path):
    """WandbOfflineRun: layout, history schema, config.yaml, finish marker."""
    from dove_tpu.train.tracking import WandbOfflineRun

    run = WandbOfflineRun(tmp_path, "proj", {"lr": 1e-3, "note": "a: b"})
    run.log({"train/loss": 0.5}, step=1)
    run.log({"train/loss": 0.25, "train/grad_norm": 1.0}, step=2)
    run.finish()
    files = run.files
    assert (files / "wandb-metadata.json").exists()
    cfg_text = (files / "config.yaml").read_text()
    assert "wandb_version: 1" in cfg_text and "lr:" in cfg_text
    import json as _json

    hist = [_json.loads(ln) for ln in
            (files / "wandb-history.jsonl").read_text().splitlines()]
    assert [r["_step"] for r in hist] == [1, 2]
    assert all("_runtime" in r and "_timestamp" in r for r in hist)
    summary = _json.loads((files / "wandb-summary.json").read_text())
    assert summary["train/loss"] == 0.25 and summary["_step"] == 2
    assert (run.run_dir / "run-finished").exists()


def test_validate_under_tensor_parallel(data_dir, tmp_path):
    """validate() under tensor_parallel serves over the training mesh (the
    plain forward on TP-sharded params would gather full weights) without
    donating the live training params."""
    val_lq = tmp_path / "val_lq"
    val_lq.mkdir()
    _write_clip(val_lq / "v0.mp4", frames=9, size=16)
    args = _base_args(
        data_dir, tmp_path / "out",
        training_type="sft", tensor_parallel=2, data_parallel=2,
        do_validation=True, validation_dir=val_lq,
        eval_metric_list="psnr",  # full-reference with no refs -> no scores
    )
    trainer = DOVES1Trainer(args)
    trainer.load_components()
    (tmp_path / "out").mkdir(exist_ok=True)
    summary = trainer.validate(step=1)
    assert summary == {}  # psnr needs refs; the serve itself must succeed
    assert (tmp_path / "out" / "validation_res" / "Step-1" / "v0.mp4").exists()
    # training params survived (not donated by the pipeline's mesh placement)
    q = trainer.dit_params["blocks"]["attn1"]["to_q"]["kernel"]
    assert q.sharding.spec[-1] == "model"
    assert np.isfinite(np.asarray(q).sum())  # raises if donated/deleted


def test_use_optical_flow_requires_raft_weights(data_dir, tmp_path):
    """--use_optical_flow loads the frozen RAFT (reference trainer.py:433);
    without a weights file it must fail loudly up front, not mid-epoch."""
    args = _base_args(data_dir, tmp_path / "out", use_optical_flow=True)
    trainer = DOVES1Trainer(args)
    with pytest.raises(FileNotFoundError, match="raft_weights"):
        trainer.load_components()
