"""Smoke tests for the auxiliary CLI tools (subprocess, CPU)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import cv2
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
# NB: the axon site plugin ignores JAX_PLATFORMS; scripts that touch jax
# force CPU themselves via jax.config.update.
ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}


def run_cli(script, *args, timeout=300):
    return subprocess.run(
        [sys.executable, str(REPO / "scripts" / script), *map(str, args)],
        capture_output=True, text=True, timeout=timeout, env=ENV, cwd=str(REPO),
    )


def test_prepare_dataset_manifest(tmp_path):
    d = tmp_path / "clips"
    d.mkdir()
    for name in ("a.mp4", "b.mkv", "skip.txt"):
        (d / name).write_bytes(b"x")
    out = tmp_path / "list.txt"
    res = run_cli("prepare_dataset.py", "--data_dir", d, "--output", out)
    assert res.returncode == 0, res.stderr
    lines = out.read_text().splitlines()
    assert lines == ["clips/a.mp4", "clips/b.mkv"]


def test_convert_frames_to_video(tmp_path):
    clip = tmp_path / "frames" / "clipA"
    clip.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(clip / f"{i:03d}.png"),
                    rng.integers(0, 255, (32, 32, 3), np.uint8))
    out = tmp_path / "videos"
    res = run_cli(
        "convert_frames_to_video.py", "--input_dir", tmp_path / "frames",
        "--output_dir", out, "--manifest", tmp_path / "videos.txt",
    )
    assert res.returncode == 0, res.stderr
    assert (out / "clipA.mp4").exists()
    assert "clipA.mp4" in (tmp_path / "videos.txt").read_text()


def test_eval_external_dry_run(tmp_path):
    pred = tmp_path / "pred"
    pred.mkdir()
    (tmp_path / "DOVER").mkdir()
    # a frame-folder sample exercises the normalize-to-video step
    sub = pred / "clip"
    sub.mkdir()
    for i in range(2):
        cv2.imwrite(str(sub / f"{i:03d}.png"), np.zeros((16, 16, 3), np.uint8))
    res = run_cli(
        "eval_external.py", "dover", "--pred_dir", pred,
        "--tool_dir", tmp_path / "DOVER", "--dry_run",
    )
    assert res.returncode == 0, res.stderr
    assert "exec:" in res.stdout

    # missing checkout -> clear error
    res2 = run_cli(
        "eval_external.py", "vbench", "--pred_dir", pred,
        "--tool_dir", tmp_path / "nope", "--dry_run",
    )
    assert res2.returncode != 0
    assert "checkout not found" in (res2.stdout + res2.stderr)


def test_prepare_sft_ckpt_lora(tmp_path):
    """Package a LoRA checkpoint from an orbax run dir via the CLI."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from dove_tpu.config import tiny_test
    from dove_tpu.train import checkpointing as ckpt
    from dove_tpu.train.lora import init_lora_params

    lora = init_lora_params(jax.random.PRNGKey(0), tiny_test().dit, rank=4)
    run_dir = tmp_path / "run"
    ckpt.save_checkpoint(run_dir, 7, {"trainable": lora, "step": 7})

    out = tmp_path / "packaged"
    res = run_cli(
        "prepare_sft_ckpt.py", "--run_dir", run_dir, "--output_dir", out,
        "--training_type", "lora", "--base_preset", "tiny", "--rank", "4",
    )
    assert res.returncode == 0, res.stderr
    assert (out / "pytorch_lora_weights.safetensors").exists()


def test_bench_tiny_smoke(monkeypatch, capsys):
    """The driver's round-end bench path must always emit a parseable JSON line.

    Runs in-process (conftest already forced the CPU platform; the axon site
    plugin ignores the JAX_PLATFORMS env var in a subprocess).
    """
    import bench

    monkeypatch.setattr(sys, "argv", ["bench.py", "--tiny", "--repeats", "1"])
    bench.main()
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    rec = json.loads(lines[-1])
    assert rec["metric"] == "one_step_4x_vsr_clip_seconds"
    for key in ("value", "unit", "vs_baseline", "detail"):
        assert key in rec
    assert rec["value"] > 0


@pytest.mark.slow
def test_inference_cli_data_parallel_staged(tmp_path, monkeypatch):
    """Full inference CLI with --is_vae_st --data_parallel 2 on the virtual
    CPU mesh: exercises the chunk-parallel staged serving path (and I420
    writer) end to end through main()."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    writer = cv2.VideoWriter(
        str(in_dir / "c.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 8, (16, 16)
    )
    rng = np.random.default_rng(0)
    for i in range(14):
        writer.write(rng.integers(0, 255, (16, 16, 3), np.uint8))
    writer.release()

    sys.path.insert(0, str(REPO / "scripts"))
    import importlib

    inference = importlib.import_module("inference")
    inference.main([
        "--input_dir", str(in_dir),
        "--output_path", str(tmp_path / "out"),
        "--preset", "tiny",
        "--is_vae_st",
        "--chunk_len", "9", "--overlap_t", "4",
        "--data_parallel", "2",
        "--quantize", "int8",
    ])
    out = tmp_path / "out" / "c.mp4"
    assert out.exists()
    cap = cv2.VideoCapture(str(out))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 14
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 64


@pytest.mark.slow  # second staged-mesh compile set (~40 s on this box)
def test_inference_cli_tensor_parallel(tmp_path):
    """Full inference CLI with --is_vae_st --tensor_parallel 2
    --data_parallel 2 on the virtual CPU mesh: hybrid chunk-parallel + TP
    (+ sequence-parallel on the tail chunk group) end to end through
    main(); also pins the flag validation."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    writer = cv2.VideoWriter(
        str(in_dir / "c.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 8, (16, 16)
    )
    rng = np.random.default_rng(1)
    for i in range(14):
        writer.write(rng.integers(0, 255, (16, 16, 3), np.uint8))
    writer.release()

    sys.path.insert(0, str(REPO / "scripts"))
    import importlib

    inference = importlib.import_module("inference")
    with pytest.raises(SystemExit, match="is_vae_st"):
        inference.main([
            "--input_dir", str(in_dir), "--output_path", str(tmp_path / "x"),
            "--preset", "tiny", "--tensor_parallel", "2",
        ])
    inference.main([
        "--input_dir", str(in_dir),
        "--output_path", str(tmp_path / "out"),
        "--preset", "tiny",
        "--is_vae_st",
        "--chunk_len", "9", "--overlap_t", "4",
        "--tensor_parallel", "2", "--data_parallel", "2",
    ])
    out = tmp_path / "out" / "c.mp4"
    assert out.exists()
    cap = cv2.VideoCapture(str(out))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 14
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 64


def test_inference_cli_streaming(tmp_path):
    """Inference CLI with --streaming on + --dec_window_cap: a long clip
    (> one DiT pass) runs the segmented causal-cache path end to end."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    writer = cv2.VideoWriter(
        str(in_dir / "s.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 8, (16, 16)
    )
    rng = np.random.default_rng(1)
    for _ in range(37):
        writer.write(rng.integers(0, 255, (16, 16, 3), np.uint8))
    writer.release()

    sys.path.insert(0, str(REPO / "scripts"))
    import importlib

    inference = importlib.import_module("inference")
    inference.main([
        "--input_dir", str(in_dir),
        "--output_path", str(tmp_path / "out"),
        "--preset", "tiny",
        "--is_vae_st",
        "--streaming", "on",
        "--dec_window_cap", "3", "3",
    ])
    out = tmp_path / "out" / "s.mp4"
    assert out.exists()
    cap = cv2.VideoCapture(str(out))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 37
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 64


def test_save_video_lossless_roundtrip(tmp_path):
    """'lossless' must mean lossless: write -> read -> BIT-identical frames
    (FFV1/mkv in this OpenCV build; reference writes a lossless mkv too,
    /root/reference/inference_script.py:111-189)."""
    from dove_tpu.io import video as video_io

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (4, 48, 64, 3), dtype=np.uint8)
    path = video_io.save_video_lossless(frames, tmp_path / "clip.mkv")
    if path.is_dir():  # PNG fallback build — still bit-exact
        back = (video_io.read_image_folder(path) * 255).round().astype(np.uint8)
    else:
        back = (video_io.read_video_frames(path) * 255).round().astype(np.uint8)
    np.testing.assert_array_equal(back, frames)

    # float input path quantizes once, then round-trips exactly
    f32 = frames.astype(np.float32) / 255.0
    path2 = video_io.save_video_lossless(f32, tmp_path / "clip2.mkv")
    back2 = (video_io.read_video_frames(path2) * 255).round().astype(np.uint8)
    np.testing.assert_array_equal(back2, frames)


def test_int8_drift_report_roundtrip(tmp_path):
    """The drift tool's two-process A/B: bf16 dump then int8 compare, with
    a well-formed JSON report (tiny preset, CPU)."""
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    base = [sys.executable, str(REPO / "scripts" / "int8_drift_report.py"),
            "--cpu", "--preset", "tiny", "--frames", "9",
            "--height", "32", "--width", "32"]
    ref = tmp_path / "bf16.npz"
    calib = tmp_path / "calib.npz"
    r = subprocess.run(
        base + ["--mode", "bf16", "--out", str(ref),
                "--calib_out", str(calib)],
        capture_output=True, text=True, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr
    stats = np.load(calib)
    assert any(k.startswith("decoder.") for k in stats.files)
    assert any(k.startswith("encoder.") for k in stats.files)
    report = tmp_path / "report.json"
    r = subprocess.run(
        base + ["--mode", "int8", "--compare", str(ref),
                "--calib", str(calib), "--report", str(report)],
        capture_output=True, text=True, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr
    rep = json.loads(report.read_text())
    assert set(rep["rel_err"]) == {"enc_moments", "dit_x0"}
    assert rep["equalized"] is True
    assert np.isfinite(rep["end_to_end"]["psnr_rgb_vs_bf16_db"])
    # tiny VAE convs are below the 64-channel quantization threshold, so
    # encode is exact (the calib stats match no quantized conv either);
    # the DiT quantizes and must drift only slightly
    assert rep["rel_err"]["enc_moments"] == 0.0
    assert 0 < rep["rel_err"]["dit_x0"] < 0.05
