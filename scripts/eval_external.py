#!/usr/bin/env python
"""Video-quality evaluation via external toolkits: DOVER, E*warp (RAFT), VBench.

The reference ships three near-identical wrappers
(/root/reference/finetune/scripts/eval_dover.py, eval_ewarp.py,
eval_vbench.py) that (1) normalize inputs — PNG frame folders are converted
to lossless-ish videos first — then (2) shell into an EXTERNAL checkout of
the respective toolkit (none are vendored in the reference either). This CLI
reproduces that workflow:

    python scripts/eval_external.py dover --pred_dir results/UDM10 \
        --tool_dir /path/to/DOVER
    python scripts/eval_external.py ewarp --pred_dir results/UDM10 \
        --tool_dir /path/to/RAFT --ckpt raft-things.pth
    python scripts/eval_external.py vbench --pred_dir results/UDM10 \
        --tool_dir /path/to/VBench

Each subcommand prints the command it runs; with --dry_run it stops there.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def normalize_inputs(pred_dir: Path, work_dir: Path, fps: int) -> Path:
    """Frame folders -> videos (toolkits expect video files)."""
    from dove_tpu.io.video import VIDEO_EXTS, read_image_folder, save_video

    subdirs = [p for p in sorted(pred_dir.iterdir()) if p.is_dir()]
    if not subdirs:
        return pred_dir
    out = work_dir / "videos"
    out.mkdir(parents=True, exist_ok=True)
    for sub in subdirs:
        save_video(read_image_folder(sub), out / f"{sub.name}.mp4", fps=fps)
    for f in sorted(pred_dir.iterdir()):
        if f.suffix.lower() in VIDEO_EXTS:
            (out / f.name).write_bytes(f.read_bytes())
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "tool", choices=["dover", "ewarp", "vbench", "fastervqa"]
    )
    ap.add_argument("--pred_dir", required=True)
    ap.add_argument("--tool_dir", required=True,
                    help="external checkout of DOVER / RAFT / VBench / "
                         "FAST-VQA-and-FasterVQA")
    ap.add_argument("--ckpt", default=None, help="model checkpoint (ewarp)")
    ap.add_argument("--fps", type=int, default=16)
    ap.add_argument("--output", default=None)
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args()

    tool_dir = Path(args.tool_dir)
    if not tool_dir.exists():
        sys.exit(
            f"{args.tool} checkout not found at {tool_dir}; clone the "
            f"upstream toolkit there (the reference uses external checkouts "
            f"for these models as well)"
        )

    with tempfile.TemporaryDirectory() as tmp:
        videos = normalize_inputs(Path(args.pred_dir), Path(tmp), args.fps)
        if args.tool == "dover":
            cmd = [
                sys.executable, "evaluate_a_set_of_videos.py",
                "-in", str(videos),
            ]
        elif args.tool == "ewarp":
            cmd = [
                sys.executable, "ewarp.py", "--video_dir", str(videos),
            ] + (["--model", args.ckpt] if args.ckpt else [])
        elif args.tool == "fastervqa":
            # published DOVE tables report FasterVQA; the reference README
            # leaves its script as a TODO (README.md:264). Upstream
            # FAST-VQA-and-FasterVQA ships a folder runner:
            cmd = [
                sys.executable, "vqa.py", "-d", str(videos),
                "-o", "FasterVQA",
            ]
        else:  # vbench
            cmd = [
                sys.executable, "evaluate.py", "--videos_path", str(videos),
                "--dimension", "temporal_flickering", "motion_smoothness",
            ]
        if args.output:
            cmd += ["--output", str(Path(args.output).resolve())]
        print("exec:", " ".join(cmd), "(cwd:", str(tool_dir) + ")")
        if args.dry_run:
            return
        subprocess.run(cmd, cwd=tool_dir, check=True)


if __name__ == "__main__":
    main()
