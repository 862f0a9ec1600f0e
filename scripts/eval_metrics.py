#!/usr/bin/env python
"""Standalone IQA metric CLI.

Mirrors the reference /root/reference/eval_metrics.py surface: match pred/GT
samples by filename stem, crop to common resolution (top-left or center),
compute full-reference (psnr/ssim/lpips/dists) and no-reference metrics
(clipiqa via DOVE_CLIP_WEIGHTS, niqe via DOVE_NIQE_PARAMS) per sample,
write per-sample + average JSON.

    python scripts/eval_metrics.py --pred_dir results/UDM10 \
        --gt_dir datasets/UDM10/GT --metrics psnr,ssim \
        --output results/UDM10_metrics.json

Learned metrics need exported weight files (see dove_tpu/eval/lpips.py).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))



def collect_samples(root: Path) -> dict[str, Path]:
    """Map stem -> video file or frame folder."""
    from dove_tpu.io.video import VIDEO_EXTS

    out: dict[str, Path] = {}
    for p in sorted(root.iterdir()):
        if p.is_dir():
            out[p.name] = p
        elif p.suffix.lower() in VIDEO_EXTS:
            out[p.stem] = p
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred_dir", required=True)
    ap.add_argument("--gt_dir", default=None)
    ap.add_argument("--metrics", default="psnr,ssim")
    ap.add_argument("--match_mode", default="top-left",
                    choices=["top-left", "center"])
    ap.add_argument("--crop_border", type=int, default=0)
    ap.add_argument("--test_y_channel", action="store_true",
                    help="PSNR on the Y channel instead of RGB")
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    from dove_tpu.eval.metrics import (
        FULL_REFERENCE,
        MetricAccumulator,
        match_resolution,
        psnr_y,
    )
    from dove_tpu.io.video import load_sequence

    names = [m.strip() for m in args.metrics.split(",") if m.strip()]
    acc = MetricAccumulator(names)
    if args.test_y_channel and "psnr" in acc.names:
        acc._fns["psnr"] = psnr_y

    preds = collect_samples(Path(args.pred_dir))
    gts = collect_samples(Path(args.gt_dir)) if args.gt_dir else {}
    needs_gt = any(m in FULL_REFERENCE for m in acc.names)

    for stem, pred_path in preds.items():
        gt_path = gts.get(stem)
        if needs_gt and gt_path is None:
            print(f"skip {stem}: no GT match", file=sys.stderr)
            continue
        pred = load_sequence(pred_path)
        gt = load_sequence(gt_path) if gt_path is not None else None
        if gt is not None:
            pred, gt = match_resolution(pred, gt, args.match_mode)
            if args.crop_border:
                b = args.crop_border
                pred = pred[:, b:-b, b:-b]
                gt = gt[:, b:-b, b:-b]
        vals = acc.add(stem, pred, gt)
        print(stem, {k: round(v, 4) for k, v in vals.items()})

    summary = acc.summary()
    summary["per_sample_names"] = acc.sample_names
    print(json.dumps(summary["average"], indent=2))
    if args.output:
        Path(args.output).parent.mkdir(parents=True, exist_ok=True)
        Path(args.output).write_text(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
