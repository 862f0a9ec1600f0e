#!/usr/bin/env python
"""Convert folders of frames into videos + manifest.

Reference capability: finetune/scripts/convert_image_to_video_imageio_libx264.py
(PNG folders -> lossless libx264 yuv444p mp4 + txt manifest). This CLI uses
the framework's video writers (lossless when the codec stack allows,
documented fallback otherwise).

    python scripts/convert_frames_to_video.py --input_dir frames_root \
        --output_dir videos --fps 16 [--manifest videos.txt]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_dir", required=True,
                    help="root containing one subfolder of frames per clip")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--fps", type=int, default=16)
    ap.add_argument("--manifest", default=None)
    args = ap.parse_args()

    from dove_tpu.io.video import read_image_folder, save_video

    in_root = Path(args.input_dir)
    out_root = Path(args.output_dir)
    out_root.mkdir(parents=True, exist_ok=True)
    written = []
    for sub in sorted(p for p in in_root.iterdir() if p.is_dir()):
        frames = read_image_folder(sub)
        out_path = out_root / f"{sub.name}.mp4"
        save_video(frames, out_path, fps=args.fps)
        written.append(out_path)
        print(f"{sub.name}: {frames.shape[0]} frames -> {out_path}")
    if args.manifest:
        Path(args.manifest).write_text(
            "".join(f"{p.relative_to(out_root.parent)}\n" for p in written)
        )


if __name__ == "__main__":
    main()
