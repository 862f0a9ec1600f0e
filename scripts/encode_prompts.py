#!/usr/bin/env python
"""Build the prompt-embedding cache (T5) used by training and inference.

The reference ships a precomputed empty-prompt embedding
(pretrained_models/prompt_embeddings/e3b0c442....safetensors, SHA-256 of "")
and caches per-prompt embeddings under data_root/cache/prompt_embeddings/
keyed by SHA-256 (reference: real_sr_dataset.py:146-167). This CLI produces
the same files with the JAX T5 encoder:

    python scripts/encode_prompts.py --model_path <ckpt with text_encoder/> \
        --output_dir data/cache/prompt_embeddings [--prompts_file prompts.txt]

With no --prompts_file it encodes just the empty prompt.
"""

from __future__ import annotations

import argparse
import hashlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True,
                    help="checkpoint dir containing text_encoder/ + tokenizer/")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--prompts_file", default=None,
                    help="txt file, one prompt per line")
    ap.add_argument("--max_length", type=int, default=226)
    args = ap.parse_args()

    from safetensors.numpy import save_file

    from dove_tpu.models.t5 import PromptEncoder

    encoder = PromptEncoder(args.model_path, max_length=args.max_length)
    prompts = [""]
    if args.prompts_file:
        prompts += [
            ln.strip() for ln in Path(args.prompts_file).read_text().splitlines()
        ]

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for prompt in dict.fromkeys(prompts):  # dedupe, keep order
        digest = hashlib.sha256(prompt.encode()).hexdigest()
        emb = encoder(prompt)
        save_file(
            {"prompt_embedding": np.ascontiguousarray(emb)},
            str(out_dir / f"{digest}.safetensors"),
        )
        print(f"{digest[:12]}...  {prompt[:60]!r}  -> {emb.shape}")


if __name__ == "__main__":
    main()
