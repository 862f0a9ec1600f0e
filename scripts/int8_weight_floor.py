#!/usr/bin/env python
"""Weight-rounding floor of the int8 decoder under each synthetic family.

The drift frontier (docs/reports/QUANT_FRONTIER.md) shows the outlier
family capping well below the gaussian one. This tool separates the two
error sources per conv: it synthesizes the SAME decoder weights the drift
runs use (realistic_params, seed 2), quantizes each conv with the SERVING
quantizer (equalization + GPTQ tap rounding from the calib npz), and
reports the per-conv WEIGHT-ONLY relative error — the part of the drift
no activation scheme can remove. If weight error ~= the attribution's
total per-conv error, the family's e2e drift is weight-floor-bound and
the only lever left is more weight bits (or a different stress proxy).

    python scripts/int8_weight_floor.py --weights outlier \
        --calib /tmp/calib_outl2.npz --out docs/reports/quant_frontier/weight_floor_outlier.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="outlier",
                    choices=["gaussian", "outlier"])
    ap.add_argument("--calib", default=None,
                    help="calib npz (equalization amax + #tapcorr); omit "
                         "for the plain RTN quantizer")
    ap.add_argument("--preset", default="cogvideox1.5-5b")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from dove_tpu.config import cogvideox1_5_5b, cogvideox_2b, tiny_test
    from dove_tpu.models.vae import init_vae_params
    from dove_tpu.ops.quant import (
        _quantize_leaf_dict, calib_name, should_quantize_conv,
    )

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from int8_drift_report import realistic_params

    cfg = {"tiny": tiny_test, "cogvideox1.5-5b": cogvideox1_5_5b,
           "cogvideox-2b": cogvideox_2b}[args.preset]()
    shapes = jax.eval_shape(
        lambda k: init_vae_params(k, cfg.vae, jnp.bfloat16),
        jax.random.PRNGKey(0),
    )
    # decoder subtree only (the int8-dit-dec serving half); same seed and
    # per-leaf fold_in enumeration as the drift runs -> identical weights
    params = realistic_params(shapes, seed=2, dtype=jnp.bfloat16,
                              family=args.weights)

    calib = {}
    if args.calib:
        loaded = np.load(args.calib)
        calib = {k: jnp.asarray(loaded[k]) for k in loaded.files}

    rows = {}

    def walk(node, path):
        if isinstance(node, dict):
            if "kernel" in node and should_quantize_conv(node["kernel"]):
                name = calib_name(path)
                if not name.startswith("decoder"):
                    return
                q = _quantize_leaf_dict(
                    node, donate=False, with_ksum=True,
                    calib_amax=calib.get(name),
                    tapcorr=calib.get(f"{name}#tapcorr"),
                )
                w = node["kernel"].astype(jnp.float32)
                if "equalize_inv" in q:
                    # serving compares in the equalized domain: w' = w*d
                    d = 1.0 / q["equalize_inv"]
                    w = w * d.reshape((1,) * (w.ndim - 2) + (-1, 1))
                deq = q["kernel_q"].astype(jnp.float32) * q["kernel_scale"]
                rel = float(jnp.linalg.norm(deq - w) / jnp.linalg.norm(w))
                # OUTPUT-domain floor: with tap Gram H (from the calibrated
                # autocorrelation), a column's expected output error is
                # δᵀHδ and its output energy wᵀHw — the right metric for
                # GPTQ'd weights, which deliberately trade weight-space
                # error for output-space error.
                out_rel = None
                tc = calib.get(f"{name}#tapcorr")
                if tc is not None and w.ndim == 5:
                    cc = np.asarray(tc)
                    r = (cc.shape[0] - 1) // 2
                    kt, kh, kw = w.shape[:3]
                    taps = [(a, b, c) for a in range(kt)
                            for b in range(kh) for c in range(kw)]
                    H = np.array(
                        [[cc[a1 - a2 + r, b1 - b2 + r, c1 - c2 + r]
                          for (a2, b2, c2) in taps]
                         for (a1, b1, c1) in taps], np.float32)
                    T = len(taps)
                    D = np.asarray(deq - w, np.float32).reshape(T, -1)
                    Wf = np.asarray(w, np.float32).reshape(T, -1)
                    num = float(np.einsum("ti,ts,si->", D, H, D))
                    den = float(np.einsum("ti,ts,si->", Wf, H, Wf))
                    out_rel = (num / max(den, 1e-30)) ** 0.5
                rows[name] = {
                    "weight_rel_err": round(rel, 6),
                    "output_rel_err": (round(out_rel, 6)
                                       if out_rel is not None else None),
                }
                return
            for k, v in node.items():
                walk(v, path + (k,))
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, path + (i,))

    walk(params["decoder"], ("decoder",))
    wvals = np.array([r["weight_rel_err"] for r in rows.values()])
    ovals = np.array([r["output_rel_err"] for r in rows.values()
                      if r["output_rel_err"] is not None])
    out = {
        "weights_family": args.weights,
        "quantizer": ("equalized + GPTQ tap rounding (serving)"
                      if args.calib else "plain RTN per-channel"),
        "metric": "per-conv weight-only error in the (equalized) domain "
                  "the conv serves in; output_rel_err uses the calibrated "
                  "tap Gram (sqrt(dHd/wHw)) — the error no activation "
                  "scheme can remove",
        "mean_weight_rel_err": round(float(wvals.mean()), 6),
        "median_weight_rel_err": round(float(np.median(wvals)), 6),
        "mean_output_rel_err": (round(float(ovals.mean()), 6)
                                if len(ovals) else None),
        "median_output_rel_err": (round(float(np.median(ovals)), 6)
                                  if len(ovals) else None),
        "per_conv": rows,
    }
    print(json.dumps({k: v for k, v in out.items() if k != "per_conv"},
                     indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
