"""RAFT optical flow (JAX) — temporal-consistency evaluation backbone.

The reference vendors princeton-vl RAFT (finetune/utils/RAFT/*, SURVEY.md
§2.6) solely to drive the E*warp warping-error metric and a dormant
flow-propagation module. This is a native JAX implementation of the same
architecture (BasicEncoder feature/context nets, all-pairs correlation
pyramid, SepConvGRU update block, convex flow upsampling) with a weight
converter for the published ``raft-things.pth`` checkpoint.

Iterations run under ``lax.scan`` (static shapes, one compiled body);
correlation lookups are gather-free bilinear sampling on the pooled pyramid.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

HIDDEN = 128
CONTEXT = 128
CORR_LEVELS = 4
CORR_RADIUS = 4


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def _conv(p: Params, x: jnp.ndarray, stride: int = 1, padding="SAME") -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _instance_norm(p: Params | None, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Instance norm — or frozen (eval-mode) batch norm when the param dict
    carries running stats. raft-things uses norm_fn='instance' for fnet but
    BatchNorm2d for cnet; normalizing cnet with per-sample spatial stats
    instead of the frozen running stats diverges from the checkpoint."""
    xf = x.astype(jnp.float32)
    if p is not None and "mean" in p:
        y = (xf - p["mean"]) * jax.lax.rsqrt(p["var"] + eps)
        return (y * p["scale"] + p["bias"]).astype(x.dtype)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = xf.var(axis=(1, 2), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if p is not None:
        y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """img: [B, H, W, C]; coords: [B, h, w, 2] (x, y) absolute -> [B, h, w, C].
    Zero padding outside."""
    B, H, W, C = img.shape
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(yi, xi):
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        batch = jnp.arange(B).reshape(B, 1, 1)
        vals = img[batch, yi_c, xi_c]  # [B, h, w, C]
        return vals * valid[..., None].astype(img.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None].astype(img.dtype)
    wy = wy[..., None].astype(img.dtype)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def warp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp img by flow: out(x) = img(x + flow(x)).
    img [B, H, W, C], flow [B, H, W, 2] in pixels."""
    B, H, W, _ = img.shape
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    grid = jnp.stack([xs, ys], axis=-1).astype(flow.dtype)  # [H, W, 2]
    coords = grid[None] + flow
    return bilinear_sample(img, coords)


# ---------------------------------------------------------------------------
# Encoders (BasicEncoder: 1/8 resolution, 256 channels)
# ---------------------------------------------------------------------------

def _res_block(p: Params, x: jnp.ndarray, stride: int, norm: bool) -> jnp.ndarray:
    def n(name, h):
        return _instance_norm(p.get(name), h) if norm else h

    h = jax.nn.relu(n("norm1", _conv(p["conv1"], x, stride)))
    h = jax.nn.relu(n("norm2", _conv(p["conv2"], h)))
    if "downsample" in p:
        x = n("norm3", _conv(p["downsample"], x, stride))
    return jax.nn.relu(x + h)


def encoder_forward(p: Params, x: jnp.ndarray, norm: bool = True) -> jnp.ndarray:
    """x: [B, H, W, 3] in [-1, 1] -> [B, H/8, W/8, 256]."""
    h = jax.nn.relu(_instance_norm(p.get("norm1") if norm else None,
                                   _conv(p["conv1"], x, stride=2)))
    for i, stride in ((1, 1), (2, 2), (3, 2)):
        for j in range(2):
            h = _res_block(p[f"layer{i}"][j], h, stride if j == 0 else 1, norm)
    return _conv(p["conv2"], h)


# ---------------------------------------------------------------------------
# Correlation pyramid
# ---------------------------------------------------------------------------

def corr_pyramid(f1: jnp.ndarray, f2: jnp.ndarray) -> list[jnp.ndarray]:
    """All-pairs correlation, then 2x-avg-pooled pyramid over target dims.
    f1, f2: [B, h, w, D] -> levels of [B*h*w, h_l, w_l, 1]."""
    B, h, w, D = f1.shape
    corr = jnp.einsum(
        "bxyd,buvd->bxyuv", f1.astype(jnp.float32), f2.astype(jnp.float32)
    ) / jnp.sqrt(jnp.asarray(D, jnp.float32))
    corr = corr.reshape(B * h * w, h, w, 1)
    # (corr, scale) pairs: scale only advances when the level actually
    # pooled — a too-small level re-appends unshrunk, and sampling it at
    # coords/2^lvl would read the wrong centers
    pyramid = [(corr, 1.0)]
    scale = 1.0
    for _ in range(CORR_LEVELS - 1):
        if corr.shape[1] >= 2 and corr.shape[2] >= 2:
            corr = jax.lax.reduce_window(
                corr, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
            scale *= 2.0
        pyramid.append((corr, scale))
    return pyramid


def corr_lookup(pyramid: list[jnp.ndarray], coords: jnp.ndarray) -> jnp.ndarray:
    """Sample (2r+1)^2 neighborhoods at each level around coords/2^l.
    coords: [B, h, w, 2] -> [B, h, w, levels*(2r+1)^2]."""
    B, h, w, _ = coords.shape
    r = CORR_RADIUS
    # Window channel order matches princeton-vl's quirk exactly: their
    # delta = stack(meshgrid(dy, dx)) feeds a sampler that reads [..., 0]
    # as x, so channel (i, j) samples (x + d_i, y + d_j) — the FIRST window
    # axis offsets x. Converted convc1 weights consume this channel order;
    # reversing to "natural" (x, y) would transpose the 9x9 window per
    # level and permute the 81 channels under pretrained weights.
    deltas = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-r, r + 1, dtype=jnp.float32),
            jnp.arange(-r, r + 1, dtype=jnp.float32),
            indexing="ij",
        ),
        axis=-1,
    )  # [(2r+1), (2r+1), 2]: deltas[i, j] = (d_i, d_j) -> (x, y) offsets
    out = []
    flat_coords = coords.reshape(B * h * w, 1, 1, 2)
    for corr, scale in pyramid:
        centr = flat_coords / scale
        sample_pts = centr + deltas[None]  # [Bhw, 2r+1, 2r+1, 2]
        vals = bilinear_sample(corr, sample_pts)  # [Bhw, 2r+1, 2r+1, 1]
        out.append(vals.reshape(B, h, w, (2 * r + 1) ** 2))
    return jnp.concatenate(out, axis=-1)


# ---------------------------------------------------------------------------
# Update block (motion encoder + SepConvGRU + heads)
# ---------------------------------------------------------------------------

def _motion_encoder(p: Params, flow: jnp.ndarray, corr: jnp.ndarray) -> jnp.ndarray:
    c = jax.nn.relu(_conv(p["convc1"], corr))
    c = jax.nn.relu(_conv(p["convc2"], c))
    f = jax.nn.relu(_conv(p["convf1"], flow))
    f = jax.nn.relu(_conv(p["convf2"], f))
    h = jax.nn.relu(_conv(p["conv"], jnp.concatenate([c, f], axis=-1)))
    return jnp.concatenate([h, flow], axis=-1)  # 126 + 2 = 128


def _sep_conv_gru(p: Params, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    for axis in ("h", "v"):  # 1x5 then 5x1
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(_conv(p[f"convz_{axis}"], hx))
        r = jax.nn.sigmoid(_conv(p[f"convr_{axis}"], hx))
        q = jnp.tanh(_conv(p[f"convq_{axis}"], jnp.concatenate([r * h, x], axis=-1)))
        h = (1 - z) * h + z * q
    return h


def _upsample_flow(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Convex-combination 8x upsampling. flow [B,h,w,2]; mask [B,h,w,9*64]."""
    B, h, w, _ = flow.shape
    mask = jax.nn.softmax(mask.reshape(B, h, w, 9, 8, 8), axis=3)
    # 3x3 neighborhoods of (8 * flow)
    pads = [(0, 0), (1, 1), (1, 1), (0, 0)]
    fp = jnp.pad(flow * 8.0, pads)
    neigh = jnp.stack(
        [
            fp[:, dy : dy + h, dx : dx + w]
            for dy in range(3)
            for dx in range(3)
        ],
        axis=3,
    )  # [B, h, w, 9, 2]
    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", mask, neigh)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(B, h * 8, w * 8, 2)
    return up


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------

def raft_flow(
    params: Params,
    image1: jnp.ndarray,  # [B, H, W, 3] in [0, 1]
    image2: jnp.ndarray,
    iters: int = 12,
) -> jnp.ndarray:
    """Optical flow image1 -> image2 at full resolution, [B, H, W, 2]."""
    B, H, W, _ = image1.shape
    assert H % 8 == 0 and W % 8 == 0, "RAFT needs H, W divisible by 8"
    x1 = image1 * 2.0 - 1.0
    x2 = image2 * 2.0 - 1.0

    f1 = encoder_forward(params["fnet"], x1)
    f2 = encoder_forward(params["fnet"], x2)
    pyramid = corr_pyramid(f1, f2)

    ctx = encoder_forward(params["cnet"], x1)
    net, inp = jnp.split(ctx, [HIDDEN], axis=-1)
    net = jnp.tanh(net)
    inp = jax.nn.relu(inp)

    h, w = f1.shape[1:3]
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    coords0 = jnp.broadcast_to(
        jnp.stack([xs, ys], axis=-1).astype(jnp.float32)[None], (B, h, w, 2)
    )

    def body(carry, _):
        net, coords1, _mask = carry
        corr = corr_lookup(pyramid, coords1)
        flow = coords1 - coords0
        motion = _motion_encoder(params["update"]["encoder"], flow, corr)
        net2 = _sep_conv_gru(
            params["update"]["gru"], net, jnp.concatenate([inp, motion], axis=-1)
        )
        delta = _conv(
            params["update"]["flow_head"]["conv2"],
            jax.nn.relu(_conv(params["update"]["flow_head"]["conv1"], net2)),
        )
        coords1 = coords1 + delta
        mask = _conv(
            params["update"]["mask"]["conv2"],
            jax.nn.relu(_conv(params["update"]["mask"]["conv1"], net2)),
        ) * 0.25
        # mask rides the carry: only the FINAL iteration's mask is used, and
        # stacking all iters' [B, h, w, 576] masks would materialize
        # iters x that (GBs at 720p batches) just to slice one
        return (net2, coords1, mask), None

    mask0 = jnp.zeros(
        (B, h, w, 9 * 64), f1.dtype
    )
    (net, coords1, mask), _ = jax.lax.scan(
        body, (net, coords0, mask0), None, length=iters
    )
    return _upsample_flow(coords1 - coords0, mask)


def raft_bi(
    params: Params, frames: jnp.ndarray, iters: int = 12, pair_chunk: int = 4
):
    """Bidirectional flow over a clip (reference RAFT_bi, raft_bi.py:19-92):
    frames [F, H, W, 3] in [0,1] -> (flow_fwd [F-1,...], flow_bwd [F-1,...]).

    pair_chunk bounds the all-pairs correlation memory: one 720p pair's
    level-0 corr alone is ~0.8 GB fp32, so batching all F-1 pairs at once
    OOMs on long clips; pairs are independent, chunking is exact."""
    f1 = frames[:-1]
    f2 = frames[1:]
    n = f1.shape[0]
    fwd, bwd = [], []
    for s in range(0, n, max(pair_chunk, 1)):
        e = min(s + max(pair_chunk, 1), n)
        fwd.append(raft_flow(params, f1[s:e], f2[s:e], iters))
        bwd.append(raft_flow(params, f2[s:e], f1[s:e], iters))
    return jnp.concatenate(fwd), jnp.concatenate(bwd)


# ---------------------------------------------------------------------------
# Initialization / torch-checkpoint conversion
# ---------------------------------------------------------------------------

def _init_conv(key, kh, kw, cin, cout, bias=True, dtype=jnp.float32) -> Params:
    k = (2.0 / (kh * kw * cin)) ** 0.5
    p = {"kernel": jax.random.normal(key, (kh, kw, cin, cout), dtype) * k}
    if bias:
        p["bias"] = jnp.zeros((cout,), dtype)
    return p


def _init_in(ch) -> Params:
    return {"scale": jnp.ones((ch,), jnp.float32), "bias": jnp.zeros((ch,), jnp.float32)}


def init_raft_params(key: jax.Array, small_channels: bool = False) -> Params:
    """Random init matching raft-things topology (set small_channels for a
    CPU-testable miniature with the same structure)."""
    div = 4 if small_channels else 1
    c64, c96, c128, c256 = 64 // div, 96 // div, 128 // div, 256 // div
    hidden = HIDDEN // div if small_channels else HIDDEN
    keys = iter(jax.random.split(key, 100))
    nk = lambda: next(keys)

    def encoder(out_ch):
        def block(cin, cout, stride):
            p = {
                "conv1": _init_conv(nk(), 3, 3, cin, cout),
                "norm1": _init_in(cout),
                "conv2": _init_conv(nk(), 3, 3, cout, cout),
                "norm2": _init_in(cout),
            }
            if stride != 1 or cin != cout:
                p["downsample"] = _init_conv(nk(), 1, 1, cin, cout)
                p["norm3"] = _init_in(cout)
            return p

        return {
            "conv1": _init_conv(nk(), 7, 7, 3, c64),
            "norm1": _init_in(c64),
            "layer1": [block(c64, c64, 1), block(c64, c64, 1)],
            "layer2": [block(c64, c96, 2), block(c96, c96, 1)],
            "layer3": [block(c96, c128, 2), block(c128, c128, 1)],
            "conv2": _init_conv(nk(), 1, 1, c128, out_ch),
        }

    corr_ch = CORR_LEVELS * (2 * CORR_RADIUS + 1) ** 2
    me_out = hidden - 2
    gru_in = hidden + hidden  # context + motion features

    def gru_convs():
        p = {}
        for axis, (kh, kw) in (("h", (1, 5)), ("v", (5, 1))):
            for gate in ("z", "r", "q"):
                p[f"conv{gate}_{axis}"] = _init_conv(
                    nk(), kh, kw, hidden + gru_in, hidden
                )
        return p

    return {
        "fnet": encoder(c256),
        "cnet": encoder(hidden + hidden),
        "update": {
            "encoder": {
                "convc1": _init_conv(nk(), 1, 1, corr_ch, c256),
                "convc2": _init_conv(nk(), 3, 3, c256, 192 // div),
                "convf1": _init_conv(nk(), 7, 7, 2, c128),
                "convf2": _init_conv(nk(), 3, 3, c128, c64),
                "conv": _init_conv(nk(), 3, 3, 192 // div + c64, me_out),
            },
            "gru": gru_convs(),
            "flow_head": {
                "conv1": _init_conv(nk(), 3, 3, hidden, c256),
                "conv2": _init_conv(nk(), 3, 3, c256, 2),
            },
            "mask": {
                "conv1": _init_conv(nk(), 3, 3, hidden, c256),
                "conv2": _init_conv(nk(), 1, 1, c256, 64 * 9),
            },
        },
    }


def convert_raft(sd: dict[str, np.ndarray]) -> Params:
    """princeton-vl raft-things.pth state dict -> our tree. torch conv
    [O, I, kH, kW] -> [kH, kW, I, O]; 'module.' prefixes stripped."""
    sd = {k.removeprefix("module."): np.asarray(v) for k, v in sd.items()}

    def conv(prefix):
        p = {"kernel": jnp.asarray(np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0)),
                                   jnp.float32)}
        if f"{prefix}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{prefix}.bias"], jnp.float32)
        return p

    def inorm(prefix):
        if f"{prefix}.weight" not in sd:
            return None
        p = {"scale": jnp.asarray(sd[f"{prefix}.weight"], jnp.float32),
             "bias": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32)}
        if f"{prefix}.running_mean" in sd:
            # cnet is BatchNorm2d in raft-things: keep the frozen running
            # stats (eval-mode affine), don't re-derive per-sample stats
            p["mean"] = jnp.asarray(sd[f"{prefix}.running_mean"], jnp.float32)
            p["var"] = jnp.asarray(sd[f"{prefix}.running_var"], jnp.float32)
        return p

    def encoder(name):
        def block(prefix):
            p = {
                "conv1": conv(f"{prefix}.conv1"),
                "conv2": conv(f"{prefix}.conv2"),
            }
            for i in (1, 2, 3):
                n = inorm(f"{prefix}.norm{i}")
                if n is not None:
                    p[f"norm{i}"] = n
            if f"{prefix}.downsample.0.weight" in sd:
                p["downsample"] = conv(f"{prefix}.downsample.0")
            return p

        enc = {
            "conv1": conv(f"{name}.conv1"),
            "conv2": conv(f"{name}.conv2"),
        }
        n = inorm(f"{name}.norm1")
        if n is not None:
            enc["norm1"] = n
        for i in (1, 2, 3):
            enc[f"layer{i}"] = [block(f"{name}.layer{i}.{j}") for j in range(2)]
        return enc

    gru = {}
    for axis, suffix in (("h", "1"), ("v", "2")):
        for gate in ("z", "r", "q"):
            gru[f"conv{gate}_{axis}"] = conv(
                f"update_block.gru.conv{gate}{suffix}"
            )

    return {
        "fnet": encoder("fnet"),
        "cnet": encoder("cnet"),
        "update": {
            "encoder": {
                k: conv(f"update_block.encoder.{k}")
                for k in ("convc1", "convc2", "convf1", "convf2", "conv")
            },
            "gru": gru,
            "flow_head": {
                "conv1": conv("update_block.flow_head.conv1"),
                "conv2": conv("update_block.flow_head.conv2"),
            },
            "mask": {
                "conv1": conv("update_block.mask.0"),
                "conv2": conv("update_block.mask.2"),
            },
        },
    }


def load_raft(path: str | Path) -> Params:  # noqa: F821
    import torch

    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    return convert_raft({k: v.numpy() for k, v in sd.items()})
