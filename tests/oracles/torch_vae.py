"""Torch oracle: CogVideoX 3D causal VAE (AutoencoderKLCogVideoX semantics).

Written from the published diffusers model description (the model family the
reference loads at /root/reference/inference_script.py:613 and
finetune/models/dove/lora_one_s1_trainer.py:41-45), NOT from dove_tpu — it is
the independent side of the parity check. Module/attribute names deliberately
mirror the diffusers state-dict layout so ``dove_tpu.weights.convert_vae``
consumes ``model.state_dict()`` unchanged.

Semantics captured (all load-bearing for parity):
  * causal 3D conv: temporal pad = first frame repeated (k_t - 1) times (the
    "first" pad mode the checkpoints use), zero spatial pad, per-call
    conv_cache = last (k_t - 1) pre-pad frames;
  * encoder down blocks: GroupNorm resnets, 2D stride-2 downsample conv with
    asymmetric (0,1,0,1) pad, temporal avg-pool (first frame kept intact when
    the count is odd) on the first log2(temporal_ratio) blocks;
  * decoder up blocks: SpatialNorm3D (GroupNorm modulated by a nearest-resized
    zq = the raw latent), nearest 2x upsample (first-frame split on odd
    counts), per-frame 3x3 conv;
  * encoder/decoder conv_in/mid/norm_out/conv_out ordering.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn


class CausalConv3d(nn.Module):
    """3D conv, causal in time: pad front with the first frame repeated."""

    def __init__(self, cin: int, cout: int, kernel: int | tuple[int, int, int],
                 stride: int = 1, dilation: int = 1):
        super().__init__()
        if isinstance(kernel, int):
            kernel = (kernel, kernel, kernel)
        kt, kh, kw = kernel
        self.time_kernel_size = kt
        self.height_pad = kh // 2
        self.width_pad = kw // 2
        self.conv = nn.Conv3d(cin, cout, kernel, stride=stride, dilation=dilation)
        # streaming mode: the frame-sliced encode/decode (diffusers
        # AutoencoderKLCogVideoX._encode/_decode conv_cache threading) —
        # each chunk consumes the previous chunk's tail frames
        self.streaming = False
        self.stream_cache: torch.Tensor | None = None

    def forward(self, x: torch.Tensor, cache: torch.Tensor | None = None):
        kt = self.time_kernel_size
        if cache is None and self.streaming:
            cache = self.stream_cache
        if kt > 1:
            lead = [cache] if cache is not None else [x[:, :, :1]] * (kt - 1)
            x = torch.cat(lead + [x], dim=2)
        new_cache = x[:, :, -(kt - 1):].clone() if kt > 1 else None
        if self.streaming:
            self.stream_cache = new_cache
        x = F.pad(x, (self.width_pad, self.width_pad,
                      self.height_pad, self.height_pad))
        return self.conv(x), new_cache


class SpatialNorm3D(nn.Module):
    """GroupNorm modulated by conv projections of a nearest-resized zq."""

    def __init__(self, f_channels: int, zq_channels: int, groups: int):
        super().__init__()
        self.norm_layer = nn.GroupNorm(groups, f_channels, eps=1e-6, affine=True)
        self.conv_y = CausalConv3d(zq_channels, f_channels, 1)
        self.conv_b = CausalConv3d(zq_channels, f_channels, 1)

    def forward(self, f: torch.Tensor, zq: torch.Tensor):
        if f.shape[2] > 1 and f.shape[2] % 2 == 1:
            f_first, f_rest = f[:, :, :1], f[:, :, 1:]
            z_first, z_rest = zq[:, :, :1], zq[:, :, 1:]
            z_first = F.interpolate(z_first, size=f_first.shape[-3:])
            z_rest = F.interpolate(z_rest, size=f_rest.shape[-3:])
            zq = torch.cat([z_first, z_rest], dim=2)
        else:
            zq = F.interpolate(zq, size=f.shape[-3:])
        conv_y, _ = self.conv_y(zq)
        conv_b, _ = self.conv_b(zq)
        return self.norm_layer(f) * conv_y + conv_b


class ResnetBlock3D(nn.Module):
    def __init__(self, cin: int, cout: int, groups: int, eps: float,
                 zq_channels: int | None = None):
        super().__init__()
        self.in_channels, self.out_channels = cin, cout
        if zq_channels is None:
            self.norm1 = nn.GroupNorm(groups, cin, eps=eps, affine=True)
            self.norm2 = nn.GroupNorm(groups, cout, eps=eps, affine=True)
        else:
            self.norm1 = SpatialNorm3D(cin, zq_channels, groups)
            self.norm2 = SpatialNorm3D(cout, zq_channels, groups)
        self.conv1 = CausalConv3d(cin, cout, 3)
        self.conv2 = CausalConv3d(cout, cout, 3)
        if cin != cout:
            # 1x1x1 plain conv shortcut (state-dict key: conv_shortcut.weight)
            self.conv_shortcut = nn.Conv3d(cin, cout, 1)

    def forward(self, x: torch.Tensor, zq: torch.Tensor | None = None):
        h = self.norm1(x) if zq is None else self.norm1(x, zq)
        h = F.silu(h)
        h, _ = self.conv1(h)
        h = self.norm2(h) if zq is None else self.norm2(h, zq)
        h = F.silu(h)
        h, _ = self.conv2(h)
        if self.in_channels != self.out_channels:
            x = self.conv_shortcut(x)
        return x + h


class Downsample3D(nn.Module):
    """Optional temporal 2x avg-pool (odd: first frame kept) + spatial
    stride-2 conv with (0,1,0,1) zero pad."""

    def __init__(self, channels: int, compress_time: bool):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, stride=2, padding=0)
        self.compress_time = compress_time

    def forward(self, x: torch.Tensor):
        if self.compress_time:
            b, c, f, h, w = x.shape
            flat = x.permute(0, 3, 4, 1, 2).reshape(b * h * w, c, f)
            if f % 2 == 1:
                first, rest = flat[..., 0], flat[..., 1:]
                if rest.shape[-1] > 0:
                    rest = F.avg_pool1d(rest, kernel_size=2, stride=2)
                flat = torch.cat([first[..., None], rest], dim=-1)
            else:
                flat = F.avg_pool1d(flat, kernel_size=2, stride=2)
            x = flat.reshape(b, h, w, c, -1).permute(0, 3, 4, 1, 2)
        x = F.pad(x, (0, 1, 0, 1))
        b, c, f, h, w = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w)
        x = self.conv(x)
        return x.reshape(b, f, x.shape[1], x.shape[2], x.shape[3]).permute(
            0, 2, 1, 3, 4)


class Upsample3D(nn.Module):
    """Nearest 2x upsample (temporal too if compress_time; odd counts keep the
    first frame un-duplicated) + per-frame 3x3 conv."""

    def __init__(self, channels: int, compress_time: bool):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, stride=1, padding=1)
        self.compress_time = compress_time

    def forward(self, x: torch.Tensor):
        if self.compress_time:
            if x.shape[2] > 1 and x.shape[2] % 2 == 1:
                first, rest = x[:, :, 0], x[:, :, 1:]
                first = F.interpolate(first, scale_factor=2.0)  # [B,C,H,W]
                rest = F.interpolate(rest, scale_factor=2.0)    # [B,C,F-1,H,W]
                x = torch.cat([first[:, :, None], rest], dim=2)
            elif x.shape[2] > 1:
                x = F.interpolate(x, scale_factor=2.0)
            else:
                x = F.interpolate(x.squeeze(2), scale_factor=2.0)[:, :, None]
        else:
            b, c, f, h, w = x.shape
            flat = x.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w)
            flat = F.interpolate(flat, scale_factor=2.0)
            x = flat.reshape(b, f, c, *flat.shape[2:]).permute(0, 2, 1, 3, 4)
        b, c, f, h, w = x.shape
        flat = x.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w)
        flat = self.conv(flat)
        return flat.reshape(b, f, *flat.shape[1:]).permute(0, 2, 1, 3, 4)


class DownBlock3D(nn.Module):
    def __init__(self, cin: int, cout: int, num_layers: int, groups: int,
                 eps: float, add_downsample: bool, compress_time: bool):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock3D(cin if j == 0 else cout, cout, groups, eps)
             for j in range(num_layers)]
        )
        if add_downsample:
            self.downsamplers = nn.ModuleList([Downsample3D(cout, compress_time)])
        else:
            self.downsamplers = None

    def forward(self, x: torch.Tensor):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class MidBlock3D(nn.Module):
    def __init__(self, channels: int, groups: int, eps: float,
                 zq_channels: int | None):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock3D(channels, channels, groups, eps, zq_channels)
             for _ in range(2)]
        )

    def forward(self, x: torch.Tensor, zq: torch.Tensor | None = None):
        for r in self.resnets:
            x = r(x, zq)
        return x


class UpBlock3D(nn.Module):
    def __init__(self, cin: int, cout: int, num_layers: int, groups: int,
                 eps: float, zq_channels: int, add_upsample: bool,
                 compress_time: bool):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock3D(cin if j == 0 else cout, cout, groups, eps,
                           zq_channels)
             for j in range(num_layers)]
        )
        if add_upsample:
            self.upsamplers = nn.ModuleList([Upsample3D(cout, compress_time)])
        else:
            self.upsamplers = None

    def forward(self, x: torch.Tensor, zq: torch.Tensor):
        for r in self.resnets:
            x = r(x, zq)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class Encoder3D(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        ch = list(cfg.block_out_channels)
        groups, eps = cfg.norm_num_groups, cfg.norm_eps
        level = cfg.temporal_compress_level
        self.conv_in = CausalConv3d(cfg.in_channels, ch[0], 3)
        blocks = []
        out_c = ch[0]
        for i in range(len(ch)):
            in_c, out_c = out_c, ch[i]
            blocks.append(DownBlock3D(
                in_c, out_c, cfg.layers_per_block, groups, eps,
                add_downsample=i < len(ch) - 1, compress_time=i < level))
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = MidBlock3D(ch[-1], groups, eps, None)
        self.norm_out = nn.GroupNorm(groups, ch[-1], eps=eps, affine=True)
        self.conv_out = CausalConv3d(ch[-1], 2 * cfg.latent_channels, 3)

    def forward(self, x: torch.Tensor):
        x, _ = self.conv_in(x)
        for b in self.down_blocks:
            x = b(x)
        x = self.mid_block(x)
        x = F.silu(self.norm_out(x))
        x, _ = self.conv_out(x)
        return x


class Decoder3D(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        ch = list(reversed(cfg.block_out_channels))
        groups, eps = cfg.norm_num_groups, cfg.norm_eps
        level = cfg.temporal_compress_level
        zq = cfg.latent_channels
        self.conv_in = CausalConv3d(zq, ch[0], 3)
        self.mid_block = MidBlock3D(ch[0], groups, eps, zq)
        blocks = []
        out_c = ch[0]
        for i in range(len(ch)):
            in_c, out_c = out_c, ch[i]
            blocks.append(UpBlock3D(
                in_c, out_c, cfg.layers_per_block + 1, groups, eps, zq,
                add_upsample=i < len(ch) - 1, compress_time=i < level))
        self.up_blocks = nn.ModuleList(blocks)
        self.norm_out = SpatialNorm3D(ch[-1], zq, groups)
        self.conv_out = CausalConv3d(ch[-1], cfg.out_channels, 3)

    def forward(self, z: torch.Tensor):
        x, _ = self.conv_in(z)
        x = self.mid_block(x, z)
        for b in self.up_blocks:
            x = b(x, z)
        x = F.silu(self.norm_out(x, z))
        x, _ = self.conv_out(x)
        return x


class AutoencoderKLCogVideoX(nn.Module):
    """Encode -> raw moments [B, 2C, F', h, w]; decode raw latents -> pixels.

    No quant_conv (the CogVideoX checkpoints set use_quant_conv=False); no
    scaling_factor anywhere (the parity fixtures exchange RAW latents,
    matching scripts/parity_dump_torch.py's taps).
    """

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.encoder = Encoder3D(cfg)
        self.decoder = Decoder3D(cfg)

    def _frame_sliced(self, module: nn.Module, x: torch.Tensor,
                      frame_batch_size: int) -> torch.Tensor:
        """diffusers AutoencoderKLCogVideoX._encode/_decode frame batching:
        chunks of frame_batch_size along time (the remainder rides with the
        FIRST chunk), CausalConv3d caches threaded across chunks. GroupNorm
        statistics and the shape-driven temporal up/downsample rules apply
        PER CHUNK — chunked is the reference semantic, not an approximation
        of the unchunked pass."""
        num_frames = x.shape[2]
        num_batches = max(num_frames // frame_batch_size, 1)
        rem = num_frames % frame_batch_size
        for m in module.modules():
            if isinstance(m, CausalConv3d):
                m.streaming, m.stream_cache = True, None
        try:
            outs = []
            for i in range(num_batches):
                start = frame_batch_size * i + (0 if i == 0 else rem)
                end = frame_batch_size * (i + 1) + rem
                outs.append(module(x[:, :, start:end]))
            return outs[0] if len(outs) == 1 else torch.cat(outs, dim=2)
        finally:
            for m in module.modules():
                if isinstance(m, CausalConv3d):
                    m.streaming, m.stream_cache = False, None

    def encode(self, video: torch.Tensor) -> torch.Tensor:
        return self._frame_sliced(self.encoder, video,
                                  self.cfg.sample_frames_batch_size)

    def decode(self, latent: torch.Tensor) -> torch.Tensor:
        return self._frame_sliced(self.decoder, latent,
                                  self.cfg.latent_frames_batch_size)
