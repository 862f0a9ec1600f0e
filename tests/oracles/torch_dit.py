"""Torch oracle: CogVideoX Transformer3D (DiT) + 3D RoPE + sincos pos-embed.

Independent torch re-implementation of the published diffusers
CogVideoXTransformer3DModel semantics (the model the reference calls at
/root/reference/inference_script.py:483-489), used only as the second side of
the parity check. State-dict layout mirrors diffusers so
``dove_tpu.weights.convert_dit`` consumes ``model.state_dict()`` unchanged.

Covers both family variants the reference uses:
  * CogVideoX1.5 style: patch_size_t=2 (linear patch proj), 3D RoPE
    ("slice" grid, the reference's rope prep at inference_script.py:364-392),
    joint text|video norm_final;
  * CogVideoX-2B style: patch_size_t=None (per-frame conv2d patch proj),
    3D sincos positional embedding added to the joint sequence, norm_final
    on video tokens only.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn


# ---------------------------------------------------------------------------
# Rotary embedding (published get_3d_rotary_pos_embed, grid_type="slice")
# ---------------------------------------------------------------------------

def _rotary_1d(dim: int, pos: torch.Tensor, theta: float):
    freqs = 1.0 / (theta ** (torch.arange(0, dim, 2, dtype=torch.float64)[: dim // 2] / dim))
    angles = torch.outer(pos.double(), freqs)
    cos = angles.cos().repeat_interleave(2, dim=1).float()
    sin = angles.sin().repeat_interleave(2, dim=1).float()
    return cos, sin


def get_3d_rotary_pos_embed_slice(
    embed_dim: int, grid_hw: tuple[int, int], temporal_size: int,
    max_size: tuple[int, int], theta: float = 10000.0,
):
    """grid_type="slice": frequencies are computed on the MAX grid then
    sliced to the actual tile grid, so tile positions match the full frame."""
    grid_h, grid_w = grid_hw
    max_h, max_w = max_size
    dim_t = embed_dim // 4
    dim_h = embed_dim // 8 * 3
    dim_w = embed_dim // 8 * 3
    t_cos, t_sin = _rotary_1d(dim_t, torch.arange(temporal_size), theta)
    h_cos, h_sin = _rotary_1d(dim_h, torch.arange(max_h), theta)
    w_cos, w_sin = _rotary_1d(dim_w, torch.arange(max_w), theta)
    h_cos, h_sin = h_cos[:grid_h], h_sin[:grid_h]
    w_cos, w_sin = w_cos[:grid_w], w_sin[:grid_w]

    def combine(ft, fh, fw):
        ft = ft[:, None, None, :].expand(-1, grid_h, grid_w, -1)
        fh = fh[None, :, None, :].expand(temporal_size, -1, grid_w, -1)
        fw = fw[None, None, :, :].expand(temporal_size, grid_h, -1, -1)
        return torch.cat([ft, fh, fw], dim=-1).reshape(
            temporal_size * grid_h * grid_w, -1)

    return combine(t_cos, h_cos, w_cos), combine(t_sin, h_sin, w_sin)


def apply_rotary_emb(x: torch.Tensor, rope) -> torch.Tensor:
    """Interleaved-pair rotation on [B, heads, S, D] with [S, D] cos/sin."""
    cos, sin = rope
    cos, sin = cos[None, None], sin[None, None]
    x_real, x_imag = x.reshape(*x.shape[:-1], -1, 2).unbind(-1)
    x_rot = torch.stack([-x_imag, x_real], dim=-1).flatten(3)
    return (x.float() * cos + x_rot.float() * sin).to(x.dtype)


# ---------------------------------------------------------------------------
# Sincos positional embedding (published get_3d_sincos_pos_embed)
# ---------------------------------------------------------------------------

def _sincos_1d(dim: int, pos: np.ndarray) -> np.ndarray:
    omega = 1.0 / 10000.0 ** (np.arange(dim // 2, dtype=np.float64) / (dim / 2.0))
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_3d_sincos_pos_embed(
    embed_dim: int, spatial_size_wh: tuple[int, int], temporal_size: int,
    spatial_interpolation_scale: float, temporal_interpolation_scale: float,
) -> np.ndarray:
    """[T, H*W, D]; feature order: temporal quarter first, then spatial
    (height-half | width-half within the spatial part)."""
    w_patches, h_patches = spatial_size_wh
    dim_spatial = 3 * embed_dim // 4
    dim_temporal = embed_dim // 4
    grid_h = np.arange(h_patches, dtype=np.float32) / spatial_interpolation_scale
    grid_w = np.arange(w_patches, dtype=np.float32) / spatial_interpolation_scale
    grid = np.meshgrid(grid_w, grid_h)  # w first (published convention)
    grid = np.stack(grid, axis=0).reshape([2, 1, h_patches, w_patches])
    emb_h = _sincos_1d(dim_spatial // 2, grid[0])
    emb_w = _sincos_1d(dim_spatial // 2, grid[1])
    pos_spatial = np.concatenate([emb_h, emb_w], axis=1)  # [H*W, dim_spatial]
    grid_t = np.arange(temporal_size, dtype=np.float32) / temporal_interpolation_scale
    pos_temporal = _sincos_1d(dim_temporal, grid_t)  # [T, dim_temporal]
    pos_spatial = np.repeat(pos_spatial[np.newaxis], temporal_size, axis=0)
    pos_temporal = np.repeat(pos_temporal[:, np.newaxis],
                             h_patches * w_patches, axis=1)
    return np.concatenate([pos_temporal, pos_spatial], axis=-1)


# ---------------------------------------------------------------------------
# Timestep embedding (published get_timestep_embedding, flip_sin_to_cos)
# ---------------------------------------------------------------------------

def timestep_sinusoid(t: torch.Tensor, dim: int, flip_sin_to_cos: bool,
                      freq_shift: float) -> torch.Tensor:
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - freq_shift)
    emb = t[:, None].float() * torch.exp(exponent)[None, :]
    emb = torch.cat([emb.sin(), emb.cos()], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    return emb


# ---------------------------------------------------------------------------
# Modules (attribute names == diffusers state-dict keys)
# ---------------------------------------------------------------------------

class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim: int, time_embed_dim: int):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, time_embed_dim)
        self.linear_2 = nn.Linear(time_embed_dim, time_embed_dim)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        return self.linear_2(F.silu(self.linear_1(x)))


class PatchEmbed(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        dim = cfg.num_attention_heads * cfg.attention_head_dim
        self.patch_size = cfg.patch_size
        self.patch_size_t = cfg.patch_size_t
        if cfg.patch_size_t is None:
            self.proj = nn.Conv2d(cfg.in_channels, dim,
                                  kernel_size=cfg.patch_size,
                                  stride=cfg.patch_size, bias=cfg.patch_bias)
        else:
            self.proj = nn.Linear(
                cfg.in_channels * cfg.patch_size_t * cfg.patch_size ** 2,
                dim, bias=cfg.patch_bias)
        self.text_proj = nn.Linear(cfg.text_embed_dim, dim)

    def forward(self, text_embeds: torch.Tensor, image_embeds: torch.Tensor):
        text_embeds = self.text_proj(text_embeds)
        B, Fr, C, H, W = image_embeds.shape
        p, pt = self.patch_size, self.patch_size_t
        if pt is None:
            flat = image_embeds.reshape(-1, C, H, W)
            flat = self.proj(flat)
            flat = flat.view(B, Fr, *flat.shape[1:])
            flat = flat.flatten(3).transpose(2, 3)  # [B, F, HW/p^2, D]
            image_tokens = flat.flatten(1, 2)
        else:
            x = image_embeds.permute(0, 1, 3, 4, 2)  # [B, F, H, W, C]
            x = x.reshape(B, Fr // pt, pt, H // p, p, W // p, p, C)
            x = x.permute(0, 1, 3, 5, 7, 2, 4, 6).flatten(4, 7).flatten(1, 3)
            image_tokens = self.proj(x)
        return torch.cat([text_embeds, image_tokens], dim=1)


class LayerNormZero(nn.Module):
    """adaLN-zero: LN then (1+scale)*x + shift, with gates, for both streams."""

    def __init__(self, cond_dim: int, dim: int, eps: float, affine: bool):
        super().__init__()
        self.linear = nn.Linear(cond_dim, 6 * dim, bias=True)
        self.norm = nn.LayerNorm(dim, eps=eps, elementwise_affine=affine)

    def forward(self, hidden, encoder, temb):
        shift, scale, gate, e_shift, e_scale, e_gate = self.linear(
            F.silu(temb)).chunk(6, dim=1)
        hidden = self.norm(hidden) * (1 + scale)[:, None] + shift[:, None]
        encoder = self.norm(encoder) * (1 + e_scale)[:, None] + e_shift[:, None]
        return hidden, encoder, gate[:, None], e_gate[:, None]


class Attention(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        dim = cfg.num_attention_heads * cfg.attention_head_dim
        self.heads = cfg.num_attention_heads
        self.head_dim = cfg.attention_head_dim
        bias = cfg.attention_bias
        self.to_q = nn.Linear(dim, dim, bias=bias)
        self.to_k = nn.Linear(dim, dim, bias=bias)
        self.to_v = nn.Linear(dim, dim, bias=bias)
        self.norm_q = nn.LayerNorm(self.head_dim, eps=cfg.qk_norm_eps)
        self.norm_k = nn.LayerNorm(self.head_dim, eps=cfg.qk_norm_eps)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim), nn.Dropout(0.0)])

    def forward(self, hidden, encoder, rope):
        text_len = encoder.shape[1]
        x = torch.cat([encoder, hidden], dim=1)
        B, S, _ = x.shape

        def heads(t):
            return t.view(B, S, self.heads, self.head_dim).transpose(1, 2)

        q = self.norm_q(heads(self.to_q(x)))
        k = self.norm_k(heads(self.to_k(x)))
        v = heads(self.to_v(x))
        if rope is not None:
            q = torch.cat([q[:, :, :text_len],
                           apply_rotary_emb(q[:, :, text_len:], rope)], dim=2)
            k = torch.cat([k[:, :, :text_len],
                           apply_rotary_emb(k[:, :, text_len:], rope)], dim=2)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(B, S, self.heads * self.head_dim)
        out = self.to_out[0](out)
        return out[:, text_len:], out[:, :text_len]


class FeedForward(nn.Module):
    class _GELUProj(nn.Module):
        def __init__(self, d_in, d_out):
            super().__init__()
            self.proj = nn.Linear(d_in, d_out)

        def forward(self, x):
            return F.gelu(self.proj(x), approximate="tanh")

    def __init__(self, dim: int, mult: int):
        super().__init__()
        self.net = nn.ModuleList([
            self._GELUProj(dim, dim * mult),
            nn.Dropout(0.0),
            nn.Linear(dim * mult, dim),
        ])

    def forward(self, x):
        for layer in self.net:
            x = layer(x)
        return x


class Block(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        dim = cfg.num_attention_heads * cfg.attention_head_dim
        self.norm1 = LayerNormZero(cfg.time_embed_dim, dim, cfg.norm_eps,
                                   cfg.norm_elementwise_affine)
        self.attn1 = Attention(cfg)
        self.norm2 = LayerNormZero(cfg.time_embed_dim, dim, cfg.norm_eps,
                                   cfg.norm_elementwise_affine)
        self.ff = FeedForward(dim, cfg.ff_mult)

    def forward(self, hidden, encoder, temb, rope):
        text_len = encoder.shape[1]
        n_h, n_e, gate, e_gate = self.norm1(hidden, encoder, temb)
        a_h, a_e = self.attn1(n_h, n_e, rope)
        hidden = hidden + gate * a_h
        encoder = encoder + e_gate * a_e
        n_h, n_e, gate, e_gate = self.norm2(hidden, encoder, temb)
        ff_out = self.ff(torch.cat([n_e, n_h], dim=1))
        hidden = hidden + gate * ff_out[:, text_len:]
        encoder = encoder + e_gate * ff_out[:, :text_len]
        return hidden, encoder


class AdaLayerNormOut(nn.Module):
    """Final adaLN: chunk order (shift, scale) — chunk_dim=1 convention."""

    def __init__(self, cond_dim: int, dim: int, eps: float, affine: bool):
        super().__init__()
        self.linear = nn.Linear(cond_dim, 2 * dim)
        self.norm = nn.LayerNorm(dim, eps=eps, elementwise_affine=affine)

    def forward(self, x, temb):
        shift, scale = self.linear(F.silu(temb)).chunk(2, dim=1)
        return self.norm(x) * (1 + scale[:, None]) + shift[:, None]


class CogVideoXTransformer3DModel(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        dim = cfg.num_attention_heads * cfg.attention_head_dim
        self.patch_embed = PatchEmbed(cfg)
        self.time_embedding = TimestepEmbedding(dim, cfg.time_embed_dim)
        self.transformer_blocks = nn.ModuleList(
            [Block(cfg) for _ in range(cfg.num_layers)])
        self.norm_final = nn.LayerNorm(dim, eps=cfg.norm_eps,
                                       elementwise_affine=cfg.norm_elementwise_affine)
        self.norm_out = AdaLayerNormOut(cfg.time_embed_dim, dim, cfg.norm_eps,
                                        cfg.norm_elementwise_affine)
        pt = cfg.patch_size_t or 1
        self.proj_out = nn.Linear(dim, pt * cfg.patch_size ** 2 * cfg.out_channels)
        if not cfg.use_rotary_positional_embeddings:
            # sincos pos-embed buffer (NOT in the diffusers state dict:
            # persistent=False there; recomputed here and by convert_dit)
            t_frames = (cfg.sample_frames - 1) // cfg.temporal_compression_ratio + 1
            pos = get_3d_sincos_pos_embed(
                dim, (cfg.sample_width // cfg.patch_size,
                      cfg.sample_height // cfg.patch_size),
                t_frames, cfg.spatial_interpolation_scale,
                cfg.temporal_interpolation_scale)
            pos = torch.from_numpy(pos).flatten(0, 1).float()
            joint = torch.zeros(1, cfg.max_text_seq_length + pos.shape[0],
                                dim)
            joint[:, cfg.max_text_seq_length:] = pos
            self.register_buffer("pos_embedding", joint, persistent=False)

    def forward(self, hidden_states, encoder_hidden_states, timestep,
                image_rotary_emb=None, block0_tap: dict | None = None):
        cfg = self.cfg
        B, Fr, C, H, W = hidden_states.shape
        text_len = encoder_hidden_states.shape[1]
        t_emb = timestep_sinusoid(
            timestep, cfg.num_attention_heads * cfg.attention_head_dim,
            cfg.flip_sin_to_cos, cfg.freq_shift)
        temb = self.time_embedding(t_emb.to(hidden_states.dtype))

        joint = self.patch_embed(encoder_hidden_states, hidden_states)
        if not cfg.use_rotary_positional_embeddings:
            # diffusers CogVideoXPatchEmbed.forward: the registered table
            # is used only at the config's sample grid; any other geometry
            # recomputes the sincos embedding for the ACTUAL grid.
            p = cfg.patch_size
            grid = (Fr, H // p, W // p)
            sample_grid = (
                (cfg.sample_frames - 1) // cfg.temporal_compression_ratio
                + 1,
                cfg.sample_height // p, cfg.sample_width // p,
            )
            if grid == sample_grid:
                joint = joint + self.pos_embedding[:, : joint.shape[1]]
            else:
                pos = get_3d_sincos_pos_embed(
                    joint.shape[-1], (grid[2], grid[1]), grid[0],
                    cfg.spatial_interpolation_scale,
                    cfg.temporal_interpolation_scale)
                pos = torch.from_numpy(pos).flatten(0, 1).float()
                joint = joint.clone()
                joint[:, text_len:] = joint[:, text_len:] + pos
        encoder = joint[:, :text_len]
        hidden = joint[:, text_len:]

        for i, block in enumerate(self.transformer_blocks):
            hidden, encoder = block(hidden, encoder, temb, image_rotary_emb)
            if block0_tap is not None:
                block0_tap[f"hidden_{i}"] = hidden.detach().clone()
                if i == 0:  # legacy key, kept for the geometry-a fixtures
                    block0_tap["hidden"] = hidden.detach().clone()

        if cfg.use_rotary_positional_embeddings:
            joint = self.norm_final(torch.cat([encoder, hidden], dim=1))
            hidden = joint[:, text_len:]
        else:
            hidden = self.norm_final(hidden)
        hidden = self.norm_out(hidden, temb)
        hidden = self.proj_out(hidden)

        p, pt = cfg.patch_size, cfg.patch_size_t
        if pt is None:
            out = hidden.reshape(B, Fr, H // p, W // p, -1, p, p)
            out = out.permute(0, 1, 4, 2, 5, 3, 6).flatten(5, 6).flatten(3, 4)
        else:
            out = hidden.reshape(B, (Fr + pt - 1) // pt, H // p, W // p,
                                 -1, pt, p, p)
            out = (out.permute(0, 1, 5, 4, 2, 6, 3, 7)
                   .flatten(6, 7).flatten(4, 5).flatten(1, 2))
        return out
