"""CLIP towers + CLIP-IQA metric tests (random weights; weights-gated CLI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dove_tpu.eval.clip import (
    CLIPConfig,
    clipiqa_metric,
    encode_image,
    encode_text,
    init_clip_params,
)

TINY = CLIPConfig(
    image_size=32, patch_size=16, vision_width=16, vision_layers=2,
    vision_heads=2, vocab_size=64, context_length=8, text_width=16,
    text_layers=2, text_heads=2, projection_dim=8,
)


@pytest.fixture(scope="module")
def clip_params():
    return init_clip_params(jax.random.PRNGKey(0), TINY)


def test_encode_image_shape_and_norm(clip_params):
    imgs = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 3), jnp.float32)
    feats = encode_image(TINY, clip_params, imgs)
    assert feats.shape == (3, 8)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(feats), axis=-1), 1.0, atol=1e-5
    )


def test_encode_text_eot_pooling(clip_params):
    # EOT = highest token id; padding after it must not change the feature
    ids_a = jnp.asarray([[5, 9, 63, 0, 0, 0, 0, 0]], jnp.int32)
    ids_b = jnp.asarray([[5, 9, 63, 1, 2, 3, 1, 2]], jnp.int32)
    fa = encode_text(TINY, clip_params, ids_a)
    fb = encode_text(TINY, clip_params, ids_b)
    assert fa.shape == (1, 8)
    # causal mask: tokens after EOT cannot affect the EOT position
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(fa), axis=-1), 1.0, atol=1e-5
    )


def test_clipiqa_score_math(clip_params):
    """softmax([sim_good, sim_bad]) over unit features lands in (0, 1)."""
    imgs = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3), jnp.float32)
    img_feats = encode_image(TINY, clip_params, imgs)
    text_feats = encode_text(
        TINY, clip_params,
        jnp.asarray([[1, 63, 0, 0, 0, 0, 0, 0], [2, 63, 0, 0, 0, 0, 0, 0]],
                    jnp.int32),
    )
    logits = jnp.exp(clip_params["logit_scale"]) * img_feats @ text_feats.T
    scores = jax.nn.softmax(logits, axis=-1)[:, 0]
    assert scores.shape == (2,)
    assert float(scores.min()) > 0.0 and float(scores.max()) < 1.0


def test_clipiqa_weights_gated(monkeypatch):
    monkeypatch.delenv("DOVE_CLIP_WEIGHTS", raising=False)
    with pytest.raises(NotImplementedError, match="DOVE_CLIP_WEIGHTS"):
        clipiqa_metric()
    from dove_tpu.eval.metrics import get_metric

    with pytest.raises(NotImplementedError, match="DOVE_CLIP_WEIGHTS"):
        get_metric("clipiqa")


# ---------------------------------------------------------------------------
# RN50 backbone (pyiqa clipiqa default)
# ---------------------------------------------------------------------------


def test_rn50_native_resolution_and_norm():
    """Tiny-width RN50 tower: arbitrary (non-multiple-of-32) input sizes
    work (floor-semantics pools) and features are unit-norm."""
    from dove_tpu.eval.clip import encode_image_rn50, init_clip_rn50_params

    params = init_clip_rn50_params(jax.random.PRNGKey(0), width=16)
    out_dim = params["vision"]["attnpool"]["c"]["kernel"].shape[1]
    for shape in [(1, 64, 96, 3), (2, 70, 94, 3)]:
        imgs = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
        feats = encode_image_rn50(params, imgs)
        assert feats.shape == (shape[0], out_dim)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(feats), axis=-1), 1.0, atol=1e-5
        )


def _torch_modified_resnet(width=8):
    """Reference torch ModifiedResNet (OpenAI CLIP visual RN50), tiny width,
    emitting the OpenAI state-dict key layout under `visual.`."""
    import torch
    from torch import nn

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = None
            self.stride = stride
            if stride > 1 or inplanes != planes * 4:
                self.downsample = nn.Sequential(
                    nn.AvgPool2d(stride) if stride > 1 else nn.Identity(),
                    nn.Conv2d(inplanes, planes * 4, 1, stride=1, bias=False),
                    nn.BatchNorm2d(planes * 4),
                )

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.avgpool(out)
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class Visual(nn.Module):
        def __init__(self, layers=(3, 4, 6, 3), width=8):
            super().__init__()
            self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1, bias=False)
            self.bn1 = nn.BatchNorm2d(width // 2)
            self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(width // 2)
            self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
            self.bn3 = nn.BatchNorm2d(width)
            self.avgpool = nn.AvgPool2d(2)
            self.relu = nn.ReLU(inplace=True)
            self._inplanes = width
            self.layer1 = self._make_layer(width, layers[0])
            self.layer2 = self._make_layer(width * 2, layers[1], stride=2)
            self.layer3 = self._make_layer(width * 4, layers[2], stride=2)
            self.layer4 = self._make_layer(width * 8, layers[3], stride=2)

        def _make_layer(self, planes, blocks, stride=1):
            mods = [Bottleneck(self._inplanes, planes, stride)]
            self._inplanes = planes * 4
            for _ in range(1, blocks):
                mods.append(Bottleneck(self._inplanes, planes))
            return nn.Sequential(*mods)

        def forward(self, x):
            x = self.relu(self.bn1(self.conv1(x)))
            x = self.relu(self.bn2(self.conv2(x)))
            x = self.relu(self.bn3(self.conv3(x)))
            x = self.avgpool(x)
            return self.layer4(self.layer3(self.layer2(self.layer1(x))))

    torch.manual_seed(0)
    v = Visual(width=width).eval()
    # randomize BN stats so folding is actually exercised
    for m in v.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1, 0.2)
                m.bias.normal_(0, 0.2)
    return v


def test_rn50_stem_and_bottlenecks_match_torch_oracle():
    """Stem + all bottleneck stages == the OpenAI ModifiedResNet in torch
    (pins BN folding, anti-aliased stride placement, pool semantics)."""
    import torch

    from dove_tpu.eval.clip import (
        RN50_LAYERS, _avgpool, _bn, _bottleneck, _conv2d_nhwc, _fold_bn,
    )

    v = _torch_modified_resnet(width=8)
    sd = {f"visual.{k}": val.detach().numpy() for k, val in v.state_dict().items()}

    def conv(key):
        return jnp.asarray(np.transpose(sd[key], (2, 3, 1, 0)), jnp.float32)

    x_t = torch.randn(1, 3, 46, 62, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        ref = v(x_t).permute(0, 2, 3, 1).numpy()

    x = jnp.asarray(x_t.permute(0, 2, 3, 1).numpy())
    h = jax.nn.relu(_bn(_fold_bn(sd, "visual.bn1"), _conv2d_nhwc(conv("visual.conv1.weight"), x, 2, 1)))
    h = jax.nn.relu(_bn(_fold_bn(sd, "visual.bn2"), _conv2d_nhwc(conv("visual.conv2.weight"), h, pad=1)))
    h = jax.nn.relu(_bn(_fold_bn(sd, "visual.bn3"), _conv2d_nhwc(conv("visual.conv3.weight"), h, pad=1)))
    h = _avgpool(h, 2)
    for li, n_blocks in enumerate(RN50_LAYERS):
        for bi in range(n_blocks):
            pre = f"visual.layer{li + 1}.{bi}"
            blk = {
                "conv1": conv(f"{pre}.conv1.weight"),
                "bn1": _fold_bn(sd, f"{pre}.bn1"),
                "conv2": conv(f"{pre}.conv2.weight"),
                "bn2": _fold_bn(sd, f"{pre}.bn2"),
                "conv3": conv(f"{pre}.conv3.weight"),
                "bn3": _fold_bn(sd, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.1.weight" in sd:
                blk["downsample"] = {
                    "conv": conv(f"{pre}.downsample.1.weight"),
                    "bn": _fold_bn(sd, f"{pre}.downsample.2"),
                }
            h = _bottleneck(blk, h, stride=2 if (li > 0 and bi == 0) else 1)
    np.testing.assert_allclose(np.asarray(h), ref, atol=2e-4)


def test_rn50_attnpool_matches_torch_oracle():
    """Mean-query attention pool (posemb dropped) == torch
    multi_head_attention_forward with query = mean token."""
    import torch

    from dove_tpu.eval.clip import encode_image_rn50, init_clip_rn50_params

    params = init_clip_rn50_params(jax.random.PRNGKey(3), width=16)
    ap = params["vision"]["attnpool"]
    C = 16 * 8 * 4  # width * 8 * expansion
    imgs = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 64, 3), jnp.float32)

    # run our full tower, capture the pre-pool feature map by re-running
    # the conv part manually through the torch oracle path is overkill;
    # instead oracle-test the pool math itself on random tokens.
    tokens = np.asarray(
        jax.random.normal(jax.random.PRNGKey(5), (1, 12, C), jnp.float32)
    )
    x = torch.tensor(np.concatenate([tokens.mean(1, keepdims=True), tokens], 1))
    x = x.permute(1, 0, 2)  # [S, B, C]
    qw = torch.tensor(np.asarray(ap["q"]["kernel"]).T)
    kw = torch.tensor(np.asarray(ap["k"]["kernel"]).T)
    vw = torch.tensor(np.asarray(ap["v"]["kernel"]).T)
    cw = torch.tensor(np.asarray(ap["c"]["kernel"]).T)
    with torch.no_grad():
        ref, _ = torch.nn.functional.multi_head_attention_forward(
            query=x[:1], key=x, value=x,
            embed_dim_to_check=C, num_heads=ap["num_heads"],
            q_proj_weight=qw, k_proj_weight=kw, v_proj_weight=vw,
            in_proj_weight=None, in_proj_bias=torch.cat([
                torch.tensor(np.asarray(ap[n]["bias"])) for n in "qkv"
            ]),
            bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0,
            out_proj_weight=cw, out_proj_bias=torch.tensor(np.asarray(ap["c"]["bias"])),
            use_separate_proj_weight=True, training=False, need_weights=False,
        )
    ref = ref[0].numpy()  # [B, out]

    # ours: replicate the pool piece exactly as encode_image_rn50 does
    from dove_tpu.eval.clip import _linear

    B, S, _ = np.concatenate([tokens.mean(1, keepdims=True), tokens], 1).shape
    toks = jnp.asarray(np.concatenate([tokens.mean(1, keepdims=True), tokens], 1))
    heads = ap["num_heads"]
    hd = C // heads
    q = _linear(ap["q"], toks[:, :1]).reshape(B, 1, heads, hd)
    k = _linear(ap["k"], toks).reshape(B, -1, heads, hd)
    vv = _linear(ap["v"], toks).reshape(B, -1, heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * (hd ** -0.5), k)
    pooled = jnp.einsum(
        "bhqk,bkhd->bqhd", jax.nn.softmax(logits, -1), vv
    ).reshape(B, C)
    ours = np.asarray(_linear(ap["c"], pooled))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
