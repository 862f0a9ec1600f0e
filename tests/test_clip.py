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
