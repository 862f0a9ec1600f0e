"""T5 encoder parity vs HuggingFace transformers (torch CPU oracle)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dove_tpu.models.t5 import (
    T5Config,
    convert_t5,
    init_t5_params,
    t5_encode,
    t5_tiny,
)


def test_t5_forward_shapes():
    cfg = t5_tiny()
    params = init_t5_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.array([[3, 5, 7, 1, 0, 0]], jnp.int32)
    mask = jnp.array([[1, 1, 1, 1, 0, 0]], jnp.int32)
    out = t5_encode(params, cfg, ids, mask)
    assert out.shape == (1, 6, cfg.d_model)
    # masked positions are zeroed (reference CogVideoX convention)
    assert float(jnp.abs(out[0, 4:]).max()) == 0.0


def test_t5_parity_vs_transformers():
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFConfig
    from transformers.models.t5.modeling_t5 import T5EncoderModel

    hf_cfg = HFConfig(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, feed_forward_proj="gated-gelu", is_encoder_decoder=False,
        use_cache=False, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = T5EncoderModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    cfg = t5_tiny()
    params = convert_t5(sd, cfg, jnp.float32)

    ids = np.array([[3, 5, 7, 11, 2, 1]], np.int64)
    mask = np.ones_like(ids)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    ours = np.asarray(
        t5_encode(params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask))
    )
    np.testing.assert_allclose(ours, ref, atol=2e-4)
