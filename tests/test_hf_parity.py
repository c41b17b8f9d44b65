"""Cross-framework SigLIP parity: our JAX towers vs HuggingFace
``transformers.SiglipModel`` (the reference implementation of the
google/siglip-so400m-patch14-384 layout that ``load_hf_siglip`` maps).

The real checkpoint is not available offline, so we instantiate a tiny
random-init HF model locally, save its state_dict in the checkpoint
layout, load it through ``load_hf_siglip``, and require the two
frameworks to agree within float tolerance. This exercises every
remapping decision the VERDICT flagged as risky — the MAP-head packed
qkv split, the patch-conv flatten order, linear transposes, LN eps,
tanh-gelu — end to end: a wrong mapping produces O(1) differences, not
1e-5 ones.

Reference semantics being matched: clip_server.py:91-123 (OpenCLIP
SigLIP encode+normalize), misc/clip_accursed.py:31-56 (big_vision
SigLIP config/pooling).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from meme_search_engine_tpu.models.siglip import (
    SigLIPConfig,
    encode_image,
    encode_text,
    load_hf_siglip,
)

# tiny geometry: 28px/patch14 -> 2x2=4 patches; dims divisible by heads
IMG, PATCH, WIDTH, DEPTH, HEADS, MLP = 28, 14, 64, 2, 4, 96
VOCAB, TEXT_LEN = 128, 16


@pytest.fixture(scope="module")
def hf_model_and_path(tmp_path_factory):
    cfg = transformers.SiglipConfig(
        vision_config=dict(
            image_size=IMG,
            patch_size=PATCH,
            hidden_size=WIDTH,
            num_hidden_layers=DEPTH,
            num_attention_heads=HEADS,
            intermediate_size=MLP,
        ),
        text_config=dict(
            hidden_size=WIDTH,
            num_hidden_layers=DEPTH,
            num_attention_heads=HEADS,
            intermediate_size=MLP,
            vocab_size=VOCAB,
            max_position_embeddings=TEXT_LEN,
        ),
    )
    torch.manual_seed(0)
    model = transformers.SiglipModel(cfg).eval()
    path = tmp_path_factory.mktemp("hf") / "model.safetensors"
    from safetensors.torch import save_file

    save_file(model.state_dict(), str(path))
    return model, str(path)


@pytest.fixture(scope="module")
def our_params(hf_model_and_path):
    _, path = hf_model_and_path
    cfg = SigLIPConfig(
        image_size=IMG,
        patch_size=PATCH,
        width=WIDTH,
        depth=DEPTH,
        mlp_dim=MLP,
        num_heads=HEADS,
        text_width=WIDTH,
        text_depth=DEPTH,
        text_mlp_dim=MLP,
        text_num_heads=HEADS,
        vocab_size=VOCAB,
        text_len=TEXT_LEN,
        d_emb=WIDTH,
        param_dtype=jnp.float32,
        attn_impl="xla",
    )
    return load_hf_siglip(path, cfg), cfg


def test_image_tower_parity(hf_model_and_path, our_params):
    model, _ = hf_model_and_path
    params, cfg = our_params
    rng = np.random.default_rng(0)
    # preprocessed pixel values in [-1, 1]
    pix = rng.uniform(-1, 1, (3, IMG, IMG, 3)).astype(np.float32)
    with torch.inference_mode():
        hf_out = model.vision_model(
            pixel_values=torch.from_numpy(pix.transpose(0, 3, 1, 2))
        ).pooler_output.numpy()
    ours = np.asarray(
        encode_image(params, jnp.asarray(pix), cfg, normalize=False,
                     preprocessed=True)
    )
    np.testing.assert_allclose(ours, hf_out, rtol=1e-4, atol=1e-4)


def test_text_tower_parity(hf_model_and_path, our_params):
    model, _ = hf_model_and_path
    params, cfg = our_params
    rng = np.random.default_rng(1)
    toks = rng.integers(0, VOCAB, (3, TEXT_LEN)).astype(np.int32)
    with torch.inference_mode():
        hf_out = model.text_model(
            input_ids=torch.from_numpy(toks.astype(np.int64))
        ).pooler_output.numpy()
    ours = np.asarray(
        encode_text(params, jnp.asarray(toks), cfg, normalize=False)
    )
    np.testing.assert_allclose(ours, hf_out, rtol=1e-4, atol=1e-4)


def test_normalized_similarity_parity(hf_model_and_path, our_params):
    """Full contrastive-similarity parity incl. logit scale/bias mapping."""
    model, _ = hf_model_and_path
    params, cfg = our_params
    rng = np.random.default_rng(2)
    pix = rng.uniform(-1, 1, (2, IMG, IMG, 3)).astype(np.float32)
    toks = rng.integers(0, VOCAB, (2, TEXT_LEN)).astype(np.int32)
    with torch.inference_mode():
        out = model(
            input_ids=torch.from_numpy(toks.astype(np.int64)),
            pixel_values=torch.from_numpy(pix.transpose(0, 3, 1, 2)),
        )
        hf_logits = out.logits_per_image.numpy()
    zi = np.asarray(encode_image(params, jnp.asarray(pix), cfg,
                                 preprocessed=True))
    zt = np.asarray(encode_text(params, jnp.asarray(toks), cfg))
    t = float(np.exp(np.asarray(params["t"])))
    b = float(np.asarray(params["b"]))
    ours = zi @ zt.T * t + b
    np.testing.assert_allclose(ours, hf_logits, rtol=1e-4, atol=1e-4)
