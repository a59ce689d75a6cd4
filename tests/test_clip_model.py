"""CLIP tower correctness.

The strongest check is numerical parity: instantiate the reference torch CLIP
(from the read-only reference checkout, when present) with random weights,
ingest its state_dict through ``convert_torch_state_dict``, and require
encode_image/encode_text to agree to float32 tolerance. Uses tiny tower
configs so it runs on the single-core CPU test environment.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_gp_tpu.models.clip_loader import (
    convert_torch_state_dict,
    init_clip_params,
    load_params_npz,
    save_params_npz,
)
from clip_gp_tpu.models.clip_model import (
    ClipArchitecture,
    causal_mask,
    encode_image,
    encode_text,
)

REFERENCE = Path("/root/reference")
needs_reference = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)

TINY_VIT = ClipArchitecture(
    name="tiny-vit", embed_dim=32, image_resolution=32, vision_layers=2,
    vision_width=64, vision_patch_size=8, context_length=77,
    vocab_size=49408, transformer_width=64, transformer_heads=1,
    transformer_layers=2,
)
TINY_RN = ClipArchitecture(
    name="tiny-rn", embed_dim=32, image_resolution=64,
    vision_layers=(1, 1, 1, 1), vision_width=8, vision_patch_size=None,
    context_length=77, vocab_size=49408, transformer_width=64,
    transformer_heads=1, transformer_layers=2,
)


def _rand_images(arch, n=2, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.normal(size=(n, arch.image_resolution, arch.image_resolution, 3))
        .astype(np.float32)
    )


def _rand_tokens(n=2, seed=0):
    from clip_gp_tpu.models.tokenizer import tokenize

    prompts = ["a photo of a cat.", "a blurry photo of a dog, a type of pet."]
    return jnp.asarray(tokenize(prompts[:n]))


@pytest.mark.parametrize("arch", [TINY_VIT, TINY_RN], ids=["vit", "rn"])
def test_shapes_random_init(arch):
    params = init_clip_params(jax.random.key(0), arch)
    img_feats = encode_image(params, arch, _rand_images(arch))
    assert img_feats.shape == (2, arch.embed_dim)
    assert np.isfinite(np.asarray(img_feats)).all()
    txt_feats = encode_text(params, arch, _rand_tokens())
    assert txt_feats.shape == (2, arch.embed_dim)
    assert np.isfinite(np.asarray(txt_feats)).all()


def test_causal_mask():
    m = np.asarray(causal_mask(4))
    assert (np.triu(np.ones((4, 4)), 1) == np.isinf(m)).all()


def _build_reference_clip(arch):
    """Instantiate the reference torch CLIP with matching architecture."""
    import importlib.util

    import torch

    # Load clip/model.py directly (the package __init__ needs torchvision,
    # which this environment doesn't have).
    spec = importlib.util.spec_from_file_location(
        "_reference_clip_model", REFERENCE / "clip" / "model.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    TorchCLIP = mod.CLIP
    torch.manual_seed(0)
    model = TorchCLIP(
        embed_dim=arch.embed_dim,
        image_resolution=arch.image_resolution,
        vision_layers=arch.vision_layers
        if not arch.is_vit
        else int(arch.vision_layers),
        vision_width=arch.vision_width,
        vision_patch_size=arch.vision_patch_size,
        context_length=arch.context_length,
        vocab_size=arch.vocab_size,
        transformer_width=arch.transformer_width,
        transformer_heads=arch.transformer_heads,
        transformer_layers=arch.transformer_layers,
    ).float().eval()
    return model


@needs_reference
@pytest.mark.parametrize("arch", [TINY_VIT, TINY_RN], ids=["vit", "rn"])
def test_parity_with_torch_reference(arch):
    import torch

    model = _build_reference_clip(arch)
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    inferred_arch, params = convert_torch_state_dict(sd)
    assert inferred_arch.embed_dim == arch.embed_dim
    assert inferred_arch.transformer_layers == arch.transformer_layers

    images = _rand_images(arch)
    tokens = _rand_tokens()

    with torch.no_grad():
        torch_img = model.encode_image(
            torch.tensor(np.asarray(images)).permute(0, 3, 1, 2)
        ).numpy()
        torch_txt = model.encode_text(
            torch.tensor(np.asarray(tokens), dtype=torch.long)
        ).numpy()

    jax_img = np.asarray(encode_image(params, inferred_arch, images))
    jax_txt = np.asarray(encode_text(params, inferred_arch, tokens))

    scale_img = np.abs(torch_img).max()
    scale_txt = np.abs(torch_txt).max()
    np.testing.assert_allclose(jax_img / scale_img, torch_img / scale_img,
                               atol=2e-5)
    np.testing.assert_allclose(jax_txt / scale_txt, torch_txt / scale_txt,
                               atol=2e-5)


@needs_reference
def test_load_torch_checkpoint_torchscript_and_state_dict(tmp_path):
    """Real OpenAI checkpoints are TorchScript archives; the loader must
    ingest both that form (``torch.jit.load`` branch) and a plain torch-saved
    state_dict, yielding the identical pytree as direct conversion
    (ref: clip/clip.py:82-130 — the JIT-or-state-dict load path)."""
    import torch

    from clip_gp_tpu.models.clip_loader import load_torch_checkpoint

    model = _build_reference_clip(TINY_VIT)
    sd_np = {k: v.float().numpy() for k, v in model.state_dict().items()}
    want_arch, want_params = convert_torch_state_dict(sd_np)

    img = torch.randn(1, 3, TINY_VIT.image_resolution, TINY_VIT.image_resolution)
    txt = torch.randint(0, 100, (1, TINY_VIT.context_length))
    with torch.no_grad():
        traced = torch.jit.trace(model, (img, txt))
    jit_path = tmp_path / "jit_archive.pt"
    traced.save(str(jit_path))

    sd_path = tmp_path / "state_dict.pt"
    torch.save(model.state_dict(), str(sd_path))

    for path in (jit_path, sd_path):
        arch, params = load_torch_checkpoint(str(path))
        assert arch == want_arch, path.name
        flat_want = jax.tree.leaves(want_params)
        flat_got = jax.tree.leaves(params)
        assert len(flat_want) == len(flat_got)
        for a, b in zip(flat_want, flat_got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_npz_roundtrip(tmp_path):
    params = init_clip_params(jax.random.key(0), TINY_VIT)
    path = tmp_path / "weights.npz"
    save_params_npz(str(path), TINY_VIT, params)
    arch2, params2 = load_params_npz(str(path))
    assert arch2 == TINY_VIT
    before = jax.tree.leaves(params)
    after = jax.tree.leaves(params2)
    assert len(before) == len(after)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_encode_image_all_layers():
    """all_layer_outputs analog (ref: clip/model.py:225-274): per-layer
    projected CLS features; the last layer equals the standard encode."""
    import jax
    import jax.numpy as jnp

    from clip_gp_tpu.models.clip_loader import init_clip_params
    from clip_gp_tpu.models.clip_model import (
        ARCHITECTURES,
        encode_image,
        encode_image_all_layers,
    )

    arch = ARCHITECTURES["TEST-ViT"]
    params = init_clip_params(jax.random.key(0), arch)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    outs = np.asarray(encode_image_all_layers(params, arch, images))
    assert outs.shape == (arch.vision_layers, 2, arch.embed_dim)
    final = np.asarray(encode_image(params, arch, images))
    np.testing.assert_allclose(outs[-1], final, rtol=1e-5, atol=1e-5)


def test_grouped_imagenet_templates_bank():
    from clip_gp_tpu.data.template_banks import (
        GROUPED_IMAGENET_TEMPLATES,
        IMAGENET_TEMPLATES,
    )

    assert len(GROUPED_IMAGENET_TEMPLATES) == 8
    assert all(len(g) == 10 for g in GROUPED_IMAGENET_TEMPLATES)
    flat = [t for g in GROUPED_IMAGENET_TEMPLATES for t in g]
    assert flat == list(IMAGENET_TEMPLATES[:80])


def test_prompt_tower_dtype_knob(monkeypatch):
    """CLIP_GP_TPU_PROMPT_TOWER_DTYPE selects the differentiated prompt
    tower's compute dtype: fp32 default (reference-parity), bf16 opt-in
    (MXU mixed precision with fp32 LN/softmax) — outputs stay close."""
    import jax
    import jax.numpy as jnp

    from clip_gp_tpu.models import clip_model
    from clip_gp_tpu.models.clip_loader import init_clip_params

    monkeypatch.delenv("CLIP_GP_TPU_PROMPT_TOWER_DTYPE", raising=False)
    assert clip_model.prompt_tower_dtype() == jnp.float32
    monkeypatch.setenv("CLIP_GP_TPU_PROMPT_TOWER_DTYPE", "bf16")
    assert clip_model.prompt_tower_dtype() == jnp.bfloat16
    monkeypatch.setenv("CLIP_GP_TPU_PROMPT_TOWER_DTYPE", "bfloat16")
    assert clip_model.prompt_tower_dtype() == jnp.bfloat16
    monkeypatch.setenv("CLIP_GP_TPU_PROMPT_TOWER_DTYPE", "float32")
    assert clip_model.prompt_tower_dtype() == jnp.float32

    arch = clip_model.ARCHITECTURES["TEST-ViT"]
    params = init_clip_params(jax.random.key(0), arch)
    embeds = jax.random.normal(jax.random.key(1), (6, 77, 64))
    eot = jnp.full((6,), 76, dtype=jnp.int32)
    f32 = clip_model.text_features_from_embeddings(
        params, arch, embeds, eot, compute_dtype=jnp.float32
    )
    bf16 = clip_model.text_features_from_embeddings(
        params, arch, embeds, eot, compute_dtype=jnp.bfloat16
    )
    assert f32.dtype == jnp.float32 and bf16.dtype == jnp.float32
    cos = jnp.sum(
        (f32 / jnp.linalg.norm(f32, axis=-1, keepdims=True))
        * (bf16 / jnp.linalg.norm(bf16, axis=-1, keepdims=True)),
        axis=-1,
    )
    assert float(cos.min()) > 0.995
