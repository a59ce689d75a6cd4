"""CLIP parameter initialization and checkpoint ingestion.

Three entry points:
- ``init_clip_params(key, arch)``: random init with the reference's scale
  scheme (ref: clip/model.py:334-361) — used for tests and benchmarks when no
  pretrained weights are present.
- ``convert_torch_state_dict(sd)``: OpenAI checkpoint (TorchScript archive or
  plain state_dict, read host-side with CPU torch) → our pytree. Frozen
  BatchNorm is folded into per-channel conv scale/bias; conv kernels go
  OIHW→HWIO; attention/linear weights are transposed to right-multiply form;
  per-layer transformer blocks are stacked along a leading axis for
  ``lax.scan``.
- ``save_params_npz`` / ``load_params_npz``: torch-free on-disk format so the
  runtime never needs torch after one-time conversion.

Weight discovery order for ``load_clip``: ``config.model.init_weights`` →
``$CLIP_GP_TPU_WEIGHTS_DIR`` → ``~/.cache/clip_gp_tpu`` → ``~/.cache/clip``
(the torch download cache, converted on the fly).
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from clip_gp_tpu.models.clip_model import ARCHITECTURES, ClipArchitecture, Params

BN_EPS = 1e-5


# ---------------------------------------------------------------------------
# random initialization (tests / benches)
# ---------------------------------------------------------------------------

def _normal(key, shape, std):
    return std * jax.random.normal(key, shape, dtype=jnp.float32)


def _init_ln(dim):
    return {"scale": jnp.ones(dim), "bias": jnp.zeros(dim)}


def _init_block(key, width):
    ks = jax.random.split(key, 4)
    attn_std = width**-0.5
    proj_std = attn_std * 0.1
    fc_std = (2 * width) ** -0.5
    return {
        "ln_1": _init_ln(width),
        "attn": {
            "w_qkv": _normal(ks[0], (width, 3 * width), attn_std),
            "b_qkv": jnp.zeros(3 * width),
            "w_out": _normal(ks[1], (width, width), proj_std),
            "b_out": jnp.zeros(width),
        },
        "ln_2": _init_ln(width),
        "mlp": {
            "c_fc": {"w": _normal(ks[2], (width, 4 * width), fc_std),
                     "b": jnp.zeros(4 * width)},
            "c_proj": {"w": _normal(ks[3], (4 * width, width), proj_std),
                       "b": jnp.zeros(width)},
        },
    }


def _stack_blocks(blocks):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def _init_transformer(key, width, layers):
    return {"blocks": _stack_blocks(
        [_init_block(k, width) for k in jax.random.split(key, layers)]
    )}


def _init_conv_bn(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    return {
        "w": _normal(key, (kh, kw, cin, cout), fan_in**-0.5),
        "scale": jnp.ones(cout),
        "bias": jnp.zeros(cout),
    }


def _init_linear(key, cin, cout, std=None):
    std = std if std is not None else cin**-0.5
    return {"w": _normal(key, (cin, cout), std), "b": jnp.zeros(cout)}


def _init_bottleneck(key, cin, planes, stride):
    ks = jax.random.split(key, 4)
    cout = planes * 4
    p = {
        "conv1": _init_conv_bn(ks[0], 1, 1, cin, planes),
        "conv2": _init_conv_bn(ks[1], 3, 3, planes, planes),
        "conv3": _init_conv_bn(ks[2], 1, 1, planes, cout),
    }
    if stride > 1 or cin != cout:
        p["downsample"] = _init_conv_bn(ks[3], 1, 1, cin, cout)
    return p


def _init_resnet_visual(key, arch: ClipArchitecture):
    w = arch.vision_width
    ks = jax.random.split(key, 10)
    p: Params = {
        "conv1": _init_conv_bn(ks[0], 3, 3, 3, w // 2),
        "conv2": _init_conv_bn(ks[1], 3, 3, w // 2, w // 2),
        "conv3": _init_conv_bn(ks[2], 3, 3, w // 2, w),
    }
    cin = w
    for li, n_blocks in enumerate(arch.vision_layers):
        planes = w * (2**li)
        stride = 1 if li == 0 else 2
        blocks = []
        bkeys = jax.random.split(ks[3 + li], n_blocks)
        for bi in range(n_blocks):
            blocks.append(
                _init_bottleneck(bkeys[bi], cin, planes, stride if bi == 0 else 1)
            )
            cin = planes * 4
        p[f"layer{li + 1}"] = blocks
    embed = w * 32
    spacial = arch.image_resolution // 32
    std = embed**-0.5
    pk = jax.random.split(ks[8], 5)
    p["attnpool"] = {
        "pos_embed": _normal(pk[0], (spacial**2 + 1, embed), std),
        "q_proj": _init_linear(pk[1], embed, embed, std),
        "k_proj": _init_linear(pk[2], embed, embed, std),
        "v_proj": _init_linear(pk[3], embed, embed, std),
        "c_proj": _init_linear(pk[4], embed, arch.embed_dim, std),
    }
    return p


def _init_vit_visual(key, arch: ClipArchitecture):
    w = arch.vision_width
    ps = arch.vision_patch_size
    grid = arch.image_resolution // ps
    scale = w**-0.5
    ks = jax.random.split(key, 5)
    return {
        "conv1": {"w": _normal(ks[0], (ps, ps, 3, w), (3 * ps * ps) ** -0.5)},
        "class_embed": _normal(ks[1], (w,), scale),
        "pos_embed": _normal(ks[2], (grid**2 + 1, w), scale),
        "ln_pre": _init_ln(w),
        "transformer": _init_transformer(ks[3], w, arch.vision_layers),
        "ln_post": _init_ln(w),
        "proj": _normal(ks[4], (w, arch.embed_dim), scale),
    }


def init_clip_params(key, arch: ClipArchitecture) -> Params:
    ks = jax.random.split(key, 5)
    visual = (
        _init_vit_visual(ks[0], arch)
        if arch.is_vit
        else _init_resnet_visual(ks[0], arch)
    )
    tw = arch.transformer_width
    return {
        "visual": visual,
        "token_embedding": _normal(ks[1], (arch.vocab_size, tw), 0.02),
        "pos_embed": _normal(ks[2], (arch.context_length, tw), 0.01),
        "transformer": _init_transformer(ks[3], tw, arch.transformer_layers),
        "ln_final": _init_ln(tw),
        "text_projection": _normal(ks[4], (tw, arch.embed_dim), tw**-0.5),
        "logit_scale": jnp.asarray(np.log(1 / 0.07), dtype=jnp.float32),
    }


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def infer_arch_from_state_dict(sd: Dict[str, np.ndarray]) -> ClipArchitecture:
    """Infer tower shapes from checkpoint tensor shapes (ref: clip/model.py:450-473)."""
    if "visual.proj" in sd:
        vision_width = sd["visual.conv1.weight"].shape[0]
        vision_layers = len(
            [k for k in sd if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")]
        )
        patch = sd["visual.conv1.weight"].shape[-1]
        grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        image_resolution = patch * grid
    else:
        counts = [
            len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")})
            for b in (1, 2, 3, 4)
        ]
        vision_layers = tuple(counts)
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        out_width = round((sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
        patch = None
        image_resolution = out_width * 32
    embed_dim = sd["text_projection"].shape[1]
    tw = sd["ln_final.weight"].shape[0]
    t_layers = len({k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")})
    return ClipArchitecture(
        name="custom",
        embed_dim=int(embed_dim),
        image_resolution=int(image_resolution),
        vision_layers=vision_layers if patch is None else int(vision_layers),
        vision_width=int(vision_width),
        vision_patch_size=None if patch is None else int(patch),
        context_length=int(sd["positional_embedding"].shape[0]),
        vocab_size=int(sd["token_embedding.weight"].shape[0]),
        transformer_width=int(tw),
        transformer_heads=int(tw // 64),
        transformer_layers=int(t_layers),
    )


def _fold_bn(conv_w: np.ndarray, g, b, mean, var) -> Dict[str, jnp.ndarray]:
    scale = g / np.sqrt(var + BN_EPS)
    return {
        "w": jnp.asarray(conv_w.transpose(2, 3, 1, 0)),  # OIHW -> HWIO
        "scale": jnp.asarray(scale.astype(np.float32)),
        "bias": jnp.asarray((b - mean * scale).astype(np.float32)),
    }


def _conv_bn(sd, conv_key: str, bn_key: str):
    return _fold_bn(
        sd[f"{conv_key}.weight"],
        sd[f"{bn_key}.weight"],
        sd[f"{bn_key}.bias"],
        sd[f"{bn_key}.running_mean"],
        sd[f"{bn_key}.running_var"],
    )


def _ln(sd, key: str):
    return {"scale": jnp.asarray(sd[f"{key}.weight"]),
            "bias": jnp.asarray(sd[f"{key}.bias"])}


def _lin(sd, key: str):
    p = {"w": jnp.asarray(sd[f"{key}.weight"].T)}
    if f"{key}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{key}.bias"])
    return p


def _convert_block(sd, prefix: str):
    return {
        "ln_1": _ln(sd, f"{prefix}.ln_1"),
        "attn": {
            "w_qkv": jnp.asarray(sd[f"{prefix}.attn.in_proj_weight"].T),
            "b_qkv": jnp.asarray(sd[f"{prefix}.attn.in_proj_bias"]),
            "w_out": jnp.asarray(sd[f"{prefix}.attn.out_proj.weight"].T),
            "b_out": jnp.asarray(sd[f"{prefix}.attn.out_proj.bias"]),
        },
        "ln_2": _ln(sd, f"{prefix}.ln_2"),
        "mlp": {
            "c_fc": _lin(sd, f"{prefix}.mlp.c_fc"),
            "c_proj": _lin(sd, f"{prefix}.mlp.c_proj"),
        },
    }


def _convert_transformer(sd, prefix: str, layers: int):
    return {"blocks": _stack_blocks(
        [_convert_block(sd, f"{prefix}.resblocks.{i}") for i in range(layers)]
    )}


def convert_torch_state_dict(
    sd: Dict[str, np.ndarray],
) -> Tuple[ClipArchitecture, Params]:
    """Convert an OpenAI CLIP state_dict (numpy-valued) to (arch, pytree)."""
    sd = {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()
          if k not in ("input_resolution", "context_length", "vocab_size")}
    arch = infer_arch_from_state_dict(sd)
    if arch.is_vit:
        visual: Params = {
            "conv1": {"w": jnp.asarray(sd["visual.conv1.weight"].transpose(2, 3, 1, 0))},
            "class_embed": jnp.asarray(sd["visual.class_embedding"]),
            "pos_embed": jnp.asarray(sd["visual.positional_embedding"]),
            "ln_pre": _ln(sd, "visual.ln_pre"),
            "transformer": _convert_transformer(
                sd, "visual.transformer", arch.vision_layers
            ),
            "ln_post": _ln(sd, "visual.ln_post"),
            "proj": jnp.asarray(sd["visual.proj"]),
        }
    else:
        visual = {
            "conv1": _conv_bn(sd, "visual.conv1", "visual.bn1"),
            "conv2": _conv_bn(sd, "visual.conv2", "visual.bn2"),
            "conv3": _conv_bn(sd, "visual.conv3", "visual.bn3"),
        }
        for li, n_blocks in enumerate(arch.vision_layers):
            blocks = []
            for bi in range(n_blocks):
                pre = f"visual.layer{li + 1}.{bi}"
                blk = {
                    "conv1": _conv_bn(sd, f"{pre}.conv1", f"{pre}.bn1"),
                    "conv2": _conv_bn(sd, f"{pre}.conv2", f"{pre}.bn2"),
                    "conv3": _conv_bn(sd, f"{pre}.conv3", f"{pre}.bn3"),
                }
                if f"{pre}.downsample.0.weight" in sd:
                    blk["downsample"] = _conv_bn(
                        sd, f"{pre}.downsample.0", f"{pre}.downsample.1"
                    )
                blocks.append(blk)
            visual[f"layer{li + 1}"] = blocks
        visual["attnpool"] = {
            "pos_embed": jnp.asarray(sd["visual.attnpool.positional_embedding"]),
            "q_proj": _lin(sd, "visual.attnpool.q_proj"),
            "k_proj": _lin(sd, "visual.attnpool.k_proj"),
            "v_proj": _lin(sd, "visual.attnpool.v_proj"),
            "c_proj": _lin(sd, "visual.attnpool.c_proj"),
        }
    params: Params = {
        "visual": visual,
        "token_embedding": jnp.asarray(sd["token_embedding.weight"]),
        "pos_embed": jnp.asarray(sd["positional_embedding"]),
        "transformer": _convert_transformer(sd, "transformer", arch.transformer_layers),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": jnp.asarray(sd["text_projection"]),
        "logit_scale": jnp.asarray(sd["logit_scale"].reshape(())),
    }
    return arch, params


def load_torch_checkpoint(path: str) -> Tuple[ClipArchitecture, Params]:
    """Read an OpenAI ``.pt`` checkpoint (TorchScript archive or state_dict)
    using CPU torch, then convert. Torch is only needed for this one-time step."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu").eval()
        sd = model.state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    sd_np = {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return convert_torch_state_dict(sd_np)


# ---------------------------------------------------------------------------
# torch-free on-disk format
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=""):
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            flat.update(_flatten(v, f"{prefix}{i}/"))
    else:
        flat[prefix[:-1]] = np.asarray(tree)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(re.fullmatch(r"\d+", k) for k in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(tree)


def save_params_npz(path: str, arch: ClipArchitecture, params: Params) -> None:
    flat = _flatten(params)
    meta = {f"__meta__/{k}": np.asarray(str(v)) for k, v in
            dataclasses_asdict(arch).items()}
    np.savez_compressed(path, **flat, **meta)


def dataclasses_asdict(arch: ClipArchitecture) -> Dict[str, Any]:
    import dataclasses

    return dataclasses.asdict(arch)


def load_params_npz(path: str) -> Tuple[ClipArchitecture, Params]:
    with np.load(path, allow_pickle=False) as data:
        flat = {}
        meta = {}
        for k in data.files:
            if k.startswith("__meta__/"):
                meta[k[len("__meta__/"):]] = str(data[k])
            else:
                flat[k] = data[k]
    vl = meta["vision_layers"]
    vision_layers = (
        tuple(int(x) for x in re.findall(r"\d+", vl)) if vl.startswith("(") else int(vl)
    )
    arch = ClipArchitecture(
        name=meta["name"],
        embed_dim=int(meta["embed_dim"]),
        image_resolution=int(meta["image_resolution"]),
        vision_layers=vision_layers,
        vision_width=int(meta["vision_width"]),
        vision_patch_size=None if meta["vision_patch_size"] == "None"
        else int(meta["vision_patch_size"]),
        context_length=int(meta["context_length"]),
        vocab_size=int(meta["vocab_size"]),
        transformer_width=int(meta["transformer_width"]),
        transformer_heads=int(meta["transformer_heads"]),
        transformer_layers=int(meta["transformer_layers"]),
    )
    return arch, _unflatten(flat)


# ---------------------------------------------------------------------------
# top-level resolution
# ---------------------------------------------------------------------------

def _candidate_paths(backbone: str):
    safe = backbone.replace("/", "-")
    dirs = []
    if os.environ.get("CLIP_GP_TPU_WEIGHTS_DIR"):
        dirs.append(Path(os.environ["CLIP_GP_TPU_WEIGHTS_DIR"]))
    dirs += [Path.home() / ".cache" / "clip_gp_tpu", Path.home() / ".cache" / "clip"]
    for d in dirs:
        yield d / f"{safe}.npz"
        yield d / f"{safe}.pt"


def _file_tag(path: str) -> str:
    """Weights identity from the resolved file (path + mtime + size), so a
    replaced/re-converted checkpoint invalidates downstream feature caches."""
    import hashlib

    st = os.stat(path)
    raw = f"{path}|{st.st_mtime_ns}|{st.st_size}".encode()
    return "w" + hashlib.sha256(raw).hexdigest()[:12]


def load_clip_resolved(
    config, allow_random: bool = False, seed: int = 0
) -> Tuple[ClipArchitecture, Params, str]:
    """Like ``load_clip`` but also returns a tag identifying the weights
    actually loaded (file identity, or ``rand<seed>``)."""
    backbone = config.model.backbone_name
    init = config.model.init_weights
    if init:
        if init.endswith(".npz"):
            return (*load_params_npz(init), _file_tag(init))
        return (*load_torch_checkpoint(init), _file_tag(init))
    for path in _candidate_paths(backbone):
        if path.exists():
            if path.suffix == ".npz":
                return (*load_params_npz(str(path)), _file_tag(str(path)))
            return (*load_torch_checkpoint(str(path)), _file_tag(str(path)))
    if allow_random or os.environ.get("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS") == "1":
        arch = ARCHITECTURES[backbone]
        return arch, init_clip_params(jax.random.key(seed), arch), f"rand{seed}"
    raise FileNotFoundError(
        f"No CLIP weights found for backbone {backbone!r}. Provide "
        "MODEL.INIT_WEIGHTS, set $CLIP_GP_TPU_WEIGHTS_DIR, or place the OpenAI "
        f"checkpoint under ~/.cache/clip/. Set "
        "CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS=1 to run with random weights."
    )


def load_clip(
    config, allow_random: bool = False, seed: int = 0
) -> Tuple[ClipArchitecture, Params]:
    """Resolve CLIP weights for ``config.model.backbone_name``.

    Equivalent of the reference's fp32 loader (ref: utils/trainer.py:197-207),
    minus the network download (this environment has no egress). With
    ``allow_random`` (tests/benches), falls back to randomly-initialized
    weights of the right architecture.
    """
    arch, params, _ = load_clip_resolved(config, allow_random, seed)
    return arch, params

