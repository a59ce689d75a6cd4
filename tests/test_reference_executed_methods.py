"""Executed-reference goldens for CLIP-Adapter, TaskRes, Tip-Adapter, CoOp.

Companion to test_reference_executed_adapter.py (the flagship method):
imports and RUNS the reference's actual trainer modules via
``_reference_harness.reference_env`` and requires numerical agreement
with this framework's REAL trainers — both sides loaded with the SAME
tiny CLIP weights (the reference torch model converted to npz and fed to
our loader through ``MODEL.INIT_WEIGHTS``), so init-time computations
(zero-shot classifier, base text features, prompt embeddings) are pinned
end to end, not just the forward math:

- CLIP-Adapter: zero-shot clip_weights buffer, MLP blend + classifier
  logits through ``logits_from_features`` (ref: trainers/clip_adapter.py:
  16-113) vs our trainer's ``predict_logits``
- TaskRes: raw-mean base text features and the residual forward through
  the real ``CustomCLIP.forward`` (image encoder patched to identity so
  injected features drive the executed forward; ref: trainers/taskres.py:
  35-125) vs our ``predict_logits``
- Tip-Adapter: the (β, α) validation grid search — selection AND
  tie-breaking order (β-major, first-best wins) — over random instances
  plus an all-ties instance (ref: trainers/tip_adapter.py:52-81) vs our
  vectorized ``_search_hyperparams``
- CoOp: deterministic ctx_init prompt assembly (token splicing, n_ctx
  from the phrase, prefix/suffix slices, tokenized rows) and the text
  features + logits those prompts produce (ref: trainers/adapter_coop.py:
  14-89) vs ``build_prompt_parts``/``assemble_prompts`` +
  ``text_features_from_embeddings``
- CoCoOp: ctx_init context pin, injected meta-net, per-image shifted
  prompts through each side's text tower (reference python loop vs our
  chunked compiled map) — logits AND prompt-learner gradient norms
  (ref: trainers/adapter_cocoop.py:14-84) vs our ``predict_logits`` /
  ``_logits_fn`` under ``jax.grad``
"""

from __future__ import annotations

from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from _reference_harness import build_tiny_torch_clip, reference_env  # noqa: E402


@pytest.fixture(scope="module")
def ref_env():
    with reference_env(
        trainer_modules=("adapter", "clip_adapter", "taskres", "tip_adapter",
                         "adapter_coop", "adapter_cocoop")
    ) as env:
        yield env


@pytest.fixture(scope="module")
def tiny_clip(ref_env, tmp_path_factory):
    """Reference torch CLIP + our converted params + an npz our loader eats."""
    from clip_gp_tpu.models.clip_loader import (
        convert_torch_state_dict,
        save_params_npz,
    )

    model = build_tiny_torch_clip(ref_env)
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    arch, params = convert_torch_state_dict(sd)
    npz = tmp_path_factory.mktemp("weights") / "tiny_clip.npz"
    save_params_npz(str(npz), arch, params)
    return SimpleNamespace(model=model, arch=arch, params=params,
                           npz=str(npz))


def _build_our_trainer(trainer_name, tmp_path, npz, **adapter_overrides):
    """Our real trainer on Synthetic, loaded with the shared tiny weights."""
    from clip_gp_tpu.core.config import Config
    from clip_gp_tpu.core.registry import build_trainer
    from clip_gp_tpu.core.seeding import set_random_seed
    from clip_gp_tpu.data.pipeline import build_data_manager
    import clip_gp_tpu.data.datasets  # noqa: F401
    import clip_gp_tpu.methods  # noqa: F401

    config = Config()
    config.trainer_name = trainer_name
    config.dataset.name = "Synthetic"
    config.dataset.root = str(tmp_path / "data")
    config.dataset.num_shots = 4
    config.model.backbone_name = "TEST-ViT"
    config.model.init_weights = npz
    config.input.size = (32, 32)
    config.dataloader.batch_size_train = 8
    config.dataloader.batch_size_test = 8
    config.dataloader.num_workers = 2
    config.adapter.num_templates = 2
    config.output_dir = str(tmp_path / "out")
    config.seed = 1
    for k, v in adapter_overrides.items():
        setattr(config.adapter, k, v)
    set_random_seed(config.seed)
    dm = build_data_manager(config)
    trainer = build_trainer(config, dm)
    trainer.build_model()
    return trainer


def _ref_config(ref_env, **adapter_overrides):
    cfg = ref_env.config.Config()
    cfg.adapter.num_templates = 2
    cfg.adapter.use_gp = False
    for k, v in adapter_overrides.items():
        setattr(cfg.adapter, k, v)
    return cfg


def _scaled_allclose(ours, ref, atol):
    scale = max(np.abs(ref).max(), 1e-12)
    np.testing.assert_allclose(
        np.asarray(ours) / scale, np.asarray(ref) / scale, atol=atol
    )


class _IdentityEncoder(torch.nn.Module):
    """Stand-in image tower: forwards injected features unchanged so the
    reference's real ``forward`` runs on controlled inputs."""

    def forward(self, x):
        return x


# ---------------------------------------------------------------------------
# CLIP-Adapter
# ---------------------------------------------------------------------------


def test_clip_adapter_matches_executed_reference(ref_env, tiny_clip, tmp_path,
                                                 monkeypatch):
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")
    ratio, reduction = 0.3, 2
    trainer = _build_our_trainer(
        "CLIP-Adapter", tmp_path, tiny_clip.npz,
        clip_adapter_ratio=ratio, clip_adapter_reduction=reduction,
    )
    classnames = list(trainer.dm.dataset.classnames)

    cfg = _ref_config(ref_env, clip_adapter_ratio=ratio,
                      clip_adapter_reduction=reduction)
    custom = ref_env.clip_adapter.CustomCLIP(cfg, classnames, tiny_clip.model)
    custom.eval()

    # init-time pins: same weights ⇒ same per-template embeddings and
    # zero-shot classifier (ref: clip_adapter.py:57-71 + utils/trainer.py
    # _get_clip_weights) vs encode_templates + zero_shot_classifier
    _scaled_allclose(trainer.text_embeddings,
                     custom.text_embeddings.numpy(), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(trainer.clip_weights), custom.clip_weights.numpy(),
        atol=5e-5,
    )

    # inject identical MLP weights; torch Linear stores [out, in]
    d = int(trainer.text_embeddings.shape[-1])
    hidden = d // reduction
    rng = np.random.default_rng(7)
    w1 = rng.normal(scale=0.2, size=(hidden, d)).astype(np.float32)
    w2 = rng.normal(scale=0.2, size=(d, hidden)).astype(np.float32)
    with torch.no_grad():
        custom.adapter.fc1.weight.copy_(torch.tensor(w1))
        custom.adapter.fc2.weight.copy_(torch.tensor(w2))
    trainer.params["fc1"] = jnp.asarray(w1.T)
    trainer.params["fc2"] = jnp.asarray(w2.T)

    feats = rng.normal(size=(9, d)).astype(np.float32)
    with torch.no_grad():
        ref_logits = custom.logits_from_features(
            torch.tensor(feats), training=False
        ).numpy()
    ours = np.asarray(trainer.predict_logits(jnp.asarray(feats)))
    _scaled_allclose(ours, ref_logits, atol=1e-4)


# ---------------------------------------------------------------------------
# TaskRes
# ---------------------------------------------------------------------------


def test_taskres_matches_executed_reference(ref_env, tiny_clip, tmp_path,
                                            monkeypatch):
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")
    alpha = 0.7
    trainer = _build_our_trainer(
        "TaskRes", tmp_path, tiny_clip.npz, taskres_residual_scale=alpha
    )
    classnames = list(trainer.dm.dataset.classnames)

    cfg = _ref_config(ref_env, taskres_residual_scale=alpha)
    custom = ref_env.taskres.CustomCLIP(cfg, classnames, tiny_clip.model)
    custom.eval()

    # init-time pin: base text features are the RAW (unnormalized) mean over
    # templates (ref: taskres.py:72-94)
    ref_base = custom.taskres_learner.base_text_features.numpy()
    _scaled_allclose(trainer.base_text_features, ref_base, atol=5e-5)

    # inject identical residuals, drive the real forward with identity tower
    k, d = ref_base.shape
    rng = np.random.default_rng(8)
    residuals = rng.normal(scale=0.1, size=(k, d)).astype(np.float32)
    with torch.no_grad():
        custom.taskres_learner.text_feature_residuals.copy_(
            torch.tensor(residuals)
        )
    custom.image_encoder = _IdentityEncoder()
    feats = rng.normal(size=(8, d)).astype(np.float32)
    with torch.no_grad():
        ref_logits = custom(torch.tensor(feats)).numpy()

    trainer.params["residuals"] = jnp.asarray(residuals)
    ours = np.asarray(trainer.predict_logits(jnp.asarray(feats)))
    _scaled_allclose(ours, ref_logits, atol=1e-4)


# ---------------------------------------------------------------------------
# Tip-Adapter (β, α) grid search
# ---------------------------------------------------------------------------


def _search_both(ref_env, cache_keys, cache_vals, clip_weights, val_feats,
                 val_labels):
    from clip_gp_tpu.methods import tip_adapter as our_tip

    ref_t = ref_env.tip_adapter.Trainer.__new__(ref_env.tip_adapter.Trainer)
    ref_t.config = _ref_config(ref_env)
    ref_t.device = torch.device("cpu")
    ref_t.cache_keys = torch.tensor(cache_keys)
    ref_t.cache_vals = torch.tensor(cache_vals)
    ref_t.clip_weights = torch.tensor(clip_weights)
    ref_beta, ref_alpha = ref_t._search_hyperparams(
        torch.tensor(val_feats), torch.tensor(val_labels, dtype=torch.int64)
    )

    our_t = our_tip.Trainer.__new__(our_tip.Trainer)
    our_t.config = SimpleNamespace(
        adapter=SimpleNamespace(use_gp=False, gp_num_mc_samples_eval=1)
    )
    our_t.gp_bundle = None
    our_t.cache_keys = jnp.asarray(cache_keys)
    our_t.cache_vals = jnp.asarray(cache_vals)
    our_t.clip_weights = jnp.asarray(clip_weights)
    our_beta, our_alpha = our_t._search_hyperparams(
        jnp.asarray(val_feats), jnp.asarray(val_labels.astype(np.int32))
    )
    return (ref_beta, ref_alpha), (our_beta, our_alpha)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_tip_adapter_search_matches_executed_reference(ref_env, seed):
    """Coarse-accuracy grids tie often at small N — the selected (β, α) must
    match the reference's executed iteration/tie-break order exactly."""
    rng = np.random.default_rng(seed)
    K, D, Nc, Nv = 4, 16, 16, 15
    cache_keys = rng.normal(size=(Nc, D)).astype(np.float32)
    cache_keys /= np.linalg.norm(cache_keys, axis=-1, keepdims=True)
    cache_labels = rng.integers(0, K, Nc)
    cache_vals = np.eye(K, dtype=np.float32)[cache_labels]
    clip_weights = rng.normal(size=(D, K)).astype(np.float32)
    clip_weights /= np.linalg.norm(clip_weights, axis=0, keepdims=True)
    val_feats = rng.normal(size=(Nv, D)).astype(np.float32)
    val_feats /= np.linalg.norm(val_feats, axis=-1, keepdims=True)
    val_labels = rng.integers(0, K, Nv)
    ref_sel, our_sel = _search_both(
        ref_env, cache_keys, cache_vals, clip_weights, val_feats, val_labels
    )
    assert our_sel == ref_sel


def test_tip_adapter_search_all_ties_picks_first_cell(ref_env):
    """When every (β, α) scores identically (here: everything correct), both
    sides must return the FIRST grid cell — β-major order, strict > keeps
    the first best (ref: tip_adapter.py:66-80)."""
    K, D = 3, 8
    protos = np.eye(K, D, dtype=np.float32)
    cache_keys = protos.copy()
    cache_vals = np.eye(K, dtype=np.float32)
    clip_weights = protos.T.copy()
    val_feats = protos.copy()
    val_labels = np.arange(K)
    ref_sel, our_sel = _search_both(
        ref_env, cache_keys, cache_vals, clip_weights, val_feats, val_labels
    )
    assert ref_sel == (1.0, 1.0)
    assert our_sel == ref_sel


# ---------------------------------------------------------------------------
# CoOp prompt assembly + text features
# ---------------------------------------------------------------------------

COOP_CLASSNAMES = ["tabby cat", "oak_tree", "airplane"]


def test_coop_ctx_init_prompts_match_executed_reference(ref_env, tiny_clip):
    """Deterministic ctx_init path: phrase embedding becomes the context,
    n_ctx = word count, prefix/suffix slices + tokenized rows identical
    (ref: adapter_coop.py:22-64) vs build_prompt_parts/assemble_prompts."""
    import jax

    from clip_gp_tpu.methods.coop import assemble_prompts, build_prompt_parts

    cfg = _ref_config(ref_env, ctx_init="a photo of a", n_ctx=16, csc=False)
    learner = ref_env.adapter_coop.PromptLearnerCoOp(
        cfg, COOP_CLASSNAMES, tiny_clip.model
    )
    ref_prompts, ref_tokenized = learner.build_prompts()
    ref_prompts = ref_prompts.detach().numpy()

    our_cfg = SimpleNamespace(
        adapter=SimpleNamespace(ctx_init="a photo of a", n_ctx=16, csc=False)
    )
    ctx, prefix, suffix, tokenized, n_ctx = build_prompt_parts(
        our_cfg, COOP_CLASSNAMES, tiny_clip.params, jax.random.key(0)
    )
    assert n_ctx == learner.n_ctx == 4
    np.testing.assert_array_equal(
        np.asarray(tokenized), ref_tokenized.numpy()
    )
    ours = np.asarray(assemble_prompts(ctx, prefix, suffix,
                                       len(COOP_CLASSNAMES)))
    assert ours.shape == ref_prompts.shape
    _scaled_allclose(ours, ref_prompts, atol=1e-6)


def test_coop_random_init_shapes_and_fixed_parts(ref_env, tiny_clip):
    """Random-init paths draw different ctx values per framework; the
    deterministic parts (shapes, prefix/suffix embeddings, tokenized rows)
    must still agree — shared and class-specific (csc) variants."""
    import jax

    from clip_gp_tpu.methods.coop import build_prompt_parts

    for csc in (False, True):
        cfg = _ref_config(ref_env, ctx_init="", n_ctx=3, csc=csc)
        learner = ref_env.adapter_coop.PromptLearnerCoOp(
            cfg, COOP_CLASSNAMES, tiny_clip.model
        )
        our_cfg = SimpleNamespace(
            adapter=SimpleNamespace(ctx_init="", n_ctx=3, csc=csc)
        )
        ctx, prefix, suffix, tokenized, n_ctx = build_prompt_parts(
            our_cfg, COOP_CLASSNAMES, tiny_clip.params, jax.random.key(0)
        )
        assert n_ctx == learner.n_ctx == 3
        assert tuple(ctx.shape) == tuple(learner.ctx.shape)
        np.testing.assert_array_equal(
            np.asarray(tokenized), learner.tokenized_prompts.numpy()
        )
        _scaled_allclose(prefix, learner.token_prefix.numpy(), atol=1e-6)
        _scaled_allclose(suffix, learner.token_suffix.numpy(), atol=1e-6)


def test_coop_text_features_and_logits_match_executed_reference(
    ref_env, tiny_clip
):
    """Full CoOp forward on injected image features: the assembled ctx_init
    prompts re-encode through each side's text tower and produce the same
    logits (ref: adapter_coop.py:66-89 CustomCLIP.forward, image tower
    patched to identity)."""
    import jax

    from clip_gp_tpu.methods import common
    from clip_gp_tpu.methods.coop import assemble_prompts, build_prompt_parts
    from clip_gp_tpu.models import clip_model as our_clip_model

    cfg = _ref_config(ref_env, ctx_init="a photo of a", csc=False)
    custom = ref_env.adapter_coop.CustomCLIP(
        cfg, COOP_CLASSNAMES, tiny_clip.model
    )
    custom.image_encoder = _IdentityEncoder()
    custom.eval()
    d = int(tiny_clip.arch.embed_dim)
    rng = np.random.default_rng(9)
    feats = rng.normal(size=(6, d)).astype(np.float32)
    with torch.no_grad():
        ref_logits = custom(torch.tensor(feats)).numpy()

    our_cfg = SimpleNamespace(
        adapter=SimpleNamespace(ctx_init="a photo of a", n_ctx=16, csc=False)
    )
    ctx, prefix, suffix, tokenized, _ = build_prompt_parts(
        our_cfg, COOP_CLASSNAMES, tiny_clip.params, jax.random.key(0)
    )
    prompts = assemble_prompts(ctx, prefix, suffix, len(COOP_CLASSNAMES))
    text = our_clip_model.text_features_from_embeddings(
        tiny_clip.params, tiny_clip.arch, prompts, tokenized.argmax(axis=-1)
    )
    scale = float(np.exp(np.asarray(tiny_clip.params["logit_scale"])))
    ours = np.asarray(
        common.cosine_logits(jnp.asarray(feats), text, scale)
    )
    _scaled_allclose(ours, ref_logits, atol=1e-4)

# ---------------------------------------------------------------------------
# CoCoOp meta-net conditioned prompts
# ---------------------------------------------------------------------------


def _inject_cocoop_meta(custom, trainer, vis_dim, hidden, ctx_dim, rng):
    """Identical meta-net weights on both sides (torch Linear stores
    [out, in]; ours stores [in, out])."""
    w1 = rng.normal(scale=0.3, size=(hidden, vis_dim)).astype(np.float32)
    b1 = rng.normal(scale=0.1, size=(hidden,)).astype(np.float32)
    w2 = rng.normal(scale=0.3, size=(ctx_dim, hidden)).astype(np.float32)
    b2 = rng.normal(scale=0.1, size=(ctx_dim,)).astype(np.float32)
    with torch.no_grad():
        custom.prompt_learner.meta_net[0].weight.copy_(torch.tensor(w1))
        custom.prompt_learner.meta_net[0].bias.copy_(torch.tensor(b1))
        custom.prompt_learner.meta_net[2].weight.copy_(torch.tensor(w2))
        custom.prompt_learner.meta_net[2].bias.copy_(torch.tensor(b2))
    trainer.params["meta_fc1"] = {"w": jnp.asarray(w1.T),
                                  "b": jnp.asarray(b1)}
    trainer.params["meta_fc2"] = {"w": jnp.asarray(w2.T),
                                  "b": jnp.asarray(b2)}


def test_cocoop_matches_executed_reference(ref_env, tiny_clip, tmp_path,
                                           monkeypatch):
    """Full CoCoOp forward on injected raw features: deterministic ctx_init
    context + injected meta-net, per-image shifted prompts re-encode through
    each side's text tower (ref: adapter_cocoop.py:47-84 — the per-image
    python loop vs our chunked compiled map) and produce the same logits;
    the prompt-learner gradient norms agree through the text-tower backward."""
    import jax

    from clip_gp_tpu.methods import common

    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")
    trainer = _build_our_trainer(
        "Adapter-CoCoOp", tmp_path, tiny_clip.npz, ctx_init="a photo of a"
    )
    classnames = list(trainer.dm.dataset.classnames)

    cfg = _ref_config(ref_env, ctx_init="a photo of a")
    custom = ref_env.adapter_cocoop.CustomCLIP(
        cfg, classnames, tiny_clip.model
    )
    custom.image_encoder = _IdentityEncoder()
    assert custom.prompt_learner.n_ctx == 4
    # deterministic ctx_init context: same phrase embedding on both sides
    _scaled_allclose(trainer.params["ctx"],
                     custom.prompt_learner.ctx.detach().numpy(), atol=1e-6)

    vis_dim = int(tiny_clip.arch.embed_dim)
    ctx_dim = int(tiny_clip.arch.transformer_width)
    hidden = max(1, vis_dim // 16)
    rng = np.random.default_rng(31)
    _inject_cocoop_meta(custom, trainer, vis_dim, hidden, ctx_dim, rng)

    feats = rng.normal(size=(5, vis_dim)).astype(np.float32)
    labels = rng.integers(0, len(classnames), 5)
    custom.eval()
    ref_logits = custom(torch.tensor(feats))
    ours = np.asarray(trainer.predict_logits(jnp.asarray(feats)))
    _scaled_allclose(ours, ref_logits.detach().numpy(), atol=2e-4)

    # gradient-norm pin through the text-tower backward (nothing else
    # compares cross-framework gradients through the chunked text encode)
    loss_ref = torch.nn.functional.cross_entropy(
        ref_logits, torch.tensor(labels, dtype=torch.int64)
    )
    loss_ref.backward()
    ref_sq = sum(
        float(p.grad.pow(2).sum())
        for p in custom.prompt_learner.parameters()
        if p.grad is not None
    )

    feats_n = np.asarray(feats / np.linalg.norm(feats, axis=-1,
                                                keepdims=True))

    def our_loss(params):
        logits = trainer._logits_fn(params, jnp.asarray(feats_n))
        return common.cross_entropy(logits,
                                    jnp.asarray(labels.astype(np.int32)))

    loss_ours, grads = jax.value_and_grad(our_loss)(trainer.params)
    np.testing.assert_allclose(float(loss_ours), float(loss_ref), rtol=1e-4)
    our_sq = sum(float((g ** 2).sum()) for g in jax.tree.leaves(grads))
    np.testing.assert_allclose(np.sqrt(our_sq), np.sqrt(ref_sq), rtol=1e-3)

# ---------------------------------------------------------------------------
# finetune_on_test sanity loop — full 100-epoch trajectory
# ---------------------------------------------------------------------------


def _parse_sanity_lines(text):
    """[(loss, acc)] from the per-epoch '[SANITY] ... loss=X acc_test=Y'."""
    import re

    out = []
    for line in text.splitlines():
        m = re.search(r"fine-tune epoch \d+/\d+: loss=([\d.]+) "
                      r"acc_test=([\d.]+)", line)
        if m:
            out.append((float(m.group(1)), float(m.group(2))))
    return out


def test_finetune_on_test_trajectory_matches_executed_reference(
    ref_env, tiny_clip, tmp_path, monkeypatch, capfd
):
    """Run BOTH implementations' full _finetune_on_test sanity loops (100
    epochs, once-shuffled test mini-batches, per-epoch scheduler step) on
    identical injected state and require the per-epoch printed loss/accuracy
    trajectories to agree (ref: trainers/adapter.py:968-1065). This executes
    the reference's uniform-mode promotion quirk — the stored template-weight
    VALUES become trainable logits (ref: adapter.py:978-981 + 215-222) —
    against our mode switch."""
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")
    trainer = _build_our_trainer(
        "Adapter", tmp_path, tiny_clip.npz, train_template_weights=False
    )
    trainer.config.optim.name = "sgd"
    trainer.config.optim.lr = 0.05
    trainer.config.optim.weight_decay = 0.0
    trainer.config.optim.lr_scheduler = "cosine"
    trainer.config.optim.max_epoch = 100
    classnames = list(trainer.dm.dataset.classnames)
    K, M, D = (int(s) for s in trainer.text_embeddings.shape)

    rng = np.random.default_rng(41)
    E = rng.normal(size=(K, M, D)).astype(np.float32)
    feats = rng.normal(size=(24, D)).astype(np.float32)
    labels = rng.integers(0, K, 24)

    # ---- reference side ----
    cfg = _ref_config(ref_env, train_template_weights=False)
    cfg.optim.name = "sgd"
    cfg.optim.lr = 0.05
    cfg.optim.weight_decay = 0.0
    cfg.optim.lr_scheduler = "cosine"
    cfg.optim.max_epoch = 100
    cfg.dataloader.batch_size_test = 8  # the sanity loop's mini-batch size
    custom = ref_env.adapter.CustomCLIP(cfg, classnames, tiny_clip.model)
    custom.text_embeddings = torch.tensor(E)
    # non-trainable baseline state as train() leaves it: a plain tensor the
    # sanity loop promotes to a trainable Parameter (values become logits)
    custom.template_weights = torch.full((K, M), 1.0 / M)
    ref_t = ref_env.adapter.Trainer.__new__(ref_env.adapter.Trainer)
    ref_t.config = cfg
    ref_t.model = custom
    ref_t.device = torch.device("cpu")
    ref_t.features_test = torch.tensor(feats)
    ref_t.labels_test = torch.tensor(labels, dtype=torch.int64)
    np.random.seed(123)  # the once-per-run shuffle draws from global numpy
    ref_t._finetune_on_test()
    ref_traj = _parse_sanity_lines(capfd.readouterr().out)

    # ---- our side ----
    trainer.text_embeddings = jnp.asarray(E)
    trainer.logit_scale = float(custom.logit_scale.detach().exp())
    trainer._build_jitted_fns()
    trainer.features_test = feats
    trainer.labels_test = labels.astype(np.int64)
    np.random.seed(123)
    trainer._finetune_on_test()
    our_traj = _parse_sanity_lines(capfd.readouterr().out)

    assert len(ref_traj) == len(our_traj) == 100
    ref_arr, our_arr = np.asarray(ref_traj), np.asarray(our_traj)
    np.testing.assert_allclose(our_arr[:, 0], ref_arr[:, 0], atol=2e-3)
    np.testing.assert_array_equal(our_arr[:, 1], ref_arr[:, 1])
