"""Executed-reference goldens for the flagship Adapter method.

Imports and RUNS the reference's actual trainer module
(``/root/reference/trainers/adapter.py``) and requires numerical agreement
with this framework's REAL code paths on identical tensors:

- ``_get_template_weights``: all four init modes plus the degenerate-score
  branches (flat minmax rows, all-zero top3 rows)
  (ref: trainers/adapter.py:49-142) vs ``common.get_template_weights``
- ``_get_text_embeddings`` through both reference paths (``encode_text``
  and the trainer's ``TextEncoder``; ref: trainers/adapter.py:30-46,
  utils/trainer.py:240+) vs ``common.encode_templates`` on converted
  weights
- ``CustomCLIP`` init pins (identity visual_proj, zero template logits)
  and ``forward_features`` in every non-GP prototype mode — uniform
  fallback, trainable logits incl. the [1,M] shared broadcast, linear
  head (ref: trainers/adapter.py:145-261) vs the Adapter trainer's
  ``_prototypes`` + ``cosine_logits``
- ``Trainer.compute_loss`` (CE + L2/shots path) with its loss components
  and the base-group gradient norm (ref: trainers/adapter.py:387-536,
  551-573) vs our trainer's jitted ``_train_step`` on injected shared
  state — the full differentiated loss field, by execution.

Import scaffolding: gpytorch / entmax / torchvision are not installed
here, and the reference's ``trainers/__init__.py`` is itself broken (it
imports the nonexistent ``adapter_taskres`` — SURVEY §2.3.1), so
``trainers.adapter`` loads under a synthetic parent package with
import-time stubs. The stubs satisfy class-definition imports only:
every stubbed SYMBOL raises if actually executed, so no reference math
is ever replaced by stub math.
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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from clip_gp_tpu.methods import common  # noqa: E402


from _reference_harness import build_tiny_torch_clip, reference_env


@pytest.fixture(scope="module")
def ref_env():
    with reference_env(trainer_modules=("adapter",)) as env:
        yield env


@pytest.fixture(scope="module")
def tiny_clip(ref_env):
    """Reference torch CLIP (TEST-ViT-shaped) + our converted params."""
    from clip_gp_tpu.models.clip_loader import convert_torch_state_dict

    model = build_tiny_torch_clip(ref_env)
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    arch, params = convert_torch_state_dict(sd)
    return model, arch, params


# ---------------------------------------------------------------------------
# _get_text_embeddings
# ---------------------------------------------------------------------------


def test_text_embeddings_match_executed_reference(ref_env, tiny_clip):
    model, arch, params = tiny_clip
    classnames = ["tabby cat", "aircraft carrier", "forest"]
    templates = ["a photo of a {}.", "a blurry photo of a {}."]

    ref_e = ref_env.adapter._get_text_embeddings(templates, classnames, model)
    text_encoder = ref_env.trainer.TextEncoder(model)
    with torch.no_grad():
        ref_e_te = ref_env.adapter._get_text_embeddings(
            templates, classnames, model, text_encoder
        )
    ref_e = ref_e.numpy()
    # the CustomCLIP path (TextEncoder) equals the encode_text path, so our
    # single encode_templates covers both reference call sites
    np.testing.assert_allclose(ref_e_te.numpy(), ref_e, atol=1e-5)

    ours = np.asarray(
        common.encode_templates(params, arch, classnames, templates)
    )
    assert ours.shape == ref_e.shape == (3, 2, 32)
    scale = np.abs(ref_e).max()
    np.testing.assert_allclose(ours / scale, ref_e / scale, atol=5e-5)


# ---------------------------------------------------------------------------
# _get_template_weights
# ---------------------------------------------------------------------------


def _tw_config(method):
    return SimpleNamespace(
        adapter=SimpleNamespace(
            template_init_method=method, prefit_on_full_set=False
        )
    )


def _compare_template_weights(method, E, feats, labels, ref_env, scale=100.0):
    cfg = _tw_config(method)
    ref_w = ref_env.adapter._get_template_weights(
        cfg,
        torch.tensor(E),
        torch.tensor(feats),
        torch.tensor(labels, dtype=torch.int64),
        scale,
    ).numpy()
    ours = np.asarray(
        common.get_template_weights(
            cfg, jnp.asarray(E), jnp.asarray(feats),
            jnp.asarray(labels.astype(np.int32)), scale,
        )
    )
    np.testing.assert_allclose(ours, ref_w, atol=1e-5)
    np.testing.assert_allclose(ours.sum(axis=1), 1.0, atol=1e-5)
    return ref_w


@pytest.mark.parametrize(
    "method", ["uniform", "val_weighted", "top3", "minmax"]
)
def test_template_weights_match_executed_reference(ref_env, method):
    rng = np.random.default_rng(3)
    K, M, D, N = 5, 4, 16, 40
    E = rng.normal(size=(K, M, D)).astype(np.float32)
    feats = rng.normal(size=(N, D)).astype(np.float32)
    labels = rng.integers(0, K, N)
    _compare_template_weights(method, E, feats, labels, ref_env)


def test_template_weights_minmax_flat_rows(ref_env):
    """Identical templates ⇒ per-row constant scores ⇒ the flat-range branch
    (ref: trainers/adapter.py:133-141) must yield uniform rows on both sides."""
    rng = np.random.default_rng(5)
    K, M, D, N = 3, 4, 8, 24
    base = rng.normal(size=(K, 1, D)).astype(np.float32)
    E = np.repeat(base, M, axis=1)
    feats = rng.normal(size=(N, D)).astype(np.float32)
    labels = rng.integers(0, K, N)
    ref_w = _compare_template_weights("minmax", E, feats, labels, ref_env)
    np.testing.assert_allclose(ref_w, 1.0 / M, atol=1e-6)


def test_template_weights_top3_zero_row(ref_env):
    """A class misclassified under every kept template hits the all-zero-row
    refill (ref: trainers/adapter.py:120-128): uniform over the kept top-3."""
    K, M, D = 4, 5, 8
    protos = np.eye(K, D, dtype=np.float32)  # orthogonal class directions
    E = np.zeros((K, M, D), dtype=np.float32)
    for m in range(M):
        if m < 3:
            E[:, m, :] = protos  # correct prototypes
        else:
            E[:, m, :] = np.roll(protos, 1, axis=0)  # always-wrong templates
    # class 0's features point at class 1's prototype ⇒ never correct;
    # classes 1..3 are their own prototypes ⇒ correct under templates 0-2
    feats = np.stack([protos[1], protos[1], protos[2], protos[3]]).astype(
        np.float32
    )
    labels = np.array([0, 1, 2, 3])
    ref_w = _compare_template_weights("top3", E, feats, labels, ref_env)
    # row 0 was refilled: uniform over the three kept templates
    np.testing.assert_allclose(ref_w[0, :3], 1.0 / 3.0, atol=1e-6)
    assert ref_w[0, 3:].max() < 1e-6


# ---------------------------------------------------------------------------
# CustomCLIP prototype modes + forward_features
# ---------------------------------------------------------------------------

CLASSNAMES = ["tabby cat", "forest", "airplane"]


def _ref_custom_clip(ref_env, tiny_clip, **adapter_overrides):
    cfg = ref_env.config.Config()
    cfg.adapter.num_templates = 2
    cfg.adapter.use_gp = False
    for k, v in adapter_overrides.items():
        setattr(cfg.adapter, k, v)
    model, _, _ = tiny_clip
    custom = ref_env.adapter.CustomCLIP(cfg, CLASSNAMES, model)
    return cfg, custom


def _our_forward(mode, params, E, W, feats, scale):
    """Assemble our eval forward exactly as the trainer's eval_logits does
    (methods/adapter.py:_build_jitted_fns), from the real building blocks."""
    from clip_gp_tpu.methods.adapter import Trainer as OurTrainer

    stub = SimpleNamespace(mode=mode, gp_static=None)
    consts = {"text_embeddings": jnp.asarray(E), "gp_buffers": {}}
    protos, _ = OurTrainer._prototypes(stub, params, None, 1, consts)
    projected = jnp.asarray(feats) @ jnp.asarray(W).T
    return np.asarray(common.cosine_logits(projected, protos, scale))


def _shared_state(seed, K=3, M=2, D=32, N=7):
    rng = np.random.default_rng(seed)
    E = rng.normal(size=(K, M, D)).astype(np.float32)
    W = (np.eye(D) + 0.05 * rng.normal(size=(D, D))).astype(np.float32)
    feats = rng.normal(size=(N, D)).astype(np.float32)
    return E, W, feats


def _inject(custom, E, W):
    custom.text_embeddings = torch.tensor(E)
    with torch.no_grad():
        custom.visual_proj.weight.copy_(torch.tensor(W))


def _ref_forward(custom, feats):
    custom.eval()
    with torch.no_grad():
        return custom.forward_features(torch.tensor(feats)).numpy()


def test_custom_clip_init_pins(ref_env, tiny_clip):
    """Init-time contracts: identity visual_proj, zero template logits
    (ref: trainers/adapter.py:170-176, 183-189) — matching our build_model."""
    _, custom = _ref_custom_clip(ref_env, tiny_clip,
                                 train_template_weights=True)
    eye = torch.eye(custom.visual_proj.weight.shape[0])
    assert torch.equal(custom.visual_proj.weight.detach(), eye)
    assert torch.equal(
        custom.template_weights.detach(),
        torch.zeros(len(CLASSNAMES), 2),
    )


def test_forward_uniform_fallback_ignores_computed_weights(ref_env, tiny_clip):
    """Non-trainable baseline: get_prototypes falls back to the RAW template
    mean — computed init weights never enter the forward
    (ref: trainers/adapter.py:215-226; COMPONENTS.md quirk note)."""
    _, custom = _ref_custom_clip(
        ref_env, tiny_clip,
        train_template_weights=False,
        template_init_method="val_weighted",
    )
    E, W, feats = _shared_state(11)
    _inject(custom, E, W)
    scale = float(custom.logit_scale.detach().exp())
    ref_logits = _ref_forward(custom, feats)

    ours = _our_forward("uniform", {"visual_proj": jnp.asarray(W)}, E, W,
                        feats, scale)
    np.testing.assert_allclose(
        ours / np.abs(ref_logits).max(),
        ref_logits / np.abs(ref_logits).max(),
        atol=1e-5,
    )


def test_forward_trainable_logits_mode(ref_env, tiny_clip):
    _, custom = _ref_custom_clip(ref_env, tiny_clip,
                                 train_template_weights=True)
    E, W, feats = _shared_state(12)
    R = np.random.default_rng(13).normal(size=(3, 2)).astype(np.float32)
    _inject(custom, E, W)
    with torch.no_grad():
        custom.template_weights.copy_(torch.tensor(R))
    scale = float(custom.logit_scale.detach().exp())
    ref_logits = _ref_forward(custom, feats)

    params = {"visual_proj": jnp.asarray(W), "template_logits": jnp.asarray(R)}
    ours = _our_forward("logits", params, E, W, feats, scale)
    np.testing.assert_allclose(
        ours / np.abs(ref_logits).max(),
        ref_logits / np.abs(ref_logits).max(),
        atol=1e-5,
    )


def test_forward_shared_logits_broadcast(ref_env, tiny_clip):
    """A [1,M] logits row (the shared-template-weights shape the reference
    creates at adapter.py:174-176) expands across classes at use time
    (ref: trainers/adapter.py:217-221)."""
    _, custom = _ref_custom_clip(ref_env, tiny_clip,
                                 train_template_weights=True)
    E, W, feats = _shared_state(14)
    R1 = np.array([[0.3, -1.2]], dtype=np.float32)
    _inject(custom, E, W)
    custom.template_weights = torch.nn.Parameter(torch.tensor(R1))
    scale = float(custom.logit_scale.detach().exp())
    ref_logits = _ref_forward(custom, feats)

    params = {"visual_proj": jnp.asarray(W),
              "template_logits": jnp.asarray(R1)}
    ours = _our_forward("logits", params, E, W, feats, scale)
    np.testing.assert_allclose(
        ours / np.abs(ref_logits).max(),
        ref_logits / np.abs(ref_logits).max(),
        atol=1e-5,
    )


def test_forward_linear_template_weighting(ref_env, tiny_clip):
    _, custom = _ref_custom_clip(
        ref_env, tiny_clip,
        train_template_weights=True,
        use_linear_template_weighting=True,
    )
    E, W, feats = _shared_state(15)
    V = np.random.default_rng(16).normal(size=(1, 32)).astype(np.float32)
    _inject(custom, E, W)
    with torch.no_grad():
        custom.template_weight_linear.weight.copy_(torch.tensor(V))
    scale = float(custom.logit_scale.detach().exp())
    ref_logits = _ref_forward(custom, feats)

    params = {
        "visual_proj": jnp.asarray(W),
        "template_weight_linear": jnp.asarray(V.T),
    }
    ours = _our_forward("linear", params, E, W, feats, scale)
    np.testing.assert_allclose(
        ours / np.abs(ref_logits).max(),
        ref_logits / np.abs(ref_logits).max(),
        atol=1e-5,
    )


# ---------------------------------------------------------------------------
# compute_loss + gradient field, against our REAL trainer step
# ---------------------------------------------------------------------------


def test_compute_loss_and_grads_match_executed_reference(
    ref_env, tiny_clip, tmp_path, monkeypatch
):
    monkeypatch.setenv("CLIP_GP_TPU_ALLOW_RANDOM_WEIGHTS", "1")

    from clip_gp_tpu.core.config import Config
    from clip_gp_tpu.core.registry import build_trainer
    from clip_gp_tpu.core.seeding import set_random_seed
    from clip_gp_tpu.data.pipeline import build_data_manager
    import clip_gp_tpu.data.datasets  # noqa: F401
    import clip_gp_tpu.methods  # noqa: F401

    shots, l2_lambda = 4, 0.1

    config = Config()
    config.dataset.name = "Synthetic"
    config.dataset.root = str(tmp_path / "data")
    config.dataset.num_shots = shots
    config.model.backbone_name = "TEST-ViT"
    config.input.size = (32, 32)
    config.dataloader.batch_size_train = 8
    config.dataloader.batch_size_test = 8
    config.dataloader.num_workers = 2
    config.adapter.num_templates = 2
    config.adapter.train_template_weights = True
    config.adapter.l2_lambda = l2_lambda
    config.optim.name = "sgd"
    config.optim.lr = 0.1
    config.output_dir = str(tmp_path / "out")
    config.seed = 1
    set_random_seed(config.seed)
    dm = build_data_manager(config)
    trainer = build_trainer(config, dm)
    trainer.build_model()

    K, M, D = (int(s) for s in trainer.text_embeddings.shape)
    assert (K, M, D) == (4, 2, 32)
    rng = np.random.default_rng(21)
    E = rng.normal(size=(K, M, D)).astype(np.float32)
    W = (np.eye(D) + 0.05 * rng.normal(size=(D, D))).astype(np.float32)
    R = rng.normal(size=(K, M)).astype(np.float32)
    feats = rng.normal(size=(10, D)).astype(np.float32)
    labels = rng.integers(0, K, 10)

    # ---- reference side: real CustomCLIP + Trainer.compute_loss ----
    cfg_ref = ref_env.config.Config()
    cfg_ref.adapter.num_templates = 2
    cfg_ref.adapter.train_template_weights = True
    cfg_ref.adapter.l2_lambda = l2_lambda
    cfg_ref.dataset.num_shots = shots
    classnames4 = ["tabby cat", "forest", "airplane", "violin"]
    torch_model, _, _ = tiny_clip
    custom = ref_env.adapter.CustomCLIP(cfg_ref, classnames4, torch_model)
    custom.text_embeddings = torch.tensor(E)
    with torch.no_grad():
        custom.visual_proj.weight.copy_(torch.tensor(W))
        custom.template_weights.copy_(torch.tensor(R))
    custom.train()
    ref_scale = float(custom.logit_scale.detach().exp())

    ref_trainer = ref_env.adapter.Trainer.__new__(ref_env.adapter.Trainer)
    ref_trainer.config = cfg_ref
    ref_trainer.model = custom
    loss = ref_trainer.compute_loss(
        torch.tensor(feats), torch.tensor(labels, dtype=torch.int64)
    )
    loss.backward()
    dbg = ref_trainer._dbg_loss_components
    # base group = the two requires-grad head params
    # (ref: trainers/adapter.py:298-311, 551-573)
    ref_gnorm = float(
        torch.sqrt(
            custom.visual_proj.weight.grad.pow(2).sum()
            + custom.template_weights.grad.pow(2).sum()
        )
    )

    # ---- our side: the trainer's real jitted train step ----
    trainer.text_embeddings = jnp.asarray(E)
    trainer.logit_scale = ref_scale
    trainer.params["visual_proj"] = jnp.asarray(W)
    trainer.params["template_logits"] = jnp.asarray(R)
    trainer._build_jitted_fns()  # recapture the injected logit scale
    trainer.opt_state = trainer.opt.init(trainer.params)
    _, _, our_loss, aux, gnorms = trainer._train_step(
        trainer.params,
        trainer.opt_state,
        jnp.asarray(feats),
        jnp.asarray(labels.astype(np.int32)),
        jax.random.key(0),
    )

    np.testing.assert_allclose(float(our_loss), float(loss), rtol=1e-5)
    np.testing.assert_allclose(float(aux["l2_reg"]), dbg["l2_reg"], rtol=1e-5)
    np.testing.assert_allclose(float(gnorms["base"]), ref_gnorm, rtol=1e-4)
    assert dbg["kl"] == 0.0 and float(aux["kl"]) == 0.0

    # Executed-reference quirk, pinned: ``total_loss = ce_loss`` then
    # ``total_loss += l2_reg`` mutates IN PLACE (ref: trainers/adapter.py:
    # 445-455, 469-479), so the aliased ce_loss absorbs the L2 term and the
    # reference's [DBG] ce component reports ce+l2 in non-GP mode. (With GP,
    # the out-of-place ``total_loss = total_loss + kl_term`` rebinding breaks
    # the alias first.) Our aux["ce"] reports the true CE — quirk fixed,
    # documented in COMPONENTS.md.
    np.testing.assert_allclose(dbg["ce"], dbg["total"], rtol=1e-7)
    np.testing.assert_allclose(
        float(aux["ce"]) + float(aux["l2_reg"]), dbg["ce"], rtol=1e-5
    )
