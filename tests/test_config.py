"""Config system: defaults, YAML inheritance, CLI, OPTS overrides."""

import textwrap

from clip_gp_tpu.core.config import (
    Config,
    config_to_dict,
    merge_config_from_file,
    merge_from_opts,
    parse_args_to_config,
)


def test_defaults_match_reference_schema():
    c = Config()
    assert c.trainer_name == "Adapter"
    assert c.adapter.num_templates == 1
    assert c.adapter.gp_kernel_type == "rbf"
    assert c.adapter.gp_num_mc_samples_train == 30
    assert c.adapter.gp_num_mc_samples_eval == 100
    assert c.adapter.gp_pca_dim == 256
    assert c.optim.lr == 0.01
    assert c.input.size == (224, 224)
    assert c.input.pixel_mean == (0.48145466, 0.4578275, 0.40821073)
    assert c.dataloader.batch_size_train == 128


def test_yaml_merge_with_base_config(tmp_path):
    base = tmp_path / "default.yaml"
    base.write_text(
        textwrap.dedent(
            """
            OPTIM:
              NAME: adamw
              LR: 0.01
              MAX_EPOCH: 100
            TRAINER:
              ADAPTER:
                NUM_TEMPLATES: 8
                L2_LAMBDA: 0.5
            """
        )
    )
    child = tmp_path / "gp.yaml"
    child.write_text(
        textwrap.dedent(
            """
            BASE_CONFIG: default.yaml
            TRAINER:
              ADAPTER:
                USE_GP: true
                GP_KERNEL_TYPE: linear
            OPTIM:
              LR: 0.02
            DATALOADER:
              TRAIN_X:
                BATCH_SIZE: 64
              TEST:
                BATCH_SIZE: 32
            MODEL:
              BACKBONE:
                NAME: ViT-B/16
            INPUT:
              SIZE: [224, 224]
            """
        )
    )
    c = Config()
    merge_config_from_file(c, str(child))
    assert c.optim.name == "adamw"  # from base
    assert c.optim.lr == 0.02  # overridden by child
    assert c.adapter.num_templates == 8
    assert c.adapter.use_gp is True
    assert c.adapter.gp_kernel_type == "linear"
    assert c.dataloader.batch_size_train == 64
    assert c.dataloader.batch_size_test == 32
    assert c.model.backbone_name == "ViT-B/16"
    assert c.input.size == (224, 224)


def test_opts_merge():
    c = Config()
    merge_from_opts(
        c,
        [
            "TRAINER.ADAPTER.USE_GP", "True",
            "TRAINER.ADAPTER.GP_BETA", "0.01",
            "DATASET.NUM_SHOTS", "16",
            "OPTIM.LR", "0.5",
            "SEED", "7",
        ],
    )
    assert c.adapter.use_gp is True
    assert c.adapter.gp_beta == 0.01
    assert c.dataset.num_shots == 16
    assert c.optim.lr == 0.5
    assert c.seed == 7


def test_cli_parsing():
    c = parse_args_to_config(
        [
            "--dataset", "Caltech101",
            "--shots", "4",
            "--backbone", "RN50",
            "--use-gp",
            "--gp-kernel-type", "rbf",
            "--num-templates", "8",
            "--seed", "3",
            "--output-dir", "/tmp/x",
            "TRAINER.ADAPTER.GP_LR", "0.005",
        ]
    )
    assert c.dataset.name == "Caltech101"
    assert c.dataset.num_shots == 4
    assert c.adapter.use_gp is True
    assert c.adapter.num_templates == 8
    assert c.adapter.gp_lr == 0.005
    assert c.seed == 3
    assert c.output_dir == "/tmp/x"


def test_config_roundtrip_dict():
    d = config_to_dict(Config())
    assert d["adapter"]["use_gp"] is False
    assert d["input"]["size"] == [224, 224]
    assert d["optim"]["betas"] == [0.9, 0.999]


def test_unknown_opts_key_warns_with_suggestion(capsys):
    c = Config()
    merge_from_opts(c, ["TRAINER.ADAPTER.USE_G", "True"])
    out = capsys.readouterr().out
    assert "[WARN] unknown config key" in out
    assert "use_gp" in out  # near-miss suggestion
    assert c.adapter.use_gp is False  # unchanged


def test_unknown_yaml_section_key_warns(capsys):
    """YAML section merges warn on unknown keys like dotted OPTS do — a
    typo'd key in an experiment YAML must not silently revert to defaults."""
    from clip_gp_tpu.core.config import merge_config_dict

    c = Config()
    merge_config_dict(c, {"MODEL": {"BACKBONE_NAM": "TEST-ViT"}})
    out = capsys.readouterr().out
    assert "[WARN] unknown config key 'MODEL.BACKBONE_NAM'" in out
    assert "backbone_name" in out  # near-miss suggestion
    assert c.model.backbone_name == "RN50"  # unchanged


def test_model_flat_backbone_name_merges():
    """MODEL.BACKBONE_NAME (the OPTS spelling) works in YAML alongside the
    reference's nested MODEL.BACKBONE.NAME (ref: utils/config.py:203-263)."""
    from clip_gp_tpu.core.config import merge_config_dict

    c = Config()
    merge_config_dict(c, {"MODEL": {"BACKBONE_NAME": "TEST-ViT"}})
    assert c.model.backbone_name == "TEST-ViT"
    c2 = Config()
    merge_config_dict(c2, {"MODEL": {"BACKBONE": {"NAME": "TEST-RN"}}})
    assert c2.model.backbone_name == "TEST-RN"


def test_shipped_configs_merge_without_warnings(capsys):
    """Every YAML in configs/ addresses only known fields."""
    import glob

    for f in sorted(
        glob.glob("configs/trainers/*.yaml") + glob.glob("configs/datasets/*.yaml")
    ):
        c = Config()
        merge_config_from_file(c, f)
    assert "[WARN]" not in capsys.readouterr().out


def test_nested_backbone_and_loader_typos_warn(capsys):
    """Unknown keys one level deeper — inside MODEL.BACKBONE and
    DATALOADER.TRAIN_X/TEST — warn too instead of silently vanishing."""
    from clip_gp_tpu.core.config import merge_config_dict

    c = Config()
    merge_config_dict(c, {"MODEL": {"BACKBONE": {"NAM": "ViT-B/16"}}})
    merge_config_dict(c, {"DATALOADER": {"TRAIN_X": {"BATCH_SIZ": 64}}})
    out = capsys.readouterr().out
    assert "unknown config key 'MODEL.BACKBONE.NAM'" in out
    assert "unknown config key 'DATALOADER.TRAIN_X.BATCH_SIZ'" in out
    assert c.model.backbone_name == "RN50"
    assert c.dataloader.batch_size_train == 128


def test_quoted_yaml_bool_coerces():
    """A quoted "false" (e.g. emitted by a sweep-grid templater) must not
    land as a truthy string on a bool field."""
    from clip_gp_tpu.core.config import merge_config_dict

    c = Config()
    merge_config_dict(c, {"MODEL": {"INT8_INFERENCE": "false"}})
    assert c.model.int8_inference is False
    merge_config_dict(c, {"MODEL": {"INT8_INFERENCE": "True"}})
    assert c.model.int8_inference is True
    merge_config_dict(c, {"TRAINER": {"ADAPTER": {"USE_GP": "false"}}})
    assert c.adapter.use_gp is False


def test_optim_scheduler_knobs_merge_without_warning(capsys):
    """The reference setattr's arbitrary OPTIM.* YAML keys (ref:
    utils/config.py:241), so ETA_MIN / GAMMA / MILESTONES / STEP_SIZE /
    START_FACTOR / END_FACTOR / TOTAL_ITERS are part of its config surface;
    our typed OptimConfig must accept them rather than warn-and-drop."""
    from clip_gp_tpu.core.config import Config, merge_config_dict

    c = Config()
    merge_config_dict(c, {"OPTIM": {
        "ETA_MIN": 1e-5,
        "GAMMA": 0.5,
        "MILESTONES": [2, 4],
        "STEP_SIZE": 7,
        "START_FACTOR": 0.9,
        "END_FACTOR": 0.1,
        "TOTAL_ITERS": 11,
    }})
    out = capsys.readouterr().out
    assert "[WARN]" not in out
    assert c.optim.eta_min == 1e-5
    assert c.optim.gamma == 0.5
    assert c.optim.milestones == [2, 4]
    assert c.optim.step_size == 7
    assert c.optim.start_factor == 0.9
    assert c.optim.end_factor == 0.1
    assert c.optim.total_iters == 11


def test_lr_schedule_derived_defaults_and_eta_min_floor():
    """None scheduler knobs derive the reference's defaults; a configured
    eta_min is an absolute cosine floor (ref: utils/optimization.py:232-276)."""
    from clip_gp_tpu.core.config import OptimConfig
    from clip_gp_tpu.runtime.optim import build_lr_schedule

    # step: step_size None -> max_epoch // 3, gamma None -> 0.1
    c = OptimConfig(lr=1.0, max_epoch=9, lr_scheduler="step")
    sched = build_lr_schedule(c)
    assert sched(0) == 1.0 and abs(sched(3) - 0.1) < 1e-12

    # exponential: gamma None -> 0.95
    c = OptimConfig(lr=1.0, max_epoch=9, lr_scheduler="exponential")
    assert abs(build_lr_schedule(c)(1) - 0.95) < 1e-12

    # cosine floor reaches eta_min at max_epoch regardless of base lr
    for lr in (0.002, 0.02):
        c = OptimConfig(lr=lr, max_epoch=10, lr_scheduler="cosine",
                        eta_min=1e-5)
        assert abs(build_lr_schedule(c)(10) - 1e-5) < 1e-12


def test_opts_parse_list_literals():
    from clip_gp_tpu.core.config import Config, merge_from_opts

    c = Config()
    merge_from_opts(c, ["OPTIM.MILESTONES", "[10, 20]"])
    assert c.optim.milestones == [10, 20]
