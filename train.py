"""CLI entry point — flag- and flow-compatible with the reference train.py.

Flow (ref: train.py:57-107): parse config → logger (log.txt tee) → seed →
data manager → trainer (via registry) → train / eval-only / no-train.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def print_args(config):
    from clip_gp_tpu.core.config import print_config

    print_config(config)




def main(argv=None):
    # Sweep subprocess backend pins each child to one chip of a multi-chip
    # host (the TPU analog of the reference's CUDA_VISIBLE_DEVICES pinning,
    # ref: utils/hparam_search.py:201-207). Must happen before jax initializes.
    device = os.environ.get("CLIP_GP_TPU_DEVICE")
    if device:
        os.environ.setdefault("TPU_VISIBLE_DEVICES", device)
    # The axon TPU plugin ignores JAX_PLATFORMS, and initializing a wedged
    # tunnel hangs forever — this is the supported way to pin the CLI to the
    # host CPU (jax.config must be set before the backend initializes).
    if os.environ.get("CLIP_GP_TPU_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    # persistent XLA compile cache (measured 3-4x faster warm starts)
    from clip_gp_tpu.runtime import compile_cache

    compile_cache.enable()

    from clip_gp_tpu.core.config import parse_args_to_config, save_config_to_file
    from clip_gp_tpu.core.logging import setup_logger
    from clip_gp_tpu.core.registry import build_trainer
    from clip_gp_tpu.core.seeding import set_random_seed
    from clip_gp_tpu.data.pipeline import build_data_manager

    # register datasets + trainers
    import clip_gp_tpu.data.datasets  # noqa: F401
    import clip_gp_tpu.methods  # noqa: F401

    config = parse_args_to_config(argv)
    setup_logger(config.output_dir)
    print_args(config)

    if config.seed >= 0:
        print(f"Setting fixed seed: {config.seed}")
        set_random_seed(config.seed)

    try:
        save_config_to_file(config, str(Path(config.output_dir) / "config.json"))
    except OSError:
        pass

    import jax

    print(f"JAX devices: {jax.devices()}")

    dm = build_data_manager(config)
    trainer = build_trainer(config, dm)

    if config.eval_only:
        trainer.build_model()
        trainer.load_model(config.model_dir, epoch=config.load_epoch)
        trainer.time_start = __import__("time").time()
        trainer.test()
        return
    if not config.no_train:
        trainer.train()


if __name__ == "__main__":
    main()
