"""Method registration: importing this package registers all trainers."""

from clip_gp_tpu.methods import adapter  # noqa: F401
