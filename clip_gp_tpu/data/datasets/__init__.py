"""Dataset registration: importing this package registers all catalogs."""

from clip_gp_tpu.data.datasets import catalog, synthetic  # noqa: F401
