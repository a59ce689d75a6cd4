"""Method registration: importing this package registers all six trainers
(Adapter, CLIP-Adapter, TaskRes, Tip-Adapter[-F], Adapter-CoOp,
Adapter-CoCoOp)."""

from clip_gp_tpu.methods import (  # noqa: F401
    adapter,
    clip_adapter,
    cocoop,
    coop,
    taskres,
    tip_adapter,
)
