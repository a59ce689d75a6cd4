"""Native host-pipeline components (C++ via ctypes).

``fast_decode``: fused JPEG decode → bicubic resize → center crop using
libjpeg(-turbo)'s DCT-domain scaling — the host-side hot path once the frozen
tower exceeds ~10k imgs/s per chip. Compiled on first use; every caller falls
back to the PIL path when the toolchain or libjpeg is unavailable.
"""

from clip_gp_tpu.native.loader import (  # noqa: F401
    decode_resize_crop,
    decode_rrc,
    jpeg_dims,
    native_available,
)
