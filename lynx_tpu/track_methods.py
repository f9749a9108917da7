"""Compatibility alias for the reference's ``lynx.track_methods`` module.

Users of the reference import transfer-map kernels from here
(reference ``lynx/track_methods.py``); the implementations live in
``lynx_tpu.ops.rmatrix``.
"""

from lynx_tpu.constants import REST_ENERGY_EV as REST_ENERGY  # noqa: F401
from lynx_tpu.ops.rmatrix import (  # noqa: F401
    base_rmatrix,
    misalignment_matrix,
    rotation_matrix,
)
