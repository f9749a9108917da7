from lynx_tpu.models.ares import (  # noqa: F401
    ares_ea_segment,
    ares_lattice,
)
from lynx_tpu.models.fodo import fodo_cell, fodo_lattice  # noqa: F401
