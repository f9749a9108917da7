from lynx_tpu.models.ares import (  # noqa: F401
    ares_ea_segment,
    ares_lattice,
)
