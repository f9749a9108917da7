from lynx_tpu.accelerator.aperture import Aperture  # noqa: F401
from lynx_tpu.accelerator.bpm import BPM  # noqa: F401
from lynx_tpu.accelerator.cavity import Cavity  # noqa: F401
from lynx_tpu.accelerator.correctors import (  # noqa: F401
    HorizontalCorrector,
    VerticalCorrector,
)
from lynx_tpu.accelerator.custom_transfer_map import CustomTransferMap  # noqa: F401
from lynx_tpu.accelerator.dipole import Dipole, RBend  # noqa: F401
from lynx_tpu.accelerator.drift import Drift  # noqa: F401
from lynx_tpu.accelerator.element import Element  # noqa: F401
from lynx_tpu.accelerator.marker import Marker  # noqa: F401
from lynx_tpu.accelerator.quadrupole import Quadrupole  # noqa: F401
from lynx_tpu.accelerator.screen import Screen  # noqa: F401
from lynx_tpu.accelerator.segment import Segment  # noqa: F401
from lynx_tpu.accelerator.solenoid import Solenoid  # noqa: F401
from lynx_tpu.accelerator.undulator import Undulator  # noqa: F401
