"""Physical constants used across lynx-tpu.

The reference uses two subtly different values for the electron rest energy
(reference ``lynx/track_methods.py:9-11`` vs ``lynx/accelerator/element.py:20``);
both are reproduced here exactly so that numerical parity holds:

* ``REST_ENERGY_EV``  = m_e c^2 / e        (used by the R-matrix kernels)
* ``ELECTRON_MASS_EV`` = CODATA "electron mass energy equivalent in MeV" * 1e6
  (used by the cavity physics and beam relativistics)
"""

from scipy import constants
from scipy.constants import physical_constants

#: Electron rest energy in eV, computed from m_e c^2 / e
#: (matches reference ``lynx/track_methods.py:9-11``).
REST_ENERGY_EV: float = (
    constants.electron_mass
    * constants.speed_of_light**2
    / constants.elementary_charge
)

#: Electron rest energy in eV from the CODATA table
#: (matches reference ``lynx/accelerator/element.py:20``).
ELECTRON_MASS_EV: float = (
    physical_constants["electron mass energy equivalent in MeV"][0] * 1e6
)

#: Speed of light in m/s.
SPEED_OF_LIGHT: float = constants.speed_of_light
