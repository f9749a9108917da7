from lynx_tpu.particles.beam import Beam  # noqa: F401
from lynx_tpu.particles.parameter_beam import ParameterBeam  # noqa: F401
from lynx_tpu.particles.particle_beam import ParticleBeam  # noqa: F401
