from lynx_tpu.converters import astra  # noqa: F401
from lynx_tpu.converters import latticejson  # noqa: F401
from lynx_tpu.converters import nxtables  # noqa: F401
from lynx_tpu.converters import ocelot  # noqa: F401
from lynx_tpu.converters import ocelot_shim  # noqa: F401
