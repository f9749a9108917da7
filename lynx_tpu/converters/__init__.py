from lynx_tpu.converters import astra  # noqa: F401
