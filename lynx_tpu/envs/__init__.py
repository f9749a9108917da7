from lynx_tpu.envs.ares_ea import (  # noqa: F401
    AresEATransverseTuning,
    EnvParams,
    EnvState,
    make_env,
)
