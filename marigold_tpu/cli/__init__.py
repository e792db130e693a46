"""CLI entry points.

All CLIs honor the JAX_PLATFORMS environment variable even when a site
plugin (e.g. the axon TPU plugin) force-sets jax's platform config at
interpreter start — an explicit env var is user intent.
"""

import os


def apply_platform_env() -> None:
    env = os.environ.get("JAX_PLATFORMS")
    if env:
        import jax

        try:
            if jax.config.jax_platforms != env:
                jax.config.update("jax_platforms", env)
        except Exception:
            pass
    # every CLI gets warm restarts: big-program compiles (minutes for the
    # fused serving program) persist across processes
    from marigold_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
