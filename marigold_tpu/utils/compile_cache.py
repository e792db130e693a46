"""Persistent XLA compilation cache setup.

Cold starts are the one real serving tax on TPU: the fused 768px
10-ensemble program takes minutes to compile the first time
(BENCH_r01: 248 s of init). The persistent cache makes every later
process restart skip those compiles entirely — verified across real
process boundaries by tests/test_compile_cache.py.

The reference has no equivalent (torch eager recompiles nothing but also
fuses nothing); this is the XLA-native answer to its "first call is
slow" warmup note (reference script/depth/run.py warm-up loop).
"""

from __future__ import annotations

import os


def enable_persistent_compile_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Resolution order: explicit arg > $MARIGOLD_TPU_COMPILE_CACHE >
    ``~/.cache/marigold_tpu/jax_cache``. Set
    ``MARIGOLD_TPU_COMPILE_CACHE=0`` to disable. Safe to call more than
    once; returns the directory in use ('' when disabled).
    """
    import jax

    cache_dir = cache_dir or os.environ.get("MARIGOLD_TPU_COMPILE_CACHE")
    if cache_dir == "0":
        return ""
    if not cache_dir:
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "marigold_tpu", "jax_cache"
        )
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError as e:
        # best-effort: a read-only or absent $HOME (deployment containers)
        # must not take down CLI startup — run uncached instead
        import logging

        logging.getLogger(__name__).warning(
            "persistent compile cache disabled: cannot create %s (%s)",
            cache_dir, e,
        )
        return ""
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # only cache programs worth caching (sub-second compiles cost more in
    # disk churn than they save)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
