"""Cold-start mitigation: the persistent compilation cache must actually
eliminate recompiles across PROCESS RESTARTS (bench.py and the serving
daemon set `jax_compilation_cache_dir=.jax_cache`; BENCH_r01 measured
248 s of first-process compiles, so a silent cache regression is a 4-min
per-restart tax).

Two fresh subprocesses jit the same program against one cache dir; jax's
monitoring counters distinguish persistent-cache hits from misses: run 1
must record misses (and populate the dir), run 2 must be all hits with
zero misses.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
cache_dir = sys.argv[1]
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
import jax.numpy as jnp
from jax._src import monitoring

events = []
monitoring.register_event_listener(
    lambda name, **kw: events.append(name)
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
# bench.py/serve set a 1.0s threshold; force-cache everything here so a
# tiny test program exercises the same machinery
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

def f(x, w):
    return jnp.tanh(x @ w).sum(axis=-1)

out = jax.jit(f)(jnp.ones((64, 128)), jnp.ones((128, 32)))
out.block_until_ready()
hits = sum(1 for e in events if e == "/jax/compilation_cache/cache_hits")
misses = sum(1 for e in events if e == "/jax/compilation_cache/cache_misses")
print(f"CACHE hits={hits} misses={misses}", flush=True)
"""


def _run(cache_dir: str) -> tuple[int, int, str]:
    env = dict(os.environ)
    # CPU-only subprocess: drop TPU-plugin site dirs from PYTHONPATH — their
    # sitecustomize dials the remote TPU at interpreter startup and hangs
    # every new python process when the tunnel is down.
    keep = [
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join([REPO, *keep])
    # Generous timeout: the CI host can be 1 core and heavily contended.
    out = subprocess.run(
        [sys.executable, "-c", WORKER, cache_dir],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=900,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("CACHE ")][0]
    parts = dict(kv.split("=") for kv in line.split()[1:])
    return int(parts["hits"]), int(parts["misses"]), out.stdout


def test_persistent_cache_across_process_restart(tmp_path):
    cache_dir = str(tmp_path / "jax_cache")
    hits1, misses1, _ = _run(cache_dir)
    assert misses1 >= 1 and hits1 == 0, (hits1, misses1)
    assert any(
        name.endswith("-cache") for name in os.listdir(cache_dir)
    ), os.listdir(cache_dir)

    hits2, misses2, out2 = _run(cache_dir)
    assert misses2 == 0, f"cache MISSED on restart: {out2}"
    assert hits2 >= 1, out2


def test_cli_enables_cache(tmp_path, monkeypatch):
    """Every CLI goes through apply_platform_env, which must point jax at
    the persistent cache (honoring $MARIGOLD_TPU_COMPILE_CACHE)."""
    import jax

    from marigold_tpu.cli import apply_platform_env

    cache_dir = str(tmp_path / "cc")
    monkeypatch.setenv("MARIGOLD_TPU_COMPILE_CACHE", cache_dir)
    prev = jax.config.jax_compilation_cache_dir
    try:
        apply_platform_env()
        assert jax.config.jax_compilation_cache_dir == cache_dir
        assert os.path.isdir(cache_dir)
    finally:
        # don't leave the process-global config pointing at the tmpdir
        jax.config.update("jax_compilation_cache_dir", prev)
