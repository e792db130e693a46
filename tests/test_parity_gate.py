"""Parity-gate tests: the `--parity` flag must actually pin the three
documented serving-path deviations (docs/PARITY.md 'Reproduction pins')
all the way down to the calls that implement them — the flash-attention
softmax mode at the dispatch in ops/attention.py, and the ensemble range
regularizer resolution + member-0 gauge anchor at the ensemble_depth
call inside the fused program. Reference-faithful targets: xformers
exact softmax, the full-res regularizer, and the unanchored alignment
objective (/root/reference/marigold/util/ensemble.py:146-173).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import yaml
from PIL import Image

from fixtures import make_tiny_checkpoint

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def restore_softmax():
    from marigold_tpu.ops import attention

    before = attention.get_flash_softmax()
    yield
    attention.set_flash_softmax(before)


def test_set_flash_softmax_reaches_dispatch(monkeypatch, restore_softmax):
    """The runtime setter must change the softmax= argument the dispatch
    hands to the Pallas kernel (not just a dead global)."""
    from marigold_tpu.ops import attention
    from marigold_tpu.ops import flash_attention as fa

    monkeypatch.setattr(attention, "_on_tpu", lambda: True)
    seen = []

    def spy(q, k, v, softmax):
        seen.append(softmax)
        return jnp.zeros_like(q)

    monkeypatch.setattr(fa, "flash_attention_dt", spy)
    q = jnp.zeros((1, 1024, 64), jnp.float32)  # kv fits resident budget

    attention.set_flash_softmax("shifted")
    attention.scaled_dot_product_attention(q, q, q, num_heads=1)
    attention.set_flash_softmax("online")
    attention.scaled_dot_product_attention(q, q, q, num_heads=1)
    assert seen == ["shifted", "online"]

    with pytest.raises(ValueError):
        attention.set_flash_softmax("bogus")


def test_fused_program_cache_keys_on_softmax_mode(restore_softmax):
    """Switching softmax mode must not reuse a program compiled under the
    other mode (the program cache key includes the mode)."""
    from marigold_tpu.ops.attention import set_flash_softmax
    from marigold_tpu.pipelines.base import DiffusionCore

    class Probe(DiffusionCore):
        def __init__(self):  # no checkpoint needed to exercise the key
            self.mesh = None

        def _cached_program(self, key, build):
            return key

    p = Probe()
    set_flash_softmax("shifted")
    k1 = p.get_fused_fn(64, 64, 1, 2, 2, "depth", 0)
    set_flash_softmax("online")
    k2 = p.get_fused_fn(64, 64, 1, 2, 2, "depth", 0)
    assert k1 != k2


def _build_nyu_mini_tree(base, n, rng):
    """First n NYU split entries as a synthetic data tree (same scheme as
    tests/test_benchmark_protocol.py)."""
    from marigold_tpu.cli.benchmark import PROTOCOLS

    cfg_path = PROTOCOLS["depth"]["nyu"][0]
    with open(os.path.join(REPO, cfg_path)) as f:
        ds = yaml.safe_load(f)["dataset"]
    with open(os.path.join(REPO, ds["filenames"])) as f:
        lines = [ln.split() for ln in f.readlines()[:n] if ln.strip()]
    root = os.path.join(base, ds["dir"])
    for rgb_rel, depth_rel, filled_rel in lines:
        p = os.path.join(root, rgb_rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        Image.fromarray(
            rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        ).save(p)
        g = np.sin(np.linspace(0, 3, 480)[:, None]
                   + np.linspace(0, 2, 640)[None, :])
        mm = ((2.0 + 1.5 * (g + 1) / 2) * 1000).astype(np.uint16)
        for rel in (depth_rel, filled_rel):
            q = os.path.join(root, rel)
            os.makedirs(os.path.dirname(q), exist_ok=True)
            Image.fromarray(mm).save(q)


def _run_benchmark(tmp_path, rng, extra, reg_spy, monkeypatch):
    from marigold_tpu.cli.benchmark import main
    from marigold_tpu.pipelines import ensemble as ens

    real = ens.ensemble_depth

    def spy(preds, **kw):
        reg_spy.append((kw.get("reg_max_res"), kw.get("gauge_anchor")))
        return real(preds, **kw)

    monkeypatch.setattr(ens, "ensemble_depth", spy)
    base = tmp_path / "base_data"
    if not base.exists():
        _build_nyu_mini_tree(str(base), 1, rng)
    ckpt = str(tmp_path / "ckpt")
    if not os.path.isdir(ckpt):
        make_tiny_checkpoint(ckpt, mode="depth")
    rc = main([
        "--modality", "depth", "--benchmark", "nyu",
        "--checkpoint", ckpt,
        "--base_data_dir", str(base),
        "--output_dir", str(tmp_path / "out"),
        "--ensemble_size", "2", "--denoise_steps", "1",
        "--processing_res", "64", "--limit", "1", "--overwrite",
    ] + extra)
    assert rc == 0


def test_benchmark_parity_pins_reach_calls(tmp_path, rng, monkeypatch,
                                           restore_softmax):
    """`benchmark --parity` end-to-end: ensemble_depth must be traced with
    reg_max_res=1024 + gauge_anchor=False and the attention dispatch must
    be in online mode."""
    from marigold_tpu.ops.attention import get_flash_softmax

    monkeypatch.setenv("MARIGOLD_TPU_FLASH_SOFTMAX", "shifted")
    reg = []
    _run_benchmark(tmp_path, rng, ["--parity"], reg, monkeypatch)
    assert reg and all(r == (1024, False) for r in reg)
    assert get_flash_softmax() == "online"
    assert os.environ.get("MARIGOLD_TPU_FLASH_SOFTMAX") == "online"

    # explicit --ensemble_reg_max_res / --ensemble_gauge_anchor beat
    # --parity's 1024 / 0
    reg2 = []
    _run_benchmark(
        tmp_path, rng,
        ["--parity", "--ensemble_reg_max_res", "48",
         "--ensemble_gauge_anchor", "1"],
        reg2, monkeypatch,
    )
    assert reg2 and all(r == (48, True) for r in reg2)
