"""Protocol smoke test: drive cli/benchmark.py --benchmark nyu end-to-end
(infer -> eval -> summary txt) against the SHIPPED dataset config and split
list, on a synthetic mini-NYU tree containing just the first N split
entries. Validates the full zero-shot eval protocol plumbing
(reference script/depth/eval/11_infer_nyu.sh + 12_eval_nyu.sh)."""

import os

import numpy as np
import pytest
from PIL import Image

from fixtures import make_tiny_checkpoint

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NYU_SPLIT = os.path.join(REPO, "data_split/nyu_depth/labeled/filename_list_test.txt")
N_SAMPLES = 2


@pytest.fixture(scope="module")
def mini_nyu_tree(tmp_path_factory, rng_module):
    """base_data_dir with nyuv2/nyu_labeled_extracted.tar/ as a DIRECTORY
    (the tar-or-dir reader treats a non-file path as a directory) holding
    the first N entries of the shipped split list at real NYU geometry."""
    base = tmp_path_factory.mktemp("nyu_base")
    root = base / "nyuv2" / "nyu_labeled_extracted.tar"
    with open(NYU_SPLIT) as f:
        lines = [ln.split() for ln in f.readlines()[:N_SAMPLES]]
    for rgb_rel, depth_rel, filled_rel in lines:
        for rel in (rgb_rel, depth_rel, filled_rel):
            os.makedirs(os.path.dirname(root / rel), exist_ok=True)
        rgb = rng_module.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        # smooth-ish synthetic depth in mm within NYU's [1e-3, 10] m range
        depth_m = 2.0 + 1.5 * np.sin(
            np.linspace(0, 3, 480)[:, None] + np.linspace(0, 2, 640)[None, :]
        )
        depth_mm = (depth_m * 1000).astype(np.uint16)
        Image.fromarray(rgb).save(root / rgb_rel)
        Image.fromarray(depth_mm).save(root / depth_rel)
        Image.fromarray(depth_mm).save(root / filled_rel)
    return str(base)


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(7)


def test_benchmark_nyu_protocol(tmp_path, tmp_path_factory, mini_nyu_tree):
    from marigold_tpu.cli.benchmark import main

    ckpt = make_tiny_checkpoint(
        str(tmp_path_factory.mktemp("ckpt")), mode="depth"
    )
    out_dir = tmp_path / "eval_out"
    rc = main([
        "--modality", "depth",
        "--benchmark", "nyu",
        "--checkpoint", ckpt,
        "--base_data_dir", mini_nyu_tree,
        "--output_dir", str(out_dir),
        "--ensemble_size", "2",  # smoke override; protocol default is 10
        "--processing_res", "64",  # smoke override; protocol pins 0 (native)
        "--limit", str(N_SAMPLES),
    ], )
    assert rc == 0

    metric_dir = out_dir / "depth" / "nyu" / "eval_metric"
    txt = metric_dir / "eval_metrics-least_square.txt"
    csv_path = metric_dir / "per_sample_metrics.csv"
    assert txt.exists() and csv_path.exists()
    text = txt.read_text()
    assert "abs_relative_difference" in text
    assert "delta1_acc" in text
    # per-sample CSV has one row per sample
    rows = csv_path.read_text().strip().splitlines()
    assert len(rows) == 1 + N_SAMPLES

    # predictions named per the NYU naming mode, full input resolution
    pred_dir = out_dir / "depth" / "nyu" / "prediction" / "depth_npy"
    preds = sorted(os.listdir(pred_dir))
    assert len(preds) == N_SAMPLES
    p = np.load(pred_dir / preds[0])
    assert p.shape == (480, 640)
    assert np.isfinite(p).all() and p.min() >= 0.0 and p.max() <= 1.0
