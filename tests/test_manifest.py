"""Checkpoint manifest validation (models/manifest.py): the pre-flight
gate of the real-weights parity runbook. Validates from safetensors
HEADERS only — tests assert both the happy path (our own fixture
checkpoints pass) and that each corruption mode is diagnosed by name."""

import json
import os
import shutil

import numpy as np
import pytest

from marigold_tpu.models.manifest import (
    expected_component_manifest,
    format_report,
    validate_checkpoint,
)
from tests.fixtures import TINY_VAE, make_tiny_checkpoint


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    return make_tiny_checkpoint(str(d))


def test_fixture_checkpoint_validates(ckpt):
    report = validate_checkpoint(ckpt)
    assert report["ok"], format_report(report)
    comps = report["components"]
    assert set(comps) == {"unet", "vae", "text_encoder"}
    for c in comps.values():
        assert c["ok"] and not c["missing"] and not c["mismatched"]
        assert c["n_expected"] == c["n_actual"]


def test_iid_lighting_checkpoint_validates(tmp_path):
    d = make_tiny_checkpoint(
        str(tmp_path / "iid"), mode="iid", iid_variant="lighting"
    )
    report = validate_checkpoint(d)
    assert report["ok"], format_report(report)


def test_expected_manifest_is_torch_layout():
    """Expected shapes must be torch-layout: conv weights OIHW, linear
    weights [out, in] — i.e. what safetensors files on the hub carry."""
    from marigold_tpu.models.vae import VAEConfig

    man = expected_component_manifest("vae", TINY_VAE)
    w = man["encoder.conv_in.weight"]
    assert len(w) == 4 and w[2] == w[3] == 3  # OIHW: trailing kxk
    assert w[1] == 3  # in_channels=3 RGB in position 1 (I of OIHW)


def _rewrite_without_key(st_path, drop_key=None, reshape_key=None):
    """Rewrite a safetensors file dropping or reshaping one tensor (via
    numpy round-trip, not header surgery)."""
    from safetensors.numpy import load_file, save_file

    tensors = load_file(st_path)
    if drop_key is not None:
        tensors.pop(drop_key)
    if reshape_key is not None:
        t = tensors[reshape_key]
        tensors[reshape_key] = np.zeros(
            (t.shape[0] + 1,) + t.shape[1:], t.dtype
        )
    save_file(tensors, st_path)


def test_missing_tensor_is_diagnosed(ckpt, tmp_path):
    broken = str(tmp_path / "broken")
    shutil.copytree(ckpt, broken)
    st = os.path.join(broken, "vae", "diffusion_pytorch_model.safetensors")
    _rewrite_without_key(st, drop_key="encoder.conv_in.weight")
    report = validate_checkpoint(broken)
    assert not report["ok"]
    vae = report["components"]["vae"]
    assert "encoder.conv_in.weight" in vae["missing"]
    assert "encoder.conv_in.weight" in format_report(report)


def test_shape_mismatch_is_diagnosed(ckpt, tmp_path):
    broken = str(tmp_path / "broken2")
    shutil.copytree(ckpt, broken)
    st = os.path.join(broken, "unet", "diffusion_pytorch_model.safetensors")
    _rewrite_without_key(st, reshape_key="conv_out.bias")
    report = validate_checkpoint(broken)
    assert not report["ok"]
    mm = report["components"]["unet"]["mismatched"]
    assert "conv_out.bias" in mm
    assert mm["conv_out.bias"]["actual"][0] == \
        mm["conv_out.bias"]["expected"][0] + 1


def test_missing_scheduler_fails(ckpt, tmp_path):
    broken = str(tmp_path / "broken3")
    shutil.copytree(ckpt, broken)
    shutil.rmtree(os.path.join(broken, "scheduler"))
    report = validate_checkpoint(broken)
    assert not report["ok"]
    assert any("scheduler" in n for n in report["notes"])


def test_unexpected_keys_warn_but_pass(ckpt, tmp_path):
    """Extra tensors the loader ignores must be reported but not fail
    (mirrors weights.load_* which consume only known names)."""
    extra = str(tmp_path / "extra")
    shutil.copytree(ckpt, extra)
    st = os.path.join(extra, "vae", "diffusion_pytorch_model.safetensors")
    from safetensors.numpy import load_file, save_file

    tensors = load_file(st)
    tensors["totally_new.weight"] = np.zeros((2, 2), np.float32)
    save_file(tensors, st)
    report = validate_checkpoint(extra)
    assert report["ok"]
    assert "totally_new.weight" in report["components"]["vae"]["unexpected"]


def test_nondirectory_and_empty(tmp_path):
    assert not validate_checkpoint(str(tmp_path / "nope"))["ok"]
    empty = tmp_path / "empty"
    empty.mkdir()
    report = validate_checkpoint(str(empty))
    assert not report["ok"]


def test_cli_exit_codes(ckpt, tmp_path, capsys):
    from marigold_tpu.cli.validate_ckpt import main

    assert main([ckpt]) == 0
    out = capsys.readouterr().out
    assert "RESULT: OK" in out
    assert main([ckpt, "--json"]) == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rep = json.loads(line)
    assert rep["ok"] and rep["checkpoint"] == ckpt
    assert main([str(tmp_path / "missing_dir")]) == 1
