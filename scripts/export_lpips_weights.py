#!/usr/bin/env python
"""Convert torchvision VGG16 + LPIPS linear-head checkpoints into the
offline npz that `marigold_tpu/eval/lpips.py` loads.

Role parity: the reference's IID eval pulls torchmetrics LPIPS
(reference script/iid/eval.py:44-48), which downloads pretrained VGG16 and
the LPIPS v0.1 calibration weights at runtime. This environment (and many
production TPU pods) has no egress, so the metric is offline-first: run
this converter ONCE on any machine that has the two source checkpoints,
then ship the npz (set $LPIPS_WEIGHTS or pass --lpips_weights to
cli/eval.py).

Source checkpoints (standard public files, any of):
  --vgg16_pth   torchvision `vgg16-397923af.pth` (plain state_dict with
                `features.{idx}.weight/bias` keys), or a full torchmetrics
                LPIPS state_dict (keys `net.slice*/...` are NOT supported —
                use the richzhang layout below for the heads and
                torchvision for the trunk).
  --lpips_pth   LPIPS v0.1 linear heads — richzhang/PerceptualSimilarity
                `lpips/weights/v0.1/vgg.pth` (keys `lin{k}.model.1.weight`)
                or the same tensors under `net.lin{k}...`/`lins.{k}.weight`.

Self-test / CI mode:
  --random_init writes a correctly-shaped randomly-initialized npz (the
                full conversion path minus the pretrained values) so the
                loader, eval wiring, and shapes are testable offline.

Output layout (flat npz, what eval/lpips.py expects):
  features.{idx}.weight / .bias   (OIHW conv weights, idx in VGG16
                                   `features` indexing)
  lins.{k}.weight                 ([1,C,1,1] calibration convs, k=0..4)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# torchvision VGG16 `features` conv indices (same table as eval/lpips.py)
VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
# (out_ch, in_ch) per conv, in order
VGG16_CONV_SHAPES = [
    (64, 3), (64, 64),
    (128, 64), (128, 128),
    (256, 128), (256, 256), (256, 256),
    (512, 256), (512, 512), (512, 512),
    (512, 512), (512, 512), (512, 512),
]
# channel width at each of the 5 LPIPS taps (relu1_2..relu5_3)
LPIPS_TAP_CHANNELS = [64, 128, 256, 512, 512]


def _load_state_dict(path: str) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: np.asarray(v.detach().cpu().numpy(), np.float32)
            for k, v in obj.items()}


def _extract_vgg(flat: dict) -> dict:
    out = {}
    for i, idx in enumerate(VGG16_CONV_IDX):
        o, c = VGG16_CONV_SHAPES[i]
        try:
            w = flat[f"features.{idx}.weight"]
            b = flat[f"features.{idx}.bias"]
        except KeyError:
            raise SystemExit(
                f"missing key features.{idx}.weight — is this a torchvision "
                "VGG16 state_dict (vgg16-397923af.pth)?"
            )
        if w.shape != (o, c, 3, 3):
            raise SystemExit(
                f"features.{idx}.weight has shape {w.shape}, expected "
                f"{(o, c, 3, 3)}"
            )
        out[f"features.{idx}.weight"] = w
        out[f"features.{idx}.bias"] = b
    return out


def _extract_lins(flat: dict) -> dict:
    out = {}
    for k in range(5):
        cand = [
            f"lin{k}.model.1.weight",        # richzhang PerceptualSimilarity
            f"net.lin{k}.model.1.weight",    # torchmetrics-wrapped
            f"lins.{k}.weight",              # already-converted layout
        ]
        w = None
        for name in cand:
            if name in flat:
                w = flat[name]
                break
        if w is None:
            raise SystemExit(
                f"no linear-head key for tap {k}; tried {cand}. Expected a "
                "LPIPS v0.1 vgg.pth (richzhang/PerceptualSimilarity)."
            )
        c = LPIPS_TAP_CHANNELS[k]
        w = w.reshape(1, -1, 1, 1)
        if w.shape[1] != c:
            raise SystemExit(
                f"lins.{k} has {w.shape[1]} channels, expected {c}"
            )
        # LPIPS heads are trained non-negative; clamp like lpips does at eval
        out[f"lins.{k}.weight"] = np.maximum(w, 0.0).astype(np.float32)
    return out


def random_init_flat(seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    flat = {}
    for i, idx in enumerate(VGG16_CONV_IDX):
        o, c = VGG16_CONV_SHAPES[i]
        # He-style init keeps activations finite through 13 conv+relu layers
        flat[f"features.{idx}.weight"] = (
            rng.standard_normal((o, c, 3, 3)) * np.sqrt(2.0 / (c * 9))
        ).astype(np.float32)
        flat[f"features.{idx}.bias"] = np.zeros(o, np.float32)
    for k, c in enumerate(LPIPS_TAP_CHANNELS):
        flat[f"lins.{k}.weight"] = (
            rng.uniform(0.0, 1.0, (1, c, 1, 1)).astype(np.float32) / c
        )
    return flat


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--vgg16_pth", type=str, default=None,
                    help="torchvision vgg16-397923af.pth")
    ap.add_argument("--lpips_pth", type=str, default=None,
                    help="LPIPS v0.1 linear heads (vgg.pth)")
    ap.add_argument("--random_init", action="store_true",
                    help="write a correctly-shaped random-weight npz "
                         "(offline self-test; NOT a perceptual metric)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-o", "--out", type=str, required=True,
                    help="output .npz path")
    args = ap.parse_args(argv)

    if args.random_init:
        flat = random_init_flat(args.seed)
    else:
        if not (args.vgg16_pth and args.lpips_pth):
            ap.error("--vgg16_pth and --lpips_pth are both required "
                     "(or use --random_init)")
        flat = {}
        flat.update(_extract_vgg(_load_state_dict(args.vgg16_pth)))
        flat.update(_extract_lins(_load_state_dict(args.lpips_pth)))

    np.savez(args.out, **flat)
    n_params = sum(v.size for v in flat.values())
    print(f"wrote {args.out}: {len(flat)} tensors, {n_params/1e6:.1f}M params")

    # verify the produced file round-trips through the runtime loader
    # (on CPU — the check must not grab/compile on a TPU)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from marigold_tpu.eval.lpips import LPIPS

    m = LPIPS.from_file(args.out)
    assert m is not None
    d_same = m(np.zeros((32, 32, 3), np.float32), np.zeros((32, 32, 3), np.float32))
    print(f"self-check: lpips(x, x) = {d_same:.2e} (should be ~0)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
