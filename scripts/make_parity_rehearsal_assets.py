"""Fabricate FULL-SIZE synthetic assets for a parity-runbook dress
rehearsal: the four real checkpoint names at real SD2 scale (random
fp16 weights — load cost, program shapes, and every byte of the ingest
path are weight-independent) plus mini eval-data trees for every
benchmark registry entry (first N split-list lines, synthetic images in
each dataset's exact on-disk format, reusing the protocol test's
builders).

This lets `scripts/parity_runbook.sh --skip-download` run end-to-end on
the real chip — validate -> smoke -> full `--parity` eval to the
tabulated summary txt — before any real checkpoint/dataset is ever
reachable (VERDICT r4 #4: every latent bug found in rehearsal is an
hour saved in the one real-checkpoint window). Metrics will be noise
(random weights); the deliverable is that every stage EXECUTES at full
scale.

Reference anchors: checkpoint names/layout per README.md + HF
`prs-eth/marigold-*-v1-1`; eval chains script/depth/eval/{11,12}_*.sh.

Usage:
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python \
      scripts/make_parity_rehearsal_assets.py \
      --ckpt_dir /root/ckpt_synth/parity --data_dir /root/data_synth \
      [--samples 1]
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def make_fullsize_checkpoint(ckpt_dir, mode, iid_variant="appearance"):
    import jax
    import jax.numpy as jnp

    from marigold_tpu.core.scheduler import DiffusionSchedule
    from marigold_tpu.models import clip_text as clip_lib
    from marigold_tpu.models import unet as unet_lib
    from marigold_tpu.models import vae as vae_lib
    from marigold_tpu.models import weights as W

    n_targets = {"appearance": 2, "lighting": 3}[iid_variant]
    if mode == "iid":
        unet_cfg = unet_lib.UNetConfig(
            in_channels=4 * (n_targets + 1), out_channels=4 * n_targets
        )
    else:
        unet_cfg = unet_lib.UNetConfig()  # depth/normals: in 8 / out 4
    vae_cfg = vae_lib.VAEConfig()
    text_cfg = clip_lib.CLIPTextConfig()

    rng = np.random.default_rng(0)

    def materialize(shape_tree):
        return jax.tree_util.tree_map(
            lambda s: (rng.standard_normal(s.shape, dtype=np.float32)
                       * 0.02).astype(np.float16),
            shape_tree,
        )

    k = jax.random.PRNGKey(0)
    W.save_unet(unet_cfg, materialize(jax.eval_shape(
        lambda kk: unet_lib.init_params(kk, unet_cfg, dtype=jnp.float16), k
    )), os.path.join(ckpt_dir, "unet"))
    W.save_vae(vae_cfg, materialize(jax.eval_shape(
        lambda kk: vae_lib.init_params(kk, vae_cfg, dtype=jnp.float16), k
    )), os.path.join(ckpt_dir, "vae"))
    W.save_text_encoder(text_cfg, materialize(jax.eval_shape(
        lambda kk: clip_lib.init_params(kk, text_cfg, dtype=jnp.float16), k
    )), os.path.join(ckpt_dir, "text_encoder"))
    DiffusionSchedule.create().save_pretrained(
        os.path.join(ckpt_dir, "scheduler")
    )

    index = {
        "_class_name": {
            "depth": "MarigoldDepthPipeline",
            "normals": "MarigoldNormalsPipeline",
            "iid": "MarigoldIIDPipeline",
        }[mode],
        "default_denoising_steps": 1 if mode == "depth" else 4,
        "default_processing_resolution": 768,
        "unet": ["diffusers", "UNet2DConditionModel"],
        "vae": ["diffusers", "AutoencoderKL"],
        "scheduler": ["diffusers", "DDIMScheduler"],
        "text_encoder": ["transformers", "CLIPTextModel"],
        "tokenizer": ["transformers", "CLIPTokenizer"],
    }
    if mode == "depth":
        index.update({"scale_invariant": True, "shift_invariant": True})
    if mode == "iid" and iid_variant == "lighting":
        index["target_properties"] = {
            "target_names": ["albedo", "shading", "residual"],
            "albedo": {"prediction_space": "srgb", "up_to_scale": False},
            "shading": {"prediction_space": "linear", "up_to_scale": True},
            "residual": {"prediction_space": "linear", "up_to_scale": True},
        }
    elif mode == "iid":
        index["target_properties"] = {
            "target_names": ["albedo", "material"],
            "albedo": {"prediction_space": "srgb", "up_to_scale": False},
            "material": {
                "prediction_space": "stack",
                "sub_target_names": ["roughness", "metallicity", None],
            },
        }
    with open(os.path.join(ckpt_dir, "model_index.json"), "w") as f:
        json.dump(index, f, indent=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", default="/root/ckpt_synth/parity")
    ap.add_argument("--data_dir", default="/root/data_synth")
    ap.add_argument("--samples", type=int, default=1,
                    help="split-list lines per benchmark entry")
    ap.add_argument("--skip_ckpts", action="store_true")
    ap.add_argument("--skip_data", action="store_true")
    args = ap.parse_args()

    if not args.skip_ckpts:
        jobs = [
            ("marigold-depth-v1-1", "depth", "appearance"),
            ("marigold-normals-v1-1", "normals", "appearance"),
            ("marigold-iid-appearance-v1-1", "iid", "appearance"),
            ("marigold-iid-lighting-v1-1", "iid", "lighting"),
        ]
        for name, mode, variant in jobs:
            d = os.path.join(args.ckpt_dir, name)
            if os.path.exists(os.path.join(d, "model_index.json")):
                print(f"checkpoint {name}: exists, skipping")
                continue
            os.makedirs(d, exist_ok=True)
            make_fullsize_checkpoint(d, mode, variant)
            print(f"checkpoint {name}: written")

    if not args.skip_data:
        # reuse the protocol test's per-dataset mini-tree builders
        import test_benchmark_protocol as tbp

        rng = np.random.default_rng(0)
        from marigold_tpu.cli.benchmark import PROTOCOLS

        for modality, bench, builder, _kw, _n, _exp in tbp.BENCHES:
            cfg_path = PROTOCOLS[modality][bench][0]
            ds_dir, lines = tbp._split_lines(cfg_path, args.samples)
            root = os.path.join(args.data_dir, ds_dir)
            builder(root, lines, rng)
            print(f"data {modality}/{bench}: {len(lines)} sample(s) "
                  f"under {ds_dir}")
    print("rehearsal assets ready")


if __name__ == "__main__":
    main()
