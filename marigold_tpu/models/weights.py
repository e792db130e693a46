"""Checkpoint I/O: HF-diffusers safetensors <-> JAX param pytrees.

The reference consumes `prs-eth/marigold-*-v1-1` checkpoints in diffusers
pipeline layout (SURVEY.md §1 L0): a directory with model_index.json and
subfolders unet/ vae/ text_encoder/ tokenizer/ scheduler/, each holding a
config.json + *.safetensors in torch layouts. This module performs the
layout translation to our NHWC/HWIO trees:

  torch Conv   weight OIHW [out,in,kh,kw] -> HWIO [kh,kw,in,out]
  torch Linear weight [out,in]            -> [in,out]
  embeddings / norms / biases             -> unchanged

and the name translation: tree keys equal the torch module path segments,
plus a small alias table for historical diffusers VAE attention names
(query/key/value/proj_attn -> to_q/to_k/to_v/to_out.0).

Saving inverts the mapping so our training checkpoints remain loadable by
the reference stack (checkpoint-compose contract, SURVEY.md §3.5).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np
from safetensors import safe_open
from safetensors.numpy import save_file

# historical diffusers VAE attention param names -> modern ones
_VAE_ATTN_ALIASES = {
    "query": "to_q",
    "key": "to_k",
    "value": "to_v",
    "proj_attn": ("to_out", "0"),
}

_EMBEDDING_MARKERS = ("token_embedding", "position_embedding", "embeddings")


def select_safetensor_files(path: str, variant: str | None = None) -> list[str]:
    """Resolve `path` (a file or a checkpoint subdir) to the list of
    *.safetensors files to load, honoring HF weight-variant selection
    (diffusers from_pretrained variant="fp16" semantics — reference
    script/depth/run.py:203-215 uses it for --half_precision). A
    checkpoint dir may carry both model.safetensors and
    model.fp16.safetensors with identical keys: variant=None loads only
    the non-variant files (falling back to whatever exists),
    variant="fp16" prefers *.fp16.safetensors."""
    if os.path.isfile(path):
        files = [path]
    else:
        names = [f for f in os.listdir(path) if f.endswith(".safetensors")]
        # HF naming: single-file "model.fp16.safetensors" and sharded
        # "model.fp16-00001-of-00002.safetensors"
        shard = r"(?:-\d+-of-\d+)?\.safetensors$"

        def is_var(f):
            return bool(re.search(r"\.(fp16|bf16|fp32)" + shard, f))

        if variant:
            pat = re.compile(re.escape(f".{variant}") + shard)
            want = [f for f in names if pat.search(f)]
        else:
            want = [f for f in names if not is_var(f)]
        if not want:
            # fallback: nothing matched (variant-only dir, or requested
            # variant absent). NEVER load a cross-group mix — identical
            # keys would overwrite in filename-sort order, making the
            # winner depend on shard naming. Pick ONE group
            # deterministically (plain first, else the alphabetically
            # first variant) and say so.
            groups: dict = {}
            for f in names:
                m = re.search(r"\.(fp16|bf16|fp32)" + shard, f)
                groups.setdefault(m.group(1) if m else None, []).append(f)
            if groups:
                import logging

                chosen = (
                    None if None in groups
                    else sorted(k for k in groups if k is not None)[0]
                )
                logging.getLogger(__name__).warning(
                    "no %s weights under %s; groups %s present — "
                    "loading %s",
                    "plain" if variant is None else repr(variant), path,
                    sorted(k or "plain" for k in groups),
                    chosen or "plain",
                )
                want = groups[chosen]
        files = sorted(os.path.join(path, f) for f in want)
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    return files


def load_safetensors_flat(
    path: str, variant: str | None = None
) -> dict[str, np.ndarray]:
    """Load *.safetensors under `path` (single file, multiple shards, or an
    index json) into one flat name->array dict."""
    tensors: dict[str, np.ndarray] = {}
    for f in select_safetensor_files(path, variant=variant):
        with safe_open(f, framework="numpy") as st:
            for k in st.keys():
                tensors[k] = st.get_tensor(k)
    return tensors


def _is_embedding(path_parts: tuple[str, ...]) -> bool:
    return any(m in path_parts for m in _EMBEDDING_MARKERS)


def dest_parts(name: str, strip_prefix: str = "") -> tuple[str, ...]:
    """torch tensor name -> tree path segments.

    The single source of truth for the name mapping (prefix strip,
    module-path split, historical VAE attention aliases) — both ingest
    paths (torch_to_tree here and fastload.load_tree_ondevice) call it,
    so the mapping cannot drift between them."""
    if strip_prefix and name.startswith(strip_prefix):
        name = name[len(strip_prefix):]
    parts = list(name.split("."))
    for i, p in enumerate(parts):
        if p in _VAE_ATTN_ALIASES:
            repl = _VAE_ATTN_ALIASES[p]
            parts[i : i + 1] = list(repl) if isinstance(repl, tuple) else [repl]
    return tuple(parts)


def torch_to_tree(
    flat: Mapping[str, np.ndarray],
    dtype=None,
    strip_prefix: str = "",
) -> dict:
    """Flat torch-named tensors -> nested JAX tree with layout transposes."""
    tree: dict = {}
    for name, arr in flat.items():
        parts = dest_parts(name, strip_prefix)
        leaf = parts[-1]
        value = np.asarray(arr)
        if leaf == "weight":
            if value.ndim == 4:  # conv OIHW -> HWIO
                value = value.transpose(2, 3, 1, 0)
            elif value.ndim == 2 and not _is_embedding(parts):
                value = value.transpose(1, 0)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[leaf] = jnp.asarray(value, dtype=dtype)
    return tree


def tree_to_torch_flat(tree: Mapping[str, Any], prefix: str = "") -> dict[str, np.ndarray]:
    """Inverse of torch_to_tree (for saving diffusers-compatible ckpts)."""
    flat: dict[str, np.ndarray] = {}

    def rec(node, path):
        if isinstance(node, Mapping):
            for k, v in node.items():
                rec(v, path + (k,))
            return
        value = np.asarray(node)
        leaf = path[-1]
        if leaf == "weight":
            if value.ndim == 4:  # HWIO -> OIHW
                value = value.transpose(3, 2, 0, 1)
            elif value.ndim == 2 and not _is_embedding(path):
                value = value.transpose(1, 0)
        flat[prefix + ".".join(path)] = value

    rec(tree, ())
    return flat


def save_safetensors_tree(tree: Mapping[str, Any], path: str, prefix: str = "") -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = tree_to_torch_flat(tree, prefix)
    save_file({k: np.ascontiguousarray(v) for k, v in flat.items()}, path)


def read_config(dirpath: str, filename: str = "config.json") -> dict:
    with open(os.path.join(dirpath, filename)) as f:
        return json.load(f)


def write_config(cfg: Mapping[str, Any], dirpath: str, filename: str = "config.json"):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, filename), "w") as f:
        json.dump(dict(cfg), f, indent=2)


# ------------------------------------------------------------------ #
# component loaders


def _load_params(subdir: str, dtype, variant, strip_prefix: str = ""):
    """Shared component-param ingest: the fast slab/on-device path by
    default (models/fastload.py — replaces the per-tensor host path
    whose full-scale cost was measured at 94.9-213.6 s depending on
    page cache; see PERFORMANCE.md), the per-tensor host path when
    MARIGOLD_TPU_FASTLOAD=0.

    If the device unpack path fails at runtime (a backend that rejects
    the slab upload/bitcast programs, or transient HBM pressure), fall
    back to the baseline path with a warning rather than failing the
    load. Plan-time errors (corrupt/truncated checkpoints) are NOT
    swallowed — those would fail either path."""
    from marigold_tpu.models import fastload

    if fastload.enabled():
        try:
            return fastload.load_tree_ondevice(
                subdir, dtype=dtype, strip_prefix=strip_prefix,
                variant=variant,
            )
        except (ValueError, NotImplementedError):
            raise  # checkpoint-validation errors: real ingest failures
        except Exception as e:  # jax runtime/compile errors -> fallback
            import warnings

            warnings.warn(
                "fastload device unpack failed "
                f"({type(e).__name__}: {e}); falling back to the "
                "per-tensor host load path (MARIGOLD_TPU_FASTLOAD=0)",
                stacklevel=2,
            )
    flat = load_safetensors_flat(subdir, variant=variant)
    return torch_to_tree(flat, dtype=dtype, strip_prefix=strip_prefix)


def load_unet(subdir: str, dtype=None, variant: str | None = None):
    """unet/ dir -> (UNetConfig, params tree)."""
    from marigold_tpu.models.unet import UNetConfig

    cfg = UNetConfig.from_dict(read_config(subdir))
    return cfg, _load_params(subdir, dtype, variant)


def load_vae(subdir: str, dtype=None, variant: str | None = None):
    from marigold_tpu.models.vae import VAEConfig

    cfg = VAEConfig.from_dict(read_config(subdir))
    return cfg, _load_params(subdir, dtype, variant)


def load_text_encoder(subdir: str, dtype=None, variant: str | None = None):
    from marigold_tpu.models.clip_text import CLIPTextConfig

    cfg = CLIPTextConfig.from_dict(read_config(subdir))
    params = _load_params(subdir, dtype, variant, strip_prefix="text_model.")
    # transformers also stores a text_projection for CLIPModel ckpts; drop
    params.pop("text_projection", None)
    return cfg, params


def save_unet(cfg, params, subdir: str) -> None:
    write_config(cfg.to_dict(), subdir)
    save_safetensors_tree(
        params, os.path.join(subdir, "diffusion_pytorch_model.safetensors")
    )


def save_vae(cfg, params, subdir: str) -> None:
    write_config(cfg.to_dict(), subdir)
    save_safetensors_tree(
        params, os.path.join(subdir, "diffusion_pytorch_model.safetensors")
    )


def save_text_encoder(cfg, params, subdir: str) -> None:
    write_config(cfg.to_dict(), subdir)
    save_safetensors_tree(
        params, os.path.join(subdir, "model.safetensors"), prefix="text_model."
    )


def cast_tree(tree, dtype):
    import jax

    # leaves already in `dtype` pass through untouched: astype on a
    # same-dtype device array is a dispatch per leaf (~700 tunnel round
    # trips at SD2 scale — measured part of the warm-start cost)
    return jax.tree_util.tree_map(
        lambda x: x if getattr(x, "dtype", None) == dtype else x.astype(dtype),
        tree,
    )
