"""Checkpoint manifest validation: diagnose a diffusers checkpoint dir
BEFORE the multi-GB load/upload.

Real-weights parity runs start with a ~2.5 GB checkpoint transfer into
this environment; a name/shape mismatch discovered inside
`from_pretrained` wastes the whole transfer. This module derives the
EXPECTED flat tensor manifest (torch-layout names + shapes) for each
pipeline component from our own model configs — the exact inverse of the
`weights.torch_to_tree` ingest mapping — and compares it against the
safetensors METADATA (header only; no tensor data is read), so a broken
or mislabeled checkpoint is diagnosed in milliseconds.

Reference checkpoints this validates (SURVEY.md §1 L0):
  prs-eth/marigold-{depth,normals,iid-appearance,iid-lighting}-v1-1,
  prs-eth/marigold-{depth,normals}-lcm-v1-0,
  stabilityai/stable-diffusion-2 — all diffusers pipeline layout
  (model_index.json + unet/ vae/ text_encoder/ scheduler/ [tokenizer/]).

Entry points:
  expected_component_manifest(kind, cfg) -> {torch_name: shape}
  actual_component_manifest(subdir, variant) -> {torch_name: (shape, dtype)}
  validate_checkpoint(ckpt_dir, variant) -> report dict (see docstring)
"""

from __future__ import annotations

import os
import re
from typing import Any, Mapping, Optional

import jax

from marigold_tpu.models import weights as W

# components a diffusers pipeline dir may carry; tokenizer/scheduler are
# config/vocab-only (no tensors)
_TENSOR_COMPONENTS = ("unet", "vae", "text_encoder")

# keys transformers writes that our ingest deliberately drops
# (weights.load_text_encoder pops text_projection; position_ids is a
# buffer some exports include)
_IGNORABLE = {
    "text_encoder": {"text_projection.weight", "text_model.embeddings.position_ids"},
    "unet": set(),
    "vae": set(),
}


def _shape_to_torch(path: tuple, shape: tuple) -> tuple:
    """Our-layout leaf shape -> torch-layout shape (the shape-only twin of
    weights.tree_to_torch_flat's transposes)."""
    leaf = path[-1]
    if leaf == "weight":
        if len(shape) == 4:  # HWIO -> OIHW
            return (shape[3], shape[2], shape[0], shape[1])
        if len(shape) == 2 and not W._is_embedding(path):
            return (shape[1], shape[0])
    return tuple(shape)


def _flatten_shapes(tree: Mapping[str, Any], prefix: str = "") -> dict:
    flat: dict[str, tuple] = {}

    def rec(node, path):
        if isinstance(node, Mapping):
            for k, v in node.items():
                rec(v, path + (k,))
            return
        flat[prefix + ".".join(path)] = _shape_to_torch(path, node.shape)

    rec(tree, ())
    return flat


def _normalize_torch_name(name: str, strip_prefix: str = "") -> str:
    """Apply the same historical-alias and prefix normalization the ingest
    applies (weights.torch_to_tree), so old VAE attention names compare
    equal to their modern forms."""
    if strip_prefix and name.startswith(strip_prefix):
        name = name[len(strip_prefix):]
    parts = []
    for p in name.split("."):
        repl = W._VAE_ATTN_ALIASES.get(p, p)
        parts.extend(repl if isinstance(repl, tuple) else (repl,))
    return ".".join(parts)


def expected_component_manifest(kind: str, cfg) -> dict:
    """Expected {torch_name: shape} for one component, derived from OUR
    init (jax.eval_shape — no memory is allocated)."""
    if kind == "unet":
        from marigold_tpu.models import unet as unet_lib

        shapes = jax.eval_shape(
            lambda k: unet_lib.init_params(k, cfg), jax.random.PRNGKey(0)
        )
        return _flatten_shapes(shapes)
    if kind == "vae":
        from marigold_tpu.models import vae as vae_lib

        shapes = jax.eval_shape(
            lambda k: vae_lib.init_params(k, cfg), jax.random.PRNGKey(0)
        )
        return _flatten_shapes(shapes)
    if kind == "text_encoder":
        from marigold_tpu.models import clip_text as clip_lib

        shapes = jax.eval_shape(
            lambda k: clip_lib.init_params(k, cfg), jax.random.PRNGKey(0)
        )
        return _flatten_shapes(shapes, prefix="text_model.")
    raise ValueError(f"unknown component kind: {kind}")


def actual_component_manifest(
    subdir: str, variant: Optional[str] = None
) -> dict:
    """{torch_name: (shape, dtype_str)} from safetensors HEADERS only (the
    8-byte-length + json header prefix of each file; tensor data is never
    read)."""
    from safetensors import safe_open

    names = [f for f in os.listdir(subdir) if f.endswith(".safetensors")]
    shard = r"(?:-\d+-of-\d+)?\.safetensors$"

    def is_var(f):
        return bool(re.search(r"\.(fp16|bf16|fp32)" + shard, f))

    if variant:
        pat = re.compile(re.escape(f".{variant}") + shard)
        want = [f for f in names if pat.search(f)]
    else:
        want = [f for f in names if not is_var(f)]
    if not want:
        want = names  # fall back to whatever exists (mirrors the loader)
    out: dict[str, tuple] = {}
    for f in sorted(want):
        with safe_open(os.path.join(subdir, f), framework="numpy") as st:
            for k in st.keys():
                sl = st.get_slice(k)
                out[k] = (tuple(sl.get_shape()), str(sl.get_dtype()))
    return out


def _component_config(ckpt_dir: str, kind: str):
    sub = os.path.join(ckpt_dir, kind)
    if kind == "unet":
        from marigold_tpu.models.unet import UNetConfig

        return UNetConfig.from_dict(W.read_config(sub))
    if kind == "vae":
        from marigold_tpu.models.vae import VAEConfig

        return VAEConfig.from_dict(W.read_config(sub))
    from marigold_tpu.models.clip_text import CLIPTextConfig

    return CLIPTextConfig.from_dict(W.read_config(sub))


def validate_checkpoint(
    ckpt_dir: str, variant: Optional[str] = None
) -> dict:
    """Validate a diffusers pipeline checkpoint dir against the manifests
    our ingest expects. Returns
      {"ok": bool,
       "components": {kind: {"ok", "n_expected", "n_actual",
                             "missing": [...], "unexpected": [...],
                             "mismatched": {name: {"expected", "actual"}},
                             "dtypes": {dtype: count}}},
       "notes": [...]}
    Missing/mismatched tensors fail validation; unexpected keys beyond the
    known-ignorable set are reported but only warn (the loader ignores
    names it does not consume)."""
    report: dict[str, Any] = {"ok": True, "components": {}, "notes": []}
    if not os.path.isdir(ckpt_dir):
        return {"ok": False, "components": {},
                "notes": [f"not a directory: {ckpt_dir}"]}
    if not os.path.exists(os.path.join(ckpt_dir, "model_index.json")):
        report["notes"].append(
            "no model_index.json (pipeline defaults like "
            "default_denoising_steps will not load)"
        )
    sched_cfg = os.path.join(ckpt_dir, "scheduler", "scheduler_config.json")
    if not os.path.exists(sched_cfg):
        report["ok"] = False
        report["notes"].append("missing scheduler/scheduler_config.json")

    for kind in _TENSOR_COMPONENTS:
        sub = os.path.join(ckpt_dir, kind)
        if not os.path.isdir(sub):
            if kind == "text_encoder":
                report["notes"].append(
                    "no text_encoder/ (pipeline will need a precomputed "
                    "empty-text embedding)"
                )
                continue
            report["ok"] = False
            report["notes"].append(f"missing component dir: {kind}/")
            continue
        try:
            cfg = _component_config(ckpt_dir, kind)
            expected = expected_component_manifest(kind, cfg)
            actual_raw = actual_component_manifest(sub, variant=variant)
        except Exception as e:  # unreadable configs/headers
            report["ok"] = False
            report["components"][kind] = {"ok": False, "error": str(e)}
            continue

        actual = {
            _normalize_torch_name(k): v for k, v in actual_raw.items()
        }
        ignorable = {
            _normalize_torch_name(k) for k in _IGNORABLE.get(kind, set())
        }
        missing = sorted(set(expected) - set(actual))
        unexpected = sorted(set(actual) - set(expected) - ignorable)
        mismatched = {}
        for name in set(expected) & set(actual):
            if tuple(expected[name]) != tuple(actual[name][0]):
                mismatched[name] = {
                    "expected": list(expected[name]),
                    "actual": list(actual[name][0]),
                }
        dtypes: dict[str, int] = {}
        for _, dt in actual.values():
            dtypes[dt] = dtypes.get(dt, 0) + 1
        comp_ok = not missing and not mismatched
        report["components"][kind] = {
            "ok": comp_ok,
            "n_expected": len(expected),
            "n_actual": len(actual),
            "missing": missing,
            "unexpected": unexpected,
            "mismatched": mismatched,
            "dtypes": dtypes,
        }
        if not comp_ok:
            report["ok"] = False
    return report


def format_report(report: dict, max_items: int = 8) -> str:
    lines = []
    for kind, c in report.get("components", {}).items():
        if "error" in c:
            lines.append(f"{kind}: ERROR {c['error']}")
            continue
        status = "ok" if c["ok"] else "FAIL"
        lines.append(
            f"{kind}: {status} ({c['n_actual']}/{c['n_expected']} tensors, "
            f"dtypes {c['dtypes']})"
        )
        for label in ("missing", "unexpected"):
            items = c[label]
            if items:
                shown = ", ".join(items[:max_items])
                more = f" (+{len(items)-max_items} more)" \
                    if len(items) > max_items else ""
                lines.append(f"  {label}: {shown}{more}")
        for name, mm in list(c["mismatched"].items())[:max_items]:
            lines.append(
                f"  shape mismatch {name}: expected {mm['expected']} "
                f"got {mm['actual']}"
            )
    for note in report.get("notes", []):
        lines.append(f"note: {note}")
    lines.append("RESULT: " + ("OK" if report.get("ok") else "FAIL"))
    return "\n".join(lines)
