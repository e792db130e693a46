"""Fast checkpoint ingest: mmap'd safetensors slabs + on-device unpack.

The baseline load path (weights.py torch_to_tree) performs, per tensor,
a host-side layout transpose, a host-side dtype cast, and one
`jnp.asarray` device upload — ~700 small tunnel round trips at SD2
scale, all serialized on one host core. Measured at full scale
(scripts/bench_checkpoint_load.py, 2.5 GB fp16 checkpoint, tunneled
v5e): 213.6 s ≈ 12 MB/s effective.

This module restructures the load the TPU-native way:

  1. Parse the safetensors header directly (8-byte LE length + JSON; the
     format stores all tensor payloads contiguously in one data region)
     and memory-map the file — zero host-side copies, no per-tensor
     `get_tensor` materialization.
  2. Pack the data region into a few large uint8 *slabs* (split only at
     tensor boundaries, target 256 MB) and `jax.device_put` each slab
     asynchronously — a handful of large streaming uploads instead of
     ~700 small ones.
  3. One jitted *unpack* program PER SLAB slices every tensor out of
     that slab, bitcasts raw bytes to the stored dtype, reshapes,
     applies the torch->JAX layout transpose (conv OIHW->HWIO, linear
     [out,in]->T), and casts to the requested dtype — all on device,
     where transposes and casts are effectively free next to the
     upload. Per-slab programs matter: a single whole-checkpoint unpack
     program was measured to peak at 16 GB HBM at SD2 scale (XLA holds
     hundreds of output+intermediate buffers live in one schedule) and
     OOMs a 16 GB v5e; per-slab programs bound the transient to one
     slab's working set, and each slab buffer is deleted as soon as its
     program has consumed it.

The name mapping (module-path split, VAE attention aliases,
strip_prefix) is weights.py's dest_parts — one function serving both
ingest paths; tests/test_fastload.py asserts bit-exact equality against
the baseline path on a tiny diffusers-layout checkpoint, for F16/BF16/
F32/I64 storage dtypes.

Reference anchor: this replaces the role of diffusers'
`from_pretrained(..., torch_dtype=torch.float16)` weight ingest used by
the reference eval drivers (script/depth/eval/11_infer_nyu.sh ->
marigold/marigold_depth_pipeline.py from_pretrained).

Kill switch: MARIGOLD_TPU_FASTLOAD=0 falls back to the baseline path
(weights.py load_safetensors_flat + torch_to_tree). The fallback reads
via safetensors framework="numpy", which handles BF16-stored files on
the pinned safetensors>=0.8 (returns ml_dtypes bfloat16 arrays);
tests/test_fastload.py covers a BF16-stored tensor on both paths.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from marigold_tpu.models.weights import (
    _is_embedding,
    dest_parts,
    select_safetensor_files,
)

_SLAB_TARGET_BYTES = 256 * 1024 * 1024

# safetensors dtype tag -> (jnp dtype to bitcast to, itemsize)
_ST_DTYPES = {
    "F64": (jnp.float64, 8),
    "F32": (jnp.float32, 4),
    "F16": (jnp.float16, 2),
    "BF16": (jnp.bfloat16, 2),
    "I64": (jnp.int64, 8),
    "I32": (jnp.int32, 4),
    "I16": (jnp.int16, 2),
    "I8": (jnp.int8, 1),
    "U8": (jnp.uint8, 1),
    "BOOL": (jnp.uint8, 1),  # astype(bool_) after bitcast
}


@dataclass(frozen=True)
class _TensorSpec:
    name: str
    st_dtype: str
    shape: tuple[int, ...]
    slab: int  # slab index
    offset: int  # byte offset within slab
    nbytes: int


def _parse_header(fname: str):
    """-> (header dict without __metadata__, data-region file offset)."""
    with open(fname, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(n).decode("utf-8"))
    header.pop("__metadata__", None)
    return header, 8 + n


def _plan(files: list[str]):
    """Pack every tensor in `files` into boundary-aligned slabs.

    -> (specs: list[_TensorSpec], slabs: list[np.memmap uint8])
    """
    specs: list[_TensorSpec] = []
    slabs: list[np.ndarray] = []
    for fname in files:
        header, data_start = _parse_header(fname)
        entries = sorted(header.items(), key=lambda kv: kv[1]["data_offsets"][0])
        mm = np.memmap(fname, dtype=np.uint8, mode="r")
        # Validate header-declared offsets before trusting them: a
        # malformed/truncated checkpoint must fail with a clear ingest
        # error here, not an opaque shape error inside the jitted unpack.
        data_size = mm.shape[0] - data_start
        prev_end = 0
        for name, meta in entries:
            if meta["dtype"] not in _ST_DTYPES:
                raise NotImplementedError(
                    f"fastload: unsupported safetensors dtype "
                    f"{meta['dtype']} for {name!r} in {fname}"
                )
            e0, e1 = meta["data_offsets"]
            itemsize = _ST_DTYPES[meta["dtype"]][1]
            want = int(np.prod(meta["shape"], dtype=np.int64)) * itemsize
            if not (0 <= e0 <= e1 <= data_size):
                raise ValueError(
                    f"fastload: {name!r} in {fname} declares data_offsets "
                    f"[{e0}, {e1}) outside the {data_size}-byte data region "
                    "(truncated or corrupt checkpoint?)"
                )
            if e1 - e0 != want:
                raise ValueError(
                    f"fastload: {name!r} in {fname} declares {e1 - e0} bytes "
                    f"but shape {tuple(meta['shape'])} x {meta['dtype']} "
                    f"needs {want}"
                )
            if e0 < prev_end:
                raise ValueError(
                    f"fastload: {name!r} in {fname} overlaps the previous "
                    "tensor's data region (corrupt header)"
                )
            prev_end = e1
        # greedy boundary-aligned packing of the (contiguous) data region
        i = 0
        while i < len(entries):
            begin = entries[i][1]["data_offsets"][0]
            j = i
            end = begin
            while j < len(entries):
                e0, e1 = entries[j][1]["data_offsets"]
                if e1 - begin > _SLAB_TARGET_BYTES and j > i:
                    break
                end = e1
                j += 1
            slab_idx = len(slabs)
            slabs.append(mm[data_start + begin : data_start + end])
            for name, meta in entries[i:j]:
                e0, e1 = meta["data_offsets"]
                specs.append(_TensorSpec(
                    name=name, st_dtype=meta["dtype"],
                    shape=tuple(meta["shape"]),
                    slab=slab_idx, offset=e0 - begin, nbytes=e1 - e0,
                ))
            i = j
    return specs, slabs


def _transform_kind(parts: tuple[str, ...], ndim: int) -> str:
    if parts[-1] == "weight":
        if ndim == 4:
            return "conv"  # OIHW -> HWIO
        if ndim == 2 and not _is_embedding(parts):
            return "linear"  # [out,in] -> [in,out]
    return "none"


def _bitcast_1d(seg, st_dtype: str):
    """u8[k*n] -> stored-dtype[n], staying 1-D throughout.

    The obvious route — reshape to u8[n, k] and bitcast_convert_type —
    is a memory catastrophe on TPU: the minor dim k (2 or 4) is padded
    to the 128-lane tile, a 64x layout expansion (measured: a 256 MB
    slab's reshape materialized as u8[133942404,2] = 15.97 GB padded,
    OOMing a v5e). Instead, gather each byte lane with a strided 1-D
    slice and combine little-endian with shifts in a same-width uint,
    then bitcast uint->float (shape-preserving, no padding)."""
    jdt, itemsize = _ST_DTYPES[st_dtype]
    if itemsize == 1:
        return jax.lax.bitcast_convert_type(seg, jdt)
    uint = {2: jnp.uint16, 4: jnp.uint32}[itemsize]
    acc = seg[0::itemsize].astype(uint)
    for i in range(1, itemsize):
        acc = acc | (seg[i::itemsize].astype(uint) << (8 * i))
    return jax.lax.bitcast_convert_type(acc, jdt)


def _unpack_one(slab, spec: _TensorSpec, parts, dtype):
    seg = jax.lax.slice(slab, (spec.offset,), (spec.offset + spec.nbytes,))
    x = _bitcast_1d(seg, spec.st_dtype)
    if spec.st_dtype == "BOOL":
        x = x.astype(jnp.bool_)
    x = x.reshape(spec.shape)
    kind = _transform_kind(parts, x.ndim)
    if kind == "conv":
        x = x.transpose(2, 3, 1, 0)
    elif kind == "linear":
        x = x.T
    if dtype is not None:
        x = x.astype(dtype)
    return x


def load_tree_ondevice(
    path: str,
    dtype=None,
    strip_prefix: str = "",
    variant: str | None = None,
) -> dict:
    """safetensors dir/file -> nested JAX param tree, transposes and
    casts on device, uploads as a few large slabs. Drop-in for
    load_safetensors_flat + torch_to_tree."""
    files = select_safetensor_files(path, variant=variant)
    specs, slabs = _plan(files)

    # 64-bit tensors (e.g. transformers' int64 position_ids buffers)
    # cannot be bitcast under JAX's default no-x64 config; they are tiny,
    # so convert them host-side like the baseline path does.
    host_specs = [s for s in specs if s.st_dtype in ("I64", "F64")]
    specs = [s for s in specs if s.st_dtype not in ("I64", "F64")]

    parts_for = {s.name: dest_parts(s.name, strip_prefix) for s in specs}

    # Upload every slab up front (device_put is async — uploads stream
    # while earlier slabs' unpack programs run), then unpack slab by
    # slab and drop each slab buffer as soon as it has been consumed.
    dev_slabs = [jax.device_put(np.asarray(s)) for s in slabs]

    by_slab: dict[int, list[_TensorSpec]] = {}
    for s in specs:
        by_slab.setdefault(s.slab, []).append(s)

    pairs: list[tuple[_TensorSpec, jax.Array]] = []
    for slab_idx, slab_specs in by_slab.items():
        def unpack(slab, _specs=tuple(slab_specs)):
            return tuple(
                _unpack_one(slab, s, parts_for[s.name], dtype)
                for s in _specs
            )

        out = jax.jit(unpack)(dev_slabs[slab_idx])
        dev_slabs[slab_idx].delete()
        dev_slabs[slab_idx] = None
        pairs.extend(zip(slab_specs, out))

    tree: dict = {}

    def insert(parts, leaf):
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf

    for spec, leaf in pairs:
        insert(parts_for[spec.name], leaf)
    for spec in host_specs:
        np_dt = {"I64": np.int64, "F64": np.float64}[spec.st_dtype]
        slab = slabs[spec.slab]
        raw = np.asarray(
            slab[spec.offset : spec.offset + spec.nbytes]
        ).view(np_dt).reshape(spec.shape)
        parts = dest_parts(spec.name, strip_prefix)
        kind = _transform_kind(parts, raw.ndim)
        if kind == "conv":
            raw = raw.transpose(2, 3, 1, 0)
        elif kind == "linear":
            raw = raw.T
        insert(parts, jnp.asarray(raw, dtype=dtype))
    return tree


def enabled() -> bool:
    return os.environ.get("MARIGOLD_TPU_FASTLOAD", "1") != "0"
