"""Shared pipeline machinery: checkpoint loading, the jitted diffusion core,
preprocessing, batching, and mesh sharding.

Layer parity: this is the L4 "installable product" layer of the reference
(marigold/*_pipeline.py) — diffusers-checkpoint-compatible from_pretrained,
identical __call__ semantics — redesigned TPU-first:

  * the whole denoise trajectory (encode -> scan over DDIM steps -> decode
    -> modality postprocess) is ONE jitted XLA program; the UNet is traced
    once regardless of step count (`lax.scan` over the timestep table).
  * the conditioning RGB is VAE-encoded ONCE and broadcast across ensemble
    members (the reference re-encodes the replicated image per batch chunk,
    marigold_depth_pipeline.py:427 — identical output, less work).
  * ensemble members shard across the device mesh's `data` axis; per-device
    chunking uses the HBM-derived batch heuristic (batchsize.py).
  * compiled programs are cached per (latent shape, steps, chunk, mode) —
    shape-bucketing keeps recompiles bounded for `processing_res=0` usage.
"""

from __future__ import annotations

import functools
import json
import logging
import os
from collections import OrderedDict
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from marigold_tpu.core.scheduler import DiffusionSchedule, check_trailing_zero_snr
from marigold_tpu.models import clip_text as clip_lib
from marigold_tpu.models import unet as unet_lib
from marigold_tpu.models import vae as vae_lib
from marigold_tpu.models import weights as W
from marigold_tpu.pipelines import image_util
from marigold_tpu.pipelines.batchsize import find_batch_size

logger = logging.getLogger(__name__)

LATENT_SCALE_FACTOR = 0.18215  # reference marigold_depth_pipeline.py:118


def _depth_ensemble_call_kwargs(ens_kwargs: dict) -> dict:
    """Caller ensemble_kwargs merged over ensemble_depth's serving
    defaults — ONE mapping shared by the fused builders and the
    raw-members (reference-exact) eager path so they can never diverge."""
    return dict(
        scale_invariant=ens_kwargs.get("scale_invariant", True),
        shift_invariant=ens_kwargs.get("shift_invariant", True),
        reduction=ens_kwargs.get("reduction", "median"),
        regularizer_strength=ens_kwargs.get("regularizer_strength", 0.02),
        max_iter=ens_kwargs.get("max_iter", 50),
        tol=ens_kwargs.get("tol", 1e-6),
        max_res=ens_kwargs.get("max_res", 1024),
        reg_max_res=ens_kwargs.get("reg_max_res", 96),
        gauge_anchor=ens_kwargs.get("gauge_anchor", True),
    )


def _is_reference_ensemble(mode: str, ensemble_size: int,
                           ens_kwargs: dict) -> bool:
    """True when the depth ensemble must run in reference-exact mode
    (gauge_anchor=False): the host scipy solve cannot live inside the
    fused program (the axon TPU backend has no host callbacks), so the
    program returns raw members and the caller ensembles eagerly."""
    return (
        mode == "depth"
        and ensemble_size > 1
        and not ens_kwargs.get("gauge_anchor", True)
    )


class DiffusionCore:
    """Bundles UNet+VAE+text components and exposes jitted end-to-end
    inference programs with a compile cache."""

    def __init__(
        self,
        unet_cfg: unet_lib.UNetConfig,
        unet_params: dict,
        vae_cfg: vae_lib.VAEConfig,
        vae_params: dict,
        text_cfg: Optional[clip_lib.CLIPTextConfig],
        text_params: Optional[dict],
        schedule: DiffusionSchedule,
        dtype=jnp.bfloat16,
        mesh=None,
    ):
        self.unet_cfg = unet_cfg
        self.vae_cfg = vae_cfg
        self.text_cfg = text_cfg
        self.schedule = schedule
        self.dtype = dtype
        self.mesh = mesh  # jax.sharding.Mesh with a "data" axis, or None
        self.lcm = None  # LCMSchedule for legacy v1-0 LCM checkpoints
        self.unet_params = W.cast_tree(unet_params, dtype)
        self.vae_params = W.cast_tree(vae_params, dtype)
        self.text_params = (
            W.cast_tree(text_params, dtype) if text_params is not None else None
        )
        if mesh is not None:
            from marigold_tpu.parallel.mesh import replicate

            self.unet_params = replicate(mesh, self.unet_params)
            self.vae_params = replicate(mesh, self.vae_params)
        self._empty_text_embed = None
        # bounded LRU of compiled programs keyed by (shape/config); params
        # are traced ARGUMENTS of every program, so param updates (e.g.
        # during training validation) never invalidate entries.
        self._jit_cache: "OrderedDict" = OrderedDict()
        self._jit_cache_max = 32

    def _lcm_fingerprint(self):
        """Program-cache key component for the sampler. Setting
        `core.lcm` swaps the consistency sampler into the traced
        program, so cached DDIM programs must not be reused (bug found
        in round 5: flipping `lcm` after a DDIM run silently served
        DDIM results because no cache key carried the sampler)."""
        lcm = getattr(self, "lcm", None)
        if lcm is None:
            return None
        return ("lcm", int(lcm.original_inference_steps))

    def _cached_program(self, key, build):
        cache = self._jit_cache
        if key in cache:
            cache.move_to_end(key)
            return cache[key]
        fn = build()
        cache[key] = fn
        while len(cache) > self._jit_cache_max:
            cache.popitem(last=False)
        return fn

    # -------------------------------------------------------------- #

    @property
    def empty_text_embed(self) -> jax.Array:
        """[1, 2, cross_dim] — the cached empty-prompt conditioning
        (reference encode_empty_text, marigold_depth_pipeline.py:381-394)."""
        if self._empty_text_embed is None:
            if self.text_params is None:
                raise RuntimeError("no text encoder params loaded")
            emb = clip_lib.encode_empty_prompt(self.text_params, self.text_cfg)
            self._empty_text_embed = emb.astype(self.dtype)
        return self._empty_text_embed

    def encode_rgb(self, rgb: jax.Array) -> jax.Array:
        """[B,H,W,3] in [-1,1] -> [B,h,w,4] scaled latent."""
        return vae_lib.encode_mean_scaled(self.vae_params, self.vae_cfg, rgb)

    # -------------------------------------------------------------- #
    # the fused program

    def _build_infer_fn(self, num_steps: int, ensemble_chunk: int, mode: str,
                        n_targets: int):
        schedule = self.schedule
        unet_cfg, vae_cfg = self.unet_cfg, self.vae_cfg
        ts = schedule.inference_timesteps(num_steps)
        prev_ts = schedule.prev_timesteps(ts)
        ts_table = jnp.asarray(np.stack([ts, prev_ts], 1), jnp.int32)  # [S,2]
        latent_ch = vae_cfg.latent_channels
        target_ch = latent_ch * max(n_targets, 1)

        def infer(unet_params, vae_params, rgb_latent, noise, text_embed):
            """rgb_latent: [1,h,w,4] (encoded once); noise: [Eb,h,w,4n]."""
            eb = noise.shape[0]
            rgb_lat = jnp.broadcast_to(
                rgb_latent, (eb,) + rgb_latent.shape[1:]
            ).astype(self.dtype)
            target = noise.astype(self.dtype)

            def step(carry, t_pair):
                target = carry
                t, pt = t_pair[0], t_pair[1]
                x = jnp.concatenate([rgb_lat, target], axis=-1)
                model_out = unet_lib.apply(
                    unet_params, unet_cfg, x, t, text_embed
                )
                new_target = schedule.ddim_step(model_out, t, pt, target)
                return new_target.astype(self.dtype), None

            target, _ = jax.lax.scan(step, target, ts_table)

            # decode
            if mode == "depth":
                img = vae_lib.decode_scaled(vae_params, vae_cfg, target)
                # mean over the 3 decoded channels (reference decode_depth
                # :498-516), then [-1,1] -> [0,1]
                depth = jnp.mean(img.astype(jnp.float32), axis=-1, keepdims=True)
                depth = jnp.clip(depth, -1.0, 1.0)
                return (depth + 1.0) / 2.0
            elif mode == "normals":
                img = vae_lib.decode_scaled(vae_params, vae_cfg, target)
                n = jnp.clip(img.astype(jnp.float32), -1.0, 1.0)
                norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
                return n / jnp.clip(norm, 1e-6, None)
            elif mode == "iid":
                outs = []
                for i in range(n_targets):
                    z = target[..., i * latent_ch : (i + 1) * latent_ch]
                    img = vae_lib.decode_scaled(vae_params, vae_cfg, z)
                    img = jnp.clip(img.astype(jnp.float32), -1.0, 1.0)
                    outs.append((img + 1.0) / 2.0)
                return jnp.concatenate(outs, axis=-1)  # [Eb,H,W,3*n]
            raise ValueError(mode)

        return jax.jit(infer)

    def get_infer_fn(self, h_lat: int, w_lat: int, num_steps: int,
                     ensemble_chunk: int, mode: str, n_targets: int = 1):
        key = (h_lat, w_lat, num_steps, ensemble_chunk, mode, n_targets,
               self._lcm_fingerprint())
        return self._cached_program(
            key,
            lambda: self._build_infer_fn(num_steps, ensemble_chunk, mode,
                                         n_targets),
        )

    # -------------------------------------------------------------- #
    # fully-fused serving program: ONE dispatch per image

    def _build_fused_fn(self, num_steps: int, ensemble_size: int, chunk: int,
                        mode: str, n_targets: int,
                        ensemble_opts: tuple, spatial: bool = False):
        """Bucket-shaped serving program: rgb [1,Hb,Wb,3] (padded to a
        bucket grid) + validity mask [1,Hb,Wb,1] + PRNG key ->
        (pred [1,Hb,Wb,C], unc [1,Hb,Wb,1]) — encode, all-member denoise
        (lax.map over chunks), decode, and mask-aware ensemble
        reduction/alignment fused into ONE XLA program. The program key
        contains only the bucket shape (not the image's true size or output
        size), so mixed-resolution folder inference compiles at most one
        program per bucket; the caller crops to the valid region and
        resizes back on host (torch-exact bilinear, no device dispatch)."""
        from marigold_tpu.pipelines import ensemble as ens

        schedule = self.schedule
        lcm = getattr(self, "lcm", None)
        unet_cfg, vae_cfg = self.unet_cfg, self.vae_cfg
        if lcm is not None:
            ts = lcm.inference_timesteps(num_steps)
            prev_ts = np.concatenate([ts[1:], [-1]])  # re-noise to next t
            step_idx = np.arange(len(ts))
        else:
            ts = schedule.inference_timesteps(num_steps)
            prev_ts = schedule.prev_timesteps(ts)
            step_idx = np.arange(len(ts))
        ts_table = jnp.asarray(np.stack([ts, prev_ts, step_idx], 1), jnp.int32)
        n_steps_total = len(ts)
        latent_ch = vae_cfg.latent_channels
        target_ch = latent_ch * max(n_targets, 1)
        ds = vae_cfg.downscale_factor
        E = ensemble_size
        mesh = self.mesh
        if spatial:
            # >1k-res long-context mode: the latent H axis shards over the
            # mesh instead of the ensemble axis (SURVEY.md §5's
            # "spatial-shard the latent across chips"; parallel/spatial.py
            # documents the halo/psum/gather-KV design). All E members run
            # in one H-sharded batch; the tiny ensemble reduce happens
            # replicated after one gather.
            if mesh is None:
                raise ValueError("spatial inference requires a mesh")
            if lcm is not None:
                raise ValueError("spatial inference does not support LCM")
            chunk = E
            spatial_axis_name = mesh.axis_names[0]
        elif mesh is not None:
            # shard the ensemble axis over the mesh's `data` axis riding
            # ICI: members are independent trajectories, so XLA partitions
            # the whole denoise with zero collectives and inserts one
            # all-gather before the ensemble reduction (SURVEY.md §2.6).
            n_dev = mesh.shape["data"]
            chunk = -(-E // n_dev) * n_dev  # one sharded mega-chunk
        n_chunks = -(-E // chunk)
        e_pad = n_chunks * chunk
        ens_kwargs = dict(ensemble_opts)
        raw_members = _is_reference_ensemble(mode, E, ens_kwargs)

        def denoise_decode(unet_params, vae_params, rgb_lat, noise, text,
                           lcm_key=None, spatial_axis=None):
            # NOTE: lcm_key must already be chunk-distinct when chunked
            # (see the fold_in at the lax.map below) — folding only the
            # step index would hand every chunk identical "fresh" noise
            # and correlate ensemble members across chunks
            eb = noise.shape[0]
            rgb_b = jnp.broadcast_to(rgb_lat, (eb,) + rgb_lat.shape[1:]).astype(
                self.dtype
            )
            target = noise.astype(self.dtype)

            def step(carry, t_pair):
                x = jnp.concatenate([rgb_b, carry], axis=-1)
                out = unet_lib.apply(unet_params, unet_cfg, x, t_pair[0], text,
                                     spatial_axis=spatial_axis)
                if lcm is not None:
                    fresh = jax.random.normal(
                        jax.random.fold_in(lcm_key, t_pair[2]),
                        carry.shape, jnp.float32,
                    )
                    new, _ = lcm.step(
                        out, t_pair[0], t_pair[1], carry, fresh,
                        is_last=t_pair[2] == n_steps_total - 1,
                    )
                else:
                    new = schedule.ddim_step(out, t_pair[0], t_pair[1], carry)
                return new.astype(self.dtype), None

            target, _ = jax.lax.scan(step, target, ts_table)

            if mode == "depth":
                img = vae_lib.decode_scaled(vae_params, vae_cfg, target,
                                            spatial_axis=spatial_axis)
                d = jnp.mean(img.astype(jnp.float32), axis=-1, keepdims=True)
                return (jnp.clip(d, -1.0, 1.0) + 1.0) / 2.0
            if mode == "normals":
                img = vae_lib.decode_scaled(vae_params, vae_cfg, target,
                                            spatial_axis=spatial_axis)
                n = jnp.clip(img.astype(jnp.float32), -1.0, 1.0)
                return n / jnp.clip(
                    jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6, None
                )
            outs = []
            for i in range(n_targets):
                z = target[..., i * latent_ch : (i + 1) * latent_ch]
                img = vae_lib.decode_scaled(vae_params, vae_cfg, z,
                                            spatial_axis=spatial_axis)
                outs.append((jnp.clip(img.astype(jnp.float32), -1, 1) + 1) / 2)
            return jnp.concatenate(outs, axis=-1)

        def fused(unet_params, vae_params, rgb, mask, key, text):
            if rgb.dtype == jnp.uint8:
                rgb = rgb.astype(jnp.float32) / 127.5 - 1.0
            if spatial:
                # encode runs inside the shard_map below (its convs need
                # the halo exchange); here only the noise is global.
                from jax.sharding import NamedSharding, PartitionSpec as P

                axis = spatial_axis_name
                ds_f = vae_cfg.downscale_factor
                h_lat, w_lat = rgb.shape[1] // ds_f, rgb.shape[2] // ds_f
                noise = jax.random.normal(
                    key, (E, h_lat, w_lat, target_ch), jnp.float32
                )
                x_rgb = jax.lax.with_sharding_constraint(
                    rgb, NamedSharding(mesh, P(None, axis, None, None))
                )
                noise = jax.lax.with_sharding_constraint(
                    noise, NamedSharding(mesh, P(None, axis, None, None))
                )

                def body(unet_params, vae_params, rgb_l, noise_l, text):
                    rgb_lat_l = vae_lib.encode_mean_scaled(
                        vae_params, vae_cfg, rgb_l.astype(self.dtype),
                        spatial_axis=axis,
                    )
                    return denoise_decode(
                        unet_params, vae_params, rgb_lat_l, noise_l, text,
                        spatial_axis=axis,
                    )

                preds = jax.shard_map(
                    body,
                    mesh=mesh,
                    in_specs=(P(), P(), P(None, axis, None, None),
                              P(None, axis, None, None), P()),
                    out_specs=P(None, axis, None, None),
                    # flash kernels inside carry no vma annotations
                    check_vma=False,
                )(unet_params, vae_params, x_rgb, noise, text)
                preds = jax.lax.with_sharding_constraint(
                    preds, NamedSharding(mesh, P())
                )
                return _reduce(preds, mask)

            rgb_lat = vae_lib.encode_mean_scaled(
                vae_params, vae_cfg, rgb.astype(self.dtype)
            )
            key_lcm = None
            if lcm is not None:
                key, key_lcm = jax.random.split(key)
            h_lat, w_lat = rgb_lat.shape[1], rgb_lat.shape[2]
            noise = jax.random.normal(
                key, (E, h_lat, w_lat, target_ch), jnp.float32
            )
            if e_pad > E:
                # tile: with few members on many devices the pad count can
                # exceed E (E=3 on an 8-mesh pads 5), which a single
                # noise[:pad] slice cannot fill
                reps = -(-e_pad // E)
                noise = jnp.tile(noise, (reps, 1, 1, 1))[:e_pad]
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                noise = jax.lax.with_sharding_constraint(
                    noise, NamedSharding(mesh, P("data", None, None, None))
                )

            if n_chunks == 1:
                preds = denoise_decode(
                    unet_params, vae_params, rgb_lat, noise, text, key_lcm
                )
            else:
                chunks = noise.reshape((n_chunks, chunk) + noise.shape[1:])
                chunk_ids = jnp.arange(n_chunks, dtype=jnp.uint32)
                preds = jax.lax.map(
                    lambda args: denoise_decode(
                        unet_params, vae_params, rgb_lat, args[0], text,
                        (jax.random.fold_in(key_lcm, args[1])
                         if key_lcm is not None else None),
                    ),
                    (chunks, chunk_ids),
                )
                preds = preds.reshape((e_pad,) + preds.shape[2:])
            if mesh is not None:
                # one all-gather: the ensemble reduction is cheap and the
                # partitioner mishandles non-divisible slices of sharded
                # sort operands — replicate members explicitly first.
                from jax.sharding import NamedSharding, PartitionSpec as P

                preds = jax.lax.with_sharding_constraint(
                    preds, NamedSharding(mesh, P())
                )
            preds = preds[:E]
            return _reduce(preds, mask)

        def _reduce(preds, mask):
            # ensemble reduce (inlined, still on device; padding excluded
            # from all statistics via the mask)
            if raw_members:
                # reference-exact parity mode (gauge_anchor=False): the
                # host scipy solve cannot run inside the program — return
                # decoded members; _infer_fused ensembles them eagerly.
                return preds
            if E > 1:
                if mode == "depth":
                    pred, unc = ens.ensemble_depth(
                        preds,
                        output_uncertainty=True,
                        valid_mask=mask,
                        **_depth_ensemble_call_kwargs(ens_kwargs),
                    )
                elif mode == "normals":
                    pred, unc = ens.ensemble_normals(
                        preds,
                        output_uncertainty=True,
                        reduction=ens_kwargs.get("reduction", "closest"),
                    )
                else:
                    pred, unc = ens.ensemble_iid(
                        preds,
                        output_uncertainty=True,
                        reduction=ens_kwargs.get("reduction", "median"),
                    )
            else:
                # reference E=1: decoded values pass through (clip only,
                # marigold_depth_pipeline.py:301-321) — no min-max stretch
                pred = preds
                unc = None

            if unc is None:
                unc = jnp.zeros_like(pred[..., :1])
            return pred, unc

        return jax.jit(fused)

    def get_fused_fn(self, hp, wp, num_steps, ensemble_size, chunk, mode,
                     n_targets, ensemble_opts=(), spatial=False):
        if spatial:
            # the spatial builder always denoises all E members in one
            # chunk; normalize so differing caller batch_size values
            # don't compile duplicate (byte-identical) programs
            chunk = ensemble_size
        elif self.mesh is not None:
            # same for the mesh path: the builder overrides chunk to the
            # sharded mega-chunk, so the caller's batch_size is dead here
            n_dev = self.mesh.shape["data"]
            chunk = -(-ensemble_size // n_dev) * n_dev
        from marigold_tpu.ops.attention import get_flash_softmax

        key = ("fused", hp, wp, num_steps, ensemble_size, chunk, mode,
               n_targets, ensemble_opts, spatial, get_flash_softmax(),
               self._lcm_fingerprint())
        return self._cached_program(
            key,
            lambda: self._build_fused_fn(num_steps, ensemble_size, chunk,
                                         mode, n_targets, ensemble_opts,
                                         spatial=spatial),
        )

    # -------------------------------------------------------------- #
    # batched multi-image serving: N images x E members in one program

    @staticmethod
    def decode_chunking(total: int, crop_hw: tuple, mode: str,
                        n_targets: int) -> tuple:
        """(n_chunks, rows_per_chunk) for the decode stage. The decoder's
        activations cap its batch (~20 decoded 768px images on v5e); the
        cap scales inversely with output pixels, and IID decodes
        n_targets latent groups per row with no data dependence between
        them, so XLA overlaps their activations — the cap counts decoded
        IMAGES (rows x n_targets), not rows (measured: a 24-row 640px
        3-target chunk compiled to 21.1 GB HBM and OOMed). Chunks are
        balanced (ceil split) so padding never exceeds n_chunks-1 rows."""
        px = max(crop_hw[0] * crop_hw[1], 1)
        if mode == "iid":
            px *= max(n_targets, 1)
        # base cap of 20 decoded 768px images; MARIGOLD_DECODE_CAP
        # overrides for geometry sweeps (1-step protocols shift the
        # denoise:decode ratio, so their optimum is swept separately)
        base_cap = int(os.environ.get("MARIGOLD_DECODE_CAP", "20"))
        dec_cap = max(1, int(base_cap * (768 * 768) / px))
        n_dec = -(-total // min(dec_cap, total))
        return n_dec, -(-total // n_dec)

    def _build_batch_fn(self, num_steps: int, ensemble_size: int, chunk: int,
                        mode: str, n_targets: int, out_hw, crop_hw,
                        ensemble_opts: tuple, n_images: int,
                        compact_output: bool = False,
                        resample_method: str = "bilinear"):
        """rgb [NI,Hp,Wp,3] + key -> (pred [NI,h,w,C], unc [NI,h,w,C]).
        Throughput-oriented: all images' members share the denoise batch,
        improving MXU utilization over per-image serving."""
        from marigold_tpu.pipelines import ensemble as ens

        schedule = self.schedule
        lcm = getattr(self, "lcm", None)
        unet_cfg, vae_cfg = self.unet_cfg, self.vae_cfg
        if lcm is not None:
            # legacy v1-0 LCM checkpoints batch-serve too: the scan drives
            # the consistency sampler (renoise toward the next t with fresh
            # per-step noise) instead of DDIM, keyed like the fused path
            ts = lcm.inference_timesteps(num_steps)
            prev_ts = np.concatenate([ts[1:], [-1]])
        else:
            ts = schedule.inference_timesteps(num_steps)
            prev_ts = schedule.prev_timesteps(ts)
        step_idx = np.arange(len(ts))
        ts_table = jnp.asarray(np.stack([ts, prev_ts, step_idx], 1), jnp.int32)
        n_steps_total = len(ts)
        latent_ch = vae_cfg.latent_channels
        target_ch = latent_ch * max(n_targets, 1)
        E, NI = ensemble_size, n_images
        total = NI * E
        n_chunks = -(-total // chunk)
        t_pad = n_chunks * chunk
        # decode is chunked independently of the denoise batch: the
        # decoder's activations cap its batch, while the denoise batch
        # can grow to amortize fixed costs — the handoff is tiny
        # latents, not decoded images (sizing: decode_chunking above)
        n_dec, dec_chunk = self.decode_chunking(
            total, crop_hw, mode, n_targets
        )
        d_pad = n_dec * dec_chunk
        ens_kwargs = dict(ensemble_opts)
        raw_members = _is_reference_ensemble(mode, E, ens_kwargs)

        def denoise(unet_params, rgb_rows, noise, text, lcm_key=None):
            # NOTE: lcm_key must already be chunk-distinct when chunked
            # (see the fold_in at the lax.map below)
            target = noise.astype(self.dtype)

            def step(carry, t_pair):
                x = jnp.concatenate([rgb_rows, carry], axis=-1)
                out = unet_lib.apply(unet_params, unet_cfg, x, t_pair[0], text)
                if lcm is not None:
                    fresh = jax.random.normal(
                        jax.random.fold_in(lcm_key, t_pair[2]),
                        carry.shape, jnp.float32,
                    )
                    new, _ = lcm.step(
                        out, t_pair[0], t_pair[1], carry, fresh,
                        is_last=t_pair[2] == n_steps_total - 1,
                    )
                else:
                    new = schedule.ddim_step(out, t_pair[0], t_pair[1], carry)
                return new.astype(self.dtype), None

            target, _ = jax.lax.scan(step, target, ts_table)
            return target  # [rows, h, w, 4n] latents

        def decode(vae_params, target):
            if mode == "depth":
                img = vae_lib.decode_scaled(vae_params, vae_cfg, target)
                d = jnp.mean(img.astype(jnp.float32), axis=-1, keepdims=True)
                return (jnp.clip(d, -1.0, 1.0) + 1.0) / 2.0
            if mode == "normals":
                img = vae_lib.decode_scaled(vae_params, vae_cfg, target)
                n = jnp.clip(img.astype(jnp.float32), -1.0, 1.0)
                return n / jnp.clip(
                    jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6, None
                )
            outs = []
            for i in range(n_targets):
                z = target[..., i * latent_ch : (i + 1) * latent_ch]
                img = vae_lib.decode_scaled(vae_params, vae_cfg, z)
                outs.append((jnp.clip(img.astype(jnp.float32), -1, 1) + 1) / 2)
            return jnp.concatenate(outs, axis=-1)

        def reduce_one(members):  # [E, h, w, C] -> (pred, unc)
            if E == 1:
                # reference E=1: decoded values pass through (clip only,
                # marigold_depth_pipeline.py:301-321) — no min-max stretch
                return members[0], jnp.zeros_like(members[0][..., :1])
            if mode == "depth":
                pred, unc = ens.ensemble_depth(
                    members,
                    output_uncertainty=True,
                    **_depth_ensemble_call_kwargs(ens_kwargs),
                )
            elif mode == "normals":
                pred, unc = ens.ensemble_normals(
                    members, output_uncertainty=True,
                    reduction=ens_kwargs.get("reduction", "closest"),
                )
            else:
                pred, unc = ens.ensemble_iid(
                    members, output_uncertainty=True,
                    reduction=ens_kwargs.get("reduction", "median"),
                )
            return pred[0], unc[0]

        def fused(unet_params, vae_params, rgb, key, text):
            if rgb.dtype == jnp.uint8:
                # device-side normalization: uint8 upload is 4x less
                # host->device traffic than float32 (the transfer was the
                # serving pipeline bubble on tunneled links)
                rgb = rgb.astype(jnp.float32) / 127.5 - 1.0
            rgb_lat = vae_lib.encode_mean_scaled(
                vae_params, vae_cfg, rgb.astype(self.dtype)
            )  # [NI,h,w,4]
            h_lat, w_lat = rgb_lat.shape[1], rgb_lat.shape[2]
            key_lcm = None
            if lcm is not None:
                key, key_lcm = jax.random.split(key)
            noise = jax.random.normal(
                key, (NI, E, h_lat, w_lat, target_ch), jnp.float32
            ).reshape(total, h_lat, w_lat, target_ch)
            rgb_rows = jnp.repeat(rgb_lat, E, axis=0).astype(self.dtype)
            if t_pad > total:
                pad_n = t_pad - total
                noise = jnp.concatenate([noise, noise[:pad_n]], axis=0)
                rgb_rows = jnp.concatenate([rgb_rows, rgb_rows[:pad_n]], axis=0)

            if n_chunks == 1:
                latents = denoise(unet_params, rgb_rows, noise, text, key_lcm)
            else:
                rr = rgb_rows.reshape((n_chunks, chunk) + rgb_rows.shape[1:])
                nn = noise.reshape((n_chunks, chunk) + noise.shape[1:])
                chunk_ids = jnp.arange(n_chunks, dtype=jnp.uint32)
                latents = jax.lax.map(
                    lambda ab: denoise(
                        unet_params, ab[0], ab[1], text,
                        (jax.random.fold_in(key_lcm, ab[2])
                         if key_lcm is not None else None),
                    ),
                    (rr, nn, chunk_ids),
                )
                latents = latents.reshape((t_pad,) + latents.shape[2:])
            latents = latents[:total]

            if n_dec == 1:
                preds = decode(vae_params, latents)
            else:
                if d_pad > total:
                    latents = jnp.concatenate(
                        [latents, latents[: d_pad - total]], axis=0
                    )
                lc = latents.reshape((n_dec, dec_chunk) + latents.shape[1:])
                preds = jax.lax.map(lambda z: decode(vae_params, z), lc)
                preds = preds.reshape((d_pad,) + preds.shape[2:])
            preds = preds[:total, : crop_hw[0], : crop_hw[1], :]
            preds = preds.reshape((NI, E) + preds.shape[1:])
            if raw_members:
                # reference-exact parity mode (gauge_anchor=False): the
                # host scipy solve cannot run inside the program — return
                # cropped members; _infer_fused_batch ensembles eagerly
                # (and handles out_hw resize / compact_output on host).
                return preds

            pred, unc = jax.lax.map(reduce_one, preds)  # [NI,h,w,C]
            if out_hw is not None and out_hw != crop_hw:
                pred = image_util.resize_jax(pred, out_hw, resample_method)
                unc = image_util.resize_jax(unc, out_hw, resample_method)
                if mode == "normals":
                    pred = pred / jnp.clip(
                        jnp.linalg.norm(pred, axis=-1, keepdims=True),
                        1e-6, None,
                    )
            if compact_output:
                # uint16 readback: 4x less device->host traffic, which
                # matters on tunneled links (~50 MB/s), at the precision
                # the 16-bit PNG serving outputs carry anyway. depth/iid
                # live in [0,1]; normals in [-1,1] map through (x+1)/2.
                # Callers invert (see _infer_fused_batch sync path).
                if mode == "normals":
                    pred = (pred + 1.0) / 2.0
                pred = jnp.round(
                    jnp.clip(pred, 0.0, 1.0) * 65535.0
                ).astype(jnp.uint16)
                unc = jnp.round(
                    jnp.clip(unc, 0.0, 1.0) * 65535.0
                ).astype(jnp.uint16)
            return pred, unc

        return jax.jit(fused)

    def get_batch_fn(self, hp, wp, num_steps, ensemble_size, chunk, mode,
                     n_targets, out_hw, crop_hw, ensemble_opts, n_images,
                     compact_output=False, resample_method="bilinear"):
        from marigold_tpu.ops.attention import get_flash_softmax

        key = ("batch", hp, wp, num_steps, ensemble_size, chunk, mode,
               n_targets, out_hw, crop_hw, ensemble_opts, n_images,
               compact_output, resample_method, get_flash_softmax(),
               self._lcm_fingerprint())
        return self._cached_program(
            key,
            lambda: self._build_batch_fn(num_steps, ensemble_size, chunk,
                                         mode, n_targets, out_hw, crop_hw,
                                         ensemble_opts, n_images,
                                         compact_output,
                                         resample_method=resample_method),
        )


# ------------------------------------------------------------------ #
# checkpoint loading


def load_pipeline_components(ckpt_dir: str, dtype=jnp.bfloat16,
                             variant: Optional[str] = None):
    """Read a diffusers pipeline checkpoint dir (model_index.json +
    unet/ vae/ text_encoder/ scheduler/) into a DiffusionCore + pipeline
    config dict. variant selects HF weight variants (e.g. "fp16" —
    reference --half_precision, script/depth/run.py:203-215)."""
    index_path = os.path.join(ckpt_dir, "model_index.json")
    pipe_cfg: dict[str, Any] = {}
    if os.path.exists(index_path):
        with open(index_path) as f:
            pipe_cfg = json.load(f)

    unet_cfg, unet_params = W.load_unet(
        os.path.join(ckpt_dir, "unet"), dtype=dtype, variant=variant
    )
    vae_cfg, vae_params = W.load_vae(
        os.path.join(ckpt_dir, "vae"), dtype=dtype, variant=variant
    )

    text_dir = os.path.join(ckpt_dir, "text_encoder")
    if os.path.isdir(text_dir):
        text_cfg, text_params = W.load_text_encoder(
            text_dir, dtype=dtype, variant=variant
        )
    else:
        text_cfg, text_params = None, None

    sched_dir = os.path.join(ckpt_dir, "scheduler")
    schedule = DiffusionSchedule.from_pretrained(sched_dir)

    core = DiffusionCore(
        unet_cfg, unet_params, vae_cfg, vae_params, text_cfg, text_params,
        schedule, dtype=dtype,
    )
    # legacy LCM checkpoints (v1-0): detect from the scheduler class name
    with open(os.path.join(sched_dir, "scheduler_config.json")) as f:
        sched_cfg = json.load(f)
    if "LCM" in str(sched_cfg.get("_class_name", "")):
        from marigold_tpu.core.lcm import LCMSchedule

        core.lcm = LCMSchedule.create(
            base=schedule,
            original_inference_steps=int(
                sched_cfg.get("original_inference_steps", 50)
            ),
        )
    return core, pipe_cfg


# ------------------------------------------------------------------ #
# host-side pre/post helpers


def image_to_array(input_image) -> np.ndarray:
    """PIL image / [H,W,3] uint8 / float array -> float32 [H,W,3] in [-1,1]
    (reference preprocess, marigold_depth_pipeline.py:229-254).

    Float inputs are expected in [0,1]. The max()>1.5 heuristic below
    rescues the common 0..255-float mistake, but it cannot detect a
    dark 0..255 frame whose max is <=1.5 — pass uint8 (or [0,1] floats)
    for unambiguous handling."""
    if isinstance(input_image, Image.Image):
        arr = np.asarray(input_image.convert("RGB"), np.float32) / 255.0
    else:
        arr = np.asarray(input_image)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, -1)
        if arr.ndim == 3 and arr.shape[0] == 3 and arr.shape[-1] != 3:
            arr = np.moveaxis(arr, 0, -1)  # CHW -> HWC
        if np.issubdtype(arr.dtype, np.integer):
            # dtype, not value range: a near-black uint8 frame (max <= 1)
            # must still scale by /255 or pixel value 1 becomes full white
            arr = arr.astype(np.float32) / 255.0
        else:
            arr = arr.astype(np.float32)
            if arr.max() > 1.5:  # float carrying 0..255 values
                arr = arr / 255.0
    arr = arr * 2.0 - 1.0
    return np.clip(arr, -1.0, 1.0)


def pad_to_multiple_of(x: np.ndarray, multiple: int) -> tuple[np.ndarray, int, int]:
    """Pad H,W (edge mode) up to a multiple (VAE needs /8; also bucketing)."""
    h, w = x.shape[-3], x.shape[-2]
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    if ph or pw:
        pad = [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
        x = np.pad(x, pad, mode="edge")
    return x, h, w


class BasePipeline:
    """Common orchestration for the three modality pipelines."""

    latent_scale_factor = LATENT_SCALE_FACTOR
    mode: str = "depth"
    n_targets: int = 1

    def __init__(self, core: DiffusionCore, pipe_cfg: dict):
        self.core = core
        self.pipe_cfg = pipe_cfg
        self.default_denoising_steps = pipe_cfg.get("default_denoising_steps")
        self.default_processing_resolution = pipe_cfg.get(
            "default_processing_resolution"
        )
        self.scale_invariant = pipe_cfg.get("scale_invariant", True)
        self.shift_invariant = pipe_cfg.get("shift_invariant", True)

    @classmethod
    def from_pretrained(cls, ckpt_dir: str, dtype=jnp.bfloat16, mesh=None,
                        variant=None, **kwargs):
        core, pipe_cfg = load_pipeline_components(
            ckpt_dir, dtype=dtype, variant=variant
        )
        if mesh is not None:
            core.mesh = mesh
            from marigold_tpu.parallel.mesh import replicate

            core.unet_params = replicate(mesh, core.unet_params)
            core.vae_params = replicate(mesh, core.vae_params)
        return cls(core, pipe_cfg)

    # ---------------- denoising orchestration ---------------- #

    @staticmethod
    def _noise_key(seed: Optional[int]) -> jax.Array:
        """Reference seed semantics (marigold_depth_pipeline.py:430-435):
        `generator=None` draws FRESH noise on every invocation — folder
        inference without --seed must give each image/batch a distinct
        noise stream. Explicit seeds stay fully deterministic (and
        chunking-independent: the key feeds one [NI,E,...] normal draw)."""
        if seed is None:
            import secrets

            return jax.random.PRNGKey(secrets.randbits(31))
        return jax.random.PRNGKey(int(seed) % (2**31))

    def _infer_fused(
        self,
        rgb_norm: np.ndarray,  # [H,W,3] in [-1,1] (already at processing res)
        denoising_steps: int,
        ensemble_size: int,
        batch_size: int = 0,
        seed: Optional[int] = None,
        out_hw: Optional[tuple] = None,  # resize-back target (input res)
        ensemble_kwargs: Optional[dict] = None,
        shape_bucketing: bool = False,
        spatial: bool = False,
        resample_method: str = "bilinear",
    ):
        """Single-dispatch fused inference. Inputs edge-pad to the VAE's /8
        grid (minimal padding — the eval-protocol behavior); a validity
        mask keeps any padding out of the ensemble statistics, and
        crop-back + resize to the original resolution happen on host
        (torch-parity antialiased resize honoring resample_method,
        reference marigold_depth_pipeline.py:306-312).

        shape_bucketing=True pads to a 64-px grid instead, so
        mixed-resolution folder inference (cli/run.py at processing_res=0)
        compiles at most one program per bucket rather than one per unique
        image shape (remote compiles cost minutes each on this stack).
        OFF for protocol runs: bucket padding adds up to 63 px of
        replicated content that feeds global self-attention and the VAE —
        protocol datasets are uniform-shaped and compile one program
        regardless.

        spatial=True (requires a mesh): shard the image's H axis over the
        mesh instead of the ensemble axis — the >1k-px long-context mode
        where one trajectory outgrows a chip (parallel/spatial.py). H pads
        to 64 * mesh-size px so every UNet/VAE level splits evenly; the
        mask keeps the padding out of the statistics as usual.

        Returns (pred [h,w,C] float32, uncertainty [h,w,C] or None)."""
        core = self.core
        ds = core.vae_cfg.downscale_factor
        bucket = max(64, ds) if shape_bucketing else ds
        x, h0, w0 = pad_to_multiple_of(rgb_norm[None], bucket)
        if spatial:
            if core.mesh is None:
                raise ValueError(
                    "spatial=True needs a pipeline built with a mesh "
                    "(from_pretrained(..., mesh=get_mesh()))"
                )
            # every UNet level's shard-local H must stay even: pixel H
            # divisible by vae_ds * 2^(levels-1) * mesh size (the
            # pipeline analog of parallel/spatial.py:check_spatial_divisibility)
            axis = core.mesh.axis_names[0]
            need_h = (
                core.vae_cfg.downscale_factor
                * (1 << (len(core.unet_cfg.block_out_channels) - 1))
                * core.mesh.shape[axis]
            )
            ph = (need_h - x.shape[1] % need_h) % need_h
            if ph:
                x = np.pad(
                    x, [(0, 0), (0, ph), (0, 0), (0, 0)], mode="edge"
                )
        hp, wp = x.shape[1], x.shape[2]
        mask = np.zeros((1, hp, wp, 1), bool)
        mask[:, :h0, :w0] = True

        if batch_size <= 0:
            batch_size = find_batch_size(
                ensemble_size=ensemble_size,
                input_res=max(hp, wp),
                dtype_bytes=2 if core.dtype == jnp.bfloat16 else 4,
            )
        chunk = min(batch_size, ensemble_size)

        opts = tuple(sorted((ensemble_kwargs or {}).items()))
        merged = dict(ensemble_kwargs or {})
        if self.mode == "depth":
            merged = dict(
                scale_invariant=self.scale_invariant,
                shift_invariant=self.shift_invariant,
            )
            merged.update(ensemble_kwargs or {})
            opts = tuple(sorted(merged.items()))

        fn = core.get_fused_fn(
            hp, wp, denoising_steps, ensemble_size, chunk, self.mode,
            self.n_targets, opts, spatial=spatial,
        )
        key = self._noise_key(seed)
        if _is_reference_ensemble(self.mode, ensemble_size, merged):
            # reference-exact parity mode: the program returns raw decoded
            # members; crop the padding off (so no mask is needed) and run
            # the eager host-solve ensemble (ensemble.py gauge_anchor=False)
            from marigold_tpu.pipelines import ensemble as ens

            members = fn(
                core.unet_params, core.vae_params, jnp.asarray(x),
                jnp.asarray(mask), key, core.empty_text_embed,
            )  # [E,hp,wp,1]
            pred, unc = ens.ensemble_depth(
                members[:, :h0, :w0],
                output_uncertainty=True,
                **_depth_ensemble_call_kwargs(merged),
            )
            pred_np = np.asarray(jax.device_get(pred))[0]
            unc_np = np.asarray(jax.device_get(unc))[0]
        else:
            pred, unc = fn(
                core.unet_params, core.vae_params, jnp.asarray(x),
                jnp.asarray(mask), key, core.empty_text_embed,
            )
            pred_np = np.asarray(jax.device_get(pred))[0, :h0, :w0]
            unc_np = np.asarray(jax.device_get(unc))[0, :h0, :w0]

        if out_hw is not None and out_hw != (h0, w0):
            pred_np = image_util.resize_host(pred_np, out_hw, resample_method)
            unc_np = image_util.resize_host(unc_np, out_hw, resample_method)
            if self.mode == "normals":
                norm = np.linalg.norm(pred_np, axis=-1, keepdims=True)
                pred_np = pred_np / np.clip(norm, 1e-6, None)
        if ensemble_size <= 1:
            unc_np = None
        return pred_np.astype(np.float32), unc_np

    def _check_inference_step(self, n_step: int) -> None:
        for msg in check_trailing_zero_snr(self.core.schedule, n_step):
            logger.warning(msg)

    def _batch_infer(
        self,
        input_images,
        denoising_steps: Optional[int],
        ensemble_size: int,
        processing_res: Optional[int],
        match_input_res: bool,
        resample_method: str,
        batch_size: int,
        seed: Optional[int],
        ensemble_kwargs: Optional[dict],
        default_steps: int = 4,
        compact_readback: bool = False,
    ):
        """Shared batched-serving front half: defaults, step check, same-
        shape validation, processing-res resize, fused batch dispatch.
        Returns (preds [NI,h,w,C], uncs [NI,h,w,C] or None). Modality
        batch_call wrappers only build their output containers.

        compact_readback: read predictions back as uint16 (converted to
        float here) — 4x less device->host traffic at 16-bit-PNG
        precision; for serving loops on tunneled links."""
        if denoising_steps is None:
            denoising_steps = self.default_denoising_steps or default_steps
        if processing_res is None:
            processing_res = self.default_processing_resolution or 768
        self._check_inference_step(denoising_steps)

        # uint8 fast path: when no processing-res resize is needed the
        # batch uploads raw uint8 and normalizes on device (u/127.5 - 1
        # == image_to_array's math exactly) — 4x less host->device
        # traffic, the serving bubble on tunneled links. Any resize keeps
        # the reference's float preprocessing.
        def _as_u8(im):
            if isinstance(im, Image.Image):
                return np.asarray(im.convert("RGB"), np.uint8)
            a = np.asarray(im)
            if a.dtype == np.uint8 and a.ndim == 3 and a.shape[-1] == 3:
                return a
            return None

        u8 = [_as_u8(im) for im in input_images]
        if all(a is not None for a in u8):
            shapes = {a.shape for a in u8}
            assert len(shapes) == 1, \
                f"images must share one shape, got {shapes}"
            ih, iw = u8[0].shape[:2]
            if not (processing_res > 0 and max(ih, iw) != processing_res):
                return self._infer_fused_batch(
                    np.stack(u8),
                    denoising_steps=denoising_steps,
                    ensemble_size=ensemble_size,
                    batch_size=batch_size,
                    seed=seed,
                    out_hw=(ih, iw) if match_input_res else None,
                    ensemble_kwargs=ensemble_kwargs,
                    compact_output=compact_readback,
                    resample_method=resample_method,
                )

        rgbs = [image_to_array(im) for im in input_images]
        shapes = {r.shape for r in rgbs}
        assert len(shapes) == 1, f"images must share one shape, got {shapes}"
        input_h, input_w = rgbs[0].shape[:2]
        if processing_res > 0 and max(input_h, input_w) != processing_res:
            nh, nw = image_util.resize_max_res_shape(
                input_h, input_w, processing_res
            )
            rgbs = [
                image_util.resize_np(r, (nh, nw), method=resample_method)
                for r in rgbs
            ]
        out_hw = (input_h, input_w) if match_input_res else None
        return self._infer_fused_batch(
            np.stack(rgbs),
            denoising_steps=denoising_steps,
            ensemble_size=ensemble_size,
            batch_size=batch_size,
            seed=seed,
            out_hw=out_hw,
            ensemble_kwargs=ensemble_kwargs,
            compact_output=compact_readback,
            resample_method=resample_method,
        )

    def _infer_fused_batch(
        self,
        rgb_norm_batch: np.ndarray,  # [NI,H,W,3]: float in [-1,1] or uint8
        # (uint8 normalizes on device — 4x cheaper host->device upload)
        denoising_steps: int,
        ensemble_size: int,
        batch_size: int = 0,
        seed: Optional[int] = None,
        out_hw: Optional[tuple] = None,
        ensemble_kwargs: Optional[dict] = None,
        sync: bool = True,
        compact_output: bool = False,
        resample_method: str = "bilinear",
    ):
        """Batched serving: returns (pred [NI,h,w,C], unc [NI,h,w,C] or None).
        With sync=False, returns device arrays without host transfer —
        callers can pipeline several in-flight batches (steady-state
        serving) and transfer when needed. compact_output: read back
        uint16 in [0, 65535] — 4x cheaper readback at exactly the
        16-bit-PNG output precision (normals map through (x+1)/2); with
        sync=True the conversion back to float happens here, with
        sync=False the caller inverts after device_get."""
        core = self.core
        x, h0, w0 = pad_to_multiple_of(
            rgb_norm_batch, core.vae_cfg.downscale_factor
        )
        hp, wp = x.shape[1], x.shape[2]
        ni = x.shape[0]
        if batch_size <= 0:
            batch_size = find_batch_size(
                ensemble_size=ni * ensemble_size,
                input_res=max(hp, wp),
                dtype_bytes=2 if core.dtype == jnp.bfloat16 else 4,
            )
        chunk = min(batch_size, ni * ensemble_size)

        opts = tuple(sorted((ensemble_kwargs or {}).items()))
        merged = dict(ensemble_kwargs or {})
        if self.mode == "depth":
            merged = dict(
                scale_invariant=self.scale_invariant,
                shift_invariant=self.shift_invariant,
            )
            merged.update(ensemble_kwargs or {})
            opts = tuple(sorted(merged.items()))

        compact = bool(compact_output)
        fn = core.get_batch_fn(
            hp, wp, denoising_steps, ensemble_size, chunk, self.mode,
            self.n_targets, out_hw, (h0, w0), opts, ni,
            compact_output=compact, resample_method=resample_method,
        )
        key = self._noise_key(seed)
        if _is_reference_ensemble(self.mode, ensemble_size, merged):
            # reference-exact parity mode: the program returns cropped raw
            # members [NI,E,h,w,1]; ensemble eagerly per image (host scipy
            # solve), then reproduce the fused tail's out_hw resize and
            # compact quantization on host. Host resize is the
            # reference-exact one (torch-parity, tests/test_resize_parity)
            # — the throughput path resizes on device instead.
            from marigold_tpu.pipelines import ensemble as ens

            members = fn(
                core.unet_params, core.vae_params, jnp.asarray(x), key,
                core.empty_text_embed,
            )
            kw = _depth_ensemble_call_kwargs(merged)
            preds, uncs = [], []
            for i in range(ni):
                p, u = ens.ensemble_depth(
                    members[i], output_uncertainty=True, **kw
                )
                preds.append(np.asarray(jax.device_get(p))[0])
                uncs.append(np.asarray(jax.device_get(u))[0])
            pred = np.stack(preds).astype(np.float32)
            unc = np.stack(uncs).astype(np.float32)
            if out_hw is not None and out_hw != (h0, w0):
                pred = np.stack([
                    image_util.resize_host(p, out_hw, resample_method)
                    for p in pred
                ])
                unc = np.stack([
                    image_util.resize_host(u, out_hw, resample_method)
                    for u in unc
                ])
            if compact:
                pred = np.round(
                    np.clip(pred, 0.0, 1.0) * 65535.0
                ).astype(np.uint16)
                unc = np.round(
                    np.clip(unc, 0.0, 1.0) * 65535.0
                ).astype(np.uint16)
        else:
            pred, unc = fn(
                core.unet_params, core.vae_params, jnp.asarray(x), key,
                core.empty_text_embed,
            )
        if not sync:
            return pred, (unc if ensemble_size > 1 else None)
        pred_np = np.asarray(jax.device_get(pred)).astype(np.float32)
        unc_np = np.asarray(jax.device_get(unc)).astype(np.float32)
        if compact:
            pred_np /= 65535.0
            unc_np /= 65535.0
            if self.mode == "normals":
                pred_np = pred_np * 2.0 - 1.0
        if ensemble_size <= 1:
            unc_np = None
        return pred_np, unc_np

    def _run_ensemble(
        self,
        rgb_norm: np.ndarray,  # [H,W,3] in [-1,1]
        denoising_steps: int,
        ensemble_size: int,
        batch_size: int = 0,
        seed: Optional[int] = None,
        show_progress_bar: bool = False,
    ) -> np.ndarray:
        """Returns raw per-member predictions [E, Hp, Wp, C_out] (padded to
        /8; caller crops back)."""
        core = self.core
        x, h0, w0 = pad_to_multiple_of(rgb_norm[None], core.vae_cfg.downscale_factor)
        hp, wp = x.shape[1], x.shape[2]
        h_lat, w_lat = hp // core.vae_cfg.downscale_factor, wp // core.vae_cfg.downscale_factor

        rgb_dev = jnp.asarray(x, core.dtype)
        rgb_latent = core.encode_rgb(rgb_dev)  # [1,h,w,4]

        # all-member initial noise drawn at once: deterministic in seed,
        # independent of chunking (unlike the reference, whose noise stream
        # depends on the batch split)
        key = self._noise_key(seed)
        target_ch = core.vae_cfg.latent_channels * max(self.n_targets, 1)
        noise_all = jax.random.normal(
            key, (ensemble_size, h_lat, w_lat, target_ch), jnp.float32
        )

        if batch_size <= 0:
            batch_size = find_batch_size(
                ensemble_size=ensemble_size,
                input_res=max(hp, wp),
                dtype_bytes=2 if core.dtype == jnp.bfloat16 else 4,
            )
        batch_size = min(batch_size, ensemble_size)

        infer_fn = core.get_infer_fn(
            h_lat, w_lat, denoising_steps, batch_size, self.mode, self.n_targets
        )

        outs = []
        iterator = range(0, ensemble_size, batch_size)
        if show_progress_bar:
            from tqdm.auto import tqdm

            iterator = tqdm(
                list(iterator), desc=f"  {self.mode} inference batches", leave=False
            )
        for s in iterator:
            e = min(s + batch_size, ensemble_size)
            chunk = noise_all[s:e]
            if chunk.shape[0] < batch_size:  # pad final chunk: static shapes
                # tile: the remainder can be smaller than the pad it needs
                # (10 members at batch 8 leave a 2-row final chunk needing
                # 6 pad rows) — a single chunk[:pad] slice would under-fill
                # and trigger a fresh compile at the odd shape
                reps = -(-batch_size // chunk.shape[0])
                chunk = jnp.tile(
                    chunk, (reps,) + (1,) * (chunk.ndim - 1)
                )[:batch_size]
                out = infer_fn(
                    core.unet_params, core.vae_params, rgb_latent, chunk,
                    core.empty_text_embed,
                )[: e - s]
            else:
                out = infer_fn(
                    core.unet_params, core.vae_params, rgb_latent, chunk,
                    core.empty_text_embed,
                )
            outs.append(out)
        pred = jnp.concatenate(outs, axis=0)  # [E, Hp, Wp, C]
        return pred[:, :h0, :w0, :]
