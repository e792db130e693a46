"""Marigold depth pipeline — TPU-native.

API parity: reference MarigoldDepthPipeline.__call__
(marigold/marigold_depth_pipeline.py:154-338): RGB -> affine-invariant depth
in [0,1] + optional colorized map + MAD uncertainty. Same argument names
and defaults; `generator` is accepted as an integer seed (JAX randomness is
key-based; a torch.Generator cannot cross the framework boundary).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, Optional, Union

import jax.numpy as jnp
import numpy as np
from PIL import Image

from marigold_tpu.pipelines import image_util
from marigold_tpu.pipelines.base import BasePipeline, image_to_array

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class MarigoldDepthOutput:
    """Output of MarigoldDepthPipeline (reference lines 60-75).

    depth_np: [H,W] float32 in [0,1]; depth_colored: PIL or None;
    uncertainty: [H,W] MAD or None.
    """

    depth_np: np.ndarray
    depth_colored: Optional[Image.Image]
    uncertainty: Optional[np.ndarray]


class MarigoldDepthPipeline(BasePipeline):
    mode = "depth"
    n_targets = 1

    def __call__(
        self,
        input_image: Union[Image.Image, np.ndarray],
        denoising_steps: Optional[int] = None,
        ensemble_size: int = 1,
        processing_res: Optional[int] = None,
        match_input_res: bool = True,
        resample_method: str = "bilinear",
        batch_size: int = 0,
        generator: Optional[int] = None,
        seed: Optional[int] = None,
        color_map: Optional[str] = "Spectral",
        show_progress_bar: bool = True,
        ensemble_kwargs: Optional[Dict] = None,
        shape_bucketing: bool = False,
        spatial: bool = False,
    ) -> MarigoldDepthOutput:
        if denoising_steps is None:
            denoising_steps = self.default_denoising_steps or 1
        if processing_res is None:
            processing_res = self.default_processing_resolution or 768
        assert processing_res >= 0
        assert ensemble_size >= 1
        if self.core.lcm is not None:
            logger.warning(
                "LCM checkpoint detected: the LCM depth checkpoint is "
                "deprecated; consider marigold-depth-v1-1 (reference "
                "deprecation, marigold_depth_pipeline.py:368-377)"
            )
        self._check_inference_step(denoising_steps)

        if seed is None and generator is not None:
            seed = int(generator)

        # ---------------- preprocess ----------------
        rgb_norm = image_to_array(input_image)  # [H,W,3] in [-1,1]
        input_h, input_w = rgb_norm.shape[:2]
        if processing_res > 0 and max(input_h, input_w) != processing_res:
            nh, nw = image_util.resize_max_res_shape(
                input_h, input_w, processing_res
            )
            rgb_norm = image_util.resize_np(
                rgb_norm, (nh, nw), method=resample_method
            )

        # ---------------- fused denoise + ensemble + resize ----------------
        out_hw = (input_h, input_w) if match_input_res else None
        pred, pred_uncert = self._infer_fused(
            rgb_norm,
            denoising_steps=denoising_steps,
            ensemble_size=ensemble_size,
            batch_size=batch_size,
            seed=seed,
            out_hw=out_hw,
            ensemble_kwargs=ensemble_kwargs,
            shape_bucketing=shape_bucketing,
            spatial=spatial,
            resample_method=resample_method,
        )
        if pred_uncert is not None:
            pred_uncert = pred_uncert[..., 0]
        depth_pred = np.clip(pred[..., 0], 0.0, 1.0).astype(np.float32)

        depth_colored_img = None
        if color_map is not None:
            colored = image_util.colorize_depth_maps(
                depth_pred, 0.0, 1.0, cmap=color_map
            )[0]  # [3,H,W]
            colored = image_util.float2int(image_util.chw2hwc(colored))
            depth_colored_img = Image.fromarray(colored)

        return MarigoldDepthOutput(
            depth_np=depth_pred,
            depth_colored=depth_colored_img,
            uncertainty=pred_uncert,
        )

    def batch_call(
        self,
        input_images,
        denoising_steps: Optional[int] = None,
        ensemble_size: int = 1,
        processing_res: Optional[int] = None,
        match_input_res: bool = True,
        resample_method: str = "bilinear",
        batch_size: int = 0,
        seed: Optional[int] = None,
        color_map: Optional[str] = None,
        ensemble_kwargs: Optional[Dict] = None,
        compact_readback: bool = False,
    ) -> list:
        """Throughput-oriented batched serving: all images' ensemble members
        share one fused program (new TPU-native capability; no reference
        counterpart — the reference serves images one by one). Images must
        share the same input resolution. Returns a list of
        MarigoldDepthOutput."""
        if self.core.lcm is not None:
            logger.warning(
                "LCM checkpoint detected: the LCM depth checkpoint is "
                "deprecated; consider marigold-depth-v1-1 (reference "
                "deprecation, marigold_depth_pipeline.py:368-377)"
            )
        preds, uncs = self._batch_infer(
            input_images, denoising_steps, ensemble_size, processing_res,
            match_input_res, resample_method, batch_size, seed,
            ensemble_kwargs, default_steps=1,
            compact_readback=compact_readback,
        )
        outputs = []
        for i in range(preds.shape[0]):
            depth = np.clip(preds[i, ..., 0], 0.0, 1.0).astype(np.float32)
            unc = uncs[i, ..., 0] if uncs is not None else None
            colored = None
            if color_map is not None:
                arr = image_util.colorize_depth_maps(depth, 0, 1, color_map)[0]
                colored = Image.fromarray(
                    image_util.float2int(image_util.chw2hwc(arr))
                )
            outputs.append(
                MarigoldDepthOutput(
                    depth_np=depth, depth_colored=colored, uncertainty=unc
                )
            )
        return outputs
