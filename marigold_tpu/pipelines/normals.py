"""Marigold surface-normals pipeline — TPU-native.

API parity: reference MarigoldNormalsPipeline.__call__
(marigold/marigold_normals_pipeline.py:139-308): RGB -> unit-norm normal
map in [-1,1]^3; decode clips + L2-normalizes per pixel (438-440); ensemble
default reduction "closest"; uncertainty = mean angular deviation / pi.
No scale/shift invariance. (The reference rejects LCM schedulers for
normals, 338-342 — we only ship DDIM.)
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, Optional, Union

import numpy as np
from PIL import Image

from marigold_tpu.pipelines import image_util
from marigold_tpu.pipelines.base import BasePipeline, image_to_array

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class MarigoldNormalsOutput:
    """normals_np: [H,W,3] float32 unit vectors in [-1,1];
    normals_img: PIL visualization; uncertainty: [H,W] in [0,1] or None."""

    normals_np: np.ndarray
    normals_img: Optional[Image.Image]
    uncertainty: Optional[np.ndarray]


class MarigoldNormalsPipeline(BasePipeline):
    mode = "normals"
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
        show_progress_bar: bool = True,
        ensemble_kwargs: Optional[Dict] = None,
        shape_bucketing: bool = False,
        spatial: bool = False,
    ) -> MarigoldNormalsOutput:
        if denoising_steps is None:
            denoising_steps = self.default_denoising_steps or 4
        if processing_res is None:
            processing_res = self.default_processing_resolution or 768
        assert processing_res >= 0
        assert ensemble_size >= 1
        if self.core.lcm is not None:
            raise ValueError(
                "LCM checkpoints are not supported for normals prediction"
            )
        self._check_inference_step(denoising_steps)

        if seed is None and generator is not None:
            seed = int(generator)

        rgb_norm = image_to_array(input_image)
        input_h, input_w = rgb_norm.shape[:2]
        if processing_res > 0 and max(input_h, input_w) != processing_res:
            nh, nw = image_util.resize_max_res_shape(input_h, input_w, processing_res)
            rgb_norm = image_util.resize_np(rgb_norm, (nh, nw), method=resample_method)

        out_hw = (input_h, input_w) if match_input_res else None
        normals, uncert = self._infer_fused(
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
        if uncert is not None:
            uncert = uncert[..., 0]
        normals = np.clip(normals, -1.0, 1.0).astype(np.float32)
        normals_img = Image.fromarray(image_util.norm_to_rgb(normals))

        return MarigoldNormalsOutput(
            normals_np=normals, normals_img=normals_img, uncertainty=uncert
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
        ensemble_kwargs: Optional[Dict] = None,
        compact_readback: bool = False,
    ) -> list:
        """Throughput-oriented batched serving for same-shape images (the
        normals eval protocol runs E=10 at 640/768 px over whole test
        sets): all images' ensemble members share one fused program.
        Returns a list of MarigoldNormalsOutput."""
        if self.core.lcm is not None:
            raise ValueError(
                "LCM checkpoints are not supported for normals prediction"
            )
        preds, uncs = self._batch_infer(
            input_images, denoising_steps, ensemble_size, processing_res,
            match_input_res, resample_method, batch_size, seed,
            ensemble_kwargs,
            compact_readback=compact_readback,
        )
        outputs = []
        for i in range(preds.shape[0]):
            n = np.clip(preds[i], -1.0, 1.0).astype(np.float32)
            unc = uncs[i, ..., 0] if uncs is not None else None
            outputs.append(
                MarigoldNormalsOutput(
                    normals_np=n,
                    normals_img=Image.fromarray(image_util.norm_to_rgb(n)),
                    uncertainty=unc,
                )
            )
        return outputs
