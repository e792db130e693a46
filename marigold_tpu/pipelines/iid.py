"""Marigold intrinsic-image-decomposition (IID) pipeline — TPU-native.

API parity: reference MarigoldIIDPipeline (marigold/marigold_iid_pipeline.py)
— arbitrary target modalities named by the checkpoint's `target_properties`
(model_index.json): target latent is 4*n_targets channels, UNet input is
[rgb_latent | target_latent], each 4-channel group decodes through the
shared VAE, outputs fill a MarigoldIIDOutput keyed by target name with
per-target prediction_space (srgb / linear / stack) visualization handling
(fill_entry, lines 95-148; gamma 1/2.2 at 129).

Entry arrays stay CHW [3,H,W] in [0,1] for drop-in reference compatibility.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict, List, Optional, Union

import numpy as np
from PIL import Image

from marigold_tpu.pipelines import image_util
from marigold_tpu.pipelines.base import BasePipeline, image_to_array

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class IIDEntry:
    """One decomposed component: array [3,H,W] in [0,1], PIL image,
    optional uncertainty (reference IIDEntry, lines 59-77)."""

    name: str
    array: Optional[np.ndarray] = None
    image: Optional[Image.Image] = None
    uncertainty: Optional[np.ndarray] = None


class MarigoldIIDOutput:
    """Container keyed by target name (reference lines 80-161)."""

    def __init__(self, target_names: List[str]):
        self.n_targets = len(target_names)
        self.target_names = target_names
        self.entries: List[IIDEntry] = [IIDEntry(name=n) for n in target_names]
        self._entry_map = {e.name: e for e in self.entries}
        self._filled = set()

    def fill_entry(
        self,
        name: str,
        prediction: np.ndarray,  # [3,H,W] in [0,1]
        uncertainty: Optional[np.ndarray] = None,
        target_properties: Optional[Dict[str, Any]] = None,
    ) -> None:
        if name not in self._entry_map:
            raise KeyError(f"Unknown entry name: {name}")
        if name in self._filled:
            raise RuntimeError(f"Entry {name} already filled")
        entry = self._entry_map[name]

        array = np.asarray(prediction).squeeze()
        img_array = array
        prediction_space = (target_properties or {}).get(name, {}).get(
            "prediction_space", "srgb"
        )
        if prediction_space == "linear":
            up_to_scale = target_properties[name].get("up_to_scale", False)
            if up_to_scale:
                img_array = img_array / max(img_array.max(), 1e-6)
            img_array = image_util.linear2srgb(img_array)
        # "stack" and "srgb": visualize as-is

        img_u8 = (np.clip(img_array, 0, 1) * 255).astype(np.uint8)
        image = Image.fromarray(image_util.chw2hwc(img_u8))

        entry.array = array
        entry.image = image
        entry.uncertainty = (
            np.asarray(uncertainty).squeeze() if uncertainty is not None else None
        )
        self._filled.add(name)

    @property
    def is_complete(self) -> bool:
        return len(self._filled) == self.n_targets

    def __getitem__(self, key: str) -> IIDEntry:
        return self._entry_map[key]

    def __iter__(self):
        return iter(self.entries)


class MarigoldIIDPipeline(BasePipeline):
    mode = "iid"

    def __init__(self, core, pipe_cfg):
        super().__init__(core, pipe_cfg)
        self.target_properties = pipe_cfg.get("target_properties") or {}
        self.target_names = self.target_properties.get("target_names")
        if not self.target_names:
            # infer from UNet out_channels (4 latent ch per target)
            n = core.unet_cfg.out_channels // core.vae_cfg.latent_channels
            self.target_names = [f"target_{i}" for i in range(n)]
        self.n_targets = len(self.target_names)
        # consistency with the surgered UNet (reference asserts at 360-363)
        expected = self.core.vae_cfg.latent_channels * self.n_targets
        assert self.core.unet_cfg.out_channels == expected, (
            f"UNet out_channels {self.core.unet_cfg.out_channels} != "
            f"4 * n_targets ({expected})"
        )

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
    ) -> MarigoldIIDOutput:
        if denoising_steps is None:
            denoising_steps = self.default_denoising_steps or 4
        if processing_res is None:
            processing_res = self.default_processing_resolution or 768
        assert processing_res >= 0
        assert ensemble_size >= 1
        if self.core.lcm is not None:
            raise ValueError(
                "LCM checkpoints are not supported for IID prediction"
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
        final_pred, pred_uncert = self._infer_fused(
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
        )  # pred [h,w,3n]; uncert [h,w,3n] (per-channel MAD) or None

        output = MarigoldIIDOutput(target_names=self.target_names)
        for i, name in enumerate(self.target_names):
            sl = slice(i * 3, i * 3 + 3)
            output.fill_entry(
                name=name,
                prediction=image_util.hwc2chw(final_pred[..., sl]),
                uncertainty=(
                    image_util.hwc2chw(pred_uncert[..., sl])
                    if pred_uncert is not None
                    else None
                ),
                target_properties=self.target_properties,
            )
        assert output.is_complete
        return output

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
        """Batched serving for same-shape images (the IID protocol runs
        ensemble_size=1, so sharing the denoise batch across images is the
        only batching axis). Returns a list of MarigoldIIDOutput."""
        if self.core.lcm is not None:
            raise ValueError(
                "LCM checkpoints are not supported for IID prediction"
            )
        preds, uncs = self._batch_infer(
            input_images, denoising_steps, ensemble_size, processing_res,
            match_input_res, resample_method, batch_size, seed,
            ensemble_kwargs,
            compact_readback=compact_readback,
        )  # [NI,h,w,3n]
        outputs = []
        for b in range(preds.shape[0]):
            output = MarigoldIIDOutput(target_names=self.target_names)
            for i, name in enumerate(self.target_names):
                sl = slice(i * 3, i * 3 + 3)
                output.fill_entry(
                    name=name,
                    prediction=image_util.hwc2chw(preds[b, ..., sl]),
                    uncertainty=(
                        image_util.hwc2chw(uncs[b, ..., sl])
                        if uncs is not None
                        else None
                    ),
                    target_properties=self.target_properties,
                )
            assert output.is_complete
            outputs.append(output)
        return outputs
