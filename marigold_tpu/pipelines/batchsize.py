"""Inference batch-size selection, TPU-native.

The reference ships a lookup table tuned per GPU model
(marigold/util/batchsize.py:35-90: resolution x VRAM-GiB x dtype -> bs).
A table keyed on GPU SKUs is meaningless on TPU; instead we derive the
batch size from the device's actual HBM budget and a first-principles
activation-memory model of the SD2 UNet + flash attention:

  per-sample activation ~ c_act * (H/8)*(W/8) * bytes  (dominated by the
  320-ch finest feature maps and their skip copies; flash attention keeps
  the N^2 term out of HBM)

Clamping mirrors the reference (find_batch_size:60-90): result <= ensemble
size, and if bs > E/2 round up to ceil(E/2) so two chunks are balanced.
"""

from __future__ import annotations

import math

import jax


def device_memory_bytes(device=None) -> int:
    """Best-effort HBM capacity of the target device."""
    if device is None:
        device = jax.devices()[0]
    stats = None
    try:
        stats = device.memory_stats()
    except Exception:
        pass
    if stats:
        if "bytes_limit" in stats:
            return int(stats["bytes_limit"])
        if "bytes_reservable_limit" in stats:
            return int(stats["bytes_reservable_limit"])
    # single v5e chip default
    return 16 * 1024**3


# empirical activation bytes per latent pixel per sample for the SD2
# UNet forward + VAE decode (bf16), including skip tensors and XLA
# temporaries; measured on v5e at 768px (96x96 latents): a 20-sample batch
# fits comfortably in the ~13GB activation budget. fp32 doubles it.
_ACT_BYTES_PER_LATENT_PIXEL_BF16 = 6.5e4


def find_batch_size(
    ensemble_size: int,
    input_res: int,
    dtype_bytes: int = 2,
    n_devices: int = 1,
    model_bytes: int = 2 * 10**9,
    device=None,
) -> int:
    """Largest per-device batch that fits, clamped to the ensemble size
    (API role of reference find_batch_size, batchsize.py:60-90)."""
    hbm = device_memory_bytes(device)
    budget = max(hbm - model_bytes - 1 * 1024**3, 1 * 1024**3)  # keep headroom
    latent_pixels = (max(input_res, 64) / 8) ** 2
    per_sample = _ACT_BYTES_PER_LATENT_PIXEL_BF16 * latent_pixels * (dtype_bytes / 2)
    bs = max(int(budget / per_sample), 1)

    total = ensemble_size
    per_dev_ensemble = math.ceil(total / max(n_devices, 1))
    bs = min(bs, per_dev_ensemble)
    # balance chunks like the reference: avoid a tiny ragged last chunk
    if per_dev_ensemble > bs > per_dev_ensemble / 2:
        bs = int(math.ceil(per_dev_ensemble / 2))
    return max(bs, 1)
