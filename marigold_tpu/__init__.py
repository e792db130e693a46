"""marigold_tpu — TPU-native (JAX/XLA/Pallas) diffusion framework for dense
per-pixel image analysis: monocular depth, surface normals, and intrinsic
image decomposition.

A ground-up rebuild of the capabilities of prs-eth/Marigold (reference layer
map in SURVEY.md §1) designed for TPU hardware: NHWC activations, bf16 MXU
matmuls with fp32 islands, jitted end-to-end pipelines, ensemble members
sharded over a `jax.sharding.Mesh`.

Public API mirrors the reference's installable product
(`marigold/__init__.py:31-41` in the reference):

    from marigold_tpu import MarigoldDepthPipeline, MarigoldNormalsPipeline,
                             MarigoldIIDPipeline
"""

__version__ = "0.1.0"

from marigold_tpu.pipelines.depth import MarigoldDepthPipeline, MarigoldDepthOutput
from marigold_tpu.pipelines.normals import (
    MarigoldNormalsPipeline,
    MarigoldNormalsOutput,
)
from marigold_tpu.pipelines.iid import MarigoldIIDPipeline, MarigoldIIDOutput

# Back-compat alias, mirroring reference marigold/__init__.py:41
MarigoldPipeline = MarigoldDepthPipeline
MarigoldPipelineOutput = MarigoldDepthOutput

__all__ = [
    "MarigoldDepthPipeline",
    "MarigoldDepthOutput",
    "MarigoldNormalsPipeline",
    "MarigoldNormalsOutput",
    "MarigoldIIDPipeline",
    "MarigoldIIDOutput",
    "MarigoldPipeline",
    "MarigoldPipelineOutput",
]
