from marigold_tpu.models import unet, vae, clip_text, weights  # noqa: F401
