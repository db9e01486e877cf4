from diner_tpu.renderer.composite import composite
from diner_tpu.renderer.renderer import render_rays, render_image

__all__ = ["composite", "render_rays", "render_image"]
