from raytracingengine_tpu.render.config import RenderConfig
from raytracingengine_tpu.render.pipeline import render_hdr, render_rays

__all__ = ["RenderConfig", "render_hdr", "render_rays"]
