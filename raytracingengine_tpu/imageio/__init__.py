from raytracingengine_tpu.imageio.obj import load_obj
from raytracingengine_tpu.imageio.png import png_bytes, read_png, write_png
from raytracingengine_tpu.imageio.ppm import ppm_bytes, read_ppm, write_ppm

__all__ = [
    "load_obj",
    "png_bytes",
    "read_png",
    "write_png",
    "ppm_bytes",
    "read_ppm",
    "write_ppm",
]
