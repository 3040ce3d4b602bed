from raytracingengine_tpu.core import vecmath
from raytracingengine_tpu.core.camera import Camera

__all__ = ["vecmath", "Camera"]
