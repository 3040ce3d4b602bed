"""raytracingengine_tpu — a TPU-native differentiable Whitted ray tracer.

A from-scratch JAX/Pallas re-design of the capabilities of the reference
C++20 engine (Sorax5/RaytracingEngine): pinhole camera, analytic
sphere/plane/triangle intersection with closest-hit selection, point-light
shading with transmittance shadow marching, Whitted-style recursive
reflection/refraction (re-expressed as a masked wavefront), the 7-operator
tonemap family, PPM/PNG/OBJ I/O — all differentiable end-to-end and sharded
over TPU device meshes.

Design stance (vs the reference's per-pixel recursive C++):
  * rays are the batch axis; every intersection test is an all-pairs
    [rays, primitives] computation decomposed into [R,3]x[3,N] matmuls
    that map onto the TPU MXU (see geometry/intersect.py),
  * recursion becomes a bounded masked wavefront (render/integrator.py),
  * parallelism is a jax.sharding.Mesh with rays sharded and the scene
    replicated (or primitive-sharded for huge scenes) — parallel/,
  * the hot path is fused by XLA and by Pallas tile kernels — kernels/.
"""

__version__ = "0.1.0"

from raytracingengine_tpu.core.camera import Camera
from raytracingengine_tpu.scene import Scene
from raytracingengine_tpu.render.config import RenderConfig

__all__ = ["Camera", "Scene", "RenderConfig", "__version__"]
