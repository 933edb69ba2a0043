"""Rasterizer + shader composition.

TPU-native equivalent of PyTorch3D's ``MeshRasterizer`` / ``MeshRenderer``
(`/root/reference/randomras/random_rasterizer.py:15-17`,
`/root/reference/experiments/eval.py:165-177`).  Both are immutable pytrees,
so a renderer — including its learnable sigma/gamma/alpha leaves — can be
passed straight through ``jax.jit`` / ``jax.grad`` as an argument.
"""

from __future__ import annotations

from typing import Any, Optional

from flax import struct

from pertrenderer_tpu.cameras import PerspectiveCameras
from pertrenderer_tpu.ops.rasterize import (
    Fragments,
    RasterizationSettings,
    rasterize_meshes,
    rasterize_planar,
)

__all__ = ["MeshRasterizer", "MeshRenderer"]


@struct.dataclass
class MeshRasterizer:
    """Projects vertices through the camera and rasterizes to Fragments."""

    cameras: Optional[PerspectiveCameras] = None
    raster_settings: RasterizationSettings = struct.field(
        pytree_node=False, default_factory=RasterizationSettings
    )

    @classmethod
    def create(cls, cameras=None, raster_settings=None):
        return cls(
            cameras=cameras,
            raster_settings=(raster_settings if raster_settings is not None
                             else RasterizationSettings()),
        )

    def __call__(self, meshes, cameras=None, **kwargs) -> Fragments:
        cameras = cameras if cameras is not None else self.cameras
        if cameras is None:
            raise ValueError("Cameras must be specified either at "
                             "initialization or in the forward pass")
        return rasterize_meshes(meshes, cameras, self.raster_settings)

    def planar(self, meshes, cameras=None):
        """Channel-major fragments — the hot path (no stacked bary array)."""
        cameras = cameras if cameras is not None else self.cameras
        if cameras is None:
            raise ValueError("Cameras must be specified either at "
                             "initialization or in the forward pass")
        return rasterize_planar(meshes, cameras, self.raster_settings)

    def update_blur(self, blur_radius: float) -> "MeshRasterizer":
        """Functional analog of mutating ``raster_settings.blur_radius``
        during annealing (`/root/reference/experiments/eval.py:390`)."""
        import dataclasses

        return self.replace(
            raster_settings=dataclasses.replace(
                self.raster_settings, blur_radius=float(blur_radius)
            )
        )


@struct.dataclass
class MeshRenderer:
    """renderer(meshes, key, cameras=..., lights=...) -> (N, H, W, 4) RGBA."""

    rasterizer: MeshRasterizer
    shader: Any

    @classmethod
    def create(cls, rasterizer, shader):
        return cls(rasterizer=rasterizer, shader=shader)

    def __call__(self, meshes, key=None, **kwargs):
        cameras = kwargs.get("cameras", self.rasterizer.cameras)
        # Shaders on the fused channel-major path take PlanarFragments
        # (RandomPhongShader / RandomSimpleShader); the baseline shaders use
        # the public PyTorch3D-layout Fragments.
        if getattr(type(self.shader), "planar_input", False):
            fragments = self.rasterizer.planar(meshes, cameras=cameras)
        else:
            fragments = self.rasterizer(meshes, cameras=cameras)
        return self.shader(fragments, meshes, key=key, **kwargs)
