"""Rasterizer + shader composition.

TPU-native equivalent of PyTorch3D's ``MeshRasterizer`` / ``MeshRenderer``
(`/root/reference/randomras/random_rasterizer.py:15-17`,
`/root/reference/experiments/eval.py:165-177`).  Both are immutable pytrees,
so a renderer — including its learnable sigma/gamma/alpha leaves — can be
passed straight through ``jax.jit`` / ``jax.grad`` as an argument.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
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
    """Projects vertices through the camera and rasterizes to Fragments.

    ``blur_override`` is a *traced* pytree leaf: annealing updates the blur
    radius through it (``update_blur``) without changing the static
    ``raster_settings``, so one compiled program serves every blur value
    (the radius only enters data comparisons, never shapes).
    """

    cameras: Optional[PerspectiveCameras] = None
    raster_settings: RasterizationSettings = struct.field(
        pytree_node=False, default_factory=RasterizationSettings
    )
    blur_override: Optional[Any] = None

    @classmethod
    def create(cls, cameras=None, raster_settings=None):
        return cls(
            cameras=cameras,
            raster_settings=(raster_settings if raster_settings is not None
                             else RasterizationSettings()),
        )

    @property
    def blur(self):
        """The effective blur radius (traced override, else the static
        settings value)."""
        if self.blur_override is not None:
            return self.blur_override
        return self.raster_settings.blur_radius

    def __call__(self, meshes, cameras=None, **kwargs) -> Fragments:
        cameras = cameras if cameras is not None else self.cameras
        if cameras is None:
            raise ValueError("Cameras must be specified either at "
                             "initialization or in the forward pass")
        return rasterize_meshes(meshes, cameras, self.raster_settings,
                                blur_radius=self.blur_override)

    def planar(self, meshes, cameras=None):
        """Channel-major fragments — the hot path (no stacked bary array)."""
        cameras = cameras if cameras is not None else self.cameras
        if cameras is None:
            raise ValueError("Cameras must be specified either at "
                             "initialization or in the forward pass")
        return rasterize_planar(meshes, cameras, self.raster_settings,
                                blur_radius=self.blur_override)

    def update_blur(self, blur_radius) -> "MeshRasterizer":
        """Functional analog of mutating ``raster_settings.blur_radius``
        during annealing (`/root/reference/experiments/eval.py:390`).
        Sets the traced override — no retrace/recompile on blur changes."""
        import jax.numpy as jnp

        return self.replace(blur_override=jnp.asarray(blur_radius,
                                                      jnp.float32))


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
        # Perturbed shaders on eligible scenes run the monolithic fused
        # Pallas kernel (ops/fused_render.py): rasterize -> shade -> blend
        # resident in VMEM, replacing the staged XLA pipeline below.
        fused = self._try_fused(meshes, cameras, key, kwargs)
        if fused is not None:
            return fused
        # Shaders on the fused channel-major path take PlanarFragments
        # (RandomPhongShader / RandomSimpleShader); the baseline shaders use
        # the public PyTorch3D-layout Fragments.
        if getattr(type(self.shader), "planar_input", False):
            fragments = self.rasterizer.planar(meshes, cameras=cameras)
        else:
            fragments = self.rasterizer(meshes, cameras=cameras)
        return self.shader(fragments, meshes, key=key, **kwargs)

    _FUSED_SHADE = {"RandomPhongShader": "phong",
                    "RandomSimpleShader": "none"}

    def _fused_args(self, cameras, kwargs):
        shader = self.shader
        shade = self._FUSED_SHADE.get(type(shader).__name__)
        if shade is None or cameras is None:
            return None
        if "znear" in kwargs or "zfar" in kwargs:
            return None
        # The staged path rasterizes through `cameras` but shades through the
        # shader's own camera resolution; only fuse when they coincide.
        if kwargs.get("cameras", shader.cameras) is not cameras:
            return None
        return (cameras,
                kwargs.get("lights", shader.lights),
                kwargs.get("materials", shader.materials),
                shader.smoothrast, shader.smoothagg,
                kwargs.get("blend_params", shader.blend_params),
                self.rasterizer.raster_settings), shade

    def _try_fused(self, meshes, cameras, key, kwargs):
        args = self._fused_args(cameras, kwargs)
        if args is None:
            return None
        from pertrenderer_tpu.ops import fused_render

        (cameras, lights, materials, sr, sa, blend, settings), shade = args
        return fused_render.try_render(
            meshes, cameras, lights, materials, sr, sa, blend, settings,
            key, shade, blur_override=self.rasterizer.blur_override)

    def plan(self, meshes, cameras=None, assume_available=True, **kwargs):
        """Routing report: which execution mode (flat / stream / binned /
        staged) this renderer takes for ``meshes``, and why.  Static
        inspection only — nothing is compiled or run.  See
        ``pertrenderer_tpu.render_plan``."""
        from pertrenderer_tpu.ops import fused_render

        cameras = cameras if cameras is not None else \
            kwargs.get("cameras", self.rasterizer.cameras)
        args = self._fused_args(cameras, kwargs)
        if args is None:
            return fused_render.RenderPlan(
                mode="staged",
                reason="shader %s (or camera resolution) is not "
                       "fused-eligible" % type(self.shader).__name__,
                f=int(meshes.max_faces),
                k=int(self.rasterizer.raster_settings.faces_per_pixel),
                image_size=self.rasterizer.raster_settings.image_size)
        (cameras, lights, materials, sr, sa, _blend, settings), shade = args
        return fused_render.render_plan(
            meshes, cameras, lights, materials, sr, sa, settings, shade,
            assume_available=assume_available)

    def render_loss(self, meshes, target, key=None, loss_kind="l2_rgb",
                    **kwargs):
        """Mean image loss vs ``target`` (N, H, W, 3) over the RGB channels:
        ``l2_rgb`` = mean squared error (the pose loop's loss,
        `/root/reference/experiments/eval.py:354`), ``l1_rgb`` = mean
        absolute error (the scene-parameter loop's, `eval.py:454`).

        On eligible fused configurations, loss AND every gradient come from
        a single kernel pass (the image-loss cotangent is derived in-kernel
        from the target), so ``jax.value_and_grad`` of this costs one
        launch.  Otherwise renders and reduces like the reference.

        The target is a CONSTANT (stop-gradient) on every path — its role
        in the experiments (`eval.py:354,454`) — so gradients w.r.t. it are
        zero by definition, identically on the fused and fallback paths.
        """
        import jax

        if loss_kind not in ("l2_rgb", "l1_rgb"):
            raise ValueError(f"unknown loss_kind {loss_kind!r} "
                             "(expected 'l2_rgb' or 'l1_rgb')")
        target = jax.lax.stop_gradient(target)
        cameras = kwargs.get("cameras", self.rasterizer.cameras)
        args = self._fused_args(cameras, kwargs)
        if args is not None:
            from pertrenderer_tpu.ops import fused_render

            (cameras, lights, materials, sr, sa, blend, settings), shade = \
                args
            out = fused_render.try_render_loss(
                meshes, cameras, lights, materials, sr, sa, blend, settings,
                key, shade, target, loss_kind,
                blur_override=self.rasterizer.blur_override)
            if out is not None:
                return out
        images = self(meshes, key=key, **kwargs)
        diff = images[..., :3] - target
        if loss_kind == "l1_rgb":
            return jnp.mean(jnp.abs(diff))
        return jnp.mean(diff ** 2)
