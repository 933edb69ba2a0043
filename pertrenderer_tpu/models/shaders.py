"""Shader modules: perturbed, hard, and soft shading heads.

Functional pytree re-design of the reference shader layer
(`/root/reference/randomras/random_rasterizer.py:60-214`) plus the PyTorch3D
baseline shaders the experiments consume (``HardPhongShader`` for targets at
`/root/reference/experiments/eval.py:279-282`, ``SoftPhongShader``,
``SoftSilhouetteShader``).

Shaders are immutable flax.struct dataclasses; calling one maps
(fragments, meshes, key, overrides...) -> (N, H, W, 4) RGBA images.  The
PyTorch ``update_smoothing`` / ``update_nb_samples`` mutators return new
instances.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from pertrenderer_tpu.blending import (
    BlendParams,
    hard_rgb_blend,
    smooth_rgb_blend,
    smooth_rgb_blend_cm,
    softmax_rgb_blend,
)
from pertrenderer_tpu.cameras import PerspectiveCameras, look_at_view_transform
from pertrenderer_tpu.lights import Materials, PointLights
from pertrenderer_tpu.models.smoothagg import SoftAgg
from pertrenderer_tpu.models.smoothrast import SoftRast
from pertrenderer_tpu.ops.rasterize import as_planar
from pertrenderer_tpu.shading import phong_shading, phong_shading_cm

__all__ = [
    "RandomPhongShader", "RandomSimpleShader", "SimpleShader",
    "SoftSimpleShader", "HardPhongShader", "SoftPhongShader",
    "SoftSilhouetteShader",
]


def _znear_zfar(cameras, kwargs):
    znear = kwargs.get("znear", cameras.znear)[:, None, None, None]
    zfar = kwargs.get("zfar", cameras.zfar)[:, None, None, None]
    return znear, zfar


@struct.dataclass
class RandomPhongShader:
    """Phong shading + perturbed blending
    (`/root/reference/randomras/random_rasterizer.py:60-130`)."""

    planar_input = True  # MeshRenderer feeds PlanarFragments (hot path)

    cameras: Optional[PerspectiveCameras] = None
    lights: Optional[PointLights] = None
    materials: Optional[Materials] = None
    smoothrast: Any = None
    smoothagg: Any = None
    blend_params: Optional[BlendParams] = None

    @classmethod
    def create(cls, cameras=None, lights=None, materials=None,
               smoothrast=None, smoothagg=None, blend_params=None):
        return cls(
            cameras=cameras,
            lights=lights if lights is not None else PointLights.create(),
            materials=materials if materials is not None else Materials.create(),
            smoothrast=smoothrast if smoothrast is not None else SoftRast.create(),
            smoothagg=smoothagg if smoothagg is not None else SoftAgg.create(),
            blend_params=blend_params if blend_params is not None else BlendParams(),
        )

    def __call__(self, fragments, meshes, key=None, **kwargs) -> jnp.ndarray:
        """Channel-major fused path: sample -> phong -> perturbed blend.

        Accepts PlanarFragments (hot path, from MeshRenderer) or public
        Fragments (unstacked on the fly)."""
        cameras = kwargs.get("cameras", self.cameras)
        if cameras is None:
            raise ValueError("Cameras must be specified either at "
                             "initialization or in the forward pass")
        pfrag = as_planar(fragments)
        texels_cm = meshes.sample_textures_cm(pfrag)
        lights = kwargs.get("lights", self.lights)
        materials = kwargs.get("materials", self.materials)
        blend_params = kwargs.get("blend_params", self.blend_params)
        colors_cm = phong_shading_cm(meshes, pfrag, texels_cm, lights,
                                     cameras, materials)
        znear, zfar = _znear_zfar(cameras, kwargs)
        return smooth_rgb_blend_cm(colors_cm, pfrag, self.smoothrast,
                                   self.smoothagg, blend_params, znear=znear,
                                   zfar=zfar, key=key)

    def get_smoothing(self):
        return self.smoothrast.sigma, self.smoothagg.gamma, self.smoothagg.alpha

    def get_nb_samples(self):
        return self.smoothagg.nb_samples

    def update_smoothing(self, sigma=4e-4, gamma=4e-2, alpha=1.0):
        return self.replace(
            smoothrast=self.smoothrast.update_smoothing(sigma),
            smoothagg=self.smoothagg.update_smoothing(gamma, alpha),
        )

    def update_nb_samples(self, nb_samples=16):
        return self.replace(
            smoothrast=self.smoothrast.update_nb_samples(nb_samples),
            smoothagg=self.smoothagg.update_nb_samples(nb_samples),
        )


@struct.dataclass
class RandomSimpleShader:
    """Texels straight to perturbed blending — no lighting
    (`/root/reference/randomras/random_rasterizer.py:132-191`)."""

    planar_input = True  # MeshRenderer feeds PlanarFragments (hot path)

    cameras: Optional[PerspectiveCameras] = None
    lights: Optional[PointLights] = None
    materials: Optional[Materials] = None
    smoothrast: Any = None
    smoothagg: Any = None
    blend_params: Optional[BlendParams] = None

    @classmethod
    def create(cls, cameras=None, lights=None, materials=None,
               smoothrast=None, smoothagg=None, blend_params=None):
        if cameras is None:
            # Reference default camera: look_at(dist=2.7)
            # (random_rasterizer.py:152-153).
            r, t = look_at_view_transform(dist=2.7, elev=0.0, azim=0.0)
            cameras = PerspectiveCameras.create(R=r, T=t)
        return cls(
            cameras=cameras,
            lights=lights if lights is not None else PointLights.create(),
            materials=materials if materials is not None else Materials.create(),
            smoothrast=smoothrast if smoothrast is not None else SoftRast.create(),
            smoothagg=smoothagg if smoothagg is not None else SoftAgg.create(),
            blend_params=blend_params if blend_params is not None else BlendParams(),
        )

    def __call__(self, fragments, meshes, key=None, **kwargs) -> jnp.ndarray:
        cameras = kwargs.get("cameras", self.cameras)
        if cameras is None:
            raise ValueError("Cameras must be specified either at "
                             "initialization or in the forward pass")
        pfrag = as_planar(fragments)
        texels_cm = meshes.sample_textures_cm(pfrag)
        blend_params = kwargs.get("blend_params", self.blend_params)
        znear, zfar = _znear_zfar(cameras, kwargs)
        return smooth_rgb_blend_cm(texels_cm, pfrag, self.smoothrast,
                                   self.smoothagg, blend_params, znear=znear,
                                   zfar=zfar, key=key)

    def get_smoothing(self):
        return self.smoothrast.sigma, self.smoothagg.gamma, self.smoothagg.alpha

    def get_nb_samples(self):
        return self.smoothagg.nb_samples

    def update_smoothing(self, sigma=4e-4, gamma=4e-2, alpha=1.0):
        return self.replace(
            smoothrast=self.smoothrast.update_smoothing(sigma),
            smoothagg=self.smoothagg.update_smoothing(gamma, alpha),
        )

    def update_nb_samples(self, nb_samples=16):
        return self.replace(
            smoothrast=self.smoothrast.update_nb_samples(nb_samples),
            smoothagg=self.smoothagg.update_nb_samples(nb_samples),
        )


@struct.dataclass
class SimpleShader:
    """Hard texel blending (`random_rasterizer.py:194-203`)."""

    blend_params: Optional[BlendParams] = None

    @classmethod
    def create(cls, blend_params=None):
        return cls(blend_params=blend_params if blend_params is not None
                   else BlendParams())

    def __call__(self, fragments, meshes, key=None, **kwargs) -> jnp.ndarray:
        del key
        blend_params = kwargs.get("blend_params", self.blend_params)
        texels = meshes.sample_textures(fragments)
        return hard_rgb_blend(texels, fragments, blend_params)


@struct.dataclass
class SoftSimpleShader:
    """Softmax texel blending (`random_rasterizer.py:205-214`)."""

    blend_params: Optional[BlendParams] = None

    @classmethod
    def create(cls, blend_params=None):
        return cls(blend_params=blend_params if blend_params is not None
                   else BlendParams())

    def __call__(self, fragments, meshes, key=None, **kwargs) -> jnp.ndarray:
        del key
        blend_params = kwargs.get("blend_params", self.blend_params)
        texels = meshes.sample_textures(fragments)
        cameras = kwargs.get("cameras")
        znear, zfar = (1.0, 100.0)
        if cameras is not None:
            znear, zfar = _znear_zfar(cameras, kwargs)
        return softmax_rgb_blend(texels, fragments, blend_params, znear, zfar)


@struct.dataclass
class HardPhongShader:
    """Phong shading + hard blending — the reference's target renderer
    (`/root/reference/experiments/eval.py:279-282`)."""

    cameras: Optional[PerspectiveCameras] = None
    lights: Optional[PointLights] = None
    materials: Optional[Materials] = None
    blend_params: Optional[BlendParams] = None

    @classmethod
    def create(cls, cameras=None, lights=None, materials=None,
               blend_params=None):
        return cls(
            cameras=cameras,
            lights=lights if lights is not None else PointLights.create(),
            materials=materials if materials is not None else Materials.create(),
            blend_params=blend_params if blend_params is not None else BlendParams(),
        )

    def __call__(self, fragments, meshes, key=None, **kwargs) -> jnp.ndarray:
        del key
        cameras = kwargs.get("cameras", self.cameras)
        if cameras is None:
            raise ValueError("Cameras must be specified")
        texels = meshes.sample_textures(fragments)
        lights = kwargs.get("lights", self.lights)
        materials = kwargs.get("materials", self.materials)
        blend_params = kwargs.get("blend_params", self.blend_params)
        colors = phong_shading(meshes, fragments, texels, lights, cameras,
                               materials)
        return hard_rgb_blend(colors, fragments, blend_params)


@struct.dataclass
class SoftPhongShader:
    """Phong shading + softmax blending (PyTorch3D baseline import at
    `/root/reference/randomras/random_rasterizer.py:18`)."""

    cameras: Optional[PerspectiveCameras] = None
    lights: Optional[PointLights] = None
    materials: Optional[Materials] = None
    blend_params: Optional[BlendParams] = None

    @classmethod
    def create(cls, cameras=None, lights=None, materials=None,
               blend_params=None):
        return cls(
            cameras=cameras,
            lights=lights if lights is not None else PointLights.create(),
            materials=materials if materials is not None else Materials.create(),
            blend_params=blend_params if blend_params is not None else BlendParams(),
        )

    def __call__(self, fragments, meshes, key=None, **kwargs) -> jnp.ndarray:
        del key
        cameras = kwargs.get("cameras", self.cameras)
        if cameras is None:
            raise ValueError("Cameras must be specified")
        texels = meshes.sample_textures(fragments)
        lights = kwargs.get("lights", self.lights)
        materials = kwargs.get("materials", self.materials)
        blend_params = kwargs.get("blend_params", self.blend_params)
        colors = phong_shading(meshes, fragments, texels, lights, cameras,
                               materials)
        znear, zfar = _znear_zfar(cameras, kwargs)
        return softmax_rgb_blend(colors, fragments, blend_params, znear, zfar)


@struct.dataclass
class SoftSilhouetteShader:
    """Silhouette-only shading: RGB = 1, alpha = sigmoid coverage blend
    (PyTorch3D baseline)."""

    blend_params: Optional[BlendParams] = None

    @classmethod
    def create(cls, blend_params=None):
        return cls(blend_params=blend_params if blend_params is not None
                   else BlendParams())

    def __call__(self, fragments, meshes, key=None, **kwargs) -> jnp.ndarray:
        del key
        blend_params = kwargs.get("blend_params", self.blend_params)
        mask = fragments.pix_to_face >= 0
        prob = jnp.where(
            mask, jax.nn.sigmoid(-fragments.dists / blend_params.sigma), 0.0
        )
        alpha = 1.0 - jnp.prod(1.0 - prob, axis=-1, keepdims=True)
        rgb = jnp.ones(alpha.shape[:-1] + (3,), alpha.dtype)
        return jnp.concatenate([rgb, alpha], axis=-1)
