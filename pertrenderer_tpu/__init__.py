"""pertrenderer_tpu — TPU-native differentiable rendering with perturbed optimizers.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
quentinll/pertrenderer (NeurIPS 2021, "Differentiable rendering with perturbed
optimizers") together with the PyTorch3D rendering surface it consumes:
mesh rasterization, Phong shading, texturing, cameras/lights/transforms,
Monte-Carlo perturbed Heaviside / argmax estimators with variance-reduced
custom VJPs, and a fully-jitted pose/scene optimization harness.

Public API mirrors `/root/reference/randomras/__init__.py` and the PyTorch3D
names the reference imports, so reference user code ports directly.
"""

from pertrenderer_tpu.blending import (
    BlendParams,
    hard_rgb_blend,
    smooth_rgb_blend,
    softmax_rgb_blend,
)
from pertrenderer_tpu.cameras import (
    OpenGLPerspectiveCameras,
    PerspectiveCameras,
    look_at_rotation,
    look_at_view_transform,
)
from pertrenderer_tpu.io import (
    load_cube,
    load_obj,
    load_objs_as_meshes,
    make_cow,
    make_icosphere,
    save_obj,
)
from pertrenderer_tpu.lights import DirectionalLights, Materials, PointLights
from pertrenderer_tpu.losses import (
    chamfer_distance,
    knn_points,
    mesh_edge_loss,
    mesh_laplacian_smoothing,
    mesh_normal_consistency,
)
from pertrenderer_tpu.models.renderer import MeshRasterizer, MeshRenderer
from pertrenderer_tpu.models.shaders import (
    HardPhongShader,
    RandomPhongShader,
    RandomSimpleShader,
    SimpleShader,
    SoftPhongShader,
    SoftSilhouetteShader,
    SoftSimpleShader,
)
from pertrenderer_tpu.models.smoothagg import (
    CauchyAgg,
    GaussianAgg,
    GaussianAgg_wovr,
    HardAgg,
    SoftAgg,
    UniformAgg,
)
from pertrenderer_tpu.models.smoothrast import (
    AffineRast,
    ArctanRast,
    GaussianRast,
    GaussianRast_wovr,
    HardRast,
    SoftRast,
)
from pertrenderer_tpu.ops.perturbed import (
    log_corrected,
    perturbed_argmax,
    perturbed_heaviside,
    prod_corrected,
)
from pertrenderer_tpu.ops.fused_render import RenderPlan, render_plan
from pertrenderer_tpu.ops.gather import take_rows, take_rows_cm
from pertrenderer_tpu.ops.interp_gather import interp_rows_cm
from pertrenderer_tpu.ops.rasterize import (
    Fragments,
    PlanarFragments,
    RasterizationSettings,
    as_planar,
    rasterize_meshes,
    rasterize_planar,
)
from pertrenderer_tpu.shading import phong_shading
from pertrenderer_tpu.structures import Meshes, join_meshes_as_batch
from pertrenderer_tpu.textures import (
    Textures,
    TexturesAtlas,
    TexturesUV,
    TexturesVertex,
    interpolate_face_attributes,
)
from pertrenderer_tpu.transforms import (
    Rotate,
    random_rotations,
    so3_exp_map,
    so3_exponential_map,
    so3_log_map,
    so3_relative_angle,
)

__version__ = "0.1.0"
