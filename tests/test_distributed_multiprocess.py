"""Real multi-process jax.distributed bootstrap (2 CPU processes).

The single-process tests only exercise ``distributed.initialize()`` as a
no-op; this spawns two actual processes against a local coordinator, builds
the (slice, data, samples) hybrid mesh across both, and runs one sharded
pose-training step — the full multi-host code path minus the TPU fabric.
"""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")

from pertrenderer_tpu.parallel import distributed, sharding

coord, rank = sys.argv[1], int(sys.argv[2])
ok = distributed.initialize(coordinator_address=coord, num_processes=2,
                            process_id=rank)
assert ok, "initialize() returned False"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()   # 2 local x 2 processes

mesh = distributed.build_multislice_mesh(num_slices=2, samples_parallel=1)
assert dict(mesh.shape) == {"slice": 2, "data": 2, "samples": 1}, mesh.shape

import numpy as np
import jax.numpy as jnp
import optax
import pertrenderer_tpu as pt
from pertrenderer_tpu.transforms import Rotate

scene_mesh = pt.load_cube().scale_verts(2.0)
r, t = pt.look_at_view_transform(dist=6.7, elev=30.0, azim=120.0)
cameras = pt.PerspectiveCameras.create(R=r, T=t, fov=60.0)
lights = pt.PointLights.create(location=(0.0, 2.0, -2.0))
sigma, gamma = 1e-3, 1e-2
settings = pt.RasterizationSettings(image_size=8, faces_per_pixel=4,
                                    blur_radius=9e-3)
renderer = pt.MeshRenderer.create(
    rasterizer=pt.MeshRasterizer.create(cameras=cameras,
                                        raster_settings=settings),
    shader=pt.RandomPhongShader.create(
        cameras=cameras, lights=lights,
        blend_params=pt.BlendParams(sigma=sigma, gamma=gamma,
                                    background_color=(0.0, 0.0, 0.0)),
        smoothrast=pt.GaussianRast.create(
            sigma=sigma, nb_samples=1, sample_axis=sharding.SAMPLE_AXIS),
        smoothagg=pt.GaussianAgg.create(
            gamma=gamma, nb_samples=1, sample_axis=sharding.SAMPLE_AXIS)))

batch = 4                                        # slice x data
key = jax.random.PRNGKey(0)
targets = jnp.zeros((batch, 8, 8, 3))
log_rot = 0.1 * jax.random.normal(key, (batch, 3))
keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(batch))
opt = optax.adam(3e-2)
opt_state = opt.init(log_rot)
axes = (distributed.SLICE_AXIS, sharding.DATA_AXIS)
step = sharding.make_sharded_pose_step(
    mesh, scene_mesh, cameras, lights, opt, opt_state, smoothing_lr=1e-4,
    data_axes=axes)

from jax.sharding import NamedSharding, PartitionSpec as P
bs = NamedSharding(mesh, P(axes))
log_rot = jax.device_put(log_rot, bs)
targets = jax.device_put(targets, bs)
keys = jax.device_put(keys, bs)
opt_state = jax.tree.map(
    lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
    opt_state, sharding._data_specs(opt_state, axes))
log_rot, opt_state, losses, renderer = step(log_rot, opt_state, targets,
                                            keys, renderer)
local = np.asarray(
    jax.block_until_ready(losses).addressable_shards[0].data)
assert np.isfinite(local).all(), local
print(f"rank {rank} ok local_losses={local.ravel().tolist()}")
"""


@pytest.mark.skipif(os.environ.get("PERTRENDERER_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_coordinator_bootstrap(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    paths = [repo, env.get("PYTHONPATH", "")]
    if os.path.isdir("/root/.axon_site"):
        paths.append("/root/.axon_site")
    env["PYTHONPATH"] = os.pathsep.join(p for p in paths if p)

    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    procs = [
        subprocess.Popen([sys.executable, str(script), coord, str(rank)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process bootstrap timed out")
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert f"rank {rank} ok" in out, out[-2000:]
