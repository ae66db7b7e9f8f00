"""Distribution layer: device meshes, ray/tile sharding, and multi-host setup.

The reference is single-GPU with no distribution (SURVEY.md §2.3); this module is
the designed-fresh TPU equivalent.  The parallel decomposition follows the
renderer's natural axes:

* **rays/tiles (data parallel)** — the image's ray array is sharded over all
  chips via ``NamedSharding``; rendering is embarrassingly parallel over rays, so
  XLA inserts no communication in the forward pass.
* **scene (replicated)** — geometry/BVH/materials are small (≤ a few MB for the
  fixture worlds) and fully replicated; partitioning geometry with ray all-to-all
  is the documented scale-out path if scenes outgrow HBM (SURVEY.md §5).
* **gradients (psum)** — parameter gradients from sharded ray batches are
  all-reduced over the mesh (see diff.render_loss_and_grad / dryrun_multichip).

Multi-host: call ``initialize_distributed()`` once per process (standard
``jax.distributed.initialize``), then ``make_mesh()`` builds a global mesh over
all devices; ICI within a slice and DCN across hosts are handled by the runtime.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (no-op on a single process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(devices: Optional[Sequence] = None, axis: str = RAY_AXIS) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def ray_sharded(mesh: Mesh):
    return NamedSharding(mesh, P(RAY_AXIS))


def shard_scene(scene, mesh: Mesh):
    """Replicate the scene pytree on every device of the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(jnp.asarray(x), sharding), scene)


def pad_to_multiple(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def make_sharded_render(scene, camera, cfg, mesh: Mesh):
    """Return a jitted render over the mesh: rows of the image are sharded across
    chips, the scene is replicated, and the output image is row-sharded.

    The height need not divide the mesh size: the RAY GRID is padded with
    dummy rows up to the next multiple (the camera mapping itself is computed
    at the true height, so framing is unchanged) and the padded rows are
    cropped off the result."""
    from .render.engine import make_cast, render_rays
    from .render.geometry import camera_rays, expand_geometry

    n_dev = mesh.devices.size
    hp = pad_to_multiple(cfg.height, n_dev)
    scene_r = shard_scene(scene, mesh)
    camera_r = jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), replicated(mesh)), camera
    )

    out_sharding = NamedSharding(mesh, P(RAY_AXIS, None, None))

    @partial(jax.jit, static_argnames=("cfg_",), out_shardings=out_sharding)
    def run(scene_, camera_, cfg_):
        geom = expand_geometry(scene_)
        cast = make_cast(scene_, geom, cfg_)
        ro, rd = camera_rays(camera_, cfg_.width, cfg_.height)
        pad = hp - cfg_.height
        ro = jnp.pad(ro, ((0, pad), (0, 0), (0, 0)))
        rd = jnp.pad(rd, ((0, pad), (0, 0), (0, 0)), constant_values=0.0)
        if pad:
            mask = jnp.arange(hp) >= cfg_.height
            rd = jnp.where(mask[:, None, None],
                           jnp.array([0.0, 0.0, 1.0]), rd)
        return render_rays(scene_, geom, cast, cfg_, ro, rd)

    return lambda: run(scene_r, camera_r, cfg)[: cfg.height]
