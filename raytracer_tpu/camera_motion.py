"""Interactive-camera motion primitives — the WASD/mouse analog.

The reference's window loop moves the camera with ``Entity::translate`` (a
camera-relative move: ``p += rot(o, dp)``, entity.h:53-56) and composes look
rotations from mouse deltas (``o = dr * o`` with axis-angle quats around the
camera's current up/right axes, main.cc:169-179).  These helpers reproduce that
behavior as pure functions so fly-throughs / turntables render headlessly
(PNG/video dump replaces the SDL surface)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from . import raymath as rm
from .scene import Camera

MOVE_SPEED = 0.2  # main.cc:19
ROT_SPEED = 0.01  # main.cc:20


def camera_basis(cam: Camera):
    """(right, up, forward) unit vectors (camera quats are local->global;
    src/rayenv/camera.cu:12-30)."""
    m = rm.quat_to_mat(jnp.asarray(cam.rot))
    return (rm.normalize(m[:, 0]), rm.normalize(m[:, 1]), rm.normalize(m[:, 2]))


def translate(cam: Camera, dp) -> Camera:
    """Camera-relative translation (entity.h:53-56: ``p += rot(o, dp)``)."""
    dp = jnp.asarray(dp, jnp.float32)
    world = rm.quat_rotate(jnp.asarray(cam.rot), dp)
    return dataclasses.replace(cam, pos=jnp.asarray(cam.pos) + world)


def rotate(cam: Camera, dr_quat) -> Camera:
    """Compose a rotation delta: ``o = dr * o`` (entity.h:63-66)."""
    return dataclasses.replace(
        cam, rot=rm.quat_mul(jnp.asarray(dr_quat), jnp.asarray(cam.rot))
    )


def mouse_look(cam: Camera, dx: float, dy: float) -> Camera:
    """Mouse-motion rotation exactly as the reference window loop composes it
    (main.cc:171-177): normalized motion, yaw about the camera's up axis and
    pitch about its right axis, each scaled by ROT_SPEED."""
    rel = jnp.asarray([dx, dy], jnp.float32)
    rel = rm.normalize(rel)
    right, up, _ = camera_basis(cam)
    yaw = rm.quat_from_axis_angle(up, ROT_SPEED * rel[0])
    pitch = rm.quat_from_axis_angle(right, ROT_SPEED * rel[1])
    return rotate(cam, rm.quat_mul(yaw, pitch))


def key_move(cam: Camera, key: str, speed: float = MOVE_SPEED) -> Camera:
    """WASD moves (main.cc:146-161): w/s along +/-z, a/d along -/+x."""
    deltas = {
        "w": (0.0, 0.0, speed),
        "s": (0.0, 0.0, -speed),
        "a": (-speed, 0.0, 0.0),
        "d": (speed, 0.0, 0.0),
    }
    return translate(cam, deltas[key])


def orbit_frames(cam: Camera, n_frames: int, degrees_per_frame: float = 2.0):
    """Yield cameras for a turntable orbit (fly-through demo / video dump)."""
    import math

    cur = cam
    for _ in range(n_frames):
        dr = rm.quat_from_axis_angle(
            jnp.asarray([0.0, 1.0, 0.0]),
            jnp.float32(math.radians(degrees_per_frame)),
        )
        cur = rotate(cur, dr)
        yield cur
