"""Pinhole camera + rectified stereo rig model.

TPU-native replacement for the reference's ``Sensors`` component
(``/root/reference/src/sensors.cpp:8-67``, ``include/lzb_vio/sensors.h:22-59``):
intrinsics ``K1_/K2_``, stereo extrinsics ``R_rl_/t_rl_``, the projection
matrices ``projMatr1_ = [K1|0]`` / ``projMatr2_ = [K2 R|K2 t]`` built in
``/root/reference/src/parameter.cpp:42-45``, and the six pixel/camera/world
coordinate transforms.

Cameras are registered pytrees so they flow through jit/vmap/shard_map.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import se3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Pinhole:
    """Intrinsics of one camera. Fields are scalar jnp arrays (jit-traceable)."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array

    @staticmethod
    def create(fx, fy, cx, cy, dtype=jnp.float32) -> "Pinhole":
        a = lambda v: jnp.asarray(v, dtype=dtype)
        return Pinhole(a(fx), a(fy), a(cx), a(cy))

    @property
    def K(self) -> jax.Array:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx]),
                jnp.stack([z, self.fy, self.cy]),
                jnp.stack([z, z, o]),
            ]
        )

    def project(self, pts_cam: jax.Array) -> jax.Array:
        """Camera-frame 3D points (..., 3) -> pixels (..., 2).

        Mirrors ``Sensors::camera2pixel`` (``sensors.cpp:38-44``).
        """
        z = pts_cam[..., 2]
        safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        u = self.fx * pts_cam[..., 0] / safe_z + self.cx
        v = self.fy * pts_cam[..., 1] / safe_z + self.cy
        return jnp.stack([u, v], axis=-1)

    def unproject(self, px: jax.Array, depth: jax.Array | float = 1.0) -> jax.Array:
        """Pixels (..., 2) + depth (...,) -> camera-frame points (..., 3).

        Mirrors ``Sensors::pixel2camera`` (``sensors.cpp:46-52``).
        """
        depth = jnp.asarray(depth, dtype=px.dtype)
        x = (px[..., 0] - self.cx) / self.fx * depth
        y = (px[..., 1] - self.cy) / self.fy * depth
        return jnp.stack([x, y, depth * jnp.ones_like(x)], axis=-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StereoRig:
    """Rectified stereo pair: left camera, right camera, left->right extrinsics.

    ``T_rl`` maps left-camera coordinates to right-camera coordinates
    (the reference's ``R_rl_/t_rl_``, ``sensors.cpp:14-25``). For KITTI,
    ``R = I`` and ``t = (-baseline, 0, 0)`` with baseline 0.537 m
    (``/root/reference/config/default.yaml:45``).
    """

    left: Pinhole
    right: Pinhole
    T_rl: jax.Array  # (4, 4)

    @staticmethod
    def create(left: Pinhole, right: Pinhole, R_rl=None, t_rl=None) -> "StereoRig":
        dtype = left.fx.dtype
        R = jnp.eye(3, dtype=dtype) if R_rl is None else jnp.asarray(R_rl, dtype=dtype)
        t = jnp.zeros(3, dtype=dtype) if t_rl is None else jnp.asarray(t_rl, dtype=dtype)
        return StereoRig(left, right, se3.from_Rt(R, t))

    @staticmethod
    def kitti(fx=718.856, fy=718.856, cx=607.1928, cy=185.2157, baseline=0.537,
              dtype=jnp.float32) -> "StereoRig":
        """The reference's KITTI operating point (``config/default.yaml:33-47``)."""
        cam = Pinhole.create(fx, fy, cx, cy, dtype=dtype)
        t = jnp.array([-baseline, 0.0, 0.0], dtype=dtype)
        return StereoRig(cam, cam, se3.from_Rt(jnp.eye(3, dtype=dtype), t))

    @property
    def baseline(self) -> jax.Array:
        return jnp.linalg.norm(self.T_rl[:3, 3])

    @property
    def P_left(self) -> jax.Array:
        """3x4 projection of the left camera: ``[K1 | 0]`` (``parameter.cpp:42-43``)."""
        K = self.left.K
        return jnp.concatenate([K, jnp.zeros((3, 1), dtype=K.dtype)], axis=1)

    @property
    def P_right(self) -> jax.Array:
        """3x4 projection of the right camera: ``[K2 R | K2 t]`` (``parameter.cpp:44-45``)."""
        K = self.right.K
        R, t = se3.to_Rt(self.T_rl)
        hi = jax.lax.Precision.HIGHEST
        return jnp.concatenate([jnp.matmul(K, R, precision=hi),
                                jnp.matmul(K, t, precision=hi)[:, None]],
                               axis=1)


def world2camera(T_cw: jax.Array, pts_w: jax.Array) -> jax.Array:
    """World points -> camera frame given camera-from-world pose (``sensors.cpp:27-31``)."""
    return se3.transform_points(T_cw, pts_w)


def camera2world(T_cw: jax.Array, pts_c: jax.Array) -> jax.Array:
    return se3.transform_points(se3.se3_inv(T_cw), pts_c)


def world2pixel(cam: Pinhole, T_cw: jax.Array, pts_w: jax.Array) -> jax.Array:
    """``Sensors::world2pixel`` (``sensors.cpp:60-67``)."""
    return cam.project(world2camera(T_cw, pts_w))


def pixel2world(cam: Pinhole, T_cw: jax.Array, px: jax.Array, depth) -> jax.Array:
    """``Sensors::pixel2world`` (``sensors.cpp:54-58``)."""
    return camera2world(T_cw, cam.unproject(px, depth))
