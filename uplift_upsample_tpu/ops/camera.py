"""Device-side (JAX) camera ops: world→camera transform and 2D projection.

TPU-native replacement for the reference's tf.data map stage
(`uplifiting_dataset.py:661-761`): instead of per-element host-side maps, the
whole batch is transformed in one jitted call on device, fused by XLA into the
training step's input processing.

Camera encoding (AMASS path): 18-vector = quaternion (4, wxyz) | translation
(3) | intrinsics (11: res_w, res_h, fx, fy, cx, cy, k1, k2, k3, p1, p2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def qrot(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4), broadcasting."""
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def qinverse(q: jax.Array) -> jax.Array:
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def world_to_camera(x: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """x: (..., 3) world points; R: (4,) or batched (..., 4); t matching (..., 3)."""
    rt = qinverse(R)
    while rt.ndim < x.ndim:
        rt = rt[..., None, :]
        t = t[..., None, :]
    return qrot(jnp.broadcast_to(rt, x.shape[:-1] + (4,)), x - t)


def project_to_2d(x: jax.Array, intrinsics: jax.Array) -> jax.Array:
    """H36M distorted projection of camera-space points x (..., 3).

    `intrinsics` is the 11-vector (possibly batched on leading dims); the
    normalized image point is clamped to [-1, 1] before distortion.
    """
    while intrinsics.ndim < x.ndim:
        intrinsics = intrinsics[..., None, :]
    f, c = intrinsics[..., 2:4], intrinsics[..., 4:6]
    k, p = intrinsics[..., 6:9], intrinsics[..., 9:11]

    xx = jnp.clip(x[..., :2] / x[..., 2:], -1.0, 1.0)
    r2 = jnp.sum(xx ** 2, axis=-1, keepdims=True)
    radial = 1.0 + jnp.sum(k * jnp.concatenate([r2, r2 ** 2, r2 ** 3], axis=-1),
                           axis=-1, keepdims=True)
    tan = jnp.sum(p * xx, axis=-1, keepdims=True)
    xxx = xx * (radial + tan) + p * r2
    return f * xxx + c


def project_to_2d_linear(x: jax.Array, intrinsics: jax.Array) -> jax.Array:
    while intrinsics.ndim < x.ndim:
        intrinsics = intrinsics[..., None, :]
    f, c = intrinsics[..., 2:4], intrinsics[..., 4:6]
    xx = jnp.clip(x[..., :2] / x[..., 2:], -1.0, 1.0)
    return f * xx + c


def world_to_cam_and_2d(sequence_3d: jax.Array, cam18: jax.Array):
    """Batched AMASS input transform.

    sequence_3d: (B, N, K, 3) world-space poses; cam18: (B, 18).
    Returns (camera-space 3D (B, N, K, 3), projected 2D (B, N, K, 2)).
    """
    quat, trans = cam18[..., :4], cam18[..., 4:7]
    intrinsics = cam18[..., 7:18]
    # Broadcast camera over (N, K)
    cam3d = world_to_camera(sequence_3d, quat[:, None, :], trans[:, None, :])
    pose2d = project_to_2d(cam3d, intrinsics[:, None, None, :])
    return cam3d, pose2d
