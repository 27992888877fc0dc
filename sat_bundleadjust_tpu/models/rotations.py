"""3-D rotation representations, batched in JAX.

Covers the conversions of the reference's bundle_adjust/ba_rotate.py:12-123
(Euler <-> quaternion <-> matrix <-> axis-angle) plus the two batched point
rotation kernels of ba_core (rotate_euler at ba_core.py:36-56, used inside
every residual evaluation, and rotate_rodrigues at ba_core.py:17-33).

Euler convention: R = Rz(yaw) @ Ry(pitch) @ Rx(roll) — extrinsic x-y-z,
identical to the reference.
"""

import jax.numpy as jnp


def rotate_euler(pts, euler_angles):
    """Rotate points by per-point Euler angles.

    pts: (..., 3), euler_angles: (..., 3) as (roll=x, pitch=y, yaw=z).
    Applies Rx then Ry then Rz, elementwise over the batch — this is the
    innermost op of the BA residual (reference: ba_core.py:36-56).
    """
    cx, sx = jnp.cos(euler_angles[..., 0]), jnp.sin(euler_angles[..., 0])
    cy, sy = jnp.cos(euler_angles[..., 1]), jnp.sin(euler_angles[..., 1])
    cz, sz = jnp.cos(euler_angles[..., 2]), jnp.sin(euler_angles[..., 2])
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    # rotate about x
    y, z = cx * y - sx * z, sx * y + cx * z
    # rotate about y
    x, z = cy * x + sy * z, -sy * x + cy * z
    # rotate about z
    x, y = cz * x - sz * y, sz * x + cz * y
    return jnp.stack([x, y, z], axis=-1)


def rotate_rodrigues(pts, axis_angle):
    """Rotate points by per-point axis-angle vectors (Rodrigues formula).

    Reference: ba_core.py:17-33."""
    theta = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    safe_theta = jnp.where(theta == 0, 1.0, theta)
    v = axis_angle / safe_theta
    dot = jnp.sum(pts * v, axis=-1, keepdims=True)
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    out = cos_t * pts + sin_t * jnp.cross(v, pts) + dot * (1.0 - cos_t) * v
    return jnp.where(theta == 0, pts, out)


def euler_angles_to_R(roll, pitch, yaw):
    """Euler angles -> 3x3 rotation matrix, R = Rz @ Ry @ Rx.

    Reference: ba_rotate.py:85-94. Batched over leading dims."""
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    r00 = cy * cp
    r01 = cy * sp * sr - sy * cr
    r02 = cy * sp * cr + sy * sr
    r10 = sy * cp
    r11 = sy * sp * sr + cy * cr
    r12 = sy * sp * cr - cy * sr
    r20 = -sp
    r21 = cp * sr
    r22 = cp * cr
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def euler_angles_from_R(R):
    """3x3 rotation matrix -> (roll, pitch, yaw). Reference: ba_rotate.py:67-82."""
    R = jnp.asarray(R)
    sy = jnp.sqrt(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2)
    singular = sy < 1e-6
    roll = jnp.where(
        singular,
        jnp.arctan2(-R[..., 1, 2], R[..., 1, 1]),
        jnp.arctan2(R[..., 2, 1], R[..., 2, 2]),
    )
    pitch = jnp.arctan2(-R[..., 2, 0], sy)
    yaw = jnp.where(singular, jnp.zeros_like(sy), jnp.arctan2(R[..., 1, 0], R[..., 0, 0]))
    return roll, pitch, yaw


def euler_to_quaternion(roll, pitch, yaw):
    """Euler -> quaternion (qw, qx, qy, qz). Reference: ba_rotate.py:12-21."""
    hr, hp, hy = roll / 2, pitch / 2, yaw / 2
    qx = jnp.sin(hr) * jnp.cos(hp) * jnp.cos(hy) - jnp.cos(hr) * jnp.sin(hp) * jnp.sin(hy)
    qy = jnp.cos(hr) * jnp.sin(hp) * jnp.cos(hy) + jnp.sin(hr) * jnp.cos(hp) * jnp.sin(hy)
    qz = jnp.cos(hr) * jnp.cos(hp) * jnp.sin(hy) - jnp.sin(hr) * jnp.sin(hp) * jnp.cos(hy)
    qw = jnp.cos(hr) * jnp.cos(hp) * jnp.cos(hy) + jnp.sin(hr) * jnp.sin(hp) * jnp.sin(hy)
    return qw, qx, qy, qz


def quaternion_to_euler(qw, qx, qy, qz):
    """Quaternion -> Euler. Reference: ba_rotate.py:24-38."""
    t0 = 2.0 * (qw * qx + qy * qz)
    t1 = 1.0 - 2.0 * (qx * qx + qy * qy)
    roll = jnp.arctan2(t0, t1)
    t2 = jnp.clip(2.0 * (qw * qy - qz * qx), -1.0, 1.0)
    pitch = jnp.arcsin(t2)
    t3 = 2.0 * (qw * qz + qx * qy)
    t4 = 1.0 - 2.0 * (qy * qy + qz * qz)
    yaw = jnp.arctan2(t3, t4)
    return roll, pitch, yaw


def quaternion_to_R(q0, q1, q2, q3):
    """Quaternion -> 3x3 rotation matrix. Reference: ba_rotate.py:41-57."""
    r00 = q0 ** 2 + q1 ** 2 - q2 ** 2 - q3 ** 2
    r11 = q0 ** 2 - q1 ** 2 + q2 ** 2 - q3 ** 2
    r22 = q0 ** 2 - q1 ** 2 - q2 ** 2 + q3 ** 2
    r01 = 2.0 * (q1 * q2 - q0 * q3)
    r02 = 2.0 * (q0 * q2 + q1 * q3)
    r12 = 2.0 * (q2 * q3 - q0 * q1)
    r10 = 2.0 * (q1 * q2 + q0 * q3)
    r20 = 2.0 * (q1 * q3 - q0 * q2)
    r21 = 2.0 * (q0 * q1 + q2 * q3)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def R_to_quaternion(R):
    """3x3 rotation matrix -> quaternion. Reference: ba_rotate.py:60-64."""
    return euler_to_quaternion(*euler_angles_from_R(R))


def axis_angle_from_R(R):
    """Rotation matrix -> (axis, angle). Reference: ba_rotate.py:97-106."""
    R = jnp.asarray(R)
    axis = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    r = jnp.linalg.norm(axis, axis=-1)
    t = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    theta = jnp.arctan2(r, t - 1.0)
    return axis / jnp.where(r == 0, 1.0, r)[..., None], theta


def axis_angle_to_R(axis, angle):
    """(axis, angle) -> rotation matrix. Reference: ba_rotate.py:109-123."""
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    c = 1.0 - ca
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    return jnp.stack(
        [
            jnp.stack([x * x * c + ca, x * y * c - z * sa, z * x * c + y * sa], axis=-1),
            jnp.stack([x * y * c + z * sa, y * y * c + ca, y * z * c - x * sa], axis=-1),
            jnp.stack([z * x * c - y * sa, y * z * c + x * sa, z * z * c + ca], axis=-1),
        ],
        axis=-2,
    )
