"""Rotation-representation and camera compose/decompose round trips.

Mirrors (and extends) the reference's only unit tests
(tests/test_functions.py:19-63)."""

import numpy as np
import jax.numpy as jnp

from sat_bundleadjust_tpu.models.rotations import (
    R_to_quaternion,
    axis_angle_from_R,
    axis_angle_to_R,
    euler_angles_from_R,
    euler_angles_to_R,
    euler_to_quaternion,
    quaternion_to_euler,
    quaternion_to_R,
    rotate_euler,
    rotate_rodrigues,
)
from sat_bundleadjust_tpu.models.cameras import (
    compose_affine_camera,
    compose_perspective_camera,
    decompose_affine_camera,
    decompose_perspective_camera,
)


R_FIXED = np.array(
    [
        [0.25538431, -0.96424759, -0.07074919],
        [0.86330366, 0.19447877, 0.46570891],
        [-0.43529948, -0.18001279, 0.8821053],
    ]
)


def test_euler_R_roundtrip():
    angles = euler_angles_from_R(R_FIXED)
    R2 = euler_angles_to_R(*angles)
    np.testing.assert_allclose(np.asarray(R2), R_FIXED, atol=1e-7)


def test_quaternion_roundtrips():
    angles = euler_angles_from_R(R_FIXED)
    q = euler_to_quaternion(*angles)
    back = quaternion_to_euler(*q)
    np.testing.assert_allclose(
        np.asarray(jnp.stack(back)), np.asarray(jnp.stack(angles)), atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(quaternion_to_R(*R_to_quaternion(R_FIXED))), R_FIXED, atol=1e-7)


def test_axis_angle_roundtrip():
    axis, theta = axis_angle_from_R(R_FIXED)
    R2 = axis_angle_to_R(axis, theta)
    np.testing.assert_allclose(np.asarray(R2), R_FIXED, atol=1e-7)


def test_rotate_euler_matches_matrix():
    rng = np.random.RandomState(0)
    pts = rng.randn(50, 3)
    angles = rng.uniform(-0.5, 0.5, (50, 3))
    out = np.asarray(rotate_euler(jnp.array(pts), jnp.array(angles)))
    for i in range(50):
        R = np.asarray(euler_angles_to_R(*angles[i]))
        np.testing.assert_allclose(out[i], R @ pts[i], atol=1e-10)


def test_rotate_rodrigues_matches_matrix():
    rng = np.random.RandomState(1)
    pts = rng.randn(20, 3)
    aa = rng.uniform(-0.5, 0.5, (20, 3))
    out = np.asarray(rotate_rodrigues(jnp.array(pts), jnp.array(aa)))
    for i in range(20):
        theta = np.linalg.norm(aa[i])
        R = np.asarray(axis_angle_to_R(jnp.array(aa[i] / theta), jnp.float64(theta)))
        np.testing.assert_allclose(out[i], R @ pts[i], atol=1e-10)


def test_perspective_camera_roundtrip():
    P = np.array(
        [
            [7.29623172e-02, -5.17799277e-02, -1.02734764e-02, -9.62027582e04],
            [-5.01011603e-02, -6.23291457e-02, -4.15721807e-02, -2.59250341e05],
            [2.78193760e-08, 7.15619726e-08, -1.43761111e-07, 1.00000000e00],
        ]
    )
    K, R, _, oC = decompose_perspective_camera(P)
    np.testing.assert_allclose(P, compose_perspective_camera(K, R, oC), rtol=1e-6)


def test_affine_camera_roundtrip():
    P = np.array(
        [
            [7.61064055e-01, -9.35843155e-01, -1.00554841e-01, -1.13554311e06],
            [6.65950776e-02, -7.40405784e-02, 1.36333044e00, 4.07093217e06],
            [0.00000000e00, 0.00000000e00, 0.00000000e00, 1.00000000e00],
        ]
    )
    np.testing.assert_allclose(P, compose_affine_camera(*decompose_affine_camera(P)), rtol=1e-6)
