"""Oracle tests for sndepth_tpu.ops.camera against closed-form NumPy math.

Reference semantics: /root/reference/utils/utils_edited.py:149-362.
"""

import numpy as np
import jax.numpy as jnp

from sndepth_tpu.ops import camera


def _np_euler2mat(z, y, x):
    def rz(a):
        return np.array([[np.cos(a), -np.sin(a), 0],
                         [np.sin(a), np.cos(a), 0],
                         [0, 0, 1]])

    def ry(a):
        return np.array([[np.cos(a), 0, np.sin(a)],
                         [0, 1, 0],
                         [-np.sin(a), 0, np.cos(a)]])

    def rx(a):
        return np.array([[1, 0, 0],
                         [0, np.cos(a), -np.sin(a)],
                         [0, np.sin(a), np.cos(a)]])

    return np.stack([rx(xi) @ ry(yi) @ rz(zi) for zi, yi, xi in zip(z, y, x)])


def test_euler2mat_matches_oracle():
    rng = np.random.RandomState(0)
    z, y, x = rng.uniform(-1, 1, (3, 5)).astype(np.float32)
    got = np.asarray(camera.euler2mat(jnp.array(z), jnp.array(y), jnp.array(x)))
    want = _np_euler2mat(z, y, x)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_euler2mat_orthonormal():
    rng = np.random.RandomState(1)
    z, y, x = rng.uniform(-3, 3, (3, 8)).astype(np.float32)
    R = np.asarray(camera.euler2mat(jnp.array(z), jnp.array(y), jnp.array(x)))
    eye = np.eye(3)[None].repeat(8, 0)
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(8), atol=1e-5)


def test_pose_vec2mat_structure():
    rng = np.random.RandomState(2)
    vec = rng.uniform(-0.5, 0.5, (4, 6)).astype(np.float32)
    mat = np.asarray(camera.pose_vec2mat(jnp.array(vec)))
    assert mat.shape == (4, 4, 4)
    np.testing.assert_allclose(mat[:, :3, 3], vec[:, :3], atol=1e-6)
    np.testing.assert_allclose(mat[:, 3], np.tile([0, 0, 0, 1], (4, 1)),
                               atol=0)
    want_rot = _np_euler2mat(vec[:, 5], vec[:, 4], vec[:, 3])
    np.testing.assert_allclose(mat[:, :3, :3], want_rot, atol=1e-5)


def test_invert_pose_mat():
    rng = np.random.RandomState(3)
    vec = rng.uniform(-0.5, 0.5, (4, 6)).astype(np.float32)
    mat = camera.pose_vec2mat(jnp.array(vec))
    inv = np.asarray(camera.invert_pose_mat(mat))
    np.testing.assert_allclose(inv @ np.asarray(mat),
                               np.eye(4)[None].repeat(4, 0), atol=1e-5)


def test_invert_intrinsics():
    k = np.array([[[100.0, 0, 50], [0, 120, 40], [0, 0, 1]]], np.float32)
    inv = np.asarray(camera.invert_intrinsics(jnp.array(k)))
    np.testing.assert_allclose(inv @ k, np.eye(3)[None], atol=1e-6)


def test_rigid_flow_identity_pose_is_zero():
    b, h, w = 2, 16, 32
    pose = jnp.zeros((b, 6))
    depth = jnp.full((b, h, w), 5.0)
    k = jnp.tile(jnp.array([[[20.0, 0, 16], [0, 20, 8], [0, 0, 1]]]),
                 (b, 1, 1))
    for reverse in (False, True):
        flow = np.asarray(camera.compute_rigid_flow(pose, depth, k, reverse))
        np.testing.assert_allclose(flow, np.zeros((b, h, w, 2)), atol=1e-4)


def test_rigid_flow_pure_x_translation():
    # Translating the camera by tx shifts pixels by -fx*tx/z... with the
    # reference's convention: proj = K @ T, so u' = u + fx*tx/z.
    b, h, w = 1, 8, 8
    fx, z, tx = 10.0, 4.0, 0.8
    pose = jnp.array([[tx, 0, 0, 0, 0, 0]])
    depth = jnp.full((b, h, w), z)
    k = jnp.array([[[fx, 0, 4], [0, 10.0, 4], [0, 0, 1]]])
    flow = np.asarray(camera.compute_rigid_flow(pose, depth, k, False))
    np.testing.assert_allclose(flow[..., 0], fx * tx / z, atol=1e-4)
    np.testing.assert_allclose(flow[..., 1], 0.0, atol=1e-4)


def test_multi_scale_intrinsics():
    k = jnp.array([[[100.0, 0, 50], [0, 120, 40], [0, 0, 1]]])
    ms = np.asarray(camera.compute_multi_scale_intrinsics(k, 4))
    assert ms.shape == (1, 4, 3, 3)
    for s in range(4):
        np.testing.assert_allclose(ms[0, s, 0, 0], 100.0 / 2 ** s)
        np.testing.assert_allclose(ms[0, s, 1, 2], 40.0 / 2 ** s)
        np.testing.assert_allclose(ms[0, s, 2], [0, 0, 1])
