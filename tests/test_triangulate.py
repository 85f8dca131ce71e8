import numpy as np
import cv2
import jax.numpy as jnp

from stereo_visual_odometry_tpu.ops import se3, triangulate
from stereo_visual_odometry_tpu.ops.camera import StereoRig, Pinhole

RNG = np.random.default_rng(1)


def make_scene(n=200):
    rig = StereoRig.kitti()
    pts = np.stack(
        [
            RNG.uniform(-10, 10, n),
            RNG.uniform(-3, 3, n),
            RNG.uniform(4, 50, n),
        ],
        axis=-1,
    ).astype(np.float32)
    P1 = np.asarray(rig.P_left, np.float64)
    P2 = np.asarray(rig.P_right, np.float64)
    h = np.concatenate([pts, np.ones((n, 1))], axis=-1)
    pl = (P1 @ h.T).T
    pr = (P2 @ h.T).T
    pl = (pl[:, :2] / pl[:, 2:3]).astype(np.float32)
    pr = (pr[:, :2] / pr[:, 2:3]).astype(np.float32)
    return rig, pts, pl, pr


def test_dlt_recovers_points():
    rig, pts, pl, pr = make_scene()
    X, valid = triangulate.triangulate_stereo(rig, jnp.asarray(pl), jnp.asarray(pr))
    assert bool(np.all(np.asarray(valid)))
    np.testing.assert_allclose(np.asarray(X), pts, rtol=2e-3, atol=2e-2)


def test_dlt_matches_cv2_triangulatePoints():
    rig, pts, pl, pr = make_scene(64)
    P1 = np.asarray(rig.P_left, np.float64)
    P2 = np.asarray(rig.P_right, np.float64)
    Xh = cv2.triangulatePoints(P1, P2, pl.T.astype(np.float64), pr.T.astype(np.float64))
    X_cv = (Xh[:3] / Xh[3]).T
    X, _ = triangulate.triangulate_stereo(rig, jnp.asarray(pl), jnp.asarray(pr))
    np.testing.assert_allclose(np.asarray(X), X_cv, rtol=2e-3, atol=2e-2)


def test_closed_form_matches_dlt():
    rig, pts, pl, pr = make_scene(64)
    X_cf, valid = triangulate.stereo_depth_closed_form(rig, jnp.asarray(pl), jnp.asarray(pr))
    assert bool(np.all(np.asarray(valid)))
    np.testing.assert_allclose(np.asarray(X_cf), pts, rtol=2e-3, atol=2e-2)


def test_negative_depth_flagged_invalid():
    rig, pts, pl, pr = make_scene(16)
    # Swap left/right pixels -> negative disparity -> behind camera.
    X, valid = triangulate.triangulate_stereo(rig, jnp.asarray(pr), jnp.asarray(pl))
    assert not np.any(np.asarray(valid))


def test_noncentered_rig_dlt():
    # A rig with a rotated right camera exercises the general DLT path.
    cam = Pinhole.create(500.0, 500.0, 320.0, 240.0)
    R = np.asarray(se3.so3_exp(jnp.asarray([0.0, 0.05, 0.0], jnp.float32)))
    rig = StereoRig.create(cam, cam, R_rl=R, t_rl=[-0.3, 0.0, 0.0])
    pts = np.stack([RNG.uniform(-3, 3, 50), RNG.uniform(-2, 2, 50), RNG.uniform(3, 20, 50)], -1)
    P1 = np.asarray(rig.P_left, np.float64)
    P2 = np.asarray(rig.P_right, np.float64)
    h = np.concatenate([pts, np.ones((50, 1))], -1)
    pl = (P1 @ h.T).T
    pr = (P2 @ h.T).T
    pl = (pl[:, :2] / pl[:, 2:3]).astype(np.float32)
    pr = (pr[:, :2] / pr[:, 2:3]).astype(np.float32)
    X, valid = triangulate.triangulate_dlt(rig.P_left, rig.P_right, jnp.asarray(pl), jnp.asarray(pr))
    assert bool(np.all(np.asarray(valid)))
    np.testing.assert_allclose(np.asarray(X), pts, rtol=5e-3, atol=5e-2)


def test_camera_transforms_roundtrip():
    rig = StereoRig.kitti()
    T_cw = se3.se3_exp(jnp.asarray(RNG.normal(size=6).astype(np.float32) * 0.3))
    px = jnp.asarray(RNG.uniform(100, 500, size=(20, 2)).astype(np.float32))
    depth = jnp.asarray(RNG.uniform(2, 30, size=(20,)).astype(np.float32))
    from stereo_visual_odometry_tpu.ops import camera as cam_mod

    pw = cam_mod.pixel2world(rig.left, T_cw, px, depth)
    px_back = cam_mod.world2pixel(rig.left, T_cw, pw)
    np.testing.assert_allclose(np.asarray(px_back), np.asarray(px), atol=1e-2)
