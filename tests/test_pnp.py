import numpy as np
import cv2
import jax
import jax.numpy as jnp

from stereo_visual_odometry_tpu.ops import pnp, se3
from stereo_visual_odometry_tpu.ops.camera import Pinhole

RNG = np.random.default_rng(4)


def make_pnp_problem(n=200, noise_px=0.3, outlier_frac=0.0, pose_scale=0.3):
    cam = Pinhole.create(718.856, 718.856, 607.19, 185.22)
    pts = np.stack([RNG.uniform(-10, 10, n), RNG.uniform(-3, 3, n),
                    RNG.uniform(5, 40, n)], -1).astype(np.float32)
    xi = RNG.normal(size=6).astype(np.float32) * pose_scale
    xi[3:] *= 0.15  # modest rotation
    T = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    pc = pts @ T[:3, :3].T + T[:3, 3]
    keep = pc[:, 2] > 0.5
    px = np.stack([718.856 * pc[:, 0] / pc[:, 2] + 607.19,
                   718.856 * pc[:, 1] / pc[:, 2] + 185.22], -1)
    px += RNG.normal(size=px.shape) * noise_px
    n_out = int(outlier_frac * n)
    if n_out:
        idx = RNG.choice(n, n_out, replace=False)
        px[idx] += RNG.uniform(20, 100, size=(n_out, 2)) * RNG.choice([-1, 1], (n_out, 2))
    return cam, pts.astype(np.float32), px.astype(np.float32), T, keep


def pose_error(T_est, T_gt):
    dT = np.asarray(se3.se3_log(jnp.asarray(
        np.linalg.inv(T_gt) @ np.asarray(T_est), dtype=np.float32)))
    return np.linalg.norm(dT[:3]), np.linalg.norm(dT[3:])


def test_pnp_clean():
    cam, pts, px, T_gt, keep = make_pnp_problem(noise_px=0.0)
    out = pnp.ransac_pnp(cam, jnp.asarray(pts), jnp.asarray(px),
                         jnp.asarray(keep), jax.random.PRNGKey(0))
    et, er = pose_error(out["T"], T_gt)
    assert bool(out["ok"])
    assert et < 1e-2 and er < 1e-3, (et, er)


def test_pnp_noisy_with_outliers():
    cam, pts, px, T_gt, keep = make_pnp_problem(noise_px=0.5, outlier_frac=0.3)
    out = pnp.ransac_pnp(cam, jnp.asarray(pts), jnp.asarray(px),
                         jnp.asarray(keep), jax.random.PRNGKey(1))
    et, er = pose_error(out["T"], T_gt)
    assert bool(out["ok"])
    assert et < 0.05 and er < 5e-3, (et, er)
    # Outliers must be excluded from the inlier set.
    assert float(out["inlier_ratio"]) > 0.6


def test_pnp_comparable_to_cv2():
    cam, pts, px, T_gt, keep = make_pnp_problem(noise_px=0.5, outlier_frac=0.2)
    K = np.asarray(cam.K, np.float64)
    ok_cv, rvec, tvec, inl = cv2.solvePnPRansac(
        pts.astype(np.float64), px.astype(np.float64), K, None,
        iterationsCount=500, reprojectionError=2.0, confidence=0.99,
        flags=cv2.SOLVEPNP_ITERATIVE)
    R_cv, _ = cv2.Rodrigues(rvec)
    T_cv = np.eye(4); T_cv[:3, :3] = R_cv; T_cv[:3, 3] = tvec.ravel()
    out = pnp.ransac_pnp(cam, jnp.asarray(pts), jnp.asarray(px),
                         jnp.asarray(keep), jax.random.PRNGKey(2))
    et_cv, er_cv = pose_error(T_cv, T_gt)
    et, er = pose_error(out["T"], T_gt)
    # Ours must be at least in the same accuracy class as OpenCV.
    assert et < max(2 * et_cv, 0.02), (et, et_cv)
    assert er < max(2 * er_cv, 2e-3), (er, er_cv)


def test_pnp_uses_init_hypothesis():
    # With very few hypotheses and an exact init, the init must win.
    cam, pts, px, T_gt, keep = make_pnp_problem(noise_px=0.2)
    out = pnp.ransac_pnp(cam, jnp.asarray(pts), jnp.asarray(px),
                         jnp.asarray(keep), jax.random.PRNGKey(3),
                         num_hypotheses=8, T_init=jnp.asarray(T_gt, jnp.float32))
    et, er = pose_error(out["T"], T_gt)
    assert et < 0.02 and er < 2e-3


def test_pnp_respects_validity_mask():
    cam, pts, px, T_gt, keep = make_pnp_problem(noise_px=0.1)
    # Corrupt half the points but mark them invalid.
    n = len(pts)
    valid = np.ones(n, bool)
    valid[: n // 2] = False
    px_bad = px.copy()
    px_bad[: n // 2] += 500.0
    out = pnp.ransac_pnp(cam, jnp.asarray(pts), jnp.asarray(px_bad),
                         jnp.asarray(valid), jax.random.PRNGKey(4))
    et, er = pose_error(out["T"], T_gt)
    assert et < 0.02 and er < 2e-3
    assert not bool(np.any(np.asarray(out["inliers"])[: n // 2]))


def test_gauss_newton_converges_from_perturbed():
    cam, pts, px, T_gt, keep = make_pnp_problem(noise_px=0.0)
    dxi = jnp.asarray(RNG.normal(size=6).astype(np.float32) * 0.05)
    T0 = se3.se3_exp(dxi) @ jnp.asarray(T_gt, jnp.float32)
    T = pnp.gauss_newton_pose(cam, T0, jnp.asarray(pts), jnp.asarray(px),
                              jnp.ones(len(pts), jnp.float32), iters=15)
    et, er = pose_error(T, T_gt)
    assert et < 1e-3 and er < 1e-4
