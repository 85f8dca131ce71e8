"""Unit tests for Schur marginalization (models/marg.py) — VERDICT r4
weak #3: the prior's CONTENT and EFFECT, not just that it runs.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stereo_visual_odometry_tpu.models import ba, marg
from stereo_visual_odometry_tpu.ops.camera import Pinhole


def _make_problem(K=3, L=40, seed=0, noise_px=0.3, perturb=0.05):
    """K poses along +z, L landmarks ahead; every kf observes every lm."""
    rng = np.random.default_rng(seed)
    cam = Pinhole.create(500.0, 500.0, 320.0, 240.0)
    pts = np.stack([rng.uniform(-6, 6, L), rng.uniform(-3, 3, L),
                    rng.uniform(8, 25, L)], -1).astype(np.float32)
    poses_gt = np.stack([np.eye(4, dtype=np.float32) for _ in range(K)])
    for k in range(K):
        poses_gt[k][2, 3] = -0.6 * k  # camera_from_world: scene recedes
    obs_kf, obs_lm, obs_uv = [], [], []
    for k in range(K):
        pc = pts @ poses_gt[k][:3, :3].T + poses_gt[k][:3, 3]
        uv = np.stack([500 * pc[:, 0] / pc[:, 2] + 320,
                       500 * pc[:, 1] / pc[:, 2] + 240], -1)
        uv += rng.normal(size=uv.shape) * noise_px
        for l in range(L):
            obs_kf.append(k)
            obs_lm.append(l)
            obs_uv.append(uv[l])
    poses0 = poses_gt.copy()
    for k in range(1, K):
        poses0[k][:3, 3] += rng.normal(size=3).astype(np.float32) * perturb
    return (cam, pts.astype(np.float32), poses_gt, poses0,
            np.asarray(obs_kf, np.int32), np.asarray(obs_lm, np.int32),
            np.asarray(obs_uv, np.float32))


def test_build_prior_structure():
    """Symmetry, mask, linearization points of the built prior."""
    cam, pts, poses_gt, poses0, okf, olm, ouv = _make_problem()
    w = np.ones(len(okf), np.float32)
    prior = marg.build_prior(cam, jnp.asarray(poses0), jnp.asarray(pts),
                             jnp.asarray(okf), jnp.asarray(olm),
                             jnp.asarray(ouv), jnp.asarray(w),
                             jnp.asarray(2.0, jnp.float32))
    H = np.asarray(prior["H"])
    K = H.shape[0]
    # Block symmetry: H[k, j] == H[j, k]^T.
    for k in range(K):
        for j in range(K):
            np.testing.assert_allclose(H[k, j], H[j, k].T, atol=1e-3)
    # Slid indexing: slot k linearized at old slot k+1; last slot empty.
    mask = np.asarray(prior["mask"])
    assert mask[: K - 1].all() and not mask[K - 1]
    np.testing.assert_allclose(np.asarray(prior["T_lin"])[0], poses0[1],
                               atol=1e-6)
    assert np.abs(H[K - 1]).max() == 0.0
    # Real information content on the surviving slots.
    assert np.abs(H[: K - 1, : K - 1]).max() > 1.0
    # PSD up to float noise: the dense (6(K-1))^2 matrix has eigs >= -eps.
    Hf = H[:K - 1, :K - 1].transpose(0, 2, 1, 3).reshape(6 * (K - 1), -1)
    eigs = np.linalg.eigvalsh(0.5 * (Hf + Hf.T))
    assert eigs.min() > -1e-2 * max(eigs.max(), 1.0), eigs.min()


def test_prior_carries_marginalized_information():
    """The done-criterion test: after kf0 + most landmarks are
    marginalized, solving the remaining sparse window WITH the prior must
    land closer to ground truth than solving it without.
    """
    cam, pts, poses_gt, poses0, okf, olm, ouv = _make_problem(
        K=3, L=40, noise_px=0.2, perturb=0.08)
    L_dead = 32  # landmarks 0..31 die with kf0; 32..39 stay live
    w = np.ones(len(okf), np.float32)

    # Consumed system: all observations of the dying landmarks.
    dead = olm < L_dead
    prior3 = marg.build_prior(
        cam, jnp.asarray(poses0), jnp.asarray(pts),
        jnp.asarray(okf[dead]), jnp.asarray(olm[dead]),
        jnp.asarray(ouv[dead]), jnp.asarray(w[dead]),
        jnp.asarray(2.0, jnp.float32))
    # Truncate the 3-slot prior to the slid 2-kf window (backend flow).
    prior = {k: (np.asarray(v)[:2] if k != "H" else np.asarray(v)[:2, :2])
             for k, v in prior3.items()}
    prior = {k: jnp.asarray(v) for k, v in prior.items()}

    # Remaining window: kf1, kf2 with ONLY the live landmarks' obs.
    live = (olm >= L_dead) & (okf >= 1)
    okf_w = okf[live] - 1
    olm_w = olm[live] - L_dead
    ouv_w = ouv[live]
    w_w = np.ones(len(okf_w), np.float32)
    poses_w0 = poses0[1:].copy()
    pts_w = pts[L_dead:].copy()

    def solve(use_prior):
        out = ba.bundle_adjust(
            cam, jnp.asarray(poses_w0), jnp.asarray(pts_w),
            jnp.asarray(okf_w), jnp.asarray(olm_w), jnp.asarray(ouv_w),
            jnp.asarray(w_w), n_iters=10, n_fixed=1, gm_polish=False,
            prior=prior if use_prior else None)
        return np.asarray(out["poses"])

    err = lambda p: np.abs(p[1] - poses_gt[2]).max()  # kf2 pose error
    e_without = err(solve(False))
    e_with = err(solve(True))
    # The prior carries kf0's + the dead landmarks' information about kf2.
    # (No tight absolute bound: n_fixed=1 anchors the window at kf1's
    # PERTURBED pose, so kf2's absolute error is floored by the gauge.)
    assert e_with < 0.9 * e_without, (e_with, e_without)
    assert e_with < 0.15, e_with


def test_shift_prior_gradient_consistency():
    """Re-expressing the prior at new poses preserves the gradient at
    those poses: grad_new(0) == H*delta + b == grad_old(delta)."""
    cam, pts, poses_gt, poses0, okf, olm, ouv = _make_problem()
    w = np.ones(len(okf), np.float32)
    prior = marg.build_prior(cam, jnp.asarray(poses0), jnp.asarray(pts),
                             jnp.asarray(okf), jnp.asarray(olm),
                             jnp.asarray(ouv), jnp.asarray(w),
                             jnp.asarray(2.0, jnp.float32))
    rng = np.random.default_rng(3)
    poses_now = np.asarray(prior["T_lin"]).copy()
    for k in range(poses_now.shape[0] - 1):
        poses_now[k][:3, 3] += rng.normal(size=3).astype(np.float32) * 0.02
    delta = np.asarray(marg.prior_deltas(prior, jnp.asarray(poses_now)))
    H, b = np.asarray(prior["H"]), np.asarray(prior["b"])
    want = np.einsum("kjab,jb->ka", H, delta) + b
    H_s, b_s = marg.shift_prior(prior, jnp.asarray(poses_now))
    # f32 einsum vs f64 numpy over entries up to ~1e4: tolerate f32 ulps.
    np.testing.assert_allclose(np.asarray(b_s), want, rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(np.asarray(H_s), H, atol=0)
