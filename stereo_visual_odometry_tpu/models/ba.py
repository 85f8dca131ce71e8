"""Sliding-window bundle adjustment: Levenberg-Marquardt with Schur complement.

The reference links g2o but never uses it — its "G2O" pose estimator calls
``cv::solvePnPRansac`` (``/root/reference/src/tracking.cpp:384-426``) and the
``MapPoint``/keyframe machinery is declared-but-absent (SURVEY.md §1). This
module supplies the real backend (BASELINE.json configs 3/5), designed for
XLA from the start:

* Fixed problem capacities: K keyframes, L landmarks, M observations, all
  masked — no dynamic sparsity structures.
* Batched residual/Jacobian assembly via ``vmap``; per-block reduction via
  ``segment_sum`` (landmark 3x3 blocks, pose 6x6 blocks) — dense tensor
  contractions the MXU/VPU like.
* The pose-landmark coupling ``H_pl`` is kept as a dense (K, L, 6, 3) block
  tensor (window-sized problems: K<=16, L<=2048 -> a few MB in f32), so the
  Schur complement ``S = H_pp - H_pl H_ll^-1 H_pl^T`` is two einsums.
* Reduced camera system solved by Cholesky on a (6K, 6K) matrix; landmarks
  back-substituted in closed form (batched 3x3 solves).
* Levenberg-Marquardt with multiplicative damping and accept/reject steps
  under ``lax.while_loop``-free fixed iteration count (jit-friendly).
* Gauge freedom fixed by freezing the first ``n_fixed`` keyframe poses.

The same assembly routine, wrapped in ``shard_map`` with a ``psum`` over the
observation shards, is the distributed BA of ``parallel/dist_ba.py``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import se3
from ..ops.camera import Pinhole

_HI = jax.lax.Precision.HIGHEST


def project_residuals(cam: Pinhole, T_cw: jax.Array, pts_w: jax.Array,
                      obs_uv: jax.Array, obs_right: jax.Array | None = None,
                      T_rl: jax.Array | None = None):
    """Residual + Jacobians for a batch of observations.

    Args:
      T_cw: (M, 4, 4) left-camera_from_world pose per observation.
      pts_w: (M, 3) landmark position per observation.
      obs_uv: (M, 2) measured pixels.
      obs_right: optional (M,) bool — observation made by the RIGHT camera
        of the rig. Stereo observations pin the scale gauge that a
        monocular-only window BA leaves free.
      T_rl: (4, 4) right_from_left extrinsics (required with obs_right).

    Returns (r (M, 2), Jp (M, 2, 6) wrt left-mult pose twist of T_cw,
    Jl (M, 2, 3) wrt landmark, z (M,) observing-camera depths).
    """
    R = T_cw[..., :3, :3]
    t = T_cw[..., :3, 3]
    pl = jnp.einsum("mij,mj->mi", R, pts_w, precision=_HI) + t  # left-cam point
    if obs_right is not None:
        assert T_rl is not None
        R_rl = T_rl[:3, :3]
        t_rl = T_rl[:3, 3]
        pr = jnp.einsum("ij,mj->mi", R_rl, pl, precision=_HI) + t_rl
        pc = jnp.where(obs_right[:, None], pr, pl)
        R_pre = jnp.where(obs_right[:, None, None], R_rl[None], jnp.eye(3, dtype=R.dtype)[None])
    else:
        pc = pl
        R_pre = None

    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    zs = jnp.maximum(z, 1e-6)
    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z
    fx, fy = cam.fx, cam.fy
    u = fx * x * inv_z + cam.cx
    v = fy * y * inv_z + cam.cy
    r = jnp.stack([u, v], axis=-1) - obs_uv

    zeros = jnp.zeros_like(z)
    # d(pixel)/d(observing-camera point)
    Jc = jnp.stack([
        jnp.stack([fx * inv_z, zeros, -fx * x * inv_z2], -1),
        jnp.stack([zeros, fy * inv_z, -fy * y * inv_z2], -1),
    ], axis=-2)  # (M, 2, 3)
    # Chain through the rig extrinsics: d pc / d pl = R_pre.
    Jcl = Jc if R_pre is None else jnp.einsum("mij,mjk->mik", Jc, R_pre,
                                              precision=_HI)
    # d pl / d(left-mult twist [v, w]) = [I | -hat(pl)]
    Jp = jnp.concatenate([Jcl, jnp.einsum("mij,mjk->mik", Jcl, -se3.hat(pl),
                                          precision=_HI)], axis=-1)  # (M, 2, 6)
    # d pl / d(landmark) = R
    Jl = jnp.einsum("mij,mjk->mik", Jcl, R, precision=_HI)  # (M, 2, 3)
    return r, Jp, Jl, z


def assemble_normal_eqs(cam: Pinhole, poses: jax.Array, points: jax.Array,
                        obs_kf: jax.Array, obs_lm: jax.Array, obs_uv: jax.Array,
                        obs_w: jax.Array, huber_px: float, n_kf: int, n_lm: int,
                        robust: str = "huber", obs_right: jax.Array | None = None,
                        T_rl: jax.Array | None = None):
    """Build the BA normal equations from an observation shard.

    Args:
      poses: (K, 4, 4) camera_from_world keyframe poses.
      points: (L, 3) landmarks.
      obs_kf / obs_lm: (M,) int32 indices into poses / points.
      obs_uv: (M, 2) pixels; obs_w: (M,) weights (0 = dead observation).

    Returns dict(Hpp (K, 6, 6), Hll (L, 3, 3), Hpl (K, L, 6, 3),
    bp (K, 6), bl (L, 3), cost scalar, n_active scalar). All summed over this
    shard — pure data-parallel contributions, psum-able across shards.
    """
    T = poses[obs_kf]
    X = points[obs_lm]
    r, Jp, Jl, z = project_residuals(cam, T, X, obs_uv, obs_right, T_rl)

    rn = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
    if robust == "gm":
        # Geman-McClure: redescending, bounded influence — outliers beyond a
        # few deltas contribute ~nothing. Used in the final solve phase
        # (graduated non-convexity: Huber first, GM to finish).
        s = (rn / huber_px) ** 2
        rw = 1.0 / (1.0 + s) ** 2
    else:  # huber
        rw = jnp.where(rn <= huber_px, 1.0, huber_px / rn)
    w = obs_w * rw * (z > 1e-6)

    cost = 0.5 * jnp.sum(w * rn * rn)
    n_active = jnp.sum(obs_w > 0)

    Jpw = Jp * w[:, None, None]
    Jlw = Jl * w[:, None, None]

    Hpp_m = jnp.einsum("mia,mib->mab", Jpw, Jp, precision=_HI)   # (M, 6, 6)
    Hll_m = jnp.einsum("mia,mib->mab", Jlw, Jl, precision=_HI)   # (M, 3, 3)
    Hpl_m = jnp.einsum("mia,mib->mab", Jpw, Jl, precision=_HI)   # (M, 6, 3)
    bp_m = jnp.einsum("mia,mi->ma", Jpw, r, precision=_HI)       # (M, 6)
    bl_m = jnp.einsum("mia,mi->ma", Jlw, r, precision=_HI)       # (M, 3)

    seg = jax.ops.segment_sum
    Hpp = seg(Hpp_m, obs_kf, num_segments=n_kf)
    Hll = seg(Hll_m, obs_lm, num_segments=n_lm)
    bp = seg(bp_m, obs_kf, num_segments=n_kf)
    bl = seg(bl_m, obs_lm, num_segments=n_lm)
    # Dense coupling blocks: scatter into the (K*L) flattened pair index.
    pair = obs_kf * n_lm + obs_lm
    Hpl = seg(Hpl_m, pair, num_segments=n_kf * n_lm).reshape(n_kf, n_lm, 6, 3)

    return {"Hpp": Hpp, "Hll": Hll, "Hpl": Hpl, "bp": bp, "bl": bl,
            "cost": cost, "n_active": n_active}


def schur_partials(eqs: dict, lm_damping: jax.Array):
    """Shard-local Schur contributions after landmark elimination.

    Everything here needs only THIS shard's observations, provided the
    shard is landmark-coherent (every observation of a landmark lives on
    one shard — ``parallel/dist_ba.partition_obs_by_landmark``): then
    ``Hll``/``bl`` for owned landmarks are complete locally, landmarks a
    shard does not own have all-zero rows (their damped inverse backfills
    1e8*I against a zero ``W`` column — contributing exactly zero), and
    the Schur cross terms between shards vanish.

    Returns (reduced, local): ``reduced`` is the tiny pytree to all-reduce
    across shards — S_part (K, K, 6, 6), b_part (K, 6), Hpp (K, 6, 6),
    bp (K, 6): ~40 KB at window size vs the ~2.4 MB dense ``Hpl`` — and
    ``local`` holds what back-substitution needs (Hll_inv, W, bl).
    """
    Hll, W = eqs["Hll"], eqs["Hpl"]
    I3 = jnp.eye(3, dtype=Hll.dtype)
    Hll_d = Hll + lm_damping * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hll)) + 1e-8 * I3
    Hll_inv = jnp.linalg.inv(Hll_d)  # (L, 3, 3) batched

    WHinv = jnp.einsum("klab,lbc->klac", W, Hll_inv, precision=_HI)
    S_part = -jnp.einsum("klac,jlbc->kjab", WHinv, W, precision=_HI)  # (K, K, 6, 6)
    b_part = -jnp.einsum("klac,lc->ka", WHinv, eqs["bl"], precision=_HI)
    reduced = {"S_part": S_part, "b_part": b_part,
               "Hpp": eqs["Hpp"], "bp": eqs["bp"]}
    local = {"Hll_inv": Hll_inv, "W": W, "bl": eqs["bl"]}
    return reduced, local


def solve_reduced(reduced: dict, lm_damping: jax.Array, n_fixed: int,
                  Hpp_cross=None):
    """Solve the reduced camera system (replicated, post-all-reduce).

    Pose damping is applied HERE — after the cross-shard sum — because
    ``diag(sum) != sum(diag-damped partials)``.
    """
    Hpp = reduced["Hpp"]
    K = Hpp.shape[0]
    I6 = jnp.eye(6, dtype=Hpp.dtype)
    Hpp_d = Hpp + lm_damping * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hpp)) + 1e-8 * I6
    S_blocks = reduced["S_part"].at[jnp.arange(K), jnp.arange(K)].add(Hpp_d)
    if Hpp_cross is not None:
        # Dense pose-pose information from a marginalization prior
        # (models/marg.py); its gradient already sits in bp.
        S_blocks = S_blocks + Hpp_cross
    b_schur = reduced["bp"] + reduced["b_part"]

    S = S_blocks.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
    b = b_schur.reshape(6 * K)

    # Gauge: freeze the first n_fixed poses by pinning their rows/cols.
    if n_fixed > 0:
        f = 6 * n_fixed
        mask = jnp.arange(6 * K) >= f
        S = jnp.where(mask[:, None] & mask[None, :], S,
                      jnp.eye(6 * K, dtype=S.dtype))
        b = jnp.where(mask, b, 0.0)
    return -jnp.linalg.solve(S, b).reshape(K, 6)


def back_substitute(local: dict, dx_pose: jax.Array) -> jax.Array:
    """dx_l = -Hll^-1 (bl + W^T dx_p) — landmark updates from this shard's
    blocks (zero for landmarks the shard does not own)."""
    Wt_dx = jnp.einsum("klab,ka->lb", local["W"], dx_pose, precision=_HI)
    return -jnp.einsum("lab,lb->la", local["Hll_inv"], local["bl"] + Wt_dx,
                       precision=_HI)


def solve_schur(eqs: dict, lm_damping: jax.Array, n_fixed: int):
    """Schur-complement solve of the damped normal equations.

    Returns (dx_pose (K, 6), dx_point (L, 3)). The first ``n_fixed`` pose
    updates are zeroed (gauge fixing).
    """
    reduced, local = schur_partials(eqs, lm_damping)
    dx_pose = solve_reduced(reduced, lm_damping, n_fixed,
                            Hpp_cross=eqs.get("Hpp_cross"))
    return dx_pose, back_substitute(local, dx_pose)


def _apply(poses, points, dx_pose, dx_point):
    return jax.vmap(lambda x, T: jnp.matmul(
        se3.se3_exp(x), T, precision=jax.lax.Precision.HIGHEST))(
        dx_pose, poses), points + dx_point


def _lm_loop(cam, poses, points, obs_kf, obs_lm, obs_uv, obs_w,
             n_iters, n_fixed, huber_px, init_damping, robust="huber",
             obs_right=None, T_rl=None, reduce_tree=None, prior=None,
             schur_reduce=False):
    """One LM phase. ``reduce_tree`` (optional) reduces pytrees across
    observation shards — identity on one chip, a per-leaf ``psum`` in the
    distributed deployment (``parallel/dist_ba.py``); the solver itself is
    shard-agnostic. ``prior`` (optional) is a marginalization prior dict
    (``models/marg.py``).

    ``schur_reduce``: move the all-reduce AFTER landmark elimination —
    shards must then be landmark-coherent
    (``dist_ba.partition_obs_by_landmark``). Per-iteration traffic drops
    from the dense normal-equation tree (dominated by the (K, L, 6, 3)
    ``Hpl``, ~2.4 MB at the 16x2048 production window) to the reduced
    camera system + landmark updates (~70 KB) — the distributed-Schur
    layout where collectives carry only pose-sized state (VERDICT r4
    next #6). False keeps the reduce on the assembled equations
    (any-sharding fallback).
    """
    n_kf, n_lm = poses.shape[0], points.shape[0]
    ident = reduce_tree is None
    red = (lambda t: t) if ident else reduce_tree

    def local_eqs(p, x):
        return assemble_normal_eqs(cam, p, x, obs_kf, obs_lm, obs_uv, obs_w,
                                   huber_px, n_kf, n_lm, robust=robust,
                                   obs_right=obs_right, T_rl=T_rl)

    def cost_of(p, x):
        # Scalar-only reduction: the full tree is never shipped for a cost
        # probe (the accept/reject step and cost0 need just this number).
        c = red(local_eqs(p, x)["cost"])
        if prior is not None:
            from . import marg

            delta = marg.prior_deltas(prior, p.astype(prior["b"].dtype))
            H, b = prior["H"], prior["b"]
            c = c + (0.5 * jnp.einsum("ka,kjab,jb->", delta, H, delta,
                                      precision=_HI)
                     + jnp.sum(b * delta))
        return c

    def step_of(p, x, lam):
        """One damped Schur step -> (dx_pose, dx_point)."""
        e = local_eqs(p, x)
        if schur_reduce and not ident:
            reduced, local = schur_partials(e, lam)
            reduced = red(reduced)
            cross = None
            if prior is not None:
                from . import marg

                delta = marg.prior_deltas(prior, p.astype(prior["b"].dtype))
                grad = jnp.einsum("kjab,jb->ka", prior["H"], delta,
                                  precision=_HI) + prior["b"]
                reduced = dict(reduced)
                reduced["bp"] = reduced["bp"] + grad * prior["mask"][:, None]
                cross = prior["H"]
            dxp = solve_reduced(reduced, lam, n_fixed, Hpp_cross=cross)
            # Each shard back-substitutes only its own landmarks (others
            # contribute zero); the sum re-replicates the point update.
            dxl = red(back_substitute(local, dxp))
            return dxp, dxl
        e = red(e)
        if prior is not None:
            from . import marg

            e = marg.add_prior_to_eqs(e, prior, p)
        return solve_schur(e, lam, n_fixed)

    cost0 = cost_of(poses, points)

    def body(_, carry):
        p, x, lam, cost = carry
        dxp, dxl = step_of(p, x, lam)
        p_new, x_new = _apply(p, x, dxp, dxl)
        new_cost = cost_of(p_new, x_new)
        ok = jnp.isfinite(new_cost) & (new_cost < cost)
        # LM damping schedule: decrease on success, increase on failure.
        lam = jnp.where(ok, jnp.maximum(lam * 0.3, 1e-9),
                        jnp.minimum(lam * 4.0, 1e4))
        p = jnp.where(ok, p_new, p)
        x = jnp.where(ok, x_new, x)
        cost = jnp.where(ok, new_cost, cost)
        return p, x, lam, cost

    poses_f, points_f, lam_f, cost_f = jax.lax.fori_loop(
        0, n_iters, body,
        (poses, points, jnp.asarray(init_damping, poses.dtype), cost0))
    return poses_f, points_f, lam_f, cost_f, cost0


def _solve_phases(cam, poses, points, obs_kf, obs_lm, obs_uv, obs_w,
                  n_iters, n_fixed, huber_px, init_damping, gm_polish,
                  prune_px, obs_right=None, T_rl=None, reduce_tree=None,
                  prior=None, schur_reduce=False):
    """The full solve schedule (GNC phases + optional prune-and-repolish),
    shared verbatim by the single-chip and distributed deployments."""
    # Graduated non-convexity: Geman-McClure with an annealed scale. The wide
    # scale is near-quadratic (converges from poor initializations); narrowing
    # it drives outlier influence to zero. Huber alone is insufficient — its
    # linear tail lets a coherent outlier cluster out-pull the true optimum.
    if gm_polish:
        schedule = [("gm", 16.0, n_iters), ("gm", 4.0, max(n_iters // 2, 2)),
                    ("gm", 1.0, max(n_iters // 2, 2))]
    else:
        schedule = [("huber", 1.0, n_iters)]

    poses_f, points_f = poses, points
    cost0 = None
    for robust, mult, iters in schedule:
        poses_f, points_f, lam_f, cost_f, c0 = _lm_loop(
            cam, poses_f, points_f, obs_kf, obs_lm, obs_uv, obs_w,
            iters, n_fixed, huber_px * mult, init_damping, robust=robust,
            obs_right=obs_right, T_rl=T_rl, reduce_tree=reduce_tree,
            prior=prior, schur_reduce=schur_reduce)
        if cost0 is None:
            cost0 = c0

    if prune_px is not None:
        T = poses_f[obs_kf]
        X = points_f[obs_lm]
        r, _, _, z = project_residuals(cam, T, X, obs_uv, obs_right, T_rl)
        rn = jnp.linalg.norm(r, axis=-1)
        # Per-observation decision — purely local to the shard.
        obs_w = obs_w * ((rn <= prune_px) & (z > 1e-6))
        poses_f, points_f, lam_f, cost_f, _ = _lm_loop(
            cam, poses_f, points_f, obs_kf, obs_lm, obs_uv, obs_w,
            max(n_iters // 2, 2), n_fixed, huber_px, init_damping,
            obs_right=obs_right, T_rl=T_rl, reduce_tree=reduce_tree,
            prior=prior, schur_reduce=schur_reduce)

    return poses_f, points_f, lam_f, cost_f, cost0, obs_w


@partial(jax.jit, static_argnames=("n_iters", "n_fixed", "prune_px", "gm_polish"))
def bundle_adjust(cam: Pinhole, poses: jax.Array, points: jax.Array,
                  obs_kf: jax.Array, obs_lm: jax.Array, obs_uv: jax.Array,
                  obs_w: jax.Array, n_iters: int = 10, n_fixed: int = 1,
                  huber_px: float = 2.0, init_damping: float = 1e-3,
                  prune_px: float | None = None, gm_polish: bool = True,
                  obs_right: jax.Array | None = None,
                  T_rl: jax.Array | None = None,
                  prior: dict | None = None):
    """Windowed LM bundle adjustment.

    Args:
      poses: (K, 4, 4) camera_from_world initial keyframe poses.
      points: (L, 3) initial landmarks.
      obs_*: (M,) / (M, 2) observation table (index, pixel, weight).
      n_fixed: number of leading poses held fixed (gauge / marginalization
        anchor).
      prune_px: if set, after the main solve observations with residual
        above this radius are zero-weighted and a short re-polish runs —
        explicit outlier pruning between solves, as production BA does.
      prior: optional marginalization prior (``models/marg.py``) carrying
        the information of keyframes slid out of the window.

    Returns dict(poses, points, cost_initial, cost_final, damping, obs_w).
    """
    poses_f, points_f, lam_f, cost_f, cost0, obs_w = _solve_phases(
        cam, poses, points, obs_kf, obs_lm, obs_uv, obs_w, n_iters, n_fixed,
        huber_px, init_damping, gm_polish, prune_px, obs_right, T_rl,
        prior=prior)

    return {"poses": poses_f, "points": points_f, "cost_initial": cost0,
            "cost_final": cost_f, "damping": lam_f, "obs_w": obs_w}
