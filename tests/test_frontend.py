"""End-to-end frontend tests on synthetic sequences with known ego-motion."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stereo_visual_odometry_tpu.models import frontend
from stereo_visual_odometry_tpu.ops.camera import Pinhole, StereoRig
from stereo_visual_odometry_tpu.utils import synthetic, trajectory


def run_vo(mode, n_frames=12, h=256, w=384, speed=1.0):
    seq = synthetic.render_sequence(n_frames=n_frames, h=h, w=w, fx=300.0, speed=speed)
    rp = seq["rig"]
    cam = Pinhole.create(rp["fx"], rp["fy"], rp["cx"], rp["cy"])
    rig = StereoRig.create(cam, cam, t_rl=[-rp["baseline"], 0, 0])
    cfg = frontend.VOConfig(mode=mode, height=h, width=w, max_features=512,
                            num_hypotheses=256,
                            min_inlier_rate=0.3, min_features_track=8)
    init_fn, step_fn = frontend.make_frontend(cfg, rig)
    key = jax.random.PRNGKey(0)
    state = init_fn(jnp.asarray(seq["images_l"][0]), jnp.asarray(seq["images_r"][0]), key)
    poses = [np.eye(4)]
    accepts = []
    for f in range(1, n_frames):
        state, m = step_fn(state, jnp.asarray(seq["images_l"][f]),
                           jnp.asarray(seq["images_r"][f]))
        poses.append(np.asarray(state["T_wc"], np.float64))
        accepts.append(bool(m["accept"]))
    return np.stack(poses), seq["poses_gt"], accepts


@pytest.mark.parametrize("mode", ["lk", "orb"])
def test_frontend_tracks_synthetic_sequence(mode):
    est, gt, accepts = run_vo(mode)
    # Pose updates must be accepted for nearly all frames.
    assert np.mean(accepts) > 0.8, accepts
    ate = trajectory.ate_rmse(est, gt, align=False)
    # 1 m/frame over 11 frames => 11 m travelled; demand dm-level ATE.
    assert ate < (0.2 if mode == "lk" else 0.3), ate
    t_rpe, r_rpe = trajectory.rpe(est, gt)
    assert t_rpe < (0.05 if mode == "lk" else 0.1), t_rpe
    assert r_rpe < 0.01, r_rpe


def test_frontend_rejects_static_scene_motion():
    # Identical frames: PnP should find ~identity; min_move gate rejects it,
    # so the pose must stay put (reference gate semantics tracking.cpp:305-329).
    seq = synthetic.render_sequence(n_frames=3, h=256, w=384, fx=300.0, speed=0.0)
    rp = seq["rig"]
    cam = Pinhole.create(rp["fx"], rp["fy"], rp["cx"], rp["cy"])
    rig = StereoRig.create(cam, cam, t_rl=[-rp["baseline"], 0, 0])
    # minmove 0.05 m, the ORB-path/yaml value (default.yaml:87).
    cfg = frontend.VOConfig(mode="lk", height=256, width=384, max_features=512,
                            num_hypotheses=128, min_move=0.05)
    init_fn, step_fn = frontend.make_frontend(cfg, rig)
    state = init_fn(jnp.asarray(seq["images_l"][0]), jnp.asarray(seq["images_r"][0]),
                    jax.random.PRNGKey(0))
    state, m = step_fn(state, jnp.asarray(seq["images_l"][1]), jnp.asarray(seq["images_r"][1]))
    assert float(m["t_norm"]) < 0.05
    np.testing.assert_allclose(np.asarray(state["T_wc"]), np.eye(4), atol=1e-5)


def test_frontend_init_reports_status():
    seq = synthetic.render_sequence(n_frames=2, h=256, w=384, fx=300.0)
    rp = seq["rig"]
    cam = Pinhole.create(rp["fx"], rp["fy"], rp["cx"], rp["cy"])
    rig = StereoRig.create(cam, cam, t_rl=[-rp["baseline"], 0, 0])
    cfg = frontend.VOConfig(mode="lk", height=256, width=384, max_features=512)
    init_fn, _ = frontend.make_frontend(cfg, rig)
    state = init_fn(jnp.asarray(seq["images_l"][0]), jnp.asarray(seq["images_r"][0]),
                    jax.random.PRNGKey(0))
    assert int(state["status"]) == frontend.TRACKING_GOOD
    # A blank image cannot initialize.
    blank = jnp.zeros((256, 384), jnp.float32)
    state2 = init_fn(blank, blank, jax.random.PRNGKey(0))
    assert int(state2["status"]) == frontend.INITING
