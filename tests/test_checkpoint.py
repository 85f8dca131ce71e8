"""Checkpoint/resume: a resumed run must continue bit-identically."""
import numpy as np
import jax.numpy as jnp

from stereo_visual_odometry_tpu.models.frontend import VOConfig
from stereo_visual_odometry_tpu.models.system import System
from stereo_visual_odometry_tpu.models.backend import BackendConfig
from stereo_visual_odometry_tpu.utils import checkpoint, synthetic
from stereo_visual_odometry_tpu.utils.config import CameraConfig, RunConfig


def _mk(seq):
    rp = seq["rig"]
    cfg = RunConfig(camera=CameraConfig(fx=rp["fx"], fy=rp["fy"], cx=rp["cx"],
                                        cy=rp["cy"], baseline=rp["baseline"]),
                    vo=VOConfig(mode="lk", height=192, width=256,
                                max_features=256, num_hypotheses=128,
                                min_features_track=8, min_inlier_rate=0.3,
                                persistent_tracks=True))
    return System(cfg, backend_cfg=BackendConfig(window=3, kf_every=2,
                                                 max_landmarks=128,
                                                 max_obs=1024, ba_iters=4))


def test_checkpoint_resume_exact(tmp_path):
    seq = synthetic.render_sequence(n_frames=8, h=192, w=256, fx=300.0, speed=1.0)
    frames = list(zip(seq["images_l"], seq["images_r"]))

    # Reference run: all 8 frames straight through.
    s_full = _mk(seq)
    for il, ir in frames:
        s_full.step(il, ir)

    # Checkpointed run: 4 frames, save, fresh system, load, 4 more.
    s_a = _mk(seq)
    for il, ir in frames[:4]:
        s_a.step(il, ir)
    ckpt = str(tmp_path / "state.npz")
    checkpoint.save(ckpt, s_a)

    s_b = _mk(seq)
    s_b.step(*frames[0])  # builds the state structure
    checkpoint.load(ckpt, s_b)
    s_b.poses = s_b.poses[:4]
    for il, ir in frames[4:]:
        s_b.step(il, ir)

    np.testing.assert_allclose(np.stack(s_b.poses), np.stack(s_full.poses),
                               atol=1e-5)
    assert len(s_b.backend.kf_poses) == len(s_full.backend.kf_poses)
