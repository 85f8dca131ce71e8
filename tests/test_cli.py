"""CLI end-to-end: synthetic KITTI directory -> trajectory + ATE + plot."""
import os

import numpy as np
from PIL import Image

from stereo_visual_odometry_tpu.utils import synthetic, trajectory


def make_kitti_dir(tmp_path, n_frames=6, h=192, w=256):
    seq = synthetic.render_sequence(n_frames=n_frames, h=h, w=w, fx=300.0, speed=1.0)
    root = tmp_path / "seq00"
    (root / "image_0").mkdir(parents=True)
    (root / "image_1").mkdir()
    for i in range(n_frames):
        Image.fromarray(seq["images_l"][i].astype(np.uint8)).save(
            root / "image_0" / f"{i:06d}.png")
        Image.fromarray(seq["images_r"][i].astype(np.uint8)).save(
            root / "image_1" / f"{i:06d}.png")
    gt_file = tmp_path / "gt.txt"
    trajectory.save_kitti(str(gt_file), seq["poses_gt"])
    return root, gt_file, seq


def test_cli_runs_end_to_end(tmp_path, capsys):
    from stereo_visual_odometry_tpu import cli

    root, gt_file, seq = make_kitti_dir(tmp_path)
    yaml = tmp_path / "cfg.yaml"
    yaml.write_text("""%YAML:1.0
camera1.fx: 300.0
camera1.fy: 300.0
camera1.cx: 128.0
camera1.cy: 96.0
t_lr0: -0.54
track_mode: LK_stereof2f_pnp
nFeatures: 256
iterationsCount: 128
inlier_rate: 0.3
num_features_tracking: 8
""")
    out = tmp_path / "traj.txt"
    plot = tmp_path / "traj.png"
    rc = cli.main([str(yaml), "--dataset", str(root), "--out", str(out),
                   "--gt", str(gt_file), "--plot", str(plot)])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "fps=" in printed and "ATE=" in printed
    traj = trajectory.load_kitti(str(out))
    assert traj.shape[0] == 6
    ate = trajectory.ate_rmse(traj, seq["poses_gt"], align=False)
    assert ate < 0.5, ate
    assert os.path.getsize(plot) > 0


def test_cli_dump_overlays(tmp_path):
    """--dump-overlays writes the displayTracking-equivalent PNGs
    (``tracking.cpp:354-382``, offline)."""
    from stereo_visual_odometry_tpu import cli

    root, gt_file, seq = make_kitti_dir(tmp_path)
    yaml = tmp_path / "cfg.yaml"
    yaml.write_text("""%YAML:1.0
camera1.fx: 300.0
camera1.fy: 300.0
camera1.cx: 128.0
camera1.cy: 96.0
t_lr0: -0.54
track_mode: LK_stereof2f_pnp
nFeatures: 256
iterationsCount: 128
inlier_rate: 0.3
num_features_tracking: 8
""")
    ovl = tmp_path / "overlays"
    rc = cli.main([str(yaml), "--dataset", str(root),
                   "--dump-overlays", str(ovl), "--every", "2"])
    assert rc == 0
    pngs = sorted(os.listdir(ovl))
    assert len(pngs) >= 2, pngs
    assert all(p.startswith("tracks_") and p.endswith(".png") for p in pngs)
    assert all(os.path.getsize(ovl / p) > 0 for p in pngs)


LK_YAML = """%YAML:1.0
camera1.fx: 300.0
camera1.fy: 300.0
camera1.cx: 128.0
camera1.cy: 96.0
t_lr0: -0.54
track_mode: LK_stereof2f_pnp
nFeatures: 256
iterationsCount: 128
inlier_rate: 0.3
num_features_tracking: 8
"""


def test_cli_ba(tmp_path, capsys):
    """--ba runs config 3 (sliding-window BA backend) from the command line
    (VERDICT r4 next #8)."""
    from stereo_visual_odometry_tpu import cli

    root, gt_file, seq = make_kitti_dir(tmp_path, n_frames=10)
    yaml = tmp_path / "cfg.yaml"
    yaml.write_text(LK_YAML)
    out = tmp_path / "traj.txt"
    rc = cli.main([str(yaml), "--dataset", str(root), "--ba",
                   "--window", "4", "--kf-every", "2",
                   "--out", str(out), "--gt", str(gt_file)])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "ba:" in printed and "window solves" in printed
    traj = trajectory.load_kitti(str(out))
    assert traj.shape[0] == 10
    ate = trajectory.ate_rmse(traj, seq["poses_gt"], align=False)
    assert ate < 0.6, ate


def test_cli_chunked(tmp_path, capsys):
    """--chunked N runs the offline-throughput scan loop."""
    from stereo_visual_odometry_tpu import cli

    root, gt_file, seq = make_kitti_dir(tmp_path, n_frames=9)
    yaml = tmp_path / "cfg.yaml"
    yaml.write_text(LK_YAML)
    out = tmp_path / "traj.txt"
    rc = cli.main([str(yaml), "--dataset", str(root), "--chunked", "4",
                   "--out", str(out), "--gt", str(gt_file)])
    assert rc == 0
    assert "ATE=" in capsys.readouterr().out
    traj = trajectory.load_kitti(str(out))
    assert traj.shape[0] == 9
    ate = trajectory.ate_rmse(traj, seq["poses_gt"], align=False)
    assert ate < 0.5, ate


def test_cli_batch(tmp_path, capsys):
    """--batch runs config 4 (multi-sequence batched VO) with per-sequence
    ATE."""
    from stereo_visual_odometry_tpu import cli

    root1, gt1, _ = make_kitti_dir(tmp_path, n_frames=6)
    sub = tmp_path / "second"
    sub.mkdir()
    root2, gt2, _ = make_kitti_dir(sub, n_frames=6)
    yaml = tmp_path / "cfg.yaml"
    yaml.write_text(LK_YAML)
    out = tmp_path / "btraj"
    rc = cli.main([str(yaml), "--batch", str(root1), str(root2),
                   "--batch-gt", str(gt1), str(gt2), "--out", str(out)])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "sequences=2" in printed
    assert printed.count("ATE=") == 2
    for s in range(2):
        traj = trajectory.load_kitti(f"{out}.{s:02d}")
        assert traj.shape[0] == 6
