"""stereo_visual_odometry_tpu — a TPU-native stereo visual odometry framework.

Built from scratch in JAX/XLA/Pallas with the full capability surface of the
reference C++/OpenCV pipeline (liuzhenboo/Stereo-Visual-Odometry, mounted at
/root/reference): KITTI stereo ingestion, FAST and pyramidal ORB detection,
4-way circular pyramidal LK optical flow, brute-force Hamming matching, stereo
triangulation, RANSAC-PnP with motion gating, trajectory accumulation — plus
the backend the reference only stubbed: sliding-window bundle adjustment with
Schur complement, scaled over device meshes.

Layout:
  ops/       batched geometry + vision kernels (JAX/XLA + Pallas)
  models/    per-frame VO pipelines, tracking state machine, BA backend
  parallel/  mesh/sharding: multi-sequence VO, distributed BA collectives
  utils/     config, KITTI IO, trajectory/ATE-RPE, synthetic data, viz
  native/    C++ runtime pieces (threaded image prefetch loader)
"""

__version__ = "0.1.0"

from . import ops, models, parallel, utils  # noqa: F401
