from . import (config, checkpoint, kitti, logging, profiling, synthetic,
               trajectory, viz)  # noqa: F401
