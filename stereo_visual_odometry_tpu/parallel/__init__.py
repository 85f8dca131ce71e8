from . import mesh, sequences, dist_ba, evaluate  # noqa: F401
