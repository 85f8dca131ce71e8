from . import se3, camera, triangulate, interp, pyramid, fast, select, lk, orb, match, pnp  # noqa: F401
