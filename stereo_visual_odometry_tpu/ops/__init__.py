from . import (camera, fast, interp, lk, lk_pallas, match, orb,
               patch_pallas, pnp, pyramid, se3, select, triangulate)  # noqa: F401
