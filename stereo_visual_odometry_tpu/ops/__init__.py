from . import (camera, fast, interp, lk, lk_pallas, lk_pallas_v2, match, orb,
               patch_pallas, pnp, pyramid, se3, select, triangulate)  # noqa: F401
