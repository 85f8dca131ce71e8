from . import frontend, system, backend, ba, online  # noqa: F401
