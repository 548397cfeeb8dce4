from . import camera, sh, transforms  # noqa: F401
