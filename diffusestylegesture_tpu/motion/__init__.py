from . import quat, txform  # noqa: F401
