from . import lie, masked  # noqa: F401
