from . import audit  # noqa: F401
