from . import backbone  # noqa: F401
