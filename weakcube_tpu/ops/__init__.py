from . import rotations, cuboids, boxes  # noqa: F401
