from . import blender  # noqa: F401
