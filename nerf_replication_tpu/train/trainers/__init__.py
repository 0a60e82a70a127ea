from . import img_fit, nerf  # noqa: F401 (registry side effects)
