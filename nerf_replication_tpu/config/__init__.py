"""Config package.

``from nerf_replication_tpu.config import cfg, args`` mirrors the
reference's ``from src.config import cfg, args`` (src/config/__init__.py:1)
but is lazy: the module-level ``cfg`` is only materialised when a CLI
entrypoint calls :func:`init_global_cfg`. Library code should take ``cfg``
as a parameter.
"""

from .cfg_node import CN
from .config import default_cfg, load_cfg_tree, make_cfg, make_parser, parse_args, parse_cfg

cfg = None
args = None


def init_global_cfg(argv=None):
    """Parse CLI args and build the global cfg (entrypoint use only)."""
    global cfg, args
    args = parse_args(argv)
    cfg = make_cfg(args)
    return cfg, args


__all__ = [
    "CN", "cfg", "args", "default_cfg", "load_cfg_tree", "make_cfg",
    "make_parser", "parse_args", "parse_cfg", "init_global_cfg",
]
