from .make_network import make_network

__all__ = ["make_network"]
