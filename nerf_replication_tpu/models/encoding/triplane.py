"""Triplane / Motion2D encoders (reference triplane.py:8-102,
hashencoder/hashgrid.py:222-286). Implementations live in hashgrid.py —
they are thin compositions of the D-dimensional hash grid."""

from .hashgrid import Motion2DEncoder, TriPlaneEncoder

__all__ = ["TriPlaneEncoder", "Motion2DEncoder"]
