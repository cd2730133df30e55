"""Pallas TPU kernels (Mosaic): BN254-Fr Montgomery core, NTT butterflies,
eltwise modular FMA — see ``fieldmul.py``."""

from . import fieldmul  # noqa: F401
