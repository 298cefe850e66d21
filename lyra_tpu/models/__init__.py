"""Learned codec networks and the residual vector quantizer."""

from lyra_tpu.models.rvq import ResidualVectorQuantizer
from lyra_tpu.models.streaming import LyraGanModel, SoundStreamEncoder

__all__ = ["ResidualVectorQuantizer", "LyraGanModel", "SoundStreamEncoder"]
