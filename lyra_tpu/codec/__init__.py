"""Codec core: reference-parity facades and the batched lockstep engines."""

from lyra_tpu.codec.decoder import LyraDecoder
from lyra_tpu.codec.encoder import LyraEncoder
from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine

__all__ = ["LyraDecoder", "LyraEncoder", "DecoderEngine", "EncoderEngine"]
