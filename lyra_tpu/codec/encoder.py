"""Single-stream LyraEncoder facade with the reference API surface.

API parity target: `LyraEncoder::Create / Encode / set_bitrate`
(reference: lyra/lyra_encoder.{h,cc}).  Wraps the batched EncoderEngine at
batch size 1: resample → (DTX gate) → SoundStream → RVQ runs as one jitted
XLA program per 20 ms hop; index→byte packing is host-side.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from lyra_tpu import config, packet
from lyra_tpu.codec.engine import EncoderEngine


class LyraEncoder:
    def __init__(self, sample_rate_hz: int, num_channels: int = 1,
                 bitrate: int = 3200, enable_dtx: bool = False,
                 model_path: str = config.DEFAULT_MODEL_PATH,
                 mode: str = "float"):
        if num_channels != config.NUM_CHANNELS:
            raise ValueError(f"unsupported channel count {num_channels}")
        bits = config.bitrate_to_num_quantized_bits(bitrate)
        if bits < 0:
            raise ValueError(f"Bitrate {bitrate} bps is not supported by codec.")
        self._engine = EncoderEngine(
            sample_rate_hz, model_path, enable_dtx=enable_dtx, mode=mode)
        self._state = self._engine.init_state(1)
        self._num_quantized_bits = bits
        self._num_channels = num_channels

    def encode(self, audio: np.ndarray) -> Optional[bytes]:
        """One 20 ms hop of int16 samples → wire packet bytes.

        Returns b"" for DTX-suppressed noise hops (the reference's empty
        packet, lyra/lyra_encoder.cc:136-140) and None on invalid input.
        """
        audio = np.asarray(audio)
        if audio.shape != (self._engine.hop_samples,):
            return None
        indices, is_noise, state = self._engine.step(
            self._state, audio.astype(np.float32)[None],
            self._num_quantized_bits // config.BITS_PER_QUANTIZER)
        self._state = state
        if bool(np.asarray(is_noise)[0]):
            return b""
        return packet.pack_indices(
            np.asarray(indices)[0], self._num_quantized_bits)

    def set_bitrate(self, bitrate: int) -> bool:
        bits = config.bitrate_to_num_quantized_bits(bitrate)
        if bits < 0:
            return False
        self._num_quantized_bits = bits
        return True

    @property
    def sample_rate_hz(self) -> int:
        return self._engine.sample_rate_hz

    @property
    def num_channels(self) -> int:
        return self._num_channels

    @property
    def bitrate(self) -> int:
        return config.bitrate(self._num_quantized_bits)

    @property
    def frame_rate(self) -> int:
        return config.FRAME_RATE
