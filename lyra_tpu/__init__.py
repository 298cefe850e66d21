"""lyra_tpu — a TPU-native (JAX/XLA/Pallas) low-bitrate neural speech codec framework.

Wire- and quality-compatible with the reference Lyra codec, re-architected for
TPU: batched multi-stream jitted kernels, explicit streaming state pytrees, and
mesh sharding over the stream axis.
"""

from lyra_tpu import config  # noqa: F401

__version__ = "0.1.0"
