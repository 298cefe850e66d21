"""lyra_tpu — a TPU-native (JAX/XLA/Pallas) low-bitrate neural speech codec framework.

Wire- and quality-compatible with the reference Lyra codec, re-architected for
TPU: batched multi-stream jitted kernels, explicit streaming state pytrees, and
mesh sharding over the stream axis.
"""

import os as _os

if _os.environ.get("LYRA_TPU_PLATFORM"):
    # Deployment images may pin jax to an accelerator programmatically at
    # interpreter start; this knob lets CLIs/tests re-route (e.g. to "cpu")
    # before any backend is initialized.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["LYRA_TPU_PLATFORM"])

from lyra_tpu import config  # noqa: F401

__version__ = "0.1.0"
