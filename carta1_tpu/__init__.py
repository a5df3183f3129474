"""carta1_tpu -- a TPU-native ATRAC1 codec engine.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of the
aynik/carta1 JavaScript codec: WAV -> AEA encoding, AEA -> WAV decoding,
streaming and batched APIs, a CLI, and multi-host scaling over device meshes.

Engines:
  * "tpu"   -- batched JAX pipeline (frames are the batch axis); fast path.
  * "exact" -- vectorized NumPy oracle reproducing the reference JavaScript's
               arithmetic bit-for-bit (gold model).
"""

from carta1_tpu.constants import SAMPLE_RATE, SAMPLES_PER_FRAME, SOUND_UNIT_SIZE
from carta1_tpu.framedata import FrameData
from carta1_tpu.options import EncoderOptions

__version__ = "0.1.0"

__all__ = [
    "EncoderOptions",
    "FrameData",
    "SAMPLE_RATE",
    "SAMPLES_PER_FRAME",
    "SOUND_UNIT_SIZE",
    "__version__",
]
