"""carta1_tpu -- a TPU-native ATRAC1 codec engine.

A from-scratch JAX/XLA implementation with the capabilities of the
aynik/carta1 JavaScript codec: WAV -> AEA encoding, AEA -> WAV decoding,
streaming and batched APIs, a CLI, and multi-host scaling over device
meshes.

Engines:
  * "tpu"   -- batched JAX pipeline (frames are the batch axis); fast path.
  * "exact" -- vectorized NumPy oracle reproducing the reference
               JavaScript's arithmetic bit-for-bit (gold model).

Public surface (parity: codec/index.js:26-45 -- same concepts, batched):
  encode_frames / decode_frames      batched codec (pipeline/)
  encoder_init_state / decoder_...   stream-state pytrees (BufferPool role)
  pack_frames / unpack_frames        sound-unit serialization (host)
  EncoderOptions, FrameData
  processor: encode_file/decode_file/encode_pcm/decode_units
  parallel: encode_frames_sharded/decode_frames_sharded, transcode_corpus
"""

from carta1_tpu.constants import (
    SAMPLE_RATE,
    SAMPLES_PER_FRAME,
    SOUND_UNIT_SIZE,
    CODEC_DELAY,
)
from carta1_tpu.framedata import FrameData
from carta1_tpu.options import EncoderOptions


def __getattr__(name):
    """Lazy re-exports so `import carta1_tpu` stays light (no JAX init)."""
    if name in ("encode_frames", "decode_frames", "encoder_init_state", "decoder_init_state"):
        import carta1_tpu.pipeline as pipeline

        return getattr(pipeline, name)
    if name in ("pack_frames", "unpack_frames"):
        from carta1_tpu.io import bitstream_np

        return getattr(bitstream_np, name + "_fast")
    if name in ("encode_file", "decode_file", "encode_pcm", "decode_units"):
        import carta1_tpu.processor as processor

        return getattr(processor, name)
    if name in ("encode_frames_sharded", "decode_frames_sharded", "make_mesh"):
        import carta1_tpu.parallel as parallel

        return getattr(parallel, name)
    if name == "transcode_corpus":
        from carta1_tpu.parallel.corpus import transcode_corpus

        return transcode_corpus
    raise AttributeError(f"module 'carta1_tpu' has no attribute '{name}'")


__version__ = "0.1.0"

__all__ = [
    "EncoderOptions",
    "FrameData",
    "SAMPLE_RATE",
    "SAMPLES_PER_FRAME",
    "SOUND_UNIT_SIZE",
    "CODEC_DELAY",
    "encode_frames",
    "decode_frames",
    "encoder_init_state",
    "decoder_init_state",
    "pack_frames",
    "unpack_frames",
    "encode_file",
    "decode_file",
    "encode_pcm",
    "decode_units",
    "encode_frames_sharded",
    "decode_frames_sharded",
    "make_mesh",
    "transcode_corpus",
    "__version__",
]
