"""Gold oracle: a NumPy implementation of the carta1 codec that reproduces the
reference JavaScript's arithmetic *exactly* (float64 compute, float32 rounding
at every typed-array store), vectorized over the frame axis.

This package serves three roles:
  1. Test oracle for the TPU (JAX) engine.
  2. Bit-exact decode engine (``engine="exact"`` in the public API): its
     decoded 16-bit PCM is bit-identical to aynik/carta1's decoder.
  3. Source of the exact f64 linear-transform basis matrices the TPU MDCT
     kernels are built from.
"""

from carta1_tpu.gold.encoder import encoder_init_state, gold_encode_frames
from carta1_tpu.gold.decoder import decoder_init_state, gold_decode_frames

__all__ = [
    "encoder_init_state",
    "gold_encode_frames",
    "decoder_init_state",
    "gold_decode_frames",
]
