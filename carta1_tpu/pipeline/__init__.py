"""TPU engine pipelines: jitted batched encode/decode over the frame axis."""

from carta1_tpu.jaxsetup import setup as _setup

_setup()

from carta1_tpu.pipeline.encoder import encode_frames, encoder_init_state
from carta1_tpu.pipeline.decoder import decode_frames, decoder_init_state

__all__ = [
    "encode_frames",
    "encoder_init_state",
    "decode_frames",
    "decoder_init_state",
]
