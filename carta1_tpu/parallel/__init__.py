from carta1_tpu.parallel.sharding import (
    decode_frames_sharded,
    encode_frames_sharded,
    make_mesh,
)

__all__ = ["encode_frames_sharded", "decode_frames_sharded", "make_mesh"]
