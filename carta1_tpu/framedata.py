"""Uniform array-of-structs frame representation shared by every engine.

The reference passes per-frame dicts with ragged Int32Array lists
(encoder.js:398-404).  The TPU-native representation is dense and batched:
fixed [F, 52, 20] slots with masks, so every engine (gold NumPy, JAX) and the
serializer operate on the same arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.tree_util
import numpy as np

from carta1_tpu.constants import MAX_BFU_SIZE, NUM_BFUS


@dataclasses.dataclass
class FrameData:
    """Batched encoded-frame fields.

    n_bfu        : int32 [F]      number of active BFUs (encoder emits 52)
    block_modes  : int32 [F, 3]   0 = long; 2 (bands 0/1) / 3 (band 2) = short
    scale_factors: int32 [F, 52]  scale factor indices
    word_lengths : int32 [F, 52]  word length indices
    quantized    : int32 [F, 52, 20]  quantized coefficients (padding slots 0)
    """

    n_bfu: Any
    block_modes: Any
    scale_factors: Any
    word_lengths: Any
    quantized: Any

    @property
    def num_frames(self) -> int:
        return int(self.n_bfu.shape[0])

    def __getitem__(self, sl) -> "FrameData":
        return FrameData(
            n_bfu=self.n_bfu[sl],
            block_modes=self.block_modes[sl],
            scale_factors=self.scale_factors[sl],
            word_lengths=self.word_lengths[sl],
            quantized=self.quantized[sl],
        )

    def to_numpy(self) -> "FrameData":
        return FrameData(*(np.asarray(x) for x in dataclasses.astuple(self)))

    @staticmethod
    def zeros(num_frames: int) -> "FrameData":
        """Silent frames (the reference's dummy frame, processor.js:278-286,
        serializes like an all-zero 52-BFU frame decodes: nBfu=0 -> silence)."""
        return FrameData(
            n_bfu=np.zeros(num_frames, dtype=np.int32),
            block_modes=np.zeros((num_frames, 3), dtype=np.int32),
            scale_factors=np.zeros((num_frames, NUM_BFUS), dtype=np.int32),
            word_lengths=np.zeros((num_frames, NUM_BFUS), dtype=np.int32),
            quantized=np.zeros((num_frames, NUM_BFUS, MAX_BFU_SIZE), dtype=np.int32),
        )

    @staticmethod
    def fields() -> tuple[str, ...]:
        return ("n_bfu", "block_modes", "scale_factors", "word_lengths", "quantized")

    @staticmethod
    def concatenate(parts: list["FrameData"]) -> "FrameData":
        return FrameData(
            n_bfu=np.concatenate([p.n_bfu for p in parts]),
            block_modes=np.concatenate([p.block_modes for p in parts]),
            scale_factors=np.concatenate([p.scale_factors for p in parts]),
            word_lengths=np.concatenate([p.word_lengths for p in parts]),
            quantized=np.concatenate([p.quantized for p in parts]),
        )


jax.tree_util.register_pytree_node(
    FrameData,
    lambda fd: ((fd.n_bfu, fd.block_modes, fd.scale_factors, fd.word_lengths, fd.quantized), None),
    lambda _, children: FrameData(*children),
)
