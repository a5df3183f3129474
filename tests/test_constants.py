"""Table invariants (parity: tests/constants.test.js)."""

import numpy as np

from carta1_tpu import constants as C


def test_specs_per_bfu_sums_to_512():
    assert C.SPECS_PER_BFU.sum() == 512
    assert len(C.SPECS_PER_BFU) == C.NUM_BFUS


def test_bfu_start_long_is_prefix_sum():
    assert np.array_equal(
        C.BFU_START_LONG,
        np.concatenate([[0], np.cumsum(C.SPECS_PER_BFU)[:-1]]),
    )


def test_scale_factor_law():
    i = np.arange(64)
    np.testing.assert_allclose(C.SCALE_FACTORS, 2.0 ** (i / 3.0 - 21.0), rtol=0)


def test_window_short_law():
    i = np.arange(32)
    np.testing.assert_allclose(C.WINDOW_SHORT, np.sin((i + 0.5) * np.pi / 64.0), rtol=0)


def test_qmf_window_symmetry():
    assert np.array_equal(C.QMF_WINDOW, C.QMF_WINDOW[::-1])
    assert np.array_equal(C.QMF_EVEN, C.QMF_WINDOW[0::2])
    assert np.array_equal(C.QMF_ODD, C.QMF_WINDOW[1::2])


def test_word_length_bits_table():
    assert list(C.WORD_LENGTH_BITS) == [0] + list(range(2, 17))


def test_bfu_band_mapping():
    assert list(C.BFU_BAND[:20]) == [0] * 20
    assert list(C.BFU_BAND[20:36]) == [1] * 16
    assert list(C.BFU_BAND[36:]) == [2] * 16


def test_bfu_gather_indices_complete():
    """Every in-band BFU slot maps to a unique coefficient; no table entry
    crosses its band (so gather and scatter are exact inverses)."""
    for mode in range(2):
        g = C.BFU_GATHER_IDX[mode]
        valid = g >= 0
        # within each mode all valid targets are distinct and cover 512
        targets = g[valid]
        assert len(np.unique(targets)) == len(targets) == 512
        # slot validity == size mask (no band-crossing BFU in these tables)
        assert np.array_equal(valid, C.BFU_SLOT_MASK)
        # scatter is the inverse of gather
        s = C.BFU_SCATTER_IDX[mode]
        bfu, k = np.divmod(s[s >= 0], C.MAX_BFU_SIZE)
        assert np.array_equal(g[bfu, k], np.where(s >= 0)[0])


def test_frame_budget_constants():
    assert C.FRAME_BITS == 1696
    assert C.SOUND_UNIT_SIZE == 212
    assert C.FRAME_BITS - C.FRAME_OVERHEAD_BITS - C.NUM_BFUS * C.BITS_PER_BFU_METADATA == 1136
