"""Measured-distortion RDO allocator (the default encoder allocator).

Pins the two contracts that justify replacing the reference's scale-factor
proxy: the bit-budget invariant (used + 40 + 10*52 <= 1696) and round-trip
quality strictly >= the reference heap on adversarial signal classes
(BASELINE: encode contract is PSNR >= reference, not bitstream equality).
"""

import numpy as np

from carta1_tpu.constants import CODEC_DELAY, SPECS_PER_BFU, WORD_LENGTH_BITS
from carta1_tpu.gold import gold_decode_frames, gold_encode_frames
from carta1_tpu.options import EncoderOptions
from carta1_tpu.pipeline.encoder import encode_frames

from signals import chirp, sine, white_noise


def _psnr(src, fd):
    out, _ = gold_decode_frames(fd)
    x = src.reshape(-1)[: out.size - CODEC_DELAY].astype(np.float64)
    y = np.asarray(out).reshape(-1)[CODEC_DELAY : CODEC_DELAY + len(x)].astype(np.float64)
    return 10 * np.log10(np.mean(x**2) / max(np.mean((x - y) ** 2), 1e-30))


def _frames(sig):
    n = len(sig)
    out = np.zeros((-(-n // 512) * 512,), np.float32)
    out[:n] = sig
    return out.reshape(-1, 512)


def _signals():
    n = 20 * 512
    burst = 0.05 * sine(440, length=n)
    burst[n // 2 : n // 2 + 256] += 0.7
    return {
        "chirp": (0.5 * chirp(50, 15000, length=n)).astype(np.float32),
        "noise": (0.3 * white_noise(5, n)).astype(np.float32),
        "burst": np.clip(burst, -1, 1).astype(np.float32),
        "multitone": (0.3 * sine(440, length=n) + 0.2 * sine(3000, length=n)).astype(np.float32),
    }


def test_budget_invariant():
    for sig in _signals().values():
        fd, _ = encode_frames(_frames(sig))
        wl = np.asarray(fd.word_lengths)
        used = (WORD_LENGTH_BITS[wl] * SPECS_PER_BFU[None, :]).sum(axis=1)
        assert (used + 40 + 10 * 52 <= 1696).all()
        assert (wl >= 0).all() and (wl <= 15).all()


def test_quality_beats_reference_heap():
    for name, sig in _signals().items():
        frames = _frames(sig)
        fd_heap, _ = gold_encode_frames(frames)
        fd_rdo, _ = encode_frames(frames)  # default allocator="rdo"
        p_heap, p_rdo = _psnr(frames, fd_heap), _psnr(frames, fd_rdo.to_numpy())
        assert p_rdo >= p_heap, (name, p_rdo, p_heap)


def test_reference_allocator_mode_matches_sweep():
    """allocator='reference' keeps the reference-comparable behavior."""
    from carta1_tpu.gold.coding import allocate_bits_sweep, find_scale_factors
    from carta1_tpu.constants import BFU_SLOT_MASK

    sig = _signals()["multitone"]
    frames = _frames(sig)
    fd, _ = encode_frames(frames, EncoderOptions(allocator="reference"))
    # recompute the sweep spec from the same scale factors
    want = allocate_bits_sweep(np.asarray(fd.scale_factors), SPECS_PER_BFU, 1.0)
    assert np.array_equal(np.asarray(fd.word_lengths), want)


def test_rdo_vectorized_matches_unrolled_formulation():
    """The r4 restructure (vmapped wl sweep, cummax hull, hoisted sf
    lookup) must produce the same word lengths as the original unrolled
    formulation, element for element — the in-test oracle below IS that
    original code."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from carta1_tpu import constants as C
    from carta1_tpu.ops.bitalloc import _NCAND, _SLOT_MASK_B, _sweep, allocate_bits_rdo
    from carta1_tpu.ops.coding import dequantize, quantize
    from carta1_tpu.ops.tables import RDO_CAND_BFU, RDO_CAND_COST, RDO_STEP_BITS

    rng = np.random.default_rng(11)
    nf = 48
    bfu = (rng.standard_normal((nf, 52, 20)) * 0.3).astype(np.float32)
    sf = rng.integers(0, 64, (nf, 52)).astype(np.int32)

    wl_new = np.asarray(allocate_bits_rdo(jnp.asarray(bfu), jnp.asarray(sf), 1.0))

    # --- original unrolled formulation (pre-r4), kept verbatim as oracle ---
    errs = []
    for wl in range(16):
        wla = jnp.full_like(jnp.asarray(sf), wl)
        deq = dequantize(quantize(jnp.asarray(bfu), jnp.asarray(sf), wla), jnp.asarray(sf), wla)
        d = jnp.where(_SLOT_MASK_B, jnp.asarray(bfu) - deq, 0.0)
        errs.append(jnp.sum(d * d, axis=-1))
    err = jnp.stack(errs, axis=-1)
    per_bit = jnp.asarray(
        1.0 / (np.asarray(RDO_STEP_BITS) * np.asarray(C.SPECS_PER_BFU)[:, None]).astype(np.float32)
    )
    slopes = (err[..., :-1] - err[..., 1:]) * per_bit[None]
    for i in range(13, -1, -1):
        slopes = slopes.at[..., i].set(jnp.maximum(slopes[..., i], slopes[..., i + 1]))
    prio = slopes.reshape(nf, _NCAND)
    valid = jnp.repeat(jnp.asarray(sf) > 0, 15, axis=1) & (prio > 0)
    key = jnp.where(
        valid, -lax.bitcast_convert_type(jnp.maximum(prio, 0.0), jnp.int32), jnp.int32(2**31 - 1)
    )
    payload = jnp.broadcast_to(
        jnp.asarray((np.asarray(RDO_CAND_BFU) << 13) | (np.asarray(RDO_CAND_COST) << 1))[None, :]
        | valid.astype(jnp.int32),
        key.shape,
    )
    s_key, s_payload = lax.sort((key, payload), dimension=-1, is_stable=True, num_keys=1)
    s_bfu = (s_payload >> 13) & 0x3F
    s_valid = (s_payload & 1) == 1
    s_cost = jnp.where(s_valid, (s_payload >> 1) & 0xFFF, 0)
    wl_old = np.asarray(_sweep(s_bfu, s_cost, s_valid, jnp.asarray(sf)[:, 0]))

    assert np.array_equal(wl_new, wl_old)
