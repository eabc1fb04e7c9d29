"""Unit tests for lattice key packing and the Morton codec.

The reference never tested its Morton math (the only artifact is a broken
scratch file, src/variations/decode_morton.py); these are the tests it
should have had.
"""

import numpy as np
import jax.numpy as jnp

from nerfloam_tpu.ops import keys as K


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    coords = rng.integers(-(1 << 20), (1 << 20) - 2, size=(1000, 3)).astype(np.int32)
    hi, lo = K.pack(jnp.asarray(coords))
    back = K.unpack(hi, lo)
    np.testing.assert_array_equal(np.asarray(back), coords)


def test_pack_uniqueness():
    rng = np.random.default_rng(1)
    coords = rng.integers(-500, 500, size=(5000, 3)).astype(np.int32)
    uniq = np.unique(coords, axis=0)
    hi, lo = K.pack(jnp.asarray(uniq))
    packed = np.stack([np.asarray(hi), np.asarray(lo)], -1)
    assert len(np.unique(packed, axis=0)) == len(uniq)


def test_morton_roundtrip():
    rng = np.random.default_rng(2)
    coords = rng.integers(-(1 << 20), (1 << 20) - 1, size=(512, 3)).astype(np.int32)
    hi, lo = K.morton_encode(jnp.asarray(coords))
    back = K.morton_decode(hi, lo)
    np.testing.assert_array_equal(np.asarray(back), coords)


def test_morton_bit_layout():
    # x=1,y=0,z=0 -> bit 2; y=1 -> bit 1; z=1 -> bit 0 (utils.h layout),
    # relative to the code of the offset origin.
    base_h, base_l = K.morton_encode(jnp.asarray([[0, 0, 0]]))
    for axis, bit in [(0, 2), (1, 1), (2, 0)]:
        c = [0, 0, 0]
        c[axis] = 1
        # offset origin has all-zero low bits per axis, so +1 flips the
        # lowest interleaved bit for that axis
        hi, lo = K.morton_encode(jnp.asarray([c]))
        assert int(lo[0]) ^ int(base_l[0]) == (1 << bit)
        assert int(hi[0]) == int(base_h[0])


def test_lexsort_groups_duplicates():
    rng = np.random.default_rng(3)
    coords = rng.integers(-4, 4, size=(2000, 3)).astype(np.int32)
    hi, lo = K.pack(jnp.asarray(coords))
    order = np.asarray(K.lexsort_keys(hi, lo))
    s = np.stack([np.asarray(hi), np.asarray(lo)], -1)[order]
    # duplicates adjacent: count of boundaries == count of unique keys
    first = np.concatenate([[True], np.any(s[1:] != s[:-1], axis=-1)])
    assert first.sum() == len(np.unique(s, axis=0))


def test_invalid_sentinel_sorts_last():
    coords = jnp.asarray([[5, 5, 5], [1, 1, 1]], jnp.int32)
    hi, lo = K.pack(coords)
    hi = jnp.concatenate([hi, jnp.array([K.INVALID_HI])])
    lo = jnp.concatenate([lo, jnp.array([K.INVALID_LO])])
    order = np.asarray(K.lexsort_keys(hi, lo))
    assert order[-1] == 2
