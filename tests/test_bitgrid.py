"""BitGrid packing/access tests (C1/C2: VolumeRaytracer.cu:15-93)."""

import jax.numpy as jnp
import numpy as np

from voxelengine_tpu.core.bitgrid import (
    BitGrid,
    np_pack_bits,
    pack_bits,
    popcount32,
    unpack_bits,
)
from voxelengine_tpu.core.layout import Layout


def test_pack_unpack_roundtrip(rng):
    bits = rng.random(256) < 0.5
    words = pack_bits(jnp.asarray(bits))
    assert (np.asarray(unpack_bits(words)) == bits).all()
    assert (np.asarray(words) == np_pack_bits(bits)).all()


def test_bit_order_lsb_first():
    bits = np.zeros(32, bool)
    bits[0] = True
    bits[5] = True
    assert int(pack_bits(jnp.asarray(bits))[0]) == (1 | (1 << 5))


def test_popcount(rng):
    w = rng.integers(0, 2**32, size=64, dtype=np.uint32)
    expect = np.array([bin(v).count("1") for v in w])
    assert (np.asarray(popcount32(jnp.asarray(w))) == expect).all()


def test_dense_roundtrip_and_count(rng):
    for lay in Layout:
        dense = rng.random((16, 8, 24)) < 0.3  # [z,y,x]
        g = BitGrid.from_dense(dense, layout=lay)
        assert g.dims == (24, 8, 16)
        assert (np.asarray(g.to_dense()) == dense).all()
        assert int(g.count()) == int(dense.sum())


def test_get_bits_out_of_range_false(rng):
    dense = np.ones((8, 8, 8), bool)
    g = BitGrid.from_dense(dense)
    x = jnp.asarray([-1, 0, 8, 3])
    y = jnp.asarray([0, -5, 0, 3])
    z = jnp.asarray([0, 0, 9, 3])
    got = np.asarray(g.get_bits(x, y, z))
    assert (got == [False, False, False, True]).all()


def test_set_bits(rng):
    dense = rng.random((8, 8, 8)) < 0.5
    g = BitGrid.from_dense(dense)
    xs = jnp.asarray([0, 1, 2, 2])
    ys = jnp.asarray([0, 0, 4, 4])
    zs = jnp.asarray([0, 7, 5, 5])
    vals = jnp.asarray([True, False, True, False])  # duplicate: last wins
    g2 = g.set_bits(xs, ys, zs, vals)
    d2 = np.asarray(g2.to_dense())
    assert d2[0, 0, 0]
    assert not d2[7, 0, 1]
    assert not d2[5, 4, 2]
    # untouched voxels unchanged
    mask = np.ones_like(dense)
    mask[0, 0, 0] = mask[7, 0, 1] = mask[5, 4, 2] = False
    assert (d2[mask] == dense[mask]).all()
