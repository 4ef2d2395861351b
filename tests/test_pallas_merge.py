"""Pallas bitonic beam-merge kernel vs the stable-top_k oracle.

The kernel (ops/pallas_merge.py) must reproduce ops/beam.py:_sorted_merge
bit-for-bit on every finite lane, including top_k's position-stable tie
order (ties break toward the existing beam).  Runs in interpret mode on
CPU; the same kernel compiles for real on TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lab_1806_vec_db_tpu.ops import pallas_merge as PM


def _oracle(beam_d, beam_i, beam_e, nd, nids, ef):
    all_d = jnp.concatenate([beam_d, nd], axis=1)
    all_i = jnp.concatenate([beam_i, nids], axis=1)
    all_e = jnp.concatenate([beam_e, jnp.zeros_like(nd, dtype=bool)], axis=1)
    neg, pos = jax.lax.top_k(-all_d, ef)
    return (
        -neg,
        jnp.take_along_axis(all_i, pos, axis=1),
        jnp.take_along_axis(all_e, pos, axis=1),
    )


def _make(rng, B, ef, EL, tie_frac=0.0, stale_frac=0.2, beam_fill=None):
    """A sorted ascending inf-padded beam + an unsorted candidate tile."""
    fill = ef if beam_fill is None else beam_fill
    bd = np.full((B, ef), np.inf, np.float32)
    bi = np.full((B, ef), -1, np.int32)
    be = np.zeros((B, ef), bool)
    vals = np.sort(rng.random((B, fill)).astype(np.float32), axis=1)
    bd[:, :fill] = vals
    bi[:, :fill] = rng.integers(0, 10_000, (B, fill))
    be[:, :fill] = rng.random((B, fill)) < 0.5

    nd = rng.random((B, EL)).astype(np.float32)
    nids = rng.integers(10_000, 20_000, (B, EL)).astype(np.int32)
    if tie_frac:
        # copy some beam distances into the tile to force cross-array ties,
        # and duplicate some tile lanes for intra-tile ties
        m = rng.random((B, EL)) < tie_frac
        src = rng.integers(0, fill, (B, EL))
        nd = np.where(m, np.take_along_axis(bd[:, :fill], src % fill, axis=1), nd)
        dup = rng.random((B, EL)) < tie_frac
        nd = np.where(dup, np.roll(nd, 1, axis=1), nd)
    stale = rng.random((B, EL)) < stale_frac
    nd = np.where(stale, np.inf, nd).astype(np.float32)
    nids = np.where(stale, -1, nids).astype(np.int32)
    return jnp.asarray(bd), jnp.asarray(bi), jnp.asarray(be), jnp.asarray(nd), jnp.asarray(nids)


def _check(args, ef):
    od, oi, oe = _oracle(*args, ef)
    kd, ki, ke = PM.merge_sorted(*args, interpret=True)
    od, oi, oe = np.asarray(od), np.asarray(oi), np.asarray(oe)
    kd, ki, ke = np.asarray(kd), np.asarray(ki), np.asarray(ke)
    np.testing.assert_array_equal(kd, od)
    fin = np.isfinite(od)
    np.testing.assert_array_equal(ki[fin], oi[fin])
    np.testing.assert_array_equal(ke[fin], oe[fin])


@pytest.mark.parametrize(
    "B,ef,EL",
    [
        (7, 120, 128),   # ef < 128 pad, B not a multiple of the grid block
        (3, 120, 512),   # tile wider than the beam (W = 512)
        (2, 200, 64),    # beam wider than the tile (W = 256)
        (130, 16, 16),   # two grid blocks, tiny widths
    ],
)
def test_merge_matches_topk(B, ef, EL):
    rng = np.random.default_rng(0)
    _check(_make(rng, B, ef, EL), ef)


def test_merge_tie_order_is_stable():
    """Cross-array and intra-tile distance ties break exactly as top_k."""
    rng = np.random.default_rng(1)
    _check(_make(rng, 9, 64, 128, tie_frac=0.4), 64)


def test_merge_partial_beam_and_all_stale_tile():
    rng = np.random.default_rng(2)
    # beam only half full; tile fully stale (converged query's wave)
    args = _make(rng, 5, 96, 128, stale_frac=1.0, beam_fill=48)
    _check(args, 96)
    # near-empty beam (only the entry point), fresh tile
    args = _make(rng, 5, 96, 128, stale_frac=0.0, beam_fill=1)
    _check(args, 96)
