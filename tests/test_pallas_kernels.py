"""Pallas scan/gather kernels vs same-semantics oracles (interpret mode on
CPU; the same kernels compile for real on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lab_1806_vec_db_tpu.ops import distance as D
from lab_1806_vec_db_tpu.ops import pallas_gather as PG
from lab_1806_vec_db_tpu.ops import pallas_scan as PS


def _make(dist, n=3000, dim=48, b=8, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim)).astype(np.float32)
    qs = rng.standard_normal((b, dim)).astype(np.float32)
    return base, qs


@pytest.mark.parametrize("dist", ["l2sqr", "cosine"])
def test_scan_chunkmin_matches_oracle(dist):
    N, dim, B, r = 3000, 48, 8, 20
    base, qs = _make(dist, N, dim, B)
    base_d = jnp.asarray(base)
    cache = np.asarray(D.dist_cache(base_d, dist))
    qc = np.asarray(D.dist_cache(jnp.asarray(qs), dist))
    base_bf = base_d.astype(jnp.bfloat16)

    bd, bi = PS.scan_candidates_pallas(
        jnp.asarray(qs), base_bf, jnp.asarray(cache), jnp.int32(N), r, dist,
        interpret=True,
    )
    bd, bi = np.asarray(bd), np.asarray(bi)

    # oracle with identical arithmetic: bf16 inputs, f32 accum, chunk-min 128
    q_bf = np.asarray(jnp.asarray(qs).astype(jnp.bfloat16).astype(jnp.float32))
    b_bf = np.asarray(base_bf.astype(jnp.float32))
    dots = q_bf @ b_bf.T
    if dist == "l2sqr":
        dm = qc[:, None] + cache[None, :] - 2.0 * dots
    else:
        dm = 1.0 - dots / np.maximum(qc[:, None] * cache[None, :], 1e-10)
    n_pad = ((N + 1023) // 1024) * 1024
    dmp = np.full((B, n_pad), np.inf, np.float32)
    dmp[:, :N] = dm
    ch = dmp.reshape(B, n_pad // 128, 128)
    cmin, cargmin = ch.min(2), ch.argmin(2) + np.arange(n_pad // 128)[None] * 128
    order = np.argsort(cmin, axis=1, kind="stable")[:, :r]
    od = np.take_along_axis(cmin, order, axis=1)
    oi = np.take_along_axis(cargmin, order, axis=1)
    np.testing.assert_allclose(bd, od, rtol=1e-5, atol=1e-6)
    # ids equal except on exact distance ties
    assert not ((bi != oi) & ~np.isclose(bd, od, rtol=1e-6)).any()


@pytest.mark.parametrize("dist", ["l2sqr", "cosine"])
def test_gather_dists_and_rerank(dist):
    N, dim, B, r, k = 500, 70, 6, 16, 5
    base, qs = _make(dist, N, dim, B)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, N, size=(B, r)).astype(np.int32)
    ids[0, -1] = -1  # exercise padding

    base_rs = PG.prepare_rerank_base(jnp.asarray(base))
    gd = np.asarray(
        PG.gather_dists_rs(jnp.asarray(qs), base_rs, jnp.asarray(ids), dist, interpret=True)
    )
    if dist == "l2sqr":
        dm = ((qs[:, None, :] - base[None]) ** 2).sum(-1)
    else:
        dm = 1 - (qs @ base.T) / np.maximum(
            np.linalg.norm(qs, axis=1)[:, None] * np.linalg.norm(base, axis=1)[None],
            1e-10,
        )
    oracle = np.where(ids >= 0, np.take_along_axis(dm, np.maximum(ids, 0), axis=1), np.inf)
    np.testing.assert_allclose(gd, oracle, rtol=2e-4, atol=2e-5)

    bd, bi = PG.rerank_topk_rs(
        jnp.asarray(qs), base_rs, jnp.asarray(ids), k, dist, interpret=True
    )
    bd, bi = np.asarray(bd), np.asarray(bi)
    assert (np.diff(bd, axis=1) >= -1e-6).all()
    # top-1 of the candidate set must match the oracle's best candidate
    best = np.take_along_axis(dm, np.maximum(ids, 0), axis=1)
    best = np.where(ids >= 0, best, np.inf).min(1)
    np.testing.assert_allclose(bd[:, 0], best, rtol=2e-4)


def test_rerank_topk_blocked_matches_unblocked():
    rng = np.random.default_rng(2)
    N, dim, B, C, k = 400, 70, 5, 150, 8
    base = rng.standard_normal((N, dim)).astype(np.float32)
    qs = rng.standard_normal((B, dim)).astype(np.float32)
    ids = rng.permutation(N)[:C]  # unique candidates
    ids = np.broadcast_to(ids, (B, C)).astype(np.int32).copy()
    ids[0, -3:] = -1
    base_rs = PG.prepare_rerank_base(jnp.asarray(base))
    d1, i1 = PG.rerank_topk_rs(jnp.asarray(qs), base_rs, jnp.asarray(ids), k, "l2sqr", interpret=True)
    d2, i2 = PG.rerank_topk_blocked(
        jnp.asarray(qs), base_rs, jnp.asarray(ids), k, "l2sqr", block=64, interpret=True
    )
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


@pytest.mark.parametrize("dist", ["l2sqr", "cosine"])
def test_scan_dist_int8_matches_xla(dist):
    """The q-resident int8 Pallas scan must produce the same selection-grade
    distances as the XLA int8 path (ids may differ on bf16 ties)."""
    from lab_1806_vec_db_tpu.ops import topk as T

    N, dim, B, r = 3000, 48, 8, 16
    base, qs = _make(dist, N, dim, B)
    base_d = jnp.asarray(base)
    cache = D.dist_cache(base_d, dist)
    q8, sc = T.quantize_rows_int8(base_d)
    if dist == "cosine":  # XLA path uses the unified channel convention
        ch_scale = sc / jnp.maximum(cache, 1e-20)
        ch_cache = jnp.zeros_like(cache)
    else:
        ch_scale, ch_cache = sc, cache
    bd1, bi1 = T.scan_candidates_int8(
        jnp.asarray(qs), q8, ch_scale, ch_cache, jnp.int32(N), r, dist
    )
    # the legacy q-resident kernel keeps the raw (scale, |x|) contract
    bd2, bi2 = PS.scan_candidates_int8_pallas(
        jnp.asarray(qs), q8, sc, cache, jnp.int32(N), r, dist, interpret=True
    )
    np.testing.assert_allclose(np.asarray(bd1), np.asarray(bd2), rtol=2e-2, atol=1e-3)
    # ids agree wherever the bf16 distances are not NEAR-tied with a
    # neighbor (the two paths round the cosine epilogue differently —
    # folded-norm multiply vs division — so ranks may swap within the
    # selection-grade tolerance)
    bd1n, bi1n, bi2n = np.asarray(bd1), np.asarray(bi1), np.asarray(bi2)
    tol = 2e-2 * np.abs(bd1n) + 1e-3
    interior = (np.abs(bd1n - np.roll(bd1n, 1, axis=1)) > tol) & (
        np.abs(bd1n - np.roll(bd1n, -1, axis=1)) > tol
    )
    interior[:, [0, -1]] = False
    assert (bi1n == bi2n)[interior].all()


@pytest.mark.parametrize("dist", ["l2sqr", "cosine"])
def test_scan_packed_matches_oracle(dist):
    """The packed (dist-bits | row-in-chunk) kernel vs a numpy oracle of the
    identical f32 arithmetic on the dequantized int8 values: same survivors
    (modulo near-tie swaps at the rank-r boundary) and distances equal to the
    pack's 16-mantissa-bit truncation."""
    N, dim, B, r = 4200, 32, 8, 12
    base, qs = _make(dist, N, dim, B)
    from lab_1806_vec_db_tpu.ops import topk as T

    base_i8, scales = T.quantize_rows_int8(jnp.asarray(base))
    cache = D.dist_cache(jnp.asarray(base), dist)
    q8, q_scale = T.quantize_rows_int8(jnp.asarray(qs))
    qc = D.dist_cache(jnp.asarray(qs), dist)
    # base channels in the unified convention (store.device_int8 does this)
    if dist == "cosine":
        ch_scale = scales / jnp.maximum(cache, 1e-20)
        ch_cache = jnp.zeros_like(cache)
    else:
        ch_scale, ch_cache = scales, cache
    bd, bi = PS.scan_candidates_int8_packed(
        jnp.asarray(qs), base_i8, ch_scale, ch_cache, jnp.int32(N), r, dist,
        interpret=True,
    )
    bd, bi = np.asarray(bd), np.asarray(bi)

    dots = np.asarray(q8, np.float32) @ np.asarray(base_i8, np.float32).T
    dots *= np.asarray(q_scale)[:, None] * np.asarray(scales)[None, :]
    if dist == "l2sqr":
        dm = np.asarray(qc)[:, None] + np.asarray(cache)[None, :] - 2.0 * dots
    else:
        dm = 1.0 - dots / np.maximum(np.asarray(qc)[:, None] * np.asarray(cache)[None, :], 1e-10)
    dm = np.maximum(dm, 0.0)
    # oracle group-min survivors then top-r.  Survivor groups are STRIDED
    # within each NB-row grid chunk: survivor (g, s) = min over rows
    # {g*NB + level*SB + s, level=0..127} (see _scan_kernel_int8_packed).
    NB = PS._tiles_for(dim)[0]
    SB = NB // 128
    n_pad = ((N + NB - 1) // NB) * NB
    G = n_pad // NB
    dmp = np.full((B, n_pad), np.float32(3e38), np.float32)
    dmp[:, :N] = dm
    ch = dmp.reshape(B, G, 128, SB)  # axes: (query, chunk, level, slot)
    cmin = ch.min(2).reshape(B, G * SB)
    lvl = ch.argmin(2)  # (B, G, SB)
    ids4 = (
        np.arange(G)[None, :, None] * NB
        + lvl * SB
        + np.arange(SB)[None, None, :]
    )
    cargmin = ids4.reshape(B, G * SB)
    order = np.argsort(cmin, axis=1, kind="stable")[:, :r]
    oi = np.take_along_axis(cargmin, order, axis=1)
    od = np.take_along_axis(cmin, order, axis=1)

    overlap = np.mean([len(set(bi[i]) & set(oi[i])) / r for i in range(B)])
    assert overlap >= (r - 1) / r
    assert (bi[:, :3] == oi[:, :3]).all()
    # distances: packed truncation drops <= 127 ulp -> rel err <= ~2^-16
    match = bi == oi
    rel = np.abs(bd - od)[match] / np.maximum(od[match], 1e-3)
    assert rel.max() < 3e-5
    assert (bd >= 0).all()


@pytest.mark.parametrize("n_valid", [4200, 4096, 100])
def test_scan_packed_validity_boundary(n_valid):
    """Invalid rows must never be selected.  The kernel has NO positional
    masking: validity rides the cache channel as +BIG sentinels (the
    store.device_int8 contract), and the wrapper sentinels its own
    NB-alignment padding rows the same way."""
    N, dim, B, r = 4200, 32, 4, 12
    base, qs = _make("l2sqr", N, dim, B, seed=3)
    # make the tail rows the closest to every query: if the sentinels fail
    # to suppress them, they win every min
    base[n_valid:] = qs[0] if n_valid < N else base[n_valid:]
    from lab_1806_vec_db_tpu.ops import topk as T

    base_i8, scales = T.quantize_rows_int8(jnp.asarray(base))
    cache = D.dist_cache(jnp.asarray(base), "l2sqr")
    valid_rows = jnp.arange(N) < n_valid
    scales = jnp.where(valid_rows, scales, 0.0)
    cache = jnp.where(valid_rows, cache, jnp.float32(PS._BIG))
    bd, bi = PS.scan_candidates_int8_packed(
        jnp.asarray(qs), base_i8, scales, cache, jnp.int32(n_valid), r, "l2sqr",
        interpret=True,
    )
    bi = np.asarray(bi)
    valid = bi[bi >= 0]
    assert (valid < n_valid).all()


def test_gather_dists_bf16_slab():
    """bf16 row-slab rerank (memory-lean tier): distances match the f32
    oracle to bf16 input precision (~1e-2 relative)."""
    N, dim, B, r = 400, 70, 4, 12
    base, qs = _make("l2sqr", N, dim, B, seed=9)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, N, size=(B, r)).astype(np.int32)
    ids[1, 0] = -1

    base_rs = PG.prepare_rerank_base(jnp.asarray(base), dtype=jnp.bfloat16)
    assert base_rs.dtype == jnp.bfloat16
    gd = np.asarray(
        PG.gather_dists_rs(jnp.asarray(qs), base_rs, jnp.asarray(ids), "l2sqr", interpret=True)
    )
    dm = ((qs[:, None, :] - base[None]) ** 2).sum(-1)
    oracle = np.where(ids >= 0, np.take_along_axis(dm, np.maximum(ids, 0), axis=1), np.inf)
    finite = np.isfinite(oracle)
    np.testing.assert_allclose(gd[finite], oracle[finite], rtol=3e-2, atol=1e-2)
    assert np.isinf(gd[~finite]).all()


def test_scan_packed_blocked_channels_ab():
    """Both channel-operand variants of the packed scan (blocked vs (N,1)
    lane-padded) in ONE process via the set_blocked_channels seam
    (ADVICE r3 #4): identical survivors and distances."""
    import jax

    N, dim, B, r = 4200, 32, 8, 12
    base, qs = _make("l2sqr", N, dim, B)
    from lab_1806_vec_db_tpu.ops import topk as T

    base_i8, scales = T.quantize_rows_int8(jnp.asarray(base))
    cache = D.dist_cache(jnp.asarray(base), "l2sqr")
    prev = PS._BLOCKED_CHANNELS
    outs = {}
    try:
        for flag in (True, False):
            PS.set_blocked_channels(flag)
            jax.clear_caches()
            outs[flag] = PS.scan_candidates_int8_packed(
                jnp.asarray(qs), base_i8, scales, cache, jnp.int32(N), r,
                "l2sqr", interpret=True,
            )
    finally:
        PS.set_blocked_channels(prev)
        jax.clear_caches()
    np.testing.assert_array_equal(
        np.asarray(outs[True][1]), np.asarray(outs[False][1]))
    np.testing.assert_allclose(
        np.asarray(outs[True][0]), np.asarray(outs[False][0]),
        rtol=1e-6, atol=1e-7)
