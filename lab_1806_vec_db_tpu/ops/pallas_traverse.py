"""Single-kernel HNSW traversal: the WHOLE lock-step beam search in one
Pallas kernel.

Round-5 decomposition (DESIGN.md 9c) priced the multi-kernel lock-step
iteration at ~4 ms (B=1000, ef=120): ~2 of those 4 ms are kernel launches
and HBM round trips of the (B, W) state between the PRE kernel, the
DMA-gather distance kernel and the POST kernel, plus the while-loop's own
per-iteration overhead.  Here the traversal loop runs INSIDE one kernel:

- beam/ring state lives in VMEM scratch for the whole search (nothing
  crosses HBM between iterations);
- the per-iteration candidate ids are computed in the vector domain,
  copied VMEM->SMEM (a local DMA), and read back as SCALARS to drive the
  row DMAs directly — the same scalar-core issue loop as
  ops/pallas_gather.py, without leaving the kernel;
- links ride in a (N, 128) int32 row table with the node's OWN id in
  lane 0: the expansion fetches the 8-row aligned group containing the
  node's row and selects the right row by comparing lane 0 against the
  requested id (TPU DMA slices must be (8, 128)-tile aligned, so a
  single row cannot be fetched; the id-in-lane-0 trick turns the
  alignment constraint into a 1-of-8 vector select);
- dedup / novel-first compaction / bitonic merge / expansion select reuse
  the EXACT pure functions of the fused beam kernels
  (ops/pallas_beam.py:_dedup_compact/_merge_select/_ring_shift), so the
  semantics — including the shift-register visited ring — are the fused
  path's semantics, now in one kernel.

Grid = query tiles of BQ; each grid step runs its tile's entire
traversal.  The iteration loop is a fori_loop to the max_iters budget
with a convergence flag in SMEM: converged iterations skip all DMA issue
and all VPU work under @pl.when (the reference's termination rule — stop
when no beam entry is unexpanded — applied tile-wide).

Reference behavior: search_on_level_fn (hnsw_index.rs:258-291) +
check_candidate termination (candidate_pair.rs:55-57).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_beam import _dedup_compact, _merge_select, _ring_shift, _pow2

_WAVE = 32  # candidate-vector DMA wave width (per query)
_EL = 128   # neighbor-tile lanes; requires E * L == _EL


def _traverse_kernel(
    entry_ref,  # SMEM (BQ, 1) int32 — per-query entry node (post-descent)
    q_ref,      # VMEM (BQ, SR, 128) f32 — query slab tile
    base_rs,    # ANY (N*SR, 128) f32 — vector row slabs
    links_q,    # ANY (NL, 128) int32 — row i = [i, links(i)..., -1 pad]
    outd_ref,   # VMEM (BQ, W) f32
    outi_ref,   # VMEM (BQ, W) int32
    # scratch
    beam_d, beam_i, beam_e, ring,      # VMEM (BQ, W)x3 + (BQ, R)
    sel_v,                              # VMEM (BQ, 128) int32
    sel_s,                              # SMEM (BQ, 128) int32
    want_s,                             # SMEM (BQ * E, 1) int32
    want_v,                             # VMEM (BQ * E, 1) int32
    comp_v,                             # VMEM (BQ, W) int32 (SMEM staging)
    comp_s,                             # SMEM (BQ, W) int32
    cnt_v,                              # VMEM (BQ, 1) int32
    cnt_s,                              # SMEM (BQ, 1) int32
    flag_s,                             # SMEM (1, 1) int32
    lrows,                              # VMEM (BQ*E*8, 128) int32
    vrows,                              # VMEM (BQ*W*SR, 128) f32
    dma_sem, cp_sem,
    *, E: int, L: int, W: int, R: int, SR: int, ef: int,
    max_iters: int, dist: str,
):
    BQ = beam_d.shape[0]

    def to_smem(vref, sref):
        pltpu.make_async_copy(vref, sref, cp_sem).start()
        pltpu.make_async_copy(vref, sref, cp_sem).wait()

    def fetch_score(comp):
        """DMA the rows of `comp` (BQ, W; -1 padded, novel-first; already
        staged into comp_s with counts in cnt_s) -> exact (BQ, W) dists."""
        def issue(q, c):
            nw = (cnt_s[q, 0] + _WAVE - 1) // _WAVE

            def wave(w, cc):
                def one(j, ccc):
                    rid = jnp.maximum(comp_s[q, w * _WAVE + j], 0)
                    pltpu.make_async_copy(
                        base_rs.at[pl.ds(rid * SR, SR)],
                        vrows.at[pl.ds((q * W + w * _WAVE + j) * SR, SR)],
                        dma_sem,
                    ).start()
                    return ccc

                jax.lax.fori_loop(0, _WAVE, one, 0, unroll=_WAVE)
                return cc

            jax.lax.fori_loop(0, nw, wave, 0)
            return c

        def drain(q, c):
            nw = (cnt_s[q, 0] + _WAVE - 1) // _WAVE

            def wave(w, cc):
                sl = vrows.at[pl.ds((q * W + w * _WAVE) * SR, _WAVE * SR)]
                pltpu.make_async_copy(sl, sl, dma_sem).wait()
                return cc

            jax.lax.fori_loop(0, nw, wave, 0)
            return c

        jax.lax.fori_loop(0, BQ, issue, 0)
        jax.lax.fori_loop(0, BQ, drain, 0)

        rows4 = vrows[:].reshape(BQ, W, SR, 128).astype(jnp.float32)
        q4 = q_ref[:].reshape(BQ, 1, SR, 128)
        if dist == "l2sqr":
            diff = rows4 - q4
            d = jnp.sum(jnp.sum(diff * diff, axis=3), axis=2)
        else:
            dots = jnp.sum(jnp.sum(rows4 * q4, axis=3), axis=2)
            vn = jnp.sqrt(jnp.sum(jnp.sum(rows4 * rows4, axis=3), axis=2))
            qn = jnp.sqrt(jnp.sum(jnp.sum(q4 * q4, axis=3), axis=2))
            d = 1.0 - dots / jnp.maximum(vn * qn, 1e-10)
        return jnp.where(comp >= 0, d, jnp.inf)

    # ---- init: seed the beam with the scored entry point ----
    beam_d[:] = jnp.full((BQ, W), jnp.inf, jnp.float32)
    beam_i[:] = jnp.full((BQ, W), -1, jnp.int32)
    beam_e[:] = jnp.zeros((BQ, W), jnp.int32)
    ring[:] = jnp.full((BQ, R), -1, jnp.int32)
    cnt_v[:] = jnp.ones((BQ, 1), jnp.int32)
    to_smem(cnt_v, cnt_s)
    comp_v[:] = jnp.full((BQ, W), -1, jnp.int32)
    to_smem(comp_v, comp_s)

    def put_entry(q, c):
        comp_s[q, 0] = entry_ref[q, 0]
        return c

    jax.lax.fori_loop(0, BQ, put_entry, 0)
    # bring the entry ids back to the vector domain (lane-0 of comp)
    pltpu.make_async_copy(comp_s, comp_v, cp_sem).start()
    pltpu.make_async_copy(comp_s, comp_v, cp_sem).wait()
    comp0 = comp_v[:]

    nd0 = fetch_score(comp0)
    d_, i_, e_, sel = _merge_select(
        beam_d[:], beam_i[:], beam_e[:], nd0, comp0, ef=ef, E=E, W=W)
    beam_d[:], beam_i[:], beam_e[:] = d_, i_, e_
    sel_v[:] = sel

    # ---- main loop ----
    def body(it, carry):
        to_smem(sel_v, sel_s)

        def scan_flag(q, acc):
            m = sel_s[q, 0]
            for e in range(1, E):
                m = jnp.maximum(m, sel_s[q, e])
            return jnp.maximum(acc, m)

        any_sel = jax.lax.fori_loop(0, BQ, scan_flag, jnp.int32(-1))
        flag_s[0, 0] = jnp.where(any_sel >= 0, 1, 0).astype(jnp.int32)

        @pl.when(flag_s[0, 0] == 1)
        def _():
            # 1) links fetch: aligned 8-row group per (q, e) + want ids
            def issue_links(q, c):
                def one(e, cc):
                    rid = sel_s[q, e]
                    want_s[q * E + e, 0] = rid
                    base = (jnp.maximum(rid, 0) // 8) * 8
                    pltpu.make_async_copy(
                        links_q.at[pl.ds(base, 8)],
                        lrows.at[pl.ds((q * E + e) * 8, 8)],
                        dma_sem,
                    ).start()
                    return cc

                jax.lax.fori_loop(0, E, one, 0, unroll=E)
                return c

            jax.lax.fori_loop(0, BQ, issue_links, 0)
            sl = lrows.at[pl.ds(0, BQ * E * 8)]
            pltpu.make_async_copy(sl, sl, dma_sem).wait()
            pltpu.make_async_copy(want_s, want_v, cp_sem).start()
            pltpu.make_async_copy(want_s, want_v, cp_sem).wait()

            # 2) 1-of-8 row select by id match; lay E link blocks on lanes
            grp = lrows[:].reshape(BQ * E, 8, 128)
            want = jnp.broadcast_to(
                want_v[:].reshape(BQ * E, 1, 1), (BQ * E, 8, 1))
            hit = (grp[:, :, :1] == want) & (want >= 0)
            picked = jnp.max(jnp.where(hit, grp, jnp.int32(-1)), axis=1)
            picked3 = picked.reshape(BQ, E, 128)
            nbrs = jnp.full((BQ, _EL), -1, jnp.int32)
            lane_el = jax.lax.broadcasted_iota(jnp.int32, (BQ, _EL), 1)
            for e in range(E):
                blk = picked3[:, e, :]  # (BQ, 128); links at lanes 1..L
                rolled = pltpu.roll(blk, (e * L - 1) % 128, axis=1)
                window = (lane_el >= e * L) & (lane_el < e * L + L)
                nbrs = jnp.maximum(nbrs, jnp.where(window, rolled, -1))

            # 3) dedup + novel-first compaction (the fused-beam body)
            comp, count = _dedup_compact(nbrs, beam_i[:], ring[:], _EL, W)
            comp_v[:] = comp
            to_smem(comp_v, comp_s)
            cnt_v[:] = count
            to_smem(cnt_v, cnt_s)

            # 4) fetch + exact distances
            nd = fetch_score(comp)

            # 5) merge + next expansion select + ring update
            d_, i_, e_, sel = _merge_select(
                beam_d[:], beam_i[:], beam_e[:], nd, comp, ef=ef, E=E, W=W)
            ring[:] = _ring_shift(ring[:], sel_v[:], E)
            beam_d[:], beam_i[:], beam_e[:] = d_, i_, e_
            sel_v[:] = sel

        return carry

    jax.lax.fori_loop(0, max_iters, body, jnp.int32(0))
    outd_ref[:] = beam_d[:]
    outi_ref[:] = beam_i[:]


def pack_links(links0: jax.Array) -> jax.Array:
    """(N, L) int32 neighbor table -> (ceil(N/8)*8, 128) int32 traversal
    rows: lane 0 = the node's own id (the 1-of-8 select key), lanes
    1..L = links, rest -1."""
    N, L = links0.shape
    assert L <= 127
    npad = ((N + 7) // 8) * 8
    ids = jnp.arange(npad, dtype=jnp.int32)[:, None]
    body = jnp.full((npad, 127), -1, jnp.int32)
    body = body.at[:N, :L].set(links0)
    return jnp.concatenate([ids, body], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("ef", "E", "L", "R", "max_iters", "dist", "interpret",
                     "bq"),
)
def traverse(
    q: jax.Array,        # (B, dim) f32
    base_rs: jax.Array,  # (N*SR, 128) f32
    links_q: jax.Array,  # (NL, 128) int32 from pack_links
    entry: jax.Array,    # (B,) int32
    ef: int,
    L: int,
    E: int = 4,
    R: int = 256,
    max_iters: int = 92,
    dist: str = "l2sqr",
    interpret: bool = False,
    bq: int | None = None,
):
    """Whole-traversal kernel: ((B, ef) sorted dists, (B, ef) ids)."""
    from .pallas_gather import rerank_dim_pad

    assert E * L == _EL, (E, L)
    B, dim = q.shape
    dim_pad = rerank_dim_pad(dim)
    SR = dim_pad // 128
    W = _pow2(max(ef, _EL))
    if bq is None:
        # the candidate-row scratch is BQ*W*SR*512 B — size the query tile
        # to keep it ~32 MB of the ~100 MB scoped VMEM
        bq = max(16, min(64, (32 * 1024 * 1024) // (W * SR * 512)))
    BQ = bq
    bp = ((B + BQ - 1) // BQ) * BQ
    if bp != B:
        q = jnp.pad(q, ((0, bp - B), (0, 0)))
        entry = jnp.pad(entry, (0, bp - B), constant_values=-1)
    qs = q.astype(jnp.float32)
    if dim_pad != dim:
        qs = jnp.pad(qs, ((0, 0), (0, dim_pad - dim)))
    qs = qs.reshape(bp, SR, 128)

    kernel = functools.partial(
        _traverse_kernel, E=E, L=L, W=W, R=R, SR=SR, ef=ef,
        max_iters=max_iters, dist=dist,
    )
    outd, outi = pl.pallas_call(
        kernel,
        grid=(bp // BQ,),
        in_specs=[
            pl.BlockSpec((BQ, 1), lambda g: (g, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((BQ, SR, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((BQ, W), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BQ, W), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, W), jnp.float32),
            jax.ShapeDtypeStruct((bp, W), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((BQ, W), jnp.float32),
            pltpu.VMEM((BQ, W), jnp.int32),
            pltpu.VMEM((BQ, W), jnp.int32),
            pltpu.VMEM((BQ, R), jnp.int32),
            pltpu.VMEM((BQ, 128), jnp.int32),
            pltpu.SMEM((BQ, 128), jnp.int32),
            pltpu.SMEM((BQ * E, 1), jnp.int32),
            pltpu.VMEM((BQ * E, 1), jnp.int32),
            pltpu.VMEM((BQ, W), jnp.int32),
            pltpu.SMEM((BQ, W), jnp.int32),
            pltpu.VMEM((BQ, 1), jnp.int32),
            pltpu.SMEM((BQ, 1), jnp.int32),
            pltpu.SMEM((1, 1), jnp.int32),
            pltpu.VMEM((BQ * E * 8, 128), jnp.int32),
            # candidate-row scratch matches the slab dtype (the lean tier's
            # slab is bf16; DMA src/dst dtypes must agree), upcast at the
            # distance epilogue
            pltpu.VMEM((BQ * W * SR, 128), base_rs.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(entry.reshape(bp, 1), qs, base_rs, links_q)
    return outd[:B, :ef], outi[:B, :ef]
