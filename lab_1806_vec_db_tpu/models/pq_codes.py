"""PQ codes-resident index: serve kNN from PQ codes alone.

The scale tier the reference's PQ design points at (src/distance/pq_table.rs:19-34:
codes are the *resident* representation, 160 B/row at the flagship m=320
4-bit config, vs 3.84 KB/row f32): one chip holds 10M+ rows of codes where
the lean tier (~3 KB/row int8 mirror + bf16 slab, models/store.py) caps out
near 4-5M and the full f32 tier near 1M.

Search is a three-stage device pipeline (every stage MXU one-hot based,
ops/pallas_adc.py):

  stage 0  coarse ADC chunk-min scan over a SMALL side table (m≈24-40
           groups, ~12-20 B/row) -> top-c0 candidate pool per query.
           Wide-row selection uses approx_min_k(recall_target=0.95) — the
           pool is 5-20x the final ef, so the 5% per-candidate loss is
           noise.
  stage 1  main-table ADC (m=320) on the pooled candidates
           (adc_dists_for_ids) -> top-ef.
  refine   exact f32 distances by regenerating ONLY the base-row blocks
           that hold finalists (the lean tier's block-regeneration
           discipline, models/store.py:exact_rows) -> exact top-k.
           With a jit-traceable ingest generator the whole refine is ONE
           device program (lax.scan over blocks, candidates pre-sorted by
           block so each block gathers a bounded contiguous id slice); a
           host fill falls back to one dispatch per touched block.

Both code tables live on device under one fixed seeded permutation (the
chunk-min survivor statistics need de-clustered storage order, see
adc_scan_chunkmin); stage-1 id-gathers go through the inverse permutation.

Parity anchors: FlatIndex::knn_pq (flat_index.rs:84-104) is the same
ADC-then-exact-rerank contract; the reference has no beyond-RAM tier (its
codes and vectors both live in process memory) — this class is the
TPU-native scale story SURVEY.md §5/§7 calls for.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import pq as P
from ..ops import topk as T
from ..utils.config import PQConfig
from .pq_table import PQTable

_BLOCK = 131072


@partial(jax.jit, static_argnames=("dist",), donate_argnums=(0,))
def _pack_scatter_jit(dev_codes, block_f32, inv_rows, gidx, gmask, cb, dist):
    """Encode one f32 block (already in the table's training space) and
    scatter its PACKED code rows to permuted slots.
    dev_codes: (cap, ceil(m/2)) uint8, DONATED so the 77-block ingest loop
    updates in place instead of copying the whole table per block (1.6 GB
    at 10M); inv_rows: (rows,) int32 slots."""
    grouped = P.regroup(block_f32, gidx, gmask)
    codes = P.encode(grouped, cb, dist)  # (rows, m) uint8
    if codes.shape[1] % 2:
        codes = jnp.pad(codes, ((0, 0), (0, 1)))
    packed = (codes[:, 0::2] | (codes[:, 1::2] << 4)).astype(jnp.uint8)
    return dev_codes.at[inv_rows].set(packed)


@partial(jax.jit, static_argnames=("dim", "block_rows", "n_blocks", "S", "cos", "draw"))
def _refine_traced_jit(params, key, sorted_ids, sorted_q, starts, q, *,
                       dim, block_rows, n_blocks, S, cos, draw):
    """Exact f32 distances for block-sorted candidate ids in ONE program.

    sorted_ids: (Np + S,) int32 candidate BASE ids ascending, invalid
    candidates mapped to a HUGE sentinel so they sort (and stay) at the
    tail — the +S tail padding means every dynamic_slice below fits without
    clamping (jax clamps oversized slice starts, and a clamped ids window
    paired with an unclamped update window writes distances at the wrong
    positions).  sorted_q: (Np + S,) int32 owning query per candidate;
    starts: (n_blocks,) int32 = first sorted position of each block's
    candidates.  Each scan step regenerates one block and resolves the
    S-candidate slice at its start (S is a static cap sized for iid
    candidate ids; spill past S keeps +inf — CALLERS must substitute the
    ADC distance for non-finite entries so clustered candidate sets
    degrade to ADC ordering instead of dropping rows).  Returns (Np,)
    f32 distances in sorted order."""
    Np = sorted_ids.shape[0] - S

    def body(dist_acc, b):
        row0 = b * block_rows
        v = draw(jax.random.fold_in(key, row0), params, block_rows)
        s0 = starts[b]
        ids_s = jax.lax.dynamic_slice(sorted_ids, (s0,), (S,))
        q_s = jax.lax.dynamic_slice(sorted_q, (s0,), (S,))
        local = ids_s - row0
        hit = (local >= 0) & (local < block_rows)
        rows = v[jnp.where(hit, local, 0)]  # (S, dim)
        qr = q[jnp.maximum(q_s, 0)]  # (S, dim)
        if cos:
            dots = jnp.sum(rows * qr, axis=-1)
            d = 1.0 - dots / jnp.maximum(
                jnp.linalg.norm(rows, axis=-1) * jnp.linalg.norm(qr, axis=-1),
                1e-10,
            )
        else:
            diff = rows - qr
            d = jnp.sum(diff * diff, axis=-1)
        cur = jax.lax.dynamic_slice(dist_acc, (s0,), (S,))
        dist_acc = jax.lax.dynamic_update_slice(
            dist_acc, jnp.where(hit, d, cur), (s0,)
        )
        return dist_acc, None

    init = jnp.full((Np + S,), jnp.inf, jnp.float32)  # +S: slice overrun room
    out, _ = jax.lax.scan(body, init, jnp.arange(n_blocks, dtype=jnp.int32))
    return out[:Np]


@partial(jax.jit, static_argnames=("cos", "draw_rows"))
def _refine_rows_jit(params, key, ids, q, *, cos, draw_rows):
    """Exact f32 distances for (B, ef) candidate ids via the
    ROW-ADDRESSABLE generator: regenerate exactly the candidate rows (one
    vmapped per-row-key draw) instead of scanning every block — at 10M the
    block scan regenerated the whole dataset per batch (~540 ms of RNG+GEMM
    for ~260k needed rows)."""
    B, ef = ids.shape
    flat = ids.reshape(-1)
    rows = draw_rows(params, key, jnp.maximum(flat, 0))  # (B*ef, dim)
    qr = q[(jnp.arange(B * ef, dtype=jnp.int32) // ef)]
    if cos:
        dots = jnp.sum(rows * qr, axis=-1)
        d = 1.0 - dots / jnp.maximum(
            jnp.linalg.norm(rows, axis=-1) * jnp.linalg.norm(qr, axis=-1),
            1e-10)
    else:
        diff = rows - qr
        d = jnp.sum(diff * diff, axis=-1)
    return jnp.where(flat >= 0, d, jnp.inf).reshape(B, ef)


class PQCodesIndex:
    """Codes-resident kNN index (see module docstring)."""

    def __init__(self, pq: PQTable, coarse: PQTable, n: int, dim: int, dist: str,
                 fill=None, traced_gen=None, row_gen=None,
                 block_rows: int = _BLOCK):
        self.pq = pq
        self.coarse = coarse
        self.n = int(n)
        self.dim = int(dim)
        self.dist = dist
        self._fill = fill
        self._gen = traced_gen  # (draw, params, key) block-keyed generator
        self._row_gen = row_gen  # (draw_rows, params, key) row-addressable
        self._block_rows = int(block_rows)
        self._codes: jax.Array | None = None  # (cap, ceil(m/2)) uint8 PERMUTED
        # coarse codes live TRANSPOSED at rest — (ceil(mc/2), cap) — when
        # `_codes_c_is_t`: the coarse cw (12-20 bytes at m_c=24-40) on the
        # int8 LANE axis pads to 128 B/row (6-10x HBM for the stage-0 scan
        # that reads every row every batch); on sublanes it pads only to 32.
        # The MAIN codes stay row-major: they are consumed by per-candidate
        # row gathers (adc_dists_for_ids), which need rows on lanes.
        self._codes_c: jax.Array | None = None  # coarse, same permutation
        self._codes_c_is_t = False
        self._perm: jax.Array | None = None
        self._inv: jax.Array | None = None

    # ---- build ----
    @classmethod
    def build_from_fill(
        cls,
        fill,
        n: int,
        dim: int,
        dist: str,
        pq_config: PQConfig | None = None,
        coarse_m: int = 32,
        sample_rows: int = 25_000,
        seed: int = 0,
        block_rows: int = _BLOCK,
        traced_gen=None,
        row_gen=None,
        progress=None,
    ) -> "PQCodesIndex":
        """Stream `fill(row0, rows) -> (rows, dim) f32 device block`; train
        both PQ tables on a strided multi-block sample, then encode every
        block into permuted packed device codes and DISCARD the f32 rows.
        Device cost per row: ceil(m/2) + ceil(coarse_m/2) + 8 bytes."""
        if pq_config is None:
            pq_config = PQConfig(n_bits=4, m=320, dist=dist,
                                 k_means_size=sample_rows)
        if pq_config.n_bits != 4:
            raise ValueError("the codes tier serves 4-bit (packed) tables")
        n_blocks = -(-n // block_rows)
        sample_blocks = sorted(set(
            int(b) for b in np.linspace(0, n_blocks - 1, min(8, n_blocks))
        ))
        per = -(-sample_rows // len(sample_blocks))
        parts = []
        for b in sample_blocks:
            row0 = b * block_rows
            rows = min(block_rows, n - row0)
            v = fill(row0, rows)
            step = max(1, rows // per)
            parts.append(v[::step][:per])
            del v
        sample = jnp.concatenate(parts, axis=0)[:sample_rows]
        del parts

        pq = PQTable.train(sample, pq_config, seed=seed)
        # the coarse table always trains under the distance-preserving
        # rotation: at m ~ 24-40 its subspaces are wide (dsub ~ 24-40 dims)
        # and unrotated ADC ordering collapses on clustered/correlated data
        # (measured overlap@10 0.105 on a 32-cluster fixture; 0.9+ rotated)
        # — the same pathology the PQ self-test gate exists for.
        ccfg = PQConfig(n_bits=4, m=coarse_m, dist=dist,
                        k_means_size=pq_config.k_means_size, rotate=True)
        coarse = PQTable.train(sample, ccfg, seed=seed + 1)
        del sample

        self = cls(pq, coarse, n, dim, dist, fill=fill, traced_gen=traced_gen,
                   row_gen=row_gen, block_rows=block_rows)
        cap = -(-n // 16384) * 16384
        # adc_scan_chunkmin masks padding by POSITION < n: the permutation
        # must keep positions [0, n) = exactly the valid rows (a permutation
        # of the whole capacity scatters zero-code padding rows through the
        # body where they win chunks with bogus small sums, and masks real
        # rows at the tail — measured 0.59 vs 0.97 oracle pool overlap)
        perm_h = np.concatenate([
            np.random.default_rng(cap ^ 0xC0DE5).permutation(n),
            np.arange(n, cap),
        ]).astype(np.int32)
        inv_h = np.empty(cap, np.int32)
        inv_h[perm_h] = np.arange(cap, dtype=np.int32)
        self._perm = jnp.asarray(perm_h)
        self._inv = jnp.asarray(inv_h)

        m, mc = pq.config.m, coarse.config.m
        codes = jnp.zeros((cap, (m + 1) // 2), jnp.uint8)
        codes_c = jnp.zeros((cap, (mc + 1) // 2), jnp.uint8)
        gidx, gmask = jnp.asarray(pq._gidx), jnp.asarray(pq._gmask)
        cidx, cmask = jnp.asarray(coarse._gidx), jnp.asarray(coarse._gmask)
        cb = jnp.asarray(pq.codebooks)
        cbc = jnp.asarray(coarse.codebooks)
        for row0 in range(0, n, block_rows):
            rows = min(block_rows, n - row0)
            v = fill(row0, rows)
            inv_rows = jax.lax.dynamic_slice(self._inv, (row0,), (rows,))
            codes = _pack_scatter_jit(
                codes, pq._transform_dev(v), inv_rows, gidx, gmask, cb, dist)
            codes_c = _pack_scatter_jit(
                codes_c, coarse._transform_dev(v), inv_rows, cidx, cmask, cbc,
                dist)
            del v
            if progress is not None:
                progress(min(row0 + rows, n))
        jax.block_until_ready(codes)
        self._codes = codes
        self._codes_c = codes_c.T
        self._codes_c_is_t = True
        del codes_c
        return self

    def __len__(self) -> int:
        return self.n

    def index_bytes(self) -> int:
        total = 0
        for a in (self._codes, self._codes_c, self._perm, self._inv):
            if a is not None:
                total += int(a.nbytes)
        for t in (self.pq, self.coarse):
            total += t.device_bytes()
        return total

    # ---- search ----
    def _refine(self, q_dev, ids):
        return refine_blocked(
            self._gen, self._fill, self._block_rows, self.n, self.dim,
            self.dist, q_dev, ids, row_gen=self._row_gen,
        )

    # ---- serde (the reference's external-vec-set shape, mod.rs:143-148:
    # topology/codes persist, the row source re-attaches on load) ----
    def save(self, path) -> None:
        from ..utils import serde

        arrays = {
            "codes": np.asarray(self._codes),
            "codes_c": np.asarray(self._codes_c),
            "perm": np.asarray(self._perm),
        }
        pq_arrays, pq_meta = self.pq.state()
        for kk, v in pq_arrays.items():
            arrays["main_" + kk] = v
        c_arrays, c_meta = self.coarse.state()
        for kk, v in c_arrays.items():
            arrays["coarse_" + kk] = v
        meta = {
            "kind": "pq_codes", "n": self.n, "dim": self.dim,
            "dist": self.dist, "block_rows": self._block_rows,
            "main": pq_meta["pq"], "coarse": c_meta["pq"],
            "codes_c_transposed": bool(self._codes_c_is_t),
        }
        serde.save_arrays(path, arrays, meta)

    @classmethod
    def load(cls, path, fill=None, traced_gen=None, row_gen=None) -> "PQCodesIndex":
        """Re-attach a saved codes tier.  The exact-refine row source
        (fill / traced_gen / row_gen) is runtime state and must be passed
        back in (like HNSWIndex.load's external_vectors); without one,
        results carry ADC-grade distances."""
        from ..utils import serde
        from .pq_table import PQTable

        arrays, meta = serde.load_arrays(path)
        if meta.get("kind") != "pq_codes":
            raise ValueError(f"{path} is not a PQCodesIndex checkpoint")

        def sub(prefix):
            return {kk[len(prefix):]: v for kk, v in arrays.items()
                    if kk.startswith(prefix)}

        pq = PQTable.from_state(sub("main_"), {"pq": meta["main"]})
        coarse = PQTable.from_state(sub("coarse_"), {"pq": meta["coarse"]})
        self = cls(pq, coarse, meta["n"], meta["dim"], meta["dist"],
                   fill=fill, traced_gen=traced_gen, row_gen=row_gen,
                   block_rows=meta["block_rows"])
        self._codes = jnp.asarray(arrays["codes"])
        self._codes_c = jnp.asarray(arrays["codes_c"])
        self._codes_c_is_t = bool(meta.get("codes_c_transposed", False))
        perm = arrays["perm"]
        self._perm = jnp.asarray(perm)
        inv = np.empty(len(perm), np.int32)
        inv[perm] = np.arange(len(perm), dtype=np.int32)
        self._inv = jnp.asarray(inv)
        return self

    def knn_batch(self, queries, k: int, ef: int = 200, c0: int = 2048,
                  interpret: bool = False):
        """(B, dim) queries -> ((B, k) exact-f32 dists ascending, (B, k)
        int32 ids, -1 where missing)."""
        from ..ops import pallas_adc as PA

        q_dev = queries if isinstance(queries, jax.Array) else jnp.asarray(
            np.atleast_2d(np.asarray(queries, np.float32)))
        c0 = min(c0, self.n)
        ef = min(ef, c0)
        kk = min(k, ef)

        # stage 0: coarse ADC chunk-min scan over all rows.  The chunk size
        # shrinks at small N so the survivor pool (n/chunk) stays >= 8x the
        # requested c0 — at 10M the default 32 gives a 150x margin, at 20k
        # it would cap the pool below c0.
        chunk = 32
        while chunk > 8 and self.n // chunk < 8 * c0:
            chunk //= 2
        lut_c, qn_c = self.coarse.create_lookup(q_dev)
        cb_sq_c = P.centroid_sqnorm_cache(jnp.asarray(self.coarse.codebooks))
        _, ids0 = PA.adc_scan_chunkmin(
            lut_c, self._codes_c, self._perm, jnp.int32(self.n), cb_sq_c,
            qn_c, c0, self.dist, packed=True, selector="approx", chunk=chunk,
            transposed=self._codes_c_is_t, interpret=interpret,
        )

        # stage 1: main ADC on the pooled candidates (permuted slot gather)
        lut_m, qn_m = self.pq.create_lookup(q_dev)
        cb_sq_m = P.centroid_sqnorm_cache(jnp.asarray(self.pq.codebooks))
        pos = jnp.where(ids0 >= 0, self._inv[jnp.maximum(ids0, 0)], -1)
        d1 = PA.adc_dists_for_ids(
            lut_m, qn_m, self._codes, cb_sq_m, pos, self.dist,
            self.pq.config.m, packed=True, interpret=interpret,
        )
        td1, ti1 = T.select_smallest(d1, ids0, ef)

        # refine: exact f32 by block regeneration (falls back to ADC order)
        d_ex = self._refine(q_dev, ti1)
        if d_ex is None:
            d_ex = td1
        else:
            # Per-candidate ADC fallback (ADVICE r4 #1): the traced block
            # refine caps per-block candidates at a static window S sized
            # for iid ids; when candidates cluster into few blocks (data
            # stored in cluster order), spill past S comes back +inf.
            # Valid candidates keep their ADC distance instead of being
            # silently dropped — graceful degradation to the no-refine
            # contract, per element.  (row_gen/host paths never spill;
            # isfinite is then only false where td1 is +inf too.)
            d_ex = jnp.where(jnp.isfinite(jnp.asarray(d_ex)), jnp.asarray(d_ex), td1)
        td, ti = T.topk_smallest(jnp.asarray(d_ex), ti1, kk)
        ti = jnp.where(jnp.isfinite(td), ti, -1)
        if kk < k:
            td = jnp.pad(td, ((0, 0), (0, k - kk)), constant_values=jnp.inf)
            ti = jnp.pad(ti, ((0, 0), (0, k - kk)), constant_values=-1)
        return td, ti


def refine_blocked(gen, fill, block_rows, n, dim, dist, q_dev, ids,
                   row_gen=None):
    """Exact f32 distances for a (B, ef) id set, or None when no exact
    source exists (ADC distances then stand).

    Shared by the codes tier and the IVF-PQ tier.  Source priority:
    `row_gen` = (draw_rows, params, key) ROW-ADDRESSABLE generator
    (regenerates exactly the candidate rows — the fast path); `gen` =
    (draw, params, key) block-keyed generator (lax.scan over every block);
    `fill` host block source; else None.

    The `gen` (traced-block) path sizes its per-block candidate window S
    for iid candidate ids (~1.5x the mean per-block load); ids clustered
    into few blocks (data ingested in cluster order) can spill past S and
    come back +inf.  Callers substitute the candidate's ADC distance for
    non-finite entries (see PQCodesIndex.search / _ivfpq_search_jit), so
    the failure mode is ADC-grade ordering for the spilled tail, never a
    dropped row."""
    B, ef = ids.shape
    if row_gen is not None:
        draw_rows, params, key = row_gen
        return _refine_rows_jit(params, key, ids, q_dev,
                                cos=dist == "cosine", draw_rows=draw_rows)
    if gen is not None:
        draw, params, key = gen
        nb = -(-n // block_rows)
        # 1.5x the mean per-block load covers iid-candidate skew (mean ~
        # B*ef/nb with Poisson-ish tails; 1.5x is > +6 sigma at the 10M
        # shapes); clamp at the total so few-block regimes don't gather the
        # world
        S = min(-(-B * ef // 512) * 512,
                max(1024, -(-3 * B * ef // (2 * nb)) // 512 * 512 + 512))
        flat = ids.reshape(-1)
        # -1 (invalid) sorts FIRST as int32; map to a huge sentinel so
        # invalids sort LAST and never match a block (the sentinel must
        # STAY in sorted_ids — replacing it post-sort breaks the
        # monotonicity searchsorted needs)
        flat_sortable = jnp.where(flat >= 0, flat, jnp.int32(2**30))
        order = jnp.argsort(flat_sortable)
        sorted_ids = jnp.pad(flat_sortable[order], (0, S),
                             constant_values=jnp.int32(2**30))
        qidx = jnp.pad(
            (jnp.arange(B * ef, dtype=jnp.int32) // ef)[order], (0, S))
        starts = jnp.searchsorted(
            sorted_ids[: B * ef],
            jnp.arange(nb, dtype=jnp.int32) * block_rows,
        ).astype(jnp.int32)
        d_sorted = _refine_traced_jit(
            params, key, sorted_ids, qidx, starts, q_dev,
            dim=dim, block_rows=block_rows, n_blocks=nb, S=S,
            cos=dist == "cosine", draw=draw,
        )
        d = jnp.full((B * ef,), jnp.inf, jnp.float32).at[order].set(d_sorted)
        return d.reshape(B, ef)
    if fill is None:
        return None
    ids_h = np.asarray(ids)
    flat = ids_h.ravel()
    valid = flat >= 0
    out = jnp.zeros((flat.shape[0], dim), jnp.float32)
    for b in np.unique(flat[valid] // block_rows):
        row0 = int(b) * block_rows
        rows = min(block_rows, n - row0)
        v = fill(row0, rows)
        sel = np.nonzero(valid & (flat >= row0) & (flat < row0 + rows))[0]
        out = out.at[jnp.asarray(sel, np.int32)].set(
            v[jnp.asarray(flat[sel] - row0, np.int32)])
        del v
    rows3 = out.reshape(B, ef, dim)
    if dist == "cosine":
        qn = jnp.sqrt(jnp.sum(q_dev * q_dev, axis=-1, keepdims=True))
        rn = jnp.sqrt(jnp.sum(rows3 * rows3, axis=-1))
        dots = jnp.einsum("bd,bed->be", q_dev, rows3)
        d = 1.0 - dots / jnp.maximum(qn * rn, 1e-10)
    else:
        diff = rows3 - q_dev[:, None, :]
        d = jnp.sum(diff * diff, axis=-1)
    return jnp.where(jnp.asarray(ids_h) >= 0, d, jnp.inf)
