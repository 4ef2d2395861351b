"""IVF-PQ index: probed-list ADC search over codes-resident storage.

The classic inverted-file + product-quantization pairing (the reference
ships IVF and PQ separately — ivf_index.rs posting scan, pq_table.rs ADC —
and never composes them; FAISS-style IVFPQ is their natural composition and
the right 10M+/chip design on TPU), built from three existing pieces:

  - cluster-sorted PACKED code storage (the binned-IVF "sorted mirror"
    layout, models/ivf.py:_sorted_layout: each posting list is one
    contiguous lpad-row segment; tails past the length-quantile cap spill
    to a shared overflow segment),
  - the binned chunk-min ADC kernel (ops/pallas_adc.py:adc_chunkmin_binned):
    each probed list is scanned ONCE against only the <=QB queries binned
    to it (ops/binning.py) at FULL main-table quality (m=320) — the
    nlist/n_probes work reduction the coarse-table hierarchy of
    PQCodesIndex cannot reach (its whole-N coarse scan ceilings at the
    coarse table's ordering quality; measured pool overlap 0.25-0.84),
  - exact-f32 refinement by block regeneration (models/pq_codes.py:
    refine_blocked — one device program with a traceable generator).

Overflow rows stay findable for EVERY query via a full chunk-min ADC scan
of the (shuffled) overflow segment — the same discipline as the binned
int8 IVF path.

Device cost per row ~ ceil(m/2) * lpad_fill_factor + 4 B (slot->id) —
measured 259 B/row at the flagship m=320 config (10M rows in 2.6 GB,
6,605 QPS @ recall 0.8675 — above the reference's 1M CPU baseline at 10x
its rows) and 209 B/row at m=256 (20M rows in 4.2 GB; cw=128 also dodges
the int8 tile's 160->256 lane padding).  data/t_bench_{10M,20M}_codes_tpu.toml.

Parity anchors: IVFIndex::knn_with_ef (ivf_index.rs:143-154, ef =
n_probes), FlatIndex::knn_pq rerank contract (flat_index.rs:84-104).
"""

from __future__ import annotations

from functools import partial as _partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import distance as D
from ..ops import kmeans as KM
from ..ops import pq as P
from ..ops import topk as T
from ..ops import binning as BN
from ..utils.config import PQConfig
from .pq_table import PQTable
from .ivf import _build_posting, _sorted_layout
from .pq_codes import _pack_scatter_jit, refine_blocked

_BLOCK = 131072
_BLOCKPAD = 512  # overflow segment padded to the chunk-min tile multiple


@_partial(jax.jit, donate_argnums=(0,))
def _tset_chunk(dst_t, src, lo):
    """dst_t[:, lo:lo+rows] = src.T with dst donated — the chunked
    transpose used at build: a whole-array `.T` of the encoded codes holds
    source + slice-copy + transposed target live at once (3x the table;
    the 30M build OOM'd at 18.5 of 15.75 GB), where chunking peaks at
    source + target + one chunk.  Emits int8 (see _encode_cols_jit)."""
    if src.dtype != jnp.int8:
        src = jax.lax.bitcast_convert_type(src, jnp.int8)
    return jax.lax.dynamic_update_slice(dst_t, src.T, (jnp.int32(0), lo))


@_partial(jax.jit, donate_argnums=(0,),
          static_argnames=("dist", "draw_rows", "has_rot"))
def _encode_cols_jit(codes_t, params, key, sids, lo, gidx, gmask, cb, rot,
                     center, dist, draw_rows, has_rot):
    """Slot-ordered encode: regenerate the rows owning slots [lo, lo+CH)
    (via the ROW-ADDRESSABLE generator), PQ-encode, and write the packed
    codes as a CONTIGUOUS column span of the transposed at-rest table.

    This is the build path that never materializes a row-major code table:
    a (slots, 160) uint8 device array lane-pads 1.6x (the 30M build OOM'd
    at 18.5 of 15.75 GB before this path existed), and the row-scatter it
    needed is replaced by a dynamic_update_slice."""
    v = draw_rows(params, key, sids).astype(jnp.float32)
    if has_rot:
        if center is not None:
            v = v - center
        v = jnp.matmul(v, rot, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    grouped = P.regroup(v, gidx, gmask)
    codes = P.encode(grouped, cb, dist)
    if codes.shape[1] % 2:
        codes = jnp.pad(codes, ((0, 0), (0, 1)))
    packed = (codes[:, 0::2] | (codes[:, 1::2] << 4)).astype(jnp.uint8)
    # int8 at rest: the kernels take int8 (sign-safe nibble masks), and a
    # uint8 table costs a FULL bitcast copy per search (XLA materializes
    # bitcast-convert — a 7.4 GB HLO temp at 30M)
    packed = jax.lax.bitcast_convert_type(packed, jnp.int8)
    return jax.lax.dynamic_update_slice(codes_t, packed.T, (jnp.int32(0), lo))


def _transpose_split(codes, kl, chunk_slots=4 * 1024 * 1024):
    """(slots, cw) uint8 device codes -> ((cw, kl), (cw, slots-kl)) with a
    bounded-peak chunked transpose; frees `codes` before returning."""
    slots, cw = codes.shape
    outs = []
    for lo0, hi0 in ((0, kl), (kl, slots)):
        seg = jnp.zeros((cw, hi0 - lo0), jnp.int8)
        for lo in range(lo0, hi0, chunk_slots):
            hi = min(hi0, lo + chunk_slots)
            src = codes[lo:hi]
            seg = _tset_chunk(seg, src, jnp.int32(lo - lo0))
        outs.append(seg)
    jax.block_until_ready(outs)
    del codes
    return outs[0], outs[1]




def _layout_encode(fill, n, pq, assign, nlist, seed, block_rows,
                   force_lpad=None, ov_pad_min=0, progress=None,
                   transposed=False, row_gen=None):
    """Cluster-sorted layout + packed-code encode for one row range.

    Shared by the single-chip build and the per-shard builds of
    parallel.sharded.ShardedIVFPQIndex (which forces a common lpad and
    overflow capacity so per-shard states stack into mesh-sharded
    arrays).  Returns (lpad, codes_main (nlist*lpad, cw) device,
    codes_ov (ov_pad, cw) device, slot_id (nlist*lpad + ov_pad,) host,
    lens (nlist,) host, ov_count)."""
    posting, counts = _build_posting(assign, nlist)
    # cap at the .95 quantile (not the binned-int8 path's .9): an
    # overflow row is scanned by EVERY query (B columns) where a padded
    # list row costs only its bin's qb columns — at qb=32/B=1000 the
    # spill is ~32x costlier per row than the padding it avoids, but
    # measured padding at .98 (1.78x mean) cost more than the ~1%
    # spill this cap leaves
    lpad, perm_pad, ov_h = _sorted_layout(posting, counts, nlist,
                                          cap_quantile=0.95,
                                          force_lpad=force_lpad)
    kl = nlist * lpad
    # overflow rows are chunk-min scanned by every query: shuffle them
    # so storage order is de-clustered (they arrive in posting order)
    ov_h = np.asarray(ov_h, np.int32)
    np.random.default_rng(seed ^ 0x0F10).shuffle(ov_h)
    ov_pad = max(ov_pad_min, -(-max(len(ov_h), 1) // _BLOCKPAD) * _BLOCKPAD)
    slots_total = kl + ov_pad
    slot_id = np.full(slots_total, -1, np.int32)
    slot_id[:kl] = perm_pad
    slot_id[kl:kl + len(ov_h)] = ov_h
    # pad slots get filler ids so device gathers stay in range
    pad_slots = np.flatnonzero(slot_id < 0)
    slot_id[pad_slots] = 0
    # invert: slot of each original row
    inv = np.empty(n, np.int32)
    valid_slots = np.flatnonzero(
        np.concatenate([perm_pad >= 0, np.ones(len(ov_h), bool),
                        np.zeros(ov_pad - len(ov_h), bool)]))
    ids_of_valid = np.concatenate([perm_pad[perm_pad >= 0], ov_h])
    inv[ids_of_valid] = valid_slots
    inv_dev = jnp.asarray(inv)

    m = pq.config.m
    gidx, gmask = jnp.asarray(pq._gidx), jnp.asarray(pq._gmask)
    cb = jnp.asarray(pq.codebooks)
    if transposed and row_gen is not None:
        # slot-ordered streaming encode straight into the (cw, slots)
        # at-rest table: no row-major accumulator (1.6x lane padding), no
        # scatter, peak = the final table + one chunk.  Pad slots carry
        # row-0 codes — never read (list lens / ov_valid mask them).
        draw_rows, params, key = row_gen
        cw = (m + 1) // 2
        has_rot = pq.rotation is not None
        rot = jnp.asarray(pq.rotation) if has_rot else None
        center = (jnp.asarray(pq.center)
                  if has_rot and pq.center is not None else None)
        CH = block_rows
        segs = []
        for s0, s1 in ((0, kl), (kl, slots_total)):
            span = s1 - s0
            seg = jnp.zeros((cw, span), jnp.int8)
            if span == 0:
                segs.append(seg)
                continue
            ch = min(CH, span)
            # exact-width chunks; the tail chunk OVERLAPS the previous one
            # (columns re-encoded identically) so dynamic_update_slice
            # never clamps — a clamped start would misalign sids/columns
            starts = list(range(0, max(span - ch, 0) + 1, ch))
            if starts and starts[-1] != span - ch:
                starts.append(span - ch)
            sid_dev = jnp.asarray(slot_id[s0:s1])
            for lo in starts:
                sids = jax.lax.dynamic_slice(sid_dev, (lo,), (ch,))
                seg = _encode_cols_jit(
                    seg, params, key, sids, jnp.int32(lo), gidx, gmask, cb,
                    rot, center, pq.config.dist, draw_rows, has_rot)
                if progress is not None:
                    done = s0 + min(lo + ch, span)
                    progress((n + done * n // slots_total) // 2)
            segs.append(seg)
        jax.block_until_ready(segs)
        return (lpad, segs[0], segs[1], slot_id,
                np.minimum(counts, lpad), len(ov_h))
    codes = jnp.zeros((slots_total, (m + 1) // 2), jnp.uint8)
    for row0 in range(0, n, block_rows):
        rows = min(block_rows, n - row0)
        v = fill(row0, rows)
        inv_rows = jax.lax.dynamic_slice(inv_dev, (row0,), (rows,))
        codes = _pack_scatter_jit(
            codes, pq._transform_dev(v), inv_rows, gidx, gmask, cb, dist=pq.config.dist)
        del v
        if progress is not None:
            progress((n + min(row0 + rows, n)) // 2)
    jax.block_until_ready(codes)
    # split ONCE at build: an in-jit codes[:kl] slice for the binned
    # kernel copies the whole 2.6 GB table every batch (~6.5 ms at 10M).
    # `transposed` splits via the bounded-peak chunked transpose straight
    # into the (cw, slots) at-rest layout (slice + .T of a 30M table
    # peaked at 3x = 18.5 GB).
    if transposed:
        main_t, ov_t = _transpose_split(codes, kl)
        return (lpad, main_t, ov_t, slot_id,
                np.minimum(counts, lpad), len(ov_h))
    return (lpad, codes[:kl], codes[kl:], slot_id,
            np.minimum(counts, lpad), len(ov_h))


class IVFPQIndex:
    """Codes-resident IVF-PQ (see module docstring)."""

    def __init__(self, pq: PQTable, centroids: np.ndarray, n: int, dim: int,
                 dist: str, lpad: int, lens: np.ndarray, ov_count: int,
                 fill=None, traced_gen=None, row_gen=None,
                 block_rows: int = _BLOCK):
        self.pq = pq
        self.centroids = np.asarray(centroids, np.float32)
        self.nlist = self.centroids.shape[0]
        self.n = int(n)
        self.dim = int(dim)
        self.dist = dist
        self.lpad = int(lpad)
        self.lens = np.asarray(lens, np.int32)  # valid rows per list (<= lpad)
        self.ov_count = int(ov_count)
        self._fill = fill
        self._gen = traced_gen
        self._row_gen = row_gen  # (draw_rows, params, key) row-addressable
        self._block_rows = int(block_rows)
        # device state.  Codes live TRANSPOSED at rest — (cw, slots) — when
        # `_codes_is_t`: cw=160 (m=320 packed) on the int8 lane axis pads
        # 160 -> 256 B/row (1.6x HBM + capacity tax); on sublanes it tiles
        # exactly (160 = 5x32).  Row-major is kept for loaded pre-r5
        # checkpoints and the sharded tier.
        self._codes_is_t = False
        self._codes: jax.Array | None = None  # (nlist*lpad, cw) uint8 sorted
        self._codes_ov: jax.Array | None = None  # (ov_pad, cw) uint8
        self._slot_id: jax.Array | None = None  # (slots,) int32 slot -> orig
        self._lens_dev: jax.Array | None = None
        self._dev_centroids: jax.Array | None = None
        self._cb_sq: jax.Array | None = None

    # ---- build ----
    @classmethod
    def build_from_fill(
        cls,
        fill,
        n: int,
        dim: int,
        dist: str,
        nlist: int = 1024,
        pq_config: PQConfig | None = None,
        sample_rows: int = 25_000,
        seed: int = 0,
        block_rows: int = _BLOCK,
        traced_gen=None,
        row_gen=None,
        progress=None,
    ) -> "IVFPQIndex":
        """Two passes over `fill` (the sorted-mirror ingest discipline,
        models/ivf.py:from_device_blocks(mirror="sorted")): pass A assigns
        every row to its nearest coarse centroid (slots depend on the full
        posting layout), pass B encodes each block and scatters packed code
        rows straight into cluster-sorted slots."""
        if pq_config is None:
            pq_config = PQConfig(n_bits=4, m=320, dist=dist,
                                 k_means_size=sample_rows)
        if pq_config.n_bits != 4:
            raise ValueError("the IVF-PQ tier serves 4-bit (packed) tables")

        # train main PQ on a strided multi-block sample
        n_blocks = -(-n // block_rows)
        sample_blocks = sorted(set(
            int(b) for b in np.linspace(0, n_blocks - 1, min(8, n_blocks))))
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

        del sample
        # coarse centroids train on >= 64 rows/centroid (NOT the 25k PQ
        # sample, and NOT tied to block_rows): noisy centroids skew list
        # lengths so badly that the padded-lpad lands at 3-4x the mean
        # (6.2 GB of 77%-padding codes at 10M from a 12-rows/centroid
        # sample; 2.9x again at 20M when a smaller ingest block leaked
        # into the training-set size)
        n_train = min(max(64 * nlist, 131072), n)
        train = fill(0, n_train)
        centroids_dev = KM.kmeans_fit(
            jax.random.PRNGKey(seed + 2), train, jnp.int32(n_train),
            nlist, 12, 1e-4, dist,
        )
        del train

        # pass A: assignment
        assign = np.empty(n, np.int32)
        for row0 in range(0, n, block_rows):
            rows = min(block_rows, n - row0)
            v = fill(row0, rows)
            assign[row0:row0 + rows] = np.asarray(
                KM.find_nearest(v, centroids_dev, dist))
            del v
            if progress is not None:
                progress(min(row0 + rows, n) // 2)

        lpad, codes_main, codes_ov, slot_id, lens, ov_count = _layout_encode(
            fill, n, pq, assign, nlist, seed, block_rows, progress=progress,
            transposed=True, row_gen=row_gen)
        self = cls(pq, np.asarray(centroids_dev), n, dim, dist, lpad,
                   lens, ov_count, fill=fill,
                   traced_gen=traced_gen, row_gen=row_gen,
                   block_rows=block_rows)
        # codes arrive already transposed-at-rest ((cw, slots); the
        # chunked split-transpose above bounds the build's HBM peak)
        self._codes = codes_main
        self._codes_ov = codes_ov
        self._codes_is_t = True
        self._slot_id = jnp.asarray(slot_id)
        return self

    def __len__(self) -> int:
        return self.n

    def index_bytes(self) -> int:
        total = self.pq.device_bytes()
        for a in (self._codes, self._codes_ov, self._slot_id,
                  self._lens_dev, self._dev_centroids, self._cb_sq):
            if a is not None:
                total += int(a.nbytes)
        return total

    def _device(self):
        if self._dev_centroids is None:
            self._dev_centroids = jnp.asarray(self.centroids)
            self._lens_dev = jnp.asarray(self.lens)
            self._cb_sq = P.centroid_sqnorm_cache(jnp.asarray(self.pq.codebooks))
        return self._dev_centroids, self._lens_dev, self._cb_sq

    # ---- serde (external-vec-set shape: codes/layout persist, the
    # refine row source re-attaches on load, mod.rs:143-148) ----
    def save(self, path) -> None:
        from ..utils import serde

        arrays = {
            "codes": np.asarray(self._codes),
            "codes_ov": np.asarray(self._codes_ov),
            "slot_id": np.asarray(self._slot_id),
            "centroids": self.centroids,
            "lens": self.lens,
        }
        pq_arrays, pq_meta = self.pq.state()
        for kk, v in pq_arrays.items():
            arrays["main_" + kk] = v
        meta = {
            "kind": "ivfpq", "n": self.n, "dim": self.dim, "dist": self.dist,
            "lpad": self.lpad, "ov_count": self.ov_count,
            "block_rows": self._block_rows, "main": pq_meta["pq"],
            "codes_transposed": bool(self._codes_is_t),
        }
        serde.save_arrays(path, arrays, meta)

    @classmethod
    def load(cls, path, fill=None, traced_gen=None, row_gen=None) -> "IVFPQIndex":
        """Re-attach a saved IVF-PQ tier; pass the refine row source back
        in (fill / traced_gen / row_gen) for exact-f32 results."""
        from ..utils import serde
        from .pq_table import PQTable

        arrays, meta = serde.load_arrays(path)
        if meta.get("kind") != "ivfpq":
            raise ValueError(f"{path} is not an IVFPQIndex checkpoint")
        pq_arrays = {kk[5:]: v for kk, v in arrays.items()
                     if kk.startswith("main_")}
        pq = PQTable.from_state(pq_arrays, {"pq": meta["main"]})
        self = cls(pq, arrays["centroids"], meta["n"], meta["dim"],
                   meta["dist"], meta["lpad"], arrays["lens"],
                   meta["ov_count"], fill=fill, traced_gen=traced_gen,
                   row_gen=row_gen, block_rows=meta["block_rows"])
        self._codes = jnp.asarray(arrays["codes"])
        self._codes_ov = jnp.asarray(arrays["codes_ov"])
        self._codes_is_t = bool(meta.get("codes_transposed", False))
        self._slot_id = jnp.asarray(arrays["slot_id"])
        return self

    # ---- search ----
    def _search_fused(self, q_dev, k, n_probes, ef, qb, chunk):
        """Whole search as ONE device program.  The unfused path issues
        ~15 jitted calls per batch; under the axon tunnel each dispatch
        costs milliseconds of host time, which dominated the measured
        latency (0.30 ms/q at 500k where the kernel math is ~2 ms/batch).
        Requires a traceable generator and an unrotated main table."""
        gen = self._row_gen if self._row_gen is not None else self._gen
        draw, params, key = gen
        centroids, lens_dev, cb_sq = self._device()
        B = q_dev.shape[0]
        nb = -(-self.n // self._block_rows)
        kk = min(k, ef)
        S = min(-(-B * ef // 512) * 512,
                max(1024, -(-3 * B * ef // (2 * nb)) // 512 * 512 + 512))
        return _ivfpq_search_jit(
            q_dev, centroids, self._codes, self._codes_ov, self._slot_id,
            lens_dev, cb_sq,
            jnp.asarray(self.pq._gidx), jnp.asarray(self.pq._gmask),
            jnp.asarray(self.pq.codebooks), params, key,
            k=kk, n_probes=n_probes, ef=ef, qb=qb, chunk=chunk,
            dist=self.dist, lpad=self.lpad, ov_count=self.ov_count,
            n=self.n, nlist=self.nlist, block_rows=self._block_rows,
            nb=nb, S=S, draw=draw,
            row_addressable=self._row_gen is not None,
            codes_t=self._codes_is_t,
        )

    def _auto_qb(self, B: int, n_probes: int) -> int:
        """Bin width sized so overflow drops are rare: ~2x the mean
        per-list load, 32-aligned (the 500k smoke ran qb=64 at a mean load
        of 125 — half of every query's probes silently dropped)."""
        mean = B * n_probes / self.nlist
        return int(min(512, max(32, -(-2 * mean // 32) * 32)))

    def knn_batch(self, queries, k: int, n_probes: int = 48, ef: int = 256,
                  qb: int | None = None, chunk: int = 16,
                  interpret: bool = False):
        """(B, dim) queries -> ((B, k) exact-f32 dists ascending, (B, k)
        int32 ids, -1 where missing).  `n_probes` follows the reference's
        ef-as-n_probes convention (ivf_index.rs:137-142)."""
        q_dev = queries if isinstance(queries, jax.Array) else jnp.asarray(
            np.atleast_2d(np.asarray(queries, np.float32)))
        B = q_dev.shape[0]
        n_probes = min(n_probes, self.nlist)
        kk = min(k, ef)
        if qb is None:
            qb = self._auto_qb(B, n_probes)
        if ((self._row_gen is not None or self._gen is not None)
                and self.pq.rotation is None and not interpret):
            td, ti = self._search_fused(q_dev, k, n_probes, ef, qb, chunk)
            if kk < k:
                td = jnp.pad(td, ((0, 0), (0, k - kk)), constant_values=jnp.inf)
                ti = jnp.pad(ti, ((0, 0), (0, k - kk)), constant_values=-1)
            return td, ti

        centroids, lens_dev, cb_sq = self._device()
        lookup, q_norms = self.pq.create_lookup(q_dev)
        td1, ti1 = _search_candidates(
            q_dev, lookup, q_norms, centroids, self._codes, self._codes_ov,
            self._slot_id, lens_dev, cb_sq, k=kk, n_probes=n_probes, ef=ef,
            qb=qb,
            chunk=chunk, dist=self.dist, lpad=self.lpad,
            ov_count=self.ov_count, nlist=self.nlist, interpret=interpret,
            codes_t=self._codes_is_t,
        )
        d_ex = refine_blocked(self._gen, self._fill, self._block_rows, self.n,
                              self.dim, self.dist, q_dev, ti1,
                              row_gen=self._row_gen)
        if d_ex is None:
            d_ex = td1
        else:
            # spilled (non-finite) refine entries keep ADC order (ADVICE r4 #1)
            d_ex = jnp.where(jnp.isfinite(jnp.asarray(d_ex)), jnp.asarray(d_ex), td1)
        td, ti = T.topk_smallest(jnp.asarray(d_ex), ti1, kk)
        ti = jnp.where(jnp.isfinite(td), ti, -1)
        if kk < k:
            td = jnp.pad(td, ((0, 0), (0, k - kk)), constant_values=jnp.inf)
            ti = jnp.pad(ti, ((0, 0), (0, k - kk)), constant_values=-1)
        return td, ti


def _search_candidates(q, lookup, q_norms, centroids, codes, codes_ov,
                       slot_id, lens_dev, cb_sq, *, k, n_probes, ef, qb,
                       chunk, dist, lpad, ov_count, nlist, interpret,
                       ov_valid=None, codes_t=False):
    """Steps 1-6 of the IVF-PQ search (probe -> bin -> binned ADC ->
    survivor gather -> overflow -> top-ef).  Pure jax; traced either
    standalone (unfused path) or inside the fused program.

    `ov_valid` (traced int32, default = ov_count) is the VALID overflow
    row count when `ov_count` is only a static capacity — the sharded
    tier pads every shard's overflow segment to a common capacity and
    passes each shard's true count here.  `codes_t`: codes/codes_ov are
    (cw, slots) transposed-at-rest (the m=320 zero-padding layout,
    ops/pallas_adc.py adc_scan_chunkmin docstring)."""
    from ..ops import pallas_adc as PA

    B = q.shape[0]
    # 1. probe selection: exact centroid distances
    d_c = D.pairwise(q.astype(jnp.float32), centroids, dist)
    _, probe = T.topk_smallest(
        d_c, jnp.broadcast_to(jnp.arange(nlist, dtype=jnp.int32)[None],
                              d_c.shape), n_probes)

    # 2. invert to per-list query bins
    bins, slots = BN.bin_queries(probe, nlist, qb)

    # 3. binned ADC over probed lists (full main-table quality).  `chunk`
    # trades survivor density for selection width: a true neighbor must win
    # its chunk within ITS list under ADC ordering — at the flagship m=320
    # quality chunk=32 is lossless in practice; weak tables (low
    # adc_quality) should shrink it.
    outd, outi = PA.adc_chunkmin_binned(
        lookup, codes, lens_dev, bins, cb_sq, q_norms, dist,
        packed=True, lpad=lpad, chunk=chunk, transposed=codes_t,
        interpret=interpret,
    )
    SL = outd.shape[1]  # survivors per list

    # 4. per-query survivor gather from its probes' (list, slot) columns.
    # ROW-gather formulation: transpose survivors to (nlist*QB, SL) so each
    # (probe, slot) pair pulls one contiguous SL-row — the direct
    # outd[probe, :, slot] advanced indexing lowers to B*p*SL SCALAR
    # gathers (~45 ms at 500k/p=32, 3x the binned kernel itself).
    outd_t = jnp.swapaxes(outd, 1, 2).reshape(nlist * qb, SL)
    outi_t = jnp.swapaxes(outi, 1, 2).reshape(nlist * qb, SL)
    row_idx = jnp.where(slots >= 0, probe * qb + slots, 0)  # (B, p)
    d_cand = outd_t[row_idx].reshape(B, n_probes * SL)
    slot_cand = outi_t[row_idx].reshape(B, n_probes * SL)
    dropped = slots < 0  # bin overflow: this probe contributed nothing
    d_cand = jnp.where(
        jnp.broadcast_to(dropped[:, :, None], (B, n_probes, SL)).reshape(
            B, n_probes * SL),
        jnp.inf, d_cand)

    # 5. overflow segment: chunk-min ADC scanned by every query.  Its perm
    # maps positions to GLOBAL SLOTS (kl + position): candidates stay in
    # slot space until after selection — decoding the full (B, p*SL)
    # candidate matrix through slot_id is B*p*SL scalar gathers (~30M at
    # p=64, the third scalar-gather trap this module hit; ids are decoded
    # on the (B, ef) selection below instead).
    if ov_count > 0:
        kl = nlist * lpad
        ov_codes = codes_ov
        n_ov = ov_codes.shape[1] if codes_t else ov_codes.shape[0]
        ov_slots = kl + jnp.arange(n_ov, dtype=jnp.int32)
        # floored at k (ADVICE r4 #2): with ov_count < 4k the old //4 cap
        # could fall below k and make true top-k rows living in the overflow
        # segment unfindable even at n_probes=nlist, breaking the
        # exhaustive-probe == exact expectation.  The chunk ladder extends
        # to 1 for the same reason: the chunk-min keeps one survivor per
        # `chunk` VALID rows, so ceil(ov_count/chunk) is the real candidate
        # capacity — a tiny overflow segment (e.g. 39 rows, k=10) must scan
        # densely (chunk=1) or true neighbors sharing a chunk are lost.
        k_ov = min(max(k, 32), max(ov_count, 1))
        ch = 32
        while ch > 1 and ov_count < ch * 8 * k_ov:
            ch //= 2
        ovv = jnp.int32(ov_count) if ov_valid is None else ov_valid
        d_ov, s_ov = PA.adc_scan_chunkmin(
            lookup, ov_codes, ov_slots, ovv, cb_sq,
            q_norms, k_ov, dist, packed=True, chunk=ch,
            transposed=codes_t, interpret=interpret,
        )
        d_cand = jnp.concatenate([d_cand, d_ov], axis=1)
        slot_cand = jnp.concatenate([slot_cand, s_ov], axis=1)

    # 6. top-ef by ADC distance.  Stage-1 ordering feeds the exact refine,
    # so wide pools take approx_min_k at recall_target .95 (the rt=1.0 form
    # degenerates to a full sort path, measured 119 ms at 1e5 width).
    kk = min(ef, d_cand.shape[1])
    if d_cand.shape[1] > 4 * kk:
        td, pos = jax.lax.approx_min_k(d_cand, kk, recall_target=0.95)
        ts = jnp.take_along_axis(slot_cand, pos, axis=-1)
    else:
        td, ts = T.topk_smallest(d_cand, slot_cand, kk)
    ids = slot_id[jnp.clip(ts, 0, slot_id.shape[0] - 1)]
    return td, jnp.where(jnp.isfinite(td), ids, -1)


@_partial(jax.jit, static_argnames=(
    "k", "n_probes", "ef", "qb", "chunk", "dist", "lpad", "ov_count", "n",
    "nlist", "block_rows", "nb", "S", "draw", "row_addressable", "codes_t"))
def _ivfpq_search_jit(q, centroids, codes, codes_ov, slot_id, lens_dev,
                      cb_sq, gidx, gmask, cbooks, params, key, *, k, n_probes,
                      ef, qb, chunk, dist, lpad, ov_count, n, nlist,
                      block_rows, nb, S, draw, row_addressable=False,
                      codes_t=False):
    """The whole IVF-PQ search as one device program: lookup build +
    candidates + single-program exact refine (the traced branch of
    refine_blocked, inlined so the refine's sort/searchsorted stay on
    device) + final exact top-k."""
    from .pq_codes import _refine_traced_jit

    B = q.shape[0]
    qf = q.astype(jnp.float32)
    qg = P.regroup(qf, gidx, gmask)
    lookup = P.build_lookup(qg, cbooks, dist)
    if dist == "cosine":
        q_norms = jnp.sqrt(jnp.sum(qf * qf, axis=-1))
    else:
        q_norms = jnp.zeros(B, jnp.float32)

    td1, ti1 = _search_candidates(
        qf, lookup, q_norms, centroids, codes, codes_ov, slot_id, lens_dev,
        cb_sq, k=k, n_probes=n_probes, ef=ef, qb=qb, chunk=chunk, dist=dist,
        lpad=lpad, ov_count=ov_count, nlist=nlist, interpret=False,
        codes_t=codes_t,
    )
    ef_eff = ti1.shape[1]

    if row_addressable:
        # direct per-row regeneration (see pq_codes._refine_rows_jit)
        from .pq_codes import _refine_rows_jit

        d_ex = _refine_rows_jit(params, key, ti1, qf,
                                cos=dist == "cosine", draw_rows=draw)
        td, ti = T.topk_smallest(d_ex, ti1, k)
        return td, jnp.where(jnp.isfinite(td), ti, -1)

    # inline traced refine (see pq_codes.refine_blocked)
    flat = ti1.reshape(-1)
    flat_sortable = jnp.where(flat >= 0, flat, jnp.int32(2**30))
    order = jnp.argsort(flat_sortable)
    sorted_ids = jnp.pad(flat_sortable[order], (0, S),
                         constant_values=jnp.int32(2**30))
    qidx = jnp.pad(
        (jnp.arange(B * ef_eff, dtype=jnp.int32) // ef_eff)[order], (0, S))
    starts = jnp.searchsorted(
        sorted_ids[: B * ef_eff],
        jnp.arange(nb, dtype=jnp.int32) * block_rows,
    ).astype(jnp.int32)
    d_sorted = _refine_traced_jit(
        params, key, sorted_ids, qidx, starts, qf,
        dim=q.shape[1], block_rows=block_rows, n_blocks=nb, S=S,
        cos=dist == "cosine", draw=draw,
    )
    d_ex = jnp.full((B * ef_eff,), jnp.inf, jnp.float32).at[order].set(
        d_sorted).reshape(B, ef_eff)
    # spill-past-S candidates keep their ADC distance instead of +inf
    # (ADVICE r4 #1) — see pq_codes.PQCodesIndex.search for the rationale
    d_ex = jnp.where(jnp.isfinite(d_ex), d_ex, td1)
    td, ti = T.topk_smallest(d_ex, ti1, k)
    return td, jnp.where(jnp.isfinite(td), ti, -1)

