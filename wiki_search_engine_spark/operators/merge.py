"""Incremental index merge: fold a delta index into a base index.

The reference's "merge" is a driver-side pandas concat of CSV index parts
(reference: Indexer/merge_index_files.py:5-15) — a full rewrite of the
whole index on every crawl batch, single-process. At web scale the index
is petabytes and a crawl batch touches a sliver of it, so the rebuild
merges INDEXES, not CSV parts: two independently-built posting-list
tables (same layout: doc-range-sharded, delta+varbyte blocks — see
operators/postings.py) combine into one, touching only the (term, salt)
groups the delta actually changes.

Update semantics — delta wins (the crawler's re-crawl overwrites the
storage file for a url, Crawler/crawler.py:401-406): every docid present
in the delta's corpus is removed from the base's postings wherever it
appears (the old page version may contain terms the new one lost), then
the delta's postings are unioned in. Docids are stable hashes of url
(operators/tokenize.py with_docid), so "same url re-crawled" == "same
docid in both indexes".

Work-avoidance (the point of the operator):

- a (term, salt) group present in only ONE index and whose block docid
  ranges contain NO updated docid passes through byte-for-byte — no
  decode, no re-encode, Arrow buffers copied wholesale;
- the affected-test is vectorized: per-block [first_docid, last_docid]
  ranges (block metadata, no payload decode) binary-searched against the
  sorted updated-docid array;
- only groups with rows in both indexes, or base blocks overlapping an
  updated docid, take the slow path: full decode -> filter/merge ->
  re-encode with exact block metadata at the MERGED corpus' avgdl.

The range test has useful asymmetry at scale: docids are uniform hashes,
so a HEAD term's 128-entry blocks cover narrow docid ranges (dense list)
and prune precisely — exactly where decode is expensive — while a rare
term's lone block spans nearly the whole docid space and is almost
always a false positive, but decoding a df~10 list costs microseconds.
Work done therefore tracks the true overlap, not the term count.

max_score soundness: stored per-block ``max_score`` is the idf-free BM25
factor u = tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) computed at each source
index's own avgdl, but the merged corpus has a new avgdl and u grows
monotonically with avgdl. For any posting, u(a_new) <= u(a_old) *
max(1, a_new/a_old)  [u = T/(p + x/a) with T,p,x >= 0, so
u(a_new)/u(a_old) = (p + x/a_old)/(p + x/a_new) <= a_new/a_old when
a_new >= a_old]. Pass-through blocks therefore get max_score scaled by
that factor — a sound (never under) upper bound, so block-max WAND
pruning stays exact on the merged index; re-encoded blocks get exact
bounds. Scores themselves are always exact: doclens are stored
per-posting and scoring uses the merged stats at query time.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .codec import BLOCK_SIZE
from .postings import POSTINGS_SCHEMA


def _sorted_searchsorted_any(sorted_arr: np.ndarray, lo: np.ndarray,
                             hi: np.ndarray) -> np.ndarray:
    """For each [lo_i, hi_i] (inclusive), does sorted_arr intersect it?"""
    if sorted_arr.size == 0:
        return np.zeros(lo.shape, dtype=bool)
    return np.searchsorted(sorted_arr, lo, "left") < np.searchsorted(
        sorted_arr, hi, "right"
    )


def write_updated_docids(
    updated: np.ndarray, out_dir: str, salt_bits: int
) -> str:
    """Materialize a (large) sorted updated-docid set as one parquet file
    per docid-range salt shard (``salt=K/docids.parquet``). Because salt
    is the TOP ``salt_bits`` bits of the docid, the sorted array slices
    contiguously per salt, and any subset of slices concatenated in salt
    order is again globally sorted — so kernel tasks can assemble exactly
    the shards they touch and reuse the unsliced search logic. This is
    the big-delta shipping path: at ~10^8+ updated docids a full
    broadcast is GBs to every executor, while each (bucket, salt) task
    only ever needs its own shard's slice from shared storage."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    updated = np.ascontiguousarray(updated, dtype=np.int64)
    shift = 63 - salt_bits
    n_salts = 1 << salt_bits
    # shard boundaries via int64 needles; the top shard's upper bound is
    # the array end, NEVER (n_salts << shift) == 2**63: that needle
    # overflows int64 and numpy silently degrades the comparison to
    # float64, where 2**63 - 1 rounds UP to 2**63 and docids within
    # ~512 of the top of the range fall out of the last slice (verified
    # on numpy 1.26: searchsorted([..., 2**63-1], 2**63) misses the
    # last element)
    needles = np.array(
        [s << shift for s in range(n_salts)], dtype=np.int64
    )
    bounds = np.searchsorted(updated, needles, "left")
    for s in range(n_salts):
        lo = bounds[s]
        hi = bounds[s + 1] if s + 1 < n_salts else updated.size
        d = os.path.join(out_dir, f"salt={s}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table({"docid": pa.array(updated[lo:hi], pa.int64())}),
            os.path.join(d, "docids.parquet"),
        )
    return out_dir


# Per-EXECUTOR sidecar slice cache for the big-delta path, keyed by
# (sidecar dir, salt, file mtime_ns, file size). Module-level on
# purpose: a closure-local dict is serialized into every task and
# starts empty each time, so each task would re-read its shards; module
# state lives in the (reused) Python worker process, so tasks on the
# same executor share loaded slices. The stat components make the key
# CONTENT-identifying: a sidecar rewritten at the same path (rmtree +
# re-merge into a reused out_dir within one Spark app, with
# spark.python.worker.reuse on) gets a fresh key instead of serving the
# previous run's docid set — a stale slice would silently leave stale
# postings in the merged index. Bounded: one merge touches
# <= 2^salt_bits slices per dir and the eviction below drops other
# runs' entries.
_DD_CACHE: dict[tuple, "np.ndarray"] = {}


def _dd_provider(bc, updated_docids_dir: str | None):
    """Returns fn(sorted unique salts present in a kernel table) ->
    sorted docid array covering those salts. Broadcast mode ignores the
    salts (the full array searches identically); directory mode loads
    per-salt slices from the sidecar written by write_updated_docids,
    cached per executor process (_DD_CACHE)."""
    if updated_docids_dir is None:
        return lambda salts: bc.value

    def load(salts) -> "np.ndarray":
        import os

        import pyarrow.parquet as pq

        # a long-lived executor (streaming maintenance) sees many merge
        # rounds, each with its own sidecar dir: evict other dirs' slices
        # once the cache grows past a round's worth, so memory is bounded
        # by one delta set rather than the process lifetime
        if len(_DD_CACHE) > 1024:
            for k in [k for k in _DD_CACHE if k[0] != updated_docids_dir]:
                del _DD_CACHE[k]
        parts = []
        for s in salts:
            p = os.path.join(
                updated_docids_dir, f"salt={int(s)}", "docids.parquet"
            )
            try:
                st = os.stat(p)
                key = (
                    updated_docids_dir, int(s), st.st_mtime_ns, st.st_size,
                )
            except FileNotFoundError:
                st, key = None, None
            if key is None:
                parts.append(np.empty(0, dtype=np.int64))
                continue
            if key not in _DD_CACHE:
                # same (dir, salt) under an older stat = a rewritten
                # sidecar; drop the superseded slice
                for k in [
                    k for k in _DD_CACHE if k[:2] == key[:2] and k != key
                ]:
                    del _DD_CACHE[k]
                _DD_CACHE[key] = (
                    pq.read_table(p).column("docid").to_numpy()
                )
            parts.append(_DD_CACHE[key])
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(parts)  # salt order == sorted docid order

    return load


def merge_postings_tables(
    base: DataFrame,
    delta: DataFrame,
    updated_docids: np.ndarray | None,
    avgdl_merged: float,
    f_base: float,
    f_delta: float,
    block_size: int = BLOCK_SIZE,
    num_partitions: int | None = None,
    updated_docids_dir: str | None = None,
) -> DataFrame:
    """Merge two postings DataFrames (POSTINGS_SCHEMA + bucket partition
    column) into one. ``updated_docids``: sorted int64 array of every
    docid in the delta's corpus (these are purged from base postings) —
    broadcast to the kernel. For crawl batches too large to broadcast,
    pass ``updated_docids_dir`` instead (a sidecar on shared storage
    written by ``write_updated_docids``): each kernel task then reads
    only the docid-range salt shards it actually touches, with
    per-executor caching. Both paths are result-identical
    (pytest-enforced). ``f_base``/``f_delta``: sound max_score scale
    factors max(1, avgdl_merged/avgdl_source) for pass-through blocks."""
    spark = base.sparkSession
    if (updated_docids is None) == (updated_docids_dir is None):
        raise ValueError(
            "pass exactly one of updated_docids / updated_docids_dir"
        )
    bc = None
    if updated_docids is not None:
        updated_docids = np.ascontiguousarray(
            updated_docids, dtype=np.int64
        )
        bc = spark.sparkContext.broadcast(updated_docids)
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    # src breaks the tie within a (term, salt) group: base row sorts
    # before delta row, so the slow path sees them in a fixed order.
    u = (
        base.withColumn("src", F.lit(0))
        .unionByName(delta.withColumn("src", F.lit(1)))
        # (bucket, salt) co-locates a group's base+delta rows (bucket is
        # a pure function of term) — one shuffle, same key the build uses
        .repartition(num_partitions, "bucket", "salt")
        .sortWithinPartitions("bucket", "term", "salt", "src")
    )

    factors = (float(f_base), float(f_delta))
    patch_needed = any(abs(f - 1.0) > 1e-15 for f in factors)
    get_dd = _dd_provider(bc, updated_docids_dir)

    def kernel(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        from .codec import varbyte_decode
        from .postings import (
            encode_groups_arrow, iter_group_complete_tables,
            new_group_mask_arrow,
        )
        out_schema = pa.schema(
            [
                pa.field("term", pa.string()),
                pa.field("salt", pa.int32()),
                pa.field("df_shard", pa.int64()),
                pa.field("bucket", pa.int32()),
                pa.field(
                    "blocks",
                    pa.list_(
                        pa.struct(
                            [
                                pa.field("first_docid", pa.int64()),
                                pa.field("last_docid", pa.int64()),
                                pa.field("count", pa.int32()),
                                pa.field("max_score", pa.float64()),
                                pa.field("max_tf", pa.int32()),
                                pa.field("docids_bytes", pa.binary()),
                                pa.field("tfs_bytes", pa.binary()),
                                pa.field("doclens_bytes", pa.binary()),
                            ]
                        )
                    ),
                ),
            ]
        )

        def emit_passthrough(tbl: pa.Table):
            cols = {
                name: tbl.column(name).combine_chunks()
                for name in ("term", "salt", "df_shard", "bucket", "blocks")
            }
            la = cols["blocks"]
            if isinstance(la, pa.ChunkedArray):
                la = la.combine_chunks()
            if patch_needed and len(tbl):
                lens = pc.list_value_length(la).to_numpy().astype(np.int64)
                flat = la.flatten()
                src = tbl.column("src").to_numpy()
                row_f = np.where(src == 0, factors[0], factors[1])
                ms = flat.field("max_score").to_numpy() * np.repeat(
                    row_f, lens
                )
                struct = pa.StructArray.from_arrays(
                    [
                        flat.field("first_docid"),
                        flat.field("last_docid"),
                        flat.field("count"),
                        pa.array(ms, pa.float64()),
                        flat.field("max_tf"),
                        flat.field("docids_bytes"),
                        flat.field("tfs_bytes"),
                        flat.field("doclens_bytes"),
                    ],
                    names=[
                        "first_docid", "last_docid", "count", "max_score",
                        "max_tf", "docids_bytes", "tfs_bytes",
                        "doclens_bytes",
                    ],
                )
                offsets = np.zeros(len(tbl) + 1, dtype=np.int32)
                np.cumsum(lens, out=offsets[1:])
                la = pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()), struct
                )
            return pa.RecordBatch.from_arrays(
                [
                    cols["term"], cols["salt"], cols["df_shard"],
                    cols["bucket"], la,
                ],
                schema=out_schema,
            )

        def emit_rebuilt(tbl: pa.Table, dd: np.ndarray):
            """Vectorized re-encode of every collided group at once: bulk
            varbyte-decode of the concatenated block streams, one filter/
            merge pass, one encode_partition_flat — NOT a per-group
            decode/encode loop (~100us of NumPy fixed cost x |groups|
            dominates when a wide update batch makes most groups
            collide)."""
            n_rows = len(tbl)
            mask_rows = new_group_mask_arrow(tbl)
            gid_rows = np.cumsum(mask_rows) - 1
            src = tbl.column("src").to_numpy()
            salt_rows = tbl.column("salt").to_numpy()
            bucket_rows = tbl.column("bucket").to_numpy()
            term_rows = tbl.column("term")
            if isinstance(term_rows, pa.ChunkedArray):
                term_rows = term_rows.combine_chunks()

            la = tbl.column("blocks")
            if isinstance(la, pa.ChunkedArray):
                la = la.combine_chunks()
            blocks_per_row = pc.list_value_length(la).to_numpy().astype(
                np.int64
            )
            flat = la.flatten()
            counts = flat.field("count").to_numpy().astype(np.int64)
            first_docid = flat.field("first_docid").to_numpy()

            def concat_bin(arr):
                # zero-copy concatenation: a null-free BinaryArray's
                # value bytes are contiguous in its data buffer; slice
                # between the first and last offsets instead of
                # materializing one PyBytes per block (millions of
                # transient allocations on a wide update batch)
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)
                lo = offs[arr.offset]
                hi = offs[arr.offset + len(arr)]
                return memoryview(arr.buffers()[2])[lo:hi]

            deltas = varbyte_decode(
                concat_bin(flat.field("docids_bytes"))
            ).astype(np.int64)
            tfs = varbyte_decode(
                concat_bin(flat.field("tfs_bytes"))
            ).astype(np.int64)
            doclens = varbyte_decode(
                concat_bin(flat.field("doclens_bytes"))
            ).astype(np.int64)

            # docid reconstruction across all blocks at once: within a
            # block docid[i] = first_docid + cumsum(deltas); reset the
            # running sum at block starts via a per-block offset
            c = np.cumsum(deltas)
            block_starts = np.zeros(counts.size, dtype=np.int64)
            np.cumsum(counts[:-1], out=block_starts[1:])
            docids = c + np.repeat(first_docid - c[block_starts], counts)

            post_per_row = np.zeros(n_rows, dtype=np.int64)
            row_block_starts = np.zeros(n_rows, dtype=np.int64)
            np.cumsum(blocks_per_row[:-1], out=row_block_starts[1:])
            # rows may have zero blocks in theory; reduceat needs care,
            # but the build never writes empty block lists
            post_per_row = np.add.reduceat(counts, row_block_starts) if (
                counts.size
            ) else post_per_row
            post_row = np.repeat(np.arange(n_rows), post_per_row)

            # purge updated docids from BASE rows
            keep = np.ones(docids.size, dtype=bool)
            if dd.size:
                from .codec import isin_sorted

                keep = ~(isin_sorted(dd, docids) & (src[post_row] == 0))
            docids, tfs, doclens, post_row = (
                docids[keep], tfs[keep], doclens[keep], post_row[keep]
            )
            if docids.size == 0:
                return None
            gid_post = gid_rows[post_row]
            # merge base+delta within each group: the two docid sets are
            # disjoint after the purge, so sorting by (group, docid) is
            # the merge
            order = np.lexsort((docids, gid_post))
            docids, tfs, doclens, post_row, gid_post = (
                docids[order], tfs[order], doclens[order],
                post_row[order], gid_post[order],
            )
            new_group = np.ones(docids.size, dtype=bool)
            new_group[1:] = gid_post[1:] != gid_post[:-1]
            return encode_groups_arrow(
                term_rows.take(pa.array(post_row)),
                salt_rows[post_row],
                bucket_rows[post_row],
                new_group,
                docids,
                tfs,
                doclens,
                avgdl=avgdl_merged,
                block_size=block_size,
            )

        def process(tbl: pa.Table):
            n = len(tbl)
            mask = new_group_mask_arrow(tbl)
            gid = np.cumsum(mask) - 1
            src = tbl.column("src").to_numpy()
            # collision = the (term, salt) group has rows from BOTH
            # indexes (a group may hold several rows per source when
            # bounded-row splits are active, postings.py
            # MAX_POSTINGS_PER_ROW — so test source presence, not
            # group size)
            n_groups = int(gid[-1]) + 1 if n else 0
            has_base = np.zeros(n_groups, dtype=bool)
            has_delta = np.zeros(n_groups, dtype=bool)
            np.logical_or.at(has_base, gid, src == 0)
            np.logical_or.at(has_delta, gid, src == 1)
            in_two_row_group = (has_base & has_delta)[gid]
            # docid set for the salts this table touches (broadcast mode
            # returns the full array — identical search results, since
            # other shards' docids lie outside every block range here)
            dd = get_dd(np.unique(tbl.column("salt").to_numpy()))

            la = tbl.column("blocks")
            if isinstance(la, pa.ChunkedArray):
                la = la.combine_chunks()
            lens = pc.list_value_length(la).to_numpy().astype(np.int64)
            flat = la.flatten()
            blk_hit = _sorted_searchsorted_any(
                dd,
                flat.field("first_docid").to_numpy(),
                flat.field("last_docid").to_numpy(),
            )
            row_hit = (
                np.bincount(
                    np.repeat(np.arange(n), lens),
                    weights=blk_hit.astype(np.float64),
                    minlength=n,
                )
                > 0
            )
            slow_row = in_two_row_group | ((src == 0) & row_hit)
            grp_slow = np.zeros(n_groups, dtype=bool)
            np.logical_or.at(grp_slow, gid, slow_row)
            slow_mask = grp_slow[gid]

            if not slow_mask.all():
                yield emit_passthrough(tbl.filter(pa.array(~slow_mask)))
            if slow_mask.any():
                rb = emit_rebuilt(tbl.filter(pa.array(slow_mask)), dd)
                if rb is not None:
                    yield rb

        for tbl in iter_group_complete_tables(batches):
            yield from process(tbl)

    return u.mapInArrow(kernel, schema=POSTINGS_SCHEMA)
