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


def merge_postings_tables(
    base: DataFrame,
    delta: DataFrame,
    updated_docids: np.ndarray,
    avgdl_merged: float,
    f_base: float,
    f_delta: float,
    block_size: int = BLOCK_SIZE,
    num_partitions: int | None = None,
) -> DataFrame:
    """Merge two postings DataFrames (POSTINGS_SCHEMA + bucket partition
    column) into one. ``updated_docids``: sorted int64 array of every
    docid in the delta's corpus (these are purged from base postings).
    ``f_base``/``f_delta``: sound max_score scale factors
    max(1, avgdl_merged/avgdl_source) for pass-through blocks."""
    spark = base.sparkSession
    updated_docids = np.ascontiguousarray(updated_docids, dtype=np.int64)
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

    def kernel(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        from .codec import decode_posting_list, encode_postings

        dd = bc.value
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

        def new_group_mask(tbl: pa.Table) -> np.ndarray:
            term = tbl.column("term")
            salt = tbl.column("salt").to_numpy()
            n = len(tbl)
            mask = np.ones(n, dtype=bool)
            if n > 1:
                ne = pc.not_equal(
                    term.slice(1), term.slice(0, n - 1)
                ).combine_chunks()
                mask[1:] = ne.to_numpy(zero_copy_only=False) | (
                    salt[1:] != salt[:-1]
                )
            return mask

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

        def emit_rebuilt(tbl: pa.Table):
            rows = tbl.to_pylist()
            out: list[dict] = []
            i = 0
            while i < len(rows):
                group = [rows[i]]
                while (
                    i + 1 < len(rows)
                    and rows[i + 1]["term"] == rows[i]["term"]
                    and rows[i + 1]["salt"] == rows[i]["salt"]
                ):
                    group.append(rows[i + 1])
                    i += 1
                i += 1
                d_parts, t_parts, l_parts = [], [], []
                for row in group:
                    d, t, dl = decode_posting_list(row["blocks"])
                    if row["src"] == 0 and dd.size and d.size:
                        pos = np.searchsorted(dd, d)
                        hit = (pos < dd.size) & (
                            dd[np.minimum(pos, dd.size - 1)] == d
                        )
                        d, t, dl = d[~hit], t[~hit], dl[~hit]
                    d_parts.append(d)
                    t_parts.append(t)
                    l_parts.append(dl)
                d = np.concatenate(d_parts)
                if d.size == 0:
                    continue  # term vanished from this shard
                t = np.concatenate(t_parts)
                dl = np.concatenate(l_parts)
                # base-minus-updated and delta docid sets are disjoint,
                # so a plain sort (inside encode_postings) is a merge
                blocks = encode_postings(
                    d, t, dl, idf=1.0, avgdl=avgdl_merged,
                    block_size=block_size,
                )
                out.append(
                    {
                        "term": group[0]["term"],
                        "salt": group[0]["salt"],
                        "df_shard": int(d.size),
                        "bucket": group[0]["bucket"],
                        "blocks": blocks,
                    }
                )
            if not out:
                return None
            return pa.RecordBatch.from_pylist(out, schema=out_schema)

        def process(tbl: pa.Table):
            n = len(tbl)
            mask = new_group_mask(tbl)
            gid = np.cumsum(mask) - 1
            gsize = np.bincount(gid)
            in_two_row_group = gsize[gid] == 2
            src = tbl.column("src").to_numpy()

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
            grp_slow = np.zeros(gsize.size, dtype=bool)
            np.logical_or.at(grp_slow, gid, slow_row)
            slow_mask = grp_slow[gid]

            if not slow_mask.all():
                yield emit_passthrough(tbl.filter(pa.array(~slow_mask)))
            if slow_mask.any():
                rb = emit_rebuilt(tbl.filter(pa.array(slow_mask)))
                if rb is not None:
                    yield rb

        carry: "pa.Table | None" = None
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            if carry is not None:
                tbl = pa.concat_tables([carry, tbl])
            tbl = tbl.combine_chunks()
            carry = None
            n = len(tbl)
            if n == 0:
                continue
            mask = new_group_mask(tbl)
            last_start = int(np.flatnonzero(mask)[-1])
            carry = tbl.slice(last_start)
            if last_start > 0:
                yield from process(tbl.slice(0, last_start).combine_chunks())
        if carry is not None and len(carry):
            yield from process(carry.combine_chunks())

    return u.mapInArrow(kernel, schema=POSTINGS_SCHEMA)
