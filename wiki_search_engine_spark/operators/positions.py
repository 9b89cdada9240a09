"""Positional index sidecar: per-(term, doc) position lists, packed
varbyte rows in the same bucket/salt layout as the postings table.

The postings table stores (docid, tf, doc_len) per term — enough for
BM25 but not for phrase adjacency. This sidecar is the Lucene ``.pos``
analogue, built Spark-first:

- the positions pass (``positions_packed``) emits one row per
  (doc, term) whose payload is the doc's position list ALREADY
  delta+varbyte encoded in the scan kernel — so the one shuffle ships
  |distinct (doc, term)| rows of ~1-byte-per-position blobs, the same
  row count as the postings build, NOT |tokens| rows. (The first,
  token-per-row formulation measured 0.54 scaling efficiency
  local[8]->local[32] on the dev box: the shuffle's per-token row
  overhead saturated the memory bus. Pre-packing moves those bytes
  into the compute-dominated kernel, which scales.)
- one shuffle (bucket, salt), identical partitioning to build_postings,
  then a mapInArrow encoder packs each (term, salt) group into rows of
  ``POSITIONS_SCHEMA``: docids delta+varbyte, per-doc position counts,
  doc lengths, and the docs' pre-encoded position blobs concatenated
  by zero-copy slices of the Arrow binary buffer (per-doc deltas are
  row-local by construction: each doc's first position is absolute).
  One varbyte pass per metadata stream, no per-row Python on the
  token dimension — the same rule as the postings encoder.
- rows cap at MAX_POSITIONS_PER_ROW positions, split ONLY on document
  boundaries (each row is self-decoding: its first docid and each
  doc's first position are absolute), so a stopword-scale term never
  becomes a multi-GB parquet cell.

Layout: parquet partitionBy(bucket); within a bucket file rows are
term-sorted, so a query term's rows are found by one directory prune
(driver-computable md5 bucket) + row-group min/max pruning + an
``In(term)`` filter — the exact read pattern the postings serving
paths already use.

The reference has no positional structure at all (its Mongo schema
stores tf-only postings, mongodb_scripts/insertIndex.py:62-68);
queries over it are bag-of-words. This sidecar is what a fulltext
index at 100 TB needs for the phrase queries of operators/phrase.py
without re-scanning the corpus per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField,
    StructType,
)

from .postings import (
    DEFAULT_BUCKETS,
    iter_group_complete_tables,
    new_group_mask_arrow,
    term_bucket,
    term_bucket_col,
)

POSITIONS_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("salt", IntegerType()),
        StructField("bucket", IntegerType()),
        StructField("n_docs", LongType()),
        StructField("docids_bytes", BinaryType()),
        StructField("counts_bytes", BinaryType()),
        StructField("doclens_bytes", BinaryType()),
        StructField("pos_bytes", BinaryType()),
    ]
)

# Positions per output row. Splits happen at document boundaries so a
# row always decodes standalone. 2^22 positions ~ 4-8 MB varbyte.
MAX_POSITIONS_PER_ROW = 1 << 22

FLAT_SCHEMA = "docid long, term string, apos int, doc_len int"


def positions_flat(
    corpus: DataFrame, stem: bool = False
) -> DataFrame:
    """(docid, text) -> one row per surviving token:
    (docid, term, apos, doc_len). Same analyzed stream (and positions)
    as operators/phrase.py — the shared vectorized pipeline."""
    import numpy as np
    import pandas as pd

    def fn(batches):
        from ..functions.analyzer import CLEAN_RE, STOPWORDS, porter_stem

        for pdf in batches:
            texts = pdf["text"].fillna("")
            token_lists = (
                texts.str.replace(CLEAN_RE, " ", regex=True)
                .str.lower()
                .str.split()
            )
            lens = token_lists.str.len().fillna(0).astype(np.int64)
            if lens.sum() == 0:
                continue
            flat_docids = np.repeat(
                pdf["docid"].to_numpy(dtype=np.int64), lens.to_numpy()
            )
            flat_terms = pd.Series(
                np.concatenate([t for t in token_lists if t]),
                dtype="object",
            )
            junk = np.zeros(flat_terms.size, dtype=bool)
            maybe = (
                (flat_terms.str.len() > 4)
                & flat_terms.str.slice(0, 1).isin(tuple("0123456789"))
            ).to_numpy()
            if maybe.any():
                junk[maybe] = (
                    flat_terms[maybe]
                    .str.fullmatch("[0-9]+", na=False)
                    .to_numpy()
                )
            keep = ~junk
            if stem:
                keep &= ~flat_terms.isin(STOPWORDS).to_numpy()
            flat_docids = flat_docids[keep]
            flat_terms = flat_terms[keep]
            if not flat_terms.size:
                continue
            if stem:
                uniq = pd.unique(flat_terms)
                flat_terms = flat_terms.map(
                    {t: porter_stem(t) for t in uniq}
                )
            starts = np.flatnonzero(
                np.r_[True, flat_docids[1:] != flat_docids[:-1]]
            )
            run_lens = np.diff(np.r_[starts, flat_docids.size])
            apos = np.arange(flat_docids.size) - np.repeat(
                starts, run_lens
            )
            yield pd.DataFrame(
                {
                    "docid": flat_docids,
                    "term": flat_terms.to_numpy(),
                    "apos": apos.astype("int32"),
                    "doc_len": np.repeat(run_lens, run_lens).astype(
                        "int32"
                    ),
                }
            )

    return corpus.select("docid", "text").mapInPandas(
        fn, schema=FLAT_SCHEMA
    )


PACKED_SCHEMA = (
    "docid long, term string, doc_len int, npos int, pos_blob binary"
)


def packed_frame(docids, texts, stem: bool):
    """Vectorized batch kernel: (docids, texts) -> pandas DataFrame
    (docid, term, doc_len, npos, pos_blob), one row per distinct
    (doc, term), pos_blob = the doc's ascending analyzed positions
    delta+varbyte encoded (first absolute) — the exact byte run the
    sidecar stores. npos == tf by definition (a term occurs once per
    position), so this kernel SUBSUMES functions/analyzer.tokenize_frame
    for the base/porter analyzers: the build's tokens staging stage
    calls it once and both the postings and the positions sidecar derive
    from its output — one corpus scan + tokenize total
    (pytest: test_positions_match_tokens_table gates tf==npos, doc_len
    identity against tokenize_frame)."""
    import numpy as np
    import pandas as pd

    from ..functions.analyzer import CLEAN_RE, STOPWORDS, porter_stem
    from .codec import varbyte_encode_with_offsets

    # same docid contract as tokenize_frame (operators/tokenize.py
    # with_docid): negative ids route inconsistently between the build's
    # unsigned salt shift and driver-side arithmetic shifts — fail loudly
    _ids = np.asarray(docids, dtype=np.int64)
    if _ids.size and int(_ids.min()) < 0:
        raise ValueError(
            f"negative docid {int(_ids.min())} in corpus batch — docids "
            "must be non-negative 63-bit values (with_docid contract); "
            "rekey the corpus or drop the pre-existing docid column"
        )

    empty = pd.DataFrame(
        {
            "docid": pd.Series([], dtype="int64"),
            "term": pd.Series([], dtype="object"),
            "doc_len": pd.Series([], dtype="int32"),
            "npos": pd.Series([], dtype="int32"),
            "pos_blob": pd.Series([], dtype="object"),
        }
    )
    texts = pd.Series(texts).fillna("")
    token_lists = (
        texts.str.replace(CLEAN_RE, " ", regex=True)
        .str.lower()
        .str.split()
    )
    lens = token_lists.str.len().fillna(0).astype(np.int64)
    if lens.sum() == 0:
        return empty
    flat_docids = np.repeat(
        np.asarray(docids, dtype=np.int64), lens.to_numpy()
    )
    flat_terms = pd.Series(
        np.concatenate([t for t in token_lists if t]),
        dtype="object",
    )
    junk = np.zeros(flat_terms.size, dtype=bool)
    maybe = (
        (flat_terms.str.len() > 4)
        & flat_terms.str.slice(0, 1).isin(tuple("0123456789"))
    ).to_numpy()
    if maybe.any():
        junk[maybe] = (
            flat_terms[maybe]
            .str.fullmatch("[0-9]+", na=False)
            .to_numpy()
        )
    keep = ~junk
    if stem:
        keep &= ~flat_terms.isin(STOPWORDS).to_numpy()
    flat_docids = flat_docids[keep]
    flat_terms = flat_terms[keep]
    if not flat_terms.size:
        return empty
    if stem:
        uniq = pd.unique(flat_terms)
        flat_terms = flat_terms.map(
            {t: porter_stem(t) for t in uniq}
        )
    starts = np.flatnonzero(
        np.r_[True, flat_docids[1:] != flat_docids[:-1]]
    )
    run_lens = np.diff(np.r_[starts, flat_docids.size])
    apos = np.arange(flat_docids.size) - np.repeat(
        starts, run_lens
    )
    doc_len = np.repeat(run_lens, run_lens)
    # stable sort to (doc, term) groups; apos stays ascending
    codes, uniques = pd.factorize(flat_terms, sort=False)
    order = np.lexsort((apos, codes, flat_docids))
    d_s = flat_docids[order]
    c_s = codes[order]
    p_s = apos[order]
    dl_s = doc_len[order]
    g_start = np.r_[
        True, (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
    ]
    prev = np.r_[np.int64(0), p_s[:-1]]
    pdelta = np.where(g_start, p_s, p_s - prev)
    buf, off = varbyte_encode_with_offsets(pdelta)
    buf = memoryview(buf)
    gs = np.flatnonzero(g_start)
    ge = np.r_[gs[1:], d_s.size]
    return pd.DataFrame(
        {
            "docid": d_s[gs],
            "term": uniques.take(c_s[gs]),
            "doc_len": dl_s[gs].astype("int32"),
            "npos": (ge - gs).astype("int32"),
            "pos_blob": [
                bytes(buf[off[a]:off[b]])
                for a, b in zip(gs, ge)
            ],
        }
    )


def positions_packed(
    corpus: DataFrame, stem: bool = False
) -> DataFrame:
    """(docid, text) -> one row per (doc, term):
    (docid, term, doc_len, npos, pos_blob) — ``packed_frame`` over each
    Arrow batch, produced in the scan kernel so the shuffle never sees
    per-token rows. Same analyzed stream as positions_flat (pytest
    roundtrip identity). Standalone form; the full build instead stages
    this output ONCE in tokens/ (plans/build.py) so postings and the
    sidecar share a single corpus scan."""

    def fn(batches):
        for pdf in batches:
            out = packed_frame(pdf["docid"], pdf["text"], stem)
            if len(out):
                yield out

    return corpus.select("docid", "text").mapInPandas(
        fn, schema=PACKED_SCHEMA
    )


def _split_rows_by_weight(
    group_start: "np.ndarray",
    weights: "np.ndarray",
    cap: int,
) -> "np.ndarray":
    """Row-start mask: group starts plus extra starts injected at
    input-row (= document) boundaries whenever a row would exceed
    ``cap`` total positions. Python loops only over the (rare)
    oversized groups."""
    import numpy as np

    starts = np.flatnonzero(group_start)
    ends = np.r_[starts[1:], group_start.size]
    out = group_start.copy()
    csum = np.cumsum(weights)
    totals = csum[ends - 1] - csum[starts] + weights[starts]
    for s, e in zip(starts[totals > cap], ends[totals > cap]):
        acc = 0
        for i in range(s, e):
            w = int(weights[i])
            if acc and acc + w > cap:
                out[i] = True
                acc = 0
            acc += w
    return out


def _encode_positions_table(
    tbl, cap: int = MAX_POSITIONS_PER_ROW
):
    """One sorted Arrow table of PACKED rows ((bucket, term, salt,
    docid) order, one row per (doc, term), groups complete) ->
    POSITIONS_SCHEMA RecordBatch. Metadata (docid deltas, counts, doc
    lens) is one varbyte pass each; the position payload is
    concatenated by ZERO-COPY slices of the Arrow binary buffer —
    per-doc blobs are row-local by construction (each doc's first
    position absolute), so concatenation in docid order IS the row
    format. Only one term string per output row reaches Python."""
    import numpy as np
    import pyarrow as pa

    from .codec import varbyte_encode_with_offsets

    term_col = tbl.column("term")
    if isinstance(term_col, pa.ChunkedArray):
        term_col = term_col.combine_chunks()
    blob_col = tbl.column("pos_blob")
    if isinstance(blob_col, pa.ChunkedArray):
        blob_col = blob_col.combine_chunks()
    docid = tbl.column("docid").to_numpy()
    npos = tbl.column("npos").to_numpy().astype(np.int64)
    dl = tbl.column("doc_len").to_numpy().astype(np.int64)
    salt = tbl.column("salt").to_numpy()
    bucket = tbl.column("bucket").to_numpy()
    n = len(tbl)

    g_mask = new_group_mask_arrow(tbl)
    row_start = _split_rows_by_weight(g_mask, npos, cap)

    prev_docid = np.r_[np.int64(0), docid[:-1]]
    ddelta = np.where(row_start, docid, docid - prev_docid)

    d_buf, d_off = varbyte_encode_with_offsets(ddelta)
    c_buf, c_off = varbyte_encode_with_offsets(npos)
    l_buf, l_off = varbyte_encode_with_offsets(dl)
    d_buf = memoryview(d_buf)
    c_buf = memoryview(c_buf)
    l_buf = memoryview(l_buf)

    # zero-copy payload concatenation: the binary column's values are
    # contiguous in its data buffer, so a doc range's concatenated
    # blobs = data[valoff[s]:valoff[e]]
    valoff = np.frombuffer(blob_col.buffers()[1], dtype=np.int32)
    blob_data = memoryview(blob_col.buffers()[2])
    base = blob_col.offset

    r_idx = np.flatnonzero(row_start)
    r_end = np.r_[r_idx[1:], n]

    terms = term_col.take(pa.array(r_idx)).to_pylist()
    return pa.RecordBatch.from_arrays(
        [
            pa.array(terms, pa.string()),
            pa.array(salt[r_idx].astype(np.int32), pa.int32()),
            pa.array(bucket[r_idx].astype(np.int32), pa.int32()),
            pa.array((r_end - r_idx).astype(np.int64), pa.int64()),
            pa.array(
                [
                    bytes(d_buf[d_off[a]:d_off[b]])
                    for a, b in zip(r_idx, r_end)
                ],
                pa.binary(),
            ),
            pa.array(
                [
                    bytes(c_buf[c_off[a]:c_off[b]])
                    for a, b in zip(r_idx, r_end)
                ],
                pa.binary(),
            ),
            pa.array(
                [
                    bytes(l_buf[l_off[a]:l_off[b]])
                    for a, b in zip(r_idx, r_end)
                ],
                pa.binary(),
            ),
            pa.array(
                [
                    bytes(
                        blob_data[
                            valoff[base + a]:valoff[base + b]
                        ]
                    )
                    for a, b in zip(r_idx, r_end)
                ],
                pa.binary(),
            ),
        ],
        names=[
            "term", "salt", "bucket", "n_docs", "docids_bytes",
            "counts_bytes", "doclens_bytes", "pos_bytes",
        ],
    )


def build_positions(
    packed: DataFrame,
    salt_bits: int = 3,
    n_buckets: int = DEFAULT_BUCKETS,
    num_partitions: int | None = None,
    max_positions_per_row: int = MAX_POSITIONS_PER_ROW,
) -> DataFrame:
    """packed (docid, term, doc_len, npos, pos_blob) — one row per
    (doc, term), from ``positions_packed`` — -> POSITIONS_SCHEMA rows.
    Exactly ONE shuffle of postings-sized rows, same (bucket, salt)
    partitioning and (bucket, term, salt, docid) ordering contract as
    build_postings — a phrase query's terms land in the same prunable
    layout as their postings."""
    shift = 63 - salt_bits
    if num_partitions is None:
        num_partitions = (
            packed.sparkSession.sparkContext.defaultParallelism
        )
    num_partitions = min(num_partitions, n_buckets << salt_bits)
    salted = packed.withColumn(
        "salt",
        F.shiftrightunsigned(F.col("docid"), shift).cast("int"),
    )
    if "bucket" not in packed.columns:
        # staged inputs (plans/build.py tokens/) arrive pre-bucketed —
        # the bucket value rides the partition directory for free
        salted = salted.withColumn(
            "bucket", term_bucket_col(F.col("term"), n_buckets)
        )
    salted = (
        salted.repartition(num_partitions, "bucket", "salt")
        .sortWithinPartitions("bucket", "term", "salt", "docid")
    )

    def encode_stream(batches):
        for tbl in iter_group_complete_tables(batches):
            yield _encode_positions_table(
                tbl, cap=max_positions_per_row
            )

    return salted.mapInArrow(encode_stream, schema=POSITIONS_SCHEMA)


def decode_positions_row(row) -> tuple:
    """One POSITIONS_SCHEMA row -> (docids int64[n_docs],
    doclens int64[n_docs], offsets int64[n_docs+1], pos int64[total]):
    ``pos[offsets[i]:offsets[i+1]]`` are doc i's ascending absolute
    positions."""
    import numpy as np

    from .codec import varbyte_decode

    ddelta = varbyte_decode(bytes(row["docids_bytes"])).astype(np.int64)
    counts = varbyte_decode(bytes(row["counts_bytes"])).astype(np.int64)
    doclens = varbyte_decode(bytes(row["doclens_bytes"])).astype(
        np.int64
    )
    pdelta = varbyte_decode(bytes(row["pos_bytes"])).astype(np.int64)
    docids = np.cumsum(ddelta)
    offsets = np.r_[np.int64(0), np.cumsum(counts)]
    cs = np.cumsum(pdelta)
    if counts.size:
        starts = offsets[:-1]
        base = cs[starts] - pdelta[starts]
        pos = cs - np.repeat(base, counts)
    else:
        pos = cs
    return docids, doclens, offsets, pos


def positions_hits_df(
    spark,
    index_dir: str,
    terms: list[str],
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Distributed read of the sidecar for a phrase: (docid, apos,
    slot, doc_len) hit rows — the same shape operators/phrase.py's
    corpus kernel emits, but from the index (touches only the phrase
    terms' bucket directories + In-pruned row groups, never the
    corpus). Feed to phrase.occurrences_from_hits / phrase ranking."""
    import os

    import numpy as np
    import pandas as pd

    slots: dict[str, list[int]] = {}
    for i, t in enumerate(terms):
        slots.setdefault(t, []).append(i)
    buckets = sorted(
        {term_bucket(t, n_buckets) for t in slots}
    )
    paths = [
        p
        for b in buckets
        if os.path.isdir(p := f"{index_dir}/positions/bucket={b}")
    ]
    if not paths:
        return spark.createDataFrame(
            [], "docid long, apos int, slot int, doc_len int"
        )
    rows = spark.read.parquet(*paths).filter(
        F.col("term").isin(list(slots))
    )

    def explode(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                docids, doclens, offsets, pos = decode_positions_row(row)
                counts = np.diff(offsets)
                flat_doc = np.repeat(docids, counts)
                flat_dl = np.repeat(doclens, counts)
                for slot in slots[row["term"]]:
                    out.append(
                        pd.DataFrame(
                            {
                                "docid": flat_doc,
                                "apos": pos.astype("int32"),
                                "slot": np.int32(slot),
                                "doc_len": flat_dl.astype("int32"),
                            }
                        )
                    )
            if out:
                yield pd.concat(out, ignore_index=True)

    return rows.mapInPandas(
        explode, schema="docid long, apos int, slot int, doc_len int"
    )


def purge_positions(
    rows: DataFrame, updated_docids: "np.ndarray"
) -> DataFrame:
    """Drop the given (sorted) docids from packed sidecar rows —
    the positions half of incremental merge/delete.

    Because every doc's position run starts with an ABSOLUTE value
    (row format invariant), a retained doc's payload bytes pass
    through untouched: purging a row slices the kept docs' byte
    ranges out of pos_bytes (varbyte value boundaries located by the
    terminator-bit cumsum — the position VALUES are never decoded)
    and re-encodes only the small docid/count/doclen metadata
    streams. Rows with no hits pass through raw; rows losing every
    doc drop."""
    import numpy as np
    import pyarrow as pa

    from .codec import (
        isin_sorted,
        varbyte_decode,
        varbyte_encode,
    )

    updated = np.asarray(updated_docids, dtype=np.int64)

    def fn(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch]).combine_chunks()
            out = {name: [] for name in POSITIONS_SCHEMA.names}
            for row in tbl.to_pylist():
                ddelta = varbyte_decode(
                    bytes(row["docids_bytes"])
                ).astype(np.int64)
                docids = np.cumsum(ddelta)
                hit = isin_sorted(updated, docids)
                if not hit.any():
                    for name in out:
                        out[name].append(row[name])
                    continue
                keep = ~hit
                if not keep.any():
                    continue
                counts = varbyte_decode(
                    bytes(row["counts_bytes"])
                ).astype(np.int64)
                doclens = varbyte_decode(
                    bytes(row["doclens_bytes"])
                ).astype(np.int64)
                blob = np.frombuffer(
                    bytes(row["pos_bytes"]), dtype=np.uint8
                )
                # byte offset of each doc's payload: the i-th value
                # ends at the i-th terminator byte (high bit set)
                val_ends = np.flatnonzero((blob & 0x80) != 0) + 1
                doc_val_bounds = np.r_[
                    np.int64(0), np.cumsum(counts)
                ]
                doc_byte_bounds = np.r_[
                    np.int64(0), val_ends[doc_val_bounds[1:] - 1]
                ]
                kept_idx = np.flatnonzero(keep)
                new_blob = b"".join(
                    blob[
                        doc_byte_bounds[i]:doc_byte_bounds[i + 1]
                    ].tobytes()
                    for i in kept_idx
                )
                kept_docids = docids[keep]
                new_ddelta = np.r_[
                    kept_docids[:1],
                    np.diff(kept_docids),
                ]
                out["term"].append(row["term"])
                out["salt"].append(row["salt"])
                out["bucket"].append(row["bucket"])
                out["n_docs"].append(int(keep.sum()))
                out["docids_bytes"].append(varbyte_encode(new_ddelta))
                out["counts_bytes"].append(
                    varbyte_encode(counts[keep])
                )
                out["doclens_bytes"].append(
                    varbyte_encode(doclens[keep])
                )
                out["pos_bytes"].append(new_blob)
            if out["term"]:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(out["term"], pa.string()),
                        pa.array(out["salt"], pa.int32()),
                        pa.array(out["bucket"], pa.int32()),
                        pa.array(out["n_docs"], pa.int64()),
                        pa.array(out["docids_bytes"], pa.binary()),
                        pa.array(out["counts_bytes"], pa.binary()),
                        pa.array(out["doclens_bytes"], pa.binary()),
                        pa.array(out["pos_bytes"], pa.binary()),
                    ],
                    names=list(POSITIONS_SCHEMA.names),
                )

    return rows.mapInArrow(fn, schema=POSITIONS_SCHEMA)
