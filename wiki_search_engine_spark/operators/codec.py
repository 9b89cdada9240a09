"""Delta + varbyte posting-block codec (NumPy, vectorized).

The reference stores posting lists as raw BSON arrays of
``{docId, tf, df, doc_len, tfidf}`` (reference: mongodb_scripts/
insertIndex.py:62-91) — ~50 bytes/posting. We store docid-sorted blocks of
up to BLOCK_SIZE postings, each block holding three varbyte streams:

- ``docids``: deltas of sorted non-negative int64 docids (first delta is
  from the block's ``first_docid``), varbyte;
- ``tfs``:    term frequencies, varbyte;
- ``doclens``: per-posting document lengths, varbyte (the reference keeps
  doc_len inside every posting, insertIndex.py:62-68; we keep that contract
  so the scoring kernel never needs a giant docid->doclen map, SURVEY §7).

Per-block metadata ``(first_docid, last_docid, count, max_score)`` supports
block-max WAND pruning (max_score = max BM25 term contribution over the
block, computed with the final corpus stats at index-build time).

Varbyte: little-endian base-128, high bit set on the final byte of each
value (classic; see e.g. "List Intersection for Web Search" VLDB'18 for the
block-layout rationale — PAPERS.md).

Encoding is NumPy-vectorized: all byte lengths computed in one pass, bytes
scattered into a preallocated buffer. Decoding uses a high-bit scan +
cumulative shifts. No per-posting Python loops.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def isin_sorted(haystack: np.ndarray, needles: np.ndarray) -> np.ndarray:
    """Membership of ``needles`` in a SORTED ``haystack`` via
    searchsorted — the shared idiom for tombstone/purge hit tests
    (the np.minimum clamp guards the out-of-range index searchsorted
    returns for needles above the max element)."""
    if haystack.size == 0:
        return np.zeros(needles.shape, dtype=bool)
    pos = np.searchsorted(haystack, needles)
    return (pos < haystack.size) & (
        haystack[np.minimum(pos, haystack.size - 1)] == needles
    )


def varbyte_encode_with_offsets(values: np.ndarray):
    """Encode a non-negative int64 array to varbyte; also return the byte
    offset of each value (length n+1) so callers can slice sub-ranges of
    the stream without re-encoding (used by the partition-vectorized block
    encoder)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(1, dtype=np.int64)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(7)
    nbytes = np.maximum(nbits, 1)
    offsets = np.concatenate(([0], np.cumsum(nbytes)))
    buf = np.zeros(int(offsets[-1]), dtype=np.uint8)
    maxb = int(nbytes.max())
    rem = v.copy()
    for byte_i in range(maxb):
        mask = nbytes > byte_i
        pos = offsets[:-1][mask] + byte_i
        chunk = (rem[mask] & np.uint64(0x7F)).astype(np.uint8)
        is_last = nbytes[mask] == byte_i + 1
        chunk[is_last] |= 0x80
        buf[pos] = chunk
        rem[mask] >>= np.uint64(7)
    return buf.tobytes(), offsets


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a non-negative int64 array to varbyte bytes."""
    return varbyte_encode_with_offsets(values)[0]


def varbyte_decode(data: bytes) -> np.ndarray:
    """Decode varbyte bytes back to a uint64 array."""
    if not data:
        return np.zeros(0, dtype=np.uint64)
    raw = np.frombuffer(data, dtype=np.uint8)
    is_last = (raw & 0x80) != 0
    # index of each byte within its value: position - start_of_value
    value_id = np.concatenate(([0], np.cumsum(is_last)[:-1]))
    starts = np.concatenate(([0], np.nonzero(is_last)[0][:-1] + 1))
    byte_pos = np.arange(raw.size) - starts[value_id]
    contrib = (raw & 0x7F).astype(np.uint64) << (
        np.uint64(7) * byte_pos.astype(np.uint64)
    )
    nvals = int(is_last.sum())
    out = np.zeros(nvals, dtype=np.uint64)
    np.add.at(out, value_id, contrib)
    return out


def encode_postings(
    docids: np.ndarray, tfs: np.ndarray, doclens: np.ndarray,
    avgdl: float, k1: float = 1.5, b: float = 0.75,
    block_size: int = BLOCK_SIZE,
):
    """Split docid-sorted postings into encoded blocks (reference
    single-list form of ``encode_partition_flat``; kept for the codec
    round-trip tests and as the readable spec of the block format).

    Returns a list of dicts ``{first_docid, last_docid, count, max_score,
    docids_bytes, tfs_bytes, doclens_bytes}``. ``max_score`` is the
    idf-FREE BM25 factor u = tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) — the
    SAME contract as the production encoder and the WAND kernel, which
    multiplies by idf at query time (an idf-baked value here would get
    idf applied twice and, for common terms with idf < 1, UNDERSTATE the
    bound — unsound pruning)."""
    docids = np.asarray(docids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    doclens = np.asarray(doclens, dtype=np.int64)
    order = np.argsort(docids, kind="stable")
    docids, tfs, doclens = docids[order], tfs[order], doclens[order]
    blocks = []
    for start in range(0, docids.size, block_size):
        d = docids[start : start + block_size]
        t = tfs[start : start + block_size]
        dl = doclens[start : start + block_size]
        deltas = np.empty(d.size, dtype=np.uint64)
        deltas[0] = 0  # first docid stored in metadata
        deltas[1:] = np.diff(d).astype(np.uint64)
        tfd = t.astype(np.float64)
        scores = (
            tfd * (k1 + 1.0)
            / (tfd + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl))
        )
        blocks.append(
            {
                "first_docid": int(d[0]),
                "last_docid": int(d[-1]),
                "count": int(d.size),
                "max_score": float(scores.max()),
                "max_tf": int(t.max()),
                "docids_bytes": varbyte_encode(deltas),
                "tfs_bytes": varbyte_encode(t.astype(np.uint64)),
                "doclens_bytes": varbyte_encode(dl.astype(np.uint64)),
            }
        )
    return blocks


def encode_partition_flat(
    new_group: np.ndarray,
    docids: np.ndarray,
    tfs: np.ndarray,
    doclens: np.ndarray,
    avgdl: float,
    k1: float = 1.5,
    b: float = 0.75,
    block_size: int = BLOCK_SIZE,
):
    """Numeric core of the partition encoder: single-pass NumPy over a
    (term, salt, docid)-sorted partition, group boundaries given as the
    ``new_group`` bool mask. Returns columnar block data:

        (group_starts, group_sizes, blocks_per_group_counts,
         first_docid, last_docid, block_counts, max_u, max_tf,
         docids_bytes, tfs_bytes, doclens_bytes)

    where the last three are lists (len = #blocks) of bytes. No per-group
    slicing, no per-group varbyte calls (a per-group encoder pays ~100us x
    |groups| of numpy overhead, which dominates the build on Zipf
    vocabularies with 100k+ tiny groups per partition)."""
    n = len(docids)
    docids = np.asarray(docids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    doclens = np.asarray(doclens, dtype=np.int64)

    group_starts = np.flatnonzero(new_group)
    group_bounds = np.concatenate([group_starts, [n]])
    group_sizes = np.diff(group_bounds)
    gid = np.cumsum(new_group) - 1

    within = np.arange(n) - group_starts[gid]
    block_start_mask = (within % block_size) == 0
    block_starts = np.flatnonzero(block_start_mask)
    block_bounds = np.concatenate([block_starts, [n]])
    block_counts = np.diff(block_bounds)
    block_last = block_bounds[1:] - 1

    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = 0
    deltas[1:] = docids[1:] - docids[:-1]
    deltas[block_starts] = 0  # block-first docid lives in metadata
    enc_d, off_d = varbyte_encode_with_offsets(deltas.astype(np.uint64))
    enc_t, off_t = varbyte_encode_with_offsets(tfs.astype(np.uint64))
    enc_l, off_l = varbyte_encode_with_offsets(doclens.astype(np.uint64))

    tfd = tfs.astype(np.float64)
    u = (
        tfd * (k1 + 1.0)
        / (tfd + k1 * (1.0 - b + b * doclens.astype(np.float64) / avgdl))
    )
    max_u = np.maximum.reduceat(u, block_starts)
    max_tf = np.maximum.reduceat(tfs, block_starts)
    first_docid = docids[block_starts]
    last_docid = docids[block_last]
    block_gid = gid[block_starts]
    blocks_per_group_counts = np.bincount(
        block_gid, minlength=group_starts.size
    )

    docids_bytes = [
        enc_d[off_d[s] : off_d[e]]
        for s, e in zip(block_bounds[:-1], block_bounds[1:])
    ]
    tfs_bytes = [
        enc_t[off_t[s] : off_t[e]]
        for s, e in zip(block_bounds[:-1], block_bounds[1:])
    ]
    doclens_bytes = [
        enc_l[off_l[s] : off_l[e]]
        for s, e in zip(block_bounds[:-1], block_bounds[1:])
    ]
    return (
        group_starts, group_sizes, blocks_per_group_counts,
        first_docid, last_docid, block_counts, max_u, max_tf,
        docids_bytes, tfs_bytes, doclens_bytes,
    )


def decode_block(block) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one block -> (docids:int64, tfs:int64, doclens:int64)."""
    deltas = varbyte_decode(bytes(block["docids_bytes"]))
    docids = (
        np.cumsum(deltas.astype(np.int64)) + np.int64(block["first_docid"])
    )
    tfs = varbyte_decode(bytes(block["tfs_bytes"])).astype(np.int64)
    doclens = varbyte_decode(bytes(block["doclens_bytes"])).astype(np.int64)
    return docids, tfs, doclens


def decode_posting_list(blocks) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode and concatenate all blocks of one term (docid-sorted)."""
    if not blocks:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    parts = [decode_block(b) for b in blocks]
    return (
        np.concatenate([p[0] for p in parts]),
        np.concatenate([p[1] for p in parts]),
        np.concatenate([p[2] for p in parts]),
    )
