"""Deduplication operators for large-scale training-data pipelines.

The reference deduplicates at crawl time only (md5-visited set,
Crawler/crawler.py:145-150; first-wins normalized-title dedup,
crawler.py:309-322). A 100 TB corpus pipeline needs content-level dedup as
a first-class batch operator family; everything here is declarative
DataFrame ops (JVM-side, shuffle-analyzed) except SimHash, which is an
Arrow-vectorized mapInPandas kernel.

Portability note: candidate hashing uses md5 (identical in Spark and
DuckDB) so each operator has an exact SQL oracle; at production scale
xxhash64 would halve the hash cost, md5 keeps the correctness gate exact.

Scale notes per operator:
- exact_dedup: one shuffle on the content hash; skew-free (hashes uniform).
- first_wins_dedup: window row_number over the key — the Spark form of the
  reference's title dedup (SURVEY §1.1.5).
- minhash_lsh_*: signatures are per-row (no shuffle); banding explodes to
  (rows x bands) then shuffles on band key — band buckets are the classic
  LSH candidate blocking, heavy keys only when near-dup clusters are huge.
- ngram_jaccard_pairs with candidates: per-pair array_intersect over
  per-doc shingle arrays — the shingle relation is never self-joined, so
  hot shingles cannot blow up m^2 (15x the unrestricted form on a
  hot-shingle corpus, bench.py jaccard_hot_*). Without candidates:
  shingle self-join, small corpora/tests only.
- simhash/simhash_near_dups: one batch-vectorized hash kernel (planned
  once — audited), group-to-array band expansion, no joins.

None of the candidate generators self-join their expensive upstream:
a self-join plans the pipeline twice with no exchange reuse across the
sides (measured; see minhash_lsh_candidates body comment). All blocking
follows groupBy(bucket) -> sorted array -> JVM-side ordered-pair
expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textstats import shingles


def normalized_text(col):
    """whitespace-collapsed, lowercased, trimmed content key."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct normalized content: (content_md5, keep_id,
    dup_count). keep_id = min id (deterministic winner)."""
    return (
        df.select(
            F.md5(normalized_text(F.col(text_col))).alias("content_md5"),
            F.col(id_col),
        )
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("dup_count"),
        )
    )


def first_wins_dedup(
    df: DataFrame, key, order_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Keep the first row per key in ``order_col`` order — the reference's
    crawl-time title dedup (first writer wins, crawler.py:316-321)."""
    w = Window.partitionBy(key).orderBy(F.asc(order_col), F.asc(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
    hash_family: str = "md5",
) -> DataFrame:
    """Per-doc minhash signature as ``num_hashes`` columns h0..h{n-1}.

    The per-seed hash family is INDEPENDENT: h_s(shingle) =
    hash("<s>", shingle) — seeded re-hashes, so band-collision
    probability approximates Jaccard^rows_per_band (overlapping windows
    of one digest, the previous scheme, are strongly correlated: adjacent
    windows share 15 hex chars). Two families:

    - ``md5`` (default): h_s = md5('<s>|' || shingle) — the identical
      expression runs in DuckDB, so this family is the oracle-exact
      correctness gate;
    - ``xxhash64`` (production): h_s = xxhash64(lit(s), shingle) — pure
      JVM codegen, no digest-to-hex materialization, roughly half the
      hash CPU of 16 md5s (bench.py minhash_lsh vs minhash_lsh_xx64).
      Spark-specific (not replayable in DuckDB) — candidate QUALITY is
      gated instead by the planted-dup superset pytest, which both
      families must pass.

    Either way a single whole-stage-codegen projection: one explode +
    ``num_hashes`` hash columns + one hash-agg with ``num_hashes``
    partial-min expressions. No higher-order functions (Catalyst
    interprets HOF lambdas row-at-a-time — an early formulation spent
    ~150s on 5k docs recomputing shingles+md5 16x interpreted; this
    shape takes ~2s), and map-side partial aggregation shrinks the
    shuffle to |docs| rows. Docs with fewer than ``shingle_n`` tokens
    produce no signature row (explode drops empty shingle arrays)."""
    if hash_family not in ("md5", "xxhash64"):
        raise ValueError(
            f"unknown hash_family {hash_family!r}: 'md5' (oracle-exact) "
            "or 'xxhash64' (production)"
        )
    sh = df.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("shingle"),
    )
    if hash_family == "xxhash64":
        hcols = [
            F.xxhash64(F.lit(s), F.col("shingle")).alias(f"m{s}")
            for s in range(num_hashes)
        ]
    else:
        hcols = [
            F.md5(
                F.concat_ws("|", F.lit(str(s)), F.col("shingle"))
            ).alias(f"m{s}")
            for s in range(num_hashes)
        ]
    hashed = sh.select(id_col, *hcols)
    return hashed.groupBy(id_col).agg(
        *[F.min(f"m{s}").alias(f"h{s}") for s in range(num_hashes)]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    hash_family: str = "md5",
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b, n_bands matched).

    Signature split into ``bands`` bands of num_hashes/bands rows; docs
    sharing any band hash become a candidate pair. ``hash_family``: see
    minhash_signatures — 'md5' is the DuckDB-oracle-exact default,
    'xxhash64' the cheaper JVM-codegen production family (both verified
    as planted-dup candidate supersets in pytest)."""
    if num_hashes % bands:
        raise ValueError(
            f"num_hashes={num_hashes} not divisible by bands={bands} — "
            "trailing hashes would be silently ignored, changing the "
            "collision probability the caller reasons about"
        )
    rows = num_hashes // bands
    sig = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_n, hash_family
    )

    def band_hash(b):
        cols = [F.col(f"h{b * rows + r}") for r in range(rows)]
        if hash_family == "xxhash64":
            return F.xxhash64(*cols)
        return F.md5(F.concat_ws("|", *cols))

    band_rows = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        band_hash(b).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select(id_col, "bh.band", "bh.band_hash")
    # bucket-grouped pair generation, NOT a band_rows self-join: a self-
    # join plans the signature pipeline (scan -> shingle -> md5 -> 16-min
    # agg) TWICE (no exchange reuse across the join sides) — at corpus
    # scale that doubles the most expensive pass. Grouping each LSH
    # bucket to an array and expanding ordered pairs JVM-side keeps one
    # linear pipeline; per-bucket pair blowup is identical to the join's
    # (both are m^2 on an m-doc bucket).
    ids = F.col("ids")
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        band_rows.groupBy("band", "band_hash")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_bands"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact word-shingle Jaccard for pairs >= threshold.

    With ``candidates`` (e.g. LSH output) each candidate pair is scored
    DIRECTLY: per-doc distinct shingle arrays join the pair relation by
    id (two hash joins) and the intersection size is computed JVM-side
    with array_intersect — the shingle relation is never self-joined, so
    a hot shingle shared by m docs cannot enumerate m^2 pairs. (The r1
    formulation applied the candidate restriction only AFTER the full
    shingle self-join aggregation; Catalyst does not push a semi-join
    below an aggregation, so the restriction never limited the expensive
    pass. tools/explain_audit.py now asserts the candidates path plans
    no shingle-equality join.)

    Without ``candidates``, pairs sharing >=1 shingle are compared via
    the shingle self-join — quadratic on hot shingles; small corpora /
    tests only."""
    sh = df.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("shingle"),
    ).distinct()
    if candidates is not None:
        # restrict BEFORE the expensive pass: Catalyst does not push a
        # join below an aggregation, so without this semi-join the
        # per-doc array build would still run over the ENTIRE corpus
        # even for a handful of candidate pairs
        cand_ids = (
            candidates.select(F.col("id_a").alias(id_col))
            .unionByName(candidates.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        doc_sh = (
            sh.join(cand_ids, id_col, "left_semi")
            .groupBy(id_col)
            .agg(
                F.sort_array(F.collect_list("shingle")).alias("sh_arr"),
                F.count("*").alias("n_sh"),
            )
        )
        a = doc_sh.select(
            F.col(id_col).alias("id_a"),
            F.col("sh_arr").alias("_sa"),
            F.col("n_sh").alias("n_a"),
        )
        b = doc_sh.select(
            F.col(id_col).alias("id_b"),
            F.col("sh_arr").alias("_sb"),
            F.col("n_sh").alias("n_b"),
        )
        return (
            candidates.select("id_a", "id_b")
            .join(a, "id_a")
            .join(b, "id_b")
            .withColumn("n_inter", F.size(F.array_intersect("_sa", "_sb")))
            .withColumn(
                "jaccard",
                F.round(
                    F.col("n_inter")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                    6,
                ),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(
        F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a")
    )
    sb = sizes.select(
        F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b")
    )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dedup_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Near-dup PAIRS -> duplicate CLUSTERS: connected components with
    rep = min id per component. Returns (doc_id, rep_id), one row per
    doc appearing in any pair. The canonical dedup decision is then
    "keep rep_id, drop the rest" — pair-level drop rules (drop every
    id_b) over-delete on transitive chains a-b, b-c.

    Iterative min-label propagation, declarative per step: each
    iteration joins labels across (symmetrized) edges and takes the
    elementwise min — one shuffle join + one aggregation per iteration,
    converging in O(cluster diameter) iterations (near-dup clusters are
    shallow: text piles around a few templates, so 2-4 rounds
    typically). Each iteration materializes via localCheckpoint so the
    plan stays one-iteration deep (iterative self-referencing lineage
    otherwise grows exponentially and re-plans every prior round); the
    driver-side convergence test is a count of changed labels (a tiny
    job per round, same pattern as any Pregel-style loop on DataFrames).
    """
    if max_iter < 1:
        raise ValueError(
            f"max_iter={max_iter}: label propagation needs at least one "
            "round (covers one hop per round)"
        )
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    )
    sym = edges.unionByName(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    ).distinct()
    labels = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    sym = sym.localCheckpoint()
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels["id"] == nbr_min["src"], "left")
            .select(
                labels["id"],
                F.least(
                    labels["label"],
                    F.coalesce(F.col("nbr_label"), labels["label"]),
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"dedup_components did not converge in {max_iter} "
            f"iterations ({changed} labels still changing) — a "
            "component chain longer than max_iter hops exists; raise "
            "max_iter (propagation covers one hop per round)"
        )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("rep_id")
    )


def corpus_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """The composed training-corpus dedup pipeline: exact dedup ->
    MinHash-LSH candidates -> exact Jaccard verify -> near-dup drop.
    Returns the KEPT doc ids (one column, ``id_col``).

    Deterministic keep rule (replayable in SQL for the oracle gate):
    a doc survives iff it is the min-id winner of its normalized-content
    group AND it is the min-id representative of its verified near-dup
    CONNECTED COMPONENT (dedup_components over the jaccard-verified
    pairs). A pair-level 'drop the higher id' rule over-deletes on
    transitive chains a-b, b-c (c's only near-dup b is itself dropped);
    the component rep always survives — a rep can only lose exact dedup
    to a smaller id, which (being an exact duplicate) sits in the same
    component and would itself be the rep.

    Every stage is the already-audited scale formulation: one
    content-hash shuffle, one banded LSH pipeline (no self-joins), and
    the per-pair array_intersect verify — so the composition inherits
    the per-operator 100x stories; no new shuffle shapes appear."""
    winners = exact_dedup(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    cands = minhash_lsh_candidates(
        df, text_col, id_col, num_hashes, bands, shingle_n
    )
    near = ngram_jaccard_pairs(
        df, text_col, id_col, shingle_n, jaccard_threshold,
        candidates=cands,
    )
    comp = dedup_components(near)
    drop = (
        comp.filter(F.col("doc_id") != F.col("rep_id"))
        .select(F.col("doc_id").alias(id_col))
    )
    return winners.join(drop, id_col, "left_anti")


SIMHASH_BITS = 64


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id"):
    """64-bit SimHash over whitespace tokens (Charikar 2002), as an
    Arrow-vectorized mapInPandas kernel (bit twiddling is not worth
    expressing in Catalyst). Returns (id, simhash:long), stored signed
    (value - 2^63).

    The kernel is batch-vectorized, not per-row Python: tokens are
    flattened across the whole Arrow batch, each UNIQUE token is
    md5-hashed once — through the NumPy-vectorized single-block MD5
    (functions/fasthash.py), so even the unique pass is array ops, not a
    hashlib loop — the (uniq x 64) sign matrix is gathered per
    occurrence and segment-reduced per doc with one np.add.reduceat —
    per-token-occurrence work is a NumPy gather, never a Python-level
    loop (the r1 formulation looped per doc and per token; this one
    measures ~10x faster at sf0.1, see bench.py simhash line). The
    DuckDB oracle replays the identical md5 values in SQL."""
    import numpy as np
    import pandas as pd

    from ..functions.fasthash import md5_prefix64

    bitpos = np.arange(SIMHASH_BITS, dtype=np.uint64)

    def kernel(batches):
        for pdf in batches:
            n_docs = len(pdf)
            tok_lists = [(t or "").lower().split() for t in pdf[text_col]]
            lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
            flat = np.array(
                [tok for lst in tok_lists for tok in lst], dtype=object
            )
            sh = np.zeros(n_docs, dtype=np.uint64)
            if flat.size:
                uniq, inv = np.unique(flat, return_inverse=True)
                h = md5_prefix64(uniq)
                # (uniq x 64) sign matrix: +1 where the hash bit is set
                signs = (
                    ((h[:, None] >> bitpos[None, :]) & np.uint64(1))
                    .astype(np.int64) * 2 - 1
                )
                starts = np.zeros(n_docs, dtype=np.int64)
                np.cumsum(lens[:-1], out=starts[1:])
                nz = lens > 0
                acc = np.zeros((n_docs, SIMHASH_BITS), dtype=np.int64)
                # reduceat over starts of non-empty docs: consecutive
                # non-empty starts bound exactly one doc's occurrences
                acc[nz] = np.add.reduceat(signs[inv], starts[nz], axis=0)
                sh = (
                    (acc > 0).astype(np.uint64) << bitpos[None, :]
                ).sum(axis=1, dtype=np.uint64)
            signed = (sh - np.uint64(1 << 63)).view(np.int64)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "simhash": signed}
            )

    return df.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} long, simhash long"
    )


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming, using
    16-bit band blocking (a pair within distance 3 must agree on >=1 of 4
    bands) — the standard scalable SimHash join.

    Candidate generation is bucket-grouped pair expansion, NOT a
    band-relation self-join: a self-join plans the signature pipeline
    (scan -> tokenize -> hash kernel) TWICE with no exchange reuse across
    the join sides — at corpus scale that doubles the most expensive
    pass (same fix as minhash_lsh_candidates). Each (band, band_val)
    bucket is grouped to a sorted array of (id, simhash) structs and
    ordered pairs expand JVM-side; per-bucket pair blowup is identical
    to the join's (both are m^2 on an m-doc bucket), and the signature
    rides in the struct so no hydration join is needed."""
    sh = simhash(df, text_col, id_col)
    bands = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bv"),
    ).select(id_col, "simhash", "bv.band", "bv.band_val")
    members = F.col("members")
    pair_structs = F.flatten(
        F.transform(
            members,
            lambda x, i: F.transform(
                F.slice(members, i + 2, F.size(members)),
                lambda y: F.struct(
                    x["id"].alias("id_a"),
                    y["id"].alias("id_b"),
                    x["sh"].alias("sh_a"),
                    y["sh"].alias("sh_b"),
                ),
            ),
        )
    )
    pairs = (
        bands.groupBy("band", "band_val")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(id_col).alias("id"),
                        F.col("simhash").alias("sh"),
                    )
                )
            ).alias("members")
        )
        .filter(F.size("members") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b", "p.sh_a", "p.sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
