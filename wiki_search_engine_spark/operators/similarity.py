"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; random-hyperplane LSH
bucketing as the scale path (restricts the scan to the query's bucket).
All arithmetic is JVM-side Catalyst higher-order functions (zip_with +
aggregate) in float64; scores are rounded to 6 dp so results are stable
across engines (the DuckDB oracle computes the identical expression).

Scale notes: brute-force is a full scan + TakeOrderedAndProject — fine as
a per-query baseline but O(corpus) per query; the LSH path prunes to
~corpus/2^planes per bucket and is embarrassingly parallel. For repeated
queries, bucket the table once (partitionBy bucket) and prune partitions.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    # zero-norm guard: Spark 4's default ANSI mode turns x/0 into a
    # job-killing DIVIDE_BY_ZERO; define cos(0-vector, .) = 0.0 (no
    # direction -> no similarity) instead of aborting the query
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: (id, cos_sim rounded to 6dp)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42):
    """Deterministic pseudo-random hyperplanes (driver-side literals, so
    the same planes are embeddable in the SQL oracle)."""
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def project_embedding(
    df: DataFrame,
    planes: list[list[float]],
    vec_col: str = "feature",
    out_col: str = "embedding",
) -> DataFrame:
    """Deterministic linear projection of a short feature vector into a
    d-dim embedding column — the documented stand-in for the learned
    CNN embed slot (a real model drops into the same column contract:
    media -> decode -> embed array -> cosine/LSH/IVF family).

    Catalyst-only and UDF-free: each output dimension is an explicit
    left-associated product chain over literal plane weights, so the
    whole projection stays inside whole-stage codegen AND the SQL
    oracle can replay the identical expression; no shuffle, no
    higher-order-function lambda touching outer expressions (see the
    interpreted-lambda re-evaluation trap documented in
    functions/textstats.py shingles)."""
    dims = []
    for plane in planes:
        expr = None
        for k, w in enumerate(plane):
            term = F.element_at(F.col(vec_col), k + 1).cast(
                "double"
            ) * F.lit(float(w))
            expr = term if expr is None else expr + term
        dims.append(expr)
    return df.withColumn(out_col, F.array(*dims))


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-of-dot-product bucket id in [0, 2^n_planes)."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(vec_col, p) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + bit * F.lit(2**i)
    return bucket


def lsh_probe_buckets(
    query_vec: list[float],
    planes: list[list[float]],
    n_probes: int = 1,
) -> list[int]:
    """Multi-probe LSH probe set (the single-flip prefix of Lv et al.,
    VLDB'07's probing sequence): the query's own bucket plus the
    buckets reached by flipping the sign bit of the ``n_probes - 1``
    planes with the SMALLEST |dot(query, plane)| margin — a vector on
    the wrong side of a hyperplane the query barely clears is the most
    likely near neighbor lost to bucketing. Deterministic (ties break
    on plane index) and replayable in SQL (dots of literal planes,
    ORDER BY abs LIMIT, xor) — which is why probing is restricted to
    single-bit flips: multi-bit subset enumeration buys little at
    n_probes <= n_planes and is not reasonably SQL-expressible."""
    if n_probes < 1:
        raise ValueError("n_probes must be >= 1")
    dots = [
        sum(a * b for a, b in zip(query_vec, p)) for p in planes
    ]
    base = sum(2**i for i, d in enumerate(dots) if d >= 0)
    order = sorted(range(len(planes)), key=lambda i: (abs(dots[i]), i))
    return [base] + [
        base ^ (2**i) for i in order[: n_probes - 1]
    ]


# Default probe count for the IVF query paths (ivf_topk /
# ivf_read_topk). Chosen from the measured recall sweep (bench.py
# ann_ivf_recall10_nprobe*: 0.38 / 0.78 / 1.0 at nprobe 1/4/8 on the
# seeded 64-dim Gaussian vectors — the adversarial near-orthogonal
# case): 8 probes is the first swept point at recall@10 >= 0.9, so the
# DEFAULT path is a measured->=0.9-recall config rather than a fast
# low-recall surprise. At production scale nprobe=8 still prunes hard —
# K grows with the corpus (K ~ sqrt(N): 10^4-10^5 cells at 10^9-10^10
# vectors), so 8 probed cells is <=0.1% of the index scanned. Tune DOWN
# only with recall evidence on the actual embedding distribution
# (clustered real embeddings need fewer probes than these Gaussians).
DEFAULT_NPROBE = 8

# Calibration for the LSH low-recall warning: measured probed-bucket
# fraction -> recall@10 on the bench workload (the multitable sweep in
# ann_lsh_multitable_topk's docstring + bench.py ann_lsh_*_recall10):
# 0.019->0.26, 0.062->0.34, 0.124->0.50, 0.225->0.62, 0.405->0.78.
# recall ~0.5 lands at ~1/8 of buckets probed; warn below that.
_LSH_WARN_FRACTION = 0.12


def _lsh_recall_guard(
    n_planes: int, n_probes: int, n_tables: int = 1
) -> None:
    """Warn when the chosen LSH config probes too small a bucket
    fraction to plausibly clear recall@10 ~0.5 (measured calibration
    above). Angular LSH on near-orthogonal vectors is recall-poor at
    any budget — the warning routes users to the measured-quality
    default (ivf_topk, recall 1.0 at DEFAULT_NPROBE on the same
    workload) instead of silently returning a fifth of the true
    neighbors."""
    import warnings

    frac = (n_probes * n_tables) / float(2**n_planes)
    if frac < _LSH_WARN_FRACTION:
        warnings.warn(
            f"LSH config (n_planes={n_planes}, n_probes={n_probes}, "
            f"n_tables={n_tables}) probes ~{frac:.1%} of buckets — "
            "measured recall@10 on the bench workload is below 0.5 at "
            "this budget (BENCH ann_lsh_*_recall10; ~0.5 needs >=12% "
            "probed). Prefer ivf_topk/ivf_read_topk (recall@10 >= 0.9 "
            "at the DEFAULT_NPROBE=8 default) or raise "
            "n_probes/n_tables / lower n_planes.",
            stacklevel=3,
        )


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 1,
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to the
    query's hyperplane-LSH bucket(s). ``n_probes > 1`` enables
    multi-probe (lsh_probe_buckets): probe cost grows linearly with the
    bucket count while recall climbs toward exact — the recall/latency
    dial bench.py grades (ann_lsh_recall10*). Deterministic (planes
    from seed)."""
    _lsh_recall_guard(n_planes, n_probes)
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes, seed)
    buckets = lsh_probe_buckets(query_vec, planes, n_probes)
    bucketed = df.withColumn(
        "_bucket", lsh_bucket(F.col(vec_col), planes)
    ).filter(F.col("_bucket").isin(buckets))
    return cosine_topk(bucketed, query_vec, k, id_col, vec_col)


def table_planes(
    dim: int, n_planes: int = 8, n_tables: int = 4, seed: int = 42
) -> list[list[list[float]]]:
    """Independent per-table hyperplane families (seed offset by a
    prime so no table shares a plane); deterministic and driver-side,
    so each table's planes embed as literals in the SQL oracle."""
    return [
        hyperplanes(dim, n_planes, seed + 7919 * t)
        for t in range(n_tables)
    ]


def ann_lsh_multitable_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 1,
) -> DataFrame:
    """Multi-TABLE LSH ANN — the standard recall lever the single-table
    form lacks: L independent hash tables (table_planes), a vector is a
    candidate if it shares the query's bucket in ANY table (optionally
    multi-probed per table), exact cosine re-rank of the union. With
    per-table collision probability p^b (p = 1 - angle/pi per plane, b
    planes), recall is 1 - (1 - p^b)^L — L=4 tables lift the measured
    recall@10 several-fold over one table at the same bucket width
    (bench.py ann_lsh_4tab_recall10 vs ann_lsh_recall10), versus
    multi-probe's single-bit flips which only explore NEAR the one
    table's bucket.

    Plan shape: the candidate test is one codegen'd OR-of-bucket-
    equalities predicate inside the scan — no join, no shuffle, no
    second pass; cost is b*L literal-plane dot products per row. At
    100 TB this compute form is the semantics contract for a
    MATERIALIZED layout: write L bucket columns once and partition by
    (table, bucket) exactly as the IVF path does with its cell
    directories (ivf_write/ivf_read_topk), turning the scan into L
    partition-pruned directory reads.

    Measured on the seeded 64-dim GAUSSIAN vectors (sf0.1, 5 queries,
    recall@10 vs exact / candidate fraction scanned) — the adversarial
    near-orthogonal case for angular LSH; clustered real embeddings do
    far better:

        8 planes x 4 tables   0.26 / 0.019
        6 planes x 4 tables   0.34 / 0.062
        6 planes x 8 tables   0.50 / 0.124
        5 planes x 8 tables   0.62 / 0.225
        4 planes x 8 tables   0.78 / 0.405

    i.e. recall scales with tables at fixed cost-per-candidate, and on
    this workload IVF (ivf_topk: 0.78 recall at nprobe=4) is the better
    quality path — LSH's advantage is needing no training pass."""
    _lsh_recall_guard(n_planes, n_probes, n_tables)
    dim = len(query_vec)
    pred = None
    for planes in table_planes(dim, n_planes, n_tables, seed):
        buckets = lsh_probe_buckets(query_vec, planes, n_probes)
        cond = lsh_bucket(F.col(vec_col), planes).isin(buckets)
        pred = cond if pred is None else pred | cond
    return cosine_topk(df.filter(pred), query_vec, k, id_col, vec_col)


def lsh_write(
    df: DataFrame,
    path: str,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> None:
    """Materialize the multi-table LSH index — the 100-TB form of
    ann_lsh_multitable_topk's scan predicate: one row per (table,
    vector) with that table's bucket id, written
    ``partitionBy(tbl, bucket)`` so a query reads ONLY its probed
    (tbl, bucket) directories (lsh_read_topk; explain-audited like the
    IVF cells and the postings buckets). Storage is L x the vector
    table — the standard multi-table LSH trade; bucket assignment is
    the same codegen lsh_bucket projection as the compute form, all L
    tables stacked in ONE write job (unionByName of L projections, no
    shuffle beyond the layout repartition). The plane-family params
    land in ``_lsh_meta.json`` so a reader can never probe with a
    mismatched family. ``dim`` skips the one-row dimensionality probe
    when the caller knows it."""
    import json
    import os

    if dim is None:
        dim = int(df.select(F.size(vec_col)).first()[0])
    parts = None
    for t, planes in enumerate(
        table_planes(dim, n_planes, n_tables, seed)
    ):
        p = df.select(
            F.col(id_col),
            F.col(vec_col),
            F.lit(t).alias("tbl"),
            lsh_bucket(F.col(vec_col), planes).alias("bucket"),
        )
        parts = p if parts is None else parts.unionByName(p)
    (
        parts.repartition("tbl", "bucket")
        .write.mode("overwrite")
        .partitionBy("tbl", "bucket")
        .parquet(path)
    )
    with open(os.path.join(path, "_lsh_meta.json"), "w") as f:
        json.dump(
            {
                "n_planes": n_planes, "n_tables": n_tables,
                "seed": seed, "dim": dim,
                "id_col": id_col, "vec_col": vec_col,
            },
            f,
        )


def lsh_append(
    df: DataFrame,
    path: str,
) -> None:
    """Incremental vector ingest into a materialized LSH index: assign
    the NEW vectors' buckets with the index's RECORDED plane family
    (never the caller's params — a mismatched family would silently
    land vectors in unfindable buckets) and append into the existing
    (tbl, bucket) directories. Append-only parquet is safe here because
    the layout has no per-file ordering contract — a probe reads whole
    bucket directories — so continuous embedding ingest costs one small
    write per batch, never a layout rewrite (the postings analogue is
    the delta-merge; vectors are simpler: no stats to rescale)."""
    import json
    import os

    with open(os.path.join(path, "_lsh_meta.json")) as f:
        meta = json.load(f)
    parts = None
    for t, planes in enumerate(
        table_planes(
            meta["dim"], meta["n_planes"], meta["n_tables"], meta["seed"]
        )
    ):
        p = df.select(
            F.col(meta["id_col"]),
            F.col(meta["vec_col"]),
            F.lit(t).alias("tbl"),
            lsh_bucket(F.col(meta["vec_col"]), planes).alias("bucket"),
        )
        parts = p if parts is None else parts.unionByName(p)
    (
        parts.repartition("tbl", "bucket")
        .write.mode("append")
        .partitionBy("tbl", "bucket")
        .parquet(path)
    )


def lsh_read_topk(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probes: int = 1,
) -> DataFrame:
    """Query a materialized multi-table LSH index: per-table probe
    buckets from the recorded plane family -> an OR of
    ``(tbl = t AND bucket IN probes_t)`` partition filters (only those
    directories are listed/read) -> driver-free dedup of vectors found
    in several tables -> exact cosine re-rank. Result-identical to
    ann_lsh_multitable_topk over the raw table at the same params
    (pytest). The underscore-prefixed meta file is invisible to the
    parquet reader."""
    import json
    import os

    with open(os.path.join(path, "_lsh_meta.json")) as f:
        meta = json.load(f)
    if len(query_vec) != meta["dim"]:
        raise ValueError(
            f"query dim {len(query_vec)} != index dim {meta['dim']}"
        )
    _lsh_recall_guard(meta["n_planes"], n_probes, meta["n_tables"])
    pred = None
    for t, planes in enumerate(
        table_planes(
            meta["dim"], meta["n_planes"], meta["n_tables"], meta["seed"]
        )
    ):
        probes = lsh_probe_buckets(query_vec, planes, n_probes)
        cond = (F.col("tbl") == t) & F.col("bucket").isin(probes)
        pred = cond if pred is None else pred | cond
    cand = (
        spark.read.parquet(path)
        .filter(pred)
        .select(meta["id_col"], meta["vec_col"])
        .dropDuplicates([meta["id_col"]])
    )
    return cosine_topk(
        cand, query_vec, k, meta["id_col"], meta["vec_col"]
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket candidates
    (near-identical vectors share a bucket with high probability), then
    exact cosine verify >= threshold.

    Candidate generation is bucket-grouped pair expansion, NOT a
    bucketed self-join: a self-join plans the 8-dot-product hyperplane
    projection twice (no exchange reuse across the join sides). The
    bucket stage emits only (id, bucket) rows — cheap to group even on
    hot buckets — and the exact-cosine verify hydrates raw vectors by
    id with two plain hash joins against the untouched input scan, so
    the hyperplane arithmetic runs exactly once per vector. A pair
    lives in exactly one bucket (the bucket is a function of the
    vector), so no distinct pass is needed. Pass ``dim`` when known to
    skip the driver-side first() dimensionality probe."""
    planes = (
        hyperplanes(dim, n_planes, seed)
        if dim is not None
        else hyperplanes_for(df, vec_col, n_planes, seed)
    )
    bucketed = df.select(
        F.col(id_col),
        lsh_bucket(F.col(vec_col), planes).alias("_bucket"),
    )
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
    cand = (
        bucketed.groupBy("_bucket")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b")
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cos_sim", F.round(cosine(F.col("_va"), F.col("_vb")), 6)
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def hyperplanes_for(df: DataFrame, vec_col: str, n_planes: int, seed: int):
    """Probe the vector dimensionality with a driver-side first() (one
    tiny job) — callers that know the dim should pass it instead."""
    dim = len(df.select(vec_col).first()[0])
    return hyperplanes(dim, n_planes, seed)


def l2sq(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(
            a, b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans_train(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
) -> list[tuple[int, list[float]]]:
    """Deterministic distributed Lloyd's k-means for the IVF coarse
    quantizer (no reference analogue — the training-data-pipeline
    mandate). Returns ``[(cid, centroid), ...]`` for ``ivf_assign`` /
    ``ivf_topk``.

    - init: the vectors of the ``k`` smallest ids (deterministic and
      replayable by the SQL oracle);
    - assign: the same JVM-side ``ivf_assign`` projection (centroids are
      plan literals — no join, no shuffle);
    - update: per-partition PARTIAL sums via mapInPandas (each partition
      emits <= k tiny (cell, n, sum[dim]) rows — the classic map-side
      combine; only k x n_partitions rows reach the driver, never the
      vectors), combined on the driver and rounded to ``round_dp``.

    Rounding each iteration's centroids pins the result across fp
    summation orders, so an independent engine (the DuckDB oracle
    replays the identical iterations in SQL) reproduces the same
    centroids bit-for-bit at 4 dp. Empty cells keep their previous
    centroid. Cost: one shuffle-free job over the vectors per
    iteration."""
    import numpy as np
    import pandas as pd

    init = (
        df.orderBy(F.asc(id_col))
        .limit(k)
        .select(id_col, vec_col)
        .collect()
    )
    centroids = [
        (i, [round(float(x), round_dp) for x in r[vec_col]])
        for i, r in enumerate(init)
    ]

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cells = pdf["cell"].to_numpy()
            mat = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
            )
            rows = []
            for c in np.unique(cells):
                m = mat[cells == c]
                rows.append(
                    {
                        "cell": int(c),
                        "n": int(m.shape[0]),
                        "s": m.sum(axis=0).tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    for _ in range(iters):
        assigned = ivf_assign(df, centroids, id_col, vec_col).select(
            "cell", F.col(vec_col).alias("_v")
        )
        parts = assigned.mapInPandas(
            partials, schema="cell int, n long, s array<double>"
        ).collect()
        sums: dict[int, list[float]] = {}
        counts: dict[int, int] = {}
        for row in sorted(parts, key=lambda r: r["cell"]):
            c = int(row["cell"])
            counts[c] = counts.get(c, 0) + int(row["n"])
            prev = sums.get(c)
            sums[c] = (
                [a + b for a, b in zip(prev, row["s"])]
                if prev
                else list(row["s"])
            )
        centroids = [
            (
                cid,
                [round(x / counts[cid], round_dp) for x in sums[cid]]
                if counts.get(cid)
                else vec,
            )
            for cid, vec in centroids
        ]
    return centroids


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest centroid
    (L2, ties -> lowest centroid id). Centroids are driver-side literals
    (broadcast into the plan), so assignment is a single JVM-side
    projection — no join, no shuffle. Returns df + ``cell`` column.

    At 100 TB this is the build step of IVF-Flat: the table is then
    written ``partitionBy(cell)`` so a query scans only its probed cells
    (partition pruning), analogous to the postings bucket layout.
    """
    best = None
    for cid, cvec in centroids:
        c = F.array(*[F.lit(float(x)) for x in cvec])
        cand = F.struct(
            l2sq(F.col(vec_col), c).alias("d"),
            F.lit(int(cid)).alias("cid"),
        )
        best = cand if best is None else F.least(best, cand)
    return df.withColumn("cell", best["cid"])


def ivf_assign_bulk(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_chunk: int = 1024,
) -> DataFrame:
    """Large-nlist IVF assignment: broadcast centroid matrix + Arrow-
    batched NumPy argmin. ``ivf_assign`` builds an O(nlist)-deep
    Catalyst expression — ideal JVM codegen at nlist ~10^3, plan bloat
    at 10^5; this path ships the centroids once per executor and scans
    them in bounded chunks (rows x chunk distance tiles), so nlist is
    memory-bound, not plan-bound. Ties break to the lowest centroid id
    (strict < against earlier chunks), matching ivf_assign; distances
    are fp-reassociated vs the Catalyst fold, so assignments can differ
    only on exact-tie boundaries (measure-zero for real embeddings;
    equivalence pytest on random data)."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    cents = sorted(centroids)
    cids = np.array([c for c, _ in cents], dtype=np.int64)
    mat = np.array([v for _, v in cents], dtype=np.float64)
    bc = spark.sparkContext.broadcast((cids, mat))

    def kernel(batches):
        k_cids, k_mat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.array(
                [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]]
            )
            n = v.shape[0]
            best_d = np.full(n, np.inf)
            best_c = np.zeros(n, dtype=np.int64)
            for s in range(0, k_mat.shape[0], centroid_chunk):
                chunk = k_mat[s : s + centroid_chunk]
                d2 = ((v[:, None, :] - chunk[None, :, :]) ** 2).sum(-1)
                j = d2.argmin(axis=1)
                dmin = d2[np.arange(n), j]
                better = dmin < best_d  # strict: earlier (lower) cid wins ties
                best_d[better] = dmin[better]
                best_c[better] = k_cids[s : s + centroid_chunk][j[better]]
            out = pdf.copy()
            out["cell"] = pd.array(best_c, dtype="int64")
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", cell long"
    return df.mapInPandas(kernel, schema=schema)


def ivf_write(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index: assign every vector to its cell (pure
    JVM projection) and write ``partitionBy(cell)`` — the postings-bucket
    analogue for vectors. A query then scans only its probed cells via
    partition-directory pruning (see ivf_read_topk; explain-audited)."""
    (
        ivf_assign(df, centroids, id_col, vec_col)
        .repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )


def ivf_read_topk(
    spark,
    path: str,
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = DEFAULT_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a materialized IVF index: driver-side nprobe centroid
    argsort -> ``cell IN (probed)`` partition filter (only the probed
    ``cell=N`` directories are listed/read — same mechanism as the
    postings bucket pruning) -> exact cosine within the probed cells.
    Result-identical to ivf_topk over the raw table (pytest)."""

    def d2(c):
        return sum((a - b) ** 2 for a, b in zip(query_vec, c))

    probed = sorted(centroids, key=lambda t: (d2(t[1]), t[0]))[:nprobe]
    probe_ids = [cid for cid, _ in probed]
    cells = spark.read.parquet(path).filter(F.col("cell").isin(probe_ids))
    return cosine_topk(cells, query_vec, k, id_col, vec_col)


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = DEFAULT_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-Flat approximate top-k: probe the ``nprobe`` centroids nearest
    to the query (driver-side argsort), exact cosine ranking within the
    probed cells only. The default ``nprobe`` is the measured
    recall@10->=0.9 config (DEFAULT_NPROBE; bench
    ann_ivf_default_recall10) — callers trade quality down explicitly,
    never by omission."""

    def d2(c):
        return sum((a - b) ** 2 for a, b in zip(query_vec, c))

    probed = sorted(centroids, key=lambda t: (d2(t[1]), t[0]))[:nprobe]
    probe_ids = [cid for cid, _ in probed]
    assigned = ivf_assign(df, centroids, id_col, vec_col)
    return cosine_topk(
        assigned.filter(F.col("cell").isin(probe_ids)),
        query_vec, k, id_col, vec_col,
    )
