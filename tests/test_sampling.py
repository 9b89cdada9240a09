"""Deterministic sampling: quota, budget bound, and partitioning
independence (the property random samplers lack)."""

import pandas as pd
import pytest

from wiki_search_engine_spark.operators.sampling import (
    pack_token_budget,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, ["en", "de", "zh"][i % 3], 10 + (i * 7) % 50)
        for i in range(90)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "lang", "n_toks"])
    )


def test_stratified_quota_and_determinism(spark, docs):
    got = stratified_sample(
        docs, "lang", "doc_id", n_per=7, seed=1
    ).collect()
    by = {}
    for r in got:
        by.setdefault(r["lang"], set()).add(r["doc_id"])
    assert {len(v) for v in by.values()} == {7}
    # partitioning-independent: identical sample after a reshuffle
    again = stratified_sample(
        docs.repartition(13), "lang", "doc_id", n_per=7, seed=1
    ).collect()
    assert sorted(r["doc_id"] for r in got) == sorted(
        r["doc_id"] for r in again
    )
    # a different seed picks a different sample
    other = stratified_sample(
        docs, "lang", "doc_id", n_per=7, seed=2
    ).collect()
    assert sorted(r["doc_id"] for r in got) != sorted(
        r["doc_id"] for r in other
    )


def test_stratified_small_stratum_keeps_all(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            [(1, "en"), (2, "en"), (3, "xx")],
            columns=["doc_id", "lang"],
        )
    )
    got = stratified_sample(df, "lang", "doc_id", n_per=5)
    assert got.count() == 3


def test_budget_bound_and_greedy_prefix(spark, docs):
    budget = 120
    got = pack_token_budget(
        docs, "lang", "doc_id", "n_toks", budget=budget, seed=1
    ).collect()
    tot = {}
    for r in got:
        tot[r["lang"]] = tot.get(r["lang"], 0) + r["n_toks"]
    toks = {r["doc_id"]: r["n_toks"] for r in docs.collect()}
    for lang, t in tot.items():
        # realized total >= budget is allowed only via ONE atomic doc
        assert t < budget + max(toks.values()), lang
        assert t >= min(t, budget)  # never zero when docs exist
    # the kept set is a PREFIX of the hash order: dropping the last
    # kept doc must leave every remaining doc still under budget
    # (verified implicitly by determinism vs the oracle entry; here
    # assert partitioning independence)
    again = pack_token_budget(
        docs.repartition(17), "lang", "doc_id", "n_toks",
        budget=budget, seed=1,
    ).collect()
    assert sorted(r["doc_id"] for r in got) == sorted(
        r["doc_id"] for r in again
    )


def test_budget_zero_and_negative(spark, docs):
    assert (
        pack_token_budget(
            docs, "lang", "doc_id", "n_toks", budget=0
        ).count()
        == 0
    )
    with pytest.raises(ValueError):
        pack_token_budget(docs, "lang", "doc_id", "n_toks", budget=-1)
