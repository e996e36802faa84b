"""Round-13 rotation bank: operators built late in round 11, AFTER
the 20-draft r12 queue was sized to its window (20 drafts + the t02
re-cert witness + 29 ledger fillers = 50 slots — no room left). Same
contract as every drafts file: DuckDB-proven here, wired into
__spark_entry__ at their rotation with the SQL generator moved
verbatim.

- d22_clusters_star — connected components by alternating
  large-star / small-star contraction (dedup.neardup_clusters_star;
  Kiveris et al., SoCC'14): the O(log n)-round scale path for the one
  graph shape min-label propagation handles badly, LONG CHAINS
  (min-label is O(component diameter) rounds — a 10k-doc
  paragraph-overlap chain would be 10k shuffle rounds; star
  contraction halves every path per round-pair, ~14 rounds). Output
  IDENTICAL to neardup_clusters, so the wired q34 oracle serves it
  verbatim (the s29/s31 identity pattern) and the two are drop-in
  interchangeable inside every cluster-consuming chain (q48, d17,
  q73, q88).

ROTATION-TIME CONTRACT IMPROVEMENT (consider when the freeze lifts):
neardup_clusters' distributed regime currently RAISES past
max_iterations. With the star path proven identical, the better
contract is to escalate to neardup_clusters_star instead of raising —
the caller keeps the exact answer at O(log n) cost rather than
retrying with a bigger round budget. Requires re-certifying q34 (its
code path changes) in the same window.
"""

import pytest

from pyspark.sql import functions as F

import __spark_entry__ as E
from datacatalog_tag_engine_spark.pipeline import dedup as DD

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def ddb():
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    yield con
    con.close()


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_oracle_draft_clusters_star(spark, ddb):
    """Identity oracle: star contraction's labeling over the q34 pair
    chain equals the wired q34 oracle string verbatim."""
    docs = spark.table("documents")
    got = _rows(DD.neardup_clusters_star(docs, DD.minhash_dedup(docs)))
    rel = ddb.sql(E.oracle_sql()["q34_dedup_clusters"])
    cols = sorted(rel.columns)
    exp = sorted(tuple(r) for r in ddb.sql(f"SELECT {', '.join(cols)} FROM rel").fetchall())
    assert got == exp and len(got) == 500


def test_clusters_star_equals_minlabel_and_survives_long_chains(spark):
    """The drop-in contract and the reason to exist, in one test:
    (a) on a random graph both algorithms produce identical labels;
    (b) on a 200-node chain star contraction converges (every node
    labels 0) while min-label's distributed regime raises at its
    default 20 rounds — the diameter wall the new operator removes."""
    import random

    rng = random.Random(7)
    rdocs = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    edges = [
        (a, b)
        for a, b in [(rng.randrange(300), rng.randrange(300)) for _ in range(150)]
        if a != b
    ]
    rpairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    assert _rows(DD.neardup_clusters(rdocs, rpairs)) == _rows(
        DD.neardup_clusters_star(rdocs, rpairs)
    )

    n = 200
    cdocs = spark.createDataFrame([(i,) for i in range(n + 1)], "doc_id long")
    cpairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )
    star = DD.neardup_clusters_star(cdocs, cpairs).collect()
    assert len(star) == n + 1 and all(r["cluster_id"] == 0 for r in star)
    with pytest.raises(RuntimeError):
        DD.neardup_clusters(
            cdocs, cpairs, driver_edge_limit=0, max_iterations=20
        ).collect()
