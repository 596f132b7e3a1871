"""Dataset snapshot diff: status classification + payload never shuffles."""

from ohsome_planet_spark.operators.versioning import dataset_diff, diff_summary


def _v(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_diff_statuses(spark):
    v1 = _v(spark, [(1, "a"), (2, "b"), (3, "c")])
    v2 = _v(spark, [(2, "b"), (3, "CHANGED"), (4, "d")])
    got = {r.doc_id: r.status for r in dataset_diff(v1, v2).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}
    summary = {r.status: r.n_docs for r in diff_summary(dataset_diff(v1, v2)).collect()}
    assert summary == {"removed": 1, "unchanged": 1, "changed": 1, "added": 1}


def test_diff_shuffles_hash_not_payload(spark):
    v1 = _v(spark, [(i, "x" * 100) for i in range(10)])
    v2 = _v(spark, [(i, "x" * 100) for i in range(10)])
    plan = dataset_diff(v1, v2)._jdf.queryExecution().executedPlan().toString()
    # the exchange carries (id, hash): the text column is projected away
    # below the join, so it must not appear in any Exchange/Sort subtree
    import re

    for m in re.finditer(r"Exchange [^\n]*", plan):
        assert "text" not in m.group(0)
