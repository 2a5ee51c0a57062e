

def test_dup_components_chain_and_clique(spark):
    from docling_eval_spark.operators.dedup import dup_components

    # chain 1-2-3-4-5 (given as scattered directed pairs), clique 10/11/12,
    # isolated pair (20, 7)
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (5, 4),
         (10, 11), (11, 12), (10, 12),
         (20, 7)], ["a", "b"])
    out = {r.node: r.component for r in dup_components(pairs).collect()}
    assert {out[k] for k in (1, 2, 3, 4, 5)} == {1}
    assert {out[k] for k in (10, 11, 12)} == {10}
    assert out[20] == 7 and out[7] == 7
    assert len(out) == 10


def test_dup_components_long_path_converges(spark):
    from docling_eval_spark.operators.dedup import dup_components

    # a 33-node path: min label must travel 32 hops; pointer doubling
    # keeps that well inside the max_iter backstop
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 132)], ["a", "b"])
    out = {r.node: r.component for r in dup_components(pairs).collect()}
    assert set(out.values()) == {100} and len(out) == 33
