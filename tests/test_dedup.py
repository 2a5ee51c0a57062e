

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


def test_dedup_against_history(spark):
    from docling_eval_spark.operators.dedup import dedup_against

    history = spark.createDataFrame(
        [(100, "seen before"), (101, "also seen")], ["doc_id", "text"])
    batch = spark.createDataFrame(
        [(1, "seen before"),    # exists in history -> dropped
         (2, "brand new"),
         (3, "brand new"),      # within-batch dup of 2 -> dropped
         (4, "also new")],
        ["doc_id", "text"])
    kept = sorted(r.doc_id for r in dedup_against(batch, history).collect())
    assert kept == [2, 4]


def test_near_dedup_against_history(spark):
    from docling_eval_spark.operators.dedup import near_dedup_against

    t_hist = "the quick brown fox jumps over the lazy dog end"
    t_new = "completely different words here about other topics now"
    history = spark.createDataFrame([(100, t_hist)], ["doc_id", "text"])
    batch = spark.createDataFrame(
        [(1, t_hist),            # exact recrawl -> exact stage drops
         (2, t_hist + " xdup"),  # near recrawl (J=8/9) -> history stage
         (3, t_new),             # genuinely new -> kept
         (4, t_new),             # within-batch exact of 3 -> dropped
         (5, t_new + " tail"),   # within-batch near of 3 (J=6/7)
         (6, "unrelated short")],
        ["doc_id", "text"])
    kept = sorted(r.doc_id
                  for r in near_dedup_against(batch, history).collect())
    assert kept == [3, 6]
