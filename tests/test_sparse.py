"""Sparse TF-IDF all-pairs similarity: pruned-space exactness, the
df-pruning contract, and bigram edge cases."""

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.sparse import bigrams_col, tfidf_neighbors
from biothings_crawler_spark.operators.text import words_col


def test_bigrams_basic_and_short_docs(spark):
    d = spark.createDataFrame(
        [(1, "a b c"), (2, "solo"), (3, "")], "id long, text string")
    got = {r["id"]: r["bg"] for r in d.select(
        "id",
        bigrams_col(words_col(F.col("text"))).alias("bg")).collect()}
    assert got[1] == ["a b", "b c"]
    assert got[2] == [] and got[3] == []


def test_identical_rare_profiles_score_million(spark):
    # docs 1 and 2 share their only rare bigram profile -> cos^2 = 1;
    # doc 3 shares half -> strictly lower
    d = spark.createDataFrame(
        [
            (1, "x y common common"),
            (2, "x y common other"),
            (3, "x z common common"),
        ],
        "id long, text string",
    )
    rows = tfidf_neighbors(d, "id", "text", df_max=3, k=10).collect()
    scores = {(r["id1"], r["id2"]): r["cos2_ppm"] for r in rows}
    # every pair appears (all bigrams here are rare at df_max=3)
    assert scores[(1, 2)] < 1000000  # shares 'x y' but differs elsewhere
    assert max(scores.values()) <= 1000000


def test_df_pruning_drops_dense_terms_from_space(spark):
    # 'a a' appears in every doc; with df_max=2 it cannot contribute —
    # docs 1 and 2 still pair via their shared rare bigram 'p q'
    d = spark.createDataFrame(
        [
            (1, "a a p q"),
            (2, "a a p q"),
            (3, "a a r s"),
        ],
        "id long, text string",
    )
    rows = tfidf_neighbors(d, "id", "text", df_max=2, k=10).collect()
    pairs = {(r["id1"], r["id2"]): r["cos2_ppm"] for r in rows}
    assert pairs[(1, 2)] == 1000000
    # doc 3 shares only pruned bigrams ('a a', and 'a p'? no) -> no pair
    assert all(3 not in p for p in pairs)


def test_pair_orientation_and_determinism(spark):
    d = spark.createDataFrame(
        [(9, "m n o"), (4, "m n o")], "id long, text string")
    rows = tfidf_neighbors(d, "id", "text", df_max=5, k=5).collect()
    assert len(rows) == 1
    assert (rows[0]["id1"], rows[0]["id2"]) == (4, 9)
    assert rows[0]["cos2_ppm"] == 1000000
