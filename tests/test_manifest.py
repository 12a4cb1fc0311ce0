"""Release manifest (operators/manifest.release_manifest)."""

import hashlib

from biothings_crawler_spark.operators.manifest import release_manifest


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _bucket(i: int, n: int) -> int:
    return int(_md5(str(i))[:8], 16) % n


def test_digests_match_python_reference(spark):
    rows = [(i, f"payload {i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.bucket: (r.n_docs, r.digest)
           for r in release_manifest(df, "doc_id", "text",
                                     n_buckets=4).collect()}
    buckets: dict = {}
    for i, t in rows:
        buckets.setdefault(_bucket(i, 4), []).append(
            (i, _md5(f"{i}:{_md5(t)}")))
    want = {}
    for b, leaves in buckets.items():
        leaves.sort()
        want[b] = (len(leaves), _md5("".join(h for _, h in leaves)))
    root_src = "".join(want[b][1] for b in sorted(want))
    want[-1] = (len(rows), _md5(root_src))
    assert got == want


def test_layout_invariance(spark):
    rows = [(i, f"p{i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r.bucket: r.digest for r in
         release_manifest(df.repartition(1), "doc_id", "text").collect()}
    b = {r.bucket: r.digest for r in
         release_manifest(df.repartition(13).sortWithinPartitions(
             "text"), "doc_id", "text").collect()}
    assert a == b


def test_single_payload_change_localizes_to_one_bucket(spark):
    rows = [(i, f"p{i}") for i in range(50)]
    df1 = spark.createDataFrame(rows, "doc_id long, text string")
    rows[7] = (7, "TAMPERED")
    df2 = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r.bucket: r.digest
         for r in release_manifest(df1, "doc_id", "text", 8).collect()}
    b = {r.bucket: r.digest
         for r in release_manifest(df2, "doc_id", "text", 8).collect()}
    changed = {k for k in a if a[k] != b[k]}
    assert changed == {_bucket(7, 8), -1}


def test_null_payload_is_stable(spark):
    df = spark.createDataFrame([(1, None), (2, "x")],
                               "doc_id long, text string")
    out = release_manifest(df, "doc_id", "text", 2).collect()
    assert all(r.digest for r in out)
    assert sum(r.n_docs for r in out if r.bucket >= 0) == 2


def test_manifest_diff_localizes_and_is_empty_on_identical(spark):
    from biothings_crawler_spark.operators.manifest import manifest_diff

    rows = [(i, f"p{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = release_manifest(df, "doc_id", "text", 8)
    assert manifest_diff(a, a).count() == 0

    rows[11] = (11, "CHANGED")
    df2 = spark.createDataFrame(rows, "doc_id long, text string")
    b = release_manifest(df2, "doc_id", "text", 8)
    got = {r.bucket: r for r in manifest_diff(a, b).collect()}
    assert set(got) == {_bucket(11, 8), -1}
    ch = got[_bucket(11, 8)]
    assert ch.n_docs_a == ch.n_docs_b and ch.digest_a != ch.digest_b


def test_manifest_diff_one_sided_bucket(spark):
    from biothings_crawler_spark.operators.manifest import manifest_diff

    a = release_manifest(
        spark.createDataFrame([(1, "x")], "doc_id long, text string"),
        "doc_id", "text", 4)
    b = release_manifest(
        spark.createDataFrame([(1, "x"), (2, "y")],
                              "doc_id long, text string"),
        "doc_id", "text", 4)
    got = {r.bucket: r for r in manifest_diff(a, b).collect()}
    new_bucket = _bucket(2, 4)
    assert new_bucket in got and got[new_bucket].digest_a is None
    assert -1 in got
