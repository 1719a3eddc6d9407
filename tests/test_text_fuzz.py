"""Differential fuzz for the round-5 text operators (VERDICT r4 "deepen
adversarial verification"): seeded adversarial corpora — unicode,
digits-only, separator characters, massive repetition, near-empty —
run through `repetition_stats` / `tfidf_top_terms` / `span_digest` and
compared row-for-row against independent DuckDB SQL built from the
contract-oracle fragments. The corpus generator is deliberately nastier
than the driver's word-soup documents: it includes the digest framing
bytes, regex metacharacters, and token multiplicity ties.
"""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

VOCAB = [
    "the", "spark", "data", "a1b2", "42", "x",
    "naïve", "café", "ümlaut",          # non-ascii letters (split as non-[a-z0-9])
    "UPPER", "MiXeD",
    "a.b", "c,d", "e|f",                # punctuation inside tokens
    "\x01", "\x02",                      # digest framing bytes as "words"
    "(regex)", "[meta]", "a+b*c",
]


def _make_text(rng: np.random.Generator) -> str:
    kind = rng.integers(0, 5)
    if kind == 0:
        return ""
    if kind == 1:  # single token
        return str(VOCAB[rng.integers(0, len(VOCAB))])
    if kind == 2:  # heavy repetition (Gopher's target case)
        tok = VOCAB[rng.integers(0, len(VOCAB))]
        other = VOCAB[rng.integers(0, len(VOCAB))]
        n = int(rng.integers(2, 30))
        words = [tok] * n + [other] * int(rng.integers(0, 5))
        rng.shuffle(words)
        return " ".join(words)
    # general soup with tie-heavy multiplicities
    n = int(rng.integers(2, 60))
    return " ".join(VOCAB[i] for i in rng.integers(0, len(VOCAB), n))


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(20260817)
    rows = [(i, _make_text(rng)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.register("documents_py", __import__("pandas").DataFrame(rows, columns=["doc_id", "text"]))
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_py")
    return df, con


def _normalize(pdf):
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype.kind in "iuf":
            pdf[c] = pdf[c].astype("float64").round(6)
        else:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def test_repetition_fuzz(corpus):
    import __spark_entry__ as entry

    df, con = corpus
    from pyrosar_spark.operators.textstats import repetition_stats

    got = _normalize(repetition_stats(df).toPandas())
    exp = _normalize(con.execute(entry._text_r5_oracle_sqls()["repetition_stats"]).fetchdf())
    assert got.equals(exp), (
        got.compare(exp).head(5) if got.shape == exp.shape else (got.shape, exp.shape)
    )


def test_tfidf_fuzz(corpus):
    import __spark_entry__ as entry

    df, con = corpus
    from pyrosar_spark.operators.textstats import tfidf_top_terms

    got = _normalize(
        tfidf_top_terms(df, k=3)
        .select("doc_id", F.col("rank").cast("long").alias("rank"), "term", "tfidf")
        .toPandas()
    )
    exp = _normalize(con.execute(entry._text_r5_oracle_sqls()["tfidf_top_terms"]).fetchdf())
    assert got.equals(exp), (
        got.compare(exp).head(5) if got.shape == exp.shape else (got.shape, exp.shape)
    )


def test_span_digest_null_poisons(spark):
    """A span field corrupted to NULL must null the digest (array_join
    would otherwise silently DROP the span — the exact corruption the
    digest exists to catch)."""
    from pyrosar_spark.datagen import DOC_SCHEMA
    from pyrosar_spark.operators.spans import span_digest

    rows = [
        ("ok", [("text", "hello", "", 0)]),
        ("nulled", [("text", None, "", 0), ("chip", "", "c://x", 1)]),
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {r["doc_id"]: r["digest"] for r in span_digest(df).collect()}
    assert got["ok"] is not None
    assert got["nulled"] is None


def test_span_digest_fuzz_vs_duckdb(spark, corpus):
    """Random span arrays (framing bytes inside text included) —
    engine digest of the stored arrays == DuckDB digest of the same
    parquet. Uses adversarial text as span payloads."""
    import os
    import tempfile

    import __spark_entry__ as entry
    from pyrosar_spark.datagen import DOC_SCHEMA
    from pyrosar_spark.operators.spans import roundtrip_digest

    df, _ = corpus
    rng = np.random.default_rng(7)
    texts = [r["text"] for r in df.limit(100).collect()]
    rows = []
    for i, t in enumerate(texts):
        n = int(rng.integers(1, 5))
        spans = [
            (
                ["scene_meta", "text", "chip"][int(rng.integers(0, 3))],
                t if j == 0 else f"{t}-{j}",
                f"m://{i}/{j}" if j % 2 else "",
                j,
            )
            for j in range(n)
        ]
        rows.append((f"d{i:04d}", spans))
    sdf = spark.createDataFrame(rows, DOC_SCHEMA)
    tmp = os.path.join(tempfile.gettempdir(), "span_fuzz.parquet")
    sdf.write.mode("overwrite").parquet(tmp)
    sdf = spark.read.parquet(tmp)

    got = _normalize(roundtrip_digest(sdf).toPandas())

    con = duckdb.connect()
    sql = entry._text_r5_oracle_sqls()["span_roundtrip"].replace(
        entry._oracle_scan("docs"), f"read_parquet('{tmp}/*.parquet')"
    )
    exp = _normalize(con.execute(sql).fetchdf())
    assert got.equals(exp), (got.head(3), exp.head(3))
