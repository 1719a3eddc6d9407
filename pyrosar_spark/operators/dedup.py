"""Deduplication operators for large-scale document pipelines.

Shapes (SURVEY north-rule extension; reference analog is the ingest
dedup J6 at ``pyroSAR/archive.py:563-577``):

 - **exact**: hash-groupBy on normalized text;
 - **MinHash + LSH**: shingle → minhash signature → band buckets →
   candidate-pair join → exact Jaccard verify;
 - **SimHash**: 64-bit sign-aggregated token hashes, near-dup when
   hamming distance ≤ k;
 - **n-gram Jaccard**: exact pairwise similarity on candidate pairs.

Everything runs JVM-side (higher-order array functions + hash
builtins) — no Python in the hot path. ``hash_mode`` selects
``xxhash64`` (fast path, default) or ``md5`` (bit-portable across
engines — used by the DuckDB correctness oracles; md5 is ~2× slower
but deterministic everywhere).

Scale notes: the only shuffles are groupBys on hash keys (uniform by
construction). LSH band explosion multiplies rows by n_bands (≤ 16);
candidate pairs are deduped before the exact verify. For 100 TB,
band-bucket skew (a viral duplicate cluster) is bounded by capping
bucket size with a count filter before the self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def bind(df: DataFrame, name: str, expr: Column) -> DataFrame:
    """Project ``expr`` as column ``name`` behind a Generate barrier.

    Catalyst's CollapseProject inlines projected expressions into every
    downstream reference — an expensive expression (shingling, a
    16-hash minhash signature, from_json) referenced N times is
    otherwise evaluated N times per row. ``explode(array(expr))``
    produces exactly one row and pins the evaluation to once per row.
    """
    return df.select("*", F.explode(F.array(expr)).alias(name))


def _norm_tokens(text: Column) -> Column:
    toks = F.split(F.lower(text), TOKEN_SPLIT)
    return F.filter(toks, lambda t: t != "")


def portable_hash64(col: Column, seed: int, mode: str = "md5") -> Column:
    """64-bit-ish hash reproducible in any engine with md5().

    ``conv(substr(md5(x || '#seed'), 1, 15), 16, 10)`` — 60 bits, fits
    a signed bigint; identical in Spark and DuckDB. ``mode='xxhash64'``
    is the fast JVM-native path (not cross-engine portable).
    """
    if mode == "xxhash64":
        return F.xxhash64(col, F.lit(seed))
    salted = F.concat(col, F.lit(f"#{seed}"))
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("bigint")


def shingles(text: Column, k: int = 2) -> Column:
    """Distinct k-token shingles of normalized text (JVM higher-order)."""
    toks = _norm_tokens(text)
    n = F.size(toks)
    # NB: Spark's sequence(1, 0) yields a DESCENDING [1, 0] — guard the
    # short-text case explicitly instead of relying on an empty range.
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups: one row per distinct text with the
    member count and the winning (minimum) id — the keep-first rule of
    the reference's duplicate routing."""
    h = F.md5(F.col(text_col))
    return (
        df.select(F.col(id_col), h.alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_members"))
    )


def minhash_signature_from(
    sh: Column, n_hashes: int = 8, hash_mode: str = "md5"
) -> Column:
    """Array of ``n_hashes`` min-hash values over a (pre-bound) shingle
    array column. Bind the shingles first (see :func:`bind`) — this
    expression references them ``n_hashes`` times."""
    sigs = [
        F.array_min(F.transform(sh, lambda g, s=s: portable_hash64(g, s, hash_mode)))
        for s in range(n_hashes)
    ]
    return F.array(*sigs)


def minhash_signature(
    text: Column, n_hashes: int = 8, shingle_k: int = 2, hash_mode: str = "md5"
) -> Column:
    """Inline variant (re-evaluates shingling per hash when collapsed —
    prefer ``bind`` + :func:`minhash_signature_from` in pipelines)."""
    return minhash_signature_from(shingles(text, shingle_k), n_hashes, hash_mode)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    n_bands: int = 4,
    shingle_k: int = 2,
    hash_mode: str = "md5",
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    rows-per-band = n_hashes / n_bands. Pairs are (a < b), deduped
    across bands. ``max_bucket`` caps pathological buckets (viral
    near-identical clusters) so the within-bucket self-join cannot
    explode quadratically at scale — dropped buckets are a documented
    recall trade, not silent (count them via the returned plan).
    """
    rows_per_band = n_hashes // n_bands
    # the signature is ~n_hashes × |shingles| hash evaluations per row —
    # a single-file input would pin all of it on one task; spread first
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)
    # bind shingles, then the signature — each is computed once per row
    with_sh = bind(
        df.select(F.col(id_col).alias("_id"), F.col(text_col)), "_sh",
        shingles(F.col(text_col), shingle_k),
    ).where(F.size("_sh") > 0)
    with_sig = bind(
        with_sh, "_sig", minhash_signature_from(F.col("_sh"), n_hashes, hash_mode)
    ).select("_id", "_sig")
    bands = with_sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.array_join(
                            F.transform(
                                F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                            "_",
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    counted = bands.groupBy("band", "key").agg(
        F.collect_list("_id").alias("ids"), F.count("*").alias("n")
    )
    small = counted.where((F.col("n") >= 2) & (F.col("n") <= max_bucket))
    pairs = (
        small.select(F.explode("ids").alias("a"), F.col("ids"))
        .select("a", F.explode("ids").alias("b"))
        .where(F.col("a") < F.col("b"))
        .distinct()
    )
    return pairs


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 2,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (verify stage)."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)
    sh = bind(
        df.select(F.col(id_col).alias("_jid"), F.col(text_col)), "_sh",
        shingles(F.col(text_col), shingle_k),
    ).select("_jid", "_sh")
    out = (
        pairs.join(sh.withColumnRenamed("_jid", "a").withColumnRenamed("_sh", "sh_a"), on="a")
        .join(sh.withColumnRenamed("_jid", "b").withColumnRenamed("_sh", "sh_b"), on="b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return out


def simhash64(text: Column, hash_mode: str = "xxhash64") -> Column:
    """64-bit SimHash of the token multiset.

    Per bit b: sign of Σ_tokens (bit_b(hash(token)) ? +1 : -1). Built
    from higher-order array ops — JVM-side, no UDF: accumulate the 64
    per-bit counters with ``aggregate`` over the token array.
    """
    toks = _norm_tokens(text)
    hashes = F.transform(toks, lambda t: portable_hash64(t, 0, hash_mode))
    zero = F.array_repeat(F.lit(0).cast("long"), 64)
    # bit positions are Python ints (shiftright needs a literal count)
    counters = F.aggregate(
        hashes,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1)
                    .otherwise(-1)
                    .cast("long")
                    for b in range(64)
                ]
            ),
            lambda a, x: a + x,
        ),
    )
    bits = F.array(
        *[
            F.when(
                F.element_at(counters, b + 1) > 0,
                F.lit(1 << b if b < 63 else -(1 << 63)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            for b in range(64)
        ]
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda a, x: a.bitwiseXOR(x))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash with block-permutation candidate
    generation: split the 64-bit hash into ``n_blocks`` 16-bit blocks;
    any pair within hamming ≤ n_blocks-1 shares ≥1 exact block
    (pigeonhole) → equi-join per block, then exact hamming verify."""
    sh = df.select(F.col(id_col).alias("_id"), simhash64(F.col(text_col)).alias("_sh"))
    width = 64 // n_blocks
    blocks = sh.select(
        "_id",
        "_sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright(F.col("_sh"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("val"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("b"),
    ).select("_id", "_sh", F.col("b.blk").alias("blk"), F.col("b.val").alias("val"))
    left = blocks.select(
        F.col("_id").alias("a"), F.col("_sh").alias("sh_a"), "blk", "val"
    )
    right = blocks.select(
        F.col("_id").alias("b"), F.col("_sh").alias("sh_b"), "blk", "val"
    )
    return (
        left.join(right, on=["blk", "val"])
        .where(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
        .withColumn("hamming", hamming64(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
