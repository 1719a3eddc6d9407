"""Span-sequence integrity through distributed redistribution.

The input contract (BASELINE.json ``input_hint``) demands that every
interleaved document's span sequence — ``(kind, text, media_ref,
offset)`` in order — survive the pipeline byte-identically.  The
reference keeps a scene's metadata, annotation text, and raster
references together because downstream processing (``pyroSAR/drivers.py``
scene export, ``datacube_util.py`` product assembly) re-reads them as a
unit; losing a span or reordering two is silent data corruption.

This module makes that invariant *checkable at scale*: documents are
exploded to individual spans, scattered across the cluster by a hash
that deliberately ignores ``doc_id`` (the adversarial redistribution a
real pipeline performs when spans are processed by kind — text spans
through dedup, chip spans through media decode), then reassembled by
``doc_id`` with an offset-ordered ``sort_array``.  A canonical
per-document digest (md5 over a separator-framed rendering of every
field of every span, in offset order) is computed on the reassembled
sequence; the oracle computes the same digest directly on the stored
arrays.  Digest equality per document == byte identity of the full
sequence, order included.

Scale notes (100 TB): the explode is a Generate (no shuffle); the
scatter and the reassembly are each ONE hash shuffle; ``collect_list``
per document is bounded by spans-per-document (single digits here,
never corpus-sized), so no group blows executor memory.  The digest
itself is pure JVM column expressions — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Framing separators for the canonical rendering. Control characters
# never appear in span text (the generator and the reference's scene
# identifiers are printable), so framing is unambiguous.
_FS = "\x01"  # between fields of one span
_RS = "\x02"  # between spans


def _render_span(kind: Column, text: Column, media_ref: Column, offset: Column) -> Column:
    """Canonical one-span rendering. Plain ``concat`` (NULL-propagating,
    like DuckDB ``||``) — a NULL field nulls the digest rather than
    silently collapsing, so corruption cannot hide behind concat_ws's
    NULL-skipping."""
    return F.concat(
        kind, F.lit(_FS), text, F.lit(_FS), media_ref, F.lit(_FS),
        offset.cast("string"),
    )


def span_digest(docs: DataFrame) -> DataFrame:
    """(doc_id, n_spans, digest) computed directly on the stored span
    arrays — the no-redistribution reference rendering.

    NULL poisoning is explicit: ``array_join`` silently SKIPS null
    elements (it does not null the result), which would let a
    corrupted-to-NULL span vanish from the digest — so a document with
    any null-rendered span gets a NULL digest instead, which can never
    equal the oracle's."""
    rendered = F.transform(
        "spans",
        lambda s: _render_span(s["kind"], s["text"], s["media_ref"], s["offset"]),
    )
    return docs.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        F.when(
            F.exists(rendered, lambda r: r.isNull()), F.lit(None).cast("string")
        )
        .otherwise(F.md5(F.array_join(rendered, _RS)))
        .alias("digest"),
    )


def explode_spans(docs: DataFrame) -> DataFrame:
    """One row per span: (doc_id, kind, text, media_ref, offset).

    ``explode_outer``, not ``explode``: a document whose spans array is
    EMPTY must keep a (doc_id, all-NULL) marker row — with inner
    explode the document would vanish from the roundtrip entirely,
    turning total span loss into a silently-passing absence instead of
    a visible n_spans=0 row (the oracle digests the stored empty array
    to md5(''))."""
    return docs.select(
        "doc_id", F.explode_outer("spans").alias("s")
    ).select("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset")


def reassemble_spans(exploded: DataFrame) -> DataFrame:
    """Rebuild (doc_id, spans) from scattered span rows; offset is the
    authoritative order (``sort_array`` on structs sorts by the first
    field, so offset leads the struct). The all-NULL marker rows that
    ``explode_outer`` emits for empty-spans documents are dropped from
    the rebuilt array (``collect_list`` skips NULL inputs), restoring
    exactly ``spans = []`` for those documents — a REAL span can never
    be mistaken for a marker because the input contract has non-null
    kind/offset, and a corrupted-to-NULL field poisons the digest
    rather than hiding (span_digest's NULL rule)."""
    span_struct = F.when(
        F.col("offset").isNotNull() | F.col("kind").isNotNull(),
        F.struct(
            F.col("offset"), F.col("kind"), F.col("text"), F.col("media_ref")
        ),
    )
    return (
        exploded.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(span_struct)).alias("ordered"))
        .select(
            "doc_id",
            F.transform(
                "ordered",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ).alias("spans"),
        )
    )


def roundtrip_digest(docs: DataFrame) -> DataFrame:
    """Explode → adversarial scatter → reassemble → digest.

    The scatter hashes the span *content* (not doc_id), so the spans of
    one document land on different partitions — the worst case a real
    by-kind processing stage produces. The reassembly then has to get
    both membership and order right; the digest proves it did.
    """
    exploded = explode_spans(docs)
    scattered = exploded.repartition(
        F.xxhash64("kind", "text", "media_ref", "offset")
    )
    return span_digest(reassemble_spans(scattered))
