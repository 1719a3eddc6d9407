"""Multimodal (image/audio/video) column plumbing.

Media arrive as opaque ``binary`` payloads referenced by ``media_ref``
span entries (the role the ``scene`` path plays in the reference —
rasters are never held in the catalog, ``pyroSAR/drivers.py:429-477``).
The Spark-side plumbing — schema, Arrow batching, partitioning — is
real and tested; the actual codec work is stubbed behind
``decoder=`` because no image/audio libraries ship in this
environment:

 - :func:`decode_metadata` — ``mapInPandas`` over (id, payload)
   batches returning typed metadata (width/height/n_bytes). The
   default ``fake_decoder`` derives dimensions deterministically from
   the payload hash (so tests and SQL oracles can verify the exact
   pipeline), a real deployment passes e.g. a PIL/libvips decoder.
 - :func:`resolve_media_refs` — explode chip spans to one row per
   ``media_ref`` and attach a deterministic synthetic payload
   (stand-in for the object-store fetch).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = "doc_id string, media_ref string, n_bytes int, width int, height int, channels int"


def fake_decoder(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder: dimensions derived
    from the md5 of the payload. A real decoder would be dropped in
    here (PIL.Image.open etc.) — NotImplementedError territory in this
    container."""
    h = int(hashlib.md5(payload).hexdigest()[:15], 16)
    width = 1 + h % 512
    height = 1 + (h % 262144) // 512
    channels = 1 + (h % 3)
    return width, height, channels


def bmp_decoder(payload: bytes) -> tuple[int, int, int]:
    """Real byte-level decoder for Windows BMP payloads (pure struct —
    no image libraries needed): validates the ``BM`` magic and reads
    width / height / bits-per-pixel from the BITMAPINFOHEADER. Proves
    the ``decoder=`` boundary works with an actual codec, not just the
    deterministic fake (negative height = top-down BMP, still valid).
    """
    import struct as _struct

    if payload[:2] != b"BM" or len(payload) < 30:
        raise ValueError("not a BMP payload")
    width, height = _struct.unpack_from("<ii", payload, 18)
    (bpp,) = _struct.unpack_from("<H", payload, 28)
    return int(width), abs(int(height)), max(bpp // 8, 1)


def decode_metadata(
    media: DataFrame,
    decoder: Callable[[bytes], tuple[int, int, int]] = fake_decoder,
    id_col: str = "doc_id",
    ref_col: str = "media_ref",
    payload_col: str = "payload",
) -> DataFrame:
    """Arrow-batched metadata extraction over binary media payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = np.array(
                [decoder(bytes(p)) for p in pdf[payload_col]], dtype=np.int64
            ).reshape(-1, 3)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype(str),
                    "media_ref": pdf[ref_col].astype(str),
                    "n_bytes": pdf[payload_col].map(len).astype("int32"),
                    "width": dims[:, 0].astype("int32"),
                    "height": dims[:, 1].astype("int32"),
                    "channels": dims[:, 2].astype("int32"),
                }
            )

    return media.select(id_col, ref_col, payload_col).mapInPandas(run, DECODE_SCHEMA)


def resolve_media_refs(docs: DataFrame) -> DataFrame:
    """One row per chip span with a deterministic synthetic payload
    (stands in for the object-store fetch keyed by media_ref)."""
    chips = docs.select(
        "doc_id",
        F.explode(F.filter(F.col("spans"), lambda s: s.kind == F.lit("chip"))).alias("s"),
    ).select("doc_id", F.col("s.media_ref").alias("media_ref"))
    payload = F.encode(F.concat(F.lit("payload:"), F.col("media_ref")), "utf-8")
    return chips.withColumn("payload", payload)


def media_ref_to_path(ref: "F.Column", base_dir: str) -> "F.Column":
    """``scheme://bucket/key`` → ``{base_dir}/bucket/key`` (the local
    mount / FUSE view of the object store)."""
    return F.concat(
        F.lit(base_dir.rstrip("/") + "/"),
        F.regexp_replace(ref, r"^[a-z0-9+.-]+://", ""),
    )


def fetch_payloads(
    refs: DataFrame,
    base_dir: str,
    ref_col: str = "media_ref",
    on_missing: str = "null",
) -> DataFrame:
    """REAL object-store fetch for media refs (S3 closure): resolve each
    ``media_ref`` against a store root and read the bytes inside the
    Arrow batch — executor-side I/O, one open per ref, no driver
    involvement (the reference opens scene archives per path the same
    way, ``drivers.py:429-477``; here the store is any mounted
    filesystem — S3/GCS arrive via their FUSE or ``s3a://`` mounts).

    ``on_missing``: ``'null'`` yields a NULL payload, ``'error'``
    raises — mirroring ``identify``'s missing-file behavior.
    """
    if on_missing not in ("null", "error"):
        raise ValueError(f"unknown on_missing mode: {on_missing}")
    out_schema = refs.withColumn("payload", F.lit(None).cast("binary")).schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os
        import re

        root = base_dir.rstrip("/")
        real_root = os.path.realpath(root) + os.sep
        for pdf in batches:
            payloads = []
            for ref in pdf[ref_col]:
                # catalog-controlled refs must stay inside the store
                # root: an absolute ref would make os.path.join discard
                # the root and '..' segments would escape it (ADVICE r2)
                # — resolve and require the real path under the root.
                key = re.sub(r"^[a-z0-9+.-]+://", "", str(ref)).lstrip("/")
                path = os.path.realpath(os.path.join(root, key))
                if not path.startswith(real_root):
                    if on_missing == "error":
                        raise ValueError(f"media_ref escapes store root: {ref}")
                    payloads.append(None)
                    continue
                try:
                    with open(path, "rb") as fh:
                        payloads.append(fh.read())
                except FileNotFoundError:
                    if on_missing == "error":
                        raise
                    payloads.append(None)
            pdf = pdf.copy()
            pdf["payload"] = payloads
            yield pdf

    return refs.mapInPandas(run, out_schema)
