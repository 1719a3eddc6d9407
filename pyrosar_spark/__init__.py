"""pyrosar_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-creation of the query and data-processing semantics of
``johntruckenbrodt/pyroSAR`` (scene catalog + ``Archive.select``, lat/lon
tile-grid assignment, orbit-file as-of matching, time-gap grouping) built
on ``pyspark.sql`` DataFrames with vectorized pandas/Arrow UDFs, over
tables of interleaved text+media documents
``(doc_id, spans: array<struct<kind,text,media_ref,offset>>)``.

Everything here derives from public knowledge only: the Apache Spark API
and the reference repo's observable behavior (cited as ``file:line`` in
docstrings).
"""

__version__ = "0.1.0"
