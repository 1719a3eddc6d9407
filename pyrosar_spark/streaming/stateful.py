"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference ingests scenes incrementally and must never re-register
a scene already in the archive (``Archive.insert`` duplicate routing,
``pyroSAR/archive.py:563-599``). In the streaming shape that is a
cross-micro-batch, cross-RESTART dedup: the "seen" set must survive
both the next trigger and a stop/start of the job. Spark's watermark
dedup (``dropDuplicates`` on a stream) bounds its state by event time;
this operator instead keeps an explicit per-key GroupState, which is
checkpointed with the query — stopping the stream and restarting it
from the same checkpoint resumes the exact registration state (the
north rule's mid-run resumability, applied to the streaming surface).

Scale notes: state is partitioned by the grouping key (high
cardinality — one entry per scene key), lives in the state store
(RocksDB on a real cluster), and each micro-batch shuffles only its
own rows. No driver-side state anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout


def dedup_stream(
    stream_df: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """First-arrival-wins streaming dedup on ``key_cols``.

    Emits exactly one row per key over the lifetime of the checkpoint
    (the first row of the first micro-batch that carries the key —
    within a batch, input order); later arrivals of the same key emit
    nothing, in the same trigger, a later trigger, or a later RUN
    resumed from the checkpoint.
    """
    schema = stream_df.schema

    def fn(key, pdfs, state):
        if state.exists:
            for _ in pdfs:  # drain — key already registered
                pass
            return
        for pdf in pdfs:
            if len(pdf):
                state.update((True,))
                yield pdf.head(1)
                for _ in pdfs:  # drain the remainder of this group
                    pass
                return

    return stream_df.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
