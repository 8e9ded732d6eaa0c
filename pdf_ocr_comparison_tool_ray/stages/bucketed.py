"""Bucket-wise co-partition: the high-cardinality groupby pattern.

Ray's ``groupby(key).map_groups(fn)`` invokes Python machinery once PER
GROUP — measured at ~50ms/group overhead (NOTES.md: 15k customer keys
burned ~700 CPU-s on 30k rows).  When the key cardinality is much larger
than the worker count, the scale-safe shape is: hash the key into
``n_buckets`` buckets, ``groupby(bucket)`` (one shuffle, bounded group
count), then run a VECTORIZED pandas/numpy computation over each whole
bucket.  Results are identical because a bucket contains every row of
each key it holds (hash co-partition), so any per-key computation can run
inside the bucket.

First proven on ``q_region_revenue`` (2x wall-time, oracle-identical);
this module generalizes it for asof/range/rolling joins, sessionization,
medians, pair dedup and connected components.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Union

import pandas as pd
import pyarrow as pa
import ray.data
from pandas.util import hash_pandas_object

BUCKET_COL = "_bucket"


def add_bucket(
    df: pd.DataFrame, keys: Sequence[str], n_buckets: int
) -> pd.DataFrame:
    """Append a deterministic hash-bucket column for ``keys``.

    ``hash_pandas_object`` is stable across processes (fixed hash key, no
    PYTHONHASHSEED dependence), which resume/recompute determinism needs.
    """
    h = hash_pandas_object(df[list(keys)], index=False)
    df = df.copy(deep=False)
    df[BUCKET_COL] = (h % n_buckets).astype("int64")
    return df


def bucketed_map_groups(
    ds: ray.data.Dataset,
    keys: Union[str, Sequence[str]],
    bucket_fn: Callable[[pd.DataFrame], Union[pd.DataFrame, pa.Table]],
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """``groupby(keys)``-equivalent co-partition with vectorized buckets.

    ``bucket_fn`` receives one WHOLE bucket (all rows of every key hashed
    into it, ``BUCKET_COL`` already dropped) and must itself handle the
    per-key logic vectorized (``df.groupby(keys)`` inside the bucket).
    One all-to-all shuffle, exactly ``n_buckets`` Python group
    invocations regardless of key cardinality.
    """
    key_list: List[str] = [keys] if isinstance(keys, str) else list(keys)

    def tag(batch: pa.Table) -> pa.Table:
        # tag on ARROW blocks: the shuffle then moves arrow blocks, which
        # carry list/nested columns that pandas-block shuffles reject
        # (object ndarrays of ndarrays); only the key columns are
        # converted to pandas for the hash
        kdf = batch.select(key_list).to_pandas()
        h = hash_pandas_object(kdf, index=False)
        return batch.append_column(
            BUCKET_COL, pa.array((h % n_buckets).to_numpy(), type=pa.int64())
        )

    def run(group: pd.DataFrame):
        return bucket_fn(group.drop(columns=[BUCKET_COL]))

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby(BUCKET_COL)
        .map_groups(run, batch_format="pandas")
    )


def bucketed_drop_duplicates(
    ds: ray.data.Dataset,
    keys: Union[str, Sequence[str]],
    n_buckets: int = 64,
    sort_within: Sequence[str] | None = None,
) -> ray.data.Dataset:
    """Distributed ``drop_duplicates(keys)`` without per-key Python groups.

    Rows of equal key co-locate in one bucket; the bucket drops dups
    vectorized.  ``sort_within`` makes the kept row deterministic when
    duplicate rows differ in other columns (sorted ascending, first kept).
    """
    key_list: List[str] = [keys] if isinstance(keys, str) else list(keys)

    def drop(df: pd.DataFrame) -> pd.DataFrame:
        if sort_within:
            df = df.sort_values(list(sort_within), kind="mergesort")
        return df.drop_duplicates(key_list)

    return bucketed_map_groups(ds, key_list, drop, n_buckets=n_buckets)
