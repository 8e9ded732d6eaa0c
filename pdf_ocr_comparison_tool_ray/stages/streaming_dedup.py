"""Online (streaming) exact dedup through a sharded mutable-state gate.

The batch dedup family (``stages/dedup.py``) needs the whole corpus
keyed and shuffled before the first kept row emerges.  An INGESTION
pipeline has the opposite shape: rows arrive continuously (resumed
crawls, incremental drops) and each must be admitted or rejected NOW,
against everything admitted so far — state that a ``map_batches`` task
cannot hold because it must be shared and mutable across all tasks.

This is the one shape where the engine drops to raw ``@ray.remote``
actors (the documented last-resort tier): a pool of ``DedupShard``
actors, each OWNING one hash range of the seen-key space.  A
``map_batches`` stage hashes its batch's keys, splits them by shard,
and calls ``check_and_add`` on each owner — one round trip per
(batch, shard), never per row.  Per-row semantics: the FIRST call to
claim a key wins; later claims (same batch, later batches, concurrent
tasks) are rejected.  Cross-task arrival order is scheduling-dependent,
so the operator guarantees set-level semantics (exactly one
representative per key survives; which one depends on arrival), unlike
the deterministic batch ``exact_dedup`` — callers that need
deterministic winners run the batch path instead; tests pin both the
set law and single-winner-under-contention.

Scale notes: state is sharded by key hash across ``n_shards`` actors
(place them across nodes; memory per actor = its share of distinct
keys — 8 B hash per key in a set, ~1 GB per 60M distinct keys), calls
batch per shard, and the gate composes with checkpointing: persist each
shard's ``snapshot()`` with the partition manifest and ``restore()`` on
resume so re-ingested partitions dedup against prior runs.
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from typing import Iterable, List

import numpy as np
import pyarrow as pa
import ray


@ray.remote
class DedupShard:
    """Owns one shard of the seen-key space.  State: a set of uint64
    key hashes.  ``check_and_add`` is atomic per actor (actor calls
    serialize), which is what makes first-claim-wins correct under
    concurrent callers.

    Retry idempotency: a mutating call that Ray re-executes (task
    retry / lineage reconstruction) must NOT re-adjudicate — the retry
    would see its own first attempt's claims and reject every row, i.e.
    silent data loss.  Callers therefore pass a ``token`` stable across
    retries of the same task (task-id + key-bytes digest); the shard
    memoizes the admit mask per token and REPLAYS it on a repeat call.
    The memo is a bounded LRU (retries arrive promptly; the horizon
    only needs to outlive in-flight work) and is deliberately excluded
    from ``snapshot``/``restore`` — the retry window never spans a
    checkpoint restart."""

    def __init__(self, memo_horizon: int = 4096) -> None:
        self._seen: set[int] = set()
        self._memo: OrderedDict[str, List[bool]] = OrderedDict()
        self._memo_horizon = memo_horizon

    def check_and_add(self, keys: List[int], token: str | None = None) -> List[bool]:
        """-> admit-mask; a key repeated WITHIN the call admits once.
        A repeated ``token`` replays the original mask verbatim."""
        if token is not None:
            hit = self._memo.get(token)
            if hit is not None:
                self._memo.move_to_end(token)
                return hit
        seen = self._seen
        out = []
        for k in keys:
            if k in seen:
                out.append(False)
            else:
                seen.add(k)
                out.append(True)
        if token is not None:
            self._memo[token] = out
            while len(self._memo) > self._memo_horizon:
                self._memo.popitem(last=False)
        return out

    def size(self) -> int:
        return len(self._seen)

    def snapshot(self) -> bytes:
        """Checkpoint payload (sorted for stable bytes)."""
        return np.fromiter(sorted(self._seen), dtype=np.uint64).tobytes()

    def restore(self, payload: bytes) -> int:
        self._seen.update(np.frombuffer(payload, dtype=np.uint64).tolist())
        return len(self._seen)


class DedupGate:
    """Client handle: builds the shard pool and stamps admit masks.

    Use as a closure inside ``map_batches`` (the handle pickles into
    tasks; all tasks share the SAME actors)::

        gate = DedupGate(n_shards=16)
        kept = ds.map_batches(lambda b: gate.filter_batch(b, "text"),
                              batch_format="pyarrow")
    """

    def __init__(self, n_shards: int = 16):
        self.n_shards = n_shards
        self.shards = [DedupShard.remote() for _ in range(n_shards)]

    @staticmethod
    def _key_hashes(values: Iterable) -> np.ndarray:
        return np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(str(v).encode()).digest()[:8], "big"
                )
                for v in values
            ),
            dtype=np.uint64,
        )

    @staticmethod
    def _attempt_scope() -> str | None:
        """Retry-stable scope for idempotency tokens: Ray task ids are
        identical across retries/lineage re-execution of the same task
        (only the attempt number differs), so task-id + key-bytes makes
        a token that repeats exactly when the same work repeats.  None
        outside a task (driver-side callers are never retried, and a
        content-only token would wrongly replay across two distinct
        identical-content calls) — then no memoization happens."""
        try:
            tid = ray.get_runtime_context().get_task_id()
        except Exception:
            tid = None
        return tid or None

    def admit_mask(self, values: Iterable) -> np.ndarray:
        """-> boolean admit mask, one round trip per touched shard.
        Idempotent under Ray task retry (see ``DedupShard``)."""
        hashes = self._key_hashes(values)
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        scope = self._attempt_scope()
        shard_of = (hashes % self.n_shards).astype(np.int64)
        mask = np.zeros(len(hashes), dtype=bool)
        futures, idx_per_shard = [], []
        for s in np.unique(shard_of):
            idx = np.nonzero(shard_of == s)[0]
            sub = hashes[idx]
            token = (
                hashlib.md5(scope.encode() + sub.tobytes()).hexdigest()
                if scope is not None
                else None
            )
            futures.append(
                self.shards[int(s)].check_and_add.remote(
                    sub.tolist(), token
                )
            )
            idx_per_shard.append(idx)
        for idx, admits in zip(idx_per_shard, ray.get(futures)):
            mask[idx] = admits
        return mask

    def filter_batch(self, batch: pa.Table, key_col: str) -> pa.Table:
        return batch.filter(
            pa.array(self.admit_mask(batch[key_col].to_pylist()))
        )

    def n_seen(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def snapshots(self) -> List[bytes]:
        """Per-shard checkpoint payloads (pair with the partition
        manifest; feed back via ``restore`` on resume)."""
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, payloads: List[bytes]) -> None:
        if len(payloads) != self.n_shards:
            raise ValueError(
                f"{len(payloads)} snapshots for {self.n_shards} shards"
            )
        ray.get([
            s.restore.remote(p) for s, p in zip(self.shards, payloads)
        ])


def streaming_dedup(ds, key_col: str = "text", n_shards: int = 16,
                    gate: DedupGate | None = None):
    """Online first-arrival-wins dedup of a streaming Dataset.

    Set-level guarantee: exactly one row per distinct ``key_col`` value
    survives (WHICH one is arrival-dependent under parallelism — use
    ``stages.dedup`` batch dedup for deterministic winners).  Returns
    (deduped_dataset, gate); pass the gate back in to continue the same
    seen-set across multiple datasets / resumed runs.

    The returned dataset is MATERIALIZED: the admit filter mutates
    shared actor state, so executing it lazily would make the output
    single-consumption (a second ``count()``/write would re-run the
    filter against keys the first execution already claimed and drop
    every row).  Materializing here runs the gate exactly once; the
    result can then be consumed any number of times.  Mid-execution
    task retries are also safe — ``admit_mask`` tokens make replays
    idempotent (see ``DedupShard``).
    """
    gate = gate or DedupGate(n_shards=n_shards)
    out = ds.map_batches(
        lambda b: gate.filter_batch(b, key_col), batch_format="pyarrow"
    ).materialize()
    return out, gate
