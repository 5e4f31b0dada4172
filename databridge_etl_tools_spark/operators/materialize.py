"""Selectable materialization strategy for multi-consumer / iterative
intermediates (round-3 verdict item: fault-tolerance knob).

Several hot paths (dedup shingle tables, MinHash/SimHash signature
tables, connected-components iteration frontiers) must materialize an
intermediate DataFrame because (a) both sides of a self-join consume
it, (b) lineage must be cut so Catalyst re-derivation hazards
(InferFiltersFromGenerate inlining interpreted-HOF expression trees
into scan filters) cannot re-expand it, or (c) an iterative loop would
otherwise grow the plan unboundedly.

``localCheckpoint`` is the right default on a single machine: no
checkpoint directory needed, executor-local blocks, reclaimed by the
ContextCleaner. But its blocks are NOT fault-tolerant — on a real
cluster, losing one executor (a preemption, an OOM kill) makes the
blocks unrecoverable and aborts the query mid-flight. At 100 TB-scale
runtimes (hours), some executor loss is near-certain, so cluster runs
should select a strategy that survives it:

- ``reliable``: ``DataFrame.checkpoint`` — writes to the checkpoint
  directory (HDFS/S3 on a cluster). Survives any executor loss;
  costs a distributed write. Callers must set
  ``spark.sparkContext.setCheckpointDir`` to durable storage; if
  unset, a session-local temp dir is used (fine locally, NOT durable
  on a cluster — set it explicitly there).
- ``persist``: ``persist(StorageLevel.DISK_ONLY)`` + eager count.
  Keeps lineage, so a lost block is RECOMPUTED from source instead of
  failing the query — fault-tolerant via recompute rather than
  replication. Cheapest safe option when the lineage itself is cheap
  to re-run, but NOT safe where the checkpoint exists to cut lineage
  for plan-correctness reasons (the InferFiltersFromGenerate hazard
  above): those sites demand a lineage-CUTTING strategy and pass
  ``cut_lineage=True`` to reject it.
- ``none``: no materialization (recompute per consumer) — for plan
  inspection and A/B timing.

Strategy is process-global (set once for a job), selectable by env
var ``SPARK_GRAFT_MATERIALIZE`` or :func:`set_strategy`; tests use
the :func:`strategy` context manager to pin result-equality across
modes.
"""

from __future__ import annotations

import os
import tempfile
from contextlib import contextmanager

from pyspark import StorageLevel
from pyspark.sql import DataFrame

STRATEGIES = ("local_checkpoint", "reliable", "persist", "none")

_strategy: str = os.environ.get("SPARK_GRAFT_MATERIALIZE", "local_checkpoint")


def get_strategy() -> str:
    return _strategy


def set_strategy(name: str) -> None:
    if name not in STRATEGIES:
        raise ValueError(f"unknown materialize strategy {name!r}; one of {STRATEGIES}")
    global _strategy
    _strategy = name


@contextmanager
def strategy(name: str):
    prev = _strategy
    set_strategy(name)
    try:
        yield
    finally:
        set_strategy(prev)


def _ensure_checkpoint_dir(df: DataFrame) -> None:
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        # Local fallback only — on a cluster, point this at HDFS/S3
        # explicitly; a driver-local temp dir is not durable there.
        sc.setCheckpointDir(tempfile.mkdtemp(prefix="sg-ckpt-"))


def materialize(df: DataFrame, eager: bool = True, cut_lineage: bool = False) -> DataFrame:
    """Materialize ``df`` under the selected strategy.

    ``cut_lineage=True`` marks sites where truncating lineage is a
    CORRECTNESS requirement (defusing optimizer re-derivation of
    interpreted-HOF expression trees), not merely a reuse
    optimization: the ``persist``/``none`` strategies keep lineage, so
    such sites fall back to ``local_checkpoint`` rather than silently
    reintroducing the O(tokens²) re-evaluation hazard.
    """
    s = _strategy
    if cut_lineage and s in ("persist", "none"):
        s = "local_checkpoint"
    if s == "none":
        return df
    if s == "local_checkpoint":
        return df.localCheckpoint(eager=eager)
    if s == "reliable":
        _ensure_checkpoint_dir(df)
        return df.checkpoint(eager=eager)
    # persist: lineage kept — lost blocks recompute instead of failing
    out = df.persist(StorageLevel.DISK_ONLY)
    if eager:
        out.count()
    return out
