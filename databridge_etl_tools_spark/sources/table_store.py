"""Parquet-backed table store with the reference's lifecycle
semantics (SURVEY §2.6 D1-D6, §2.9 V8).

The reference manages Postgres tables: create-from-JSON-schema with
drift-driven drop/recreate (D1), temp empty clones (D2), drop (D3),
truncate (D4/D5), blue/green rename swap (D6), all inside one
transaction per load (postgres/postgres.py:113-149). Here a "table"
is a versioned parquet directory; every mutation writes a NEW
version directory and flips a manifest pointer last — the atomic-swap
pattern (what Delta's CREATE OR REPLACE does transactionally on a
real lakehouse; this store is the dependency-free local analogue and
the unit under test for the pipelines).

Scale notes: version directories are plain parquet datasets —
readers at any parallelism scan them directly; the manifest flip is
one tiny file rename, never a data rewrite of the old version.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schema import TableSchema, schema_drift


def _check_commit(op: str, table: str, commit: int, n: int) -> int:
    """Bounds-check a commit-log index (0-based; negative indexes from
    the end, -1 = current) so an out-of-range CLI argument raises the
    store's ValueError style with the valid range, not a bare
    IndexError traceback."""
    if not -n <= commit < n:
        raise ValueError(
            f"{op}: {table} has no commit {commit} "
            f"(valid range: {-n}..{n - 1}, {n} commit(s) in the log)"
        )
    return commit


class TableStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths / manifest ------------------------------------------------
    def _dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest(self, table: str) -> str:
        return os.path.join(self._dir(table), "MANIFEST.json")

    def _read_manifest(self, table: str) -> dict:
        with open(self._manifest(table)) as f:
            return json.load(f)

    def _segments(self, table: str) -> list[str]:
        """Version directories making up the current table state, in
        commit order. ``current`` is a single name for tables written
        before incremental appends existed — served as a one-segment
        list (manifest migration is read-side, never a rewrite)."""
        cur = self._read_manifest(table)["current"]
        return [cur] if isinstance(cur, str) else list(cur)

    def _current_data_dir(self, table: str) -> str:
        segs = self._segments(table)
        if len(segs) != 1:
            raise ValueError(
                f"table {self._dir(table)} has {len(segs)} segments; "
                f"use read()/compact()"
            )
        return os.path.join(self._dir(table), segs[0])

    def _write_version(self, table: str, df: DataFrame) -> str:
        version = f"v-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
        path = os.path.join(self._dir(table), version)
        df.write.mode("errorifexists").parquet(path)
        return version

    def _flip(
        self, table: str, version: str | list[str], props: dict | None = None
    ) -> None:
        """Atomic pointer flip: write manifest to a temp name, rename
        over the old one (rename is atomic on POSIX; on a real
        lakehouse this is the Delta/Iceberg commit). ``version`` may
        be a segment LIST — the incremental-append commit: the new
        manifest references old segments + the delta, no data moves."""
        os.makedirs(self._dir(table), exist_ok=True)
        old = {}
        if os.path.exists(self._manifest(table)):
            old = self._read_manifest(table)
        doc = {
            "current": version,
            "properties": {**old.get("properties", {}), **(props or {})},
        }
        tmp = self._manifest(table) + f".tmp-{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, self._manifest(table))
        # commit log (append-only, crash-tolerant: a torn tail line is
        # skipped on read) — what history()/read_version() time-travel
        # over. Written AFTER the flip: the log may lag the manifest by
        # one commit in a crash, never lead it.
        with open(os.path.join(self._dir(table), "_commits.jsonl"), "a") as f:
            f.write(json.dumps({"current": version}) + "\n")

    # -- lifecycle (D1-D6) ----------------------------------------------
    def exists(self, table: str) -> bool:
        return os.path.exists(self._manifest(table))

    def create_table(
        self,
        table: str,
        schema: TableSchema | T.StructType,
        recreate_on_drift: bool = True,
    ) -> bool:
        """D1: create an empty table from a schema. If it exists and
        the live schema drifted, drop + recreate (the reference's
        policy, postgres/postgres.py:454-488). Returns True when a
        (re)create happened."""
        struct = schema.struct if isinstance(schema, TableSchema) else schema
        props = {}
        if isinstance(schema, TableSchema):
            props = {
                "primaryKey": schema.primary_key,
                "geometry": schema.geometry_fields,
            }
        if self.exists(table):
            drift = schema_drift(struct, self.read(table).schema)
            if not drift:
                return False
            if not recreate_on_drift:
                raise ValueError(f"schema drift on {table}: {drift}")
            self.drop(table)
        empty = self.spark.createDataFrame([], struct)
        v = self._write_version(table, empty)
        self._flip(table, v, props)
        return True

    def drop(self, table: str, if_exists: bool = True) -> None:
        """D3: drop table (log-or-error policy, postgres.py:921-946)."""
        if not self.exists(table):
            if if_exists:
                return
            raise ValueError(f"table {table} does not exist")
        shutil.rmtree(self._dir(table))

    def truncate(self, table: str) -> None:
        """D4/D5: keep schema, remove rows — a new empty version
        (joins the 'transaction' in the sense that readers see either
        the old version or the new one, never a half state)."""
        schema = self.read(table).schema
        v = self._write_version(table, self.spark.createDataFrame([], schema))
        self._flip(table, v)

    def overwrite(
        self, table: str, df: DataFrame, select_users: list[str] | None = None
    ) -> None:
        """D6: blue/green replace — write the full new version, flip
        the pointer (reference: _temp table + rename swap,
        carto/carto_.py:443-457, postgres/postgres.py:750-756).

        ``select_users`` records SELECT grants in the SAME flip that
        publishes the data, mirroring the reference's swap transaction
        (carto_.py:417-427 builds GRANT statements into the
        BEGIN..COMMIT of the rename swap): readers never observe the
        new version without its grants."""
        v = self._write_version(table, df)
        props = {"grants": {"select": select_users}} if select_users is not None else None
        self._flip(table, v, props)

    def append(self, table: str, df: DataFrame, evolve: bool = False) -> None:
        """K1 append, O(delta): write ONLY the new rows as a fresh
        segment and commit old-segments+[delta] in one manifest flip.
        Nothing already on disk is read or rewritten — at 100 TB an
        append costs the delta, not the table. Readers see the old or
        the new segment list atomically; ``compact`` bin-packs the
        accumulated segments back into one.

        ``evolve=True`` allows ADDITIVE schema evolution (the Delta
        mergeSchema contract): new columns append with the delta,
        old segments read them as NULL. Dropping or retyping columns
        stays a drift-recreate (D1) — never silent."""
        existing = self.read(table)  # schema check against live state
        missing = set(existing.columns) - set(df.columns)
        if missing:
            raise ValueError(f"append to {table} missing columns: {sorted(missing)}")
        extra = [c for c in df.columns if c not in set(existing.columns)]
        if extra and not evolve:
            raise ValueError(
                f"append to {table} adds columns {extra}; pass evolve=True "
                f"for additive schema evolution"
            )
        cols = existing.columns + (extra if evolve else [])
        v = self._write_version(table, df.select(*cols))
        self._flip(table, self._segments(table) + [v])

    def read(self, table: str) -> DataFrame:
        base = self._dir(table)
        paths = [os.path.join(base, s) for s in self._segments(table)]
        if len(paths) == 1:
            return self.spark.read.parquet(paths[0])
        # multi-segment: merge footers so additively-evolved columns
        # surface (NULL for pre-evolution segments). At 100 TB the
        # footer merge is why compaction back to one schema matters.
        return self.spark.read.option("mergeSchema", "true").parquet(*paths)

    def history(self, table: str) -> "list[dict]":
        """The table's commit log, oldest first: one entry per manifest
        flip (`{"current": version-or-segment-list}`). The local twin
        of DESCRIBE HISTORY on a lakehouse table."""
        path = os.path.join(self._dir(table), "_commits.jsonl")
        if not os.path.exists(path):
            return []
        out = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    out.append(json.loads(line))
                except json.JSONDecodeError:
                    continue  # torn tail line from a crash mid-append
        return out

    def read_version(self, table: str, commit: int) -> DataFrame:
        """Time travel: read the table as of commit ``commit`` (0-based
        into ``history()``; negative indexes from the end, -1 = current).
        Version directories are immutable, so any commit whose data
        ``vacuum`` has not yet removed is readable; a vacuumed commit
        raises. The local twin of `VERSION AS OF`."""
        log = self.history(table)
        if not log:
            raise ValueError(f"read_version: {table} has no commit log")
        entry = log[_check_commit("read_version", table, commit, len(log))]
        segs = entry["current"]
        segs = [segs] if isinstance(segs, str) else list(segs)
        base = self._dir(table)
        missing = [s for s in segs if not os.path.exists(os.path.join(base, s))]
        if missing:
            raise ValueError(
                f"read_version: commit {commit} data vacuumed: {missing}"
            )
        paths = [os.path.join(base, s) for s in segs]
        if len(paths) == 1:
            return self.spark.read.parquet(paths[0])
        return self.spark.read.option("mergeSchema", "true").parquet(*paths)

    def restore(self, table: str, commit: int) -> None:
        """Roll the table back to commit ``commit`` (indexes like
        ``read_version``): one manifest flip to the old, still-immutable
        version directories — no data rewrite, and the restore itself
        becomes a new commit in the log (so a restore is auditable and
        itself restorable). Raises if the target commit's data was
        vacuumed."""
        log = self.history(table)
        if not log:
            raise ValueError(f"restore: {table} has no commit log")
        entry = log[_check_commit("restore", table, commit, len(log))]
        segs = entry["current"]
        segs_list = [segs] if isinstance(segs, str) else list(segs)
        base = self._dir(table)
        missing = [s for s in segs_list if not os.path.exists(os.path.join(base, s))]
        if missing:
            raise ValueError(f"restore: commit {commit} data vacuumed: {missing}")
        self._flip(table, segs)

    def empty_clone_view(self, table: str, view_name: str) -> DataFrame:
        """D2: CREATE TEMPORARY TABLE … WHERE 1=0
        (postgres/postgres.py:903-919) as a limit(0) temp view."""
        df = self.read(table).limit(0)
        df.createOrReplaceTempView(view_name)
        return df

    def properties(self, table: str) -> dict:
        return self._read_manifest(table).get("properties", {})

    def set_properties(self, table: str, **props) -> None:
        m = self._read_manifest(table)
        self._flip(table, m["current"], props)

    def register_index(self, table: str, columns: list[str], kind: str = "btree") -> None:
        """D8 analogue: indexes become layout hints in properties
        (on a lakehouse: bucketBy/Z-ORDER); recorded, never failing
        the load (reference policy, postgres/postgres.py:190-229)."""
        idx = self.properties(table).get("indexes", [])
        idx.append({"columns": columns, "kind": kind})
        self.set_properties(table, indexes=idx)

    def compact(self, table: str, target_partitions: int | None = None) -> int:
        """D9/OPTIMIZE analogue: rewrite the current version with a
        right-sized file count (append mode accretes small files; at
        scale this is the bin-packing compaction every lakehouse
        runs). Returns the new partition count."""
        df = self.read(table)
        if target_partitions is None:
            # ~128MB files assuming parquet compresses the in-memory
            # estimate ~4x; floor of 1
            from pathlib import Path

            nbytes = sum(
                f.stat().st_size
                for seg in self._segments(table)
                for f in Path(self._dir(table), seg).glob("*.parquet")
            )
            target_partitions = max(1, nbytes // (128 << 20))
        out = df.repartition(target_partitions)
        v = self._write_version(table, out)
        self._flip(table, v)  # single segment again
        return target_partitions

    def vacuum(self, table: str) -> list[str]:
        """Delete version directories no manifest references (old
        blue/green versions, compacted-away segments) — Delta VACUUM's
        job. Safe ordering: the manifest flipped away from these dirs
        atomically before they became candidates, so no reader that
        started after the flip can hold them open. Returns the
        removed version names."""
        live = set(self._segments(table))
        removed = []
        for entry in sorted(os.listdir(self._dir(table))):
            if entry.startswith("v-") and entry not in live:
                shutil.rmtree(os.path.join(self._dir(table), entry))
                removed.append(entry)
        return removed

    def reset_objectid_counter(self, table: str, objectid_col: str = "objectid") -> int:
        """D11 semantics: after a load into an id-managed table, the
        reference resets the SDE objectid sequence to max(objectid)
        (postgres/postgres.py:758-777). Here the next id is a table
        property consumers read before assigning new ids."""
        from pyspark.sql import functions as F

        row = self.read(table).agg(F.max(objectid_col).alias("m")).first()
        nxt = int(row["m"] or 0) + 1
        self.set_properties(table, next_objectid=nxt)
        return nxt

    def analyze(self, table: str) -> dict:
        """D9 VACUUM ANALYZE analogue: recompute row count stats."""
        n = self.read(table).count()
        self.set_properties(table, rowcount=n)
        return {"rowcount": n}

    def epoch_seen(
        self, table: str, epoch_id: int, scope: "str | None" = None
    ) -> bool:
        """True when ``(scope, epoch_id)`` is already committed — the
        replay test streaming ``foreachBatch`` sinks run before any
        work. Spark epoch ids are CHECKPOINT-scoped: a query restarted
        against a FRESH checkpoint (even at the same path) renumbers
        from 0, so an unscoped ``last_epoch >= epoch_id`` compare
        would silently skip genuinely new micro-batches — data loss,
        not replay suppression. The watermark therefore pairs with an
        ``epoch_scope`` (the checkpoint's identity —
        ``streaming.events.checkpoint_identity``): a batch whose scope
        differs from the stored one is never a replay, exactly why
        Delta's recipe keys ``txnVersion`` by ``txnAppId``.

        Watermarks are kept PER SCOPE (``epoch_marks`` map, one slot
        per checkpoint identity — Delta keeps one version per
        txnAppId for the same reason): if a table is fed from two
        checkpoints over its life (failover back to an old checkpoint
        after a new one committed), a genuine replay from the earlier
        scope still fences, because the earlier scope's own high-water
        mark was never overwritten by the later writer.
        ``scope=None`` keeps the legacy unscoped compare (against the
        LATEST writer's watermark, whatever its scope) for batch
        orchestrators that manage their own epoch sequence."""
        if not self.exists(table):
            return False
        if scope is None:
            return self.properties(table).get("last_epoch", -1) >= epoch_id
        return self._epoch_marks(table).get(scope, -1) >= epoch_id

    def _epoch_marks(self, table: str) -> dict:
        """Per-scope epoch high-water marks ``{scope: last_epoch}``
        (scope '' = unscoped/legacy). Tables written before the map
        existed migrate read-side from the single
        ``(epoch_scope, last_epoch)`` slot — never a rewrite."""
        props = self.properties(table)
        marks = props.get("epoch_marks")
        if marks is not None:
            return dict(marks)
        if "last_epoch" in props:
            return {props.get("epoch_scope") or "": props["last_epoch"]}
        return {}

    #: retention cap on per-scope epoch watermarks: scopes beyond the
    #: most recent N are forgotten (Delta bounds txnAppId state by
    #: retention the same way). A sink restarted with fresh
    #: checkpoints accretes one scope per reset; without a cap the
    #: marks map grows with operational history in every manifest.
    EPOCH_SCOPE_RETENTION = 16

    def _epoch_props(
        self, table: str, epoch_id: int, scope: "str | None"
    ) -> dict:
        """Property delta for an epoch commit: the per-scope map plus
        the legacy latest-writer slot (kept for observability — tests
        and ops read ``last_epoch`` as 'how far has this sink got').
        The map keeps insertion order (JSON/dict order is stable), so
        re-inserting the committing scope last makes eviction
        least-recently-WRITTEN-first — a replay fence is only ever
        needed for scopes that can still replay, i.e. recent ones."""
        marks = self._epoch_marks(table) if self.exists(table) else {}
        marks.pop(scope or "", None)
        marks[scope or ""] = epoch_id
        while len(marks) > self.EPOCH_SCOPE_RETENTION:
            oldest = next(iter(marks))
            del marks[oldest]
        return {
            "epoch_marks": marks,
            "last_epoch": epoch_id,
            "epoch_scope": scope,
        }

    def commit_epoch(
        self,
        table: str,
        df: DataFrame,
        epoch_id: int,
        scope: "str | None" = None,
        extra_props: "dict | None" = None,
    ) -> bool:
        """Exactly-once commit point for streaming ``foreachBatch``:
        the new data version and the epoch watermark flip in ONE
        atomic manifest replace, so a replayed epoch (Spark re-runs a
        failed micro-batch with the same epoch_id) is detected and
        skipped before any write. Returns False on a skipped replay.
        ``scope`` keys the watermark by checkpoint identity (see
        :meth:`epoch_seen`) so epochs from a different run/checkpoint
        are never mistaken for replays.

        This is the same idempotent-sink recipe Delta's
        ``txnAppId``/``txnVersion`` implements on a lakehouse; the
        versioned store makes it a property check. Creates the table
        when absent (first epoch of a fresh sink). ``extra_props``
        ride the SAME atomic flip — the hook content fences (e.g. the
        SCD2 max-applied-date) use so fence and data can never
        diverge."""
        if self.epoch_seen(table, epoch_id, scope):
            return False
        v = self._write_version(table, df)
        self._flip(
            table,
            v,
            {**self._epoch_props(table, epoch_id, scope), **(extra_props or {})},
        )
        return True

    #: auto-compaction threshold for epoch appends: once a sink table
    #: accretes this many delta segments, the NEXT epoch commit folds
    #: them into one (read amplification stays bounded — every read
    #: merges parquet footers per segment, so unbounded accretion
    #: turns O(delta) writes into O(segments) reads).
    SEGMENT_BUDGET = 32

    def append_epoch(
        self,
        table: str,
        delta: DataFrame,
        epoch_id: int,
        scope: "str | None" = None,
        segment_budget: "int | None" = None,
    ) -> bool:
        """O(delta) exactly-once append: write ONLY the delta rows as
        a fresh segment and flip old-segments+[delta] together with
        the epoch watermark in one atomic manifest replace — the
        :meth:`append` cost model under the :meth:`commit_epoch`
        replay contract. At 100 TB a growing sink table (signature
        store, verdict ledger) must pay per batch what the batch
        brought, never a full-table rewrite.

        Segment accretion is BOUNDED: when the table already holds
        ``segment_budget`` (default :attr:`SEGMENT_BUDGET`) segments,
        this commit compacts them together with the delta into one
        segment inside the same atomic flip — amortized O(delta) per
        batch (each row is rewritten once per ``budget`` appends),
        worst-case read amplification capped at ``budget`` footer
        merges. ``vacuum`` reclaims the folded-away directories."""
        if self.epoch_seen(table, epoch_id, scope):
            return False
        if not self.exists(table):
            v = self._write_version(table, delta)
            self._flip(table, v, self._epoch_props(table, epoch_id, scope))
            return True
        cols = self.read(table).columns
        missing = set(cols) - set(delta.columns)
        if missing:
            raise ValueError(
                f"append_epoch to {table} missing columns: {sorted(missing)}"
            )
        budget = self.SEGMENT_BUDGET if segment_budget is None else segment_budget
        segs = self._segments(table)
        if len(segs) >= budget:
            merged = self.read(table).unionByName(delta.select(*cols))
            v = self._write_version(table, merged)
            self._flip(table, v, self._epoch_props(table, epoch_id, scope))
            return True
        v = self._write_version(table, delta.select(*cols))
        self._flip(
            table,
            segs + [v],
            self._epoch_props(table, epoch_id, scope),
        )
        return True

    def upsert_epoch(
        self,
        table: str,
        batch: DataFrame,
        keys: "list[str]",
        epoch_id: int,
        scope: "str | None" = None,
        staging_order: "list | None" = None,
    ) -> bool:
        """Keyed exactly-once upsert with the O(delta) WRITE fast
        path — the commit every keyed streaming sink should use. When
        the batch carries only NEW keys (the common ingest case) and
        no intra-batch key collisions, only the batch's rows append as
        a delta segment (:meth:`append_epoch` — per-batch WRITE cost =
        the batch, not the table; the changed-row PROBE still joins
        the batch against the full existing ledger, so per-batch read
        cost is O(ledger) — the write amplification, not the scan, is
        what the fast path eliminates). A re-sent key whose row
        CHANGED or a ``staging_order`` tiebreak falls back to the full
        keyed rewrite (``merge.upsert``); an identical re-send
        contributes no delta at all. Intra-batch duplicates with no
        ``staging_order``: IDENTICAL duplicate rows collapse (the
        winner is well defined — at-least-once redelivery landing the
        same row twice in one micro-batch must not kill the sink),
        but CONFLICTING rows for one key RAISE — Postgres ON CONFLICT
        parity: with no tiebreak there is no well-defined winner, and
        silently landing either would break the key-uniqueness
        invariant. Returns False on a replayed ``(scope, epoch_id)``."""
        from pyspark.sql import functions as F

        from ..operators.merge import upsert

        if self.epoch_seen(table, epoch_id, scope):
            return False

        def _resolve_unique(df: DataFrame) -> DataFrame:
            """Collapse identical duplicate rows; raise on a key with
            two DIFFERENT rows. The distinct() runs only on the rare
            dup path — unique batches pay one count probe."""
            has_dup = (
                df.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") > 1)
                .limit(1)
                .count()
                > 0
            )
            if not has_dup:
                return df
            dd = df.distinct().localCheckpoint()
            conflict = (
                dd.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") > 1)
                .limit(1)
                .collect()
            )
            if conflict:
                k = {c: conflict[0][c] for c in keys}
                raise ValueError(
                    f"upsert_epoch to {table}: conflicting intra-batch "
                    f"rows for key {k} with no staging_order — no "
                    "well-defined winner (ON CONFLICT parity); pass "
                    "staging_order to break ties"
                )
            return dd

        if not self.exists(table):
            if staging_order is not None:
                from ..operators.merge import dedupe_by_key

                batch = dedupe_by_key(batch, keys, staging_order)
            else:
                batch = _resolve_unique(batch)
            return self.commit_epoch(table, batch, epoch_id, scope=scope)
        existing = self.read(table)
        batch = batch.select(*existing.columns).localCheckpoint()
        slow = staging_order is not None
        if not slow:
            batch = _resolve_unique(batch)
            changed = batch.exceptAll(existing).join(
                existing, keys, "left_semi"
            )
            slow = not changed.isEmpty()
        if slow:
            merged = upsert(existing, batch, keys, staging_order)
            return self.commit_epoch(table, merged, epoch_id, scope=scope)
        delta = batch.join(existing, keys, "left_anti")
        return self.append_epoch(table, delta, epoch_id, scope=scope)

    def enforce_privacy(self, table: str) -> str:
        """Carto privacy enforcement (carto_.py:461-492): derive the
        dataset privacy from the recorded SELECT grants — PUBLIC only
        when 'publicuser' holds SELECT, else PRIVATE — force-set it,
        then RE-READ the manifest and assert, exactly the reference's
        save → refetch → assert loop (Carto is 'unreliable about
        privacy', so the written state is never trusted blind)."""
        users = (self.properties(table).get("grants") or {}).get("select") or []
        privacy = "PUBLIC" if "publicuser" in users else "PRIVATE"
        self.set_properties(table, privacy=privacy)
        observed = self.properties(table).get("privacy")
        if observed != privacy:
            raise AssertionError(
                f"privacy on {table}: wanted {privacy}, store reports {observed}"
            )
        return privacy
