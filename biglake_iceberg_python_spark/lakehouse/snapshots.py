"""Snapshot layer: versioned parquet tables with a metadata log — the
portable analog of the Iceberg metadata surface the reference exercises
(metadata_log_entries scan, notebook cell 11; metadata pointers
README.md:539-552 — SURVEY.md A12).

Model (mirrors Iceberg's copy-on-write at directory granularity):
  * every commit writes data files under ``data/commit-<uuid>/`` and
    appends an entry to ``_metadata/metadata_log.json`` via compare-and-swap
    (optimistic concurrency — conflicting appends rebase, conflicting
    rewrites raise :class:`CommitConflictError`)
  * a snapshot's manifest is the list of data dirs it comprises:
    append  → parent dirs + new dir
    overwrite → [new dir]
  * reads resolve a snapshot (latest or time-travel by id) to its dir list
    and hand Spark a multi-path parquet scan — pruning/pushdown intact.

Scale notes: commits are O(metadata) on the driver (a JSON append — the
same "metadata pointer swap" Iceberg does); data I/O is fully distributed.
The log never stores row data. For production durability this JSON would be
swapped for an atomic rename / catalog pointer, which is exactly what the
reference's BLMS provides (README.md:543-548).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, Row, SparkSession


class CommitConflictError(RuntimeError):
    """Another writer committed since this operation read its base
    snapshot, and the operation cannot be safely reapplied — the analog of
    Iceberg's ValidationException on optimistic-commit failure."""


class SnapshotTable:
    """A versioned parquet table with append/overwrite commits, time
    travel, an inspectable metadata log, and optimistic concurrency:
    commits are compare-and-swap against the snapshot list, appends
    rebase-and-retry on conflict (appends commute), and overwrites
    validating an ``expected_version`` fail if the table moved — Iceberg's
    commit protocol, with the atomic catalog pointer swap played by
    ``os.replace`` on the log file."""

    _MAX_COMMIT_RETRIES = 5

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.meta_path = os.path.join(root, "_metadata", "metadata_log.json")
        self.refs_path = os.path.join(root, "_metadata", "refs.json")
        os.makedirs(os.path.dirname(self.meta_path), exist_ok=True)
        if not os.path.exists(self.meta_path):
            self._write_log([])

    # -- commit protocol --

    def write(
        self,
        df: DataFrame,
        mode: str = "append",
        expected_version: int | None = None,
        branch: str | None = None,
    ) -> int:
        """Commit a new snapshot; returns its snapshot id.

        The data write is a normal distributed parquet write and happens
        ONCE; the commit is optimistic: read the log, build the entry
        against that parent, and compare-and-swap (:meth:`_commit`). On
        conflict an append rebases against the new parent and retries
        (concurrent appends commute — Iceberg's fast-append path); an
        overwrite raises, because its rewritten data was derived from a
        base another writer has since replaced.

        ``expected_version`` adds Iceberg-style validation for
        read-modify-write callers (delete/update/merge): the commit fails
        unless the table is still at that snapshot, regardless of mode.

        ``branch`` commits on a named branch (Iceberg's write-to-ref): the
        parent is the BRANCH head, not the table head, and the branch ref
        advances on success. Once any ref exists, a plain write targets
        the ``main`` branch, so main-line history and branch history stay
        independent even though all snapshots share one log. Writing to a
        tag raises — tags are immutable.
        """
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        data_dir = os.path.join(
            self.root, "data", f"commit-{uuid.uuid4().hex[:8]}"
        )
        df.write.mode("errorifexists").parquet(data_dir)
        stats = self._collect_stats(data_dir)
        n_rows = self._count_rows(data_dir)
        for _ in range(self._MAX_COMMIT_RETRIES):
            log = self._read_log()
            refs = self._read_refs()
            # An EXPLICIT branch must exist even before any ref does —
            # write(branch='typo') on a fresh table is an error, not a
            # silent main-line commit. 'main' is the one implicit ref
            # (Iceberg: main always exists).
            if branch is not None and not refs and branch != "main":
                raise ValueError(f"unknown ref {branch!r}")
            use_branch = branch or ("main" if refs else None)
            if use_branch is not None and refs:
                if use_branch not in refs:
                    raise ValueError(f"unknown ref {use_branch!r}")
                if refs[use_branch]["type"] != "branch":
                    raise ValueError(
                        f"cannot write to tag {use_branch!r}: tags are "
                        "immutable"
                    )
                head_id = refs[use_branch]["snapshot_id"]
                head = next(
                    (e for e in log if e["snapshot_id"] == head_id), None
                )
            else:
                head = log[-1] if log else None
                head_id = head["snapshot_id"] if head else 0
            if expected_version is not None and head_id != expected_version:
                raise CommitConflictError(
                    f"table moved past expected snapshot {expected_version}"
                )
            snap_id = (log[-1]["snapshot_id"] + 1) if log else 1
            parent_dirs = (
                head["data_dirs"] if (head and mode == "append") else []
            )
            entry = {
                "snapshot_id": snap_id,
                "operation": mode,
                "data_dirs": parent_dirs + [data_dir],
                "added_dir": data_dir,
            }
            if head and mode == "append":
                entry["dir_seq"] = {
                    **self._dir_seq(head),
                    data_dir: snap_id,
                }
                # Equality-delete files survive appends: they keep applying
                # to the data dirs older than them (never to this new dir,
                # whose seq exceeds every existing delete's).
                if head.get("deletes"):
                    entry["deletes"] = head["deletes"]
            else:
                entry["dir_seq"] = {data_dir: snap_id}
            if use_branch is not None and refs:
                entry["branch"] = use_branch
            if stats is not None:
                entry["stats"] = stats
            if n_rows is not None:
                parent_rows = (
                    head.get("dir_rows", {}) if (head and mode == "append") else {}
                )
                entry["dir_rows"] = {**parent_rows, data_dir: n_rows}
            try:
                self._commit(log, entry)
            except CommitConflictError:
                if mode != "append" or expected_version is not None:
                    raise
                continue  # rebase the append against the fresh parent
            if use_branch is not None and refs:
                refs[use_branch] = {"type": "branch", "snapshot_id": snap_id}
                self._write_refs(refs)
            return snap_id
        raise CommitConflictError(
            f"gave up after {self._MAX_COMMIT_RETRIES} rebase attempts"
        )

    # -- refs: branches and tags (Iceberg's named-ref surface) --

    def _ensure_main(self, refs: dict) -> dict:
        """First ref creation materializes ``main`` at the current head, so
        main-line writes keep a stable identity once history forks."""
        if "main" not in refs:
            refs["main"] = {
                "type": "branch",
                "snapshot_id": self.current_snapshot_id(),
            }
        return refs

    def create_tag(self, name: str, snapshot_id: int | None = None) -> int:
        """Immutable named pointer to a snapshot (Iceberg ``CREATE TAG``):
        reads via the tag always see exactly this version — the audit /
        reproducibility primitive (pin the corpus a model trained on)."""
        return self._create_ref(name, "tag", snapshot_id)

    def create_branch(self, name: str, snapshot_id: int | None = None) -> int:
        """Named MUTABLE line of history starting at ``snapshot_id`` (or
        the current head) — Iceberg's ``CREATE BRANCH``: write-audit-publish
        workflows commit to a branch, validate, then fast-forward main."""
        return self._create_ref(name, "branch", snapshot_id)

    def _create_ref(self, name: str, kind: str, snapshot_id: int | None) -> int:
        log = self._read_log()
        if snapshot_id is None:
            snapshot_id = log[-1]["snapshot_id"] if log else 0
        if not any(e["snapshot_id"] == snapshot_id for e in log):
            raise ValueError(f"no snapshot {snapshot_id} to reference")
        refs = self._ensure_main(self._read_refs())
        if name in refs:
            raise ValueError(f"ref {name!r} already exists")
        refs[name] = {"type": kind, "snapshot_id": snapshot_id}
        self._write_refs(refs)
        return snapshot_id

    def fast_forward(self, branch: str, to_ref: str) -> int:
        """Advance ``branch`` to ``to_ref``'s snapshot (Iceberg's
        ``fast_forward`` procedure) — the PUBLISH step of
        write-audit-publish: work committed and validated on an audit
        branch becomes what main's readers see, as a pure metadata pointer
        move (no data is copied or rewritten). Returns the new head id."""
        refs = self._read_refs()
        for n in (branch, to_ref):
            if n not in refs:
                raise ValueError(f"unknown ref {n!r}")
        if refs[branch]["type"] != "branch":
            raise ValueError(f"cannot fast-forward tag {branch!r}")
        target = refs[to_ref]["snapshot_id"]
        refs[branch] = {"type": "branch", "snapshot_id": target}
        self._write_refs(refs)
        return target

    def read_ref(self, name: str) -> DataFrame:
        """Read the snapshot a branch head or tag points at (Iceberg's
        ``VERSION AS OF 'ref'``)."""
        refs = self._read_refs()
        if name not in refs:
            raise ValueError(f"unknown ref {name!r}")
        return self.read(refs[name]["snapshot_id"])

    def refs_entries(self) -> DataFrame:
        """The refs table as a DataFrame (the analog of Iceberg's
        ``SELECT * FROM t.refs``)."""
        refs = self._read_refs()
        rows = [
            Row(name=n, type=r["type"], snapshot_id=r["snapshot_id"])
            for n, r in sorted(refs.items())
        ]
        return self.spark.createDataFrame(rows)

    def _read_refs(self) -> dict:
        if not os.path.exists(self.refs_path):
            return {}
        with open(self.refs_path) as f:
            return json.load(f)

    def _write_refs(self, refs: dict) -> None:
        tmp = self.refs_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(refs, f, indent=1)
        os.replace(tmp, self.refs_path)  # atomic pointer swap

    def _count_rows(self, data_dir: str) -> int | None:
        """Row count of a just-written data dir from parquet FOOTERS —
        metadata-only, no data pass (the manifest `record_count` role in
        Iceberg). Best-effort like _collect_stats."""
        import pyarrow.parquet as _pq

        try:
            return sum(
                _pq.ParquetFile(os.path.join(data_dir, f)).metadata.num_rows
                for f in os.listdir(data_dir)
                if f.endswith(".parquet")
            )
        except Exception:
            return None

    def _collect_stats(self, data_dir: str) -> dict | None:
        """Per-commit column min/max harvested from the parquet FOOTERS of
        the just-written files — the manifest-file role in Iceberg: stats
        ride the metadata, no data pass happens. Driver cost is O(files in
        this commit) footer reads (Iceberg planners read manifests the
        same way). Timestamps/dates serialize as ISO strings (ISO order ==
        chronological order, so pruning compares stay correct); binary
        columns are skipped."""
        import datetime as _dt

        import pyarrow.parquet as _pq

        def _ser(v):
            if isinstance(v, (_dt.datetime, _dt.date)):
                return v.isoformat()
            if isinstance(v, (int, float, str, bool)):
                return v
            return None

        mins: dict = {}
        maxs: dict = {}
        try:
            files = [
                os.path.join(data_dir, f)
                for f in os.listdir(data_dir)
                if f.endswith(".parquet")
            ]
            for path in files:
                md = _pq.ParquetFile(path).metadata
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        st = col.statistics
                        if st is None or not st.has_min_max:
                            continue
                        name = col.path_in_schema
                        lo, hi = _ser(st.min), _ser(st.max)
                        if lo is None or hi is None:
                            continue
                        if name not in mins or lo < mins[name]:
                            mins[name] = lo
                        if name not in maxs or hi > maxs[name]:
                            maxs[name] = hi
        except Exception:  # stats are best-effort metadata, never fatal
            return None
        if not mins:
            return None
        return {c: [mins[c], maxs[c]] for c in mins if c in maxs}

    def scan_where(self, column: str, lower, upper) -> DataFrame:
        """Read only the data directories whose recorded [min, max] for
        ``column`` overlaps ``[lower, upper)`` — manifest-level min/max
        pruning: commits whose stats exclude the range are never opened
        (their parquet footers aren't even read). Directories from commits
        without stats are conservatively kept. The exact row filter is
        applied after, so results are independent of pruning."""
        from pyspark.sql import functions as F

        log = self._read_log()
        if not log:
            raise ValueError("table has no snapshots")
        head = self._head_entry(log)
        if head is None:
            raise ValueError("main ref points at an expired snapshot")
        if head.get("deletes"):
            raise ValueError(
                "scan_where over merge-on-read delete files is unsupported: "
                "stats pruning cannot see delete-file tombstones — run "
                "rewrite_mor() first"
            )
        stats_by_dir = {
            e["added_dir"]: e.get("stats") for e in log
        }
        dirs = []
        for d in head["data_dirs"]:
            s = (stats_by_dir.get(d) or {}).get(column)
            if s is None or not (s[1] < lower or s[0] >= upper):
                dirs.append(d)
        if not dirs:
            return self.read().filter(F.lit(False))
        df = self.spark.read.parquet(*dirs)
        dtype = dict(df.dtypes)[column]
        return df.filter(
            (F.col(column) >= F.lit(lower).cast(dtype))
            & (F.col(column) < F.lit(upper).cast(dtype))
        )

    def _commit(self, expected_log: list[dict], entry: dict) -> None:
        """Compare-and-swap: append ``entry`` only if the on-disk log still
        matches ``expected_log``. Single-process emulation of the atomic
        metadata-pointer swap a real catalog (BLMS in the reference,
        README.md:543-548) provides; the swap itself is ``os.replace``."""
        current = self._read_log()
        if [e["snapshot_id"] for e in current] != [
            e["snapshot_id"] for e in expected_log
        ]:
            raise CommitConflictError(
                "concurrent commit: log advanced during this operation"
            )
        current.append(entry)
        self._write_log(current)

    def merge(
        self,
        source: DataFrame,
        on: list[str],
        update_cols: list[str] | None = None,
    ) -> int:
        """MERGE INTO (upsert) committed as an overwrite snapshot — COW
        semantics, same as Iceberg's copy-on-write MERGE. Logic lives in
        merge.py (a full-outer-join re-expression, Catalyst-optimizable)."""
        from biglake_iceberg_python_spark.lakehouse.merge import merge_into

        base = self.current_snapshot_id()
        merged = merge_into(self.read(), source, on=on, update_cols=update_cols)
        return self.write(merged, mode="overwrite", expected_version=base)

    def delete_where(self, condition) -> int:
        """Row-level ``DELETE FROM ... WHERE`` committed as an overwrite
        snapshot — Iceberg v2's copy-on-write delete (null-safe: rows where
        the predicate is NULL are kept, matching SQL DELETE semantics).

        Scale boundary (documented, same as MERGE): real Iceberg COW
        rewrites only the data files containing matches (manifest min/max
        pruning picks them); this dir-granularity emulation rewrites the
        table. Iceberg's merge-on-read alternative (position/equality
        delete files) defers the rewrite entirely — at 100 TB you'd choose
        MOR for point deletes, COW for sweeping deletes like GDPR erasure.
        Time travel keeps pre-delete snapshots readable either way.
        """
        from pyspark.sql import functions as F

        base = self.current_snapshot_id()
        kept = self.read().filter(~F.coalesce(condition, F.lit(False)))
        return self.write(kept, mode="overwrite", expected_version=base)

    def delete_where_mor(self, condition, eq_cols: list[str]) -> int:
        """Merge-on-read ``DELETE WHERE``: instead of rewriting data files
        (COW), commit an EQUALITY-DELETE file holding the distinct
        ``eq_cols`` values of matching rows; reads apply it as an
        anti-join. Iceberg v2's point-delete path — O(matches) write cost
        regardless of table size, the right trade when deletes are small
        against huge tables (GDPR row erasure); sweeping deletes still use
        COW :meth:`delete_where`, and :meth:`rewrite_mor` folds
        accumulated delete files back into data files.

        Sequence-number semantics match Iceberg: a delete file applies
        only to data files COMMITTED BEFORE it — rows appended after the
        delete are untouched even if they carry matching key values
        (each data dir records its commit sequence; the read path scopes
        every delete to older dirs).
        """
        base = self.current_snapshot_id()
        keys = self.read().filter(condition).select(*eq_cols).distinct()
        del_dir = os.path.join(
            self.root, "deletes", f"commit-{uuid.uuid4().hex[:8]}"
        )
        keys.write.mode("errorifexists").parquet(del_dir)
        log = self._read_log()
        refs = self._read_refs()
        # Anchor on the MAIN head, not the log tail — a branch commit at
        # the tail must not become the parent of a main-line delete.
        head = self._head_entry(log, refs)
        if (head["snapshot_id"] if head else 0) != base:
            raise CommitConflictError("table moved during MOR delete")
        snap_id = log[-1]["snapshot_id"] + 1
        entry = {
            "snapshot_id": snap_id,
            "operation": "mor_delete",
            "data_dirs": head["data_dirs"],
            "added_dir": del_dir,
            "dir_seq": self._dir_seq(head),
            "deletes": head.get("deletes", [])
            + [{"dir": del_dir, "cols": eq_cols, "seq": snap_id}],
        }
        if refs:
            entry["branch"] = "main"
        self._commit(log, entry)
        if refs:
            refs["main"] = {"type": "branch", "snapshot_id": snap_id}
            self._write_refs(refs)
        return snap_id

    def rollback(self, snapshot_id: int) -> int:
        """Iceberg's ``rollback_to_snapshot``: make an OLD snapshot the
        current table state by committing a NEW snapshot that points at
        the old one's data — a pure metadata move that undoes bad writes
        instantly while preserving the full history (the bad snapshots
        stay readable for forensics until expiry; contrast with expiry,
        which destroys history)."""
        log = self._read_log()
        refs = self._read_refs()
        target = next(
            (e for e in log if e["snapshot_id"] == snapshot_id), None
        )
        if target is None:
            raise ValueError(f"no snapshot {snapshot_id} to roll back to")
        entry = {
            "snapshot_id": (log[-1]["snapshot_id"] + 1),
            "operation": "rollback",
            "data_dirs": target["data_dirs"],
            "added_dir": target["added_dir"],
            "dir_seq": self._dir_seq(target),
            "rolled_back_to": snapshot_id,
        }
        if target.get("deletes"):
            entry["deletes"] = target["deletes"]
        if refs:
            entry["branch"] = "main"
        self._commit(log, entry)
        if refs:
            refs["main"] = {
                "type": "branch",
                "snapshot_id": entry["snapshot_id"],
            }
            self._write_refs(refs)
        return entry["snapshot_id"]

    def rewrite_mor(self) -> int:
        """Compaction for merge-on-read: materialize the delete-applied
        view as one overwrite commit, clearing accumulated delete files —
        Iceberg's rewrite_data_files maintenance action for MOR tables."""
        base = self.current_snapshot_id()
        return self.write(self.read(), mode="overwrite", expected_version=base)

    @staticmethod
    def _dir_seq(entry: dict) -> dict:
        """Commit sequence per data dir (dirs from pre-MOR snapshots
        default to their position-independent snapshot id 0 — all older
        than any delete)."""
        return entry.get(
            "dir_seq", {d: 0 for d in entry["data_dirs"]}
        )

    def update_where(self, condition, assignments: dict) -> int:
        """Row-level ``UPDATE ... SET ... WHERE`` committed as an overwrite
        snapshot — copy-on-write UPDATE: non-matching rows pass through
        bit-identical, matching rows take the assignment expressions.
        ``assignments`` maps column name -> Column expression. Same COW/MOR
        scale boundary as :meth:`delete_where`.
        """
        from pyspark.sql import functions as F

        base = self.current_snapshot_id()
        cur = self.read()
        unknown = [c for c in assignments if c not in cur.columns]
        if unknown:
            raise ValueError(f"assignments for unknown columns: {unknown}")
        cond = F.coalesce(condition, F.lit(False))
        updated = cur.select(
            *[
                F.when(cond, assignments[c]).otherwise(F.col(c)).alias(c)
                if c in assignments
                else F.col(c)
                for c in cur.columns
            ]
        )
        return self.write(updated, mode="overwrite", expected_version=base)

    # -- reads --

    def _head_entry(self, log: list[dict], refs: dict | None = None):
        """Resolve the DEFAULT head entry. Branch commits append to the
        shared log, so once refs exist the head is ``refs['main']`` — never
        the log tail — or a plain read() after any write(branch=...) would
        leak the branch's data into main (Iceberg's default-to-main
        semantics). Ref-less tables keep the cheap tail resolution."""
        if refs is None:
            refs = self._read_refs()
        if refs and "main" in refs:
            head_id = refs["main"]["snapshot_id"]
            return next(
                (e for e in log if e["snapshot_id"] == head_id), None
            )
        return log[-1] if log else None

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        """Read latest (the ``main`` head once refs exist), or time-travel
        to ``snapshot_id`` (the analog of Iceberg's VERSION AS OF)."""
        log = self._read_log()
        if not log:
            raise ValueError("table has no snapshots")
        if snapshot_id is None:
            entry = self._head_entry(log)
            if entry is None:
                raise ValueError("main ref points at an expired snapshot")
        else:
            matches = [e for e in log if e["snapshot_id"] == snapshot_id]
            if not matches:
                raise ValueError(f"no snapshot {snapshot_id}; log has {len(log)}")
            entry = matches[0]
        dels = entry.get("deletes", [])
        if not dels:
            return self.spark.read.parquet(*entry["data_dirs"])
        # Merge-on-read: apply each equality-delete file to the data dirs
        # committed BEFORE it (Iceberg sequence-number scoping) — rows
        # appended after a delete are untouched even on key match.
        seqs = self._dir_seq(entry)
        out = None
        for d in entry["data_dirs"]:
            df = self.spark.read.parquet(d)
            for dl in dels:
                if dl["seq"] > seqs.get(d, 0):
                    keys = self.spark.read.parquet(dl["dir"])
                    df = df.join(keys, on=dl["cols"], how="left_anti")
            out = df if out is None else out.unionByName(df)
        return out

    def clone_to(self, dest_root: str) -> "SnapshotTable":
        """Shallow (zero-copy) clone: a NEW table whose first snapshot
        references this table's current data directories — no data files
        move or copy, only metadata is written (the Delta SHALLOW CLONE /
        Iceberg snapshot-table pattern used for dev/test forks of
        production tables).

        The clone evolves independently: its appends land under ITS root,
        and source commits after the clone are invisible to it. The
        standard caveat applies and is enforced where it would corrupt:
        expire/compact on the source can delete files a clone still
        references (document retention accordingly), and tables with
        PENDING merge-on-read deletes refuse to clone (the clone's
        sequence numbers restart at 1, which would break delete scoping —
        run rewrite_mor() first).
        """
        head = self._head_entry(self._read_log())
        if head is None:
            raise ValueError("cannot clone an empty table")
        if head.get("deletes"):
            raise ValueError(
                "table has pending MoR deletes; run rewrite_mor() before "
                "cloning"
            )
        clone = SnapshotTable(self.spark, dest_root)
        entry = {
            "snapshot_id": 1,
            "operation": "clone",
            "data_dirs": list(head["data_dirs"]),
            "added_dir": None,
            "dir_seq": {d: 1 for d in head["data_dirs"]},
        }
        if head.get("stats"):
            entry["stats"] = head["stats"]
        clone._commit([], entry)
        return clone

    def read_incremental(self, from_snap: int, to_snap: int) -> DataFrame:
        """Rows ADDED by snapshots in ``(from_snap, to_snap]`` — the
        CDC-style incremental append scan (the analog of Iceberg's
        ``start-snapshot-id``/``end-snapshot-id`` read).

        Only the per-snapshot added directories are scanned — cost is
        proportional to the delta, not the table. Raises if the range
        contains an overwrite commit, matching Iceberg's incremental scan,
        which supports append-only history.
        """
        log = self._read_log()
        sel = [e for e in log if from_snap < e["snapshot_id"] <= to_snap]
        if not sel:
            raise ValueError(
                f"no snapshots in ({from_snap}, {to_snap}]; log has {len(log)}"
            )
        bad = [e["snapshot_id"] for e in sel if e["operation"] != "append"]
        if bad:
            raise ValueError(
                f"incremental read over non-append snapshots {bad}; "
                "overwrite breaks append-delta semantics"
            )
        return self.spark.read.parquet(*[e["added_dir"] for e in sel])

    def metadata_log_entries(self) -> DataFrame:
        """The metadata log as a DataFrame — the analog of the reference's
        ``SELECT * FROM t.metadata_log_entries`` (notebook cell 11)."""
        log = self._read_log()
        head = self._head_entry(log)
        rows = [
            Row(
                snapshot_id=e["snapshot_id"],
                operation=e["operation"],
                n_data_dirs=len(e["data_dirs"]),
                is_current=(e is head),
            )
            for e in log
        ]
        return self.spark.createDataFrame(rows)

    # -- maintenance --

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Iceberg's ``expireSnapshots`` maintenance action: drop all but
        the newest ``keep_last`` snapshots from the log, then delete every
        data directory no surviving snapshot references (orphan sweep).

        Time travel to an expired snapshot becomes an error — exactly the
        Iceberg trade: history costs storage, expiry reclaims it. The log
        rewrite goes through the same CAS commit path as writes, so a
        concurrent commit during expiry fails safe rather than resurrect
        expired state. Returns ``{"expired": n, "dirs_removed": m}``.
        """
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        log = self._read_log()
        if len(log) <= keep_last:
            return {"expired": 0, "dirs_removed": 0}
        # Ref-protected snapshots never expire (Iceberg: expireSnapshots
        # retains any snapshot a branch or tag references).
        protected = {r["snapshot_id"] for r in self._read_refs().values()}
        tail = log[-keep_last:]
        kept = [
            e
            for e in log
            if e in tail or e["snapshot_id"] in protected
        ]
        dropped = [e for e in log if e not in kept]
        if not dropped:
            return {"expired": 0, "dirs_removed": 0}
        live = {d for e in kept for d in e["data_dirs"]} | {
            dl["dir"] for e in kept for dl in e.get("deletes", [])
        }
        dead = [
            d
            for e in dropped
            for d in [e["added_dir"]]
            if d not in live and os.path.isdir(d)
        ]
        current = self._read_log()
        if [e["snapshot_id"] for e in current] != [
            e["snapshot_id"] for e in log
        ]:
            raise CommitConflictError(
                "concurrent commit during snapshot expiry"
            )
        self._write_log(kept)
        for d in dead:
            shutil.rmtree(d, ignore_errors=True)
        return {"expired": len(dropped), "dirs_removed": len(dead)}

    def metadata_row_count(self, snapshot_id: int | None = None) -> int:
        """COUNT(*) answered from commit metadata alone — the Iceberg
        manifests-only count: per-dir row counts were harvested from
        parquet footers at WRITE time, so no data file is opened here.

        Raises when the snapshot carries merge-on-read delete files (their
        matched rows are unknown without a scan — exactly when Iceberg
        falls back too) or predates row-count recording.
        """
        log = self._read_log()
        if snapshot_id is None:
            entry = self._head_entry(log)
        else:
            entry = next(
                (e for e in log if e["snapshot_id"] == snapshot_id), None
            )
        if entry is None:
            raise ValueError("no such snapshot")
        if entry.get("deletes"):
            raise ValueError(
                "MoR delete files pending — metadata count needs a scan "
                "(run rewrite_mor() first)"
            )
        dir_rows = entry.get("dir_rows")
        if dir_rows is None or any(d not in dir_rows for d in entry["data_dirs"]):
            raise ValueError("snapshot predates row-count metadata")
        return sum(dir_rows[d] for d in entry["data_dirs"])

    def current_snapshot_id(self) -> int:
        """Id of the default head — ``refs['main']`` once refs exist (see
        :meth:`_head_entry`), else the log tail."""
        log = self._read_log()
        head = self._head_entry(log)
        return head["snapshot_id"] if head else 0

    # -- log IO (driver-side, O(snapshots)) --

    def _read_log(self) -> list[dict]:
        with open(self.meta_path) as f:
            return json.load(f)

    def _write_log(self, log: list[dict]) -> None:
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(log, f, indent=1)
        os.replace(tmp, self.meta_path)  # atomic pointer swap
