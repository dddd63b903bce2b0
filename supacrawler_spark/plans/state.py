"""Crawl state-table backends (the Iceberg seam, SURVEY.md §7.1.6).

run_crawl keeps all crawl state in three per-wave tables (``frontier``,
``results``, ``lineage``), a commit log (the manifest: one line per
committed wave), and one cumulative bucketed ``known`` table. This
module is the ONLY place those tables touch storage; run_crawl talks to
a :class:`StateBackend` and never to paths or catalogs directly.

Two implementations ship:

- :class:`ParquetStateBackend` (default) — per-wave parquet dirs +
  a JSONL manifest under ``state_dir``. Byte-identical layout to the
  pre-seam engine, so goldens, resume fixtures and the streaming
  source (streaming/__init__.py readStreams ``state_dir/results``)
  are unaffected.
- :class:`CatalogStateBackend` — the same contract through the Spark
  SQL catalog: one table per committed wave
  (``<prefix>_<name>_w<iter>``), a manifest table, saveAsTable /
  spark.table / DROP TABLE only. This is the shape a real Iceberg
  adapter takes (swap ``format("parquet")`` for ``format("iceberg")``
  and point the session at an Iceberg catalog — the commit/snapshot
  semantics are already expressed through the interface); no Iceberg
  jars ship in this sandbox, so the catalog implementation doubles as
  the seam's proof of pluggability (tests/test_state_backends.py runs
  the resume + crash suite against both).

Commit protocol (identical across backends, north_rule "resumable
from checkpoint"): wave i's tables are written BEFORE the manifest
entry that commits them; every write is overwrite-idempotent; a wave
exists iff its manifest entry does. After a crash in the write→commit
window, ``prune_uncommitted`` removes the orphans so a resumed run
regenerates the wave instead of double-counting it.

The known table is cumulative DERIVED state (rebuildable from
committed frontier waves), bucketed on the anti-join key so the known
side never re-shuffles (plans/crawl.py module docstring). Both
backends share the bucketed-saveAsTable implementation — an Iceberg
adapter would express it as a bucket-partitioned table.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

# appends add one file per bucket per wave; compact (rewrite into the
# next generation) after this many appends to bound file counts on
# very deep crawls
KNOWN_COMPACT_EVERY = 32
KNOWN_BUCKETS = 32

_WAVE_NAMES = ("frontier", "results", "lineage")


class StateBackend:
    """Contract between run_crawl and crawl-state storage. See module
    docstring for the commit protocol every implementation must keep.

    Subclasses implement: has_state, reset, read_manifest,
    append_manifest, rollback_manifest, write_wave, read_wave,
    read_all, prune_uncommitted. The bucketed known table is shared
    base-class behavior (already catalog-expressed)."""

    def __init__(self, spark: SparkSession, state_dir: str,
                 known_buckets: int = KNOWN_BUCKETS,
                 known_compact_every: int = KNOWN_COMPACT_EVERY):
        self.spark = spark
        self.state_dir = state_dir
        self.known_buckets = known_buckets
        self.known_compact_every = known_compact_every
        self._known = {"tbl": None, "gen": 0, "appends": 0}

    # ---- manifest (the commit log) -------------------------------------
    def has_state(self) -> bool:
        raise NotImplementedError

    def reset(self) -> None:
        """Wipe every table this backend owns (fresh run over a used
        state dir). The caller wipes ``state_dir`` itself (aux inputs:
        seeds dim, corpus cache, bloom state live there under both
        backends)."""
        raise NotImplementedError

    def read_manifest(self) -> list:
        raise NotImplementedError

    def append_manifest(self, line: dict, truncate: bool = False) -> None:
        """Commit one wave. ``truncate=True`` on the first wave of a
        fresh (non-resume) run."""
        raise NotImplementedError

    def rollback_manifest(self, keep: int) -> None:
        """TEST SEAM: roll the commit log back to its first ``keep``
        entries WITHOUT touching wave tables — stages the
        crash-between-write-and-commit window that
        ``prune_uncommitted`` must heal."""
        raise NotImplementedError

    # ---- per-wave tables ------------------------------------------------
    def write_wave(self, name: str, it: int, df: DataFrame) -> None:
        """Overwrite-idempotent write of wave ``it`` of table ``name``.
        Must execute exactly one write action (per-wave Observation
        metrics ride it)."""
        raise NotImplementedError

    def read_wave(self, name: str, it: int, schema) -> DataFrame:
        raise NotImplementedError

    def read_all(self, name: str, schema) -> "DataFrame | None":
        """Union of every written wave of ``name`` (committed waves
        only once prune_uncommitted has run); None when nothing was
        written."""
        raise NotImplementedError

    def prune_uncommitted(self, last_iter: int) -> None:
        """Drop wave tables beyond the last committed manifest entry
        (all of them when ``last_iter`` is -1)."""
        raise NotImplementedError

    # ---- bucketed known table (shared: already catalog-expressed) ------
    def _known_name(self, gen: int) -> str:
        raise NotImplementedError

    def _known_location(self, name: str, gen: int):
        """Return a writer configured with this backend's storage
        location for the known table (external path vs managed)."""
        raise NotImplementedError

    def known_active(self) -> bool:
        return self._known["tbl"] is not None

    def known_read(self) -> "DataFrame | None":
        if self._known["tbl"] is None:
            return None
        return self.spark.table(self._known["tbl"])

    def _known_write(self, df: DataFrame, gen: int) -> str:
        name = self._known_name(gen)
        self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        w = (df.repartition(self.known_buckets, "url")  # 1 file/bucket
             .write.mode("overwrite").format("parquet")
             .bucketBy(self.known_buckets, "url"))
        self._known_location(w, gen).saveAsTable(name)
        return name

    def known_rebuild(self, df: DataFrame) -> None:
        """(Re)build generation 0 from committed frontier waves —
        engage and resume share this path, and the overwrite discards
        any crash-orphaned append. Also removes prior-generation
        leftovers (derived state: correctness never depends on them)."""
        self._known["gen"] = 0
        self._known["tbl"] = self._known_write(df, 0)
        self._known["appends"] = 0
        self._known_cleanup(keep_gen=0)

    def known_append(self, df: DataFrame) -> None:
        (df.repartition(self.known_buckets, "url")
         .write.mode("append").format("parquet")
         .bucketBy(self.known_buckets, "url")
         .saveAsTable(self._known["tbl"]))
        self.spark.catalog.refreshTable(self._known["tbl"])
        self._known["appends"] += 1
        if self._known["appends"] >= self.known_compact_every:
            old_tbl, old_gen = self._known["tbl"], self._known["gen"]
            gen = old_gen + 1
            self._known["tbl"] = self._known_write(
                self.spark.table(old_tbl), gen)
            self._known["gen"] = gen
            self._known["appends"] = 0
            self.spark.sql(f"DROP TABLE IF EXISTS {old_tbl}")
            self._drop_known_files(old_gen)

    def known_close(self) -> None:
        """Catalog entries are session-scoped derived state; the files
        are rebuildable from frontier commits (resume re-engages)."""
        if self._known["tbl"] is not None:
            self.spark.sql(f"DROP TABLE IF EXISTS {self._known['tbl']}")
            self._known["tbl"] = None

    def _known_cleanup(self, keep_gen: int) -> None:
        keep = f"known_{keep_gen}"
        for d in os.listdir(self.state_dir):
            if d.startswith("known_") and d != keep:
                shutil.rmtree(os.path.join(self.state_dir, d),
                              ignore_errors=True)

    def _drop_known_files(self, gen: int) -> None:
        shutil.rmtree(os.path.join(self.state_dir, f"known_{gen}"),
                      ignore_errors=True)


class ParquetStateBackend(StateBackend):
    """Per-wave parquet dirs + JSONL manifest under ``state_dir`` —
    byte-identical layout to the pre-seam engine (goldens, crash
    fixtures and the streaming readStream source depend on it)."""

    def __init__(self, spark, state_dir, run_id: str = "", **kw):
        super().__init__(spark, state_dir, **kw)
        self.run_id = run_id  # set by run_crawl once known (resume)
        self._manifest_path = os.path.join(state_dir, "manifest.jsonl")

    # manifest ---------------------------------------------------------
    def has_state(self) -> bool:
        return os.path.exists(self._manifest_path)

    def reset(self) -> None:
        pass  # the caller's state_dir wipe removes everything we own

    def read_manifest(self) -> list:
        if not os.path.exists(self._manifest_path):
            return []
        with open(self._manifest_path) as f:
            return [json.loads(ln) for ln in f if ln.strip()]

    def append_manifest(self, line: dict, truncate: bool = False) -> None:
        with open(self._manifest_path, "w" if truncate else "a") as f:
            f.write(json.dumps(line) + "\n")

    def rollback_manifest(self, keep: int) -> None:
        lines = self.read_manifest()[:keep]
        with open(self._manifest_path, "w") as f:
            for ln in lines:
                f.write(json.dumps(ln) + "\n")

    # waves ------------------------------------------------------------
    def _wave_path(self, name: str, it: int) -> str:
        return os.path.join(self.state_dir, name, f"{it:05d}")

    def write_wave(self, name, it, df) -> None:
        df.write.mode("overwrite").parquet(self._wave_path(name, it))

    def read_wave(self, name, it, schema) -> DataFrame:
        return (self.spark.read.schema(schema)
                .parquet(self._wave_path(name, it)))

    def read_all(self, name, schema) -> "DataFrame | None":
        base = os.path.join(self.state_dir, name)
        if not os.path.isdir(base):
            return None
        return (self.spark.read.schema(schema)
                .option("recursiveFileLookup", "true").parquet(base))

    def prune_uncommitted(self, last_iter: int) -> None:
        for name in _WAVE_NAMES:
            base = os.path.join(self.state_dir, name)
            if not os.path.isdir(base):
                continue
            for d in os.listdir(base):
                try:
                    i = int(d)
                except ValueError:
                    continue
                if i > last_iter:
                    shutil.rmtree(os.path.join(base, d),
                                  ignore_errors=True)

    # known --------------------------------------------------------------
    def _known_name(self, gen: int) -> str:
        return f"known_{self.run_id}_{gen}"

    def _known_location(self, writer, gen: int):
        return writer.option(
            "path", os.path.join(self.state_dir, f"known_{gen}"))


class CatalogStateBackend(StateBackend):
    """The same contract through the Spark SQL catalog: one managed
    table per wave + a manifest table, addressed only by name
    (saveAsTable / spark.table / DROP TABLE). The table-name prefix is
    a stable function of ``state_dir`` so a resumed run finds the same
    tables. A real Iceberg adapter is this class with
    ``format("iceberg")`` and a configured Iceberg catalog."""

    def __init__(self, spark, state_dir, run_id: str = "", **kw):
        super().__init__(spark, state_dir, **kw)
        self.run_id = run_id
        digest = hashlib.md5(
            os.path.abspath(state_dir).encode()).hexdigest()[:12]
        self.prefix = f"crawlstate_{digest}"

    # manifest ---------------------------------------------------------
    @property
    def _mtbl(self) -> str:
        return f"{self.prefix}_manifest"

    def has_state(self) -> bool:
        return self.spark.catalog.tableExists(self._mtbl)

    def reset(self) -> None:
        for t in self._own_tables():
            self.spark.sql(f"DROP TABLE IF EXISTS {t}")

    def _own_tables(self) -> list:
        return [t.name for t in self.spark.catalog.listTables()
                if t.name.startswith(self.prefix)]

    def read_manifest(self) -> list:
        if not self.has_state():
            return []
        rows = (self.spark.table(self._mtbl)
                .orderBy("it").select("line").collect())
        return [json.loads(r["line"]) for r in rows]

    def _manifest_df(self, lines: list) -> DataFrame:
        # Arrow LocalRelation, not a parallelized RDD: this frame is
        # written once per wave and an RDD-backed scan pays a
        # Python-worker round-trip per slice per evaluation (see
        # session.arrow_local_df)
        from pyspark.sql import types as T

        from supacrawler_spark.session import arrow_local_df
        schema = T.StructType([T.StructField("it", T.IntegerType()),
                               T.StructField("line", T.StringType())])
        return arrow_local_df(
            self.spark,
            [(ln["iter"], json.dumps(ln)) for ln in lines], schema)

    def append_manifest(self, line: dict, truncate: bool = False) -> None:
        mode = "overwrite" if truncate or not self.has_state() \
            else "append"
        (self._manifest_df([line]).write.mode(mode)
         .format("parquet").saveAsTable(self._mtbl))

    def rollback_manifest(self, keep: int) -> None:
        kept = self.read_manifest()[:keep]
        # parquet catalog tables have no row-level DELETE (Iceberg
        # does); rewrite the tiny log instead (read_manifest collected
        # it to the driver, so the overwrite is not self-referential)
        self._manifest_df(kept).write.mode("overwrite") \
            .format("parquet").saveAsTable(self._mtbl)

    # waves ------------------------------------------------------------
    def _wave_tbl(self, name: str, it: int) -> str:
        return f"{self.prefix}_{name}_w{it:05d}"

    def write_wave(self, name, it, df) -> None:
        (df.write.mode("overwrite").format("parquet")
         .saveAsTable(self._wave_tbl(name, it)))

    def read_wave(self, name, it, schema) -> DataFrame:
        return (self.spark.table(self._wave_tbl(name, it))
                .select(*[f.name for f in schema.fields]))

    def read_all(self, name, schema) -> "DataFrame | None":
        pre = f"{self.prefix}_{name}_w"
        tbls = sorted(t for t in self._own_tables() if t.startswith(pre))
        if not tbls:
            return None
        cols = [f.name for f in schema.fields]
        out = None
        for t in tbls:
            df = self.spark.table(t).select(*cols)
            out = df if out is None else out.unionByName(df)
        return out

    def prune_uncommitted(self, last_iter: int) -> None:
        for name in _WAVE_NAMES:
            pre = f"{self.prefix}_{name}_w"
            for t in self._own_tables():
                if t.startswith(pre) and int(t[len(pre):]) > last_iter:
                    self.spark.sql(f"DROP TABLE IF EXISTS {t}")

    # known --------------------------------------------------------------
    def _known_name(self, gen: int) -> str:
        return f"{self.prefix}_known_{gen}"

    def _known_location(self, writer, gen: int):
        # still rooted under state_dir (not the shared warehouse) so a
        # state-dir wipe can never orphan another run's files
        return writer.option(
            "path", os.path.join(self.state_dir, f"known_{gen}"))
