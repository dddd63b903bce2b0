"""The iterative crawl driver loop (SURVEY.md §3.1 re-architecture).

One Spark job pipeline per BFS wave:

    frontier --politeness rank--> scheduled --⨝ pages--> extraction UDF
      |                               |                      |
      deferred                    seen/known append      results append
      ^                                                       |
      +---- next frontier <-- dedup/cap <-- emission filters <-+ explode

State lives behind the StateBackend seam (plans/state.py — the
Iceberg-snapshot role, SURVEY.md §7.1.6): per-wave tables + a
wave-commit manifest, ParquetStateBackend (dirs + JSONL) by default,
CatalogStateBackend (Spark SQL catalog tables, the real-Iceberg
adapter shape) as the pluggability proof; no Iceberg jars ship in
this sandbox. A wave is committed iff its manifest entry exists;
every wave's writes are overwrite-idempotent, so a crash mid-wave
resumes cleanly from the last committed wave (north_rule "resumable
from checkpoint"). Per-wave materialization also truncates the
iterative plan lineage — without it the logical plan grows
unboundedly across waves.

Scale notes (10^10 frontier):
- no driver-side collect of frontier/result data — the driver holds
  only counters read from tiny aggregates;
- global ranks via operators.rank (two-phase above 200k rows);
- per-host politeness via salted two-phase top-K (operators.frontier);
- the known-set anti-join is pre-filtered by the partitioned Bloom
  state (bloom.py);
- the corpus join shuffles only the frontier side when pages are
  bucketed (bucketize_pages) — at design scale the pages table is an
  Iceberg table bucket-partitioned by url hash.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import threading
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from supacrawler_spark import urlkit as U
from supacrawler_spark.bloom import BloomState
from supacrawler_spark.cuckoo import CuckooState
from supacrawler_spark.functions import match_patterns_udf, robots_allowed_udf
from supacrawler_spark.operators.fetch import (
    expand_candidates,
    fetch_join,
    fetch_join_split,
    make_extractor,
    miss_results,
    transport_fetch,
)
from supacrawler_spark.operators.frontier import order_exprs, politeness_select
from supacrawler_spark.operators.rank import ordered_row_number
from supacrawler_spark.params import CrawlParams
from supacrawler_spark.schemas import (
    FRONTIER_DISK_SCHEMA,
    FRONTIER_SCHEMA,
    LINEAGE_SCHEMA,
    RESULT_SCHEMA,
)
from supacrawler_spark.plans.state import ParquetStateBackend, StateBackend
from supacrawler_spark.sources import prepare_pages

BLOOM_THRESHOLD = 100_000

# Bucketed known-state table: above this many discovered URLs the
# cumulative known set moves from per-wave frontier-file rescans into
# a parquet table bucketed on the anti-join key, so the exact
# anti-join stops re-shuffling the known side every wave (the scan is
# bucket-aligned: candidates exchange into the table's partitioning;
# the known side never exchanges). The Iceberg bucket-partitioned
# state table stand-in at 10^10 design scale. Same auto threshold as
# bloom; KNOWN_BUCKETS bounds per-task state at any total size.
KNOWN_TABLE_THRESHOLD = BLOOM_THRESHOLD
KNOWN_BUCKETS = 32
# appends add one file per bucket per wave; compact (rewrite into the
# next generation) after this many appends to bound file counts on
# very deep crawls
KNOWN_COMPACT_EVERY = 32

# Broadcast the frontier side of the fetch join only while the
# politeness-capped SCHEDULED wave (not the frontier!) is provably
# under this many slim rows (~160 B/row -> ~64 MB, inside a sane
# driver/broadcast budget). Beyond it: SHUFFLE_HASH. Module-level so
# tests can force the shuffle path (test_crawl_engine).
SMALL_WAVE_ROWS = 400_000

# Broadcast the corpus's url-only projection for the fetch join's miss
# anti-join while the corpus parquet is provably small (driver-known
# bytes). Url rows are ~1/30 of page bytes, so 1 GiB of corpus parquet
# is ≲40 MB of broadcast — inside the session's 64 MB auto threshold.
# Above it (any real deployment) the miss path keeps the wave-broadcast
# semi join, which never materializes anything corpus-sized.
CORPUS_URLS_BROADCAST_BYTES = 1 << 30

RESULT_COLS_USER = [
    "url", "iter", "depth", "crawl_ord", "seed_rank", "seed_host",
    "status_code", "success", "error", "title", "markdown", "text",
    "links", "discovered", "metadata", "html",
]


@dataclass
class CrawlRun:
    spark: SparkSession
    state_dir: str
    run_id: str
    stats: dict = field(default_factory=dict)
    manifest: list = field(default_factory=list)
    link_limit: int = 0
    backend: "StateBackend | None" = None

    def _backend(self) -> StateBackend:
        if self.backend is None:
            self.backend = ParquetStateBackend(self.spark, self.state_dir,
                                               run_id=self.run_id)
        return self.backend

    def _results_all(self) -> DataFrame:
        df = (self._backend().read_all("results", RESULT_SCHEMA)
              if self.manifest else None)
        if df is None:
            # zero committed waves (e.g. politeness starved wave 0)
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        return df

    @property
    def results(self) -> DataFrame:
        """Successful pages, crawl-ordered, truncated to link_limit
        (HandleCrawlTask truncation, determinized by crawl_ord)."""
        r = (self._results_all().filter("success")
             .select(*RESULT_COLS_USER).orderBy("crawl_ord"))
        if self.link_limit > 0:
            r = r.limit(self.link_limit)
        return r

    @property
    def errors(self) -> DataFrame:
        return (self._results_all().filter(F.col("error").isNotNull())
                .select("url", "error", "status_code", "crawl_ord")
                .orderBy("crawl_ord"))

    @property
    def trace(self) -> DataFrame:
        return (self._results_all()
                .select("crawl_ord", "iter", "depth", "url", "status_code")
                .orderBy("crawl_ord"))

    @property
    def seen(self) -> DataFrame:
        """Every scheduled URL (the processed map,
        crawl/service.go:522-544) — a projection of results."""
        return self._results_all().select("url", "crawl_ord", "iter")

    @property
    def lineage(self) -> DataFrame:
        df = self._backend().read_all("lineage", LINEAGE_SCHEMA)
        if df is None:
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        return df


def bucketize_pages(spark, pages_df: DataFrame, table: str = "pages_bucketed",
                    n_buckets: int = 32) -> DataFrame:
    """Persist the corpus as a bucketed table on url_canon. Every wave's
    fetch join then shuffles ONLY the frontier side (the Iceberg
    bucket-partitioning stand-in)."""
    prep = prepare_pages(pages_df)
    (prep.write.mode("overwrite").format("parquet")
     .bucketBy(n_buckets, "url_canon").sortBy("url_canon")
     .saveAsTable(table))
    return spark.table(table)


def _write(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").parquet(path)


def _schedulable_frontier(raw: DataFrame, seedset: "_SeedSet") -> DataFrame:
    """Schedulable frontier view of a committed frontier wave: the
    is_new seed-pointing rows are known-set-only entries, never
    scheduled. (Crash-window hygiene — pruning wave tables written
    after the last committed manifest line — lives on the state
    backend: StateBackend.prune_uncommitted.)"""
    return (seedset.flag(raw)
            .filter(~(F.col("is_new") & F.col("_seed")))
            .select(*FRONTIER_SCHEMA.fieldNames()))


def _seed_frontier(spark, seeds) -> DataFrame:
    rows = []
    dedup = set()
    for raw_url, rank in sorted(seeds, key=lambda s: s[1]):
        cu = U.canonical_url(raw_url)
        if cu in dedup:
            continue  # duplicate seeds collapse: min seed_rank wins
        dedup.add(cu)
        rows.append((cu, U.extract_host(cu), U.url_hash64(cu), 0, -1,
                     int(rank), int(rank), U.extract_host(cu), 0.0, 0))
    from supacrawler_spark.session import arrow_local_df
    return arrow_local_df(spark, rows, FRONTIER_SCHEMA)


# A seed list at or below this count stays a driver-side literal (zero
# extra per-wave jobs: the membership test is an IN-list Catalyst can
# constant-fold). Above it — or when the caller passes a DataFrame —
# the seeds become a canonical parquet dim and every membership test is
# a broadcast join, so neither the driver nor the plan grows with seed
# count (the north rule's input is a Common-Crawl-style seed LIST).
SEED_DIM_THRESHOLD = 1024

_SEED_DIM_SCHEMA = "url string, host string, url_hash long, seed_rank int"


class _SeedSet:
    """Seed handling at two scales.

    Literal mode (small lists): canonical urls live in a Python list;
    the wave-0 frontier is a tiny createDataFrame and seed-membership
    predicates are IN-lists — exactly the pre-dim behavior.

    Dim mode (large lists / DataFrame input): seeds are canonicalized
    by the vectorized ``canon_info`` kernel (the driver never touches
    seed rows), persisted once under ``state_dir/seeds_dim`` (resume
    reuses the files), with a distinct-url key table alongside
    (``seeds_keys``) so the per-wave membership flag is a broadcast
    left join that never fans out a joined row.

    Duplicate seeds (same canonical url) collapse to the minimum
    seed_rank in BOTH modes — a url is crawled at most once (the
    processed-map invariant); the oracle mirrors this.

    The mapper's `links` set never contains seeds (mapper/
    service.go:39, 146-152): a discovered link equal to a seed IS
    emitted and consumes discovery budget, so seeds are excluded from
    the anti-join set and instead dropped from the next frontier
    post-cap (the crawler's processed map rejects them,
    crawl/service.go:525-527) — via ``flag``.
    """

    def __init__(self, spark, seeds, state_dir: str, resume: bool,
                 force_dim: "bool | None" = None):
        self.spark = spark
        self.urls: "list[str] | None" = None
        self._dim_path = os.path.join(state_dir, "seeds_dim")
        self._keys_path = os.path.join(state_dir, "seeds_keys")
        is_df = isinstance(seeds, DataFrame)
        use_dim = (force_dim is True or is_df
                   or (force_dim is None and len(seeds) > SEED_DIM_THRESHOLD))
        if force_dim is False and is_df:
            seeds = [(r["url"], r["seed_rank"])
                     for r in seeds.select("url", "seed_rank").collect()]
            use_dim = False
        if not use_dim:
            self.seeds_list = sorted(seeds, key=lambda s: s[1])
            self.urls = [U.canonical_url(u) for u, _ in self.seeds_list]
            return
        # resume reuses the persisted dim only when BOTH files landed —
        # a crash between the dim and keys writes must not leave a
        # half-materialized seed set
        if (resume and os.path.exists(self._dim_path)
                and os.path.exists(self._keys_path)):
            return
        raw = (seeds.select("url", "seed_rank") if is_df
               else spark.createDataFrame(
                   [(u, int(r)) for u, r in seeds], "url string, seed_rank int"))
        from supacrawler_spark.functions import canon_info
        dim = (raw.withColumn("_c", canon_info("url"))
               .select(F.col("_c.url_canon").alias("url"),
                       F.col("_c.host").alias("host"),
                       F.col("_c.url_hash").alias("url_hash"),
                       F.col("seed_rank").cast("int").alias("seed_rank")))
        # duplicate-seed collapse (host/url_hash are functions of url,
        # so min() over the group is both deterministic and exact)
        dim = (dim.groupBy("url")
               .agg(F.min("host").alias("host"),
                    F.min("url_hash").alias("url_hash"),
                    F.min("seed_rank").alias("seed_rank")))
        _write(dim, self._dim_path)
        _write(self.spark.read.schema(_SEED_DIM_SCHEMA)
               .parquet(self._dim_path).select("url").distinct(),
               self._keys_path)

    def frontier(self) -> DataFrame:
        if self.urls is not None:
            return _seed_frontier(self.spark, self.seeds_list)
        dim = self.spark.read.schema(_SEED_DIM_SCHEMA).parquet(self._dim_path)
        return dim.select(
            "url", "host", "url_hash",
            F.lit(0).alias("depth"),
            F.lit(-1).cast("long").alias("parent_ord"),
            F.col("seed_rank").alias("link_pos"),
            "seed_rank",
            F.col("host").alias("seed_host"),
            F.lit(0.0).alias("priority"),
            F.lit(0).alias("attempt"))

    def flag(self, df: DataFrame, out: str = "_seed") -> DataFrame:
        """Add a boolean seed-membership column. Literal mode: an
        IN-list predicate. Dim mode: broadcast left join on the
        distinct-key table (flat per-row cost in seed count)."""
        if self.urls is not None:
            if self.urls:
                # one JVM-parsed IN-list: Column.isin(list) issues one
                # py4j literal call per seed and is rebuilt twice per
                # wave (~0.9 s of driver time per bench crawl at 64
                # seeds, cProfile-measured)
                def q(s):
                    return ("'" + s.replace("\\", "\\\\")
                            .replace("'", "\\'") + "'")
                cond = F.expr(
                    "url IN (" + ", ".join(q(u) for u in self.urls) + ")")
            else:
                cond = F.lit(False)
            return df.withColumn(out, cond)
        keys = (self.spark.read.schema("url string").parquet(self._keys_path)
                .withColumn(out, F.lit(True)))
        return (df.join(F.broadcast(keys), "url", "left")
                .withColumn(out, F.coalesce(F.col(out), F.lit(False))))


def effective_politeness(politeness_df, robots_df, wave_window_ms: int,
                         default_host_budget: int):
    """Fold per-host delays into the per-wave politeness budget
    (VERDICT r3 #3): effective delay = greatest(politeness delay_ms,
    robots Crawl-delay), and B_eff(host) = min(max_parallel,
    ceil(wave_window_ms / delay)) — the batch determinization of
    colly's per-request delay (RandomDelay <=500ms,
    mapper/service.go:93,122) and RFC-9309 Crawl-delay (robotskit).
    ceil is computed in integer arithmetic ((W + d - 1) / d,
    truncating cast) and mirrored exactly by oracle.py and the
    politeness_budget driver twin. A host with delay > window still
    gets 1 slot per wave — delays slow a host, never starve it.

    Returns the effective (host, max_parallel) dim, or None when
    neither input carries politeness state."""
    W = wave_window_ms
    delay_dim = None
    if robots_df is not None and "crawl_delay_ms" in robots_df.columns:
        delay_dim = (robots_df.filter(F.col("crawl_delay_ms").isNotNull())
                     .select("host", F.col("crawl_delay_ms").cast("int")
                             .alias("crawl_delay_ms")))
    has_pol_delay = (politeness_df is not None
                     and "delay_ms" in politeness_df.columns)
    if delay_dim is None and not has_pol_delay:
        return politeness_df
    if politeness_df is None:
        merged = delay_dim.select(
            "host", F.lit(None).cast("int").alias("max_parallel"),
            F.lit(None).cast("int").alias("delay_ms"),
            "crawl_delay_ms")
    else:
        merged = politeness_df.select(
            "host", "max_parallel",
            (F.col("delay_ms").cast("int") if has_pol_delay
             else F.lit(None).cast("int")).alias("delay_ms"))
        merged = (merged.withColumn("crawl_delay_ms",
                                    F.lit(None).cast("int"))
                  if delay_dim is None
                  else merged.join(delay_dim, "host", "full_outer"))
    eff_delay = F.greatest("delay_ms", "crawl_delay_ms")
    b0 = F.coalesce(F.col("max_parallel"), F.lit(default_host_budget))
    b_eff = F.when(
        eff_delay > 0,
        F.least(b0, ((F.lit(W) + eff_delay - 1) / eff_delay)
                .cast("int"))).otherwise(b0)
    return merged.select("host", b_eff.alias("max_parallel"))


def run_crawl(
    spark: SparkSession,
    pages_df: DataFrame,
    seeds,
    params: "CrawlParams | None" = None,
    *,
    politeness_df: "DataFrame | None" = None,
    robots_df: "DataFrame | None" = None,
    state_dir: "str | None" = None,
    resume: bool = False,
    use_bloom: bool = True,
    seen_filter: "str | None" = None,
    bucket_known: "bool | None" = None,
    seed_dim: "bool | None" = None,
    collect_lineage: bool = True,
    default_host_budget: int = 10,
    pages_prepared: bool = False,
    cache_pages: bool = True,
    scrape_cache: "DataFrame | None" = None,
    transport=None,
    state_backend: "StateBackend | None" = None,
) -> CrawlRun:
    """Run a crawl over the corpus. See module docstring and oracle.py
    for the exact semantics contract.

    ``seeds``: list of (url, seed_rank) OR a DataFrame with columns
    (url, seed_rank) — the scale path for Common-Crawl-style seed
    lists (the driver never materializes seed rows; see _SeedSet).
    ``seed_dim``: None (default) auto-engages the seeds dim above
    SEED_DIM_THRESHOLD or for DataFrame input; True forces it (tests);
    False forces the literal path (collects a DataFrame input).
    ``pages_prepared``: pass True when pages_df already has url_canon
    (e.g. from bucketize_pages).

    ``scrape_cache``: a prior run's successful result rows (J3, the
    Redis scrape cache, scrape/service.go:583-614): cache-hit URLs
    skip both the corpus join and the extraction UDF and reuse the
    stored content/discovery. ``params.fresh=True`` bypasses it
    (scrape/service.go:64-69). Extraction is a pure function of the
    html, so cached and fresh runs are bit-identical (tested).

    ``seen_filter``: "bloom" | "cuckoo" | "off" — which URL-seen
    pre-filter prunes the exact anti-join (north_rule: "Bloom/cuckoo
    URL-seen"). None (default) derives it from ``use_bloom``. A pure
    physical-plan choice: the exact anti-join re-checks every
    positive, so traces are identical across all three (tested).

    ``bucket_known``: None (default) auto-engages the bucketed
    known-state table above KNOWN_TABLE_THRESHOLD discovered URLs;
    True forces it from the first wave (tests); False keeps the
    frontier-file scan path only. Purely a physical-plan choice —
    trace-equivalence is pinned by test_known_bucketed_equals_files.

    ``transport``: an injected live-fetch seam
    (transport.FetchTransport). When set, the wave's fetch runs
    through ``transport_fetch`` (attempt-driven S3 retry ladder +
    header profiles resolved per row) instead of the corpus join; a
    transport serving the corpus is crawl-identical to the join
    (tests/test_transport.py).

    ``state_backend``: the state-table layer (plans/state.py — the
    Iceberg seam). None (default) uses ParquetStateBackend (per-wave
    parquet dirs + JSONL manifest under ``state_dir``, the historical
    layout); CatalogStateBackend routes the same commit protocol
    through Spark SQL catalog tables (the shape a real Iceberg
    adapter takes). Trace equivalence across backends is pinned by
    tests/test_state_backends.py.
    """
    params = params or CrawlParams()
    t_init = time.time()
    own_state = state_dir is None
    if own_state:
        state_dir = tempfile.mkdtemp(prefix="supacrawler_state_")
    os.makedirs(state_dir, exist_ok=True)
    backend = state_backend or ParquetStateBackend(
        spark, state_dir, known_buckets=KNOWN_BUCKETS,
        known_compact_every=KNOWN_COMPACT_EVERY)
    if not resume and backend.has_state():
        # a fresh run over a used state dir: clear it NOW, before the
        # corpus/seeds materialize into it (clearing later would delete
        # files this run just wrote and already handed to lazy readers)
        backend.reset()
        shutil.rmtree(state_dir)
        os.makedirs(state_dir)

    if pages_prepared:
        # caller already has a canonical-keyed (possibly bucketed) table
        pages_prep = pages_df
    else:
        # materialize the prepared corpus ONCE: every wave's fetch join
        # then scans parquet instead of re-running the upstream lineage
        # (at design scale the corpus is already an Iceberg table and
        # this step does not exist — pass pages_prepared=True)
        pages_path = os.path.join(state_dir, "pages")
        if not (resume and os.path.exists(pages_path)):
            _write(prepare_pages(pages_df), pages_path)
        pages_prep = spark.read.parquet(pages_path)
    # Size the corpus-scan splits to the cluster BEFORE the corpus's
    # first action below (pages_urls write / cache materialization) —
    # a persisted corpus keeps whatever partitioning its first scan
    # had, so tuning after the fact would silently never engage for
    # the cached path. Default 128 MB packs a modest corpus into a
    # handful of splits and caps the extraction stage at that many
    # Python workers regardless of core count (measured: a 377 MB
    # corpus scanned as ~7 splits pinned wave extraction at ~7/16
    # cores; 4->16-core scaling flatlined at ~2x). At 100-TB scale
    # bytes/(3*cores) >> 128 MB and this is a no-op. Restored after
    # the loop.
    base_split = spark.conf.get("spark.sql.files.maxPartitionBytes")
    base_opencost = spark.conf.get("spark.sql.files.openCostInBytes")
    _cores = spark.sparkContext.defaultParallelism
    try:
        _corpus_bytes = sum(
            os.path.getsize(f[5:] if f.startswith("file:") else f)
            for f in pages_prep.inputFiles())
    except Exception:  # non-file source (in-memory test frame)
        _corpus_bytes = 0
    if _corpus_bytes:
        # One task-wave per core: the scan stage fuses the corpus
        # read, the broadcast fetch join AND the extraction UDF, and
        # its per-task fixed cost (task-binary deserialize + Python
        # worker dispatch) measured 165-400 ms/task on this box — at
        # bytes/(3*cores) the 377 MB bench corpus became 160 tasks
        # whose fixed cost (~26 s CPU per wave-stage) rivaled the
        # extraction work itself. bytes/cores keeps every core busy
        # exactly once per wave with per-task work >> per-task cost
        # (interleaved A/B medians 52.5 s -> 36.4 s on the 7-wave
        # bench crawl). At design scale this is a no-op: bytes/cores
        # >> 128 MB caps at the default split size.
        _split = min(128 * 1024 * 1024,
                     max(4 * 1024 * 1024, _corpus_bytes // _cores))
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(_split))
        # default 4 MB open-cost re-packs small files into few splits
        spark.conf.set("spark.sql.files.openCostInBytes",
                       str(512 * 1024))
    if cache_pages:
        # the fetch join scans the corpus every wave — keep it hot
        # (memory+disk). At 100-TB scale this is the executors' cache
        # of hot table partitions; disable for corpora >> cluster RAM.
        pages_prep = pages_prep.persist()
    # url-only corpus projection for the miss path of the fetch join:
    # a few bytes/row, so the fat html column is scanned once per wave.
    # Written on a pool thread — the scan is independent of the rest
    # of preloop (politeness collapse, seed init, frontier count), so
    # overlapping it takes its 1-2 s off the preloop critical path;
    # joined just before the wave loop, where the projection is first
    # read. Concurrent jobs on one SparkSession are supported (the
    # wave loop's bloom/known appends already rely on this).
    urls_path = os.path.join(state_dir, "pages_urls")
    _urls_err: list = []

    def _urls_work():
        try:
            _write(pages_prep.select("url_canon"), urls_path)
        except BaseException as exc:  # re-raised on join
            _urls_err.append(exc)

    _urls_th = None
    if not (resume and os.path.exists(urls_path)):
        _urls_th = threading.Thread(target=_urls_work, daemon=True)
        _urls_th.start()

    D = params.max_depth
    L = params.link_limit
    ML = params.discovery_cap
    pattern_udf = match_patterns_udf(params.patterns)

    # upper bound on any host's politeness budget — used with the
    # frontier's distinct-host count to bound the scheduled-wave size
    # before it is computed (broadcast-vs-shuffle gate). politeness_df
    # is a broadcastable dim by design, so this one-time driver action
    # is tiny at any scale.
    max_budget = default_host_budget
    # Per-host delays fold into the budget BEFORE the collapse below
    # (semantics + citations: effective_politeness docstring).
    pol_eff = effective_politeness(politeness_df, robots_df,
                                   params.wave_window_ms,
                                   default_host_budget)
    pol_arg = pol_eff
    if pol_eff is not None:
        # Small dims (the norm: one row per throttled host) collapse to
        # a driver dict -> literal MAP lookup in politeness_select: one
        # collect here instead of a broadcast-build job EVERY wave.
        # Large dims keep the broadcast-join path.
        # coalesce(1) first: a limited collect over a many-partition
        # dim otherwise runs Spark's incremental take — up to 4
        # escalating jobs (1 -> 4 -> 16 -> all partitions) for a
        # dim of a few dozen rows (measured 4.9 s of preloop on a
        # cold session). One partition -> one job; the single-thread
        # scan is bounded because this IS a dim (and the limit bounds
        # driver memory regardless).
        _rows = (pol_eff.select("host", "max_parallel")
                 .coalesce(1).limit(1025).collect())
        if len(_rows) <= 1024:
            pol_arg = {r["host"]: int(r["max_parallel"]) for r in _rows
                       if r["max_parallel"] is not None}
            if pol_arg:
                max_budget = max(max(pol_arg.values()), default_host_budget)
        else:
            _mb = pol_eff.agg(F.max("max_parallel")).first()[0]
            if _mb is not None:
                max_budget = max(int(_mb), default_host_budget)

    # ---- init / resume ----------------------------------------------------
    manifest = backend.read_manifest() if resume else []
    seedset = _SeedSet(spark, seeds, state_dir, resume=bool(manifest),
                       force_dim=seed_dim)
    if manifest:
        last = manifest[-1]
        it0 = last["iter"] + 1
        next_ord = last["next_ord"]
        successes = last["successes"]
        failures = last.get("failures")  # None on pre-upgrade state dirs
        discovered_cnt = last["discovered_cnt"]
        limit_reached = last["limit_reached"]
        run_id = last["run_id"]
        hosts_est = last.get("hosts_next")
        prev_sched = last.get("scheduled")
        frontier = _schedulable_frontier(
            backend.read_wave("frontier", last["iter"],
                              FRONTIER_DISK_SCHEMA), seedset)
        n_frontier = last["n_frontier_next"]
    else:
        it0 = 0
        next_ord = 0
        successes = 0
        failures = 0
        limit_reached = False
        run_id = uuid.uuid4().hex[:12]
        frontier = seedset.frontier()
        # literal-seed mode: the deduped canonical count is already
        # driver-known — no count job (dim mode still counts)
        n_frontier = (len(seedset.urls) if seedset.urls is not None
                      else frontier.count())
        discovered_cnt = 0
        hosts_est = None
        prev_sched = None
    backend.run_id = run_id  # known-table namespace (parquet backend)
    # crash-window hygiene: drop any wave tables newer than the last
    # committed manifest line (all of them on a fresh start)
    backend.prune_uncommitted(manifest[-1]["iter"] if manifest else -1)

    # Bloom engages lazily: below BLOOM_THRESHOLD known keys the exact
    # anti-join alone is faster than the probe shuffle; at the 10^10
    # regime the filter prunes nearly all probe volume (SURVEY.md J2).
    # The first activation bulk-builds from the known table (this also
    # covers resume — no separate rebuild path needed).
    # `seen_filter` picks the probabilistic pre-filter family the north
    # rule names ("Bloom/cuckoo URL-seen"): "bloom" (default),
    # "cuckoo" (cuckoo.py — deletable, 2-row probes), or "off". Both
    # expose the same add/flag API, so everything below is
    # filter-agnostic; trace equivalence bloom == cuckoo == off is
    # pinned by tests (the exact anti-join always re-checks positives).
    if seen_filter is None:
        seen_filter = "bloom" if use_bloom else "off"
    if seen_filter == "bloom":
        bloom = BloomState(os.path.join(state_dir, "bloom"))
    elif seen_filter == "cuckoo":
        bloom = CuckooState(os.path.join(state_dir, "cuckoo"))
    elif seen_filter == "off":
        bloom = None
    else:
        raise ValueError(f"unknown seen_filter {seen_filter!r}")
    bloom_built = False
    # incremental bloom adds run on a background thread: the add only
    # has to complete before the NEXT wave's probe executes, so it
    # overlaps the next wave's (much longer) fetch+extract job instead
    # of serializing ~0.3-0.5s of fixed latency into every wave
    bloom_pending: list = []
    bloom_errors: list = []

    def _bloom_add_async(df):
        def work():
            try:
                bloom.add(df)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                bloom_errors.append(e)
        th = threading.Thread(target=work, daemon=True)
        th.start()
        bloom_pending.append(th)

    def _bloom_join():
        """A silently failed add would turn seen URLs into bloom false
        negatives, which the anti-join TRUSTS — so failures propagate."""
        while bloom_pending:
            bloom_pending.pop().join()
        if bloom_errors:
            raise bloom_errors[0]

    def _known_files_df() -> "DataFrame | None":
        """The mapper's `links` set = all capped candidates ever
        emitted. Each appears exactly once across frontier files with
        is_new=true (deferred re-appearances are flagged false), so
        the frontier table doubles as the known table — one write per
        wave, two roles. Duplicates would be harmless anyway (the
        consumer is a LEFT ANTI join)."""
        raw = backend.read_all("frontier", FRONTIER_DISK_SCHEMA)
        if raw is None:
            return None
        return raw.filter("is_new").select("url", "url_hash")

    # ---- bucketed known-state table (module docstring scale note) ---------
    # Engaged above KNOWN_TABLE_THRESHOLD (or forced by bucket_known):
    # the cumulative known set lives in a parquet table bucketed on
    # `url`, so the per-wave exact anti-join reads it bucket-aligned —
    # candidates exchange into the table's partitioning, the known
    # side NEVER re-shuffles, and per-wave anti-join cost stops
    # growing with wave count. The table is derived state: (re)built
    # from committed frontier waves on engage/resume (overwrite also
    # discards any crash-orphaned append), appended per committed
    # wave, compacted into the next generation every
    # KNOWN_COMPACT_EVERY appends. Storage lives on the state backend
    # (StateBackend.known_*).

    def _known_engage() -> None:
        src = _known_files_df()
        if src is None:
            return
        backend.known_rebuild(src)

    # like the bloom adds, the known append only has to land before
    # the NEXT wave's anti-join reads the table — run it on a
    # background thread so it overlaps that wave's (much longer)
    # fetch+extract job instead of adding fixed latency to every wave.
    # The join discipline (joined before every known_df() use and at
    # run end) serializes appends, so the bucketed table never sees
    # two concurrent writers; failures propagate — a lost append would
    # silently drop discoveries via the anti-join.
    known_pending: list = []
    known_errors: list = []

    def _known_append_async(df):
        def work():
            try:
                backend.known_append(df)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                known_errors.append(e)
        th = threading.Thread(target=work, daemon=True)
        th.start()
        known_pending.append(th)

    def _known_join():
        while known_pending:
            known_pending.pop().join()
        if known_errors:
            raise known_errors[0]

    def known_df() -> "DataFrame | None":
        if backend.known_active():
            return backend.known_read()
        return _known_files_df()

    # Seed-membership semantics (why seeds are excluded from the known
    # anti-join but dropped from the next frontier) live on _SeedSet.

    # ---- wave loop ----------------------------------------------------------
    if _urls_th is not None:
        _urls_th.join()
        if _urls_err:
            raise _urls_err[0]
    pages_urls = spark.read.parquet(urls_path).persist()
    it = it0
    t_loop = time.time()
    base_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    base_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    # AQE off for the wave loop: adaptive execution materializes every
    # exchange as a query stage with a driver round-trip — pure fixed
    # latency on iterative micro-waves. The two things AQE would buy
    # are already done explicitly here: shuffle partitions are sized to
    # the wave (wave_shuffle below) and hot-host skew is pre-salted
    # (operators/frontier.py). Restored after the loop.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    cores = spark.sparkContext.defaultParallelism
    t_start = time.time()
    deadline_hit = False
    while n_frontier > 0 and it < params.max_waves:
        if L > 0 and successes >= L:
            break
        if (params.max_seconds is not None
                and time.time() - t_start > params.max_seconds):
            # L6 wall-clock cap (crawl/service.go:323-331): stop
            # between waves; committed state stays resumable
            deadline_hit = True
            break
        t0 = time.time()

        # explicit shuffle-partition control per wave (north_rule):
        # micro-waves pay per-task scheduling latency on every one of
        # their ~10 shuffle stages — size the partition count to the
        # wave, not the cluster. The heavy extraction stage is
        # parallelized separately by an explicit repartition.
        # Floor at cores/4, not cores: the wave-loop shuffles move
        # O(wave) tiny frontier rows, and each shuffle task pays the
        # same fixed deserialize/dispatch cost as above (~0.37 s/task
        # measured on the frontier-commit stage — 83% of its task
        # time at 64 partitions). Extraction parallelism is ruled by
        # the corpus-scan splits and the explicit repartition of
        # `scheduled`, not by this; large frontiers still scale via
        # the rows term (10^7 frontier rows -> 3333 partitions).
        wave_shuffle = min(max(1, cores // 4, n_frontier // 3000), 4 * cores)
        spark.conf.set("spark.sql.shuffle.partitions", str(wave_shuffle))

        # Driver-known bound on this wave's SCHEDULED row count, before
        # anything is computed: <= n_frontier, <= remaining link
        # budget, and <= distinct frontier hosts (prev wave's fused
        # aggregate) x max host budget. Decides the fetch-join physical
        # strategy and (tightened by the prev wave's actual width, a
        # sound predictor because BFS discovery fans out <= ~10
        # links/page) which global-rank path to take — gating on
        # n_frontier alone would broadcast a huge scheduled frame when
        # hosts are many (driver OOM), shuffle needlessly when a huge
        # frontier collapses to a tiny polite wave, and pay the
        # two-phase rank's extra exchanges + broadcast-build job on
        # every steady-state micro-wave.
        sched_bound = n_frontier
        if L > 0:
            sched_bound = min(sched_bound, max(L - successes, 0))
        if hosts_est:
            # +10% for approx_count_distinct error, +16 slack
            sched_bound = min(sched_bound,
                              int(hosts_est * 1.1 + 16) * max_budget)
        rank_hint = sched_bound
        if prev_sched is not None:
            # x4 covers every observed inter-wave growth ratio; an
            # underestimate only means a single-partition sort of a
            # <=4x-larger-than-hinted wave (slower, never wrong)
            rank_hint = min(rank_hint, max(prev_sched * 4, 4096))

        # 1. politeness selection (salted two-phase per-host top-B
        # above the salt threshold; plain per-host window below),
        # cached across the wave's two commits
        selected, deferred, _rank_cache = politeness_select(
            frontier, pol_arg, default_host_budget,
            hint_count=n_frontier, persist=True)

        # 2. global rank in crawl order K; budget cut; crawl_ord
        wave_caches = []
        selected = ordered_row_number(
            selected, order_exprs(), "_grank", hint_count=rank_hint,
            cache_out=wave_caches)
        if L > 0:
            rem = L - successes
            overflow = selected.filter(F.col("_grank") > rem).drop("_grank")
            deferred = deferred.unionByName(overflow)
            selected = selected.filter(F.col("_grank") <= rem)
        scheduled = (selected
                     .withColumn("crawl_ord",
                                 (F.lit(next_ord) + F.col("_grank") - 1))
                     .drop("_grank")
                     .withColumn("iter", F.lit(it)))

        # 3. per-row flags: seed pattern gate + robots page gate
        scheduled = scheduled.withColumn(
            "pattern_ok",
            F.when(F.col("parent_ord") == -1, pattern_udf(F.col("url")))
            .otherwise(F.lit(True)))
        if robots_df is not None:
            rules = robots_df.select(
                "host", "allow_prefixes", "disallow_prefixes")
            scheduled = scheduled.join(F.broadcast(rules), "host", "left")
            scheduled = scheduled.withColumn(
                "robots_ok",
                robots_allowed_udf(F.col("url"), F.col("disallow_prefixes"),
                                   F.col("allow_prefixes"))
            ).drop("allow_prefixes", "disallow_prefixes")
        else:
            scheduled = scheduled.withColumn("robots_ok", F.lit(True))

        # 4. fetch (corpus join) + extraction, committed to state.
        # The global-rank window leaves `scheduled` in ONE partition —
        # repartition first or extraction runs on a single core.
        # `scheduled` appears 3x in the fetch-join plan (hits broadcast,
        # miss probe, hit-url broadcast): persist it so the politeness/
        # rank window chain materializes once per wave, not per
        # occurrence.
        scheduled = scheduled.repartition(
            max(8, spark.sparkContext.defaultParallelism), "url").persist()
        wave_caches.append(scheduled)

        # J3 scrape cache: only successful prior rows are cached
        # (ScrapeWithCache caches after isValidResult,
        # scrape/service.go:46-48); pattern-skipped seeds never reach
        # the cache path (streamCrawl checks the pattern first, 470).
        cache_hits = None
        if scrape_cache is not None and not params.fresh:
            cacheable = scheduled.filter(F.col("pattern_ok"))
            c = scrape_cache.filter("success").select(
                "url", "status_code", "title", "markdown", "text",
                "links", "discovery", "discovered", "metadata", "html")
            hit = c.join(
                F.broadcast(cacheable.select(
                    "url", "iter", "depth", "crawl_ord", "seed_rank",
                    "seed_host", "host", "url_hash", "parent_ord",
                    "link_pos", "attempt")), "url", "inner")
            cache_hits = hit.select(
                "url", "iter", "depth", "crawl_ord", "seed_rank",
                "seed_host", "host", "url_hash", "parent_ord",
                "link_pos", "attempt", "status_code",
                F.lit(True).alias("success"),
                F.lit(None).cast("string").alias("error"),
                "title", "markdown", "text", "links", "discovery",
                "discovered", "metadata", "html")
            scheduled = scheduled.join(
                F.broadcast(cache_hits.select("url")), "url", "left_anti")

        # broadcast-semi strategy while the politeness-capped SCHEDULED
        # wave is broadcast-sized (sched_bound, computed above);
        # shuffle-hash beyond (never sorts the corpus). With an
        # injected transport the corpus join is bypassed entirely (the
        # live-path seam).
        extractor = make_extractor(params.include_html, params.fresh)
        if transport is not None:
            fetched = transport_fetch(scheduled, transport)
            results = fetched.mapInPandas(extractor, RESULT_SCHEMA)
        elif sched_bound <= SMALL_WAVE_ROWS:
            # r6: misses never cross the Python boundary — their
            # result rows are pure codegen expressions of the
            # scheduled row (miss_results == the extractor's
            # html-is-None branch, equality-tested), so the
            # extraction UDF runs on hit rows only.
            hits, miss = fetch_join_split(
                scheduled, pages_prep, pages_urls=pages_urls,
                broadcast_urls=bool(
                    _corpus_bytes
                    and _corpus_bytes <= CORPUS_URLS_BROADCAST_BYTES))
            results = (hits.mapInPandas(extractor, RESULT_SCHEMA)
                       .unionByName(miss_results(miss, params.fresh)))
        else:
            fetched = fetch_join(scheduled, pages_prep, small_wave=False,
                                 pages_urls=pages_urls)
            results = fetched.mapInPandas(extractor, RESULT_SCHEMA)
        if cache_hits is not None:
            results = results.unionByName(
                cache_hits.select(*[f.name for f in RESULT_SCHEMA.fields]))
        t_fetch = time.time()
        # per-wave aggregates ride the write actions as observed
        # metrics — zero standalone aggregation jobs per wave (every
        # saved action is ~0.5-1s of fixed, non-scaling driver latency)
        obs_res = Observation(f"res_{run_id}_{it}")
        results = results.observe(
            obs_res, F.count(F.lit(1)).alias("sched"),
            F.sum(F.col("success").cast("long")).alias("succ"),
            F.sum(F.col("error").isNotNull().cast("long")).alias("fail"))
        backend.write_wave("results", it, results)
        res_m = obs_res.get
        stage_ms = {"fetch_extract": int((time.time() - t_fetch) * 1000)}
        res_df = backend.read_wave("results", it, RESULT_SCHEMA)

        if collect_lineage:
            lin = (res_df.groupBy(F.spark_partition_id().alias("partition_id"))
                   .agg(F.count("*").alias("rows"))
                   .select(F.lit(run_id).alias("run_id"),
                           F.lit(it).alias("iter"),
                           F.lit("extract").alias("stage"),
                           "partition_id", "rows"))
            backend.write_wave("lineage", it, lin)

        # 5. discovery: emission filters -> known-dedup -> cap, fused
        # with the frontier commit: ONE write (deferred is_new=false ∪
        # new candidates is_new=true) + ONE count job per wave.
        t_s = time.time()
        n_new = 0
        if not limit_reached:
            cand = expand_candidates(
                res_df, params.include_subdomains, params.patterns,
                robots_df, max_depth=D)
            # the anti-join below must see every known append issued
            _known_join()
            if (bucket_known is not False
                    and not backend.known_active()
                    and (bucket_known is True
                         or discovered_cnt > KNOWN_TABLE_THRESHOLD)):
                _known_engage()
            kdf = known_df()
            if kdf is not None:
                bloom_active = bloom is not None and \
                    discovered_cnt > BLOOM_THRESHOLD
                # the probe below must see every add issued so far
                _bloom_join()
                if bloom_active and not bloom_built:
                    bloom.add(kdf.select("url_hash"))
                    bloom_built = True
                if bloom_active:
                    flagged = bloom.flag(cand)
                    fresh_c = flagged.filter(~F.col("_maybe_seen")).drop(
                        "_maybe_seen")
                    maybe = flagged.filter(F.col("_maybe_seen")).drop(
                        "_maybe_seen")
                    maybe = maybe.join(kdf.select("url"), "url", "left_anti")
                    cand = fresh_c.unionByName(maybe)
                else:
                    cand = cand.join(kdf.select("url"), "url", "left_anti")
            # intra-wave first-seen dedup (J5): min discovery order
            # wins. Expressed as min(struct) — NOT a row_number window
            # — because struct-min has a map-side partial aggregate:
            # each task collapses its local duplicates before the
            # exchange, so the shuffle carries ~distinct-url volume
            # instead of every discovered link (a window must shuffle
            # all rows first). (parent_ord, link_pos) is unique per
            # candidate row and leads the struct, so lexicographic
            # struct ordering == the discovery order and the result is
            # deterministic and identical to the row_number form.
            other = [c for c in cand.columns
                     if c not in ("url", "parent_ord", "link_pos")]
            cand = (cand.groupBy("url")
                    .agg(F.min(F.struct("parent_ord", "link_pos",
                                        *other)).alias("_first"))
                    .select("url", "_first.*"))
            # discovery cap (mapper limitReached)
            if ML is not None:
                avail = ML - discovered_cnt
                cand = ordered_row_number(
                    cand, ["parent_ord", "link_pos"], "_dord",
                    cache_out=wave_caches)
                cand = cand.filter(F.col("_dord") <= avail).drop("_dord")
            new_cand = cand.select(*FRONTIER_SCHEMA.fieldNames())
        else:
            new_cand = spark.createDataFrame([], FRONTIER_SCHEMA)

        # F9 retry: a failed fetch releases its budget slot and the URL
        # re-enters the frontier (delete(processed,u) + releaseSlot,
        # crawl/service.go:564-571) up to max_retries total attempts
        # (TASK_MAX_RETRIES, config.go:90). Retry rows keep their
        # original crawl-order key (depth, parent_ord, link_pos) and
        # bypass the known-set anti-join (is_new=false: the processed
        # map and the mapper's discovery dedup are separate states).
        retry_rows = None
        if params.retry_failures:
            retry_rows = (res_df.filter(
                F.col("error").isNotNull()
                & (F.col("attempt") < params.max_retries - 1))
                .select("url", "host", "url_hash", "depth", "parent_ord",
                        "link_pos", "seed_rank", "seed_host",
                        F.lit(0.0).alias("priority"),
                        (F.col("attempt") + 1).alias("attempt")))

        # 6. frontier commit. Seed-pointing candidates stay in the
        # file with is_new=true (they consumed discovery budget and
        # must stay in `known`) but are never scheduled — the read
        # filter drops them (the crawler's processed map,
        # crawl/service.go:525-527).
        next_frontier = (
            deferred.select(*FRONTIER_SCHEMA.fieldNames())
            .withColumn("is_new", F.lit(False))
            .unionByName(new_cand.withColumn("is_new", F.lit(True))))
        if retry_rows is not None:
            next_frontier = next_frontier.unionByName(
                retry_rows.select(*FRONTIER_SCHEMA.fieldNames())
                .withColumn("is_new", F.lit(False)))
        next_frontier = seedset.flag(next_frontier)
        sched_cond = ~(F.col("is_new") & F.col("_seed"))
        obs_fr = Observation(f"fr_{run_id}_{it}")
        next_frontier = next_frontier.observe(
            obs_fr,
            F.sum(F.col("is_new").cast("long")).alias("new"),
            F.sum(sched_cond.cast("long")).alias("sched"),
            F.approx_count_distinct(
                F.when(sched_cond, F.col("host"))).alias("hosts")
        ).drop("_seed")
        t_s = time.time()
        backend.write_wave("frontier", it, next_frontier)
        fr_m = obs_fr.get
        raw = backend.read_wave("frontier", it, FRONTIER_DISK_SCHEMA)
        wave_sched = int(res_m["sched"] or 0)
        prev_sched = wave_sched
        wave_succ = int(res_m["succ"] or 0)
        if failures is not None:
            failures += int(res_m["fail"] or 0)
        n_new = int(fr_m["new"] or 0)
        n_frontier = int(fr_m["sched"] or 0)
        hosts_est = int(fr_m["hosts"] or 0)
        stage_ms["agg"] = int((time.time() - t_s) * 1000)
        if _rank_cache is not None:
            _rank_cache.unpersist()
        for c in wave_caches:
            c.unpersist()
        if wave_sched == 0:
            # a zero-budget politeness table starved every remaining
            # host: nothing is ever schedulable again. Match the
            # oracle's empty-selection exit — the empty wave is not
            # committed (no manifest line, files pruned), instead of
            # looping to max_waves at fixed driver cost per iteration.
            backend.prune_uncommitted(it - 1)
            break
        frontier = _schedulable_frontier(raw, seedset)
        if not limit_reached:
            if bloom_built and n_new:
                _bloom_add_async(raw.filter("is_new").select("url_hash"))
            if backend.known_active() and n_new:
                # this wave's accepted candidates become `known` for
                # wave it+1 (joined before that wave's anti-join);
                # crash before the manifest line is healed by the
                # engage-time overwrite rebuild on resume
                _known_append_async(raw.filter("is_new")
                                    .select("url", "url_hash"))
            if ML is not None and discovered_cnt + n_new >= ML:
                limit_reached = True
            discovered_cnt += n_new
        stage_ms["discovery"] = int((time.time() - t_s) * 1000)
        stage_ms["frontier"] = 0

        successes += wave_succ
        next_ord += wave_sched

        # 7. commit the wave
        line = dict(run_id=run_id, iter=it, scheduled=wave_sched,
                    wave_successes=wave_succ, successes=successes,
                    failures=failures, retry=params.retry_failures,
                    next_ord=next_ord, discovered_cnt=discovered_cnt,
                    limit_reached=limit_reached, n_frontier_next=n_frontier,
                    hosts_next=hosts_est,
                    wall_ms=int((time.time() - t0) * 1000),
                    stage_ms=stage_ms)
        manifest.append(line)
        backend.append_manifest(line, truncate=(it == 0 and not resume))
        it += 1

    t_post = time.time()
    _bloom_join()  # bloom state must be durable before the run returns
    _known_join()
    backend.known_close()
    spark.conf.set("spark.sql.shuffle.partitions", base_shuffle)
    spark.conf.set("spark.sql.adaptive.enabled", base_aqe)
    spark.conf.set("spark.sql.files.maxPartitionBytes", base_split)
    spark.conf.set("spark.sql.files.openCostInBytes", base_opencost)
    if cache_pages:
        pages_prep.unpersist()
    pages_urls.unpersist()
    run = CrawlRun(spark=spark, state_dir=state_dir, run_id=run_id,
                   manifest=manifest, link_limit=L, backend=backend)
    n_res = min(successes, L) if L > 0 else successes
    # Failed-page count: without retries every error url is scheduled
    # exactly once, so the per-wave observed sums ARE the distinct
    # count — no post-loop scan job (it was ~1-2s of fixed, non-scaling
    # wall per run). With retry_failures a url may carry one error row
    # per attempt (one failed page, the oracle's errors dict) — so the
    # distinct-count job runs if THIS run retries or if ANY committed
    # wave was produced with retries enabled (a resume with
    # retry_failures=False over retry-era waves would otherwise count
    # one row per attempt). Resumed pre-upgrade state dirs (no
    # 'failures' in the manifest) also fall back to the scan.
    if manifest and (params.retry_failures or failures is None
                     or any(ln.get("retry", False) for ln in manifest)):
        total_err = run._results_all().filter(
            F.col("error").isNotNull()
        ).select("url").distinct().count()
    else:
        total_err = failures if manifest else 0
    run.stats = dict(total_pages=n_res + total_err,
                     successful_pages=n_res, failed_pages=total_err,
                     waves=len(manifest), urls_scheduled=next_ord,
                     deadline_hit=deadline_hit,
                     wall_preloop_ms=int((t_loop - t_init) * 1000),
                     wall_waves_ms=int((t_post - t_loop) * 1000),
                     wall_postloop_ms=int((time.time() - t_post) * 1000))
    return run


def scrape_one(spark, pages_df: DataFrame, url: str,
               params: "CrawlParams | None" = None, **kw) -> DataFrame:
    """§3.2 scrape equivalent: a 1-row frontier through the same
    pipeline stages, one wave, success or error row included
    (ScrapeResponse shape)."""
    p = params or CrawlParams(depth=1)
    run = run_crawl(spark, pages_df, [(url, 0)],
                    CrawlParams(depth=1, include_html=p.include_html,
                                fresh=p.fresh, patterns=p.patterns,
                                max_waves=1), **kw)
    return (run._results_all()
            .select(*RESULT_COLS_USER)
            .orderBy("crawl_ord").limit(1))
