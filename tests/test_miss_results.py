"""r6: miss_results (codegen miss rows) must equal the extractor's
html-is-None branch row-for-row — across the pattern_ok / robots_ok /
fresh matrix, including pattern-rejected seeds (no error) and the
fresh+robots-blocked 403 path."""

import pandas as pd
from pyspark.sql import functions as F

from supacrawler_spark.operators.fetch import make_extractor, miss_results
from supacrawler_spark.schemas import RESULT_SCHEMA

SCHED_COLS = ("url string, iter int, depth int, crawl_ord long, "
              "seed_rank int, seed_host string, host string, "
              "url_hash long, parent_ord long, link_pos int, "
              "attempt int, pattern_ok boolean, robots_ok boolean")


def _sched(spark):
    rows = []
    i = 0
    for parent_ord in (-1, 7):          # seed vs discovered
        for pattern_ok in (True, False):
            for robots_ok in (True, False):
                rows.append((f"https://h{i}.example.org/p{i}", 0, 1,
                             100 + i, 3, "h0.example.org",
                             f"h{i}.example.org", 1000 + i,
                             parent_ord, i, 0, pattern_ok, robots_ok))
                i += 1
    return spark.createDataFrame(rows, SCHED_COLS)


def _norm(df):
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)].sort_values("url").reset_index(drop=True)
    return pdf.where(pd.notna(pdf), None)


def test_miss_results_equals_extractor(spark):
    for fresh in (False, True):
        sched = _sched(spark)
        via_udf = (sched.withColumn("html", F.lit(None).cast("binary"))
                   .mapInPandas(make_extractor(False, fresh),
                                RESULT_SCHEMA))
        via_expr = miss_results(sched, fresh)
        a, b = _norm(via_udf), _norm(via_expr)
        assert list(a.columns) == list(b.columns)
        assert a.equals(b), (fresh, a.compare(b))


def test_miss_results_schema_exact(spark):
    out = miss_results(_sched(spark), fresh=False)
    assert [f.name for f in out.schema.fields] == \
        [f.name for f in RESULT_SCHEMA.fields]
    assert [f.dataType for f in out.schema.fields] == \
        [f.dataType for f in RESULT_SCHEMA.fields]
