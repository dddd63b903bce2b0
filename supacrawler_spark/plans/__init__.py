"""Crawl plans."""

from supacrawler_spark.plans.crawl import (  # noqa: F401
    CrawlRun,
    run_crawl,
    scrape_one,
    bucketize_pages,
)
