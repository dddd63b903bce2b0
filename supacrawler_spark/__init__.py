"""supacrawler_spark — a PySpark-native crawl/analytics engine.

A from-scratch reimplementation of the query & data-processing
capabilities of the supacrawler reference engine (Go, studied at
/root/reference) as an iterative DataFrame pipeline:

- ``urlkit``      pure-Python URL kernel (canonicalize / glob / domain /
                  robots semantics, exact per reference file:line cites)
- ``htmlkit``     pure-Python extraction kernel (html -> text / markdown /
                  links / title / metadata)
- ``functions``   vectorized pandas/Arrow UDF wrappers over the kernels
- ``sources``     table readers + deterministic synthetic-web generator
- ``operators``   frontier dataflow stages (filters, seen anti-join,
                  politeness ranking, fetch join, extraction)
- ``plans``       the iterative crawl driver loop w/ checkpoint + resume
- ``bloom``       partitioned Bloom seen-filter (mapInPandas)
- ``oracle``      deterministic single-threaded reference oracle
- ``textops``     training-data pipeline ops (dedup, quality, lang-id,
                  minhash/simhash, fingerprints)
- ``simsearch``   embedding similarity search (brute-force + LSH)

Everything is plain PySpark (DataFrame API; no custom Catalyst rules),
shippable with ``spark-submit --py-files``.
"""

__version__ = "0.1.0"
