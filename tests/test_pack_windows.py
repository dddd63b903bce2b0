"""pack_windows (textops): Python prefix-sum twin + packing
invariants (every interior window exactly full, offsets contiguous),
pinned across shuffle-partition counts (two-phase carry correctness)."""

from supacrawler_spark import textops

SF_DIR = "/root/testdata/sf0.001"
W = textops.PACK_WINDOW


def _py_pack(docs, window=W):
    out = {}
    off = 0
    for d in sorted(docs):
        n = len(docs[d].split(" "))
        start, end = off, off + n
        off = end
        for wid in range(start // window, (end - 1) // window + 1):
            lo, hi = wid * window, (wid + 1) * window
            row = out.setdefault(wid, [0, d, d, 0])
            row[0] += 1
            row[1] = min(row[1], d)
            row[2] = max(row[2], d)
            row[3] += min(end, hi) - max(start, lo)
    return {k: tuple(v) for k, v in out.items()}


def test_pack_windows_matches_python_twin(spark):
    docs = {r["doc_id"]: r["text"]
            for r in textops._docs(spark, SF_DIR).collect()}
    want = _py_pack(docs)
    got = {r["window_id"]: (r["n_docs"], r["first_doc"], r["last_doc"],
                            r["n_tokens"])
           for r in textops.pack_windows(spark, SF_DIR).collect()}
    assert got == want
    # packing invariants: all interior windows carry exactly W tokens
    last = max(got)
    total = sum(len(t.split(" ")) for t in docs.values())
    for wid, (_, _, _, n_tok) in got.items():
        assert n_tok == (W if wid < last else total - last * W)
    assert set(got) == set(range(last + 1))


def test_pack_windows_partition_invariant(spark):
    """The two-phase carry must make the result independent of the
    shuffle-partition count."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    base = {r["window_id"]: (r["n_docs"], r["n_tokens"])
            for r in textops.pack_windows(spark, SF_DIR).collect()}
    try:
        for parts in ("1", "3"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            got = {r["window_id"]: (r["n_docs"], r["n_tokens"])
                   for r in textops.pack_windows(spark, SF_DIR).collect()}
            assert got == base, f"partitions={parts}"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
