"""PII redaction + paragraph-level dedup + degree stats, pinned
against independent pure-Python twins (``re`` module / dict
arithmetic) rather than the DuckDB oracle, so the operators are
double-checked by two unrelated implementations.

Java regex and Python ``re`` agree on the three PII patterns (no
lookarounds/backrefs), so the twin is exact.
"""

import hashlib
import re
from collections import defaultdict

import pandas as pd

from supacrawler_spark import graph, textops

SF_DIR = "/root/testdata/sf0.001"


def _pii_text(doc_id, text):
    return (f"{text} contact user{doc_id}@mail{doc_id % 7}.com "
            f"ip 10.{doc_id % 200}.0.{doc_id % 250} "
            f"tel +1-555-{doc_id % 10000:04d}")


def test_pii_redact_matches_re_twin(spark):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    want = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        t = _pii_text(did, text)
        n_e = len(re.findall(textops.PII_EMAIL_RE, t))
        t = re.sub(textops.PII_EMAIL_RE, "[EMAIL]", t)
        n_i = len(re.findall(textops.PII_IPV4_RE, t))
        t = re.sub(textops.PII_IPV4_RE, "[IP]", t)
        n_p = len(re.findall(textops.PII_PHONE_RE, t))
        t = re.sub(textops.PII_PHONE_RE, "[PHONE]", t)
        want[did] = (n_e, n_i, n_p, hashlib.md5(t.encode()).hexdigest())
    got = {r["doc_id"]: (r["n_emails"], r["n_ips"], r["n_phones"],
                         r["redacted_md5"])
           for r in textops.pii_redact(spark, SF_DIR).collect()}
    assert got == want
    # every row must have exercised all three scrubbers
    assert all(v[0] >= 1 and v[1] >= 1 and v[2] >= 1 for v in got.values())


def _py_paragraph_dedup(docs, k=textops.PARA_TOKENS):
    rows = []
    for did, text in zip(docs["doc_id"], docs["text"]):
        toks = text.split(" ")
        for ci in range((len(toks) + k - 1) // k):
            para = " ".join(toks[ci * k:(ci + 1) * k])
            rows.append((did, ci + 1,
                         hashlib.md5(para.encode()).hexdigest()))
    first = {}
    for did, pos, ph in rows:
        key = (did, pos)
        if ph not in first or key < first[ph]:
            first[ph] = key
    return {(did, pos): (ph, (did, pos) == first[ph])
            for did, pos, ph in rows}


def test_paragraph_dedup_matches_python_twin(spark):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    want = _py_paragraph_dedup(docs)
    got = {(r["doc_id"], r["pos"]): (r["para_hash"], r["keep"])
           for r in textops.paragraph_dedup(spark, SF_DIR).collect()}
    assert got == want
    # the corpus has exact-dup docs, so some paragraph must be dropped,
    # and every dropped paragraph's hash must also appear as a keeper
    dropped = {v[0] for v in got.values() if not v[1]}
    kept = {v[0] for v in got.values() if v[1]}
    assert dropped and dropped <= kept


def test_paragraph_dedup_survives_10k_paragraph_docs(spark):
    """Regression for the retired doc_id*10000+pos first-seen packing:
    doc 0's paragraph at pos 10001 packed to the same BIGINT as doc 1's
    paragraph at pos 1, so a shared paragraph tied and BOTH rows kept.
    The struct key must keep doc 0's occurrence and drop doc 1's."""
    k = 1  # one token per paragraph -> pos == token index
    shared = "sentinel"
    doc0 = " ".join([f"tok{i}" for i in range(10000)] + [shared])
    doc1 = " ".join([shared, "tail1"])
    docs = spark.createDataFrame(
        [(0, doc0), (1, doc1)], "doc_id long, text string")
    got = {(r["doc_id"], r["pos"]): r["keep"]
           for r in textops.paragraph_dedup_df(docs, k=k).collect()}
    assert got[(0, 10001)] is True
    assert got[(1, 1)] is False


def test_host_degree_stats_matches_twin(spark):
    edges = {(r["src"], r["dst"]): r["weight"]
             for r in graph.host_link_edges(spark, SF_DIR).collect()}
    want = defaultdict(lambda: [0, 0, 0, 0])  # outd, outw, ind, inw
    for (s, d), w in edges.items():
        want[s][0] += 1
        want[s][1] += w
        want[d][2] += 1
        want[d][3] += w
    got = {r["host"]: [r["out_degree"], r["out_weight"],
                       r["in_degree"], r["in_weight"]]
           for r in graph.host_degree_stats(spark, SF_DIR).collect()}
    assert got == {k: list(v) for k, v in want.items()}
