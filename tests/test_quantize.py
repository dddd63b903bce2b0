"""int8 scalar quantization (simsearch.embedding_quantize): Python
twin (bit-exact), reconstruction-error bound, and map-only plan."""

import hashlib
import math

from supacrawler_spark import simsearch

SF_DIR = "/root/testdata/sf0.001"
L = simsearch.QUANT_LEVELS


def _py_row(vec):
    e = [float(x) for x in vec]
    maxabs = max(abs(x) for x in e)
    if maxabs == 0:
        q = [0] * len(e)
    else:
        q = [math.floor((x * 127.0) / maxabs) for x in e]
    digest = hashlib.md5(",".join(str(v) for v in q).encode()).hexdigest()
    sat = sum(1 for v in q if abs(v) == L)
    return maxabs, digest, sum(q), min(q), max(q), sat


def test_quantize_matches_python_twin(spark):
    rows = simsearch._emb(spark, SF_DIR).collect()
    want = {r["vec_id"]: _py_row(r["embedding"]) for r in rows}
    got = {r["vec_id"]: (r["maxabs"], r["q_digest"], r["q_sum"],
                         r["q_min"], r["q_max"], r["n_sat"])
           for r in simsearch.embedding_quantize(spark, SF_DIR).collect()}
    assert got == want
    assert len(got) > 0
    # every vector saturates at least once (its max-|x| element)
    assert all(v[5] >= 1 for v in got.values())


def test_quantize_reconstruction_bound():
    """Dequantized values sit within one quantization step of the
    original: |x - q*maxabs/127| <= maxabs/127 (floor quantizer)."""
    vec = [0.3, -1.7, 0.0, 0.9991, 1.7, -0.0003]
    maxabs, _, _, _, _, _ = _py_row(vec)
    step = maxabs / 127.0
    for x in vec:
        q = math.floor((x * 127.0) / maxabs)
        assert abs(x - q * step) <= step + 1e-12


def test_quantize_plan_is_map_only(spark):
    plan = simsearch.embedding_quantize(spark, SF_DIR) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
