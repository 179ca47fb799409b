"""Guard the bench output contract (VERDICT.md round 1 item 3).

BENCH_r01.json came back ``"parsed": null`` because bench.py printed one
~6 KB JSON line and the driver captured only a ~2 KB tail — the line
truncated mid-JSON. The contract since round 2: the FINAL stdout line is
a compact (< 1 KB) self-contained JSON object, and the full per-query
map lives in BENCH_DETAIL.json. This test runs bench.main() against a
3-query registry at sf0.001 and asserts the contract, so a future
registration or format change cannot silently regrow the line past the
driver's capture window.
"""

from __future__ import annotations

import io
import json
from contextlib import redirect_stdout

import bench
from rearc_data_engineer_takehome_spark.queries import REGISTRY


def test_bench_final_line_is_compact_parseable_json(
    spark, sf_smoke, monkeypatch, tmp_path
):
    small = {
        n: REGISTRY[n]
        for n in (
            "pricing_summary",
            "best_part_by_supplier",
            "knn_bruteforce",
            "pq_codebook",
        )
    }
    monkeypatch.setattr(bench, "REGISTRY", small)
    monkeypatch.setattr(bench, "SF_DIR", sf_smoke)
    monkeypatch.setattr(bench, "CPUS", "4")
    # route BENCH_DETAIL.json into tmp so the test never clobbers the
    # repo artifact
    monkeypatch.setattr(bench, "DETAIL_PATH", str(tmp_path / "BENCH_DETAIL.json"))
    # bench.main() stops its session on exit; get_spark getOrCreate
    # returns the suite's shared session, which must survive the test
    monkeypatch.setattr(type(spark), "stop", lambda self: None)

    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main()

    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    final = lines[-1]
    assert len(final) < 1024, f"final line too long: {len(final)} bytes"
    out = json.loads(final)
    assert out["metric"] == "total_query_seconds"
    assert out["unit"] == "sec"
    assert out["n_queries"] == 3
    assert out["n_failed"] == 0
    assert isinstance(out["value"], float)
    assert set(out["queries"]) <= set(bench.HEADLINE)
    # offline builds are accounted separately: total_query_seconds is
    # query latency only, build cost goes under builds/build_seconds
    assert out["n_builds"] == 1
    assert isinstance(out["build_seconds"], float)
    detail = json.load(open(tmp_path / "BENCH_DETAIL.json"))
    assert set(detail["queries"]) == set(small) - bench.BUILDS
    assert set(detail["builds"]) == {"pq_codebook"}
    assert detail["value"] == round(sum(detail["queries"].values()), 4)


def test_headline_subset_is_registered():
    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, f"HEADLINE names not in REGISTRY: {missing}"
