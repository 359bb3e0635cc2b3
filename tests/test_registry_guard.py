"""Registry quality gate: every registered query must be verifiable.

A query either carries a DuckDB oracle (the driver hash-compares it
every round) or is one of the explicitly-listed approximate /
non-SQL-expressible operators, each of which must name the property
test that covers it. Adding a query with neither fails here — the
guard that keeps the oracle-checked ratio from silently eroding as the
surface grows (224/229 at round 4).
"""

from __future__ import annotations

import os

from data_ingestion_pimcore_spark import registry

# no-oracle query -> the named property test that covers it
NO_ORACLE_PROPERTY_TESTS = {
    # approximate distinct-count sketches: tolerance-banded vs exact.
    # (Since r11 BOTH also sit under the driver's DuckDB gate via the
    # oracle-bearing agg_sketch_bounds companion query.)
    "agg_approx": "tests/test_llm_ops.py::test_agg_approx_within_tolerance",
    "agg_hll_union": "tests/test_llm_ops.py::test_hll_union_tracks_exact",
    # ANN variants: exactness/recall vs the brute-force oracle query.
    # (sim_knn_blocked graduated to a direct oracle in r10; each entry
    # below ALSO has an oracle-gated sim_recall_* companion query.)
    "sim_knn_ivf": "tests/test_llm_ops.py::test_sim_knn_ivf_recall_vs_bruteforce",
    "sim_knn_pq": "tests/test_llm_ops.py::test_sim_knn_pq_recall_vs_bruteforce",
    # persisted-index lifecycle: exact equality vs the inline IVF query
    "sim_knn_ivf_persisted": (
        "tests/test_llm_ops.py::test_sim_knn_ivf_persisted_equals_ivf"
    ),
    # incremental append: exact equality vs a pinned-centroid rebuild
    "sim_ivf_index_upsert": (
        "tests/test_llm_ops.py::test_sim_ivf_index_upsert_equals_rebuild"
    ),
}


def test_every_query_has_oracle_or_named_property_test():
    qs = registry.all_queries()
    no_oracle = {n for n, q in qs.items() if q.oracle is None}
    assert no_oracle == set(NO_ORACLE_PROPERTY_TESTS), (
        "every query needs a DuckDB oracle OR an entry here naming its "
        f"property test; drifted: {sorted(no_oracle ^ set(NO_ORACLE_PROPERTY_TESTS))}"
    )


def test_every_no_oracle_query_declares_its_gate(spark):
    """r11 verdict item 3: the companion-gate convention must be
    machine-readable, not tribal knowledge. Every oracle-less query
    declares gated_by → a registered ORACLE-BEARING query (validated
    by registry.gates()), and its REGISTERED callable stamps that name
    into the output as a literal gated_by column (the raw module-level
    function stays unwrapped for in-engine composition)."""
    gates = registry.gates()
    qs = registry.all_queries()
    no_oracle = {n for n, q in qs.items() if q.oracle is None}
    assert set(gates) == no_oracle
    for name, target in gates.items():
        assert qs[target].oracle is not None, (name, target)
    # the registered callable carries the linkage in-band; pick the
    # cheapest gated query to execute the wrapped projection
    df = qs["agg_approx"].fn(spark, "/root/testdata/sf0.001")
    assert "gated_by" in df.columns
    vals = {r["gated_by"] for r in df.select("gated_by").distinct().collect()}
    assert vals == {"agg_sketch_bounds"}


def test_named_property_tests_exist():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, ref in NO_ORACLE_PROPERTY_TESTS.items():
        path, test_name = ref.split("::")
        src = open(os.path.join(root, path)).read()
        assert f"def {test_name}(" in src, (
            f"{name}: named property test {ref} not found"
        )


def test_rotation_green_predicate():
    """Rework cohort 0 is for FAILURES only. A rows-only (no-oracle)
    record — err None, match gates None — must count as green, or the
    five oracle-less queries squat at the head of every driver sample
    forever and never-checked queries starve (round-4 advice)."""
    green = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    rows_only = {"rows_match": None, "schema_match": None, "hash_match": None, "err": None}
    erred = {"rows_match": None, "schema_match": None, "hash_match": None, "err": "boom"}
    mismatch = {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}
    assert not registry._is_not_green(green)
    assert not registry._is_not_green(rows_only)
    assert registry._is_not_green(erred)
    assert registry._is_not_green(mismatch)
