"""The bench headline must reference only registered specs — a spec
rename (e.g. the round-8 q214 -> q351 re-registration) must not leave
bench.py silently skipping queries (it filters with `n in specs`)."""

from __future__ import annotations


def test_headline_names_registered():
    import bench

    from tiledb_mariadb_spark.suite import all_specs

    specs = all_specs()
    missing = [n for n in bench.HEADLINE if n not in specs]
    assert not missing, f"bench.HEADLINE names unknown specs: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicates"
