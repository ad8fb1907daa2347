"""Driver-contract invariants: entry() runs with Ray pre-initialized,
every queries() entry has an oracle (or is a documented rows-only op),
and oracle SQL parses in DuckDB against the registered views."""
import duckdb
import pytest

# every query is oracle-verified: even iterative Lloyd has a SQL twin now
# (integer-quantized centroid sums + unrolled CTE rounds)
# driver-side viz-scale t-SNE: 300 coupled float iterations, no SQL twin
ROWS_ONLY: set[str] = {"tsne_project"}


@pytest.fixture(scope="module")
def contract():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    return e


def test_queries_and_oracles_align(contract):
    q = set(contract.queries())
    o = set(contract.oracle_sql())
    assert o <= q, f"oracles without queries: {o - q}"
    assert q - o == ROWS_ONLY, (
        f"queries missing oracles (add SQL or document rows-only): {q - o}"
    )


def test_oracle_sql_parses(contract):
    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(f"create view {t} as select * from '{sf}/{t}.parquet'")
    for name, sql in contract.oracle_sql().items():
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as exc:
            pytest.fail(f"oracle SQL for {name!r} failed to plan: {exc}")


def test_entry_runs_with_preinitialized_ray(contract, ray_session):
    res = contract.entry()
    # driver smoke: executes, >= 0 rows, stable schema
    schema = res.schema()
    assert set(schema.names) == {"doc_id", "model", "plaintext"}
    assert res.count() == 500
