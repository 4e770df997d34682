"""Driver-contract invariants for __ray_entry__ (the judge's entry surface)."""

import sys

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod  # noqa: E402


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    assert set(sqls) <= set(qs), set(sqls) - set(qs)
    # pin the contract size: CLAUDE.md/SURVEY.md state these numbers and
    # they have drifted twice — adding an entry must touch this line too
    assert (len(qs), len(sqls)) == (163, 157), (len(qs), len(sqls))
    # rows-only ops are the documented six (the media entries got exact
    # decode-evidence oracles in round 5; the approx sketches are
    # deterministic but not SQL-derivable — error-bound pytest-locked;
    # the LSH pair is recall-pinned by pytest)
    assert set(qs) - set(sqls) == {
        "ann_lsh_topk", "lsh_neardup", "approx_distinct",
        "grouped_approx_distinct", "approx_percentiles",
        "grouped_approx_percentiles",
    }


def test_queries_are_callables_and_sql_is_nonempty():
    for name, fn in entrymod.queries().items():
        assert callable(fn), name
    for name, sql in entrymod.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_oracle_sql_parses_in_duckdb():
    """Every oracle must at least PREPARE against the sf0.001 views —
    catches SQL syntax drift without paying full execution."""
    import duckdb

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'/root/testdata/sf0.001/{t}.parquet'"
        )
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"oracle {name} does not plan: {e}") from e


def test_entry_returns_rows_with_stable_schema():
    res = entrymod.entry()
    cols = set(res.schema().names)
    assert {"url", "doc_id", "page_idx", "text", "status"} <= cols
    assert res.count() > 0
