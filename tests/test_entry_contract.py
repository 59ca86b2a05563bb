"""Driver-contract consistency checks on __ray_entry__."""

import importlib.util


def _load():
    spec = importlib.util.spec_from_file_location(
        "_entry_mod", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_every_oracle_key_has_query():
    mod = _load()
    qs, sqls = mod.queries(), mod.oracle_sql()
    assert set(sqls) <= set(qs), set(sqls) - set(qs)
    # a healthy majority of queries are SQL-checked
    assert len(sqls) >= len(qs) * 0.7


def test_callables_are_callable():
    mod = _load()
    for name, fn in mod.queries().items():
        assert callable(fn), name
