"""OTTL-subset statement parser tests (operators/ottl.py).

Semantics follow the public OTTL LANGUAGE.md the reference's parser
skeleton targets (`rust/experimental/query_engine/ottl-parser/src/
ottl.pest` header).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from otel_arrow_spark.operators.ottl import OttlError, ottl


@pytest.fixture(scope="module")
def rows(spark):
    data = [
        (1, "alpha 42 beta", {"env": "dev", "secret": "hunter2", "code": "7"}, "info"),
        (2, "gamma", {"env": "prod", "code": "9"}, "error"),
        (3, "delta 7", None, "info"),
    ]
    return spark.createDataFrame(
        data, "id int, body string, attrs map<string,string>, level string"
    )


def _attrs(df):
    return {r.id: r.attrs for r in df.collect()}


def test_set_and_delete(rows):
    out = ottl(
        rows,
        '''
        set(attrs["team"], "core") where level == "error"
        delete_key(attrs, "secret")
        ''',
    )
    a = _attrs(out)
    assert a[1] == {"env": "dev", "code": "7"}
    assert a[2] == {"env": "prod", "code": "9", "team": "core"}
    assert a[3] is None  # null map stays null (optional-column semantics)


def test_set_creates_entry_on_null_map(rows):
    """OTTL set() on a missing/NULL map creates the entry (map_concat on
    NULL would otherwise silently no-op) — while delete/filter editors
    leave a NULL map NULL."""
    out = ottl(rows, 'set(attrs["env"], "prod")')
    a = _attrs(out)
    assert a[3] == {"env": "prod"}  # was NULL: entry created
    assert a[1]["env"] == "prod"    # existing key overwritten
    assert a[1]["code"] == "7"      # other keys intact
    # conditional set that does NOT match keeps NULL
    skipped = ottl(rows, 'set(attrs["env"], "prod") where level == "error"')
    assert _attrs(skipped)[3] is None


def test_set_column_conditional(rows):
    out = ottl(rows, 'set(body, "redacted") where level == "error"')
    got = {r.id: r.body for r in out.collect()}
    assert got == {1: "alpha 42 beta", 2: "redacted", 3: "delta 7"}


def test_keep_and_matching_keys(rows):
    out = ottl(rows, 'keep_keys(attrs, ["env", "code"])')
    assert _attrs(out)[1] == {"env": "dev", "code": "7"}
    out2 = ottl(rows, 'delete_matching_keys(attrs, "^sec")')
    assert "secret" not in (_attrs(out2)[1] or {})
    out3 = ottl(rows, 'keep_matching_keys(attrs, "^c")')
    assert _attrs(out3)[2] == {"code": "9"}


def test_replace_truncate_limit(rows):
    # statement-language escaping: "\\d+" in OTTL source is regex \d+
    out = ottl(rows, r'replace_pattern(body, "\\d+", "#")')
    assert {r.id: r.body for r in out.collect()}[1] == "alpha # beta"

    out2 = ottl(rows, "truncate_all(attrs, 3)")
    assert _attrs(out2)[1]["secret"] == "hun"

    out3 = ottl(rows, "limit(attrs, 2)")
    assert set(_attrs(out3)[1]) == {"code", "env"}  # smallest keys kept

    out4 = ottl(rows, 'replace_all_patterns(attrs, "[aeiou]", "_")')
    assert _attrs(out4)[1]["env"] == "d_v"


def test_drop_keep(rows):
    assert ottl(rows, 'drop() where level == "error"').count() == 2
    assert ottl(rows, 'keep() where level == "error"').count() == 1


def test_where_inside_string_not_split(rows):
    out = ottl(rows, 'set(attrs["note"], "see where it goes")')
    assert _attrs(out)[1]["note"] == "see where it goes"


def test_program_is_single_narrow_stage(rows):
    """A whole OTTL program must stay shuffle-free (one fused projection
    chain — the attributes-processor execution shape)."""
    out = ottl(
        rows,
        '''
        set(attrs["team"], "core") where level == "error"
        delete_key(attrs, "secret")
        truncate_all(attrs, 8)
        drop() where level == "info"
        ''',
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_errors():
    with pytest.raises(OttlError):
        ottl(None, "drop()")  # drop-everything guard
    with pytest.raises(OttlError):
        ottl(None, "frobnicate(attrs)")
    with pytest.raises(OttlError):
        ottl(None, 'set(attrs["k"])')
    with pytest.raises(OttlError):
        ottl(None, 'delete_key(attrs, 42)')
    with pytest.raises(OttlError):
        ottl(None, 'keep_keys(attrs, "not-a-list")')


def test_ottl_converters(rows):
    """OTTL converters (Concat/Int/Double/String/Len/IsMatch) in values
    and where-clauses, incl. bare list literals."""
    out = ottl(
        rows,
        '''
        set(attrs["joined"], Concat([attrs["env"], attrs["code"]], "-"))
        set(attrs["n"], String(Int(attrs["code"]) + 1))
        drop() where not(IsMatch(body, "^[a-z]"))
        ''',
    )
    a = _attrs(out)
    assert a[1]["joined"] == "dev-7" and a[1]["n"] == "8"
    assert out.count() == 3  # all bodies start lowercase

    kept = ottl(rows, 'keep() where Len(body) > 6')
    assert {r.id for r in kept.collect()} == {1, 3}
