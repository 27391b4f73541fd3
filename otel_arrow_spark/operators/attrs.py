"""Attribute-table (EAV) and map-column transforms.

The reference stores attributes as tall-skinny EAV tables
(``parent_id, key, type, str/int/double/bool/bytes/ser``,
`docs/data_model.md:296-306`) and transforms them vectorized:

- attributes processor rename/delete across domains
  (`crates/otap/src/attributes_processor.rs:4-30`, Action enum `:67-110`;
  Arrow kernel `rust/otel-arrow-rust/src/otap/transform.rs:498-560`,
  `transform_attributes` `:790`);
- OTTL-style Set/Remove/Move field writes
  (`expressions/src/transform_expressions.rs:7-28,82,142,191`);
- map reductions RemoveMapKeys/ReduceMap/RenameMapKeys
  (`transform_expressions.rs:251-300,374-455,582-656`).

Spark-side both representations are first-class:

- **EAV DataFrame** (one row per attribute): rename is a ``when`` over
  ``key``; delete is a filter — both whole-stage-codegen, zero shuffle.
- **MapType column** (denormalized): ``transform_keys`` / ``map_filter``
  / ``map_concat`` — also narrow.

Conversions between them (`explode_attrs` / `collect_attrs`) mirror the
reference's OTLP↔OTAP attribute encode/decode
(`go/pkg/otel/common/otlp/attributes.go:42-79`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# representation conversions
# ---------------------------------------------------------------------------

def explode_attrs(df: DataFrame, map_col: str = "attrs",
                  parent_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
                  ) -> DataFrame:
    """Map column → EAV rows (parent keys, key, value). Null/empty maps
    produce no rows (matching the reference's absent-attrs encoding)."""
    return df.select(
        *parent_cols, F.explode(F.col(map_col)).alias("key", "value")
    )


def collect_attrs(eav: DataFrame,
                  parent_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
                  ) -> DataFrame:
    """EAV rows → one map per parent (AttributesStore reconstruction).

    One shuffle on the parent key; ``map_from_entries`` builds the map
    from the grouped key/value structs.
    """
    return (
        eav.groupBy(*parent_cols)
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("key", "value")))
            ).alias("attrs")
        )
    )


# ---------------------------------------------------------------------------
# EAV transforms (attributes processor semantics)
# ---------------------------------------------------------------------------

def rename_keys_eav(eav: DataFrame, renames: dict[str, str],
                    key_col: str = "key") -> DataFrame:
    """Rename attribute keys (`attributes_processor.rs` Action::Rename).

    Vectorized ``when`` chain over the key column — the Spark analog of
    the reference's dictionary-aware Arrow rename kernel
    (`transform.rs:498-560`), which only rewrites the dictionary values;
    Parquet dictionary encoding gives the same effect at the storage
    layer for free.
    """
    c: Column = F.col(key_col)
    out = c
    for old, new in renames.items():
        out = F.when(c == old, F.lit(new)).otherwise(out)
    return eav.withColumn(key_col, out)


def delete_keys_eav(eav: DataFrame, keys: list[str],
                    key_col: str = "key") -> DataFrame:
    """Drop attributes by key (Action::Delete) — a pushdown-able filter."""
    return eav.filter(~F.col(key_col).isin(*keys))


def keep_keys_eav(eav: DataFrame, keys: list[str],
                  key_col: str = "key") -> DataFrame:
    """Retain-only semantics (RemoveMapKeys keep-list,
    `transform_expressions.rs:251-300`)."""
    return eav.filter(F.col(key_col).isin(*keys))


# ---------------------------------------------------------------------------
# map-column transforms
# ---------------------------------------------------------------------------

def rename_map_keys(m: Column, renames: dict[str, str]) -> Column:
    """RenameMapKeys on a MapType column (`transform_expressions.rs:582-656`)."""
    def _map(k: Column) -> Column:
        out = k
        for old, new in renames.items():
            out = F.when(k == old, F.lit(new)).otherwise(out)
        return out

    return F.transform_keys(m, lambda k, _v: _map(k))


def remove_map_keys(m: Column, keys: list[str], retain: bool = False) -> Column:
    """RemoveMapKeys remove-list / keep-list (`transform_expressions.rs:251-300`)."""
    if retain:
        return F.map_filter(m, lambda k, _v: k.isin(*keys))
    return F.map_filter(m, lambda k, _v: ~k.isin(*keys))


def reduce_map(m: Column, predicate) -> Column:
    """ReduceMap: keep entries where predicate(key, value)
    (`transform_expressions.rs:374-455`)."""
    return F.map_filter(m, predicate)


# ---------------------------------------------------------------------------
# OTTL-style field writes on top-level / struct columns
# ---------------------------------------------------------------------------

def set_field(df: DataFrame, path: str, value: Column) -> DataFrame:
    """Set (upsert) a field (`transform_expressions.rs:82`). Dotted paths
    write struct fields via ``withField``."""
    if "." in path:
        root, rest = path.split(".", 1)
        return df.withColumn(root, F.col(root).withField(rest, value))
    return df.withColumn(path, value)


def remove_field(df: DataFrame, path: str) -> DataFrame:
    """Remove a field (`transform_expressions.rs:142`)."""
    if "." in path:
        root, rest = path.split(".", 1)
        return df.withColumn(root, F.col(root).dropFields(rest))
    return df.drop(path)


def move_field(df: DataFrame, src: str, dst: str) -> DataFrame:
    """Move = copy + remove (`transform_expressions.rs:191`)."""
    src_col = F.col(src) if "." not in src else F.col(src.split(".", 1)[0]).getField(
        src.split(".", 1)[1]
    )
    return remove_field(set_field(df, dst, src_col), src)


def attach_records(parsed: DataFrame) -> DataFrame:
    """Attach resource/scope records as struct columns over parsed turns.

    The reference scopes accessor paths to attached records —
    ``resource.Attributes['service.name']`` resolves against the record
    attached to the row, not the row itself
    (`rust/experimental/query_engine/expressions/src/value_accessor.rs`,
    summarize group-by over attached accessors
    `kql-parser/src/tabular_expressions.rs:350-490`). Here the attached
    records are struct columns with an ``attributes`` map field, so the
    KQL parser's dotted-path + ``['key']`` accessors compile straight to
    ``getField``/``getItem`` — Catalyst prunes unused fields.

    resource ≙ origin host (host.name, service.facility);
    scope ≙ emitting app (app.name, format).
    """
    # Keys are always present (values may be NULL): under ANSI mode a
    # map[key] access on a MISSING key raises, while a NULL value is the
    # faithful optional-column semantic (`docs/otap_basics.md:87-88`).
    res_attrs = F.create_map(
        F.lit("host.name"), F.col("host"),
        F.lit("service.facility"), F.col("facility").cast("string"),
    )
    scope_attrs = F.create_map(
        F.lit("app.name"), F.col("app"),
        F.lit("format"), F.col("format"),
    )
    return parsed.withColumns(
        {
            "resource": F.struct(res_attrs.alias("attributes")),
            "scope": F.struct(scope_attrs.alias("attributes")),
        }
    )
