"""Debug marshalers: human-readable rendering of parsed turns.

Analog of the reference's debug processor marshalers
(`crates/otap/src/debug_processor/{normal_marshaler,detailed_marshaler}.rs`):
`normal` = one compact line per record; `detailed` = every field spelled
out. Pure narrow projections (codegen string concat), so "debug output"
is just another column — write it to a logging sink or `show()` it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def marshal_normal(parsed: DataFrame) -> DataFrame:
    """Compact: `<format> sev=<severity> <host>/<app>: <body>`."""
    line = F.concat_ws(
        " ",
        F.col("format"),
        F.concat(F.lit("sev="), F.coalesce(F.col("severity").cast("string"), F.lit("-"))),
        F.concat(
            F.coalesce(F.col("host"), F.lit("-")),
            F.lit("/"),
            F.coalesce(F.col("app"), F.lit("-")),
            F.lit(":"),
        ),
        F.coalesce(F.col("body"), F.lit("")),
    )
    return parsed.select("conv_id", "turn_idx", line.alias("line"))


def marshal_detailed(parsed: DataFrame) -> DataFrame:
    """One `field=value` pair per line fragment, nulls shown as `-`."""
    fields = ["format", "facility", "severity", "host", "app", "event_name"]
    frags = [
        F.concat(F.lit(f"{f}="), F.coalesce(F.col(f).cast("string"), F.lit("-")))
        for f in fields
    ]
    return parsed.select(
        "conv_id", "turn_idx", F.concat_ws(" ", *frags).alias("detail")
    )
