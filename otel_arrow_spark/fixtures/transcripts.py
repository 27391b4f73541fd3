"""Deterministic synthetic transcript + lookup-catalog generator.

Mirrors the reference's test-data strategy — seeded randomized records with
deliberately missing/edge-case fields plus malformed inputs for chaos tests
(`/root/reference/docs/validation_process.md:12-21`,
`go/pkg/datagen/logs.go:31-58`, `go/pkg/otel/logs/validation_test.go:58-71`)
— materialized as the transcripts table shape required by BASELINE.json:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)``.

The ``text`` column carries syslog/CEF-flavored lines so the parse stage
mirrors the reference's RFC3164/RFC5424/CEF auto-detection
(`crates/otap/src/syslog_cef_receiver/parser/mod.rs:48-100`):

    V1 rfc5424: <PRI>1 ISO_TS HOST APP PROCID MSGID [kv@0 k="v" ...] BODY
    V2 rfc3164: <PRI>Mon DD HH:MM:SS HOST TAG: BODY
    V3 cef:     CEF:0|VENDOR|PRODUCT|VER|CLASS|NAME|SEV|k=v k=v ...
    malformed:  junk / empty / unicode chaff (must never crash the parser)

Generation is fully vectorized (numpy) and deterministic for a given
(n_rows, seed): same inputs → byte-identical table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42
BASE_TS = np.datetime64("2026-08-16T00:00:00", "us")
ROLES = np.array(["user", "assistant", "system", "tool"])
ROLE_P = np.array([0.35, 0.35, 0.10, 0.20])
N_TOOLS = 50
MEGA_CONVS = 3          # mega-conversations for skew/salting tests
MEGA_FRAC = 0.05        # each holds ~5% of all rows
BODY_WORDS = np.array(
    "alpha beta gamma delta retry timeout flush commit scan probe merge "
    "route batch spill shuffle salt window lineage offset checkpoint".split()
)
EVENT_NAMES = np.array(
    ["metric.cpu", "metric.mem", "metric:latency", "user.login", "tool.call",
     "span.start", "span.end", "log.app", "http.request", "db.query"]
)
CEF_NAMES = np.array(["PortScan", "AuthFail", "DiskFull", "CacheMiss", "RateLimit"])


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def gen_tool_catalog() -> pd.DataFrame:
    """~50-row lookup table; broadcast-join enrich target.

    Analog of the reference's attribute-dictionary stores
    (`go/pkg/otel/common/otlp/attributes.go:42-79`). Includes one row
    (``tool-unused``) never referenced by any transcript.
    """
    ids = [f"tool-{i}" for i in range(N_TOOLS)] + ["tool-unused"]
    kinds = ["search", "code", "browser", "math", "db"]
    vendors = ["acme", "globex", "initech"]
    tiers = ["gold", "silver", "bronze"]
    return pd.DataFrame(
        {
            "tool_id": ids,
            "tool_kind": [kinds[i % len(kinds)] for i in range(len(ids))],
            "vendor": [vendors[i % len(vendors)] for i in range(len(ids))],
            "sla_tier": [tiers[i % len(tiers)] for i in range(len(ids))],
        }
    )


def gen_role_catalog() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "role": ["user", "assistant", "system", "tool"],
            "role_group": ["human", "model", "control", "machine"],
            "is_human": [True, False, False, False],
        }
    )


def gen_transcripts_pdf(n_rows: int, seed: int = SEED) -> pd.DataFrame:
    """Generate the transcripts table as a pandas DataFrame.

    Row order in the result is shuffled (out of (conv_id, turn_idx) order)
    to exercise the stable re-ordering invariant.
    """
    rng = _rng(seed)
    n_convs = max(n_rows // 20, 1)

    # --- conversation assignment: 3 mega-convs (~5% of rows each) + uniform rest
    mega_rows = int(n_rows * MEGA_FRAC) if n_rows >= 200 else 0
    conv_of_row = np.empty(n_rows, dtype=np.int64)
    pos = 0
    for m in range(MEGA_CONVS if mega_rows else 0):
        conv_of_row[pos : pos + mega_rows] = m
        pos += mega_rows
    conv_of_row[pos:] = rng.integers(MEGA_CONVS, MEGA_CONVS + n_convs, size=n_rows - pos)

    # contiguous turn_idx per conv: sort rows by conv, cumcount, keep stable
    order = np.argsort(conv_of_row, kind="stable")
    sorted_conv = conv_of_row[order]
    # cumcount within each conv (vectorized run-length trick)
    change = np.r_[True, sorted_conv[1:] != sorted_conv[:-1]]
    run_starts = np.flatnonzero(change)
    cum = np.arange(n_rows) - np.repeat(run_starts, np.diff(np.r_[run_starts, n_rows]))
    turn_idx = np.empty(n_rows, dtype=np.int32)
    turn_idx[order] = cum.astype(np.int32)

    conv_id = np.char.add("conv-", np.char.zfill(conv_of_row.astype("U8"), 8))

    # --- roles & tools
    role = ROLES[rng.choice(len(ROLES), size=n_rows, p=ROLE_P)]
    tool_num = rng.integers(0, N_TOOLS, size=n_rows)
    dangling = rng.random(n_rows) < 0.01  # ~1% ids absent from the catalog
    tool_str = np.where(
        dangling, np.char.add("tool-9", tool_num.astype("U4")), np.char.add("tool-", tool_num.astype("U4"))
    )
    tool = np.where(role == "tool", tool_str, None)

    # --- timestamps: monotone non-decreasing per conv, spanning >= 3 hours
    conv_start_s = (conv_of_row * 2654435761 % (6 * 3600)).astype("int64")
    step_s = rng.integers(0, 90, size=n_rows).astype("int64")
    sorted_steps = step_s[order]
    cum_steps = np.cumsum(sorted_steps)
    base_per_run = np.repeat(cum_steps[run_starts] - sorted_steps[run_starts], np.diff(np.r_[run_starts, n_rows]))
    within = cum_steps - base_per_run
    offset_s = np.empty(n_rows, dtype="int64")
    offset_s[order] = within
    ts = BASE_TS + ((conv_start_s + offset_s) * 1_000_000).astype("timedelta64[us]")

    # --- text lines
    variant = rng.choice(5, size=n_rows, p=[0.40, 0.27, 0.24, 0.04, 0.05])
    # 0=v1 rfc5424, 1=v2 rfc3164, 2=v3 cef, 3=malformed junk, 4=edge cases
    pri = rng.integers(0, 192, size=n_rows)
    host = np.char.add("host-", (conv_of_row % 16).astype("U3"))
    app = np.char.add("app-", (tool_num % 7).astype("U2"))
    body = np.char.add(
        np.char.add(BODY_WORDS[rng.integers(0, len(BODY_WORDS), n_rows)], " "),
        BODY_WORDS[rng.integers(0, len(BODY_WORDS), n_rows)],
    )
    msgid = EVENT_NAMES[rng.integers(0, len(EVENT_NAMES), n_rows)]
    kv_a = rng.integers(0, 100, size=n_rows).astype("U3")
    kv_b = BODY_WORDS[rng.integers(0, len(BODY_WORDS), n_rows)]

    ts_iso = np.datetime_as_string(ts, unit="ms")
    ts_iso = np.char.add(ts_iso, "Z")

    v1 = np.char.add(
        np.char.add(
            np.char.add(np.char.add("<", pri.astype("U3")), ">1 "),
            np.char.add(ts_iso, " "),
        ),
        np.char.add(
            np.char.add(np.char.add(host, " "), np.char.add(app, " ")),
            np.char.add(
                np.char.add(
                    np.char.add((1000 + tool_num).astype("U5"), " "),
                    np.char.add(msgid, ' [kv@0 code="'),
                ),
                np.char.add(
                    np.char.add(kv_a, '" unit="'),
                    np.char.add(kv_b, np.char.add('"] ', body)),
                ),
            ),
        ),
    )

    # v2 rfc3164: month/day derived from ts (fixed month here; parse doesn't need real date math)
    hhmmss = np.char.partition(ts_iso, "T")[:, 2]
    hhmmss = np.char.partition(hhmmss, ".")[:, 0]
    v2 = np.char.add(
        np.char.add(np.char.add("<", pri.astype("U3")), ">Aug 16 "),
        np.char.add(
            np.char.add(hhmmss, " "),
            np.char.add(np.char.add(host, " "), np.char.add(app, np.char.add(": ", body))),
        ),
    )

    cefname = CEF_NAMES[rng.integers(0, len(CEF_NAMES), n_rows)]
    v3 = np.char.add(
        np.char.add("CEF:0|OTelArrow|Engine|1.0|", np.char.add((100 + pri).astype("U3"), "|")),
        np.char.add(
            np.char.add(cefname, "|"),
            np.char.add(
                np.char.add((pri % 10).astype("U2"), "|src="),
                np.char.add(host, np.char.add(" act=", kv_b)),
            ),
        ),
    )

    junk = np.char.add("?? junk ", np.char.add(kv_b, np.char.add(" !! ", kv_a)))

    # Assemble into an object array: avoids numpy fixed-width (U16000) blowup
    # for the few very-long edge rows.
    text = np.empty(n_rows, dtype=object)
    text[variant == 0] = v1[variant == 0]
    text[variant == 1] = v2[variant == 1]
    text[variant == 2] = v3[variant == 2]
    text[variant == 3] = junk[variant == 3]

    # edge rows: cycle through empty / unicode-v1 / very long / embedded quotes
    edge_idx = np.flatnonzero(variant == 4)
    edge_kind = rng.integers(0, 4, size=n_rows)
    long_body = "x" * 9000
    uni_body = "παράδειγμα éü ☃ \"quoted\" \t tab"
    for i in edge_idx:
        k = edge_kind[i]
        if k == 0:
            text[i] = ""
        elif k == 1:
            text[i] = str(v1[i]).split("] ", 1)[0] + "] " + uni_body
        elif k == 2:
            text[i] = str(v1[i]).split("] ", 1)[0] + "] " + long_body
        else:
            text[i] = "plain 'text' with \"quotes\" " + str(kv_b[i])

    pdf = pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": pd.array(tool, dtype="string"),
            "ts": ts,
        }
    )
    # shuffle storage order (stable-reorder invariant test)
    perm = rng.permutation(n_rows)
    pdf = pdf.iloc[perm].reset_index(drop=True)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf


def write_fixture_tables(root: str, n_rows: int, seed: int = SEED) -> dict[str, str]:
    """Write transcripts + catalogs as parquet under ``root``; returns paths."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(root, exist_ok=True)
    out = {}
    schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )
    # Many part files (≥64 for big fixtures) so the Spark scan gets
    # enough input splits to feed every core — a single fat file with
    # 1M-row row groups serializes the read stage.
    chunk = min(1_000_000, max(n_rows // 64, 31_250))
    path = os.path.join(root, "transcripts.parquet")
    if os.path.isdir(path):
        import shutil

        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    done = 0
    part = 0
    while done < n_rows:
        n = min(chunk, n_rows - done)
        pdf = gen_transcripts_pdf(n, seed + part)
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
            os.path.join(path, f"part-{part:05d}.parquet"),
            compression="zstd",
            row_group_size=max(n // 4, 8192),
        )
        done += n
        part += 1
    out["transcripts"] = path
    for name, df in [("tool_catalog", gen_tool_catalog()), ("role_catalog", gen_role_catalog())]:
        p = os.path.join(root, f"{name}.parquet")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p, compression="zstd")
        out[name] = p
    return out
