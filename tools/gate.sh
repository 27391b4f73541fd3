#!/bin/bash
# Full local correctness gate — run before EVERY commit that touches
# queries, oracles, or any operator a gated query exercises.
#
# Replicates the driver's CORRECTNESS gate over ALL __spark_entry__
# queries (the driver samples; this does not): each Spark result is
# compared to its DuckDB oracle on row count, column names, and
# order-insensitive values at sf0.01.
#
# Usage: tools/gate.sh [sf_dir] [query ...]   (default /root/testdata/sf0.01)
set -e
cd "$(dirname "$0")/.."
exec python tools/check_entry.py "${1:-/root/testdata/sf0.01}" "${@:2}"
