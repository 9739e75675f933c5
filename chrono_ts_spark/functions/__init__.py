"""Expression helpers shared across queries and operators.

The central trick in this module is *decimal-exact aggregation*: the
driver hash-compares our results against DuckDB's, and floating-point
sums are order-dependent (Spark's parallel partial aggregation and
DuckDB's vectorized aggregation combine in different orders). Casting
the double inputs to DECIMAL first makes the sum exact and therefore
order-independent; casting the exact result back to DOUBLE is a
deterministic function of the value. Any further arithmetic (divides,
sqrt) then happens in IEEE double on bit-identical inputs on both
sides. See docs/determinism.md.

All helpers emit built-in Catalyst expressions — no UDFs — so they stay
inside whole-stage codegen and partial aggregation at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Decimal-exact aggregation
# ---------------------------------------------------------------------------


def dec(col: Column | str, prec: int = 18, scale: int = 6) -> Column:
    """Cast to a decimal wide enough for the fixture value domains.

    Overflow contract (r7 review): a value outside decimal(prec,scale)
    THROWS under ANSI mode (the Spark 4 default this repo runs under
    locally and in the driver) — loud, the desired behavior. Only a
    deliberately non-ANSI session would get the silent NULL-and-bias
    failure mode (SUM skips the NULL while davg's COUNT still counts
    the row); callers pick (prec, scale) generous for their domain so
    neither path triggers on valid data.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def dsum(col: Column | str, prec: int = 18, scale: int = 6) -> Column:
    """Order-independent SUM over a double column → double."""
    return F.sum(dec(col, prec, scale)).cast("double")


def davg(col: Column | str, prec: int = 18, scale: int = 6) -> Column:
    """Order-independent AVG: exact decimal sum ÷ exact count, in double."""
    return (F.sum(dec(col, prec, scale)).cast("double") / F.count(col).cast("double"))


def dsum_sq(col: Column | str, prec: int = 18, scale: int = 6) -> Column:
    """Order-independent SUM(x*x) → double (decimal multiply is exact)."""
    d = dec(col, prec, scale)
    return F.sum(d * d).cast("double")


# Mirrors of the above for the DuckDB oracle SQL text -----------------------


def sql_dsum(expr: str, prec: int = 18, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE)"


def sql_davg(expr: str, prec: int = 18, scale: int = 6) -> str:
    return (
        f"(CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE))"
    )


def sql_dsum_sq(expr: str, prec: int = 18, scale: int = 6) -> str:
    d = f"CAST({expr} AS DECIMAL({prec},{scale}))"
    return f"CAST(SUM({d} * {d}) AS DOUBLE)"


# ---------------------------------------------------------------------------
# Time bucketing (A6) — integer arithmetic on epoch micros, portable
# ---------------------------------------------------------------------------


def time_bucket(col: Column | str, width_seconds: int) -> Column:
    """Fixed-width tumbling bucket start as a TimestampType column.

    Integer division on epoch microseconds — deterministic, identical to
    the DuckDB mirror ``sql_time_bucket``. Epoch-aligned like
    ``F.window(...)``'s default, but cheaper to compare (no struct).
    """
    c = F.col(col) if isinstance(col, str) else col
    us = F.unix_micros(c)
    w = int(width_seconds) * 1_000_000
    return F.timestamp_micros((us - ((us % w) + w) % w))


def sql_time_bucket(expr: str, width_seconds: int) -> str:
    w = int(width_seconds) * 1_000_000
    us = f"epoch_us({expr})"
    return f"make_timestamp({us} - ((({us} % {w}) + {w}) % {w})"  + ")"


def ts_str(col: Column | str) -> Column:
    """Render a timestamp as 'yyyy-MM-dd HH:mm:ss' (µs-free outputs only)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


def sql_ts_str(expr: str) -> str:
    return f"strftime({expr}, '%Y-%m-%d %H:%M:%S')"


# ---------------------------------------------------------------------------
# Vector math over array<float> (X7) — higher-order functions, no UDFs
# ---------------------------------------------------------------------------


def vec_double(col: Column | str) -> Column:
    """array<float> → array<double> so accumulation runs in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def vec_dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + aggregate (sequential double adds)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def vec_norm_sq(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def vec_cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in pure double arithmetic.

    try_divide, not `/`: under Spark 4's default ANSI mode a plain
    double division THROWS DIVIDE_BY_ZERO (probed — even for doubles),
    so a single zero-norm vector would kill the whole job, while the
    DuckDB oracles' `/` yields NULL. try_divide returns NULL on a zero
    denominator, matching the oracle exactly: zero-norm rows sort last
    under ORDER BY cosine DESC in both engines (r7 review, sharpened).
    """
    return F.try_divide(vec_dot(a, b), F.sqrt(vec_norm_sq(a) * vec_norm_sq(b)))


def md5_u32(col: Column | str) -> Column:
    """First 32 md5 bits of a string column as an unsigned bigint in
    [0, 2^32) — the engine-portable hash family behind every *_md5
    oracle twin. MUST stay byte-identical to ``sql_md5_u32`` (the
    DuckDB rendering of the same idiom): both take the first 8 hex
    chars of md5 and parse them base-16. New twins should call these
    helpers; the pre-helper inline copies across queries/*.py are
    driver-proven frozen and intentionally left in place."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def sql_md5_u32(expr: str) -> str:
    """DuckDB twin of ``md5_u32`` — see its parity contract."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 8)) AS BIGINT)"
