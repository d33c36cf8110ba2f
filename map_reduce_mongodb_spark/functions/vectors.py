"""Vector column helpers for similarity search over embedding columns
(``array<float>``), built so Spark and the DuckDB oracle compute
BIT-IDENTICAL doubles:

The dot product / norm are generated as an UNROLLED left-associated sum
``cast(a[1]) * cast(b[1]) + cast(a[2]) * cast(b[2]) + ...`` — the same
IEEE-754 operation sequence in both engines, so no tolerance is needed
in comparisons. (A fold via ``F.aggregate`` would also be sequential,
but unrolling keeps the SQL oracle trivially identical and lets codegen
flatten it.) Elements are cast float→double BEFORE multiplying on both
sides.

For dims beyond a few hundred, prefer :func:`dot_fold` (aggregate-based,
same left-to-right order, smaller expression trees).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dot_terms(a: str, b: str, dim: int, el) -> str:
    """The ONE term/paren structure behind every dot variant — Spark
    and DuckDB renderings differ only in the element accessor ``el``
    (r9 review folded three verbatim copies in here: the bit-identical
    cross-engine contract is this op sequence, and independently
    edited copies could silently reassociate it)."""
    return " + ".join(
        f"CAST({el(a, i)} AS DOUBLE) * CAST({el(b, i)} AS DOUBLE)"
        for i in range(1, dim + 1)
    )


def dot_unrolled(a: str, b: str, dim: int) -> Column:
    """Left-associated unrolled dot product of two array<float> columns
    (1-based element_at, matching the SQL oracle's `arr[i]`).

    Built as ONE ``F.expr`` string: composing 64+ terms as Python
    Column arithmetic costs thousands of py4j round-trips per plan
    (measured ~20s of pure driver time for the ANN query); a single
    parsed SQL string is milliseconds and yields the identical tree."""
    return F.expr(_dot_spark_sql(a, b, dim))


def dot_unrolled_sql(a: str, b: str, dim: int) -> str:
    """The DuckDB-side twin of :func:`dot_unrolled` (DuckDB's ``arr[i]``
    is 1-based like element_at; the term/paren structure matches so the
    float op sequence is identical)."""
    return _dot_terms(a, b, dim, lambda c, i: f"{c}[{i}]")


def norm_sq_unrolled(a: str, dim: int) -> Column:
    return dot_unrolled(a, a, dim)


def norm_sq_unrolled_sql(a: str, dim: int) -> str:
    return dot_unrolled_sql(a, a, dim)


def _dot_spark_sql(a: str, b: str, dim: int) -> str:
    """Spark-SQL dot string — element_at (1-based) NOT `arr[i]`, which
    is 0-based in Spark but 1-based in DuckDB."""
    return _dot_terms(a, b, dim, lambda c, i: f"element_at({c}, {i})")


def cosine_unrolled(a: str, b: str, dim: int) -> Column:
    return F.expr(
        f"({_dot_spark_sql(a, b, dim)}) / "
        f"sqrt(({_dot_spark_sql(a, a, dim)}) * ({_dot_spark_sql(b, b, dim)}))")


def cosine_unrolled_sql(a: str, b: str, dim: int) -> str:
    return (f"({dot_unrolled_sql(a, b, dim)}) / "
            f"sqrt(({norm_sq_unrolled_sql(a, dim)}) * "
            f"({norm_sq_unrolled_sql(b, dim)}))")


def dot_fold(a: Column, b: Column) -> Column:
    """Fold-based dot product (for high dims / unknown dim): same
    left-to-right accumulation order as the unrolled form."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot_fold(a, a))


def jl_sign_matrix(dim: int = 64, k: int = 16) -> list[list[int]]:
    """Deterministic ±1 projection matrix for the sparse-free
    Achlioptas/JL random projection: sign (i, j) is derived from
    md5(f"{i}_{j}") at BUILD time, so both engines receive the same
    literal constants — no cross-engine hashing at query time."""
    import hashlib
    return [[1 if hashlib.md5(f"{i}_{j}".encode()).digest()[0] % 2 == 0
             else -1 for i in range(dim)] for j in range(k)]


def jl_component_sql(a: str, signs: list[int], scale: str) -> str:
    """One projected component as left-associated SQL: scale * (±a[1]
    ±a[2] ...), rendered with Spark's ``element_at``. The DuckDB twin
    substitutes ``a[i]`` indexing in the caller's oracle string (the
    term order is what matters for bit-identity, and it is shared)."""
    terms = []
    for i, s in enumerate(signs, start=1):
        op = "+" if s > 0 else "-"
        terms.append(f"{op} CAST(element_at({a}, {i}) AS DOUBLE)")
    return f"{scale} * (0 {' '.join(terms)})"


def jl_component_duck_sql(a: str, signs: list[int], scale: str) -> str:
    terms = []
    for i, s in enumerate(signs, start=1):
        op = "+" if s > 0 else "-"
        terms.append(f"{op} CAST({a}[{i}] AS DOUBLE)")
    return f"{scale} * (0 {' '.join(terms)})"
