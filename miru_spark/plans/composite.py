"""Tagged-union composite registry entries.

The driver records at most 50 registry entries per round; the engine has far
more individually-testable cases than that. A *composite* packs several
same-family cases into ONE driver entry: each member's result gets a
``case_tag`` column and the results are unioned (NULL-padding columns a
member doesn't produce), while the oracle side mirrors the union with
``UNION ALL`` branches over the members' own SQL. The driver's compare is
column-name-sorted and order-insensitive, so a composite is exactly as
strong as checking every member separately — one red VALUE anywhere in any
member flips the whole entry red.

Per-member granularity lives on in pytest (each member function is still
exercised individually there); composites exist purely so the driver
scoreboard can hold one green row per operator family.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (tag, query_fn, oracle_sql_or_None, output_column_names)
Member = tuple[str, Callable[[SparkSession, str], DataFrame], "str | None", Sequence[str]]


def _superset(members: Sequence[Member]) -> list[str]:
    """Union of member output columns, first-appearance order (must be
    deterministic and identical on the Spark and SQL sides)."""
    out: list[str] = []
    for _, _, _, cols in members:
        for c in cols:
            if c not in out:
                out.append(c)
    return out


def composite_query(members: Sequence[Member]):
    """Spark side: run every member, tag it, union by name with NULL padding."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        dfs = []
        for tag, fn, _, cols in members:
            df = fn(spark, sf_dir)
            if list(df.columns) != list(cols):
                raise AssertionError(
                    f"composite member {tag!r}: declared columns {list(cols)} "
                    f"!= actual {df.columns} (spec drifted from the query)"
                )
            dfs.append(df.select(F.lit(tag).alias("case_tag"), *cols))
        return reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
        )

    return run


def composite_oracle(members: Sequence[Member]) -> str | None:
    """SQL side: UNION ALL of the members' own oracles, each branch
    projecting the full column superset (NULL for columns the member lacks,
    typed by the owning member's branch via DuckDB's union type
    unification). Returns None iff EVERY member is rows-only; a mix would
    silently weaken the oracled members, so it is rejected."""
    sqls = [sql for _, _, sql, _ in members]
    if all(s is None for s in sqls):
        return None
    if any(s is None for s in sqls):
        tags = [t for t, _, s, _ in members if s is None]
        raise ValueError(
            f"composite mixes oracled and rows-only members ({tags}); "
            "split the rows-only cases into their own composite"
        )
    superset = _superset(members)
    branches = []
    for tag, _, sql, cols in members:
        cols = set(cols)
        proj = ", ".join(c if c in cols else f"NULL AS {c}" for c in superset)
        branches.append(
            f"SELECT '{tag}' AS case_tag, {proj}\nFROM (\n{sql.strip()}\n)"
        )
    return "\nUNION ALL\n".join(branches)


def register_composite(register, name: str, members: Sequence[Member]) -> None:
    register(name, composite_query(members), composite_oracle(members))
