"""Selinger join-order enumeration costed purely from ANALYZE
statistics — the CONSUMER of the planner-statistics readout set
(skew profile → equi-depth histogram → selectivity estimate →
histogram join-size estimate → persisted ANALYZE artifacts → THIS):
given a chain of tables and their join keys, enumerate the dynamic-
programming lattice of connected sub-plans (Selinger et al. 1979,
the System-R algorithm every cost-based optimizer descends from) and
pick, per subset, the cheapest split under the C_out cost model
(cost = Σ intermediate result sizes — the standard join-ordering
benchmark metric, Neumann & Radke ICDE 2018 use the same).

Everything is EXACT integer arithmetic so the chosen plan and every
cost hash across engines:

- per-edge join-size estimates are the histjoin operator's scaled-
  integer bucket terms (``n_a·n_b·10^6 DIV max(d_a, d_b)`` summed —
  an order-free integer);
- subset cardinalities compose by a CANONICAL right-extension
  recurrence with integer floor at each step::

      est(t_i..t_j) = est(t_i..t_{j-1}) · est6(e_{j-1})
                      DIV (10^6 · rows(t_{j-1}))

  (the |t_j| factor of the textbook selectivity product cancels
  against est6's denominator) — both engines floor at the same
  points, so the integers agree bit for bit;
- DP: cost(single) = 0, cost(S) = min over chain cuts of
  cost(left) + cost(right) + est(S), ties broken by the SMALLEST cut
  index (stated as an ordered CASE chain in the restatement).

The planner touches the base tables only for the bounded ANALYZE
aggregates (≤ n_buckets rows per table side + one count per table) —
at 100 TB those statistics are computed once by the `--analyze` pass
and served from parquet; the DP itself is driver-side arithmetic
over a few dozen integers, exactly where a real optimizer runs it.

Chains only (the common FK-path shape; connected subsets of a chain
are intervals, so the lattice is O(k²) with O(k) splits each).
Bushy plans over general graphs reduce to the same recurrences with
a subset lattice — out of scope here.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000


def _materialize_ctes(ctes: str) -> str:
    """Mark every generated CTE MATERIALIZED: the join-order
    restatements are DAGs of tiny scalar CTEs referenced from many
    cost alternatives, and DuckDB INLINES plain CTEs per reference —
    at the snowflake form's fan-in (cost CTEs referencing cost/est/
    arm-DP subtrees, plus the executor leg referencing the final plan
    CTE a second time) inlining turns a few-dozen-row computation into
    minutes of planner/executor blowup.  Every definition here is
    uncorrelated, so materialization is semantics-preserving."""
    return re.sub(r"(\w) AS \(", r"\1 AS MATERIALIZED (", ctes)


def _check_labels(names: list[str]) -> None:
    """Interval labels are bare name concatenations; distinct intervals
    must not collide (names like ['ab','c','a','bc'] would both label
    'abc'), because the labels are CTE names in the restatement and the
    output's subset keys."""
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate table names: {names}")
    k = len(names)
    labels = [
        "".join(names[i : j + 1]) for i in range(k) for j in range(i, k)
    ]
    if len(set(labels)) != len(labels):
        raise ValueError(
            f"interval labels collide for names {names}; use short names "
            f"whose concatenations are unambiguous"
        )


def _check_star_labels(fname: str, dim_names: list[str]) -> None:
    """The star form labels ARBITRARY dim subsets (fname + input-order
    concatenation over each mask), not just contiguous intervals, so
    the interval check misses non-contiguous collisions (e.g. dims
    ['a','zz','b','ab']: subsets {a,b} and {ab} both label 'fab') —
    which would duplicate subset keys in the Spark output and CTE
    names (a hard binder error) in the SQL restatement.  Enumerate
    every subset label and reject duplicates."""
    names = [fname] + dim_names
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate table names: {names}")
    k = len(dim_names)
    if k > 16:
        raise ValueError(f"too many dimensions for subset enumeration: {k}")
    labels = [
        fname
        + "".join(dim_names[i] for i in range(k) if mask & (1 << i))
        for mask in range(1, 1 << k)
    ]
    if len(set(labels)) != len(labels):
        raise ValueError(
            f"star subset labels collide for dims {dim_names}; use short "
            f"names whose subset concatenations are unambiguous"
        )


def _edge_est6(
    a: DataFrame, key_a: str, b: DataFrame, key_b: str, n_buckets: int
) -> int:
    """The edge's scaled-integer join-size estimate Σ n_a·n_b·10^6 DIV
    max(d_a, d_b) over shared buckets — computed from the SAME
    per-table bucket statistics ``analyze_key_stats`` persists, here
    collected (≤ n_buckets rows per side) and folded in exact Python
    integers.  Empty edges estimate 0.

    One driver action per edge: the shared [lo, hi] domain rides as a
    broadcast 1-row aggregate and both sides' bucket stats come back
    in a single side-tagged collect — same clamp/bucket arithmetic as
    ``analyze_key_stats`` (BIGINT column refs instead of literals), so
    the per-bucket (n, d) integers are identical to the three-action
    form this replaces (domain .first() + two stats collects, the
    dominant eager build cost of the join-order planning slot)."""
    keys = (
        a.filter(F.col(key_a).isNotNull())
        .select(F.col(key_a).cast("long").alias("__k"),
                F.lit(0).alias("__side"))
        .unionByName(
            b.filter(F.col(key_b).isNotNull())
            .select(F.col(key_b).cast("long").alias("__k"),
                    F.lit(1).alias("__side"))
        )
    )
    dom = keys.agg(F.min("__k").alias("__lo"), F.max("__k").alias("__hi"))
    rows = (
        keys.crossJoin(F.broadcast(dom))
        .select(
            "__side",
            "__k",
            F.expr(
                f"CAST((GREATEST(__lo, LEAST(__hi, __k)) - __lo)"
                f" * {n_buckets} DIV (__hi - __lo + 1) AS INT)"
            ).alias("bucket"),
        )
        .groupBy("__side", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count_distinct(F.col("__k")).cast("long").alias("d"),
        )
        .collect()
    )
    sa = {r["bucket"]: (r["n"], r["d"]) for r in rows if r["__side"] == 0}
    sb = {r["bucket"]: (r["n"], r["d"]) for r in rows if r["__side"] == 1}
    total = 0
    for bkt in set(sa) & set(sb):
        n_a, d_a = sa[bkt]
        n_b, d_b = sb[bkt]
        if max(d_a, d_b) > 0:
            total += (n_a * n_b * _SCALE) // max(d_a, d_b)
    return total


def chain_plan_dp(
    rows: list[int], est6: list[int]
) -> tuple[
    dict[tuple[int, int], int],
    dict[tuple[int, int], int],
    dict[tuple[int, int], int],
]:
    """The pure-integer chain DP over precomputed statistics — the
    arithmetic heart of :func:`chain_join_plan`, exposed so the
    EXECUTOR (operators/joinexec.py) consumes the identical (est,
    cost, split) the hashed plan rows state.  ``rows[i]`` is table i's
    cardinality; ``est6[i]`` is edge i's scaled-integer estimate.

    Returns ``(est, cost, split)`` keyed by interval (i, j)."""
    k = len(rows)
    est: dict[tuple[int, int], int] = {(i, i): rows[i] for i in range(k)}
    for j in range(1, k):
        for i in range(j - 1, -1, -1):
            if i == j - 1:
                est[(i, j)] = est6[i] // _SCALE
            elif rows[j - 1] == 0:
                # an empty bridge table empties every superset; the
                # recurrence's denominator would divide by zero
                est[(i, j)] = 0
            else:
                est[(i, j)] = (est[(i, j - 1)] * est6[j - 1]) // (
                    _SCALE * rows[j - 1]
                )
    cost: dict[tuple[int, int], int] = {(i, i): 0 for i in range(k)}
    split: dict[tuple[int, int], int] = {}
    for length in range(2, k + 1):
        for i in range(0, k - length + 1):
            j = i + length - 1
            best, best_cut = None, None
            for cut in range(i, j):
                c = cost[(i, cut)] + cost[(cut + 1, j)] + est[(i, j)]
                if best is None or c < best:  # strict: smallest cut wins ties
                    best, best_cut = c, cut
            cost[(i, j)] = best
            split[(i, j)] = best_cut
    return est, cost, split


def chain_join_stats(
    tables: list[tuple[str, DataFrame]],
    edges: list[tuple[str, str]],
    n_buckets: int = 16,
    edge_est6=None,
    count_fn=None,
) -> tuple[list[int], list[int]]:
    """Collect the (rows, est6) statistics the chain DP runs on — one
    count per table plus one :func:`_edge_est6` per edge.  ``edge_est6``
    optionally overrides the estimator (e.g. a memoizing wrapper so a
    slot computing several plans over shared edges pays each edge
    once); ``count_fn(name, df)`` likewise overrides the row counter
    (a memoizing wrapper where several planners share tables)."""
    fn = edge_est6 or _edge_est6
    cnt = count_fn or (lambda _n, df: df.count())
    rows = [cnt(name, df) for name, df in tables]
    est6 = [
        fn(tables[i][1], ka, tables[i + 1][1], kb, n_buckets)
        for i, (ka, kb) in enumerate(edges)
    ]
    return rows, est6


def chain_join_plan(
    spark,
    tables: list[tuple[str, DataFrame]],
    edges: list[tuple[str, str]],
    n_buckets: int = 16,
    stats: tuple[list[int], list[int]] | None = None,
) -> DataFrame:
    """Run the DP over ``tables`` (chain order; (short_name, df)) and
    ``edges`` (``edges[i]`` = (key on tables[i], key on tables[i+1])).

    Returns one row per composite interval subset:
    ``(subset, plan, est_rows, best_cost, n_tables)`` where ``plan``
    is ``"<subset>=<left>+<right>"`` for the chosen split.
    ``stats`` optionally supplies precomputed (rows, est6) from
    :func:`chain_join_stats` so a caller that also EXECUTES the plan
    derives both from one statistics pass.
    """
    if len(edges) != len(tables) - 1 or len(tables) < 2:
        raise ValueError("need k tables and k-1 chain edges, k >= 2")
    names = [n for n, _ in tables]
    _check_labels(names)
    rows, est6 = stats or chain_join_stats(tables, edges, n_buckets)
    k = len(tables)

    def label(i: int, j: int) -> str:
        return "".join(names[i : j + 1])

    est, cost, split = chain_plan_dp(rows, est6)
    out = []
    for length in range(2, k + 1):
        for i in range(0, k - length + 1):
            j = i + length - 1
            cut = split[(i, j)]
            out.append(
                (
                    label(i, j),
                    f"{label(i, j)}={label(i, cut)}+{label(cut + 1, j)}",
                    est[(i, j)],
                    cost[(i, j)],
                    length,
                )
            )
    return spark.createDataFrame(
        out,
        "subset string, plan string, est_rows long, best_cost long,"
        " n_tables int",
    )


def star_subsets(k: int) -> list[tuple[int, ...]]:
    """Every non-empty dim subset in (size, lexicographic) order — the
    shared enumeration order of the Spark planner, the SQL generator,
    and the executor."""
    subsets = []
    for mask in range(1, 1 << k):
        subsets.append(tuple(i for i in range(k) if mask & (1 << i)))
    subsets.sort(key=lambda s: (len(s), s))
    return subsets


def star_plan_dp(
    rows_fact: int, est6: list[int]
) -> tuple[
    dict[tuple[int, ...], int],
    dict[tuple[int, ...], int],
    dict[tuple[int, ...], int],
]:
    """The pure-integer star DP over precomputed statistics (the
    executor-shared heart of :func:`star_join_plan`, like
    :func:`chain_plan_dp` for chains).  Returns ``(est, cost, peel)``
    keyed by dim-index subset; ``peel[s]`` is the dim joined LAST in
    subset ``s``'s cheapest left-deep plan."""
    k = len(est6)
    subsets = star_subsets(k)
    est: dict[tuple[int, ...], int] = {(): rows_fact}
    for s in subsets:
        prev = s[:-1]
        last = s[-1]
        if not prev:
            est[s] = est6[last] // _SCALE
        elif rows_fact == 0:
            est[s] = 0
        else:
            est[s] = (est[prev] * est6[last]) // (_SCALE * rows_fact)
    cost: dict[tuple[int, ...], int] = {(): 0}
    peel: dict[tuple[int, ...], int] = {}
    for s in subsets:
        best, best_d = None, None
        for d in s:  # input order; first dim wins ties (strict <)
            rest = tuple(i for i in s if i != d)
            c = cost[rest] + est[s]
            if best is None or c < best:
                best, best_d = c, d
        cost[s] = best
        peel[s] = best_d
    return est, cost, peel


def star_join_stats(
    fact: tuple[str, DataFrame],
    dims: list[tuple[str, DataFrame, str, str]],
    n_buckets: int = 16,
    edge_est6=None,
    count_fn=None,
) -> tuple[int, list[int]]:
    """(fact rows, per-dim est6) for the star DP; ``edge_est6`` /
    ``count_fn`` optionally override the estimator / row counter
    (memoizing wrappers)."""
    fn = edge_est6 or _edge_est6
    cnt = count_fn or (lambda _n, df: df.count())
    return (
        cnt(fact[0], fact[1]),
        [fn(fact[1], fk, ddf, dk, n_buckets) for _, ddf, fk, dk in dims],
    )


def star_join_plan(
    spark,
    fact: tuple[str, DataFrame],
    dims: list[tuple[str, DataFrame, str, str]],
    n_buckets: int = 16,
    stats: tuple[int, list[int]] | None = None,
) -> DataFrame:
    """The star-schema form of the DP — the warehouse shape chain
    plans don't cover: one fact table, k dimensions each joined to the
    fact on its own FK (dims share no edges, so every connected subset
    is fact + a dim subset and LEFT-DEEP enumeration is COMPLETE: any
    connected split must peel exactly one dimension).

    ``fact`` = (short_name, df); each dim = (short_name, df, fact_key,
    dim_key).  Cardinalities compose by the canonical INPUT-ORDER fold
    (each dim's |D| cancels against its est6 denominator, leaving
    ``est·est6_d DIV (10^6·|fact|)`` per added dim — floors at fixed
    points, both engines agree); cost is C_out with min-over-peeled-dim
    and first-dim-wins ties.  The chosen order therefore surfaces the
    classic optimizer readout: most-selective dimension first.

    Returns one row per non-empty dim subset:
    ``(subset, plan, est_rows, best_cost, n_tables)``.
    """
    if not dims:
        raise ValueError("need at least one dimension")
    fname, _fdf = fact
    _check_star_labels(fname, [d[0] for d in dims])
    rows_fact, est6 = stats or star_join_stats(fact, dims, n_buckets)
    k = len(dims)
    subsets = star_subsets(k)

    def lbl(subset: tuple[int, ...]) -> str:
        return fname + "".join(dims[i][0] for i in subset)

    est, cost, peel = star_plan_dp(rows_fact, est6)
    out = []
    for s in subsets:
        d = peel[s]
        rest = tuple(i for i in s if i != d)
        out.append(
            (
                lbl(s),
                f"{lbl(s)}={lbl(rest)}+{dims[d][0]}",
                est[s],
                cost[s],
                1 + len(s),
            )
        )
    return spark.createDataFrame(
        out,
        "subset string, plan string, est_rows long, best_cost long,"
        " n_tables int",
    )


def star_join_plan_sql(
    fact: tuple[str, str],
    dims: list[tuple[str, str, str, str]],
    n_buckets: int = 16,
    prefix: str = "so",
) -> str:
    """DuckDB restatement of :func:`star_join_plan` — same edge
    statistics, same input-order cardinality fold, same peel-one-dim
    DP with ordered-CASE tiebreak.  ``fact`` = (sql_table, short);
    dims = (sql_table, short, fact_key, dim_key).  Final CTE
    ``<prefix>plan(subset, plan, est_rows, best_cost, n_tables)``."""
    if not dims:
        raise ValueError("need at least one dimension")
    x = prefix
    ftable, fname = fact
    _check_star_labels(fname, [d[1] for d in dims])
    k = len(dims)
    ctes = [
        f"{x}nf AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM {ftable})"
    ]
    for i, (dtable, _s, fk, dk) in enumerate(dims):
        e = f"{x}e{i}"
        ctes.append(f"""{e}ka AS (
      SELECT CAST({fk} AS BIGINT) AS k FROM {ftable} WHERE {fk} IS NOT NULL),
    {e}kb AS (
      SELECT CAST({dk} AS BIGINT) AS k FROM {dtable} WHERE {dk} IS NOT NULL),
    {e}dom AS (
      SELECT min(k) AS lo, max(k) - min(k) + 1 AS span
      FROM (SELECT k FROM {e}ka UNION ALL SELECT k FROM {e}kb)),
    {e}ha AS (
      SELECT CAST((k - d.lo) * {n_buckets} // d.span AS INTEGER) AS bucket,
             CAST(count(*) AS BIGINT) AS n_a,
             CAST(count(DISTINCT k) AS BIGINT) AS d_a
      FROM {e}ka CROSS JOIN {e}dom d GROUP BY 1),
    {e}hb AS (
      SELECT CAST((k - d.lo) * {n_buckets} // d.span AS INTEGER) AS bucket,
             CAST(count(*) AS BIGINT) AS n_b,
             CAST(count(DISTINCT k) AS BIGINT) AS d_b
      FROM {e}kb CROSS JOIN {e}dom d GROUP BY 1),
    {e}t6 AS (
      SELECT CAST(COALESCE(SUM(
               CASE WHEN GREATEST(d_a, d_b) > 0
                    THEN (CAST(n_a AS HUGEINT) * n_b * {_SCALE})
                         // GREATEST(d_a, d_b)
                    ELSE 0 END), 0) AS HUGEINT) AS t6
      FROM {e}ha a JOIN {e}hb b USING (bucket))""")
    subsets = star_subsets(k)

    def lbl(subset: tuple[int, ...]) -> str:
        return fname + "".join(dims[i][1] for i in subset)

    for s in subsets:
        prev = s[:-1]
        last = s[-1]
        if not prev:
            expr = f"(SELECT t6 FROM {x}e{last}t6) // {_SCALE}"
        else:
            expr = (
                f"CASE WHEN (SELECT n FROM {x}nf) = 0 THEN 0 ELSE"
                f" (SELECT est FROM {x}est_{lbl(prev)})"
                f" * (SELECT t6 FROM {x}e{last}t6)"
                f" // ({_SCALE} * (SELECT n FROM {x}nf)) END"
            )
        ctes.append(
            f"{x}est_{lbl(s)} AS (SELECT CAST({expr} AS HUGEINT) AS est)"
        )
    for s in subsets:
        alts, plans = [], []
        for d in s:
            rest = tuple(i for i in s if i != d)
            left = (
                "CAST(0 AS HUGEINT)" if not rest
                else f"(SELECT cost FROM {x}cost_{lbl(rest)})"
            )
            alts.append(f"{left} + (SELECT est FROM {x}est_{lbl(s)})")
            plans.append(f"'{lbl(s)}={lbl(rest)}+{dims[d][1]}'")
        best = f"LEAST({', '.join(alts)})" if len(alts) > 1 else alts[0]
        if len(alts) == 1:
            plan_expr = plans[0]
        else:
            cases = []
            for ci in range(len(alts)):
                if ci == len(alts) - 1:
                    cases.append(f"ELSE {plans[ci]}")
                else:
                    conds = " AND ".join(
                        f"({alts[ci]}) <= ({alts[cj]})"
                        for cj in range(ci + 1, len(alts))
                    )
                    cases.append(f"WHEN {conds} THEN {plans[ci]}")
            plan_expr = f"CASE {' '.join(cases)} END"
        ctes.append(
            f"{x}cost_{lbl(s)} AS (SELECT CAST({best} AS HUGEINT) AS cost,"
            f" {plan_expr} AS plan)"
        )
    legs = []
    for s in subsets:
        sl = lbl(s)
        legs.append(
            f"SELECT '{sl}' AS subset,"
            f" (SELECT plan FROM {x}cost_{sl}) AS plan,"
            f" CAST((SELECT est FROM {x}est_{sl}) AS BIGINT) AS est_rows,"
            f" CAST((SELECT cost FROM {x}cost_{sl}) AS BIGINT) AS best_cost,"
            f" CAST({1 + len(s)} AS INTEGER) AS n_tables"
        )
    ctes.append(
        f"{x}plan AS (\n      " + "\n      UNION ALL ".join(legs) + ")"
    )
    return _materialize_ctes(",\n    ".join(ctes))


def chain_join_plan_sql(
    tables: list[tuple[str, str]],
    edges: list[tuple[str, str]],
    n_buckets: int = 16,
    prefix: str = "jo",
) -> str:
    """DuckDB restatement: per-edge shared-boundary bucket statistics
    (the histjoin arithmetic, HUGEINT products), the same canonical
    right-extension cardinality recurrence with ``//`` floors at the
    same points, and the DP unrolled over the interval lattice in
    topological order — split ties resolved by an ordered CASE chain
    (smallest cut first).  ``tables`` is (sql_table, short_name) in
    chain order.  Final CTE ``<prefix>plan(subset, plan, est_rows,
    best_cost, n_tables)``."""
    if len(edges) != len(tables) - 1 or len(tables) < 2:
        raise ValueError("need k tables and k-1 chain edges, k >= 2")
    x = prefix
    names = [s for _, s in tables]
    _check_labels(names)
    k = len(tables)
    ctes = []
    for t, s in tables:
        ctes.append(
            f"{x}n_{s} AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM {t})"
        )
    for i, (ka, kb) in enumerate(edges):
        ta, sa = tables[i]
        tb, sb = tables[i + 1]
        e = f"{x}e{i}"
        ctes.append(f"""{e}ka AS (
      SELECT CAST({ka} AS BIGINT) AS k FROM {ta} WHERE {ka} IS NOT NULL),
    {e}kb AS (
      SELECT CAST({kb} AS BIGINT) AS k FROM {tb} WHERE {kb} IS NOT NULL),
    {e}dom AS (
      SELECT min(k) AS lo, max(k) - min(k) + 1 AS span
      FROM (SELECT k FROM {e}ka UNION ALL SELECT k FROM {e}kb)),
    {e}ha AS (
      SELECT CAST((k - d.lo) * {n_buckets} // d.span AS INTEGER) AS bucket,
             CAST(count(*) AS BIGINT) AS n_a,
             CAST(count(DISTINCT k) AS BIGINT) AS d_a
      FROM {e}ka CROSS JOIN {e}dom d GROUP BY 1),
    {e}hb AS (
      SELECT CAST((k - d.lo) * {n_buckets} // d.span AS INTEGER) AS bucket,
             CAST(count(*) AS BIGINT) AS n_b,
             CAST(count(DISTINCT k) AS BIGINT) AS d_b
      FROM {e}kb CROSS JOIN {e}dom d GROUP BY 1),
    {e}t6 AS (
      SELECT CAST(COALESCE(SUM(
               CASE WHEN GREATEST(d_a, d_b) > 0
                    THEN (CAST(n_a AS HUGEINT) * n_b * {_SCALE})
                         // GREATEST(d_a, d_b)
                    ELSE 0 END), 0) AS HUGEINT) AS t6
      FROM {e}ha a JOIN {e}hb b USING (bucket))""")

    def lbl(i: int, j: int) -> str:
        return "".join(names[i : j + 1])

    # cardinality recurrence CTEs in topological (length) order
    for length in range(2, k + 1):
        for i in range(0, k - length + 1):
            j = i + length - 1
            if length == 2:
                expr = f"(SELECT t6 FROM {x}e{i}t6) // {_SCALE}"
            else:
                # empty-bridge guard mirrors the Python recurrence
                expr = (
                    f"CASE WHEN (SELECT n FROM {x}n_{names[j - 1]}) = 0"
                    f" THEN 0 ELSE"
                    f" (SELECT est FROM {x}est_{lbl(i, j - 1)})"
                    f" * (SELECT t6 FROM {x}e{j - 1}t6)"
                    f" // ({_SCALE} * (SELECT n FROM {x}n_{names[j - 1]}))"
                    f" END"
                )
            ctes.append(
                f"{x}est_{lbl(i, j)} AS (SELECT CAST({expr} AS HUGEINT) AS est)"
            )
    # DP cost CTEs; singleton costs are literal 0
    for length in range(2, k + 1):
        for i in range(0, k - length + 1):
            j = i + length - 1
            alts = []
            for cut in range(i, j):
                left = (
                    "CAST(0 AS HUGEINT)"
                    if cut == i
                    else f"(SELECT cost FROM {x}cost_{lbl(i, cut)})"
                )
                right = (
                    "CAST(0 AS HUGEINT)"
                    if cut + 1 == j
                    else f"(SELECT cost FROM {x}cost_{lbl(cut + 1, j)})"
                )
                alts.append(
                    f"{left} + {right} + (SELECT est FROM {x}est_{lbl(i, j)})"
                )
            best = f"LEAST({', '.join(alts)})" if len(alts) > 1 else alts[0]
            # smallest-cut tiebreak: ordered CASE, <= against later cuts
            cases = []
            for ci, cut in enumerate(range(i, j)):
                plan = f"'{lbl(i, j)}={lbl(i, cut)}+{lbl(cut + 1, j)}'"
                if ci == len(alts) - 1:
                    cases.append(f"ELSE {plan}")
                else:
                    conds = " AND ".join(
                        f"({alts[ci]}) <= ({alts[cj]})"
                        for cj in range(ci + 1, len(alts))
                    )
                    cases.append(f"WHEN {conds} THEN {plan}")
            plan_expr = (
                f"CASE {' '.join(cases)} END" if len(alts) > 1
                else f"'{lbl(i, j)}={lbl(i, i)}+{lbl(i + 1, j)}'"
            )
            ctes.append(
                f"{x}cost_{lbl(i, j)} AS (SELECT CAST({best} AS HUGEINT)"
                f" AS cost, {plan_expr} AS plan)"
            )
    legs = []
    for length in range(2, k + 1):
        for i in range(0, k - length + 1):
            j = i + length - 1
            s = lbl(i, j)
            legs.append(
                f"SELECT '{s}' AS subset,"
                f" (SELECT plan FROM {x}cost_{s}) AS plan,"
                f" CAST((SELECT est FROM {x}est_{s}) AS BIGINT) AS est_rows,"
                f" CAST((SELECT cost FROM {x}cost_{s}) AS BIGINT)"
                f" AS best_cost,"
                f" CAST({length} AS INTEGER) AS n_tables"
            )
    ctes.append(
        f"{x}plan AS (\n      " + "\n      UNION ALL ".join(legs) + ")"
    )
    return _materialize_ctes(",\n    ".join(ctes))


# ------------------------------------------------------------------ snowflake


def _edge_t6_sql(
    e: str, ta: str, ka: str, tb: str, kb: str, n_buckets: int
) -> str:
    """The shared-boundary bucket-statistics CTE block every generator
    in this module unrolls per edge, ending in ``<e>t6`` — the SQL twin
    of :func:`_edge_est6`."""
    return f"""{e}ka AS (
      SELECT CAST({ka} AS BIGINT) AS k FROM {ta} WHERE {ka} IS NOT NULL),
    {e}kb AS (
      SELECT CAST({kb} AS BIGINT) AS k FROM {tb} WHERE {kb} IS NOT NULL),
    {e}dom AS (
      SELECT min(k) AS lo, max(k) - min(k) + 1 AS span
      FROM (SELECT k FROM {e}ka UNION ALL SELECT k FROM {e}kb)),
    {e}ha AS (
      SELECT CAST((k - d.lo) * {n_buckets} // d.span AS INTEGER) AS bucket,
             CAST(count(*) AS BIGINT) AS n_a,
             CAST(count(DISTINCT k) AS BIGINT) AS d_a
      FROM {e}ka CROSS JOIN {e}dom d GROUP BY 1),
    {e}hb AS (
      SELECT CAST((k - d.lo) * {n_buckets} // d.span AS INTEGER) AS bucket,
             CAST(count(*) AS BIGINT) AS n_b,
             CAST(count(DISTINCT k) AS BIGINT) AS d_b
      FROM {e}kb CROSS JOIN {e}dom d GROUP BY 1),
    {e}t6 AS (
      SELECT CAST(COALESCE(SUM(
               CASE WHEN GREATEST(d_a, d_b) > 0
                    THEN (CAST(n_a AS HUGEINT) * n_b * {_SCALE})
                         // GREATEST(d_a, d_b)
                    ELSE 0 END), 0) AS HUGEINT) AS t6
      FROM {e}ha a JOIN {e}hb b USING (bucket))"""


def _check_snowflake_labels(
    fname: str, chain_names: list[list[str]]
) -> None:
    """Every label the snowflake plan emits — internal chain intervals,
    fact-rooted proper prefixes, and star subsets over full chains —
    must be pairwise distinct (they are subset keys in the output and
    CTE names in the restatement)."""
    flat = [fname] + [n for c in chain_names for n in c]
    if len(set(flat)) != len(flat):
        raise ValueError(f"duplicate table names: {flat}")
    labels: list[str] = []
    for names in chain_names:
        m = len(names)
        labels.extend(
            "".join(names[i : j + 1])
            for i in range(m)
            for j in range(i + 1, m)
        )
        labels.extend(
            fname + "".join(names[: p]) for p in range(1, m)
        )
    k = len(chain_names)
    if k > 16:
        raise ValueError(f"too many chains for subset enumeration: {k}")
    clabels = ["".join(names) for names in chain_names]
    labels.extend(
        fname + "".join(clabels[i] for i in s) for s in star_subsets(k)
    )
    if len(set(labels)) != len(labels):
        dupes = sorted({l for l in labels if labels.count(l) > 1})
        raise ValueError(
            f"snowflake labels collide: {dupes}; use short names whose "
            f"concatenations are unambiguous"
        )


def snowflake_join_stats(
    fact: tuple[str, DataFrame],
    chains: list[list[tuple[str, DataFrame, str, str]]],
    n_buckets: int = 16,
    edge_est6=None,
    count_fn=None,
) -> dict:
    """Collect the statistics the snowflake DP runs on: the fact count
    plus, per chain, the member counts, the fact-edge est6, and each
    within-chain edge's est6.  Chain element i is (name, df,
    parent_key, own_key): ``parent_key`` names a column on the PARENT
    (the fact for element 0, element i-1's table otherwise) and
    ``own_key`` the matching column on this table.  ``edge_est6`` /
    ``count_fn`` optionally override the estimator / row counter
    (memoizing wrappers)."""
    fn = edge_est6 or _edge_est6
    cnt = count_fn or (lambda _n, df: df.count())
    fname, fdf = fact
    out = {"rows_fact": cnt(fname, fdf), "chains": []}
    for chain in chains:
        rows = [cnt(n, df) for n, df, _pk, _ok in chain]
        n0, d0, pk0, ok0 = chain[0]
        fe6 = fn(fdf, pk0, d0, ok0, n_buckets)
        we6 = [
            fn(chain[i - 1][1], chain[i][2], chain[i][1], chain[i][3],
               n_buckets)
            for i in range(1, len(chain))
        ]
        out["chains"].append(
            {"rows": rows, "fact_est6": fe6, "within_est6": we6}
        )
    return out


def snowflake_plan_dp(stats: dict) -> dict:
    """The pure-integer snowflake DP: COMPOSE the two existing DPs
    (the decomposition of DP over connected subgraphs — DPccp,
    Moerkotte & Neumann, VLDB 2006 — specialized to the snowflake
    topology, where every connected subgraph is the fact plus per-arm
    prefixes, so arm-internal and arm-order choices separate):

    1. each arm runs the CHAIN DP on its own tables (its internal
       C_out cost ``c_int`` and best split — the arm is built as its
       own bushy subtree);
    2. the fact-rooted PATH recurrence prices every arm prefix hanging
       off the fact (the chain cardinality recurrence with the fact as
       t0) — its full-length value is the arm's effective est6 for
       step 3, and the proper prefixes are emitted readouts;
    3. the STAR DP peels whole (collapsed) arms onto the fact, each
       peel paying the arm's internal cost once:
       ``cost(S) = min_d cost(S−d) + c_int(d) + est(S)``.

    All floors at fixed points (both engines agree bit for bit).
    Returns {"path_est", "path_cost", "internal", "est", "cost",
    "peel"} — path_* indexed [chain][prefix_len-1], internal[chain] =
    (est, cost, split) dicts or None for single-table arms.
    """
    rows_fact = stats["rows_fact"]
    path_e6: list[list[int]] = []  # fact-rooted prefix ests, x10^6 scale
    path_est: list[list[int]] = []
    path_cost: list[list[int]] = []
    internal: list[tuple | None] = []
    c_int: list[int] = []
    for ch in stats["chains"]:
        rows_c, fe6, we6 = ch["rows"], ch["fact_est6"], ch["within_est6"]
        m = len(rows_c)
        # the path recurrence stays in the x10^6 SCALE until consumed
        # (one floor per within-edge step, none at the fact edge) — so
        # a single-table arm's effective est6 IS its fact-edge est6 and
        # the star fold below floors at exactly star_plan_dp's points:
        # the singleton-arm degeneracy to star_join_plan is bit-exact
        pe6 = [fe6]
        for p in range(2, m + 1):
            bridge = rows_c[p - 2]
            pe6.append(
                0 if bridge == 0
                else (pe6[-1] * we6[p - 2]) // (_SCALE * bridge)
            )
        path_e6.append(pe6)
        pe = [v // _SCALE for v in pe6]
        path_est.append(pe)
        path_cost.append([sum(pe[: q + 1]) for q in range(m)])
        if m >= 2:
            idp = chain_plan_dp(rows_c, we6)
            internal.append(idp)
            c_int.append(idp[1][(0, m - 1)])
        else:
            internal.append(None)
            c_int.append(0)
    k = len(stats["chains"])
    subsets = star_subsets(k)
    est: dict[tuple[int, ...], int] = {(): rows_fact}
    for s in subsets:
        prev, last = s[:-1], s[-1]
        full6 = path_e6[last][-1]
        if not prev:
            est[s] = full6 // _SCALE
        elif rows_fact == 0:
            est[s] = 0
        else:
            est[s] = (est[prev] * full6) // (_SCALE * rows_fact)
    cost: dict[tuple[int, ...], int] = {(): 0}
    peel: dict[tuple[int, ...], int] = {}
    for s in subsets:
        best, best_d = None, None
        for d in s:  # input order; first arm wins ties (strict <)
            rest = tuple(i for i in s if i != d)
            c = cost[rest] + c_int[d] + est[s]
            if best is None or c < best:
                best, best_d = c, d
        cost[s] = best
        peel[s] = best_d
    return {
        "path_e6": path_e6,
        "path_est": path_est,
        "path_cost": path_cost,
        "internal": internal,
        "c_int": c_int,
        "est": est,
        "cost": cost,
        "peel": peel,
    }


def snowflake_join_plan(
    spark,
    fact: tuple[str, DataFrame],
    chains: list[list[tuple[str, DataFrame, str, str]]],
    n_buckets: int = 16,
    stats: dict | None = None,
    dp: dict | None = None,
) -> DataFrame:
    """The snowflake form of the join-order DP — dimension arms with
    their own sub-dimensions (the TPC-H topology:
    region←nation←customer/supplier), the shape between the chain and
    the star.  Emits the FULL hashed lattice:

    - per arm, the internal chain-DP interval rows (the arm built as
      its own subtree — label: arm table names, no fact prefix);
    - per arm, the fact-rooted PROPER prefix estimates (label: fact
      name + prefix names; the full-length prefix IS the star
      singleton row, emitted once there);
    - the star lattice over whole arms (label: fact name + the
      concatenated names of each member arm), costs carrying each
      member arm's internal C_out exactly once.

    With every arm a single table this degenerates to
    :func:`star_join_plan` rows exactly (c_int = 0, path = edge) —
    the composition invariant tests pin.  Algorithm: DPccp (Moerkotte
    & Neumann, VLDB 2006) specialized to snowflake connectivity; cost
    model C_out (Neumann & Radke, ICDE 2018).

    Returns (subset, plan, est_rows, best_cost, n_tables) like the
    chain and star planners.
    """
    if not chains:
        raise ValueError("need at least one dimension arm")
    fname, _fdf = fact
    chain_names = [[e[0] for e in ch] for ch in chains]
    _check_snowflake_labels(fname, chain_names)
    stats = stats or snowflake_join_stats(fact, chains, n_buckets)
    dp = dp or snowflake_plan_dp(stats)
    out = []
    # 1. arm-internal interval rows
    for ci, names in enumerate(chain_names):
        if dp["internal"][ci] is None:
            continue
        iest, icost, isplit = dp["internal"][ci]
        m = len(names)

        def ilbl(i: int, j: int) -> str:
            return "".join(names[i : j + 1])

        for length in range(2, m + 1):
            for i in range(0, m - length + 1):
                j = i + length - 1
                cut = isplit[(i, j)]
                out.append(
                    (
                        ilbl(i, j),
                        f"{ilbl(i, j)}={ilbl(i, cut)}+{ilbl(cut + 1, j)}",
                        iest[(i, j)],
                        icost[(i, j)],
                        length,
                    )
                )
    # 2. fact-rooted proper prefixes
    for ci, names in enumerate(chain_names):
        for p in range(1, len(names)):
            lbl_p = fname + "".join(names[:p])
            prev = fname + "".join(names[: p - 1]) if p > 1 else fname
            out.append(
                (
                    lbl_p,
                    f"{lbl_p}={prev}+{names[p - 1]}",
                    dp["path_est"][ci][p - 1],
                    dp["path_cost"][ci][p - 1],
                    p + 1,
                )
            )
    # 3. star lattice over whole arms
    clabels = ["".join(n) for n in chain_names]

    def slbl(s: tuple[int, ...]) -> str:
        return fname + "".join(clabels[i] for i in s)

    for s in star_subsets(len(chains)):
        d = dp["peel"][s]
        rest = tuple(i for i in s if i != d)
        out.append(
            (
                slbl(s),
                f"{slbl(s)}={slbl(rest)}+{clabels[d]}",
                dp["est"][s],
                dp["cost"][s],
                1 + sum(len(chain_names[i]) for i in s),
            )
        )
    return spark.createDataFrame(
        out,
        "subset string, plan string, est_rows long, best_cost long,"
        " n_tables int",
    )


def snowflake_join_plan_sql(
    fact: tuple[str, str],
    chains: list[list[tuple[str, str, str, str]]],
    n_buckets: int = 16,
    prefix: str = "sn",
) -> str:
    """DuckDB restatement of :func:`snowflake_join_plan`: per-arm
    chain-DP CTEs (via :func:`chain_join_plan_sql`), fact-rooted path
    recurrence CTEs, and the arm-peel star DP with internal costs and
    the ordered-CASE tiebreak, unrolled over the same lattice.
    ``fact`` = (sql_table, short); chain element = (sql_table, short,
    parent_key, own_key).  Final CTE
    ``<prefix>plan(subset, plan, est_rows, best_cost, n_tables)``."""
    if not chains:
        raise ValueError("need at least one dimension arm")
    x = prefix
    ftable, fname = fact
    chain_names = [[e[1] for e in ch] for ch in chains]
    _check_snowflake_labels(fname, chain_names)
    k = len(chains)
    ctes = [
        f"{x}nf AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM {ftable})"
    ]
    # per-arm: bridge counts, fact+within edge stats, path recurrence,
    # internal chain DP
    for ci, ch in enumerate(chains):
        names = chain_names[ci]
        m = len(ch)
        for (tbl, short, _pk, _ok) in ch:
            ctes.append(
                f"{x}n_{short} AS (SELECT CAST(count(*) AS HUGEINT) AS n"
                f" FROM {tbl})"
            )
        ctes.append(
            _edge_t6_sql(f"{x}f{ci}", ftable, ch[0][2], ch[0][0],
                         ch[0][3], n_buckets)
        )
        for i in range(1, m):
            ctes.append(
                _edge_t6_sql(f"{x}w{ci}x{i}", ch[i - 1][0], ch[i][2],
                             ch[i][0], ch[i][3], n_buckets)
            )
        # path recurrence in the x10^6 scale (matches snowflake_plan_dp:
        # floors only at within-edge steps, so single-table arms keep
        # their raw fact-edge est6 for the star fold)
        for p in range(1, m + 1):
            if p == 1:
                expr = f"(SELECT t6 FROM {x}f{ci}t6)"
            else:
                bridge = names[p - 2]
                expr = (
                    f"CASE WHEN (SELECT n FROM {x}n_{bridge}) = 0 THEN 0"
                    f" ELSE (SELECT e6 FROM {x}pe{ci}x{p - 1})"
                    f" * (SELECT t6 FROM {x}w{ci}x{p - 1}t6)"
                    f" // ({_SCALE} * (SELECT n FROM {x}n_{bridge})) END"
                )
            ctes.append(
                f"{x}pe{ci}x{p} AS (SELECT CAST({expr} AS HUGEINT) AS e6)"
            )
        if m >= 2:
            ctes.append(
                chain_join_plan_sql(
                    [(tbl, short) for tbl, short, _pk, _ok in ch],
                    [(ch[i + 1][2], ch[i + 1][3])
                     for i in range(m - 1)],
                    n_buckets,
                    prefix=f"{x}c{ci}x",
                )
            )
    clabels = ["".join(n) for n in chain_names]

    def slbl(s: tuple[int, ...]) -> str:
        return fname + "".join(clabels[i] for i in s)

    def cint(ci: int) -> str:
        if len(chains[ci]) < 2:
            return "CAST(0 AS HUGEINT)"
        return f"(SELECT cost FROM {x}c{ci}xcost_{clabels[ci]})"

    subsets = star_subsets(k)
    for s in subsets:
        prev, last = s[:-1], s[-1]
        full6 = f"(SELECT e6 FROM {x}pe{last}x{len(chains[last])})"
        if not prev:
            expr = f"{full6} // {_SCALE}"
        else:
            expr = (
                f"CASE WHEN (SELECT n FROM {x}nf) = 0 THEN 0 ELSE"
                f" (SELECT est FROM {x}est_{slbl(prev)}) * {full6}"
                f" // ({_SCALE} * (SELECT n FROM {x}nf)) END"
            )
        ctes.append(
            f"{x}est_{slbl(s)} AS (SELECT CAST({expr} AS HUGEINT) AS est)"
        )
    for s in subsets:
        alts, plans = [], []
        for d in s:
            rest = tuple(i for i in s if i != d)
            left = (
                "CAST(0 AS HUGEINT)" if not rest
                else f"(SELECT cost FROM {x}cost_{slbl(rest)})"
            )
            alts.append(
                f"{left} + {cint(d)} + (SELECT est FROM {x}est_{slbl(s)})"
            )
            plans.append(f"'{slbl(s)}={slbl(rest)}+{clabels[d]}'")
        best = f"LEAST({', '.join(alts)})" if len(alts) > 1 else alts[0]
        if len(alts) == 1:
            plan_expr = plans[0]
        else:
            cases = []
            for ci_ in range(len(alts)):
                if ci_ == len(alts) - 1:
                    cases.append(f"ELSE {plans[ci_]}")
                else:
                    conds = " AND ".join(
                        f"({alts[ci_]}) <= ({alts[cj]})"
                        for cj in range(ci_ + 1, len(alts))
                    )
                    cases.append(f"WHEN {conds} THEN {plans[ci_]}")
            plan_expr = f"CASE {' '.join(cases)} END"
        ctes.append(
            f"{x}cost_{slbl(s)} AS (SELECT CAST({best} AS HUGEINT) AS cost,"
            f" {plan_expr} AS plan)"
        )
    legs = []
    for ci, ch in enumerate(chains):
        if len(ch) >= 2:
            legs.append(
                f"SELECT subset, plan, est_rows, best_cost, n_tables"
                f" FROM {x}c{ci}xplan"
            )
    for ci, names in enumerate(chain_names):
        for p in range(1, len(names)):
            lbl_p = fname + "".join(names[:p])
            prev = fname + "".join(names[: p - 1]) if p > 1 else fname
            csum = " + ".join(
                f"((SELECT e6 FROM {x}pe{ci}x{q}) // {_SCALE})"
                for q in range(1, p + 1)
            )
            legs.append(
                f"SELECT '{lbl_p}' AS subset,"
                f" '{lbl_p}={prev}+{names[p - 1]}' AS plan,"
                f" CAST((SELECT e6 FROM {x}pe{ci}x{p}) // {_SCALE}"
                f" AS BIGINT) AS est_rows,"
                f" CAST({csum} AS BIGINT) AS best_cost,"
                f" CAST({p + 1} AS INTEGER) AS n_tables"
            )
    for s in subsets:
        sl = slbl(s)
        n_tab = 1 + sum(len(chain_names[i]) for i in s)
        legs.append(
            f"SELECT '{sl}' AS subset,"
            f" (SELECT plan FROM {x}cost_{sl}) AS plan,"
            f" CAST((SELECT est FROM {x}est_{sl}) AS BIGINT) AS est_rows,"
            f" CAST((SELECT cost FROM {x}cost_{sl}) AS BIGINT)"
            f" AS best_cost,"
            f" CAST({n_tab} AS INTEGER) AS n_tables"
        )
    ctes.append(
        f"{x}plan AS (\n      " + "\n      UNION ALL ".join(legs) + ")"
    )
    return _materialize_ctes(",\n    ".join(ctes))


# ------------------------------------------------------------- general graph


def graph_adjacency(k: int, epairs: list[tuple[int, int]]) -> list[int]:
    """Adjacency bitmasks for ``k`` vertices and undirected edge index
    pairs (u < v required — the canonical edge orientation every
    consumer of this module shares)."""
    adj = [0] * k
    for u, v in epairs:
        if not (0 <= u < v < k):
            raise ValueError(f"edge ({u}, {v}) must satisfy 0 <= u < v < k")
        adj[u] |= 1 << v
        adj[v] |= 1 << u
    return adj


def _mask_connected(mask: int, adj: list[int]) -> bool:
    if mask == 0:
        return False
    seen = frontier = mask & -mask
    while frontier:
        nxt, m = 0, frontier
        while m:
            b = m & -m
            m ^= b
            nxt |= adj[b.bit_length() - 1] & mask & ~seen
        seen |= nxt
        frontier = nxt
    return seen == mask


def graph_connected_masks(
    k: int, epairs: list[tuple[int, int]]
) -> list[int]:
    """Every connected vertex subset as a bitmask, in (size, mask)
    order — the shared enumeration order of the Spark planner, the SQL
    generator, and the executor."""
    adj = graph_adjacency(k, epairs)
    masks = [m for m in range(1, 1 << k) if _mask_connected(m, adj)]
    masks.sort(key=lambda m: (bin(m).count("1"), m))
    return masks


def graph_splits(
    mask: int, epairs: list[tuple[int, int]], adj: list[int]
) -> list[tuple[int, int]]:
    """The csg-cmp split candidates of a connected subset: proper
    bipartitions (S1, S2) with S1 carrying the lowest vertex (each
    unordered split enumerated once), BOTH sides induced-connected, and
    at least one edge crossing (no cross products — DPccp's join-pair
    condition, Moerkotte & Neumann VLDB 2006).  Ordered by increasing
    S1 mask — the tiebreak order (smallest left mask first-wins, the
    general form of the chain DP's smallest-cut rule)."""
    low = mask & -mask
    out = []
    s1 = (mask - 1) & mask
    while s1:
        if s1 & low:
            s2 = mask ^ s1
            if (
                _mask_connected(s1, adj)
                and _mask_connected(s2, adj)
                and any(
                    (s1 >> u & 1 and s2 >> v & 1)
                    or (s2 >> u & 1 and s1 >> v & 1)
                    for u, v in epairs
                )
            ):
                out.append((s1, s2))
        s1 = (s1 - 1) & mask
    out.reverse()  # submask walk runs descending; candidates ascend
    return out


def _closing_edges(
    mask: int, epairs: list[tuple[int, int]]
) -> tuple[int, int, list[tuple[int, int]]]:
    """(max vertex v, prev mask, [(edge_idx, u)]) — the canonical
    est-recursion step: remove the highest vertex; the listed edges
    (ascending input index) are those joining v back to the rest."""
    v = mask.bit_length() - 1
    prev = mask ^ (1 << v)
    closing = [
        (i, u) for i, (u, w) in enumerate(epairs)
        if w == v and (prev >> u) & 1
    ]
    return v, prev, closing


def graph_est_fold(
    rows: list[int], epairs: list[tuple[int, int]], est6: list[int]
) -> dict[int, int]:
    """Cardinality estimates for EVERY non-empty subset by the
    canonical max-vertex fold: est(S) starts from est(S−v)·rows[v]
    (v the highest vertex) and applies each edge closing into v, in
    edge input order, as ``·est6[e] DIV (10^6·rows[u]·rows[v])`` —
    exact integer floors at fixed points, so both engines agree bit
    for bit.  Because ``(k·x) DIV (k·y) = x DIV y``, on chain
    intervals this equals :func:`chain_plan_dp`'s right-extension
    recurrence EXACTLY, and on star subsets :func:`star_plan_dp`'s
    input-order fold — the degeneracy tests pin both.  Disconnected
    subsets fold with no closing edges (a cross-product estimate);
    they are never emitted or costed, but the recursion passes through
    them."""
    k = len(rows)
    est: dict[int, int] = {0: 1}
    for mask in range(1, 1 << k):
        v, prev, closing = _closing_edges(mask, epairs)
        acc = est[prev] * rows[v]
        for i, u in closing:
            if rows[u] == 0 or rows[v] == 0:
                acc = 0
            else:
                acc = (acc * est6[i]) // (_SCALE * rows[u] * rows[v])
        est[mask] = acc
    return est


def graph_plan_dp(
    rows: list[int],
    epairs: list[tuple[int, int]],
    est6: list[int],
) -> tuple[dict[int, int], dict[int, int], dict[int, int]]:
    """The pure-integer DP over a GENERAL connected query graph —
    cycles included (DPsub enumeration of DPccp's csg-cmp pairs; cost
    model C_out): cost(singleton) = 0, cost(S) = min over
    :func:`graph_splits` of cost(S1) + cost(S2) + est(S), ties broken
    by the smallest S1 mask (strict <).  Returns ``(est, cost, split)``
    keyed by subset mask; ``split[S]`` is the chosen S1.

    Degeneracies (tests/test_graphorder.py): on a path graph this IS
    :func:`chain_plan_dp` bit for bit (est, cost, AND chosen splits —
    smallest-S1-mask generalizes smallest-cut); on a star graph est
    and cost match :func:`star_plan_dp` bit for bit, and the peel
    agrees whenever the optimum is unique (the mask order enumerates
    peeled dims in the opposite direction, so exact cost TIES may
    resolve to a different — equally cheap — dim)."""
    k = len(rows)
    adj = graph_adjacency(k, epairs)
    est = graph_est_fold(rows, epairs, est6)
    cost: dict[int, int] = {}
    split: dict[int, int] = {}
    for mask in graph_connected_masks(k, epairs):
        if mask & (mask - 1) == 0:
            cost[mask] = 0
            continue
        best, best_s1 = None, None
        for s1, s2 in graph_splits(mask, epairs, adj):
            c = cost[s1] + cost[s2] + est[mask]
            if best is None or c < best:
                best, best_s1 = c, s1
        if best is None:
            raise ValueError(
                f"connected subset {mask:b} has no connected split — "
                f"graph is not well-formed"
            )
        cost[mask] = best
        split[mask] = best_s1
    return est, cost, split


def _graph_label(mask: int, names: list[str]) -> str:
    return "".join(n for i, n in enumerate(names) if mask >> i & 1)


def _check_graph_labels(
    names: list[str], epairs: list[tuple[int, int]]
) -> None:
    """Every connected subset's label (input-order name concatenation)
    is an output subset key and appears in plan strings; reject
    collisions the way the star/snowflake checks do."""
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate table names: {names}")
    k = len(names)
    if k > 12:
        raise ValueError(f"too many tables for subset enumeration: {k}")
    labels = [
        _graph_label(m, names) for m in graph_connected_masks(k, epairs)
    ]
    if len(set(labels)) != len(labels):
        dupes = sorted({l for l in labels if labels.count(l) > 1})
        raise ValueError(
            f"graph subset labels collide: {dupes}; use short names "
            f"whose concatenations are unambiguous"
        )


def graph_join_stats(
    tables: list[tuple[str, DataFrame]],
    edges: list[tuple[int, int, str, str]],
    n_buckets: int = 16,
    edge_est6=None,
) -> tuple[list[int], list[int]]:
    """(per-table rows, per-edge est6) for the general-graph DP.  Edge
    = (table index u, table index v, key on u, key on v), u < v."""
    fn = edge_est6 or _edge_est6
    rows = [df.count() for _, df in tables]
    est6 = [
        fn(tables[u][1], ku, tables[v][1], kv, n_buckets)
        for u, v, ku, kv in edges
    ]
    return rows, est6


def graph_join_plan(
    spark,
    tables: list[tuple[str, DataFrame]],
    edges: list[tuple[int, int, str, str]],
    n_buckets: int = 16,
    stats: tuple[list[int], list[int]] | None = None,
    dp: tuple[dict, dict, dict] | None = None,
) -> DataFrame:
    """Join-order enumeration over a GENERAL connected query graph —
    the form the chain/star/snowflake planners specialize (their
    docstrings scope bushy general-graph plans out; this closes that
    scope): arbitrary connectivity including CYCLES, e.g. the TRUE
    TPC-H q5 topology where customer and supplier must share a nation
    — two edges into the same table closing a 5-cycle, which no
    chain, star, or snowflake decomposition can represent (the
    snowflake fixture drops the customer-nation edge; this planner
    carries it, and the executor applies it as a join conjunction).

    Emits one row per connected subset with >= 2 tables, in (size,
    mask) order: ``(subset, plan, est_rows, best_cost, n_tables)``
    with ``plan = "<subset>=<S1>+<S2>"`` for the chosen csg-cmp
    split.  All integers from :func:`graph_plan_dp` — engine-identical
    by construction, hashed against :func:`graph_join_plan_sql`.

    Scale shape: statistics are the same bounded ANALYZE aggregates
    the other planners read (≤ n_buckets rows per table side per
    edge); the DP is driver-side arithmetic over at most 3^k
    csg-cmp pairs (81 for the 6-table q5 graph) — exactly where a
    real optimizer runs it.
    """
    if len(tables) < 2 or not edges:
        raise ValueError("need >= 2 tables and >= 1 edge")
    names = [n for n, _ in tables]
    epairs = [(u, v) for u, v, _ku, _kv in edges]
    k = len(tables)
    adj = graph_adjacency(k, epairs)
    if not _mask_connected((1 << k) - 1, adj):
        raise ValueError("query graph must be connected")
    _check_graph_labels(names, epairs)
    rows, est6 = stats or graph_join_stats(tables, edges, n_buckets)
    est, cost, split = dp or graph_plan_dp(rows, epairs, est6)
    out = []
    for mask in graph_connected_masks(k, epairs):
        if mask & (mask - 1) == 0:
            continue
        s1 = split[mask]
        s2 = mask ^ s1
        lbl = _graph_label(mask, names)
        out.append(
            (
                lbl,
                f"{lbl}={_graph_label(s1, names)}+{_graph_label(s2, names)}",
                est[mask],
                cost[mask],
                bin(mask).count("1"),
            )
        )
    return spark.createDataFrame(
        out,
        "subset string, plan string, est_rows long, best_cost long,"
        " n_tables int",
    )


def graph_join_plan_sql(
    tables: list[tuple[str, str]],
    edges: list[tuple[int, int, str, str]],
    n_buckets: int = 16,
    prefix: str = "gr",
) -> str:
    """DuckDB restatement of :func:`graph_join_plan`: per-edge shared-
    boundary bucket statistics, the max-vertex cardinality fold
    unrolled per subset MASK (CTE names are mask numbers, so label
    text never constrains the lattice), and the csg-cmp DP with the
    ordered-CASE smallest-S1-mask tiebreak.  ``tables`` =
    (sql_table, short_name); edge = (u, v, key_u, key_v).  Final CTE
    ``<prefix>plan(subset, plan, est_rows, best_cost, n_tables)``."""
    if len(tables) < 2 or not edges:
        raise ValueError("need >= 2 tables and >= 1 edge")
    x = prefix
    names = [s for _, s in tables]
    epairs = [(u, v) for u, v, _ku, _kv in edges]
    k = len(tables)
    adj = graph_adjacency(k, epairs)
    if not _mask_connected((1 << k) - 1, adj):
        raise ValueError("query graph must be connected")
    _check_graph_labels(names, epairs)
    ctes = []
    for t, s in tables:
        ctes.append(
            f"{x}n_{s} AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM {t})"
        )
    for i, (u, v, ku, kv) in enumerate(edges):
        ctes.append(
            _edge_t6_sql(f"{x}e{i}", tables[u][0], ku, tables[v][0], kv,
                         n_buckets)
        )

    def n_of(i: int) -> str:
        return f"(SELECT n FROM {x}n_{names[i]})"

    # est CTEs for every non-empty mask in mask order (the recursion
    # visits disconnected intermediates; est(0) = 1 inlined)
    for mask in range(1, 1 << k):
        v, prev, closing = _closing_edges(mask, epairs)
        base = "CAST(1 AS HUGEINT)" if prev == 0 else (
            f"(SELECT est FROM {x}est_m{prev})"
        )
        expr = f"{base} * {n_of(v)}"
        for i, u in closing:
            expr = (
                f"CASE WHEN {n_of(u)} = 0 OR {n_of(v)} = 0 THEN 0"
                f" ELSE ({expr}) * (SELECT t6 FROM {x}e{i}t6)"
                f" // ({_SCALE} * {n_of(u)} * {n_of(v)}) END"
            )
        ctes.append(
            f"{x}est_m{mask} AS (SELECT CAST({expr} AS HUGEINT) AS est)"
        )
    conn = graph_connected_masks(k, epairs)
    for mask in conn:
        if mask & (mask - 1) == 0:
            continue
        alts, plans = [], []
        for s1, s2 in graph_splits(mask, epairs, adj):
            left = (
                "CAST(0 AS HUGEINT)" if s1 & (s1 - 1) == 0
                else f"(SELECT cost FROM {x}cost_m{s1})"
            )
            right = (
                "CAST(0 AS HUGEINT)" if s2 & (s2 - 1) == 0
                else f"(SELECT cost FROM {x}cost_m{s2})"
            )
            alts.append(
                f"{left} + {right} + (SELECT est FROM {x}est_m{mask})"
            )
            plans.append(
                f"'{_graph_label(mask, names)}"
                f"={_graph_label(s1, names)}+{_graph_label(s2, names)}'"
            )
        best = f"LEAST({', '.join(alts)})" if len(alts) > 1 else alts[0]
        if len(alts) == 1:
            plan_expr = plans[0]
        else:
            cases = []
            for ci in range(len(alts)):
                if ci == len(alts) - 1:
                    cases.append(f"ELSE {plans[ci]}")
                else:
                    conds = " AND ".join(
                        f"({alts[ci]}) <= ({alts[cj]})"
                        for cj in range(ci + 1, len(alts))
                    )
                    cases.append(f"WHEN {conds} THEN {plans[ci]}")
            plan_expr = f"CASE {' '.join(cases)} END"
        ctes.append(
            f"{x}cost_m{mask} AS (SELECT CAST({best} AS HUGEINT) AS cost,"
            f" {plan_expr} AS plan)"
        )
    legs = []
    for mask in conn:
        if mask & (mask - 1) == 0:
            continue
        lbl = _graph_label(mask, names)
        legs.append(
            f"SELECT '{lbl}' AS subset,"
            f" (SELECT plan FROM {x}cost_m{mask}) AS plan,"
            f" CAST((SELECT est FROM {x}est_m{mask}) AS BIGINT)"
            f" AS est_rows,"
            f" CAST((SELECT cost FROM {x}cost_m{mask}) AS BIGINT)"
            f" AS best_cost,"
            f" CAST({bin(mask).count('1')} AS INTEGER) AS n_tables"
        )
    ctes.append(
        f"{x}plan AS (\n      " + "\n      UNION ALL ".join(legs) + ")"
    )
    return _materialize_ctes(",\n    ".join(ctes))
