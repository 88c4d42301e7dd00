"""Scalar / aggregate / window function registry, dual-dialect.

The reference passes any DataFusion-10 builtin scalar function through by
name (datafusion-sqlgen/src/expr.rs:76-94 in /root/reference) and renders
``name(args)`` (sqlgenerator/src/expr.rs:152-178). We keep the same
name-pass-through shape but make the mapping *explicit and per-dialect*,
because Spark and DuckDB disagree on names and semantics for a handful of
functions (``log`` is ln in Spark but log10 in DuckDB; ``split`` is
``string_split_regex``; ``instr`` is ``strpos``; ...).

A canonical function name renders via:
  * ``render_func(name, args_sql, dialect)``  -> SQL text
  * ``spark_func_column(name, cols)``         -> pyspark Column (JVM-side,
    whole-stage-codegen friendly — never a Python UDF)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

Renderer = Callable[[list[str]], str]


def _plain(name: str) -> Renderer:
    return lambda args: f"{name}({', '.join(args)})"


def _raise_sql_fallback(name: str):
    raise NotImplementedError(
        f"{name} as a Column; use the SQL rendering path"
    )


def _digest_render(a: list[str], dialect: str) -> str:
    """digest(x, 'algo') — DF-10 builtin. The algorithm arrives as a
    rendered string literal; resolve the supported ones at render time."""
    algo = a[1].strip().strip("'").lower()
    if algo == "md5":
        return f"md5({a[0]})"
    if algo in ("sha224", "sha256", "sha384", "sha512"):
        if dialect == "spark":
            return f"sha2({a[0]}, {algo[3:]})"
        return f"{algo}({a[0]})"  # DuckDB: only sha256 exists
    raise ValueError(f"digest: unsupported algorithm literal {a[1]!r}")


# canonical -> {dialect: renderer}. Canonical names follow Spark where the
# two differ; "ln"/"log10"/"log2" are used instead of the ambiguous "log".
_SPECIAL: dict[str, dict[str, Renderer]] = {
    "ln": {"spark": _plain("ln"), "duckdb": _plain("ln")},
    "log10": {"spark": _plain("log10"), "duckdb": _plain("log10")},
    "log2": {"spark": _plain("log2"), "duckdb": _plain("log2")},
    # 1-based array index on both engines (reference is also 1-based:
    # tests/select.rs:276 — some_list[1] yields the first element).
    "element_at": {
        "spark": _plain("element_at"),
        "duckdb": lambda a: f"({a[0]})[{a[1]}]",
    },
    "array_size": {"spark": _plain("size"), "duckdb": _plain("len")},
    "split": {
        "spark": _plain("split"),
        "duckdb": _plain("string_split_regex"),
    },
    "strpos": {
        "spark": lambda a: f"instr({', '.join(a)})",
        "duckdb": _plain("strpos"),
    },
    "string_length": {"spark": _plain("length"), "duckdb": _plain("length")},
    # Spark date_trunc returns TIMESTAMP; DuckDB returns DATE/TIMESTAMP
    # depending on field — cast so oracle schemas line up.
    "date_trunc": {
        "spark": _plain("date_trunc"),
        "duckdb": lambda a: f"CAST(date_trunc({', '.join(a)}) AS TIMESTAMP)",
    },
    "approx_count_distinct": {
        "spark": _plain("approx_count_distinct"),
        "duckdb": _plain("approx_count_distinct"),
    },
    "stddev": {"spark": _plain("stddev_samp"), "duckdb": _plain("stddev_samp")},
    "variance": {"spark": _plain("var_samp"), "duckdb": _plain("var_samp")},
    "first_value": {"spark": _plain("first_value"), "duckdb": _plain("first_value")},
    "last_value": {"spark": _plain("last_value"), "duckdb": _plain("last_value")},
    "unix_timestamp": {
        "spark": _plain("unix_timestamp"),
        "duckdb": lambda a: f"epoch({', '.join(a)})",
    },
    "to_timestamp": {
        "spark": _plain("to_timestamp"),
        # DuckDB's to_timestamp takes epoch seconds; string parse is a cast
        "duckdb": lambda a: f"CAST({a[0]} AS TIMESTAMP)",
    },
    # struct construction: Spark named_struct('k', v, ...) <-> DuckDB
    # struct_pack(k := v, ...) — keys arrive as rendered string literals
    "named_struct": {
        "spark": _plain("named_struct"),
        "duckdb": lambda a: "struct_pack(" + ", ".join(
            f"{k[1:-1]} := {v}" for k, v in zip(a[0::2], a[1::2])
        ) + ")",
    },
    # array aggregation: collect_list order is engine/partition dependent,
    # so oracle-checked uses always wrap it in sort_array
    "collect_list": {"spark": _plain("collect_list"), "duckdb": _plain("list")},
    "collect_set": {
        "spark": _plain("collect_set"),
        "duckdb": lambda a: f"list_distinct(list({', '.join(a)}))",
    },
    "sort_array": {"spark": _plain("sort_array"), "duckdb": _plain("list_sort")},
    "array_join": {
        "spark": _plain("array_join"),
        "duckdb": lambda a: f"array_to_string({', '.join(a)})",
    },
    # array functions (Spark names canonical; the reference's only
    # complex type is List with 1-based indexing, tests/select.rs:252-281)
    "array": {"spark": _plain("array"), "duckdb": _plain("list_value")},
    "array_max": {"spark": _plain("array_max"), "duckdb": _plain("list_max")},
    "array_min": {"spark": _plain("array_min"), "duckdb": _plain("list_min")},
    "array_contains": {
        "spark": _plain("array_contains"),
        "duckdb": _plain("list_contains"),
    },
    # 1-based position of first match; Spark returns 0 when absent,
    # DuckDB returns NULL -> coalesce to align
    "array_position": {
        "spark": _plain("array_position"),
        "duckdb": lambda a: f"coalesce(list_position({', '.join(a)}), 0)",
    },
    # Spark slice(arr, start, length) vs DuckDB list_slice(arr, start,
    # stop) with inclusive stop -> stop = start + length - 1
    "slice": {
        "spark": _plain("slice"),
        "duckdb": lambda a: f"list_slice({a[0]}, {a[1]}, ({a[1]}) + ({a[2]}) - 1)",
    },
    # JSON path extraction, '$.k' path syntax on both engines; both
    # return NULL on missing path / malformed JSON (never an error)
    "get_json_object": {
        "spark": _plain("get_json_object"),
        "duckdb": _plain("json_extract_string"),
    },
    # Spark date_add(date, int_days) -> DATE; DuckDB's date_add takes an
    # INTERVAL (incompatible signature), but DATE + INTEGER adds days and
    # stays DATE — cast both operands to pin the overload.
    "date_add": {
        "spark": _plain("date_add"),
        "duckdb": lambda a: f"(CAST({a[0]} AS DATE) + CAST({a[1]} AS INTEGER))",
    },
    "date_sub": {
        "spark": _plain("date_sub"),
        "duckdb": lambda a: f"(CAST({a[0]} AS DATE) - CAST({a[1]} AS INTEGER))",
    },
    # Spark dayofweek: 1-7 with Sunday=1; DuckDB dayofweek: 0-6 Sunday=0
    "dayofweek": {
        "spark": _plain("dayofweek"),
        "duckdb": lambda a: f"(dayofweek({', '.join(a)}) + 1)",
    },
    # DataFusion-10 builtin string set, where the engines' names differ
    "chr": {"spark": _plain("char"), "duckdb": _plain("chr")},
    "octet_length": {
        "spark": _plain("octet_length"),
        # DuckDB's octet_length only takes BLOB/BIT
        "duckdb": lambda a: f"octet_length(encode({a[0]}))",
    },
    "to_hex": {"spark": _plain("hex"), "duckdb": _plain("to_hex")},
    "sha256": {
        "spark": lambda a: f"sha2({a[0]}, 256)",
        "duckdb": _plain("sha256"),
    },
    "btrim": {
        "spark": _plain("btrim"),
        "duckdb": _plain("trim"),  # DuckDB 2-arg trim == btrim
    },
    # TRIM(LEADING/TRAILING chars FROM x) — canonical args (x, chars).
    # Rendered in the SQL-standard keyword form in BOTH dialects: the
    # bare 2-arg ltrim/rtrim spellings disagree on argument order
    # (Spark: (trimStr, src); DuckDB: (src, chars)), so the keyword form
    # is the only spelling that re-parses unambiguously (parser.py maps
    # it back to these canonical names).
    "ltrim_chars": {
        "spark": lambda a: f"TRIM(LEADING {a[1]} FROM {a[0]})",
        "duckdb": lambda a: f"TRIM(LEADING {a[1]} FROM {a[0]})",
    },
    "rtrim_chars": {
        "spark": lambda a: f"TRIM(TRAILING {a[1]} FROM {a[0]})",
        "duckdb": lambda a: f"TRIM(TRAILING {a[1]} FROM {a[0]})",
    },
    # map type: Spark map(k1, v1, k2, v2, ...) interleaves; DuckDB map()
    # takes (keys_list, values_list)
    "map": {
        "spark": _plain("map"),
        "duckdb": lambda a: (
            "map([" + ", ".join(a[0::2]) + "], [" + ", ".join(a[1::2]) + "])"
        ),
    },
    "map_from_arrays": {
        "spark": _plain("map_from_arrays"),
        "duckdb": _plain("map"),
    },
    # element_at on a map: DuckDB's m[k]/map_extract return a LIST
    # ([] when absent) — unwrap to value-or-NULL to match Spark
    "map_get": {
        "spark": lambda a: f"element_at({', '.join(a)})",
        "duckdb": lambda a: f"list_extract(map_extract({a[0]}, {a[1]}), 1)",
    },
    "map_size": {
        "spark": _plain("size"),
        "duckdb": _plain("cardinality"),
    },
    "map_contains_key": {
        "spark": _plain("map_contains_key"),
        "duckdb": lambda a: f"list_contains(map_keys({a[0]}), {a[1]})",
    },
    # higher-order array functions over expressions.Lambda args (DataFusion
    # 10 / the reference predate HOFs entirely — catch-all expr.rs:103-106).
    # zip_with(duckdb) is rendered structurally in Func.to_sql (needs IR
    # substitution, not string pasting).
    "transform": {"spark": _plain("transform"), "duckdb": _plain("list_transform")},
    "filter": {"spark": _plain("filter"), "duckdb": _plain("list_filter")},
    # exists/forall: fold OR/AND over the predicate list so SQL
    # three-valued logic survives (list_filter would drop NULL predicate
    # results and collapse Spark's NULL answer to true/false). The
    # prepended identity also covers the empty array (false / true).
    "exists": {
        "spark": _plain("exists"),
        "duckdb": lambda a: (
            f"list_reduce(list_prepend(false, list_transform({a[0]}, {a[1]})), "
            f"(__ex_acc, __ex_x) -> __ex_acc OR __ex_x)"
        ),
    },
    "forall": {
        "spark": _plain("forall"),
        "duckdb": lambda a: (
            f"list_reduce(list_prepend(true, list_transform({a[0]}, {a[1]})), "
            f"(__fa_acc, __fa_x) -> __fa_acc AND __fa_x)"
        ),
    },
    # aggregate(arr, init, (acc, x) -> ...): DuckDB list_reduce has no init
    # slot — prepend it (list_reduce([init] ++ arr) folds identically,
    # left-to-right, and returns init on the empty array like Spark)
    "aggregate": {
        "spark": _plain("aggregate"),
        "duckdb": lambda a: f"list_reduce(list_prepend({a[1]}, {a[0]}), {a[2]})",
    },
    "zip_with": {"spark": _plain("zip_with"), "duckdb": _plain("zip_with")},
    # hyperbolics: DuckDB 1.0 lacks them — exp-based identities (exact to
    # double ulps for the value ranges the workloads use)
    "sinh": {
        "spark": _plain("sinh"),
        "duckdb": lambda a: f"((exp({a[0]}) - exp(-({a[0]}))) / 2)",
    },
    "cosh": {
        "spark": _plain("cosh"),
        "duckdb": lambda a: f"((exp({a[0]}) + exp(-({a[0]}))) / 2)",
    },
    "tanh": {
        "spark": _plain("tanh"),
        "duckdb": lambda a: (
            f"((exp(2 * ({a[0]})) - 1) / (exp(2 * ({a[0]})) + 1))"
        ),
    },
    # day difference: Spark datediff(end, start); DuckDB date_diff(unit, start, end)
    "datediff": {
        "spark": _plain("datediff"),
        "duckdb": lambda a: f"date_diff('day', {a[1]}, {a[0]})",
    },
    "regexp_like": {
        "spark": _plain("regexp_like"),
        "duckdb": _plain("regexp_matches"),
    },
    # ANSI-mode error-safe variants (round 10b). Spark natives; DuckDB
    # lacks the try_ family so the twins spell out the NULL-on-failure
    # contract for the SUPPORTED surface — DOUBLE/integral operands:
    # try_divide is NULL exactly when the divisor is 0 (Spark
    # float-divides those, so the DuckDB twin multiplies by 1.0;
    # DECIMAL dividends are OUT of contract — Spark divides them
    # decimally with NULL-on-overflow, which the double twin cannot
    # replay); try_element_at is the out-of-range-NULL list index.
    # Index 0 is NOT out-of-range to Spark (INVALID_INDEX_OF_ZERO
    # still raises — try_ suppresses only range misses) while DuckDB's
    # subscript returns NULL: the parser rejects the literal-0 form.
    "try_divide": {
        "spark": _plain("try_divide"),
        "duckdb": lambda a: f"(({a[0]}) * 1.0 / nullif({a[1]}, 0))",
    },
    "try_element_at": {
        "spark": _plain("try_element_at"),
        "duckdb": lambda a: f"({a[0]})[{a[1]}]",
    },
    # SQL-standard width_bucket; DuckDB 1.0 lacks it — CASE formula
    "width_bucket": {
        "spark": _plain("width_bucket"),
        "duckdb": lambda a: (
            f"(CASE WHEN ({a[0]}) < ({a[1]}) THEN 0 "
            f"WHEN ({a[0]}) >= ({a[2]}) THEN ({a[3]}) + 1 "
            f"ELSE CAST(floor((({a[0]}) - ({a[1]})) * ({a[3]}) "
            f"/ (({a[2]}) - ({a[1]}))) AS BIGINT) + 1 END)"
        ),
    },
    # element order differs between engines (Spark keeps first-occurrence
    # order; DuckDB's is unspecified) — oracle-checked uses wrap in sort_array
    "array_distinct": {
        "spark": _plain("array_distinct"),
        "duckdb": _plain("list_distinct"),
    },
    "array_intersect": {
        "spark": _plain("array_intersect"),
        "duckdb": _plain("list_intersect"),
    },
    # ---- DataFusion-10 builtin stragglers (round-4 registry audit: the
    # reference forwards every BuiltinScalarFunction by name,
    # datafusion-sqlgen/src/expr.rs:76-94 — these closed the last gaps
    # vs the DF 10.0 enum) ----
    "signum": {"spark": _plain("signum"), "duckdb": _plain("sign")},
    # numeric truncation toward zero (DF trunc(x) -> f64); Spark's trunc
    # is date-only, so go through BIGINT; DuckDB trunc returns the
    # argument type -> cast to DOUBLE to align
    "trunc": {
        "spark": lambda a: f"CAST(CAST({a[0]} AS BIGINT) AS DOUBLE)",
        "duckdb": lambda a: f"CAST(trunc({a[0]}) AS DOUBLE)",
    },
    # whitespace-word title case; DuckDB 1.x has no initcap — compose it
    "initcap": {
        "spark": _plain("initcap"),
        "duckdb": lambda a: (
            f"array_to_string(list_transform(string_split({a[0]}, ' '), "
            f"__ic_w -> upper(substr(__ic_w, 1, 1)) || "
            f"lower(substr(__ic_w, 2))), ' ')"
        ),
    },
    "now": {"spark": _plain("now"), "duckdb": _plain("now")},
    "random": {"spark": _plain("rand"), "duckdb": _plain("random")},
    # digest(x, 'algo') with a literal algorithm name (the only form the
    # reference's tests could produce): resolve at render time
    "digest": {
        "spark": lambda a: _digest_render(a, "spark"),
        "duckdb": lambda a: _digest_render(a, "duckdb"),
    },
    # PG-style regexp_match returns the matched fragments as a list; both
    # engines express it as extract-all of the whole match
    "regexp_match": {
        "spark": lambda a: (
            f"regexp_extract_all({a[0]}, {a[1]}, 0)"
        ),
        "duckdb": lambda a: f"regexp_extract_all({a[0]}, {a[1]})",
    },
    "sha224": {
        "spark": lambda a: f"sha2({a[0]}, 224)",
        "duckdb": _plain("sha224"),  # engine gap: errors at execution
    },
    "sha384": {
        "spark": lambda a: f"sha2({a[0]}, 384)",
        "duckdb": _plain("sha384"),  # engine gap: errors at execution
    },
    "sha512": {
        "spark": lambda a: f"sha2({a[0]}, 512)",
        "duckdb": _plain("sha512"),  # engine gap: errors at execution
    },
    # epoch-integer -> timestamp at three precisions
    "to_timestamp_seconds": {
        "spark": lambda a: f"timestamp_seconds({a[0]})",
        "duckdb": lambda a: f"CAST(to_timestamp({a[0]}) AS TIMESTAMP)",
    },
    "to_timestamp_millis": {
        "spark": lambda a: f"timestamp_millis({a[0]})",
        "duckdb": lambda a: f"epoch_ms(CAST({a[0]} AS BIGINT))",
    },
    "to_timestamp_micros": {
        "spark": lambda a: f"timestamp_micros({a[0]})",
        "duckdb": lambda a: f"make_timestamp(CAST({a[0]} AS BIGINT))",
    },
    # ordered string aggregation: string_agg(value, sep[, order_key]) —
    # Spark 4 listagg ... WITHIN GROUP; DuckDB inline ORDER BY. The 2-arg
    # form orders by the value itself (both engines would otherwise be
    # nondeterministic, which breaks dual-render equality).
    "string_agg": {
        "spark": lambda a: (
            f"listagg({a[0]}, {a[1]}) WITHIN GROUP (ORDER BY {a[2] if len(a) > 2 else a[0]})"
        ),
        "duckdb": lambda a: (
            f"string_agg({a[0]}, {a[1]} ORDER BY {a[2] if len(a) > 2 else a[0]})"
        ),
    },
    # ordered array aggregation: array_agg(value[, order_key]) — ALWAYS
    # sorted (collect_list order is partition-dependent; a deterministic
    # sort is the only dual-render-safe contract). Ties on the key break
    # by the value on BOTH engines (Spark struct comparison is
    # field-by-field; DuckDB gets the explicit second sort key).
    "array_agg": {
        "spark": lambda a: (
            "transform(array_sort(collect_list(named_struct("
            f"'o', {a[1] if len(a) > 1 else a[0]}, 'v', {a[0]}"
            "))), _el -> _el.v)"  # param name must not shadow a column
        ),
        "duckdb": lambda a: (
            f"array_agg({a[0]} ORDER BY {a[1]}, {a[0]})" if len(a) > 1
            else f"array_agg({a[0]} ORDER BY {a[0]})"
        ),
    },
    # exact interpolated percentile: Spark `percentile`, DuckDB `quantile_cont`
    "percentile_cont": {
        "spark": _plain("percentile"),
        "duckdb": _plain("quantile_cont"),
    },
    # nearest-rank (no interpolation): DuckDB quantile_disc
    "percentile_disc": {
        "spark": _plain("percentile_disc"),
        "duckdb": _plain("quantile_disc"),
    },
}

# Functions with identical name + semantics in both dialects.
_COMMON = {
    # math (DataFusion-10 builtin set, datafusion-sqlgen/src/expr.rs:76-94
    # passes these through by name)
    "abs", "ceil", "floor", "round", "sqrt", "exp", "pow", "power", "sign",
    "sin", "cos", "tan", "asin", "acos", "atan", "atan2", "pi", "degrees",
    "radians",
    # string
    "lower", "upper", "trim", "ltrim", "rtrim", "length", "substr",
    "substring", "concat", "concat_ws", "replace", "lpad", "rpad", "reverse",
    "repeat", "left", "right", "md5", "regexp_replace", "regexp_extract",
    "starts_with", "ends_with", "contains", "ascii", "bit_length",
    "split_part", "translate", "levenshtein", "printf",
    # null handling / conditionals
    "coalesce", "nullif", "greatest", "least", "ifnull",
    # math (batch 2)
    "cbrt", "factorial",
    # date/time
    "year", "month", "day", "hour", "minute", "second", "to_date",
    "to_timestamp", "date_part",
    "quarter", "weekofyear", "dayofyear", "last_day",
    "make_date", "make_timestamp",
    # array
    "flatten",
    # map (identical names/semantics)
    "map_keys", "map_values",
    # aggregates
    "count", "sum", "avg", "min", "max", "stddev_samp", "stddev_pop",
    "var_samp", "var_pop", "corr", "covar_samp", "covar_pop", "median",
    "bool_and", "bool_or", "any_value",
    "count_if", "mode", "bit_and", "bit_or", "bit_xor",
    "regr_slope", "regr_intercept", "regr_r2", "regr_count",
    "regr_avgx", "regr_avgy",
    # window
    "row_number", "rank", "dense_rank", "ntile", "percent_rank",
    "cume_dist", "lag", "lead", "nth_value",
}

AGGREGATES = {
    "count", "sum", "avg", "min", "max", "stddev", "stddev_samp",
    "stddev_pop", "var_samp", "var_pop", "variance", "corr", "covar_samp",
    "covar_pop", "approx_count_distinct", "median", "bool_and", "bool_or",
    "any_value", "first_value", "last_value", "collect_list", "collect_set",
    "percentile_cont", "percentile_disc",
    "count_if", "mode", "bit_and", "bit_or", "bit_xor",
    "regr_slope", "regr_intercept", "regr_r2", "regr_count",
    "regr_avgx", "regr_avgy", "string_agg", "array_agg",
}

WINDOW_FUNCS = {
    "row_number", "rank", "dense_rank", "ntile", "percent_rank",
    "cume_dist", "lag", "lead", "nth_value", "first_value", "last_value",
}

# DataFusion-10 builtin names -> canonical names (the reference unparsers'
# pass-through surface, so a user of the reference can keep their spelling).
DATAFUSION_ALIASES = {
    "log": "ln",  # DataFusion log() is natural log, like Spark, unlike DuckDB
    "character_length": "string_length",
    "char_length": "string_length",
    "array_length": "array_size",
    "position": "strpos",
    "datetrunc": "date_trunc",
}


def canonical(name: str) -> str:
    return DATAFUSION_ALIASES.get(name.lower(), name.lower())


def _spark_reverse() -> dict[str, str]:
    """Spark-rendered name -> canonical IR name, for the SQL parser's
    reverse direction (parse a Spark-dialect render back to the IR that
    produced it). Derived from _SPECIAL's pure-rename renderers; a Spark
    name that is itself canonical (element_at, length, ...) is never
    remapped, and an ambiguous name (``size`` covers both array_size and
    map_size) resolves to its first — array — reading."""
    import re as _re

    rev: dict[str, str] = {}
    marks = ["\x00a", "\x00b", "\x00c"]
    pats = [
        _re.compile(
            r"^([A-Za-z_][A-Za-z0-9_]*)\(" + ", ".join(marks[: n + 1]) + r"\)$"
        )
        for n in range(3)
    ]
    for canon, dialects in _SPECIAL.items():
        # probe at arities 1-3: a pure rename interpolates exactly its
        # probe args in order, whatever the renderer's internal shape
        for n in (3, 2, 1):
            try:
                rendered = dialects["spark"](marks[:n])
            except Exception:
                continue
            m = pats[n - 1].match(rendered)
            if not m:
                continue
            name = m.group(1)
            if name == canon or name in _SPECIAL or name in _COMMON:
                continue
            rev.setdefault(name, canon)
    return rev


# e.g. size->array_size, percentile->percentile_cont, char->chr,
# hex->to_hex, instr->strpos, listagg handled by the parser directly
SPARK_NAME_TO_CANONICAL: dict[str, str] = _spark_reverse()


def render_func(name: str, args_sql: list[str], dialect: str) -> str:
    """Render canonical function ``name`` over already-rendered args."""
    name = canonical(name)
    if name in _SPECIAL:
        return _SPECIAL[name][dialect](args_sql)
    if name in _COMMON:
        return _plain(name)(args_sql)
    # Pass-through, exactly like the reference's fun.to_string() fallback
    # (datafusion-sqlgen/src/expr.rs:88) — lets dialect-valid functions
    # through without registry churn.
    return _plain(name)(args_sql)


# Spark Column-side: canonical name -> pyspark.sql.functions call.
_COLUMN_OVERRIDES: dict[str, Callable[..., Column]] = {
    "ln": lambda c: F.log(c),
    "array_size": lambda c: F.size(c),
    "string_length": lambda c: F.length(c),
    "strpos": lambda s, sub: F.instr(s, sub),
    "split": lambda s, p: F.split(s, p),
    "stddev": F.stddev_samp,
    "variance": F.var_samp,
    "power": F.pow,
    "ifnull": lambda a, b: F.coalesce(a, b),
    # python wrapper expects str args; call the SQL function directly
    "date_trunc": lambda *a: F.call_function("date_trunc", *a),
    "regexp_extract": lambda *a: F.call_function("regexp_extract", *a),
    "regexp_replace": lambda *a: F.call_function("regexp_replace", *a),
    "lag": lambda *a: F.call_function("lag", *a),
    "lead": lambda *a: F.call_function("lead", *a),
    "ntile": lambda *a: F.call_function("ntile", *a),
    # python wrapper wants a str delimiter; the SQL function takes a Column
    "array_join": lambda *a: F.call_function("array_join", *a),
    "nth_value": lambda *a: F.call_function("nth_value", *a),
    "percentile_cont": lambda *a: F.call_function("percentile", *a),
    "percentile_disc": lambda *a: F.call_function("percentile_disc", *a),
    # python wrapper wants a str path; the SQL function takes a Column
    "get_json_object": lambda *a: F.call_function("get_json_object", *a),
    "chr": lambda c: F.char(c),
    "to_hex": lambda c: F.hex(c),
    "sha256": lambda c: F.sha2(c, 256),
    "split_part": lambda *a: F.call_function("split_part", *a),
    # python wrappers want str args; the SQL functions take Columns
    "translate": lambda *a: F.call_function("translate", *a),
    "btrim": lambda *a: F.call_function("btrim", *a),
    "ltrim_chars": lambda s, c: F.ltrim(s, c),
    "rtrim_chars": lambda s, c: F.rtrim(s, c),
    # python wrapper requires len; the SQL function is 2-or-3 arg
    "substring": lambda *a: F.call_function("substring", *a),
    "substr": lambda *a: F.call_function("substr", *a),
    "map": lambda *a: F.create_map(*a),
    "map_get": lambda *a: F.call_function("element_at", *a),
    "map_size": lambda c: F.size(c),
    "map_contains_key": lambda *a: F.call_function("map_contains_key", *a),
    # python wrappers want int args; the SQL functions take Columns
    "slice": lambda *a: F.call_function("slice", *a),
    "array_position": lambda *a: F.call_function("array_position", *a),
    # python wrappers want str args; the SQL functions take Columns
    "printf": lambda *a: F.call_function("printf", *a),
    "regexp_like": lambda *a: F.call_function("regexp_like", *a),
    "width_bucket": lambda *a: F.call_function("width_bucket", *a),
    "try_divide": lambda *a: F.try_divide(*a),
    "try_element_at": lambda *a: F.try_element_at(*a),
    # DF-10 straggler audit (round 4): Column-side forms of the new names
    "trunc": lambda c: c.cast("bigint").cast("double"),
    "random": lambda: F.rand(),
    "regexp_match": lambda s, p: F.call_function(
        "regexp_extract_all", s, p, F.lit(0)
    ),
    "sha224": lambda c: F.sha2(c, 224),
    "sha384": lambda c: F.sha2(c, 384),
    "sha512": lambda c: F.sha2(c, 512),
    "to_timestamp_seconds": lambda c: F.timestamp_seconds(c),
    "to_timestamp_millis": lambda c: F.timestamp_millis(c),
    "to_timestamp_micros": lambda c: F.timestamp_micros(c),
    # digest needs its algorithm LITERAL, which a Column can't expose —
    # the plan layer catches this and falls back to the SQL rendering
    "digest": lambda c, algo: _raise_sql_fallback("digest"),
    # ordered string_agg(value, sep[, order_key]): no single F.* equivalent —
    # compose sort_array(collect_list(struct(order, value))) -> join;
    # collect_list is partition-order-nondeterministic, the sort fixes it.
    # 2-arg form orders by the value itself (matches the SQL renderers).
    "string_agg": lambda v, sep, o=None: F.call_function(
        "array_join",
        F.transform(
            F.sort_array(
                F.collect_list(F.struct((v if o is None else o).alias("o"), v.alias("v")))
            ),
            lambda s: s.getField("v"),
        ),
        sep,
    ),
    # ordered array_agg(value[, order_key]): the string_agg composition
    # minus the join
    "array_agg": lambda v, o=None: F.transform(
        F.sort_array(
            F.collect_list(F.struct((v if o is None else o).alias("o"), v.alias("v")))
        ),
        lambda s: s.getField("v"),
    ),
}


def spark_func_column(name: str, cols: list) -> Column:
    """Canonical function as a JVM Column expression."""
    name = canonical(name)
    if name in _COLUMN_OVERRIDES:
        return _COLUMN_OVERRIDES[name](*cols)
    fn = getattr(F, name, None)
    if fn is not None:
        return fn(*cols)
    # F.expr fallback keeps us on the JVM even for functions the Python
    # wrapper module lacks (still whole-stage codegen, never a UDF).
    return F.call_function(name, *cols)


def spark_agg_column(name: str, cols: list, distinct: bool = False) -> Column:
    name = canonical(name)
    if distinct:
        if name == "count":
            return F.countDistinct(*cols)
        if name == "sum":
            return F.sum_distinct(*cols)
        raise ValueError(f"DISTINCT not supported for aggregate {name!r} as a "
                         "Column; use the SQL rendering path")
    return spark_func_column(name, cols)
