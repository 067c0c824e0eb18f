"""F1-F9: scalar function families (SURVEY §2.2).

Reference: the Flink 1.11 built-in function envelope declared by
study/pom.xml:149-165 (Table/SQL), JSON via flink-json (study/pom.xml:172).

All functions run JVM-side inside whole-stage codegen — no Python boundary
anywhere in this module.  Cross-engine notes (Spark vs DuckDB oracle):

* double→int CAST truncates in Spark but rounds in DuckDB — oracles use
  ``CAST(trunc(x) AS ...)`` to pin truncation semantics.
* transcendental functions (sin/exp/ln) may differ in the last ulp across
  libm builds — rounded to 6 digits on both sides.
* regex families are restricted to syntax shared by Java regex and RE2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flinkexp_spark import datasets
from flinkexp_spark.catalog._util import fmt_ts, o_fmt_ts
from flinkexp_spark.registry import register


@register(
    "func_string",
    oracle="""
        SELECT p_partkey,
               concat_ws('|', p_brand, p_type) AS brand_type,
               upper(p_name) AS uname,
               lower(p_brand) AS lbrand,
               substring(p_name, 1, 8) AS name8,
               length(p_name) AS name_len,
               replace(p_type, ' ', '_') AS type_us,
               trim(concat('  ', p_brand, ' ')) AS trimmed,
               lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4,
               regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
               regexp_replace(p_name, '[aeiou]', '.', 'g') AS devoweled,
               strpos(p_name, 'a') AS a_pos,
               (p_name LIKE '%el%') AS has_el
        FROM part WHERE p_partkey < 500
    """,
    tags=("F1",),
)
def q_func_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: string family — concat/case/substring/trim/pad/regex/position/like."""
    p = datasets.load(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.upper("p_name").alias("uname"),
        F.lower("p_brand").alias("lbrand"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size4"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", ".").alias("devoweled"),
        F.instr("p_name", "a").alias("a_pos"),
        F.col("p_name").like("%el%").alias("has_el"),
    )


@register(
    "func_math",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               abs(l_discount - 0.05) AS abs_d,
               CAST(ceil(l_quantity / 7) AS BIGINT) AS ceil_q,
               CAST(floor(l_quantity / 7) AS BIGINT) AS floor_q,
               CAST(trunc(l_quantity) AS BIGINT) % 7 AS mod_q,
               round(power(l_quantity, 1.5), 6) AS pow_q,
               round(sqrt(l_extendedprice), 6) AS sqrt_p,
               round(exp(l_discount), 6) AS exp_d,
               round(ln(l_extendedprice), 6) AS ln_p,
               round(log10(l_extendedprice), 6) AS log10_p,
               round(sin(l_quantity), 6) AS sin_q,
               round(cos(l_quantity), 6) AS cos_q,
               CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn,
               round(pi(), 6) AS pi_val
        FROM lineitem WHERE l_orderkey < 300
    """,
    tags=("F2",),
)
def q_func_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: math family (transcendentals rounded to 6 for libm stability)."""
    li = datasets.load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_d"),
        F.ceil(F.col("l_quantity") / 7).alias("ceil_q"),
        F.floor(F.col("l_quantity") / 7).alias("floor_q"),
        (F.col("l_quantity").cast("bigint") % 7).alias("mod_q"),
        F.round(F.pow(F.col("l_quantity"), 1.5), 6).alias("pow_q"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_p"),
        F.round(F.exp("l_discount"), 6).alias("exp_d"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_p"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_p"),
        F.round(F.sin("l_quantity"), 6).alias("sin_q"),
        F.round(F.cos("l_quantity"), 6).alias("cos_q"),
        F.signum(F.col("l_discount") - 0.05).alias("sgn"),
        F.round(F.lit(3.141592653589793), 6).alias("pi_val"),
    )


@register(
    "func_datetime",
    oracle=f"""
        SELECT event_id,
               year(ts) AS y, month(ts) AS mo, day(ts) AS d,
               hour(ts) AS h, minute(ts) AS mi, second(ts) AS s,
               {o_fmt_ts("date_trunc('hour', ts)", 'ts_hour')},
               {o_fmt_ts("ts + INTERVAL 90 MINUTE", 'ts_plus90m')},
               CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS INT) AS days_since,
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS unix_s,
               strftime(ts, '%Y-%m-%d') AS ymd,
               strftime(CAST('2024-03-05' AS DATE) + INTERVAL 7 DAY, '%Y-%m-%d')
                   AS fixed_plus7
        FROM events WHERE user_id < 10
    """,
    tags=("F3",),
)
def q_func_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: date/time family — extract, trunc, interval arithmetic, epoch, format."""
    e = datasets.load(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    return e.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.second("ts").alias("s"),
        fmt_ts(F.date_trunc("hour", F.col("ts")), "ts_hour"),
        fmt_ts(F.col("ts") + F.expr("INTERVAL 90 MINUTES"), "ts_plus90m"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
            "days_since"
        ),
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("unix_s"),
        F.date_format("ts", "yyyy-MM-dd").alias("ymd"),
        F.date_format(
            F.date_add(F.lit("2024-03-05").cast("date"), 7), "yyyy-MM-dd"
        ).alias("fixed_plus7"),
    )


@register(
    "func_conditional",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 250000 THEN 'high'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'low' END AS price_band,
               coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_disp,
               (o_orderpriority IS NULL) AS prio_null,
               CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END
                   AS finished_price
        FROM orders WHERE o_orderkey < 2000
    """,
    tags=("F4",),
)
def q_func_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: case-when / coalesce / nullif / isnull / if."""
    o = datasets.load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 250000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_disp"
        ),
        F.isnull("o_orderpriority").alias("prio_null"),
        F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
        .otherwise(0.0)
        .alias("finished_price"),
    )


@register(
    "func_casts",
    oracle="""
        SELECT l_orderkey,
               CAST(trunc(l_quantity) AS INT) AS qty_int,
               CAST(l_quantity AS VARCHAR) AS qty_str,
               CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec_str,
               CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date_str,
               CAST(CAST(l_linenumber AS VARCHAR) AS BIGINT) AS line_roundtrip,
               CAST(l_returnflag = 'R' AS VARCHAR) AS is_return_str
        FROM lineitem WHERE l_orderkey < 200
    """,
    tags=("F5",),
)
def q_func_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: CAST matrix across §1.3 types (truncation pinned; see module doc)."""
    li = datasets.load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_quantity").cast("string").alias("qty_str"),
        F.col("l_extendedprice").cast("decimal(12,2)").cast("string").alias(
            "price_dec_str"
        ),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_date_str"),
        F.col("l_linenumber").cast("string").cast("bigint").alias("line_roundtrip"),
        (F.col("l_returnflag") == "R").cast("string").alias("is_return_str"),
    )


@register(
    "func_array",
    oracle="""
        SELECT doc_id,
               len(words) AS n_words,
               words[1] AS first_word,
               words[-1] AS last_word,
               list_contains(words, 'data') AS has_data,
               array_to_string(words[1:5], ' ') AS first5,
               array_to_string(list_sort(words[1:5]), ',') AS first5_sorted,
               len(list_distinct(words)) AS n_unique
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
        WHERE doc_id < 100
    """,
    tags=("F6",),
)
def q_func_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: array family — size/element_at/contains/slice/sort/distinct."""
    d = datasets.load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    d = d.select("doc_id", F.split("text", " ").alias("words"))
    return d.select(
        "doc_id",
        F.size("words").alias("n_words"),
        F.element_at("words", 1).alias("first_word"),
        F.element_at("words", -1).alias("last_word"),
        F.array_contains("words", "data").alias("has_data"),
        F.array_join(F.slice("words", 1, 5), " ").alias("first5"),
        F.array_join(F.sort_array(F.slice("words", 1, 5)), ",").alias("first5_sorted"),
        F.size(F.array_distinct("words")).alias("n_unique"),
    )


@register(
    "func_map",
    oracle="""
        SELECT event_id,
               m['type'][1] AS type_val,
               m['bucket'][1] AS bucket_val,
               cardinality(m) AS m_size,
               array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted
        FROM (SELECT event_id,
                     MAP {'type': event_type,
                          'bucket': CAST(CAST(user_id AS BIGINT) % 5 AS VARCHAR)} AS m
              FROM events) t
        WHERE event_id < 500
    """,
    tags=("F7",),
)
def q_func_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: map family — constructor, element_at, map_keys, cardinality."""
    e = datasets.load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    e = e.select(
        "event_id",
        F.create_map(
            F.lit("type"),
            F.col("event_type"),
            F.lit("bucket"),
            (F.col("user_id").cast("bigint") % 5).cast("string"),
        ).alias("m"),
    )
    return e.select(
        "event_id",
        F.element_at("m", "type").alias("type_val"),
        F.element_at("m", "bucket").alias("bucket_val"),
        F.size("m").alias("m_size"),
        F.array_join(F.sort_array(F.map_keys("m")), ",").alias("keys_sorted"),
    )


@register(
    "func_json",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS INT) AS k_get,
               CAST(props ->> 'k' AS INT) AS k_parsed,
               json_valid(props) AS is_valid
        FROM events WHERE event_id < 500
    """,
    tags=("F8",),
)
def q_func_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: JSON row parsing — get_json_object + schema-declared from_json."""
    e = datasets.load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    parsed = F.from_json(F.col("props"), "k INT")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_get"),
        parsed.getField("k").alias("k_parsed"),
        F.get_json_object("props", "$").isNotNull().alias("is_valid"),
    )


@register(
    "func_hash",
    oracle="""
        SELECT doc_id,
               md5(text) AS text_md5,
               sha256(text) AS text_sha256
        FROM documents WHERE doc_id < 100
    """,
    tags=("F9",),
)
def q_func_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: cryptographic hashes (cross-engine stable); engine-specific hashes
    (xxhash64, monotonically_increasing_id, uuid) are covered by
    ``func_hash_props`` as properties."""
    d = datasets.load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@register(
    "func_hash_props",
    oracle="""
        SELECT COUNT(*) AS n_rows, TRUE AS ids_unique, TRUE AS uuids_unique,
               TRUE AS hash_stable
        FROM documents
    """,
    tags=("F9",),
)
def q_func_hash_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: nondeterministic ids checked as properties: uniqueness + stability."""
    d = datasets.load(spark, sf_dir, "documents").select(
        "doc_id",
        F.monotonically_increasing_id().alias("mid"),
        F.expr("uuid()").alias("u"),
        F.xxhash64("text").alias("h1"),
        F.xxhash64("text").alias("h2"),
    )
    return d.agg(
        F.count("*").alias("n_rows"),
        (F.countDistinct("mid") == F.count("*")).alias("ids_unique"),
        (F.countDistinct("u") == F.count("*")).alias("uuids_unique"),
        (F.count(F.when(F.col("h1") == F.col("h2"), 1)) == F.count("*")).alias(
            "hash_stable"
        ),
    )
