"""H: scalar function library — string / date / math / array / map / JSON /
hash-null queries, each with a DuckDB-twin oracle (SURVEY.md §2.2 H).

Dialect notes (verified against DuckDB 1.0):
- DuckDB lacks ``initcap``/``width_bucket`` — oracles emulate with string/
  arithmetic primitives.
- DuckDB ``regexp_replace`` is first-match unless the ``'g'`` flag is given.
- DuckDB ``sign``→TINYINT, ``ceil/floor``→DOUBLE, ``year/length/instr``→BIGINT;
  both sides cast to common types explicitly.
- DuckDB ``dayofweek`` is 0=Sunday; Spark is 1=Sunday.
- Transcendentals (pow/exp/ln/…) are not guaranteed correctly rounded across
  libm implementations → ROUND(…, 6) on both sides per FIXTURES.md rule 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from daas_apps_spark.catalog import table
from daas_apps_spark.registry import register


@register(
    "h_string_functions",
    oracle="""
    SELECT doc_id,
           upper(lang) AS lang_up,
           lower(source) AS source_low,
           substring(text, 1, 20) AS prefix20,
           CAST(length(text) AS BIGINT) AS len_chars,
           trim(' ' || lang || ' ') AS lang_trim,
           lpad(lang, 5, '_') AS lang_lpad,
           rpad(lang, 5, '.') AS lang_rpad,
           replace(lang, 'e', 'E') AS lang_repl,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           regexp_extract(text, '^(\\w+)', 1) AS first_word,
           regexp_replace(lang, '[aeiou]', '*', 'g') AS lang_mask,
           (text LIKE '%data%') AS has_data,
           starts_with(source, 'src1') AS is_src1x,
           ends_with(source, '0') AS ends_zero,
           CAST(instr(text, 'spark') AS BIGINT) AS spark_pos,
           reverse(lang) AS lang_rev,
           translate(source, 'src', 'SRC') AS source_translated,
           upper(substring(lang, 1, 1)) || lower(substring(lang, 2)) AS lang_initcap,
           CAST(levenshtein(lang, 'en') AS BIGINT) AS lev_to_en,
           concat_ws('-', lang, source) AS lang_source
    FROM documents
    """,
    tags=("H",),
)
def h_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery over documents."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_up"),
        F.lower("source").alias("source_low"),
        F.substring("text", 1, 20).alias("prefix20"),
        F.length("text").cast("long").alias("len_chars"),
        F.trim(F.concat(F.lit(" "), F.col("lang"), F.lit(" "))).alias("lang_trim"),
        F.lpad("lang", 5, "_").alias("lang_lpad"),
        F.rpad("lang", 5, ".").alias("lang_rpad"),
        F.replace(F.col("lang"), F.lit("e"), F.lit("E")).alias("lang_repl"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.regexp_extract("text", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("lang", "[aeiou]", "*").alias("lang_mask"),
        F.col("text").like("%data%").alias("has_data"),
        F.col("source").startswith("src1").alias("is_src1x"),
        F.col("source").endswith("0").alias("ends_zero"),
        F.instr("text", "spark").cast("long").alias("spark_pos"),
        F.reverse("lang").alias("lang_rev"),
        F.translate("source", "src", "SRC").alias("source_translated"),
        F.initcap("lang").alias("lang_initcap"),
        F.levenshtein("lang", F.lit("en")).cast("long").alias("lev_to_en"),
        F.concat_ws("-", "lang", "source").alias("lang_source"),
    )


@register(
    "h_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(day(o_orderdate) AS INTEGER) AS order_day,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS order_dow,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(CAST(o_orderdate AS DATE) + 10 AS VARCHAR) AS plus10,
           CAST(CAST(o_orderdate AS DATE) - 10 AS VARCHAR) AS minus10,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER)
               AS days_since_epoch95,
           CAST(date_diff('month', DATE '1995-01-01',
                          CAST(date_trunc('month', o_orderdate) AS DATE)) AS DOUBLE)
               AS months_since_95,
           strftime(o_orderdate, '%Y-%m-%d') AS date_roundtrip,
           epoch_us(o_orderdate) // 1000000 AS unix_secs,
           strftime(to_timestamp(epoch_us(o_orderdate) // 1000000),
                    '%Y-%m-%d %H:%M:%S') AS from_unix_str,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
           CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS VARCHAR)
               AS plus2months
    FROM orders
    """,
    tags=("H",),
)
def h_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery over orders."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.dayofweek(d).alias("order_dow"),
        F.date_trunc("month", d).alias("month_start"),
        F.date_add(d, 10).cast("string").alias("plus10"),
        F.date_sub(d, 10).cast("string").alias("minus10"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_epoch95"),
        F.months_between(
            F.date_trunc("month", d), F.lit("1995-01-01 00:00:00").cast("timestamp")
        ).alias("months_since_95"),
        # DATE outputs rendered as strings: the pandas/arrow bridge upcasts
        # DuckDB DATE to midnight datetime64 while Spark keeps datetime.date —
        # strings sidestep the representation mismatch on the hash path.
        F.date_format(F.to_date(F.date_format(d, "yyyy-MM-dd")), "yyyy-MM-dd").alias(
            "date_roundtrip"
        ),
        F.unix_timestamp(d).alias("unix_secs"),
        F.from_unixtime(F.unix_timestamp(d)).alias("from_unix_str"),
        F.last_day(d).cast("string").alias("month_end"),
        F.add_months(d, 2).cast("string").alias("plus2months"),
    )


@register(
    "h_math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25.0) AS qty_dev,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_ceil_k,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_floor_k,
           round(l_extendedprice / 7, 2) AS price_seventh,
           round(pow(1 + l_discount, 2), 6) AS disc_sq,
           round(sqrt(l_extendedprice), 6) AS price_sqrt,
           round(exp(l_discount), 6) AS disc_exp,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(log10(l_extendedprice), 6) AS price_log10,
           round(log2(l_extendedprice), 6) AS price_log2,
           CAST(sign(l_quantity - 25.0) AS INTEGER) AS qty_sign,
           greatest(l_quantity, l_discount * 100) AS g_val,
           least(l_quantity, l_tax * 100) AS l_val
    FROM lineitem
    WHERE l_linenumber = 1
    """,
    tags=("H",),
)
def h_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function battery (transcendentals rounded to 6 places)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.ceil(price / 1000).alias("price_ceil_k"),
        F.floor(price / 1000).alias("price_floor_k"),
        F.round(price / 7, 2).alias("price_seventh"),
        F.round(F.pow(F.col("l_discount") + 1, 2), 6).alias("disc_sq"),
        F.round(F.sqrt(price), 6).alias("price_sqrt"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.log(price), 6).alias("price_ln"),
        F.round(F.log10(price), 6).alias("price_log10"),
        F.round(F.log2(price), 6).alias("price_log2"),
        F.signum(F.col("l_quantity") - 25.0).cast("int").alias("qty_sign"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("g_val"),
        F.least(F.col("l_quantity"), F.col("l_tax") * 100).alias("l_val"),
    )


@register(
    "h_array_functions",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS n_dims,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           array_to_string(list_transform(embedding[1:3],
                x -> CAST(CAST(x AS DECIMAL(18,4)) AS VARCHAR)), ',') AS head3,
           array_to_string(list_transform(
                list_sort(list_transform(embedding[1:5], x -> CAST(x AS DOUBLE))),
                x -> CAST(CAST(x AS DECIMAL(18,4)) AS VARCHAR)), ',') AS head5_sorted,
           array_to_string(list_sort(list_distinct(list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * 4) AS BIGINT)))), ',') AS quarter_buckets,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive,
           (len(list_filter(embedding, x -> x > 2)) > 0) AS any_gt2,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS elem_sum,
           round(list_dot_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[])), 4) AS self_dot
    FROM embeddings
    """,
    tags=("H", "K4"),
)
def h_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order function battery over embeddings.

    ``transform/filter/exists/aggregate/zip_with`` stay inside Catalyst
    (no Python UDF): at 100 TB these run in whole-stage codegen.

    Array outputs are serialized to scalar strings (decimal-fixed elements,
    comma-joined) so every driver-visible column is hashable.
    """
    e = table(spark, sf_dir, "embeddings")
    emb_d = F.transform("embedding", lambda x: x.cast("double"))

    def dec_join(arr):
        return F.array_join(
            F.transform(arr, lambda x: x.cast("decimal(18,4)").cast("string")), ","
        )

    return e.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        dec_join(F.slice(emb_d, 1, 3)).alias("head3"),
        dec_join(F.sort_array(F.slice(emb_d, 1, 5))).alias("head5_sorted"),
        F.array_join(
            F.sort_array(
                F.array_distinct(
                    F.transform("embedding", lambda x: F.floor(x.cast("double") * 4))
                )
            ).cast("array<string>"),
            ",",
        ).alias("quarter_buckets"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        F.exists("embedding", lambda x: x > 2).alias("any_gt2"),
        F.round(
            F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("elem_sum"),
        F.round(
            F.aggregate(
                F.zip_with(emb_d, emb_d, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("self_dot"),
    )


@register(
    "h_map_functions",
    oracle="""
    SELECT event_id,
           event_type AS type_from_map,
           CAST(floor(value / 100) AS BIGINT) AS bucket_from_map,
           2 AS map_size,
           'bucket,type' AS sorted_keys,
           event_type AS type_from_entries,
           CAST(floor(value / 100) AS BIGINT) AS bucket_after_concat
    FROM events
    """,
    tags=("H",),
)
def h_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction/extraction round-trip over events.

    The oracle reconstructs the same scalars from base columns — verifying
    that map construction → element_at / map_concat / map_from_entries
    round-trips values exactly.
    """
    e = table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 100)
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("bucket"), bucket.cast("string")
    )
    m2 = F.map_from_entries(
        F.array(F.struct(F.lit("type").alias("k"), F.col("event_type").alias("v")))
    )
    mc = F.map_concat(
        F.create_map(F.lit("bucket"), bucket.cast("string")),
        F.create_map(F.lit("extra"), F.lit("x")),
    )
    return e.select(
        "event_id",
        F.element_at(m, "type").alias("type_from_map"),
        F.element_at(m, "bucket").cast("long").alias("bucket_from_map"),
        F.size(m).alias("map_size"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("sorted_keys"),
        F.element_at(m2, "type").alias("type_from_entries"),
        F.element_at(mc, "bucket").cast("long").alias("bucket_after_concat"),
    )


@register(
    "h_json_functions",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           to_json({'k': CAST(json_extract_string(props, '$.k') AS INTEGER)}) AS rejson,
           json_extract_string(props, '$.missing') AS missing_key,
           CAST(hour(ts) AS INTEGER) AS event_hour,
           CAST(minute(ts) AS INTEGER) AS event_minute
    FROM events
    """,
    tags=("H",),
)
def h_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extract / parse / re-serialize over events.props."""
    e = table(spark, sf_dir, "events")
    k_int = F.from_json("props", "k INT").getField("k")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        k_int.alias("k_int"),
        F.to_json(F.struct(k_int.alias("k"))).alias("rejson"),
        F.get_json_object("props", "$.missing").alias("missing_key"),
        F.hour("ts").alias("event_hour"),
        F.minute("ts").alias("event_minute"),
    )


@register(
    "h_hash_null_functions",
    oracle="""
    SELECT c_custkey,
           (NULLIF(c_mktsegment, 'BUILDING') IS NULL) AS is_building,
           c_acctbal AS nan_guarded,
           md5(c_mktsegment) AS seg_md5,
           sha256(c_name) AS name_sha256,
           isnan(CAST('NaN' AS DOUBLE)) AS nan_detect
    FROM customer
    """,
    tags=("H",),
)
def h_hash_null_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """isnull / isnan / nanvl + md5 / sha2 digests (oracle-checked)."""
    c = table(spark, sf_dir, "customer")
    nan = F.lit(float("nan"))
    return c.select(
        "c_custkey",
        F.isnull(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))).alias("is_building"),
        F.nanvl(nan, F.col("c_acctbal")).alias("nan_guarded"),
        F.md5("c_mktsegment").alias("seg_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
        F.isnan(nan).alias("nan_detect"),
    )


@register(
    "h_array_nested_functions",
    oracle="""
    WITH base AS (
        SELECT vec_id,
               list_transform(embedding[1:2], x -> CAST(x AS DOUBLE)) AS h2,
               list_transform(embedding[3:4], x -> CAST(x AS DOUBLE)) AS n2,
               list_transform(embedding[1:4], x -> CAST(x AS DOUBLE)) AS h4
        FROM embeddings
    )
    SELECT vec_id, pos, CAST(h4[pos + 1] AS DOUBLE) AS elem,
           array_to_string(list_transform(flatten([h2, n2]),
                x -> CAST(CAST(x AS DECIMAL(18,4)) AS VARCHAR)), ',') AS flat4,
           CAST(len(list_zip(h2, n2)) AS INTEGER) AS zip_len,
           array_to_string(list_transform(list_zip(h2, n2),
                s -> CAST(CAST(s[1] + s[2] AS DECIMAL(18,4)) AS VARCHAR)), ',') AS pairwise_sum,
           CAST(list_position(h4, h4[1]) AS INTEGER) AS first_pos,
           list_contains(h4, h4[2]) AS contains_second
    FROM base, unnest(range(4)) AS t(pos)
    """,
    tags=("H",),
)
def h_array_nested_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-array battery: flatten / arrays_zip / posexplode / position.

    posexplode emits (pos, elem) rows — the UDTF-ish built-in (J6's shape);
    arrays_zip parity is checked through a scalar projection of the zipped
    structs because Spark and DuckDB name zip fields differently.
    """
    e = table(spark, sf_dir, "embeddings")
    h2 = F.transform(F.slice("embedding", 1, 2), lambda x: x.cast("double"))
    n2 = F.transform(F.slice("embedding", 3, 2), lambda x: x.cast("double"))
    h4 = F.transform(F.slice("embedding", 1, 4), lambda x: x.cast("double"))
    base = e.select(
        "vec_id", h2.alias("h2"), n2.alias("n2"), h4.alias("h4")
    )
    return (
        base.select(
            "vec_id", "h2", "n2", "h4",
            F.posexplode("h4").alias("pos", "elem"),
        )
        .select(
            "vec_id",
            "pos",
            "elem",
            F.array_join(
                F.transform(
                    F.flatten(F.array("h2", "n2")),
                    lambda x: x.cast("decimal(18,4)").cast("string"),
                ),
                ",",
            ).alias("flat4"),
            F.size(F.arrays_zip("h2", "n2")).alias("zip_len"),
            F.array_join(
                F.transform(
                    F.arrays_zip("h2", "n2"),
                    lambda s: (s["h2"] + s["n2"]).cast("decimal(18,4)").cast("string"),
                ),
                ",",
            ).alias("pairwise_sum"),
            F.array_position("h4", F.element_at("h4", 1)).cast("int").alias("first_pos"),
            F.array_contains("h4", F.element_at("h4", 2)).alias("contains_second"),
        )
    )


@register(
    "h_variant_functions",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_variant,
           CAST(json_extract_string(props, '$.k') AS INTEGER) IS NULL
               AS k_missing,
           json_extract_string(props, '$.nope') AS nope_try
    FROM events
    """,
    tags=("H", "H-variant"),
)
def h_variant_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VariantType path (Spark 4): ``parse_json`` →
    binary-encoded variant → typed ``variant_get`` extraction.

    Variant is the scale path for ragged JSON: parsed ONCE into a
    traversable binary encoding instead of re-parsing the string per
    extraction (`h_json_functions` is the string-path twin). Outputs are
    extracted as typed scalars so the driver canonicalizer hashes them;
    `try_variant_get` on a missing path yields NULL, not an error.
    """
    e = table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_variant"),
        F.variant_get(v, "$.k", "int").isNull().alias("k_missing"),
        F.try_variant_get(v, "$.nope", "string").alias("nope_try"),
    )


@register(
    "h_try_functions",
    oracle="""
    SELECT c_custkey,
           TRY_CAST(c_name AS INTEGER) AS name_as_int,
           TRY_CAST(substring(c_name, 10, 9) AS INTEGER) AS name_num,
           CASE WHEN (c_custkey % 10) = 0 THEN NULL
                ELSE CAST(c_acctbal AS DOUBLE) / (c_custkey % 10) END
               AS safe_div
    FROM customer
    """,
    tags=("H", "H-try"),
)
def h_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe error-handling scalars: ``try_cast`` / ``try_divide``.

    The session pins ANSI mode (session.py), where a bad cast or a /0 is a
    runtime ERROR — the correct default at 100 TB (silent NULLs hide data
    corruption). The try_* family is the explicit, per-expression opt-out
    for genuinely dirty fields; both engines agree NULL-for-NULL.
    """
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_name").try_cast("int").alias("name_as_int"),
        F.substring("c_name", 10, 9).try_cast("int").alias("name_num"),
        F.try_divide(F.col("c_acctbal").cast("double"), F.col("c_custkey") % 10).alias(
            "safe_div"
        ),
    )


@register(
    "h_bitwise_functions",
    oracle="""
    SELECT event_id,
           event_id & 255 AS low_byte,
           (event_id & 255) | 16 AS or_flag,
           xor(event_id & 255, 77) AS xor_masked,
           (event_id & 15) << 3 AS shifted_left,
           event_id >> 4 AS shifted_right,
           CAST(bit_count(event_id) AS INTEGER) AS n_bits,
           ~(event_id & 255) AS complement
    FROM events
    """,
    tags=("H",),
)
def h_bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator battery: AND/OR/XOR, shifts, popcount, complement.

    Bit arithmetic is exact on both engines (two's-complement BIGINT), so
    every column hash-matches without rounding discipline. These are the
    primitives under the engine's own hash-bucket operators (K2 minhash
    band keys, A13 Morton interleave) — declared here as a user-facing
    surface.
    """
    e = table(spark, sf_dir, "events")
    low = F.col("event_id").bitwiseAND(F.lit(255))
    return e.select(
        "event_id",
        low.alias("low_byte"),
        low.bitwiseOR(F.lit(16)).alias("or_flag"),
        low.bitwiseXOR(F.lit(77)).alias("xor_masked"),
        F.shiftleft(F.col("event_id").bitwiseAND(F.lit(15)), 3).alias(
            "shifted_left"
        ),
        F.shiftright("event_id", 4).alias("shifted_right"),
        F.bit_count("event_id").alias("n_bits"),
        F.bitwise_not(low).alias("complement"),
    )


@register(
    "h_regexp_functions",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, 'data')) AS BIGINT) AS n_data,
           NULLIF(regexp_extract(text, 'sp[a-z]+'), '') AS first_sp_word,
           COALESCE(array_to_string(regexp_extract_all(text, '[0-9]+'), ','), '')
               AS all_numbers,
           split_part(text, ' ', 2) AS second_token,
           regexp_matches(text, '^[a-z]+ [a-z]+') AS two_lower_words,
           regexp_replace(text, '[0-9]+', '#', 'g') AS masked
    FROM documents
    """,
    tags=("H",),
)
def h_regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp battery: match counting, first/all extraction, field split,
    boolean match, global masking.

    Dialect notes: Spark ``regexp_substr`` returns NULL on no-match while
    DuckDB ``regexp_extract`` returns '' (NULLIF twin); Spark ``array_join``
    of an empty array is '' while DuckDB ``array_to_string`` is NULL
    (COALESCE twin). Both sides' ``split_part`` agree on '' out-of-range.
    """
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit("data")).cast("long").alias("n_data"),
        F.regexp_substr("text", F.lit("sp[a-z]+")).alias("first_sp_word"),
        F.array_join(F.regexp_extract_all("text", F.lit("([0-9]+)")), ",").alias(
            "all_numbers"
        ),
        F.split_part("text", F.lit(" "), F.lit(2)).alias("second_token"),
        F.col("text").rlike("^[a-z]+ [a-z]+").alias("two_lower_words"),
        F.regexp_replace("text", "[0-9]+", "#").alias("masked"),
    )


@register(
    "h_interval_functions",
    oracle="""
    SELECT event_id,
           ts + INTERVAL 90 MINUTE AS ts_plus_90m,
           ts - INTERVAL 1 DAY AS ts_minus_1d,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS next_hour,
           CAST(date_diff('minute', date_trunc('day', ts), ts) AS BIGINT)
               AS mins_into_day,
           (ts + INTERVAL 30 MINUTE > date_trunc('hour', ts) + INTERVAL 1 HOUR)
               AS crosses_hour
    FROM events
    """,
    tags=("H",),
)
def h_interval_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic battery: timestamp ± day-time intervals,
    bucket-boundary derivation, sub-day offset extraction, and an
    interval-comparison predicate — the primitives under every windowing
    and as-of operator (C10's tolerance, I1's buckets, T1's spine).

    Spark's `timestampdiff(MINUTE, …)` and DuckDB's `date_diff('minute',
    …)` both count whole boundary crossings, and the day-truncated anchor
    is minute-aligned, so the offsets agree exactly; interval-shifted
    timestamps hash as µs instants on both engines.
    """
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("ts_plus_90m"),
        (F.col("ts") - F.expr("INTERVAL 1 DAY")).alias("ts_minus_1d"),
        (F.date_trunc("hour", "ts") + F.expr("INTERVAL 1 HOUR")).alias("next_hour"),
        F.expr("timestampdiff(MINUTE, date_trunc('day', ts), ts)")
        .cast("long")
        .alias("mins_into_day"),
        (
            F.col("ts") + F.expr("INTERVAL 30 MINUTES")
            > F.date_trunc("hour", "ts") + F.expr("INTERVAL 1 HOUR")
        ).alias("crosses_hour"),
    )


@register(
    "h_url_functions",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com/' || lang || '/doc-'
                   || CAST(doc_id AS VARCHAR) || '?ref=' || lang AS url
        FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^https?://([^/]+)', 1) AS host,
           regexp_extract(url, '^https?://[^/]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS ref_param,
           array_to_string(
               string_split(regexp_extract(url, '^https?://([^/]+)', 1), '.')[-2:],
               '.') AS registrable_domain
    FROM u
    """,
    tags=("H", "K14"),
)
def h_url_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing battery: host / path / query-parameter extraction and
    registrable-domain derivation — the primitives under web-corpus domain
    censuses and K14 domain mixing (CommonCrawl-style pipelines group and
    sample by registrable domain, not full host).

    URLs are synthesized deterministically from document columns so the
    check exercises parsing, not fixture contents. Spark uses the native
    `parse_url` (HOST/PATH/QUERY-key) and `substring_index`; DuckDB has
    neither, so the oracle re-derives each part with anchored regexps and
    a tail slice of the dot-split host — dialect twins documented here.
    """
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/"),
        F.col("lang"), F.lit("/doc-"), F.col("doc_id").cast("string"),
        F.lit("?ref="), F.col("lang"),
    )
    host = F.parse_url(url, F.lit("HOST"))
    return d.select(
        "doc_id",
        host.alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
        F.substring_index(host, ".", -2).alias("registrable_domain"),
    )


@register(
    "h_struct_functions",
    oracle="""
    SELECT o_orderkey,
           ((o_custkey, o_orderkey) > (750, 100000)) AS pair_gt,
           ((o_orderstatus, o_orderpriority) = ('O', '1-URGENT')) AS status_eq,
           ({'cust': o_custkey, 'price': o_totalprice}).price AS price_rt,
           ([{'k': o_custkey}, {'k': o_orderkey}][1]).k AS first_elem_k,
           (CASE WHEN (o_custkey, o_orderkey) < (o_orderkey, o_custkey)
                 THEN 'cust_first' ELSE 'order_first' END) AS order_decision
    FROM orders
    """,
    tags=("H", "B7"),
)
def h_struct_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct battery: construction (struct / named_struct), field
    extraction, lexicographic struct comparison (=, >, <), and structs
    inside arrays — Spark `struct(...)` ordering against DuckDB's
    row-value `(a, b)` tuples, field access against DuckDB struct
    literals. Struct comparison is the engine-internal primitive under
    every min_by/max_by-on-(key, tiebreak) pattern (T2 OHLC, D8 argmax);
    this query pins that both engines agree on the ordering itself.

    Codegen note: array-of-struct element extraction uses 0-based
    `getItem(0)` (GetArrayItem) rather than 1-based `element_at(.., 1)`:
    ElementAt→GetStructField trips a whole-stage-codegen bug in this
    Spark build ("Expression isNull_N is not an rvalue") whenever it
    shares a projection with any other column, silently demoting the
    whole stage to the interpreted path — a per-task perf cliff at
    scale. GetArrayItem generates clean code; the two are identical on
    a non-null 2-element literal array.
    """
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (
            F.struct(F.col("o_custkey"), F.col("o_orderkey"))
            > F.struct(F.lit(750).cast("long"), F.lit(100000).cast("long"))
        ).alias("pair_gt"),
        (
            F.struct(F.col("o_orderstatus"), F.col("o_orderpriority"))
            == F.struct(F.lit("O"), F.lit("1-URGENT"))
        ).alias("status_eq"),
        F.named_struct(
            F.lit("cust"), F.col("o_custkey"), F.lit("price"), F.col("o_totalprice")
        )["price"].alias("price_rt"),
        F.array(
            F.struct(F.col("o_custkey").alias("k")),
            F.struct(F.col("o_orderkey").alias("k")),
        )
        .getItem(0)["k"]
        .alias("first_elem_k"),
        F.when(
            F.struct(F.col("o_custkey"), F.col("o_orderkey"))
            < F.struct(F.col("o_orderkey"), F.col("o_custkey")),
            F.lit("cust_first"),
        )
        .otherwise(F.lit("order_first"))
        .alias("order_decision"),
    )


@register(
    "h_timezone_functions",
    oracle="""
    SELECT event_id,
           CAST(ts AS TIMESTAMP) AS ts_utc,
           (ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York') AS ny_local,
           (ts AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Tokyo') AS tokyo_local,
           CAST(EXTRACT(hour FROM ts AT TIME ZONE 'UTC'
                        AT TIME ZONE 'America/New_York') AS BIGINT) AS ny_hour,
           CAST((epoch_us(ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York')
                 - epoch_us(ts)) / 60000000 AS BIGINT) AS ny_offset_min,
           ((ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York')
            AT TIME ZONE 'America/New_York' AT TIME ZONE 'UTC' = ts)
               AS roundtrip_ok
    FROM events
    """,
    tags=("H", "I1"),
)
def h_timezone_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone-conversion battery: UTC→zone wall-clock shifts
    (`from_utc_timestamp` ↔ DuckDB's AT TIME ZONE pair), zone-local hour
    extraction, the derived UTC-offset in minutes, and the
    `to_utc_timestamp` round-trip — the primitives under any
    local-business-hours variant of the T7/I1 bucketing. The fixture's
    event range (January) contains no DST transition, so local-time
    ambiguity — where engines may legitimately disagree — is out of
    scope by construction; the offset column would surface it instantly
    (-300 EST vs -240 EDT).
    """
    e = table(spark, sf_dir, "events")
    ny = F.from_utc_timestamp("ts", "America/New_York")
    return e.select(
        "event_id",
        F.col("ts").alias("ts_utc"),
        ny.alias("ny_local"),
        F.from_utc_timestamp("ts", "Asia/Tokyo").alias("tokyo_local"),
        F.hour(ny).cast("long").alias("ny_hour"),
        (
            (F.unix_micros(ny) - F.unix_micros("ts")) / F.lit(60_000_000)
        ).cast("long").alias("ny_offset_min"),
        (F.to_utc_timestamp(ny, "America/New_York") == F.col("ts")).alias(
            "roundtrip_ok"
        ),
    )


@register(
    "h_collation_functions",
    oracle="""
    WITH c AS (
        SELECT p_name, p_type FROM part
    )
    SELECT LOWER(SUBSTRING(p_type, 1, 5)) AS type_ci,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT LOWER(p_name)) AS BIGINT) AS n_names,
           MIN(LOWER(p_name)) AS first_name_ci
    FROM c
    GROUP BY LOWER(SUBSTRING(p_type, 1, 5))
    """,
    tags=("H", "B6"),
)
def h_collation_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware string semantics (Spark 4 `COLLATE`): group and
    MIN under UTF8_LCASE — comparison/grouping/ordering that ignores
    case WITHOUT rewriting every expression through lower().

    The oracle expresses the same semantics with explicit LOWER() twins
    (exact for this corpus — UTF8_LCASE is lowercase-based comparison,
    and the fixture strings are ASCII where the two coincide); the Spark
    side exercises the real collation machinery: a collated column makes
    every downstream comparison, GROUP BY key, and MIN ordering
    case-insensitive, while the emitted value must be normalized
    explicitly (collation changes comparison, not bytes — hence the
    lower() on output columns only).

    Scale: collation is a per-comparison property compiled into codegen —
    no extra pass, no UDF; grouping on a collated key hashes its
    collation key exactly like any other grouping.
    """
    p = table(spark, sf_dir, "part")
    c = p.select(
        F.expr("p_name COLLATE UTF8_LCASE").alias("name_ci"),
        F.expr("substring(p_type, 1, 5) COLLATE UTF8_LCASE").alias("type_ci"),
    )
    return (
        c.groupBy("type_ci")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.countDistinct("name_ci").alias("n_names"),
            F.min("name_ci").alias("first_name_ci"),
        )
        .select(
            # collation affects comparison, not bytes: normalize outputs so
            # the hash compares the VALUES the ci-semantics produce
            F.lower(F.col("type_ci").cast("string")).alias("type_ci"),
            "n_parts",
            "n_names",
            F.lower(F.col("first_name_ci").cast("string")).alias(
                "first_name_ci"
            ),
        )
    )


@register(
    "h_format_functions",
    oracle="""
    SELECT o_orderkey,
           printf('%08d', o_orderkey) AS key_padded,
           printf('%.2f', o_totalprice) AS price_fixed,
           printf('%e', CAST(o_orderkey * 12345 AS DOUBLE)) AS key_sci,
           printf('%x', o_orderkey * 2654435761 % 4294967296) AS key_hex,
           format('{:,}', CAST(FLOOR(o_totalprice) AS BIGINT)) AS price_grouped,
           lpad(CAST(o_orderkey AS VARCHAR), 12, '*') AS key_lpad,
           CAST(REPLACE('12,345.67', ',', '') AS DECIMAL(10,2)) AS parsed_amt
    FROM orders WHERE o_orderkey < 50
    """,
    tags=("H",),
)
def h_format_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Formatting/parsing battery: printf-style padding, fixed/scientific
    rendering, hex, locale-free thousands grouping, lpad, and
    numeric parsing (`to_number` with a format mask vs DuckDB's
    strip-and-cast twin). Float-to-string is the subtle cross-engine
    surface here: Java's Formatter and C's printf agree on %.2f/%e for
    every double whose decimal rendering doesn't hit a rounding midpoint
    — %.2f of 2-decimal prices never does, but %e DOES (the mantissa
    shift re-exposes the trailing 5, where Java rounds HALF_UP and C
    half-even), so the scientific column runs on an exactly-representable
    integer-valued double instead — midpoint-avoidance is the battery's
    documented determinism contract; %x runs on an exact integer Knuth-hash so the
    hex path is integer-only.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 50)
    return o.select(
        "o_orderkey",
        F.format_string("%08d", "o_orderkey").alias("key_padded"),
        F.format_string("%.2f", "o_totalprice").alias("price_fixed"),
        F.format_string("%e", F.expr("cast(o_orderkey * 12345 as double)")).alias("key_sci"),
        F.format_string(
            "%x", F.expr("o_orderkey * 2654435761L % 4294967296L")
        ).alias("key_hex"),
        F.format_number(F.floor("o_totalprice").cast("long"), 0).alias(
            "price_grouped"
        ),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "*").alias("key_lpad"),
        F.expr("to_number('12,345.67', '99,999.99')").alias("parsed_amt"),
    )


@register(
    "h_string_extras",
    oracle="""
    SELECT doc_id,
           ascii(substring(text, 1, 1)) AS first_cp,
           chr(65 + CAST(doc_id % 26 AS INTEGER)) AS doc_letter,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(length(text) AS BIGINT) AS n_chars_len,
           base64(encode(substring(text, 1, 12))) AS head_b64,
           CAST(from_base64(base64(encode(substring(text, 1, 12))))
                AS VARCHAR) AS head_roundtrip,
           left(text, 8) AS head8,
           right(text, 8) AS tail8,
           repeat(substring(text, 1, 2), 3) AS rep6,
           split_part(text, ' ', 2) AS second_word,
           CAST(position('the' IN text) AS BIGINT) AS the_pos
    FROM documents WHERE doc_id < 40
    """,
    tags=("H", "K5"),
)
def h_string_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string battery — the byte-vs-character boundary and
    codec surface the first battery leaves out: code-point extraction
    (`ascii`/`chr`), byte length vs character length (they diverge on
    any non-ASCII text — the truncation-budget trap when a tokenizer
    bills by bytes and a UI bills by chars), base64 round-trip through
    binary, anchored `left`/`right` slicing, `repeat`, delimiter-indexed
    `split_part` (Spark spells it `split(...)[i]` — the oracle pins the
    1-based/0-based correspondence), and substring `position`.
    """
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    head12 = F.substring("text", 1, 12)
    return d.select(
        "doc_id",
        F.ascii(F.substring("text", 1, 1)).alias("first_cp"),
        F.chr(65 + F.col("doc_id") % 26).alias("doc_letter"),
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.char_length("text").cast("long").alias("n_chars_len"),
        F.base64(F.encode(head12, "UTF-8")).alias("head_b64"),
        F.decode(
            F.unbase64(F.base64(F.encode(head12, "UTF-8"))), "UTF-8"
        ).alias("head_roundtrip"),
        F.expr("left(text, 8)").alias("head8"),
        F.expr("right(text, 8)").alias("tail8"),
        F.repeat(F.substring("text", 1, 2), 3).alias("rep6"),
        F.coalesce(F.split(F.col("text"), " ")[1], F.lit("")).alias("second_word"),
        F.instr("text", "the").cast("long").alias("the_pos"),
    )


@register(
    "h_csv_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) || ',' || o_orderstatus || ','
               || printf('%.2f', o_totalprice) AS as_csv,
           split_part('42,HIGH,19.5', ',', 1)::BIGINT AS parsed_id,
           split_part('42,HIGH,19.5', ',', 2) AS parsed_label,
           split_part('42,HIGH,19.5', ',', 3)::DOUBLE AS parsed_score
    FROM orders WHERE o_orderkey < 30
    """,
    tags=("H", "A2"),
)
def h_csv_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scalar functions: `to_csv` over a struct (one row → one CSV
    line, the embed-a-record-in-a-string shape) and `from_csv` with an
    explicit schema (parse-in-place without a file reader). The oracle
    re-derives both through explicit concat / split_part + casts —
    pinning quoting-free field layout and the schema-directed type
    coercion. The %.2f render keeps the float field on the same
    midpoint-free footing as h_format_functions.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 30)
    parsed = F.from_csv(
        F.lit("42,HIGH,19.5"), F.lit("id BIGINT, label STRING, score DOUBLE")
    )
    return o.select(
        "o_orderkey",
        F.to_csv(
            F.struct(
                F.col("o_orderkey"),
                F.col("o_orderstatus"),
                F.format_string("%.2f", "o_totalprice"),
            )
        ).alias("as_csv"),
        parsed["id"].alias("parsed_id"),
        parsed["label"].alias("parsed_label"),
        parsed["score"].alias("parsed_score"),
    )


@register(
    "h_crypto_functions",
    oracle="""
    SELECT doc_id,
           substring(text, 1, 20) AS plaintext,
           substring(text, 1, 20) AS decrypted,
           true AS roundtrip_ok,
           NULL AS bad_key_result
    FROM documents WHERE doc_id < 30
    """,
    tags=("H", "K10"),
)
def h_crypto_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption surface: `aes_encrypt`/`aes_decrypt`
    round-trip (GCM mode — the ciphertext is IV-randomized and
    deliberately NOT an output column; what is deterministic, and what
    the oracle pins, is decrypt(encrypt(x)) == x) plus
    `try_aes_decrypt` with a wrong key yielding NULL instead of an
    exception — the per-column PII-vaulting primitive (K10's redaction
    removes data; encryption keeps it recoverable under key control).
    """
    key = F.lit("0123456789abcdef")  # 16-byte AES-128 key
    wrong = F.lit("fedcba9876543210")
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    plain = F.substring("text", 1, 20)
    enc = F.aes_encrypt(plain.cast("binary"), key.cast("binary"))
    dec = F.aes_decrypt(enc, key.cast("binary")).cast("string")
    bad = F.try_aes_decrypt(enc, wrong.cast("binary")).cast("string")
    return d.select(
        "doc_id",
        plain.alias("plaintext"),
        dec.alias("decrypted"),
        (dec == plain).alias("roundtrip_ok"),
        bad.alias("bad_key_result"),
    )
