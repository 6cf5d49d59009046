package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.util.Tables._
import graft.util.Det._

/** SURVEY.md §2.H — scalar function families (pandas `.str` / `.dt`
  * accessors and numpy ufuncs → `org.apache.spark.sql.functions`).
  *
  * One key per family, each exercising several functions in one projection.
  * Everything here is a built-in codegen'd expression — narrow per-row work
  * that fuses into the scan's whole-stage-codegen span; at 100 TB these are
  * free compared to the I/O.
  *
  * Dialect pairings follow the [V]-verified table in SURVEY §7.2.6:
  *  - ISO day-of-week: Spark `weekday(x)+1` ≡ DuckDB `date_part('isodow')`
  *    (raw `dayofweek` differs between engines — never used);
  *  - regex split: Spark `split` ≡ DuckDB `string_split_regex`
  *    (DuckDB's plain string_split is literal — never paired);
  *  - replace-all: DuckDB regexp_replace needs the 'g' flag to match
  *    Spark's replace-all default;
  *  - floor/ceil: Spark returns LONG, DuckDB DOUBLE → CAST ... AS BIGINT
  *    on the oracle side;
  *  - genuinely-double outputs (sqrt/ln/exp) rounded 6 dp both sides;
  *    round() on money is avoided entirely (half-up vs banker's tie risk).
  */
object ScalarFns {

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_string_basic" -> ((s, d) =>
      part(s, d).select(
          col("p_partkey"),
          lower(col("p_name")).as("name_lower"),
          upper(col("p_brand")).as("brand_upper"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 5).as("type_pfx"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          lpad(col("p_brand"), 12, "*").as("brand_pad"),
          trim(concat(lit("  "), col("p_brand"), lit("  "))).as("brand_trim"))
        .orderBy("p_partkey")),

    // pd.to_numeric(errors='coerce'): failed casts become NULL instead of
    // throwing. Coercion targets are DOUBLE (and INT only from pure
    // integer strings) because string→INT coercion of DECIMAL text is a
    // genuine engine divergence — Spark try_cast('3.5' AS INT) = NULL
    // while DuckDB TRY_CAST rounds to 4 — so that path is deliberately
    // not part of the declared parity surface
    "fn_try_cast" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          expr("try_cast(left(text, 2) AS DOUBLE)").as("head_as_num"),
          expr("try_cast(concat(CAST(doc_id AS STRING), '7') AS INT)")
            .as("idx7"),
          expr("try_cast(lang AS DOUBLE)").as("lang_as_double"))
        .orderBy("doc_id")),

    // binary plumbing (content-addressed storage / payload transport):
    // base64 and hex encodings plus a decode roundtrip proof — map-side,
    // byte-deterministic in any engine (RFC 4648 / uppercase hex both
    // sides)
    "fn_encode_decode" -> ((s, d) =>
      part(s, d).select(col("p_partkey"),
          base64(col("p_name").cast("binary")).as("b64"),
          hex(col("p_name").cast("binary")).as("hx"),
          (unbase64(base64(col("p_name").cast("binary"))).cast("string")
            === col("p_name")).as("roundtrip_ok"))
        .orderBy("p_partkey")),

    // dt.tz_convert: UTC wall time → America/New_York wall time (IANA
    // tzdb on both engines — DST boundaries agree; EDT −4 / EST −5 both
    // visible in the fixture's 2024 range)
    "fn_date_timezone" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"),
          convert_timezone(lit("UTC"), lit("America/New_York"),
            col("ts")).as("ny_ts"),
          hour(convert_timezone(lit("UTC"), lit("America/New_York"),
            col("ts"))).as("ny_hour"))
        .orderBy("event_id")),

    // the rest of the Series.str slice/transform surface: reverse,
    // translate, left/right, split_part, repeat — all codegen'd built-ins
    "fn_string_slice" -> ((s, d) =>
      documents(s, d).select(
          col("doc_id"),
          reverse(substring(col("text"), 1, 12)).as("head_rev"),
          translate(substring(col("text"), 1, 20), "aeiou", "AEIOU")
            .as("head_trans"),
          expr("left(text, 8)").as("head8"),
          expr("right(text, 8)").as("tail8"),
          split_part(col("text"), lit(" "), lit(2)).as("second_word"),
          repeat(substring(col("text"), 1, 2), 3).as("rep3"))
        .orderBy("doc_id")),

    "fn_string_match" -> ((s, d) =>
      part(s, d).select(
          col("p_partkey"),
          col("p_type").contains("BRASS").as("has_brass"),
          col("p_name").startsWith("b").as("starts_b"),
          col("p_name").endsWith("d").as("ends_d"),
          regexp_replace(col("p_name"), " ", "_").as("name_snake"),
          size(split(col("p_name"), " ")).as("n_words"))
        .orderBy("p_partkey")),

    // edit distance — the scalar primitive under fuzzy dedup/matching
    "fn_string_distance" -> ((s, d) =>
      part(s, d).select(
          col("p_partkey"),
          levenshtein(col("p_brand"), lit("Brand#10")).as("lev_brand"),
          levenshtein(lower(split(col("p_type"), " ")(0)), lit("standard"))
            .as("lev_class"))
        .orderBy("p_partkey")),

    "fn_string_regex" -> ((s, d) =>
      part(s, d).select(
          col("p_partkey"),
          regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_first"),
          regexp_extract(col("p_name"), "(\\w+)$", 1).as("name_last"),
          col("p_type").rlike("^ECONOMY|^STANDARD").as("is_cheap_class"))
        .orderBy("p_partkey")),

    "fn_date_parts" -> ((s, d) =>
      orders(s, d).select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          dayofyear(col("o_orderdate")).as("doy"),
          quarter(col("o_orderdate")).as("q"),
          (weekday(col("o_orderdate")) + 1).as("isodow"))
        .orderBy("o_orderkey")),

    "fn_date_arith" -> ((s, d) =>
      orders(s, d).select(
          col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("plus_30d"),
          datediff(lit("2002-01-01").cast("date"),
            col("o_orderdate").cast("date")).as("days_to_2002"))
        .orderBy("o_orderkey")),

    // parse/format round-trip, emitted as STRINGS (timestamp types differ
    // across the parse, strings cannot)
    "fn_date_parse_format" -> ((s, d) =>
      orders(s, d).select(
          col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_day"),
          date_format(
            to_timestamp(date_format(col("o_orderdate"), "yyyy-MM-dd"),
              "yyyy-MM-dd"),
            "yyyy/MM/dd HH:mm").as("roundtrip"))
        .orderBy("o_orderkey")),

    "fn_math" -> ((s, d) =>
      lineitem(s, d).select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_extendedprice") - 30000).as("abs_dev"),
          floor(col("l_extendedprice")).as("price_floor"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          r6(sqrt(col("l_extendedprice"))).as("price_sqrt"),
          r6(log(col("l_extendedprice"))).as("price_ln"),
          r6(exp(col("l_discount"))).as("disc_exp"),
          (col("l_quantity") * col("l_quantity")).as("qty_sq"),
          (col("l_partkey") % 7).as("pk_mod7"))
        .orderBy("l_orderkey", "l_linenumber")),

    // numpy/pandas bitwise ufuncs (&, |, ^, <<, >>) — pure codegen'd
    // integer arithmetic, map-side
    "fn_bitwise" -> ((s, d) =>
      events(s, d).select(
          col("event_id"),
          col("event_id").bitwiseAND(lit(255L)).as("band"),
          col("event_id").bitwiseOR(lit(16L)).as("bor"),
          col("event_id").bitwiseXOR(lit(85L)).as("bxor"),
          shiftleft(col("event_id") % 100, 2).as("shl"),
          shiftright(col("event_id"), 3).as("shr"))
        .orderBy("event_id")),

    "fn_json" -> ((s, d) =>
      events(s, d).select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k_int"))
        .orderBy("event_id")),

    "fn_array_explode" -> ((s, d) =>
      documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))),

    // NOTE: declared output flattens the array to a '|'-joined string —
    // the driver's pandas comparator cannot sort raw array columns
    // (CORRECTNESS_r02 'unhashable type: numpy.ndarray'); the array ops
    // themselves (slice/sort/distinct/contains) still run on real arrays.
    "fn_array_ops" -> ((s, d) => {
      val toks = split(col("text"), " ")
      documents(s, d).select(
          col("doc_id"),
          size(toks).as("n_tokens"),
          concat_ws("|", slice(toks, 1, 5)).as("first5"),
          array_contains(toks, "the").as("has_the"),
          element_at(array_sort(array_distinct(toks)), 1).as("first_sorted"))
        .orderBy("doc_id")
    }),

    // higher-order fold: per-row L2 norm of the embedding (sequential
    // double fold both engines; unit-norm fixture ⇒ ≈ 1.0)
    "fn_array_hof" -> ((s, d) =>
      embeddings(s, d).select(
          col("vec_id"),
          r6(sqrt(aggregate(
            transform(col("embedding"),
              x => x.cast("double") * x.cast("double")),
            lit(0.0), (acc, x) => acc + x))).as("l2_norm"))
        .orderBy("vec_id")),

    // map build + lookup, projected back to scalars before output
    "fn_map_ops" -> ((s, d) => {
      val m = map(lit("brand"), col("p_brand"), lit("type"), col("p_type"))
      part(s, d).select(
          col("p_partkey"),
          element_at(m, "brand").as("m_brand"),
          element_at(m, "type").as("m_type"),
          size(m).as("m_size"))
        .orderBy("p_partkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "fn_string_basic" ->
      """SELECT p_partkey, lower(p_name) AS name_lower,
        |upper(p_brand) AS brand_upper, length(p_name) AS name_len,
        |substring(p_type, 1, 5) AS type_pfx,
        |concat_ws('|', p_brand, p_type) AS brand_type,
        |lpad(p_brand, 12, '*') AS brand_pad,
        |trim(concat('  ', p_brand, '  ')) AS brand_trim
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_try_cast" ->
      """SELECT doc_id,
        |TRY_CAST(left(text, 2) AS DOUBLE) AS head_as_num,
        |TRY_CAST(concat(CAST(doc_id AS VARCHAR), '7') AS INTEGER) AS idx7,
        |TRY_CAST(lang AS DOUBLE) AS lang_as_double
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_encode_decode" ->
      """SELECT p_partkey,
        |base64(encode(p_name)) AS b64,
        |hex(p_name) AS hx,
        |(decode(from_base64(base64(encode(p_name)))) = p_name)
        |  AS roundtrip_ok
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_date_timezone" ->
      """SELECT event_id,
        |CAST(ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York'
        |  AS TIMESTAMP) AS ny_ts,
        |CAST(hour(ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York')
        |  AS INTEGER) AS ny_hour
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_string_slice" ->
      """SELECT doc_id,
        |reverse(substring(text, 1, 12)) AS head_rev,
        |translate(substring(text, 1, 20), 'aeiou', 'AEIOU') AS head_trans,
        |left(text, 8) AS head8,
        |right(text, 8) AS tail8,
        |split_part(text, ' ', 2) AS second_word,
        |repeat(substring(text, 1, 2), 3) AS rep3
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_string_match" ->
      """SELECT p_partkey,
        |contains(p_type, 'BRASS') AS has_brass,
        |starts_with(p_name, 'b') AS starts_b,
        |ends_with(p_name, 'd') AS ends_d,
        |regexp_replace(p_name, ' ', '_', 'g') AS name_snake,
        |CAST(len(string_split_regex(p_name, ' ')) AS INTEGER) AS n_words
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_string_distance" ->
      """SELECT p_partkey,
        |CAST(levenshtein(p_brand, 'Brand#10') AS INTEGER) AS lev_brand,
        |CAST(levenshtein(lower(string_split(p_type, ' ')[1]), 'standard')
        |  AS INTEGER) AS lev_class
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_string_regex" ->
      """SELECT p_partkey,
        |regexp_extract(p_type, '^(\w+)', 1) AS type_first,
        |regexp_extract(p_name, '(\w+)$', 1) AS name_last,
        |regexp_matches(p_type, '^ECONOMY|^STANDARD') AS is_cheap_class
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_date_parts" ->
      """SELECT o_orderkey,
        |CAST(year(o_orderdate) AS INTEGER) AS y,
        |CAST(month(o_orderdate) AS INTEGER) AS m,
        |CAST(day(o_orderdate) AS INTEGER) AS dom,
        |CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
        |CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |CAST(date_part('isodow', o_orderdate) AS INTEGER) AS isodow
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_date_arith" ->
      """SELECT o_orderkey,
        |CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |o_orderdate + INTERVAL 30 DAY AS plus_30d,
        |CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
        |  AS INTEGER) AS days_to_2002
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_date_parse_format" ->
      """SELECT o_orderkey,
        |strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
        |strftime(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d'),
        |  '%Y/%m/%d %H:%M') AS roundtrip
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |abs(l_extendedprice - 30000) AS abs_dev,
        |CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |ROUND(sqrt(l_extendedprice), 6) AS price_sqrt,
        |ROUND(ln(l_extendedprice), 6) AS price_ln,
        |ROUND(exp(l_discount), 6) AS disc_exp,
        |l_quantity * l_quantity AS qty_sq,
        |l_partkey % 7 AS pk_mod7
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "fn_bitwise" ->
      """SELECT event_id,
        |event_id & 255 AS band,
        |event_id | 16 AS bor,
        |xor(event_id, 85) AS bxor,
        |(event_id % 100) << 2 AS shl,
        |event_id >> 3 AS shr
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        |CAST(json_extract(props, '$.k') AS INTEGER) AS k_int
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_array_explode" ->
      """SELECT token, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split_regex(text, ' ')) AS token
        |  FROM documents) t
        |GROUP BY token ORDER BY n DESC, token""".stripMargin,
    "fn_array_ops" ->
      """SELECT doc_id,
        |CAST(len(string_split_regex(text, ' ')) AS INTEGER) AS n_tokens,
        |array_to_string(string_split_regex(text, ' ')[1:5], '|') AS first5,
        |list_contains(string_split_regex(text, ' '), 'the') AS has_the,
        |list_sort(list_distinct(string_split_regex(text, ' ')))[1]
        |  AS first_sorted
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_array_hof" ->
      """SELECT vec_id,
        |ROUND(sqrt(list_sum(list_transform(embedding,
        |  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "fn_map_ops" ->
      """SELECT p_partkey, p_brand AS m_brand, p_type AS m_type,
        |2 AS m_size
        |FROM part ORDER BY p_partkey""".stripMargin
  )
}
