package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.tables.Tables
import Op._

/** §2.8 scalar-function packs. Every op is a pure per-row projection —
  * no shuffle at all: the plan is Scan → Project inside one
  * WholeStageCodegen span (plus the terminal order-by the hash-match
  * contract demands, which a production caller would drop). At 100 TB
  * these are embarrassingly parallel and scan-bound; only the referenced
  * columns are read (parquet column pruning).
  *
  * Dialect discipline (SURVEY §5.3.7) is encoded per expression:
  *   Spark `split`            ⇄ DuckDB `string_split` (lists 1-based)
  *   Spark `get_json_object`  ⇄ DuckDB `json_extract_string`
  *   Spark `dayofweek` (1=Sun)⇄ DuckDB `extract(dow)` (0=Sun) — shift ours
  *   Spark cast(double→int) truncates, DuckDB ROUNDS — always `floor` first
  *   Spark `signum`→double, DuckDB `sign`→int — cast ours to int
  */
object Scalars {

  /** String pack over `part`: case, substring, length, pad, replace,
    * regex extract/replace, split-index, LIKE classification.
    */
  val fnStringPack: Op = Op(
    "fn_string_pack",
    (s, dir) => {
      val toks = split(col("p_name"), " ")
      Tables.part(s, dir)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up_name"),
          lower(col("p_brand")).as("lo_brand"),
          substring(col("p_name"), 1, 6).as("sub6"),
          length(col("p_name")).as("name_len"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          trim(concat(lit("  "), col("p_brand"), lit("  "))).as("trimmed"),
          lpad(col("p_partkey").cast(StringType), 8, "0").as("key_pad"),
          regexp_replace(col("p_name"), " ", "_").as("name_us"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
          toks.getItem(0).as("tok0"),
          when(col("p_type").like("%ECO%"), 1).otherwise(0).as("is_eco"))
        .orderBy("p_partkey")
    },
    Some("""
      SELECT p_partkey,
        upper(p_name) AS up_name,
        lower(p_brand) AS lo_brand,
        substr(p_name, 1, 6) AS sub6,
        length(p_name) AS name_len,
        concat_ws('|', p_brand, p_type) AS brand_type,
        trim('  ' || p_brand || '  ') AS trimmed,
        lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_pad,
        replace(p_name, ' ', '_') AS name_us,
        regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        string_split(p_name, ' ')[1] AS tok0,
        CASE WHEN p_type LIKE '%ECO%' THEN 1 ELSE 0 END AS is_eco
      FROM part ORDER BY p_partkey
    """.stripMargin.trim))

  /** Date pack over `orders` (timestamps are exact midnights — verified).
    * All date-valued outputs leave as yyyy-MM-dd strings (Op.fmtDay) so the
    * parquet logical types never enter the compare; dow normalized to
    * 0=Sunday on both engines.
    */
  val fnDatePack: Op = Op(
    "fn_date_pack",
    (s, dir) =>
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          (dayofweek(col("o_orderdate")) - 1).as("dow"),
          fmtDay(col("o_orderdate")).as("od"),
          fmtDay(date_trunc("month", col("o_orderdate"))).as("month_start"),
          datediff(lit("2025-01-01"), col("o_orderdate")).as("days_to_2025"),
          fmtDay(date_add(col("o_orderdate"), 30)).as("plus30"),
          fmtDay(last_day(col("o_orderdate"))).as("month_end"))
        .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey,
        CAST(extract(year FROM o_orderdate) AS INTEGER) AS yr,
        CAST(extract(month FROM o_orderdate) AS INTEGER) AS mo,
        CAST(extract(day FROM o_orderdate) AS INTEGER) AS dom,
        CAST(extract(dow FROM o_orderdate) AS INTEGER) AS dow,
        strftime(o_orderdate, '%Y-%m-%d') AS od,
        strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        date_diff('day', CAST(o_orderdate AS DATE), DATE '2025-01-01') AS days_to_2025,
        strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
        strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
      FROM orders ORDER BY o_orderkey
    """.stripMargin.trim))

  /** Math + CASE over `part`. Transcendentals (sqrt/ln/power) are rounded
    * to 6 dp on both sides (§5.3.2); floor/ceil surfaced as BIGINT with the
    * explicit floor-before-int-cast rule; round() goes through decimal so
    * both engines use identical half-away-from-zero semantics.
    */
  val fnMathCase: Op = Op(
    "fn_math_case",
    (s, dir) =>
      Tables.part(s, dir)
        .select(
          col("p_partkey"),
          abs(col("p_size") - 25).as("abs_sz"),
          (col("p_size") % 7).as("mod7"),
          floor(col("p_retailprice")).cast(LongType).as("price_floor"),
          ceil(col("p_retailprice")).cast(LongType).as("price_ceil"),
          round(dec2(col("p_retailprice")), 0).cast(LongType).as("price_round"),
          round(sqrt(col("p_retailprice")), 6).as("sqrt_p"),
          round(log(col("p_retailprice")), 6).as("ln_p"),
          round(pow(col("p_size").cast(DoubleType), 2), 6).as("sz_sq"),
          signum(col("p_retailprice") - lit(950.0)).cast(IntegerType).as("sgn"),
          when(col("p_size") < 10, "small")
            .when(col("p_size") < 30, "mid")
            .otherwise("large").as("size_band"))
        .orderBy("p_partkey"),
    Some("""
      SELECT p_partkey,
        abs(p_size - 25) AS abs_sz,
        mod(p_size, 7) AS mod7,
        CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
        CAST(round(CAST(p_retailprice AS DECIMAL(12,2)), 0) AS BIGINT) AS price_round,
        round(sqrt(p_retailprice), 6) AS sqrt_p,
        round(ln(p_retailprice), 6) AS ln_p,
        round(power(CAST(p_size AS DOUBLE), 2), 6) AS sz_sq,
        CAST(sign(p_retailprice - 950.0) AS INTEGER) AS sgn,
        CASE WHEN p_size < 10 THEN 'small'
             WHEN p_size < 30 THEN 'mid'
             ELSE 'large' END AS size_band
      FROM part ORDER BY p_partkey
    """.stripMargin.trim))

  /** Array pack over `documents.text` tokens: size, contains, slice,
    * distinct. Arrays leave the query as joined strings (array parquet
    * codecs/orderings never enter the compare); distinct goes through an
    * explicit sort because Spark preserves first-occurrence order while
    * DuckDB list_distinct does not guarantee one.
    */
  val fnArrayPack: Op = Op(
    "fn_array_pack",
    (s, dir) => {
      val toks = split(col("text"), " ")
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          size(toks).as("n_toks"),
          array_contains(toks, "scan").cast(IntegerType).as("has_scan"),
          array_join(slice(toks, 1, 3), " ").as("first3"),
          size(array_distinct(toks)).as("n_distinct"),
          array_join(sort_array(array_distinct(slice(toks, 1, 5))), ",").as("d5"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
        len(string_split(text, ' ')) AS n_toks,
        CASE WHEN list_contains(string_split(text, ' '), 'scan') THEN 1 ELSE 0 END AS has_scan,
        array_to_string(string_split(text, ' ')[1:3], ' ') AS first3,
        len(list_distinct(string_split(text, ' '))) AS n_distinct,
        array_to_string(list_sort(list_distinct(string_split(text, ' ')[1:5])), ',') AS d5
      FROM documents ORDER BY doc_id
    """.stripMargin.trim))

  /** Higher-order functions over the 64-dim float vectors: transform /
    * filter / aggregate / zip_with. Every element is cast float→double
    * BEFORE arithmetic (exact conversion) so both engines fold identical
    * doubles; 6-dp rounding absorbs any summation-order residue. The
    * self-reverse dot product exercises zip_with against DuckDB's
    * list_zip-free formulation.
    */
  val fnHigherOrder: Op = Op(
    "fn_higher_order",
    (s, dir) => {
      val ed = transform(col("embedding"), x => x.cast(DoubleType))
      val sumsq = aggregate(transform(ed, x => x * x), lit(0.0), (a, x) => a + x)
      val revDot = aggregate(
        zip_with(ed, reverse(ed), (a, b) => a * b), lit(0.0), (a, x) => a + x)
      Tables.embeddings(s, dir)
        .select(
          col("vec_id"),
          round(aggregate(ed, lit(0.0), (a, x) => a + x), 6).as("sum_e"),
          round(sumsq, 6).as("sumsq"),
          round(sqrt(sumsq), 6).as("l2"),
          size(filter(ed, x => x > 0)).as("n_pos"),
          round(revDot, 6).as("rev_dot"))
        .orderBy("vec_id")
    },
    Some("""
      SELECT vec_id,
        ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS sum_e,
        ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sumsq,
        ROUND(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2,
        len(list_filter(embedding, x -> x > 0)) AS n_pos,
        ROUND(list_sum(list_transform(
          list_zip(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                   list_reverse(list_transform(embedding, x -> CAST(x AS DOUBLE)))),
          p -> p[1] * p[2])), 6) AS rev_dot
      FROM embeddings ORDER BY vec_id
    """.stripMargin.trim))

  /** Map pack. Builds a token→length map per document from the sorted
    * distinct leading tokens, then reads it back via keys/values/lookup.
    * Deterministic: entry order is pinned by sort_array before
    * map_from_entries. ORACLE-CHECKED (round 6): the output columns are
    * all scalars PROJECTED OUT of the map (count, joined keys, value
    * sum, one lookup), so DuckDB can recompute them straight from the
    * sorted-distinct token list without sharing Spark's map literal /
    * ordering semantics — the map is exercised on the Spark side, the
    * values are engine-portable. sum_lens/len_the cast to BIGINT on the
    * oracle side (DuckDB list_sum yields HUGEINT, the one int width the
    * driver's hash does NOT normalize — round-5 verdict).
    */
  val fnMapPack: Op = Op(
    "fn_map_pack",
    (s, dir) => {
      val toks = sort_array(array_distinct(slice(split(col("text"), " "), 1, 8)))
      val m = map_from_entries(transform(toks, t => struct(t, length(t))))
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          size(m).as("n_keys"),
          array_join(map_keys(m), ",").as("keys_csv"),
          aggregate(map_values(m), lit(0), (a, x) => a + x).as("sum_lens"),
          element_at(m, "the").as("len_the"))
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id,
          list_sort(list_distinct(string_split(text, ' ')[1:8])) AS toks
        FROM documents
      )
      SELECT doc_id,
        CAST(len(toks) AS INTEGER) AS n_keys,
        array_to_string(toks, ',') AS keys_csv,
        CAST(list_sum(list_transform(toks, x -> length(x))) AS INTEGER) AS sum_lens,
        CASE WHEN list_contains(toks, 'the')
             THEN CAST(length('the') AS INTEGER) END AS len_the
      FROM t ORDER BY doc_id
    """.stripMargin.trim))

  /** JSON extraction from `events.props` (`{"k": 87}`): string-path
    * get_json_object and fully-typed from_json both land on the same int.
    */
  val fnJsonExtract: Op = Op(
    "fn_json_extract",
    (s, dir) => {
      val kSchema = StructType(Seq(StructField("k", IntegerType)))
      Tables.events(s, dir)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k_int"),
          from_json(col("props"), kSchema).getField("k").as("k_typed"),
          (get_json_object(col("props"), "$.k").cast(IntegerType) * 2).as("k2"))
        .orderBy("event_id")
    },
    Some("""
      SELECT event_id,
        CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
        CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed,
        CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k2
      FROM events ORDER BY event_id
    """.stripMargin.trim))

  /** Cast matrix + conditional scalars over `orders`: string↔long round
    * trip, floor-then-int (the cast-rounding trap), double→decimal→double
    * canonicalization, NULLIF/COALESCE, GREATEST/LEAST, timestamp→string.
    */
  val fnCastCoalesce: Op = Op(
    "fn_cast_coalesce",
    (s, dir) =>
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          col("o_orderkey").cast(StringType).as("key_str"),
          col("o_orderkey").cast(StringType).cast(LongType).as("key_rt"),
          floor(col("o_totalprice")).cast(LongType).as("price_int"),
          dec2(col("o_totalprice")).cast(DoubleType).as("price_d2"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_c"),
          greatest(dec2(col("o_totalprice")), lit(BigDecimal(100000))).cast(DoubleType).as("hi"),
          least(dec2(col("o_totalprice")), lit(BigDecimal(100000))).cast(DoubleType).as("lo"),
          fmtDay(col("o_orderdate")).as("od_str"))
        .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey,
        CAST(o_orderkey AS VARCHAR) AS key_str,
        CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_rt,
        CAST(floor(o_totalprice) AS BIGINT) AS price_int,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price_d2,
        COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_c,
        CAST(greatest(CAST(o_totalprice AS DECIMAL(12,2)), CAST(100000 AS DECIMAL(12,2))) AS DOUBLE) AS hi,
        CAST(least(CAST(o_totalprice AS DECIMAL(12,2)), CAST(100000 AS DECIMAL(12,2))) AS DOUBLE) AS lo,
        strftime(o_orderdate, '%Y-%m-%d') AS od_str
      FROM orders ORDER BY o_orderkey
    """.stripMargin.trim))

  /** Bitwise surface: and/or/xor, shifts, popcount, bit extraction —
    * all codegen'd integer ops, identical two's-complement semantics in
    * both engines. (The dedup signatures §2.10 lean on exactly these.)
    */
  val fnBitwisePack: Op = Op(
    "fn_bitwise_pack",
    (s, dir) =>
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          expr("o_orderkey & 255").as("b_and"),
          expr("o_orderkey | 4096").as("b_or"),
          expr("cast(o_orderkey ^ 1365 as bigint)").as("b_xor"),
          expr("shiftleft(o_orderkey, 3)").as("b_shl"),
          expr("shiftright(o_orderkey, 2)").as("b_shr"),
          expr("cast(bit_count(o_orderkey) as int)").as("b_pop"),
          expr("cast((o_orderkey >> 5) & 1 as int)").as("b_bit5"),
          expr("cast(~o_orderkey as bigint)").as("b_not"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
              o_orderkey & 255 AS b_and,
              o_orderkey | 4096 AS b_or,
              CAST(xor(o_orderkey, 1365) AS BIGINT) AS b_xor,
              o_orderkey << 3 AS b_shl,
              o_orderkey >> 2 AS b_shr,
              CAST(bit_count(o_orderkey) AS INT) AS b_pop,
              CAST((o_orderkey >> 5) & 1 AS INT) AS b_bit5,
              CAST(~o_orderkey AS BIGINT) AS b_not
            FROM orders ORDER BY o_orderkey"""))

  /** Regexp surface beyond fn_string_pack's single extract/replace:
    * match counting, all-matches extraction, boolean match, global
    * replace, and regex split. Every pattern is a lookaround- and
    * backreference-free alternation/char-class, the subset Java regex
    * (Spark) and RE2 (DuckDB) define identically — RE2 has no
    * lookaround or backrefs at all, so staying in that subset is what
    * makes a cross-engine regexp contract possible.
    */
  val fnRegexpPack: Op = Op(
    "fn_regexp_pack",
    (s, dir) =>
      Tables.part(s, dir)
        .select(
          col("p_partkey"),
          regexp_count(col("p_name"), lit("[aeiou]+")).as("vowel_runs"),
          regexp_extract(col("p_name"), "([aeiou]+)", 1).as("first_vowel_run"),
          concat_ws(",", regexp_extract_all(col("p_name"), lit("[aeiou]+"), lit(0)))
            .as("all_vowel_runs"),
          col("p_brand").rlike("[0-9][0-9]").as("brand_2dig"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
          size(split(col("p_name"), "[aeiou]+")).as("n_split"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
              CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS INT) AS vowel_runs,
              regexp_extract(p_name, '([aeiou]+)', 1) AS first_vowel_run,
              array_to_string(regexp_extract_all(p_name, '[aeiou]+'), ',') AS all_vowel_runs,
              regexp_matches(p_brand, '[0-9][0-9]') AS brand_2dig,
              regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
              CAST(len(regexp_split_to_array(p_name, '[aeiou]+')) AS INT) AS n_split
            FROM part ORDER BY p_partkey"""))

  /** Transcendental/trig surface (complements fn_math_case's algebraic
    * set): sin/cos/tan/asin/acos/atan/atan2/exp/degrees over the small-domain
    * discount and tax columns ([0, 0.1] — inside asin's domain and where
    * JVM Math and libm agree far below the 6-dp round both sides apply;
    * empirically exact vs DuckDB at sf0.01 and sf0.001). Narrow
    * scan→project, fully codegen'd, no shuffle but the presentation sort.
    */
  val fnTrigPack: Op = Op(
    "fn_trig_pack",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(sin(col("l_discount")), 6).as("sin_d"),
          round(cos(col("l_discount")), 6).as("cos_d"),
          round(tan(col("l_discount")), 6).as("tan_d"),
          round(asin(col("l_discount")), 6).as("asin_d"),
          round(atan(col("l_discount")), 6).as("atan_d"),
          round(atan2(col("l_discount"), col("l_tax") + lit(0.01)), 6).as("atan2_dt"),
          round(exp(col("l_discount")), 6).as("exp_d"),
          round(acos(col("l_discount")), 6).as("acos_d"),
          round(degrees(col("l_discount")), 6).as("deg_d"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""
      SELECT l_orderkey, l_linenumber,
        ROUND(SIN(l_discount), 6) AS sin_d,
        ROUND(COS(l_discount), 6) AS cos_d,
        ROUND(TAN(l_discount), 6) AS tan_d,
        ROUND(ASIN(l_discount), 6) AS asin_d,
        ROUND(ATAN(l_discount), 6) AS atan_d,
        ROUND(ATAN2(l_discount, l_tax + 0.01), 6) AS atan2_dt,
        ROUND(EXP(l_discount), 6) AS exp_d,
        ROUND(ACOS(l_discount), 6) AS acos_d,
        ROUND(DEGREES(l_discount), 6) AS deg_d
      FROM lineitem ORDER BY l_orderkey, l_linenumber
    """.stripMargin.trim))

  /** GEOSPATIAL scalar pack — great-circle math without a GIS library
    * (the logistics/geo-join primitives every routing query needs):
    * per customer, two key-derived coordinates (deterministic mod
    * arithmetic, poles avoided at ±85°), then the haversine distance
    * (R = 6371.0088 km), the initial bearing normalized to [0, 360)
    * via fmod-on-positive (Spark pmod ≡ DuckDB fmod there), and the
    * spherical midpoint — each a fixed chain of radians/sin/cos/
    * asin/atan2/sqrt mirrored token-for-token in the oracle (the
    * fn_trig_pack precedent: identical IEEE chains round-6 equal).
    *
    * Scale shape: pure row-local projection, codegen'd, no shuffle —
    * the distance column this op builds is what a geo range join
    * (join_theta_range's shape) or a geohash bucketing would consume.
    */
  /** NETWORK-ADDRESS scalar pack — the IP parsing/classification
    * primitives every access-log pipeline runs (dotted-quad render,
    * /24 network + broadcast, RFC-1918 private classification, CIDR
    * membership), implemented as PURE integer div/mod arithmetic so
    * no inet extension is needed on either engine and every output is
    * exactly portable (no float anywhere). Addresses derive from the
    * key via a Knuth-hash mod 2³² — deterministic, full-range.
    *
    * Scale shape: row-local codegen'd projection, zero shuffle; the
    * /24 string this op builds is the natural bucketing key for a
    * log sessionization or a scan-abuse group-by at 100 TB.
    */
  val fnIpPack: Op = Op(
    "fn_ip_pack",
    (s, dir) => {
      // `div` (not `/`): Spark's Divide on longs yields DOUBLE; the
      // octet math must stay in exact integer arithmetic end-to-end
      val b1 = expr("ip_int div 16777216 % 256")
      val b2 = expr("ip_int div 65536 % 256")
      val b3 = expr("ip_int div 256 % 256")
      val b4 = expr("ip_int % 256")
      def dotted(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
          c: org.apache.spark.sql.Column,
          d: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        concat_ws(".", a.cast(StringType), b.cast(StringType),
          c.cast(StringType), d.cast(StringType))
      Tables.customer(s, dir)
        .withColumn("ip_int", expr("c_custkey * 2654435761 % 4294967296"))
        .select(col("c_custkey"), col("ip_int"),
          dotted(b1, b2, b3, b4).as("ip"),
          dotted(b1, b2, b3, lit(0)).as("net24"),
          dotted(b1, b2, b3, lit(255)).as("bcast24"),
          concat(b1.cast(StringType), lit("."), b2.cast(StringType),
            lit(".0.0/16")).as("cidr16"),
          when(b1 === 10 ||
            (b1 === 172 && b2 >= 16 && b2 <= 31) ||
            (b1 === 192 && b2 === 168), 1).otherwise(0).as("is_private"),
          when(expr("ip_int div 65536") === 192L * 256 + 168, 1)
            .otherwise(0).as("in_192_168_16"))
        .orderBy("c_custkey")
    },
    Some("""
      WITH ips AS (
        SELECT c_custkey,
          c_custkey * 2654435761 % 4294967296 AS ip_int
        FROM customer
      ), oct AS (
        SELECT c_custkey, ip_int,
          ip_int // 16777216 % 256 AS b1,
          ip_int // 65536 % 256 AS b2,
          ip_int // 256 % 256 AS b3,
          ip_int % 256 AS b4
        FROM ips
      )
      SELECT c_custkey, ip_int,
        b1 || '.' || b2 || '.' || b3 || '.' || b4 AS ip,
        b1 || '.' || b2 || '.' || b3 || '.0' AS net24,
        b1 || '.' || b2 || '.' || b3 || '.255' AS bcast24,
        b1 || '.' || b2 || '.0.0/16' AS cidr16,
        CASE WHEN b1 = 10 OR (b1 = 172 AND b2 BETWEEN 16 AND 31)
             OR (b1 = 192 AND b2 = 168) THEN 1 ELSE 0 END AS is_private,
        CASE WHEN ip_int // 65536 = 192 * 256 + 168 THEN 1 ELSE 0 END
          AS in_192_168_16
      FROM oct ORDER BY c_custkey
    """.stripMargin.trim))

  val fnGeoPack: Op = Op(
    "fn_geo_pack",
    (s, dir) => {
      val lat1 = (col("c_custkey") * 7919L % 17000L) / 100.0 - 85.0
      val lon1 = (col("c_custkey") * 104729L % 36000L) / 100.0 - 180.0
      val lat2 = (col("c_custkey") * 15485863L % 17000L) / 100.0 - 85.0
      val lon2 = (col("c_custkey") * 32452843L % 36000L) / 100.0 - 180.0
      val p1 = radians(lat1); val p2 = radians(lat2)
      val dphi = radians(lat2 - lat1); val dlmb = radians(lon2 - lon1)
      val a = sin(dphi / 2) * sin(dphi / 2) +
        cos(p1) * cos(p2) * sin(dlmb / 2) * sin(dlmb / 2)
      val dist = asin(sqrt(a)) * (2 * 6371.0088)
      val brg = atan2(sin(dlmb) * cos(p2),
        cos(p1) * sin(p2) - sin(p1) * cos(p2) * cos(dlmb))
      val bx = cos(p2) * cos(dlmb)
      val by = cos(p2) * sin(dlmb)
      val midLat = degrees(atan2(sin(p1) + sin(p2),
        sqrt((cos(p1) + bx) * (cos(p1) + bx) + by * by)))
      // Raw midpoint longitude is lon1 + atan2(...) with range
      // (-360, 360); normalize into [-180, 180) like the bearing so
      // downstream geo-grid/bucketing consumers never see a wrapped
      // coordinate. pmod keeps the intermediate in [0, 360).
      val midLon =
        pmod(degrees(radians(lon1) + atan2(by, cos(p1) + bx)) + 180.0,
          lit(360.0)) - 180.0
      Tables.customer(s, dir)
        .select(col("c_custkey"),
          round(lat1, 6).as("lat1"), round(lon1, 6).as("lon1"),
          round(lat2, 6).as("lat2"), round(lon2, 6).as("lon2"),
          round(dist, 6).as("dist_km"),
          round(pmod(degrees(brg) + 360.0, lit(360.0)), 6).as("bearing_deg"),
          round(midLat, 6).as("mid_lat"), round(midLon, 6).as("mid_lon"))
        .orderBy("c_custkey")
    },
    Some("""
      WITH pts AS (
        SELECT c_custkey,
          (c_custkey * 7919 % 17000) / 100.0 - 85.0 AS lat1,
          (c_custkey * 104729 % 36000) / 100.0 - 180.0 AS lon1,
          (c_custkey * 15485863 % 17000) / 100.0 - 85.0 AS lat2,
          (c_custkey * 32452843 % 36000) / 100.0 - 180.0 AS lon2
        FROM customer
      ), tr AS (
        SELECT *, radians(lat1) AS p1, radians(lat2) AS p2,
          radians(lat2 - lat1) AS dphi, radians(lon2 - lon1) AS dlmb
        FROM pts
      ), geo AS (
        SELECT *,
          sin(dphi / 2) * sin(dphi / 2)
            + cos(p1) * cos(p2) * sin(dlmb / 2) * sin(dlmb / 2) AS a,
          cos(p2) * cos(dlmb) AS bx, cos(p2) * sin(dlmb) AS by
        FROM tr
      ), mid AS (
        -- fmod + conditional +360 mirrors Spark's pmod branch-for-
        -- branch (pmod only adds n on the negative branch), so the
        -- normalized doubles agree bit-for-bit before ROUND.
        SELECT *, fmod(degrees(radians(lon1) + atan2(by, cos(p1) + bx))
          + 180.0, 360.0) AS mlon_f
        FROM geo
      )
      SELECT c_custkey,
        ROUND(lat1, 6) AS lat1, ROUND(lon1, 6) AS lon1,
        ROUND(lat2, 6) AS lat2, ROUND(lon2, 6) AS lon2,
        ROUND(asin(sqrt(a)) * (2 * 6371.0088), 6) AS dist_km,
        ROUND(fmod(degrees(atan2(sin(dlmb) * cos(p2),
          cos(p1) * sin(p2) - sin(p1) * cos(p2) * cos(dlmb))) + 360.0,
          360.0), 6) AS bearing_deg,
        ROUND(degrees(atan2(sin(p1) + sin(p2),
          sqrt((cos(p1) + bx) * (cos(p1) + bx) + by * by))), 6) AS mid_lat,
        ROUND((CASE WHEN mlon_f < 0 THEN mlon_f + 360.0 ELSE mlon_f END)
          - 180.0, 6) AS mid_lon
      FROM mid ORDER BY c_custkey
    """.stripMargin.trim))

  /** Struct surface: build named structs (flat and nested), extract
    * fields at both depths, and compare structs memberwise — the typed
    * record semantics a Dataset[T] user relies on, exercised through
    * the Column API. Output is FLATTENED to scalars (§5.3 dtype rule;
    * DuckDB's struct literals would not hash-compare anyway — the same
    * flatten-for-the-oracle treatment as llm_multimodal_join's struct).
    * Struct build/extract is a pure projection: narrow, codegen'd, no
    * shuffle at any scale.
    */
  val fnStructPack: Op = Op(
    "fn_struct_pack",
    (s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_custkey"),
          struct(col("c_name").as("name"), dec2(col("c_acctbal")).as("bal")).as("c"),
          struct(col("c_nationkey").as("nk"),
            struct(col("c_mktsegment").as("seg")).as("deep")).as("nested"))
        .select(
          col("c_custkey"),
          col("c.name").as("name_out"),
          col("c.bal").cast(DoubleType).as("bal_out"),
          col("nested.nk").cast(LongType).as("nk_out"),
          col("nested.deep.seg").as("seg_out"),
          // memberwise struct equality: same (nk, seg) pair rebuilt from
          // scratch must compare equal to the projected struct
          (col("nested") === struct(col("nested.nk").as("nk"),
            struct(col("nested.deep.seg").as("seg")).as("deep")))
            .cast(LongType).as("eq_rebuilt"))
        .orderBy("c_custkey"),
    Some("""
      WITH b AS (
        SELECT c_custkey,
          struct_pack(name := c_name,
                      bal := CAST(c_acctbal AS DECIMAL(12,2))) AS c,
          struct_pack(nk := c_nationkey,
                      deep := struct_pack(seg := c_mktsegment)) AS nested
        FROM customer
      )
      SELECT c_custkey,
        c.name AS name_out,
        CAST(c.bal AS DOUBLE) AS bal_out,
        CAST(nested.nk AS BIGINT) AS nk_out,
        nested.deep.seg AS seg_out,
        CAST(nested = struct_pack(nk := nested.nk,
          deep := struct_pack(seg := nested.deep.seg)) AS BIGINT) AS eq_rebuilt
      FROM b ORDER BY c_custkey
    """.stripMargin.trim))

  /** OUTER generator semantics — the explode variant every ETL hits
    * eventually: `explode_outer` keeps a row (with a NULL element) for
    * documents whose derived array is EMPTY, where plain `explode`
    * silently drops them. The derived array (words of ≥ 8 chars) is
    * empty for a real subset of the fixture, so the hash match proves
    * the null-preserving row set, not just the happy path. Output stays
    * row-level — aggregating would hide exactly the rows at stake;
    * NULLS FIRST is pinned in both engines (their defaults differ).
    */
  val fnGeneratorOuter: Op = Op(
    "fn_generator_outer",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          expr("filter(split(text, ' '), w -> length(w) >= 8)").as("lw"))
        .select(col("doc_id"), explode_outer(col("lw")).as("tok"))
        .orderBy(col("doc_id"), col("tok").asc_nulls_first),
    Some("""
      WITH d AS (
        SELECT doc_id,
          list_filter(string_split(text, ' '), w -> length(w) >= 8) AS lw
        FROM documents
      )
      SELECT doc_id, tok FROM (
        -- lw IS NULL: a NULL text row must keep its (doc_id, NULL) row to
        -- match explode_outer; without this branch both len() predicates
        -- are NULL-false and the oracle would silently drop the row.
        SELECT doc_id, NULL AS tok FROM d WHERE lw IS NULL OR len(lw) = 0
        UNION ALL
        SELECT doc_id, unnest(lw) AS tok FROM d WHERE len(lw) > 0)
      ORDER BY doc_id, tok NULLS FIRST
    """.stripMargin.trim))

  /** Hash / binary-encoding pack over `part` — the fingerprint-and-key
    * surface every dedup, sampling, and integrity op in this library
    * leans on, graded in its own right: md5 and sha-256 digests, the
    * md5→int64 shard-key derivation (15 hex digits = 60 bits, sign-safe
    * in both engines), base64 and hex encodes with their decode
    * ROUNDTRIPS proven row-wise (emitted as 0/1 — an encode that
    * corrupts bytes can't hash-match). Dialect notes: Spark `sha2(x,
    * 256)` ⇄ DuckDB `sha256`; Spark `hex` uppercases where DuckDB
    * lowercases — normalized with lower() on both sides; base64 operates
    * on the UTF-8 bytes (Spark casts string→binary, DuckDB ::BLOB).
    */
  val fnHashPack: Op = Op(
    "fn_hash_pack",
    (s, dir) =>
      Tables.part(s, dir)
        .select(
          col("p_partkey"),
          md5(col("p_name")).as("h_md5"),
          sha2(col("p_name"), 256).as("h_sha256"),
          expr("cast(conv(substring(md5(p_name), 1, 15), 16, 10) as bigint)")
            .as("shard_key"),
          base64(col("p_name").cast(BinaryType)).as("h_b64"),
          when(unbase64(base64(col("p_name").cast(BinaryType)))
            .cast(StringType) === col("p_name"), 1L).otherwise(0L)
            .as("b64_roundtrip"),
          lower(hex(col("p_name"))).as("h_hex"),
          when(unhex(lower(hex(col("p_name")))).cast(StringType) === col("p_name"), 1L)
            .otherwise(0L).as("hex_roundtrip"))
        .orderBy("p_partkey"),
    Some("""
      SELECT p_partkey,
        md5(p_name) AS h_md5,
        sha256(p_name) AS h_sha256,
        CAST('0x' || substr(md5(p_name), 1, 15) AS BIGINT) AS shard_key,
        to_base64(p_name::BLOB) AS h_b64,
        CASE WHEN CAST(from_base64(to_base64(p_name::BLOB)) AS VARCHAR) = p_name
             THEN 1 ELSE 0 END AS b64_roundtrip,
        lower(hex(p_name)) AS h_hex,
        CASE WHEN CAST(unhex(lower(hex(p_name))) AS VARCHAR) = p_name
             THEN 1 ELSE 0 END AS hex_roundtrip
      FROM part ORDER BY p_partkey
    """.stripMargin.trim))

  /** DETERMINISTIC name-based UUIDs (RFC-4122 v3 style) — the stable
    * row-identity primitive fn_hash_pack stops short of: `uuid()` is
    * random and useless for a replayable pipeline, but a v3-style
    * UUID (md5 of a namespaced name, version/variant bits patched in)
    * gives every document the SAME id on every run, every engine,
    * every partition — what a 100 TB corpus uses for doc identity,
    * dedup ledgers, and cross-system joins. Surgery on the md5 hex:
    * 8-4-4-4-12 grouping, 13th nibble forced to '3' (version), 17th
    * nibble to (d & 3) | 8 ∈ {8,9,a,b} (variant) — pure string/int
    * ops, engine-identical (Spark conv() uppercases → lower()d;
    * DuckDB printf('%x')). Each row also emits a format-validation
    * flag (the RFC regex with version/variant classes pinned), so a
    * surgery slip can't hash-match. Hashing the namespaced name
    * directly (not the RFC's namespace-UUID byte concat) — the
    * convention is documented IN the name column the oracle checks.
    *
    * Scale shape: fully narrow per-row string ops inside whole-stage
    * codegen; pushdown-friendly, zero shuffle.
    */
  val fnUuidV3: Op = Op(
    "fn_uuid_v3",
    (s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"),
          md5(concat(lit("graft:"), col("p_partkey").cast(StringType)))
            .as("h"))
        .select(col("p_partkey"),
          concat(
            substring(col("h"), 1, 8), lit("-"),
            substring(col("h"), 9, 4), lit("-3"),
            substring(col("h"), 14, 3), lit("-"),
            lower(expr(
              "conv((conv(substring(h, 17, 1), 16, 10) % 4) + 8, 10, 16)")),
            substring(col("h"), 18, 3), lit("-"),
            substring(col("h"), 21, 12)).as("uuid_v3"))
        .withColumn("fmt_ok",
          when(col("uuid_v3").rlike(
            "^[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"),
            1L).otherwise(0L))
        .orderBy("p_partkey"),
    Some("""
      SELECT p_partkey,
        substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-3' ||
          substr(h, 14, 3) || '-' ||
          printf('%x', (CAST('0x' || substr(h, 17, 1) AS INTEGER) % 4) + 8) ||
          substr(h, 18, 3) || '-' || substr(h, 21, 12) AS uuid_v3,
        CASE WHEN regexp_matches(
            substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-3' ||
              substr(h, 14, 3) || '-' ||
              printf('%x', (CAST('0x' || substr(h, 17, 1) AS INTEGER) % 4) + 8) ||
              substr(h, 18, 3) || '-' || substr(h, 21, 12),
            '^[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$')
          THEN 1 ELSE 0 END AS fmt_ok
      FROM (SELECT p_partkey, md5('graft:' || p_partkey) AS h FROM part)
      ORDER BY p_partkey
    """.stripMargin.trim))

  /** Nested array-of-struct processing — the semi-structured document
    * shape every modern lake stores (an order with its line items as
    * ONE nested row) and the missing nesting level between
    * `fn_struct_pack` (flat structs) and `fn_array_pack`/
    * `fn_higher_order` (scalar arrays): each order's lineitems roll up
    * into a linenumber-sorted array of typed structs, then
    * higher-order functions compute over the STRUCT FIELDS in place —
    * `filter` on a field predicate feeding a decimal `aggregate` fold
    * (kept-quantity, skipping returned items), `transform` extracting
    * a field for `array_max`. Determinism: the array is sort_array'd
    * on the leading l_linenumber field and the fold accumulates exact
    * decimals in that fixed order; the oracle recomputes the same
    * SCALARS relationally (nested construction is Spark-side — the
    * §5.3 output discipline keeps arrays out of the output schema).
    *
    * Scale shape: one partial+final collect per order (the nested row
    * a document store would materialize), then fully narrow per-row
    * HOF math — nesting trades join locality for row width, the
    * standard denormalization bet.
    */
  val fnNestedAgg: Op = Op(
    "fn_nested_agg",
    (s, dir) => {
      val item = struct(
        col("l_linenumber"), dec2(col("l_quantity")).as("qty"),
        dec2(col("l_extendedprice")).as("price"), col("l_returnflag").as("rf"))
      val zero = lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 2))
      Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(item)).as("items"))
        .select(col("l_orderkey"),
          size(col("items")).as("n_items"),
          aggregate(
            filter(col("items"), i => i.getField("rf") =!= "R"),
            zero,
            (acc, i) => (acc + i.getField("qty")).cast(DecimalType(18, 2)))
            .cast(DoubleType).as("qty_kept"),
          array_max(transform(col("items"), i => i.getField("price")))
            .cast(DoubleType).as("max_price"))
        .orderBy("l_orderkey")
    },
    Some("""
      SELECT l_orderkey, COUNT(*) AS n_items,
        CAST(SUM(CASE WHEN l_returnflag != 'R'
                 THEN CAST(l_quantity AS DECIMAL(12,2))
                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_kept,
        CAST(MAX(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price
      FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey
    """.stripMargin.trim))

  /** Error-safe (TRY) casting and arithmetic — the dirty-data surface a
    * lake needs at ingest, where ANSI strictness would kill the job on
    * row one: a synthesized dirty-string column runs through try_cast
    * to INT (parse failure, empty, whitespace-padded, overflow →
    * NULL), try_cast to DATE (calendar-invalid Feb 30 → NULL),
    * try_divide (zero divisor → NULL, never ±Inf), and try_add at the
    * BIGINT ceiling (overflow → NULL). Pinned to the PORTABLE subset —
    * probed divergences deliberately excluded: DuckDB TRY_CAST rounds
    * '12.7' to 13 and parses '0x1A' where Spark returns NULL. The
    * oracle spells the same semantics with TRY_CAST + CASE guards
    * (DuckDB has no try_divide/try_add; double/0 there is ±Inf and
    * BIGINT overflow errors).
    */
  val fnTryPack: Op = Op(
    "fn_try_pack",
    (s, dir) => {
      val k = col("p_partkey")
      Tables.part(s, dir)
        .select(k,
          when(k % 5 === 0, "123").when(k % 5 === 1, "abc")
            .when(k % 5 === 2, "").when(k % 5 === 3, "  42 ")
            .otherwise(k.cast(StringType)).as("raw"),
          when(k % 3 === 0, "2024-02-29").when(k % 3 === 1, "2024-02-30")
            .otherwise("not-a-date").as("date_s"),
          (k % 3).cast(IntegerType).as("d"))
        .select(col("p_partkey"), col("raw"),
          expr("try_cast(raw AS int)").as("as_int"),
          col("date_s"),
          date_format(expr("try_cast(date_s AS date)"), "yyyy-MM-dd").as("as_date"),
          col("d"),
          expr("try_divide(cast(p_partkey AS double), d)").as("quotient"),
          expr("try_add(9223372036854775807L, p_partkey % 2)").as("guarded_add"))
        .orderBy("p_partkey")
    },
    Some("""
      WITH t AS (
        SELECT p_partkey,
          CASE WHEN p_partkey % 5 = 0 THEN '123'
               WHEN p_partkey % 5 = 1 THEN 'abc'
               WHEN p_partkey % 5 = 2 THEN ''
               WHEN p_partkey % 5 = 3 THEN '  42 '
               ELSE CAST(p_partkey AS VARCHAR) END AS raw,
          CASE WHEN p_partkey % 3 = 0 THEN '2024-02-29'
               WHEN p_partkey % 3 = 1 THEN '2024-02-30'
               ELSE 'not-a-date' END AS date_s,
          CAST(p_partkey % 3 AS INTEGER) AS d
        FROM part
      )
      SELECT p_partkey, raw,
        TRY_CAST(raw AS INTEGER) AS as_int,
        date_s,
        strftime(TRY_CAST(date_s AS DATE), '%Y-%m-%d') AS as_date,
        d,
        CASE WHEN d = 0 THEN NULL
             ELSE CAST(p_partkey AS DOUBLE) / d END AS quotient,
        CASE WHEN p_partkey % 2 = 1 THEN NULL
             ELSE 9223372036854775807 END AS guarded_add
      FROM t ORDER BY p_partkey
    """.stripMargin.trim))

  /** AES encrypt→decrypt roundtrip — the column-level-encryption
    * workflow (PII at rest, tokenization): every document's text passes
    * through `aes_encrypt` (GCM, random IV per call) and back through
    * `aes_decrypt` with the same key; the oracle is the PLAIN table, so
    * the hash match proves the roundtrip is lossless. The ciphertext
    * itself is nondeterministic BY DESIGN (fresh IV), so the graded
    * surface pins what is invariant: the decrypted text and the
    * ciphertext length (12-byte IV + payload + 16-byte tag). GCM is
    * pinned explicitly (not left to Spark's default) and the oracle
    * counts payload BYTES via DuckDB `strlen` (byte length), so neither
    * a future default-mode change nor a multi-byte fixture character
    * can break the length arithmetic (round-10 advice).
    */
  val fnCryptoRoundtrip: Op = Op(
    "fn_crypto_roundtrip",
    (s, dir) => {
      val key = "graft-demo-key16"
      Tables.documents(s, dir)
        .select(col("doc_id"),
          expr(s"cast(aes_decrypt(aes_encrypt(cast(text as binary), '$key', 'GCM'), '$key', 'GCM') as string)")
            .as("text_rt"),
          expr(s"length(aes_encrypt(cast(text as binary), '$key', 'GCM'))").cast(LongType)
            .as("ct_len"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, text AS text_rt,
        CAST(strlen(text) + 28 AS BIGINT) AS ct_len
      FROM documents ORDER BY doc_id
    """.stripMargin.trim))

  /** Spark 4 VARIANT surface — the modern semi-structured type behind
    * open-ended event properties (shredded binary encoding, typed
    * lazy extraction; the column type a 100 TB props lake stores
    * instead of strings): a nested JSON doc is built in-plan from the
    * event columns (byte-identical construction in both engines), then
    * `parse_json` → VARIANT and the full extraction surface runs over
    * it — `variant_get` at three depths and three target types
    * (string/bigint/int, incl. an array index), `is_variant_null`
    * distinguishing JSON null (planted on event_id%5=0) from a missing
    * key, `try_parse_json` swallowing malformed input (planted on
    * event_id%7=0) where the strict form would throw, and
    * `schema_of_variant` printing the inferred schema (pinned per
    * branch in the oracle — the two shapes differ exactly by the
    * planted `opt: VOID` member). Oracle via DuckDB `json_extract`
    * casts on the same constructed doc; the null/malformed/schema
    * branches are closed-form in event_id. Narrow scan → project, no
    * shuffle; extraction is row-local exactly as it is over a stored
    * VARIANT column.
    */
  val fnVariantPack: Op = Op(
    "fn_variant_pack",
    (s, dir) => {
      val doc = concat(
        lit("{\"meta\":{\"type\":\""), col("event_type"),
        lit("\",\"uid\":"), col("user_id"),
        lit(",\"tags\":[10,"), col("event_id") % 3,
        lit("]},\"props\":"), col("props"),
        when(col("event_id") % 5 === 0, lit(",\"opt\":null")).otherwise(lit("")),
        lit("}"))
      val v = parse_json(col("doc"))
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), col("user_id"), col("props"),
          doc.as("doc"))
        .select(col("event_id"), col("doc"),
          variant_get(v, "$.meta.type", "string").as("vtype"),
          variant_get(v, "$.meta.uid", "bigint").as("vuid"),
          variant_get(v, "$.meta.tags[1]", "int").as("tag1"),
          variant_get(v, "$.props.k", "int").as("k"),
          is_variant_null(variant_get(v, "$.opt", "variant")).as("opt_is_null"),
          isnull(try_parse_json(
            when(col("event_id") % 7 === 0, lit("{not json")).otherwise(col("doc"))))
            .as("bad_parse"),
          schema_of_variant(v).as("vschema"))
        .orderBy("event_id")
    },
    Some("""
      WITH d AS (
        SELECT event_id,
          '{"meta":{"type":"' || event_type || '","uid":' || user_id ||
          ',"tags":[10,' || (event_id % 3) || ']},"props":' || props ||
          CASE WHEN event_id % 5 = 0 THEN ',"opt":null' ELSE '' END || '}' AS doc
        FROM events
      )
      SELECT event_id, doc,
        json_extract_string(doc, '$.meta.type') AS vtype,
        CAST(json_extract(doc, '$.meta.uid') AS BIGINT) AS vuid,
        CAST(json_extract(doc, '$.meta.tags[1]') AS INTEGER) AS tag1,
        CAST(json_extract(doc, '$.props.k') AS INTEGER) AS k,
        (event_id % 5 = 0) AS opt_is_null,
        (event_id % 7 = 0) AS bad_parse,
        CASE WHEN event_id % 5 = 0
          THEN 'OBJECT<meta: OBJECT<tags: ARRAY<BIGINT>, type: STRING, uid: BIGINT>, opt: VOID, props: OBJECT<k: BIGINT>>'
          ELSE 'OBJECT<meta: OBJECT<tags: ARRAY<BIGINT>, type: STRING, uid: BIGINT>, props: OBJECT<k: BIGINT>>'
        END AS vschema
      FROM d ORDER BY event_id
    """.stripMargin.trim))

  /** URL function surface — `parse_url` component extraction (PROTOCOL
    * / HOST / PATH / QUERY / keyed QUERY param) plus the
    * `url_encode`/`url_decode` pair, the row-local parsing every
    * clickstream/referrer pipeline runs before it can group by
    * domain or campaign param. URLs are built in-plan from event
    * columns (byte-identical in both engines; the planted `%20` keeps
    * the URI valid — a raw space would make java.net.URI reject it and
    * parse_url return NULL). Two semantics are pinned empirically and
    * mirrored in the oracle: a keyed QUERY extraction returns the RAW
    * (still-encoded) param, and url_encode is
    * java.net.URLEncoder-shaped (space → '+'), exactly mirrorable by
    * replace() over the restricted charset the fixture feeds it.
    * DuckDB 1.0 has no parse_url, so the oracle extracts components
    * with anchored regexps — same grammar, different engine. Row-local
    * scan→project, no shuffle.
    */
  val fnUrlPack: Op = Op(
    "fn_url_pack",
    (s, dir) => {
      val u = col("url")
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), col("user_id"),
          concat(lit("https://"), col("event_type"), lit(".example.com/u/"),
            col("user_id"), lit("/item?id="), col("event_id") % 100,
            lit("&q=hello%20world&lang=en")).as("url"))
        .select(col("event_id"), u,
          parse_url(u, lit("PROTOCOL")).as("proto"),
          parse_url(u, lit("HOST")).as("host"),
          parse_url(u, lit("PATH")).as("path"),
          parse_url(u, lit("QUERY")).as("query"),
          parse_url(u, lit("QUERY"), lit("q")).as("q_raw"),
          url_decode(parse_url(u, lit("QUERY"), lit("q"))).as("q_decoded"),
          url_encode(concat(col("event_type"), lit(" "), col("user_id")))
            .as("tag_encoded"))
        .orderBy("event_id")
    },
    Some("""
      WITH u AS (
        SELECT event_id, event_type, user_id,
          'https://' || event_type || '.example.com/u/' || user_id ||
          '/item?id=' || (event_id % 100) || '&q=hello%20world&lang=en' AS url
        FROM events
      )
      SELECT event_id, url,
        regexp_extract(url, '^([a-z]+)://', 1) AS proto,
        regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
        regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
        regexp_extract(url, '\?([^#]*)', 1) AS query,
        regexp_extract(url, '[?&]q=([^&#]*)', 1) AS q_raw,
        replace(regexp_extract(url, '[?&]q=([^&#]*)', 1), '%20', ' ')
          AS q_decoded,
        replace(event_type || ' ' || user_id, ' ', '+') AS tag_encoded
      FROM u ORDER BY event_id
    """.stripMargin.trim))

  /** Spark 4 collation semantics pinned over the mixed-case part
    * fixture (p_type UPPER, p_name lower, p_brand Mixed): a
    * case-insensitive dim join on `collate(p_type,'UTF8_LCASE')`
    * against lowercase literals, plus contains/startswith/endswith/
    * equality counts where the UTF8_BINARY twin provably differs
    * (every cross-case probe hits 0 under binary — the pack grades
    * that the collation is APPLIED, not that the data happens to
    * match). DuckDB has no UTF8_LCASE; the oracle mirrors via
    * lower() normalization — semantically identical for the ASCII
    * fixture. Scale shape: per-row predicates + one broadcast dim
    * join + one global agg; collation adds no shuffle — but note the
    * planner demotes collated-key joins to BroadcastNestedLoopJoin
    * (collated strings lack binary equality, so no hash join): bounded
    * at 6 comparisons/row here, but a LARGE-large collated join at
    * 100 TB should lower()-normalize its keys instead.
    */
  val fnCollationPack: Op = Op(
    "fn_collation_pack",
    (s, dir) => {
      import s.implicits._
      val dim = Seq("economy", "large", "medium", "promo", "small",
        "standard").toDF("type_lc")
      val p = Tables.part(s, dir)
      val scalars = p.agg(
        count(when(expr("contains(collate(p_name, 'UTF8_LCASE'), 'RING')"),
          lit(1))).as("n_contains_lc"),
        count(when(expr("contains(p_name, 'RING')"), lit(1)))
          .as("n_contains_bin"),
        count(when(expr("startswith(collate(p_type, 'UTF8_LCASE'), 'stand')"),
          lit(1))).as("n_starts_lc"),
        count(when(expr("endswith(collate(p_name, 'UTF8_LCASE'), 'D')"),
          lit(1))).as("n_ends_lc"),
        count(when(expr("collate(p_brand, 'UTF8_LCASE') = 'brand#23'"),
          lit(1))).as("n_eq_lc"),
        count(when(col("p_brand") === "brand#23", lit(1))).as("n_eq_bin"))
      p.join(broadcast(dim),
          expr("collate(p_type, 'UTF8_LCASE') = type_lc"))
        .groupBy("type_lc").agg(count(lit(1)).as("n_parts"))
        .crossJoin(broadcast(scalars))
        .orderBy("type_lc")
    },
    Some("""
      WITH dim(type_lc) AS (
        VALUES ('economy'),('large'),('medium'),('promo'),('small'),('standard')
      ), s AS (
        SELECT
          COUNT(*) FILTER (WHERE contains(lower(p_name), lower('RING'))) AS n_contains_lc,
          COUNT(*) FILTER (WHERE contains(p_name, 'RING')) AS n_contains_bin,
          COUNT(*) FILTER (WHERE starts_with(lower(p_type), 'stand')) AS n_starts_lc,
          COUNT(*) FILTER (WHERE ends_with(lower(p_name), lower('D'))) AS n_ends_lc,
          COUNT(*) FILTER (WHERE lower(p_brand) = 'brand#23') AS n_eq_lc,
          COUNT(*) FILTER (WHERE p_brand = 'brand#23') AS n_eq_bin
        FROM part
      ), j AS (
        SELECT d.type_lc, COUNT(*) AS n_parts
        FROM part p JOIN dim d ON lower(p.p_type) = d.type_lc
        GROUP BY d.type_lc
      )
      SELECT j.type_lc, j.n_parts, s.n_contains_lc, s.n_contains_bin,
        s.n_starts_lc, s.n_ends_lc, s.n_eq_lc, s.n_eq_bin
      FROM j CROSS JOIN s ORDER BY j.type_lc
    """.stripMargin.trim))

  /** Phonetic keys — fuzzy name matching's classic blocking functions:
    * Spark's native `soundex()` (codegen'd Catalyst expression) plus two
    * portable companions (reversed word for rhyme blocking, vowel
    * signature) over the part-name head word, with a per-code group
    * count joined back so each row carries its block size. The ORACLE
    * re-derives soundex from first principles in SQL: vowels/Y are
    * code-0 separators that RESET the run, but H and W are
    * TRANSPARENT — a consonant separated from a same-coded consonant
    * only by H/W still collapses (ashcraft → A261, not A226; the
    * UnitSuite pin caught a first-cut oracle that wrongly treated H/W
    * as separators — the fixture's 8 head words never exercise the
    * rule, the textbook latent-oracle case). So: DELETE H/W from the
    * body, prepend the head letter's full-map code, translate
    * letters→codes, collapse adjacent equal codes, drop the first
    * group, drop separators, pad to 3. DuckDB's RE2 has no
    * backreferences, so the collapse is seven chained single-digit
    * replaces ('00+'→'0' … '66+'→'6') rather than '(.)\1+'.
    *
    * Scale shape: per-row projection + one tiny (≤ code-space) agg
    * broadcast back — the blocking-key profile: at 100 TB the keys
    * partition a fuzzy-join's candidate space, which is the point.
    */
  val fnPhoneticPack: Op = Op(
    "fn_phonetic_pack",
    (s, dir) => {
      val base = Tables.part(s, dir)
        .select(col("p_partkey"),
          split(col("p_name"), " ").getItem(0).as("w"))
        .select(col("p_partkey"), col("w"),
          soundex(upper(col("w"))).as("sdx"),
          reverse(col("w")).as("rhyme_key"),
          regexp_replace(col("w"), "[^aeiou]", "").as("vowel_sig"))
      val blocks = base.groupBy("sdx")
        .agg(count(lit(1)).as("block_n"))
      base.join(broadcast(blocks), Seq("sdx"))
        .select(col("p_partkey"), col("w"), col("sdx"),
          col("rhyme_key"), col("vowel_sig"), col("block_n"))
        .orderBy("p_partkey")
    },
    Some("""
      WITH w0 AS (
        SELECT p_partkey, string_split(p_name, ' ')[1] AS w FROM part
      ), cd AS (
        -- head letter's code from the FULL map, body with H/W deleted
        -- (transparent) then mapped through the 24-letter map
        SELECT *,
          translate(upper(substr(w, 1, 1)),
            'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
            '01230120022455012623010202') ||
          translate(regexp_replace(upper(substr(w, 2)), '[HW]', '', 'g'),
            'ABCDEFGIJKLMNOPQRSTUVXYZ',
            '012301202245501262301202') AS codes
        FROM w0
      ), cl AS (
        SELECT *,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(regexp_replace(regexp_replace(codes,
            '00+', '0', 'g'), '11+', '1', 'g'), '22+', '2', 'g'),
            '33+', '3', 'g'), '44+', '4', 'g'), '55+', '5', 'g'),
            '66+', '6', 'g') AS coll
        FROM cd
      ), sx AS (
        SELECT p_partkey, w,
          upper(substr(w, 1, 1)) ||
            rpad(substr(replace(substr(coll, 2), '0', ''), 1, 3), 3, '0')
            AS sdx,
          reverse(w) AS rhyme_key,
          regexp_replace(w, '[^aeiou]', '', 'g') AS vowel_sig
        FROM cl
      )
      SELECT p_partkey, w, sdx, rhyme_key, vowel_sig,
        COUNT(*) OVER (PARTITION BY sdx) AS block_n
      FROM sx ORDER BY p_partkey
    """.stripMargin.trim))

  /** Rounding-mode pack — the cross-engine rounding SEMANTICS pinned as
    * a graded query (this round alone hit two portability forks in
    * `round(double, n)` half-way handling, so the house treats rounding
    * modes as first-class semantics, not incidental formatting): over
    * exact DECIMAL prices (2-dp inputs put an exact .X5 on ~1/10 of
    * rows — real half-way cases, not contrived), per return flag:
    * HALF_UP (`round` ↔ DuckDB `round`, away-from-zero on decimals),
    * HALF_EVEN (`bround` — banker's, the IEEE/SQL default for money),
    * ceil/floor envelopes, and the count of rows where the two modes
    * actually disagree. All arithmetic is exact decimal; sums surface
    * as doubles. FINDING, verified while building this op: DuckDB's
    * `round_even(DECIMAL, n)` detours through DOUBLE and misrounds
    * 411/60k fixture halves (e.g. 79864.65 → 79864.7; the nearest
    * double sits above the exact half) while Spark's `bround` and
    * DuckDB's `round` are exact on decimals — so the oracle's
    * HALF_EVEN leg is derived from exact integer cents
    * (t + (t MOD 2) at rem = 5) rather than `round_even`. The op IS
    * the regression test for that class of defect.
    *
    * Scale shape: per-row projection + one partial+final aggregate on
    * a 3-value key.
    */
  val fnRoundingPack: Op = Op(
    "fn_rounding_pack",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"), dec2(col("l_extendedprice")).as("v"))
        .select(col("l_returnflag"),
          round(col("v"), 1).as("r_half_up"),
          bround(col("v"), 1).as("r_half_even"),
          ceil(col("v")).as("r_ceil"),
          floor(col("v")).as("r_floor"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(when(col("r_half_up") =!= col("r_half_even"), 1L)
            .otherwise(0L)).as("n_mode_divergent"),
          sum(col("r_half_up")).cast(DoubleType).as("sum_half_up"),
          sum(col("r_half_even")).cast(DoubleType).as("sum_half_even"),
          sum(col("r_ceil")).cast(DoubleType).as("sum_ceil"),
          sum(col("r_floor")).cast(DoubleType).as("sum_floor"))
        .orderBy("l_returnflag"),
    Some("""
      WITH v AS (
        SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(12,2)) AS v,
          CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
            AS cents
        FROM lineitem
      ), r AS (
        SELECT l_returnflag,
          round(v, 1) AS r_half_up,
          -- exact half-even from integer cents: round_even(DECIMAL, n)
          -- detours through DOUBLE and misrounds large .X5 halves
          CASE WHEN cents % 10 < 5 THEN cents // 10
               WHEN cents % 10 > 5 THEN cents // 10 + 1
               ELSE cents // 10 + (cents // 10) % 2 END AS he_tenths,
          ceil(v) AS r_ceil,
          floor(v) AS r_floor
        FROM v
      )
      SELECT l_returnflag, COUNT(*) AS n,
        CAST(SUM(CASE WHEN CAST(r_half_up * 10 AS BIGINT) <> he_tenths
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_mode_divergent,
        CAST(SUM(r_half_up) AS DOUBLE) AS sum_half_up,
        CAST(SUM(he_tenths) AS DOUBLE) / 10 AS sum_half_even,
        CAST(SUM(r_ceil) AS DOUBLE) AS sum_ceil,
        CAST(SUM(r_floor) AS DOUBLE) AS sum_floor
      FROM r GROUP BY l_returnflag ORDER BY l_returnflag
    """.stripMargin.trim))

  val ops: Seq[Op] = Seq(
    fnPhoneticPack, fnRoundingPack,
    fnStringPack, fnDatePack, fnMathCase, fnArrayPack, fnHigherOrder,
    fnMapPack, fnJsonExtract, fnCastCoalesce, fnBitwisePack, fnRegexpPack,
    fnTrigPack, fnGeoPack, fnIpPack, fnStructPack, fnGeneratorOuter, fnHashPack, fnUuidV3, fnNestedAgg,
    fnTryPack, fnCryptoRoundtrip, fnVariantPack, fnUrlPack, fnCollationPack)
}
