package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables._

/** Scalar-function surface (SURVEY.md §2b): string / date / math / array /
  * JSON functions, plus the batch-equivalent shapes of the streaming
  * windows (tumbling / sliding / session — `window()` and
  * `session_window()` evaluate identically over batch input, which is what
  * makes them oracle-checkable; the true streaming path with watermarks is
  * exercised in the scalatest suites).
  *
  * All expressions here are chosen to be bit-deterministic across engines:
  * integer ops, IEEE double ops (mul/div/sqrt/abs), exact decimal sums —
  * no libm-dependent functions (ln, pow) and no double rounding in the
  * oracle path.
  */
object CatalogScalar {
  type Q = (SparkSession, String) => DataFrame

  // 10 minutes / 5 minutes in microseconds (for the DuckDB window oracle).
  private val M10 = 600000000L
  private val M5 = 300000000L

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // ---- scalar: strings ---------------------------------------------
    ("q22_scalar_string", (s: SparkSession, d: String) => {
      table(s, d, "part")
        .select(col("p_partkey"),
          substring(col("p_name"), 1, 8).as("name_prefix"),
          upper(col("p_brand")).as("brand_upper"),
          lower(col("p_type")).as("type_lower"),
          regexp_replace(col("p_type"), " ", "_").as("type_snake"),
          length(col("p_name")).as("name_len"),
          concat(col("p_brand"), lit("#"), col("p_size").cast("string")).as("tag"),
          regexp_extract(col("p_type"), "(\\w+)$", 1).as("last_word"),
          element_at(split(col("p_type"), " "), 1).as("first_word"),
          trim(col("p_name")).as("name_trim"))
        .filter(col("p_name").like("%a%"))
        .orderBy("p_partkey")
    }, Some(
      """SELECT p_partkey,
        |       substring(p_name, 1, 8) AS name_prefix,
        |       upper(p_brand) AS brand_upper,
        |       lower(p_type) AS type_lower,
        |       replace(p_type, ' ', '_') AS type_snake,
        |       length(p_name) AS name_len,
        |       p_brand || '#' || CAST(p_size AS VARCHAR) AS tag,
        |       regexp_extract(p_type, '(\w+)$', 1) AS last_word,
        |       string_split(p_type, ' ')[1] AS first_word,
        |       trim(p_name) AS name_trim
        |FROM part WHERE p_name LIKE '%a%'
        |ORDER BY p_partkey""".stripMargin)),

    // ---- scalar: dates ------------------------------------------------
    ("q23_scalar_date", (s: SparkSession, d: String) => {
      table(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dy"),
          quarter(col("o_orderdate")).as("qtr"),
          date_trunc("month", col("o_orderdate")).as("mon_start"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"),
          date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy("o_orderkey")
    }, Some(
      """SELECT o_orderkey, o_orderdate,
        |       year(o_orderdate) AS yr,
        |       month(o_orderdate) AS mo,
        |       day(o_orderdate) AS dy,
        |       quarter(o_orderdate) AS qtr,
        |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon_start,
        |       CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INTEGER) AS days_since,
        |       CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
        |       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ---- scalar: math -------------------------------------------------
    ("q24_scalar_math", (s: SparkSession, d: String) => {
      table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("absd"),
          ceil(col("l_extendedprice")).as("ceilp"),
          floor(col("l_extendedprice")).as("floorp"),
          sqrt(col("l_extendedprice")).as("rootp"),
          (col("l_quantity") * col("l_quantity")).as("qty_sq"),
          (col("l_linenumber") % 3).as("ln_mod"),
          signum(col("l_discount") - 0.05).cast("int").as("sgn"),
          greatest(col("l_tax"), col("l_discount")).as("hi_rate"),
          least(col("l_tax"), col("l_discount")).as("lo_rate"))
        // lineitem's (orderkey, linenumber) is non-unique: extend the sort
        // to a total order over deterministic derived columns.
        .orderBy("l_orderkey", "l_linenumber", "rootp", "absd", "qty_sq",
          "hi_rate", "lo_rate")
    }, Some(
      """SELECT l_orderkey, l_linenumber,
        |       abs(l_discount - 0.05) AS absd,
        |       CAST(ceil(l_extendedprice) AS BIGINT) AS ceilp,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS floorp,
        |       sqrt(l_extendedprice) AS rootp,
        |       l_quantity * l_quantity AS qty_sq,
        |       l_linenumber % 3 AS ln_mod,
        |       CAST(sign(l_discount - 0.05) AS INTEGER) AS sgn,
        |       greatest(l_tax, l_discount) AS hi_rate,
        |       least(l_tax, l_discount) AS lo_rate
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, rootp, absd, qty_sq, hi_rate, lo_rate""".stripMargin)),

    // ---- scalar: arrays (higher-order functions) ----------------------
    // Array transforms stay arrays through the computation; the OUTPUT
    // unwraps each 4-lane array into scalar float columns because the
    // driver's pandas compare sorts every column and cannot factorize
    // ndarray cells (round-1 q25 failure). Scalars also keep the float
    // bits engine-exact, where a string rendering would not.
    ("q25_scalar_array", (s: SparkSession, d: String) => {
      val arrs = table(s, d, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).as("first_e"),
          element_at(col("embedding"), -1).as("last_e"),
          slice(col("embedding"), 1, 4).as("head4"),
          transform(slice(col("embedding"), 1, 4), x => x + lit(1.0f)).as("plus1"),
          reverse(slice(col("embedding"), 1, 4)).as("rev4"),
          sort_array(slice(col("embedding"), 1, 4)).as("sorted4"))
      val lanes = Seq("head4", "plus1", "rev4", "sorted4").flatMap(c =>
        (1 to 4).map(i => element_at(col(c), i).as(s"${c}_$i")))
      arrs.select(col("vec_id") +: col("dim") +: col("first_e") +: col("last_e") +: lanes: _*)
        .orderBy("vec_id")
    }, Some {
      val lanes = Seq("head4", "plus1", "rev4", "sorted4").flatMap(c =>
        (1 to 4).map(i => s"$c[$i] AS ${c}_$i")).mkString(",\n|       ")
      s"""WITH a AS (
         |  SELECT vec_id,
         |         CAST(len(embedding) AS INTEGER) AS dim,
         |         embedding[1] AS first_e,
         |         embedding[-1] AS last_e,
         |         embedding[1:4] AS head4,
         |         list_transform(embedding[1:4], x -> x + CAST(1.0 AS FLOAT)) AS plus1,
         |         list_reverse(embedding[1:4]) AS rev4,
         |         list_sort(embedding[1:4]) AS sorted4
         |  FROM embeddings)
         |SELECT vec_id, dim, first_e, last_e,
         |       $lanes
         |FROM a ORDER BY vec_id""".stripMargin
    }),

    // ---- scalar: JSON -------------------------------------------------
    // Mirrors the reference's wire format (JSON payloads decoded on read,
    // /root/reference/README.md:36-39): from_json is the schema-on-read
    // path, get_json_object the ad-hoc path.
    ("q26_scalar_json", (s: SparkSession, d: String) => {
      // one schema-on-read parse per row (subexpression-eliminated across
      // the three outputs) instead of three independent JSON scans
      val k = from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k")
      table(s, d, "events")
        .select(col("event_id"), col("props"),
          k.cast("string").as("k_str"),
          k.as("k_int"),
          k.as("k_parsed"),
          col("props").like("%\"k\"%").as("has_k"))
        .orderBy("event_id")
    }, Some(
      """SELECT event_id, props,
        |       json_extract_string(props, '$.k') AS k_str,
        |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
        |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_parsed,
        |       props LIKE '%"k"%' AS has_k
        |FROM events ORDER BY event_id""".stripMargin)),

    // ---- streaming shapes (batch-equivalent, oracle-checkable) --------
    // Tumbling event-time window; at scale the pre-aggregation happens
    // map-side per file split before the one shuffle on (window, type).
    ("q28_window_tumbling", (s: SparkSession, d: String) => {
      table(s, d, "events")
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")
    }, Some(
      s"""SELECT make_timestamp((epoch_us(ts) // $M10) * $M10) AS w_start,
         |       make_timestamp((epoch_us(ts) // $M10) * $M10 + $M10) AS w_end,
         |       event_type, count(*) AS n, ${dsumSql("value")} AS sum_value
         |FROM events GROUP BY 1, 2, 3
         |ORDER BY w_start, event_type""".stripMargin)),

    // Sliding window (10 min window, 5 min slide → each event lands in
    // exactly two windows).
    ("q29_window_sliding", (s: SparkSession, d: String) => {
      table(s, d, "events")
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
          col("event_type"), col("n"))
        .orderBy("w_start", "event_type")
    }, Some(
      s"""SELECT make_timestamp(((epoch_us(ts) // $M5) - off) * $M5) AS w_start,
         |       make_timestamp(((epoch_us(ts) // $M5) - off) * $M5 + $M10) AS w_end,
         |       event_type, count(*) AS n
         |FROM events, (SELECT unnest([0, 1]) AS off) offs
         |GROUP BY 1, 2, 3
         |ORDER BY w_start, event_type""".stripMargin)),

    // Session window, 30-minute gap, per user (gaps-and-islands oracle).
    ("q30_window_session", (s: SparkSession, d: String) => {
      table(s, d, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("session_window.start").as("s_start"),
          col("session_window.end").as("s_end"),
          col("user_id"), col("n"), col("sum_value"))
        .orderBy("user_id", "s_start")
    }, Some(
      s"""WITH x AS (
         |  SELECT user_id, event_id, ts, value,
         |         CASE WHEN lag(ts) OVER w IS NULL
         |                OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
         |              THEN 1 ELSE 0 END AS new_s
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |), y AS (
         |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                             ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM x
         |)
         |SELECT min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTE AS s_end,
         |       user_id, count(*) AS n, ${dsumSql("value")} AS sum_value
         |FROM y GROUP BY user_id, sid
         |ORDER BY user_id, s_start""".stripMargin)),

    // ---- text / documents --------------------------------------------
    // Exact deduplication by content hash (keep lowest id per group) —
    // the hash-groupBy dedup pattern; at 100 TB group on the hash, never
    // on the raw text.
    ("q31_dedup_exact", (s: SparkSession, d: String) => {
      table(s, d, "documents")
        .groupBy(md5(col("text").cast("binary")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("h")
    }, Some(
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY h""".stripMargin)),

    // Token counting + basic text statistics (whitespace tokenizer).
    ("q32_text_stats", (s: SparkSession, d: String) => {
      val nTokens = size(split(trim(col("text")), "\\s+"))
      table(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          length(col("text")).as("len_chars"),
          nTokens.as("n_tokens"),
          (length(regexp_replace(col("text"), " ", "")).cast("double") /
            nTokens.cast("double")).as("avg_token_len"),
          col("text").like("%spark%").as("has_spark"),
          upper(substring(col("text"), 1, 10)).as("head_upper"))
        .orderBy("doc_id")
    }, Some(
      """SELECT doc_id, n_chars,
        |       length(text) AS len_chars,
        |       CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
        |       CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |         / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS avg_token_len,
        |       text LIKE '%spark%' AS has_spark,
        |       upper(substring(text, 1, 10)) AS head_upper
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- multimodal plumbing (binary columns + typed metadata) --------
    // Media payloads are opaque binary columns; here the binary handling
    // (length, magic bytes, content hash) is real — actual image/audio
    // decode is a stub in graft.ops.Multimodal (libs not in container).
    ("q34_multimodal_meta", (s: SparkSession, d: String) => {
      val bin = col("text").cast("binary")
      table(s, d, "documents")
        .select(col("doc_id"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 3).cast("int") + 1).as("media_type"),
          length(bin).as("media_len"),
          upper(hex(substring(bin, 1, 4))).as("magic_hex"),
          sha2(bin, 256).as("content_sha"))
        .orderBy("doc_id")
    }, Some(
      """SELECT doc_id,
        |       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |       CAST(octet_length(encode(text)) AS INTEGER) AS media_len,
        |       upper(hex(encode(substring(text, 1, 4)))) AS magic_hex,
        |       sha256(text) AS content_sha
        |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
