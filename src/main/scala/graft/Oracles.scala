package graft

import graft.llm.Dedup

/** DuckDB oracle SQL for every [[Queries]] entry (except rows-only ops).
  *
  * Parity rules (per FIXTURES.md §3): column names identical to the
  * Spark side, floats rounded identically on both sides, integer widths
  * cast to match Spark's output types (DuckDB widens to BIGINT/HUGEINT
  * where Spark stays INT/BIGINT). Filters on floating thresholds are
  * applied to the same (rounded or unrounded) expression as Spark.
  */
object Oracles {

  /** Rewrite every `round(expr, n)` in an oracle SQL string into the
    * engine-portable floor-based form ([[Portable.roundSql]]), so both
    * engines round identically on knife-edge doubles. The SQL below is
    * written with plain `round(...)` for readability; this pass is
    * applied at map construction.
    */
  private[graft] def portabilize(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val at = sql.indexOf("round(", i)
      val isWordStart = at >= 0 &&
        (at == 0 || !Character.isLetterOrDigit(sql.charAt(at - 1)) && sql.charAt(at - 1) != '_')
      if (at < 0) { out.append(sql.substring(i)); i = sql.length }
      else if (!isWordStart) { out.append(sql.substring(i, at + 6)); i = at + 6 }
      else {
        out.append(sql.substring(i, at))
        // scan balanced parens from the '(' after "round"
        var depth = 0
        var j = at + 5
        var lastTopComma = -1
        var done = -1
        while (done < 0 && j < sql.length) {
          sql.charAt(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) done = j
            case ',' if depth == 1 => lastTopComma = j
            case _ =>
          }
          j += 1
        }
        require(done > 0 && lastTopComma > 0, s"unparseable round() at $at")
        // Recurse into the argument so nested round() calls are also
        // rewritten (latent today, but double-rounding is a plausible
        // future parity pattern).
        val expr = portabilize(sql.substring(at + 6, lastTopComma).trim)
        val n = sql.substring(lastTopComma + 1, done).trim.toInt
        out.append(Portable.roundSql(expr, n))
        i = done + 1
      }
    }
    out.toString
  }

  // Shared text fragments ------------------------------------------- //

  /** Tokenization must mirror TextStats.tokens: split(lower(text), " +"). */
  private val WS = "string_split_regex(lower(text), '\\s+')"

  /** 3-gram shingles of a token list (mirrors Dedup.shingles(n=3)). */
  private def shingleExpr(ws: String): String =
    s"CASE WHEN len($ws) < 3 THEN []::VARCHAR[] ELSE " +
      s"list_transform(generate_series(1, len($ws)-2), i -> $ws[i] || ' ' || $ws[i+1] || ' ' || $ws[i+2]) END"

  /** Engine-portable 60-bit hash (mirrors TextStats.portableHash). */
  private def pHash(x: String): String = s"('0x' || substr(md5($x), 1, 15))::BIGINT"

  /** Count-Min fragments (mirror Sketches.bucketOf / cmsCoeffs). */
  private val cmsW = 1024
  private def cmsBucketSql(hExpr: String, j: Int): String = {
    val (a, b) = graft.llm.Sketches.cmsCoeffs(4)(j)
    s"((($a * (($hExpr) % 2147483647)) + $b) % 2147483647) % $cmsW"
  }

  /** Hourly OHLCV candles per event_type (mirrors eventCandles). */
  private def hourlyCandles(where: String): String =
    s"""SELECT event_type AS code, date_trunc('hour', ts) AS ts,
       arg_min("value", ts) AS open, max("value") AS high, min("value") AS low,
       arg_max("value", ts) AS close, sum("value") AS volume
       FROM events $where GROUP BY 1, 2"""

  /** The store end-state after upserting batch A (event_id%3<>0) then
    * batch B (event_id%3=0): B wins on any (code, ts) both cover.
    */
  private val storeEndState: String =
    s"""WITH a AS (${hourlyCandles("WHERE event_id % 3 <> 0")}),
       b AS (${hourlyCandles("WHERE event_id % 3 = 0")}),
       u AS (SELECT *, 1 AS src FROM b UNION ALL SELECT *, 0 AS src FROM a),
       r AS (SELECT *, row_number() OVER (PARTITION BY code, ts ORDER BY src DESC) AS rn FROM u)"""

  // MinHash / SimHash generated fragments --------------------------- //

  private val minhashSigList: String = {
    val terms = Dedup.minhashCoeffs(32).map { case (a, b) =>
      s"list_min(list_transform(h, x -> (${a}*x + ${b}) % 2147483647))"
    }
    terms.mkString("[", ",\n ", "]")
  }

  private val minhashBandList: String =
    (0 until 8).map { j =>
      s"'$j' || '|' || md5(array_to_string(sig[${j * 4 + 1}:${j * 4 + 4}], ':'))"
    }.mkString("[", ",\n ", "]")

  private val simhashSigExpr: String =
    (0 until 32).map { j =>
      s"(CASE WHEN list_sum(list_transform(h, x -> CASE WHEN (x >> $j) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " +\n ", ")::BIGINT")

  private val simhashBandList: String =
    (0 until 7).map { j =>
      s"'$j' || '|' || ((sig >> ${j * 4}) & 15)::VARCHAR"
    }.mkString("[", ",\n ", "]")

  /** The full MinHash+LSH candidate/verify pipeline (mirrors
    * `Dedup.minhashNearDupPairs` with q52's parameters) as a chain of
    * CTE definitions ending in `jj(id_a, id_b, i, nn)`. Shared by q52
    * (pairs), q69 (connected components over the pair graph), and q87
    * (the composed curation pipeline, over its deduped CTE).
    */
  /** The recursive-CC mirror shared by every cluster-consuming oracle
    * (q69/q87/q8D/q8M): LSH pair threshold → undirected edges →
    * reachability closure → min-reachable-id component. Appends the
    * px/edges/reach/comp CTE chain after [[minhashPairsCtes]]'s `jj`.
    */
  private def ccCtes(threshold: Double = 0.3): String =
    s"""px AS (SELECT id_a, id_b FROM jj WHERE i / (nn - i) >= $threshold),
       edges AS (SELECT id_a AS u, id_b AS v FROM px
                 UNION SELECT id_b, id_a FROM px),
       reach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM edges) n
                       UNION
                       SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
       comp AS (SELECT u AS id, min(v) AS component FROM reach GROUP BY u)"""

  private def minhashPairsCtes(from: String = "documents"): String =
    s"""tok AS (SELECT doc_id AS id, $WS AS ws FROM $from),
       shl AS (SELECT id, ${shingleExpr("ws")} AS sh FROM tok),
       f AS (SELECT id, sh FROM shl WHERE len(sh) > 0),
       hs AS (SELECT id, sh, list_transform(sh, s -> ${pHash("s")} % 2147483647) AS h FROM f),
       sg AS (SELECT id, sh, $minhashSigList AS sig FROM hs),
       band AS (SELECT id, unnest($minhashBandList) AS band FROM sg),
       cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                FROM band a JOIN band b ON a.band = b.band AND a.id < b.id),
       jj AS (SELECT c.id_a, c.id_b,
                len(list_intersect(list_distinct(fa.sh), list_distinct(fb.sh)))::DOUBLE AS i,
                (len(list_distinct(fa.sh)) + len(list_distinct(fb.sh)))::DOUBLE AS nn
              FROM cand c JOIN f fa ON c.id_a = fa.id JOIN f fb ON c.id_b = fb.id)"""

  // ----------------------------------------------------------------- //

  def sql: Map[String, String] = raw.map { case (k, v) => k -> portabilize(v) }

  private def raw: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS cnt
         FROM lineitem GROUP BY 1, 2""",
    "q02_filter_case" ->
      """SELECT l_orderkey, l_linenumber,
         CASE WHEN l_quantity > 25 THEN 'big' ELSE 'small' END AS size_class,
         round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS net_price,
         l_returnflag || '-' || l_linestatus AS flag_status
         FROM lineitem
         WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
           AND l_returnflag IN ('A', 'R') AND l_quantity BETWEEN 5 AND 45""",
    "q03_join_nation_revenue" ->
      """SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1""",
    "q04_left_join_counts" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
         round(coalesce(sum(o_totalprice), 0), 2) AS total_spend
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY 1""",
    "q05_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""",
    "q06_anti_join" ->
      """SELECT c_custkey, round(c_acctbal, 2) AS acctbal FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q07_broadcast_brand" ->
      """SELECT p_brand, round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt,
         round(avg(p_retailprice), 4) AS avg_retail
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY 1""",
    "q08_distinct_agg" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust,
         count(*) AS n_orders, round(max(o_totalprice), 2) AS max_price
         FROM orders GROUP BY 1""",
    "q09_rollup" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
         count(*) AS cnt
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "q10_cube" ->
      """SELECT l_returnflag, l_linestatus, round(avg(l_discount), 6) AS avg_disc,
         count(*) AS cnt
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",
    "q11_window_rank" ->
      """SELECT o_custkey, o_orderkey,
         row_number() OVER w::INT AS rn, rank() OVER w::INT AS rnk,
         dense_rank() OVER w::INT AS drnk, ntile(4) OVER w::INT AS nt
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)""",
    "q12_window_running" ->
      """SELECT o_custkey, o_orderkey,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spend,
         round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS mov3_avg,
         round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC), 2) AS prev_price,
         round(lead(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC), 2) AS next_price
         FROM orders""",
    "q13_topk_per_group" ->
      """SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
         FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey ASC)::INT AS rn FROM orders)
         WHERE rn <= 3""",
    "q14_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""",
    "q15_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""",
    "q16_union" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         UNION
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""",
    "q17_string_fns" ->
      """SELECT p_partkey,
         upper(substring(p_name, 1, 5)) AS name_u5,
         lower(p_brand) AS brand_l,
         length(p_name)::INT AS name_len,
         regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
         string_split(p_name, ' ')[1] AS first_word,
         concat(trim(p_type), '_', p_brand) AS type_brand,
         p_name LIKE '%bolt%' AS has_bolt,
         p_brand IS NOT DISTINCT FROM 'Brand#17' AS is_b17_nullsafe
         FROM part""",
    "q18_datetime_fns" ->
      """SELECT o_orderkey,
         year(o_orderdate)::INT AS yr, month(o_orderdate)::INT AS mo,
         day(o_orderdate)::INT AS dom, quarter(o_orderdate)::INT AS qtr,
         date_trunc('month', o_orderdate)::TIMESTAMP AS month_start,
         epoch(o_orderdate)::BIGINT AS epoch_s
         FROM orders""",
    "q19_math_fns" ->
      """SELECT l_orderkey, l_linenumber,
         round(abs(l_discount - 0.05), 4) AS abs_disc,
         round(pow(l_quantity, 2), 2) AS qty_sq,
         round(sqrt(l_extendedprice), 4) AS sqrt_price,
         round(ln(l_extendedprice), 4) AS ln_price,
         floor(l_tax * 100)::BIGINT AS tax_floor,
         ceil(l_discount * 100)::BIGINT AS disc_ceil
         FROM lineitem""",
    "q20_json_extract" ->
      """SELECT event_id, json_extract_string(props, '$.k')::INT AS k_val
         FROM events WHERE event_type IN ('click', 'purchase')""",
    "q4B_pivot" ->
      """PIVOT events ON event_type IN ('click', 'error', 'purchase', 'signup', 'view')
         USING count(*) GROUP BY user_id""",
    "q4C_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, round(val, 4) AS val
         FROM (SELECT l_orderkey, l_linenumber, l_quantity AS qty,
               l_discount AS disc, l_tax AS tax FROM lineitem)
         UNPIVOT (val FOR metric IN (qty, disc, tax))""",
    "q4D_rank_dist" ->
      """SELECT o_orderpriority, o_orderkey,
         round(percent_rank() OVER w, 6) AS pct_rank,
         round(cume_dist() OVER w, 6) AS cume
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC)""",
    "q43_map_json" ->
      """SELECT event_id,
         len(json_keys(props))::INT AS n_keys,
         list_sort(json_keys(props))[1] AS first_key,
         json_extract_string(props, '$.k')::INT AS k_val,
         list_sum(list_transform(json_keys(props),
           k -> json_extract_string(props, '$.' || k)::INT))::INT AS vals_sum
         FROM events""",
    "q21_having" ->
      """SELECT user_id, count(*) AS n_events FROM events
         GROUP BY 1 HAVING count(*) > 70""",
    "q22_orderby_limit" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS extendedprice
         FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
         LIMIT 20""",
    "q23_cross_join" ->
      """SELECT r_name, o_orderstatus
         FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) t""",
    "q24_full_outer" ->
      """WITH c AS (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1),
       s AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY 1)
       SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
         coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
       FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey""",
    "q25_range_join" ->
      """SELECT o_orderkey, count(*) AS n_fast_lines
         FROM orders JOIN lineitem
           ON o_orderkey = l_orderkey
          AND l_shipdate >= o_orderdate
          AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
         GROUP BY 1""",
    "q26_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
         count(*) AS cnt
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
           (l_returnflag, l_linestatus), ())""",
    "q6E_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
           AND NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderstatus = 'F' AND o.o_totalprice < 5000)""",
    "q6F_scalar_subquery" ->
      """SELECT c_custkey,
           (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
           round((SELECT coalesce(sum(o.o_totalprice), 0.0) FROM orders o
                  WHERE o.o_custkey = c.c_custkey), 2) AS total_spend
         FROM customer c
         WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer)""",
    "q27_percentiles" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_extendedprice, 0.5)::DOUBLE, 4) AS median_price,
         round(quantile_cont(l_extendedprice, 0.9)::DOUBLE, 4) AS p90_price,
         round(min(l_extendedprice), 2) AS min_price,
         round(max(l_extendedprice), 2) AS max_price
         FROM lineitem GROUP BY 1""",
    "q28_word_counts" ->
      """SELECT w AS word, count(*) AS cnt
         FROM (SELECT unnest(string_split_regex(lower(text), ' +')) AS w FROM documents)
         GROUP BY 1 ORDER BY cnt DESC, word ASC LIMIT 20""",
    "q4G_approx_percentile" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_extendedprice, 0.5)::DOUBLE, 4) AS exact_median,
         true AS approx_ok
         FROM lineitem GROUP BY 1""",
    "q4H_edit_distance" ->
      """WITH p AS (SELECT p_partkey, p_name FROM part WHERE p_partkey < 100)
         SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           levenshtein(a.p_name, b.p_name)::INT AS dist
         FROM p a CROSS JOIN p b
         WHERE a.p_partkey < b.p_partkey AND levenshtein(a.p_name, b.p_name) <= 4""",
    "q29_approx_distinct" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS exact_cust,
         true AS approx_ok
         FROM orders GROUP BY 1""",
    // -- time-series ------------------------------------------------ //
    "q38_gapfill" ->
      """WITH c AS (SELECT event_type, date_trunc('hour', ts) AS ts,
           arg_max("value", ts) AS close FROM events GROUP BY 1, 2),
         b AS (SELECT event_type, min(ts) AS mn, max(ts) AS mx FROM c GROUP BY 1),
         g AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS ts FROM b),
         j AS (SELECT g.event_type, g.ts, c.close
               FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.ts = c.ts)
         SELECT event_type, ts,
           round(last_value(close IGNORE NULLS) OVER (PARTITION BY event_type
             ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS close_filled,
           close IS NULL AS is_gap
         FROM j""",
    "q30_candles_1h" ->
      """SELECT event_type, date_trunc('hour', ts) AS ts,
         round(arg_min("value", ts), 4) AS open, round(max("value"), 4) AS high,
         round(min("value"), 4) AS low, round(arg_max("value", ts), 4) AS close,
         round(sum("value"), 4) AS volume, count(*) AS n
         FROM events GROUP BY 1, 2""",
    "q31_resample_1d" ->
      """SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS ts,
         round(arg_min("value", ts), 4) AS open, round(max("value"), 4) AS high,
         round(min("value"), 4) AS low, round(arg_max("value", ts), 4) AS close,
         round(sum("value"), 4) AS volume
         FROM events GROUP BY 1, 2""",
    "q32_gaps" ->
      """WITH w AS (SELECT user_id, event_id, ts,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
         FROM events)
         SELECT user_id, event_id, date_diff('second', prev_ts, ts) AS gap_sec
         FROM w WHERE date_diff('second', prev_ts, ts) > 3600""",
    "q33_vwap" ->
      """SELECT l_returnflag,
         round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS vwap,
         round(sum(l_quantity), 2) AS total_qty
         FROM lineitem GROUP BY 1""",
    "q34_moving_agg" ->
      """SELECT event_type, event_id,
         round(avg("value") OVER (PARTITION BY event_type ORDER BY ts ASC, event_id ASC
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS mavg,
         round(sum("value") OVER (PARTITION BY event_type ORDER BY ts ASC, event_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS csum
         FROM events""",
    // q39: indicators over the hourly-candle frame; two window layers
    // (changes need lag(close) first, then the n-frame average).
    "q39_indicators" ->
      s"""WITH c AS (${hourlyCandles("")}),
         x AS (SELECT code, ts, close,
             lag(close, 1) OVER w AS prev,
             lag(close, 5) OVER w AS lag5,
             avg(close) OVER wn AS sma,
             max(close) OVER wn AS donchian_hi,
             min(close) OVER wn AS donchian_lo
           FROM c
           WINDOW w AS (PARTITION BY code ORDER BY ts ASC),
             wn AS (PARTITION BY code ORDER BY ts ASC
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
         g AS (SELECT *,
             CASE WHEN prev IS NULL THEN NULL ELSE greatest(close - prev, 0.0) END AS gn,
             CASE WHEN prev IS NULL THEN NULL ELSE greatest(prev - close, 0.0) END AS ls
           FROM x),
         r AS (SELECT *,
             avg(gn) OVER wn AS ag, avg(ls) OVER wn AS al
           FROM g
           WINDOW wn AS (PARTITION BY code ORDER BY ts ASC
             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         SELECT code, ts, round(close, 4) AS close, round(sma, 4) AS sma,
           round(donchian_hi, 4) AS donchian_hi, round(donchian_lo, 4) AS donchian_lo,
           CASE WHEN lag5 IS NULL OR lag5 = 0 THEN NULL
                ELSE round((close - lag5) / lag5 * 100.0, 4) END AS roc,
           CASE WHEN al IS NULL THEN NULL WHEN al = 0 THEN 100.0
                ELSE round(100.0 - 100.0 / (1.0 + ag / al), 4) END AS rsi
         FROM r""",
    "q35_sessionize" ->
      """WITH o AS (SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR date_diff('second', lag(ts) OVER w, ts) > 1800
                THEN 1 ELSE 0 END AS new_s
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
         s AS (SELECT user_id, ts,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_id
         FROM o)
         SELECT user_id, session_id, min(ts) AS session_start,
           max(ts) AS session_end, count(*) AS n_events
         FROM s GROUP BY 1, 2""",
    "q36_daily_cum" ->
      """WITH dly AS (SELECT event_type, ts::DATE AS day, count(*) AS day_count
           FROM events GROUP BY 1, 2)
         SELECT event_type, day, day_count,
           coalesce(sum(day_count) OVER (PARTITION BY event_type ORDER BY day ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_before
         FROM dly""",
    "q37_asof_join" ->
      """SELECT p.user_id, p.event_id, p.ts,
         round(p."value", 4) AS value, round(v."value", 4) AS asof_value
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
           ON p.user_id = v.user_id AND p.ts >= v.ts""",
    "q4E_sliding_window" ->
      """SELECT event_type, ws AS ts, count(*) AS n, round(avg("value"), 4) AS avg_value
         FROM (SELECT event_type,
                 unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                         date_trunc('hour', ts)]) AS ws,
                 "value"
               FROM events)
         GROUP BY 1, 2""",
    "q47_asof_tolerance" ->
      """SELECT p.user_id, p.event_id,
         CASE WHEN v.ts IS NOT NULL AND date_diff('second', v.ts, p.ts) <= 600
              THEN round(v."value", 4) END AS asof_value
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
           ON p.user_id = v.user_id AND p.ts >= v.ts""",
    "q48_asof_forward" ->
      """SELECT p.user_id, p.event_id, round(v."value", 4) AS asof_value
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
           ON p.user_id = v.user_id AND p.ts <= v.ts""",
    "q49_range_frame" ->
      """SELECT l_orderkey, l_linenumber,
         round(sum(l_extendedprice) OVER (PARTITION BY l_returnflag
           ORDER BY l_quantity RANGE BETWEEN 5 PRECEDING AND CURRENT ROW), 2) AS near_qty_rev
         FROM lineitem""",
    "q4A_first_last" ->
      """SELECT o_custkey, o_orderkey,
         round(first_value(o_totalprice) OVER w, 2) AS first_price,
         round(last_value(o_totalprice) OVER w, 2) AS last_price,
         round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
    // -- candle store + streaming ----------------------------------- //
    "q40_store_upsert" ->
      s"""$storeEndState
         SELECT code, ts, round(open, 4) AS open, round(high, 4) AS high,
           round(low, 4) AS low, round(close, 4) AS close, round(volume, 4) AS volume
         FROM r WHERE rn = 1""",
    "q41_store_prune" ->
      s"""$storeEndState
         SELECT ts, round(close, 4) AS close, round(volume, 4) AS volume
         FROM r WHERE rn = 1 AND code = 'click' AND year(ts) = 2024""",
    // q9V: the catalog-name read of the same store must equal q41's
    // pruned page lookup.
    "q9V_candle_catalog" ->
      s"""$storeEndState
         SELECT ts, round(close, 4) AS close, round(volume, 4) AS volume
         FROM r WHERE rn = 1 AND code = 'click' AND year(ts) = 2024""",
    "q42_store_range" ->
      s"""$storeEndState
         SELECT ts, round(close, 4) AS close, round(volume, 4) AS volume
         FROM r WHERE rn = 1 AND code = 'view'
           AND ts >= TIMESTAMP '2024-01-10 00:00:00'
           AND ts < TIMESTAMP '2024-01-20 00:00:00'""",
    "q4F_store_catalog" ->
      s"""$storeEndState
         SELECT code, count(*) AS n_rows, min(ts) AS first_ts, max(ts) AS last_ts,
           round(min(low), 4) AS min_low, round(max(high), 4) AS max_high,
           round(sum(volume), 4) AS total_volume
         FROM r WHERE rn = 1 GROUP BY code, year(ts)""",
    // q68: repetition stats — list ops mirror the compiled kernel; the
    // top-2-gram count goes through an unnest+group (linear, not the
    // quadratic list_filter form).
    "q68_repetition_stats" ->
      s"""WITH l AS (SELECT doc_id, string_split(text, chr(10)) AS lines,
                 $WS AS ws, text FROM documents),
         b AS (SELECT doc_id, lines, ws, text,
                 CASE WHEN len(ws) < 2 THEN []::VARCHAR[]
                      ELSE list_transform(generate_series(1, len(ws)-1),
                             i -> ws[i] || ' ' || ws[i+1]) END AS grams
               FROM l),
         gu AS (SELECT doc_id, unnest(grams) AS gram FROM b),
         gc AS (SELECT doc_id, gram, count(*) AS c FROM gu GROUP BY 1, 2),
         gt AS (SELECT doc_id, max(c) AS mx FROM gc GROUP BY 1),
         stats AS (SELECT b.doc_id,
           CAST(len(lines) AS INT) AS n_lines,
           round((len(lines) - len(list_distinct(lines)))::DOUBLE / len(lines), 4) AS dup_line_fraction,
           round(len(list_filter(lines, x -> x LIKE '- %' OR x LIKE '* %' OR x LIKE '• %'))::DOUBLE / len(lines), 4) AS bullet_line_fraction,
           round(len(list_filter(lines, x -> x LIKE '%...' OR x LIKE '%…'))::DOUBLE / len(lines), 4) AS ellipsis_line_fraction,
           round(((len(text) - len(replace(text, '#', ''))) +
                  (len(text) - len(replace(text, '…', ''))))::DOUBLE / len(ws), 4) AS symbol_word_ratio,
           round(CASE WHEN len(ws) < 2 THEN 0.0
                 ELSE coalesce(gt.mx, 0)::DOUBLE / (len(ws) - 1) END, 4) AS top_2gram_fraction
          FROM b LEFT JOIN gt ON b.doc_id = gt.doc_id)
         SELECT doc_id, n_lines, dup_line_fraction, bullet_line_fraction,
           ellipsis_line_fraction, symbol_word_ratio, top_2gram_fraction,
           (dup_line_fraction <= 0.3 AND bullet_line_fraction <= 0.9
            AND ellipsis_line_fraction <= 0.3 AND symbol_word_ratio <= 0.1
            AND top_2gram_fraction <= 0.2) AS keep
         FROM stats""",
    // q66: token-window chunking — same split/slice arithmetic on both
    // engines; list_slice clamps like Spark's slice.
    "q66_doc_chunks" ->
      s"""WITH t AS (SELECT doc_id, $WS AS ws FROM documents),
         c AS (SELECT doc_id, ws,
                 unnest(generate_series(0, CASE WHEN len(ws) <= 120 THEN 0
                   ELSE CAST(ceil((len(ws) - 120) / 100.0) AS BIGINT) END)) AS chunk_id
               FROM t)
         SELECT doc_id, chunk_id,
           array_to_string(list_slice(ws, chunk_id*100 + 1, chunk_id*100 + 120), ' ') AS chunk_text,
           CAST(len(list_slice(ws, chunk_id*100 + 1, chunk_id*100 + 120)) AS INT) AS n_chunk_tokens
         FROM c""",
    // q67: hash-derived split — the same md5 arithmetic as
    // Sampling.unitHash, so assignment parity is exact.
    "q67_hash_split" ->
      s"""WITH h AS (SELECT lang,
           ${pHash("doc_id::VARCHAR || '|split'")} % 10000 AS hv FROM documents)
         SELECT lang,
           CASE WHEN hv < 8000 THEN 'train' WHEN hv < 9000 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs
         FROM h GROUP BY 1, 2""",
    // q6A: the Spark side round-trips a REAL WAV encode+decode; the
    // oracle computes the square wave's exact audio features.
    "q6A_wav_decode" ->
      """SELECT doc_id, 800::BIGINT AS n_samples,
         (1000 * (1 + doc_id % 7)) / 32768.0 AS rms,
         (1000 * (1 + doc_id % 7)) / 32768.0 AS peak,
         (800 / (CASE doc_id % 8 WHEN 0 THEN 2 WHEN 1 THEN 4 WHEN 2 THEN 5
                 WHEN 3 THEN 8 WHEN 4 THEN 10 WHEN 5 THEN 16 WHEN 6 THEN 20
                 ELSE 25 END) - 1)::BIGINT AS zero_crossings
         FROM documents""",
    // q65: the Spark side round-trips a REAL PNG encode+decode; the
    // oracle computes the same features in closed form (solid color,
    // lossless codec → exact integers).
    "q65_image_decode" ->
      """SELECT doc_id,
         (16 + doc_id % 16)::INT AS width,
         (16 + doc_id % 8)::INT AS height,
         (16 + doc_id % 16) * (16 + doc_id % 8) AS n_pixels,
         ((doc_id * 31) % 256)::DOUBLE AS mean_r,
         ((doc_id * 17) % 256)::DOUBLE AS mean_g,
         ((doc_id * 7) % 256)::DOUBLE AS mean_b
         FROM documents""",
    // Bucketed co-located join: bucketing only changes the physical
    // layout, so the oracle is the plain join + aggregation.
    "q64_bucketed_join" ->
      """SELECT c_custkey, c_name, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS sum_price
         FROM customer JOIN orders ON c_custkey = o_custkey
         GROUP BY 1, 2""",
    // The .ysf round trip must reproduce the hourly candles the pages
    // were built from; DuckDB aggregates the raw events directly and
    // never touches the binary format.
    // q9T: the migrated store must equal the TRUE hourly candles — the
    // stale halved 'click' pages exist only to be corrected by the
    // committed WAL tx, and the poisoned uncommitted 'view' tx must
    // vanish; DuckDB aggregates raw events and sees neither artifact.
    "q9T_wal_replay" ->
      """SELECT event_type AS code, date_trunc('hour', ts) AS ts,
         round(arg_min("value", ts), 4) AS open, round(max("value"), 4) AS high,
         round(min("value"), 4) AS low, round(arg_max("value", ts), 4) AS close,
         round(sum("value"), 4) AS volume
         FROM events GROUP BY 1, 2""",
    // q9U: the dropped tail is exactly the poisoned 'view' candles
    // (+1000 on every value field) of the never-committed tx.
    "q9U_wal_tail" ->
      """SELECT event_type AS code, date_trunc('hour', ts) AS ts,
         round(arg_min("value", ts) + 1000, 4) AS open, round(max("value") + 1000, 4) AS high,
         round(min("value") + 1000, 4) AS low, round(arg_max("value", ts) + 1000, 4) AS close,
         round(sum("value") + 1000, 4) AS volume
         FROM events WHERE event_type = 'view' GROUP BY 1, 2""",
    "q62_ysf_roundtrip" ->
      """SELECT event_type AS code, date_trunc('hour', ts) AS ts,
         round(arg_min("value", ts), 4) AS open, round(max("value"), 4) AS high,
         round(min("value"), 4) AS low, round(arg_max("value", ts), 4) AS close,
         round(sum("value"), 4) AS volume
         FROM events GROUP BY 1, 2""",
    "q61_streaming_ingest" ->
      """SELECT event_type AS code, date_trunc('second', ts) AS ts,
         round(arg_min("value", ts), 4) AS open, round(arg_max("value", ts), 4) AS close,
         round(sum("value"), 4) AS volume
         FROM events GROUP BY 1, 2""",
    // q85: as-of tx 2 of the streamed versioned store == candles of the
    // first two time slices. cut2 mirrors the fixture's Long arithmetic:
    // second-aligned 2/3 point of the ns range (integer division).
    "q85_stream_asof" ->
      """SELECT event_type AS code, date_trunc('second', ts) AS ts,
         round(arg_min("value", ts), 4) AS open, round(arg_max("value", ts), 4) AS close,
         round(sum("value"), 4) AS volume
         FROM events
         WHERE epoch_ns(ts) <
           (SELECT (min(epoch_ns(ts)) + 2 * (max(epoch_ns(ts)) - min(epoch_ns(ts))) // 3)
                   // 1000000000 * 1000000000
            FROM events)
         GROUP BY 1, 2""",
    // -- LLM ops ---------------------------------------------------- //
    // q74/q75/q76 run the SAME SQL text on both engines.
    "q74_stats_moments" -> Queries.statsMomentsSql,
    "q75_lateral_topk" -> Queries.lateralTopkSql,
    "q76_recursive_reach" -> Queries.recursiveReachSql,
    // BM25 against probe terms; constants written as the same double
    // arithmetic the Spark side folds (1.2 + 1.0, 1.0 - 0.75).
    "q70_bm25_rank" ->
      s"""WITH tok AS (SELECT doc_id, $WS AS ws FROM documents),
         dl AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl FROM tok),
         st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
         tf AS (SELECT doc_id, w AS term, count(*) AS tf
                FROM (SELECT doc_id, unnest(ws) AS w FROM tok)
                WHERE w IN ('join', 'vector', 'slow') GROUP BY 1, 2),
         dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1)
         SELECT doc_id,
           round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
             * (tf * (1.2 + 1.0)) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))), 4) AS bm25
         FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st
         GROUP BY doc_id""",
    "q7F_top_terms" ->
      s"""WITH tok AS (SELECT doc_id, unnest($WS) AS term FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
                WHERE length(term) > 0 GROUP BY 1, 2),
         dfq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
         sc AS (SELECT doc_id, term, tf * ln((n_docs + 1.0) / (df + 1.0)) AS s
                FROM tf JOIN dfq USING (term) CROSS JOIN n),
         r AS (SELECT doc_id, term, s,
                 row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, term ASC) AS rn
               FROM sc)
         SELECT doc_id, term, rn::INT AS rank, round(s, 4) AS tfidf
         FROM r WHERE rn <= 5""",
    // q80: mixture weights must be written as the same IEEE-double
    // arithmetic the Spark side evaluates (frac(w)*10000).
    "q80_domain_mix" ->
      s"""WITH w AS (SELECT doc_id, source,
           CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.4
                       WHEN 'src2' THEN 0.0 ELSE 1.0 END AS w,
           ${pHash("doc_id::VARCHAR || '|mix'")} % 10000 AS hv
         FROM documents),
         c AS (SELECT doc_id, source,
                 (floor(w)::INT + CASE WHEN hv < (w - floor(w)) * 10000
                                       THEN 1 ELSE 0 END) AS copies
               FROM w)
         SELECT doc_id, source,
           CAST(unnest(generate_series(0, copies - 1)) AS INT) AS epoch
         FROM c WHERE copies > 0""",
    "q81_token_budget" ->
      s"""WITH t AS (SELECT doc_id, source, len($WS)::INT AS n_tokens,
           ${pHash("doc_id::VARCHAR || '|budget'")} % 10000 AS hv
         FROM documents),
         c AS (SELECT doc_id, source, n_tokens,
                 (sum(n_tokens::BIGINT) OVER (PARTITION BY source
                   ORDER BY hv, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_tokens
               FROM t)
         SELECT doc_id, source, n_tokens, cum_tokens
         FROM c
         WHERE cum_tokens <= CASE source WHEN 'src0' THEN 300
                                         WHEN 'src1' THEN 0 ELSE 700 END""",
    // q9P: property oracle — the stream-union estimates must sit
    // within 5% of both the one-shot batch sketch and the exact
    // distinct counts.
    "q9P_stream_hll_distinct" ->
      """SELECT count(DISTINCT source)::BIGINT AS n_sources,
         true AS stream_near_batch, true AS within_band
         FROM documents""",
    // q9O: the stream fixture's corpus (documents + planted copies in
    // the last batch) deduped by the first-wins fold — row_number over
    // (batch, id) per normalized text, rn > 1 dropped.
    "q9O_stream_exact_dedup" ->
      """WITH t AS (
           SELECT doc_id, lower(trim(text)) AS nt, doc_id % 3 AS b
           FROM documents
           UNION ALL
           SELECT doc_id + 1000000, lower(trim(text)), 2
           FROM documents WHERE doc_id % 7 = 0),
         r AS (SELECT doc_id,
                 row_number() OVER (PARTITION BY nt ORDER BY b, doc_id) AS rn
               FROM t)
         SELECT doc_id FROM r WHERE rn > 1""",
    // q9S: hash-order global prefix sum + start-shard division —
    // explicit floor on BOTH sides (DuckDB's ::BIGINT cast ROUNDS
    // where Spark's truncates).
    "q9S_token_shards" ->
      s"""WITH t AS (SELECT doc_id, len($WS)::INT AS n_tokens,
           ${pHash("doc_id::VARCHAR || '|shard'")} % 10000 AS hv
         FROM documents),
         c AS (SELECT doc_id, n_tokens,
                 (sum(n_tokens::BIGINT) OVER (ORDER BY hv, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_tokens
               FROM t)
         SELECT doc_id, n_tokens, cum_tokens,
           floor((cum_tokens - n_tokens) / 2000.0)::BIGINT AS shard
         FROM c""",
    // q9R: the full late-session chain — exact dedup, the q9Q chunk
    // census gate at 0.5 over the DEDUPED corpus, q9L's temperature
    // rates over lang, q81's budget fold — replayed end to end.
    "q9R_curation_v3" ->
      s"""WITH dd AS (SELECT d.* FROM documents d
           JOIN (SELECT min(doc_id) AS doc_id FROM documents
                 GROUP BY lower(trim(text))) k USING (doc_id)),
         tok AS (SELECT doc_id, $WS AS ws FROM dd),
         pos AS (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM tok),
         bb AS (SELECT doc_id, i, ws[i] AS tk,
                 CASE WHEN i >= 4 AND ${pHash(
                   "ws[i-3] || ' ' || ws[i-2] || ' ' || ws[i-1] || ' ' || ws[i]")} % 8 = 0
                   THEN 1 ELSE 0 END AS bnd
               FROM pos),
         cc AS (SELECT doc_id, i, tk,
                 coalesce(sum(bnd) OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ci
               FROM bb),
         ch AS (SELECT doc_id, ci, ${pHash("string_agg(tk, ' ' ORDER BY i)")} AS h
                FROM cc GROUP BY doc_id, ci),
         dup AS (SELECT h FROM ch GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
         rate AS (SELECT doc_id,
                    count(dup.h)::DOUBLE / count(*)::DOUBLE AS dr
                  FROM ch LEFT JOIN dup USING (h) GROUP BY doc_id),
         gated AS (SELECT dd.* FROM dd JOIN rate USING (doc_id)
                   WHERE ${graft.Portable.roundSql("dr", 4)} <= 0.5),
         n AS (SELECT lang, count(*)::DOUBLE AS nk FROM gated GROUP BY 1),
         r AS (SELECT lang, ${graft.Portable.roundSql(
           "pow((SELECT min(nk) FROM n) / nk, 0.5)", 4)} AS kr FROM n),
         samp AS (SELECT g.* FROM gated g JOIN r USING (lang)
                  WHERE ${pHash("g.doc_id::VARCHAR || '|temp'")} % 10000
                    < r.kr * 10000),
         t AS (SELECT doc_id, source, len($WS)::INT AS n_tokens,
                 ${pHash("doc_id::VARCHAR || '|budget'")} % 10000 AS hv
               FROM samp),
         c2 AS (SELECT doc_id, source, n_tokens,
                 (sum(n_tokens::BIGINT) OVER (PARTITION BY source
                   ORDER BY hv, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_tokens
               FROM t)
         SELECT doc_id, source, n_tokens, cum_tokens
         FROM c2
         WHERE cum_tokens <= CASE source WHEN 'src0' THEN 300
                                         WHEN 'src1' THEN 0 ELSE 700 END""",
    // q9Q: the q9N chunking at (window 4, divisor 8) + the >=2-distinct
    // -doc census, folded to per-doc duplication rates.
    "q9Q_chunk_dup_rate" ->
      s"""WITH tok AS (SELECT doc_id, $WS AS ws FROM documents),
         pos AS (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM tok),
         b AS (SELECT doc_id, i, ws[i] AS tk,
                 CASE WHEN i >= 4 AND ${pHash(
                   "ws[i-3] || ' ' || ws[i-2] || ' ' || ws[i-1] || ' ' || ws[i]")} % 8 = 0
                   THEN 1 ELSE 0 END AS bnd
               FROM pos),
         c AS (SELECT doc_id, i, tk,
                 coalesce(sum(bnd) OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ci
               FROM b),
         ch AS (SELECT doc_id, ci,
                  ${pHash("string_agg(tk, ' ' ORDER BY i)")} AS h
                FROM c GROUP BY doc_id, ci),
         dup AS (SELECT h FROM ch GROUP BY h HAVING count(DISTINCT doc_id) >= 2)
         SELECT doc_id, count(*)::BIGINT AS n_chunks,
           count(dup.h)::BIGINT AS n_dup_chunks,
           ${graft.Portable.roundSql(
             "count(dup.h)::DOUBLE / count(*)::DOUBLE", 4)} AS dup_rate
         FROM ch LEFT JOIN dup USING (h)
         GROUP BY doc_id""",
    // q9N: CDC boundaries (8-gram hash % 64 == 0) + chunk hashes
    // replayed token-for-token — chunk_idx = boundaries strictly
    // before the token, chunk hash = md5-60 of the joined tokens.
    "q9N_cdc_chunks" ->
      s"""WITH tok AS (SELECT doc_id, $WS AS ws FROM documents),
         pos AS (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM tok),
         b AS (SELECT doc_id, i, ws[i] AS tk,
                 CASE WHEN i >= 8 AND ${pHash(
                   "ws[i-7] || ' ' || ws[i-6] || ' ' || ws[i-5] || ' ' || ws[i-4]" +
                   " || ' ' || ws[i-3] || ' ' || ws[i-2] || ' ' || ws[i-1] || ' ' || ws[i]")} % 64 = 0
                   THEN 1 ELSE 0 END AS bnd
               FROM pos),
         c AS (SELECT doc_id, i, tk,
                 coalesce(sum(bnd) OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx
               FROM b)
         SELECT doc_id, chunk_idx::INT AS chunk_idx, count(*)::INT AS n_tokens,
           ${pHash("string_agg(tk, ' ' ORDER BY i)")} AS chunk_hash
         FROM c GROUP BY doc_id, chunk_idx""",
    // q9M: property oracle (q63's shape) — the row hash-matches only
    // if the stream-built index equals the batch assignment AND the
    // recall gate computes true.
    // q9Y: streamed embedding dedup — blind census + booleans (the
    // q9M/q84 pattern): one flag per planted identical pair, flags
    // are exactly the twins, cell census complete.
    "q9Y_embed_dedup" ->
      """SELECT (SELECT count(*) FROM embeddings WHERE vec_id % 10 = 0)::BIGINT AS n_planted,
         (SELECT count(*) FROM embeddings WHERE vec_id % 10 = 0)::BIGINT AS n_flagged,
         true AS one_flag_per_pair, true AS flags_are_the_twins,
         true AS census_ok""",
    // q9X: drift-triggered refresh gates — blind census + booleans
    // (the q9M/q84 pattern): trigger fired, stream healed quiet,
    // drifted-query recall over the floor.
    "q9X_drift_refresh" ->
      """SELECT count(*)::BIGINT AS n_queries, true AS trigger_fired,
         true AS healed_quiet, true AS recall_ok
         FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < 10000""",
    "q9M_stream_ivf_index" ->
      """SELECT count(DISTINCT vec_id)::BIGINT AS n_queries,
         true AS index_identical, true AS recall_ok
         FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < 10000""",
    // q9Z: streamed IVFADC (PQ) index gates — blind census + booleans
    // (the q9M pattern): stream codes byte-identical to the batch
    // encoding under the frozen quantizers, state rows are
    // (cell_id, id, m-byte code) only, probe recall over the floor.
    "q9Z_pq_stream_index" ->
      """SELECT count(DISTINCT vec_id)::BIGINT AS n_queries,
         true AS codes_identical, true AS state_slim, true AS recall_ok
         FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < 10000""",
    // qA4: the q9Z stream re-sharded mid-stream at nCells ≈ √N — blind
    // census + booleans: the generation is adopted (all three
    // publications complete, frozen dirs GC'd), its cell count is the
    // √N derivation, the whole state re-encodes byte-identically under
    // the adopted quantizers, derived-probe recall over the floor.
    "qA4_pq_reshard_index" ->
      """SELECT count(DISTINCT vec_id)::BIGINT AS n_queries,
         true AS resharded, true AS ncells_sqrt,
         true AS codes_identical, true AS recall_ok
         FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < 10000""",
    // qA6: the q9M RAW-vector stream re-sharded mid-stream at
    // nCells ≈ √N (the qA4 remedy on the raw family) — blind census +
    // booleans: generation adopted (frozen training dir GC'd), cell
    // count is the √N derivation, whole state re-assigns identically
    // under the adopted quantizer, derived-probe recall over the floor.
    "qA6_ivf_reshard_index" ->
      """SELECT count(DISTINCT vec_id)::BIGINT AS n_queries,
         true AS resharded, true AS ncells_sqrt,
         true AS state_identical, true AS recall_ok
         FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < 10000""",
    // q9L: per-source temperature rates (p_min/p_k)^(1-alpha), round-4,
    // unit-hash draw — the same arithmetic on both engines.
    "q9L_temperature_sample" ->
      s"""WITH n AS (SELECT lang, count(*)::DOUBLE AS nk
           FROM documents GROUP BY 1),
         r AS (SELECT lang, ${graft.Portable.roundSql(
           "pow((SELECT min(nk) FROM n) / nk, 0.5)", 4)} AS keep_rate
               FROM n)
         SELECT d.doc_id, d.lang, r.keep_rate
         FROM documents d JOIN r USING (lang)
         WHERE ${pHash("d.doc_id::VARCHAR || '|temp'")} % 10000
           < r.keep_rate * 10000""",
    // q9K: the farthest-first greedy trajectory replayed as a
    // recursive CTE — each step's argmax (ties to lowest id) over the
    // same index-ordered double distances the Spark rounds compute.
    "q9K_kcenter_sample" ->
      s"""WITH RECURSIVE sel(r, id, d, ids) AS (
           SELECT 1::BIGINT, (SELECT min(vec_id) FROM embeddings),
                  0.0::DOUBLE, [(SELECT min(vec_id) FROM embeddings)]
           UNION ALL
           SELECT sel.r + 1, nxt.vec_id, nxt.md, list_append(sel.ids, nxt.vec_id)
           FROM sel, LATERAL (
             SELECT c.vec_id, (
                 SELECT min(list_sum(list_transform(range(1, len(c.embedding) + 1),
                   i -> (c.embedding[i]::DOUBLE - s.embedding[i]::DOUBLE)
                      * (c.embedding[i]::DOUBLE - s.embedding[i]::DOUBLE))))
                 FROM embeddings s WHERE list_contains(sel.ids, s.vec_id)) AS md
             FROM embeddings c WHERE NOT list_contains(sel.ids, c.vec_id)
             ORDER BY md DESC, c.vec_id ASC LIMIT 1) nxt
           WHERE sel.r < 12)
         SELECT r AS sel_rank, id AS vec_id,
           ${graft.Portable.roundSql("d", 4)} AS min_dist
         FROM sel""",
    // q9J: the KMV bottom-k sketch replayed exactly — per-source
    // bottom-256 of the portable gram hashes, merged-bottom-k pair
    // estimator (gramless sources pair with empty sketches, J = 0).
    "q9J_sketch_jaccard" ->
      s"""WITH tok AS (SELECT source, $WS AS ws FROM documents),
         g AS (SELECT source, unnest(CASE WHEN len(ws) < 3 THEN []::VARCHAR[] ELSE
                 list_transform(generate_series(1, len(ws) - 2),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END) AS g
               FROM tok),
         sets AS (SELECT DISTINCT source, ${pHash("g")} AS h FROM g),
         r AS (SELECT source, h,
                 row_number() OVER (PARTITION BY source ORDER BY h) AS rn
               FROM sets),
         sk AS (SELECT source, list(h ORDER BY h) AS arr
                FROM r WHERE rn <= 256 GROUP BY 1),
         allsk AS (SELECT d.source, coalesce(sk.arr, []::BIGINT[]) AS arr
                   FROM (SELECT DISTINCT source FROM documents) d
                   LEFT JOIN sk USING (source)),
         m AS (SELECT x.source AS src_a, y.source AS src_b,
                 x.arr AS a, y.arr AS b,
                 list_sort(list_distinct(list_concat(x.arr, y.arr)))[1:256] AS mg
               FROM allsk x JOIN allsk y ON x.source < y.source)
         SELECT src_a, src_b, len(mg)::BIGINT AS n_sample,
           len(list_intersect(list_intersect(mg, a), b))::BIGINT AS n_common_sample,
           CASE WHEN len(mg) = 0 THEN 0.0 ELSE ${graft.Portable.roundSql(
             "len(list_intersect(list_intersect(mg, a), b))::DOUBLE / len(mg)::DOUBLE",
             4)} END AS jaccard_est
         FROM m""",
    // q9I: catalog-name SQL VERSION AS OF 2 == q7E's as-of state.
    "q9I_vstore_catalog_sql" ->
      s"""WITH a AS (${hourlyCandles("WHERE event_id % 3 = 1")}),
         b AS (${hourlyCandles("WHERE event_id % 3 = 2")}),
         u AS (SELECT *, 1 AS src FROM b UNION ALL SELECT *, 0 AS src FROM a),
         r AS (SELECT *, row_number() OVER (PARTITION BY code, ts ORDER BY src DESC) AS rn FROM u)
         SELECT code, ts, round(open, 4) AS open, round(close, 4) AS close,
           round(volume, 4) AS volume
         FROM r WHERE rn = 1""",
    "q9H_stream_quota" ->
      s"""WITH t AS (SELECT doc_id, source, len($WS)::INT AS n_tokens,
           doc_id % 3 AS b,
           ${pHash("doc_id::VARCHAR || '|budget'")} % 10000 AS hv
         FROM documents),
         c AS (SELECT doc_id, source, n_tokens,
                 (sum(n_tokens::BIGINT) OVER (PARTITION BY source
                   ORDER BY b, hv, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_tokens
               FROM t)
         SELECT doc_id, source, n_tokens, cum_tokens
         FROM c
         WHERE cum_tokens <= CASE source WHEN 'src0' THEN 300
                                         WHEN 'src1' THEN 0 ELSE 700 END""",
    "q71_dup_spans" ->
      s"""WITH tok AS (SELECT doc_id, $WS AS ws FROM documents),
         sp AS (SELECT doc_id,
           unnest(CASE WHEN len(ws) < 8 THEN []::VARCHAR[] ELSE
             list_transform(generate_series(1, len(ws) - 7), i ->
               ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' ||
               ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7]) END) AS s
         FROM tok)
         SELECT ${pHash("s")} AS span_hash,
           count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
         FROM sp GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2""",
    "q72_decontaminate" ->
      s"""WITH tok AS (SELECT doc_id, $WS AS ws FROM documents),
         g AS (SELECT doc_id, unnest(CASE WHEN len(ws) < 5 THEN []::VARCHAR[] ELSE
                 list_transform(generate_series(1, len(ws) - 4),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]) END) AS g
               FROM tok),
         gh AS (SELECT DISTINCT doc_id, ${pHash("g")} AS gram_hash FROM g),
         bench AS (SELECT DISTINCT gram_hash FROM gh WHERE doc_id % 50 = 0)
         SELECT a.doc_id, count(*) AS n_contaminated
         FROM (SELECT doc_id, gram_hash FROM gh WHERE doc_id % 50 <> 0) a
         JOIN bench b USING (gram_hash)
         GROUP BY 1""",
    // q9B: the streamed decontaminating ingest's quarantine == the
    // SEQUENTIAL exact fold over the same micro-batch split: batch 0
    // all survives; batch i's docs are flagged (with their DISTINCT
    // shared-gram count) against the grams of every EARLIER batch's
    // survivors. Same 5-gram machinery as q72.
    "q9B_stream_decontaminate" ->
      s"""WITH tok AS (SELECT doc_id, $WS AS ws FROM documents),
         g AS (SELECT doc_id, unnest(CASE WHEN len(ws) < 5 THEN []::VARCHAR[] ELSE
                 list_transform(generate_series(1, len(ws) - 4),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]) END) AS g
               FROM tok),
         gh AS (SELECT DISTINCT doc_id, ${pHash("g")} AS gram_hash FROM g),
         h0 AS (SELECT DISTINCT gram_hash FROM gh WHERE doc_id % 3 = 0),
         f1 AS (SELECT a.doc_id, count(*) AS n_contaminated
                FROM (SELECT doc_id, gram_hash FROM gh WHERE doc_id % 3 = 1) a
                JOIN h0 USING (gram_hash) GROUP BY 1),
         h1 AS (SELECT gram_hash FROM h0
                UNION
                SELECT gram_hash FROM gh WHERE doc_id % 3 = 1
                  AND doc_id NOT IN (SELECT doc_id FROM f1)),
         f2 AS (SELECT a.doc_id, count(*) AS n_contaminated
                FROM (SELECT doc_id, gram_hash FROM gh WHERE doc_id % 3 = 2) a
                JOIN h1 USING (gram_hash) GROUP BY 1)
         SELECT doc_id, n_contaminated FROM f1
         UNION ALL
         SELECT doc_id, n_contaminated FROM f2""",
    // q9C: the streamed first-wins near-dup flags == the BATCH MinHash
    // +LSH pipeline's drop-later set over the whole corpus (arrival
    // order is id order by construction): id_b of every verified
    // (id_a < id_b) pair at threshold 0.3, aggregated to
    // (n_pairs, max_jaccard). Same CTE chain as q52.
    // q9W: reconcile report — stream_keep is q9C's "no verified pair
    // with a smaller id exists" semantics; batch_keep is q8D's
    // keep-best (n_chars desc, id asc) over the recursive-CC clusters.
    "q9W_neardup_reconcile" ->
      s"""WITH RECURSIVE ${minhashPairsCtes()},
         ${ccCtes()},
         jq AS (SELECT c.id, c.component, d.n_chars
                FROM comp c JOIN documents d ON d.doc_id = c.id),
         rk AS (SELECT id, row_number() OVER (PARTITION BY component
                  ORDER BY n_chars DESC, id ASC) AS rn FROM jq),
         sf AS (SELECT DISTINCT id_b AS id FROM jj WHERE i / (nn - i) >= 0.3)
         SELECT d.doc_id, d.lang, d.n_chars,
           (sf.id IS NULL) AS stream_keep,
           (rk.id IS NULL OR rk.rn = 1) AS batch_keep
         FROM documents d
         LEFT JOIN sf ON d.doc_id = sf.id
         LEFT JOIN rk ON d.doc_id = rk.id""",
    "q9C_stream_neardup" ->
      s"""WITH ${minhashPairsCtes()}
         SELECT id_b AS doc_id, count(*) AS n_pairs,
           round(max(i / (nn - i)), 4) AS max_jaccard
         FROM jj WHERE i / (nn - i) >= 0.3
         GROUP BY 1""",
    // q9G: Zipf slope per source — identical ranking (count desc, word
    // asc) and the same covar_pop/var_pop least-squares in both
    // engines (DuckDB regr_slope is population-moment based).
    "q9G_zipf_fit" ->
      s"""WITH wc AS (SELECT source, w, count(*) AS cnt
           FROM (SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS w
                 FROM documents)
           GROUP BY 1, 2),
         rk AS (SELECT source, cnt,
                  row_number() OVER (PARTITION BY source
                    ORDER BY cnt DESC, w ASC) AS r
                FROM wc)
         SELECT source, count(*) AS n_ranks,
           round(regr_slope(ln(cnt::DOUBLE), ln(r::DOUBLE)), 4) AS slope
         FROM rk WHERE r <= 200 GROUP BY 1""",
    // q9F: the cross-corpus near-dup join == the union banding's pair
    // set restricted to opposite-parity pairs (band keys are
    // deterministic per doc, so cross-side band matches are exactly
    // the union's mixed pairs), with the even id as history.
    "q9F_cross_corpus_neardup" ->
      s"""WITH ${minhashPairsCtes()}
         SELECT CASE WHEN id_a % 2 = 0 THEN id_a ELSE id_b END AS hist_id,
           CASE WHEN id_a % 2 = 0 THEN id_b ELSE id_a END AS new_id,
           round(i / (nn - i), 4) AS jaccard
         FROM jj
         WHERE i / (nn - i) >= 0.3 AND (id_a % 2) <> (id_b % 2)""",
    // q9E: the streamed drift monitor's per-batch JSD == the
    // sequential fold over the same doc_id % 3 micro-batch split:
    // batch k's hashed-unigram histogram vs the summed histograms of
    // batches < k, with the q8I zero-side handling (a bucket absent on
    // one side contributes mass·ln 2 via the surviving CASE arm).
    // Batch 0 has no history: js_div = 0.0, alarm = false.
    "q9E_stream_drift" ->
      s"""WITH tok AS (SELECT doc_id % 3 AS b,
           unnest(string_split_regex(lower(text), '\\s+')) AS w FROM documents),
         h AS (SELECT b, ${pHash("w")} % 256 AS bucket, count(*)::BIGINT AS cnt
               FROM tok GROUP BY 1, 2),
         nd AS (SELECT doc_id % 3 AS b, count(*)::BIGINT AS n_docs
                FROM documents GROUP BY 1),
         ng AS (SELECT b, sum(cnt)::BIGINT AS n_grams FROM h GROUP BY 1),
         ks AS (SELECT unnest([1, 2]) AS k),
         cur AS (SELECT ks.k, h.bucket, h.cnt FROM ks JOIN h ON h.b = ks.k),
         hist AS (SELECT ks.k, h.bucket, sum(h.cnt) AS hcnt
                  FROM ks JOIN h ON h.b < ks.k GROUP BY 1, 2),
         u AS (SELECT coalesce(c.k, hh.k) AS k, coalesce(c.cnt, 0)::DOUBLE AS cnt,
                 coalesce(hh.hcnt, 0)::DOUBLE AS hcnt
               FROM cur c FULL JOIN hist hh
                 ON c.k = hh.k AND c.bucket = hh.bucket),
         tots AS (SELECT k, sum(cnt) AS tb, sum(hcnt) AS th FROM u GROUP BY 1),
         js AS (SELECT u.k AS b, 0.5 * sum(
                  CASE WHEN cnt > 0 THEN (cnt/tb) * ln(2*(cnt/tb)/((cnt/tb)+(hcnt/th))) ELSE 0 END +
                  CASE WHEN hcnt > 0 THEN (hcnt/th) * ln(2*(hcnt/th)/((cnt/tb)+(hcnt/th))) ELSE 0 END) AS js_raw
                FROM u JOIN tots USING (k) GROUP BY 1)
         SELECT b::BIGINT AS batch_id, nd.n_docs, ng.n_grams,
           CASE WHEN b = 0 THEN 0.0
                ELSE ${graft.Portable.roundSql("js.js_raw", 4)} END AS js_div,
           CASE WHEN b = 0 THEN false ELSE js.js_raw >= 0.1 END AS alarm
         FROM nd JOIN ng USING (b) LEFT JOIN js USING (b)""",
    // q9D: greedy packing is a sequential fold per bucket — replayed
    // exactly as a recursive CTE stepping bucket-local row_number,
    // carrying (bin_id, used) and rolling the bin on overflow with the
    // same used>0 guard as Sampling.packGreedy.
    "q9D_pack_bins" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id, len($WS)::INT AS n_tokens,
           (doc_id % 8)::INT AS bucket FROM documents),
         o AS (SELECT doc_id, n_tokens, bucket, least(n_tokens, 120) AS need,
                 row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
               FROM t),
         p AS (SELECT bucket, rn, doc_id, n_tokens, 0 AS bin_id, need AS used
               FROM o WHERE rn = 1
               UNION ALL
               SELECT o.bucket, o.rn, o.doc_id, o.n_tokens,
                 CASE WHEN p.used > 0 AND p.used + o.need > 120
                      THEN p.bin_id + 1 ELSE p.bin_id END AS bin_id,
                 CASE WHEN p.used > 0 AND p.used + o.need > 120
                      THEN o.need ELSE p.used + o.need END AS used
               FROM p JOIN o ON o.bucket = p.bucket AND o.rn = p.rn + 1)
         SELECT doc_id, n_tokens, bucket, bin_id::INT AS bin_id FROM p""",
    "q73_source_cap" ->
      s"""WITH r AS (SELECT doc_id, source,
           row_number() OVER (PARTITION BY source
             ORDER BY ${pHash("doc_id::VARCHAR || '|cap'")} % 10000, doc_id) AS rn
         FROM documents)
         SELECT doc_id, source FROM r WHERE rn <= 20""",
    // qA1: SQL MERGE (SET * / INSERT *) of batch B over committed batch
    // A == the q40 two-batch last-wins end state, read off the
    // versioned store's latest fold.
    "qA1_vstore_merge_sql" ->
      s"""$storeEndState
         SELECT code, ts, round(open, 4) AS open, round(close, 4) AS close,
           round(volume, 4) AS volume
         FROM r WHERE rn = 1""",
    // qA3: MERGE WHEN MATCHED THEN DELETE — batch A minus the keys the
    // restricted batch-B delete source matched (anti-join on the fold
    // key; market/candle_length are constant across the fixture).
    "qA3_vstore_merge_delete" ->
      s"""WITH a AS (${hourlyCandles("WHERE event_id % 3 <> 0")}),
         b AS (SELECT * FROM (${hourlyCandles("WHERE event_id % 3 = 0")})
               WHERE hour(ts) % 3 = 1)
         SELECT code, ts, round(open, 4) AS open, round(close, 4) AS close,
           round(volume, 4) AS volume
         FROM a WHERE NOT EXISTS (
           SELECT 1 FROM b WHERE b.code = a.code AND b.ts = a.ts)""",
    // qA5: conditioned MERGE DELETE + INSERT in one tx — end state =
    // (A minus matched keys satisfying hour(ts)%2=0) ∪ (B's unmatched
    // rows; matched-but-unsatisfied keys untouched, inserts gated only
    // by NOT MATCHED).
    "qA5_vstore_merge_delete_cond" ->
      s"""WITH a AS (${hourlyCandles("WHERE event_id % 3 <> 0")}),
         b AS (${hourlyCandles("WHERE event_id % 3 = 0")}),
         d AS (SELECT * FROM b WHERE hour(ts) % 2 = 0)
         SELECT code, ts, round(open, 4) AS open, round(close, 4) AS close,
           round(volume, 4) AS volume
         FROM a WHERE NOT EXISTS (
           SELECT 1 FROM d WHERE d.code = a.code AND d.ts = a.ts)
         UNION ALL
         SELECT code, ts, round(open, 4) AS open, round(close, 4) AS close,
           round(volume, 4) AS volume
         FROM b WHERE NOT EXISTS (
           SELECT 1 FROM a WHERE a.code = b.code AND a.ts = b.ts)""",
    // qA7: sync-to-source MERGE — matched keys take B's row, unmatched
    // B rows insert, A's source-absent keys survive only when they
    // fail the retention condition hour(ts)%2=1.
    "qA7_vstore_merge_sync" ->
      s"""WITH a AS (${hourlyCandles("WHERE event_id % 3 <> 0")}),
         b AS (${hourlyCandles("WHERE event_id % 3 = 0")})
         SELECT code, ts, round(open, 4) AS open, round(close, 4) AS close,
           round(volume, 4) AS volume
         FROM b
         UNION ALL
         SELECT code, ts, round(open, 4) AS open, round(close, 4) AS close,
           round(volume, 4) AS volume
         FROM a WHERE NOT EXISTS (
           SELECT 1 FROM b WHERE b.code = a.code AND b.ts = a.ts)
           AND hour(ts) % 2 = 0""",
    // qAE: by-source-UPDATE sync merge — B wins matched keys, B's new
    // keys insert, A's source-absent rows survive with odd hours'
    // volume bumped by the partial SET.
    "qAE_vstore_merge_sync_upd" ->
      s"""WITH a AS (${hourlyCandles("WHERE event_id % 3 <> 0")}),
         b AS (${hourlyCandles("WHERE event_id % 3 = 0")})
         SELECT code, ts, round(open, 4) AS open, round(close, 4) AS close,
           round(volume, 4) AS volume
         FROM b
         UNION ALL
         SELECT code, ts, round(open, 4) AS open, round(close, 4) AS close,
           round(volume + CASE WHEN hour(ts) % 2 = 1 THEN 100 ELSE 0 END,
             4) AS volume
         FROM a WHERE NOT EXISTS (
           SELECT 1 FROM b WHERE b.code = a.code AND b.ts = a.ts)""",
    // qAF: the candle twin of qAE — same three-arm sync merge, same
    // mirror (the plain store's upsert replaces matched keys exactly
    // like the vstore's fold).
    "qAF_candle_merge_sync_upd" ->
      s"""WITH a AS (${hourlyCandles("WHERE event_id % 3 <> 0")}),
         b AS (${hourlyCandles("WHERE event_id % 3 = 0")})
         SELECT code, ts, round(open, 4) AS open, round(close, 4) AS close,
           round(volume, 4) AS volume
         FROM b
         UNION ALL
         SELECT code, ts, round(open, 4) AS open, round(close, 4) AS close,
           round(volume + CASE WHEN hour(ts) % 2 = 1 THEN 100 ELSE 0 END,
             4) AS volume
         FROM a WHERE NOT EXISTS (
           SELECT 1 FROM b WHERE b.code = a.code AND b.ts = a.ts)""",
    // qA9: SQL DELETE FROM + UPDATE — A minus the hour%3=1 rows, the
    // hour%3=2 rows' close scaled and volume bumped, hour%3=0 untouched.
    "qA9_vstore_sql_dml" ->
      s"""WITH a AS (${hourlyCandles("WHERE event_id % 3 <> 0")})
         SELECT code, ts, round(open, 4) AS open,
           round(CASE WHEN hour(ts) % 3 = 2 THEN close * 1.1 ELSE close END,
             4) AS close,
           round(volume + CASE WHEN hour(ts) % 3 = 2 THEN 1 ELSE 0 END,
             4) AS volume
         FROM a WHERE hour(ts) % 3 <> 1""",
    // qAA: key-moving UPDATE — the hour%4=3 rows' ts shifted +30min
    // (new keys), everything else untouched.
    "qAA_vstore_update_move" ->
      s"""WITH a AS (${hourlyCandles("WHERE event_id % 3 <> 0")})
         SELECT code,
           CASE WHEN hour(ts) % 4 = 3 THEN ts + INTERVAL 30 MINUTE
                ELSE ts END AS ts,
           round(open, 4) AS open, round(close, 4) AS close,
           round(volume, 4) AS volume
         FROM a""",
    // qAB: SQL-only maintenance — compact/checkpoint/vacuum must leave
    // the two-batch last-wins end state untouched, with the squash
    // floor at tx 2 (two commits, then the squash).
    "qAB_sql_maintenance" ->
      s"""$storeEndState
         SELECT code, ts, round(open, 4) AS open, round(close, 4) AS close,
           round(volume, 4) AS volume, CAST(2 AS BIGINT) AS squash_floor_tx
         FROM r WHERE rn = 1""",
    // qA8: the incrementally-refreshed view == a full GROUP BY over the
    // end state (A then B last-wins, minus the hour%3=1 tombstoned
    // keys) — per (code, day): count, rounded sum(volume), max(close).
    "qA8_incremental_view" ->
      s"""WITH a AS (${hourlyCandles("WHERE event_id % 3 <> 0")}),
         b AS (${hourlyCandles("WHERE event_id % 3 = 0")}),
         u AS (SELECT *, 0 AS src FROM a UNION ALL SELECT *, 1 AS src FROM b),
         r AS (SELECT *, row_number() OVER (PARTITION BY code, ts
           ORDER BY src DESC) AS rn FROM u),
         live AS (SELECT * FROM r WHERE rn = 1 AND hour(ts) % 3 <> 1)
         SELECT code, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
           round(sum(volume), 4) AS vol, round(max(close), 4) AS max_close
         FROM live GROUP BY 1, 2""",
    // qAD: subquery DML — a minus b's even-hour keys (correlated-EXISTS
    // DELETE), then volume+1 on codes whose b-count is even (IN-HAVING
    // UPDATE); integer predicates only, so the mirror is ulp-safe.
    "qAD_vstore_subquery_dml" ->
      s"""WITH a AS (${hourlyCandles("WHERE event_id % 3 <> 0")}),
         b AS (${hourlyCandles("WHERE event_id % 3 = 0")}),
         surv AS (SELECT * FROM a WHERE NOT EXISTS (
           SELECT 1 FROM b WHERE b.code = a.code AND b.ts = a.ts
             AND hour(b.ts) % 2 = 0)),
         uc AS (SELECT code FROM b GROUP BY code HAVING count(*) % 2 = 0)
         SELECT code, ts, round(open, 4) AS open, round(close, 4) AS close,
           round(volume + CASE WHEN code IN (SELECT code FROM uc)
             THEN 1 ELSE 0 END, 4) AS volume
         FROM surv""",
    // qAI: the view's own change feed between its two generations —
    // state1 = the tier view over batch A alone; state2 = over the end
    // state (A∪B last-wins minus the hour%3=1 tombstoned keys);
    // upserts = state2 rows absent from state1, deletes = state1 rows
    // whose (code, day, tier) group vanished.
    "qAI_view_changes" ->
      s"""WITH a AS (${hourlyCandles("WHERE event_id % 3 <> 0")}),
         b AS (${hourlyCandles("WHERE event_id % 3 = 0")}),
         u AS (SELECT *, 0 AS src FROM a UNION ALL SELECT *, 1 AS src FROM b),
         r AS (SELECT *, row_number() OVER (PARTITION BY code, ts
           ORDER BY src DESC) AS rn FROM u),
         live AS (SELECT * FROM r WHERE rn = 1 AND hour(ts) % 3 <> 1),
         s1 AS (SELECT code, strftime(ts, '%Y-%m-%d') AS day,
           CAST(open >= 50.123 AS INT) AS tier, count(*) AS n,
           round(sum(volume), 4) AS vol, round(max(close), 4) AS max_close
           FROM a GROUP BY 1, 2, 3),
         s2 AS (SELECT code, strftime(ts, '%Y-%m-%d') AS day,
           CAST(open >= 50.123 AS INT) AS tier, count(*) AS n,
           round(sum(volume), 4) AS vol, round(max(close), 4) AS max_close
           FROM live GROUP BY 1, 2, 3),
         ups AS (SELECT * FROM s2 EXCEPT SELECT * FROM s1),
         del AS (SELECT * FROM s1 WHERE NOT EXISTS (
           SELECT 1 FROM s2 WHERE s2.code = s1.code AND s2.day = s1.day
             AND s2.tier = s1.tier))
         SELECT 'upsert' AS kind, * FROM ups
         UNION ALL
         SELECT 'delete' AS kind, * FROM del""",
    // qAK: the view feed through the STREAMING source — identical rows
    // to qAI by construction (same boundary, same diff semantics, the
    // transport is the only difference), so the same two-state mirror.
    "qAK_view_stream" ->
      s"""WITH a AS (${hourlyCandles("WHERE event_id % 3 <> 0")}),
         b AS (${hourlyCandles("WHERE event_id % 3 = 0")}),
         u AS (SELECT *, 0 AS src FROM a UNION ALL SELECT *, 1 AS src FROM b),
         r AS (SELECT *, row_number() OVER (PARTITION BY code, ts
           ORDER BY src DESC) AS rn FROM u),
         live AS (SELECT * FROM r WHERE rn = 1 AND hour(ts) % 3 <> 1),
         s1 AS (SELECT code, strftime(ts, '%Y-%m-%d') AS day,
           CAST(open >= 50.123 AS INT) AS tier, count(*) AS n,
           round(sum(volume), 4) AS vol, round(max(close), 4) AS max_close
           FROM a GROUP BY 1, 2, 3),
         s2 AS (SELECT code, strftime(ts, '%Y-%m-%d') AS day,
           CAST(open >= 50.123 AS INT) AS tier, count(*) AS n,
           round(sum(volume), 4) AS vol, round(max(close), 4) AS max_close
           FROM live GROUP BY 1, 2, 3),
         ups AS (SELECT * FROM s2 EXCEPT SELECT * FROM s1),
         del AS (SELECT * FROM s1 WHERE NOT EXISTS (
           SELECT 1 FROM s2 WHERE s2.code = s1.code AND s2.day = s1.day
             AND s2.tier = s1.tier))
         SELECT 'upsert' AS kind, * FROM ups
         UNION ALL
         SELECT 'delete' AS kind, * FROM del""",
    // qAJ: the SQL-only cross-store tx — slice %3=1 lives in the candle
    // catalog table, slice %3=2 in the vstore catalog table, both from
    // ONE CALL; the qA0 per-side aggregate mirror.
    "qAJ_sql_cross_store" ->
      s"""WITH c AS (${hourlyCandles("WHERE event_id % 3 = 1")}),
         v AS (${hourlyCandles("WHERE event_id % 3 = 2")})
         SELECT 'candle' AS side, code, count(*) AS n_rows,
           round(sum(close), 2) AS sum_close FROM c GROUP BY 2
         UNION ALL
         SELECT 'vstore' AS side, code, count(*) AS n_rows,
           round(sum(close), 2) AS sum_close FROM v GROUP BY 2""",
    // qAG: the SQL-only view (create_view → SQL DELETE → refresh_view)
    // == a full GROUP BY (code, day, open-threshold tier) over the end
    // state — the qAC mirror — with the watermark at the delete's tx 3.
    "qAG_sql_view" ->
      s"""WITH a AS (${hourlyCandles("WHERE event_id % 3 <> 0")}),
         b AS (${hourlyCandles("WHERE event_id % 3 = 0")}),
         u AS (SELECT *, 0 AS src FROM a UNION ALL SELECT *, 1 AS src FROM b),
         r AS (SELECT *, row_number() OVER (PARTITION BY code, ts
           ORDER BY src DESC) AS rn FROM u),
         live AS (SELECT * FROM r WHERE rn = 1 AND hour(ts) % 3 <> 1)
         SELECT code, strftime(ts, '%Y-%m-%d') AS day,
           CAST(open >= 50.123 AS INT) AS tier, count(*) AS n,
           round(sum(volume), 4) AS vol, round(max(close), 4) AS max_close,
           CAST(3 AS BIGINT) AS watermark_tx
         FROM live GROUP BY 1, 2, 3""",
    // qAL: the DDL create modes — after CREATE, OR REPLACE (new
    // definition, refreshed to head tx 2), and a no-op IF NOT EXISTS,
    // the view == the REPLACED definition recomputed over the upserted
    // end state of both batches (B wins on shared keys).
    "qAL_view_ddl_modes" ->
      s"""WITH a AS (${hourlyCandles("WHERE event_id % 3 <> 0")}),
         b AS (${hourlyCandles("WHERE event_id % 3 = 0")}),
         u AS (SELECT *, 0 AS src FROM a UNION ALL SELECT *, 1 AS src FROM b),
         r AS (SELECT *, row_number() OVER (PARTITION BY code, ts
           ORDER BY src DESC) AS rn FROM u),
         live AS (SELECT * FROM r WHERE rn = 1)
         SELECT code, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
           round(sum(volume), 4) AS vol, round(max(close), 4) AS max_close,
           CAST(2 AS BIGINT) AS watermark_tx
         FROM live GROUP BY 1, 2""",
    // qAH: the pre-image feed through the reader, since tx 1 — change
    // rows are tx2's upserts (batch B) plus tx3's tombstones (zeroed
    // content, deleted=1, one per distinct hour%3=1 key), and every
    // touched key that existed at tx 1 contributes ONE window-start
    // pre-image carrying batch A's content (keys born inside the
    // window have none).
    "qAH_preimage_feed" ->
      s"""WITH a AS (${hourlyCandles("WHERE event_id % 3 <> 0")}),
         b AS (${hourlyCandles("WHERE event_id % 3 = 0")}),
         allc AS (${hourlyCandles("")}),
         delk AS (SELECT DISTINCT code, ts FROM allc WHERE hour(ts) % 3 = 1),
         changes AS (
           SELECT code, ts, open, close, volume,
             CAST(2 AS BIGINT) AS tx_id, 0 AS deleted, 'change' AS kind
           FROM b
           UNION ALL
           SELECT code, ts, 0.0, 0.0, 0.0,
             CAST(3 AS BIGINT), 1, 'change'
           FROM delk),
         touched AS (SELECT DISTINCT code, ts FROM changes),
         pre AS (
           SELECT a.code, a.ts, a.open, a.close, a.volume,
             CAST(1 AS BIGINT) AS tx_id, 0 AS deleted, 'preimage' AS kind
           FROM a JOIN touched USING (code, ts)),
         feed AS (SELECT * FROM changes UNION ALL SELECT * FROM pre)
         SELECT code, ts, round(open, 4) AS open, round(close, 4) AS close,
           round(volume, 4) AS volume, tx_id, deleted, kind
         FROM feed""",
    // qAC: the content-grouped view == a full GROUP BY (code, day,
    // open-threshold tier) over the end state (A then B last-wins,
    // minus the hour%3=1 tombstoned keys).
    "qAC_content_view" ->
      s"""WITH a AS (${hourlyCandles("WHERE event_id % 3 <> 0")}),
         b AS (${hourlyCandles("WHERE event_id % 3 = 0")}),
         u AS (SELECT *, 0 AS src FROM a UNION ALL SELECT *, 1 AS src FROM b),
         r AS (SELECT *, row_number() OVER (PARTITION BY code, ts
           ORDER BY src DESC) AS rn FROM u),
         live AS (SELECT * FROM r WHERE rn = 1 AND hour(ts) % 3 <> 1)
         SELECT code, strftime(ts, '%Y-%m-%d') AS day,
           CAST(open >= 50.123 AS INT) AS tier, count(*) AS n,
           round(sum(volume), 4) AS vol, round(max(close), 4) AS max_close
         FROM live GROUP BY 1, 2, 3""",
    // qA2: the candle-catalog MERGE end state == q40's two-batch
    // last-wins upsert (batch B lands via two SQL half-merges instead
    // of the Scala upsert; same final table by construction).
    "qA2_candle_merge_sql" ->
      s"""$storeEndState
         SELECT code, ts, round(open, 4) AS open, round(high, 4) AS high,
           round(low, 4) AS low, round(close, 4) AS close,
           round(volume, 4) AS volume
         FROM r WHERE rn = 1""",
    // qA0: the cross-store tx that crashed after its marker is rolled
    // forward onto BOTH stores (candle side = slice %3=1, vstore side =
    // slice %3=2); the tx that crashed before its marker (slice %3=0)
    // is visible on NEITHER — exact-or-nothing per tx.
    "qA0_cross_store_tx" ->
      s"""WITH c AS (${hourlyCandles("WHERE event_id % 3 = 1")}),
         v AS (${hourlyCandles("WHERE event_id % 3 = 2")})
         SELECT 'candle' AS side, code, count(*) AS n_rows,
           round(sum(close), 2) AS sum_close FROM c GROUP BY 2
         UNION ALL
         SELECT 'vstore' AS side, code, count(*) AS n_rows,
           round(sum(close), 2) AS sum_close FROM v GROUP BY 2""",
    // q7E: as-of-tx-2 state = last-wins of the first two committed
    // slices (tx2 = event_id%3==2 beats tx1 = event_id%3==1); the third
    // commit is invisible.
    "q7E_store_asof" ->
      s"""WITH a AS (${hourlyCandles("WHERE event_id % 3 = 1")}),
         b AS (${hourlyCandles("WHERE event_id % 3 = 2")}),
         u AS (SELECT *, 1 AS src FROM b UNION ALL SELECT *, 0 AS src FROM a),
         r AS (SELECT *, row_number() OVER (PARTITION BY code, ts ORDER BY src DESC) AS rn FROM u)
         SELECT code, ts, round(open, 4) AS open, round(close, 4) AS close,
           round(volume, 4) AS volume
         FROM r WHERE rn = 1""",
    // q88: the DataSource/SQL reader over the same wall-clock as-of
    // state as q82 — identical oracle by construction.
    "q88_vstore_reader_sql" ->
      s"""WITH a AS (${hourlyCandles("WHERE event_id % 3 = 1")}),
         b AS (${hourlyCandles("WHERE event_id % 3 = 2")}),
         u AS (SELECT *, 1 AS src FROM b UNION ALL SELECT *, 0 AS src FROM a),
         r AS (SELECT *, row_number() OVER (PARTITION BY code, ts ORDER BY src DESC) AS rn FROM u)
         SELECT code, ts, round(open, 4) AS open, round(close, 4) AS close,
           round(volume, 4) AS volume
         FROM r WHERE rn = 1""",
    // q8B: remove corpus-duplicated 8-word spans — covered positions
    // derive from the same windows as q71; clean_text rebuilds from
    // surviving tokens (both engines join the identical token lists
    // with single spaces).
    "q8B_remove_dup_spans" ->
      s"""WITH tok AS (SELECT doc_id, $WS AS ws FROM documents),
         st AS (SELECT doc_id, ws,
                  unnest(CASE WHEN len(ws) < 8 THEN []::BIGINT[] ELSE
                    generate_series(1, len(ws) - 7) END) AS s
                FROM tok),
         sp AS (SELECT doc_id, s,
                  ${pHash("array_to_string(ws[s:s+7], ' ')")} AS h
                FROM st),
         dup AS (SELECT h FROM sp GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
         cv AS (SELECT doc_id, s + unnest(generate_series(0, 7)) AS p
                FROM sp JOIN dup USING (h)),
         cov AS (SELECT doc_id, list(DISTINCT p) AS cov FROM cv GROUP BY doc_id)
         SELECT t.doc_id,
           coalesce(array_to_string(list_transform(
             list_filter(generate_series(1, len(t.ws)),
               p -> c.cov IS NULL OR NOT list_contains(c.cov, p)),
             p -> t.ws[p]), ' '), '') AS clean_text,
           coalesce(len(c.cov), 0)::INT AS n_removed
         FROM tok t LEFT JOIN cov c USING (doc_id)""",
    // q8D: q69's clusters (same recursive-CTE reach) resolved to the
    // survivor corpus — per component keep the longest text, ties to
    // the lowest id (row_number ORDER BY n_chars DESC, id ASC mirrors
    // Spark's max_by over the (quality, -id) struct).
    "q8D_dedup_keep_best" ->
      s"""WITH RECURSIVE ${minhashPairsCtes()},
         ${ccCtes()},
         jq AS (SELECT c.id, c.component, d.n_chars
                FROM comp c JOIN documents d ON d.doc_id = c.id),
         rk AS (SELECT id, row_number() OVER (PARTITION BY component
                  ORDER BY n_chars DESC, id ASC) AS rn FROM jq),
         dr AS (SELECT id FROM rk WHERE rn > 1)
         SELECT d.doc_id, d.lang, d.source, d.n_chars
         FROM documents d LEFT JOIN dr ON d.doc_id = dr.id
         WHERE dr.id IS NULL""",
    // q8F: trained classifier — not SQL-expressible; blind census +
    // booleans carrying the learning property (the q84 pattern):
    // every document scores, probabilities are probabilities, and the
    // held-out halves separate by > 0.5 mean probability.
    "q8F_quality_classifier" ->
      """SELECT count(*)::BIGINT AS n_scored, true AS probs_in_range,
         true AS separates
         FROM documents""",
    // q8E: n-gram novelty — identical 5-token windows and 60-bit
    // hashes as q71/q8B; singleton grams attribute to min(doc_id),
    // mirroring Spark's in-census owner.
    "q8E_ngram_novelty" ->
      s"""WITH tok AS (SELECT doc_id, $WS AS ws FROM documents),
         st AS (SELECT doc_id, ws,
                  unnest(CASE WHEN len(ws) < 5 THEN []::BIGINT[] ELSE
                    generate_series(1, len(ws) - 4) END) AS s
                FROM tok),
         g AS (SELECT DISTINCT doc_id,
                 ${pHash("array_to_string(ws[s:s+4], ' ')")} AS h
               FROM st),
         bg AS (SELECT h, count(*) AS df, min(doc_id) AS owner
                FROM g GROUP BY h),
         nv AS (SELECT owner AS doc_id, count(*) AS n_novel
                FROM bg WHERE df = 1 GROUP BY 1),
         tt AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY 1)
         SELECT t.doc_id, t.n_grams, coalesce(n.n_novel, 0)::BIGINT AS n_novel,
           round(coalesce(n.n_novel, 0) / t.n_grams::DOUBLE, 4) AS novelty_frac
         FROM tt t LEFT JOIN nv n USING (doc_id)""",
    // q8G: per-epoch training order — identical md5(salt|epoch|id)
    // sort keys, so the per-epoch permutations match row-for-row; the
    // oracle's window rank mirrors Spark's distributed prefix sum.
    "q8G_train_order" ->
      s"""WITH e AS (SELECT doc_id,
             unnest(generate_series(0, 1)) AS epoch FROM documents)
         SELECT doc_id, epoch::INT AS epoch,
           row_number() OVER (PARTITION BY epoch
             ORDER BY ${pHash("'order|' || epoch || '|' || doc_id")}, doc_id) AS pos
         FROM e""",
    // q8H: weighted sample — identical md5-derived 9-digit race
    // priorities, identical IEEE division by the weight, identical
    // (priority, id) tie-break, so the selected 500-row SET matches
    // exactly (no transcendental touches the selection boundary).
    "q8H_weighted_sample" ->
      s"""SELECT doc_id, source, n_chars,
           ${graft.Portable.roundSql("pri", 6)} AS priority
         FROM (SELECT doc_id, source, n_chars,
                 (${pHash("doc_id::VARCHAR || '|wsample'")} % 1000000000)::DOUBLE
                   / n_chars::DOUBLE AS pri
               FROM documents WHERE n_chars > 0
               ORDER BY pri, doc_id LIMIT 500)""",
    // q8I: source drift — identical unigram buckets (md5 % 1024),
    // identical histogram divisions, the same JS decomposition with
    // absent-bucket mass folded in as (1 − Σ_present q)·ln 2; only the
    // final divergence is rounded (the bucket-order summation skew is
    // ~1e-13, far below round-4 resolution — the q8C llr precedent).
    "q8I_source_drift" ->
      s"""WITH tok AS (SELECT source, unnest($WS) AS w FROM documents),
         cnt AS (SELECT source, ${pHash("w")} % 1024 AS b, count(*) AS c
                 FROM tok GROUP BY 1, 2),
         st AS (SELECT source, sum(c) AS ns FROM cnt GROUP BY 1),
         tt AS (SELECT sum(c)::DOUBLE AS n FROM cnt),
         bt AS (SELECT b, sum(c) AS cb FROM cnt GROUP BY 1),
         terms AS (SELECT source, ns, c::DOUBLE / ns::DOUBLE AS p,
                     cb::DOUBLE / n AS q
                   FROM cnt JOIN st USING (source) JOIN bt USING (b)
                   CROSS JOIN tt)
         SELECT source, ns::BIGINT AS n_grams,
           ${graft.Portable.roundSql(
             "0.5 * (sum(p * ln(2 * p / (p + q))) + " +
             "sum(q * ln(2 * q / (p + q))) + (1 - sum(q)) * ln(2))", 4)}
             AS js_div
         FROM terms GROUP BY source, ns""",
    // q8J: source-pair Jaccard — identical 3-gram shingles and 60-bit
    // hashes as q8A/q71, per-source DISTINCT sets, every unordered
    // pair reported with zero-overlap pairs kept via the left join.
    "q8J_source_jaccard" ->
      s"""WITH tok AS (SELECT source, $WS AS ws FROM documents),
         g AS (SELECT source, unnest(CASE WHEN len(ws) < 3 THEN []::VARCHAR[] ELSE
                 list_transform(generate_series(1, len(ws) - 2),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END) AS g
               FROM tok),
         sets AS (SELECT DISTINCT source, ${pHash("g")} AS h FROM g),
         -- census over ALL distinct sources (mirrors Corpus.sourceJaccard:
         -- a source whose every doc has < 3 tokens still appears in every
         -- pair row with n = 0, and an empty union pins J = 0, not 0/0)
         gsz AS (SELECT source, count(*) AS n FROM sets GROUP BY 1),
         sz AS (SELECT d.source, coalesce(gsz.n, 0) AS n
                FROM (SELECT DISTINCT source FROM documents) d
                LEFT JOIN gsz USING (source)),
         inter AS (SELECT a.source AS sa, b.source AS sb, count(*) AS cm
                   FROM sets a JOIN sets b
                     ON a.h = b.h AND a.source < b.source
                   GROUP BY 1, 2)
         SELECT x.source AS src_a, y.source AS src_b,
           x.n::BIGINT AS n_a, y.n::BIGINT AS n_b,
           coalesce(cm, 0)::BIGINT AS n_common,
           CASE WHEN x.n + y.n - coalesce(cm, 0) = 0 THEN 0.0
             ELSE ${graft.Portable.roundSql(
               "coalesce(cm, 0)::DOUBLE / (x.n + y.n - coalesce(cm, 0))::DOUBLE",
               4)} END AS jaccard
         FROM sz x JOIN sz y ON x.source < y.source
         LEFT JOIN inter ON sa = x.source AND sb = y.source""",
    // q8Q: per-source length profile — integer sums are exact in
    // double under any order, and quantile_cont ≡ Spark percentile
    // (the q8L parity), all rounded.
    "q8Q_length_profile" ->
      s"""SELECT source, count(*) AS n_docs,
           ${graft.Portable.roundSql("avg(n_chars)", 4)} AS mean_chars,
           ${graft.Portable.roundSql("quantile_cont(n_chars, 0.1)", 4)} AS p10,
           ${graft.Portable.roundSql("quantile_cont(n_chars, 0.5)", 4)} AS p50,
           ${graft.Portable.roundSql("quantile_cont(n_chars, 0.9)", 4)} AS p90
         FROM documents GROUP BY source""",
    // q8O: the round-7 capstone chains mirrors that already exist
    // stage-for-stage: q50's min-id-per-normalized-text dedup, q8L's
    // rounded median gate, q8M's CC split key + q67's split
    // arithmetic, q8H's race sample.
    "q8O_curation_v2" ->
      s"""WITH RECURSIVE
         k0 AS (SELECT min(doc_id) AS doc_id FROM documents
                GROUP BY lower(trim(text))),
         dd AS (SELECT d.* FROM documents d JOIN k0 USING (doc_id)),
         thr AS (SELECT lang,
                   ${graft.Portable.roundSql("quantile_cont(n_chars, 0.5)", 4)}
                     AS p50
                 FROM dd GROUP BY 1),
         qg AS (SELECT dd.* FROM dd JOIN thr USING (lang)
                WHERE n_chars >= p50),
         ${minhashPairsCtes("qg")},
         ${ccCtes()},
         keyed AS (SELECT q.doc_id, q.lang, q.source, q.n_chars,
                     coalesce(c.component, q.doc_id) AS split_key
                   FROM qg q LEFT JOIN comp c ON c.id = q.doc_id),
         tr AS (SELECT doc_id, lang, source, n_chars FROM keyed
                WHERE ${pHash("split_key::VARCHAR || '|split'")} % 10000 < 8000)
         SELECT doc_id, lang, source, n_chars,
           ${graft.Portable.roundSql("pri", 6)} AS priority
         FROM (SELECT doc_id, lang, source, n_chars,
                 (${pHash("doc_id::VARCHAR || '|wsample'")} % 1000000000)::DOUBLE
                   / n_chars::DOUBLE AS pri
               FROM tr WHERE n_chars > 0
               ORDER BY pri, doc_id LIMIT 100)""",
    // q8N: centroid alignment — identical (label, dim) double sums
    // (dimension pairing is engine-internal, so 0- vs 1-based
    // positions don't matter), identical mean divisions and cosine;
    // only the final value is rounded.
    "q8N_centroid_drift" ->
      s"""WITH ex AS (SELECT label, unnest(embedding::DOUBLE[]) AS v,
                unnest(generate_series(1, len(embedding))) AS pos
              FROM embeddings),
         lm AS (SELECT label, pos, sum(v) AS s FROM ex GROUP BY 1, 2),
         ln AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY 1),
         gn AS (SELECT count(*)::DOUBLE AS g FROM embeddings),
         lmean AS (SELECT label, pos, s / n_vecs AS m
                   FROM lm JOIN ln USING (label)),
         gmean AS (SELECT pos, sum(s) / any_value(g) AS gm
                   FROM lm CROSS JOIN gn GROUP BY pos),
         c AS (SELECT label,
                 sum(m * gm) / (sqrt(sum(m * m)) * sqrt(sum(gm * gm))) AS c
               FROM lmean JOIN gmean USING (pos) GROUP BY label)
         SELECT label, n_vecs::BIGINT AS n_vecs,
           ${graft.Portable.roundSql("c", 4)} AS centroid_cos
         FROM c JOIN ln USING (label)""",
    // q8M: leakage-free split — q8D's LSH + recursive-CC mirror keys
    // every doc by its component's min id (own id when unclustered),
    // then q67's md5 split arithmetic on that key.
    "q8M_leakfree_split" ->
      s"""WITH RECURSIVE ${minhashPairsCtes()},
         ${ccCtes()},
         keyed AS (SELECT d.doc_id, d.lang,
                     coalesce(c.component, d.doc_id) AS split_key
                   FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
         h AS (SELECT doc_id, lang, split_key,
                 ${pHash("split_key::VARCHAR || '|split'")} % 10000 AS hv
               FROM keyed)
         SELECT doc_id, lang, split_key,
           CASE WHEN hv < 8000 THEN 'train' WHEN hv < 9000 THEN 'val'
                ELSE 'test' END AS split
         FROM h""",
    // q8L: quantile gate — DuckDB's quantile_cont and Spark's exact
    // percentile share the p·(n−1) interpolation; both engines gate on
    // the ROUND-4 threshold so the boundary can't hinge on an ulp.
    "q8L_quantile_gate" ->
      s"""WITH t AS (SELECT lang,
             ${graft.Portable.roundSql("quantile_cont(n_chars, 0.9)", 4)} AS p90
           FROM documents GROUP BY 1)
         SELECT doc_id, lang, n_chars, p90
         FROM documents JOIN t USING (lang)
         WHERE n_chars >= p90""",
    // q8K: winnowing — identical 5-gram hashes (the q8A shingle
    // pattern), identical 4-wide window minima (pure integer min, no
    // arithmetic at all), distinct per doc.
    "q8K_winnow_fingerprints" ->
      s"""WITH tok AS (SELECT doc_id, $WS AS ws FROM documents),
         hs AS (SELECT doc_id, list_transform(
                  generate_series(1, len(ws) - 4),
                  i -> ${pHash("ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]")})
                  AS hs
                FROM tok WHERE len(ws) >= 5),
         wins AS (SELECT doc_id, unnest(list_transform(
                    generate_series(1, len(hs) - 3),
                    i -> list_min(hs[i:i+3]))) AS fp_hash
                  FROM hs WHERE len(hs) >= 4)
         SELECT DISTINCT doc_id, fp_hash FROM wins""",
    // q8C: DSIR importance weights — identical hashed-ngram buckets
    // (unigrams + space-joined bigrams through the portable md5 hash),
    // identical add-0.5-smoothed target/raw fits, identical per-doc
    // log-likelihood-ratio sums; only the final weight is rounded.
    "q8C_dsir_weights" ->
      s"""WITH tl AS (SELECT doc_id, source, $WS AS ws FROM documents),
         uni AS (SELECT doc_id, source, unnest(ws) AS g FROM tl),
         pr AS (SELECT doc_id, source, ws[i-1] || ' ' || ws[i] AS g
                FROM (SELECT doc_id, source, ws,
                        unnest(generate_series(2, len(ws))) AS i
                      FROM tl WHERE len(ws) >= 2)),
         grams AS (SELECT doc_id, source, ${pHash("g")} % 1024 AS b
                   FROM (SELECT * FROM uni UNION ALL SELECT * FROM pr)),
         tc AS (SELECT b, count(*) AS c FROM grams
                WHERE source IN ('src0', 'src1', 'src2') GROUP BY b),
         rc AS (SELECT b, count(*) AS c FROM grams GROUP BY b),
         tt AS (SELECT sum(c)::DOUBLE AS t FROM tc),
         rt AS (SELECT sum(c)::DOUBLE AS r FROM rc),
         llr AS (SELECT rc.b,
                   ln((coalesce(tc.c, 0) + 0.5) / (t + 0.5 * 1024)) -
                   ln((rc.c + 0.5) / (r + 0.5 * 1024)) AS llr
                 FROM rc LEFT JOIN tc USING (b) CROSS JOIN tt CROSS JOIN rt),
         bag AS (SELECT doc_id, b, count(*) AS c FROM grams GROUP BY 1, 2)
         SELECT doc_id, sum(c)::BIGINT AS n_grams,
           ${graft.Portable.roundSql("sum(c * llr)", 4)} AS weight
         FROM bag JOIN llr USING (b)
         GROUP BY doc_id""",
    // q8A: the bloom prefilter + exact verify is row-identical to the
    // exact path by construction (no false negatives, FPs verified
    // away) — the oracle IS q72's.
    "q8A_bloom_decontaminate" ->
      s"""WITH tok AS (SELECT doc_id, $WS AS ws FROM documents),
         g AS (SELECT doc_id, unnest(CASE WHEN len(ws) < 5 THEN []::VARCHAR[] ELSE
                 list_transform(generate_series(1, len(ws) - 4),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]) END) AS g
               FROM tok),
         gh AS (SELECT DISTINCT doc_id, ${pHash("g")} AS gram_hash FROM g),
         bench AS (SELECT DISTINCT gram_hash FROM gh WHERE doc_id % 50 = 0)
         SELECT a.doc_id, count(*) AS n_contaminated
         FROM (SELECT doc_id, gram_hash FROM gh WHERE doc_id % 50 <> 0) a
         JOIN bench b USING (gram_hash)
         GROUP BY 1""",
    // q89: the change feed after tx 1 = slices 2 and 3's candles,
    // unfolded, stamped with their commit's tx id (commits run in slice
    // order 1, 2, 3 — see Queries.versionedStore).
    "q89_vstore_changes" ->
      s"""WITH b AS (${hourlyCandles("WHERE event_id % 3 = 2")}),
         c0 AS (${hourlyCandles("WHERE event_id % 3 = 0")})
         SELECT code, ts, round(open, 4) AS open, round(close, 4) AS close,
           round(volume, 4) AS volume, 2::BIGINT AS tx_id FROM b
         UNION ALL
         SELECT code, ts, round(open, 4) AS open, round(close, 4) AS close,
           round(volume, 4) AS volume, 3::BIGINT AS tx_id FROM c0""",
    // q82: wall-clock time travel resolves to the same as-of-tx-2 state
    // (commit 2 is journaled at 2024-07-02 00:00, commit 3 at 07-03).
    "q82_store_asof_time" ->
      s"""WITH a AS (${hourlyCandles("WHERE event_id % 3 = 1")}),
         b AS (${hourlyCandles("WHERE event_id % 3 = 2")}),
         u AS (SELECT *, 1 AS src FROM b UNION ALL SELECT *, 0 AS src FROM a),
         r AS (SELECT *, row_number() OVER (PARTITION BY code, ts ORDER BY src DESC) AS rn FROM u)
         SELECT code, ts, round(open, 4) AS open, round(close, 4) AS close,
           round(volume, 4) AS volume
         FROM r WHERE rn = 1""",
    "q7D_readability" ->
      s"""WITH c AS (SELECT doc_id,
           len($WS)::INT AS n_words,
           len(regexp_extract_all(text, '[.!?]+'))::INT AS n_sentences,
           len(regexp_extract_all(lower(text), '[aeiouy]+'))::INT AS n_syllables
         FROM documents)
         SELECT doc_id, n_words, n_sentences, n_syllables,
           round(206.835
             - 1.015 * (greatest(n_words, 1)::DOUBLE / greatest(n_sentences, 1)::DOUBLE)
             - 84.6 * (n_syllables::DOUBLE / greatest(n_words, 1)::DOUBLE), 4) AS flesch
         FROM c""",
    // q7C: the Count-Min sketch is deterministic (seeded hashes over the
    // portable md5), so the oracle rebuilds the identical 4×1024 table
    // and the estimates hash-match exactly — plus the one-sided bound.
    "q7C_count_min" -> {
      val probes = Seq("the", "data", "join", "vector", "graftabsentword")
      val probeList = probes.map(p => s"'$p'").mkString(", ")
      val arms = (0 until 4).map(j =>
        s"SELECT $j AS row, ${cmsBucketSql("ph", j)} AS bucket, count(*) AS cnt FROM ph GROUP BY 2")
        .mkString(" UNION ALL ")
      val probeArms = (0 until 4).map(j =>
        s"SELECT word, $j AS row, ${cmsBucketSql(pHash("word"), j)} AS bucket FROM probes")
        .mkString(" UNION ALL ")
      s"""WITH tok AS (SELECT unnest($WS) AS w FROM documents),
         ph AS (SELECT ${pHash("w")} AS ph FROM tok),
         cms AS ($arms),
         probes AS (SELECT unnest([$probeList]) AS word),
         pb AS ($probeArms),
         est AS (SELECT word, min(coalesce(cnt, 0)) AS cms_est
                 FROM pb LEFT JOIN cms USING (row, bucket) GROUP BY 1),
         exact AS (SELECT w AS word, count(*) AS exact_cnt FROM tok
                   WHERE w IN ($probeList) GROUP BY 1)
         SELECT word, coalesce(exact_cnt, 0) AS exact_cnt, cms_est,
           cms_est >= coalesce(exact_cnt, 0) AS lower_bound_ok
         FROM est LEFT JOIN exact USING (word)"""
    },
    "q77_bigram_lm" ->
      s"""WITH tok AS (SELECT doc_id, unnest($WS) AS w FROM documents),
         cnt AS (SELECT w, count(*)::DOUBLE AS cw FROM tok GROUP BY w),
         tot AS (SELECT count(*)::DOUBLE AS n FROM tok),
         tl AS (SELECT doc_id, $WS AS ws FROM documents),
         pr AS (SELECT doc_id, unnest(generate_series(2, len(ws))) AS i, ws
                FROM tl WHERE len(ws) >= 2),
         pw AS (SELECT doc_id, ws[i-1] AS w1, ws[i] AS w2 FROM pr),
         bc AS (SELECT w1, w2, count(*)::DOUBLE AS cb FROM pw GROUP BY 1, 2)
         SELECT doc_id, count(*) AS n_bigrams,
           round(avg(log10(0.75 * (cb / c1.cw) + (1.0 - 0.75) * (c2.cw / n))), 4) AS avg_logp
         FROM pw
         JOIN bc USING (w1, w2)
         JOIN cnt c1 ON pw.w1 = c1.w
         JOIN cnt c2 ON pw.w2 = c2.w
         CROSS JOIN tot
         GROUP BY doc_id""",
    // q60: the multimodal stub's byte arithmetic, mirrored exactly —
    // UTF-8 bytes recovered via hex(), rolling checksum via
    // list_reduce, stride-0 mean in double (integer byte sums + one
    // double division on both sides).
    "q60_multimodal_features" ->
      """WITH b AS (
           SELECT doc_id, hex(encode(text)) AS h,
                  octet_length(encode(text)) AS n
           FROM documents),
         bl AS (
           SELECT doc_id, n,
             list_transform(generate_series(1, n), i ->
               (position(substr(h, 2*i-1, 1) IN '0123456789ABCDEF') - 1) * 16 +
               (position(substr(h, 2*i, 1) IN '0123456789ABCDEF') - 1)) AS bytes
           FROM b)
         SELECT doc_id AS id, n::INT AS n_bytes,
           list_reduce(list_prepend(0::BIGINT, bytes),
             (a, x) -> (a * 131 + x) % 1000000007)::BIGINT AS checksum,
           CASE WHEN n = 0 THEN 0.0 ELSE
             round(list_sum(list_transform(generate_series(1, n, 8),
               i -> bytes[i]))::DOUBLE / n, 4)
           END AS f0
         FROM bl""",
    // q7B: perceptual-hash pair census — the closed form is the pattern
    // census (doc_id % 30), reached ONLY if byte-distinct re-encodes
    // hash identically and no two patterns collide.
    "q7B_image_phash" ->
      """SELECT sum(c * (c - 1) // 2)::BIGINT AS n_pairs, true AS all_same_pattern,
                true AS has_byte_distinct
         FROM (SELECT doc_id % 30 AS r, count(*) AS c FROM documents GROUP BY 1)""",
    // q78/q79: property oracles (q6B/q63 pattern) — planted-pair count /
    // query census computable blind; the boolean gates carry the recall.
    "q78_semdedup_recall" ->
      """SELECT count(*)::BIGINT AS n_exact, true AS recall_ok
         FROM embeddings WHERE vec_id < 2000 AND vec_id % 25 = 0""",
    "q79_pq_topk_recall" ->
      """SELECT count(DISTINCT vec_id)::BIGINT AS n_queries, true AS recall_ok
         FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < 10000""",
    "q83_ivfpq_topk_recall" ->
      """SELECT count(DISTINCT vec_id)::BIGINT AS n_queries, true AS recall_ok
         FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < 10000""",
    // q87: the composed curation pipeline, mirrored as one chain —
    // exact dedup, MinHash near-dup connected components, q45's quality
    // gate, q72's 5-gram decontamination, q81's token budget.
    "q87_curation_pipeline" ->
      s"""WITH RECURSIVE
         corp0 AS (SELECT * FROM documents WHERE doc_id % 50 <> 0),
         k0 AS (SELECT min(doc_id) AS doc_id FROM corp0 GROUP BY lower(trim(text))),
         dd AS (SELECT c.* FROM corp0 c JOIN k0 USING (doc_id)),
         ${minhashPairsCtes("dd")},
         ${ccCtes()},
         nd AS (SELECT * FROM dd WHERE doc_id NOT IN
                  (SELECT id FROM comp WHERE id <> component)),
         t AS (SELECT doc_id, source, text, $WS AS ws FROM nd),
         m AS (SELECT doc_id, source, text, ws, len(ws) AS ntok,
           len(list_filter(ws, w -> list_contains(['the','and','of','is','with'], w))) AS s_en,
           len(list_filter(ws, w -> list_contains(['der','die','und','ist','mit'], w))) AS s_de,
           len(list_filter(ws, w -> list_contains(['le','la','et','est','avec'], w))) AS s_fr,
           len(list_filter(ws, w -> list_contains(['el','la','y','es','con'], w))) AS s_es,
           len(list_filter(ws, w -> list_contains(['de','shi','he','zai','le'], w))) AS s_zh,
           CASE WHEN len(ws) = 0 THEN 0.0 ELSE
             len(list_filter(ws, w -> list_contains(['the','a','an','and','or','of','to','in','is','it'], w)))::DOUBLE
               / len(ws)::DOUBLE END AS stop_ratio,
           CASE WHEN len(ws) = 0 THEN 0.0 ELSE
             list_sum(list_transform(ws, w -> length(w)))::DOUBLE / len(ws)::DOUBLE END AS mwl
         FROM t),
         q AS (SELECT *, greatest(s_en, s_de, s_fr, s_es, s_zh) AS best,
           round(least(length(text)::DOUBLE / 500.0, 1.0) * 0.4
             + least(stop_ratio * 10.0, 1.0) * 0.3
             + CASE WHEN mwl >= 3.0 AND mwl <= 8.0 THEN 0.3 ELSE 0.1 END, 4) AS quality
         FROM m),
         keepq AS (SELECT doc_id, source, text FROM q
           WHERE ntok BETWEEN 20 AND 10000 AND quality >= 0.6
             AND (CASE WHEN s_en = best AND best > 0 THEN 'en'
                       WHEN s_de = best AND best > 0 THEN 'de'
                       WHEN s_fr = best AND best > 0 THEN 'fr'
                       WHEN s_es = best AND best > 0 THEN 'es'
                       WHEN s_zh = best AND best > 0 THEN 'zh'
                       ELSE 'und' END) = 'en'),
         cg AS (SELECT DISTINCT doc_id, ${pHash("g")} AS gram_hash FROM
                 (SELECT doc_id, unnest(CASE WHEN len(ws) < 5 THEN []::VARCHAR[] ELSE
                    list_transform(generate_series(1, len(ws) - 4),
                      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]) END) AS g
                  FROM (SELECT doc_id, $WS AS ws FROM keepq))),
         bg AS (SELECT DISTINCT ${pHash("g")} AS gram_hash FROM
                 (SELECT unnest(CASE WHEN len(ws) < 5 THEN []::VARCHAR[] ELSE
                    list_transform(generate_series(1, len(ws) - 4),
                      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]) END) AS g
                  FROM (SELECT $WS AS ws FROM documents WHERE doc_id % 50 = 0))),
         contaminated AS (SELECT DISTINCT doc_id FROM cg JOIN bg USING (gram_hash)),
         clean AS (SELECT * FROM keepq
                   WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
         tb AS (SELECT doc_id, source, len($WS)::INT AS n_tokens,
                  ${pHash("doc_id::VARCHAR || '|budget'")} % 10000 AS hv
                FROM clean),
         cb AS (SELECT doc_id, source, n_tokens,
                  (sum(n_tokens::BIGINT) OVER (PARTITION BY source
                    ORDER BY hv, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_tokens
                FROM tb)
         SELECT doc_id, source, n_tokens, cum_tokens FROM cb
         WHERE cum_tokens <= CASE source WHEN 'src0' THEN 5000
                                         WHEN 'src1' THEN 3000 ELSE 8000 END""",
    // q86: NFC normalization mirrored via utf8proc — the planted
    // decomposed suffix must compose on both engines identically.
    "q86_nfc_normalize" ->
      """WITH p AS (SELECT doc_id,
           text || CASE WHEN doc_id % 2 = 0
                        THEN ' e' || chr(769) || 'cole' ELSE ' plain' END AS t
         FROM documents)
         SELECT doc_id,
           octet_length(encode(t))::INT AS n_bytes_raw,
           octet_length(encode(nfc_normalize(t)))::INT AS n_bytes_nfc,
           t <> nfc_normalize(t) AS changed
         FROM p""",
    // q84: planted-accuracy gate for the char-trigram language-ID model
    // (held-out sentences, language keyed by doc_id) — census blind,
    // boolean carries the accuracy.
    "q84_langid_ngram" ->
      """SELECT count(*)::BIGINT AS n_docs, true AS all_correct
         FROM documents""",
    // q7A: the Spark side round-trips a REAL WAV encode+decode+DFT; the
    // oracle computes the square wave's fundamental bin in closed form.
    "q7A_wav_spectral" ->
      """SELECT doc_id, 800::BIGINT AS n_samples,
         (400 // (CASE doc_id % 8 WHEN 0 THEN 2 WHEN 1 THEN 4 WHEN 2 THEN 5
                  WHEN 3 THEN 8 WHEN 4 THEN 10 WHEN 5 THEN 16 WHEN 6 THEN 20
                  ELSE 25 END))::BIGINT AS dominant_bin
         FROM documents""",
    "q50_exact_dedup" ->
      """SELECT lower(trim(text)) AS norm_text, min(doc_id) AS doc_id,
         count(*) AS dup_count
         FROM documents GROUP BY 1""",
    "q51_ngram_jaccard" ->
      s"""WITH tok AS (SELECT doc_id AS id, $WS AS ws FROM documents WHERE doc_id < 300),
         shl AS (SELECT id, list_distinct(${shingleExpr("ws")}) AS sh FROM tok),
         f AS (SELECT id, sh FROM shl WHERE len(sh) > 0),
         e AS (SELECT id, unnest(sh) AS s FROM f),
         px AS (SELECT a.id AS id_a, b.id AS id_b, count(*)::DOUBLE AS i
                FROM e a JOIN e b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2),
         sz AS (SELECT id, len(sh) AS n FROM f)
         SELECT id_a, id_b, round(i / (sa.n + sb.n - i), 4) AS jaccard
         FROM px JOIN sz sa ON px.id_a = sa.id JOIN sz sb ON px.id_b = sb.id
         WHERE i / (sa.n + sb.n - i) >= 0.1""",
    "q52_minhash_pairs" ->
      s"""WITH ${minhashPairsCtes()}
         SELECT id_a, id_b, round(i / (nn - i), 4) AS jaccard
         FROM jj WHERE i / (nn - i) >= 0.3""",
    // Connected components over the q52 pair graph, by enumeration of
    // the reachability closure (bounded: near-dup clusters are tiny) —
    // the declarative ground truth for the engine's distributed
    // label-propagation operator.
    "q69_dup_clusters" ->
      s"""WITH RECURSIVE ${minhashPairsCtes()},
         ${ccCtes()}
         SELECT id, component FROM comp""",
    "q6C_unigram_lm" ->
      s"""WITH tok AS (SELECT doc_id, unnest($WS) AS w FROM documents),
         cnt AS (SELECT w, count(*)::DOUBLE AS c FROM tok GROUP BY w),
         tot AS (SELECT count(*)::DOUBLE AS n FROM tok)
         SELECT doc_id, count(*) AS n_tokens,
           round(avg(log10(c / n)), 4) AS avg_logp
         FROM tok JOIN cnt USING (w) CROSS JOIN tot
         GROUP BY doc_id""",
    "q6D_quantize_embed" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         s AS (SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
         q AS (SELECT vec_id, v, scale,
                 list_transform(v, x -> CASE WHEN scale = 0 THEN 0.0
                   ELSE abs(sign(x) * floor(abs(x) / scale + 0.5) * scale - x) END) AS err
               FROM s)
         SELECT vec_id, len(v)::INT AS dim, round(scale, 6) AS scale,
           round(list_max(err), 6) AS max_abs_err,
           round(list_sum(err) / len(v), 6) AS mean_abs_err
         FROM q""",
    "q6H_bpe_tokenizer" ->
      """SELECT count(*) AS n_docs, true AS all_roundtrip, true AS compressed_ok
         FROM documents""",
    "q6G_pii_redact" ->
      """WITH r AS (SELECT doc_id, text,
           regexp_replace(
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS redacted
         FROM documents)
         SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::INT AS n_emails,
           len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::INT AS n_ipv4,
           length(redacted)::INT AS redacted_len,
           md5(redacted) AS redacted_md5
         FROM r""",
    "q53_simhash_pairs" ->
      s"""WITH tok AS (SELECT doc_id AS id, $WS AS ws FROM documents WHERE doc_id < 1000),
         hs AS (SELECT id, list_transform(ws, w -> ${pHash("w")}) AS h FROM tok),
         sg AS (SELECT id, $simhashSigExpr AS sig FROM hs),
         band AS (SELECT id, sig, unnest($simhashBandList) AS band FROM sg),
         cand AS (SELECT DISTINCT a.id AS id_a, a.sig AS sig_a, b.id AS id_b, b.sig AS sig_b
                  FROM band a JOIN band b ON a.band = b.band AND a.id < b.id)
         SELECT id_a, id_b, bit_count(xor(sig_a, sig_b))::INT AS hamming
         FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 6""",
    "q44_dedup_corpus" ->
      """WITH k AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY lower(trim(text)))
         SELECT d.doc_id, d.lang, d.source, d.n_chars
         FROM documents d JOIN k USING (doc_id)""",
    "q45_quality_filter" ->
      s"""WITH k AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY lower(trim(text))),
         dd AS (SELECT d.* FROM documents d JOIN k USING (doc_id)),
         t AS (SELECT doc_id, source, text, $WS AS ws FROM dd),
         m AS (SELECT doc_id, source, text, ws, len(ws) AS ntok,
           len(list_filter(ws, w -> list_contains(['the','and','of','is','with'], w))) AS s_en,
           len(list_filter(ws, w -> list_contains(['der','die','und','ist','mit'], w))) AS s_de,
           len(list_filter(ws, w -> list_contains(['le','la','et','est','avec'], w))) AS s_fr,
           len(list_filter(ws, w -> list_contains(['el','la','y','es','con'], w))) AS s_es,
           len(list_filter(ws, w -> list_contains(['de','shi','he','zai','le'], w))) AS s_zh,
           CASE WHEN len(ws) = 0 THEN 0.0 ELSE
             len(list_filter(ws, w -> list_contains(['the','a','an','and','or','of','to','in','is','it'], w)))::DOUBLE
               / len(ws)::DOUBLE END AS stop_ratio,
           CASE WHEN len(ws) = 0 THEN 0.0 ELSE
             list_sum(list_transform(ws, w -> length(w)))::DOUBLE / len(ws)::DOUBLE END AS mwl
         FROM t),
         q AS (SELECT *, greatest(s_en, s_de, s_fr, s_es, s_zh) AS best,
           round(least(length(text)::DOUBLE / 500.0, 1.0) * 0.4
             + least(stop_ratio * 10.0, 1.0) * 0.3
             + CASE WHEN mwl >= 3.0 AND mwl <= 8.0 THEN 0.3 ELSE 0.1 END, 4) AS quality
         FROM m)
         SELECT doc_id, source FROM q
         WHERE ntok BETWEEN 20 AND 10000 AND quality >= 0.6
           AND (CASE WHEN s_en = best AND best > 0 THEN 'en'
                     WHEN s_de = best AND best > 0 THEN 'de'
                     WHEN s_fr = best AND best > 0 THEN 'fr'
                     WHEN s_es = best AND best > 0 THEN 'es'
                     WHEN s_zh = best AND best > 0 THEN 'zh'
                     ELSE 'und' END) = 'en'""",
    "q46_corpus_stats" ->
      s"""WITH t AS (SELECT lang, source, text, $WS AS ws FROM documents),
         m AS (SELECT lang, source, len(ws) AS ntok,
           CASE WHEN len(ws) = 0 THEN 0.0 ELSE
             len(list_filter(ws, w -> list_contains(['the','a','an','and','or','of','to','in','is','it'], w)))::DOUBLE
               / len(ws)::DOUBLE END AS stop_ratio,
           CASE WHEN len(ws) = 0 THEN 0.0 ELSE
             list_sum(list_transform(ws, w -> length(w)))::DOUBLE / len(ws)::DOUBLE END AS mwl,
           length(text) AS nchars
         FROM t)
         SELECT lang, source, count(*) AS n_docs,
           sum(ntok)::BIGINT AS total_tokens,
           round(avg(round(least(nchars::DOUBLE / 500.0, 1.0) * 0.4
             + least(stop_ratio * 10.0, 1.0) * 0.3
             + CASE WHEN mwl >= 3.0 AND mwl <= 8.0 THEN 0.3 ELSE 0.1 END, 4)), 4) AS mean_quality
         FROM m GROUP BY 1, 2""",
    "q54_text_counts" ->
      s"""SELECT doc_id,
         len(ws)::INT AS n_tokens,
         list_sum(list_transform(ws, w -> 1 + greatest(length(w) - 4, 0) // 4))::BIGINT AS n_subwords,
         length(text)::INT AS n_chars,
         round(CASE WHEN len(ws) = 0 THEN 0.0 ELSE
           len(list_filter(ws, w -> list_contains(['the','a','an','and','or','of','to','in','is','it'], w)))::DOUBLE
             / len(ws)::DOUBLE END, 4) AS stopword_ratio,
         round(CASE WHEN len(ws) = 0 THEN 0.0 ELSE
           list_sum(list_transform(ws, w -> length(w)))::DOUBLE / len(ws)::DOUBLE END, 4) AS mean_word_len
         FROM (SELECT doc_id, text, $WS AS ws FROM documents)""",
    "q55_text_lang_fp" ->
      s"""WITH t AS (SELECT doc_id, text, $WS AS ws FROM documents),
         sc AS (SELECT doc_id, text, ws,
           len(list_filter(ws, w -> list_contains(['the','and','of','is','with'], w))) AS s_en,
           len(list_filter(ws, w -> list_contains(['der','die','und','ist','mit'], w))) AS s_de,
           len(list_filter(ws, w -> list_contains(['le','la','et','est','avec'], w))) AS s_fr,
           len(list_filter(ws, w -> list_contains(['el','la','y','es','con'], w))) AS s_es,
           len(list_filter(ws, w -> list_contains(['de','shi','he','zai','le'], w))) AS s_zh,
           CASE WHEN len(ws) = 0 THEN 0.0 ELSE
             len(list_filter(ws, w -> list_contains(['the','a','an','and','or','of','to','in','is','it'], w)))::DOUBLE
               / len(ws)::DOUBLE END AS stop_ratio,
           CASE WHEN len(ws) = 0 THEN 0.0 ELSE
             list_sum(list_transform(ws, w -> length(w)))::DOUBLE / len(ws)::DOUBLE END AS mwl
         FROM t),
         g AS (SELECT *, greatest(s_en, s_de, s_fr, s_es, s_zh) AS best FROM sc)
         SELECT doc_id,
           CASE WHEN s_en = best AND best > 0 THEN 'en'
                WHEN s_de = best AND best > 0 THEN 'de'
                WHEN s_fr = best AND best > 0 THEN 'fr'
                WHEN s_es = best AND best > 0 THEN 'es'
                WHEN s_zh = best AND best > 0 THEN 'zh'
                ELSE 'und' END AS lang_pred,
           round(least(length(text)::DOUBLE / 500.0, 1.0) * 0.4
             + least(stop_ratio * 10.0, 1.0) * 0.3
             + CASE WHEN mwl >= 3.0 AND mwl <= 8.0 THEN 0.3 ELSE 0.1 END, 4) AS quality,
           list_reduce(
             list_prepend(0::BIGINT, list_transform(ws, w -> ${pHash("w")} % 1000003)),
             (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
         FROM g""",
    // q8P: hard negatives — q56's exact mirror with the different-label
    // join condition; identical round-4 scores and (score desc, id)
    // tie-break.
    "q8P_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
             label AS ql FROM embeddings
           WHERE vec_id % 20 = 0 AND vec_id < 10000),
         c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
             label AS cl FROM embeddings),
         sc AS (SELECT query_id, neighbor_id,
             round(list_cosine_similarity(qv, cv), 4) AS score
           FROM q CROSS JOIN c WHERE ql <> cl),
         r AS (SELECT query_id, neighbor_id, score,
             row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, neighbor_id ASC)::INT AS rank
           FROM sc)
         SELECT query_id, neighbor_id, score, rank FROM r WHERE rank <= 5""",
    "q56_topk_cosine" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < 10000),
         c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
         sc AS (SELECT query_id, neighbor_id,
             round(list_cosine_similarity(qv, cv), 4) AS score
           FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
         r AS (SELECT query_id, neighbor_id, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC)::INT AS rank
           FROM sc)
         SELECT query_id, neighbor_id, score, rank FROM r WHERE rank <= 10""",
    "q59_ivf_topk" ->
      """WITH cent AS (SELECT vec_id AS cell_id, embedding::DOUBLE[] AS centroid
           FROM embeddings ORDER BY vec_id ASC LIMIT 16),
         c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
         ca AS (SELECT cell_id, neighbor_id, cv,
             round(list_cosine_similarity(cv, centroid), 6) AS csim
           FROM c CROSS JOIN cent),
         assigned AS (SELECT cell_id, neighbor_id, cv FROM
           (SELECT *, row_number() OVER (PARTITION BY neighbor_id
              ORDER BY csim DESC, cell_id ASC) AS rn FROM ca) WHERE rn = 1),
         q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < 10000),
         qa AS (SELECT query_id, qv, cell_id,
             round(list_cosine_similarity(qv, centroid), 6) AS csim
           FROM q CROSS JOIN cent),
         probes AS (SELECT query_id, qv, cell_id FROM
           (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY csim DESC, cell_id ASC) AS rn FROM qa) WHERE rn <= 2),
         sc AS (SELECT query_id, neighbor_id,
             round(list_cosine_similarity(qv, cv), 4) AS score
           FROM probes JOIN assigned USING (cell_id)
           WHERE query_id <> neighbor_id)
         SELECT query_id, neighbor_id, score, rank FROM
           (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id ASC)::INT AS rank FROM sc)
         WHERE rank <= 10""",
    // Property oracle (cf. q29/q4G): the k-means IVF recall floor is
    // asserted on the Spark side; DuckDB independently fixes the query
    // population and the expected verdict.
    // q6B: the oracle pins the exact planted-pair count (only the
    // planted copies can reach cosine 0.99 on near-uniform data) and
    // literal true — Spark's computed recall_ok must BE true to match.
    "q6B_lsh_pairs_recall" ->
      """SELECT count(*)::BIGINT AS n_exact, true AS recall_ok
         FROM embeddings WHERE vec_id < 2000 AND vec_id % 25 = 0""",
    "q63_ivf_kmeans_recall" ->
      """SELECT count(DISTINCT vec_id)::BIGINT AS n_queries, true AS recall_ok
         FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < 10000""",
    // q9A: same property-oracle shape — the IVF hard-negative recall
    // gate must compute true to hash-match.
    "q9A_hard_neg_ivf_recall" ->
      """SELECT count(DISTINCT vec_id)::BIGINT AS n_queries, true AS recall_ok
         FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < 10000""",
    "q57_embedding_stats" ->
      """SELECT vec_id, len(embedding)::INT AS dim,
         round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6) AS l2_norm,
         round(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) / len(embedding), 6) AS mean_sq
         FROM embeddings""",
    "q58_cosine_neardup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 400)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 4) AS score
         FROM e a CROSS JOIN e b
         WHERE a.vec_id < b.vec_id
           AND round(list_cosine_similarity(a.v, b.v), 4) >= 0.25"""
  )
}
