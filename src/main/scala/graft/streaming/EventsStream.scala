package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.Triple

/** Structured Streaming surface.
  *
  * The reference has no streaming operators (SURVEY.md §2.7) — its
  * incremental analogue is the MCP memory loop: generate a small graph,
  * aggregate into the persistent store, save (mcp/server.py:131-166).
  * This module supplies the Spark-native streaming equivalents:
  *
  *   - [[windowedStats]]: tumbling-window event aggregation, written
  *     once and applied identically to batch frames and readStream
  *     frames (the transform is the contract; streaming-vs-batch parity
  *     is asserted in tests);
  *   - [[newTriples]]: the add_memories analogue — a stateful streaming
  *     distinct over (subject, predicate, object) via
  *     KeyValueGroupedDataset.flatMapGroupsWithState, emitting each
  *     triple exactly once across the stream's lifetime (the incremental
  *     MERGE-style dedup into the graph store).
  */
object EventsStream {

  /** Tumbling 1-minute stats per event_type. Values are quantized
    * per-row before summing (floor(v*1000+0.5)) so results are exact
    * integers — batch, streaming, and the DuckDB oracle agree
    * bit-for-bit.
    */
  def windowedStats(events: DataFrame): DataFrame =
    events
      .withColumn("v_milli", expr("CAST(floor(CAST(value AS DOUBLE) * 1000 + 0.5) AS BIGINT)"))
      .groupBy(
        window(col("ts"), "1 minute").as("w"),
        col("event_type")
      )
      .agg(
        count(lit(1)).as("n_events"),
        sum("v_milli").as("sum_milli")
      )
      .select(
        col("w.start").as("w_start"),
        col("event_type"),
        col("n_events"),
        col("sum_milli")
      )

  /** Watermarked variant for unbounded streams (late data bound 2 min);
    * same aggregation body.
    */
  def windowedStatsStreaming(events: DataFrame): DataFrame =
    windowedStats(events.withWatermark("ts", "2 minutes"))

  /** Per-type value-distribution monitor with EXACT integer variance:
    * n, sum/min/max (centi units) and the sample variance
    * var = (n·Σv² − (Σv)²) div (n·(n−1)) in centi² — the drift alarm a
    * metrics pipeline keeps per event type. Centi (not milli)
    * quantization keeps n·Σv² inside BIGINT at the bench scales; the
    * production-scale variant lifts the two products to DECIMAL(38,0)
    * (or Welford in log space) — noted, not silently wrong. Output:
    * (event_type, n, sum_centi, min_centi, max_centi, var_centi2).
    *
    * Shape at scale: one partial-aggregated exchange on the tiny
    * event_type key; all five aggregates share the pass.
    */
  def valueStats(events: DataFrame): DataFrame =
    events
      .select(
        col("event_type"),
        expr("CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT)").as("v")
      )
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("v").as("sum_centi"),
        min("v").as("min_centi"),
        max("v").as("max_centi"),
        sum(expr("v * v")).as("ss")
      )
      .withColumn(
        "var_centi2",
        expr("IF(n > 1, (n * ss - sum_centi * sum_centi) div (n * (n - 1)), 0L)")
      )
      .select("event_type", "n", "sum_centi", "min_centi", "max_centi", "var_centi2")

  /** Sliding-window stats (2-minute windows sliding every minute): each
    * event lands in exactly duration/slide windows — the overlapping-
    * window shape alerting and rate monitors read (tumbling windows
    * miss bursts straddling a boundary). Spark plans the slide as a
    * window-list generator inside the scan projection (constant ×2
    * fan-out) plus one partial-aggregated exchange; the oracle
    * enumerates the same two epoch-aligned starts per event.
    */
  def slidingStats(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "2 minutes", "1 minute").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n_events"))

  /** Daily activity with an exact 3-CALENDAR-DAY rolling event count:
    * the day table is aggregated first (one exchange on the tiny day
    * key), then the rolling sum runs a RANGE frame over integer epoch
    * days — gaps in the calendar shrink the frame correctly, unlike a
    * ROWS frame over observed days. The window orders the bounded
    * per-day table (hundreds of rows at any corpus size), never events.
    * Output: (day, n_events, n_users, rolling_3d_events).
    */
  def rollingDaily(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"), count_distinct(col("user_id")).as("n_users"))
      .withColumn("day_idx", datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
    val w = Window.orderBy("day_idx").rangeBetween(-2, 0)
    daily.select(
      col("day"),
      col("n_events"),
      col("n_users"),
      sum("n_events").over(w).as("rolling_3d_events")
    )
  }

  /** Volume-anomaly days per event type — the robust (median/MAD)
    * monitoring rule in exact integer arithmetic: a day is anomalous
    * when its event count deviates from the type's LOWER-MEDIAN daily
    * count by at least `k` × the lower-median absolute deviation
    * (MAD floored at 1 so constant series still flag genuine jumps).
    * Lower medians — the element at rank (n+1) div 2 under the
    * deterministic (value, day) order — keep both engines bit-identical
    * where interpolated medians would float-drift. Output per flagged
    * day: (event_type, day, n_events, med, mad, deviation).
    *
    * Shape at scale: the daily count is the one data-sized exchange
    * (partial-aggregated); every window after it runs over the bounded
    * (types × days) table — hundreds of rows per type at any corpus
    * size — never over raw events.
    */
  def anomalyDays(events: DataFrame, k: Int = 3): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    // lower median of `valueCol` per event_type, tie-broken by day
    def lowerMedian(dfIn: DataFrame, valueCol: String, out: String): DataFrame = {
      val w = Window.partitionBy("event_type").orderBy(col(valueCol), col("day"))
      dfIn
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy("event_type")))
        .where(expr("rn = (cnt + 1) div 2"))
        .select(col("event_type"), col(valueCol).as(out))
    }
    val med = lowerMedian(daily, "n_events", "med")
    val dev = daily
      .join(med, "event_type")
      .withColumn("deviation", abs(col("n_events") - col("med")))
    val mad = lowerMedian(dev, "deviation", "mad")
    dev
      .join(mad, "event_type")
      .where(col("deviation") >= lit(k.toLong) * greatest(col("mad"), lit(1L)))
      .select("event_type", "day", "n_events", "med", "mad", "deviation")
  }

  /** Day-of-week volume seasonality per event type — each type's
    * traffic profile as (dow, n_events, permille of the type's total),
    * the shape capacity planning and anomaly baselining read first.
    * dow is 0 = Sunday … 6 = Saturday (Spark's 1-based `dayofweek`
    * shifted down one to the numbering DuckDB shares). Permille widens
    * to DECIMAL(38,0) so planet-scale event counts cannot wrap.
    *
    * Shape at scale: one data-sized partial-aggregated exchange for the
    * (type, dow) counts; the totals and the ratio run over the bounded
    * (types × 7) table.
    */
  /** Seasonal-naive forecast evaluation: for every (event_type, day)
    * with at least three same-weekday predecessors in the data, the
    * forecast is the floor-mean of the counts 7, 14 and 21 days back
    * (0 when that weekday was silent), scored against the actual count
    * by absolute error. This is the monitoring baseline every anomaly
    * pager needs calibrated before ML forecasting earns its keep — and
    * the per-type MAE trend is itself the drift signal. Output:
    * (event_type, day, actual, forecast, abs_err).
    *
    * Shape at scale: daily counts are one partial-aggregated exchange
    * (types × days rows — tiny); the three look-backs are equi-joins
    * of that small frame against itself on (type, day−7k) — broadcast
    * territory at any realistic type vocabulary. The eligibility rule
    * (day ≥ min day + 21 per type) keeps the scored window fully
    * covered so absent joins mean "weekday was silent", not "before
    * history began".
    */
  def seasonalNaiveForecast(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val firstDay = daily.groupBy("event_type").agg(min("day").as("d0"))
    def back(k: Int): DataFrame =
      daily.select(
        col("event_type"),
        date_add(col("day"), 7 * k).as("day"),
        col("n_events").as(s"c$k")
      )
    daily
      .join(firstDay, "event_type")
      .where(col("day") >= date_add(col("d0"), 21))
      .join(back(1), Seq("event_type", "day"), "left")
      .join(back(2), Seq("event_type", "day"), "left")
      .join(back(3), Seq("event_type", "day"), "left")
      .select(
        col("event_type"),
        col("day"),
        col("n_events").as("actual"),
        expr("(coalesce(c1, 0L) + coalesce(c2, 0L) + coalesce(c3, 0L)) div 3").as("forecast")
      )
      .withColumn("abs_err", abs(col("actual") - col("forecast")))
  }

  /** Exact per-type value percentiles in integer milli units — the
    * histogram-cumulative formulation (lengthQuantiles' doctrine per
    * key): values quantize to floor(value·1000 + 0.5), one
    * partial-aggregated (type, value) histogram, a per-type cumulative
    * over the DISTINCT value spectrum, and the ceil-rank percentile
    * rule (smallest value whose cumulative count covers ⌈q·n/100⌉).
    * Output: (event_type, p50_milli, p90_milli, p99_milli). Unlike
    * percentile_approx this is exact AND never sorts raw rows — the
    * cumulative window runs over the value spectrum, which is bounded
    * by value cardinality, not event volume.
    */
  def valueQuantiles(events: DataFrame): DataFrame = {
    val vm = events.select(
      col("event_type"),
      expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").as("vm")
    )
    val hist = vm.groupBy("event_type", "vm").agg(count(lit(1)).as("c"))
    val tot = hist.groupBy("event_type").agg(sum("c").as("n"))
    val cum = hist
      .withColumn("cum", sum("c").over(Window.partitionBy("event_type").orderBy("vm")))
      .join(tot, "event_type")
    cum
      .groupBy("event_type")
      .agg(
        min(when(col("cum") * 100 >= col("n") * 50, col("vm"))).as("p50_milli"),
        min(when(col("cum") * 100 >= col("n") * 90, col("vm"))).as("p90_milli"),
        min(when(col("cum") * 100 >= col("n") * 99, col("vm"))).as("p99_milli")
      )
  }

  def seasonality(events: DataFrame): DataFrame = {
    val d = events
      .groupBy(col("event_type"), (dayofweek(col("ts")) - 1).cast("long").as("dow"))
      .agg(count(lit(1)).as("n_events"))
    val totals = d.groupBy("event_type").agg(sum(col("n_events")).as("total"))
    d.join(totals, "event_type")
      .select(
        col("event_type"),
        col("dow"),
        col("n_events"),
        expr("CAST((CAST(n_events AS DECIMAL(38,0)) * 1000) DIV total AS BIGINT)")
          .as("permille")
      )
  }

  /** Hour-of-day traffic profile per event type — [[seasonality]]'s
    * finer-grained sibling over 24 UTC hours (the diurnal curve
    * capacity planning and rate-limit baselines read; dow answers
    * "which day", hour answers "when to schedule the batch window").
    * Output: (event_type, hour, n_events, permille of the type's
    * total), permille DECIMAL-widened.
    *
    * Shape at scale: one partial-aggregated data-sized exchange;
    * everything after runs over (types × 24).
    */
  def hourlyProfile(events: DataFrame): DataFrame = {
    val d = events
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val totals = d.groupBy("event_type").agg(sum(col("n_events")).as("total"))
    d.join(totals, "event_type")
      .select(
        col("event_type"),
        col("hour"),
        col("n_events"),
        expr("CAST((CAST(n_events AS DECIMAL(38,0)) * 1000) DIV total AS BIGINT)")
          .as("permille")
      )
  }

  /** Per-type inter-arrival profile — for each event type, the gap (in
    * whole seconds) between consecutive events of the same
    * (user, type) stream, rolled up to (n_gaps, med_gap_s,
    * mean_gap_milli, max_gap_s): the cadence table rate-limiters,
    * TTL choices and debounce thresholds are sized from.
    *
    * Shape at scale: the gaps come from the same per-(user, type)
    * lag window sessionization uses (small partitions — one user's
    * stream each); the EXACT median then comes from a (type, gap)
    * HISTOGRAM — gaps land on whole seconds, so the histogram is
    * bounded by types × the retention window, and the cumulative-count
    * window that selects the lower median runs over that bounded table,
    * never an event-sized per-type sort. Sums widen to DECIMAL(38,0).
    */
  def interArrival(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy(col("ts"), col("event_id"))
    val gaps = events
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(
        col("event_type"),
        // microsecond-exact difference floored to whole seconds —
        // unix_timestamp would truncate each ENDPOINT to seconds first
        // and disagree with the oracle on sub-second timestamps. The
        // NTZ→TIMESTAMP casts apply the same session-zone offset to
        // both endpoints, so it cancels in the difference.
        expr(
          "(unix_micros(CAST(ts AS TIMESTAMP)) - unix_micros(CAST(prev AS TIMESTAMP))) div 1000000"
        ).as("gap_s")
      )
    val hist = gaps.groupBy("event_type", "gap_s").agg(count(lit(1)).as("n"))
    val totals = hist
      .groupBy("event_type")
      .agg(
        sum(col("n")).as("n_gaps"),
        max(col("gap_s")).as("max_gap_s"),
        expr(
          "CAST((sum(CAST(gap_s AS DECIMAL(38,0)) * n) * 1000) DIV sum(n) AS BIGINT)"
        ).as("mean_gap_milli")
      )
    val wc = Window.partitionBy("event_type").orderBy(col("gap_s"))
    val med = hist
      .withColumn("cum", sum(col("n")).over(wc))
      .join(totals.select(col("event_type"), col("n_gaps")), "event_type")
      .where(col("cum") >= expr("(n_gaps + 1) div 2"))
      .groupBy("event_type")
      .agg(min(col("gap_s")).as("med_gap_s"))
    totals
      .join(med, "event_type")
      .select("event_type", "n_gaps", "med_gap_s", "mean_gap_milli", "max_gap_s")
  }

  /** Stream-static enrichment: join a live event stream against a
    * static dimension table (event_type → attributes) — the standard
    * streaming lookup-join. The static side is broadcast per
    * micro-batch (Spark re-plans it each batch, so a refreshed
    * dimension snapshot is picked up without restarting the query);
    * works identically on batch frames, which is what the parity test
    * asserts. Left join: unknown event types pass through with NULL
    * attributes rather than being dropped mid-stream.
    */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("event_type"), "left")

  /** Telemetry debounce — drop an event when the immediately previous
    * event of the same (user, type) is within `gapSeconds` (the
    * duplicate-ping suppression rule collectors apply; deliberately
    * NON-chained — each drop looks only at its direct predecessor, so
    * the rule is order-independent per row and exactly SQL-expressible
    * on both engines). Output: the surviving events.
    *
    * Shape at scale: one exchange keyed by (user, type) + one lag
    * window per partition; a per-row filter after — no joins.
    */
  def debounce(events: DataFrame, gapSeconds: Long = 300): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .where(
        col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSeconds
      )
      .select("event_id", "user_id", "event_type", "ts")
  }

  /** Per-user event-transition matrix — the first-order Markov table a
    * product-analytics or next-event-prediction job estimates: for every
    * ordered pair of consecutive events of the SAME user (by ts, event_id
    * tiebreak), the transition count and integer conditional probability
    * p(next | current) in milli. Output:
    * (event_type, next_type, cnt, p_cond_milli).
    *
    * Shape at scale: ONE exchange keyed by user for the lead window
    * (per-user partitions — millions of small sorts, never global),
    * then a partial-aggregated count on the tiny (type, type) key; the
    * per-head marginal re-aggregates the already-tiny transition table.
    */
  def transitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = events
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy("event_type", "next_type")
      .agg(count(lit(1)).as("cnt"))
    val heads = pairs.groupBy("event_type").agg(sum("cnt").as("head_cnt"))
    pairs
      .join(heads, "event_type")
      .select(
        col("event_type"),
        col("next_type"),
        col("cnt"),
        expr("(1000 * cnt) div head_cnt").as("p_cond_milli")
      )
  }

  /** Longest consecutive-day activity streak per user — the classic
    * gaps-and-islands metric an engagement dashboard reports: per
    * user, their active-day count, longest run of consecutive days,
    * and the day that run started. Islands via the standard trick:
    * day − row_number() over per-user day order is CONSTANT within a
    * consecutive run, so a (user, anchor) aggregate isolates runs
    * without self-joins. Ties in streak length resolve to the
    * earliest start (min over (−len, start)). Output:
    * (user_id, n_days, best_streak, best_start).
    *
    * Shape at scale: ONE distinct (user, day) exchange feeds the
    * per-user window AND both same-key aggregates (the hash
    * partitioning is reused — no further Exchange); window partitions
    * are bounded by a user's active days, never event volume.
    */
  def streaks(events: DataFrame): DataFrame = {
    activeDays(events)
      .withColumn("anchor", expr("date_sub(day, CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INT))"))
      .groupBy("user_id", "anchor")
      .agg(count(lit(1)).as("len"), min(col("day")).as("start"))
      .groupBy("user_id")
      .agg(
        sum(col("len")).as("n_days"),
        min(struct((-col("len")).as("nl"), col("start"))).as("m")
      )
      .select(
        col("user_id"),
        col("n_days"),
        (-col("m.nl")).as("best_streak"),
        col("m.start").as("best_start")
      )
  }

  /** Rolling engagement: per calendar day, the exact distinct actives
    * that day (DAU), over the trailing 7 days (WAU), and the
    * stickiness ratio 1000·dau div wau — the growth metric pair next
    * to [[lifecycle]]. Exact distinct-over-sliding-window via the
    * standard cover explode: each (user, day) activity contributes
    * membership to the 7 window END days it falls inside, then one
    * count-distinct per (end day). Days with no activity in the
    * window never appear. Output: (day, dau, wau, stickiness_permille).
    *
    * Shape at scale: the distinct (user, day) exchange, a constant ×7
    * row-local explode (never data²), and one partial-aggregated
    * day-keyed count-distinct (Spark plans it as two-level Expand —
    * bounded by days × users). No self-joins, no window over the raw
    * event stream.
    */
  def dauWau(events: DataFrame): DataFrame = {
    // staged: the distinct activity table feeds the cover explode AND
    // the same-day aggregate — unstaged it would scan events twice
    val act = graft.util.Materialize.stage(activeDays(events))
    val covered = act.select(
      col("user_id"),
      col("day"),
      explode(expr("sequence(day, date_add(day, 6))")).as("end_day")
    )
    val wau = covered
      .groupBy(col("end_day").as("day"))
      .agg(countDistinct(col("user_id")).as("wau"))
    val dau = act.groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
    // inner join: only days with same-day activity are reported (the
    // dashboard convention — trailing-window-only days would show the
    // corpus tail 6 extra times)
    dau
      .join(wau, "day")
      .select(
        col("day"),
        col("dau"),
        col("wau"),
        expr("(1000 * dau) div wau").as("stickiness_permille")
      )
  }

  /** Mergeable per-day distinct-actives sketch — the HLL-shape register
    * table that replaces [[dauWau]]'s exact count-distinct at 100 TB:
    * each (day, user) routes to one of 64 buckets by its md5 low byte
    * and contributes its leading-zero rank; registers merge by MAX, so
    * per-shard register tables union into the corpus table without
    * re-touching events (the same register algebra as the text-side
    * distinctSketch, keyed by day instead of source). Output:
    * (day, bucket, max_rank), ≤ 64 rows per day.
    *
    * Shape at scale: one scan, a codegen'd projection, and ONE
    * partial-aggregated exchange on the tiny (day, bucket) key — the
    * max combines map-side, so a billion-event day still moves ≤ 64
    * rows per partition.
    */
  def uniquesSketch(events: DataFrame): DataFrame =
    events
      .select(
        to_date(col("ts")).as("day"),
        md5(col("user_id").cast("string")).as("h")
      )
      .select(
        col("day"),
        pmod(conv(substring(col("h"), 1, 2), 16, 10).cast("long"), lit(64L)).as("bucket"),
        (length(regexp_extract(substring(col("h"), 3, 16), "^(0*)", 1)) + lit(1))
          .cast("long")
          .as("rank")
      )
      .groupBy("day", "bucket")
      .agg(max("rank").as("max_rank"))

  /** Third-order event-sequence mining: counts of every observed
    * 3-step (type → type → type) path in per-user time order, with the
    * conditional probability of the third step GIVEN the leading pair
    * in integer milli — the path-discovery table behind funnel design
    * (the 2-step [[transitions]] matrix cannot distinguish
    * view→cart→purchase from view→cart→abandon). Output:
    * (t1, t2, t3, cnt, p_cond_milli).
    *
    * Shape at scale: the identical single window pass as transitions —
    * ONE exchange on user_id, one sort, two lead() reads from the same
    * frame (Spark plans one Window operator), then a types³-bounded
    * aggregate; the pair-marginal join is AQE-broadcast.
    */
  def trigrams(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val tri = events
      .select(
        col("event_type").as("t1"),
        lead(col("event_type"), 1).over(w).as("t2"),
        lead(col("event_type"), 2).over(w).as("t3")
      )
      .where(col("t3").isNotNull)
      .groupBy("t1", "t2", "t3")
      .agg(count(lit(1)).as("cnt"))
    val heads = tri.groupBy("t1", "t2").agg(sum("cnt").as("head_cnt"))
    tri
      .join(heads, Seq("t1", "t2"))
      .select(
        col("t1"),
        col("t2"),
        col("t3"),
        col("cnt"),
        expr("(1000 * cnt) div head_cnt").as("p_cond_milli")
      )
  }

  /** Schema-on-read parsing of the semi-structured `props` JSON column:
    * the integer `k` field is pulled with a codegen'd JSON-path
    * expression (get_json_object — a one-field probe never pays
    * from_json's full-schema row materialization), then exact integer
    * stats per event_type. Output:
    * (event_type, n, sum_k, min_k, max_k, avg_k_milli).
    *
    * Shape at scale: extraction is a per-row projection inside the
    * scan; the aggregate is one partial-aggregated exchange on the
    * tiny event_type key. Unparseable or absent fields become NULLs
    * and are excluded from the stats by the explicit filter — the
    * rule both engines share.
    */
  def propsStats(events: DataFrame): DataFrame =
    events
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k")
      )
      .where(col("k").isNotNull)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k")
      )
      .withColumn("avg_k_milli", expr("(1000 * sum_k) div n"))

  /** Sessionization: per-user event runs split where the gap to the
    * previous event exceeds `gapMinutes` (the classic 30-minute web
    * session rule), rolled up to one row per session — (user_id,
    * session_seq, n_events, start/end ts, duration). Timestamps compare
    * in whole epoch seconds (unix_timestamp ≡ floor(epoch(ts)) in the
    * oracle), and ties order by event_id, so the session boundaries are
    * a total-order fact, not an engine artifact.
    *
    * Scale shape: ONE exchange on user_id feeds both windows (lag and
    * the running break-sum share the same partitioning and ordering —
    * Catalyst plans a single Sort+Window pair) and the session rollup
    * partial-aggregates on (user_id, session_seq), which is
    * co-partitioned with the window so no second shuffle. Per-user
    * partitions are the natural unit — millions of small groups, never
    * a global sort.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapSec = gapMinutes * 60L
    events
      .select(col("user_id"), col("event_id"), col("ts"), unix_timestamp(col("ts")).as("sec"))
      .withColumn("prev", lag(col("sec"), 1).over(byUser))
      .withColumn(
        "brk",
        when(col("prev").isNull || col("sec") - col("prev") > gapSec, 1L).otherwise(0L)
      )
      .withColumn("session_seq", sum("brk").over(byUser))
      .groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts").as("start_ts"),
        max("ts").as("end_ts"),
        (max("sec") - min("sec")).as("duration_sec")
      )
  }

  final case class SessionEvent(user_id: Long, event_id: Long, ts: Timestamp)

  /** Raw-millisecond bounds: the batch sessionize emits the ORIGINAL
    * min/max timestamps (sub-second parts intact) while gap and
    * duration use floored seconds — the state carries ms so both
    * facts reproduce exactly (floor is monotone, so the min/max of
    * floored seconds is the floor of the min/max ms).
    */
  final case class SessionState(startMs: Long, endMs: Long, n: Long)
  final case class SessionOut(
      user_id: Long,
      n_events: Long,
      start_ts: Timestamp,
      end_ts: Timestamp,
      duration_sec: Long
  )

  /** Streaming sessionization — the canonical stateful
    * flatMapGroupsWithState shape: per user, an OPEN session lives in
    * GroupState; an in-gap event extends it, an over-gap event closes
    * and emits it, and the event-time timeout (watermark passing
    * end + gap) closes sessions no later event will ever extend — so
    * every session emits exactly once, with state bounded per active
    * user, never by stream age. Same session rule as the batch
    * [[sessionize]] (seconds-floored timestamps, gap strictly
    * greater-than); StreamingSpec asserts the emitted sessions equal
    * the batch rows when the stream is replayed in order and flushed
    * by a watermark advance. Cross-batch out-of-order events inside
    * the late bound extend the open session best-effort (max end,
    * min start) — the declared streaming semantics.
    */
  def sessionizeStreaming(
      events: Dataset[SessionEvent],
      gapMinutes: Int = 30,
      lateBound: String = "1 minute"
  ): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapSec = gapMinutes * 60L
    events
      .withWatermark("ts", lateBound)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()
      ) { (uid, rows, state: GroupState[SessionState]) =>
        def emit(s: SessionState): SessionOut =
          SessionOut(
            uid,
            s.n,
            new Timestamp(s.startMs),
            new Timestamp(s.endMs),
            // duration on floored seconds, matching the batch rule
            math.floorDiv(s.endMs, 1000L) - math.floorDiv(s.startMs, 1000L)
          )
        if (state.hasTimedOut) {
          val closed = emit(state.get)
          state.remove()
          Iterator.single(closed)
        } else {
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var open = state.getOption
          sorted.foreach { e =>
            val ms = e.ts.getTime
            open = open match {
              case None => Some(SessionState(ms, ms, 1L))
              case Some(o) if math.floorDiv(ms, 1000L) - math.floorDiv(o.endMs, 1000L) > gapSec =>
                out += emit(o)
                Some(SessionState(ms, ms, 1L))
              case Some(o) =>
                Some(SessionState(math.min(o.startMs, ms), math.max(o.endMs, ms), o.n + 1L))
            }
          }
          open.foreach { o =>
            state.update(o)
            state.setTimeoutTimestamp(o.endMs, s"$gapMinutes minutes")
          }
          out.iterator
        }
      }
  }

  /** Funnel analysis: how many users progress through the ordered
    * `steps` event-type sequence — a user reaches step k when an event
    * of that type occurs at-or-after their earliest step-(k-1) reach
    * time. Output one row per step: (stage, event_type, n_users,
    * retained_milli vs stage 1).
    *
    * Scale shape: stage k is one filtered equi-join on user_id against
    * the O(users) stage-(k-1) reach table plus a min-aggregate — the
    * reach tables shrink monotonically, and AQE broadcasts them once
    * they fit. The final report is a union of single-row aggregates
    * joined to the stage-1 count; no collect, no window over data.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // each reach table feeds BOTH the next stage and its own count, and
    // the counts union is consumed twice below — staged, so stage k is
    // computed once, not re-derived O(steps²) times from raw events
    val reaches = steps.tail.scanLeft(
      graft.util.Materialize.stage(
        events.where(col("event_type") === steps.head)
          .groupBy("user_id").agg(min("ts").as("t"))
      )
    ) { (prev, step) =>
      graft.util.Materialize.stage(
        events.where(col("event_type") === step).as("e")
          .join(prev.select(col("user_id"), col("t").as("pt")), "user_id")
          .where(col("ts") >= col("pt"))
          .groupBy("user_id").agg(min("ts").as("t"))
      )
    }
    val counts = graft.util.Materialize.stage(
      reaches.zip(steps).zipWithIndex.map { case ((df, step), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1L).as("stage"), lit(step).as("event_type"), col("n_users"))
      }.reduce(_ union _)
    )
    val first = counts.where(col("stage") === 1L).select(col("n_users").as("n1"))
    counts.crossJoin(first)
      .select(
        col("stage"),
        col("event_type"),
        col("n_users"),
        // zero guard: an empty first stage must yield 0-retention rows,
        // not an ANSI DIVIDE_BY_ZERO (rule mirrored in the oracle)
        expr("CASE WHEN n1 = 0 THEN 0L ELSE (1000 * n_users) div n1 END").as("retained_milli")
      )
  }

  /** Cohort retention: users grouped by the DATE of their first event;
    * for each (cohort_date, day_offset) the distinct users active that
    * many days later. The classic retention triangle.
    *
    * Scale shape: one exchange on user_id for the first-event aggregate,
    * one join back (AQE broadcasts the O(users) cohort table when it
    * fits, shuffles on user_id otherwise), and one partial-aggregated
    * count_distinct exchange on (cohort_date, day_offset).
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val firsts = events.groupBy("user_id").agg(min("ts").as("first_ts"))
    events.join(firsts, "user_id")
      .select(
        col("user_id"),
        to_date(col("first_ts")).as("cohort_date"),
        datediff(to_date(col("ts")), to_date(col("first_ts"))).cast("long").as("day_offset")
      )
      .groupBy("cohort_date", "day_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Aggregate day-N retention curve — [[cohortRetention]]'s triangle
    * folded to the single curve a dashboard headline shows: for every
    * day offset d, the distinct users active d days after their first
    * day, divided by the users ELIGIBLE to be observed at d (cohort
    * start at least d days before the corpus's last day — without the
    * eligibility denominator the curve's tail is survivorship noise).
    * Output: (day_offset, n_active, n_eligible, retention_permille).
    *
    * Shape at scale: the per-user first-day aggregate and ONE distinct
    * (user, offset) exchange; the eligibility denominator comes from a
    * horizon HISTOGRAM (bounded by calendar days) suffix-summed over a
    * ≤ 2×days spine — never a per-offset scan of users.
    */
  def retentionCurve(events: DataFrame): DataFrame = {
    val firsts = graft.util.Materialize.stage(
      events.groupBy("user_id").agg(min(to_date(col("ts"))).as("cohort_date"))
    )
    val maxDay = events.agg(max(to_date(col("ts"))).as("max_day"))
    val act = activeDays(events)
      .join(firsts, "user_id")
      .select(col("user_id"), datediff(col("day"), col("cohort_date")).cast("long").as("d"))
      .distinct()
      .groupBy(col("d").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
    val hh = firsts
      .crossJoin(maxDay)
      .select(datediff(col("max_day"), col("cohort_date")).cast("long").as("h"))
      .groupBy("h")
      .agg(count(lit(1)).as("c"))
    val spine = act.select(col("day_offset").as("k"))
      .union(hh.select(col("h").as("k")))
      .distinct()
    val wSuffix = Window.orderBy(col("k").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = spine
      .join(hh, col("k") === col("h"), "left")
      .select(col("k"), coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("n_eligible", sum(col("c")).over(wSuffix))
    act
      .join(cum, col("day_offset") === col("k"))
      .select(
        col("day_offset"),
        col("n_active"),
        col("n_eligible"),
        expr("(1000 * n_active) div n_eligible").as("retention_permille")
      )
  }

  /** The distinct (user_id, day) activity table — the ONE definition
    * behind [[lifecycle]], [[streaks]] and [[dauWau]] (each was
    * rebuilding it; one rule means one notion of "active day").
    */
  private def activeDays(events: DataFrame): DataFrame =
    events.select(col("user_id"), to_date(col("ts")).as("day")).distinct()

  /** Growth-accounting lifecycle table: for every calendar day, how
    * many users were `new` (first-ever active day), `retained` (active
    * within `gapDays` of their previous active day), `resurrected`
    * (active after a gap longer than `gapDays`) or `churned` (counted
    * the day AFTER their last activity, once the gap is confirmed —
    * either they came back later, or `gapDays` have elapsed before the
    * corpus's last day, so end-of-data is never misread as churn). The
    * standard DAU decomposition a growth dashboard reads. Output:
    * (day, status, n_users).
    *
    * Shape at scale: ONE distinct (user, day) exchange and ONE per-user
    * lag/lead window (partitions bounded by calendar days, never event
    * volume) produce BOTH the activity status and the confirmed-churn
    * entry via an array-explode — a union of two windowed branches
    * would plan the scan+distinct+sort subtree twice. The corpus
    * max-day is a 1-row broadcast (the same scalar crossJoin pattern
    * as kg_stats).
    */
  def lifecycle(events: DataFrame, gapDays: Int = 7): DataFrame = {
    val act = activeDays(events)
    val w = Window.partitionBy("user_id").orderBy("day")
    val maxDay = events.agg(max(to_date(col("ts"))).as("max_day"))
    val status = when(col("prev").isNull, lit("new"))
      .when(datediff(col("day"), col("prev")) > gapDays, lit("resurrected"))
      .otherwise(lit("retained"))
    val churnConfirmed =
      (col("nxt").isNotNull && datediff(col("nxt"), col("day")) > gapDays) ||
        (col("nxt").isNull && datediff(col("max_day"), col("day")) >= gapDays)
    act
      .withColumn("prev", lag(col("day"), 1).over(w))
      .withColumn("nxt", lead(col("day"), 1).over(w))
      .crossJoin(maxDay)
      .select(
        explode(filter(
          array(
            struct(col("day").as("day"), status.as("status")),
            struct(
              date_add(col("day"), 1).as("day"),
              when(churnConfirmed, lit("churned")).as("status")
            )
          ),
          e => e.getField("status").isNotNull
        )).as("e")
      )
      .select(col("e.day").as("day"), col("e.status").as("status"))
      .groupBy("day", "status")
      .agg(count(lit(1)).as("n_users"))
  }

  /** RFM segmentation — per user: Recency (days from last activity to
    * the corpus's last day), Frequency (event count), Monetary
    * (purchase value in exact milli units), each mapped to a quartile
    * score 1..4 (4 = best: most recent / most active / highest spend).
    * The standard user-value grid a lifecycle-marketing or sampling
    * pipeline reads. Quartile rule shared with the oracle:
    * q = ceil(4·cum/n) over the user's BUCKET, where recency buckets
    * by exact day, and frequency/monetary by log2 (length(bin(v)); 0
    * stays 0) — the unbounded dimensions never build a
    * distinct-value-per-user histogram, so the rank table stays ≤ 64
    * rows regardless of corpus size. r_score inverts its quartile
    * (recent = small recency = high score).
    * Output: (user_id, recency_days, frequency, monetary_milli,
    * r_score, f_score, m_score).
    *
    * Shape at scale: ONE user-keyed partial-aggregated exchange builds
    * the per-user table (staged once — it feeds three histogram builds
    * and the final probe); the three cumulative tables are tiny
    * (≤ n_days / ≤ 64 / ≤ 64 rows) and join back AQE-broadcast; the
    * corpus max-day is the usual 1-row crossJoin scalar. No global
    * window ever runs over users.
    */
  def rfm(events: DataFrame): DataFrame = {
    val maxDay = events.agg(max(to_date(col("ts"))).as("max_day"))
    val per = graft.util.Materialize.stage(
      events
        .groupBy("user_id")
        .agg(
          max(to_date(col("ts"))).as("last_day"),
          count(lit(1)).as("frequency"),
          sum(
            when(
              col("event_type") === "purchase",
              expr("CAST(floor(CAST(value AS DOUBLE) * 1000 + 0.5) AS BIGINT)")
            ).otherwise(0L)
          ).as("monetary_milli")
        )
        .crossJoin(maxDay)
        .select(
          col("user_id"),
          datediff(col("max_day"), col("last_day")).cast("long").as("recency_days"),
          col("frequency"),
          col("monetary_milli")
        )
        .withColumn("rb", col("recency_days"))
        .withColumn("fb", length(bin(col("frequency"))).cast("long"))
        .withColumn(
          "mb",
          when(col("monetary_milli") === 0L, 0L)
            .otherwise(length(bin(col("monetary_milli"))).cast("long"))
        )
    )
    // user total as a 1-row crossJoin scalar (the max_day pattern) —
    // never a driver-side count(), which would run an eager job at
    // plan-construction time and bake a stale literal into the plan
    val nRow = per.agg(count(lit(1)).as("n"))
    def cumTable(bucket: String): DataFrame =
      per
        .groupBy(bucket)
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum("c").over(Window.orderBy(col(bucket))))
        .crossJoin(nRow)
        .select(col(bucket), expr("(4 * cum + n - 1) div n").as(s"q_$bucket"))
    per
      .join(cumTable("rb"), "rb")
      .join(cumTable("fb"), "fb")
      .join(cumTable("mb"), "mb")
      .select(
        col("user_id"),
        col("recency_days"),
        col("frequency"),
        col("monetary_milli"),
        (lit(5L) - col("q_rb")).as("r_score"),
        col("q_fb").as("f_score"),
        col("q_mb").as("m_score")
      )
  }

  /** First-touch attribution — each purchase credited to the user's
    * FIRST view at-or-before it, with the number of preceding views
    * (the touch count) alongside: the complement of the as-of join's
    * last-touch rule, and the other half of any attribution report.
    * Ties at the same timestamp resolve by the same total order as
    * asofJoin: (ts, side, event_id) with views (side 0) before
    * purchases (side 1). Output:
    * (probe_id, user_id, first_touch_id, n_touches).
    *
    * Shape at scale: the identical union-and-window merge as
    * ops.Temporal.asofJoin — ONE exchange on user_id, one sort, a
    * running min-struct (first non-null view) plus a running count;
    * no join operator, so no time-range blow-up, and window
    * partitions are bounded per user.
    */
  def attribution(events: DataFrame): DataFrame = {
    val t = events
      .where(col("event_type").isin("purchase", "view"))
      .select(
        col("user_id"),
        col("ts"),
        col("event_id"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("side"),
        when(col("event_type") === "view", col("event_id")).as("v_id")
      )
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.select(
      col("event_id").as("probe_id"),
      col("user_id"),
      first(col("v_id"), ignoreNulls = true).over(w).as("first_touch_id"),
      count(col("v_id")).over(w).as("n_touches"),
      col("side")
    ).where(col("side") === 1)
      .drop("side")
  }

  /** Power-user curve: log2-bucketed events-per-user histogram — the
    * activity analogue of the KG degree distribution, the one-glance
    * answer to "is engagement heavy-tailed, and how fat is the tail".
    * Output: (bucket, lo, n_users) where bucket = floor(log2(count))
    * and lo = 2^bucket, its smallest member.
    *
    * Shape at scale: one user-keyed partial-aggregated exchange, then
    * a ≤ 64-key aggregate — the same two-level shape as
    * kg_degree_dist; nothing is ever globally sorted.
    */
  def activityHistogram(events: DataFrame): DataFrame =
    events
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"))
      .groupBy((length(bin(col("n"))) - 1).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_users"))
      .select(
        col("bucket"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))").as("lo"),
        col("n_users")
      )

  /** Stream-stream bounded-range join — Structured Streaming's
    * canonical hard case: probe and target events arrive as (possibly
    * the same) unbounded streams; emit (probe, target) pairs whose
    * target falls in [probe, probe + horizon). Same pair rule as the
    * batch `ops.Temporal.rangeJoin` (StreamingSpec asserts set
    * equality): timestamps are truncated to whole seconds BEFORE the
    * join so the half-open boundary is the engine-independent
    * epoch-second fact, not a subsecond artifact.
    *
    * Scale shape: watermarks on BOTH event-time columns plus the
    * time-interval join condition let Spark evict state — each side
    * retains only `watermark + horizon` of history per key, so state is
    * bounded by stream rate, never by stream age. The join itself is
    * the streaming symmetric hash join on user_id.
    */
  def rangeJoinStreaming(
      events: DataFrame,
      probeType: String = "signup",
      targetType: String = "purchase",
      horizonMinutes: Int = 60,
      watermark: String = "2 hours"
  ): DataFrame = {
    val probes = events
      .where(col("event_type") === probeType)
      .select(
        col("user_id"),
        col("event_id").as("probe_id"),
        date_trunc("second", col("ts")).as("s_ts")
      )
      .withWatermark("s_ts", watermark)
    val targets = events
      .where(col("event_type") === targetType)
      .select(
        col("user_id").as("t_user_id"),
        col("event_id").as("target_id"),
        date_trunc("second", col("ts")).as("p_ts")
      )
      .withWatermark("p_ts", watermark)
    probes
      .join(
        targets,
        col("user_id") === col("t_user_id") &&
          col("p_ts") >= col("s_ts") &&
          col("p_ts") < col("s_ts") + expr(s"INTERVAL $horizonMinutes MINUTES")
      )
      .select(
        col("probe_id"),
        col("user_id"),
        col("target_id"),
        (unix_timestamp(col("p_ts")) - unix_timestamp(col("s_ts"))).as("lag_sec")
      )
  }

  /** Typed input row for [[asofJoinStreaming]]: side 0 = quote,
    * 1 = probe; q_milli is the quantized value (meaningful on quotes).
    */
  final case class AsofEvent(user_id: Long, nano_key: Long, event_id: Long, side: Int, q_milli: Long)

  /** Prevailing-quote state per user: latest quote by (nano_key,
    * event_id) — the same total order the batch operator sorts by.
    */
  final case class QuoteState(nano_key: Long, event_id: Long, milli: Long)

  final case class AsofOut(probe_id: Long, user_id: Long, quote_id: Option[Long], quote_milli: Option[Long])

  /** Streaming as-of enrichment — the unbounded-stream form of
    * `ops.Temporal.asofJoin`: per user, keep the latest quote seen so
    * far (one tiny fixed-size state record per key, NOT a buffer of
    * history) and stamp every probe with the prevailing quote. Within a
    * micro-batch the group's rows are processed in the batch operator's
    * exact (ts, side, event_id) total order, so single-batch results
    * are identical to `asofJoin` (StreamingSpec asserts it); across
    * batches the contract is the standard no-retraction enrichment one
    * — a quote that arrives in a later batch than a probe with a later
    * event time does not rewrite the already-emitted probe.
    *
    * Scale shape: state is O(active users) × one record; no sort or
    * join operator — the classic keyed-enrichment pattern trading exact
    * out-of-order handling for bounded state and append-only output.
    */
  def asofJoinStreaming(
      events: DataFrame,
      probeType: String = "purchase",
      quoteType: String = "view"
  ): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    val typed = events
      .where(col("event_type").isin(probeType, quoteType))
      .select(
        col("user_id").cast("long").as("user_id"),
        // epoch-second * 1e9 + nanos-in-second: the full-precision
        // event-time key as one comparable long
        (expr("CAST(floor(CAST(unix_micros(ts) AS DOUBLE) / 1000000) AS BIGINT)") * lit(1000000000L) +
          (expr("unix_micros(ts)") - expr("CAST(floor(CAST(unix_micros(ts) AS DOUBLE) / 1000000) AS BIGINT)") * lit(1000000L)) * lit(1000L)).as("nano_key"),
        col("event_id").cast("long").as("event_id"),
        when(col("event_type") === probeType, lit(1)).otherwise(lit(0)).as("side"),
        coalesce(
          expr("CAST(floor(CAST(value AS DOUBLE) * 1000 + 0.5) AS BIGINT)"),
          lit(0L)
        ).as("q_milli")
      )
      .as[AsofEvent]
    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[QuoteState, AsofOut](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      ) { case (user, rows, state: GroupState[QuoteState]) =>
        val sorted = rows.toIndexedSeq.sortBy(e => (e.nano_key, e.side, e.event_id))
        var cur = state.getOption
        val out = Vector.newBuilder[AsofOut]
        sorted.foreach { e =>
          if (e.side == 0) {
            if (cur.forall(c => e.nano_key > c.nano_key || (e.nano_key == c.nano_key && e.event_id > c.event_id)))
              cur = Some(QuoteState(e.nano_key, e.event_id, e.q_milli))
          } else {
            out += AsofOut(e.event_id, user, cur.map(_.event_id), cur.map(_.milli))
          }
        }
        cur.foreach(state.update)
        out.result().iterator
      }
  }

  /** Stateful streaming distinct: emits a triple the first time its
    * (s, p, o) key is seen; state = one boolean per key, no timeout
    * (graph memory is append-forever, like the MCP store).
    */
  def newTriples(triples: Dataset[Triple]): Dataset[Triple] = {
    import triples.sparkSession.implicits._
    triples
      .groupByKey(t => (t.subject, t.predicate, t.obj))
      .flatMapGroupsWithState[Boolean, Triple](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      ) { case ((s, p, o), rows, state: GroupState[Boolean]) =>
        if (state.exists) Iterator.empty
        else if (rows.hasNext) {
          state.update(true)
          Iterator.single(Triple(s, p, o))
        } else Iterator.empty
      }
  }

  /** A triple sighting carrying its event time, for the bounded-state
    * streaming distinct below.
    */
  final case class SightedTriple(subject: String, predicate: String, obj: String, ts: Timestamp)

  /** Bounded-state variant of [[newTriples]] for truly unbounded
    * streams: a key's "seen" state expires once the event-time
    * watermark passes (last sighting + ttl), so the state store holds
    * only the keys active inside the TTL horizon instead of every key
    * ever seen — at 10^12-key scale, forever-state is not a plan. The
    * documented tradeoff: a triple re-appearing after its state expired
    * is emitted again (downstream consumers idempotently MERGE into the
    * store, so duplicates across expiry horizons are harmless — the
    * same contract as MemoryStore.addMemories' anti-join dedup).
    */
  def newTriplesExpiring(
      sightings: Dataset[SightedTriple],
      ttl: String = "10 minutes",
      lateBound: String = "1 minute"
  ): Dataset[Triple] = {
    import sightings.sparkSession.implicits._
    sightings
      .withWatermark("ts", lateBound)
      .groupByKey(t => (t.subject, t.predicate, t.obj))
      .flatMapGroupsWithState[Long, Triple](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()
      ) { case ((s, p, o), rows, state: GroupState[Long]) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          // monotone last-sighting: an in-watermark batch can arrive
          // out of order, and overwriting with ITS max would move the
          // TTL deadline backwards — expiring a key that a later-ts
          // sighting already extended
          val batchMax = rows.map(_.ts.getTime).max
          val seen = state.exists
          val lastTs = if (seen) math.max(state.get, batchMax) else batchMax
          state.update(lastTs)
          state.setTimeoutTimestamp(lastTs, ttl)
          if (seen) Iterator.empty else Iterator.single(Triple(s, p, o))
        }
      }
  }
}
