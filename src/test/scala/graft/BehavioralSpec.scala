package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Behavioral

/** Hand-graph tests for the batch behavioral operators added in round
  * 7 (q172 RFM, q173 sessionization); the full-table forms are
  * oracle-exact via the driver gate. */
class BehavioralSpec extends AnyFunSuite {
  lazy val spark = SharedSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize: gap over 30 min opens a new session, stats exact") {
    val events = Seq(
      // user 1: 3 events in one session (gaps 10 min), then a 31-min
      // gap opens session 2 with a single event
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (2L, 1L, ts("2024-01-01 10:10:00")),
      (3L, 1L, ts("2024-01-01 10:20:00")),
      (4L, 1L, ts("2024-01-01 10:51:00")),
      // user 2: exactly-30-min gap does NOT split (predicate is >)
      (5L, 2L, ts("2024-01-01 09:00:00")),
      (6L, 2L, ts("2024-01-01 09:30:00"))
    ).toDF("event_id", "user_id", "ts")
    val got = Behavioral.sessionize(events, gapMinutes = 30)
      .select(col("user_id"), col("session_idx"), col("n_events"),
        col("duration_sec"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, 3L, 1200L), (1L, 2L, 1L, 0L), (2L, 1L, 2L, 1800L)))
  }

  test("sessionize ties within a timestamp stay one session via event_id") {
    val events = Seq(
      (10L, 7L, ts("2024-01-01 12:00:00")),
      (11L, 7L, ts("2024-01-01 12:00:00")))
      .toDF("event_id", "user_id", "ts")
    val got = Behavioral.sessionize(events)
      .select(col("session_idx"), col("n_events"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
  }

  test("ewma folds the hand recurrence in time order") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 10.0),
      (2L, 1L, ts("2024-01-01 11:00:00"), 20.0),
      (3L, 1L, ts("2024-01-01 12:00:00"), 30.0),
      (4L, 2L, ts("2024-01-01 10:00:00"), 5.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = Behavioral.ewma(events, alpha = 0.3)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    // s1=10; s2=0.3*20+0.7*10=13; s3=0.3*30+0.7*13=18.1
    val s3 = 0.3 * 30.0 + 0.7 * (0.3 * 20.0 + 0.7 * 10.0)
    assert(got(1L) == s3 && got(2L) == 5.0)
  }

  test("madOutliers flags only beyond k MADs, robust to the outlier itself") {
    // type A: values 1..7 plus a wild 1000 -> median 4.5, MAD ~ 2,
    // only 1000 flagged; type B tight cluster -> nothing flagged
    val a = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 1000.0).zipWithIndex
      .map { case (v, i) => (i.toLong, "A", ts("2024-01-01 10:00:00"), v) }
    val b = Seq(50.0, 51.0, 52.0).zipWithIndex
      .map { case (v, i) => (100L + i, "B", ts("2024-01-01 10:00:00"), v) }
    val events = (a ++ b).toDF("event_id", "event_type", "ts", "value")
    val got = Behavioral.madOutliers(events, k = 3.0)
      .as[(Long, String, Double, Double, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(7L))
    assert(got.head._4 == 4.5) // median of 1..7,1000
  }

  test("trendSlopes recovers an exact linear daily series") {
    // type 'up': counts 1,2,3 on consecutive days -> slope exactly 1
    val rows = (0 until 3).flatMap { d =>
      (0 to d).map(i => (d * 10L + i, "up",
        ts(f"2024-01-0${d + 1}%d 0$i%d:00:00"), 1.0))
    }
    val got = Behavioral.trendSlopes(rows
        .toDF("event_id", "event_type", "ts", "value"))
      .as[(String, Long, Double, Double)].collect()
    assert(got.length == 1)
    val (_, nDays, slope, intercept) = got.head
    assert(nDays == 3L && slope == 1.0)
    // y = x - 19722 for x = epoch day of 2024-01-01 (19723 -> y=1)
    assert(intercept == 1.0 - slope * 19723.0)
  }

  test("rfmSegments bands recency/frequency/monetary at the thresholds") {
    // user 1: 16 purchases of 50.0 on the ref-date eve -> r=1(<=3):3,
    // f=16:3, m=800.0 (>=800 boundary inclusive):3 -> segment 333
    val u1 = (1 to 16).map(i =>
      (100L + i, 1L, "purchase", ts(f"2024-01-31 10:$i%02d:00"), 50.0))
    // user 2: one old cheap purchase -> r_days=26:1, f=1:1, m:1
    val u2 = Seq((200L, 2L, "purchase", ts("2024-01-06 10:00:00"), 10.0))
    // user 3: clicks only -> no purchases, absent from the output
    val u3 = Seq((300L, 3L, "click", ts("2024-01-31 10:00:00"), 1.0))
    val events = (u1 ++ u2 ++ u3)
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Behavioral.rfmSegments(events, refDate = "2024-02-01")
      .select(col("user_id"), col("segment"), col("m"))
      .as[(Long, String, Double)].collect()
      .map { case (u, s, m) => u -> (s, m) }.toMap
    assert(got == Map(1L -> ("333", 800.0), 2L -> ("111", 10.0)))
  }

  test("rollingActiveUsers: hand corpus DAU/WAU exact, the 7-day " +
      "window includes day-6 and excludes day-7, repeat activity " +
      "counts once, and no report day trails the last observed day") {
    val ev = Seq(
      (1L, ts("2024-05-01 08:00:00")), (1L, ts("2024-05-01 09:00:00")),
      (2L, ts("2024-05-01 10:00:00")), (4L, ts("2024-05-03 10:00:00")),
      (1L, ts("2024-05-05 10:00:00")), (3L, ts("2024-05-10 10:00:00")))
      .toDF("user_id", "ts")
    val got = Behavioral.rollingActiveUsers(ev).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq == Seq(
      // 05-01: users {1,2}; window = itself
      ("2024-05-01", 2L, 2L, 1.0),
      // 05-03: dau {4}; window [04-27..05-03] = {1,2,4}
      ("2024-05-03", 1L, 3L, 1.0 / 3.0),
      // 05-05: dau {1}; window [04-29..05-05] = {1,2,4}
      ("2024-05-05", 1L, 3L, 1.0 / 3.0),
      // 05-10: dau {3}; window [05-04..05-10] = {1 (05-05), 3} —
      // user 4's 05-03 is day-7, excluded; user 1's 05-05 is day-5
      ("2024-05-10", 1L, 2L, 0.5)))

    // real corpus: wau >= dau everywhere, and wau(d) equals a direct
    // distinct count over the 7-day range replayed from (user, day)
    val t = Tables(spark, "/root/testdata/sf0.001")
    val real = Behavioral.rollingActiveUsers(t.events).collect()
    val ud = t.events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().as[(Long, java.sql.Date)].collect()
    real.foreach { r =>
      val d = r.getDate(0).toLocalDate
      val direct = ud.filter { case (_, day) =>
        val x = day.toLocalDate
        !x.isAfter(d) && !x.isBefore(d.minusDays(6))
      }.map(_._1).distinct.length
      assert(r.getLong(2) == direct.toLong && r.getLong(2) >= r.getLong(1))
    }
  }

  test("hourlyProfile: hand counts and shares are exact, the peak " +
      "tie breaks to the earliest hour, shares sum to 1 per type") {
    // type x: 2 events at 09h, 2 at 14h (tie -> peak 9), 1 at 23h
    val ev = Seq(
      ("x", ts("2024-01-01 09:10:00")), ("x", ts("2024-01-02 09:50:00")),
      ("x", ts("2024-01-01 14:00:00")), ("x", ts("2024-01-03 14:30:00")),
      ("x", ts("2024-01-01 23:59:59")),
      ("y", ts("2024-01-01 05:00:00")))
      .toDF("event_type", "ts")
    val got = Behavioral.hourlyProfile(ev).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3), r.getInt(4), r.getBoolean(5)))
      .toMap
    assert(got(("x", 9)) == ((2L, 0.4, 9, true)))
    assert(got(("x", 14)) == ((2L, 0.4, 9, false)))
    assert(got(("x", 23)) == ((1L, 0.2, 9, false)))
    assert(got(("y", 5)) == ((1L, 1.0, 5, true)))

    // real corpus: shares sum to 1 per type; exactly one peak row
    val real = Behavioral.hourlyProfile(
      Tables(spark, "/root/testdata/sf0.001").events).collect()
    real.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-9)
      assert(rs.count(_.getBoolean(5)) == 1)
    }
  }

  test("pathMotifs: hand paths count exact trigrams with support; " +
      "real-corpus support replays against the driver trigram total") {
    // u1: a,b,c,a,b -> (a,b,c),(b,c,a),(c,a,b); u2: a,b,c -> (a,b,c)
    val ev = (Seq("a", "b", "c", "a", "b").zipWithIndex.map {
      case (t, i) => (i.toLong, 1L, t, ts(f"2024-01-01 10:0$i:00"))
    } ++ Seq("a", "b", "c").zipWithIndex.map { case (t, i) =>
      (10L + i, 2L, t, ts(f"2024-01-01 11:0$i:00"))
    }).toDF("event_id", "user_id", "event_type", "ts")
    val got = Behavioral.pathMotifs(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getDouble(4)))
    assert(got.length == 3)
    assert(got(0) == (("a", "b", "c"), (2L, 0.5)))
    assert(got(1) == (("b", "c", "a"), (1L, 0.25)))
    assert(got(2) == (("c", "a", "b"), (1L, 0.25)))

    // real corpus: counts non-increasing; support is n / (driver
    // trigram total), bit-for-bit
    val t = Tables(spark, "/root/testdata/sf0.001").events
    val total = t.groupBy(col("user_id")).count()
      .select(col("count")).as[Long].collect()
      .map(c => math.max(0L, c - 2)).sum
    val real = Behavioral.pathMotifs(t).collect()
    real.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0).getLong(3) >= w(1).getLong(3))
    }
    real.foreach { r =>
      assert(r.getDouble(4) == r.getLong(3).toDouble / total.toDouble)
    }
  }

  test("gapProfile: hand gaps read the exact weighted-interpolation " +
      "quantiles; a gapless type emits no row; real-corpus gap " +
      "counts replay as events minus (user,type) pairs") {
    // u1/x: gaps 1s, 1s, 9s; u2/y: single event -> no gap row
    val ev = Seq(
      (1L, 1L, "x", ts("2024-01-01 10:00:00")),
      (2L, 1L, "x", ts("2024-01-01 10:00:01")),
      (3L, 1L, "x", ts("2024-01-01 10:00:02")),
      (4L, 1L, "x", ts("2024-01-01 10:00:11")),
      (5L, 2L, "y", ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = Behavioral.gapProfile(ev).collect()
    assert(got.length == 1 && got(0).getString(0) == "x")
    assert(got(0).getLong(1) == 3L)
    assert(got(0).getDouble(2) == 1e6)
    val d = 0.9 * 2 - 1 // the machinery's own interpolation weight
    assert(got(0).getDouble(3) == (1 - d) * 1e6 + d * 9e6)

    // real corpus: n_gaps(type) = events(type) - |(user,type) pairs|
    val t = Tables(spark, "/root/testdata/sf0.001").events
    val real = Behavioral.gapProfile(t).collect()
      .map(r => r.getString(0) -> r).toMap
    val cnts = t.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      count_distinct(col("user_id")).as("u")).collect()
    cnts.foreach { r =>
      val g = real(r.getString(0))
      assert(g.getLong(1) == r.getLong(1) - r.getLong(2))
      assert(g.getDouble(2) <= g.getDouble(3) && g.getDouble(2) > 0.0)
    }
  }

  test("growthAccounting: a hand log decomposes into exact new/" +
      "retained/resurrected/churned; the identity holds on the real " +
      "corpus and churn is never negative") {
    // Mondays: W1=01-01 W2=01-08 W3=01-15 W4=01-22
    // u1: W1,W2,W4 (new, retained, resurrected)
    // u2: W1 only (churns in W2); u3: W2,W3 (new, retained)
    val ev = Seq(
      (1L, 1L, "2024-01-02 10:00:00"), (2L, 1L, "2024-01-09 10:00:00"),
      (3L, 1L, "2024-01-24 10:00:00"),
      (4L, 2L, "2024-01-03 10:00:00"),
      (5L, 3L, "2024-01-10 10:00:00"), (6L, 3L, "2024-01-16 10:00:00"))
      .map { case (e, u, s) => (e, u, "x", ts(s)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = Behavioral.growthAccounting(ev).collect()
      .map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(got("2024-01-01") == ((2L, 2L, 0L, 0L, 0L)))
    assert(got("2024-01-08") == ((2L, 1L, 1L, 0L, 1L)))
    assert(got("2024-01-15") == ((1L, 0L, 1L, 0L, 1L)))
    assert(got("2024-01-22") == ((1L, 0L, 0L, 1L, 1L)))

    // real corpus: active = new + retained + resurrected every week;
    // the first week is all-new; churn is bounded by prev active
    val real = Behavioral.growthAccounting(
      Tables(spark, "/root/testdata/sf0.001").events)
      .collect().sortBy(_.getDate(0).getTime)
    real.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4))
      assert(r.getLong(5) >= 0L)
    }
    assert(real.head.getLong(1) == real.head.getLong(2))
  }

  test("eventConcentration: hand Lorenz [1,1,2,4] reads gini 0.3125 " +
      "and top-1% share 0.5; equal counts read 0; the real-corpus " +
      "card equals a sorted brute-force replay exactly") {
    def ev(pairs: (Long, Int)*) = pairs.flatMap { case (u, k) =>
      (1 to k).map(i => (u * 100 + i, u, "e",
        ts(f"2024-01-01 10:${i}%02d:00")))
    }.toDF("event_id", "user_id", "event_type", "ts")

    val r1 = Behavioral.eventConcentration(
      ev(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 4)).collect()(0)
    assert((r1.getLong(0), r1.getLong(1)) == ((4L, 8L)))
    assert(r1.getDouble(2) == 0.3125)
    assert(r1.getLong(3) == 1L && r1.getDouble(4) == 0.5)

    val r2 = Behavioral.eventConcentration(
      ev(1L -> 3, 2L -> 3, 3L -> 3)).collect()(0)
    assert(r2.getDouble(2) == 0.0)

    // real corpus: exact replay of the grouped algebra from the raw
    // sorted per-user counts (rank formula, integer arithmetic)
    val t = Tables(spark, "/root/testdata/sf0.001").events
    val counts = t.groupBy(col("user_id")).count()
      .select(col("count")).as[Long].collect().sorted
    val n = counts.length.toLong
    val tot = counts.sum
    val s1 = counts.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val gini = (2L * s1 - (n + 1) * tot).toDouble / (n * tot).toDouble
    val topk = (n + 99) / 100
    val topShare =
      counts.sorted(Ordering[Long].reverse).take(topk.toInt).sum.toDouble /
        tot.toDouble
    val card = Behavioral.eventConcentration(t).collect()(0)
    assert(card.getLong(0) == n && card.getLong(1) == tot)
    assert(card.getDouble(2) == gini)
    assert(card.getLong(3) == topk && card.getDouble(4) == topShare)
  }

  test("stationaryMix: an alternating two-type chain is stationary " +
      "at (0.5, 0.5); an all-out-edges-leave state drains as an " +
      "absorbing exit; real-corpus mass conserved, ratio replays") {
    // a,b,a,b,a -> P swaps a/b; uniform seed is already stationary
    val ev = Seq(
      (1L, 10L, "a", ts("2024-01-01 10:00:00")),
      (2L, 10L, "b", ts("2024-01-01 10:01:00")),
      (3L, 10L, "a", ts("2024-01-01 10:02:00")),
      (4L, 10L, "b", ts("2024-01-01 10:03:00")),
      (5L, 10L, "a", ts("2024-01-01 10:04:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = Behavioral.stationaryMix(ev).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got("a") == ((0.5, 0.6, 0.5 / 0.6)))
    assert(got("b") == ((0.5, 0.4, 1.25)))

    // x->y->z: states {x,y}; y's only out-edge leaves the state set
    // (absorbing exit) so every pi drains to 0 within the rounds
    val ev2 = Seq(
      (1L, 20L, "x", ts("2024-01-01 10:00:00")),
      (2L, 20L, "y", ts("2024-01-01 10:01:00")),
      (3L, 20L, "z", ts("2024-01-01 10:02:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got2 = Behavioral.stationaryMix(ev2).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got2 == Map("x" -> 0.0, "y" -> 0.0)) // z is not a state

    // real corpus: dense log -> mass conserved on both columns;
    // ratio is the card's own pi/share division, bit-for-bit
    val real = Behavioral.stationaryMix(
      Tables(spark, "/root/testdata/sf0.001").events).collect()
    assert(math.abs(real.map(_.getDouble(1)).sum - 1.0) < 1e-9)
    assert(math.abs(real.map(_.getDouble(2)).sum - 1.0) < 1e-9)
    real.foreach { r =>
      assert(r.getDouble(3) == r.getDouble(1) / r.getDouble(2))
    }
  }

  test("valueDriftGate: identical snapshot halves read TVD 0, a " +
      "fully shifted half reads 0.9 over exact decile buckets") {
    // type a: both parities carry values 1..10 -> same bucket masses
    // type b: ref 1..10, snap all at 100 -> snap mass lands in the
    // top bucket; TVD = 0.5 * (9*0.1 + |0.1 - 1.0|) = 0.9
    val ev =
      (0 until 10).flatMap { i =>
        Seq((i * 2L, "a", i + 1.0, ts(f"2024-01-01 10:${i}%02d:00")),
          (i * 2L + 1L, "a", i + 1.0, ts(f"2024-01-01 11:${i}%02d:00")),
          (100L + i * 2L, "b", i + 1.0, ts(f"2024-01-02 10:${i}%02d:00")),
          (101L + i * 2L, "b", 100.0, ts(f"2024-01-02 11:${i}%02d:00")))
      }.toDF("event_id", "event_type", "value", "ts")
    val got = Behavioral.valueDriftGate(ev).collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got("a") == ((10L, 10L, 0.0)))
    assert(got("b")._1 == 10L && got("b")._2 == 10L)
    assert(math.abs(got("b")._3 - 0.9) < 1e-12, got("b").toString)

    // real corpus: TVD in [0, 1], buckets bounded by the decile count
    Behavioral.valueDriftGate(Tables(spark, "/root/testdata/sf0.001")
      .events).collect().foreach { r =>
      assert(r.getLong(1) <= 10L)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0, r)
    }
  }

  test("typeAffinityLift: hand corpus lift is the exact ratio, pairs " +
      "are ordered, co-occurrence never exceeds either margin") {
    // users: 1 {A,B}, 2 {A,B}, 3 {A}, 4 {C} -> c(A)=3 c(B)=2 c(C)=1,
    // c12(A,B)=2, n=4 -> lift = 2*4 / (3*2)
    val ev = Seq(
      (1L, "A"), (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (4L, "C"))
      .zipWithIndex.map { case ((u, t), i) =>
        (i.toLong, u, t, ts("2024-01-01 10:00:00")) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = Behavioral.typeAffinityLift(ev).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == (("A", "B", 2L, 3L, 2L, 4L)))
    assert(r.getDouble(6) == 8.0 / 6.0)

    // real corpus: ordered pairs, c12 <= min(c1, c2), lift positive
    Behavioral.typeAffinityLift(Tables(spark, "/root/testdata/sf0.001")
      .events).collect().foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)))
      assert(r.getDouble(6) > 0.0)
    }
  }

  test("burstDetect: hand series enters on the hi crossing, stays " +
      "through the hysteresis band, exits below lo, and does NOT " +
      "re-enter from mid-band; real-corpus flags replay the recurrence") {
    // daily counts for one type: [1,2,1,10,3,1,2,1]
    // sorted [1,1,1,1,2,2,3,10]: hi = p90 = 3 + 0.3*7 = 5.1,
    // lo = p60 = 2.0. Expected burst flags: F F F T T F F F —
    // day5 (cnt 3, mid-band) stays in; day7 (cnt 2, mid-band after
    // the exit) stays out.
    val cnts = Seq(1, 2, 1, 10, 3, 1, 2, 1)
    val rows = cnts.zipWithIndex.flatMap { case (c, d) =>
      (1 to c).map(i => ("b", ts(f"2024-03-0${d + 1} 10:$i%02d:00")))
    }
    val got = Behavioral.burstDetect(rows.toDF("event_type", "ts"))
      .collect()
    assert(got.length == 8)
    assert(got.map(_.getLong(2)).toSeq == cnts.map(_.toLong))
    val his = got.map(_.getDouble(3)).distinct.toSeq
    assert(his.length == 1 && math.abs(his.head - 5.1) < 1e-9)
    assert(got.map(_.getDouble(4)).distinct.toSeq == Seq(2.0))
    assert(got.map(_.getBoolean(5)).toSeq ==
      Seq(false, false, false, true, true, false, false, false))

    // real corpus: the windowed closed form equals the recurrence
    // in_t = cnt>=hi || (cnt>=lo && in_{t-1}) replayed per type
    val real = Behavioral.burstDetect(Tables(spark, "/root/testdata/sf0.001")
      .events).collect()
    real.groupBy(_.getString(0)).foreach { case (_, rs) =>
      var prev = false
      rs.sortBy(_.getDate(1).toString).foreach { r =>
        val (cnt, hi, lo) = (r.getLong(2).toDouble, r.getDouble(3),
          r.getDouble(4))
        val expect = cnt >= hi || (cnt >= lo && prev)
        assert(r.getBoolean(5) == expect, s"$r")
        prev = expect
      }
    }
  }
}
