package graft

import java.sql.Timestamp
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.EventOps

// file-level so Spark can derive encoders (inner case classes can't
// get a TypeTag)
case class TpIv(key: Long, s: Timestamp, e: Timestamp, id: Long)
case class TpPt(key: Long, t: Timestamp, id: Long)

/** Property differentials for the temporal operators: randomized
  * inputs against brute-force O(n²) Scala references. The generators
  * deliberately produce same-timestamp ties (coarse time grid),
  * PRE-EPOCH timestamps (the rangeJoinOf contract claims truncating
  * `div` stays correct on negative micros — this is the test that
  * would catch a floor/truncate mixup), and caps small enough that
  * every routing combination (in-bound, over-cap, both sides) occurs.
  * Each property runs as a handful of Spark jobs over ONE generated
  * frame per (bucketSec, maxBuckets) operating point. */
class TemporalPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // time grid: 1996-01-01 (positive) and 1960-01-01 (NEGATIVE micros),
  // offsets in multiples of 300 s so ties and bucket-boundary hits occur
  private val bases = Seq(
    Timestamp.valueOf("1996-01-01 00:00:00").getTime * 1000L,
    Timestamp.valueOf("1960-01-01 00:00:00").getTime * 1000L)
  private def tsOf(baseUs: Long, stepIdx: Int): Timestamp =
    new Timestamp((baseUs + stepIdx * 300L * 1000000L) / 1000L)

  private def ivGen(baseUs: Long, n: Int): Gen[List[TpIv]] =
    Gen.listOfN(n, for {
      k <- Gen.choose(1L, 4L)
      st <- Gen.choose(0, 48)
      len <- Gen.choose(0, 24) // up to 2 h on the 300 s grid
    } yield (k, st, len)).map(_.zipWithIndex.map { case ((k, st, len), i) =>
      TpIv(k, tsOf(baseUs, st), tsOf(baseUs, st + len), 1000L + i)
    })

  private def ptGen(baseUs: Long, n: Int): Gen[List[TpPt]] =
    Gen.listOfN(n, for {
      k <- Gen.choose(1L, 4L)
      at <- Gen.choose(0, 72)
    } yield (k, at)).map(_.zipWithIndex.map { case ((k, at), i) =>
      TpPt(k, tsOf(baseUs, at), 2000L + i)
    })

  test("∀ inputs/caps: rangeJoinOf == brute force, pre-epoch included") {
    for ((baseUs, bi) <- bases.zipWithIndex;
        (bucketSec, maxBuckets) <- Seq((60L, 3), (600L, 1), (3600L, 1000))) {
      val ivs = sample(ivGen(baseUs, 25), 100 + bi)
      val pts = sample(ptGen(baseUs, 40), 200 + bi)
      val expected = (for {
        p <- pts; i <- ivs
        if i.key == p.key && !p.t.before(i.s) && !p.t.after(i.e)
      } yield (p.id, i.id)).toSet
      val got = EventOps.rangeJoinOf(
          pts.toDF("user_id", "ts", "event_id"),
          ivs.toDF("user_id", "s", "e", "iv_id"),
          Seq("user_id"), "ts", "s", "e", bucketSec, maxBuckets)
        .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("iv_id")))
      assert(got.length == got.toSet.size, // exactly-once, no dup rows
        s"dup rows at base=$bi bucket=$bucketSec cap=$maxBuckets")
      assert(got.toSet == expected,
        s"mismatch at base=$bi bucket=$bucketSec cap=$maxBuckets")
    }
  }

  test("∀ inputs/caps: intervalJoinOf == brute force, every routing combination") {
    for ((baseUs, bi) <- bases.zipWithIndex;
        (bucketSec, maxBuckets) <- Seq((60L, 3), (600L, 1), (3600L, 1000))) {
      val ls = sample(ivGen(baseUs, 20), 300 + bi)
      val rs = sample(ivGen(baseUs, 20), 400 + bi)
      val expected = (for {
        l <- ls; r <- rs
        if l.key == r.key &&
          !(if (l.s.after(r.s)) l.s else r.s)
            .after(if (l.e.before(r.e)) l.e else r.e)
      } yield (l.id, r.id)).toSet
      val got = EventOps.intervalJoinOf(
          ls.toDF("user_id", "ls", "le", "l_id"),
          rs.toDF("user_id", "rs", "re", "r_id"),
          Seq("user_id"), "ls", "le", "rs", "re", bucketSec, maxBuckets)
        .collect().map(r => (r.getAs[Long]("l_id"), r.getAs[Long]("r_id")))
      assert(got.length == got.toSet.size,
        s"dup pairs at base=$bi bucket=$bucketSec cap=$maxBuckets")
      assert(got.toSet == expected,
        s"mismatch at base=$bi bucket=$bucketSec cap=$maxBuckets")
    }
  }

  test("∀ inputs: union + idle == brute-force sweep; span identity holds") {
    for ((baseUs, bi) <- bases.zipWithIndex) {
      val ivs = sample(ivGen(baseUs, 30), 500 + bi)
      // reference sweep per key over micros
      def us(t: Timestamp) = t.getTime * 1000L
      val perKey = ivs.groupBy(_.key).map { case (k, list) =>
        val sorted = list.map(i => (us(i.s), us(i.e)))
          .sortBy(identity)
        val segs = sorted.foldLeft(List.empty[(Long, Long)]) {
          case (Nil, (s, e)) => List((s, e))
          case ((cs, ce) :: tail, (s, e)) =>
            if (s <= ce) (cs, math.max(ce, e)) :: tail
            else (s, e) :: (cs, ce) :: tail
        }.reverse
        val covered = segs.map { case (s, e) => e - s }.sum
        val gaps = segs.sliding(2).collect {
          case List((_, e1), (s2, _)) => s2 - e1 }.toList
        k -> (list.size.toLong, segs.size.toLong, covered,
          gaps.size.toLong, gaps.sum, if (gaps.isEmpty) 0L else gaps.max,
          segs.last._2 - segs.head._1)
      }
      val df = ivs.toDF("user_id", "s", "e", "iv_id").drop("iv_id")
      val union = EventOps.intervalUnionOf(df, "user_id", "s", "e")
        .collect().map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("n_intervals"), r.getAs[Long]("n_segments"),
            r.getAs[Long]("covered_us"))).toMap
      val idle = EventOps.idleGapsOf(df, "user_id", "s", "e")
        .collect().map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("n_gaps"), r.getAs[Long]("idle_us"),
            r.getAs[Long]("max_gap_us"), r.getAs[Long]("span_us"))).toMap
      perKey.foreach { case (k, (ni, ns, cov, ng, idl, mg, span)) =>
        assert(union(k) == ((ni, ns, cov)), s"union key $k base $bi")
        assert(idle(k) == ((ng, idl, mg, span)), s"idle key $k base $bi")
        assert(cov + idl == span, s"identity key $k base $bi")
      }
    }
  }

  test("∀ inputs/directions: asofJoinOf == brute force incl. tie rules and tolerance") {
    for ((baseUs, bi) <- bases.zipWithIndex;
        direction <- Seq("backward", "forward", "nearest");
        tolSec <- Seq(None, Some(900L))) {
      val refs = sample(ivGen(baseUs, 20), 600 + bi)
        .map(iv => TpPt(iv.key, iv.s, iv.id)) // reuse gen: ts grid w/ ties
      val probes = sample(ptGen(baseUs, 30), 700 + bi)
      def us(t: Timestamp) = t.getTime * 1000L
      def pick(p: TpPt): Option[Long] = {
        val mine = refs.filter(_.key == p.key)
        def inTol(gap: Long) = tolSec.forall(t => gap <= t * 1000000L)
        // backward: max ts <= probe, ties -> MAX id
        val b = mine.filter(r => us(r.t) <= us(p.t))
          .sortBy(r => (us(r.t), r.id)).lastOption
          .filter(r => inTol(us(p.t) - us(r.t)))
        // forward: min ts >= probe, ties -> MIN id
        val f = mine.filter(r => us(r.t) >= us(p.t))
          .sortBy(r => (-us(r.t), -r.id)).lastOption
          .filter(r => inTol(us(r.t) - us(p.t)))
        direction match {
          case "backward" => b.map(_.id)
          case "forward" => f.map(_.id)
          case _ => (b, f) match {
            case (Some(rb), Some(rf)) =>
              if (us(rf.t) - us(p.t) < us(p.t) - us(rb.t)) Some(rf.id)
              else Some(rb.id) // equal gaps resolve backward
            case (x, y) => x.orElse(y).map(_.id)
          }
        }
      }
      val expected = probes.map(p => p.id -> pick(p)).toMap
      val got = EventOps.asofJoinOf(
          probes.toDF("user_id", "ts", "event_id"),
          refs.map(r => (r.key, r.t, r.id, 0.0))
            .toDF("user_id", "ts", "event_id", "value"),
          "user_id", "ts", "event_id", Seq("value"), tolSec, direction)
        .collect().map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Long]("ref_event_id")).map(_.toLong))
        .toMap
      assert(got == expected, s"base=$bi dir=$direction tol=$tolSec")
    }
  }
}
