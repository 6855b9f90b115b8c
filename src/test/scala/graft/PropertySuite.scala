package graft

import graft.functions.VectorOps
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure kernels (SURVEY §7 phase 1) — the invariants
  * the oracle-parity scheme rests on. Raw scalacheck generators driven from
  * fixed seeds (the scalatest-scalacheck bridge isn't in the offline cache).
  */
class PropertySuite extends AnyFunSuite {

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(1000L + i)))

  test("rollingHashes equals the naive per-window fold") {
    for {
      s <- samples(asciiText, 200)
      k <- samples(Gen.choose(1, 12), 3)
    } {
      val rolled = VectorOps.rollingHashes(UTF8String.fromString(s), k)
      val expect = (0 to s.length - k).map { i =>
        s.substring(i, i + k).foldLeft(0L)((acc, c) => (acc * 257 + c) % 1000000007L)
      }
      assert(rolled.toLongArray().toSeq == (if (s.length < k) Nil else expect),
        s"k=$k s=$s")
    }
  }

  test("winnowFps equals the declarative hash->window-min->distinct pipeline") {
    // reference: per-position hashes, w-window minima, distinct, sorted —
    // exactly the array_distinct(transform(.., array_min(slice(..))))
    // form the fused kernel replaced
    def reference(s: String, k: Int, w: Int, md5: Boolean): Seq[Long] = {
      val nh = s.length - k + 1
      if (nh - w + 1 <= 0) return Nil
      val hs = (0 until nh).map { p =>
        val sub = s.substring(p, p + k)
        if (md5) VectorOps.md5Prefix32(UTF8String.fromString(sub))
        else sub.foldLeft(0L)((acc, c) => (acc * 257 + c) % 1000000007L)
      }
      (0 to nh - w).map(i => hs.slice(i, i + w).min).distinct.sorted
    }
    for {
      s <- samples(asciiText, 150)
      (k, w) <- Seq((8, 4), (3, 2), (5, 5))
      md5 <- Seq(false, true)
    } {
      val fused = VectorOps
        .winnowFps(UTF8String.fromString(s), k, w, md5).toLongArray().toSeq
      assert(fused == reference(s, k, w, md5), s"k=$k w=$w md5=$md5 s=$s")
    }
  }

  test("md5Prefix32 equals the hex-prefix radix parse") {
    samples(asciiText, 300).foreach { s =>
      val native = VectorOps.md5Prefix32(UTF8String.fromString(s))
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(native == java.lang.Long.parseLong(hex.take(8), 16))
      assert(native >= 0L && native <= 0xffffffffL)
    }
  }

  test("simHash32 is token-order invariant and 32-bit bounded") {
    val tokens = Gen.listOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
    samples(tokens, 200).foreach { ts =>
      def arr(xs: Seq[String]) =
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          xs.map(UTF8String.fromString).toArray[Any])
      val h1 = VectorOps.simHash32(arr(ts))
      val h2 = VectorOps.simHash32(arr(new scala.util.Random(7).shuffle(ts)))
      assert(h1 == h2, "SimHash must depend only on the token multiset")
      assert(h1 >= 0L && h1 <= 0xffffffffL)
    }
  }

  test("ModelWire chunking: block count is exact, round-trip is lossless") {
    import graft.ml._
    val gen = for {
      len <- Gen.choose(1, 5000)
      maxP <- Gen.choose(1, 3000)
    } yield (len, maxP)
    samples(gen, 100).foreach { case (len, maxP) =>
      // LinearModel with len-1 weights + bias -> wireParams length == len
      val w = Array.tabulate(len - 1)(i => i * 0.5 - 7.0)
      val m = new LinearModel(w, 42.25)
      m.n = len.toLong; m.cumLoss = len * 0.125
      val blocks = ModelWire.chunk(m, maxP, replica = 3)
      assert(blocks.length == (len + maxP - 1) / maxP, s"len=$len maxP=$maxP")
      assert(blocks.forall(_.payload.length <= maxP))
      assert(blocks.map(_.payload.length).sum == len)
      val back = ModelWire.reassemble(blocks,
        (dim, ps) => new PAClassifier(0.1).init(dim).loadWire(ps)).head
      assert(java.util.Arrays.equals(back.wireParams, m.wireParams))
      assert(back.n == m.n && back.cumLoss == m.cumLoss)
    }
  }

  test("capShingleDf: subset of input, df bound holds, low-df shingles intact") {
    val spark = TestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val gen = for {
      nDocs <- Gen.choose(2, 30)
      nShingles <- Gen.choose(1, 15)
      cap <- Gen.choose(1, 10)
      pairs <- Gen.listOfN(80,
        Gen.zip(Gen.choose(0, nDocs - 1), Gen.choose(0, nShingles - 1)))
    } yield (cap, pairs.distinct)
    samples(gen, 15).foreach { case (cap, pairs) =>
      val sh = pairs.map { case (d, s) => (d.toLong, s"sh$s") }.toDF("doc_id", "sh")
      val capped = graft.operators.Dedup.capShingleDf(sh, cap)
        .collect().map(r => (r.getLong(r.fieldIndex("doc_id")),
          r.getString(r.fieldIndex("sh")))).toSet
      val input = pairs.map { case (d, s) => (d.toLong, s"sh$s") }.toSet
      assert(capped.subsetOf(input))
      val df = input.groupBy(_._2).view.mapValues(_.size).toMap
      val expected = input.filter { case (_, s) => df(s) <= cap }
      assert(capped == expected, s"cap=$cap")
    }
  }

  test("wire codec roundtrip preserves DataInstance fields") {
    val spark = TestSession.spark
    import spark.implicits._
    val gen = for {
      id <- Gen.choose(0L, 1000000L)
      op <- Gen.oneOf("training", "forecasting")
      num <- Gen.listOf(Gen.choose(-1000, 1000).map(_.toDouble / 8)) // exact in json
      dis <- Gen.listOf(Gen.choose(-100, 100))
      tgt <- Gen.option(Gen.choose(-100, 100).map(_.toDouble))
      if num.nonEmpty || dis.nonEmpty
    } yield (id, op, num, dis, tgt)
    val sample = samples(gen, 200).distinctBy(_._1).sortBy(_._1)
    val json = sample.map { case (id, op, num, dis, tgt) =>
      val tgtPart = tgt.map(t => s""", "target": $t""").getOrElse("")
      s"""{"id": $id, "operation": "$op", "numericalFeatures": [${num.mkString(",")}], "discreteFeatures": [${dis.mkString(",")}]$tgtPart}"""
    }
    val parsed = graft.core.Wire.toPoints(
      graft.core.Wire.parseInstances(json.toDF("value"), "value"))
      .select("id", "features", "target", "operation")
      .as[(Long, Seq[Double], Option[Double], String)]
      .collect().toSeq.sortBy(_._1)
    assert(parsed.length == sample.length)
    parsed.zip(sample).foreach { case (got, (id, op, num, dis, tgt)) =>
      assert(got._1 == id)
      assert(got._4 == op)
      assert(got._2 == num ++ dis.map(_.toDouble))
      assert(got._3 == tgt)
    }
  }
}
