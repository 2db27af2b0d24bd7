package graft.sim

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization: encode argmin correctness, ADC arithmetic
  * parity with a driver-side replay, and top-k semantics. */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = TestSpark.table("embeddings")
  private val m = 4
  private val kCodes = 8
  private lazy val model = Pq.fit(emb, "vec_id", "embedding", m, kCodes, iters = 1)

  test("model shape: m books of kCodes centroids on the sub-dimension") {
    assert(model.m === m)
    assert(model.kCodes === kCodes)
    assert(model.subDim === 16) // fixture dim 64 / 4
    model.books.foreach(b => b.foreach(c => assert(c.length === 16)))
  }

  test("encode picks the true per-subspace argmin, ties to lower code") {
    val rows = Pq.encode(emb, "vec_id", "embedding", model)
      .join(emb.select($"vec_id", $"embedding"), "vec_id")
      .limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val codes = r.getSeq[Int](r.fieldIndex("codes"))
      val v = r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble)
      assert(codes.length === m)
      codes.zipWithIndex.foreach { case (code, s) =>
        val vs = v.slice(s * model.subDim, (s + 1) * model.subDim)
        def d(c: Array[Double]): Double = {
          val c2 = c.map(x => x * x).sum
          var dot = 0.0
          for (i <- c.indices) dot += vs(i) * c(i)
          c2 - 2.0 * dot
        }
        val best = model.books(s).zipWithIndex
          .map { case (c, i) => (d(c), i) }.min
        assert(code === best._2, s"vec ${r.getLong(0)} subspace $s")
      }
    }
  }

  test("identical vectors share codes; ADC top-1 finds the planted twin") {
    // plant an exact copy of vector 0 under a fresh id
    val v0 = emb.filter($"vec_id" === 0).select($"embedding").head.getSeq[Float](0)
    val twin = Seq((900000L, v0)).toDF("vec_id", "embedding")
    val corpus = emb.select($"vec_id", $"embedding").unionByName(twin)
    val codes = Pq.encode(corpus, "vec_id", "embedding", model)
    val c0 = codes.filter($"vec_id" === 0).head.getSeq[Int](1)
    val cT = codes.filter($"vec_id" === 900000L).head.getSeq[Int](1)
    assert(c0 === cT)
    val top = Pq.adcTopK(codes, "vec_id",
      emb.filter($"vec_id" === 0).select($"vec_id".as("qid"), $"embedding"),
      "qid", "embedding", model, k = 2).collect()
    // both copies quantize identically -> identical ad2, id ties ascending
    assert(top.map(_.getLong(1)).toSeq === Seq(0L, 900000L))
    assert(top(0).getDouble(2) === top(1).getDouble(2))
  }

  test("adcTopK distance equals the driver-side ADC replay, rank exact") {
    val queries = emb.filter($"vec_id" % 200 === 0)
      .select($"vec_id".as("qid"), $"embedding")
    val got = Pq.adcTopK(Pq.encode(emb, "vec_id", "embedding", model),
      "vec_id", queries, "qid", "embedding", model, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.nonEmpty)
    // brute-force replay on the driver
    val corpus = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def codesOf(v: Array[Double]): Array[Int] =
      (0 until m).map { s =>
        val vs = v.slice(s * model.subDim, (s + 1) * model.subDim)
        model.books(s).zipWithIndex.map { case (c, i) =>
          (c.map(x => x * x).sum - 2.0 * c.zip(vs).map(p => p._2 * p._1).sum, i)
        }.min._2
      }.toArray
    def adc(q: Array[Double], codes: Array[Int]): Double =
      (0 until m).map { s =>
        val qs = q.slice(s * model.subDim, (s + 1) * model.subDim)
        val c = model.books(s)(codes(s))
        val qq = qs.map(x => x * x).sum
        var dot = 0.0
        for (i <- c.indices) dot += qs(i) * c(i)
        c.map(x => x * x).sum - 2.0 * dot + qq
      }.sum
    val allCodes = corpus.map { case (id, v) => id -> codesOf(v) }
    queries.collect().foreach { qr =>
      val qid = qr.getLong(0)
      val q = qr.getSeq[Float](1).map(_.toDouble).toArray
      val want = allCodes.toSeq
        .map { case (id, cs) => (adc(q, cs), id) }.sorted.take(3)
      want.zipWithIndex.foreach { case ((d, id), i) =>
        val (gotId, gotD) = got((qid, i + 1L))
        assert(gotId === id, s"query $qid rank ${i + 1}")
        assert(math.abs(gotD - math.rint(d * 1e6) / 1e6) < 1e-9,
          s"query $qid rank ${i + 1} distance")
      }
    }
  }

  test("IVF-ADC: index cells are the coarse argmin; probes prune to them") {
    val iam = Pq.ivfAdcFit(emb, "vec_id", "embedding",
      nlist = 4, m = 4, kCodes = 8, iters = 1)
    val index = Pq.ivfAdcIndex(emb, "vec_id", "embedding", iam)
    // every cell is one of the coarse quantizer's
    assert(index.filter($"cell" < 0 || $"cell" >= 4).count() === 0)
    // nprobe=1: every result id must live in its query's nearest cell
    val queries = emb.filter($"vec_id" % 200 === 0)
      .select($"vec_id".as("qid"), $"embedding")
    val got = Pq.ivfAdcTopK(index, "vec_id", queries, "qid", "embedding",
      iam, nprobe = 1, k = 3)
    val cellOf = index.select($"vec_id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    def nearestCell(q: Array[Double]): Int =
      iam.coarse.zipWithIndex.map { case (c, i) =>
        var dot = 0.0
        for (j <- c.indices) dot += q(j) * c(j)
        (c.map(x => x * x).sum - 2.0 * dot, i)
      }.min._2
    val qCells = queries.collect().map(r =>
      r.getLong(0) -> nearestCell(r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    got.collect().foreach { r =>
      assert(cellOf(r.getLong(1)) === qCells(r.getLong(0)),
        s"query ${r.getLong(0)} returned id ${r.getLong(1)} outside its probed cell")
    }
  }

  test("IVF-ADC with nprobe = nlist is a full residual-ADC scan") {
    val iam = Pq.ivfAdcFit(emb, "vec_id", "embedding",
      nlist = 4, m = 4, kCodes = 8, iters = 1)
    val index = Pq.ivfAdcIndex(emb, "vec_id", "embedding", iam)
    val queries = emb.filter($"vec_id" % 250 === 0)
      .select($"vec_id".as("qid"), $"embedding")
    val got = Pq.ivfAdcTopK(index, "vec_id", queries, "qid", "embedding",
      iam, nprobe = 4, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    // driver-side replay over ALL rows (no pruning at nprobe = nlist)
    val rows = index.select($"vec_id", $"cell", $"codes").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toArray))
    queries.collect().foreach { qr =>
      val qid = qr.getLong(0)
      val q = qr.getSeq[Float](1).map(_.toDouble).toArray
      val want = rows.map { case (id, cell, codes) =>
        val qres = q.indices.map(j => q(j) - iam.coarse(cell)(j)).toArray
        val d = (0 until 4).map { s =>
          val sd = iam.pq.subDim
          val qs = qres.slice(s * sd, (s + 1) * sd)
          val c = iam.pq.books(s)(codes(s))
          var dot = 0.0
          for (j <- c.indices) dot += qs(j) * c(j)
          c.map(x => x * x).sum - 2.0 * dot + qs.map(x => x * x).sum
        }.sum
        (d, id)
      }.sorted.take(3)
      want.zipWithIndex.foreach { case ((_, id), i) =>
        assert(got((qid, i + 1L)) === id, s"query $qid rank ${i + 1}")
      }
    }
  }

  test("fit rejects empty and ragged corpora with clear errors") {
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    val e1 = intercept[IllegalArgumentException] {
      Pq.fit(empty, "id", "v", 2, 2, 1)
    }
    assert(e1.getMessage.contains("non-null"))
    val allNull = Seq((1L, null.asInstanceOf[Seq[Double]])).toDF("id", "v")
    val e2 = intercept[IllegalArgumentException] {
      Pq.fit(allNull, "id", "v", 2, 2, 1)
    }
    assert(e2.getMessage.contains("non-null"))
    val ragged = Seq((1L, Seq(1.0, 2.0, 3.0, 4.0)), (2L, Seq(1.0, 2.0)))
      .toDF("id", "v")
    val e3 = intercept[IllegalArgumentException] {
      Pq.fit(ragged, "id", "v", 2, 2, 1)
    }
    assert(e3.getMessage.contains("uniform"))
  }

  test("encode raises per-row on a ragged vector the sampled fit never saw") {
    // md5 first hex of ids 1..11 puts only {6, 9, 11} under a
    // threshold-'8' sample; make id 3 (outside) ragged: the sampled
    // fit must still succeed (it scans only the sample), and encode —
    // which slices every row — must fail loudly instead of mis-slicing
    val corpus = Seq(
      (1L, Seq(1.0, 2.0, 3.0, 4.0)), (2L, Seq(2.0, 1.0, 0.0, 5.0)),
      (3L, Seq(9.0, 9.0)), (4L, Seq(0.0, 1.0, 2.0, 3.0)),
      (5L, Seq(4.0, 4.0, 4.0, 4.0)), (6L, Seq(7.0, 1.0, 7.0, 1.0)),
      (7L, Seq(3.0, 3.0, 2.0, 2.0)), (9L, Seq(5.0, 0.0, 5.0, 0.0)),
      (11L, Seq(2.0, 6.0, 2.0, 6.0))).toDF("id", "v")
    val sampled = Pq.fitSample(corpus, "id", "v", m = 2, kCodes = 2,
      iters = 1, hexThreshold = "8")
    assert(sampled.subDim === 2)
    val e = intercept[Exception] {
      Pq.encode(corpus, "id", "v", sampled).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("ragged")),
      s"expected the per-row dimension guard to fire, got: ${messages(e)}")
    // the uniform-dimension rows still encode once the ragged row is gone
    assert(Pq.encode(corpus.filter($"id" =!= 3L), "id", "v", sampled)
      .count() === 8)
  }

  test("fitSample: full-sample threshold reproduces fit; partial sample fits on the subsample") {
    // every md5 hex digit sorts below 'g' — 100% sample ≡ full fit
    val full = Pq.fitSample(emb, "vec_id", "embedding", m, kCodes,
      iters = 1, hexThreshold = "g")
    assert(full.books.map(_.toSeq.map(_.toSeq)).toSeq ===
      model.books.map(_.toSeq.map(_.toSeq)).toSeq)
    // '8' keeps ~half the corpus; the model stays well-formed and the
    // full corpus still encodes under it
    val half = Pq.fitSample(emb, "vec_id", "embedding", m, kCodes,
      iters = 1, hexThreshold = "8")
    assert(half.m === m && half.kCodes === kCodes && half.subDim === 16)
    val n = Pq.encode(emb, "vec_id", "embedding", half).count()
    assert(n === emb.count())
  }
}
