package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._

/** Property-based algebraic invariants (SURVEY §5): facts that must
  * hold for ALL inputs, not just the fixtures — union count
  * additivity, dimension-key bijectivity, rollup subtotal consistency,
  * router exhaustiveness, as-of row preservation.
  */
object AlgebraProps extends Properties("EngineAlgebra") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8) // each eval runs Spark jobs; keep bounded

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowsGen: Gen[List[(String, Int)]] =
    Gen.listOfN(40, Gen.zip(Gen.oneOf("a", "b", "c", "d", "é"), Gen.chooseNum(-5, 5)))

  property("union count additivity") = Prop.forAll(rowsGen, rowsGen) { (a, b) =>
    a.isEmpty || b.isEmpty || {
      val (da, db) = (a.toDF("k", "v"), b.toDF("k", "v"))
      da.unionByName(db).count() == a.size.toLong + b.size.toLong
    }
  }

  property("surrogate dim is bijective over distinct keys; resolve preserves rows") =
    Prop.forAll(rowsGen) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("k", "v")
        val dim = graft.etl.SurrogateKeys.dim(df, Seq("k", "v"), "id")
        val ids = dim.collect().map(_.getAs[Long]("id"))
        val nDistinct = rows.distinct.size
        val resolved = graft.etl.SurrogateKeys
          .resolve(df, dim, Seq("k", "v"), "id")
        ids.toSet == (1L to nDistinct.toLong).toSet &&
          resolved.count() == rows.size.toLong &&
          resolved.filter(col("id").isNull).count() == 0L
      }
    }

  property("rollup grand total equals sum of detail rows") =
    Prop.forAll(rowsGen) { rows =>
      rows.isEmpty || {
        val cube = rows.toDF("k", "v").rollup(col("k"))
          .agg(sum(col("v")).as("s"), grouping_id().as("g")).collect()
        val details = cube.filter(_.getAs[Long]("g") == 0L).map(_.getAs[Long]("s")).sum
        val total = cube.filter(_.getAs[Long]("g") == 1L).map(_.getAs[Long]("s")).sum
        details == total
      }
    }

  property("router branches are disjoint and exhaustive (nulls to false branch)") =
    Prop.forAll(Gen.listOfN(30, Gen.option(Gen.oneOf("entrada", "salida", "x")))) { vs =>
      vs.isEmpty || {
        val df = vs.map(Tuple1(_)).toDF("t")
        val (tBr, fBr) = graft.etl.Router.split(df, col("t") === "entrada")
        tBr.count() + fBr.count() == vs.size.toLong &&
          tBr.filter(col("t").isNull || col("t") =!= "entrada").count() == 0L
      }
    }

  property("skyline is mergeable: sky(A ∪ B) == sky(sky(A) ∪ sky(B)), and idempotent") =
    Prop.forAll(
      Gen.listOfN(25, Gen.zip(Gen.chooseNum(0, 12), Gen.chooseNum(0, 12))),
      Gen.listOfN(25, Gen.zip(Gen.chooseNum(0, 12), Gen.chooseNum(0, 12)))) { (a, b) =>
      (a.isEmpty || b.isEmpty) || {
        def df(rows: List[(Int, Int)]) = rows.zipWithIndex
          .map { case ((x, y), i) => (x, y, i.toLong) }.toDF("x", "y", "i")
        def skySet(d: org.apache.spark.sql.DataFrame) =
          graft.operators.Skyline.skyline(d, Seq("x", "y"))
            .select("x", "y").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
        val union = df(a).select("x", "y").unionByName(df(b).select("x", "y"))
        val direct = skySet(union)
        val merged = skySet(
          graft.operators.Skyline.skyline(df(a), Seq("x", "y")).select("x", "y")
            .unionByName(
              graft.operators.Skyline.skyline(df(b), Seq("x", "y")).select("x", "y")))
        val idem = skySet(graft.operators.Skyline.skyline(union, Seq("x", "y")))
        direct == merged && idem == direct
      }
    }

  property("member-set partials merge: base ⊕ delta == full, for ANY split " +
      "and data-NULL level values") =
    Prop.forAll(Gen.listOfN(30, Gen.zip(
      Gen.option(Gen.oneOf("a", "b", "c")),
      Gen.oneOf("x", "y"),
      Gen.chooseNum(-5, 5),
      Gen.chooseNum(0, 9)))) { rows =>
      rows.isEmpty || {
        import graft.olap.Cube
        val df = rows.toDF("k1", "k2", "v", "s")
        def partials(d: org.apache.spark.sql.DataFrame) =
          Cube.memberSets(d,
            Seq(Cube.Hierarchy("h", Seq("k1", "k2"))),
            Seq(count(lit(1)).as("cnt"),
              sum(col("v").cast("long")).as("sv")))
        def toMap(d: org.apache.spark.sql.DataFrame) =
          d.select("k1", "k2", "gid", "cnt", "sv").collect()
            .map(r => ((r.get(0), r.get(1), r.getLong(2)),
              (r.getLong(3), r.getLong(4)))).toMap
        val merged = Cube.mergeMemberSets(
          Seq(partials(df.filter(col("s") < 5)),
            partials(df.filter(col("s") >= 5))),
          Seq("k1", "k2"),
          Seq(sum(col("cnt")).as("cnt"), sum(col("sv")).as("sv")))
        toMap(merged) == toMap(partials(df))
      }
    }

  property("snapshotDiff then applyChanges reconstructs the new snapshot") =
    Prop.forAll(
      Gen.listOfN(15, Gen.zip(Gen.chooseNum(1L, 8L), Gen.oneOf("p", "q", "r"))),
      Gen.listOfN(15, Gen.zip(Gen.chooseNum(1L, 8L), Gen.oneOf("p", "q", "r")))) { (o, n) =>
      {
        // one row per key (snapshots are keyed relations)
        val oldRows = o.toMap.toSeq
        val newRows = n.toMap.toSeq
        val oldDf = oldRows.toDF("k", "v")
        val newDf = newRows.toDF("k", "v")
        val changes = graft.operators.Merge.snapshotDiff(oldDf, newDf, Seq("k"))
          .withColumn("seq", lit(1L))
        val rebuilt = graft.operators.Merge
          .applyChanges(oldDf, changes, Seq("k"), "op", "seq")
          .collect().map(r => (r.getLong(0), r.getString(1))).toSet
        rebuilt == newRows.toSet
      }
    }

  property("range join equals the naive BETWEEN join at arbitrary widths") =
    Prop.forAll(
      Gen.listOfN(20, Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 80L))),
      Gen.listOfN(12, Gen.zip(Gen.chooseNum(1L, 3L),
        Gen.zip(Gen.chooseNum(0L, 80L), Gen.chooseNum(0L, 20L)))),
      Gen.chooseNum(1L, 50L)) { (l, r, width) =>
      l.isEmpty || r.isEmpty || {
        val left = l.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
          .toDF("k", "t", "lid")
        val right = r.zipWithIndex.map { case ((k, (s, len)), i) =>
          (k, s, s + len, i.toLong) }.toDF("k", "s", "e", "rid")
        val got = graft.operators.RangeJoin
          .pointInInterval(left, "t", right, "s", "e", Seq("k"), width)
          .select("lid", "rid").collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSet
        val want = left.join(right,
            left("k") === right("k") &&
              left("t") >= right("s") && left("t") <= right("e"))
          .select("lid", "rid").collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSet
        got == want
      }
    }

  property("interval-overlap join equals the naive inequality join, no duplicates") =
    Prop.forAll(
      Gen.listOfN(12, Gen.zip(Gen.chooseNum(0L, 60L), Gen.chooseNum(0L, 25L))),
      Gen.listOfN(12, Gen.zip(Gen.chooseNum(0L, 60L), Gen.chooseNum(0L, 25L))),
      Gen.chooseNum(1L, 40L)) { (l, r, width) =>
      l.isEmpty || r.isEmpty || {
        val left = l.zipWithIndex.map { case ((s, len), i) =>
          (1L, s, s + len, i.toLong) }.toDF("k", "ls", "le", "lid")
        val right = r.zipWithIndex.map { case ((s, len), i) =>
          (1L, s, s + len, i.toLong) }.toDF("k", "rs", "re", "rid")
        val rows = graft.operators.RangeJoin
          .intervalOverlap(left, "ls", "le", right, "rs", "re", Seq("k"), width)
          .select("lid", "rid").collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSeq
        val want = l.zipWithIndex.flatMap { case ((ls, ll), i) =>
          r.zipWithIndex.collect {
            case ((rs, rl), j) if ls <= rs + rl && rs <= ls + ll =>
              (i.toLong, j.toLong)
          }
        }.toSet
        rows.toSet == want && rows.length == rows.distinct.length
      }
    }

  property("ARI is symmetric, permutation-invariant, and 1.0 on self") =
    Prop.forAll(Gen.listOfN(24, Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0, 2)))) { ps =>
      ps.isEmpty || {
        val df = ps.toDF("c", "l")
        def ari(d: org.apache.spark.sql.DataFrame, a: String, b: String) =
          graft.ml.Metrics.adjustedRandIndex(d, a, b).head().getDouble(0)
        // relabeling clusters by any injection leaves ARI unchanged
        val relabeled = df.withColumn("c", col("c") * 7 + 1)
        ari(df, "c", "l") == ari(df, "l", "c") && // symmetric
          ari(relabeled, "c", "l") == ari(df, "c", "l") &&
          ari(df, "l", "l") == 1.0 // every partition agrees with itself
      }
    }

  property("AUC flips to 1−AUC under label complement; rocPoints counts partition") =
    Prop.forAll(Gen.listOfN(20,
      Gen.zip(Gen.oneOf(0, 1), Gen.chooseNum(0, 9)))) { ps =>
      val pos = ps.count(_._1 == 1)
      pos == 0 || pos == ps.size || {
        val df = ps.map { case (l, s) => (l, s / 10.0) }.toDF("label", "score")
        val auc = graft.ml.Metrics.aucBinary(df, "label", "score")
          .head().getDouble(0)
        val flipped = df.withColumn("label", lit(1) - col("label"))
        val aucF = graft.ml.Metrics.aucBinary(flipped, "label", "score")
          .head().getDouble(0)
        // round(,6) in each direction: allow the last-digit half-ulp
        val complementary = math.abs((auc + aucF) - 1.0) < 2e-6
        val pts = graft.ml.Metrics.rocPoints(df, "label", "score",
          Seq(0.0, 0.35, 0.75)).collect()
        // at t=0.0 every row is predicted positive: tp=P, fp=N
        val t0 = pts.find(_.getAs[Double]("threshold") == 0.0).get
        complementary &&
          t0.getAs[Long]("tp") == pos.toLong &&
          t0.getAs[Long]("fp") == (ps.size - pos).toLong &&
          pts.forall { r =>
            r.getAs[Double]("tpr") >= 0 && r.getAs[Double]("tpr") <= 1 &&
              r.getAs[Double]("fpr") >= 0 && r.getAs[Double]("fpr") <= 1
          }
      }
    }

  property("funnel reach counts are monotone nonincreasing across stages") =
    Prop.forAll(Gen.listOfN(30, Gen.zip(Gen.chooseNum(1L, 5L),
      Gen.oneOf("A", "B", "C"), Gen.chooseNum(0L, 20L)))) { evs =>
      evs.isEmpty || {
        val df = evs.zipWithIndex
          .map { case ((u, t, ts), i) => (u, t, ts, i.toLong) }
          .toDF("u", "t", "ts", "id")
        val counts = graft.operators.Funnel
          .counts(df, "u", "t", "ts", Seq("A", "B", "C"))
          .orderBy("stage").collect().map(_.getLong(2))
        counts.sliding(2).forall(p => p.length < 2 || p(0) >= p(1))
      }
    }

  property("basket lift is direction-symmetric; confidence and support bounded") =
    Prop.forAll(Gen.listOfN(25, Gen.zip(Gen.chooseNum(1L, 6L),
      Gen.oneOf("x", "y", "z", "w")))) { txs =>
      txs.isEmpty || {
        val rules = graft.operators.Basket
          .pairRules(txs.toDF("t", "i"), "t", "i", minPairCount = 1L)
          .collect()
          .map(r => (r.getString(0), r.getString(1)) ->
            ((r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
        rules.forall { case ((a, b), (sup, conf, lift)) =>
          val (supR, _, liftR) = rules((b, a))
          sup == supR && lift == liftR && // direction-symmetric
            sup > 0 && sup <= 1 && conf >= sup - 1e-9 && conf <= 1 && lift > 0
        }
      }
    }

  property("gini lies in [0, (n-1)/n] for non-negative data with a positive total") =
    Prop.forAll(Gen.listOfN(12, Gen.chooseNum(0, 50))) { vs =>
      vs.sum == 0 || {
        val r = graft.ml.Metrics
          .gini(vs.map(_.toDouble).toDF("v"), "v").head()
        val (g, n) = (r.getDouble(0), r.getLong(1))
        g >= -1e-9 && g <= (n - 1).toDouble / n + 1e-9
      }
    }

  property("band-index lookup equals the exploded semi join for ALL corpora") =
    Prop.forAll(
      Gen.listOfN(25, Gen.listOfN(8,
        Gen.oneOf("red", "blue", "fast", "slow", "cat", "dog", "sun")))) { texts =>
      texts.isEmpty || {
        val docs = texts.zipWithIndex
          .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
          .toDF("id0", "text")
        val sigs = graft.dedup.Dedup.nearDupSignatures(docs, "id0", "text")
        val idx = graft.dedup.BandIndex.build(sigs)
        try {
          // probe with HALF the corpus's own keys (the other half's
          // buckets are the misses; BandIndexSpec pins a pure miss)
          val lb = docs.filter($"id0" % 2 === 0).select(
            posexplode(graft.functions.minhash_bands($"text", 3, 8, 4))
              .as(Seq("band", "bucket"))).distinct()
          val keys = lb.collect().map(r => (r.getInt(0), r.getLong(1)))
          val got = idx.lookup(spark, keys).collect()
            .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
          val want = sigs
            .select($"id", posexplode($"bands").as(Seq("band", "bucket")))
            .join(lb, Seq("band", "bucket"), "left_semi")
            .select($"band", $"bucket", $"id").collect()
            .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
          got == want
        } finally idx.unpersist()
      }
    }

  property("agg-table partial algebra: merged partials over ANY split ≡ direct") =
    Prop.forAll(
      Gen.listOfN(30, Gen.zip(Gen.oneOf("a", "b", "c"),
        Gen.option(Gen.chooseNum(-999, 999)))),
      Gen.chooseNum(0, 30)) { (rows, cut) =>
      rows.isEmpty || {
        import graft.olap.AggNavigator
        val measures = Seq[AggNavigator.Measure](
          AggNavigator.CountAll("n"),
          AggNavigator.ExactAvg("avg_v", "v"),
          AggNavigator.ExactSum("sum_v", "v"))
        val df = rows.zipWithIndex
          .map { case ((k, v), i) => (k, v.map(_.toDouble), i) }
          .toDF("k", "v", "i")
        // arbitrary split point → two partial relations, combined then merged
        val parts = Seq(df.filter(col("i") < cut), df.filter(col("i") >= cut))
          .map(p => AggNavigator.partialsFor(p, Seq("k"), measures))
        val fold = measures.flatMap(_.combine)
        val combined = parts.reduce(_.unionByName(_))
          .groupBy(col("k")).agg(fold.head, fold.tail: _*)
        val mergeAggs = measures.map(_.merge)
        val merged = combined.groupBy(col("k"))
          .agg(mergeAggs.head, mergeAggs.tail: _*)
          .orderBy("k").collect().toSeq.map(_.toSeq)
        val directAggs = measures.map(_.direct)
        val direct = df.groupBy(col("k"))
          .agg(directAggs.head, directAggs.tail: _*)
          .orderBy("k").collect().toSeq.map(_.toSeq)
        merged == direct
      }
    }

  property("drill-across ≡ per-key map merge for ANY fact sides (members from any side survive)") =
    Prop.forAll(rowsGen, rowsGen, rowsGen) { (a, b, c) =>
      (a.isEmpty || b.isEmpty || c.isEmpty) || {
        val frames = Seq(a, b, c).map(_.toDF("k", "v"))
        val aliases = Seq("sa", "sb", "sc")
        val got = graft.olap.DrillAcross.drillAcrossAll(
          frames.zip(aliases).map { case (f, n) =>
            f -> Seq(sum(col("v").cast("long")).as(n)) },
          on = Seq("k"))
          .collect().map(r => r.getString(0) ->
            aliases.indices.map(i =>
              if (r.isNullAt(i + 1)) None else Some(r.getLong(i + 1))))
          .toMap
        // reference model: plain Scala maps, outer-merged on the key
        val sums = Seq(a, b, c).map(_.groupBy(_._1)
          .view.mapValues(_.map(_._2.toLong).sum).toMap)
        val keys = sums.flatMap(_.keySet).toSet
        got.keySet == keys && keys.forall { k =>
          got(k) == sums.map(_.get(k))
        }
      }
    }

  property("as-of join preserves every left row exactly once") =
    Prop.forAll(Gen.listOfN(20, Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 50L))),
      Gen.listOfN(10, Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 50L)))) { (l, r) =>
      l.isEmpty || {
        val left = l.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
          .toDF("k", "t", "lid")
        val right = r.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
          .toDF("k", "t", "rid")
        val out = graft.operators.AsOfJoin.asOf(left, right, "k", "t", Seq("rid"), "rid")
        out.count() == l.size.toLong &&
          out.select("lid").distinct().count() == l.size.toLong
      }
    }
}
