package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** ANN variants against the exact baseline: IVF probing every list must
  * reproduce brute force exactly; narrowing nprobe must only shrink the
  * candidate set (never invent neighbors). */
class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, sfDir)

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.select("vec_id", "cosine").as[(Long, Double)].collect().toSeq

  test("prefixRerankTopK: prefix gates the candidate set, full vector ranks it") {
    // query 100: full vec (1, 0, 1). v1 has a PERFECT prefix (first dim)
    // but orthogonal tail; v2 decent prefix + matching tail; v3 opposite
    // prefix sign -> pruned at stage 1 even though its tail matches.
    val vecs = Seq(
      (100L, Seq(1.0, 0.0, 1.0)),
      (1L, Seq(1.0, 1.0, -1.0)),
      (2L, Seq(0.5, 0.0, 0.5)),
      (3L, Seq(-1.0, 0.0, 1.0))).toDF("vec_id", "embedding")
    // candidates=2 on prefixDim=1: coarse pcos is sign(v[0]) -> v1, v2 pass
    // (pcos 1.0 each, tie broken by id), v3 (pcos -1) cut
    val got = ids(Similarity.prefixRerankTopK(vecs, "vec_id", "embedding",
      queryId = 100L, k = 2, prefixDim = 1, candidates = 2))
    // full-dim rerank: v2 cosine = 1.0, v1 cosine = 0
    assert(got == Seq((2L, 1.0), (1L, 0.0)))
  }

  test("prefixRerankTopK with full-width prefix and corpus-wide candidates = brute force") {
    val exact = ids(Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10))
    val pr = ids(Similarity.prefixRerankTopK(emb, "vec_id", "embedding",
      0L, 10, prefixDim = 64, candidates = 10000))
    assert(pr == exact)
  }

  test("ivfTopK with nprobe = nlist equals exact brute-force top-k") {
    val exact = ids(Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10))
    val ivfAll = ids(Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10,
      centroidIds = (1L to 8L), nprobe = 8))
    assert(ivfAll == exact)
  }

  test("ivfTopKDerived with nprobe = derived nlist equals exact brute-force top-k") {
    val nlist = Similarity.adaptiveNlist(emb.count())
    val exact = ids(Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10))
    val derivedAll = ids(Similarity.ivfTopKDerived(emb, "vec_id", "embedding",
      0L, 10, nprobe = nlist))
    assert(derivedAll == exact)
    intercept[IllegalArgumentException] {
      Similarity.ivfTopKDerived(emb, "vec_id", "embedding", 0L, 10, nprobe = nlist + 1)
    }
  }

  test("ivf candidates with nprobe=1 are a subset of nprobe=2, with recall > 0") {
    val n1 = ids(Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 50,
      centroidIds = (1L to 8L), nprobe = 1)).map(_._1).toSet
    val n2 = ids(Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 50,
      centroidIds = (1L to 8L), nprobe = 2)).map(_._1).toSet
    val exact = ids(Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 50)).map(_._1).toSet
    assert(n1.nonEmpty)
    // top-50 of a superset scan can only rank candidates at least as well
    assert((n1 -- n2).forall(exact.contains) || (n1 subsetOf n2) || n2.size == 50)
    assert((n2 & exact).nonEmpty, "nprobe=2 must recall at least one true neighbor")
  }

  test("ivf assignment is a total partition: every vector lands in exactly one list") {
    val total = emb.count() - 1 // minus the query vector itself
    val union = ids(Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, Int.MaxValue,
      centroidIds = (1L to 8L), nprobe = 8))
    assert(union.size == total, s"nprobe=8 with k=∞ must scan all $total vectors, got ${union.size}")
  }

  test("ivfTopK rejects out-of-range nprobe and unknown centroid ids") {
    intercept[IllegalArgumentException] {
      Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10, (1L to 8L), nprobe = 9)
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10, (1L to 8L), nprobe = 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10, Seq(999999999L), nprobe = 1)
    }
  }

  test("annJoin equals per-left brute force within the shared cell") {
    val emb = sources.Tables.embeddings(spark, sfDir).limit(120)
    val left = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val right = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val got = Similarity.annJoin(left, right, "vec_id", "embedding",
        corpus = emb, centroidIds = (1L to 4L), k = 2)
      .select("id_l", "rank", "id_r").as[(Long, Int, Long)].collect().toSet
    // brute-force replay: assign each side to its argmax-cosine centroid,
    // rank all same-cell pairs per left id
    def assigned(df: org.apache.spark.sql.DataFrame) = {
      val cb = emb.filter(col("vec_id").isInCollection(1L to 4L))
        .select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      val cbCols = (1L to 4L).map(id => array(cb(id).map(f => lit(f.toDouble)): _*))
      val arr = array(cbCols.map(c => graft.Functions.cosine(col("embedding"), c)): _*)
      df.withColumn("_cell", array_position(arr, array_max(arr)) - 1)
    }
    val pairs = assigned(left).select(col("vec_id").as("id_l"), col("embedding").as("lv"), col("_cell"))
      .join(assigned(right).select(col("vec_id").as("id_r"), col("embedding").as("rv"), col("_cell")), "_cell")
      .withColumn("cosine", round(graft.Functions.cosine(col("lv"), col("rv")), 6))
      .select("id_l", "id_r", "cosine").as[(Long, Long, Double)].collect()
    val expect = pairs.groupBy(_._1).toSeq.flatMap { case (lid, ps) =>
      ps.sortBy(p => (-p._3, p._2)).take(2).zipWithIndex.toSeq
        .map { case ((_, rid, _), i) => (lid, i + 1, rid) }
    }.toSet
    assert(got == expect)
  }

  test("trainIvfCodebook separates well-separated clusters and is layout-invariant") {
    import spark.implicits._
    // two tight 3-D clusters around (0,0,0) and (10,10,10)
    val vecs = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) 0.0 else 10.0
      (i, Seq(base + (i % 5) * 0.01, base - (i % 3) * 0.01, base + (i % 7) * 0.01))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val cb = Similarity.trainIvfCodebook(df, "vec_id", "embedding", k = 2, iters = 4)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(cb.size == 2)
    // after convergence each centroid sits inside one cluster's ball
    val means = cb.values.map(_.sum / 3).toSeq.sorted
    assert(means.head.abs < 0.5 && (means(1) - 10.0).abs < 0.5)
    // quantized long sums make the codebook identical under any partitioning
    val cb7 = Similarity.trainIvfCodebook(df.repartition(7), "vec_id", "embedding",
      k = 2, iters = 4).collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(cb == cb7)
  }

  test("semanticDedup keep set matches a naive same-cell pair replay") {
    import spark.implicits._
    val sub = emb.limit(150)
    val got = Similarity.semanticDedup(sub, "vec_id", "embedding",
        corpus = emb, centroidIds = (1L to 4L), threshold = 0.3)
      .select("vec_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(got.size == sub.count())
    // naive replay with the same literal-codebook assignment
    val cb = emb.filter(col("vec_id").isInCollection(1L to 4L))
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val cbCols = (1L to 4L).map(id => array(cb(id).map(f => lit(f.toDouble)): _*))
    val arr = array(cbCols.map(c => graft.Functions.cosine(col("embedding"), c)): _*)
    val asg = sub.withColumn("_cell", array_position(arr, array_max(arr)) - 1)
      .select(col("vec_id"), col("embedding"), col("_cell"))
    val pairs = asg.select(col("vec_id").as("id_a"), col("embedding").as("va"), col("_cell"))
      .join(asg.select(col("vec_id").as("id_b"), col("embedding").as("vb"), col("_cell")), "_cell")
      .filter(col("id_a") < col("id_b"))
      .withColumn("c", round(graft.Functions.cosine(col("va"), col("vb")), 6))
      .filter(col("c") >= 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val droppedExpect = pairs.map(_._2).toSet
    assert(got.filter(!_._2).keySet == droppedExpect)
    // the smallest id of every duplicate pair always survives
    val minIds = pairs.map(_._1).toSet -- droppedExpect
    assert(minIds.forall(got(_)))
    // an impossible threshold keeps everything
    val all = Similarity.semanticDedup(sub, "vec_id", "embedding",
        corpus = emb, centroidIds = (1L to 4L), threshold = 1.1)
      .select("keep").as[Boolean].collect()
    assert(all.forall(identity))
  }

  test("pq_encode null/short-vector handling: null element or too-few dims -> NULL codes") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val cb = Similarity.pqCodebookQ(2, 2, 2)
    val schema = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("v", ArrayType(DoubleType, containsNull = true))))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0)),
        Row(2L, Seq[java.lang.Double](1.0, null, 3.0, 4.0)),
        Row(3L, Seq[java.lang.Double](1.0, 2.0)), // shorter than m*subDim
        Row(4L, null)),
      schema)
    val got = df.select(col("id"), graft.Functions.pq_encode(col("v"), cb, 2, 2).as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Int](1))).toMap
    assert(got(1L) != null && got(1L).length == 2)
    assert(got(2L) == null && got(3L) == null && got(4L) == null)
  }

  test("pqTopK excludes unencodable vectors instead of ranking their NULL distance first") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true))))
    def vec(seed: Int): Seq[java.lang.Float] =
      (0 until 64).map(d => java.lang.Float.valueOf((seed * 31 + d) % 7 - 3f))
    val rows: Seq[Row] = (0L to 5L).map(i => Row(i, vec(i.toInt))) :+
      Row(99L, vec(1).updated(3, null.asInstanceOf[java.lang.Float])) // unencodable
    val df = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
    val got = Similarity.pqTopK(df, "vec_id", "embedding", 0L, 10, 4, 8, 64)
      .as[(Long, Long)].collect().toSeq
    assert(!got.map(_._1).contains(99L))
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("SQL-registered pq_encode accepts an integer-literal codebook") {
    Functions.register(spark)
    val got = spark.sql(
      """SELECT pq_encode(array(CAST(0.9 AS DOUBLE), CAST(0.1 AS DOUBLE),
                                CAST(2.9 AS DOUBLE), CAST(3.1 AS DOUBLE)),
                          array(array(1024, 0), array(0, 1024),
                                array(2048, 3072), array(3072, 2048)), 2, 2)""")
      .collect()(0).getSeq[Int](0)
    // sub 0: quantized (921, 102) is nearer (1024, 0) than (0, 1024) -> 0
    // sub 1: quantized (2969, 3174) is nearer (3072, 2048)? dists:
    //   vs (2048,3072): 921^2+102^2 ; vs (3072,2048): 103^2+1126^2 -> code 0
    assert(got == Seq(0, 0))
  }

  test("pq codes are total and bounded; pqTopK distance equals a naive ADC replay") {
    val m = 4; val ksub = 8; val dim = 64; val subDim = dim / m
    val cb = Similarity.pqCodebookQ(m, ksub, subDim)
    assert(cb.size == m * ksub && cb.forall(_.size == subDim))
    val encoded = emb.withColumn("codes",
        graft.Functions.pq_encode(col("embedding"), cb, m, ksub))
      .select("vec_id", "codes", "embedding")
      .as[(Long, Seq[Int], Seq[Float])].collect()
    assert(encoded.nonEmpty)
    // every code in range, and every code IS the argmin for its subspace
    encoded.foreach { case (_, codes, vec) =>
      assert(codes.length == m)
      codes.zipWithIndex.foreach { case (c, s) =>
        assert(c >= 0 && c < ksub)
        val dists = (0 until ksub).map { cc =>
          (0 until subDim).map { d =>
            val diff = graft.functions.PqUtil.quantize(vec(s * subDim + d).toDouble) -
              cb(s * ksub + cc)(d)
            diff * diff
          }.sum
        }
        assert(dists(c) == dists.min)
        assert(c == dists.indexOf(dists.min)) // first-min tie rule
      }
    }
    // pqTopK's ADC distances replay exactly from codes + query table
    val q = encoded.find(_._1 == 0L).get._3.map(_.toDouble)
    val dt = (0 until m).map { s => (0 until ksub).map { c =>
      (0 until subDim).map { d =>
        val diff = graft.functions.PqUtil.quantize(q(s * subDim + d)) - cb(s * ksub + c)(d)
        diff * diff
      }.sum
    }}
    val expect = encoded.filter(_._1 != 0L)
      .map { case (id, codes, _) => id -> (0 until m).map(s => dt(s)(codes(s))).sum }
      .sortBy { case (id, d) => (d, id) }.take(10).toSeq
    val got = Similarity.pqTopK(emb, "vec_id", "embedding", 0L, 10, m, ksub, dim)
      .as[(Long, Long)].collect().toSeq
    assert(got == expect)
  }

  test("trainPqCodebook is layout-invariant and its output drives pq_encode") {
    val cb = Similarity.trainPqCodebook(emb, "vec_id", "embedding",
        m = 2, ksub = 2, iters = 2, dim = 64)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    assert(cb.keySet == Set((0, 0), (0, 1), (1, 0), (1, 1)))
    assert(cb.values.forall(_.length == 32))
    // quantized long sums make the codebook identical under any partitioning
    val cb7 = Similarity.trainPqCodebook(emb.repartition(7), "vec_id", "embedding",
        m = 2, ksub = 2, iters = 2, dim = 64)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    assert(cb == cb7)
    // trained centroids quantize into a pq_encode codebook that assigns
    // every vector a full in-range code row
    val quantized: Seq[Seq[Long]] =
      (for { s <- 0 until 2; c <- 0 until 2 } yield
        cb((s, c)).map(graft.functions.PqUtil.quantize))
    val codes = emb.select(graft.Functions.pq_encode(
        col("embedding"), quantized, 2, 2).as("c"))
      .as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 2 && c.forall(x => x >= 0 && x < 2)))
  }

  test("ivfPqTopK replays from a naive Scala IVF+residual-PQ implementation") {
    val m = 4; val ksub = 8; val dim = 64; val subDim = dim / m
    val nprobe = 2
    val cb = Similarity.pqCodebookQ(m, ksub, subDim)
    val all = emb.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().map { case (id, v) => id -> v.map(_.toDouble) }
    val cents = (1L to 8L).map(id => all.find(_._1 == id).get._2)
    def cosine(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i => d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def assign(v: Seq[Double]): Int = {
      val cs = cents.map(c => cosine(v, c))
      cs.indexOf(cs.max)
    }
    def encode(r: Seq[Double]): Seq[Int] = (0 until m).map { s =>
      val dists = (0 until ksub).map { c =>
        (0 until subDim).map { d =>
          val diff = graft.functions.PqUtil.quantize(r(s * subDim + d)) - cb(s * ksub + c)(d)
          diff * diff
        }.sum
      }
      dists.indexOf(dists.min)
    }
    val q = all.find(_._1 == 0L).get._2
    val qcos = cents.map(c => cosine(q, c))
    val probeCut = qcos.sorted(Ordering[Double].reverse)(nprobe - 1)
    val dt = cents.map { c =>
      val rq = q.indices.map(d => q(d) - c(d))
      (0 until m).map { s => (0 until ksub).map { cc =>
        (0 until subDim).map { d =>
          val diff = graft.functions.PqUtil.quantize(rq(s * subDim + d)) - cb(s * ksub + cc)(d)
          diff * diff
        }.sum
      }}
    }
    val expect = all.filter(_._1 != 0L).flatMap { case (id, v) =>
      val lst = assign(v)
      if (qcos(lst) >= probeCut) {
        val r = v.indices.map(d => v(d) - cents(lst)(d))
        val codes = encode(r)
        Some(id -> (0 until m).map(s => dt(lst)(s)(codes(s))).sum)
      } else None
    }.sortBy { case (id, d) => (d, id) }.take(10).toSeq
    val got = Similarity.ivfPqTopK(emb, "vec_id", "embedding", 0L, 10,
      (1L to 8L), nprobe, m, ksub, dim).as[(Long, Long)].collect().toSeq
    assert(got == expect)
  }

  test("lshTopK returns neighbors from the query bucket ranked like brute force") {
    val lsh = ids(Similarity.lshTopK(emb, "vec_id", "embedding", 0L, 10,
      numPlanes = 2, dim = 64))
    val exact = ids(Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L,
      Int.MaxValue)).toMap
    assert(lsh.nonEmpty)
    // every LSH score must equal the exact score for that id
    lsh.foreach { case (id, cos) => assert(exact(id) == cos) }
    // and the list must be sorted by (cosine desc, id asc)
    assert(lsh == lsh.sortBy { case (id, cos) => (-cos, id) })
  }

  test("hardNegatives yields only cross-label same-cell pairs, ranked by cosine") {
    import spark.implicits._
    val sub = emb.limit(120)
    val got = Similarity.hardNegatives(sub, "vec_id", "embedding", "label",
        corpus = emb, centroidIds = (1L to 4L), k = 2)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    val labels = sub.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    // negatives only: no pair may share a label; never self-pairs
    got.foreach { case (l, _, r, _) =>
      assert(l != r && labels(l) != labels(r), s"($l,$r) share label ${labels(l)}")
    }
    // per query: ranks are 1..n and cosine non-increasing with rank
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2) == (1 to sorted.size))
      assert(sorted.sliding(2).forall {
        case Seq(a, b) => a._4 >= b._4
        case _ => true
      })
    }
  }

  test("growing nlist shrinks within-cell candidate pairs (the sqrt-N scale path)") {
    // the BENCH_SCALING flags on s10/d11 are a parameterization artifact:
    // with nlist pinned, cells grow ~N and pairs ~N^2/nlist. This pins the
    // remedy: on the SAME corpus, more cells => fewer within-cell pairs,
    // so choosing nlist ~ sqrt(N) keeps pair volume ~N at any scale. The
    // broadcast codebook is what makes large nlist feasible (plan O(1)).
    def cellSizes(nlist: Int): Seq[Long] = {
      val byId = emb.filter(col("vec_id").isInCollection(1L to nlist.toLong))
        .select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
      val bc = spark.sparkContext.broadcast(
        (1L to nlist.toLong).map(byId).toArray)
      emb.select(graft.Functions.cell_assign(col("embedding"), bc).as("c"))
        .groupBy("c").count()
        .select("count").as[Long].collect().toSeq
    }
    def pairs(sizes: Seq[Long]): Long = sizes.map(n => n * (n - 1) / 2).sum
    val p2 = pairs(cellSizes(2))
    val p8 = pairs(cellSizes(8))
    assert(p8 < p2, s"8 cells must yield fewer within-cell pairs than 2 ($p8 vs $p2)")
    // and the partition is total either way: cell ids cover every vector
    assert(cellSizes(8).sum == emb.count())
  }

  test("broadcast codebook keeps the plan O(1) in nlist (the 100 TB gate)") {
    // the round-5 literal-array codebook grew the plan by nlist*dim literal
    // nodes; the broadcast path must produce an IDENTICAL expression-node
    // count whatever nlist is
    def planNodes(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect { case p =>
        p.expressions.map(e => e.collect { case x => x }.size).sum
      }.sum
    def semdedup(nlist: Int) = Similarity.semanticDedup(
      emb, "vec_id", "embedding", corpus = emb,
      centroidIds = (1L to nlist.toLong), threshold = 0.3)
    def ivf(nlist: Int) = Similarity.ivfTopK(
      emb, "vec_id", "embedding", 0L, 10,
      centroidIds = (1L to nlist.toLong), nprobe = 1)
    def ivfpq(nlist: Int) = Similarity.ivfPqTopK(
      emb, "vec_id", "embedding", 0L, 10,
      centroidIds = (1L to nlist.toLong), nprobe = 1, m = 4, ksub = 8, dim = 64)
    assert(planNodes(semdedup(2)) == planNodes(semdedup(8)),
      "semanticDedup plan must not grow with nlist")
    assert(planNodes(ivf(2)) == planNodes(ivf(8)),
      "ivfTopK plan must not grow with nlist")
    assert(planNodes(ivfpq(2)) == planNodes(ivfpq(8)),
      "ivfPqTopK plan (incl. ADC tables) must not grow with nlist")
  }

  test("lshBucket rejects numPlanes outside 1..64 (single-long sign-bit bucket)") {
    // 1L << p wraps mod 64 in Java: the 65th plane (p=64) would silently
    // collide with plane 0's bit instead of failing loudly. Plane p=63
    // (numPlanes=64) sets the sign bit — well-defined, no wrap.
    intercept[IllegalArgumentException] {
      Similarity.lshBucket(emb, col("embedding"), numPlanes = 65, dim = 64)
    }
    intercept[IllegalArgumentException] {
      Similarity.lshBucket(emb, col("embedding"), numPlanes = 0, dim = 64)
    }
    // 64 is the documented max and must work (uses all bits incl. sign)
    val buckets = emb.select(
      Similarity.lshBucket(emb, col("embedding"), numPlanes = 64, dim = 64).as("b"))
      .collect().map(_.getLong(0))
    assert(buckets.nonEmpty)
  }

  test("adaptiveNlist tracks floor(sqrt(N)) with a floor of 1") {
    assert(Similarity.adaptiveNlist(0L) == 1)
    assert(Similarity.adaptiveNlist(1L) == 1)
    assert(Similarity.adaptiveNlist(500L) == 22)
    assert(Similarity.adaptiveNlist(5000L) == 70)
    assert(Similarity.adaptiveNlist(100000000L) == 10000)
  }

  test("derivedCodebook: deterministic sqrt(N)-sized sample of actual corpus vectors") {
    val n = emb.count()
    val cb1 = Similarity.derivedCodebook(emb, "vec_id", "embedding").value
    val cb2 = Similarity.derivedCodebook(emb, "vec_id", "embedding").value
    assert(cb1.length == Similarity.adaptiveNlist(n))
    assert(cb1.map(_.toSeq).toSeq == cb2.map(_.toSeq).toSeq,
      "md5-ordered sampling must be deterministic across calls")
    // every centroid is a real corpus vector (density-tracking sampling,
    // not synthetic coordinates)
    val corpus = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSet
    cb1.foreach(c => assert(corpus.contains(c.toSeq),
      "centroid must be sampled from the corpus"))
  }

  test("derivedCodebook is layout-invariant: repartitioned corpus yields identical centroids") {
    // the sample is ORDER BY (md5(id), id) LIMIT nlist — a total order, so
    // file layout / partitioning must not change which vectors are chosen
    // or their order (cell ids must be stable across re-writes of the
    // same corpus)
    val base = Similarity.derivedCodebook(emb, "vec_id", "embedding").value
    val shuffled = Similarity.derivedCodebook(
      emb.repartition(13, col("label")), "vec_id", "embedding").value
    assert(base.map(_.toSeq).toSeq == shuffled.map(_.toSeq).toSeq)
  }

  test("semanticDedupDerived is a total partition with sqrt(N) cells actually used") {
    val n = emb.count()
    val got = Similarity.semanticDedupDerived(emb, "vec_id", "embedding",
      threshold = 0.3)
    val rows = got.select("vec_id", "cell", "keep")
      .as[(Long, Int, Boolean)].collect()
    assert(rows.length == n, "one output row per input vector")
    assert(rows.map(_._1).distinct.length == n)
    val nlist = Similarity.adaptiveNlist(n)
    assert(rows.forall { case (_, c, _) => c >= 0 && c < nlist })
    // the derived codebook must spread vectors over many cells, not one
    assert(rows.map(_._2).distinct.length > nlist / 4,
      "derived centroids must actually partition the corpus")
  }

  test("annJoinDerived ranks are 1..k with non-increasing cosine, never self/parity pairs") {
    val left = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val right = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val got = Similarity.annJoinDerived(left, right, "vec_id", "embedding",
      corpus = emb, k = 3)
      .select("id_l", "rank", "id_r", "cosine")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (l, _, r, _) => assert(l % 2 == 0 && r % 2 == 1) }
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2) == (1 to sorted.size))
      assert(sorted.sliding(2).forall {
        case Seq(a, b) => a._4 >= b._4
        case _ => true
      })
    }
  }

  test("bruteForceJoinTopK equals the window-sort formulation per query") {
    import graft.Functions.cosine
    // deterministic pseudo-random dim-8 vectors
    val vecs = spark.range(120).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        d => pmod(col("id") * (d * 131L + 17L) + d * 7L, lit(97L)).cast("double") - 48.0
      ).as("embedding"))
    val queries = vecs.filter(col("vec_id") % 10 === 0)
    val corpus = vecs.filter(col("vec_id") % 10 =!= 0)
    val got = Similarity.bruteForceJoinTopK(queries, corpus, "vec_id", "embedding", k = 4)
      .select("id_l", "rank", "id_r").as[(Long, Int, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_l")).orderBy(col("cosine").desc, col("id_r"))
    val expect = corpus.select(col("vec_id").as("id_r"), col("embedding").as("_rv"))
      .crossJoin(queries.select(col("vec_id").as("id_l"), col("embedding").as("_lv")))
      .select(col("id_l"), col("id_r"), round(cosine(col("_rv"), col("_lv")), 6).as("cosine"))
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rank") <= 4)
      .select("id_l", "rank", "id_r").as[(Long, Int, Long)].collect().toSet
    assert(got == expect && got.size == 12 * 4)
  }

  test("multiprobe nprobe=2 recall dominates single-probe, per query") {
    // truth elements are GLOBAL top-3, so any candidate set containing one
    // ranks at most 2 items above it — hits are monotone in candidate-set
    // inclusion, and nprobe=2's cells are a superset of nprobe=1's
    val dir = "/root/testdata/sf0.01"
    val r1 = SparkEntry.queries("s14_ann_recall")(spark, dir)
      .select("id_l", "n_hits").as[(Long, Int)].collect().toMap
    val r2 = SparkEntry.queries("s15_ann_recall_nprobe2")(spark, dir)
      .select("id_l", "n_hits").as[(Long, Int)].collect().toMap
    assert(r1.nonEmpty && r2.keySet == r1.keySet)
    r1.foreach { case (q, h1) => assert(r2(q) >= h1, s"query $q: ${r2(q)} < $h1") }
  }

  test("annAutotune: monotone sweep, exactly one chosen row, selection semantics") {
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
    val corpusR = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val rows = Similarity.annAutotune(queries, corpusR, "vec_id", "embedding",
        emb, k = 3, nprobes = Seq(1, 2, 4, 8), targetRecallMicro = 500000L)
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 4, 8))
    // the s14/s15 monotonicity carries over to the whole sweep: probing
    // more cells can only add candidates (cost) and recover more truth
    // elements (a global top-k item in a smaller candidate set stays
    // top-k in any superset — anything outranking it is itself truth)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2, s"cost must be monotone: $b vs $a")
      assert(b._3 >= a._3, s"hits must be monotone: $b vs $a")
    }
    // exactly one pinned config: the cheapest meeting the target,
    // or the max-recall row when nothing does
    assert(rows.count(_._5) == 1)
    val meeting = rows.filter(_._4 >= 500000L)
    val expected =
      if (meeting.nonEmpty) meeting.minBy(r => (r._2, r._1))
      else rows.maxBy(r => (r._4, -r._1))
    assert(rows.find(_._5).get == expected)
  }

  test("annAutotune fallback: an unreachable target pins the max-recall config") {
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
    val corpusR = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val rows = Similarity.annAutotune(queries, corpusR, "vec_id", "embedding",
        emb, k = 3, nprobes = Seq(1, 2), targetRecallMicro = 1000000L)
      .collect().map(r => (r.getInt(0), r.getLong(3), r.getBoolean(4)))
    assert(rows.count(_._3) == 1)
    val chosen = rows.find(_._3).get
    assert(chosen._2 == rows.map(_._2).max,
      s"fallback must pin the max-recall config, got $chosen of ${rows.toSeq}")
  }

  test("sq8TopK with corpus-wide rerank equals exact brute force") {
    // when every row survives the code-space cut, the final exact-cosine
    // ordering must be identical to bruteForceTopK — quantization only
    // ever decides the CANDIDATES
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count().toInt
    val got = Similarity.sq8TopK(emb, "vec_id", "embedding",
        queryId = 0L, k = 5, rerank = n)
      .select("vec_id", "cosine").as[(Long, Double)].collect().toSeq
    val expect = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queryId = 0L, k = 5)
      .select("vec_id", "cosine").as[(Long, Double)].collect().toSeq
    assert(got == expect)
  }

  test("mmrRerank: λ=1000 reduces to pure relevance; λ<1000 defers near-duplicates") {
    // corpus: a near-duplicate pair (1, 2) most similar to the query, and
    // a moderately relevant but diverse item 3
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),           // query
      (1L, Array(0.99f, 0.14f, 0.0f)),         // top relevance
      (2L, Array(0.99f, 0.141f, 0.001f)),      // its near-duplicate
      (3L, Array(0.7f, -0.7f, 0.1f)),          // diverse, less relevant
      (4L, Array(0.6f, 0.75f, 0.2f))
    ).toDF("vec_id", "embedding")
    // pure relevance: order = brute-force cosine order
    val pure = Similarity.mmrRerank(emb, "vec_id", "embedding",
        queryId = 0L, k = 4, candN = 4, lambdaMilli = 1000)
      .orderBy(col("rank")).select("vec_id").as[Long].collect().toSeq
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 4)
      .select("vec_id").as[Long].collect().toSeq
    assert(pure == bf, s"λ=1 order $pure != relevance order $bf")
    // diversified: rank 1 is still the relevance winner, but the
    // near-duplicate is deferred below the diverse items
    val div = Similarity.mmrRerank(emb, "vec_id", "embedding",
        queryId = 0L, k = 4, candN = 4, lambdaMilli = 500)
      .orderBy(col("rank")).select("vec_id").as[Long].collect().toSeq
    assert(div.head == bf.head)
    // pure relevance ranks 2 second; diversification must defer it below
    // at least one diverse item (how far depends on the diverse items'
    // own mutual similarities — not asserted)
    assert(bf(1) == 2L && div.indexOf(2L) > 1,
      s"near-duplicate not deferred: $div (relevance order $bf)")
  }

  test("sq8 codes: zero vector yields all-zero codes, not NaN; qdot is integral") {
    val emb = Seq(
      (0L, Array(1.0f, -2.0f, 4.0f)),
      (1L, Array(0.0f, 0.0f, 0.0f)),   // zero vector: maxabs guard
      (2L, Array(2.0f, -4.0f, 8.0f))   // colinear with query
    ).toDF("vec_id", "embedding")
    val got = Similarity.sq8TopK(emb, "vec_id", "embedding",
        queryId = 0L, k = 2, rerank = 2)
      .select("vec_id", "qdot").as[(Long, Long)].collect().toMap
    // query codes: maxabs 4 -> floor(v*127/4) = (31, -64, 127)
    // vec 2 (same direction): identical codes -> qdot = 31^2+64^2+127^2
    assert(got(2L) == 31L * 31 + 64L * 64 + 127L * 127)
    // zero vector scores 0, never NaN/null
    assert(got(1L) == 0L)
  }
}
