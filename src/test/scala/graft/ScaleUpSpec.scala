package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scale-validation derivation must PRESERVE the corpus's
  * statistical shape — these invariants are what make the measured
  * growth ratios in BASELINE.md meaningful.
  */
class ScaleUpSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val dest = {
    val d = SparkTestBase.tmpDir("graft_scaleup") + "/x3"
    ScaleUp.run(spark, "/root/testdata/sf0.001", d, 3)
    d
  }

  test("row counts scale by the factor; fixed dimensions stay single-copy") {
    def n(t: String) = spark.read.parquet(s"$dest/$t.parquet").count()
    def n0(t: String) = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet").count()
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
      "events", "documents", "embeddings"))
      assert(n(t) === 3 * n0(t), t)
    for (t <- Seq("region", "nation"))
      assert(n(t) === n0(t), t)
  }

  test("key-stride shifts preserve FK integrity (no orphans, no fanout change)") {
    val li = spark.read.parquet(s"$dest/lineitem.parquet")
    val o = spark.read.parquet(s"$dest/orders.parquet")
    assert(li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti").isEmpty,
      "every scaled lineitem must still join its order")
    assert(o.join(spark.read.parquet(s"$dest/customer.parquet"),
      o("o_custkey") === $"c_custkey", "left_anti").isEmpty,
      "every scaled order must still join its customer")
    // per-key fanout unchanged: max lineitems per order is the original's
    val mf = li.groupBy("l_orderkey").count().agg(org.apache.spark.sql.functions.max("count"))
      .collect()(0).getLong(0)
    val mf0 = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .groupBy("l_orderkey").count().agg(org.apache.spark.sql.functions.max("count"))
      .collect()(0).getLong(0)
    assert(mf === mf0)
  }

  test("documents: dup-rate constant (x-factor distinct texts), no cross-copy shingles") {
    val docs = spark.read.parquet(s"$dest/documents.parquet")
    val d0 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(docs.select("text").distinct().count() === 3 * d0.select("text").distinct().count(),
      "token salting must keep the duplicate-text rate exactly the original's")
    assert(docs.select("doc_id").distinct().count() === docs.count(), "ids stay unique")
  }

  test("embeddings: copies are reflections — within-copy geometry exact, no cross-copy twins") {
    val emb = spark.read.parquet(s"$dest/embeddings.parquet")
    val e0 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val stride = e0.agg(org.apache.spark.sql.functions.max("vec_id"))
      .collect()(0).getLong(0) + 1
    val byId = emb.select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toMap
    // the engine's numeric contract: sequential double fold in element order
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var j = 0
      while (j < a.length) {
        dot += a(j).toDouble * b(j).toDouble
        na += a(j).toDouble * a(j).toDouble
        nb += b(j).toDouble * b(j).toDouble
        j += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = e0.select("vec_id").as[Long].collect().sorted.take(8).toSeq
    for (pair <- ids.combinations(2)) {
      val Seq(u, v) = pair
      // a sign flip is an isometry: (−x)(−y) = xy exactly in IEEE
      // arithmetic and the fold order is unchanged, so every within-copy
      // cosine is BIT-equal to the original's
      assert(cos(byId(u + stride), byId(v + stride)) === cos(byId(u), byId(v)),
        s"within-copy cosine must be bit-exact for ($u,$v)")
    }
    for (u <- ids)
      assert(math.abs(cos(byId(u), byId(u + stride))) < 0.8,
        s"vector $u must NOT be a near-twin of its own copy (the additive-offset " +
          "scheme left copies at cosine≈1, inflating ANN growth superlinearly)")
  }

  test("DerivedShuffle: floor/ceiling clamps, the x100 calibration point, dirBytes") {
    import graft.DerivedShuffle._
    assert(partitionsFor(0L) === MinPartitions)
    assert(partitionsFor(17L << 20) === MinPartitions,
      "sf0.1-sized input floors at the driver contract's 32 — small-scale numbers stay comparable")
    val x100 = partitionsFor(2157L << 20) // the measured 2.16 GB ×100 corpus
    assert(x100 >= 256 && x100 <= 288,
      s"×100 must derive ≈ the empirically-best 256, got $x100")
    assert(partitionsFor(Long.MaxValue / 4) === MaxPartitions, "ceiling clamps")
    // dirBytes: recursive regular-file sum, 0 for a missing path
    val d = SparkTestBase.tmpDir("graft_dshuffle")
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "a.bin"), new Array[Byte](1000))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d, "sub"))
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "sub", "b.bin"), new Array[Byte](500))
    assert(dirBytes(d) === 1500L)
    assert(dirBytes(s"$d/nope") === 0L)
  }
}
