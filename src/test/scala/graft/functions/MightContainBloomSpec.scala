package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native might_contain_bloom expression: no-false-negative semantics vs
  * the filter's own driver-side answers, codegen/interpreted agreement
  * under forced codegen, null-safety, SQL registration, and the plan
  * contract it exists for — decontaminate_bloom's prune carries no
  * ScalaUDF node. */
class MightContainBloomSpec extends SparkSpec {

  private def buildFilter(items: Seq[String]) = {
    val s = spark
    import s.implicits._
    items.toDF("g").stat.bloomFilter("g", math.max(items.size.toLong, 1L), 0.01)
  }

  test("agrees with the driver-side filter on members and non-members") {
    val s = spark
    import s.implicits._
    val members = (1 to 200).map(i => s"gram $i of the held-out set")
    val probes = members ++ (1 to 500).map(i => s"fresh corpus gram $i") ++
      Seq("", "类别A äöü€", "a" * 500)
    val bf = buildFilter(members)
    val bytes = MightContainBloom.serialize(bf)
    val got = probes.toDF("g")
      .select(col("g"), call_function("might_contain_bloom", lit(bytes), col("g")).as("m"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    probes.foreach { p =>
      assert(got(p) == bf.mightContainString(p),
        s"expression disagrees with driver-side filter on '$p'")
    }
    // no false negatives, ever
    members.foreach(m => assert(got(m), s"false negative on member '$m'"))
  }

  test("codegen and interpreted paths agree under forced codegen") {
    val s = spark
    import s.implicits._
    val bf = buildFilter((1 to 50).map(i => s"m$i"))
    val bytes = MightContainBloom.serialize(bf)
    val df = ((1 to 50).map(i => s"m$i") ++ (1 to 50).map(i => s"x$i")).toDF("g")
    def run() = df
      .select(call_function("might_contain_bloom", lit(bytes), col("g")).as("m"))
      .collect().map(_.getBoolean(0)).toSeq
    val prev = s.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    val codegenOnly = try {
      s.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      run()
    } finally s.conf.set("spark.sql.codegen.factoryMode", prev)
    val interpreted = try {
      s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      run()
    } finally s.conf.set("spark.sql.codegen.factoryMode", prev)
    assert(codegenOnly == interpreted)
    assert(codegenOnly.count(identity) >= 50) // all members hit
  }

  test("null value -> null; null filter -> null; SQL-registered; bad arity errors") {
    val bytes = MightContainBloom.serialize(buildFilter(Seq("a")))
    val s = spark
    import s.implicits._
    val r1 = Seq(Tuple1("a")).toDF("g")
      .select(call_function("might_contain_bloom", lit(bytes),
        lit(null).cast("string")).as("m")).collect().head
    assert(r1.isNullAt(0))
    val r2 = Seq(Tuple1("a")).toDF("g")
      .select(call_function("might_contain_bloom",
        lit(null).cast("binary"), col("g")).as("m")).collect().head
    assert(r2.isNullAt(0))
    assert(spark.catalog.functionExists("might_contain_bloom"))
    val err = intercept[Exception](
      spark.sql("SELECT might_contain_bloom(CAST('x' AS BINARY))").collect())
    assert(err.getMessage.toLowerCase.contains("might_contain_bloom"))
  }

  test("decontaminate_bloom plans no ScalaUDF and matches decontaminate exactly") {
    val dir = "/root/testdata/sf0.001"
    val db = graft.ops.PipelineOps.decontaminateBloom(spark, dir)
    val plan = db.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"),
      "decontaminate_bloom's prune must be the native codegen expression, not a UDF")
    val exact = graft.ops.PipelineOps.decontaminate(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    val bloomed = db.collect().map(_.getLong(0)).toSeq
    assert(bloomed == exact, "Bloom path must be bit-identical to the exact path")
    graft.HarnessUtil.releaseAll(spark)
  }

  // ---- broadcast-handle form (MightContainBloomBc) -------------------

  test("bc form agrees with the literal form and the driver-side filter") {
    val s = spark
    import s.implicits._
    val members = (1 to 200).map(i => s"held gram $i")
    val probes = members ++ (1 to 500).map(i => s"fresh gram $i") ++
      Seq("", "类别A äöü€", "a" * 500)
    val bf = buildFilter(members)
    val bytes = MightContainBloom.serialize(bf)
    val bc = s.sparkContext.broadcast(bf)
    val got = probes.toDF("g")
      .select(col("g"),
        MightContainBloomBc.onCol(bc, col("g")).as("viaBc"),
        call_function("might_contain_bloom", lit(bytes), col("g")).as("viaLit"))
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    got.foreach { case (g, viaBc, viaLit) =>
      assert(viaBc == viaLit, s"bc/literal disagreement on '$g'")
      assert(viaBc == bf.mightContainString(g), s"bc disagrees with filter on '$g'")
    }
    members.foreach(m =>
      assert(got.find(_._1 == m).get._2, s"bc false negative on member '$m'"))
  }

  test("bc form: codegen and interpreted paths agree; null value -> null") {
    val s = spark
    import s.implicits._
    val bf = buildFilter((1 to 50).map(i => s"m$i"))
    val bc = s.sparkContext.broadcast(bf)
    val df = ((1 to 50).map(i => s"m$i") ++ (1 to 50).map(i => s"x$i")).toDF("g")
    def run() = df.select(MightContainBloomBc.onCol(bc, col("g")).as("m"))
      .collect().map(_.getBoolean(0)).toSeq
    val prev = s.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    val codegenOnly = try {
      s.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      run()
    } finally s.conf.set("spark.sql.codegen.factoryMode", prev)
    val interpreted = try {
      s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      run()
    } finally s.conf.set("spark.sql.codegen.factoryMode", prev)
    assert(codegenOnly == interpreted)
    assert(codegenOnly.count(identity) >= 50) // all members hit
    val rNull = Seq(Tuple1("a")).toDF("g")
      .select(MightContainBloomBc.onCol(bc, lit(null).cast("string")).as("m"))
      .collect().head
    assert(rNull.isNullAt(0))
  }

  test("decontaminate_bloom's prune rides the broadcast handle, not a plan literal") {
    val dir = "/root/testdata/sf0.001"
    val plan = graft.ops.PipelineOps.decontaminateBloom(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain_bloom_bc"),
      "prune must be the broadcast-handle expression")
    graft.HarnessUtil.releaseAll(spark)
  }
}
