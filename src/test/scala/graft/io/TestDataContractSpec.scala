package graft.io

import graft.{SparkSpec, Tables}

/** Pin the driver-testdata contract in ONE place. The driver has regenerated
  * `/root/testdata` mid-project once already (round 10: `events.ts` flipped
  * from parquet TIMESTAMP(NANOS) to timestamp[us]) and the breakage surfaced
  * as 6 scattered spec failures plus 18 erroring queries. This spec asserts
  * every table's loader-visible schema and sf0.001 row count up front, so the
  * next regeneration fails HERE first, with a message naming the drifted
  * column — not deep inside an operator spec.
  *
  * The schemas are as seen through `Tables.apply`/`Tables.events` (i.e. after
  * the loader's ts normalization), which is the shape every operator consumes.
  */
class TestDataContractSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private val expectedSchemas: Map[String, String] = Map(
    "region"     -> "r_regionkey:int r_name:string",
    "nation"     -> "n_nationkey:int n_name:string n_regionkey:int",
    "customer"   -> "c_custkey:bigint c_name:string c_nationkey:int c_acctbal:double c_mktsegment:string",
    "supplier"   -> "s_suppkey:bigint s_name:string s_nationkey:int s_acctbal:double",
    "part"       -> "p_partkey:bigint p_name:string p_brand:string p_type:string p_size:int p_retailprice:double",
    "orders"     -> "o_orderkey:bigint o_custkey:bigint o_orderstatus:string o_totalprice:double o_orderdate:timestamp_ntz o_orderpriority:string",
    "lineitem"   -> ("l_orderkey:bigint l_partkey:bigint l_suppkey:bigint l_linenumber:int l_quantity:double " +
                     "l_extendedprice:double l_discount:double l_tax:double l_returnflag:string l_linestatus:string l_shipdate:timestamp_ntz"),
    "events"     -> "event_id:bigint ts:timestamp user_id:bigint event_type:string value:double props:string",
    "documents"  -> "doc_id:bigint text:string lang:string source:string n_chars:bigint",
    "embeddings" -> "vec_id:bigint embedding:array<float> label:int")

  private val expectedRows: Map[String, Long] = Map(
    "region" -> 5L, "nation" -> 25L, "customer" -> 150L, "supplier" -> 10L,
    "part" -> 200L, "orders" -> 1500L, "lineitem" -> 6000L, "events" -> 1000L,
    "documents" -> 500L, "embeddings" -> 500L)

  private def load(name: String) =
    if (name == "events") Tables.events(spark, sfDir) else Tables(spark, sfDir, name)

  test("testdata contract: every table's loader-visible schema matches the pinned shape") {
    val drifted = Tables.names.flatMap { name =>
      val actual = load(name).schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(" ")
      if (actual == expectedSchemas(name)) None
      else Some(s"$name\n  expected: ${expectedSchemas(name)}\n  actual:   $actual")
    }
    assert(drifted.isEmpty,
      s"\nTESTDATA SCHEMA DRIFT (driver regenerated /root/testdata?):\n${drifted.mkString("\n")}")
  }

  test("testdata contract: sf0.001 row counts match the pinned generation") {
    val drifted = Tables.names.flatMap { name =>
      val n = load(name).count()
      if (n == expectedRows(name)) None else Some(s"$name: expected ${expectedRows(name)}, got $n")
    }
    assert(drifted.isEmpty,
      s"\nTESTDATA ROW-COUNT DRIFT (driver regenerated /root/testdata?):\n${drifted.mkString("\n")}")
  }
}
