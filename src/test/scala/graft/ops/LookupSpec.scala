package graft.ops

import graft.SparkSpec
import java.util.concurrent.atomic.AtomicInteger

class LookupSpec extends SparkSpec {

  test("S9: mapPartitions point-lookup enrichment, one client per partition") {
    val s = spark
    import s.implicits._
    LookupSpec.opened.set(0)
    val ds = s.range(100).map(i => s"JD$i").repartition(4)
    val out = Lookup.enrich(ds, () => LookupSpec.newClient())(identity) {
      (code, siteName) => (code, siteName.getOrElse("MISS"))
    }.collect().toMap
    assert(out("JD7") == "site-of-JD7")
    assert(out("JD99") == "site-of-JD99")
    // exactly one client per partition, never per record
    assert(LookupSpec.opened.get() == 4, s"opened ${LookupSpec.opened.get()} clients")
  }

  test("S9 pipelined: getAll chunks cut round-trips to ceil(rows/batch) per partition") {
    val s = spark
    import s.implicits._
    LookupSpec.opened.set(0)
    LookupSpec.roundTrips.set(0)
    LookupSpec.maxChunk.set(0)
    val ds = s.range(100).map(i => s"JD$i").repartition(4) // 25 rows per partition
    val out = Lookup.enrichBatched(ds, () => LookupSpec.newClient(), batchSize = 10)(identity) {
      (code, siteName) => (code, siteName.getOrElse("MISS"))
    }.collect().toMap
    assert(out.size == 100)
    assert(out("JD7") == "site-of-JD7")
    assert(out("JD99") == "site-of-JD99")
    assert(LookupSpec.opened.get() == 4, s"opened ${LookupSpec.opened.get()} clients")
    // 4 partitions x ceil(25/10)=3 chunks — 12 store round-trips for 100
    // rows, where per-key gets would make 100
    assert(LookupSpec.roundTrips.get() == 12,
      s"expected 12 batched round-trips, got ${LookupSpec.roundTrips.get()}")
    assert(LookupSpec.maxChunk.get() <= 10, s"chunk exceeded batchSize: ${LookupSpec.maxChunk.get()}")
  }
}

object LookupSpec {
  val opened = new AtomicInteger(0) // static: visible to executor threads in local mode
  val roundTrips = new AtomicInteger(0)
  val maxChunk = new AtomicInteger(0)

  def newClient(): Lookup.KvClient[String] = {
    opened.incrementAndGet()
    new Lookup.KvClient[String] {
      def get(key: String): Option[String] = Some(s"site-of-$key")
      override def getAll(keys: Seq[String]): Seq[Option[String]] = {
        roundTrips.incrementAndGet()
        maxChunk.getAndAccumulate(keys.length, math.max)
        keys.map(get)
      }
      def close(): Unit = ()
    }
  }
}
