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
}

object LookupSpec {
  val opened = new AtomicInteger(0) // static: visible to executor threads in local mode

  def newClient(): Lookup.KvClient[String] = {
    opened.incrementAndGet()
    new Lookup.KvClient[String] {
      def get(key: String): Option[String] = Some(s"site-of-$key")
      def close(): Unit = ()
    }
  }
}
