package graft.streaming

import graft.ops.Prims
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** E3 — the reference's capability centerpiece: six partial waybill
  * streams progressively enriched into one wide `BdWaybillOrder`
  * (reference: test/StateTest.java:638-873):
  *
  *   C ⊕ E ⊕ M  --union+keyed merge-->  CEM            (stage A, :648-698)
  *   CEM ⋈ RouteLink (buffering CoFlatMap) → CEMRouteLink (stage B, :700-762)
  *   WaybillOrder ⋈ Order (keyed by orderId)            (stage C, :764-797)
  *   CEMRouteLink ⋈ order-info (keyed by waybillCode) → BdWaybillOrder
  *                                                      (stage D, :799-869)
  *
  * Each stage is a `flatMapGroupsWithState` handler over an
  * Either-tagged union — exactly Flink's connect + Co(Flat)Map with
  * keyed state. The same handlers run in batch (state machines execute
  * per key over the full iterator — what `SparkEntry.queries("enrich_dag")`
  * verifies against a DuckDB join oracle) and in Structured Streaming
  * (per micro-batch, tested with MemoryStream).
  *
  * Scale: every stage shuffles once on its key; state per key is
  * bounded (one CEM + ≤5 packages + 1 order) — the Flink keyed-state
  * shape, sharded by the hash exchange.
  */
object EnrichDag {
  import EnrichState.{Cem, In => BIn, Out => CemRouteLink, RouteLink}

  // ---- stage A: C ⊕ E ⊕ M null-coalescing merge ----------------------

  /** Tagged partial-CEM input (projections of C/E/M, :648-681). */
  final case class PartIn(waybillCode: String, seq: Long, cem: Cem)

  /** Rolling merge per key; emits the merged-so-far CEM once per
    * invocation (≈ per micro-batch; the final row in batch). */
  def mergeHandle(key: String, events: Iterator[PartIn],
                  state: GroupState[Cem]): Iterator[Cem] = {
    var acc = state.getOption.getOrElse(
      Cem(key, null, null, null, null, null, null, None, None))
    events.toSeq.sortBy(_.seq).foreach { e =>
      val c = e.cem
      acc = Cem(key,
        Option(c.waybillSign).getOrElse(acc.waybillSign),
        Option(c.siteCode).getOrElse(acc.siteCode),
        Option(c.siteName).getOrElse(acc.siteName),
        Option(c.busiNo).getOrElse(acc.busiNo),
        Option(c.busiName).getOrElse(acc.busiName),
        Option(c.sendPay).getOrElse(acc.sendPay),
        c.pickupTs.orElse(acc.pickupTs),
        c.deliveryTs.orElse(acc.deliveryTs))
    }
    state.update(acc)
    Iterator.single(acc)
  }

  def mergeCem(parts: Dataset[PartIn]): Dataset[Cem] = {
    implicit val e1 = Encoders.product[Cem]
    implicit val k = Encoders.STRING
    parts.groupByKey(_.waybillCode)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(mergeHandle)
  }

  // ---- stage C: WaybillOrder ⋈ Order keyed by orderId ----------------

  final case class OrderIn(orderId: String, seq: Long,
                           waybillCode: Option[String], createTs: Option[Long])
  final case class OrderInfo(waybillCode: String, orderCode: String, createTs: Long)
  final case class OrderBuf(waybills: Vector[String], createTs: Option[Long])

  /** ListState of waybills + ValueState of the order (:764-797): emit
    * (waybill, order, createTime) as soon as both sides are known. */
  def orderHandle(key: String, events: Iterator[OrderIn],
                  state: GroupState[OrderBuf]): Iterator[OrderInfo] = {
    var buf = state.getOption.getOrElse(OrderBuf(Vector.empty, None))
    val out = Vector.newBuilder[OrderInfo]
    events.toSeq.sortBy(_.seq).foreach { e =>
      (e.waybillCode, e.createTs) match {
        case (Some(w), _) =>
          buf.createTs match {
            case Some(ts) => out += OrderInfo(w, key, ts)
            case None => buf = buf.copy(waybills = buf.waybills :+ w)
          }
        case (_, Some(ts)) =>
          buf.waybills.foreach(w => out += OrderInfo(w, key, ts))
          buf = OrderBuf(Vector.empty, Some(ts))
        case _ =>
      }
    }
    state.update(buf)
    out.result().iterator
  }

  def linkOrders(ins: Dataset[OrderIn]): Dataset[OrderInfo] = {
    implicit val e1 = Encoders.product[OrderInfo]
    implicit val eb = Encoders.product[OrderBuf]
    implicit val k = Encoders.STRING
    ins.groupByKey(_.orderId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(orderHandle)
  }

  // ---- stage D: final assembly keyed by waybillCode ------------------

  final case class FinalIn(waybillCode: String, seq: Long,
                           link: Option[CemRouteLink], order: Option[OrderInfo])
  final case class BdWaybillOrder(
      waybillCode: String, waybillSign: String, siteCode: String,
      siteName: String, busiNo: String, busiName: String, sendPay: String,
      pickupTs: Option[Long], deliveryTs: Option[Long],
      packageCode: Option[String], staticDeliveryTs: Option[Long],
      orderCode: String, orderCreateTs: Long)
  final case class FinalBuf(links: Vector[CemRouteLink], order: Option[OrderInfo])

  /** ListState of CEMRouteLinks + ValueState of order info (:799-869):
    * order arrival flushes buffered links; links after the order join
    * immediately. */
  def finalHandle(key: String, events: Iterator[FinalIn],
                  state: GroupState[FinalBuf]): Iterator[BdWaybillOrder] = {
    var buf = state.getOption.getOrElse(FinalBuf(Vector.empty, None))
    val out = Vector.newBuilder[BdWaybillOrder]
    def assemble(l: CemRouteLink, o: OrderInfo) = BdWaybillOrder(
      key, l.waybillSign, l.siteCode, l.siteName, l.busiNo, l.busiName,
      l.sendPay, l.pickupTs, l.deliveryTs, l.packageCode, l.staticDeliveryTs,
      o.orderCode, o.createTs)
    events.toSeq.sortBy(_.seq).foreach { e =>
      (e.link, e.order) match {
        case (Some(l), _) =>
          buf.order match {
            case Some(o) => out += assemble(l, o)
            case None => buf = buf.copy(links = buf.links :+ l)
          }
        case (_, Some(o)) =>
          buf.links.foreach(l => out += assemble(l, o))
          buf = FinalBuf(Vector.empty, Some(o))
        case _ =>
      }
    }
    state.update(buf)
    out.result().iterator
  }

  def assembleFinal(ins: Dataset[FinalIn]): Dataset[BdWaybillOrder] = {
    implicit val e1 = Encoders.product[BdWaybillOrder]
    implicit val eb = Encoders.product[FinalBuf]
    implicit val k = Encoders.STRING
    ins.groupByKey(_.waybillCode)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(finalHandle)
  }

  // ---- streaming deployment: stages chained through file handoff -----
  //
  // Spark disallows chaining flatMapGroupsWithState stages inside ONE
  // streaming query, so a streaming deployment runs each stage as its
  // own query, handing records to the next stage through a parquet
  // directory (the bronze/silver layered pattern): stage N appends
  // files + checkpoint, stage N+1 readStream-tails the directory. Each
  // stage recovers independently from its checkpoint.

  /** Stage A as a standalone query: merged CEMs appended to `outDir`. */
  def stageAToFiles(parts: Dataset[PartIn], outDir: String, ckpt: String) =
    mergeCem(parts).writeStream
      .format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

  /** Stage B input from stage A's files + a live link stream. */
  def stageBFromFiles(s: SparkSession, cemDir: String,
                      links: Dataset[BIn], cemSeq: Long = 1000000L): Dataset[CemRouteLink] = {
    implicit val eBIn = Encoders.product[BIn]
    val cems = s.readStream.schema(Encoders.product[Cem].schema).parquet(cemDir)
      .select(col("waybillCode"), lit(cemSeq).as("seq"),
        struct(col("*")).as("cem"),
        lit(null).cast(Encoders.product[RouteLink].schema.sql).as("link"))
      .as[BIn]
    EnrichState(cems.unionByName(links))
  }

  // ---- the full DAG as a batch query with a DuckDB oracle ------------

  private val N = 200L

  /** Deterministic six-source fixture both engines can regenerate:
    * all "random" fields derive from Prims.hash60 on counter strings. */
  private def sources(s: SparkSession): (Dataset[PartIn], Dataset[BIn], Dataset[OrderIn]) = {
    import s.implicits._
    def h(prefix: String) = pmod(Prims.hash60(concat(lit(prefix), col("n"))), lit(1000000L))
    val base = s.range(N).select(col("id").as("n"),
      concat(lit("JD"), lpad(col("id").cast("string"), 10, "0")).as("wc"),
      concat(lit("Order"), lpad(col("id").cast("string"), 10, "0")).as("oid"))
    implicit val ePart = Encoders.product[PartIn]
    implicit val eB = Encoders.product[BIn]
    implicit val eO = Encoders.product[OrderIn]

    val cPart = base.select(col("wc"), lit(1L).as("seq"), struct(
      col("wc").as("waybillCode"),
      h("sign").cast("string").as("waybillSign"),
      (pmod(Prims.hash60(concat(lit("site"), col("n"))), lit(9L)) + 1).cast("string").as("siteCode"),
      concat(lit("site_"), (pmod(Prims.hash60(concat(lit("site"), col("n"))), lit(9L)) + 1)).as("siteName"),
      lit(null).cast("string").as("busiNo"), lit(null).cast("string").as("busiName"),
      lit(null).cast("string").as("sendPay"),
      lit(null).cast("long").as("pickupTs"), lit(null).cast("long").as("deliveryTs")).as("cem"))
    val ePartDf = base.select(col("wc"), lit(2L).as("seq"), struct(
      col("wc").as("waybillCode"), lit(null).cast("string").as("waybillSign"),
      lit(null).cast("string").as("siteCode"), lit(null).cast("string").as("siteName"),
      (pmod(Prims.hash60(concat(lit("busi"), col("n"))), lit(99L)) + 1).cast("string").as("busiNo"),
      concat(lit("merchant_"), (pmod(Prims.hash60(concat(lit("busi"), col("n"))), lit(99L)) + 1)).as("busiName"),
      h("pay").cast("string").as("sendPay"),
      lit(null).cast("long").as("pickupTs"), lit(null).cast("long").as("deliveryTs")).as("cem"))
    val mPart = base.select(col("wc"), lit(3L).as("seq"), struct(
      col("wc").as("waybillCode"), lit(null).cast("string").as("waybillSign"),
      lit(null).cast("string").as("siteCode"), lit(null).cast("string").as("siteName"),
      lit(null).cast("string").as("busiNo"), lit(null).cast("string").as("busiName"),
      lit(null).cast("string").as("sendPay"),
      (col("n") * 1000 + 7).as("pickupTs"), (col("n") * 1000 + 9).as("deliveryTs")).as("cem"))
    val parts = cPart.unionByName(ePartDf).unionByName(mPart)
      .toDF("waybillCode", "seq", "cem").as[PartIn]

    // route links: 5 per waybill, seq BEFORE the merged CEM's arrival at
    // stage B (links buffer, CEM flushes — the reference's buffering path)
    val linkIns = base
      .select(col("wc"), explode(sequence(lit(1L), lit(5L))).as("i"), col("n"))
      .select(col("wc").as("waybillCode"), col("i").as("seq"),
        lit(null).cast(Encoders.product[Cem].schema.sql).as("cem"),
        struct(col("wc").as("waybillCode"),
          concat(col("wc"), lit("-"), col("i")).as("packageCode"),
          (col("n") * 1000 + col("i")).as("staticDeliveryTs")).as("link"))
      .as[BIn]

    val orderIns = base.select(col("oid").as("orderId"), lit(1L).as("seq"),
        col("wc").as("waybillCode"), lit(null).cast("long").as("createTs"))
      .unionByName(base.select(col("oid").as("orderId"), lit(2L).as("seq"),
        lit(null).cast("string").as("waybillCode"), (col("n") * 1000).as("createTs")))
      .as[OrderIn]
    (parts, linkIns, orderIns)
  }

  /** The complete four-stage DAG, batch mode (driver-oracle form). */
  def enrichDag(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val eBIn = Encoders.product[BIn]
    implicit val eFin = Encoders.product[FinalIn]
    val (parts, linkIns, orderIns) = sources(s)
    val cems = mergeCem(parts)                       // stage A
    val cemIns = cems.select(col("waybillCode"), lit(1000L).as("seq"),
        struct(col("*")).as("cem"),
        lit(null).cast(Encoders.product[RouteLink].schema.sql).as("link")).as[BIn]
    val cemLinks = EnrichState(cemIns.unionByName(linkIns))  // stage B
    val orderInfo = linkOrders(orderIns)             // stage C
    val finalIns = cemLinks
      .select(col("waybillCode"),
        coalesce(col("staticDeliveryTs"), lit(999999L)).as("seq"), // bare-CEM rows carry no link ts
        struct(col("*")).as("link"),
        lit(null).cast(Encoders.product[OrderInfo].schema.sql).as("order"))
      .unionByName(orderInfo.select(col("waybillCode"), lit(1000000L).as("seq"),
        lit(null).cast(Encoders.product[CemRouteLink].schema.sql).as("link"),
        struct(col("*")).as("order")))
      .as[FinalIn]
    assembleFinal(finalIns)                          // stage D
      .select("waybillCode", "waybillSign", "siteCode", "siteName",
        "busiNo", "busiName", "sendPay", "pickupTs", "deliveryTs",
        "packageCode", "staticDeliveryTs", "orderCode", "orderCreateTs")
      .orderBy("waybillCode", "packageCode")
  }

  /** DuckDB oracle: regenerate the six sources from range() with the
    * same hash60 arithmetic and express the DAG as joins (the batch
    * formulation SURVEY §3 E3 prescribes). */
  def enrichDagSql: String = {
    def h(prefix: String) = Prims.hash60Sql(s"'$prefix' || CAST(n AS VARCHAR)")
    s"""WITH base AS (
       |  SELECT n, 'JD' || lpad(CAST(n AS VARCHAR), 10, '0') AS wc,
       |         'Order' || lpad(CAST(n AS VARCHAR), 10, '0') AS oid
       |  FROM (SELECT unnest(range(0, $N)) AS n)),
       |enriched AS (
       |  SELECT n, wc, oid,
       |    CAST(${h("sign")} % 1000000 AS VARCHAR) AS waybillSign,
       |    CAST(${h("site")} % 9 + 1 AS VARCHAR) AS siteCode,
       |    'site_' || CAST(${h("site")} % 9 + 1 AS VARCHAR) AS siteName,
       |    CAST(${h("busi")} % 99 + 1 AS VARCHAR) AS busiNo,
       |    'merchant_' || CAST(${h("busi")} % 99 + 1 AS VARCHAR) AS busiName,
       |    CAST(${h("pay")} % 1000000 AS VARCHAR) AS sendPay,
       |    n * 1000 + 7 AS pickupTs, n * 1000 + 9 AS deliveryTs,
       |    n * 1000 AS orderCreateTs
       |  FROM base),
       |links AS (
       |  SELECT n, wc, wc || '-' || CAST(i AS VARCHAR) AS packageCode,
       |         n * 1000 + i AS staticDeliveryTs
       |  FROM base, unnest(range(1, 6)) AS t(i))
       |SELECT e.wc AS waybillCode, e.waybillSign, e.siteCode, e.siteName,
       |  e.busiNo, e.busiName, e.sendPay, e.pickupTs, e.deliveryTs,
       |  l.packageCode, l.staticDeliveryTs, e.oid AS orderCode, e.orderCreateTs
       |FROM enriched e JOIN links l ON e.n = l.n
       |ORDER BY waybillCode, packageCode""".stripMargin
  }
}
