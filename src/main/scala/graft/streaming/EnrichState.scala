package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's flagship stateful operator: asymmetric two-stream
  * enrichment join (connect + RichCoFlatMapFunction, reference:
  * main/func/flat/FlatMapTest.java:22-96) re-expressed as a single
  * `flatMapGroupsWithState` over an Either-tagged union.
  *
  *   - CEM arrival  → store in state; flush & clear any buffered route
  *     links (one output per link), or emit the bare CEM if none buffered.
  *   - Link arrival → if CEM known, emit the joined row immediately;
  *     otherwise buffer the link until the CEM shows up.
  *
  * This is exactly Flink's ValueState[CEM] + MapState[package, ts] pair,
  * folded into one state case class. State TTL (J6) maps to
  * ProcessingTimeTimeout; checkpointing (J7) to the query's
  * checkpointLocation. Scale: state is per-waybill (small, bounded by
  * packages-per-waybill), hash-partitioned across executors by the
  * groupByKey — the same shape as Flink's keyed state backend.
  */
object EnrichState {

  /** Partial CEM record (C⊕E⊕M union, reference: main/domain/WaybillCEM.java). */
  final case class Cem(waybillCode: String, waybillSign: String,
                       siteCode: String, siteName: String,
                       busiNo: String, busiName: String, sendPay: String,
                       pickupTs: Option[Long], deliveryTs: Option[Long])

  /** Package route link (reference: main/domain/WaybillRouteLink.java). */
  final case class RouteLink(waybillCode: String, packageCode: String,
                             staticDeliveryTs: Long)

  /** Either-tagged union input; seq fixes intra-batch arrival order. */
  final case class In(waybillCode: String, seq: Long,
                      cem: Option[Cem], link: Option[RouteLink])

  /** Joined output (reference: main/domain/WaybillCEMRouteLink.java). */
  final case class Out(waybillCode: String, waybillSign: String,
                       siteCode: String, siteName: String,
                       busiNo: String, busiName: String, sendPay: String,
                       pickupTs: Option[Long], deliveryTs: Option[Long],
                       packageCode: Option[String], staticDeliveryTs: Option[Long])

  final case class Buf(cem: Option[Cem], links: Map[String, Long])

  private def joined(c: Cem, pkg: Option[(String, Long)]): Out =
    Out(c.waybillCode, c.waybillSign, c.siteCode, c.siteName,
      c.busiNo, c.busiName, c.sendPay, c.pickupTs, c.deliveryTs,
      pkg.map(_._1), pkg.map(_._2))

  /** The state-machine handler (public so tests can drive it directly). */
  def handle(key: String, events: Iterator[In], state: GroupState[Buf]): Iterator[Out] = {
    var buf = state.getOption.getOrElse(Buf(None, Map.empty))
    val out = Vector.newBuilder[Out]
    events.toSeq.sortBy(_.seq).foreach { e =>
      (e.cem, e.link) match {
        case (Some(c), _) => // flatMap1: store CEM, flush buffered links
          if (buf.links.nonEmpty) {
            buf.links.toSeq.sortBy(_._1).foreach(l => out += joined(c, Some(l)))
            buf = Buf(Some(c), Map.empty)
          } else {
            out += joined(c, None)
            buf = buf.copy(cem = Some(c))
          }
        case (_, Some(l)) => // flatMap2: join if CEM known, else buffer
          buf.cem match {
            case Some(c) => out += joined(c, Some((l.packageCode, l.staticDeliveryTs)))
            case None => buf = buf.copy(links = buf.links + (l.packageCode -> l.staticDeliveryTs))
          }
        case _ => // malformed union row: ignore
      }
    }
    state.update(buf)
    out.result().iterator
  }

  /** Streaming (or batch) application over a typed union Dataset. */
  def apply(ds: Dataset[In]): Dataset[Out] = {
    implicit val outEnc = Encoders.product[Out]
    implicit val bufEnc = Encoders.product[Buf]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.waybillCode)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(handle)
  }
}
