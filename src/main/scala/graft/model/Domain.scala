package graft.model

/** The reference's complete entity catalog as Spark-encodable case
  * classes (SURVEY.md §1.3; reference: the main/domain Java POJOs). Timestamps
  * are epoch-millis Longs (the reference's `timeStamp` convention) or
  * java.sql.Timestamp where the reference used java.util.Date.
  *
  * A user of the reference keeps their domain vocabulary: every type
  * here mirrors the Java POJO field-for-field and carries a Product
  * encoder, so `spark.createDataset(Seq(WaybillC(...)))` and
  * `ds.as[BdWaybillOrder]` work directly.
  */
object Domain {

  /** reference: main/domain/WaybillC.java:6-14 */
  final case class WaybillC(waybillCode: String, waybillSign: String,
                            siteCode: String, siteName: String,
                            timeStamp: Long, watermark: Long)

  /** reference: main/domain/WaybillE.java:6-13 */
  final case class WaybillE(waybillCode: String, busiNo: String,
                            busiName: String, sendPay: String,
                            timeStamp: Long, watermark: Long)

  /** reference: main/domain/WaybillM.java:8-12 */
  final case class WaybillM(waybillCode: String,
                            pickupDate: Option[java.sql.Timestamp],
                            deliveryDate: Option[java.sql.Timestamp])

  /** reference: main/domain/WaybillRouteLink.java:8-13 */
  final case class WaybillRouteLink(waybillCode: String, packageCode: String,
                                    staticDeliveryTime: Option[java.sql.Timestamp])

  /** reference: main/domain/WaybillOrder.java:6-10 */
  final case class WaybillOrder(orderId: String, waybillCode: String)

  /** reference: main/domain/Order.java:7-11 */
  final case class Order(orderCode: String, createTime: Option[java.sql.Timestamp])

  /** reference: main/domain/WaybillCEM.java:7-17 (C ⊕ E ⊕ M union) */
  final case class WaybillCEM(waybillCode: String, waybillSign: String,
                              siteCode: String, siteName: String,
                              busiNo: String, busiName: String, sendPay: String,
                              pickupDate: Option[java.sql.Timestamp],
                              deliveryDate: Option[java.sql.Timestamp])

  /** reference: main/domain/WaybillCEMRouteLink.java:7-19 */
  final case class WaybillCEMRouteLink(waybillCode: String, waybillSign: String,
                                       siteCode: String, siteName: String,
                                       busiNo: String, busiName: String, sendPay: String,
                                       pickupDate: Option[java.sql.Timestamp],
                                       deliveryDate: Option[java.sql.Timestamp],
                                       packageCode: String,
                                       staticDeliveryTime: Option[java.sql.Timestamp])

  /** reference: main/domain/BdWaybillOrder.java:12-25 — the final wide
    * row; `timestamp` is epoch millis, matching the ES date mapping. */
  final case class BdWaybillOrder(waybillCode: String, waybillSign: String,
                                  siteCode: String, siteName: String,
                                  busiNo: String, busiName: String, sendPay: String,
                                  pickupDate: Option[java.sql.Timestamp],
                                  deliveryDate: Option[java.sql.Timestamp],
                                  orderCreateDate: Option[java.sql.Timestamp],
                                  orderCode: String, packageCode: String,
                                  timestamp: Long)

  /** reference: main/domain/ProductIncome.java:10-14 (detail: Integer[]) */
  final case class ProductIncome(productName: String, income: Int,
                                 summary: Int, detail: Seq[Int])

  /** reference: main/domain/ProductSale.java:10-12 */
  final case class ProductSale(productName: String, sale: Double)
}
