package graft.pipeline

import org.apache.spark.internal.Logging

/** AWS Kinesis PutRecords adapter for [[AvroSink.RecordSink]] — the last
  * reference component (KinesisClient wrapper,
  * lib/pipeline_controller.py:79-82,243-244) expressed as code rather
  * than a deploy-time comment.
  *
  * PutRecords is a PARTIAL-success API: a 200 response can still carry
  * per-record failures (`FailedRecordCount` > 0, per-entry `ErrorCode`),
  * which a naive sink would silently drop. The retry loop here re-sends
  * exactly the failed entries with exponential backoff and throws after
  * `maxRetries` so the streaming query fails the batch (at-least-once,
  * consistent with the sink-before-state rule in graft.streaming)
  * rather than losing records.
  *
  * The AWS SDK v2 is bound REFLECTIVELY (class names only, resolved
  * lazily per executor at first send): this module stays
  * dependency-free and compiles in offline builds, while a deployment
  * that ships `software.amazon.awssdk:kinesis` on the executor
  * classpath gets the real client with no code change. A missing SDK
  * fails fast with the artifact name. The delivery logic itself is
  * SDK-agnostic — `sendOnce` is injectable, which is also how the spec
  * drives partial-failure scenarios without AWS.
  *
  * Partition keys are the md5 hex of each record's bytes: deterministic
  * (a replayed batch lands on the same shards) and uniformly spread.
  */
object KinesisSink extends Logging {

  /** One PutRecords attempt: deliver (partitionKey, data) entries,
    * return the 0-based indices that FAILED (empty = all accepted).
    */
  type PutCall = IndexedSeq[(String, Array[Byte])] => Seq[Int]

  /** Deliver one chunk with partial-failure retries. Exposed for the
    * spec; [[KinesisRecordSink]] wires it to the reflective SDK call.
    *
    * @return number of attempts used (≥ 1)
    */
  def deliverWithRetries(entries: IndexedSeq[(String, Array[Byte])],
                         put: PutCall, maxRetries: Int,
                         backoffMs: Long => Long = att => 100L << att,
                         sleep: Long => Unit = Thread.sleep): Int = {
    var pending = entries
    var attempt = 0
    while (pending.nonEmpty) {
      if (attempt > maxRetries)
        throw new java.io.IOException(
          s"Kinesis PutRecords: ${pending.length} records still failing " +
            s"after $maxRetries retries")
      if (attempt > 0) sleep(backoffMs(attempt - 1))
      val failed = put(pending)
      require(failed.forall(i => i >= 0 && i < pending.length),
        s"putCall returned out-of-range indices: $failed")
      pending = failed.distinct.sorted.map(pending).toIndexedSeq
      attempt += 1
    }
    attempt
  }

  def partitionKey(data: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(data).map("%02x".format(_)).mkString
  }

  /** Build a sink from a stream ARN
    * (`arn:aws:kinesis:<region>:<account>:stream/<name>`) — the shape
    * the reference configures (KINESIS_STREAM_ARN,
    * lib/pipeline_controller.py:81).
    */
  def fromStreamArn(arn: String, maxRetries: Int = 3): KinesisRecordSink =
    arn.split(":", 6) match {
      case Array("arn", _, "kinesis", region, _, res) if res.startsWith("stream/") =>
        new KinesisRecordSink(res.stripPrefix("stream/"), region, maxRetries)
      case _ => throw new IllegalArgumentException(
        s"not a Kinesis stream ARN (want arn:aws:kinesis:<region>:<acct>:stream/<name>): $arn")
    }
}

/** [[AvroSink.RecordSink]] delivering to an AWS Kinesis stream via the
  * SDK v2 PutRecords API (see [[KinesisSink]] for the delivery/retry
  * semantics). Serializable: executors each build their own client on
  * first use; only the configuration strings ship in the closure.
  *
  * @param sendOnce test seam — overrides the reflective SDK call. Left
  *                 at None in production.
  */
final class KinesisRecordSink(streamName: String, region: String,
                              maxRetries: Int = 3,
                              sendOnce: Option[KinesisSink.PutCall] = None)
    extends AvroSink.RecordSink with Logging {

  override def putRecords(records: Seq[Array[Byte]]): Unit = {
    require(records.length <= 500,
      s"PutRecords accepts at most 500 records per call, got ${records.length}" +
        " (AvroSink.write chunks to maxBatch=500 — do not bypass it)")
    if (records.isEmpty) return
    val entries = records.iterator
      .map(b => (KinesisSink.partitionKey(b), b)).toIndexedSeq
    val attempts = KinesisSink.deliverWithRetries(
      entries, sendOnce.getOrElse(sdkPut), maxRetries)
    if (attempts > 1)
      logWarning(s"Kinesis: ${records.length} records to $streamName " +
        s"needed $attempts attempts")
  }

  // --- reflective SDK v2 binding (lazy, per-JVM) --------------------------
  // software.amazon.awssdk.services.kinesis.KinesisClient.builder()
  //   .region(Region.of(region)).build()
  @transient private lazy val sdk: SdkHandles =
    try {
      val regionCls = Class.forName("software.amazon.awssdk.regions.Region")
      val regionObj = regionCls.getMethod("of", classOf[String]).invoke(null, region)
      val clientCls = Class.forName(
        "software.amazon.awssdk.services.kinesis.KinesisClient")
      val builder = clientCls.getMethod("builder").invoke(null)
      builder.getClass.getMethod("region", regionCls).invoke(builder, regionObj)
      val client = builder.getClass.getMethod("build").invoke(builder)
      SdkHandles(client,
        Class.forName("software.amazon.awssdk.services.kinesis.model.PutRecordsRequest"),
        Class.forName("software.amazon.awssdk.services.kinesis.model.PutRecordsRequestEntry"),
        Class.forName("software.amazon.awssdk.core.SdkBytes"))
    } catch {
      case e: ClassNotFoundException =>
        throw new IllegalStateException(
          "KinesisRecordSink needs software.amazon.awssdk:kinesis (SDK v2) " +
            "on the executor classpath; add it to the deployment assembly " +
            s"(missing: ${e.getMessage})", e)
    }

  private case class SdkHandles(client: AnyRef, reqCls: Class[_],
                                entryCls: Class[_], bytesCls: Class[_])

  private def sdkPut: KinesisSink.PutCall = { entries =>
    val h = sdk
    val entryBuilderM = h.entryCls.getMethod("builder")
    val sdkEntries = new java.util.ArrayList[AnyRef](entries.length)
    entries.foreach { case (key, data) =>
      val bytes = h.bytesCls.getMethod("fromByteArray", classOf[Array[Byte]])
        .invoke(null, data)
      var b = entryBuilderM.invoke(null)
      b = b.getClass.getMethod("data", h.bytesCls).invoke(b, bytes)
      b = b.getClass.getMethod("partitionKey", classOf[String]).invoke(b, key)
      sdkEntries.add(b.getClass.getMethod("build").invoke(b))
    }
    var rb = h.reqCls.getMethod("builder").invoke(null)
    rb = rb.getClass.getMethod("streamName", classOf[String]).invoke(rb, streamName)
    rb = rb.getClass.getMethod("records", classOf[java.util.Collection[_]])
      .invoke(rb, sdkEntries)
    val req = rb.getClass.getMethod("build").invoke(rb)
    val resp = h.client.getClass
      .getMethod("putRecords", h.reqCls).invoke(h.client, req)
    val failedCount = resp.getClass.getMethod("failedRecordCount")
      .invoke(resp).asInstanceOf[java.lang.Integer].intValue()
    if (failedCount == 0) Nil
    else {
      val results = resp.getClass.getMethod("records").invoke(resp)
        .asInstanceOf[java.util.List[AnyRef]]
      (0 until results.size()).filter { i =>
        val r = results.get(i)
        r.getClass.getMethod("errorCode").invoke(r) != null
      }
    }
  }
}
