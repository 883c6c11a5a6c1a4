package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** PutRecords delivery semantics: partial-failure retries resend exactly
  * the failed entries, exhaustion throws (fails the streaming batch
  * instead of dropping records), and the reflective SDK binding names
  * the missing artifact when absent.
  */
class KinesisSinkSpec extends AnyFunSuite {

  private def rec(i: Int): Array[Byte] = s"record-$i".getBytes("UTF-8")

  test("all-accepted chunk delivers in one attempt, no sleep") {
    var slept = List.empty[Long]
    val sent = collection.mutable.Buffer.empty[Seq[String]]
    val attempts = KinesisSink.deliverWithRetries(
      (0 until 5).map(i => (s"k$i", rec(i))),
      put = { es => sent += es.map(_._1); Nil },
      maxRetries = 3, sleep = slept :+= _)
    assert(attempts == 1)
    assert(sent.toSeq == Seq(Seq("k0", "k1", "k2", "k3", "k4")))
    assert(slept.isEmpty)
  }

  test("partial failures resend exactly the failed entries, with backoff") {
    var slept = List.empty[Long]
    val sent = collection.mutable.Buffer.empty[Seq[String]]
    var call = 0
    val attempts = KinesisSink.deliverWithRetries(
      (0 until 4).map(i => (s"k$i", rec(i))),
      put = { es =>
        sent += es.map(_._1)
        call += 1
        call match {
          case 1 => Seq(3, 1)      // unordered, resent as k1, k3
          case 2 => Seq(1)         // k3 fails again
          case _ => Nil
        }
      },
      maxRetries = 3, backoffMs = att => 10L * (att + 1), sleep = slept :+= _)
    assert(attempts == 3)
    assert(sent.toSeq == Seq(
      Seq("k0", "k1", "k2", "k3"), Seq("k1", "k3"), Seq("k3")))
    assert(slept == List(10L, 20L))
  }

  test("exhausting maxRetries throws instead of dropping records") {
    val e = intercept[java.io.IOException] {
      KinesisSink.deliverWithRetries(
        Vector(("k0", rec(0)), ("k1", rec(1))),
        put = _ => Seq(0), maxRetries = 2, sleep = _ => ())
    }
    assert(e.getMessage.contains("after 2 retries"))
  }

  test("sink enforces the 500-record PutRecords API cap") {
    val sink = new KinesisRecordSink("s", "us-east-1",
      sendOnce = Some(_ => Nil))
    val e = intercept[IllegalArgumentException] {
      sink.putRecords((0 until 501).map(rec))
    }
    assert(e.getMessage.contains("500"))
    sink.putRecords((0 until 500).map(rec)) // at the cap is fine
    sink.putRecords(Nil)                    // empty chunk is a no-op
  }

  test("sink derives deterministic md5 partition keys and retries through") {
    val seen = collection.mutable.Buffer.empty[IndexedSeq[(String, Array[Byte])]]
    var first = true
    val sink = new KinesisRecordSink("stream", "us-east-1", maxRetries = 2,
      sendOnce = Some { es =>
        seen += es
        if (first) { first = false; Seq(0) } else Nil
      })
    sink.putRecords(Seq(rec(1), rec(2)))
    assert(seen.length == 2)
    assert(seen(0).map(_._1) == Seq(rec(1), rec(2)).map(KinesisSink.partitionKey))
    assert(seen(1).map(_._1) == Seq(KinesisSink.partitionKey(rec(1))))
    // same bytes -> same key (replays land on the same shard)
    assert(KinesisSink.partitionKey(rec(7)) == KinesisSink.partitionKey(rec(7)))
  }

  test("missing AWS SDK fails fast naming the artifact") {
    val sink = new KinesisRecordSink("s", "us-east-1") // no test seam
    val e = intercept[IllegalStateException] { sink.putRecords(Seq(rec(0))) }
    assert(e.getMessage.contains("software.amazon.awssdk:kinesis"))
  }

  test("stream ARN parses to (name, region); junk is rejected") {
    val s = KinesisSink.fromStreamArn(
      "arn:aws:kinesis:us-east-1:123456789012:stream/PatronInfo-production")
    assert(s.isInstanceOf[KinesisRecordSink])
    intercept[IllegalArgumentException] {
      KinesisSink.fromStreamArn("arn:aws:s3:::some-bucket")
    }
    intercept[IllegalArgumentException] {
      KinesisSink.fromStreamArn("PatronInfo-production")
    }
  }

  // AvroSink.write's <=500 chunking ahead of the sink is pinned by
  // GeocodersSpec ("sink chunks records at the Kinesis PutRecords cap").
}
