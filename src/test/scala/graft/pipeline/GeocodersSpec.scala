package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Census client golden tests ported from
  * tests/test_census_geocoder_api_client.py (CSV request/response shape,
  * No_Match/Tie → null, 11-digit geoid assembly, recursive split-retry).
  */
class CensusGeocoderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // _API_RESPONSE (tests/test_census_geocoder_api_client.py:11-15), keyed
  // by our string row keys instead of pandas integer index.
  private val apiResponse =
    ("\"k0\",\"123 good address, New York, NY, 11111\",\"Match\",\"Exact\",\"123 matched address, New York, NY, 11111-9999\",\"-0.00000001,1.11111110\",\"123456789\",\"R\",\"00\",\"111\",\"222222\",\"3333\"\n"
      + "\"k1\",\"456 bad address, Brooklyn, NY, 22222\",\"No_Match\"\n"
      + "\"k2\",\"789 good address, Staten Island, NY, 33333-4444\",\"Match\",\"Non_Exact\",\"789 matched address, Staten Island, NY, 33333-4444\",\"-0.00000001,1.11111110\",\"123456789\",\"R\",\"44\",\"555\",\"666666\",\"7777\"\n"
      + "\"k3\",\"012 bad address, Bronx, NY, 55555-6666\",\"No_Match\"\n"
      + "\"k4\",\"345 tie address, Queens, NY, 77777\",\"Tie\"\n")

  private val schema = StructType(Seq(
    StructField("patron_id_plaintext", StringType),
    StructField("address", StringType),
    StructField("city", StringType),
    StructField("region", StringType),
    StructField("postal_code", StringType)))

  private def addressDf = spark.createDataFrame(Seq(
    Row("k0", "123 good address", "New York", "NY", "11111"),
    Row("k1", "456 bad address", "Brooklyn", "NY", "22222"),
    Row("k2", "789 good address", "Staten Island", "NY", "33333-4444"),
    Row("k3", "012 bad address", "Bronx", "NY", "55555-6666"),
    Row("k4", "345 tie address", "Queens", "NY", "77777")).asJava, schema)
    .coalesce(1)

  test("geoid assembly: Match → state+county+tract, No_Match/Tie → null (:67-75)") {
    val got = new CensusBatchGeocoder(new FixedResponsePoster(apiResponse)).geocode(addressDf)
      .collect().map(r => r.getString(0) -> Option(r.getString(1)).orNull).toMap
    assert(got == Map("k0" -> "00111222222", "k1" -> null,
      "k2" -> "44555666666", "k3" -> null, "k4" -> null))
  }

  test("split-retry halves failed batches while halves ≥ floor (:52-64)") {
    // 4 rows with floor 2: first call fails → two 2-row calls succeed.
    PosterCallLog.reset()
    val got = new CensusBatchGeocoder(new FailOncePoster, splitFloor = 2)
      .geocode(addressDf.limit(4)).collect()
    assert(PosterCallLog.count == 3)
    assert(got.length == 4 && got.forall(_.getString(1) == "00111222222"))
    // request CSV shape (reference serializes key,address,city,region,postal)
    assert(PosterCallLog.firstBody.contains("k0,123 good address,New York,NY,11111"))
  }

  test("split-retry below floor raises CensusGeocoderError (:75-90)") {
    val ex = intercept[org.apache.spark.SparkException] {
      new CensusBatchGeocoder(new AlwaysFailPoster, splitFloor = 1000)
        .geocode(addressDf).collect()
    }
    assert(ex.getCause.isInstanceOf[CensusGeocoderError] ||
      Option(ex.getCause).exists(_.getCause.isInstanceOf[CensusGeocoderError]))
  }

  test("csv round-trip quoting") {
    val line = CensusCsv.toCsvLine(Seq("k", "1 main st, apt 2", "a\"b", "NY", ""))
    assert(CensusCsv.splitCsvLine(line).toSeq == Seq("k", "1 main st, apt 2", "a\"b", "NY", ""))
  }
}

/** Serializable test posters (anonymous classes would capture the spec). */
final class FixedResponsePoster(response: String) extends HttpPoster {
  def post(body: Array[Byte]): Array[Byte] = {
    PosterCallLog.record(new String(body, "UTF-8"))
    response.getBytes("UTF-8")
  }
}

final class FailOncePoster extends HttpPoster {
  def post(body: Array[Byte]): Array[Byte] = {
    val n = PosterCallLog.record(new String(body, "UTF-8"))
    if (n == 1) throw new java.io.IOException("connection error")
    new String(body, "UTF-8").split("\n")
      .map(l => l.split(",")(0) + ",addr,Match,Exact,m,c,t,R,00,111,222222,3333")
      .mkString("\n").getBytes("UTF-8")
  }
}

final class AlwaysFailPoster extends HttpPoster {
  def post(body: Array[Byte]): Array[Byte] =
    throw new java.io.IOException("connection error")
}

/** Static call log — local mode shares one JVM, so executors hit this. */
object PosterCallLog {
  private val calls = new java.util.concurrent.CopyOnWriteArrayList[String]()
  def reset(): Unit = calls.clear()
  def record(body: String): Int = { calls.add(body); calls.size() }
  def count: Int = calls.size()
  def firstBody: String = calls.get(0)
}

/** NYC geocoder golden tests ported from tests/test_nyc_geocoder_client.py:
  * borough→FIPS, tract-vintage coalesce 2020→2010→2000→1990, non-borough →
  * null, GeosupportError → null.
  */
class NycGeocoderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("patron_id_plaintext", StringType),
    StructField("house_number", StringType),
    StructField("street_name", StringType),
    StructField("postal_code", StringType)))

  private def df(rows: Row*) = spark.createDataFrame(rows.asJava, schema)

  private def geosupport(results: Map[String, Map[String, String]]) =
    new GeosupportLike {
      def address(h: String, s: String, z: String): Map[String, String] =
        results.getOrElse(h, throw new GeosupportError("error"))
    }

  test("tract vintage coalesce + borough map (:50-77)") {
    val gs = geosupport(Map(
      "123" -> Map("First Borough Name" -> "BRONX", "2020 Census Tract" -> "123456"),
      "456" -> Map("First Borough Name" -> "BROOKLYN", "2010 Census Tract" -> "789012"),
      "789" -> Map("First Borough Name" -> "MANHATTAN", "2000 Census Tract" -> "345678"),
      "01-23" -> Map("First Borough Name" -> "QUEENS", "1990 Census Tract" -> "901234"),
      "4" -> Map("First Borough Name" -> "STATEN IS",
        "2020 Census Tract" -> "567890", "2010 Census Tract" -> "999999"),
      "5" -> Map("First Borough Name" -> "BRONX")))
    val got = new NycBatchGeocoder(gs).geocode(df(
      Row("a", "123", "ave", "11111"), Row("b", "456", "st", "22222"),
      Row("c", "789", "blvd", "33333-4444"), Row("d", "01-23", "ct", "55555"),
      Row("e", "4", "pl", "66666"), Row("f", "5", "rd", "77777")))
      .collect().map(r => r.getString(0) -> Option(r.getString(1)).orNull).toMap
    assert(got == Map(
      "a" -> "36005123456", "b" -> "36047789012", "c" -> "36061345678",
      "d" -> "36081901234", "e" -> "36085567890", "f" -> null))
  }

  test("non-borough → null (:38-44); GeosupportError → null (:46-48)") {
    val gs = geosupport(Map(
      "123" -> Map("First Borough Name" -> "NOT A BOROUGH", "2020 Census Tract" -> "123456")))
    val got = new NycBatchGeocoder(gs).geocode(df(
      Row("a", "123", "ave", "11111"), Row("b", "999", "st", "22222")))
      .collect().map(r => r.getString(0) -> Option(r.getString(1)).orNull).toMap
    assert(got == Map("a" -> null, "b" -> null))
  }
}

/** Avro boundary round-trip (reference S6: encode_batch against the
  * registry schema, pinned by the expected dicts at
  * tests/test_pipeline_controller.py:113-167).
  */
class AvroSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("output rows round-trip through the PatronInfo Avro schema") {
    val row = Row("p1", "h1", "11111", "00111222222", "2021-01-01",
      null, "2021-06-01", 4L, null, "aa", "bb")
    val df = spark.createDataFrame(Seq(row).asJava, Schemas.output)
    val bytes = AvroSink.encode(df).collect().map(_.getAs[Array[Byte]](0))
    assert(bytes.length == 1)
    val rec = AvroSink.decode(bytes.head)
    assert(rec.get("patron_id").toString == "p1")
    assert(rec.get("geoid").toString == "00111222222")
    assert(rec.get("deletion_date_et") == null)
    assert(rec.get("ptype_code") == 4L)
    assert(rec.get("pcode3") == null)
  }

  test("sink chunks records at the Kinesis PutRecords cap") {
    val rows = (1 to 7).map(i => Row(s"p$i", null, null, null, null, null,
      null, null, null, null, null))
    val df = spark.createDataFrame(rows.asJava, Schemas.output).coalesce(1)
    val chunks = scala.collection.mutable.ListBuffer.empty[Int]
    AvroSink.write(df, new AvroSink.RecordSink {
      def putRecords(records: Seq[Array[Byte]]): Unit =
        CollectedChunks.add(records.length)
    }, maxBatch = 3)
    assert(CollectedChunks.get.sorted == Seq(1, 3, 3))
  }
}

/** Executor-side accumulator for the sink test (local mode: same JVM). */
object CollectedChunks {
  private val chunks = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
  def add(n: Int): Unit = chunks.add(n)
  def get: Seq[Int] = chunks.asScala.toSeq
}
