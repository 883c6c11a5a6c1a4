package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** S5: schema-registry fetch — bare schema and platform-API envelope. */
class SchemaFetchSpec extends AnyFunSuite {

  test("bare Avro schema body is accepted") {
    val got = AvroSink.fetchSchemaJson("http://reg/x",
      _ => Schemas.patronInfoAvroJson)
    assert(got == Schemas.patronInfoAvroJson)
  }

  test("data.schema envelope is unwrapped (platform-API shape)") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val env = mapper.createObjectNode()
    env.putObject("data").put("schema", Schemas.patronInfoAvroJson)
    val got = AvroSink.fetchSchemaJson("http://reg/x", _ => env.toString)
    assert(got == Schemas.patronInfoAvroJson)
  }

  test("invalid schema fails fast") {
    intercept[Exception] {
      AvroSink.fetchSchemaJson("http://reg/x", _ => """{"not": "avro"}""")
    }
  }
}
