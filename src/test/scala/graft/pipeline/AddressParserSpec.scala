package graft.pipeline

import graft.pipeline.AddressParser._
import org.scalatest.funsuite.AnyFunSuite

/** The 5 golden re-parse cases from the reference
  * (tests/test_address_helper.py:11-146). The reference mocks the usaddress
  * tagger in every case, so these pin the assembly + sanitization — exactly
  * what [[AddressParser.reformat(row, tagged)]] implements.
  */
class AddressParserSpec extends AnyFunSuite {

  test("good address (test_address_helper.py:11-31)") {
    val in = AddressParts("123 REAL AVE APT 1", "NEW YORK", "NY", "11111-2222",
      "123 REAL AVE APT 1 NEW YORK NY 11111-2222")
    val tagged = Tagged(Map(
      "AddressNumber" -> "123", "street" -> "REAL AVE", "line2" -> "APT 1",
      "PlaceName" -> "NEW YORK", "StateName" -> "NY", "ZipCode" -> "11111-2222"))
    val out = reformat(in, tagged)
    assert(out == in.copy(houseNumber = "123", streetName = "REAL AVE"))
  }

  test("misordered address (test_address_helper.py:33-59)") {
    val in = AddressParts("123", "REAL AVE APT 1", "NEW YORK NY", "11111-2222",
      "123 REAL AVE APT 1 NEW YORK NY 11111-2222")
    val tagged = Tagged(Map(
      "AddressNumber" -> "123", "street" -> "REAL AVE", "line2" -> "APT 1",
      "PlaceName" -> "NEW YORK", "StateName" -> "NY", "ZipCode" -> "11111-2222"))
    val out = reformat(in, tagged)
    assert(out == AddressParts("123 REAL AVE APT 1", "NEW YORK", "NY",
      "11111-2222", in.fullAddress, "123", "REAL AVE"))
  }

  test("character replacement (test_address_helper.py:61-86)") {
    val in = AddressParts("123 $R%E{A[L∆ ÁVE", "N1E2W3 Y.O,R#K", "1N&Y.",
      "abc11111-2.2,2+2d",
      "123 $R%E{A[L∆ ÁVE N1E2W3 Y.O,R#K 1N&Y. abc11111-2.2,2+2d")
    val tagged = Tagged(Map(
      "AddressNumber" -> "123", "street" -> "$R%E{A[L∆ ÁVE",
      "PlaceName" -> "N1E2W3 Y.O,R#K", "StateName" -> "1N&Y.",
      "ZipCode" -> "abc11111-2.2,2+2d"))
    val out = reformat(in, tagged)
    assert(out.address == "123 REAL AVE")
    assert(out.city == "NEW YORK")
    assert(out.region == "NY")
    assert(out.postalCode == "11111-2222")
    assert(out.houseNumber == "123")
    assert(out.streetName == "REAL AVE")
  }

  test("repeated labels error (test_address_helper.py:88-117)") {
    val in = AddressParts("123 REAL AVE APT 1", "NEW YORK", "NY", "11111-2222",
      "123 REAL AVE APT 1 NEW YORK NY 11111-2222")
    val tagged = RepeatedLabels(Seq(
      "123" -> "AddressNumber", "REAL" -> "StreetName", "AVE" -> "StreetName",
      "APT" -> "OccupancyType", "1" -> "OccupancyIdentifier",
      "NEW" -> "PlaceName", "YORK NY" -> "PlaceName", "11111" -> "ZipCode"))
    val out = reformat(in, tagged)
    assert(out == AddressParts("123 REAL AVE APT 1", "NEW YORK NY", "NY",
      "11111", in.fullAddress, "123", "REAL AVE"))
  }

  test("repeated address (test_address_helper.py:119-146)") {
    val in = AddressParts("123 REAL AVE", "123 REAL AVE", "NEW YORK NY",
      "11111-2222", "123 REAL AVE 123 REAL AVE NEW YORK NY 11111-2222")
    val tagged = RepeatedLabels(Seq(
      "123" -> "AddressNumber", "123" -> "AddressNumber",
      "REAL AVE" -> "StreetName", "REAL AVE" -> "StreetName",
      "NEW YORK" -> "PlaceName", "NY" -> "StateName", "11111-2222" -> "ZipCode"))
    val out = reformat(in, tagged)
    assert(out == AddressParts("123 REAL AVE", "NEW YORK", "NY", "11111-2222",
      in.fullAddress, "123", "REAL AVE"))
  }

  test("translit covers ligatures and special Latin letters (F8 unidecode)") {
    assert(AddressParser.translit("Straße ÆON Œuvre Øst Łódź") == "Strasse AEON OEuvre Ost Lodz")
    assert(AddressParser.translit("ÁVE çafé") == "AVE cafe")
  }

  test("directionals stay in the street; multi-token places split off") {
    val p = reformat(AddressParts("123 N Main St", "", "", "",
      "123 N Main St Brooklyn NY 11211"))
    assert(p.houseNumber == "123" && p.streetName == "N Main St"
      && p.city == "Brooklyn" && p.region == "NY" && p.postalCode == "11211"
      && p.address == "123 N Main St")
    val q = reformat(AddressParts("456 W 42nd St", "", "", "",
      "456 W 42nd St New York NY 10036"))
    assert(q.houseNumber == "456" && q.streetName == "W 42nd St"
      && q.city == "New York" && q.region == "NY" && q.postalCode == "10036")
  }

  test("PO box: box labels stay outside street/line2, address empties") {
    // usaddress tags USPSBoxType/USPSBoxID, which the reference's tag map
    // does NOT fold into street/line2 — so the rebuilt address is '' and
    // the row falls out at the geocodable filter (P9), matching the
    // reference pipeline's behavior for box-only rows.
    val p = reformat(AddressParts("PO Box 123", "", "", "",
      "PO Box 123 Brooklyn NY 11211"))
    assert(p.address == "" && p.streetName == "" && p.houseNumber == ""
      && p.city == "Brooklyn" && p.region == "NY" && p.postalCode == "11211")
    val q = reformat(AddressParts("P.O. BOX 99", "", "", "",
      "P.O. BOX 99 Queens NY 114"))
    assert(q.address == "" && q.city == "Queens NY")
  }

  test("intersections route through the repeated-labels combine") {
    // Two street groups = repeated StreetName labels = usaddress
    // RepeatedLabelError; _combine_multilabel_field then concatenates the
    // unique portions per street key, in label order.
    val p = reformat(AddressParts("orig addr", "origcity", "XX", "00000",
      "Main St & 5th Ave Brooklyn NY 11211"))
    assert(p.city == "Brooklyn" && p.region == "NY" && p.postalCode == "11211")
    assert(p.streetName == "Main 5th St Ave") // StreetName then PostType portions
    assert(p.address == "Main 5th St Ave")
    // directionals keep their own label and position in the combine
    val q = reformat(AddressParts("", "", "", "",
      "W Main St and E 5th Ave Brooklyn NY 11211"))
    // both directionals lead their street group → PreDirectional portions
    // combine first, then StreetName portions, then PostTypes (key order)
    assert(q.streetName == "W E Main 5th St Ave")
    assert(q.city == "Brooklyn")
    // single-token second street: the place walk must not eat it
    val r = reformat(AddressParts("", "", "", "",
      "123 Main & Elm Brooklyn NY 11211"))
    assert(r.streetName == "Main Elm" && r.city == "Brooklyn"
      && r.houseNumber == "123")
  }

  test("heuristic tagger covers the reference cascade shapes") {
    // tier-2 census inputs from tests/test_pipeline_controller.py:204-217
    val p3 = reformat(AddressParts("456 address", "Brooklyn", "NY", "22222",
      "456 address Brooklyn NY 22222"))
    assert(p3 == AddressParts("456 address", "Brooklyn", "NY", "22222",
      "456 address Brooklyn NY 22222", "456", "address"))
    val p5 = reformat(AddressParts("012 address", "LA", "CA", "55555-6666",
      "012 address LA CA 55555-6666"))
    assert(p5 == AddressParts("012 address", "LA", "CA", "55555-6666",
      "012 address LA CA 55555-6666", "012", "address"))
    val p6 = reformat(AddressParts("345 address", "Tokyo", "", "",
      "345 address Tokyo"))
    assert(p6 == AddressParts("345 address", "Tokyo", "", "",
      "345 address Tokyo", "345", "address"))
  }
}
