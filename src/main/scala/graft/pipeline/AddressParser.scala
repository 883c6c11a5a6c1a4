package graft.pipeline

import java.text.Normalizer
import scala.collection.mutable.{LinkedHashMap, ListBuffer}

/** Address re-parsing (reference E3: helpers/address_helper.py:20-102,
  * applied per failed-geocode row at lib/pipeline_controller.py:389).
  *
  * The reference delegates tagging to the `usaddress` CRF (no JVM twin) and
  * its tests mock the tagger — the pinned behavior is the ASSEMBLY +
  * SANITIZATION downstream of the tag result (tests/test_address_helper.py,
  * all 5 cases). This module therefore separates:
  *
  *  - [[AddressParser.reformat(parts: AddressParts, tagged: TagResult)]] —
  *    the assembly the tests pin, semantics identical to the reference;
  *  - [[AddressParser.tag]] — a deterministic rule-based tagger standing in
  *    for the CRF (documented divergence, SURVEY §7.4 risk 4).
  */
object AddressParser {

  /** The 7 mutable address fields carried through the geocode cascade. */
  final case class AddressParts(
      address: String,
      city: String,
      region: String,
      postalCode: String,
      fullAddress: String,
      houseNumber: String = "",
      streetName: String = "")

  /** usaddress street keys collapsed to 'street' and secondary keys to
    * 'line2' (reference helpers/address_helper.py:10-17).
    */
  private val streetKeys = Seq(
    "StreetNamePreDirectional", "StreetNamePreModifier", "StreetNamePreType",
    "StreetName", "StreetNamePostType", "StreetNamePostModifier",
    "StreetNamePostDirectional")
  private val secondaryKeys = Seq(
    "BuildingName", "SubaddressType", "OccupancyType", "OccupancyIdentifier")

  sealed trait TagResult
  /** Successful parse: label → value, labels unique (usaddress.tag form). */
  final case class Tagged(fields: Map[String, String]) extends TagResult
  /** RepeatedLabelError carrying the raw (portion, rawLabel) sequence. */
  final case class RepeatedLabels(parsed: Seq[(String, String)]) extends TagResult

  /** Reference `_combine_repeated_labels` (:72-85): concat unique same-label
    * portions in order; None if empty.
    */
  private def combineRepeated(parsed: Seq[(String, String)], label: String): Option[String] = {
    val out = ListBuffer.empty[String]
    parsed.foreach { case (portion, l) =>
      if (l == label && !out.contains(portion)) out += portion
    }
    val s = out.mkString(" ").trim
    if (s.nonEmpty) Some(s) else None
  }

  /** Reference `_combine_multilabel_field` (:88-102). */
  private def combineMultilabel(parsed: Seq[(String, String)], labels: Seq[String]): String = {
    val out = ListBuffer.empty[String]
    labels.foreach { label =>
      combineRepeated(parsed, label).foreach(v => if (!out.contains(v)) out += v)
    }
    out.mkString(" ").trim
  }

  /** ASCII transliteration of Latin letters (reference F8 `unidecode`):
    * NFD-decompose and drop combining marks, plus the common Latin
    * ligatures/letters NFD cannot decompose. Non-Latin symbols the
    * reference's unidecode deletes are handled by the downstream regex
    * whitelists instead.
    */
  def translit(s: String): String = {
    val pre = s.flatMap {
      case 'ß' => "ss"; case 'Æ' => "AE"; case 'æ' => "ae"
      case 'Œ' => "OE"; case 'œ' => "oe"; case 'Ø' => "O"; case 'ø' => "o"
      case 'Đ' => "D"; case 'đ' => "d"; case 'Þ' => "Th"; case 'þ' => "th"
      case 'Ł' => "L"; case 'ł' => "l"
      case c => c.toString
    }
    Normalizer.normalize(pre, Normalizer.Form.NFD)
      .replaceAll("\\p{M}+", "")
  }

  // F9 charset whitelists (reference helpers/address_helper.py:53-66) —
  // identical character classes.
  private val cityRegionJunk = "[^A-Za-zÀ-ÖØ-öø-ÿ-\\s]"
  private val streetJunk = "[^A-Za-zÀ-ÖØ-öø-ÿ0-9-\\s#&.,;:+@/]"
  private val postalJunk = "[^\\d-]"

  def sanitizeCityRegion(s: String): String =
    translit(s).replaceAll(cityRegionJunk, "").trim
  def sanitizeStreet(s: String): String =
    translit(s).replaceAll(streetJunk, "").trim
  def sanitizePostal(s: String): String =
    translit(s).replaceAll(postalJunk, "").trim

  /** Assembly + sanitization downstream of a tag result — the exact
    * semantics of reference `reformat_malformed_address`
    * (helpers/address_helper.py:25-70).
    */
  def reformat(row: AddressParts, tagged: TagResult): AddressParts = {
    val withHouse = row.copy(houseNumber = "")
    val assembled = tagged match {
      case Tagged(f) =>
        val house = f.getOrElse("AddressNumber", "")
        val street = f.getOrElse("street", "")
        val line2 = f.getOrElse("line2", "")
        withHouse.copy(
          city = f.getOrElse("PlaceName", ""),
          region = f.getOrElse("StateName", ""),
          postalCode = f.getOrElse("ZipCode", ""),
          houseNumber = house,
          streetName = street,
          address = s"$house $street $line2".trim)
      case RepeatedLabels(parsed) =>
        val city = combineRepeated(parsed, "PlaceName").getOrElse(withHouse.city)
        val region = combineRepeated(parsed, "StateName").getOrElse(withHouse.region)
        val postal = combineRepeated(parsed, "ZipCode").getOrElse(withHouse.postalCode)
        val house = combineRepeated(parsed, "AddressNumber").getOrElse(withHouse.houseNumber)
        val street = combineMultilabel(parsed, streetKeys)
        val line2 = combineMultilabel(parsed, secondaryKeys)
        val address = s"$house $street $line2".trim
        withHouse.copy(
          city = city, region = region, postalCode = postal,
          houseNumber = house, streetName = street,
          address = if (address.nonEmpty) address else withHouse.address)
    }
    assembled.copy(
      city = sanitizeCityRegion(assembled.city),
      region = sanitizeCityRegion(assembled.region),
      streetName = sanitizeStreet(assembled.streetName),
      address = sanitizeStreet(assembled.address),
      postalCode = sanitizePostal(assembled.postalCode),
      houseNumber = translit(assembled.houseNumber))
  }

  private val zipRe = "\\d{5}(-\\d{1,4})?".r
  private val secondaryMarkers =
    Set("APT", "UNIT", "STE", "SUITE", "FL", "FLOOR", "RM", "ROOM", "PH", "BSMT", "#")
  private val stateRe = "[A-Za-z]{2}".r

  /** Deterministic rule-based tagger standing in for the usaddress CRF:
    * leading numeric token → AddressNumber; trailing zip-shaped token →
    * ZipCode; 2-letter token before it → StateName; a secondary-unit
    * marker splits street from line2; trailing capitalized tokens (up to
    * the first street-suffix token, directionals excluded) → PlaceName —
    * multi-token places like "New York" included. PO boxes are tagged
    * USPSBoxType/USPSBoxID, which the reference's tag map leaves OUTSIDE
    * street/line2, so the reformatted address is empty — exactly what
    * usaddress + reformat_malformed_address produce. Intersections
    * ("Main St & 5th Ave") yield repeated StreetName labels, which in
    * usaddress raises RepeatedLabelError — reproduced here as a
    * [[RepeatedLabels]] result routed through the same combine logic.
    * Heuristic by necessity — the CRF's learned behavior is not
    * reproducible — but covers the reference's tested shapes.
    */
  def tag(fullAddress: String): TagResult = {
    val tokens = fullAddress.trim.split("\\s+").filter(_.nonEmpty).toSeq
    if (tokens.isEmpty) return Tagged(Map.empty)
    val fields = LinkedHashMap.empty[String, String]
    var rest = tokens

    if (rest.head.headOption.exists(_.isDigit) && rest.length > 1) {
      fields("AddressNumber") = rest.head
      rest = rest.tail
    }
    rest.lastOption.filter(t => zipRe.pattern.matcher(t.replaceAll("[^\\d-]", "")).matches()) match {
      case Some(zip) => fields("ZipCode") = zip; rest = rest.dropRight(1)
      case None =>
    }
    rest.lastOption.filter(t => stateRe.pattern.matcher(t).matches() && t == t.toUpperCase) match {
      case Some(st) => fields("StateName") = st; rest = rest.dropRight(1)
      case None =>
    }

    def normToken(t: String): String = t.toUpperCase.replaceAll("[^A-Z#]", "")
    def isSuffix(t: String): Boolean = streetSuffixes.contains(normToken(t))
    def isDirectional(t: String): Boolean = directionals.contains(normToken(t))
    // Trailing capitalized non-suffix, non-directional tokens form the
    // place; always leave at least `floor` (default: 2 for 3+ tokens)
    // tokens for the street itself.
    def splitPlace(toks: Seq[String], floor: Int = 0): (Seq[String], Seq[String]) = {
      val minStreet = math.max(floor, if (toks.length >= 3) 2 else 1)
      var split = toks.length
      while (split > minStreet && toks(split - 1).headOption.exists(_.isUpper)
        && !isSuffix(toks(split - 1)) && !isDirectional(toks(split - 1))) split -= 1
      (toks.take(split), toks.drop(split))
    }

    // PO box: USPSBoxType/USPSBoxID stay outside the reference's
    // street/line2 tag map (helpers/address_helper.py:10-17), so the
    // assembled street address is empty — the geocodable-address filter
    // then drops the row, as the reference pipeline does for box-only rows.
    val boxTypeLen =
      if (rest.length >= 2 && normToken(rest.head) == "PO"
        && normToken(rest(1)) == "BOX") 2
      else if (rest.nonEmpty && Set("POB", "BOX").contains(normToken(rest.head))) 1
      else 0
    if (boxTypeLen > 0) {
      fields("USPSBoxType") = rest.take(boxTypeLen).mkString(" ")
      rest = rest.drop(boxTypeLen)
      if (rest.headOption.exists(t => t.nonEmpty && t.forall(_.isDigit))) {
        fields("USPSBoxID") = rest.head
        rest = rest.tail
      }
      if (rest.nonEmpty) fields("PlaceName") = rest.mkString(" ")
      return Tagged(fields.toMap)
    }

    // Intersection: two street groups → repeated street labels, which
    // usaddress surfaces as RepeatedLabelError (the reference handles it
    // via _combine_repeated_labels; same combine runs on this result).
    val sepIdx = rest.indexWhere(t => t == "&" || normToken(t) == "AND")
    if (sepIdx > 0 && sepIdx < rest.length - 1) {
      // floor = sepIdx + 2: the place walk must leave at least one token
      // AFTER the separator, or a single-token second street ("Main &
      // Elm") would be eaten as the place name
      val (streets, placeToks) = splitPlace(rest, floor = sepIdx + 2)
      def streetLabels(toks: Seq[String]): Seq[(String, String)] =
        toks.zipWithIndex.map { case (t, i) =>
          if (isDirectional(t))
            t -> (if (i == 0) "StreetNamePreDirectional" else "StreetNamePostDirectional")
          else if (isSuffix(t)) t -> "StreetNamePostType"
          else t -> "StreetName"
        }
      // `streets` is a prefix of `rest` (splitPlace only strips the tail),
      // so the separator index is valid in both.
      val parsed = ListBuffer.empty[(String, String)]
      fields.get("AddressNumber").foreach(parsed += _ -> "AddressNumber")
      parsed ++= streetLabels(streets.take(sepIdx))
      parsed += rest(sepIdx) -> "IntersectionSeparator"
      parsed ++= streetLabels(streets.drop(sepIdx + 1))
      placeToks.foreach(parsed += _ -> "PlaceName")
      fields.get("StateName").foreach(parsed += _ -> "StateName")
      fields.get("ZipCode").foreach(parsed += _ -> "ZipCode")
      return RepeatedLabels(parsed.toSeq)
    }

    val markerIdx = rest.indexWhere(t => secondaryMarkers.contains(normToken(t)))
    val (streetToks, tailToks) =
      if (markerIdx >= 0) (rest.take(markerIdx), rest.drop(markerIdx))
      else (rest, Seq.empty[String])
    if (markerIdx >= 0) {
      // marker + following identifier form line2; anything after is the place
      val line2Toks = tailToks.take(2)
      fields("line2") = line2Toks.mkString(" ")
      val placeToks = tailToks.drop(2)
      if (placeToks.nonEmpty) fields("PlaceName") = placeToks.mkString(" ")
      if (streetToks.nonEmpty) fields("street") = streetToks.mkString(" ")
    } else {
      val (street, placeToks) = splitPlace(streetToks)
      if (placeToks.nonEmpty) fields("PlaceName") = placeToks.mkString(" ")
      if (street.nonEmpty) fields("street") = street.mkString(" ")
    }
    Tagged(fields.toMap)
  }

  private val streetSuffixes = Set(
    "AVE", "AVENUE", "ST", "STREET", "RD", "ROAD", "BLVD", "BOULEVARD",
    "DR", "DRIVE", "LN", "LANE", "CT", "COURT", "PL", "PLACE", "PKWY",
    "PARKWAY", "TER", "TERRACE", "WAY", "CIR", "CIRCLE", "HWY", "HIGHWAY",
    "SQ", "SQUARE", "BWAY", "BROADWAY")

  private val directionals = Set(
    "N", "S", "E", "W", "NE", "NW", "SE", "SW",
    "NORTH", "SOUTH", "EAST", "WEST")

  /** Full re-parse: tag + reformat (reference applies this row-wise on
    * census-geocoder misses, lib/pipeline_controller.py:389).
    */
  def reformat(row: AddressParts): AddressParts = reformat(row, tag(row.fullAddress))
}
