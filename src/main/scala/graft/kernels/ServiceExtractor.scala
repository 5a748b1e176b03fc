package graft.kernels

import java.util.Locale
import java.util.regex.Pattern
import scala.collection.mutable
import scala.collection.mutable.{LinkedHashMap, ListBuffer}

/** Exact 1:1 ports of the reference's deterministic service-table
  * extraction ladder — "the heart of the extraction" (SURVEY §2.5):
  *
  *  - [[cleanLine]]           test_extraction.py:18-37 (eval replaced by a
  *                            real bracketed-list parser — never eval)
  *  - [[extractServices]]     test_extraction.py:39-265 (sliding ≤20-line
  *                            lookahead parser; golden: test_services.json)
  *  - [[findServiceTableSection]] convert_to_json.py:294-342
  *  - [[extractSimpleServices]]   convert_to_json.py:137-263 (vertical
  *                            "headers first, cells below" layout)
  *
  * Service rows are LinkedHashMap[String, Any] (insertion-ordered, like
  * Python dicts) with String / java.lang.Double / List[String] / null
  * values, so JSON rendering matches the reference's json.dump output.
  */
object ServiceExtractor {

  type Service = LinkedHashMap[String, Any]

  // ------------------------------------------------------------- clean_line

  /** Parse a Python-repr list line `['w1', 'w2', ...]` without eval:
    * quoted items (single/double) with backslash escapes, bare numeric
    * tokens. Throws on malformed input (caller falls back).
    */
  private def parseListLiteral(s: String): List[String] = {
    val t = s.strip()
    require(t.length >= 2 && t.head == '[' && t.last == ']', "not a list")
    val inner = t.substring(1, t.length - 1)
    val items = ListBuffer.empty[String]
    var i = 0
    val n = inner.length
    while (i < n) {
      val c = inner.charAt(i)
      if (c == ' ' || c == '\t' || c == ',') i += 1
      else if (c == '\'' || c == '"') {
        val q = c
        val sb = new java.lang.StringBuilder(16)
        i += 1
        var closed = false
        while (i < n && !closed) {
          val ch = inner.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            val e = inner.charAt(i + 1)
            e match {
              case 'n' => sb.append('\n'); i += 2
              case 't' => sb.append('\t'); i += 2
              case 'r' => sb.append('\r'); i += 2
              case 'x' if i + 3 < n =>
                sb.append(Integer.parseInt(inner.substring(i + 2, i + 4), 16).toChar)
                i += 4
              case other => sb.append(other); i += 2
            }
          } else if (ch == q) { closed = true; i += 1 }
          else { sb.append(ch); i += 1 }
        }
        require(closed, "unterminated string")
        items += sb.toString
      } else {
        // bare token (number / True / None) — read to delimiter
        val start = i
        while (i < n && inner.charAt(i) != ',' && inner.charAt(i) != ' ') i += 1
        val tok = inner.substring(start, i)
        require(tok.nonEmpty, "bad token")
        // Python `if item` drops falsy values (0, 0.0, None, False, '')
        val falsy = tok == "None" || tok == "False" ||
          (tok.matches("-?\\d+(\\.\\d*)?") && tok.toDouble == 0.0)
        if (!falsy) items += tok
      }
    }
    items.toList
  }

  /** clean_line (test_extraction.py:18-37): `['a', 'b']` → `a b` via the
    * list parser; on parse failure, manual cleanup (strip brackets, drop
    * quoted wrappers, commas → spaces); other lines pass through stripped.
    */
  def cleanLine(line: String): String = {
    if (line == null || line.strip().isEmpty) return ""
    val t = line.strip()
    if (t.startsWith("[") && t.endsWith("]")) {
      try parseListLiteral(line).filter(_.nonEmpty).mkString(" ")
      catch {
        case _: Exception =>
          // manual fallback mirrors the except branch: strip('[]'),
          // re.sub("'(.*?)'", "\1"), commas → spaces
          var s = line.dropWhile(c => c == '[' || c == ']')
            .reverse.dropWhile(c => c == '[' || c == ']').reverse
          s = s.replaceAll("'(.*?)'", "$1")
          s = s.replace(",", " ")
          s.strip()
      }
    } else t
  }

  // ------------------------------------------------------ lookahead parser

  private val CodeRe = Pattern.compile("\\((\\d+[^)]*-\\d+[^)]*)\\)")
  private val AddCodeRe = Pattern.compile("\\((\\d+)\\)")
  private val NumRe = Pattern.compile("^\\d+\\.?\\d*$")

  private val FieldNames =
    List("reqQty", "reqCost", "grossAmount", "appQty", "appCost", "appGross")

  private val HeaderMapping: List[(String, String)] = List(
    "req.qty" -> "reqQty", "req.cost" -> "reqCost",
    "req. qty" -> "reqQty", "req. cost" -> "reqCost",
    "gross amount" -> "grossAmount",
    "app.qty" -> "appQty", "app.cost" -> "appCost",
    "app. qty" -> "appQty", "app. cost" -> "appCost",
    "app.gross" -> "appGross", "app. gross" -> "appGross")

  private def lower(s: String): String = s.toLowerCase(Locale.ROOT)

  /** extract_services (test_extraction.py:39-265): the sliding ≤19-line
    * lookahead parser classifying each following line as additional code /
    * type / numeric / status / header / continuation fragment; fragments
    * of the LAST service are re-joined with the 9-suffix ladder (the
    * earlier-appended services keep their raw description — reference
    * quirk kept faithful).
    */
  def extractServices(lines: IndexedSeq[String]): List[Service] = {
    val services = ListBuffer.empty[Service]
    var current: Service = null
    var fragments = ListBuffer.empty[String]
    var sectionStarted = false
    val skip = mutable.Set.empty[Int]

    var i = 0
    while (i < lines.length) {
      if (!skip.contains(i)) {
        val line = cleanLine(lines(i))
        val lineLower = lower(line)

        if (!sectionStarted && lineLower.contains("(code)") && lineLower.contains("service")) {
          sectionStarted = true
        } else if (sectionStarted || CodeRe.matcher(line).find()) {
          val cm = CodeRe.matcher(line)
          if (cm.find()) {
            if (current != null) services += current
            current = LinkedHashMap[String, Any](
              "code" -> cm.group(1),
              "description" -> line.substring(cm.end()).strip())
            fragments = ListBuffer(current("description").toString)

            // lookahead: python range(i+1, min(i+20, len)) → up to 19 lines
            var j = i + 1
            val jEnd = math.min(i + 20, lines.length)
            var break = false
            while (j < jEnd && !break) {
              if (!skip.contains(j)) {
                val nextLine = cleanLine(lines(j))
                val nextLower = lower(nextLine)
                if (nextLine.strip().isEmpty) { /* skip empty */ }
                else {
                  val acm = AddCodeRe.matcher(nextLine)
                  val hasAdd = acm.find()
                  val hasFull = CodeRe.matcher(nextLine).find()
                  if (hasAdd && !hasFull) {
                    val codes = current.getOrElseUpdate("additionalCodes",
                      ListBuffer.empty[String]).asInstanceOf[ListBuffer[String]]
                    codes += acm.group(1)
                    val textWithoutCode =
                      nextLine.replaceAll("\\(\\d+\\)", "").strip()
                    if (textWithoutCode.nonEmpty &&
                      !List("providers", "completed", "signature", "for insurance")
                        .exists(nextLower.contains)) {
                      fragments += textWithoutCode
                    }
                    skip += j
                  } else if (nextLower == "imaging" || nextLower == "lab" ||
                    nextLower == "consultation") {
                    current("type") = nextLine.strip()
                    skip += j
                  } else if (NumRe.matcher(nextLower.strip()).matches()) {
                    var assigned = false
                    FieldNames.find(f => !current.contains(f)).foreach { f =>
                      current(f) = java.lang.Double.valueOf(nextLower.strip())
                      assigned = true
                    }
                    if (!assigned && FieldNames.exists(current.contains)) {
                      var lastAssigned: String = null
                      FieldNames.foreach(f => if (current.contains(f)) lastAssigned = f)
                      if (lastAssigned != null) {
                        val idx = FieldNames.indexOf(lastAssigned)
                        if (idx < FieldNames.length - 1) {
                          current(FieldNames(idx + 1)) =
                            java.lang.Double.valueOf(nextLower.strip())
                        }
                      }
                    }
                    skip += j
                  } else if (List("required", "not required", "approved", "partial",
                    "no data to be shown").exists(nextLower.contains)) {
                    current("status") = nextLine.strip()
                    skip += j
                  } else {
                    // header_mapping pass (falls through afterwards — no
                    // continue in the reference either)
                    var matchedHeader = false
                    val hmIt = HeaderMapping.iterator
                    while (hmIt.hasNext && !matchedHeader) {
                      val (headerKey, fieldName) = hmIt.next()
                      if (nextLower.contains(headerKey)) {
                        matchedHeader = true
                        var k = j + 1
                        val kEnd = math.min(j + 3, lines.length)
                        var foundVal = false
                        while (k < kEnd && !foundVal) {
                          if (!skip.contains(k)) {
                            val valueLine = cleanLine(lines(k))
                            if (NumRe.matcher(valueLine.strip()).matches()) {
                              current(fieldName) =
                                java.lang.Double.valueOf(valueLine.strip())
                              skip += k
                              foundVal = true
                            }
                          }
                          k += 1
                        }
                        skip += j
                      }
                    }
                    if (List("type", "req.", "qty", "cost", "app.", "gross",
                      "amount", "note").exists(nextLower.contains)) {
                      skip += j
                    } else if (nextLower.strip().matches(
                      "(um|er|ing|ed|al|sis|tion|phy|gram).*") ||
                      nextLower.strip().length <= 5 ||
                      List("doppler", "ultrasound", "scan", "mri", "ct", "xray",
                        "mammogram", "vessel", "site", "graph", "scope")
                        .exists(nextLower.contains)) {
                      fragments += nextLine.strip()
                      skip += j
                    } else if (nextLower.contains("service") ||
                      nextLower.contains("medication") ||
                      nextLower.contains("providers")) {
                      break = true
                    } else if (List("signature", "date", "completed", "physician",
                      "provider").exists(nextLower.contains)) {
                      skip += j
                    }
                  }
                }
              }
              j += 1
            }
          }
        } else if (current != null && lineLower.strip() == "note") {
          var j = i + 1
          val jEnd = math.min(i + 3, lines.length)
          var done = false
          while (j < jEnd && !done) {
            if (!skip.contains(j)) {
              val nextLine = cleanLine(lines(j))
              val nl = lower(nextLine)
              if (nextLine.nonEmpty && !nl.startsWith("service") &&
                !nl.startsWith("provider") && !nl.startsWith("for insurance")) {
                current("note") = nextLine.strip()
                skip += j
                done = true
              }
            }
            j += 1
          }
        }
      }
      i += 1
    }

    // final service: fragments combined with the 9-suffix re-join ladder
    if (current != null) {
      if (fragments.nonEmpty) {
        var combined = fragments.mkString(" ")
        combined = ScalarKernels.rejoinFragments(combined)
        combined = combined.replaceAll("```.*$", "")
        combined = combined.replaceAll("\\s+Date.*$", "")
        combined = combined.replaceAll("\\s+---.*$", "")
        current("description") = combined.strip()
      }
      val needsStatus = !current.contains("status") ||
        lower(current("status").toString).contains("comments")
      if (needsStatus) current("status") = "Not Required"
      services += current
    }

    // freeze additionalCodes buffers into Lists
    services.foreach { s =>
      s.get("additionalCodes").foreach {
        case lb: ListBuffer[_] => s("additionalCodes") = lb.toList
        case _ => ()
      }
    }
    services.toList
  }

  // ------------------------------------------------- section windowing

  /** find_service_table_section (convert_to_json.py:294-342). */
  def findServiceTableSection(lines: IndexedSeq[String]): IndexedSeq[String] = {
    var startIdx = -1
    var idx = 0
    while (startIdx < 0 && idx < lines.length) {
      val ll = lower(lines(idx))
      if (ll.contains("(code)") && ll.contains("service")) startIdx = idx
      else if (CodeRe.matcher(ll).find()) startIdx = math.max(0, idx - 1)
      idx += 1
    }
    if (startIdx < 0) return lines

    val endMarkers = List("no data to be shown", "in case management",
      "i hereby", "medication", "completed/coded", "providers approval")
    var endIdx = -1
    var j = startIdx
    while (endIdx < 0 && j < lines.length) {
      val ll = lower(lines(j))
      if (endMarkers.exists(ll.contains)) endIdx = j
      j += 1
    }
    if (endIdx < 0) endIdx = math.min(startIdx + 30, lines.length)
    val safeStart = math.max(0, startIdx - 5)
    lines.slice(safeStart, endIdx)
  }

  // ------------------------------------------------- vertical-table parser

  /** clean_token (convert_to_json.py:144-154). */
  def cleanToken(token: String): String = {
    var t = token.strip()
    t = t.dropWhile(_ == '[')
    t = t.reverse.dropWhile(_ == ']').reverse
    t = t.replaceAll("^[\\[{](.*)[\\]}]$", "$1")
    t = t.replaceAll("['\"]", "")
    t = t.replaceAll(",", " ")
    t = t.replaceAll("\\s+", " ")
    lower(t).strip()
  }

  /** header_aliases (convert_to_json.py:157-180) — insertion order matters
    * for the partial-match pass.
    */
  val HeaderAliases: List[(String, String)] = List(
    "(code) service" -> "codeService",
    "(code)service" -> "codeService",
    "code service" -> "codeService",
    "codeservice" -> "codeService",
    "type" -> "type",
    "req.qty" -> "reqQty",
    "req qty" -> "reqQty",
    "req.quantity" -> "reqQty",
    "req.cost" -> "reqCost",
    "req cost" -> "reqCost",
    "gross amount" -> "grossAmount",
    "gross" -> "grossAmount",
    "app.qty" -> "appQty",
    "app qty" -> "appQty",
    "approved qty" -> "appQty",
    "approved quantity" -> "appQty",
    "app.cost" -> "appCost",
    "app cost" -> "appCost",
    "approved cost" -> "appCost",
    "app.gross" -> "appGross",
    "app gross" -> "appGross",
    "note" -> "note")

  private val aliasMap: Map[String, String] = HeaderAliases.toMap
  private val NumericFields =
    Set("reqQty", "reqCost", "grossAmount", "appQty", "appCost", "appGross")
  private val CodeServiceRe =
    Pattern.compile("\\(([^)]+)\\)\\s*(.*)", Pattern.CASE_INSENSITIVE)

  /** extract_simple_services (convert_to_json.py:137-263): detect the
    * header block (alias + partial-match passes), gather non-empty cleaned
    * cell lines after it, chunk into rows of |headers| cells, map cells to
    * fields (codeService splits into code + description; numeric fields
    * float-coerce with null on failure).
    */
  def extractSimpleServices(lines: IndexedSeq[String]): List[Service] = {
    val headers = ListBuffer.empty[String]
    var headerEndIdx = -1

    var idx = 0
    while (headerEndIdx < 0 && idx < lines.length) {
      val cleaned = cleanToken(lines(idx))
      if (cleaned.nonEmpty) {
        if (aliasMap.contains(cleaned) ||
          (cleaned.contains("(code)") && cleaned.contains("service"))) {
          val canonical = aliasMap.getOrElse(cleaned, cleaned)
          if (!headers.contains(canonical)) headers += canonical
          if (canonical == "note") headerEndIdx = idx + 1
        } else {
          // partial-match pass: every alias contained in the line adds its
          // field; 'note' terminates
          val it = HeaderAliases.iterator
          var noteHit = false
          while (it.hasNext && !noteHit) {
            val (alias, field) = it.next()
            if (cleaned.contains(alias) && !headers.contains(field)) {
              headers += field
              if (field == "note") { headerEndIdx = idx + 1; noteHit = true }
            }
          }
        }
      }
      idx += 1
    }

    if (headers.isEmpty) return Nil
    if (headerEndIdx < 0) headerEndIdx = lines.length

    val cells = lines.drop(headerEndIdx).map(cleanToken).filter(_.nonEmpty)
    if (cells.isEmpty) return Nil

    val rowSize = headers.length
    val services = ListBuffer.empty[Service]
    var start = 0
    while (start + rowSize <= cells.length) { // incomplete final row ignored
      val chunk = cells.slice(start, start + rowSize)
      val row = LinkedHashMap.empty[String, Any]
      headers.zip(chunk).foreach { case (field, cell) =>
        if (field == "codeService") {
          val m = CodeServiceRe.matcher(cell)
          if (m.matches()) {
            row("code") = m.group(1).strip()
            val desc = m.group(2).strip()
            if (desc.nonEmpty) row("description") = desc
          } else row("description") = cell
        } else if (NumericFields.contains(field)) {
          row(field) =
            try java.lang.Double.valueOf(cell)
            catch { case _: NumberFormatException => null }
        } else row(field) = cell
      }
      services += row
      start += rowSize
    }
    services.toList
  }

  // ---------------------------------------------------- legacy parser

  private val LegacyFieldNames = List("reqQty", "reqCost", "grossAmount",
    "appQty", "appCost", "appGross", "note")

  /** extract_service_format (convert_to_json.py:345-451): section lines
    * grouped at full-code boundaries (lines before the first code are
    * dropped); per section — primary code + trailing description,
    * additional `(123)` codes merged into the description, case-sensitive
    * type/status vocab, positional numeric assignment, description
    * cleanup. Operates on raw stripped lines (no clean_token) like the
    * reference.
    */
  def extractServiceFormat(tableLines: IndexedSeq[String]): List[Service] = {
    val allLines = tableLines.map(_.strip()).filter(_.nonEmpty)

    val sections = ListBuffer.empty[List[String]]
    var current = ListBuffer.empty[String]
    allLines.foreach { line =>
      if (CodeRe.matcher(line).find()) {
        if (current.nonEmpty) { sections += current.toList; current = ListBuffer.empty }
        current += line
      } else if (current.nonEmpty) current += line
    }
    if (current.nonEmpty) sections += current.toList

    val services = ListBuffer.empty[Service]
    sections.foreach { section =>
      val service = LinkedHashMap.empty[String, Any]
      section.iterator
        .map(l => (l, CodeRe.matcher(l)))
        .find(_._2.find())
        .foreach { case (line, m) =>
          service("code") = m.group(1)
          val descPart = line.substring(m.end()).strip()
          if (descPart.nonEmpty) service("description") = descPart
        }
      if (service.contains("code")) {
        val code = service("code").toString
        val additionalCodes = ListBuffer.empty[String]
        section.foreach { line =>
          if (!line.contains(code)) {
            val am = AddCodeRe.matcher(line)
            if (am.find()) {
              additionalCodes += am.group(1)
              val textWithoutCode = line.replaceAll("\\(\\d+\\)", "").strip()
              if (!service.contains("description")) {
                if (textWithoutCode.nonEmpty) service("description") = textWithoutCode
              } else if (textWithoutCode.nonEmpty &&
                !service("description").toString.contains(textWithoutCode)) {
                service("description") =
                  service("description").toString + " " + textWithoutCode
              }
            }
          }
        }
        if (additionalCodes.nonEmpty) service("additionalCodes") = additionalCodes.toList
        section.map(_.strip())
          .find(l => l == "Imaging" || l == "Lab" || l == "Services" || l == "Consultation")
          .foreach(service("type") = _)
        val numericValues = section.filter(l => NumRe.matcher(l).matches()).map(_.toDouble)
        numericValues.zip(LegacyFieldNames).foreach { case (v, f) =>
          service(f) = java.lang.Double.valueOf(v)
        }
        section.map(_.strip())
          .find(l => l == "Not Required" || l == "Approved" || l == "Partial")
          .foreach(service("status") = _)
        if (service.contains("description")) {
          service("description") =
            ScalarKernels.cleanServiceDescription(service("description").toString)
        }
        if (service.nonEmpty) services += service
      }
    }
    services.toList
  }

  // ------------------------------------- scored variant (ocr_json.py)

  /** find_service_table_section scored variant (ocr_json.py:167-259):
    * accumulates format1/format2 indicator scores while locating the
    * section, classifies the layout, falls back to a middle window when
    * no section is found. Returns (window, formatType).
    */
  def findServiceTableSectionScored(lines: IndexedSeq[String]): (IndexedSeq[String], String) = {
    var startIdx = -1
    var endIdx = -1
    var f1 = 0
    var f2 = 0
    var i = 0
    var broke = false
    while (i < lines.length && !broke) {
      val ll = lower(lines(i))
      // format 1 indicator chain
      if (ll.contains("(code)") && ll.contains("service")) {
        f1 += 5; if (startIdx < 0) startIdx = i
      } else if (CodeRe.matcher(ll).find()) {
        f1 += 3; if (startIdx < 0) startIdx = i
      } else if (ll.contains("req.") || ll.contains("app.")) f1 += 2
      else if (ll.contains("gross") && ll.contains("amount")) f1 += 2
      // format 2 indicator chain (independent)
      if (ll == "code" || ll.startsWith("code ")) {
        f2 += 3; if (startIdx < 0) startIdx = i
      } else if (ll.contains("non standard code")) f2 += 4
      else if (ll.contains("description/service")) f2 += 3
      else if (ll.contains("approved quantity") || ll.contains("approved cost")) f2 += 2
      // end markers
      if (startIdx >= 0 && List("no data to be shown", "in case management",
        "i hereby").exists(ll.contains)) {
        endIdx = i; broke = true
      }
      i += 1
    }
    var formatType =
      if (f1 > f2) "format1"
      else if (f2 > f1) "format2"
      else {
        if (lines.exists(l => CodeRe.matcher(l).find())) "format1" else "format1"
      }
    if (startIdx >= 0) {
      if (endIdx < 0) endIdx = math.min(startIdx + 30, lines.length)
      (lines.slice(math.max(0, startIdx - 5), endIdx), formatType)
    } else if (lines.length > 10) {
      val middle = lines.length / 2
      (lines.slice(math.max(0, middle - 15), math.min(lines.length, middle + 15)), "format1")
    } else (lines, "format1")
  }

  /** extract_service_format2 (ocr_json.py:370-477): "code, non-standard
    * code" horizontal layout — header rows collected until a status /
    * approved-cost header, then data lines assigned to fields by position,
    * a bare code line (`^\d+[^a-zA-Z]*$`) starting each new row.
    */
  private val F2CodeRe = Pattern.compile("^\\d+[^a-zA-Z]*$")
  private val F2HeaderMapping: List[(String, String)] = List(
    "code" -> "code",
    "non standard code" -> "nonStandardCode",
    "description/service" -> "description",
    "type" -> "type",
    "total quantity" -> "reqQty",
    "cost" -> "reqCost",
    "approved quantity" -> "appQty",
    "approved cost" -> "appCost",
    "status" -> "status",
    "(code) service" -> "codeService",
    "gross amount" -> "grossAmount",
    "app. gross" -> "appGross",
    "app.gross" -> "appGross",
    "note" -> "note")
  private val F2NumericFields = Set("reqQty", "reqCost", "appQty", "appCost",
    "grossAmount", "appGross", "note")

  def extractServiceFormat2(tableLines: IndexedSeq[String]): List[Service] = {
    val services = ListBuffer.empty[Service]
    var headers = ListBuffer.empty[String]
    var headerFound = false
    var dataStart = 0

    var i = 0
    var broke = false
    while (i < tableLines.length && !broke) {
      val ll = lower(tableLines(i))
      if (!headerFound) {
        if (ll.contains("code") || ll.contains("description") || ll.contains("type")) {
          headers += tableLines(i)
          if (ll.contains("status") || ll.contains("approved cost")) {
            headerFound = true
            dataStart = i + 1
          }
        }
      } else broke = true
      i += 1
    }

    if (!headerFound && headers.length < 3) {
      headers = ListBuffer("Code", "Non Standard Code", "Description/Service",
        "Type", "Total Quantity", "Cost", "Approved Quantity", "Approved Cost",
        "Status")
      dataStart = 0
      var k = 0
      var found = false
      while (k < tableLines.length && !found) {
        if (F2CodeRe.matcher(tableLines(k).strip()).matches()) {
          dataStart = k; found = true
        }
        k += 1
      }
    }

    var current = LinkedHashMap.empty[String, Any]
    var fieldIndex = 0
    var j = dataStart
    while (j < tableLines.length) {
      val line = tableLines(j).strip()
      if (line.nonEmpty) {
        if (F2CodeRe.matcher(line).matches() &&
          (fieldIndex == 0 || fieldIndex >= headers.length)) {
          if (current.nonEmpty && current.contains("code")) {
            services += current
            current = LinkedHashMap.empty[String, Any]
          }
          current("code") = line
          fieldIndex = 1
        } else if (current.nonEmpty) {
          if (fieldIndex < headers.length) {
            val header = lower(headers(fieldIndex))
            val fieldName = F2HeaderMapping
              .find { case (k, _) => header.contains(k) }.map(_._2).orNull
            if (fieldName != null) {
              if (F2NumericFields.contains(fieldName) &&
                NumRe.matcher(line).matches()) {
                current(fieldName) = java.lang.Double.valueOf(line)
              } else current(fieldName) = line
            }
            fieldIndex += 1
          }
          if (fieldIndex >= headers.length) fieldIndex = 0
        }
      }
      j += 1
    }
    if (current.nonEmpty && current.contains("code")) services += current
    services.toList
  }

  /** ocr_json.py's ladder (ocr_json.py:624-637): scored section + format
    * classification, then format1 ⇄ format2 with cross-fallback.
    * Returns (services, methodThatProduced).
    */
  def extractLadderV2(lines: IndexedSeq[String]): (List[Service], String) = {
    val (tableLines, formatType) = findServiceTableSectionScored(lines)
    if (tableLines.isEmpty) return (Nil, "none")
    val primary =
      if (formatType == "format1") extractServiceFormat(tableLines)
      else extractServiceFormat2(tableLines)
    if (primary.nonEmpty) return (primary, formatType)
    val (fallback, method) =
      if (formatType == "format1") (extractServiceFormat2(tableLines), "format2")
      else (extractServiceFormat(tableLines), "format1")
    if (fallback.nonEmpty) (fallback, method) else (Nil, "none")
  }

  /** The reference's extraction ladder (convert_to_json.py:589-604):
    * section window → vertical parser, legacy parser as fallback.
    * Returns (services, method).
    */
  def extractLadder(lines: IndexedSeq[String]): (List[Service], String) = {
    val tableLines = findServiceTableSection(lines)
    if (tableLines.nonEmpty) {
      val vertical = extractSimpleServices(tableLines)
      if (vertical.nonEmpty) return (vertical, "vertical")
      val legacy = extractServiceFormat(tableLines)
      if (legacy.nonEmpty) return (legacy, "format1")
    }
    (Nil, "none")
  }
}
