package graft.model

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Inspection → JSON for the tables_index.csv_detective column (reference
  * stores the whole csv-detective report: analysis/csv.py:398-408). json4s
  * ships inside Spark's own jars — no extra dependency. */
object InspectionJson {

  def toJson(i: Inspection): String = {
    val columns = JObject(i.columns.toSeq.sortBy(_._1).map { case (name, ci) =>
      name -> JObject("python_type" -> JString(ci.pythonType), "format" -> JString(ci.format))
    }.toList)
    val profile = JObject(i.profile.toSeq.sortBy(_._1).map { case (name, p) =>
      name -> JObject(
        "min" -> p.min.map(JDouble(_)).getOrElse(JNull),
        "max" -> p.max.map(JDouble(_)).getOrElse(JNull),
        "mean" -> p.mean.map(JDouble(_)).getOrElse(JNull),
        "std" -> p.std.map(JDouble(_)).getOrElse(JNull),
        "tops" -> JArray(p.tops.toList.map { case (v, n) =>
          JObject("value" -> JString(v), "count" -> JLong(n))
        }),
        "nb_distinct" -> JLong(p.nbDistinct),
        "nb_missing_values" -> JLong(p.nbMissingValues))
    }.toList)
    JsonMethods.compact(JsonMethods.render(JObject(
      "encoding" -> JString(i.encoding),
      "separator" -> JString(i.separator),
      "header_row_idx" -> JInt(i.headerRowIdx),
      "header" -> JArray(i.header.toList.map(JString(_))),
      "total_lines" -> JLong(i.totalLines),
      "columns" -> columns,
      "formats" -> JObject(i.columns.toSeq.sortBy(_._1).map { case (n, ci) =>
        n -> JString(ci.format)
      }.toList),
      "profile" -> profile)))
  }
}
