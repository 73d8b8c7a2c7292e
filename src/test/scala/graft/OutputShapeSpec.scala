package graft

import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Registry-wide output-shape contract for the oracle gate (r17
  * lesson: `g_sgns_train` shipped an `ARRAY<BIGINT>` column and the
  * driver's pandas comparator crashed — `rows_match: null` instead of
  * a red-or-green row). The gate factorizes cells, so every registered
  * query MUST return atomic-typed columns only; operators with
  * naturally-nested outputs flatten at the REGISTRATION site
  * (`concat_ws` / `posexplode` — the `a3_team_groups` convention),
  * keeping the operator's own return type intact.
  *
  * Constructing each frame is enough: schemas are known pre-action,
  * and the eager operators (fixpoints, trainers) run at sf0.001.
  */
class OutputShapeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def isNested(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => true
    case _ => false
  }

  test("every registered query returns atomic-typed columns only") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = fn(spark, sfDir).schema.fields.filter(f => isNested(f.dataType))
        if (bad.isEmpty) Nil
        else Seq(s"$name -> " +
          bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", "))
    }
    assert(offenders.isEmpty,
      s"nested output columns crash the driver's comparator — flatten at " +
        s"the registration site:\n${offenders.mkString("\n")}")
  }

  test("every registered query has an oracle entry or is explicitly rows-only") {
    // the driver records a weaker rows-only check for queries absent
    // from oracleSql; that set must be empty here — every operator
    // claimed done carries the full row/schema/hash gate
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"queries without an oracle: $unoracled")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracle entries without a query: $orphaned")
  }
}
