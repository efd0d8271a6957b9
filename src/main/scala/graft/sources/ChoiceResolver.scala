package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Glue DynamicFrame "choice"-type resolution, re-expressed over Spark 4
  * VARIANT — closes SURVEY "what's missing" #3 (r9 verdict): Glue's
  * DynamicFrame carries a per-record TYPE UNION when a semi-structured
  * field drifts (a number in one record, a string in the next), and the
  * public `resolveChoice` API collapses it with one of four strategies.
  * The reference's own 437 lines never call `resolveChoice`, but every
  * DynamicFrame read it performs relies on the union type existing — a
  * migrating user with drifting JSON hits it immediately.
  *
  * Spark-first realization: ingest drifting JSON as VARIANT
  * (`parse_json`, the ext88/st31 tier) — the per-record type IS carried,
  * by the variant encoding — then resolve with the same strategy names:
  *
  *  - `cast:T`      one column of T via `try_variant_get` (Spark's cast
  *                  rules; unconvertible values null) PLUS a
  *                  `<field>_conflict` flag: raw value present but cast
  *                  returned null — the rows a quarantine pass wants.
  *  - `make_cols`   one column PER ACTUAL TYPE (`schema_of_variant`
  *                  branches on the encoded type): `<field>_long`,
  *                  `<field>_string`, ... — Glue's col-splitting shape.
  *  - `make_struct` the same attempts carried as one struct column.
  *  - `project:T`   keep only values whose ACTUAL type is T (not merely
  *                  castable — "12" stays a string), others null.
  *
  * Everything is a row-local projection over codegen'd variant
  * expressions — zero shuffle, composes with streaming ingest unchanged.
  * Type tokens accept both Glue spellings and Spark DDL (`long`/`bigint`,
  * `string`, `double`, `boolean`).
  */
object ChoiceResolver {

  /** Map a Glue-or-DDL type token to (spark DDL type, column suffix,
    * schema_of_variant spellings that mean "actually this type"). */
  private def typeInfo(t: String): (String, String, Seq[String]) =
    t.trim.toLowerCase match {
      case "long" | "bigint" | "int" => ("bigint", "long", Seq("BIGINT", "INT", "SMALLINT", "TINYINT"))
      case "string" | "varchar"      => ("string", "string", Seq("STRING"))
      case "double" | "float"        => ("double", "double", Seq("DOUBLE", "FLOAT"))
      case "boolean" | "bool"        => ("boolean", "boolean", Seq("BOOLEAN"))
      case other => throw new graft.config.ConfigError(
        s"resolve_choice: unsupported type '$other' (long/string/double/boolean)")
    }

  private def fieldVariant(variantCol: Column, field: String): Column =
    variant_get(variantCol, s"$$.$field", "variant")

  /** The actual encoded type of `field`, as schema_of_variant spells it
    * ("VOID" when the field is absent/null). */
  private def actualType(variantCol: Column, field: String): Column =
    schema_of_variant(fieldVariant(variantCol, field))

  /** `cast:T` — typed column + conflict flag. */
  def castTo(df: DataFrame, variantCol: String, field: String,
             t: String): DataFrame = {
    val (ddl, _, _) = typeInfo(t)
    val v = fieldVariant(col(variantCol), field)
    val typed = try_variant_get(col(variantCol), s"$$.$field", ddl)
    df.withColumn(field, typed)
      .withColumn(s"${field}_conflict",
        v.isNotNull && actualType(col(variantCol), field) =!= lit("VOID") &&
          typed.isNull)
  }

  /** `make_cols` — one column per candidate ACTUAL type. */
  def makeCols(df: DataFrame, variantCol: String, field: String,
               types: Seq[String]): DataFrame =
    types.foldLeft(df) { (acc, t) =>
      val (ddl, suffix, actuals) = typeInfo(t)
      acc.withColumn(s"${field}_$suffix",
        when(actualType(col(variantCol), field).isin(actuals: _*),
          try_variant_get(col(variantCol), s"$$.$field", ddl)))
    }

  /** `make_struct` — the same attempts as one struct column. */
  def makeStruct(df: DataFrame, variantCol: String, field: String,
                 types: Seq[String]): DataFrame = {
    val fields = types.map { t =>
      val (ddl, suffix, actuals) = typeInfo(t)
      when(actualType(col(variantCol), field).isin(actuals: _*),
        try_variant_get(col(variantCol), s"$$.$field", ddl)).as(suffix)
    }
    df.withColumn(field, struct(fields: _*))
  }

  /** `project:T` — values whose ACTUAL type is T; others null. */
  def project(df: DataFrame, variantCol: String, field: String,
              t: String): DataFrame = {
    val (ddl, _, actuals) = typeInfo(t)
    df.withColumn(field,
      when(actualType(col(variantCol), field).isin(actuals: _*),
        try_variant_get(col(variantCol), s"$$.$field", ddl)))
  }

  /** The Glue-spec entry point: `"cast:long"`, `"make_cols"`,
    * `"make_struct"`, `"project:string"`. `types` applies to the
    * make_* strategies (candidate types, default long+string). */
  def resolveChoice(df: DataFrame, variantCol: String, field: String,
                    spec: String,
                    types: Seq[String] = Seq("long", "string")): DataFrame =
    spec.trim.toLowerCase.split(":", 2) match {
      case Array("cast", t)    => castTo(df, variantCol, field, t)
      case Array("project", t) => project(df, variantCol, field, t)
      case Array("make_cols")   => makeCols(df, variantCol, field, types)
      case Array("make_struct") => makeStruct(df, variantCol, field, types)
      case _ => throw new graft.config.ConfigError(
        s"resolve_choice: unknown spec '$spec' " +
          "(cast:T, project:T, make_cols, make_struct)")
    }
}
