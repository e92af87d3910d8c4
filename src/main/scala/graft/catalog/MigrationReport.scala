package graft.catalog

/** Console-report and output-file rendering with the reference CLI's
  * wording (BaseRegisterCommand.java:251-336; verb templates
  * MigrateCommand.java:86-99 / RegisterCommand.java:76-89), since the
  * reference's own tests assert on these exact strings.
  */
object MigrationReport {

  val FailedIdentifiersFile = "failed_identifiers.txt"
  val FailedToDeleteFile = "failed_to_delete_at_source.txt"
  val DryRunFile = "dry_run_identifiers.txt"

  /** Verb set: migrate mode vs register mode. */
  final case class Verbs(operate: String, operated: String, operation: String)
  val MigrateVerbs: Verbs = Verbs("migrate", "migrated", "migration")
  val RegisterVerbs: Verbs = Verbs("register", "registered", "registration")

  private def nl = System.lineSeparator()

  def summary(result: MigrationResult, v: Verbs,
      sourceType: String, targetType: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    out += "Summary: "
    if (result.registeredTableIdentifiers.nonEmpty)
      out += s"Successfully ${v.operated} ${result.registeredTableIdentifiers.size} tables " +
        s"from $sourceType catalog to $targetType catalog."
    if (result.failedToRegisterTableIdentifiers.nonEmpty)
      out += s"Failed to ${v.operate} ${result.failedToRegisterTableIdentifiers.size} tables " +
        s"from $sourceType catalog to $targetType catalog. " +
        "Please check the `catalog_migration.log` file for the failure reason. " +
        s"Failed identifiers are written into `$FailedIdentifiersFile`. " +
        "Retry with that file using `--identifiers-from-file` option " +
        "if the failure is because of network/connection timeouts."
    if (result.failedToDeleteTableIdentifiers.nonEmpty)
      out += s"Failed to delete ${result.failedToDeleteTableIdentifiers.size} tables from " +
        s"$sourceType catalog. " +
        "Please check the `catalog_migration.log` file for the failure reason. " +
        s"${nl}Failed to delete identifiers are written into `$FailedToDeleteFile`."
    out.result()
  }

  def details(result: MigrationResult, v: Verbs): Seq[String] = {
    val out = Seq.newBuilder[String]
    out += "Details: "
    if (result.registeredTableIdentifiers.nonEmpty)
      out += s"Successfully ${v.operated} these tables:$nl" +
        result.registeredTableIdentifiers.mkString("[", ", ", "]")
    if (result.failedToRegisterTableIdentifiers.nonEmpty)
      out += s"Failed to ${v.operate} these tables:$nl" +
        result.failedToRegisterTableIdentifiers.mkString("[", ", ", "]")
    if (result.failedToDeleteTableIdentifiers.nonEmpty)
      out += s"Failed to delete these tables from source catalog:$nl" +
        result.failedToDeleteTableIdentifiers.mkString("[", ", ", "]")
    out.result()
  }

  def dryRun(identifiers: Seq[TableRef], v: Verbs): Seq[String] = Seq(
    "Summary: ",
    s"Identified ${identifiers.size} tables for ${v.operation} by dry-run. " +
      s"These identifiers are also written into $DryRunFile. " +
      "This file can be used with `--identifiers-from-file` option for an actual run.",
    s"Details: ${nl}Identified these tables for ${v.operation} by dry-run:$nl" +
      identifiers.mkString("[", ", ", "]"))

  /** One dotted identifier per line (BaseRegisterCommand.java:328-336) —
    * these files are a retry interface via `--identifiers-from-file`. */
  def identifierFileContent(identifiers: Seq[TableRef]): String =
    identifiers.map(_.toString + System.lineSeparator()).mkString
}
