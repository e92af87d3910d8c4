package graft.catalog

/** Core metadata model, re-expressed from the reference's abstractions
  * (SURVEY.md §1.1; reference `CatalogMigrator.java`, `TableIdentifier`).
  */

/** Multi-level namespace, e.g. a.b.c (reference `Namespace.of(levels)`). */
final case class Namespace(levels: Vector[String]) {
  def isEmpty: Boolean = levels.isEmpty
  /** a.b.c → [a, a.b, a.b.c] — the reference's level-by-level creation
    * order (CatalogMigrator.java:181-183). */
  def prefixes: Seq[Namespace] =
    (1 to levels.size).map(i => Namespace(levels.take(i)))
  def child(level: String): Namespace = Namespace(levels :+ level)
  override def toString: String = levels.mkString(".")
}

object Namespace {
  val empty: Namespace = Namespace(Vector.empty)
  def of(levels: String*): Namespace = Namespace(levels.toVector)
  def parse(s: String): Namespace =
    if (s.isEmpty) empty else Namespace(s.split('.').toVector)
}

/** Table identifier = namespace + name (reference `TableIdentifier`);
  * parsed from dotted strings at the last dot (IdentifierOptions.java:72). */
final case class TableRef(namespace: Namespace, name: String) {
  override def toString: String =
    if (namespace.isEmpty) name else s"$namespace.$name"
}

object TableRef {
  def parse(s: String): TableRef = {
    val i = s.lastIndexOf('.')
    if (i < 0) TableRef(Namespace.empty, s)
    else TableRef(Namespace.parse(s.substring(0, i)), s.substring(i + 1))
  }
}

/** Catalog error taxonomy (mirrors the Iceberg exceptions the reference
  * relies on: AlreadyExists / NoSuchTable / NoSuchNamespace). */
final class AlreadyExistsException(msg: String) extends RuntimeException(msg)
final class NoSuchTableException(msg: String) extends RuntimeException(msg)
final class NoSuchNamespaceException(msg: String) extends RuntimeException(msg)

/** A versioned commit whose base snapshot is no longer the table's latest
  * version — the read-modify-write raced another committer and applying
  * it would silently drop the other writer's rows. Callers retry the
  * whole read-union-commit loop. */
final class CommitConflictException(msg: String) extends RuntimeException(msg)

/** Per-table outcome row produced by the distributed registration stage —
  * errors are data, never task failures (fail-soft semantics R10–R12). */
final case class MigrationOutcome(
    identifier: String,
    seq: Long,
    registered: Boolean,
    deleteFailed: Boolean,
    error: Option[String])

/** Tri-list result (reference CatalogMigrationResult.java:23-30). */
final case class MigrationResult(
    registeredTableIdentifiers: Seq[TableRef],
    failedToRegisterTableIdentifiers: Seq[TableRef],
    failedToDeleteTableIdentifiers: Seq[TableRef])

/** Direct-children listing shared by the explicit-namespace backends
  * (memory, jdbc, kv): roots for the empty parent, otherwise the parent
  * must exist — ONE definition so the three catalogs' namespace
  * semantics (and the error wording parity specs assert on) cannot
  * drift. */
private[catalog] object NamespaceListing {
  def childrenOf(all: Seq[Namespace], parent: Namespace): Seq[Namespace] =
    if (parent.isEmpty) all.filter(_.levels.size == 1)
    else {
      if (!all.contains(parent))
        throw new NoSuchNamespaceException(s"Namespace does not exist: $parent")
      all.filter(ns => ns.levels.size == parent.levels.size + 1 &&
        ns.levels.startsWith(parent.levels))
    }
}
