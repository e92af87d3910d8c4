package graft.catalog

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

/** In-memory catalog with explicit namespaces (Nessie/Hive-like shape).
  *
  * `singleLevel = true` reproduces Hive's single-level-namespace
  * constraint (reference ITHadoopToHiveCatalogMigrator.java:49-66) and
  * its refusal of the empty namespace (ITNessieToHiveCatalogMigrator
  * .java:48-66).
  *
  * Instances are looked up by name in a JVM-global registry so the same
  * logical catalog is reachable from executor threads in local mode;
  * on a multi-node cluster this impl is test-only by design.
  */
final class MemoryCatalog private (
    val name: String,
    val singleLevel: Boolean) extends Catalog {

  private val namespaces = mutable.LinkedHashSet.empty[Namespace]
  private val tables = mutable.LinkedHashMap.empty[String, String] // ref → metadataLocation

  override def listNamespaces(parent: Namespace): Seq[Namespace] = synchronized {
    NamespaceListing.childrenOf(namespaces.toSeq, parent)
  }

  override def namespaceExists(ns: Namespace): Boolean = synchronized {
    namespaces.contains(ns)
  }

  override def createNamespace(ns: Namespace): Unit = synchronized {
    if (ns.isEmpty)
      throw new IllegalArgumentException(s"Cannot create empty namespace in catalog $name")
    if (singleLevel && ns.levels.size > 1)
      throw new IllegalArgumentException(
        s"Catalog $name supports only single-level namespaces, got: $ns")
    if (!namespaces.add(ns))
      throw new AlreadyExistsException(s"Namespace already exists: $ns")
  }

  override def listTables(ns: Namespace): Seq[TableRef] = synchronized {
    if (!ns.isEmpty && !namespaces.contains(ns))
      throw new NoSuchNamespaceException(s"Namespace does not exist: $ns")
    if (ns.isEmpty && singleLevel)
      throw new NoSuchNamespaceException(s"Invalid namespace: empty (catalog $name)")
    tables.keysIterator.map(TableRef.parse)
      .filter(_.namespace == ns).toSeq
  }

  override def tableExists(ref: TableRef): Boolean = synchronized {
    tables.contains(ref.toString)
  }

  override def loadTableMetadataLocation(ref: TableRef): String = synchronized {
    tables.getOrElse(ref.toString,
      throw new NoSuchTableException(s"Table does not exist: $ref"))
  }

  override def registerTable(ref: TableRef, metadataLocation: String): Unit = synchronized {
    if (tables.contains(ref.toString))
      throw new AlreadyExistsException(s"Table already exists: $ref")
    if (!ref.namespace.isEmpty && !namespaces.contains(ref.namespace))
      throw new NoSuchNamespaceException(s"Namespace does not exist: ${ref.namespace}")
    tables.put(ref.toString, metadataLocation)
  }

  override def dropTable(ref: TableRef): Boolean = synchronized {
    tables.remove(ref.toString).isDefined
  }
}

object MemoryCatalog {
  private val registry = TrieMap.empty[String, MemoryCatalog]

  def forName(name: String, singleLevel: Boolean = false): MemoryCatalog =
    registry.getOrElseUpdate(name, new MemoryCatalog(name, singleLevel))

  /** Test hook: forget a named catalog. */
  def drop(name: String): Unit = registry.remove(name)
}
