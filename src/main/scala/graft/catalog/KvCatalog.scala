package graft.catalog

import scala.collection.concurrent.TrieMap

/** The conditional-write key-value contract behind the reference's
  * cloud catalog kinds DYNAMODB and ECS (`CatalogMigrationUtil
  * .java:36-46` dispatches both through Iceberg's DynamoDbCatalog /
  * EcsCatalog): DynamoDB exposes it as PutItem/DeleteItem with
  * condition expressions plus Query over key ranges; Dell ECS as
  * object writes guarded by E-Tag compare-and-set. Every catalog
  * operation reduces to these five primitives, so a production
  * adapter is a thin SDK wrapper loaded reflectively
  * (`store-impl`), while [[MemoryKvStore]] makes the model fully
  * testable in this offline environment.
  */
trait KvStore extends AutoCloseable {
  def get(key: String): Option[String]
  /** Conditional create (DynamoDB `attribute_not_exists`): true iff
    * the key was absent and is now set. Rivals resolve IN THE STORE —
    * exactly one concurrent creator sees true. */
  def putIfAbsent(key: String, value: String): Boolean
  /** Compare-and-set (DynamoDB condition on the stored value / ECS
    * If-Match E-Tag): true iff the current value equals `expect` and
    * is now `value`. */
  def replace(key: String, expect: String, value: String): Boolean
  /** Delete; with `expect`, conditional on the current value. True
    * iff an entry was removed. */
  def delete(key: String, expect: Option[String] = None): Boolean
  /** All (key, value) pairs whose key starts with `prefix`,
    * key-sorted (DynamoDB Query on a key condition / ECS list). */
  def scanPrefix(prefix: String): Seq[(String, String)]
  override def close(): Unit = ()
}

/** JVM-global in-memory [[KvStore]], looked up by id so executor
  * threads in local mode share one logical store (the same registry
  * pattern as [[MemoryCatalog]]; multi-node production plugs a real
  * DynamoDB/ECS adapter instead). All five primitives are atomic on
  * the underlying concurrent map. */
final class MemoryKvStore private (val id: String) extends KvStore {
  private val items = TrieMap.empty[String, String]
  override def get(key: String): Option[String] = items.get(key)
  override def putIfAbsent(key: String, value: String): Boolean =
    items.putIfAbsent(key, value).isEmpty
  override def replace(key: String, expect: String, value: String): Boolean =
    items.replace(key, expect, value)
  override def delete(key: String, expect: Option[String]): Boolean =
    expect match {
      case Some(e) => items.remove(key, e)
      case None => items.remove(key).isDefined
    }
  override def scanPrefix(prefix: String): Seq[(String, String)] =
    items.snapshot().iterator.filter(_._1.startsWith(prefix)).toVector.sortBy(_._1)
}

object MemoryKvStore {
  private val registry = TrieMap.empty[String, MemoryKvStore]
  def forId(id: String): MemoryKvStore =
    registry.getOrElseUpdate(id, new MemoryKvStore(id))
}

/** KV-backed catalog — the Scala re-expression of the reference's
  * DYNAMODB and ECS catalog kinds over the [[KvStore]] seam, following
  * the public Iceberg DynamoDbCatalog item layout: one flat item table
  * holding BOTH namespace markers and table pointers, keyed so that a
  * namespace's children are one key-range scan:
  *
  *   `<catalog>␀NAMESPACE␀<dotted-ns>`        → "" (marker)
  *   `<catalog>␀TABLE␀<dotted-ns>␀<table>`    → metadata location
  *
  * (`␀` = NUL, which cannot appear in identifiers.) Registration is a
  * conditional create and a register race resolves in the store — the
  * loser surfaces the same [[AlreadyExistsException]] every backend
  * throws; pointer commits are value-checked CAS
  * ([[replaceTablePointer]]), the DynamoDB version-attribute /
  * ECS E-Tag commit shape. Namespaces are explicit and multi-level
  * (Nessie-like), like the JDBC backend. */
final class KvCatalog(val name: String, store: KvStore,
    ownsStore: Boolean = false) extends Catalog {

  private val Sep = "\u0000"
  private def nsKey(ns: Namespace): String =
    s"$name${Sep}NAMESPACE$Sep${ns.levels.mkString(".")}"
  private def tblKey(ref: TableRef): String =
    s"$name${Sep}TABLE$Sep${ref.namespace.levels.mkString(".")}$Sep${ref.name}"

  override def listNamespaces(parent: Namespace): Seq[Namespace] = {
    val all = store.scanPrefix(s"$name${Sep}NAMESPACE$Sep")
      .map(_._1.split(Sep, 3)(2)).map(Namespace.parse)
    NamespaceListing.childrenOf(all, parent)
  }

  override def namespaceExists(ns: Namespace): Boolean =
    store.get(nsKey(ns)).isDefined

  override def createNamespace(ns: Namespace): Unit = {
    if (ns.isEmpty)
      throw new IllegalArgumentException(s"Cannot create empty namespace in catalog $name")
    if (!store.putIfAbsent(nsKey(ns), ""))
      throw new AlreadyExistsException(s"Namespace already exists: $ns")
  }

  override def listTables(ns: Namespace): Seq[TableRef] = {
    if (!ns.isEmpty && !namespaceExists(ns))
      throw new NoSuchNamespaceException(s"Namespace does not exist: $ns")
    store.scanPrefix(s"$name${Sep}TABLE$Sep${ns.levels.mkString(".")}$Sep")
      .map(kv => TableRef(ns, kv._1.split(Sep, 4)(3)))
  }

  override def tableExists(ref: TableRef): Boolean =
    store.get(tblKey(ref)).isDefined

  override def loadTableMetadataLocation(ref: TableRef): String =
    store.get(tblKey(ref)).getOrElse(
      throw new NoSuchTableException(s"Table does not exist: $ref"))

  override def registerTable(ref: TableRef, metadataLocation: String): Unit = {
    if (!ref.namespace.isEmpty && !namespaceExists(ref.namespace))
      throw new NoSuchNamespaceException(s"Namespace does not exist: ${ref.namespace}")
    if (!store.putIfAbsent(tblKey(ref), metadataLocation))
      throw new AlreadyExistsException(s"Table already exists: $ref")
  }

  /** Metadata-pointer commit as a value-checked CAS — the DynamoDB
    * conditional-update / ECS If-Match shape Iceberg's cloud catalogs
    * use for snapshot commits: true iff the pointer still was
    * `expectedLocation` and now is `newLocation`; a false means a
    * rival committed first and the caller must re-read and retry. */
  def replaceTablePointer(ref: TableRef, expectedLocation: String,
      newLocation: String): Boolean =
    store.replace(tblKey(ref), expectedLocation, newLocation)

  override def dropTable(ref: TableRef): Boolean =
    store.delete(tblKey(ref))

  override def close(): Unit = if (ownsStore) store.close()
}
