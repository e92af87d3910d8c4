package graft.catalog

/** A named store of namespaces + tables, where a table is its current
  * metadata-file location (the crux of the reference's model,
  * CatalogMigrator.java:212-213). Both sides of a migration implement
  * this; it is the Scala re-expression of Iceberg's
  * `Catalog with SupportsNamespaces` surface the reference consumes.
  */
trait Catalog extends AutoCloseable {
  def name: String

  /** Direct children of `parent` (empty namespace = roots). May throw
    * [[NoSuchNamespaceException]] for a missing parent. */
  def listNamespaces(parent: Namespace): Seq[Namespace]
  def namespaceExists(ns: Namespace): Boolean
  /** Throws [[AlreadyExistsException]] if present — callers create
    * forcefully and swallow, halving RPCs (CatalogMigrator.java:186-192). */
  def createNamespace(ns: Namespace): Unit

  /** Tables directly in `ns`. Throws [[NoSuchNamespaceException]] if the
    * namespace does not exist. */
  def listTables(ns: Namespace): Seq[TableRef]
  def tableExists(ref: TableRef): Boolean
  /** Current metadata-file location. Throws [[NoSuchTableException]]. */
  def loadTableMetadataLocation(ref: TableRef): String
  /** Record `metadataLocation` as table `ref` — a pointer write, never a
    * data copy. Throws [[AlreadyExistsException]] if `ref` exists. */
  def registerTable(ref: TableRef, metadataLocation: String): Unit
  /** Drop the catalog entry (purge = false semantics). Returns false if
    * the table did not exist. May remove backing files for catalogs whose
    * entries own their directory (Hadoop-style). */
  def dropTable(ref: TableRef): Boolean

  /** True when dropping an entry also destroys the files the migrated
    * pointer still references — forbids delete-at-source (reference
    * guard CatalogMigrator.java:75-78, MigrateCommand.java:56-64). */
  def dropDestroysData: Boolean = false

  override def close(): Unit = ()
}

/** Optional capability: a catalog that keeps per-table metadata version
  * history and can resolve any past version — the engine's time-travel
  * surface over the `v<N>.metadata.json` trail that pointer commits
  * leave behind (the Iceberg snapshot model the reference rides on,
  * CatalogMigrator.java:212-213). Readers reach it via
  * `CatalogIO.readTableVersion` or SQL `VERSION AS OF` through
  * [[graft.sources.GraftSparkCatalog]]. */
trait SupportsTableVersions { self: Catalog =>
  /** Ascending committed version numbers of `ref`'s own metadata history
    * (empty for tables registered at an external metadata location —
    * their history lives with the source catalog). */
  def listTableVersions(ref: TableRef): Seq[Int]
  /** Metadata-file location of one historical version. Throws
    * [[NoSuchTableException]] if the table or version is missing. */
  def metadataLocationForVersion(ref: TableRef, version: Int): String
}

/** Serializable catalog spec, buildable on executors — the factory shape
  * of the reference's `CatalogMigrationUtil.buildCatalog` (:48-96),
  * including its Hadoop `Configuration` overlay (:59-64). */
final case class CatalogConfig(
    catalogType: String,
    name: String,
    properties: Map[String, String] = Map.empty,
    hadoopConf: Map[String, String] = Map.empty)

object CatalogFactory {
  /** Type → implementation dispatch; `custom` loads a user class
    * implementing [[Catalog]] with a (CatalogConfig) constructor,
    * mirroring the reference's CUSTOM + `--source-custom-catalog-impl`. */
  def build(cfg: CatalogConfig): Catalog = cfg.catalogType.toLowerCase match {
    case "hadoop" =>
      val wh = cfg.properties.getOrElse("warehouse",
        throw new IllegalArgumentException(
          s"Catalog ${cfg.name}: hadoop catalog requires a 'warehouse' property"))
      new HadoopFsCatalog(cfg.name, wh, cfg.hadoopConf)
    case "memory" =>
      MemoryCatalog.forName(cfg.properties.getOrElse("name", cfg.name),
        singleLevel = cfg.properties.get("single-level").contains("true"))
    case "rest" =>
      val uri = cfg.properties.getOrElse("uri",
        throw new IllegalArgumentException(
          s"Catalog ${cfg.name}: rest catalog requires a 'uri' property"))
      new RestCatalog(cfg.name, uri,
        token = cfg.properties.get("token"),
        pageSize = cfg.properties.get("page-size").flatMap(_.toIntOption),
        // OAuth2 client credentials (round 16) — Iceberg's property
        // names: `credential` = clientId:clientSecret,
        // `oauth2-server-uri` overrides the spec's /v1/oauth/tokens,
        // `scope` defaults to "catalog"
        credential = cfg.properties.get("credential"),
        oauth2ServerUri = cfg.properties.get("oauth2-server-uri"),
        scope = cfg.properties.get("scope"))
    case "jdbc" =>
      val uri = cfg.properties.getOrElse("uri",
        throw new IllegalArgumentException(
          s"Catalog ${cfg.name}: jdbc catalog requires a 'uri' property"))
      new JdbcCatalog(cfg.name, uri,
        cfg.properties.get("jdbc.user"), cfg.properties.get("jdbc.password"))
    case "hive" =>
      val wh = cfg.properties.getOrElse("warehouse",
        throw new IllegalArgumentException(
          s"Catalog ${cfg.name}: hive catalog requires a 'warehouse' property"))
      (cfg.properties.get("uri"), cfg.properties.get("metastore-dir")) match {
        case (Some(uri), _) => HiveCatalog.remote(cfg.name, uri, wh)
        case (None, Some(dir)) => HiveCatalog.embedded(cfg.name, dir, wh)
        case (None, None) => throw new IllegalArgumentException(
          s"Catalog ${cfg.name}: hive catalog requires 'uri' (remote thrift) " +
            "or 'metastore-dir' (embedded Derby)")
      }
    case "nessie" =>
      val store = cfg.properties.getOrElse("store",
        throw new IllegalArgumentException(
          s"Catalog ${cfg.name}: nessie catalog requires a 'store' property"))
      // ref-store=kv routes branch-head CAS through the KvStore seam
      // (DynamoDB/ECS conditional writes) instead of O_EXCL lock files —
      // the production posture for object-store-backed Nessie stores.
      // Commit objects stay content-addressed files under `store`.
      val (kvRefs, kvOwned) = cfg.properties.get("ref-store") match {
        case Some("kv") =>
          (cfg.properties.get("ref-store-impl"),
            cfg.properties.get("ref-store-id")) match {
            case (Some(impl), _) =>
              (Some(Class.forName(impl).getConstructor(classOf[CatalogConfig])
                .newInstance(cfg).asInstanceOf[KvStore]), true)
            case (None, Some(id)) => (Some(MemoryKvStore.forId(id)), false)
            case (None, None) => throw new IllegalArgumentException(
              s"Catalog ${cfg.name}: ref-store=kv requires 'ref-store-id' " +
                "(memory id) or 'ref-store-impl' (KvStore adapter class)")
          }
        case Some("file") | None => (None, false)
        case Some(other) => throw new IllegalArgumentException(
          s"Catalog ${cfg.name}: unknown ref-store '$other' (file | kv)")
      }
      new NessieCatalog(cfg.name, store,
        cfg.properties.getOrElse("ref", NessieCatalog.DefaultBranch),
        cfg.hadoopConf, kvRefs, kvOwned)
    case "kv" =>
      // the DynamoDB/ECS catalog model over the KvStore seam: `store`
      // names a JVM-global MemoryKvStore (offline/testing); a production
      // deployment loads a cloud-SDK adapter via `store-impl`
      val store = (cfg.properties.get("store-impl"), cfg.properties.get("store")) match {
        case (Some(impl), _) =>
          Class.forName(impl).getConstructor(classOf[CatalogConfig])
            .newInstance(cfg).asInstanceOf[KvStore]
        case (None, Some(id)) => MemoryKvStore.forId(id)
        case (None, None) => throw new IllegalArgumentException(
          s"Catalog ${cfg.name}: kv catalog requires a 'store' (memory id) " +
            "or 'store-impl' (KvStore adapter class) property")
      }
      new KvCatalog(cfg.name, store,
        ownsStore = cfg.properties.contains("store-impl"))
    case "glue" =>
      // the reference's 9th catalog kind: AWS Glue databases/tables over
      // the GlueApi seam. `store` names a JVM-global MemoryGlueApi
      // (offline/testing); production loads an AWS-SDK adapter via
      // `glue-impl` — the same seam discipline as the kv kind.
      val glue = (cfg.properties.get("glue-impl"), cfg.properties.get("store")) match {
        case (Some(impl), _) =>
          Class.forName(impl).getConstructor(classOf[CatalogConfig])
            .newInstance(cfg).asInstanceOf[GlueApi]
        case (None, Some(id)) => MemoryGlueApi.forId(id)
        case (None, None) => throw new IllegalArgumentException(
          s"Catalog ${cfg.name}: glue catalog requires a 'store' (memory id) " +
            "or 'glue-impl' (GlueApi adapter class) property")
      }
      new GlueCatalog(cfg.name, glue,
        ownsApi = cfg.properties.contains("glue-impl"))
    case "custom" =>
      val impl = cfg.properties.getOrElse("impl",
        throw new IllegalArgumentException(
          s"Catalog ${cfg.name}: custom catalog requires an 'impl' property"))
      Class.forName(impl)
        .getConstructor(classOf[CatalogConfig])
        .newInstance(cfg)
        .asInstanceOf[Catalog]
    case other =>
      throw new IllegalArgumentException(s"Unsupported catalog type: $other")
  }
}
