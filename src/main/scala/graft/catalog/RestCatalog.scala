package graft.catalog

import java.net.{InetSocketAddress, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** REST catalog wire format + endpoints, shared by [[RestCatalog]] (client)
  * and [[RestCatalogServer]]. Re-expresses the reference's REST catalog
  * type (CatalogMigrationUtil.java:36-46 dispatches REST to Iceberg's
  * RESTCatalog) as a minimal HTTP/JSON protocol over the [[Catalog]]
  * trait — same operations, same error taxonomy, carried by status codes:
  *
  *   - `GET  /v1/config`                → {"name":…,"dropDestroysData":…}
  *   - `GET  /v1/namespaces?parent=…`   → {"namespaces":[…]}
  *   - `GET  /v1/namespaces/exists?ns=…`→ {"exists":…}
  *   - `POST /v1/namespaces` {"namespace":…}
  *   - `GET  /v1/tables?ns=…`           → {"tables":[…]}
  *   - `GET  /v1/tables/exists?ref=…`   → {"exists":…}
  *   - `GET  /v1/tables/load?ref=…`     → {"metadataLocation":…}
  *   - `POST /v1/tables/register` {"identifier":…,"metadataLocation":…}
  *   - `POST /v1/tables/drop` {"identifier":…} → {"dropped":…}
  *
  * Typed errors travel as {"error":<exception simple name>,"message":…}
  * with 404 (NoSuchTable/NoSuchNamespace), 409 (AlreadyExists) or 400
  * (IllegalArgument); the client rehydrates the SAME exception types, so
  * the migrator's fail-soft and tolerant-scan semantics (R3, R10–R12)
  * hold identically across the network boundary.
  */
private[catalog] object RestProtocol {

  /** JSON string literal with full escaping — metadata locations and
    * identifiers are caller-controlled and may be hostile (quotes,
    * backslashes, control chars), and must round-trip byte-exact. */
  def jstr(s: String): String = {
    val b = new StringBuilder(s.length + 2).append('"')
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\b' => b.append("\\b")
      case '\f' => b.append("\\f")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")

  def arr(vs: Seq[String]): String = vs.map(jstr).mkString("[", ",", "]")

  /** Parse one flat JSON object of string / boolean / string-array values
    * (the only shapes this protocol emits). A real tokenizer, not regex:
    * values may contain braces, commas, escapes. */
  def parseFlat(json: String): Map[String, Any] = {
    var i = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"Bad JSON at $i: $msg in $json")
    def ws(): Unit = while (i < json.length && json(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      ws(); if (i >= json.length || json(i) != c) fail(s"expected '$c'"); i += 1
    }
    def str(): String = {
      expect('"')
      val b = new StringBuilder
      while (json(i) != '"') {
        if (json(i) == '\\') {
          i += 1
          json(i) match {
            case '"' => b.append('"'); case '\\' => b.append('\\')
            case '/' => b.append('/'); case 'b' => b.append('\b')
            case 'f' => b.append('\f'); case 'n' => b.append('\n')
            case 'r' => b.append('\r'); case 't' => b.append('\t')
            case 'u' =>
              b.append(Integer.parseInt(json.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case c => fail(s"bad escape \\$c")
          }
        } else b.append(json(i))
        i += 1
      }
      i += 1
      b.toString
    }
    def value(): Any = {
      ws()
      json(i) match {
        case '"' => str()
        case '[' =>
          i += 1; ws()
          val out = Seq.newBuilder[String]
          if (json(i) == ']') { i += 1 }
          else {
            var more = true
            while (more) {
              out += str(); ws()
              if (json(i) == ',') { i += 1; ws() }
              else { expect(']'); more = false }
            }
          }
          out.result()
        case 't' => i += 4; true
        case 'f' => i += 5; false
        case c => fail(s"unexpected '$c'")
      }
    }
    expect('{'); ws()
    val out = Map.newBuilder[String, Any]
    if (i < json.length && json(i) == '}') return Map.empty
    var more = true
    while (more) {
      val k = str(); expect(':')
      out += (k -> value()); ws()
      if (i < json.length && json(i) == ',') { i += 1; ws() }
      else { expect('}'); more = false }
    }
    out.result()
  }

  /** Exception → (status, error tag); the tag is what the client switches
    * on to rehydrate the typed exception. */
  def errorStatus(e: Exception): (Int, String) = e match {
    case _: AlreadyExistsException => (409, "AlreadyExistsException")
    case _: NoSuchTableException => (404, "NoSuchTableException")
    case _: NoSuchNamespaceException => (404, "NoSuchNamespaceException")
    case _: IllegalArgumentException => (400, "IllegalArgumentException")
    case _ => (500, e.getClass.getSimpleName)
  }

  def rehydrate(error: String, message: String): Exception = error match {
    case "AlreadyExistsException" => new AlreadyExistsException(message)
    case "NoSuchTableException" => new NoSuchTableException(message)
    case "NoSuchNamespaceException" => new NoSuchNamespaceException(message)
    case "IllegalArgumentException" => new IllegalArgumentException(message)
    case other => new RuntimeException(s"$other: $message")
  }
}

/** Serve any [[Catalog]] over HTTP on an ephemeral loopback port — the
  * in-process stand-in for a remote REST catalog service (Nessie, Polaris,
  * …). Handlers delegate straight to the backing catalog; a thread pool
  * serves concurrent executor partitions (registerTables' mapPartitions
  * fan-in is the intended load shape). The server owns no catalog state
  * and does not close the backing catalog. */
final class RestCatalogServer(backing: Catalog) extends AutoCloseable {
  import RestProtocol._

  private val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.setExecutor(pool)
  server.createContext("/v1/", (x: HttpExchange) => handle(x))
  server.start()

  def port: Int = server.getAddress.getPort
  def uri: String = s"http://127.0.0.1:$port"

  override def close(): Unit = {
    server.stop(0)
    pool.shutdownNow()
    ()
  }

  private def handle(x: HttpExchange): Unit = {
    val resp =
      try route(x)
      catch { case e: Exception =>
        val (status, tag) = errorStatus(e)
        (status, obj("error" -> jstr(tag),
          "message" -> jstr(Option(e.getMessage).getOrElse(""))))
      }
    val bytes = resp._2.getBytes(StandardCharsets.UTF_8)
    x.getResponseHeaders.set("Content-Type", "application/json")
    x.sendResponseHeaders(resp._1, bytes.length.toLong)
    val out = x.getResponseBody
    try out.write(bytes) finally out.close()
  }

  private def query(x: HttpExchange): Map[String, String] =
    Option(x.getRequestURI.getRawQuery).map(_.split('&').toSeq).getOrElse(Seq.empty)
      .filter(_.nonEmpty)
      .map { kv =>
        val i = kv.indexOf('=')
        val dec = (s: String) => java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)
        if (i < 0) dec(kv) -> "" else dec(kv.take(i)) -> dec(kv.drop(i + 1))
      }.toMap

  private def body(x: HttpExchange): Map[String, Any] = {
    val in = x.getRequestBody
    val text = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
    parseFlat(text)
  }

  private def route(x: HttpExchange): (Int, String) = {
    val path = x.getRequestURI.getPath
    val method = x.getRequestMethod
    (method, path) match {
      case ("GET", "/v1/config") =>
        (200, obj("name" -> jstr(backing.name),
          "dropDestroysData" -> backing.dropDestroysData.toString))
      case ("GET", "/v1/namespaces") =>
        val parent = Namespace.parse(query(x).getOrElse("parent", ""))
        (200, obj("namespaces" -> arr(backing.listNamespaces(parent).map(_.toString))))
      case ("GET", "/v1/namespaces/exists") =>
        val ns = Namespace.parse(query(x).getOrElse("ns", ""))
        (200, obj("exists" -> backing.namespaceExists(ns).toString))
      case ("POST", "/v1/namespaces") =>
        backing.createNamespace(Namespace.parse(body(x)("namespace").asInstanceOf[String]))
        (200, "{}")
      case ("GET", "/v1/tables") =>
        val ns = Namespace.parse(query(x).getOrElse("ns", ""))
        (200, obj("tables" -> arr(backing.listTables(ns).map(_.toString))))
      case ("GET", "/v1/tables/exists") =>
        val ref = TableRef.parse(query(x).getOrElse("ref", ""))
        (200, obj("exists" -> backing.tableExists(ref).toString))
      case ("GET", "/v1/tables/load") =>
        val ref = TableRef.parse(query(x).getOrElse("ref", ""))
        (200, obj("metadataLocation" -> jstr(backing.loadTableMetadataLocation(ref))))
      case ("POST", "/v1/tables/register") =>
        val b = body(x)
        backing.registerTable(TableRef.parse(b("identifier").asInstanceOf[String]),
          b("metadataLocation").asInstanceOf[String])
        (200, "{}")
      case ("POST", "/v1/tables/drop") =>
        val dropped = backing.dropTable(
          TableRef.parse(body(x)("identifier").asInstanceOf[String]))
        (200, obj("dropped" -> dropped.toString))
      case _ =>
        (404, obj("error" -> jstr("NotFound"), "message" -> jstr(s"$method $path")))
    }
  }
}

/** HTTP client face of the REST protocol — a full [[Catalog]] whose every
  * operation is one round-trip to a [[RestCatalogServer]] (or anything
  * speaking the same endpoints). Built per-partition from a serializable
  * [[CatalogConfig]] (`type = rest`, property `uri`), exactly like the
  * reference building Iceberg's RESTCatalog from CLI options
  * (CatalogMigrationUtil.java:36-46). `dropDestroysData` is served by the
  * remote config endpoint — the delete-at-source guard fires through the
  * network, not from client-side assumptions. */
final class RestCatalog(val name: String, baseUri: String) extends Catalog {
  import RestProtocol._

  private val base = baseUri.stripSuffix("/")
  private lazy val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()

  private def enc(s: String): String = URLEncoder.encode(s, StandardCharsets.UTF_8)

  private def send(req: HttpRequest): Map[String, Any] = {
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() >= 400) {
      // error bodies parse leniently: a proxy's HTML 502 page still
      // surfaces as a typed error with the status attached
      val fields =
        try parseFlat(resp.body())
        catch { case _: Exception => Map.empty[String, Any] }
      val tag = fields.getOrElse("error", "RuntimeException").toString
      val msg = fields.getOrElse("message", s"HTTP ${resp.statusCode()} from $base").toString
      throw rehydrate(tag, msg)
    }
    // a 2xx body that doesn't parse is a protocol failure (truncation,
    // an interposed proxy): fail HERE with the endpoint/status/body
    // context, not later with a bare key-not-found on the empty map
    try parseFlat(resp.body())
    catch {
      case e: Exception =>
        val body = resp.body()
        val excerpt = if (body.length <= 200) body else body.take(200) + "…"
        throw new IllegalStateException(
          s"Unparseable ${resp.statusCode()} response from ${req.uri()}: " +
            s"'$excerpt'", e)
    }
  }

  // per-request deadline: a half-dead server (TCP up, no response) must
  // surface as an exception the migrator's fail-soft can record, not hang
  // an executor partition forever
  private val requestTimeout = Duration.ofSeconds(60)

  private def get(pathAndQuery: String): Map[String, Any] =
    send(HttpRequest.newBuilder(java.net.URI.create(base + pathAndQuery))
      .timeout(requestTimeout).GET().build())

  private def post(path: String, json: String): Map[String, Any] =
    send(HttpRequest.newBuilder(java.net.URI.create(base + path))
      .timeout(requestTimeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(json, StandardCharsets.UTF_8)).build())

  override def listNamespaces(parent: Namespace): Seq[Namespace] =
    get(s"/v1/namespaces?parent=${enc(parent.toString)}")("namespaces")
      .asInstanceOf[Seq[String]].map(Namespace.parse)

  override def namespaceExists(ns: Namespace): Boolean =
    get(s"/v1/namespaces/exists?ns=${enc(ns.toString)}")("exists").asInstanceOf[Boolean]

  override def createNamespace(ns: Namespace): Unit = {
    post("/v1/namespaces", obj("namespace" -> jstr(ns.toString)))
    ()
  }

  override def listTables(ns: Namespace): Seq[TableRef] =
    get(s"/v1/tables?ns=${enc(ns.toString)}")("tables")
      .asInstanceOf[Seq[String]].map(TableRef.parse)

  override def tableExists(ref: TableRef): Boolean =
    get(s"/v1/tables/exists?ref=${enc(ref.toString)}")("exists").asInstanceOf[Boolean]

  override def loadTableMetadataLocation(ref: TableRef): String =
    get(s"/v1/tables/load?ref=${enc(ref.toString)}")("metadataLocation")
      .asInstanceOf[String]

  override def registerTable(ref: TableRef, metadataLocation: String): Unit = {
    post("/v1/tables/register", obj("identifier" -> jstr(ref.toString),
      "metadataLocation" -> jstr(metadataLocation)))
    ()
  }

  override def dropTable(ref: TableRef): Boolean =
    post("/v1/tables/drop", obj("identifier" -> jstr(ref.toString)))("dropped")
      .asInstanceOf[Boolean]

  /** One config round-trip, cached for the client's lifetime (the guard
    * reads it once, driver-side, before any registration starts). */
  override lazy val dropDestroysData: Boolean =
    get("/v1/config")("dropDestroysData").asInstanceOf[Boolean]
}
