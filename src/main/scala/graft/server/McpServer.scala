package graft.server

import java.io.{BufferedReader, InputStreamReader, PrintStream}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.SparkSession

import graft.analytics.Analytics
import graft.extract.TokenRules
import graft.store.MemoryStore

/** Long-lived agent-memory server speaking MCP's stdio transport
  * (JSON-RPC 2.0, one message per line) — the engine's counterpart of
  * the reference's FastMCP server (reference: mcp/server.py:14-80 loop,
  * :131-258 tools). Same four tools with the same semantics:
  *
  *   - add_memories(text): extract a graph from unstructured text and
  *     merge it into the persistent store (server.py:131-166)
  *   - retrieve_relevant_memories(query): substring-matched entities and
  *     facts, capped at 10 each (server.py:168-210)
  *   - visualize_memories(output_filename): standalone HTML artifact of
  *     the store (server.py:213-238)
  *   - get_memory_stats(): store counters (server.py:240-256)
  *
  * Where the reference keeps the graph as driver-resident Python sets
  * flushed to one JSON file, this server fronts the O(delta)-merge
  * parquet MemoryStore — add_memories commits a delta snapshot, reads
  * stay distributed, and a server restart resumes from the committed
  * version (no in-memory source of truth). The JSON-RPC plumbing is
  * driver-side by necessity; every tool body is a Spark job.
  *
  * Run: sbt "runMain graft.Cli mcp-serve <storeRoot>" (or the class
  * directly via spark-submit). Protocol messages are newline-delimited
  * JSON on stdin/stdout; logs go to stderr so the transport stays clean.
  */
final class McpServer(spark: SparkSession, storeRoot: String) {

  private val mapper = new ObjectMapper()
  private def store = new MemoryStore(spark, storeRoot)

  private val ProtocolVersion = "2024-11-05"

  // ---- tool registry (name -> description, input schema, body) ----

  private def textParam(name: String, desc: String): String =
    s"""{"type":"object","properties":{"$name":{"type":"string","description":"$desc"}},"required":["$name"]}"""

  private val tools: Seq[(String, String, String, JsonNode => String)] = Seq(
    (
      "add_memories",
      "Extract and store memories from unstructured text.",
      textParam("text", "Unstructured text to extract memories from"),
      args => addMemories(argStr(args, "text"))
    ),
    (
      "retrieve_relevant_memories",
      "Retrieve relevant memories for a query.",
      textParam("query", "Query to find relevant memories for"),
      args => retrieveRelevant(argStr(args, "query"))
    ),
    (
      "visualize_memories",
      "Generate HTML visualization of the memory graph.",
      """{"type":"object","properties":{"output_filename":{"type":"string","description":"Name for the output HTML file"}}}""",
      args => visualize(Option(args.get("output_filename")).map(_.asText).getOrElse("memory_graph.html"))
    ),
    (
      "get_memory_stats",
      "Get statistics about stored memories.",
      """{"type":"object","properties":{}}""",
      _ => memoryStats()
    )
  )

  private def argStr(args: JsonNode, name: String): String = {
    val n = args.get(name)
    require(n != null && n.isTextual, s"missing required string argument '$name'")
    n.asText
  }

  // ---- tool bodies ----

  private[server] def addMemories(text: String): String = {
    import spark.implicits._
    val s = store
    val docs = Seq(("mem", text)).toDF("doc_id", "text")
    val ents = TokenRules
      .mentions(docs)
      .select("entity")
      .distinct()
    val tris = TokenRules.triples(docs)
    val nE = ents.count()
    val nT = tris.count()
    s.addMemories(ents, tris, Some(TokenRules.edges(tris)))
    val st = s.stats
    s"Successfully extracted and stored memories from text.\n" +
      s"New memories: $nE entities, $nT relations\n" +
      s"Total memories: ${st.getOrElse("entities", 0L)} entities, ${st.getOrElse("triples", 0L)} relations\n" +
      s"Storage: $storeRoot (version ${s.version})"
  }

  private[server] def retrieveRelevant(query: String): String = {
    val s = store
    // emptiness probe, not three full count() jobs (stats counts
    // entities, triples AND edges — per tool call, on a large store)
    if (s.entities.isEmpty)
      return "No memories stored yet. Use add_memories to store some memories first."
    val ents = s.searchEntities(query, 10).collect().map(_.getString(0))
    // Locale.ROOT to match Spark's locale-independent lower() below
    val q = query.toLowerCase(java.util.Locale.ROOT)
    import org.apache.spark.sql.functions._
    val facts = s.triples
      .where(
        lower(col("subject")).contains(q) || lower(col("predicate")).contains(q) ||
          lower(col("obj")).contains(q)
      )
      .orderBy("subject", "predicate", "obj")
      .limit(10)
      .collect()
      .map(r => s"${r.getString(0)} ${r.getString(1)} ${r.getString(2)}")
    if (ents.isEmpty && facts.isEmpty)
      return s"No relevant memories found for query: '$query'"
    val sb = new StringBuilder(s"Relevant memories for '$query':\n\n")
    if (ents.nonEmpty) {
      sb.append(s"Related entities (${ents.length}):\n")
      ents.foreach(e => sb.append(s"- $e\n"))
      sb.append("\n")
    }
    if (facts.nonEmpty) {
      sb.append(s"Related facts (${facts.length}):\n")
      facts.foreach(f => sb.append(s"- $f\n"))
    }
    sb.toString
  }

  private[server] def visualize(outputFilename: String): String = {
    val s = store
    val st = s.stats
    if (st.getOrElse("entities", 0L) == 0L)
      return "No memories to visualize. Use add_memories to store some memories first."
    val path = java.nio.file.Paths.get(outputFilename).toAbsolutePath.toString
    graft.viz.HtmlViz.write(Analytics.vizModel(s.entities, s.triples), s.triples, path)
    s"Memory graph visualization saved to: $path\n\n" +
      s"Visualization contains ${st.getOrElse("entities", 0L)} entities and " +
      s"${st.getOrElse("triples", 0L)} relations."
  }

  private[server] def memoryStats(): String = {
    val s = store
    val st = s.stats
    s"""Memory Statistics:
- Total Entities: ${st.getOrElse("entities", 0L)}
- Total Relations: ${st.getOrElse("triples", 0L)}
- Edge Types: ${st.getOrElse("edges", 0L)}
- Storage Path: $storeRoot
- Version: ${s.version}"""
  }

  // ---- JSON-RPC 2.0 over newline-delimited stdio ----

  private def resultNode(id: JsonNode): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("jsonrpc", "2.0")
    o.set[ObjectNode]("id", id)
    o
  }

  private def errorResponse(id: JsonNode, code: Int, message: String): String = {
    val o = resultNode(id)
    val err = mapper.createObjectNode()
    err.put("code", code)
    err.put("message", message)
    o.set[ObjectNode]("error", err)
    mapper.writeValueAsString(o)
  }

  private def textResult(id: JsonNode, text: String, isError: Boolean): String = {
    val o = resultNode(id)
    val res = mapper.createObjectNode()
    val content = mapper.createArrayNode()
    val item = mapper.createObjectNode()
    item.put("type", "text")
    item.put("text", text)
    content.add(item)
    res.set[ObjectNode]("content", content)
    res.put("isError", isError)
    o.set[ObjectNode]("result", res)
    mapper.writeValueAsString(o)
  }

  /** Handle one raw JSON-RPC line; None for notifications (no reply). */
  def handle(line: String): Option[String] = {
    val msg =
      try mapper.readTree(line)
      catch {
        case _: Exception =>
          return Some(errorResponse(mapper.nullNode(), -32700, "parse error"))
      }
    val id = msg.get("id")
    val method = Option(msg.get("method")).map(_.asText).getOrElse("")
    val isNotification = id == null || id.isNull
    // JSON-RPC 2.0: a notification (no id) NEVER gets a response, even
    // for request-shaped methods — a null-id reply is the shape reserved
    // for parse errors and strict clients treat it as a protocol error
    if (isNotification) return None
    method match {
      case "initialize" =>
        val o = resultNode(id)
        val res = mapper.createObjectNode()
        res.put("protocolVersion", ProtocolVersion)
        val caps = mapper.createObjectNode()
        caps.set[ObjectNode]("tools", mapper.createObjectNode())
        res.set[ObjectNode]("capabilities", caps)
        val info = mapper.createObjectNode()
        info.put("name", "KGGen")
        info.put("version", "0.1.0")
        res.set[ObjectNode]("serverInfo", info)
        o.set[ObjectNode]("result", res)
        Some(mapper.writeValueAsString(o))

      case "ping" =>
        val o = resultNode(id)
        o.set[ObjectNode]("result", mapper.createObjectNode())
        Some(mapper.writeValueAsString(o))

      case "tools/list" =>
        val o = resultNode(id)
        val res = mapper.createObjectNode()
        val arr = mapper.createArrayNode()
        tools.foreach { case (name, desc, schema, _) =>
          val t = mapper.createObjectNode()
          t.put("name", name)
          t.put("description", desc)
          t.set[ObjectNode]("inputSchema", mapper.readTree(schema))
          arr.add(t)
        }
        res.set[ObjectNode]("tools", arr)
        o.set[ObjectNode]("result", res)
        Some(mapper.writeValueAsString(o))

      case "tools/call" =>
        val params = Option(msg.get("params")).getOrElse(mapper.createObjectNode())
        val name = Option(params.get("name")).map(_.asText).getOrElse("")
        val args = Option(params.get("arguments")).getOrElse(mapper.createObjectNode())
        tools.find(_._1 == name) match {
          case None => Some(errorResponse(id, -32602, s"unknown tool: $name"))
          case Some((_, _, _, body)) =>
            val reply =
              try textResult(id, body(args), isError = false)
              catch { case e: Exception => textResult(id, s"Error: ${e.getMessage}", isError = true) }
            Some(reply)
        }

      case other =>
        Some(errorResponse(id, -32601, s"method not found: $other"))
    }
  }

  /** Blocking serve loop: one JSON-RPC message per stdin line, replies on
    * stdout, until EOF. Protocol-clean: nothing but JSON-RPC goes to out.
    */
  def serve(in: BufferedReader, out: PrintStream): Unit = {
    var line = in.readLine()
    while (line != null) {
      if (line.trim.nonEmpty) handle(line).foreach { reply =>
        out.println(reply)
        out.flush()
      }
      line = in.readLine()
    }
  }
}

object McpServer {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      sys.env.getOrElse("KG_STORAGE_PATH", "./kg_memory_store")
    )
    val spark = graft.pipeline.KgGenJob.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]",
      "graft-mcp"
    )
    spark.sparkContext.setLogLevel("WARN")
    System.err.println(s"graft MCP server: store=$root (newline-delimited JSON-RPC on stdio)")
    try new McpServer(spark, root)
      .serve(new BufferedReader(new InputStreamReader(System.in, StandardCharsets.UTF_8)), System.out)
    finally spark.stop()
  }
}
