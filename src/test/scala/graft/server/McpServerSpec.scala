package graft.server

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The long-lived MCP stdio server (reference parity: mcp/server.py).
  * Exercises the full JSON-RPC handshake plus all four tools against a
  * real MemoryStore, and crash-resume across server instances (state
  * lives in the committed store, not the process).
  */
class McpServerSpec extends AnyFunSuite with SparkTestBase {

  private val mapper = new ObjectMapper()

  private def newServer() = {
    val root = Files.createTempDirectory("graft-mcp-spec").toString
    (new McpServer(spark, root), root)
  }

  private def call(srv: McpServer, line: String) =
    srv.handle(line).map(mapper.readTree)

  test("initialize / tools list / ping handshake") {
    val (srv, _) = newServer()
    val init = call(
      srv,
      """{"jsonrpc":"2.0","id":1,"method":"initialize","params":{"protocolVersion":"2024-11-05"}}"""
    ).get
    assert(init.at("/result/serverInfo/name").asText == "KGGen")
    assert(init.at("/result/capabilities/tools").isObject)
    // notification -> no reply
    assert(srv.handle("""{"jsonrpc":"2.0","method":"notifications/initialized"}""").isEmpty)
    val tools = call(srv, """{"jsonrpc":"2.0","id":2,"method":"tools/list"}""").get
    val names = (0 until tools.at("/result/tools").size())
      .map(i => tools.at(s"/result/tools/$i/name").asText)
    assert(
      names == Seq(
        "add_memories",
        "retrieve_relevant_memories",
        "visualize_memories",
        "get_memory_stats"
      )
    )
    val pong = call(srv, """{"jsonrpc":"2.0","id":3,"method":"ping"}""").get
    assert(pong.at("/result").isObject)
    val unknown = call(srv, """{"jsonrpc":"2.0","id":4,"method":"nope"}""").get
    assert(unknown.at("/error/code").asInt == -32601)
  }

  test("add_memories -> stats -> retrieve -> visualize round trip") {
    val (srv, _) = newServer()
    def toolCall(id: Int, name: String, argsJson: String) =
      call(
        srv,
        s"""{"jsonrpc":"2.0","id":$id,"method":"tools/call","params":{"name":"$name","arguments":$argsJson}}"""
      ).get

    val empty = toolCall(1, "retrieve_relevant_memories", """{"query":"spark"}""")
    assert(empty.at("/result/content/0/text").asText.startsWith("No memories stored yet"))

    val add = toolCall(2, "add_memories", """{"text":"spark engine reads spark plans daily"}""")
    val addText = add.at("/result/content/0/text").asText
    assert(addText.contains("Successfully extracted and stored memories"))
    assert(add.at("/result/isError").asBoolean == false)

    val stats = toolCall(3, "get_memory_stats", "{}")
    val statsText = stats.at("/result/content/0/text").asText
    // tokens >= 4 chars: spark, engine, reads, plans, daily
    assert(statsText.contains("Total Entities: 5"), statsText)
    assert(statsText.contains("Total Relations:"))

    val ret = toolCall(4, "retrieve_relevant_memories", """{"query":"spark"}""")
    val retText = ret.at("/result/content/0/text").asText
    assert(retText.contains("Related entities"))
    assert(retText.contains("- spark"))
    assert(retText.contains("Related facts"))

    val out = Files.createTempDirectory("graft-mcp-viz").resolve("memory.html").toString
    val viz = toolCall(5, "visualize_memories", s"""{"output_filename":"$out"}""")
    assert(viz.at("/result/content/0/text").asText.contains("visualization saved"))
    assert(new String(Files.readAllBytes(java.nio.file.Paths.get(out)), StandardCharsets.UTF_8)
      .startsWith("<!doctype html>"))

    val bad = toolCall(6, "add_memories", "{}")
    assert(bad.at("/result/isError").asBoolean == true)

    val missing = toolCall(7, "no_such_tool", "{}")
    assert(missing.at("/error/code").asInt == -32602)
  }

  test("memory survives a server restart (state in the store, not the process)") {
    val (srv1, root) = newServer()
    srv1.addMemories("alpha likes beta")
    val srv2 = new McpServer(spark, root)
    assert(srv2.memoryStats().contains("Total Entities: 3"))
    assert(srv2.retrieveRelevant("alpha").contains("alpha likes beta"))
  }

  test("serve loop: line-delimited replies on stdout, notifications silent") {
    val (srv, _) = newServer()
    val in = new BufferedReader(new StringReader(
      """{"jsonrpc":"2.0","id":1,"method":"initialize","params":{}}
{"jsonrpc":"2.0","method":"notifications/initialized"}
{"jsonrpc":"2.0","id":2,"method":"tools/list"}
"""
    ))
    val buf = new ByteArrayOutputStream()
    srv.serve(in, new PrintStream(buf, true, "UTF-8"))
    val lines = buf.toString("UTF-8").split("\n").filter(_.nonEmpty)
    assert(lines.length == 2, "exactly two replies for two requests + one notification")
    assert(mapper.readTree(lines(0)).at("/id").asInt == 1)
    assert(mapper.readTree(lines(1)).at("/id").asInt == 2)
  }

  test("request-shaped methods without an id are notifications: no reply, no null-id response") {
    val (srv, _) = newServer()
    // JSON-RPC 2.0: a notification NEVER gets a response, even when the
    // method would normally return a result
    assert(srv.handle("""{"jsonrpc":"2.0","method":"ping"}""").isEmpty)
    assert(srv.handle("""{"jsonrpc":"2.0","method":"tools/list"}""").isEmpty)
    assert(
      srv.handle("""{"jsonrpc":"2.0","method":"tools/call","params":{"name":"get_memory_stats","arguments":{}}}""").isEmpty
    )
    // a parse error still answers (null id is the reserved shape for it)
    assert(srv.handle("{not json").nonEmpty)
  }
}
