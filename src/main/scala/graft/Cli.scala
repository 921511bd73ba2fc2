package graft

import org.apache.spark.sql.SparkSession
import graft.analytics.Analytics
import graft.cluster.ClusterGraph
import graft.corpus.CorpusGen
import graft.model.{Graph, GraphJson}
import graft.pipeline.KgGenJob
import graft.store.MemoryStore

/** Shell entry point with verb parity to the reference's user-facing
  * surface (reference: src/kg_gen/cli.py — whose only subcommand launches
  * the MCP server, i.e. the add/retrieve/stats memory verbs of
  * mcp/server.py:131-258 — plus the kg_gen API verbs generate / cluster /
  * aggregate / visualize of src/kg_gen/kg_gen.py). Every verb delegates
  * to the library; this file is argument plumbing only.
  *
  * Usage (spark-submit --class graft.Cli, or sbt "runMain graft.Cli ..."):
  * {{{
  *   generate  <tableRoot> [nDocs] [master]         # pipeline run
  *   cluster   <in.json> <out.json>                 # cluster a graph file
  *   aggregate <out.json> <in1.json> <in2.json>...  # set-union graphs
  *   visualize <in.json> <out.parquet> [out.html]   # viz view model (+ HTML artifact)
  *   memory-add      <storeRoot> <graph.json>       # merge into store
  *   memory-retrieve <storeRoot> <query>            # 2-hop context
  *   memory-stats    <storeRoot>                    # store counters
  *   memory-visualize <storeRoot> <out.parquet> [out.html]  # viz model of the store
  *   mcp-serve <storeRoot>                          # long-lived MCP stdio server
  * }}}
  */
object Cli {

  private def session(): SparkSession =
    KgGenJob.session(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]", "graft-cli")

  private def storeGraphTables(spark: SparkSession, g: Graph) = {
    import spark.implicits._
    (
      g.entities.toSeq.toDF("entity"),
      g.relations.toSeq.toDF("subject", "predicate", "obj"),
      g.edges.toSeq.toDF("predicate")
    )
  }

  /** Clean arity failure: usage + exit 2, never a MatchError after JVM
    * and Spark startup cost.
    */
  private def req(args: Array[String], n: Int, usage: String): Unit =
    if (args.length < n) {
      System.err.println(s"usage: ${args(0)} $usage")
      sys.exit(2)
    }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println("usage: see Cli scaladoc"); sys.exit(2) }
    args(0) match {
      case "generate" =>
        KgGenJob.main(args.drop(1))

      case "cluster" =>
        req(args, 3, "<in.json> <out.json>")
        val Array(_, in, out) = args.take(3)
        val spark = session()
        try GraphJson.write(ClusterGraph.clusterDriverGraph(spark, GraphJson.read(in)), out)
        finally spark.stop()
        println(s"clustered $in -> $out")

      case "aggregate" =>
        req(args, 3, "<out.json> <in1.json> [in2.json ...]")
        val out = args(1)
        val graphs = args.drop(2).map(GraphJson.read).toSeq
        GraphJson.write(Graph.aggregate(graphs), out)
        println(s"aggregated ${graphs.size} graphs -> $out")

      case "visualize" =>
        // optional 4th arg: self-contained HTML artifact (reference
        // parity: visualize_kg.py:261-304 writes an HTML dashboard)
        req(args, 3, "<in.json> <out.parquet> [out.html]")
        val Array(_, in, out) = args.take(3)
        val htmlOut = args.lift(3)
        val spark = session()
        try {
          import spark.implicits._
          val g = GraphJson.read(in)
          val ents = g.entities.toSeq.toDF("entity")
          val tris = g.relations.toSeq.toDF("subject", "predicate", "obj")
          val viz = Analytics.vizModel(ents, tris)
          viz.coalesce(1).write.mode("overwrite").parquet(out)
          htmlOut.foreach { h =>
            // read the just-written parquet: the viz plan contains an
            // iterative CC run, and collecting the lazy plan again would
            // re-execute it from scratch
            graft.viz.HtmlViz.write(spark.read.parquet(out), tris, h)
            println(s"rendered $in -> $h")
          }
        } finally spark.stop()
        println(s"visualized $in -> $out")

      case "memory-add" =>
        req(args, 3, "<storeRoot> <graph.json>")
        val Array(_, root, graphPath) = args.take(3)
        val spark = session()
        try {
          val g = GraphJson.read(graphPath)
          val (e, t, ed) = storeGraphTables(spark, g)
          val v = new MemoryStore(spark, root).addMemories(e, t, Some(ed))
          println(s"merged $graphPath into $root (version $v)")
        } finally spark.stop()

      case "memory-retrieve" =>
        req(args, 3, "<storeRoot> <query>")
        val Array(_, root, query) = args.take(3)
        val spark = session()
        try {
          val ctx = new MemoryStore(spark, root).retrieve(query).collect()
            .headOption.map(_.getString(0)).getOrElse("")
          println(ctx)
        } finally spark.stop()

      case "memory-stats" =>
        req(args, 2, "<storeRoot>")
        val root = args(1)
        val spark = session()
        try {
          val s = new MemoryStore(spark, root).stats
          println(s.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(" "))
        } finally spark.stop()

      case "memory-visualize" =>
        // parity with mcp/server.py:213-238 visualize_memories: the viz
        // view model computed over the persistent store's current version
        req(args, 3, "<storeRoot> <out.parquet> [out.html]")
        val Array(_, root, out) = args.take(3)
        val htmlOut = args.lift(3)
        val spark = session()
        try {
          val store = new MemoryStore(spark, root)
          val viz = Analytics.vizModel(store.entities, store.triples)
          viz.coalesce(1).write.mode("overwrite").parquet(out)
          // read back rather than re-collect the lazy CC plan (see
          // `visualize` above)
          htmlOut.foreach(graft.viz.HtmlViz.write(spark.read.parquet(out), store.triples, _))
        } finally spark.stop()
        println(s"visualized store $root -> $out")

      case "mcp-serve" =>
        // the reference CLI's only subcommand launches this server
        // (src/kg_gen/cli.py -> mcp/server.py); blocks until stdin EOF
        graft.server.McpServer.main(args.drop(1))

      case other =>
        System.err.println(s"unknown verb: $other"); sys.exit(2)
    }
  }
}
